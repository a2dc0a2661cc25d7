"""robots.txt parsing and URL-frontier filtering (RFC 9309).

A polite crawl pipeline filters its URL frontier against each host's
robots.txt before fetching. The grammar is line-oriented: groups of
``User-agent`` lines followed by ``Allow``/``Disallow`` path-prefix
rules; a crawler obeys the group(s) naming it exactly when any exist,
else the ``*`` groups; among matching rules the LONGEST path prefix
wins and Allow beats Disallow on a length tie; an unmatched path is
allowed (RFC 9309 §2.2.2).

Everything is JVM DataFrame expressions: the group state machine is a
running sum over a per-domain window (robots files are a few KB, so
thousands of domains sort in parallel and no window ever sees more
than one file), and frontier matching is a broadcast join against the
bounded rule table plus one max-by aggregate — nothing per-URL ever
leaves whole-stage codegen.

Parity citation: the reference has no crawl surface (single XML feed,
reference README); this extends the crawl-ingestion seam
(sources/warc.py, sources/cdx.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_rules(
    robots: DataFrame,
    agent: str,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse per-domain robots.txt text into the rule set the given
    ``agent`` must obey → ``(domain, allow boolean, prefix)``.

    Group resolution per RFC 9309 §2.2.1: consecutive ``User-agent``
    lines head one group; a ``User-agent`` line after rule lines
    starts a new group; comments (``#…``) and unknown directives
    (Sitemap, Crawl-delay, …) are ignored; if any group names the
    agent exactly (case-insensitive) only those groups apply,
    otherwise the ``*`` groups. Empty-value ``Disallow:`` lines (the
    classic allow-all idiom) are dropped — they match nothing.
    """
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "raw"),
    )
    cleaned = lines.select(
        "domain",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    parsed = cleaned.select(
        "domain",
        "ln",
        F.lower(F.trim(F.regexp_extract("line", r"(?i)^([a-z-]+)\s*:", 1)))
        .alias("key"),
        F.trim(F.regexp_extract("line", r"(?i)^[a-z-]+\s*:(.*)$", 1))
        .alias("value"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("domain").orderBy("ln")
    grouped = parsed.select(
        "domain",
        "ln",
        "key",
        "value",
        F.sum(
            (
                (F.col("key") == "user-agent")
                & (
                    F.coalesce(F.lag("key").over(w), F.lit(""))
                    != "user-agent"
                )
            ).cast("int")
        )
        .over(w)
        .alias("grp"),
    ).where(F.col("grp") >= 1)  # rules before any User-agent: ignored
    agents = (
        grouped.where(F.col("key") == "user-agent")
        .groupBy("domain", "grp")
        .agg(
            F.max(
                (F.lower("value") == agent.lower()).cast("int")
            ).alias("exact"),
            F.max((F.col("value") == "*").cast("int")).alias("wild"),
        )
    )
    has_exact = agents.groupBy("domain").agg(
        F.max("exact").alias("__has_exact")
    )
    applicable = (
        agents.join(F.broadcast(has_exact), "domain")
        .where(
            ((F.col("__has_exact") == 1) & (F.col("exact") == 1))
            | ((F.col("__has_exact") == 0) & (F.col("wild") == 1))
        )
        .select("domain", "grp")
    )
    return (
        grouped.where(F.col("key") != "user-agent")
        .join(F.broadcast(applicable), ["domain", "grp"])
        .where(F.col("value") != "")  # empty Disallow: matches nothing
        .select(
            "domain",
            (F.col("key") == "allow").alias("allow"),
            F.col("value").alias("prefix"),
        )
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Frontier filter: every input row plus an ``allowed`` flag —
    longest matching prefix decides, Allow wins length ties, no match
    means allowed. The rule table broadcasts (it is bounded by the
    robots corpus, never by the frontier); matching is one equi-join
    on domain plus a max-by aggregate keyed by URL — two bounded
    shuffles, nothing quadratic."""
    domain = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    )
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    keyed = urls.select(
        F.col(url_col).alias("url"),
        domain.alias("__d"),
        path.alias("__p"),
    )
    joined = keyed.join(
        F.broadcast(rules.withColumnRenamed("domain", "__d")),
        "__d",
        "left",
    )
    is_match = F.col("__p").startswith(F.col("prefix"))
    verdict = F.max(
        F.when(
            is_match,
            F.struct(
                F.length("prefix").alias("l"),
                F.col("allow").cast("int").alias("a"),
            ),
        )
    )
    return (
        joined.groupBy("url")
        .agg(verdict.alias("__v"))
        .select(
            "url",
            F.coalesce(F.col("__v")["a"] == 1, F.lit(True))
            .alias("allowed"),
        )
    )
