"""URL canonicalization + domain operators — the web-corpus curation
primitives the reference's feed layer never needed but a 100 TB crawl
pipeline lives on (per-URL dedup, per-domain capping/blocklists).

Everything here is a pure codegen'd Column expression chain (regexp /
split / array ops) — zero shuffle, zero Python, scan-speed over any
corpus size. The canonical form is engine-portable: every step has an
exact DuckDB equivalent (see plans/curation.py's oracle), so
normalized URLs are stable *keys*, safe to hash-partition on and to
compare across engines.

Normalization contract (documented so keys never churn):

1. trim surrounding whitespace
2. drop the fragment (``#...`` — never sent to the server)
3. lowercase the scheme and authority ONLY (paths are case-sensitive)
4. drop default ports (``http://…:80``, ``https://…:443``)
5. drop a leading ``www.`` host label
6. remove tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), then sort the surviving params — param order is not
   semantic, and sorting makes equal resources equal strings
7. drop an empty ``?`` and a bare root ``/`` path

Single-match regexes only: DuckDB's RE2 ``regexp_replace`` replaces
the first match (no lookaround), so every pattern here is anchored or
provably single-occurrence, keeping Spark (Java regex, replace-all)
and the oracle bit-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query-param name prefixes dropped by normalization (click-tracking
#: noise that makes one resource look like many URLs)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "ref")

#: second-level public-suffix labels (subset of the public-suffix list
#: large enough for the heuristic: <label>.<2-letter-cc> is a suffix,
#: e.g. co.uk, com.au, ac.jp — so the registrable domain keeps 3 labels)
SECOND_LEVEL_SUFFIXES = ("co", "com", "net", "org", "ac", "gov", "edu")


def _lower_authority(u: Column) -> Column:
    auth = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.substr(u, F.length(auth) + 1)
    return F.when(auth != F.lit(""), F.concat(F.lower(auth), rest)).otherwise(u)


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract above."""
    u = F.trim(url)
    u = F.regexp_replace(u, r"#.*", "")                       # 2: fragment
    u = _lower_authority(u)                                   # 3
    u = F.regexp_replace(                                     # 4: :80
        u, r"^(http://[^/?#:]*):80([/?#].*)?$", r"$1$2"
    )
    u = F.regexp_replace(                                     # 4: :443
        u, r"^(https://[^/?#:]*):443([/?#].*)?$", r"$1$2"
    )
    u = F.regexp_replace(                                     # 5 (anchored:
        u, r"^([a-z][a-z0-9+.\-]*)://www\.", r"$1://"
    )  # Spark replaces ALL matches, DuckDB only the first — an anchor
    # makes both engines see exactly one
    base = F.substring_index(u, "?", 1)
    base = F.regexp_replace(                                  # 7: root /
        base, r"^([a-z][a-z0-9+.\-]*://[^/?#]+)/$", r"$1"
    )
    query = F.when(
        F.instr(u, "?") > 0, F.substr(u, F.length(F.substring_index(u, "?", 1)) + 2)
    ).otherwise(F.lit(""))
    qs = F.array_join(F.array_sort(F.filter(
        F.split(query, "&"),
        lambda t: ~(
            t.startswith(TRACKING_PARAMS[0])
            | t.startswith(TRACKING_PARAMS[1] + "=")
            | t.startswith(TRACKING_PARAMS[2] + "=")
            | t.startswith(TRACKING_PARAMS[3] + "=")
            | (t == F.lit(""))
        ),
    )), "&")
    return F.when(qs == F.lit(""), base).otherwise(
        F.concat(base, F.lit("?"), qs)
    )


def url_host(url: Column) -> Column:
    """Hostname of an (ideally normalized) URL — port, path, query and
    fragment excluded. Empty string when there is no ``scheme://``."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)", 1)


def registrable_domain(
    host: Column,
    second_level_suffixes: Sequence[str] | None = None,
) -> Column:
    """Heuristic eTLD+1: the last two host labels, or three when the
    ending is ``<second-level-suffix>.<2-letter-cc>`` (co.uk, com.au,
    ac.jp, …).

    KNOWN GAP — this is a 7-label SUBSET of the real public-suffix
    list, not the list itself. It covers the dominant country-code
    second-level patterns, but at crawl scale it is silently wrong for
    the long tail: suffixes outside the subset (``gob.mx``, ``or.jp``,
    ``ne.jp``, ``id.au`` → grouped one label too coarse), multi-label
    suffixes (``pref.aichi.jp``), and private-registry suffixes
    (``github.io``, ``blogspot.com`` → grouped one label too fine —
    every user site collapses into one "domain" for capping). Pass
    ``second_level_suffixes`` to widen the subset without touching
    this module; for exact semantics join hosts against the published
    public-suffix list (a broadcast join — the list is ~10k rows) and
    feed the resulting domain column to the capping/grouping operator
    directly. The default stays frozen because normalized domains are
    *keys*: changing it re-partitions history.
    """
    suffixes = tuple(
        SECOND_LEVEL_SUFFIXES
        if second_level_suffixes is None
        else second_level_suffixes
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    last = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & (F.length(last) == 2)
        & second.isin(*suffixes)
    )
    tail3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    tail2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    return F.when(n <= 2, host).otherwise(
        F.when(take3, tail3).otherwise(tail2)
    )


def psl_registrable_domain(
    df: DataFrame,
    host_col: str,
    suffixes: DataFrame,
    out_col: str = "domain",
    max_rule_labels: int = 5,
) -> DataFrame:
    """EXACT eTLD+1 against a published public-suffix list — the
    documented upgrade path from :func:`registrable_domain`'s 7-label
    heuristic: multi-label suffixes (``pref.aichi.jp``), long-tail
    country rules (``gob.mx``, ``or.jp``), wildcard rules (``*.ck``)
    and exception rules (``!www.ck``) all resolve per the
    publicsuffix.org algorithm; private-registry suffixes
    (``github.io``) group correctly when the list includes them.

    ``suffixes`` is a one-column frame of PSL rules (plain ``co.uk``,
    wildcard ``*.ck``, exception ``!www.ck``; comment ``//`` and blank
    lines are tolerated and ignored, so the published file loads
    as-is). Matching follows the spec: every rule that is a label-wise
    suffix of the host matches (``*`` spans exactly one label);
    an exception rule prevails, else the rule with the most labels;
    no match falls back to the implicit ``*`` rule (the bare TLD).
    Hosts and rules are case-canonicalized (lowercased) per the spec
    before matching, and the domain is emitted in lowercase. The
    registrable domain is the public suffix plus one label — NULL
    when the host IS a public suffix (nothing is registrable).

    Scale shape: the mapping is computed once per DISTINCT host (the
    per-row work is a join back on the host key), and each distinct
    host emits at most ``2 * max_rule_labels`` candidate tails (exact
    + wildcardized per length) — a bounded explode, not a cartesian.
    The rule table is the global PSL: a published, hard-bounded ~10k
    rows, so the candidate join broadcasts under any planner; no hint
    is needed and none is pinned. Everything is codegen'd split/slice
    expressions — zero Python.
    """
    if out_col in df.columns:
        raise ValueError(
            f"psl_registrable_domain output column {out_col!r} already "
            "exists in the input; pass out_col=<fresh name>"
        )
    clash = {"__host", "__domain"} & set(df.columns)
    if clash:
        raise ValueError(
            f"psl_registrable_domain uses {sorted(clash)} internally; "
            "rename those input columns first"
        )
    rule_col = suffixes.columns[0]
    rules = (
        suffixes.select(F.lower(F.trim(F.col(rule_col))).alias("__rule"))
        .where(
            (F.col("__rule") != "") & ~F.col("__rule").startswith("//")
        )
        .select(
            F.when(
                F.col("__rule").startswith("!"),
                F.expr("substring(__rule, 2)"),
            )
            .otherwise(F.col("__rule"))
            .alias("__match"),
            F.col("__rule").startswith("!").alias("__exc"),
        )
        .withColumn("__m", F.size(F.split(F.col("__match"), r"\.")))
        # public-suffix label count if this rule prevails: an exception
        # rule's own match IS registrable, so its suffix is one shorter
        .withColumn(
            "__ps_len",
            F.when(F.col("__exc"), F.col("__m") - 1).otherwise(F.col("__m")),
        )
        .distinct()
    )
    # The PSL algorithm canonicalizes to lowercase first: candidates
    # derive from the LOWERED host (and the domain is emitted
    # lowercase, the PSL canonical form), while the mapping joins back
    # on the host exactly as the caller spelled it.
    hosts = (
        df.select(F.col(host_col).alias("__host"))
        .where(F.col("__host").isNotNull() & (F.col("__host") != ""))
        .distinct()
        .withColumn("__labels", F.split(F.lower(F.col("__host")), r"\."))
        .withColumn("__n", F.size(F.col("__labels")))
    )
    k = F.col("__k")
    n = F.col("__n")
    tail = F.concat_ws(".", F.slice(F.col("__labels"), n - k + 1, k))
    wild = F.when(
        k >= 2,
        F.concat(
            F.lit("*."),
            F.concat_ws(".", F.slice(F.col("__labels"), n - k + 2, k - 1)),
        ),
    ).otherwise(F.lit("*"))
    cand = hosts.select(
        "__host",
        F.explode(
            F.sequence(F.lit(1), F.least(n, F.lit(max_rule_labels)))
        ).alias("__k"),
        F.col("__labels"),
        F.col("__n"),
    ).select(
        "__host", F.explode(F.array(tail, wild)).alias("__cand")
    )
    best = (
        cand.join(rules, cand["__cand"] == rules["__match"])
        .groupBy("__host")
        # max struct: exception rules first (false < true), then most
        # labels — exactly the spec's prevailing-rule order
        .agg(
            F.max(
                F.struct(
                    F.col("__exc"), F.col("__m"), F.col("__ps_len")
                )
            ).alias("__w")
        )
        .select("__host", F.col("__w.__ps_len").alias("__ps_len"))
    )
    s = F.coalesce(F.col("__ps_len"), F.lit(1))  # implicit '*' rule
    mapping = (
        hosts.join(best, "__host", "left")
        .select(
            "__host",
            F.when(
                F.col("__n") > s,
                F.concat_ws(
                    ".", F.slice(F.col("__labels"), F.col("__n") - s, s + 1)
                ),
            ).alias("__domain"),
        )
    )
    out = df.join(
        mapping, df[host_col] == mapping["__host"], "left"
    ).drop("__host")
    if out_col != "__domain":
        out = out.withColumnRenamed("__domain", out_col)
    return out


def url_dedup(
    df: DataFrame,
    url_col: str,
    order_cols: list[str],
    out_col: str = "norm_url",
) -> DataFrame:
    """One row per canonical URL, deterministic winner by
    ``order_cols`` (min-struct aggregation — partial-aggregatable, so
    duplicates collapse map-side before the shuffle; only distinct
    canonical URLs cross the wire). Rows whose URL is NULL pass
    through UNTOUCHED: NULL is a missing key, not a shared resource —
    grouping would silently collapse unrelated rows into one.

    The canonical URL lands in ``out_col`` (default ``norm_url``);
    a name already present in the input raises instead of silently
    producing a duplicate/ambiguous column."""
    if out_col in df.columns:
        raise ValueError(
            f"url_dedup output column {out_col!r} already exists in the "
            "input; pass out_col=<fresh name>"
        )
    norm = df.withColumn("__norm_url", normalize_url(F.col(url_col)))
    payload = F.struct(*[F.col(c) for c in order_cols], *[
        F.col(c) for c in df.columns if c not in order_cols
    ])
    out_cols = [c for c in order_cols] + [
        c for c in df.columns if c not in order_cols
    ]
    deduped = (
        norm.filter(F.col("__norm_url").isNotNull())
        .groupBy("__norm_url")
        .agg(F.min(payload).alias("__win"))
        .select(F.col("__norm_url").alias(out_col), "__win.*")
    )
    passthrough = norm.filter(F.col("__norm_url").isNull()).select(
        F.col("__norm_url").alias(out_col), *[F.col(c) for c in out_cols]
    )
    return deduped.unionByName(passthrough)


def domain_cap(
    df: DataFrame,
    url_col: str,
    max_per_domain: int,
    order_col: str,
    domain_col: str = "domain",
    second_level_suffixes: Sequence[str] | None = None,
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain,
    deterministically preferring lower ``order_col``. The row_number
    window shuffles once on the (bounded-cardinality) domain key; at
    100 TB a heavy domain is exactly the skew the cap exists to remove,
    and the window never materializes more than one domain's rows per
    task.

    The grouping domain lands in ``domain_col`` (default ``domain``);
    a name already present in the input raises instead of silently
    producing a duplicate/ambiguous column. ``second_level_suffixes``
    widens the public-suffix heuristic (see
    :func:`registrable_domain`'s known-gap note); ``suffixes`` (a PSL
    rule frame) switches to the EXACT
    :func:`psl_registrable_domain` semantics instead — rows whose
    host has no registrable domain (bare public suffixes) then group
    under a NULL domain."""
    from pyspark.sql import Window

    if domain_col in df.columns:
        raise ValueError(
            f"domain_cap output column {domain_col!r} already exists in "
            "the input; pass domain_col=<fresh name>"
        )
    d = df.withColumn("__norm", normalize_url(F.col(url_col)))
    if suffixes is not None:
        d = psl_registrable_domain(
            d.withColumn("__h", url_host(F.col("__norm"))),
            "__h", suffixes, out_col="__domain",
        ).drop("__h")
    else:
        d = d.withColumn(
            "__domain",
            registrable_domain(
                url_host(F.col("__norm")), second_level_suffixes
            ),
        )
    # Tie-break on the canonical URL only — ordering by every payload
    # column would drag full row payloads (document bodies!) through
    # the per-domain sort comparator. Rows equal on (order_col, url)
    # are indistinguishable duplicates; which survives is immaterial.
    w = Window.partitionBy("__domain").orderBy(
        F.col(order_col), F.col("__norm")
    )
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_domain)
        .drop("__rn", "__norm")
        .withColumnRenamed("__domain", domain_col)
    )


def url_trap_features(
    url: Column,
    max_depth: int = 8,
    repeat_threshold: int = 3,
    max_params: int = 6,
    max_len: int = 250,
) -> Column:
    """Crawl-trap signals for a URL → ``struct<path_depth,
    max_segment_repeat, n_params, has_session_param, url_len,
    is_trap>`` — the frontier-side filter every large crawl needs:
    calendar/faceted-navigation loops show up as repeated path
    segments and unbounded depth, session-id rewriting as well-known
    query parameter names, and parameter/length explosions as URLs
    that enumerate a combinatorial space. One URL judged at a time
    (no corpus statistics — this is the cheap per-row gate; per-host
    budget pressure is ``domain_cap``'s job).

    - ``path_depth``: non-empty path segments;
    - ``max_segment_repeat``: occurrences of the most-repeated
      segment value anywhere in the path (the classic ``/cal/2026/
      cal/2026/cal`` loop signature) — O(depth²) array lambdas, depth
      is tens at worst;
    - ``n_params``: ``&``-separated query parameters;
    - ``has_session_param``: phpsessid/jsessionid/sessionid/
      session_id/sid/cfid/cftoken/zenid as a parameter name;
    - ``is_trap``: any threshold tripped (``depth > max_depth``,
      ``repeat >= repeat_threshold``, ``params > max_params``,
      session param present, ``length > max_len``).

    Pure JVM regexp/array expressions — usable in a frontier select
    before any fetch is spent."""
    path = F.regexp_extract(
        url, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    depth = F.size(segs)
    max_rep = F.coalesce(
        F.array_max(
            F.transform(
                segs,
                lambda x: F.size(F.filter(segs, lambda y: y == x)),
            )
        ),
        F.lit(0),
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_params = F.size(F.filter(F.split(query, "&"), lambda x: x != ""))
    has_sess = query.rlike(
        r"(?i)(?:^|&)(phpsessid|jsessionid|sessionid|session_id|sid"
        r"|cfid|cftoken|zenid)="
    )
    url_len = F.length(url)
    is_trap = (
        (depth > max_depth)
        | (max_rep >= repeat_threshold)
        | (n_params > max_params)
        | has_sess
        | (url_len > max_len)
    )
    return F.struct(
        depth.cast("int").alias("path_depth"),
        max_rep.cast("int").alias("max_segment_repeat"),
        n_params.cast("int").alias("n_params"),
        has_sess.alias("has_session_param"),
        url_len.cast("int").alias("url_len"),
        is_trap.alias("is_trap"),
    )
