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


def registrable_domain(host: Column) -> Column:
    """Heuristic eTLD+1: the last two host labels, or three when the
    ending is ``<second-level-suffix>.<2-letter-cc>`` (co.uk, com.au,
    ac.jp, …). A full public-suffix-list lookup is a broadcast join
    against the published list; this covers the dominant patterns with
    zero data movement."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    last = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & (F.length(last) == 2)
        & second.isin(*SECOND_LEVEL_SUFFIXES)
    )
    tail3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    tail2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    return F.when(n <= 2, host).otherwise(
        F.when(take3, tail3).otherwise(tail2)
    )


def url_dedup(df: DataFrame, url_col: str, order_cols: list[str]) -> DataFrame:
    """One row per canonical URL, deterministic winner by
    ``order_cols`` (min-struct aggregation — partial-aggregatable, so
    duplicates collapse map-side before the shuffle; only distinct
    canonical URLs cross the wire). Rows whose URL is NULL pass
    through UNTOUCHED: NULL is a missing key, not a shared resource —
    grouping would silently collapse unrelated rows into one."""
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
        .select(F.col("__norm_url").alias("norm_url"), "__win.*")
    )
    passthrough = norm.filter(F.col("__norm_url").isNull()).select(
        F.col("__norm_url").alias("norm_url"), *[F.col(c) for c in out_cols]
    )
    return deduped.unionByName(passthrough)


def domain_cap(
    df: DataFrame,
    url_col: str,
    max_per_domain: int,
    order_col: str,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain,
    deterministically preferring lower ``order_col``. The row_number
    window shuffles once on the (bounded-cardinality) domain key; at
    100 TB a heavy domain is exactly the skew the cap exists to remove,
    and the window never materializes more than one domain's rows per
    task."""
    from pyspark.sql import Window

    d = df.withColumn("__norm", normalize_url(F.col(url_col))).withColumn(
        "__domain", registrable_domain(url_host(F.col("__norm")))
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
        .withColumnRenamed("__domain", "domain")
    )
