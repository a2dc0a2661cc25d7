"""Dataset-curation fixture queries (operators/curation.py): all
deterministic-by-hash, hence fully DuckDB-oracle-checkable — the
portable bucket is ``('0x' || substr(md5(key), 1, 8))::BIGINT % 100``
on the DuckDB side and ``conv(substr(md5(key), 1, 8), 16, 10)`` on the
Spark side (32 hash bits: exact in BIGINT in both engines)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators import curation as cu
from nextbus2pg_spark.plans.registry import fixture


def _bucket_sql(key_expr: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5('{salt}:' || {key_expr}), 1, 8))::BIGINT % 100)"
    )


@fixture(
    "q_deterministic_sample",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_bucket_sql("CAST(doc_id AS VARCHAR)", "sample")} < 10
""",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str):
    """~10% sample of documents by content-hash of the key: map-side
    filter, no shuffle, reproducible across runs/retries/engines
    (rand()-based sampling is none of those)."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.deterministic_sample(docs, ["doc_id"], 10).select(
        "doc_id", "lang", "n_chars"
    )


@fixture(
    "q_train_test_split",
    oracle=f"""
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT n_chars,
         CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)", "split")} < 10
              THEN 'test' ELSE 'train' END AS split
  FROM documents
)
GROUP BY split
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str):
    """Deterministic 90/10 split, disjoint + exhaustive by
    construction; a row's membership never churns as data grows."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        cu.train_test_split(docs, ["doc_id"], test_percent=10)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@fixture(
    "q_stratified_sample",
    oracle=f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
FROM documents
WHERE {_bucket_sql("CAST(doc_id AS VARCHAR)", "strata")}
      < CASE WHEN lang = 'en' THEN 5 ELSE 50 END
GROUP BY lang
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str):
    """Per-stratum rates (downsample dominant 'en' to 5%, keep 50% of
    the tail) — the threshold is a CASE expression, so the filter stays
    map-side; no join, no shuffle before the count."""
    docs = load_table(spark, sf_dir, "documents")
    kept = cu.stratified_sample(
        docs, "lang", {"en": 5}, default_percent=50, key_cols=["doc_id"]
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


_DECONTAM_ORACLE = """
WITH train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
),
eval_set AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0
),
train_sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM train
    )
  ) WHERE i <= len(w) - 2
),
eval_sh AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i
    FROM (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM eval_set
    )
  ) WHERE i <= len(w) - 2
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM train_sh t
WHERE t.shingle IN (SELECT shingle FROM eval_sh)
GROUP BY t.doc_id
"""


@fixture("q_decontaminate", oracle=_DECONTAM_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str):
    """Benchmark decontamination: training docs sharing any word 3-gram
    with a held-out eval slice, with overlap counts. The eval shingle
    set is bounded (benchmarks are small by construction) so it
    broadcasts; the training corpus never shuffles — explode +
    broadcast semi join + partial-agg count."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 17 != 0)
    eval_set = docs.where(F.col("doc_id") % 17 == 0)
    return (
        cu.decontaminate(train, eval_set, "doc_id", "text", ngram=3)
        .select(F.col("id").alias("doc_id"), "n_hits")
    )


@fixture("q_bloom_decontaminate", oracle=_DECONTAM_ORACLE)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str):
    """Bloom-prefiltered decontamination: identical semantics (and the
    identical oracle) as q_decontaminate, but the corpus shingles never
    join the eval set — a broadcast 1-row bitset + k codegen'd bit
    tests prefilter map-side, and only the surviving sliver takes the
    exact verify join. The 100 TB regime this buys: an eval suite too
    big for a broadcast hash join whose ~2-bytes-per-shingle bloom
    still fits on every executor. Exact output (blooms have no false
    negatives; the verify join removes false positives) ⇒ full value
    oracle, not a rows-only check."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 17 != 0)
    eval_set = docs.where(F.col("doc_id") % 17 == 0)
    return (
        cu.bloom_decontaminate(train, eval_set, "doc_id", "text", ngram=3)
        .select(F.col("id").alias("doc_id"), "n_hits")
    )


@fixture(
    "q_pack_sequences",
    oracle="""
SELECT doc_id, lang, start_offset,
       CAST(floor(start_offset / 4096.0) AS BIGINT) AS chunk_id
FROM (
  SELECT doc_id, lang,
         CAST(coalesce(sum(n_chars) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM documents
)
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str):
    """Concat-and-chunk sequence packing: documents laid end-to-end per
    language in doc_id order, cut every 4096 tokens (n_chars as the
    token proxy); each doc is assigned the chunk where it starts. The
    sort is bounded per group — no corpus-wide total order."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.pack_sequences(
        docs,
        token_col="n_chars",
        budget=4096,
        partition_cols=["lang"],
        order_cols=[F.asc("doc_id")],
    ).select("doc_id", "lang", "start_offset", "chunk_id")


@fixture(
    "q_quality_quantile",
    oracle="""
WITH thr AS (
  SELECT lang, quantile_cont(n_chars, 0.75) AS threshold
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, round(t.threshold, 4) AS threshold
FROM documents d JOIN thr t ON d.lang = t.lang
WHERE d.n_chars >= t.threshold
""",
)
def q_quality_quantile(spark: SparkSession, sf_dir: str):
    """Top-quartile-per-language selection via aggregate-then-join:
    the exact P75 is one row per group (broadcast side), so the corpus
    is filtered map-side — no percent_rank window over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    kept = cu.quantile_threshold_filter(
        docs, "n_chars", ["lang"], q=0.75
    )
    return kept.select(
        "doc_id", "lang", "n_chars", F.round("threshold", 4).alias("threshold")
    )


@fixture(
    "q_cap_per_group",
    oracle="""
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 3
""",
)
def q_cap_per_group(spark: SparkSession, sf_dir: str):
    """At most 3 documents per language, by (longest, then doc_id) —
    deterministic survivor rule; one shuffle on the group key."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.cap_per_group(
        docs, ["lang"], [F.desc("n_chars"), F.asc("doc_id")], 3
    ).select("lang", "doc_id", "n_chars")


@fixture(
    "q_winsorize",
    oracle="""
WITH bounds AS (
  SELECT event_type,
         percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS lo,
         percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(least(greatest(e.value, b.lo), b.hi), 4) AS value_w
FROM events e JOIN bounds b USING (event_type)
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str):
    """Per-group outlier clamping at the [0.05, 0.95] quantiles —
    bounds by aggregation + broadcast join-back; the corpus never
    window-sorts."""
    from nextbus2pg_spark.operators.curation import winsorize

    ev = load_table(spark, sf_dir, "events")
    out = winsorize(ev, "value", ["event_type"], p_lo=0.05, p_hi=0.95)
    return out.select(
        "event_id", "event_type", F.round("value_w", 4).alias("value_w")
    )


@fixture(
    "q_line_dedup",
    oracle="""
WITH corpus AS (
  SELECT doc_id, replace(text, ' value ', ' | ') AS text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, replace(text, ' value ', ' | ')
  FROM documents WHERE doc_id % 10 = 0
),
parts AS (
  SELECT doc_id, string_split(text, ' | ') AS p FROM corpus
),
lines AS (
  SELECT doc_id, i - 1 AS pos, p[i] AS ln
  FROM parts, unnest(generate_series(1, len(p))) AS t(i)
  WHERE p[i] <> ''
),
o1 AS (SELECT ln, min(doc_id) AS odoc FROM lines GROUP BY ln),
owners AS (
  SELECT l.ln, o1.odoc, min(l.pos) AS opos
  FROM lines l JOIN o1 ON o1.ln = l.ln AND o1.odoc = l.doc_id
  GROUP BY 1, 2
),
kept AS (
  SELECT l.doc_id, l.pos, l.ln
  FROM lines l JOIN owners o
    ON o.ln = l.ln AND o.odoc = l.doc_id AND o.opos = l.pos
)
SELECT doc_id, string_agg(ln, ' | ' ORDER BY pos) AS text
FROM kept GROUP BY doc_id
""",
)
def q_line_dedup(spark: SparkSession, sf_dir: str):
    """C4-style corpus-wide line dedup: each distinct line survives
    only at its first (min doc_id, min position) occurrence; docs
    reassemble from their surviving lines. The fixture corpus injects
    full duplicate docs (id + 1,000,000 for every 10th doc) whose
    every line is a repeat — they must vanish entirely — and derives
    line boundaries deterministically (' value ' → ' | ') since the
    synthetic texts carry no natural punctuation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" value "), F.lit(" | ")).alias("text"),
    )
    return cu.line_dedup(corpus, "doc_id", "text", sep=" | ")


@fixture(
    "q_doc_chunks",
    oracle="""
SELECT doc_id,
       CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
       array_to_string(w[s:s+31], ' ') AS chunk_text,
       CAST(least(len(w) - s + 1, 32) AS INTEGER) AS n_tokens
FROM (
  SELECT doc_id, w, unnest(generate_series(1, greatest(len(w), 1), 24)) AS s
  FROM (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
    FROM documents
  )
)
WHERE least(len(w) - s + 1, 32) >= 8
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str):
    """Context-window chunking: 32-token chunks every 24 tokens (8-token
    overlap), dropping sub-8-token tails — per-row array arithmetic,
    zero shuffle (the per-document sibling of q_pack_sequences)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return cu.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, stride=24, min_tokens=8
    )


@fixture(
    "q_language_balance",
    oracle=f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT sum(n) AS t FROM counts),
w AS (SELECT lang, power(n / t, -0.5) AS w FROM counts, tot),
mw AS (SELECT max(w) AS mw FROM w),
rates AS (SELECT lang, least(1.0, w / mw) AS r FROM w, mw)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates USING (lang)
WHERE {_bucket_sql("CAST(doc_id AS VARCHAR)", "langbal").replace("% 100", "% 10000")}
      < CAST(floor(r * 10000) AS INTEGER)
""",
)
def q_language_balance(spark: SparkSession, sf_dir: str):
    """Temperature rebalancing at T=0.5: dominant languages
    down-sampled toward p^0.5 shares, the smallest kept whole, each
    keep decision a deterministic content-hash filter (mC4/ROOTS
    recipe; no RNG, no duplication)."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.language_balance(
        docs, "lang", ["doc_id"], temperature=0.5
    ).select("doc_id", "lang")


@fixture(
    "q_substring_dedup",
    oracle="""
WITH toks AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(array_to_string(words[i:i+4], ' ')), 1, 15))::BIGINT
           AS gram
  FROM toks, LATERAL UNNEST(generate_series(1, greatest(len(words) - 4, 0))) AS t(i)
  WHERE len(words) >= 5
),
marked AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY gram) AS cnt,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM grams
),
dup_occ AS (SELECT doc_id, pos FROM marked WHERE cnt > 1 AND rn > 1),
cov AS (
  SELECT doc_id,
         list_sort(list_distinct(flatten(list(generate_series(pos, pos + 4)))))
           AS covered
  FROM dup_occ GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(len(c.covered), 0) AS BIGINT) AS n_removed,
       CASE WHEN c.covered IS NULL THEN t.text
            ELSE coalesce(array_to_string(
              [t.words[i] for i in generate_series(1, len(t.words))
               if NOT list_contains(c.covered, i)],
              ' '), '')
       END AS text_dedup
FROM toks t LEFT JOIN cov c USING (doc_id)
""",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str):
    """ExactSubstr-style span dedup at n=5 word tokens: any 5-token
    run occurring twice anywhere in the corpus survives only at its
    first (min doc, min pos) occurrence; other occurrences' tokens are
    cut and the text reassembled. The oracle replays the identical
    owner rule with window functions; the Spark plan uses a min-struct
    hash aggregation instead of a corpus-wide sort (n=5, not the
    production 50, so the synthetic corpus actually collides)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return cu.substring_span_dedup(
        docs, "doc_id", "text", n=5, out_col="text_dedup"
    )


@fixture(
    "q_contamination_frac",
    oracle="""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
),
eval_set AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0
),
train_sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM train
    )
  ) WHERE i <= len(w) - 2
),
eval_sh AS (
  SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
  FROM (
    SELECT w, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i
    FROM (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM eval_set
    )
  ) WHERE i <= len(w) - 2
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(e.shingle) AS BIGINT) AS n_hits,
       count(e.shingle) / CAST(count(*) AS DOUBLE) AS contamination
FROM train_sh t
LEFT JOIN eval_sh e USING (shingle)
GROUP BY t.doc_id
""",
)
def q_contamination_frac(spark: SparkSession, sf_dir: str):
    """Continuous contamination scoring: per training document, the
    fraction of its distinct word 3-grams shared with the held-out
    eval slice — q_decontaminate's boolean gate upgraded to a
    thresholdable score; same broadcast-eval shape, corpus text never
    shuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 17 != 0)
    eval_set = docs.where(F.col("doc_id") % 17 == 0)
    return cu.contamination_fraction(
        train, eval_set, "doc_id", "text", ngram=3
    ).select(F.col("id").alias("doc_id"), "n_shingles", "n_hits", "contamination")


@fixture(
    "q_weighted_sample",
    oracle="""
WITH pri AS (
  SELECT doc_id, lang, n_chars,
         ln((('0x' || substr(md5('wsample:' || doc_id), 1, 13))::BIGINT + 1)
            / 4503599627370496.0) / n_chars AS p
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY p DESC, doc_id) AS rn
  FROM pri
)
SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 20
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str):
    """Weighted reservoir sample (A-Res), 20 docs per language with
    inclusion probability proportional to document length — the
    importance-sampling step between hard quality filters and uniform
    hash sampling. Deterministic md5-uniform priorities, so the oracle
    replays the identical ranking."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.weighted_sample(
        docs, ["doc_id"], "n_chars", k=20, group_cols=["lang"]
    ).select("doc_id", "lang", "n_chars")


# -- URL canonicalization (operators/url.py) ---------------------------
#
# documents carries no URL column, so both engines construct the SAME
# deterministic per-doc URL (4 shapes by doc_id % 4, exercising case,
# www, default ports, tracking params, fragments, root slash, and a
# co.uk public-suffix domain) and then normalize it. The DuckDB chain
# below is the step-for-step contract of operators/url.py — every
# regex is anchored/single-match so RE2 first-match and Java
# replace-all agree (see the module docstring).

_URL_RAW_SQL = """
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN 'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM:443/'
           WHEN 1 THEN 'http://' || source || '.example.co.uk:80/docs/'
                       || CAST(doc_id AS VARCHAR) || '?utm_source=x&b=2&a=1'
           WHEN 2 THEN 'HTTP://' || source || '.Example.COM/Dir/'
                       || CAST(doc_id AS VARCHAR) || '#sec'
           ELSE 'https://sub.' || source || '.example.org/p?id='
                || CAST(doc_id AS VARCHAR) || '&utm_campaign=c&ref=r'
         END AS u
  FROM documents
"""

_URL_NORM_CTES = r"""
s2 AS (SELECT doc_id, regexp_replace(trim(u), '#.*', '') AS u FROM raw),
s3p AS (SELECT doc_id, u,
         regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)', 1) AS a
        FROM s2),
s3 AS (SELECT doc_id,
        CASE WHEN a <> '' THEN lower(a) || substring(u, length(a)+1)
             ELSE u END AS u FROM s3p),
s4 AS (SELECT doc_id,
        regexp_replace(
          regexp_replace(u, '^(http://[^/?#:]*):80([/?#].*)?$', '\1\2'),
          '^(https://[^/?#:]*):443([/?#].*)?$', '\1\2') AS u FROM s3),
s5 AS (SELECT doc_id,
        regexp_replace(u, '^([a-z][a-z0-9+.\-]*)://www\.', '\1://') AS u
       FROM s4),
s6 AS (SELECT doc_id,
        regexp_replace(split_part(u, '?', 1),
                       '^([a-z][a-z0-9+.\-]*://[^/?#]+)/$', '\1') AS base,
        CASE WHEN position('?' IN u) > 0
             THEN substring(u, length(split_part(u, '?', 1)) + 2)
             ELSE '' END AS q
       FROM s5),
s7 AS (SELECT doc_id, base,
        COALESCE(array_to_string(list_sort(list_filter(string_split(q, '&'),
          t -> NOT (t LIKE 'utm\_%' ESCAPE '\' OR t LIKE 'fbclid=%'
                    OR t LIKE 'gclid=%' OR t LIKE 'ref=%' OR t = ''))),
          '&'), '') AS qs
       FROM s6),
s8 AS (SELECT doc_id,
        CASE WHEN qs = '' THEN base ELSE base || '?' || qs END AS norm_url
       FROM s7),
s9 AS (SELECT doc_id, norm_url,
        regexp_extract(norm_url,
                       '^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)', 1) AS host
       FROM s8),
s10 AS (SELECT doc_id, norm_url, host,
         string_split(host, '.') AS labels,
         len(string_split(host, '.')) AS n FROM s9),
normed AS (
  SELECT doc_id, norm_url, host,
    CASE WHEN n <= 2 THEN host
         WHEN length(labels[n]) = 2
              AND labels[n-1] IN ('co','com','net','org','ac','gov','edu')
           THEN array_to_string(labels[n-2:n], '.')
         ELSE array_to_string(labels[n-1:n], '.') END AS domain
  FROM s10
)
"""


def _doc_url_col():
    shape = (F.col("doc_id") % 4).cast("int")
    did = F.col("doc_id").cast("string")
    return (
        F.when(shape == 0, F.concat(
            F.lit("HTTPS://WWW."), F.upper("source"), F.lit(".EXAMPLE.COM:443/")))
        .when(shape == 1, F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.co.uk:80/docs/"),
            did, F.lit("?utm_source=x&b=2&a=1")))
        .when(shape == 2, F.concat(
            F.lit("HTTP://"), F.col("source"), F.lit(".Example.COM/Dir/"),
            did, F.lit("#sec")))
        .otherwise(F.concat(
            F.lit("https://sub."), F.col("source"), F.lit(".example.org/p?id="),
            did, F.lit("&utm_campaign=c&ref=r")))
    )


@fixture(
    "q_url_canon",
    oracle=f"""
WITH raw AS ({_URL_RAW_SQL}),
{_URL_NORM_CTES}
SELECT doc_id, norm_url, host, domain FROM normed
""",
)
def q_url_canon(spark: SparkSession, sf_dir: str):
    """Canonical URL + host + registrable domain for every document:
    one pure-codegen projection chain (regex/split/array ops), zero
    shuffle — the scan-speed key-derivation step before any per-URL
    dedup or per-domain policy at crawl scale."""
    from nextbus2pg_spark.operators import url as u

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", _doc_url_col().alias("u"))
        .select("doc_id", u.normalize_url(F.col("u")).alias("norm_url"))
        .withColumn("host", u.url_host(F.col("norm_url")))
        .withColumn("domain", u.registrable_domain(F.col("host")))
    )


@fixture(
    "q_domain_cap",
    oracle=f"""
WITH raw AS ({_URL_RAW_SQL}),
{_URL_NORM_CTES}
SELECT doc_id, domain FROM (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
  FROM normed
) WHERE rn <= 3
""",
)
def q_domain_cap(spark: SparkSession, sf_dir: str):
    """Per-registrable-domain document cap (keep the 3 lowest doc_ids
    per domain): the anti-monoculture step of a crawl pipeline. One
    shuffle on the domain key; the cap itself is exactly the skew
    remover — no domain contributes more than max_per_domain rows
    downstream."""
    from nextbus2pg_spark.operators import url as u

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", _doc_url_col().alias("url"))
    return u.domain_cap(d, "url", max_per_domain=3, order_col="doc_id").select(
        "doc_id", "domain"
    )


# Shared PSL fixture rules: one literal drives BOTH the Spark rule
# frame and the oracle's VALUES list, so the two engines can never see
# different lists. Covers plain, multi-label, wildcard, exception and
# private-registry rules plus bare TLDs.
_PSL_RULES = (
    "com", "uk", "co.uk", "jp", "aichi.jp", "pref.aichi.jp",
    "mx", "gob.mx", "ck", "*.ck", "!www.ck", "io", "github.io",
)

# 8 host shapes by doc_id % 8, exercising every PSL rule class; the
# same expression is written twice (Spark Column / DuckDB CASE) below.
_PSL_HOST_SQL = """
  SELECT doc_id,
         CASE CAST(doc_id % 8 AS INT)
           WHEN 0 THEN source || '.example.com'
           WHEN 1 THEN 'deep.sub.' || source || '.co.uk'
           WHEN 2 THEN 'city' || CAST(doc_id % 3 AS VARCHAR)
                       || '.pref.aichi.jp'
           WHEN 3 THEN 'tramites' || CAST(doc_id % 3 AS VARCHAR)
                       || '.gob.mx'
           WHEN 4 THEN 'foo.bar' || CAST(doc_id % 3 AS VARCHAR) || '.ck'
           WHEN 5 THEN CASE WHEN doc_id % 2 = 1
                            THEN 'sub.www.ck' ELSE 'www.ck' END
           WHEN 6 THEN 'user' || CAST(doc_id % 3 AS VARCHAR)
                       || '.github.io'
           ELSE CASE WHEN doc_id % 2 = 1
                     THEN 'host.unknowntld' ELSE 'co.uk' END
         END AS host
  FROM documents
"""


def _psl_host_col():
    shape = (F.col("doc_id") % 8).cast("int")
    v3 = (F.col("doc_id") % 3).cast("string")
    odd = F.col("doc_id") % 2 == 1
    return (
        F.when(shape == 0, F.concat(F.col("source"), F.lit(".example.com")))
        .when(shape == 1, F.concat(
            F.lit("deep.sub."), F.col("source"), F.lit(".co.uk")))
        .when(shape == 2, F.concat(
            F.lit("city"), v3, F.lit(".pref.aichi.jp")))
        .when(shape == 3, F.concat(
            F.lit("tramites"), v3, F.lit(".gob.mx")))
        .when(shape == 4, F.concat(F.lit("foo.bar"), v3, F.lit(".ck")))
        .when(shape == 5, F.when(odd, F.lit("sub.www.ck"))
              .otherwise(F.lit("www.ck")))
        .when(shape == 6, F.concat(F.lit("user"), v3, F.lit(".github.io")))
        .otherwise(F.when(odd, F.lit("host.unknowntld"))
                   .otherwise(F.lit("co.uk")))
    )


_PSL_RULE_VALUES = ", ".join(f"('{r}')" for r in _PSL_RULES)


@fixture(
    "q_url_psl",
    oracle=f"""
WITH hostsrc AS ({_PSL_HOST_SQL}),
rules(rule) AS (VALUES {_PSL_RULE_VALUES}),
prules AS (
  SELECT CASE WHEN rule LIKE '!%' THEN substring(rule, 2)
              ELSE rule END AS match_str,
         rule LIKE '!%' AS is_exc
  FROM rules
),
prules2 AS (
  SELECT match_str, is_exc,
         len(string_split(match_str, '.')) AS m,
         CASE WHEN is_exc THEN len(string_split(match_str, '.')) - 1
              ELSE len(string_split(match_str, '.')) END AS ps_len
  FROM prules
),
hosts AS (SELECT DISTINCT host FROM hostsrc),
hl AS (
  SELECT host, string_split(host, '.') AS labels,
         len(string_split(host, '.')) AS n
  FROM hosts
),
cand AS (
  SELECT hl.host, hl.labels, hl.n, k.k AS k
  FROM hl, unnest(generate_series(1, least(hl.n, 5))) AS k(k)
),
cand2 AS (
  SELECT host, array_to_string(labels[n-k+1:n], '.') AS c FROM cand
  UNION ALL
  SELECT host, CASE WHEN k >= 2
                    THEN '*.' || array_to_string(labels[n-k+2:n], '.')
                    ELSE '*' END AS c
  FROM cand
),
best AS (
  SELECT host, ps_len FROM (
    SELECT c2.host, p.ps_len,
           row_number() OVER (
             PARTITION BY c2.host
             ORDER BY p.is_exc DESC, p.m DESC, p.ps_len DESC
           ) AS rn
    FROM cand2 c2 JOIN prules2 p ON c2.c = p.match_str
  ) WHERE rn = 1
),
mapping AS (
  SELECT hl.host,
         CASE WHEN hl.n > COALESCE(b.ps_len, 1)
              THEN array_to_string(
                hl.labels[hl.n - COALESCE(b.ps_len, 1):hl.n], '.')
         END AS domain
  FROM hl LEFT JOIN best b ON hl.host = b.host
)
SELECT s.doc_id, s.host, m.domain
FROM hostsrc s LEFT JOIN mapping m ON s.host = m.host
""",
)
def q_url_psl(spark: SparkSession, sf_dir: str):
    """Exact public-suffix-list eTLD+1 for every document host
    (operators/url.psl_registrable_domain): plain, MULTI-LABEL
    (pref.aichi.jp), long-tail (gob.mx), wildcard (*.ck), exception
    (!www.ck) and private-registry (github.io) rules, the implicit
    '*' fallback, and NULL for bare public suffixes — the oracle
    replays the publicsuffix.org prevailing-rule algorithm
    independently in SQL. Scale shape: per-DISTINCT-host bounded
    candidate explode joined to the ~10k-row global rule table, then
    one join back on the host key."""
    from nextbus2pg_spark.operators.url import psl_registrable_domain

    docs = load_table(spark, sf_dir, "documents")
    rules = spark.createDataFrame(
        [(r,) for r in _PSL_RULES], "suffix string"
    )
    d = docs.select("doc_id", _psl_host_col().alias("host"))
    return psl_registrable_domain(d, "host", rules, out_col="domain")


@fixture(
    "q_epoch_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5('epoch1:' ||
            COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null')), 1, 15))
           ::BIGINT AS shuffle_key
  FROM documents
),
sharded AS (
  SELECT doc_id, shuffle_key,
         CAST(shuffle_key % 8 AS INTEGER) AS shard
  FROM keyed
)
SELECT doc_id, shuffle_key, shard,
       CAST(row_number() OVER (
         PARTITION BY shard ORDER BY shuffle_key, doc_id
       ) AS INTEGER) AS pos
FROM sharded
""",
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str):
    """Epoch-1 deterministic training-order shuffle of documents into
    8 shards with within-shard positions — the shard-export step of a
    training pipeline (operators/curation.epoch_shuffle): same epoch
    ⇒ same permutation on any engine/retry; next epoch re-salts into
    an independent order. Hash derivation is map-side; the only
    ordering work is per-shard (the window here proves the order —
    the export itself uses repartition + sortWithinPartitions, never
    a global sort)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    out = cu.epoch_shuffle(docs, ["doc_id"], epoch=1, n_shards=8)
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return out.select(
        "doc_id", "shuffle_key", "shard",
        F.row_number().over(w).alias("pos"),
    )


@fixture(
    "q_token_budget_mixture",
    oracle="""
WITH totals AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS st
  FROM documents GROUP BY source
),
j AS (
  SELECT d.doc_id, d.source, d.n_chars,
         CASE d.source WHEN 'src0' THEN 3 WHEN 'src1' THEN 1
                       WHEN 'src2' THEN 1 ELSE 0 END AS w,
         t.st
  FROM documents d JOIN totals t USING (source)
)
SELECT doc_id, source, n_chars
FROM j
WHERE (('0x' || substr(md5('mixture:'
         || COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null')), 1, 8))::BIGINT
       % 1000000)
      < CASE WHEN w = 0 THEN 0
             ELSE least(1000000,
                        coalesce((CAST(6000 AS BIGINT) * w * 1000000)
                                 // NULLIF(5 * st, 0), 1000000))
        END
""",
)
def q_token_budget_mixture(spark: SparkSession, sf_dir: str):
    """Mixture sampling to a total token budget (n_chars as the token
    proxy): sources src0:src1:src2 weighted 3:1:1 toward 6000 total
    tokens, every other source dropped
    (curation.token_budget_mixture). One bounded per-source aggregate
    broadcasts back; the keep decision is a map-side hash filter with
    an EXACT-integer threshold, so the kept set replays bit-stable in
    DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    out = cu.token_budget_mixture(
        docs, "source", "n_chars",
        weights={"src0": 3, "src1": 1, "src2": 1},
        token_budget=6000, key_cols=["doc_id"],
    )
    return out.select("doc_id", "source", "n_chars")


@fixture(
    "q_mixture_audit",
    oracle="""
WITH srcs(source, w) AS (VALUES ('src0', 3), ('src1', 1), ('src2', 1)),
agg AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS st
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
  GROUP BY source
),
totals AS (
  SELECT s.source, s.w, COALESCE(a.st, 0) AS st
  FROM srcs s LEFT JOIN agg a USING (source)
),
j AS (
  SELECT d.doc_id, d.source, d.n_chars, t.w, t.st
  FROM documents d JOIN totals t USING (source)
),
kept AS (
  SELECT source, n_chars FROM j
  WHERE (('0x' || substr(md5('mixture:'
           || COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null')), 1, 8))
           ::BIGINT % 1000000)
        < CASE WHEN st = 0 THEN 1000000
               ELSE least(1000000,
                          (CAST(6000 AS BIGINT) * w * 1000000) // (5 * st))
          END
),
k AS (
  SELECT source, count(*) AS kept_docs,
         CAST(sum(n_chars) AS BIGINT) AS kept_tokens
  FROM kept GROUP BY source
),
tgt AS (
  SELECT t.source, t.st AS total_tokens,
         CAST(CAST(6000 AS BIGINT) * t.w // 5 AS BIGINT) AS target_tokens,
         COALESCE(k.kept_docs, 0) AS kept_docs,
         COALESCE(k.kept_tokens, 0) AS kept_tokens
  FROM totals t LEFT JOIN k USING (source)
)
SELECT source, total_tokens, target_tokens, kept_docs, kept_tokens,
       kept_tokens - target_tokens AS excess_tokens
FROM tgt
""",
)
def q_mixture_audit(spark: SparkSession, sf_dir: str):
    """Realized-vs-target audit of the same 3:1:1 / 6000-token mixture
    as q_token_budget_mixture (curation.mixture_audit): per source,
    input tokens, exact-integer target, kept docs/tokens, and the
    signed excess — the sampler is correct-in-expectation and this is
    the row a data lead reads to see the realized quantization error
    before training. All-integer arithmetic, so the oracle replays the
    audit bit-identically."""
    docs = load_table(spark, sf_dir, "documents")
    return cu.mixture_audit(
        docs, "source", "n_chars",
        weights={"src0": 3, "src1": 1, "src2": 1},
        token_budget=6000, key_cols=["doc_id"],
    )


@fixture(
    "q_dsir_sample",
    oracle="""
WITH cand AS (
  SELECT doc_id, text FROM documents
  WHERE NOT (lang = 'en' AND source = 'src1')
),
tgt AS (
  SELECT doc_id, text FROM documents
  WHERE lang = 'en' AND source = 'src1'
),
cw AS (
  SELECT doc_id, list_filter(string_split(text, ' '), g -> g <> '') AS w
  FROM cand
),
tw AS (
  SELECT doc_id, list_filter(string_split(text, ' '), g -> g <> '') AS w
  FROM tgt
),
cgrams AS (
  SELECT doc_id, unnest(w) AS gram FROM cw
  UNION ALL
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
  FROM cw, unnest(range(1, len(w))) AS t(i)
),
tgrams AS (
  SELECT doc_id, unnest(w) AS gram FROM tw
  UNION ALL
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
  FROM tw, unnest(range(1, len(w))) AS t(i)
),
cb AS (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 6))::BIGINT % 256 AS bucket
  FROM cgrams
),
tb AS (
  SELECT ('0x' || substr(md5(gram), 1, 6))::BIGINT % 256 AS bucket
  FROM tgrams
),
grid AS (SELECT unnest(generate_series(0, 255)) AS bucket),
tc AS (SELECT bucket, count(*) AS tn FROM tb GROUP BY bucket),
sc AS (SELECT bucket, count(*) AS sn FROM cb GROUP BY bucket),
r AS (
  SELECT grid.bucket, coalesce(tn, 0) AS tn, coalesce(sn, 0) AS sn
  FROM grid LEFT JOIN tc USING (bucket) LEFT JOIN sc USING (bucket)
),
tot AS (SELECT sum(tn) AS tt, sum(sn) AS st FROM r),
lr AS (
  SELECT bucket,
         ln(CAST(tn AS DOUBLE) + 1.0) + ln(CAST(st AS DOUBLE) + 256.0)
         - ln(CAST(sn AS DOUBLE) + 1.0) - ln(CAST(tt AS DOUBLE) + 256.0)
           AS lrv
  FROM r, tot
),
dc AS (
  SELECT doc_id, bucket, count(*) AS cn FROM cb GROUP BY doc_id, bucket
),
terms AS (
  SELECT dc.doc_id, dc.bucket, dc.cn * lr.lrv AS term
  FROM dc JOIN lr USING (bucket)
),
scores AS (
  SELECT doc_id,
         list_reduce(list(term ORDER BY bucket),
                     (acc2, x2) -> acc2 + x2) AS score
  FROM terms GROUP BY doc_id
)
SELECT doc_id AS id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rank
FROM scores
ORDER BY score DESC, doc_id
LIMIT 100
""",
)
def q_dsir_sample(spark: SparkSession, sf_dir: str):
    """DSIR importance resampling (operators/curation.dsir_sample,
    Xie et al. 2023): target domain = the en/src1 slice of the
    documents table; candidates = everything else; hashed unigram +
    bigram multinomials with +1 smoothing; top-100 most target-like
    candidates by the 4-term log-ratio score. The oracle regenerates
    the identical md5 buckets, smoothed counts, and per-document
    bucket-ordered folds; scores order only (the q_weighted_sample
    transcendental stance), and the emitted (id, rank) pairs
    hash-match exactly."""
    docs = load_table(spark, sf_dir, "documents")
    is_target = (F.col("lang") == "en") & (F.col("source") == "src1")
    return cu.dsir_sample(
        docs.where(~is_target),
        docs.where(is_target),
        "doc_id",
        "text",
        n_buckets=256,
        k=100,
    )
