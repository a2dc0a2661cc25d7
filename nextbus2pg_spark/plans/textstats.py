"""Corpus-statistics fixture queries (operators/textstats.py):
TF-IDF top terms per document and corpus bigram frequencies, both
DuckDB-oracle-checked. FP portability: ln() is IEEE-identical in both
engines for identical inputs; scores are rounded in-query on both
sides (oracle-portability rule: round every FP aggregate)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators import textstats as ts
from nextbus2pg_spark.plans.registry import fixture


@fixture(
    "q_tfidf_topterms",
    oracle="""
WITH terms AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms GROUP BY doc_id, term
),
docfreq AS (
  SELECT term, count(DISTINCT doc_id) AS docfreq FROM terms GROUP BY term
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln(n.n_docs / docfreq.docfreq) AS score
  FROM tf JOIN docfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, round(score, 4) AS score,
       CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term
  ) AS rn FROM scored
) WHERE rn <= 3
""",
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str):
    """Top-3 characteristic terms per document by TF-IDF. The IDF
    table is vocabulary-sized and broadcasts onto the TF relation —
    the corpus-sized side never shuffles for the join; corpus size N
    enters as a broadcast 1-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    out = ts.top_terms_per_doc(docs, "doc_id", "text", k=3)
    return out.select(
        F.col("id").alias("doc_id"),
        "term",
        "tf",
        F.round("score", 4).alias("score"),
        "rn",
    )


@fixture(
    "q_bigram_counts",
    oracle="""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS ngram
  FROM words, unnest(range(1, len(w))) AS t(i)
)
SELECT ngram,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM grams GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT 20
""",
)
def q_bigram_counts(spark: SparkSession, sf_dir: str):
    """Top-20 corpus bigrams (count + document reach from one
    aggregation), deterministic tie-break on the bigram text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        ts.ngram_counts(docs, "doc_id", "text", n=2)
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(20)
    )


@fixture(
    "q_vocab",
    oracle="""
WITH terms AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM terms GROUP BY term
  HAVING count(*) >= 5
)
SELECT term, n_occurrences, n_docs,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, term) - 1
            AS BIGINT) AS token_id
FROM counts
""",
)
def q_vocab(spark: SparkSession, sf_dir: str):
    """Token vocabulary with frequency-ranked contiguous ids (min
    count 5) — the tokenizer-training precursor. One hash agg over the
    exploded corpus; the ranking window runs over the bounded
    vocabulary, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.build_vocab(docs, "doc_id", "text", min_count=5)


@fixture(
    "q_oov_ratio",
    oracle="""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS ngram
  FROM words, LATERAL UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
model AS (
  SELECT ngram FROM (
    SELECT ngram, count(*) AS c FROM grams GROUP BY ngram
  ) QUALIFY row_number() OVER (ORDER BY c DESC, ngram) <= 500
),
scored AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN m.ngram IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM grams g LEFT JOIN model m USING (ngram)
  GROUP BY g.doc_id
)
SELECT doc_id AS id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_oov AS BIGINT) AS n_oov,
       round(CAST(n_oov AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS oov_ratio
FROM scored
""",
)
def q_oov_ratio(spark: SparkSession, sf_dir: str):
    """Out-of-vocabulary bigram ratio per document against a top-500
    corpus bigram model — integer-exact LM-lite quality filtering (see
    operators/textstats.oov_ngram_ratio). Model bounded + broadcast;
    one groupBy(id) scoring pass."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.oov_ngram_ratio(docs, "doc_id", "text", n=2, top_k=500)


@fixture(
    "q_bm25_topk",
    oracle="""
WITH terms AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS dl,
         CAST(sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS BIGINT)
           AS tf0,
         CAST(sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) AS BIGINT)
           AS tf1,
         CAST(sum(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS BIGINT)
           AS tf2
  FROM terms GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
  FROM per_doc
),
scored AS (
  SELECT doc_id AS id,
         round(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                    / (CAST(df0 AS DOUBLE) + 0.5))
             * CAST(tf0 AS DOUBLE) * 2.2
             / (CAST(tf0 AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                    / (CAST(df1 AS DOUBLE) + 0.5))
             * CAST(tf1 AS DOUBLE) * 2.2
             / (CAST(tf1 AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                    / (CAST(df2 AS DOUBLE) + 0.5))
             * CAST(tf2 AS DOUBLE) * 2.2
             / (CAST(tf2 AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         , 6) AS score
  FROM per_doc CROSS JOIN stats
)
SELECT id, score,
       CAST(row_number() OVER (ORDER BY score DESC, id) AS INTEGER)
         AS "rank"
FROM scored WHERE score > 0
ORDER BY score DESC, id LIMIT 10
""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str):
    """BM25 top-10 for the bag-of-terms query {spark, vector, merge} —
    lexical retrieval over the documents table (the sparse complement
    of the dense ANN rungs). Deterministic by construction: every
    model input (tf, df, dl, N, sum_dl) is an exact integer and the
    per-term double scores combine in fixed query order, so the DuckDB
    oracle replays the identical expression tree (see
    operators/textstats.bm25_topk). One tokenize pass; top-k is a
    sort-limit, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.bm25_topk(
        docs, "doc_id", "text", ["spark", "vector", "merge"], k=10
    )


def _bpe_oracle_sql(
    n_merges: int,
    min_freq: int = 2,
    eow: str = "▁",
    final: str = "merges",
) -> str:
    """DuckDB replay of BPE training with the iteration loop UNROLLED
    as CTE pairs (p{k}: weighted pair counts, m{k}: best pair, s{k}:
    symbols after applying merge k). The greedy left-to-right merge is
    the same left fold as operators/bpe._apply_merge, expressed with
    ``list_reduce`` over singleton-wrapped symbols (list_reduce seeds
    the accumulator with the FIRST element, and a lone first symbol
    can never merge — identical semantics to Spark's empty-seeded
    ``F.aggregate``). All inputs are exact integers; ordering (cnt
    DESC, a, b) is binary-collation identical in both engines, so the
    replay is merge-for-merge exact, which turns iterative tokenizer
    training from a rows-only entry into a full value-hash oracle.

    ``final='merges'`` emits the learned merge table;
    ``final='token_counts'`` reuses the LAST symbol table — s{n} IS
    the fully encoded vocabulary — and joins every document's word
    occurrences against it to replay ``bpe_encode``'s per-document
    token counts (NULL/empty text → 0 tokens, matching encode).

    Early merge exhaustion (no pair reaches ``min_freq`` before
    iteration n, where ``bpe_train`` breaks) is replayed by the LEFT
    JOIN on the possibly-empty best-pair CTE: s{k} passes symbols
    through unchanged instead of going empty via a cross join — a
    corpus with fewer learnable merges than ``n_merges`` still gets
    correct token counts, not all-zero."""
    ctes = [f"""w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word
    FROM documents WHERE text IS NOT NULL
  ) WHERE word <> '' GROUP BY word
),
s0 AS (
  SELECT word, freq,
         list_append(string_split(word, ''), '{eow}') AS syms
  FROM w0
)"""]
    sel = []
    for k in range(1, n_merges + 1):
        p = f"s{k - 1}"
        ctes.append(f"""p{k} AS (
  SELECT s.syms[i.i] AS a, s.syms[i.i + 1] AS b, sum(s.freq) AS cnt
  FROM {p} s, LATERAL (SELECT unnest(range(1, len(s.syms))) AS i) i
  GROUP BY 1, 2 HAVING sum(s.freq) >= {min_freq}
),
m{k} AS (SELECT a, b FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
s{k} AS (
  SELECT s.word, s.freq,
    CASE WHEN m.a IS NULL THEN s.syms ELSE list_reduce(
      list_transform(s.syms, x -> [x]),
      (acc, x) -> CASE WHEN acc[len(acc)] = m.a AND x[1] = m.b
        THEN acc[1:len(acc) - 1] || [m.a || m.b]
        ELSE acc || x END
    ) END AS syms
  FROM {p} s LEFT JOIN m{k} m ON TRUE
)""")
        sel.append(
            f'SELECT CAST({k - 1} AS INTEGER) AS merge_rank, a AS "left",'
            f' b AS "right", a || b AS token FROM m{k}'
        )
    if final == "token_counts":
        tail = f"""SELECT d.doc_id,
       CAST(COALESCE(sum(len(v.syms)), 0) AS BIGINT) AS n_tokens
FROM documents d
LEFT JOIN (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE text IS NOT NULL
  ) WHERE word <> ''
) w ON d.doc_id = w.doc_id
LEFT JOIN s{n_merges} v ON w.word = v.word
GROUP BY d.doc_id"""
    elif final == "fertility":
        # per-language tokenizer fertility (tokens/word) + compression
        # (chars/token) over the SAME encoded vocabulary join.
        tail = f"""SELECT d.lang,
       CAST(COALESCE(sum(len(v.syms)), 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sum(CASE WHEN w.word IS NULL THEN 0 ELSE 1 END), 0)
            AS BIGINT) AS n_words,
       CAST(COALESCE(sum(length(w.word)), 0) AS BIGINT) AS n_chars,
       CASE WHEN COALESCE(sum(CASE WHEN w.word IS NULL THEN 0 ELSE 1 END),
                          0) = 0 THEN NULL
            ELSE round(CAST(COALESCE(sum(len(v.syms)), 0) AS DOUBLE)
                       / CAST(sum(CASE WHEN w.word IS NULL THEN 0 ELSE 1
                                  END) AS DOUBLE), 6) END AS fertility,
       CASE WHEN COALESCE(sum(len(v.syms)), 0) = 0 THEN NULL
            ELSE round(CAST(COALESCE(sum(length(w.word)), 0) AS DOUBLE)
                       / CAST(sum(len(v.syms)) AS DOUBLE), 6)
            END AS compression
FROM documents d
LEFT JOIN (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE text IS NOT NULL
  ) WHERE word <> ''
) w ON d.doc_id = w.doc_id
LEFT JOIN s{n_merges} v ON w.word = v.word
GROUP BY d.lang"""
    else:
        tail = "\nUNION ALL\n".join(sel)
    return "WITH " + ",\n".join(ctes) + "\n" + tail


@fixture("q_bpe_merges", oracle=_bpe_oracle_sql(10))
def q_bpe_merges(spark: SparkSession, sf_dir: str):
    """First 10 BPE merge rules learned from the documents corpus
    (operators/bpe.bpe_train): one corpus pass builds word
    frequencies, then every iteration runs on the vocabulary-sized
    symbol table — 10 merges cost 10 tiny jobs, not 10 corpus scans.
    Deterministic (frequency ties break lexicographically), so the
    DuckDB oracle replays training merge-for-merge (see
    ``_bpe_oracle_sql``); tests/test_bpe.py additionally pins the
    trainer to a pure-Python reference on randomized corpora."""
    from nextbus2pg_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "merge_rank int, left string, right string, token string",
    )


@fixture("q_bpe_token_count", oracle=_bpe_oracle_sql(10, final="token_counts"))
def q_bpe_token_count(spark: SparkSession, sf_dir: str):
    """End-to-end tokenizer: train 10 BPE merges on the documents
    corpus, ENCODE every document with them (operators/bpe.bpe_encode,
    the Arrow/mapInPandas path — the merge list ships in the closure,
    no join, output rows = input rows), and emit per-document token
    counts. The oracle replays training via the unrolled-CTE fold and
    encoding by joining word occurrences against the final symbol
    table (s10 = the fully encoded vocabulary), so BOTH halves of the
    tokenizer are value-hash checked — encode is deterministic given
    the merges, and the merges are deterministic given the corpus."""
    from nextbus2pg_spark.operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    enc = bpe_encode(docs, "doc_id", "text", merges)
    return enc.select(F.col("id").alias("doc_id"), "n_tokens")


#: Shared Laplace-bigram-LM oracle chain ending in ``folded(doc_id,
#: n_bigrams, s)`` — q_lm_logprob emits the scores; q_ccnet_buckets
#: buckets them per language.
_LM_FOLDED_CTE = """
WITH words AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM words, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
m AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
  FROM grams GROUP BY 1, 2, 3
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM grams GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
vocab AS (
  SELECT count(*) AS v FROM (
    SELECT DISTINCT w FROM (
      SELECT w1 AS w FROM grams UNION SELECT w2 FROM grams
    )
  )
),
lp AS (
  SELECT m.doc_id, m.w1, m.w2, m.m,
         CAST(m.m AS DOUBLE)
           * ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(ctx.c1 + vocab.v AS DOUBLE))
           AS lp
  FROM m JOIN c2 USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
),
folded AS (
  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         list_reduce(
           list_transform(
             list_sort(list(struct_pack(w1 := w1, w2 := w2, lp := lp))),
             s -> s.lp
           ),
           (acc, x) -> acc + x
         ) AS s
  FROM lp GROUP BY doc_id
)
"""


@fixture(
    "q_lm_logprob",
    oracle="""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM words, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
m AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
  FROM grams GROUP BY 1, 2, 3
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM grams GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
vocab AS (
  SELECT count(*) AS v FROM (
    SELECT DISTINCT w FROM (
      SELECT w1 AS w FROM grams UNION SELECT w2 FROM grams
    )
  )
),
lp AS (
  SELECT m.doc_id, m.w1, m.w2, m.m,
         CAST(m.m AS DOUBLE)
           * ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(ctx.c1 + vocab.v AS DOUBLE))
           AS lp
  FROM m JOIN c2 USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
),
folded AS (
  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         list_reduce(
           list_transform(
             list_sort(list(struct_pack(w1 := w1, w2 := w2, lp := lp))),
             s -> s.lp
           ),
           (acc, x) -> acc + x
         ) AS s
  FROM lp GROUP BY doc_id
)
SELECT doc_id, n_bigrams, round(s, 6) AS sum_logprob,
       round(s / n_bigrams, 6) AS avg_logprob
FROM folded
""",
)
def q_lm_logprob(spark: SparkSession, sf_dir: str):
    """Per-document log-probability under a Laplace-smoothed bigram
    LM trained on the corpus itself (textstats.bigram_logprob) — the
    CCNet-style perplexity-filter rung. Exact-integer model inputs;
    the per-doc total is a left fold over the (w1, w2)-sorted
    contribution list, so DuckDB's list_reduce replays the double sum
    bit-for-bit regardless of Spark's partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    out = ts.bigram_logprob(docs, "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"), "n_bigrams", "sum_logprob",
        "avg_logprob",
    )


_CLF_DIM = 1024
_CLF_LR = 0.1
_CLF_ITERS = 16

#: Left fold over the key-sorted (k, v) struct list — replays Spark's
#: F.aggregate(array_sort(collect_list(struct)), 0.0, +) exactly.
_CLF_FOLD = (
    "list_reduce(list_transform("
    "list(struct_pack(k := {k}, v := {v}) ORDER BY {k}), x -> x.v), "
    "(a, b) -> a + b)"
)


def _perceptron_oracle(dim: int, lr: float, n_iters: int) -> str:
    """Full-batch perceptron training unrolled as CTE generations (the
    PageRank/Lloyd recipe): margins fold over feat-sorted per-doc
    contributions, gradients fold over id-sorted misclassified-doc
    contributions, weight updates are pure +/x — no transcendentals,
    so the whole training replays bit-for-bit."""
    head = f"""
WITH terms AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
f AS MATERIALIZED (
  SELECT DISTINCT id,
         ('0x' || substr(md5('0:' || term), 1, 8))::BIGINT % {dim} AS feat,
         CAST(1 AS DOUBLE) AS val
  FROM terms
),
lab AS MATERIALIZED (
  SELECT doc_id AS id,
         CASE WHEN list_contains(
                list_filter(string_split(text, ' '), x -> x <> ''),
                'spark')
              THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS y
  FROM documents
),
w0 AS MATERIALIZED (
  SELECT CAST(t.i AS BIGINT) AS feat, CAST(0 AS DOUBLE) AS w
  FROM UNNEST(generate_series(0, {dim - 1})) AS t(i)
)"""
    its = []
    for k in range(1, n_iters + 1):
        its.append(f""",
mg{k} AS MATERIALIZED (
  SELECT f.id, {_CLF_FOLD.format(k='f.feat', v='f.val * w.w')} AS margin
  FROM f JOIN w{k - 1} w USING (feat) GROUP BY f.id
),
mis{k} AS MATERIALIZED (
  SELECT m.id, l.y FROM mg{k} m JOIN lab l USING (id)
  WHERE l.y * m.margin <= 0
),
g{k} AS MATERIALIZED (
  SELECT f2.feat, {_CLF_FOLD.format(k='f2.id', v='mi.y * f2.val')} AS g
  FROM mis{k} mi JOIN f f2 ON f2.id = mi.id
  GROUP BY f2.feat
),
w{k} AS MATERIALIZED (
  SELECT w.feat,
         w.w + CAST({lr} AS DOUBLE) * coalesce(g.g, CAST(0 AS DOUBLE)) AS w
  FROM w{k - 1} w LEFT JOIN g{k} g USING (feat)
)""")
    tail = f""",
mgf AS (
  SELECT f.id, {_CLF_FOLD.format(k='f.feat', v='f.val * w.w')} AS margin
  FROM f JOIN w{n_iters} w USING (feat) GROUP BY f.id
)
SELECT m.id AS doc_id, round(m.margin, 6) AS margin,
       CASE WHEN m.margin >= 0 THEN 1 ELSE -1 END AS pred,
       CAST(l.y AS INTEGER) AS label
FROM mgf m JOIN lab l USING (id)
"""
    return head + "".join(its) + tail


@fixture(
    "q_quality_classifier",
    oracle=_perceptron_oracle(_CLF_DIM, _CLF_LR, _CLF_ITERS),
)
def q_quality_classifier(spark: SparkSession, sf_dir: str):
    """Model-based quality filtering (operators/classifier.py): a
    hashed bag-of-words batch perceptron trained ON the corpus against
    weak labels (here: does the doc mention 'spark' — the keyword-
    relevance shape of fastText-style "looks like the reference
    corpus" filters in CCNet-class pipelines; the model must learn it
    through 1024 hashed buckets, converging to separation by ~iter 16
    on this fixture). The margin is the filter score; pred is its
    sign. Deterministic mode (fold-ordered margins/gradients, no
    transcendentals anywhere) so all 16 training iterations + the
    final scoring pass replay exactly in the unrolled-CTE oracle."""
    from nextbus2pg_spark.operators.classifier import (
        classify,
        hash_features,
        perceptron_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = hash_features(docs, "doc_id", "text", dim=_CLF_DIM, binary=True)
    words = F.filter(F.split("text", " "), lambda w: w != "")
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.array_contains(words, "spark"), F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("y"),
    )
    w = perceptron_train(
        feats, labels, dim=_CLF_DIM, lr=_CLF_LR, n_iters=_CLF_ITERS,
        deterministic=True,
    )
    scored = classify(feats, w, deterministic=True)
    return scored.join(labels, "id").select(
        F.col("id").alias("doc_id"),
        F.round("margin", 6).alias("margin"),
        "pred",
        F.col("y").cast("int").alias("label"),
    )


@fixture(
    "q_pmi_collocations",
    oracle="""
WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
uni AS (
  SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(w) AS tok FROM words) GROUP BY tok
),
pc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
  FROM (
    SELECT w[i] AS w1, w[i + 1] AS w2
    FROM words, unnest(range(1, len(w))) AS t(i)
  ) GROUP BY w1, w2
),
stats AS (
  SELECT (SELECT CAST(sum(cnt) AS BIGINT) FROM uni) AS nt,
         (SELECT CAST(sum(pair_count) AS BIGINT) FROM pc) AS np
)
SELECT p.w1, p.w2, p.pair_count,
       a.cnt AS left_count, b.cnt AS right_count,
       ((CAST(p.pair_count AS DOUBLE) / CAST(s.np AS DOUBLE))
        / (CAST(a.cnt AS DOUBLE) / CAST(s.nt AS DOUBLE)))
       / (CAST(b.cnt AS DOUBLE) / CAST(s.nt AS DOUBLE)) AS pmi_ratio
FROM pc p
JOIN uni a ON a.w = p.w1
JOIN uni b ON b.w = p.w2
CROSS JOIN stats s
WHERE p.pair_count >= 5
ORDER BY pmi_ratio DESC, p.w1, p.w2
LIMIT 20
""",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str):
    """Top-20 PMI collocations (operators/textstats.pmi_collocations,
    min pair count 5): adjacent word pairs scored by
    P(xy)/(P(x)P(y)) — every model input is an exact integer count
    and the score is five IEEE divisions in a fixed tree, so the
    DuckDB oracle replays the identical expression bit-for-bit.
    Ranked descending with a lexicographic tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.pmi_collocations(docs, "doc_id", "text", min_count=5, k=20)


@fixture(
    "q_hybrid_rrf",
    oracle="""
WITH terms AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS dl,
         CAST(sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS BIGINT)
           AS tf0,
         CAST(sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) AS BIGINT)
           AS tf1,
         CAST(sum(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS BIGINT)
           AS tf2
  FROM terms GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
  FROM per_doc
),
bscored AS (
  SELECT doc_id AS id,
         round(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
                    / (CAST(df0 AS DOUBLE) + 0.5))
             * CAST(tf0 AS DOUBLE) * 2.2
             / (CAST(tf0 AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
                    / (CAST(df1 AS DOUBLE) + 0.5))
             * CAST(tf1 AS DOUBLE) * 2.2
             / (CAST(tf1 AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
                    / (CAST(df2 AS DOUBLE) + 0.5))
             * CAST(tf2 AS DOUBLE) * 2.2
             / (CAST(tf2 AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         , 6) AS score
  FROM per_doc CROSS JOIN stats
),
lex AS (
  SELECT id, CAST(rnk AS INTEGER) AS rank_lex FROM (
    SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rnk
    FROM bscored WHERE score > 0) _l
  WHERE rnk <= 20
),
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM v
),
q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n
      WHERE vec_id = 0),
dpairs AS (
  SELECT t.vec_id AS match_id,
         round(
           list_sum(list_transform(generate_series(1, len(q.qe)),
                                   i -> q.qe[i] * t.e[i]))
           / (q.qn * t.nrm), 6) AS sim
  FROM q CROSS JOIN n t
  WHERE t.vec_id <> q.query_id
),
dense AS (
  SELECT match_id, CAST(rnk AS INTEGER) AS rank_dense FROM (
    SELECT match_id,
           row_number() OVER (ORDER BY sim DESC, match_id) AS rnk
    FROM dpairs) _d
  WHERE rnk <= 20
),
fused AS (
  SELECT COALESCE(l.id, d.match_id) AS doc_id,
         l.rank_lex, d.rank_dense,
         COALESCE(CAST(1 AS DOUBLE) / (60 + l.rank_lex),
                  CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / (60 + d.rank_dense),
                    CAST(0 AS DOUBLE)) AS rrf_score
  FROM lex l FULL OUTER JOIN dense d ON d.match_id = l.id
)
SELECT doc_id, rank_lex, rank_dense, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
""",
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str):
    """Hybrid retrieval: BM25 top-20 for {spark, vector, merge} fused
    with dense cosine top-20 for the vec_id=0 query embedding by
    Reciprocal Rank Fusion (operators/textstats.rrf_fuse, k_const=60)
    — the standard sparse+dense combiner. Each contribution is one
    integer-denominator division and the two add in fixed list order,
    so the oracle replays the fused scores exactly; both upstream
    rankings are the already-oracle-pinned BM25 and cosine chains."""
    from nextbus2pg_spark.operators.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = ts.bm25_topk(
        docs, "doc_id", "text", ["spark", "vector", "merge"], k=20
    )
    dense = cosine_topk(
        emb, emb.where(F.col("vec_id") == 0), "vec_id", "embedding", k=20
    )
    return ts.rrf_fuse(
        [
            ("lex", lex.select("id", "rank")),
            ("dense", dense.select(F.col("match_id").alias("id"), "rank")),
        ],
        k_const=60,
        k=10,
    )


@fixture(
    "q_ccnet_buckets",
    oracle=_LM_FOLDED_CTE + """
SELECT f.doc_id AS id, d.lang, f.n_bigrams,
       CAST(ntile(3) OVER (
         PARTITION BY d.lang
         ORDER BY CAST(round(round(f.s / f.n_bigrams, 6) * 1e6, 0)
                       AS BIGINT) DESC,
                  f.doc_id ASC
       ) AS BIGINT) AS bucket
FROM folded f JOIN documents d ON d.doc_id = f.doc_id
""",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020; operators/textstats.perplexity_buckets): Laplace-bigram-LM
    scores (the q_lm_logprob chain) NTILE'd into head/middle/tail
    WITHIN each language — the canonical pretraining split where
    absolute perplexity is never compared across languages. The cut is
    rank-based over the exact quantized score (no quantile
    interpolation), so both engines assign identical buckets; ties
    break on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return ts.perplexity_buckets(
        docs, "doc_id", "text", "lang", n_buckets=3
    ).select(
        "id", "lang", "n_bigrams", "bucket"
    )


@fixture("q_tokenizer_fertility", oracle=_bpe_oracle_sql(10, final="fertility"))
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str):
    """Per-language tokenizer fertility (tokens/word) and compression
    (chars/token) for the 10-merge BPE tokenizer trained on the corpus
    itself — the metric a tokenizer team tracks per language before
    committing a vocabulary: high fertility on a language means its
    text fragments into many subwords (expensive context) and argues
    for more merges or more of that language in the training mix.

    Spark side: bpe_train + bpe_encode (the existing Arrow encode
    path) give per-document token counts; word and character counts
    are pure expressions (`size(filter(split(...)))`,
    `length(replace(text, ' ', ''))` — exactly the sum of non-space
    character counts the oracle computes per word occurrence); one
    bounded groupBy(lang) closes. The oracle reuses the unrolled BPE
    training chain (s10 = the encoded vocabulary) with a per-language
    tail, so training, encoding, AND the ratio algebra are all
    value-hash checked."""
    from nextbus2pg_spark.operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    enc = bpe_encode(docs, "doc_id", "text", merges).select(
        F.col("id").alias("doc_id"), "n_tokens"
    )
    words = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda w: w != "",
    )
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        F.length(
            F.replace(
                F.coalesce(F.col("text"), F.lit("")), F.lit(" "), F.lit("")
            )
        ).alias("n_chars"),
    ).join(enc, "doc_id")
    agg = per_doc.groupBy("lang").agg(
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    fertility = F.when(
        F.col("n_words") > 0,
        F.round(
            F.col("n_tokens").cast("double")
            / F.col("n_words").cast("double"),
            6,
        ),
    )
    compression = F.when(
        F.col("n_tokens") > 0,
        F.round(
            F.col("n_chars").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ),
    )
    return agg.select(
        "lang", "n_tokens", "n_words", "n_chars",
        fertility.alias("fertility"),
        compression.alias("compression"),
    )
