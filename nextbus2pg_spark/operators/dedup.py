"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard
(SURVEY.md §2.6 A1-A4 for the exact forms; §2.12 north-star for near-dup).

Design for 100 TB:
- Exact dedup is a hash aggregate on the dedup key — map-side partial
  aggregation means only distinct keys shuffle.
- Near-dup never compares all pairs. MinHash signatures are computed
  per-document (embarrassingly parallel), then LSH banding turns
  similarity search into an equi-join on (band, band_hash) — the only
  shuffle is on band buckets, and the verify step runs only on candidate
  pairs.
- All hashing is md5-based and *engine-portable* (lexicographic min over
  hex strings is a valid min-hash family), so every step can be
  oracle-checked against ANSI SQL — no opaque JVM hash functions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact dedup on a key (A1/A2: ``SELECT DISTINCT ON`` semantics)."""
    return df.dropDuplicates(key_cols)


def dedup_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact-content dedup summary: one row per distinct text.

    Returns ``(text_md5, keeper_id, n_copies)`` where the keeper is the
    minimum id — a deterministic survivor choice (the reference's
    DISTINCT ON leaves it arbitrary; SURVEY.md §7 hard-part #2 says don't).
    """
    return df.groupBy(F.md5(F.col(text_col)).alias("text_md5")).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, impl: str = "arrow"
) -> DataFrame:
    """Word n-gram shingles per document → (id, shingle) rows (multiset).

    Two implementations with identical output (verified set-equal):

    - ``arrow`` (default): Arrow-batched ``mapInPandas``. Higher-order
      array expressions are NOT whole-stage-codegen'd (interpreted eval
      + per-shingle array allocation), so the vectorized Python path is
      measurably faster — 0.55s vs 2.0s at sf0.1 — the documented
      exception to "built-ins first".
    - ``expr``: pure JVM expressions (``transform(sequence(...))``) for
      contexts where Python workers are unavailable.

    Deliberately NOT distinct: MinHash minima are unaffected by
    duplicates, so the signature path skips a full-corpus shuffle;
    consumers needing set semantics (Jaccard) dedup downstream, after
    restricting to candidate documents (see ``jaccard_pairs``).
    """
    if impl == "arrow":
        import pandas as pd

        def gen(batches):
            join = " ".join
            for pdf in batches:
                ids: list = []
                shs: list[str] = []
                for i, t in zip(pdf[id_col], pdf[text_col]):
                    w = [x for x in t.split(" ") if x]
                    k = len(w) - n + 1
                    if k > 0:
                        # zip-of-shifted-views + map(join): the C-level
                        # form of the j-loop (measured ~40% faster than
                        # per-j slicing on the fixture corpus).
                        shs.extend(map(join, zip(*(w[j:] for j in range(n)))))
                        ids.extend([i] * k)
                yield pd.DataFrame({"id": ids, "shingle": shs})

        # id keeps the caller's type: a hard-coded 'long' would crash
        # (or silently coerce) string/uuid document ids at the Arrow
        # boundary.
        id_dt = dict(df.dtypes)[id_col]
        return df.select(id_col, text_col).mapInPandas(
            gen, f"id {id_dt}, shingle string"
        )

    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n_shingles = F.size(words) - F.lit(n - 1)
    # Guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so short
    # docs must map to an empty array explicitly.
    shingles = F.when(
        n_shingles < 1, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_shingles, F.lit(1))),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(shingles).alias("shingle")
    )


def minhash_signatures(
    shingled: DataFrame, num_perm: int = 8
) -> DataFrame:
    """Per-(id, perm) MinHash values over a (id, shingle) relation.

    Permutation *i* is "sort shingles by ``md5(i || ':' || shingle)``";
    the signature entry is the lexicographic minimum of those hex
    digests. Portable across engines (md5 + string min), and a genuine
    min-wise independent family per band.

    Shape: ONE pass over the shingle relation computing all
    ``num_perm`` minima as parallel min-aggregates on the same
    groupBy, then an explode to the long (id, perm, minh) form on the
    already-tiny aggregated frame. The md5 count is identical to the
    textbook crossJoin-with-permutations form, but no ``num_perm``×
    row blowup ever exists — measured 0.74s → 0.57s on the sf0.1
    signature stage, and shuffle volume per id is ``num_perm`` columns
    instead of ``num_perm`` rows.
    """
    aggs = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(i), F.col("shingle")))
        ).alias(f"__m{i}")
        for i in range(num_perm)
    ]
    wide = shingled.groupBy("id").agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(i).cast("long").alias("perm"),
            F.col(f"__m{i}").alias("minh"),
        )
        for i in range(num_perm)
    ])
    return wide.select("id", F.explode(pairs).alias("__p")).select(
        "id", F.col("__p.perm").alias("perm"), F.col("__p.minh").alias("minh")
    )


def lsh_bands(signatures: DataFrame, rows_per_band: int = 2) -> DataFrame:
    """Fold signatures into LSH band hashes → (id, band, band_hash)."""
    sig_in_band = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("perm", "minh"))),
            lambda x: x["minh"],
        ),
        "|",
    )
    return (
        signatures.withColumn("band", F.expr(f"perm div {rows_per_band}"))
        .groupBy("id", "band")
        .agg(F.md5(sig_in_band).alias("band_hash"))
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct candidate pairs sharing any LSH band bucket.

    The equi-join on (band, band_hash) is the scale trick: no all-pairs
    comparison ever happens; bucket sizes bound the join fan-out. The
    band relation is one row per (doc, band) — it GROWS WITH THE CORPUS,
    so no broadcast hint: AQE picks broadcast at runtime when the side
    is actually small, and falls back to a shuffle equi-join (the
    correct 100 TB shape) when it is not.
    """
    a = bands.select(
        F.col("id").alias("id_a"), "band", "band_hash"
    )
    b = bands.select(F.col("id").alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame, candidates: DataFrame, impl: str = "sets"
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs over shingle sets.

    Scale-critical ordering for BOTH impls: the shingle relation is
    first semi-joined down to ids that appear in ANY candidate pair, so
    the verify cost tracks |candidates|, not |corpus|.

    - ``sets`` (default): ``collect_set`` one shingle array per
      candidate doc, join the (small) pair list to the arrays on each
      side, and score with ``array_intersect`` — two pair-side joins
      (AQE broadcasts them when small) instead of the exploded
      shingle equi-join + per-pair aggregation, measured ~2× faster at
      sf0.1. Per-row memory is one doc's full shingle set; fine for
      typical documents, and a hub doc in k pairs ships its set k times.
    - ``explode``: shingle equi-join + count aggregation — never holds a
      whole set in one row, so it is the safer shape for corpora with
      pathologically long documents (at the cost of shuffling the
      exploded (pair, shingle) stream and skew on ubiquitous shingles).

    Pairs with an empty intersection are dropped (not emitted as 0.0)
    under both impls — band-hash collisions can pair docs that share no
    shingle.

    No broadcast hints anywhere: on a dirty corpus the candidate set is
    NOT small (it can approach the corpus), so hinting it would pin an
    OOM-prone strategy. AQE broadcasts at runtime exactly when a side's
    measured size allows it.
    Output: (id_a, id_b, jaccard).
    """
    ids_a = candidates.select(F.col("id_a").alias("id")).distinct()
    ids_b = candidates.select(F.col("id_b").alias("id")).distinct()
    cand_ids = ids_a.unionByName(ids_b).distinct()
    if impl == "sets":
        sets = (
            shingled.join(cand_ids, "id", "left_semi")
            .groupBy("id")
            .agg(F.collect_set("shingle").alias("sset"))
        )
        scored = (
            candidates.join(
                sets.select(F.col("id").alias("id_a"), F.col("sset").alias("s_a")),
                "id_a",
            )
            .join(
                sets.select(F.col("id").alias("id_b"), F.col("sset").alias("s_b")),
                "id_b",
            )
            .withColumn("n_inter", F.size(F.array_intersect("s_a", "s_b")))
            .where(F.col("n_inter") > 0)
        )
        return scored.select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.size("s_a") + F.size("s_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    # Set semantics (distinct) applied only AFTER restricting to
    # candidate ids — the input may be a shingle multiset.
    # Materialized once (it feeds sizes + both join sides); bounded by
    # |candidate docs| × shingles-per-doc, i.e. small by LSH design.
    cand_shingles = (
        shingled.join(cand_ids, "id", "left_semi")
        .select("id", "shingle")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = cand_shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = (
        cand_shingles.join(ids_a, "id", "left_semi")
        .select(F.col("id").alias("id_a"), "shingle")
    )
    b = (
        cand_shingles.join(ids_b, "id", "left_semi")
        .select(F.col("id").alias("id_b"), "shingle")
    )
    inter = (
        a.join(b, "shingle")
        .join(candidates, ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    materialize_shingles: bool = True,
    materialize: bool = True,
    verify_from_wide: bool = False,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs, wide-form fast path.

    Semantically identical to ``word_shingles → minhash_signatures →
    lsh_bands → lsh_candidate_pairs → jaccard_pairs`` but computes all
    ``num_perm`` signature minima in ONE aggregation over the shingle
    relation (columns, not exploded perm rows) — no num_perm× row
    blowup, one shuffle for the whole signature stage. Bands then
    explode from the wide row (tiny: one row per doc).

    The shingle relation feeds the signature and verify branches;
    ``materialize_shingles`` localCheckpoints it so the explode runs
    once (measured ~15% off warm wall time at sf0.1). It lives in
    executor memory — for very large corpora turn it off or, better,
    write shingles to an intermediate table between phases. NOTE: a
    lazy ``persist()`` here instead would REGRESS badly (it blocks
    AQE's runtime join planning on every consumer — observed 7.8s →
    126s at sf0.1); eager localCheckpoint does not.

    ``materialize=False`` disables every checkpoint, returning one pure
    declarative plan (used by the plan-audit tests to inspect the full
    pipeline; also the right setting when a caller wants to persist
    intermediates to tables instead).

    ``verify_from_wide=True`` folds ``collect_set(shingle)`` into the
    SAME wide aggregation that computes the signature minima, so the
    shingle relation is aggregated exactly once and the Jaccard verify
    joins pairs straight onto the per-doc sets — no second
    semi-join+collect_set pass. Trade-off: the materialized wide frame
    holds EVERY doc's shingle set (≈ the tokenized corpus in executor
    memory), where the default only materializes candidate docs' sets
    but pays the extra pass. Same output either way; pick by corpus
    size vs pass cost.

    ``shingles``: a precomputed ``(id, shingle)`` relation (the
    ``word_shingles`` shape) to use instead of tokenizing ``df`` —
    pipelines running several shingle consumers over the same corpus
    (near-dup + decontamination in ``pipelines/curate.py``) tokenize
    once and share it, instead of each operator re-splitting the text.
    """
    from nextbus2pg_spark.operators.scale import ensure_min_parallelism

    # The shingle explode + 8-way md5 signature aggregation inherit the
    # scan's partition count; spread a narrow input across all cores
    # first (no-op when the scan already has enough partitions).
    if shingles is not None:
        sh = shingles
    else:
        sh = word_shingles(
            ensure_min_parallelism(df), id_col, text_col, n=shingle_n
        )
    if materialize_shingles and materialize and not verify_from_wide:
        # (with verify_from_wide the shingle frame has exactly one
        # consumer — the wide agg — so a checkpoint would be pure cost)
        sh = sh.localCheckpoint(eager=True)
    sig_cols = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle")))
        ).alias(f"__m{i}")
        for i in range(num_perm)
    ]
    if verify_from_wide:
        sig_cols.append(F.collect_set("shingle").alias("__sset"))
    wide = sh.groupBy("id").agg(*sig_cols)
    if verify_from_wide and materialize:
        # now wide has two consumers (bands + verify)
        wide = wide.localCheckpoint(eager=True)
    n_bands = num_perm // rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"__m{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    # Checkpoint policy: a frame earns a localCheckpoint only with >1
    # consumer (Spark re-derives unshared subtrees once per consumer).
    # `sh` has two (signature agg + verify) and `cand` has three
    # (ids_a/ids_b/semi filter) — both checkpointed. `wide` feeds ONLY
    # the band explode, so materializing it is a pure extra job
    # (measured: removing it is neutral-to-better at sf0.1); the band
    # subtree instead materializes once inside `cand`'s checkpoint.
    bands = wide.select(
        "id", F.explode(band_structs).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    cand = lsh_candidate_pairs(bands)
    if materialize:
        cand = cand.localCheckpoint(eager=True)
    if verify_from_wide:
        scored = (
            cand.join(
                wide.select(F.col("id").alias("id_a"), F.col("__sset").alias("s_a")),
                "id_a",
            )
            .join(
                wide.select(F.col("id").alias("id_b"), F.col("__sset").alias("s_b")),
                "id_b",
            )
            .withColumn("n_inter", F.size(F.array_intersect("s_a", "s_b")))
            .where(F.col("n_inter") > 0)
        )
        return scored.select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.size("s_a") + F.size("s_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    return jaccard_pairs(sh, cand)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    band_bits: int = 4,
    max_hamming: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs via banded fingerprint blocking.

    Pigeonhole guarantee: with ``bits/band_bits`` bands, any pair
    within ``max_hamming < bits/band_bits`` differing bits shares at
    least one unchanged band — so the candidate equi-join on
    (band, band_value) has perfect recall for the verify threshold,
    and the only shuffle is on band buckets (same 100 TB shape as
    MinHash-LSH banding; no all-pairs comparison).
    Output: (id_a, id_b, hamming).
    """
    n_bands = bits // band_bits
    assert max_hamming < n_bands, "recall guarantee needs max_hamming < bands"
    fp = simhash(df, id_col, text_col, bits=bits)
    if materialize:  # consumed by bands + verify
        fp = fp.localCheckpoint(eager=True)
    band_vals = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                # shiftright takes a Python-int bit count (exact for
                # any fingerprint width; double division would lose
                # precision past 53 bits).
                (
                    F.shiftright(F.col("simhash"), b * band_bits)
                    % F.lit(2**band_bits)
                ).alias("band_value"),
            )
            for b in range(n_bands)
        ]
    )
    bands = fp.select("id", F.explode(band_vals).alias("bb")).select(
        "id", "bb.band", "bb.band_value"
    )
    # Corpus-derived sides (bands, fingerprints) carry no broadcast
    # hints — they grow linearly with the corpus; AQE decides at runtime.
    a = bands.select(F.col("id").alias("id_a"), "band", "band_value")
    b = bands.select(F.col("id").alias("id_b"), "band", "band_value")
    cand = (
        a.join(b, ["band", "band_value"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = fp.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    fb = fp.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_bit_vote(text_words: Column, bit: Column) -> Column:
    """Portable per-bit SimHash vote for one word: +1 / -1.

    Bit *b* of word *w* is 1 iff the first hex digit of
    ``md5(b || ':' || w)`` is < '8' — a balanced, engine-portable bit.
    (Used by the fixture query; the vectorized form lives in
    ``simhash``.)
    """
    h = F.md5(F.concat_ws(":", bit, text_words))
    return F.when(F.substring(h, 1, 1) < F.lit("8"), F.lit(1)).otherwise(F.lit(-1))


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """SimHash fingerprint per document → (id, simhash).

    Sums per-bit votes over the word stream, packs bits whose vote is
    >= 0. Near-dup docs then differ in few bits; pairing is a
    self-join on band slices of the fingerprint (same LSH idea as
    MinHash). ``bits`` stays small for oracle fixtures; the library
    default is fine up to 64.

    Shape: ONE pass over the exploded words computing all ``bits``
    vote sums as parallel aggregates on a single groupBy (the same
    one-pass form as ``minhash_signatures``) — no words×bits crossJoin
    row blowup and no second shuffle: the bit packing folds the wide
    vote row directly.
    """
    from nextbus2pg_spark.operators.scale import ensure_min_parallelism

    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    exploded = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(words).alias("word")
    )
    aggs = [
        F.sum(simhash_bit_vote(F.col("word"), F.lit(b))).alias(f"__v{b}")
        for b in range(bits)
    ]
    wide = exploded.groupBy("id").agg(*aggs)

    def _bit_value(b: int):
        # bit 63 is the long's sign bit: 1<<63 overflows LongType, but
        # its two's-complement value -(2^63) sums to the same bit
        # pattern (bits=64 is the documented library maximum).
        return F.lit(-(1 << 63) if b == 63 else 1 << b).cast("long")

    packed = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"__v{b}") >= 0, _bit_value(b)).otherwise(
            F.lit(0).cast("long")
        ),
        range(bits),
        F.lit(0).cast("long"),
    )
    return wide.select("id", packed.alias("simhash"))


def setsim_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """EXACT set-similarity self-join: every document pair whose
    word-SET Jaccard is >= ``threshold`` → (id_a, id_b, jaccard),
    id_a < id_b. The deterministic, no-missed-pairs complement of the
    MinHash-LSH rung (which trades recall for speed): use this when
    the dedup decision must be exhaustive at a declared threshold.

    PPJoin-style prefix filtering keeps it off the all-pairs cliff:
    tokens get a GLOBAL rarest-first order (corpus doc-frequency asc,
    token asc — rarest tokens prune hardest); each document's tokens
    sort in that order and only its PREFIX of length
    ``n - ceil(t*n) + 1`` emits join rows. Any pair with Jaccard >= t
    shares >= ceil(t*max(n_a, n_b)) tokens, so it must collide inside
    both prefixes (the standard prefix-filter theorem) — completeness
    holds while the candidate join touches only prefix tokens, whose
    stream shrinks as t grows. Verification reuses
    :func:`jaccard_pairs` (exact integer arithmetic; same candidate-
    restricted scale shape as the LSH verify).

    Scale notes: the token doc-frequency table is NOT hint-broadcast —
    a web-scale vocabulary (typos, URLs, non-Latin scripts) easily
    exceeds 10^8 distinct tokens, where a forced broadcast blows the
    broadcast/driver ceiling and kills the job that a plain shuffled
    equi-join would finish. The join stays declarative so the planner
    / AQE broadcasts exactly when the MEASURED size allows (it does at
    test scale) and degrades to shuffle when it doesn't. The candidate
    join's worst key is the most common PREFIX token — documents whose
    sets are mostly rare tokens prune to near-nothing, and a
    stop-word-like token only enters prefixes of documents that
    consist almost entirely of other stop words. ``ceil`` takes a 1e-9
    slack so float noise in t*n can only LENGTHEN a prefix (extra
    candidates), never shorten one (missed pairs).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(words).alias("shingle"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds freq, prefix AND verify
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    freq = toks.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("id").orderBy(
        F.col("__df").asc(), F.col("shingle").asc()
    )
    prefix = (
        toks.join(freq, "shingle")
        .withColumn("__r", F.row_number().over(w))
        .join(sizes, "id")
        .where(
            F.col("__r")
            <= F.col("__n")
            - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
            + F.lit(1)
        )
        .select("id", "shingle")
    )
    cand = (
        prefix.select(F.col("id").alias("id_a"), "shingle")
        .join(prefix.select(F.col("id").alias("id_b"), "shingle"), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_pairs(toks, cand).where(
        F.col("jaccard") >= F.lit(threshold)
    )


def containment_pairs(
    shingled: DataFrame,
    *,
    threshold_milli: int = 800,
    max_df: "int | None" = None,
) -> DataFrame:
    """ASYMMETRIC set-containment pairs over (id, shingle) rows →
    ``(id_a, id_b, n_inter, containment)`` for every ordered pair with
    ``|S_a ∩ S_b| / |S_a| >= threshold_milli/1000`` — the "document A
    is (mostly) inside document B" detector that symmetric Jaccard
    structurally misses: a quoted article inside a long page, repeated
    boilerplate, a chunk re-packed into a larger corpus file. MinHash
    LSH also misses these (a small doc inside a big one has LOW
    Jaccard), which is why containment is its own operator.

    The threshold decision is the pure integer comparison
    ``1000 * n_inter >= threshold_milli * n_a`` (no FP in the gate);
    ``containment`` itself is one exact division. Blocking is the
    caller's job: embed block keys into the shingle value (e.g.
    ``shingle || '|' || lang``) and cross-block pairs vanish from the
    equi-join by construction.

    ``max_df`` drops shingles occurring in more than ``max_df``
    documents from BOTH the numerator and the denominator — containment
    over informative shingles only (numerator and denominator stay
    consistent, the score stays in [0, 1]). This is the skew valve: a
    stop-shingle shared by half the corpus otherwise turns the
    shingle equi-join into a quadratic hot key. Exact (None) by
    default.

    Scale shape: distinct-collapse, optional df filter (one grouped
    count + semi-join), one shingle equi-join + per-pair count, two
    size joins. Never all-pairs; AQE handles residual shingle skew.
    """
    if not 0 < threshold_milli <= 1000:
        raise ValueError(
            f"threshold_milli must be in (0, 1000]; got {threshold_milli}"
        )
    sh = shingled.select("id", "shingle").where(
        F.col("id").isNotNull() & F.col("shingle").isNotNull()
    ).distinct()
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= F.lit(max_df))
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sh = sh.localCheckpoint(eager=True)  # feeds sizes + both join sides
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")),
            "id_a",
        )
        .where(
            F.lit(1000) * F.col("n_inter")
            >= F.lit(int(threshold_milli)) * F.col("n_a")
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("n_inter").cast("double") / F.col("n_a").cast("double"))
            .alias("containment"),
        )
    )
