"""Curation-operator invariants (beyond the oracle parity checks):
split disjoint/exhaustive, sampling stability under repartitioning
(the retry/partitioning-independence claim), cap bound + survivor
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.operators import curation as cu
from tests.conftest import SF_DIR


def test_split_disjoint_and_exhaustive(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = cu.train_test_split(docs, ["doc_id"], test_percent=10)
    counts = dict(
        (r["split"], r["n"]) for r in
        out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert set(counts) == {"train", "test"}
    assert sum(counts.values()) == docs.count()
    # roughly 10% test (hash-uniformity; wide tolerance)
    frac = counts["test"] / sum(counts.values())
    assert 0.05 < frac < 0.15


def test_sample_invariant_under_partitioning(spark):
    """The sampled SET is identical no matter how the input is
    partitioned — the property rand()-sampling lacks."""
    docs = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in
         cu.deterministic_sample(docs, ["doc_id"], 20).select("doc_id").collect()}
    b = {r.doc_id for r in
         cu.deterministic_sample(docs.repartition(7), ["doc_id"], 20)
         .select("doc_id").collect()}
    assert a == b and len(a) > 0


def test_sample_membership_stable_under_growth(spark):
    """Rows selected from a subset stay selected in the full set
    (incremental pipelines never churn prior selections)."""
    docs = load_table(spark, SF_DIR, "documents")
    subset = docs.where(F.col("doc_id") % 2 == 0)
    from_subset = {r.doc_id for r in
                   cu.deterministic_sample(subset, ["doc_id"], 20)
                   .select("doc_id").collect()}
    from_full = {r.doc_id for r in
                 cu.deterministic_sample(docs, ["doc_id"], 20)
                 .select("doc_id").collect()}
    assert from_subset == {d for d in from_full if d % 2 == 0}


def test_cap_per_group_bound_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents")
    capped = cu.cap_per_group(
        docs, ["lang"], [F.desc("n_chars"), F.asc("doc_id")], 3
    )
    per_group = capped.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert per_group.where(F.col("n") > 3).count() == 0
    # deterministic across runs
    r1 = sorted((r.lang, r.doc_id) for r in capped.select("lang", "doc_id").collect())
    r2 = sorted((r.lang, r.doc_id) for r in capped.select("lang", "doc_id").collect())
    assert r1 == r2


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma zeta eta"),      # shares 'alpha beta gamma'
            (3, "one two three four five"),         # clean
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta suffix")],
        "doc_id long, text string",
    )
    hits = {
        r["id"]: r["n_hits"]
        for r in cu.decontaminate(train, eval_set, "doc_id", "text", ngram=3).collect()
    }
    # doc 1 shares 'alpha beta gamma' and 'beta gamma delta'; doc 2 one.
    assert hits == {1: 2, 2: 1}


def test_pack_sequences_chunk_layout(spark):
    # 4 docs of 60 tokens in one group, budget 100: offsets 0/60/120/180
    # -> chunks 0,0,1,1 (doc may straddle; assigned where it starts).
    df = spark.createDataFrame(
        [(i, "g", 60) for i in range(4)], "doc_id long, grp string, toks int"
    )
    out = cu.pack_sequences(
        df, "toks", 100, ["grp"], [F.asc("doc_id")]
    ).orderBy("doc_id")
    rows = [(r["start_offset"], r["chunk_id"]) for r in out.collect()]
    assert rows == [(0, 0), (60, 0), (120, 1), (180, 1)]


def test_quantile_threshold_filter_keeps_top_quartile(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1, 101)],
        "doc_id long, grp string, score double",
    )
    kept = cu.quantile_threshold_filter(df, "score", ["grp"], q=0.75)
    scores = sorted(r["score"] for r in kept.collect())
    # exact interpolated P75 of 1..100 is 75.25 -> keep 76..100
    assert scores == [float(s) for s in range(76, 101)]
    assert kept.select("threshold").distinct().collect()[0][0] == 75.25


def test_line_dedup_first_occurrence_wins(spark):
    from nextbus2pg_spark.operators.curation import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha | beta | gamma"),
            (2, "beta | delta"),       # beta repeats -> dropped here
            (3, "alpha | beta"),       # both repeats -> doc vanishes
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in
           line_dedup(docs, "doc_id", "text", sep=" | ").collect()}
    assert out == {1: "alpha | beta | gamma", 2: "delta"}


def test_line_dedup_duplicate_within_doc_kept_once(spark):
    from nextbus2pg_spark.operators.curation import line_dedup

    docs = spark.createDataFrame(
        [(1, "x | x | y")], "doc_id long, text string"
    )
    out = line_dedup(docs, "doc_id", "text", sep=" | ").collect()
    assert out[0].text == "x | y"  # first position owns the line


def test_line_dedup_sep_is_literal_not_regex(spark):
    from nextbus2pg_spark.operators.curation import line_dedup

    docs = spark.createDataFrame(
        [(1, "a. b"), (2, "ab")], "doc_id long, text string"
    )
    # '. ' as a regex would split 'ab' on any-char+space; literal must not
    out = {r.doc_id: r.text for r in
           line_dedup(docs, "doc_id", "text", sep=". ").collect()}
    assert out == {1: "a. b", 2: "ab"}


def test_chunk_documents_overlap_and_tail(spark):
    from nextbus2pg_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(
            docs, "doc_id", "text", chunk_tokens=4, stride=3
        ).collect()
    )
    # starts at tokens 1,4,7,10 -> sizes 4,4,4,1
    assert rows == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
        (3, "w9", 1),
    ]
    # min_tokens drops the pure-overlap tail
    rows2 = chunk_documents(
        docs, "doc_id", "text", chunk_tokens=4, stride=3, min_tokens=2
    ).count()
    assert rows2 == 3


def test_language_balance_downsamples_majority_only(spark):
    from pyspark.sql import functions as F

    from nextbus2pg_spark.operators.curation import language_balance

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "en").otherwise("fr").alias("lang"),
    )
    out = language_balance(docs, "lang", ["doc_id"], temperature=0.5)
    got = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # fr (smallest) keeps everything; en keeps ~ (p_fr/p_en)^0.5 = 1/3
    assert got["fr"] == 100
    assert 250 <= got["en"] <= 350
    # deterministic: rerun identical
    again = {r.lang: r.n for r in
             language_balance(docs, "lang", ["doc_id"], temperature=0.5)
             .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == again


def test_language_balance_keeps_null_language_stratum(spark):
    """Docs whose lang-id failed (NULL lang) are a stratum, not
    deletions: a plain equi-join on lang would drop them all."""
    from pyspark.sql import functions as F

    from nextbus2pg_spark.operators.curation import language_balance

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "en").otherwise(None).alias("lang"),
    )
    out = language_balance(docs, "lang", ["doc_id"], temperature=0.5)
    got = {r.lang: r.n for r in out.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get(None) == 20  # smallest stratum keeps 100%
    assert 0 < got["en"] < 180  # majority down-sampled


def test_bloom_decontaminate_equals_exact(spark):
    """Exactness contract: bloom prefilter + verify == exact operator
    on the fixture corpus (no false negatives by construction; false
    positives removed by the verify join) — including at an aggressive
    bits_per_element=8 where bloom FPs actually occur."""
    from nextbus2pg_spark.catalog import load_table
    from tests.conftest import SF_DIR_SMALL

    docs = load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    )
    train = docs.where(F.col("doc_id") % 17 != 0)
    eval_set = docs.where(F.col("doc_id") % 17 == 0)
    exact = {
        (r.id, r.n_hits)
        for r in cu.decontaminate(
            train, eval_set, "doc_id", "text", ngram=3
        ).collect()
    }
    assert exact  # fixture must actually collide
    for bpe in (8, 16):
        bloom = {
            (r.id, r.n_hits)
            for r in cu.bloom_decontaminate(
                train, eval_set, "doc_id", "text", ngram=3,
                bits_per_element=bpe,
            ).collect()
        }
        assert bloom == exact


def test_bloom_decontaminate_small_docs(spark):
    """Unit shape: same flags as the exact operator on a controlled
    corpus; docs shorter than the n-gram produce nothing; an empty
    eval set flags nothing."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma zeta eta"),
            (3, "one two three four five"),
            (4, "tiny doc"),  # shorter than the 3-gram window
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta suffix")],
        "doc_id long, text string",
    )
    hits = {
        r["id"]: r["n_hits"]
        for r in cu.bloom_decontaminate(
            train, eval_set, "doc_id", "text", ngram=3
        ).collect()
    }
    assert hits == {1: 2, 2: 1}
    empty_eval = eval_set.limit(0)
    assert (
        cu.bloom_decontaminate(
            train, empty_eval, "doc_id", "text", ngram=3
        ).count()
        == 0
    )


def test_substring_dedup_owner_keeps_later_occurrences_cut(spark):
    """A 3-token span shared by two docs survives only in the lower
    doc_id; the later doc loses exactly those tokens."""
    df = spark.createDataFrame(
        [
            (1, "a b c x y"),
            (2, "p q a b c"),
            (3, "unique words only here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in cu.substring_span_dedup(
            df, "doc_id", "text", n=3, out_col="text_dedup"
        ).collect()
    }
    assert out[1].text_dedup == "a b c x y" and out[1].n_removed == 0
    assert out[2].text_dedup == "p q" and out[2].n_removed == 3
    assert out[3].text_dedup == "unique words only here"


def test_substring_dedup_within_doc_repeat_and_overlap(spark):
    """A span repeated WITHIN one doc is cut at its second occurrence,
    and overlapping duplicate grams union their coverage (no
    double-count in n_removed)."""
    df = spark.createDataFrame(
        [(7, "a b c d a b c d")], "doc_id long, text string"
    )
    out = cu.substring_span_dedup(
        df, "doc_id", "text", n=3, out_col="t"
    ).collect()[0]
    # occurrences of 'a b c' at pos 1 and 5, 'b c d' at 2 and 6; the
    # second halves (positions 5..8) are covered, first 4 survive.
    assert out.t == "a b c d"
    assert out.n_removed == 4


def test_substring_dedup_token_conservation(spark):
    """n_removed + surviving tokens == original tokens, every doc
    present exactly once, short docs untouched."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = cu.substring_span_dedup(docs, "doc_id", "text", n=5, out_col="t")
    joined = out.join(docs, "doc_id").select(
        F.size(F.filter(F.split("text", " ", -1), lambda x: x != ""))
        .alias("orig"),
        F.when(F.col("t") == "", 0)
        .otherwise(F.size(F.split("t", " ", -1)))
        .alias("kept"),
        "n_removed",
    )
    bad = joined.where(
        F.col("orig") != F.col("kept") + F.col("n_removed")
    ).count()
    assert bad == 0
    assert out.count() == docs.count()


def test_contamination_fraction_bounds_and_exact_doc(spark):
    """Scores live in [0, 1]; a doc that IS an eval doc verbatim
    scores 1.0; a fully disjoint doc scores 0.0."""
    eval_docs = spark.createDataFrame(
        [(100, "w1 w2 w3 w4")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4"),          # verbatim eval copy
            (2, "z1 z2 z3 z4 z5"),       # disjoint
            (3, "w1 w2 w3 z9 z8"),       # partial: 1 of 3 shingles
        ],
        "doc_id long, text string",
    )
    rows = {
        r.id: r
        for r in cu.contamination_fraction(
            train, eval_docs, "doc_id", "text", ngram=3
        ).collect()
    }
    assert rows[1].contamination == 1.0
    assert rows[2].contamination == 0.0
    assert rows[3].n_shingles == 3 and rows[3].n_hits == 1
    assert abs(rows[3].contamination - 1 / 3) < 1e-12


def test_weighted_sample_invariants(spark):
    """Deterministic under repartitioning; k bound respected per
    group; zero/NULL-weight rows never sampled; heavier rows are
    overrepresented vs a uniform sample on aggregate."""
    rows = [(i, "g", float(10_000 if i < 50 else 1)) for i in range(1000)]
    rows += [(2000, "g", 0.0), (2001, "g", None)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = cu.weighted_sample(df, ["id"], "w", k=100, group_cols=["grp"])
    ids = {r.id for r in out.collect()}
    ids2 = {
        r.id
        for r in cu.weighted_sample(
            df.repartition(13), ["id"], "w", k=100, group_cols=["grp"]
        ).collect()
    }
    assert ids == ids2 and len(ids) == 100
    assert 2000 not in ids and 2001 not in ids
    # the 50 heavy rows (10000x weight) should essentially all be kept
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 45


def test_epoch_shuffle_permutes_per_epoch_and_balances_shards(spark):
    """Same epoch => identical order on rerun; different epochs =>
    different permutations; shards are balanced-in-expectation and
    exhaustive."""
    from nextbus2pg_spark.operators.curation import epoch_shuffle

    df = spark.range(400).select(F.col("id").alias("doc_id"))
    e1a = [
        r.doc_id
        for r in epoch_shuffle(df, ["doc_id"], epoch=1)
        .orderBy("shuffle_key", "doc_id")
        .collect()
    ]
    e1b = [
        r.doc_id
        for r in epoch_shuffle(df, ["doc_id"], epoch=1)
        .orderBy("shuffle_key", "doc_id")
        .collect()
    ]
    e2 = [
        r.doc_id
        for r in epoch_shuffle(df, ["doc_id"], epoch=2)
        .orderBy("shuffle_key", "doc_id")
        .collect()
    ]
    assert e1a == e1b, "same epoch must reproduce the same order"
    assert e1a != e2, "epochs must produce different permutations"
    assert sorted(e1a) == list(range(400)) == sorted(e2)

    sharded = epoch_shuffle(df, ["doc_id"], epoch=1, n_shards=8)
    sizes = {
        r.shard: r.n
        for r in sharded.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(sizes) == set(range(8)), "shards must be exhaustive"
    assert max(sizes.values()) < 3 * min(sizes.values()), (
        f"shard skew out of expectation band: {sizes}"
    )


def test_leakage_safe_split_keeps_components_together(spark):
    """Near-dup groups never straddle train/test: every id in a
    connected component gets the component representative's side, ids
    with no edges split exactly like a plain per-id hash split, and
    the output stays disjoint + exhaustive."""
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # components: {0..9} chained, {100,101}, rest untouched
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(100, 101)],
        "id_a long, id_b long",
    )
    out = cu.leakage_safe_split(
        df, "doc_id", edges, test_percent=30, group_col="grp"
    ).collect()
    side = {r.doc_id: r.split for r in out}
    grp = {r.doc_id: r.grp for r in out}
    assert len(side) == 200 and set(side.values()) <= {"train", "test"}
    assert len({side[i] for i in range(10)}) == 1, "component 0-9 split"
    assert side[100] == side[101], "component {100,101} split"
    assert all(grp[i] == 0 for i in range(10))
    # untouched ids match the plain hash split exactly
    plain = {
        r.doc_id: r.split
        for r in cu.train_test_split(
            df, ["doc_id"], test_percent=30
        ).collect()
    }
    untouched = set(range(200)) - set(range(10)) - {100, 101}
    assert all(side[i] == plain[i] for i in untouched)


def test_token_budget_mixture_targets_and_determinism(spark):
    """Each weighted source's kept tokens land near budget*w/Σw
    (within one max-doc-length quantum), a source smaller than its
    target keeps ALL rows, unlisted sources are dropped, and the kept
    set is identical across repartitionings."""
    rows = [
        (i, "big", 100) for i in range(200)
    ] + [
        (1000 + i, "small", 10) for i in range(5)
    ] + [
        (2000 + i, "unlisted", 50) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = cu.token_budget_mixture(
        df, "source", "n_chars",
        weights={"big": 1, "small": 1}, token_budget=8000,
        key_cols=["doc_id"],
    )
    got = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("tok")
    ).collect()
    by = {r.source: (r.n, r.tok) for r in got}
    assert "unlisted" not in by
    # small: target 4000 tokens > its 50 total -> keeps everything
    assert by["small"] == (5, 50)
    # big: target 4000 of 20000 -> ~40 docs; hash noise within ±30%
    assert 2500 <= by["big"][1] <= 5500, by
    # deterministic under repartitioning
    again = cu.token_budget_mixture(
        df.repartition(13), "source", "n_chars",
        weights={"big": 1, "small": 1}, token_budget=8000,
        key_cols=["doc_id"],
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_token_budget_mixture_monotone_in_budget(spark):
    """Raising the budget only ADDS documents (the hash threshold is
    monotone in the budget), so staged corpus builds are stable: a
    500B-token corpus is a superset of the 100B one."""
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", 50 + i % 7) for i in range(300)],
        "doc_id long, source string, n_chars long",
    )
    w = {"s0": 2, "s1": 1, "s2": 1}
    kept = [
        {
            r.doc_id
            for r in cu.token_budget_mixture(
                df, "source", "n_chars", w, budget, key_cols=["doc_id"]
            ).collect()
        }
        for budget in (1000, 4000, 16000)
    ]
    assert kept[0] <= kept[1] <= kept[2]
    assert len(kept[0]) < len(kept[2])


def test_token_budget_mixture_survives_real_world_scale_and_edges(spark):
    """The reproduced crash modes: a 500B-token budget with
    percentage weights must not overflow int64 (thresholds are
    driver-side Python ints), a weighted source with zero total
    tokens keeps all rows instead of dividing by zero, NULL keys fold
    to a sentinel rather than silently hashing the bare salt, and a
    negative budget raises like the sibling validations."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "web", 900), (2, "web", 100), (3, "books", 500),
         (4, "empty", 0), (5, "empty", 0), (None, "web", 100)],
        "doc_id long, source string, n_chars long",
    )
    w = {"web": 70, "books": 20, "empty": 10}
    out = cu.token_budget_mixture(
        df, "source", "n_chars", w, 500_000_000_000, key_cols=["doc_id"]
    ).collect()
    # budget >> corpus: every weighted row kept, including the
    # zero-token source and the NULL-key row
    assert len(out) == 6
    with _pytest.raises(ValueError, match="token_budget"):
        cu.token_budget_mixture(
            df, "source", "n_chars", w, -1, key_cols=["doc_id"]
        )


def test_token_budget_mixture_rejects_float_weights_and_bad_totals(spark):
    """Float weights void the exact-integer guarantee (the product
    exceeds the 2^53 double mantissa at real budgets) and negative
    token sums signal corrupt counts — both raise instead of silently
    drifting or keep-all-flipping."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", -50)], "doc_id long, source string, n_chars long"
    )
    with _pytest.raises(ValueError, match="INTEGER"):
        cu.token_budget_mixture(
            df, "source", "n_chars", {"a": 0.7, "b": 0.3}, 100,
            key_cols=["doc_id"],
        )
    with _pytest.raises(ValueError, match="negative token sum"):
        cu.token_budget_mixture(
            df, "source", "n_chars", {"a": 1, "b": 1}, 100,
            key_cols=["doc_id"],
        )


def test_mixture_audit_reports_realized_vs_target(spark):
    """The audit row agrees with the sampler it audits: kept_docs /
    kept_tokens equal the realized token_budget_mixture output, the
    target is the exact-integer share, and a source smaller than its
    target keeps everything (negative excess)."""
    rows = [(i, "big", 100) for i in range(200)] + [
        (1000 + i, "tiny", 10) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, t long")
    weights = {"big": 1, "tiny": 1}
    audit = {
        r["source"]: r
        for r in cu.mixture_audit(
            df, "source", "t", weights, token_budget=2000,
            key_cols=["doc_id"],
        ).collect()
    }
    kept = cu.token_budget_mixture(
        df, "source", "t", weights, token_budget=2000, key_cols=["doc_id"]
    ).collect()
    realized = {}
    for r in kept:
        d = realized.setdefault(r["source"], [0, 0])
        d[0] += 1
        d[1] += r["t"]
    assert set(audit) == {"big", "tiny"}
    for s in audit:
        assert audit[s]["kept_docs"] == realized.get(s, [0, 0])[0]
        assert audit[s]["kept_tokens"] == realized.get(s, [0, 0])[1]
        assert (
            audit[s]["excess_tokens"]
            == audit[s]["kept_tokens"] - audit[s]["target_tokens"]
        )
    assert audit["big"]["target_tokens"] == 1000
    assert audit["tiny"]["target_tokens"] == 1000
    # tiny holds only 30 tokens: keep-all, undershoot surfaced
    assert audit["tiny"]["kept_docs"] == 3
    assert audit["tiny"]["kept_tokens"] == 30
    assert audit["tiny"]["excess_tokens"] == -970
    # big is oversupplied: sampled down toward (never past by more
    # than one quantile step) its target
    assert 0 < audit["big"]["kept_docs"] < 200


def test_mixture_audit_surfaces_zero_row_weighted_source(spark):
    """A weighted source entirely absent from the data still gets an
    audit row (total 0, kept 0, excess = -target): the typo'd-source /
    upstream-filter failure is exactly what the audit must catch."""
    df = spark.createDataFrame(
        [(1, "web", 100), (2, "web", 100)],
        "doc_id long, source string, t long",
    )
    audit = {
        r["source"]: r
        for r in cu.mixture_audit(
            df, "source", "t", {"web": 3, "code": 1}, token_budget=400,
            key_cols=["doc_id"],
        ).collect()
    }
    assert set(audit) == {"web", "code"}
    assert audit["code"]["total_tokens"] == 0
    assert audit["code"]["kept_docs"] == 0
    assert audit["code"]["kept_tokens"] == 0
    assert audit["code"]["target_tokens"] == 100
    assert audit["code"]["excess_tokens"] == -100


def test_containment_pairs_hand_computed(spark):
    """A 3-shingle doc fully inside a 10-shingle doc: containment
    (small -> big) = 1.0 passes 0.8; the reverse direction (3/10) and
    an unrelated doc never appear; max_df drops the stop-shingle from
    both numerator and denominator consistently."""
    from nextbus2pg_spark.operators.dedup import containment_pairs

    rows = (
        [(1, f"s{k}") for k in range(3)]              # small: s0..s2
        + [(2, f"s{k}") for k in range(10)]           # big: s0..s9
        + [(3, "x0"), (3, "x1"), (3, "s0")]           # 1/3 overlap only
        + [(1, "s0")]                                  # dup collapses
    )
    df = spark.createDataFrame(rows, "id long, shingle string")
    got = {(r["id_a"], r["id_b"]): r.asDict() for r in
           containment_pairs(df, threshold_milli=800).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)]["n_inter"] == 3
    assert got[(1, 2)]["containment"] == 1.0
    # lowering the gate admits the reverse direction at 3/10
    low = {(r["id_a"], r["id_b"]): r["containment"] for r in
           containment_pairs(df, threshold_milli=300).collect()}
    assert low[(2, 1)] == 0.3 and low[(3, 1)] == 1.0 / 3.0
    # max_df=2 drops s0 (df=3): doc 3 loses its only link to 1 and 2
    capped = {(r["id_a"], r["id_b"]) for r in
              containment_pairs(
                  df, threshold_milli=300, max_df=2
              ).collect()}
    assert (3, 1) not in capped and (1, 2) in capped

    import pytest

    with pytest.raises(ValueError, match="threshold_milli"):
        containment_pairs(df, threshold_milli=0)
