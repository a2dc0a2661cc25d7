"""BPE trainer/encoder contracts: the distributed trainer matches a
pure-Python reference implementation merge-for-merge on randomized
corpora (including tie-heavy ones), training is deterministic across
runs, and encoding round-trips (concatenating a word's subword tokens
reconstructs the word + sentinel)."""

from __future__ import annotations

from collections import Counter

import pytest

from nextbus2pg_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_encode,
    bpe_train,
)


def _reference_train(texts, n_merges, min_pair_freq=2):
    """Sennrich-style reference BPE on word frequencies, ties broken
    lexicographically — the model the Spark trainer must match."""
    freqs = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: tuple(list(w) + [EOW]) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] += f
        if not pair_counts:
            break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        for w in syms:
            out = []
            for t in syms[w]:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            syms[w] = tuple(out)
    return merges


@pytest.mark.parametrize("seed", [1, 7])
def test_trainer_matches_reference(spark, seed):
    import random

    rnd = random.Random(seed)
    vocab = ["aba", "abab", "banana", "bandana", "cabana", "nab", "an"]
    texts = [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(3, 10)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, "text", n_merges=12)
    want = _reference_train(texts, 12)
    assert got == want, f"merge tables diverge: {got} vs {want}"
    # determinism: a second run produces the identical table
    assert bpe_train(df, "text", n_merges=12) == want


def test_encode_applies_merges_and_roundtrips(spark):
    texts = ["banana bandana", "banana banana nab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=8, min_pair_freq=1)
    assert merges, "tiny corpus must still learn merges"
    enc = {r.id: r for r in bpe_encode(df, "doc_id", "text", merges).collect()}
    for i, t in enumerate(texts):
        # executor encoding == reference encoding, word by word
        want = [
            tok
            for w in t.split(" ")
            for tok in _encode_word(w, merges)
        ]
        assert list(enc[i].tokens) == want
        assert enc[i].n_tokens == len(want)
        # round-trip: concatenation reconstructs words + sentinels
        assert "".join(enc[i].tokens) == EOW.join(t.split(" ")) + EOW
    # merges actually compress: fewer tokens than characters
    assert enc[0].n_tokens < len(texts[0].replace(" ", "")) + 2


def test_encode_tolerates_null_text(spark):
    """A corpus that TRAINS (explode drops NULL word arrays) must also
    ENCODE: NULL text yields zero tokens instead of an executor
    AttributeError."""
    df = spark.createDataFrame(
        [(1, "low lower"), (2, None), (3, "low")], "id long, text string"
    )
    merges = bpe_train(df, "text", n_merges=3, min_pair_freq=2)
    rows = {
        r.id: (r.tokens, r.n_tokens)
        for r in bpe_encode(df, "id", "text", merges).collect()
    }
    assert rows[2] == ([], 0)
    assert rows[3][1] >= 1 and "".join(rows[3][0]) == "low" + EOW


def test_oracle_survives_early_merge_exhaustion(spark):
    """A corpus with fewer learnable merges than n_merges must yield
    correct token counts from the DuckDB oracle (the best-pair CTE
    goes empty; a cross join there would zero every count)."""
    import duckdb

    from nextbus2pg_spark.plans.textstats import _bpe_oracle_sql

    rows = [(1, "ab ab ab"), (2, "ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, "text", n_merges=5, min_pair_freq=2)
    assert len(merges) < 5, "fixture must exhaust merges early"
    want = {
        r.id: r.n_tokens
        for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = dict(
        con.execute(_bpe_oracle_sql(5, final="token_counts")).fetchall()
    )
    assert got == want, (got, want)
    # ...and the merge table itself still matches
    got_m = sorted(
        con.execute(_bpe_oracle_sql(5)).fetchall()
    )
    assert got_m == [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
