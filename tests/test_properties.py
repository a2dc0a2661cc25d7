"""Property-based tests (SURVEY.md §5.5) over hypothesis-generated
batches: dedup-key uniqueness (A1/A2), gapless per-partition sequence
(W1), event-time ≤ processing-time (P6/X2), upsert key-set algebra.

One shared SparkSession; hypothesis drives small row sets (Spark round
trips are expensive, so examples stay compact but adversarial: dupes,
NULLs, unicode, extreme numbers).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from nextbus2pg_spark.functions.scalar import ts_minus_seconds
from nextbus2pg_spark.operators.keyed_write import append_dedup, upsert_batch

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
tags = st.one_of(st.none(), st.sampled_from(["a", "b", "ü", ""]))


@given(
    rows=st.lists(st.tuples(keys, tags, st.integers(0, 3)), min_size=1, max_size=30)
)
@_SETTINGS
def test_dedup_keys_unique_after_append_dedup(spark, rows):
    df = spark.createDataFrame(rows, "k int, tag string, ts int")
    out = append_dedup(df, ["k", "tag", "ts"])
    n = out.count()
    distinct_n = out.select("k", "tag", "ts").distinct().count()
    assert n == distinct_n  # A1/A2: key is unique post-dedup
    # and every surviving key existed in the input
    assert n == df.select("k", "tag", "ts").distinct().count()


@given(
    rows=st.lists(
        st.tuples(keys, st.integers(0, 1000)), min_size=1, max_size=40
    )
)
@_SETTINGS
def test_row_number_gapless_per_partition(spark, rows):
    df = spark.createDataFrame(rows, "grp int, pos int").distinct()
    w = Window.partitionBy("grp").orderBy("pos", "grp")
    out = df.select("grp", F.row_number().over(w).alias("rn"))
    per_group = (
        out.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("rn").alias("lo"),
             F.max("rn").alias("hi"))
        .collect()
    )
    for r in per_group:  # W1: stop_order gapless 1..n per service
        assert (r.lo, r.hi) == (1, r.n)


@given(
    secs=st.lists(
        st.floats(min_value=0.0, max_value=86400.0, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_event_time_never_exceeds_processing_time(spark, secs):
    base = dt.datetime(2024, 1, 15, 12, 0, 0)
    df = spark.createDataFrame(
        [(base, s) for s in secs], "req timestamp_ntz, secs double"
    )
    out = df.select(
        "req", ts_minus_seconds(F.col("req"), F.col("secs")).alias("et")
    ).collect()
    for r in out:  # P6/X2: event time = request − lag ≤ request
        assert r.et <= r.req


@given(
    existing=st.lists(st.tuples(keys, st.text(max_size=3)), max_size=15),
    incoming=st.lists(st.tuples(keys, st.text(max_size=3)), max_size=15),
)
@_SETTINGS
def test_upsert_key_set_is_union(spark, existing, incoming):
    e = spark.createDataFrame(
        existing, "k int, payload string"
    ).dropDuplicates(["k"])
    i = spark.createDataFrame(
        incoming, "k int, payload string"
    ).dropDuplicates(["k"])
    if not existing:
        e = spark.createDataFrame([], "k int, payload string")
    if not incoming:
        i = spark.createDataFrame([], "k int, payload string")
    out = upsert_batch(e, i, ["k"], ["payload"])
    got = {r.k for r in out.collect()}
    want = {r.k for r in e.collect()} | {r.k for r in i.collect()}
    assert got == want  # K1: post-upsert key set = union of key sets
    # incoming payload wins on intersection
    inc = {r.k: r.payload for r in i.collect()}
    for r in out.collect():
        if r.k in inc:
            assert r.payload == inc[r.k]


# --- SCD2 invariants over random snapshot sequences -----------------

scd_vals = st.one_of(st.none(), st.sampled_from(["x", "y", "ü"]))


@given(
    snaps=st.lists(
        st.lists(st.tuples(keys, scd_vals), min_size=0, max_size=8),
        min_size=1,
        max_size=4,
    )
)
@_SETTINGS
def test_scd2_invariants_hold_for_any_snapshot_sequence(spark, snaps):
    """For ANY sequence of snapshots: at most one open row per key,
    validity intervals never overlap per key, and the open row equals
    the latest snapshot value for keys present in it."""
    from nextbus2pg_spark.operators.scd2 import scd2_bootstrap, scd2_merge

    dates = [dt.date(2024, 1 + i, 1) for i in range(len(snaps))]

    def frame(rows):
        # last-wins per key inside a snapshot (merge requires deduped input)
        dedup = {}
        for k, v in rows:
            dedup[k] = v
        return spark.createDataFrame(
            [(k, v) for k, v in dedup.items()], "k int, v string"
        )

    hist = scd2_bootstrap(frame(snaps[0]), "k", ["v"], dates[0])
    latest = {k: v for k, v in {k: v for k, v in snaps[0]}.items()}
    for snap, d in zip(snaps[1:], dates[1:]):
        hist = scd2_merge(hist, frame(snap), "k", ["v"], d)
        for k, v in snap:
            latest[k] = v
    rows = hist.collect()

    open_rows = [r for r in rows if r.valid_to is None]
    assert len({r.k for r in open_rows}) == len(open_rows)  # ≤1 open/key

    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for k, versions in by_key.items():
        ivs = sorted(
            (r.valid_from, r.valid_to or dt.date(9999, 1, 1)) for r in versions
        )
        for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
            assert b1 <= a2, (k, ivs)  # intervals never overlap

    opens = {r.k: r.v for r in open_rows}
    for k, v in latest.items():
        assert opens.get(k) == v, (k, v, opens)


lines_strategy = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x y", ""]),
    min_size=0, max_size=6,
)


@given(
    docs=st.lists(lines_strategy, min_size=1, max_size=6),
)
@_SETTINGS
def test_line_dedup_invariants(spark, docs):
    """Over random corpora: (1) every distinct non-empty input line
    survives exactly once across the whole corpus; (2) a doc's
    surviving lines preserve their original relative order; (3) the
    first (min doc id, min position) occurrence is the one that
    survives."""
    from nextbus2pg_spark.operators.curation import line_dedup

    rows = [(i, " | ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           line_dedup(df, "doc_id", "text", sep=" | ").collect()}

    # model
    first_owner = {}
    for i, d in enumerate(docs):
        for pos, ln in enumerate(x for x in d if x != ""):
            first_owner.setdefault(ln, (i, pos))
    survivors_by_doc = {}
    for i, d in enumerate(docs):
        kept, pos = [], 0
        for ln in (x for x in d if x != ""):
            if first_owner[ln] == (i, pos):
                kept.append(ln)
            pos += 1
        if kept:
            survivors_by_doc[i] = " | ".join(kept)
    assert out == survivors_by_doc
    # exactly-once across corpus
    all_out_lines = [
        ln for t in out.values() for ln in t.split(" | ")
    ]
    assert len(all_out_lines) == len(set(all_out_lines))
    assert set(all_out_lines) == set(first_owner)


@given(
    n_words=st.integers(min_value=0, max_value=40),
    chunk=st.integers(min_value=1, max_value=8),
    stride_frac=st.integers(min_value=1, max_value=8),
)
@_SETTINGS
def test_chunk_documents_covers_every_token(spark, n_words, chunk, stride_frac):
    """Invariants over random (length, chunk, stride): every token
    appears in at least one chunk; chunk ids are dense from 0; each
    chunk starts exactly stride tokens after the previous; no chunk
    exceeds chunk_tokens."""
    from nextbus2pg_spark.operators.curation import chunk_documents

    stride = max(1, min(chunk, stride_frac))
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk, stride=stride
        ).collect()
    )
    if n_words == 0:
        assert rows == []
        return
    assert [cid for cid, _, _ in rows] == list(range(len(rows)))
    seen = set()
    for cid, text, n_tokens in rows:
        toks = text.split(" ") if text else []
        assert len(toks) == n_tokens <= chunk
        start = cid * stride
        assert toks == words[start:start + chunk]
        seen.update(toks)
    assert seen == set(words), "some token missing from all chunks"


words_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14
)


@given(docs=st.lists(words_strategy, min_size=1, max_size=5))
@_SETTINGS
def test_substring_span_dedup_matches_reference_model(spark, docs):
    """Over random tiny-vocab corpora (max collision pressure), the
    relational span dedup equals a direct Python model of the
    semantics: every duplicated n-gram occurrence except the global
    (min doc, min pos) owner has its token span cut; coverage unions;
    survivors keep order."""
    from nextbus2pg_spark.operators.curation import substring_span_dedup

    n = 3
    grams: dict[tuple, list] = {}
    for i, ws in enumerate(docs):
        for p in range(len(ws) - n + 1):
            grams.setdefault(tuple(ws[p:p + n]), []).append((i, p))
    covered: dict[int, set] = {i: set() for i in range(len(docs))}
    for occs in grams.values():
        if len(occs) > 1:
            owner = min(occs)
            for i, p in occs:
                if (i, p) != owner:
                    covered[i].update(range(p, p + n))
    expected = {
        i: (len(covered[i]),
            " ".join(w for j, w in enumerate(ws) if j not in covered[i]))
        for i, ws in enumerate(docs)
    }

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_removed, r.t)
        for r in substring_span_dedup(
            df, "doc_id", "text", n=n, out_col="t"
        ).collect()
    }
    assert out == expected


@given(
    rows=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=1,
        max_size=60,
    ),
)
@_SETTINGS
def test_countmin_estimate_bounds(spark, rows):
    """Over random value streams: est >= exact for every key (CM
    sketches never undercount), and est is exact when the sketch is
    wide enough that no two distinct keys share a bucket in every
    row."""
    from collections import Counter

    from nextbus2pg_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    df = spark.createDataFrame([(v,) for v in rows], "k string")
    sketch = countmin_build(df, "k", depth=3, width=64)
    est = {
        r.k: r.est_count
        for r in countmin_estimate(
            sketch, df.select("k").distinct(), "k", depth=3, width=64
        ).collect()
    }
    exact = Counter(rows)
    assert set(est) == set(exact)
    assert all(est[k] >= n for k, n in exact.items())
    # total cell mass per sketch row equals the stream length
    totals = (
        sketch.groupBy("row").sum("cnt").collect()
    )
    assert all(t["sum(cnt)"] == len(rows) for t in totals)


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=15,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=0, max_size=15,
    ),
)
@_SETTINGS
def test_interval_join_matches_model(spark, lefts, rights):
    """Random keyed event sets: the interval join equals the direct
    nested-loop model key == key and rt in [lt, lt + 10]."""
    import datetime as _dt

    from nextbus2pg_spark.streaming.joins import interval_join

    t0 = _dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    ldf = spark.createDataFrame(
        [(k, i, ts(m)) for i, (k, m) in enumerate(lefts)],
        "k long, lid long, lt timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, i, ts(m)) for i, (k, m) in enumerate(rights)],
        "k long, rid long, rt timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            ldf, rdf, "k", "lt", "rt", upper="10 minutes"
        ).collect()
    )
    expected = sorted(
        (li, ri)
        for li, (lk, lm) in enumerate(lefts)
        for ri, (rk, rm) in enumerate(rights)
        if lk == rk and lm <= rm <= lm + 10
    )
    assert got == expected


hist_vals = st.lists(
    st.one_of(
        st.none(),
        st.floats(
            min_value=-50.0, max_value=150.0,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=0,
    max_size=40,
)


@given(vals=hist_vals, cut=st.integers(min_value=0, max_value=40))
@_SETTINGS
def test_histogram_merge_law_and_quantile_model(spark, vals, cut):
    """For ANY value set (NULLs, out-of-range, empty) and ANY 2-way
    split: merge(h(A), h(B)) == h(A ∪ B), and the interpolated
    quantile matches the pure-Python estimator bit-for-bit."""
    from nextbus2pg_spark.operators.sketch import (
        histogram_merge,
        histogram_quantile,
        histogram_state,
    )

    lo, hi, nbins = 0.0, 100.0, 8
    cut = min(cut, len(vals))
    parts = [vals[:cut], vals[cut:]]

    def h(vs):
        df = spark.createDataFrame([(v,) for v in vs], "v double")
        return df.agg(histogram_state(F.col("v"), lo, hi, nbins).alias("h"))

    whole = h(vals).first()["h"]
    merged = (
        h(parts[0]).unionAll(h(parts[1]))
        .agg(histogram_merge(F.col("h"), nbins).alias("h"))
        .first()["h"]
    )
    # python model
    width = (hi - lo) / nbins
    model = [0] * nbins
    for v in vals:
        if v is not None:
            model[max(0, min(nbins - 1, int((v - lo) // width)))] += 1
    assert whole == merged == model

    got = h(vals).select(
        histogram_quantile(F.col("h"), 0.5, lo, hi, nbins).alias("q")
    ).first()["q"]
    total = sum(model)
    if total == 0:
        assert got is None
        return
    target = 0.5 * total
    cum = 0
    want = None
    for i, c in enumerate(model):
        if c > 0 and cum + c >= target:
            want = lo + width * (i + (target - cum) / c)
            break
        cum += c
    assert got == want


# -- PSL registrable domain vs an independent reference matcher --------

_PSL_LABELS = ["com", "uk", "co", "jp", "aichi", "pref", "ck", "www",
               "io", "github", "mx", "gob"]


def _ref_psl_domain(host: str, rules: list[str]) -> str | None:
    """Straight-line publicsuffix.org algorithm (no vectorization):
    the independent model the Spark operator must match."""
    labels = host.lower().split(".")
    parsed = []
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        exc = r.startswith("!")
        parsed.append((r[1:] if exc else r, exc))

    def matches(rule: str) -> bool:
        rl = rule.split(".")
        if len(rl) > len(labels):
            return False
        for rpart, hpart in zip(reversed(rl), reversed(labels)):
            if rpart != "*" and rpart != hpart:
                return False
        return True

    best, best_key = None, None
    for rule, exc in parsed:
        if not matches(rule):
            continue
        key = (exc, len(rule.split(".")))
        if best_key is None or key > best_key:
            best, best_key = (rule, exc), key
    if best is None:
        ps_len = 1  # implicit '*' rule
    else:
        rule, exc = best
        ps_len = len(rule.split(".")) - (1 if exc else 0)
    if len(labels) <= ps_len:
        return None
    return ".".join(labels[len(labels) - ps_len - 1:])


@given(
    hosts=st.lists(
        st.lists(
            st.sampled_from(_PSL_LABELS), min_size=1, max_size=5
        ).map(".".join),
        min_size=1, max_size=15, unique=True,
    ),
    rules=st.lists(
        st.one_of(
            st.lists(
                st.sampled_from(_PSL_LABELS), min_size=1, max_size=3
            ).map(".".join),
            st.lists(
                st.sampled_from(_PSL_LABELS), min_size=1, max_size=2
            ).map(lambda ls: "*." + ".".join(ls)),
            st.lists(
                st.sampled_from(_PSL_LABELS), min_size=1, max_size=2
            ).map(lambda ls: "!" + ".".join(ls)),
        ),
        min_size=1, max_size=12, unique=True,
    ),
)
@_SETTINGS
def test_psl_registrable_domain_matches_reference_model(spark, hosts, rules):
    from nextbus2pg_spark.operators.url import psl_registrable_domain

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    psl = spark.createDataFrame([(r,) for r in rules], "suffix string")
    got = {
        r["host"]: r["domain"]
        for r in psl_registrable_domain(df, "host", psl).collect()
    }
    want = {h: _ref_psl_domain(h, rules) for h in hosts}
    assert got == want, (got, want, rules)


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    mode=st.sampled_from(["cycle", "none"]),
)
@settings(max_examples=40, deadline=None)
def test_png_round_trip_is_lossless(h, w, seed, mode):
    """Any image, any shape, either filter strategy: encode → decode is
    the identity (pure-Python property — no Spark round trip needed).
    'cycle' walks every PNG filter type, so this fuzzes all five
    reconstruction branches across arbitrary pixel content."""
    import numpy as np

    from nextbus2pg_spark.functions.imagecodec import (
        decode_image,
        png_encode_gray,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    dw, dh, gray = decode_image(png_encode_gray(img, filter_mode=mode))
    assert (dw, dh) == (w, h)
    assert np.array_equal(gray, img)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("abcdef")),
        min_size=1,
        max_size=40,
    ),
    thr=st.sampled_from([200, 500, 800, 1000]),
)
@_SETTINGS
def test_containment_pairs_matches_set_model(spark, rows, thr):
    """containment == |A∩B|/|A| computed from Python sets, pairs appear
    iff the integer gate passes, and the score is always in (0, 1]."""
    from nextbus2pg_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(rows, "id int, shingle string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["containment"])
        for r in containment_pairs(df, threshold_milli=thr).collect()
    }
    sets: dict = {}
    for i, s in rows:
        sets.setdefault(i, set()).add(s)
    want = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter and 1000 * inter >= thr * len(sets[a]):
                want[(a, b)] = (inter, inter / len(sets[a]))
    assert got == want
    assert all(0.0 < c <= 1.0 for _, c in got.values())


@given(
    pts=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=2,
        max_size=12,
    )
)
@_SETTINGS
def test_theil_sen_matches_sorted_slope_model(spark, pts):
    """The operator's explicit rank-median equals the sorted-list model
    (statistics.median over all pairwise slopes with distinct x),
    including duplicate points, ties, and the all-equal-x degenerate."""
    import statistics

    from nextbus2pg_spark.operators.stats import theil_sen

    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in pts],
        "g string, x double, y double",
    )
    r = theil_sen(df, ["g"], "x", "y").collect()[0]
    # the model counts each unordered pair once, exactly like the
    # operator's xa < xb join (duplicate points pair with everything)
    slopes = sorted(
        (yb - ya) / (xb - xa)
        for (xa, ya) in pts
        for (xb, yb) in pts
        if xa < xb
    )
    assert r["n_pairs"] == len(slopes)
    if slopes:
        assert r["slope"] == statistics.median(slopes)
    else:
        assert r["slope"] is None


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    rst=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_round_trip_within_quant_error(h, w, seed, rst):
    """Any image, any shape, with/without restart markers: encode →
    decode at quant=1 reconstructs within coefficient-rounding error
    (≤2 greylevels) and exact dimensions — fuzzing the Huffman
    DC-diff/AC-run/ZRL/EOB paths, edge-replication padding, and RSTn
    resync across arbitrary pixel content (pure Python, no Spark)."""
    import numpy as np

    from nextbus2pg_spark.functions.jpegcodec import (
        jpeg_decode,
        jpeg_encode_gray,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    dw, dh, gray = jpeg_decode(
        jpeg_encode_gray(img, quant=1, restart_interval=rst)
    )
    assert (dw, dh) == (w, h)
    assert np.abs(gray.astype(int) - img.astype(int)).max() <= 2


@given(
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    sampling=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_constant_blocks_exact_both_containers(bh, bw, seed, sampling):
    """The oracle's lossless trick as a property: ANY per-8x8-constant
    image round-trips bit-exactly at quant=1, through BOTH the
    grayscale and interleaved-YCbCr containers at every supported
    sampling geometry."""
    import numpy as np

    from nextbus2pg_spark.functions.jpegcodec import (
        jpeg_decode,
        jpeg_encode_gray,
        jpeg_encode_ycbcr,
    )

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(bh, bw))
    img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    for data in (
        jpeg_encode_gray(img, quant=1),
        jpeg_encode_ycbcr(img, sampling=sampling, quant=1),
    ):
        _w, _h, gray = jpeg_decode(data)
        assert np.array_equal(gray, img)
