"""Mergeable fixed-bin histogram (operators/sketch.py): exact state,
merge algebra, interpolated quantiles, and the ContinuousAggregate
integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextbus2pg_spark.operators.sketch import (
    histogram_merge,
    histogram_quantile,
    histogram_sketch,
    histogram_state,
)
from nextbus2pg_spark.pipelines.continuous_aggregate import ContinuousAggregate


def _py_hist(vals, lo, hi, nbins):
    width = (hi - lo) / nbins
    out = [0] * nbins
    for v in vals:
        if v is None:
            continue
        out[max(0, min(nbins - 1, int((v - lo) // width)))] += 1
    return out


def _py_quantile(counts, q, lo, hi, nbins):
    width = (hi - lo) / nbins
    total = sum(counts)
    target = q * total
    cum = 0
    for i, c in enumerate(counts):
        if c > 0 and cum + c >= target:
            return lo + width * (i + (target - cum) / c)
        cum += c
    return None


def test_state_counts_clamp_and_nulls(spark):
    vals = [0.0, 1.0, 5.0, 9.99, 10.0, -3.0, 42.0, None, 2.5]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = df.agg(histogram_state(F.col("v"), 0.0, 10.0, 4).alias("h")).first()
    assert row["h"] == _py_hist(vals, 0.0, 10.0, 4)
    # out-of-range clamps into edge bins, NULL skipped entirely
    assert sum(row["h"]) == len([v for v in vals if v is not None])


def test_merge_equals_whole(spark):
    """h(A ∪ B) == merge(h(A), h(B)) — the monoid law the continuous
    aggregate relies on, for an arbitrary 3-way split."""
    import random

    rnd = random.Random(7)
    vals = [rnd.uniform(-5, 105) for _ in range(500)]
    parts = [vals[:100], vals[100:350], vals[350:]]
    df_all = spark.createDataFrame([(v,) for v in vals], "v double")
    whole = df_all.agg(
        histogram_state(F.col("v"), 0.0, 100.0, 16).alias("h")
    ).first()["h"]
    states = [
        spark.createDataFrame([(v,) for v in p], "v double")
        .agg(histogram_state(F.col("v"), 0.0, 100.0, 16).alias("h"))
        for p in parts
    ]
    merged = (
        states[0].unionAll(states[1]).unionAll(states[2])
        .agg(histogram_merge(F.col("h"), 16).alias("h"))
        .first()["h"]
    )
    assert merged == whole == _py_hist(vals, 0.0, 100.0, 16)


def test_quantile_matches_python_model(spark):
    vals = [float(i) for i in range(1, 101)]  # uniform 1..100
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    st = df.agg(histogram_state(F.col("v"), 0.0, 100.0, 20).alias("h"))
    got = st.select(
        *[
            histogram_quantile(F.col("h"), q, 0.0, 100.0, 20).alias(f"q{q}")
            for q in (0.1, 0.5, 0.9, 0.99)
        ]
    ).first()
    counts = _py_hist(vals, 0.0, 100.0, 20)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert abs(got[f"q{q}"] - _py_quantile(counts, q, 0.0, 100.0, 20)) < 1e-9
        # estimator error is bounded by one bin width (5.0) vs truth
        assert abs(got[f"q{q}"] - q * 100) <= 5.0
    # empty state -> NULL
    empty = spark.createDataFrame([([0] * 20,)], "h array<bigint>")
    assert empty.select(
        histogram_quantile(F.col("h"), 0.5, 0.0, 100.0, 20).alias("q")
    ).first()["q"] is None


def test_histogram_sketch_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("b", 5.0)], "g string, v double"
    )
    out = {
        r["g"]: r["hist"]
        for r in histogram_sketch(df, "v", ["g"], 0.0, 10.0, 2).collect()
    }
    assert out == {"a": [1, 1], "b": [0, 1]}


def test_continuous_aggregate_histogram_merges_across_batches(spark, tmp_path):
    """Two batches through the rollup == one batch of the union, and
    the derived quantile is readable from stored state."""
    mk = lambda rows: spark.createDataFrame(rows, "day string, v double")  # noqa: E731
    b1 = mk([("d1", float(v)) for v in range(0, 50)])
    b2 = mk([("d1", float(v)) for v in range(50, 100)] + [("d2", 7.0)])
    ca = ContinuousAggregate(
        spark, str(tmp_path / "ca"), ["day"],
        {"n": ("count", None), "hist": ("histogram", "v", (0.0, 100.0, 10))},
    )
    ca.apply_batch(b1)
    ca.apply_batch(b2)
    got = {r["day"]: (r["n"], r["hist"]) for r in ca.read().collect()}
    assert got["d1"][0] == 100
    assert got["d1"][1] == _py_hist([float(v) for v in range(100)], 0.0, 100.0, 10)
    assert got["d2"] == (1, _py_hist([7.0], 0.0, 100.0, 10))
    p50 = (
        ca.read().filter("day = 'd1'")
        .select(histogram_quantile(F.col("hist"), 0.5, 0.0, 100.0, 10).alias("p"))
        .first()["p"]
    )
    assert abs(p50 - 50.0) <= 10.0


def test_all_null_partition_does_not_poison_merge(spark, tmp_path):
    """A group whose rows in one partition are ALL NULL-valued must
    contribute a zero state, not a NULL state that wipes real counts
    at merge time (regression: SUM over zero non-null rows is NULL)."""
    nulls = spark.createDataFrame(
        [("a", None), ("a", None)], "g string, v double"
    ).repartition(1)
    vals = spark.createDataFrame([("a", 5.0)], "g string, v double").repartition(1)
    st = histogram_sketch(nulls.unionAll(vals), "v", ["g"], 0.0, 10.0, 4)
    assert st.first()["hist"] == [0, 0, 1, 0]
    # same shape through the continuous aggregate's two-phase path
    ca = ContinuousAggregate(
        spark, str(tmp_path / "ca0"), ["g"],
        {"hist": ("histogram", "v", (0.0, 10.0, 4))},
    )
    ca.apply_batch(nulls.unionAll(vals))
    assert ca.read().first()["hist"] == [0, 0, 1, 0]
    # merging a legacy NULL-element state acts as zero
    legacy = spark.createDataFrame(
        [([None, None, None, None],), ([0, 0, 2, 0],)], "h array<bigint>"
    )
    assert legacy.agg(histogram_merge(F.col("h"), 4).alias("m")).first()[
        "m"
    ] == [0, 0, 2, 0]


def test_cms_state_in_continuous_aggregate(spark, tmp_path):
    """Flat count-min state merges across batches exactly like building
    it from the union, and point estimates never undercount the true
    frequency (here: no collisions at 3x32 for 3 keys, so exact)."""
    from nextbus2pg_spark.operators.sketch import (
        cms_state,
        cms_state_estimate,
        cms_state_total,
    )

    mk = lambda rows: spark.createDataFrame(rows, "day string, k string")  # noqa: E731
    b1 = mk([("d1", "x")] * 30 + [("d1", "y")] * 5)
    b2 = mk([("d1", "x")] * 10 + [("d1", "z")] * 2)
    ca = ContinuousAggregate(
        spark, str(tmp_path / "cms"), ["day"],
        {"freq": ("countmin", "k", (3, 32))},
    )
    ca.apply_batch(b1)
    ca.apply_batch(b2)
    whole = (
        b1.unionAll(b2)
        .groupBy("day")
        .agg(cms_state(F.col("k"), 3, 32).alias("freq"))
        .first()["freq"]
    )
    stored = ca.read().first()
    assert stored["freq"] == whole
    probe = spark.createDataFrame(
        [("x",), ("y",), ("z",), ("never",)], "k string"
    ).crossJoin(ca.read().select("freq"))
    got = {
        r["k"]: (r["est"], r["total"])
        for r in probe.select(
            "k",
            cms_state_estimate(F.col("freq"), F.col("k"), 3, 32).alias("est"),
            cms_state_total(F.col("freq"), 32).alias("total"),
        ).collect()
    }
    assert got["x"][0] >= 40 and got["y"][0] >= 5 and got["z"][0] >= 2
    assert got["x"][1] == 47  # total events folded into the state
    # heavy hitters: est >= 20% of total picks exactly x
    heavy = [k for k, (e, t) in got.items() if e >= 0.2 * t]
    assert heavy == ["x"]


def test_cms_state_width_bound_raises(spark):
    """The flat CMS form emits one aggregate buffer per cell; above
    CMS_STATE_MAX_CELLS it refuses with a pointer to countmin_build's
    long-form relation (which scales to any width)."""
    import pytest
    from pyspark.sql import functions as F

    from nextbus2pg_spark.operators.sketch import (
        CMS_STATE_MAX_CELLS,
        cms_state,
    )

    with pytest.raises(ValueError, match="countmin_build"):
        cms_state(F.col("x"), depth=4, width=CMS_STATE_MAX_CELLS)
    # the default rollup shape stays well inside the bound
    cms_state(F.col("x"))


def test_hll_registers_merge_by_max_and_estimate_tracks_truth(spark):
    """Register sets from two halves merged by per-bucket max equal the
    registers of the union (THE HLL rollup property); the raw estimate
    lands within the expected ~1.04/sqrt(64) relative-error band of
    the true distinct count for a well-conditioned cardinality."""
    from pyspark.sql import functions as F

    from nextbus2pg_spark.operators.sketch import (
        hll_raw_estimate,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(i % 700,) for i in range(5000)], "user_id long"
    )
    left = df.where(F.col("user_id") < 350)
    right = df.where(F.col("user_id") >= 350)
    merged = (
        hll_registers(left, ["user_id"], p=6)
        .unionByName(hll_registers(right, ["user_id"], p=6))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = hll_registers(df, ["user_id"], p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    est = hll_raw_estimate(whole, p=6).collect()[0]
    assert est.m == 64
    # 700 >> 2.5*m: raw estimate applies, ~13% sigma; allow 3 sigma.
    assert abs(est.raw_estimate - 700) / 700 < 0.4


def test_hll_registers_drop_null_keys(spark):
    from nextbus2pg_spark.operators.sketch import hll_registers

    df = spark.createDataFrame(
        [(1,), (None,), (2,)], "user_id long"
    )
    regs = hll_registers(df, ["user_id"], p=6)
    # only 2 live keys -> at most 2 registers
    assert regs.count() <= 2
