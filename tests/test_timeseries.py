"""Time-series operator tests: resample/ffill semantics, strict-order
funnel, cohort retention — hand-computed expectations on tiny frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.timeseries import (
    funnel,
    funnel_times,
    resample_ffill,
    retention_cohorts,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_resample_fills_gaps_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1, 5), 10.0),
            (1, _ts(1, 9), 11.0),   # same day: later obs wins
            (1, _ts(4, 1), 40.0),   # days 2-3 are gaps
        ],
        "k long, ts timestamp, v double",
    )
    out = {
        r["bucket_ts"].day: (r["value"], r["observed"])
        for r in resample_ffill(df, "k", "ts", "v", 86400).collect()
    }
    assert out == {
        1: (11.0, True),
        2: (11.0, False),
        3: (11.0, False),
        4: (40.0, True),
    }


def test_resample_tie_on_ts_takes_larger_value(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 3.0), (1, _ts(1), 7.0)],
        "k long, ts timestamp, v double",
    )
    rows = resample_ffill(df, "k", "ts", "v", 86400).collect()
    assert len(rows) == 1 and rows[0]["value"] == 7.0


def test_resample_grid_is_per_key(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 1.0), (2, _ts(10), 2.0), (2, _ts(12), 3.0)],
        "k long, ts timestamp, v double",
    )
    out = resample_ffill(df, "k", "ts", "v", 86400)
    per_key = {
        r["key"]: r["n"]
        for r in out.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_key == {1: 1, 2: 3}  # no global calendar rows


def test_resample_bad_step_rejected(spark):
    df = spark.createDataFrame([(1, _ts(1), 1.0)], "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="step_seconds"):
        resample_ffill(df, "k", "ts", "v", 0)


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1 completes in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2 clicks BEFORE viewing: click doesn't count; no purchase
        (2, _ts(2), "click"), (2, _ts(3), "view"),
        # u3 views and clicks simultaneously: strict order → no advance
        (3, _ts(1), "view"), (3, _ts(1), "click"),
        # u4 purchases without clicking
        (4, _ts(1), "view"), (4, _ts(2), "purchase"),
    ]
    return spark.createDataFrame(rows, "u long, ts timestamp, e string")


def test_funnel_strict_order(spark, funnel_events):
    out = {
        r["step"]: r["users_reached"]
        for r in funnel(
            funnel_events, "u", "ts", "e", ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 4, "click": 1, "purchase": 1}


def test_funnel_times_match_counts(spark, funnel_events):
    ft = funnel_times(
        funnel_events, "u", "ts", "e", ["view", "click", "purchase"]
    )
    counts = {
        r["step_index"]: r["n"]
        for r in ft.groupBy("step_index")
        .agg(F.count_distinct("user").alias("n"))
        .collect()
    }
    assert counts == {0: 4, 1: 1, 2: 1}
    # u1's click time is its first click after its first view
    t = ft.where((F.col("user") == 1) & (F.col("step_index") == 1)).collect()
    assert t[0]["t"] == _ts(2)


def test_funnel_empty_steps_rejected(spark, funnel_events):
    with pytest.raises(ValueError, match="at least one"):
        funnel(funnel_events, "u", "ts", "e", [])


def test_retention_matrix(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1)), (1, _ts(8)),          # cohort d1: active wk0, wk1
            (2, _ts(1)), (2, _ts(20)),         # cohort d1: wk0, wk2
            (3, _ts(8)),                       # cohort d8: wk0 only
        ],
        "u long, ts timestamp",
    )
    out = {
        (r["cohort_date"].day, r["week_offset"]): r["users"]
        for r in retention_cohorts(df, "u", "ts").collect()
    }
    assert out == {
        (1, 0): 2, (1, 1): 1, (1, 2): 1,
        (8, 0): 1,
    }


def test_ewma_hand_computed_and_null_drop(spark):
    import datetime as dt

    import pytest

    from nextbus2pg_spark.operators.timeseries import ewma

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, t, 4.0),
        (1, t + dt.timedelta(hours=1), 8.0),
        (1, t + dt.timedelta(hours=2), None),
        (1, t + dt.timedelta(hours=3), 2.0),
        (2, t, 10.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {(r.key, r.ts): r.ewma for r in ewma(df, "k", "ts", "v", 0.25).collect()}
    # s0 = 4; s1 = 0.25*8 + 0.75*4 = 5; NULL dropped; s2 = 0.25*2 + 0.75*5
    assert out[(1, t)] == 4.0
    assert out[(1, t + dt.timedelta(hours=1))] == 5.0
    assert (1, t + dt.timedelta(hours=2)) not in out
    assert out[(1, t + dt.timedelta(hours=3))] == 0.25 * 2 + 0.75 * 5.0
    assert out[(2, t)] == 10.0
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, "k", "ts", "v", 0.0)


def test_rolling_anomaly_flags_spike_only_with_min_periods(spark):
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import rolling_anomaly

    t = dt.datetime(2024, 1, 1)
    # Jittered baseline (a CONSTANT one makes any blip carry 100% of
    # the frame variance — a lone 10.5 after 11 exact 10.0s hits the
    # self-inclusion ceiling |z| = sqrt(n-1) > 3 and is correctly
    # flagged); against jitter, a small blip stays under 3 sigma.
    base = [10.0, 10.2] * 9
    vals = base[:11] + [10.3] + base[11:16] + [500.0] + base[16:]
    rows = [(1, t + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = rolling_anomaly(
        df, "k", "ts", "v", window_rows=24, min_periods=12
    ).collect()
    flagged = sorted(r.ts for r in out if r.is_anomaly)
    assert flagged == [t + dt.timedelta(minutes=17)]  # only the 500.0
    # constant prefix: zero variance -> NULL z, never flagged
    first = min(out, key=lambda r: r.ts)
    assert first.zscore is None and not first.is_anomaly


def test_ewma_linear_path_bit_exact_vs_fold(spark):
    """The O(n) applyInPandas scan and the JVM window fold evaluate the
    same strict left fold in IEEE doubles — results must agree
    BIT-FOR-BIT (not just to a tolerance), or the auto-selection would
    change answers at the threshold."""
    import datetime as dt

    import numpy as np

    from nextbus2pg_spark.operators.timeseries import ewma

    rng = np.random.default_rng(7)
    t = dt.datetime(2024, 1, 1)
    rows = []
    for k in (1, 2, 3):
        n = int(rng.integers(50, 200))
        vals = rng.normal(100.0, 37.0, n)
        # include a timestamp tie to exercise the (ts, value) tie-break
        rows.extend(
            (k, t + dt.timedelta(seconds=int(i // 2)), float(v))
            for i, v in enumerate(vals)
        )
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    fold = {
        (r.key, r.ts, r.value): r.ewma
        for r in ewma(df, "k", "ts", "v", 0.3, mode="fold").collect()
    }
    linear = {
        (r.key, r.ts, r.value): r.ewma
        for r in ewma(df, "k", "ts", "v", 0.3, mode="linear").collect()
    }
    assert fold.keys() == linear.keys()
    for key, s in fold.items():
        assert s == linear[key], key  # exact, not approx


def test_ewma_auto_selects_by_longest_series(spark):
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import ewma

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, t + dt.timedelta(seconds=i), float(i)) for i in range(30)
    ] + [(2, t, 5.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")

    short = ewma(df, "k", "ts", "v", 0.25, long_series_threshold=100)
    p = short._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in p and "EvalPython" not in p, p

    long_ = ewma(df, "k", "ts", "v", 0.25, long_series_threshold=10)
    p = long_._jdf.queryExecution().executedPlan().toString()
    # exactly one Python stage, and the quadratic window fold is gone
    assert p.count("FlatMapGroupsInPandas") == 1, p
    assert "collect_list" not in p, p
    # both plans produce the same smoothed values
    assert {
        (r.key, r.ts): r.ewma for r in short.collect()
    } == {(r.key, r.ts): r.ewma for r in long_.collect()}


def test_ewma_mode_validation(spark):
    import datetime as dt

    import pytest

    from nextbus2pg_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "k long, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="mode"):
        ewma(df, "k", "ts", "v", 0.25, mode="vectorized")


def test_cusum_hand_computed(spark):
    """target=10, slack=0, threshold=5: an upward drift of +3/step
    flags once S+ crosses 5; a downward run drives S- symmetrically."""
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import cusum_changepoints

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.0, 13.0, 13.0, 13.0, 7.0, 7.0, 7.0]
    rows = [("k", t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = [r.asDict() for r in cusum_changepoints(
        df, "k", "ts", "v", target=10.0, threshold=5.0, scale=1,
        mode="fold",
    ).orderBy("ts").collect()]
    assert [r["cusum_pos"] for r in out] == [0, 0, 3, 6, 9, 6, 3, 0]
    assert [r["cusum_neg"] for r in out] == [0, 0, 0, 0, 0, 3, 6, 9]
    assert [r["is_change"] for r in out] == [
        False, False, False, True, True, True, True, True
    ]


def test_cusum_linear_path_matches_fold_exactly(spark):
    """Integer state: the applyInPandas scan and the JVM fold must be
    value-IDENTICAL (not just close) on a mixed multi-key frame with
    timestamp ties."""
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import cusum_changepoints

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for k in ("a", "b"):
        for i in range(40):
            v = 10.0 + (i % 7) - (3 if k == "b" else 0) + (i // 9)
            rows.append((k, t0 + dt.timedelta(minutes=i // 2), v))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    kw = dict(target=10.0, slack=1.0, threshold=8.0, scale=100)
    fold = cusum_changepoints(df, "k", "ts", "v", mode="fold", **kw)
    lin = cusum_changepoints(df, "k", "ts", "v", mode="linear", **kw)
    key = ["key", "ts", "value", "cusum_pos", "cusum_neg", "is_change"]
    a = sorted(tuple(r[c] for c in key) for r in fold.collect())
    b = sorted(tuple(r[c] for c in key) for r in lin.collect())
    assert a == b


def test_cusum_auto_routes_long_series_to_linear(spark):
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import cusum_changepoints

    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0 + dt.timedelta(seconds=i), 10.0) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = cusum_changepoints(
        df, "k", "ts", "v", target=10.0, threshold=5.0,
        long_series_threshold=10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # routed to the linear scan
    assert out.count() == 50


def test_holt_hand_computed(spark):
    """alpha=0.5, beta=0.5 on [10, 12, 14]: L1=10,T1=0; L2=11,T2=0.5;
    L3=12.75,T3=1.125; forecasts are level+trend."""
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import holt_smoothing

    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate([10.0, 12.0, 14.0])]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = [r.asDict() for r in holt_smoothing(
        df, "k", "ts", "v", alpha=0.5, beta=0.5, mode="fold"
    ).orderBy("ts").collect()]
    assert [r["level"] for r in out] == [10.0, 11.0, 12.75]
    assert [r["trend"] for r in out] == [0.0, 0.5, 1.125]
    assert [r["forecast"] for r in out] == [10.0, 11.5, 13.875]


def test_holt_linear_matches_fold_bitwise(spark):
    """The applyInPandas scan and the JVM struct fold evaluate the
    same IEEE expression tree: results must be bit-identical (exact
    ==, no tolerance) on irregular multi-key data with ties."""
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import holt_smoothing

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for k in ("a", "b"):
        for i in range(60):
            v = 10.0 + (i % 7) * 1.3 + (i // 9) * (2.0 if k == "a" else -1.0)
            rows.append((k, t0 + dt.timedelta(minutes=i // 3), v))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    kw = dict(alpha=0.25, beta=0.25)
    cols = ["key", "ts", "value", "level", "trend", "forecast"]
    fold = sorted(tuple(r[c] for c in cols) for r in holt_smoothing(
        df, "k", "ts", "v", mode="fold", **kw).collect())
    lin = sorted(tuple(r[c] for c in cols) for r in holt_smoothing(
        df, "k", "ts", "v", mode="linear", **kw).collect())
    assert fold == lin


def test_holt_tracks_linear_drift_better_than_ewma(spark):
    """On a pure linear ramp the Holt forecast converges to the next
    value while EWMA lags — the reason the operator exists."""
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import ewma, holt_smoothing

    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0 + dt.timedelta(minutes=i), 10.0 + 2.0 * i)
            for i in range(40)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    h = holt_smoothing(df, "k", "ts", "v", alpha=0.5, beta=0.5)
    last_h = h.orderBy("ts").collect()[-1]
    e = ewma(df, "k", "ts", "v", alpha=0.5).orderBy("ts").collect()[-1]
    next_true = 10.0 + 2.0 * 40
    assert abs(last_h["forecast"] - next_true) < 0.1
    assert abs(e["ewma"] - last_h["value"]) > 1.0  # EWMA lags the ramp


def test_detect_gaps_hand_computed(spark):
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import detect_gaps

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", t0),
        ("k", t0 + dt.timedelta(seconds=30)),
        ("k", t0 + dt.timedelta(seconds=330)),   # 300s gap
        ("k", t0 + dt.timedelta(seconds=331)),
        ("q", t0),                               # single event: no gap
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = [r.asDict() for r in detect_gaps(
        df, "k", "ts", min_gap_seconds=60
    ).collect()]
    assert len(out) == 1
    g = out[0]
    assert g["key"] == "k" and g["gap_seconds"] == 300
    assert g["gap_start"] == t0 + dt.timedelta(seconds=30)
    assert g["gap_end"] == t0 + dt.timedelta(seconds=330)


def test_detect_gaps_floor_semantics(spark):
    """A 59.9s gap at a 60s threshold is NOT a gap (floor of the
    microsecond difference, not rounding)."""
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import detect_gaps

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", t0), ("k", t0 + dt.timedelta(seconds=59, microseconds=900000))],
        "k string, ts timestamp",
    )
    assert detect_gaps(df, "k", "ts", min_gap_seconds=60).isEmpty()


def test_holt_winters_matches_reference_loop(spark):
    """Independent scalar reimplementation of the three recurrences
    (zero-seasonal init) must match the Arrow scan exactly — doubles
    included; and with gamma=0 the seasonal stays identically 0 so
    level/trend/forecast reduce to plain Holt's."""
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import (
        holt_smoothing,
        holt_winters,
    )

    t0 = dt.datetime(2024, 1, 1)
    vals = [3.0, 7.0, 2.0, 9.0, 4.0, 8.0, 1.0, 10.0, 5.0]
    rows = [("k", t0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")

    m, a, b, g = 3, 0.5, 0.25, 0.5
    got = sorted(
        holt_winters(df, "k", "ts", "v", season_length=m,
                     alpha=a, beta=b, gamma=g).collect(),
        key=lambda r: r["ts"],
    )
    # reference loop
    import collections
    sez = collections.deque([0.0] * m, maxlen=m)
    lv = tr = None
    for i, (x, r) in enumerate(zip(vals, got)):
        s_old = sez[0]
        if i == 0:
            lv, tr = x, 0.0
        else:
            nl = a * (x - s_old) + (1 - a) * (lv + tr)
            tr = b * (nl - lv) + (1 - b) * tr
            lv = nl
        s_new = g * (x - lv) + (1 - g) * s_old
        sez.append(s_new)
        assert (r["level"], r["trend"], r["seasonal"]) == (lv, tr, s_new)
        assert r["forecast"] == lv + tr + sez[0]

    # gamma=0: degenerates to Holt exactly
    hw = sorted(
        holt_winters(df, "k", "ts", "v", season_length=m,
                     alpha=0.5, beta=0.25, gamma=0.0).collect(),
        key=lambda r: r["ts"],
    )
    h = sorted(
        holt_smoothing(df, "k", "ts", "v",
                       alpha=0.5, beta=0.25).collect(),
        key=lambda r: r["ts"],
    )
    for x, y in zip(hw, h):
        assert x["seasonal"] == 0.0
        assert (x["level"], x["trend"], x["forecast"]) == (
            y["level"], y["trend"], y["forecast"])


def test_holt_winters_state_survives_batch_and_key_boundaries(spark):
    """The r13 single-pass mapInPandas scan carries (level, trend,
    seasonal-ring) state across Arrow batches and resets it at key
    changes. Force 3-row Arrow batches so every key spans several
    batches and multiple keys meet inside one partition; every value
    must equal the per-key scalar reference exactly."""
    import collections
    import datetime as dt

    from nextbus2pg_spark.operators.timeseries import holt_winters

    t0 = dt.datetime(2024, 1, 1)
    per_key = {
        "a": [3.0, 7.0, 2.0, 9.0, 4.0, 8.0, 1.0, 10.0],
        "b": [5.0, 5.0, 6.0, 2.0, 7.0, 3.0, 9.0],
        "c": [4.0],
    }
    rows = [
        (k, t0 + dt.timedelta(minutes=i), v)
        for k, vs in per_key.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, v double"
    ).coalesce(1)  # all keys share one partition → one Python scan

    m, a, b, g = 3, 0.5, 0.25, 0.5
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = holt_winters(
            df, "k", "ts", "v", season_length=m, alpha=a, beta=b, gamma=g
        ).collect()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    by_key = {}
    for r in sorted(got, key=lambda r: (r["key"], r["ts"])):
        by_key.setdefault(r["key"], []).append(r)
    assert {k: len(v) for k, v in by_key.items()} == {
        k: len(v) for k, v in per_key.items()
    }
    for k, vs in per_key.items():
        sez = collections.deque([0.0] * m, maxlen=m)
        lv = tr = None
        for i, (x, r) in enumerate(zip(vs, by_key[k])):
            s_old = sez[0]
            if i == 0:
                lv, tr = x, 0.0
            else:
                nl = a * (x - s_old) + (1 - a) * (lv + tr)
                tr = b * (nl - lv) + (1 - b) * tr
                lv = nl
            s_new = g * (x - lv) + (1 - g) * s_old
            sez.append(s_new)
            assert (r["level"], r["trend"], r["seasonal"]) == (
                lv, tr, s_new
            ), (k, i)
            assert r["forecast"] == lv + tr + sez[0], (k, i)


def test_holt_winters_validation(spark):
    import pytest

    from nextbus2pg_spark.operators.timeseries import holt_winters

    df = spark.createDataFrame(
        [("k", 1, 1.0)], "k string, ts long, v double"
    )
    with pytest.raises(ValueError, match="season_length"):
        holt_winters(df, "k", "ts", "v", season_length=0)
    with pytest.raises(ValueError, match="gamma"):
        holt_winters(df, "k", "ts", "v", season_length=2, gamma=1.5)
