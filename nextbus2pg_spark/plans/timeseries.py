"""Time-series / event-sequence fixture queries
(operators/timeseries.py): grid resampling with forward fill, ordered
funnel, cohort retention. Everything here is deterministic — integer
bucket math, timestamp mins, distinct counts; the only FP column (the
resampled value) is carried verbatim, never aggregated — so all three
oracles are plain value-hash replays (no folds, no rounding needed).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nextbus2pg_spark.catalog import load_table
from nextbus2pg_spark.plans.registry import fixture

_FUNNEL_STEPS = ["view", "click", "purchase"]


@fixture(
    "q_resample_ffill",
    oracle="""
WITH obs AS (
  SELECT user_id AS key,
         (epoch_us(ts) // 1000000) // 86400 AS bucket,
         ts, value
  FROM events
),
lastobs AS (
  SELECT key, bucket, value AS obs_value FROM (
    SELECT key, bucket, value,
           row_number() OVER (PARTITION BY key, bucket
                              ORDER BY ts DESC, value DESC) AS rn
    FROM obs) _l WHERE rn = 1
),
grid AS (
  SELECT key, CAST(t.b AS BIGINT) AS bucket
  FROM (SELECT key, min(bucket) AS b0, max(bucket) AS b1
        FROM obs GROUP BY key) _g,
  LATERAL UNNEST(generate_series(b0, b1)) AS t(b)
)
SELECT g.key,
       make_timestamp(g.bucket * 86400 * 1000000) AS bucket_ts,
       last_value(l.obs_value IGNORE NULLS) OVER (
         PARTITION BY g.key ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       l.obs_value IS NOT NULL AS observed
FROM grid g LEFT JOIN lastobs l USING (key, bucket)
""",
)
def q_resample_ffill(spark: SparkSession, sf_dir: str):
    """Per-user daily resampling of the event stream with forward
    fill (operators/timeseries.resample_ffill): every user gets a
    gapless daily grid from their first to last event; quiet days
    carry the previous day's last value (`observed = false`). Pure
    integer bucket math + one window pass — the whole relation
    replays exactly (the carried `value` is verbatim, never summed).
    """
    from nextbus2pg_spark.operators.timeseries import resample_ffill

    ev = load_table(spark, sf_dir, "events")
    out = resample_ffill(ev, "user_id", "ts", "value", step_seconds=86400)
    return out.select(
        "key",
        F.col("bucket_ts").cast("timestamp_ntz").alias("bucket_ts"),
        "value",
        "observed",
    )


def _funnel_oracle(steps: list[str]) -> str:
    ctes = [
        f"""s0 AS (
  SELECT user_id AS u, min(ts) AS t FROM events
  WHERE event_type = '{steps[0]}' GROUP BY user_id
)"""
    ]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(f"""s{i} AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s{i - 1} p ON p.u = e.user_id
  WHERE e.event_type = '{step}' AND e.ts > p.t
  GROUP BY e.user_id
)""")
    unions = "\n  UNION ALL\n".join(
        f"  SELECT u, {i} AS step_index, '{s}' AS step, t FROM s{i}"
        for i, s in enumerate(steps)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT u AS user, CAST(step_index AS INTEGER) AS step_index, step, t
FROM (
{unions}
) _u
"""
    )


@fixture("q_funnel", oracle=_funnel_oracle(_FUNNEL_STEPS))
def q_funnel(spark: SparkSession, sf_dir: str):
    """Strict-order funnel detail (operators/timeseries.funnel_times):
    per user, the earliest view, the earliest click strictly after
    that view, the earliest purchase strictly after that click —
    len(steps) bounded join-aggregations, no window over the raw log.
    The oracle replays the per-user step times (value-richer than the
    count rollup `funnel()` derives from this same relation)."""
    from nextbus2pg_spark.operators.timeseries import funnel_times

    ev = load_table(spark, sf_dir, "events")
    out = funnel_times(ev, "user_id", "ts", "event_type", _FUNNEL_STEPS)
    return out.select("user", "step_index", "step", "t")


@fixture(
    "q_retention",
    oracle="""
WITH ev AS (
  SELECT user_id AS u, CAST(ts AS DATE) AS d FROM events
),
first AS (
  SELECT u, min(d) AS cohort_date FROM ev GROUP BY u
)
SELECT f.cohort_date,
       CAST(floor(date_diff('day', f.cohort_date, e.d) / 7) AS INTEGER)
         AS week_offset,
       count(DISTINCT e.u) AS users
FROM ev e JOIN first f USING (u)
GROUP BY 1, 2
""",
)
def q_retention(spark: SparkSession, sf_dir: str):
    """Weekly cohort retention (operators/timeseries.retention_cohorts):
    cohort = date of first event per user, week offset = integer day
    difference div 7 (no engine week-truncation rules), users =
    distinct actives — the standard cohort matrix, exact everywhere."""
    from nextbus2pg_spark.operators.timeseries import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev, "user_id", "ts")


@fixture(
    "q_ewma",
    oracle="""
SELECT user_id AS key, ts, value,
       list_reduce(
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
FROM events
WHERE value IS NOT NULL
""",
)
def q_ewma(spark: SparkSession, sf_dir: str):
    """Per-user EWMA smoothing of the event value stream
    (operators/timeseries.ewma, alpha=0.25): the recurrence
    `s = 0.25*x + 0.75*s_prev` evaluated as a JVM-side left fold over
    each row's ordered prefix. The fold's FP operation order is fixed,
    so DuckDB's `list_reduce` over the identical windowed list replays
    every intermediate bit-for-bit — no rounding anywhere."""
    from nextbus2pg_spark.operators.timeseries import ewma

    ev = load_table(spark, sf_dir, "events")
    out = ewma(ev, "user_id", "ts", "value", alpha=0.25)
    return out.select(
        "key", F.col("ts").cast("timestamp_ntz").alias("ts"), "value", "ewma"
    )


@fixture(
    "q_rolling_anomaly",
    oracle="""
WITH q AS (
  SELECT user_id AS key, ts, value,
         CAST(round(value * 1000) AS BIGINT) AS vz
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT key, ts, value, vz,
         count(vz) OVER win AS n,
         sum(vz)   OVER win AS s,
         sum(vz * vz) OVER win AS ss
  FROM q
  WINDOW win AS (PARTITION BY key ORDER BY ts, value
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT key, ts, value,
       CASE WHEN n * ss - s * s > 0
            THEN CAST(n * vz - s AS DOUBLE)
                 / sqrt(CAST(n * ss - s * s AS DOUBLE))
       END AS zscore,
       (n >= 12 AND n * ss - s * s > 0
        AND (n * vz - s) * (n * vz - s) > 9 * (n * ss - s * s))
         AS is_anomaly
FROM w
""",
)
def q_rolling_anomaly(spark: SparkSession, sf_dir: str):
    """Rolling z-score anomaly detection over each user's value stream
    (operators/timeseries.rolling_anomaly, 24-row trailing frame,
    |z| > 3): values quantize to exact integer millis so the windowed
    sums are order-independent 64-bit integers on BOTH engines; the
    z-score is one cast + sqrt + division from those exact sums, and
    the anomaly flag is a pure integer comparison — no FP in the
    decision path at all."""
    from nextbus2pg_spark.operators.timeseries import rolling_anomaly

    ev = load_table(spark, sf_dir, "events")
    out = rolling_anomaly(
        ev, "user_id", "ts", "value",
        window_rows=24, min_periods=12, threshold_sq=9, scale=1000,
    )
    return out.select(
        "key", F.col("ts").cast("timestamp_ntz").alias("ts"),
        "value", "zscore", "is_anomaly",
    )


@fixture(
    "q_cusum",
    oracle="""
WITH q AS (
  SELECT user_id AS key, ts, value,
         CAST(round(value * 100) AS BIGINT) AS vq
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT key, ts, value,
         list(vq) OVER (PARTITION BY key ORDER BY ts, value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
  FROM q
),
s AS (
  SELECT key, ts, value,
         list_reduce(list_prepend(CAST(0 AS BIGINT), pre),
           (acc, t) -> greatest(acc + t - 7000, CAST(0 AS BIGINT))) AS sp,
         list_reduce(list_prepend(CAST(0 AS BIGINT), pre),
           (acc, t) -> greatest(acc + 3000 - t, CAST(0 AS BIGINT))) AS sn
  FROM w
)
SELECT key, ts, value,
       CAST(sp AS DOUBLE) / 100.0 AS cusum_pos,
       CAST(sn AS DOUBLE) / 100.0 AS cusum_neg,
       (sp > 20000 OR sn > 20000) AS is_change
FROM s
""",
)
def q_cusum(spark: SparkSession, sf_dir: str):
    """Per-user tabular CUSUM drift flags over the event value stream
    (operators/timeseries.cusum_changepoints: target 50, slack 20,
    threshold 200, cent quantization) — the sustained-shift companion
    of q_rolling_anomaly's spike detector. The whole recurrence is
    integer arithmetic over quantized values, so the DuckDB oracle
    replays both one-sided sums exactly via list_reduce folds with a
    prepended 0 as the initial state."""
    from nextbus2pg_spark.operators.timeseries import cusum_changepoints

    ev = load_table(spark, sf_dir, "events")
    out = cusum_changepoints(
        ev, "user_id", "ts", "value",
        target=50.0, slack=20.0, threshold=200.0, scale=100,
    )
    return out.select(
        "key", F.col("ts").cast("timestamp_ntz").alias("ts"), "value",
        "cusum_pos", "cusum_neg", "is_change",
    )


@fixture(
    "q_holt",
    oracle="""
WITH RECURSIVE q AS (
  SELECT user_id AS key, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, value) AS rn
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT key, ts, value, rn, value AS level, CAST(0 AS DOUBLE) AS trend
  FROM q WHERE rn = 1
  UNION ALL
  SELECT n.key, n.ts, n.value, n.rn,
         0.5 * n.value + 0.5 * (s.level + s.trend) AS level,
         0.25 * ((0.5 * n.value + 0.5 * (s.level + s.trend)) - s.level)
           + 0.75 * s.trend AS trend
  FROM s JOIN q n ON n.key = s.key AND n.rn = s.rn + 1
)
SELECT key, ts, value, level, trend, level + trend AS forecast FROM s
""",
)
def q_holt(spark: SparkSession, sf_dir: str):
    """Per-user Holt double-exponential smoothing of the event value
    stream (operators/timeseries.holt_smoothing, alpha=0.5 beta=0.25
    — both binary-exact): the trend-aware EWMA sibling whose
    one-step-ahead forecast = level + trend. The recurrences fold as
    one fixed IEEE expression tree (L_i's subtree repeated verbatim
    inside T_i), replayed by a RECURSIVE CTE stepping row_number per
    key — NOT a struct-state list_reduce, because DuckDB 1.0 evaluates
    struct_pack accumulator fields IN PLACE after the first iteration
    (a later field reads the already-updated earlier field); plain
    recursive columns have copy semantics and match bit-for-bit."""
    from nextbus2pg_spark.operators.timeseries import holt_smoothing

    ev = load_table(spark, sf_dir, "events")
    out = holt_smoothing(ev, "user_id", "ts", "value",
                         alpha=0.5, beta=0.25)
    return out.select(
        "key", F.col("ts").cast("timestamp_ntz").alias("ts"), "value",
        "level", "trend", "forecast",
    )


@fixture(
    "q_gap_detect",
    oracle="""
WITH w AS (
  SELECT user_id AS key,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap_start,
         ts AS gap_end
  FROM events
)
SELECT key, gap_start, gap_end,
       CAST((epoch_us(gap_end) - epoch_us(gap_start)) // 1000000
            AS BIGINT) AS gap_seconds
FROM w
WHERE gap_start IS NOT NULL
  AND (epoch_us(gap_end) - epoch_us(gap_start)) // 1000000 >= 43200
""",
)
def q_gap_detect(spark: SparkSession, sf_dir: str):
    """Feed-outage detection (operators/timeseries.detect_gaps): every
    >= 12h silent interval per user in the event stream, with its
    exact integer duration (microsecond difference floor-divided —
    no timestamp-subtraction semantics to match across engines). One
    lag-window pass; output bounded by the gap count."""
    from nextbus2pg_spark.operators.timeseries import detect_gaps

    ev = load_table(spark, sf_dir, "events")
    out = detect_gaps(ev, "user_id", "ts", min_gap_seconds=43200)
    return out.select(
        "key",
        F.col("gap_start").cast("timestamp_ntz").alias("gap_start"),
        F.col("gap_end").cast("timestamp_ntz").alias("gap_end"),
        "gap_seconds",
    )


@fixture(
    "q_holt_winters",
    oracle="""
WITH RECURSIVE q AS (
  SELECT user_id AS key, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, value) AS rn
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT key, ts, value, rn,
         value AS level, CAST(0 AS DOUBLE) AS trend,
         [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
          CAST(0 AS DOUBLE)] AS sez
  FROM q WHERE rn = 1
  UNION ALL
  SELECT n.key, n.ts, n.value, n.rn,
         0.5 * (n.value - s.sez[1])
           + 0.5 * (s.level + s.trend) AS level,
         0.25 * ((0.5 * (n.value - s.sez[1])
                  + 0.5 * (s.level + s.trend)) - s.level)
           + 0.75 * s.trend AS trend,
         s.sez[2:4] || [
           0.5 * (n.value - (0.5 * (n.value - s.sez[1])
                             + 0.5 * (s.level + s.trend)))
           + 0.5 * s.sez[1]
         ] AS sez
  FROM s JOIN q n ON n.key = s.key AND n.rn = s.rn + 1
)
SELECT key, ts, value, level, trend, sez[4] AS seasonal,
       level + trend + sez[1] AS forecast
FROM s
""",
)
def q_holt_winters(spark: SparkSession, sf_dir: str):
    """Per-user additive Holt-Winters (operators/timeseries.
    holt_winters, m=4, alpha=0.5 beta=0.25 gamma=0.5 — all
    binary-exact) over the event value stream: the seasonality-aware
    completion of the EWMA → Holt family. The oracle's RECURSIVE CTE
    carries the (level, trend, last-m seasonal LIST) state — plain
    recursive columns (lists included) have copy semantics, sidestep-
    ping DuckDB's in-place struct-accumulator fold quirk — and repeats
    the L_i subtree verbatim inside T_i and S_i exactly as the Arrow
    scan evaluates it, so every double matches bit-for-bit."""
    from nextbus2pg_spark.operators.timeseries import holt_winters

    ev = load_table(spark, sf_dir, "events")
    out = holt_winters(
        ev, "user_id", "ts", "value", season_length=4,
        alpha=0.5, beta=0.25, gamma=0.5,
    )
    return out.select(
        "key", F.col("ts").cast("timestamp_ntz").alias("ts"), "value",
        "level", "trend", "seasonal", "forecast",
    )
