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
