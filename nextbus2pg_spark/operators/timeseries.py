"""Time-series and event-sequence analytics over an event log —
regular-grid resampling with forward fill, ordered-funnel conversion,
and cohort retention (north-star surface: the reference's
vehicle-location log is exactly this shape — "position per vehicle per
minute, gaps carried forward", "how many riders reach each step",
"do vehicles seen in week 0 still report in week k" — and the same
three shapes are the bread-and-butter of any product-event warehouse).

Design for 100 TB:
- **Grids derive per key, never globally.** ``resample_ffill``
  sequences bucket indexes between each key's own min and max (one
  partial-aggregatable min/max per key, then a generated-column
  explode) — no global calendar join, no row for the quiet keys'
  absent history, and the explode is map-side (zero shuffle beyond
  the per-key agg's).
- **Forward fill is one window pass** over the (bounded) bucket grid
  — ``last(value, ignorenulls=True)`` with an unbounded-preceding
  frame, partition-pruned per key; never a self-join.
- **Funnels are len(steps) bounded joins**, each a per-user min
  aggregation of a filtered event scan — the standard "first matching
  event strictly after the previous step" semantics; no window over
  the raw log, no per-user event collection.
- **Retention is pure integer date math** (day difference div 7):
  no engine-specific week-truncation rules, so the DuckDB oracle
  replays it exactly (all three operators are deterministic —
  timestamps, mins, and integer buckets; the only FP column, the
  resampled value, is carried verbatim, never aggregated).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 86400,
) -> DataFrame:
    """Regular per-key time grid with forward-filled values →
    ``(key, bucket_ts, value, observed)``.

    Buckets are ``floor(epoch / step)`` indexes from each key's first
    to last observation. A bucket with observations carries its LAST
    observation's value (ties on timestamp broken by the larger
    value — deterministic); empty buckets carry the previous bucket's
    value forward (``observed = false``). Leading buckets can never be
    empty (the grid starts at the key's first observation), so
    ``value`` is never NULL in the output.
    """
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1; got {step_seconds}")
    b = (F.unix_timestamp(F.col(ts_col)) / F.lit(step_seconds)).cast("long")
    obs = df.select(
        F.col(key_col).alias("key"),
        b.alias("bucket"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
    )
    last_per_bucket = obs.groupBy("key", "bucket").agg(
        F.max_by(
            F.col("__v"), F.struct(F.col("__ts"), F.col("__v"))
        ).alias("obs_value")
    )
    grid = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "key", F.explode(F.sequence("b0", "b1")).alias("bucket")
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(last_per_bucket, ["key", "bucket"], "left")
        .select(
            "key",
            F.timestamp_seconds(
                F.col("bucket") * F.lit(step_seconds)
            ).alias("bucket_ts"),
            F.last("obs_value", ignorenulls=True)
            .over(w)
            .alias("value"),
            F.col("obs_value").isNotNull().alias("observed"),
        )
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel conversion → one row per step:
    ``(step_index, step, users_reached)``.

    A user reaches step k at the EARLIEST event of type ``steps[k]``
    strictly after their step-(k-1) time (classic strict-order funnel;
    simultaneous events do not advance the funnel). ``users_reached``
    is monotonically non-increasing by construction.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).localCheckpoint(eager=True)  # scanned once per step

    reached = (
        ev.where(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t"))
    )
    counts = [reached.count()]
    for step in steps[1:]:
        reached = (
            ev.where(F.col("etype") == step)
            .join(reached, "user")
            .where(F.col("ts") > F.col("t"))
            .groupBy("user")
            .agg(F.min("ts").alias("t"))
        )
        counts.append(reached.count())
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, s, c) for i, (s, c) in enumerate(zip(steps, counts))],
        "step_index int, step string, users_reached long",
    )


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user funnel detail → ``(user, step_index, step, t)`` for
    every step the user reached (the row-level relation ``funnel``
    aggregates; exposed separately so the driver oracle can
    value-check the per-user times, not just the counts)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).localCheckpoint(eager=True)
    reached = (
        ev.where(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t"))
    )
    out = reached.select(
        "user", F.lit(0).alias("step_index"), F.lit(steps[0]).alias("step"), "t"
    )
    for i, step in enumerate(steps[1:], start=1):
        reached = (
            ev.where(F.col("etype") == step)
            .join(reached, "user")
            .where(F.col("ts") > F.col("t"))
            .groupBy("user")
            .agg(F.min("ts").alias("t"))
        )
        out = out.unionByName(
            reached.select(
                "user",
                F.lit(i).alias("step_index"),
                F.lit(step).alias("step"),
                "t",
            )
        )
    return out


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    *,
    mode: str = "auto",
    long_series_threshold: int = 4096,
) -> DataFrame:
    """Per-key exponentially weighted moving average →
    ``(key, ts, value, ewma)`` — the classic monitoring smoother
    ``s_i = alpha * x_i + (1 - alpha) * s_{i-1}`` with ``s_0 = x_0``.

    Two execution paths with BIT-IDENTICAL results (both evaluate the
    recurrence as a strict left fold in IEEE doubles with the fixed
    operation order ``alpha*x`` then ``(1-alpha)*acc`` then the sum):

    - ``fold`` — a JVM-side left fold over each row's ordered value
      prefix (window ``collect_list`` + ``F.aggregate``); no Python in
      the path, and a DuckDB ``list_reduce`` over the same windowed
      list replays every intermediate bit-for-bit. The prefix array is
      O(n^2) transient values per key — the right shape for SHORT
      per-entity series (resampled metric streams).
    - ``linear`` — one ordered ``applyInPandas`` scan per key: O(n)
      time and O(n) state (the group itself), the right shape for
      long/unbounded series where the fold's quadratic prefix would
      dominate. One Python (Arrow) stage; a key's whole series must
      fit one task, which the recurrence requires anyway — beyond
      that, bucket keys by epoch and seed each bucket.

    ``mode='auto'`` (default) picks per call: one partial-aggregated
    count-per-key pass (a single bounded 1-row collect) and, if any
    key's series exceeds ``long_series_threshold``, the WHOLE frame
    takes the linear path (paths agree bitwise, so wholesale routing
    beats a per-key split's extra window + union). ``mode='fold'`` /
    ``mode='linear'`` force a path (tests pin their agreement).

    Rows are ordered by ``(ts, value)`` — the value tie-break makes
    equal-timestamp prefixes deterministic. NULL values are dropped
    before smoothing (they carry no observation).

    Pick ``alpha`` exactly representable in binary (0.25, 0.5, 0.75)
    when oracle parity matters: ``1 - alpha`` is computed driver-side
    in Python floats and embedded as a literal on both engines.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]; got {alpha}")
    if mode not in ("auto", "fold", "linear"):
        raise ValueError(f"mode must be auto|fold|linear; got {mode!r}")
    a, b = float(alpha), 1.0 - float(alpha)
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull())

    if mode == "auto":
        # One cheap partial-aggregated pass; the collect is a single
        # row (max over per-key counts), bounded by construction.
        longest = base.groupBy("key").agg(
            F.count("value").alias("__n")
        ).agg(F.max("__n")).first()[0]
        mode = (
            "linear"
            if longest is not None and longest > long_series_threshold
            else "fold"
        )

    if mode == "linear":
        out_schema = StructType(
            base.schema.fields + [StructField("ewma", DoubleType())]
        )

        def _scan(pdf):
            pdf = pdf.sort_values(
                ["ts", "value"], kind="mergesort", ignore_index=True
            )
            vals = pdf["value"].to_numpy(dtype="float64")
            out = np.empty(len(vals), dtype="float64")
            acc = 0.0
            for i, x in enumerate(vals):
                acc = x if i == 0 else a * x + b * acc
                out[i] = acc
            return pdf.assign(ewma=out)

        return base.groupBy("key").applyInPandas(_scan, schema=out_schema)

    w = (
        Window.partitionBy("key")
        .orderBy("ts", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return base.select(
        "key",
        "ts",
        "value",
        F.aggregate(
            F.collect_list("value").over(w),
            F.lit(None).cast("double"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.lit(a) * x + F.lit(b) * acc
            ),
        ).alias("ewma"),
    )


def rolling_anomaly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 24,
    min_periods: int = 12,
    threshold_sq: int = 9,
    scale: int = 1000,
) -> DataFrame:
    """Rolling z-score anomaly flags →
    ``(key, ts, value, zscore, is_anomaly)``.

    Values are quantized to integers (``round(value * scale)``), so the
    rolling sums and sums-of-squares over the trailing ``window_rows``
    frame are EXACT 64-bit integers — order-independent and therefore
    engine-independent (a double SUM in a window is summed in
    segment-tree order by DuckDB and frame order by Spark; integer
    sums dodge that entirely). From the exact sums, with population
    variance over the frame:

        z = (n*v - S) / sqrt(n*SS - S^2)

    one cast, one sqrt, one division — IEEE-identical on both engines.
    The anomaly flag never touches FP at all:

        |z| > tau  <=>  (n*v - S)^2 > tau^2 * (n*SS - S^2)

    with ``threshold_sq = tau^2`` an exact integer (default 9, tau=3),
    gated on ``n >= min_periods``. A zero-variance frame yields NULL
    zscore and a false flag. One window pass, no self-join, no
    collect — the frame is ROWS-bounded so state per key is O(window).

    Overflow bound: ``n * max(|v*scale|)^2 * window_rows`` must stay
    under 2^63 — at scale=1000 that allows |value| up to ~2e5 with
    window 24 (checked by the caller's data contract, not at runtime).
    """
    if window_rows < 2:
        raise ValueError(f"window_rows must be >= 2; got {window_rows}")
    v = F.round(F.col(value_col) * F.lit(scale), 0).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        v.alias("__v"),
    ).where(F.col("__v").isNotNull())
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "value")
        .rowsBetween(-(window_rows - 1), 0)
    )
    n = F.count("__v").over(w)
    s = F.sum("__v").over(w)
    ss = F.sum(F.col("__v") * F.col("__v")).over(w)
    num = n * F.col("__v") - s
    den2 = n * ss - s * s
    return base.select(
        "key",
        "ts",
        "value",
        F.when(
            den2 > 0, num.cast("double") / F.sqrt(den2.cast("double"))
        ).alias("zscore"),
        (
            (n >= F.lit(min_periods))
            & (den2 > 0)
            & (num * num > F.lit(threshold_sq) * den2)
        ).alias("is_anomaly"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention → ``(cohort_date, week_offset, users)``.

    A user's cohort is the DATE of their first event; an event at day
    difference d lands in ``week_offset = d div 7`` (pure integer
    math — no engine week-truncation rules, so oracles replay it
    exactly). ``users`` counts distinct users from the cohort active
    in that offset week; offset 0 equals the cohort size.
    """
    ev = df.select(
        F.col(user_col).alias("user"),
        F.to_date(F.col(ts_col)).alias("d"),
    )
    first = ev.groupBy("user").agg(F.min("d").alias("cohort_date"))
    return (
        ev.join(first, "user")
        .select(
            "user",
            "cohort_date",
            F.floor(
                F.datediff(F.col("d"), F.col("cohort_date")) / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_date", "week_offset")
        .agg(F.count_distinct("user").alias("users"))
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    target: float,
    threshold: float,
    slack: float = 0.0,
    scale: int = 1000,
    mode: str = "auto",
    long_series_threshold: int = 4096,
) -> DataFrame:
    """Per-key tabular CUSUM drift detection →
    ``(key, ts, value, cusum_pos, cusum_neg, is_change)`` — the
    classic sequential changepoint statistic (Page 1954): the rolling
    z-score flags single spikes, CUSUM accumulates small sustained
    shifts that never individually cross a z threshold:

        S+_i = max(0, S+_{i-1} + (x_i - target - slack))
        S-_i = max(0, S-_{i-1} + (target - slack - x_i))

    flagged when either side exceeds ``threshold``.

    Exactness: values quantize to integers (``round(v * scale)``), as
    do target/slack/threshold, so the ENTIRE recurrence is integer
    arithmetic — order-fixed, engine-exact, replayable by a DuckDB
    ``list_reduce`` with a prepended 0 as the initial state (the
    reported ``cusum_pos``/``cusum_neg`` are the single exact
    divisions ``S / scale``; the flag is a pure integer comparison).

    Execution paths mirror :func:`ewma` (bit-identical results; here
    literally value-identical since state is integral):

    - ``fold`` — JVM window ``collect_list`` prefix + two
      ``F.aggregate`` integer folds; O(n^2) transient per key, the
      oracle-replayable shape for short resampled series.
    - ``linear`` — one ordered ``applyInPandas`` scan per key: O(n),
      for long/unbounded series.
    - ``auto`` — one bounded count-per-key pass routes the whole
      frame to ``linear`` when any key exceeds
      ``long_series_threshold``.

    Rows order by ``(ts, value)`` (deterministic equal-timestamp
    prefixes); NULL values drop. Overflow bound: |S| is at most
    Σ|x*scale - target*scale| — int64 is comfortable for any series
    that should be CUSUM-ed in one piece (reset by bucketing keys by
    epoch, as for ewma).
    """
    if mode not in ("auto", "fold", "linear"):
        raise ValueError(f"mode must be auto|fold|linear; got {mode!r}")
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0; got {threshold}")
    tq = int(round(target * scale))
    kq = int(round(slack * scale))
    hq = int(round(threshold * scale))
    cp, cn = tq + kq, tq - kq  # x - cp drives S+; cn - x drives S-

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        F.round(F.col(value_col) * F.lit(scale), 0)
        .cast("long")
        .alias("__vq"),
    ).where(F.col("__vq").isNotNull())

    if mode == "auto":
        longest = base.groupBy("key").agg(
            F.count("__vq").alias("__n")
        ).agg(F.max("__n")).first()[0]
        mode = (
            "linear"
            if longest is not None and longest > long_series_threshold
            else "fold"
        )

    def finish(sp: "Column", sn: "Column"):  # noqa: F821 - doc only
        return [
            (sp.cast("double") / F.lit(float(scale))).alias("cusum_pos"),
            (sn.cast("double") / F.lit(float(scale))).alias("cusum_neg"),
            ((sp > F.lit(hq)) | (sn > F.lit(hq))).alias("is_change"),
        ]

    if mode == "linear":
        from pyspark.sql.types import BooleanType, LongType

        out_schema = StructType(
            [f for f in base.schema.fields if f.name != "__vq"]
            + [
                StructField("__sp", LongType()),
                StructField("__sn", LongType()),
                StructField("is_change", BooleanType()),
            ]
        )

        def _scan(pdf):
            pdf = pdf.sort_values(
                ["ts", "value"], kind="mergesort", ignore_index=True
            )
            vals = pdf["__vq"].to_numpy(dtype="int64")
            sp = np.empty(len(vals), dtype="int64")
            sn = np.empty(len(vals), dtype="int64")
            ap = an = 0
            for i, x in enumerate(vals):
                ap = max(0, ap + int(x) - cp)
                an = max(0, an + cn - int(x))
                sp[i], sn[i] = ap, an
            return pdf.assign(
                __sp=sp, __sn=sn, is_change=(sp > hq) | (sn > hq)
            ).drop(columns=["__vq"])

        out = base.groupBy("key").applyInPandas(_scan, schema=out_schema)
        return out.select(
            "key", "ts", "value",
            *finish(F.col("__sp"), F.col("__sn"))[:2],
            "is_change",
        )

    w = (
        Window.partitionBy("key")
        .orderBy("ts", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefix = F.collect_list("__vq").over(w)
    zero = F.lit(0).cast("long")
    sp = F.aggregate(
        prefix, zero,
        lambda acc, x: F.greatest(acc + x - F.lit(cp), F.lit(0).cast("long")),
    )
    sn = F.aggregate(
        prefix, zero,
        lambda acc, x: F.greatest(acc + F.lit(cn) - x, F.lit(0).cast("long")),
    )
    return base.select("key", "ts", "value", *finish(sp, sn))


def holt_smoothing(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    *,
    mode: str = "auto",
    long_series_threshold: int = 4096,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing →
    ``(key, ts, value, level, trend, forecast)`` — EWMA's trend-aware
    sibling (Holt 1957): a drifting metric saturates a plain EWMA's
    lag, while the coupled level/trend recurrences track it and give
    a one-step-ahead ``forecast = level + trend``:

        L_i = alpha * x_i + (1 - alpha) * (L_{i-1} + T_{i-1})
        T_i = beta * (L_i - L_{i-1}) + (1 - beta) * T_{i-1}

    initialized at ``L_1 = x_1, T_1 = 0``.

    Same dual-path / bit-exactness contract as :func:`ewma` — both
    paths evaluate the recurrences as a strict left fold with one
    fixed IEEE expression tree (``L_i``'s subtree is repeated
    verbatim inside ``T_i``, never reordered), so the JVM fold, the
    Python linear scan, and a DuckDB ``list_reduce`` over
    struct-packed states agree bit-for-bit:

    - ``fold``: window ``collect_list`` prefix + one ``F.aggregate``
      with a (level, trend, initialized) struct accumulator — O(n^2)
      transient per key, oracle-replayable, right for short series;
    - ``linear``: one ordered ``applyInPandas`` scan, O(n), for
      long/unbounded series;
    - ``auto``: one bounded count-per-key pass routes the frame.

    Rows order by ``(ts, value)``; NULL values drop. Pick
    binary-representable ``alpha``/``beta`` (0.5, 0.25, 0.75) when
    oracle parity matters — the complements are computed driver-side.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]; got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1]; got {beta}")
    if mode not in ("auto", "fold", "linear"):
        raise ValueError(f"mode must be auto|fold|linear; got {mode!r}")
    a, ca = float(alpha), 1.0 - float(alpha)
    b, cb = float(beta), 1.0 - float(beta)

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull())

    if mode == "auto":
        longest = base.groupBy("key").agg(
            F.count("value").alias("__n")
        ).agg(F.max("__n")).first()[0]
        mode = (
            "linear"
            if longest is not None and longest > long_series_threshold
            else "fold"
        )

    if mode == "linear":
        out_schema = StructType(
            base.schema.fields
            + [
                StructField("level", DoubleType()),
                StructField("trend", DoubleType()),
                StructField("forecast", DoubleType()),
            ]
        )

        def _scan(pdf):
            pdf = pdf.sort_values(
                ["ts", "value"], kind="mergesort", ignore_index=True
            )
            vals = pdf["value"].to_numpy(dtype="float64")
            lv = np.empty(len(vals), dtype="float64")
            tr = np.empty(len(vals), dtype="float64")
            pl = pt = 0.0
            for i, x in enumerate(vals):
                if i == 0:
                    pl, pt = x, 0.0
                else:
                    nl = a * x + ca * (pl + pt)
                    pt = b * (nl - pl) + cb * pt
                    pl = nl
                lv[i], tr[i] = pl, pt
            return pdf.assign(level=lv, trend=tr, forecast=lv + tr)

        return base.groupBy("key").applyInPandas(_scan, schema=out_schema)

    w = (
        Window.partitionBy("key")
        .orderBy("ts", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    zero = F.lit(0.0).cast("double")
    init = F.struct(
        zero.alias("l"), zero.alias("t"), F.lit(0).alias("i")
    )

    def step(acc, x):
        nl = F.lit(a) * x + F.lit(ca) * (acc["l"] + acc["t"])
        nt = F.lit(b) * (nl - acc["l"]) + F.lit(cb) * acc["t"]
        return F.when(
            acc["i"] == 0,
            F.struct(x.alias("l"), zero.alias("t"), F.lit(1).alias("i")),
        ).otherwise(
            F.struct(nl.alias("l"), nt.alias("t"), F.lit(1).alias("i"))
        )

    state = F.aggregate(F.collect_list("value").over(w), init, step)
    return base.select(
        "key",
        "ts",
        "value",
        state["l"].alias("level"),
        state["t"].alias("trend"),
        (state["l"] + state["t"]).alias("forecast"),
    )


def detect_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    min_gap_seconds: int,
) -> DataFrame:
    """Silent intervals per key → ``(key, gap_start, gap_end,
    gap_seconds)`` for every consecutive-event gap of at least
    ``min_gap_seconds`` — the "sensor went dark" / feed-outage
    detector (the reference's vehicle feed goes quiet per route
    exactly this way; the monitoring question is WHERE and for HOW
    LONG, which the resampled-grid operators presuppose rather than
    answer).

    ``gap_seconds`` is the exact integer microsecond difference
    div 10^6 (floor) — no timestamp subtraction semantics to match
    across engines. One lag-window pass over the log; output is
    bounded by the number of gaps, not rows.

    TIMESTAMP_NTZ columns route through a cast to TIMESTAMP for the
    epoch arithmetic (``unix_micros`` rejects NTZ): the DIFFERENCE is
    unaffected in any fixed-offset session timezone (the engine's
    sessions are UTC); only a DST-observing session zone could skew a
    gap spanning a transition.
    """
    if min_gap_seconds < 1:
        raise ValueError(
            f"min_gap_seconds must be >= 1; got {min_gap_seconds}"
        )
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(
        F.col(ts_col).cast("timestamp")
    ) - F.unix_micros(prev.cast("timestamp"))
    return (
        df.select(
            F.col(key_col).alias("key"),
            prev.alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            F.floor(gap_us / F.lit(1_000_000)).cast("long").alias(
                "gap_seconds"
            ),
        )
        .where(
            F.col("gap_start").isNotNull()
            & (F.col("gap_seconds") >= F.lit(int(min_gap_seconds)))
        )
    )


def holt_winters(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    season_length: int,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.5,
) -> DataFrame:
    """Per-key ADDITIVE Holt-Winters triple-exponential smoothing →
    ``(key, ts, value, level, trend, seasonal, forecast)`` — the
    seasonality-aware member of the EWMA→Holt family (Winters 1960):
    daily/weekly periodicity saturates Holt's trend the way trend
    saturates EWMA's level; the third recurrence tracks a repeating
    profile of period ``season_length``:

        L_i = alpha * (x_i - S_{i-m}) + (1-alpha) * (L_{i-1} + T_{i-1})
        T_i = beta  * (L_i - L_{i-1}) + (1-beta)  * T_{i-1}
        S_i = gamma * (x_i - L_i)     + (1-gamma) * S_{i-m}

    with ``forecast = L_i + T_i + S_{i+1-m}`` (one step ahead, using
    the seasonal slot the next point will consume).

    Initialization is the zero-seasonal convention: ``L_1 = x_1,
    T_1 = 0`` and the first cycle's ``S`` lookbacks are 0 — the
    operator then DEGENERATES to plain Holt until one full season has
    been seen, with no separate warm-up formula to reconcile across
    engines (every published init differs; this one is the identity
    under no seasonality, deterministic, and exactly replayable).

    Execution shape: the seasonal lookback makes the recurrence
    inherently sequential per key with O(m) state, so this runs as ONE
    ordered Arrow scan (there is no fold variant because the state no
    longer fits a scalar accumulator). Rows hash-partition by key and
    sort within partitions by ``(key, ts, value)`` in the JVM, then a
    single ``mapInPandas`` pass walks each partition carrying the
    (level, trend, seasonal-ring) state across Arrow batch and key
    boundaries — per-key-group pandas overhead (one DataFrame + one
    Python call + one pandas sort PER KEY under the previous
    ``applyInPandas`` shape) collapses to per-batch overhead, guide
    §4's boundary rule, while the per-row arithmetic is unchanged.
    The recurrences evaluate as one fixed IEEE expression tree — a
    DuckDB RECURSIVE CTE carrying the (level, trend, last-m seasonal
    list) state replays every double bit-for-bit (q_holt_winters).
    Rows order by ``(ts, value)`` per key; NULL values drop. Pick
    binary-representable smoothing constants when oracle parity
    matters.
    """
    if season_length < 1:
        raise ValueError(f"season_length must be >= 1; got {season_length}")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 <= float(v) <= 1.0:
            raise ValueError(f"{nm} must be in [0, 1]; got {v}")
    a, ca = float(alpha), 1.0 - float(alpha)
    b, cb = float(beta), 1.0 - float(beta)
    g, cg = float(gamma), 1.0 - float(gamma)
    m = int(season_length)

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("value").isNotNull())

    out_schema = StructType(
        base.schema.fields
        + [
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("seasonal", DoubleType()),
            StructField("forecast", DoubleType()),
        ]
    )

    def _scan_iter(batches):
        import collections

        sentinel = object()  # never equals any key value (incl. None)
        cur_key = sentinel
        p_level = p_trend = 0.0
        sez = collections.deque([0.0] * m, maxlen=m)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf["key"].to_list()
            vals = pdf["value"].to_list()
            lv = [0.0] * n
            tr = [0.0] * n
            se = [0.0] * n
            fc = [0.0] * n
            for i in range(n):
                kk = keys[i]
                x = float(vals[i])
                if kk != cur_key or cur_key is sentinel:
                    cur_key = kk
                    sez = collections.deque([0.0] * m, maxlen=m)
                    s_old = sez[0]
                    level, trend = x, 0.0
                else:
                    s_old = sez[0]
                    level = a * (x - s_old) + ca * (p_level + p_trend)
                    trend = b * (level - p_level) + cb * p_trend
                s_new = g * (x - level) + cg * s_old
                sez.append(s_new)  # maxlen=m drops the consumed slot
                lv[i], tr[i], se[i] = level, trend, s_new
                fc[i] = level + trend + sez[0]
                p_level, p_trend = level, trend
            out = pdf.copy()
            out["level"], out["trend"] = lv, tr
            out["seasonal"], out["forecast"] = se, fc
            yield out

    return (
        base.repartition("key")
        .sortWithinPartitions("key", "ts", "value")
        .mapInPandas(_scan_iter, schema=out_schema)
    )
