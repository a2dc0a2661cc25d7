"""Fresh-session subprocess probe for the pinned bench ratios.

Run as ``python tests/bench_ratio_probe.py '<json spec>'``; prints ONE
JSON line with calibration and per-query normalized costs.

Why a subprocess: the round-11 closing stamp showed the long-lived
full-suite session inflates shuffle-heavy measurements (accumulated
shuffle files / JVM state — q_triangle_count measured 1.3 idle but
>5.0 twice ~30 min into otherwise-idle suite runs at the SAME commit),
which forced the pinned ceiling from 5.0 to 9.0 plus a keep-lower
retry — loose enough that a genuine 2.5-3x plan regression passed (the
round-12 ADVICE defect). A fresh session per probe removes the
pollution instead of widening the gate, so the ceilings can sit back
at ~3x the idle norms where real multi-shuffle regressions trip them.

Spec: ``{"sf": dir, "queries": {name: ceiling}}`` — the ceiling is
used only for the single documented GC-tail retry (re-measure once,
keep the lower median, never loop).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    spec = json.loads(sys.argv[1])
    sf = spec["sf"]

    from nextbus2pg_spark.operators.scale import release_cached_rdds
    from nextbus2pg_spark.plans import QUERIES
    from nextbus2pg_spark.session import get_spark

    spark = get_spark("bench-ratio-probe")

    def median(thunk, runs: int = 3) -> float:
        release_cached_rdds(spark)
        thunk()  # warm
        xs = []
        for _ in range(runs):
            release_cached_rdds(spark)
            t0 = time.perf_counter()
            thunk()
            xs.append(time.perf_counter() - t0)
        xs.sort()
        return xs[len(xs) // 2]

    cal_sched = median(lambda: spark.range(0, 32_000, 1, 32).count())
    lineitem = os.path.join(sf, "lineitem.parquet")
    cal_scan = median(
        lambda: spark.read.parquet(lineitem)
        .selectExpr(
            "sum(l_extendedprice)", "sum(l_quantity)",
            "sum(l_discount)", "count(*)",
        )
        .collect()
    )
    out = {
        "cal_sched": cal_sched,
        "cal_scan": cal_scan,
        "walls": {},
        "norms": {},
    }
    for name, ceiling in spec["queries"].items():

        def run(name=name):
            df = QUERIES[name](spark, sf)
            df.count()
            df.limit(5).collect()

        med = median(run)
        norm = max(med - cal_sched, 0.0) / cal_scan
        if norm > float(ceiling):
            # one documented GC-tail retry: a genuine plan regression
            # is not a tail — it exceeds the ceiling both times
            med2 = median(run)
            norm2 = max(med2 - cal_sched, 0.0) / cal_scan
            if norm2 < norm:
                med, norm = med2, norm2
        out["walls"][name] = med
        out["norms"][name] = norm
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
