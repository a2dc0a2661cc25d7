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

The calibration recipe (sched/scan probes, median rule, normalization
formula) is IMPORTED from bench.py — the single source of truth — so
this gate always measures the same quantity the headline bench stamps
(round-12 review: a third hand-rolled copy would drift).

Spec: ``{"sf": dir, "queries": {name: ceiling}}`` — the ceiling is
used only for the single documented GC-tail retry (re-measure once,
keep the lower median, never loop).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    spec = json.loads(sys.argv[1])
    sf = spec["sf"]

    from bench import normalized_cost, probe_median, scan_probe, sched_probe
    from nextbus2pg_spark.operators.scale import release_cached_rdds
    from nextbus2pg_spark.plans import QUERIES
    from nextbus2pg_spark.session import get_spark

    spark = get_spark("bench-ratio-probe")

    def timed_median(thunk, runs: int = 3) -> float:
        """Same median-of-N-after-warmup rule as bench.probe_median,
        but with the checkpoint-block release OUTSIDE the clock
        between runs (query measurements leak localCheckpoint blocks;
        the calibration probes don't, so they use probe_median
        directly)."""
        release_cached_rdds(spark)
        thunk()  # warmup
        xs = []
        for _ in range(runs):
            release_cached_rdds(spark)
            t0 = time.perf_counter()
            thunk()
            xs.append(time.perf_counter() - t0)
        xs.sort()
        return xs[len(xs) // 2]

    cal_sched = probe_median(lambda: sched_probe(spark), 3)
    cal_scan = probe_median(lambda: scan_probe(spark, sf), 3)
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

        med = timed_median(run)
        norm = normalized_cost(med, cal_sched, cal_scan)
        if norm > float(ceiling):
            # one documented GC-tail retry: a genuine plan regression
            # is not a tail — it exceeds the ceiling both times
            med2 = timed_median(run)
            norm2 = normalized_cost(med2, cal_sched, cal_scan)
            if norm2 < norm:
                med, norm = med2, norm2
        out["walls"][name] = med
        out["norms"][name] = norm
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
