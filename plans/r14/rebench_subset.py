"""Re-stamp a named subset of headline queries with bench.py's exact
methodology (fresh session, sf0.001 warmup, median of N, checkpoint
release between runs) — used when a baseline session had a measured
pollution window (see OPTIMIZATION_r14.md §1)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from nextbus2pg_spark.operators.scale import release_cached_rdds  # noqa: E402
from nextbus2pg_spark.plans import QUERIES  # noqa: E402
from nextbus2pg_spark.session import get_spark  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("nextbus2pg-rebench")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).count()
        except Exception:
            pass
    release_cached_rdds(spark)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            release_cached_rdds(spark)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        print(f"# {name}: {timings[name]}s {samples}", file=sys.stderr)
    cal_sched = bench.probe_median(lambda: bench.sched_probe(spark))
    cal_scan = bench.probe_median(lambda: bench.scan_probe(spark, sf_dir))
    print(json.dumps({
        "queries": timings,
        "sched_calibration_sec": round(cal_sched, 3),
        "scan_calibration_sec": round(cal_scan, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
