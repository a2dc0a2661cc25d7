"""Capture .explain("formatted") for named fixture queries into
plans/r14/<query>_<tag>.txt (the round-14 optimization evidence trail).

Usage: python plans/r14/capture_plans.py <tag> <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Note: fixtures that localCheckpoint(eager=True) during plan construction
execute those stages at capture time; the captured plan is the FINAL
frame's plan (what the driver's timed action executes last), which is
the auditable object for join strategy / exchange-count claims.
"""

from __future__ import annotations

import os
import sys

from nextbus2pg_spark.plans import QUERIES
from nextbus2pg_spark.session import get_spark

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("nextbus2pg-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
