"""Iterative-family scaling measurement (round-7 verdict task #2).

PERF.md has claimed since round 6 that the graph family's sf0.1 wall
time is dominated by PER-ROUND SCHEDULING (each synchronous round is
a fixed number of Spark jobs — join + partial agg + localCheckpoint —
whose launch overhead does not grow with data), and therefore
amortizes at real scale. This script converts the claim into data:
seeded synthetic directed graphs at 1x / 3x / 10x (200k / 600k / 2M
edges — 10x is ~20x the largest on-disk fixture's derived edge list),
generated with ``spark.range`` arithmetic (no files, no RNG), through
pagerank / LPA / HITS / BFS at fixed iteration counts.

Reading the output: if per-round overhead dominates, wall time grows
MUCH slower than 10x across the sweep (slope << 1 in data size); a
superlinear slope would falsify the claim and flag a plan defect
(e.g. lineage growth across rounds). Results are recorded in PERF.md
("Iterative-family scaling" section).

Usage: ``python bench_scaling.py [scales ...]`` (default 1 3 10).
Emits one JSON line per (operator, scale) to stdout.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from nextbus2pg_spark.session import get_spark
from nextbus2pg_spark.operators.scale import release_cached_rdds

#: 1x graph: 20k nodes, 200k edges (avg out-degree 10) — a few times
#: the sf0.1 fixtures' derived edge lists, small enough to sweep.
BASE_NODES = 20_000
BASE_EDGES = 200_000

ITERS = {"pagerank": 4, "lpa": 4, "hits": 3, "bfs": 4}


def synth_edges(spark, scale: int):
    """Deterministic pseudo-random directed multigraph via pure
    ``spark.range`` arithmetic — Lehmer-style multipliers give a
    near-uniform endpoint spread without any RNG or on-disk fixture."""
    n_nodes = BASE_NODES * scale
    n_edges = BASE_EDGES * scale
    return (
        spark.range(n_edges)
        .select(
            ((F.col("id") * 48271 + 11) % n_nodes).alias("src"),
            ((F.col("id") * 16807 + 12345) % n_nodes).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )


def run_op(spark, name: str, scale: int) -> tuple[float, int]:
    from nextbus2pg_spark.operators.graph import (
        bfs_hops,
        hits,
        label_propagation,
        pagerank,
    )

    edges = synth_edges(spark, scale).localCheckpoint()
    n_edges = edges.count()  # materialize the input OUTSIDE the timing
    t0 = time.perf_counter()
    if name == "pagerank":
        n = pagerank(edges, n_iters=ITERS[name]).count()
    elif name == "lpa":
        n = label_propagation(edges, n_iters=ITERS[name]).count()
    elif name == "hits":
        n = hits(edges, n_iters=ITERS[name]).count()
    else:
        seeds = spark.range(16).select(
            (F.col("id") * 1_237 % (BASE_NODES * scale)).alias("node")
        )
        n = bfs_hops(edges, seeds, max_hops=ITERS[name]).count()
    wall = time.perf_counter() - t0
    release_cached_rdds(spark)
    assert n > 0, (name, scale, n_edges)
    return wall, n_edges


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 3, 10]
    spark = get_spark("nextbus2pg-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm every plan shape once at the smallest scale (JIT).
    for op in ITERS:
        run_op(spark, op, 1)
    for op in ITERS:
        for s in scales:
            wall, n_edges = run_op(spark, op, s)
            print(
                json.dumps(
                    {
                        "op": op,
                        "scale": s,
                        "edges": n_edges,
                        "iters": ITERS[op],
                        "wall_sec": round(wall, 3),
                        "sec_per_round": round(wall / ITERS[op], 3),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
