"""Graph-ranking fixture queries (PageRank over derived edge lists).

Oracle recipe: PageRank is a fixed-iteration power method, so the
DuckDB oracle unrolls the iterations as CTE generations (the BPE
training-loop recipe) and replays every floating-point sum as a
``list_reduce`` fold over the same sorted contribution list the Spark
side folds (``operators/graph.py`` ``deterministic=True``) — the
whole 8-iteration computation value-hash-matches bit-for-bit, only
rounded once (6 dp) at the very end per the FP-portability rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nextbus2pg_spark.plans.fixtures import load_table
from nextbus2pg_spark.plans.registry import fixture

_PR_ITERS = 8
_PR_DAMPING = 0.85

#: Left fold over the key-sorted (k, v) struct list — replays Spark's
#: F.aggregate(array_sort(collect_list(struct)), 0.0, +) exactly
#: (IEEE: 0.0 + x == x, so DuckDB's init-less reduce matches).
_FOLD = (
    "list_reduce(list_transform("
    "list(struct_pack(k := {k}, v := {v}) ORDER BY {k}), x -> x.v), "
    "(a, b) -> a + b)"
)


def _pagerank_oracle(n_iters: int, damping: float) -> str:
    d = f"CAST({damping} AS DOUBLE)"
    head = f"""
WITH e AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
  FROM (
    SELECT event_type AS src,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
  ) t
  WHERE dst IS NOT NULL
  GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
ow AS (
  SELECT src, {_FOLD.format(k='dst', v='w')} AS wout
  FROM e GROUP BY src
),
r0 AS (
  SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
  FROM nodes CROSS JOIN nn
)"""
    its = []
    for i in range(1, n_iters + 1):
        p = f"r{i - 1}"
        its.append(f""",
inc{i} AS (
  SELECT e.dst AS node,
         {_FOLD.format(k='e.src', v='(r.rank * e.w) / ow.wout')} AS s
  FROM e
  JOIN {p} r ON r.node = e.src
  JOIN ow ON ow.src = e.src
  GROUP BY e.dst
),
dang{i} AS (
  SELECT coalesce({_FOLD.format(k='r.node', v='r.rank')},
                  CAST(0 AS DOUBLE)) AS m
  FROM {p} r
  LEFT JOIN ow ON ow.src = r.node
  WHERE ow.src IS NULL
),
r{i} AS (
  SELECT n.node,
         (1 - {d}) / nn.n
         + {d} * (coalesce(i.s, CAST(0 AS DOUBLE))
                  + (SELECT m FROM dang{i}) / nn.n) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN inc{i} i ON i.node = n.node
)""")
    tail = f"""
SELECT node, round(rank, 6) AS rank FROM r{n_iters}
"""
    return head + "".join(its) + tail


@fixture("q_pagerank", oracle=_pagerank_oracle(_PR_ITERS, _PR_DAMPING))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph: edges
    are (event_type → next event_type) per user in ``ts, event_id``
    order, weighted by transition count — the stationary-importance
    ranking of a user-journey Markov chain (the same operator ranks
    crawl hosts by link mass in a curation pipeline). Deterministic
    mode (sorted-fold sums) so the 8-iteration power method replays
    exactly in the unrolled-CTE oracle; ``tests/test_graph.py`` pins
    scale mode (plain partial-aggregated SUM) to the same values."""
    from nextbus2pg_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .where(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(
        edges,
        weight="w",
        damping=_PR_DAMPING,
        n_iters=_PR_ITERS,
        deterministic=True,
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
