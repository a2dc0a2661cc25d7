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


#: Shared head: the event-transition edge list, node set, out-weights.
_PR_HEAD = f"""
WITH e AS MATERIALIZED (
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
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
ow AS MATERIALIZED (
  SELECT src, {_FOLD.format(k='dst', v='w')} AS wout
  FROM e GROUP BY src
)"""


def _pr_step_ctes(i: int) -> str:
    """One round's incoming-mass and dangling-mass CTEs (shared by the
    uniform and personalized oracles — the rank-update rule is what
    differs)."""
    p = f"r{i - 1}"
    return f""",
inc{i} AS MATERIALIZED (
  SELECT e.dst AS node,
         {_FOLD.format(k='e.src', v='(r.rank * e.w) / ow.wout')} AS s
  FROM e
  JOIN {p} r ON r.node = e.src
  JOIN ow ON ow.src = e.src
  GROUP BY e.dst
),
dang{i} AS MATERIALIZED (
  SELECT coalesce({_FOLD.format(k='r.node', v='r.rank')},
                  CAST(0 AS DOUBLE)) AS m
  FROM {p} r
  LEFT JOIN ow ON ow.src = r.node
  WHERE ow.src IS NULL
)"""


def _pagerank_oracle(n_iters: int, damping: float) -> str:
    d = f"CAST({damping} AS DOUBLE)"
    head = _PR_HEAD + """,
r0 AS MATERIALIZED (
  SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
  FROM nodes CROSS JOIN nn
)"""
    its = []
    for i in range(1, n_iters + 1):
        its.append(_pr_step_ctes(i) + f""",
r{i} AS MATERIALIZED (
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


def _ppr_oracle(n_iters: int, damping: float, seeds: dict[str, float]) -> str:
    """Personalized variant: teleport and dangling mass follow the
    seed distribution ``p`` (a CASE over the node set) instead of 1/N;
    ranks initialize at ``p``."""
    d = f"CAST({damping} AS DOUBLE)"
    whens = " ".join(
        f"WHEN node = '{node}' THEN CAST({p} AS DOUBLE)"
        for node, p in seeds.items()
    )
    head = _PR_HEAD + f""",
pr AS MATERIALIZED (
  SELECT node, CASE {whens} ELSE CAST(0 AS DOUBLE) END AS p FROM nodes
),
r0 AS MATERIALIZED (SELECT node, p AS rank FROM pr)"""
    its = []
    for i in range(1, n_iters + 1):
        its.append(_pr_step_ctes(i) + f""",
r{i} AS MATERIALIZED (
  SELECT pr.node,
         (1 - {d}) * pr.p
         + {d} * (coalesce(i.s, CAST(0 AS DOUBLE))
                  + (SELECT m FROM dang{i}) * pr.p) AS rank
  FROM pr
  LEFT JOIN inc{i} i ON i.node = pr.node
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


_PPR_SEEDS = {"purchase": 0.6, "signup": 0.4}


@fixture(
    "q_pagerank_personalized",
    oracle=_ppr_oracle(_PR_ITERS, _PR_DAMPING, _PPR_SEEDS),
)
def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank on the same event-transition graph:
    random walks teleport to {purchase: 0.6, signup: 0.4} instead of
    uniformly, so rank concentrates on the conversion events'
    neighborhoods — the topic-sensitive / related-items variant (the
    same operator ranks "domains related to a trusted seed list" in a
    crawl-curation pipeline). Deterministic mode; the oracle replays
    the seed CASE distribution through the shared unrolled-CTE
    iteration chain."""
    from nextbus2pg_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .where(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    reset = spark.createDataFrame(
        list(_PPR_SEEDS.items()), "node string, p double"
    )
    ranks = pagerank(
        edges,
        weight="w",
        damping=_PR_DAMPING,
        n_iters=_PR_ITERS,
        deterministic=True,
        reset=reset,
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


_LPA_ITERS = 4


def _lpa_oracle(n_iters: int) -> str:
    """Unrolled synchronous-LPA iterations: all-integer state, so the
    replay is exact with no folds or rounding at all. Every CTE a
    later generation re-reads is MATERIALIZED (DuckDB would otherwise
    inline the chain exponentially)."""
    ctes = ["""e AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
         CAST(l_suppkey AS BIGINT) + 10000000 AS b
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
sym AS MATERIALIZED (
  SELECT a AS node, b AS nb FROM e
  UNION
  SELECT b, a FROM e
),
l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM sym)"""]
    for i in range(1, n_iters + 1):
        ctes.append(f"""c{i} AS (
  SELECT s.node, l.label, count(*) AS cnt
  FROM sym s JOIN l{i - 1} l ON l.node = s.nb
  GROUP BY s.node, l.label
),
l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM c{i}) _r
  WHERE rn = 1
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, label FROM l{n_iters}\n"
    )


@fixture("q_label_propagation", oracle=_lpa_oracle(_LPA_ITERS))
def q_label_propagation(spark: SparkSession, sf_dir: str):
    """Community detection on the customer–supplier co-purchase graph
    (operators/graph.label_propagation, 4 synchronous rounds):
    supplier nodes are offset by 1e7 to share the id space, edges are
    the distinct (customer, supplier) pairs through orders×lineitem.
    Deterministic min-label tie-break makes the whole run a pure
    integer function of the edge list; the oracle unrolls the rounds
    as MATERIALIZED CTEs — exact, no FP anywhere."""
    from nextbus2pg_spark.operators.graph import label_propagation

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + F.lit(10000000)).alias("dst"),
        )
        .distinct()
    )
    return label_propagation(edges, n_iters=_LPA_ITERS)


@fixture(
    "q_transition_matrix",
    oracle="""
WITH pairs AS (
  SELECT src, dst FROM (
    SELECT event_type AS src,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_type) AS dst
    FROM events) _p
  WHERE dst IS NOT NULL
),
counts AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n_transitions
  FROM pairs GROUP BY src, dst
),
ctx AS (SELECT src, sum(n_transitions) AS n_src FROM counts GROUP BY src)
SELECT c.src, c.dst, c.n_transitions,
       CAST(c.n_transitions AS DOUBLE) / CAST(x.n_src AS DOUBLE) AS p
FROM counts c JOIN ctx x USING (src)
""",
)
def q_transition_matrix(spark: SparkSession, sf_dir: str):
    """Empirical Markov transition matrix over per-user event-type
    sequences (operators/graph.transition_matrix): exact integer
    pair/context counts from one lead-window pass, probability as a
    single engine-exact division. The |states|^2-bounded matrix is
    the path-analysis companion of the PageRank edge head (same
    lead-window derivation, deterministic event_type tie-break)."""
    from nextbus2pg_spark.operators.graph import transition_matrix

    ev = load_table(spark, sf_dir, "events")
    return transition_matrix(ev, "user_id", "ts", "event_type")


_TRI_ORACLE = """
WITH li AS (
  SELECT l_orderkey AS ok, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem WHERE l_quantity > 45
),
raw AS (
  SELECT lx.s AS src, ly.s AS dst
  FROM li lx JOIN li ly ON lx.ok = ly.ok AND lx.s < ly.s
),
e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw
),
tri AS MATERIALIZED (
  SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
tpn AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT ta AS node FROM tri
    UNION ALL SELECT tb FROM tri
    UNION ALL SELECT tc FROM tri
  ) u GROUP BY node
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) d GROUP BY node
)
SELECT deg.node, deg.degree,
       CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN deg.degree >= 2
            THEN CAST(2 * coalesce(t.triangles, 0) AS DOUBLE)
                 / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END AS lcc
FROM deg LEFT JOIN tpn t ON t.node = deg.node
"""


@fixture("q_triangle_count", oracle=_TRI_ORACLE)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient
    (operators/graph.triangle_count) over the supplier co-occurrence
    graph: suppliers are adjacent when they both ship a high-quantity
    line (l_quantity > 45) of the same order — the "who clusters with
    whom" cohesion signal (a crawl pipeline runs the same operator on
    host link graphs to spot densely interlinked spam neighborhoods).
    All counts integer-exact; lcc is one engine-exact division, so the
    oracle replays the ordered-wedge enumeration verbatim."""
    from nextbus2pg_spark.operators.graph import triangle_count

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").cast("long").alias("s"),
        )
    )
    edges = (
        li.alias("x")
        .join(li.alias("y"), "ok")
        .where(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("src"), F.col("y.s").alias("dst"))
    )
    return triangle_count(edges)


_BFS_HOPS = 3

_BFS_HEAD = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
         CAST(l_suppkey AS BIGINT) + 10000000 AS b
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
sym AS MATERIALIZED (
  SELECT a AS node, b AS nb FROM e
  UNION
  SELECT b, a FROM e
),
v0 AS MATERIALIZED (
  SELECT DISTINCT CAST(c_custkey AS BIGINT) AS node, CAST(0 AS INTEGER) AS dist
  FROM customer WHERE c_nationkey = 0
),
f0 AS (SELECT node FROM v0)"""


def _bfs_oracle(max_hops: int) -> str:
    its = []
    for i in range(1, max_hops + 1):
        its.append(f""",
f{i} AS MATERIALIZED (
  SELECT DISTINCT s.nb AS node
  FROM sym s JOIN f{i - 1} f ON f.node = s.node
  WHERE s.nb NOT IN (SELECT node FROM v{i - 1})
),
v{i} AS MATERIALIZED (
  SELECT node, dist FROM v{i - 1}
  UNION ALL
  SELECT node, CAST({i} AS INTEGER) FROM f{i}
)""")
    return (
        _BFS_HEAD
        + "".join(its)
        + f"\nSELECT node, dist FROM v{max_hops}\n"
    )


@fixture("q_bfs_hops", oracle=_bfs_oracle(_BFS_HOPS))
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (operators/graph.bfs_hops) over
    the customer–supplier purchase graph (the LPA fixture's edge
    derivation: supplier ids offset by 1e7), seeded from every
    nation-0 customer — "how far is each entity from the trusted
    set", the crawl-frontier-depth / blast-radius primitive. Pure
    integer set iteration; the oracle unrolls the 3 frontier
    generations as MATERIALIZED CTEs and replays it exactly."""
    from nextbus2pg_spark.operators.graph import bfs_hops

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + F.lit(10000000)).alias("dst"),
        )
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").cast("long").alias("node"))
    )
    return bfs_hops(edges, seeds, max_hops=_BFS_HOPS)


_KCORE_K = 14
_KCORE_ITERS = 8

_KCORE_HEAD = """
WITH li AS (
  SELECT l_orderkey AS ok, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem WHERE l_quantity > 45
),
raw AS (
  SELECT lx.s AS src, ly.s AS dst
  FROM li lx JOIN li ly ON lx.ok = ly.ok AND lx.s < ly.s
),
e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw
),
sym AS MATERIALIZED (
  SELECT a AS node, b AS nb FROM e
  UNION
  SELECT b, a FROM e
),
a0 AS MATERIALIZED (SELECT DISTINCT node FROM sym)"""


def _kcore_oracle(k: int, max_iters: int) -> str:
    its = []
    for i in range(1, max_iters + 1):
        its.append(f""",
a{i} AS MATERIALIZED (
  SELECT s.node FROM sym s
  JOIN a{i - 1} x ON x.node = s.node
  JOIN a{i - 1} y ON y.node = s.nb
  GROUP BY s.node
  HAVING count(*) >= {k}
)""")
    return (
        _KCORE_HEAD
        + "".join(its)
        + f"""
SELECT s.node, count(*) AS core_degree
FROM sym s
JOIN a{max_iters} x ON x.node = s.node
JOIN a{max_iters} y ON y.node = s.nb
GROUP BY s.node
"""
    )


@fixture("q_kcore", oracle=_kcore_oracle(_KCORE_K, _KCORE_ITERS))
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core backbone (operators/graph.kcore, k=14) of the
    high-quantity supplier co-occurrence graph (q_triangle_count's
    edge head): iterative remove-degree-below-k peeling — the
    dense-subgraph trim that precedes expensive per-node features in
    a link-graph curation pipeline. At sf0.01 the peel cascades
    through ~6 non-trivial rounds before its fixpoint; all state is
    integer and the oracle unrolls the rounds as MATERIALIZED CTEs
    (early exit equals the full unroll — peeling is monotone)."""
    from nextbus2pg_spark.operators.graph import kcore

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").cast("long").alias("s"),
        )
    )
    edges = (
        li.alias("x")
        .join(li.alias("y"), "ok")
        .where(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("src"), F.col("y.s").alias("dst"))
    )
    return kcore(edges, k=_KCORE_K, max_iters=_KCORE_ITERS)


@fixture(
    "q_top_paths",
    oracle="""
WITH p AS (
  SELECT event_type AS s0,
         lead(event_type, 1) OVER w AS s1,
         lead(event_type, 2) OVER w AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
),
c AS (
  SELECT s0 || '>' || s1 || '>' || s2 AS path,
         CAST(count(*) AS BIGINT) AS n
  FROM p
  WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL
  GROUP BY 1
)
SELECT path, n,
       CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS INTEGER)
         AS rank
FROM c
ORDER BY n DESC, path ASC
LIMIT 10
""",
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step user journeys through event types
    (operators/graph.top_paths): one lead-window pass, exact integer
    path counts (bounded by |states|^3), deterministic path-string
    tie-break, sort-limit top-k. The order-2 sequence-mining
    extension of q_transition_matrix."""
    from nextbus2pg_spark.operators.graph import top_paths

    ev = load_table(spark, sf_dir, "events")
    return top_paths(ev, "user_id", "ts", "event_type", length=3, k=10)


_HITS_ITERS = 6

_HITS_HEAD = """
WITH e AS MATERIALIZED (
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
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u
),
h0 AS MATERIALIZED (SELECT node, CAST(1 AS DOUBLE) AS hub FROM nodes)"""


def _hits_oracle(n_iters: int) -> str:
    its = []
    for i in range(1, n_iters + 1):
        a_gather = _FOLD.format(k="e.src", v="(h.hub * e.w)")
        a_norm = _FOLD.format(k="node", v="(raw * raw)")
        h_gather = _FOLD.format(k="e.dst", v="(a.authority * e.w)")
        h_norm = _FOLD.format(k="node", v="(raw * raw)")
        its.append(f""",
ar{i} AS MATERIALIZED (
  SELECT n.node, coalesce(g.f, CAST(0 AS DOUBLE)) AS raw
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, {a_gather} AS f
    FROM e JOIN h{i - 1} h ON h.node = e.src
    GROUP BY e.dst) g ON g.node = n.node
),
an{i} AS MATERIALIZED (SELECT sqrt({a_norm}) AS nv FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT node,
         CASE WHEN (SELECT nv FROM an{i}) > 0
              THEN raw / (SELECT nv FROM an{i})
              ELSE CAST(0 AS DOUBLE) END AS authority
  FROM ar{i}
),
hr{i} AS MATERIALIZED (
  SELECT n.node, coalesce(g.f, CAST(0 AS DOUBLE)) AS raw
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, {h_gather} AS f
    FROM e JOIN a{i} a ON a.node = e.dst
    GROUP BY e.src) g ON g.node = n.node
),
hn{i} AS MATERIALIZED (SELECT sqrt({h_norm}) AS nv FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT node,
         CASE WHEN (SELECT nv FROM hn{i}) > 0
              THEN raw / (SELECT nv FROM hn{i})
              ELSE CAST(0 AS DOUBLE) END AS hub
  FROM hr{i}
)""")
    return (
        _HITS_HEAD
        + "".join(its)
        + f"""
SELECT h.node, round(h.hub, 6) AS hub,
       round(a.authority, 6) AS authority
FROM h{n_iters} h JOIN a{n_iters} a ON a.node = h.node
"""
    )


@fixture("q_hits", oracle=_hits_oracle(_HITS_ITERS))
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities (operators/graph.hits, 6 rounds,
    deterministic mode) over the weighted event-type transition graph
    (the q_pagerank edge head): event types that LEAD INTO conversion
    events score as hubs, the converged-upon events as authorities —
    the directed-role split PageRank's single score cannot express.
    Every per-node sum and both L2 norms fold over sorted contributor
    lists, so the oracle's unrolled a-step/h-step CTE chain replays
    the whole 6-round computation bit-for-bit, rounded once at the
    end."""
    from nextbus2pg_spark.operators.graph import hits

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .where(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    out = hits(edges, weight="w", n_iters=_HITS_ITERS, deterministic=True)
    return out.select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _modularity_oracle(n_iters: int) -> str:
    """LPA's unrolled CTE chain with the final SELECT swapped for the
    modularity aggregation over the round-``n_iters`` labels — the
    whole (partition + score) computation replays as integers with
    ONE final division."""
    lpa = _lpa_oracle(n_iters)
    tail = f"\nSELECT node, label FROM l{n_iters}\n"
    assert lpa.endswith(tail)
    return lpa[: -len(tail)] + f""",
lab AS MATERIALIZED (SELECT node, label FROM l{n_iters}),
tagged AS MATERIALIZED (
  SELECT lx.label AS la, ly.label AS lb
  FROM e JOIN lab lx ON lx.node = e.a JOIN lab ly ON ly.node = e.b
),
mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e),
intra AS (
  SELECT la AS c, CAST(count(*) AS HUGEINT) AS ec
  FROM tagged WHERE la = lb GROUP BY la
),
deg AS (
  SELECT c, CAST(count(*) AS HUGEINT) AS dc FROM (
    SELECT la AS c FROM tagged UNION ALL SELECT lb FROM tagged) u
  GROUP BY c
),
perc AS (
  SELECT d.c, coalesce(i.ec, CAST(0 AS HUGEINT)) AS ec, d.dc
  FROM deg d LEFT JOIN intra i ON i.c = d.c
)
SELECT CAST(mm.m AS BIGINT) AS m_edges,
       CAST(count(*) AS BIGINT) AS n_communities,
       CAST(sum(4 * mm.m * p.ec - p.dc * p.dc) AS DOUBLE)
         / CAST(4 * mm.m * mm.m AS DOUBLE) AS modularity
FROM perc p CROSS JOIN mm GROUP BY mm.m
"""


@fixture("q_modularity", oracle=_modularity_oracle(_LPA_ITERS))
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the 4-round LPA partition on the
    customer-supplier graph (operators/graph.modularity over
    label_propagation) — the score that says whether the detected
    communities explain the graph. Every input is an exact integer
    (intra-edge counts, degrees, m) and Q is one final division, so
    the oracle replays the LPA chain AND the score exactly."""
    from nextbus2pg_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + F.lit(10000000)).alias("dst"),
        )
        .distinct()
    )
    labels = label_propagation(edges, n_iters=_LPA_ITERS)
    return modularity(edges, labels)


@fixture(
    "q_assortativity",
    oracle="""
WITH li AS (
  SELECT l_orderkey AS ok, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem WHERE l_quantity > 45
),
raw AS (
  SELECT lx.s AS src, ly.s AS dst
  FROM li lx JOIN li ly ON lx.ok = ly.ok AND lx.s < ly.s
),
e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw
),
deg AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e) u
  GROUP BY node
),
oriented AS (
  SELECT da.d AS dx, db.d AS dy
  FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
),
pairs AS (
  SELECT dx, dy FROM oriented
  UNION ALL
  SELECT dy, dx FROM oriented
),
agg AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(dx AS HUGEINT)) AS sx, sum(CAST(dy AS HUGEINT)) AS sy,
         sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS sxx,
         sum(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS syy,
         sum(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS sxy
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS assortativity
FROM agg
""",
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the high-quantity supplier
    co-occurrence graph (operators/graph.degree_assortativity — the
    q_triangle_count edge head): Newman's r as a Pearson correlation
    of endpoint degrees over both edge orientations, on exact
    DECIMAL(38,0)/HUGEINT moment sums with one fixed double expression
    at the end."""
    from nextbus2pg_spark.operators.graph import degree_assortativity

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").cast("long").alias("s"),
        )
    )
    edges = (
        li.alias("x")
        .join(li.alias("y"), "ok")
        .where(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("src"), F.col("y.s").alias("dst"))
    )
    return degree_assortativity(edges)


@fixture(
    "q_link_prediction",
    oracle="""
WITH li AS (
  SELECT l_orderkey AS ok, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem WHERE l_quantity > 45
),
raw AS (
  SELECT lx.s AS src, ly.s AS dst
  FROM li lx JOIN li ly ON lx.ok = ly.ok AND lx.s < ly.s
),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM raw
    UNION ALL SELECT dst, src FROM raw
  ) u
),
deg AS MATERIALIZED (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY a
),
wedges AS (
  SELECT l.b AS node_a, r.b AS node_b, l.a AS z, d.deg AS deg_z
  FROM und l
  JOIN und r ON l.a = r.a AND l.b < r.b
  JOIN deg d ON d.node = l.a
),
scored AS (
  SELECT node_a, node_b, CAST(count(*) AS BIGINT) AS common_neighbors,
         list_reduce(list_transform(
           list(struct_pack(k := z, v := 1.0 / CAST(deg_z AS DOUBLE))
                ORDER BY z),
           el -> el.v), (p, q) -> p + q) AS resource_allocation
  FROM wedges GROUP BY node_a, node_b
),
ex AS (SELECT a AS na, b AS nb FROM und WHERE a < b)
SELECT sc.node_a, sc.node_b, sc.common_neighbors,
       sc.resource_allocation,
       CAST(sc.common_neighbors AS DOUBLE)
       / CAST(da.deg + db.deg - sc.common_neighbors AS DOUBLE) AS jaccard
FROM scored sc
LEFT JOIN ex ON ex.na = sc.node_a AND ex.nb = sc.node_b
JOIN deg da ON da.node = sc.node_a
JOIN deg db ON db.node = sc.node_b
WHERE ex.na IS NULL
""",
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-link scores over the supplier co-occurrence graph
    (operators/graph.link_prediction — q_triangle_count's graph):
    common neighbors (exact integer), resource allocation (z-sorted
    fold of exact divisions, the transcendental-free strongest local
    index), and Jaccard (one division) for every non-edge pair sharing
    a neighbor. The oracle replays the wedge enumeration and the fold
    verbatim."""
    from nextbus2pg_spark.operators.graph import link_prediction

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").cast("long").alias("s"),
        )
    )
    edges = (
        li.alias("x")
        .join(li.alias("y"), "ok")
        .where(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("src"), F.col("y.s").alias("dst"))
    )
    return link_prediction(edges)
