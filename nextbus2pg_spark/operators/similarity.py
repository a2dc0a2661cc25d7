"""Embedding similarity search (SURVEY.md §2.12 north-star).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the full corpus — the corpus side never shuffles, the
dot product is a JVM-side array fold (``zip_with`` + ``aggregate``), and
the top-k is a per-query window.

Two scale paths turn search into an equi-join (the 100 TB shapes):
- LSH bucketing (random-hyperplane signs): a short binary signature
  from deterministic pseudo-random planes; recall tunable via number
  of tables / prefix length (``lsh_topk``).
- IVF (inverted file): nearest-centroid bucket ids with query-side
  multi-probe; recall tunable via nprobe (``ivf_topk``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential in-order double fold — deterministic, engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _fold_mean(key: Column, val: Column) -> Column:
    """Partition-order-free MEAN aggregate: left fold of the key-sorted
    value list, divided by the group count — bit-replayable by DuckDB
    ``list_reduce`` (0.0 + x == x, so the init-less reduce matches).
    The sorted fold materializes the group's value list, fine for
    centroid-member groups (bounded by cluster size at training
    sample scale) — production training keeps the default ``F.avg``
    (map-side partial, no list) and tests pin both modes agree."""
    return F.aggregate(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(key.alias("k"), val.alias("v")))
            ),
            lambda s: s["v"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.count(F.lit(1))


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    """Attach the L2 norm (computed once per vector, reused per pair)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_col, F.sqrt(_dot(v, v)))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity with a zero-norm floor.

    The denominator is floored at 1e-12: an all-zero embedding (padding
    rows are common in real corpora) otherwise yields 0.0/0.0 = NaN,
    and Spark sorts NaN ABOVE every double — one zero vector would rank
    first in every descending top-k. With the floor a zero vector
    scores 0.0 against everything and never enters a top-k. Mirrors
    the ``_unit`` guard used by the PQ paths.
    """
    d = _dot(
        F.transform(a, lambda x: x.cast("double")),
        F.transform(b, lambda x: x.cast("double")),
    )
    return d / F.greatest(norm_a * norm_b, F.lit(1e-12))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_digits: int | None = 6,
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Exact cosine top-k per query (broadcast brute force).

    Output: (query_id, match_id, sim) with deterministic ordering:
    rounded sim DESC, match_id ASC. Self-matches excluded.

    ``max_queries`` enforces the "query sets are small by definition"
    contract the broadcast relies on: a corpus-sized query frame fails
    loudly instead of silently exploding the cross join to corpus ×
    corpus. The guard is LAZY — a map-side partial count of the query
    frame cross-joined back as one broadcast row, with the raise
    fused into the plan-consumed ``query_id`` column (the Catalyst
    column-pruning lesson) — so constructing this operator runs no
    Spark job; the count branch re-reads the query lineage but fully
    column-pruned, inside the same job. Round 8 shipped this as an eager
    ``limit(n+1).count()`` at construction time, which re-executed the
    query lineage and added a whole job per call (measured: the
    q_retrieval_eval bench outlier). ``max_queries=None`` skips the
    guard entirely. For genuinely large query sets use
    ``lsh_topk``/``ivf_topk`` (all-distributed), or raise
    ``max_queries`` explicitly.
    """
    if max_queries is not None:
        qcnt = queries.groupBy().agg(
            F.count(F.lit(1)).alias("__n_queries")
        )
        guarded_id = F.when(
            F.col("__n_queries") <= F.lit(max_queries), F.col(id_col)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("query set exceeds max_queries="),
                    F.lit(str(max_queries)),
                    F.lit(" (n="),
                    F.col("__n_queries").cast("string"),
                    F.lit(
                        "); the broadcast brute-force path cross-joins "
                        "the corpus against the query set - use "
                        "lsh_topk/ivf_topk for corpus-scale query sets "
                        "or raise max_queries explicitly"
                    ),
                )
            )
        )
        queries = (
            queries.crossJoin(F.broadcast(qcnt))
            .withColumn(id_col, guarded_id)
            .drop("__n_queries")
        )
    c = with_norm(corpus, vec_col, "t_norm").select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("t_vec"),
        "t_norm",
    )
    q = with_norm(queries, vec_col, "q_norm").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "q_norm",
    )
    sim = cosine(F.col("q_vec"), F.col("t_vec"), F.col("q_norm"), F.col("t_norm"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


def _plane_component(table: int, bit: Column, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5).

    Derived from an md5 digest so it is reproducible across runs and
    engines without a seed exchange: take 6 hex digits → 24-bit int →
    scale. (conv() stays exact: 24 bits << 2^53.)
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(table), bit, dim)), 1, 6
        ),
        16,
        10,
    ).cast("long")
    return h / F.lit(float(1 << 24)) - F.lit(0.5)


def lsh_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_bits: int = 8,
    table: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH signature per vector → (id, sig string).

    sign(v · plane_b) per bit b, packed into a bit string. Vectors close
    in cosine angle collide with high probability; the signature is an
    equi-joinable bucket key.
    """
    # NOTE: the per-bit plane must come from a factory function, not a
    # default-arg lambda (``lambda d, b=b``): pyspark passes (element,
    # index) to TWO-parameter lambdas, so the default would be silently
    # overwritten with the array index — every bit then hashes against
    # the same effective plane and the signature degenerates to one bit
    # repeated n times (two giant buckets: candidate sets half the
    # corpus, the 100 TB blow-up this operator exists to avoid).
    def _plane(b: int):
        return F.transform(
            F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
            lambda d: _plane_component(table, F.lit(b), d),
        )

    bits = []
    for b in range(n_bits):
        plane = _plane(b)
        dot = F.aggregate(
            F.zip_with(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                plane,
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(
        F.col(id_col).alias("id"), F.concat(*bits).alias("bucket")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_bits: int = 8,
    n_tables: int = 1,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine, restricted to same-bucket pairs.

    One equi-join per LSH table replaces the cross join — this is the
    100 TB shape. Recall compounds across independent tables
    (``1 - (1-p)^n_tables``): each table uses a different deterministic
    hyperplane seed, candidate pairs union + dedup before the (exact)
    verify, so cost grows linearly in tables while misses decay
    geometrically. ``multiprobe=1`` additionally probes, per table,
    every bucket at Hamming distance 1 from the query's signature
    (flip each bit) — near neighbors that land one plane-sign away are
    recovered at the cost of ``n_bits`` extra QUERY-side rows per
    table, never extra corpus rows: the standard multi-probe trade
    that buys table-count-like recall without re-hashing the corpus.
    Measured on the sf0.01 embeddings fixture at ``n_bits=4``,
    multiprobe=1: recall@5 0.50 (1 table) → 0.62 (2) → 0.84 (4)
    (tests/test_ann_recall.py pins the floor).
    """
    cands = None
    for t in range(n_tables):
        c_sig = lsh_signatures(
            corpus, id_col, vec_col, n_bits, table=t
        ).withColumnRenamed("id", "match_id")
        q_sig = lsh_signatures(
            queries, id_col, vec_col, n_bits, table=t
        ).withColumnRenamed("id", "query_id")
        if multiprobe >= 1:
            flips = [
                F.concat(
                    F.substring("bucket", 1, i),
                    F.when(
                        F.substring("bucket", i + 1, 1) == "1", F.lit("0")
                    ).otherwise(F.lit("1")),
                    F.substring("bucket", i + 2, n_bits - i - 1),
                )
                for i in range(n_bits)
            ]
            q_sig = q_sig.select(
                "query_id",
                F.explode(
                    F.array(F.col("bucket"), *flips)
                ).alias("bucket"),
            )
        p = c_sig.join(q_sig, "bucket").select("query_id", "match_id")
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.where(F.col("query_id") != F.col("match_id")).distinct()
    c = with_norm(corpus, vec_col, "t_norm").select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("t_vec"), "t_norm"
    )
    q = with_norm(queries, vec_col, "q_norm").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "q_norm"
    )
    sim = F.round(
        cosine(F.col("q_vec"), F.col("t_vec"), F.col("q_norm"), F.col("t_norm")), 6
    )
    pairs = (
        cands.join(c, "match_id")
        .join(q, "query_id")
        .select("query_id", "match_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-bucketed scale path
# ---------------------------------------------------------------------------

def ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int = 16
) -> DataFrame:
    """Deterministic centroid set: the first ``n_centroids`` corpus
    vectors by id. A KMeans fit would tighten the partition quality; the
    IVF *join shape* — the thing that matters at scale — is identical,
    and seeded selection keeps the operator fully deterministic and
    dependency-free.
    """
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("c_vec"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_iters: int = 3,
    deterministic: bool = False,
) -> DataFrame:
    """Deterministic Lloyd-refined centroids → (centroid_id, c_vec).

    Seeds from ``ivf_centroids`` (first-N by id — deterministic), then
    runs ``n_iters`` distributed Lloyd steps: assign every vector to its
    nearest centroid (broadcast centroids, corpus never shuffles for
    assignment), recompute each centroid as the element-wise mean of its
    members (posexplode → per-(centroid, dim) avg → re-pack). Each step
    is two shuffles over (centroid, dim) pairs — tiny relative to the
    corpus — and the centroid frame is checkpointed per iteration so the
    lineage stays flat. A centroid that loses all members keeps its
    previous vector (left-join + coalesce), so the centroid count is
    stable. Measured on the sf0.01 embeddings fixture: bucket sizes
    tighten to 23–38 (vs first-N seeding) and recall@5 at nprobe=8
    rises 0.70 → 0.84.

    ``deterministic=True`` computes each per-(centroid, dim) mean as a
    left fold over the member-id-sorted value list instead of ``F.avg``
    — partition-order-free, so the whole training replays bit-for-bit
    in a DuckDB oracle (the q_ivf_topk unrolled-CTE recipe). Scale
    note: the fold collects each centroid's member column; production
    keeps the default partial-aggregated ``F.avg``.
    """
    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids).select(
        "centroid_id",
        F.transform("c_vec", lambda x: x.cast("double")).alias("c_vec"),
    )
    # Assignment is map-only since round 13 (_nearest_centroids), so
    # the member vectors ride along in the same row — the old
    # assigned-⋈-corpus join-back (one full shuffle of the training
    # set per Lloyd iteration) is gone.
    vsrc = with_norm(
        corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("__vec")
        ),
        "__vec",
        "__n",
    )
    for _ in range(n_iters):
        members = _nearest_centroids(
            vsrc, cents, nprobe=1, vec_col="__vec", norm_col="__n"
        )
        mean_agg = (
            _fold_mean(F.col("id"), F.col("val").cast("double"))
            if deterministic
            else F.avg(F.col("val").cast("double"))
        )
        means = (
            members.select(
                "centroid_id", "id", F.posexplode("__vec").alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(mean_agg.alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s")
            )
            .select(
                "centroid_id",
                F.transform("s", lambda x: x["m"]).alias("new_vec"),
            )
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("new_vec", "c_vec").alias("c_vec"),
            )
            .localCheckpoint(eager=True)
        )
    return cents


def _nearest_centroids(
    v: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    vec_col: str = "__v",
    norm_col: str = "__vn",
) -> DataFrame:
    """MAP-ONLY nearest-centroid ranking: collapse the k-row centroid
    table into ONE collected array row, broadcast that single row, and
    rank the candidates per vector with an in-row sort — appends an
    exploded ``centroid_id`` while every input column passes through.

    Until round 13 assignment crossJoined the corpus against the k
    broadcast centroid ROWS (×k row multiplication) and then paid a
    ``row_number`` window — a full shuffle plus sort of n·k rows — just
    to take the per-id top-nprobe (guide §2.4: the window exchange was
    the ONLY shuffle assignment paid, and it grows with n·k). The
    in-row comparator reproduces the window's ``(sim DESC NULLS LAST,
    centroid_id ASC)`` order bit-exactly: Spark's comparison operators
    already give doubles the NaN-greatest / NaN==NaN total order the
    window sort used, and NULL sims are ordered last explicitly.
    Verified row-identical against the window formulation across
    sf/k/nprobe combinations before the switch.
    """
    c = with_norm(
        centroids.withColumnRenamed("c_vec", "__cv"), "__cv", "__cn"
    )
    carr = c.agg(
        F.collect_list(
            F.struct(
                F.col("centroid_id").alias("cid"),
                F.col("__cv").alias("cv"),
                F.col("__cn").alias("cn"),
            )
        ).alias("__cents")
    )
    sims = F.transform(
        F.col("__cents"),
        lambda x: F.struct(
            cosine(
                F.col(vec_col), x["cv"], F.col(norm_col), x["cn"]
            ).alias("sim"),
            x["cid"].alias("cid"),
        ),
    )
    ranked = F.array_sort(
        sims,
        lambda a, b: F.when(
            a["sim"].isNull() & b["sim"].isNull(),
            F.when(a["cid"] < b["cid"], F.lit(-1))
            .when(a["cid"] > b["cid"], F.lit(1))
            .otherwise(F.lit(0)),
        )
        .when(a["sim"].isNull(), F.lit(1))
        .when(b["sim"].isNull(), F.lit(-1))
        .when(a["sim"] > b["sim"], F.lit(-1))
        .when(a["sim"] < b["sim"], F.lit(1))
        .when(a["cid"] < b["cid"], F.lit(-1))
        .when(a["cid"] > b["cid"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    out_cols = list(v.columns)
    return (
        v.crossJoin(F.broadcast(carr))
        .select(*out_cols, F.explode(F.slice(ranked, 1, nprobe)).alias("__t"))
        .select(*out_cols, F.col("__t.cid").alias("centroid_id"))
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids → (id,
    centroid_id) rows. Centroids broadcast (as ONE collected array
    row); the corpus never shuffles for assignment — since round 13
    the per-id ranking is an in-row sort, not a window, so assignment
    is a pure map stage (see :func:`_nearest_centroids`). nprobe=1 for
    indexing, >1 for query-side probing.
    """
    v = with_norm(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v")),
        "__v",
        "__vn",
    )
    return _nearest_centroids(v, centroids, nprobe).select(
        "id", "centroid_id"
    )


def two_level_router(
    centroids: DataFrame,
    n_coarse: "int | None" = None,
    coarse_iters: int = 2,
    deterministic: bool = False,
) -> "tuple[DataFrame, DataFrame]":
    """Build the coarse level for :func:`ivf_assign_two_level` ONCE at
    index time → ``(coarse, routing)``: the ``n_coarse`` (default ≈
    √k) Lloyd-refined group centroids over the k-row centroid table,
    and each centroid's single group membership. Both frames are
    k-bounded and eagerly checkpointed — reusing them across assign
    calls costs nothing."""
    cents = centroids.localCheckpoint(eager=True)
    if n_coarse is None:
        import math

        n_coarse = max(2, math.isqrt(cents.count()))
    coarse = kmeans_centroids(
        cents, "centroid_id", "c_vec", n_coarse, n_iters=coarse_iters,
        deterministic=deterministic,
    ).select(
        F.col("centroid_id").alias("coarse_id"),
        F.col("c_vec").alias("g_vec"),
    ).localCheckpoint(eager=True)
    # centroid -> its ONE coarse group (k rows, trivially broadcast)
    routing = (
        ivf_assign(
            cents.select(
                F.col("centroid_id").alias("cid"),
                F.col("c_vec").alias("vec"),
            ),
            "cid",
            "vec",
            coarse.select(
                F.col("coarse_id").alias("centroid_id"),
                F.col("g_vec").alias("c_vec"),
            ),
            nprobe=1,
        )
        .select(F.col("id").alias("centroid_id"),
                F.col("centroid_id").alias("coarse_id"))
        .localCheckpoint(eager=True)
    )
    return coarse, routing


def ivf_assign_two_level(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    nprobe: int = 1,
    n_coarse: "int | None" = None,
    coarse_probe: int = 2,
    coarse_iters: int = 2,
    deterministic: bool = False,
    router: "tuple[DataFrame, DataFrame] | None" = None,
) -> DataFrame:
    """IMI-style two-level assignment → (id, centroid_id): cluster the
    k centroids themselves into ``n_coarse`` groups (default ≈ √k —
    a TINY k-row k-means), route each vector to its ``coarse_probe``
    nearest groups, then rank only the centroids inside the probed
    groups. Pass a prebuilt ``router`` (from
    :func:`two_level_router`, checkpointed once at INDEX time) when
    assigning repeatedly — rebuilding the coarse level per call costs
    a few fixed Spark jobs that dwarf the saving at small n.

    This is the scale fix for brute-force :func:`ivf_assign`'s O(n·k)
    cost, which under the k ≈ √n index sizing rule makes assignment
    O(n^1.5) (measured: 1.2s→10.1s for 3.3× data in PERF.md
    round-10). Two-level cost is O(n·(√k + coarse_probe·√k)) =
    O(n·√k); approximate — a vector whose true nearest centroid sits
    in an unprobed coarse group gets its best PROBED centroid —
    with ``coarse_probe`` the recall lever, and it degenerates to the
    exact result (tie-breaks included) when ``coarse_probe >=
    n_coarse`` (pinned by test). Same output contract as
    :func:`ivf_assign`."""
    if nprobe < 1 or coarse_probe < 1:
        raise ValueError(
            f"nprobe/coarse_probe must be >= 1; got {nprobe}/{coarse_probe}"
        )
    cents = centroids.localCheckpoint(eager=True)
    if router is None:
        router = two_level_router(
            cents, n_coarse=n_coarse, coarse_iters=coarse_iters,
            deterministic=deterministic,
        )
    coarse, routing = router
    # vector -> coarse_probe nearest groups (n x n_coarse, not n x k)
    v_groups = ivf_assign(
        df, id_col, vec_col,
        coarse.select(
            F.col("coarse_id").alias("centroid_id"),
            F.col("g_vec").alias("c_vec"),
        ),
        nprobe=coarse_probe,
    ).select("id", F.col("centroid_id").alias("coarse_id"))
    # rank only the centroids inside the probed groups
    cand = with_norm(
        cents.join(F.broadcast(routing), "centroid_id")
        .withColumnRenamed("c_vec", "__cv"),
        "__cv", "__cn",
    )
    v = with_norm(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v")),
        "__v", "__vn",
    ).join(v_groups, "id")
    sim = cosine(F.col("__v"), F.col("__cv"), F.col("__vn"), F.col("__cn"))
    scored = v.join(F.broadcast(cand), "coarse_id").select(
        "id", "centroid_id", sim.alias("__sim")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= nprobe)
        .select("id", "centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 0,
    deterministic_train: bool = False,
) -> DataFrame:
    """IVF approximate top-k: exact cosine restricted to vectors whose
    centroid is among the query's ``nprobe`` nearest centroids.

    Scale shape: one equi-join on centroid_id replaces the cross join —
    each query touches ~nprobe/n_centroids of the corpus. Recall is
    tunable via nprobe (nprobe == n_centroids degenerates to exact) and
    via ``kmeans_iters`` Lloyd refinements of the centroid set
    (``kmeans_centroids``; 0 keeps the raw first-N seed). At cluster
    scale the centroid build runs once at index time and is reused
    across queries.
    """
    if kmeans_iters > 0:
        cents = kmeans_centroids(
            corpus, id_col, vec_col, n_centroids, n_iters=kmeans_iters,
            deterministic=deterministic_train,
        )
    else:
        cents = ivf_centroids(corpus, id_col, vec_col, n_centroids)
    # Map-only assignment (round 13, _nearest_centroids) keeps the
    # vectors in-row, so the old assigned-⋈-corpus join-backs — one a
    # CORPUS-wide shuffle join — are gone from both sides.
    c = _nearest_centroids(
        with_norm(corpus, vec_col, "t_norm").select(
            F.col(id_col).alias("match_id"),
            F.col(vec_col).alias("t_vec"),
            "t_norm",
        ),
        cents, nprobe=1, vec_col="t_vec", norm_col="t_norm",
    )
    q = _nearest_centroids(
        with_norm(queries, vec_col, "q_norm").select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            "q_norm",
        ),
        cents, nprobe=nprobe, vec_col="q_vec", norm_col="q_norm",
    )

    sim = F.round(
        cosine(F.col("q_vec"), F.col("t_vec"), F.col("q_norm"), F.col("t_norm")), 6
    )
    pairs = (
        c.join(q, "centroid_id")
        .where(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", sim.alias("sim"))
        .distinct()  # a pair can meet via several probed centroids
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


def recall_at_k(exact: DataFrame, approx: DataFrame) -> float:
    """Fraction of the exact top-k pairs the approximate index found.

    Both inputs carry (query_id, match_id) — the output contract of
    ``cosine_topk``/``lsh_topk``/``ivf_topk``. This is the tuning
    metric for ``n_bits``/``n_tables``/``nprobe``: a user turning those
    knobs measures the recall cost of the speedup directly
    (tests/test_ann_recall.py pins floors for the shipped defaults).
    """
    truth = exact.select("query_id", "match_id")
    n = truth.count()
    if n == 0:
        return 1.0
    hit = truth.join(
        approx.select("query_id", "match_id"),
        ["query_id", "match_id"],
        "left_semi",
    ).count()
    return hit / n


# ---------------------------------------------------------------------------
# Vectorized (Arrow/numpy) brute-force path
# ---------------------------------------------------------------------------

def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_digits: int = 6,
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact cosine top-k via an Arrow-batched numpy matmul.

    Same contract as ``cosine_topk`` (this is the "UDFs are the slow
    path — but when you must, vectorize" case: one BLAS matmul per
    Arrow batch replaces millions of interpreted expression evals).

    Scale design: the query matrix is collected once (query sets are
    small by definition) and shipped inside the closure; each corpus
    partition emits only its LOCAL top-k per query (partial top-k), so
    the final shuffle carries ≤ partitions × queries × k rows — not the
    full pair matrix. A final window takes the global top-k.

    ``max_queries`` enforces the "small by definition" contract: the
    collect is bounded by LIMIT (never the full frame), and passing a
    corpus-sized query set raises instead of silently OOMing the
    driver. For genuinely large query sets use ``lsh_topk``/``ivf_topk``
    (all-distributed) instead.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"query set exceeds max_queries={max_queries}; the broadcast "
            "brute-force path collects queries to the driver — use "
            "lsh_topk/ivf_topk for corpus-scale query sets or raise "
            "max_queries explicitly"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    # Zero-norm floor: a padding (all-zero) query must score 0 against
    # everything, not NaN (NaN sorts above every double in Spark).
    q_mat = q_mat / np.maximum(
        np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12
    )

    out_schema = "query_id long, match_id long, sim double"

    def topk_partition(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(
                np.float64
            )
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat @ q_mat.T  # (batch, queries)
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = ids != qid  # exclude self-match
                cand_ids = ids[mask]
                cand_sims = col[mask]
                if cand_ids.size == 0:
                    continue
                take = min(k, cand_ids.size)
                part = np.argpartition(-cand_sims, take - 1)[:take]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "match_id": cand_ids[part],
                        "sim": np.round(cand_sims[part], round_digits),
                    }
                )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        topk_partition, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression leg)
# ---------------------------------------------------------------------------

def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two equal-length arrays (JVM fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _unit(df: DataFrame, vec_col: str) -> DataFrame:
    """Replace ``vec_col`` with its unit-normalized double form (so a
    subvector dot-product sum reconstructs COSINE similarity).

    The norm is floored at a tiny epsilon: an all-zero embedding keeps
    its zero components instead of becoming NaN subvectors that would
    poison ``pq_train`` centroid means and make ADC top-k ordering
    unpredictable (mirrors the explicit scale==0 guard in
    :func:`quantize_embeddings`).
    """
    withn = with_norm(
        df.withColumn(
            vec_col, F.transform(vec_col, lambda x: x.cast("double"))
        ),
        vec_col,
        "__n",
    )
    safe_n = F.greatest(F.col("__n"), F.lit(1e-12))
    return withn.withColumn(
        vec_col,
        F.transform(vec_col, lambda x: x / safe_n),
    ).drop("__n")


def _sub_slices(vec_col: str, m: int, subdim: int):
    """Array of (sub, slice) structs — one per subspace."""
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * subdim + 1, subdim).alias("sv"),
            )
            for s in range(m)
        ]
    )


def _code_book_row(codebook: DataFrame) -> DataFrame:
    """Collapse the (sub, code_id, c_vec) codebook into ONE collected
    array row (``__book``) for a single-row broadcast — the
    :func:`_nearest_centroids` recipe applied per subspace. The
    collected order is irrelevant: every consumer reduces the array
    with an order-free total-order argmin (:func:`_nearest_code`)."""
    return codebook.agg(
        F.collect_list(
            F.struct(
                F.col("sub").alias("bsub"),
                F.col("code_id").alias("bcid"),
                F.col("c_vec").alias("bvec"),
            )
        ).alias("__book")
    )


def _nearest_code(sub: Column, sv: Column) -> Column:
    """In-row argmin code id for one subvector against the broadcast
    ``__book`` array — reproduces the round-8 formulation
    ``min_by(code_id, struct(__d, code_id))`` over the broadcast-join
    candidates bit-exactly: the same ``_l2sq`` distance fold, the same
    (distance, code_id) lexicographic total order (Spark compares
    struct fields with the NaN-greatest / NaN == NaN total order sorts
    use), and ties are impossible because code_id is unique within a
    subspace — so the left fold's result is iteration-order-free and
    equals the aggregate minimum. Verified row-identical against the
    old join+min_by formulation by
    tests/test_operators.py::test_pq_encode_matches_join_formulation.
    A subspace missing from the codebook yields a NULL code where the
    old inner join silently dropped the (id, sub) pair — unreachable
    for pq_train-produced books, which cover every subspace."""
    cands = F.filter(F.col("__book"), lambda b: b["bsub"] == sub)
    scored = F.transform(
        cands,
        lambda b: F.struct(
            _l2sq(sv, b["bvec"]).alias("d"), b["bcid"].alias("cid")
        ),
    )
    best = F.aggregate(
        F.slice(scored, 2, F.greatest(F.size(scored) - 1, F.lit(0))),
        F.element_at(scored, 1),
        lambda acc, s: F.when(s < acc, s).otherwise(acc),
    )
    return best["cid"]


def pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 2,
    train_fraction: float = 1.0,
    deterministic: bool = False,
) -> DataFrame:
    """Train a product-quantization codebook → (sub, code_id, c_vec).

    Vectors are unit-normalized, split into ``m`` contiguous
    subvectors, and each subspace gets its own ``n_codes``-centroid
    L2 k-means (deterministic first-N seeding + Lloyd refinement, in
    the metric PQ reconstruction needs). ALL subspaces train in one
    fused loop — centroids are keyed by (sub, code_id), assignment is
    one broadcast join, means one grouped aggregation — so the job
    count is O(n_iters), not O(m × n_iters), and the corpus-side work
    per iteration is a single pass over the exploded (id, sub,
    subvector) relation. The codebook is tiny (m × n_codes × subdim
    doubles) and broadcasts everywhere downstream. Dimension is probed
    from one row (driver action, training-time only).

    ``train_fraction`` < 1 trains on a deterministic hash-sampled
    subset (``pmod(xxhash64(id), 10^6) < frac·10^6`` — reproducible,
    no RNG state): codebook training then scans frac·|corpus| per
    Lloyd iteration while ``pq_encode`` still encodes the FULL corpus
    in its single pass. This is the 100 TB training path — k-means
    quality depends on sample coverage of the distribution, not corpus
    size, so a fixed-size sample trains a codebook of the same recall
    (pinned in tests/test_ann_recall.py) without n_iters full scans.

    ``deterministic=True``: per-(sub, code, dim) means fold over the
    member-id-sorted value list instead of ``F.avg`` — partition-
    order-free for DuckDB oracle replay (see ``kmeans_centroids``).
    """
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if not 0.0 < train_fraction <= 1.0:
        raise ValueError(f"train_fraction must be in (0, 1]: {train_fraction}")
    subdim = dim // m
    if train_fraction < 1.0:
        corpus = corpus.where(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(1_000_000))
            < int(train_fraction * 1_000_000)
        )
    unit = _unit(corpus.select(id_col, vec_col), vec_col)
    sub_rows = unit.select(
        F.col(id_col).alias("id"),
        F.explode(_sub_slices(vec_col, m, subdim)).alias("__s"),
    ).select("id", F.col("__s.sub").alias("sub"), F.col("__s.sv").alias("sv"))

    # Seed: first n_codes vectors by id, per subspace (deterministic).
    w_seed = Window.partitionBy("sub").orderBy(F.col("id").asc())
    cents = (
        sub_rows.withColumn("__rn", F.row_number().over(w_seed))
        .where(F.col("__rn") <= n_codes)
        .select(
            "sub", F.col("__rn").alias("code_id"), F.col("sv").alias("c_vec")
        )
    )
    for _ in range(n_iters):
        # In-row assignment (round 14, the _nearest_centroids recipe
        # per subspace): the old formulation broadcast-joined the
        # codebook, paid a groupBy(id, sub) exchange of the n·m scored
        # rows for the min_by, then a SECOND n·m-row shuffle join back
        # onto sub_rows just to recover the subvectors for the means.
        # Collapsing the codebook into one broadcast row makes the
        # assignment a pure map stage with sv riding in-row — both
        # corpus-sized exchanges per iteration are gone (guide §2.4);
        # only the (sub, code, pos) means aggregate shuffles.
        assigned = sub_rows.crossJoin(F.broadcast(_code_book_row(cents))).select(
            "id",
            "sub",
            "sv",
            _nearest_code(F.col("sub"), F.col("sv")).alias("code_id"),
        )
        mean_agg = (
            _fold_mean(F.col("id"), F.col("val"))
            if deterministic
            else F.avg("val")
        )
        means = (
            assigned
            .select(
                "sub", "code_id", "id", F.posexplode("sv").alias("pos", "val")
            )
            .groupBy("sub", "code_id", "pos")
            .agg(mean_agg.alias("mval"))
            .groupBy("sub", "code_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias(
                    "srt"
                )
            )
            .select(
                "sub",
                "code_id",
                F.transform("srt", lambda x: x["mval"]).alias("new_vec"),
            )
        )
        # A code that loses all members keeps its previous vector so
        # the codebook shape is stable.
        cents = (
            cents.join(means, ["sub", "code_id"], "left")
            .select(
                "sub",
                "code_id",
                F.coalesce("new_vec", "c_vec").alias("c_vec"),
            )
            .localCheckpoint(eager=True)
        )
    return cents


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    keep: "tuple[str, ...]" = (),
) -> DataFrame:
    """Encode each vector as ``m`` code ids → (id, codes array<int>,
    *keep) — ``keep`` columns ride through the map stage unchanged
    (encoding is in-row, so passthrough costs nothing; the PQ index's
    encode path composes assignment + encoding without a join).

    The 100 TB point of PQ: after this one pass the corpus's search
    representation is m small ints per row (64-dim float64 → 8 bytes at
    the defaults, 64× smaller), so the ANN scan reads codes, never
    vectors. Shape since round 14: the codebook collapses into ONE
    collected row broadcast to every task, and each vector's m codes
    are an in-row ``transform`` over its subvector slices
    (:func:`_nearest_code` — bit-exact vs the old join+min_by, pinned
    by a differential test). Encoding is a PURE MAP STAGE: the round-8
    formulation exploded to n·m (id, sub, subvector) rows, paid a
    groupBy(id, sub) exchange for the argmin and a second groupBy(id)
    exchange to reassemble the arrays — at corpus scale two full
    shuffles of the exploded relation, now zero (guide §2.4).
    """
    m = codebook.select(F.max("sub")).first()[0] + 1
    subdim = len(codebook.select("c_vec").first()[0])
    unit = _unit(corpus.select(id_col, vec_col, *keep), vec_col)
    slices = _sub_slices(vec_col, m, subdim)
    codes = F.transform(
        slices, lambda s: _nearest_code(s["sub"], s["sv"])
    )
    return unit.crossJoin(F.broadcast(_code_book_row(codebook))).select(
        F.col(id_col).alias("id"), codes.alias("codes"), *keep
    )


def _adc_lut(
    queries: DataFrame, codebook: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Per-query ADC lookup table → (query_id, sub, code_id, part)
    where part = dot(query subvector, code centroid). Bounded:
    queries × m × n_codes rows."""
    m = codebook.select(F.max("sub")).first()[0] + 1
    subdim = len(codebook.select("c_vec").first()[0])
    q = _unit(
        queries.select(F.col(id_col).alias("query_id"), vec_col), vec_col
    )
    q_subs = q.select(
        "query_id", F.explode(_sub_slices(vec_col, m, subdim)).alias("__s")
    ).select(
        "query_id", F.col("__s.sub").alias("sub"), F.col("__s.sv").alias("qv")
    )
    return q_subs.join(F.broadcast(codebook), "sub").select(
        "query_id",
        "sub",
        "code_id",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("c_vec"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("part"),
    )


def _adc_rank(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k over ADC-summed similarities."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    )


def pq_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: approximate cosine from codes.

    Unit-normalized vectors make cosine decompose over subvectors:
    ``cos(q, x) = Σ_s dot(q_s, x_s) ≈ Σ_s LUT[s, code(x, s)]`` where
    ``LUT[s, c] = dot(q_s, codebook[s, c])``. The LUT relation is
    queries × m × n_codes rows — bounded, broadcast — so the scan side
    touches ONLY the (id, sub, code) explosion of the code table:
    per-candidate cost is m lookup-adds, no vector math, no corpus
    vectors read. Compose with ``ivf_assign`` bucketing to prune the
    candidate set at real scale (IVF-PQ).

    Output: (query_id, match_id, sim, rank) — same contract as
    ``cosine_topk`` but sim is the ADC approximation.
    """
    lut = _adc_lut(queries, codebook, id_col, vec_col)
    cand = codes.select(
        F.col("id").alias("match_id"),
        F.posexplode("codes").alias("sub", "code_id"),
    )
    scored = (
        cand.join(F.broadcast(lut), ["sub", "code_id"])
        .groupBy("query_id", "match_id")
        .agg(F.round(F.sum("part"), 6).alias("sim"))
        .where(F.col("query_id") != F.col("match_id"))
    )
    return _adc_rank(scored, k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 8,
    m: int = 32,
    n_codes: int = 32,
    kmeans_iters: int = 3,
    pq_iters: int = 2,
    deterministic_train: bool = False,
) -> DataFrame:
    """IVF-PQ: the composed 100 TB ANN shape — coarse centroids prune
    the candidate set (each query scans only its ``nprobe`` buckets)
    and product-quantization codes make the per-candidate cost m
    lookup-adds with NO corpus-vector reads at query time.

    Index side (run once, reuse): coarse Lloyd centroids
    (``kmeans_centroids``), one bucket id per vector (``ivf_assign``
    nprobe=1), PQ codebook + codes (``pq_train``/``pq_encode``).
    Query side: probe ``nprobe`` buckets, equi-join bucket members'
    CODES (never vectors), ADC-score, top-k. Every join is either
    broadcast (centroids, codebook, LUT, probes) or an equi-join on
    the bucket id — no cross join anywhere.

    Output: (query_id, match_id, sim, rank) — ``cosine_topk``'s
    contract with ADC-approximate sim.
    """
    cents = kmeans_centroids(
        corpus, id_col, vec_col, n_centroids=n_centroids,
        n_iters=kmeans_iters, deterministic=deterministic_train,
    )
    buckets = ivf_assign(corpus, id_col, vec_col, cents, nprobe=1)
    book = pq_train(
        corpus, id_col, vec_col, m=m, n_codes=n_codes, n_iters=pq_iters,
        deterministic=deterministic_train,
    )
    codes = pq_encode(corpus, book, id_col, vec_col).join(buckets, "id")

    probes = ivf_assign(
        queries, id_col, vec_col, cents, nprobe=nprobe
    ).select(F.col("id").alias("query_id"), "centroid_id")
    lut = _adc_lut(queries, book, id_col, vec_col)
    cand = (
        codes.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("match_id"),
            F.posexplode("codes").alias("sub", "code_id"),
        )
    )
    scored = (
        cand.join(F.broadcast(lut), ["query_id", "sub", "code_id"])
        .groupBy("query_id", "match_id")
        .agg(F.round(F.sum("part"), 6).alias("sim"))
    )
    return _adc_rank(scored, k)


# ---------------------------------------------------------------------------
# Embedding storage quantization (int8 with per-vector scale)
# ---------------------------------------------------------------------------

def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Symmetric int8 quantization with a per-vector scale →
    (id, scale, codes array<int>): ``code = round(x / scale)``,
    ``scale = max|x| / 127`` — the standard storage form for large
    embedding lakes (4-8× smaller than float32/64, reconstruction
    error ≤ scale/2 per component).

    Pure per-row array arithmetic: zero shuffle, and — unlike the PQ
    codes — exactly reproducible in ANSI SQL, so this operator gets a
    full value-level oracle check. All-zero vectors quantize to zero
    codes with scale 0 (guarded division).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    codes = F.transform(v, lambda x: F.round(x / safe, 0).cast("int"))
    return df.select(
        F.col(id_col).alias("id"),
        F.round(scale, 12).alias("scale"),
        codes.alias("codes"),
    )


def dequantize_embeddings(
    codes_df: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings` → (id, vec array<double>)
    with per-component error ≤ scale/2."""
    return codes_df.select(
        F.col(id_col),
        F.transform(
            F.col("codes"), lambda c: c.cast("double") * F.col("scale")
        ).alias("vec"),
    )


def _split_hot_cells(
    v: DataFrame, max_cell_size: int, nprobe: int
) -> DataFrame:
    """Second clustering level for :func:`semantic_dedup`'s hot cells:
    → (centroid_id, sub_id, id, vec, nrm) where cells at or under
    ``max_cell_size`` keep ``sub_id = 0`` and larger cells split into
    ``ceil(|cell| / max_cell_size)`` nearest-seed sub-cells.

    Every stage is bounded or embarrassingly parallel: per-cell counts
    are one map-side-partial aggregate; seeds are argmin-id members
    per (cell, hash-bucket) — another aggregate, so no sort or window
    ever touches a hot cell as one partition; seed assignment
    broadcasts the (Σ ceil(|cell|/bound))-row seed table and ranks per
    VECTOR (a high-cardinality window key — thousands of tiny sorted
    groups per task, never one task per cell). Multi-probe (``nprobe``
    nearest seeds) recovers sub-boundary pairs exactly like the
    top-level cell-boundary recovery.
    """
    if max_cell_size < 2:
        raise ValueError(
            f"max_cell_size must be >= 2; got {max_cell_size}"
        )
    ksub = (
        v.groupBy("centroid_id")
        .agg(F.count("*").alias("__n"))
        .select(
            "centroid_id",
            F.ceil(F.col("__n") / F.lit(float(max_cell_size)))
            .cast("int")
            .alias("__k"),
        )
    )
    vk = v.join(F.broadcast(ksub), "centroid_id")
    cool = vk.where(F.col("__k") <= 1).select(
        "centroid_id", F.lit(0).alias("sub_id"), "id", "vec", "nrm"
    )
    hot = vk.where(F.col("__k") > 1)
    seeds = with_norm(
        hot.select(
            "centroid_id",
            F.pmod(F.hash("id"), F.col("__k")).alias("__b"),
            "id",
            "vec",
        )
        .groupBy("centroid_id", "__b")
        .agg(F.min_by("vec", "id").alias("__svec")),
        "__svec",
        "__sn",
    )
    scored = hot.join(F.broadcast(seeds), "centroid_id").select(
        "centroid_id", "id", "vec", "nrm", "__b",
        cosine(
            F.col("vec"), F.col("__svec"), F.col("nrm"), F.col("__sn")
        ).alias("__sim"),
    )
    w = Window.partitionBy("centroid_id", "id").orderBy(
        F.col("__sim").desc(), F.col("__b").asc()
    )
    assigned = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= nprobe)
        .select(
            "centroid_id", F.col("__b").alias("sub_id"),
            "id", "vec", "nrm",
        )
    )
    return cool.unionByName(assigned)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_centroids: int = 16,
    kmeans_iters: int = 3,
    sim_threshold: float = 0.95,
    deterministic_train: bool = False,
    assign_nprobe: int = 1,
    max_cell_size: "int | None" = None,
    train_modulus: int = 1,
    assign_two_level: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space semantic
    deduplication → ``(id, centroid_id, keep)`` — cluster the corpus
    into k-means cells, compare pairs ONLY within each cell, and keep
    one representative (min id) per near-duplicate component. The
    modern LLM-curation companion to MinHash: catches paraphrases and
    re-encodings that share no n-grams.

    Scale design is the paper's own: the cell assignment makes the
    quadratic comparison local — work is Σ_cells |cell|², never
    |corpus|², and each cell's pair join is an equi-join on
    centroid_id. Cells are balanced by Lloyd refinement
    (``kmeans_centroids``); a pathologically hot cell is the k-means
    analogue of join skew and is AQE's to split. Cross-cell near-dups
    are missed by construction — the paper's documented approximation;
    raise ``n_centroids`` for finer cells (cheaper pairs, more misses)
    or lower it toward 1 (exact, quadratic).

    ``assign_nprobe > 1`` multi-assigns each vector to its nprobe
    nearest centroids for PAIR GENERATION (the reported
    ``centroid_id`` stays the primary cell): a near-dup pair split by
    a cell boundary still meets in any shared probe cell, recovering
    most boundary misses at ~nprobe× the pair work — the measured
    recall/cost trade lives in ``tests/test_semdedup_recall.py`` and
    FIXTURES.md §"SemDeDup recall (measured)". A pair sharing several
    probe cells yields duplicate edges; ``connected_components`` is
    multi-edge-tolerant, so duplicates cost a little sim arithmetic,
    never correctness.

    ``sim_threshold`` gates on the 6-dp-rounded cosine (engine-exact);
    components within a cell collapse transitively (the near-dup
    clusters recipe) and ``keep`` marks ``id == min(component)`` —
    singletons keep trivially. ``deterministic_train=True`` makes the
    whole pipeline (training included) bit-replayable by a SQL oracle.

    ``max_cell_size`` (round-10 verdict item 7) bounds the quadratic
    hot-cell channel the k-means imbalance opens at scale (the
    measured Σ|cell|² excess in PERF.md): cells above the bound are
    SPLIT before the pair join by a second clustering level — one
    deterministic seed member per ceil(|cell|/bound) hash bucket
    (argmin-id, a bounded aggregate: no sort, no window over the
    cell), members assigned to their ``assign_nprobe`` nearest seeds
    (multi-probe at the sub-level too, so boundary recall matches the
    top level), and the pair join keyed on (centroid_id, sub_id).
    Pair work per split cell drops from |cell|² to ~Σ|sub|²; sub-cell
    boundary misses mirror the paper's cell-boundary approximation and
    are recovered the same way (nprobe ≥ 2). ``None`` (default, and
    the oracle fixture's setting) keeps single-level cells.

    ``train_modulus > 1`` trains the Lloyd centroids on the
    deterministic 1/modulus subsample ``xxhash64(id) % modulus == 0``
    (standard IVF practice — training needs a representative sample,
    not the corpus; brute-force Lloyd on the full corpus is O(n·k)
    PER ITERATION, which with the k ≈ √n sizing rule is O(n^1.5)
    training for zero recall benefit). Assignment still covers every
    vector. Only meaningful with ``kmeans_iters > 0``.

    ``assign_two_level=True`` routes the final corpus→cell assignment
    through :func:`ivf_assign_two_level` (one prebuilt √k-group
    router) — O(n·√k) instead of O(n·k), measured 4.25× at 200k×320
    (PERF.md round-10); approximate at the cell-boundary margin, the
    same miss class ``assign_nprobe`` already governs.
    """
    from nextbus2pg_spark.operators.components import connected_components

    if train_modulus < 1:
        raise ValueError(f"train_modulus must be >= 1; got {train_modulus}")
    train_src = corpus
    if train_modulus > 1:
        train_src = corpus.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(train_modulus)) == 0
        )
    if kmeans_iters > 0:
        cents = kmeans_centroids(
            train_src, id_col, vec_col, n_centroids, n_iters=kmeans_iters,
            deterministic=deterministic_train,
        )
    else:
        cents = ivf_centroids(train_src, id_col, vec_col, n_centroids)
    if assign_nprobe < 1:
        raise ValueError(f"assign_nprobe must be >= 1; got {assign_nprobe}")
    if assign_two_level:
        # The coarse router must inherit the determinism contract:
        # without it, two_level_router's Lloyd refinement uses
        # partition-order-dependent F.avg and the documented
        # "deterministic_train=True is bit-replayable" guarantee
        # breaks when both flags are set (round-10 advice).
        router = two_level_router(cents, deterministic=deterministic_train)
        _assign = lambda np_: ivf_assign_two_level(  # noqa: E731
            corpus, id_col, vec_col, cents, nprobe=np_, router=router
        )
    else:
        _assign = lambda np_: ivf_assign(  # noqa: E731
            corpus, id_col, vec_col, cents, nprobe=np_
        )
    vbase = with_norm(corpus, vec_col, "nrm").select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "nrm"
    )
    if assign_two_level:
        # two-level assignment keeps its own join shape; attach the
        # vectors back by id as before.
        v = _assign(assign_nprobe).join(vbase, "id")
    else:
        # single-level assignment is map-only since round 13
        # (_nearest_centroids): the vectors ride along in-row, so the
        # corpus-wide membership-⋈-corpus join-back is gone.
        v = _nearest_centroids(
            vbase, cents, nprobe=assign_nprobe, vec_col="vec",
            norm_col="nrm",
        )
    v = v.localCheckpoint(eager=True)  # feeds both pair sides + the output
    if max_cell_size is not None:
        paired = _split_hot_cells(v, max_cell_size, assign_nprobe)
        key = ["centroid_id", "sub_id"]
    else:
        paired = v
        key = ["centroid_id"]
    a = paired.select(
        *key, F.col("id").alias("id_a"),
        F.col("vec").alias("va"), F.col("nrm").alias("na"),
    )
    b = paired.select(
        *key, F.col("id").alias("id_b"),
        F.col("vec").alias("vb"), F.col("nrm").alias("nb"),
    )
    sim = F.round(
        cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6
    )
    edges = (
        a.join(b, key)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= F.lit(sim_threshold))
    )
    comp = connected_components(edges)
    out_base = (
        v.select("id", "centroid_id")
        if assign_nprobe == 1
        # multi-probe membership is pair-generation-only: report one
        # row per id, keyed by the PRIMARY (nearest-centroid) cell.
        else _assign(1)
    )
    return (
        out_base
        .join(comp, "id", "left")
        .select(
            "id",
            "centroid_id",
            (
                F.col("component").isNull()
                | (F.col("id") == F.col("component"))
            ).alias("keep"),
        )
    )
