"""Iterative- and heavy-family scaling measurement.

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

Round 9 extends the sweep to the round-8 HEAVY family (verdict task
5): semantic_dedup, containment_pairs, theil_sen, holt_winters — each
over seeded ``spark.range``-arithmetic corpora whose shape matches the
operator's documented scale path (cells kept constant-size by scaling
``n_centroids`` with the data; Theil-Sen/Holt-Winters scale by GROUP
COUNT at fixed group size, which is the only way those operators are
allowed to grow; containment scales documents at fixed shingle
overlap). A superlinear slope flags a plan defect.

Usage: ``python bench_scaling.py [scales ...]`` (default 1 3 10).
Emits one JSON line per (operator, scale) to stdout.
"""

from __future__ import annotations

import json
import os
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


# -- round-8 heavy family (round-9 verdict task 5) ----------------------

#: 1x sizes, chosen so scale 1 lands near the sf0.1 fixture cost.
HEAVY_BASE = {
    "semantic_dedup": 5_000,    # vectors (dim 32; cells ~312 vecs)
    "containment_pairs": 5_000,  # documents x 40 shingles, stride 5
    "theil_sen": 200,            # groups of 100 points (4950 pairs each)
    "holt_winters": 200,         # keys of 500 points (season 24)
    "warc_ingest": 8_000,        # docs (~560B each) -> 16*scale archives
    "warc_stream_spool": 64,     # spool files of 40 records each
    "cdx_build_stream": 64,      # archive drops of 40 records each
    "crawl_loop": 20_000,        # web pages across 16 hosts, 3 iters
}


def synth_vectors(spark, n: int, dim: int = 32):
    """Near-dup-structured embeddings: ids 2k/2k+1 share a base vector
    with a tiny odd-id perturbation (cosine >> 0.95), bases spread by
    Lehmer arithmetic — no RNG, no files."""
    base = (F.col("id") - F.col("id") % 2).cast("long")
    j = F.sequence(F.lit(0), F.lit(dim - 1))
    vec = F.transform(
        j,
        lambda k: (
            ((base * (31 + k * 7) + k * k * 13) % 1009).cast("double")
            / 1009.0
            + (F.col("id") % 2).cast("double") * 1e-4 * ((k % 3) - 1)
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def run_heavy(spark, name: str, scale: int) -> tuple[float, int]:
    base = HEAVY_BASE[name] * scale
    if name == "semantic_dedup":
        from nextbus2pg_spark.operators.similarity import semantic_dedup

        vecs = synth_vectors(spark, base).localCheckpoint()
        n_rows = vecs.count()
        t0 = time.perf_counter()
        # Round-10 reparameterization after measuring BOTH old shapes:
        # r9's k ∝ n (constant mean cell) silently makes TRAINING and
        # ASSIGNMENT the quadratic terms (brute-force Lloyd assign is
        # O(n·k); measured assign 1.2s→10.1s for 3.3x data), while
        # fixed k pushes every member's pair work to the cap (measured
        # 159s at 10x vs 89s). The production rule is k ≈ √n with
        # sample-bounded training (train_modulus keeps the Lloyd
        # sample at the 1x size) and max_cell_size closing the k-means
        # skew channel: training O(sample·k), assignment O(n·√n) with
        # tiny constants, pair join Σ|sub|² ≈ n·cap — the cap (165)
        # sized so mean sub-cells stay ~constant across the sweep.
        n = semantic_dedup(
            vecs, "vec_id", "embedding",
            n_centroids=16 * max(1, round(scale ** 0.5)),
            kmeans_iters=3,
            sim_threshold=0.95,
            max_cell_size=165,
            train_modulus=scale,
        ).count()
    elif name == "containment_pairs":
        from nextbus2pg_spark.operators.dedup import containment_pairs

        shingled = (
            spark.range(base * 40)
            .select(
                (F.col("id") / 40).cast("long").alias("doc"),
                F.concat(
                    F.lit("s"),
                    ((F.col("id") / 40).cast("long") * 5
                     + F.col("id") % 40).cast("string"),
                ).alias("shingle"),
            )
            .select(F.col("doc").alias("id"), "shingle")
            .localCheckpoint()
        )
        n_rows = shingled.count()
        t0 = time.perf_counter()
        n = containment_pairs(shingled, threshold_milli=800).count()
    elif name == "theil_sen":
        from nextbus2pg_spark.operators.stats import theil_sen

        pts = (
            spark.range(base * 100)
            .select(
                (F.col("id") / 100).cast("long").alias("grp"),
                (F.col("id") % 100).cast("double").alias("x"),
                ((F.col("id") % 100) * 3
                 + (F.col("id") * 17) % 13).cast("double").alias("y"),
            )
            .localCheckpoint()
        )
        n_rows = pts.count()
        t0 = time.perf_counter()
        n = theil_sen(pts, ["grp"], "x", "y").count()
    elif name == "crawl_loop":
        # Round-13: the BFS crawl driver (pipelines/frontier.
        # crawl_loop) over a closed-form in-memory web — 16 hosts,
        # 3 outlinks per page, every 8th page a redirect record, the
        # fetch injected as a join against the web frame. The page
        # budget scales WITH the web (N/8 per iteration), so each of
        # the 3 iterations fetches proportionally more; expected
        # shape is the iterative-family one — per-iteration
        # scheduling dominates at 1x and amortizes as the joins
        # grow, so 10x web should be well under 10x wall.
        from nextbus2pg_spark.pipelines.frontier import crawl_loop

        N = base  # run_heavy already scaled base by `scale`
        s = lambda c: c.cast("string")  # noqa: E731
        i = F.col("id")

        def page(t):
            return F.concat(
                F.lit("https://h"), s(t % 16), F.lit(".scale/p"), s(t)
            )

        is_red = i % 8 == 7
        html = F.concat(
            F.lit('<a href="'), page((i * 7 + 1) % N),
            F.lit('">a</a><a href="'), page((i + 1) % N),
            F.lit('">b</a><a href="'), page((i * 13 + 5) % N),
            F.lit('">c</a>'),
        )
        web = (
            spark.range(N)
            .select(
                page(i).alias("uri"),
                F.when(is_red, F.lit(None).cast("string"))
                .otherwise(html).alias("content"),
                F.when(is_red, 301).otherwise(200).alias("http_status"),
                F.when(is_red, page((i + 3) % N))
                .otherwise(F.lit(None).cast("string")).alias("location"),
            )
            .localCheckpoint()
        )
        robots = spark.createDataFrame(
            [(f"h{k}.scale", "User-agent: *\nDisallow: /none/")
             for k in range(16)],
            "domain string, robots_txt string",
        )
        seeds = web.where(
            F.regexp_extract("uri", r"/p(\d+)$", 1).cast("long") < 64
        )
        n_rows = web.count()

        def _fetch(urls):
            return urls.join(
                web, urls.url == web.uri, "inner"
            ).select("uri", "content", "http_status", "location")

        t0 = time.perf_counter()
        n = crawl_loop(
            seeds, robots, "scalebot", _fetch,
            max_iters=3, page_budget=max(1, N // 8),
        ).count()
    elif name == "warc_ingest":
        # Round-11: the crawl-ingestion seam with its full wire
        # variety (gzip members on odd archives; every 5th doc an HTTP
        # response, of those every 7th Content-Encoding-compressed,
        # chunked TE, UTF-16/latin-1 charsets). Archives scale WITH
        # the data (16*scale) so archive size stays constant — the
        # one-archive-per-task shape; wall should track data near-
        # linearly until cores saturate (32 tasks at 1x/3x already).
        from nextbus2pg_spark.sources.warc import (
            synthetic_warc_archives,
            warc_documents,
        )

        docs = (
            spark.range(base)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.col("id").cast("string"),
                    F.lit(" "),
                    F.repeat(F.lit("crawl body token "), 32),
                ).alias("text"),
            )
            .localCheckpoint()
        )
        n_rows = docs.count()
        t0 = time.perf_counter()
        n = warc_documents(
            synthetic_warc_archives(docs, n_archives=16 * scale)
        ).count()
    elif name == "warc_stream_spool":
        # Round-12: the STREAMING twin of the spool seam
        # (warc_spool_archives_stream -> warc_documents under an
        # availableNow drain) at the batch seam's scales. Spool files
        # scale with the data at constant file size (the
        # one-file-per-capture shape the ranged fetcher produces);
        # only the stream drain is timed — spool generation and the
        # checkpoint dir live outside the clock. Expected shape: wall
        # tracks data near-linearly once cores fill, like the batch
        # fanout (10x ~ core-fill bound), plus one fixed micro-batch
        # planning cost.
        import shutil
        import tempfile

        from nextbus2pg_spark.sources.warc import (
            warc_documents,
            warc_spool_archives_stream,
            warc_write_records,
        )

        workdir = tempfile.mkdtemp(prefix="warc-stream-scale-")
        spool = os.path.join(workdir, "spool")
        os.makedirs(spool)
        n_files = base
        n_rows = 0
        for fi in range(n_files):
            recs = [
                {
                    "type": "conversion",
                    "uri": f"https://example.org/doc/{fi}/{ri}",
                    "date": "2026-01-01T00:00:00Z",
                    "record_id": f"urn:doc:{fi}:{ri}",
                    "block": (
                        f"{fi}:{ri} " + "crawl body token " * 32
                    ).encode(),
                }
                for ri in range(40)
            ]
            n_rows += len(recs)
            payload = warc_write_records(recs, gzip_members=True)
            with open(os.path.join(spool, f"f{fi}.warcrec"), "wb") as fh:
                fh.write(payload)
        counts: "list[int]" = []

        def _sink(batch_df, batch_id):
            counts.append(batch_df.count())

        t0 = time.perf_counter()
        q = (
            warc_documents(warc_spool_archives_stream(spark, spool))
            .writeStream.foreachBatch(_sink)
            .option(
                "checkpointLocation", os.path.join(workdir, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        release_cached_rdds(spark)
        shutil.rmtree(workdir, ignore_errors=True)
        assert sum(counts) == n_rows, (name, scale, counts, n_rows)
        return wall, n_rows
    elif name == "cdx_build_stream":
        # Round-13: the INDEX BUILDER's streaming twin
        # (warc_archive_files(streaming=True) -> build_cdx_index under
        # an availableNow drain) — archives are indexed as they land.
        # Same shape discipline as warc_stream_spool: drops scale with
        # the data at constant file size, only the drain is timed.
        # Indexing never DECODES a body (no Content-Encoding, no
        # charset), but it does hash every payload (sha1) and derive
        # surt keys — on this fixture's tiny ASCII bodies the two
        # twins measure comparable (r13: 2.3/2.5/3.9s vs 1.1/1.4/3.7s
        # at 1x/3x/10x); the indexing advantage is real only when
        # bodies are compressed/heavy, which decode pays and hashing
        # does not.
        import shutil
        import tempfile

        from nextbus2pg_spark.sources.cdx import build_cdx_index
        from nextbus2pg_spark.sources.warc import (
            warc_archive_files,
            warc_write_records,
        )

        workdir = tempfile.mkdtemp(prefix="cdx-build-scale-")
        drop = os.path.join(workdir, "drop")
        os.makedirs(drop)
        n_files = base
        n_rows = 0
        for fi in range(n_files):
            recs = [
                {
                    "type": "response",
                    "uri": f"https://example.org/doc/{fi}/{ri}",
                    "date": "2026-01-01T00:00:00Z",
                    "record_id": f"urn:doc:{fi}:{ri}",
                    "block": (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain"
                        b"\r\nContent-Length: "
                        + str(len(body := (
                            f"{fi}:{ri} " + "crawl body token " * 32
                        ).encode())).encode()
                        + b"\r\n\r\n" + body
                    ),
                }
                for ri in range(40)
            ]
            n_rows += len(recs)
            payload = warc_write_records(recs, gzip_members=True)
            with open(
                os.path.join(drop, f"seg{fi}.warc.gz"), "wb"
            ) as fh:
                fh.write(payload)
        counts: "list[int]" = []

        def _ix_sink(batch_df, batch_id):
            counts.append(
                build_cdx_index(batch_df, on_error="null").count()
            )

        t0 = time.perf_counter()
        q = (
            warc_archive_files(
                spark, drop, streaming=True, relative_to=drop
            )
            .writeStream.foreachBatch(_ix_sink)
            .option(
                "checkpointLocation", os.path.join(workdir, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        release_cached_rdds(spark)
        shutil.rmtree(workdir, ignore_errors=True)
        assert sum(counts) == n_rows, (name, scale, counts, n_rows)
        return wall, n_rows
    else:  # holt_winters
        from nextbus2pg_spark.operators.timeseries import holt_winters

        series = (
            spark.range(base * 500)
            .select(
                (F.col("id") / 500).cast("long").alias("key"),
                (F.col("id") % 500).cast("long").alias("ts"),
                (
                    ((F.col("id") % 24) * 5).cast("double")
                    + ((F.col("id") * 29) % 17).cast("double")
                ).alias("value"),
            )
            .localCheckpoint()
        )
        n_rows = series.count()
        t0 = time.perf_counter()
        n = holt_winters(
            series, "key", "ts", "value", season_length=24
        ).count()
    wall = time.perf_counter() - t0
    release_cached_rdds(spark)
    assert n > 0, (name, scale, n_rows)
    return wall, n_rows


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
    for op in HEAVY_BASE:
        run_heavy(spark, op, 1)  # warm the plan shape
        for s in scales:
            wall, n_rows = run_heavy(spark, op, s)
            print(
                json.dumps(
                    {
                        "op": op,
                        "scale": s,
                        "rows": n_rows,
                        "wall_sec": round(wall, 3),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
