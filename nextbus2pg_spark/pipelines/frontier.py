"""Crawl frontier expansion — one iteration of the live-crawl loop.

Round 13 closes the loop the crawl seam had been building toward:
parsed documents yield outlinks (``operators/text.document_links``),
crawled 3xx records contribute their ``location`` targets (so moved
URLs are followed, never re-fetched at the old end), and the next
frontier is the set of discovered URLs that (a) no crawled record
already covers, and (b) the target host's robots.txt permits
(``sources/robots``). The fetch side then executes the frontier with
per-host politeness (``sources/http_fetcher``: ``RobotsFetcher`` →
``HostThrottle`` → ``SitemapFetcher`` / ``CdxRangeFetcher``); index
snapshots get the same treatment via
``sources/cdx.cdx_fetch_once_manifest``.

Scale shape: everything here is equi-joins and one distinct on the
LINK set — the link table is the big side (tens of outlinks per
document) and is reduced by ``distinct`` before any join; the robots
rule table broadcasts (bounded by the robots corpus); the
crawled-set join is a left-anti equi-join on url. No iteration, no
cartesian, no Python.

Parity citation: the reference has no crawl surface (single XML feed,
reference README); this composes the round-10..13 extension seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _host_col(url: "str | Column" = "url") -> Column:
    return F.lower(
        F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    )


def _apply_host_cap(df: DataFrame, cap: int, order_cols) -> DataFrame:
    """Keep at most ``cap`` rows per URL host, deterministically by
    ``order_cols`` — the one per-host window both frontier call sites
    share (round-13 review: the block was copy-pasted with silently
    divergent orderings; the ordering is now an explicit argument)."""
    if cap < 1:
        raise ValueError(f"per_host_cap must be >= 1; got {cap}")
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(_host_col()).orderBy(*order_cols)
    )
    return (
        df.withColumn("__rn", rn)
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def frontier_candidates(
    docs: DataFrame,
    crawled: "DataFrame | None" = None,
) -> DataFrame:
    """The DISCOVERY half of one frontier iteration →
    ``(url, n_referrers)``: the distinct outlink set of a
    ``warc_documents``-shaped frame (page outlinks via
    ``document_links`` plus redirect rows' ``location`` targets — a
    301 has no body, but its Location is exactly a discovered URL, so
    chains crawled across records chain naturally), minus URLs any
    record already covers and minus the caller's ``crawled`` ledger.
    The doc frame's own URIs are always excluded: a crawled 301 is
    never re-fetched (its record IS the verdict), while its TARGET
    stays fetchable until some record holds that content.

    Robots filtering and per-host capping are the PERMISSION half
    (:func:`frontier_expand`); the split exists so
    :func:`crawl_loop` can fetch robots.txt for newly discovered
    hosts BETWEEN discovery and permission (round-13 review — with
    seed-time-only robots, an unknown host's URLs sailed through
    ``robots_allowed``'s no-match default)."""
    from nextbus2pg_spark.operators.text import document_links

    links = document_links(
        docs.where(F.col("content").isNotNull()),
        uri_col="uri",
        content_col="content",
    ).unionByName(
        docs.where(F.col("location").isNotNull()).select(
            "uri", F.col("location").alias("link")
        )
    )
    candidates = links.groupBy(F.col("link").alias("url")).agg(
        F.count_distinct("uri").alias("n_referrers")
    )
    held = docs.select(F.col("uri").alias("url"))
    if crawled is not None:
        held = held.unionByName(crawled.select("url"))
    return candidates.join(held.distinct(), "url", "left_anti")


def frontier_expand(
    docs: "DataFrame | None",
    robots: DataFrame,
    agent: str,
    crawled: "DataFrame | None" = None,
    per_host_cap: "int | None" = None,
    *,
    candidates: "DataFrame | None" = None,
) -> DataFrame:
    """One frontier iteration over a ``warc_documents``-shaped frame →
    ``(url, n_referrers)``: :func:`frontier_candidates`' discovery
    set, filtered to what the fetched robots.txt corpus allows for
    ``agent``, optionally capped at ``per_host_cap`` URLs per host
    (deterministic: lowest ``url`` first — the frontier-side half of
    politeness; the fetch-side half is ``HostThrottle``).

    Pass ``candidates`` to reuse an already-computed discovery set
    (``docs``/``crawled`` are then ignored — :func:`crawl_loop` does
    this after its robots hop). Hosts with no row in ``robots``
    default to ALLOWED (``robots_allowed``'s no-match rule): correct
    when the robots corpus covers the frontier's hosts — callers that
    discover hosts mid-crawl must extend the corpus first (the
    ``robots_fn`` hop) or accept the default.

    ``n_referrers`` (distinct referring documents) rides along as the
    standard crawl prioritization signal."""
    from nextbus2pg_spark.sources.robots import (
        robots_allowed,
        robots_rules,
    )

    if candidates is None:
        if docs is None:
            raise ValueError(
                "frontier_expand needs docs when no candidates frame "
                "is passed"
            )
        # The discovery set is consumed twice below (the robots
        # verdict build AND the semi-join back) but is deliberately
        # NOT checkpointed: AQE reuses the candidates aggregate's
        # shuffle across both consumers at runtime, and a measured
        # round-13 A/B (sf0.1, interleaved fresh sessions) showed a
        # checkpoint here REGRESSES ~20% — materialization cost with
        # no duplicated work left to save.
        candidates = frontier_candidates(docs, crawled)
    rules = robots_rules(robots, agent)
    verdicts = robots_allowed(candidates.select("url"), rules)
    out = candidates.join(
        verdicts.where(F.col("allowed")), "url", "left_semi"
    )
    if per_host_cap is not None:
        out = _apply_host_cap(out, per_host_cap, ["url"])
    return out


def crawl_loop(
    seed_docs: DataFrame,
    robots: DataFrame,
    agent: str,
    fetch_fn,
    max_iters: int = 3,
    page_budget: int = 1000,
    per_host_cap: "int | None" = None,
    robots_fn=None,
) -> DataFrame:
    """Multi-iteration BFS crawl with a persistent frontier QUEUE —
    the full crawl driver :func:`frontier_expand` is one step of.
    Returns the accumulated corpus (the ``warc_documents`` shape plus
    a ``depth`` column; seeds are depth 0, iteration *i*'s fetches
    depth *i*).

    Each iteration expands ONLY the newest fetch batch (links from
    older documents are already queued — incremental expansion is
    what keeps iteration cost proportional to the new batch, not the
    whole corpus), folds the discoveries into the pending queue
    (``n_referrers`` sums across batches: every document is expanded
    exactly once, so per-batch distinct-referrer counts are disjoint),
    drops anything crawled since it was queued, then selects the next
    fetch batch deterministically — highest ``n_referrers`` first,
    URL as the tie-break — under ``page_budget`` and the optional
    per-host cap. ``fetch_fn(urls_df) -> docs-shaped frame`` executes
    the batch (live: the politeness-throttled fetchers in
    ``sources/http_fetcher``; tests inject a synthetic web). A URL
    the fetcher returns no record for leaves the queue (a later
    REdiscovery re-queues it — the retry policy lives in the fetcher,
    not here); a fetched 3xx record re-enters through
    ``frontier_expand``'s ``location`` branch, so redirect chains are
    followed hop by hop with one fetch each.

    ``robots_fn(hosts: list[str]) -> DataFrame`` (optional) is the
    robots HOP for hosts discovered mid-crawl: called each iteration
    with the candidate set's hosts, it must return the UPDATED robots
    frame covering them (live: ``RobotsFetcher.fetch(hosts)`` — its
    ledger makes repeats free — then re-read ``robots_spool_frame``).
    With it, permission filtering always runs against fetched robots
    and the queue never holds a URL the agent may not fetch; without
    it, robots stay as seeded and unknown hosts fall to
    ``robots_allowed``'s default-ALLOW no-match rule (round-13
    review — fine for closed corpora whose robots frame is complete,
    wrong for an open live crawl). The host listing is one bounded
    driver-side collect per iteration (distinct hosts of one
    iteration's discoveries — the same boundary the fetcher daemons
    already are).

    Scale shape: the loop is the pagerank pattern — per-iteration
    equi-joins/aggregations on the url key, ``localCheckpoint`` on
    the four frames consumed across iterations (corpus, queue, the
    selected batch, the fetched batch — the fetch batch is consumed
    by BOTH the corpus union and the next iteration's expansion, so
    an uncheckpointed fetch plan would re-execute the fetch work
    wholesale; round-13 review) to cut lineage growth; nothing
    quadratic, no driver-side row data beyond one emptiness probe
    per iteration plus the optional host listing."""
    if max_iters < 0:
        raise ValueError(f"max_iters must be >= 0; got {max_iters}")
    if page_budget < 1:
        raise ValueError(f"page_budget must be >= 1; got {page_budget}")
    if per_host_cap is not None and per_host_cap < 1:
        raise ValueError(
            f"per_host_cap must be >= 1; got {per_host_cap}"
        )
    docs = seed_docs.withColumn("depth", F.lit(0))
    new = docs
    pending: "DataFrame | None" = None
    for i in range(1, max_iters + 1):
        cand = frontier_candidates(
            new.drop("depth"),
            crawled=docs.select(F.col("uri").alias("url")),
        )
        if robots_fn is not None:
            # consumed twice below (host listing + permission filter);
            # lazy — the host-listing collect materializes it.
            cand = cand.localCheckpoint(eager=False)
            hosts = [
                r.h
                for r in cand.select(_host_col().alias("h"))
                .where(F.col("h") != "")
                .distinct()
                .collect()
            ]
            robots = robots_fn(hosts)
        discovered = frontier_expand(
            None, robots, agent, candidates=cand
        )
        pending = (
            discovered
            if pending is None
            else pending.unionByName(discovered)
            .groupBy("url")
            .agg(F.sum("n_referrers").alias("n_referrers"))
        )
        pending = pending.join(
            docs.select(F.col("uri").alias("url")), "url", "left_anti"
        )
        take = pending
        if per_host_cap is not None:
            take = _apply_host_cap(
                take, per_host_cap, [F.desc("n_referrers"), "url"]
            )
        take = (
            take.orderBy(F.desc("n_referrers"), "url")
            .limit(page_budget)
            .localCheckpoint()
        )
        if take.isEmpty():
            break
        new = (
            fetch_fn(take.select("url"))
            .withColumn("depth", F.lit(i))
            .localCheckpoint()
        )
        docs = docs.unionByName(new).localCheckpoint()
        pending = pending.join(
            take.select("url"), "url", "left_anti"
        ).localCheckpoint()
    return docs
