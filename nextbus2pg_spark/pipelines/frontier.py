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


def frontier_expand(
    docs: DataFrame,
    robots: DataFrame,
    agent: str,
    crawled: "DataFrame | None" = None,
    per_host_cap: "int | None" = None,
) -> DataFrame:
    """One frontier iteration over a ``warc_documents``-shaped frame →
    ``(url, n_referrers)``: the distinct outlink set of the parsed
    corpus, minus URLs already crawled (under any redirect alias),
    filtered to what robots.txt allows, optionally capped per host.

    - ``docs``: parsed documents (``uri``, ``content``,
      ``http_status``, ``location`` columns — the ``warc_documents``
      output). Redirect rows contribute their TARGET as a discovered
      link (a 301 page has no body to extract from, but its Location
      is exactly a discovered URL).
    - ``crawled``: optional frame with a ``url`` column — URLs to
      exclude. The doc frame's own URIs are always excluded: a
      crawled 301 is never re-fetched (its record IS the verdict),
      while its TARGET stays fetchable until some record holds that
      content — excluding the whole chain would starve the frontier
      of exactly the move it just discovered; re-fetching the OLD end
      is the round-13 verdict's re-fetch bug, and the uri exclusion
      closes it.
    - ``per_host_cap``: keep at most N URLs per host (deterministic:
      lowest ``url`` first) — the frontier-side half of politeness;
      the fetch-side half is ``HostThrottle``.

    ``n_referrers`` (distinct referring documents) rides along as the
    standard crawl prioritization signal."""
    from nextbus2pg_spark.operators.text import document_links
    from nextbus2pg_spark.sources.robots import (
        robots_allowed,
        robots_rules,
    )

    # discovered links: page outlinks + redirect targets (a 301 has no
    # body, but its Location is exactly a discovered URL — and chains
    # crawled across multiple records chain naturally: each hop's
    # record contributes the next hop)
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
    # already-held URLs: every crawled record's URI (content pages AND
    # redirect verdicts), plus the caller's ledger
    held = docs.select(F.col("uri").alias("url"))
    if crawled is not None:
        held = held.unionByName(crawled.select("url"))
    fresh = candidates.join(held.distinct(), "url", "left_anti")
    rules = robots_rules(robots, agent)
    verdicts = robots_allowed(fresh.select("url"), rules)
    out = fresh.join(verdicts.where(F.col("allowed")), "url", "left_semi")
    if per_host_cap is not None:
        if per_host_cap < 1:
            raise ValueError(
                f"per_host_cap must be >= 1; got {per_host_cap}"
            )
        from pyspark.sql import Window

        host = F.lower(
            F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
        )
        rn = F.row_number().over(
            Window.partitionBy(host).orderBy("url")
        )
        out = (
            out.withColumn("__rn", rn)
            .where(F.col("__rn") <= per_host_cap)
            .drop("__rn")
        )
    return out


def _host_col(url: "str | Column" = "url") -> Column:
    return F.lower(
        F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    )


def crawl_loop(
    seed_docs: DataFrame,
    robots: DataFrame,
    agent: str,
    fetch_fn,
    max_iters: int = 3,
    page_budget: int = 1000,
    per_host_cap: "int | None" = None,
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

    Scale shape: the loop is the pagerank pattern — per-iteration
    equi-joins/aggregations on the url key, ``localCheckpoint`` on
    the three frames consumed across iterations (corpus, queue, the
    selected batch) to cut lineage growth; nothing quadratic, no
    driver-side row data beyond one emptiness probe per iteration.
    Robots filtering happens at DISCOVERY (inside
    :func:`frontier_expand`), so the queue never holds a URL the
    agent may not fetch."""
    if max_iters < 0:
        raise ValueError(f"max_iters must be >= 0; got {max_iters}")
    if page_budget < 1:
        raise ValueError(f"page_budget must be >= 1; got {page_budget}")
    docs = seed_docs.withColumn("depth", F.lit(0))
    new = docs
    pending: "DataFrame | None" = None
    for i in range(1, max_iters + 1):
        discovered = frontier_expand(
            new.drop("depth"),
            robots,
            agent,
            crawled=docs.select(F.col("uri").alias("url")),
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
            if per_host_cap < 1:
                raise ValueError(
                    f"per_host_cap must be >= 1; got {per_host_cap}"
                )
            from pyspark.sql import Window

            rn = F.row_number().over(
                Window.partitionBy(_host_col()).orderBy(
                    F.desc("n_referrers"), "url"
                )
            )
            take = (
                take.withColumn("__rn", rn)
                .where(F.col("__rn") <= per_host_cap)
                .drop("__rn")
            )
        take = (
            take.orderBy(F.desc("n_referrers"), "url")
            .limit(page_budget)
            .localCheckpoint()
        )
        if take.isEmpty():
            break
        new = fetch_fn(take.select("url")).withColumn("depth", F.lit(i))
        docs = docs.unionByName(new).localCheckpoint()
        pending = pending.join(
            take.select("url"), "url", "left_anti"
        ).localCheckpoint()
    return docs
