"""Frontier expansion (pipelines/frontier.py): outlinks + redirect
targets, minus held aliases, robots-filtered, per-host capped."""

from __future__ import annotations

from pyspark.sql import functions as F


def _doc(uri, content=None, status="HTTP/1.1 200 OK", location=None):
    return (1, f"urn:{uri}", "response", uri, "2026-03-01T00:00:00Z",
            None, None, status, len(content or "") or None, content,
            None, location, None)


_SCHEMA = (
    "archive_id long, record_id string, warc_type string, uri string,"
    " warc_date string, refers_to string, payload_digest string,"
    " http_status string, content_length int, content string,"
    " content_encoding string, location string, parse_error string"
)


def test_frontier_expand_end_to_end(spark):
    from nextbus2pg_spark.pipelines.frontier import frontier_expand

    docs = spark.createDataFrame(
        [
            _doc(
                "https://a.example/p/1",
                '<a href="/p/2">x</a><a href="/p/1">self</a>'
                '<a href="https://b.example/q/1">b</a>'
                '<a href="https://a.example/private/x">priv</a>'
                '<a href="https://moved.example/old">moved</a>',
            ),
            # a crawled redirect: its TARGET is a discovered link, and
            # BOTH its ends count as held (never re-fetched)
            _doc(
                "https://moved.example/old",
                None,
                status="HTTP/1.1 301 Moved Permanently",
                location="https://moved.example/new",
            ),
            # ...but another page linking the OLD url must not revive it
            _doc(
                "https://b.example/q/9",
                '<a href="https://moved.example/old">stale link</a>'
                '<a href="https://b.example/q/1">b again</a>',
            ),
        ],
        _SCHEMA,
    )
    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /private\n"),
            ("b.example", "User-agent: *\nDisallow:\n"),
            ("moved.example", "User-agent: *\nDisallow:\n"),
        ],
        "domain string, robots_txt string",
    )
    out = {
        r.url: r.n_referrers
        for r in frontier_expand(docs, robots, agent="databot").collect()
    }
    assert out == {
        "https://a.example/p/2": 1,
        "https://b.example/q/1": 2,       # two referring documents
        "https://moved.example/new": 1,   # the redirect's target
    }
    # 'https://moved.example/old' is held (it WAS crawled — a 301),
    # '/p/1' is held (self), '/private/x' is robots-disallowed.

    # crawled-set exclusion + per-host cap
    crawled = spark.createDataFrame(
        [("https://moved.example/new",)], "url string"
    )
    out2 = sorted(
        r.url
        for r in frontier_expand(
            docs, robots, agent="databot", crawled=crawled,
            per_host_cap=1,
        ).collect()
    )
    assert out2 == [
        "https://a.example/p/2",
        "https://b.example/q/1",
    ]

    # plan shape: equi-joins only, rules broadcast, no cartesian
    plan = (
        frontier_expand(docs, robots, agent="databot")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_crawl_loop_differential_vs_python_bfs(spark):
    """crawl_loop (queue semantics: incremental expansion, n_referrers
    accumulation, budget + per-host-cap selection, dead links leaving
    the queue, redirects followed hop-by-hop) vs an independent Python
    BFS reference over the same synthetic web."""
    from nextbus2pg_spark.pipelines.frontier import crawl_loop

    hosts = ["a.test", "b.test", "c.test"]
    web = {}  # url -> (links list, location or None)
    for hi, h in enumerate(hosts):
        nxt = hosts[(hi + 1) % len(hosts)]
        for j in range(20):
            u = f"https://{h}/p{j}"
            links = [
                f"https://{h}/p{(j + 1) % 20}",
                f"https://{h}/p{(j + 2) % 20}",
                f"https://{nxt}/p{(j * 3) % 20}",
                f"https://{h}/priv/{j}",     # robots-blocked
                f"https://{h}/dead/{j}",     # not in the web: dropped
                f"https://{h}/r{j}",         # redirect page
            ]
            web[u] = (links, None)
            web[f"https://{h}/r{j}"] = ([], f"https://{h}/p{(j + 5) % 20}")

    rows = []
    for u, (links, loc) in web.items():
        content = (
            None
            if loc is not None
            else "".join(f'<a href="{l}">x</a>' for l in links)
        )
        rows.append((u, content, 301 if loc else 200, loc))
    schema = "uri string, content string, http_status int, location string"
    web_df = spark.createDataFrame(rows, schema).cache()
    robots = spark.createDataFrame(
        [(h, "User-agent: *\nDisallow: /priv/") for h in hosts],
        "domain string, robots_txt string",
    )
    seeds = ["https://a.test/p0", "https://b.test/p0"]
    seed_df = web_df.where(F.col("uri").isin(seeds))

    def fetch_fn(urls):
        return urls.join(
            web_df, urls.url == web_df.uri, "inner"
        ).select("uri", "content", "http_status", "location")

    BUDGET, CAP, ITERS = 13, 5, 3
    got = {
        (r.uri, r.depth)
        for r in crawl_loop(
            seed_df, robots, "databot", fetch_fn,
            max_iters=ITERS, page_budget=BUDGET, per_host_cap=CAP,
        ).collect()
    }

    # --- independent reference ---------------------------------------
    from urllib.parse import urlsplit

    def allowed(url):
        return not urlsplit(url).path.startswith("/priv/")

    docs = {u: 0 for u in seeds}
    new = list(seeds)
    pending = {}
    for i in range(1, ITERS + 1):
        disc = {}
        for u in new:
            links, loc = web[u]
            found = set(links) if loc is None else set()
            if loc is not None:
                found.add(loc)
            for l in found:
                disc[l] = disc.get(l, 0) + 1
        for l, n in disc.items():
            if l not in docs and allowed(l):
                pending[l] = pending.get(l, 0) + n
        for l in list(pending):
            if l in docs:
                del pending[l]
        by_host = {}
        for l, n in sorted(
            pending.items(), key=lambda kv: (-kv[1], kv[0])
        ):
            by_host.setdefault(urlsplit(l).netloc.lower(), []).append(l)
        capped = {l for ls in by_host.values() for l in ls[:CAP]}
        take = sorted(
            (l for l in pending if l in capped),
            key=lambda l: (-pending[l], l),
        )[:BUDGET]
        if not take:
            break
        new = []
        for l in take:
            del pending[l]
            if l in web:
                docs[l] = i
                new.append(l)
    assert got == set(docs.items())
    # the budget actually bound and the crawl actually went deep
    assert max(d for _, d in got) == ITERS
    assert len(got) < len(web)
