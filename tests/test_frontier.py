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
