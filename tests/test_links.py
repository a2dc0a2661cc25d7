"""Outlink extraction (operators/text.extract_links / document_links)
and RFC 3986 reference resolution (resolve_url_ref), differential-
tested against the stdlib's urljoin over the reference-resolution
case battery."""

from __future__ import annotations

from urllib.parse import urljoin

from pyspark.sql import functions as F


def test_resolve_url_ref_matches_urljoin(spark):
    cases = [
        ("https://h.example/a/b/c.html", "d.html"),
        ("https://h.example/a/b/c.html", "./d.html"),
        ("https://h.example/a/b/c.html", "../d.html"),
        ("https://h.example/a/b/c.html", "../../d.html"),
        ("https://h.example/a/b/c.html", "../../../d.html"),  # clamp
        ("https://h.example/a/b/c.html", "/root.html"),
        ("https://h.example/a/b/c.html", "//other.site/x"),
        ("https://h.example/a/b/c.html", "http://abs.site/y"),
        ("https://h.example/a/b/c.html", "?q=1"),
        ("https://h.example/a/b/c.html", "d.html?q=1&r=2"),
        ("https://h.example", "x.html"),
        ("https://h.example/", "x.html"),
        ("https://h.example/a/", "x/y/../z.html"),
        ("https://h.example/a/b", ".."),
        ("http://h.example/dir/", "sub/"),
        ("https://h.example/a/b/", "../.."),
    ]
    from nextbus2pg_spark.operators.text import resolve_url_ref

    df = spark.createDataFrame(cases, "base string, ref string")
    got = {
        (r.base, r.ref): r.out
        for r in df.select(
            "base", "ref",
            resolve_url_ref(F.col("base"), F.col("ref")).alias("out"),
        ).collect()
    }
    for base, ref in cases:
        want = urljoin(base, ref)
        assert got[(base, ref)] == want, (base, ref, got[(base, ref)], want)


def test_extract_links_and_document_links(spark):
    from nextbus2pg_spark.operators.text import document_links

    html = (
        '<html><body>'
        '<a href="next.html">next</a>'
        "<a href='/abs/path'>abs</a>"
        '<a href="https://other.site/x?k=1">ext</a>'
        '<a href="#frag">frag-only (dropped)</a>'
        '<a href="javascript:void(0)">js (dropped)</a>'
        '<a href="mailto:a@b.c">mail (dropped)</a>'
        '<link rel="stylesheet" href="../style.css">'
        '<img alt="x" src="img/pic.png">'
        '<script src="//cdn.site/lib.js"></script>'
        '<a href="next.html">duplicate (deduped)</a>'
        '</body></html>'
    )
    docs = spark.createDataFrame(
        [("https://h.example/a/b/page.html", html),
         ("https://h.example/empty", "<p>no links</p>"),
         ("https://h.example/nullc", None)],
        "uri string, content string",
    )
    rows = document_links(docs).collect()
    got = {(r.uri, r.link) for r in rows}
    base = "https://h.example/a/b/page.html"
    assert got == {
        (base, "https://h.example/a/b/next.html"),
        (base, "https://h.example/abs/path"),
        (base, "https://other.site/x?k=1"),
        (base, "https://h.example/a/style.css"),
        (base, "https://h.example/a/b/img/pic.png"),
        (base, "https://cdn.site/lib.js"),
    }
    # shuffle-free, Python-free plan (the frontier owns the dedup
    # shuffle downstream)
    plan = document_links(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_resolve_url_ref_random_differential_vs_urljoin(spark):
    """Seeded-random relative references (dot-segment-heavy) against
    the stdlib resolver — the battery above pins the named cases, this
    sweeps the space. Empty refs and fragments are excluded: 
    extract_links filters them before resolution ever runs."""
    import random

    from nextbus2pg_spark.operators.text import resolve_url_ref

    rng = random.Random(1303)
    segs = ["a", "bb", "c1", ".", ".."]
    cases = []
    for _ in range(120):
        base_path = "/".join(rng.choice(["a", "bb", "c"]) for _ in
                             range(rng.randrange(0, 4)))
        base = "https://host.example/" + base_path
        if base_path and rng.random() < 0.5:
            base += "/"
        depth = rng.randrange(1, 6)
        ref = "/".join(rng.choice(segs) for _ in range(depth))
        if rng.random() < 0.3:
            ref = "/" + ref
        if rng.random() < 0.3:
            ref += "/"
        cases.append((base, ref))
    df = spark.createDataFrame(cases, "base string, ref string")
    got = [
        r.out
        for r in df.select(
            resolve_url_ref(F.col("base"), F.col("ref")).alias("out")
        ).collect()
    ]
    for (base, ref), out in zip(cases, got):
        want = urljoin(base, ref)
        assert out == want, (base, ref, out, want)
