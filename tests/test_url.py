"""URL canonicalization operators (operators/url.py): hand-written
expected values for the full normalization contract, plus the dedup
and domain-cap composites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nextbus2pg_spark.operators.url import (
    domain_cap,
    normalize_url,
    registrable_domain,
    url_dedup,
    url_host,
)

CASES = [
    # (raw, normalized, host, registrable domain)
    ("  HTTPS://WWW.Web.EXAMPLE.COM:443/  ",
     "https://web.example.com", "web.example.com", "example.com"),
    ("http://news.example.co.uk:80/docs/42?utm_source=x&b=2&a=1",
     "http://news.example.co.uk/docs/42?a=1&b=2",
     "news.example.co.uk", "example.co.uk"),
    ("HTTP://Books.Example.COM/A/b/7#sec",
     "http://books.example.com/A/b/7", "books.example.com", "example.com"),
    ("https://sub.wiki.example.org/p?id=9&utm_campaign=c&ref=r",
     "https://sub.wiki.example.org/p?id=9",
     "sub.wiki.example.org", "example.org"),
    ("https://x.com/?utm_medium=email", "https://x.com", "x.com", "x.com"),
    ("http://x.com", "http://x.com", "x.com", "x.com"),
    # scheme+authority lowercase, path case PRESERVED
    ("ftp://Mixed.Case.Host/Path",
     "ftp://mixed.case.host/Path", "mixed.case.host", "case.host"),
    # no scheme: passes through untouched, host/domain empty
    ("no-scheme/path?a=1", "no-scheme/path?a=1", "", ""),
    ("https://a.b.c.co.uk/deep?z=1&y=2&fbclid=abc&gclid=q",
     "https://a.b.c.co.uk/deep?y=2&z=1", "a.b.c.co.uk", "c.co.uk"),
    # non-default port kept; ':80' inside the PATH untouched; empty
    # trailing param dropped
    ("http://www.only.com:8080/keep:80?ref=z&",
     "http://only.com:8080/keep:80", "only.com", "only.com"),
]


def test_normalize_host_domain_table(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "u string")
    out = (
        df.select("u", normalize_url(F.col("u")).alias("norm"))
        .withColumn("host", url_host(F.col("norm")))
        .withColumn("domain", registrable_domain(F.col("host")))
    )
    got = {r["u"]: (r["norm"], r["host"], r["domain"]) for r in out.collect()}
    for raw, norm, host, dom in CASES:
        assert got[raw] == (norm, host, dom), raw


def test_normalization_is_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) — canonical forms are
    fixed points, so re-running a pipeline never churns keys."""
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "u string")
    out = df.select(
        normalize_url(F.col("u")).alias("once"),
    ).select("once", normalize_url(F.col("once")).alias("twice"))
    for r in out.collect():
        assert r["once"] == r["twice"]


def test_url_dedup_collapses_aliases(spark):
    """Tracking params, case, www, default ports: all alias forms of
    one resource collapse to a single deterministic survivor."""
    rows = [
        ("https://x.com/a?utm_source=1", 3),
        ("HTTPS://WWW.X.COM:443/a", 1),
        ("https://x.com/a", 2),
        ("https://x.com/b", 9),
    ]
    df = spark.createDataFrame(rows, "url string, prio int")
    out = url_dedup(df, "url", ["prio"]).orderBy("norm_url").collect()
    assert [(r["norm_url"], r["prio"]) for r in out] == [
        ("https://x.com/a", 1),
        ("https://x.com/b", 9),
    ]


def test_domain_cap_keeps_top_n(spark):
    rows = [(f"https://www.heavy.com/p{i}?utm_source=s", i) for i in range(10)]
    rows += [("https://light.org/only", 99)]
    df = spark.createDataFrame(rows, "url string, rank int")
    out = domain_cap(df, "url", max_per_domain=3, order_col="rank")
    by_dom = {}
    for r in out.collect():
        by_dom.setdefault(r["domain"], []).append(r["rank"])
    assert sorted(by_dom["heavy.com"]) == [0, 1, 2]
    assert by_dom["light.org"] == [99]


def test_url_dedup_null_urls_pass_through(spark):
    """NULL urls are missing keys, not one shared resource — they must
    NOT collapse into a single survivor (regression)."""
    rows = [(None, 1), (None, 2), ("https://x.com/a", 3)]
    df = spark.createDataFrame(rows, "url string, prio int")
    out = url_dedup(df, "url", ["prio"]).collect()
    assert len(out) == 3
    assert sorted(r["prio"] for r in out if r["norm_url"] is None) == [1, 2]


def test_tracking_prefix_is_literal_not_wildcard(spark):
    """'utm_' matches literally: 'utmx=2' (no underscore) survives;
    'utm_x=1' is dropped. Guards the LIKE-wildcard hazard in the
    DuckDB oracle (utm\\_% ESCAPE) staying aligned with Spark's
    literal startswith."""
    df = spark.createDataFrame(
        [("https://x.com/p?utmx=2&utm_x=1&b=1",)], "u string"
    )
    got = df.select(normalize_url(F.col("u")).alias("n")).first()["n"]
    assert got == "https://x.com/p?b=1&utmx=2"


def test_normalize_url_differential_vs_duckdb(spark):
    """Seeded-random structured URLs through BOTH engines: the Spark
    operator chain and the oracle's DuckDB CTE chain
    (plans/curation._URL_NORM_CTES) must agree byte-for-byte on
    normalized url, host, and domain — the portability contract the
    fixture query relies on, exercised far beyond the fixture's four
    shapes."""
    import random

    import duckdb

    from nextbus2pg_spark.plans.curation import _URL_NORM_CTES

    rnd = random.Random(20260814)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://", "ftp://", ""]
    hosts = [
        "Example.COM", "www.example.com", "WWW.Sub.Example.ORG",
        "a.b.co.uk", "x.com", "deep.sub.domain.example.com.au",
        "single", "UPPER.CASE.NET",
    ]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b/C", "/docs/42", "/p/"]
    queries = [
        "", "?a=1", "?b=2&a=1", "?utm_source=x", "?utm_source=x&z=9",
        "?fbclid=f&gclid=g&keep=1", "?ref=r&", "?utmx=2&utm_x=1",
        "?z=1&y=1&z=1",
    ]
    frags = ["", "#frag", "#a/b?c=1"]
    urls = []
    for i in range(200):
        u = (
            rnd.choice(schemes) + rnd.choice(hosts) + rnd.choice(ports)
            + rnd.choice(paths) + rnd.choice(queries) + rnd.choice(frags)
        )
        if i % 7 == 0:
            u = "  " + u + " "
        urls.append((i, u))

    from nextbus2pg_spark.operators.url import (
        normalize_url,
        registrable_domain,
        url_host,
    )

    df = spark.createDataFrame(urls, "doc_id long, u string")
    got = {
        r["doc_id"]: (r["norm_url"], r["host"], r["domain"])
        for r in df.select(
            "doc_id", normalize_url(F.col("u")).alias("norm_url")
        )
        .withColumn("host", url_host(F.col("norm_url")))
        .withColumn("domain", registrable_domain(F.col("host")))
        .collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", urls)
    sql = (
        "WITH raw AS (SELECT doc_id, u FROM src),\n"
        + _URL_NORM_CTES
        + "SELECT doc_id, norm_url, host, domain FROM normed"
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in con.sql(sql).fetchall()}
    assert set(got) == set(want)
    bad = {i: (got[i], want[i], urls[i][1]) for i in got if got[i] != want[i]}
    assert not bad, f"{len(bad)} diverging urls, first: {sorted(bad.items())[0]}"


def test_output_column_collisions_raise(spark):
    """domain_cap/url_dedup refuse an input that already has their
    output column name (silent duplicate/ambiguous columns otherwise);
    the name is a parameter, so callers can pick a fresh one."""
    import pytest

    from nextbus2pg_spark.operators.url import domain_cap, url_dedup

    df = spark.createDataFrame(
        [("http://a.com/x", "keep", 1)], "u string, domain string, q int"
    )
    with pytest.raises(ValueError, match="domain"):
        domain_cap(df, "u", 1, "q")
    out = domain_cap(df, "u", 1, "q", domain_col="site_domain")
    assert "site_domain" in out.columns and out.count() == 1

    df2 = spark.createDataFrame(
        [("http://a.com/x", "taken")], "u string, norm_url string"
    )
    with pytest.raises(ValueError, match="norm_url"):
        url_dedup(df2, "u", ["u"])
    out2 = url_dedup(df2, "u", ["u"], out_col="canon_url")
    assert "canon_url" in out2.columns and out2.count() == 1


def test_public_suffix_override_hook(spark):
    """The known-gap escape hatch: pass a wider second-level-suffix
    set and previously mis-grouped hosts (or.jp, id.au) regroup at the
    right granularity without touching the frozen default."""
    from nextbus2pg_spark.operators.url import registrable_domain

    hosts = spark.createDataFrame(
        [("x.example.or.jp",), ("y.shop.id.au",), ("z.news.co.uk",)],
        "h string",
    )
    default = {
        r.h: r.d
        for r in hosts.select(
            "h", registrable_domain(F.col("h")).alias("d")
        ).collect()
    }
    # default subset misses or/id: grouped one label too coarse
    assert default["x.example.or.jp"] == "or.jp"
    assert default["y.shop.id.au"] == "id.au"
    assert default["z.news.co.uk"] == "news.co.uk"

    widened = {
        r.h: r.d
        for r in hosts.select(
            "h",
            registrable_domain(
                F.col("h"),
                second_level_suffixes=("co", "com", "or", "id"),
            ).alias("d"),
        ).collect()
    }
    assert widened["x.example.or.jp"] == "example.or.jp"
    assert widened["y.shop.id.au"] == "shop.id.au"
    assert widened["z.news.co.uk"] == "news.co.uk"


def test_psl_registrable_domain_exact_semantics(spark):
    """Exact publicsuffix.org semantics against a rule table: plain
    rules, MULTI-LABEL rules (pref.aichi.jp), long-tail country rules
    (gob.mx), wildcard rules (*.ck), exception rules (!www.ck),
    private-registry rules (github.io), the implicit '*' fallback, and
    NULL for a host that IS a public suffix."""
    from nextbus2pg_spark.operators.url import psl_registrable_domain

    psl = spark.createDataFrame(
        [("// comment line",), ("",), ("com",), ("uk",), ("co.uk",),
         ("jp",), ("aichi.jp",), ("pref.aichi.jp",), ("mx",), ("gob.mx",),
         ("ck",), ("*.ck",), ("!www.ck",), ("io",), ("github.io",)],
        "suffix string",
    )
    hosts = [
        ("a.example.com", "example.com"),       # plain 1-label rule
        ("example.com", "example.com"),
        ("deep.sub.foo.co.uk", "foo.co.uk"),    # 2-label rule
        ("city.pref.aichi.jp", "city.pref.aichi.jp"),  # 3-label rule wins
        ("x.city.pref.aichi.jp", "city.pref.aichi.jp"),
        ("tramites.gob.mx", "tramites.gob.mx"), # gob.mx, not just mx
        ("foo.bar.ck", "foo.bar.ck"),           # *.ck: bar.ck is a PS
        ("www.ck", "www.ck"),                   # !www.ck exception
        ("sub.www.ck", "www.ck"),               # exception beats *.ck
        ("user.github.io", "user.github.io"),   # private registry
        ("host.unknowntld", "host.unknowntld"), # implicit '*' fallback
        ("co.uk", None),                        # bare public suffix
        ("com", None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {
        r["host"]: r["domain"]
        for r in psl_registrable_domain(df, "host", psl).collect()
    }
    assert got == dict(hosts), got


def test_psl_domain_cap_and_fallback_heuristic(spark):
    """domain_cap with a PSL frame groups by the exact domain (gob.mx
    subdomains collapse into one registrable domain, capped together);
    without it the heuristic path is unchanged."""
    from nextbus2pg_spark.operators.url import domain_cap

    psl = spark.createDataFrame(
        [("mx",), ("gob.mx",)], "suffix string"
    )
    rows = [
        (i, f"http://s{i}.tramites.gob.mx/page") for i in range(5)
    ] + [(10, "http://other.gob.mx/x"), (11, "http://other.gob.mx/y")]
    df = spark.createDataFrame(rows, "doc_id long, url string")

    capped = domain_cap(
        df, "url", max_per_domain=2, order_col="doc_id", suffixes=psl
    )
    got = {(r["doc_id"], r["domain"]) for r in capped.collect()}
    assert got == {
        (0, "tramites.gob.mx"), (1, "tramites.gob.mx"),
        (10, "other.gob.mx"), (11, "other.gob.mx"),
    }, got

    # heuristic path (no PSL): gob.mx is outside the 7-label subset, so
    # everything groups under the 2-label tail gob.mx — the documented
    # known-gap the PSL path exists to close
    heur = domain_cap(df, "url", max_per_domain=2, order_col="doc_id")
    assert {r["domain"] for r in heur.collect()} == {"gob.mx"}


def test_psl_output_column_collision_raises(spark):
    from nextbus2pg_spark.operators.url import psl_registrable_domain

    psl = spark.createDataFrame([("com",)], "suffix string")
    df = spark.createDataFrame(
        [("a.com", "x")], "host string, domain string"
    )
    with pytest.raises(ValueError, match="already exists"):
        psl_registrable_domain(df, "host", psl)


def test_psl_case_canonicalization(spark):
    """The PSL algorithm lowercases before matching: an upper-case
    host must resolve against lower-case rules (and emit the
    lower-case canonical domain), not fall through to the implicit
    '*' rule."""
    from nextbus2pg_spark.operators.url import psl_registrable_domain

    psl = spark.createDataFrame(
        [("uk",), ("co.uk",), ("COM",)], "suffix string"
    )
    df = spark.createDataFrame(
        [("A.B.CO.UK",), ("WWW.Example.COM",)], "host string"
    )
    got = {
        r["host"]: r["domain"]
        for r in psl_registrable_domain(df, "host", psl).collect()
    }
    assert got == {
        "A.B.CO.UK": "b.co.uk",
        "WWW.Example.COM": "example.com",
    }, got


def test_psl_internal_column_collision_raises(spark):
    from nextbus2pg_spark.operators.url import psl_registrable_domain

    psl = spark.createDataFrame([("com",)], "suffix string")
    df = spark.createDataFrame(
        [("a.com", "x")], "host string, __host string"
    )
    with pytest.raises(ValueError, match="internally"):
        psl_registrable_domain(df, "host", psl)


def test_url_trap_features_classes(spark):
    from nextbus2pg_spark.operators.url import url_trap_features

    cases = [
        # url, depth, rep, params, sess, trap
        ("https://ok1.example/a/b/c?x=1", 3, 1, 1, False, False),
        # depth 11 > 8, and segment 'q' repeats 9x
        ("https://d.example/s/q/q/q/q/q/q/q/q/q/end", 11, 9, 0,
         False, True),
        # the calendar-loop signature: 'cal' 3x at depth 5
        ("https://c.example/cal/2026/cal/2026/cal?m=3", 5, 3, 1,
         False, True),
        ("https://p.example/i?a=1&b=2&c=3&d=4&e=5&f=6&g=7", 1, 1, 7,
         False, True),
        ("https://s.example/p?jsessionid=77", 1, 1, 1, True, True),
        ("https://l.example/" + "x" * 260, 1, 1, 0, False, True),
        ("https://e.example", 0, 0, 0, False, False),
        # session param survives a trailing fragment
        ("https://e.example/?sid=1#f", 0, 0, 1, True, True),
        # 'mysid=' must NOT match the session-name list
        ("https://e.example/?mysid=1", 0, 0, 1, False, False),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    got = (
        df.select("url", url_trap_features(F.col("url")).alias("t"))
        .select("url", "t.*")
        .collect()
    )
    by_url = {r.url: r for r in got}
    for u, depth, rep, params, sess, trap in cases:
        r = by_url[u]
        assert (
            r.path_depth, r.max_segment_repeat, r.n_params,
            r.has_session_param, r.is_trap,
        ) == (depth, rep, params, sess, trap), u
        assert r.url_len == len(u)
