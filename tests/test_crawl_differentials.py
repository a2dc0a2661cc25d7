"""Differential property tests for the round-13 extraction operators
against independent stdlib references: extract_anchors vs an
html.parser-based collector, url_trap_features vs a urlsplit-based
recomputation. Generation is constrained to well-formed markup and the
six named entities (the operators' documented scope); within it, the
stdlib reference and the JVM expression chain must agree exactly."""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.sampled_from(["alpha", "beta", "Gamma", "x1", "ü2", "&amp;"]),
    min_size=0,
    max_size=4,
)
_hrefs = st.one_of(
    st.sampled_from(
        [
            "a.html",
            "sub/b.html",
            "../up.html",
            "/root/c.html",
            "https://ext.example/x",
            "//cdn.example/y.js",
            "#frag",
            "javascript:void(0)",
        ]
    ),
)
_anchors = st.lists(
    st.tuples(_hrefs, _words, st.booleans()),  # (href, words, bold?)
    min_size=0,
    max_size=8,
)


class _AnchorCollector(HTMLParser):
    """Independent reference: collect (href, flattened text) per <a>."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out = []
        self._href = None
        self._buf = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._href = dict(attrs).get("href")
            self._buf = []

    def handle_data(self, data):
        if self._href is not None:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            self.out.append((self._href, " ".join(self._buf)))
            self._href = None


@given(anchors=_anchors)
@_SETTINGS
def test_extract_anchors_matches_htmlparser_reference(spark, anchors):
    from nextbus2pg_spark.operators.text import document_anchors

    base = "https://site.example/dir/page.html"
    html = "".join(
        '<a href="{h}">{t}</a>'.format(
            h=h,
            t=(
                "<b>" + " ".join(w) + "</b>"
                if bold
                else " ".join(w)
            ),
        )
        for h, w, bold in anchors
    )
    docs = spark.createDataFrame(
        [(base, html)], "uri string, content string"
    )
    got = {
        (r.link, r.anchor) for r in document_anchors(docs).collect()
    }

    ref = _AnchorCollector()
    ref.feed(html)
    expect = set()
    for href, text in ref.out:
        if href is None:
            continue
        h = href.split("#")[0]
        if not h or h.lower().startswith(
            ("javascript:", "mailto:", "data:", "tel:")
        ):
            continue
        # whitespace collapse + trim, matching the operator; the
        # parser already decoded &amp; (generation is scoped to the
        # six named entities the operator handles)
        anchor = " ".join(text.split())
        expect.add((urljoin(base, h), anchor))
    assert got == expect, (html, got, expect)


_SESSION_NAMES = (
    "phpsessid", "jsessionid", "sessionid", "session_id", "sid",
    "cfid", "cftoken", "zenid",
)
_segs = st.lists(
    st.sampled_from(["a", "b", "cal", "2026", "x-y", "idx"]),
    min_size=0,
    max_size=12,
)
_params = st.lists(
    st.sampled_from(
        ["q=1", "page=2", "jsessionid=77", "sid=9", "mysid=1", "flag"]
    ),
    min_size=0,
    max_size=9,
)


@given(segs=_segs, params=_params, longtail=st.booleans())
@_SETTINGS
def test_url_trap_features_match_urlsplit_reference(
    spark, segs, params, longtail
):
    from nextbus2pg_spark.operators.url import url_trap_features

    path = "/" + "/".join(segs) if segs else ""
    if longtail:
        path += "/" + "z" * 260
    query = "&".join(params)
    url = "https://h.example" + path + ("?" + query if query else "")
    df = spark.createDataFrame([(url,)], "url string")
    r = (
        df.select(url_trap_features(F.col("url")).alias("t"))
        .select("t.*")
        .collect()[0]
    )

    sp = urlsplit(url)
    psegs = [s for s in sp.path.split("/") if s]
    depth = len(psegs)
    rep = max((psegs.count(s) for s in psegs), default=0)
    qparts = [p for p in sp.query.split("&") if p]
    sess = any(
        p.lower().startswith(n + "=")
        for p in qparts
        for n in _SESSION_NAMES
    )
    trap = (
        depth > 8
        or rep >= 3
        or len(qparts) > 6
        or sess
        or len(url) > 250
    )
    assert (
        r.path_depth, r.max_segment_repeat, r.n_params,
        r.has_session_param, r.url_len, r.is_trap,
    ) == (depth, rep, len(qparts), sess, len(url), trap), url
