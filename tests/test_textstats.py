"""Corpus-statistics operators (operators/textstats.py)."""

from __future__ import annotations


def test_oov_ngram_ratio_model_and_scoring(spark):
    """Top-k bigram model + OOV scoring: a doc made of the dominant
    bigram scores 0.0; a doc of never-repeated bigrams scores 1.0 when
    the model is saturated by the dominant ones; short docs (< n words)
    are absent."""
    from nextbus2pg_spark.operators.textstats import oov_ngram_ratio

    rows = (
        [(i, "a b a b a b") for i in range(5)]        # 'a b'/'b a' dominate
        + [(100, "x y z w")]                          # all rare bigrams
        + [(200, "solo")]                             # no bigrams
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in oov_ngram_ratio(
        df, "doc_id", "text", n=2, top_k=2
    ).collect()}
    assert 200 not in out
    assert out[0]["oov_ratio"] == 0.0 and out[0]["n_grams"] == 5
    assert out[100]["n_oov"] == 3 and out[100]["oov_ratio"] == 1.0


def test_bm25_duplicate_query_terms_score_once(spark):
    """A repeated query term must not double its contribution: BM25
    scores a term SET, so ['rare', 'rare'] ranks and scores exactly
    like ['rare'] (ADVICE round-5: duplicates silently skewed
    rankings relative to standard BM25)."""
    from nextbus2pg_spark.operators.textstats import bm25_topk

    df = spark.createDataFrame(
        [(1, "rare word here"), (2, "other words entirely"),
         (3, "rare rare filler")],
        "doc_id long, text string",
    )
    once = bm25_topk(df, "doc_id", "text", ["rare"], k=3).collect()
    twice = bm25_topk(df, "doc_id", "text", ["rare", "rare"], k=3).collect()
    assert [r.asDict() for r in once] == [r.asDict() for r in twice]
    assert {r["id"] for r in once} == {1, 3}


def test_bigram_logprob_hand_computed(spark):
    """Laplace bigram LM on a 2-doc corpus, every value hand-derived:
    c(a,b)=2, c(b,a)=1, ctx(a)=2, ctx(b)=1, V=2."""
    import math

    from nextbus2pg_spark.operators.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert 3 not in out  # <2 words: no bigrams, no row
    lp_ab = math.log(3 / 4)   # (2+1)/(2+2)
    lp_ba = math.log(2 / 3)   # (1+1)/(1+2)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["sum_logprob"] == round(lp_ab + lp_ba, 6)
    assert out[1]["avg_logprob"] == round((lp_ab + lp_ba) / 2, 6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["sum_logprob"] == round(lp_ab, 6)
    # repetitive garbage scores below fluent text from the same model
    df2 = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)]
        + [(100, "zz qq zz qq zz")],
        "doc_id long, text string",
    )
    scores = {
        r["id"]: r["avg_logprob"]
        for r in bigram_logprob(df2, "doc_id", "text").collect()
    }
    assert scores[100] < scores[0]


def test_pmi_collocations_hand_computed(spark):
    from nextbus2pg_spark.operators.textstats import pmi_collocations

    # "new york" always co-occurs (3 pairs); "the cat" is incidental.
    docs = spark.createDataFrame(
        [
            (1, "new york is big"),
            (2, "new york wins"),
            (3, "the cat saw new york"),
            (4, "the cat sat"),
        ],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, "doc_id", "text", min_count=2, k=5)
    rows = {(r.w1, r.w2): r for r in out.collect()}
    assert ("new", "york") in rows
    ny = rows[("new", "york")]
    # counts are exact: c_xy=3, c_new=3, c_york=3, N_tokens=15, N_pairs=11
    assert (ny.pair_count, ny.left_count, ny.right_count) == (3, 3, 3)
    expected = ((3 / 11) / (3 / 15)) / (3 / 15)
    assert ny.pmi_ratio == expected
    # PMI favors the RARER perfectly-associated pair: "the cat"
    # (2/2/2 counts -> ratio 225/22) outranks "new york" (3/3/3 ->
    # ratio 75/11) — the well-known low-frequency bias of raw PMI.
    names = [(r.w1, r.w2) for r in out.collect()]
    assert names.index(("the", "cat")) < names.index(("new", "york"))


def test_pmi_collocations_short_docs_emit_no_pairs(spark):
    from nextbus2pg_spark.operators.textstats import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    out = pmi_collocations(docs, "doc_id", "text", min_count=1, k=10)
    assert [(r.w1, r.w2) for r in out.collect()] == [("a", "b")]


def test_rrf_fuse_hand_computed(spark):
    from nextbus2pg_spark.operators.textstats import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "id long, rank int"
    )
    b = spark.createDataFrame(
        [(11, 1), (13, 2)], "id long, rank int"
    )
    out = rrf_fuse([("a", a), ("b", b)], k_const=60, k=10).collect()
    got = {r.doc_id: r for r in out}
    assert got[11].rrf_score == 1.0 / 62 + 1.0 / 61
    assert got[10].rrf_score == 1.0 / 61
    assert got[13].rrf_score == 1.0 / 62
    assert got[13].rank_a is None and got[13].rank_b == 2
    # union-ranked: doc in both lists wins
    assert out[0].doc_id == 11


def test_rrf_fuse_rejects_empty_and_duplicate_names(spark):
    import pytest

    from nextbus2pg_spark.operators.textstats import rrf_fuse

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    a = spark.createDataFrame([(1, 1)], "id long, rank int")
    with pytest.raises(ValueError, match="duplicate"):
        rrf_fuse([("a", a), ("a", a)])


def test_retrieval_metrics_hand_computed(spark):
    """Worked example: q1 retrieves [A(hit), B, C(hit), D, E] with 3
    relevant docs total -> P@5=0.4, R@5=2/3, RR=1, AP=(1/1+2/3)/3.
    q2 retrieves nothing relevant -> all zeros. q3 has relevant docs
    but no results at all -> zero row still emitted."""
    from nextbus2pg_spark.operators.textstats import retrieval_metrics

    results = spark.createDataFrame(
        [("q1", m, r + 1) for r, m in enumerate("ABCDE")]
        + [("q2", m, r + 1) for r, m in enumerate("XYZ")],
        "query_id string, match_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", "A"), ("q1", "C"), ("q1", "Q"),
         ("q2", "Q"), ("q3", "A")],
        "query_id string, match_id string",
    )
    out = {r["query_id"]: r for r in retrieval_metrics(
        results, qrels, k=5
    ).collect()}
    q1 = out["q1"]
    assert (q1["n_relevant"], q1["n_hits"]) == (3, 2)
    assert q1["precision_at_k"] == 0.4
    assert q1["recall_at_k"] == 2 / 3
    assert q1["reciprocal_rank"] == 1.0
    assert q1["average_precision"] == (1 / 1 + 2 / 3) / 3
    q2, q3 = out["q2"], out["q3"]
    for r in (q2, q3):
        assert r["n_hits"] == 0 and r["average_precision"] == 0.0
        assert r["reciprocal_rank"] == 0.0


def test_retrieval_metrics_respects_k_cutoff(spark):
    from nextbus2pg_spark.operators.textstats import retrieval_metrics

    results = spark.createDataFrame(
        [("q", "A", 1), ("q", "B", 7)],
        "query_id string, match_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("q", "A"), ("q", "B")], "query_id string, match_id string"
    )
    r = retrieval_metrics(results, qrels, k=5).collect()[0]
    assert r["n_hits"] == 1  # B at rank 7 is past the cutoff
    assert r["recall_at_k"] == 0.5


def test_perplexity_buckets_head_middle_tail(spark):
    """CCNet bucketing (round 9): fluent repeated-pattern docs score
    high under the corpus-trained bigram LM and land in bucket 1;
    unique-bigram word salad lands in the tail bucket; the cut is
    per-language; <2-word docs emit no row."""
    from nextbus2pg_spark.operators.textstats import perplexity_buckets

    rows = []
    # 6 'en' docs of a common fluent pattern, 3 of unique noise
    for i in range(6):
        rows.append((i, "the cat sat on the mat " * 3, "en"))
    rows.append((6, "zq xv qj wk vn mz pq rs", "en"))
    rows.append((7, "aa bb cc dd ee ff gg hh", "en"))
    rows.append((8, "k1 k2 k3 k4 k5 k6 k7 k8", "en"))
    rows.append((9, "uno dos tres uno dos tres", "fr"))
    rows.append((10, "word", "en"))  # 1 word: no bigrams, no row
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    out = perplexity_buckets(docs, "doc_id", "text", "lang", n_buckets=3)
    got = {r.id: (r.lang, r.bucket) for r in out.collect()}
    assert 10 not in got
    assert got[9] == ("fr", 1)  # sole fr doc: bucket 1 trivially
    en_tail = {i for i, (lg, b) in got.items() if lg == "en" and b == 3}
    assert en_tail <= {6, 7, 8}
    assert all(got[i] == ("en", 1) for i in range(3))  # fluent head

    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(docs, "doc_id", "text", "lang", n_buckets=1)


def test_tokenizer_fertility_bounds(spark):
    """Fertility is >= 1 (every word becomes at least one token) and
    compression is <= the longest word length; languages aggregate
    separately; empty-text docs contribute nothing."""
    from nextbus2pg_spark.operators.bpe import bpe_encode, bpe_train
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "aa bb aa bb aa", "en"),
            (2, "aa aa cc", "en"),
            (3, "zz yy", "fr"),
            (4, None, "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    merges = bpe_train(docs, "text", n_merges=4)
    enc = bpe_encode(docs, "doc_id", "text", merges).select(
        F.col("id").alias("doc_id"), "n_tokens"
    )
    words = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda w: w != "",
    )
    agg = (
        docs.select(
            "doc_id", "lang", F.size(words).alias("w"),
        )
        .join(enc, "doc_id")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("t"), F.sum("w").alias("w"))
        .collect()
    )
    by_lang = {r.lang: (r.t, r.w) for r in agg}
    assert set(by_lang) == {"en", "fr"}
    for t, w in by_lang.values():
        assert t >= w  # fertility >= 1


def test_perplexity_buckets_approx_path_agrees_with_exact(spark):
    """The approx path (round 10: percentile thresholds + broadcast
    join, no per-language sort) must agree with exact NTILE wherever
    scores are distinct and group sizes divide n_buckets — and must
    always satisfy the ordering invariant (better score → better or
    equal bucket within a language)."""
    from nextbus2pg_spark.operators.textstats import perplexity_buckets

    rows = []
    for i in range(6):
        rows.append((i, "the cat sat on the mat " * (i + 1), "en"))
    rows.append((6, "zq xv qj wk vn mz pq rs", "en"))
    rows.append((7, "aa bb cc dd ee ff gg hh", "en"))
    rows.append((8, "k1 k2 k3 k4 k5 k6 k7 k8", "en"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    exact = {
        r.id: r.bucket
        for r in perplexity_buckets(
            docs, "doc_id", "text", "lang", n_buckets=3, scale="exact"
        ).collect()
    }
    approx = {
        r.id: r.bucket
        for r in perplexity_buckets(
            docs, "doc_id", "text", "lang", n_buckets=3, scale="approx"
        ).collect()
    }
    assert set(approx) == set(exact)
    assert set(approx.values()) == {1, 2, 3}

    # ordering invariant against the scorer directly
    from nextbus2pg_spark.operators.textstats import bigram_logprob

    scores = {
        r.id: r.avg_logprob
        for r in bigram_logprob(docs, "doc_id", "text").collect()
    }
    ids = sorted(approx, key=lambda i: -scores[i])
    for a, b in zip(ids, ids[1:]):
        assert approx[a] <= approx[b], (a, b, approx, scores)


def test_perplexity_buckets_auto_probe_selects_by_language_size(spark):
    """scale='auto' probes per-language counts: a tiny bound flips the
    plan to the windowless approx path; the default bound keeps exact
    NTILE at fixture scale (oracle parity)."""
    from nextbus2pg_spark.operators.textstats import perplexity_buckets

    rows = [
        (i, "w%d x%d y z q r s t" % (i, i), "en") for i in range(8)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    small_bound = perplexity_buckets(
        docs, "doc_id", "text", "lang",
        n_buckets=2, scale="auto", max_exact_rows_per_lang=2,
    )
    assert "Window" not in small_bound._jdf.queryExecution().executedPlan().toString()
    default_bound = perplexity_buckets(
        docs, "doc_id", "text", "lang", n_buckets=2, scale="auto"
    )
    assert "Window" in default_bound._jdf.queryExecution().executedPlan().toString()

    import pytest

    with pytest.raises(ValueError, match="scale"):
        perplexity_buckets(
            docs, "doc_id", "text", "lang", n_buckets=2, scale="bogus"
        )


def test_c4_line_filter_rules(spark):
    """Every C4 rule pinned on a hand-built page set: terminal
    punctuation, 5-word floor, javascript lines, the ≥3-surviving-
    lines page gate, lorem-ipsum and brace page gates."""
    from nextbus2pg_spark.operators.text import c4_line_filter

    good = "\n".join(
        [
            "one two three four five.",
            "does this line have enough words?",
            'a quoted line with five words"',
            "no terminal punctuation here at all",   # dropped: punct
            "too short.",                            # dropped: words
            "enable javascript to view this page.",  # dropped: js
        ]
    )
    too_few = "\n".join(
        ["one two three four five.", "six seven eight nine ten."]
    )  # only 2 survivors
    lorem = good + "\nsome Lorem Ipsum filler text here."
    braces = good + "\nfunction f() { return 1; }"
    docs = spark.createDataFrame(
        [(1, good), (2, too_few), (3, lorem), (4, braces)],
        "doc_id long, text string",
    )
    out = {r.id: r for r in c4_line_filter(docs, "doc_id", "text").collect()}
    assert set(out) == {1}
    r = out[1]
    assert (r.n_lines, r.n_kept) == (6, 3)
    assert r.clean_text.split("\n") == [
        "one two three four five.",
        "does this line have enough words?",
        'a quoted line with five words"',
    ]


def test_c4_word_count_ignores_empty_split_fragments(spark):
    """Round-10 advice: consecutive/leading/trailing spaces produce
    empty split fragments that must NOT count as words — a 4-word line
    padded with a double space used to survive the 5-word floor."""
    from nextbus2pg_spark.operators.text import c4_line_filter

    filler = "\n".join(
        ["alpha beta gamma delta five.", "six seven eight nine ten.",
         "more words to keep page alive."]
    )
    page = "\n".join(
        [
            filler,
            "only four real  words.",      # naive count 5, real 4 -> dies
            "  leading pad but five words.",  # real 5 -> survives
            "inner  double space five words.",  # real 5 -> survives
        ]
    )
    docs = spark.createDataFrame([(1, page)], "doc_id long, text string")
    r = c4_line_filter(docs, "doc_id", "text").collect()[0]
    assert (r.n_lines, r.n_kept) == (6, 5)
    assert "only four real" not in r.clean_text
    assert "leading pad" in r.clean_text
    assert "inner  double space" in r.clean_text


def test_html_to_text_edge_cases(spark):
    """The stripper on handwritten traps: nested-looking scripts,
    attributes with >, entity ordering (&amp;lt; must stay literal
    &lt;), comments spanning content."""
    from nextbus2pg_spark.operators.text import html_to_text
    from pyspark.sql import functions as F

    cases = [
        ("<p>a &amp;lt; b</p>", "a &lt; b"),
        ("<script>if (a<b) { x(); }</script>after", "after"),
        ("x<!-- <p>gone</p> -->y", "x y"),
        ('<a href="u?a=1&amp;b=2" title="t">link</a>', "link"),
        ("A&nbsp;&quot;B&quot;&apos;C&apos;", 'A "B"\'C\''),
        ("<style>p>span { k:v }</style>kept", "kept"),
        ("  lots   of\t\nspace  ", "lots of space"),
    ]
    df = spark.createDataFrame(cases, "html string, expected string")
    out = df.select(
        "expected", html_to_text(F.col("html")).alias("got")
    ).collect()
    for r in out:
        assert r.got == r.expected, (r.got, r.expected)


def test_html_to_text_numeric_character_references(spark):
    """numeric_entities=True (round 11): &#NN; and &#xHH; decode to
    their BMP characters via the JVM-only hex/unhex/UTF-16BE chain;
    &amp;#65; stays a literal &#65;; invalid refs (zero, surrogate,
    astral, malformed) pass through; default mode leaves refs alone."""
    from pyspark.sql import functions as F

    from nextbus2pg_spark.operators.text import html_to_text

    cases = [
        ("A&#66;C", "ABC"),                    # decimal
        ("x&#x20AC;y", "x€y"),            # hex euro
        ("x&#X20ac;y", "x€y"),            # case-insensitive X/hex
        ("<p>&#169; 2026</p>", "© 2026"),  # after tag strip
        ("a&amp;#65;b", "a&#65;b"),            # literal, amp-escaped
        ("bad&#0;ref", "bad&#0;ref"),          # NUL invalid
        ("sur&#xD800;ro", "sur&#xD800;ro"),    # surrogate invalid
        ("ast&#x1F600;ral", "ast&#x1F600;ral"),  # astral: undecoded
        ("no&#semi", "no&#semi"),              # malformed
        ("&#72;&#105;", "Hi"),                 # adjacent refs
        # a decoded '&' is never re-parsed (round-12 ADVICE): the
        # numeric ref for '&' followed by an entity NAME is literal
        ("x&#38;lt;y", "x&lt;y"),
        ("x&#38;amp;y", "x&amp;y"),
        # named entities still decode in numeric mode, same one pass
        ("a&lt;b&gt;c &quot;q&quot; &apos;s&apos;", "a<b>c \"q\" 's'"),
        ("n&nbsp;b", "n b"),
        ("mix &amp; &#8211; done", "mix & – done"),
    ]
    df = spark.createDataFrame(cases, "html string, expected string")
    out = df.select(
        "expected",
        html_to_text(F.col("html"), numeric_entities=True).alias("got"),
        html_to_text(F.col("html")).alias("got_default"),
    ).collect()
    import re as _re

    for r in out:
        assert r.got == r.expected, (r.got, r.expected)
    # default mode never decodes numeric refs
    named = ("&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;")
    for r, (html, _exp) in zip(out, cases):
        if any(e in html for e in named):
            continue  # named entities decode in BOTH modes
        stripped = _re.sub(r"\s+", " ", _re.sub(r"<[^>]+>", " ", html)).strip()
        assert r.got_default == stripped, (html, r.got_default)


def test_entity_decoder_matches_html_unescape_on_supported_refs(spark):
    """Differential oracle for the round-12 one-pass entity decoder:
    on inputs built from plain text, well-formed numeric refs to
    printable BMP code points, and the six supported named entities,
    _decode_entities must agree with stdlib html.unescape — including
    the double-decode traps in BOTH directions ('&#38;lt;',
    '&amp;#65;', '&#38;amp;', adjacent refs, refs at string edges).
    500 seeded-random cases in one Spark job."""
    import html
    import random

    from pyspark.sql import functions as F

    from nextbus2pg_spark.operators.text import _decode_entities

    rng = random.Random(42)
    named = ["&nbsp;", "&lt;", "&gt;", "&quot;", "&apos;", "&amp;"]
    words = ["alpha", "x", "Done.", "mid dle", "tail", ""]
    safe_cps = (
        list(range(0x21, 0x7F)) + [0xE9, 0x20AC, 0x2014, 0x4E2D, 0xFFFD]
    )

    def piece():
        k = rng.randrange(5)
        if k == 0:
            return rng.choice(words)
        if k == 1:
            return rng.choice(named)
        cp = rng.choice(safe_cps)
        if k == 2:
            return f"&#{cp};"
        if k == 3:
            return f"&#x{cp:x};" if rng.random() < 0.5 else f"&#X{cp:X};"
        # the trap shapes
        return rng.choice(
            ["&#38;lt;", "&amp;#65;", "&#38;amp;", "&#38;#60;"]
        )

    cases = [
        "".join(piece() for _ in range(rng.randrange(1, 7)))
        for _ in range(500)
    ]
    # html.unescape semantics notes: '&#38;' decodes to a literal '&'
    # that is NOT re-parsed — exactly the contract under test; the ONE
    # deliberate divergence is &nbsp; -> plain space (html_to_text
    # extracts visible text, so U+00A0 normalizes to ' ').
    expected = [html.unescape(c).replace("\xa0", " ") for c in cases]
    df = spark.createDataFrame(
        list(zip(cases, expected)), "s string, expected string"
    )
    out = df.select(
        "expected", _decode_entities(F.col("s")).alias("got"), "s"
    ).collect()
    for r in out:
        assert r.got == r.expected, (r.s, r.got, r.expected)
