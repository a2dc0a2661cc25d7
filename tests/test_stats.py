"""grouped_pearson: hand-computed r/slope, null handling, zero
variance."""

from __future__ import annotations

import pytest


def test_grouped_pearson_hand_computed(spark):
    from nextbus2pg_spark.operators.stats import grouped_pearson

    # Group a: perfect line y = 2x + 1 -> r = 1, slope = 2.
    # Group b: y independent-ish of x.
    rows = [("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
            ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_pearson(df, ["g"], "x", "y").collect()}
    assert out["a"].n == 3
    assert out["a"].corr == pytest.approx(1.0)
    assert out["a"].slope == pytest.approx(2.0)
    # zero variance in y -> NULL corr, but slope (y on x) is 0.
    assert out["b"].corr is None
    assert out["b"].slope == pytest.approx(0.0)


def test_grouped_pearson_nulls_drop_pairwise(spark):
    from nextbus2pg_spark.operators.stats import grouped_pearson

    rows = [("a", 1.0, 2.0), ("a", None, 9.0), ("a", 2.0, None),
            ("a", 2.0, 4.0), ("a", 3.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = grouped_pearson(df, ["g"], "x", "y").collect()[0]
    assert out.n == 3 and out.corr == pytest.approx(1.0)


def test_grouped_pearson_anticorrelation_and_scale(spark):
    from nextbus2pg_spark.operators.stats import grouped_pearson

    # y = -0.25x + 10 at 2dp scale: r = -1 exactly.
    rows = [("a", float(x), 10.0 - 0.25 * x) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = grouped_pearson(df, ["g"], "x", "y", y_scale=100).collect()[0]
    assert out.corr == pytest.approx(-1.0)
    assert out.slope == pytest.approx(-25.0)  # cents per unit x


def test_chi_squared_hand_computed(spark):
    from nextbus2pg_spark.operators.stats import chi_squared

    # 2x2 table: a={x:10,y:10} vs b; independent-by-construction
    # counts -> chi2 == 0; then a dependent table with known chi2.
    indep = spark.createDataFrame(
        [("x", "u")] * 4 + [("x", "v")] * 4 + [("y", "u")] * 4
        + [("y", "v")] * 4,
        "a string, b string",
    )
    r = chi_squared(indep, "a", "b").collect()[0]
    assert r.chi2 == 0.0 and r.dof == 1 and r.n == 16
    # Perfect association: x->u (5), y->v (5); chi2 = n = 10.
    dep = spark.createDataFrame(
        [("x", "u")] * 5 + [("y", "v")] * 5, "a string, b string"
    )
    r = chi_squared(dep, "a", "b").collect()[0]
    assert r.chi2 == 10.0 and r.dof == 1 and r.n == 10


def test_chi_squared_drops_null_levels(spark):
    from nextbus2pg_spark.operators.stats import chi_squared

    df = spark.createDataFrame(
        [("x", "u"), ("x", None), (None, "v"), ("y", "v")],
        "a string, b string",
    )
    r = chi_squared(df, "a", "b").collect()[0]
    assert r.n == 2 and r.dof == 1


def test_mad_outliers_hand_computed(spark):
    """g1: values 1..5 plus 100 — med=3.5 (even count), MAD=1.5,
    |100-3.5|=96.5 > 3*1.5 flags only the spike. g2: constant column
    (MAD 0) — NULL ratio, nothing flagged."""
    from nextbus2pg_spark.operators.stats import mad_outliers

    rows = [("g1", float(v)) for v in (1, 2, 3, 4, 5, 100)]
    rows += [("g2", 7.0)] * 4 + [("g2", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = [r.asDict() for r in mad_outliers(df, ["g"], "v", k=3).collect()]
    g1 = {r["v"]: r for r in out if r["g"] == "g1"}
    assert g1[100.0]["is_outlier"] and not any(
        g1[float(v)]["is_outlier"] for v in (1, 2, 3, 4, 5)
    )
    assert g1[100.0]["med"] == 3.5 and g1[100.0]["mad"] == 1.5
    assert g1[3.0]["mad_ratio"] == 0.5 / 1.5
    g2 = [r for r in out if r["g"] == "g2"]
    # median 7, deviations (0,0,0,0,2): MAD=0 -> NULL ratio, no flags
    assert all(r["mad"] == 0.0 for r in g2)
    assert all(r["mad_ratio"] is None and not r["is_outlier"] for r in g2)


def test_mad_outliers_keeps_input_columns(spark):
    from nextbus2pg_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 30.0)],
        "g string, id long, v double",
    )
    out = mad_outliers(df, ["g"], "v", k=3)
    assert out.columns[:3] == ["g", "id", "v"]
    assert out.count() == 3


def test_ks_statistic_hand_computed(spark):
    """a = {1,2,3,4}, b = {3,4,5,6}: D = 1/2 attained first at x=2
    (F_a=2/4, F_b=0)."""
    from nextbus2pg_spark.operators.stats import ks_statistic

    rows = [("a", float(v)) for v in (1, 2, 3, 4)]
    rows += [("b", float(v)) for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "s string, v double")
    r = ks_statistic(df, "s", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks"] == 0.5 and r["d_num"] == 8
    assert r["at_value"] == 2.0


def test_ks_statistic_identical_samples_is_zero(spark):
    from nextbus2pg_spark.operators.stats import ks_statistic

    rows = [(s, float(v)) for s in ("a", "b") for v in (1, 2, 2, 9)]
    df = spark.createDataFrame(rows, "s string, v double")
    r = ks_statistic(df, "s", "v", "a", "b").collect()[0]
    assert r["ks"] == 0.0 and r["d_num"] == 0


def test_cohens_kappa_hand_computed(spark):
    """Classic 2x2 example: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no.
    po = 35/50; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4."""
    from nextbus2pg_spark.operators.stats import cohens_kappa

    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["n_agree"]) == (50, 35)
    assert abs(r["kappa"] - 0.4) < 1e-12


def test_cohens_kappa_degenerate_constant_raters(spark):
    from nextbus2pg_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame([("y", "y")] * 5, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa"] is None  # pe = 1: chance-corrected agreement undefined


def test_welch_t_matches_scipy_formula(spark):
    """Hand/NumPy reference on unequal-variance unequal-size groups."""
    import numpy as np

    from nextbus2pg_spark.operators.stats import welch_t

    a = [10.0, 12.0, 11.0, 13.0, 9.0, 14.0]
    b = [20.0, 25.0, 15.0, 30.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "s string, v double")
    r = welch_t(df, "s", "v", "a", "b").collect()[0]
    xa, xb = np.array(a), np.array(b)
    va, vb = xa.var(ddof=1), xb.var(ddof=1)
    t_ref = (xa.mean() - xb.mean()) / np.sqrt(va / len(a) + vb / len(b))
    dof_ref = (va / len(a) + vb / len(b)) ** 2 / (
        (va / len(a)) ** 2 / (len(a) - 1)
        + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert (r["n_a"], r["n_b"]) == (6, 4)
    assert r["mean_a"] == xa.mean() and r["mean_b"] == xb.mean()
    assert abs(r["t_stat"] - t_ref) < 1e-12
    assert abs(r["dof"] - dof_ref) < 1e-12


def test_welch_t_degenerate_inputs_null(spark):
    from nextbus2pg_spark.operators.stats import welch_t

    # one-row group: variance undefined
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "s string, v double"
    )
    r = welch_t(df, "s", "v", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["dof"] is None
    # both groups constant: zero variance everywhere
    df2 = spark.createDataFrame(
        [("a", 1.0)] * 3 + [("b", 2.0)] * 3, "s string, v double"
    )
    r2 = welch_t(df2, "s", "v", "a", "b").collect()[0]
    assert r2["t_stat"] is None


def test_mann_whitney_auc_hand_computed(spark):
    """Perfect separation -> 1.0; reversed -> 0.0; a tie counts half."""
    from nextbus2pg_spark.operators.stats import mann_whitney_auc

    perfect = spark.createDataFrame(
        [("p", 10.0), ("p", 9.0), ("n", 2.0), ("n", 1.0)],
        "lbl string, score double",
    )
    r = mann_whitney_auc(perfect, "lbl", "score", "p", "n").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)

    reverse = spark.createDataFrame(
        [("p", 1.0), ("n", 2.0)], "lbl string, score double"
    )
    r = mann_whitney_auc(reverse, "lbl", "score", "p", "n").collect()[0]
    assert r["auc"] == 0.0

    tied = spark.createDataFrame(
        [("p", 5.0), ("n", 5.0)], "lbl string, score double"
    )
    r = mann_whitney_auc(tied, "lbl", "score", "p", "n").collect()[0]
    assert r["auc"] == 0.5


def test_mann_whitney_auc_matches_sklearn_formula(spark):
    """Reference AUC by pairwise comparison on a mixed/tied sample."""
    from nextbus2pg_spark.operators.stats import mann_whitney_auc

    pos = [3.0, 5.0, 5.0, 8.0, 2.0]
    neg = [1.0, 5.0, 4.0, 7.0]
    rows = [("p", v) for v in pos] + [("n", v) for v in neg]
    df = spark.createDataFrame(rows, "lbl string, score double")
    r = mann_whitney_auc(df, "lbl", "score", "p", "n").collect()[0]
    ref = sum(
        1.0 if a > b else (0.5 if a == b else 0.0)
        for a in pos for b in neg
    ) / (len(pos) * len(neg))
    assert r["auc"] == ref
    assert r["u_pos"] == ref * len(pos) * len(neg)


def test_spearman_matches_scipy_semantics(spark):
    """Tie-aware average ranks: reference computed by hand-ranking."""
    from nextbus2pg_spark.operators.stats import spearman_rho

    xs = [1.0, 2.0, 2.0, 4.0, 5.0]
    ys = [10.0, 20.0, 25.0, 25.0, 50.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = spearman_rho(df, "x", "y").collect()[0]

    def avg_ranks(vals):
        order = sorted(vals)
        return [
            (order.index(v) + 1 + order.index(v) + order.count(v)) / 2
            for v in vals
        ]
    import math
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)
                    * sum((b - my) ** 2 for b in ry))
    assert (r["n"], round(r["rho"], 12)) == (5, round(num / den, 12))


def test_spearman_monotone_is_one_outlier_robust(spark):
    """A perfectly monotone but wildly nonlinear relation scores
    rho=1.0 (where Pearson would not); a constant column is NULL."""
    from nextbus2pg_spark.operators.stats import spearman_rho

    df = spark.createDataFrame(
        [(float(i), float(10 ** i)) for i in range(1, 7)],
        "x double, y double",
    )
    rho = spearman_rho(df, "x", "y").collect()[0]["rho"]
    # the fixed sqrt-product expression can land one ulp past 1.0 —
    # deterministic (the oracle replays the same bits), so |rho-1|
    # bounded, not exact
    assert abs(rho - 1.0) < 1e-12
    const = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0)], "x double, y double"
    )
    assert spearman_rho(const, "x", "y").collect()[0]["rho"] is None


def test_mad_outliers_null_values_pass_through_unflagged(spark):
    """ADVICE r7: rows whose value is NULL used to be silently dropped;
    now every input row appears exactly once — NULL-value rows carry
    the group med/mad, NULL ratio, and is_outlier=False."""
    from nextbus2pg_spark.operators.stats import mad_outliers

    rows = [("g1", 1, 1.0), ("g1", 2, 2.0), ("g1", 3, 3.0),
            ("g1", 4, None), ("g2", 5, None)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {r["id"]: r.asDict() for r in
           mad_outliers(df, ["g"], "v", k=3).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # nothing dropped
    r4 = out[4]  # NULL value in a measurable group: stats attach
    assert r4["med"] == 2.0 and r4["mad"] == 1.0
    assert r4["mad_ratio"] is None and r4["is_outlier"] is False
    r5 = out[5]  # group with NO measurable values: stats NULL too
    assert r5["med"] is None and r5["mad"] is None
    assert r5["mad_ratio"] is None and r5["is_outlier"] is False


def test_adjusted_rand_hand_computed(spark):
    """The sklearn docs example: [0,0,0,1,1,1] vs [0,0,1,1,2,2] gives
    ARI = 24/99 = 0.2424...; identical labelings give exactly 1.0;
    the all-one-cluster degenerate case is NULL (integer-decided)."""
    from nextbus2pg_spark.operators.stats import adjusted_rand

    rows = list(zip([0, 0, 0, 1, 1, 1], [0, 0, 1, 1, 2, 2]))
    df = spark.createDataFrame(rows, "a int, b int")
    r = adjusted_rand(df, "a", "b").collect()[0]
    assert r["ari"] == 24.0 / 99.0
    assert (r["sum_comb"], r["sum_comb_a"], r["sum_comb_b"]) == (2, 6, 3)
    assert (r["n_pairs"], r["n"]) == (15, 6)

    same = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 1), (1, 1)], "a int, b int"
    )
    assert adjusted_rand(same, "a", "b").collect()[0]["ari"] == 1.0

    degenerate = spark.createDataFrame(
        [(0, 0), (0, 0), (0, 0)], "a int, b int"
    )
    assert adjusted_rand(degenerate, "a", "b").collect()[0]["ari"] is None


def test_bh_fdr_hand_computed(spark):
    """alpha=0.25, m=5: thresholds .05/.10/.15/.20/.25 — the three
    small p-values pass at their ranks, the large two do not; NULL p
    passes through unrejected and does not count toward m."""
    from nextbus2pg_spark.operators.stats import bh_fdr

    rows = [(1, 0.01), (2, 0.02), (3, 0.03), (4, 0.5), (5, 0.6),
            (6, None)]
    df = spark.createDataFrame(rows, "id int, p double")
    got = {r["id"]: r["reject"] for r in bh_fdr(df, "p", 0.25).collect()}
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False,
                   6: False}
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        bh_fdr(df, "p", 1.5)


def test_bh_fdr_ties_take_binding_rank(spark):
    """Tied p-values share the LARGEST ordinal rank (the BH threshold
    grows with rank, so that is the binding test): three ties at 0.04
    with m=4 pass via rank 3 (0.05*3/4 < 0.04? no —) use alpha=0.06:
    0.06*3/4 = 0.045 >= 0.04 passes, while rank-1 alone (0.015) would
    not."""
    from nextbus2pg_spark.operators.stats import bh_fdr

    rows = [(1, 0.04), (2, 0.04), (3, 0.04), (4, 0.9)]
    df = spark.createDataFrame(rows, "id int, p double")
    got = {r["id"]: r["reject"] for r in bh_fdr(df, "p", 0.06).collect()}
    assert got == {1: True, 2: True, 3: True, 4: False}


def test_frequent_pairs_hand_computed(spark):
    from nextbus2pg_spark.operators.stats import frequent_pairs

    rows = [("u1", "a"), ("u1", "b"), ("u1", "c"),
            ("u2", "a"), ("u2", "b"),
            ("u3", "a"), ("u3", "c"),
            ("u4", "b"), ("u4", "c"),
            ("u5", "a"), ("u5", "b"), ("u5", "b")]  # dup collapses
    df = spark.createDataFrame(rows, "u string, item string")
    out = {(r["item_a"], r["item_b"]): r.asDict() for r in
           frequent_pairs(df, "u", "item", min_support=2).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_pair"], ab["n_a"], ab["n_b"], ab["n_baskets"]) == (
        3, 4, 4, 5)
    assert ab["lift"] == 5.0 * 3.0 / 16.0
    # support filter: min_support=3 keeps only (a, b)
    only = frequent_pairs(df, "u", "item", min_support=3).collect()
    assert [(r["item_a"], r["item_b"]) for r in only] == [("a", "b")]


def test_frequent_pairs_basket_size_guard(spark):
    import pytest

    from nextbus2pg_spark.operators.stats import frequent_pairs

    rows = [("u1", f"i{k}") for k in range(5)] + [("u2", "i0"), ("u2", "i1")]
    df = spark.createDataFrame(rows, "u string, item string")
    with pytest.raises(Exception, match="max_items_per_basket"):
        frequent_pairs(
            df, "u", "item", min_support=1, max_items_per_basket=3
        ).collect()


def test_theil_sen_hand_computed(spark):
    """y = 2x with one wild outlier: OLS is dragged, Theil-Sen stays at
    exactly 2.0 (median of pairwise slopes). Even pair counts average
    the two middles; equal-x pairs are excluded; a group without any
    valid pair yields NULL slope and 0 pairs."""
    from nextbus2pg_spark.operators.stats import grouped_pearson, theil_sen

    rows = [("g", float(x), 2.0 * x) for x in range(1, 8)]
    rows.append(("g", 8.0, 1000.0))             # the outlier
    rows += [("flat", 5.0, 1.0), ("flat", 5.0, 9.0)]  # equal x only
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r.asDict() for r in
           theil_sen(df, ["g"], "x", "y").collect()}
    assert got["g"]["slope"] == 2.0
    assert got["g"]["n_pairs"] == 28  # C(8,2), all x distinct
    assert got["flat"]["n_pairs"] == 0 and got["flat"]["slope"] is None
    ols = {r["g"]: r["slope"] for r in
           grouped_pearson(df, ["g"], "x", "y").collect()}
    assert ols["g"] > 20.0  # OLS dragged two orders past the truth

    # even middle: slopes {1, 3} over three collinear-in-pairs points
    df2 = spark.createDataFrame(
        [("h", 0.0, 0.0), ("h", 1.0, 1.0), ("h", 2.0, 4.0),
         ("h", 3.0, 5.0)],
        "g string, x double, y double",
    )
    r2 = theil_sen(df2, ["g"], "x", "y").collect()[0]
    assert r2["n_pairs"] == 6
    # pairwise slopes sorted: [1, 1, 5/3, 2, 2, 3] -> (5/3 + 2)/2
    assert r2["slope"] == (5.0 / 3.0 + 2.0) / 2.0


def test_theil_sen_group_size_guard(spark):
    import pytest

    from nextbus2pg_spark.operators.stats import theil_sen

    rows = [("g", float(i), float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    with pytest.raises(Exception, match="max_points_per_group"):
        theil_sen(df, ["g"], "x", "y", max_points_per_group=4).collect()
