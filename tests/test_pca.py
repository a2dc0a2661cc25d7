"""pca_power_iteration: known-direction recovery, mode agreement,
input validation."""

from __future__ import annotations

import math

import pytest


def test_pca_recovers_known_direction(spark):
    from nextbus2pg_spark.operators.pca import pca_power_iteration

    # Points exactly on the line spanned by (0.6, 0.8): the dominant
    # component is that direction up to sign, projections are the
    # centered coordinates along it.
    ts = [-2.0, -1.0, 0.0, 1.0, 2.0, 5.0]
    rows = [(i, [0.6 * t, 0.8 * t]) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    mu, v, proj = pca_power_iteration(df, "id", "vec", n_iters=20)
    align = 0.6 * v[0] + 0.8 * v[1]
    assert abs(abs(align) - 1.0) < 1e-9
    got = {r.id: r.proj for r in proj.collect()}
    mean_t = sum(ts) / len(ts)
    sign = 1.0 if align > 0 else -1.0
    for i, t in enumerate(ts):
        assert got[i] == pytest.approx(sign * (t - mean_t), abs=1e-6)


def test_pca_modes_agree(spark):
    from nextbus2pg_spark.operators.pca import pca_power_iteration

    rows = [
        (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    _, v_fast, p_fast = pca_power_iteration(df, "id", "vec", n_iters=8)
    _, v_det, p_det = pca_power_iteration(
        df, "id", "vec", n_iters=8, deterministic=True
    )
    assert math.sqrt(sum((a - b) ** 2 for a, b in zip(v_fast, v_det))) < 1e-9
    fast = {r.id: r.proj for r in p_fast.collect()}
    det = {r.id: r.proj for r in p_det.collect()}
    assert all(fast[i] == pytest.approx(det[i], abs=1e-5) for i in fast)


def test_pca_rejects_null_vectors_and_mixed_dims(spark):
    from nextbus2pg_spark.operators.pca import pca_power_iteration

    nulls = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="NULL"):
        pca_power_iteration(nulls, "id", "vec")
    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])], "id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="mixed"):
        pca_power_iteration(mixed, "id", "vec")
