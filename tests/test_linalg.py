"""Unit tests for distributed power iteration (operators.linalg)."""

from __future__ import annotations

import math

from id3c_spark.operators.linalg import (
    pc_projection,
    power_iteration,
    principal_direction,
)


def _unit(xs):
    n = math.sqrt(sum(x * x for x in xs))
    return [x / n for x in xs]


def test_power_iteration_finds_dominant_axis(spark):
    # 40 vectors hugging the (3,4)/5 direction, mild noise on axis 2
    base = _unit([3.0, 4.0, 0.0, 0.0])
    rows = []
    for i in range(40):
        s = 1.0 + (i % 5) * 0.1
        rows.append(([b * s for b in base],))
    rows.append(([0.0, 0.0, 0.3, 0.0],))  # small off-axis component
    df = spark.createDataFrame(rows, "embedding array<double>")
    v = power_iteration(df, "embedding", dim=4, iters=8)
    # unit norm, aligned (up to sign) with the dominant direction
    assert abs(sum(x * x for x in v) - 1.0) < 1e-6
    cos = abs(sum(a * b for a, b in zip(v, base)))
    assert cos > 0.999


def test_power_iteration_empty_returns_start(spark):
    df = spark.createDataFrame([], "embedding array<double>")
    v = power_iteration(df, "embedding", dim=4, iters=3)
    assert v == [0.5, 0.5, 0.5, 0.5]  # 1/sqrt(4)


def test_principal_direction_relation_shape(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0],), ([2.0, 0.0],), ([3.0, 0.1],)],
        "embedding array<double>",
    )
    out = principal_direction(df, "embedding", dim=2, iters=5).collect()
    assert [r["dim"] for r in sorted(out, key=lambda r: r["dim"])] == [1, 2]
    vals = {r["dim"]: r["v"] for r in out}
    assert abs(abs(vals[1]) - 1.0) < 0.01  # dominant axis ≈ e1


def test_pc_projection_scores(spark):
    df = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.0, 3.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    scores = {
        r["id"]: r["score"]
        for r in pc_projection(df, [1.0, 0.0]).collect()
    }
    assert scores == {1: 2.0, 2: 0.0, 3: 1.0}


def test_top_directions_orthonormal_and_spanning(spark):
    import numpy as np

    from id3c_spark.operators.linalg import top_directions

    rng = np.random.default_rng(13)
    # two dominant planted axes with different variances + noise
    a1 = np.zeros(8); a1[0] = 1.0
    a2 = np.zeros(8); a2[3] = 1.0
    rows = []
    for _ in range(300):
        x = (
            rng.normal(scale=5.0) * a1
            + rng.normal(scale=2.0) * a2
            + rng.normal(scale=0.05, size=8)
        )
        rows.append(([float(t) for t in x],))
    df = spark.createDataFrame(rows, "embedding array<float>")
    v1, v2 = top_directions(df, p=2, dim=8, iters=4)
    # orthonormal
    assert abs(sum(a * a for a in v1) - 1) < 1e-6
    assert abs(sum(a * a for a in v2) - 1) < 1e-6
    assert abs(sum(a * b for a, b in zip(v1, v2))) < 1e-3
    # v1 aligns with the strongest axis, v2 with the second
    assert abs(v1[0]) > 0.99
    assert abs(v2[3]) > 0.99
