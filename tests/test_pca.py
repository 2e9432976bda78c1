"""Exact-integer PCA top component (similarity.pca_top_component — q211)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from occupation_wage_etl_spark.operators import similarity


def _synthetic(n=400, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # dominant direction u with variance 25x the isotropic noise
    u = np.zeros(d)
    u[1], u[4] = 0.8, -0.6
    coords = rng.normal(0.0, 0.5, size=n)
    noise = rng.normal(0.0, 0.02, size=(n, d))
    x = np.outer(coords, u) + noise + 0.1  # non-zero mean on purpose
    return x.astype(np.float32)


def test_pca_matches_numpy_direction(spark):
    x = _synthetic()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.pca_top_component(
        df, x_scale=10**4, v_scale=10**6, iters=8
    )
    got = {r["vec_id"]: r["pc1"] for r in out.collect()}
    xc = x.astype(np.float64) - x.astype(np.float64).mean(axis=0)
    cov = xc.T @ xc
    evals, evecs = np.linalg.eigh(cov)
    v1 = evecs[:, -1]
    proj = xc @ v1
    got_arr = np.array([got[i] for i in range(len(x))])
    # the engine normalizes v to max-abs 1 (not L2) — compare after
    # normalizing both projections to unit L2
    ga = got_arr / np.linalg.norm(got_arr)
    pa = proj / np.linalg.norm(proj)
    if np.dot(ga, pa) < 0:
        pa = -pa
    assert np.abs(ga - pa).max() < 1e-3
    # variance along PC1 dominates: correlation essentially 1
    assert abs(float(np.dot(ga, pa))) > 0.999999


def test_pca_partitioning_invariant_and_sign_canonical(spark):
    x = _synthetic(n=120, d=6, seed=11)
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df8 = df1.repartition(8)
    a = sorted(map(tuple, similarity.pca_top_component(df1).collect()))
    b = sorted(map(tuple, similarity.pca_top_component(df8).collect()))
    assert a == b  # bit-identical across partitionings


def test_pca_recovers_axis_sign_convention(spark):
    # all variance on axis 2, increasing with id: scores ordered with it,
    # and the canonical sign makes the axis-2 loading positive
    rows = [(i, [0.0, 0.0, 0.01 * i, 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted(
        (r["vec_id"], r["pc1"])
        for r in similarity.pca_top_component(df).collect()
    )
    scores = [s for _, s in out]
    assert all(b > a for a, b in zip(scores, scores[1:]))
    assert scores[0] < 0 < scores[-1]  # centered


def test_pca_degenerate_inputs_no_crash(spark):
    # identical rows -> zero scatter: scores all zero, no ZeroDivisionError
    rows = [(i, [0.5, -0.25, 0.125]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.pca_top_component(df).collect()
    assert len(out) == 10
    assert all(r["pc1"] == 0.0 for r in out)
    # single row: also zero scatter
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    got = similarity.pca_top_component(one).collect()
    assert len(got) == 1 and got[0]["pc1"] == 0.0
    # empty corpus: empty (or all-NULL) result, no crash
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    res = similarity.pca_top_component(empty).collect()
    assert all(r["pc1"] is None for r in res)
