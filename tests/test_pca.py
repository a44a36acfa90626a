"""Distributed exact Gram matrix + driver-side PCA (stages/pca.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from jsonschema_validator_ray.stages.pca import (
    Q_SCALE, dense_from_triangle, gram_matrix, power_iteration)


def _mk_ds(vectors, blocks=3):
    t = pa.table({"embedding": pa.array(vectors,
                                        type=pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(blocks)


def _brute_gram(vectors, d):
    q = np.floor(np.array([v for v in vectors
                           if v is not None and len(v) == d],
                          dtype=np.float64) * Q_SCALE).astype(np.int64)
    return q.T @ q, q.sum(axis=0), q.shape[0]


def test_gram_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    d = 8
    vecs = (rng.standard_normal((40, d)) * 0.3).astype(np.float32).tolist()
    tri = gram_matrix(_mk_ds(vecs), "embedding", d)
    g, s, n = _brute_gram(vecs, d)
    df = tri.to_pandas()
    assert len(df) == d * (d + 1) // 2
    for _, r in df.iterrows():
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        assert i <= j
        assert r["gram"] == g[i, j]
        assert r["s_i"] == s[i] and r["s_j"] == s[j]
        assert r["n_vecs"] == n


def test_gram_skips_ragged_and_null_rows(ray_session):
    d = 4
    vecs = [[0.5, -0.25, 0.125, 1.0], None, [0.1, 0.2],
            [1.0, 1.0, 1.0, 1.0], []]
    tri = gram_matrix(_mk_ds(vecs, blocks=2), "embedding", d)
    g, s, n = _brute_gram(vecs, d)
    assert n == 2
    m = dense_from_triangle(tri, d)
    np.testing.assert_array_equal(m, g.astype(np.float64))
    assert tri.to_pandas()["n_vecs"].iloc[0] == 2


def test_gram_empty_dataset(ray_session):
    tri = gram_matrix(_mk_ds([], blocks=1), "embedding", 4)
    df = tri.to_pandas()
    assert len(df) == 10
    assert (df["gram"] == 0).all() and (df["n_vecs"] == 0).all()


def test_dense_centered_is_population_covariance(ray_session):
    rng = np.random.default_rng(3)
    d = 6
    vecs = (rng.standard_normal((100, d)) * 0.2 + 0.1) \
        .astype(np.float32).tolist()
    tri = gram_matrix(_mk_ds(vecs), "embedding", d)
    cov = dense_from_triangle(tri, d, centered=True)
    q = np.floor(np.array(vecs, dtype=np.float64) * Q_SCALE)
    expect = np.cov(q, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, expect, rtol=1e-12, atol=1e-6)


def test_power_iteration_matches_eigh(ray_session):
    rng = np.random.default_rng(11)
    d = 16
    # anisotropic cloud -> well-separated top eigenvalue
    base = rng.standard_normal((500, d)) * 0.05
    base[:, 2] += rng.standard_normal(500) * 0.8
    vecs = base.astype(np.float32).tolist()
    tri = gram_matrix(_mk_ds(vecs), "embedding", d)
    cov = dense_from_triangle(tri, d, centered=True)
    lam, v = power_iteration(cov)
    w, vv = np.linalg.eigh(cov)
    assert lam == pytest.approx(w[-1], rel=1e-9)
    top = vv[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    np.testing.assert_allclose(v, top, atol=1e-7)


def test_power_iteration_zero_matrix():
    lam, v = power_iteration(np.zeros((5, 5)))
    assert lam == 0.0
    assert np.isfinite(v).all()


def test_projector_matches_numpy(ray_session):
    rng = np.random.default_rng(21)
    d = 12
    base = rng.standard_normal((200, d)) * 0.05
    base[:, 1] += rng.standard_normal(200) * 0.9      # dominant axis
    base[:, 4] += rng.standard_normal(200) * 0.4      # second axis
    vecs = base.astype(np.float32).tolist()
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(4)

    from jsonschema_validator_ray.stages.pca import (
        PcaProjector, Q_SCALE, dense_from_triangle, gram_matrix,
        power_iteration)

    tri = gram_matrix(ds, "embedding", d)
    cov = dense_from_triangle(tri, d, centered=True)
    q = np.floor(np.array(vecs, np.float64) * Q_SCALE)
    mu = q.mean(axis=0)
    comps = []
    m = cov.copy()
    for _ in range(2):
        lam, v = power_iteration(m)
        comps.append(v)
        m -= lam * np.outer(v, v)
    out = ds.map_batches(PcaProjector(
        "embedding", "vec_id", np.vstack(comps), mean=mu),
        batch_format="pyarrow").to_pandas().sort_values("vec_id")
    expect = (q - mu) @ np.vstack(comps).T
    np.testing.assert_allclose(out["pc1"].to_numpy(), expect[:, 0],
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(out["pc2"].to_numpy(), expect[:, 1],
                               rtol=1e-12, atol=1e-9)
    # deflated power iteration found the true top-2 subspace
    w, vv = np.linalg.eigh(cov)
    for k, v in enumerate(comps):
        assert abs(abs(v @ vv[:, -1 - k]) - 1.0) < 1e-6


def test_gram_exchange_path_agrees(ray_session):
    """block_gate=0 forces the (i, j)-cell hash exchange; the folded Gram
    must equal the driver-fold path exactly."""
    rng = np.random.default_rng(9)
    d = 8
    vecs = (rng.standard_normal((60, d)) * 0.3).astype(np.float32).tolist()
    ds = _mk_ds(vecs, blocks=5)
    fast = gram_matrix(ds, "embedding", d).to_pandas()
    slow = gram_matrix(ds, "embedding", d, block_gate=0).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(fast, slow)
