"""Sketch accuracy + merge tests (HLL, t-digest, histograms, PSI/KL)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jsonschema_validator_ray.state import (
    CategoricalHistogram,
    HyperLogLog,
    NumericHistogram,
    TDigest,
    kl_divergence,
    psi,
)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50_000_000, size=300_000)
    true = len(np.unique(vals))
    h = pd.util.hash_pandas_object(pd.Series(vals), index=False).to_numpy()
    parts = [HyperLogLog() for _ in range(6)]
    for i, p in enumerate(parts):
        p.add_hashes(h[i::6])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(HyperLogLog.from_bytes(p.to_bytes()))
    est = merged.estimate()
    # p=14 → standard error ~1.04/sqrt(16384) ≈ 0.8%; allow 4 sigma
    assert abs(est - true) / true < 0.033


def test_hll_small_range_linear_counting():
    h = HyperLogLog()
    h.add_values([f"v{i}" for i in range(500)])
    assert abs(h.estimate() - 500) / 500 < 0.02


def test_hll_merge_is_idempotent():
    h1 = HyperLogLog()
    h1.add_values(list(range(1000)))
    before = h1.estimate()
    h1.merge(HyperLogLog.from_bytes(h1.to_bytes()))
    assert h1.estimate() == before


def test_tdigest_quantiles():
    rng = np.random.default_rng(11)
    data = rng.lognormal(3, 1, size=200_000)
    parts = [TDigest() for _ in range(8)]
    for i, t in enumerate(parts):
        t.add_values(data[i::8])
    td = parts[0]
    for t in parts[1:]:
        td.merge(TDigest.from_bytes(t.to_bytes()))
    assert td.count == pytest.approx(len(data))
    for q in (0.05, 0.5, 0.95, 0.99):
        exact = np.quantile(data, q)
        # relative error loose in the middle, tight-ish at tails
        assert abs(td.quantile(q) - exact) / exact < 0.05, q


def test_tdigest_tiny_inputs():
    td = TDigest()
    assert np.isnan(td.quantile(0.5))
    td.add_values(np.array([42.0]))
    assert td.quantile(0.5) == 42.0
    td.add_values(np.array([0.0]))
    assert 0.0 <= td.quantile(0.5) <= 42.0


def test_numeric_histogram_merge_and_clip():
    edges = np.linspace(0, 10, 6)
    a = NumericHistogram(edges)
    a.add_values(np.array([-5.0, 0.5, 3.0, 100.0, np.nan]))  # clipped into range
    assert a.counts.sum() == 4 and a.n_null == 1
    b = NumericHistogram.from_json(a.to_json())
    b.merge(a)
    assert b.counts.sum() == 8


def test_categorical_histogram_other_bucket():
    h = CategoricalHistogram(["en", "de", "fr"])
    h.add_counts({"en": 10, "de": 5, "zz": 3})
    assert h.other == 3
    p = h.proportions()
    assert len(p) == 4 and p.sum() == pytest.approx(1.0)


def test_psi_kl_direction():
    same = psi([0.25, 0.25, 0.25, 0.25], [0.24, 0.26, 0.25, 0.25])
    drift = psi([0.25, 0.25, 0.25, 0.25], [0.7, 0.1, 0.1, 0.1])
    assert same < 0.01 < 0.25 < drift
    assert kl_divergence([0.5, 0.5], [0.5, 0.5]) == pytest.approx(0.0, abs=1e-9)
    assert kl_divergence([0.9, 0.1], [0.1, 0.9]) > 0.5


def test_count_min_sketch_bounds():
    import numpy as np

    from jsonschema_validator_ray.state.cms import CountMinSketch

    rng = np.random.RandomState(3)
    vals = rng.zipf(1.5, 20000) % 1000
    cms = CountMinSketch(depth=5, width=16384)
    cms.add_values(vals)
    import pandas as pd
    true = pd.Series(vals).value_counts()
    est = cms.estimate(true.index.to_numpy())
    assert (est >= true.to_numpy()).all()          # never undercounts
    # ε = e/width → error ≤ ε·N with prob 1-e^-depth; allow 3× slack
    eps_n = np.e / 16384 * len(vals) * 3
    assert (est - true.to_numpy()).max() <= max(eps_n, 5)
    # wire format round-trips and merges
    half1, half2 = vals[:10000], vals[10000:]
    a, b = CountMinSketch(5, 16384), CountMinSketch(5, 16384)
    a.add_values(half1); b.add_values(half2)
    m = CountMinSketch.from_bytes(a.to_bytes()).merge(
        CountMinSketch.from_bytes(b.to_bytes()))
    assert (m.estimate(true.index.to_numpy()) == est).all()
    assert m.n == cms.n == len(vals)


def test_heavy_hitters_recovers_top_k(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.heavyhitters import heavy_hitters

    rng = np.random.RandomState(9)
    # 20 planted heavies over a wide tail
    tail = rng.randint(1000, 200000, 30000)
    heavies = np.repeat(np.arange(20), np.linspace(4000, 400, 20).astype(int))
    vals = np.concatenate([tail, heavies])
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    out = heavy_hitters(ds, "v", k=10, batch_size=4096)
    true_top = pd.Series(vals).value_counts().head(10)
    assert set(out["value"]) == set(true_top.index)
    true_counts = pd.Series(vals).value_counts()
    for _, r in out.iterrows():
        assert r["est_count"] >= true_counts[r["value"]]
        assert r["est_count"] <= true_counts[r["value"]] + np.e / 16384 * len(vals) * 3


def test_heavy_hitters_with_nulls(ray_session):
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.heavyhitters import heavy_hitters

    df = pd.DataFrame({"v": ["a"] * 50 + [None] * 40 + ["b"] * 30 + ["c"]})
    out = heavy_hitters(ray.data.from_pandas(df), "v", k=2)
    assert list(out["value"]) == ["a", "b"]       # null never a candidate
    assert out["est_count"].iloc[0] >= 50
