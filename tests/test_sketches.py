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
