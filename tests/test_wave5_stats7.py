"""Final-round wave 7: Cronbach's alpha over quantized embedding dims
and the Gini decision stump."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def test_cronbach_matches_brute(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        cronbach_alpha_embeddings)

    rng = np.random.RandomState(5)
    base = rng.randn(20, 1)
    vecs = (base + rng.randn(20, 6) * 0.5).astype(np.float32)
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 20, pa.int32()),
    }), str(d / "embeddings.parquet"))
    out = cronbach_alpha_embeddings(str(d))

    v64 = vecs.astype(np.float64)
    scale = np.abs(v64).max(axis=1)
    q = np.floor(v64 * 127.0 / scale[:, None]).astype(np.int64)
    n, k = q.shape
    a = sum(int(n * (q[:, i] ** 2).sum() - q[:, i].sum() ** 2)
            for i in range(k))
    r = q.sum(axis=1)
    b = int(n * (r ** 2).sum() - r.sum() ** 2)
    assert int(out["n_vecs"].iloc[0]) == n
    assert int(out["k_items"].iloc[0]) == k
    assert int(out["a_num"].iloc[0]) == a
    assert int(out["b_num"].iloc[0]) == b
    ref = (k / (k - 1)) * (1 - a / b)
    assert out["alpha"].iloc[0] == pytest.approx(ref, rel=1e-12)
    # items share a strong common factor -> alpha should be high
    assert out["alpha"].iloc[0] > 0.5


def test_gini_stump_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import gini_stump_length_lang

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    # perfectly separable: en lengths {1,2}, de lengths {10, 11}
    langs = ["en", "en", "en", "de", "de"]
    vals = [1, 2, 2, 10, 11]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["x"] * 5),
        "lang": pa.array(langs),
        "source": pa.array(["web"] * 5),
        "n_chars": pa.array(vals, pa.int64()),
    }), str(d / "documents.parquet"))
    out = gini_stump_length_lang(str(d))
    assert int(out["threshold"].iloc[0]) == 2
    assert int(out["n_left"].iloc[0]) == 3
    assert int(out["n_right"].iloc[0]) == 2
    # pure split: score = 9/3 + 4/2 = 5.0, weighted gini 0
    assert out["score"].iloc[0] == pytest.approx(5.0)
    assert out["weighted_gini"].iloc[0] == pytest.approx(0.0)


def test_gini_stump_matches_brute(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import gini_stump_length_lang

    rng = np.random.RandomState(2)
    langs = ["en"] * 40 + ["de"] * 40
    vals = np.concatenate([rng.randint(1, 30, 40),
                           rng.randint(20, 60, 40)]).tolist()
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(80), pa.int64()),
        "text": pa.array(["x"] * 80),
        "lang": pa.array(langs),
        "source": pa.array(["web"] * 80),
        "n_chars": pa.array(vals, pa.int64()),
    }), str(d / "documents.parquet"))
    out = gini_stump_length_lang(str(d))

    v = np.array(vals)
    is_en = np.array([lg == "en" for lg in langs])
    best = None
    for t in sorted(set(vals))[:-1]:
        left = v <= t
        aL = int((left & is_en).sum()) ** 2 + int((left & ~is_en).sum()) ** 2
        aR = int((~left & is_en).sum()) ** 2 \
            + int((~left & ~is_en).sum()) ** 2
        s = aL / left.sum() + aR / (~left).sum()
        if best is None or s > best[1] + 1e-12:
            best = (t, s)
    assert int(out["threshold"].iloc[0]) == best[0]
    assert out["score"].iloc[0] == pytest.approx(best[1], rel=1e-12)


def test_gini_stump_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.dq import gini_stump_length_lang

    gated = gini_stump_length_lang(SF_SMOKE)
    forced = gini_stump_length_lang(SF_SMOKE, block_gate=0)
    pd.testing.assert_frame_equal(gated, forced)
