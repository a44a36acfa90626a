"""SemDeDup: planted semantic duplicates, brute-force parity, keep rules."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from jsonschema_validator_ray.stages.semdedup import semantic_dedup


def _vectors():
    rng = np.random.default_rng(5)
    base = rng.standard_normal((4, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(4):
        for i in range(10):
            v = base[c] + rng.standard_normal(16) * 0.25
            rows.append((vid, v / np.linalg.norm(v)))
            vid += 1
    # planted near-exact duplicates of vectors 0, 11, 22 (tiny jitter)
    for src in (0, 11, 22):
        v = rows[src][1] + rng.standard_normal(16) * 1e-4
        rows.append((1000 + src, v / np.linalg.norm(v)))
    return pd.DataFrame({"vec_id": [r[0] for r in rows],
                         "embedding": [r[1].astype(np.float32).tolist()
                                       for r in rows]})


def _brute_survivors(df, threshold):
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in df["embedding"]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    keys = df["vec_id"].to_numpy()
    order = np.argsort(keys)
    mat, keys = mat[order], keys[order]
    sims = mat @ mat.T
    adj = sims >= threshold
    np.fill_diagonal(adj, True)
    lab = np.arange(len(keys))
    while True:
        new = np.minimum(lab, np.where(adj, lab[None, :], 10**9).min(axis=1))
        if np.array_equal(new, lab):
            break
        lab = new
    return set(keys[lab == np.arange(len(keys))])


def test_planted_duplicates_dropped(ray_session):
    df = _vectors()
    out = semantic_dedup(ray.data.from_pandas(df), n_clusters=4,
                         threshold=0.999, sample_size=50,
                         seed=3).to_pandas()
    assert len(out) == len(df)
    dropped = set(out.loc[~out["keep"], "vec_id"])
    # each planted pair loses exactly its high key
    assert dropped == {1000, 1011, 1022}
    assert out["truncated"].max() == 0


def test_global_parity_with_brute_force(ray_session):
    # threshold high enough that no component spans clusters → the
    # clustered result must equal a global brute-force dedup
    df = _vectors()
    out = semantic_dedup(ray.data.from_pandas(df), n_clusters=4,
                         threshold=0.999, sample_size=50,
                         seed=3).to_pandas()
    kept = set(out.loc[out["keep"], "vec_id"])
    assert kept == _brute_survivors(df, 0.999)


def test_far_from_centroid_rule(ray_session):
    df = _vectors()
    out = semantic_dedup(ray.data.from_pandas(df), n_clusters=4,
                         threshold=0.999, keep="far_from_centroid",
                         sample_size=50, seed=3).to_pandas()
    # one survivor per planted pair, deterministic
    for a, b in ((0, 1000), (11, 1011), (22, 1022)):
        pair = out[out["vec_id"].isin([a, b])]
        assert pair["keep"].sum() == 1
    out2 = semantic_dedup(ray.data.from_pandas(df), n_clusters=4,
                          threshold=0.999, keep="far_from_centroid",
                          sample_size=50, seed=3).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("vec_id").reset_index(drop=True),
        out2.sort_values("vec_id").reset_index(drop=True))


def test_cluster_cap_passthrough(ray_session):
    df = _vectors()
    out = semantic_dedup(ray.data.from_pandas(df), n_clusters=1,
                         threshold=0.999, cluster_cap=20,
                         sample_size=50, seed=3).to_pandas()
    assert len(out) == len(df)
    assert out["truncated"].max() == 1
    # overflow members pass through unexamined (keep=True)
    assert out["keep"].sum() >= len(df) - 20
