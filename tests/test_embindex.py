"""Persisted embedding near-dup index (stages/embindex): full-probe parity
with brute-force cosine, nprobe=1 ≡ one-shot same-cell semantics,
generational update ≡ full rebuild, survivor anti-join, caps, empties."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data

from jsonschema_validator_ray.stages.embindex import (
    dedup_near_incremental_emb, index_vec_count, load_emb_centroids,
    probe_emb_index, update_emb_index, write_emb_index)
from jsonschema_validator_ray.stages.ivf import IvfIndex, train_centroids
from jsonschema_validator_ray.stages.similarity import _normalize

D = 8


def _mk_vecs(n, seed, planted_from=None, n_planted=0, noise=0.01):
    """n random unit vectors; optionally the first n_planted are near-copies
    of rows of planted_from (cosine ≈ 1)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, D)).astype(np.float32)
    if planted_from is not None and n_planted:
        v[:n_planted] = (planted_from[:n_planted]
                         + noise * rng.normal(size=(n_planted, D))
                         .astype(np.float32))
    return _normalize(v).astype(np.float32)


def _ds(ids, vecs):
    return ray.data.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": list(vecs)}))


def _brute_pairs(new_ids, new_vecs, hist_ids, hist_vecs, threshold):
    sims = _normalize(new_vecs).astype(np.float32) \
        @ _normalize(hist_vecs).astype(np.float32).T
    ii, jj = np.nonzero(sims >= threshold)
    return sorted(zip(np.asarray(new_ids)[ii], np.asarray(hist_ids)[jj]))


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "embindex")


def test_full_probe_matches_brute_force(ray_session, root):
    hist = _mk_vecs(120, seed=1)
    new = _mk_vecs(40, seed=2, planted_from=hist, n_planted=6)
    hids = np.arange(120)
    nids = np.arange(1000, 1040)
    write_emb_index(_ds(hids, hist), root, n_clusters=5, seed=3)
    # nprobe = n_clusters → every (new, hist) pair is examined exactly once
    got = probe_emb_index(_ds(nids, new), root, threshold=0.9, nprobe=5,
                          probe_buckets=4).to_pandas()
    want = _brute_pairs(nids, new, hids, hist, 0.9)
    assert sorted(zip(got.key_a, got.key_b)) == want
    assert len(want) >= 6          # the planted near-copies are all found
    assert (got.truncated == 0).all()
    # a pair is emitted at most once even with nprobe > 1
    assert not got.duplicated(["key_a", "key_b"]).any()


def test_nprobe1_same_cell_semantics(ray_session, root):
    hist = _mk_vecs(100, seed=5)
    new = _mk_vecs(30, seed=6, planted_from=hist, n_planted=5, noise=0.005)
    hids, nids = np.arange(100), np.arange(500, 530)
    write_emb_index(_ds(hids, hist), root, n_clusters=4, seed=7)
    got = probe_emb_index(_ds(nids, new), root, threshold=0.95, nprobe=1,
                          probe_buckets=4).to_pandas()
    # expected: brute-force pairs RESTRICTED to same assigned cell — the
    # one-shot SemDeDup candidate semantics
    index = load_emb_centroids(root)
    ch = index.assign(hist)
    cn = index.assign(new)
    sims = _normalize(new).astype(np.float32) \
        @ _normalize(hist).astype(np.float32).T
    ii, jj = np.nonzero((sims >= 0.95) & (cn[:, None] == ch[None, :]))
    want = sorted(zip(nids[ii], hids[jj]))
    assert sorted(zip(got.key_a, got.key_b)) == want
    assert len(want) >= 5      # near-copies share the cell by construction


def test_update_equals_rebuild(ray_session, root):
    a = _mk_vecs(60, seed=10)
    b = _mk_vecs(60, seed=11)
    probe = _mk_vecs(25, seed=12, planted_from=np.vstack([a[:3], b[:3]]),
                     n_planted=6)
    aids, bids = np.arange(60), np.arange(100, 160)
    pids = np.arange(9000, 9025)
    # frozen quantizer shared by both paths (parity needs identical cells)
    idx = IvfIndex(train_centroids(np.vstack([a, b]), 4, seed=13))

    write_emb_index(_ds(aids, a), root, index=idx)
    update_emb_index(_ds(bids, b), root)
    incr = probe_emb_index(_ds(pids, probe), root, threshold=0.9,
                           nprobe=4, probe_buckets=4).to_pandas()

    root2 = root + "_oneshot"
    write_emb_index(_ds(np.concatenate([aids, bids]), np.vstack([a, b])),
                    root2, index=idx)
    full = probe_emb_index(_ds(pids, probe), root2, threshold=0.9,
                           nprobe=4, probe_buckets=4).to_pandas()
    shutil.rmtree(root2, ignore_errors=True)

    ki = incr.sort_values(["key_a", "key_b"]).reset_index(drop=True)
    kf = full.sort_values(["key_a", "key_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ki, kf)
    assert len(ki) >= 6
    assert index_vec_count(root) == 120


def test_compaction_probe_identical(ray_session, root):
    from jsonschema_validator_ray.stages.embindex import compact_emb_index

    a, b = _mk_vecs(50, seed=40), _mk_vecs(50, seed=41)
    probe = _mk_vecs(20, seed=42, planted_from=np.vstack([a[:3], b[:3]]),
                     n_planted=6)
    write_emb_index(_ds(np.arange(50), a), root, n_clusters=4, seed=43)
    update_emb_index(_ds(np.arange(100, 150), b), root)
    pids = np.arange(9000, 9020)
    before = probe_emb_index(_ds(pids, probe), root, threshold=0.9,
                             nprobe=4, probe_buckets=4).to_pandas() \
        .sort_values(["key_a", "key_b"]).reset_index(drop=True)
    compact_emb_index(root)
    from jsonschema_validator_ray.stages.util import read_meta
    assert len(read_meta(root)["generations"]) == 1
    assert index_vec_count(root) == 100
    after = probe_emb_index(_ds(pids, probe), root, threshold=0.9,
                            nprobe=4, probe_buckets=4).to_pandas() \
        .sort_values(["key_a", "key_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    assert len(before) >= 6
    # compacting a single generation is a no-op
    compact_emb_index(root)
    assert index_vec_count(root) == 100


def test_dedup_survivors_and_empty(ray_session, root):
    hist = _mk_vecs(50, seed=20)
    new = _mk_vecs(20, seed=21, planted_from=hist, n_planted=4, noise=0.003)
    write_emb_index(_ds(np.arange(50), hist), root, n_clusters=3, seed=22)
    survivors, matched = dedup_near_incremental_emb(
        _ds(np.arange(700, 720), new), root, threshold=0.97, nprobe=3,
        probe_buckets=2)
    m = matched.to_pandas()
    s = survivors.to_pandas()
    assert set(s.vec_id) == set(range(700, 720)) - set(m.key_a)
    assert len(m) >= 4
    # orthogonal probe → no matches, survivors pass through untouched
    ortho = _mk_vecs(5, seed=23)
    sv2, m2 = dedup_near_incremental_emb(
        _ds(np.arange(30, 35), ortho), root, threshold=0.9999, nprobe=1)
    assert m2.count() == 0
    assert sorted(sv2.to_pandas().vec_id) == list(range(30, 35))
    # empty increment: update is a no-op, probe returns no pairs
    gens_before = index_vec_count(root)
    empty = _ds(np.array([], dtype=np.int64),
                np.empty((0, D), dtype=np.float32))
    update_emb_index(empty, root)
    assert index_vec_count(root) == gens_before
    assert probe_emb_index(empty, root, threshold=0.5).count() == 0


def test_cluster_cap_truncates_honestly(ray_session, root):
    # one tight bundle → everything lands in one cell; cap below the cell
    # size forces truncation and every emitted pair says so
    base = _normalize(np.ones((1, D), dtype=np.float32))
    hist = _mk_vecs(30, seed=30, planted_from=np.repeat(base, 30, axis=0),
                    n_planted=30, noise=0.01)
    new = _mk_vecs(10, seed=31, planted_from=np.repeat(base, 10, axis=0),
                   n_planted=10, noise=0.01)
    write_emb_index(_ds(np.arange(30), hist), root, n_clusters=2, seed=32)
    got = probe_emb_index(_ds(np.arange(100, 110), new), root,
                          threshold=0.5, nprobe=1, cluster_cap=8,
                          probe_buckets=2).to_pandas()
    assert len(got) > 0
    assert (got.truncated == 1).all()
    # the capped history side keeps its cell's smallest keys
    index = load_emb_centroids(root)
    ch = index.assign(hist)
    probed_cells = set(index.assign(new))
    for cell in probed_cells:
        members = sorted(np.flatnonzero(ch == cell))
        kept = set(got.key_b) & set(np.flatnonzero(ch == cell))
        assert kept <= set(members[:8])
