"""IVF ANN: centroid training, assignment, probe recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


def test_spherical_kmeans_separates_clusters():
    from jsonschema_validator_ray.stages.ivf import IvfIndex, train_centroids

    rng = np.random.default_rng(1)
    c1 = rng.standard_normal(8) * 0.1 + np.array([5, 0, 0, 0, 0, 0, 0, 0])
    c2 = rng.standard_normal(8) * 0.1 + np.array([0, 5, 0, 0, 0, 0, 0, 0])
    pts = np.vstack([c1 + rng.standard_normal((50, 8)) * 0.2,
                     c2 + rng.standard_normal((50, 8)) * 0.2]).astype(np.float32)
    index = IvfIndex(train_centroids(pts, 2, seed=3))
    assign = index.assign(pts)
    # the two halves land in different clusters
    assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
    assert assign[0] != assign[60]


def test_ivf_recall_vs_bruteforce(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.ivf import (
        assign_clusters, build_ivf, topk_cosine_ivf)
    from jsonschema_validator_ray.stages.similarity import topk_cosine

    emb = ray.data.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    index = build_ivf(emb, n_clusters=8, seed=7)
    q = np.array(emb.take(5)[4]["embedding"], dtype=np.float32)
    exact = list(topk_cosine(emb, q, k=10, batch_size=128)["vec_id"])
    approx = list(topk_cosine_ivf(emb, index, q, k=10, nprobe=4,
                                  batch_size=128)["vec_id"])
    # probing half the clusters: decent recall, top-1 must survive
    assert exact[0] == approx[0]
    assert len(set(exact) & set(approx)) >= 5

    # assignment column covers all rows and all clusters are in range
    assigned = assign_clusters(emb, index).to_pandas()
    assert len(assigned) == emb.count()
    assert assigned["ivf_cluster"].between(0, 7).all()


def test_ivf_full_probe_equals_bruteforce(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.ivf import build_ivf, topk_cosine_ivf
    from jsonschema_validator_ray.stages.similarity import topk_cosine

    emb = ray.data.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    index = build_ivf(emb, n_clusters=4, seed=7)
    q = np.array(emb.take(1)[0]["embedding"], dtype=np.float32)
    exact = list(topk_cosine(emb, q, k=10, batch_size=128)["vec_id"])
    # nprobe = n_clusters → scans everything → identical to brute force
    full = list(topk_cosine_ivf(emb, index, q, k=10, nprobe=4,
                                batch_size=128)["vec_id"])
    assert exact == full


def test_ivf_persisted_index_roundtrip(ray_session, tmp_path):
    """write_ivf_index → pruned-read search: pruned result == in-memory IVF
    probe; full probe == brute force; only probed dirs are opened."""
    import os

    import ray.data

    from jsonschema_validator_ray.stages.ivf import (
        build_ivf, load_ivf_index, topk_cosine_ivf, topk_cosine_ivf_index,
        write_ivf_index)
    from jsonschema_validator_ray.stages.similarity import topk_cosine

    emb = ray.data.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    index = build_ivf(emb, n_clusters=8, seed=7)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, index, path)

    # layout: one dir per non-empty cell + the centroid sidecar
    dirs = [d for d in os.listdir(path) if d.startswith("ivf_cluster=")]
    assert 1 <= len(dirs) <= 8
    assert os.path.exists(os.path.join(path, "centroids.json"))
    loaded = load_ivf_index(path)
    assert np.allclose(loaded.centroids, index.centroids)

    q = np.array(emb.take(5)[4]["embedding"], dtype=np.float32)
    mem = topk_cosine_ivf(emb, index, q, k=10, nprobe=4, batch_size=128)
    disk = topk_cosine_ivf_index(path, q, k=10, nprobe=4, batch_size=128)
    assert list(mem["vec_id"]) == list(disk["vec_id"])
    assert np.allclose(mem["score"], disk["score"])

    # full probe over the persisted layout == brute force over the corpus
    exact = topk_cosine(emb, q, k=10, batch_size=128)
    full = topk_cosine_ivf_index(path, q, k=10, nprobe=8, batch_size=128)
    assert list(full["vec_id"]) == list(exact["vec_id"])
    assert np.allclose(full["score"], exact["score"])

    # multi-query: two queries, per-query probe filtering
    q2 = np.stack([q, np.array(emb.take(3)[2]["embedding"],
                               dtype=np.float32)])
    multi = topk_cosine_ivf_index(path, q2, k=5, nprobe=8, batch_size=128)
    assert set(multi["query_id"]) == {0, 1}
    assert (multi.groupby("query_id").size() == 5).all()
