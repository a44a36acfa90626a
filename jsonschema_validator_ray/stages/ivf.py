"""IVF (inverted-file) approximate nearest-neighbor search.

The classic coarse-quantizer design (public: Sivic & Zisserman 2003 "Video
Google"; FAISS IVF-Flat): k-means centroids learned from a SAMPLE on the
driver (numpy Lloyd iterations — the sample is small; the corpus never
funnels through the driver), broadcast to workers; every vector is assigned
to its nearest centroid (one vectorized ``map_batches`` pass); a query
scans only the ``nprobe`` nearest centroid lists.

Compared to the random-hyperplane LSH variant (stages/similarity.py), IVF
adapts its partitions to the data distribution — better recall at equal
probe cost on clustered embeddings.

Scale shape: train once (sample ≈ 50×n_clusters vectors), assign in one
streaming pass (optionally write the assignment column to Parquet
partitioned by ``ivf_cluster`` so queries read only matching partitions),
probe = filtered brute-force over ~nprobe/n_clusters of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .similarity import _emb_matrix, _normalize


def train_centroids(sample: np.ndarray, n_clusters: int, *,
                    n_iter: int = 10, seed: int = 42) -> np.ndarray:
    """Spherical k-means (cosine metric: normalize, maximize dot product)."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float32))
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    cents = x[idx].copy()
    for _ in range(n_iter):
        sims = x @ cents.T                      # (n, k)
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


class IvfIndex:
    """Centroids + assignment/probe kernels. Build with :func:`build_ivf`."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float32))

    def assign(self, mat: np.ndarray) -> np.ndarray:
        return (_normalize(mat) @ self.centroids.T).argmax(axis=1)

    def probe_clusters(self, qvec: np.ndarray, nprobe: int) -> np.ndarray:
        sims = self.centroids @ _normalize(qvec[None, :])[0]
        return np.argsort(-sims)[:nprobe]


def build_ivf(ds, *, emb: str = "embedding", n_clusters: int = 16,
              sample_size: int | None = None, seed: int = 42) -> IvfIndex:
    """Train the coarse quantizer from a corpus sample (driver-side numpy;
    sample defaults to 50×n_clusters vectors)."""
    want = sample_size or (50 * n_clusters)
    total = ds.count()
    frac = min(1.0, want / max(total, 1))
    sample_rows = ds.select_columns([emb]).random_sample(frac, seed=seed) \
                    .take(want)
    sample = np.stack([np.asarray(r[emb], dtype=np.float32)
                       for r in sample_rows])
    return IvfIndex(train_centroids(sample, n_clusters, seed=seed))


def assign_clusters(ds, index: IvfIndex, *, key: str = "vec_id",
                    emb: str = "embedding", batch_size: int = 8192):
    """→ Dataset with an ``ivf_cluster`` column added (write partitioned by
    it for probe-time partition pruning)."""

    def f(b: pa.Table) -> pa.Table:
        mat = _emb_matrix(b, emb)
        return b.append_column("ivf_cluster",
                               pa.array(index.assign(mat).astype(np.int32)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def write_ivf_index(ds, index: IvfIndex, path: str, *,
                    key: str = "vec_id", emb: str = "embedding",
                    batch_size: int = 8192) -> None:
    """Persist the corpus as an IVF-partitioned Parquet layout: one
    ``ivf_cluster=<c>/`` directory per coarse cell plus the centroids as a
    small JSON sidecar. THIS is the 100-TB shape: assignment is one
    streaming pass, the write is resumable per partition, and a probe-time
    reader opens only the ``nprobe`` matching directories — I/O scales with
    the probed fraction of the corpus, not its size."""
    import json
    import os

    assigned = assign_clusters(ds, index, key=key, emb=emb,
                               batch_size=batch_size)
    assigned.write_parquet(path, partition_cols=["ivf_cluster"])
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump({"centroids": index.centroids.tolist()}, f)


def load_ivf_index(path: str) -> IvfIndex:
    """Load the coarse quantizer persisted by :func:`write_ivf_index`."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as f:
        d = json.load(f)
    return IvfIndex(np.asarray(d["centroids"], dtype=np.float32))


def topk_cosine_ivf_index(path: str, query_vecs, k: int, *,
                          key: str = "vec_id", emb: str = "embedding",
                          nprobe: int = 4, batch_size: int = 8192
                          ) -> pd.DataFrame:
    """Approximate top-k over a PERSISTED IVF layout with partition-pruned
    reads: only the union of the queries' ``nprobe`` nearest cluster
    directories is opened (each read as its own dataset with a constant
    cluster column — no reliance on hive-partition parsing), then one
    vectorized scan filters each query to its own probe set. Same output
    contract as :func:`topk_cosine_ivf`; with ``nprobe = n_clusters`` the
    result is exactly the brute-force top-k (every row scanned once)."""
    import os

    index = load_ivf_index(path)
    q = np.asarray(query_vecs, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    qn = _normalize(q)
    probe = [index.probe_clusters(qv, nprobe) for qv in qn]
    wanted = sorted({int(c) for p in probe for c in p})
    parts = []
    for c in wanted:
        d = os.path.join(path, f"ivf_cluster={c}")
        if not os.path.isdir(d):
            continue  # empty cell: no directory was written
        part = ray.data.read_parquet(d, columns=[key, emb])
        parts.append(part.map_batches(
            lambda b, _c=c: b.append_column(
                "ivf_cluster", pa.array(np.full(b.num_rows, _c, np.int32))),
            batch_format="pyarrow"))
    if not parts:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int32),
                             key: pd.Series([], dtype=object),
                             "score": pd.Series([], dtype=np.float64)})
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    probe_sets = [set(p.tolist()) for p in probe]

    def scan(b: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(b, emb))
        clusters = b.column("ivf_cluster").to_numpy(zero_copy_only=False)
        keys = b.column(key).to_numpy(zero_copy_only=False)
        out_q, out_key, out_score = [], [], []
        for qi, ws in enumerate(probe_sets):
            mask = np.isin(clusters, list(ws))
            if not mask.any():
                continue
            sims = mat[mask] @ qn[qi]
            kk = min(k, len(sims))
            rows = np.argpartition(-sims, kth=kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_key.extend(keys[mask][rows])
            out_score.extend(sims[rows])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int32()),
            key: pa.array(out_key, type=b.schema.field(key).type),
            "score": pa.array(np.asarray(out_score, dtype=np.float64)),
        })

    partials = ds.map_batches(scan, batch_format="pyarrow",
                              batch_size=batch_size).to_pandas()
    from .similarity import _finalize_topk

    return _finalize_topk(partials, key, k)


def topk_cosine_ivf(ds, index: IvfIndex, query_vecs, k: int, *,
                    key: str = "vec_id", emb: str = "embedding",
                    nprobe: int = 4, batch_size: int = 8192) -> pd.DataFrame:
    """Approximate top-k: scan only rows assigned to each query's ``nprobe``
    nearest clusters. Output (query_id, key, score) ordered by
    (query_id, -score, key) — same contract as similarity.topk_cosine."""
    q = np.asarray(query_vecs, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    qn = _normalize(q)
    probe = [set(index.probe_clusters(qv, nprobe).tolist()) for qv in qn]

    def scan(b: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(b, emb))
        clusters = index.assign(mat)
        keys = b.column(key).to_numpy(zero_copy_only=False)
        out_q, out_key, out_score = [], [], []
        for qi, wanted in enumerate(probe):
            mask = np.isin(clusters, list(wanted))
            if not mask.any():
                continue
            sims = mat[mask] @ qn[qi]
            kk = min(k, len(sims))
            rows = np.argpartition(-sims, kth=kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_key.extend(keys[mask][rows])
            out_score.extend(sims[rows])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int32()),
            key: pa.array(out_key, type=b.schema.field(key).type),
            "score": pa.array(np.asarray(out_score, dtype=np.float64)),
        })

    partials = ds.select_columns([key, emb]).map_batches(
        scan, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    from .similarity import _finalize_topk

    return _finalize_topk(partials, key, k)
