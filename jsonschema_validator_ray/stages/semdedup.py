"""Semantic deduplication over an embedding column (SemDeDup, Abbas et al.
2023): cluster the embeddings with spherical k-means, then within each
cluster drop all but one of every group of vectors whose pairwise cosine
similarity clears a threshold.

Distributed shape: the coarse quantizer trains on a driver-side sample
(stages/ivf.build_ivf — the corpus never funnels through the driver);
assignment is one vectorized ``argmax`` pass; the per-cluster dedup is a
``groupby(cluster)`` whose parallelism equals ``n_clusters`` — at corpus
scale the caller sizes ``n_clusters`` with the data (SemDeDup used 50k
clusters for LAION-scale; this is a scaling PARAMETER, not a fixed tiny
fan-out), and ``cluster_cap`` bounds any single task's m×m similarity
matrix (overflow members pass through unexamined with ``truncated=1``, the
same honest-cap contract as stages/dedup).

Survivor rule: within a cluster, connected components of the τ-similarity
graph (computed by vectorized min-label propagation over the boolean
adjacency — the same transitive-closure semantics as the repo's
MinHash-components near-dedup), keep the MIN KEY of each component. This
is deterministic and order-free; the paper's "keep the example farthest
from the centroid" is available as ``keep='far_from_centroid'``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ivf import IvfIndex, assign_clusters, build_ivf
from .similarity import _emb_matrix, _normalize


def _components_min_label(adj: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Min label per connected component of a boolean adjacency matrix —
    vectorized label propagation, converges in O(log diameter) rounds of
    (m × m) masked minima."""
    lab = labels.astype(np.int64).copy()
    big = np.iinfo(np.int64).max
    while True:
        neigh = np.where(adj, lab[None, :], big).min(axis=1)
        new = np.minimum(lab, neigh)
        if np.array_equal(new, lab):
            return lab
        lab = new


def semantic_dedup(ds, *, key: str = "vec_id", emb: str = "embedding",
                   n_clusters: int = 16, threshold: float = 0.95,
                   keep: str = "min_key", cluster_cap: int = 4096,
                   sample_size: int = 4096, seed: int = 42,
                   batch_size: int = 4096):
    """→ Dataset ``(key, cluster, keep, truncated)`` — one row per input
    vector; filter ``keep`` for the survivors. ``keep='min_key'`` keeps
    each τ-component's smallest key; ``keep='far_from_centroid'`` keeps its
    member with the LOWEST centroid similarity (the SemDeDup paper's rule),
    tie-broken by key."""
    if keep not in ("min_key", "far_from_centroid"):
        raise ValueError(f"unknown keep rule {keep!r}")
    index = build_ivf(ds, emb=emb, n_clusters=n_clusters,
                      sample_size=sample_size, seed=seed)
    centroids = _normalize(index.centroids)

    def add_vec(b: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(b, emb))
        cl = IvfIndex(centroids).assign(mat)
        return pa.table({
            key: b.column(key),
            "cluster": pa.array(cl.astype(np.int32)),
            "__v": pa.array(list(mat.astype(np.float32))),
        })

    assigned = ds.select_columns([key, emb]).map_batches(
        add_vec, batch_format="pyarrow", batch_size=batch_size)

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key, kind="mergesort").reset_index(drop=True)
        over = len(g) - cluster_cap
        passthrough = g.iloc[cluster_cap:] if over > 0 else None
        g = g.iloc[:cluster_cap]
        m = len(g)
        mat = np.stack(g["__v"].to_numpy()).astype(np.float64)
        sims = mat @ mat.T
        adj = sims >= threshold
        np.fill_diagonal(adj, True)
        comp = _components_min_label(adj, np.arange(m))
        if keep == "min_key":
            keep_mask = comp == np.arange(m)
        else:
            c = int(g["cluster"].iloc[0])
            cs = mat @ centroids[c]
            # lowest centroid similarity wins; ties → smallest row index
            order = np.lexsort((np.arange(m), cs))
            rank = np.empty(m, dtype=np.int64)
            rank[order] = np.arange(m)
            best = pd.Series(rank).groupby(comp).transform("min").to_numpy()
            keep_mask = rank == best
        out = pd.DataFrame({
            key: g[key].to_numpy(),
            "cluster": g["cluster"].to_numpy(),
            "keep": keep_mask,
            "truncated": np.int32(1 if over > 0 else 0)})
        if passthrough is not None:
            out = pd.concat([out, pd.DataFrame({
                key: passthrough[key].to_numpy(),
                "cluster": passthrough["cluster"].to_numpy(),
                "keep": True, "truncated": np.int32(1)})],
                ignore_index=True)
        return out

    return assigned.groupby("cluster").map_groups(dedup_cluster,
                                                  batch_format="pandas")
