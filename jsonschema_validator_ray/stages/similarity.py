"""Similarity search over an embedding column (``list<float>``).

- :func:`topk_cosine` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put`` / task-spec capture); each batch computes a
  numpy matmul and emits its LOCAL top-k per query; a tiny final merge keeps
  the global top-k. Wall-clock scales linearly with corpus size and is
  embarrassingly parallel — the right baseline at any scale.
- :func:`topk_cosine_lsh` — the scale path: random-hyperplane bucket index
  (an IVF-flavored coarse quantizer); queries probe their own bucket plus
  all Hamming-1 neighbor buckets, scanning only matching rows. Recall <1 by
  construction; the tests measure it against brute force.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.clip(norms, 1e-12, None)


def _emb_matrix(batch: pa.Table, emb: str) -> np.ndarray:
    col = batch.column(emb)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        # infer dim from the list type so empty blocks produce a (0, d)
        # matrix instead of crashing reshape
        d = getattr(col.type, "list_size", None) or 1
        return np.empty((0, d), dtype=np.float32)
    if not hasattr(col, "flatten"):
        # Ray tensor-extension column (from_pandas of ndarray cells):
        # to_numpy yields the (n, d) matrix directly
        mat = col.to_numpy(zero_copy_only=False)
        if mat.dtype == object:
            mat = np.stack(mat)
        return mat.astype(np.float32)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(np.float32)


class _BatchTopK:
    """map_batches stage: per-batch partial top-k for every query."""

    def __init__(self, queries_ref, k: int, key: str, emb: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32))   # (nq, d)
        self.k = k
        self.key = key
        self.emb = emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty block → empty partial, not a crash
            return pa.table({
                "query_id": pa.array([], type=pa.int32()),
                self.key: pa.array([], type=batch.schema.field(self.key).type),
                "score": pa.array([], type=pa.float64()),
            })
        mat = _normalize(_emb_matrix(batch, self.emb))          # (n, d)
        sims = mat @ self.q.T                                   # (n, nq)
        keys = batch.column(self.key).to_numpy(zero_copy_only=False)
        n, nq = sims.shape
        k = min(self.k, n)
        out_q, out_key, out_score = [], [], []
        # per query: argpartition local top-k (vectorized per column)
        idx = np.argpartition(-sims, kth=k - 1, axis=0)[:k]     # (k, nq)
        for qi in range(nq):
            rows = idx[:, qi]
            out_q.extend([qi] * k)
            out_key.extend(keys[rows])
            out_score.extend(sims[rows, qi])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int32()),
            self.key: pa.array(out_key),
            "score": pa.array(np.asarray(out_score, dtype=np.float64)),
        })


def _finalize_topk(partials: pd.DataFrame, key: str, k: int
                   ) -> pd.DataFrame:
    """Partial-top-k rows → exact global head per query. Guards the
    empty-input case: a Dataset with no emitted partials loses its schema
    through to_pandas (repo conventions), so the sort columns must be rebuilt."""
    if "query_id" not in partials.columns:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int32),
                             key: pd.Series([], dtype=object),
                             "score": pd.Series([], dtype=np.float64)})
    partials = partials.sort_values(["query_id", "score", key],
                                    ascending=[True, False, True],
                                    kind="mergesort")
    return partials.groupby("query_id", as_index=False).head(k)                    .reset_index(drop=True)


def topk_cosine(ds, query_vecs, k: int, *, key: str = "vec_id",
                emb: str = "embedding", batch_size: int = 8192,
                concurrency: int | None = None) -> pd.DataFrame:
    """→ DataFrame (query_id, key, score) with exactly k rows per query,
    ordered by (query_id, -score, key). Ties broken by key ascending so the
    result is fully deterministic."""
    q = np.asarray(query_vecs, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    ref = ray.put(q) if q.nbytes > 4 << 20 else q
    kwargs: dict = dict(batch_format="pyarrow", batch_size=batch_size)
    partials = ds.select_columns([key, emb]).map_batches(
        _BatchTopK, fn_constructor_args=(ref, k, key, emb),
        concurrency=(1, concurrency or 2), **kwargs).to_pandas()
    # final merge: tiny (k rows per query per batch)
    return _finalize_topk(partials, key, k)


class LshIndex:
    """Random-hyperplane coarse index: bucket id = sign pattern of n_planes
    projections. Build once (a map_batches pass adding the bucket column +
    write partitioned by bucket), then probe per query."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.n_planes = n_planes

    def buckets_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (_normalize(mat) @ self.planes) > 0
        out = np.zeros(mat.shape[0], dtype=np.uint32)
        for p in range(self.n_planes):
            out |= signs[:, p].astype(np.uint32) << np.uint32(p)
        return out

    def probe_set(self, qvec: np.ndarray) -> list[int]:
        b = int(self.buckets_of(qvec[None, :])[0])
        return [b] + [b ^ (1 << p) for p in range(self.n_planes)]


def topk_cosine_lsh(ds, query_vecs, k: int, *, key: str = "vec_id",
                    emb: str = "embedding", n_planes: int = 8,
                    seed: int = 42, batch_size: int = 8192) -> pd.DataFrame:
    """Approximate top-k: scan only rows whose bucket is in each query's
    probe set (own bucket + Hamming-1). Same output schema as topk_cosine."""
    first = ds.take(1)
    if not first:   # empty corpus → empty result, not IndexError
        return _finalize_topk(pd.DataFrame(), key, k)
    dim = len(first[0][emb])
    index = LshIndex(dim, n_planes=n_planes, seed=seed)
    q = np.asarray(query_vecs, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    qn = _normalize(q)
    probe_lists = [set(index.probe_set(qv)) for qv in qn]

    def scan(batch: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(batch, emb))
        buckets = index.buckets_of(mat)
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        out_q, out_key, out_score = [], [], []
        for qi, probes in enumerate(probe_lists):
            mask = np.isin(buckets, list(probes))
            if not mask.any():
                continue
            sub = mat[mask]
            sims = sub @ qn[qi]
            kk = min(k, len(sims))
            rows = np.argpartition(-sims, kth=kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_key.extend(keys[mask][rows])
            out_score.extend(sims[rows])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int32()),
            key: pa.array(out_key,
                          type=batch.schema.field(key).type),
            "score": pa.array(np.asarray(out_score, dtype=np.float64)),
        })

    partials = ds.select_columns([key, emb]).map_batches(
        scan, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    partials = partials.sort_values(
        ["query_id", "score", key], ascending=[True, False, True],
        kind="mergesort")
    return partials.groupby("query_id", as_index=False).head(k) \
                   .reset_index(drop=True)


def quantize_batch(batch: pa.Table, *, key: str = "vec_id",
                   emb: str = "embedding", levels: int = 127) -> pa.Table:
    """Per-vector symmetric int8-style quantization (the embedding-index
    compression step: q_i = floor(x_i · levels / max|x|)) — fully
    vectorized via reduceat over the flattened list buffer, reported as a
    per-vector digest (scale + sum/min/max of the quantized codes) so the
    result is scalar-exact against a SQL oracle:

    - ``scale`` = max|x| (a pure max of casts — no accumulated arithmetic);
    - every code computed in float64 (cast → ·levels → /scale → floor: the
      same IEEE op sequence DuckDB's DOUBLE lambda performs, so each code
      is bit-identical cross-engine); all-zero vectors quantize to 0.

    Output (key, scale float64, q_sum/q_min/q_max int64); null or empty
    embeddings yield a null scale and zero digests."""
    import pyarrow.compute as pc

    col = batch.column(emb)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = batch.num_rows
    lengths = pc.fill_null(pc.list_value_length(col), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    # list_flatten concatenates NON-NULL rows' values in row order, so the
    # flat buffer segments exactly by `lengths` (null/empty rows are 0)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
        .astype(np.float64)

    scale = np.full(n, np.nan)
    q_sum = np.zeros(n, dtype=np.int64)
    q_min = np.zeros(n, dtype=np.int64)
    q_max = np.zeros(n, dtype=np.int64)
    live = np.flatnonzero(lengths > 0)
    if live.size:
        ends = np.cumsum(lengths[live])
        segstarts = np.concatenate(([0], ends[:-1]))
        sc = np.maximum.reduceat(np.abs(flat), segstarts)
        scale[live] = sc
        per_elem = np.repeat(sc, lengths[live])
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor(flat * float(levels) / per_elem)
        q = np.nan_to_num(q, nan=0.0, posinf=0.0, neginf=0.0)  # scale == 0
        q = q.astype(np.int64)
        q_sum[live] = np.add.reduceat(q, segstarts)
        q_min[live] = np.minimum.reduceat(q, segstarts)
        q_max[live] = np.maximum.reduceat(q, segstarts)
    return pa.table({
        key: batch.column(key),
        "scale": pa.array(scale, type=pa.float64(), from_pandas=True),
        "q_sum": pa.array(q_sum),
        "q_min": pa.array(q_min),
        "q_max": pa.array(q_max),
    })
