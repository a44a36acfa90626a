"""Persisted embedding index for INCREMENTAL cross-run SEMANTIC near-dedup:
probe each new crawl's embeddings against everything already ingested
WITHOUT rescanning (or re-embedding) the history — the cross-crawl
extension of the SemDeDup contract (stages/semdedup, Abbas et al. 2023),
completing the incremental-state story (stages/hashindex = exact,
stages/minhashindex = lexical near, THIS = semantic near).

Layout (generational, same crash contract as the sibling stores):

- ``centroids.parquet`` — the coarse quantizer (spherical k-means,
  stages/ivf.train_centroids), trained ONCE at creation and fixed so every
  later generation partitions identically (an index whose cells drift
  between runs cannot be probed consistently);
- ``gen-<g>/ivf_cluster=<c>/`` — one ``(key, emb)`` row per vector,
  L2-normalized float32 (cosine ≡ dot on normalized vectors), partitioned
  by coarse cell;
- ``meta.json`` — config + completed-generation list, atomically replaced
  AFTER a generation's data lands; a killed update leaves the previous
  index intact.

Probe dataflow (new side only is shuffled; history is partition-pruned
reads inside the cell tasks):

    new vecs → assign to nprobe nearest cells (one vectorized map_batches
    against the broadcast centroids) → groupby(cell-hash bucket): each
    task loads ITS cells' history partitions (I/O ∝ corpus/n_clusters per
    generation) and emits (key_a=new, key_b=indexed, cosine ≥ τ) from one
    (m × n) matmul per cell.

Scale shape: ``n_clusters`` is the scaling parameter (SemDeDup used 50k
cells at LAION scale) — per-task working set and probe I/O both follow
corpus/n_clusters; the groupby key is ``cell % probe_buckets`` so Ray task
count stays bounded regardless of n_clusters (the repo's measured
one-task-per-key overhead; repo conventions). ``cluster_cap`` bounds any single
matmul; pairs from a capped cell carry ``truncated=1`` (the honest-cap
contract of stages/dedup). With ``nprobe=1`` a pair is found iff both
sides share a cell — exactly the one-shot SemDeDup candidate semantics;
``nprobe > 1`` adds recall at probe time with no index change.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .ivf import IvfIndex, train_centroids
from .similarity import _emb_matrix, _normalize
from .util import fresh_dir
from .util import read_meta as _read_meta
from .util import write_meta as _write_meta


def _pairs_empty(key_type: pa.DataType) -> pa.Table:
    return pa.table({"key_a": pa.array([], type=key_type),
                     "key_b": pa.array([], type=key_type),
                     "cosine": pa.array([], type=pa.float64()),
                     "truncated": pa.array([], type=pa.int8())})


def _centroids_path(path: str) -> str:
    return os.path.join(path, "centroids.parquet")


def _save_centroids(path: str, centroids: np.ndarray) -> None:
    c = np.asarray(centroids, dtype=np.float32)
    tbl = pa.table({"cell": pa.array(np.arange(len(c), dtype=np.int32)),
                    "centroid": pa.FixedSizeListArray.from_arrays(
                        pa.array(c.reshape(-1)), c.shape[1])})
    pq.write_table(tbl, _centroids_path(path))


def load_emb_centroids(path: str) -> IvfIndex:
    tbl = pq.read_table(_centroids_path(path))
    return IvfIndex(_emb_matrix(tbl, "centroid"))


def _vec_list(mat: np.ndarray) -> pa.Array:
    m = np.ascontiguousarray(mat, dtype=np.float32)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(m.reshape(-1)), m.shape[1] if m.ndim == 2 else 1)


def _write_generation(ds, path: str, gen: str, meta: dict,
                      batch_size: int) -> None:
    index = load_emb_centroids(path)
    key, emb = meta["key"], meta["emb"]

    def add(b: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(b, emb)).astype(np.float32)
        cl = index.assign(mat) if len(mat) else np.array([], dtype=np.int64)
        # `cell` duplicates the partition value INSIDE the data files:
        # write_parquet strips partition_cols from the data, and file-list
        # reads lose hive values — compaction repartitions from `cell`
        # verbatim instead of re-deriving assignments (bit-stable: a
        # vector can never drift to a different cell across compactions)
        c32 = pa.array(cl.astype(np.int32))
        return pa.table({key: b.column(key), "emb": _vec_list(mat),
                         "cell": c32, "ivf_cluster": c32})

    ds.select_columns([key, emb]) \
        .map_batches(add, batch_format="pyarrow", batch_size=batch_size) \
        .write_parquet(fresh_dir(os.path.join(path, gen)),
                       partition_cols=["ivf_cluster"])


def write_emb_index(ds, path: str, *, key: str = "vec_id",
                    emb: str = "embedding", n_clusters: int = 16,
                    sample_size: int | None = None, seed: int = 42,
                    index: IvfIndex | None = None,
                    batch_size: int = 8192) -> None:
    """Create the index at ``path`` (generation 0). The quantizer trains on
    a driver-side sample of ``ds`` (stages/ivf.build_ivf shape — the corpus
    never funnels through the driver) unless a pretrained ``index`` is
    given; either way the centroids are FROZEN for the index's lifetime."""
    os.makedirs(path, exist_ok=True)
    if index is None:
        from .ivf import build_ivf
        index = build_ivf(ds, emb=emb, n_clusters=n_clusters,
                          sample_size=sample_size, seed=seed)
    _save_centroids(path, index.centroids)
    meta = {"key": key, "emb": emb, "n_clusters": len(index.centroids),
            "generations": []}
    _write_meta(path, meta)
    _write_generation(ds, path, "gen-000000", meta, batch_size)
    meta["generations"] = ["gen-000000"]
    _write_meta(path, meta)


def update_emb_index(ds, path: str, *, batch_size: int = 8192) -> None:
    """Append a new generation with ``ds``'s vectors (pass the SURVIVORS of
    :func:`dedup_near_incremental_emb` so the index stays near-dup-free).
    Atomic: data lands fully before ``meta.json`` is replaced. Empty
    increments are a no-op (an empty generation would add probe I/O for
    nothing)."""
    if ds.count() == 0:
        return
    meta = _read_meta(path)
    gen = f"gen-{len(meta['generations']):06d}"
    _write_generation(ds, path, gen, meta, batch_size)
    meta["generations"].append(gen)
    _write_meta(path, meta)


def _cell_history(path: str, generations: list[str], cell: int,
                  key: str) -> pa.Table | None:
    parts = []
    for gen in generations:
        d = Path(path) / gen / f"ivf_cluster={cell}"
        if d.is_dir():
            parts.append(pq.read_table(d, columns=[key, "emb"]))
    if not parts:
        return None
    return pa.concat_tables(parts)


def probe_emb_index(ds, index_path: str, *, threshold: float = 0.95,
                    nprobe: int = 1, cluster_cap: int = 65536,
                    probe_buckets: int = 256, batch_size: int = 8192):
    """→ Dataset ``(key_a=new, key_b=indexed, cosine, truncated)`` of
    cross-run semantic near-dup pairs at cosine ≥ ``threshold``.

    Each new vector probes its ``nprobe`` nearest cells; a history vector
    lives in exactly one cell, so a pair is emitted at most once and needs
    no dedup pass. Cells land on Ray tasks via ``cell % probe_buckets``
    (bounded task count; a cell never splits); within a capped cell both
    sides truncate to their ``cluster_cap`` smallest keys and every emitted
    pair carries ``truncated=1``."""
    meta = _read_meta(index_path)
    key = meta["key"]
    generations = list(meta["generations"])
    index = load_emb_centroids(index_path)
    cents = index.centroids
    nprobe = min(nprobe, len(cents))
    schema = ds.schema()
    key_type = dict(zip(schema.names, schema.types))[key]

    def assign_explode(b: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(b, meta["emb"])).astype(np.float32)
        n = len(mat)
        if n == 0:
            return pa.table({key: pa.array([], type=key_type),
                             "__v": pa.array([], type=pa.list_(
                                 pa.float32(), cents.shape[1])),
                             "__c": pa.array([], type=pa.int32()),
                             "__cb": pa.array([], type=pa.int32())})
        sims = mat @ cents.T
        if nprobe == 1:
            cls = sims.argmax(axis=1).astype(np.int32)
            parent = np.arange(n, dtype=np.int64)
        else:
            cls = np.argpartition(-sims, kth=nprobe - 1, axis=1)[:, :nprobe] \
                .astype(np.int32).reshape(-1)
            parent = np.repeat(np.arange(n, dtype=np.int64), nprobe)
        keys = b.column(key)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({
            key: keys.take(pa.array(parent)),
            "__v": _vec_list(mat[parent]),
            "__c": pa.array(cls),
            "__cb": pa.array((cls % np.int32(probe_buckets))),
        })

    probes = ds.select_columns([key, meta["emb"]]).map_batches(
        assign_explode, batch_format="pyarrow", batch_size=batch_size)

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_cos, out_tr = [], [], [], []
        for cell, sub in g.groupby("__c", sort=False):
            hist = _cell_history(index_path, generations, int(cell), key)
            if hist is None or hist.num_rows == 0:
                continue
            sub = sub.sort_values(key, kind="mergesort")
            trunc = 0
            if len(sub) > cluster_cap:
                sub = sub.iloc[:cluster_cap]
                trunc = 1
            if hist.num_rows > cluster_cap:
                order = pa.compute.sort_indices(hist.column(key))
                hist = hist.take(order[:cluster_cap])
                trunc = 1
            new_mat = np.stack(sub["__v"].to_numpy())
            hist_mat = _emb_matrix(hist, "emb")
            hist_keys = hist.column(key).to_numpy(zero_copy_only=False)
            sims = new_mat @ hist_mat.T
            ii, jj = np.nonzero(sims >= threshold)
            if not len(ii):
                continue
            out_a.append(sub[key].to_numpy()[ii])
            out_b.append(hist_keys[jj])
            out_cos.append(sims[ii, jj].astype(np.float64))
            out_tr.append(np.full(len(ii), trunc, dtype=np.int8))
        if not out_a:
            return _pairs_empty(key_type).to_pandas()
        return pd.DataFrame({
            "key_a": np.concatenate(out_a),
            "key_b": np.concatenate(out_b),
            "cosine": np.concatenate(out_cos),
            "truncated": np.concatenate(out_tr)})

    return probes.groupby("__cb").map_groups(pair_bucket,
                                             batch_format="pandas")


def dedup_near_incremental_emb(ds, index_path: str, *,
                               threshold: float = 0.95, nprobe: int = 1,
                               cluster_cap: int = 65536,
                               probe_buckets: int = 256,
                               batch_size: int = 8192,
                               strategy: str = "auto"):
    """→ (survivors, matched_pairs): drop new vectors that semantically
    near-duplicate any indexed vector. Within-new dedup is a separate
    concern — run stages/semdedup.semantic_dedup on the survivors, then
    ``update_emb_index`` with what you keep (mirrors
    minhashindex.dedup_near_incremental)."""
    meta = _read_meta(index_path)
    matched = probe_emb_index(ds, index_path, threshold=threshold,
                              nprobe=nprobe, cluster_cap=cluster_cap,
                              probe_buckets=probe_buckets,
                              batch_size=batch_size).materialize()
    if matched.count() == 0:
        return ds, matched
    from .joins import anti_join
    survivors = anti_join(ds, matched, on=meta["key"], right_on="key_a",
                          strategy=strategy)
    return survivors, matched


def compact_emb_index(path: str, *, batch_size: int = 8192) -> None:
    """Merge all generations into one (vectors are immutable rows — no
    merge logic, just a repartitioned rewrite), then atomically swap meta
    to the compacted generation. Cell membership is copied verbatim from
    the stored ``cell`` column, so probes are pair-identical before and
    after. Old generation data is removed only AFTER the meta swap; a
    crash in between leaves unreferenced directories, never a broken
    index (the hashindex/vocabstore compaction contract)."""
    import shutil

    import pyarrow.compute as pc
    import ray.data

    meta = _read_meta(path)
    if len(meta["generations"]) <= 1:
        return
    old_gens = list(meta["generations"])
    files = sorted(str(f) for g in old_gens
                   for f in Path(path, g).rglob("*.parquet"))
    ds = ray.data.read_parquet(files)

    def repartition_col(b: pa.Table) -> pa.Table:
        c32 = pc.cast(b.column("cell"), pa.int32())
        return pa.table({meta["key"]: b.column(meta["key"]),
                         "emb": b.column("emb"),
                         "cell": c32, "ivf_cluster": c32})

    compacted = f"gen-{len(old_gens):06d}-compact"
    ds.map_batches(repartition_col, batch_format="pyarrow",
                   batch_size=batch_size) \
        .write_parquet(fresh_dir(os.path.join(path, compacted)),
                       partition_cols=["ivf_cluster"])
    meta["generations"] = [compacted]
    _write_meta(path, meta)
    for g in old_gens:
        shutil.rmtree(os.path.join(path, g), ignore_errors=True)


def index_vec_count(path: str) -> int:
    """Vectors indexed (Parquet row-count metadata only)."""
    meta = _read_meta(path)
    n = 0
    for gen in meta["generations"]:
        for f in Path(path, gen).rglob("*.parquet"):
            n += pq.ParquetFile(f).metadata.num_rows
    return n
