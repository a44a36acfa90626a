"""Distributed exact Gram/covariance matrix + driver-side PCA.

The classic embedding-analysis shape (whitening, PCA projection,
ABTT/all-but-the-top post-processing): the d x d Gram matrix of the
quantized embedding corpus is computed in ONE streaming scan — each batch
does a single int64 ``q.T @ q`` matmul and emits the upper triangle as
d(d+1)/2 partial rows — and the tiny d x d fold plus the eigen step run
driver-side. Nothing corpus-sized is ever gathered or shuffled: the only
data leaving a task is O(d^2) integers per block.

Exactness (CLAUDE.md float rule): components quantize as
``floor(float64(x) * 1e5)`` — the repo's established cross-engine spelling
(pipelines/features.knn_graph_embeddings): float32 inputs are exact binary
values, the x1e5 product is correctly rounded identically in numpy and
DuckDB, floor has no tie mode. Products are < 1e10 and per-batch sums at
batch_size 16384 stay < 2^49, far inside int64; the DRIVER fold uses
arbitrary-precision Python ints, so the folded Gram is exact at any corpus
size (the int64 OUTPUT cast is the only bound: ~9e8 rows at |x| < 1,
asserted loudly).

Scale note: the driver folds ``num_blocks x d(d+1)/2`` partial rows; past
~512 blocks swap the fold for one hash-bucket exchange keyed on the (i, j)
cell (the pattern of stages/uniqueness) — the cell count is fixed at
d(d+1)/2, so the exchange output is bounded regardless of corpus size.

PCA itself (``power_iteration``) is a driver-side numpy loop over the d x d
matrix — deterministic start vector, fixed iteration count — and is
checked against ``np.linalg.eigh`` in tests; it is float math and is NOT
part of any oracle comparison (the Gram rows are the oracle surface).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

Q_SCALE = 100_000


def _quantized_matrix(batch: pa.Table, col: str, d: int) -> np.ndarray:
    """Rows of ``col`` with exactly ``d`` elements -> (n, d) int64 codes.

    Rows with null or differently-sized lists are SKIPPED (mirrored by the
    oracle's ``len(embedding) = d`` predicate) — a Gram over ragged rows is
    ill-defined."""
    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(c), -1) \
        .to_numpy(zero_copy_only=False)
    keep = lengths == d
    if not keep.all():
        c = c.filter(pa.array(keep))
    n = len(c)
    if n == 0:
        return np.empty((0, d), dtype=np.int64)
    flat = pc.list_flatten(c).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    return np.floor(flat * Q_SCALE).astype(np.int64).reshape(n, d)


class GramPartial:
    """Per-batch partial: one int64 matmul -> d(d+1)/2 upper-triangle rows
    (i, j, gram, s_i, s_j, n) — component sums and the row count ride along
    so the driver can also form the CENTERED covariance without a second
    scan."""

    def __init__(self, col: str, d: int):
        self.col = col
        self.d = d
        iu = np.triu_indices(d)
        self.iu = iu
        self.i1 = (iu[0] + 1).astype(np.int64)   # 1-based like SQL
        self.j1 = (iu[1] + 1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = _quantized_matrix(batch, self.col, self.d)
        if q.shape[0] == 0:
            z = pa.array([], pa.int64())
            return pa.table({"i": z, "j": z, "gram": z,
                             "s_i": z, "s_j": z, "n_vecs": z})
        g = q.T @ q                               # (d, d) int64, exact
        s = q.sum(axis=0)                         # per-dim component sums
        n = np.int64(q.shape[0])
        return pa.table({
            "i": pa.array(self.i1),
            "j": pa.array(self.j1),
            "gram": pa.array(g[self.iu]),
            "s_i": pa.array(s[self.iu[0]]),
            "s_j": pa.array(s[self.iu[1]]),
            "n_vecs": pa.array(np.full(len(self.i1), n)),
        })


def gram_matrix(ds, col: str, d: int, block_gate: int = 512) -> pa.Table:
    """ONE streaming scan -> exact (i, j, gram, s_i, s_j, n_vecs) for the
    1-based upper triangle i <= j. ``ds`` is a Dataset or FusedParquetScan.

    The driver fold is arbitrary-precision (Python ints); the output is
    cast back to int64 with a loud overflow assert. Past ``block_gate``
    blocks the partials first reduce through ONE hash-bucket exchange
    keyed on the (i, j) cell (cell count fixed at d(d+1)/2, so the
    exchange output is bounded regardless of corpus size) and the driver
    folds the reduced per-bucket sums instead of blocks x cells rows."""
    partials = ds.map_batches(GramPartial(col, d), batch_format="pyarrow")
    nb = None
    if hasattr(ds, "num_blocks"):
        try:
            nb = ds.num_blocks()
        except Exception:      # lazy Dataset: block count not knowable
            nb = None
    if block_gate == 0 or (nb is not None and nb > block_gate):
        def add_cb(b: pa.Table) -> pa.Table:
            cb = pc.cast(pc.bit_wise_and(pc.add(
                pc.multiply(b.column("i"), 131), b.column("j")), 31),
                pa.int32())
            return b.append_column("__cb", cb)

        def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby(["i", "j"], sort=False).agg(
                gram=("gram", "sum"), s_i=("s_i", "sum"),
                s_j=("s_j", "sum"), n_vecs=("n_vecs", "sum")).reset_index()
            return agg

        partials = partials.map_batches(add_cb, batch_format="pyarrow") \
            .groupby("__cb").map_groups(fold_bucket, batch_format="pandas")
        # NOTE: the in-exchange int64 sums bound the corpus at ~9e8 rows
        # per cell (same bound as the output cast below); past that,
        # split the fold into generations.
    parts = partials.to_pandas()
    iu = np.triu_indices(d)
    i1, j1 = (iu[0] + 1).astype(np.int64), (iu[1] + 1).astype(np.int64)
    ncell = len(i1)
    gram = [0] * ncell
    s = [0] * (d + 1)                             # 1-based dim sums
    n_total = 0
    if len(parts):
        # cell order inside every partial block is the SAME triu order, so
        # the fold is positional per block — no hashing needed
        cell = {(a, b): k for k, (a, b) in enumerate(zip(i1, j1))}
        for ii, jj, gg in zip(parts["i"].to_numpy(),
                              parts["j"].to_numpy(),
                              parts["gram"].to_numpy()):
            gram[cell[(ii, jj)]] += int(gg)
        diag = parts[parts["i"] == parts["j"]]
        for ii, ss in zip(diag["i"].to_numpy(), diag["s_i"].to_numpy()):
            s[int(ii)] += int(ss)
        first = parts[parts["i"] == 1]
        n_total = int(first[first["j"] == 1]["n_vecs"].sum())
    lim = (1 << 63) - 1
    assert all(abs(g) <= lim for g in gram) and \
        all(abs(x) <= lim for x in s), \
        "gram fold exceeds int64 — rescale Q_SCALE or shard the corpus"
    return pa.table({
        "i": pa.array(i1),
        "j": pa.array(j1),
        "gram": pa.array(np.array(gram, dtype=np.int64)),
        "s_i": pa.array(np.array([s[a] for a in i1], dtype=np.int64)),
        "s_j": pa.array(np.array([s[b] for b in j1], dtype=np.int64)),
        "n_vecs": pa.array(np.full(ncell, n_total, dtype=np.int64)),
    })


def dense_from_triangle(tri: pa.Table, d: int,
                        centered: bool = False) -> np.ndarray:
    """Upper-triangle rows -> symmetric (d, d) float64 matrix.

    ``centered=True`` returns the covariance-scaled matrix
    ``G/n - (s/n)(s/n)^T`` (population covariance of the quantized codes);
    otherwise the raw Gram."""
    df = tri.to_pandas()
    m = np.zeros((d, d), dtype=np.float64)
    i = df["i"].to_numpy() - 1
    j = df["j"].to_numpy() - 1
    m[i, j] = df["gram"].to_numpy().astype(np.float64)
    m[j, i] = m[i, j]
    if centered:
        n = int(df["n_vecs"].iloc[0]) if len(df) else 0
        if n > 0:
            s = np.zeros(d, dtype=np.float64)
            diag = df[df["i"] == df["j"]]
            s[diag["i"].to_numpy() - 1] = \
                diag["s_i"].to_numpy().astype(np.float64)
            mu = s / n
            m = m / n - np.outer(mu, mu)
    return m


def power_iteration(m: np.ndarray, iters: int = 200):
    """Deterministic top eigenpair of a symmetric PSD matrix: fixed
    all-ones start, fixed iteration count. Returns (eigenvalue, unit
    eigenvector with a sign convention of nonnegative largest-|.|
    component)."""
    d = m.shape[0]
    v = np.ones(d, dtype=np.float64) / np.sqrt(d)
    for _ in range(iters):
        w = m @ v
        nrm = np.linalg.norm(w)
        if nrm == 0.0:
            return 0.0, v
        v = w / nrm
    lam = float(v @ (m @ v))
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    return lam, v


class PcaProjector:
    """Streaming projection stage: quantize each batch exactly like
    :class:`GramPartial` and project onto the (driver-computed) component
    matrix — the whitening / dimensionality-reduction step downstream of
    ``gram_matrix`` + ``power_iteration``. Emits (id, pc1..pck) float64.

    Component scores are float math (the eigenvectors themselves are), so
    this stage is test-verified against numpy rather than SQL-oracled."""

    def __init__(self, col: str, id_col: str, components: np.ndarray,
                 mean: np.ndarray | None = None):
        self.col = col
        self.id_col = id_col
        self.components = np.asarray(components, dtype=np.float64)
        if self.components.ndim == 1:
            self.components = self.components[None, :]
        self.mean = None if mean is None else np.asarray(mean, np.float64)
        self.d = self.components.shape[1]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        c = batch.column(self.col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(c), -1) \
            .to_numpy(zero_copy_only=False)
        keep = lengths == self.d
        q = _quantized_matrix(batch, self.col, self.d).astype(np.float64)
        if self.mean is not None:
            q = q - self.mean[None, :]
        scores = q @ self.components.T
        out = {self.id_col: ids.filter(pa.array(keep))}
        for k in range(self.components.shape[0]):
            out[f"pc{k + 1}"] = pa.array(scores[:, k], pa.float64())
        return pa.table(out)
