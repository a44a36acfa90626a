"""Metadata-clean Parquet reads.

The driver's testdata (and most pandas-written Parquet) carries a
``pandas`` key in the file-level schema metadata. In this Arrow build
``hash(pa.Schema)`` raises ``TypeError: unhashable type: 'dict'`` when such
metadata is present, which makes Ray Data's ``unify_schemas`` dedup
fast-path log "Failed to hash the schemas (for deduplication)" from every
worker that unifies blocks (ray/data/_internal/arrow_ops/
transform_pyarrow.py). The metadata is dead weight for an Arrow-native
pipeline anyway, so we read the footer schema once on the driver, strip the
metadata, and hand Ray the clean schema — every downstream block then
hashes (and dedups) fine, and the worker logs stay quiet.
"""

from __future__ import annotations

import pyarrow.parquet as pq

import ray.data


def read_parquet(paths, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's schema metadata stripped.

    Drop-in replacement; column pruning and all other kwargs pass through.
    Falls back to the plain read when the footer schema can't be probed
    (e.g. a directory of files from the resumable sink) — correctness is
    identical either way, only the log noise differs.
    """
    if "schema" not in kwargs:
        probe = paths[0] if isinstance(paths, (list, tuple)) else paths
        try:
            sch = pq.read_schema(probe)
        except Exception:
            sch = None
        if sch is not None and sch.metadata:
            sch = sch.remove_metadata()
            if columns is not None:
                # Ray's fragment reader rebuilds batches against the passed
                # schema AFTER column pruning — hand it the pruned schema.
                import pyarrow as pa

                sch = pa.schema([sch.field(c) for c in columns])
            kwargs["schema"] = sch
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def read_dim_table(path, *, columns=None,
                   limit: int = 2_000_000) -> "pa.Table":
    """Driver-side read of a DIMENSION parquet file destined for broadcast.

    The broadcast-small-side pattern ships the whole table to every task
    anyway, so routing the read through a Ray Dataset execution only adds
    the executor's fixed scheduling cost (~0.5-1.5 s per query at bench
    scale) before an identical driver gather. This reads the file footer
    first and refuses LOUDLY past ``limit`` rows — the caller must switch
    to its documented bucketed-join fallback, exactly like the
    ``_gather_small`` gates. Metadata is stripped (schema-dedup cache
    rule)."""
    import pyarrow as pa  # noqa: F401  (kept for parity with callers)

    md = pq.ParquetFile(path).metadata
    if md.num_rows > limit:
        raise ValueError(
            f"read_dim_table: {path} has {md.num_rows} rows > broadcast "
            f"gate {limit}; use the bucketed-join fallback for this input")
    t = pq.read_table(path, columns=columns)
    return t.replace_schema_metadata(None).combine_chunks()


def fused_map_parquet(paths, fn, *, columns=None, batch_size: int = 16384,
                      concurrency=None, split_per_rg: int = 1):
    """FUSED read+transform over parquet: one work item per ROW GROUP
    (listed from footer metadata only), each task reads its row group and
    applies ``fn`` to its slices — read and compute in the same task.

    Ray 2.49 never fuses ``ReadParquet`` with a downstream ``map_batches``
    (measured), so the classic two-operator pipeline ships every decoded
    block through the object store; for single-pass scans this helper is
    the fusion the executor doesn't do (headline: 12.6–17.5 s → 8.1–10.4 s
    at 32 CPUs). Use for read→map→aggregate/write shapes; keep the classic
    path when the dataset branches to several consumers.

    Parallelism = ROW-GROUP COUNT × ``split_per_rg``: a compute-heavy
    ``fn`` over a file with fewer row groups than cores serializes
    (measured: the MinHash signature pass over a single-row-group table
    went 2.3 → 6.8 s fused). ``split_per_rg > 1`` fans one row group out
    to that many tasks — each re-decodes the row group (parquet's decode
    granularity) but computes only its slice, the right trade exactly when
    per-row compute dwarfs decode. Default 1: at corpus scale row groups
    number in the millions and finer items are pure overhead."""
    import pyarrow.parquet as pq

    import ray.data

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    items = []
    for f in paths:
        n = pq.ParquetFile(f).metadata.num_row_groups
        items.extend({"path": f, "rg": i, "s": s}
                     for i in range(n) for s in range(split_per_rg))
    if not items:
        return ray.data.from_items([])

    def load(batch):
        for p, rg, s in zip(batch["path"], batch["rg"], batch["s"]):
            t = pq.ParquetFile(p).read_row_group(int(rg), columns=columns)
            if split_per_rg > 1:
                n = t.num_rows
                lo = int(s) * n // split_per_rg
                hi = (int(s) + 1) * n // split_per_rg
                t = t.slice(lo, hi - lo)
            for off in range(0, t.num_rows, batch_size):
                yield fn(t.slice(off, batch_size))

    kwargs: dict = dict(batch_size=1, batch_format="numpy")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ray.data.from_items(items).map_batches(load, **kwargs)


class FusedParquetScan:
    """Duck-typed minimal Dataset stand-in for MULTI-PASS scan stages
    (exact quantiles' count/histogram/gather, KS, refinement loops): every
    ``map_batches`` call is a fused read+fn over the files' row groups
    (one task per row group — the read-map fusion Ray 2.49 lacks), so a
    k-pass algorithm pays k fused scans instead of k reads + k decoded
    object-store hops.

    Implements exactly the surface those stages use: ``map_batches(fn)``
    (kwargs other than batch_size are accepted and ignored — the fused
    loader always feeds pyarrow tables) and ``num_blocks()``."""

    def __init__(self, paths, *, columns=None, batch_size: int = 16384,
                 split_per_rg: int = 1):
        if isinstance(paths, (str, bytes)):
            paths = [paths]
        self.paths = list(paths)
        self.columns = columns
        self.batch_size = batch_size
        self.split_per_rg = split_per_rg
        self._blocks = split_per_rg * sum(
            pq.ParquetFile(f).metadata.num_row_groups for f in self.paths)

    def map_batches(self, fn, *, batch_size=None, fn_constructor_args=None,
                    **_ignored):
        if isinstance(fn, type):
            # actor-class callables (broadcast filters etc.) instantiate
            # driver-side and ride into the fused tasks as pickled state
            fn = fn(*(fn_constructor_args or ()))
        return fused_map_parquet(self.paths, fn, columns=self.columns,
                                 batch_size=batch_size or self.batch_size,
                                 split_per_rg=self.split_per_rg)

    def num_blocks(self) -> int:
        return self._blocks

    def select_columns(self, cols) -> "FusedParquetScan":
        return FusedParquetScan(self.paths, columns=list(cols),
                                batch_size=self.batch_size,
                                split_per_rg=self.split_per_rg)

    def count(self) -> int:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in self.paths)

    def schema(self):
        """Footer schema (pruned), shaped like Dataset.schema() for the
        ``.base_schema`` / ``.names`` / ``.types`` accessors stages use."""
        import types

        import pyarrow as pa

        sch = pq.read_schema(self.paths[0]).remove_metadata()
        if self.columns is not None:
            sch = pa.schema([sch.field(c) for c in self.columns])
        return types.SimpleNamespace(base_schema=sch, names=sch.names,
                                     types=list(sch.types))


class TransformedScan:
    """Multi-pass scan with a fused per-batch pre-transform: wraps a
    ``FusedParquetScan`` (or another TransformedScan) so EVERY pass of a
    multi-pass stage reads, applies ``pre``, and runs the stage's fn in
    the SAME task — e.g. exact quantiles over a DERIVED column such as
    ``|x − median|`` (MAD) without materializing the derived column.

    ``pre`` must be a pure pyarrow.Table → pyarrow.Table function; it is
    pickled by value into each fused task (task pool, not an actor pool,
    so closure capture is safe)."""

    def __init__(self, inner, pre):
        self.inner = inner
        self.pre = pre

    def map_batches(self, fn, *, batch_size=None, fn_constructor_args=None,
                    **kwargs):
        if isinstance(fn, type):
            fn = fn(*(fn_constructor_args or ()))
        pre = self.pre

        def fused(t, _fn=fn, _pre=pre):
            return _fn(_pre(t))

        return self.inner.map_batches(fused, batch_size=batch_size,
                                      **kwargs)

    def num_blocks(self) -> int:
        return self.inner.num_blocks()

    def count(self) -> int:
        return self.inner.count()
