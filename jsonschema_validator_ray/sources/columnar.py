"""ORC / Feather (Arrow IPC) ingestion — columnar formats Ray Data has no
built-in reader for in this version, expressed Ray-Data-natively: the
driver lists WORK ITEMS (one per ORC stripe / one per Feather record
batch group — a metadata-only pass), and the byte-heavy decode runs inside
``map_batches`` tasks, so parallelism scales with total stripe count, not
file count, and no file's bytes ever pass through the driver.

Both readers return a plain ``ray.data.Dataset`` of Arrow blocks, so every
downstream stage (validation plans, dedup, stats …) composes unchanged.

Write side follows the resumable-sink discipline: shards land under a
temp name and are renamed into place atomically, a ``_manifest.json``
listing the completed shards is written LAST, and ``read_orc`` prefers the
manifest over a directory glob — so a crashed or Ray-retried write can
never feed truncated or duplicate shards to a later read.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa

import ray.data

_MANIFEST = "_manifest.json"


def _expand(paths, suffixes: tuple[str, ...]) -> list[str]:
    """File list from paths/dirs. Directories prefer ``_manifest.json``
    (the completed-shard list of :func:`write_orc`), else glob by suffix —
    stray files (_SUCCESS markers, in-flight temps, checksums) are never
    picked up."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        p = Path(p)
        if p.is_dir():
            man = p / _MANIFEST
            if man.exists():
                with open(man) as f:
                    out.extend(f"{p}/{Path(s).name}"
                               for s in json.load(f)["shards"])
            else:
                out.extend(sorted(
                    str(f) for f in p.rglob("*")
                    if f.is_file() and f.suffix.lower() in suffixes
                    and not f.name.startswith((".", "_"))))
        else:
            out.append(str(p))
    return out


def read_orc(paths, *, columns: list[str] | None = None,
             concurrency: int | None = None):
    """→ Dataset over ORC file(s)/dir(s). One work item per STRIPE (the
    ORC row-group analogue), listed from footer metadata only; stripes
    decode in parallel inside tasks with column pruning pushed down."""
    import pyarrow.orc as orc

    items = []
    for f in _expand(paths, (".orc",)):
        n = orc.ORCFile(f).nstripes
        items.extend({"path": f, "stripe": s} for s in range(n))
    if not items:
        return ray.data.from_items([])

    def load(batch):
        for path, stripe in zip(batch["path"], batch["stripe"]):
            t = orc.ORCFile(path).read_stripe(int(stripe), columns=columns)
            # read_stripe returns a RecordBatch; blocks must be Tables
            yield pa.Table.from_batches([t])

    return ray.data.from_items(items).map_batches(
        load, batch_size=1, batch_format="numpy", concurrency=concurrency)


def read_feather(paths, *, columns: list[str] | None = None,
                 concurrency: int | None = None):
    """→ Dataset over Feather-v2 / Arrow-IPC file(s)/dir(s). One work item
    per file; INSIDE the task the file's record batches stream out as
    separate blocks (``pa.ipc.open_file`` handles Feather v2 including
    compression), so one big unsharded file never materializes as a
    single block."""
    items = [{"path": f}
             for f in _expand(paths, (".feather", ".arrow", ".ipc"))]
    if not items:
        return ray.data.from_items([])

    def load(batch):
        for path in batch["path"]:
            with pa.OSFile(str(path), "rb") as fh:
                reader = pa.ipc.open_file(fh)
                for i in range(reader.num_record_batches):
                    rb = reader.get_batch(i)
                    t = pa.Table.from_batches([rb])
                    yield t.select(columns) if columns else t

    return ray.data.from_items(items).map_batches(
        load, batch_size=1, batch_format="numpy", concurrency=concurrency)


class _ShardWriter:
    """Module-level actor class (repo rule: classes handed to
    ``map_batches`` live in the library package — workers import them by
    module reference). One shard per batch, temp-name + atomic rename."""

    def __init__(self, out_dir: str, fmt: str, compression: str | None):
        import uuid

        self.out_dir = out_dir
        self.fmt = fmt
        self.compression = compression
        self.prefix = uuid.uuid4().hex[:12]       # unique per actor
        self.n = 0

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        name = f"shard-{self.prefix}-{self.n:06d}.{self.fmt}"
        self.n += 1
        tmp = os.path.join(self.out_dir, f"_tmp-{name}")
        if self.fmt == "orc":
            import pyarrow.orc as orc

            orc.write_table(b, tmp)
        else:
            import pyarrow.feather as feather

            feather.write_feather(b, tmp, compression=self.compression)
        p = os.path.join(self.out_dir, name)
        os.replace(tmp, p)                        # atomic publish
        return pa.table({"path": [p], "rows": [b.num_rows]})


def _commit_manifest(ds, out_dir: str, fmt: str, compression: str | None,
                     batch_rows: int) -> list[str]:
    manifest = ds.map_batches(
        _ShardWriter, fn_constructor_args=(out_dir, fmt, compression),
        batch_format="pyarrow", batch_size=batch_rows, concurrency=(1, 8))
    paths = sorted(r["path"] for r in manifest.take_all())
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"shards": [Path(p).name for p in paths]}, f)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return paths


def write_orc(ds, out_dir: str, *, batch_rows: int = 1 << 20) -> list[str]:
    """Write a Dataset to a directory of ORC shards (one file per task
    call — resumable-output discipline: never one giant file). Each shard
    lands under a temp name and is atomically renamed; the completed list
    is committed to ``_manifest.json`` LAST, which ``read_orc`` prefers —
    so crashes or Ray task retries can't surface truncated/orphan shards.
    Returns the shard paths."""
    os.makedirs(out_dir, exist_ok=True)
    return _commit_manifest(ds, out_dir, "orc", None, batch_rows)


def write_feather(ds, out_dir: str, *, batch_rows: int = 1 << 20,
                  compression: str = "zstd") -> list[str]:
    """Write a Dataset to a directory of Feather-v2 (Arrow IPC) shards —
    same resumable discipline as :func:`write_orc`: temp-name + atomic
    rename per shard, ``_manifest.json`` committed last, preferred by
    :func:`read_feather`."""
    os.makedirs(out_dir, exist_ok=True)
    return _commit_manifest(ds, out_dir, "feather", compression, batch_rows)
