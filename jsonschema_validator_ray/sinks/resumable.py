"""Resumable partitioned Parquet sink with per-partition lineage manifests.

North-star component: "per-partition lineage + metrics are checkpointed to
Parquet so a killed job resumes without re-validating completed partitions".

Layout (SURVEY.md §4 "Checkpoint / resume"):

    out_dir/
      part-<pid>/*.parquet          # output rows of one input partition
      _lineage/part-<pid>.json      # manifest: inputs, row counts, status

Invariants that make resume correct:
- partition ids are STABLE across runs and cluster sizes (derived from the
  sorted input file list, never from scheduling order);
- a manifest is written only AFTER its partition's data directory is fully
  written, atomically (tmp file + ``os.replace``) — a crash leaves either no
  manifest (partition re-runs) or a complete one (partition skipped); a
  partial data directory without a manifest is deleted on resume;
- output rows are a pure function of input rows (validation is
  deterministic), so re-running a partition after a crash yields identical
  output — at-least-once execution converges to exactly-once results.

Partitions are processed in WAVES (``wave_size`` partitions per Ray job):
within a wave everything runs in parallel through the streaming executor;
manifests land between waves, bounding lost work under a kill to one wave.
At 100 TB, size partitions so one wave saturates the cluster (e.g. 256
partitions of ~400 GB, wave_size = a few) — partition count ≫ nodes keeps
stragglers cheap while manifests stay coarse enough to be negligible I/O.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import ray.data

from ..sources.parquet import read_parquet

# Concurrent wave threads race on Ray's lazy `from fsspec.implementations.
# http import HTTPFileSystem` probe: in this environment that import always
# fails (no aiohttp), and under the race the half-imported module surfaces a
# plain ImportError that Ray's `except ModuleNotFoundError` does NOT catch.
# When the real module cannot import anyway, registering a tiny complete
# stub makes the probe deterministic and thread-safe; Ray's subsequent
# isinstance() check against the stub class is correctly False for local
# filesystems.
def _stub_fsspec_http() -> None:  # pragma: no cover - environment dependent
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return  # real module works; nothing to do
    except ModuleNotFoundError:
        pass
    except Exception:
        return
    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # never instantiated; only isinstance-checked
        pass

    stub.HTTPFileSystem = HTTPFileSystem
    sys.modules.setdefault("fsspec.implementations.http", stub)


_stub_fsspec_http()


@dataclass
class Partition:
    """One resumable unit: a stable id + the input files it covers."""

    part_id: str
    paths: list[str] = field(default_factory=list)
    meta: dict[str, Any] = field(default_factory=dict)


def partition_input_files(paths: list[str], num_partitions: int) -> list[Partition]:
    """Stable partitioning of an input file list: sort by name, chunk evenly.
    The id hashes the member file names, so adding files creates NEW
    partition ids rather than silently changing old ones."""
    paths = sorted(paths)
    num_partitions = max(1, min(num_partitions, len(paths)))
    chunks: list[list[str]] = [[] for _ in range(num_partitions)]
    for i, p in enumerate(paths):
        chunks[i % num_partitions].append(p)
    parts = []
    for c in chunks:
        if not c:
            continue
        digest = hashlib.sha1("\n".join(Path(p).name for p in c).encode()).hexdigest()[:12]
        parts.append(Partition(part_id=digest, paths=c))
    return parts


def _lineage_dir(out_dir: str) -> Path:
    return Path(out_dir) / "_lineage"


def completed_partitions(out_dir: str) -> dict[str, dict]:
    """part_id → manifest for every partition already finished."""
    d = _lineage_dir(out_dir)
    if not d.exists():
        return {}
    out = {}
    for f in d.glob("part-*.json"):
        try:
            m = json.loads(f.read_text())
        except json.JSONDecodeError:
            continue  # torn write without atomic rename — treat as absent
        if m.get("status") == "done":
            out[m["part_id"]] = m
    return out


def _write_manifest(out_dir: str, manifest: dict) -> None:
    d = _lineage_dir(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    final = d / f"part-{manifest['part_id']}.json"
    tmp = d / f".tmp-{manifest['part_id']}.json"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, final)  # atomic on POSIX


def run_resumable(partitions: list[Partition], out_dir: str,
                  pipeline_fn: Callable[["ray.data.Dataset"], "ray.data.Dataset"] | None = None,
                  *,
                  read_fn: Callable[[list[str]], "ray.data.Dataset"] | None = None,
                  files_pipeline_fn: Callable[[list[str]], "ray.data.Dataset"] | None = None,
                  metrics_fn: Callable[[list[str]], dict] | None = None,
                  checksum_cols: list[str] | None = None,
                  zonemap_cols: list[str] | None = None,
                  bloom_cols: list[str] | None = None,
                  wave_size: int = 4) -> dict:
    """Run ``pipeline_fn`` over every not-yet-done partition; skip completed
    ones. Returns a summary dict (ran / skipped / rows).

    ``files_pipeline_fn`` (mutually exclusive with ``pipeline_fn``) receives
    the partition's FILE LIST instead of a read Dataset — the hook for
    fused read+compute pipelines (pipelines/webtext.validate_webtext_files
    lists its own row-group work items), so the flagship fused job is
    checkpointable with the same per-partition manifest discipline."""
    if (pipeline_fn is None) == (files_pipeline_fn is None):
        raise ValueError("pass exactly one of pipeline_fn / files_pipeline_fn")
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)
    pending = [p for p in partitions if p.part_id not in done]
    skipped = [p.part_id for p in partitions if p.part_id in done]

    # clean torn partial outputs (data dir without manifest)
    for p in pending:
        part_dir = Path(out_dir) / f"part-{p.part_id}"
        if part_dir.exists():
            shutil.rmtree(part_dir)

    reader = read_fn or (lambda paths: read_parquet(paths))
    ran: list[str] = []
    total_rows = 0
    from concurrent.futures import ThreadPoolExecutor

    def _process(p: Partition) -> tuple[Partition, Path]:
        ds_out = (files_pipeline_fn(p.paths) if files_pipeline_fn is not None
                  else pipeline_fn(reader(p.paths)))
        part_dir = Path(out_dir) / f"part-{p.part_id}"
        ds_out.write_parquet(str(part_dir))  # blocks this thread only
        return p, part_dir

    for w in range(0, len(pending), wave_size):
        wave = pending[w:w + wave_size]
        # partitions in a wave execute CONCURRENTLY: each driver thread owns
        # one dataset execution; the streaming executor interleaves them
        # (write_parquet blocks per thread, so a plain loop would serialize
        # the wave)
        with ThreadPoolExecutor(max_workers=len(wave)) as pool:
            results = list(pool.map(_process, wave))
        # wave data fully written → manifests
        for p, part_dir in results:
            files = sorted(str(f) for f in part_dir.glob("*.parquet"))
            import pyarrow.parquet as pq

            rows_out = sum(pq.read_metadata(f).num_rows for f in files)
            total_rows += rows_out
            metrics = metrics_fn(files) if metrics_fn else {}
            if checksum_cols:
                metrics["checksum"] = _partition_checksum(
                    files, checksum_cols)
            if zonemap_cols:
                metrics["zonemap"] = _partition_zonemap(
                    files, zonemap_cols)
            if bloom_cols:
                metrics["bloom"] = _partition_bloom(files, bloom_cols)
            _write_manifest(out_dir, {
                "part_id": p.part_id,
                "inputs": p.paths,
                "rows_out": rows_out,
                "files": [Path(f).name for f in files],
                "metrics": metrics,
                "finished_at": time.time(),
                "status": "done",
                **p.meta,
            })
            ran.append(p.part_id)
    return {"ran": ran, "skipped": skipped, "rows_out": total_rows,
            "out_dir": out_dir}


def read_output(out_dir: str):
    """Read back every completed partition's rows as one Dataset."""
    done = completed_partitions(out_dir)
    files = [str(f) for pid in sorted(done)
             for f in sorted((Path(out_dir) / f"part-{pid}").glob("*.parquet"))]
    return read_parquet(files)


def _partition_checksum(files: list[str], cols: list[str]) -> dict:
    """Order-independent integrity checksum of a partition's written rows
    (stages/checksum: sum of md5-derived 60-bit row hashes mod 2^61 —
    invariant to row order and file layout, so a later re-read can verify
    the partition byte-independently)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.checksum import table_checksum

    t = table_checksum(FusedParquetScan(files, columns=list(cols)),
                       list(cols)).to_pandas()
    return {"cols": list(cols), "n_rows": int(t["n_rows"][0]),
            "value": int(t["checksum"][0])}


def verify_output(out_dir: str) -> dict:
    """Integrity audit of a resumable output tree: for every completed
    partition whose manifest carries a checksum, recompute it from the
    files on disk and compare. Returns ``{"checked": [...], "mismatched":
    [...], "unchecked": [...]}`` — a non-empty ``mismatched`` means a
    partition's data was corrupted, truncated or edited AFTER its manifest
    was committed, and that partition must be re-run (delete its data dir
    and manifest, then run_resumable again)."""
    done = completed_partitions(out_dir)
    checked, mismatched, unchecked = [], [], []
    for pid in sorted(done):
        m = done[pid]
        want = (m.get("metrics") or {}).get("checksum")
        if not want:
            unchecked.append(pid)
            continue
        files = sorted(str(f) for f in
                       (Path(out_dir) / f"part-{pid}").glob("*.parquet"))
        got = _partition_checksum(files, want["cols"])
        (checked if got["value"] == want["value"]
         and got["n_rows"] == want["n_rows"] else mismatched).append(pid)
    return {"checked": checked, "mismatched": mismatched,
            "unchecked": unchecked}


def _partition_zonemap(files: list[str], cols: list[str]) -> dict:
    """Per-partition min/max ZONE MAPS from parquet FOOTER statistics —
    zero data pages are read (the row-group stats were computed at write
    time by the parquet encoder). A column with any stats-less row group
    gets ``None`` bounds (unprunable — correct, never wrong). Values are
    JSON-encoded with a type tag so :func:`read_output_pruned` can coerce
    the predicate consistently."""
    import pyarrow.parquet as pq

    out: dict[str, Any] = {}
    for col in cols:
        lo = hi = None
        ok = True
        for f in files:
            md = pq.read_metadata(f)
            try:
                ci = md.schema.names.index(col)
            except ValueError:
                ok = False
                break
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if not ok:
                break
        if not ok or lo is None:
            out[col] = {"min": None, "max": None, "kind": "none"}
            continue
        if isinstance(lo, bytes):
            lo, hi = lo.decode("utf-8", "replace"), \
                hi.decode("utf-8", "replace")
        kind = ("int" if isinstance(lo, int) and not isinstance(lo, bool)
                else "float" if isinstance(lo, float) else "str")
        if kind not in ("int", "float", "str"):  # pragma: no cover
            out[col] = {"min": None, "max": None, "kind": "none"}
            continue
        out[col] = {"min": lo, "max": hi, "kind": kind}
    return out


def prune_partitions(out_dir: str, col: str, lo=None, hi=None):
    """→ (kept_part_ids, all_part_ids): the data-skipping decision —
    completed partitions whose ``col`` zone map intersects ``[lo, hi]``
    (``None`` bound = unbounded). Partitions without a usable zone map for
    ``col`` are KEPT (skipping must never drop rows)."""
    done = completed_partitions(out_dir)
    kept = []
    for pid in sorted(done):
        zm = ((done[pid].get("metrics") or {}).get("zonemap") or {}) \
            .get(col)
        if not zm or zm.get("kind") in (None, "none") \
                or zm["min"] is None:
            kept.append(pid)
            continue
        zmin, zmax = zm["min"], zm["max"]
        if lo is not None and zmax < lo:
            continue
        if hi is not None and zmin > hi:
            continue
        kept.append(pid)
    return kept, sorted(done)


def read_output_pruned(out_dir: str, col: str, lo=None, hi=None):
    """Read back only the completed partitions whose ``col`` zone map can
    contain values in ``[lo, hi]``, then apply the EXACT residual
    predicate inside the scan (zone maps are partition-level, so rows
    outside the range inside a kept partition are still filtered). This
    is the 100-TB data-skipping path: a selective range predicate over a
    range-partitioned output touches O(selectivity) partitions instead of
    all of them, with correctness independent of the pruning (the
    residual filter alone is already exact)."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as _pds

    kept, _ = prune_partitions(out_dir, col, lo, hi)
    files = [str(f) for pid in kept
             for f in sorted((Path(out_dir) / f"part-{pid}")
                             .glob("*.parquet"))]
    expr = None
    if lo is not None:
        expr = _pds.field(col) >= lo
    if hi is not None:
        e2 = _pds.field(col) <= hi
        expr = e2 if expr is None else (expr & e2)
    if not files:
        import pyarrow as _pa

        import ray.data as _rd

        done = completed_partitions(out_dir)
        any_files = [str(f) for pid in sorted(done)
                     for f in sorted((Path(out_dir) / f"part-{pid}")
                                     .glob("*.parquet"))]
        if not any_files:
            raise FileNotFoundError(f"no completed output in {out_dir}")
        import pyarrow.parquet as _pq

        schema = _pq.read_schema(any_files[0])
        return _rd.from_arrow(schema.empty_table())
    ds = read_parquet(files, filter=expr) if expr is not None \
        else read_parquet(files)
    return ds


# ---- per-partition Bloom filters: EQUALITY data skipping ---------------------
#
# Zone maps prune RANGE predicates; point lookups on high-cardinality string
# keys (url, host) need membership summaries. At commit time each partition
# optionally records a small Bloom filter per column (a few KB in the JSON
# manifest); read_output_point then skips every partition whose filter
# provably excludes the probe value — the Iceberg/Parquet bloom lever on the
# engine's OWN output. False positives only cost a wasted partition read;
# correctness is independent of pruning (the residual filter is exact).

_BLOOM_BITS = 1 << 14   # 2 KB/column/partition; ~2% FPR at 2k distinct
_BLOOM_K = 4


def _bloom_positions(value, m: int, k: int) -> list[int]:
    """k deterministic bit positions for ``value`` — md5-based, so stable
    across Python versions, processes and machines (hash() is salted and
    NEVER usable here). Values are canonicalized: str → utf-8 bytes,
    int/bool → decimal string (floats are rejected at filter build)."""
    if isinstance(value, bool) or isinstance(value, int):
        raw = str(int(value)).encode()
    elif isinstance(value, str):
        raw = value.encode("utf-8")
    elif isinstance(value, bytes):
        raw = value
    else:
        raise TypeError(f"bloom value type {type(value)} unsupported")
    out = []
    for i in range(k):
        d = hashlib.md5(i.to_bytes(2, "little") + raw).digest()
        out.append(int.from_bytes(d[:8], "little") % m)
    return out


def _partition_bloom(files: list[str], cols: list[str],
                     m: int = _BLOOM_BITS, k: int = _BLOOM_K) -> dict:
    """Build per-column Bloom filters over a partition's written values.
    Unlike zone maps this reads the filtered columns back once — but only
    the partition's OWN files (partition-local, no exchange), and only the
    distinct values hash. Float columns (or any unhashable type) record a
    ``kind: none`` filter = unprunable, never wrong."""
    import base64

    import numpy as np
    import pyarrow.parquet as pq

    out: dict[str, Any] = {}
    for col in cols:
        bits = np.zeros(m // 8, np.uint8)
        ok = True
        for f in files:
            try:
                t = pq.read_table(f, columns=[col])
            except Exception:
                ok = False
                break
            vals = t.column(col).drop_null()
            try:
                uniq = vals.unique().to_pylist()
            except Exception:
                ok = False
                break
            for v in uniq:
                if isinstance(v, float):
                    ok = False
                    break
                for pos in _bloom_positions(v, m, k):
                    bits[pos >> 3] |= 1 << (pos & 7)
            if not ok:
                break
        if not ok:
            out[col] = {"kind": "none"}
            continue
        out[col] = {"kind": "bloom", "m": m, "k": k,
                    "bits": base64.b64encode(bits.tobytes()).decode()}
    return out


def prune_partitions_eq(out_dir: str, col: str, value):
    """→ (kept_part_ids, all_part_ids): equality data-skipping — completed
    partitions whose ``col`` Bloom filter MIGHT contain ``value`` (plus a
    zone-map bounds check when one exists). Partitions without a usable
    filter are KEPT (skipping must never drop rows)."""
    import base64

    done = completed_partitions(out_dir)
    kept = []
    for pid in sorted(done):
        metrics = done[pid].get("metrics") or {}
        zm = (metrics.get("zonemap") or {}).get(col)
        if zm and zm.get("kind") not in (None, "none") \
                and zm.get("min") is not None:
            try:
                if value < zm["min"] or value > zm["max"]:
                    continue
            except TypeError:
                pass
        bl = (metrics.get("bloom") or {}).get(col)
        if not bl or bl.get("kind") != "bloom":
            kept.append(pid)
            continue
        bits = base64.b64decode(bl["bits"])
        try:
            hit = all(bits[p >> 3] & (1 << (p & 7))
                      for p in _bloom_positions(value, bl["m"], bl["k"]))
        except TypeError:
            hit = True
        if hit:
            kept.append(pid)
    return kept, sorted(done)


def read_output_point(out_dir: str, col: str, value):
    """Point-lookup read: only partitions whose Bloom filter (and zone
    map, if any) admit ``value`` are scanned, with the EXACT equality
    residual applied inside the scan. The selective-read path for
    "fetch this url's verdict" over a 2048-partition output."""
    import pyarrow.dataset as _pds

    kept, _ = prune_partitions_eq(out_dir, col, value)
    files = [str(f) for pid in kept
             for f in sorted((Path(out_dir) / f"part-{pid}")
                             .glob("*.parquet"))]
    if not files:
        import pyarrow.parquet as _pq

        import ray.data as _rd

        done = completed_partitions(out_dir)
        any_files = [str(f) for pid in sorted(done)
                     for f in sorted((Path(out_dir) / f"part-{pid}")
                                     .glob("*.parquet"))]
        if not any_files:
            raise FileNotFoundError(f"no completed output in {out_dir}")
        schema = _pq.read_schema(any_files[0])
        return _rd.from_arrow(schema.empty_table())
    return read_parquet(files, filter=_pds.field(col) == value)
