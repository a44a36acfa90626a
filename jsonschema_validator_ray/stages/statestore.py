"""Checkpointed sketch state across runs: INCREMENTAL column statistics.

Profiling a growing corpus by re-running ``column_stats`` over ``old ∪ new``
rescans the full history every ingest — O(total) per increment, untenable at
100 TB/crawl. This store instead persists the per-column PARTIAL sketch rows
(exact count/null/min/max/sum + mergeable HLL / t-digest / histogram bytes,
stages/stats.PARTIAL_SCHEMA) and folds each new run's partials in:

- ``write_stats_state``  — profile a corpus once, persist one merged partial
  row per column as generation 0;
- ``update_stats_state`` — profile ONLY the new data (one pass over the new
  rows; the history is never re-read) and append it as a new generation;
- ``finalize_stats``     — merge all generations' partial rows (columns ×
  generations rows, i.e. KBs) into the same final stats frame
  ``column_stats`` would produce, driver-side;
- ``psi_vs_state``       — drift of a fresh run against the ACCUMULATED
  history's histogram (population-stability index), without rescanning it.

Soundness: every statistic kept is a commutative monoid — count/null/sum
add, min/max compose, HLL merge is an elementwise register max, histogram
counts add — so ``finalize(write(A) + update(B)) == column_stats(A ∪ B)``
exactly for everything except t-digest quantiles (merge-order dependent by
construction; still deterministic given the generation order, and within
normal t-digest error of the one-pass digest).

Layout mirrors stages/hashindex: ``gen-<g>/`` Parquet directories plus an
atomically-replaced ``meta.json`` (sketch configuration + generation list),
so a killed update leaves the previous state intact and readers never see a
partial generation. Generations are tiny (one row per column), so no
compaction is needed; ``finalize_stats`` cost is O(columns × generations).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.histogram import (CategoricalHistogram, NumericHistogram, psi)
from ..state.hll import HyperLogLog
from ..state.tdigest import TDigest
from .stats import PARTIAL_SCHEMA, StatsPartial, merge_partials
from .util import fresh_dir
from .util import read_meta as _read_meta
from .util import write_meta as _write_meta


def _hist_cls(payload: str):
    # key sniff on the parsed JSON (a category literally named "edges"
    # must not flip the class — same rule as stats.merge_partials)
    return (NumericHistogram if "edges" in json.loads(payload)
            else CategoricalHistogram)


def _fold_group(group: pd.DataFrame) -> pd.DataFrame:
    """Merge many PARTIAL rows of one column into ONE partial row (stays in
    PARTIAL_SCHEMA — unlike stats.merge_partials, which finalizes). Every
    reduction here is associative+commutative except the t-digest fold,
    which follows the input row order (deterministic per generation)."""
    hll = HyperLogLog.from_bytes(group["hll"].iloc[0])
    for b in group["hll"].iloc[1:]:
        hll.merge(HyperLogLog.from_bytes(b))
    tds = group["tdigest"].dropna()
    td_bytes = None
    if len(tds):
        td = TDigest.from_bytes(tds.iloc[0])
        for b in tds.iloc[1:]:
            td.merge(TDigest.from_bytes(b))
        td_bytes = td.to_bytes()
    hists = group["hist"].dropna()
    hist_json = None
    if len(hists):
        cls = _hist_cls(hists.iloc[0])
        h = cls.from_json(hists.iloc[0])
        for s in hists.iloc[1:]:
            h.merge(cls.from_json(s))
        hist_json = h.to_json()
    mn, mx, sm = (group[c].dropna() for c in ("min_num", "max_num", "sum_num"))
    mns, mxs = group["min_str"].dropna(), group["max_str"].dropna()
    # explicit PARTIAL_SCHEMA table: one-row pandas groups with all-None
    # cells would otherwise infer null-typed columns that conflict with
    # sibling groups' float/binary blocks at write time
    return pa.Table.from_pylist([{
        "column": group["column"].iloc[0],
        "cnt": int(group["cnt"].sum()),
        "nulls": int(group["nulls"].sum()),
        "n_nan": int(group["n_nan"].sum()),
        "min_num": float(mn.min()) if len(mn) else None,
        "max_num": float(mx.max()) if len(mx) else None,
        "sum_num": float(sm.sum()) if len(sm) else None,
        "min_str": mns.min() if len(mns) else None,
        "max_str": mxs.max() if len(mxs) else None,
        "hll": hll.to_bytes(),
        "tdigest": td_bytes,
        "hist": hist_json,
    }], schema=PARTIAL_SCHEMA)


def _run_partials(ds, meta: dict, batch_size: int):
    """One merged partial row per column for ``ds`` — the distributed pass.
    Sketch bytes shuffle (≤ ~16 KB per batch-partial), raw values never do.
    Below a 512-block gate the fold runs DRIVER-side: Ray's sort-based
    groupby costs ~0.5-2 s of pure scheduling for a handful of tiny rows
    spread over many blocks (measured in the wide-checks stats leg), while
    the partials here are blocks × columns rows of sketch bytes — KBs.
    Past the gate the distributed groupby keeps the driver out of it."""
    import ray.data

    from .quantiles import _block_count

    partial = StatsPartial(meta["columns"], hll_p=meta["hll_p"],
                           tdigest_compression=meta["compression"],
                           hist_edges=meta["hist_edges"] or None,
                           hist_categories=meta["hist_categories"] or None)
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)
    if _block_count(ds) <= 512:
        df = partials.to_pandas()
        if len(df) and "column" in df.columns:
            merged = pa.concat_tables(
                [_fold_group(g)
                 for _, g in df.groupby("column", sort=True)])
        else:                    # empty input loses its block schema
            merged = PARTIAL_SCHEMA.empty_table()
        return ray.data.from_arrow(merged)
    return partials.groupby("column").map_groups(
        _fold_group, batch_format="pandas")


def write_stats_state(ds, path: str, columns: list[str] | None = None, *,
                      hll_p: int = 14, tdigest_compression: float = 100.0,
                      hist_edges: dict[str, list[float]] | None = None,
                      hist_categories: dict[str, list[str]] | None = None,
                      batch_size: int = 65536) -> None:
    """Create the state at ``path`` (generation 0) from the initial corpus.
    The sketch configuration is recorded in meta.json and reused by every
    later ``update_stats_state`` — mergeability requires identical hll_p /
    histogram edges across generations."""
    meta = {"columns": columns, "hll_p": hll_p,
            "compression": tdigest_compression,
            "hist_edges": hist_edges or {},
            "hist_categories": hist_categories or {},
            "generations": []}
    os.makedirs(path, exist_ok=True)
    gen = "gen-000000"
    _run_partials(ds, meta, batch_size).write_parquet(
        fresh_dir(os.path.join(path, gen)))
    meta["generations"] = [gen]
    _write_meta(path, meta)


def update_stats_state(ds, path: str, *, batch_size: int = 65536) -> None:
    """Fold a NEW ingest into the state: one distributed pass over ``ds``
    only, then an atomic meta swap (data lands fully before meta.json is
    replaced — a crash mid-update leaves the previous state valid)."""
    meta = _read_meta(path)
    gen = f"gen-{len(meta['generations']):06d}"
    _run_partials(ds, meta, batch_size).write_parquet(
        fresh_dir(os.path.join(path, gen)))
    meta["generations"].append(gen)
    _write_meta(path, meta)


def _state_rows(path: str, meta: dict) -> pd.DataFrame:
    parts = []
    for gen in meta["generations"]:
        files = sorted(str(f) for f in Path(path, gen).rglob("*.parquet"))
        for f in files:
            parts.append(pq.read_table(f).to_pandas())
    df = pd.concat(parts, ignore_index=True)
    return df[[f.name for f in PARTIAL_SCHEMA]]


def finalize_stats(path: str) -> pd.DataFrame:
    """All generations → the final per-column stats frame (same shape as
    ``stages.stats.column_stats``). Driver-side on columns × generations
    rows — metadata-scale regardless of corpus size."""
    meta = _read_meta(path)
    rows = _state_rows(path, meta)
    # explicit per-group loop: merge_partials needs the "column" column,
    # which groupby.apply is deprecating out of the group frame
    out = pd.concat([merge_partials(g)
                     for _, g in rows.groupby("column", sort=True)],
                    ignore_index=True)
    return out


def state_row_count(path: str) -> int:
    """Total rows folded into the state (sums the persisted cnt column of
    one arbitrary column's rows — every column sees every row)."""
    meta = _read_meta(path)
    rows = _state_rows(path, meta)
    first = rows["column"].iloc[0]
    return int(rows.loc[rows["column"] == first, "cnt"].sum())


def _baseline_hist(path: str, column: str):
    """The ACCUMULATED history histogram of ``column`` from the persisted
    state (all generations merged driver-side — KBs)."""
    meta = _read_meta(path)
    if (column not in meta["hist_edges"]
            and column not in meta["hist_categories"]):
        raise ValueError(f"no histogram configured for column {column!r}")
    hist_rows = _state_rows(path, meta)
    hist_rows = hist_rows[hist_rows["column"] == column]["hist"].dropna()
    if not len(hist_rows):
        raise ValueError(f"state holds no histogram rows for {column!r}")
    cls = _hist_cls(hist_rows.iloc[0])
    baseline = cls.from_json(hist_rows.iloc[0])
    for s in hist_rows.iloc[1:]:
        baseline.merge(cls.from_json(s))
    return cls, baseline


def psi_from_partials(path: str, column: str,
                      hist_jsons: list[str]) -> float:
    """PSI of a fresh run against the accumulated state, where the fresh
    run's per-batch histogram partials were already computed inline by
    another pass (pipelines/incremental's fused dedup+drift exchange).
    Identical to :func:`psi_vs_state` — histogram merges are integer bin
    adds, so the fold is batching-invariant."""
    cls, baseline = _baseline_hist(path, column)
    cur = cls.from_json(hist_jsons[0])
    for s in hist_jsons[1:]:
        cur.merge(cls.from_json(s))
    return float(psi(baseline.proportions(), cur.proportions()))


def psi_vs_state(ds, path: str, column: str, *,
                 batch_size: int = 65536) -> float:
    """Population-stability index of ``ds``'s distribution on ``column``
    against the ACCUMULATED history in the state (requires the column to
    have histogram config in meta.json). One distributed pass over ``ds``;
    the history side comes from the persisted sketch bytes."""
    meta = _read_meta(path)
    cls, baseline = _baseline_hist(path, column)

    cur_rows = _run_partials(
        ds.select_columns([column]),
        {**meta, "columns": [column]}, batch_size).to_pandas()
    cur = cls.from_json(cur_rows["hist"].dropna().iloc[0])
    return float(psi(baseline.proportions(), cur.proportions()))
