"""Deterministic sampling operators for training-data curation.

Both operators are pure functions of row content (no RNG state), so any
partitioning / batch size / retry produces identical output — the property
that makes sampling safe under Ray's task retries (SURVEY §4: idempotent
stages).

- :func:`grouped_first_k` — per-group quota sampling (first k rows per group
  by an order column): per-batch partial head (sorted-table vectorized rank,
  no pandas in the scan) + per-group final head. SQL-oracle-able via
  ``row_number() OVER (PARTITION BY g ORDER BY o)``.
- :func:`lcg_fraction_sample` — keep a deterministic pseudo-random fraction
  of rows keyed by an INTEGER id: one MINSTD LCG step
  ``h = (48271·key + 11) mod (2^31−1)`` and keep rows with
  ``h mod 100 < pct``. The multiplier is 2^15.6, so the product stays well
  inside int64 for ids up to ~10^12 — the same arithmetic is expressible
  verbatim in SQL, giving an exact cross-engine oracle. An LCG step is a
  full-period permutation of [1, 2^31−2], so sequential ids map to
  well-spread residues (this is a SAMPLER, not a cryptographic hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_LCG_A = 48271          # MINSTD multiplier
_LCG_B = 11
_LCG_M = 2147483647     # 2^31 - 1


def _sorted_group_head(t: pa.Table, group: str, sort_keys: list, k: int
                       ) -> pa.Table:
    """Top-k rows per group of a table: sort once, then a vectorized
    within-group rank from group-change boundaries."""
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(t, sort_keys=sort_keys)
    t = t.take(order)
    g = t.column(group).combine_chunks()
    if len(g) > 1:
        brk = pc.invert(pc.equal(g.slice(1), g.slice(0, len(g) - 1)))
        new_group = np.r_[True, pc.fill_null(brk, True).to_numpy(
            zero_copy_only=False)]
    else:
        new_group = np.array([True])
    starts = np.flatnonzero(new_group)
    gid = np.cumsum(new_group) - 1
    rank = np.arange(len(g)) - starts[gid]
    return t.filter(pa.array(rank < k))


def grouped_first_k(ds, group: str, order: str, k: int, *,
                    batch_size: int = 32768, num_buckets: int = 32):
    """→ Dataset of the first ``k`` rows per ``group``, ordered by
    ``order`` ascending (ties keep all sort-stable duplicates of the order
    value ordering — use a unique order column for determinism). Per-batch
    partial heads, then hash-bucketed final heads — one Ray group per
    BUCKET, every group of a bucket finalized in one C-path pandas pass
    (a Ray group per distinct group value pays one Python task each)."""
    keys = [(group, "ascending"), (order, "ascending")]

    def partial(b: pa.Table) -> pa.Table:
        return _sorted_group_head(b, group, keys, k)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)

    from .joins import _bucketize

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__kb"])
        return g.sort_values([group, order], kind="mergesort") \
                .groupby(group, sort=False, dropna=False).head(k)

    return _bucketize(partials, group, num_buckets).groupby("__kb") \
        .map_groups(final, batch_format="pandas")


def mix_sources(ds, key: str, group: str, pcts: dict, *,
                default_pct: int = 0, batch_size: int = 32768):
    """Weighted corpus mixing: keep a per-GROUP deterministic percentage of
    rows (``pcts[group_value] = 0..100``), e.g. up-/down-weighting crawl
    sources into a target training mix. Same LCG arithmetic as
    :func:`lcg_fraction_sample` (SQL-exact), with the threshold chosen per
    row from its group value via one dictionary probe (`pc.index_in` +
    ``take`` — Arrow hashmap, no Python loop). Unknown groups get
    ``default_pct``; null keys drop."""
    groups = pa.array(list(pcts.keys()))
    th = pa.array(list(pcts.values()), type=pa.int64())

    def keep(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(key), pa.int64())
        h = pc.add(pc.multiply(col, _LCG_A), _LCG_B)
        bucket = pc.subtract(h, pc.multiply(pc.divide(h, _LCG_M), _LCG_M))
        r = pc.subtract(bucket, pc.multiply(pc.divide(bucket, 100), 100))
        idx = pc.index_in(b.column(group), value_set=groups)
        row_pct = pc.fill_null(th.take(idx), default_pct)
        sel = pc.less(r, row_pct)
        return b.filter(pc.fill_null(sel, False))

    return ds.map_batches(keep, batch_format="pyarrow",
                          batch_size=batch_size)


def lcg_fraction_sample(ds, key: str, pct: int, *, batch_size: int = 32768):
    """→ Dataset keeping rows whose integer ``key`` lands in the
    deterministic ``pct``-percent sample (see module docstring). Null keys
    are dropped."""
    assert 0 <= pct <= 100

    def keep(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(key), pa.int64())
        h = pc.add(pc.multiply(col, _LCG_A), _LCG_B)
        bucket = pc.subtract(h, pc.multiply(pc.divide(h, _LCG_M), _LCG_M))
        # bucket = h mod M via h - (h // M)·M (Arrow's integer divide
        # truncates toward zero; keys are non-negative here)
        sel = pc.less(pc.subtract(bucket, pc.multiply(
            pc.divide(bucket, 100), 100)), pct)
        return b.filter(pc.fill_null(sel, False))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=batch_size)


def assign_splits(ds, key: str, splits: list[tuple[str, int]], *,
                  batch_size: int = 32768):
    """→ Dataset with a ``split`` column: deterministic train/val/test
    partitioning by the same MINSTD LCG percentile as
    :func:`lcg_fraction_sample` — a pure function of the integer key, so
    the assignment is stable across runs, machines, and engines (SQL
    CASE on the identical arithmetic). ``splits`` = ordered (name, pct)
    pairs summing to 100, e.g. [("train", 80), ("val", 10),
    ("test", 10)]. Null keys are dropped."""
    assert sum(p for _, p in splits) == 100
    names = [n for n, _ in splits]
    edges = np.cumsum([p for _, p in splits])

    def assign(b: pa.Table) -> pa.Table:
        col = pc.cast(b.column(key), pa.int64())
        b = b.filter(pc.is_valid(col))
        col = pc.cast(b.column(key), pa.int64())
        h = pc.add(pc.multiply(col, _LCG_A), _LCG_B)
        bucket = pc.subtract(h, pc.multiply(pc.divide(h, _LCG_M), _LCG_M))
        pctile = pc.subtract(bucket, pc.multiply(
            pc.divide(bucket, 100), 100)).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, pctile, side="right")
        lab = np.asarray(names, dtype=object)[idx]
        return b.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=batch_size)
