"""Referential-integrity checks via broadcast semi/anti join.

North-star component: "referential checks of lang against an ISO-639
broadcast dictionary".

The valid-key side is SMALL (a dictionary, a dimension table's key set) — so
it is broadcast once (``ray.put`` → read in each task / captured in the
actor's ``__init__``) and probed with ``pc.is_in`` per batch. Never a
shuffle join (SURVEY.md §7.2: "referential(lang) → broadcast dict in actor —
no shuffle").

Two entry points:
- :func:`referential_violations` — valid values given directly (dictionary).
- :func:`fk_violations` — valid values are the distinct keys of another
  (small) dataset: the dimension side is collected ONCE on the driver
  (bounded by its distinct count) and broadcast.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

import ray


class _AntiJoin:
    """Actor stage: keep rows whose ``column`` is NOT in the broadcast set.
    NULLs are 'absent' and never violations (required covers them)."""

    def __init__(self, column: str, key: str, valid_ref, constraint_id: str):
        # valid_ref is an ObjectRef (broadcast) or a plain list. Nulls are
        # dropped (a null dimension key matches nothing; sorting them would
        # TypeError), and pc.is_in needs no ordering.
        values = ray.get(valid_ref) if isinstance(valid_ref, ray.ObjectRef) else valid_ref
        self.value_set = pa.array([v for v in values if v is not None])
        self.column = column
        self.key = key
        self.constraint_id = constraint_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if len(self.value_set) == 0:
            # empty dimension: every non-null key is a violation (is_in
            # with a null-typed empty set would raise ArrowTypeError)
            bad = pc.is_valid(col)
        else:
            bad = pc.fill_null(pc.and_kleene(
                pc.is_valid(col),
                pc.invert(pc.is_in(col, value_set=self.value_set))), False)
        sub = batch.filter(bad)
        return pa.table({
            self.key: sub.column(self.key),
            self.column: sub.column(self.column),
            "constraint_id": pa.array([self.constraint_id] * sub.num_rows,
                                      type=pa.string()),
        })


def referential_violations(ds, column: str, key: str,
                           valid_values: Iterable, *,
                           constraint_id: str | None = None,
                           batch_size: int = 65536,
                           concurrency: int | None = None):
    """→ Dataset ``(key, column, constraint_id)`` of rows whose ``column``
    value is not in ``valid_values``."""
    cid = constraint_id or f"referential:{column}"
    values = list(valid_values)
    # Small dictionaries travel in the actor task spec (once per actor);
    # big ones (>~100k entries) should be ray.put once and passed as the
    # ObjectRef — _AntiJoin resolves either form in __init__.
    ref = ray.put(values) if len(values) > 100_000 else values
    return ds.select_columns([key, column]).map_batches(
        _AntiJoin, fn_constructor_args=(column, key, ref, cid),
        concurrency=(1, concurrency or 2),
        batch_format="pyarrow", batch_size=batch_size)


def fk_violations(fact_ds, fact_key: str, fact_column: str,
                  dim_ds, dim_column: str, *,
                  constraint_id: str | None = None,
                  batch_size: int = 65536,
                  concurrency: int | None = None):
    """Foreign-key check: fact.``fact_column`` ⊆ dim.``dim_column``.

    The dimension side must be the SMALL side; its distinct keys are
    materialized on the driver (bounded by distinct count, not row count)
    and broadcast. For two large sides, bucket-join instead (see
    stages/dedup.py for the bucketed groupby pattern).
    """
    cid = constraint_id or f"referential:{fact_column}"
    dim_keys = dim_ds.select_columns([dim_column]).unique(dim_column)
    if dim_keys is None:      # Dataset.unique on an EMPTY dimension
        dim_keys = []
    return referential_violations(
        fact_ds, fact_column, fact_key, dim_keys,
        constraint_id=cid, batch_size=batch_size, concurrency=concurrency)


class _BloomAntiJoin:
    """Actor stage: flag rows whose key is DEFINITELY not in the broadcast
    Bloom filter. No false accusations ever (a flagged key is truly
    absent); a violation can slip through with probability ≈ the filter's
    FP rate — the documented trade for never shuffling the fact side and
    broadcasting bits instead of keys."""

    def __init__(self, column: str, key: str, bloom_ref, constraint_id: str):
        import ray as _ray

        from ..state.bloom import BloomFilter
        b = _ray.get(bloom_ref) if isinstance(bloom_ref, _ray.ObjectRef) \
            else bloom_ref
        self.bloom = BloomFilter.from_bytes(b)
        self.column = column
        self.key = key
        self.constraint_id = constraint_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        valid = pc.is_valid(col)
        maybe = self.bloom.contains(col.to_pandas())
        bad = pc.and_(valid, pa.array(~maybe))
        sub = batch.filter(bad)
        return pa.table({
            self.key: sub.column(self.key),
            self.column: sub.column(self.column),
            "constraint_id": pa.array([self.constraint_id] * sub.num_rows,
                                      type=pa.string()),
        })


def fk_violations_bloom(fact_ds, fact_key: str, fact_column: str,
                        dim_ds, dim_column: str, *,
                        expected_keys: int = 1_000_000, fp: float = 0.001,
                        constraint_id: str | None = None,
                        batch_size: int = 65536,
                        concurrency: int | None = None):
    """FK check via a broadcast Bloom filter of the dimension keys — the
    100-TB path when the dimension's DISTINCT key set is too large to
    broadcast exactly (``fk_violations``) but its bit array is not:
    10^9 keys at 0.1% FP ≈ 1.7 GB of bits vs ≥ 8 GB of raw int keys.

    Dimension side: one partial Bloom per batch (map_batches), OR-folded
    (bounded: batches × m/8 bytes) and broadcast once. Fact side: an actor
    probe per batch. Flagged rows are EXACT violations (no false
    positives); a violation escapes with probability ≈ ``fp``.
    """
    import numpy as np

    from ..state.bloom import BloomFilter, bits_for

    m, k = bits_for(expected_keys, fp)

    def partial(b: pa.Table) -> pa.Table:
        bf = BloomFilter(m, k)
        col = b.column(dim_column)
        bf.add_values(pc.drop_null(col).to_pandas())
        return pa.table({"bloom": pa.array([bf.to_bytes()],
                                           type=pa.binary())})

    parts = dim_ds.select_columns([dim_column]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    merged = BloomFilter(m, k)
    # an empty dimension dataset drops its blocks through to_pandas and
    # loses the column (repo conventions) — the all-zeros filter is correct then
    if "bloom" in parts.columns:
        for b in parts["bloom"]:
            merged.merge(BloomFilter.from_bytes(b))

    cid = constraint_id or f"referential-bloom:{fact_column}"
    ref = ray.put(merged.to_bytes())
    return fact_ds.select_columns([fact_key, fact_column]).map_batches(
        _BloomAntiJoin, fn_constructor_args=(fact_column, fact_key, ref, cid),
        concurrency=(1, concurrency or 2),
        batch_format="pyarrow", batch_size=batch_size)
