"""Uniqueness check: find duplicate keys at scale.

North-star component: "uniqueness checks on url (sorted-merge + groupby-count
shuffle with salted keys for skewed hosts)".

Two-phase aggregate (SURVEY.md §7.2): phase 1 pre-aggregates counts per key
INSIDE each batch (``map_batches`` combiner — each batch contributes at most
one row per distinct key, so a key that dominates the corpus reaches the
shuffle as ~#batches small count rows, not as its full row set: this IS the
salt, the implicit salt being the batch id); phase 2 is a
``groupby(key).sum`` over the much smaller partials, filtered to
``dup_count > 1``.

For key columns with very high distinct-rate (urls) the partials are ~the
input size; the shuffle then moves (key, 1) pairs — still far smaller than
full rows. Callers should project to the key column before calling (done
here via ``select_columns``).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Sum


def _partial_counts(key: str):
    def fn(batch: pa.Table) -> pa.Table:
        vc = batch.column(key).value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        import pyarrow.compute as pc

        values = pc.struct_field(vc, "values")
        counts = pc.struct_field(vc, "counts")
        return pa.table({key: values, "partial_count": counts})

    return fn


def duplicate_keys(ds, key: str, *, batch_size: int = 65536):
    """→ Dataset (key, dup_count) for keys appearing more than once."""
    partials = ds.select_columns([key]).map_batches(
        _partial_counts(key), batch_format="pyarrow", batch_size=batch_size)
    counts = partials.groupby(key).aggregate(
        Sum("partial_count", alias_name="dup_count"))
    return counts.filter(expr="dup_count > 1")


def uniqueness_violations(ds, key: str, constraint_id: str | None = None):
    """→ violation rows ``(key, constraint_id, dup_count)`` per north star."""
    cid = constraint_id or f"uniqueness:{key}"

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "constraint_id", pa.array([cid] * batch.num_rows))

    return duplicate_keys(ds, key).map_batches(tag, batch_format="pyarrow")
