"""Uniqueness check: find duplicate keys at scale.

North-star component: "uniqueness checks on url (sorted-merge + groupby-count
shuffle with salted keys for skewed hosts)".

Strategy (two-phase + explicit hash partitioning):

1. **combiner** — counts per key INSIDE each batch (``value_counts``): a key
   that dominates the corpus (skewed host) reaches the shuffle as ≤ one
   small count row per batch, not as its full row set — the per-batch
   pre-aggregation IS the salt (batch id = implicit salt), exactly the
   "salted two-phase aggregate" of SURVEY.md §4;
2. **bucket column** — ``bucket = hash(key) & (B-1)`` (B ≈ 2× cores,
   configurable) so the wide exchange groups on a SMALL INT key instead of
   sorting the full string key space — measured 3.5s → 1.3s on 200k urls
   at 32 CPUs vs the string groupby;
3. **per-bucket merge** — one ``map_groups`` task per bucket runs a
   vectorized pandas groupby-sum and filters ``count > 1``.

Only (key, partial_count) pairs ever cross the shuffle; documents never do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_partial(key: str, n_buckets: int):
    mask = np.uint64(n_buckets - 1)

    def fn(batch: pa.Table) -> pa.Table:
        vc = batch.column(key).value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        vals = pc.struct_field(vc, "values")
        cnts = pc.struct_field(vc, "counts")
        h = pd.util.hash_pandas_object(vals.to_pandas(), index=False).to_numpy()
        bucket = (h & mask).astype(np.int32)
        return pa.table({key: vals, "partial_count": cnts,
                         "bucket": pa.array(bucket)})

    return fn


def _hash_partial(key: str, n_buckets: int):
    """Like :func:`_bucket_partial` but emits the 64-bit KEY HASH instead of
    the key itself — the shuffle then moves 8-byte hashes, not strings
    (~6× fewer bytes for urls). Consumers must recover the true strings for
    the (rare) duplicate hashes afterwards; hash collisions only ever ADD
    candidates, never merge distinct keys (recovery re-counts by string)."""
    mask = np.uint64(n_buckets - 1)

    def fn(batch: pa.Table) -> pa.Table:
        vc = batch.column(key).value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        vals = pc.struct_field(vc, "values")
        cnts = pc.struct_field(vc, "counts")
        h = pd.util.hash_pandas_object(vals.to_pandas(), index=False).to_numpy()
        bucket = (h & mask).astype(np.int32)
        return pa.table({"key_hash": pa.array(h.astype(np.uint64)),
                         "partial_count": cnts,
                         "bucket": pa.array(bucket)})

    return fn


def merge_duplicate_partials(partials, key: str):
    """Phase 2: ``(key, partial_count, bucket)`` partial rows →
    ``(key, dup_count)`` for keys with total count > 1. Exposed so a fused
    multi-output corpus pass (pipelines/webtext.wide_checks_files) can emit
    phase-1 partials inline and reuse this exchange unchanged."""

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # Arrow return (not pandas): an empty/object key column in a pandas
        # block trips Ray's size estimator ("cannot call `vectorize` on
        # size 0 inputs") — same fix as stages/linededup.py.
        agg = g.groupby(key, sort=False)["partial_count"].sum()
        agg = agg[agg > 1]
        ktype = pa.Array.from_pandas(g[key].iloc[:1]).type
        return pa.table({
            key: pa.Array.from_pandas(
                agg.index.to_series().reset_index(drop=True), type=ktype),
            "dup_count": pa.array(agg.to_numpy(np.int64), type=pa.int64()),
        })

    return partials.groupby("bucket").map_groups(per_bucket,
                                                 batch_format="pandas")


def duplicate_keys(ds, key: str, *, batch_size: int = 65536,
                   n_buckets: int = 64):
    """→ Dataset (key, dup_count) for keys appearing more than once.
    ``n_buckets`` must be a power of two; size it ≳ 2× total cores so the
    merge stage saturates the cluster while each task stays coarse."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    partials = ds.select_columns([key]).map_batches(
        _bucket_partial(key, n_buckets), batch_format="pyarrow",
        batch_size=batch_size)
    return merge_duplicate_partials(partials, key)


def uniqueness_violations(ds, key: str, constraint_id: str | None = None):
    """→ violation rows ``(key, constraint_id, dup_count)`` per north star."""
    cid = constraint_id or f"uniqueness:{key}"

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "constraint_id", pa.array([cid] * batch.num_rows))

    return duplicate_keys(ds, key).map_batches(tag, batch_format="pyarrow")


def group_distinct_count(ds, group: str, value: str, *,
                         batch_size: int = 65536, n_buckets: int = 64,
                         driver_fold_limit: int = 5_000_000):
    """EXACT ``COUNT(DISTINCT value) GROUP BY group`` at scale, two-phase:

    1. each batch reduces to its distinct (group, value) pairs (Arrow
       ``group_by`` — a skewed value reaches the shuffle once per batch);
    2. pairs hash-exchange on ``hash(group, value) % n_buckets`` — a pair
       lands in exactly one bucket, so a per-bucket pandas
       ``drop_duplicates`` is a GLOBAL dedup — and each bucket emits
       per-group partial distinct counts;
    3. the ≤ n_buckets-per-group partial rows fold driver-side below
       ``driver_fold_limit`` rows (Ray's sort-based aggregate measured
       13.8 s for 46k partial rows / 720 groups — the known
       tiny-rows-many-blocks trap); above it (billions of groups, e.g.
       per-user distincts) one more hash exchange on the GROUP folds per
       bucket on the pandas C-path.

    → Dataset ``(group, n_distinct)``. Null values are not counted but
    null-only groups still appear with 0 (SQL COUNT(DISTINCT) parity);
    null groups count as a group.
    """
    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table({group: b.column(group), value: b.column(value)})
        return t.group_by([group, value]).aggregate([])

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=batch_size)

    mask = np.uint64(n_buckets - 1)

    def add_bucket(b: pa.Table) -> pa.Table:
        df = b.select([group, value]).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        return b.append_column("__b", pa.array(
            (h & mask).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates([group, value])
        # count non-null distinct values; a group seen only with nulls
        # still emits a 0 partial so it survives to the final sum
        out = d.assign(__nn=d[value].notna().astype("int64")) \
            .groupby(group, sort=False, dropna=False, observed=True)["__nn"] \
            .sum().reset_index(name="partial")
        # Arrow return with an explicit key type (see per_bucket above);
        # an all-null object group column would otherwise infer pa.null()
        gt = pa.Array.from_pandas(g[group].iloc[:1]).type
        if pa.types.is_null(gt):
            gt = None
        return pa.table({
            group: pa.array(out[group], type=gt, from_pandas=True),
            "partial": pa.array(out["partial"].to_numpy(np.int64),
                                type=pa.int64()),
        })

    partials = pairs.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas") \
        .materialize()
    import ray.data
    if partials.count() == 0:
        # empty input: partials lost their schema with their blocks — the
        # answer is the empty (group, n_distinct) table, typed from ds
        raw0 = dict(zip(ds.schema().names, ds.schema().types))[group]
        if not isinstance(raw0, pa.DataType):
            try:
                raw0 = pa.from_numpy_dtype(np.dtype(raw0))
            except (TypeError, ValueError, pa.ArrowNotImplementedError):
                raw0 = pa.string()
        return ray.data.from_arrow(pa.table({
            group: pa.array([], type=raw0),
            "n_distinct": pa.array([], type=pa.int64())}))
    # group Arrow type from the MATERIALIZED partials (schema() on the lazy
    # input would trigger a fragment execution); pandas-backed datasets
    # report numpy dtypes / Python classes — normalize, else let pa infer
    raw = dict(zip(partials.schema().names, partials.schema().types))[group]
    if isinstance(raw, pa.DataType):
        gtype = raw
    else:
        try:
            gtype = pa.from_numpy_dtype(np.dtype(raw))
        except (TypeError, ValueError, pa.ArrowNotImplementedError):
            gtype = None

    def _fold(df: pd.DataFrame) -> pa.Table:
        out = df.groupby(group, sort=False, dropna=False,
                         observed=True)["partial"].sum() \
            .reset_index(name="n_distinct")
        return pa.table({
            group: pa.array(out[group], type=gtype, from_pandas=True),
            "n_distinct": pa.array(out["n_distinct"].to_numpy(),
                                   type=pa.int64()),
        }) if gtype is not None else pa.table({
            group: pa.array(out[group], from_pandas=True),
            "n_distinct": pa.array(out["n_distinct"].to_numpy(),
                                   type=pa.int64()),
        })

    if partials.count() <= driver_fold_limit:
        return ray.data.from_arrow(_fold(partials.to_pandas()))

    def add_gbucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(group).to_pandas(), index=False).to_numpy()
        return b.append_column("__gb", pa.array(
            (h & mask).astype(np.int32)))

    def fold_bucket(g: pd.DataFrame) -> pa.Table:
        return _fold(g)

    return partials.map_batches(add_gbucket, batch_format="pyarrow") \
        .groupby("__gb").map_groups(fold_bucket, batch_format="pandas")
