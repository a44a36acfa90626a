"""Line-level (paragraph-level) corpus deduplication.

Web-scale training corpora carry boilerplate lines — navigation, cookie
banners, footers — repeated across millions of pages; removing lines that
appear in ≥ ``min_count`` documents corpus-wide is the line-dedup step of
published web-pipeline recipes (Penedo et al. 2023 "The RefinedWeb
Dataset" §3.3; Wenzek et al. 2020 CCNet do the same at paragraph level —
public papers). Two stages, both streaming:

1. **count**: per batch, split each document on ``\\n``, drop
   space-trimmed-empty lines, fold to partial ``(line, n)`` counts (pandas
   ``value_counts`` C path — boilerplate compresses heavily inside a
   batch); shuffle the partials by a hash BUCKET of the line and sum per
   line VALUE inside the bucket (collision-proof, same shape as
   ``dedup_exact``). Only the distinct-line partials cross the exchange,
   never documents.
2. **filter**: membership of each line against the duplicated-line set.
   ``strategy="broadcast"`` puts the dup-line table in the object store
   once (``ray.put``) and every filter actor reads it zero-copy in
   ``__init__`` — right whenever dup lines fit a worker heap (they are
   boilerplate: heavy-tailed and small relative to the corpus).
   ``strategy="join"`` explodes ``(key, line_idx, line)`` rows, bucket-joins
   them against the dup lines by line VALUE, and reassembles documents per
   key bucket — no driver materialization anywhere; right at 10^12 docs if
   the dup set itself outgrows a heap. ``"auto"`` counts the dup set first
   (a cheap aggregate over the already-tiny dup table) and picks.

Reassembly preserves byte content: documents are re-joined with ``\\n`` from
their surviving lines; a document whose every line was boilerplate becomes
``""``; null text stays null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .util import no_meta


def _split_lines(col) -> pa.Array:
    s = pc.cast(col, pa.large_string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    return pc.split_pattern(s, "\n")


def _nonempty_mask(flat: pa.Array) -> pa.Array:
    # SQL parity: trim(line, ' ') strips SPACES only (not tabs/unicode ws)
    return pc.greater(pc.binary_length(pc.utf8_trim(flat, " ")), 0)


def duplicated_lines(ds, column: str, *, min_count: int = 2,
                     num_buckets: int = 64, batch_size: int = 8192):
    """→ Dataset ``(line, n)`` of space-trimmed-nonempty lines appearing
    ≥ ``min_count`` times across the corpus (n = total occurrences)."""

    def partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_split_lines(b.column(column)))
        flat = flat.filter(_nonempty_mask(flat))
        if len(flat) == 0:
            return pa.table({
                "line": pa.array([], type=pa.large_string()),
                "n": pa.array([], type=pa.int64()),
                "__bucket": pa.array([], type=pa.int32())})
        vc = flat.to_pandas().value_counts(sort=False)
        lines = pd.Series(vc.index)
        h = pd.util.hash_pandas_object(lines, index=False).to_numpy()
        return pa.table({
            "line": pa.array(lines.to_numpy(), type=pa.large_string()),
            "n": pa.array(vc.to_numpy().astype(np.int64)),
            "__bucket": pa.array((h % num_buckets).astype(np.int32)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)

    def total_in_bucket(g: pd.DataFrame) -> pa.Table:
        # grouping is by line VALUE inside the bucket — hash collisions
        # cannot merge distinct lines. Arrow (not pandas) return: Ray's
        # pandas-block size estimator np.vectorize()s over object columns
        # and errors loudly on EMPTY ones ("Error calculating size for
        # column 'line'"); Arrow blocks size exactly either way.
        tot = g.groupby("line", sort=False)["n"].sum()
        tot = tot[tot >= min_count]
        return pa.table({
            "line": pa.array(tot.index.to_numpy(), type=pa.large_string()),
            "n": pa.array(tot.to_numpy().astype(np.int64))})

    return partials.groupby("__bucket").map_groups(
        total_in_bucket, batch_format="pandas")


class _BroadcastLineFilter:
    """Actor-pool batch filter: the duplicated-line set is fetched from the
    object store ONCE per actor (zero-copy read of the ``ray.put`` table),
    indexed into a pandas Index for C-path ``isin`` membership."""

    def __init__(self, dup_ref, key: str, column: str, out_column: str):
        table: pa.Table = ray.get(dup_ref)
        self._dups = pd.Index(table.column("line").to_pandas())
        self._key, self._col, self._out = key, column, out_column

    def __call__(self, b: pa.Table) -> pa.Table:
        col = b.column(self._col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = _split_lines(col)
        flat = toks.values
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        keep = ~pd.Series(flat.to_pandas()).isin(self._dups).to_numpy()
        parent = np.repeat(np.arange(len(toks)), counts)
        kept_counts = np.bincount(parent[keep], minlength=len(toks))
        new_offsets = np.concatenate(
            [[0], np.cumsum(kept_counts)]).astype(np.int64)
        kept = pa.LargeListArray.from_arrays(
            pa.array(new_offsets, type=pa.int64()),
            flat.filter(pa.array(keep)))
        # separator must be a large_string scalar — the only binary_join
        # kernel matching large_list<large_string>
        joined = pc.binary_join(kept, pa.scalar("\n", pa.large_string()))
        out = pc.if_else(pc.is_null(col), pa.nulls(len(col), joined.type),
                         joined)
        return pa.table({self._key: b.column(self._key),
                         self._out: pc.cast(out, pa.large_string())})


def remove_duplicate_lines(ds, key: str, column: str, *,
                           min_count: int = 2,
                           out_column: str = "clean_text",
                           strategy: str = "auto",
                           broadcast_limit: int = 1_000_000,
                           num_buckets: int = 64,
                           concurrency: int = 4):
    """→ Dataset ``(key, out_column)`` with corpus-wide duplicated lines
    removed from every document (see module docstring for the two filter
    strategies)."""
    # materialize: auto's count() and the chosen filter branch both
    # consume dups — without this the corpus-wide line scan runs twice
    dups = duplicated_lines(ds, column, min_count=min_count,
                            num_buckets=num_buckets).materialize()
    if strategy == "auto":
        strategy = ("broadcast" if dups.count() <= broadcast_limit
                    else "join")
    if strategy == "broadcast":
        df = dups.to_pandas()
        if "line" not in df.columns:   # empty Dataset loses its schema
            df = pd.DataFrame({"line": pd.Series([], dtype=object)})
        dup_tbl = pa.table({"line": pa.array(df["line"].to_numpy(),
                                             type=pa.large_string())})
        ref = ray.put(dup_tbl)
        return ds.map_batches(
            _BroadcastLineFilter, fn_constructor_args=(ref, key, column,
                                                       out_column),
            batch_format="pyarrow", concurrency=(1, concurrency))
    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")
    return _remove_lines_join(ds, dups, key, column, out_column,
                              num_buckets)


def _remove_lines_join(ds, dups, key: str, column: str, out_column: str,
                       num_buckets: int):
    """Fully-distributed filter: explode (key, idx, line) rows, mark dup
    lines with a bucketed join by line VALUE, reassemble per key bucket.
    The corpus crosses two exchanges (line bucket, then key bucket) — the
    price of never holding the dup set in one heap.

    Every document also emits one SENTINEL row (``__idx`` −1, −2 for null
    text) that can never match a dup line (the empty line is excluded from
    dup candidacy), so reassembly sees every key without any driver-side
    key set: an all-boilerplate document comes back as ``""``, a null one
    as null."""
    key_is_int = pa.types.is_integer(ds.schema().base_schema.field(key).type)

    def explode(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = _split_lines(col)
        flat = toks.values
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        parent = np.repeat(np.arange(len(toks)), counts)
        keys = b.column(key)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        idx = (np.arange(len(flat)) - offsets[:-1][parent]).astype(np.int64)
        h = pd.util.hash_pandas_object(
            flat.to_pandas(), index=False).to_numpy()
        sentinel_idx = np.where(
            pc.is_null(col).to_numpy(zero_copy_only=False), -2, -1
        ).astype(np.int64)
        return pa.table({
            key: pa.concat_arrays([keys.take(pa.array(parent)), keys]),
            "__idx": pa.array(np.concatenate([idx, sentinel_idx])),
            "line": pc.cast(
                pa.concat_arrays([
                    pc.cast(flat, pa.large_string()),
                    pa.array([""] * len(keys), type=pa.large_string())]),
                pa.large_string()),
            # sentinels spread by key hash (NOT one fixed bucket — that
            # would funnel n_docs rows into a single mark group at scale);
            # "" is never a dup line, so they pass any bucket untouched
            "__bucket": pa.array(np.concatenate(
                [h % num_buckets,
                 pd.util.hash_pandas_object(
                     keys.to_pandas(), index=False).to_numpy()
                 % num_buckets]).astype(np.int32)),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def bucket_dups(b: pa.Table) -> pa.Table:
        lines = b.column("line")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        h = pd.util.hash_pandas_object(
            lines.to_pandas(), index=False).to_numpy()
        return pa.table({
            "line": pc.cast(lines, pa.large_string()),
            "__bucket": pa.array((h % num_buckets).astype(np.int32))})

    dup_b = dups.map_batches(bucket_dups, batch_format="pyarrow")

    # padded-union trick (stages/joins pattern): one groupby co-locates
    # both sides of a bucket; dup side has null key/__idx
    side_a = exploded.map_batches(
        lambda b: no_meta(b).append_column(
            "__side", pa.array(np.zeros(b.num_rows, dtype=np.int8))),
        batch_format="pyarrow")
    key_type = ds.schema().base_schema.field(key).type
    side_d = dup_b.map_batches(
        lambda b: pa.table({
            key: pa.nulls(b.num_rows, key_type),
            "__idx": pa.nulls(b.num_rows, pa.int64()),
            "line": b.column("line"), "__bucket": b.column("__bucket"),
            "__side": pa.array(np.ones(b.num_rows, dtype=np.int8))}),
        batch_format="pyarrow")

    both = side_a.union(side_d)

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        dup_lines = pd.Index(g.loc[g["__side"] == 1, "line"])
        rows = g[g["__side"] == 0]
        # sentinels ("" lines, negative __idx) always survive: "" is
        # excluded from dup candidacy by the trimmed-nonempty rule
        keep = ~rows["line"].isin(dup_lines)
        out = rows.loc[keep, [key, "__idx", "line"]].copy()
        if key_is_int:
            # padded-union nulls upcast the int key to float in the group
            out[key] = out[key].astype(np.int64)
        out["__idx"] = out["__idx"].astype(np.int64)
        return out

    survivors = both.groupby("__bucket").map_groups(
        mark, batch_format="pandas")

    def key_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(key).to_pandas(), index=False).to_numpy()
        return no_meta(b).append_column(
            "__kb", pa.array((h % num_buckets).astype(np.int32)))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "__idx"], kind="mergesort")
        real = g[g["__idx"] >= 0]
        joined = real.groupby(key, sort=False)["line"].agg("\n".join)
        # sentinel rows carry every key of the bucket exactly once
        sent = g[g["__idx"] < 0]
        keys_arr = sent[key].to_numpy()
        vals = joined.reindex(keys_arr).to_numpy(dtype=object)
        vals[pd.isna(vals)] = ""                       # all lines removed
        vals[sent["__idx"].to_numpy() == -2] = None    # null text stays null
        return pd.DataFrame({key: keys_arr, out_column: vals})

    return survivors.map_batches(key_bucket, batch_format="pyarrow") \
        .groupby("__kb").map_groups(reassemble, batch_format="pandas")
