"""Join operators.

- :func:`hash_join` — both-sides-large equi-join: Ray's native
  hash-partitioned ``Dataset.join`` when available (Ray ≥ 2.46), else the
  portable explicit bucket join (add ``bucket = hash(key) % B`` to both
  sides, groupby bucket, pandas-merge matching buckets). ``num_partitions``
  governs the all-to-all exchange — size ≳ cluster cores; salt hot keys
  upstream if one key dominates either side.
- :func:`asof_join` — "most recent earlier right-row per left-row": both
  sides are null-padded to a common schema (Ray ``union`` requires identical
  schemas), grouped by key, sorted by ts within the group, and joined with
  ``pd.merge_asof`` (ray_guide "As-of / range join"). Partitioning
  assumption: one KEY's rows fit one group task; keys are hash-distributed
  by the groupby, so only per-key volume matters, not total volume.

- :func:`interval_overlap_join` — arbitrary intersecting intervals on both
  sides (range_join's non-overlapping assumption dropped): time-cell
  replication, ONE cell-hash exchange, exactly-once emission in the cell
  containing the overlap's own start.

- :func:`semi_join` / :func:`anti_join` — EXISTS / NOT EXISTS filters:
  keep left rows with (semi) or without (anti) a key match on the right.
  Null left keys never match (SQL NOT EXISTS semantics: null → no match →
  kept by anti, dropped by semi). Strategy 'broadcast' gathers the right
  side's distinct keys once (bounded by distinct count) and probes with
  ``pc.is_in`` in an actor pool — zero shuffle; 'shuffle' pre-distincts
  right keys per batch (Arrow group_by) then hash-exchanges BOTH sides into
  ``num_buckets`` groups and filters each bucket with one vectorized
  ``isin`` — the 100-TB path when the right side's key set outgrows a
  worker heap. 'auto' picks by right row count.

Broadcast (small-side) joins live in stages/referential.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .util import no_meta


def hash_join(left, right, on: str, *, right_on: str | None = None,
              join_type: str = "inner", num_partitions: int = 32):
    """Equi-join two Datasets on a key column (native hash-shuffle join).

    Size ``num_partitions`` ≲ available CPUs on tiny sessions: the native
    join reserves aggregator actors per partition, and a 4-CPU session with
    8 partitions starves the map tasks and stalls (observed)."""
    right_key = right_on or on
    if hasattr(ray.data.Dataset, "join"):
        return left.join(right, join_type=join_type,
                         num_partitions=num_partitions,
                         on=(on,), right_on=(right_key,))
    return bucketed_join(left, right, on, right_on=right_key,
                         join_type=join_type, num_buckets=num_partitions)


def _pad_union(left, right, key_cols: list[str]):
    """Union two differently-shaped datasets: null-pad each side to the
    combined column set (+ a __side marker). Returns (union_ds, left_cols,
    right_cols)."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]
    types = {**r_types, **l_types}  # left wins for shared (key) columns

    def pad(side: str, present: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in present:
                    arrays.append(b.column(c))
                else:
                    arrays.append(pa.nulls(n, type=types[c]))
            names.append("__side")
            arrays.append(pa.array([side] * n))
            return pa.table(dict(zip(names, arrays)))
        return fn

    both = left.map_batches(pad("l", l_cols), batch_format="pyarrow").union(
        right.map_batches(pad("r", r_cols), batch_format="pyarrow"))
    return both, l_cols, r_cols


def bucketed_join(left, right, on: str, *, right_on: str | None = None,
                  join_type: str = "inner", num_buckets: int = 32):
    """Portable explicit partitioned hash join — the pattern Ray's native
    join implements internally; kept as the documented fallback and for
    engines/releases without ``Dataset.join``."""
    right_key = right_on or on
    if right_key != on:
        def ren(b: pa.Table) -> pa.Table:
            i = b.schema.get_field_index(right_key)
            return b.set_column(i, on, b.column(right_key))
        right = right.map_batches(ren, batch_format="pyarrow")
    both, l_cols, r_cols = _pad_union(left, right, [on])
    r_cols = [on if c == right_key else c for c in r_cols]

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(on).to_pandas(), index=False).to_numpy()
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        return no_meta(b).append_column("__bucket", pa.array(bucket))

    both = both.map_batches(add_bucket, batch_format="pyarrow")

    how = {"inner": "inner", "left_outer": "left",
           "right_outer": "right", "full_outer": "outer"}[join_type]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g.loc[g["__side"] == "l", l_cols]
        rpart = g.loc[g["__side"] == "r", r_cols]
        return lpart.merge(rpart, how=how, on=on)

    joined = both.groupby("__bucket").map_groups(join_bucket,
                                                 batch_format="pandas")

    # the padded union upcast every int column to float64 inside the
    # pandas groups (repo conventions) — restore the input Arrow types where the
    # cast is lossless (outer-join rows with REAL nulls keep float64, the
    # same representation pandas itself would give them)
    types: dict = {}
    for side in (right, left):     # left wins for shared columns
        sch = side.schema()
        for nm, t in zip(sch.names, sch.types):
            if isinstance(t, pa.DataType):
                types[nm] = t

    def cast_back(b: pa.Table) -> pa.Table:
        for i, nm in enumerate(b.column_names):
            t = types.get(nm)
            if t is None or b.column(nm).type == t:
                continue
            try:
                b = b.set_column(i, nm, pc.cast(b.column(nm), t))
            except pa.ArrowInvalid:
                pass
        return b

    return joined.map_batches(cast_back, batch_format="pyarrow")


class _KeyMembershipFilter:
    """Actor stage: keep full left rows by membership of ``column`` in a
    broadcast key set. ``keep_matches`` True = semi join, False = anti."""

    def __init__(self, column: str, keys_ref, keep_matches: bool):
        values = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) \
            else keys_ref
        self.value_set = pa.array([v for v in values if v is not None])
        self.column = column
        self.keep_matches = keep_matches

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        if len(self.value_set) == 0:
            # empty right side: nothing matches (is_in with a null-typed
            # empty set raises ArrowTypeError) — semi drops everything,
            # anti is the identity
            matched = pa.array([False] * batch.num_rows)
        else:
            matched = pc.fill_null(pc.is_in(col, value_set=self.value_set),
                                   False)
        # null key: never matches → semi drops it, anti keeps it
        keep = matched if self.keep_matches else pc.invert(matched)
        return batch.filter(keep)


def _semi_anti(left, right, on: str, right_on: str | None, keep: bool,
               strategy: str, broadcast_limit: int, num_buckets: int,
               concurrency: int):
    right_key = right_on or on
    if strategy == "auto":
        strategy = ("broadcast"
                    if right.count() <= broadcast_limit else "shuffle")
    if strategy == "broadcast":
        keys = right.select_columns([right_key]).unique(right_key)
        if keys is None:      # Dataset.unique on an EMPTY dataset
            keys = []
        ref = ray.put(keys) if len(keys) > 100_000 else keys
        return left.map_batches(
            _KeyMembershipFilter, fn_constructor_args=(on, ref, keep),
            batch_format="pyarrow", concurrency=(1, concurrency))

    # shuffle path: right side reduced to per-batch-distinct keys (keys-only
    # exchange — the right side's payload columns never move), both sides
    # hash-bucketed, one vectorized isin per bucket.
    rk = right.select_columns([right_key])
    if right_key != on:
        def ren(b: pa.Table) -> pa.Table:
            return pa.table({on: b.column(right_key)})
        rk = rk.map_batches(ren, batch_format="pyarrow")

    def distinct_keys(b: pa.Table) -> pa.Table:
        return no_meta(b).group_by(on).aggregate([])

    rk = rk.map_batches(distinct_keys, batch_format="pyarrow")
    both, l_cols, _ = _pad_union(left, rk, [on])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g.loc[g["__side"] == "l", l_cols]
        rkeys = g.loc[g["__side"] == "r", on]
        matched = lpart[on].isin(rkeys.unique()) & lpart[on].notna()
        return lpart[matched if keep else ~matched]

    out = _bucketize(both, on, num_buckets).groupby("__kb").map_groups(
        per_bucket, batch_format="pandas")

    # padded-union nulls upcast int columns to float64 inside the pandas
    # group fn — cast back to the left schema at the Arrow boundary
    l_schema = left.schema()
    target = pa.schema([pa.field(c, dict(zip(l_schema.names,
                                             l_schema.types))[c])
                        for c in l_cols])

    def cast_back(b: pa.Table) -> pa.Table:
        return b.select(l_cols).cast(target)

    return out.map_batches(cast_back, batch_format="pyarrow")


def semi_join(left, right, on: str, *, right_on: str | None = None,
              strategy: str = "auto", broadcast_limit: int = 2_000_000,
              num_buckets: int = 32, concurrency: int = 2):
    """Keep left rows whose ``on`` key EXISTS in ``right`` (payload columns
    of the right side are never read). See module docstring for strategy."""
    return _semi_anti(left, right, on, right_on, True, strategy,
                      broadcast_limit, num_buckets, concurrency)


def anti_join(left, right, on: str, *, right_on: str | None = None,
              strategy: str = "auto", broadcast_limit: int = 2_000_000,
              num_buckets: int = 32, concurrency: int = 2):
    """Keep left rows whose ``on`` key has NO match in ``right`` (SQL NOT
    EXISTS; null left keys are kept)."""
    return _semi_anti(left, right, on, right_on, False, strategy,
                      broadcast_limit, num_buckets, concurrency)


def _bucketize(ds, key: str, num_buckets: int):
    def fn(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(key).to_pandas(), index=False).to_numpy()
        return no_meta(b).append_column("__kb", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _align_time_dtypes(lp: pd.DataFrame, rp: pd.DataFrame, ts: str,
                       cols: list[str]) -> pd.DataFrame:
    """merge_asof refuses mixed datetime units (us parquet vs ns
    pandas-derived timestamps) — align the right side to the left's unit."""
    if rp[cols[0]].dtype != lp[ts].dtype and \
            pd.api.types.is_datetime64_any_dtype(lp[ts]):
        rp = rp.assign(**{c: rp[c].astype(lp[ts].dtype) for c in cols})
    return rp


def range_join(left, right, key: str, ts: str, *, start: str, end: str,
               inclusive_end: bool = True, how: str = "inner",
               num_buckets: int = 32):
    """Interval containment join: for each left row, attach the right row
    whose ``[start, end]`` (or ``[start, end)``) interval contains
    ``left[ts]`` and shares ``key``.

    Partitioning assumption (documented per SURVEY custom-operator rule):
    intervals per key are NON-OVERLAPPING (session windows, calendar
    buckets, validity ranges) — the match is the latest interval starting at
    or before ``ts``, bounded by ``end``. Both sides hash-exchange on
    ``key`` into ``num_buckets`` Ray groups; within each group ONE
    ``pd.merge_asof(by=key)`` handles every key at C speed (one Python call
    per BUCKET, not per key — r2). ``how='left_outer'`` keeps unmatched
    left rows with null interval columns."""
    assert start != ts and end != ts, "rename interval columns first"
    both, l_cols, r_cols = _pad_union(left, right, [key])
    r_val = [c for c in r_cols if c != key]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g.loc[g["__side"] == "l", l_cols]
        rpart = g.loc[g["__side"] == "r", [key] + r_val]
        if lpart.empty:
            return lpart
        null_ts = lpart[ts].isna()
        lp = lpart[~null_ts].sort_values(ts, kind="mergesort")
        # empty-right branches take their null right-columns FROM the
        # padded frame g, which carries the union's unified dtypes —
        # object-dtype all-None columns would diverge from matched
        # buckets' blocks and poison Ray's schema unification
        if rpart.empty or lp.empty:
            if how == "inner":
                return g[l_cols + r_val].iloc[0:0]
            out = lpart.copy()
            for c in r_val:
                out[c] = g.loc[out.index, c]
            return out
        rp = rpart[rpart[start].notna()].sort_values(start, kind="mergesort")
        if rp.empty:
            if how == "inner":
                return g[l_cols + r_val].iloc[0:0]
            out = lpart.copy()
            for c in r_val:
                out[c] = g.loc[out.index, c]
            return out
        rp = _align_time_dtypes(lp, rp, ts, [start, end])
        m = pd.merge_asof(lp, rp, left_on=ts, right_on=start, by=key,
                          direction="backward")
        bound = (m[ts] <= m[end]) if inclusive_end else (m[ts] < m[end])
        inside = m[end].notna() & bound
        if how == "inner":
            return m[inside]
        m.loc[~inside, r_val] = None
        if null_ts.any():
            extra = lpart[null_ts].copy()
            for c in r_val:
                extra[c] = g.loc[extra.index, c]
            m = pd.concat([m, extra], ignore_index=True)
        return m

    return _bucketize(both, key, num_buckets).groupby("__kb").map_groups(
        per_bucket, batch_format="pandas")


def asof_join(left, right, key: str, ts: str, *, right_ts: str,
              direction: str = "backward", num_buckets: int = 32):
    """For each left row, attach the most recent right row with
    ``right_ts <= ts`` (direction='backward'; 'forward' symmetric) and the
    same key. ``right_ts`` must differ from ``ts``; the only column shared
    between the two sides must be ``key``. Hash-bucketed like
    :func:`range_join`: one ``merge_asof(by=key)`` per bucket group."""
    assert right_ts != ts, "rename the right timestamp column first"
    both, l_cols, r_cols = _pad_union(left, right, [key])
    r_val_cols = [c for c in r_cols if c != key]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g.loc[g["__side"] == "l", l_cols]
        rpart = g.loc[g["__side"] == "r", [key] + r_val_cols]
        if lpart.empty:
            return lpart
        null_ts = lpart[ts].isna()
        lp = lpart[~null_ts].sort_values(ts, kind="mergesort")
        if rpart.empty or lp.empty:
            out = lpart.copy()
            for c in r_val_cols:
                out[c] = g.loc[out.index, c]   # typed padded nulls
            return out
        rp = rpart[rpart[right_ts].notna()].sort_values(right_ts,
                                                        kind="mergesort")
        if rp.empty:
            out = lpart.copy()
            for c in r_val_cols:
                out[c] = g.loc[out.index, c]
            return out
        rp = _align_time_dtypes(lp, rp, ts, [right_ts])
        m = pd.merge_asof(lp, rp, left_on=ts, right_on=right_ts, by=key,
                          direction=direction)
        if null_ts.any():
            extra = lpart[null_ts].copy()
            for c in r_val_cols:
                extra[c] = g.loc[extra.index, c]
            m = pd.concat([m, extra], ignore_index=True)
        return m

    return _bucketize(both, key, num_buckets).groupby("__kb").map_groups(
        per_bucket, batch_format="pandas")


def skewed_join(left, right, on: str, *, right_on: str | None = None,
                num_buckets: int = 32, salt: int = 8,
                hot_threshold: int | None = None, max_hot_keys: int = 64,
                cand_per_batch: int = 64, broadcast_limit: int = 1_000_000):
    """Inner equi-join with HOT-KEY SALTING — the skew-safe variant of
    :func:`bucketed_join` for left sides where a few keys dominate (one
    host = half the crawl): a plain hash exchange sends every row of a hot
    key to ONE bucket task, which then holds the whole skewed partition.

    Plan:

    1. *Detection pass* (left, partial counts only — a few rows per batch
       cross): per-batch ``value_counts`` heads fold driver-side; keys with
       observed count ≥ ``hot_threshold`` (default: a fair bucket share,
       ``total_rows // num_buckets``) become the hot set (≤
       ``max_hot_keys``). Per-batch head truncation can only UNDERCOUNT a
       key — detection is a routing choice, never a correctness input: a
       missed hot key just degrades to the classic path.
    2. The RIGHT rows of hot keys gather to the driver (bounded:
       ``limit(broadcast_limit+1)`` — if exceeded, the whole join falls
       back to :func:`bucketed_join`) and broadcast once via ``ray.put``.
    3. ONE padded-union exchange: cold rows hash into ``num_buckets`` as
       usual; LEFT hot rows spread uniformly over ``salt`` extra buckets
       (deterministic per-batch round-robin) — no bucket ever holds a
       whole hot key. Hot-bucket folds merge against the broadcast
       right-hot table; cold folds merge their two in-bucket sides.

    Inner join only (outer semantics across the hot/cold split need
    null-row bookkeeping this operator doesn't promise). Scans: left ×2
    (detect + join), right ×1 + a bounded hot-filter read."""
    right_key = right_on or on

    # ---- 1. hot-key detection ----------------------------------------
    def key_partial(b: pa.Table) -> pa.Table:
        vc = b.column(on).to_pandas().value_counts().head(cand_per_batch)
        return pa.table({
            "k": pa.Array.from_pandas(pd.Series(vc.index)),
            "cnt": pa.array(vc.to_numpy(np.int64)),
            "batch_n": pa.array(
                np.r_[np.int64(b.num_rows), np.zeros(len(vc) - 1,
                                                     np.int64)]
                if len(vc) else np.array([], np.int64)),
        })

    parts = left.map_batches(key_partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty:
        return bucketed_join(left, right, on, right_on=right_key,
                             num_buckets=num_buckets)
    total = int(parts["batch_n"].sum())
    thresh = (hot_threshold if hot_threshold is not None
              else max(total // num_buckets, 2))
    counts = parts.groupby("k")["cnt"].sum().sort_values(ascending=False)
    hot = counts[counts >= thresh].head(max_hot_keys)
    if hot.empty:
        return bucketed_join(left, right, on, right_on=right_key,
                             num_buckets=num_buckets)
    hot_arr = pa.Array.from_pandas(pd.Series(hot.index))

    # ---- 2. bounded gather + broadcast of the right-hot rows ---------
    def keep_hot(b: pa.Table) -> pa.Table:
        return b.filter(pc.fill_null(
            pc.is_in(b.column(right_key), value_set=hot_arr), False))

    rhot_ds = right.map_batches(keep_hot, batch_format="pyarrow") \
        .limit(broadcast_limit + 1)
    rhot_blocks = ray.get(rhot_ds.to_arrow_refs())
    if not rhot_blocks:       # hot keys absent on the right: inner-join
        # semantics make the hot-left rows childless — classic path is
        # simplest and loses nothing
        return bucketed_join(left, right, on, right_on=right_key,
                             num_buckets=num_buckets)
    rhot = pa.concat_tables(rhot_blocks, promote_options="default")
    if rhot.num_rows > broadcast_limit:   # too big to broadcast — classic
        return bucketed_join(left, right, on, right_on=right_key,
                             num_buckets=num_buckets)
    if right_key != on:
        i = rhot.schema.get_field_index(right_key)
        rhot = rhot.set_column(i, on, rhot.column(right_key))
    rhot_ref = ray.put(no_meta(rhot))

    def keep_cold(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.fill_null(
            pc.is_in(b.column(right_key), value_set=hot_arr), False)))

    right_cold = right.map_batches(keep_cold, batch_format="pyarrow")
    if right_key != on:
        def ren(b: pa.Table) -> pa.Table:
            i = b.schema.get_field_index(right_key)
            return b.set_column(i, on, b.column(right_key))
        right_cold = right_cold.map_batches(ren, batch_format="pyarrow")

    # ---- 3. one exchange: cold hashed, left-hot salted ----------------
    both, l_cols, r_cols = _pad_union(left, right_cold, [on])
    r_cols = [on if c == right_key else c for c in r_cols]

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(on).to_pandas(), index=False).to_numpy()
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        ishot = pc.and_(
            pc.fill_null(pc.is_in(b.column(on), value_set=hot_arr), False),
            pc.equal(b.column("__side"), "l")) \
            .to_numpy(zero_copy_only=False)
        nh = int(ishot.sum())
        if nh:
            bucket[ishot] = num_buckets + (
                np.arange(nh, dtype=np.int64) % salt).astype(np.int32)
        return no_meta(b).append_column("__bucket", pa.array(bucket))

    both = both.map_batches(add_bucket, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if int(g["__bucket"].iloc[0]) >= num_buckets:   # salted hot bucket
            rpart = ray.get(rhot_ref).to_pandas()[r_cols]
        else:
            rpart = g.loc[g["__side"] == "r", r_cols]
        lpart = g.loc[g["__side"] == "l", l_cols]
        return lpart.merge(rpart, how="inner", on=on)

    joined = both.groupby("__bucket").map_groups(join_bucket,
                                                 batch_format="pandas")

    types: dict = {}
    for side in (right, left):
        sch = side.schema()
        for nm, t in zip(sch.names, sch.types):
            types[nm if nm != right_key else on] = t

    def cast_back(b: pa.Table) -> pa.Table:
        for i, nm in enumerate(b.column_names):
            t = types.get(nm)
            if t is None or b.column(nm).type == t:
                continue
            try:
                b = b.set_column(i, nm, pc.cast(b.column(nm), t))
            except pa.ArrowInvalid:
                pass
        return b

    return joined.map_batches(cast_back, batch_format="pyarrow")


def interval_overlap_join(left, right, *, l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          cell_us: int = 86_400_000_000,
                          num_buckets: int = 32):
    """Interval OVERLAP join: every (left, right) pair whose CLOSED
    intervals intersect — ``l_start <= r_end AND r_start <= l_end``. The
    arbitrary-overlap sibling of :func:`range_join` (which assumes
    non-overlapping right intervals and matches point-in-interval).

    Plan: each side replicates its rows to every time CELL of width
    ``cell_us`` its interval touches (vectorized ``np.repeat`` expansion),
    both sides exchange once on the cell hash, and each bucket
    pandas-merges its co-located cells and filters the overlap predicate.
    An overlapping pair exists in every cell BOTH intervals touch; it is
    emitted exactly once — in the cell containing ``max(l_start, r_start)``
    (the overlap's own start, which lies inside both intervals, so both
    replicas are present there) — so no dedup exchange is needed.

    Exactness: interval bounds are int64 microseconds and travel the
    padded union under the SHARED names ``__s``/``__e`` (present on both
    sides — never null-padded, so pandas cannot upcast them to float64,
    which corrupts epoch-µs magnitudes past 2^53). Payload columns ARE
    padded; int64 payloads come back from the float upcast via the
    recorded-dtype cast (exact for values < 2^53 — document larger ones).

    Partitioning assumptions (custom-operator rule): ``cell_us`` should be
    on the order of the TYPICAL interval length — replication factor is
    ``interval_len / cell_us + 1`` per row, and a cell's work is
    |lefts| × |rights| within the cell, so extremely long intervals or a
    hot cell need a coarser cell or an upstream split."""
    assert not (set(left.schema().names) & set(right.schema().names)), \
        "interval_overlap_join requires disjoint column names"

    def replicate(start_col: str, end_col: str):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            s = b.column(start_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            e = b.column(end_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if (e < s).any():
                raise ValueError(
                    f"interval_overlap_join: {int((e < s).sum())} "
                    f"inverted interval(s) ({end_col} < {start_col}) — "
                    f"fix or drop them upstream (SQL's raw predicate can "
                    f"still match inverted intervals, so silently "
                    f"dropping them here would diverge)")
            c0, c1 = s // cell_us, e // cell_us
            reps = (c1 - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(n), reps)
            offs = np.arange(reps.sum()) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
            cells = c0[idx] + offs
            t = b.drop_columns([start_col, end_col]).take(idx)
            t = t.append_column("__s", pa.array(s[idx]))
            t = t.append_column("__e", pa.array(e[idx]))
            t = t.append_column("__cell", pa.array(cells))
            h = pd.util.hash_pandas_object(pd.Series(cells),
                                           index=False).to_numpy()
            return no_meta(t).append_column(
                "__cb", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int32)))
        return fn

    l_rep = left.map_batches(replicate(l_start, l_end),
                             batch_format="pyarrow")
    r_rep = right.map_batches(replicate(r_start, r_end),
                              batch_format="pyarrow")
    both, l_cols_all, r_cols_all = _pad_union(l_rep, r_rep, [])
    shared = {"__s", "__e", "__cell", "__cb"}
    l_pay = [c for c in l_cols_all if c not in shared]
    r_pay = [c for c in r_cols_all if c not in shared]

    # dtypes for the exact cast-back of padded payload columns
    pay_types: dict = {}
    for side, pay in ((left, l_pay), (right, r_pay)):
        sch = side.schema()
        for nm, t in zip(sch.names, sch.types):
            # pandas-backed datasets report numpy/python types here;
            # only Arrow DataTypes are castable targets
            if nm in pay and isinstance(t, pa.DataType):
                pay_types[nm] = t

    out_cols = l_pay + [l_start, l_end] + r_pay + [r_start, r_end]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lp = g.loc[g["__side"] == "l",
                   l_pay + ["__s", "__e", "__cell"]].rename(
            columns={"__s": l_start, "__e": l_end})
        rp = g.loc[g["__side"] == "r",
                   r_pay + ["__s", "__e", "__cell"]].rename(
            columns={"__s": r_start, "__e": r_end})
        if lp.empty or rp.empty:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in out_cols})
        m = lp.merge(rp, on="__cell")
        ls, le = m[l_start].to_numpy(), m[l_end].to_numpy()
        rs, re_ = m[r_start].to_numpy(), m[r_end].to_numpy()
        keep = (ls <= re_) & (rs <= le) & \
            (np.maximum(ls, rs) // cell_us == m["__cell"].to_numpy())
        return m.loc[keep, out_cols]

    joined = both.groupby("__cb").map_groups(per_bucket,
                                             batch_format="pandas")

    def cast_back(b: pa.Table) -> pa.Table:
        for i, nm in enumerate(b.column_names):
            t = pay_types.get(nm)
            if t is None or b.column(nm).type == t:
                continue
            try:
                b = b.set_column(i, nm, pc.cast(b.column(nm), t))
            except pa.ArrowInvalid:
                pass
        return b

    return joined.map_batches(cast_back, batch_format="pyarrow")
