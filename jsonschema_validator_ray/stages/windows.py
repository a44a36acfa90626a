"""Event-time windowing over an ordered, partitioned log.

Ray Data is a (streaming-executed) batch engine with no watermarks; the
stream-shaped semantics come from treating the input as a partitioned log
(ray_guide "Streaming-shaped workloads"): hash-partition by key into
``num_buckets`` Ray groups, then window EVERY key inside the bucket with
one vectorized pandas pass (r2 — a Ray group per KEY pays one Python task
per key: measured 27 s for 20k keys vs 0.14 s for 32 buckets on the same
200k rows).

- **tumbling**: fixed bins — expressible as a plain groupby on the bin (see
  ``pipelines/corpus.events_hourly`` for the partial-aggregated fast path);
  provided here for API symmetry.
- **sliding**: overlapping windows of ``size`` every ``step`` — each event
  lands in ``size/step`` windows.
- **session**: gap-based — a new session starts when the time since the
  previous event of the same key exceeds ``gap``.

Ordering assumption: ONLY within-key order matters, and each bucket sorts
in-task; input blocks may arrive in any order. Skewed keys make skewed
buckets — salt hot keys upstream if one key dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_groups(ds, key: str, num_buckets: int, *, ts: str | None = None):
    """Hash-partitioned groups; rows with a NULL timestamp are dropped
    FIRST when ``ts`` is given — a NaT reaching the int64 view would read
    as min-int64 and silently unsort/overflow every window computation in
    its bucket (SQL window functions over a NULL ts produce NULL rows; the
    documented contract here is that they are excluded)."""
    from .joins import _bucketize

    if ts is not None:
        def drop_null_ts(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_valid(b.column(ts)))

        ds = ds.map_batches(drop_null_ts, batch_format="pyarrow")
    return _bucketize(ds, key, num_buckets).groupby("__kb")


def tumbling(ds, key: str, ts: str, size_s: int,
             value: str | None = None, num_buckets: int = 32):
    """→ (key, window_start, n_events[, value_sum]) per fixed window."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = [key, "window_start", "n_events"] + (
            ["value_sum"] if value else [])
        if g.empty:
            return pd.DataFrame({c: pd.Series([], dtype="float64" if value
                                              and c == "value_sum" else
                                              object) for c in cols})
        bins = g[ts].astype("datetime64[us]").astype("int64") \
            // (size_s * 1_000_000)
        g = g.assign(_one=1, _bin=bins)
        out = g.groupby([key, "_bin"], sort=False, dropna=False).agg(
            n_events=("_one", "sum"),
            **({"value_sum": (value, "sum")} if value else {})).reset_index()
        out["window_start"] = pd.to_datetime(out["_bin"] * size_s, unit="s")
        return out[cols]

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")


def sliding(ds, key: str, ts: str, size_s: int, step_s: int,
            value: str | None = None, num_buckets: int = 32):
    """→ (key, window_start, n_events[, value_sum]) for windows of ``size_s``
    starting every ``step_s``. Each event replicates into the ≤ size/step
    windows containing it (vectorized per bucket)."""
    assert size_s % step_s == 0, "size must be a multiple of step"
    k = size_s // step_s

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = [key, "window_start", "n_events"] + (
            ["value_sum"] if value else [])
        if g.empty:
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in cols})
        t_us = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        step_us = step_s * 1_000_000
        last_start = t_us // step_us  # last window (by start step) with t
        starts = (last_start[:, None] - np.arange(k)[None, :]).reshape(-1)
        df = pd.DataFrame({key: np.repeat(g[key].to_numpy(), k),
                           "_start": starts, "_one": 1})
        if value:
            df["_v"] = np.repeat(g[value].to_numpy(), k)
        out = df.groupby([key, "_start"], sort=False, dropna=False).agg(
            n_events=("_one", "sum"),
            **({"value_sum": ("_v", "sum")} if value else {})).reset_index()
        out["window_start"] = pd.to_datetime(out["_start"] * step_s,
                                             unit="s")
        return out[cols]

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")


def sessionize(ds, key: str, ts: str, gap_s: int, num_buckets: int = 32):
    """→ (key, session_start, session_end, n_events) — gap-based sessions,
    every key of a bucket sessionized in one vectorized pass (sort by
    (key, ts), session breaks at key changes or gap exceedance, cumsum
    session ids, one C-path groupby)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                key: pd.Series([], dtype=g[key].dtype),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64")})
        g = g.sort_values([key, ts], kind="mergesort")
        t = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        kv = g[key].to_numpy()
        gap_us = gap_s * 1_000_000
        n = len(t)
        new_session = np.ones(n, dtype=bool)
        if n > 1:
            same_key = kv[1:] == kv[:-1]
            new_session[1:] = (~same_key) | ((t[1:] - t[:-1]) > gap_us)
        sid = np.cumsum(new_session)
        df = pd.DataFrame({"_sid": sid, "_t": t, "_k": kv})
        out = df.groupby("_sid", sort=False).agg(
            _k=("_k", "first"), start=("_t", "min"), end=("_t", "max"),
            n_events=("_t", "size")).reset_index(drop=True)
        return pd.DataFrame({
            key: out["_k"],
            "session_start": pd.to_datetime(out["start"], unit="us"),
            "session_end": pd.to_datetime(out["end"], unit="us"),
            "n_events": out["n_events"].astype("int64"),
        })

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")


def sessionize_assign(ds, key: str, ts: str, id_col: str, gap_s: int,
                      num_buckets: int = 32):
    """FUSED sessionize-and-assign: → (id_col, key, session_start) — every
    event tagged with the start of the gap-based session containing it, in
    ONE hash exchange of the events table.

    The unfused decomposition (``sessionize`` → ``range_join`` back onto
    the same events table) scans and shuffles events twice; but since the
    sessions DERIVE from these very events, the assignment is just a
    forward-fill of each session's first timestamp within the sessionize
    pass itself. Gap-based sessions are disjoint per key, so this equals
    the interval-containment join exactly (oracle unchanged)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                key: pd.Series([], dtype=g[key].dtype),
                "session_start": pd.Series([], dtype="datetime64[us]")})
        g = g.sort_values([key, ts], kind="mergesort")
        t = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        kv = g[key].to_numpy()
        gap_us = gap_s * 1_000_000
        n = len(t)
        new_session = np.ones(n, dtype=bool)
        if n > 1:
            same_key = kv[1:] == kv[:-1]
            new_session[1:] = (~same_key) | ((t[1:] - t[:-1]) > gap_us)
        # session_start per row = its session's first timestamp,
        # forward-filled via a running max of session-start indices
        start_idx = np.maximum.accumulate(
            np.where(new_session, np.arange(n), -1))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key: kv,
            "session_start": pd.to_datetime(t[start_idx], unit="us"),
        })

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")


def sequence(ds, key: str, ts: str, id_col: str, num_buckets: int = 32):
    """Per-key ordered sequencing — the lag/row_number window family:
    → (id_col, key, seq, gap_us) where ``seq`` is the 1-based rank of the
    row within its key ordered by (ts, id_col) and ``gap_us`` the exact
    microsecond gap to the key's previous event (-1 for the first — keeps
    the column all-int64 so the SQL oracle compares exactly; DuckDB's
    date_diff counts boundary crossings, epoch_us subtraction does not).

    Same partitioned-log contract as the other windows: hash-bucket the key,
    one vectorized pandas pass per bucket (every key of the bucket in one
    sort + cumcount — never a Ray group per key)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, key, "seq", "gap_us"]
        if g.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        g = g.sort_values([key, ts, id_col], kind="mergesort")
        seq = (g.groupby(key, sort=False).cumcount() + 1).to_numpy()
        t = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        kv = g[key].to_numpy()
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = kv[1:] != kv[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        if n > 1:
            gap[1:] = t[1:] - t[:-1]
        gap[first] = -1
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key: kv,
            "seq": seq.astype(np.int64),
            "gap_us": gap,
        })

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")


def cumulative(ds, key: str, ts: str, id_col: str, value: str,
               num_buckets: int = 32):
    """Per-key RUNNING totals — the cumulative window-frame family
    (``SUM(...) OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED
    PRECEDING)``): → (id_col, key, run_count, run_cents) where
    ``run_cents`` is the integer-cents running sum of ``value`` within
    the key ordered by (ts, id_col) — integer arithmetic end-to-end, so
    the SQL oracle compares exactly.

    Same partitioned-log contract as the other windows: hash-bucket the
    key, one vectorized pandas pass per bucket (global cumsum minus each
    key's segment offset — never a Ray group per key)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, key, "run_count", "run_cents"]
        if g.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        g = g.sort_values([key, ts, id_col], kind="mergesort")
        # floor, not round: np.rint is half-to-even while SQL round() is
        # half-away-from-zero — a value*100 landing exactly on .5 would
        # skew the oracle by one cent. floor matches rolling()'s contract
        # and DuckDB floor() exactly. NULL/NaN contributes 0 (SQL SUM
        # skips NULLs; floor(NaN).astype(int64) would poison the cumsum).
        vals = np.nan_to_num(g[value].to_numpy(np.float64), nan=0.0)
        cents = np.floor(vals * 100).astype(np.int64)
        kv = g[key].to_numpy()
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = kv[1:] != kv[:-1]
        csum = np.cumsum(cents)
        # running values within a key = global cumsum − the cumsum just
        # before the key's first row (segment offset, forward-filled via
        # a running max of each row's segment-start index)
        seg_idx = np.maximum.accumulate(np.where(first, np.arange(n), -1))
        base = (csum - cents)[seg_idx]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key: kv,
            "run_count": (np.arange(n, dtype=np.int64)
                          - seg_idx.astype(np.int64) + 1),
            "run_cents": (csum - base).astype(np.int64),
        })

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")


def rolling(ds, key: str, ts: str, id_col: str, window_s: int,
            value: str | None = None, num_buckets: int = 32):
    """Per-row trailing time-range aggregate — SQL's ``RANGE BETWEEN
    INTERVAL w PRECEDING AND CURRENT ROW`` family: for every row, the count
    (and integer-cents sum of ``value``) of the key's rows with timestamp in
    the inclusive window ``[ts - window_s, ts]``. Value-based frame: rows
    sharing the exact timestamp are peers and all included, matching the
    SQL RANGE contract.

    One vectorized pass per hash bucket: sort by (key, ts), offset each
    key's segment onto a disjoint int64 range (segment id × span — valid
    because ``window_s`` never reaches across the span gap), then ONE global
    ``np.searchsorted`` pair + prefix sums give every row's frame bounds —
    no per-key loop, no per-key Ray task."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, key, "w_count"] + (["w_cents"] if value else [])
        if g.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        g = g.sort_values([key, ts, id_col], kind="mergesort")
        t = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        kv = g[key].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = kv[1:] != kv[:-1]
        seg = np.cumsum(new) - 1
        w_us = np.int64(window_s) * 1_000_000
        t0 = t - t.min()
        span = np.int64(t0.max()) + w_us + 2
        if (seg[-1] + 1) > np.iinfo(np.int64).max // max(span, 1):
            raise ValueError("rolling: key-segment offset would overflow "
                             "int64; reduce bucket span or window")
        tm = t0 + seg * span
        lo = np.searchsorted(tm, tm - w_us, side="left")
        hi = np.searchsorted(tm, tm, side="right")
        out = {id_col: g[id_col].to_numpy(), key: kv,
               "w_count": (hi - lo).astype(np.int64)}
        if value:
            # NULL/NaN values contribute 0 to the windowed sum (SQL SUM
            # skips NULLs) while the row still counts toward w_count;
            # floor(NaN).astype(int64) would poison the whole prefix sum
            vals = np.nan_to_num(g[value].to_numpy(dtype=np.float64),
                                 nan=0.0)
            cents = np.floor(vals * 100).astype(np.int64)
            pref = np.concatenate([[0], np.cumsum(cents)])
            out["w_cents"] = (pref[hi] - pref[lo]).astype(np.int64)
        return pd.DataFrame(out)

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")


def rolling_median(ds, key: str, ts: str, id_col: str, value: str,
                   k: int = 5, num_buckets: int = 32):
    """Per-row trailing ROWS-frame median — SQL's ``median(value) OVER
    (PARTITION BY key ORDER BY ts, id ROWS BETWEEN k-1 PRECEDING AND
    CURRENT ROW)``: for every row, the median of its own and the previous
    ``k-1`` values within the key, shorter prefixes included.

    One vectorized pass per hash bucket: sort by ``(key, ts, id)``, insert
    ``k-1`` NaN pads before each key segment, then ONE
    ``sliding_window_view`` + ``np.nanmedian`` computes every frame — the
    pads keep windows from reaching the previous key and make prefix
    frames "short" via NaN-skipping. Even-length frames average the two
    middle elements with the same ``(a+b)·0.5`` double arithmetic DuckDB's
    ``median`` uses, so outputs compare bitwise (verified row-for-row on
    testdata). NULL values behave like SQL (skipped; an all-NULL frame is
    impossible while the current row is non-null)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {id_col: "int64", key: "int64"}
        if g.empty:
            out = {c: pd.Series([], dtype=t) for c, t in cols.items()}
            out["med"] = pd.Series([], dtype="float64")
            return pd.DataFrame(out)
        g = g.sort_values([key, ts, id_col], kind="mergesort")
        kv = g[key].to_numpy()
        v = g[value].to_numpy(dtype=np.float64)
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = kv[1:] != kv[:-1]
        seg = np.cumsum(new) - 1
        pad = k - 1
        padded = np.full(n + pad * (seg[-1] + 1), np.nan)
        idx = np.arange(n) + (seg + 1) * pad
        padded[idx] = v
        win = np.lib.stride_tricks.sliding_window_view(padded, k)
        med = np.nanmedian(win, axis=1)[idx - pad]
        return pd.DataFrame({id_col: g[id_col].to_numpy(), key: kv,
                             "med": med})

    return _bucket_groups(ds, key, num_buckets, ts=ts).map_groups(
        per_bucket, batch_format="pandas")
