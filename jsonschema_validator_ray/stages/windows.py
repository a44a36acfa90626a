"""Event-time windowing over an ordered, partitioned log.

Ray Data is a (streaming-executed) batch engine with no watermarks; the
stream-shaped semantics come from treating the input as a partitioned log
(ray_guide "Streaming-shaped workloads"): partition by key, sort by ts
WITHIN each group, window inside ``groupby(key).map_groups`` with pandas.

- **tumbling**: fixed bins — expressible as a plain groupby on the bin (see
  ``pipelines/corpus.events_hourly`` for the partial-aggregated fast path);
  provided here for API symmetry.
- **sliding**: overlapping windows of ``size`` every ``step`` — each event
  lands in ``size/step`` windows.
- **session**: gap-based — a new session starts when the time since the
  previous event of the same key exceeds ``gap``.

Ordering assumption: ONLY within-group order matters, and each group is
sorted in-task; input blocks may arrive in any order. Skewed keys make
skewed groups — salt hot keys upstream if one key dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def tumbling(ds, key: str, ts: str, size_s: int,
             value: str | None = None):
    """→ (key, window_start, n_events[, value_sum]) per fixed window."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        bins = g[ts].astype("datetime64[us]").astype("int64") // (size_s * 1_000_000)
        g = g.assign(_one=1, _bin=bins)
        out = g.groupby("_bin").agg(
            n_events=("_one", "sum"),
            **({"value_sum": (value, "sum")} if value else {}))
        out = out.reset_index()
        out["window_start"] = pd.to_datetime(out["_bin"] * size_s, unit="s")
        out[key] = g[key].iloc[0]
        cols = [key, "window_start", "n_events"] + (["value_sum"] if value else [])
        return out[cols]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def sliding(ds, key: str, ts: str, size_s: int, step_s: int,
            value: str | None = None):
    """→ (key, window_start, n_events[, value_sum]) for windows of ``size_s``
    starting every ``step_s``. Each event replicates into the ≤ size/step
    windows containing it (vectorized per group)."""
    assert size_s % step_s == 0, "size must be a multiple of step"
    k = size_s // step_s

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        t_us = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        step_us = step_s * 1_000_000
        last_start = t_us // step_us  # last window (by start step) containing t
        starts = (last_start[:, None] - np.arange(k)[None, :])  # (n, k)
        starts = starts.reshape(-1)
        vals = (np.repeat(g[value].to_numpy(), k) if value else None)
        df = pd.DataFrame({"_start": starts})
        df["_one"] = 1
        if value:
            df["_v"] = vals
        out = df.groupby("_start").agg(
            n_events=("_one", "sum"),
            **({"value_sum": ("_v", "sum")} if value else {}))
        out = out.reset_index()
        out["window_start"] = pd.to_datetime(out["_start"] * step_s, unit="s")
        out[key] = g[key].iloc[0]
        cols = [key, "window_start", "n_events"] + (["value_sum"] if value else [])
        return out[cols]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def sessionize(ds, key: str, ts: str, gap_s: int):
    """→ (key, session_start, session_end, n_events) — gap-based sessions."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        t = g[ts].astype("datetime64[us]").astype("int64").to_numpy()
        gap_us = gap_s * 1_000_000
        new_session = np.ones(len(t), dtype=bool)
        if len(t) > 1:
            new_session[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new_session)
        df = pd.DataFrame({"_sid": sid, "_t": t})
        out = df.groupby("_sid").agg(start=("_t", "min"), end=("_t", "max"),
                                     n_events=("_t", "size")).reset_index(drop=True)
        return pd.DataFrame({
            key: g[key].iloc[0],
            "session_start": pd.to_datetime(out["start"], unit="us"),
            "session_end": pd.to_datetime(out["end"], unit="us"),
            "n_events": out["n_events"].astype("int64"),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
