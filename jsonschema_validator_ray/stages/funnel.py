"""Ordered funnel analysis over an event log.

``funnel(ds, user, ts, event, steps)`` — for each user, match the step
sequence IN ORDER (each step's event must occur strictly after the
previous step's matched time; the first eligible occurrence is taken) and
report how many users reach each step. The classic product/abuse funnel,
and a validation primitive: "every purchase is preceded by a click which
is preceded by a view" is exactly a funnel-depth constraint.

Scale shape: users hash-exchange into ``num_buckets`` Ray groups (only
(user, ts, event∈steps) triples move — other events are filtered at the
scan); each bucket resolves EVERY user's funnel with ``len(steps)``
vectorized pandas passes (per step: filter to the step's events, drop rows
at or before the user's previous matched time via a merge, groupby-min) —
never one task or one Python iteration per user. Per-bucket partial step
counts fold in a final tiny sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .util import no_meta


def funnel_depths(ds, user: str, ts: str, event: str,
                  steps: list[str], *, num_buckets: int = 32):
    """→ Dataset ``(user, depth, t_last)``: deepest step index (1-based)
    each user reached and when. Users matching no step are absent."""
    step_arr = pa.array(steps)

    def prune(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column(event), value_set=step_arr)
        sub = no_meta(b).filter(keep)
        return pa.table({user: sub.column(user), ts: sub.column(ts),
                         event: sub.column(event)})

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(user).to_pandas(), index=False).to_numpy()
        return b.append_column("__b", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        cur = None  # users still alive, with their last matched time __t
        depth_reached = 0
        for i, step in enumerate(steps):
            ev = g[g[event] == step][[user, ts]]
            if cur is not None:
                ev = ev.merge(cur, on=user, how="inner")
                ev = ev[ev[ts] > ev["__t"]]
            nxt = ev.groupby(user, sort=False)[ts].min().reset_index() \
                .rename(columns={ts: "__t"})
            if cur is not None:
                dead = cur[~cur[user].isin(nxt[user])]
                if len(dead):
                    outs.append(pd.DataFrame({
                        user: dead[user],
                        "depth": np.full(len(dead), i, dtype=np.int64),
                        "t_last": dead["__t"]}))
            cur = nxt
            depth_reached = i + 1
            if cur.empty:
                break
        if cur is not None and len(cur):
            outs.append(pd.DataFrame({
                user: cur[user],
                "depth": np.full(len(cur), depth_reached, dtype=np.int64),
                "t_last": cur["__t"]}))
        if not outs:
            return pd.DataFrame({
                user: pd.Series([], dtype=g[user].dtype),
                "depth": pd.Series([], dtype="int64"),
                "t_last": pd.Series([], dtype=g[ts].dtype)})
        return pd.concat(outs, ignore_index=True)

    return pruned.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas")


def funnel(ds, user: str, ts: str, event: str, steps: list[str], *,
           num_buckets: int = 32) -> pd.DataFrame:
    """→ DataFrame ``(step, step_name, n_users)``: how many users reached
    step 1, 2, … (monotone non-increasing)."""
    depths = funnel_depths(ds, user, ts, event, steps,
                           num_buckets=num_buckets)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["depth"].value_counts()
        return pd.DataFrame({"depth": vc.index.astype(np.int64),
                             "n": vc.to_numpy(np.int64)})

    parts = depths.map_batches(count_partial, batch_format="pandas") \
        .to_pandas()
    by_depth = parts.groupby("depth")["n"].sum() if len(parts) else {}
    rows = []
    cum = 0
    for i in range(len(steps), 0, -1):
        cum += int(by_depth.get(i, 0)) if len(parts) else 0
        rows.append({"step": i, "step_name": steps[i - 1], "n_users": cum})
    return pd.DataFrame(sorted(rows, key=lambda r: r["step"]))
