"""Distributed PageRank with exact integer semantics.

The iterative-graph-algorithm operator class (components.py covers
connected components / label propagation; this adds weighted iteration —
Page et al. 1999, "The PageRank Citation Ranking", public).

Float parity contract: ranks are integers scaled by ``base`` (default
10⁶ = micro-ranks) and every update is integer arithmetic only —

    contrib(u→v)  = rank_k(u) // outdeg(u)                 (floor div)
    rank_{k+1}(v) = ((den−num)·base) // den
                    + (num · Σ_u contrib(u→v)) // den      (num/den = damping)

so a fixed iteration count is bit-reproducible across engines and
cluster sizes (floating-point PageRank is famously not — summation order
changes the result). The floors leak a sub-ppm of probability mass per
iteration relative to the textbook float formulation; for ranking use
that distortion is far below the damping-factor arbitrariness, and the
payoff is an EXACT oracle.

Dangling nodes: every node must appear as a source (feed symmetric edges
for undirected graphs, or add self-loops); nodes with no in-edges get the
teleport term only. Both are the textbook conventions.

Shape per iteration: one src-bucket hash join (edges ⋈ ranks — the edge
set re-exchanges each round; at 100 TB pre-bucket the edge files once by
hash(src) and read them back per round instead) and one dst-bucket fold.
Everything that moves is (node, int64) pairs — never adjacency lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _fold_by_key(ds, key: str, agg_col: str, out_col: str, *,
                 num_buckets: int, how: str = "sum"):
    """hash-bucket exchange + per-bucket pandas C-path fold (repo rule:
    never one task per key)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(key).to_pandas(), index=False).to_numpy()
        return b.append_column(
            "__kb", pa.array((h % num_buckets).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__kb").groupby(
            key, as_index=False, sort=False)[agg_col].agg(how)
        return out.rename(columns={agg_col: out_col})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__kb").map_groups(fold, batch_format="pandas")


def pagerank(edges, src: str, dst: str, *, iterations: int = 3,
             damping_num: int = 85, damping_den: int = 100,
             base: int = 1_000_000, num_buckets: int = 32,
             batch_size: int = 65536):
    """→ Dataset ``(node, rank)`` after ``iterations`` exact integer
    PageRank rounds over the directed ``(src, dst)`` edge dataset (module
    docstring; duplicate edges count as parallel edges — pre-distinct if
    that is not wanted)."""

    def one(b: pa.Table, col: str) -> pa.Table:
        return pa.table({
            "node": b.column(col),
            "__one": pa.array(np.ones(b.num_rows, np.int64))})

    # static per-node out-degree; node list = distinct sources (dangling
    # nodes are a contract violation, so sources cover every node)
    deg = _fold_by_key(
        edges.map_batches(lambda b: one(b, src), batch_format="pyarrow",
                          batch_size=batch_size),
        "node", "__one", "d", num_buckets=num_buckets).materialize()

    state = deg.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, base, np.int64))),
        batch_format="pyarrow")

    from .joins import bucketed_join

    teleport = ((damping_den - damping_num) * base) // damping_den

    for _ in range(iterations):
        # edges ⋈ state on src → per-edge floor-div contributions
        j = bucketed_join(
            edges.map_batches(
                lambda b: pa.table({"node": b.column(src),
                                    "__dst": b.column(dst)}),
                batch_format="pyarrow", batch_size=batch_size),
            state, on="node", num_buckets=num_buckets)

        def contrib(b: pa.Table) -> pa.Table:
            r = b.column("rank").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = b.column("d").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({"node": b.column("__dst"),
                             "c": pa.array(r // d)})

        sums = _fold_by_key(
            j.map_batches(contrib, batch_format="pyarrow"),
            "node", "c", "s", num_buckets=num_buckets)

        # every node (from deg) gets the teleport term; missing in-edge
        # sums are 0
        outer = bucketed_join(deg, sums, on="node",
                              join_type="left_outer",
                              num_buckets=num_buckets)

        def update(b: pa.Table) -> pa.Table:
            s = pc.fill_null(pc.cast(b.column("s"), pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            d = pc.cast(b.column("d"), pa.int64())
            rank = teleport + (damping_num * s) // damping_den
            return pa.table({"node": b.column("node"), "d": d,
                             "rank": pa.array(rank)})

        state = outer.map_batches(update,
                                  batch_format="pyarrow").materialize()

    return state.map_batches(
        lambda b: b.select(["node", "rank"]), batch_format="pyarrow")
