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


def _ds_max(ds, col: str) -> int:
    """Driver scalar: global max of an int64 column — per-block partial
    maxima gather (≤ num_blocks rows), never the rows themselves."""
    def partial(b: pa.Table) -> pa.Table:
        m = pc.max(b.column(col)).as_py()
        return pa.table({col: pa.array(
            [] if m is None else [int(m)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return int(parts[col].max()) if len(parts) else 0


def hits(edges, src: str, dst: str, *, iterations: int = 3,
         base: int = 1_000_000, num_buckets: int = 32,
         batch_size: int = 65536, edge_gate: int = 5_000_000):
    """→ (hubs, auths) Datasets ``(node, score)`` after ``iterations``
    exact integer HITS rounds (Kleinberg 1999, "Authoritative sources in
    a hyperlinked environment", public) over the directed bipartite
    ``(src, dst)`` edge dataset (pre-deduplicate if parallel edges are
    not wanted; hubs = sources, authorities = destinations).

    Float parity contract: scores are ``base``-scaled integers and each
    half-step is an integer in-neighbor sum followed by integer
    max-normalization ``score = (s · base) // max(s)`` — the max is a
    driver SCALAR per half-step (the iterative-algorithm exception:
    normalization needs a concrete global before the next exchange), so
    a fixed iteration count is bit-reproducible across engines and
    cluster sizes (float HITS with L2 normalization is not — summation
    order). Max-normalization replaces the textbook L2 norm; rankings
    are preserved per half-step since the scale factor is shared.

    Shape per half-step: one node-bucket join (edges ⋈ scores) + one
    dst-bucket fold — only (node, int64) pairs move; the max gathers one
    partial per block. At 100 TB pre-bucket the edge files once by
    hash(node) and re-read per round instead of re-exchanging.

    ``edge_gate``: at or below this edge count the whole iteration runs
    driver-side on the gathered 2-int-column edge list (vectorized
    bincount half-steps) — 2·iterations Ray exchanges cost ~2 s of
    scheduling floor EACH on tiny data (repo rule), which dominates any
    graph that fits the driver; the exchange path above the gate is
    arithmetic-identical (path equality pinned in tests). float64
    bincount partial sums stay exact below 2⁵³ (score ≤ base, so degree
    ≤ 2⁵³/base — far above the gate)."""
    if edges.count() <= edge_gate:
        df = edges.select_columns([src, dst]).to_pandas()
        s_codes, s_nodes = pd.factorize(df[src], sort=False)
        d_codes, d_nodes = pd.factorize(df[dst], sort=False)
        a = np.full(len(d_nodes), base, dtype=np.int64)
        h = None
        for _ in range(iterations):
            hs = np.bincount(s_codes, weights=a[d_codes].astype(
                np.float64), minlength=len(s_nodes)).astype(np.int64)
            mx = int(hs.max()) if len(hs) else 0
            if mx <= 0:
                break
            h = (hs * base) // mx
            as_ = np.bincount(d_codes, weights=h[s_codes].astype(
                np.float64), minlength=len(d_nodes)).astype(np.int64)
            amx = int(as_.max()) if len(as_) else 0
            if amx <= 0:
                break
            a = (as_ * base) // amx
        import ray.data as rd
        h_df = pd.DataFrame({"node": s_nodes, "score": h}) \
            if h is not None else None
        a_df = pd.DataFrame({"node": d_nodes, "score": a})
        return (rd.from_pandas(h_df) if h_df is not None else None,
                rd.from_pandas(a_df))

    def project(b: pa.Table, on: str, other: str) -> pa.Table:
        return pa.table({"node": b.column(on), "__o": b.column(other)})

    # authority state: every distinct dst starts at base
    a_state = _fold_by_key(
        edges.map_batches(
            lambda b: pa.table({
                "node": b.column(dst),
                "__one": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow", batch_size=batch_size),
        "node", "__one", "score", num_buckets=num_buckets) \
        .map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "score": pa.array(np.full(b.num_rows, base, np.int64))}),
            batch_format="pyarrow").materialize()
    h_state = None

    from .joins import bucketed_join

    def half_step(state, join_on: str, fold_to: str):
        j = bucketed_join(
            edges.map_batches(lambda b: project(b, join_on, fold_to),
                              batch_format="pyarrow",
                              batch_size=batch_size),
            state, on="node", num_buckets=num_buckets)
        sums = _fold_by_key(
            j.map_batches(
                lambda b: pa.table({"node": b.column("__o"),
                                    "c": b.column("score")}),
                batch_format="pyarrow"),
            "node", "c", "s", num_buckets=num_buckets).materialize()
        mx = _ds_max(sums, "s")
        if mx <= 0:
            return None
        return sums.map_batches(
            lambda b, _mx=mx: pa.table({
                "node": b.column("node"),
                "score": pa.array(
                    (b.column("s").to_numpy(zero_copy_only=False)
                     .astype(np.int64) * base) // _mx)}),
            batch_format="pyarrow").materialize()

    for _ in range(iterations):
        h_state = half_step(a_state, dst, src)      # hubs from auths
        if h_state is None:
            break
        nxt = half_step(h_state, src, dst)          # auths from hubs
        if nxt is None:
            break
        a_state = nxt
    return h_state, a_state
