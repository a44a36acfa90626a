"""Connected components over candidate pairs → near-duplicate clusters.

After MinHash/SimHash/embedding candidate generation emits pairs
``(key_a, key_b)``, deduplication needs CLUSTERS (keep one canonical doc per
component). Distributed algorithm: iterative min-label propagation
(the standard large-star/small-star-style fixpoint, expressible entirely in
groupby/map_batches):

    label(k) ← min(label of every neighbor ∪ {label(k)})   until no change

Each round is one groupby over edge endpoints — O(diameter) rounds; near-dup
graphs are overwhelmingly tiny star/clique components, so 2-4 rounds
converge. The label map is broadcast per round — it covers only CANDIDATE
nodes (keys appearing in pairs), which is orders of magnitude smaller than
the corpus; if candidates themselves outgrow the driver, swap the broadcast
for a bucketed join on ``node`` (same groupby machinery).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min


def connected_components(pairs_ds, *, key_a: str = "key_a",
                         key_b: str = "key_b",
                         max_rounds: int = 10):
    """→ Dataset ``(key, component)`` where ``component`` is the minimal key
    in each connected component. Keys isolated from any pair are absent
    (they form singleton components trivially)."""

    def to_edges(b: pa.Table) -> pa.Table:
        # symmetric edge list (both directions) so one groupby sees all
        # neighbors of a node
        a, bcol = b.column(key_a), b.column(key_b)
        return pa.table({
            "node": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                      bcol.combine_chunks() if isinstance(bcol, pa.ChunkedArray) else bcol]),
            "nbr": pa.concat_arrays([bcol.combine_chunks() if isinstance(bcol, pa.ChunkedArray) else bcol,
                                     a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
        })

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")
    # initial label(k) = min(k, min neighbor)
    labels = edges.groupby("node").aggregate(Min("nbr", alias_name="label"))

    def clip_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lab = pc.min_element_wise(b.column("node"), b.column("label"))
        return pa.table({"node": b.column("node"), "label": lab})

    labels = labels.map_batches(clip_self, batch_format="pyarrow")

    for _ in range(max_rounds):
        # propagate: for each edge, candidate label(node) = label(nbr)
        lab_pd = labels.to_pandas()  # component-label table is small
        if "node" not in lab_pd.columns or lab_pd.empty:
            # no candidate pairs at all → empty (key, component) result
            # (an empty Dataset drops its schema through to_pandas, so the
            # typed empty table is built explicitly)
            empty = pa.table({"key": pa.array([], type=pa.string()),
                              "component": pa.array([], type=pa.string())})
            return ray.data.from_arrow(empty)
        lab_map = dict(zip(lab_pd["node"], lab_pd["label"]))
        # pointer doubling: compress label chains (label ← label(label))
        # until fixpoint, so propagation covers 2^round hops per round and
        # long chains converge in O(log n) rounds
        for _c in range(32):
            compressed = {k: lab_map.get(v, v) for k, v in lab_map.items()}
            if compressed == lab_map:
                break
            lab_map = compressed
        lab_pd = pd.DataFrame({"node": list(lab_map),
                               "label": list(lab_map.values())})

        def propagate(b: pa.Table) -> pa.Table:
            nodes = b.column("node").to_pylist()
            nbrs = b.column("nbr").to_pylist()
            return pa.table({
                "node": pa.array(nodes),
                "cand": pa.array([lab_map.get(x, x) for x in nbrs]),
            })

        cand = edges.map_batches(propagate, batch_format="pyarrow")
        new_labels = cand.groupby("node").aggregate(Min("cand", alias_name="label"))

        def merge_old(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            nodes = b.column("node").to_pylist()
            old = pa.array([lab_map.get(x, x) for x in nodes])
            lab = pc.min_element_wise(b.column("label"), old)
            return pa.table({"node": b.column("node"), "label": lab})

        new_labels = new_labels.map_batches(merge_old, batch_format="pyarrow")
        new_pd = new_labels.to_pandas()
        new_s = new_pd.set_index("node")["label"]
        old_s = lab_pd.set_index("node")["label"].reindex(new_s.index)
        changed = int((new_s != old_s).sum())
        labels = new_labels
        if changed == 0:
            break

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("node"), "component": b.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")


def dedup_by_components(ds, key: str, components_ds):
    """Drop every row whose key belongs to a component but is not that
    component's canonical (minimal) key."""
    import pyarrow.compute as pc

    comp = components_ds.to_pandas()
    if "key" not in comp.columns or comp.empty:
        # Ray drops empty blocks, losing even a typed empty schema in
        # to_pandas — no components means nothing to drop
        return ds
    drop = set(comp.loc[comp["key"] != comp["component"], "key"])

    def keep(b: pa.Table) -> pa.Table:
        if not drop:
            return b
        mask = pc.invert(pc.is_in(b.column(key), value_set=pa.array(list(drop))))
        return b.filter(pc.fill_null(mask, True))

    return ds.map_batches(keep, batch_format="pyarrow")
