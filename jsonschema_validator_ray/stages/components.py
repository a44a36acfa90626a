"""Connected components over candidate pairs → near-duplicate clusters.

After MinHash/SimHash/embedding candidate generation emits pairs
``(key_a, key_b)``, deduplication needs CLUSTERS (keep one canonical doc per
component). Two strategies behind one facade (VERDICT r1 item 3):

- **driver** — candidate pairs fit driver memory (the common case: the pair
  set is orders of magnitude smaller than the corpus): gather pairs once and
  run pointer-doubling min-label propagation in plain dicts. Exact, O(E·α).
- **join** — fully distributed iterative min-label propagation where each
  round is expressed as hash-bucketed joins (no driver-side label map, no
  per-round broadcast):

      cand(n)  = label(nbr)        -- probe rows bucket-joined against labels
      double(n)= label(label(n))   -- pointer doubling, same probe join
      label(n) = min(label(n), cand(n), double(n))   -- bucketed min-combine

  With doubling, a path of length L converges in O(log L) rounds; each round
  is two hash-bucket shuffles over (node, label) pairs — never the corpus —
  plus one scalar aggregate for the convergence check. Per-round label
  tables are materialized (they are candidate-sized) so round k+1 does not
  re-execute round k's lineage.

``strategy="auto"`` picks driver below ``driver_limit`` pairs, join above.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .util import no_meta


def _empty_components() -> "ray.data.Dataset":
    return ray.data.from_arrow(
        pa.table({"key": pa.array([], type=pa.string()),
                  "component": pa.array([], type=pa.string())}))


def connected_components(pairs_ds, *, key_a: str = "key_a",
                         key_b: str = "key_b",
                         max_rounds: int = 30,
                         strategy: str = "auto",
                         driver_limit: int = 1_000_000,
                         num_buckets: int = 16):
    """→ Dataset ``(key, component)`` where ``component`` is the minimal key
    in each connected component. Keys isolated from any pair are absent
    (they form singleton components trivially)."""
    if strategy == "auto":
        n = pairs_ds.count()
        strategy = "driver" if n <= driver_limit else "join"
    if strategy == "driver":
        return _components_driver(pairs_ds, key_a, key_b)
    return _components_join(pairs_ds, key_a, key_b, max_rounds=max_rounds,
                            num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# driver strategy: pairs fit on the driver
# ---------------------------------------------------------------------------


def _components_driver(pairs_ds, key_a: str, key_b: str):
    pdf = pairs_ds.to_pandas()
    if pdf.empty or key_a not in pdf.columns:
        return _empty_components()
    # min-label propagation with pointer doubling over plain dicts
    lab: dict = {}
    edges = list(zip(pdf[key_a], pdf[key_b]))
    for a, b in edges:
        lab[a] = min(lab.get(a, a), b, a)
        lab[b] = min(lab.get(b, b), a, b)
    for _ in range(64):
        changed = False
        # pointer doubling: label ← label(label)
        for k, v in lab.items():
            vv = lab.get(v, v)
            if vv < v:
                lab[k] = vv
                changed = True
        # edge relaxation: labels of neighbors must agree
        for a, b in edges:
            m = min(lab[a], lab[b])
            if lab[a] != m:
                lab[a] = m
                changed = True
            if lab[b] != m:
                lab[b] = m
                changed = True
        if not changed:
            break
    out = pd.DataFrame({"key": list(lab), "component": list(lab.values())})
    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# join strategy: distributed label propagation via hash-bucketed joins
# ---------------------------------------------------------------------------


def _bucket_col(values: pd.Series, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _components_join(pairs_ds, key_a: str, key_b: str, *, max_rounds: int,
                     num_buckets: int):
    def to_edges(b: pa.Table) -> pa.Table:
        def arr(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
        a, bcol = arr(b.column(key_a)), arr(b.column(key_b))
        return pa.table({"node": pa.concat_arrays([a, bcol]),
                         "nbr": pa.concat_arrays([bcol, a])})

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return _empty_components()

    def min_combine(g: pd.DataFrame) -> pd.DataFrame:
        """(node, cand, is_old) rows → per-node min label + changed flag."""
        if g.empty:
            # dtype-correct empty frame: a bare empty DataFrame would emit an
            # object/float64 block and poison Ray's schema unification
            return pd.DataFrame({"node": pd.Series([], dtype=g["node"].dtype),
                                 "label": pd.Series([], dtype=g["cand"].dtype),
                                 "changed": pd.Series([], dtype=np.int8)})
        mn = g.groupby("node", sort=False)["cand"].min()
        old = g.loc[g["is_old"] == 1].set_index("node")["cand"]
        old = old[~old.index.duplicated()]
        changed = (mn != old.reindex(mn.index)).fillna(True)
        return pd.DataFrame({"node": mn.index.to_numpy(),
                             "label": mn.to_numpy(),
                             "changed": changed.to_numpy().astype(np.int8)})

    def by_node_bucket(ds):
        def fn(b: pa.Table) -> pa.Table:
            return no_meta(b).append_column("__b", pa.array(
                _bucket_col(b.column("node").to_pandas(), num_buckets)))
        return ds.map_batches(fn, batch_format="pyarrow")

    # --- initial labels: label(n) = min(n, neighbors) ---------------------
    def init_rows(b: pa.Table) -> pa.Table:
        def arr(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
        node, nbr = arr(b.column("node")), arr(b.column("nbr"))
        n = b.num_rows
        return pa.table({
            "node": pa.concat_arrays([node, node]),
            "cand": pa.concat_arrays([nbr, node]),   # self rows keep label ≤ n
            "is_old": pa.array(np.zeros(2 * n, dtype=np.int8)),
        })

    labels = by_node_bucket(edges.map_batches(init_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(min_combine, batch_format="pandas") \
        .materialize()

    # --- rounds -----------------------------------------------------------
    for _ in range(max_rounds):
        # probe phase: rows keyed by `probe`, answered by label rows
        def edge_probe_rows(b: pa.Table) -> pa.Table:
            # label is a PLACEHOLDER on probe rows (ignored via is_lab=0) —
            # a null-typed label column would make pandas coerce int64 keys
            # to float64 inside the group join
            return pa.table({"dst": b.column("node"),
                             "probe": b.column("nbr"),
                             "label": b.column("nbr"),
                             "is_lab": pa.array(
                                 np.zeros(b.num_rows, dtype=np.int8))})

        def label_side_rows(b: pa.Table) -> pa.Table:
            def arr(col):
                return col.combine_chunks() \
                    if isinstance(col, pa.ChunkedArray) else col
            node, lab = arr(b.column("node")), arr(b.column("label"))
            n = b.num_rows
            return pa.table({
                # doubling probes (dst=node, probe=label) + answer rows;
                # probe-row label is a placeholder (is_lab=0), see above
                "dst": pa.concat_arrays([node, node]),
                "probe": pa.concat_arrays([lab, node]),
                "label": pa.concat_arrays([lab, lab]),
                "is_lab": pa.array(
                    np.r_[np.zeros(n, np.int8), np.ones(n, np.int8)]),
            })

        probes = edges.map_batches(edge_probe_rows, batch_format="pyarrow") \
            .union(labels.map_batches(label_side_rows, batch_format="pyarrow"))

        def by_probe_bucket(b: pa.Table) -> pa.Table:
            return no_meta(b).append_column("__b", pa.array(
                _bucket_col(b.column("probe").to_pandas(), num_buckets)))

        def answer_bucket(g: pd.DataFrame) -> pd.DataFrame:
            if g.empty:
                return pd.DataFrame({
                    "node": pd.Series([], dtype=g["dst"].dtype),
                    "cand": pd.Series([], dtype=g["label"].dtype),
                    "is_old": pd.Series([], dtype=np.int8)})
            lab = g.loc[g["is_lab"] == 1, ["probe", "label"]] \
                .drop_duplicates("probe")
            pr = g.loc[g["is_lab"] == 0, ["dst", "probe"]]
            m = pr.merge(lab, on="probe", how="inner")
            # label rows double as the "old label" rows of the min-combine
            # phase (probe == node on is_lab=1 rows) — emitting them here
            # saves a separate union against the labels dataset per round
            return pd.DataFrame({
                "node": np.concatenate([m["dst"].to_numpy(),
                                        lab["probe"].to_numpy()]),
                "cand": np.concatenate([m["label"].to_numpy(),
                                        lab["label"].to_numpy()]),
                "is_old": np.r_[np.zeros(len(m), dtype=np.int8),
                                np.ones(len(lab), dtype=np.int8)],
            })

        merged = probes.map_batches(by_probe_bucket, batch_format="pyarrow") \
            .groupby("__b").map_groups(answer_bucket, batch_format="pandas")
        labels = by_node_bucket(merged).groupby("__b").map_groups(
            min_combine, batch_format="pandas").materialize()
        if labels.sum("changed") == 0:
            break
        # second, doubling-ONLY step in the same round (VERDICT r2 item 9):
        # label ← label(label) over the freshly-relaxed labels — two jumps
        # per round ≈ halves round count on long chains, and the step is
        # cheaper than a full round (label-sized probes, no edge rows, no
        # extra convergence aggregate: if it changes nothing the next
        # round's check sees changed == 0 and exits).
        probes2 = labels.map_batches(label_side_rows, batch_format="pyarrow")
        merged2 = probes2.map_batches(by_probe_bucket,
                                      batch_format="pyarrow") \
            .groupby("__b").map_groups(answer_bucket, batch_format="pandas")
        labels = by_node_bucket(merged2).groupby("__b").map_groups(
            min_combine, batch_format="pandas").materialize()

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("node"),
                         "component": b.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")


def kcore_bipartite(pairs_ds, *, key_a: str = "key_a", key_b: str = "key_b",
                    k: int = 2, rounds: int = 4,
                    degree_gather_limit: int = 20_000_000):
    """Synchronized k-core peeling of a bipartite edge set: each round
    drops every edge touching a node of degree < ``k`` ON ITS OWN SIDE,
    re-counting degrees over the surviving edges; ``rounds`` rounds are
    run (early exit when a round removes nothing — the fixpoint, after
    which extra rounds are identities, so a fixed-round oracle and the
    early-exit engine agree whenever the graph converges in time; the
    returned ``converged`` flag says whether it did).

    Scale shape: edges stay distributed; per round, per-batch endpoint
    ``value_counts`` partials fold driver-side (bounded by node count —
    ``degree_gather_limit`` gates the gather, loud failure past it) and
    the surviving-node key sets broadcast back via ``ray.put`` into an
    Arrow ``is_in`` filter. Each round is one pass over the current edge
    set; edge sets are materialized per round so round r+1 does not
    re-execute round r's lineage.

    → ``(edges_ds, converged)``: the peeled edge Dataset and whether a
    fixpoint was reached within ``rounds``.
    """
    import ray

    cur = pairs_ds.materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        out = []
        for side, col in (("a", key_a), ("b", key_b)):
            vc = b.column(col).combine_chunks().value_counts()
            out.append(pa.table({
                "side": pa.nulls(len(vc), pa.string()).fill_null(side),
                "key": pc.cast(pc.struct_field(vc, "values"), pa.int64()),
                "d": pc.cast(pc.struct_field(vc, "counts"), pa.int64())}))
        return pa.concat_tables(out)

    converged = False
    for _ in range(rounds):
        degs = cur.map_batches(deg_partial, batch_format="pyarrow") \
            .to_pandas()
        if degs.empty or "side" not in degs.columns:
            # the peel emptied the graph — the empty set is a fixpoint
            # (empty partials also lose their schema, CLAUDE.md)
            converged = True
            break
        if len(degs) > degree_gather_limit:
            raise ValueError(
                f"kcore_bipartite: {len(degs)} degree partials exceed the "
                f"driver gather gate {degree_gather_limit}; raise the gate "
                "or pre-bucket the degree fold")
        degs = degs.groupby(["side", "key"], as_index=False)["d"].sum()
        keep_a = degs[(degs["side"] == "a") & (degs["d"] >= k)]["key"]
        keep_b = degs[(degs["side"] == "b") & (degs["d"] >= k)]["key"]
        n_a = int((degs["side"] == "a").sum())
        n_b = int((degs["side"] == "b").sum())
        if len(keep_a) == n_a and len(keep_b) == n_b:
            converged = True
            break
        ref = ray.put((pa.array(keep_a.to_numpy(), pa.int64()),
                       pa.array(keep_b.to_numpy(), pa.int64())))

        class _Filter:
            def __init__(self, r):
                self.ka, self.kb = (ray.get(r)
                                    if isinstance(r, ray.ObjectRef) else r)

            def __call__(self, b: pa.Table) -> pa.Table:
                m = pc.and_(
                    pc.is_in(pc.cast(b.column(key_a), pa.int64()),
                             value_set=self.ka),
                    pc.is_in(pc.cast(b.column(key_b), pa.int64()),
                             value_set=self.kb))
                return b.filter(m)

        cur = cur.map_batches(_Filter, fn_constructor_args=(ref,),
                              concurrency=(1, 2),
                              batch_format="pyarrow").materialize()
    if not converged:
        # the last filter may itself have reached the fixpoint — decide on
        # the FINAL edge set (same test a SQL oracle runs on its last CTE)
        degs = cur.map_batches(deg_partial, batch_format="pyarrow") \
            .to_pandas()
        if len(degs):
            degs = degs.groupby(["side", "key"], as_index=False)["d"].sum()
            converged = bool((degs["d"] >= k).all())
        else:
            converged = True
    return cur, converged


def dedup_by_components(ds, key: str, components_ds, *,
                        strategy: str = "auto",
                        broadcast_limit: int = 5_000_000,
                        num_buckets: int = 32):
    """Drop every row whose key belongs to a component but is not that
    component's canonical (minimal) key.

    - ``broadcast`` — gather the non-canonical key set once, ``pc.is_in``
      anti-filter per batch (zero corpus shuffle). Right whenever the
      CANDIDATE set fits the driver — usually orders of magnitude smaller
      than the corpus.
    - ``join`` — heavy-duplication corpora (web crawls run 20-30% dups →
      the drop set scales with the corpus): bucketed LEFT anti-join of the
      corpus against the drop keys; the corpus crosses one hash exchange,
      no driver-side key set.
    - ``auto`` — broadcast below ``broadcast_limit`` drop keys.
    """

    def non_canonical(b: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.invert(
            pc.equal(b.column("key"), b.column("component"))), False)
        kept = b.filter(m)
        return pa.table({key: kept.column("key"),
                         "__drop": pa.array(
                             np.ones(kept.num_rows, dtype=np.int8))})

    drop_ds = components_ds.map_batches(non_canonical, batch_format="pyarrow")
    if strategy == "auto":
        n = drop_ds.count()
        strategy = "broadcast" if n <= broadcast_limit else "join"

    if strategy == "broadcast":
        comp = components_ds.to_pandas()
        if "key" not in comp.columns or comp.empty:
            # Ray drops empty blocks, losing even a typed empty schema in
            # to_pandas — no components means nothing to drop
            return ds
        drop = set(comp.loc[comp["key"] != comp["component"], "key"])
        drop_arr = pa.array(list(drop))

        def keep(b: pa.Table) -> pa.Table:
            if not drop:
                return b
            mask = pc.invert(pc.is_in(b.column(key), value_set=drop_arr))
            return b.filter(pc.fill_null(mask, True))

        return ds.map_batches(keep, batch_format="pyarrow")

    from .joins import bucketed_join

    joined = bucketed_join(ds, drop_ds, on=key, join_type="left_outer",
                           num_buckets=num_buckets)

    def keep_unmatched(b: pa.Table) -> pa.Table:
        kept = b.filter(pc.is_null(b.column("__drop")))
        return kept.drop_columns(["__drop"])

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")
