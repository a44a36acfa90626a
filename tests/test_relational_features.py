"""Differential tests for the round-4 relational composites (Q13/Q18/Q4/Q22
shapes, INTERSECT, gaps-and-islands, ordered string_agg) and the feature
stages (min-max ppm scaling, integer-MIPS k-NN graph), plus edge cases the
sf-dir oracles can't reach (zero-order customers, the Q18 join fallback, the
self-edge sentinel overflow regression)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
_TABLES = ("customer", "orders", "lineitem", "events", "documents",
           "embeddings")


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _cmp(ours: pd.DataFrame, sql: str, sort_cols):
    theirs = _oracle(sql)
    a = ours.sort_values(sort_cols).reset_index(drop=True)[sorted(ours.columns)]
    b = theirs.sort_values(sort_cols).reset_index(drop=True)[
        sorted(theirs.columns)]
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def _df(out):
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


@pytest.mark.parametrize("qname,sort_cols", [
    ("order_count_distribution", ["c_count"]),
    ("big_orders", ["o_orderkey"]),
    ("priority_counts", ["o_orderpriority"]),
    ("rich_quiet_customers", ["c_nationkey"]),
    ("click_purchase_days", ["user_id", "day"]),
    ("longest_streak_users", ["user_id"]),
    ("first_events_path", ["user_id"]),
])
def test_relational_matches_oracle(ray_session, qname, sort_cols):
    from jsonschema_validator_ray.pipelines import relational

    import __ray_entry__ as entry

    out = _df(getattr(relational, qname)(SF))
    _cmp(out, entry.oracle_sql()[qname], sort_cols)


@pytest.mark.parametrize("qname,sort_cols", [
    ("minmax_normalize_documents", ["doc_id"]),
    ("knn_graph_embeddings", ["vec_id", "rank"]),
])
def test_features_match_oracle(ray_session, qname, sort_cols):
    from jsonschema_validator_ray.pipelines import features

    import __ray_entry__ as entry

    out = _df(getattr(features, qname)(SF))
    _cmp(out, entry.oracle_sql()[qname], sort_cols)


def test_big_orders_join_fallback(ray_session):
    """block_gate=0 + driver_limit=0 forces the exchange + bucketed-join
    scale path; results must be identical to the fused driver-fold path."""
    from jsonschema_validator_ray.pipelines.relational import big_orders

    broad = _df(big_orders(SF)).sort_values("o_orderkey") \
        .reset_index(drop=True)
    joined = _df(big_orders(SF, driver_limit=0, block_gate=0)) \
        [broad.columns].sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(broad, joined, check_dtype=False)


def test_big_orders_driver_limit_raises_on_fold_path(ray_session):
    from jsonschema_validator_ray.pipelines.relational import big_orders

    with pytest.raises(ValueError, match="driver_limit"):
        big_orders(SF, driver_limit=0)


@pytest.mark.parametrize("qname,sort_cols", [
    ("big_orders", ["o_orderkey"]),
    ("priority_counts", ["o_orderpriority"]),
    ("rich_quiet_customers", ["c_nationkey"]),
    ("order_count_distribution", ["c_count"]),
])
def test_shuffle_fallback_agrees_with_fused_path(ray_session, qname,
                                                 sort_cols):
    """block_gate=0 forces the exchange-based scale path of each round-4
    fused query; both paths must produce identical tables."""
    from jsonschema_validator_ray.pipelines import relational

    fn = getattr(relational, qname)
    fast = _df(fn(SF)).sort_values(sort_cols).reset_index(drop=True)
    slow = _df(fn(SF, block_gate=0))[fast.columns] \
        .sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_order_count_distribution_zero_customers(ray_session, tmp_path):
    """Customers without any order must appear in the c_count=0 bin (the
    LEFT-JOIN subtlety); order custkeys missing from customer must NOT."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
                   str(d / "customer.parquet"))
    pq.write_table(pa.table({"o_custkey": pa.array([1, 1, 2, 99], pa.int64())}),
                   str(d / "orders.parquet"))
    from jsonschema_validator_ray.pipelines.relational import (
        order_count_distribution)

    out = order_count_distribution(str(d)).set_index("c_count")["n_cust"]
    assert out.to_dict() == {2: 1, 1: 1, 0: 2}


def test_longest_streak_islands(ray_session, tmp_path):
    """Hand-built islands: user 7 has days {0,1,2, 4,5, 9} → longest 3,
    active 6; duplicate events on one day collapse."""
    d = tmp_path / "sf"
    d.mkdir()
    days = [0, 0, 1, 2, 4, 5, 9]
    ts = pd.to_datetime(np.array(days) * 86_400_000_000_000 + 5)
    pq.write_table(pa.table({
        "user_id": pa.array([7] * len(days), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
    }), str(d / "events.parquet"))
    from jsonschema_validator_ray.pipelines.relational import (
        longest_streak_users)

    out = _df(longest_streak_users(str(d)))
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["user_id"], row["longest_streak"], row["n_active_days"]) \
        == (7, 3, 6)


def test_knn_graph_no_self_edges_and_sentinel(ray_session):
    """Self-edges excluded; regression for the -INT64_MIN argpartition
    overflow (self rows used to win the top-k)."""
    from jsonschema_validator_ray.pipelines.features import (
        knn_graph_embeddings)

    out = _df(knn_graph_embeddings(SF))
    assert (out["vec_id"] != out["neighbor_id"]).all()
    assert (out["dot"] > -(1 << 62)).all()
    # each vector contributes exactly k=5 ranked rows
    per = out.groupby("vec_id")["rank"].agg(["count", "min", "max"])
    assert (per["count"] == 5).all()
    assert (per["min"] == 1).all() and (per["max"] == 5).all()


def test_knn_graph_broadcast_gate(ray_session):
    from jsonschema_validator_ray.pipelines.features import (
        knn_graph_embeddings)

    with pytest.raises(ValueError, match="IVF"):
        knn_graph_embeddings(SF, broadcast_limit_rows=3)


def test_minmax_constant_group(ray_session, tmp_path):
    """A single-doc language has max == min → norm_ppm 0, not a div0."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "zz"]),
        "n_chars": pa.array([10, 30, 7], pa.int64()),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.features import (
        minmax_normalize_documents)

    out = _df(minmax_normalize_documents(str(d))).set_index("doc_id")
    assert out.loc[3, "norm_ppm"] == 0
    assert out.loc[1, "norm_ppm"] == 0
    assert out.loc[2, "norm_ppm"] == 1_000_000


@pytest.mark.parametrize("qname,sort_cols", [
    ("session_type_overlaps", ["user_id", "s_start_us", "event_type", "day"]),
    ("sources_except_zh", ["source"]),
    ("time_to_first_purchase", ["user_id"]),
])
def test_relational_batch2_matches_oracle(ray_session, qname, sort_cols):
    from jsonschema_validator_ray.pipelines import relational

    import __ray_entry__ as entry

    out = _df(getattr(relational, qname)(SF))
    _cmp(out, entry.oracle_sql()[qname], sort_cols)


def test_target_encode_matches_oracle(ray_session):
    from jsonschema_validator_ray.pipelines import features

    import __ray_entry__ as entry

    out = _df(features.target_encode_customers(SF))
    _cmp(out, entry.oracle_sql()["target_encode_customers"], ["c_custkey"])


def test_interval_overlap_join_exact_once(ray_session):
    """Hand-built intervals: multi-cell spans are emitted exactly once,
    closed endpoints touch-match, disjoint intervals never match."""
    import ray.data

    from jsonschema_validator_ray.stages.joins import interval_overlap_join

    cell = 100
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3], pa.int64()),
        "ls": pa.array([0, 250, 990], pa.int64()),
        "le": pa.array([350, 260, 1000], pa.int64()),   # 1 spans 4 cells
    }))
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array([10, 11, 12], pa.int64()),
        "rs": pa.array([340, 351, 250], pa.int64()),
        "re": pa.array([400, 360, 250], pa.int64()),
    }))
    out = interval_overlap_join(
        left, right, l_start="ls", l_end="le",
        r_start="rs", r_end="re", cell_us=cell).to_pandas()
    pairs = sorted(map(tuple, out[["lid", "rid"]].to_numpy()))
    # 1×10 touch at 340..350 (closed); 1×12 contains 250; 2×12 touches 250
    # exactly; 1×11 disjoint (351 > 350); 3 overlaps nothing
    assert pairs == [(1, 10), (1, 12), (2, 12)]
    # exact-once: no duplicate pairs despite interval 1 spanning 4 cells
    assert len(pairs) == len(set(pairs))
    # bounds survive the exchange exactly (never float-upcast)
    row = out[(out.lid == 1) & (out.rid == 10)].iloc[0]
    assert (row["ls"], row["le"], row["rs"], row["re"]) == (0, 350, 340, 400)
    assert out.dtypes["ls"] == np.int64


def test_interval_overlap_join_epoch_magnitudes(ray_session):
    """Epoch-µs magnitudes (≈1.7e18 > 2^53) must survive exactly — the
    float64-upcast corruption this operator is built to dodge."""
    import ray.data

    from jsonschema_validator_ray.stages.joins import interval_overlap_join

    base = 1_700_000_000_000_001_237               # not float64-representable
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1], pa.int64()),
        "ls": pa.array([base], pa.int64()),
        "le": pa.array([base + 7], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array([2], pa.int64()),
        "rs": pa.array([base + 3], pa.int64()),
        "re": pa.array([base + 11], pa.int64()),
    }))
    out = interval_overlap_join(
        left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
        cell_us=86_400_000_000).to_pandas()
    assert len(out) == 1
    assert int(out.iloc[0]["ls"]) == base and int(out.iloc[0]["rs"]) == base + 3


@pytest.mark.parametrize("qname,module,sort_cols", [
    ("bfs_levels_custsupp", "relational", ["level", "node"]),
    ("dense_hourly_events", "relational", ["hour"]),
    ("wow_growth_events", "relational", ["week"]),
    ("dim_argmax_embeddings", "features", ["dim"]),
])
def test_batch3_matches_oracle(ray_session, qname, module, sort_cols):
    import importlib

    import __ray_entry__ as entry

    mod = importlib.import_module(f"jsonschema_validator_ray.pipelines.{module}")
    out = _df(getattr(mod, qname)(SF))
    _cmp(out, entry.oracle_sql()[qname], sort_cols)


def test_bfs_levels_seed_and_monotone(ray_session):
    from jsonschema_validator_ray.pipelines.relational import (
        bfs_levels_custsupp)

    out = bfs_levels_custsupp(SF)
    assert out[out.node == "c1"]["level"].tolist() == [0]
    # level-1 nodes are suppliers (bipartite), level-2 customers
    lv = out.set_index("node")["level"]
    assert all(n.startswith("s") for n in lv[lv == 1].index)
    assert all(n.startswith("c") for n in lv[lv == 2].index)


def test_dense_hourly_gap_fill(ray_session, tmp_path):
    """Hours with no events appear with zero (the dropped-bucket bug a
    plain groupby has)."""
    d = tmp_path / "sf"
    d.mkdir()
    hours = [0, 0, 3]                        # hours 1 and 2 are empty
    ts = pd.to_datetime(np.array(hours) * 3_600_000_000_000)
    pq.write_table(pa.table({"ts": pa.array(ts.astype("datetime64[us]"))}),
                   str(d / "events.parquet"))
    from jsonschema_validator_ray.pipelines.relational import (
        dense_hourly_events)

    out = dense_hourly_events(str(d))
    assert out["hour"].tolist() == [0, 1, 2, 3]
    assert out["n_events"].tolist() == [2, 0, 0, 1]


def test_wow_growth_negative_truncates(ray_session, tmp_path):
    """Negative growth truncates toward zero, matching DuckDB's // (Python
    floor would differ by 1 bp): 3 -> 2 events = -3333 bp, not -3334."""
    d = tmp_path / "sf"
    d.mkdir()
    wk = 7 * 86_400_000_000_000
    ts = pd.to_datetime(np.array([0, 1, 2, wk, wk + 1], dtype=np.int64))
    pq.write_table(pa.table({"ts": pa.array(ts.astype("datetime64[us]"))}),
                   str(d / "events.parquet"))
    from jsonschema_validator_ray.pipelines.relational import (
        wow_growth_events)

    out = wow_growth_events(str(d))
    assert out["growth_bp"].tolist() == [-3333]


@pytest.mark.parametrize("qname,sort_cols", [
    ("unpivot_lineitem", ["l_orderkey", "l_linenumber", "measure"]),
    ("first_event_type_users", ["event_id"]),
    ("percent_rank_length_in_lang", ["doc_id"]),
])
def test_batch4_matches_oracle(ray_session, qname, sort_cols):
    from jsonschema_validator_ray.pipelines import relational

    import __ray_entry__ as entry

    out = _df(getattr(relational, qname)(SF))
    _cmp(out, entry.oracle_sql()[qname], sort_cols)


def test_percent_rank_single_row_group(ray_session, tmp_path):
    """A one-document language gets pr_ppm 0 (n−1 division guard), and the
    extremes map to 0 / 1e6."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lang": pa.array(["en", "en", "en", "zz"]),
        "n_chars": pa.array([5, 9, 7, 3], pa.int64()),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.relational import (
        percent_rank_length_in_lang)

    out = _df(percent_rank_length_in_lang(str(d))).set_index("doc_id")
    assert out.loc[4, "pr_ppm"] == 0
    assert out.loc[1, "pr_ppm"] == 0
    assert out.loc[3, "pr_ppm"] == 500_000
    assert out.loc[2, "pr_ppm"] == 1_000_000


@pytest.mark.parametrize("cell", [7, 50, 1000])
def test_interval_overlap_join_brute_force_parity(ray_session, cell):
    """Seeded random intervals vs the O(n·m) brute force, across cell
    widths smaller / comparable / larger than the interval lengths."""
    import ray.data

    from jsonschema_validator_ray.stages.joins import interval_overlap_join

    rng = np.random.RandomState(42 + cell)
    nl, nr = 60, 40
    ls = rng.randint(0, 500, nl).astype(np.int64)
    le = ls + rng.randint(0, 120, nl)
    rs = rng.randint(0, 500, nr).astype(np.int64)
    re_ = rs + rng.randint(0, 120, nr)
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array(np.arange(nl, dtype=np.int64)),
        "ls": pa.array(ls), "le": pa.array(le)}))
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array(np.arange(nr, dtype=np.int64)),
        "rs": pa.array(rs), "re": pa.array(re_)}))
    out = interval_overlap_join(
        left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
        cell_us=cell).to_pandas()
    got = sorted(map(tuple, out[["lid", "rid"]].to_numpy()))
    want = sorted((int(i), int(j))
                  for i in range(nl) for j in range(nr)
                  if ls[i] <= re_[j] and rs[j] <= le[i])
    assert got == want


def test_skipgram_pairs_matches_oracle(ray_session):
    from jsonschema_validator_ray.pipelines import features

    import __ray_entry__ as entry

    out = _df(features.skipgram_pairs_documents(SF))
    _cmp(out, entry.oracle_sql()["skipgram_pairs_documents"],
         ["n", "w", "c"])


def test_skipgram_window_and_boundaries(ray_session, tmp_path):
    """Window-2 pairs stop at document boundaries; empty tokens (runs of
    whitespace) are dropped with positions re-densified."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "text": pa.array(["a  b c", "c a"]),   # double space → empty token
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.features import (
        skipgram_pairs_documents)

    out = _df(skipgram_pairs_documents(str(d)))
    pairs = {(r.w, r.c): r.n for r in out.itertuples()}
    # doc1: (a,b),(a,c),(b,c); doc2: (c,a); never (c,c) across docs
    assert pairs == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
                     ("c", "a"): 1}


@pytest.mark.parametrize("qname,sort_cols", [
    ("dim_median_embeddings", ["dim"]),
    ("skipgram_pmi_documents", ["n", "w", "c"]),
])
def test_vector_stats_match_oracle(ray_session, qname, sort_cols):
    from jsonschema_validator_ray.pipelines import features

    import __ray_entry__ as entry

    out = _df(getattr(features, qname)(SF))
    _cmp(out, entry.oracle_sql()[qname], sort_cols)


def test_skipgram_pmi_hand_values(ray_session, tmp_path):
    """PMI on a hand corpus: pairs of 'a b a b' → marginals checked by
    hand; floor(ln(nT/(nw nc))·1e6) computed independently."""
    import math

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"text": pa.array(["a b a b"])}),
                   str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.features import (
        skipgram_pmi_documents)

    out = _df(skipgram_pmi_documents(str(d))).set_index(["w", "c"])
    # pairs (off1): (a,b),(b,a),(a,b); (off2): (a,a),(b,b) → T=5
    # centers: a:3, b:2 ; contexts: b:3, a:2
    assert out.loc[("a", "b"), "n"] == 2
    want = math.floor(math.log(float(2 * 5) / float(3 * 3)) * 1_000_000)
    assert out.loc[("a", "b"), "pmi_micro"] == want


@pytest.mark.parametrize("qname,module,sort_cols", [
    ("supplier_triangles", "relational", ["node"]),
    ("weighted_sample_documents", "features", ["doc_id"]),
])
def test_graph_and_sampling_match_oracle(ray_session, qname, module,
                                         sort_cols):
    import importlib

    import __ray_entry__ as entry

    mod = importlib.import_module(
        f"jsonschema_validator_ray.pipelines.{module}")
    out = _df(getattr(mod, qname)(SF))
    _cmp(out, entry.oracle_sql()[qname], sort_cols)


def test_supplier_triangles_hand_graph(ray_session, tmp_path):
    """A hand-built lineitem log whose thresholded graph is one triangle
    plus a pendant edge: triangle members count 1, the pendant nodes that
    are triangle corners still count 1, pure-pendant nodes drop."""
    d = tmp_path / "sf"
    d.mkdir()
    # suppliers 1,2,3 co-occur in MANY orders (far above mean+2σ);
    # 3-4 co-occur a middling number; 5-6 occur once
    rows = []
    oid = 0
    for _ in range(30):
        rows += [(oid, 1), (oid, 2), (oid, 3)]
        oid += 1
    for _ in range(2):
        rows += [(oid, 3), (oid, 4)]
        oid += 1
    rows += [(oid, 5), (oid, 6)]
    ok = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(ok, str(d / "lineitem.parquet"))
    from jsonschema_validator_ray.pipelines.relational import (
        supplier_triangles)

    out = supplier_triangles(str(d)).set_index("node")["n_triangles"]
    # support: (1,2)=(1,3)=(2,3)=30, (3,4)=2, (5,6)=1 → mean≈19, only the
    # 30-support edges survive the mean+2σ predicate → one triangle
    assert out.to_dict() == {1: 1, 2: 1, 3: 1}


def test_supplier_triangles_wedge_join_matches_broadcast(ray_session,
                                                         tmp_path):
    """adjacency_limit=0 forces the broadcast-free wedge-join fallback; it
    must equal the packbits-broadcast path on the real table (empty at
    this SF — the sparsifier kills every edge) AND on a planted graph
    with two shared-edge triangles (1-2-3, 2-3-4) plus noise."""
    from jsonschema_validator_ray.pipelines.relational import (
        supplier_triangles)

    fast = supplier_triangles(SF).reset_index(drop=True)
    slow = supplier_triangles(SF, adjacency_limit=0)[fast.columns] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)

    d = tmp_path / "sf"
    d.mkdir()
    rows, oid = [], 0
    for _ in range(30):                      # hot: both triangles
        rows += [(oid, 1), (oid, 2), (oid, 3)]
        oid += 1
        rows += [(oid, 2), (oid, 3), (oid, 4)]
        oid += 1
    for _ in range(2):                       # cold edge drops
        rows += [(oid, 4), (oid, 5)]
        oid += 1
    # 200 singleton noise pairs drag the Poisson mean to ~1.9 so the
    # support-30/60 triangle edges clear the mean+2σ sparsifier
    for i in range(200):
        rows += [(oid, 100 + 2 * i), (oid, 101 + 2 * i)]
        oid += 1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
    }), str(d / "lineitem.parquet"))
    fast2 = supplier_triangles(str(d)).reset_index(drop=True)
    slow2 = supplier_triangles(str(d), adjacency_limit=0)[fast2.columns] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast2, slow2, check_dtype=False)
    assert fast2.set_index("node")["n_triangles"].to_dict() == \
        {1: 1, 2: 2, 3: 2, 4: 1}


def test_weighted_sample_respects_weights(ray_session, tmp_path):
    """Zero-length docs never sampled; max-length docs kept iff
    lcg % (max+1) < max — verified against the direct formula."""
    d = tmp_path / "sf"
    d.mkdir()
    ids = np.arange(200, dtype=np.int64)
    n_chars = np.where(ids % 4 == 0, 0, np.where(ids % 4 == 1, 50, 100))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids),
        "lang": pa.array(["en"] * 200),
        "n_chars": pa.array(n_chars.astype(np.int64)),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.features import (
        weighted_sample_documents)

    out = _df(weighted_sample_documents(str(d)))
    kept = set(out["doc_id"])
    mod = int(n_chars.max()) + 1
    for i in ids:
        u = ((48271 * int(i) + 11) % 2147483647) % mod
        assert (int(i) in kept) == (u < int(n_chars[i]))
    assert not (np.isin(list(kept), ids[n_chars == 0])).any()


def test_knn_graph_boundary_ties(ray_session, tmp_path):
    """Identical embeddings tie ALL dots: the top-k must break boundary
    ties by ascending neighbor id (argpartition alone picked an arbitrary
    subset — review regression)."""
    d = tmp_path / "sf"
    d.mkdir()
    n = 10
    emb = [[0.5, -0.25, 0.125, 0.0]] * n
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))
    from jsonschema_validator_ray.pipelines.features import (
        knn_graph_embeddings)

    out = _df(knn_graph_embeddings(str(d))).sort_values(["vec_id", "rank"])
    for vid, g in out.groupby("vec_id"):
        want = [i for i in range(1, 6 + 1) if i != vid][:5]
        assert g["neighbor_id"].tolist() == want, (vid, g)


def test_interval_overlap_join_inverted_raises(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import interval_overlap_join

    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1], pa.int64()),
        "ls": pa.array([500], pa.int64()),
        "le": pa.array([100], pa.int64()),     # inverted
    }))
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array([2], pa.int64()),
        "rs": pa.array([0], pa.int64()),
        "re": pa.array([1000], pa.int64()),
    }))
    with pytest.raises(Exception, match="inverted"):
        interval_overlap_join(left, right, l_start="ls", l_end="le",
                              r_start="rs", r_end="re",
                              cell_us=100).materialize()


def test_hybrid_rrf_fuses_two_orders(ray_session, tmp_path):
    """Hand-built vectors where MIPS and Euclidean disagree: a LONG vector
    in the same direction wins the dot ranking while a CLOSE short vector
    wins the distance ranking; RRF must fuse both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    vecs = [
        [1.0, 0.0, 0.0, 0.0],   # 0: the query row
        [0.9, 0.0, 0.0, 0.0],   # 1: closest (small d2), good dot
        [0.0, 0.9, 0.0, 0.0],   # 2: orthogonal
        [0.99, 0.99, 0.99, 0.99],  # 3: biggest dot, far away
    ]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))
    from jsonschema_validator_ray.pipelines.features import (
        hybrid_rrf_embeddings)

    out = hybrid_rrf_embeddings(str(d), k=3).to_pandas()
    row0 = out[out["vec_id"] == 0].sort_values("rnk")
    # vec 1: r1=2, r2=1 -> top fused; vec 3: r1=1, r2=3; vec 2: r1=3, r2=2
    assert list(row0["neighbor_id"]) == [1, 3, 2]
    S = 10 ** 12
    assert list(row0["rrf_score"]) == [
        S // 62 + S // 61, S // 61 + S // 63, S // 63 + S // 62]
    # every vector gets exactly k ranked rows
    per = out.groupby("vec_id")["rnk"].agg(["count", "min", "max"])
    assert (per["count"] == 3).all()


def test_hybrid_rrf_broadcast_gate(ray_session):
    import pytest

    from jsonschema_validator_ray.pipelines.features import (
        hybrid_rrf_embeddings)

    with pytest.raises(ValueError, match="IVF"):
        hybrid_rrf_embeddings("/root/testdata/sf0.001",
                              broadcast_limit_rows=3)
