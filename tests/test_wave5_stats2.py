"""Final-round statistics wave 2: Mood's median test, two-sample
Cramér–von Mises, Grubbs outlier test, Goh–Barabási burstiness,
centroid silhouette, integer HITS. Each is pinned against a plain-float
reference implementation on a hand fixture; the fold-cells queries also
pin block_gate=0 path equality on the smoke corpus."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _docs(tmp_path, langs, n_chars):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    n = len(langs)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["web"] * n, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


def _orders(tmp_path, days, totals):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day_us = 86_400_000_000
    n = len(days)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderdate": pa.array([dd * day_us for dd in days],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n),
    }), str(d / "orders.parquet"))
    return str(d)


def test_moods_median_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        moods_median_chars_langs)

    # en all below the grand median, de all above: m2 = 5+5 = 10
    langs = ["en"] * 5 + ["de"] * 4
    sf = _docs(tmp_path, langs, [1, 2, 3, 4, 5, 10, 11, 12, 13])
    out = moods_median_chars_langs(sf).reset_index(drop=True)
    assert list(out["lang"]) == ["de", "en"]
    assert list(out["n_above"]) == [4, 0]
    assert list(out["n_below"]) == [0, 5]
    # float chi-square reference, T=9, colA=4, colB=5
    for i, (row, above) in enumerate([(4, 4), (5, 0)]):
        e_a = row * 4 / 9.0
        e_b = row * 5 / 9.0
        assert out["contrib_above"].iloc[i] == pytest.approx(
            (above - e_a) ** 2 / e_a, rel=1e-12)
        assert out["contrib_below"].iloc[i] == pytest.approx(
            ((row - above) - e_b) ** 2 / e_b, rel=1e-12)


def test_cvm_hand_fixture_with_ties(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import cvm_chars_langs

    # en = [1,1,3], de = [1,2]: midranks of the three 1s = 2, so
    # A ranks [2,2,5], B ranks [2,4]; U = 3*5 + 2*5 = 25, u4 = 100,
    # T = 25/30 - 23/30 = 1/15
    langs = ["en"] * 3 + ["de"] * 2
    sf = _docs(tmp_path, langs, [1, 1, 3, 1, 2])
    out = cvm_chars_langs(sf)
    assert int(out["n_a"].iloc[0]) == 3
    assert int(out["n_b"].iloc[0]) == 2
    assert int(out["u4"].iloc[0]) == 100
    assert out["t_stat"].iloc[0] == pytest.approx(1.0 / 15.0, rel=1e-12)


def test_cvm_matches_float_reference(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import cvm_chars_langs

    ga = [10, 12, 12, 15, 40, 41, 7]
    gb = [12, 18, 20, 22, 7, 7]
    langs = ["en"] * len(ga) + ["de"] * len(gb)
    sf = _docs(tmp_path, langs, ga + gb)
    out = cvm_chars_langs(sf)

    # float reference: midranks over the pooled sample
    pooled = np.array(ga + gb, float)
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sv = pooled[order]
    i = 0
    r = 1
    avg = np.empty(len(pooled))
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        avg[i:j] = (r + (r + (j - i) - 1)) / 2.0
        r += j - i
        i = j
    ranks[order] = avg
    ra = np.sort(ranks[:len(ga)])
    rb = np.sort(ranks[len(ga):])
    n, m = len(ga), len(gb)
    u = n * ((ra - np.arange(1, n + 1)) ** 2).sum() \
        + m * ((rb - np.arange(1, m + 1)) ** 2).sum()
    t_ref = u / (n * m * (n + m)) - (4 * n * m - 1) / (6.0 * (n + m))
    assert int(out["u4"].iloc[0]) == int(round(4 * u))
    assert out["t_stat"].iloc[0] == pytest.approx(t_ref, rel=1e-12)


def test_grubbs_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        grubbs_daily_revenue)

    days = [0, 1, 2, 4]
    totals = [100.0, 300.0, 200.0, 1000.0]
    sf = _orders(tmp_path, days, totals)
    out = grubbs_daily_revenue(sf)
    cents = np.array([10000, 30000, 20000, 100000], float)
    ref = float(np.max(np.abs(cents - cents.mean()))
                / cents.std(ddof=1))
    assert int(out["n_days"].iloc[0]) == 4
    assert int(out["peak_day"].iloc[0]) == 4
    assert out["g"].iloc[0] == pytest.approx(ref, rel=1e-12)


def test_burstiness_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        burstiness_users)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    # user 1: gaps 10s, 10s, 100s; user 2: regular 60s gaps (B < 0);
    # user 3: only 2 events (1 gap -> excluded by n >= 2)
    ts = {1: [0, 10, 20, 120], 2: [0, 60, 120, 180], 3: [0, 30]}
    rows = [(u, t) for u, tt in ts.items() for t in tt]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([t * 1_000_000 for _, t in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), str(d / "events.parquet"))
    out = burstiness_users(str(d)).reset_index(drop=True)
    assert list(out["user_id"]) == [1, 2]
    for i, u in enumerate([1, 2]):
        g = np.diff(np.array(ts[u], float))
        ref = (g.std() - g.mean()) / (g.std() + g.mean())
        assert out["b"].iloc[i] == pytest.approx(ref, rel=1e-12)
    assert list(out["n_gaps"]) == [3, 3]


def test_silhouette_matches_brute(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        silhouette_embeddings)

    rng = np.random.RandomState(7)
    labels = np.repeat([0, 1, 2], 8)
    base = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    vecs = base[labels] + rng.randn(24, 4) * 0.3
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(24), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in
                               vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(d / "embeddings.parquet"))
    out = silhouette_embeddings(str(d)).reset_index(drop=True)

    # brute reference in the quantized code space
    v64 = vecs.astype(np.float32).astype(np.float64)
    scale = np.abs(v64).max(axis=1)
    q = np.floor(v64 * 127.0 / scale[:, None]).astype(np.int64)
    cents = {}
    for lb in (0, 1, 2):
        s = q[labels == lb].sum(axis=0)
        n = int((labels == lb).sum())
        cents[lb] = np.sign(s) * (np.abs(s) // n)
    a2 = np.array([((q[i] - cents[int(labels[i])]) ** 2).sum()
                   for i in range(24)])
    b2 = np.array([min(((q[i] - cents[o]) ** 2).sum()
                       for o in (0, 1, 2) if o != int(labels[i]))
                   for i in range(24)])
    for i, lb in enumerate((0, 1, 2)):
        m = labels == lb
        assert int(out["n_vecs"].iloc[i]) == 8
        assert int(out["sum_a2"].iloc[i]) == int(a2[m].sum())
        assert int(out["sum_b2"].iloc[i]) == int(b2[m].sum())
        assert int(out["n_well"].iloc[i]) == int((b2[m] > a2[m]).sum())
        ref = float(b2[m].sum() - a2[m].sum()) \
            / float(np.maximum(a2[m], b2[m]).sum())
        assert out["s2_index"].iloc[i] == pytest.approx(ref, rel=1e-12)


def test_hits_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import hits_custsupp

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    # bipartite: customers {1,2}, suppliers {10, 11, 12};
    # edges: 1-10, 1-11, 1-12, 2-10 (customer 1 is the hub)
    orders = [(100, 1), (101, 1), (102, 2)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o for o, _ in orders], pa.int64()),
        "o_custkey": pa.array([c for _, c in orders], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
        "o_orderdate": pa.array([0] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 3),
    }), str(d / "orders.parquet"))
    li = [(100, 10), (100, 11), (101, 12), (101, 10), (102, 10)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([o for o, _ in li], pa.int64()),
        "l_partkey": pa.array([1] * 5, pa.int64()),
        "l_suppkey": pa.array([s for _, s in li], pa.int64()),
        "l_linenumber": pa.array([1] * 5, pa.int32()),
        "l_quantity": pa.array([1.0] * 5, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 5, pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64()),
        "l_tax": pa.array([0.0] * 5, pa.float64()),
        "l_returnflag": pa.array(["N"] * 5),
        "l_linestatus": pa.array(["O"] * 5),
        "l_shipdate": pa.array([0] * 5, pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))

    res = hits_custsupp(str(d))
    out = (res if isinstance(res, pd.DataFrame) else res.to_pandas()) \
        .sort_values(["kind", "key"]).reset_index(drop=True)

    # integer reference iteration: edges c->s, 3 rounds, base 1e6
    edges = {(1, 10), (1, 11), (1, 12), (2, 10)}
    base = 1_000_000
    a = {s: base for s in (10, 11, 12)}
    h = {}
    for _ in range(3):
        h = {c: sum(a[s] for (cc, s) in edges if cc == c)
             for c in (1, 2)}
        hm = max(h.values())
        h = {c: (v * base) // hm for c, v in h.items()}
        a = {s: sum(h[c] for (c, ss) in edges if ss == s)
             for s in (10, 11, 12)}
        am = max(a.values())
        a = {s: (v * base) // am for s, v in a.items()}
    ref = pd.DataFrame(
        [("auth", s, a[s]) for s in (10, 11, 12)]
        + [("hub", c, h[c]) for c in (1, 2)],
        columns=["kind", "key", "score"])
    pd.testing.assert_frame_equal(
        out[["kind", "key", "score"]].astype({"key": np.int64,
                                              "score": np.int64}),
        ref.astype({"key": np.int64, "score": np.int64}))

    # exchange path (edge_gate=0) must equal the gated driver path
    import ray.data as rd
    from jsonschema_validator_ray.stages.pagerank import hits

    edges = rd.from_pandas(pd.DataFrame(
        {"src": [1, 1, 1, 2], "dst": [10, 11, 12, 10]})).materialize()
    hx, ax = hits(edges, "src", "dst", iterations=3, edge_gate=0)
    hd, ad = hits(edges, "src", "dst", iterations=3)
    for got, want in ((hx, hd), (ax, ad)):
        g = got.to_pandas().sort_values("node").reset_index(drop=True)
        w = want.to_pandas().sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g.astype({"node": np.int64, "score": np.int64}),
            w.astype({"node": np.int64, "score": np.int64}))


def test_wave5_stats2_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        cvm_chars_langs, grubbs_daily_revenue, moods_median_chars_langs)

    for fn, sort_cols in ((moods_median_chars_langs, ["lang"]),
                          (cvm_chars_langs, ["n_a"]),
                          (grubbs_daily_revenue, ["n_days"])):
        gated = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        forced = fn(SF_SMOKE, block_gate=0).sort_values(sort_cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(gated, forced)
