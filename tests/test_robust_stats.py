"""Round-5 robust statistics: Kruskal-Wallis H (doubled midranks),
Theil-Sen slope, Brown-Forsythe variance-homogeneity F. Each is pinned
two ways: a float reference implementation on a hand fixture, and
block_gate=0 path equality on the smoke corpus."""

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


def _kruskal_ref(groups):
    # plain float Kruskal-Wallis with average ranks, no tie correction
    pooled = np.concatenate(groups)
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sorted_v = pooled[order]
    avg = np.empty(len(pooled))
    i = 0
    r = 1
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        avg[i:j] = (r + (r + (j - i) - 1)) / 2.0
        r += j - i
        i = j
    ranks[order] = avg
    n = len(pooled)
    h = 0.0
    at = 0
    for g in groups:
        rs = ranks[at:at + len(g)].sum()
        h += rs * rs / len(g)
        at += len(g)
    return 12.0 / (n * (n + 1)) * h - 3 * (n + 1)


def test_kruskal_matches_float_reference(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import kruskal_chars_langs

    ga = [10, 12, 12, 15, 40]
    gb = [12, 18, 20, 22]
    gc = [5, 6, 12, 30, 31, 31]
    langs = ["en"] * len(ga) + ["de"] * len(gb) + ["fr"] * len(gc)
    sf = _docs(tmp_path, langs, ga + gb + gc)
    out = kruskal_chars_langs(sf)
    assert (int(out["n_a"].iloc[0]), int(out["n_b"].iloc[0]),
            int(out["n_c"].iloc[0])) == (5, 4, 6)
    ref = _kruskal_ref([np.array(ga), np.array(gb), np.array(gc)])
    assert out["h"].iloc[0] == pytest.approx(ref, rel=1e-12)
    # tiesum: ties at 12 (t=4) and 31 (t=2) -> (64-4) + (8-2) = 66
    assert int(out["tiesum"].iloc[0]) == 66


def test_brown_forsythe_matches_float_reference(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.checks import (
        brown_forsythe_chars_langs)

    ga = [10, 11, 12, 300]          # big spread
    gb = [50, 51, 52, 53, 54]       # tight
    gc = [5, 100, 200]
    langs = ["en"] * len(ga) + ["de"] * len(gb) + ["fr"] * len(gc)
    sf = _docs(tmp_path, langs, ga + gb + gc)
    out = brown_forsythe_chars_langs(sf)

    def z(g):
        m = np.median(np.array(g, float))
        return np.abs(np.array(g, float) - m)

    zs = [z(ga), z(gb), z(gc)]
    nz = sum(len(x) for x in zs)
    gm = np.concatenate(zs).mean()
    ssb = sum(len(x) * (x.mean() - gm) ** 2 for x in zs)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in zs)
    ref = (ssb / 2) / (ssw / (nz - 3))
    assert out["f"].iloc[0] == pytest.approx(ref, rel=1e-12)
    # doubled medians: en -> 11+12, de -> 52+52, fr -> 100+100
    assert (int(out["m2_a"].iloc[0]), int(out["m2_b"].iloc[0]),
            int(out["m2_c"].iloc[0])) == (23, 104, 200)


def test_theil_sen_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.checks import (
        theil_sen_daily_revenue)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day_us = 86_400_000_000
    # days 0,1,2,4 with revenue 100, 300, 200, 1000 dollars
    days = [0, 1, 2, 4]
    totals = [100.0, 300.0, 200.0, 1000.0]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1] * 4, pa.int64()),
        "o_orderstatus": pa.array(["F"] * 4),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderdate": pa.array([dd * day_us for dd in days],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4),
    }), str(d / "orders.parquet"))
    out = theil_sen_daily_revenue(str(d))
    cents = np.array([10000, 30000, 20000, 100000], float)
    dv = np.array(days, float)
    i, j = np.triu_indices(4, 1)
    ref = float(np.median((cents[j] - cents[i]) / (dv[j] - dv[i])))
    assert int(out["n_days"].iloc[0]) == 4
    assert int(out["n_pairs"].iloc[0]) == 6
    assert out["theil_sen"].iloc[0] == pytest.approx(ref)


def test_robust_stats_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import kruskal_chars_langs
    from jsonschema_validator_ray.pipelines.checks import (
        brown_forsythe_chars_langs, theil_sen_daily_revenue)

    for fn in (kruskal_chars_langs, brown_forsythe_chars_langs,
               theil_sen_daily_revenue):
        fast = fn(SF_SMOKE).reset_index(drop=True)
        slow = fn(SF_SMOKE, block_gate=0)[fast.columns] \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_runs_test_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        runs_test_daily_revenue)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day_us = 86_400_000_000
    # daily revenue 1,9,1,9,1,9 dollars -> perfect alternation: 6 runs
    days = list(range(6))
    totals = [1.0, 9.0, 1.0, 9.0, 1.0, 9.0]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(6), pa.int64()),
        "o_custkey": pa.array([1] * 6, pa.int64()),
        "o_orderstatus": pa.array(["F"] * 6),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderdate": pa.array([dd * day_us for dd in days],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 6),
    }), str(d / "orders.parquet"))
    out = runs_test_daily_revenue(str(d))
    assert int(out["n_days"].iloc[0]) == 6
    assert (int(out["n_above"].iloc[0]), int(out["n_below"].iloc[0])) \
        == (3, 3)
    assert int(out["runs"].iloc[0]) == 6
    # mu = 1 + 2*3*3/6 = 4; var = 18*(18-6)/(36*5) = 1.2; z = 2/sqrt(1.2)
    assert out["z"].iloc[0] == pytest.approx(2.0 / np.sqrt(1.2))


def test_gmd_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import gmd_length_by_lang

    # en lengths: 1, 1, 4  -> pairwise |diffs| {0,3,3} mean = 2.0
    sf = _docs(tmp_path, ["en", "en", "en", "de"], [1, 1, 4, 7])
    out = gmd_length_by_lang(sf).set_index("lang")
    assert out.loc["en", "gmd"] == pytest.approx(2.0)
    assert int(out.loc["en", "gmd_num"]) == 12   # doubled ordered pairs
    assert out.loc["de", "gmd"] == pytest.approx(0.0)


def test_runs_gmd_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        runs_test_daily_revenue)
    from jsonschema_validator_ray.pipelines.corpus import gmd_length_by_lang

    for fn, sort_cols in ((runs_test_daily_revenue, ["n_days"]),
                          (gmd_length_by_lang, ["lang"])):
        fast = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        slow = fn(SF_SMOKE, block_gate=0)[fast.columns] \
            .sort_values(sort_cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_dispersion_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        dispersion_by_event_type)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    base = 1_700_000_000_000_000
    day = 86_400_000_000
    # clicks: 3 on day0, 1 on day2 (day1 zero) over a 3-day span
    # views: 1 each day -> perfectly regular
    ts = ([base] * 3 + [base + 2 * day]
          + [base, base + day, base + 2 * day])
    et = ["click"] * 4 + ["view"] * 3
    pq.write_table(pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 7, pa.int64()),
        "event_type": pa.array(et),
        "value": pa.array([1.0] * 7, pa.float64()),
        "props": pa.array(["{}"] * 7),
    }), str(d / "events.parquet"))
    out = dispersion_by_event_type(str(d)).set_index("event_type")
    # click: n=3 days, counts (3,0,1): S=4, SS=10 -> D=(30-16)/4=3.5
    assert out.loc["click", "d"] == pytest.approx(3.5)
    # view: counts (1,1,1): S=3, SS=3 -> D=(9-9)/3=0
    assert out.loc["view", "d"] == pytest.approx(0.0)
    assert int(out.loc["click", "n_days"]) == 3


def test_cochran_armitage_trend_detected(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import (
        cochran_armitage_length_gate)

    # bin 0 (n_chars<200): all fail; bin 1: all pass -> perfect trend
    many_tok = " ".join(["w"] * 60)
    rows = ([(i, "short text", "en", "web", 50) for i in range(5)]
            + [(i + 5, many_tok, "en", "web", 250) for i in range(5)])
    sf = _docs_rows(tmp_path, rows)
    out = cochran_armitage_length_gate(sf)
    n, r = 10, 5
    t, wn, wn2 = 5, 5, 5
    ref = n * (n * t - r * wn) ** 2 / (r * (n - r) * (n * wn2 - wn * wn))
    assert int(out["n_pass"].iloc[0]) == 5
    assert out["z2"].iloc[0] == pytest.approx(ref)   # = 10.0


def _docs_rows(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "doc_id": pa.array(cols[0], pa.int64()),
        "text": pa.array(cols[1], pa.string()),
        "lang": pa.array(cols[2], pa.string()),
        "source": pa.array(cols[3], pa.string()),
        "n_chars": pa.array(cols[4], pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


def test_trend_dispersion_weekday_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        dispersion_by_event_type, weekday_anova_events)
    from jsonschema_validator_ray.pipelines.dq import (
        cochran_armitage_length_gate)

    for fn, sort_cols in ((dispersion_by_event_type, ["event_type"]),
                          (weekday_anova_events, ["n_days"]),
                          (cochran_armitage_length_gate, ["n_rows"])):
        fast = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        slow = fn(SF_SMOKE, block_gate=0)[fast.columns] \
            .sort_values(sort_cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_weekday_anova_positive(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        weekday_anova_events)

    out = weekday_anova_events(SF_SMOKE)
    assert int(out["n_days"].iloc[0]) > 0
    assert out["f"].iloc[0] >= 0.0


def test_blamed_suppliers_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.tpch import blamed_suppliers

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day = 86_400_000_000
    # order 1: supps {1,2}, latest ship uniquely supp 2 -> blame 2
    # order 2: single supplier -> excluded
    # order 3: supps {1,3}, latest ship TIED between 1 and 3 -> excluded
    # order 4: supps {2,3}, latest uniquely supp 2 -> blame 2
    rows = [(1, 1, 0), (1, 2, 5), (2, 1, 3), (2, 1, 9),
            (3, 1, 7), (3, 3, 7), (4, 2, 8), (4, 3, 1)]
    o, s, dd = zip(*rows)
    n = len(rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(o, pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array(s, pa.int64()),
        "l_linenumber": pa.array(range(1, n + 1), pa.int64()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([1.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([x * day for x in dd], pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"]),
        "s_nationkey": pa.array([0, 0, 0], pa.int64()),
        "s_acctbal": pa.array([0.0] * 3, pa.float64()),
    }), str(d / "supplier.parquet"))
    out = blamed_suppliers(str(d))
    got = dict(zip(out["s_suppkey"], out["n_orders"]))
    assert got == {2: 2}


def test_kendall_w_perfect_concordance(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import kendall_w_sources

    # 3 sources where chars, count and mean all rank identically:
    # a: 1 doc of 10; b: 2 docs of 20; c: 3 docs of 30
    rows = []
    did = 0
    for src, cnt, ln in (("a", 1, 10), ("b", 2, 20), ("c", 3, 30)):
        for _ in range(cnt):
            rows.append((did, "t", "en", src, ln))
            did += 1
    sf = _docs_rows(tmp_path, rows)
    out = kendall_w_sources(sf)
    assert int(out["k_sources"].iloc[0]) == 3
    assert out["w"].iloc[0] == pytest.approx(1.0)


def test_blamed_kendall_clean_corpus(ray_session):
    from jsonschema_validator_ray.pipelines.corpus import kendall_w_sources
    from jsonschema_validator_ray.pipelines.tpch import blamed_suppliers

    out = blamed_suppliers(SF_SMOKE)
    assert (out["n_orders"] >= 1).all()
    w = kendall_w_sources(SF_SMOKE)
    assert 0.0 <= w["w"].iloc[0] <= 1.0
    slow = kendall_w_sources(SF_SMOKE, block_gate=0)
    pd.testing.assert_frame_equal(w, slow, check_dtype=False)


def test_durbin_watson_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        durbin_watson_daily_revenue)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day = 86_400_000_000
    totals = [1.0, 2.0, 3.0, 4.0]     # monotone ramp -> strong + autocorr
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1] * 4, pa.int64()),
        "o_orderstatus": pa.array(["F"] * 4),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderdate": pa.array([i * day for i in range(4)],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4),
    }), str(d / "orders.parquet"))
    out = durbin_watson_daily_revenue(str(d))
    # cents 100..400, mean 250 -> resid -150,-50,50,150 (scale cancels)
    # num = 3*100^2, den = 2*(150^2+50^2) -> dw = 30000/50000 = 0.6
    assert int(out["n_days"].iloc[0]) == 4
    assert out["dw"].iloc[0] == pytest.approx(0.6)


def test_pettitt_planted_shift(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        pettitt_daily_events)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    base = 1_700_000_000_000_000
    day = 86_400_000_000
    # 4 days of 1 event, then 4 days of 3 events -> change after day 3
    ts = []
    for i in range(8):
        per = 1 if i < 4 else 3
        ts += [base + i * day] * per
    n = len(ts)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), str(d / "events.parquet"))
    out = pettitt_daily_events(str(d))
    assert int(out["n_days"].iloc[0]) == 8
    # max |U| at the true change point: last low day (index 3)
    assert int(out["t_at_max"].iloc[0]) == (base // day) + 3
    assert int(out["k2_stat"].iloc[0]) > 0


def test_dw_pettitt_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        durbin_watson_daily_revenue, pettitt_daily_events)

    for fn in (durbin_watson_daily_revenue, pettitt_daily_events):
        fast = fn(SF_SMOKE).reset_index(drop=True)
        slow = fn(SF_SMOKE, block_gate=0)[fast.columns] \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_centroid_drift_planted(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.features import (
        centroid_drift_embeddings)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    # label 0: even vecs at +[1,0], odd vecs at -[1,0] -> codes +-127
    #          -> centroid drift d2 = (127-(-127))^2 = 64516 on dim 1
    # label 1: identical halves -> d2 = 0
    vecs = [[1.0, 0.5], [-1.0, -0.5], [1.0, 0.5], [-1.0, -0.5],
            [0.5, 1.0], [0.5, 1.0]]
    labels = [0, 0, 0, 0, 1, 1]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(d / "embeddings.parquet"))
    out = centroid_drift_embeddings(str(d)).set_index("label")
    # codes for [1.0,0.5]: floor(1*127/1)=127, floor(.5*127/1)=63
    # for [-1,-0.5]: -127, floor(-63.5) = -64
    assert int(out.loc[0, "d2"]) == (127 - (-127)) ** 2 + (63 - (-64)) ** 2
    assert int(out.loc[1, "d2"]) == 0
    assert int(out.loc[0, "n_even"]) == 2
    assert int(out.loc[0, "n_dims"]) == 2


def test_centroid_drift_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.features import (
        centroid_drift_embeddings)

    fast = centroid_drift_embeddings(SF_SMOKE).reset_index(drop=True)
    slow = centroid_drift_embeddings(SF_SMOKE, block_gate=0)[fast.columns] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) > 0


def test_skyline_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.tpch import skyline_parts

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    # (price, size): A(1.00,5) frontier; B(2.00,5) dominated by A;
    # C(2.00,9) frontier; D(0.50,1) frontier (cheapest);
    # E(1.00,5) exact twin of A -> both survive; F(3.00,9) dominated by C
    rows = [(1, 1.00, 5), (2, 2.00, 5), (3, 2.00, 9),
            (4, 0.50, 1), (5, 1.00, 5), (6, 3.00, 9)]
    k, pr, sz = zip(*rows)
    pq.write_table(pa.table({
        "p_partkey": pa.array(k, pa.int64()),
        "p_name": pa.array([f"p{i}" for i in k]),
        "p_brand": pa.array(["B"] * 6),
        "p_type": pa.array(["T"] * 6),
        "p_size": pa.array(sz, pa.int64()),
        "p_retailprice": pa.array(pr, pa.float64()),
    }), str(d / "part.parquet"))
    out = skyline_parts(str(d))
    assert set(out["p_partkey"]) == {1, 3, 4, 5}


def test_skyline_is_nondominated(ray_session):
    from jsonschema_validator_ray.pipelines.tpch import skyline_parts

    out = skyline_parts(SF_SMOKE)
    assert len(out) >= 1
    # frontier must be strictly increasing in size as price rises,
    # except exact-twin runs (same price AND same size)
    c = out["price_cents"].to_numpy()
    s = out["size"].to_numpy()
    for i in range(1, len(out)):
        assert (s[i] > s[i - 1]) or (s[i] == s[i - 1]
                                     and c[i] == c[i - 1])


def test_lorenz_deciles_invariants(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        lorenz_deciles_customers)

    out = lorenz_deciles_customers(SF_SMOKE)
    assert len(out) == 10
    # cumulative share is nondecreasing, convex-ish, ends at ~1e6
    s = out["cum_share_ppm"].to_numpy()
    assert (np.diff(s) >= 0).all()
    assert 999_990 <= s[-1] <= 1_000_000
    # ascending sort: the poorest decile holds the smallest slice
    cents = out["cents"].to_numpy()
    assert cents[0] <= cents[-1]
