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
