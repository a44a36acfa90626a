"""Final-round wave 8: Cohen's d / Hedges' g, Matthews correlation of
the quality gates, Page's L trend test."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def test_cohens_d_matches_float_reference(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        cohens_d_chars_langs)

    ga = [10, 12, 12, 15, 40, 7, 22]
    gb = [12, 18, 20, 22, 30]
    langs = ["en"] * len(ga) + ["de"] * len(gb)
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "text": pa.array(["x"] * len(langs)),
        "lang": pa.array(langs),
        "source": pa.array(["web"] * len(langs)),
        "n_chars": pa.array(ga + gb, pa.int64()),
    }), str(d / "documents.parquet"))
    out = cohens_d_chars_langs(str(d))
    xa, xb = np.array(ga, float), np.array(gb, float)
    sp = np.sqrt(((len(xa) - 1) * xa.var(ddof=1)
                  + (len(xb) - 1) * xb.var(ddof=1))
                 / (len(xa) + len(xb) - 2))
    ref = (xa.mean() - xb.mean()) / sp
    assert out["cohens_d"].iloc[0] == pytest.approx(ref, rel=1e-12)
    gref = ref * (1 - 3 / (4 * (len(xa) + len(xb)) - 9))
    assert out["hedges_g"].iloc[0] == pytest.approx(gref, rel=1e-12)


def test_mcc_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import mcc_gates_documents

    # gates: length >= 300, periods >= 3
    texts = ["..." , "....", ".", ".....", ".."]
    chars = [400, 200, 350, 500, 100]
    # (g1,g2): (1,1) (0,1) (1,0) (1,1) (0,0) -> a=2 b=1 c=1 d=1
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["web"] * 5),
        "n_chars": pa.array(chars, pa.int64()),
    }), str(d / "documents.parquet"))
    out = mcc_gates_documents(str(d))
    assert (int(out["n_both"].iloc[0]), int(out["n_only_len"].iloc[0]),
            int(out["n_only_sent"].iloc[0]),
            int(out["n_neither"].iloc[0])) == (2, 1, 1, 1)
    ref = (2 * 1 - 1 * 1) / np.sqrt(3 * 3 * 2 * 2)
    assert out["mcc"].iloc[0] == pytest.approx(ref, rel=1e-12)


def test_page_trend_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        page_trend_event_types)

    # 3 days, 3 types with a PERFECT consistent ordering a < b < c:
    # ranks are (1,2,3) every day -> L = 3*(1+4+9) = 42, L2 = 84
    day_us = 86_400_000_000
    rows = []
    eid = 0
    for day in range(3):
        for ty, cnt in (("a", 1), ("b", 2), ("c", 3)):
            for _ in range(cnt):
                rows.append((eid, day, ty))
                eid += 1
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * day_us for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), str(d / "events.parquet"))
    out = page_trend_event_types(str(d))
    assert int(out["n_days"].iloc[0]) == 3
    assert int(out["k_types"].iloc[0]) == 3
    assert int(out["l2"].iloc[0]) == 84
    n, k, L = 3, 3, 42.0
    e = n * k * (k + 1) ** 2 / 4
    v = n * k ** 2 * (k + 1) * (k ** 2 - 1) / 144
    assert out["z"].iloc[0] == pytest.approx((L - e) / np.sqrt(v),
                                             rel=1e-12)


def test_wave5_stats8_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        page_trend_event_types)
    from jsonschema_validator_ray.pipelines.anomaly import (
        cohens_d_chars_langs)
    from jsonschema_validator_ray.pipelines.dq import mcc_gates_documents

    for fn in (cohens_d_chars_langs, mcc_gates_documents,
               page_trend_event_types):
        gated = fn(SF_SMOKE).reset_index(drop=True)
        forced = fn(SF_SMOKE, block_gate=0).reset_index(drop=True)
        pd.testing.assert_frame_equal(gated, forced)
