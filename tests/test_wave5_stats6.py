"""Final-round wave 6: integer Holt smoothing (incl. negative-trend
division semantics) and Tukey-fence outlier rates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def test_holt_hand_fixture_with_decline(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import holt_daily_events

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day_us = 86_400_000_000
    # steep ramp then cliff: trend goes negative, exercising the
    # truncating-division parity (day 3 has zero events = calendar fill)
    counts = {0: 2, 1: 10, 2: 20, 4: 1}
    rows = [(dd, i) for dd, c in counts.items() for i in range(c)]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[0] * day_us for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["c"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), str(d / "events.parquet"))
    out = holt_daily_events(str(d))
    assert out["day"].tolist() == [0, 1, 2, 3, 4]
    assert out["c"].tolist() == [2, 10, 20, 0, 1]

    # brute integer reference with truncating halving
    def t2(x):
        return -((-x) // 2) if x < 0 else x // 2

    scale = 1 << 20
    level, trend = 2 * scale, 0
    exp = [(level, trend)]
    for c in (10, 20, 0, 1):
        nl = t2(level + trend + c * scale)
        trend = t2(trend + (nl - level))
        level = nl
        exp.append((level, trend))
    assert out["level_units"].tolist() == [e[0] for e in exp]
    assert out["trend_units"].tolist() == [e[1] for e in exp]
    assert (out["forecast_units"]
            == out["level_units"] + out["trend_units"]).all()
    # the cliff must drive the trend negative (the parity-critical zone)
    assert int(out["trend_units"].iloc[4]) < 0


def test_tukey_fences_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        tukey_fence_outliers_lang)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    # n=7 sorted: 1,2,3,4,5,9,100 -> Q1=2, Q2=4, Q3=9 (doubled 4/18);
    # IQR=7; low fence = 2-10.5 = -8.5 (x4: 5*4-3*18 = -34);
    # high = 9+10.5 = 19.5 (x4: 5*18-3*4 = 78) -> 100 is the one outlier
    vals = [1, 2, 3, 4, 5, 9, 100]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "text": pa.array(["x"] * 7),
        "lang": pa.array(["en"] * 7),
        "source": pa.array(["web"] * 7),
        "n_chars": pa.array(vals, pa.int64()),
    }), str(d / "documents.parquet"))
    out = tukey_fence_outliers_lang(str(d))
    assert int(out["low_fence4"].iloc[0]) == -34
    assert int(out["high_fence4"].iloc[0]) == 78
    assert int(out["n_low"].iloc[0]) == 0
    assert int(out["n_high"].iloc[0]) == 1


def test_wave5_stats6_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        holt_daily_events, tukey_fence_outliers_lang)

    for fn, sort_cols in ((holt_daily_events, ["day"]),
                          (tukey_fence_outliers_lang, ["lang"])):
        gated = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        forced = fn(SF_SMOKE, block_gate=0).sort_values(sort_cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(gated, forced)
