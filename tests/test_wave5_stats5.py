"""Final-round wave 5: Kaplan-Meier right-censored survival and max
drawdown. Hand fixtures against brute references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events(tmp_path, rows):
    # rows: (user, day, type)
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day_us = 86_400_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] * day_us for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), str(d / "events.parquet"))
    return str(d)


def test_kaplan_meier_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        kaplan_meier_users)

    # corpus end = day 30.
    # user 1: days 0..10  -> t=10, last=10, end-last=20 > 7  -> event
    # user 2: days 0..5   -> t=5,  last=5,  25 > 7           -> event
    # user 3: days 20..30 -> t=10, last=30, 0 <= 7           -> censored
    # user 4: days 25..28 -> t=3,  last=28, 2 <= 7           -> censored
    # user 5: day 12 only -> t=0,  last=12, 18 > 7           -> event
    rows = ([(1, 0, "c"), (1, 10, "c"), (2, 0, "c"), (2, 5, "c"),
             (3, 20, "c"), (3, 30, "c"), (4, 25, "c"), (4, 28, "c"),
             (5, 12, "c")])
    out = kaplan_meier_users(_events(tmp_path, rows))
    # steps: t=0 (1 event), t=3 (1 censored), t=5 (1 event),
    #        t=10 (1 event + 1 censored)
    assert out["t"].tolist() == [0, 3, 5, 10]
    assert out["n_risk"].tolist() == [5, 4, 3, 2]
    assert out["d_events"].tolist() == [1, 0, 1, 1]
    assert out["c_censored"].tolist() == [0, 1, 0, 1]
    km = [(1 - 1 / 5), (1 - 1 / 5), (1 - 1 / 5) * (1 - 1 / 3),
          (1 - 1 / 5) * (1 - 1 / 3) * (1 - 1 / 2)]
    assert out["km"].tolist() == pytest.approx(km, rel=1e-12)


def test_max_drawdown_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        max_drawdown_daily_revenue)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day_us = 86_400_000_000
    days = [0, 1, 2, 3, 4, 5]
    totals = [100.0, 500.0, 300.0, 50.0, 400.0, 450.0]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(6), pa.int64()),
        "o_custkey": pa.array([1] * 6, pa.int64()),
        "o_orderstatus": pa.array(["F"] * 6),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderdate": pa.array([dd * day_us for dd in days],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 6),
    }), str(d / "orders.parquet"))
    out = max_drawdown_daily_revenue(str(d))
    # peak 500 on day 1, trough 50 on day 3: drawdown 45000 cents
    assert int(out["n_days"].iloc[0]) == 6
    assert int(out["peak_day"].iloc[0]) == 1
    assert int(out["trough_day"].iloc[0]) == 3
    assert int(out["max_drawdown"].iloc[0]) == 45000


def test_max_drawdown_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        max_drawdown_daily_revenue)
    from tests.conftest import SF_SMOKE

    gated = max_drawdown_daily_revenue(SF_SMOKE)
    forced = max_drawdown_daily_revenue(SF_SMOKE, block_gate=0)
    pd.testing.assert_frame_equal(gated, forced)
