"""Final-round wave 10: log-rank two-cohort survival test and the von
Neumann successive-difference ratio."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def test_logrank_matches_brute(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        logrank_first_touch_users)

    # users: (first_day, last_day); cohort 1 = first mod 7 >= 5.
    # corpus end = 40 -> event iff 40 - last > 7
    users = [(0, 10), (1, 35), (5, 15), (6, 6), (12, 20), (19, 40)]
    day_us = 86_400_000_000
    rows = []
    eid = 0
    for u, (f, l) in enumerate(users):
        for dd in (f, l):
            rows.append((eid, u, dd)); eid += 1
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] * day_us for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["c"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), str(d / "events.parquet"))
    out = logrank_first_touch_users(_sf := str(d))

    # brute reference
    recs = [(l - f, int(f % 7 >= 5), int(40 - l > 7)) for f, l in users]
    ts = sorted({t for t, _, _ in recs})
    o1 = 0
    e1 = v = 0.0
    n_steps = 0
    for t in ts:
        d1 = sum(1 for tt, g, e in recs if tt == t and g and e)
        d0 = sum(1 for tt, g, e in recs if tt == t and not g and e)
        n1 = sum(1 for tt, g, _ in recs if tt >= t and g)
        n2 = sum(1 for tt, g, _ in recs if tt >= t and not g)
        dt, nt = d1 + d0, n1 + n2
        if dt == 0:
            continue
        n_steps += 1
        o1 += d1
        e1 += n1 * dt / nt
        if nt > 1:
            v += n1 * n2 * dt * (nt - dt) / (nt * nt * (nt - 1))
    assert int(out["n_steps"].iloc[0]) == n_steps
    assert int(out["o1"].iloc[0]) == o1
    assert out["e1"].iloc[0] == pytest.approx(e1, rel=1e-12)
    assert out["v"].iloc[0] == pytest.approx(v, rel=1e-12)
    assert out["z"].iloc[0] == pytest.approx((o1 - e1) / np.sqrt(v),
                                             rel=1e-12)


def test_von_neumann_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        von_neumann_daily_revenue)

    day_us = 86_400_000_000
    days = [0, 1, 2, 3]
    totals = [100.0, 200.0, 150.0, 400.0]
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1] * 4, pa.int64()),
        "o_orderstatus": pa.array(["F"] * 4),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderdate": pa.array([dd * day_us for dd in days],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4),
    }), str(d / "orders.parquet"))
    out = von_neumann_daily_revenue(str(d))
    c = np.array([10000, 20000, 15000, 40000], float)
    d2 = float((np.diff(c) ** 2).sum())
    n = 4
    var_num = n * (c ** 2).sum() - c.sum() ** 2
    ref = n * n * d2 / ((n - 1) * var_num)
    assert int(out["n_days"].iloc[0]) == 4
    assert out["vn"].iloc[0] == pytest.approx(ref, rel=1e-12)


def test_von_neumann_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        von_neumann_daily_revenue)

    gated = von_neumann_daily_revenue(SF_SMOKE)
    forced = von_neumann_daily_revenue(SF_SMOKE, block_gate=0)
    pd.testing.assert_frame_equal(gated, forced)
