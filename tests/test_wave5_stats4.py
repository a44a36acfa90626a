"""Final-round wave 4: Jarque-Bera composition, within-session type
pairs, spend-decile transition matrix. Hand fixtures with brute/float
references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_jarque_bera_matches_float_reference(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.checks import (
        jarque_bera_quantity_returnflag)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    rng = np.random.RandomState(11)
    q = rng.randint(1, 50, 300).astype(float)
    flags = np.where(np.arange(300) % 2 == 0, "A", "R")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(300), pa.int64()),
        "l_partkey": pa.array([1] * 300, pa.int64()),
        "l_suppkey": pa.array([1] * 300, pa.int64()),
        "l_linenumber": pa.array([1] * 300, pa.int32()),
        "l_quantity": pa.array(q, pa.float64()),
        "l_extendedprice": pa.array(q * 100, pa.float64()),
        "l_discount": pa.array([0.0] * 300, pa.float64()),
        "l_tax": pa.array([0.0] * 300, pa.float64()),
        "l_returnflag": pa.array(flags.tolist()),
        "l_linestatus": pa.array(["O"] * 300),
        "l_shipdate": pa.array([0] * 300, pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    out = jarque_bera_quantity_returnflag(str(d)) \
        .sort_values("l_returnflag").reset_index(drop=True)
    for i, f in enumerate(("A", "R")):
        x = q[flags == f]
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        g1 = ((x - m) ** 3).mean() / m2 ** 1.5
        g2 = ((x - m) ** 4).mean() / m2 ** 2 - 3
        ref = n * (g1 ** 2 / 6 + g2 ** 2 / 24)
        assert out["jb"].iloc[i] == pytest.approx(ref, rel=1e-9)
        assert int(out["n_rows"].iloc[i]) == n


def _events(tmp_path, rows):
    # rows: (user, t_seconds, type)
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), str(d / "events.parquet"))
    return str(d)


def test_session_type_pairs_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        session_type_pairs)

    # user 1, session 1: click+view+buy; >1h gap; session 2: click+view
    # user 2, session 1: click+buy
    rows = [(1, 0, "click"), (1, 10, "view"), (1, 20, "buy"),
            (1, 10000, "click"), (1, 10005, "view"),
            (2, 0, "click"), (2, 5, "buy"), (2, 6, "click")]
    out = session_type_pairs(_events(tmp_path, rows))
    exp = pd.DataFrame({
        "type_a": ["buy", "buy", "click"],
        "type_b": ["click", "view", "view"],
        "support": np.array([2, 1, 2], np.int64)})
    pd.testing.assert_frame_equal(out, exp)


def test_spend_decile_transition_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        spend_decile_transition_customers)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day_us = 86_400_000_000
    # days 0..10, mid = 5: h1 = days <= 5, h2 = days > 5.
    # 4 customers: spends (h1, h2) = (100, 400), (200, 300),
    # (300, 200), (400, 0-no-order)
    rows = [(1, 0, 100.0), (1, 10, 400.0),
            (2, 1, 200.0), (2, 9, 300.0),
            (3, 2, 300.0), (3, 8, 200.0),
            (4, 3, 400.0)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(rows)),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[1] * day_us for r in rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
    }), str(d / "orders.parquet"))
    out = spend_decile_transition_customers(str(d))

    # brute reference with quantile_disc thresholds (ceil(q*n)-1)
    c1 = np.array([10000, 20000, 30000, 40000])
    c2 = np.array([40000, 30000, 20000, 0])

    def dec(v, vals):
        s = np.sort(vals)
        th = [s[max(int(np.ceil(p * len(s))) - 1, 0)]
              for p in [i / 10 for i in range(1, 10)]]
        return 1 + sum(v > t for t in th)

    exp = pd.DataFrame(
        [(dec(a, c1), dec(b, c2)) for a, b in zip(c1, c2)],
        columns=["d1", "d2"]).groupby(["d1", "d2"]).size() \
        .reset_index(name="n_customers")
    exp["d1"] = exp["d1"].astype(np.int64)
    exp["d2"] = exp["d2"].astype(np.int64)
    exp["n_customers"] = exp["n_customers"].astype(np.int64)
    pd.testing.assert_frame_equal(out, exp)
