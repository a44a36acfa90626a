"""Final-round wave 9: L-moments and Tukey median polish."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def test_lmoments_matches_brute(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        lmoments_chars_langs)

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(vals)), pa.int64()),
        "text": pa.array(["x"] * len(vals)),
        "lang": pa.array(["en"] * len(vals)),
        "source": pa.array(["web"] * len(vals)),
        "n_chars": pa.array(vals, pa.int64()),
    }), str(d / "documents.parquet"))
    out = lmoments_chars_langs(str(d))

    x = np.sort(np.array(vals, float))
    n = len(x)
    i = np.arange(1, n + 1)
    b0 = x.mean()
    b1 = ((i - 1) * x).sum() / (n * (n - 1))
    b2 = ((i - 1) * (i - 2) * x).sum() / (n * (n - 1) * (n - 2))
    l1, l2, l3 = b0, 2 * b1 - b0, 6 * b2 - 6 * b1 + b0
    assert int(out["n"].iloc[0]) == n
    assert out["l_cv"].iloc[0] == pytest.approx(l2 / l1, rel=1e-12)
    assert out["l_skew"].iloc[0] == pytest.approx(l3 / l2, rel=1e-12)


def test_median_polish_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        median_polish_weekday_hour)

    # events on two (dow, hour) cells; everything else zero
    day_us = 86_400_000_000
    hr_us = 3_600_000_000
    rows = []
    eid = 0
    # day 4 (epoch day 4 -> dow 4) hour 10: 12 events;
    # day 8 (dow 1) hour 3: 5 events
    for _ in range(12):
        rows.append((eid, 4 * day_us + 10 * hr_us)); eid += 1
    for _ in range(5):
        rows.append((eid, 8 * day_us + 3 * hr_us)); eid += 1
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["c"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }), str(d / "events.parquet"))
    out = median_polish_weekday_hour(str(d))
    assert len(out) == 168
    assert int(out.set_index(["dow", "hour"]).loc[(4, 10), "c"]) == 12
    assert int(out.set_index(["dow", "hour"]).loc[(1, 3), "c"]) == 5

    # brute reference: same polish in numpy with quantile_disc medians
    grid = np.zeros((7, 24), dtype=np.int64)
    grid[4, 10] = 12
    grid[1, 3] = 5
    resid = grid.copy()

    def med(v):
        s = np.sort(v)
        return int(s[-(-len(s) // 2) - 1])

    for _ in range(2):
        for i in range(7):
            resid[i, :] -= med(resid[i, :])
        for j in range(24):
            resid[:, j] -= med(resid[:, j])
    got = out.set_index(["dow", "hour"])["residual"]
    for i in range(7):
        for j in range(24):
            assert int(got.loc[(i, j)]) == int(resid[i, j])


def test_wave5_stats9_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        median_polish_weekday_hour)
    from jsonschema_validator_ray.pipelines.anomaly import (
        lmoments_chars_langs)

    for fn, sort_cols in ((lmoments_chars_langs, ["lang"]),
                          (median_polish_weekday_hour, ["dow", "hour"])):
        gated = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        forced = fn(SF_SMOKE, block_gate=0).sort_values(sort_cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(gated, forced)
