"""Windowing operators over the events log (tumbling / sliding / session)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF_SMOKE}/events.parquet",
                                 columns=["event_type", "ts", "value"])


def test_tumbling_matches_sql(ray_session, events):
    from jsonschema_validator_ray.stages.windows import tumbling

    ours = tumbling(events, "event_type", "ts", 3600).to_pandas() \
        .sort_values(["event_type", "window_start"]).reset_index(drop=True)
    theirs = duckdb.connect().execute(f"""
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               count(*) AS n_events
        FROM '{SF_SMOKE}/events.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert len(ours) == len(theirs)
    assert (ours["n_events"].to_numpy() == theirs["n_events"].to_numpy()).all()
    assert (ours["window_start"].astype("datetime64[us]").to_numpy()
            == theirs["window_start"].astype("datetime64[us]").to_numpy()).all()


def test_sliding_contains_tumbling_and_overlaps(ray_session, events):
    from jsonschema_validator_ray.stages.windows import sliding, tumbling

    slid = sliding(events, "event_type", "ts", size_s=7200, step_s=3600) \
        .to_pandas()
    tumb = tumbling(events, "event_type", "ts", 3600).to_pandas()
    # each sliding 2h window's count = the sum of its two 1h tumbling bins
    t_idx = tumb.set_index(["event_type", "window_start"])["n_events"]
    sample = slid.sample(50, random_state=1) if len(slid) > 50 else slid
    for _, row in sample.iterrows():
        w0 = row["window_start"]
        expect = 0
        for off in (0, 3600):
            key = (row["event_type"], w0 + pd.Timedelta(seconds=off))
            expect += int(t_idx.get(key, 0))
        assert row["n_events"] == expect, row


def test_sessionize(ray_session):
    import ray.data

    rows = []
    base = pd.Timestamp("2024-01-01")
    # user A: two sessions (gap > 300s between event 2 and 3)
    for off in (0, 100, 200, 1000, 1100):
        rows.append({"user": "A", "ts": base + pd.Timedelta(seconds=off)})
    # user B: one long session (all gaps 200s)
    for off in range(0, 1000, 200):
        rows.append({"user": "B", "ts": base + pd.Timedelta(seconds=off)})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    from jsonschema_validator_ray.stages.windows import sessionize

    out = sessionize(ds, "user", "ts", gap_s=300).to_pandas() \
        .sort_values(["user", "session_start"]).reset_index(drop=True)
    a = out[out["user"] == "A"]
    b = out[out["user"] == "B"]
    assert len(a) == 2 and list(a["n_events"]) == [3, 2]
    assert len(b) == 1 and b["n_events"].iloc[0] == 5
    assert a["session_end"].iloc[0] == base + pd.Timedelta(seconds=200)
