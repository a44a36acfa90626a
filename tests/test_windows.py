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


def test_sequence_ranks_and_gaps(ray_session):
    """row_number + lag gap vs a pandas reference, duplicate timestamps
    broken by id, singleton keys get gap -1."""
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.windows import sequence

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 300, n),
        # coarse grid => plenty of exact-duplicate timestamps per user
        "ts": pd.to_datetime(rng.integers(0, 500, n) * 1_000_000, unit="us"),
    })
    got = (sequence(ray.data.from_pandas(df).repartition(6),
                    "user_id", "ts", "event_id", num_buckets=8)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    ref = df.sort_values(["user_id", "ts", "event_id"],
                         kind="mergesort").copy()
    ref["seq"] = ref.groupby("user_id", sort=False).cumcount() + 1
    t = ref["ts"].astype("datetime64[us]").astype("int64")
    gap = t.diff()
    newk = ref["user_id"] != ref["user_id"].shift()
    gap[newk] = -1
    ref["gap_us"] = gap.astype("int64")
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (got["seq"].to_numpy() == ref["seq"].to_numpy()).all()
    assert (got["gap_us"].to_numpy() == ref["gap_us"].to_numpy()).all()
    assert (got["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()


def test_rolling_range_frame(ray_session):
    """Trailing time-range count/sum vs a brute-force reference; duplicate
    timestamps are peers (all included), frame inclusive at t-W."""
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.windows import rolling

    rng = np.random.default_rng(23)
    n = 2500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 60, n),
        "ts": pd.to_datetime(rng.integers(0, 3600, n) * 1_000_000,
                             unit="us"),
        "value": rng.uniform(0, 50, n).round(2),
    })
    W = 300
    got = (rolling(ray.data.from_pandas(df).repartition(5),
                   "user_id", "ts", "event_id", W, value="value",
                   num_buckets=8)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    t = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    cents = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
    for i in rng.integers(0, n, 200):   # spot-check brute force
        m = ((df["user_id"].to_numpy() == df.loc[i, "user_id"]) &
             (t >= t[i] - W * 1_000_000) & (t <= t[i]))
        assert got.loc[i, "w_count"] == int(m.sum())
        assert got.loc[i, "w_cents"] == int(cents[m].sum())


def test_funnel_ordered_matching(ray_session):
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.funnel import funnel, funnel_depths

    rows = []

    def ev(u, t, e):
        rows.append({"user_id": u, "ts": t, "event_type": e})

    # u1: full ordered funnel
    ev(1, 10, "view"); ev(1, 20, "click"); ev(1, 30, "purchase")
    # u2: purchase BEFORE click -> stops at depth 2
    ev(2, 10, "view"); ev(2, 30, "click"); ev(2, 20, "purchase")
    # u3: only view
    ev(3, 5, "view")
    # u4: click/purchase but never viewed -> depth 0 (absent)
    ev(4, 1, "click"); ev(4, 2, "purchase")
    # u5: same-ts click as view -> strict 'after' excludes it
    ev(5, 10, "view"); ev(5, 10, "click"); ev(5, 40, "click")
    ev(5, 39, "purchase")
    # noise
    ev(1, 15, "error"); ev(2, 11, "signup")

    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    steps = ["view", "click", "purchase"]
    depths = funnel_depths(ds, "user_id", "ts", "event_type", steps,
                           num_buckets=4).to_pandas() \
        .set_index("user_id")["depth"].to_dict()
    assert depths == {1: 3, 2: 2, 3: 1, 5: 2}
    f = funnel(ds, "user_id", "ts", "event_type", steps, num_buckets=4)
    assert f["n_users"].tolist() == [4, 3, 1]   # reached step 1/2/3

    # first-eligible-occurrence: u5's click matched at ts=40, so its
    # purchase at 39 can't follow it
    t_last = funnel_depths(ds, "user_id", "ts", "event_type", steps,
                           num_buckets=4).to_pandas() \
        .set_index("user_id")["t_last"].to_dict()
    assert t_last[5] == 40 and t_last[1] == 30


def test_cumulative_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.windows import cumulative

    rng = np.random.default_rng(9)
    n = 4000
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "uid": rng.integers(0, 60, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })
    got = (cumulative(ray.data.from_pandas(df).repartition(5),
                      "uid", "ts", "eid", "value", num_buckets=8)
           .to_pandas().sort_values("eid").reset_index(drop=True))
    sf = df.sort_values(["uid", "ts", "eid"], kind="mergesort").copy()
    # floor, matching cumulative()'s contract (and DuckDB floor()) — rint's
    # half-to-even would diverge from the SQL oracle on exact .5 cents
    cents = np.floor(sf["value"].to_numpy() * 100).astype(np.int64)
    sf["run_cents"] = pd.Series(cents, index=sf.index).groupby(
        sf["uid"]).cumsum()
    sf["run_count"] = sf.groupby("uid").cumcount() + 1
    want = sf.sort_values("eid").reset_index(drop=True)
    assert list(got["run_count"]) == list(want["run_count"])
    assert list(got["run_cents"]) == list(want["run_cents"])


def test_sessionize_assign_matches_unfused(ray_session):
    """Fused sessionize-and-assign == sessionize → range_join back onto
    the same events (the decomposition it replaces), incl. null-ts rows
    (dropped by both paths) and gap boundary ties."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from jsonschema_validator_ray.stages.joins import range_join
    from jsonschema_validator_ray.stages.windows import (sessionize,
                                                         sessionize_assign)

    rng = np.random.default_rng(17)
    n = 3000
    ts = pd.to_datetime(rng.integers(0, 500_000, n), unit="s")
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "uid": rng.integers(0, 40, n),
        "ts": ts,
    })
    # exact gap boundary: two events exactly gap_s apart stay in-session
    df.loc[1, ["uid", "ts"]] = [999, pd.Timestamp("2020-01-01 00:00:00")]
    df.loc[2, ["uid", "ts"]] = [999, pd.Timestamp("2020-01-01 01:00:00")]
    df.loc[3, ["uid", "ts"]] = [999, pd.Timestamp("2020-01-01 02:00:01")]
    ev = ray.data.from_pandas(df).repartition(5)

    fused = (sessionize_assign(ev, "uid", "ts", "eid", gap_s=3600,
                               num_buckets=8)
             .to_pandas().sort_values("eid").reset_index(drop=True))

    sess = sessionize(ev.select_columns(["uid", "ts"]), "uid", "ts",
                      gap_s=3600, num_buckets=8)

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"uid": b.column("uid"),
                         "session_start": b.column("session_start"),
                         "session_end": b.column("session_end")})

    joined = range_join(ev, sess.map_batches(slim, batch_format="pyarrow"),
                        "uid", "ts", start="session_start",
                        end="session_end", num_buckets=8)
    want = (joined.to_pandas()[["eid", "uid", "session_start"]]
            .astype({"eid": "int64", "uid": "int64"})
            .sort_values("eid").reset_index(drop=True))
    got = fused[["eid", "uid", "session_start"]].astype(
        {"eid": "int64", "uid": "int64"})
    got["session_start"] = got["session_start"].astype(
        want["session_start"].dtype)
    pd.testing.assert_frame_equal(got, want)
    # boundary: the 1h-gap pair shares a session, the 1h+1s one does not
    u999 = got[got["uid"] == 999].sort_values("eid")
    assert u999["session_start"].iloc[0] == u999["session_start"].iloc[1]
    assert u999["session_start"].iloc[2] != u999["session_start"].iloc[1]
