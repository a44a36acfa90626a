"""Join operators: native hash join, explicit bucketed join, as-of join."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def test_hash_join_matches_sql(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import hash_join

    orders = ray.data.read_parquet(f"{SF_SMOKE}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    customer = ray.data.read_parquet(f"{SF_SMOKE}/customer.parquet",
                                     columns=["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, customer, "o_custkey", right_on="c_custkey",
                       num_partitions=2).to_pandas()
    truth = duckdb.connect().execute(f"""
        SELECT count(*) n, count(DISTINCT o_orderkey) d
        FROM '{SF_SMOKE}/orders.parquet' JOIN '{SF_SMOKE}/customer.parquet'
        ON o_custkey = c_custkey
    """).df().iloc[0]
    assert len(joined) == truth["n"]
    assert joined["o_orderkey"].nunique() == truth["d"]
    assert joined["c_mktsegment"].notna().all()


def test_bucketed_join_matches_native(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import bucketed_join, hash_join

    orders = ray.data.read_parquet(f"{SF_SMOKE}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    customer = ray.data.read_parquet(f"{SF_SMOKE}/customer.parquet",
                                     columns=["c_custkey", "c_mktsegment"])
    a = hash_join(orders, customer, "o_custkey", right_on="c_custkey",
                  num_partitions=2) \
        .to_pandas().sort_values(["o_orderkey"]).reset_index(drop=True)
    b = bucketed_join(orders, customer, "o_custkey", right_on="c_custkey",
                      num_buckets=8) \
        .to_pandas().sort_values(["o_orderkey"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["o_orderkey"].to_numpy() == b["o_orderkey"].to_numpy()).all()
    assert (a["c_mktsegment"].to_numpy() == b["c_mktsegment"].to_numpy()).all()


def test_asof_join_semantics(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import asof_join

    base = pd.Timestamp("2024-01-01")
    left = ray.data.from_pandas(pd.DataFrame({
        "k": ["a", "a", "b", "c"],
        "ts": [base + pd.Timedelta(seconds=s) for s in (10, 100, 50, 5)],
        "lval": [1, 2, 3, 4],
    }))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": ["a", "a", "b"],
        "rts": [base + pd.Timedelta(seconds=s) for s in (5, 60, 80)],
        "rval": [10, 20, 30],
    }))
    out = asof_join(left, right, "k", "ts", right_ts="rts").to_pandas()
    by = out.set_index("lval")
    assert by.loc[1, "rval"] == 10      # ts=10 → rts=5
    assert by.loc[2, "rval"] == 20      # ts=100 → rts=60
    assert pd.isna(by.loc[3, "rval"])   # b: rts=80 > ts=50 → no match
    assert pd.isna(by.loc[4, "rval"])   # c: no right rows at all
    assert len(out) == 4


def test_semi_anti_join_strategies_agree(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import anti_join, semi_join

    orders = ray.data.read_parquet(f"{SF_SMOKE}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(f"{SF_SMOKE}/customer.parquet",
                                 columns=["c_custkey"]) \
        .filter(expr="c_custkey <= 50")

    def keyset(ds):
        return set(ds.to_pandas()["o_orderkey"].tolist())

    for fn in (semi_join, anti_join):
        bc = keyset(fn(orders, cust, "o_custkey", right_on="c_custkey",
                       strategy="broadcast"))
        sh = keyset(fn(orders, cust, "o_custkey", right_on="c_custkey",
                       strategy="shuffle", num_buckets=8))
        assert bc == sh and len(bc) > 0
    n = orders.count()
    semi_n = len(keyset(semi_join(orders, cust, "o_custkey",
                                  right_on="c_custkey", strategy="broadcast")))
    anti_n = len(keyset(anti_join(orders, cust, "o_custkey",
                                  right_on="c_custkey", strategy="broadcast")))
    assert semi_n + anti_n == n  # no null custkeys in orders


def test_semi_anti_null_key_semantics(ray_session):
    import pyarrow as pa
    import ray.data

    from jsonschema_validator_ray.stages.joins import anti_join, semi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 4], type=pa.int64()),
        "v": ["a", "b", "c", "d"]}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 4, None], type=pa.int64())}))
    for strat, kw in (("broadcast", {}), ("shuffle", {"num_buckets": 4})):
        s_ds = semi_join(left, right, "k", strategy=strat, **kw)
        a_ds = anti_join(left, right, "k", strategy=strat, **kw)
        # key column stays int64 at the Arrow boundary (pandas shows
        # float64 for nullable ints — that's the converter, not the engine)
        assert str(dict(zip(a_ds.schema().names,
                            a_ds.schema().types))["k"]) == "int64", strat
        s, a = s_ds.to_pandas(), a_ds.to_pandas()
        # null left key: no match → dropped by semi, kept by anti
        assert sorted(s["v"]) == ["b", "d"], strat
        assert sorted(a["v"]) == ["a", "c"], strat


def test_skewed_join_matches_bucketed_on_planted_skew(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.joins import (bucketed_join,
                                                       skewed_join)

    rng = np.random.default_rng(17)
    # one key owns 60% of the left side; right has 1-3 rows per key
    keys = np.r_[np.full(3000, 7), rng.integers(0, 400, size=2000)]
    left = pd.DataFrame({"k": keys, "lv": np.arange(len(keys))})
    rk = np.r_[np.arange(0, 400), np.arange(0, 400, 2), [7, 7]]
    right = pd.DataFrame({"k2": rk, "rv": np.arange(len(rk)) * 10})
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right).repartition(3)

    got = skewed_join(lds, rds, "k", right_on="k2", num_buckets=4,
                      salt=3, hot_threshold=100).to_pandas()
    want = bucketed_join(ray.data.from_pandas(left).repartition(6),
                         ray.data.from_pandas(right).repartition(3),
                         "k", right_on="k2", num_buckets=4).to_pandas()
    key_cols = ["k", "lv", "rv"]
    got = got[key_cols].sort_values(key_cols).reset_index(drop=True)
    want = want[key_cols].sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # the hot key's fan-out really is in the result (3 right rows × the
    # ≥3000 planted hot rows; the random tail may add a few more 7s)
    assert (got["k"] == 7).sum() >= 3000 * 3


def test_skewed_join_fallbacks(ray_session):
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.joins import (bucketed_join,
                                                       skewed_join)

    left = pd.DataFrame({"k": [1, 1, 1, 2, 3], "lv": range(5)})
    right = pd.DataFrame({"k": [1, 2, 2, 4], "rv": range(4)})
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    want = bucketed_join(ray.data.from_pandas(left),
                         ray.data.from_pandas(right), "k",
                         num_buckets=2).to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)

    # (a) nothing hot (threshold too high) → classic path
    a = skewed_join(lds, rds, "k", num_buckets=2,
                    hot_threshold=1000).to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[want.columns], want)

    # (b) hot side too big to broadcast → classic path
    b = skewed_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    "k", num_buckets=2, hot_threshold=2,
                    broadcast_limit=0).to_pandas() \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(b[want.columns], want)


def test_skewed_join_hot_keys_absent_on_right(ray_session):
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.joins import skewed_join

    # the hot key (and everything else) is missing from the right side →
    # empty gather must fall back cleanly, and the result is empty
    left = pd.DataFrame({"k": [9] * 10 + [1], "lv": range(11)})
    right = pd.DataFrame({"k": [2, 3], "rv": [20, 30]})
    out = skewed_join(ray.data.from_pandas(left),
                      ray.data.from_pandas(right), "k",
                      num_buckets=2, hot_threshold=3).to_pandas()
    assert len(out) == 0
