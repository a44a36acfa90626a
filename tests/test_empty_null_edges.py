"""Regression tests for the round-3 robustness review batch: empty/all-null
inputs and NaN/NaT propagation through the wide-op stages.

Each test pins one reviewed failure mode:
- windows: NaT timestamps crashed tumbling/sliding and silently corrupted
  rolling/sessionize buckets (min-int64 through the int64 view); NaN values
  poisoned the rolling prefix sum.
- joins/referential: an empty (null-typed) broadcast value set raised
  ArrowTypeError inside pc.is_in instead of the set-semantics result.
- similarity/ivf: zero emitted partials lose their schema through
  to_pandas (CLAUDE.md) and crashed the final merge sort.
- bucketed_join / asof / range: padded-union float64 upcast leaked into the
  output schema; empty-right buckets emitted object-dtype null columns.
- stats/statestore: a single NaN poisoned min/max/sum/mean and the t-digest
  for the whole column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df: pd.DataFrame):
    import ray.data

    return ray.data.from_pandas(df)


# ---------------------------------------------------------------- windows

def test_windows_drop_null_ts(ray_session):
    from jsonschema_validator_ray.stages.windows import (rolling, sessionize,
                                                         tumbling)

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:30", None,
         "2024-01-01 00:02:00"])
    df = pd.DataFrame({"k": ["a"] * 4, "ts": ts,
                       "id": [1, 2, 3, 4],
                       "value": [1.0, 2.0, 3.0, 4.0]})

    tum = tumbling(_ds(df), "k", "ts", 60, num_buckets=4).to_pandas()
    # the NaT row is excluded; 3 valid rows in 2 one-minute bins
    assert int(tum["n_events"].sum()) == 3

    ses = sessionize(_ds(df), "k", "ts", gap_s=60, num_buckets=4).to_pandas()
    assert int(ses["n_events"].sum()) == 3
    # NaT never unsorted the bucket: the 0s/30s rows share a session
    assert len(ses) == 2

    rol = rolling(_ds(df), "k", "ts", "id", 60, value="value",
                  num_buckets=4).to_pandas()
    assert set(rol["id"]) == {1, 2, 4}
    assert (rol["w_count"] >= 1).all()


def test_rolling_nan_value_contributes_zero(ray_session):
    from jsonschema_validator_ray.stages.windows import rolling

    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:10",
                         "2024-01-01 00:00:20"])
    df = pd.DataFrame({"k": ["a"] * 3, "ts": ts, "id": [1, 2, 3],
                       "value": [1.0, np.nan, 3.0]})
    out = rolling(_ds(df), "k", "ts", "id", 3600, value="value",
                  num_buckets=2).to_pandas().set_index("id")
    # SQL SUM skips NULL: NaN row adds 0 cents but still counts as a row
    assert out.loc[3, "w_count"] == 3
    assert out.loc[3, "w_cents"] == 400
    assert out.loc[2, "w_cents"] == 100


# ---------------------------------------------------- joins / referential

def test_semi_anti_join_empty_right(ray_session):
    from jsonschema_validator_ray.stages.joins import anti_join, semi_join

    left = _ds(pd.DataFrame({"k": ["a", "b", None], "v": [1, 2, 3]}))
    empty = _ds(pd.DataFrame({"k": pd.Series([], dtype=object)}))

    kept = anti_join(left, empty, on="k").to_pandas()
    assert len(kept) == 3          # NOT EXISTS vs empty set keeps all
    dropped = semi_join(left, empty, on="k").to_pandas()
    assert len(dropped) == 0       # EXISTS vs empty set drops all


def test_fk_violations_empty_dimension(ray_session):
    from jsonschema_validator_ray.stages.referential import (
        fk_violations, fk_violations_bloom)

    fact = _ds(pd.DataFrame({"id": [1, 2, 3],
                             "fk": pd.array([10, None, 30],
                                            dtype="Int64")}))
    dim = _ds(pd.DataFrame({"k": pd.Series([], dtype="int64")}))

    v = fk_violations(fact, "id", "fk", dim, "k").to_pandas()
    assert sorted(v["id"]) == [1, 3]    # every non-null fk violates

    vb = fk_violations_bloom(fact, "id", "fk", dim, "k",
                             expected_keys=100).to_pandas()
    assert sorted(vb["id"]) == [1, 3]   # all-zeros bloom flags everything


# ------------------------------------------------------- similarity / ivf

def test_topk_cosine_empty_corpus(ray_session):
    from jsonschema_validator_ray.stages.similarity import (topk_cosine,
                                                            topk_cosine_lsh)

    df = pd.DataFrame({"vec_id": ["a"],
                       "embedding": [np.ones(4, dtype=np.float32)]})
    import ray.data
    empty = ray.data.from_pandas(df).filter(lambda r: False)

    out = topk_cosine(empty, np.ones((1, 4), dtype=np.float32), 3)
    assert list(out.columns) == ["query_id", "vec_id", "score"]
    assert len(out) == 0

    out2 = topk_cosine_lsh(empty, np.ones((1, 4), dtype=np.float32), 3)
    assert len(out2) == 0


def test_topk_cosine_ivf_no_probed_rows(ray_session):
    from jsonschema_validator_ray.stages.ivf import IvfIndex, topk_cosine_ivf

    # every corpus row sits in cluster 0; the query probes only cluster 1
    # → zero partials emitted → the empty frame must come back typed
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 3)).astype(np.float32)
    vecs[:, 0] = np.abs(vecs[:, 0]) + 5.0
    df = pd.DataFrame({"vec_id": [f"v{i}" for i in range(20)],
                       "embedding": list(vecs)})
    index = IvfIndex(np.array([[1, 0, 0], [-1, 0, 0]], dtype=np.float32))
    out = topk_cosine_ivf(_ds(df), index,
                          np.array([[-1.0, 0, 0]], dtype=np.float32),
                          k=3, nprobe=1)
    assert list(out.columns) == ["query_id", "vec_id", "score"]
    assert len(out) == 0


# -------------------------------------------------------- join schemas

def test_bucketed_join_preserves_int_dtypes(ray_session):
    from jsonschema_validator_ray.stages.joins import bucketed_join

    left = _ds(pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    right = _ds(pd.DataFrame({"k": [2, 3, 4], "rv": [200, 300, 400]}))
    out = bucketed_join(left, right, on="k", num_buckets=4)
    sch = dict(zip(out.schema().names, out.schema().types))
    assert sch["k"] == pa.int64()
    assert sch["lv"] == pa.int64()
    assert sch["rv"] == pa.int64()
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [2, 3]
    assert got["rv"].tolist() == [200, 300]


def test_asof_join_empty_right_bucket_schema(ray_session):
    """Buckets whose right side is empty must emit typed padded nulls, not
    object-dtype None columns (which poison Ray's schema unification when
    other buckets DID match)."""
    from jsonschema_validator_ray.stages.joins import asof_join

    ts = pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:05"])
    left = _ds(pd.DataFrame({"k": ["a", "b"], "ts": ts, "lid": [1, 2]}))
    right = _ds(pd.DataFrame({
        "k": ["a"], "rts": pd.to_datetime(["2024-01-01 00:00:00"]),
        "rv": [7]}))
    out = asof_join(left, right, "k", "ts", right_ts="rts",
                    num_buckets=8).to_pandas().set_index("k")
    assert out.loc["a", "rv"] == 7
    assert pd.isna(out.loc["b", "rv"])
    # the unmatched bucket's rv column is numeric, not object
    assert out["rv"].dtype != object


def test_range_join_empty_right_bucket_schema(ray_session):
    from jsonschema_validator_ray.stages.joins import range_join

    ts = pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:05"])
    left = _ds(pd.DataFrame({"k": ["a", "b"], "ts": ts, "lid": [1, 2]}))
    right = _ds(pd.DataFrame({
        "k": ["a"],
        "start": pd.to_datetime(["2024-01-01 00:00:00"]),
        "end": pd.to_datetime(["2024-01-01 00:01:00"]),
        "rv": [7]}))
    out = range_join(left, right, "k", "ts", start="start", end="end",
                     how="left", num_buckets=8).to_pandas().set_index("k")
    assert out.loc["a", "rv"] == 7
    assert pd.isna(out.loc["b", "rv"])
    assert out["rv"].dtype != object


# ------------------------------------------------------------------ stats

def test_stats_nan_treated_as_missing(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.stats import profile

    # build via Arrow: from_pandas would convert NaN → null, hiding the bug
    t = pa.table({"x": pa.array([1.0, float("nan"), 3.0, float("nan"), 5.0],
                                type=pa.float64())})
    assert t.column("x").null_count == 0
    row = profile(ray.data.from_arrow(t)).iloc[0]
    assert row["min_num"] == 1.0
    assert row["max_num"] == 5.0
    assert row["mean_num"] == 3.0           # 9 / 3, NaNs excluded
    assert row["nulls"] == 0                # NaN is not a true null
    assert np.isfinite(row["p50"])


def test_statestore_nan_incremental_matches_oneshot(ray_session, tmp_path):
    from jsonschema_validator_ray.stages.stats import profile
    from jsonschema_validator_ray.stages.statestore import (
        finalize_stats, update_stats_state, write_stats_state)

    import ray.data

    nan = float("nan")
    a = pa.table({"x": pa.array([1.0, nan, 3.0], type=pa.float64())})
    b = pa.table({"x": pa.array([nan, 5.0], type=pa.float64())})

    path = str(tmp_path / "state")
    write_stats_state(ray.data.from_arrow(a), path)
    update_stats_state(ray.data.from_arrow(b), path)
    inc = finalize_stats(path).set_index("column")

    one = profile(ray.data.from_arrow(pa.concat_tables([a, b]))) \
        .set_index("column")
    for col in ("cnt", "nulls", "min_num", "max_num", "mean_num"):
        assert inc.loc["x", col] == one.loc["x", col], col
