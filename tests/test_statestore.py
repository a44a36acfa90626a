"""Checkpointed sketch state: incremental column stats across runs must
agree with one-shot ``column_stats`` over the union — exactly for every
monoid statistic (count/null/min/max/mean/HLL/histogram), within t-digest
error for quantiles."""

import json

import numpy as np
import pandas as pd
import pytest
import ray.data

from jsonschema_validator_ray.stages.statestore import (
    finalize_stats, psi_vs_state, state_row_count, update_stats_state,
    write_stats_state)
from jsonschema_validator_ray.stages.stats import column_stats

SF_SMOKE = "/root/testdata/sf0.001"
COLS = ["doc_id", "lang", "n_chars"]


def _docs():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=COLS).to_pandas()


def _split(df):
    return df[df.doc_id % 2 == 0], df[df.doc_id % 2 == 1]


def test_incremental_equals_one_shot(ray_session, tmp_path):
    df = _docs()
    old, new = _split(df)
    path = str(tmp_path / "state")
    write_stats_state(ray.data.from_pandas(old), path, COLS,
                      hist_edges={"n_chars": [0, 100, 500, 2000, 10**9]})
    update_stats_state(ray.data.from_pandas(new), path)
    inc = finalize_stats(path).set_index("column")
    one = (column_stats(ray.data.from_pandas(df), COLS,
                        hist_edges={"n_chars": [0, 100, 500, 2000, 10**9]})
           .to_pandas().set_index("column"))
    assert sorted(inc.index) == sorted(one.index)
    for col in COLS:
        a, b = inc.loc[col], one.loc[col]
        for k in ("cnt", "nulls", "null_rate", "distinct_est"):
            assert a[k] == b[k], (col, k, a[k], b[k])
        for k in ("min_num", "max_num", "mean_num"):
            assert (np.isnan(a[k]) and np.isnan(b[k])) or a[k] == b[k]
        assert a["min_str"] == b["min_str"] and a["max_str"] == b["max_str"]
        if not np.isnan(b["p50"]):
            lo, hi = one.loc[col, "min_num"], one.loc[col, "max_num"]
            for q in ("p50", "p95", "p99"):
                assert abs(a[q] - b[q]) <= 0.05 * (hi - lo) + 1e-9
    # histogram counts are an exact monoid
    assert (json.loads(inc.loc["n_chars", "hist"])["counts"]
            == json.loads(one.loc["n_chars", "hist"])["counts"])


def test_generations_append_and_count(ray_session, tmp_path):
    df = _docs()
    old, new = _split(df)
    path = str(tmp_path / "state")
    write_stats_state(ray.data.from_pandas(old), path, COLS)
    assert state_row_count(path) == len(old)
    update_stats_state(ray.data.from_pandas(new), path)
    update_stats_state(ray.data.from_pandas(new.head(7)), path)
    meta = json.loads((tmp_path / "state" / "meta.json").read_text())
    assert meta["generations"] == ["gen-000000", "gen-000001", "gen-000002"]
    assert state_row_count(path) == len(old) + len(new) + 7


def test_psi_vs_state(ray_session, tmp_path):
    df = _docs()
    old, new = _split(df)
    path = str(tmp_path / "state")
    edges = {"n_chars": [0, 100, 500, 2000, 10**9]}
    cats = {"lang": sorted(df["lang"].unique())}
    write_stats_state(ray.data.from_pandas(old), path, COLS,
                      hist_edges=edges, hist_categories=cats)
    # same-distribution halves drift very little
    assert psi_vs_state(ray.data.from_pandas(new), path, "n_chars") < 0.1
    # a shifted copy drifts a lot
    shifted = new.assign(n_chars=new.n_chars + 1900)
    assert psi_vs_state(ray.data.from_pandas(shifted), path, "n_chars") > 0.5
    assert psi_vs_state(ray.data.from_pandas(new), path, "lang") < 0.1
    with pytest.raises(ValueError):
        psi_vs_state(ray.data.from_pandas(new), path, "doc_id")
