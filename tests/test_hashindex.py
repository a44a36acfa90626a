"""Persisted hash-index incremental dedup: build → probe → update →
compact, checked against a pandas re-computation on real testdata."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from jsonschema_validator_ray.stages.hashindex import (
    compact_hash_index, dedup_exact_incremental, index_size,
    update_hash_index, write_hash_index)

SF_SMOKE = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()


def _expected_survivors(old: pd.DataFrame, new: pd.DataFrame) -> list[int]:
    keep = new.groupby("text", sort=False)["doc_id"].transform("min")
    new = new[new["doc_id"] == keep]
    return sorted(new[~new["text"].isin(set(old["text"]))]["doc_id"])


def test_incremental_dedup_vs_pandas(ray_session, tmp_path):
    docs = _docs()
    old = docs[docs["doc_id"] % 2 == 0]
    new = docs[docs["doc_id"] % 2 == 1]

    idx = str(tmp_path / "idx")
    write_hash_index(ray.data.from_pandas(old), idx, key="doc_id",
                     column="text", num_buckets=16, batch_size=128)
    surv = dedup_exact_incremental(
        ray.data.from_pandas(new), idx, column="text",
        batch_size=128).to_pandas()
    assert sorted(surv["doc_id"]) == _expected_survivors(old, new)
    assert list(surv.columns) == ["doc_id", "text"]


def test_update_then_probe_and_compact(ray_session, tmp_path):
    docs = _docs()
    third = len(docs) // 3
    a, b, c = (docs.iloc[:third], docs.iloc[third:2 * third],
               docs.iloc[2 * third:])

    idx = str(tmp_path / "idx")
    write_hash_index(ray.data.from_pandas(a), idx, key="doc_id",
                     column="text", num_buckets=16, batch_size=128)
    n0 = index_size(idx)
    assert n0 == a["text"].nunique()

    surv_b = dedup_exact_incremental(ray.data.from_pandas(b), idx,
                                     column="text", batch_size=128)
    surv_b_df = surv_b.to_pandas()
    assert sorted(surv_b_df["doc_id"]) == _expected_survivors(a, b)
    update_hash_index(ray.data.from_pandas(surv_b_df), idx, column="text",
                      batch_size=128)
    assert index_size(idx) == n0 + len(surv_b_df)

    # c deduped against a ∪ b (both generations probed)
    seen = pd.concat([a, b])
    surv_c = dedup_exact_incremental(ray.data.from_pandas(c), idx,
                                     column="text", batch_size=128).to_pandas()
    assert sorted(surv_c["doc_id"]) == _expected_survivors(seen, c)

    # compaction changes neither size nor probe results
    compact_hash_index(idx)
    import json
    import os
    assert len(json.load(open(os.path.join(idx, "meta.json")))
               ["generations"]) == 1
    assert index_size(idx) == n0 + len(surv_b_df)
    surv_c2 = dedup_exact_incremental(ray.data.from_pandas(c), idx,
                                      column="text",
                                      batch_size=128).to_pandas()
    assert sorted(surv_c2["doc_id"]) == sorted(surv_c["doc_id"])


def test_reingesting_survivors_yields_nothing(ray_session, tmp_path):
    docs = _docs().head(200)
    idx = str(tmp_path / "idx")
    write_hash_index(ray.data.from_pandas(docs), idx, key="doc_id",
                     column="text", num_buckets=16, batch_size=64)
    again = dedup_exact_incremental(ray.data.from_pandas(docs), idx,
                                    column="text", batch_size=64)
    assert again.count() == 0
