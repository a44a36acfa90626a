"""Persisted vocabulary store: incremental counts ≡ one-shot refit,
generational update/compaction."""

import numpy as np
import pandas as pd
import ray.data

from jsonschema_validator_ray.stages.vocab import vocab_topk
from jsonschema_validator_ray.stages.vocabstore import (
    compact_vocab_store, update_vocab_store, vocab_topk_from_store,
    write_vocab_store)

SF_SMOKE = "/root/testdata/sf0.001"


def _docs():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_SMOKE}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()


def test_incremental_equals_one_shot(ray_session, tmp_path):
    df = _docs()
    old, new = df[df.doc_id % 2 == 0], df[df.doc_id % 2 == 1]
    path = str(tmp_path / "vstore")
    write_vocab_store(ray.data.from_pandas(old), path, column="text",
                      num_buckets=16)
    update_vocab_store(ray.data.from_pandas(new), path)
    inc = vocab_topk_from_store(path, 50)
    one = vocab_topk(ray.data.from_pandas(df), "text", 50)
    pd.testing.assert_frame_equal(inc, one)


def test_compaction_preserves_counts(ray_session, tmp_path):
    df = _docs()
    path = str(tmp_path / "vstore")
    write_vocab_store(ray.data.from_pandas(df.iloc[:200]), path,
                      column="text", num_buckets=16)
    update_vocab_store(ray.data.from_pandas(df.iloc[200:350]), path)
    update_vocab_store(ray.data.from_pandas(df.iloc[350:]), path)
    before = vocab_topk_from_store(path, 100)
    compact_vocab_store(path)
    import json
    meta = json.loads((tmp_path / "vstore" / "meta.json").read_text())
    assert len(meta["generations"]) == 1
    after = vocab_topk_from_store(path, 100)
    pd.testing.assert_frame_equal(before, after)


def test_crashed_update_retry_is_clean(ray_session, tmp_path):
    # simulate a crash mid-update: stale partial files sit in the NEXT
    # generation's directory; the retried update must not merge them
    import shutil

    df = _docs()
    path = str(tmp_path / "vstore")
    write_vocab_store(ray.data.from_pandas(df.iloc[:250]), path,
                      column="text", num_buckets=8)
    shutil.copytree(f"{path}/gen-000000", f"{path}/gen-000001")  # stale
    update_vocab_store(ray.data.from_pandas(df.iloc[250:]), path)
    inc = vocab_topk_from_store(path, 50)
    one = vocab_topk(ray.data.from_pandas(df), "text", 50)
    pd.testing.assert_frame_equal(inc, one)
