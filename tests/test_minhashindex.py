"""Persisted MinHash/LSH index: probe parity with the in-memory cross-side
path (stages/dedup.decontaminate), generational updates, incremental
survivor filtering."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from jsonschema_validator_ray.stages.dedup import decontaminate
from jsonschema_validator_ray.stages.minhashindex import (
    dedup_near_incremental, index_doc_count, probe_minhash_index,
    update_minhash_index, write_minhash_index)

KW = dict(n_perm=64, bands=16, seed=7)


def _corpus():
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(400)]
    texts, keys = [], []
    for i in range(60):
        toks = list(rng.choice(words, size=60))
        texts.append(" ".join(toks))
        keys.append(i)
    # plant near-dups of docs 0..4 in the "new" half (keys 1000+)
    new_texts, new_keys = [], []
    for i in range(5):
        toks = texts[i].split()
        toks[3] = "CHANGED"
        new_texts.append(" ".join(toks))
        new_keys.append(1000 + i)
    for i in range(20):
        toks = list(rng.choice(words, size=60))
        new_texts.append(" ".join(toks))
        new_keys.append(2000 + i)
    old = pd.DataFrame({"doc_id": keys, "text": texts})
    new = pd.DataFrame({"doc_id": new_keys, "text": new_texts})
    return old, new


def _pairs_set(df):
    return set(zip(df["key_a"].astype(int), df["key_b"].astype(int)))


def test_probe_matches_in_memory_decontaminate(ray_session, tmp_path):
    old, new = _corpus()
    path = str(tmp_path / "mhidx")
    write_minhash_index(ray.data.from_pandas(old), path,
                        key="doc_id", text="text", num_buckets=16, **KW)
    assert index_doc_count(path) == len(old)
    probed = probe_minhash_index(
        ray.data.from_pandas(new), path, threshold=0.6).to_pandas()
    _, mem_pairs = decontaminate(
        ray.data.from_pandas(new), ray.data.from_pandas(old),
        "doc_id", "text", threshold=0.6, candidate_buckets=16, **KW)
    assert _pairs_set(probed) == _pairs_set(mem_pairs.to_pandas())
    planted = {(1000 + i, i) for i in range(5)}
    assert planted <= _pairs_set(probed)
    # same pair → same estimate in both paths
    a = probed.set_index(["key_a", "key_b"])["jaccard_est"]
    b = mem_pairs.to_pandas().set_index(["key_a", "key_b"])["jaccard_est"]
    for k in a.index:
        assert a[k] == pytest.approx(b[k])


def test_generational_update_equals_full_rebuild(ray_session, tmp_path):
    old, new = _corpus()
    half1, half2 = old.iloc[:30], old.iloc[30:]
    inc = str(tmp_path / "inc")
    write_minhash_index(ray.data.from_pandas(half1), inc,
                        key="doc_id", text="text", num_buckets=16, **KW)
    update_minhash_index(ray.data.from_pandas(half2), inc)
    full = str(tmp_path / "full")
    write_minhash_index(ray.data.from_pandas(old), full,
                        key="doc_id", text="text", num_buckets=16, **KW)
    assert index_doc_count(inc) == index_doc_count(full) == len(old)
    pi = probe_minhash_index(ray.data.from_pandas(new), inc,
                             threshold=0.6).to_pandas()
    pf = probe_minhash_index(ray.data.from_pandas(new), full,
                             threshold=0.6).to_pandas()
    assert _pairs_set(pi) == _pairs_set(pf)


def test_dedup_near_incremental_survivors(ray_session, tmp_path):
    old, new = _corpus()
    path = str(tmp_path / "mhidx")
    write_minhash_index(ray.data.from_pandas(old), path,
                        key="doc_id", text="text", num_buckets=16, **KW)
    survivors, matched = dedup_near_incremental(
        ray.data.from_pandas(new), path, threshold=0.6)
    surv_ids = set(r["doc_id"] for r in
                   survivors.select_columns(["doc_id"]).take_all())
    dropped = set(int(x) for x in matched.to_pandas()["key_a"])
    assert {1000 + i for i in range(5)} <= dropped
    assert surv_ids == set(new["doc_id"]) - dropped


def test_probe_empty_when_disjoint(ray_session, tmp_path):
    old, _ = _corpus()
    path = str(tmp_path / "mhidx")
    write_minhash_index(ray.data.from_pandas(old), path,
                        key="doc_id", text="text", num_buckets=16, **KW)
    other = pd.DataFrame({"doc_id": [9000, 9001],
                          "text": ["zz yy xx " * 30, "qq pp oo " * 30]})
    probed = probe_minhash_index(ray.data.from_pandas(other), path,
                                 threshold=0.6)
    assert probed.count() == 0


def test_probe_with_empty_crawl(ray_session, tmp_path):
    old, _ = _corpus()
    path = str(tmp_path / "mhidx")
    write_minhash_index(ray.data.from_pandas(old), path,
                        key="doc_id", text="text", num_buckets=16, **KW)
    empty = ray.data.from_pandas(old.iloc[:0])
    probed = probe_minhash_index(empty, path, threshold=0.6)
    assert probed.count() == 0
    assert "key_a" in probed.schema().names
