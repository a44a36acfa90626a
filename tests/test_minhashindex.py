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


def test_update_with_reused_sigs_identical_index(ray_session, tmp_path):
    """update_minhash_index(sigs=...) (the ingest path: probe signatures
    filtered to survivors) must build a generation probe-identical to the
    recompute-from-text path — the sig blob is an on-disk contract."""
    import pyarrow.parquet as pq

    old, new = _corpus()
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    for p in (a, b):
        write_minhash_index(ray.data.from_pandas(old), p,
                            key="doc_id", text="text", num_buckets=16, **KW)
    surv_a, matched_a, sigs_a = dedup_near_incremental(
        ray.data.from_pandas(new), a, threshold=0.6, return_sigs=True)
    surv_b, matched_b = dedup_near_incremental(
        ray.data.from_pandas(new), b, threshold=0.6)
    update_minhash_index(surv_a, a, sigs=sigs_a)       # reuse path
    update_minhash_index(surv_b, b)                    # recompute path
    assert index_doc_count(a) == index_doc_count(b)
    # byte-level: the new generation's sig rows agree
    import pandas as pd
    from pathlib import Path

    def gen_sigs(root):
        fs = sorted(Path(root).glob("gen-000001/sigs/**/*.parquet"))
        df = pd.concat([pq.read_table(f).to_pandas() for f in fs])
        return df.sort_values("doc_id").reset_index(drop=True)

    ga, gb = gen_sigs(a), gen_sigs(b)
    assert list(ga["doc_id"]) == list(gb["doc_id"])
    assert all(bytes(x) == bytes(y) for x, y in zip(ga["sig"], gb["sig"]))
    # probes over both indexes agree
    probe_new = pd.DataFrame({"doc_id": [9000], "text": [old["text"][31]]})
    pa_ = probe_minhash_index(ray.data.from_pandas(probe_new), a,
                              threshold=0.6).to_pandas()
    pb_ = probe_minhash_index(ray.data.from_pandas(probe_new), b,
                              threshold=0.6).to_pandas()
    assert _pairs_set(pa_) == _pairs_set(pb_) and len(pa_) >= 1


def test_probe_broadcast_and_join_paths_agree(ray_session, tmp_path):
    """sig_broadcast_limit=0 forces the shuffle path (pair-dedupe exchange
    + bucketed join); default uses the broadcast fast path — identical
    pairs and estimates either way."""
    old, new = _corpus()
    path = str(tmp_path / "mhidx")
    write_minhash_index(ray.data.from_pandas(old), path,
                        key="doc_id", text="text", num_buckets=16, **KW)
    pb = probe_minhash_index(ray.data.from_pandas(new), path,
                             threshold=0.6).to_pandas()
    pj = probe_minhash_index(ray.data.from_pandas(new), path,
                             threshold=0.6,
                             sig_broadcast_limit=0).to_pandas()
    assert _pairs_set(pb) == _pairs_set(pj) and len(pb) >= 5
    a = pb.set_index(["key_a", "key_b"]).sort_index()
    b = pj.set_index(["key_a", "key_b"]).sort_index()
    assert list(a["jaccard_est"]) == list(b["jaccard_est"])
    assert list(a["truncated"]) == list(b["truncated"])
