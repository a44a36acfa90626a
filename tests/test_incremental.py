"""Incremental corpus ingest: cross-crawl exact + near dedup through the
persisted stores, drift reporting, crash repair."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from jsonschema_validator_ray.pipelines.incremental import (
    corpus_dataset, corpus_size, ingest_increment, init_incremental_corpus,
    repair_state)

LSH = dict(n_perm=64, bands=16, seed=7)


def _crawls():
    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(300)]

    def doc():
        return " ".join(rng.choice(words, size=50))

    c1 = pd.DataFrame({"doc_id": range(100, 120),
                       "text": [doc() for _ in range(20)]})
    # crawl 2: 10 fresh, 4 exact copies of crawl-1 docs, 3 near-dups
    fresh2 = [doc() for _ in range(10)]
    exact2 = list(c1["text"].iloc[:4])
    near2 = []
    for t in c1["text"].iloc[4:7]:
        toks = t.split()
        toks[10] = "CHANGED"
        near2.append(" ".join(toks))
    c2 = pd.DataFrame({"doc_id": range(200, 217),
                       "text": fresh2 + exact2 + near2})
    # crawl 3: 5 fresh, 2 exact copies of crawl-2 FRESH docs, 1 within-crawl
    # exact dup pair
    fresh3 = [doc() for _ in range(5)]
    c3 = pd.DataFrame({"doc_id": range(300, 309),
                       "text": fresh3 + fresh2[:2] + [fresh3[0]] + [doc()]})
    return c1, c2, c3


@pytest.fixture()
def root(tmp_path):
    r = str(tmp_path / "corpus_root")
    init_incremental_corpus(r, key="doc_id", text="text",
                            stats_columns=["doc_id", "text"],
                            near_threshold=0.6, num_buckets=16, **LSH)
    return r


def test_three_crawls_cross_dedup(ray_session, root):
    c1, c2, c3 = _crawls()
    s1 = ingest_increment(ray.data.from_pandas(c1), root)
    assert (s1["n_new"], s1["n_kept"]) == (20, 20)

    s2 = ingest_increment(ray.data.from_pandas(c2), root)
    assert s2["n_new"] == 17
    # 4 exact copies dropped by the hash index, 3 near-dups by the LSH index
    assert s2["n_kept"] == 10
    assert s2["near_matched_pairs"] >= 3
    assert s2["psi_drift"] == {}  # no histogram configured

    s3 = ingest_increment(ray.data.from_pandas(c3), root)
    assert s3["n_new"] == 9
    # 2 exact copies of crawl-2 docs + 1 within-crawl dup dropped
    assert s3["n_kept"] == 6

    assert corpus_size(root) == 36
    texts = corpus_dataset(root).to_pandas()["text"]
    assert texts.nunique() == len(texts)  # no exact dup survives anywhere


def test_repair_after_partial_ingest(ray_session, root, tmp_path):
    c1, c2, _ = _crawls()
    ingest_increment(ray.data.from_pandas(c1), root)

    # simulate a crash AFTER the hash index advanced but BEFORE the root
    # meta recorded the ingest: advance the store manually
    from jsonschema_validator_ray.stages import hashindex
    orphan = ray.data.from_pandas(c2.iloc[:5])
    hashindex.update_hash_index(orphan, f"{root}/hash_index", column="text")
    dropped = repair_state(root)
    assert dropped["hash_index"] == 1
    # after repair the failed crawl re-ingests as if the crash never
    # happened: the orphan generation is unreferenced
    s2 = ingest_increment(ray.data.from_pandas(c2), root)
    assert s2["n_kept"] == 10
    assert corpus_size(root) == 30


def test_drift_reported_with_histogram(ray_session, tmp_path):
    r = str(tmp_path / "root2")
    init_incremental_corpus(
        r, key="doc_id", text="text", stats_columns=["doc_id", "text"],
        hist_categories={"text": []},  # degenerate: everything OTHER-bucket
        near_threshold=0.6, num_buckets=16, **LSH)
    c1, c2, _ = _crawls()
    ingest_increment(ray.data.from_pandas(c1), r)
    s2 = ingest_increment(ray.data.from_pandas(c2), r)
    assert "text" in s2["psi_drift"]
    assert s2["psi_drift"]["text"] == pytest.approx(0.0, abs=1e-9)


def test_empty_crawl_ingest(ray_session, root):
    c1, _, _ = _crawls()
    ingest_increment(ray.data.from_pandas(c1), root)
    # a full re-crawl of already-ingested docs: everything dedupes away
    recrawl = c1.assign(doc_id=c1.doc_id + 5000)
    s = ingest_increment(ray.data.from_pandas(recrawl), root)
    assert s["n_kept"] == 0 and s["n_new"] == 20
    assert corpus_size(root) == 20
    # stores did not advance on the empty ingest
    assert s["store_gens"] == {"hash_index": 1, "minhash_index": 1,
                               "stats_state": 1}
    # and the pipeline keeps working afterwards
    _, c2, _ = _crawls()
    s2 = ingest_increment(ray.data.from_pandas(c2), root)
    assert s2["n_kept"] == 10
