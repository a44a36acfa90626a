"""Corpus vocabulary top-k (stages/vocab.py): exact counts + document
frequency vs a pure-Python reference, partition invariance, tie handling."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa

from jsonschema_validator_ray.stages.vocab import vocab_topk


def _ref_vocab(texts, k):
    total: Counter = Counter()
    docs: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        toks = [x for x in t.split() if x]
        total.update(toks)
        docs.update(set(toks))
    rows = sorted(((tok, n, docs[tok]) for tok, n in total.items()),
                  key=lambda r: (-r[1], r[0]))[:k]
    return pd.DataFrame(rows, columns=["token", "n_total", "n_docs"])


TEXTS = [
    "the cat sat on the mat",
    "the dog  sat\twhere the\ncat sat",      # repeated tokens, mixed ws
    "",                                      # empty doc
    None,                                    # null doc
    "  leading and trailing  ",              # empty split fragments
    "zebra zebra zebra",                     # high-count single-doc token
    "aa ab aa",                              # tie fodder (aa vs others)
    "the end",
]


def test_vocab_topk_matches_reference(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(TEXTS, type=pa.string())})).repartition(4)
    got = vocab_topk(ds, "text", 5, num_buckets=8, batch_size=3)
    want = _ref_vocab(TEXTS, 5)
    pd.testing.assert_frame_equal(got, want)


def test_vocab_topk_partition_invariant(ray_session):
    """Same head regardless of bucket count / batch size (ties broken by
    token asc, so the boundary is deterministic)."""
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(TEXTS * 7, type=pa.string())}))
    a = vocab_topk(ds.repartition(1), "text", 4, num_buckets=2,
                   batch_size=1000)
    b = vocab_topk(ds.repartition(5), "text", 4, num_buckets=32,
                   batch_size=2)
    pd.testing.assert_frame_equal(a, b)
    # 7x duplication scales totals but not the per-doc frequency ordering
    want = _ref_vocab(TEXTS * 7, 4)
    pd.testing.assert_frame_equal(a, want)


def test_vocab_topk_empty_corpus(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"text": pa.array([], type=pa.string())}))
    out = vocab_topk(ds, "text", 10)
    assert list(out.columns) == ["token", "n_total", "n_docs"]
    assert len(out) == 0


def test_oov_scores_matches_reference(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.vocab import oov_scores

    vocab = ["the", "cat", "sat"]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(range(len(TEXTS)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
    })).repartition(3)
    got = (oov_scores(ds, "text", "id", vocab, batch_size=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    for i, t in enumerate(TEXTS):
        toks = [x for x in (t or "").split() if x]
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "n_oov"] == sum(x not in vocab for x in toks)


def test_oov_fit_then_score_roundtrip(ray_session):
    """Fit the full vocabulary then score: every token is in-vocab."""
    import ray.data

    from jsonschema_validator_ray.stages.vocab import oov_scores, vocab_topk

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(range(len(TEXTS)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
    }))
    vocab = vocab_topk(ds, "text", 10_000)
    got = oov_scores(ds, "text", "id", vocab["token"].tolist()).to_pandas()
    assert int(got["n_oov"].sum()) == 0
    assert int(got["n_tokens"].sum()) == int(vocab["n_total"].sum())


def test_tfidf_top_terms_matches_reference(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.vocab import tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "apple apple banana common common common",
            "banana banana cherry common common",
            "cherry cherry cherry apple common",
            "common common common common",
        ],
    })
    ds = ray.data.from_pandas(docs).repartition(2)
    out = tfidf_top_terms(ds, "text", "doc_id", vocab_size=100, k=2) \
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)

    # numpy reference: same formula, brute force
    n = 4
    df = {"apple": 2, "banana": 2, "cherry": 2, "common": 4}
    idf = {t: math.log((n + 1) / (d + 1)) + 1 for t, d in df.items()}
    def top2(text):
        tf = pd.Series(text.split()).value_counts()
        sc = {t: c * idf[t] for t, c in tf.items()}
        return sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        got = out[out["doc_id"] == doc_id]
        ref = top2(text)
        assert got["term"].tolist() == [t for t, _ in ref], doc_id
        assert np.allclose(got["score"], [s for _, s in ref])
        assert got["rank"].tolist() == list(range(len(ref)))

    # common appears everywhere → lowest idf: never the top term of a
    # doc that has any distinctive token
    top1 = out[out["rank"] == 0]
    assert "common" not in top1[top1["doc_id"] != 4]["term"].tolist()
    assert top1[top1["doc_id"] == 4]["term"].tolist() == ["common"]


def test_inverted_index_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.vocab import inverted_index

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts, ids = [], []
    for i in range(300):
        n = rng.integers(0, 8)
        # adversarial whitespace: tabs, runs of spaces, leading/trailing
        texts.append(" \t ".join(rng.choice(vocab, size=n)) + "  ")
        ids.append(1000 + i)
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = ray.data.from_pandas(df).repartition(6)
    got = inverted_index(ds, "text", "doc_id", min_df=2, max_df=250,
                         num_buckets=4).to_pandas() \
        .sort_values("token").reset_index(drop=True)

    exp_rows = []
    posting = {}
    for did, t in zip(ids, texts):
        for tok in set(t.split()):
            posting.setdefault(tok, set()).add(did)
    for tok in sorted(posting):
        dids = sorted(posting[tok])
        if 2 <= len(dids) <= 250:
            exp_rows.append((tok, len(dids), ",".join(map(str, dids))))
    exp = pd.DataFrame(exp_rows, columns=["token", "df", "postings"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_inverted_index_df_band_and_dup_tokens(ray_session):
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.vocab import inverted_index

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        # "rep rep" within one doc counts df once; "solo" has df 1
        "text": ["rep rep both", "both solo2", "both"],
    })
    got = inverted_index(ray.data.from_pandas(df), "text", "doc_id",
                         min_df=1, max_df=2, num_buckets=2).to_pandas() \
        .sort_values("token").reset_index(drop=True)
    # "both" df=3 excluded by max_df=2; rep df=1 (deduped within doc)
    assert list(got["token"]) == ["rep", "solo2"]
    assert list(got["df"]) == [1, 1]
    assert list(got["postings"]) == ["1", "2"]
