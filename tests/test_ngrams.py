"""Exact n-gram decontamination: vectorized gram builder vs a per-row
reference, and broadcast vs bucketed-join strategy agreement."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from jsonschema_validator_ray.stages.ngrams import (
    collect_benchmark_ngrams, ngram_decontaminate, ngrams_batch)


def _ref_ngrams(text, n):
    toks = (text or "").split(" ")
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


@pytest.mark.parametrize("n", [2, 3, 5])
def test_ngrams_batch_matches_per_row(n):
    texts = ["a b c d e f", "one two", "", None, "x " * 20 + "y",
             "solo", "a  b   c d e"]  # consecutive spaces keep empties
    parent, ng = ngrams_batch(pa.array(texts, type=pa.string()), n)
    got = {}
    for p, g in zip(parent, ng.to_pylist()):
        got.setdefault(int(p), []).append(g)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _ref_ngrams(t, n), (i, t)


def test_planted_contamination(ray_session):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the quick brown fox jumps", "the quick brown cat sits",
                 "quick brown fox jumps high and quick brown fox jumps",
                 "nothing in common here at all"]})
    bench = pd.DataFrame({"text": ["quick brown fox jumps"]})
    out = ngram_decontaminate(
        ray.data.from_pandas(docs), ray.data.from_pandas(bench),
        column="text", id_col="doc_id", n=4, concurrency=2).to_pandas()
    got = dict(zip(out.doc_id, out.matched_ngrams))
    assert got == {1: 1, 3: 2}


def test_strategies_agree_on_testdata(ray_session):
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])
    bench = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                  columns=["doc_id", "text"]) \
        .filter(lambda r: r["doc_id"] % 97 == 0)
    kw = dict(column="text", id_col="doc_id", n=7, concurrency=2,
              num_buckets=8)
    a = ngram_decontaminate(docs, bench, strategy="broadcast", **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = ngram_decontaminate(docs, bench, strategy="join", **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(
        a, b[["doc_id", "matched_ngrams"]], check_dtype=False)


def test_broadcast_limit_raises(ray_session):
    bench = ray.data.from_pandas(pd.DataFrame(
        {"text": ["alpha beta gamma delta epsilon zeta"]}))
    with pytest.raises(ValueError, match="broadcast_limit"):
        collect_benchmark_ngrams(bench, "text", 2, broadcast_limit=2)


def test_duplicate_span_removal_planted(ray_session):
    from jsonschema_validator_ray.stages.ngrams import (
        flag_duplicate_spans, remove_duplicate_spans)

    boiler = "click here to subscribe now"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"alpha beta {boiler} gamma delta",
                 f"one two three {boiler} four",
                 "totally unique content with no shared grams at all"]})
    ds = ray.data.from_pandas(docs)
    kw = dict(column="text", id_col="doc_id", n=5, min_docs=2,
              num_buckets=4, concurrency=2)
    flagged = flag_duplicate_spans(ds, **kw).to_pandas()
    assert dict(zip(flagged.doc_id, flagged.dup_positions)) == {1: 1, 2: 1}
    cleaned = remove_duplicate_spans(ds, **kw).to_pandas() \
        .set_index("doc_id")
    assert cleaned.loc[1, "clean_text"] == "alpha beta gamma delta"
    assert cleaned.loc[2, "clean_text"] == "one two three four"
    assert cleaned.loc[3, "clean_text"] == docs.loc[2, "text"]
    assert cleaned.loc[1, "n_tokens_removed"] == 5
    assert cleaned.loc[3, "n_tokens_removed"] == 0


def test_span_removal_overlapping_spans(ray_session):
    from jsonschema_validator_ray.stages.ngrams import remove_duplicate_spans

    # "a b c d" hot as two overlapping 3-grams in both docs: the union of
    # spans must count each token once
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["x a b c d y", "z a b c d w"]})
    out = remove_duplicate_spans(
        ray.data.from_pandas(docs), column="text", id_col="doc_id",
        n=3, min_docs=2, num_buckets=4, concurrency=2).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1, "clean_text"] == "x y"
    assert out.loc[1, "n_tokens_removed"] == 4


def _ref_jaccard(docs_map, n, df_cap, threshold):
    """Brute-force capped n-gram Jaccard over a dict id→text."""
    from collections import Counter

    grams = {k: set(_ref_ngrams(t, n)) for k, t in docs_map.items()}
    df = Counter(g for s in grams.values() for g in s)
    kept = {k: {g for g in s if df[g] <= df_cap}
            for k, s in grams.items()}
    out = []
    keys = sorted(kept)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(kept[a] & kept[b])
            if inter == 0:
                continue
            j = inter / (len(kept[a]) + len(kept[b]) - inter)
            if j >= threshold:
                out.append((a, b, j))
    return sorted(out)


def _planted_corpus():
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = {}
    for i in range(30):
        words = [f"w{i}_{j}" for j in range(12)]
        texts[i] = " ".join(words)
    # near-dup pair: doc 100/101 share a long run
    texts[100] = " ".join(base)
    texts[101] = " ".join(base[:18] + ["different", "tail"])
    # moderately similar pair
    texts[102] = " ".join(base[:10] + [f"u{j}" for j in range(10)])
    # every doc also carries one BOILERPLATE sentence (df > cap at cap=8)
    boiler = "click here to subscribe to our newsletter"
    return {k: v + " " + boiler for k, v in texts.items()}


def test_jaccard_matches_brute_force(ray_session):
    from jsonschema_validator_ray.stages.ngrams import jaccard_near_duplicates

    docs_map = _planted_corpus()
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs_map), "text": list(docs_map.values())}))
    kw = dict(column="text", id_col="doc_id", n=3, threshold=0.2,
              df_cap=8, num_buckets=8, pair_buckets=4)
    got = jaccard_near_duplicates(docs, **kw).to_pandas() \
        .sort_values(["key_a", "key_b"]).reset_index(drop=True)
    ref = _ref_jaccard(docs_map, 3, 8, 0.2)
    assert [tuple(r) for r in got.itertuples(index=False)] == ref
    # the planted near-dup pair survives, boilerplate-only overlap doesn't
    assert (100, 101) in {(a, b) for a, b, _ in ref}
    assert len(ref) >= 2


def test_jaccard_join_path_agrees(ray_session):
    from jsonschema_validator_ray.stages.ngrams import jaccard_near_duplicates

    docs_map = _planted_corpus()
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs_map), "text": list(docs_map.values())}))
    kw = dict(column="text", id_col="doc_id", n=3, threshold=0.2,
              df_cap=8, num_buckets=8, pair_buckets=4)
    bc = jaccard_near_duplicates(docs, **kw).to_pandas() \
        .sort_values(["key_a", "key_b"]).reset_index(drop=True)
    jn = jaccard_near_duplicates(docs, size_broadcast_limit=0, **kw) \
        .to_pandas().sort_values(["key_a", "key_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, jn[list(bc.columns)],
                                  check_dtype=False)


def test_jaccard_string_ids_and_empty(ray_session):
    from jsonschema_validator_ray.stages.ngrams import jaccard_near_duplicates

    docs = ray.data.from_pandas(pd.DataFrame({
        "url": ["a.com", "b.com", "c.com"],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy cat",
                 "short"]}))  # "short" has no 3-grams
    out = jaccard_near_duplicates(docs, column="text", id_col="url", n=3,
                                  threshold=0.3, df_cap=8, num_buckets=4,
                                  pair_buckets=2).to_pandas()
    assert set(zip(out.key_a, out.key_b)) == {("a.com", "b.com")}
    assert out["jaccard"].iloc[0] == 6 / 8  # 6 shared of 7+7 grams
    # no doc shares a gram → empty result, stable schema
    lone = ray.data.from_pandas(pd.DataFrame({
        "url": ["x", "y"], "text": ["one two three", "four five six"]}))
    empty = jaccard_near_duplicates(lone, column="text", id_col="url", n=3,
                                    threshold=0.0, df_cap=8, num_buckets=2,
                                    pair_buckets=2)
    assert empty.count() == 0
    # Dataset-level schema survives emptiness (to_pandas drops empty blocks)
    assert empty.schema().names == ["key_a", "key_b", "jaccard"]


def test_join_strategy_string_ids(ray_session):
    docs = pd.DataFrame({
        "url": ["a.com", "b.com", "c.com"],
        "text": ["the quick brown fox jumps over", "quick brown fox jumps high",
                 "unrelated words only here now yes"]})
    bench = pd.DataFrame({"text": ["quick brown fox jumps"]})
    out = ngram_decontaminate(
        ray.data.from_pandas(docs), ray.data.from_pandas(bench),
        column="text", id_col="url", n=4, strategy="join",
        num_buckets=4).to_pandas()
    assert dict(zip(out.url, out.matched_ngrams)) == {"a.com": 1, "b.com": 1}
    assert out["url"].dtype == object


# ---- tf-weighted exact cosine pairs -----------------------------------------


def _brute_cosine(texts_by_id, n, num, den, cap):
    """Per-doc tf over token n-grams; dot over df-capped terms; norms over
    the full vector; integer threshold predicate."""
    from collections import Counter
    tf = {k: Counter(_ref_ngrams(t, n)) for k, t in texts_by_id.items()}
    df = Counter(g for c in tf.values() for g in c)
    norm2 = {k: sum(v * v for v in c.values()) for k, c in tf.items()}
    out = {}
    ids = sorted(tf)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            dot = sum(tf[a][g] * tf[b][g] for g in tf[a]
                      if 2 <= df[g] <= cap and g in tf[b])
            if dot * dot * den * den >= num * num * norm2[a] * norm2[b] \
                    and dot > 0:
                out[(a, b)] = (dot, norm2[a], norm2[b],
                               dot / np.sqrt(float(norm2[a] * norm2[b])))
    return out


@pytest.mark.parametrize("n", [1, 2])
def test_tf_cosine_matches_brute_force(ray_session, n):
    from jsonschema_validator_ray.stages.ngrams import tf_cosine_pairs
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for i in range(40):
        k = rng.integers(3, 25)
        texts[i] = " ".join(rng.choice(vocab, size=k))
    # planted near-dup pair + exact dup pair + edge rows
    texts[100] = "alpha beta gamma delta alpha beta"
    texts[101] = "alpha beta gamma delta alpha zeta"
    texts[102] = texts[100]
    texts[103] = ""
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())})) \
        .repartition(4)
    got = tf_cosine_pairs(docs, column="text", id_col="doc_id", n=n,
                          threshold_num=2, threshold_den=5, df_cap=16,
                          num_buckets=8, pair_buckets=4).to_pandas()
    expect = _brute_cosine(texts, n, 2, 5, 16)
    got_pairs = {(int(r["key_a"]), int(r["key_b"])):
                 (int(r["dot"]), int(r["norm2_a"]), int(r["norm2_b"]),
                  float(r["cos"]))
                 for _, r in got.iterrows()}
    assert got_pairs.keys() == expect.keys()
    for k, v in expect.items():
        assert got_pairs[k][:3] == v[:3], k
        assert got_pairs[k][3] == v[3], k       # bitwise float parity
    if n == 2:
        assert (100, 102) in got_pairs          # exact dup at cos 1.0
        assert got_pairs[(100, 102)][3] == 1.0


def test_tf_cosine_empty_and_null(ray_session):
    from jsonschema_validator_ray.stages.ngrams import tf_cosine_pairs
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["", None, "only one doc talks"]}))
    out = tf_cosine_pairs(docs, column="text", id_col="doc_id",
                          threshold_num=1, threshold_den=100).to_pandas()
    # '' and null both tokenize to one empty token: they form one pair
    assert len(out) == 1
    assert (int(out["key_a"][0]), int(out["key_b"][0])) == (1, 2)
    assert float(out["cos"][0]) == 1.0


def test_tf_cosine_string_ids(ray_session):
    from jsonschema_validator_ray.stages.ngrams import tf_cosine_pairs
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": ["dA", "dB", "dC"],
         "text": ["x y x y", "x y x z", "q r s"]}))
    out = tf_cosine_pairs(docs, column="text", id_col="doc_id",
                          threshold_num=1, threshold_den=2).to_pandas()
    assert set(zip(out["key_a"], out["key_b"])) == {("dA", "dB")}


def test_containment_measure_matches_brute_force(ray_session):
    from jsonschema_validator_ray.stages.ngrams import (
        jaccard_near_duplicates)
    # short doc fully contained in a long one: containment 1.0, jaccard low
    short = "a b c d"
    long_ = "a b c d " + " ".join(f"x{i}" for i in range(30))
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [short, long_, "q r s t u v"]}))
    cont = jaccard_near_duplicates(
        docs, column="text", id_col="doc_id", n=2, threshold=0.9,
        df_cap=64, measure="containment").to_pandas()
    assert set(zip(cont["key_a"], cont["key_b"])) == {(1, 2)}
    assert float(cont["containment"][0]) == 1.0
    jac = jaccard_near_duplicates(
        docs, column="text", id_col="doc_id", n=2, threshold=0.9,
        df_cap=64).to_pandas()
    assert len(jac) == 0          # same pair fails the symmetric measure


def test_containment_join_path_agrees(ray_session):
    from jsonschema_validator_ray.stages.ngrams import (
        jaccard_near_duplicates)
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": list(range(20)),
        "text": [f"w{i} w{i+1} common common2 w{i+2}" for i in range(20)],
    }))
    broad = jaccard_near_duplicates(
        docs, column="text", id_col="doc_id", n=2, threshold=0.2,
        df_cap=64, measure="containment").to_pandas()
    joined = jaccard_near_duplicates(
        docs, column="text", id_col="doc_id", n=2, threshold=0.2,
        df_cap=64, measure="containment",
        size_broadcast_limit=0).to_pandas()
    key = lambda d: sorted(map(tuple, d[["key_a", "key_b",
                                         "containment"]].to_numpy()))
    assert key(broad) == key(joined)


def test_shared_item_pairs_driver_fold_parity(ray_session):
    """driver_pair_fold=True (gated fast path) must equal the pair-hash
    exchange path row for row."""
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.ngrams import shared_item_pairs

    rows = []
    for d in range(40):
        for it in range(d % 7, d % 7 + 10):
            rows.append({"doc_id": d, "fp": it * 1000})
    items = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)

    def _norm(out):
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        return df.sort_values(["key_a", "key_b"]).reset_index(drop=True)

    a = _norm(shared_item_pairs(items, df_cap=64, min_shared=3,
                                driver_pair_fold=True))
    b = _norm(shared_item_pairs(
        ray.data.from_pandas(pd.DataFrame(rows)).repartition(4),
        df_cap=64, min_shared=3, driver_pair_fold=False))
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)
    assert len(a) > 0
