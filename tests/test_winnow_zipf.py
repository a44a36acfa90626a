"""Winnowing fingerprints (Schleimer et al. 2003) + Zipf slope pins:
brute-force per-doc winnowing parity on crafted edge-case docs, the
winnowing shared-substring guarantee, and the zipf block_gate=0
exchange-path equality (test_relational_features.py:97 template)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
K, W = 8, 4


def _df(out):
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def _brute_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    """Pure-Python reference: polynomial k-gram hashes, min per window of
    w consecutive hashes, distinct minima."""
    cps = [ord(c) for c in text]
    if len(cps) < k:
        return set()
    hashes = []
    for i in range(len(cps) - k + 1):
        h = 0
        for j in range(k):
            h = h * 31 + cps[i + j]
        hashes.append(h)
    if len(hashes) < w:
        return set()
    return {min(hashes[q:q + w]) for q in range(len(hashes) - w + 1)}


def _mini_docs(tmp_path, texts):
    p = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    }), p)
    return str(tmp_path)


def test_winnow_brute_force_parity(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        winnow_fingerprints_documents)

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",                       # empty → no fingerprints
        "short",                  # len < k → none
        "exactly8",               # len == k < k+w-1 → none
        "elevenchars",            # len == k+w-1 == 11 → exactly one window
        "aaaaaaaaaaaaaaaaaaaa",   # all-equal hashes, heavy dedup
        None,                     # null text = '' parity
        "ünïcödé — ß ✓ ünïcödé — ß ✓ padding tail",  # non-ASCII cps
    ]
    sf = _mini_docs(tmp_path, texts)
    got = _df(winnow_fingerprints_documents(sf))
    by_doc = {d: set(g["fp"]) for d, g in got.groupby("doc_id")}
    for i, t in enumerate(texts):
        want = _brute_winnow(t or "")
        assert by_doc.get(i, set()) == want, f"doc {i}"
    # distinctness: no (doc_id, fp) appears twice
    assert not got.duplicated(["doc_id", "fp"]).any()


def test_winnow_shared_substring_guarantee(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        winnow_fingerprints_documents)

    shared = "a very distinctive plagiarised passage indeed"
    texts = ["intro words before " + shared + " and trailing text",
             shared + " totally different continuation here",
             "no overlap with anything else in this corpus at all"]
    sf = _mini_docs(tmp_path, texts)
    got = _df(winnow_fingerprints_documents(sf))
    fp0 = set(got.loc[got["doc_id"] == 0, "fp"])
    fp1 = set(got.loc[got["doc_id"] == 1, "fp"])
    fp2 = set(got.loc[got["doc_id"] == 2, "fp"])
    # any shared substring of length >= w+k-1 shares a fingerprint
    assert fp0 & fp1
    assert not (fp0 & fp2) and not (fp1 & fp2)


def test_zipf_exchange_path_and_brute(ray_session):
    import math

    from jsonschema_validator_ray.pipelines.corpus import (
        zipf_slope_documents)

    fast = _df(zipf_slope_documents(SF))
    slow = _df(zipf_slope_documents(SF, block_gate=0))[fast.columns]
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True),
        check_dtype=False)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    toks = docs["text"].fillna("").str.split(" ").explode()
    ct = toks.value_counts()
    top = ct.reset_index()
    top.columns = ["g", "n"]
    top = top.sort_values(["n", "g"], ascending=[False, True],
                          kind="mergesort").head(256)
    x = [math.floor(math.log(r) * 1e6) for r in range(1, len(top) + 1)]
    y = [math.floor(math.log(f) * 1e6) for f in top["n"]]
    v, sx, sy = len(x), sum(x), sum(y)
    num = (v * sum(a * b for a, b in zip(x, y)) - sx * sy) * 1_000_000
    den = v * sum(a * a for a in x) - sx * sx
    q = abs(num) // den
    want = -q if num < 0 else q
    assert int(fast["slope_ppm"].iloc[0]) == want
    assert int(fast["n_vocab"].iloc[0]) == len(ct)
    assert int(fast["v_used"].iloc[0]) == v
    # natural-ish synthetic text: slope is negative
    assert want < 0


def test_zipf_small_vocab(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        zipf_slope_documents)

    sf = _mini_docs(tmp_path, ["a a a b b c", "a b"])
    out = _df(zipf_slope_documents(sf))
    assert int(out["n_vocab"].iloc[0]) == 3
    assert int(out["v_used"].iloc[0]) == 3
    assert int(out["slope_ppm"].iloc[0]) < 0


def test_winnow_dup_pairs_brute(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        winnow_dup_pairs_documents)

    base = "the common boilerplate sentence that appears everywhere here"
    texts = [base + " plus exclusive tail zero zero",
             base + " plus exclusive tail one one",
             "completely unrelated document text with nothing in common",
             base + " plus exclusive tail zero zero"]   # exact dup of 0
    sf = _mini_docs(tmp_path, texts)
    got = _df(winnow_dup_pairs_documents(sf, min_shared=3)) \
        .sort_values(["key_a", "key_b"]).reset_index(drop=True)

    # brute force: per-doc fp sets, df-cap, pairwise intersections
    fps = {i: _brute_winnow(t) for i, t in enumerate(texts)}
    from collections import Counter
    df = Counter(f for s in fps.values() for f in s)
    kept = {i: {f for f in s if df[f] <= 64} for i, s in fps.items()}
    want = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            n = len(kept[a] & kept[b])
            if n >= 3:
                want.append((a, b, n))
    want_df = pd.DataFrame(want, columns=["key_a", "key_b", "shared"])
    pd.testing.assert_frame_equal(
        got.astype("int64"), want_df.astype("int64"))
    # the planted exact dup shares everything; the unrelated doc pairs
    # with nothing
    assert ((got["key_a"] == 0) & (got["key_b"] == 3)).any()
    assert not ((got["key_a"] == 2) | (got["key_b"] == 2)).any()


def test_heaps_law_paths_and_brute(ray_session):
    from jsonschema_validator_ray.pipelines.corpus import heaps_law_documents

    fast = _df(heaps_law_documents(SF)).reset_index(drop=True)
    slow = _df(heaps_law_documents(SF, block_gate=0))[fast.columns] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toks = docs.assign(g=docs["text"].fillna("").str.split(" ")) \
        .explode("g")
    max_doc = int(docs["doc_id"].max())
    for _, row in fast.iterrows():
        c = (max_doc * int(row["k"])) // 8
        assert int(row["cutoff"]) == c
        sub = toks[toks["doc_id"] <= c]
        assert int(row["n_tokens"]) == len(sub)
        assert int(row["vocab"]) == sub["g"].nunique()
    # Heaps: vocab grows sublinearly vs tokens (monotone, concave-ish)
    assert fast["vocab"].is_monotonic_increasing
    assert fast["n_tokens"].is_monotonic_increasing


def test_jsd_lang_split_brute(ray_session, tmp_path):
    import math

    from jsonschema_validator_ray.pipelines.corpus import (
        jsd_lang_split_documents)

    # identical distributions -> jsd 0; disjoint -> ln 2 * 1e6-ish
    p = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["x y z", "x y z", "x y z", "x y z"]),
        "lang": pa.array(["en", "en", "fr", "fr"]),
        "source": pa.array(["t"] * 4),
        "n_chars": pa.array([5] * 4, pa.int64()),
    }), p)
    same = _df(jsd_lang_split_documents(str(tmp_path)))
    assert float(same["jsd_e6"].iloc[0]) == 0.0

    pq.write_table(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "text": pa.array(["a b c", "d e f"]),
        "lang": pa.array(["en", "fr"]),
        "source": pa.array(["t"] * 2),
        "n_chars": pa.array([5] * 2, pa.int64()),
    }), p)
    disj = _df(jsd_lang_split_documents(str(tmp_path)))
    want = float(math.floor(math.log(2.0) * 1e6))
    assert float(disj["jsd_e6"].iloc[0]) == want


def test_token_dispersion_properties(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        token_dispersion_documents)

    # 'even' spreads exactly like the corpus (DP=0); 'only' lives in one
    # source (DP -> 1 - that source's corpus share)
    p = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["even even only only only only",
                          "even even x x x x",
                          "even even y y y y",
                          "even even z z z z"]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s0", "s1", "s2", "s3"]),
        "n_chars": pa.array([10] * 4, pa.int64()),
    }), p)
    out = _df(token_dispersion_documents(str(tmp_path)))
    by_tok = out.set_index("token")
    assert int(by_tok.loc["even", "dp_ppm"]) == 0
    # 'only': n=(4,0,0,0), N=4, T_i=6 each, T=24 -> DP = 3/4
    assert int(by_tok.loc["only", "dp_ppm"]) == 750_000
    # gate path equality
    slow = _df(token_dispersion_documents(str(tmp_path), block_gate=0))
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  slow[out.columns].reset_index(drop=True),
                                  check_dtype=False)


def test_source_profile_cosine_properties(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        source_profile_cosine_documents)

    p = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(["a b c a b c", "a b c a b c", "x y z"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s0", "s1", "s2"]),
        "n_chars": pa.array([5] * 3, pa.int64()),
    }), p)
    out = _df(source_profile_cosine_documents(str(tmp_path))) \
        .set_index(["src_a", "src_b"])
    # identical profiles -> cos^2 = 1 exactly (ppm 1_000_000)
    assert int(out.loc[("s0", "s1"), "cos2_ppm"]) == 1_000_000
    # token-disjoint profiles never pair (absent in BOTH engines: the
    # oracle's inner join sees no shared token, the Ray side drops dot=0)
    assert ("s0", "s2") not in out.index
    assert ("s1", "s2") not in out.index


def test_benford_paths_and_invariants(ray_session):
    import math

    from jsonschema_validator_ray.pipelines.corpus import (
        benford_first_digit_orders)

    fast = _df(benford_first_digit_orders(SF)).reset_index(drop=True)
    slow = _df(benford_first_digit_orders(SF, block_gate=0)) \
        [fast.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert set(fast["digit"]) <= set(range(1, 10))
    # expected ppm matches the published Benford table (log10(1+1/d))
    want1 = math.floor(math.log(2.0) / math.log(10.0) * 1e6)
    assert int(fast.loc[fast["digit"] == 1, "expected_ppm"].iloc[0]) \
        == want1 == 301029
    # shares are a truncating partition of 1e6 (sum within 9 ulp of trunc)
    assert 1_000_000 - 9 <= int(fast["share_ppm"].sum()) <= 1_000_000


def test_char_entropy_brute(ray_session, tmp_path):
    import math

    from jsonschema_validator_ray.pipelines.corpus import (
        char_entropy_documents)

    texts = ["aaaaaaaa",            # zero entropy
             "abcdefgh",            # all distinct: L*floor(ln L * 1e6)
             "",                    # empty -> 0
             None,                  # null = '' parity
             "ünïcödé mix ünïcödé mix tail"]
    sf = _mini_docs(tmp_path, texts)
    got = _df(char_entropy_documents(sf)).set_index("doc_id")

    from collections import Counter
    for i, t in enumerate(texts):
        t = t or ""
        want = sum(c * math.floor(math.log(len(t) / c) * 1e6)
                   for c in Counter(t).values())
        assert int(got.loc[i, "ent_micro"]) == want, f"doc {i}"
        assert int(got.loc[i, "n_chars_counted"]) == len(t)
    assert int(got.loc[0, "ent_micro"]) == 0
    assert int(got.loc[1, "ent_micro"]) == 8 * math.floor(
        math.log(8.0) * 1e6)
