"""Dedup family + similarity search + text analysis tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _corpus_with_near_dups(ray_session):
    """Synthetic corpus: distinct docs + planted exact and near duplicates."""
    import ray.data

    rng = np.random.default_rng(3)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    docs = []
    for i in range(60):
        n = 30 + int(rng.integers(0, 30))
        docs.append(" ".join(rng.choice(words, size=n)))
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    # exact duplicates of doc 0 and 1
    rows.append({"doc_id": 100, "text": docs[0]})
    rows.append({"doc_id": 101, "text": docs[1]})
    # near duplicate of doc 2: change two words
    w = docs[2].split()
    w[0], w[-1] = "changed", "words"
    rows.append({"doc_id": 102, "text": " ".join(w)})
    return ray.data.from_items(rows), docs


def test_exact_duplicates_and_dedup(ray_session):
    from jsonschema_validator_ray.stages.dedup import dedup_exact, exact_duplicates

    ds, docs = _corpus_with_near_dups(ray_session)
    dups = exact_duplicates(ds, "doc_id", "text").to_pandas()
    assert set(dups["doc_id"]) == {100, 101}
    assert set(dups["dup_of"]) == {0, 1}
    deduped = dedup_exact(ds, "doc_id", "text")
    ids = set(r["doc_id"] for r in deduped.select_columns(["doc_id"]).take_all())
    assert 100 not in ids and 101 not in ids and 0 in ids and 102 in ids
    assert len(ids) == 61


def test_minhash_lsh_near_duplicates(ray_session):
    from jsonschema_validator_ray.stages.dedup import (
        minhash_near_duplicates, ngram_jaccard)

    ds, docs = _corpus_with_near_dups(ray_session)
    pairs = minhash_near_duplicates(ds, "doc_id", "text",
                                    threshold=0.5, batch_size=16).to_pandas()
    # key dtype survives the verify join (the padded union must not upcast)
    assert pairs["key_a"].dtype == "int64" and pairs["key_b"].dtype == "int64"
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["key_a"], pairs["key_b"])}
    # exact dups must surface with est ≈ 1
    assert (0, 100) in found and (1, 101) in found
    # the planted near-dup pair surfaces
    assert (2, 102) in found
    exact1 = pairs[(pairs["key_a"] == 0) & (pairs["key_b"] == 100)]["jaccard_est"].iloc[0]
    assert exact1 == pytest.approx(1.0)
    # estimates track exact n-gram Jaccard for the near-dup pair
    est = pairs[(pairs["key_a"] == 2) & (pairs["key_b"] == 102)]["jaccard_est"].iloc[0]
    w = docs[2].split()
    w[0], w[-1] = "changed", "words"
    truth = ngram_jaccard(docs[2], " ".join(w))
    assert abs(est - truth) < 0.2


def test_minhash_truncation_counter_fires(ray_session):
    """A pathological LSH bucket (more members than the cap) must mark its
    emitted pairs truncated=1 — capped, but counted, never silent."""
    import ray.data

    from jsonschema_validator_ray.stages.dedup import minhash_near_duplicates

    rows = [{"doc_id": i, "text": "identical text repeated many times over"}
            for i in range(15)]
    rows += [{"doc_id": 100 + i, "text": f"unique filler document {i} " * 5}
             for i in range(5)]
    ds = ray.data.from_items(rows)
    pairs = minhash_near_duplicates(ds, "doc_id", "text", threshold=0.5,
                                    batch_size=8, bucket_cap=10).to_pandas()
    ident = pairs[(pairs["key_a"] < 100) & (pairs["key_b"] < 100)]
    assert len(ident) > 0
    assert (ident["truncated"] == 1).all()
    # uncapped run on the same corpus: nothing truncated
    pairs2 = minhash_near_duplicates(ds, "doc_id", "text", threshold=0.5,
                                     batch_size=8, bucket_cap=200).to_pandas()
    assert (pairs2["truncated"] == 0).all()
    assert len(pairs2[(pairs2["key_a"] < 100) & (pairs2["key_b"] < 100)]) == 15 * 14 // 2


def test_minhash_large_candidate_set_distributed(ray_session):
    """Candidate sets beyond driver comfort flow through the distributed
    verify (bucketed signature join): 25 planted clusters × 80 docs ≈ 79k
    pairs, every one verified at jaccard_est 1.0."""
    import ray.data

    from jsonschema_validator_ray.stages.dedup import minhash_near_duplicates

    rows = []
    for c in range(25):
        text = f"cluster {c} body text shared by every member " * 3
        rows += [{"doc_id": c * 1000 + i, "text": text} for i in range(80)]
    ds = ray.data.from_items(rows)
    pairs = minhash_near_duplicates(ds, "doc_id", "text", threshold=0.9,
                                    batch_size=256, bucket_cap=200)
    expected = 25 * (80 * 79 // 2)
    pdf = pairs.to_pandas()
    assert len(pdf) == expected
    assert (pdf["jaccard_est"] == 1.0).all()
    # no cross-cluster pairs
    assert ((pdf["key_a"] // 1000) == (pdf["key_b"] // 1000)).all()


def test_candidate_bucket_balance():
    """The composite LSH shuffle key must (a) be deterministic, (b) never
    split a (band, band_hash) bucket, (c) spread a skew-free corpus evenly —
    no single group may hold ~n·bands/B × a large factor (VERDICT r2 item 1:
    fan-out scales with the parameter, not the band count)."""
    from jsonschema_validator_ray.stages.dedup import _candidate_bucket

    rng = np.random.default_rng(0)
    n_docs, bands, B = 2000, 32, 256
    band_ids = np.tile(np.arange(bands, dtype=np.int32), n_docs)
    hashes = rng.integers(0, 1 << 63, size=band_ids.size, dtype=np.uint64)
    cb = _candidate_bucket(band_ids, hashes, B)
    assert cb.min() >= 0 and cb.max() < B
    counts = np.bincount(cb, minlength=B)
    # skew-free corpus: every composite bucket stays near n·bands/B
    assert counts.max() <= 2 * counts.mean()
    # deterministic (same inputs → same shuffle key on every worker)
    assert (_candidate_bucket(band_ids, hashes, B) == cb).all()
    # a same-(band, hash) LSH bucket maps to ONE composite bucket
    assert len(set(_candidate_bucket(np.full(5, 3, np.int32),
                                     np.full(5, 12345, np.uint64), B))) == 1


def test_minhash_verify_paths_agree(ray_session):
    """Driver-side (broadcast) and distributed (bucketed-join) verify return
    identical pairs; candidate generation with a large candidate_buckets fan
    stays correct on the planted corpus."""
    from jsonschema_validator_ray.stages.dedup import minhash_near_duplicates

    ds, _ = _corpus_with_near_dups(ray_session)
    kw = dict(threshold=0.5, batch_size=16, candidate_buckets=256)
    # default: the gated driver-side candidates+verify fast path
    drv = minhash_near_duplicates(ds, "doc_id", "text", **kw).to_pandas()
    # distributed candidates + driver (broadcast) verify
    fast = minhash_near_duplicates(ds, "doc_id", "text",
                                   driver_candidates_limit=0,
                                   **kw).to_pandas()
    # distributed candidates + distributed (bucketed-join) verify
    dist = minhash_near_duplicates(ds, "doc_id", "text",
                                   driver_candidates_limit=0,
                                   verify_broadcast_limit=0, **kw).to_pandas()
    key = ["key_a", "key_b"]
    drv = drv.sort_values(key).reset_index(drop=True)
    fast = fast.sort_values(key).reset_index(drop=True)
    dist = dist.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, dist, check_like=True)
    pd.testing.assert_frame_equal(drv, fast, check_like=True)
    assert len(fast) >= 3


def test_simhash_near_duplicates(ray_session):
    from jsonschema_validator_ray.stages.dedup import simhash_near_duplicates, simhash64

    ds, docs = _corpus_with_near_dups(ray_session)
    pairs = simhash_near_duplicates(ds, "doc_id", "text",
                                    max_hamming=6, batch_size=16).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["key_a"], pairs["key_b"])}
    assert (0, 100) in found and (1, 101) in found  # exact dups: hamming 0
    h0 = pairs[(pairs["key_a"] == 0) & (pairs["key_b"] == 100)]["hamming"].iloc[0]
    assert h0 == 0
    assert simhash64(docs[0]) == simhash64(docs[0])  # deterministic


def test_embedding_near_duplicates(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.dedup import embedding_near_duplicates

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # planted near-dup: tiny perturbation of vec 7
    rows.append({"vec_id": 900, "embedding": (base[7] + 0.01).tolist()})
    ds = ray.data.from_items(rows)
    pairs = embedding_near_duplicates(ds, "vec_id", "embedding",
                                      threshold=0.98, batch_size=16).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["key_a"], pairs["key_b"])}
    assert (7, 900) in found


def test_topk_cosine_matches_duckdb(ray_session):
    """Brute-force top-k agrees with an exact DuckDB computation."""
    import duckdb
    import ray.data

    from jsonschema_validator_ray.stages.similarity import topk_cosine

    emb = ray.data.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.take(1)[0]["embedding"]
    ours = topk_cosine(emb, np.array(q), k=10, batch_size=128)
    theirs = duckdb.connect().execute(f"""
        SELECT vec_id,
               list_cosine_similarity(embedding,
                 (SELECT embedding FROM '{SF_SMOKE}/embeddings.parquet' WHERE vec_id=0)) AS score
        FROM '{SF_SMOKE}/embeddings.parquet'
        ORDER BY score DESC, vec_id LIMIT 10
    """).df()
    assert list(ours["vec_id"]) == list(theirs["vec_id"])
    np.testing.assert_allclose(ours["score"], theirs["score"], rtol=1e-5)


def test_topk_cosine_lsh_recall(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.similarity import (
        topk_cosine, topk_cosine_lsh)

    emb = ray.data.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = np.array(emb.take(3)[2]["embedding"])
    exact = set(topk_cosine(emb, q, k=10, batch_size=128)["vec_id"])
    approx = set(topk_cosine_lsh(emb, q, k=10, n_planes=6,
                                 batch_size=128)["vec_id"])
    # LSH with 6 planes probing Hamming ≤1: recall should be decent
    assert len(exact & approx) >= 5


def test_text_analysis_functions():
    from jsonschema_validator_ray.functions.text import (
        fingerprint, langid, langid_scores, quality_batch, token_count_batch)
    import pyarrow as pa

    t = pa.table({"text": ["the cat sat on the mat", "der Hund ist nicht da",
                           "  spaced   out  ", ""]})
    counts = token_count_batch(t).to_pylist()
    assert counts == [6, 5, 2, 0]
    q = quality_batch(t).to_pylist()
    assert q[0]["n_tokens"] == 6 and q[0]["stopword_ratio"] > 0.2
    assert q[3]["n_tokens"] == 0
    assert langid("the cat and the dog is in the house of that man") == "en"
    assert langid("der hund und die katze ist nicht von den haus") == "de"
    assert langid("") is None
    s = langid_scores("le chat est dans la maison pour une nuit")
    assert max(s, key=s.get) == "fr"
    # fingerprint: whitespace-normalization invariant, content-sensitive
    assert fingerprint("a  b\tc") == fingerprint("a b c")
    assert fingerprint("a b c") != fingerprint("a b d")
    assert fingerprint(None) is None


def test_fingerprint_batch_matches_scalar():
    import pyarrow as pa

    from jsonschema_validator_ray.functions.text import (
        fingerprint, fingerprint_batch)

    texts = ["hello world", "x" * 1000, "日本語 テキスト", "", None,
             # whitespace-normalization edge cases: the vectorized path must
             # reproduce " ".join(t.split()) exactly (Unicode spaces, ASCII
             # separators, runs, leading/trailing, multi-MB column chunking)
             " lead", "trail ", "double  space", "tab\tsep", "\n\t  ",
             "a\x1c\x1db\x1e", "nbsp\xa0space", "em space",
             "ideo\u3000space", "nel\x85line", "w" * (3 << 20),
             "word " * 9999]
    t = pa.table({"text": texts})
    got = fingerprint_batch(t).to_pylist()
    assert got == [fingerprint(x) for x in texts]
    # stays uint64 and deterministic across calls
    assert fingerprint_batch(t).to_pylist() == got


def test_langid_script_detection():
    from jsonschema_validator_ray.functions.text import langid

    assert langid("これは日本語のテキストです") == "ja"
    assert langid("这是一段中文文本没有假名") == "zh"
    assert langid("日本語のテキスト with some english words") == "ja"
    assert langid("это русский текст про валидацию") == "ru"
    assert langid("한국어 텍스트 예시입니다") == "ko"
    assert langid("Ελληνικό κείμενο εδώ") == "el"
    assert langid("זהו טקסט בעברית") == "he"
    assert langid("هذا نص باللغة العربية") == "ar"
    assert langid("นี่คือข้อความภาษาไทย") == "th"
    # Latin still goes through stopword profiles
    assert langid("the cat and the dog is in the house of that man") == "en"


def test_langid_batch_matches_scalar():
    """The vectorized langid must be ROW-IDENTICAL to the scalar heuristic —
    script thresholds, kana-beats-CJK, max-(count, lang) tie-breaks, empty /
    null / whitespace rows, and the ASCII fast path all included."""
    import pyarrow as pa

    from jsonschema_validator_ray.functions.text import langid, langid_batch

    texts = [None, "", " ", "a", "これは日本語のテキストです",
             "这是一段中文文本没有假名", "日本語のテキスト with english",
             "это русский текст про валидацию", "한국어 텍스트 예시입니다",
             "Ελληνικό κείμενο εδώ", "זהו טקסט בעברית",
             "هذا نص باللغة العربية", "นี่คือข้อความภาษาไทย",
             "the cat and the dog is in the house of that man",
             "der hund und die katze ist nicht von den haus",
             "le chat est dans la maison pour une nuit",
             "mixed 中文 a bit", "12345 67890", "ß ÄÖÜ é è ñ",
             "x" * 3000 + " これ",   # kana outside the 2000-char window
             "j" + "あ" * 2,          # kana → ja with no count threshold
             "щ", "щщщ",              # below / at the 3-char script floor
             "roman Ⅻ numerals ² ¾ of the and to in is was for that with"]
    rng = np.random.default_rng(11)
    texts += ["".join(chr(rng.integers(0x20, 0x9FFF))
                      for _ in range(int(rng.integers(0, 300))))
              for _ in range(300)]
    t = pa.table({"text": texts})
    assert langid_batch(t).to_pylist() == [langid(x) for x in texts]


def test_langid_batch_matches_scalar_on_sf(ray_session):
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.functions.text import langid, langid_batch

    tb = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["text"])
    got = langid_batch(tb).to_pylist()
    want = [langid(x) for x in tb.column("text").to_pylist()]
    assert got == want


def test_decontaminate(ray_session):
    """Eval-set decontamination: train docs near-duplicate to ANY bench doc
    are dropped; within-train duplicates are untouched."""
    import ray.data

    from jsonschema_validator_ray.stages.dedup import decontaminate

    train_rows = [{"doc_id": i, "text": f"training document number {i} " * 8}
                  for i in range(40)]
    # two train docs share text (within-train duplicate — must survive)
    train_rows.append({"doc_id": 500, "text": train_rows[0]["text"]})
    train = ray.data.from_items(train_rows)
    # bench: near-copies of train docs 3 and 7, plus an unrelated doc
    bench = ray.data.from_items([
        {"doc_id": 9001, "text": train_rows[3]["text"] + " tail"},
        {"doc_id": 9002, "text": train_rows[7]["text"]},
        {"doc_id": 9003, "text": "completely different benchmark prompt " * 6},
    ])
    for strategy in ("broadcast", "join"):
        clean, matched = decontaminate(train, bench, "doc_id", "text",
                                       threshold=0.5, batch_size=8,
                                       strategy=strategy)
        ids = {r["doc_id"] for r in
               clean.select_columns(["doc_id"]).take_all()}
        assert 3 not in ids and 7 not in ids, strategy
        assert 0 in ids and 500 in ids and len(ids) == 39, (strategy, ids)
        mp = matched.to_pandas()
        assert set(mp["key_a"]) == {3, 7}
        assert set(mp["key_b"]) <= {9001, 9002}


def test_decontaminate_no_overlap(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.dedup import decontaminate

    train = ray.data.from_items(
        [{"doc_id": i, "text": f"unique training text {i} " * 6}
         for i in range(10)])
    bench = ray.data.from_items(
        [{"doc_id": 900, "text": "benchmark only content here " * 6}])
    clean, matched = decontaminate(train, bench, "doc_id", "text",
                                   threshold=0.5, batch_size=4)
    assert clean.count() == 10
    assert matched.count() == 0


def test_redact_batch():
    import pyarrow as pa

    from jsonschema_validator_ray.functions.text import redact_batch

    t = pa.table({"text": [
        "mail me at jo.doe+x@example.co.uk or call +1 (555) 123-4567",
        "server at 192.168.0.1 and 8.8.8.8",
        "no pii here",
        None,
    ]})
    out = redact_batch(t).to_pylist()
    assert out[0] == "mail me at [EMAIL] or call [PHONE]"
    assert out[1] == "server at [IP] and [IP]"
    assert out[2] == "no pii here"
    assert out[3] is None


def test_gopher_quality_batch():
    import pyarrow as pa

    from jsonschema_validator_ray.functions.text import gopher_quality_batch

    good = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the field with great speed and joy ") * 3
    t = pa.table({"text": [
        good,
        "short",                                   # too few tokens
        "!!! ??? *** " * 30,                       # symbols, no stopwords
        None,
    ]})
    out = gopher_quality_batch(t, min_tokens=20).to_pylist()
    assert out[0]["gopher_pass"] is True
    assert out[1]["gopher_pass"] is False
    assert out[2]["gopher_pass"] is False
    assert out[3]["gopher_pass"] is False


def test_signature_matrix_identical_to_per_doc():
    """The batched reduceat signature path must produce BIT-identical
    signatures to the per-doc path (sigs persist in the minhash index, so
    the hash family is part of the on-disk contract), including the
    unique=False shingle multiset (min over multiset == min over set)."""
    import numpy as np

    from jsonschema_validator_ray.stages.dedup import (MinHasher,
                                                       batch_shingle_hashes)

    texts = ["a b c d e f g", "a a a a", "one two three four five six",
             "", None, "x", "a b c a b c a b c"]
    hasher = MinHasher(128, 42)
    per_u = batch_shingle_hashes(texts)
    per_m = batch_shingle_hashes(texts, unique=False)
    want = np.stack([hasher.signature_fast(s) for s in per_u])
    got = hasher.signature_matrix(per_m)
    assert np.array_equal(want, got)
    # odd perm_chunk boundary
    assert np.array_equal(want, hasher.signature_matrix(per_m, perm_chunk=7))


def test_quantize_batch_edges(ray_session):
    """int8 quantization digest: floor semantics, all-zero vectors, null
    and empty embeddings, negative extremes."""
    import numpy as np
    import pyarrow as pa

    from jsonschema_validator_ray.stages.similarity import quantize_batch

    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([[0.5, -1.0, 0.25], [0.0, 0.0], None, [],
                               [2.0]], pa.list_(pa.float32())),
    })
    out = quantize_batch(t).to_pandas()
    # 0.5*127/1 = 63.5 -> 63; -1 -> -127; 0.25 -> 31 (floor)
    assert out.loc[0, ["q_sum", "q_min", "q_max"]].tolist() == [-33, -127, 63]
    assert out.loc[0, "scale"] == 1.0
    assert out.loc[1, ["scale", "q_sum"]].tolist() == [0.0, 0]   # all-zero
    assert np.isnan(out.loc[2, "scale"]) and out.loc[2, "q_sum"] == 0
    assert np.isnan(out.loc[3, "scale"])
    assert out.loc[4, ["q_min", "q_max"]].tolist() == [127, 127]
