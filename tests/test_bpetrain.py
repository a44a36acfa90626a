"""BPE training + application (stages/bpetrain.py): reference-
implementation parity, deterministic training, unicode, edge rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from jsonschema_validator_ray.stages.bpetrain import (
    NEW_ID_BASE, BpeEncoder, _flatten_words, apply_merges, bpe_train)


def _ref_encode_word(word, merges):
    """Slow reference with the module's documented semantics: merges in
    rank order, one greedy left-to-right pass each."""
    syms = [ord(c) for c in word]
    for k, (a, b) in enumerate(merges):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(NEW_ID_BASE + k)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ref_counts(texts, merges):
    from collections import Counter
    c = Counter()
    for t in texts:
        for w in (t or "").split():
            syms = _ref_encode_word(w, merges)
            for x, y in zip(syms, syms[1:]):
                c[(x, y)] += 1
    return c


def _ref_train(texts, num_merges, min_count=2):
    merges = []
    for _ in range(num_merges):
        c = _ref_counts(texts, merges)
        if not c:
            break
        best = max(c.values())
        if best < min_count:
            break
        merges.append(min(p for p, n in c.items() if n == best))
    return merges


@pytest.mark.parametrize("seed", [0, 1])
def test_apply_matches_reference(seed):
    rng = np.random.default_rng(seed)
    alphabet = list("abcdeé日")
    words = ["".join(rng.choice(alphabet, size=rng.integers(1, 12)))
             for _ in range(200)]
    texts = [" ".join(words[i::7]) for i in range(7)]
    merges = _ref_train(texts, 6)
    assert merges, "training should find merges on this corpus"
    sym, wid, dow = _flatten_words(pa.array(texts))
    sym, wid = apply_merges(sym, wid, merges)
    # group module output back into per-word symbol lists
    got = {}
    for s, w in zip(sym, wid):
        got.setdefault(int(w), []).append(int(s))
    widx = 0
    for t in texts:
        for w in t.split():
            assert got[widx] == _ref_encode_word(w, merges), w
            widx += 1


def test_self_pair_run_is_greedy_left_to_right():
    sym, wid, _ = _flatten_words(pa.array(["aaaaa"]))
    s, _ = apply_merges(sym, wid, [(ord("a"), ord("a"))])
    assert list(s) == [NEW_ID_BASE, NEW_ID_BASE, ord("a")]


def test_train_matches_reference_and_is_deterministic(ray_session):
    texts = ["low lower lowest", "low low slow", "newer newest new",
             "", None, "low"]
    df = pd.DataFrame({"text": [t for t in texts]})
    ds = ray.data.from_pandas(df).repartition(3)
    got = bpe_train(lambda: ds, "text", 5)
    assert got == _ref_train(texts, 5)
    assert got == bpe_train(lambda: ds, "text", 5)   # deterministic


def test_train_exchange_path_identical_merges(ray_session):
    """driver_fold_limit=0 forces the per-merge bucketed argmax exchange;
    it must learn the exact same merge table as the driver fold."""
    texts = ["low lower lowest", "low low slow", "newer newest new",
             "", None, "low"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
    fast = bpe_train(lambda: ds, "text", 5)
    slow = bpe_train(lambda: ds, "text", 5, driver_fold_limit=0)
    assert slow == fast and len(fast) == 5


def test_train_min_count_stops_early(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["ab", "cd"]}))
    assert bpe_train(lambda: ds, "text", 4, min_count=2) == []


def test_encoder_stage_counts(ray_session):
    texts = ["banana banana band", "nan", None, ""]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": texts}))
    merges = bpe_train(lambda: ds, "text", 3)
    out = ds.map_batches(BpeEncoder("text", "doc_id", merges),
                         batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        words = (t or "").split()
        exp_tokens = sum(len(_ref_encode_word(w, merges)) for w in words)
        assert out["n_words"][i] == len(words)
        assert out["n_base_symbols"][i] == sum(len(w) for w in words)
        assert out["n_bpe_tokens"][i] == exp_tokens
    # merging strictly shrinks banana-heavy docs
    assert out["n_bpe_tokens"][0] < out["n_base_symbols"][0]
