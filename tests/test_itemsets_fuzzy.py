"""Unit tests for stages/itemsets.py and stages/fuzzy.py against
brute-force references (the oracle queries cover the SQL parity; these
cover the operator semantics off the testdata distributions)."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data

from jsonschema_validator_ray.stages.fuzzy import (_bag_bound,
                                                   _levenshtein_pairs,
                                                   _prefix_bytes,
                                                   blocked_fuzzy_pairs)
from jsonschema_validator_ray.stages.itemsets import cooccur_pairs


def _lev_ref(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_pairs_matches_reference():
    rng = np.random.default_rng(7)
    alpha = list("abcdé日")          # multi-byte chars exercise UTF-8 path
    texts = ["".join(rng.choice(alpha, size=rng.integers(0, 12)))
             for _ in range(40)]
    codes, lens = _prefix_bytes(pd.Series(texts), prefix_len=40)
    ia, ib = np.triu_indices(len(texts), k=1)
    got = _levenshtein_pairs(codes, lens, ia, ib)
    for k in range(len(ia)):
        want = _lev_ref(texts[ia[k]].encode(), texts[ib[k]].encode())
        assert got[k] == want, (texts[ia[k]], texts[ib[k]])


def test_bag_bound_is_lower_bound():
    rng = np.random.default_rng(11)
    texts = ["".join(rng.choice(list("abcxyz"), size=rng.integers(1, 20)))
             for _ in range(30)]
    codes, lens = _prefix_bytes(pd.Series(texts), prefix_len=40)
    ia, ib = np.triu_indices(len(texts), k=1)
    bag = _bag_bound(codes, lens, ia, ib)
    lev = _levenshtein_pairs(codes, lens, ia, ib)
    assert (bag <= lev).all()


def test_blocked_fuzzy_pairs_end_to_end(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc

    rng = np.random.default_rng(3)
    base = ["the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "how vexingly quick daft zebras jump"]
    rows = []
    for i in range(90):
        t = base[i % 3]
        if i % 5 == 0:                    # planted near-dup: one edit
            t = t.replace("quick", "quack")
        rows.append({"id": i, "text": t, "blk": i % 3})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    out = blocked_fuzzy_pairs(
        ds, "id", "text", lambda b: b.column("blk"),
        prefix_len=40, max_dist=5, num_buckets=4).to_pandas()
    # brute force
    want = []
    for a, b in itertools.combinations(rows, 2):
        if a["blk"] != b["blk"]:
            continue
        d = _lev_ref(a["text"][:40].encode(), b["text"][:40].encode())
        if d <= 5:
            want.append((a["id"], b["id"], d))
    got = sorted(zip(out["key_a"], out["key_b"], out["dist"]))
    assert got == sorted(want)
    assert len(want) > 100              # the planted dups actually pair up


def test_cooccur_pairs_brute_force(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "basket": rng.integers(0, 50, size=600),
        "item": rng.integers(0, 20, size=600)})
    ds = ray.data.from_pandas(df)
    out = cooccur_pairs(ds, "basket", "item", min_support=2,
                        num_buckets=4).to_pandas()
    # brute force
    support = {}
    for _, g in df.drop_duplicates().groupby("basket"):
        for a, b in itertools.combinations(sorted(g["item"].unique()), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    want = sorted((a, b, n) for (a, b), n in support.items() if n >= 2)
    got = sorted(zip(out["item_a"], out["item_b"], out["support"]))
    assert got == want


def test_cooccur_max_basket_drops_whole_basket(ray_session):
    df = pd.DataFrame({
        "basket": [1, 1, 1, 2, 2],
        "item":   [10, 11, 12, 10, 11]})
    ds = ray.data.from_pandas(df)
    out = cooccur_pairs(ds, "basket", "item", min_support=1,
                        max_basket=2, num_buckets=2).to_pandas()
    got = sorted(zip(out["item_a"], out["item_b"], out["support"]))
    assert got == [(10, 11, 1)]         # basket 1 (3 items) skipped whole


def test_assoc_rules_brute_force(ray_session):
    from jsonschema_validator_ray.stages.itemsets import assoc_rules

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "basket": rng.integers(0, 40, size=500),
        "item": rng.integers(0, 15, size=500)})
    ds = ray.data.from_pandas(df)
    out = assoc_rules(ds, "basket", "item", min_support=2,
                      num_buckets=4).to_pandas()
    d = df.drop_duplicates()
    n_baskets = d["basket"].nunique()
    item_sup = d.groupby("item")["basket"].nunique().to_dict()
    pair_sup = {}
    for _, g in d.groupby("basket"):
        for a, b in itertools.combinations(sorted(g["item"].unique()), 2):
            pair_sup[(a, b)] = pair_sup.get((a, b), 0) + 1
    want = sorted(
        (a, b, n, n / item_sup[a], n / item_sup[b],
         (n * n_baskets) / (item_sup[a] * item_sup[b]))
        for (a, b), n in pair_sup.items() if n >= 2)
    got = sorted(zip(out["item_a"], out["item_b"], out["support"],
                     out["conf_ab"], out["conf_ba"], out["lift"]))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == w[3] and g[4] == w[4] and g[5] == w[5]  # bit-exact


def test_bpe_pair_counts_brute_force(ray_session):
    from collections import Counter

    from jsonschema_validator_ray.stages.bpestats import pair_counts

    texts = ["abracadabra", "the cat sat", "日本語テスト日本", "xy",
             "", "a", None, "ααββ", "abracadabra"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    out = pair_counts(ds, "text", top_k=50).to_pandas()
    ref = Counter()
    for t in texts:
        if t:
            for i in range(len(t) - 1):
                ref[t[i:i + 2]] += 1
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = list(zip(out["pair"], out["n"]))
    assert got == want
