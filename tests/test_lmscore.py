"""Unigram-LM cross-entropy scoring (stages/lmscore) — brute-force parity
and broadcast ≡ join strategy agreement (the oracle query covers the SQL
side)."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data

from jsonschema_validator_ray.stages.lmscore import xent_scores


def _brute(texts):
    toks = {i: [t for t in (x or "").split() if t]
            for i, x in enumerate(texts)}
    cnt = Counter(t for ts in toks.values() for t in ts)
    total = sum(cnt.values())
    lp = {t: math.floor(math.log(c / total) * 1_000_000)
          for t, c in cnt.items()}
    rows = []
    for i, ts in toks.items():
        x = -sum(lp[t] for t in ts)
        rows.append((i, len(ts), x,
                     None if not ts else x / len(ts)))
    return sorted(rows)


TEXTS = ["the cat sat on the mat", "the dog", "", None,
         "cat cat cat", "  spaced   out  ", "único token",
         "the the the the", "dog mat", "zz"]


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_xent_matches_brute_force(ray_session, strategy):
    df = pd.DataFrame({"doc_id": np.arange(len(TEXTS), dtype=np.int64),
                       "text": TEXTS})
    ds = ray.data.from_pandas(df)
    out = xent_scores(ds, "text", "doc_id", strategy=strategy,
                      num_buckets=4).to_pandas()
    got = sorted(
        (int(r.doc_id), int(r.n_tokens), int(r.xent_micronats),
         None if pd.isna(r.xent_per_token) else float(r.xent_per_token))
        for r in out.itertuples())
    assert got == _brute(TEXTS)


def test_xent_join_equals_broadcast_larger(ray_session):
    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    a = xent_scores(ds, "text", "doc_id", strategy="broadcast",
                    num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = xent_scores(ds, "text", "doc_id", strategy="join",
                    num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["doc_id", "n_tokens", "xent_micronats", "xent_per_token"]],
        b[["doc_id", "n_tokens", "xent_micronats", "xent_per_token"]])
