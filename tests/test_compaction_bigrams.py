"""Tests for keep-latest-per-key compaction (stages/compaction) and the
top-bigram repetition signal (functions/text.top_bigram_batch)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ---- top_bigram_batch -------------------------------------------------------


def _sig(texts):
    from jsonschema_validator_ray.functions.text import top_bigram_batch

    return top_bigram_batch(pa.table({"text": pa.array(texts, pa.string())}))


def test_top_bigram_basic_and_tiebreak():
    out = _sig(["a b a b c", "z y z y x y"]).to_pydict()
    # row 0: bigrams = a-b, b-a, a-b, b-c → top "a b" ×2 of 4
    # row 1: z-y ×2, y-z ×1, y-x ×1, x-y ×1 → "z y" ×2 of 5
    assert out["__row"] == [0, 1]
    assert out["top_bigram"] == ["a b", "z y"]
    assert out["top_bigram_count"] == [2, 2]
    assert out["n_bigrams"] == [4, 5]
    assert out["bigram_frac"] == [0.5, 2.0 / 5.0]
    # all-distinct bigrams: every count ties at 1 → lexicographically
    # smallest bigram wins
    out = _sig(["d c b a"]).to_pydict()
    assert out["top_bigram"] == ["b a"]
    assert out["top_bigram_count"] == [1]


def test_top_bigram_skips_short_null_and_whitespace():
    # null text, empty, single token, whitespace-only → no row emitted;
    # leading/trailing/multi-space must not fabricate empty-token bigrams
    out = _sig([None, "", "solo", "   ", "  a   b  "]).to_pydict()
    assert out["__row"] == [4]
    assert out["top_bigram"] == ["a b"]
    assert out["n_bigrams"] == [1]
    # whole-batch degenerate: nothing with >= 2 tokens
    empty = _sig([None, "one"])
    assert empty.num_rows == 0
    assert empty.column_names == ["top_bigram", "top_bigram_count",
                                  "n_bigrams", "bigram_frac", "__row"]


def test_top_bigram_matches_bruteforce():
    rng = np.random.default_rng(11)
    vocab = list("abcdefgh")
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 40)))
             for _ in range(200)]
    out = _sig(texts).to_pydict()
    assert out["__row"] == list(range(200))
    for i, t in enumerate(texts):
        toks = t.split()
        bigs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        cnt = pd.Series(bigs).value_counts()
        top_c = int(cnt.max())
        best = min(g for g, c in cnt.items() if c == top_c)
        assert out["top_bigram"][i] == best, i
        assert out["top_bigram_count"][i] == top_c
        assert out["n_bigrams"][i] == len(bigs)


# ---- keep_latest ------------------------------------------------------------


def test_keep_latest_matches_pandas(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.compaction import keep_latest

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k1": rng.integers(0, 40, n),
        "k2": rng.choice(["a", "b", "c"], n),
        "ord": rng.integers(0, 50, n).astype(np.int64),
        "payload": rng.normal(size=n),
    })
    got = (keep_latest(ray.data.from_pandas(df).repartition(6),
                       ["k1", "k2"], "ord", tiebreak="rid", num_buckets=8)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    want = (df.sort_values(["ord", "rid"], ascending=False)
              .drop_duplicates(["k1", "k2"])
              .sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["rid", "k1", "k2", "ord", "payload"]],
        want[["rid", "k1", "k2", "ord", "payload"]])
    # exactly one survivor per distinct key tuple
    assert len(got) == df.groupby(["k1", "k2"]).ngroups


def test_keep_latest_null_order_loses(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.compaction import keep_latest

    df = pd.DataFrame({
        "rid": [1, 2, 3, 4],
        "k": ["x", "x", "y", "y"],
        "ord": pd.array([10, None, None, None], dtype="Int64"),
    })
    got = (keep_latest(ray.data.from_pandas(df), ["k"], "ord",
                       tiebreak="rid", num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # x: non-null 10 beats null; y: all-null → greatest rid survives
    assert list(got["rid"]) == [1, 4]


# ---- fused one-scan signal sweep ---------------------------------------------


def test_signals_sweep_agrees_with_parts(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.corpus import (
        bigram_documents, quality_documents, repetition_documents,
        signals_documents)

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    # add edge rows: null text, empty, single token
    extra = pa.table({
        "doc_id": pa.array([10**6, 10**6 + 1, 10**6 + 2], pa.int64()),
        "text": pa.array([None, "", "solo"], pa.string()),
        "lang": pa.array(["en"] * 3), "source": pa.array(["t"] * 3),
        "n_chars": pa.array([0, 0, 4], pa.int64()),
    })
    pq.write_table(pa.concat_tables([src.select(extra.column_names), extra]),
                   str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    fused = (signals_documents(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    q = quality_documents(sf).to_pandas().sort_values("doc_id")
    r = repetition_documents(sf).to_pandas().sort_values("doc_id")
    b = (bigram_documents(sf).to_pandas()
         .set_index("doc_id").sort_index())
    def eq(a, b):   # NaN-tolerant column equality
        return list(pd.Series(a).fillna(-1)) == list(pd.Series(b).fillna(-1))

    assert eq(fused["n_tokens"], q["n_tokens"].to_numpy())
    assert eq(fused["n_distinct"], r["n_distinct"].to_numpy())
    assert eq(fused["top_count"], r["top_count"].to_numpy())
    sub = fused.set_index("doc_id").loc[b.index]
    assert list(sub["top_bigram"]) == list(b["top_bigram"])
    assert list(sub["n_bigrams"]) == list(b["n_bigrams"])
    assert list(sub["bigram_frac"]) == list(b["bigram_frac"])
    # rows WITHOUT a bigram carry nulls in the bigram columns
    no_big = fused[~fused["doc_id"].isin(b.index)]
    assert no_big["top_bigram"].isna().all()
    assert no_big["bigram_frac"].isna().all()
