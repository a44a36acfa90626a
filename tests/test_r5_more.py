"""Round-5 second-wave operators: distributed Lloyd k-means (brute-force
parity + forced-exchange path equality), per-language lexical diversity
(brute-force token counting), daily autocorrelation (corrcoef parity), and
the mean-shift change-point (exact-rational argmax parity)."""

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def emb_dir(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    n, d = 60, 6
    mat = (rng.rand(n, d).astype(np.float32) - 0.5) * 0.8
    t = pa.table({
        "vec_id": pa.array(np.arange(100, 100 + n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 3, n).astype(np.int32)),
    })
    dd = tmp_path / "sf"
    dd.mkdir()
    pq.write_table(t, str(dd / "embeddings.parquet"))
    return str(dd), mat, np.arange(100, 100 + n, dtype=np.int64)


def _brute_kmeans(mat, ids, k, iters):
    """Reference Lloyd per the op's exact spec: quantize once, int64
    distances, argmin first-win, truncating centroid division."""
    q = np.floor(mat.astype(np.float64) * 100000).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cent = q[order[:k]].copy()
    for _ in range(iters):
        d2 = ((q * q).sum(1, keepdims=True) - 2 * (q @ cent.T)
              + (cent * cent).sum(1)[None, :])
        cl = np.argmin(d2, axis=1)
        for j in range(k):
            m = cl == j
            if m.any():
                s = q[m].sum(0)
                cent[j] = np.sign(s) * (np.abs(s) // m.sum())
    d2 = ((q * q).sum(1, keepdims=True) - 2 * (q @ cent.T)
          + (cent * cent).sum(1)[None, :])
    cl = np.argmin(d2, axis=1)
    return cl, d2[np.arange(len(cl)), cl]


def test_kmeans_matches_brute_force(emb_dir):
    from jsonschema_validator_ray.pipelines.features import kmeans_embeddings

    sf, mat, ids = emb_dir
    got = kmeans_embeddings(sf, k=4, iters=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    cl, d2 = _brute_kmeans(mat, ids, 4, 2)
    assert got["vec_id"].tolist() == ids.tolist()
    assert got["cluster"].tolist() == cl.tolist()
    assert got["dist2"].tolist() == d2.tolist()
    assert got["cluster"].nunique() > 1


def test_kmeans_forced_exchange_path_equality(emb_dir):
    from jsonschema_validator_ray.pipelines.features import kmeans_embeddings

    sf, _, _ = emb_dir
    a = kmeans_embeddings(sf, k=3, iters=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = kmeans_embeddings(sf, k=3, iters=2, block_gate=0).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture()
def docs_dir(ray_session, tmp_path):
    rows = [
        (1, "a a b", "en", "s1"),
        (2, "a  b\tc", "en", "s1"),      # multi-whitespace split
        (3, "x x x x", "fr", "s2"),
        (4, "", "fr", "s2"),             # empty text: no tokens
        (5, "y", "de", "s1"),            # single token: excluded (N<=1)
        (6, "a a b", "en", "s2"),        # repeats doc 1's trigram
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    dd = tmp_path / "sf"
    dd.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(dd / "documents.parquet"))
    return str(dd)


def test_lexical_diversity_brute(docs_dir):
    from jsonschema_validator_ray.pipelines.corpus import (
        lexical_diversity_lang)

    got = lexical_diversity_lang(docs_dir).reset_index(drop=True)
    # en: docs 1,2,6 tokens -> counts a=5 b=3 c=1; N=9 V=3
    #   s2 = 5*4 + 3*2 + 0 = 26; ttr = 3e6//9; simpson = 26e9 // (9*8)
    # fr: x*4 -> N=4 V=1 s2=12; ttr=250000; simpson=12e9//12=1000000000
    # de: single token excluded
    exp = pd.DataFrame({
        "lang": ["en", "fr"],
        "vocab": np.array([3, 1], dtype=np.int64),
        "n_tokens": np.array([9, 4], dtype=np.int64),
        "ttr_ppm": np.array([3 * 10**6 // 9, 250000], dtype=np.int64),
        "simpson_ppb": np.array([26 * 10**9 // 72, 10**9],
                                dtype=np.int64),
    })
    pd.testing.assert_frame_equal(got, exp)


@pytest.fixture()
def ev_dir(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    rows = []
    eid = 0
    # type A: 12 days ramping counts; type B: flat 2/day for 5 days
    for day in range(1, 13):
        for _ in range(day):  # day k has k events
            rows.append((eid, pd.Timestamp(f"2024-03-{day:02d} 08:00:00"),
                         int(rng.randint(1, 5)), "A", 1.0, "{}"))
            eid += 1
    for day in range(1, 6):
        for _ in range(2):
            rows.append((eid, pd.Timestamp(f"2024-03-{day:02d} 09:00:00"),
                         7, "B", 1.0, "{}"))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    dd = tmp_path / "sf"
    dd.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(dd / "events.parquet"))
    return str(dd)


def test_autocorr_daily(ev_dir):
    from jsonschema_validator_ray.pipelines.anomaly import (
        autocorr_daily_events)

    got = autocorr_daily_events(ev_dir).reset_index(drop=True)
    # type A: counts 1..12; lag-1 r over (1..11, 2..12) is exactly 1
    a1 = got[(got["event_type"] == "A") & (got["lag"] == 1)].iloc[0]
    assert a1["n_pairs"] == 11
    assert a1["r"] == pytest.approx(1.0)
    a7 = got[(got["event_type"] == "A") & (got["lag"] == 7)].iloc[0]
    assert a7["n_pairs"] == 5
    ref = np.corrcoef(np.arange(1, 6), np.arange(8, 13))[0, 1]
    assert a7["r"] == pytest.approx(ref)
    # type B: constant series -> zero variance -> excluded entirely
    assert not (got["event_type"] == "B").any()
    # forced-exchange path equality
    g0 = autocorr_daily_events(ev_dir, block_gate=0).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, g0)


def test_changepoint_exact_rational_argmax(ev_dir):
    from jsonschema_validator_ray.pipelines.anomaly import (
        changepoint_daily_events)

    got = changepoint_daily_events(ev_dir).reset_index(drop=True)
    a = got[got["event_type"] == "A"].iloc[0]
    # exact-rational reference over the ramp 1..12
    c = list(range(1, 13))
    n, total = len(c), sum(c)
    best = (Fraction(-1), None)
    sx = 0
    for k in range(1, n):
        sx += c[k - 1]
        gain = Fraction((n - k) * sx - k * (total - sx)) ** 2 \
            / (k * (n - k))
        if gain > best[0]:
            best = (gain, k)
    assert a["split_day"] == f"2024-03-{best[1]:02d}"
    assert a["n_days"] == 12
    assert a["gain_q"] == int(best[0])  # floor of the exact rational
    # type B constant series: A = 0 at every split, gain 0, earliest day
    b = got[got["event_type"] == "B"].iloc[0]
    assert b["gain_q"] == 0 and b["split_day"] == "2024-03-01"


def test_novelty_first_owner(docs_dir):
    from jsonschema_validator_ray.pipelines.corpus import novelty_documents

    got = novelty_documents(docs_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc1 "a a b": 1 trigram, first owner; doc2 "a b c": 1, first;
    # doc3 "x x x x": 2 positions but 1 DISTINCT, first; doc6 repeats
    # doc1's trigram -> 0 novel; docs 4/5 have <3 tokens -> absent
    exp = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 6], dtype=np.int64),
        "n_distinct": np.array([1, 1, 1, 1], dtype=np.int64),
        "n_novel": np.array([1, 1, 1, 0], dtype=np.int64),
        "novelty_ppm": np.array([10**6, 10**6, 10**6, 0], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(got, exp)
