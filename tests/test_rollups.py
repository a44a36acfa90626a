"""pipelines/rollups — grouped mode, moving-average frame, lifetime
survival, mutual information: path equality for the gated exchanges
(block_gate=0 forces the scale path) plus hand-computed semantics pins.
Oracle-exactness itself is covered by tools/check_oracle.py."""

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _df(out):
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def test_mode_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.rollups import (
        mode_event_type_users)

    fast = _df(mode_event_type_users(SF)) \
        .sort_values("user_id").reset_index(drop=True)
    slow = _df(mode_event_type_users(SF, block_gate=0)) \
        [fast.columns].sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) > 0
    # brute-force parity: pandas mode with the same tie rule
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    c = ev.groupby(["user_id", "event_type"]).size().reset_index(name="n")
    c = c.sort_values(["user_id", "n", "event_type"],
                      ascending=[True, False, True], kind="mergesort")
    want = c.drop_duplicates("user_id").reset_index(drop=True)
    got = fast.set_index("user_id")
    for _, r in want.iterrows():
        assert got.loc[r["user_id"], "mode_type"] == r["event_type"]
        assert int(got.loc[r["user_id"], "n_mode"]) == int(r["n"])


def test_moving_avg_frame(ray_session):
    from jsonschema_validator_ray.pipelines.rollups import (
        moving_avg_daily_events)

    out = _df(moving_avg_daily_events(SF))
    assert list(out["day"]) == sorted(out["day"])
    c = out["c"].to_numpy(np.int64)
    s = pd.Series(c).rolling(7, min_periods=1).sum().to_numpy(np.int64)
    n = pd.Series(c).rolling(7, min_periods=1).count().to_numpy(np.int64)
    assert (out["win_sum"].to_numpy(np.int64) == s).all()
    assert (out["win_n"].to_numpy(np.int64) == n).all()
    assert (out["avg_ppm"].to_numpy(np.int64)
            == (1_000_000 * s) // n).all()
    # forced-exchange path equality
    slow = _df(moving_avg_daily_events(SF, block_gate=0))
    pd.testing.assert_frame_equal(out, slow[out.columns],
                                  check_dtype=False)


def test_survival_curve(ray_session):
    from jsonschema_validator_ray.pipelines.rollups import (
        survival_users_events)

    out = _df(survival_users_events(SF))
    slow = _df(survival_users_events(SF, block_gate=0)) \
        .sort_values("lifetime_days").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.sort_values("lifetime_days").reset_index(drop=True),
        slow[out.columns], check_dtype=False)
    # invariants: at_risk is the reverse cumsum, survival monotone down
    n = out["n_users"].to_numpy(np.int64)
    ar = out["at_risk"].to_numpy(np.int64)
    assert ar[0] == n.sum()
    assert (ar[:-1] - n[:-1] == ar[1:]).all()
    sv = out["survival_ppm"].to_numpy(np.int64)
    assert (np.diff(sv) <= 0).all() and sv[-1] == 0


def test_mutual_info_nonneg_and_consistent(ray_session):
    from jsonschema_validator_ray.pipelines.rollups import (
        mutual_info_lang_source)

    out = _df(mutual_info_lang_source(SF))
    assert len(out) == 1
    n = int(out["n_rows"].iloc[0])
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"])
    assert n == len(docs)
    # reference MI in nats (float) — integer-ln value within 2e-6
    ct = docs.groupby(["lang", "source"]).size()
    rt = docs.groupby("lang").size()
    st = docs.groupby("source").size()
    mi = sum((o / n) * math.log(o * n / (rt[l] * st[s]))
             for (l, s), o in ct.items())
    assert abs(out["mi_nats"].iloc[0] - mi) < 2e-6


def test_hmean_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.rollups import hmean_chars_lang

    fast = _df(hmean_chars_lang(SF))
    slow = _df(hmean_chars_lang(SF, block_gate=0)) \
        .sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    # hmean <= arithmetic mean per lang (AM-HM inequality)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    am = docs.groupby("lang")["n_chars"].mean()
    for _, r in fast.iterrows():
        assert r["hmean"] <= am[r["lang"]] + 1e-9


def test_profile_diff_exchange_and_invariants(ray_session):
    from jsonschema_validator_ray.pipelines.rollups import (
        profile_diff_users)

    fast = _df(profile_diff_users(SF))
    slow = _df(profile_diff_users(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    r = fast.iloc[0]
    assert r["n_v2"] == r["n_added"] + r["n_changed"] + r["n_same"]
    assert r["n_v1"] == r["n_changed"] + r["n_same"]


def test_llr_bigrams_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.corpus import (
        llr_bigrams_documents)

    fast = _df(llr_bigrams_documents(SF))
    slow = _df(llr_bigrams_documents(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    assert len(fast) == 20
    # scores sorted descending, all counts positive
    g = fast["g2_units"].to_numpy()
    assert (g[:-1] >= g[1:]).all() and (fast["c12"] > 0).all()


def test_bm25_heads_and_exchange(ray_session):
    import numpy as np

    from jsonschema_validator_ray.pipelines.corpus import bm25_documents

    fast = _df(bm25_documents(SF))
    slow = _df(bm25_documents(SF, block_gate=0)) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    # per-term scores sorted desc; brute-force parity for one term
    for t, g in fast.groupby("term"):
        s = g["score"].to_numpy()
        assert (s[:-1] >= s[1:] - 1e-15).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = docs["text"].str.split()
    dl = toks.str.len()
    n, total = len(docs), int(dl.sum())
    avgdl = float(total) / n
    tf = toks.apply(lambda xs: sum(1 for x in xs if x == "hash"))
    df = int((tf > 0).sum())
    if df:
        import math
        idf = math.log((float(n) - df + 0.5) / (df + 0.5))
        hit = tf > 0
        score = idf * ((tf[hit].to_numpy(np.float64) * 2.2)
                       / (tf[hit].to_numpy(np.float64)
                          + 1.2 * (0.25 + (0.75 * dl[hit].to_numpy(
                              np.float64)) / avgdl)))
        order = np.lexsort((docs["doc_id"][hit].to_numpy(), -score))[:20]
        want = docs["doc_id"][hit].to_numpy()[order]
        got = fast[fast["term"] == "hash"]["doc_id"].to_numpy()
        assert (want == got).all()
