"""Round-5 wave-4 additions: cross-correlation, Mann-Whitney U, journey
prefixes, multi-pattern PII scan — brute-force parity + forced-exchange
path equality. Oracle exactness is covered by tools/check_oracle.py."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _df(out):
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def test_crosscorr_parity(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        crosscorr_daily_events)

    fast = _df(crosscorr_daily_events(SF))
    slow = _df(crosscorr_daily_events(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    # numpy corrcoef parity on the zero-filled dense series
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    d = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    lo, hi = d.min(), d.max()
    span = hi - lo + 1
    x = np.zeros(span, np.int64)
    y = np.zeros(span, np.int64)
    for arr, t in ((x, "click"), (y, "purchase")):
        sub = d[(ev["event_type"] == t).to_numpy()]
        u, c = np.unique(sub, return_counts=True)
        arr[u - lo] = c
    for _, r in fast.iterrows():
        lag = int(r["lag"])
        m = span - lag
        want = np.corrcoef(x[:m], y[lag:])[0, 1]
        assert abs(r["r"] - want) < 1e-12


def test_mannwhitney_scipy_free_parity(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        mannwhitney_chars_langs)

    fast = _df(mannwhitney_chars_langs(SF))
    slow = _df(mannwhitney_chars_langs(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    a = docs[docs["lang"] == "en"]["n_chars"].to_numpy()
    b = docs[docs["lang"] == "de"]["n_chars"].to_numpy()
    both = np.concatenate([a, b])
    # average ranks (1-based, ties = midrank) via double-argsort-free path
    order = pd.Series(both).rank(method="average").to_numpy()
    ranksum_a = order[:len(a)].sum()
    r = fast.iloc[0]
    assert int(r["n_a"]) == len(a) and int(r["n_b"]) == len(b)
    assert int(r["ranksum2_a"]) == int(round(2 * ranksum_a))
    u = ranksum_a - len(a) * (len(a) + 1) / 2
    assert int(r["u2_a"]) == int(round(2 * u))


def test_journey_prefixes_brute(ray_session):
    from jsonschema_validator_ray.pipelines.relational import (
        journey_prefixes_events)

    fast = _df(journey_prefixes_events(SF))
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    top3 = ev.groupby("user_id").head(3)
    sizes = top3.groupby("user_id")["event_type"].agg(["size", ">".join])
    paths = sizes[sizes["size"] >= 3]["join"]
    want = paths.value_counts()
    for _, r in fast.iterrows():
        assert int(want[r["prefix"]]) == int(r["n_users"])
    # top-1 really is the max
    assert fast["n_users"].iloc[0] == int(want.max())


def test_pii_scan_brute(ray_session):
    import re

    from jsonschema_validator_ray.pipelines.corpus import pii_scan_by_source

    fast = _df(pii_scan_by_source(SF))
    slow = _df(pii_scan_by_source(SF, block_gate=0))
    pd.testing.assert_frame_equal(
        fast, slow[fast.columns].sort_values(["source", "pat"],
                                             kind="mergesort")
        .reset_index(drop=True), check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    rx = re.compile("slow (scan|sort)")
    n = docs["text"].map(lambda s: len(rx.findall(s or "")))
    per = pd.DataFrame({"source": docs["source"], "n": n})
    want = per.groupby("source")["n"].agg(["sum", lambda s: (s > 0).sum()])
    got = fast[fast["pat"] == "slow_scan_sort"].set_index("source")
    for src, row in want.iterrows():
        if row["sum"] == 0:
            assert src not in got.index
        else:
            assert int(got.loc[src, "n_matches"]) == int(row["sum"])


def test_ewma_recursion(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import ewma_daily_events

    fast = _df(ewma_daily_events(SF))
    slow = _df(ewma_daily_events(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    # recursion invariant: u_t == (u_{t-1} + c_t*2^20) // 2
    u = fast["ewma_units"].to_numpy(np.int64)
    c = fast["c"].to_numpy(np.int64)
    prev = 0
    for i in range(len(u)):
        prev = (prev + (int(c[i]) << 20)) // 2
        assert u[i] == prev
    # dense calendar
    d = fast["day"].to_numpy(np.int64)
    assert (np.diff(d) == 1).all()


def test_nucleus_sources(ray_session):
    from jsonschema_validator_ray.pipelines.corpus import (
        nucleus_sources_lang)

    fast = _df(nucleus_sources_lang(SF))
    slow = _df(nucleus_sources_lang(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"])
    for _, r in fast.iterrows():
        g = docs[docs["lang"] == r["lang"]].groupby("source").size() \
            .sort_values(ascending=False)
        assert int(r["total_docs"]) == int(g.sum())
        # kept prefix reaches 90%, dropping its last source would not
        assert 100 * r["kept_docs"] >= 90 * r["total_docs"]
        if r["n_sources_kept"] > 1:
            prev = int(r["kept_docs"]) - int(
                g.sort_values(ascending=False).iloc[
                    int(r["n_sources_kept"]) - 1])
            assert 100 * prev < 90 * int(r["total_docs"])


def test_wasserstein_scipy_free(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        wasserstein_chars_langs)

    fast = _df(wasserstein_chars_langs(SF))
    slow = _df(wasserstein_chars_langs(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    a = np.sort(docs[docs["lang"] == "en"]["n_chars"].to_numpy(np.float64))
    b = np.sort(docs[docs["lang"] == "de"]["n_chars"].to_numpy(np.float64))
    # reference W1 via quantile-function integral on the merged grid
    allv = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, allv, side="right") / len(a)
    fb = np.searchsorted(b, allv, side="right") / len(b)
    w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(allv)))
    assert abs(fast["w1"].iloc[0] - w1) < 1e-9


def test_followups_brute(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import followups_events

    fast = _df(followups_events(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["t"] = ev["ts"].astype("int64")
    w = 3600 * 1_000_000
    cnt = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("t")
        t = g["t"].to_numpy()
        ty = g["event_type"].to_numpy()
        for i in range(len(t)):
            for j in range(len(t)):
                if t[j] > t[i] and t[j] <= t[i] + w:
                    cnt[(ty[i], ty[j])] = cnt.get((ty[i], ty[j]), 0) + 1
    got = {(r["prev_type"], r["event_type"]): int(r["n"])
           for _, r in fast.iterrows()}
    assert got == cnt


def test_markov_entropy_consistency(ray_session):
    import math

    from jsonschema_validator_ray.pipelines.analytics import (
        event_transitions,
        markov_entropy_events,
    )

    out = _df(markov_entropy_events(SF))
    cells = _df(event_transitions(SF))
    n = int(cells["n"].sum())
    assert int(out["n_pairs"].iloc[0]) == n
    # float reference within integer-ln floor error (1e-6 per unit mass)
    row = cells.groupby("prev_type")["n"].transform("sum")
    h = -sum((c / n) * math.log(c / r)
             for c, r in zip(cells["n"], row))
    got = out["h_cond_micronats"].iloc[0] / 1_000_000
    assert h - 2e-6 < got <= h + 2e-6
    assert 0 <= got <= math.log(cells["event_type"].nunique()) + 1e-9


def test_intra_spread_invariants(ray_session):
    from jsonschema_validator_ray.pipelines.corpus import (
        intra_spread_embeddings,
        label_centroids_embeddings,
    )

    out = _df(intra_spread_embeddings(SF))
    cents = _df(label_centroids_embeddings(SF))
    n_per = cents.groupby("label")["n_vecs"].first()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["label"])
    want = emb.groupby("label").size()
    for _, r in out.iterrows():
        assert int(r["n_vecs"]) == int(want[r["label"]])
        assert r["sum_d2"] >= 0
        assert abs(r["mean_d2"] - r["sum_d2"] / r["n_vecs"]) < 1e-9
    assert set(out["label"]) == set(n_per.index)
