"""Kernel-level checks for the anomaly/QC operators: the vectorized burst
two-pointer vs a brute-force window count, the cell-histogram winsorize vs
a direct sort-based computation, the integer CUSUM identity, and the
end-to-end rank-frequency fold over testdata (Ray)."""

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _brute_burst(users, ts, window_s):
    out = {}
    for u, t in zip(users, ts):
        w = sum(1 for uu, tt in zip(users, ts)
                if uu == u and t <= tt < t + window_s)
        out[u] = max(out.get(u, 0), w)
    return out


def test_burst_two_pointer_matches_brute_force():
    rng = np.random.RandomState(7)
    users = rng.randint(0, 9, size=300)
    ts = rng.randint(0, 5000, size=300).astype(np.int64)
    window = 250
    # replicate the per-bucket kernel from anomaly.burst_users_events
    df = pd.DataFrame({"user_id": users, "t": ts}).sort_values(
        ["user_id", "t"], kind="mergesort")
    u = df["user_id"].to_numpy()
    t = df["t"].to_numpy()
    codes = pd.factorize(u)[0].astype(np.int64)
    span = np.int64(int(t.max()) - int(t.min()) + window + 1)
    shifted = (t - t.min()) + codes * span
    lo = np.searchsorted(shifted, shifted, side="left")
    hi = np.searchsorted(shifted, shifted + window, side="left")
    got = (pd.DataFrame({"u": u, "w": hi - lo})
           .groupby("u")["w"].max().to_dict())
    assert got == _brute_burst(users.tolist(), ts.tolist(), window)


def test_winsorized_cells_match_direct_sort():
    rng = np.random.RandomState(3)
    vals = rng.randint(100, 5000, size=1000).astype(np.int64)
    # direct: quantile_disc = element at ceil(q*n)-1 of the sorted rows
    sv = np.sort(vals)
    n = len(sv)
    lo = int(sv[max(math.ceil(0.1 * n) - 1, 0)])
    hi = int(sv[max(math.ceil(0.9 * n) - 1, 0)])
    want = int(np.clip(sv, lo, hi).sum())
    # cell-histogram route (the distributed fold's arithmetic)
    cells = pd.Series(vals).value_counts().sort_index()
    cv = cells.index.to_numpy(np.int64)
    cc = cells.to_numpy(np.int64)
    cum = np.cumsum(cc)

    def disc(q):
        rank = max(math.ceil(q * n) - 1, 0)
        return int(cv[np.searchsorted(cum, rank + 1)])

    assert (disc(0.1), disc(0.9)) == (lo, hi)
    got = int((np.clip(cv, lo, hi) * cc).sum())
    assert got == want


def test_cusum_score_detects_planted_level_shift():
    # flat rate 10/day for 20 days, then 30/day for 10 days: the max of
    # |n·prefix_k − k·total| must land exactly on the last flat day
    c = [10] * 20 + [30] * 10
    n, total = len(c), sum(c)
    prefix, best_k, best = 0, None, -1
    for k, ck in enumerate(c, start=1):
        prefix += ck
        s = abs(n * prefix - k * total)
        if s > best:
            best, best_k = s, k
    assert best_k == 20
    assert best == abs(n * 200 - 20 * total)


@pytest.mark.usefixtures("ray_session")
def test_rank_freq_cumulative_share_is_monotone_exact():
    from jsonschema_validator_ray.pipelines.anomaly import (
        token_rank_freq_documents)

    out = token_rank_freq_documents(SF_SMOKE, k=10)
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert (out["n_total"].to_numpy()[:-1] >=
            out["n_total"].to_numpy()[1:]).all()
    ppm = out["cum_ppm"].to_numpy()
    assert (ppm[:-1] <= ppm[1:]).all() and ppm[-1] <= 1_000_000
