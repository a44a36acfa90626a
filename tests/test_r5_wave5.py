"""Round-5 wave-5 additions: Welch's t, AUC/Cliff's delta, one-way ANOVA F,
Hodges-Lehmann shift — brute-force parity + forced-exchange path equality.
Oracle exactness is covered by tools/check_oracle.py."""

import math

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _df(out):
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def test_welch_t_formula_parity(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        welch_t_chars_langs)

    fast = _df(welch_t_chars_langs(SF))
    slow = _df(welch_t_chars_langs(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    a = docs[docs["lang"] == "en"]["n_chars"].to_numpy(np.float64)
    b = docs[docs["lang"] == "de"]["n_chars"].to_numpy(np.float64)
    want = (a.mean() - b.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    r = fast.iloc[0]
    assert int(r["n_a"]) == len(a) and int(r["n_b"]) == len(b)
    assert abs(r["t"] - want) < 1e-9


def test_auc_cliffs_bruteforce(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import auc_chars_langs

    fast = _df(auc_chars_langs(SF))
    slow = _df(auc_chars_langs(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    a = docs[docs["lang"] == "en"]["n_chars"].to_numpy(np.int64)
    b = docs[docs["lang"] == "de"]["n_chars"].to_numpy(np.int64)
    gt = int((a[:, None] > b[None, :]).sum())
    eq = int((a[:, None] == b[None, :]).sum())
    lt = len(a) * len(b) - gt - eq
    r = fast.iloc[0]
    assert int(r["u2_a"]) == 2 * gt + eq
    assert r["auc"] == (gt + 0.5 * eq) / (len(a) * len(b))
    assert abs(r["cliffs_delta"] - (gt - lt) / (len(a) * len(b))) < 1e-12


def test_anova_f_bruteforce(ray_session):
    from jsonschema_validator_ray.pipelines.checks import anova_f_qty_flag

    fast = _df(anova_f_qty_flag(SF))
    slow = _df(anova_f_qty_flag(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    groups = [g["l_quantity"].to_numpy(np.float64)
              for _, g in li.groupby("l_returnflag")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    want = (ssb / (k - 1)) / (ssw / (n - k))
    r = fast.iloc[0]
    assert int(r["n_rows"]) == n and int(r["k_groups"]) == 3
    assert abs(r["f"] - want) < 1e-9


def test_hodges_lehmann_bruteforce(ray_session):
    from jsonschema_validator_ray.pipelines.checks import hodges_lehmann_qty

    fast = _df(hodges_lehmann_qty(SF))
    slow = _df(hodges_lehmann_qty(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    a = li[li["l_returnflag"] == "A"]["l_quantity"].to_numpy(np.int64)
    b = li[li["l_returnflag"] == "R"]["l_quantity"].to_numpy(np.int64)
    diffs = np.sort((a[:, None] - b[None, :]).ravel())
    tot = len(diffs)
    want = int(diffs[(tot + 1) // 2 - 1])   # lower weighted median
    r = fast.iloc[0]
    assert int(r["n_pairs"]) == tot
    assert int(r["hl_diff"]) == want


def test_hodges_lehmann_planted_shift(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    # group A = group R + exactly 7 (same multiset shifted): HL must be 7
    base = np.tile(np.arange(1, 11), 5).astype(np.float64)
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A"] * 50 + ["R"] * 50),
        "l_quantity": pa.array(np.concatenate([base + 7, base])),
    }), str(d / "lineitem.parquet"))
    from jsonschema_validator_ray.pipelines.checks import hodges_lehmann_qty

    out = _df(hodges_lehmann_qty(str(d)))
    assert int(out["hl_diff"][0]) == 7
    assert int(out["n_pairs"][0]) == 2500
