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


def test_hhi_planted_and_paths(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "lang": pa.array(["aa"] * 8 + ["bb"] * 12),
        "source": pa.array(["s1"] * 8 + ["s1", "s2", "s3", "s4"] * 3),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.corpus import hhi_source_by_lang

    out = _df(hhi_source_by_lang(str(d))).set_index("lang")
    assert int(out.loc["aa", "hhi_e6"]) == 1_000_000   # single source
    assert int(out.loc["bb", "hhi_e6"]) == 250_000     # 4 even sources
    fast = _df(hhi_source_by_lang(SF))
    slow = _df(hhi_source_by_lang(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow[fast.columns].reset_index(drop=True),
                                  check_dtype=False)


def test_theil_bruteforce(ray_session):
    from jsonschema_validator_ray.pipelines.corpus import (
        theil_length_by_lang)

    fast = _df(theil_length_by_lang(SF))
    slow = _df(theil_length_by_lang(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow[fast.columns].reset_index(drop=True),
                                  check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    for _, r in fast.iterrows():
        x = docs[docs["lang"] == r["lang"]]["n_chars"] \
            .to_numpy(np.float64)
        mu = x.mean()
        want = float(np.mean((x / mu) * np.log(x / mu)))
        assert abs(r["theil"] - want) < 1e-6    # 1e-9 ln quantization
        assert r["theil"] >= 0.0


def test_theil_equal_lengths_is_zero(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"lang": pa.array(["aa"] * 10),
                             "n_chars": pa.array([500] * 10)}),
                   str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.corpus import (
        theil_length_by_lang)

    out = _df(theil_length_by_lang(str(d)))
    assert float(out["theil"][0]) == 0.0


def test_ess_formula_and_equal_weights(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.corpus import ess_chars_by_lang

    fast = _df(ess_chars_by_lang(SF))
    slow = _df(ess_chars_by_lang(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow[fast.columns].reset_index(drop=True),
                                  check_dtype=False)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    for _, r in fast.iterrows():
        w = docs[docs["lang"] == r["lang"]]["n_chars"].to_numpy(np.int64)
        assert r["ess"] == float(int(w.sum()) ** 2) / float(
            int((w.astype(object) ** 2).sum()))
        assert r["ess"] <= r["n_docs"]
    # equal weights -> ESS == n exactly
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"lang": pa.array(["aa"] * 7),
                             "n_chars": pa.array([123] * 7)}),
                   str(d / "documents.parquet"))
    out = _df(ess_chars_by_lang(str(d)))
    assert float(out["ess"][0]) == 7.0


def test_topk_agreement_bruteforce(ray_session):
    from jsonschema_validator_ray.pipelines.features import (
        topk_agreement_embeddings)

    out = _df(topk_agreement_embeddings(SF))
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    n = len(emb)
    assert int(out["n_queries"].sum()) == n
    ids = emb["vec_id"].to_numpy(np.int64)
    raw = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(ids, kind="stable")
    ids, raw = ids[order], raw[order]
    fine = np.floor(raw * 100000).astype(np.int64)
    coarse = np.floor(raw * 16).astype(np.int64)
    hist = np.zeros(4, np.int64)
    df_ = fine @ fine.T
    dc = coarse @ coarse.T
    for i in range(n):
        live = np.arange(n) != i
        nid = ids[live]
        t1 = nid[np.lexsort((nid, -df_[i][live]))[:3]]
        t2 = nid[np.lexsort((nid, -dc[i][live]))[:3]]
        hist[len(np.intersect1d(t1, t2))] += 1
    got = dict(zip(out["overlap"].astype(int), out["n_queries"].astype(int)))
    for ov in range(4):
        assert got.get(ov, 0) == int(hist[ov])


def test_ols2_matches_lstsq(ray_session):
    from jsonschema_validator_ray.pipelines.checks import (
        ols2_price_qty_discount)

    fast = _df(ols2_price_qty_discount(SF))
    slow = _df(ols2_price_qty_discount(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_discount",
                                  "l_extendedprice"])
    x1 = np.round(li["l_quantity"].to_numpy()).astype(np.float64)
    x2 = np.round(li["l_discount"].to_numpy() * 100).astype(np.float64)
    y = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.float64)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    r = fast.iloc[0]
    assert abs(r["b0"] - beta[0]) < 1e-4 * max(1, abs(beta[0]))
    assert abs(r["b1"] - beta[1]) < 1e-6 * max(1, abs(beta[1]))
    assert abs(r["b2"] - beta[2]) < 1e-6 * max(1, abs(beta[2]))
    assert int(r["n_rows"]) == len(li)


def test_ols2_exact_plane(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    # y = 500 + 300*x1 + 700*x2 cents exactly: betas must be EXACT
    rng = np.random.default_rng(7)
    x1 = rng.integers(1, 50, 200).astype(np.float64)
    x2 = rng.integers(0, 11, 200).astype(np.float64)
    y = (500 + 300 * x1 + 700 * x2) / 100.0
    pq.write_table(pa.table({"l_quantity": pa.array(x1),
                             "l_discount": pa.array(x2 / 100.0),
                             "l_extendedprice": pa.array(y)}),
                   str(d / "lineitem.parquet"))
    from jsonschema_validator_ray.pipelines.checks import (
        ols2_price_qty_discount)

    out = _df(ols2_price_qty_discount(str(d)))
    assert out["b0"][0] == 500.0
    assert out["b1"][0] == 300.0
    assert out["b2"][0] == 700.0


def test_cohens_kappa_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    # perfect agreement -> kappa = 1; then known mixed table
    texts = ["w " * 60] * 6 + ["short"] * 4
    pq.write_table(pa.table({
        "text": pa.array(texts),
        "n_chars": pa.array([400] * 6 + [5] * 4),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.dq import (
        cohens_kappa_gates_documents)

    out = _df(cohens_kappa_gates_documents(str(d)))
    assert float(out["kappa"][0]) == 1.0
    assert int(out["n_both"][0]) == 6 and int(out["n_neither"][0]) == 4

    fast = _df(cohens_kappa_gates_documents(SF))
    slow = _df(cohens_kappa_gates_documents(SF, block_gate=0))
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
    # brute-force confusion parity; both gates must be non-constant
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "n_chars"])
    g1 = (docs["n_chars"] >= 300).to_numpy()
    g2 = (docs["text"].str.count(" ") >= 50).to_numpy()
    assert 0 < g2.sum() < len(docs)
    a = int((g1 & g2).sum())
    dd = int((~g1 & ~g2).sum())
    n = len(docs)
    bb = int((g1 & ~g2).sum())
    cc = int((~g1 & g2).sum())
    e = (a + bb) * (a + cc) + (cc + dd) * (bb + dd)
    want = (n * (a + dd) - e) / (n * n - e)
    r = fast.iloc[0]
    assert int(r["n_both"]) == a and int(r["n_neither"]) == dd
    assert abs(r["kappa"] - want) < 1e-12
