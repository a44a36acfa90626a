"""Table-level check stages over real testdata: stats, uniqueness,
referential, drift."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def lineitem(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF_SMOKE}/lineitem.parquet")


def test_column_stats_exact_fields(ray_session, lineitem):
    import duckdb

    from jsonschema_validator_ray.stages import column_stats

    out = column_stats(lineitem, ["l_quantity", "l_extendedprice", "l_returnflag"],
                       batch_size=1024).to_pandas().set_index("column")
    con = duckdb.connect()
    exact = con.execute(f"""
        SELECT count(*) n, min(l_quantity) q_min, max(l_quantity) q_max,
               avg(l_quantity) q_mean, count(DISTINCT l_quantity) q_distinct,
               min(l_returnflag) rf_min, max(l_returnflag) rf_max,
               quantile_cont(l_extendedprice, 0.5) ep_p50
        FROM '{SF_SMOKE}/lineitem.parquet'
    """).df().iloc[0]
    q = out.loc["l_quantity"]
    assert q["cnt"] == exact["n"] and q["nulls"] == 0
    assert q["min_num"] == exact["q_min"] and q["max_num"] == exact["q_max"]
    assert q["mean_num"] == pytest.approx(exact["q_mean"], rel=1e-9)
    # HLL distinct within 5% of exact (50 distinct values → linear counting)
    assert abs(q["distinct_est"] - exact["q_distinct"]) / exact["q_distinct"] < 0.05
    rf = out.loc["l_returnflag"]
    assert rf["min_str"] == exact["rf_min"] and rf["max_str"] == exact["rf_max"]
    ep = out.loc["l_extendedprice"]
    assert abs(ep["p50"] - exact["ep_p50"]) / exact["ep_p50"] < 0.02


def test_duplicate_keys_matches_sql(ray_session):
    import duckdb
    import ray.data

    from jsonschema_validator_ray.stages import duplicate_keys

    orders = ray.data.read_parquet(f"{SF_SMOKE}/orders.parquet")
    ours = duplicate_keys(orders, "o_custkey", batch_size=256).to_pandas()
    theirs = duckdb.connect().execute(f"""
        SELECT o_custkey, count(*) dup_count
        FROM '{SF_SMOKE}/orders.parquet'
        GROUP BY o_custkey HAVING count(*) > 1
    """).df()
    ours = ours.sort_values("o_custkey").reset_index(drop=True)
    theirs = theirs.sort_values("o_custkey").reset_index(drop=True)
    assert len(ours) == len(theirs)
    assert (ours["o_custkey"].to_numpy() == theirs["o_custkey"].to_numpy()).all()
    assert (ours["dup_count"].to_numpy() == theirs["dup_count"].to_numpy()).all()


def test_duplicate_keys_none_when_unique(ray_session, lineitem):
    from jsonschema_validator_ray.stages import duplicate_keys

    # (l_orderkey, l_linenumber) is unique but l_orderkey alone is not
    dups = duplicate_keys(lineitem, "l_orderkey")
    assert dups.count() > 0


def test_referential_broadcast_dictionary(ray_session):
    import ray.data

    from jsonschema_validator_ray.functions.iso639 import ISO_639_1
    from jsonschema_validator_ray.stages import referential_violations

    docs = ray.data.read_parquet(f"{SF_SMOKE}/documents.parquet")
    bad = referential_violations(docs, "lang", "doc_id", ISO_639_1)
    # testdata langs are all valid ISO-639-1 → zero violations
    assert bad.count() == 0
    # restrict the dictionary → violations appear, tagged with constraint_id
    bad2 = referential_violations(docs, "lang", "doc_id", ["en", "de"],
                                  constraint_id="referential:lang").to_pandas()
    assert len(bad2) > 0
    assert set(bad2.columns) == {"doc_id", "lang", "constraint_id"}
    assert (bad2["constraint_id"] == "referential:lang").all()
    assert not bad2["lang"].isin(["en", "de"]).any()


def test_fk_violations_clean_and_dirty(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages import fk_violations

    orders = ray.data.read_parquet(f"{SF_SMOKE}/orders.parquet")
    customer = ray.data.read_parquet(f"{SF_SMOKE}/customer.parquet")
    # clean FK in testdata
    assert fk_violations(orders, "o_orderkey", "o_custkey",
                         customer, "c_custkey").count() == 0
    # dirty: restrict the dimension side
    small_dim = customer.filter(expr="c_custkey < 50")
    bad = fk_violations(orders, "o_orderkey", "o_custkey", small_dim, "c_custkey")
    assert bad.count() > 0


def test_drift_same_vs_shifted(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages import drift_check
    from jsonschema_validator_ray.state import CategoricalHistogram

    docs = ray.data.read_parquet(f"{SF_SMOKE}/documents.parquet")
    # baseline = actual lang distribution
    baseline = CategoricalHistogram(["en", "zh", "es", "de", "fr"])
    langs = docs.to_pandas()["lang"]
    baseline.add_counts(langs.value_counts().to_dict())
    rpt = drift_check(docs, "lang", baseline.to_json())
    assert not rpt.drifted and rpt.psi < 0.01

    # drifted baseline: pretend baseline was 95% en
    fake = CategoricalHistogram(["en", "zh", "es", "de", "fr"],
                                counts=np.array([950, 20, 10, 10, 10]))
    rpt2 = drift_check(docs, "lang", fake.to_json())
    assert rpt2.drifted and rpt2.psi > 0.25
    assert rpt2.kl > 0.0


def test_drift_numeric(ray_session, lineitem):
    from jsonschema_validator_ray.stages import drift_check
    from jsonschema_validator_ray.state import NumericHistogram

    edges = np.linspace(0, 55, 12)
    base = NumericHistogram(edges)
    base.add_values(lineitem.to_pandas()["l_quantity"].to_numpy(dtype=float))
    rpt = drift_check(lineitem, "l_quantity", base.to_json())
    assert not rpt.drifted and rpt.psi < 1e-6  # identical data


def test_row_rules_match_sql(ray_session, lineitem):
    import duckdb

    from jsonschema_validator_ray.stages.rowrules import row_rule_violations

    rules = [
        {"id": "discount_le_tax", "left": "l_discount", "op": "le",
         "right": "l_tax"},
        {"id": "qty_positive", "left": "l_quantity", "op": "gt",
         "right": {"const": 0.0}},
        {"id": "price_ge_qty", "left": "l_extendedprice", "op": "ge",
         "right": "l_quantity"},
    ]
    out = row_rule_violations(lineitem, rules,
                              ["l_orderkey", "l_linenumber"]).to_pandas()
    sql = duckdb.connect().execute(f"""
        WITH li AS (SELECT * FROM '{SF_SMOKE}/lineitem.parquet')
        SELECT l_orderkey, l_linenumber, 'discount_le_tax' AS cid
        FROM li WHERE NOT (l_discount <= l_tax)
        UNION ALL SELECT l_orderkey, l_linenumber, 'qty_positive'
        FROM li WHERE NOT (l_quantity > 0)
        UNION ALL SELECT l_orderkey, l_linenumber, 'price_ge_qty'
        FROM li WHERE NOT (l_extendedprice >= l_quantity)
    """).df()
    key = ["l_orderkey", "l_linenumber", "constraint_id"]
    ours = set(map(tuple, out[key].itertuples(index=False)))
    theirs = set(map(tuple, sql.itertuples(index=False)))
    assert ours == theirs and len(out) == len(sql)


def test_row_rules_null_sides_not_violations(ray_session):
    import pyarrow as pa
    import ray.data

    from jsonschema_validator_ray.stages.rowrules import row_rule_violations

    t = pa.table({
        "k": [1, 2, 3, 4],
        "a": pa.array([1.0, None, 5.0, 2.0]),
        "b": pa.array([2.0, 1.0, None, 1.0]),
    })
    out = row_rule_violations(
        ray.data.from_arrow(t),
        [{"id": "a_le_b", "left": "a", "op": "le", "right": "b"}],
        ["k"]).to_pandas()
    # rows 2/3 have a null side -> never violations; only k=4 fails
    assert sorted(out["k"].tolist()) == [4]


def test_group_distinct_count(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data

    from jsonschema_validator_ray.stages.uniqueness import group_distinct_count

    # planted corner cases: null values (not counted), null group (counted),
    # heavy skew (one value everywhere)
    t = pa.table({
        "g": ["a", "a", "a", "b", "b", None, None, "c"],
        "v": ["x", "x", "y", "x", None, "z", "z", None],
    })
    out = group_distinct_count(ray.data.from_arrow(t), "g", "v",
                               n_buckets=4).to_pandas()
    got = {(None if pd_isna(r["g"]) else r["g"]): r["n_distinct"]
           for _, r in out.iterrows()}
    assert got == {"a": 2, "b": 1, None: 1, "c": 0}  # null-only group → 0

    # distributed final fold (forced with limit=0) ≡ driver fold
    out2 = group_distinct_count(ray.data.from_arrow(t), "g", "v",
                                n_buckets=4, driver_fold_limit=0).to_pandas()
    got2 = {(None if pd_isna(r["g"]) else r["g"]): r["n_distinct"]
            for _, r in out2.iterrows()}
    assert got2 == got

    sql = duckdb.connect().execute(f"""
        SELECT lang, COUNT(DISTINCT source) AS n FROM
        '{SF_SMOKE}/documents.parquet' GROUP BY lang ORDER BY lang
    """).df()
    import ray.data as rd
    ours = group_distinct_count(
        rd.read_parquet(f"{SF_SMOKE}/documents.parquet",
                        columns=["lang", "source"]),
        "lang", "source").to_pandas().sort_values("lang")
    assert ours["n_distinct"].tolist() == sql["n"].tolist()


def pd_isna(x):
    import pandas as pd
    return pd.isna(x)


def test_bloom_filter_properties():
    import numpy as np

    from jsonschema_validator_ray.state.bloom import BloomFilter, bits_for

    m, k = bits_for(10_000, 0.01)
    present = np.arange(10_000)
    absent = np.arange(20_000, 40_000)
    bf = BloomFilter(m, k)
    bf.add_values(present)
    assert bf.contains(present).all()            # zero false negatives
    fp_rate = bf.contains(absent).mean()
    assert fp_rate < 0.03                        # ~1% target, 3x slack
    # merge == union; wire format round-trips
    a, b = BloomFilter(m, k), BloomFilter(m, k)
    a.add_values(present[:5000]); b.add_values(present[5000:])
    m2 = BloomFilter.from_bytes(a.to_bytes()).merge(
        BloomFilter.from_bytes(b.to_bytes()))
    assert m2.contains(present).all()
    assert (m2.words == bf.words).all()


def test_fk_violations_bloom(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.referential import (
        fk_violations, fk_violations_bloom)

    orders = ray.data.read_parquet(f"{SF_SMOKE}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    dim = ray.data.read_parquet(f"{SF_SMOKE}/customer.parquet",
                                columns=["c_custkey"]) \
        .filter(expr="c_custkey <= 100")
    exact = fk_violations(orders, "o_orderkey", "o_custkey",
                          dim, "c_custkey").to_pandas()
    bloom = fk_violations_bloom(orders, "o_orderkey", "o_custkey",
                                dim, "c_custkey",
                                expected_keys=200, fp=0.001).to_pandas()
    exact_keys = set(exact["o_orderkey"])
    bloom_keys = set(bloom["o_orderkey"])
    # never flags a valid row; misses at most ~fp of true violations
    assert bloom_keys <= exact_keys
    assert len(bloom_keys) >= 0.99 * len(exact_keys)


def test_psi_lang_matches_sql(ray_session):
    """PSI drift per-bin contributions are bit-identical to the SQL oracle
    (int/int division + libm ln, no float accumulation) at sf0.001."""
    import duckdb

    from jsonschema_validator_ray.pipelines.checks import (
        PSI_LANG_SQL, psi_lang_documents)

    ours = psi_lang_documents(SF_SMOKE).sort_values("lang") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/documents.parquet')")
    theirs = con.execute(PSI_LANG_SQL).df().sort_values("lang") \
        .reset_index(drop=True)
    assert list(ours.columns) == list(theirs.columns)
    assert ours["lang"].tolist() == theirs["lang"].tolist()
    assert (ours["n_base"] + ours["n_cur"]).sum() == 500
    # float equality is EXACT by construction
    assert ours["psi_contrib"].tolist() == theirs["psi_contrib"].tolist()
    assert ours["n_base"].tolist() == [int(x) for x in theirs["n_base"]]


def test_reconcile_orders_lineitem_inner_semantics(ray_session, tmp_path):
    """Reconciliation keeps only orderkeys present on BOTH sides, counts
    lines, and reports exact signed cent diffs."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    orders = pd.DataFrame({"o_orderkey": [1, 2, 3],
                           "o_totalprice": [30.00, 10.00, 5.00]})
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 99],            # 99: no matching order
        "l_extendedprice": [10.00, 19.99, 10.00, 7.00]})
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   str(d / "orders.parquet"))
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   str(d / "lineitem.parquet"))

    from jsonschema_validator_ray.pipelines.checks import (
        reconcile_orders_lineitem)

    out = reconcile_orders_lineitem(str(d)).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    assert list(out["o_orderkey"]) == [1, 2]     # 3 (no lines), 99 dropped
    assert list(out["n_lines"]) == [2, 1]
    # floor-cents: 19.99 is not representable, floor(19.99*100) == 1998 —
    # identical in both engines by construction
    assert list(out["line_cents"]) == [2998, 1000]
    assert list(out["total_cents"]) == [3000, 1000]
    assert list(out["diff_cents"]) == [2, 0]


def test_quartile_bins_boundary_semantics(ray_session, tmp_path):
    """Bin edges are the column's own exact discrete quartiles; values
    EQUAL to a threshold fall in the lower bin (v > t comparisons)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    # 8 values: quantile_disc(.25)=2, (.5)=4, (.75)=6
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame({"l_quantity": vals}), preserve_index=False),
        str(d / "lineitem.parquet"))

    from jsonschema_validator_ray.pipelines.checks import (
        quartile_bins_lineitem)

    out = quartile_bins_lineitem(str(d)).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    assert list(out["bucket"]) == [1, 2, 3, 4]
    assert list(out["n_rows"]) == [2, 2, 2, 2]


def test_grouped_moments_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.stats import grouped_moments

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(["A", "B", "C"], size=3000),
        "x": rng.integers(1, 51, size=3000).astype(float),
    })
    got = grouped_moments(ray.data.from_pandas(df).repartition(5), "g", "x")
    for _, row in got.iterrows():
        x = df.loc[df["g"] == row["g"], "x"].to_numpy()
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        assert row["n_rows"] == len(x)
        assert np.isclose(row["mean"], m, rtol=1e-12)
        assert np.isclose(row["std"], np.sqrt(m2), rtol=1e-12)
        assert np.isclose(row["skewness"], m3 / m2 ** 1.5, rtol=1e-9)
        assert np.isclose(row["kurtosis_excess"], m4 / m2 ** 2 - 3,
                          rtol=1e-9)


def test_grouped_moments_constant_and_scale(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.stats import grouped_moments

    df = pd.DataFrame({"g": ["k"] * 7 + ["s"] * 4,
                       "x": [3.25] * 7 + [1.00, 2.50, 2.50, 4.75]})
    got = grouped_moments(ray.data.from_pandas(df), "g", "x", scale=100)
    k = got[got["g"] == "k"].iloc[0]
    # constant column: zero variance => shape stats undefined (NaN), std 0
    assert k["std"] == 0.0 and np.isnan(k["skewness"]) \
        and np.isnan(k["kurtosis_excess"])
    assert np.isclose(k["mean"], 3.25, rtol=0)
    s = got[got["g"] == "s"].iloc[0]
    x = np.array([1.00, 2.50, 2.50, 4.75])
    assert np.isclose(s["mean"], x.mean(), rtol=1e-12)
    assert np.isclose(s["std"], x.std(), rtol=1e-12)


def test_zscore_outliers_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.stats import zscore_outliers

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n),
        "g": rng.choice(["a", "b"], size=n),
        "v": np.round(rng.normal(50, 10, size=n), 2),
    })
    # plant extreme rows and a null
    df.loc[0, "v"] = 500.0
    df.loc[1, "v"] = -400.0
    df.loc[2, "v"] = np.nan
    ds = ray.data.from_pandas(df).repartition(5)
    got = zscore_outliers(ds, "g", "v", ["id"], k=3).to_pandas() \
        .sort_values("id").reset_index(drop=True)

    want = []
    clean = df.dropna(subset=["v"])
    for key, sub in clean.groupby("g"):
        x = np.round(sub["v"].to_numpy() * 100).astype(np.int64)
        nn, s1, s2 = len(x), int(x.sum()), int((x * x).sum())
        lhs = (nn * x.astype(object) - s1) ** 2
        rhs = 9 * (nn * s2 - s1 * s1)
        want.extend(sub.loc[np.asarray(lhs > rhs, dtype=bool), "id"])
    assert sorted(got["id"]) == sorted(want)
    assert {0, 1} <= set(got["id"])      # planted extremes flagged
    assert 2 not in set(got["id"])       # null value dropped


def test_zscore_outliers_object_fallback(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.stats import zscore_outliers

    # x stays inside the stats pass's per-batch int64 bound, but
    # (n·|x| + |S1|)² > 2⁶³ so the flag scan's exact object-int path
    # must fire — and still flag only the planted row
    n = 3000
    noise = np.round(np.linspace(-0.5, 0.5, n), 2)
    vals = 10000.0 + noise
    vals[7] = 10100.0                    # the lone genuine outlier
    df = pd.DataFrame({"id": range(n), "g": ["z"] * n, "v": vals})
    st = zscore_outliers(ray.data.from_pandas(df).repartition(3),
                         "g", "v", ["id"], k=2).to_pandas()
    # bound check really exceeded int64 (fallback exercised, not int path)
    x = np.round(vals * 100).astype(np.int64)
    assert (n * int(np.abs(x).max()) + abs(int(x.sum()))) ** 2 >= 2 ** 63
    assert list(st["id"]) == [7]


def test_grouped_slope_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.stats import grouped_slope

    rng = np.random.default_rng(29)
    n = 2500
    x = rng.integers(1, 51, size=n).astype(float)
    df = pd.DataFrame({
        "g": rng.choice(["r", "s"], size=n),
        "x": x,
        "y": np.round(3.5 * x + 20 + rng.normal(0, 5, size=n), 2),
    })
    got = grouped_slope(ray.data.from_pandas(df).repartition(4),
                        "g", "x", "y", xscale=1, yscale=100)
    for _, row in got.iterrows():
        sub = df[df["g"] == row["g"]]
        xs = sub["x"].to_numpy()
        ys = np.round(sub["y"].to_numpy() * 100)   # cents, like the stage
        b, a = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert row["n_rows"] == len(sub)
        assert np.isclose(row["slope"], b, rtol=1e-9)
        assert np.isclose(row["intercept"], a, rtol=1e-7)
        assert np.isclose(row["r2"], r * r, rtol=1e-9)


def test_grouped_slope_degenerate(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.stats import grouped_slope

    # constant x → zero variance → NaN slope/r2, not a crash
    df = pd.DataFrame({"g": ["c"] * 5, "x": [4.0] * 5,
                       "y": [1.0, 2.0, 3.0, 4.0, 5.0]})
    got = grouped_slope(ray.data.from_pandas(df), "g", "x", "y")
    assert np.isnan(got.loc[0, "slope"]) and np.isnan(got.loc[0, "r2"])


def test_decile_assignment_boundary_ties(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.pipelines.checks import decile_documents
    # drive the REAL query end-to-end and re-derive with DuckDB directly
    got = decile_documents(SF_SMOKE).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = duckdb.connect().execute(f"""
        WITH d AS (SELECT * FROM '{SF_SMOKE}/documents.parquet'),
        e AS (SELECT quantile_disc(n_chars,
               [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM d)
        SELECT doc_id, n_chars,
               CAST(1 + (SELECT count(*) FROM unnest((SELECT qs FROM e))
                         AS t(v) WHERE n_chars > v) AS BIGINT) AS decile
        FROM d ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every decile 1..10 present and ordered with n_chars
    assert got["decile"].min() == 1 and got["decile"].max() == 10
    s = got.sort_values("n_chars")
    assert (np.diff(s["decile"].to_numpy()) >= 0).all()


def test_spearman_matches_pandas_rank_corr(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    rng = np.random.default_rng(13)
    q = rng.integers(1, 8, size=400).astype(np.float64)
    disc = np.round(((q * 3) % 5 + rng.integers(0, 3, size=400)) / 100, 2)
    pq.write_table(pa.table({
        "l_quantity": pa.array(q),
        "l_discount": pa.array(disc.astype(np.float64)),
    }), str(d / "lineitem.parquet"))
    from jsonschema_validator_ray.pipelines.checks import (
        spearman_qty_discount)

    out = spearman_qty_discount(str(d))
    rho = float(out["rho"][0])
    df = pd.DataFrame({"x": q, "y": disc})
    expect = df["x"].rank(method="average").corr(
        df["y"].rank(method="average"))
    assert rho == pytest.approx(expect, abs=1e-12)
    assert int(out["n_rows"][0]) == 400


def test_spearman_constant_column_is_zero(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "l_quantity": pa.array([3.0] * 10),
        "l_discount": pa.array(np.linspace(0, 0.09, 10)),
    }), str(d / "lineitem.parquet"))
    from jsonschema_validator_ray.pipelines.checks import (
        spearman_qty_discount)

    assert float(spearman_qty_discount(str(d))["rho"][0]) == 0.0


def test_kendall_matches_brute_force(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    rng = np.random.default_rng(17)
    q = rng.integers(1, 6, size=120).astype(np.float64)
    disc = np.round(((q + rng.integers(0, 4, size=120)) % 5) / 100, 2)
    pq.write_table(pa.table({
        "l_quantity": pa.array(q),
        "l_discount": pa.array(disc.astype(np.float64)),
    }), str(d / "lineitem.parquet"))
    from jsonschema_validator_ray.pipelines.checks import (
        kendall_qty_discount)

    out = kendall_qty_discount(str(d))
    # brute-force tau-b over all pairs
    x, y = q, disc
    C = D = 0
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            s = np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
            C += s > 0
            D += s < 0
    n = len(x)
    T = n * (n - 1) // 2
    tx = sum(c * (c - 1) // 2 for c in
             np.unique(x, return_counts=True)[1])
    ty = sum(c * (c - 1) // 2 for c in
             np.unique(y, return_counts=True)[1])
    expect = (C - D) / np.sqrt(float(T - tx) * float(T - ty))
    assert float(out["tau_b"][0]) == pytest.approx(expect, abs=1e-12)
