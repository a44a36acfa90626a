"""Pivot (long→wide) and KS two-sample operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def long_df():
    rng = np.random.RandomState(7)
    return pd.DataFrame({
        "grp": rng.choice(["g1", "g2", "g3", "g4"], 5000),
        "cat": rng.choice(["x", "y", "z"], 5000),
        "val": rng.randint(0, 1000, 5000).astype(np.int64),
    })


@pytest.mark.parametrize("agg,np_agg", [("sum", "sum"), ("count", "count"),
                                        ("min", "min"), ("max", "max")])
def test_pivot_matches_pandas(ray_session, long_df, agg, np_agg):
    import ray.data

    from jsonschema_validator_ray.stages.pivot import pivot_table

    ds = ray.data.from_pandas(long_df).repartition(6)
    out = pivot_table(ds, "grp", "cat", "val", agg=agg, num_buckets=4) \
        .to_pandas().set_index("grp").sort_index()
    ref = long_df.pivot_table(index="grp", columns="cat", values="val",
                              aggfunc=np_agg, fill_value=0).sort_index()
    ref.columns = [f"val_{c}" for c in ref.columns]
    assert out.astype(np.int64).equals(ref.astype(np.int64))


def test_pivot_missing_combo_and_explicit_values(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.pivot import pivot_table

    df = pd.DataFrame({"grp": ["a", "a", "b"], "cat": ["x", "y", "x"],
                       "val": [1, 2, 4]})
    out = pivot_table(ray.data.from_pandas(df), "grp", "cat", "val",
                      num_buckets=2, pivot_values=["x", "y", "zz"]) \
        .to_pandas().set_index("grp").sort_index()
    assert list(out.columns) == ["val_x", "val_y", "val_zz"]
    assert out.loc["b"].tolist() == [4, 0, 0]   # missing combos zero-filled
    assert out.loc["a"].tolist() == [1, 2, 0]


def test_ks_identical_and_shifted(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.ks import (ks_two_datasets,
                                                    ks_two_sample)

    rng = np.random.RandomState(11)
    a = rng.randint(0, 50, 4000)
    b_same = rng.randint(0, 50, 4000)
    b_shift = b_same + 5

    def ref_ks(x, y):
        vals = np.unique(np.concatenate([x, y]))
        ca = np.searchsorted(np.sort(x), vals, side="right")
        cb = np.searchsorted(np.sort(y), vals, side="right")
        return int(np.abs(ca * len(y) - cb * len(x)).max())

    for b, expect_zero in ((b_same, False), (b_shift, False)):
        df = pd.DataFrame({
            "v": np.concatenate([a, b]),
            "side": ["A"] * len(a) + ["B"] * len(b)})
        out = ks_two_sample(ray.data.from_pandas(df).repartition(5),
                            "v", "side", "A", "B", num_buckets=4)
        assert out["d_num"].iloc[0] == ref_ks(a, b)
        assert out["n_a"].iloc[0] == len(a) and out["n_b"].iloc[0] == len(b)

    # identical datasets → D exactly 0; two-dataset form agrees with grouped
    ds_a = ray.data.from_pandas(pd.DataFrame({"v": a}))
    out = ks_two_datasets(ds_a, ray.data.from_pandas(pd.DataFrame({"v": a})),
                          "v", num_buckets=4)
    assert out["d_num"].iloc[0] == 0

    out2 = ks_two_datasets(ds_a, ray.data.from_pandas(pd.DataFrame({"v": b_shift})),
                           "v", num_buckets=4)
    assert out2["d_num"].iloc[0] == ref_ks(a, b_shift)


def test_ks_nulls_dropped(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.ks import ks_two_sample

    t = pa.table({
        "v": pa.array([1.0, 2.0, None, 1.0, 2.0, None]),
        "side": ["A", "A", "A", "B", "B", "B"]})
    out = ks_two_sample(ray.data.from_arrow(t), "v", "side", "A", "B")
    assert out["d_num"].iloc[0] == 0
    assert out["n_a"].iloc[0] == 2 and out["n_b"].iloc[0] == 2


def test_deterministic_shuffle(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.shuffle import (MERSENNE61, _MULT,
                                                         deterministic_shuffle,
                                                         shuffle_hash)

    keys = np.arange(2000, dtype=np.int64)
    # hash matches plain-python Mersenne-61 LCG
    ref = np.array([((int(k) + 7) % MERSENNE61) * _MULT % MERSENNE61
                    for k in keys[:50]], dtype=np.uint64)
    assert (shuffle_hash(keys[:50], 7) == ref).all()

    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(5)
    o1 = deterministic_shuffle(ds, "k", salt=7).to_pandas()["k"].tolist()
    o2 = deterministic_shuffle(ds, "k", salt=7).to_pandas()["k"].tolist()
    o3 = deterministic_shuffle(ds, "k", salt=8).to_pandas()["k"].tolist()
    assert o1 == o2                      # same salt → identical order
    assert o1 != o3                      # new salt → new order
    assert o1 != sorted(o1)              # actually shuffled
    assert sorted(o1) == keys.tolist()   # a permutation, nothing lost
    expect = [k for _, k in sorted(zip(shuffle_hash(keys, 7), keys))]
    assert o1 == expect                  # exact global order


def test_pivot_keeps_null_index_group(ray_session):
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.pivot import pivot_table

    df = pd.DataFrame({"i": ["a", None, None], "p": ["x", "x", "y"],
                       "v": [1, 5, 7]})
    out = pivot_table(ray.data.from_pandas(df), "i", "p", "v",
                      num_buckets=2).to_pandas()
    nullrow = out[out["i"].isna()]
    assert len(nullrow) == 1
    assert int(nullrow["v_x"].iloc[0]) == 5
    assert int(nullrow["v_y"].iloc[0]) == 7


def test_ks_big_side_object_path():
    # the object-dtype exact branch must agree with the int64 fast path
    import numpy as np

    import jsonschema_validator_ray.stages.ks as ksmod
    na = np.array([3, 1], dtype=np.int64)
    nb = np.array([1, 2], dtype=np.int64)
    fast = np.abs(np.cumsum(na) * 3 - np.cumsum(nb) * 4)
    exact = np.abs(np.cumsum(na).astype(object) * 3
                   - np.cumsum(nb).astype(object) * 4)
    assert list(fast) == list(exact)


def test_shuffle_hash_negative_keys_match_sql():
    import duckdb
    import numpy as np

    from jsonschema_validator_ray.stages.shuffle import shuffle_hash

    keys = np.array([-5, -1, 0, 7, -2**62, 2**61], dtype=np.int64)
    got = shuffle_hash(keys, salt=7)
    P = 2305843009213693951
    sql = f"""
    SELECT CAST((((CAST(k AS HUGEINT) % {P}) + {P}) % {P} + 7) % {P}
                * (CAST(6364136223846793005 AS HUGEINT) % {P}) % {P}
           AS BIGINT)
    FROM (SELECT unnest([{','.join(str(int(k)) for k in keys)}]) AS k)
    """
    want = [r[0] for r in duckdb.connect().execute(sql).fetchall()]
    assert [int(x) for x in got] == want


def test_chi_square_cells_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.contingency import chi_square_cells

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z", None], 4000, p=[.4, .3, .2, .1]),
        "b": rng.choice(["p", "q", "r"], 4000),
    })
    got = chi_square_cells(ray.data.from_pandas(df).repartition(5),
                           "a", "b", num_buckets=4)
    # brute force: full crosstab marginals (dropna=False keeps the null row)
    cnt = (df.groupby(["a", "b"], dropna=False).size()
             .reset_index(name="o"))
    n = float(cnt["o"].sum())
    rt = cnt.groupby("a", dropna=False)["o"].transform("sum").to_numpy(float)
    ct = cnt.groupby("b", dropna=False)["o"].transform("sum").to_numpy(float)
    e = rt * ct / n
    o = cnt["o"].to_numpy(float)
    want = cnt.rename(columns={"o": "observed"}).copy()
    want["expected"] = e
    want["contrib"] = (o - e) * (o - e) / e
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["observed"]) == list(want["observed"])
    assert np.array_equal(got["expected"].to_numpy(),
                          want["expected"].to_numpy())   # bitwise
    assert np.array_equal(got["contrib"].to_numpy(),
                          want["contrib"].to_numpy())
    # statistic sanity: independent-ish draws → chi2 not astronomically big
    assert got["contrib"].sum() < 100


def test_grouped_entropy_matches_bruteforce(ray_session):
    import math

    import ray.data

    from jsonschema_validator_ray.stages.contingency import grouped_entropy

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "src": rng.choice(["a", "b", "c", "d"], size=2000),
        "lang": rng.choice(["en", "de", "fr", "zz", "pt"], size=2000,
                           p=[0.5, 0.2, 0.15, 0.1, 0.05]),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    got = grouped_entropy(ds, "src", "lang", num_buckets=4) \
        .to_pandas().sort_values("src").reset_index(drop=True)

    rows = []
    for key, sub in df.groupby("src"):
        counts = sub["lang"].value_counts()
        total = int(counts.sum())
        s = sum(int(c) * math.floor(math.log(int(c) / total) * 1_000_000)
                for c in counts)
        rows.append((key, total, len(counts), float(-s) / float(total)))
    exp = pd.DataFrame(rows, columns=["src", "n_rows", "n_values",
                                      "entropy_micronats"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # entropy in micronats is bounded by ln(|values|)·1e6 and non-negative
    assert (got["entropy_micronats"] >= 0).all()
    assert (got["entropy_micronats"] <= math.log(5) * 1e6).all()


def test_grouped_entropy_single_value_group(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.contingency import grouped_entropy

    df = pd.DataFrame({"g": ["x"] * 10 + ["y"] * 3,
                       "v": ["only"] * 10 + ["p", "q", "q"]})
    got = grouped_entropy(ray.data.from_pandas(df), "g", "v",
                          num_buckets=2).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert got.loc[0, "entropy_micronats"] == 0.0  # ln(1) == 0 exactly
    assert got.loc[0, "n_values"] == 1
    assert got.loc[1, "n_rows"] == 3 and got.loc[1, "n_values"] == 2


def test_grouped_geomean_matches_bruteforce(ray_session):
    import math

    import ray.data

    from jsonschema_validator_ray.stages.contingency import grouped_geomean

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "g": rng.choice(["p", "q"], size=1200),
        "x": rng.integers(1, 60, size=1200).astype(float),
    })
    # zero / negative / null rows must be excluded in both engines
    df.loc[0, "x"] = 0.0
    df.loc[1, "x"] = -3.0
    df.loc[2, "x"] = np.nan
    got = grouped_geomean(ray.data.from_pandas(df).repartition(4),
                          "g", "x", num_buckets=4).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[(df["g"] == row["g"]) & (df["x"] > 0)]["x"]
        xs = np.round(sub.to_numpy()).astype(np.int64)
        t = sum(int(c) * math.floor(math.log(int(v)) * 1_000_000)
                for v, c in pd.Series(xs).value_counts().items()
                for _ in [0])
        lg = float(t) / float(len(xs)) / 1_000_000.0
        assert row["n_rows"] == len(xs)
        assert row["log_gm"] == lg
        assert row["geo_mean"] == math.exp(lg)
        # sanity: close to the true geometric mean
        assert np.isclose(row["geo_mean"],
                          np.exp(np.log(xs).mean()), rtol=1e-4)


def test_chi_square_cells_scan_parity(ray_session):
    """The gated FusedParquetScan path must equal the Dataset-exchange
    path (chi_square_cells) cell for cell, on both gate settings."""
    import pandas as pd

    from jsonschema_validator_ray.sources.parquet import FusedParquetScan
    from jsonschema_validator_ray.stages.contingency import (
        chi_square_cells,
        chi_square_cells_scan,
    )

    sf = "/root/testdata/sf0.001"
    scan = FusedParquetScan(f"{sf}/documents.parquet",
                            columns=["lang", "source"])
    from jsonschema_validator_ray.sources.parquet import read_parquet
    ds = read_parquet(f"{sf}/documents.parquet",
                      columns=["lang", "source"])
    a = chi_square_cells(ds, "lang", "source")
    b = chi_square_cells_scan(scan, "lang", "source")
    c = chi_square_cells_scan(
        FusedParquetScan(f"{sf}/documents.parquet",
                         columns=["lang", "source"]),
        "lang", "source", block_gate=0)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    pd.testing.assert_frame_equal(a, c, check_dtype=False)
