"""Tests for the round-3 additions: exact distributed quantiles,
token-repetition signals, normalized dedup, byte-length histogram."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE

# ---- exact quantiles ------------------------------------------------------


def _disc_quantile(sorted_vals: np.ndarray, q: float) -> float:
    # quantile_disc rank: element at ascending index ceil(q*n) - 1
    n = len(sorted_vals)
    return float(sorted_vals[max(int(np.ceil(q * n)) - 1, 0)])


@pytest.mark.parametrize("gather_limit", [10**6, 37])
def test_exact_quantiles_matches_numpy(ray_session, gather_limit):
    """Direct-gather path AND the forced-refinement path (gather_limit=37
    makes every located bin refine) return the identical data element."""
    import ray.data

    from jsonschema_validator_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.normal(100.0, 15.0, 3000),
        rng.exponential(5.0, 1000),          # skewed tail
        np.full(500, 42.5),                  # point mass (zero-width bin)
    ])
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(8)
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles(ds, "x", qs, num_buckets=16,
                          gather_limit=gather_limit)
    s = np.sort(vals)
    for q in qs:
        assert got[q] == _disc_quantile(s, q), q


def test_exact_quantiles_nulls_and_empty(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.quantiles import exact_quantiles

    ds = ray.data.from_arrow(pa.table(
        {"x": pa.array([None, 3.0, None, 1.0, 2.0], type=pa.float64())}))
    got = exact_quantiles(ds, "x", [0.5, 1.0])
    assert got[0.5] == 2.0 and got[1.0] == 3.0

    empty = ray.data.from_arrow(pa.table(
        {"x": pa.array([None, None], type=pa.float64())}))
    assert exact_quantiles(empty, "x", [0.5]) == {0.5: None}


# ---- repetition signals ---------------------------------------------------


def test_repetition_batch_brute_force():
    from jsonschema_validator_ray.functions.text import repetition_batch

    texts = ["the cat sat on the mat the", "  a  b\t c ", "", None,
             "x x x x", "one", "\n\n", "a b c a b a", "ü ü ö"]
    got = repetition_batch(pa.table({"text": pa.array(texts)})).to_pylist()
    for text, row in zip(texts, got):
        if text is None:
            assert row == {"n_tokens": None, "n_distinct": None,
                           "top_count": None}
            continue
        toks = [t for t in text.split() if t]
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct"] == len(set(toks))
        assert row["top_count"] == (max(toks.count(t) for t in set(toks))
                                    if toks else 0)


def test_repetition_query_oracle(ray_session, tmp_path):
    import duckdb

    from jsonschema_validator_ray.pipelines.corpus import (REPETITION_SQL,
                                                           repetition_documents)

    ours = repetition_documents(SF_SMOKE).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF_SMOKE}/documents.parquet'")
    theirs = con.execute(REPETITION_SQL + " ORDER BY doc_id").df()
    assert len(ours) == len(theirs)
    for c in ["n_tokens", "n_distinct", "top_count"]:
        a = ours[c].to_numpy(dtype=float)
        b = theirs[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c


# ---- normalized dedup -----------------------------------------------------


def test_normalize_text_batch():
    from jsonschema_validator_ray.functions.text import normalize_text_batch

    texts = ["  Hello   WORLD ", "hello world", "A\tB\nC", None, "", "  "]
    got = normalize_text_batch(pa.table({"text": pa.array(texts)})).to_pylist()
    assert got == ["hello world", "hello world", "a b c", None, "", ""]


def test_dedup_normalized_survivors(ray_session):
    import ray.data

    from jsonschema_validator_ray.functions.text import normalize_text_batch
    from jsonschema_validator_ray.stages.dedup import dedup_exact

    docs = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array(["Foo  Bar", "foo bar", " FOO BAR ",   # one group
                          "baz", "BAZ\n", "unique doc"]),
    })

    def add_norm(b):
        return pa.table({"doc_id": b.column("doc_id"),
                         "__norm": normalize_text_batch(b)})

    normed = ray.data.from_arrow(docs).map_batches(
        add_norm, batch_format="pyarrow")
    out = dedup_exact(normed, "doc_id", "__norm").to_pandas()
    assert sorted(out["doc_id"]) == [0, 3, 5]


# ---- byte-length histogram ------------------------------------------------


def test_hist_length_matches_sql(ray_session):
    import duckdb

    from jsonschema_validator_ray.pipelines.corpus import (HIST_LENGTH_SQL,
                                                           hist_length_documents)

    ours = hist_length_documents(SF_SMOKE)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF_SMOKE}/documents.parquet'")
    theirs = con.execute(HIST_LENGTH_SQL).df()
    assert ours["bin"].tolist() == theirs["bin"].tolist()
    assert ours["n"].tolist() == theirs["n"].tolist()
    assert int(ours["n"].sum()) > 0


def test_exact_quantiles_nan_treated_as_null(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.quantiles import exact_quantiles

    df = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, np.nan, np.nan]})
    out = exact_quantiles(ray.data.from_pandas(df), "x", [0.5, 1.0])
    assert out[1.0] == 4.0      # rank computed over non-NaN count
    assert out[0.5] == 2.0


def test_grouped_quantiles_disc_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.quantiles import (
        grouped_quantiles_disc)

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "g": rng.choice(list("abcdef"), 8000),
        "x": np.round(rng.normal(50, 20, 8000), 3),
    })
    df.loc[rng.choice(8000, 100, replace=False), "x"] = np.nan
    qs = [0.0, 0.25, 0.5, 0.95, 1.0]
    got = (grouped_quantiles_disc(ray.data.from_pandas(df).repartition(4),
                                  "g", "x", qs, num_buckets=4)
           .to_pandas().sort_values("g").reset_index(drop=True))
    for _, row in got.iterrows():
        vals = np.sort(df.loc[(df["g"] == row["g"]) & df["x"].notna(),
                              "x"].to_numpy())
        for q in qs:
            nm = f"q_{str(q).replace('.', '_')}"
            want = vals[max(int(np.ceil(q * len(vals))) - 1, 0)]
            assert row[nm] == want, (row["g"], q)


def test_grouped_quantiles_cont_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.quantiles import \
        grouped_quantiles_cont

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=1501),
        "x": np.round(rng.normal(100, 25, size=1501), 2),
    })
    df.loc[5, "x"] = np.nan
    qs = [0.25, 0.5, 0.75, 0.9]
    got = grouped_quantiles_cont(
        ray.data.from_pandas(df).repartition(4), "g", "x", qs,
        num_buckets=4).to_pandas().sort_values("g").reset_index(drop=True)
    for _, row in got.iterrows():
        x = df.loc[df["g"] == row["g"], "x"].dropna().to_numpy()
        for q in qs:
            nm = f"q_{str(q).replace('.', '_')}"
            # numpy 'linear' interpolation is the same convention
            assert np.isclose(row[nm], np.quantile(x, q), rtol=0,
                              atol=1e-9), (row["g"], q)


def test_grouped_quantiles_cont_small_groups(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data

    from jsonschema_validator_ray.stages.quantiles import \
        grouped_quantiles_cont

    # 1-element group: every quantile is the element; 2-element group:
    # exact midpoint interpolation
    df = pd.DataFrame({"g": ["one", "two", "two"], "x": [7.0, 1.0, 4.0]})
    got = grouped_quantiles_cont(ray.data.from_pandas(df), "g", "x",
                                 [0.5], num_buckets=2).to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert got.loc[0, "q_0_5"] == 7.0
    assert got.loc[1, "q_0_5"] == 2.5
