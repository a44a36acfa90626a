"""Scale-shape edge cases: skewed keys, empty inputs, all-null columns,
violation row contents."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_uniqueness_under_extreme_skew(ray_session):
    """One key = 40% of the corpus (skewed host): the per-batch combiner
    must keep the hot key's shuffle contribution at ≤ one row per batch and
    the count must still be exact."""
    import ray.data

    from jsonschema_validator_ray.stages.uniqueness import duplicate_keys

    n = 50_000
    rng = np.random.default_rng(9)
    hot = int(n * 0.4)
    urls = (["https://hot.example.com/page"] * hot
            + [f"https://cold{i}.example.com/{rng.integers(0, 10):d}"
               for i in range(n - hot)])
    rng.shuffle(urls)
    ds = ray.data.from_pandas(pd.DataFrame({"url": urls})).repartition(16)
    dups = duplicate_keys(ds, "url", batch_size=2048).to_pandas()
    assert dups.set_index("url").loc["https://hot.example.com/page", "dup_count"] == hot
    # exactness across all keys
    truth = pd.Series(urls).value_counts()
    truth = truth[truth > 1]
    got = dups.set_index("url")["dup_count"].sort_index()
    assert got.equals(truth.sort_index().astype(got.dtype))


def test_validator_on_empty_and_allnull_batches(ray_session):
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"required": ["k"], "properties": {"s": {"minLength": 2}}}
    v = BatchValidator(schema, "k")
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "s": pa.array([], type=pa.string())})
    out = v(empty)
    assert out.num_rows == 0
    assert out.schema.field("violations").type.value_type.num_fields == 6

    allnull = pa.table({"k": pa.array([None, None], type=pa.int64()),
                        "s": pa.array([None, None], type=pa.string())})
    rows = v(allnull).to_pylist()
    for r in rows:
        assert not r["valid"]
        assert [x["constraint_id"] for x in r["violations"]] == ["required:k"]


def test_violation_rows_carry_path_and_value(ray_session):
    from jsonschema_validator_ray.stages.validate import (
        BatchValidator, flatten_violations)
    import ray.data

    t = pa.table({"k": [1, 2], "s": ["x", "okay"], "n": [5, -3]})
    v = BatchValidator({"properties": {"s": {"minLength": 2},
                                       "n": {"minimum": 0}}}, "k")
    ds = ray.data.from_arrow(v(t))
    flat = flatten_violations(ds).to_pandas()
    assert set(flat.columns) == {"k", "constraint_id", "column", "path",
                                 "tag", "message", "value"}
    by_cid = flat.set_index("constraint_id")
    assert by_cid.loc["minLength:s", "value"] == "x"
    assert by_cid.loc["minLength:s", "path"] == "$.s"
    assert by_cid.loc["minimum:n", "value"] == "-3"


def test_empty_dataset_through_pipeline(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.validate import BatchValidator

    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "s": pa.array([], type=pa.string())})
    ds = ray.data.from_arrow(empty)
    out = ds.map_batches(BatchValidator({"required": ["k"]}, "k"),
                         batch_format="pyarrow")
    assert out.count() == 0


def test_stats_single_batch_and_empty_column(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.stats import column_stats

    t = pa.table({"x": pa.array([None, None, None], type=pa.float64()),
                  "y": pa.array([1.0, 2.0, 3.0])})
    out = column_stats(ray.data.from_arrow(t)).to_pandas().set_index("column")
    assert out.loc["x", "nulls"] == 3 and out.loc["x", "null_rate"] == 1.0
    assert np.isnan(out.loc["x", "min_num"])
    assert out.loc["y", "mean_num"] == pytest.approx(2.0)
