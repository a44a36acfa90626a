"""End-to-end Ray Data validation stage tests (typed-column + dynamic-JSON
regimes) over real testdata parquet."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE


def test_documents_pipeline_end_to_end(ray_session):
    from jsonschema_validator_ray.pipelines import documents as docs

    verdicts = docs.documents_verdicts(SF_SMOKE).to_pandas()
    assert set(verdicts.columns) == {"doc_id", "valid", "error_count"}
    assert len(verdicts) == 500
    assert verdicts["doc_id"].is_unique
    # mix of pass and fail by construction
    assert 0 < verdicts["valid"].sum() < len(verdicts)
    # error_count consistent with valid
    assert ((verdicts["error_count"] == 0) == verdicts["valid"]).all()


def test_documents_violations_match_verdicts(ray_session):
    from jsonschema_validator_ray.pipelines import documents as docs

    verdicts = docs.documents_verdicts(SF_SMOKE).to_pandas()
    viols = docs.documents_violations(SF_SMOKE).to_pandas()
    per_doc = viols.groupby("doc_id").size()
    expected = verdicts.set_index("doc_id")["error_count"]
    expected = expected[expected > 0]
    assert per_doc.sort_index().equals(expected.sort_index().astype("int64"))
    assert set(viols["constraint_id"]).issubset({
        "required:doc_id", "required:text", "required:lang", "minimum:doc_id",
        "minLength:text", "maxLength:text", "enum:lang", "pattern:source",
        "minimum:n_chars", "multipleOf:n_chars", "minimum:doc_id"})


def test_batch_validator_null_and_missing_column(ray_session):
    """Null = absent (scalar constraints pass, required fails); a column
    missing from the table entirely fails required for every row."""
    import ray

    from jsonschema_validator_ray.stages.validate import BatchValidator

    t = pa.table({"k": [1, 2, 3], "s": ["aaaa", None, "b"]})
    v = BatchValidator(
        {"required": ["k", "s", "ghost"], "properties": {"s": {"minLength": 2}}},
        "k")
    out = v(t).to_pylist()
    by_k = {r["k"]: r for r in out}
    assert [x["constraint_id"] for x in by_k[1]["violations"]] == ["required:ghost"]
    assert {x["constraint_id"] for x in by_k[2]["violations"]} == {"required:s", "required:ghost"}
    assert {x["constraint_id"] for x in by_k[3]["violations"]} == {"required:ghost", "minLength:s"}


def test_json_column_validator_nested(ray_session):
    """Dynamic-JSON regime: nested documents in a string column, validated by
    the conformance engine inside an actor pool."""
    import ray

    from jsonschema_validator_ray.stages.validate import (
        JsonColumnValidator, flatten_violations)

    docs = [
        {"id": 1, "doc": json.dumps({"user": {"name": "ann", "age": 30}})},
        {"id": 2, "doc": json.dumps({"user": {"age": -1}})},
        {"id": 3, "doc": "{not json"},
    ]
    schema = {
        "type": "object",
        "required": ["user"],
        "properties": {"user": {
            "type": "object",
            "required": ["name"],
            "properties": {"age": {"minimum": 0}},
        }},
    }
    ds = ray.data.from_items(docs)
    out = ds.map_batches(
        JsonColumnValidator,
        fn_constructor_args=(schema, "id", "doc"),
        batch_format="pyarrow", concurrency=2,
    )
    rows = {r["id"]: r for r in out.take_all()}
    assert rows[1]["valid"] and rows[1]["error_count"] == 0
    assert not rows[2]["valid"]
    tags = {v["tag"] for v in rows[2]["violations"]}
    assert tags == {"required", "minimum"}
    assert not rows[3]["valid"]
    assert rows[3]["violations"][0]["tag"] == "parse"

    flat = flatten_violations(out).to_pandas()
    assert len(flat) == 3  # 2 for id=2, 1 for id=3


def test_uniqueitems_vectorized_kernel(ray_session):
    from jsonschema_validator_ray.stages.validate import BatchValidator

    t = pa.table({"k": [1, 2, 3, 4],
                  "xs": [[1, 2, 3], [1, 1], [], None]})
    v = BatchValidator({"properties": {"xs": {"uniqueItems": True, "minItems": 1}}}, "k")
    out = {r["k"]: r for r in v(t).to_pylist()}
    assert out[1]["valid"]
    assert {x["constraint_id"] for x in out[2]["violations"]} == {"uniqueItems:xs"}
    assert {x["constraint_id"] for x in out[3]["violations"]} == {"minItems:xs"}
    assert out[4]["valid"]  # null list = absent


def test_entry_contract(ray_session):
    import __ray_entry__ as ent

    ds = ent.entry()
    assert ds.count() == 500
    qs, oracle = ent.queries(), ent.oracle_sql()
    assert set(oracle).issubset(set(qs))
    for name, fn in qs.items():
        out = fn(SF_SMOKE)
        assert out is not None
