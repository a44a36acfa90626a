"""Edge probes over less-exercised paths: empty batches, configured
histograms in column_stats, multi-query top-k, JSON regime options."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_extraction_matches_empty_batch():
    from jsonschema_validator_ray.sources.webtext import extraction_matches_batch

    t = pa.table({"html": pa.array([], type=pa.binary()),
                  "text": pa.array([], type=pa.large_string())})
    assert extraction_matches_batch(t).shape == (0,)


def test_empty_plan_all_valid():
    from jsonschema_validator_ray.stages.validate import BatchValidator

    t = pa.table({"k": [1, 2]})
    out = BatchValidator({}, "k")(t).to_pylist()
    assert all(r["valid"] and r["error_count"] == 0 for r in out)


def test_column_stats_with_configured_histograms(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.stats import column_stats
    from jsonschema_validator_ray.state import (CategoricalHistogram,
                                                NumericHistogram)

    t = pa.table({"x": [1.0, 5.0, 9.0, 22.0], "lang": ["en", "en", "de", "xx"]})
    out = column_stats(
        ray.data.from_arrow(t),
        hist_edges={"x": [0, 10, 20, 30]},
        hist_categories={"lang": ["en", "de"]},
    ).to_pandas().set_index("column")
    hx = NumericHistogram.from_json(out.loc["x", "hist"])
    assert hx.counts.tolist() == [3, 0, 1]
    hl = CategoricalHistogram.from_json(out.loc["lang", "hist"])
    assert hl.counts.tolist() == [2, 1] and hl.other == 1


def test_topk_multiple_queries_and_k_exceeds_corpus(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.similarity import topk_cosine

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(20)])
    q = vecs[:3]
    out = topk_cosine(ds, q, k=50, batch_size=7)
    # k > corpus → all 20 rows per query, self always first
    for qi in range(3):
        sub = out[out["query_id"] == qi]
        assert len(sub) == 20
        assert sub.iloc[0]["vec_id"] == qi
        assert sub.iloc[0]["score"] == pytest.approx(1.0)


def test_json_validator_loose_and_stop_on_first(ray_session):
    import ray.data

    from jsonschema_validator_ray.errors import Mode
    from jsonschema_validator_ray.stages.validate import JsonColumnValidator

    rows = [{"id": 1, "doc": '{"a": -5, "b": "x", "wat": 1}'}]
    schema_loose = {"properties": {"a": {"minimum": 0},
                                   "b": {"minLength": 3}},
                    "frobnicate": True}
    v = JsonColumnValidator(schema_loose, "id", "doc", mode=Mode.LOOSE)
    out = v(pa.Table.from_pylist(rows)).to_pylist()[0]
    assert out["error_count"] == 2  # unknown keyword skipped in loose

    v2 = JsonColumnValidator({"properties": {"a": {"minimum": 0},
                                             "b": {"minLength": 3}}},
                             "id", "doc", stop_on_first_error=True)
    out2 = v2(pa.Table.from_pylist(rows)).to_pylist()[0]
    assert out2["error_count"] == 1


def test_drift_all_null_column(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.drift import drift_check
    from jsonschema_validator_ray.state import CategoricalHistogram

    t = pa.table({"lang": pa.array([None, None, None], type=pa.string())})
    base = CategoricalHistogram(["en", "de"], counts=np.array([5, 5]))
    rpt = drift_check(ray.data.from_arrow(t), "lang", base.to_json())
    # empty current distribution → uniform proportions; no crash
    assert np.isfinite(rpt.psi)


def test_min_max_properties_on_map_and_struct_columns(ray_session):
    from jsonschema_validator_ray.stages.validate import BatchValidator

    t = pa.table({
        "k": [1, 2, 3, 4],
        "m": pa.array([[("a", 1), ("b", 2)], [("x", 9)], [], None],
                      type=pa.map_(pa.string(), pa.int64())),
        "st": pa.array([{"a": 1, "b": "x"}, {"a": None, "b": "y"},
                        {"a": None, "b": None}, None],
                       type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
    })
    schema = {"properties": {"m": {"minProperties": 1, "maxProperties": 2},
                             "st": {"minProperties": 1}}}
    out = {r["k"]: r for r in BatchValidator(schema, "k")(t).to_pylist()}
    assert out[1]["valid"] and out[2]["valid"]
    assert {v["constraint_id"] for v in out[3]["violations"]} == {
        "minProperties:m", "minProperties:st"}
    assert out[4]["valid"]  # null map/struct = absent


def test_curated_documents_pipeline(ray_session):
    from jsonschema_validator_ray.pipelines.curation import curated_documents
    from tests.conftest import SF_SMOKE

    out = curated_documents(SF_SMOKE).to_pandas()
    assert 0 < len(out) < 500
    assert out["doc_id"].is_unique


def test_zero_field_struct_minproperties(ray_session):
    """Regression (review finding): a zero-field struct type must FAIL
    minProperties>0 — a None count accumulator would compare as null and
    vacuously pass."""
    from jsonschema_validator_ray.stages.validate import BatchValidator

    t = pa.table({"k": [1, 2], "st": pa.array([{}, {}], type=pa.struct([]))})
    out = BatchValidator({"properties": {"st": {"minProperties": 1}}}, "k")(t) \
        .to_pylist()
    assert all(not r["valid"] for r in out)


def test_simhash_batch_trailing_empty_docs():
    """Regression (review finding): trailing empty/None docs must not shift
    the reduceat boundary and corrupt the previous doc's fingerprint."""
    from jsonschema_validator_ray.stages.dedup import batch_simhash64

    alone = batch_simhash64(["a b c d e"])[0]
    with_trailing = batch_simhash64(["a b c d e", ""])[0]
    with_none = batch_simhash64(["a b c d e", None, ""])[0]
    assert alone == with_trailing == with_none
    mid = batch_simhash64(["x y", "", "a b c d e"])
    assert mid[2] == alone and mid[1] == 0


def test_missing_struct_field_in_schema_is_absent(ray_session):
    """Regression (review finding): a schema referencing a struct field that
    does not exist in the data treats it as absent, not ArrowInvalid."""
    from jsonschema_validator_ray.stages.validate import BatchValidator

    t = pa.table({"k": [1], "a": pa.array([{"x": 1}],
                                          type=pa.struct([("x", pa.int64())]))})
    schema = {"properties": {"a": {"properties": {"missing": {"minimum": 5}},
                                   "required": ["missing"]}}}
    out = BatchValidator(schema, "k")(t).to_pylist()[0]
    # scalar keyword on absent field passes; nested required fires
    assert [v["constraint_id"] for v in out["violations"]] == ["required:a.missing"]


def test_fk_with_nullable_dimension_key(ray_session):
    """Regression (review finding): null dim keys must not crash the
    broadcast anti-join."""
    import ray.data

    from jsonschema_validator_ray.stages.referential import fk_violations

    fact = ray.data.from_items([{"k": 1, "ref": "a"}, {"k": 2, "ref": "zz"}])
    dim = ray.data.from_items([{"key": "a"}, {"key": None}])
    bad = fk_violations(fact, "k", "ref", dim, "key").to_pandas()
    assert list(bad["ref"]) == ["zz"]


def test_nonstring_enum_in_column_plan(ray_session):
    """Regression (review finding): integer enums compile and evaluate."""
    from jsonschema_validator_ray.stages.validate import BatchValidator

    t = pa.table({"k": [1, 2], "x": [5, 9]})
    out = {r["k"]: r for r in
           BatchValidator({"properties": {"x": {"enum": [1, 5, 7]}}}, "k")(t)
           .to_pylist()}
    assert out[1]["valid"] and not out[2]["valid"]
    assert out[2]["violations"][0]["message"] == "value must be one of: 1, 5, 7"
