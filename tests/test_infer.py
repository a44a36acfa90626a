"""Schema inference: profile → JSON schema → validates its own data."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def test_inferred_schema_round_trip(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.infer import infer_schema
    from jsonschema_validator_ray.stages.validate import BatchValidator

    docs = ray.data.read_parquet(f"{SF_SMOKE}/documents.parquet")
    schema = infer_schema(docs)

    # structure sanity against the real table
    t = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    assert set(schema["properties"]) == set(t.column_names)
    no_null_cols = sorted(c for c in t.column_names
                          if t.column(c).null_count == 0)
    assert schema["required"] == no_null_cols
    langs = sorted(set(t.column("lang").to_pylist()) - {None})
    if len(langs) <= 16:
        assert schema["properties"]["lang"]["enum"] == langs
    text_lens = [len(s.encode()) for s in t.column("text").to_pylist()
                 if s is not None]
    assert schema["properties"]["text"]["minLength"] == min(text_lens)
    assert schema["properties"]["text"]["maxLength"] == max(text_lens)

    # the inferred schema validates its own data with zero violations
    out = docs.map_batches(BatchValidator(schema, "doc_id"),
                           batch_format="pyarrow").to_pandas()
    assert out["valid"].all() and (out["error_count"] == 0).all()


def test_inferred_schema_catches_planted_violations(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.infer import infer_schema
    from jsonschema_validator_ray.stages.validate import BatchValidator

    docs = ray.data.read_parquet(f"{SF_SMOKE}/documents.parquet")
    schema = infer_schema(docs)

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    lang = t.column("lang").to_pylist()
    n_chars = t.column("n_chars").to_pylist()
    lang[3] = "zz"                        # outside the inferred enum
    n_chars[7] = max(x for x in n_chars if x is not None) + 1000  # > maximum
    t = t.set_column(t.schema.get_field_index("lang"), "lang",
                     pa.array(lang, type=pa.string()))
    t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                     pa.array(n_chars, type=pa.int64()))

    out = ray.data.from_arrow(t).map_batches(
        BatchValidator(schema, "doc_id"),
        batch_format="pyarrow").to_pandas().set_index("doc_id")
    bad_ids = set(out.index[~out["valid"]])
    ids = pq.read_table(f"{SF_SMOKE}/documents.parquet") \
        .column("doc_id").to_pylist()
    assert {ids[3], ids[7]} == bad_ids


def test_infer_nulls_lists_and_enum_cap(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.infer import (column_profiles,
                                                       infer_schema)

    t = pa.table({
        "k": pa.array(range(100), type=pa.int64()),
        "opt": pa.array([None if i % 7 == 0 else float(i)
                         for i in range(100)]),
        "vec": pa.array([[1.0] * (2 + i % 3) for i in range(100)],
                        type=pa.list_(pa.float32())),
        "cat": pa.array([f"c{i % 4}" for i in range(100)]),
        "wide": pa.array([f"v{i}" for i in range(100)]),
    })
    ds = ray.data.from_arrow(t)
    schema = infer_schema(ds, enum_max=16)
    assert "opt" not in schema["required"] and "k" in schema["required"]
    assert schema["properties"]["vec"] == {
        "type": "array", "items": {"type": "number"},
        "minItems": 2, "maxItems": 4}
    assert schema["properties"]["cat"]["enum"] == ["c0", "c1", "c2", "c3"]
    assert "enum" not in schema["properties"]["wide"]
    prof = column_profiles(ds, ["wide", "cat"]).to_pandas() \
        .set_index("column")
    assert prof.loc["wide", "n_distinct_capped"] == 17
    assert prof.loc["cat", "n_distinct_capped"] == 4
