"""JSONL / CSV ingestion → validation, and the dataset profile helper."""

from __future__ import annotations

import json

import pytest

SCHEMA = {"required": ["id", "name"],
          "properties": {"id": {"type": "integer", "minimum": 0},
                         "name": {"type": "string", "minLength": 2},
                         "score": {"minimum": 0, "maximum": 1}}}


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("files")
    p = d / "records.jsonl"
    rows = [{"id": 1, "name": "ann", "score": 0.5},
            {"id": 2, "name": "b", "score": 0.9},       # name too short
            {"id": -3, "name": "carl", "score": 1.5}]   # id<0, score>1
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_validate_jsonl_flat(ray_session, jsonl_file):
    from jsonschema_validator_ray.sources.files import validate_jsonl

    out = validate_jsonl(jsonl_file, SCHEMA, "id").to_pandas() \
        .set_index("id")
    assert out.loc[1, "valid"]
    assert not out.loc[2, "valid"] and out.loc[2, "error_count"] == 1
    assert out.loc[-3, "error_count"] == 2


def test_validate_csv(ray_session, tmp_path):
    from jsonschema_validator_ray.sources.files import validate_csv

    p = tmp_path / "r.csv"
    p.write_text("id,name,score\n1,ann,0.5\n2,b,0.9\n")
    out = validate_csv(str(p), SCHEMA, "id").to_pandas().set_index("id")
    assert out.loc[1, "valid"] and not out.loc[2, "valid"]


def test_validate_jsonl_nested_documents(ray_session, tmp_path):
    from jsonschema_validator_ray.sources.files import validate_jsonl_documents

    p = tmp_path / "docs.jsonl"
    docs = [{"user": {"name": "ann", "tags": ["a", "b"]}},
            {"user": {"tags": []}},
            "not-a-dict-but-valid-json"]
    p.write_text("\n".join(json.dumps(d) for d in docs))
    schema = {"type": "object", "required": ["user"],
              "properties": {"user": {"required": ["name"],
                                      "properties": {"tags": {"minItems": 1}}}}}
    out = validate_jsonl_documents(str(p), schema).to_pandas()
    assert len(out) == 3
    assert out["valid"].sum() == 1
    bad = out[~out["valid"]]
    tags = {v["tag"] for vs in bad["violations"] for v in vs}
    assert "required" in tags and "minItems" in tags


def test_profile(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.stats import profile

    df = profile(ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet"))
    assert set(df["column"]) == {"doc_id", "text", "lang", "source", "n_chars"}
    row = df.set_index("column").loc["lang"]
    assert row["cnt"] == 500 and 4 <= row["distinct_est"] <= 6
