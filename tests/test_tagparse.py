"""Struct-tag DSL — ported from /root/reference/validator/validator_test.go:195-257
and validator_edge_test.go:109-191 (parseTag tables, isZero)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from jsonschema_validator_ray.functions.tagparse import (
    is_zero,
    parse_tag,
    record_schema,
    validate_record,
    var,
)


@pytest.mark.parametrize("tag,expected", [
    ("", {}),
    ("required", {"required": True}),
    ("required,min=5", {"required": True, "min": 5}),
    ("min=5,max=10", {"min": 5, "max": 10}),
    ("minLength=2,maxLength=8", {"minLength": 2, "maxLength": 8}),
    ("min=1.5", {"min": 1.5}),
    ("min=abc", {"min": "abc"}),                       # raw kept, validator rejects
    ("type=string,pattern=^a", {"type": "string", "pattern": "^a"}),
    ("enum=a|b|c", {"enum": ["a", "b", "c"]}),
    ("format=email", {"format": "email"}),
    ("custom=zzz", {"custom": "zzz"}),                 # unknown key kept verbatim
    ("flag", {"flag": True}),
    (" required , min=5 ", {"required": True, "min": 5}),
])
def test_parse_tag(tag, expected):
    assert parse_tag(tag) == expected


@pytest.mark.parametrize("value,zero", [
    (None, True), ("", True), ("x", False), (0, True), (1, False),
    (0.0, True), (False, True), (True, False), ([], True), ([1], False),
    ({}, True), ({"a": 1}, False),
])
def test_is_zero(value, zero):
    """isZero semantics (validator.go:617-641)."""
    assert is_zero(value) is zero


def test_var():
    """Var = parseTag + validate (validator.go:268-286)."""
    assert var(7, "required,min=5").valid
    r = var(3, "required,min=5")
    assert not r.valid and "less than minimum 5" in r.errors[0].message
    r = var("", "required")
    assert not r.valid and r.errors[0].tag == "required"
    assert var("b", "enum=a|b|c").valid
    assert not var("z", "enum=a|b|c").valid
    assert var("j@example.com", "format=email").valid


def test_validate_record():
    tags = {"name": "required,minLength=2",
            "age": "min=0,max=150",
            "email": "format=email"}
    ok = {"name": "ann", "age": 30, "email": "a@example.com"}
    assert validate_record(ok, tags).valid
    r = validate_record({"name": "", "age": 200}, tags)
    assert not r.valid
    assert ("required", "$.name") in r.tag_paths()
    assert ("maximum", "$.age") in r.tag_paths()
    # absent non-required field → skipped
    assert validate_record({"name": "ann"}, tags).valid


def test_record_schema_drives_column_plan(ray_session):
    """The Ray-native Struct path: tags → table schema → BatchValidator."""
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = record_schema({"name": "required,minLength=2",
                            "age": "min=0,max=150"})
    assert schema["required"] == ["name"]
    assert schema["properties"]["age"] == {"minimum": 0, "maximum": 150}

    t = pa.table({"name": ["ann", None, "x"], "age": [30, 200, -1]})
    out = {r["name"]: r for r in BatchValidator(schema, "name")(t).to_pylist()}
    assert out["ann"]["valid"]
    assert {v["constraint_id"] for v in out[None]["violations"]} == {
        "required:name", "maximum:age"}
    assert {v["constraint_id"] for v in out["x"]["violations"]} == {
        "minLength:name", "minimum:age"}
