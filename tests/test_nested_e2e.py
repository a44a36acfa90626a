"""End-to-end nested-document cases — ported from
/root/reference/validator/complex_schema_test.go:10-207 (5-level nesting) and
validator/validator_test.go:34-98."""

from __future__ import annotations

import json

import pytest

COMPLEX_SCHEMA = json.loads("""
{
  "type": "object",
  "properties": {
    "level1": {
      "type": "object",
      "properties": {
        "level2": {
          "type": "object",
          "properties": {
            "level3": {
              "type": "object",
              "properties": {
                "level4": {
                  "type": "object",
                  "properties": {
                    "level5": {
                      "type": "string",
                      "minLength": 2,
                      "maxLength": 10,
                      "pattern": "^[a-z]+$"
                    },
                    "array5": {
                      "type": "array",
                      "items": {
                        "type": "object",
                        "properties": {
                          "key": {"type": "string"},
                          "value": {"type": "number"}
                        },
                        "required": ["key", "value"]
                      },
                      "minItems": 1
                    }
                  },
                  "required": ["level5"]
                },
                "arrays": {
                  "type": "array",
                  "items": {"type": "string"}
                }
              },
              "additionalProperties": false
            }
          }
        }
      }
    }
  }
}
""")


def _nest(level4: dict, extra_l3: dict | None = None) -> dict:
    l3 = {"level4": level4}
    if extra_l3:
        l3.update(extra_l3)
    return {"level1": {"level2": {"level3": l3}}}


CASES = [
    ("valid_deeply_nested",
     _nest({"level5": "valid",
            "array5": [{"key": "item1", "value": 10}, {"key": "item2", "value": 20}]},
           {"arrays": ["string1", "string2"]}),
     True, set(), []),
    ("pattern_violation_level5",
     _nest({"level5": "INVALID", "array5": [{"key": "item1", "value": 10}]}),
     False, {"pattern"}, ["does not match pattern"]),
    ("missing_required_level5",
     _nest({"array5": [{"key": "item1", "value": 10}]}),
     False, {"required"}, ["required property 'level5' is missing"]),
    ("extra_property_additionalProperties_false",
     _nest({"level5": "valid", "array5": [{"key": "k", "value": 1}]},
           {"extra": "not allowed"}),
     False, {"additionalProperties"}, ["unknown field"]),
    ("array_item_wrong_type",
     _nest({"level5": "valid", "array5": [{"key": "item1", "value": "not-number"}]}),
     False, {"type"}, []),
    ("empty_array_minItems",
     _nest({"level5": "valid", "array5": []}),
     False, {"minItems"}, ["fewer items than minimum 1"]),
    ("array_item_missing_required_key",
     _nest({"level5": "valid", "array5": [{"value": 3}]}),
     False, {"required"}, ["required property 'key' is missing"]),
]


@pytest.mark.parametrize("case_id,doc,valid,tags,substrings", CASES,
                         ids=[c[0] for c in CASES])
def test_complex_nested(engine, case_id, doc, valid, tags, substrings):
    r = engine.validate(doc, COMPLEX_SCHEMA)
    assert r.valid == valid, f"{case_id}: {r.errors}"
    assert r.tags() == tags, f"{case_id}: {r.tag_paths()}"
    msgs = " | ".join(e.message for e in r.errors)
    for sub in substrings:
        assert sub in msgs


def test_violation_paths_pin_location(engine):
    r = engine.validate(
        _nest({"level5": "INVALID", "array5": [{"key": "k", "value": "bad"}]}),
        COMPLEX_SCHEMA,
    )
    assert not r.valid
    assert ("pattern", "$.level1.level2.level3.level4.level5") in r.tag_paths()
    assert ("type", "$.level1.level2.level3.level4.array5[0].value") in r.tag_paths()


def test_basic_e2e_validator_suite(engine):
    """validator_test.go:34-98: valid object / wrong type / nested /
    array items / additionalProperties."""
    schema = {
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string", "minLength": 2},
            "age": {"type": "integer", "minimum": 0, "maximum": 150},
            "email": {"type": "string", "format": "email"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "address": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        },
        "additionalProperties": False,
    }
    ok = {"name": "john", "age": 30, "email": "j@example.com",
          "tags": ["a", "b"], "address": {"city": "berlin"}}
    assert engine.validate(ok, schema).valid

    r = engine.validate({"name": "john", "age": "thirty"}, schema)
    assert not r.valid and "type" in r.tags()

    r = engine.validate({"name": "john", "address": {}}, schema)
    assert ("required", "$.address.city") in r.tag_paths()

    r = engine.validate({"name": "john", "tags": ["a", 5]}, schema)
    assert ("type", "$.tags[1]") in r.tag_paths()

    r = engine.validate({"name": "john", "nickname": "j"}, schema)
    assert ("additionalProperties", "$.nickname") in r.tag_paths()
    assert any(e.message == "unknown field" for e in r.errors)
