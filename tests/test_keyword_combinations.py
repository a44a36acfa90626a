"""Combined-keyword scenarios: keyword interplay the per-keyword tables
don't cover (applicators composing with logical combinators, conditionals
over nested structure, dependencies + additionalProperties interplay)."""

from __future__ import annotations

import pytest

CASES = [
    # allOf over object sub-schemas with properties recursion
    ("allOf/object_schemas_both_apply",
     {"a": 5, "b": "xx"},
     {"allOf": [{"properties": {"a": {"minimum": 3}}},
                {"properties": {"b": {"minLength": 2}}}]},
     True, set()),
    ("allOf/object_schemas_one_fails",
     {"a": 1, "b": "xx"},
     {"allOf": [{"properties": {"a": {"minimum": 3}}},
                {"properties": {"b": {"minLength": 2}}}]},
     False, {"allOf"}),
    # anyOf where branches disagree on nested requirements
    ("anyOf/nested_required_second_branch",
     {"b": {"x": 1}},
     {"anyOf": [{"required": ["a"]}, {"required": ["b"]}]},
     True, set()),
    # oneOf with overlapping object branches → more than one
    ("oneOf/overlapping_object_branches",
     {"a": 5},
     {"oneOf": [{"properties": {"a": {"minimum": 1}}},
                {"properties": {"a": {"maximum": 10}}}]},
     False, {"oneOf"}),
    # not over a conjunction
    ("not/conjunction_escapes",
     {"a": 100},
     {"not": {"properties": {"a": {"minimum": 0, "maximum": 10}}}},
     True, set()),
    # conditional keyed on a nested property driving another nested property
    ("conditional/nested_drive",
     {"kind": "premium", "limits": {"rate": 5}},
     {"conditional": {
         "if": {"properties": {"kind": {"enum": ["premium"]}}},
         "then": {"properties": {"limits": {"properties": {"rate": {"minimum": 10}}}}},
     }},
     False, {"conditional"}),
    # dependencies + additionalProperties: dep satisfied, extra flagged
    ("dependencies/with_additionalProperties",
     {"card": "visa", "cvv": "123", "extra": 1},
     {"properties": {"card": {"type": "string"}, "cvv": {"type": "string"}},
      "dependencies": {"card": ["cvv"]},
      "additionalProperties": False},
     False, {"additionalProperties"}),
    # patternProperties + additionalProperties + required all at once
    ("patternProps/with_required_and_extra",
     {"x_a": 1, "name": "n", "zz": True},
     {"required": ["name"],
      "properties": {"name": {"type": "string"}},
      "patternProperties": {"^x_": {"type": "integer"}},
      "additionalProperties": False},
     False, {"additionalProperties"}),
    # items containing logical combinators per element
    ("items/anyOf_elements",
     [1, "x", 2.5],
     {"items": {"anyOf": [{"type": "number"}, {"type": "string"}]}},
     True, set()),
    ("items/anyOf_elements_fail",
     [1, True],
     {"items": {"anyOf": [{"type": "number"}, {"type": "string"}]}},
     False, {"anyOf"}),
    # uniqueItems + items constraints together
    ("items/unique_and_bounds",
     [1, 2, 2],
     {"items": {"minimum": 0}, "uniqueItems": True},
     False, {"uniqueItems"}),
    # enum + minLength both fire on the same value
    ("enum/and_minLength_both_fire",
     "q",
     {"enum": ["aa", "bb"], "minLength": 2},
     False, {"enum", "minLength"}),
    # required inside anyOf branch doesn't leak errors when branch passes
    ("anyOf/no_error_leakage",
     {"a": 1},
     {"anyOf": [{"required": ["zzz"], "properties": {"a": {"minimum": 100}}},
                {"required": ["a"]}]},
     True, set()),
    # deep conditional else branch over arrays
    ("conditional/else_array_check",
     {"mode": "list", "vals": [1, 2, 3, 4]},
     {"conditional": {
         "if": {"properties": {"mode": {"enum": ["scalar"]}}},
         "then": {"properties": {"vals": {"maxItems": 1}}},
         "else": {"properties": {"vals": {"maxItems": 3}}},
     }},
     False, {"conditional"}),
]


@pytest.mark.parametrize("case_id,value,schema,valid,tags", CASES,
                         ids=[c[0] for c in CASES])
def test_combined(engine, case_id, value, schema, valid, tags):
    r = engine.validate(value, schema)
    assert r.valid == valid, f"{case_id}: {r.errors}"
    assert r.tags() == tags, f"{case_id}: {r.tag_paths()}"
