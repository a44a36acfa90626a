"""Keyword conformance suite — ported from the reference's Go test tables
(SURVEY.md §5; FIXTURES.md §2).

Each CASE row is ``(case_id, value, schema, expect_valid, expect_error_count,
expect_tags, expect_msg_substrings)``. Expectations pin *sets* of tags and
message substrings (never order — the reference's keyword order is
Go-map-nondeterministic, SURVEY.md §3.3).

Source tables: /root/reference/rules/number_test.go, string_test.go,
type_test.go, array_test.go, object_*_test.go, logical_rules_test.go,
conditional_rules_test.go, format_test.go, rule_test.go;
/root/reference/validator/validator_test.go:34-98.
"""

from __future__ import annotations

import pytest

# (case_id, value, schema, valid, n_errors, tags, msg_substrings)
CASES = [
    # ---- minimum (rules/number_test.go:23-29) ----
    ("minimum/above", 10, {"minimum": 5}, True, 0, set(), []),
    ("minimum/equal", 5, {"minimum": 5}, True, 0, set(), []),
    ("minimum/below", 3, {"minimum": 5}, False, 1, {"minimum"}, ["less than minimum 5"]),
    ("minimum/not_a_number", True, {"minimum": 5}, False, 1, {"minimum"}, ["must be a number"]),
    ("minimum/float_bound", 2.5, {"minimum": 2.4}, True, 0, set(), []),
    # numeric-string coercion quirk (rules/utils.go:51-57)
    ("minimum/numeric_string", "7", {"minimum": 5}, True, 0, set(), []),
    ("minimum/nonnumeric_string", "abc", {"minimum": 5}, False, 1, {"minimum"}, ["must be a number"]),
    # ---- maximum (rules/number_test.go:46+) ----
    ("maximum/below", 3, {"maximum": 5}, True, 0, set(), []),
    ("maximum/equal", 5, {"maximum": 5}, True, 0, set(), []),
    ("maximum/above", 7, {"maximum": 5}, False, 1, {"maximum"}, ["greater than maximum 5"]),
    ("maximum/not_a_number", None, {"maximum": 5}, False, 1, {"maximum"}, ["must be a number"]),
    # ---- exclusiveMinimum ----
    ("exclusiveMinimum/above", 6, {"exclusiveMinimum": 5}, True, 0, set(), []),
    ("exclusiveMinimum/equal", 5, {"exclusiveMinimum": 5}, False, 1,
     {"exclusiveMinimum"}, ["less than or equal to exclusive minimum 5"]),
    ("exclusiveMinimum/below", 4, {"exclusiveMinimum": 5}, False, 1,
     {"exclusiveMinimum"}, ["less than or equal to exclusive minimum 5"]),
    # ---- exclusiveMaximum ----
    ("exclusiveMaximum/below", 4, {"exclusiveMaximum": 5}, True, 0, set(), []),
    ("exclusiveMaximum/equal", 5, {"exclusiveMaximum": 5}, False, 1,
     {"exclusiveMaximum"}, ["greater than or equal to exclusive maximum 5"]),
    # ---- multipleOf (rules/number.go:85-121, epsilon 1e-10 at :109-110) ----
    ("multipleOf/exact", 10, {"multipleOf": 5}, True, 0, set(), []),
    ("multipleOf/not_multiple", 7, {"multipleOf": 5}, False, 1,
     {"multipleOf"}, ["is not a multiple of 5"]),
    ("multipleOf/float_epsilon", 0.3, {"multipleOf": 0.1}, True, 0, set(), []),
    ("multipleOf/float_fail", 0.35, {"multipleOf": 0.1}, False, 1, {"multipleOf"}, []),
    ("multipleOf/non_number_value", "x", {"multipleOf": 5}, False, 1,
     {"multipleOf"}, ["can only be applied to numbers"]),
    # ---- minLength: BYTE semantics (rules/string.go:29) ----
    ("minLength/ok", "hello", {"minLength": 3}, True, 0, set(), []),
    ("minLength/equal", "abc", {"minLength": 3}, True, 0, set(), []),
    ("minLength/short", "ab", {"minLength": 3}, False, 1,
     {"minLength"}, ["length less than minimum 3"]),
    # "é" is 2 UTF-8 bytes: Go len("é")==2
    ("minLength/multibyte_bytes", "é", {"minLength": 2}, True, 0, set(), []),
    ("minLength/not_string", 5, {"minLength": 3}, False, 1, {"minLength"}, ["must be a string"]),
    # ---- maxLength ----
    ("maxLength/ok", "ab", {"maxLength": 3}, True, 0, set(), []),
    ("maxLength/long", "abcd", {"maxLength": 3}, False, 1,
     {"maxLength"}, ["length greater than maximum 3"]),
    # "héllo" = 6 bytes > 5
    ("maxLength/multibyte_bytes", "héllo", {"maxLength": 5}, False, 1, {"maxLength"}, []),
    ("maxLength/multibyte_codepoints_ok", "héllo", {"maxLength": 6}, True, 0, set(), []),
    # ---- pattern: unanchored search (rules/string.go:52-70) ----
    ("pattern/match", "hello", {"pattern": "^[a-z]+$"}, True, 0, set(), []),
    ("pattern/no_match", "Hello1", {"pattern": "^[a-z]+$"}, False, 1,
     {"pattern"}, ["does not match pattern"]),
    ("pattern/unanchored", "xx123yy", {"pattern": "[0-9]+"}, True, 0, set(), []),
    ("pattern/not_string", 42, {"pattern": "^a"}, False, 1, {"pattern"}, ["must be a string"]),
    # ---- enum (rules/rule.go:144-167: string enums) ----
    ("enum/ok", "val1", {"enum": ["val1", "val2"]}, True, 0, set(), []),
    ("enum/bad", "invalid", {"enum": ["val1", "val2"]}, False, 1,
     {"enum"}, ["value must be one of: val1, val2"]),
    ("enum/not_string", 5, {"enum": ["val1", "val2"]}, False, 1,
     {"enum"}, ["value must be a string"]),
    # extension: non-string scalar enum (documented deviation)
    ("enum/int_ext", 2, {"enum": [1, 2, 3]}, True, 0, set(), []),
    ("enum/int_ext_bad", 9, {"enum": [1, 2, 3]}, False, 1, {"enum"}, []),
    # ---- type (rules/type.go:21-123) ----
    ("type/string_ok", "x", {"type": "string"}, True, 0, set(), []),
    ("type/string_bad", 1, {"type": "string"}, False, 1, {"type"}, ["expected string"]),
    ("type/number_int_ok", 5, {"type": "number"}, True, 0, set(), []),
    ("type/number_float_ok", 5.5, {"type": "number"}, True, 0, set(), []),
    ("type/number_bool_bad", True, {"type": "number"}, False, 1, {"type"}, []),
    ("type/integer_ok", 5, {"type": "integer"}, True, 0, set(), []),
    # float with integral value accepted as integer (type.go:96-99)
    ("type/integer_float_integral", 5.0, {"type": "integer"}, True, 0, set(), []),
    ("type/integer_float_frac", 5.5, {"type": "integer"}, False, 1, {"type"}, []),
    ("type/boolean_ok", False, {"type": "boolean"}, True, 0, set(), []),
    ("type/boolean_not_int", 0, {"type": "boolean"}, False, 1, {"type"}, []),
    ("type/object_ok", {"a": 1}, {"type": "object"}, True, 0, set(), []),
    ("type/array_ok", [1, 2], {"type": "array"}, True, 0, set(), []),
    ("type/null_ok", None, {"type": "null"}, True, 0, set(), []),
    ("type/null_bad", "x", {"type": "null"}, False, 1, {"type"}, []),
    ("type/multi_ok_str", "x", {"type": ["string", "number"]}, True, 0, set(), []),
    ("type/multi_ok_num", 3.5, {"type": ["string", "number"]}, True, 0, set(), []),
    ("type/multi_bad", True, {"type": ["string", "number"]}, False, 1,
     {"type"}, ["does not match any of the expected types: string, number"]),
    # ---- required (validator.go:327-353) ----
    ("required/present", {"name": "x"}, {"required": ["name"]}, True, 0, set(), []),
    ("required/missing", {"age": 1}, {"required": ["name"]}, False, 1,
     {"required"}, ["required property 'name' is missing"]),
    ("required/two_missing", {}, {"required": ["a", "b"]}, False, 2, {"required"}, []),
    ("required/null_value_counts_as_present", {"name": None}, {"required": ["name"]},
     True, 0, set(), []),
    ("required/non_object", "str", {"required": ["name"]}, False, 1,
     {"required"}, ["value must be an object for required validation"]),
    # ---- items object mode (rules/array.go:43-76) ----
    ("items/all_ok", [1, 2, 3], {"type": "array", "items": {"type": "integer"}},
     True, 0, set(), []),
    ("items/one_bad", [1, "x", 3], {"type": "array", "items": {"type": "integer"}},
     False, 1, {"type"}, []),
    ("items/two_bad", ["a", "b", 3.5], {"type": "array", "items": {"type": "integer"}},
     False, 3, {"type"}, []),
    # ---- items tuple mode (rules/array.go:77-120): extras ignored ----
    ("items/tuple_ok", ["a", 1], {"items": [{"type": "string"}, {"type": "integer"}]},
     True, 0, set(), []),
    ("items/tuple_bad_pos", [1, 1], {"items": [{"type": "string"}, {"type": "integer"}]},
     False, 1, {"type"}, []),
    ("items/tuple_extra_ignored", ["a", 1, True],
     {"items": [{"type": "string"}, {"type": "integer"}]}, True, 0, set(), []),
    # ---- minItems / maxItems / uniqueItems (rules/array.go:135-187) ----
    ("minItems/ok", [1], {"minItems": 1}, True, 0, set(), []),
    ("minItems/empty", [], {"minItems": 1}, False, 1,
     {"minItems"}, ["fewer items than minimum 1"]),
    ("minItems/not_array", "ab", {"minItems": 1}, False, 1, {"minItems"}, ["must be an array"]),
    ("maxItems/ok", [1, 2], {"maxItems": 2}, True, 0, set(), []),
    ("maxItems/over", [1, 2, 3], {"maxItems": 2}, False, 1,
     {"maxItems"}, ["more items than maximum 2"]),
    ("uniqueItems/ok", [1, 2, 3], {"uniqueItems": True}, True, 0, set(), []),
    ("uniqueItems/dup", [1, 2, 1], {"uniqueItems": True}, False, 1,
     {"uniqueItems"}, ["contains duplicate items"]),
    ("uniqueItems/false_allows_dup", [1, 1], {"uniqueItems": False}, True, 0, set(), []),
    ("uniqueItems/deep_dup", [{"a": 1}, {"a": 1}], {"uniqueItems": True}, False, 1,
     {"uniqueItems"}, []),
    # JSON regime: 1 and 1.0 are the same number (Go json.Unmarshal → float64)
    ("uniqueItems/int_float_same", [1, 1.0], {"uniqueItems": True}, False, 1,
     {"uniqueItems"}, []),
    ("uniqueItems/bool_not_int", [True, 1], {"uniqueItems": True}, True, 0, set(), []),
    # ---- properties (validator.go:391-434): absent props skipped ----
    ("properties/ok", {"a": "x"}, {"properties": {"a": {"type": "string"}}}, True, 0, set(), []),
    ("properties/bad", {"a": 1}, {"properties": {"a": {"type": "string"}}},
     False, 1, {"type"}, []),
    ("properties/absent_skipped", {}, {"properties": {"a": {"type": "string"}}},
     True, 0, set(), []),
    ("properties/nested_path", {"a": {"b": 1}},
     {"properties": {"a": {"properties": {"b": {"type": "string"}}}}}, False, 1, {"type"}, []),
    # ---- minProperties / maxProperties (rules/object_constraints.go) ----
    ("minProperties/ok", {"a": 1, "b": 2}, {"minProperties": 2}, True, 0, set(), []),
    ("minProperties/under", {"a": 1}, {"minProperties": 2}, False, 1,
     {"minProperties"}, ["less than minProperties 2"]),
    ("minProperties/not_object", [1], {"minProperties": 1}, False, 1,
     {"minProperties"}, ["can only be applied to objects"]),
    ("maxProperties/over", {"a": 1, "b": 2, "c": 3}, {"maxProperties": 2}, False, 1,
     {"maxProperties"}, ["more than maxProperties 2"]),
    # ---- patternProperties (rules/object_patterns.go:11-62) ----
    ("patternProperties/ok", {"x_a": 1},
     {"patternProperties": {"^x_": {"type": "integer"}}}, True, 0, set(), []),
    ("patternProperties/bad", {"x_a": "s"},
     {"patternProperties": {"^x_": {"type": "integer"}}}, False, 1, {"type"}, []),
    ("patternProperties/unmatched_key_skipped", {"y": "s"},
     {"patternProperties": {"^x_": {"type": "integer"}}}, True, 0, set(), []),
    # ---- additionalProperties (validator.go:481-502; object_patterns.go:64-180) ----
    ("additionalProperties/false_ok", {"a": 1},
     {"properties": {"a": {"type": "integer"}}, "additionalProperties": False},
     True, 0, set(), []),
    ("additionalProperties/false_extra", {"a": 1, "b": 2},
     {"properties": {"a": {"type": "integer"}}, "additionalProperties": False},
     False, 1, {"additionalProperties"}, ["unknown field"]),
    ("additionalProperties/true_extra_ok", {"a": 1, "b": 2},
     {"properties": {"a": {"type": "integer"}}, "additionalProperties": True},
     True, 0, set(), []),
    ("additionalProperties/pattern_excluded", {"a": 1, "x_b": 2},
     {"properties": {"a": {"type": "integer"}},
      "patternProperties": {"^x_": {"type": "integer"}},
      "additionalProperties": False}, True, 0, set(), []),
    ("additionalProperties/schema_form_ok", {"a": 1, "b": "s"},
     {"properties": {"a": {"type": "integer"}},
      "additionalProperties": {"type": "string"}}, True, 0, set(), []),
    ("additionalProperties/schema_form_bad", {"a": 1, "b": 2},
     {"properties": {"a": {"type": "integer"}},
      "additionalProperties": {"type": "string"}}, False, 1, {"type"}, []),
    # ---- dependencies (rules/object_dependencies.go) ----
    ("dependencies/list_ok", {"a": 1, "b": 2}, {"dependencies": {"a": ["b"]}},
     True, 0, set(), []),
    ("dependencies/list_missing", {"a": 1}, {"dependencies": {"a": ["b"]}},
     False, 1, {"dependencies"}, ["depends on 'b', but it is missing"]),
    ("dependencies/absent_trigger_ok", {"c": 1}, {"dependencies": {"a": ["b"]}},
     True, 0, set(), []),
    # schema dep validates the PROPERTY'S VALUE (object_dependencies.go:72-92)
    ("dependencies/schema_ok", {"a": 5}, {"dependencies": {"a": {"minimum": 3}}},
     True, 0, set(), []),
    ("dependencies/schema_bad", {"a": 1}, {"dependencies": {"a": {"minimum": 3}}},
     False, 1, {"dependencies"}, ["dependency validation failed for property 'a'"]),
    # ---- allOf / anyOf / oneOf / not (rules/logical_rules.go) ----
    ("allOf/ok", 7, {"allOf": [{"minimum": 5}, {"maximum": 10}]}, True, 0, set(), []),
    ("allOf/one_fails", 3, {"allOf": [{"minimum": 5}, {"maximum": 10}]},
     False, 1, {"allOf"}, ["failed to validate against schema at allOf[0]"]),
    ("allOf/both_fail", 20, {"allOf": [{"minimum": 25}, {"maximum": 10}]},
     False, 2, {"allOf"}, []),
    ("anyOf/first", "x", {"anyOf": [{"type": "string"}, {"type": "number"}]},
     True, 0, set(), []),
    ("anyOf/second", 5, {"anyOf": [{"type": "string"}, {"type": "number"}]},
     True, 0, set(), []),
    ("anyOf/none", True, {"anyOf": [{"type": "string"}, {"type": "number"}]},
     False, 1, {"anyOf"}, ["value does not match any schema in anyOf"]),
    ("oneOf/exactly_one", "x", {"oneOf": [{"type": "string"}, {"type": "number"}]},
     True, 0, set(), []),
    ("oneOf/more_than_one", 5,
     {"oneOf": [{"type": "integer"}, {"type": "number"}]}, False, 1,
     {"oneOf"}, ["value matches more than one schema in oneOf"]),
    ("oneOf/none", True, {"oneOf": [{"type": "string"}, {"type": "number"}]},
     False, 1, {"oneOf"}, ["value does not match any schema in oneOf"]),
    ("not/ok", 5, {"not": {"type": "string"}}, True, 0, set(), []),
    ("not/bad", "x", {"not": {"type": "string"}}, False, 1,
     {"not"}, ["value must not validate against the schema in not"]),
    # ---- conditional wrapper (rules/conditional_rules.go:134-245) ----
    ("conditional/then_ok", {"t": "a", "v": 15},
     {"conditional": {"if": {"properties": {"t": {"enum": ["a"]}}},
                      "then": {"properties": {"v": {"minimum": 10}}}}},
     True, 0, set(), []),
    ("conditional/then_fail", {"t": "a", "v": 5},
     {"conditional": {"if": {"properties": {"t": {"enum": ["a"]}}},
                      "then": {"properties": {"v": {"minimum": 10}}}}},
     False, 1, {"conditional"}, ["validation failed against then schema"]),
    ("conditional/else_fail", {"t": "b", "v": 50},
     {"conditional": {"if": {"properties": {"t": {"enum": ["a"]}}},
                      "then": {"properties": {"v": {"minimum": 10}}},
                      "else": {"properties": {"v": {"maximum": 20}}}}},
     False, 1, {"conditional"}, ["validation failed against else schema"]),
    ("conditional/else_ok", {"t": "b", "v": 5},
     {"conditional": {"if": {"properties": {"t": {"enum": ["a"]}}},
                      "then": {"properties": {"v": {"minimum": 10}}},
                      "else": {"properties": {"v": {"maximum": 20}}}}},
     True, 0, set(), []),
    ("conditional/no_else_passes", {"t": "b", "v": 5},
     {"conditional": {"if": {"properties": {"t": {"enum": ["a"]}}},
                      "then": {"properties": {"v": {"minimum": 10}}}}},
     True, 0, set(), []),
    # standalone if/then/else spelled at schema level — evaluated with the
    # same (correct) mask semantics, unlike the reference's broken standalone
    # keywords (documented deviation, SURVEY.md §2.1)
    ("ifthenelse/then_fail", {"t": "a", "v": 5},
     {"if": {"properties": {"t": {"enum": ["a"]}}},
      "then": {"properties": {"v": {"minimum": 10}}}},
     False, 1, {"conditional"}, []),
]


@pytest.mark.parametrize("case_id,value,schema,valid,n,tags,substrings",
                         CASES, ids=[c[0] for c in CASES])
def test_keyword_case(engine, case_id, value, schema, valid, n, tags, substrings):
    result = engine.validate(value, schema)
    assert result.valid == valid, f"{case_id}: errors={result.errors}"
    assert result.error_count == n, f"{case_id}: errors={result.errors}"
    assert result.tags() == tags, f"{case_id}: got tags {result.tags()}"
    all_msgs = " | ".join(e.message for e in result.errors)
    for sub in substrings:
        assert sub in all_msgs, f"{case_id}: {sub!r} not in {all_msgs!r}"


def test_stop_on_first_error():
    """StopOnFirstError short-circuits accumulation
    (`/root/reference/validator/validator.go:543-545`)."""
    from jsonschema_validator_ray import Options, ValueEngine

    schema = {"required": ["a", "b", "c"]}
    accumulate = ValueEngine(Options()).validate({}, schema)
    assert accumulate.error_count == 3
    stop = ValueEngine(Options(stop_on_first_error=True)).validate({}, schema)
    assert stop.error_count == 1


def test_allow_unknown_fields():
    """AllowUnknownFields suppresses additionalProperties:false
    (`/root/reference/validator/validator.go:482`)."""
    from jsonschema_validator_ray import Options, ValueEngine

    schema = {"properties": {"a": {"type": "integer"}}, "additionalProperties": False}
    doc = {"a": 1, "b": 2}
    assert not ValueEngine(Options()).validate(doc, schema).valid
    assert ValueEngine(Options(allow_unknown_fields=True)).validate(doc, schema).valid


def test_error_paths_are_dotted():
    from jsonschema_validator_ray import ValueEngine

    r = ValueEngine().validate(
        {"a": {"b": [1, "x"]}},
        {"properties": {"a": {"properties": {"b": {"items": {"type": "integer"}}}}}},
    )
    assert not r.valid
    assert r.errors[0].path == "$.a.b[1]"


def test_validate_json_entrypoint(engine):
    """ValidateJSON analogue (`/root/reference/validator/validator.go:289-317`)."""
    r = engine.validate_json(
        '{"name": "john", "age": 30}',
        '{"type": "object", "required": ["name"],'
        ' "properties": {"name": {"type": "string"}, "age": {"minimum": 0}}}',
    )
    assert r.valid
