"""Schema compile errors — ported from
/root/reference/schema/invalid_schema_test.go:9-160 and
recursive_schema_test.go:9-33."""

from __future__ import annotations

import pytest

from jsonschema_validator_ray import Mode, SchemaError, compile_schema, parse_schema


@pytest.mark.parametrize("schema,msg_part", [
    ({"type": 123}, "type must be a string"),
    ({"type": "not-a-type"}, "invalid type"),
    ({"type": ["string", 5]}, "type must be a string"),
    ({"minimum": "abc"}, "minimum must be a number"),
    ({"minLength": -1}, "minLength must be a non-negative integer"),
    ({"minLength": 1.5}, "minLength must be a non-negative integer"),
    ({"maxItems": "x"}, "maxItems must be a non-negative integer"),
    ({"pattern": "[invalid"}, "invalid pattern"),
    ({"patternProperties": {"[bad": {}}}, "invalid patternProperties regex"),
    ({"required": [123]}, "required must be an array of strings"),
    ({"required": "name"}, "required must be an array of strings"),
    ({"multipleOf": 0}, "multipleOf must be a positive number"),
    ({"multipleOf": -2}, "multipleOf must be a positive number"),
    ({"enum": []}, "enum must be a non-empty array"),
    ({"items": "x"}, "items must be an object or array"),
    ({"uniqueItems": "yes"}, "uniqueItems must be a boolean"),
    ({"additionalProperties": 5}, "additionalProperties must be a boolean or an object"),
    ({"dependencies": {"a": 5}}, "must be an array or an object"),
    ({"allOf": []}, "allOf cannot be empty"),
    ({"anyOf": "x"}, "anyOf must be an array"),
    ({"oneOf": []}, "oneOf cannot be empty"),
    ({"not": {}}, "not schema cannot be empty"),
    ({"conditional": "x"}, "conditional must be an object"),
    # $ref rejected in strict mode (schema/schema.go:277-281)
    ({"$ref": "#/defs/x"}, "$ref"),
    # unknown keyword rejected in strict mode (schema/schema.go:284-293)
    ({"frobnicate": 1}, "unknown validation keyword: frobnicate"),
    # nested compile errors propagate
    ({"properties": {"a": {"minimum": "x"}}}, "minimum must be a number"),
    ({"items": {"pattern": "[bad"}}, "invalid pattern"),
])
def test_compile_rejects(schema, msg_part):
    with pytest.raises(SchemaError) as ei:
        compile_schema(schema, Mode.STRICT)
    assert msg_part in str(ei.value)


def test_malformed_json_schema_string():
    with pytest.raises(SchemaError):
        compile_schema("{not json")
    with pytest.raises(SchemaError):
        parse_schema("[1,2]")  # top level must be an object


def test_loose_mode_allows_unknown_and_ref():
    c = compile_schema({"frobnicate": 1, "$ref": "#/x", "type": "string"}, Mode.LOOSE)
    assert "type" in c
    assert "$ref" not in c  # dropped, not kept


def test_coercions():
    """Compile-time coercions (schema/schema.go:95-133, 264-274)."""
    c = compile_schema({"minimum": 5, "minLength": 3.0, "required": ["a"]})
    assert isinstance(c.get("minimum"), float)
    assert isinstance(c.get("minLength"), int)
    assert c.get("required") == ["a"]


def test_metadata_keys_kept_but_inert():
    c = compile_schema({"title": "t", "description": "d", "type": "string"})
    assert c.get("title") == "t"
    from jsonschema_validator_ray import ValueEngine

    assert ValueEngine().validate("x", c).valid


def test_schema_to_json_roundtrip():
    from jsonschema_validator_ray.schema import schema_to_json

    c = compile_schema({
        "type": "object",
        "properties": {"a": {"type": "string", "pattern": "^a"}},
        "patternProperties": {"^x_": {"type": "integer"}},
        "required": ["a"],
    })
    s = schema_to_json(c)
    c2 = compile_schema(s)
    assert schema_to_json(c2) == s
