"""Coercion utilities (utils.go parity), custom-validate hook, nested record
recursion, and the dynamic-JSON events.props pipeline."""

from __future__ import annotations

import pytest

from jsonschema_validator_ray.functions.coerce import (
    contains,
    difference,
    get_object_keys,
    has_key,
    intersection,
    merge_objects,
    to_bool,
    to_float,
    to_int,
    to_string,
    union,
)


def test_to_float_parity():
    """`/root/reference/rules/utils.go:19-61` incl. the Sscanf prefix quirk."""
    assert to_float(5) == (5.0, True)
    assert to_float(5.5) == (5.5, True)
    assert to_float("7") == (7.0, True)
    assert to_float("3.14xyz") == (3.14, True)   # Sscanf parses the prefix
    assert to_float("abc")[1] is False
    assert to_float(True)[1] is False            # bool is not numeric
    assert to_float(None)[1] is False


def test_to_int_parity():
    assert to_int(5) == (5, True)
    assert to_int(5.0) == (5, True)
    assert to_int(5.5)[1] is False
    assert to_int("12") == (12, True)
    assert to_int("12.5")[1] is False            # strconv.Atoi strictness
    assert to_int(True)[1] is False


def test_to_string_parity():
    assert to_string("x") == ("x", True)
    assert to_string(b"ab") == ("ab", True)
    assert to_string(5) == ("5", True)
    assert to_string(5.0) == ("5", True)         # Go %v renders 5.0 as 5
    assert to_string(5.5) == ("5.5", True)
    assert to_string(True)[1] is False           # no bool arm in Go switch
    assert to_string({"a": 1})[1] is False


def test_to_bool_parity():
    """`utils.go:133-146`: "true"/"1"/"yes"/"y" → True; other strings →
    (False, ok=True)."""
    assert to_bool(True) == (True, True)
    assert to_bool("yes") == (True, True)
    assert to_bool("no") == (False, True)
    assert to_bool(1) == (True, True)
    assert to_bool(0.0) == (False, True)
    assert to_bool(None)[1] is False


def test_set_and_object_ops():
    """DeepEqual-flavored set ops (`utils.go:215-291`); JSON regime treats
    1 == 1.0 but True != 1."""
    assert contains([1, 2.0, "x"], 2)
    assert not contains([1], True)
    assert intersection([1, 2, 3], [2, 3, 4]) == [2, 3]
    assert union([1, 2], [2, 3]) == [1, 2, 3]
    assert difference([1, 2, 3], [2]) == [1, 3]
    assert contains([{"a": [1]}], {"a": [1.0]})
    assert get_object_keys({"a": 1, "b": 2}) == ["a", "b"]
    assert has_key({"a": 1}, "a") and not has_key({}, "a")
    assert merge_objects({"a": 1}, {"a": 2, "b": 3}) == {"a": 2, "b": 3}


def test_custom_validate_hook():
    """SetCustomValidateFunc analogue (validator.go:129-131,181-204)."""
    from jsonschema_validator_ray.functions.tagparse import validate_record

    def admin_hook(field, value):
        if field == "role" and isinstance(value, str) and not value.startswith("ADMIN_"):
            return False, "value must start with 'ADMIN_'"
        return True, None

    tags = {"role": "required,minLength=3"}
    ok = validate_record({"role": "ADMIN_root"}, tags, custom_validate=admin_hook)
    assert ok.valid
    bad = validate_record({"role": "user_x"}, tags, custom_validate=admin_hook)
    assert not bad.valid and "ADMIN_" in bad.errors[0].message


def test_nested_record_recursion():
    """RecursiveValidation analogue (validator.go:224-245): dotted paths."""
    from jsonschema_validator_ray.functions.tagparse import validate_record

    tags = {"name": "required",
            "address": {"city": "required,minLength=2", "zip": "pattern=^[0-9]{5}$"}}
    r = validate_record({"name": "a", "address": {"city": "x", "zip": "12"}}, tags)
    assert not r.valid
    assert ("minLength", "$.address.city") in r.tag_paths()
    assert ("pattern", "$.address.zip") in r.tag_paths()
    # recursion off → nested ignored
    r2 = validate_record({"name": "a", "address": {"city": "x"}}, tags,
                         recursive=False)
    assert r2.valid


def test_events_props_pipeline(ray_session):
    """Dynamic-JSON regime over the events table + agreement with DuckDB."""
    import duckdb

    from jsonschema_validator_ray.pipelines import corpus
    from tests.conftest import SF_SMOKE

    ours = corpus.verdict_events_props(SF_SMOKE).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'")
    theirs = con.execute(corpus.VERDICT_PROPS_SQL).df() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(ours) == len(theirs)
    assert (ours["valid"].to_numpy() == theirs["valid"].to_numpy()).all()
    assert (ours["error_count"].to_numpy() == theirs["error_count"].to_numpy()).all()
