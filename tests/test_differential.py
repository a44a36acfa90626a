"""Property-based differential test: the VECTORIZED column plan and the
recursive VALUE ENGINE must produce identical verdicts on flat rows.

Mapping between regimes: a row's NULL cell ≡ the property being ABSENT from
the document (plan.py null semantics), so the value-engine document drops
None keys while ``required`` sees the missing key. Any disagreement is a
bug in one of the engines.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_validator_ray import Options, ValueEngine
from jsonschema_validator_ray.stages.validate import BatchValidator

# -- schema grammar (flat: column → scalar keywords) ------------------------

_string_kw = st.fixed_dictionaries({}, optional={
    "type": st.just("string"),
    "minLength": st.integers(0, 6),
    "maxLength": st.integers(6, 20),
    "pattern": st.sampled_from(["^a", "b$", "[0-9]", "^[a-z]+$"]),
    "enum": st.lists(st.sampled_from(["aa", "bb", "cc", "x1"]),
                     min_size=1, max_size=3, unique=True),
    "format": st.sampled_from(["uuid", "hostname", "ipv4"]),
})
_number_kw = st.fixed_dictionaries({}, optional={
    "type": st.sampled_from(["number", "integer"]),
    "minimum": st.integers(-5, 5),
    "maximum": st.integers(5, 15),
    "exclusiveMinimum": st.integers(-5, 5),
    "exclusiveMaximum": st.integers(5, 15),
    "multipleOf": st.sampled_from([1, 2, 0.5]),
    "enum": st.lists(st.integers(-5, 15), min_size=1, max_size=4, unique=True),
})

# guaranteed-nonempty simple branch schema (compile rejects empty not/…)
_branch = st.fixed_dictionaries(
    {"minimum": st.integers(-3, 6)},
    optional={"maximum": st.integers(6, 14),
              "multipleOf": st.sampled_from([1, 2])})
_combo_kw = st.fixed_dictionaries({}, optional={
    "anyOf": st.lists(_branch, min_size=1, max_size=2),
    "oneOf": st.lists(_branch, min_size=1, max_size=2),
    "allOf": st.lists(_branch, min_size=1, max_size=2),
    "not": _branch,
    "conditional": st.fixed_dictionaries({}, optional={
        "if": _branch, "then": _branch, "else": _branch}),
})
_elem_kw = st.fixed_dictionaries({}, optional={
    "type": st.sampled_from(["number", "integer"]),
    "minimum": st.integers(-2, 4),
    "maximum": st.integers(4, 12),
    "multipleOf": st.sampled_from([1, 2]),
})
_list_kw = st.fixed_dictionaries({}, optional={
    "minItems": st.integers(0, 2),
    "maxItems": st.integers(2, 5),
    "uniqueItems": st.booleans(),
    # object mode (one schema for every element) OR tuple mode (schema per
    # position, extras ignored — rules/array.go:77-120)
    "items": st.one_of(_elem_kw, st.lists(_elem_kw, min_size=1, max_size=3)),
})

# keywords may land on a MISMATCHED column (string keywords on the numeric
# column and vice versa): the column plan's runtime type guards must then
# reproduce the engine's per-row type-error / numeric-string-coercion
# semantics
_schema = st.fixed_dictionaries({}, optional={
    "s": st.one_of(_string_kw, _number_kw, _combo_kw),
    "n": st.one_of(_number_kw, _string_kw, _combo_kw),
    "xs": _list_kw,
})

_row = st.fixed_dictionaries({
    "k": st.integers(0, 10**6),
    "s": st.one_of(st.none(),
                   st.text(alphabet="abx019", min_size=0, max_size=12)),
    "n": st.one_of(st.none(),
                   st.integers(-10, 20),
                   st.floats(-10, 20, allow_nan=False)),
    # null ELEMENTS included: the plan applies the value engine's verdict
    # for None per element (r1's null-elements-pass deviation is fixed)
    "xs": st.one_of(st.none(),
                    st.lists(st.one_of(st.none(), st.integers(-4, 14)),
                             max_size=5)),
})


@settings(max_examples=int(__import__('os').environ.get('DIFF_EXAMPLES', '200')), deadline=None)
@given(props=_schema, required=st.lists(st.sampled_from(["s", "n"]),
                                        max_size=2, unique=True),
       rows=st.lists(_row, min_size=1, max_size=5))
def test_column_plan_agrees_with_value_engine(props, required, rows):
    table_schema = {}
    if required:
        table_schema["required"] = required
    if props:
        table_schema["properties"] = props
    if not table_schema:
        return

    batch = pa.table({
        "k": pa.array([r["k"] for r in rows], type=pa.int64()),
        "s": pa.array([r["s"] for r in rows], type=pa.string()),
        "n": pa.array([r["n"] for r in rows], type=pa.float64()),
        "xs": pa.array([r["xs"] for r in rows], type=pa.list_(pa.float64())),
    })
    plan_out = BatchValidator(table_schema, "k")(batch).to_pylist()

    has_items = "items" in (props.get("xs") or {})

    engine = ValueEngine(Options())
    for r, got in zip(rows, plan_out):
        doc = {k: v for k, v in r.items() if v is not None and k != "k"}
        # the column regime reads n as float64 and xs as list<float64> —
        # mirror that coercion (null elements stay null)
        if "n" in doc:
            doc["n"] = float(doc["n"])
        if "xs" in doc:
            doc["xs"] = [None if x is None else float(x) for x in doc["xs"]]
        expect = engine.validate(doc, table_schema)
        assert expect.valid == got["valid"], (
            r, table_schema, expect.errors, got["violations"])
        assert expect.error_count == got["error_count"], (
            r, table_schema, expect.errors, got["violations"])
        ve_tags = {e.tag for e in expect.errors}
        cp_tags = {v["tag"] for v in got["violations"]}
        # full tag-SET equality, items included: the CP emits one violation
        # row per failing (element, child keyword) occurrence — VE
        # recursion parity (rules/array.go:43-76), r4 upgrade from the r3
        # subset contract
        assert ve_tags == cp_tags, (
            r, table_schema, expect.errors, got["violations"])
        if has_items:
            assert "items" not in cp_tags, (r, table_schema,
                                            got["violations"])
            # and one CP violation ROW per VE error, not just equal sets
            assert len(got["violations"]) == expect.error_count, (
                r, table_schema, expect.errors, got["violations"])
