"""Mega-differential: RANDOM schemas drawn from the full keyword surface
(combinators, conditionals, dependencies, patternProperties /
additionalProperties, nested struct recursion) against random typed rows —
the vectorized column plan must agree with the value engine on verdicts,
error counts, and tag sets. Any disagreement is a bug in one engine.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_validator_ray import Options, ValueEngine
from jsonschema_validator_ray.stages.validate import BatchValidator

# ---- schema grammar -------------------------------------------------------

_n_branch = st.fixed_dictionaries(
    {"minimum": st.integers(-4, 6)},
    optional={"maximum": st.integers(6, 15),
              "multipleOf": st.sampled_from([1, 2])})
_s_branch = st.fixed_dictionaries(
    {"minLength": st.integers(0, 4)},
    optional={"maxLength": st.integers(4, 10),
              "pattern": st.sampled_from(["^a", "[0-9]$"])})

_n_schema = st.one_of(
    _n_branch,
    st.fixed_dictionaries({}, optional={
        "type": st.sampled_from(["number", "integer"]),
        "minimum": st.integers(-4, 6),
        "enum": st.lists(st.integers(-4, 15), min_size=1, max_size=3,
                         unique=True),
        "anyOf": st.lists(_n_branch, min_size=1, max_size=2),
        "oneOf": st.lists(_n_branch, min_size=1, max_size=2),
        "allOf": st.lists(_n_branch, min_size=1, max_size=2),
        "not": _n_branch,
        "conditional": st.fixed_dictionaries({}, optional={
            "if": _n_branch, "then": _n_branch, "else": _n_branch}),
    }))
_s_schema = st.one_of(
    _s_branch,
    st.fixed_dictionaries({}, optional={
        "type": st.just("string"),
        "enum": st.lists(st.sampled_from(["aa", "ab", "b1", "x"]),
                         min_size=1, max_size=3, unique=True),
        "format": st.sampled_from(["uuid", "ipv4"]),
        "anyOf": st.lists(_s_branch, min_size=1, max_size=2),
        "not": _s_branch,
    }))

_u_schema = st.fixed_dictionaries({}, optional={
    "required": st.lists(st.sampled_from(["a", "b"]), max_size=1,
                         unique=True),
    "properties": st.fixed_dictionaries({}, optional={
        "a": _n_schema, "b": _s_schema}),
    "minProperties": st.integers(0, 2),
    "maxProperties": st.integers(1, 2),
    "patternProperties": st.fixed_dictionaries({}, optional={
        "^a": _n_branch}),
    "additionalProperties": st.one_of(st.booleans(), _s_branch),
    "dependencies": st.fixed_dictionaries({}, optional={
        "a": st.one_of(st.just(["b"]), _n_branch)}),
})

_table = st.fixed_dictionaries({}, optional={
    "required": st.lists(st.sampled_from(["s", "n"]), max_size=1,
                         unique=True),
    "properties": st.fixed_dictionaries({}, optional={
        "s": st.one_of(_s_schema, _n_schema),   # mismatched types too
        "n": st.one_of(_n_schema, _s_schema),
        "u": _u_schema,
    }),
    "dependencies": st.fixed_dictionaries({}, optional={
        "s": st.just(["n"])}),
})

_row = st.fixed_dictionaries({
    "k": st.integers(0, 10**6),
    "s": st.one_of(st.none(), st.text(alphabet="ab1", max_size=6)),
    "n": st.one_of(st.none(), st.integers(-6, 16),
                   st.floats(-6, 16, allow_nan=False)),
    "u": st.one_of(st.none(), st.fixed_dictionaries({
        "a": st.one_of(st.none(), st.integers(-5, 15)),
        "b": st.one_of(st.none(), st.text(alphabet="ab1", max_size=5)),
    })),
})

_U_TYPE = pa.struct([("a", pa.float64()), ("b", pa.string())])


@settings(max_examples=int(__import__('os').environ.get('DIFF_EXAMPLES',
                                                        '200')),
          deadline=None)
@given(schema=_table, rows=st.lists(_row, min_size=1, max_size=5))
def test_full_surface_differential(schema, rows):
    if not schema:
        return
    batch = pa.table({
        "k": pa.array([r["k"] for r in rows], type=pa.int64()),
        "s": pa.array([r["s"] for r in rows], type=pa.string()),
        "n": pa.array([r["n"] for r in rows], type=pa.float64()),
        "u": pa.array([r["u"] for r in rows], type=_U_TYPE),
    })
    got = BatchValidator(schema, "k")(batch).to_pylist()
    engine = ValueEngine(Options())
    for r, g in zip(rows, got):
        doc = {}
        if r["s"] is not None:
            doc["s"] = r["s"]
        if r["n"] is not None:
            doc["n"] = float(r["n"])
        if r["u"] is not None:
            doc["u"] = {k: (float(v) if k == "a" else v)
                        for k, v in r["u"].items() if v is not None}
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"], (
            r, schema, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"], (
            r, schema, expect.errors, g["violations"])
        assert {e.tag for e in expect.errors} == \
            {v["tag"] for v in g["violations"]}, (r, schema, expect.errors)
