"""Vectorized DeepEqual enum membership for non-scalar columns
(plan._deep_enum_fast) — parity with the value engine's _kw_enum extension
and with the per-row _deep_key fallback, and proof the CP fast path (not
the cold path, not the VE) handles object/array enum members."""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_validator_ray.plan import _deep_enum_fast
from jsonschema_validator_ray.schema import compile_schema
from jsonschema_validator_ray.value_engine import Options, ValueEngine, _deep_key


def _ve_verdicts(cells, enum):
    e = ValueEngine(Options())
    schema = compile_schema('{"properties": {"c": %s}}'
                            % __import__("json").dumps({"enum": enum}))
    out = []
    for v in cells:
        if v is None:
            out.append(True)       # null cell = absent property, passes
        else:
            out.append(e.validate({"c": v}, schema).valid)
    return out


def _fallback(cells, enum):
    keys = {_deep_key(x) for x in enum}
    return [True if v is None else _deep_key(v) in keys for v in cells]


LIST_ENUM = [[1, 2.0], [3.5], [], [1, None], ["not-a-number-list"],
             [True, False], [[1, 2]], {"a": 1}, "x", 7]
LIST_CELLS = [[1.0, 2.0], [3.5], [], [1.0, None], [None, 1.0], [2.0, 1.0],
              [1.0, 2.0, 3.0], None, [1.0], [0.0], [1.0, 2.0]]


def test_list_float_enum_fast_matches_ve_and_fallback():
    t = pa.list_(pa.float64())
    fn = _deep_enum_fast("c", LIST_ENUM, t)
    assert fn is not None, "list<float64> must take the vectorized path"
    batch = pa.table({"c": pa.array(LIST_CELLS, type=t)})
    got = fn(batch).to_pylist()
    assert got == _fallback(LIST_CELLS, LIST_ENUM)
    assert got == _ve_verdicts(LIST_CELLS, LIST_ENUM)
    # 1 == 1.0 across the boundary, [] matches [], None element matches,
    # bool-list member never matches a float list
    assert got[0] and got[2] and got[3] and not got[5]


def test_list_string_enum_fast():
    enum = [["a", "b"], ["a"], [None], 5, ["a", 1]]
    cells = [["a", "b"], ["b", "a"], ["a"], [None], ["a", None], None, []]
    t = pa.list_(pa.string())
    fn = _deep_enum_fast("c", enum, t)
    assert fn is not None
    got = fn(pa.table({"c": pa.array(cells, type=t)})).to_pylist()
    assert got == _fallback(cells, enum) == _ve_verdicts(cells, enum)


def test_struct_enum_fast():
    enum = [{"a": 1, "b": "x"}, {"a": 2.0, "b": None}, {"a": 1}, "s",
            {"a": True, "b": "x"}, {"a": 1, "b": "x", "z": 0}]
    t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    cells = [{"a": 1, "b": "x"}, {"a": 2, "b": None}, {"a": 1, "b": None},
             {"a": 1, "b": "y"}, None, {"a": 3, "b": "x"}]
    fn = _deep_enum_fast("c", enum, t)
    assert fn is not None, "flat struct must take the vectorized path"
    got = fn(pa.table({"c": pa.array(cells, type=t)})).to_pylist()
    assert got == _fallback(cells, enum) == _ve_verdicts(cells, enum)
    # int cell 1 matches number member 1; bool member never matches int 1;
    # member with extra/missing keys never matches
    assert got[0] and got[1] and not got[2] and not got[3] and not got[5]


def test_bool_enum_fast():
    enum = [True, 1, "x"]     # 1 must NOT match True (DeepEqual)
    cells = [True, False, None]
    fn = _deep_enum_fast("c", enum, pa.bool_())
    assert fn is not None
    got = fn(pa.table({"c": pa.array(cells, type=pa.bool_())})).to_pylist()
    assert got == _fallback(cells, enum) == _ve_verdicts(cells, enum)
    assert got == [True, False, True]


def test_nested_shapes_fall_back():
    # list<list<…>> and map stay on the per-row path
    assert _deep_enum_fast("c", [[1]], pa.list_(pa.list_(pa.int64()))) is None
    assert _deep_enum_fast("c", [{"a": 1}],
                           pa.map_(pa.string(), pa.int64())) is None


def test_batchvalidator_runs_cp_with_object_enum(ray_session):
    """End-to-end: object/array enum members flow through the COLUMN PLAN
    (compile succeeds — no dynamic-regime steering) and verdicts match the
    value engine row by row."""
    from jsonschema_validator_ray.plan import compile_table_plan
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {
        "tags": {"enum": [["a"], ["a", "b"], []]},
        "meta": {"enum": [{"k": 1, "v": "x"}, {"k": 2, "v": None}]},
    }}
    # compile does NOT raise → CP handles it; and the enum constraints exist
    plan = compile_table_plan(schema, "id")
    assert {c.tag for c in plan.constraints} >= {"enum"}

    batch = pa.table({
        "id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "tags": pa.array([["a"], ["b"], [], None],
                         type=pa.list_(pa.string())),
        "meta": pa.array([{"k": 1, "v": "x"}, {"k": 1, "v": "y"},
                          None, {"k": 2, "v": None}],
                         type=pa.struct([("k", pa.int64()),
                                         ("v", pa.string())])),
    })
    got = BatchValidator(schema, "id")(batch).to_pylist()
    e = ValueEngine(Options())
    cells = batch.to_pylist()
    for row, g in zip(cells, got):
        doc = {k: v for k, v in row.items() if v is not None and k != "id"}
        want = e.validate(doc, schema)
        assert want.valid == g["valid"], (row, g)
        assert want.error_count == g["error_count"], (row, g)
