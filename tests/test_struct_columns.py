"""Vectorized validation of typed NESTED struct columns (dotted-path plan):
agreement with the value engine, null-ancestor semantics, missing fields."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_validator_ray import Options, ValueEngine
from jsonschema_validator_ray.stages.validate import BatchValidator

SCHEMA = {
    "required": ["k", "user"],
    "properties": {
        "user": {
            "required": ["name"],
            "properties": {
                "name": {"type": "string", "minLength": 2},
                "age": {"type": "integer", "minimum": 0},
                "contact": {"properties": {"email": {"format": "email"}}},
            },
        },
    },
}


def _strip_nones(d):
    if isinstance(d, dict):
        return {k: _strip_nones(v) for k, v in d.items() if v is not None}
    return d


def _compare(rows):
    t = pa.Table.from_pylist(rows)
    out = BatchValidator(SCHEMA, "k")(t).to_pylist()
    ve = ValueEngine(Options())
    for r, got in zip(rows, out):
        exp = ve.validate(_strip_nones(r), SCHEMA)
        assert exp.valid == got["valid"], (r, exp.errors, got["violations"])
        assert exp.error_count == got["error_count"], (r, exp.errors,
                                                       got["violations"])
        assert {e.tag for e in exp.errors} == \
            {v["tag"] for v in got["violations"]}, r
    return out


def test_struct_columns_match_value_engine(ray_session):
    out = _compare([
        {"k": 1, "user": {"name": "ann", "age": 30,
                          "contact": {"email": "a@b.co"}}},
        {"k": 2, "user": {"name": "x", "age": -1, "contact": {"email": "bad"}}},
        {"k": 3, "user": {"name": None, "age": 5, "contact": None}},
        {"k": 4, "user": None},
    ])
    by_k = {r["k"]: r for r in out}
    assert {v["constraint_id"] for v in by_k[2]["violations"]} == {
        "minLength:user.name", "minimum:user.age", "format:user.contact.email"}
    # violation paths are dotted
    assert by_k[3]["violations"][0]["path"] == "$.user.name"


@settings(max_examples=int(__import__('os').environ.get('DIFF_EXAMPLES', '120')), deadline=None)
@given(rows=st.lists(st.fixed_dictionaries({
    "k": st.integers(0, 100),
    "user": st.one_of(st.none(), st.fixed_dictionaries({
        "name": st.one_of(st.none(), st.text("abx", max_size=5)),
        "age": st.one_of(st.none(), st.integers(-3, 120)),
        "contact": st.one_of(st.none(), st.fixed_dictionaries({
            "email": st.one_of(st.none(), st.sampled_from(
                ["a@b.co", "nope", "x@y.org", ""])),
        })),
    })),
}), min_size=1, max_size=6))
def test_struct_differential_property(rows):
    _compare(rows)


def test_struct_through_ray_pipeline(ray_session):
    import ray.data

    rows = [{"k": i,
             "user": {"name": f"user{i}" if i % 3 else "z",
                      "age": i - 2,
                      "contact": {"email": f"u{i}@example.com"}}}
            for i in range(30)]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(BatchValidator(SCHEMA, "k"),
                         batch_format="pyarrow", batch_size=8).to_pandas()
    assert len(out) == 30
    # i in {0,1}: age negative; i%3==0: name too short
    assert not out.loc[out["k"] == 0, "valid"].iloc[0]
    assert out.loc[out["k"] == 5, "valid"].iloc[0]


def test_vectorized_items_scalar_elements(ray_session):
    """Object-mode items with scalar element constraints, fully vectorized
    (flatten + parent re-aggregation). Verdicts match the value engine;
    violation granularity is per row."""
    import pyarrow as pa

    t = pa.table({"k": [1, 2, 3, 4, 5],
                  "xs": [[1.0, 2.0, 3.0], [1.0, -2.0], [], None, [0.5, 100.0]]})
    schema = {"properties": {"xs": {"items": {"minimum": 0, "maximum": 50},
                                    "minItems": 1}}}
    out = {r["k"]: r for r in BatchValidator(schema, "k")(t).to_pylist()}
    assert out[1]["valid"]
    assert [x["constraint_id"] for x in out[2]["violations"]] == ["items:xs"]
    assert [x["constraint_id"] for x in out[3]["violations"]] == ["minItems:xs"]
    assert out[4]["valid"]  # null list = absent
    assert not out[5]["valid"]

    ve = ValueEngine(Options())
    for r in t.to_pylist():
        doc = {kk: vv for kk, vv in r.items() if vv is not None}
        assert ve.validate(doc, schema).valid == out[r["k"]]["valid"], r


def test_vectorized_items_string_elements(ray_session):
    import pyarrow as pa

    t = pa.table({"k": [1, 2],
                  "tags": [["alpha", "beta"], ["ok", "x"]]})
    schema = {"properties": {"tags": {"items": {"minLength": 2}}}}
    out = {r["k"]: r for r in BatchValidator(schema, "k")(t).to_pylist()}
    assert out[1]["valid"] and not out[2]["valid"]


def test_items_with_nested_object_elements_vectorized():
    """list<struct> element schemas compile into the flat plan (r2): dotted
    struct kernels over the flattened elements, per-element error counts
    matching the value engine's recursion."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"xs": {"items": {
        "required": ["a"],
        "properties": {"a": {"minimum": 1.0},
                       "b": {"minLength": 2}}}}}}
    rows = [
        {"k": 0, "xs": [{"a": 2.0, "b": "ok"}, {"a": 5.0, "b": "yy"}]},
        {"k": 1, "xs": [{"a": 0.0, "b": "x"}]},      # both constraints fail
        {"k": 2, "xs": [{"a": None, "b": "ok"}]},     # required a fails
        {"k": 3, "xs": []},
        {"k": 4, "xs": None},
        {"k": 5, "xs": [{"a": 0.0, "b": "x"}, {"a": 0.0, "b": "x"}]},
    ]
    batch = pa.table({
        "k": pa.array([r["k"] for r in rows], type=pa.int64()),
        "xs": pa.array([r["xs"] for r in rows],
                       type=pa.list_(pa.struct([("a", pa.float64()),
                                                ("b", pa.string())]))),
    })
    got = BatchValidator(schema, "k")(batch).to_pylist()
    engine = ValueEngine(Options())
    for r, g in zip(rows, got):
        doc = {}
        if r["xs"] is not None:
            doc["xs"] = [{k: v for k, v in e.items() if v is not None}
                         for e in r["xs"]]
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"], (r, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"], (
            r, expect.errors, g["violations"])


def test_items_with_combinator_elements_vectorized():
    """Combinator element schemas (anyOf inside items) compile into the
    flat plan (r2) with VE count parity."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"xs": {"items": {
        "anyOf": [{"minimum": 10}, {"maximum": 0}]}}}}
    batch = pa.table({
        "k": pa.array([0, 1], type=pa.int64()),
        "xs": pa.array([[15.0, -1.0], [5.0, 3.0]],
                       type=pa.list_(pa.float64())),
    })
    got = BatchValidator(schema, "k")(batch).to_pylist()
    engine = ValueEngine(Options())
    for r, g in zip(batch.to_pylist(), got):
        expect = engine.validate({"xs": r["xs"]}, schema)
        assert expect.valid == g["valid"]
        assert expect.error_count == g["error_count"], (r, expect.errors)


def test_items_with_unknown_keyword_stays_dynamic():
    """Element schemas with keywords the plan cannot express (loose-mode
    custom keywords) still raise SchemaError → dynamic regime."""
    from jsonschema_validator_ray.errors import Mode, SchemaError
    from jsonschema_validator_ray.plan import compile_table_plan

    with pytest.raises(SchemaError):
        compile_table_plan(
            {"properties": {"xs": {"items": {
                "x-custom-check": 1, "minimum": 0}}}},
            "k", mode=Mode.LOOSE)


def test_table_pattern_and_additional_properties():
    """Top-level patternProperties / additionalProperties resolve COLUMN
    NAMES at compile time (lazy first-batch schema) — verdicts, counts, and
    messages match the value engine row-wise."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {
        "properties": {"k": {"type": "integer"}, "name": {"minLength": 2}},
        "patternProperties": {"^meta_": {"maxLength": 4}},
        "additionalProperties": False,
    }
    batch = pa.table({
        "k": pa.array([0, 1, 2, 3], type=pa.int64()),
        "name": pa.array(["ok", "x", None, "fine"]),
        "meta_a": pa.array(["abc", "toolong", None, "ok"]),
        "rogue": pa.array([None, 7, 8, None], type=pa.int64()),
    })
    got = BatchValidator(schema, "k")(batch).to_pylist()
    engine = ValueEngine(Options())
    rows = batch.to_pylist()
    for r, g in zip(rows, got):
        doc = {k: v for k, v in r.items() if v is not None}
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"], (r, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"], (
            r, expect.errors, g["violations"])
    # the rogue column carries the reference's "unknown field" message
    viols = [v for g in got for v in g["violations"]]
    assert any(v["message"] == "unknown field" and v["column"] == "rogue"
               for v in viols)
    # AllowUnknownFields suppresses the bool form
    got2 = BatchValidator(schema, "k", allow_unknown_fields=True)(batch) \
        .to_pylist()
    assert not any(v["tag"] == "additionalProperties"
                   for g in got2 for v in g["violations"])


def test_table_additional_properties_schema_form():
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {
        "properties": {"k": {"type": "integer"}},
        "additionalProperties": {"type": "string", "minLength": 3},
    }
    batch = pa.table({
        "k": pa.array([0, 1, 2], type=pa.int64()),
        "extra": pa.array(["okay", "no", None]),
    })
    got = BatchValidator(schema, "k")(batch).to_pylist()
    engine = ValueEngine(Options())
    for r, g in zip(batch.to_pylist(), got):
        doc = {k: v for k, v in r.items() if v is not None}
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"], (r, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"]


def test_stop_on_first_error_plan():
    """StopOnFirstError in the column plan: one error per invalid row, the
    FIRST in deterministic plan order, matching the value engine."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {
        "required": ["name"],
        "properties": {"name": {"minLength": 3, "pattern": "^a"},
                       "n": {"minimum": 5, "maximum": 10}},
    }
    batch = pa.table({
        "k": pa.array([0, 1, 2], type=pa.int64()),
        "name": pa.array([None, "zz", "abc"]),     # row0: required+... row1: len+pattern
        "n": pa.array([1.0, 20.0, 7.0]),
    })
    got = BatchValidator(schema, "k", stop_on_first_error=True)(batch) \
        .to_pylist()
    engine = ValueEngine(Options(stop_on_first_error=True))
    for r, g in zip(batch.to_pylist(), got):
        doc = {k: v for k, v in r.items() if v is not None}
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"]
        assert expect.error_count == g["error_count"] <= 1, (r, g)
        if g["violations"]:
            assert len(g["violations"]) == 1
            assert g["violations"][0]["tag"] == expect.errors[0].tag, (r, g)


def test_map_column_properties_vectorized():
    """MAP-typed columns validate through the dotted-path kernels: a
    vectorized per-key lookup plugs map entries into the same null≡absent
    semantics as struct fields (value-engine parity on non-null-valued
    entries)."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"attrs": {
        "required": ["name"],
        "properties": {"name": {"minLength": 3},
                       "tier": {"enum": ["gold", "silver"]}},
        "minProperties": 1,
    }}}
    rows = [
        {"k": 0, "attrs": [("name", "alice"), ("tier", "gold")]},
        {"k": 1, "attrs": [("name", "xy"), ("tier", "wood")]},   # both fail
        {"k": 2, "attrs": [("tier", "gold")]},                    # required name
        {"k": 3, "attrs": []},                                    # minProperties
        {"k": 4, "attrs": None},
        {"k": 5, "attrs": [("name", "bobby"), ("name", "z")]},    # first wins
    ]
    batch = pa.table({
        "k": pa.array([r["k"] for r in rows], type=pa.int64()),
        "attrs": pa.array([r["attrs"] for r in rows],
                          type=pa.map_(pa.string(), pa.string())),
    })
    got = {g["k"]: g for g in BatchValidator(schema, "k")(batch).to_pylist()}
    assert got[0]["valid"]
    assert {v["tag"] for v in got[1]["violations"]} == {"minLength", "enum"}
    assert {v["tag"] for v in got[2]["violations"]} == {"required"}
    assert {v["tag"] for v in got[3]["violations"]} == {"required",
                                                        "minProperties"}
    assert got[4]["valid"]          # null map = absent
    assert got[5]["valid"]          # first entry for duplicate key wins
    # value-engine agreement (map rows → dicts, first-key-wins)
    engine = ValueEngine(Options())
    for r in rows:
        doc = {}
        if r["attrs"] is not None:
            d = {}
            for kk, vv in r["attrs"]:
                d.setdefault(kk, vv)
            doc["attrs"] = d
        expect = engine.validate(doc, schema)
        assert expect.valid == got[r["k"]]["valid"], (r, expect.errors)
        assert expect.error_count == got[r["k"]]["error_count"], (
            r, expect.errors, got[r["k"]]["violations"])


def test_logical_combinators_vectorized():
    """allOf/anyOf/oneOf/not compile into the column plan as branch
    evaluators — verdicts, error counts, and tags match the value engine."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {
        "a": {"anyOf": [{"minimum": 10}, {"maximum": 0}]},
        "b": {"allOf": [{"minimum": 0}, {"multipleOf": 2}]},
        "c": {"oneOf": [{"minimum": 5}, {"multipleOf": 2}]},
        "d": {"not": {"minimum": 100}},
    }}
    batch = pa.table({
        "k": pa.array(range(4), type=pa.int64()),
        "a": pa.array([15.0, 5.0, -1.0, None]),
        "b": pa.array([4.0, 3.0, -2.0, None]),
        "c": pa.array([8.0, 3.0, 20.0, None]),   # 8: both match; 3: none
        "d": pa.array([5.0, 500.0, None, 1.0]),
    })
    got = BatchValidator(schema, "k")(batch).to_pylist()
    engine = ValueEngine(Options())
    for r, g in zip(batch.to_pylist(), got):
        doc = {kk: vv for kk, vv in r.items() if vv is not None}
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"], (r, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"], (
            r, expect.errors, g["violations"])
        assert {e.tag for e in expect.errors} == \
            {v["tag"] for v in g["violations"]}, (r, expect.errors)
    # oneOf per-row message wording matches the VE (none vs more-than-one)
    msgs = {v["message"] for g in got for v in g["violations"]
            if v["tag"] == "oneOf"}
    assert "value matches more than one schema in oneOf" in msgs
    assert "value does not match any schema in oneOf" in msgs


def test_conditional_vectorized():
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    for spelling in ("conditional", "bare"):
        inner = {"if": {"minimum": 10}, "then": {"multipleOf": 5},
                 "else": {"maximum": 3}}
        col_schema = ({"conditional": inner} if spelling == "conditional"
                      else dict(inner))
        schema = {"properties": {"x": col_schema}}
        batch = pa.table({
            "k": pa.array(range(5), type=pa.int64()),
            "x": pa.array([15.0, 12.0, 2.0, 7.0, None]),
            # 15: if→then ok; 12: then fails; 2: else ok; 7: else fails
        })
        got = BatchValidator(schema, "k")(batch).to_pylist()
        engine = ValueEngine(Options())
        for r, g in zip(batch.to_pylist(), got):
            doc = {kk: vv for kk, vv in r.items() if vv is not None}
            expect = engine.validate(doc, schema)
            assert expect.valid == g["valid"], (spelling, r, expect.errors,
                                                g["violations"])
            assert expect.error_count == g["error_count"], (spelling, r)
            assert {e.tag for e in expect.errors} == \
                {v["tag"] for v in g["violations"]}, (spelling, r)


def test_table_dependencies_vectorized():
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {
        "properties": {"cc": {"type": "string"}},
        "dependencies": {"cc": ["cvv"],
                         "amount": {"minimum": 0, "multipleOf": 1}},
    }
    batch = pa.table({
        "k": pa.array(range(4), type=pa.int64()),
        "cc": pa.array(["4111", None, "5500", None]),
        "cvv": pa.array(["123", None, None, "999"]),
        "amount": pa.array([10.0, -5.5, None, 3.0]),
    })
    got = BatchValidator(schema, "k")(batch).to_pylist()
    engine = ValueEngine(Options())
    for r, g in zip(batch.to_pylist(), got):
        doc = {kk: vv for kk, vv in r.items() if vv is not None}
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"], (r, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"], (
            r, expect.errors, g["violations"])


def test_unique_items_nested_element_types():
    """uniqueItems on list<struct> / list<list> columns: Arrow group_by
    cannot hash nested keys, so the kernel falls back to per-row DeepEqual
    keys (value-engine parity)."""
    import pyarrow as pa

    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"xs": {"uniqueItems": True}}}
    batch = pa.table({
        "k": pa.array([0, 1, 2], type=pa.int64()),
        "xs": pa.array([[{"a": 1}, {"a": 1}], [{"a": 1}, {"a": 2}], None],
                       type=pa.list_(pa.struct([("a", pa.int64())]))),
    })
    out = {r["k"]: r["valid"]
           for r in BatchValidator(schema, "k")(batch).to_pylist()}
    assert out == {0: False, 1: True, 2: True}
    batch2 = pa.table({
        "k": pa.array([0, 1], type=pa.int64()),
        "xs": pa.array([[[1, 2], [1, 2]], [[1], [2]]],
                       type=pa.list_(pa.list_(pa.int64()))),
    })
    out2 = {r["k"]: r["valid"]
            for r in BatchValidator(schema, "k")(batch2).to_pylist()}
    assert out2 == {0: False, 1: True}


def test_nested_pattern_and_additional_properties():
    """patternProperties / additionalProperties on NESTED struct paths:
    field names resolve from the struct TYPE at compile; VE parity."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"cfg": {
        "properties": {"id": {"type": "integer"}},
        "patternProperties": {"^opt_": {"minLength": 2}},
        "additionalProperties": False,
    }}}
    t = pa.struct([("id", pa.int64()), ("opt_a", pa.string()),
                   ("opt_b", pa.string()), ("stray", pa.string())])
    rows = [
        {"k": 0, "cfg": {"id": 1, "opt_a": "ab", "opt_b": "cd",
                         "stray": None}},
        {"k": 1, "cfg": {"id": 2, "opt_a": "x", "opt_b": None,
                         "stray": "boo"}},   # opt_a short + stray unknown
        {"k": 2, "cfg": None},
    ]
    batch = pa.table({
        "k": pa.array([r["k"] for r in rows], type=pa.int64()),
        "cfg": pa.array([r["cfg"] for r in rows], type=t),
    })
    got = {g["k"]: g for g in BatchValidator(schema, "k")(batch).to_pylist()}
    engine = ValueEngine(Options())
    for r in rows:
        doc = {}
        if r["cfg"] is not None:
            doc["cfg"] = {kk: vv for kk, vv in r["cfg"].items()
                          if vv is not None}
        expect = engine.validate(doc, schema)
        g = got[r["k"]]
        assert expect.valid == g["valid"], (r, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"], (
            r, expect.errors, g["violations"])
        assert {e.tag for e in expect.errors} == \
            {v["tag"] for v in g["violations"]}, r


def test_nested_dependencies_vectorized():
    """dependencies inside a property schema apply to the struct value:
    presence implications + value-schema deps via dotted kernels."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"pay": {
        "dependencies": {"cc": ["cvv"], "amount": {"minimum": 0}},
    }}}
    t = pa.struct([("cc", pa.string()), ("cvv", pa.string()),
                   ("amount", pa.float64())])
    rows = [
        {"k": 0, "pay": {"cc": "41", "cvv": "123", "amount": 5.0}},
        {"k": 1, "pay": {"cc": "55", "cvv": None, "amount": -1.0}},
        {"k": 2, "pay": {"cc": None, "cvv": None, "amount": None}},
        {"k": 3, "pay": None},
    ]
    batch = pa.table({
        "k": pa.array([r["k"] for r in rows], type=pa.int64()),
        "pay": pa.array([r["pay"] for r in rows], type=t),
    })
    got = {g["k"]: g for g in BatchValidator(schema, "k")(batch).to_pylist()}
    engine = ValueEngine(Options())
    for r in rows:
        doc = {}
        if r["pay"] is not None:
            doc["pay"] = {kk: vv for kk, vv in r["pay"].items()
                          if vv is not None}
        expect = engine.validate(doc, schema)
        g = got[r["k"]]
        assert expect.valid == g["valid"], (r, expect.errors, g["violations"])
        assert expect.error_count == g["error_count"], (
            r, expect.errors, g["violations"])


def test_nested_required_on_non_object_column():
    """required inside a NON-OBJECT column's schema: one error per present
    cell (VE parity), not one per required name."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"x": {"required": ["a", "b"]}}}
    batch = pa.table({
        "k": pa.array([0, 1], type=pa.int64()),
        "x": pa.array([5.0, None]),
    })
    # collapse applies when the column's Arrow type is known at compile
    got = BatchValidator(schema, "k",
                         arrow_schema=batch.schema)(batch).to_pylist()
    engine = ValueEngine(Options())
    for r, g in zip(batch.to_pylist(), got):
        doc = {kk: vv for kk, vv in r.items() if vv is not None}
        expect = engine.validate(doc, schema)
        assert expect.valid == g["valid"], (r, expect.errors)
        assert expect.error_count == g["error_count"], (
            r, expect.errors, g["violations"])


def test_map_presence_contract_null_valued_entries():
    """Map-column presence CONTRACT (VERDICT r2 item 7): a null-VALUED map
    entry is a PRESENT key for presence keywords — required and list-form
    dependencies — exactly like a dict key with value None in the value
    engine. Value keywords still see null ≡ absent (they need a value).
    Both regimes are asserted row by row."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"attrs": {
        "required": ["name"],
        "properties": {"name": {"minLength": 3}},
        "dependencies": {"tier": ["name"]},
    }}}
    rows = [
        # null-valued "name": PRESENT for required (passes), absent for
        # minLength (passes — no value to check)
        {"k": 0, "attrs": [("name", None)]},
        # "name" truly absent: required fails AND the (triggered)
        # tier→name dependency fails
        {"k": 1, "attrs": [("tier", "gold")]},
        # null-valued "tier" TRIGGERS the dependency; null-valued "name"
        # SATISFIES it
        {"k": 2, "attrs": [("tier", None), ("name", None)]},
        # null-valued "tier" triggers; "name" missing → dependency fails
        {"k": 3, "attrs": [("tier", None)]},
        # value keyword still checks the VALUE when present
        {"k": 4, "attrs": [("name", "xy")]},
        {"k": 5, "attrs": None},
    ]
    batch = pa.table({
        "k": pa.array([r["k"] for r in rows], type=pa.int64()),
        "attrs": pa.array([r["attrs"] for r in rows],
                          type=pa.map_(pa.string(), pa.string())),
    })
    got = {g["k"]: g for g in BatchValidator(schema, "k")(batch).to_pylist()}
    assert got[0]["valid"], got[0]["violations"]
    assert {v["tag"] for v in got[1]["violations"]} == {"required",
                                                        "dependencies"}
    assert got[2]["valid"], got[2]["violations"]
    assert {v["tag"] for v in got[3]["violations"]} == {"required",
                                                        "dependencies"}
    assert {v["tag"] for v in got[4]["violations"]} == {"minLength"}
    assert got[5]["valid"]
    # VE agreement on the rows where the contract promises it (presence
    # keywords + real values): 1, 3, 4, 5
    engine = ValueEngine(Options())
    for k in (1, 3, 4, 5):
        r = rows[k]
        doc = {} if r["attrs"] is None else {"attrs": dict(r["attrs"])}
        expect = engine.validate(doc, schema)
        assert expect.valid == got[k]["valid"], (
            r, expect.errors, got[k]["violations"])
    # …and the PINNED half of the contract: for VALUE keywords the column
    # regime keeps null ≡ absent engine-wide (structs cannot express a
    # present null, so maps follow the same rule), while the VE fails a
    # present None with 'must be a string' — rows 0 and 2 diverge on the
    # minLength check only
    for k in (0, 2):
        r = rows[k]
        expect = engine.validate({"attrs": dict(r["attrs"])}, schema)
        assert not expect.valid and got[k]["valid"]
        assert {e.tag for e in expect.errors} == {"minLength"}, expect.errors


def test_struct_presence_contract_null_field_is_absent():
    """The struct half of the presence contract, pinned: Arrow structs
    cannot distinguish {"a": null} from {} — a null field is ABSENT in the
    column regime, so required fails where a VE dict carrying an explicit
    None would pass. This is the documented null≡absent divergence; the
    regimes agree whenever the document simply omits absent keys."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {"obj": {"required": ["a"]}}}
    batch = pa.table({
        "k": pa.array([0, 1], type=pa.int64()),
        "obj": pa.array([{"a": None}, {"a": "x"}],
                        type=pa.struct([("a", pa.string())])),
    })
    got = {g["k"]: g for g in BatchValidator(schema, "k")(batch).to_pylist()}
    assert not got[0]["valid"]   # null field ≡ absent → required fails
    assert got[1]["valid"]
    engine = ValueEngine(Options())
    # regimes agree when the doc OMITS the key (the canonical mapping)
    assert not engine.validate({"obj": {}}, schema).valid
    assert engine.validate({"obj": {"a": "x"}}, schema).valid
    # the pinned divergence: an explicit None key passes in the VE
    assert engine.validate({"obj": {"a": None}}, schema).valid


def test_enum_object_array_members_in_column_plan():
    """Enum members that are ARRAYS/OBJECTS/BOOLS match in the column plan
    via the VE's DeepEqual set membership (previously the CP blanket-failed
    any present cell of a non-scalar column) — regimes agree row by row."""
    import pyarrow as pa

    from jsonschema_validator_ray import Options, ValueEngine
    from jsonschema_validator_ray.stages.validate import BatchValidator

    schema = {"properties": {
        "xs": {"enum": [[1, 2], [3]]},
        "flag": {"enum": [True]},
        "obj": {"enum": [{"a": 1}]},
    }}
    batch = pa.table({
        "k": pa.array([0, 1, 2, 3], type=pa.int64()),
        "xs": pa.array([[1, 2], [3], [2, 1], None],
                       type=pa.list_(pa.float64())),
        "flag": pa.array([True, False, None, True]),
        "obj": pa.array([{"a": 1}, {"a": 2}, None, {"a": 1}],
                        type=pa.struct([("a", pa.int64())])),
    })
    got = {g["k"]: g for g in BatchValidator(schema, "k")(batch).to_pylist()}
    assert got[0]["valid"]
    assert {v["tag"] for v in got[1]["violations"]} == {"enum"}
    # row 2: [2,1] != [1,2] (order matters in DeepEqual) → enum fails
    assert {v["tag"] for v in got[2]["violations"]} == {"enum"}
    assert got[3]["valid"]
    engine = ValueEngine(Options())
    docs = [{"xs": [1.0, 2.0], "flag": True, "obj": {"a": 1}},
            {"xs": [3.0], "flag": False, "obj": {"a": 2}},
            {"xs": [2.0, 1.0]},
            {"flag": True, "obj": {"a": 1}}]
    for k, doc in enumerate(docs):
        expect = engine.validate(doc, schema)
        assert expect.valid == got[k]["valid"], (k, expect.errors,
                                                 got[k]["violations"])
