"""Pipeline-level conformance: the SAME keyword fixture table from
test_keywords.py flows through ray.data end-to-end — one row per Go test
case, validated by the library's CaseValidator actor stage (FIXTURES.md §2
'evaluated ... at two levels: scalar-level and pipeline-level').

NOTE: the actor class must live in the LIBRARY, not in this test module —
Ray workers import actor classes by module reference, and pytest test
modules aren't importable from worker processes.
"""

from __future__ import annotations

import json

from tests.test_keywords import CASES


def test_keyword_cases_through_ray(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.conformance import CaseValidator

    rows = []
    expect = {}
    for case_id, value, schema, valid, n, tags, _subs in CASES:
        rows.append({
            "case_id": case_id,
            "value_json": json.dumps(value),
            "schema_json": json.dumps(schema),
        })
        expect[case_id] = (valid, n, sorted(tags))

    ds = ray.data.from_items(rows)
    out = ds.map_batches(CaseValidator, batch_format="pyarrow",
                         batch_size=16, concurrency=2)
    got = {r["case_id"]: r for r in out.take_all()}
    assert len(got) == len(expect)
    mismatches = []
    for cid, (valid, n, tags) in expect.items():
        g = got[cid]
        if (g["valid"], g["error_count"], list(g["tags"])) != (valid, n, tags):
            mismatches.append((cid, g))
    assert not mismatches, mismatches


def test_schema_cache_hit(ray_session):
    from jsonschema_validator_ray import Options, ValueEngine

    e = ValueEngine(Options(enable_caching=True))
    s = '{"type": "integer", "minimum": 3}'
    e.validate_json("5", s)
    cached = e._schema_cache[s]
    e.validate_json("7", s)
    assert e._schema_cache[s] is cached
    e2 = ValueEngine(Options(enable_caching=False))
    e2.validate_json("5", s)
    assert s not in e2._schema_cache
