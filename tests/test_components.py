"""Connected components + cluster dedup + unified violations table."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest


def test_connected_components_basic(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.components import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star on 20)
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)]
    ds = ray.data.from_items([{"key_a": a, "key_b": b} for a, b in pairs])
    out = connected_components(ds).to_pandas()
    comp = dict(zip(out["key"], out["component"]))
    assert {comp[k] for k in (1, 2, 3, 4)} == {1}
    assert {comp[k] for k in (10, 11)} == {10}
    assert {comp[k] for k in (20, 21, 22)} == {20}
    # only candidate nodes appear
    assert set(out["key"]) == {1, 2, 3, 4, 10, 11, 20, 21, 22}


def test_connected_components_long_chain_converges(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.components import connected_components

    # a 12-node chain needs several propagation rounds
    pairs = [(i, i + 1) for i in range(12)]
    ds = ray.data.from_items([{"key_a": a, "key_b": b} for a, b in pairs])
    out = connected_components(ds).to_pandas()
    assert (out["component"] == 0).all()


def test_connected_components_join_strategy_matches_driver(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.components import connected_components

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22), (4, 40),
             (40, 41), (7, 8)]
    ds = ray.data.from_items([{"key_a": a, "key_b": b} for a, b in pairs])
    drv = connected_components(ds, strategy="driver").to_pandas()
    jn = connected_components(ds, strategy="join", num_buckets=4).to_pandas()
    dmap = dict(zip(drv["key"], drv["component"]))
    jmap = dict(zip(jn["key"], jn["component"]))
    assert dmap == jmap
    assert {jmap[k] for k in (1, 2, 3, 4, 40, 41)} == {1}


def test_connected_components_join_chain_100k(ray_session):
    """10^5-node chain converges through the distributed join path (pointer
    doubling ⇒ O(log n) rounds) with no driver-side label map."""
    import ray.data

    from jsonschema_validator_ray.stages.components import connected_components

    n = 100_000
    pairs = pa.table({"key_a": pa.array(range(n - 1), type=pa.int64()),
                      "key_b": pa.array(range(1, n), type=pa.int64())})
    ds = ray.data.from_arrow(pairs)
    # two doubling steps per round (r2 item 9): the 10^5 chain must converge
    # within 9 rounds (the single-doubling version needed ~17)
    out = connected_components(ds, strategy="join", num_buckets=4,
                               max_rounds=9).to_pandas()
    assert len(out) == n
    assert (out["component"] == 0).all()


def test_dedup_by_components_end_to_end(ray_session):
    """MinHash pairs → components → keep one canonical doc per cluster."""
    import ray.data

    from jsonschema_validator_ray.stages.components import (
        connected_components, dedup_by_components)
    from jsonschema_validator_ray.stages.dedup import minhash_near_duplicates

    docs = [{"doc_id": i, "text": f"unique document number {i} " * 10}
            for i in range(20)]
    # a 3-clique of near-identical docs
    base = "the same repeated text about rays and arrows " * 8
    docs += [{"doc_id": 100, "text": base},
             {"doc_id": 101, "text": base + "tail"},
             {"doc_id": 102, "text": base + "other tail"}]
    ds = ray.data.from_items(docs)
    pairs = minhash_near_duplicates(ds, "doc_id", "text", threshold=0.5,
                                    batch_size=8)
    comps = connected_components(pairs)
    deduped = dedup_by_components(ds, "doc_id", comps)
    ids = {r["doc_id"] for r in deduped.select_columns(["doc_id"]).take_all()}
    assert 100 in ids and 101 not in ids and 102 not in ids
    assert all(i in ids for i in range(20))
    # join strategy: identical survivor set, no driver-side drop set
    dj = dedup_by_components(ds, "doc_id", comps, strategy="join",
                             num_buckets=4)
    ids_j = {r["doc_id"] for r in dj.select_columns(["doc_id"]).take_all()}
    assert ids_j == ids


def test_unified_violations(ray_session):
    from jsonschema_validator_ray.pipelines.webtext import (
        run_webtext_pipeline, unified_violations)
    from jsonschema_validator_ray.sources.webtext import webtext_dataset

    rpt = run_webtext_pipeline(webtext_dataset(3000, override_num_blocks=4),
                               batch_size=1024)
    allv = unified_violations(rpt).to_pandas()
    assert set(allv.columns) == {"url", "constraint_id", "tag", "message"}
    tags = set(allv["tag"])
    assert {"pattern", "uniqueness", "referential"} <= tags
    assert (allv[allv["tag"] == "uniqueness"]["constraint_id"]
            == "uniqueness:url").all()
