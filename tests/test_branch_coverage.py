"""Branch coverage for paths the main suites don't reach: the large-dictionary
ObjectRef broadcast, outer bucketed joins, skewed join keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_referential_large_dictionary_objectref_path(ray_session):
    """Dictionaries above the inline threshold travel as a ray.put ObjectRef
    resolved in the actor's __init__."""
    import ray.data

    from jsonschema_validator_ray.stages.referential import referential_violations

    big_dict = [f"code{i:06d}" for i in range(120_000)]  # > 100k → ray.put
    rows = [{"k": i, "v": f"code{i:06d}"} for i in range(50)]
    rows += [{"k": 1000 + i, "v": f"bogus{i}"} for i in range(5)]
    ds = ray.data.from_items(rows)
    bad = referential_violations(ds, "v", "k", big_dict).to_pandas()
    assert len(bad) == 5
    assert bad["v"].str.startswith("bogus").all()


def test_bucketed_join_left_outer(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import bucketed_join

    left = ray.data.from_items(
        [{"id": i, "lv": i * 10} for i in range(8)])
    right = ray.data.from_items(
        [{"rid": i, "rv": f"r{i}"} for i in range(0, 8, 2)])
    out = bucketed_join(left, right, "id", right_on="rid",
                        join_type="left_outer", num_buckets=4).to_pandas()
    assert len(out) == 8
    matched = out[out["id"] % 2 == 0]
    unmatched = out[out["id"] % 2 == 1]
    assert matched["rv"].notna().all()
    assert unmatched["rv"].isna().all()


def test_bucketed_join_skewed_key(ray_session):
    """A key holding 50% of the left side still joins exactly (one bucket
    carries the hot key; the merge inside is pandas C-path)."""
    import ray.data

    from jsonschema_validator_ray.stages.joins import bucketed_join

    n = 2000
    left_rows = [{"id": 7 if i < n // 2 else i, "x": i} for i in range(n)]
    right_rows = [{"id": i, "y": i * 2} for i in range(n)]
    left = ray.data.from_items(left_rows).repartition(8)
    right = ray.data.from_items(right_rows).repartition(8)
    out = bucketed_join(left, right, "id", num_buckets=8).to_pandas()
    assert len(out) == n  # every left row matches exactly one right row
    hot = out[out["id"] == 7]
    assert len(hot) == n // 2 and (hot["y"] == 14).all()


def test_asof_forward_direction(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import asof_join

    base = pd.Timestamp("2024-01-01")
    left = ray.data.from_pandas(pd.DataFrame({
        "k": ["a", "a"],
        "ts": [base, base + pd.Timedelta(seconds=100)],
        "lv": [1, 2]}))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": ["a"], "rts": [base + pd.Timedelta(seconds=50)], "rv": [9]}))
    out = asof_join(left, right, "k", "ts", right_ts="rts",
                    direction="forward").to_pandas().set_index("lv")
    assert out.loc[1, "rv"] == 9          # next-after match
    assert pd.isna(out.loc[2, "rv"])      # nothing after ts=100
