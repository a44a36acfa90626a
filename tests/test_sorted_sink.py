"""Range-partitioned globally-sorted Parquet sink."""

import numpy as np
import pandas as pd
import pytest
import ray.data


@pytest.fixture()
def df():
    rng = np.random.default_rng(11)
    n = 20_000
    return pd.DataFrame({
        "k": rng.integers(0, 5000, n),
        "s": [f"u{v}" for v in rng.integers(0, 100, n)],
        "payload": rng.random(n),
    })


def test_sorted_write_and_read(ray_session, tmp_path, df):
    from jsonschema_validator_ray.sinks.sorted import (read_sorted,
                                                       write_sorted_parquet)

    out = str(tmp_path / "sorted")
    man = write_sorted_parquet(ray.data.from_pandas(df), out, "k",
                               tiebreak=["s"], num_partitions=8,
                               batch_size=4096)
    assert sum(p["n_rows"] for p in man["partitions"]) == len(df)
    # partition key ranges are disjoint and ordered
    parts = man["partitions"]
    for a, b in zip(parts, parts[1:]):
        assert a["key_max"] <= b["key_min"]

    import pyarrow as pa

    from jsonschema_validator_ray.sinks.sorted import iter_sorted_batches

    ordered = pa.Table.from_batches(iter_sorted_batches(out)).to_pandas()
    # global order: key ascending, ties by the tiebreak column
    assert (ordered["k"].to_numpy()[1:] >= ordered["k"].to_numpy()[:-1]).all()
    grp = ordered.groupby((ordered["k"].diff() != 0).cumsum())["s"]
    assert all((g.to_numpy()[1:] >= g.to_numpy()[:-1]).all() for _, g in grp)
    back = read_sorted(out).to_pandas()
    # content-identical multiset
    a = df.sort_values(["k", "s", "payload"]).reset_index(drop=True)
    b = back.sort_values(["k", "s", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sorted_write_deterministic_and_rerunnable(ray_session, tmp_path, df):
    from jsonschema_validator_ray.sinks.sorted import (read_sorted,
                                                       write_sorted_parquet)

    o1, o2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_sorted_parquet(ray.data.from_pandas(df), o1, "k",
                              tiebreak=["s"], num_partitions=8)
    m2 = write_sorted_parquet(ray.data.from_pandas(df), o2, "k",
                              tiebreak=["s"], num_partitions=8)
    assert m1["partitions"] == m2["partitions"]   # no RNG anywhere
    # re-running into the SAME dir is safe (atomic per-shard replace)
    m3 = write_sorted_parquet(ray.data.from_pandas(df), o1, "k",
                              tiebreak=["s"], num_partitions=8)
    assert m3["partitions"] == m1["partitions"]
    import pyarrow as pa

    from jsonschema_validator_ray.sinks.sorted import iter_sorted_batches

    pd.testing.assert_frame_equal(
        pa.Table.from_batches(iter_sorted_batches(o1)).to_pandas(),
        pa.Table.from_batches(iter_sorted_batches(o2)).to_pandas())


def test_sorted_write_string_key_single_partition(ray_session, tmp_path):
    from jsonschema_validator_ray.sinks.sorted import (read_sorted,
                                                       write_sorted_parquet)

    df = pd.DataFrame({"k": ["b", "a", "c", "a"], "v": [1, 2, 3, 4]})
    out = str(tmp_path / "s")
    man = write_sorted_parquet(ray.data.from_pandas(df), out, "k",
                               num_partitions=1)
    assert len(man["partitions"]) == 1
    import pyarrow as pa

    from jsonschema_validator_ray.sinks.sorted import iter_sorted_batches

    back = pa.Table.from_batches(iter_sorted_batches(out)).to_pandas()
    assert list(back["k"]) == ["a", "a", "b", "c"]
