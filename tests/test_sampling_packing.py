"""Sampling, sequence packing, and range-join operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_grouped_first_k(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.sampling import grouped_first_k

    rows = [{"g": f"g{i % 3}", "v": i} for i in range(30)]
    ds = ray.data.from_items(rows)
    out = grouped_first_k(ds, "g", "v", 2, batch_size=7).to_pandas()
    got = {g: sorted(sub["v"]) for g, sub in out.groupby("g")}
    assert got == {"g0": [0, 3], "g1": [1, 4], "g2": [2, 5]}


def test_lcg_fraction_sample_deterministic(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.sampling import lcg_fraction_sample

    ds = ray.data.range(10_000)

    def ren(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("id")})

    ds = ds.map_batches(ren, batch_format="pyarrow")
    a = sorted(r["doc_id"] for r in
               lcg_fraction_sample(ds, "doc_id", 20).take_all())
    b = sorted(r["doc_id"] for r in
               lcg_fraction_sample(ds, "doc_id", 20,
                                   batch_size=333).take_all())
    assert a == b                      # batch-size invariant
    # matches the documented formula exactly
    exp = [i for i in range(10_000)
           if ((48271 * i + 11) % 2147483647) % 100 < 20]
    assert a == exp
    assert 0.15 < len(a) / 10_000 < 0.25


def test_pack_sequences_invariants(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(7)
    rows = [{"doc_id": i, "n_tokens": int(rng.integers(10, 400))}
            for i in range(500)]
    rows.append({"doc_id": 9000, "n_tokens": 5000})   # oversize
    ds = ray.data.from_items(rows)
    out = pack_sequences(ds, "doc_id", "n_tokens", 512,
                         num_buckets=8).to_pandas()
    # every row assigned exactly once
    assert sorted(out["doc_id"]) == sorted(r["doc_id"] for r in rows)
    sums = out.groupby("pack_id")["n_tokens"].sum()
    counts = out.groupby("pack_id")["n_tokens"].count()
    over = out[out["oversize"]]
    assert set(over["doc_id"]) == {9000}
    for pid, s in sums.items():
        if s > 512:
            assert counts[pid] == 1          # only single-doc oversize packs
    # fill quality: ≥ 70% of budget on average for non-oversize packs
    ok_packs = sums[sums <= 512]
    assert ok_packs.mean() >= 0.7 * 512
    # determinism across partitionings
    out2 = pack_sequences(ds.repartition(13), "doc_id", "n_tokens", 512,
                          num_buckets=8).to_pandas()
    m1 = dict(zip(out["doc_id"], out["pack_id"]))
    m2 = dict(zip(out2["doc_id"], out2["pack_id"]))
    assert m1 == m2

    # pack_summary ≡ per-pack aggregate of pack_sequences (same exchange,
    # summary folded inside the map_groups UDF — no second all-to-all)
    from jsonschema_validator_ray.stages.packing import pack_summary

    summ = pack_summary(ds, "doc_id", "n_tokens", 512,
                        num_buckets=8).to_pandas()
    ref = out.groupby("pack_id", sort=False).agg(
        n_docs=("pack_id", "size"), pack_tokens=("n_tokens", "sum"),
        oversize=("oversize", "max")).reset_index()
    a = summ.sort_values("pack_id").reset_index(drop=True)
    b = ref.sort_values("pack_id").reset_index(drop=True).astype(
        {"pack_id": np.int64, "n_docs": np.int64,
         "pack_tokens": np.int64, "oversize": bool})
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_pack_rows_kernel():
    from jsonschema_validator_ray.stages.packing import pack_rows

    sizes = np.array([400, 300, 200, 150, 100, 50], dtype=np.int64)
    packs = pack_rows(sizes, 512)
    assert packs.tolist() == [0, 1, 1, 2, 2, 2]
    assert pack_rows(np.array([600], dtype=np.int64), 512).tolist() == [0]
    assert pack_rows(np.array([], dtype=np.int64), 512).size == 0


def test_range_join_sessions(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.joins import range_join

    left = ray.data.from_items([
        {"k": 1, "ts": 5, "event": "a"},
        {"k": 1, "ts": 15, "event": "b"},
        {"k": 1, "ts": 30, "event": "c"},   # outside any interval
        {"k": 2, "ts": 7, "event": "d"},
        {"k": 3, "ts": 1, "event": "e"},    # key with no intervals
    ])
    right = ray.data.from_items([
        {"k": 1, "lo": 0, "hi": 10, "label": "w1"},
        {"k": 1, "lo": 11, "hi": 20, "label": "w2"},
        {"k": 2, "lo": 5, "hi": 9, "label": "w3"},
    ])
    inner = range_join(left, right, "k", "ts", start="lo",
                       end="hi").to_pandas()
    got = {(r["k"], r["event"]): r["label"] for _, r in inner.iterrows()}
    assert got == {(1, "a"): "w1", (1, "b"): "w2", (2, "d"): "w3"}
    outer = range_join(left, right, "k", "ts", start="lo", end="hi",
                       how="left_outer").to_pandas()
    assert len(outer) == 5
    lbl = dict(zip(outer["event"], outer["label"]))
    assert lbl["c"] is None or pd.isna(lbl["c"])
    assert lbl["e"] is None or pd.isna(lbl["e"])


def test_mix_sources(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.sampling import mix_sources

    rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(3000)]
    ds = ray.data.from_items(rows)
    out = mix_sources(ds, "doc_id", "source", {"s0": 100, "s1": 0},
                      default_pct=50).to_pandas()
    by = out.groupby("source")["doc_id"].count()
    assert by.get("s0", 0) == 1000          # keep all
    assert by.get("s1", 0) == 0             # drop all
    assert 350 < by.get("s2", 0) < 650      # ~50%
    # matches the documented formula exactly for the default bucket
    exp = {i for i in range(3000) if i % 3 == 2
           and ((48271 * i + 11) % 2147483647) % 100 < 50}
    assert set(out[out["source"] == "s2"]["doc_id"]) == exp


def test_pack_rows_property():
    """pack_rows invariants under random descending inputs: contiguous pack
    ids, budget respected except singleton-oversize, next-fit greediness."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jsonschema_validator_ray.stages.packing import pack_rows

    @settings(max_examples=300, deadline=None)
    @given(sizes=st.lists(st.integers(1, 700), max_size=60),
           budget=st.integers(50, 600))
    def check(sizes, budget):
        arr = np.sort(np.array(sizes, dtype=np.int64))[::-1]
        packs = pack_rows(arr, budget)
        assert packs.size == arr.size
        if arr.size == 0:
            return
        # pack ids contiguous ascending from 0
        assert packs[0] == 0
        assert set(np.diff(packs)) <= {0, 1}
        for pid in np.unique(packs):
            members = arr[packs == pid]
            assert members.sum() <= budget or members.size == 1
        # next-fit: a pack closes only because the NEXT item didn't fit
        boundaries = np.flatnonzero(np.diff(packs) == 1)
        for b in boundaries:
            pid = packs[b]
            assert arr[packs == pid].sum() + arr[b + 1] > budget

    check()


def test_assign_splits_partition_properties(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.sampling import (assign_splits,
                                                          lcg_fraction_sample)

    df = pd.DataFrame({"k": np.arange(10000, dtype=np.int64)})
    out = (assign_splits(ray.data.from_pandas(df).repartition(4), "k",
                         [("train", 80), ("val", 10), ("test", 10)])
           .to_pandas())
    # exact partition: every key exactly once, three labels only
    assert len(out) == 10000 and set(out["split"]) == {"train", "val",
                                                       "test"}
    frac = out["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    # consistency with the sampling primitive: the 80% LCG sample IS the
    # train split (same arithmetic)
    kept = set(lcg_fraction_sample(ray.data.from_pandas(df), "k", 80)
               .to_pandas()["k"])
    assert set(out.loc[out["split"] == "train", "k"]) == kept


def test_grouped_mode_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from jsonschema_validator_ray.stages.heavyhitters import grouped_mode

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "g": rng.integers(0, 50, 6000),
        "v": rng.choice(list("abcde"), 6000),
    })
    got = (grouped_mode(ray.data.from_pandas(df).repartition(5), "g", "v",
                        num_buckets=8)
           .to_pandas().sort_values("g").reset_index(drop=True))
    cnt = df.groupby(["g", "v"]).size().reset_index(name="c")
    want = (cnt.sort_values(["g", "c", "v"], ascending=[True, False, True],
                            kind="mergesort")
               .drop_duplicates("g").reset_index(drop=True))
    assert list(got["g"]) == list(want["g"])
    assert list(got["mode_value"]) == list(want["v"])
    assert list(got["mode_count"]) == list(want["c"])
