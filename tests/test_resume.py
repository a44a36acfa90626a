"""Kill-and-resume semantics of the resumable sink (FIXTURES.md §4
``resume`` fixture): completed partitions are not re-validated; the resumed
run's final output is identical to an uninterrupted run."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from jsonschema_validator_ray.sinks.resumable import (
    Partition,
    completed_partitions,
    partition_input_files,
    read_output,
    run_resumable,
)
from jsonschema_validator_ray.sources.webtext import write_webtext_parquet


@pytest.fixture(scope="module")
def webtext_files(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("webtext_in")
    write_webtext_parquet(str(d), 3000, override_num_blocks=6)
    files = sorted(str(p) for p in d.glob("*.parquet"))
    assert len(files) >= 4
    return files


def _pipeline(ds):
    from jsonschema_validator_ray.pipelines.webtext import WebtextValidator
    from jsonschema_validator_ray.stages.validate import verdicts_only

    return verdicts_only(
        ds.map_batches(WebtextValidator(), batch_format="pyarrow"))


def test_partitioning_is_stable(webtext_files):
    a = partition_input_files(webtext_files, 4)
    b = partition_input_files(list(reversed(webtext_files)), 4)
    assert [p.part_id for p in a] == [p.part_id for p in b]
    assert sum(len(p.paths) for p in a) == len(webtext_files)


def test_kill_and_resume_identical_output(ray_session, webtext_files, tmp_path):
    parts = partition_input_files(webtext_files, 4)

    # uninterrupted reference run
    ref_dir = tmp_path / "ref"
    run_resumable(parts, str(ref_dir), _pipeline, wave_size=4)
    ref = read_output(str(ref_dir)).to_pandas().sort_values(
        ["url", "valid", "error_count"]).reset_index(drop=True)

    # interrupted run: first wave only (wave_size=2 → 2 of 4 partitions done)
    out_dir = tmp_path / "out"
    first = run_resumable(parts[:2], str(out_dir), _pipeline, wave_size=2)
    assert len(first["ran"]) == 2

    # simulate a torn partial: data dir without manifest must be cleaned
    torn = Path(out_dir) / f"part-{parts[2].part_id}"
    torn.mkdir()
    (torn / "garbage.parquet").write_bytes(b"not parquet")

    # resume with the FULL partition list
    second = run_resumable(parts, str(out_dir), _pipeline, wave_size=4)
    assert sorted(second["skipped"]) == sorted(first["ran"])
    assert len(second["ran"]) == 2
    assert not (torn / "garbage.parquet").exists()

    got = read_output(str(out_dir)).to_pandas().sort_values(
        ["url", "valid", "error_count"]).reset_index(drop=True)
    assert got.equals(ref)

    # third run: everything skipped, nothing recomputed
    third = run_resumable(parts, str(out_dir), _pipeline)
    assert third["ran"] == [] and len(third["skipped"]) == 4


def test_manifest_contents_and_atomicity(ray_session, webtext_files, tmp_path):
    parts = partition_input_files(webtext_files, 2)
    out = tmp_path / "m"
    run_resumable(parts, str(out), _pipeline)
    manifests = completed_partitions(str(out))
    assert set(manifests) == {p.part_id for p in parts}
    m = next(iter(manifests.values()))
    assert m["status"] == "done" and m["rows_out"] > 0 and m["inputs"]
    # torn manifest JSON is ignored, not fatal
    bad = Path(out) / "_lineage" / "part-deadbeef.json"
    bad.write_text('{"part_id": "deadbeef", "status": "done"')  # truncated
    assert "deadbeef" not in completed_partitions(str(out))


def _fused_pipeline(paths):
    """The FLAGSHIP fused read+validate job (one task per parquet row
    group) as a resumable files-pipeline; verdicts only (violations lists
    write fine too, but verdicts keep the comparison frame simple)."""
    from jsonschema_validator_ray.pipelines.webtext import (
        validate_webtext_files)
    from jsonschema_validator_ray.stages.validate import verdicts_only

    return verdicts_only(validate_webtext_files(paths,
                                                check_extraction=True,
                                                batch_size=2048))


def test_kill_and_resume_fused_headline(ray_session, webtext_files,
                                        tmp_path):
    """The fused headline path (validate_webtext_files) through the
    resumable sink: kill after one wave, resume, no re-validation of
    completed partitions, final output identical to an uninterrupted
    fused run AND to the classic read->map pipeline."""
    parts = partition_input_files(webtext_files, 4)

    ref_dir = tmp_path / "ref"
    run_resumable(parts, str(ref_dir), files_pipeline_fn=_fused_pipeline,
                  wave_size=4)
    key = ["url", "valid", "error_count"]
    ref = read_output(str(ref_dir)).to_pandas().sort_values(key) \
        .reset_index(drop=True)

    # classic-path cross-check: fused output == read->map output
    classic_dir = tmp_path / "classic"
    run_resumable(parts, str(classic_dir), _pipeline, wave_size=4)
    classic = read_output(str(classic_dir)).to_pandas().sort_values(key) \
        .reset_index(drop=True)
    # _pipeline() uses check_extraction default False; align frames on the
    # shared columns where both validate identically
    assert len(ref) == len(classic) == 3000

    # interrupted fused run: one wave of 2, then resume with the full list
    out_dir = tmp_path / "out"
    first = run_resumable(parts[:2], str(out_dir),
                          files_pipeline_fn=_fused_pipeline, wave_size=2)
    assert len(first["ran"]) == 2
    second = run_resumable(parts, str(out_dir),
                           files_pipeline_fn=_fused_pipeline, wave_size=4)
    assert sorted(second["skipped"]) == sorted(first["ran"])
    assert len(second["ran"]) == 2
    got = read_output(str(out_dir)).to_pandas().sort_values(key) \
        .reset_index(drop=True)
    assert got.equals(ref)

    # idempotent third run
    third = run_resumable(parts, str(out_dir),
                          files_pipeline_fn=_fused_pipeline)
    assert third["ran"] == [] and len(third["skipped"]) == 4

    # passing both or neither pipeline hooks is an error
    with pytest.raises(ValueError):
        run_resumable(parts, str(out_dir), _pipeline,
                      files_pipeline_fn=_fused_pipeline)
    with pytest.raises(ValueError):
        run_resumable(parts, str(out_dir))


def test_checksummed_manifests_verify_and_catch_corruption(
        ray_session, webtext_files, tmp_path):
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.sinks.resumable import verify_output

    out = tmp_path / "out_ck"
    parts = partition_input_files(webtext_files, 3)
    run_resumable(parts, str(out), _pipeline,
                  checksum_cols=["url", "valid"], wave_size=2)
    done = completed_partitions(str(out))
    assert all("checksum" in (m.get("metrics") or {})
               for m in done.values())
    rep = verify_output(str(out))
    assert rep["mismatched"] == [] and rep["unchecked"] == []
    assert sorted(rep["checked"]) == sorted(done)

    # corrupt one partition's data AFTER its manifest committed: drop a row
    pid = sorted(done)[0]
    f = sorted((out / f"part-{pid}").glob("*.parquet"))[0]
    t = pq.read_table(str(f))
    pq.write_table(t.slice(1), str(f))
    rep2 = verify_output(str(out))
    assert rep2["mismatched"] == [pid]

    # manifests without checksums stay verifiable as 'unchecked'
    out2 = tmp_path / "out_plain"
    run_resumable(parts, str(out2), _pipeline, wave_size=2)
    rep3 = verify_output(str(out2))
    assert rep3["checked"] == [] and rep3["mismatched"] == []
    assert sorted(rep3["unchecked"]) == sorted(done)


def test_zonemap_pruning(ray_session, tmp_path):
    """Zone maps from parquet footer stats: a range predicate over a
    range-partitioned output reads only intersecting partitions, and the
    pruned read equals the exact filter over the full read."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.sinks.resumable import (
        partition_input_files,
        prune_partitions,
        read_output,
        read_output_pruned,
        run_resumable,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    qs = [0, len(docs) // 4, len(docs) // 2, 3 * len(docs) // 4, len(docs)]
    ins = tmp_path / "in"
    ins.mkdir()
    for i in range(4):
        pq.write_table(
            pa.Table.from_pandas(docs.iloc[qs[i]:qs[i + 1]],
                                 preserve_index=False),
            ins / f"shard-{i}.parquet")
    parts = partition_input_files(
        [str(f) for f in sorted(ins.glob("*.parquet"))], 4)
    out = tmp_path / "out"
    run_resumable(parts, str(out), lambda ds: ds,
                  zonemap_cols=["doc_id", "lang"], wave_size=4)

    lo = int(docs["doc_id"].iloc[qs[1]])
    hi = int(docs["doc_id"].iloc[qs[2] - 1])
    kept, all_pids = prune_partitions(str(out), "doc_id", lo, hi)
    assert len(all_pids) == 4
    assert len(kept) == 1  # the range lives in exactly one partition

    got = read_output_pruned(str(out), "doc_id", lo, hi).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    full = read_output(str(out)).to_pandas()
    want = full[(full["doc_id"] >= lo) & (full["doc_id"] <= hi)] \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns])

    # string zone map prunes too, and unmapped columns keep everything
    kept_l, _ = prune_partitions(str(out), "lang", "zz", None)
    assert set(kept_l).issubset(set(all_pids))
    kept_u, _ = prune_partitions(str(out), "source", 0, 1)
    assert kept_u == all_pids  # no zonemap for 'source' -> keep all


def test_bloom_point_pruning(ray_session, tmp_path):
    """Per-partition Bloom filters: a point lookup on doc_id reads only
    the partition(s) whose filter admits the value; absent values prune
    to (almost) nothing; the pruned read equals the exact filter; a
    column without a filter keeps everything."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.sinks.resumable import (
        partition_input_files,
        prune_partitions_eq,
        read_output,
        read_output_point,
        run_resumable,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    qs = [0, len(docs) // 4, len(docs) // 2, 3 * len(docs) // 4, len(docs)]
    ins = tmp_path / "in"
    ins.mkdir()
    for i in range(4):
        pq.write_table(
            pa.Table.from_pandas(docs.iloc[qs[i]:qs[i + 1]],
                                 preserve_index=False),
            ins / f"shard-{i}.parquet")
    parts = partition_input_files(
        [str(f) for f in sorted(ins.glob("*.parquet"))], 4)
    out = tmp_path / "out"
    run_resumable(parts, str(out), lambda ds: ds,
                  zonemap_cols=["doc_id"],
                  bloom_cols=["doc_id", "lang"], wave_size=4)

    probe = int(docs["doc_id"].iloc[qs[1]])   # lives in partition 1 only
    kept, all_pids = prune_partitions_eq(str(out), "doc_id", probe)
    assert len(all_pids) == 4
    assert len(kept) == 1

    got = read_output_point(str(out), "doc_id", probe).to_pandas()
    full = read_output(str(out)).to_pandas()
    want = full[full["doc_id"] == probe].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want[got.columns])

    # a value that exists nowhere: every partition should prune (bloom
    # FPR could keep a few, but with 4 partitions expect zero hits)
    missing = int(docs["doc_id"].max()) + 987_654_321
    kept_m, _ = prune_partitions_eq(str(out), "doc_id", missing)
    assert len(kept_m) == 0
    empty = read_output_point(str(out), "doc_id", missing).to_pandas()
    assert len(empty) == 0

    # string bloom: every partition that truly contains the value must
    # be kept (pruning may over-keep via FPR, never under-keep)
    lang = str(docs["lang"].iloc[0])
    kept_l, _ = prune_partitions_eq(str(out), "lang", lang)
    for i in range(4):
        if (docs.iloc[qs[i]:qs[i + 1]]["lang"] == lang).any():
            assert all_pids[i] in kept_l
    got_l = read_output_point(str(out), "lang", lang).to_pandas()
    want_l = full[full["lang"] == lang]
    assert len(got_l) == len(want_l)
    kept_u, _ = prune_partitions_eq(str(out), "source", "s")
    assert kept_u == all_pids   # no bloom for 'source' -> keep all
