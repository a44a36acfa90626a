"""Job-runner CLI drive: run, resume, custom schema."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_corpus(ray_session, tmp_path_factory):
    from jsonschema_validator_ray.sources.webtext import write_webtext_parquet

    d = tmp_path_factory.mktemp("cli_in")
    write_webtext_parquet(str(d), 2000, override_num_blocks=4)
    return d


def _run_cli(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "jsonschema_validator_ray.cli"] + args,
        capture_output=True, text=True, cwd=str(REPO), timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])

def test_cli_run_and_resume(tiny_corpus, tmp_path):
    out_dir = tmp_path / "out"
    first = _run_cli(["--input", f"{tiny_corpus}/*.parquet",
                      "--out", str(out_dir), "--partitions", "3",
                      "--num-cpus", "2"])
    assert first["rows_out"] == 2000 and len(first["ran"]) == 3
    second = _run_cli(["--input", f"{tiny_corpus}/*.parquet",
                       "--out", str(out_dir), "--partitions", "3",
                       "--num-cpus", "2"])
    assert second["ran"] == [] and len(second["skipped"]) == 3


def test_cli_custom_schema(tiny_corpus, tmp_path):
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps({
        "required": ["url"],
        "properties": {"lang": {"enum": ["en", "de"]}},
    }))
    out_dir = tmp_path / "out2"
    res = _run_cli(["--input", f"{tiny_corpus}/*.parquet",
                    "--out", str(out_dir), "--schema", str(schema_file),
                    "--no-extraction-check", "--partitions", "2",
                    "--num-cpus", "2"])
    assert res["rows_out"] == 2000


def test_cli_no_input():
    out = subprocess.run(
        [sys.executable, "-m", "jsonschema_validator_ray.cli",
         "--input", "/nonexistent/*.parquet", "--out", "/tmp/never",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd=str(REPO), timeout=120)
    assert out.returncode == 2
    assert "no input files" in out.stderr


def test_cli_prep_pipeline(ray_session, tmp_path):
    """--pipeline prep runs the training-data chain end-to-end and writes
    packed parquet."""
    import json

    import pyarrow.parquet as pq

    from jsonschema_validator_ray.cli import main
    from tests.conftest import SF_SMOKE

    out = tmp_path / "prep"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--pipeline", "prep",
                   "--input", f"{SF_SMOKE}/documents.parquet",
                   "--out", str(out), "--key", "doc_id"])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["n_input"] == 500
    files = list(out.glob("*.parquet"))
    assert files
    t = pq.read_table(files[0])
    assert {"doc_id", "n_tokens", "pack_id", "oversize"} <= set(
        t.column_names)


def test_cli_checksum_and_verify(ray_session, tmp_path):
    from jsonschema_validator_ray.cli import main
    from jsonschema_validator_ray.sources.webtext import (
        write_webtext_parquet)

    d = tmp_path / "in"
    write_webtext_parquet(str(d), 1000, override_num_blocks=2)
    out = tmp_path / "out"
    rc = main(["--input", f"{d}/*.parquet", "--out", str(out),
               "--partitions", "2", "--checksum"])
    assert rc == 0
    assert main(["--input", f"{d}/*.parquet", "--out", str(out),
                 "--verify-out"]) == 0
    # corrupt a partition: verify must fail with exit 1
    import pyarrow.parquet as pq

    part_dirs = sorted(p for p in out.glob("part-*") if p.is_dir())
    f = sorted(part_dirs[0].glob("*.parquet"))[0]
    t = pq.read_table(str(f))
    pq.write_table(t.slice(0, t.num_rows - 1), str(f))
    assert main(["--input", f"{d}/*.parquet", "--out", str(out),
                 "--verify-out"]) == 1
