"""ORC / Feather source tests: roundtrip, stripe-level parallelism,
column pruning, and composition with the validation plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.orc as orc


def _df(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "name": [f"u{i:05d}" for i in range(n)],
        "score": rng.integers(0, 100, n).astype(np.int64),
    })


def test_read_orc_stripes_roundtrip(ray_session, tmp_path):
    from jsonschema_validator_ray.sources.columnar import read_orc

    df = _df()
    # small stripes force multi-stripe files → multiple work items
    orc.write_table(pa.Table.from_pandas(df[:3000]),
                    str(tmp_path / "a.orc"), stripe_size=64 * 1024)
    orc.write_table(pa.Table.from_pandas(df[3000:]),
                    str(tmp_path / "b.orc"), stripe_size=64 * 1024)
    n_stripes = (orc.ORCFile(str(tmp_path / "a.orc")).nstripes
                 + orc.ORCFile(str(tmp_path / "b.orc")).nstripes)
    assert n_stripes >= 2
    got = (read_orc(str(tmp_path)).to_pandas()
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, df)
    # column pruning
    pruned = read_orc(str(tmp_path), columns=["id"]).schema().names
    assert pruned == ["id"]


def test_read_feather_roundtrip_and_validate(ray_session, tmp_path):
    from jsonschema_validator_ray.sources.columnar import read_feather
    from jsonschema_validator_ray.stages.validate import validate_dataset

    df = _df(2000, seed=1)
    feather.write_feather(pa.Table.from_pandas(df[:1000]),
                          str(tmp_path / "a.feather"))
    feather.write_feather(pa.Table.from_pandas(df[1000:]),
                          str(tmp_path / "b.feather"))
    ds = read_feather([str(tmp_path / "a.feather"),
                       str(tmp_path / "b.feather")])
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)
    # the source composes with the validation plan unchanged
    res = validate_dataset(
        read_feather(str(tmp_path)),
        {"required": ["id", "name"],
         "properties": {"score": {"minimum": 0, "maximum": 99},
                        "name": {"minLength": 6, "maxLength": 6}}},
        key_column="id")
    vr = res.to_pandas()
    assert len(vr) == 2000 and bool(vr["valid"].all())


def test_write_orc_shards_roundtrip(ray_session, tmp_path):
    import ray.data

    from jsonschema_validator_ray.sources.columnar import read_orc, write_orc

    df = _df(3000, seed=2)
    out = str(tmp_path / "out")
    paths = write_orc(ray.data.from_pandas(df).repartition(4), out,
                      batch_rows=500)
    assert len(paths) >= 4 and all(p.endswith(".orc") for p in paths)
    got = (read_orc(out).to_pandas().sort_values("id")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, df)


def test_columnar_empty_inputs(ray_session, tmp_path):
    from jsonschema_validator_ray.sources.columnar import (read_feather,
                                                           read_orc)

    (tmp_path / "empty").mkdir()
    assert read_orc(str(tmp_path / "empty")).count() == 0
    assert read_feather(str(tmp_path / "empty")).count() == 0


def test_write_orc_manifest_shields_stray_files(ray_session, tmp_path):
    """A truncated temp shard and stray marker files in the output dir are
    invisible to read_orc (manifest preferred; glob filters extensions and
    _/.-prefixed names)."""
    import ray.data

    from jsonschema_validator_ray.sources.columnar import read_orc, write_orc

    df = _df(1000, seed=3)
    out = str(tmp_path / "out")
    write_orc(ray.data.from_pandas(df), out, batch_rows=500)
    # simulate a crashed retry: truncated temp shard + marker files
    (tmp_path / "out" / "_tmp-shard-dead-000000.orc").write_bytes(b"ORC\x00tr")
    (tmp_path / "out" / "_SUCCESS").write_text("")
    (tmp_path / "out" / "junk.crc").write_text("x")
    got = read_orc(out).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)
    # no-manifest dir (plain glob): extension + prefix filter still applies
    (tmp_path / "out" / "_manifest.json").unlink()
    got2 = read_orc(out).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, df)


def test_read_feather_streams_batches(ray_session, tmp_path):
    """A multi-record-batch IPC file comes out as multiple blocks (no
    whole-file materialization)."""
    import pyarrow.ipc as ipc

    from jsonschema_validator_ray.sources.columnar import read_feather

    df = _df(4000, seed=4)
    t = pa.Table.from_pandas(df)
    path = str(tmp_path / "big.arrow")
    with pa.OSFile(path, "wb") as fh:
        with ipc.new_file(fh, t.schema) as w:
            for i in range(0, 4000, 500):
                w.write_table(t.slice(i, 500))
    ds = read_feather(path)
    assert ds.count() == 4000
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)
    pruned = read_feather(path, columns=["id"]).schema().names
    assert pruned == ["id"]


def test_write_feather_roundtrip(ray_session, tmp_path):
    import ray.data

    from jsonschema_validator_ray.sources.columnar import (read_feather,
                                                           write_feather)

    df = _df(2500, seed=5)
    out = str(tmp_path / "fout")
    paths = write_feather(ray.data.from_pandas(df).repartition(3), out,
                          batch_rows=1000)
    assert len(paths) >= 3
    got = (read_feather(out).to_pandas().sort_values("id")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, df)
