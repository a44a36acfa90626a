"""Order-independent table checksums (stages/checksum.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from jsonschema_validator_ray.stages.checksum import _MOD, table_checksum


def _ds(df, blocks=3):
    return ray.data.from_pandas(df.copy()).repartition(blocks)


def _base():
    return pd.DataFrame({
        "id": np.arange(20, dtype=np.int64),
        "lang": ["en", "de", "fr", "en"] * 5,
        "val": [f"v{i}" for i in range(20)],
    })


def test_checksum_order_and_partition_independent(ray_session):
    df = _base()
    a = table_checksum(_ds(df, 1), ["id", "lang", "val"]).to_pandas()
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    b = table_checksum(_ds(shuffled, 5), ["id", "lang", "val"]).to_pandas()
    assert a["n_rows"][0] == 20
    assert a["checksum"][0] == b["checksum"][0]
    assert 0 <= a["checksum"][0] < _MOD


def test_checksum_detects_any_change(ray_session):
    df = _base()
    ref = int(table_checksum(_ds(df), ["id", "lang", "val"])
              .to_pandas()["checksum"][0])
    for mutate in [
        lambda d: d.assign(val=d["val"].where(d.index != 3, "CHANGED")),
        lambda d: d.iloc[:-1],                       # dropped row
        lambda d: pd.concat([d, d.iloc[[0]]]),       # duplicated row
    ]:
        got = int(table_checksum(_ds(mutate(df).reset_index(drop=True)),
                                 ["id", "lang", "val"])
                  .to_pandas()["checksum"][0])
        assert got != ref


def test_checksum_null_skip_matches_concat_ws(ray_session):
    """NULLs skip like SQL concat_ws: (None,'x') and ('x',None) collide by
    design; a null is NOT the empty string."""
    import duckdb

    df = pd.DataFrame({"a": [None, "x", ""], "b": ["x", None, "x"]})
    got = table_checksum(_ds(df, 1), ["a", "b"]).to_pandas()
    o = duckdb.sql("""
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(concat('0x', substr(md5(
               concat_ws(chr(31), a, b)), 1, 15)) AS UBIGINT))
                  % 2305843009213693952 AS BIGINT) AS checksum
      FROM df""").df()
    assert got["checksum"][0] == o["checksum"][0]
    assert got["n_rows"][0] == 3


def test_grouped_checksum_folds_to_total(ray_session):
    df = _base()
    per = table_checksum(_ds(df), ["id", "lang", "val"],
                         group_cols=["lang"]).to_pandas()
    tot = table_checksum(_ds(df), ["id", "lang", "val"]).to_pandas()
    assert per["n_rows"].sum() == tot["n_rows"][0]
    assert int(per["checksum"].astype(object).sum()) % _MOD \
        == tot["checksum"][0]
    assert list(per["lang"]) == sorted(per["lang"])


def test_checksum_empty(ray_session):
    df = _base().iloc[:0]
    tot = table_checksum(_ds(df, 1), ["id", "lang", "val"]).to_pandas()
    assert tot["n_rows"][0] == 0 and tot["checksum"][0] == 0
