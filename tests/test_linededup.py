"""Line-level (boilerplate) dedup: planted-corpus behavior, broadcast/join
strategy agreement, SQL-oracle parity of the driver queries."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE


def _corpus():
    # 40 docs share a boilerplate header+footer; unique bodies; edge docs
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts, expected = [], []
    for i in range(40):
        body = " ".join(rng.choice(words, 6))
        texts.append(f"COOKIE BANNER\n{body} {i}\nCopyright Footer")
        expected.append(f"{body} {i}")
    texts += [None, "", "unique\n\nsolo", "COOKIE BANNER",
              "   \nCOOKIE BANNER"]
    expected += [None, "", "unique\n\nsolo", "", "   "]
    ids = list(range(len(texts)))
    return (pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts)}),
            dict(zip(ids, expected)))


def test_duplicated_lines_planted(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.linededup import duplicated_lines

    tbl, _ = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(4)
    d = duplicated_lines(ds, "text").to_pandas().sort_values("line")
    got = dict(zip(d["line"], d["n"]))
    assert got == {"COOKIE BANNER": 42, "Copyright Footer": 40}


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_remove_duplicate_lines_strategies(ray_session, strategy):
    import ray.data

    from jsonschema_validator_ray.stages.linededup import \
        remove_duplicate_lines

    tbl, expected = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = remove_duplicate_lines(ds, "doc_id", "text", strategy=strategy,
                                 concurrency=2).to_pandas()
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert len(got) == len(expected)
    for k, v in expected.items():
        assert got[k] == v or (v is None and got[k] is None), (k, got[k], v)


def test_remove_duplicate_lines_no_dups_roundtrip(ray_session):
    """A dup-free corpus comes back byte-identical (split/rejoin is
    lossless) — the empty dup table must not lose its schema."""
    import ray.data

    from jsonschema_validator_ray.stages.linededup import \
        remove_duplicate_lines

    tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array(["a\nb", None, "c d e"])})
    out = remove_duplicate_lines(ray.data.from_arrow(tbl), "doc_id", "text",
                                 strategy="auto").to_pandas()
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert got == {0: "a\nb", 1: None, 2: "c d e"}


def test_clean_lines_query_oracle(ray_session):
    import duckdb

    from jsonschema_validator_ray.pipelines.corpus import (
        CLEAN_LINES_SQL, DUP_LINES_SQL, clean_lines_documents,
        dup_lines_documents)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF_SMOKE}/documents.parquet'")

    summary = dup_lines_documents(SF_SMOKE)
    oracle = con.execute(DUP_LINES_SQL).df()
    assert summary.iloc[0].tolist() == oracle.iloc[0].tolist()

    ours = clean_lines_documents(SF_SMOKE).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    theirs = con.execute(CLEAN_LINES_SQL + " ORDER BY doc_id").df()
    assert ours["doc_id"].tolist() == theirs["doc_id"].tolist()
    a, b = ours["clean_text"], theirs["clean_text"]
    assert ((a == b) | (a.isna() & b.isna())).all()
