"""Round-4 analytics additions: weekly cohort retention (exact distinct
users per cell through the two-phase pair exchange) and exact duplicate-
cluster size distribution."""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def test_cohort_retention_matches_duckdb(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        COHORT_RETENTION_SQL, cohort_retention)

    got = cohort_retention(SF_SMOKE).to_pandas() \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{SF_SMOKE}/events.parquet'")
    want = con.execute(COHORT_RETENTION_SQL).df() \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # offset 0 exists for every cohort (a user is active in their own
    # first week by definition)
    assert (got.groupby("cohort_week")["week_offset"].min() == 0).all()


def test_dup_cluster_sizes_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.corpus import (
        dup_cluster_sizes_documents)

    texts = (["unique-%d" % i for i in range(10)]
             + ["pair"] * 2 + ["triple"] * 3 + [None, None])
    pq.write_table(pa.table({"text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))
    got = dup_cluster_sizes_documents(str(tmp_path)).to_pandas() \
        .sort_values("cluster_size").reset_index(drop=True)
    assert got.to_dict("list") == {
        "cluster_size": [1, 2, 3], "n_clusters": [10, 1, 1]}
