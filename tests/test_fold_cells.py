"""Path-equality pins for stages/folds.fold_cells: every bounded-cell
driver fold that previously raise-gated past 512 blocks (VERDICT r4
"uniformity" list) now hash-exchanges its cell partials instead.
block_gate=0 forces the exchange path; both paths must produce the
identical frame (sorted — fold_cells leaves row order unspecified)."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _pin(fn, sort_cols, **kw):
    fast = fn(SF).sort_values(sort_cols).reset_index(drop=True)
    slow = fn(SF, block_gate=0, **kw)[fast.columns] \
        .sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    return fast


def test_spearman_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.checks import (
        spearman_qty_discount)
    out = _pin(spearman_qty_discount, ["n_rows"])
    assert int(out["n_rows"].iloc[0]) > 0


def test_kendall_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.checks import (
        kendall_qty_discount)
    out = _pin(kendall_qty_discount, ["n_rows"])
    assert int(out["n_rows"].iloc[0]) > 0


def test_kanon_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.dq import kanon_audit_documents
    _pin(kanon_audit_documents, ["lang", "source", "len_bucket"])


def test_audience_migration_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        audience_migration_events)
    out = _pin(audience_migration_events, ["status"])
    assert len(out) > 0


def test_source_share_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        source_share_within_lang)
    out = _pin(source_share_within_lang, ["lang", "source"])
    assert len(out) > 0


def test_sample_quota_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.analytics import (
        sample_quota_by_lang)
    out = _pin(sample_quota_by_lang, ["lang"])
    assert int(out["quota"].sum()) == 100


def test_class_weights_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.features import (
        class_weights_embeddings)
    out = _pin(class_weights_embeddings, ["label"])
    assert len(out) > 0
