"""Round-5 validation audits: candidate-key uniqueness profiling, paired
gate tests (McNemar / Cochran's Q), score-calibration bins, and the
per-user timestamp order-dependency audit. The testdata is clean, so the
semantic tests plant violations in tmp fixtures; exchange paths are
path-equality-pinned at block_gate=0 per the fold convention."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _docs_fixture(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "doc_id": pa.array(cols[0], pa.int64()),
        "text": pa.array(cols[1], pa.string()),
        "lang": pa.array(cols[2], pa.string()),
        "source": pa.array(cols[3], pa.string()),
        "n_chars": pa.array(cols[4], pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


def test_key_uniqueness_flags_dups_and_nulls(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import key_uniqueness_documents

    sf = _docs_fixture(tmp_path, [
        (1, "alpha", "en", "web", 5),
        (2, "alpha", "de", "web", 5),       # text dup, n_chars dup
        (3, "gamma", None, "news", 5),      # lang null
        (4, "delta", "fr", "blog", 7),
    ])
    out = key_uniqueness_documents(sf).set_index("col")
    assert int(out.loc["doc_id", "is_key"]) == 1
    assert int(out.loc["doc_id", "n_distinct"]) == 4
    assert int(out.loc["text", "dup_rows"]) == 1
    assert int(out.loc["text", "is_key"]) == 0
    assert int(out.loc["lang", "n_null"]) == 1
    assert int(out.loc["lang", "is_key"]) == 0      # null disqualifies
    assert int(out.loc["n_chars", "n_distinct"]) == 2
    assert int(out.loc["n_chars", "dup_rows"]) == 2
    assert (out["n_rows"] == 4).all()


def test_key_uniqueness_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.dq import key_uniqueness_documents

    fast = key_uniqueness_documents(SF_SMOKE).reset_index(drop=True)
    slow = key_uniqueness_documents(SF_SMOKE, block_gate=0) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert int(fast.set_index("col").loc["doc_id", "is_key"]) == 1


def test_mcnemar_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import mcnemar_gates_documents

    # length gate: n_chars >= 300; sentence gate: >= 3 '.'
    sf = _docs_fixture(tmp_path, [
        (1, "a. b. c. d", "en", "web", 400),    # both pass
        (2, "no dots here", "en", "web", 400),  # length only  (b)
        (3, "x. y. z. w", "en", "web", 100),    # sentence only (c)
        (4, "short", "en", "web", 100),         # neither
        (5, "plain text", "en", "web", 999),    # length only  (b)
    ])
    out = mcnemar_gates_documents(sf)
    assert int(out["n_rows"].iloc[0]) == 5
    assert int(out["n_only_len"].iloc[0]) == 2
    assert int(out["n_only_sent"].iloc[0]) == 1
    assert out["mcnemar"].iloc[0] == pytest.approx((2 - 1) ** 2 / 3.0)


def test_cochran_q_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import (
        cochran_q_gates_documents)

    many_tok = " ".join(["w"] * 60)              # >= 50 spaces
    sf = _docs_fixture(tmp_path, [
        (1, many_tok + ". . .", "en", "web", 400),   # passes all 3
        (2, many_tok, "en", "web", 100),             # tok only
        (3, "t. t. t.", "en", "web", 400),           # len + sent
    ])
    out = cochran_q_gates_documents(sf)
    # rows: L = (3, 1, 2); G = (len 2, tok 2, sent 2); S=6, SL2=14
    # Q = 2*(3*(4+4+4) - 36) / (18 - 14) = 0
    assert int(out["n_rows"].iloc[0]) == 3
    assert (int(out["g_len"].iloc[0]), int(out["g_tok"].iloc[0]),
            int(out["g_sent"].iloc[0])) == (2, 2, 2)
    assert out["q"].iloc[0] == pytest.approx(0.0)


def test_gate_tests_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.dq import (
        calibration_bins_documents, cochran_q_gates_documents,
        mcnemar_gates_documents)

    for fn, sort_cols in ((mcnemar_gates_documents, ["n_rows"]),
                          (cochran_q_gates_documents, ["n_rows"]),
                          (calibration_bins_documents, ["bin"])):
        fast = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        slow = fn(SF_SMOKE, block_gate=0).sort_values(sort_cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_calibration_bins_monotone_counts(ray_session):
    from jsonschema_validator_ray.pipelines.dq import (
        calibration_bins_documents)

    out = calibration_bins_documents(SF_SMOKE)
    assert int(out["n"].sum()) > 0
    assert (out["n_pass"] <= out["n"]).all()
    assert (out["pass_ppm"] <= 1_000_000).all()


def test_ts_inversions_planted(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import ts_inversions_users

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    base = 1_700_000_000_000_000
    # user 1: ts goes 10, 30, 20 by event_id -> 1 inversion in 2 pairs
    # user 2: monotone -> 0 inversions in 2 pairs
    # user 3: two inversions in a row -> 2 inversions in 2 pairs
    rows = [
        (1, 1, base + 10), (2, 1, base + 30), (3, 1, base + 20),
        (4, 2, base + 1), (5, 2, base + 2), (6, 2, base + 3),
        (7, 3, base + 9), (8, 3, base + 8), (9, 3, base + 7),
    ]
    eid, uid, ts = zip(*rows)
    pq.write_table(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["click"] * 9),
        "value": pa.array([1.0] * 9, pa.float64()),
        "props": pa.array(["{}"] * 9),
    }), str(d / "events.parquet"))
    out = ts_inversions_users(str(d))
    assert int(out["n_pairs"].iloc[0]) == 6
    assert int(out["n_inversions"].iloc[0]) == 3
    assert int(out["n_users_affected"].iloc[0]) == 2


def test_ts_inversions_clean_corpus(ray_session):
    from jsonschema_validator_ray.pipelines.dq import ts_inversions_users

    out = ts_inversions_users(SF_SMOKE)
    assert int(out["n_pairs"].iloc[0]) > 0
    assert int(out["n_inversions"].iloc[0]) >= 0


def test_chapman_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import (
        chapman_estimate_documents)

    # even half contents: {A, B, C}; odd half: {B, C, D} -> overlap 2
    # chapman = (4*4)//3 - 1 = 4 (true universe is 4: A,B,C,D)
    sf = _docs_fixture(tmp_path, [
        (0, "A", "en", "web", 1), (2, "B", "en", "web", 1),
        (4, "C", "en", "web", 1), (6, "A", "en", "web", 1),
        (1, "B", "en", "web", 1), (3, "C", "en", "web", 1),
        (5, "D", "en", "web", 1),
    ])
    out = chapman_estimate_documents(sf)
    assert int(out["n_even_distinct"].iloc[0]) == 3
    assert int(out["n_odd_distinct"].iloc[0]) == 3
    assert int(out["overlap"].iloc[0]) == 2
    assert int(out["chapman"].iloc[0]) == 4


def test_chapman_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.dq import (
        chapman_estimate_documents)

    fast = chapman_estimate_documents(SF_SMOKE).reset_index(drop=True)
    slow = chapman_estimate_documents(SF_SMOKE, block_gate=0) \
        [fast.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
