"""Positive-detection checks for the data-quality audit operators: the
testdata is clean, so these plant violations through the same kernels the
pipelines use and assert they are flagged."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE


def _seq_fold(pairs):
    # the per-bucket fold from dq.sequence_gaps_lineitem
    g = pd.DataFrame(pairs, columns=["o", "ln"])
    agg = g.groupby("o", sort=False)["ln"].agg(
        n="size", nd="nunique", mn="min", mx="max")
    ok = (agg["mn"] == 1) & (agg["mx"] == agg["n"]) & (agg["nd"] == agg["n"])
    return int(len(agg)), int(ok.sum())


def test_sequence_fold_flags_gap_duplicate_and_offset():
    pairs = ([(1, 1), (1, 2), (1, 3)] +       # valid
             [(2, 1), (2, 3)] +               # gap
             [(3, 1), (3, 1), (3, 2)] +       # duplicate
             [(4, 2), (4, 3)])                # wrong start
    n_orders, n_valid = _seq_fold(pairs)
    assert (n_orders, n_valid) == (4, 1)


def test_benford_constants_sum_to_unity_within_floor_loss():
    from jsonschema_validator_ray.pipelines.dq import _BENFORD_PPM

    s = sum(_BENFORD_PPM.values())
    assert 1_000_000 - 9 <= s <= 1_000_000   # nine floors lose < 1 ppm each


@pytest.mark.usefixtures("ray_session")
def test_schema_drift_flags_planted_type_and_distinct_change():
    import ray.data

    from jsonschema_validator_ray.stages.infer import (_prop_from_profile,
                                                       column_profiles)

    # generation A: int column + 2 distinct labels; B: same column becomes
    # float-typed and the label set widens
    a = pa.table({"v": pa.array([1, 2, 3], pa.int64()),
                  "lab": ["x", "y", "x"]})
    b = pa.table({"v": pa.array([1.5, 2.5, 3.5], pa.float64()),
                  "lab": ["x", "y", "z"]})

    def prof(t):
        out = {}
        df = column_profiles(ray.data.from_arrow(t)).to_pandas()
        for _, r in df.iterrows():
            out[r["column"]] = (_prop_from_profile(r, 16).get("type"),
                                int(r["n_distinct_capped"]))
        return out

    pa_, pb = prof(a), prof(b)
    assert pa_["v"][0] != pb["v"][0]          # integer → number
    assert pa_["lab"][1] != pb["lab"][1]      # 2 → 3 distinct


@pytest.mark.usefixtures("ray_session")
def test_fd_confidence_is_exact_on_testdata():
    from jsonschema_validator_ray.pipelines.dq import fd_violations_documents

    out = fd_violations_documents(SF_SMOKE)
    assert (out["support"] + out["violations"] == out["n_rows"]).all()
    assert (out["conf_ppm"] ==
            (out["support"] * 1_000_000) // out["n_rows"]).all()
    assert (out["conf_ppm"] <= 1_000_000).all()


def test_kanon_audit_flags_small_groups(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    # 6 rows in one QI group (safe at k=5), 2 in another (flagged)
    langs = ["en"] * 6 + ["de"] * 2
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "lang": pa.array(langs),
        "source": pa.array(["web"] * 8),
        "n_chars": pa.array([100] * 6 + [999, 700], pa.int64()),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.dq import kanon_audit_documents

    out = kanon_audit_documents(str(d), k=5)
    got = set(zip(out["lang"], out["source"], out["len_bucket"],
                  out["n_rows"]))
    assert got == {("de", "web", 1, 2)}


def test_schema_drift_exchange_path(ray_session):
    """block_gate=0 forces the (gen, column)-bucket exchange; both paths
    must produce the identical 5-row diff."""
    import pandas as pd

    from jsonschema_validator_ray.pipelines.dq import schema_drift_documents

    sf = "/root/testdata/sf0.001"
    fast = schema_drift_documents(sf).sort_values("column") \
        .reset_index(drop=True)
    slow = schema_drift_documents(sf, block_gate=0).sort_values("column") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow[fast.columns],
                                  check_dtype=False)
