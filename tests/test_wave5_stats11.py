"""Final-round wave 11: bit-shift decay scores, runs-up-and-down test,
per-language gate odds ratios."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def test_decayed_scores_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        decayed_type_scores)

    day_us = 86_400_000_000
    # end day = 10; type a: 2 events @ day 10, 1 @ day 8;
    # type b: 3 events @ day 0 (age 10)
    rows = [(0, 10, "a"), (1, 10, "a"), (2, 8, "a"),
            (3, 0, "b"), (4, 0, "b"), (5, 0, "b")]
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * day_us for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * 6, pa.float64()),
        "props": pa.array(["{}"] * 6),
    }), str(d / "events.parquet"))
    out = decayed_type_scores(str(d)).reset_index(drop=True)
    s = 1 << 40
    exp_a = 2 * s + (s >> 2)
    exp_b = 3 * (s >> 10)
    assert list(out["event_type"]) == ["a", "b"]
    assert list(out["n_events"]) == [3, 3]
    assert list(out["score"]) == [exp_a, exp_b]


def test_runs_up_down_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        runs_up_down_daily_revenue)

    day_us = 86_400_000_000
    # cents: 100 200 200 150 300 -> diffs +,0,-,+ -> signs +,-,+ -> 3 runs
    days = [0, 1, 2, 3, 4]
    totals = [1.0, 2.0, 2.0, 1.5, 3.0]
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_orderstatus": pa.array(["F"] * 5),
        "o_totalprice": pa.array(totals, pa.float64()),
        "o_orderdate": pa.array([dd * day_us for dd in days],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 5),
    }), str(d / "orders.parquet"))
    out = runs_up_down_daily_revenue(str(d))
    assert int(out["n_eff"].iloc[0]) == 4
    assert int(out["n_runs"].iloc[0]) == 3
    n = 4
    ref = (3 - (2 * n - 1) / 3) / np.sqrt((16 * n - 29) / 90)
    assert out["z"].iloc[0] == pytest.approx(ref, rel=1e-12)


def test_odds_ratio_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import (
        odds_ratio_gates_by_lang)

    # en: a=2 b=1 c=1 d=2 -> OR = 4.0; de: b=0 -> OR 0.0 (degenerate)
    texts = ["...", "....", ".", ".....", "..", ".", "...", "..."]
    chars = [400, 350, 320, 200, 100, 150, 400, 100]
    langs = ["en"] * 6 + ["de"] * 2
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(["web"] * 8),
        "n_chars": pa.array(chars, pa.int64()),
    }), str(d / "documents.parquet"))
    out = odds_ratio_gates_by_lang(str(d)).reset_index(drop=True)
    en = out[out["lang"] == "en"].iloc[0]
    assert (int(en["n_both"]), int(en["n_only_len"]),
            int(en["n_only_sent"]), int(en["n_neither"])) == (2, 1, 1, 2)
    assert en["odds_ratio"] == pytest.approx(4.0)
    de = out[out["lang"] == "de"].iloc[0]
    assert de["odds_ratio"] == 0.0


def test_wave5_stats11_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        decayed_type_scores, runs_up_down_daily_revenue)
    from jsonschema_validator_ray.pipelines.dq import (
        odds_ratio_gates_by_lang)

    for fn, sort_cols in ((decayed_type_scores, ["event_type"]),
                          (runs_up_down_daily_revenue, ["n_eff"]),
                          (odds_ratio_gates_by_lang, ["lang"])):
        gated = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        forced = fn(SF_SMOKE, block_gate=0).sort_values(sort_cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(gated, forced)


def test_unalikeability_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.dq import (
        unalikeability_lang_by_source)

    # web: en,en,de,fr -> u = 1 - (4+1+1)/16 = 10/16; cc: de only -> 0
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["x"] * 6),
        "lang": pa.array(["en", "en", "de", "fr", "de", "de"]),
        "source": pa.array(["web"] * 4 + ["cc"] * 2),
        "n_chars": pa.array([10] * 6, pa.int64()),
    }), str(d / "documents.parquet"))
    out = unalikeability_lang_by_source(str(d)).reset_index(drop=True)
    assert list(out["source"]) == ["cc", "web"]
    assert list(out["n"]) == [2, 4]
    assert list(out["n_langs"]) == [1, 3]
    assert out["u"].iloc[0] == pytest.approx(0.0)
    assert out["u"].iloc[1] == pytest.approx(10 / 16)


def test_unalikeability_exchange_path(ray_session):
    from jsonschema_validator_ray.pipelines.dq import (
        unalikeability_lang_by_source)

    gated = unalikeability_lang_by_source(SF_SMOKE)
    forced = unalikeability_lang_by_source(SF_SMOKE, block_gate=0)
    pd.testing.assert_frame_equal(gated.reset_index(drop=True),
                                  forced.reset_index(drop=True))
