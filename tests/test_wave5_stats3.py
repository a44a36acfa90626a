"""Final-round statistics wave 3: Hartley's F-max, Bowley quartile
skewness, index of coincidence, partial correlation. Float-reference
hand fixtures + block_gate=0 path equality on the smoke corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _docs(tmp_path, langs, n_chars, texts=None):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    n = len(langs)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts or ["x"] * n, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["web"] * n, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


def test_fmax_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import fmax_chars_langs

    ga = [10, 11, 12, 300]          # big variance
    gb = [50, 51, 52, 53, 54]       # tiny variance
    gc = [5, 100, 200]
    langs = ["en"] * len(ga) + ["de"] * len(gb) + ["fr"] * len(gc)
    sf = _docs(tmp_path, langs, ga + gb + gc)
    out = fmax_chars_langs(sf)
    assert out["lang_max"].iloc[0] == "en"
    assert out["lang_min"].iloc[0] == "de"
    assert (int(out["n_max"].iloc[0]), int(out["n_min"].iloc[0])) == (4, 5)
    ref = np.var(np.array(ga, float), ddof=1) \
        / np.var(np.array(gb, float), ddof=1)
    assert out["fmax"].iloc[0] == pytest.approx(ref, rel=1e-12)


def test_bowley_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.anomaly import (
        bowley_skew_chars_langs)

    # n = 7: h1 = 2, h2 = 4, h3 = 6 (all integral -> doubled = 2*value)
    vals = [1, 2, 3, 4, 5, 9, 20]
    sf = _docs(tmp_path, ["en"] * 7, vals)
    out = bowley_skew_chars_langs(sf)
    assert int(out["q1_2"].iloc[0]) == 4      # 2*2
    assert int(out["q2_2"].iloc[0]) == 8      # 2*4
    assert int(out["q3_2"].iloc[0]) == 18     # 2*9
    ref = (9 + 2 - 2 * 4) / (9 - 2)
    assert out["bowley"].iloc[0] == pytest.approx(ref, rel=1e-12)


def test_index_coincidence_hand_fixture(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import (
        index_coincidence_lang)

    # en: "aab" + "ba" -> a:3, b:2, N=5 -> IC = (6+2)/20 = 0.4
    # de: "zzzz" -> IC = 12/12 = 1.0
    sf = _docs(tmp_path, ["en", "en", "de"], [3, 2, 4],
               texts=["aab", "ba", "zzzz"])
    out = index_coincidence_lang(sf).reset_index(drop=True)
    assert list(out["lang"]) == ["de", "en"]
    assert list(out["n_chars_total"]) == [4, 5]
    assert list(out["distinct_chars"]) == [1, 2]
    assert out["ic"].iloc[0] == pytest.approx(1.0)
    assert out["ic"].iloc[1] == pytest.approx(0.4)


def test_partial_corr_matches_float_reference(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import (
        partial_corr_lineitem)

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    rng = np.random.RandomState(3)
    n = 200
    q = rng.randint(1, 50, n).astype(float)
    disc = rng.randint(0, 10, n).astype(float) / 100.0
    price = (q * 101 + rng.randint(0, 500, n)).astype(float) / 100.0
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array(q, pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    out = partial_corr_lineitem(str(d))

    x = np.round(q)
    y = np.round(price * 100)
    z = np.round(disc * 100)

    def r(a, b):
        return float(np.corrcoef(a, b)[0, 1])

    def pr(rxy, rxz, ryz):
        return (rxy - rxz * ryz) / (
            np.sqrt(1 - rxz ** 2) * np.sqrt(1 - ryz ** 2))

    r12, r13, r23 = r(x, y), r(x, z), r(y, z)
    assert out["r"].tolist() == pytest.approx([r12, r13, r23], rel=1e-9)
    assert out["r_partial"].tolist() == pytest.approx(
        [pr(r12, r13, r23), pr(r13, r12, r23), pr(r23, r12, r13)],
        rel=1e-9)


def test_wave5_stats3_exchange_paths(ray_session):
    from jsonschema_validator_ray.pipelines.anomaly import (
        bowley_skew_chars_langs, fmax_chars_langs)
    from jsonschema_validator_ray.pipelines.corpus import (
        index_coincidence_lang)

    for fn, sort_cols in ((fmax_chars_langs, ["lang_max"]),
                          (bowley_skew_chars_langs, ["lang"]),
                          (index_coincidence_lang, ["lang"])):
        gated = fn(SF_SMOKE).sort_values(sort_cols).reset_index(drop=True)
        forced = fn(SF_SMOKE, block_gate=0).sort_values(sort_cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(gated, forced)
