"""Webtext synthesis determinism + extraction parity + flagship pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from jsonschema_validator_ray.sources.webtext import (
    extract_text,
    webtext_batch,
)


def test_generation_is_pure_function_of_index():
    """Identical rows regardless of batching / order — the property that
    makes distributed generation and resume safe."""
    a = webtext_batch(np.arange(0, 2000))
    b1 = webtext_batch(np.arange(0, 700))
    b2 = webtext_batch(np.arange(700, 2000))
    import pyarrow as pa

    joined = pa.concat_tables([b1, b2])
    assert a.equals(joined)
    # single-row regeneration matches
    row_1234 = webtext_batch(np.array([1234]))
    assert a.slice(1234, 1).equals(row_1234)


def test_planted_features_present():
    t = webtext_batch(np.arange(0, 5000)).to_pandas()
    # malformed urls at i % 211 == 7
    assert not t.loc[7, "url"].startswith("http")
    # duplicate url pairs at i % 97 == 13 (when row i-1 is well-formed)
    dup_rows = [i for i in range(1, 5000) if i % 97 == 13 and (i - 1) % 211 != 7]
    assert dup_rows
    for i in dup_rows[:5]:
        assert t.loc[i, "url"] == t.loc[i - 1, "url"]
    # null warc_ts at i % 199 == 11
    assert t["warc_ts"].isna().sum() >= 5000 // 199
    # invalid langs ~2%
    bad_lang = t["lang"].isin(["xx", "EN ", ""]) | t["lang"].isna()
    assert 0.01 < bad_lang.mean() < 0.03
    # zipf skew: the top host dominates
    hosts = t["url"].str.extract(r"https://(host\d+)")[0]
    top = hosts.value_counts(normalize=True)
    assert top.iloc[0] > 0.15
    # multibyte rows: byte length > char length somewhere
    assert (t["text"].str.len() < t["text"].str.encode("utf-8").str.len()).any()


def test_extraction_byte_identical():
    """North-star invariant: extracted text per url is byte-identical to the
    text column — including rows whose html carries invalid-UTF-8 junk."""
    t = webtext_batch(np.arange(0, 1500))
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    for h, x in zip(htmls, texts):
        assert extract_text(h) == x
    # junk rows exist and still extract
    assert any(b"\xff\xfe" in h for h in htmls)
    # garbage html → None, not an exception
    assert extract_text(b"\x00\x01 not html") is None
    assert extract_text(b"<article>\xff\xfe</article>") is None


def test_flagship_pipeline_end_to_end(ray_session):
    import ray

    from jsonschema_validator_ray.pipelines.webtext import run_webtext_pipeline
    from jsonschema_validator_ray.sources.webtext import webtext_dataset
    from jsonschema_validator_ray.state import CategoricalHistogram

    n = 4000
    ds = webtext_dataset(n, override_num_blocks=8)
    baseline = CategoricalHistogram(
        ["en", "de", "fr", "es", "zh", "ja", "ru", "pt", "it", "nl"])
    baseline.add_counts({"en": 100, "de": 100, "fr": 100, "es": 100, "zh": 100,
                         "ja": 100, "ru": 100, "pt": 100, "it": 100, "nl": 100})
    rpt = run_webtext_pipeline(ds, baseline_lang_hist=baseline.to_json(),
                               batch_size=1024, concurrency=2)

    verdicts = rpt.verdicts.to_pandas()
    assert len(verdicts) == n
    assert 0 < verdicts["valid"].sum() < n

    viols = rpt.violations.to_pandas()
    tags = set(viols["tag"])
    # pattern (malformed urls), minLength/pattern on bad langs fire;
    # extraction never fires on the synthetic corpus (byte-identical)
    assert "pattern" in tags and "extract" not in tags
    # a malformed-url row is invalid
    bad = verdicts.merge(
        webtext_dataset(n).to_pandas()[["url"]], left_on="url", right_on="url")
    assert (~verdicts[verdicts["url"] == "not a url"]["valid"]).all()

    # uniqueness: planted duplicates found
    dups = rpt.dup_urls.to_pandas()
    expected_dup_urls = {  # regenerate and count exactly
        u for u, c in
        webtext_dataset(n).to_pandas()["url"].value_counts().items() if c > 1}
    assert set(dups["url"]) == expected_dup_urls

    # referential: invalid langs flagged, nulls skipped
    lv = rpt.lang_violations.to_pandas()
    assert set(lv["lang"]) <= {"xx", "EN ", ""}
    assert len(lv) > 0

    # stats merged across partitions
    stats = rpt.stats.to_pandas().set_index("column")
    assert stats.loc["url", "cnt"] == n
    assert stats.loc["lang", "nulls"] > 0

    # drift vs uniform baseline: en-heavy corpus → drifted
    assert rpt.drift is not None and rpt.drift.psi > 0


def test_extraction_check_flags_mismatch(ray_session):
    import pyarrow as pa
    import ray

    from jsonschema_validator_ray.pipelines.webtext import WebtextValidator

    t = webtext_batch(np.arange(0, 50))
    # corrupt one text cell → extraction mismatch must fire
    texts = t.column("text").to_pylist()
    texts[3] = texts[3] + " TAMPERED"
    t = t.set_column(t.schema.get_field_index("text"),
                     "text", pa.array(texts, type=pa.large_string()))
    out = WebtextValidator()(t).to_pylist()
    v3 = out[3]
    assert not v3["valid"]
    assert any(x["constraint_id"] == "extract:text" for x in v3["violations"])
    assert all(not any(x["constraint_id"] == "extract:text" for x in r["violations"])
               for r in out if r["url"] != v3["url"])


def test_fused_read_validate_matches_classic(ray_session, tmp_path):
    """validate_webtext_files (fused read+validate tasks) must produce the
    IDENTICAL verdict/violation aggregate as the classic read_parquet →
    map_batches pipeline."""
    import pyarrow.parquet as pq
    import ray.data

    from jsonschema_validator_ray.pipelines.webtext import (
        WebtextValidator, validate_webtext_files)
    import numpy as np

    from jsonschema_validator_ray.sources.webtext import webtext_batch

    t = webtext_batch(np.arange(4000))
    f1, f2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, 2000), f1, row_group_size=700)
    pq.write_table(t.slice(2000), f2, row_group_size=700)

    keys = ["url", "valid", "error_count"]
    fused = (validate_webtext_files([f1, f2], batch_size=512)
             .to_pandas()[keys].sort_values(keys).reset_index(drop=True))
    classic = (ray.data.read_parquet([f1, f2])
               .map_batches(WebtextValidator(True), batch_format="pyarrow",
                            batch_size=512)
               .to_pandas()[keys].sort_values(keys).reset_index(drop=True))
    assert len(fused) == len(classic) == 4000
    for col in keys:   # urls duplicate by design; full-key sort is stable
        assert list(fused[col]) == list(classic[col]), col
