"""Parity: the ONE-scan fused wide-checks pass (wide_checks_files) must
produce content-identical outputs to the classic multi-scan
run_webtext_pipeline — verdicts, flattened violations, duplicate urls,
lang referential violations, and merged column stats."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from jsonschema_validator_ray.sources.webtext import write_webtext_parquet

    d = tmp_path_factory.mktemp("webtext_fused")
    write_webtext_parquet(str(d), 20_000, override_num_blocks=4)
    return sorted(str(p) for p in d.glob("*.parquet"))


def _sorted(df: pd.DataFrame, by) -> pd.DataFrame:
    return df.sort_values(by, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("check_extraction", [False, True])
def test_wide_fused_matches_classic(ray_session, corpus, check_extraction):
    from jsonschema_validator_ray.pipelines.webtext import (
        run_webtext_pipeline, wide_checks_files)
    from jsonschema_validator_ray.sources.parquet import read_parquet

    classic = run_webtext_pipeline(read_parquet(corpus),
                                   check_extraction=check_extraction,
                                   batch_size=4096)
    fused = wide_checks_files(corpus, check_extraction=check_extraction,
                              batch_size=4096)

    # verdicts: identical multiset of (url, valid, error_count) — the
    # corpus contains DUPLICATE urls whose rows differ, so sort totally
    vkey = ["url", "valid", "error_count"]
    cv = _sorted(classic.verdicts.to_pandas(), vkey)
    fv = _sorted(fused.verdicts.to_pandas(), vkey)
    pd.testing.assert_frame_equal(cv, fv)
    assert len(cv) == 20_000

    # flattened violations: identical (url, constraint_id) multisets + cols
    key = ["url", "constraint_id", "column", "tag", "message"]
    cviol = _sorted(classic.violations.to_pandas(), key)
    fviol = _sorted(fused.violations.to_pandas(), key)
    pd.testing.assert_frame_equal(cviol, fviol)

    # duplicate urls: identical keys and counts
    cd = _sorted(classic.dup_urls.to_pandas(), "url")
    fd = _sorted(fused.dup_urls.to_pandas(), "url")
    pd.testing.assert_frame_equal(cd, fd)
    assert len(cd) > 0, "corpus should contain duplicate urls"

    # lang referential violations
    lkey = ["url", "lang", "constraint_id"]
    cl = _sorted(classic.lang_violations.to_pandas(), lkey)
    fl = _sorted(fused.lang_violations.to_pandas(), lkey)
    pd.testing.assert_frame_equal(cl, fl)

    # merged stats: all-string columns here, so every surviving statistic
    # (counts, HLL distinct, min/max strings) merges commutatively → exact
    cs = _sorted(classic.stats.to_pandas(), "column")
    fs = _sorted(fused.stats.to_pandas(), "column")
    assert list(cs["column"]) == ["lang", "text", "url"]
    pd.testing.assert_frame_equal(cs, fs)
    assert int(cs.loc[cs["column"] == "url", "cnt"].iloc[0]) == 20_000


def test_wide_fused_verdict_counts_match_validator(ray_session, corpus):
    """The fused pass's verdict stream equals validate_webtext_files'."""
    from ray.data.aggregate import Count, Sum

    from jsonschema_validator_ray.pipelines.webtext import (
        validate_webtext_files, wide_checks_files)

    headline = validate_webtext_files(corpus, check_extraction=True,
                                      batch_size=4096)
    agg = headline.aggregate(Count(), Sum("error_count", alias_name="v"))
    fused = wide_checks_files(corpus, check_extraction=True, batch_size=4096)
    fagg = fused.verdicts.aggregate(Count(), Sum("error_count",
                                                 alias_name="v"))
    assert agg["count()"] == fagg["count()"] == 20_000
    assert agg["v"] == fagg["v"]


def test_wide_fused_hash_dup_exchange_parity(ray_session, corpus):
    """dup_exchange="hash" (8-byte-key exchange + string recovery from the
    union's verdict rows) produces the exact same duplicate-url table as
    the default string exchange, including the broadcast-limit fallback
    that re-counts every url string."""
    from jsonschema_validator_ray.pipelines.webtext import (
        _dup_urls_from_union, wide_checks_files)

    base = wide_checks_files(corpus, batch_size=4096)
    hashed = wide_checks_files(corpus, batch_size=4096, dup_exchange="hash")
    da = _sorted(base.dup_urls.to_pandas(), "url")
    db = _sorted(hashed.dup_urls.to_pandas(), "url")
    pd.testing.assert_frame_equal(da, db)
    assert len(da) > 0

    # fallback path: a zero broadcast limit forces the full string re-count
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from jsonschema_validator_ray.pipelines.webtext import (
        KIND_DUP, WideChecksPass)

    w = WideChecksPass(False, 64, dup_exchange="hash")

    def load(batch):
        for p, rg in zip(batch["path"], batch["rg"]):
            t = pq.ParquetFile(p).read_row_group(
                int(rg), columns=["url", "text", "lang"])
            for off in range(0, t.num_rows, 4096):
                yield w(t.slice(off, 4096))

    items = [{"path": f, "rg": i} for f in corpus
             for i in range(pq.ParquetFile(f).metadata.num_row_groups)]
    combined = ray.data.from_items(items).map_batches(
        load, batch_size=1, batch_format="numpy").materialize()

    def sel(b):
        sub = b.select(["key_hash", "partial_count", "bucket", "kind"])
        sub = sub.filter(pc.equal(sub.column("kind"),
                                  pa.scalar(KIND_DUP, pa.int8())))
        return sub.drop_columns(["kind"])

    parts = combined.map_batches(sel, batch_format="pyarrow")
    dc = _sorted(_dup_urls_from_union(
        combined, parts, hash_broadcast_limit=0).to_pandas(), "url")
    pd.testing.assert_frame_equal(da, dc)
