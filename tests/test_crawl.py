"""Crawl-curation operator properties: exact budget water-filling and
canonicalization invariants."""

import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.usefixtures("ray_session")
def test_crawl_budget_water_fill_invariants():
    from jsonschema_validator_ray.pipelines.crawl import crawl_budget_hosts

    out = crawl_budget_hosts(SF_SMOKE, budget=30)
    total = int(out["n"].sum())
    assert int(out["allocated"].sum()) == min(30, total)
    assert (out["allocated"] <= out["n"]).all()
    # fairness: any host NOT fully served is within 1 of every other
    # capped host's allocation (the water level)
    capped = out[out["allocated"] < out["n"]]["allocated"]
    if len(capped):
        assert int(capped.max()) - int(capped.min()) <= 1
        # no fully-served host may exceed the water level
        full = out[out["allocated"] == out["n"]]["allocated"]
        if len(full):
            assert int(full.max()) <= int(capped.max())


@pytest.mark.usefixtures("ray_session")
def test_crawl_budget_degenerate_budget_covers_all():
    from jsonschema_validator_ray.pipelines.crawl import crawl_budget_hosts

    out = crawl_budget_hosts(SF_SMOKE, budget=10**9)
    assert (out["allocated"] == out["n"]).all()


@pytest.mark.usefixtures("ray_session")
def test_canonical_urls_are_idempotent_and_deduplicated_forms():
    from jsonschema_validator_ray.pipelines.crawl import (
        canonical_url_documents)

    df = canonical_url_documents(SF_SMOKE).to_pandas()
    assert (df["canonical_url"].str.startswith("https://")).all()
    assert not df["canonical_url"].str.contains("#").any()
    assert not df["canonical_url"].str.contains(":443").any()
    # canonical form is case-normalized in the authority
    host = df["canonical_url"].str.extract(r"^https://([^/]*)")[0]
    assert (host == host.str.lower()).all()
    # distinct canonical forms ≤ distinct messy forms
    assert df["canonical_url"].nunique() <= df["url"].nunique()
