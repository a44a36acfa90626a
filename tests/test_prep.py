"""End-to-end training-data prep chain invariants."""

from __future__ import annotations

import numpy as np
import pytest


def _prep_corpus(n_unique: int = 40):
    rows = [{"doc_id": i, "text": f"unique document number {i} body " * 8}
            for i in range(n_unique)]
    # exact duplicates
    rows.append({"doc_id": 900, "text": rows[0]["text"]})
    rows.append({"doc_id": 901, "text": rows[1]["text"]})
    # near-duplicate cluster
    base = "repeated text about rays arrows and packing budgets " * 6
    rows += [{"doc_id": 950, "text": base},
             {"doc_id": 951, "text": base + "tail"}]
    # quality-gate victims
    rows.append({"doc_id": 960, "text": "too short"})
    rows.append({"doc_id": 961, "text": "w " * 6000})
    return rows


def test_prepare_training_data_end_to_end(ray_session):
    import ray.data

    from jsonschema_validator_ray.pipelines.prep import prepare_training_data

    rows = _prep_corpus()
    ds = ray.data.from_items(rows)
    packed, stats = prepare_training_data(ds, pack_budget=64,
                                          near_dup_threshold=0.5,
                                          batch_size=16)
    pdf = packed.to_pandas()
    ids = set(pdf["doc_id"])
    assert stats["n_input"] == len(rows)
    # quality gate removed the short and the overlong doc
    assert 960 not in ids and 961 not in ids
    # exact dups removed, originals kept
    assert 900 not in ids and 901 not in ids and 0 in ids and 1 in ids
    # near-dup cluster resolved to its canonical doc
    assert 950 in ids and 951 not in ids
    # every surviving doc packed exactly once; budget respected
    assert pdf["doc_id"].is_unique
    sums = pdf.groupby("pack_id")["n_tokens"].sum()
    counts = pdf.groupby("pack_id")["n_tokens"].count()
    for pid, s in sums.items():
        assert s <= 64 or counts[pid] == 1
    # determinism across partitionings
    packed2, _ = prepare_training_data(ds.repartition(7), pack_budget=64,
                                       near_dup_threshold=0.5,
                                       batch_size=16)
    pdf2 = packed2.to_pandas()
    assert dict(zip(pdf["doc_id"], pdf["pack_id"])) == \
        dict(zip(pdf2["doc_id"], pdf2["pack_id"]))


def test_prep_documents_summary(ray_session):
    from tests.conftest import SF_SMOKE

    from jsonschema_validator_ray.pipelines.prep import prep_documents

    out = prep_documents(SF_SMOKE)
    row = out.iloc[0]
    assert row["n_input"] >= row["n_after_exact"] >= row["n_final_docs"] > 0
    assert row["n_packs"] > 0
    assert row["total_tokens"] > 0
