

def test_dsir_scores_rank_target_language(ray_session, tmp_path):
    """Target-language docs must out-score off-target docs; null/empty
    rows score on the ''-token weight; output is deterministic."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    en = ["the cat sat on the mat", "the dog ate the food",
          "cat and dog and mat"]
    de = ["der hund frisst das futter", "die katze sitzt auf der matte"]
    texts = en + de + ["", None]
    langs = ["en"] * 3 + ["de"] * 2 + ["de", "de"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(langs),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.corpus import (
        dsir_scores_documents)

    out = dsir_scores_documents(str(d)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(texts)
    per_tok = out["score_micro"] / out["n_tokens"]
    assert per_tok[:3].min() > per_tok[3:5].max()
    # '' and None tokenize identically -> identical scores
    assert out["score_micro"][5] == out["score_micro"][6]
    assert out["n_tokens"][5] == 1
    out2 = dsir_scores_documents(str(d)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["score_micro"] == out2["score_micro"]).all()


def test_dsir_vocab_limit_raises(ray_session):
    import pytest

    from jsonschema_validator_ray.pipelines.corpus import (
        dsir_scores_documents)

    with pytest.raises(ValueError, match="vocab_limit"):
        dsir_scores_documents("/root/testdata/sf0.001", vocab_limit=1)


def test_distinctive_terms_pick_language_markers(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    en = ["the cat and the dog", "the mat and the hat"]
    de = ["der hund und der mann", "die katze und der hut"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "lang": pa.array(["en", "en", "de", "de"]),
        "text": pa.array(en + de),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.corpus import (
        distinctive_terms_documents)

    out = distinctive_terms_documents(str(d), k=2)
    by_lang = {l: list(g["token"]) for l, g in out.groupby("lang")}
    assert "the" in by_lang["en"]       # en's most distinctive marker
    assert "der" in by_lang["de"]
    assert (out["rnk"] <= 2).all()
    assert (out.groupby("lang")["rnk"].max() == 2).all()
