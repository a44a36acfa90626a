"""Edge cases for the round-5 second-wave operators: RFM scoring, churn
boundaries, windowed dedup ties, session-gap boundaries, char-bigram doc
masking, vocabulary growth/overlap, centroid assignment, Markov tiebreaks,
Pareto degenerate sets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(d, name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / f"{name}.parquet"))


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df["props"] = "{}"
    return df


@pytest.fixture()
def ev_dir(ray_session, tmp_path):
    rows = [
        # user 1: events exactly gap_s apart (1800 s — NOT > gap: same
        # session), then gap_s + 1 (new session)
        (1, 1, "2024-01-01 00:00:00", 1.00, "click"),
        (2, 1, "2024-01-01 00:30:00", 2.00, "view"),
        (3, 1, "2024-01-01 01:00:01", 3.00, "purchase"),
        # user 2: consecutive weeks (active w and w+1: not churned at w)
        (4, 2, "2024-01-01 10:00:00", 1.00, "click"),
        (5, 2, "2024-01-08 10:00:00", 1.00, "click"),
        # user 3: two purchases at the SAME hour (windowed dedup keeps the
        # lower event_id), plus the second-purchase gap of exactly 2 days
        (6, 3, "2024-01-01 05:00:10", 5.00, "purchase"),
        (7, 3, "2024-01-01 05:00:10", 6.00, "purchase"),
        (8, 3, "2024-01-03 05:00:10", 7.00, "purchase"),
    ]
    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "events", _events(rows))
    return str(d)


def test_session_stats_gap_boundary(ev_dir):
    from jsonschema_validator_ray.pipelines.analytics import \
        session_stats_events

    out = session_stats_events(ev_dir)
    # user1: 2 sessions ([e1,e2], [e3]); user2: 2; user3: 2 ([e6,e7], [e8])
    assert int(out["n_sessions"][0]) == 6
    assert int(out["n_events"][0]) == 8
    # durations: 1800s + 0 + 0 + 0 + 0 + 0
    assert int(out["total_duration_us"][0]) == 1800 * 1_000_000


def test_weekly_churn_consecutive_weeks(ev_dir):
    from jsonschema_validator_ray.pipelines.analytics import \
        weekly_churn_users

    out = weekly_churn_users(ev_dir).set_index("week")
    weeks = sorted(out.index)
    # first week: users 1,2,3 active; only user 2 returns next week
    assert int(out.loc[weeks[0], "n_active"]) == 3
    assert int(out.loc[weeks[0], "n_churned"]) == 2
    # trailing week churns by definition
    assert int(out.loc[weeks[1], "n_active"]) == 1
    assert int(out.loc[weeks[1], "n_churned"]) == 1


def test_windowed_dedup_tie_and_second_purchase(ev_dir):
    from jsonschema_validator_ray.pipelines.analytics import (
        second_purchase_events, windowed_dedup_events)

    kept = windowed_dedup_events(ev_dir).to_pandas()
    u3 = kept[(kept["user_id"] == 3) & (kept["event_type"] == "purchase")]
    # same (user, type, hour): lower event_id wins; later hour kept too
    assert sorted(u3["event_id"]) == [6, 8]

    sp = second_purchase_events(ev_dir)
    # buyers: user 1 (one purchase) and user 3 (three)
    assert int(sp["n_buyers"][0]) == 2
    assert int(sp["n_repeat"][0]) == 1
    assert int(sp["repeat_ppm"][0]) == 500_000
    # first two purchases are the same-timestamp pair: gap 0 days
    assert int(sp["median_gap_days"][0]) == 0


def test_markov_accuracy_tiebreak(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import \
        markov_accuracy_events

    rows = [
        # a→b and a→c equally often: predictor must pick 'b' (lexicographic)
        (1, 1, "2024-01-01 00:00:00", 0.0, "a"),
        (2, 1, "2024-01-01 00:01:00", 0.0, "b"),
        (3, 1, "2024-01-01 00:02:00", 0.0, "a"),
        (4, 1, "2024-01-01 00:03:00", 0.0, "c"),
    ]
    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "events", _events(rows))
    out = markov_accuracy_events(str(d)).set_index("prev_type")
    assert out.loc["a", "predicted_next"] == "b"
    assert int(out.loc["a", "n_transitions"]) == 2
    assert int(out.loc["a", "n_correct"]) == 1
    assert int(out.loc["a", "accuracy_ppm"]) == 500_000


def test_rfm_score_edge_equality(ray_session, tmp_path):
    """Values EQUAL to a quintile edge must not cross it (1 + Σ[v > e])."""
    from jsonschema_validator_ray.pipelines.analytics import rfm_users_events

    rows = []
    eid = 0
    # 5 users with frequencies 1..5 (distinct), same day
    for u in range(1, 6):
        for _ in range(u):
            eid += 1
            rows.append((eid, u, "2024-01-01 00:00:00", 1.0, "click"))
    d = tmp_path / "sf"
    d.mkdir()
    _write(d, "events", _events(rows))
    out = rfm_users_events(str(d)).set_index("user_id")
    # n=5: discrete edges at ranks ceil(.2*5)-1..= indices 0,1,2,3 → 1,2,3,4
    # score(v) = 1 + #edges strictly below v → exactly 1..5
    assert list(out["f_score"]) == [1, 2, 3, 4, 5]
    # all r_days equal → every r_score is 1 (v > e never true)
    assert set(out["r_score"]) == {1}


def test_pareto_single_customer(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.analytics import pareto_customers

    d = tmp_path / "sf"
    d.mkdir()
    od = pd.DataFrame({
        "o_orderkey": [1, 2], "o_custkey": [7, 7],
        "o_orderstatus": ["O", "O"], "o_totalprice": [10.0, 5.0],
        "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype(
            "datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "5-LOW"]})
    _write(d, "orders", od)
    out = pareto_customers(str(d))
    assert int(out["n_top_customers"][0]) == 1
    assert int(out["n_customers"][0]) == 1
    assert int(out["covered_cents"][0]) == 1500
    assert int(out["total_cents"][0]) == 1500


def test_char_bigrams_doc_boundary(ray_session, tmp_path):
    """No bigram may span two documents; multi-byte chars count as ONE."""
    from jsonschema_validator_ray.pipelines.corpus import \
        char_bigrams_documents

    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["ab", "ba", "€a"],
        "lang": ["en", "en", "en"],
        "source": ["s", "s", "s"],
        "n_chars": [2, 2, 2]})
    _write(d, "documents", docs)
    out = char_bigrams_documents(str(d))
    got = dict(zip(out["bigram"], out["n"]))
    # exactly one bigram per doc — 'b'+'a' must NOT appear twice via the
    # doc_0|doc_1 seam, and '€a' survives as a single 2-char bigram
    assert got == {"ab": 1, "ba": 1, "€a": 1}


def test_vocab_growth_first_seen(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import \
        vocab_growth_documents

    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["x y", "x", "x z", "w"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": [3, 1, 3, 1]})
    _write(d, "documents", docs)
    out = vocab_growth_documents(str(d)).set_index("n_docs")
    # checkpoints for max_id+1=4: {1, 2, 4}
    assert int(out.loc[1, "vocab_size"]) == 2   # x, y
    assert int(out.loc[2, "vocab_size"]) == 2
    assert int(out.loc[4, "vocab_size"]) == 4   # + z, w


def test_lang_vocab_jaccard_disjoint_and_overlap(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import lang_vocab_jaccard

    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b", "b c", "p q"],
        "lang": ["en", "fr", "zh"],
        "source": ["s"] * 3, "n_chars": [3, 3, 3]})
    _write(d, "documents", docs)
    out = lang_vocab_jaccard(str(d)).set_index(["lang_a", "lang_b"])
    assert out.loc[("en", "fr"), "n_both"] == 1        # 'b'
    assert out.loc[("en", "fr"), "jaccard"] == 1.0 / 3.0
    assert out.loc[("en", "zh"), "n_both"] == 0
    assert out.loc[("en", "zh"), "jaccard"] == 0.0


def test_nearest_centroid_two_labels(ray_session, tmp_path):
    """Two orthogonal clusters assign to themselves; a zero vector ties
    every score at 0 and takes the LOWEST label."""
    from jsonschema_validator_ray.pipelines.features import \
        nearest_centroid_confusion

    d = tmp_path / "sf"
    d.mkdir()
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9], [0.0, 0.0]]
    emb = pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4],
        "embedding": [np.array(v, dtype=np.float32) for v in vecs],
        "label": np.array([0, 0, 1, 1, 1], dtype=np.int32)})
    _write(d, "embeddings", emb)
    out = nearest_centroid_confusion(str(d))
    cells = {(int(r["true_label"]), int(r["assigned_label"])): int(r["n"])
             for _, r in out.iterrows()}
    assert cells[(0, 0)] == 2
    assert cells[(1, 1)] == 2
    assert cells[(1, 0)] == 1          # the zero vector: tie → label 0


def test_emb_norm_by_lang_inner_join(ray_session, tmp_path):
    """A vector without a matching document drops (inner-join semantics);
    quantized squared norms are exact."""
    from jsonschema_validator_ray.pipelines.features import emb_norm_by_lang

    d = tmp_path / "sf"
    d.mkdir()
    emb = pd.DataFrame({
        "vec_id": [0, 1, 99],
        "embedding": [np.array([0.5, 0.5], dtype=np.float32),
                      np.array([1.0, 0.0], dtype=np.float32),
                      np.array([1.0, 1.0], dtype=np.float32)],
        "label": np.array([0, 0, 0], dtype=np.int32)})
    docs = pd.DataFrame({
        "doc_id": [0, 1], "text": ["a", "b"], "lang": ["en", "fr"],
        "source": ["s", "s"], "n_chars": [1, 1]})
    _write(d, "embeddings", emb)
    _write(d, "documents", docs)
    out = emb_norm_by_lang(str(d)).set_index("lang")
    assert set(out.index) == {"en", "fr"}          # vec 99 dropped
    assert int(out.loc["en", "sum_sq"]) == 2 * 50_000 ** 2
    assert int(out.loc["fr", "sum_sq"]) == 100_000 ** 2


def test_cross_source_dup_matrix_planted(ray_session, tmp_path):
    """Same-source pairs count C(k,2); cross-source pairs k_a*k_b; unique
    texts never appear."""
    from jsonschema_validator_ray.pipelines.dq import cross_source_dup_matrix

    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["dup", "dup", "dup", "dup", "unique", "dup2"],
        "source": ["A", "A", "A", "B", "A", "B"],
        "lang": ["en"] * 6, "n_chars": [3] * 6})
    _write(d, "documents", docs)
    out = cross_source_dup_matrix(str(d))
    cells = {(r["source_a"], r["source_b"]): int(r["n_pairs"])
             for _, r in out.iterrows()}
    # "dup": A×3, B×1 → AA: C(3,2)=3, AB: 3·1=3; "dup2" alone: no pair
    assert cells == {("A", "A"): 3, ("A", "B"): 3}


def test_trigram_diversity_repeated_text(ray_session, tmp_path):
    from jsonschema_validator_ray.pipelines.corpus import \
        trigram_diversity_documents

    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a b a b",       # trigrams: aba bab aba bab → 2 distinct
                 "x y",               # < 3 tokens: excluded
                 "p q r"],            # one trigram
        "source": ["s"] * 3, "lang": ["en"] * 3, "n_chars": [1] * 3})
    _write(d, "documents", docs)
    out = trigram_diversity_documents(str(d)).to_pandas() \
        .set_index("doc_id")
    assert list(out.index) == [0, 2]
    assert int(out.loc[0, "n_trigrams"]) == 4
    assert int(out.loc[0, "n_distinct"]) == 2
    assert int(out.loc[0, "diversity_ppm"]) == 500_000
    assert int(out.loc[2, "n_trigrams"]) == 1
