"""Lag-window gaps, percent-of-total shares, first-seen daily cohorts."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return df


@pytest.fixture()
def sf_dir(ray_session, tmp_path):
    rows = [
        # user 1: three events, gaps 60 s and 3600 s
        (1, 1, "2024-01-01 00:00:00", 1.00, "click"),
        (2, 1, "2024-01-01 00:01:00", 2.50, "view"),
        (3, 1, "2024-01-01 01:01:00", 0.25, "click"),
        # user 2: single event (dropped from gaps)
        (4, 2, "2024-01-02 12:00:00", 10.00, "view"),
        # user 3: duplicate timestamp (tie broken by event_id, gap 0)
        (5, 3, "2024-01-03 08:00:00", 3.00, "click"),
        (6, 3, "2024-01-03 08:00:00", 4.00, "click"),
    ]
    df = _events(rows)
    # JSON props: one malformed row exercises the 0-extract path
    df["props"] = ['{"k": 10}', '{"k": 20}', '{"k": 5}',
                   'not json', '{"k": 1}', '{"k": 2}']
    d = tmp_path / "sf"
    d.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    return str(d)


def test_event_gaps_users(sf_dir):
    from jsonschema_validator_ray.pipelines.analytics import event_gaps_users

    out = event_gaps_users(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert list(out["user_id"]) == [1, 3]          # single-event user 2 gone
    u1 = out.iloc[0]
    assert u1["n_events"] == 3
    assert u1["max_gap_us"] == 3600 * 1_000_000
    assert u1["span_us"] == 3660 * 1_000_000
    u3 = out.iloc[1]
    assert (u3["n_events"], u3["max_gap_us"], u3["span_us"]) == (2, 0, 0)


def test_value_share_by_type(sf_dir):
    from jsonschema_validator_ray.pipelines.analytics import (
        value_share_by_type)

    out = value_share_by_type(sf_dir).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    # cents: click 100+25+300+400=825, view 250+1000=1250, total 2075
    assert list(out["event_type"]) == ["click", "view"]
    assert list(out["value_cents"]) == [825, 1250]
    assert list(out["n_events"]) == [4, 2]
    assert list(out["share_bp"]) == [825 * 10000 // 2075,
                                     1250 * 10000 // 2075]
    assert out["share_bp"].sum() <= 10000          # floor shares never overshoot


def test_new_users_daily(sf_dir):
    from jsonschema_validator_ray.pipelines.analytics import new_users_daily

    out = new_users_daily(sf_dir).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    assert list(out["new_users"]) == [1, 1, 1]
    assert list(out["day"]) == [pd.Timestamp("2024-01-01"),
                                pd.Timestamp("2024-01-02"),
                                pd.Timestamp("2024-01-03")]


def test_event_gaps_many_users_bucketed(ray_session, tmp_path):
    """1000 users across 32 buckets: pandas-path parity with a brute-force
    per-user computation."""
    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 1000, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf2"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))

    from jsonschema_validator_ray.pipelines.analytics import event_gaps_users

    out = event_gaps_users(str(d)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    t = df.assign(t=df["ts"].astype("int64")) \
        .sort_values(["user_id", "t", "event_id"], kind="mergesort")
    gaps = t.groupby("user_id")["t"].diff()
    ref = t.assign(g=gaps).groupby("user_id").agg(
        n_events=("t", "size"), max_gap_us=("g", "max"),
        span_us=("t", lambda s: s.max() - s.min()))
    ref = ref[ref["n_events"] >= 2].reset_index()
    ref["max_gap_us"] = ref["max_gap_us"].astype("int64")
    ref["span_us"] = ref["span_us"].astype("int64")
    pd.testing.assert_frame_equal(
        out, ref[["user_id", "n_events", "max_gap_us", "span_us"]],
        check_dtype=False)


def test_rank_length_in_lang(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "lang": ["en", "en", "en", "de", "de"],
        "n_chars": [50, 10, 50, 7, 7],   # en tie on 50 → doc_id breaks it
    })
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(d / "documents.parquet"))

    from jsonschema_validator_ray.pipelines.analytics import (
        rank_length_in_lang)

    out = rank_length_in_lang(str(d)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    by = out.set_index("doc_id")
    assert list(by.loc[[2, 1, 3], "rank_in_lang"]) == [1, 2, 3]
    assert list(by.loc[[4, 5], "rank_in_lang"]) == [1, 2]
    assert set(by.loc[[1, 2, 3], "n_lang"]) == {3}
    assert set(by.loc[[4, 5], "n_lang"]) == {2}


def test_event_transitions(sf_dir):
    from jsonschema_validator_ray.pipelines.analytics import event_transitions

    out = event_transitions(sf_dir)
    got = {(r.prev_type, r.event_type): r.n for r in out.itertuples()}
    # user 1: click->view, view->click; user 3: click->click (ts tie broken
    # by event_id); user 2 has a single event -> no pair
    assert got == {("click", "view"): 1, ("view", "click"): 1,
                   ("click", "click"): 1}


def test_hourly_active_users(sf_dir):
    from jsonschema_validator_ray.pipelines.analytics import hourly_active_users

    out = hourly_active_users(sf_dir).to_pandas()
    got = {str(r.hour): r.n_distinct for r in out.itertuples()}
    assert got == {"2024-01-01 00:00:00": 1, "2024-01-01 01:00:00": 1,
                   "2024-01-02 12:00:00": 1, "2024-01-03 08:00:00": 1}


def test_props_value_by_type(sf_dir):
    from jsonschema_validator_ray.pipelines.analytics import props_value_by_type

    out = props_value_by_type(sf_dir).set_index("event_type")
    # clicks: k = 10 + 5 + 1 + 2 = 18 (4 rows all parse)
    assert int(out.loc["click", "k_sum"]) == 18
    assert int(out.loc["click", "n_extracted"]) == 4
    # views: 20 parses, 'not json' does not -> count 1 of 2 rows
    assert int(out.loc["view", "k_sum"]) == 20
    assert int(out.loc["view", "n_extracted"]) == 1
    assert out["k_sum"].dtype == np.int64  # never drifts to float


def test_pattern_scan_documents(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.corpus import pattern_scan_documents

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["fast table and slow value", "no hits here",
                          None, "fast table fast table fast table"]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = pattern_scan_documents(str(d)).to_pandas()
    got = dict(zip(out["doc_id"], out["n_matches"]))
    assert got == {1: 2, 4: 3}  # null and no-hit rows never leave the scan


def test_corr_matrix_lineitem(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.analytics import (
        corr_matrix_lineitem)

    rng = np.random.default_rng(11)
    q = rng.integers(1, 50, 400).astype(float)
    c = (q * 100 + rng.integers(0, 1000, 400)).astype(float) / 100.0
    d = rng.integers(0, 11, 400).astype(float) / 100.0
    df = pd.DataFrame({"l_quantity": q, "l_extendedprice": c,
                       "l_discount": d})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(sf / "lineitem.parquet"))
    out = corr_matrix_lineitem(str(sf)).set_index(["var_x", "var_y"])

    qi = np.rint(q).astype(np.int64)
    ci = np.rint(c * 100).astype(np.int64)
    di = np.rint(d * 100).astype(np.int64)
    for (x, y), (a, b) in {("qty", "cents"): (qi, ci),
                           ("qty", "disc"): (qi, di),
                           ("cents", "disc"): (ci, di)}.items():
        ref = np.corrcoef(a, b)[0, 1]
        assert abs(out.loc[(x, y), "corr"] - ref) < 1e-12


def test_manifest_by_lang(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.analytics import manifest_by_lang

    docs = pa.table({"doc_id": pa.array([5, 3, 9, 1, 7], type=pa.int64()),
                     "lang": pa.array(["en", "de", "en", "en", "de"])})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, str(sf / "documents.parquet"))
    out = manifest_by_lang(str(sf)).to_pandas().set_index("lang")
    assert out.loc["en", "doc_ids"] == "1,5,9"     # ascending order
    assert out.loc["de", "doc_ids"] == "3,7"
    assert int(out.loc["en", "n_docs"]) == 3


def test_label_centroids_embeddings(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.corpus import (
        label_centroids_embeddings)

    emb = pa.table({
        "label": pa.array([0, 0, 1, 1, 1], type=pa.int32()),
        "embedding": pa.array(
            [[1.0, -2.0], [3.0, 3.0], [0.0, 0.0],   # zero vector -> codes 0
             None, [2.0, 4.0]],                      # null row contributes 0
            type=pa.list_(pa.float32())),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(emb, str(sf / "embeddings.parquet"))
    out = label_centroids_embeddings(str(sf)).set_index(["label", "dim"])
    # label 0 dim 1: floor(1*127/2)=63, floor(3*127/3)=127 -> sum 190, n 2
    assert int(out.loc[(0, 1), "q_sum"]) == 63 + 127
    assert out.loc[(0, 1), "centroid_q"] == (63 + 127) / 2.0
    # label 0 dim 2: floor(-2*127/2)=-127, 127 -> sum 0
    assert int(out.loc[(0, 2), "q_sum"]) == 0
    # label 1: zero vector gives codes 0; null row absent; [2,4] -> 63,127
    assert int(out.loc[(1, 1), "q_sum"]) == 63
    assert int(out.loc[(1, 1), "n_vecs"]) == 2     # zero-vec counted, null not
    assert int(out.loc[(1, 2), "q_sum"]) == 127


def test_chunk_documents(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.corpus import (
        _CHUNK_STRIDE, _CHUNK_TOKENS, chunk_documents)

    words = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array([words(10),                    # one short chunk
                          words(_CHUNK_TOKENS),         # exactly one window
                          words(_CHUNK_STRIDE * 2 + 5), # three chunks
                          None, ""]),                   # no chunks
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, str(sf / "documents.parquet"))
    out = chunk_documents(str(sf)).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    by = out.groupby("doc_id")
    assert by.size().to_dict() == {1: 1, 2: 2, 3: 3}
    # doc 1: single 10-token chunk, text round-trips
    assert out.loc[0, "chunk_text"] == words(10)
    assert out.loc[0, "n_tokens_chunk"] == 10
    # doc 2: 64 tokens -> chunk 0 full, chunk 1 = the 16-token overlap tail
    d2 = out[out["doc_id"] == 2].reset_index(drop=True)
    assert list(d2["n_tokens_chunk"]) == [_CHUNK_TOKENS,
                                          _CHUNK_TOKENS - _CHUNK_STRIDE]
    # overlap: chunk 1 starts at token STRIDE
    assert d2.loc[1, "chunk_text"].split(" ")[0] == f"w{_CHUNK_STRIDE}"
    # doc 3: strides 0/48/96 over 101 tokens -> 64, 53, 5 tokens
    d3 = out[out["doc_id"] == 3].reset_index(drop=True)
    assert list(d3["n_tokens_chunk"]) == [64, 53, 5]


def test_hard_negatives_embeddings(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_validator_ray.pipelines.corpus import (
        hard_negatives_embeddings)

    # query = vec 0 (label 0). Same-label vec 1 is IDENTICAL to the query
    # (cosine 1.0) and must still be excluded; different-label vecs rank by
    # true cosine.
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "label": pa.array([0, 0, 1, 1, 2], type=pa.int32()),
        "embedding": pa.array([[1.0, 0.0], [1.0, 0.0], [0.9, 0.1],
                               [0.0, 1.0], [1.0, 0.05]],
                              type=pa.list_(pa.float32())),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(emb, str(sf / "embeddings.parquet"))
    out = hard_negatives_embeddings(str(sf))
    assert list(out["vec_id"]) [:2] == [4, 2]   # nearest different-label
    assert 1 not in set(out["vec_id"])          # same-label twin excluded
    assert 0 not in set(out["vec_id"])


def test_star_joins_run_in_tiny_session(ray_session):
    """Regression guard for the concurrent-native-join deadlock: TWO live
    JoinOperators each reserving num_partitions aggregator actors starved
    an 8-CPU session at 32+32 (observed hang >10 min). The pipelines size
    partitions from the session's CPUs — they must finish promptly even
    on the 4-CPU test session."""
    from jsonschema_validator_ray.pipelines.analytics import (
        revenue_by_nation, top_unshipped_orders)

    out = revenue_by_nation("/root/testdata/sf0.001")
    assert list(out.columns) == ["n_name", "revenue_x10000", "n_items"]
    assert (out["n_items"] > 0).all()

    top = top_unshipped_orders("/root/testdata/sf0.001")
    assert list(top.columns) == ["l_orderkey", "revenue_x10000",
                                 "o_orderdate", "o_orderpriority"]
    # descending by revenue with deterministic tiebreak
    assert (top["revenue_x10000"].to_numpy()[:-1]
            >= top["revenue_x10000"].to_numpy()[1:]).all()


def test_type_intervals_users(ray_session, tmp_path):
    """Hand-built change log: runs collapse, ties break on event_id, the
    last interval per user is open (int64-max sentinel)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    US = 1_000_000
    rows = [  # (user, t_us, event_id, type)
        (1, 0 * US, 1, "a"), (1, 1 * US, 2, "a"), (1, 2 * US, 3, "b"),
        (1, 2 * US, 4, "c"),            # tie at t=2s: id order decides
        (1, 5 * US, 5, "c"),
        (2, 0 * US, 6, "x"),
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
    }), str(d / "events.parquet"))
    from jsonschema_validator_ray.pipelines.analytics import (
        type_intervals_users)

    out = type_intervals_users(str(d)).to_pandas() \
        .sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    OPEN = (1 << 63) - 1
    got = list(map(tuple, out.to_numpy()))
    assert got == [
        (1, "a", 0, 2 * US),
        (1, "b", 2 * US, 2 * US),       # zero-length: superseded same ts
        (1, "c", 2 * US, OPEN),
        (2, "x", 0, OPEN),
    ]


def test_audience_migration_statuses(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    jan1 = np.datetime64("2024-01-01T12:00:00", "us")
    jan30 = np.datetime64("2024-01-30T12:00:00", "us")
    mid = np.datetime64("2024-01-15T12:00:00", "us")
    rows = [(1, jan1), (1, jan30),      # retained
            (2, jan1),                   # churned
            (3, jan30),                  # new
            (4, mid)]                    # outside both windows: excluded
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
    }), str(d / "events.parquet"))
    from jsonschema_validator_ray.pipelines.analytics import (
        audience_migration_events)

    out = audience_migration_events(str(d))
    assert dict(zip(out["status"], out["n_users"])) == {
        "retained": 1, "churned": 1, "new": 1}


def test_nfc_audit_detects_decomposed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    composed = "café"                 # NFC
    decomposed = "café"              # NFD: e + combining acute
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lang": pa.array(["fr", "fr", "en", "en"]),
        "text": pa.array([composed, decomposed, "plain", None]),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.corpus import nfc_audit_documents

    out = nfc_audit_documents(str(d)).set_index("lang")
    assert out.loc["fr", "n_changed"] == 1          # only the NFD row
    assert out.loc["fr", "bytes_nfc"] == 2 * len(composed.encode())
    assert out.loc["en", "n_changed"] == 0
    assert out.loc["en", "bytes_nfc"] == len(b"plain")


def test_revenue_by_nation_paths_agree(ray_session):
    """broadcast_orders_limit=0 forces the two-exchange star-join scale
    path; it must equal the one-scan broadcast fast path."""
    import pandas as pd

    from jsonschema_validator_ray.pipelines.analytics import (
        revenue_by_nation)

    SF = "/root/testdata/sf0.001"
    fast = revenue_by_nation(SF)
    slow = revenue_by_nation(SF, broadcast_orders_limit=0)[fast.columns]
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow.reset_index(drop=True),
                                  check_dtype=False)


def test_top_unshipped_paths_agree(ray_session):
    import pandas as pd

    from jsonschema_validator_ray.pipelines.analytics import (
        top_unshipped_orders)

    SF = "/root/testdata/sf0.001"
    fast = top_unshipped_orders(SF)
    slow = top_unshipped_orders(SF, broadcast_orders_limit=0)[fast.columns]
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow.reset_index(drop=True),
                                  check_dtype=False)


def test_trending_paths_agree(ray_session):
    import pandas as pd

    from jsonschema_validator_ray.pipelines.corpus import trending_events

    SF = "/root/testdata/sf0.001"
    fast = trending_events(SF)
    fast = (fast if isinstance(fast, pd.DataFrame) else fast.to_pandas()) \
        .sort_values(["window_start", "rnk"]).reset_index(drop=True)
    slow = trending_events(SF, block_gate=0)
    slow = (slow if isinstance(slow, pd.DataFrame) else slow.to_pandas()) \
        [fast.columns].sort_values(["window_start", "rnk"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_recency_scores_halving_decay(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    day = np.timedelta64(86_400_000_000, "us")
    last = np.datetime64("2024-02-10T09:00:00", "us")
    rows = [(1, last, 8.00), (1, last - day, 8.00),       # 800 + 400
            (1, last - 2 * day, 8.01),                     # 801 // 4 = 200
            (2, last - 70 * day, 99.0),                    # too old -> 0
            (3, last, None)]                               # null value -> 0
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }), str(d / "events.parquet"))
    from jsonschema_validator_ray.pipelines.analytics import (
        recency_scores_users)

    out = recency_scores_users(str(d)).set_index("user_id")
    assert out.loc[1, "score_cents"] == 800 + 400 + 200
    assert out.loc[2, "score_cents"] == 0
    assert out.loc[3, "score_cents"] == 0
    assert out.loc[1, "n_events"] == 3


def test_dup_cluster_histogram_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    texts = ["a"] * 3 + ["b"] * 2 + ["c", "d", "e"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.corpus import (
        dup_cluster_histogram_documents)

    out = dup_cluster_histogram_documents(str(d))
    got = {int(r["cluster_size"]): (int(r["n_clusters"]), int(r["n_docs"]))
           for _, r in out.iterrows()}
    assert got == {1: (3, 3), 2: (1, 2), 3: (1, 3)}


def test_sample_quota_sums_and_remainders(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    # counts 5, 3, 3 with k=7: bases 3,1,1 (floor of 35/11, 21/11, 21/11),
    # remainders 2, 10, 10 -> leftovers 2 go to the two largest remainders
    langs = ["a"] * 5 + ["b"] * 3 + ["c"] * 3
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(langs)), pa.int64()),
        "lang": pa.array(langs),
    }), str(d / "documents.parquet"))
    from jsonschema_validator_ray.pipelines.analytics import (
        sample_quota_by_lang)

    out = sample_quota_by_lang(str(d), k=7).set_index("lang")["quota"]
    assert out.sum() == 7
    assert out.to_dict() == {"a": 3, "b": 2, "c": 2}


def test_bounce_rate_sessions(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    MIN = 60_000_000
    t0 = np.datetime64("2024-03-01T10:00:00", "us")
    us = np.timedelta64(1, "us")
    rows = [  # user 1: 2-event session + later 1-event session (bounce)
        (1, t0, 1), (1, t0 + 10 * MIN * us, 2),
        (1, t0 + 100 * MIN * us, 3),
        (2, t0, 4),                       # bounce
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
    }), str(d / "events.parquet"))
    from jsonschema_validator_ray.pipelines.analytics import (
        bounce_rate_daily)

    out = bounce_rate_daily(str(d))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["n_sessions"]), int(r["n_bounce"]),
            int(r["bounce_bp"])) == (3, 2, 6666)
