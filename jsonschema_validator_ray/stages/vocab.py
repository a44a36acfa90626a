"""Corpus vocabulary statistics: per-token total counts + document
frequency, and the global top-k tokens.

The term-statistics pass every corpus pipeline needs (stopword discovery,
tokenizer-vocab sizing, IDF tables). Shape:

1. per batch, one Arrow whitespace split + ``dictionary_encode``
   (Arrow-native factorize) folds the batch to distinct-token partials
   ``(token, n_total, n_docs)`` via ``np.unique``/``bincount`` — no Python
   loop over tokens; natural-language batches compress hundreds-fold here
   (Zipf), so only distinct-token partials cross the exchange;
2. shuffle partials by a hash BUCKET of the token, sum per token VALUE
   inside the bucket (collision-proof);
3. per-bucket top-k by ``(n_total desc, token asc)`` — a token lives in
   exactly one bucket, so per-bucket heads merged on the driver (B·k rows,
   bounded) give the exact global top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _token_partials(batch: pa.Table, column: str,
                    num_buckets: int) -> pa.Table:
    s = pc.cast(batch.column(column), pa.large_string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    toks = pc.split_pattern_regex(s, r"\s+")
    flat = pc.list_flatten(toks)
    empty = pa.table({"token": pa.array([], type=pa.large_string()),
                      "n_total": pa.array([], type=pa.int64()),
                      "n_docs": pa.array([], type=pa.int64()),
                      "__bucket": pa.array([], type=pa.int32())})
    if len(flat) == 0:
        return empty
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    sel = np.flatnonzero(pc.greater(
        pc.binary_length(flat), 0).to_numpy(zero_copy_only=False))
    if sel.size == 0:
        return empty
    enc = pc.dictionary_encode(flat.take(pa.array(sel)))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    u = len(enc.dictionary)
    n_total = np.bincount(codes, minlength=u)
    pair = parent[sel].astype(np.int64) * np.int64(u) + codes
    n_docs = np.bincount(np.unique(pair) % u, minlength=u)
    tokens = pd.Series(enc.dictionary.to_pandas())
    h = pd.util.hash_pandas_object(tokens, index=False).to_numpy()
    return pa.table({
        "token": pc.cast(enc.dictionary, pa.large_string()),
        "n_total": pa.array(n_total.astype(np.int64)),
        "n_docs": pa.array(n_docs.astype(np.int64)),
        "__bucket": pa.array((h % num_buckets).astype(np.int32)),
    })


def vocab_topk(ds, column: str, k: int, *, num_buckets: int = 64,
               batch_size: int = 8192) -> pd.DataFrame:
    """→ DataFrame ``(token, n_total, n_docs)`` of the k most frequent
    whitespace tokens corpus-wide, ordered by ``(n_total desc, token
    asc)`` — the tiebreak makes the head deterministic, so it compares
    exactly against a SQL ``ORDER BY count(*) DESC, tok LIMIT k``."""

    partials = ds.map_batches(
        lambda b: _token_partials(b, column, num_buckets),
        batch_format="pyarrow", batch_size=batch_size)

    def head_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", sort=False).agg(
            n_total=("n_total", "sum"), n_docs=("n_docs", "sum"))
        agg = agg.reset_index().sort_values(
            ["n_total", "token"], ascending=[False, True],
            kind="mergesort").head(k)
        return agg[["token", "n_total", "n_docs"]]

    heads = partials.groupby("__bucket").map_groups(
        head_in_bucket, batch_format="pandas").to_pandas()
    if "token" not in heads.columns:      # empty corpus loses the schema
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n_total": pd.Series([], dtype=np.int64),
                             "n_docs": pd.Series([], dtype=np.int64)})
    out = heads.sort_values(["n_total", "token"], ascending=[False, True],
                            kind="mergesort").head(k)
    out["n_total"] = out["n_total"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.reset_index(drop=True)


def vocab_rank_freq(ds, column: str, k: int, *, num_buckets: int = 64,
                    batch_size: int = 8192) -> pd.DataFrame:
    """→ DataFrame ``(rank, token, n_total, cum_ppm)``: the top-``k``
    whitespace tokens by ``(n_total desc, token asc)`` with 1-based rank
    and the EXACT cumulative corpus share in ppm (``(cum·10⁶) // total``,
    floor). Same partial/bucket fold as :func:`vocab_topk`; each bucket's
    head additionally carries a MARKER row (empty token — real empty
    tokens are filtered by the tokenizer) holding the bucket's total token
    count, so the global denominator folds from B marker rows instead of a
    second corpus scan."""

    partials = ds.map_batches(
        lambda b: _token_partials(b, column, num_buckets),
        batch_format="pyarrow", batch_size=batch_size)

    def head_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", sort=False).agg(
            n_total=("n_total", "sum"), n_docs=("n_docs", "sum"))
        agg = agg.reset_index().sort_values(
            ["n_total", "token"], ascending=[False, True], kind="mergesort")
        marker = pd.DataFrame({"token": [""],
                               "n_total": [agg["n_total"].sum()],
                               "n_docs": [-1]})
        return pd.concat([agg.head(k), marker])[["token", "n_total",
                                                 "n_docs"]]

    heads = partials.groupby("__bucket").map_groups(
        head_in_bucket, batch_format="pandas").to_pandas()
    empty = pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                          "token": pd.Series([], dtype=object),
                          "n_total": pd.Series([], dtype=np.int64),
                          "cum_ppm": pd.Series([], dtype=np.int64)})
    if "token" not in heads.columns:
        return empty
    total = int(heads.loc[heads["n_docs"] == -1, "n_total"].sum())
    top = (heads[heads["n_docs"] != -1]
           .sort_values(["n_total", "token"], ascending=[False, True],
                        kind="mergesort").head(k).reset_index(drop=True))
    if total == 0 or top.empty:
        return empty
    cum = 0
    ranks, ppms = [], []
    for i, c in enumerate(top["n_total"], start=1):
        cum += int(c)
        ranks.append(i)
        ppms.append((cum * 1_000_000) // total)
    return pd.DataFrame({"rank": pd.Series(ranks, dtype=np.int64),
                         "token": top["token"],
                         "n_total": top["n_total"].astype(np.int64),
                         "cum_ppm": pd.Series(ppms, dtype=np.int64)})


class OOVScorer:
    """Actor stage: per-document out-of-vocabulary token counts against a
    broadcast fitted vocabulary (the CCNet-shaped quality signal — docs
    whose tokens fall outside the corpus head are boilerplate/noise
    candidates). Vocabulary resolves ONCE in ``__init__`` (ObjectRef or
    plain list); per batch one Arrow split + ``pc.is_in`` + two bincounts —
    no Python loop over tokens."""

    def __init__(self, column: str, key: str, vocab_ref):
        import ray

        toks = (ray.get(vocab_ref)
                if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref)
        self.vocab = pa.array(list(toks), type=pa.large_string())
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        s = pc.cast(batch.column(self.column), pa.large_string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        toks = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(toks)
        if len(flat):
            parent = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False)
            sel = np.flatnonzero(pc.greater(
                pc.binary_length(flat), 0).to_numpy(zero_copy_only=False))
            kept_parents = parent[sel]
            in_vocab = pc.is_in(
                flat.take(pa.array(sel)),
                value_set=self.vocab).to_numpy(zero_copy_only=False)
            n_tokens = np.bincount(kept_parents, minlength=n)
            n_oov = np.bincount(kept_parents[~in_vocab], minlength=n)
        else:
            n_tokens = n_oov = np.zeros(n, dtype=np.int64)
        return pa.table({
            self.key: batch.column(self.key),
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "n_oov": pa.array(n_oov.astype(np.int64)),
        })


def oov_scores(ds, column: str, key: str, vocab_tokens, *,
               batch_size: int = 8192, concurrency: int = 2):
    """→ Dataset ``(key, n_tokens, n_oov)``: per-row token totals and
    out-of-vocabulary counts against ``vocab_tokens`` (any iterable; big
    vocabularies should be ``ray.put`` once and passed as the ObjectRef)."""
    import ray

    toks = vocab_tokens
    if not isinstance(toks, ray.ObjectRef):
        toks = list(toks)
        if len(toks) > 100_000:
            toks = ray.put(toks)
    return ds.map_batches(
        OOVScorer, fn_constructor_args=(column, key, toks),
        concurrency=(1, concurrency), batch_format="pyarrow",
        batch_size=batch_size)


class TfidfTopTerms:
    """Actor stage: top-k terms per document by TF-IDF against a broadcast
    fitted vocabulary (keyword extraction, the classic corpus summarizer).
    ``idf = ln((N+1)/(df+1)) + 1`` (smoothed; Salton & Buckley 1988). The
    vocabulary + idf table resolve ONCE in ``__init__``; per batch one
    Arrow split + ``index_in`` + bincount-style pair fold + one lexsort —
    no Python loop over tokens or documents."""

    def __init__(self, column: str, key: str, vocab_ref, idf_ref, k: int):
        import ray

        toks = (ray.get(vocab_ref)
                if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref)
        idf = (ray.get(idf_ref)
               if isinstance(idf_ref, ray.ObjectRef) else idf_ref)
        self.vocab = pa.array(list(toks), type=pa.large_string())
        self.idf = np.asarray(idf, dtype=np.float64)
        self.column = column
        self.key = key
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_col = batch.column(self.key)
        empty = pa.table({
            self.key: key_col.slice(0, 0),
            "term": pa.array([], type=pa.large_string()),
            "score": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64())})
        s = pc.cast(batch.column(self.column), pa.large_string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        toks = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return empty
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(pc.greater(
            pc.binary_length(flat), 0).to_numpy(zero_copy_only=False))
        if sel.size == 0:
            return empty
        codes = pc.index_in(flat.take(pa.array(sel)), value_set=self.vocab)
        codes_np = codes.to_numpy(zero_copy_only=False)
        in_vocab = ~pd.isna(codes_np)
        if not in_vocab.any():
            return empty
        doc_idx = parent[sel][in_vocab].astype(np.int64)
        code = codes_np[in_vocab].astype(np.int64)
        V = len(self.vocab)
        pair, tf = np.unique(doc_idx * np.int64(V) + code,
                             return_counts=True)
        doc = pair // V
        c = pair % V
        score = tf * self.idf[c]
        # doc asc, score desc, term-code asc (deterministic ties)
        order = np.lexsort((c, -score, doc))
        d_sorted = doc[order]
        starts = np.flatnonzero(np.r_[True, np.diff(d_sorted) != 0])
        group_id = np.cumsum(np.r_[True, np.diff(d_sorted) != 0]) - 1
        rank = np.arange(len(d_sorted)) - starts[group_id]
        keep = rank < self.k
        kept = order[keep]
        return pa.table({
            self.key: key_col.take(pa.array(doc[kept])),
            "term": self.vocab.take(pa.array(c[kept])),
            "score": pa.array(score[kept]),
            "rank": pa.array(rank[keep].astype(np.int64)),
        })


def tfidf_top_terms(ds, column: str, key: str, *, vocab_size: int = 10000,
                    k: int = 3, n_docs: int | None = None,
                    batch_size: int = 8192, concurrency: int = 2):
    """→ Dataset ``(key, term, score, rank)``: top-``k`` TF-IDF terms per
    document. Fits the vocabulary (top ``vocab_size`` tokens + document
    frequencies) with the exact distributed ``vocab_topk`` pass, broadcasts
    tokens + idf once, then scores per batch in an actor pool."""
    import math

    import ray

    voc = vocab_topk(ds, column, vocab_size, batch_size=batch_size)
    n = n_docs if n_docs is not None else ds.count()
    idf = [math.log((n + 1) / (df + 1)) + 1.0 for df in voc["n_docs"]]
    toks = voc["token"].tolist()
    tok_ref = ray.put(toks) if len(toks) > 100_000 else toks
    idf_ref = ray.put(idf) if len(idf) > 100_000 else idf
    return ds.map_batches(
        TfidfTopTerms, fn_constructor_args=(column, key, tok_ref, idf_ref, k),
        concurrency=(1, concurrency), batch_format="pyarrow",
        batch_size=batch_size)


def inverted_index(ds, text_col: str, id_col: str, *, min_df: int = 2,
                   max_df: int | None = None, num_buckets: int = 64,
                   batch_size: int = 8192):
    """→ Dataset ``(token, df, postings)`` — the search-index-build shape:
    for every whitespace token with document frequency in
    ``[min_df, max_df]``, its exact df and the comma-joined ascending
    ``id_col`` posting list.

    Shape: each batch folds to DISTINCT ``(token, doc_id)`` pairs (a doc
    row lives in exactly one batch, so per-batch pair dedup is global
    dedup), pairs exchange by a hash bucket of the token — a token's full
    posting set lands in one task, raw text never shuffles — and each
    bucket builds its tokens' postings in one pandas pass. ``max_df``
    (default: unbounded) is the stopword guard: one TOKEN's postings must
    fit a task, so at corpus scale cap df (an index entry listing half the
    corpus is useless anyway) or shard hot tokens by id-range downstream.
    Output stays a Dataset — the index is corpus-sized, never gathered."""

    def pair_partials(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(text_col), pa.large_string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        toks = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(toks)
        empty = pa.table({"token": pa.array([], type=pa.large_string()),
                          id_col: pa.array([], type=pa.int64()),
                          "__bucket": pa.array([], type=pa.int32())})
        if len(flat) == 0:
            return empty
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(pc.greater(
            pc.binary_length(flat), 0).to_numpy(zero_copy_only=False))
        if sel.size == 0:
            return empty
        enc = pc.dictionary_encode(flat.take(pa.array(sel)))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u = len(enc.dictionary)
        pair = np.unique(parent[sel].astype(np.int64) * np.int64(u) + codes)
        row_idx, tok_code = pair // u, pair % u
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tokens = enc.dictionary.take(pa.array(tok_code))
        h = pd.util.hash_pandas_object(
            pd.Series(tokens.to_pandas()), index=False).to_numpy()
        return pa.table({
            "token": pc.cast(tokens, pa.large_string()),
            id_col: pa.array(ids[row_idx]),
            "__bucket": pa.array((h % num_buckets).astype(np.int32)),
        })

    def postings_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        agg = g.groupby("token", sort=False)[id_col].agg(
            df="size",
            postings=lambda s: ",".join(map(str, s))).reset_index()
        agg["df"] = agg["df"].astype(np.int64)
        keep = agg["df"] >= min_df
        if max_df is not None:
            keep &= agg["df"] <= max_df
        return agg.loc[keep, ["token", "df", "postings"]]

    return ds.map_batches(pair_partials, batch_format="pyarrow",
                          batch_size=batch_size) \
        .groupby("__bucket").map_groups(postings_in_bucket,
                                        batch_format="pandas")
