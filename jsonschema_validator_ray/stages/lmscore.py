"""Unigram language-model scoring — per-document cross-entropy against the
corpus's own token distribution (the CCNet-shaped perplexity quality signal:
Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data" — public; there the LM is KenLM, here the exactly-
reproducible unigram case).

Float parity contract (the repo's integer-ln technique): each token's
log-probability is computed ONCE as ``floor(ln(c/T) · 10⁶)`` — one IEEE
division of two exact int64s, one libm ``log`` (bit-identical between
CPython ``math.log`` / numpy and DuckDB ``ln``), one ``floor`` — and all
per-document accumulation is int64 sums of those micro-nat integers, so the
scores compare bit-exactly against a SQL oracle. The only float in the
output is the final ``xent_per_token = xent / n_tokens`` — again one IEEE
division of exact integers.

Shapes:

- **fit**: one pass folds each batch to distinct-token partials (Zipf
  compresses hundreds-fold), then a token-hash-bucket exchange sums per
  token VALUE inside the bucket — identical to stages/vocab.vocab_topk but
  keeping the FULL vocabulary;
- **score, broadcast strategy** (vocab below ``broadcast_limit``): the
  (token → micro-nat) table ships once via ``ray.put`` and an actor pool
  scores each batch with one Arrow split + ``index_in`` + ``np.add.at`` —
  no Python loop over tokens;
- **score, join strategy** (100-TB vocabularies): per-batch (doc, token)
  count partials exchange by token-hash bucket, pick up their micro-nats by
  VALUE inside the bucket (collision-proof), and a second doc-bucket
  exchange folds per-document sums — documents never ship their text, only
  (key, token) distinct pairs and int64 partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SCALE = 1_000_000  # micro-nats


def fit_unigram_counts(ds, column: str, *, num_buckets: int = 64,
                       batch_size: int = 8192):
    """→ Dataset ``(token, n_total, __bucket)`` — exact corpus-wide token
    totals (full vocabulary; whitespace tokens, empties dropped). The
    ``__bucket`` column is kept so the join-strategy scorer can reuse the
    same partitioning without re-hashing."""
    from .vocab import _token_partials

    partials = ds.map_batches(
        lambda b: _token_partials(b, column, num_buckets),
        batch_format="pyarrow", batch_size=batch_size)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", sort=False, as_index=False).agg(
            n_total=("n_total", "sum"),
            __bucket=("__bucket", "first"))
        return agg[["token", "n_total", "__bucket"]]

    return partials.groupby("__bucket").map_groups(
        fold, batch_format="pandas")


def _log_micronats(counts: np.ndarray, total: int) -> np.ndarray:
    """int64 ``floor(ln(c/T)·10⁶)`` per count — the one place floats are
    touched; every op mirrors the SQL expression exactly."""
    p = counts.astype(np.float64) / np.float64(total)
    return np.floor(np.log(p) * _SCALE).astype(np.int64)


class _XentScorer:
    """Actor stage (broadcast strategy): per-document token count + summed
    micro-nat cross-entropy against the broadcast (token → lp) table.
    Vocabulary resolves ONCE in ``__init__``; a token absent from the table
    fails LOUDLY (the fit ran on the same corpus, so a miss is a bug, not
    an OOV)."""

    def __init__(self, column: str, key: str, vocab_ref, lp_ref):
        import ray

        toks = (ray.get(vocab_ref)
                if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref)
        lp = (ray.get(lp_ref)
              if isinstance(lp_ref, ray.ObjectRef) else lp_ref)
        self.vocab = pa.array(list(toks), type=pa.large_string())
        self.lp = np.asarray(lp, dtype=np.int64)
        self.column = column
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        s = pc.cast(batch.column(self.column), pa.large_string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        toks = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(toks)
        n_tokens = np.zeros(n, np.int64)
        xent = np.zeros(n, np.int64)
        if len(flat):
            parent = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False)
            sel = np.flatnonzero(pc.greater(
                pc.binary_length(flat), 0).to_numpy(zero_copy_only=False))
            if sel.size:
                codes = pc.index_in(flat.take(pa.array(sel)),
                                    value_set=self.vocab) \
                    .to_numpy(zero_copy_only=False)
                if pd.isna(codes).any():
                    raise RuntimeError(
                        "token missing from the fitted unigram table — "
                        "fit and score must run over the same corpus")
                doc = parent[sel].astype(np.int64)
                np.add.at(n_tokens, doc, 1)
                np.add.at(xent, doc, -self.lp[codes.astype(np.int64)])
        with np.errstate(divide="ignore", invalid="ignore"):
            per_token = xent.astype(np.float64) / n_tokens.astype(np.float64)
        return pa.table({
            self.key: batch.column(self.key),
            "n_tokens": pa.array(n_tokens),
            "xent_micronats": pa.array(xent),
            "xent_per_token": pa.array(per_token, type=pa.float64(),
                                       mask=n_tokens == 0),
        })


def _pair_partials(batch: pa.Table, column: str, key: str,
                   num_buckets: int) -> pa.Table:
    """(key, token, tf, __bucket) distinct-pair count partials of one batch
    (join strategy): documents fold to their distinct tokens before the
    exchange."""
    s = pc.cast(batch.column(column), pa.large_string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    toks = pc.split_pattern_regex(s, r"\s+")
    flat = pc.list_flatten(toks)
    key_col = batch.column(key)
    empty = pa.table({
        key: key_col.slice(0, 0),
        "token": pa.array([], type=pa.large_string()),
        "tf": pa.array([], type=pa.int64()),
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
    pair, tf = np.unique(parent[sel].astype(np.int64) * np.int64(u) + codes,
                         return_counts=True)
    doc = (pair // u).astype(np.int64)
    code = (pair % u).astype(np.int64)
    tokens = enc.dictionary.take(pa.array(code))
    h = pd.util.hash_pandas_object(
        pd.Series(tokens.to_pandas()), index=False).to_numpy()
    return pa.table({
        key: key_col.take(pa.array(doc)),
        "token": pc.cast(tokens, pa.large_string()),
        "tf": pa.array(tf.astype(np.int64)),
        "__bucket": pa.array((h % num_buckets).astype(np.int32)),
    })


def xent_scores(ds, column: str, key: str, *, strategy: str = "auto",
                broadcast_limit: int = 2_000_000, num_buckets: int = 64,
                batch_size: int = 8192, concurrency: int = 2):
    """→ Dataset ``(key, n_tokens, xent_micronats, xent_per_token)`` — the
    per-document unigram cross-entropy quality signal (module docstring).
    Rows with zero tokens (empty/null text) score 0 with a NULL per-token
    value, matching the SQL LEFT JOIN shape.

    ``strategy``: ``"broadcast"`` ships the fitted (token → micro-nat)
    table once and scores in an actor pool; ``"join"`` never gathers the
    vocabulary — two bucket exchanges of (key, token) pair partials;
    ``"auto"`` picks broadcast below ``broadcast_limit`` fitted tokens."""
    import ray

    vocab = fit_unigram_counts(ds, column, num_buckets=num_buckets,
                               batch_size=batch_size).materialize()
    # total token count: a driver fold of per-bucket int sums (B rows)
    totals = vocab.map_batches(
        lambda b: pa.table({"t": pa.array(
            [pc.sum(b.column("n_total")).as_py() or 0], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    total = int(totals["t"].sum()) if len(totals) else 0
    n_vocab = vocab.count()

    if strategy == "auto":
        strategy = "broadcast" if n_vocab <= broadcast_limit else "join"

    if strategy == "broadcast":
        if n_vocab > broadcast_limit:
            raise ValueError(
                f"fitted vocabulary {n_vocab} exceeds broadcast_limit "
                f"{broadcast_limit}; use strategy='join'")
        vdf = vocab.to_pandas()
        if not len(vdf) or "token" not in vdf.columns:
            toks: list = []
            lp = np.empty(0, np.int64)
        else:
            toks = vdf["token"].tolist()
            lp = _log_micronats(vdf["n_total"].to_numpy(np.int64), total)
        tok_ref = ray.put(toks) if len(toks) > 100_000 else toks
        lp_ref = ray.put(lp) if len(lp) > 100_000 else lp
        return ds.map_batches(
            _XentScorer, fn_constructor_args=(column, key, tok_ref, lp_ref),
            concurrency=(1, concurrency), batch_format="pyarrow",
            batch_size=batch_size)

    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")

    # ---- join strategy: nothing vocabulary-sized ever leaves the workers.
    # (key, token, tf) distinct-pair partials join the (token, lp) table by
    # token-hash bucket (stages/joins.bucketed_join — collision-proof value
    # merge inside each bucket), then a key-bucket exchange folds the int64
    # per-document sums; zero-token rows rejoin via one left-outer pass.
    from .joins import bucketed_join

    pairs = ds.map_batches(
        lambda b: _pair_partials(b, column, key, num_buckets),
        batch_format="pyarrow", batch_size=batch_size).map_batches(
            lambda b: b.drop_columns(["__bucket"]), batch_format="pyarrow")
    lp_ds = vocab.map_batches(
        lambda b: pa.table({
            "token": b.column("token"),
            "lp": pa.array(_log_micronats(
                b.column("n_total").to_numpy(zero_copy_only=False)
                .astype(np.int64), total))}),
        batch_format="pyarrow")
    joined = bucketed_join(pairs, lp_ds, on="token",
                           num_buckets=num_buckets)

    def to_partials(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        lp = b.column("lp").to_numpy(zero_copy_only=False).astype(np.int64)
        h = pd.util.hash_pandas_object(
            b.column(key).to_pandas(), index=False).to_numpy()
        return pa.table({
            key: b.column(key),
            "n_tokens": pa.array(tf),
            "xent_partial": pa.array(-(tf * lp)),
            "__db": pa.array((h % num_buckets).astype(np.int32))})

    def fold_doc(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__db").groupby(
            key, as_index=False, sort=False).agg(
                n_tokens=("n_tokens", "sum"),
                xent_micronats=("xent_partial", "sum"))

    totals_ds = joined.map_batches(to_partials, batch_format="pyarrow") \
        .groupby("__db").map_groups(fold_doc, batch_format="pandas")

    keys_all = ds.map_batches(
        lambda b: b.select([key]), batch_format="pyarrow")
    outer = bucketed_join(keys_all, totals_ds, on=key,
                          join_type="left_outer", num_buckets=num_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        nt = pc.fill_null(pc.cast(b.column("n_tokens"), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        x = pc.fill_null(pc.cast(b.column("xent_micronats"), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            per = x.astype(np.float64) / nt.astype(np.float64)
        return pa.table({
            key: b.column(key),
            "n_tokens": pa.array(nt.astype(np.int64)),
            "xent_micronats": pa.array(x.astype(np.int64)),
            "xent_per_token": pa.array(per, type=pa.float64(),
                                       mask=nt == 0)})

    return outer.map_batches(finalize, batch_format="pyarrow")
