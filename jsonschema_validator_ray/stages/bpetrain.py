"""Distributed BPE tokenizer training + application (Sennrich et al. 2016,
public). Complements stages/bpestats (the single pair-count statistic) with
the full loop: ``bpe_train`` learns a merge table with one fused corpus
scan per merge, ``BpeEncoder`` applies it as a streaming ``map_batches``
stage.

Symbol model: words are whitespace tokens; symbols start as single
codepoints WITHIN a word (merges never cross word boundaries; no
end-of-word marker — documented deviation from subword-nmt kept for
kernel simplicity). Symbol ids are globally deterministic with no
coordination: a base character's id IS its codepoint; merge ``k``'s new
symbol gets id ``0x110000 + k``. Pair codes pack as ``id1·2^32 + id2``.

Apply semantics (the trainer measures with the SAME kernel, so training
and encoding are self-consistent): merges apply in rank order, one greedy
left-to-right pass each; overlapping matches of a self-pair (a, a) keep
even offsets within each run ("aaaa" -> "aa aa"). One pass per merge is a
fixpoint: a merge's output symbol can never recreate its own input pair,
and merging never deletes symbols between two others, so no earlier merge
is ever re-enabled by a later one.

Scale shape: training scans emit per-block SPARSE pair histograms
(bounded by the live pair vocabulary, never corpus size) that fold
driver-side under ``driver_fold_limit`` partial rows; past it each
iteration hash-exchanges the partials on ``code % 64``, folds + argmaxes
per bucket (the global winner is some bucket's winner, since buckets
partition codes) and the driver folds ≤ 64 candidate rows. The argmax
tiebreak (count desc, then (id1, id2) ascending) is identical on both
paths — path-equality pinned in tests/test_bpetrain.py.
``num_merges`` merges cost ``num_merges`` fused scans — the honest
distributed form of the textbook algorithm, whose statistic changes after
every merge. Encoding is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NEW_ID_BASE = 0x110000          # first non-codepoint symbol id


def _flatten_words(texts: pa.ChunkedArray | pa.Array):
    """Batch texts -> (sym int64 flat codepoints, wid int64 word ids,
    doc_of_word int64). Null text = no words."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.cast(texts, pa.large_string()), r"\s+")
    flat = pc.list_flatten(toks)
    # parent doc of each word, from the list offsets (CLAUDE.md: never
    # pc.list_parent_indices on map-typed data; lists are fine but offsets
    # are cheap and uniform)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_words_per_doc = np.diff(offs)
    doc_of_word = np.repeat(np.arange(len(n_words_per_doc), dtype=np.int64),
                            n_words_per_doc)
    # drop empty words (consecutive whitespace)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    words = flat.to_pylist()
    if not nonempty.all():
        words = [w for w, k in zip(words, nonempty) if k]
        doc_of_word = doc_of_word[nonempty]
    if not words:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    lens = np.fromiter((len(w) for w in words), np.int64, len(words))
    sym = np.frombuffer("".join(words).encode("utf-32-le"),
                        np.uint32).astype(np.int64)
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    return sym, wid, doc_of_word


def _greedy_matches(match: np.ndarray) -> np.ndarray:
    """Resolve overlapping pair matches left-to-right: within each run of
    consecutive True, keep even offsets."""
    if not match.any():
        return match
    idx = np.flatnonzero(match)
    run_start = np.r_[True, np.diff(idx) != 1]
    starts = idx[run_start]
    offset = idx - np.repeat(starts, np.diff(np.r_[
        np.flatnonzero(run_start), run_start.size]))
    keep = np.zeros_like(match)
    keep[idx[offset % 2 == 0]] = True
    return keep


def apply_merges(sym: np.ndarray, wid: np.ndarray,
                 merges: list[tuple[int, int]]):
    """Apply the merge table in rank order. Returns updated (sym, wid)."""
    for k, (a, b) in enumerate(merges):
        if sym.size < 2:
            break
        m = (sym[:-1] == a) & (sym[1:] == b) & (wid[:-1] == wid[1:])
        if not m.any():
            continue
        m = _greedy_matches(m)
        pos = np.flatnonzero(m)
        sym[pos] = NEW_ID_BASE + k
        delete = np.zeros(sym.size, bool)
        delete[pos + 1] = True
        sym = sym[~delete]
        wid = wid[~delete]
    return sym, wid


def _pair_histogram(sym: np.ndarray, wid: np.ndarray):
    """Sparse (code, count) of adjacent within-word symbol pairs."""
    if sym.size < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ok = wid[:-1] == wid[1:]
    codes = (sym[:-1][ok] << 32) | sym[1:][ok]
    return np.unique(codes, return_counts=True)


class _PairCountPass:
    """Per-batch partial for one training iteration: encode with the
    current merges, histogram the surviving adjacent pairs."""

    def __init__(self, col: str, merges: list[tuple[int, int]]):
        self.col = col
        self.merges = merges

    def __call__(self, b: pa.Table) -> pa.Table:
        sym, wid, _ = _flatten_words(b.column(self.col))
        sym, wid = apply_merges(sym, wid, self.merges)
        codes, counts = _pair_histogram(sym, wid)
        return pa.table({"code": pa.array(codes, pa.int64()),
                         "n": pa.array(counts, pa.int64())})


def _bucket_best(g: pd.DataFrame) -> pa.Table:
    """Per-bucket fold+argmax of (code, n) partials: a bucket owns every
    partial of its codes, so its (max total, min code at max) is the
    bucket's TRUE best — the global winner is some bucket's winner."""
    agg = g.groupby("code", sort=False)["n"].sum()
    best_n = agg.max()
    code = agg[agg == best_n].index.min()
    return pa.table({"code": pa.array([int(code)], pa.int64()),
                     "n": pa.array([int(best_n)], pa.int64())})


def _add_code_bucket(b: pa.Table) -> pa.Table:
    return b.append_column("__b", pc.cast(pc.bit_wise_and(
        pc.cast(b.column("code"), pa.uint64()),
        pa.scalar(63, pa.uint64())), pa.int32()))


def bpe_train(ds_factory, col: str, num_merges: int,
              min_count: int = 2,
              driver_fold_limit: int = 5_000_000) -> list[tuple[int, int]]:
    """Learn ``num_merges`` merges: each iteration is ONE fused corpus scan
    counting pairs under the merges so far, then the argmax with the
    deterministic (count desc, (id1, id2) asc) tiebreak. Stops early when
    no pair reaches ``min_count``.

    Partials fold driver-side under ``driver_fold_limit`` rows; past it
    the iteration's partials hash-exchange on ``code % 64`` and argmax per
    bucket, so the driver folds ≤ 64 candidates regardless of corpus size
    (see module docstring).

    ``ds_factory``: zero-arg callable returning a fresh Dataset /
    FusedParquetScan per scan (a Dataset is lazily re-executable, so
    ``lambda: ds`` works)."""
    merges: list[tuple[int, int]] = []
    for _ in range(num_merges):
        parts_ds = ds_factory().map_batches(
            _PairCountPass(col, list(merges)),
            batch_format="pyarrow").materialize()
        if parts_ds.count() > driver_fold_limit:
            parts = (parts_ds
                     .map_batches(_add_code_bucket, batch_format="pyarrow")
                     .groupby("__b")
                     .map_groups(_bucket_best, batch_format="pandas")
                     ).to_pandas()
        else:
            parts = parts_ds.to_pandas()
        if not len(parts) or "code" not in parts.columns:
            break
        agg = parts.groupby("code", sort=False)["n"].sum()
        if not len(agg):
            break
        best_n = int(agg.max())
        if best_n < min_count:
            break
        cands = agg[agg == best_n].index.to_numpy()
        code = int(cands.min())               # (id1, id2) ascending
        merges.append((code >> 32, code & 0xFFFFFFFF))
    return merges


class BpeEncoder:
    """Actor stage: apply a trained merge table to a text column; emits
    per-document token statistics (id, n_words, n_base_symbols,
    n_bpe_tokens). The merge table pickles once per actor."""

    def __init__(self, col: str, id_col: str,
                 merges: list[tuple[int, int]]):
        self.col = col
        self.id_col = id_col
        self.merges = merges

    def __call__(self, b: pa.Table) -> pa.Table:
        sym, wid, doc_of_word = _flatten_words(b.column(self.col))
        n = b.num_rows
        n_words = np.bincount(doc_of_word, minlength=n).astype(np.int64)
        base = np.zeros(n, np.int64)
        if doc_of_word.size:
            # base symbols per doc: codepoints per word, summed per doc
            # (bincount weights are float64 — exact below 2^53)
            per_word = np.bincount(wid, minlength=len(doc_of_word))
            base = np.bincount(doc_of_word, weights=per_word,
                               minlength=n).astype(np.int64)
        sym2, wid2 = apply_merges(sym.copy(), wid.copy(), self.merges)
        toks = np.zeros(n, np.int64)
        if wid2.size:
            per_word2 = np.bincount(wid2, minlength=len(doc_of_word))
            toks = np.bincount(doc_of_word, weights=per_word2,
                               minlength=n).astype(np.int64)
        return pa.table({
            self.id_col: b.column(self.id_col),
            "n_words": pa.array(n_words),
            "n_base_symbols": pa.array(base),
            "n_bpe_tokens": pa.array(toks),
        })
