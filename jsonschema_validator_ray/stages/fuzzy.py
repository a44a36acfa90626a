"""Blocked fuzzy matching — edit-distance candidate pairs within blocks.

``blocked_fuzzy_pairs`` finds pairs of records in the same BLOCK (the
caller's cheap equi-key, e.g. ``(lang, length_bucket)``) whose
Levenshtein distance over a fixed character prefix is at most
``max_dist`` — the record-linkage / near-dup-verification primitive that
MinHash cannot express (character-level edits, not shingle overlap).

Distance semantics match DuckDB ``levenshtein`` EXACTLY for the oracle:
the prefix is taken in CHARACTERS (DuckDB ``substr`` semantics) and the
distance is computed over its UTF-8 BYTES (DuckDB's levenshtein is
byte-based — verified: ``levenshtein('héllo','hello') = 2``). Distances
are integers, so the comparison is exact.

Scale shape:
- blocks hash into buckets, so one task owns every record of its blocks;
  nothing ever compares across blocks (the blocking key IS the
  partitioning key — the operator's documented partitioning assumption);
- within a block, the quadratic pair set first passes the vectorized
  BAG-DISTANCE filter (per-byte histogram L1/2 bound; bag(a,b) ≤
  lev(a,b), computed over bytes 1..255 so prefix padding can only lower
  the bound) — O(pairs × 255) numpy, no DP;
- survivors get the exact Wagner-Fischer DP, vectorized ACROSS pairs
  (the L² loop is over prefix positions, each step a numpy op over all
  surviving pairs — never a Python loop over pairs).
Only ``(key, prefix)`` rides the exchange; full documents stay at the
read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _prefix_bytes(texts: pd.Series, prefix_len: int):
    """→ (codes uint8[n, L], lengths int32[n]) — UTF-8 bytes of each
    string's first ``prefix_len`` CHARACTERS, zero-padded. L is the max
    realized byte length (≤ 4·prefix_len)."""
    bs = [t[:prefix_len].encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in bs), np.int32, len(bs))
    width = max(int(lens.max(initial=1)), 1)
    flat = b"".join(b.ljust(width, b"\0") for b in bs)
    codes = np.frombuffer(flat, np.uint8).reshape(len(bs), width)
    return codes, lens


def _bag_bound(codes: np.ndarray, lens: np.ndarray, ia: np.ndarray,
               ib: np.ndarray) -> np.ndarray:
    """Bag-distance lower bound per pair: max(|bag(a)−bag(b)|⁺ sums) over
    bytes 1..255. Padding is byte 0, excluded — a sub-multiset bound is
    still ≤ the true bag distance ≤ the true edit distance."""
    n, width = codes.shape
    counts = np.zeros((n, 256), np.int32)
    rows = np.repeat(np.arange(n), width)
    mask = (np.arange(width)[None, :] < lens[:, None]).ravel()
    np.add.at(counts, (rows[mask], codes.ravel()[mask]), 1)
    diff = counts[ia, 1:] - counts[ib, 1:]
    pos = np.where(diff > 0, diff, 0).sum(axis=1)
    neg = np.where(diff < 0, -diff, 0).sum(axis=1)
    return np.maximum(pos, neg)


def _levenshtein_pairs(codes: np.ndarray, lens: np.ndarray, ia: np.ndarray,
                       ib: np.ndarray) -> np.ndarray:
    """Exact Levenshtein per pair, DP vectorized across pairs."""
    a, b = codes[ia], codes[ib]
    la, lb = lens[ia], lens[ib]
    npair = len(ia)
    width = int(lb.max(initial=0))
    res = np.where(la == 0, lb, 0).astype(np.int32)
    prev = np.broadcast_to(np.arange(width + 1, dtype=np.int32),
                           (npair, width + 1)).copy()
    for i in range(1, int(la.max(initial=0)) + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = a[:, i - 1:i]                       # (npair, 1)
        sub = prev[:, :-1] + (ai != b[:, :width]).astype(np.int32)
        dele = prev[:, 1:] + 1
        m = np.minimum(sub, dele)
        # insertion column sweep (cur[j-1] dependency): positions beyond
        # lb never feed a read-off, so the sweep over the padded width is
        # harmless
        for j in range(1, width + 1):
            cur[:, j] = np.minimum(m[:, j - 1], cur[:, j - 1] + 1)
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev = cur
    return res


def blocked_fuzzy_pairs(ds, key: str, text: str, block_fn, *,
                        prefix_len: int = 40, max_dist: int = 10,
                        num_buckets: int = 32, batch_size: int = 65536):
    """→ Dataset ``(key_a, key_b, dist)`` with ``key_a < key_b``: pairs in
    the same block (``block_fn``: pyarrow.Table → pyarrow Array of block
    ids, any hashable dtype) whose prefix Levenshtein distance ≤
    ``max_dist``."""
    import pyarrow as pa

    def add_block(b: "pa.Table") -> "pa.Table":
        blk = block_fn(b)
        kb = (pd.util.hash_pandas_object(pd.Series(blk.to_pandas()),
                                         index=False).to_numpy()
                .astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({key: b.column(key),
                         "__pre": pa.compute.utf8_slice_codeunits(
                             pa.compute.cast(b.column(text), pa.string()),
                             0, prefix_len),
                         "__blk": blk, "__kb": pa.array(kb)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"key_a": pd.Series([], dtype=g[key].dtype),
                              "key_b": pd.Series([], dtype=g[key].dtype),
                              "dist": pd.Series([], dtype="int64")})
        g = g.sort_values(["__blk", key], kind="mergesort")
        codes, lens = _prefix_bytes(g["__pre"], prefix_len)
        blk_codes = pd.factorize(g["__blk"], use_na_sentinel=False)[0]
        starts = np.flatnonzero(np.r_[True, blk_codes[1:] != blk_codes[:-1]])
        ends = np.append(starts[1:], len(g))
        ias, ibs = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            iu, ju = np.triu_indices(e - s, k=1)
            ias.append(iu + s)
            ibs.append(ju + s)
        if not ias:
            return empty
        ia = np.concatenate(ias)
        ib = np.concatenate(ibs)
        keep = _bag_bound(codes, lens, ia, ib) <= max_dist
        ia, ib = ia[keep], ib[keep]
        if not len(ia):
            return empty
        dist = _levenshtein_pairs(codes, lens, ia, ib)
        hit = dist <= max_dist
        kv = g[key].to_numpy()
        return pd.DataFrame({"key_a": kv[ia[hit]], "key_b": kv[ib[hit]],
                             "dist": dist[hit].astype("int64")})

    return (ds.map_batches(add_block, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__kb")
              .map_groups(lambda g: per_bucket(g.drop(columns="__kb")),
                          batch_format="pandas"))
