"""BPE-training pair statistics — corpus-wide adjacent-character-pair
counts, the inner-loop statistic of byte-pair-encoding tokenizer training
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public).

One fused counting pass: each batch encodes its texts to one flat UTF-32
buffer, forms pair codes ``c1·2²¹ + c2`` over the whole buffer with the
document-boundary positions masked out (pairs never span documents), and
emits the ``np.unique`` sparse histogram — one (code, n) row per distinct
pair per block, bounded by the pair vocabulary, never by corpus size.
Partials fold driver-side under the 512-block gate (KBs) and through a
Ray groupby-sum past it.

Ordering note: UTF-8 is codepoint-order-preserving, so sorting by the
integer pair code IS byte-lexicographic order of the 2-char pair string —
the tiebreak compares exactly against a SQL ``ORDER BY pair``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _pair_partial(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """→ (codes int64[k], counts int64[k]): sparse adjacent-pair histogram
    of one batch, document boundaries masked."""
    texts = texts.fillna("")
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    flat = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32)
    if len(flat) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    codes = (flat[:-1].astype(np.int64) << 21) | flat[1:]
    mask = np.ones(len(flat) - 1, bool)
    ends = np.cumsum(lens)[:-1]                 # doc boundaries
    ends = ends[(ends >= 1) & (ends <= len(flat) - 1)]
    mask[ends - 1] = False
    return np.unique(codes[mask], return_counts=True)


def pair_counts(ds, text: str, *, top_k: int = 20,
                batch_size: int = 65536):
    """→ pyarrow.Table ``(pair, n)`` — the ``top_k`` most frequent adjacent
    character pairs across all documents, ties broken by pair string
    ascending (byte order)."""
    import pyarrow as pa

    def partial(b: "pa.Table") -> "pa.Table":
        # fillna happens inside _pair_partial — astype(str) here would turn
        # nulls into the literal string "None" first.
        codes, counts = _pair_partial(b.column(text).to_pandas())
        return pa.table({"code": pa.array(codes, pa.int64()),
                         "n_partial": pa.array(counts, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)
    if hasattr(ds, "num_blocks") and ds.num_blocks() > 512:
        from ray.data.aggregate import Sum

        folded = partials.groupby("code").aggregate(
            Sum("n_partial", alias_name="n")).to_pandas()
    else:
        df = partials.to_pandas()
        folded = (df.groupby("code", as_index=False, sort=False)
                    ["n_partial"].sum().rename(columns={"n_partial": "n"}))
    folded = folded.sort_values(["n", "code"], ascending=[False, True],
                                kind="mergesort").head(top_k)
    pairs = [chr(int(c) >> 21) + chr(int(c) & ((1 << 21) - 1))
             for c in folded["code"]]
    return pa.table({"pair": pa.array(pairs, pa.string()),
                     "n": pa.array(folded["n"].to_numpy(np.int64))})
