"""Deterministic global shuffle: seed-stable pseudo-random training order.

``random_shuffle()`` gives a different order every run — useless for
resumable / reproducible training-data jobs. Instead: append
``h(key, salt)`` (an LCG over the Mersenne-61 field, exactly expressible
in SQL HUGEINT arithmetic — reuses ``functions.text._mulmod61``) and run a
distributed ``Dataset.sort`` on it. Same salt → byte-identical order on
any cluster size; new salt → fresh order. The sort is Ray's range-
partitioned shuffle — the one all-to-all this operator needs — and the
exchange carries the real payload exactly once.

Epoch pattern at 100 TB: write the shuffled corpus once per salt with
``write_parquet`` (resumable, partitioned); readers stream it in order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import _mulmod61
from .util import no_meta

MERSENNE61 = (1 << 61) - 1
_MULT = 6364136223846793005 % MERSENNE61   # Knuth LCG multiplier, reduced


def shuffle_hash(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """uint64 ``(((key mod P) + salt) mod P)·MULT mod P`` with P = 2^61-1,
    using FLOOR modulo (non-negative remainder) so negative keys hash the
    same here and in SQL — the HUGEINT expression is
    ``((((key % P) + P) % P + salt % P) % P * (6364136223846793005 % P)) %
    P`` (the ``+ P) % P`` wrapper lifts SQL's sign-preserving ``%`` to
    floor modulo; for non-negative keys both collapse to ``(key + salt) %
    P``). The salt enters BEFORE the multiply: the output then shifts by
    ``salt·MULT mod P``, whose wraparound reorders ~a third of all pairs
    even between adjacent salts (a purely additive post-multiply salt
    would only shift the ordering)."""
    k = np.asarray(keys).astype(np.int64)
    # numpy % on int64 is floor modulo (sign of divisor) — already
    # non-negative for the positive P
    r = (k % np.int64(MERSENNE61)
         + np.int64(salt % MERSENNE61)) % np.int64(MERSENNE61)
    return _mulmod61(r.astype(np.uint64), np.uint64(_MULT))


def deterministic_shuffle(ds, key: str, *, salt: int = 0,
                          hash_col: str | None = None):
    """→ ``ds`` globally re-ordered by ``h(key, salt)``. Keeps the hash
    as ``hash_col`` when given (int64 — h < 2^61 always fits), else drops
    it after the sort.

    Byte-identical ordering across runs/cluster sizes requires a UNIQUE
    key (doc_id, url): duplicate keys share a hash and Ray's sort orders
    ties by block arrival, which varies with parallelism."""
    col = hash_col or "__shuffle_h"

    def add_h(b: pa.Table) -> pa.Table:
        h = shuffle_hash(b.column(key).to_numpy(zero_copy_only=False), salt)
        return no_meta(b).append_column(col, pa.array(h.astype(np.int64)))

    out = ds.map_batches(add_h, batch_format="pyarrow").sort(col)
    if hash_col is None:
        out = out.drop_columns([col])
    return out
