"""Count-min sketch: mergeable approximate frequency counts.

Standard CMS (Cormode & Muthukrishnan 2005, public): ``d`` rows of ``w``
counters; an item increments one counter per row (chosen by independent
hashes); the estimate is the minimum over rows — always an OVERestimate,
with error ≤ ε·N (ε = e/w) at probability ≥ 1-δ (δ = e^-d). Mergeable by
element-wise sum, so per-batch partials fold in a tiny final stage and raw
values never funnel through one process — the frequency-sketch sibling of
``state/hll.py`` (distinct) and ``state/tdigest.py`` (quantiles).

Hashing: one 64-bit ``hash_pandas_object`` pass per batch; the ``d``
row-hashes derive from it with the Mersenne-61 multiply-mix family used
elsewhere in the repo (no per-row Python, no re-hash per row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_P61 = np.uint64((1 << 61) - 1)


class CountMinSketch:
    __slots__ = ("depth", "width", "table", "n", "_a", "_b")

    def __init__(self, depth: int = 5, width: int = 16384,
                 table: np.ndarray | None = None, n: int = 0,
                 seed: int = 1234):
        self.depth = depth
        self.width = width
        self.table = (table if table is not None
                      else np.zeros((depth, width), dtype=np.int64))
        self.n = n
        rng = np.random.default_rng(seed)
        self._a = rng.integers(1, 1 << 61, size=depth, dtype=np.uint64)
        self._b = rng.integers(0, 1 << 61, size=depth, dtype=np.uint64)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices from base hashes — multiply-mix mod
        2^64 then reduce; wraparound multiplication is the mixer."""
        h = h.astype(np.uint64, copy=False)
        idx = np.empty((self.depth, len(h)), dtype=np.int64)
        for i in range(self.depth):
            v = h * self._a[i] + self._b[i]          # wraps mod 2^64
            v ^= v >> np.uint64(33)
            idx[i] = (v % np.uint64(self.width)).astype(np.int64)
        return idx

    def add_values(self, values, counts: np.ndarray | None = None) -> None:
        s = pd.Series(values)
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        c = (np.ones(len(h), dtype=np.int64) if counts is None
             else np.asarray(counts, dtype=np.int64))
        idx = self._indices(h)
        for i in range(self.depth):
            np.add.at(self.table[i], idx[i], c)
        self.n += int(c.sum())

    def estimate(self, values) -> np.ndarray:
        """Point-query estimates (≥ true count, ≤ true + e/width·N whp)."""
        s = pd.Series(values)
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        idx = self._indices(h)
        ests = np.stack([self.table[i][idx[i]] for i in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.table += other.table
        self.n += other.n
        return self

    # ---- wire format (partial rows through the object store) -------------
    def to_bytes(self) -> bytes:
        head = np.array([self.depth, self.width, self.n], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, seed: int = 1234) -> "CountMinSketch":
        head = np.frombuffer(b[:24], dtype=np.int64)
        depth, width, n = int(head[0]), int(head[1]), int(head[2])
        table = np.frombuffer(b[24:], dtype=np.int64) \
            .reshape(depth, width).copy()
        return cls(depth, width, table=table, n=n, seed=seed)
