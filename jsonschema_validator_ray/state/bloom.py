"""Bloom filter: mergeable approximate set membership.

Classic Bloom (1970) with Kirsch–Mitzenmacher double hashing (public):
``k`` bit positions per item derived as ``h1 + i·h2 mod m`` from one
64-bit base-hash pass — no false NEGATIVES ever, false-positive rate
≈ (1 - e^{-kn/m})^k. Mergeable by bitwise OR, so per-batch partials fold
in a tiny final stage; the wire format is the raw bit array.

Sizing: ``bits_for(n, fp)`` gives m = -n·ln(fp)/ln(2)^2 and the optimal
k = m/n·ln(2) — e.g. 10^9 dimension keys at 1% FP is ~1.2 GB, broadcast
once per node via ``ray.put`` instead of shuffling a 10^12-row fact side.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def bits_for(n: int, fp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``n`` items at false-positive rate ``fp``;
    m is rounded up to a multiple of 64."""
    m = max(64, int(math.ceil(-n * math.log(fp) / (math.log(2) ** 2))))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / max(n, 1) * math.log(2)))
    return m, k


class BloomFilter:
    __slots__ = ("m", "k", "words")

    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        assert m_bits % 64 == 0
        self.m = m_bits
        self.k = k
        self.words = (words if words is not None
                      else np.zeros(m_bits // 64, dtype=np.uint64))

    def _positions(self, values) -> np.ndarray:
        """(k, n) bit positions via double hashing from one hash pass."""
        s = pd.Series(values)
        h1 = pd.util.hash_pandas_object(s, index=False).to_numpy() \
            .astype(np.uint64)
        h2 = h1 * np.uint64(0x9E3779B97F4A7C15)      # wraps mod 2^64
        h2 ^= h2 >> np.uint64(29)
        h2 |= np.uint64(1)                           # odd → full-period step
        idx = np.empty((self.k, len(h1)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
        return idx

    def add_values(self, values) -> None:
        pos = self._positions(values)
        words = (pos >> np.uint64(6)).ravel()
        bits = np.uint64(1) << (pos & np.uint64(63)).ravel()
        np.bitwise_or.at(self.words, words.astype(np.int64), bits)

    def contains(self, values) -> np.ndarray:
        """Vectorized membership: True = maybe present (FP possible),
        False = DEFINITELY absent."""
        pos = self._positions(values)
        out = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.k):
            w = self.words[(pos[i] >> np.uint64(6)).astype(np.int64)]
            out &= (w >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m, self.k) == (other.m, other.k)
        self.words |= other.words
        return self

    def to_bytes(self) -> bytes:
        head = np.array([self.m, self.k], dtype=np.int64)
        return head.tobytes() + self.words.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        head = np.frombuffer(b[:16], dtype=np.int64)
        words = np.frombuffer(b[16:], dtype=np.uint64).copy()
        return cls(int(head[0]), int(head[1]), words)
