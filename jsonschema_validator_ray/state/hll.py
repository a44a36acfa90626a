"""HyperLogLog distinct-count sketch (dense, numpy registers).

Standard HLL (Flajolet et al. 2007) with the small-range linear-counting
correction from the HLL++ paper (Heule et al. 2013, public). Mergeable by
register-wise max — partial sketches are emitted per batch inside
``map_batches`` and merged in a tiny final stage, so distinct counting never
funnels raw values through one process (SURVEY.md §4 "State (sketches)").

Hashing: 64-bit via ``pandas.util.hash_pandas_object`` (SipHash-ish with a
fixed default key — deterministic across processes, vectorized).
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> None:
        """Vectorized add of pre-computed uint64 hashes."""
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = (leading zeros of the remaining 64-p bits) + 1.
        # numpy has no clz; compute bit_length exactly via log2 on 32-bit
        # halves (values < 2^32 are exact in float64).
        w = h << np.uint64(self.p)
        hi32 = (w >> np.uint64(32)).astype(np.float64)
        lo32 = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
        bl = np.zeros(w.shape, dtype=np.int64)
        m_hi = hi32 > 0
        m_lo = (~m_hi) & (lo32 > 0)
        bl[m_hi] = 33 + np.floor(np.log2(hi32[m_hi])).astype(np.int64)
        bl[m_lo] = 1 + np.floor(np.log2(lo32[m_lo])).astype(np.int64)
        clz = 64 - bl  # w == 0 → clz 64
        rank = np.minimum(clz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_values(self, values) -> None:
        import pandas as pd

        h = pd.util.hash_pandas_object(pd.Series(values), index=False).to_numpy()
        self.add_hashes(h)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(est)

    # -- serialization (partial-aggregate rows carry these bytes) -----------

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        regs = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return cls(p=p, registers=regs)
