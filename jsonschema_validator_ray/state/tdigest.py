"""t-digest quantile sketch (Dunning & Ertl 2019, public algorithm).

Simplified merging-digest variant: buffer values, sort, and merge into at
most ``max_centroids`` centroids using the k1 scale-function size limits.
Mergeable: concatenate centroids and re-compress — partial digests are
emitted per batch and merged in the final stage.

Accuracy is quantile-dependent (tight at the tails); tests assert error
bounds against exact quantiles rather than equality.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("compression", "means", "weights")

    def __init__(self, compression: float = 100.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.compression = compression
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)

    # -- build ---------------------------------------------------------------

    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(v.size)])
        if self.means.size > 8 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="mergesort")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        # k1 scale function: centroid may absorb while q-span stays within
        # one k-unit; k(q) = (c/(2π)) asin(2q-1)
        c = self.compression
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0

        def k(q):
            return c / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

        for i in range(1, means.size):
            q0 = w_so_far / total
            q1 = (w_so_far + cur_w + weights[i]) / total
            if k(q1) - k(q0) <= 1.0:
                new_w = cur_w + weights[i]
                cur_m = cur_m + (means[i] - cur_m) * (weights[i] / new_w)
                cur_w = new_w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    # -- query ---------------------------------------------------------------

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(w) - w / 2.0
        target = q * total
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = np.searchsorted(cum, target) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    # -- serialization -------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._compress()
        arr = np.concatenate([[self.compression], self.means, self.weights])
        n = self.means.size
        return np.concatenate([[float(n)], arr]).astype(np.float64).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        arr = np.frombuffer(b, dtype=np.float64)
        n = int(arr[0])
        compression = arr[1]
        means = arr[2:2 + n].copy()
        weights = arr[2 + n:2 + 2 * n].copy()
        return cls(compression=compression, means=means, weights=weights)
