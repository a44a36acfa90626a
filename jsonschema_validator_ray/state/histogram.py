"""Mergeable histograms + distribution-distance scores (PSI, KL).

Numeric histograms use FIXED bin edges decided up front (from the baseline or
a configured range) so per-partition partial histograms merge by element-wise
addition — the partial/final aggregation pattern of SURVEY.md §4.
Categorical histograms are value→count dicts with an explicit OTHER bucket.

PSI (population stability index) and KL divergence follow their standard
definitions with epsilon-smoothed proportions.
"""

from __future__ import annotations

import json

import numpy as np

_EPS = 1e-6


class NumericHistogram:
    __slots__ = ("edges", "counts", "n_null")

    def __init__(self, edges: np.ndarray, counts: np.ndarray | None = None,
                 n_null: int = 0):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = (np.asarray(counts, dtype=np.int64) if counts is not None
                       else np.zeros(len(self.edges) - 1, dtype=np.int64))
        self.n_null = n_null

    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        nulls = np.isnan(v)
        self.n_null += int(nulls.sum())
        v = v[~nulls]
        if v.size:
            c, _ = np.histogram(np.clip(v, self.edges[0], self.edges[-1]),
                                bins=self.edges)
            self.counts += c

    def merge(self, other: "NumericHistogram") -> "NumericHistogram":
        assert np.array_equal(self.edges, other.edges)
        self.counts += other.counts
        self.n_null += other.n_null
        return self

    def proportions(self) -> np.ndarray:
        total = self.counts.sum()
        if total == 0:
            return np.full(len(self.counts), 1.0 / len(self.counts))
        return self.counts / total

    def to_json(self) -> str:
        return json.dumps({"edges": self.edges.tolist(),
                           "counts": self.counts.tolist(),
                           "n_null": self.n_null})

    @classmethod
    def from_json(cls, s: str) -> "NumericHistogram":
        d = json.loads(s)
        return cls(np.array(d["edges"]), np.array(d["counts"]), d["n_null"])


class CategoricalHistogram:
    __slots__ = ("categories", "counts", "other", "n_null")

    def __init__(self, categories: list[str],
                 counts: np.ndarray | None = None,
                 other: int = 0, n_null: int = 0):
        self.categories = list(categories)
        self.counts = (np.asarray(counts, dtype=np.int64) if counts is not None
                       else np.zeros(len(self.categories), dtype=np.int64))
        self.other = other
        self.n_null = n_null

    def add_values(self, values) -> None:
        idx = {c: i for i, c in enumerate(self.categories)}
        for v in values:
            if v is None:
                self.n_null += 1
            elif v in idx:
                self.counts[idx[v]] += 1
            else:
                self.other += 1

    def add_counts(self, value_counts: dict[str, int]) -> None:
        idx = {c: i for i, c in enumerate(self.categories)}
        for v, n in value_counts.items():
            if v in idx:
                self.counts[idx[v]] += n
            else:
                self.other += n

    def merge(self, other: "CategoricalHistogram") -> "CategoricalHistogram":
        assert self.categories == other.categories
        self.counts += other.counts
        self.other += other.other
        self.n_null += other.n_null
        return self

    def proportions(self) -> np.ndarray:
        full = np.concatenate([self.counts, [self.other]])
        total = full.sum()
        if total == 0:
            return np.full(len(full), 1.0 / len(full))
        return full / total

    def to_json(self) -> str:
        return json.dumps({"categories": self.categories,
                           "counts": self.counts.tolist(),
                           "other": self.other, "n_null": self.n_null})

    @classmethod
    def from_json(cls, s: str) -> "CategoricalHistogram":
        d = json.loads(s)
        return cls(d["categories"], np.array(d["counts"]), d["other"], d["n_null"])


def psi(expected: np.ndarray, actual: np.ndarray) -> float:
    """Population stability index: Σ (a−e)·ln(a/e) over bucket proportions.
    Common rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 drifted."""
    e = np.clip(np.asarray(expected, dtype=np.float64), _EPS, None)
    a = np.clip(np.asarray(actual, dtype=np.float64), _EPS, None)
    e, a = e / e.sum(), a / a.sum()
    return float(np.sum((a - e) * np.log(a / e)))


def kl_divergence(p: np.ndarray, q: np.ndarray) -> float:
    """KL(p‖q) with epsilon smoothing."""
    p = np.clip(np.asarray(p, dtype=np.float64), _EPS, None)
    q = np.clip(np.asarray(q, dtype=np.float64), _EPS, None)
    p, q = p / p.sum(), q / q.sum()
    return float(np.sum(p * np.log(p / q)))
