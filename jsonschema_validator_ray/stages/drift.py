"""Distribution-drift checks: per-partition histograms → merge → PSI / KL
against a baseline histogram.

North-star component: "KL/PSI distribution-drift checks against a baseline
histogram".

Pattern: fixed bin edges / category lists come from the BASELINE (so partial
histograms merge by addition); a ``map_batches`` stage emits one serialized
partial histogram per batch; a tiny final reduce merges them and scores
PSI / KL. Output is a dataset-level violation record when the score crosses
the threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..state.histogram import (
    CategoricalHistogram,
    NumericHistogram,
    kl_divergence,
    psi,
)


@dataclass
class DriftReport:
    column: str
    psi: float
    kl: float
    threshold: float
    drifted: bool
    current_hist: str
    baseline_hist: str


def _hist_partial(column: str, baseline_json: str):
    import json as _json

    numeric = "edges" in _json.loads(baseline_json)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if numeric:
            h = NumericHistogram.from_json(baseline_json)
            h.counts = np.zeros_like(h.counts)
            h.n_null = 0
            h.add_values(col.to_numpy(zero_copy_only=False).astype(np.float64)
                         if col.null_count == 0 else
                         col.to_pandas().to_numpy(dtype=np.float64, na_value=np.nan))
        else:
            h = CategoricalHistogram.from_json(baseline_json)
            h.counts = np.zeros_like(h.counts)
            h.other = 0
            h.n_null = 0
            vc = col.drop_null().value_counts()
            h.add_counts({str(x["values"]): x["counts"] for x in vc.to_pylist()})
            h.n_null = col.null_count
        return pa.table({"hist": [h.to_json()]})

    return fn


def compute_histogram(ds, column: str, baseline_json: str):
    """→ merged histogram (same shape as baseline) for ``column``."""
    import json as _json

    numeric = "edges" in _json.loads(baseline_json)
    partials = ds.select_columns([column]).map_batches(
        _hist_partial(column, baseline_json), batch_format="pyarrow")
    cls = NumericHistogram if numeric else CategoricalHistogram
    merged = None
    # The partials dataset is tiny (one row per batch) — iterate on driver.
    for b in partials.iter_batches(batch_format="pyarrow"):
        for s in b.column("hist").to_pylist():
            h = cls.from_json(s)
            merged = h if merged is None else merged.merge(h)
    if merged is None:
        merged = cls.from_json(baseline_json)
        merged.counts = np.zeros_like(merged.counts)
        merged.n_null = 0
        if hasattr(merged, "other"):
            merged.other = 0  # baseline's OTHER mass must not leak
    return merged


def drift_check(ds, column: str, baseline_json: str, *,
                threshold: float = 0.25) -> DriftReport:
    """PSI/KL of ``column``'s current distribution vs the baseline histogram.
    PSI > threshold (default 0.25, the common 'significant shift' rule)
    flags drift."""
    current = compute_histogram(ds, column, baseline_json)
    cls = type(current)
    baseline = cls.from_json(baseline_json)
    p = baseline.proportions()
    q = current.proportions()
    score_psi = psi(p, q)
    score_kl = kl_divergence(q, p)
    return DriftReport(
        column=column, psi=score_psi, kl=score_kl, threshold=threshold,
        drifted=score_psi > threshold,
        current_hist=current.to_json(), baseline_hist=baseline_json)
