"""Cross-column row rules: the reference's comparator DSL (eq/ne/gt/ge/lt/le,
`registry.py` §2.3 / reference ``rules/rule.go`` comparators) lifted from
value-vs-constant to COLUMN-vs-column (or column-vs-constant) table
constraints, compiled to vectorized Arrow predicates — the multi-column
invariant checks (ship<=receipt, qty>0, price>=qty …) a schema keyed on one
column at a time cannot express.

Null semantics match SQL's ``WHERE NOT (l op r)``: a null on either side is
never a violation (``required``/`NOT NULL` checks own nulls), so the
violation mask is ``valid(l) AND valid(r) AND NOT op(l, r)``.

Each rule filters the batch once with one Arrow kernel; output is the
unified violations shape (key columns…, constraint_id) — one row per
violated rule per input row, streaming (no shuffle, no materialization).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

_OPS = {
    "eq": pc.equal, "ne": pc.not_equal,
    "gt": pc.greater, "ge": pc.greater_equal,
    "lt": pc.less, "le": pc.less_equal,
}


def _resolve(batch: pa.Table, side: Any):
    """A string names a column; {"const": v} is a literal scalar."""
    if isinstance(side, str):
        return batch.column(side), True
    if isinstance(side, Mapping) and "const" in side:
        return pa.scalar(side["const"]), False
    raise ValueError(f"rule side must be a column name or {{'const': v}}, "
                     f"got {side!r}")


class RowRuleValidator:
    """Actor stage: compile ``rules`` once per actor, emit violations per
    batch. ``rules`` is a sequence of mappings with keys
    ``id`` (constraint id), ``left``, ``op`` (eq|ne|gt|ge|lt|le),
    ``right`` — sides are column names or ``{"const": value}``."""

    def __init__(self, rules: Sequence[Mapping[str, Any]],
                 key_cols: Sequence[str]):
        for r in rules:
            if r["op"] not in _OPS:
                raise ValueError(f"unknown op {r['op']!r}; "
                                 f"expected one of {sorted(_OPS)}")
        self.rules = list(rules)
        self.key_cols = list(key_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for r in self.rules:
            left, l_col = _resolve(batch, r["left"])
            right, r_col = _resolve(batch, r["right"])
            ok = _OPS[r["op"]](left, right)
            # a null on either side makes ok null (Arrow comparison
            # kernels propagate), so fill_null(False) alone implements
            # "absent side ⇒ no violation" — no per-row Python mask.
            # const-vs-const is the one case where ok is a SCALAR and
            # needs explicit broadcast.
            if not l_col and not r_col:
                v = ok.as_py()   # null const compares to null → no violation
                ok = pa.array([True if v is None else bool(v)]
                              * batch.num_rows)
            bad = pc.fill_null(pc.invert(ok), False)
            sub = batch.filter(bad)
            cols = {c: sub.column(c) for c in self.key_cols}
            cols["constraint_id"] = pa.array([r["id"]] * sub.num_rows,
                                             type=pa.string())
            outs.append(pa.table(cols))
        if not outs:
            return pa.table({c: pa.array([]) for c in
                             self.key_cols + ["constraint_id"]})
        return pa.concat_tables(outs)


def row_rule_violations(ds, rules: Sequence[Mapping[str, Any]],
                        key_cols: Sequence[str], *,
                        batch_size: int = 65536,
                        concurrency: int = 2):
    """→ Dataset ``(key_cols…, constraint_id)`` of every rule violation."""
    return ds.map_batches(
        RowRuleValidator, fn_constructor_args=(rules, key_cols),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))
