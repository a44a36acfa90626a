"""Fixture-table conformance stage: validate a table where EACH ROW carries
its own ``(value_json, schema_json)`` pair — the pipeline-level half of the
conformance strategy (FIXTURES.md §2: the keyword fixture table evaluated
both scalar-level and flowing through ray.data end-to-end).

Also generally useful: a corpus where documents declare their own schemas
(per-source contracts) validates in one actor-pool pass, schemas compiled
once per distinct string per actor (the reference's schema cache,
`/root/reference/validator/validator.go:296-313`, as actor state).
"""

from __future__ import annotations

import pyarrow as pa

from ..errors import Mode, SchemaError
from ..value_engine import Options, ValueEngine


class CaseValidator:
    """Actor: rows of (case_id, value_json, schema_json) → verdict rows
    (case_id, valid, error_count, tags)."""

    def __init__(self, mode: Mode = Mode.STRICT,
                 case_col: str = "case_id", value_col: str = "value_json",
                 schema_col: str = "schema_json"):
        self.engine = ValueEngine(Options(mode=mode))  # enable_caching=True
        self.case_col = case_col
        self.value_col = value_col
        self.schema_col = schema_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, valids, counts, tags = [], [], [], []
        for row in batch.to_pylist():
            ids.append(row[self.case_col])
            try:
                r = self.engine.validate_json(row[self.value_col],
                                              row[self.schema_col])
                valids.append(r.valid)
                counts.append(r.error_count)
                tags.append(sorted(r.tags()))
            except SchemaError:
                valids.append(False)
                counts.append(1)
                tags.append(["schema-error"])
        return pa.table({
            self.case_col: pa.array(ids),
            "valid": pa.array(valids),
            "error_count": pa.array(counts, type=pa.int32()),
            "tags": pa.array(tags, type=pa.list_(pa.string())),
        })
