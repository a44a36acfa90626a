"""Row-level validation stages (Ray Data map_batches).

Two regimes (SURVEY.md §1.3):

- **Typed-column regime** (:class:`BatchValidator`): a :class:`TablePlan` of
  vectorized Arrow predicates evaluated over zero-copy ``pyarrow`` batches.
  One pass emits BOTH per-row verdicts and a ``violations: list<struct>``
  column; :func:`flatten_violations` explodes the list column into the
  violations table ``(key, constraint_id, column, tag, message)`` and
  :func:`verdicts_only` projects the verdicts table — so the input is read
  once even when both outputs are consumed (write the combined output, or
  branch the Dataset; each violation row costs a few strings, never the
  full document).

- **Dynamic-JSON regime** (:class:`JsonColumnValidator`): a string column of
  nested JSON documents validated per row by the conformance
  :class:`~jsonschema_validator_ray.value_engine.ValueEngine` — schema
  compiled ONCE in the actor's ``__init__`` (the reference re-uses its
  compiled schema through a cache, `/root/reference/validator/validator.go:296-313`;
  here the actor pool IS the cache), rows looped inside the batch (this
  regime is inherently per-document, like the reference itself).

Both are callable classes → Ray actor pools: pass
``concurrency=N, batch_size=B`` to ``map_batches``; setup cost (plan
compile, regex compile) is paid once per actor, not per batch.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..errors import Mode
from ..plan import TablePlan, compile_table_plan, evaluate_plan
from ..schema import CompiledSchema, schema_to_json
from ..value_engine import Options, ValueEngine

VIOLATION_TYPE = pa.struct([
    ("constraint_id", pa.string()),
    ("column", pa.string()),
    ("path", pa.string()),
    ("tag", pa.string()),
    ("message", pa.string()),
    ("value", pa.string()),
])


def _stringify_cells(batch: pa.Table, column: str,
                     rows: "np.ndarray") -> list[str | None]:
    """Offending cell values as strings (for violation rows); missing column
    → nulls. Only the failing rows are gathered and cast. Dotted paths
    resolve through struct fields."""
    from ..plan import _get_col

    col = _get_col(batch, column)
    if col is None:
        return [None] * len(rows)
    taken = col.take(pa.array(rows))
    try:
        return pc.cast(taken, pa.string()).to_pylist()
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return [None if v is None else str(v) for v in taken.to_pylist()]


def build_violations_column(batch: pa.Table, n: int,
                            fails: "list[np.ndarray]",
                            meta: "list[tuple[str, str, str, str]]",
                            *, skip_value_columns: frozenset = frozenset(),
                            message_fns: "list | None" = None,
                            tag_fns: "list | None" = None
                            ) -> pa.ListArray:
    """Per-row violations list column, no Python row loop: concatenate
    per-constraint failure index arrays, sort by row, wrap as a ListArray
    over gathered struct children. ``meta[i] = (constraint_id, column, tag,
    message)`` for constraint i; offending values are gathered per column
    (skip binary payload columns via ``skip_value_columns``).
    ``message_fns[i]`` (optional, ``(batch, rows) -> list[str]``) overrides
    constraint i's static message per failing row — used by keywords whose
    reference wording embeds the observed value. Shared by the generic
    BatchValidator and the fused WebtextValidator."""
    idx_parts, const_parts = [], []
    for ci, failed in enumerate(fails):
        if failed.size:
            idx_parts.append(failed)
            const_parts.append(np.full(failed.size, ci, dtype=np.int64))
    if not idx_parts:
        return pa.array([[]] * n, type=pa.list_(VIOLATION_TYPE))
    rows = np.concatenate(idx_parts)
    consts = np.concatenate(const_parts)
    order = np.argsort(rows, kind="stable")
    rows, consts = rows[order], consts[order]
    counts = np.bincount(rows, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    values: list[str | None] = [None] * len(rows)
    by_col: dict[str, list[int]] = {}
    for j, c in enumerate(consts):
        col = meta[c][1]
        if col not in skip_value_columns:
            by_col.setdefault(col, []).append(j)
    for colname, positions in by_col.items():
        cells = _stringify_cells(batch, colname, rows[np.asarray(positions)])
        for p, v in zip(positions, cells):
            values[p] = v
    messages: list[str] = [meta[c][3] for c in consts]
    if message_fns is not None:
        for ci, fn in enumerate(message_fns):
            if fn is None:
                continue
            pos = np.flatnonzero(consts == ci)
            if pos.size:
                for p, msg in zip(pos, fn(batch, rows[pos])):
                    messages[p] = msg
    tags: list[str] = [meta[c][2] for c in consts]
    if tag_fns is not None:
        # per-row tag override — items rows report the failing CHILD keyword
        for ci, fn in enumerate(tag_fns):
            if fn is None:
                continue
            pos = np.flatnonzero(consts == ci)
            if pos.size:
                for p, tag in zip(pos, fn(batch, rows[pos])):
                    tags[p] = tag
    struct = pa.StructArray.from_arrays(
        [pa.array([meta[c][0] for c in consts]),
         pa.array([meta[c][1] for c in consts]),
         pa.array([f"$.{meta[c][1]}" for c in consts]),
         pa.array(tags, type=pa.string()),
         pa.array(messages, type=pa.string()),
         pa.array(values, type=pa.string())],
        fields=list(VIOLATION_TYPE))
    return pa.ListArray.from_arrays(pa.array(offsets), struct)


class BatchValidator:
    """Actor-pool stage: ``pa.Table`` batch → verdicts + violations-list.

    Output schema: ``(key, valid: bool, error_count: int32,
    violations: list<struct<constraint_id, column, path, tag, message,
    value>>)``.
    """

    def __init__(self, table_schema: dict | str, key_column: str,
                 mode: Mode = Mode.STRICT,
                 arrow_schema: pa.Schema | None = None,
                 registry=None, stop_on_first_error: bool = False,
                 allow_unknown_fields: bool = False):
        from ..plan import plan_needs_arrow_schema

        self.key_column = key_column
        self.stop_on_first_error = stop_on_first_error
        self._compile_args = (table_schema, key_column, mode, registry,
                              allow_unknown_fields)
        if arrow_schema is None and plan_needs_arrow_schema(table_schema,
                                                           mode):
            # patternProperties / additionalProperties resolve COLUMN NAMES:
            # compile lazily from the first batch's schema (assumes stable
            # block schemas — the per-keyword kernels still handle missing
            # columns gracefully on later batches)
            self.plan = None
        else:
            # compiled once per actor (never per batch)
            self.plan = compile_table_plan(
                table_schema, key_column, arrow_schema=arrow_schema,
                mode=mode, registry=registry,
                allow_unknown_fields=allow_unknown_fields)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.plan is None:
            schema, key, mode, registry, auf = self._compile_args
            self.plan = compile_table_plan(
                schema, key, arrow_schema=batch.schema, mode=mode,
                registry=registry, allow_unknown_fields=auf)
        plan = self.plan
        n = batch.num_rows
        valid, error_count, fails = evaluate_plan(
            plan, batch, stop_on_first=self.stop_on_first_error)
        meta = [(c.constraint_id, c.column, c.tag, c.message)
                for c in plan.constraints]
        viol = build_violations_column(
            batch, n, fails, meta,
            message_fns=[c.message_fn for c in plan.constraints],
            tag_fns=[c.tag_fn for c in plan.constraints])
        return pa.table({
            self.key_column: batch.column(self.key_column),
            "valid": pa.array(valid),
            "error_count": pa.array(error_count, type=pa.int32()),
            "violations": viol,
        })


class JsonColumnValidator:
    """Actor-pool stage for nested/dynamic JSON documents held in a string
    column. Same output schema as :class:`BatchValidator`."""

    def __init__(self, schema: dict | str | CompiledSchema, key_column: str,
                 json_column: str, mode: Mode = Mode.STRICT,
                 stop_on_first_error: bool = False):
        from ..schema import compile_schema

        if isinstance(schema, CompiledSchema):
            schema = schema_to_json(schema)
        self.compiled = compile_schema(schema, mode)
        self.engine = ValueEngine(Options(mode=mode,
                                          stop_on_first_error=stop_on_first_error))
        self.key_column = key_column
        self.json_column = json_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        docs = batch.column(self.json_column).to_pylist()
        valid = np.ones(len(docs), dtype=bool)
        counts = np.zeros(len(docs), dtype=np.int32)
        viols: list[list[dict[str, Any]]] = []
        for i, doc in enumerate(docs):
            if doc is None:
                viols.append([])
                continue
            try:
                value = json.loads(doc)
            except json.JSONDecodeError:
                valid[i] = False
                counts[i] = 1
                viols.append([{"constraint_id": "parse:$", "column": self.json_column,
                               "path": "$", "tag": "parse",
                               "message": "invalid JSON document", "value": None}])
                continue
            r = self.engine.validate(value, self.compiled)
            valid[i] = r.valid
            counts[i] = r.error_count
            viols.append([
                {"constraint_id": e.constraint_id, "column": self.json_column,
                 "path": e.path, "tag": e.tag, "message": e.message,
                 "value": None if e.value is None else str(e.value)[:256]}
                for e in r.errors
            ])
        return pa.table({
            self.key_column: batch.column(self.key_column),
            "valid": pa.array(valid),
            "error_count": pa.array(counts, type=pa.int32()),
            "violations": pa.array(viols, type=pa.list_(VIOLATION_TYPE)),
        })


def validate_dataset(ds, table_schema: dict | str, key_column: str,
                     mode: Mode = Mode.STRICT, *,
                     batch_size: int | None = 32768,
                     concurrency: int | None = None,
                     num_cpus: float = 1.0):
    """Run the typed-column plan over a Dataset → combined verdicts dataset.

    Stateless-task form by default (the plan is tiny and pure); pass
    ``concurrency=N`` to pin an actor pool instead — worth it when the plan
    carries heavy state (large enums / broadcast dictionaries).
    """
    arrow_schema = None
    try:
        s = ds.schema()
        arrow_schema = getattr(s, "base_schema", None)
        if arrow_schema is not None and not isinstance(arrow_schema, pa.Schema):
            arrow_schema = None
    except Exception:
        pass  # schema unavailable without execution → runtime dispatch
    kwargs: dict[str, Any] = dict(batch_format="pyarrow", batch_size=batch_size,
                                  num_cpus=num_cpus)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        return ds.map_batches(
            BatchValidator,
            fn_constructor_args=(table_schema, key_column, mode, arrow_schema),
            **kwargs)
    validator = BatchValidator(table_schema, key_column, mode, arrow_schema)
    return ds.map_batches(validator, **kwargs)


def flatten_violations(combined_ds):
    """Combined verdicts dataset → violations table
    ``(key, constraint_id, column, tag, message)`` (keyed per north star)."""

    def explode(batch: pa.Table) -> pa.Table:
        key_name = batch.column_names[0]
        viol = batch.column("violations")
        if isinstance(viol, pa.ChunkedArray):
            viol = viol.combine_chunks()
        parent = pc.list_parent_indices(viol)
        flat = pc.list_flatten(viol)
        key = batch.column(key_name).take(parent)
        out = {key_name: key}
        for f in VIOLATION_TYPE:
            out[f.name] = pc.struct_field(flat, f.name)
        return pa.table(out)

    return combined_ds.map_batches(explode, batch_format="pyarrow")


def verdicts_only(combined_ds):
    return combined_ds.drop_columns(["violations"])
