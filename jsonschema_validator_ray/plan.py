"""Column-regime constraint plan: declarative schema → vectorized Arrow predicates.

This is the 100-TB hot path. A table schema in the same DSL as the value
engine (top-level ``required`` + ``properties`` mapping COLUMN names to
per-column keyword schemas) compiles ONCE on the driver into a
:class:`TablePlan` — a list of closures ``pa.Table -> pa.BooleanArray``
(True = row passes). The plan is shipped to workers once (actor ``__init__``
/ closure capture), never per batch; every kernel is ``pyarrow.compute``
(zero-copy from the object store) with no Python loop over rows except the
documented per-row format fallbacks (email parity etc.).

Reference mapping (SURVEY.md §2.1 right column): the reference evaluates one
``RuleFunc`` per document node (`/root/reference/rules/rule.go:12`); here each
(column, keyword) pair becomes one vectorized predicate over the whole batch.

Null semantics in the column regime: a NULL cell = "property absent", so
scalar constraints PASS on null (JSON-Schema applies keywords only to present
values — the reference's ``properties`` recursion skips absent properties,
`/root/reference/validator/validator.go:407`), and ``required`` = not-null
(`pc.is_valid`). A column missing from the table entirely fails ``required``
for every row.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .errors import Mode, SchemaError
from .formats import FORMAT_VALIDATORS
from .schema import METADATA_KEYS, CompiledSchema, compile_schema
from .value_engine import _gofmt

MaskFn = Callable[[pa.Table], pa.Array]

from .formats import EMAIL_RE, HOSTNAME_RE, UUID_RE

# Formats with a fully vectorized Arrow implementation; the rest fall back to
# the scalar functions in formats.py applied per row (still batched).
# Patterns are DERIVED from formats.py's compiled regexes — one source of
# truth, so a scalar-side fix can never silently diverge from the
# vectorized column regime.
_VEC_FORMAT_REGEX = {
    "uuid": UUID_RE.pattern,
    "hostname": HOSTNAME_RE.pattern,
    "ipv4": (r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
             r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"),
    "email": EMAIL_RE.pattern,
}

_ARROW_OK = {
    "string": (pa.types.is_string, pa.types.is_large_string),
    "number": (pa.types.is_floating, pa.types.is_integer),
    "integer": (pa.types.is_integer,),
    "boolean": (pa.types.is_boolean,),
    "array": (pa.types.is_list, pa.types.is_large_list),
    "object": (pa.types.is_struct, pa.types.is_map),
    "null": (pa.types.is_null,),
}


@dataclass
class CompiledConstraint:
    """One vectorized predicate. ``constraint_id`` keys violation rows per the
    north star ``(key, constraint_id)``.

    ``count_fn`` (optional) returns per-row VIOLATION COUNTS (int array, 0 =
    pass) for keywords whose dynamic-regime error count exceeds one per row
    (``items`` accumulates one error per failing element,
    `/root/reference/validator/validator.go:543-545`). ``message_fn``
    (optional, ``(batch, rows) -> list[str]``) renders per-row messages for
    keywords whose reference wording embeds the observed value
    (type/multipleOf/min-maxProperties) — keeps violation text identical
    across regimes (ADVICE r1)."""

    constraint_id: str
    column: str
    tag: str
    message: str
    param: str
    fn: MaskFn  # returns pass-mask aligned with the batch (no nulls)
    count_fn: Callable[[pa.Table], np.ndarray] | None = None
    message_fn: Callable[[pa.Table, np.ndarray], list] | None = None
    # per-row TAG override (``(batch, rows) -> list[str]``): ``items`` rows
    # report the failing CHILD keyword (minimum/type/…) like the value
    # engine's per-element recursion (`/root/reference/rules/array.go:43-76`)
    # instead of a blanket "items"
    tag_fn: Callable[[pa.Table, np.ndarray], list] | None = None

    def pass_mask(self, batch: pa.Table) -> pa.Array:
        m = self.fn(batch)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return m


@dataclass
class TablePlan:
    """Compiled plan for one table. ``key_column`` identifies rows in verdict
    / violation output (``url`` for webtext, ``doc_id`` for documents...)."""

    key_column: str
    constraints: list[CompiledConstraint] = field(default_factory=list)

    @property
    def constraint_ids(self) -> list[str]:
        return [c.constraint_id for c in self.constraints]


def _str_col(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return col
    return pc.cast(col, pa.large_string())



def _map_lookup(col: pa.Array, name: str) -> pa.Array | None:
    """Value of the FIRST entry whose key equals ``name``, per row of a
    map-typed array — vectorized (flat key compare + first-occurrence
    scatter + one take with null indices). Null where the key is absent or
    the row is null, which plugs map columns into the same null≡absent
    kernel semantics as struct fields for VALUE keywords. PRESENCE keywords
    (required, list-form dependencies) use `_map_has_key` instead, where a
    null-valued entry IS a present key — the documented presence contract
    (`_present_col`)."""
    t = col.type
    if not (pa.types.is_string(t.key_type)
            or pa.types.is_large_string(t.key_type)):
        return None
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    keys, items = col.keys, col.items
    # NOTE: pc.list_parent_indices ABORTS on MapArray in this Arrow build
    # (C++ type check) — derive parents from the offsets buffer instead.
    # keys/items are the RAW child arrays, so positions stay in raw
    # coordinates throughout.
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base, endp = off[0], off[-1]
    m = pc.fill_null(pc.equal(keys, name), False).to_numpy(
        zero_copy_only=False)
    pos = np.flatnonzero(m[base:endp]) + base
    idx = np.full(n, -1, dtype=np.int64)
    if pos.size:
        par = np.searchsorted(off, pos, side="right") - 1
        first = np.r_[True, par[1:] != par[:-1]]   # parents are ascending
        idx[par[first]] = pos[first]
    if col.null_count:
        idx[np.asarray(col.is_null())] = -1
    ind = pa.array(idx, mask=(idx < 0))
    return items.take(ind)


def _map_has_key(col: pa.Array, name: str) -> pa.Array:
    """Per-row KEY MEMBERSHIP in a map column (vectorized, offsets-derived
    parents — see `_map_lookup` for why not ``pc.list_parent_indices``).
    Unlike `_map_lookup`, a null-VALUED entry still counts as present —
    this is the value-engine dict contract for presence keywords
    (``required``, list-form ``dependencies``): ``{"a": None}`` HAS key
    "a". Null rows are not-present."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base, endp = off[0], off[-1]
    m = pc.fill_null(pc.equal(col.keys, name), False).to_numpy(
        zero_copy_only=False)
    pos = np.flatnonzero(m[base:endp]) + base
    has = np.zeros(n, dtype=bool)
    if pos.size:
        has[np.searchsorted(off, pos, side="right") - 1] = True
    if col.null_count:
        has[np.asarray(col.is_null())] = False
    return pa.array(has)


def _present_col(batch: pa.Table, path: str) -> pa.Array | None:
    """Per-row PRESENCE of a (possibly dotted) property under the value
    engine's dict semantics — the map-column presence CONTRACT (VERDICT r2
    item 7):

    - property reached through a MAP parent → presence = key membership
      (maps can express ``{"a": null}`` vs ``{}``, so a null-valued entry
      is PRESENT, exactly like a Python dict in the VE);
    - struct fields / plain columns → presence = non-null value (Arrow
      structs cannot distinguish a null field from an absent one — the
      documented null≡absent rule);
    - None when the top-level column is missing from the batch entirely.

    Value keywords (minLength, minimum, schema-form dependencies, …) keep
    operating on the VALUE, so a null-valued map entry still validates as
    absent for those — presence keywords are where dicts and the column
    regime now agree."""
    if "." in path:
        parent_path, _, last = path.rpartition(".")
        parent = _get_col(batch, parent_path)
        if parent is not None:
            if isinstance(parent, pa.ChunkedArray):
                parent = parent.combine_chunks()
            if pa.types.is_map(parent.type) and (
                    pa.types.is_string(parent.type.key_type)
                    or pa.types.is_large_string(parent.type.key_type)):
                return _map_has_key(parent, last)
    col = _get_col(batch, path)
    if col is None:
        return None
    return pc.fill_null(pc.is_valid(col), False)


def _get_col(batch: pa.Table, path: str):
    """Resolve a (possibly dotted) column path: ``a.b.c`` descends struct
    fields via ``pc.struct_field`` and MAP entries via a vectorized
    key-lookup — a null ancestor yields null leaves, which the
    null-passes-as-absent semantics already handle. Returns None when the
    top-level column is missing."""
    if "." not in path:
        if path not in batch.column_names:
            return None
        return batch.column(path)
    head, _, rest = path.partition(".")
    if head not in batch.column_names:
        return None
    col = batch.column(head)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for seg in rest.split("."):
        if pa.types.is_struct(col.type):
            try:
                col = pc.struct_field(col, seg)
            except (KeyError, pa.ArrowInvalid):
                # pyarrow raises ArrowInvalid ("No match for FieldRef") for a
                # field name absent from the struct type — absent field, not
                # a crash
                return None
        elif pa.types.is_map(col.type):
            col = _map_lookup(col, seg)
            if col is None:
                return None
        else:
            return None
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    return col

def _pass_on_null(col, mask):
    """Scalar constraints pass on null cells (absent property)."""
    return pc.fill_null(pc.or_kleene(pc.is_null(col), mask), True)


def _all_const(n_fn_input_ignored: bool):
    val = n_fn_input_ignored

    def fn(batch: pa.Table) -> pa.Array:
        return pa.array(np.full(batch.num_rows, val, dtype=bool))

    return fn


def _byte_length(col):
    # pc.binary_length counts BYTES on string arrays (Go len(str) parity,
    # `/root/reference/rules/string.go:29`); pc.utf8_length would count
    # codepoints — wrong here. Binary columns measure directly — casting
    # them to string would VALIDATE UTF-8 and crash on junk bytes.
    t = col.type
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pc.binary_length(col)
    return pc.binary_length(_str_col(col))


def _format_mask(col, fmt: str):
    rx = _VEC_FORMAT_REGEX.get(fmt)
    s = _str_col(col)
    if fmt == "uuid":
        return pc.match_substring_regex(pc.utf8_lower(s), rx)
    if fmt == "hostname":
        return pc.and_kleene(
            pc.match_substring_regex(s, rx),
            pc.less_equal(pc.binary_length(s), 255),
        )
    if rx is not None:
        return pc.match_substring_regex(s, rx)
    if fmt in ("date", "time"):
        # strptime rolls invalid dates over (2023-02-30 → 2023-03-02), so
        # round-trip through strftime and require byte equality.
        f = "%Y-%m-%d" if fmt == "date" else "%H:%M:%S"
        parsed = pc.strptime(s, format=f, unit="us", error_is_null=True)
        back = pc.strftime(parsed, format=f)
        return pc.and_kleene(pc.is_valid(parsed), pc.equal(back, s))
    # per-row scalar fallback (date-time, uri, ipv6, custom): still batched —
    # one Python pass over the batch, not one task per row.
    check = FORMAT_VALIDATORS.get(fmt)
    if check is None:
        raise SchemaError(f"unknown format: {fmt}")

    def fallback(values: pa.ChunkedArray) -> pa.Array:
        return pa.array(
            [None if v is None else check(v) for v in values.to_pylist()],
            type=pa.bool_(),
        )

    return fallback(s if isinstance(s, pa.ChunkedArray) else pa.chunked_array([s]))


def _fail_present(column: str) -> MaskFn:
    """Pass-mask failing every NON-NULL cell (nulls are 'absent' and pass) —
    the column-regime translation of the reference's per-row type errors
    ('must be a string' / 'must be a number' / 'must be an array')."""

    def fn(batch: pa.Table) -> pa.Array:
        col = _get_col(batch, column)
        if col is None:
            return pa.array(np.zeros(batch.num_rows, dtype=bool))
        return pc.fill_null(pc.is_null(col), False)

    return fn


def _coerce_numeric_fallback(column: str, sv: float, op) -> MaskFn:
    """Numeric keyword on a STRING column: per-row coercion with the
    reference's numeric-string prefix quirk
    (`/root/reference/rules/utils.go:51-57`) — cold path, still batched."""
    from .value_engine import to_float

    def fn(batch: pa.Table) -> pa.Array:
        col = _get_col(batch, column)
        if col is None:
            return pa.array(np.ones(batch.num_rows, dtype=bool))
        vals = col.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(True)  # absent
                continue
            f, ok = to_float(v)
            out.append(bool(op(f, sv)) if ok else False)
        return pa.array(out, type=pa.bool_())

    return fn


_STRING_KW = {"minLength", "maxLength", "pattern", "format"}
_NUMERIC_KW = {"minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
               "multipleOf"}
_LIST_KW = {"minItems", "maxItems", "uniqueItems"}


def _guard_kernel(column: str, kw: str, sv: Any, inner: MaskFn, mode: Mode) -> MaskFn:
    """Runtime type guard: the vectorized kernel assumes a type-matched
    column; when the batch column's Arrow type belongs to a different family
    the reference semantics are per-row type errors (string keywords on
    numbers → 'must be a string' fail; numeric keywords on strings → the
    numeric-string coercion quirk; list keywords on scalars → 'must be an
    array' fail). Resolved per batch, cached BY THE COLUMN'S ARROW TYPE —
    a single cached slot would silently reuse the first batch's resolution
    on datasets with heterogeneous block schemas (ADVICE r1)."""
    cache: dict[str, MaskFn] = {}
    _num_ops = {"minimum": lambda v, b: v >= b, "maximum": lambda v, b: v <= b,
                "exclusiveMinimum": lambda v, b: v > b,
                "exclusiveMaximum": lambda v, b: v < b,
                "multipleOf": lambda v, b: (not math.isfinite(v / b))
                or abs(v / b - round(v / b)) <= 1e-10}

    def resolve(t: pa.DataType) -> MaskFn:
        if kw in _STRING_KW:
            is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
            is_bin = pa.types.is_binary(t) or pa.types.is_large_binary(t)
            if kw in ("minLength", "maxLength"):
                # byte-length works on raw binary too (Go len() parity)
                return inner if (is_str or is_bin) else _fail_present(column)
            # pattern/format need valid UTF-8; raw binary cells fail present
            return inner if is_str else _fail_present(column)
        if kw in _NUMERIC_KW:
            if pa.types.is_integer(t) or pa.types.is_floating(t) \
                    or pa.types.is_decimal(t):
                return inner
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                return _coerce_numeric_fallback(column, sv, _num_ops[kw])
            return _fail_present(column)
        if kw in _LIST_KW:
            ok = pa.types.is_list(t) or pa.types.is_large_list(t)
            return inner if ok else _fail_present(column)
        if kw == "enum":
            is_str_col = pa.types.is_string(t) or pa.types.is_large_string(t)
            is_num_col = pa.types.is_integer(t) or pa.types.is_floating(t)
            all_str = all(isinstance(x, str) for x in sv)
            all_num = all(isinstance(x, (int, float)) and not isinstance(x, bool)
                          for x in sv)
            if all_str:
                # reference enum demands a string value ('value must be a
                # string') — any non-string column fails present cells
                return inner if is_str_col else _fail_present(column)
            if all_num and is_num_col:
                # numeric-enum extension: compare in float64 so int enums
                # match float columns (1 == 1.0 in the JSON regime)
                value_set = pa.array([float(x) for x in sv], type=pa.float64())

                def num_enum(batch: pa.Table) -> pa.Array:
                    col = _get_col(batch, column)
                    if col is None:
                        return pa.array(np.ones(batch.num_rows, dtype=bool))
                    casted = pc.cast(col, pa.float64())
                    return _pass_on_null(
                        col, pc.is_in(casted, value_set=value_set))

                return num_enum
            # mixed-type enums: only the members matching the column's JSON
            # type family can ever equal a cell (deep-key equality keeps the
            # type tag — numeric strings do NOT coerce in enum)
            if is_str_col:
                members = [x for x in sv if isinstance(x, str)]
                if not members:
                    return _fail_present(column)
                vs = pa.array(members)

                def str_enum(batch: pa.Table) -> pa.Array:
                    col = _get_col(batch, column)
                    if col is None:
                        return pa.array(np.ones(batch.num_rows, dtype=bool))
                    return _pass_on_null(col, pc.is_in(col, value_set=vs))

                return str_enum
            if is_num_col:
                members = [float(x) for x in sv
                           if isinstance(x, (int, float))
                           and not isinstance(x, bool)]
                if not members:
                    return _fail_present(column)
                vs = pa.array(members, type=pa.float64())

                def num_enum2(batch: pa.Table) -> pa.Array:
                    col = _get_col(batch, column)
                    if col is None:
                        return pa.array(np.ones(batch.num_rows, dtype=bool))
                    return _pass_on_null(
                        col, pc.is_in(pc.cast(col, pa.float64()),
                                      value_set=vs))

                return num_enum2
            # non-scalar column (list/struct/map/bool) with matching-family
            # enum members: VE DeepEqual set membership per present cell
            # (value_engine._kw_enum extension). Vectorized kernels for the
            # common Arrow shapes (list-of-primitive, flat struct, bool —
            # Arrow 16 has no nested is_in/equal kernels, so membership is
            # compiled per MEMBER against the column's buffers); per-row
            # _deep_key only for maps / nested-of-nested (r4, VERDICT item
            # 5 — closes the last cold path on typed tables)
            fast = _deep_enum_fast(column, sv, t)
            if fast is not None:
                return fast
            from .value_engine import _deep_key
            keys = {_deep_key(x) for x in sv}

            def deep_enum(batch: pa.Table) -> pa.Array:
                col = _get_col(batch, column)
                if col is None:
                    return pa.array(np.ones(batch.num_rows, dtype=bool))
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return pa.array(
                    [True if v is None else _deep_key(v) in keys
                     for v in col.to_pylist()], type=pa.bool_())

            return deep_enum
        return inner

    def dispatch(batch: pa.Table) -> pa.Array:
        col = _get_col(batch, column)
        k = str(col.type) if col is not None else "__missing__"
        fn = cache.get(k)
        if fn is None:
            fn = resolve(col.type) if col is not None \
                else _all_const(True)  # missing column/field = all-absent
            cache[k] = fn
        return fn(batch)

    return dispatch


def _column_kernel(column: str, kw: str, sv: Any, col_type: pa.DataType | None,
                   mode: Mode, registry=None) -> MaskFn | None:
    """Build the pass-mask closure for one (column, keyword). Returns None for
    keywords that are trivially satisfied given the Arrow column type
    (resolved at compile time — e.g. ``type: string`` on a string column)."""

    if kw == "type":
        types = [sv] if isinstance(sv, str) else list(sv)
        if col_type is None:
            # Arrow schema unknown at compile time: resolve against each
            # batch's schema, cached BY ARROW TYPE (heterogeneous block
            # schemas re-resolve instead of reusing a stale kernel).
            cache: dict[str, MaskFn | None] = {}

            def dispatch(batch: pa.Table) -> pa.Array:
                col = _get_col(batch, column)
                k = str(col.type) if col is not None else "__missing__"
                if k not in cache:
                    ct = col.type if col is not None else None
                    cache[k] = (_column_kernel(column, kw, sv, ct, mode,
                                               registry)
                                if ct is not None else _all_const(True))
                inner = cache[k]
                if inner is None:  # statically conformant
                    return pa.array(np.ones(batch.num_rows, dtype=bool))
                return inner(batch)

            return dispatch
        static = False
        for t in types:
            checks = _ARROW_OK.get(t, ())
            if any(chk(col_type) for chk in checks):
                static = True
        if static:
            return None  # conforms by schema; nulls are "absent", not type errors
        # integer-as-float (`/root/reference/rules/type.go:96-99`)
        if "integer" in types and pa.types.is_floating(col_type):
            def fn(batch: pa.Table) -> pa.Array:
                col = _get_col(batch, column)
                return _pass_on_null(col, pc.equal(pc.floor(col), col))
            return fn
        # column's Arrow type matches none of the declared types: every
        # PRESENT cell is a type violation; nulls are absent and pass
        return _fail_present(column)

    if kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
        op = {"minimum": pc.greater_equal, "maximum": pc.less_equal,
              "exclusiveMinimum": pc.greater, "exclusiveMaximum": pc.less}[kw]

        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            return _pass_on_null(col, op(col, sv))
        return fn

    if kw == "multipleOf":
        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            ratio = pc.divide(pc.cast(col, pa.float64()), sv)
            ok = pc.less_equal(
                pc.abs(pc.subtract(ratio, pc.round(ratio))), 1e-10)
            # non-finite ratio: Go parity says valid (NaN>eps is false there)
            ok = pc.or_kleene(ok, pc.invert(pc.is_finite(ratio)))
            return _pass_on_null(col, ok)
        return fn

    if kw in ("minLength", "maxLength"):
        op = pc.greater_equal if kw == "minLength" else pc.less_equal

        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            return _pass_on_null(col, op(_byte_length(col), sv))
        return fn

    if kw == "pattern":
        # compile_schema validates with Python re; RE2 (the runtime engine,
        # and the REFERENCE's engine — Go regexp is RE2) rejects some
        # Python-only syntax (backrefs, lookaround). Probe once at plan
        # compile: RE2-incompatible patterns run as a per-row Python-re
        # fallback instead of crashing every batch.
        try:
            pc.match_substring_regex(pa.array([], type=pa.string()), sv)
            re2_ok = True
        except pa.ArrowInvalid:
            re2_ok = False
        if re2_ok:
            def fn(batch: pa.Table) -> pa.Array:
                col = _get_col(batch, column)
                return _pass_on_null(col,
                                     pc.match_substring_regex(_str_col(col), sv))
            return fn
        rx = re.compile(sv)

        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            vals = _str_col(col).to_pylist()
            out = [True if v is None else bool(rx.search(v)) for v in vals]
            return pa.array(out, type=pa.bool_())
        return fn

    if kw == "enum":
        try:
            value_set = pa.array(sv)
        except (pa.ArrowTypeError, pa.ArrowInvalid):
            # mixed-type enum: the runtime type guard substitutes a
            # family-specific kernel; this inner one is never invoked
            value_set = None

        def fn(batch: pa.Table) -> pa.Array:
            if value_set is None:
                raise SchemaError(
                    f"mixed-type enum on column {column!r} requires the "
                    "guarded kernel")
            col = _get_col(batch, column)
            return _pass_on_null(col, pc.is_in(col, value_set=value_set))
        return fn

    if kw == "format":
        # the engine-level Registry wins over the global table, as in the
        # dynamic regime (value_engine._kw_format)
        custom = registry.get_format(sv) if registry is not None else None
        if custom is not None:
            def fn(batch: pa.Table) -> pa.Array:
                col = _get_col(batch, column)
                vals = _str_col(col).to_pylist()
                out = [True if v is None else bool(custom(v)) for v in vals]
                return pa.array(out, type=pa.bool_())
            return fn
        if sv not in FORMAT_VALIDATORS and sv not in _VEC_FORMAT_REGEX:
            if mode is Mode.LOOSE:
                return None
            # strict unknown format: present cells fail, nulls stay absent
            return _fail_present(column)

        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            return _pass_on_null(col, _format_mask(col, sv))
        return fn

    if kw in ("minItems", "maxItems"):
        op = pc.greater_equal if kw == "minItems" else pc.less_equal

        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            return _pass_on_null(col, op(pc.list_value_length(col), sv))
        return fn

    if kw == "uniqueItems":
        if not sv:
            return None

        def fn(batch: pa.Table) -> pa.Array:
            # per-row distinct count == list length, via flatten +
            # (parent index, value) dedup — no Python loop.
            col = _get_col(batch, column)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vt = col.type.value_type
            if (pa.types.is_struct(vt) or pa.types.is_list(vt)
                    or pa.types.is_large_list(vt) or pa.types.is_map(vt)):
                # Arrow's hash group_by can't key nested types — per-row
                # DeepEqual fallback (rare column shape, VE parity)
                from .value_engine import _deep_key

                ok = []
                for row in col.to_pylist():
                    if row is None:
                        ok.append(True)
                        continue
                    seen = set()
                    dup = False
                    for item in row:
                        dk = _deep_key(item)
                        if dk in seen:
                            dup = True
                            break
                        seen.add(dk)
                    ok.append(not dup)
                return pa.array(ok, type=pa.bool_())
            lengths = pc.list_value_length(col)
            parent = pc.list_parent_indices(col)
            flat = pc.list_flatten(col)
            pairs = pa.table({"p": parent, "v": flat})
            # CountOptions(mode="all"): a null ELEMENT is one distinct value
            # (DeepEqual semantics — the value engine and Go reference treat
            # nil as comparable; counting only valid values would flag
            # [1, null] as a duplicate, ADVICE r1)
            distinct = pairs.group_by(["p", "v"]).aggregate([]) \
                            .group_by("p").aggregate(
                                [("v", "count",
                                  pc.CountOptions(mode="all"))])
            ok = np.ones(len(col), dtype=bool)
            idx = distinct.column("p").to_numpy(zero_copy_only=False)
            cnt = distinct.column("v_count").to_numpy(zero_copy_only=False)
            lens = lengths.fill_null(0).to_numpy(zero_copy_only=False)
            ok[idx] = cnt == lens[idx]
            return _pass_on_null(col, pa.array(ok))
        return fn

    if kw in ("minProperties", "maxProperties"):
        ge = kw == "minProperties"

        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            if col is None:
                return pa.array(np.ones(batch.num_rows, dtype=bool))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            t = col.type
            if pa.types.is_map(t):
                # maps are list<struct<key,value>>: entry count from offsets
                lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
                ok = lens >= sv if ge else lens <= sv
                return _pass_on_null(col, pa.array(ok))
            if pa.types.is_struct(t):
                # property count = number of NON-NULL fields. Arrow structs
                # cannot distinguish {"a": null} from {} (no per-field
                # absence), so the column regime's null≡absent mapping
                # applies — unlike MAP columns, where a null-VALUED entry is
                # a present key and counts (maps can express the
                # difference). A zero-field struct type counts 0 for every
                # row (an explicit array, not a None accumulator — a None
                # would make the comparison null and vacuously pass).
                cnt = pa.array(np.zeros(len(col), dtype=np.int32))
                for f in range(t.num_fields):
                    v = pc.cast(pc.is_valid(pc.struct_field(col, f)),
                                pa.int32())
                    cnt = pc.add(cnt, v)
                ok = (pc.greater_equal(cnt, sv) if ge
                      else pc.less_equal(cnt, sv))
                return _pass_on_null(col, ok)
            # reference: "can only be applied to objects"
            return pc.fill_null(pc.is_null(col), False)

        return fn

    if kw == "items":
        return _items_pair(column, sv, mode, registry)[0]

    # Keywords that need per-value recursion (logical combinators,
    # conditionals, dependencies, patternProperties, dynamic
    # additionalProperties) are handled by the dynamic-regime stage
    # (stages/validate.py JsonColumnValidator), not the flat column plan.
    raise SchemaError(f"keyword {kw!r} is not supported in the flat column plan; "
                      f"use the dynamic-JSON regime for column {column!r}")


def _custom_kernel(column: str, kw: str, sv: Any, registry
                   ) -> "tuple[MaskFn, str] | None":
    """User-registered keyword → (pass-mask, message) for the column plan
    (VERDICT r2 item 4; reference extension surface
    `/root/reference/validator/validator.go:60-81`). A registered
    ``compile_fn(schema_value) -> (mask_fn, message)`` vectorizes the
    keyword — ``mask_fn`` sees the column's Arrow array, nulls auto-pass
    (null ≡ absent property). Without a compile_fn the scalar RuleFunc runs
    as a batched per-row fallback, so a custom keyword no longer steers the
    whole table to the dynamic regime. Built-in keywords are never
    shadowed (the VE consults its handlers before the registry too)."""
    if registry is None or kw in _CP_ELEM_KEYWORDS or kw in METADATA_KEYS:
        return None
    compile_fn = getattr(registry, "get_validator_compiler",
                         lambda _n: None)(kw)
    if compile_fn is not None:
        mask_fn, message = compile_fn(sv)

        def fn(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            if col is None:
                return pa.array(np.ones(batch.num_rows, dtype=bool))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return _pass_on_null(col, mask_fn(col))

        return fn, message
    rule = registry.get_validator(kw)
    if rule is None:
        return None

    def fn(batch: pa.Table) -> pa.Array:
        col = _get_col(batch, column)
        if col is None:
            return pa.array(np.ones(batch.num_rows, dtype=bool))
        out = []
        for v in (col.to_pylist() if not isinstance(col, pa.ChunkedArray)
                  else col.combine_chunks().to_pylist()):
            if v is None:
                out.append(True)
                continue
            ok, err = rule(v, sv, f"$.{column}")
            out.append(bool(ok) and err is None)
        return pa.array(out, type=pa.bool_())

    # VE wording for a failed registered constraint (value_engine.py)
    return fn, f"validation failed for keyword {kw}"


# keywords the column plan can evaluate INSIDE list elements / combinator
# branches (recursively); anything else steers the whole column to the
# dynamic regime at compile time
_CP_ELEM_KEYWORDS = (_STRING_KW | _NUMERIC_KW | _LIST_KW
                     | {"type", "enum", "required", "properties", "items",
                        "minProperties", "maxProperties",
                        "allOf", "anyOf", "oneOf", "not",
                        "if", "then", "else", "conditional",
                        "patternProperties", "additionalProperties",
                        "dependencies"})


def _is_num(x) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def _deep_enum_fast(column: str, sv: list, t: pa.DataType):
    """Vectorized DeepEqual enum membership for non-scalar columns, or None
    when the shape needs the per-row fallback. Go reflect.DeepEqual in the
    JSON regime: bool != number, 1 == 1.0 (value_engine._deep_key), null
    cells pass (absent property). Covered shapes:

    - ``bool`` columns → ``pc.is_in`` over the bool members;
    - ``list<primitive>`` → per MEMBER: rows of equal length gathered into
      an (n_cand, L) matrix off the flattened buffer, one numpy compare
      (member element None ≡ Arrow null element, never NaN);
    - flat ``struct`` of primitives → per member: field-wise ``pc.equal``
      folds (a member whose key set differs from the struct's fields can
      never DeepEqual a struct cell — to_pylist materializes every field).

    Maps and nested-of-nested shapes return None → _deep_key fallback."""
    prims = (pa.types.is_integer, pa.types.is_floating,
             pa.types.is_boolean, pa.types.is_string,
             pa.types.is_large_string)

    def _prim(ft: pa.DataType) -> bool:
        return any(p(ft) for p in prims)

    def _family_ok(v, ft: pa.DataType) -> bool:
        if isinstance(v, bool):
            return pa.types.is_boolean(ft)
        if _is_num(v):
            return pa.types.is_integer(ft) or pa.types.is_floating(ft)
        if isinstance(v, str):
            return pa.types.is_string(ft) or pa.types.is_large_string(ft)
        return v is None

    if pa.types.is_boolean(t):
        members = [x for x in sv if isinstance(x, bool)]

        def bool_enum(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            if col is None:
                return pa.array(np.ones(batch.num_rows, dtype=bool))
            if not members:
                return pc.fill_null(pc.is_null(col), False)
            return _pass_on_null(col, pc.is_in(col, value_set=pa.array(
                members, type=pa.bool_())))

        return bool_enum

    if (pa.types.is_list(t) or pa.types.is_large_list(t)) \
            and _prim(t.value_type):
        vt = t.value_type
        numeric = pa.types.is_integer(vt) or pa.types.is_floating(vt)
        members = []
        for m in sv:
            if isinstance(m, list) and all(_family_ok(v, vt) for v in m):
                if numeric:
                    vals = np.array([0.0 if v is None else float(v)
                                     for v in m], dtype=np.float64)
                else:
                    vals = np.array([None if v is None else v for v in m],
                                    dtype=object)
                members.append((len(m),
                                np.array([v is None for v in m]), vals))

        def list_enum(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            n = batch.num_rows
            if col is None:
                return pa.array(np.ones(n, dtype=bool))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out = np.zeros(n, dtype=bool)
            nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
            out[nulls] = True
            if not members:
                return pa.array(out)
            offsets = col.offsets.to_numpy(zero_copy_only=False)
            lengths = offsets[1:] - offsets[:-1]
            flat = col.values
            fnull = pc.is_null(flat).to_numpy(zero_copy_only=False)
            if numeric:
                fvals = np.asarray(pc.fill_null(
                    pc.cast(flat, pa.float64()), 0.0))
            else:
                fvals = np.asarray(flat.to_pandas(), dtype=object)
            for L, mnull, mvals in members:
                cand = np.flatnonzero((lengths == L) & ~nulls)
                if cand.size == 0:
                    continue
                if L == 0:
                    out[cand] = True
                    continue
                idx = offsets[cand][:, None] + np.arange(L)[None, :]
                cn = fnull[idx]
                cv = fvals[idx]
                eq = (cn == mnull[None, :]) & (mnull[None, :] | (cv == mvals))
                out[cand[eq.all(axis=1)]] = True
            return pa.array(out)

        return list_enum

    if pa.types.is_struct(t) and all(_prim(t.field(i).type)
                                     for i in range(t.num_fields)):
        fields = [(t.field(i).name, t.field(i).type)
                  for i in range(t.num_fields)]
        fnames = {nm for nm, _ in fields}
        members = [m for m in sv
                   if isinstance(m, dict) and set(m.keys()) == fnames
                   and all(_family_ok(m[nm], ft) for nm, ft in fields)]

        def struct_enum(batch: pa.Table) -> pa.Array:
            col = _get_col(batch, column)
            n = batch.num_rows
            if col is None:
                return pa.array(np.ones(n, dtype=bool))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out = pc.is_null(col).to_numpy(zero_copy_only=False).copy()
            for m in members:
                eq = np.ones(n, dtype=bool)
                for nm, ft in fields:
                    f = pc.struct_field(col, nm)
                    if m[nm] is None:
                        fe = pc.is_null(f)
                    elif pa.types.is_integer(ft) or pa.types.is_floating(ft):
                        fe = pc.fill_null(pc.equal(
                            pc.cast(f, pa.float64()), float(m[nm])), False)
                    else:
                        fe = pc.fill_null(pc.equal(f, m[nm]), False)
                    eq &= fe.to_numpy(zero_copy_only=False)
                    if not eq.any():
                        break
                out |= eq
            return pa.array(out)

        return struct_enum

    return None


def _check_cp_supported(sub: CompiledSchema) -> None:
    for kw, sv in sub.keywords.items():
        if kw in METADATA_KEYS:
            continue
        if kw not in _CP_ELEM_KEYWORDS:
            raise SchemaError(
                f"keyword {kw!r} is not supported in the flat "
                "column plan; use the dynamic-JSON regime")
        if kw == "properties":
            for child in sv.values():
                _check_cp_supported(child)
        elif kw == "items":
            for s in (sv if isinstance(sv, list) else [sv]):
                _check_cp_supported(s)
        elif kw in ("allOf", "anyOf", "oneOf"):
            for s in sv:
                _check_cp_supported(s)
        elif kw in ("not", "if", "then", "else"):
            _check_cp_supported(sv)
        elif kw == "conditional":
            for s in sv.values():
                _check_cp_supported(s)
        elif kw == "patternProperties":
            for _rx, s in sv.values():
                _check_cp_supported(s)
        elif kw == "additionalProperties":
            if isinstance(sv, CompiledSchema):
                _check_cp_supported(sv)
        elif kw == "dependencies":
            for dep in sv.values():
                if isinstance(dep, CompiledSchema):
                    _check_cp_supported(dep)


def _emit_elem_constraints(path: str, sub: CompiledSchema, mode: Mode,
                           registry, elem_type: pa.DataType
                           ) -> list[CompiledConstraint]:
    """Constraints over an ELEMENT table (column ``__elem`` holding the
    flattened list values), given the element's resolved Arrow type.
    Mirrors the value engine's per-element recursion
    (`/root/reference/rules/array.go:43-76`, ``validateItems``): ``required``
    on a non-object element fails ONCE per element ('value must be an object
    for required validation'), ``properties`` on a non-object element is
    silently skipped, scalar keywords go through the usual runtime type
    guards."""
    out: list[CompiledConstraint] = []

    def field_type(t: pa.DataType, name: str) -> pa.DataType | None:
        if not pa.types.is_struct(t):
            return None
        idx = t.get_field_index(name)
        return t.field(idx).type if idx >= 0 else None

    def emit(p: str, s: CompiledSchema, t: pa.DataType | None) -> None:
        for kw, sv in s.keywords.items():
            if kw in METADATA_KEYS:
                continue
            if kw == "properties":
                if t is not None and not pa.types.is_struct(t):
                    continue  # non-object value: VE skips properties
                for name, child in sv.items():
                    emit(f"{p}.{name}", child,
                         field_type(t, name) if t is not None else None)
                continue
            if kw == "required":
                if t is not None and not pa.types.is_struct(t):
                    # non-object element: one error per element
                    # (`value must be an object for required validation`)
                    out.append(CompiledConstraint(
                        constraint_id=f"required:{p}", column=p,
                        tag="required",
                        message="value must be an object for required "
                                "validation",
                        param="", fn=_fail_present(p)))
                    continue
                for name in sv:
                    child_path = f"{p}.{name}"

                    def fn(batch: pa.Table, _p=p, _c=child_path) -> pa.Array:
                        parent = _get_col(batch, _p)
                        if parent is None:
                            return pa.array(np.ones(batch.num_rows,
                                                    dtype=bool))
                        # map-parent presence contract: a null-valued map
                        # entry is a PRESENT key (_present_col)
                        pres = _present_col(batch, _c)
                        if pres is None:
                            return pc.fill_null(pc.is_null(parent), False)
                        return pc.fill_null(
                            pc.or_kleene(pc.is_null(parent), pres), True)

                    out.append(CompiledConstraint(
                        constraint_id=f"required:{child_path}",
                        column=child_path, tag="required",
                        message=_MESSAGES["required"].format(
                            column=child_path),
                        param="", fn=fn))
                continue
            if kw in ("then", "else"):
                continue  # consumed together with the sibling "if"
            if kw in ("patternProperties", "additionalProperties"):
                if t is None:
                    continue  # field absent from the struct type: never present
                _emit_name_resolved(out, p, s, t, mode, registry, False,
                                    emit, kw, sv)
                continue
            if kw == "dependencies":
                _emit_dependencies(out, f"{p}.", t, sv, mode, registry)
                continue
            special = _special_pair(p, kw, sv, mode, registry, siblings=s)
            if special is not None:
                mask, cnt, msg, mfn, tfn = special
                tag = "conditional" if kw in ("if", "conditional") else kw
                out.append(CompiledConstraint(
                    constraint_id=f"{tag}:{p}", column=p, tag=tag,
                    message=msg, param="", fn=mask, count_fn=cnt,
                    message_fn=mfn, tag_fn=tfn))
                continue
            kernel = _column_kernel(p, kw, sv, t, mode, registry)
            if kernel is None:
                continue
            if kw in (_STRING_KW | _NUMERIC_KW | _LIST_KW | {"enum"}):
                kernel = _guard_kernel(p, kw, sv, kernel, mode)
            out.append(CompiledConstraint(
                constraint_id=f"{kw}:{p}", column=p, tag=kw,
                message=_MESSAGES.get(kw, "validation failed for keyword "
                                      + kw).format(column=p, param=sv),
                param=str(sv), fn=kernel))

    emit(path, sub, elem_type)
    return out


class _ElemEvaluator:
    """Per-element (pass, error-count) evaluation for one ``items``
    sub-schema, with exact value-engine parity:

    - child constraints are compiled lazily per RESOLVED element Arrow type
      (cached by type — heterogeneous blocks re-resolve);
    - null ELEMENTS get the value engine's verdict for ``None`` against the
      whole sub-schema, computed ONCE at plan compile (the reference
      type-fails nil for non-null types, `/root/reference/rules/type.go:74-123`
      — r1's null-elements-pass deviation is gone);
    - each failing (element, child constraint) contributes one error, so
      row error counts match the per-element accumulation of
      `/root/reference/validator/validator.go:543-545`.
    """

    def __init__(self, sub: CompiledSchema, mode: Mode, registry=None):
        _check_cp_supported(sub)
        self.sub, self.mode, self.registry = sub, mode, registry
        from .value_engine import Options, ValueEngine
        r = ValueEngine(Options(mode=mode), registry).validate(None, sub)
        self.null_errs = int(r.error_count)
        # ALL VE errors for a null element — the (tag, message) pairs the
        # items violation rows report per null element, padded/truncated to
        # null_errs so detail emission stays aligned with counts()
        pairs = [(e.tag, e.message) for e in r.errors]
        pairs = pairs[:self.null_errs]
        pairs += [("items", _MESSAGES["items"])] * (self.null_errs
                                                    - len(pairs))
        self.null_all = pairs
        self._cache: dict[str, list[CompiledConstraint]] = {}

    def _constraints(self, t: pa.DataType) -> list[CompiledConstraint]:
        key = str(t)
        got = self._cache.get(key)
        if got is None:
            got = _emit_elem_constraints("__elem", self.sub, self.mode,
                                         self.registry, t)
            self._cache[key] = got
        return got

    def counts(self, flat: pa.Array) -> np.ndarray:
        m = len(flat)
        out = np.zeros(m, dtype=np.int32)
        if m == 0:
            return out
        tbl = pa.table({"__elem": flat})
        for c in self._constraints(flat.type):
            if c.count_fn is not None:
                out += c.count_fn(tbl)
            else:
                mask = c.pass_mask(tbl).to_numpy(zero_copy_only=False)
                out += (~mask).astype(np.int32)
        if self.null_errs:
            nulls = pc.is_null(flat).to_numpy(zero_copy_only=False)
            out[nulls] += self.null_errs
        return out


def _items_pair(column: str, sv, mode: Mode, registry=None
                ) -> "tuple[MaskFn, Callable, Callable]":
    """``items`` kernels, object mode (one sub-schema for every element,
    `/root/reference/rules/array.go:43-76`) and tuple mode (schema[i] per
    position, extras ignored, `/root/reference/rules/array.go:77-120`) —
    fully vectorized: flatten once, evaluate child constraints over the
    element array, re-aggregate per-element error counts to parent rows via
    ``np.add.at``. Non-list cells pass (the reference flags those through
    ``type``, not ``items``); null/absent lists pass."""
    if isinstance(sv, CompiledSchema):
        ev: _ElemEvaluator | None = _ElemEvaluator(sv, mode, registry)
        evs: list[_ElemEvaluator] | None = None
    else:
        ev = None
        evs = [_ElemEvaluator(s, mode, registry) for s in sv]

    def count_fn(batch: pa.Table) -> np.ndarray:
        n = batch.num_rows
        out = np.zeros(n, dtype=np.int32)
        col = _get_col(batch, column)
        if col is None:
            return out
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
            return out
        flat = pc.list_flatten(col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return out
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        if ev is not None:
            np.add.at(out, parent, ev.counts(flat))
        else:
            # element position within its list: parent indices are ascending,
            # so the first occurrence index of each parent is its list start
            pos = np.arange(len(parent)) - np.searchsorted(parent, parent,
                                                           side="left")
            for i, e in enumerate(evs):
                idx = np.flatnonzero(pos == i)
                if idx.size == 0:
                    continue
                np.add.at(out, parent[idx],
                          e.counts(flat.take(pa.array(idx))))
        return out

    def mask_fn(batch: pa.Table) -> pa.Array:
        return pa.array(count_fn(batch) == 0)

    def _collect(ev_: "_ElemEvaluator", flat: pa.Array, sel: np.ndarray,
                 row_of: np.ndarray, occ: list) -> None:
        """Append one occurrence record per failing (element, child
        constraint) of ``flat[sel]`` to ``occ`` as
        ``(row, elem_index, child_order, occurrence_seq, tag, message)`` —
        mirroring ev.counts()'s error arithmetic occurrence for occurrence
        so the emitted details align with the repeated fail indices."""
        if sel.size == 0:
            return
        sub_flat = flat.take(pa.array(sel))
        stbl = pa.table({"__elem": sub_flat})
        cs = ev_._constraints(sub_flat.type)
        for ci, c in enumerate(cs):
            if c.count_fn is not None:
                # nested per-element keyword (items-in-items): k errors for
                # one element → k occurrences with the child's own tag (one
                # recursion level deep, as documented)
                cnts = c.count_fn(stbl)
                for j in np.flatnonzero(cnts > 0):
                    for k in range(int(cnts[j])):
                        occ.append((row_of[sel[j]], sel[j], ci, k,
                                    c.tag, c.message))
                continue
            m = c.pass_mask(stbl).to_numpy(zero_copy_only=False)
            fail = np.flatnonzero(~m)
            if fail.size == 0:
                continue
            fmsgs = (c.message_fn(stbl, fail)
                     if c.message_fn is not None else None)
            for k, j in enumerate(fail):
                occ.append((row_of[sel[j]], sel[j], ci, 0, c.tag,
                            fmsgs[k] if fmsgs is not None else c.message))
        if ev_.null_errs:
            nulls = np.flatnonzero(
                pc.is_null(sub_flat).to_numpy(zero_copy_only=False))
            for j in nulls:
                for k, (t, m_) in enumerate(ev_.null_all):
                    occ.append((row_of[sel[j]], sel[j], len(cs) + k, 0,
                                t, m_))

    def detail_fn(batch: pa.Table, rows: np.ndarray) -> tuple[list, list]:
        """Per-occurrence details: ``rows`` holds the failing row indices
        REPEATED once per child violation (ascending, evaluate_plan's
        ``np.repeat`` over the counts). Returns (tags, msgs) aligned with
        ``rows`` — one entry per failing (element, child keyword), matching
        the value engine's per-element recursion
        (`/root/reference/rules/array.go:43-76`). Runs only over the
        failing rows, so the extra evaluation is violation-sized."""
        tags = ["items"] * len(rows)
        msgs = [_MESSAGES["items"]] * len(rows)
        col = _get_col(batch, column)
        if col is None or len(rows) == 0:
            return tags, msgs
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
            return tags, msgs
        urows = np.unique(rows)
        sub = col.take(pa.array(urows))
        flat = pc.list_flatten(sub)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return tags, msgs
        parent = pc.list_parent_indices(sub).to_numpy(zero_copy_only=False)
        occ: list = []
        if ev is not None:
            _collect(ev, flat, np.arange(len(flat)), parent, occ)
        else:
            pos = np.arange(len(parent)) - np.searchsorted(parent, parent,
                                                           side="left")
            for i, e in enumerate(evs):
                _collect(e, flat, np.flatnonzero(pos == i), parent, occ)
        # deterministic order: row asc, element order, child order — and
        # require exact alignment with the repeated fail indices (both
        # derive from the same counts arithmetic)
        occ.sort(key=lambda o: (o[0], o[1], o[2], o[3]))
        if len(occ) == len(rows):
            tags = [o[4] for o in occ]
            msgs = [o[5] for o in occ]
        return tags, msgs

    return mask_fn, count_fn, detail_fn


def _col_counts(ev: "_ElemEvaluator", batch: pa.Table, column: str
                ) -> tuple[np.ndarray, np.ndarray]:
    """(per-row error counts against ev's sub-schema, null mask) for a
    COLUMN value. Null cells mean the property is ABSENT, so their counts
    are zeroed — unlike list elements, where null is a value."""
    n = batch.num_rows
    col = _get_col(batch, column)
    if col is None:
        return np.zeros(n, dtype=np.int32), np.ones(n, dtype=bool)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    cnt = ev.counts(col)
    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    cnt[nulls] = 0
    return cnt, nulls


def _combinator_pair(column: str, kw: str, sv, mode: Mode, registry=None
                     ) -> tuple[MaskFn, Callable[[pa.Table], np.ndarray]]:
    """Vectorized logical combinators over one column's value
    (`/root/reference/rules/logical_rules.go:19-304`): each branch schema
    compiles to an element evaluator; branch validity = zero branch errors.
    Error arithmetic matches the value engine: allOf adds one error per
    FAILING branch, anyOf/oneOf/not add one error total."""
    subs = [sv] if kw == "not" else list(sv)
    evs = [_ElemEvaluator(s, mode, registry) for s in subs]

    def count_fn(batch: pa.Table) -> np.ndarray:
        n = batch.num_rows
        oks, nulls = [], None
        for ev in evs:
            cnt, nulls = _col_counts(ev, batch, column)
            oks.append(cnt == 0)
        if kw == "allOf":
            out = np.zeros(n, dtype=np.int32)
            for ok in oks:
                out += (~ok).astype(np.int32)
        elif kw == "anyOf":
            out = (~np.logical_or.reduce(oks)).astype(np.int32)
        elif kw == "oneOf":
            matches = np.zeros(n, dtype=np.int32)
            for ok in oks:
                matches += ok.astype(np.int32)
            out = (matches != 1).astype(np.int32)
        else:  # not: violation where the value SATISFIES the sub-schema
            out = oks[0].astype(np.int32)
        out[nulls] = 0  # absent property: combinators never evaluate
        return out

    def mask_fn(batch: pa.Table) -> pa.Array:
        return pa.array(count_fn(batch) == 0)

    return mask_fn, count_fn


def _oneof_message_fn(column: str, kw: str, sv, mode: Mode, registry=None):
    """Per-row oneOf wording (none-match vs more-than-one, VE parity)."""
    if kw != "oneOf":
        return None
    evs = [_ElemEvaluator(s, mode, registry) for s in sv]

    def fn(batch: pa.Table, rows: np.ndarray) -> list:
        matches = np.zeros(batch.num_rows, dtype=np.int32)
        for ev in evs:
            cnt, _ = _col_counts(ev, batch, column)
            matches += (cnt == 0).astype(np.int32)
        return ["value matches more than one schema in oneOf" if matches[r] > 1
                else "value does not match any schema in oneOf"
                for r in rows]

    return fn


def _conditional_pair(column: str, sv: dict, mode: Mode, registry=None
                      ) -> tuple[MaskFn, Callable[[pa.Table], np.ndarray]]:
    """Correct if/then/else mask semantics over one column's value —
    ``viol = (if_ok & ~then_ok) | (~if_ok & ~else_ok)`` (the reference's
    WORKING ``conditional`` wrapper, rules/conditional_rules.go:134-245;
    its standalone keywords are broken — SURVEY §2.1). Error counts carry
    the selected branch's per-keyword failures, like the value engine."""
    ev_if = _ElemEvaluator(sv["if"], mode, registry) if sv.get("if") else None
    ev_then = (_ElemEvaluator(sv["then"], mode, registry)
               if sv.get("then") else None)
    ev_else = (_ElemEvaluator(sv["else"], mode, registry)
               if sv.get("else") else None)

    def count_fn(batch: pa.Table) -> np.ndarray:
        n = batch.num_rows
        if ev_if is None:
            return np.zeros(n, dtype=np.int32)
        cif, nulls = _col_counts(ev_if, batch, column)
        if_ok = cif == 0
        cthen = (_col_counts(ev_then, batch, column)[0] if ev_then
                 else np.zeros(n, dtype=np.int32))
        celse = (_col_counts(ev_else, batch, column)[0] if ev_else
                 else np.zeros(n, dtype=np.int32))
        out = np.where(if_ok, cthen, celse).astype(np.int32)
        out[nulls] = 0
        return out

    def mask_fn(batch: pa.Table) -> pa.Array:
        return pa.array(count_fn(batch) == 0)

    return mask_fn, count_fn


def _emit_dependencies(constraints: list, prefix: str,
                       col_type: pa.DataType | None, sv: dict, mode: Mode,
                       registry) -> None:
    """``dependencies`` kernels (both forms,
    `/root/reference/rules/object_dependencies.go:54-92`). ``prefix`` is
    ``""`` at table level (properties are COLUMNS) or ``"path."`` for a
    nested object value; ``col_type`` is the nested struct type (None at
    table level — rows are always objects)."""
    if prefix and col_type is not None and not pa.types.is_struct(col_type):
        # VE: "dependencies can only be applied to objects" per present cell
        base = prefix[:-1]
        constraints.append(CompiledConstraint(
            constraint_id=f"dependencies:{base}", column=base,
            tag="dependencies",
            message="dependencies can only be applied to objects",
            param="", fn=_fail_present(base)))
        return
    for prop, dep in sv.items():
        p_path = prefix + prop
        if isinstance(dep, list):
            # property deps: prop present ⇒ every listed property present
            for d in dep:
                d_path = prefix + d

                def dep_fn(batch: pa.Table, _p=p_path, _d=d_path) -> pa.Array:
                    # presence per the map-column contract (_present_col):
                    # a null-valued MAP entry both TRIGGERS a dependency and
                    # SATISFIES one, like a dict key with value None in the VE
                    present = _present_col(batch, _p)
                    if present is None:
                        return pa.array(np.ones(batch.num_rows, dtype=bool))
                    d_pres = _present_col(batch, _d)
                    if d_pres is None:
                        return pc.invert(present)
                    return pc.or_(pc.invert(present), d_pres)

                constraints.append(CompiledConstraint(
                    constraint_id=f"dependencies:{p_path}->{d}",
                    column=p_path, tag="dependencies",
                    message=(f"property '{prop}' depends on '{d}', but it "
                             "is missing"),
                    param=d, fn=dep_fn))
        else:
            # schema deps: validate the PROPERTY'S VALUE against the dep
            # schema when present (reference semantics, not whole-object)
            ev = _ElemEvaluator(dep, mode, registry)

            def dep_cnt(batch: pa.Table, _p=p_path, _ev=ev) -> np.ndarray:
                return _col_counts(_ev, batch, _p)[0]

            def dep_mask(batch: pa.Table, _f=dep_cnt) -> pa.Array:
                return pa.array(_f(batch) == 0)

            constraints.append(CompiledConstraint(
                constraint_id=f"dependencies:{p_path}", column=p_path,
                tag="dependencies",
                message=("dependency validation failed for property "
                         f"'{prop}'"),
                param=prop, fn=dep_mask, count_fn=dep_cnt))


def _struct_field_type(t: pa.DataType | None, name: str
                       ) -> pa.DataType | None:
    if t is None or not pa.types.is_struct(t):
        return None
    idx = t.get_field_index(name)
    return t.field(idx).type if idx >= 0 else None


def _emit_name_resolved(constraints: list, path: str, sub: CompiledSchema,
                        col_type: pa.DataType | None, mode: Mode, registry,
                        allow_unknown_fields: bool, emit_fn, kw: str,
                        sv) -> None:
    """Nested-path ``patternProperties`` / ``additionalProperties``: the
    value's property names come from the STRUCT TYPE, so both resolve at
    compile time when the Arrow type is known (the typed-table analogue of
    the reference's per-document name dispatch,
    `/root/reference/rules/object_patterns.go:11-180`)."""
    if col_type is None:
        raise SchemaError(
            f"{kw} on nested path {path!r} needs a resolvable struct type — "
            "pass arrow_schema (BatchValidator compiles lazily from the "
            "first batch) or use the dynamic-JSON regime")
    if not pa.types.is_struct(col_type):
        if kw == "patternProperties":
            # VE: "patternProperties can only be applied to objects"
            constraints.append(CompiledConstraint(
                constraint_id=f"patternProperties:{path}", column=path,
                tag="patternProperties",
                message="patternProperties can only be applied to objects",
                param="", fn=_fail_present(path)))
        # additionalProperties on a non-object value: VE returns silently
        return
    names = [col_type.field(i).name for i in range(col_type.num_fields)]

    def suffixed(child_path: str, child: CompiledSchema,
                 t: pa.DataType | None, suffix: str) -> None:
        n0 = len(constraints)
        emit_fn(child_path, child, t)
        for c in constraints[n0:]:
            c.constraint_id += suffix

    if kw == "patternProperties":
        for pat, (rx, child) in sv.items():
            for name in names:
                if rx.search(name):
                    suffixed(f"{path}.{name}", child,
                             _struct_field_type(col_type, name),
                             f"#pattern={pat}")
        return
    if sv is True:
        return
    declared = set((sub.get("properties") or {}).keys())
    pat_map = sub.get("patternProperties") or {}
    extras = [n for n in names if n not in declared
              and not any(rx.search(n) for rx, _c in pat_map.values())]
    if sv is False:
        if not allow_unknown_fields:
            for n in extras:
                constraints.append(CompiledConstraint(
                    constraint_id=f"additionalProperties:{path}.{n}",
                    column=f"{path}.{n}", tag="additionalProperties",
                    message="unknown field", param="",
                    fn=_fail_present(f"{path}.{n}")))
        return
    for n in extras:
        suffixed(f"{path}.{n}", sv, _struct_field_type(col_type, n),
                 "#additional")


def _special_pair(path: str, kw: str, sv, mode: Mode, registry,
                  siblings: CompiledSchema | None = None):
    """(mask, count, message, message_fn, tag_fn) for keywords evaluated as
    composite pairs — items, logical combinators, conditionals — or None
    when ``kw`` is not one of them. ``if`` consumes sibling then/else;
    bare ``then``/``else`` are consumed and emit nothing. ``items`` threads
    the failing CHILD keyword's tag/message per violation row (VERDICT r2
    item 5); one cached detail evaluation serves both override fns."""
    if kw == "items":
        mask, cnt, detail = _items_pair(path, sv, mode, registry)
        memo: dict = {}

        def _detail(batch: pa.Table, rows: np.ndarray):
            key = (id(batch), rows.tobytes())
            if memo.get("k") != key:
                memo["k"] = key
                memo["v"] = detail(batch, rows)
            return memo["v"]

        return (mask, cnt, _MESSAGES["items"],
                lambda batch, rows: _detail(batch, rows)[1],
                lambda batch, rows: _detail(batch, rows)[0])
    if kw in ("allOf", "anyOf", "oneOf", "not"):
        mask, cnt = _combinator_pair(path, kw, sv, mode, registry)
        msg = {
            "allOf": "failed to validate against a schema in allOf",
            "anyOf": "value does not match any schema in anyOf",
            "oneOf": "value does not match any schema in oneOf",
            "not": "value must not validate against the schema in not",
        }[kw]
        return (mask, cnt, msg,
                _oneof_message_fn(path, kw, sv, mode, registry), None)
    if kw == "conditional" or kw == "if":
        cond = sv if kw == "conditional" else {
            "if": sv,
            "then": (siblings.get("then") if siblings else None),
            "else": (siblings.get("else") if siblings else None)}
        mask, cnt = _conditional_pair(path, cond, mode, registry)
        return (mask, cnt, "validation failed against conditional schema",
                None, None)
    return None


# human-readable message templates — ONE wording shared with the value
# engine (value_engine.py emits the same strings, ADVICE r1: downstream
# consumers matching on message text must see identical rows per regime).
# Keywords whose reference wording embeds the OBSERVED value (single-type
# `type`, multipleOf, min/maxProperties) get a per-row message_fn instead.
_MESSAGES = {
    "required": "required property '{column}' is missing",
    "type": "value type does not match any of the expected types: {param}",
    "minimum": "less than minimum {param}",
    "maximum": "greater than maximum {param}",
    "exclusiveMinimum": "less than or equal to exclusive minimum {param}",
    "exclusiveMaximum": "greater than or equal to exclusive maximum {param}",
    "multipleOf": "value is not a multiple of {param}",
    "minLength": "length less than minimum {param}",
    "maxLength": "length greater than maximum {param}",
    "pattern": "does not match pattern {param}",
    "enum": "value must be one of: {param}",
    "format": "invalid {param} format",
    "minItems": "fewer items than minimum {param}",
    "maxItems": "more items than maximum {param}",
    "uniqueItems": "contains duplicate items",
    "minProperties": "object has fewer properties than minProperties {param}",
    "maxProperties": "object has more properties than maxProperties {param}",
    "items": "array item validation failed",
}


def _arrow_json_type(t: pa.DataType) -> str:
    """Arrow column type → the value engine's JSON type tag
    (`/root/reference/rules/type.go:74-123` value universe)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "number"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "object"
    if pa.types.is_null(t):
        return "null"
    return "unknown"


def _prop_count_cells(taken: pa.Array) -> list[int | None]:
    """Per-cell property counts for gathered object cells (None = not an
    object). Struct cells count NON-NULL fields (null≡absent mapping); map
    cells count entries."""
    t = taken.type
    if pa.types.is_struct(t):
        return [None if row is None
                else sum(1 for v in row.values() if v is not None)
                for row in taken.to_pylist()]
    if pa.types.is_map(t):
        return [None if row is None else len(row)
                for row in taken.to_pylist()]
    return [None] * len(taken)


def _message_fn(path: str, kw: str, sv: Any):
    """Per-row message renderer matching the value engine's wording for
    keywords that embed the observed value; None for static messages."""
    if kw == "type" and isinstance(sv, str):
        def type_fn(batch: pa.Table, rows: np.ndarray) -> list:
            col = _get_col(batch, path)
            jt = _arrow_json_type(col.type) if col is not None else "null"
            return [f"value is of type {jt}, expected {sv}"] * len(rows)
        return type_fn
    if kw == "multipleOf":
        def mult_fn(batch: pa.Table, rows: np.ndarray) -> list:
            col = _get_col(batch, path)
            if col is None:
                return [""] * len(rows)
            cells = col.take(pa.array(rows)).to_pylist()
            return [f"value {_gofmt(v)} is not a multiple of {_gofmt(sv)}"
                    for v in cells]
        return mult_fn
    if kw in ("minProperties", "maxProperties"):
        word = "less" if kw == "minProperties" else "more"

        def prop_fn(batch: pa.Table, rows: np.ndarray) -> list:
            col = _get_col(batch, path)
            if col is None:
                return [""] * len(rows)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cnts = _prop_count_cells(col.take(pa.array(rows)))
            return [f"{kw} can only be applied to objects" if c is None
                    else (f"object has {c} properties, which is {word} than "
                          f"{kw} {sv}")
                    for c in cnts]
        return prop_fn
    return None


def plan_needs_arrow_schema(table_schema: dict | str | CompiledSchema,
                            mode: Mode = Mode.STRICT) -> bool:
    """True when the table schema carries keywords whose column-plan
    compilation resolves PROPERTY NAMES (patternProperties /
    additionalProperties, at the top level or on nested struct paths) —
    those require the Arrow schema; callers without one compile lazily from
    the first batch (stages/validate.BatchValidator)."""
    compiled = (table_schema if isinstance(table_schema, CompiledSchema)
                else compile_schema(table_schema, mode))

    def walk(sub: CompiledSchema) -> bool:
        for kw, sv in sub.keywords.items():
            if kw in ("patternProperties", "additionalProperties"):
                return True
            if kw == "properties" and any(walk(c) for c in sv.values()):
                return True
            if kw == "items":
                subs = sv if isinstance(sv, list) else [sv]
                if any(walk(s) for s in subs if isinstance(s, CompiledSchema)):
                    return True
            if kw in ("allOf", "anyOf", "oneOf") and \
                    any(walk(s) for s in sv):
                return True
            if kw in ("not", "if", "then", "else") and \
                    isinstance(sv, CompiledSchema) and walk(sv):
                return True
            if kw == "conditional" and any(walk(s) for s in sv.values()):
                return True
        return False

    return walk(compiled)


def compile_table_plan(table_schema: dict | str | CompiledSchema,
                       key_column: str,
                       arrow_schema: pa.Schema | None = None,
                       mode: Mode = Mode.STRICT,
                       registry=None,
                       allow_unknown_fields: bool = False) -> TablePlan:
    """Compile a table-level schema into a vectorized plan.

    ``table_schema`` uses the same DSL as the value engine: top-level
    ``required`` lists non-null columns; ``properties`` maps column name →
    scalar keyword schema. ``arrow_schema`` (if given) resolves ``type``
    keywords at compile time and detects missing columns.

    ``patternProperties`` / ``additionalProperties`` resolve COLUMN NAMES at
    compile time (the reference resolves property names per document,
    `/root/reference/rules/object_patterns.go:11-180`; a typed table's
    "property names" are its columns, known statically) and therefore
    require ``arrow_schema`` — SchemaError otherwise.
    """
    compiled = (table_schema if isinstance(table_schema, CompiledSchema)
                else compile_schema(table_schema, mode))
    plan = TablePlan(key_column=key_column)

    cols_present: dict[str, pa.DataType] = {}
    if arrow_schema is not None:
        cols_present = {f.name: f.type for f in arrow_schema}

    for req in compiled.get("required", []):
        if arrow_schema is not None and req not in cols_present:
            fn: MaskFn = _all_const(False)
        else:
            def fn(batch: pa.Table, _c=req) -> pa.Array:
                if _c not in batch.column_names:
                    return pa.array(np.zeros(batch.num_rows, dtype=bool))
                return pc.fill_null(pc.is_valid(batch.column(_c)), False)
        plan.constraints.append(CompiledConstraint(
            constraint_id=f"required:{req}", column=req, tag="required",
            message=_MESSAGES["required"].format(column=req), param="",
            fn=fn))

    def emit(path: str, sub: CompiledSchema, col_type: pa.DataType | None) -> None:
        for kw, sv in sub.keywords.items():
            if kw in ("title", "description", "default", "examples",
                      "$id", "$schema", "$comment"):
                continue
            if kw == "properties":
                # nested struct column: recurse with dotted paths — kernels
                # descend via pc.struct_field (SURVEY.md §1.3 struct mapping);
                # a null ancestor nulls the leaf, which the null-as-absent
                # semantics already treat correctly
                for name, child in sv.items():
                    emit(f"{path}.{name}", child,
                         _struct_field_type(col_type, name))
                continue
            if kw in ("patternProperties", "additionalProperties"):
                if col_type is None and arrow_schema is not None:
                    continue  # field absent from the struct type: never present
                _emit_name_resolved(plan.constraints, path, sub, col_type,
                                    mode, registry, allow_unknown_fields,
                                    emit, kw, sv)
                continue
            if kw == "dependencies":
                _emit_dependencies(plan.constraints, f"{path}.", col_type,
                                   sv, mode, registry)
                continue
            if kw == "required":
                if col_type is not None and not pa.types.is_struct(col_type) \
                        and not pa.types.is_map(col_type):
                    # non-object value: ONE error per present cell
                    # ('value must be an object for required validation'),
                    # like the value engine — not one per required name
                    plan.constraints.append(CompiledConstraint(
                        constraint_id=f"required:{path}", column=path,
                        tag="required",
                        message="value must be an object for required "
                                "validation",
                        param="", fn=_fail_present(path)))
                    continue
                # nested required: fails where the PARENT is present but the
                # child property is absent — struct fields use non-null
                # value, MAP entries use KEY MEMBERSHIP (a null-valued entry
                # is a present key, the VE dict contract — _present_col)
                for name in sv:
                    child_path = f"{path}.{name}"

                    def fn(batch: pa.Table, _p=path, _c=child_path) -> pa.Array:
                        parent = _get_col(batch, _p)
                        if parent is None:
                            return pa.array(np.ones(batch.num_rows, dtype=bool))
                        pres = _present_col(batch, _c)
                        if pres is None:
                            return pc.fill_null(pc.is_null(parent), False)
                        return pc.fill_null(
                            pc.or_kleene(pc.is_null(parent), pres), True)

                    plan.constraints.append(CompiledConstraint(
                        constraint_id=f"required:{child_path}",
                        column=child_path, tag="required",
                        message=_MESSAGES["required"].format(column=child_path),
                        param="", fn=fn))
                continue
            if kw in ("then", "else"):
                continue  # consumed together with the sibling "if"
            custom = _custom_kernel(path, kw, sv, registry)
            if custom is not None:
                cfn, cmsg = custom
                plan.constraints.append(CompiledConstraint(
                    constraint_id=f"{kw}:{path}", column=path, tag=kw,
                    message=cmsg, param=str(sv), fn=cfn))
                continue
            special = _special_pair(path, kw, sv, mode, registry,
                                    siblings=sub)
            if special is not None:
                mask, cnt, msg, mfn, tfn = special
                tag = "conditional" if kw in ("if", "conditional") else kw
                plan.constraints.append(CompiledConstraint(
                    constraint_id=f"{tag}:{path}", column=path, tag=tag,
                    message=msg, param="", fn=mask, count_fn=cnt,
                    message_fn=mfn, tag_fn=tfn))
                continue
            kernel = _column_kernel(path, kw, sv, col_type, mode, registry)
            if kernel is None:
                continue
            if kw in (_STRING_KW | _NUMERIC_KW | _LIST_KW | {"enum"}):
                kernel = _guard_kernel(path, kw, sv, kernel, mode)
            if kw == "enum" and isinstance(sv, list):
                param = ", ".join(str(x) for x in sv)  # non-string enums too
            elif kw == "type" and isinstance(sv, list):
                param = ", ".join(sv)  # VE multi-type message wording
            elif kw in _NUMERIC_KW:
                param = _gofmt(sv)  # Go %v float rendering (5.0 → "5")
            else:
                param = str(sv)
            plan.constraints.append(CompiledConstraint(
                constraint_id=f"{kw}:{path}", column=path, tag=kw,
                message=_MESSAGES.get(kw, "validation failed for keyword " + kw)
                        .format(column=path, param=param),
                param=param, fn=kernel, message_fn=_message_fn(path, kw, sv)))

    for column, sub in (compiled.get("properties") or {}).items():
        emit(column, sub, cols_present.get(column))

    # --- table-level dependencies (property and schema form) ---------------
    if compiled.get("dependencies"):
        _emit_dependencies(plan.constraints, "", None,
                           compiled.get("dependencies"), mode, registry)

    # --- patternProperties / additionalProperties: column-name resolution --
    pattern_props = compiled.get("patternProperties") or {}
    addl = compiled.get("additionalProperties")
    if addl is True:
        addl = None  # explicitly-anything is a no-op
    if (pattern_props or addl is not None) and arrow_schema is None:
        raise SchemaError(
            "patternProperties/additionalProperties in a table plan resolve "
            "column names and need the Arrow schema (pass arrow_schema=, or "
            "let BatchValidator compile lazily from the first batch)")

    def emit_suffixed(path: str, sub: CompiledSchema,
                      col_type: pa.DataType | None, suffix: str) -> None:
        n0 = len(plan.constraints)
        emit(path, sub, col_type)
        for c in plan.constraints[n0:]:
            c.constraint_id += suffix

    for pat, (rx, sub) in pattern_props.items():
        # a column matching BOTH properties and a pattern gets both schemas
        # applied (reference object_patterns.go:11-62); suffixed ids keep
        # (key, constraint_id) rows distinct
        for column, col_type in cols_present.items():
            if rx.search(column):
                emit_suffixed(column, sub, col_type, f"#pattern={pat}")

    if addl is not None:
        declared = set((compiled.get("properties") or {}).keys())
        extras = [c for c in cols_present
                  if c not in declared
                  and not any(rx.search(c)
                              for rx, _s in pattern_props.values())]
        if addl is False:
            # bool form honors AllowUnknownFields
            # (`/root/reference/validator/validator.go:481-502`)
            if not allow_unknown_fields:
                for c in extras:
                    plan.constraints.append(CompiledConstraint(
                        constraint_id=f"additionalProperties:{c}", column=c,
                        tag="additionalProperties", message="unknown field",
                        param="", fn=_fail_present(c)))
        else:
            # schema form: every extra column validates against it
            for c in extras:
                emit_suffixed(c, addl, cols_present.get(c), "#additional")

    return plan


def evaluate_plan(plan: TablePlan, batch: pa.Table, *,
                  stop_on_first: bool = False
                  ) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Evaluate all constraints over one batch.

    Returns ``(valid, error_count, fail_indices_per_constraint)`` where
    ``valid`` is a bool ndarray, ``error_count`` int32 ndarray, and the list
    holds, per constraint, the row indices that failed it (for violation
    emission).

    ``stop_on_first`` mirrors the reference's StopOnFirstError short-circuit
    (`/root/reference/validator/validator.go:543-545`): a row reports only
    its FIRST failing constraint in plan order (required first, then
    per-column declaration order, then table-level dependencies /
    patternProperties / additionalProperties — the engine's deterministic
    fix of the reference's map-order nondeterminism; WHICH single error
    surfaces can differ from the value engine's declaration-order walk when
    those table-level keywords are present), so error_count is 0 or 1 per
    row."""
    n = batch.num_rows
    valid = np.ones(n, dtype=bool)
    error_count = np.zeros(n, dtype=np.int32)
    fails: list[np.ndarray] = []
    for c in plan.constraints:
        if c.count_fn is not None:
            # per-element accumulating keywords (items): counts carry the
            # dynamic-regime error arithmetic (one per failing element ×
            # failing child keyword). Fail indices REPEAT once per child
            # violation, so the violations builder emits one row per
            # failing child constraint — matching VE/reference recursion
            # (rules/array.go:43-76) — with per-occurrence tag/message
            # threaded by the items detail fn.
            cnt = c.count_fn(batch)
            if stop_on_first:
                cnt = np.minimum(np.where(valid, cnt, 0), 1)
            failed = np.repeat(np.arange(n), cnt)
            fails.append(failed)
            if failed.size:
                valid[failed] = False
                error_count += cnt
            continue
        mask = c.pass_mask(batch)
        m = mask.to_numpy(zero_copy_only=False)
        failed = np.flatnonzero(~m)
        if stop_on_first:
            failed = failed[valid[failed]]
        fails.append(failed)
        if failed.size:
            valid[failed] = False
            error_count[failed] += 1
    return valid, error_count, fails
