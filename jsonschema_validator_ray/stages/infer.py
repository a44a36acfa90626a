"""Schema inference: derive a validating JSON schema FROM a dataset.

The reference engine validates data against a hand-written schema
(`schema/schema.go` compile → rules); this stage closes the loop for the
Ray engine by inferring that schema from the data itself — the standard
bootstrap for validating a new 100-TB corpus drop: infer on yesterday's
partitions, validate today's against the result.

Shape (same partial/merge discipline as stages/stats.py): a ``map_batches``
stage emits ONE bounded partial row per (column, batch) — count, nulls,
numeric min/max, byte-length min/max, list-length min/max, and a capped
distinct-value set (≤ ``enum_max`` values, poisoned to a marker beyond the
cap, so the shuffle carries at most ``enum_max`` scalars per partial, never
the column) — then a tiny ``groupby("column").map_groups`` merges partials
(one group per column; column count is small by construction). The merged
profile becomes a draft-style schema dict directly consumable by the
engine's own compile path:

- every column with zero nulls → ``required``
- int → ``{"type": "integer", "minimum", "maximum"}``; float → ``number``
- string → ``{"type": "string", "minLength", "maxLength"}`` (BYTE lengths,
  Go ``len()`` parity) + ``enum`` when distinct ≤ ``enum_max``
- bool → ``boolean``; timestamp/date → string with ``format``
- list → ``{"type": "array", "minItems", "maxItems", "items": {...}}``
- struct / map → ``{"type": "object"}``
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("dtype", pa.string()),
    ("cnt", pa.int64()),
    ("nulls", pa.int64()),
    ("min_num", pa.float64()),
    ("max_num", pa.float64()),
    ("min_int", pa.int64()),     # integer columns: exact bounds — a
    ("max_int", pa.int64()),     # float64 funnel would round past 2^53
    ("min_len", pa.int64()),
    ("max_len", pa.int64()),
    ("min_items", pa.int64()),
    ("max_items", pa.int64()),
    ("enum_json", pa.string()),   # JSON list of distinct values, or null
    ("enum_over", pa.bool_()),    # True once the distinct cap is crossed
])

_ENUMABLE = (pa.types.is_integer, pa.types.is_string,
             pa.types.is_large_string, pa.types.is_boolean)


def _scalar_min_max(col: pa.ChunkedArray):
    mm = pc.min_max(col)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    return lo, hi


class InferPartial:
    """Task stage: batch → one bounded profile row per column."""

    def __init__(self, columns: list[str] | None = None, enum_max: int = 16):
        self.columns = columns
        self.enum_max = enum_max

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {f.name: [] for f in PARTIAL_SCHEMA}
        for name in (self.columns or batch.column_names):
            col = batch.column(name)
            t = col.type
            rows["column"].append(name)
            rows["dtype"].append(str(t))
            rows["cnt"].append(len(col))
            rows["nulls"].append(col.null_count)
            min_num = max_num = None
            min_int = max_int = None
            min_len = max_len = None
            min_items = max_items = None
            enum_json, enum_over = None, False
            if pa.types.is_integer(t):
                lo, hi = _scalar_min_max(col)
                min_int, max_int = lo, hi     # python ints — exact
            elif pa.types.is_floating(t):
                lo, hi = _scalar_min_max(col)
                min_num = float(lo) if lo is not None else None
                max_num = float(hi) if hi is not None else None
            elif pa.types.is_string(t) or pa.types.is_large_string(t) or \
                    pa.types.is_binary(t):
                lens = pc.binary_length(col)   # BYTE length (Go len parity)
                lo, hi = _scalar_min_max(lens)
                min_len, max_len = lo, hi
            elif pa.types.is_list(t) or pa.types.is_large_list(t) or \
                    pa.types.is_fixed_size_list(t):
                lo, hi = _scalar_min_max(pc.list_value_length(col))
                min_items, max_items = lo, hi
            if any(p(t) for p in _ENUMABLE):
                u = pc.unique(pc.drop_null(col.combine_chunks()))
                if len(u) <= self.enum_max:
                    enum_json = json.dumps(sorted(u.to_pylist()))
                else:
                    enum_over = True
            rows["min_num"].append(min_num)
            rows["max_num"].append(max_num)
            rows["min_int"].append(min_int)
            rows["max_int"].append(max_int)
            rows["min_len"].append(min_len)
            rows["max_len"].append(max_len)
            rows["min_items"].append(min_items)
            rows["max_items"].append(max_items)
            rows["enum_json"].append(enum_json)
            rows["enum_over"].append(enum_over)
        return pa.table(rows, schema=PARTIAL_SCHEMA)


def _merge_profiles(enum_max: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        def agg_min(s):
            s = s.dropna()
            return s.min() if len(s) else None

        def agg_max(s):
            s = s.dropna()
            return s.max() if len(s) else None

        over = bool(g["enum_over"].any())
        values: set = set()
        if not over:
            for js in g["enum_json"].dropna():
                values.update(json.loads(js))
                if len(values) > enum_max:
                    over = True
                    break
        n_distinct_capped = (enum_max + 1) if over else len(values)
        enum_json = None if over or not values \
            else json.dumps(sorted(values))
        return pd.DataFrame({
            "column": [g["column"].iloc[0]],
            "dtype": [g["dtype"].iloc[0]],
            "cnt": [int(g["cnt"].sum())],
            "nulls": [int(g["nulls"].sum())],
            "min_num": [agg_min(g["min_num"])],
            "max_num": [agg_max(g["max_num"])],
            "min_int": [agg_min(g["min_int"])],
            "max_int": [agg_max(g["max_int"])],
            "min_len": [agg_min(g["min_len"])],
            "max_len": [agg_max(g["max_len"])],
            "min_items": [agg_min(g["min_items"])],
            "max_items": [agg_max(g["max_items"])],
            "n_distinct_capped": [n_distinct_capped],
            "enum_json": [enum_json],
        })
    return merge


def column_profiles(ds, columns: list[str] | None = None, *,
                    enum_max: int = 16, batch_size: int = 65536):
    """→ Dataset of one merged profile row per column."""
    partials = ds.map_batches(
        InferPartial, fn_constructor_args=(columns, enum_max),
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 2))
    return partials.groupby("column").map_groups(
        _merge_profiles(enum_max), batch_format="pandas")


def _prop_from_profile(r: pd.Series, enum_max: int) -> dict:
    t = pa.type_for_alias(r["dtype"]) if r["dtype"] in (
        "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
        "uint64", "float", "double", "float32", "float64", "string",
        "binary", "bool") else None
    dtype = r["dtype"]
    if t is not None and pa.types.is_integer(t):
        prop: dict = {"type": "integer"}
        if r["min_int"] is not None and not pd.isna(r["min_int"]):
            prop["minimum"] = int(r["min_int"])
            prop["maximum"] = int(r["max_int"])
        if r["enum_json"]:
            prop["enum"] = json.loads(r["enum_json"])
        return prop
    if t is not None and pa.types.is_floating(t):
        prop = {"type": "number"}
        if r["min_num"] is not None and not pd.isna(r["min_num"]):
            prop["minimum"] = float(r["min_num"])
            prop["maximum"] = float(r["max_num"])
        return prop
    if dtype == "bool":
        return {"type": "boolean"}
    if dtype in ("string", "large_string", "binary"):
        prop = {"type": "string"}
        if r["min_len"] is not None and not pd.isna(r["min_len"]):
            prop["minLength"] = int(r["min_len"])
            prop["maxLength"] = int(r["max_len"])
        if r["enum_json"]:
            prop["enum"] = json.loads(r["enum_json"])
        return prop
    if dtype.startswith("timestamp"):
        return {"type": "string", "format": "date-time"}
    if dtype.startswith("date"):
        return {"type": "string", "format": "date"}
    if dtype.startswith(("list", "large_list", "fixed_size_list")):
        inner = dtype.split("<", 1)[1].rsplit(">", 1)[0]
        item_t = inner.split(":", 1)[-1].strip()
        jt = ("integer" if item_t.startswith(("int", "uint")) else
              "number" if item_t in ("float", "double", "half_float") else
              "string" if item_t == "string" else None)
        prop = {"type": "array"}
        if jt:
            prop["items"] = {"type": jt}
        if r["min_items"] is not None and not pd.isna(r["min_items"]):
            prop["minItems"] = int(r["min_items"])
            prop["maxItems"] = int(r["max_items"])
        return prop
    if dtype.startswith(("struct", "map")):
        return {"type": "object"}
    return {}


def infer_schema(ds, columns: list[str] | None = None, *,
                 enum_max: int = 16, batch_size: int = 65536) -> dict:
    """Infer a JSON schema dict for ``ds`` (see module docstring). The
    result feeds straight into the engine's compile path — validating the
    profiled data against it yields zero violations by construction."""
    prof = column_profiles(ds, columns, enum_max=enum_max,
                           batch_size=batch_size).to_pandas()
    props, required = {}, []
    for _, r in prof.iterrows():
        props[r["column"]] = _prop_from_profile(r, enum_max)
        if r["nulls"] == 0:
            required.append(r["column"])
    return {"type": "object", "required": sorted(required),
            "properties": props}
