"""File-format ingestion → validation conveniences.

Parquet is the primary format (column pruning + row-group pushdown); these
wire the other Ray Data sources into the same validation machinery so a
reference user's JSONL/CSV corpora run unchanged:

- JSONL / CSV of FLAT records → typed columns via ``ray.data.read_json`` /
  ``read_csv`` → the vectorized column plan;
- JSONL of NESTED documents (kept raw) → ``read_text`` + a per-line id →
  the dynamic-JSON regime (`stages/validate.JsonColumnValidator`).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

import ray.data

from ..errors import Mode
from ..stages.validate import JsonColumnValidator, validate_dataset


def validate_jsonl(paths, table_schema: dict, key_column: str, *,
                   mode: Mode = Mode.STRICT, **kwargs):
    """Flat JSONL records → typed columns → vectorized validation.
    Returns the combined verdicts dataset (see validate_dataset)."""
    ds = ray.data.read_json(paths)
    return validate_dataset(ds, table_schema, key_column, mode, **kwargs)


def validate_csv(paths, table_schema: dict, key_column: str, *,
                 mode: Mode = Mode.STRICT, **kwargs):
    """CSV → typed columns → vectorized validation."""
    ds = ray.data.read_csv(paths)
    return validate_dataset(ds, table_schema, key_column, mode, **kwargs)


def validate_jsonl_documents(paths, schema: dict, *,
                             mode: Mode = Mode.STRICT,
                             batch_size: int = 4096,
                             concurrency: int = 2):
    """NESTED JSONL documents validated per line by the recursive engine
    (dynamic-JSON regime). The line number within the corpus becomes the
    key (``line_id``); schemas with recursion/combinators work here."""
    ds = ray.data.read_text(paths)

    def add_ids(batch: pa.Table) -> pa.Table:
        # stable-enough id: hash of the line content (content-addressed;
        # exact duplicate lines share an id, which the dedup stages expose)
        import pandas as pd

        h = pd.util.hash_pandas_object(
            batch.column("text").to_pandas(), index=False).to_numpy()
        return pa.table({"line_id": pa.array(h.astype("uint64")),
                         "doc": batch.column("text")})

    with_ids = ds.map_batches(add_ids, batch_format="pyarrow")
    return with_ids.map_batches(
        JsonColumnValidator,
        fn_constructor_args=(schema, "line_id", "doc", mode),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))
