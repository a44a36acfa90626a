"""Small shared Arrow helpers for stages."""

from __future__ import annotations

import pyarrow as pa


def no_meta(t: pa.Table) -> pa.Table:
    """Drop table-level schema metadata (pandas provenance). A
    ``pa.Schema`` carrying metadata is UNHASHABLE (``hash(schema)`` raises
    on the metadata dict), so every Ray Data sort/concat that tries to
    deduplicate block schemas logs "Failed to hash the schemas" per reduce
    task (VERDICT r2 item 8). Pandas-written parquet files and pandas
    ``map_groups`` outputs both carry the metadata; stages that forward an
    input table into a shuffle (``append_column`` bucket-adders) strip it
    here — stages that build fresh ``pa.table({...})`` outputs are already
    clean. The metadata is provenance only; dropping it changes no data."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t
