"""Small shared Arrow helpers for stages."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa


def write_meta(path: str, meta: dict) -> None:
    """Atomic ``meta.json`` swap — the single commit point of every
    generational store (hashindex, minhashindex, statestore, vocabstore,
    the ingest pipeline): data directories land first, then the meta
    replace publishes them. A crash before the replace leaves the previous
    meta (and therefore the previous generation list) intact."""
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "meta.json"))


def read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def fresh_dir(path: str) -> str:
    """Clear-and-return a generation data directory before writing it.
    Generation names derive from the meta's generation COUNT, so a retry
    after a crash mid-write reuses the same name — without this, Ray's
    ``write_parquet`` (uuid-named files, append-only) would merge the
    crashed attempt's partial files into the retried generation."""
    shutil.rmtree(path, ignore_errors=True)
    return path


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
