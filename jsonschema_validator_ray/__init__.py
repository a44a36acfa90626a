"""jsonschema_validator_ray — a Ray-Data-native schema + constraint
validation engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
songzhibin97/jsonschema-validator (reference snapshot at /root/reference),
re-expressed Ray-Data-first:

- declarative constraint DSL (all reference keywords, SURVEY.md §2.1/2.2)
  compiled on the driver to vectorized Arrow predicates (``plan.py``);
- one ``Dataset.map_batches`` actor-pool stage evaluating the plan over
  zero-copy Arrow batches, emitting verdicts + violations (``stages/validate``);
- a per-value recursive engine for nested/dynamic-JSON documents and for
  conformance parity with the reference's Go test tables (``value_engine``);
- table-level checks: column stats + sketches, uniqueness, referential,
  distribution drift (``stages/``, ``state/``);
- webtext synthesis, resumable Parquet sink with lineage, dedup / similarity /
  text-analysis pipeline stages for large-scale training-data work.

IMPORTANT: nothing in this package calls ``ray.init``/``ray.shutdown`` — the
hosting process (driver, bench.py, pytest fixture) owns the Ray session.
"""

import logging as _logging

# Ray's sort/concat schema-deduplication logs "Failed to hash the schemas"
# (transform_pyarrow.py:181) whenever a block schema carries pandas
# provenance metadata — hash(pa.Schema-with-metadata) raises on the dict.
# Our shuffle stages strip the metadata at their boundaries
# (stages/util.no_meta) and reads go through sources/parquet.read_parquet,
# but blocks built by Ray itself from pandas ``map_groups`` outputs
# re-attach the metadata, and the condition is benign (the dedup just
# falls back to full unification). A plain ``setLevel`` does NOT stick:
# Ray Data re-runs ``configure_logging()`` per dataset in every worker,
# and ``logging.config.dictConfig`` resets the LEVEL (to NOTSET) and
# handlers of every existing child of its configured ``ray.data`` logger —
# but it never touches logger FILTERS, so a filter is the one hook that
# survives (VERDICT r2 item 8).


class _DropSchemaHashNoise(_logging.Filter):
    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return not str(record.getMessage()).startswith(
            "Failed to hash the schemas")


_tp_logger = _logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow")
if not any(isinstance(f, _DropSchemaHashNoise) for f in _tp_logger.filters):
    _tp_logger.addFilter(_DropSchemaHashNoise())

from .errors import (
    ErrorFormat,
    Mode,
    SchemaError,
    ValidationError,
    ValidationResult,
    format_errors,
)
from .formats import FORMAT_VALIDATORS, register_format
from .registry import Registry, RegistryError
from .schema import CompiledSchema, compile_schema, parse_schema
from .value_engine import Options, ValueEngine, check_type, json_type_of, to_float
from .plan import TablePlan, compile_table_plan
from .functions.tagparse import parse_tag, record_schema, validate_record, var

__all__ = [
    "ErrorFormat",
    "Mode",
    "SchemaError",
    "ValidationError",
    "ValidationResult",
    "format_errors",
    "FORMAT_VALIDATORS",
    "register_format",
    "Registry",
    "RegistryError",
    "CompiledSchema",
    "compile_schema",
    "parse_schema",
    "Options",
    "ValueEngine",
    "check_type",
    "json_type_of",
    "to_float",
    "TablePlan",
    "compile_table_plan",
    "parse_tag",
    "record_schema",
    "validate_record",
    "var",
]

__version__ = "0.1.0"
