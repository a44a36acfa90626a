"""Schema parse + compile.

Reference: `/root/reference/schema/schema.go` — ``Parse`` (36-58) and
``Compile`` (61-297). Compilation validates keyword well-formedness ONCE and
coerces schema values to canonical types (bounds → float, lengths → int,
``required`` → list[str], regexes pre-compiled), so the per-row / per-batch
hot path never re-checks the schema. ``$ref`` is rejected in strict mode
(schema.go:277-281); unknown keywords are rejected in strict mode
(schema.go:284-293).

The compiled form is a plain dict tree with insertion order preserved —
this fixes the reference's Go-map keyword-order nondeterminism (SURVEY.md §3.3)
into a deterministic evaluation order: ``required`` first, then declaration
order.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from .errors import Mode, SchemaError

JSON_TYPES = {"string", "number", "integer", "boolean", "object", "array", "null"}

METADATA_KEYS = {"title", "description", "default", "examples", "$id", "$schema", "$comment"}

# Keywords the engine understands (SURVEY.md §2.1 inventory).
KNOWN_KEYWORDS = {
    "type", "required", "enum", "format",
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
    "minLength", "maxLength", "pattern",
    "items", "minItems", "maxItems", "uniqueItems",
    "properties", "minProperties", "maxProperties",
    "patternProperties", "additionalProperties", "dependencies",
    "allOf", "anyOf", "oneOf", "not",
    "if", "then", "else", "conditional",
}


@dataclass
class CompiledSchema:
    """Validated, type-coerced keyword map (reference ``CompiledSchema``,
    `/root/reference/schema/schema.go:29-33`). ``keywords`` preserves
    declaration order; sub-schemas are compiled recursively in place."""

    keywords: dict[str, Any] = field(default_factory=dict)
    mode: Mode = Mode.STRICT

    def get(self, kw: str, default: Any = None) -> Any:
        return self.keywords.get(kw, default)

    def __contains__(self, kw: str) -> bool:
        return kw in self.keywords


def parse_schema(schema: str | dict[str, Any]) -> dict[str, Any]:
    """JSON string or dict → raw schema map (reference ``schema.Parse``,
    schema.go:36-58)."""
    if isinstance(schema, str):
        try:
            raw = json.loads(schema)
        except json.JSONDecodeError as e:
            raise SchemaError(f"invalid schema JSON: {e}") from e
    else:
        raw = schema
    if not isinstance(raw, dict):
        raise SchemaError("schema must be a JSON object")
    return raw


def _require_number(kw: str, v: Any) -> float:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise SchemaError(f"{kw} must be a number, got {type(v).__name__}")
    return float(v)


def _require_nonneg_int(kw: str, v: Any) -> int:
    if isinstance(v, bool):
        raise SchemaError(f"{kw} must be a non-negative integer")
    if isinstance(v, float) and v != int(v):
        raise SchemaError(f"{kw} must be a non-negative integer")
    if not isinstance(v, (int, float)):
        raise SchemaError(f"{kw} must be a non-negative integer")
    i = int(v)
    if i < 0:
        raise SchemaError(f"{kw} must be a non-negative integer")
    return i


def compile_schema(raw: str | dict[str, Any], mode: Mode = Mode.STRICT) -> CompiledSchema:
    """Validate + coerce one schema level, recursing into sub-schemas.

    Coercions mirror `/root/reference/schema/schema.go:61-297`:
    type normalization (73-92), numeric bounds → float (95-103),
    lengths → int (106-133), ``properties`` sub-compile (136-153),
    ``patternProperties`` regex pre-check (156-178), ``dependencies``
    (181-209), ``items`` object/tuple (212-243), ``additionalProperties``
    (246-261), ``required`` → list[str] (264-274), ``$ref`` rejection
    (277-281), unknown-keyword rejection in strict mode (284-293).
    """
    raw = parse_schema(raw)
    out = CompiledSchema(mode=mode)

    for kw, v in raw.items():
        if kw in METADATA_KEYS:
            out.keywords[kw] = v
            continue
        if kw == "$ref":
            if mode is Mode.STRICT:
                raise SchemaError('"$ref" is not supported')
            continue
        if kw not in KNOWN_KEYWORDS:
            if mode is Mode.STRICT:
                raise SchemaError(f"unknown validation keyword: {kw}")
            out.keywords[kw] = v
            continue

        if kw == "type":
            if isinstance(v, str):
                types = [v]
            elif isinstance(v, list) and all(isinstance(t, str) for t in v):
                types = v
            else:
                raise SchemaError("type must be a string or an array of strings")
            for t in types:
                if t not in JSON_TYPES:
                    raise SchemaError(f"invalid type: {t}")
            out.keywords[kw] = v if isinstance(v, str) else list(v)

        elif kw in ("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"):
            out.keywords[kw] = _require_number(kw, v)

        elif kw == "multipleOf":
            f = _require_number(kw, v)
            if f <= 0:
                raise SchemaError("multipleOf must be a positive number")
            out.keywords[kw] = f

        elif kw in ("minLength", "maxLength", "minItems", "maxItems",
                    "minProperties", "maxProperties"):
            out.keywords[kw] = _require_nonneg_int(kw, v)

        elif kw == "pattern":
            if not isinstance(v, str):
                raise SchemaError("pattern must be a string")
            try:
                re.compile(v)
            except re.error as e:
                raise SchemaError(f"invalid pattern: {e}") from e
            out.keywords[kw] = v

        elif kw == "required":
            if not isinstance(v, list) or not all(isinstance(x, str) for x in v):
                raise SchemaError("required must be an array of strings")
            out.keywords[kw] = list(v)

        elif kw == "enum":
            if not isinstance(v, list) or not v:
                raise SchemaError("enum must be a non-empty array")
            out.keywords[kw] = list(v)

        elif kw == "format":
            if not isinstance(v, str):
                raise SchemaError("format must be a string")
            out.keywords[kw] = v

        elif kw == "properties":
            if not isinstance(v, dict):
                raise SchemaError("properties must be an object")
            out.keywords[kw] = {
                name: compile_schema(sub, mode) for name, sub in v.items()
            }

        elif kw == "patternProperties":
            if not isinstance(v, dict):
                raise SchemaError("patternProperties must be an object")
            compiled: dict[str, tuple[re.Pattern, CompiledSchema]] = {}
            for pat, sub in v.items():
                try:
                    rx = re.compile(pat)
                except re.error as e:
                    raise SchemaError(f"invalid patternProperties regex {pat!r}: {e}") from e
                compiled[pat] = (rx, compile_schema(sub, mode))
            out.keywords[kw] = compiled

        elif kw == "additionalProperties":
            if isinstance(v, bool):
                out.keywords[kw] = v
            elif isinstance(v, dict):
                out.keywords[kw] = compile_schema(v, mode)
            else:
                raise SchemaError("additionalProperties must be a boolean or an object")

        elif kw == "dependencies":
            if not isinstance(v, dict):
                raise SchemaError("dependencies must be an object")
            deps: dict[str, Any] = {}
            for prop, dep in v.items():
                if isinstance(dep, list):
                    if not all(isinstance(d, str) for d in dep):
                        raise SchemaError(
                            f"dependency list for property '{prop}' must contain strings"
                        )
                    deps[prop] = list(dep)
                elif isinstance(dep, dict):
                    deps[prop] = compile_schema(dep, mode)
                else:
                    raise SchemaError(
                        f"dependency for property '{prop}' must be an array or an object"
                    )
            out.keywords[kw] = deps

        elif kw == "items":
            if isinstance(v, dict):
                out.keywords[kw] = compile_schema(v, mode)
            elif isinstance(v, list):
                out.keywords[kw] = [compile_schema(s, mode) for s in v]
            else:
                raise SchemaError("items must be an object or array")

        elif kw == "uniqueItems":
            if not isinstance(v, bool):
                raise SchemaError("uniqueItems must be a boolean")
            out.keywords[kw] = v

        elif kw in ("allOf", "anyOf", "oneOf"):
            if not isinstance(v, list):
                raise SchemaError(f"{kw} must be an array")
            if not v:
                raise SchemaError(f"{kw} cannot be empty")
            out.keywords[kw] = [compile_schema(s, mode) for s in v]

        elif kw == "not":
            if not isinstance(v, dict):
                raise SchemaError("not must be an object")
            if not v:
                raise SchemaError("not schema cannot be empty")
            out.keywords[kw] = compile_schema(v, mode)

        elif kw in ("if", "then", "else"):
            if not isinstance(v, dict):
                raise SchemaError(f"{kw} must be an object")
            out.keywords[kw] = compile_schema(v, mode)

        elif kw == "conditional":
            # Non-standard wrapper {"conditional": {if, then, else}} — the
            # reference's *working* conditional path
            # (`/root/reference/rules/conditional_rules.go:134-245`).
            if not isinstance(v, dict):
                raise SchemaError("conditional must be an object")
            sub = {}
            for k2 in ("if", "then", "else"):
                if k2 in v:
                    if not isinstance(v[k2], dict):
                        raise SchemaError(f"{k2} must be an object")
                    sub[k2] = compile_schema(v[k2], mode)
            out.keywords[kw] = sub

    return out


def schema_to_json(c: CompiledSchema) -> str:
    """Round-trip a compiled schema back to canonical JSON (for plan shipping
    / cache keys). Pattern objects render back to their source strings."""

    def _unc(v: Any) -> Any:
        if isinstance(v, CompiledSchema):
            return {k: _unc(x) for k, x in v.keywords.items()}
        if isinstance(v, dict):
            out = {}
            for k, x in v.items():
                if isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], re.Pattern):
                    out[k] = _unc(x[1])
                else:
                    out[k] = _unc(x)
            return out
        if isinstance(v, list):
            return [_unc(x) for x in v]
        return v

    return json.dumps({k: _unc(v) for k, v in c.keywords.items()},
                      sort_keys=True, ensure_ascii=False)
