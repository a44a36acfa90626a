"""Struct-tag mini-DSL: the reference's ``parseTag`` / ``Var`` / ``Struct``
entry points re-expressed for dict records.

Reference: ``parseTag`` (`/root/reference/validator/validator.go:577-615`)
turns ``"required,min=5,enum=a|b|c"`` into a schema map; ``Var``
(validator.go:268-286) validates one value against a tag; ``StructCtx``
(validator.go:139-265) walks struct fields, applying each field's tag with
``required`` meaning "not the zero value" (``isZero``, validator.go:617-641).

Documented deviations:
- ``min``/``max`` translate to ``minimum``/``maximum`` at validation time
  (the reference emits them verbatim, where they'd hit the unknown-keyword
  path; the tag DSL's documented intent is numeric bounds);
- ``required`` in a tag means "present and not zero-valued" per the Struct
  path's ``isZero`` semantics (empty string, 0, empty list, None are zero).

The Ray-native analogue of the Struct path is :func:`record_schema`: a dict
of field→tag compiled once into a column-regime table schema usable with
``stages.validate.BatchValidator`` / ``plan.compile_table_plan``.
"""

from __future__ import annotations

from typing import Any

from ..errors import Mode, ValidationError, ValidationResult
from ..value_engine import Options, ValueEngine

_NUMERIC_TAG_KEYS = {"min", "max", "minLength", "maxLength", "minimum", "maximum"}
_STRING_TAG_KEYS = {"type", "pattern", "format"}


def parse_tag(tag: str) -> dict[str, Any]:
    """``"required,min=5,enum=a|b|c"`` → keyword map
    (byte-compatible with `/root/reference/validator/validator.go:577-615`)."""
    result: dict[str, Any] = {}
    if not tag:
        return result
    for part in tag.split(","):
        part = part.strip()
        if not part:
            continue
        if part == "required":
            result["required"] = True
        elif "=" in part:
            key, _, value = part.partition("=")
            key, value = key.strip(), value.strip()
            if key in _NUMERIC_TAG_KEYS:
                try:
                    result[key] = int(value)
                except ValueError:
                    try:
                        result[key] = float(value)
                    except ValueError:
                        result[key] = value  # keep raw; validator will reject
            elif key in _STRING_TAG_KEYS:
                result[key] = value
            elif key == "enum":
                result[key] = value.split("|")
            else:
                result[key] = value
        else:
            result[part] = True
    return result


def _tag_to_schema(tag_map: dict[str, Any]) -> tuple[dict[str, Any], bool]:
    """→ (value-schema without ``required``, required_flag)."""
    schema = {}
    required = False
    for k, v in tag_map.items():
        if k == "required":
            required = bool(v)
        elif k == "min":
            schema["minimum"] = v
        elif k == "max":
            schema["maximum"] = v
        else:
            schema[k] = v
    return schema, required


def is_zero(value: Any) -> bool:
    """Go zero-value semantics (`validator.go:617-641`)."""
    if value is None:
        return True
    if isinstance(value, bool):
        return not value
    if isinstance(value, str):
        return value == ""
    if isinstance(value, (int, float)):
        return value == 0
    if isinstance(value, (list, dict, tuple, set)):
        return len(value) == 0
    return False


def var(value: Any, tag: str, *, mode: Mode = Mode.STRICT,
        engine: ValueEngine | None = None) -> ValidationResult:
    """Validate one value against a tag string (reference ``Var``,
    validator.go:268-286)."""
    schema, required = _tag_to_schema(parse_tag(tag))
    result = ValidationResult()
    if required and is_zero(value):
        result.add(ValidationError(
            path="$", message="value is required", tag="required"))
        return result
    e = engine or ValueEngine(Options(mode=mode))
    sub = e.validate(value, schema)
    result.extend(sub.errors)
    return result


def validate_record(record: dict[str, Any],
                    field_tags: dict[str, "str | dict"], *,
                    mode: Mode = Mode.STRICT,
                    custom_validate=None,
                    recursive: bool = True,
                    _path: str = "$") -> ValidationResult:
    """Validate one dict record field-by-field against tag strings — the
    reference's ``Struct`` path (validator.go:139-265) for plain dicts.

    - a dict value in ``field_tags`` declares a NESTED record's tags; with
      ``recursive=True`` (reference ``RecursiveValidation``) the field's dict
      value is validated against them with dotted path prefixes
      (validator.go:224-245);
    - ``custom_validate(field, value) -> (ok, message|None)`` is the
      per-field hook of ``SetCustomValidateFunc``
      (validator.go:129-131,181-204), run before the tag rules.
    """
    e = ValueEngine(Options(mode=mode))
    result = ValidationResult()
    for field, tag in field_tags.items():
        value = record.get(field)
        path = f"{_path}.{field}"
        if isinstance(tag, dict):
            if recursive and isinstance(value, dict):
                sub = validate_record(value, tag, mode=mode,
                                      custom_validate=custom_validate,
                                      recursive=recursive, _path=path)
                result.extend(sub.errors)
            continue
        if custom_validate is not None:
            ok, msg = custom_validate(field, value)
            if not ok:
                result.add(ValidationError(
                    path=path, message=msg or "custom validation failed",
                    tag="custom"))
                continue
        schema, required = _tag_to_schema(parse_tag(tag))
        if required and is_zero(value):
            result.add(ValidationError(
                path=path,
                message=f"field '{field}' is required", tag="required"))
            continue
        if field in record and schema:
            sub = e.validate(value, schema, path=path)
            result.extend(sub.errors)
    return result


def record_schema(field_tags: dict[str, str]) -> dict[str, Any]:
    """Compile field→tag maps into the column-regime table schema (the
    Ray-native Struct path: use with ``plan.compile_table_plan`` /
    ``stages.validate.BatchValidator`` over a typed table)."""
    props: dict[str, Any] = {}
    required: list[str] = []
    for field, tag in field_tags.items():
        schema, req = _tag_to_schema(parse_tag(tag))
        if req:
            required.append(field)
        if schema:
            props[field] = schema
    out: dict[str, Any] = {}
    if required:
        out["required"] = required
    if props:
        out["properties"] = props
    return out
