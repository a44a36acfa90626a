"""Per-value recursive validator — the conformance core.

Mirrors the reference's compiled-path interpreter
(`/root/reference/validator/validator.go:321-549` ``validateCompiledSchema``)
and the per-keyword rules (`/root/reference/rules/*.go`) with these
*documented deviations* (all directed by SURVEY.md):

- **Deterministic keyword order**: ``required`` first, then schema-declaration
  order (the reference iterates a Go map — nondeterministic, SURVEY.md §3.3).
- **if/then/else evaluated correctly** via mask semantics
  ``viol = (if_ok & ~then_ok) | (~if_ok & ~else_ok)`` — the reference's
  standalone keywords are broken (ctx flag never propagates,
  `/root/reference/rules/conditional_rules.go:52,64-67,103-105`); we implement
  the behavior of its *working* ``conditional`` wrapper
  (`conditional_rules.go:134-245`) for both spellings.
- **enum generalized**: the reference only accepts ``[]string``
  (`/root/reference/rules/rule.go:144-167`); for all-string enums we mirror its
  verdicts and messages exactly, and additionally support non-string scalar
  enums by equality (an extension; no reference fixture exercises it).

Violation message strings are byte-identical to the reference's where our
fixtures assert substrings (e.g. "less than minimum", "unknown field",
"required property '%s' is missing").

This engine is used (a) directly by the conformance fixtures and (b) inside
``map_batches`` for the dynamic-JSON column regime (``stages/validate.py``);
the flat typed-column regime uses the vectorized plan in ``plan.py`` instead.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from typing import Any

from .errors import Mode, ValidationError, ValidationResult
from .formats import FORMAT_VALIDATORS
from .registry import Registry
from .schema import METADATA_KEYS, CompiledSchema, compile_schema

_NUM_PREFIX_RE = re.compile(r"^\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?")


@dataclass
class Options:
    """Engine options (reference `/root/reference/validator/options.go:9-30`).
    ``enable_caching`` mirrors the reference's compile-once schema cache
    (``sync.Map`` keyed by the raw schema string,
    `/root/reference/validator/validator.go:296-313`) — semantically inert,
    so it defaults on here."""

    mode: Mode = Mode.STRICT
    stop_on_first_error: bool = False
    allow_unknown_fields: bool = False
    enable_caching: bool = True


def to_float(value: Any) -> tuple[float, bool]:
    """Numeric coercion incl. the numeric-string quirk
    (`/root/reference/rules/utils.go:19-61`: ``fmt.Sscanf(v, "%f")`` parses a
    leading float and ignores trailing bytes — mirrored with a prefix regex).
    Go has no bool-in-numeric-switch; Python bools are ints, so exclude them."""
    if isinstance(value, bool):
        return 0.0, False
    if isinstance(value, (int, float)):
        return float(value), True
    if isinstance(value, str):
        m = _NUM_PREFIX_RE.match(value)
        if m:
            return float(m.group(0)), True
        return 0.0, False
    return 0.0, False


def json_type_of(value: Any) -> str:
    """Type tag per the reference's value universe
    (`/root/reference/rules/type.go:74-123`)."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, str):
        return "string"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    if isinstance(value, dict):
        return "object"
    if isinstance(value, list):
        return "array"
    return "unknown"


def check_type(value: Any, type_name: str) -> bool:
    """`/root/reference/rules/type.go:74-123`: ``number`` accepts all numerics;
    ``integer`` accepts ints and floats with integral value (type.go:96-99)."""
    if value is None:
        return type_name == "null"
    if type_name == "string":
        return isinstance(value, str)
    if type_name == "boolean":
        return isinstance(value, bool)
    if type_name == "number":
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if type_name == "integer":
        if isinstance(value, bool):
            return False
        if isinstance(value, int):
            return True
        if isinstance(value, float):
            return value == float(int(value)) if math.isfinite(value) else False
        return False
    if type_name == "object":
        return isinstance(value, dict)
    if type_name == "array":
        return isinstance(value, list)
    if type_name == "null":
        return value is None
    return False


def _canon_numbers(value: Any) -> Any:
    """Recursively normalize ints → floats (except bools), mirroring Go's
    ``json.Unmarshal`` where every JSON number is float64."""
    if isinstance(value, bool):
        return value
    if isinstance(value, int):
        return float(value)
    if isinstance(value, list):
        return [_canon_numbers(v) for v in value]
    if isinstance(value, dict):
        return {k: _canon_numbers(v) for k, v in value.items()}
    return value


def _deep_key(value: Any) -> Any:
    """Hashable identity key preserving Go reflect.DeepEqual distinctions in
    the JSON regime (bool(true) != 1, but 1 == 1.0 — both are float64 after
    ``json.Unmarshal``), at any nesting depth."""
    t = json_type_of(value)
    if t in ("object", "array"):
        return (t, json.dumps(_canon_numbers(value), sort_keys=True,
                              ensure_ascii=False))
    if t == "integer":
        return ("number", float(value))
    if t == "number":
        return ("number", value)
    return (t, value)


class ValueEngine:
    """Recursive interpreter over (value, CompiledSchema)."""

    def __init__(self, options: Options | None = None, registry: Registry | None = None):
        self.opts = options or Options()
        self.registry = registry or Registry()
        self._pattern_cache: dict[str, re.Pattern] = {}
        self._schema_cache: dict[str, CompiledSchema] = {}

    # -- public API ---------------------------------------------------------

    def compile(self, schema: dict | str) -> CompiledSchema:
        """Compile with the engine-level cache (reference ``CompileSchema`` +
        ``EnableCaching``, validator.go:296-313,644-672). Cache key = the raw
        JSON string (dict schemas are compiled uncached — hashing them would
        cost as much as compiling)."""
        if isinstance(schema, str) and self.opts.enable_caching:
            hit = self._schema_cache.get(schema)
            if hit is None:
                hit = compile_schema(schema, self.opts.mode)
                if len(self._schema_cache) >= 4096:
                    # bound actor memory on per-row-schema corpora: drop the
                    # oldest entry (dict preserves insertion order)
                    self._schema_cache.pop(next(iter(self._schema_cache)))
                self._schema_cache[schema] = hit
            return hit
        return compile_schema(schema, self.opts.mode)

    def validate(self, value: Any, schema: CompiledSchema | dict | str,
                 path: str = "$") -> ValidationResult:
        if not isinstance(schema, CompiledSchema):
            schema = self.compile(schema)
        result = ValidationResult()
        self._validate(value, schema, path, result)
        return result

    def validate_json(self, doc_json: str, schema: CompiledSchema | dict | str) -> ValidationResult:
        """Entry point 1 of the reference (``ValidateJSON``,
        `/root/reference/validator/validator.go:289-317`)."""
        value = json.loads(doc_json)
        return self.validate(value, schema)

    # -- core recursion -----------------------------------------------------

    def _stop(self, result: ValidationResult) -> bool:
        return self.opts.stop_on_first_error and not result.valid

    def _regex(self, pattern: str) -> re.Pattern:
        rx = self._pattern_cache.get(pattern)
        if rx is None:
            rx = re.compile(pattern)
            self._pattern_cache[pattern] = rx
        return rx

    def _subresult(self, value: Any, schema: CompiledSchema, path: str) -> ValidationResult:
        r = ValidationResult()
        self._validate(value, schema, path, r)
        return r

    def _validate(self, value: Any, schema: CompiledSchema, path: str,
                  result: ValidationResult) -> None:
        kws = schema.keywords

        # required runs first (reference handles it inline before the keyword
        # loop, validator.go:327-353).
        if "required" in kws:
            self._kw_required(value, kws["required"], path, result)
            if self._stop(result):
                return

        # Group the standalone conditional triple so it evaluates once,
        # correctly, in declaration position of "if".
        handled_conditional = False

        for kw, sv in kws.items():
            if kw in METADATA_KEYS or kw == "required":
                continue
            if kw in ("then", "else"):
                continue  # consumed together with "if"
            if self._stop(result):
                return

            if kw == "if":
                if not handled_conditional:
                    self._kw_conditional(
                        value,
                        {"if": sv, "then": kws.get("then"), "else": kws.get("else")},
                        path, result,
                    )
                    handled_conditional = True
                continue
            if kw == "conditional":
                self._kw_conditional(value, sv, path, result)
                continue
            if kw == "additionalProperties":
                # needs sibling visibility (properties / patternProperties)
                self._kw_additionalProperties(value, sv, path, result, kws)
                continue

            handler = getattr(self, f"_kw_{kw}", None)
            if handler is not None:
                handler(value, sv, path, result)
                continue

            # custom registered constraint?
            fn = self.registry.get_validator(kw)
            if fn is not None:
                ok, err = fn(value, sv, path)
                if err is not None:
                    result.add(err)
                elif not ok:
                    result.add(ValidationError(
                        path=path, message=f"validation failed for keyword {kw}",
                        tag=kw, value=value))
                continue

            if self.opts.mode is Mode.STRICT:
                # compile already rejects unknown keywords in strict mode; this
                # is reachable only for raw loose-compiled schemas revalidated
                # strictly (reference validator.go:505-516).
                result.add(ValidationError(
                    path=path, message=f"unknown validation keyword: {kw}", tag=kw))

    # -- scalar keywords ----------------------------------------------------

    def _kw_type(self, value, sv, path, result):
        types = [sv] if isinstance(sv, str) else sv
        if any(check_type(value, t) for t in types):
            return
        if isinstance(sv, str):
            msg = f"value is of type {json_type_of(value)}, expected {sv}"
            result.add(ValidationError(path=path, message=msg, tag="type",
                                       param=sv, value=value))
        else:
            msg = ("value type does not match any of the expected types: "
                   + ", ".join(types))
            result.add(ValidationError(path=path, message=msg, tag="type", value=value))

    def _kw_required(self, value, sv, path, result):
        if not isinstance(value, dict):
            result.add(ValidationError(
                path=path, message="value must be an object for required validation",
                tag="required"))
            return
        for req in sv:
            if req not in value:
                result.add(ValidationError(
                    path=f"{path}.{req}",
                    message=f"required property '{req}' is missing",
                    tag="required"))
                if self._stop(result):
                    return

    def _num_cmp(self, value, sv, path, result, tag, op, msg_fmt):
        v, ok = to_float(value)
        if not ok:
            result.add(ValidationError(path=path, message="must be a number", tag=tag))
            return
        if not op(v, sv):
            result.add(ValidationError(path=path, message=msg_fmt.format(g=_gofmt(sv)),
                                       tag=tag, param=_gofmt(sv), value=value))

    def _kw_minimum(self, value, sv, path, result):
        self._num_cmp(value, sv, path, result, "minimum",
                      lambda v, b: v >= b, "less than minimum {g}")

    def _kw_maximum(self, value, sv, path, result):
        self._num_cmp(value, sv, path, result, "maximum",
                      lambda v, b: v <= b, "greater than maximum {g}")

    def _kw_exclusiveMinimum(self, value, sv, path, result):
        self._num_cmp(value, sv, path, result, "exclusiveMinimum",
                      lambda v, b: v > b, "less than or equal to exclusive minimum {g}")

    def _kw_exclusiveMaximum(self, value, sv, path, result):
        self._num_cmp(value, sv, path, result, "exclusiveMaximum",
                      lambda v, b: v < b, "greater than or equal to exclusive maximum {g}")

    def _kw_multipleOf(self, value, sv, path, result):
        # epsilon semantics exactly as `/root/reference/rules/number.go:108-110`
        v, ok = to_float(value)
        if not ok:
            result.add(ValidationError(
                path=path, message="multipleOf can only be applied to numbers",
                tag="multipleOf", value=value))
            return
        ratio = v / sv
        if not math.isfinite(ratio):
            # Go parity: math.Round(±Inf)=±Inf and NaN>eps is false, so the
            # reference treats non-finite ratios as VALID multiples
            # (`/root/reference/rules/number.go:108-110`); Python round(inf)
            # raises instead — guard explicitly
            return
        if abs(ratio - round(ratio)) > 1e-10:
            result.add(ValidationError(
                path=path,
                message=f"value {_gofmt(value)} is not a multiple of {_gofmt(sv)}",
                tag="multipleOf", param=_gofmt(sv), value=value))

    def _kw_minLength(self, value, sv, path, result):
        # BYTE length, as Go len(str) (`/root/reference/rules/string.go:29`)
        if not isinstance(value, str):
            result.add(ValidationError(path=path, message="must be a string", tag="minLength"))
            return
        if len(value.encode("utf-8")) < sv:
            result.add(ValidationError(
                path=path, message=f"length less than minimum {sv}",
                tag="minLength", param=str(sv)))

    def _kw_maxLength(self, value, sv, path, result):
        if not isinstance(value, str):
            result.add(ValidationError(path=path, message="must be a string", tag="maxLength"))
            return
        if len(value.encode("utf-8")) > sv:
            result.add(ValidationError(
                path=path, message=f"length greater than maximum {sv}",
                tag="maxLength", param=str(sv)))

    def _kw_pattern(self, value, sv, path, result):
        # unanchored search, as Go MatchString (`/root/reference/rules/string.go:52-70`)
        if not isinstance(value, str):
            result.add(ValidationError(path=path, message="must be a string", tag="pattern"))
            return
        if not self._regex(sv).search(value):
            result.add(ValidationError(
                path=path, message=f"does not match pattern {sv}",
                tag="pattern", param=sv))

    def _kw_enum(self, value, sv, path, result):
        if all(isinstance(x, str) for x in sv):
            # reference behavior (`/root/reference/rules/rule.go:144-167`)
            if not isinstance(value, str):
                result.add(ValidationError(path=path, message="value must be a string", tag="enum"))
                return
            if value not in sv:
                result.add(ValidationError(
                    path=path, message="value must be one of: " + ", ".join(sv),
                    tag="enum"))
            return
        # extension: scalar enums of any type, DeepEqual-style comparison
        vk = _deep_key(value)
        if not any(vk == _deep_key(x) for x in sv):
            result.add(ValidationError(
                path=path,
                message="value must be one of: " + ", ".join(_gofmt(x) for x in sv),
                tag="enum"))

    def _kw_format(self, value, sv, path, result):
        if not isinstance(value, str):
            result.add(ValidationError(path=path, message="value must be a string",
                                       tag="format", value=value))
            return
        fn = self.registry.get_format(sv) or FORMAT_VALIDATORS.get(sv)
        if fn is None:
            # unknown format: fail strict / pass loose
            # (`/root/reference/rules/format.go:56-66`)
            if self.opts.mode is not Mode.LOOSE:
                result.add(ValidationError(
                    path=path, message=f"unknown format: {sv}",
                    tag="format", param=sv, value=value))
            return
        if not fn(value):
            result.add(ValidationError(
                path=path, message=f"invalid {sv} format",
                tag="format", param=sv, value=value))

    # -- array keywords -----------------------------------------------------

    def _kw_items(self, value, sv, path, result):
        if not isinstance(value, list):
            # compiled-path behavior: only flag when the instance is declared
            # an array (validator.go:465-476)
            return
        if isinstance(sv, list):
            # tuple mode: schema[i] per position, extras ignored
            # (`/root/reference/rules/array.go:77-120`)
            for i, item in enumerate(value):
                if i >= len(sv):
                    break
                sub = self._subresult(item, sv[i], f"{path}[{i}]")
                result.extend(sub.errors)
                if self._stop(result):
                    return
        else:
            # object mode (`/root/reference/rules/array.go:43-76`)
            for i, item in enumerate(value):
                sub = self._subresult(item, sv, f"{path}[{i}]")
                result.extend(sub.errors)
                if self._stop(result):
                    return

    def _kw_minItems(self, value, sv, path, result):
        if not isinstance(value, list):
            result.add(ValidationError(path=path, message="must be an array", tag="minItems"))
            return
        if len(value) < sv:
            result.add(ValidationError(
                path=path, message=f"fewer items than minimum {sv}",
                tag="minItems", param=str(sv)))

    def _kw_maxItems(self, value, sv, path, result):
        if not isinstance(value, list):
            result.add(ValidationError(path=path, message="must be an array", tag="maxItems"))
            return
        if len(value) > sv:
            result.add(ValidationError(
                path=path, message=f"more items than maximum {sv}",
                tag="maxItems", param=str(sv)))

    def _kw_uniqueItems(self, value, sv, path, result):
        if not sv:
            return
        if not isinstance(value, list):
            result.add(ValidationError(path=path, message="must be an array", tag="uniqueItems"))
            return
        seen = set()
        for item in value:
            k = _deep_key(item)
            if k in seen:
                result.add(ValidationError(
                    path=path, message="contains duplicate items", tag="uniqueItems"))
                return
            seen.add(k)

    # -- object keywords ----------------------------------------------------

    def _kw_properties(self, value, sv, path, result):
        if not isinstance(value, dict):
            # compiled path flags only when type=="object" declared
            # (validator.go:421-431); caught by the type keyword otherwise
            return
        for name, sub_schema in sv.items():
            if name in value:
                sub = self._subresult(value[name], sub_schema, f"{path}.{name}")
                result.extend(sub.errors)
                if self._stop(result):
                    return

    def _kw_minProperties(self, value, sv, path, result):
        if not isinstance(value, dict):
            result.add(ValidationError(
                path=path, message="minProperties can only be applied to objects",
                tag="minProperties", value=value))
            return
        if len(value) < sv:
            result.add(ValidationError(
                path=path,
                message=f"object has {len(value)} properties, which is less than minProperties {sv}",
                tag="minProperties", param=str(sv)))

    def _kw_maxProperties(self, value, sv, path, result):
        if not isinstance(value, dict):
            result.add(ValidationError(
                path=path, message="maxProperties can only be applied to objects",
                tag="maxProperties", value=value))
            return
        if len(value) > sv:
            result.add(ValidationError(
                path=path,
                message=f"object has {len(value)} properties, which is more than maxProperties {sv}",
                tag="maxProperties", param=str(sv)))

    def _kw_patternProperties(self, value, sv, path, result):
        # sv: {pattern_str: (compiled_regex, CompiledSchema)}
        if not isinstance(value, dict):
            result.add(ValidationError(
                path=path, message="patternProperties can only be applied to objects",
                tag="patternProperties", value=value))
            return
        for _pat, (rx, sub_schema) in sv.items():
            for key, pv in value.items():
                if rx.search(key):
                    sub = self._subresult(pv, sub_schema, f"{path}.{key}")
                    result.extend(sub.errors)
                    if self._stop(result):
                        return

    def _kw_additionalProperties(self, value, sv, path, result, siblings):
        """Extra keys = not in sibling ``properties`` and not matching any
        sibling ``patternProperties`` pattern. The reference resolves siblings
        through ctx stashing (`/root/reference/rules/object_patterns.go:64-180`,
        `object_properties.go:85`); we pass the sibling frame explicitly —
        deterministic by construction."""
        if not isinstance(value, dict):
            return
        if sv is True:
            return
        if sv is False and self.opts.allow_unknown_fields:
            # reference honors AllowUnknownFields for the bool form
            # (validator.go:481-502)
            return
        props = siblings.get("properties") or {}
        pattern_props = siblings.get("patternProperties") or {}
        extras = [
            key for key in value
            if key not in props
            and not any(rx.search(key) for (rx, _s) in pattern_props.values())
        ]
        if sv is False:
            for key in extras:
                result.add(ValidationError(
                    path=f"{path}.{key}", message="unknown field",
                    tag="additionalProperties", value=value[key]))
                if self._stop(result):
                    return
            return
        # schema form: validate each extra against it
        for key in extras:
            sub = self._subresult(value[key], sv, f"{path}.{key}")
            result.extend(sub.errors)
            if self._stop(result):
                return

    def _kw_conditional(self, value, sv, path, result):
        """Correct if/then/else mask semantics
        (reference ``ValidateConditional``,
        `/root/reference/rules/conditional_rules.go:134-245`)."""
        if_schema = sv.get("if")
        if if_schema is None:
            return
        if_ok = self._subresult(value, if_schema, path).valid
        branch = sv.get("then") if if_ok else sv.get("else")
        branch_name = "then" if if_ok else "else"
        if branch is None:
            return
        sub = self._subresult(value, branch, path)
        if not sub.valid:
            for e in sub.errors:
                result.add(ValidationError(
                    path=e.path,
                    message=f"validation failed against {branch_name} schema for keyword '{e.tag}'",
                    tag="conditional", param=branch_name, value=value))
                if self._stop(result):
                    return

    def _kw_dependencies(self, value, sv, path, result):
        if not isinstance(value, dict):
            result.add(ValidationError(
                path=path, message="dependencies can only be applied to objects",
                tag="dependencies", value=value))
            return
        for prop, dep in sv.items():
            if prop not in value:
                continue
            if isinstance(dep, list):
                # property dependencies (`object_dependencies.go:54-70`)
                for d in dep:
                    if d not in value:
                        result.add(ValidationError(
                            path=f"{path}.{prop}",
                            message=f"property '{prop}' depends on '{d}', but it is missing",
                            tag="dependencies", param=d))
                        if self._stop(result):
                            return
            else:
                # schema dependency: the reference validates the PROPERTY'S
                # VALUE against the dep schema (`object_dependencies.go:72-92`)
                # — not the whole object as standard JSON-Schema would.
                sub = self._subresult(value[prop], dep, f"{path}.{prop}")
                if not sub.valid:
                    for e in sub.errors:
                        result.add(ValidationError(
                            path=e.path,
                            message=(f"dependency validation failed for property "
                                     f"'{prop}' with keyword '{e.tag}'"),
                            tag="dependencies", param=prop))
                        if self._stop(result):
                            return

    # -- logical combinators ------------------------------------------------

    def _kw_allOf(self, value, sv, path, result):
        for i, sub_schema in enumerate(sv):
            sub = self._subresult(value, sub_schema, path)
            if not sub.valid:
                first = sub.errors[0]
                result.add(ValidationError(
                    path=path,
                    message=(f"failed to validate against schema at allOf[{i}] "
                             f"for keyword '{first.tag}'"),
                    tag="allOf", value=value))
                if self._stop(result):
                    return

    def _kw_anyOf(self, value, sv, path, result):
        for sub_schema in sv:
            if self._subresult(value, sub_schema, path).valid:
                return
        result.add(ValidationError(
            path=path, message="value does not match any schema in anyOf",
            tag="anyOf", value=value))

    def _kw_oneOf(self, value, sv, path, result):
        matches = sum(1 for s in sv if self._subresult(value, s, path).valid)
        if matches == 1:
            return
        if matches > 1:
            result.add(ValidationError(
                path=path, message="value matches more than one schema in oneOf",
                tag="oneOf", value=value))
        else:
            result.add(ValidationError(
                path=path, message="value does not match any schema in oneOf",
                tag="oneOf", value=value))

    def _kw_not(self, value, sv, path, result):
        if self._subresult(value, sv, path).valid:
            result.add(ValidationError(
                path=path, message="value must not validate against the schema in not",
                tag="not", value=value))


def _gofmt(v: Any) -> str:
    """Render a value like Go's %v for floats (5.0 -> "5")."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and math.isfinite(v) and v == int(v):
        return str(int(v))
    return str(v)
