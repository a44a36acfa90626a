"""Extension registries: custom constraints, formats, comparators.

Mirrors the reference's user-extension surface (SURVEY.md §2.6):

- ``register_validator(name, fn)`` — reference ``RegisterValidator``
  (`/root/reference/validator/validator.go:60-81`): empty name / None fn /
  duplicate name → error (first registration wins for a Validator instance).
- ``register_format(name, fn)`` — reference ``RegisterFormatValidator``
  (`/root/reference/rules/format.go:84-88`): overwrite allowed, None ignored.
- ``register_comparator(name, fn)`` — reference ``RegisterComparator``
  (`/root/reference/validator/validator.go:84-102`): overwrite allowed.

A custom validator has signature
``fn(value, schema_value, path) -> (ok: bool, err: ValidationError | None)``
— the Python spelling of the reference's
``RuleFunc(ctx, value, schemaValue, path) (bool, error)``
(`/root/reference/rules/rule.go:12`). Custom constraints are frozen into the
compiled plan on the driver and shipped to workers once (actor init), never
per batch.

``register_validator`` additionally accepts ``compile_fn(schema_value) ->
(mask_fn, message)`` so a custom keyword stays VECTORIZED on typed tables:
``mask_fn(pa.Array) -> pa.BooleanArray`` (True = pass; nulls pass
automatically — null cell ≡ absent property) becomes a column-plan kernel
like any built-in, instead of steering the table to the per-row dynamic
regime. Without a compile_fn the column plan wraps the scalar rule as a
batched per-row fallback (cold path, still one task per batch).
"""

from __future__ import annotations

from typing import Any, Callable

from .errors import ValidationError

RuleFunc = Callable[[Any, Any, str], tuple[bool, "ValidationError | None"]]
CompareFunc = Callable[[Any, Any], bool]
FormatFunc = Callable[[str], bool]


class RegistryError(ValueError):
    pass


def _builtin_comparators() -> dict[str, CompareFunc]:
    """eq/ne/gt/ge/lt/le (`/root/reference/comparators/builtin.go:9-75`).
    ``eq`` is DeepEqual-flavored; the numeric ones coerce to float
    (builtin.go:65-107). These are the comparison primitives of the DSL."""

    def _num(x):
        from .value_engine import to_float
        return to_float(x)

    def eq(a, b):
        return a == b and type(a) is type(b) or _same_num(a, b)

    def _same_num(a, b):
        fa, oa = _num(a)
        fb, ob = _num(b)
        return oa and ob and fa == fb

    def _cmp(op):
        def fn(a, b):
            fa, oa = _num(a)
            fb, ob = _num(b)
            return oa and ob and op(fa, fb)
        return fn

    return {
        "eq": eq,
        "ne": lambda a, b: not eq(a, b),
        "gt": _cmp(lambda x, y: x > y),
        "ge": _cmp(lambda x, y: x >= y),
        "lt": _cmp(lambda x, y: x < y),
        "le": _cmp(lambda x, y: x <= y),
    }


class Registry:
    """Thread-safety note: registration happens on the driver before the plan
    is compiled and shipped; workers only read. (The reference guards its maps
    with RWMutex because callers may register concurrently —
    `/root/reference/validator/validator.go:24-26`; our lifecycle makes the
    registries effectively frozen at execution time.)"""

    def __init__(self) -> None:
        self._validators: dict[str, RuleFunc] = {}
        self._validator_compilers: dict[str, Callable] = {}
        self._formats: dict[str, FormatFunc] = {}
        self._comparators: dict[str, CompareFunc] = _builtin_comparators()

    # validators: duplicates rejected, first wins (validator.go:69-71)
    def register_validator(self, name: str, fn: RuleFunc,
                           compile_fn: Callable | None = None) -> None:
        """``compile_fn(schema_value) -> (mask_fn, message)`` (optional)
        vectorizes the keyword in the column plan; ``fn`` remains the
        semantics source for the dynamic regime (and the per-row fallback
        when no compile_fn is given)."""
        if not name:
            raise RegistryError("validator name cannot be empty")
        if fn is None:
            raise RegistryError("validator function cannot be nil")
        if name in self._validators:
            raise RegistryError(f"validator {name} already registered")
        self._validators[name] = fn
        if compile_fn is not None:
            self._validator_compilers[name] = compile_fn

    def get_validator(self, name: str) -> RuleFunc | None:
        return self._validators.get(name)

    def get_validator_compiler(self, name: str) -> "Callable | None":
        return self._validator_compilers.get(name)

    # formats: overwrite allowed (rules/format.go:84-88)
    def register_format(self, name: str, fn: FormatFunc) -> None:
        if fn is not None:
            self._formats[name] = fn

    def get_format(self, name: str) -> FormatFunc | None:
        return self._formats.get(name)

    # comparators: overwrite allowed (validator.go:84-102)
    def register_comparator(self, name: str, fn: CompareFunc) -> None:
        if not name:
            raise RegistryError("comparator name cannot be empty")
        if fn is None:
            raise RegistryError("comparator function cannot be nil")
        self._comparators[name] = fn

    def get_comparator(self, name: str) -> CompareFunc | None:
        return self._comparators.get(name)
