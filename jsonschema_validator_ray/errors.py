"""Violation / result model.

Mirrors the reference's error model (`/root/reference/errors/errors.go:24-39`
``ValidationError{Path, Message, Value, Tag, Param}`` and
`/root/reference/validator/validator.go:557-560` ``ValidationResult``) as plain
dataclasses, plus the three error-formatting modes of
`/root/reference/errors/error_messages_test.go` (simple / detailed / json).

In the Ray engine a ``ValidationError`` is one row of the *violations table*
``(key, constraint_id, path, tag, message, value)``; ``ValidationResult`` is one
row of the *verdicts table* ``(key, valid, error_count)``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class Mode(Enum):
    """Validation mode (reference: `/root/reference/schema/schema.go:10-16`).

    ``WARN`` is declared by the reference but never branched on (SURVEY.md §2.6);
    we keep only the two modes that have behavior: STRICT and LOOSE.
    """

    STRICT = 0
    LOOSE = 1


class SchemaError(ValueError):
    """Raised when a schema fails to compile (malformed keyword, bad regex,
    unknown keyword in strict mode, ``$ref``...).

    Reference: compile-time rejections in `/root/reference/schema/schema.go:61-297`.
    """


@dataclass
class ValidationError:
    """One violation. ``tag`` is the keyword that failed; ``constraint_id``
    keys the violation per the north star (``(url, constraint_id)``)."""

    path: str
    message: str
    tag: str
    param: str = ""
    value: Any = None

    @property
    def constraint_id(self) -> str:
        # "<tag>@<path>" uniquely names a compiled constraint instance.
        return f"{self.tag}@{self.path}"

    def __str__(self) -> str:  # simple format: "path: message"
        return f"{self.path}: {self.message}"


@dataclass
class ValidationResult:
    valid: bool = True
    errors: list[ValidationError] = field(default_factory=list)

    def add(self, err: ValidationError) -> None:
        self.valid = False
        self.errors.append(err)

    def extend(self, errs: list[ValidationError]) -> None:
        if errs:
            self.valid = False
            self.errors.extend(errs)

    @property
    def error_count(self) -> int:
        return len(self.errors)

    def tags(self) -> set[str]:
        return {e.tag for e in self.errors}

    def tag_paths(self) -> set[tuple[str, str]]:
        """Set of (tag, path) — fixtures pin sets, never sequences, because the
        reference's keyword order is Go-map-nondeterministic (SURVEY.md §3.3)."""
        return {(e.tag, e.path) for e in self.errors}


class ErrorFormat(Enum):
    SIMPLE = "simple"
    DETAILED = "detailed"
    JSON = "json"


def format_errors(errors: list[ValidationError], mode: ErrorFormat = ErrorFormat.SIMPLE) -> str:
    """Render violations in one of the reference's three formats
    (`/root/reference/errors/error_messages_test.go`)."""
    if mode is ErrorFormat.SIMPLE:
        return "; ".join(str(e) for e in errors)
    if mode is ErrorFormat.DETAILED:
        parts = []
        for e in errors:
            p = f"path={e.path} tag={e.tag} message={e.message}"
            if e.param:
                p += f" param={e.param}"
            parts.append(p)
        return "\n".join(parts)
    return json.dumps(
        [
            {"path": e.path, "message": e.message, "tag": e.tag, "param": e.param}
            for e in errors
        ],
        ensure_ascii=False,
    )
