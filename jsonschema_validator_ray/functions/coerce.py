"""Scalar coercion + collection helpers mirroring the reference's utils
(`/root/reference/rules/utils.go:19-291`): ``toFloat64/toInt/toString/toBool``
and the DeepEqual-based set/object operations. These are plan-compile-time
helpers in the Ray engine (schema values are coerced once at compile), plus
the comparison primitives the tag DSL leans on.
"""

from __future__ import annotations

import math
from typing import Any

from ..value_engine import _deep_key, to_float  # noqa: F401  (re-export)


def to_int(value: Any) -> tuple[int, bool]:
    """`/root/reference/rules/utils.go:64-106`: ints pass through; floats only
    when integral; numeric strings via strict int parse."""
    if isinstance(value, bool):
        return 0, False
    if isinstance(value, int):
        return value, True
    if isinstance(value, float):
        if math.isfinite(value) and value == int(value):
            return int(value), True
        return 0, False
    if isinstance(value, str):
        try:
            return int(value), True
        except ValueError:
            return 0, False
    return 0, False


def to_string(value: Any) -> tuple[str, bool]:
    """`utils.go:113-130`: strings/bytes/numerics stringify; bools and
    containers do NOT (Go's switch has no bool / map / slice arm)."""
    if isinstance(value, bool):
        return "", False
    if isinstance(value, str):
        return value, True
    if isinstance(value, bytes):
        return value.decode("utf-8", errors="replace"), True
    if isinstance(value, int):
        return str(value), True
    if isinstance(value, float):
        if math.isfinite(value) and value == int(value):
            return str(int(value)), True  # Go %v prints 5.0 as "5"
        return str(value), True
    if isinstance(value, Exception):
        return str(value), True
    return "", False


def to_bool(value: Any) -> tuple[bool, bool]:
    """`utils.go:133-146`: strings "true"/"1"/"yes"/"y" → True (anything else
    → False, still ok=True); numerics truthy on non-zero."""
    if isinstance(value, bool):
        return value, True
    if isinstance(value, str):
        return value in ("true", "1", "yes", "y"), True
    if isinstance(value, int):
        return value != 0, True
    if isinstance(value, float):
        return value != 0, True
    return False, False


# -- DeepEqual-flavored collection ops (`utils.go:215-291`) -----------------


def contains(arr: list, val: Any) -> bool:
    k = _deep_key(val)
    return any(_deep_key(x) == k for x in arr)


def intersection(a: list, b: list) -> list:
    return [x for x in a if contains(b, x)]


def union(a: list, b: list) -> list:
    out = list(a)
    for x in b:
        if not contains(out, x):
            out.append(x)
    return out


def difference(a: list, b: list) -> list:
    return [x for x in a if not contains(b, x)]


def get_object_keys(obj: dict) -> list[str]:
    return list(obj.keys())


def has_key(obj: dict, key: str) -> bool:
    return key in obj


def merge_objects(a: dict, b: dict) -> dict:
    out = dict(a)
    out.update(b)
    return out
