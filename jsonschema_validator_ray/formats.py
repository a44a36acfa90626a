"""Format validators: name -> (str) -> bool.

Mirrors the reference's nine built-in formats
(`/root/reference/rules/format.go:16-26`, implementations
`/root/reference/rules/utils.go:151-210`) with Python stand-ins for the Go
stdlib parsers. Where Go stdlib semantics are hard to mirror exactly
(``email`` = net/mail.ParseAddress, ``uri`` = url.ParseRequestURI) we document
the parity boundary; conformance fixtures only pin cases where both agree.

The registry is extensible via :func:`register_format`
(reference: ``RegisterFormatValidator``, `/root/reference/rules/format.go:84-88`).

Vectorized (Arrow) counterparts for the hot path live in ``plan.py`` — the
regex-expressible formats (uuid, hostname, date, time, date-time, ipv4) run as
``pc.match_substring_regex`` kernels; the rest fall back to these scalar
functions applied per-row inside ``map_batches`` (still batched).
"""

from __future__ import annotations

import ipaddress
import re
from datetime import datetime
from typing import Callable

# Anchored regexes (compiled once at import; the compiled plan captures them).
# Hostname pattern is byte-for-byte the reference's
# (`/root/reference/rules/utils.go:187`).
HOSTNAME_RE = re.compile(
    r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])"
    r"(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*$"
)
UUID_RE = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
# RFC3339: date "T" time [frac] offset — Go time.RFC3339 requires the offset.
RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)
DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")
TIME_RE = re.compile(r"^(\d{2}):(\d{2}):(\d{2})$")
# Pragmatic addr-spec check standing in for Go net/mail.ParseAddress
# (`/root/reference/rules/utils.go:151-154`). Accepts local@domain with
# non-empty dot-atom local part and a hostname-shaped domain.
EMAIL_RE = re.compile(
    r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@"
    r"[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"
)


def is_email(s: str) -> bool:
    return bool(EMAIL_RE.match(s))


def _valid_ymd(y: int, m: int, d: int) -> bool:
    try:
        datetime(y, m, d)
        return True
    except ValueError:
        return False


def is_date_time(s: str) -> bool:
    """RFC3339 (`/root/reference/rules/utils.go:157-160`)."""
    m = RFC3339_RE.match(s)
    if not m:
        return False
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    return _valid_ymd(y, mo, d) and h < 24 and mi < 60 and sec < 60


def is_date(s: str) -> bool:
    m = DATE_RE.match(s)
    return bool(m) and _valid_ymd(int(m.group(1)), int(m.group(2)), int(m.group(3)))


def is_time(s: str) -> bool:
    m = TIME_RE.match(s)
    if not m:
        return False
    h, mi, sec = int(m.group(1)), int(m.group(2)), int(m.group(3))
    return h < 24 and mi < 60 and sec < 60


def is_uri(s: str) -> bool:
    """Stand-in for Go url.ParseRequestURI (`/root/reference/rules/utils.go:175-178`):
    absolute URI (scheme:...) or absolute path, no whitespace/control chars."""
    if not s or any(c.isspace() or ord(c) < 0x20 for c in s):
        return False
    if s.startswith("/"):
        return True
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", s)
    return bool(m)


def is_hostname(s: str) -> bool:
    if not s or len(s) > 255:
        return False
    return bool(HOSTNAME_RE.match(s))


def is_ipv4(s: str) -> bool:
    # Go: net.ParseIP(s) != nil && "." in s (`/root/reference/rules/utils.go:195-198`)
    if "." not in s:
        return False
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        return False


def is_ipv6(s: str) -> bool:
    if ":" not in s:
        return False
    try:
        ipaddress.ip_address(s)
        return True
    except ValueError:
        return False


def is_uuid(s: str) -> bool:
    return bool(UUID_RE.match(s.lower()))


FORMAT_VALIDATORS: dict[str, Callable[[str], bool]] = {
    "email": is_email,
    "date-time": is_date_time,
    "date": is_date,
    "time": is_time,
    "uri": is_uri,
    "hostname": is_hostname,
    "ipv4": is_ipv4,
    "ipv6": is_ipv6,
    "uuid": is_uuid,
}


def register_format(name: str, fn: Callable[[str], bool]) -> None:
    """Extension hook; overwrite allowed (reference `rules/format.go:84-88`)."""
    if fn is not None:
        FORMAT_VALIDATORS[name] = fn


def get_format(name: str) -> Callable[[str], bool] | None:
    return FORMAT_VALIDATORS.get(name)
