"""Format validator conformance — ported from
/root/reference/rules/format_test.go:28-100 and utils.go:151-210."""

from __future__ import annotations

import pytest

from jsonschema_validator_ray import Mode, Options, ValueEngine
from jsonschema_validator_ray.formats import FORMAT_VALIDATORS, register_format

FORMAT_CASES = [
    # email (Go net/mail.ParseAddress stand-in; fixtures pin agreeing cases)
    ("email", "test@example.com", True),
    ("email", "user.name+tag@sub.example.org", True),
    ("email", "invalid-email", False),
    ("email", "@nodomain.com", False),
    ("email", "noat.example.com", False),
    ("email", "spaces in@example.com", False),
    # date-time (RFC3339, utils.go:157-160)
    ("date-time", "2023-01-15T10:30:00Z", True),
    ("date-time", "2023-01-15T10:30:00+02:00", True),
    ("date-time", "2023-01-15T10:30:00.123Z", True),
    ("date-time", "2023-01-15 10:30:00", False),       # no T/offset
    ("date-time", "2023-13-15T10:30:00Z", False),       # bad month
    ("date-time", "2023-01-15T25:30:00Z", False),       # bad hour
    ("date-time", "not-a-date", False),
    # date (2006-01-02)
    ("date", "2023-01-15", True),
    ("date", "2023-02-30", False),
    ("date", "15-01-2023", False),
    ("date", "2023-1-5", False),
    # time (15:04:05)
    ("time", "10:30:00", True),
    ("time", "25:30:00", False),
    ("time", "10:30", False),
    # uri (Go url.ParseRequestURI stand-in: absolute URI or absolute path)
    ("uri", "https://example.com/path?q=1", True),
    ("uri", "ftp://files.example.com", True),
    ("uri", "/absolute/path", True),
    ("uri", "not a uri", False),
    ("uri", "", False),
    # hostname (utils.go:181-192, exact reference regex)
    ("hostname", "example.com", True),
    ("hostname", "sub-domain.example.com", True),
    ("hostname", "a", True),
    ("hostname", "-bad.example.com", False),
    ("hostname", "bad-.example.com", False),
    ("hostname", "a" * 256, False),                     # > 255 chars
    ("hostname", "", False),
    # ipv4 (net.ParseIP + contains ".")
    ("ipv4", "192.168.1.1", True),
    ("ipv4", "0.0.0.0", True),
    ("ipv4", "256.1.1.1", False),
    ("ipv4", "1.2.3", False),
    ("ipv4", "::1", False),                             # no dot
    # ipv6 (net.ParseIP + contains ":")
    ("ipv6", "::1", True),
    ("ipv6", "2001:db8::8a2e:370:7334", True),
    ("ipv6", "192.168.1.1", False),                     # no colon
    ("ipv6", "gggg::1", False),
    # uuid (lowercase hex regex over lowered input, utils.go:207-210)
    ("uuid", "123e4567-e89b-12d3-a456-426614174000", True),
    ("uuid", "123E4567-E89B-12D3-A456-426614174000", True),   # lowered first
    ("uuid", "123e4567e89b12d3a456426614174000", False),
    ("uuid", "123e4567-e89b-12d3-a456-42661417400", False),
]


@pytest.mark.parametrize("fmt,value,ok", FORMAT_CASES,
                         ids=[f"{f}/{v[:24]}" for f, v, _ in FORMAT_CASES])
def test_format_fn(fmt, value, ok):
    assert FORMAT_VALIDATORS[fmt](value) is ok


def test_format_keyword_dispatch(engine):
    r = engine.validate("test@example.com", {"format": "email"})
    assert r.valid
    r = engine.validate("nope", {"format": "email"})
    assert not r.valid and r.errors[0].message == "invalid email format"


def test_format_non_string_value(engine):
    r = engine.validate(42, {"format": "email"})
    assert not r.valid and "value must be a string" in r.errors[0].message


def test_unknown_format_strict_vs_loose():
    """Strict fails / loose passes (`/root/reference/rules/format.go:56-66`)."""
    strict = ValueEngine(Options(mode=Mode.STRICT))
    loose = ValueEngine(Options(mode=Mode.LOOSE))
    schema = {"format": "no-such-format"}
    r = strict.validate("x", schema)
    assert not r.valid and "unknown format: no-such-format" in r.errors[0].message
    assert loose.validate("x", schema).valid


def test_register_custom_format():
    """RegisterFormatValidator analogue (`rules/format.go:84-88`)."""
    register_format("even-digits", lambda s: s.isdigit() and len(s) % 2 == 0)
    try:
        e = ValueEngine()
        assert e.validate("1234", {"format": "even-digits"}).valid
        assert not e.validate("123", {"format": "even-digits"}).valid
    finally:
        FORMAT_VALIDATORS.pop("even-digits", None)


def test_engine_local_format_registry_shadows():
    e = ValueEngine()
    e.registry.register_format("email", lambda s: s == "magic")
    assert e.validate("magic", {"format": "email"}).valid
    assert not e.validate("test@example.com", {"format": "email"}).valid
