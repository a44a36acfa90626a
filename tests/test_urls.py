"""URL decomposition kernel vs urllib.parse ground truth (no Ray needed)."""

from urllib.parse import urlsplit

import pyarrow as pa

from jsonschema_validator_ray.functions.urls import (attach_url_parts,
                                                     parse_url_parts)

TRICKY = [
    "https://www.example.org/en/src1/page7.html?ref=3",
    "http://sub.a.example.co:8080/x/y/z",
    "https://example",                      # single-label host
    "ftp://files.example.net/",             # trailing slash
    "https://host.tld",                     # no path
    "http://1.2.3.4:80/a?b=c",              # IP host + port + query
    "https://a.b.c.d.e/deep/er/est/leaf.html",
    "scheme+x://odd.scheme.example/",       # RFC 3986 scheme charset
    "https://x.y/?",                        # empty query
    "https://x.y/p%20q?r=%2F",              # percent-encoded
]


def test_matches_urllib_on_parseable_urls():
    t = parse_url_parts(pa.array(TRICKY))
    rows = t.to_pylist()
    for url, row in zip(TRICKY, rows):
        s = urlsplit(url)
        assert row["scheme"] == s.scheme
        assert row["host"] == s.hostname
        assert row["port"] == (s.port if s.port is not None else -1)
        assert row["path"] == s.path
        assert row["query"] == s.query
        labels = s.hostname.split(".")
        assert row["domain"] == ".".join(labels[-2:])
        assert row["tld"] == labels[-1]
        assert row["path_depth"] == s.path.count("/")


def test_unparseable_and_null_rows():
    t = parse_url_parts(pa.array(["not a url", None, "//missing.scheme/x"]))
    for row in t.to_pylist():
        assert row["scheme"] is None and row["host"] is None
        assert row["domain"] is None and row["tld"] is None
        assert row["port"] == -1 and row["path_depth"] == 0


def test_attach_url_parts_appends_requested_columns():
    batch = pa.table({"url": TRICKY[:3], "x": [1, 2, 3]})
    out = attach_url_parts(batch, "url")
    assert out.column_names == ["url", "x", "host", "domain", "tld",
                                "path_depth"]
    assert out.column("host").to_pylist()[0] == "www.example.org"
