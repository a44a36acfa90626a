"""Deterministic synthetic Common-Crawl-style webtext corpus.

BASELINE.json ``input_hint``: a Parquet table
``(url:string, warc_ts:timestamp[us], html:binary, text:large_string,
lang:string)``. This module synthesizes it deterministically at any scale —
every cell is a pure function of the global row index (splitmix64 bit
mixing), so ANY partitioning / parallelism / batch size produces identical
rows, and a row can be regenerated in isolation for a test expectation.

Planted features (FIXTURES.md §1):
- hosts drawn Zipf-skewed from 1,000 synthetic hosts (exercises the salted
  uniqueness shuffle and skew handling);
- ~1% exact duplicate urls at known indices (``i % 97 == 13`` duplicates the
  url of row ``i-1``);
- ~0.5% malformed urls (``i % 211 == 7``), 1/3 of them empty;
- ~0.5% null ``warc_ts`` (``i % 199 == 11``);
- ~1% html rows carry trailing invalid-UTF-8 junk bytes AFTER the text
  payload (``i % 101 == 3``) — html stays binary, text extraction still
  byte-identical;
- multibyte text rows (``i % 7 == 0`` docs mix CJK + accented tokens), so
  byte-length ≠ codepoint-length (pins minLength/maxLength byte semantics,
  reference `/root/reference/rules/string.go:29`);
- ~2% invalid lang (``i % 53 == 9`` → "xx", "EN ", "", or null).

The html embeds the text between ``<article>`` markers; :func:`extract_text`
recovers it byte-identically (the per-url invariant of the north star).
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

_WORDS = (
    "the of and to in is was for on that with as his they at be this have "
    "from or one had by word but not what all were when your can said there "
    "use each which she do how their if will up other about out many then "
    "them these so some her would make like him into time has look two more "
    "write go see number no way could people my than first water been call "
    "who oil its now find long down day did get come made may part data web "
    "page site crawl index text token corpus model train batch shard block"
).split()

_MULTIBYTE = "日本語 中文 текст données größe café naïve Ελληνικά 한국어 עברית".split()

_LANGS_VALID = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt", "it", "nl"]
_LANGS_INVALID = ["xx", "EN ", ""]

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 mixer, vectorized over uint64."""
    z = (x + np.uint64(0x9E3779B97F4B9279)) & _MASK64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


def _rand(idx: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uint64 stream per (row index, stream id)."""
    return _splitmix64(idx.astype(np.uint64) * np.uint64(1_000_003)
                       + np.uint64(stream) * np.uint64(0x9E3779B9))


N_HOSTS = 1000
_HOST_ZIPF_S = 1.2


def _host_ids(idx: np.ndarray) -> np.ndarray:
    """Zipf-skewed host assignment: rank r gets probability ∝ 1/r^s,
    realized by inverse-CDF lookup on a deterministic uniform draw."""
    ranks = np.arange(1, N_HOSTS + 1, dtype=np.float64)
    w = 1.0 / ranks ** _HOST_ZIPF_S
    cdf = np.cumsum(w) / w.sum()
    u = _rand(idx, 1).astype(np.float64) / 2**64
    return np.searchsorted(cdf, u)


def _text_for(i: int, r: np.ndarray) -> str:
    """Text of row i; ``r`` is this row's word-selection hash stream."""
    n_words = 20 + int(r[0] % 180)
    words = [_WORDS[int(r[1 + k % 62] >> np.uint64(k % 32)) % len(_WORDS)]
             for k in range(n_words)]
    if i % 7 == 0:  # multibyte rows
        for k in range(0, n_words, 9):
            words[k] = _MULTIBYTE[int(r[2 + k % 60]) % len(_MULTIBYTE)]
    return " ".join(words)


def webtext_batch(indices: np.ndarray) -> pa.Table:
    """Generate the webtext rows for the given global row indices."""
    idx = np.asarray(indices, dtype=np.uint64)
    n = len(idx)
    hosts = _host_ids(idx)
    r_path = _rand(idx, 2)
    r_lang = _rand(idx, 3)
    r_ts = _rand(idx, 4)

    urls: list[str | None] = []
    texts: list[str] = []
    htmls: list[bytes] = []
    langs: list[str | None] = []
    ts: list[int | None] = []

    # per-row word streams: a (n, 64) hash matrix
    word_streams = np.stack([_rand(idx, 10 + s) for s in range(64)], axis=1)

    for j in range(n):
        i = int(idx[j])
        # --- url ---
        if i % 211 == 7:  # malformed
            urls.append(["not a url", "", "missing-scheme.example/x"][i % 3])
        elif i % 97 == 13 and i > 0:  # exact duplicate of previous row's url
            prev = np.array([i - 1], dtype=np.uint64)
            ph = _host_ids(prev)[0]
            pr = _rand(prev, 2)[0]
            urls.append(f"https://host{ph:04d}.example.com/p/{int(pr % 100_000):05d}")
        else:
            urls.append(
                f"https://host{hosts[j]:04d}.example.com/p/{int(r_path[j] % 100_000):05d}")
        # --- text ---
        text = _text_for(i, word_streams[j])
        texts.append(text)
        # --- html (binary; embeds the text byte-identically) ---
        body = (b"<html><head><title>Page " + str(i).encode()
                + b"</title></head><body><article>"
                + text.encode("utf-8")
                + b"</article></body></html>")
        if i % 101 == 3:  # trailing invalid UTF-8 junk
            body += b"\xff\xfe\x80garbage\x9f"
        htmls.append(body)
        # --- lang ---
        if i % 53 == 9:
            pick = i % 4
            langs.append(None if pick == 3 else _LANGS_INVALID[pick])
        else:
            langs.append(_LANGS_VALID[int(r_lang[j]) % len(_LANGS_VALID)])
        # --- warc_ts (monotone base + jitter, ~0.5% null) ---
        if i % 199 == 11:
            ts.append(None)
        else:
            base = 1_600_000_000_000_000 + i * 1_000_000  # µs
            ts.append(base + int(r_ts[j] % 1_000_000))

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.large_string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def webtext_dataset(n_rows: int, *, override_num_blocks: int | None = None):
    """Distributed deterministic generation: ``ray.data.range`` supplies
    global row ids; each task generates its slice — no driver-side loop."""
    import ray.data

    ds = ray.data.range(n_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return webtext_batch(batch.column("id").to_numpy())

    return ds.map_batches(gen, batch_format="pyarrow")


def write_webtext_parquet(path: str, n_rows: int, *,
                          override_num_blocks: int | None = None) -> str:
    webtext_dataset(n_rows, override_num_blocks=override_num_blocks) \
        .write_parquet(path)
    return path


_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)


def extract_text(html_bytes: bytes) -> str | None:
    """Extract the text payload from an html cell — byte-identical to the
    ``text`` column for generated rows (north-star invariant). Returns None
    when no payload is found."""
    if html_bytes is None:
        return None
    m = _ARTICLE_RE.search(html_bytes)
    if m is None:
        return None
    try:
        return m.group(1).decode("utf-8")
    except UnicodeDecodeError:
        return None


def extract_text_batch(batch: pa.Table, *, html_col: str = "html") -> pa.Array:
    """Vector wrapper for map_batches stages: html column → extracted text
    (large_string, null where extraction fails)."""
    payload = [extract_text(b) for b in batch.column(html_col).to_pylist()]
    return pa.array(payload, type=pa.large_string())


_OPEN = b"<article>"
_CLOSE = b"</article>"


def _binary_buffers(col: pa.Array) -> tuple[np.ndarray, memoryview]:
    """(offsets, data) of a binary/large_binary/string array — zero-copy."""
    t = col.type
    if pa.types.is_large_binary(t) or pa.types.is_large_string(t):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype,
                            count=len(col) + 1, offset=col.offset * np.dtype(off_dtype).itemsize)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return offsets, data


def _find_marker(h: np.ndarray, marker: bytes,
                 first_byte_pos: np.ndarray | None = None) -> np.ndarray:
    """Sorted positions of every occurrence of ``marker`` in the byte array
    — one vectorized equality pass per marker byte (no Python loop over
    rows or bytes). Pass ``first_byte_pos`` (positions of ``marker[0]``)
    to share the full-buffer scan between markers with a common first byte
    (the open/close tags both anchor on ``<`` — sharing it is ~27% off the
    marker stage, measured per batch)."""
    m = np.frombuffer(marker, dtype=np.uint8)
    if h.size < m.size:
        return np.empty(0, dtype=np.int64)
    if first_byte_pos is None:
        cand = np.flatnonzero(h[:h.size - m.size + 1] == m[0])
    else:
        cand = first_byte_pos[first_byte_pos <= h.size - m.size]
    for k in range(1, m.size):
        if cand.size == 0:
            break
        cand = cand[h[cand + k] == m[k]]
    return cand


def extraction_matches_batch(batch: pa.Table, *, html_col: str = "html",
                             text_col: str = "text") -> np.ndarray:
    """Per-row ``extract_text(html) == text`` as a bool ndarray, fully
    vectorized over the Arrow buffers (VERDICT r1 item 5 — this check is the
    single largest per-doc compute in the flagship pass):

    1. find every ``<article>`` / ``</article>`` occurrence in the batch's
       WHOLE html buffer with numpy equality passes;
    2. per row, the first open marker inside the row and the first close
       after it via two ``np.searchsorted`` calls (same first-match
       semantics as the regex in :func:`extract_text`);
    3. concatenate candidate payload/text slices (views, one memcpy each)
       and compare with a single ``np.array_equal`` — memcmp speed in the
       common all-match case; mismatching rows are located from the unequal
       positions only when the buffers differ.

    Byte comparison suffices for the UTF-8 question: the text column is
    valid UTF-8 by construction, so equal bytes ⇒ decodable payload."""
    html = batch.column(html_col)
    text = batch.column(text_col)
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    h_off, h_mv = _binary_buffers(html)
    t_off, t_mv = _binary_buffers(text)
    h = np.frombuffer(h_mv, dtype=np.uint8)
    t = np.frombuffer(t_mv, dtype=np.uint8)
    n = len(html)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out

    lt_pos = np.flatnonzero(h == _OPEN[0])   # one '<' scan for both markers
    open_pos = _find_marker(h, _OPEN, lt_pos)
    close_pos = _find_marker(h, _CLOSE, lt_pos)

    row_start = h_off[:-1].astype(np.int64)
    row_end = h_off[1:].astype(np.int64)
    # first open marker at/after each row start; must land inside the row
    oi = np.searchsorted(open_pos, row_start)
    has_open = (oi < open_pos.size)
    s = np.where(has_open, open_pos[np.minimum(oi, open_pos.size - 1)], 0) \
        + len(_OPEN)
    has_open &= (s - len(_OPEN)) < row_end
    # first close marker at/after the payload start; must end inside the row
    ci = np.searchsorted(close_pos, s)
    has_close = has_open & (ci < close_pos.size)
    e = np.where(has_close, close_pos[np.minimum(ci, close_pos.size - 1)], 0)
    has_close &= e + len(_CLOSE) <= row_end

    ta = t_off[:-1].astype(np.int64)
    tb = t_off[1:].astype(np.int64)
    plen = e - s
    cand = has_close & (plen == (tb - ta))
    rows = np.flatnonzero(cand)
    if rows.size:
        sv, ev = s[rows], e[rows]
        tav, tbv = ta[rows], tb[rows]
        cum0 = np.concatenate(([0], np.cumsum(ev - sv)))
        # slice+concat beats a fancy-index gather here (measured 2.9 vs
        # 5.2 µs/row: slices are hundreds of bytes, so building a
        # len-total int64 index array costs more than 16k slice views);
        # the text side IS contiguous in the common all-candidates case
        # (adjacent offsets) and collapses to one zero-copy view
        A = np.concatenate([h[a:b2] for a, b2 in zip(sv, ev)])
        if rows.size == 1 or np.array_equal(tav[1:], tbv[:-1]):
            B = t[tav[0]:tbv[-1]]
        else:
            B = np.concatenate([t[a:b2] for a, b2 in zip(tav, tbv)])
        ok = np.ones(rows.size, dtype=bool)
        if not np.array_equal(A, B):
            bad = np.flatnonzero(A != B)
            ok[np.unique(np.searchsorted(cum0, bad, side="right") - 1)] = False
        out[rows] = ok
    # null html or null text → mismatch handled by the zero init; but null
    # TEXT with null html is vacuously not identical — required:text flags it
    if html.null_count:
        out &= ~np.asarray(html.is_null())
    if text.null_count:
        out &= ~np.asarray(text.is_null())
    return out
