"""Text-analysis scalar/vector functions for large-scale corpus pipelines:
tokenization, quality scoring, language-ID heuristic, fingerprinting.

All batch functions are vectorized (pyarrow.compute / numpy / pandas string
kernels) and stateless — used directly inside ``map_batches``; the language
profiles and regexes are module-level constants compiled once per worker
process.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# \S+ token = whitespace tokenization (matches the SQL oracle's
# regexp_split_to_array(text, '\s+') semantics)
TOKEN_RE = r"\S+"
# BPE-ish word/piece splitter: letters runs, digit runs, single punctuation
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_PUNCT = set(".,;:!?()[]{}\"'`~@#$%^&*-_=+|\\/<>")

# tiny stopword profiles for the language-ID heuristic (top function words)
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "of", "and", "to", "in", "is", "was", "for", "that", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"},
    "fr": {"le", "la", "les", "de", "et", "est", "que", "pour", "dans", "une"},
    "es": {"el", "la", "los", "de", "y", "es", "que", "para", "con", "una"},
    "pt": {"o", "a", "os", "de", "e", "é", "que", "para", "com", "uma"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "niet", "met", "voor"},
}


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Array:
    """Whitespace token count per row (vectorized regex count)."""
    return pc.count_substring_regex(
        pc.cast(batch.column(column), pa.large_string()), TOKEN_RE)


def quality_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Quality-signal columns: lengths, token stats, punctuation / stopword /
    alpha ratios. Pandas string kernels (vectorized C loops) per batch."""
    s = batch.column(column).to_pandas().astype("string")
    n_chars = s.str.len()
    n_bytes = s.str.encode("utf-8").str.len()
    tokens = s.str.findall(TOKEN_RE)
    n_tokens = tokens.str.len()
    mean_tok = tokens.map(
        lambda ws: sum(map(len, ws)) / len(ws)
        if isinstance(ws, list) and ws else None)
    punct = s.map(lambda x: sum(c in _PUNCT for c in x) if isinstance(x, str) else None)
    alpha = s.map(lambda x: sum(c.isalpha() for c in x) if isinstance(x, str) else None)
    lowered = tokens.map(
        lambda ws: [w.lower() for w in ws] if isinstance(ws, list) else None)
    stop_en = lowered.map(
        lambda ws: sum(w in _LANG_PROFILES["en"] for w in ws) if ws is not None else None)
    out = {
        "n_chars": pa.array(n_chars.astype("Int64"), type=pa.int64()),
        "n_bytes": pa.array(n_bytes.astype("Int64"), type=pa.int64()),
        "n_tokens": pa.array(n_tokens.astype("Int64"), type=pa.int64()),
        "mean_token_len": pa.array(mean_tok.astype("Float64"), type=pa.float64()),
        "punct_ratio": pa.array(
            (punct / n_chars.replace(0, pd.NA)).astype("Float64"), type=pa.float64()),
        "alpha_ratio": pa.array(
            (alpha / n_chars.replace(0, pd.NA)).astype("Float64"), type=pa.float64()),
        "stopword_ratio": pa.array(
            (stop_en / n_tokens.replace(0, pd.NA)).astype("Float64"), type=pa.float64()),
    }
    return pa.table(out)


def langid_scores(text: str) -> dict[str, float]:
    """Stopword-profile language scores for one document."""
    words = [w.lower() for w in re.findall(r"[^\W\d_]+", text, re.UNICODE)]
    if not words:
        return {}
    n = len(words)
    return {lang: sum(w in prof for w in words) / n
            for lang, prof in _LANG_PROFILES.items()}


_SCRIPT_RANGES = (
    # (start, end, lang) — decisive Unicode script blocks
    (0x3040, 0x30FF, "ja"),    # hiragana + katakana (decisively Japanese)
    (0xAC00, 0xD7AF, "ko"),    # hangul syllables
    (0x0400, 0x04FF, "ru"),    # cyrillic
    (0x0590, 0x05FF, "he"),    # hebrew
    (0x0600, 0x06FF, "ar"),    # arabic
    (0x0370, 0x03FF, "el"),    # greek
    (0x0E00, 0x0E7F, "th"),    # thai
    (0x4E00, 0x9FFF, "zh"),    # CJK unified (→ zh unless kana seen first)
)


def _script_lang(text: str) -> str | None:
    """Dominant non-Latin script → language. Kana beats CJK-unified (Japanese
    text mixes both; Chinese has no kana), so ranges are ordered."""
    counts: dict[str, int] = {}
    for ch in text[:2000]:
        cp = ord(ch)
        for lo, hi, lang in _SCRIPT_RANGES:
            if lo <= cp <= hi:
                counts[lang] = counts.get(lang, 0) + 1
                break
    if not counts:
        return None
    if counts.get("ja", 0) > 0:   # any kana → Japanese even with many CJK
        return "ja"
    lang, n = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
    return lang if n >= max(3, len(text[:2000]) * 0.05) else None


def langid(text: str | None, min_score: float = 0.02) -> str | None:
    """Best-guess language, or None below confidence / empty input.
    Two-stage heuristic, deterministic and dependency-free:
    Unicode-script detection for non-Latin scripts (ja/ko/ru/he/ar/el/th/zh),
    then stopword profiles for Latin-script languages."""
    if not text:
        return None
    script = _script_lang(text)
    if script is not None:
        return script
    scores = langid_scores(text)
    if not scores:
        return None
    lang, score = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    return lang if score >= min_score else None


def langid_batch(batch: pa.Table, column: str = "text") -> pa.Array:
    return pa.array([langid(t) for t in batch.column(column).to_pylist()],
                    type=pa.string())


_FP_BASE = np.uint64(1_000_003)
_FP_MOD_MASK = np.uint64((1 << 61) - 1)


def fingerprint(text: str | None) -> int | None:
    """Document fingerprint: polynomial rolling hash (base 1000003, mod 2^61-1)
    over the UTF-8 bytes of whitespace-normalized text. Stable across runs
    and processes (no PYTHONHASHSEED dependence)."""
    if text is None:
        return None
    data = " ".join(text.split()).encode("utf-8")
    base = int(_FP_BASE)
    mod = (1 << 61) - 1
    acc = 0
    for b in data:
        acc = (acc * base + b) % mod
    return acc


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Array:
    """Vectorized fingerprint: horner scheme over a padded byte matrix would
    be memory-heavy for long docs; instead use numpy per row on the byte
    array — still C-speed per document."""
    out = []
    base = int(_FP_BASE)
    mod = (1 << 61) - 1
    for t in batch.column(column).to_pylist():
        if t is None:
            out.append(None)
            continue
        data = np.frombuffer(" ".join(t.split()).encode("utf-8"), dtype=np.uint8)
        acc = 0
        # chunked horner: fold 8 bytes at a time to cut Python-loop length 8×
        k = len(data) - (len(data) % 8)
        if k:
            chunk_base = pow(base, 8, mod)
            chunks = data[:k].reshape(-1, 8)
            weights = np.array([pow(base, 7 - j, mod) for j in range(8)],
                               dtype=object)
            folded = (chunks.astype(object) * weights).sum(axis=1) % mod
            for f in folded:
                acc = (acc * chunk_base + int(f)) % mod
        for b in data[k:]:
            acc = (acc * base + int(b)) % mod
        out.append(acc)
    return pa.array(out, type=pa.uint64())
