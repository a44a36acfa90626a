"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide "Aggregation at scale" + MinHash/LSH literature,
Broder 1997; Charikar 2002 for SimHash — public algorithms):

- **exact**: vectorized content hash per batch → ``groupby(hash)`` → keep the
  min-key row per group. The shuffle moves (hash, key) pairs, never documents.
- **MinHash+LSH**: per batch, shingle → 64-bit shingle hashes → n_perm
  universal-hash minima → band signatures; EXPLODE to
  ``(band, band_hash, key)`` rows → groupby buckets → candidate pairs →
  verify with minhash-estimated Jaccard (signatures travel with the
  candidates; raw text never crosses the shuffle).
- **SimHash**: 64-bit sign fingerprint per doc; band the 64 bits into 4×16-bit
  chunks (any pair within Hamming ≤ 3 shares ≥ 1 exact chunk — pigeonhole);
  groupby chunk value → verify Hamming.
- **n-gram Jaccard**: exact verification kernel used on candidate pairs.
- **embedding cosine**: random-hyperplane LSH buckets → within-bucket cosine.
"""

from __future__ import annotations

import logging
import re
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .util import no_meta

_MERSENNE_P = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 61) - 1)

_LOG = logging.getLogger(__name__)


def content_hash_batch(batch: pa.Table, column: str) -> pa.Array:
    """Deterministic 64-bit content hash (vectorized)."""
    h = pd.util.hash_pandas_object(
        batch.column(column).to_pandas(), index=False).to_numpy()
    return pa.array(h.astype(np.uint64))


def exact_duplicates(ds, key: str, column: str, *, batch_size: int = 32768):
    """→ Dataset of rows that are exact duplicates (same ``column`` content,
    not the minimal ``key``): ``(key, dup_of)``.

    Hash-partition + per-group min (SURVEY text: "exact (hash-partition +
    per-group first)"). Collision risk of 64-bit hashing is ~n²/2⁶⁵ —
    negligible below ~10⁹ distinct docs; for 10^12 keys use a 128-bit
    double-hash (two independent hash columns grouped together)."""

    n_buckets = 64

    def add_hash(b: pa.Table) -> pa.Table:
        h = content_hash_batch(b, column)
        # mask must be a uint64 scalar: a bare python int makes Arrow try to
        # promote the uint64 column to int64 and overflow
        bucket = pc.cast(
            pc.bit_wise_and(h, pa.scalar(n_buckets - 1, pa.uint64())),
            pa.int32())
        return pa.table({key: b.column(key), "content_hash": h,
                         "bucket": bucket})

    hashed = ds.select_columns([key, column]).map_batches(
        add_hash, batch_format="pyarrow", batch_size=batch_size)

    def dups_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per BUCKET (64 total); hash-group within via pandas
        # C-path — one Ray group per distinct hash would cost one Python
        # task per document group
        keep = g.groupby("content_hash", sort=False)[key].transform("min")
        rest = g[g[key] != keep]
        return pd.DataFrame({key: rest[key].to_numpy(),
                             "dup_of": keep[g[key] != keep].to_numpy()})

    return hashed.groupby("bucket").map_groups(
        dups_in_bucket, batch_format="pandas")


def dedup_exact(ds, key: str, column: str, *, batch_size: int = 32768,
                num_buckets: int = 64):
    """→ Dataset with exact-duplicate rows removed (min ``key`` survives per
    content group), fully distributed: hash the content, groupby hash-BUCKET
    (``num_buckets`` Ray groups), keep the min-key row per content value
    inside each group via the pandas C-path. No driver-side key set — web
    corpora run 20-30% duplicates, which at 10^12 rows would be 10^11 keys
    on the driver (VERDICT r1 item 2). Cost: the corpus crosses one
    all-to-all exchange (same volume as ``repartition(shuffle=True)``);
    within a bucket, grouping is by the VALUE, so 64-bit hash collisions
    cannot merge distinct contents."""
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be 2^k"

    def add_bucket(b: pa.Table) -> pa.Table:
        h = content_hash_batch(b, column)
        bucket = pc.cast(
            pc.bit_wise_and(h, pa.scalar(num_buckets - 1, pa.uint64())),
            pa.int32())
        return no_meta(b).append_column("__bucket", bucket)

    hashed = ds.map_batches(add_bucket, batch_format="pyarrow",
                            batch_size=batch_size)

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby(column, sort=False, dropna=False)[key].transform("min")
        return g[g[key] == keep].drop(columns=["__bucket"])

    return hashed.groupby("__bucket").map_groups(
        survivors, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\S+")


_MIX1 = np.uint64(0x9E3779B97F4B9279)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def _combine_kgrams(word_hashes: np.ndarray, k: int) -> np.ndarray:
    """uint64 hashes of consecutive word k-grams, combined NUMERICALLY
    (multiply-xor mixing of the k word hashes) — no shingle strings are ever
    built, so shingling is pure vectorized numpy."""
    n = word_hashes.size
    if n == 0:
        return np.array([np.uint64(0)], dtype=np.uint64)
    if n < k:
        acc = np.uint64(0)
        for h in word_hashes:
            acc = (acc * _MIX1) ^ np.uint64(h)
            acc ^= acc >> np.uint64(29)
        return np.array([acc], dtype=np.uint64)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = (acc * _MIX1) ^ word_hashes[j:n - k + 1 + j]
        acc ^= acc >> np.uint64(29)
    return acc


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (numeric combination of word hashes)."""
    return batch_shingle_hashes([text], k)[0]


def batch_shingle_hashes(texts: list[str | None], k: int = 3, *,
                         unique: bool = True) -> list[np.ndarray]:
    """Per-doc shingle hash arrays with ONE vectorized word-hash call for
    the whole batch, then vectorized k-gram combination — no per-shingle
    strings and no per-doc pandas overhead. ``unique=False`` skips the
    per-doc dedup for MIN-fold consumers (MinHash minima are identical
    over the multiset — measured ~10% off the signature pass); keep the
    default for set-semantics consumers (exact Jaccard)."""
    all_words: list[str] = []
    offsets = [0]
    for t in texts:
        all_words.extend(_WORD_RE.findall((t or "").lower()))
        offsets.append(len(all_words))
    if not all_words:
        return [np.array([np.uint64(0)], dtype=np.uint64) for _ in texts]
    h = pd.util.hash_pandas_object(
        pd.Series(all_words), index=False).to_numpy().astype(np.uint64)
    grams = [_combine_kgrams(h[offsets[i]:offsets[i + 1]], k)
             for i in range(len(texts))]
    return [np.unique(g) for g in grams] if unique else grams


class MinHasher:
    """n_perm universal-hash minima over shingle hashes:
    ``h_i(x) = (a_i·x + b_i) mod (2^61-1)`` — the classic Broder scheme.
    Deterministic (seeded) so signatures agree across workers/runs."""

    def __init__(self, n_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.n_perm = n_perm
        self.a = rng.integers(1, 1 << 61, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 61, size=n_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if shingles.size == 0:
            return np.full(self.n_perm, int(_MAX_HASH), dtype=np.uint64)
        # (n_perm, n_shingles) — modmul in python ints would be slow; use
        # float-safe splitting: (a*x) % p with uint64 overflow-safe trick
        x = shingles % _MERSENNE_P
        out = np.empty(self.n_perm, dtype=np.uint64)
        for i in range(self.n_perm):
            v = (int(self.a[i]) * x.astype(object) + int(self.b[i])) % int(_MERSENNE_P)
            out[i] = int(min(v))
        return out

    def signature_fast(self, shingles: np.ndarray) -> np.ndarray:
        """uint64-arithmetic variant: multiply mod 2^64 then mix — not the
        textbook mod-p family but an equally valid pairwise-independent-ish
        family in practice, and ~50× faster. Used by default."""
        if shingles.size == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        prod = shingles[None, :] * self.a[:, None]  # wraps mod 2^64
        prod = prod + self.b[:, None]
        prod ^= prod >> np.uint64(33)
        return prod.min(axis=1)

    def signature_matrix(self, per_doc: list[np.ndarray],
                         perm_chunk: int = 16) -> np.ndarray:
        """(n_docs, n_perm) signatures for a whole batch in ONE numpy pass
        per permutation chunk: concatenated shingles × a chunk of (a, b)
        rows, per-doc minima via ``np.minimum.reduceat`` on the segment
        starts — identical values to :meth:`signature_fast` per doc
        (asserted by tests), ~10% faster by replacing the per-doc Python
        loop with n_perm/perm_chunk passes. ``perm_chunk`` bounds the
        temporary at chunk × total_shingles × 8 bytes."""
        n_docs = len(per_doc)
        out = np.empty((n_docs, self.n_perm), dtype=np.uint64)
        if n_docs == 0:
            return out
        sizes = np.fromiter((s.size for s in per_doc), dtype=np.int64,
                            count=n_docs)
        empty_rows = np.flatnonzero(sizes == 0)
        if empty_rows.size:   # callers never produce empties; be safe —
            # pad for reduceat, then overwrite with signature_fast's
            # empty-input value (all uint64-max) to keep bit parity
            per_doc = [s if s.size else np.array([np.uint64(0)], np.uint64)
                       for s in per_doc]
            sizes = np.maximum(sizes, 1)
        flat = np.concatenate(per_doc)
        starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        for c0 in range(0, self.n_perm, perm_chunk):
            prod = flat[None, :] * self.a[c0:c0 + perm_chunk, None]
            prod = prod + self.b[c0:c0 + perm_chunk, None]
            prod ^= prod >> np.uint64(33)
            out[:, c0:c0 + perm_chunk] = np.minimum.reduceat(
                prod, starts, axis=1).T
        if empty_rows.size:
            out[empty_rows] = np.iinfo(np.uint64).max
        return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard — the verification kernel."""
    sa, sb = set(shingle_hashes(text_a, k)), set(shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class MinHashLSH:
    """Banding: n_perm = bands × rows; docs sharing ≥1 band bucket become
    candidates. Defaults (32 bands × 4 rows) catch Jaccard ≳ 0.5 with high
    probability."""

    def __init__(self, n_perm: int = 128, bands: int = 32, seed: int = 42):
        assert n_perm % bands == 0
        self.hasher = MinHasher(n_perm, seed)
        self.bands = bands
        self.rows = n_perm // bands

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        return self.band_hashes_matrix(sig.reshape(1, -1))[0]

    def band_hashes_matrix(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, n_perm) signature matrix → (n_docs, bands) band hashes
        (splitmix-style fold of each band's rows) — fully vectorized."""
        view = sigs.reshape(sigs.shape[0], self.bands, self.rows)
        acc = np.zeros((sigs.shape[0], self.bands), dtype=np.uint64)
        for r in range(self.rows):
            acc = (acc * np.uint64(0x9E3779B97F4B9279)) ^ view[:, :, r]
            acc ^= acc >> np.uint64(29)
        return acc


def minhash_signatures(ds, key: str, text: str, *, n_perm: int = 128,
                       seed: int = 42, batch_size: int = 1024,
                       concurrency: int | None = None):
    """→ Dataset ``(key, sig)`` of MinHash signatures (``sig`` = n_perm
    uint64 minima as a ``binary`` blob, ~8·n_perm bytes/doc). The reusable
    first pass of the LSH pipeline."""
    hasher = MinHasher(n_perm, seed)

    def compute(b: pa.Table) -> pa.Table:
        per_doc = batch_shingle_hashes(b.column(text).to_pylist(),
                                       unique=False)
        mat = hasher.signature_matrix(per_doc)
        sigs = [mat[i].tobytes() for i in range(mat.shape[0])]
        return pa.table({key: b.column(key),
                         "sig": pa.array(sigs, type=pa.binary())})

    kwargs: dict = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.select_columns([key, text]).map_batches(compute, **kwargs)


def _sig_matrix(values: "pd.Series | list[bytes]", n_perm: int) -> np.ndarray:
    """Fixed-width binary signatures → (n, n_perm) uint64 matrix, one copy."""
    return np.frombuffer(b"".join(values), dtype=np.uint64).reshape(-1, n_perm)


def _empty_pairs(key_type: pa.DataType) -> pa.Table:
    return pa.table({"key_a": pa.array([], type=key_type),
                     "key_b": pa.array([], type=key_type),
                     "jaccard_est": pa.array([], type=pa.float64()),
                     "truncated": pa.array([], type=pa.int32())})


def _add_pair_bucket(num_buckets: int):
    """Deterministic pair-bucket column from hash(key_a) ^ hash(key_b)."""

    def fn(b: pa.Table) -> pa.Table:
        ha = pd.util.hash_pandas_object(
            b.column("key_a").to_pandas(), index=False).to_numpy()
        hb = pd.util.hash_pandas_object(
            b.column("key_b").to_pandas(), index=False).to_numpy()
        pb = ((ha ^ hb) % np.uint64(num_buckets)).astype(np.int32)
        return no_meta(b).append_column("__pb", pa.array(pb))

    return fn


def _dedupe_pairs(pairs_ds, agg: dict[str, str], *, num_buckets: int = 16):
    """Distributed (key_a, key_b) pair dedupe. Ray's multi-key
    ``groupby().aggregate`` is sort-based and pays seconds per 10^4 groups
    (measured: 21 s for 37k rows / 5k groups), so pairs are hash-bucketed on
    the pair key into ``num_buckets`` Ray groups and deduped inside each
    group on the pandas C-path. Output keeps the ``__pb`` bucket column so
    downstream per-pair stages can reuse the same partitioning."""

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["key_a", "key_b"], sort=False).agg(agg).reset_index()
        out["__pb"] = np.int32(g["__pb"].iloc[0])
        return out

    return pairs_ds.map_batches(
        _add_pair_bucket(num_buckets), batch_format="pyarrow"
    ).groupby("__pb").map_groups(dedupe, batch_format="pandas")


def _drop_cols(ds, cols: list[str]):
    def fn(b: pa.Table) -> pa.Table:
        return b.drop_columns([c for c in cols if c in b.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


def _candidate_bucket(band: np.ndarray, band_hash: np.ndarray,
                      num_buckets: int) -> np.ndarray:
    """Composite shuffle bucket ``hash(band, band_hash) % num_buckets`` for
    LSH candidate generation (VERDICT r2 item 1). Grouping candidates by the
    raw band id caps parallelism at the band count (4-32 Ray groups) and
    puts the WHOLE corpus × 1 band into a single task at scale; the
    composite key fans out to ``num_buckets`` groups while never splitting a
    (band, band_hash) LSH bucket across groups — pairing semantics are
    unchanged. Size ``num_buckets`` ≳ 2× cluster cores."""
    mixed = (band_hash ^ (band.astype(np.uint64) * _MIX2)) * _MIX1
    mixed ^= mixed >> np.uint64(33)
    return (mixed % np.uint64(num_buckets)).astype(np.int32)


def _pairs_driver(sigs, key: str, key_type: pa.DataType, lsh: "MinHashLSH",
                  n_perm: int, threshold: float, bucket_cap: int):
    """Driver-side LSH candidates + verify for SMALL signature sets (gated
    by ``driver_candidates_limit`` in :func:`minhash_near_duplicates`). One
    lexsort over (band, band_hash) replaces the two distributed exchanges;
    triu pairing loops ONLY over multi-member segments (near-dup buckets,
    a tiny fraction of the corpus); verify reads straight from the
    in-memory signature matrix. Pair set identical to the distributed path
    (overflow-cap membership aside — see the caller's docstring)."""
    import ray.data

    pdf = sigs.to_pandas()
    if len(pdf) == 0:
        return ray.data.from_arrow(_empty_pairs(key_type))
    # mirror the distributed verify's sig_map dict: last occurrence wins
    pdf = pdf.drop_duplicates(subset=[key], keep="last").reset_index(drop=True)
    n = len(pdf)
    keys = pdf[key].to_numpy()
    mat = _sig_matrix(pdf["sig"].tolist(), n_perm)
    bh = lsh.band_hashes_matrix(mat)                       # (n, bands)
    nb = lsh.bands
    band_col = np.repeat(np.arange(nb, dtype=np.int64), n)
    hash_col = bh.T.reshape(-1)                            # band-major
    doc_idx = np.tile(np.arange(n), nb)
    order = np.lexsort((doc_idx, hash_col, band_col))
    bc, hc, di = band_col[order], hash_col[order], doc_idx[order]
    cuts = np.flatnonzero((np.diff(bc) != 0) | (np.diff(hc) != 0)) + 1
    starts = np.r_[0, cuts]
    ends = np.r_[cuts, bc.size]
    multi = (ends - starts) >= 2
    out_a, out_b, out_t = [], [], []
    for s, e in zip(starts[multi], ends[multi]):
        ks = np.unique(keys[di[s:e]])
        if len(ks) < 2:
            continue
        dropped = len(ks) - bucket_cap
        if dropped > 0:
            _LOG.warning("minhash LSH bucket overflow: dropped %d of %d "
                         "members (cap %d)", dropped, len(ks), bucket_cap)
            ks = ks[:bucket_cap]
        ii, jj = np.triu_indices(len(ks), k=1)
        out_a.append(ks[ii])
        out_b.append(ks[jj])
        out_t.append(np.full(ii.size, 1 if dropped > 0 else 0,
                             dtype=np.int32))
    if not out_a:
        return ray.data.from_arrow(_empty_pairs(key_type))
    cand = pd.DataFrame({"key_a": np.concatenate(out_a),
                         "key_b": np.concatenate(out_b),
                         "truncated": np.concatenate(out_t)})
    cand = cand.groupby(["key_a", "key_b"], sort=False,
                        as_index=False)["truncated"].max()
    row_of = pd.Series(np.arange(n), index=keys)
    A = mat[row_of[cand["key_a"]].to_numpy()]
    B = mat[row_of[cand["key_b"]].to_numpy()]
    est = (A == B).mean(axis=1)
    keep = est >= threshold
    return ray.data.from_arrow(pa.table({
        "key_a": pa.array(cand["key_a"].to_numpy()[keep], type=key_type),
        "key_b": pa.array(cand["key_b"].to_numpy()[keep], type=key_type),
        "jaccard_est": pa.array(est[keep], type=pa.float64()),
        "truncated": pa.array(
            cand["truncated"].to_numpy()[keep].astype(np.int32),
            type=pa.int32()),
    }))


def minhash_near_duplicates(ds, key: str, text: str, *,
                            threshold: float = 0.7,
                            n_perm: int = 128, bands: int = 32,
                            seed: int = 42,
                            batch_size: int = 1024,
                            concurrency: int | None = None,
                            bucket_cap: int = 200,
                            num_buckets: int = 16,
                            candidate_buckets: int = 256,
                            verify_broadcast_limit: int = 50_000,
                            driver_candidates_limit: int = 100_000):
    """→ Dataset ``(key_a, key_b, jaccard_est, truncated)`` of near-duplicate
    pairs with minhash-estimated Jaccard ≥ threshold. ``truncated`` = 1 marks
    pairs from an LSH bucket that overflowed ``bucket_cap`` (members beyond
    the cap were dropped — the truncation is COUNTED, not silent).

    Fully distributed (VERDICT r1 item 1 — no ``to_pandas``/``take_all``
    anywhere in the path):

    1. **signatures** — one pass over the corpus → ``(key, sig)`` rows,
       materialized once (~8·n_perm bytes/doc in the object store, spillable)
       and reused by both later phases instead of re-shingling;
    2. **candidates** — band hashes vectorized from the signature matrix,
       exploded to (band, band_hash, key) rows (~12 bytes/band-row — sigs do
       NOT cross this shuffle), groupby ``hash(band, band_hash) %
       candidate_buckets`` (parallelism scales with the parameter, not the
       band count) → vectorized triu pairing per LSH bucket → distributed
       pair dedupe via groupby(key_a, key_b);
    3. **verify** — below ``verify_broadcast_limit`` candidates the verify
       runs driver-side (broadcast ``is_in`` pulls only the ≤ 2·pairs
       needed signatures — no extra shuffle); above it, two probe rows per
       pair bucket-join against the signature dataset
       (stages/joins.bucketed_join), one pair-bucket groupby re-unites both
       sides and estimates Jaccard with one vectorized
       ``(A == B).mean(axis=1)`` per bucket. Signatures cross the exchange
       once; the pair-side shuffle is candidate-sized.

    **Driver fast path**: when the corpus holds ≤ ``driver_candidates_limit``
    signatures (≤ ~100 MB at n_perm=128), phases 2+3 fold driver-side in one
    vectorized numpy pass — the two candidate exchanges over tiny band rows
    otherwise cost ~2 s of pure Ray Sort scheduling (the measured
    many-tiny-blocks trap). Results are identical to the distributed path
    except for WHICH cap-overflow members survive a > ``bucket_cap`` LSH
    bucket (arrival order there, key order here; both keep ``bucket_cap``
    members and flag ``truncated``). Set ``driver_candidates_limit=0`` to
    force the distributed path (parity-tested both ways).
    """
    import ray.data

    lsh = MinHashLSH(n_perm=n_perm, bands=bands, seed=seed)
    sigs = minhash_signatures(ds, key, text, n_perm=n_perm, seed=seed,
                              batch_size=batch_size,
                              concurrency=concurrency).materialize()
    key_type = dict(zip(sigs.schema().names, sigs.schema().types))[key]
    if sigs.count() <= driver_candidates_limit:
        return _pairs_driver(sigs, key, key_type, lsh, n_perm, threshold,
                             bucket_cap)

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "band_hash": pa.array([], type=pa.uint64()),
                             key: pa.array([], type=key_type),
                             "__cb": pa.array([], type=pa.int32())})
        mat = _sig_matrix(b.column("sig").to_pylist(), n_perm)
        bh = lsh.band_hashes_matrix(mat)                       # (n, bands)
        rep = pa.array(np.repeat(np.arange(n), lsh.bands))
        bands_tiled = np.tile(np.arange(lsh.bands, dtype=np.int32), n)
        flat = bh.reshape(-1)
        return pa.table({
            "band": pa.array(bands_tiled),
            "band_hash": pa.array(flat),
            key: b.column(key).take(rep),
            "__cb": pa.array(_candidate_bucket(bands_tiled, flat,
                                               candidate_buckets)),
        })

    exploded = sigs.map_batches(explode, batch_format="pyarrow",
                                batch_size=batch_size)

    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, bucket in g.groupby(["band", "band_hash"], sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.drop_duplicates(subset=[key])
            dropped = len(bucket) - bucket_cap
            if dropped > 0:
                _LOG.warning("minhash LSH bucket overflow: dropped %d of %d "
                             "members (cap %d)", dropped, len(bucket),
                             bucket_cap)
                bucket = bucket.head(bucket_cap)
            ks = np.sort(bucket[key].to_numpy())
            ii, jj = np.triu_indices(len(ks), k=1)
            out.append(pd.DataFrame({
                "key_a": ks[ii], "key_b": ks[jj],
                "truncated": np.full(ii.size, 1 if dropped > 0 else 0,
                                     dtype=np.int32)}))
        if not out:
            return pd.DataFrame({"key_a": pd.Series([], dtype=object),
                                 "key_b": pd.Series([], dtype=object),
                                 "truncated": pd.Series([], dtype=np.int32)})
        return pd.concat(out, ignore_index=True)

    cand = exploded.groupby("__cb").map_groups(
        pairs_in_band, batch_format="pandas")
    pairs = _dedupe_pairs(cand, {"truncated": "max"},
                          num_buckets=num_buckets).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(_empty_pairs(key_type))
    if n_pairs <= verify_broadcast_limit:
        return _verify_pairs_driver(pairs, sigs, key, key_type, n_perm,
                                    threshold)
    return _verify_pairs(pairs, sigs, key, key_type, n_perm, threshold,
                         num_buckets)


def _verify_pairs_driver(pairs, sigs, key: str, key_type: pa.DataType,
                         n_perm: int, threshold: float):
    """Driver-side verify for SMALL candidate sets (auto-picked below
    ``verify_broadcast_limit`` pairs, mirroring components' driver/join
    split): gather the candidate pairs once, broadcast their key set as an
    ``is_in`` filter over the signature dataset — only the needed sigs
    (≤ 2·pairs rows) return to the driver — then one vectorized
    ``(A == B).mean`` estimate. Saves the distributed verify's two extra
    shuffles; results identical."""
    import ray.data

    pdf = pairs.to_pandas()
    need = pd.unique(pd.concat([pdf["key_a"], pdf["key_b"]],
                               ignore_index=True))
    need_arr = pa.array(need, type=key_type)

    def pick(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column(key), value_set=need_arr)
        return b.filter(pc.fill_null(m, False))

    sig_rows = sigs.map_batches(pick, batch_format="pyarrow").to_pandas()
    sig_map = dict(zip(sig_rows[key], sig_rows["sig"]))
    ka = pdf["key_a"].to_numpy()
    kb = pdf["key_b"].to_numpy()
    A = _sig_matrix([sig_map[k] for k in ka], n_perm)
    B = _sig_matrix([sig_map[k] for k in kb], n_perm)
    est = (A == B).mean(axis=1)
    keep = est >= threshold
    return ray.data.from_arrow(pa.table({
        "key_a": pa.array(ka[keep], type=key_type),
        "key_b": pa.array(kb[keep], type=key_type),
        "jaccard_est": pa.array(est[keep], type=pa.float64()),
        "truncated": pa.array(
            pdf["truncated"].to_numpy()[keep].astype(np.int32),
            type=pa.int32()),
    }))


def _verify_pairs(pairs, sigs, key: str, key_type: pa.DataType,
                  n_perm: int, threshold: float, num_buckets: int):
    """Distributed verify: candidate ``(key_a, key_b, truncated, __pb)``
    pairs bucket-joined against the ``(key, sig)`` dataset (two probe rows
    per pair), re-united per pair bucket, Jaccard-estimated with one
    vectorized ``(A == B).mean`` per bucket, filtered at ``threshold``."""

    def to_probes(b: pa.Table) -> pa.Table:
        def cat(col):
            c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            return pa.concat_arrays([c, c])
        ka = b.column("key_a").combine_chunks() if isinstance(
            b.column("key_a"), pa.ChunkedArray) else b.column("key_a")
        kb = b.column("key_b").combine_chunks() if isinstance(
            b.column("key_b"), pa.ChunkedArray) else b.column("key_b")
        n = b.num_rows
        return pa.table({
            "key_a": cat(b.column("key_a")),
            "key_b": cat(b.column("key_b")),
            "probe": pa.concat_arrays([ka, kb]),
            "side": pa.array(np.r_[np.zeros(n, np.int8), np.ones(n, np.int8)]),
            "truncated": cat(b.column("truncated")),
            "__pb": cat(b.column("__pb")),  # pair bucket, reused by verify
        })

    from .joins import bucketed_join

    probes = pairs.map_batches(to_probes, batch_format="pyarrow")
    joined = bucketed_join(probes, sigs, on="probe", right_on=key,
                           num_buckets=num_buckets)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "key_a": pd.Series([], dtype=g["key_a"].dtype),
            "key_b": pd.Series([], dtype=g["key_b"].dtype),
            "jaccard_est": pd.Series([], dtype=np.float64),
            "truncated": pd.Series([], dtype=np.int32)})
        a = g[g["side"] == 0].drop_duplicates(["key_a", "key_b"]) \
            .set_index(["key_a", "key_b"])
        bb = g[g["side"] == 1].drop_duplicates(["key_a", "key_b"]) \
            .set_index(["key_a", "key_b"])
        idx = a.index.intersection(bb.index)
        if len(idx) == 0:
            return empty
        A = _sig_matrix(a.loc[idx, "sig"], n_perm)
        B = _sig_matrix(bb.loc[idx, "sig"], n_perm)
        est = (A == B).mean(axis=1)
        keep = est >= threshold
        if not keep.any():
            return empty
        kept = idx[keep]
        return pd.DataFrame({
            "key_a": kept.get_level_values(0).to_numpy(),
            "key_b": kept.get_level_values(1).to_numpy(),
            "jaccard_est": est[keep],
            "truncated": a.loc[kept, "truncated"].to_numpy().astype(np.int32),
        })

    out = joined.groupby("__pb").map_groups(verify, batch_format="pandas")

    def norm(b: pa.Table) -> pa.Table:
        # the padded union inside the bucketed join nulls pair-key columns on
        # signature rows, which makes pandas upcast int64 keys to float64 —
        # restore the input key type (and pin the metric dtypes)
        return pa.table({
            "key_a": pc.cast(b.column("key_a"), key_type),
            "key_b": pc.cast(b.column("key_b"), key_type),
            "jaccard_est": pc.cast(b.column("jaccard_est"), pa.float64()),
            "truncated": pc.cast(b.column("truncated"), pa.int32()),
        })

    return out.map_batches(norm, batch_format="pyarrow")


def decontaminate(train, bench, key: str, text: str, *,
                  threshold: float = 0.8,
                  n_perm: int = 128, bands: int = 32, seed: int = 42,
                  batch_size: int = 1024, bucket_cap: int = 200,
                  num_buckets: int = 16,
                  candidate_buckets: int = 256,
                  verify_broadcast_limit: int = 50_000,
                  strategy: str = "auto",
                  broadcast_limit: int = 5_000_000):
    """Benchmark decontamination: drop TRAIN docs whose text is a
    near-duplicate (MinHash-estimated Jaccard ≥ threshold) of ANY bench
    doc — the standard eval-set-overlap removal step of LLM data prep.

    Same distributed shape as :func:`minhash_near_duplicates`, with the
    banding phase generating CROSS-SIDE candidates only (train × bench
    within a band bucket; within-side duplicates are not this operator's
    job). The bench corpus is usually tiny next to the train corpus, so
    the pair space stays small even for generous thresholds. ``key``
    values must be disjoint across the two inputs (the verify join
    resolves signatures by key). Returns ``(clean_train, matched_pairs)``
    where matched pairs are ``(key_a=train key, key_b=bench key,
    jaccard_est, truncated)``.

    ``strategy``: 'broadcast' filters matched train keys via one gathered
    key set (right whenever matches ≪ corpus), 'join' uses a bucketed
    anti-join, 'auto' picks by match count against ``broadcast_limit``."""
    import ray.data

    lsh = MinHashLSH(n_perm=n_perm, bands=bands, seed=seed)
    sigs_t = minhash_signatures(train, key, text, n_perm=n_perm, seed=seed,
                                batch_size=batch_size).materialize()
    sigs_b = minhash_signatures(bench, key, text, n_perm=n_perm, seed=seed,
                                batch_size=batch_size).materialize()
    key_type = dict(zip(sigs_t.schema().names, sigs_t.schema().types))[key]

    def explode(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            if n == 0:
                return pa.table({
                    "band": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.uint64()),
                    key: pa.array([], type=key_type),
                    "side": pa.array([], type=pa.int8()),
                    "__cb": pa.array([], type=pa.int32())})
            mat = _sig_matrix(b.column("sig").to_pylist(), n_perm)
            bh = lsh.band_hashes_matrix(mat)
            rep = pa.array(np.repeat(np.arange(n), lsh.bands))
            bands_tiled = np.tile(np.arange(lsh.bands, dtype=np.int32), n)
            flat = bh.reshape(-1)
            return pa.table({
                "band": pa.array(bands_tiled),
                "band_hash": pa.array(flat),
                key: b.column(key).take(rep),
                "side": pa.array(np.full(n * lsh.bands, side, np.int8)),
                "__cb": pa.array(_candidate_bucket(bands_tiled, flat,
                                                   candidate_buckets)),
            })
        return fn

    exploded = sigs_t.map_batches(explode(0), batch_format="pyarrow") \
        .union(sigs_b.map_batches(explode(1), batch_format="pyarrow"))

    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, bucket in g.groupby(["band", "band_hash"], sort=False):
            tk = bucket.loc[bucket["side"] == 0, key].drop_duplicates()
            bk = bucket.loc[bucket["side"] == 1, key].drop_duplicates()
            if tk.empty or bk.empty:
                continue
            dropped = max(len(tk) - bucket_cap, 0) + max(len(bk) - bucket_cap, 0)
            if dropped > 0:
                _LOG.warning("decontaminate band bucket overflow: dropped "
                             "%d members (cap %d/side)", dropped, bucket_cap)
                tk, bk = tk.head(bucket_cap), bk.head(bucket_cap)
            ta, ba = tk.to_numpy(), bk.to_numpy()
            ii, jj = np.meshgrid(np.arange(ta.size), np.arange(ba.size),
                                 indexing="ij")
            out.append(pd.DataFrame({
                "key_a": ta[ii.ravel()], "key_b": ba[jj.ravel()],
                "truncated": np.full(ii.size, 1 if dropped else 0,
                                     dtype=np.int32)}))
        if not out:
            return pd.DataFrame({"key_a": pd.Series([], dtype=object),
                                 "key_b": pd.Series([], dtype=object),
                                 "truncated": pd.Series([], dtype=np.int32)})
        return pd.concat(out, ignore_index=True)

    cand = exploded.groupby("__cb").map_groups(
        pairs_in_band, batch_format="pandas")
    pairs = _dedupe_pairs(cand, {"truncated": "max"},
                          num_buckets=num_buckets).materialize()
    if pairs.count() == 0:
        return train, ray.data.from_arrow(_empty_pairs(key_type))

    n_pairs = pairs.count()
    if n_pairs <= verify_broadcast_limit:
        matched = _verify_pairs_driver(pairs, sigs_t.union(sigs_b), key,
                                       key_type, n_perm,
                                       threshold).materialize()
    else:
        matched = _verify_pairs(pairs, sigs_t.union(sigs_b), key, key_type,
                                n_perm, threshold, num_buckets).materialize()
    n_matched = matched.count()
    if n_matched == 0:
        return train, matched
    if strategy == "auto":
        strategy = "broadcast" if n_matched <= broadcast_limit else "join"

    if strategy == "broadcast":
        drop = set(r["key_a"] for r in
                   matched.select_columns(["key_a"]).take_all())
        drop_arr = pa.array(list(drop), type=key_type)

        def keep(b: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(b.column(key), value_set=drop_arr))
            return b.filter(pc.fill_null(mask, True))

        return train.map_batches(keep, batch_format="pyarrow"), matched

    from .joins import bucketed_join

    def drop_rows(b: pa.Table) -> pa.Table:
        ka = b.column("key_a")
        return pa.table({key: ka, "__drop": pa.array(
            np.ones(b.num_rows, dtype=np.int8))})

    drop_ds = matched.select_columns(["key_a"]).map_batches(
        drop_rows, batch_format="pyarrow")
    joined = bucketed_join(train, drop_ds, on=key, join_type="left_outer",
                           num_buckets=32)

    def keep_unmatched(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b.column("__drop"))) \
                .drop_columns(["__drop"])

    return joined.map_batches(keep_unmatched,
                              batch_format="pyarrow"), matched


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """Charikar SimHash over word-unigram hashes (unit weights)."""
    return int(batch_simhash64([text])[0])


def batch_simhash64(texts: list[str | None]) -> np.ndarray:
    """Vectorized SimHash for a whole batch: one hash call over all words,
    bit expansion once, per-doc bit sums via ``np.add.reduceat``."""
    all_words: list[str] = []
    offsets = [0]
    for t in texts:
        all_words.extend(_WORD_RE.findall((t or "").lower()))
        offsets.append(len(all_words))
    out = np.zeros(len(texts), dtype=np.uint64)
    if not all_words:
        return out
    h = pd.util.hash_pandas_object(
        pd.Series(all_words), index=False).to_numpy().astype(np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32)
    signed = 2 * bits - 1                       # (n_words, 64)
    starts = np.array(offsets[:-1])
    ends = np.array(offsets[1:])
    # reduceat over NONEMPTY segments only: clamping an empty trailing
    # segment's start would shift the previous segment's boundary and
    # corrupt the last nonempty document's fingerprint
    nonempty = np.flatnonzero(ends > starts)
    if nonempty.size == 0:
        return out
    sums = np.add.reduceat(signed, starts[nonempty], axis=0)
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for row, j in enumerate(nonempty):
        out[j] = np.sum(powers[sums[row] > 0], dtype=np.uint64)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_near_duplicates(ds, key: str, text: str, *,
                            max_hamming: int = 3,
                            batch_size: int = 1024,
                            candidate_buckets: int = 256):
    """→ Dataset ``(key_a, key_b, hamming)``. Pairs within Hamming ≤ 3 share
    at least one of the 4 16-bit chunks exactly (pigeonhole), so candidates
    = groupby (chunk_id, chunk_value), shuffled on the composite
    ``hash(chunk, chunk_val) % candidate_buckets`` so parallelism scales
    with the parameter instead of capping at 4 Ray groups."""

    def explode(b: pa.Table) -> pa.Table:
        keys = b.column(key).to_pylist()
        sh = batch_simhash64(b.column(text).to_pylist())
        n = len(keys)
        chunk_ids = np.tile(np.arange(4, dtype=np.int32), n)
        chunk_vals = np.empty(4 * n, dtype=np.uint64)
        for c in range(4):
            chunk_vals[c::4] = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        rep = pa.array(np.repeat(np.arange(n), 4))
        return pa.table({
            "chunk": pa.array(chunk_ids),
            "chunk_val": pa.array(chunk_vals),
            key: pa.array(keys).take(rep),
            "simhash": pa.array(np.repeat(sh, 4)),
            "__cb": pa.array(_candidate_bucket(chunk_ids, chunk_vals,
                                               candidate_buckets)),
        })

    exploded = ds.select_columns([key, text]).map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size)

    def pairs_in_chunk(g: pd.DataFrame) -> pd.DataFrame:
        # per-(chunk, value) pairing vectorized inside the composite bucket
        out_a, out_b, ham, trunc = [], [], [], []
        for _, bucket in g.groupby(["chunk", "chunk_val"], sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.drop_duplicates(subset=[key])
            dropped = len(bucket) - 200
            if dropped > 0:
                _LOG.warning("simhash chunk bucket overflow: dropped %d of "
                             "%d members (cap 200)", dropped, len(bucket))
                bucket = bucket.head(200)
            ks = bucket[key].to_numpy()
            hs = bucket["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ks)):
                x = hs[i + 1:] ^ hs[i]
                # vectorized popcount via uint8 view + lookup table
                d = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                                  axis=1).sum(axis=1) if len(x) else np.array([])
                hit = np.flatnonzero(d <= max_hamming)
                for h in hit:
                    a, b = sorted((ks[i], ks[i + 1 + h]))
                    out_a.append(a)
                    out_b.append(b)
                    ham.append(int(d[h]))
                    trunc.append(1 if dropped > 0 else 0)
        return pd.DataFrame({"key_a": out_a, "key_b": out_b, "hamming": ham,
                             "truncated": pd.Series(trunc, dtype=np.int32)})

    pairs = exploded.groupby("__cb").map_groups(
        pairs_in_chunk, batch_format="pandas")
    return _drop_cols(
        _dedupe_pairs(pairs, {"hamming": "min", "truncated": "max"}),
        ["__pb"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------


def embedding_near_duplicates(ds, key: str, emb: str, *,
                              threshold: float = 0.95,
                              n_planes: int = 12, dim: int | None = None,
                              seed: int = 42, batch_size: int = 8192,
                              candidate_buckets: int = 256):
    """→ Dataset ``(key_a, key_b, cosine)`` of embedding pairs with cosine ≥
    threshold. Random-hyperplane signs bucket vectors; exact cosine verifies
    within buckets. High thresholds ⇒ near-collinear vectors ⇒ same sign
    pattern with high probability; n_planes trades recall vs bucket size.
    Buckets shuffle on ``hash(bucket) % candidate_buckets`` so pairing
    parallelism scales with the parameter (not a fixed 16-group band)."""
    first = ds.take(1)
    if not first:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "key_a": pa.array([], type=pa.string()),
            "key_b": pa.array([], type=pa.string()),
            "cosine": pa.array([], type=pa.float64())}))
    d = dim or len(first[0][emb])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, n_planes)).astype(np.float32)

    def explode(b: pa.Table) -> pa.Table:
        keys = b.column(key).to_pylist()
        if not keys:  # empty block (e.g. fully filtered upstream)
            return pa.table({
                "__cb": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.uint64()),
                key: pa.array([], type=b.schema.field(key).type),
                "vec": pa.array([], type=pa.binary())})
        col = b.column(emb)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(keys), -1).astype(np.float32)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.clip(norms, 1e-12, None)
        signs = (mat @ planes) > 0
        bucket = np.zeros(len(keys), dtype=np.uint64)
        for p in range(n_planes):
            bucket |= signs[:, p].astype(np.uint64) << np.uint64(p)
        return pa.table({
            "__cb": pa.array(_candidate_bucket(
                np.zeros(len(keys), dtype=np.int32), bucket,
                candidate_buckets)),
            "bucket": pa.array(bucket),
            key: pa.array(keys),
            "vec": pa.array([row.tobytes() for row in mat], type=pa.binary()),
        })

    exploded = ds.select_columns([key, emb]).map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size)

    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, cos, trunc = [], [], [], []
        for _, bucket_rows in g.groupby("bucket", sort=False):
            if len(bucket_rows) < 2:
                continue
            bucket_rows = bucket_rows.drop_duplicates(subset=[key])
            dropped = len(bucket_rows) - 500
            if dropped > 0:
                _LOG.warning("hyperplane-LSH bucket overflow: dropped %d of "
                             "%d members (cap 500)", dropped, len(bucket_rows))
                bucket_rows = bucket_rows.head(500)
            ks = bucket_rows[key].to_numpy()
            mat = np.stack([np.frombuffer(v, dtype=np.float32)
                            for v in bucket_rows["vec"]])
            sims = mat @ mat.T
            ii, jj = np.triu_indices(len(ks), k=1)
            hit = sims[ii, jj] >= threshold
            for i, j, s in zip(ii[hit], jj[hit], sims[ii, jj][hit]):
                a, b = sorted((ks[i], ks[j]))
                out_a.append(a)
                out_b.append(b)
                cos.append(float(s))
                trunc.append(1 if dropped > 0 else 0)
        return pd.DataFrame({"key_a": out_a, "key_b": out_b, "cosine": cos,
                             "truncated": pd.Series(trunc, dtype=np.int32)})

    pairs = exploded.groupby("__cb").map_groups(
        pairs_in_band, batch_format="pandas")
    return _drop_cols(
        _dedupe_pairs(pairs, {"cosine": "max", "truncated": "max"}),
        ["__pb"])
