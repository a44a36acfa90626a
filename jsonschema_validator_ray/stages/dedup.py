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

import re
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE_P = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 61) - 1)


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


def dedup_exact(ds, key: str, column: str, *, batch_size: int = 32768):
    """→ Dataset with exact-duplicate rows removed (min ``key`` survives per
    content group). Implemented as an anti-join against the duplicate key
    set; the duplicate set is usually tiny relative to the corpus."""
    dup_keys = set(
        r[key] for r in exact_duplicates(ds, key, column,
                                         batch_size=batch_size).take_all())

    def drop(b: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(b.column(key),
                                  value_set=pa.array(list(dup_keys))))
        return b.filter(pc.fill_null(mask, True))

    if not dup_keys:
        return ds
    return ds.map_batches(drop, batch_format="pyarrow", batch_size=batch_size)


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


def batch_shingle_hashes(texts: list[str | None], k: int = 3
                         ) -> list[np.ndarray]:
    """Per-doc shingle hash arrays with ONE vectorized word-hash call for
    the whole batch, then vectorized k-gram combination — no per-shingle
    strings and no per-doc pandas overhead."""
    all_words: list[str] = []
    offsets = [0]
    for t in texts:
        all_words.extend(_WORD_RE.findall((t or "").lower()))
        offsets.append(len(all_words))
    if not all_words:
        return [np.array([np.uint64(0)], dtype=np.uint64) for _ in texts]
    h = pd.util.hash_pandas_object(
        pd.Series(all_words), index=False).to_numpy().astype(np.uint64)
    return [np.unique(_combine_kgrams(h[offsets[i]:offsets[i + 1]], k))
            for i in range(len(texts))]


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
        view = sig.reshape(self.bands, self.rows)
        # fold each band's rows into one uint64 (splitmix-style mixing)
        acc = np.zeros(self.bands, dtype=np.uint64)
        for r in range(self.rows):
            acc = (acc * np.uint64(0x9E3779B97F4B9279)) ^ view[:, r]
            acc ^= acc >> np.uint64(29)
        return acc


def minhash_explode_batch(lsh: MinHashLSH, key_col: str, text_col: str,
                          batch: pa.Table) -> pa.Table:
    """batch → (band, band_hash, key) rows (bands × rows_in_batch).
    Signatures do NOT travel with the explode — candidate generation only
    needs band hashes; estimates are computed in a second, candidate-only
    pass (the 10^12-scale shape: the shuffle carries ~12 bytes/band-row
    instead of a 1 KB signature)."""
    keys = batch.column(key_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    n = len(keys)
    band_ids = np.tile(np.arange(lsh.bands, dtype=np.int32), n)
    band_hash = np.empty(n * lsh.bands, dtype=np.uint64)
    out_keys = np.repeat(np.arange(n), lsh.bands)
    per_doc = batch_shingle_hashes(texts)
    for j, sh in enumerate(per_doc):
        sig = lsh.hasher.signature_fast(sh)
        band_hash[j * lsh.bands:(j + 1) * lsh.bands] = lsh.band_hashes(sig)
    key_arr = pa.array(keys).take(pa.array(out_keys))
    return pa.table({
        "band": pa.array(band_ids),
        "band_hash": pa.array(band_hash),
        key_col: key_arr,
    })


def minhash_near_duplicates(ds, key: str, text: str, *,
                            threshold: float = 0.7,
                            n_perm: int = 128, bands: int = 32,
                            seed: int = 42,
                            batch_size: int = 1024,
                            concurrency: int | None = None):
    """→ Dataset ``(key_a, key_b, jaccard_est)`` of near-duplicate pairs with
    minhash-estimated Jaccard ≥ threshold.

    Two phases:
    1. **candidates** — explode to (band, band_hash, key) rows (keys only),
       groupby band, per-bucket pandas pairing; pathological buckets capped
       at 200 members;
    2. **verify** — recompute signatures ONLY for candidate keys (filtered
       scan of the corpus, broadcast key set) and estimate Jaccard per pair.
       The candidate set is typically 10^-5 of the pair space (measured);
       if candidates outgrow the driver, swap the driver-side gather for a
       bucketed join of pairs against a signatures column.
    """
    lsh = MinHashLSH(n_perm=n_perm, bands=bands, seed=seed)

    def explode(b: pa.Table) -> pa.Table:
        return minhash_explode_batch(lsh, key, text, b)

    kwargs: dict = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    exploded = ds.select_columns([key, text]).map_batches(explode, **kwargs)

    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, bucket in g.groupby("band_hash", sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.drop_duplicates(subset=[key]).head(200)
            ks = bucket[key].to_numpy()
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    a, b = sorted((ks[i], ks[j]))
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"key_a": out_a, "key_b": out_b})

    cand = exploded.groupby("band").map_groups(
        pairs_in_band, batch_format="pandas")
    cand_pd = cand.to_pandas()
    if cand_pd.empty or "key_a" not in cand_pd.columns:
        import ray.data

        empty = pa.table({"key_a": pa.array([], type=pa.string()),
                          "key_b": pa.array([], type=pa.string()),
                          "jaccard_est": pa.array([], type=pa.float64())})
        return ray.data.from_arrow(empty)
    cand_pd = cand_pd.drop_duplicates()

    # phase 2: signatures for candidate keys only
    cand_keys = sorted(set(cand_pd["key_a"]) | set(cand_pd["key_b"]))
    key_set = pa.array(cand_keys)

    def sigs_for_candidates(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column(key), value_set=key_set)
        sub = b.filter(pc.fill_null(mask, False))
        if sub.num_rows == 0:
            return pa.table({key: pa.array([], type=b.schema.field(key).type),
                             "sig": pa.array([], type=pa.binary())})
        per_doc = batch_shingle_hashes(sub.column(text).to_pylist())
        sigs = [lsh.hasher.signature_fast(sh).tobytes() for sh in per_doc]
        return pa.table({key: sub.column(key),
                         "sig": pa.array(sigs, type=pa.binary())})

    sig_rows = ds.select_columns([key, text]).map_batches(
        sigs_for_candidates, batch_format="pyarrow",
        batch_size=batch_size).take_all()
    sig_map = {r[key]: np.frombuffer(r["sig"], dtype=np.uint64)
               for r in sig_rows}

    est = []
    for a, b in zip(cand_pd["key_a"], cand_pd["key_b"]):
        sa, sb = sig_map.get(a), sig_map.get(b)
        est.append(float(np.mean(sa == sb)) if sa is not None and sb is not None
                   else 0.0)
    cand_pd = cand_pd.assign(jaccard_est=est)
    out = cand_pd[cand_pd["jaccard_est"] >= threshold].reset_index(drop=True)
    import ray.data

    return ray.data.from_pandas(out) if len(out) else ray.data.from_arrow(
        pa.table({"key_a": pa.array([], type=key_set.type),
                  "key_b": pa.array([], type=key_set.type),
                  "jaccard_est": pa.array([], type=pa.float64())}))


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
                            batch_size: int = 1024):
    """→ Dataset ``(key_a, key_b, hamming)``. Pairs within Hamming ≤ 3 share
    at least one of the 4 16-bit chunks exactly (pigeonhole), so candidates
    = groupby (chunk_id, chunk_value)."""

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
        })

    exploded = ds.select_columns([key, text]).map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size)

    def pairs_in_chunk(g: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per CHUNK ID (4 total); per-value pairing vectorized
        out_a, out_b, ham = [], [], []
        for _, bucket in g.groupby("chunk_val", sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.drop_duplicates(subset=[key]).head(200)
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
        return pd.DataFrame({"key_a": out_a, "key_b": out_b, "hamming": ham})

    pairs = exploded.groupby("chunk").map_groups(
        pairs_in_chunk, batch_format="pandas")
    from ray.data.aggregate import Min

    return pairs.groupby(["key_a", "key_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------


def embedding_near_duplicates(ds, key: str, emb: str, *,
                              threshold: float = 0.95,
                              n_planes: int = 12, dim: int | None = None,
                              seed: int = 42, batch_size: int = 8192):
    """→ Dataset ``(key_a, key_b, cosine)`` of embedding pairs with cosine ≥
    threshold. Random-hyperplane signs bucket vectors; exact cosine verifies
    within buckets. High thresholds ⇒ near-collinear vectors ⇒ same sign
    pattern with high probability; n_planes trades recall vs bucket size."""
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
                "bucket_band": pa.array([], type=pa.uint64()),
                "bucket": pa.array([], type=pa.uint64()),
                key: pa.array([], type=b.schema.field(key).type),
                "vec": pa.array([], type=pa.binary())})
        mat = np.stack([np.asarray(v, dtype=np.float32)
                        for v in b.column(emb).to_pylist()])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.clip(norms, 1e-12, None)
        signs = (mat @ planes) > 0
        bucket = np.zeros(len(keys), dtype=np.uint64)
        for p in range(n_planes):
            bucket |= signs[:, p].astype(np.uint64) << np.uint64(p)
        return pa.table({
            "bucket_band": pa.array(bucket & np.uint64(0xF)),  # 16 Ray groups
            "bucket": pa.array(bucket),
            key: pa.array(keys),
            "vec": pa.array([row.tobytes() for row in mat], type=pa.binary()),
        })

    exploded = ds.select_columns([key, emb]).map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size)

    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, cos = [], [], []
        for _, bucket_rows in g.groupby("bucket", sort=False):
            if len(bucket_rows) < 2:
                continue
            bucket_rows = bucket_rows.drop_duplicates(subset=[key]).head(500)
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
        return pd.DataFrame({"key_a": out_a, "key_b": out_b, "cosine": cos})

    pairs = exploded.groupby("bucket_band").map_groups(
        pairs_in_band, batch_format="pandas")
    from ray.data.aggregate import Max

    return pairs.groupby(["key_a", "key_b"]).aggregate(
        Max("cosine", alias_name="cosine"))
