"""Persisted MinHash/LSH index for INCREMENTAL cross-run NEAR-dedup:
probe each new crawl for near-duplicates of everything already ingested
WITHOUT re-signing or rescanning the existing corpus.

The in-memory path (stages/dedup.decontaminate) re-signatures BOTH sides
every run — O(total) per increment. This index persists the history side
once, in two partition-pruned Parquet stores per generation:

- ``gen-<g>/bands/band_bucket=<b>/`` — one ``(band, band_hash, key)`` row
  per (doc × band), bucketed by the SAME composite shuffle key the live
  LSH candidate stage uses (``hash(band, band_hash) % num_buckets``,
  stages/dedup._candidate_bucket), so a probe task reads exactly one
  bucket directory per generation and an LSH bucket is never split;
- ``gen-<g>/sigs/sig_bucket=<b>/`` — one ``(key, sig)`` row per doc
  (``sig`` = n_perm uint64 minima, ~8·n_perm bytes), bucketed by
  ``hash(key)``, read only by the verify stage for the keys that actually
  produced candidates.

Storing signatures once (not per band row) keeps the index at
~8·n_perm + 12·bands bytes/doc instead of ~8·n_perm·bands.

Probe dataflow (new side only is signed and shuffled):
new docs → signatures → band explode (keys only) → per-band-bucket merge
against the indexed band rows → candidate pairs → pair dedup → attach new
sigs (bucketed join) → per-sig-bucket verify against the indexed sigs
(vectorized ``(A == B).mean``) → pairs ``(key_a=new, key_b=indexed,
jaccard_est, truncated)``.

Generational like stages/hashindex: appends never mutate, ``meta.json``
swaps atomically, a killed update leaves the previous index intact. The
LSH parameters and ``num_buckets`` are fixed at creation (recorded in
meta.json) so every later run buckets identically. Sizing: a probe task's
working set is one band bucket (≈ docs·bands/num_buckets rows × 12 B) or
one sig bucket (≈ docs/num_buckets × 8·n_perm B); pick ``num_buckets`` so
both fit a worker's heap at the target corpus size (e.g. 2^16 for 10^12
docs).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .dedup import (MinHashLSH, _candidate_bucket, _dedupe_pairs,
                    _empty_pairs, _sig_matrix, minhash_signatures)
from .util import fresh_dir, no_meta
from .util import read_meta as _read_meta
from .util import write_meta as _write_meta


def _explode_bands(meta: dict, key_type: pa.DataType):
    lsh = MinHashLSH(n_perm=meta["n_perm"], bands=meta["bands"],
                     seed=meta["seed"])
    key, nb = meta["key"], meta["num_buckets"]

    def fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.uint64()),
                key: pa.array([], type=key_type),
                "band_bucket": pa.array([], type=pa.int32())})
        mat = _sig_matrix(b.column("sig").to_pylist(), meta["n_perm"])
        bh = lsh.band_hashes_matrix(mat)
        bands_tiled = np.tile(np.arange(lsh.bands, dtype=np.int32), n)
        flat = bh.reshape(-1)
        return pa.table({
            "band": pa.array(bands_tiled),
            "band_hash": pa.array(flat),
            key: b.column(key).take(pa.array(np.repeat(np.arange(n),
                                                       lsh.bands))),
            "band_bucket": pa.array(_candidate_bucket(bands_tiled, flat, nb)),
        })

    return fn


_SIG_MAP_CACHE: dict = {}


def _cached_sig_map(ref):
    """Per-worker memo for the broadcast sig dict: ``ray.get`` of a plain
    dict re-deserializes the whole object (up to the 64 MB broadcast limit,
    ~10× that as Python objects) on EVERY call — cache one probe's map per
    worker process, keyed by the ObjectRef."""
    import ray as _ray

    key = ref.hex()
    m = _SIG_MAP_CACHE.get(key)
    if m is None:
        _SIG_MAP_CACHE.clear()      # hold at most one probe's map
        m = _ray.get(ref)
        _SIG_MAP_CACHE[key] = m
    return m


def _key_bucket(keys, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy()
    return (h.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)


def _write_generation(ds, path: str, gen: str, meta: dict,
                      batch_size: int, sigs=None) -> None:
    """``sigs`` (a ``(key, sig)`` dataset, e.g. the probe's materialized
    signatures filtered to the survivors) skips the signature recompute —
    at scale the shingle+hash pass is the whole cost of an index update."""
    key, nb = meta["key"], meta["num_buckets"]
    if sigs is None:
        sigs = minhash_signatures(ds, key, meta["text"],
                                  n_perm=meta["n_perm"],
                                  seed=meta["seed"], batch_size=batch_size)
    else:
        sigs = sigs.select_columns([key, "sig"])

    def add_sb(b: pa.Table) -> pa.Table:
        kb = _key_bucket(b.column(key).to_pandas(), nb)
        return no_meta(b).append_column("sig_bucket", pa.array(kb))

    fresh_dir(os.path.join(path, gen))
    sig_dir = os.path.join(path, gen, "sigs")
    sigs.map_batches(add_sb, batch_format="pyarrow").write_parquet(
        sig_dir, partition_cols=["sig_bucket"])

    # band rows derive from the WRITTEN sigs (a dataset branch would
    # recompute the signature pass — reading ~1 KB/doc back is far cheaper
    # than re-shingling the text)
    import ray.data
    written = ray.data.read_parquet(sig_dir, columns=[key, "sig"])
    key_type = dict(zip(written.schema().names, written.schema().types))[key]
    written.map_batches(_explode_bands(meta, key_type),
                        batch_format="pyarrow", batch_size=batch_size) \
        .write_parquet(os.path.join(path, gen, "bands"),
                       partition_cols=["band_bucket"])


def write_minhash_index(ds, path: str, *, key: str, text: str,
                        n_perm: int = 128, bands: int = 32, seed: int = 42,
                        num_buckets: int = 64,
                        batch_size: int = 1024) -> None:
    """Create a new index at ``path`` (generation 0) from the initial
    corpus (typically already near-deduped within itself)."""
    meta = {"key": key, "text": text, "n_perm": n_perm, "bands": bands,
            "seed": seed, "num_buckets": num_buckets, "generations": []}
    os.makedirs(path, exist_ok=True)
    gen = "gen-000000"
    _write_generation(ds, path, gen, meta, batch_size)
    meta["generations"] = [gen]
    _write_meta(path, meta)


def update_minhash_index(ds, path: str, *, batch_size: int = 1024,
                         sigs=None) -> None:
    """Append a new generation with ``ds``'s signatures/band rows (pass the
    SURVIVORS of the incremental dedup so the index tracks the kept corpus).
    Atomic: data lands fully before meta.json is replaced. Pass ``sigs``
    (survivor signatures from :func:`dedup_near_incremental`) to skip
    recomputing them from text."""
    meta = _read_meta(path)
    gen = f"gen-{len(meta['generations']):06d}"
    _write_generation(ds, path, gen, meta, batch_size, sigs=sigs)
    meta["generations"].append(gen)
    _write_meta(path, meta)


def _index_key_type(path: str, meta: dict) -> pa.DataType:
    """Key dtype as persisted in the sig store (metadata-only read)."""
    for gen in meta["generations"]:
        for f in Path(path, gen, "sigs").rglob("*.parquet"):
            schema = pq.ParquetFile(f).schema_arrow
            return schema.field(meta["key"]).type
    return pa.int64()


def _read_bucket(path: str, generations: list[str], store: str,
                 part: str, bucket: int, columns: list[str]) -> pd.DataFrame:
    parts = []
    for gen in generations:
        d = Path(path) / gen / store / f"{part}={bucket}"
        if d.is_dir():
            parts.append(pq.read_table(d, columns=columns).to_pandas())
    if not parts:
        return pd.DataFrame(columns=columns)
    return pd.concat(parts, ignore_index=True)


def probe_minhash_index(ds, index_path: str, *, threshold: float = 0.7,
                        batch_size: int = 1024, bucket_cap: int = 200,
                        pair_buckets: int = 16, return_sigs: bool = False,
                        sig_broadcast_limit: int = 64 << 20, sigs=None,
                        sig_rows_hint: int | None = None):
    """→ Dataset ``(key_a, key_b, jaccard_est, truncated)``: every (new
    doc, indexed doc) pair with estimated Jaccard ≥ ``threshold``. ``ds``
    is the new crawl; only it is signed and shuffled — index I/O is
    partition-pruned bucket reads inside the tasks that need them.

    ``bucket_cap`` bounds each side of one (band, band_hash) LSH bucket
    (hot buckets emit capped pairs with ``truncated=1``, same contract as
    stages/dedup). New-side signatures are materialized once (~8·n_perm
    B/doc — the increment, not the corpus) because both the candidate and
    verify stages consume them. ``return_sigs=True`` → (pairs, sigs) so
    the caller can reuse the materialized signatures (index update).
    ``sigs`` skips the signing pass entirely: pass a dataset already
    carrying (key, sig) columns (e.g. the fused exact-dedup+signature pass
    of pipelines/incremental) and ``ds`` is ignored — at scale the
    shingle+hash pass is the whole probe cost. ``sig_rows_hint`` (an
    UPPER bound on the sig row count, e.g. the already-counted fused-pass
    rows) lets a small increment gather its sigs in ONE job instead of
    materialize + count + take_all."""
    import ray.data

    def ret(pairs, sigs):
        return (pairs, sigs) if return_sigs else pairs

    meta = _read_meta(index_path)
    key, nb = meta["key"], meta["num_buckets"]
    generations = list(meta["generations"])

    gathered = None
    if sigs is None:
        sigs = minhash_signatures(ds, key, meta["text"],
                                  n_perm=meta["n_perm"], seed=meta["seed"],
                                  batch_size=batch_size).materialize()
    elif (sig_rows_hint is not None
          and sig_rows_hint * meta["n_perm"] * 8 <= sig_broadcast_limit):
        # small increment with a row-count hint (the crawl-ingest case):
        # ONE gather replaces the materialize + count + take_all round
        # trips — the hint is an UPPER bound on the sig rows, so a
        # borderline crawl can only fall through to the shuffle path,
        # never gather an over-limit one. The single local block also
        # makes the band exchange's sort input trivial.
        gathered = sigs.select_columns([key, "sig"]).take_all()
        tbl = (pa.table({key: pa.array([r[key] for r in gathered]),
                         "sig": pa.array([r["sig"] for r in gathered],
                                         type=pa.binary())})
               if gathered else
               pa.table({key: pa.array(
                   [], type=_index_key_type(index_path, meta)),
                   "sig": pa.array([], type=pa.binary())}))
        sigs = ray.data.from_arrow(tbl)
    else:
        sigs = sigs.select_columns([key, "sig"]).materialize()
    n_sig = len(gathered) if gathered is not None else sigs.count()
    if n_sig == 0:
        # empty crawl (e.g. everything already dropped upstream): an empty
        # Dataset has no schema to read the key type from — take it from
        # the index's own sig store
        return ret(ray.data.from_arrow(
            _empty_pairs(_index_key_type(index_path, meta))), sigs)
    key_type = dict(zip(sigs.schema().names, sigs.schema().types))[key]

    explode = _explode_bands(meta, key_type)

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "key_a": pd.Series([], dtype=g[key].dtype),
            "key_b": pd.Series([], dtype=g[key].dtype),
            "truncated": pd.Series([], dtype=np.int32)})
        old = _read_bucket(index_path, generations, "bands", "band_bucket",
                           int(g["__cb"].iloc[0]),
                           ["band", "band_hash", key])
        if not len(old):
            return empty
        # cap each side of an LSH bucket BEFORE the cross merge; the
        # truncated flag marks only pairs from the OVERFLOWED (band,
        # band_hash) buckets (stages/dedup contract), not the whole group
        gb = g.groupby(["band", "band_hash"], sort=False)
        ob = old.groupby(["band", "band_hash"], sort=False)
        over = (gb.size().rename("na").to_frame()
                .join(ob.size().rename("nb"), how="outer").fillna(0))
        over["__tr"] = ((over["na"] > bucket_cap)
                        | (over["nb"] > bucket_cap)).astype(np.int32)
        new_c = gb.head(bucket_cap)
        old_c = ob.head(bucket_cap)
        m = new_c[["band", "band_hash", key]].merge(
            old_c, on=["band", "band_hash"], suffixes=("_a", "_b"))
        if not len(m):
            return empty
        m = m.merge(over["__tr"].reset_index(), on=["band", "band_hash"])
        out = m[[f"{key}_a", f"{key}_b", "__tr"]].rename(
            columns={f"{key}_a": "key_a", f"{key}_b": "key_b",
                     "__tr": "truncated"})
        out = out[out["key_a"] != out["key_b"]]
        if not len(out):
            return empty
        out["truncated"] = out["truncated"].astype(np.int32)
        return out

    if gathered is not None:
        # sigs are already local: explode bands DRIVER-side and emit one
        # Arrow block per band bucket — batch_size=None then hands each
        # block (= one complete __cb group) to ``candidates`` with ZERO
        # exchange, replacing the groupby sort (the probe's other sort,
        # the verify-side __ob exchange, stays — collapsing it would
        # re-read corpus-scale sig-store buckets once per band task).
        exp = explode(tbl).to_pandas().rename(columns={"band_bucket":
                                                       "__cb"})
        parts = [pa.Table.from_pandas(g, preserve_index=False)
                 .replace_schema_metadata(None)
                 for _, g in exp.groupby("__cb", sort=False)]
        cand = ray.data.from_arrow(parts).map_batches(
            candidates, batch_format="pandas", batch_size=None)
    else:
        def ren(b: pa.Table) -> pa.Table:
            i = b.schema.get_field_index("band_bucket")
            return b.set_column(i, "__cb", b.column("band_bucket"))

        exploded = sigs.map_batches(explode, batch_format="pyarrow",
                                    batch_size=batch_size) \
            .map_batches(ren, batch_format="pyarrow")
        cand = exploded.groupby("__cb").map_groups(candidates,
                                                   batch_format="pandas")

    # attach the NEW side's signature to each candidate pair. Small
    # increments (the common crawl-ingest case) broadcast the materialized
    # sig dict and skip BOTH the pair-dedupe exchange and the bucketed
    # join (two all-to-alls) — duplicate pairs from multiple bands are
    # dropped inside verify instead (a pair's __ob bucket is a pure
    # function of key_b, so all its band copies land in one group). Past
    # the limit, the shuffle path runs unchanged.
    broadcast = (n_sig * meta["n_perm"] * 8) <= sig_broadcast_limit
    if broadcast:
        rows = gathered if gathered is not None else sigs.take_all()
        sig_map = {r[key]: r["sig"] for r in rows}
        ref = ray.put(sig_map)

        def attach(b: pa.Table) -> pa.Table:
            m = _cached_sig_map(ref)
            ka = b.column("key_a").to_pandas()
            sig = pa.array(ka.map(m).to_numpy(), type=pa.binary())
            if sig.null_count:
                # every key_a came from this probe's own signatures — a
                # miss is a membership bug; fail HERE, not later inside
                # _sig_matrix's opaque reshape
                missing = ka[pd.isna(ka.map(m))].head(3).tolist()
                raise ValueError(
                    f"probe sig_map missing {sig.null_count} key_a values "
                    f"(e.g. {missing}) — broadcast map out of sync")
            return no_meta(b).append_column("sig", sig)

        joined = cand.map_batches(attach, batch_format="pyarrow")
    else:
        pairs = _dedupe_pairs(cand, {"truncated": "max"},
                              num_buckets=pair_buckets).materialize()
        if pairs.count() == 0:
            return ret(ray.data.from_arrow(_empty_pairs(key_type)), sigs)

        from .joins import bucketed_join

        joined = bucketed_join(pairs, sigs, on="key_a", right_on=key,
                               num_buckets=pair_buckets)

    def add_ob(b: pa.Table) -> pa.Table:
        # the join's padded union upcast int keys to float64; the sig-store
        # bucket is hash(key) OF THE ORIGINAL dtype — cast back BEFORE
        # hashing or every non-zero key routes to the wrong bucket
        kb = pc.cast(b.column("key_b"), key_type)
        ka = pc.cast(b.column("key_a"), key_type)
        b = b.drop_columns(["key_a", "key_b"])
        b = b.append_column("key_a", ka).append_column("key_b", kb)
        ob = _key_bucket(kb.to_pandas(), nb)
        return no_meta(b).append_column("__ob", pa.array(ob))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "key_a": pd.Series([], dtype=g["key_a"].dtype),
            "key_b": pd.Series([], dtype=g["key_b"].dtype),
            "jaccard_est": pd.Series([], dtype=np.float64),
            "truncated": pd.Series([], dtype=np.int32)})
        # broadcast path skips the pair-dedupe exchange: a pair hit by
        # several bands appears once per band — keep one copy, preserving
        # truncated's max (the join path arrives pre-deduped; this is a
        # no-op there)
        g = (g.sort_values("truncated", ascending=False, kind="mergesort")
              .drop_duplicates(["key_a", "key_b"]))
        old = _read_bucket(index_path, generations, "sigs", "sig_bucket",
                           int(g["__ob"].iloc[0]), [key, "sig"])
        if not len(old):
            return empty
        m = g.merge(old.rename(columns={key: "key_b", "sig": "__old_sig"}),
                    on="key_b")
        if not len(m):
            return empty
        A = _sig_matrix(m["sig"], meta["n_perm"])
        B = _sig_matrix(m["__old_sig"], meta["n_perm"])
        est = (A == B).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame({
            "key_a": m.loc[keep, "key_a"].to_numpy(),
            "key_b": m.loc[keep, "key_b"].to_numpy(),
            "jaccard_est": est[keep],
            "truncated": m.loc[keep, "truncated"].to_numpy().astype(np.int32),
        })

    out = joined.map_batches(add_ob, batch_format="pyarrow") \
        .groupby("__ob").map_groups(verify, batch_format="pandas")

    def norm(b: pa.Table) -> pa.Table:
        # the padded union inside bucketed_join nulls int64 keys on the
        # signature rows → pandas upcasts to float64; restore input dtypes
        return pa.table({
            "key_a": pc.cast(b.column("key_a"), key_type),
            "key_b": pc.cast(b.column("key_b"), key_type),
            "jaccard_est": pc.cast(b.column("jaccard_est"), pa.float64()),
            "truncated": pc.cast(b.column("truncated"), pa.int32()),
        })

    return ret(out.map_batches(norm, batch_format="pyarrow"), sigs)


def dedup_near_incremental(ds, index_path: str, *, threshold: float = 0.7,
                           batch_size: int = 1024, bucket_cap: int = 200,
                           pair_buckets: int = 16, strategy: str = "auto",
                           return_sigs: bool = False):
    """→ (survivors, matched_pairs): drop new docs that near-duplicate any
    indexed doc. Within-new near-dedup is a separate concern — run
    stages/dedup.minhash_near_duplicates on the survivors, then
    ``update_minhash_index`` with what you keep. ``return_sigs=True`` →
    (survivors, matched, survivor_sigs): the probe's materialized
    signatures filtered to the survivors, ready to hand to
    ``update_minhash_index(sigs=...)`` so the text is never re-shingled."""
    meta = _read_meta(index_path)
    matched, sigs = probe_minhash_index(
        ds, index_path, threshold=threshold, batch_size=batch_size,
        bucket_cap=bucket_cap, pair_buckets=pair_buckets, return_sigs=True)
    matched = matched.materialize()
    if matched.count() == 0:
        return (ds, matched, sigs) if return_sigs else (ds, matched)
    from .joins import anti_join
    survivors = anti_join(ds, matched, on=meta["key"], right_on="key_a",
                          strategy=strategy)
    if not return_sigs:
        return survivors, matched
    surv_sigs = anti_join(sigs, matched, on=meta["key"], right_on="key_a",
                          strategy=strategy)
    return survivors, matched, surv_sigs


def index_doc_count(path: str) -> int:
    """Docs indexed (sig-store row counts — Parquet metadata only)."""
    meta = _read_meta(path)
    n = 0
    for gen in meta["generations"]:
        for f in Path(path, gen, "sigs").rglob("*.parquet"):
            n += pq.ParquetFile(f).metadata.num_rows
    return n
