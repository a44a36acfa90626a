"""Incremental corpus ingest — the steady-state shape of a 100-TB crawl
pipeline, composing the three persisted state stores:

    new crawl → exact dedup vs history   (stages/hashindex)
             → near dedup vs history     (stages/minhashindex)
             → drift check vs history    (stages/statestore, PSI)
             → survivors append to the partitioned corpus
             → all three stores advance one generation

Each ingest is ONE pass over the new data; the accumulated corpus is never
rescanned (index I/O is partition-pruned bucket reads inside the probe
tasks). Within-crawl NEAR-dedup is deliberately out of scope here — that is
``pipelines/prep.prepare_training_data``'s job on each crawl before or
after ingest; this pipeline owns the CROSS-crawl invariants (exact dedup
runs within-crawl too, because the hash index probe already groups the new
data by content).

Crash contract: every store's meta.json swaps atomically AFTER its data
lands, and the ROOT meta (the list of completed ingests) swaps last. A
crash mid-ingest therefore leaves some stores one generation ahead of the
root meta; ``repair_state`` truncates every store back to the completed
ingest count (orphaned data directories are unreferenced and harmless), at
which point re-running the failed crawl is safe — probes only read
generations listed in each store's meta.

Survivor data flows through the WRITTEN corpus generation: survivors are
written to Parquet once, then the hash/stats store updates read that
generation back (~KBs of hashes/sketches per MB of text) instead of
re-executing — or worse, materializing — the dedup pipeline three times.
The MINHASH update goes one better: the near-dedup probe already
materialized the crawl's signatures, so they are filtered to the
survivors and handed to ``update_minhash_index(sigs=...)`` — each crawl's
text is shingled exactly once per ingest.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

import ray.data

from ..stages import minhashindex, statestore
from ..stages.util import read_meta as _read_meta
from ..stages.util import write_meta as _write_meta

_META = "meta.json"


def init_incremental_corpus(root: str, *, key: str = "doc_id",
                            text: str = "text",
                            stats_columns: list[str] | None = None,
                            hist_edges: dict | None = None,
                            hist_categories: dict | None = None,
                            near_threshold: float = 0.7,
                            num_buckets: int = 64, n_perm: int = 128,
                            bands: int = 32, seed: int = 42) -> None:
    """Create an empty incremental corpus at ``root`` (configuration only;
    the state stores materialize on the first ingest). All sharding and
    sketch parameters are fixed here so every later ingest buckets the
    same way."""
    os.makedirs(root, exist_ok=True)
    _write_meta(root, {
        "key": key, "text": text,
        "stats_columns": stats_columns,
        "hist_edges": hist_edges or {},
        "hist_categories": hist_categories or {},
        "near_threshold": near_threshold, "num_buckets": num_buckets,
        "n_perm": n_perm, "bands": bands, "seed": seed,
        "ingests": []})


def _corpus_gen_rows(gen_dir: str) -> int:
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in Path(gen_dir).rglob("*.parquet"))


def _dedup_exact_sigs(ds, cfg: dict, hash_index_dir: str | None, *,
                      batch_size: int):
    """FUSED exact-dedup + MinHash-signature pass over one crawl: → Dataset
    of survivor rows (all input columns) + ``content_hash`` (uint64) +
    ``sig`` (binary, n_perm uint64 minima).

    One exchange of the crawl (hash-bucket groupby, exactly
    stages/hashindex.dedup_exact_incremental's shape); each bucket task
    drops within-crawl duplicates (min key per content VALUE), anti-joins
    the persisted index bucket (partition-pruned read) when one exists, and
    signs the survivors' text in the same task — the crawl's text is
    shingled exactly once per ingest, and the signature pass that used to
    be its own Ray job disappears into this one."""
    import numpy as np
    import pyarrow as pa

    from ..stages.dedup import (MinHasher, batch_shingle_hashes,
                                content_hash_batch)
    from ..stages.hashindex import _bucket_expr, _bucket_hashes
    from ..stages.util import no_meta

    key, text = cfg["key"], cfg["text"]
    nb = cfg["num_buckets"]
    generations: list[str] = []
    if hash_index_dir is not None and \
            os.path.exists(os.path.join(hash_index_dir, _META)):
        hmeta = _read_meta(hash_index_dir)
        generations = list(hmeta["generations"])
        nb = hmeta["num_buckets"]
    hasher = MinHasher(cfg["n_perm"], cfg["seed"])

    def add_bucket(b: "pa.Table") -> "pa.Table":
        h = content_hash_batch(b, text)
        return (no_meta(b).append_column("content_hash", h)
                .append_column("__hb", _bucket_expr(h, nb)))

    hashed = ds.map_batches(add_bucket, batch_format="pyarrow",
                            batch_size=batch_size)

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["__hb"].iloc[0])
        keep = g.groupby(text, sort=False, dropna=False)[key].transform("min")
        g = g[g[key] == keep]
        if generations:
            seen = _bucket_hashes(hash_index_dir, generations, bucket)
            g = g[~np.isin(g["content_hash"].to_numpy().astype(np.uint64),
                           seen)]
        per_doc = batch_shingle_hashes(g[text].tolist(), unique=False)
        mat = hasher.signature_matrix(per_doc)
        g = g.assign(sig=[mat[i].tobytes() for i in range(mat.shape[0])])
        return g.drop(columns=["__hb"])

    return hashed.groupby("__hb").map_groups(survivors,
                                             batch_format="pandas")


def _commit_fn(cfg: dict, dirs: dict):
    """ONE job that writes EVERY store's data for a generation: corpus
    parquet + hash-index rows (``hash_bucket=<b>/``) + minhash sig rows
    (``sigs/sig_bucket=<b>/``) + band rows (``bands/band_bucket=<b>/``),
    returning per-batch column-stats partial rows as the ack stream (folded
    and persisted driver-side — KBs). Replaces three separate store-update
    jobs plus the sig-store read-back. Crash contract unchanged: nothing
    here touches any ``meta.json`` — data lands fully, metas swap after.

    Returns a plain FUNCTION for a task-pool ``map_batches`` (an actor
    pool would pay actor startup on every ingest — measured as a visible
    slice of the ~0.5 s/job floor this refactor exists to cut); shard
    names are uuid-per-call so parallel tasks never collide."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.hashindex import _bucket_expr
    from ..stages.minhashindex import _explode_bands, _key_bucket
    from ..stages.stats import PARTIAL_SCHEMA, StatsPartial
    from ..stages.util import no_meta

    key, num_buckets = cfg["key"], cfg["num_buckets"]
    stats_partial = StatsPartial(
        cfg["stats_columns"], hll_p=cfg.get("hll_p", 14),
        tdigest_compression=cfg.get("compression", 100.0),
        hist_edges=cfg["hist_edges"] or None,
        hist_categories=cfg["hist_categories"] or None)
    mh_meta = {"key": key, "n_perm": cfg["n_perm"], "bands": cfg["bands"],
               "seed": cfg["seed"], "num_buckets": num_buckets}

    def write_bucketed(t, bk, base, part, tag):
        for b in np.unique(bk):
            d = os.path.join(base, f"{part}={int(b)}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(t.filter(pa.array(bk == b)),
                           os.path.join(d, f"part-{tag}.parquet"))

    def commit(b: pa.Table) -> pa.Table:
        import uuid

        if b.num_rows == 0:
            return PARTIAL_SCHEMA.empty_table()
        tag = uuid.uuid4().hex[:16]

        corpus_t = no_meta(b.drop_columns(
            [c for c in ("content_hash", "sig") if c in b.column_names]))
        os.makedirs(dirs["corpus"], exist_ok=True)
        pq.write_table(corpus_t,
                       os.path.join(dirs["corpus"], f"part-{tag}.parquet"))

        h = pc.cast(b.column("content_hash"), pa.uint64())
        write_bucketed(
            pa.table({key: b.column(key), "content_hash": h}),
            _bucket_expr(h, num_buckets).to_numpy(zero_copy_only=False),
            dirs["hash"], "hash_bucket", tag)

        sig_t = pa.table({key: b.column(key),
                          "sig": pc.cast(b.column("sig"), pa.binary())})
        write_bucketed(
            sig_t, _key_bucket(b.column(key).to_pandas(), num_buckets),
            dirs["sigs"], "sig_bucket", tag)

        bands = _explode_bands(mh_meta, sig_t.schema.field(key).type)(sig_t)
        write_bucketed(
            bands.drop_columns(["band_bucket"]),
            bands.column("band_bucket").to_numpy(zero_copy_only=False),
            dirs["bands"], "band_bucket", tag)

        return stats_partial(corpus_t)

    return commit


def ingest_increment(ds, root: str, *, batch_size: int = 4096) -> dict:
    """Ingest one crawl. Returns the summary dict that is also appended to
    the root meta: generation, input/survivor counts, per-stage drops, and
    the PSI drift of the crawl against the accumulated history (when a
    histogram column is configured and history exists).

    Execution shape (r4 — fused; each bullet is ONE Ray job, cutting the
    per-ingest fixed scheduling overhead that dominated the bench leg):

    1. materialize the crawl (consumed by drift + dedup);
    2. PSI drift of the raw crawl vs history (skipped on gen 0);
    3. FUSED exact-dedup + signature pass (:func:`_dedup_exact_sigs`) —
       within-crawl min-key dedup, partition-pruned index anti-join, and
       MinHash signing all in the same bucket tasks;
    4. near-dup probe against the index, reusing those signatures
       (``probe_minhash_index(sigs=...)`` — nothing is re-shingled);
    5. FUSED commit (:class:`_IngestCommit`) — one pass over the survivor
       rows writes the corpus generation AND the hash-index, sig-store,
       band-store partitions, returning stats partials folded driver-side.

    Crash contract unchanged: all generation data lands before any store's
    ``meta.json`` swaps, and the ROOT meta swaps last; ``repair_state``
    semantics are identical."""
    meta = _read_meta(root)
    key = meta["key"]
    gen = f"gen-{len(meta['ingests']):06d}"
    hash_dir = os.path.join(root, "hash_index")
    mh_dir = os.path.join(root, "minhash_index")
    stats_dir = os.path.join(root, "stats_state")
    corpus_gen = os.path.join(root, "corpus", gen)
    # stores materialize on the first NON-EMPTY ingest, so their presence
    # (not the ingest count) decides write-vs-update
    first = not os.path.exists(os.path.join(hash_dir, _META))

    # the crawl is consumed by count, drift, and the dedup pass —
    # materialize ONCE so the upstream pipeline runs a single time
    ds = ds.materialize()
    n_new = ds.count()

    # drift of the RAW crawl vs history, before history advances
    drift = {}
    if not first and n_new > 0:
        for col in list(meta["hist_edges"]) + list(meta["hist_categories"]):
            drift[col] = statestore.psi_vs_state(ds, stats_dir, col,
                                                 batch_size=batch_size)

    # exact dedup (within-crawl + vs index) fused with the signature pass
    combined = _dedup_exact_sigs(
        ds, meta, hash_dir if not first else None,
        batch_size=batch_size).materialize()

    matched_pairs = 0
    survivors = combined
    if not first and combined.count() > 0:
        matched = minhashindex.probe_minhash_index(
            None, mh_dir, threshold=meta["near_threshold"],
            batch_size=max(batch_size // 4, 256),
            sigs=combined).materialize()
        matched_pairs = matched.count()
        if matched_pairs and matched_pairs <= 2_000_000:
            # small matched set (the common crawl-ingest case): broadcast
            # the dropped keys into a TASK filter — stages/joins.anti_join
            # would spin up an actor pool per ingest, and actor startup is
            # exactly the fixed overhead this pipeline is trimming
            import pyarrow as pa
            import pyarrow.compute as pc

            drop = pa.array(list({r["key_a"] for r in matched.take_all()}))

            def keep_fn(b: "pa.Table") -> "pa.Table":
                bad = pc.fill_null(
                    pc.is_in(b.column(key), value_set=drop), False)
                return b.filter(pc.invert(bad))

            survivors = combined.map_batches(keep_fn,
                                             batch_format="pyarrow")
        elif matched_pairs:
            from ..stages.joins import anti_join

            survivors = anti_join(combined, matched, on=key,
                                  right_on="key_a")

    # FUSED commit: every store's generation data in one job. Generation
    # names come from each store's CURRENT meta (they advance in lockstep,
    # but read each to stay robust); fresh_dir makes a crash-retry of the
    # same generation safe.
    from ..stages.util import fresh_dir

    def _next_gen(store_dir: str) -> str:
        p = os.path.join(store_dir, _META)
        if not os.path.exists(p):
            return "gen-000000"
        with open(p) as f:
            return f"gen-{len(json.load(f)['generations']):06d}"

    hgen, mgen, sgen = (_next_gen(d)
                        for d in (hash_dir, mh_dir, stats_dir))
    dirs = {
        "corpus": fresh_dir(corpus_gen),
        "hash": fresh_dir(os.path.join(hash_dir, hgen)),
        "sigs": os.path.join(mh_dir, mgen, "sigs"),
        "bands": os.path.join(mh_dir, mgen, "bands"),
    }
    fresh_dir(os.path.join(mh_dir, mgen))
    cfg = {"key": key, "num_buckets": meta["num_buckets"],
           "n_perm": meta["n_perm"], "bands": meta["bands"],
           "seed": meta["seed"], "stats_columns": meta["stats_columns"],
           "hist_edges": meta["hist_edges"],
           "hist_categories": meta["hist_categories"]}
    acks = survivors.map_batches(
        _commit_fn(cfg, dirs), batch_format="pyarrow",
        batch_size=max(batch_size * 8, 32768)).to_pandas()
    n_kept = _corpus_gen_rows(corpus_gen)

    if n_kept > 0:
        # fold + persist the stats partials (driver-side, KBs), then swap
        # every store meta — data is fully on disk at this point
        import pyarrow as pa

        stats_tbl = pa.concat_tables(
            [statestore._fold_group(g)
             for _, g in acks.groupby("column", sort=True)])
        sdir = fresh_dir(os.path.join(stats_dir, sgen))
        os.makedirs(sdir, exist_ok=True)
        pq.write_table(stats_tbl, os.path.join(sdir, "partials.parquet"))

        if first:
            _write_meta(hash_dir, {"num_buckets": meta["num_buckets"],
                                   "key": key, "generations": [hgen]})
            _write_meta(mh_dir, {"key": key, "text": meta["text"],
                                 "n_perm": meta["n_perm"],
                                 "bands": meta["bands"],
                                 "seed": meta["seed"],
                                 "num_buckets": meta["num_buckets"],
                                 "generations": [mgen]})
            _write_meta(stats_dir, {"columns": meta["stats_columns"],
                                    "hll_p": 14, "compression": 100.0,
                                    "hist_edges": meta["hist_edges"],
                                    "hist_categories":
                                        meta["hist_categories"],
                                    "generations": [sgen]})
        else:
            for d, g in ((hash_dir, hgen), (mh_dir, mgen),
                         (stats_dir, sgen)):
                m = _read_meta(d)
                m["generations"].append(g)
                _write_meta(d, m)
    # n_kept == 0 (fully-deduplicated re-crawl): nothing to fold — the
    # ingest is still recorded, the stores stay at their current
    # generation, and repair_state's store-behind-root case is a no-op

    summary = {"gen": gen, "n_new": int(n_new), "n_kept": int(n_kept),
               "n_dropped": int(n_new - n_kept),
               "near_matched_pairs": int(matched_pairs),
               "psi_drift": drift,
               # the store generation counts this COMPLETED ingest left
               # behind — repair_state's rollback target (empty ingests
               # skip store updates, so len(ingests) is not it)
               "store_gens": _store_gen_counts(root)}
    meta["ingests"].append(summary)
    _write_meta(root, meta)   # root meta swaps LAST (crash contract)
    return summary


def _store_gen_counts(root: str) -> dict:
    out = {}
    for store in ("hash_index", "minhash_index", "stats_state"):
        p = os.path.join(root, store, _META)
        if os.path.exists(p):
            with open(p) as f:
                out[store] = len(json.load(f)["generations"])
        else:
            out[store] = 0
    return out


def corpus_dataset(root: str):
    """The accumulated corpus (completed ingests only) as one Dataset."""
    meta = _read_meta(root)
    gens = [os.path.join(root, "corpus", rec["gen"])
            for rec in meta["ingests"]]
    files = sorted(str(f) for d in gens for f in Path(d).rglob("*.parquet"))
    return ray.data.read_parquet(files)


def corpus_size(root: str) -> int:
    meta = _read_meta(root)
    return sum(_corpus_gen_rows(os.path.join(root, "corpus", rec["gen"]))
               for rec in meta["ingests"])


def ingest_documents(sf_dir: str):
    """Driver query (rows-only): split the documents table into three
    "crawls" by doc_id % 3 and ingest them sequentially through the full
    incremental pipeline — exact + near dedup against the persisted
    history, PSI drift of each crawl vs the accumulated state. One summary
    row per ingest; cross-crawl invariants are pinned by
    tests/test_incremental.py."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.parquet import read_parquet

    root = os.path.join(tempfile.gettempdir(),
                        f"incr_corpus_{abs(hash(sf_dir)) % 10**8}")
    shutil.rmtree(root, ignore_errors=True)
    init_incremental_corpus(
        root, key="doc_id", text="text", stats_columns=["doc_id", "text",
                                                        "n_chars"],
        hist_edges={"n_chars": [0, 100, 500, 2000, 10**9]},
        near_threshold=0.7)

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "n_chars"])
    rows = []
    for r in range(3):
        def crawl(b: pa.Table, r=r) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 3 == r))

        s = ingest_increment(
            docs.map_batches(crawl, batch_format="pyarrow"), root)
        rows.append({"gen": s["gen"], "n_new": s["n_new"],
                     "n_kept": s["n_kept"], "n_dropped": s["n_dropped"],
                     "near_matched_pairs": s["near_matched_pairs"],
                     "psi_n_chars": s["psi_drift"].get("n_chars", 0.0)})
    rows.append({"gen": "TOTAL", "n_new": sum(r["n_new"] for r in rows),
                 "n_kept": corpus_size(root),
                 "n_dropped": sum(r["n_dropped"] for r in rows),
                 "near_matched_pairs": sum(r["near_matched_pairs"]
                                           for r in rows),
                 "psi_n_chars": 0.0})
    return pd.DataFrame(rows)


def repair_state(root: str) -> dict:
    """Roll every store back to the generation count the last COMPLETED
    ingest recorded, after a crash mid-ingest (see module docstring).
    Returns {store: generations dropped}. Orphaned data directories are
    left on disk — they are unreferenced, and the re-run of the failed
    crawl clears and rewrites its generation directories."""
    meta = _read_meta(root)
    targets = (meta["ingests"][-1]["store_gens"] if meta["ingests"]
               else {"hash_index": 0, "minhash_index": 0, "stats_state": 0})
    dropped = {}
    for store, n in targets.items():
        p = os.path.join(root, store, _META)
        if not os.path.exists(p):
            continue
        with open(p) as f:
            smeta = json.load(f)
        extra = len(smeta["generations"]) - n
        if extra > 0:
            smeta["generations"] = smeta["generations"][:n]
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                json.dump(smeta, f)
            os.replace(tmp, p)
        dropped[store] = max(extra, 0)
    return dropped
