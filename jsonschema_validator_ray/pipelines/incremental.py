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

from ..stages import hashindex, minhashindex, statestore
from ..stages.dedup import dedup_exact
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


def ingest_increment(ds, root: str, *, batch_size: int = 4096) -> dict:
    """Ingest one crawl. Returns the summary dict that is also appended to
    the root meta: generation, input/survivor counts, per-stage drops, and
    the PSI drift of the crawl against the accumulated history (when a
    histogram column is configured and history exists)."""
    meta = _read_meta(root)
    key, text = meta["key"], meta["text"]
    gen = f"gen-{len(meta['ingests']):06d}"
    hash_dir = os.path.join(root, "hash_index")
    mh_dir = os.path.join(root, "minhash_index")
    stats_dir = os.path.join(root, "stats_state")
    corpus_gen = os.path.join(root, "corpus", gen)
    # stores materialize on the first NON-EMPTY ingest, so their presence
    # (not the ingest count) decides write-vs-update
    first = not os.path.exists(os.path.join(hash_dir, "meta.json"))

    # the crawl is consumed by count, drift, and the dedup probes —
    # materialize ONCE so the upstream pipeline runs a single time
    ds = ds.materialize()
    n_new = ds.count()

    # drift of the RAW crawl vs history, before history advances
    drift = {}
    if not first and n_new > 0:
        for col in list(meta["hist_edges"]) + list(meta["hist_categories"]):
            drift[col] = statestore.psi_vs_state(ds, stats_dir, col,
                                                 batch_size=batch_size)

    # exact dedup: within the crawl AND (after gen 0) against the index
    if first:
        survivors = dedup_exact(ds, key, text, batch_size=batch_size)
    else:
        survivors = hashindex.dedup_exact_incremental(
            ds, hash_dir, column=text, batch_size=batch_size)

    # near dedup against the indexed history (cross-crawl only); the
    # probe's materialized signatures flow through to the index update
    # below — the crawl text is shingled exactly once
    matched_pairs = 0
    surv_sigs = None
    if not first:
        survivors, matched, surv_sigs = minhashindex.dedup_near_incremental(
            survivors, mh_dir, threshold=meta["near_threshold"],
            batch_size=max(batch_size // 4, 256), return_sigs=True)
        matched_pairs = matched.count()

    # survivors land FIRST; every store update reads the written
    # generation; fresh_dir makes a crash-retry of the same gen safe
    from ..stages.util import fresh_dir

    survivors.write_parquet(fresh_dir(corpus_gen))
    n_kept = _corpus_gen_rows(corpus_gen)

    if n_kept > 0:
        kept = ray.data.read_parquet(corpus_gen)
        if first:
            hashindex.write_hash_index(kept, hash_dir, key=key, column=text,
                                       num_buckets=meta["num_buckets"],
                                       batch_size=batch_size)
            minhashindex.write_minhash_index(
                kept, mh_dir, key=key, text=text, n_perm=meta["n_perm"],
                bands=meta["bands"], seed=meta["seed"],
                num_buckets=meta["num_buckets"],
                batch_size=max(batch_size // 4, 256))
            statestore.write_stats_state(
                kept, stats_dir, meta["stats_columns"],
                hist_edges=meta["hist_edges"] or None,
                hist_categories=meta["hist_categories"] or None,
                batch_size=batch_size)
        else:
            hashindex.update_hash_index(kept, hash_dir, column=text,
                                        batch_size=batch_size)
            minhashindex.update_minhash_index(
                kept, mh_dir, batch_size=max(batch_size // 4, 256),
                sigs=surv_sigs)
            statestore.update_stats_state(kept, stats_dir,
                                          batch_size=batch_size)
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
