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


def _dummy_column(col: "pa.ChunkedArray", n: int):
    """``n`` cheap NON-NULL placeholder values of ``col``'s type (partial
    rows' data cells). Non-null matters: an all-null int64 column would
    upcast sibling rows to float64 inside downstream pandas group fns (the
    padded-union footgun in the repo conventions)."""
    import pyarrow as pa

    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.array([""] * n, type=t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.array([b""] * n, type=t)
    if pa.types.is_boolean(t):
        return pa.array([False] * n, type=t)
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pa.array([0] * n, type=t)
    # exotic types: repeat the first real value (cheap — n is 1-3 rows)
    return col.take(pa.array([0] * n))


def _batch_hist_json(col: "pa.ChunkedArray", kind: str, cfg) -> str:
    """One batch's drift histogram for a column, with the exact same
    null/NaN semantics as stages/stats.StatsPartial (integer bin counts, so
    batching never changes the merged result)."""
    import numpy as np

    from ..state.histogram import CategoricalHistogram, NumericHistogram

    valid = col.drop_null()
    if kind == "num":
        h = NumericHistogram(np.asarray(cfg, dtype=np.float64))
        if len(valid):
            v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
            h.add_values(v[~np.isnan(v)])
    else:
        h = CategoricalHistogram(cfg)
        if len(valid):
            vc = valid.value_counts()
            h.add_counts({str(x["values"]): x["counts"]
                          for x in vc.to_pylist()})
        h.n_null = col.null_count
    return h.to_json()


# tagged-union kind column of the fused dedup pass (int8):
_KIND_DATA, _KIND_HIST, _KIND_COUNT = 0, 1, 2


def _dedup_exact_sigs(ds, cfg: dict, hash_index_dir: str | None, *,
                      batch_size: int, emit_drift: bool = False):
    """FUSED exact-dedup + MinHash-signature + drift/count-partial pass over
    one crawl: → Dataset of survivor rows (all input columns) +
    ``content_hash`` (uint64) + ``sig`` (binary, n_perm uint64 minima) +
    the tagged-union bookkeeping columns ``__kind``/``__pcol``/``__hist``/
    ``__pcnt`` (``__kind != 0`` rows are per-batch PARTIALS: raw-row counts
    and, when ``emit_drift``, drift histograms of the RAW pre-dedup crawl —
    they ride the same exchange in a reserved bucket so the crawl is read
    exactly once per ingest, with no separate count or drift job).

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
    drift_cols = []
    if emit_drift:
        drift_cols = ([(c, "num", e) for c, e in
                       (cfg.get("hist_edges") or {}).items()]
                      + [(c, "cat", v) for c, v in
                         (cfg.get("hist_categories") or {}).items()])

    def add_bucket(b: "pa.Table") -> "pa.Table":
        h = content_hash_batch(b, text)
        n = b.num_rows
        data = (no_meta(b).append_column("content_hash", h)
                .append_column("__hb", _bucket_expr(h, nb))
                .append_column("__kind",
                               pa.array(np.zeros(n, np.int8)))
                .append_column("__pcol", pa.array([""] * n))
                .append_column("__hist", pa.array([""] * n))
                .append_column("__pcnt",
                               pa.array(np.zeros(n, np.int64))))
        # per-batch partial rows (raw-row count + drift histograms of the
        # RAW crawl), dummy-filled data cells, reserved bucket -1
        np_ = 1 + len(drift_cols)
        pcols = {c: _dummy_column(b.column(c), np_) for c in b.column_names}
        pcols["content_hash"] = pa.array([0] * np_, type=pa.uint64())
        pcols["__hb"] = pa.array([-1] * np_, type=pa.int32())
        pcols["__kind"] = pa.array(
            [_KIND_COUNT] + [_KIND_HIST] * len(drift_cols), type=pa.int8())
        pcols["__pcol"] = pa.array([""] + [c for c, _, _ in drift_cols])
        pcols["__hist"] = pa.array(
            [""] + [_batch_hist_json(b.column(c), k, cfg_)
                    for c, k, cfg_ in drift_cols])
        pcols["__pcnt"] = pa.array([n] + [0] * len(drift_cols),
                                   type=pa.int64())
        partial = pa.table(pcols, schema=data.schema)
        return pa.concat_tables([data, partial])

    hashed = ds.map_batches(add_bucket, batch_format="pyarrow",
                            batch_size=batch_size)

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["__hb"].iloc[0])
        if bucket < 0:                       # partial rows: pass through
            return g.assign(sig=b"").drop(columns=["__hb"])
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


def _data_rows_only(b: "pa.Table") -> "pa.Table":
    """Filter a fused-dedup union batch to its data rows, dropping the
    tagged-union bookkeeping columns."""
    import pyarrow as pa
    import pyarrow.compute as pc

    b = b.filter(pc.equal(b.column("__kind"), pa.scalar(0, pa.int8())))
    return b.drop_columns(["__kind", "__pcol", "__hist", "__pcnt"])


def _partial_rows_only(b: "pa.Table") -> "pa.Table":
    import pyarrow as pa
    import pyarrow.compute as pc

    b = b.filter(pc.not_equal(b.column("__kind"), pa.scalar(0, pa.int8())))
    return b.select(["__kind", "__pcol", "__hist", "__pcnt"])


def _extract_partials(combined) -> pd.DataFrame:
    """Driver-side fallback extraction of the count/drift partial rows, in
    the same synthetic (column, cnt, hist) form _commit_fn forwards them —
    used only when the survivor stream routes through an anti-join that
    data-only-filters the union first."""
    df = combined.map_batches(_partial_rows_only,
                              batch_format="pyarrow").to_pandas()
    if not len(df) or "__kind" not in df.columns:
        return pd.DataFrame({"column": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype="int64"),
                             "hist": pd.Series([], dtype=object)})
    return pd.DataFrame({
        "column": [("__nnew" if k == _KIND_COUNT else f"__drift:{c}")
                   for k, c in zip(df["__kind"], df["__pcol"])],
        "cnt": df["__pcnt"].astype("int64"),
        "hist": [h or None for h in df["__hist"]]})


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

        acks = []
        if "__kind" in b.column_names:
            # tagged-union input (fused dedup pass): forward the drift /
            # raw-count partial rows as synthetic ack rows ("__"-prefixed
            # column names, folded separately driver-side) and commit only
            # the data rows
            pmask = pc.not_equal(b.column("__kind"),
                                 pa.scalar(0, pa.int8()))
            p = b.filter(pmask)
            if p.num_rows:
                kinds = p.column("__kind").to_pylist()
                pcol = p.column("__pcol").to_pylist()
                acks.append(pa.Table.from_pylist([
                    {"column": ("__nnew" if k == _KIND_COUNT
                                else f"__drift:{c}"),
                     "cnt": n, "nulls": 0, "n_nan": 0, "hist": h or None}
                    for k, c, h, n in zip(kinds, pcol,
                                          p.column("__hist").to_pylist(),
                                          p.column("__pcnt").to_pylist())],
                    schema=PARTIAL_SCHEMA))
            b = b.filter(pc.invert(pmask)).drop_columns(
                ["__kind", "__pcol", "__hist", "__pcnt"])
        if b.num_rows == 0:
            return (pa.concat_tables(acks) if acks
                    else PARTIAL_SCHEMA.empty_table())
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

        return pa.concat_tables(acks + [stats_partial(corpus_t)])

    return commit


def ingest_increment(ds, root: str, *, batch_size: int = 4096) -> dict:
    """Ingest one crawl. Returns the summary dict that is also appended to
    the root meta: generation, input/survivor counts, per-stage drops, and
    the PSI drift of the crawl against the accumulated history (when a
    histogram column is configured and history exists).

    Execution shape (r5 — three Ray jobs per ingest, two on the first; the
    ~0.5 s/job scheduling floor dominated this pipeline's bench leg, so
    every driver-side loop over the crawl is gone):

    1. FUSED exact-dedup + signature + partials pass
       (:func:`_dedup_exact_sigs`) — the crawl is READ here (no separate
       materialize), within-crawl min-key dedup, partition-pruned index
       anti-join, and MinHash signing run in the same bucket tasks, and
       per-batch raw-row-count + drift-histogram partial rows ride the
       same exchange in a reserved bucket (n_new and PSI never get their
       own jobs — the histograms are integer bin counts, so the fold is
       exactly ``statestore.psi_vs_state``'s result);
    2. near-dup probe against the index, reusing those signatures
       (``probe_minhash_index(sigs=...)`` — nothing is re-shingled);
    3. FUSED commit (:func:`_commit_fn`) — one pass over the survivor
       rows writes the corpus generation AND the hash-index, sig-store,
       band-store partitions, returning stats partials + the forwarded
       count/drift partials as one ack stream folded driver-side.

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

    # exact dedup (within-crawl + vs index) fused with the signature pass
    # AND the raw-crawl count/drift partials — the one read of the crawl
    combined = _dedup_exact_sigs(
        ds, meta, hash_dir if not first else None,
        batch_size=batch_size, emit_drift=not first).materialize()

    matched_pairs = 0
    survivors = combined
    pre_extracted_partials = None
    n_comb = combined.count()
    if not first and n_comb > 0:
        matched = minhashindex.probe_minhash_index(
            None, mh_dir, threshold=meta["near_threshold"],
            batch_size=max(batch_size // 4, 256),
            sigs=combined.map_batches(
                _data_rows_only, batch_format="pyarrow"),
            # combined's row count bounds the data rows from above
            # (partial rows included) — unlocks the one-gather probe path
            sig_rows_hint=n_comb).materialize()
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
                # partial rows carry dummy keys — never near-dup-filter them
                bad = pc.and_(bad, pc.equal(b.column("__kind"),
                                            pa.scalar(0, pa.int8())))
                return b.filter(pc.invert(bad))

            survivors = combined.map_batches(keep_fn,
                                             batch_format="pyarrow")
        elif matched_pairs:
            # huge matched set: distributed anti-join. The join side must
            # be data rows only (partial rows carry dummy keys), so the
            # count/drift partials are extracted in their own small job
            # here — this path only triggers past 2M matched pairs, where
            # one extra metadata-scale job is noise
            from ..stages.joins import anti_join

            pre_extracted_partials = _extract_partials(combined)
            data = combined.map_batches(_data_rows_only,
                                        batch_format="pyarrow")
            survivors = anti_join(data, matched, on=key, right_on="key_a")

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

    # split the ack stream: "__"-prefixed synthetic rows are the forwarded
    # raw-crawl count/drift partials; the rest are the survivor stats
    # partials for the state store
    if pre_extracted_partials is not None:
        syn = pre_extracted_partials
    elif len(acks) and "column" in acks.columns:
        syn = acks[acks["column"].str.startswith("__")]
    else:                          # empty crawl loses its block schema
        syn = pd.DataFrame({"column": pd.Series([], dtype=object),
                            "cnt": pd.Series([], dtype="int64"),
                            "hist": pd.Series([], dtype=object)})
    if len(acks) and "column" in acks.columns:
        acks = acks[~acks["column"].str.startswith("__")]

    n_new = int(syn.loc[syn["column"] == "__nnew", "cnt"].sum())
    drift = {}
    if not first and n_new > 0:
        for col in list(meta["hist_edges"]) + list(meta["hist_categories"]):
            hj = syn.loc[syn["column"] == f"__drift:{col}", "hist"].dropna()
            if len(hj):
                drift[col] = statestore.psi_from_partials(
                    stats_dir, col, list(hj))

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
