"""Exact n-gram benchmark decontamination.

Training corpora must not contain evaluation data. The standard exact check
(Brown et al. 2020, appendix C: 13-gram overlap) flags every training
document that shares at least one token n-gram with the benchmark set. This
module implements it Ray-Data-first:

- the n-gram builder is fully vectorized over the Arrow buffers — token
  split (`pc.split_pattern`), position arithmetic in numpy over the list
  offsets, n shifted `take` gathers joined with one
  `binary_join_element_wise` — no Python loop over rows or grams;
- ``strategy="broadcast"`` (default): the DISTINCT benchmark n-grams are
  collected once (benchmarks are MBs; corpora are TBs), `ray.put` once, and
  every probe task counts membership with a single `pc.is_in` — the corpus
  never shuffles;
- ``strategy="join"``: for benchmark sides too big to broadcast, both sides
  explode to 64-bit n-gram hashes and meet in hash buckets (keys only — the
  documents never cross the exchange), then per-doc partial counts reduce
  in a second bucketed pass. Matching is on the hash (collision odds
  ~pairs/2^64, same budget as stages/dedup.dedup_exact documents).

Complements the probabilistic MinHash path (stages/dedup.decontaminate):
that one catches NEAR-duplicate leakage, this one is the exact-substring
gate evaluation suites actually specify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .util import no_meta


def _gram_positions(texts, n: int):
    """Token/position machinery shared by the gram builder and the span
    masker: → (parent row index, flat token position of each gram, token
    ListArray, int64 offsets). Tokenization is a plain single-space split
    (DuckDB ``string_split(text, ' ')`` parity, empties kept)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    toks = pc.split_pattern(texts, " ")
    off = toks.offsets.to_numpy().astype(np.int64)
    counts = np.maximum(off[1:] - off[:-1] - (n - 1), 0)
    parent = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    if parent.size == 0:
        return parent, np.zeros(0, dtype=np.int64), toks, off
    first = np.repeat(off[:-1], counts)
    cum = np.concatenate(([0], np.cumsum(counts)))
    intra = np.arange(int(counts.sum()), dtype=np.int64) \
        - np.repeat(cum[:-1], counts)
    return parent, first + intra, toks, off


def _join_grams(toks: pa.ListArray, p: np.ndarray, n: int) -> pa.Array:
    """Gram strings for flat token positions ``p`` — one shifted Arrow
    ``take`` per gram slot, joined element-wise."""
    if p.size == 0:
        return pa.array([], type=pa.string())
    vals = toks.values
    parts = [vals.take(pa.array(p + k, type=pa.int64())) for k in range(n)]
    return pc.binary_join_element_wise(*parts, " ")


def ngrams_batch(texts, n: int) -> tuple[np.ndarray, pa.Array]:
    """All token ``n``-grams of a string column → (parent row index,
    n-gram string). Vectorized: the only per-``n`` work is one shifted
    Arrow ``take`` per gram position."""
    parent, p, toks, _ = _gram_positions(texts, n)
    return parent, _join_grams(toks, p, n)


def _hash64(ng: pa.Array) -> np.ndarray:
    """Stable 64-bit n-gram hash (SipHash via pandas, fixed key — identical
    across processes/workers/runs, as stages/dedup.content_hash_batch)."""
    return pd.util.hash_pandas_object(
        pd.Series(ng.to_pandas()), index=False).to_numpy().astype(np.uint64)


def collect_benchmark_ngrams(bench, column: str, n: int, *,
                             batch_size: int = 4096,
                             broadcast_limit: int = 5_000_000):
    """DISTINCT n-grams of the benchmark side as one driver-side Arrow
    array, ready for `ray.put`. Per-batch `pc.unique` runs distributed;
    only the deduplicated grams funnel to the driver. Raises when the
    distinct count exceeds ``broadcast_limit`` — switch to
    ``strategy='join'`` instead of raising the limit."""

    def uniq(b: pa.Table) -> pa.Table:
        _, ng = ngrams_batch(b.column(column), n)
        return pa.table({"g": pc.unique(ng)})

    parts = bench.select_columns([column]).map_batches(
        uniq, batch_format="pyarrow", batch_size=batch_size).take_all()
    grams = pc.unique(pa.concat_arrays(
        [pa.array([r["g"] for r in parts], type=pa.string())])) \
        if parts else pa.array([], type=pa.string())
    if len(grams) > broadcast_limit:
        raise ValueError(
            f"{len(grams)} distinct benchmark n-grams exceeds "
            f"broadcast_limit={broadcast_limit}; use strategy='join'")
    return grams


class _NgramMembershipCounter:
    """Actor stage: per doc, how many n-gram positions hit the broadcast
    benchmark set. The gram set deserializes ONCE per actor from the
    object store; per batch it's one `pc.is_in` + one `np.bincount`."""

    def __init__(self, column: str, id_col: str, n: int, grams_ref):
        self.column, self.id_col, self.n = column, id_col, n
        grams = ray.get(grams_ref) \
            if isinstance(grams_ref, ray.ObjectRef) else grams_ref
        self.grams = pa.array(grams, type=pa.string()) \
            if isinstance(grams, list) else grams

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, ng = ngrams_batch(batch.column(self.column), self.n)
        hit = pc.is_in(ng, value_set=self.grams).to_numpy(
            zero_copy_only=False)
        counts = np.bincount(parent[hit], minlength=len(batch))
        keep = counts > 0
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self.id_col: ids.take(pa.array(np.flatnonzero(keep))),
            "matched_ngrams": pa.array(counts[keep], type=pa.int64()),
        })


def ngram_decontaminate(docs, bench, *, column: str, id_col: str,
                        n: int = 13, bench_column: str | None = None,
                        strategy: str = "broadcast",
                        concurrency: int = 4, batch_size: int = 4096,
                        num_buckets: int = 64,
                        broadcast_limit: int = 5_000_000):
    """→ Dataset ``(id_col, matched_ngrams)`` of training docs sharing at
    least one token ``n``-gram with the benchmark side, with the number of
    matching n-gram POSITIONS in the doc (occurrences, not distinct grams).
    """
    bench_column = bench_column or column
    if strategy == "broadcast":
        grams = collect_benchmark_ngrams(
            bench, bench_column, n, batch_size=batch_size,
            broadcast_limit=broadcast_limit)
        # small sets ride the task spec as a plain list (an Arrow array's
        # buffers would be promoted to the object store and make actor
        # restarts ref-fragile); big ones are ray.put ONCE
        ref = ray.put(grams) if len(grams) > 100_000 \
            else grams.to_pylist()
        return docs.select_columns([id_col, column]).map_batches(
            _NgramMembershipCounter,
            fn_constructor_args=(column, id_col, n, ref),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=(1, concurrency))
    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")

    # exact-at-any-size path: both sides explode to (hash-bucket, gram
    # hash); a bucket join counts per-doc partials, a second bucketed pass
    # sums them per id. Shuffled payload is 16-24 B/gram — never documents.
    schema = docs.schema()
    raw = dict(zip(schema.names, schema.types))[id_col]
    if isinstance(raw, pa.DataType):
        id_type = raw
    else:
        # pandas-backed datasets report numpy dtypes (object for strings)
        try:
            id_type = pa.from_numpy_dtype(np.dtype(raw))
        except (TypeError, pa.ArrowNotImplementedError):
            id_type = pa.string()

    def doc_grams(b: pa.Table) -> pa.Table:
        parent, ng = ngrams_batch(b.column(column), n)
        h = _hash64(ng)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)[parent]
        return pa.table({
            id_col: pa.array(ids),
            "gh": pa.array(h, type=pa.uint64()),
            "__gb": pa.array((h % num_buckets).astype(np.int32)),
            "__side": pa.array(np.zeros(h.size, dtype=np.int8)),
        })

    def bench_grams(b: pa.Table) -> pa.Table:
        _, ng = ngrams_batch(b.column(bench_column), n)
        h = np.unique(_hash64(pc.unique(ng)))
        return pa.table({
            # nulls typed to the LEFT schema: a concrete int64 here would
            # break the union for string/other doc-id types
            id_col: pa.nulls(h.size, type=id_type),
            "gh": pa.array(h, type=pa.uint64()),
            "__gb": pa.array((h % num_buckets).astype(np.int32)),
            "__side": pa.array(np.ones(h.size, dtype=np.int8)),
        })

    left = docs.select_columns([id_col, column]).map_batches(
        doc_grams, batch_format="pyarrow", batch_size=batch_size)
    right = bench.select_columns([bench_column]).map_batches(
        bench_grams, batch_format="pyarrow", batch_size=batch_size)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bench_h = g.loc[g["__side"] == 1, "gh"].unique()
        d = g[g["__side"] == 0]
        d = d[d["gh"].isin(bench_h)]
        if not len(d):
            return pd.DataFrame({id_col: pd.Series([], dtype=g[id_col].dtype),
                                 "partial": pd.Series([], dtype="int64")})
        out = d.groupby(id_col, sort=False).size().reset_index(name="partial")
        return out

    partials = left.union(right).groupby("__gb").map_groups(
        count_bucket, batch_format="pandas")

    def add_idb(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        idb = (pd.util.hash_pandas_object(pd.Series(ids), index=False)
               .to_numpy().astype(np.uint64) % num_buckets).astype(np.int32)
        return no_meta(b).append_column("__ib", pa.array(idb))

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(id_col, sort=False, as_index=False)["partial"].sum()
        return out.rename(columns={"partial": "matched_ngrams"})

    def norm(b: pa.Table) -> pa.Table:
        # the null-padded bench rows upcast int ids to float64 in pandas;
        # restore the input id type at the Arrow boundary
        return pa.table({
            id_col: pc.cast(b.column(id_col), id_type),
            "matched_ngrams": pc.cast(b.column("matched_ngrams"),
                                      pa.int64())})

    return partials.map_batches(add_idb, batch_format="pyarrow") \
        .groupby("__ib").map_groups(sum_bucket, batch_format="pandas") \
        .map_batches(norm, batch_format="pyarrow")


# ---- exact n-gram Jaccard near-duplicate pairs ----------------------------


def _jaccard_empty(id_type: pa.DataType,
                   measure: str = "jaccard") -> pa.Table:
    return pa.table({"key_a": pa.array([], type=id_type),
                     "key_b": pa.array([], type=id_type),
                     measure: pa.array([], type=pa.float64())})


class _JaccardSizeAttacher:
    """Actor stage: attach the broadcast doc→set-size lookup to candidate
    pair rows and emit thresholded exact Jaccard. The lookup deserializes
    ONCE per actor from the object store; per batch it's two dict gathers
    and one vectorized division."""

    def __init__(self, lut_ref, threshold: float, id_type: pa.DataType,
                 measure: str = "jaccard"):
        self.lut = ray.get(lut_ref) \
            if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        self.threshold = threshold
        self.id_type = id_type
        self.measure = measure

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _jaccard_empty(self.id_type, self.measure)
        ka = b.column("key_a").to_numpy(zero_copy_only=False)
        kb = b.column("key_b").to_numpy(zero_copy_only=False)
        it = b.column("inter").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sa = np.array([self.lut[k] for k in ka], dtype=np.float64)
        sb = np.array([self.lut[k] for k in kb], dtype=np.float64)
        # one IEEE division in either branch — bitwise oracle parity
        jac = it / np.minimum(sa, sb) if self.measure == "containment" \
            else it / (sa + sb - it)
        keep = jac >= self.threshold
        return pa.table({
            "key_a": pc.cast(b.column("key_a").filter(pa.array(keep)),
                             self.id_type),
            "key_b": pc.cast(b.column("key_b").filter(pa.array(keep)),
                             self.id_type),
            self.measure: pa.array(jac[keep], type=pa.float64()),
        })


def jaccard_near_duplicates(docs, *, column: str, id_col: str, n: int = 3,
                            threshold: float = 0.5, df_cap: int = 64,
                            num_buckets: int = 64, pair_buckets: int = 16,
                            batch_size: int = 4096,
                            size_broadcast_limit: int = 2_000_000,
                            measure: str = "jaccard"):
    """→ Dataset ``(key_a, key_b, jaccard)`` of document pairs whose EXACT
    n-gram Jaccard similarity is ≥ ``threshold`` — the deterministic
    complement to the probabilistic MinHash estimate
    (stages/dedup.minhash_near_duplicates).

    Measure: Jaccard over each document's DISTINCT token ``n``-gram set
    RESTRICTED to grams appearing in ≤ ``df_cap`` documents. The document
    -frequency cap is part of the measure, not an approximation: grams
    shared by more than ``df_cap`` docs are boilerplate (stopword phrases,
    headers) whose inclusion both drowns the signal and makes candidate
    generation quadratic in the hottest gram. Within the capped measure
    ``measure="containment"`` switches the final value (and output
    column) to ``inter / min(|A|, |B|)`` — the asymmetric quote/subset
    detector (a small doc fully quoted inside a big one scores 1.0 where
    Jaccard stays low); the result is EXACT and complete — any pair with jaccard > 0 shares at
    least one retained gram (df ≥ 2), so it is always generated as a
    candidate; nothing is sampled or truncated.

    Shape (all exchanges carry 16-24 B key/hash rows, never documents):

    1. one ``map_batches`` pass explodes each doc to distinct 64-bit gram
       hashes (`ngrams_batch` + `_hash64`, the decontamination kernels);
    2. a ``groupby(gh % num_buckets)`` pass computes each gram's exact
       document frequency IN-BUCKET (the bucket key is the gram hash, so a
       gram never splits), drops grams past ``df_cap``, and emits
       - per-doc partial SET SIZES (one row per doc per bucket), and
       - per-pair intersection contributions (vectorized triu over each
         df ≥ 2 gram's members, pre-summed per pair within the bucket);
    3. sizes reduce by doc-hash bucket; intersections reduce by pair-hash
       bucket (`_add_pair_bucket` discipline from stages/dedup);
    4. sizes attach to pairs via broadcast below ``size_broadcast_limit``
       docs, else two hash-bucketed joins — then one exact division
       ``inter / (sz_a + sz_b - inter)`` (IEEE-identical to the SQL
       oracle's) and the threshold filter.

    Matching is on the 64-bit gram hash (collision odds ~grams/2^64 — the
    same budget as dedup_exact / ngram_decontaminate).
    """
    import ray.data

    from .dedup import _add_pair_bucket

    schema = docs.schema()
    raw = dict(zip(schema.names, schema.types))[id_col]
    id_type = raw if isinstance(raw, pa.DataType) else pa.string()

    def doc_grams(b: pa.Table) -> pa.Table:
        parent, ng = ngrams_batch(b.column(column), n)
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if parent.size == 0:
            return pa.table({id_col: pa.array([], type=id_type),
                             "gh": pa.array([], type=pa.uint64()),
                             "__gb": pa.array([], type=pa.int32())})
        h = _hash64(ng)
        # distinct (doc, gram) within the batch ≡ globally distinct: a doc
        # lives in exactly one batch row
        u = np.unique(np.stack([parent.astype(np.uint64), h], axis=1),
                      axis=0)
        up, uh = u[:, 0].astype(np.int64), u[:, 1]
        return pa.table({
            id_col: ids.take(pa.array(up, type=pa.int64())),
            "gh": pa.array(uh, type=pa.uint64()),
            "__gb": pa.array((uh % num_buckets).astype(np.int32)),
        })

    grams = docs.select_columns([id_col, column]).map_batches(
        doc_grams, batch_format="pyarrow", batch_size=batch_size)

    def bucket_pass(g: pd.DataFrame) -> pd.DataFrame:
        # exact df per gram (bucket key = gram hash → a gram never splits).
        # key_a/key_b keep the id dtype in EVERY output row (kind-0 size
        # rows carry key_b = key_a, ignored downstream) — None padding
        # would flip blocks between null/object/float schemas and
        # hash_pandas_object hashes int64 vs float64 differently, splitting
        # one pair's contributions across __pb buckets.
        df = g.groupby("gh", sort=False)["gh"].transform("size")
        kept = g[df.to_numpy() <= df_cap]
        if not len(kept):
            return pd.DataFrame({
                "key_a": pd.Series([], dtype=g[id_col].dtype),
                "key_b": pd.Series([], dtype=g[id_col].dtype),
                "cnt": pd.Series([], dtype=np.int64),
                "kind": pd.Series([], dtype=np.int8)})
        sz = kept.groupby(id_col, sort=False).size().reset_index(name="cnt")
        sizes_part = pd.DataFrame({
            "key_a": sz[id_col], "key_b": sz[id_col],
            "cnt": sz["cnt"].astype(np.int64), "kind": np.int8(0)})
        # vectorized triu over every df>=2 gram: sort by (gh, id); the
        # element at local position j within its gram group emits j pairs
        # (key_a = each earlier member, key_b = itself) — ascending ids,
        # so key_a < key_b matches the SQL oracle's a.id < b.id
        ks = kept.sort_values(["gh", id_col], kind="mergesort")
        ghv = ks["gh"].to_numpy()
        ids = ks[id_col].to_numpy()
        gstart = np.flatnonzero(np.r_[True, ghv[1:] != ghv[:-1]])
        starts = np.repeat(gstart, np.diff(np.r_[gstart, ghv.size]))
        local = np.arange(ghv.size, dtype=np.int64) - starts
        total = int(local.sum())
        if total == 0:
            return sizes_part
        key_b = np.repeat(ids, local)
        cum = np.concatenate(([0], np.cumsum(local)))
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], local)
        key_a = ids[np.repeat(starts, local) + intra]
        # pre-sum pair contributions within the bucket before the exchange
        pairs = pd.DataFrame({"key_a": key_a, "key_b": key_b}) \
            .groupby(["key_a", "key_b"], sort=False, as_index=False).size() \
            .rename(columns={"size": "cnt"})
        pairs["cnt"] = pairs["cnt"].astype(np.int64)
        pairs["kind"] = np.int8(1)
        return pd.concat([sizes_part, pairs], ignore_index=True)

    parts = grams.groupby("__gb").map_groups(
        bucket_pass, batch_format="pandas").materialize()

    def add_doc_bucket(b: pa.Table) -> pa.Table:
        hb = (pd.util.hash_pandas_object(
            b.column("key_a").to_pandas(), index=False).to_numpy()
            .astype(np.uint64) % pair_buckets).astype(np.int32)
        return no_meta(b).append_column("__db", pa.array(hb))

    def sum_sizes(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key_a", sort=False, as_index=False)["cnt"].sum()
        return out.rename(columns={"key_a": id_col, "cnt": "sz"})

    sizes = parts.filter(expr="kind == 0") \
        .map_batches(add_doc_bucket, batch_format="pyarrow") \
        .groupby("__db").map_groups(sum_sizes, batch_format="pandas")

    def sum_inter(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["key_a", "key_b"], sort=False,
                         as_index=False)["cnt"].sum() \
            .rename(columns={"cnt": "inter"})

    cand = parts.filter(expr="kind == 1")
    # empty candidate sets would lose the output schema through Ray's
    # empty-block drop; parts is materialized, so this count is one cheap
    # pass over candidate-sized (never corpus-sized) rows
    if cand.count() == 0:
        return ray.data.from_arrow(_jaccard_empty(id_type, measure))
    inter = cand \
        .map_batches(_add_pair_bucket(pair_buckets),
                     batch_format="pyarrow") \
        .groupby("__pb").map_groups(sum_inter, batch_format="pandas")

    n_docs = docs.count()
    if n_docs <= size_broadcast_limit:
        sz_df = sizes.to_pandas()
        if "sz" not in sz_df.columns or not len(sz_df):
            return ray.data.from_arrow(_jaccard_empty(id_type, measure))
        lut = dict(zip(sz_df[id_col], sz_df["sz"]))
        ref = ray.put(lut) if len(lut) > 100_000 else lut
        return inter.map_batches(
            _JaccardSizeAttacher,
            fn_constructor_args=(ref, threshold, id_type, measure),
            batch_format="pyarrow", concurrency=(1, 2))

    # join path: sizes attach via two hash-bucketed joins (pair side is
    # candidate-sized; the sizes side crosses the exchange once per join)
    from .joins import bucketed_join

    def ren(col_from: str, col_to: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [col_to if c == col_from else c for c in b.column_names])
        return f

    sa = bucketed_join(inter, sizes.map_batches(
        ren(id_col, "key_a"), batch_format="pyarrow"), on="key_a",
        num_buckets=pair_buckets)
    sa = sa.map_batches(ren("sz", "sz_a"), batch_format="pyarrow")
    sb = bucketed_join(sa, sizes.map_batches(
        ren(id_col, "key_b"), batch_format="pyarrow"), on="key_b",
        num_buckets=pair_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _jaccard_empty(id_type, measure)
        it = b.column("inter").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s_a = b.column("sz_a").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s_b = b.column("sz").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        jac = it / np.minimum(s_a, s_b) if measure == "containment" \
            else it / (s_a + s_b - it)
        keep = jac >= threshold
        return pa.table({
            "key_a": pc.cast(b.column("key_a").filter(pa.array(keep)),
                             id_type),
            "key_b": pc.cast(b.column("key_b").filter(pa.array(keep)),
                             id_type),
            measure: pa.array(jac[keep], type=pa.float64()),
        })

    return sb.map_batches(finalize, batch_format="pyarrow")


# ---- duplicate-passage removal (ExactSubstr-style, n-gram granularity) ----


def hot_ngram_hashes(docs, column: str, id_col: str, n: int, *,
                     min_docs: int = 2, num_buckets: int = 64,
                     batch_size: int = 4096,
                     broadcast_limit: int = 10_000_000,
                     driver_limit: int = 2_000_000) -> np.ndarray:
    """64-bit hashes of every token n-gram appearing in ≥ ``min_docs``
    DISTINCT documents, gathered driver-side (the hot set is what gets
    broadcast — boilerplate is rare relative to the corpus; raises past
    ``broadcast_limit``). Distributed shape: per-batch distinct (gram, doc)
    pairs → hash-bucketed doc-count reduce → filter. Only 16 B/distinct
    gram-doc pair crosses the exchange."""

    def per_batch(b: pa.Table) -> pa.Table:
        parent, ng = ngrams_batch(b.column(column), n)
        if parent.size == 0:
            return pa.table({"gh": pa.array([], type=pa.uint64()),
                             "__gb": pa.array([], type=pa.int32())})
        h = _hash64(ng)
        ih = pd.util.hash_pandas_object(
            b.column(id_col).to_pandas(), index=False).to_numpy() \
            .astype(np.uint64)[parent]
        pairs = np.unique(np.stack([h, ih], axis=1), axis=0)
        gh = pairs[:, 0]
        return pa.table({"gh": pa.array(gh, type=pa.uint64()),
                         "__gb": pa.array((gh % num_buckets)
                                          .astype(np.int32))})

    pairs = docs.select_columns([id_col, column]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=batch_size)

    def hot_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["gh"].value_counts()
        return pd.DataFrame({"gh": vc[vc >= min_docs].index.to_numpy()
                             .astype(np.uint64)})

    # auto-switch (components/minhash-verify discipline): the per-batch
    # partials are distinct (gram, doc) HASH pairs — when they fit the
    # driver comfortably, one gather + C-path value_counts beats a full
    # hash-bucket exchange (measured ~2-3 s of fixed shuffle cost saved at
    # small corpus sizes); past the limit, the distributed reduce runs.
    pairs = pairs.materialize()
    if pairs.count() <= driver_limit:
        # a doc is one row, so all its grams land in one batch and the
        # per-batch np.unique leaves (gram, doc) pairs globally distinct —
        # counting gh occurrences here counts distinct docs, exactly like
        # the bucketed value_counts below.
        chunks = [b.column("gh").to_numpy(zero_copy_only=False)
                  for b in pairs.iter_batches(batch_format="pyarrow",
                                              batch_size=None)]
        gh = (np.concatenate(chunks) if chunks
              else np.empty(0, np.uint64))
        u, c = np.unique(gh, return_counts=True)
        hot = u[c >= min_docs]
    else:
        rows = pairs.groupby("__gb").map_groups(
            hot_in_bucket, batch_format="pandas").take_all()
        hot = np.array([r["gh"] for r in rows], dtype=np.uint64)
    if hot.size > broadcast_limit:
        raise ValueError(f"{hot.size} hot n-grams exceeds broadcast_limit="
                         f"{broadcast_limit}; raise min_docs or n")
    return np.sort(hot)


class _SpanMasker:
    """Actor stage over the hot-gram broadcast. ``mode='flag'`` → one row
    per doc with ≥1 hot position (``dup_positions``); ``mode='clean'`` →
    every doc with hot token SPANS removed (positions p..p+n-1 of each hot
    gram, unioned) plus ``n_tokens_removed``. Fully vectorized: coverage is
    a difference array + cumsum over the batch's flat token values, the
    cleaned text one ListArray rebuild + ``pc.binary_join``. Cleaning
    re-joins kept tokens with single spaces (runs of whitespace do not
    survive — tokenization granularity is the contract)."""

    def __init__(self, column: str, id_col: str, n: int, hot_ref,
                 mode: str):
        self.column, self.id_col, self.n, self.mode = column, id_col, n, mode
        hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) \
            else hot_ref
        self.hot = np.asarray(hot, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        parent, p, toks, off = _gram_positions(batch.column(self.column), n)
        base, total = off[0], int(off[-1] - off[0])
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if parent.size == 0 or not self.hot.size:
            hit = np.zeros(parent.size, dtype=bool)
        else:
            h = _hash64(_join_grams(toks, p, n))
            idx = np.searchsorted(self.hot, h).clip(max=self.hot.size - 1)
            hit = self.hot[idx] == h

        dup_positions = np.bincount(parent[hit], minlength=batch.num_rows)
        if self.mode == "flag":
            keep = dup_positions > 0
            return pa.table({
                self.id_col: ids.take(pa.array(np.flatnonzero(keep))),
                "dup_positions": pa.array(dup_positions[keep],
                                          type=pa.int64())})

        cover = np.zeros(total + 1, dtype=np.int64)
        ph = p[hit] - base
        np.add.at(cover, ph, 1)
        np.add.at(cover, ph + n, -1)
        covered = np.cumsum(cover)[:total] > 0
        csum = np.concatenate(([0], np.cumsum(covered)))
        removed = csum[off[1:] - base] - csum[off[:-1] - base]
        kept_abs = np.flatnonzero(~covered) + base
        kept_vals = toks.values.take(pa.array(kept_abs, type=pa.int64()))
        new_off = np.concatenate(
            ([0], np.cumsum((off[1:] - off[:-1]) - removed)))
        lst = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()), kept_vals)
        return pa.table({
            self.id_col: ids,
            "clean_text": pc.binary_join(lst, " "),
            "n_tokens_removed": pa.array(removed, type=pa.int64())})


def flag_duplicate_spans(docs, *, column: str, id_col: str, n: int = 13,
                         min_docs: int = 2, num_buckets: int = 64,
                         batch_size: int = 4096, concurrency: int = 4,
                         broadcast_limit: int = 10_000_000):
    """→ Dataset ``(id_col, dup_positions)``: docs containing ≥1 token
    n-gram shared by ≥ ``min_docs`` distinct docs, with the count of such
    gram positions."""
    hot = hot_ngram_hashes(docs, column, id_col, n, min_docs=min_docs,
                           num_buckets=num_buckets, batch_size=batch_size,
                           broadcast_limit=broadcast_limit)
    ref = ray.put(hot) if hot.size > 100_000 else hot
    return docs.select_columns([id_col, column]).map_batches(
        _SpanMasker, fn_constructor_args=(column, id_col, n, ref, "flag"),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def remove_duplicate_spans(docs, *, column: str, id_col: str, n: int = 13,
                           min_docs: int = 2, num_buckets: int = 64,
                           batch_size: int = 4096, concurrency: int = 4,
                           broadcast_limit: int = 10_000_000):
    """→ Dataset ``(id_col, clean_text, n_tokens_removed)``: every doc with
    duplicated passages (token spans covered by any hot n-gram) removed —
    the n-gram-granular form of exact-substring dedup (Lee et al. 2021)."""
    hot = hot_ngram_hashes(docs, column, id_col, n, min_docs=min_docs,
                           num_buckets=num_buckets, batch_size=batch_size,
                           broadcast_limit=broadcast_limit)
    ref = ray.put(hot) if hot.size > 100_000 else hot
    return docs.select_columns([id_col, column]).map_batches(
        _SpanMasker, fn_constructor_args=(column, id_col, n, ref, "clean"),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


# ---- tf-weighted exact cosine pairs -----------------------------------------


def _cosine_empty(id_type: pa.DataType) -> pa.Table:
    return pa.table({"key_a": pa.array([], type=id_type),
                     "key_b": pa.array([], type=id_type),
                     "dot": pa.array([], type=pa.int64()),
                     "norm2_a": pa.array([], type=pa.int64()),
                     "norm2_b": pa.array([], type=pa.int64()),
                     "cos": pa.array([], type=pa.float64())})


class _CosineNormAttacher:
    """Actor stage: attach the broadcast doc -> squared-norm lookup to the
    folded pair dots, apply the FULLY INTEGER threshold predicate
    ``dot^2 * den^2 >= num^2 * norm2_a * norm2_b`` (tf vectors are
    nonnegative so dot >= 0 and squaring preserves the order — no float
    ever decides the boundary), then emit the cosine as ONE division by
    ONE sqrt of an exactly-representable integer product — bit-identical
    to the SQL oracle's spelling."""

    def __init__(self, lut_ref, t_num: int, t_den: int,
                 id_type: pa.DataType):
        self.lut = ray.get(lut_ref) \
            if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        self.t_num, self.t_den = t_num, t_den
        self.id_type = id_type

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _cosine_empty(self.id_type)
        ka = b.column("key_a").to_numpy(zero_copy_only=False)
        kb = b.column("key_b").to_numpy(zero_copy_only=False)
        dot = b.column("dot").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        na = np.array([self.lut[k] for k in ka], dtype=np.int64)
        nb = np.array([self.lut[k] for k in kb], dtype=np.int64)
        # integer-overflow guards for the predicate and the exact float
        # cast (see tf_cosine_pairs docstring) — loud, not silent
        prod = na.astype(object) * nb.astype(object)
        assert all(p < (1 << 53) for p in prod) and \
            int(dot.max(initial=0)) ** 2 * self.t_den ** 2 < (1 << 63), \
            "tf_cosine_pairs: norms exceed the exact-arithmetic bound; " \
            "shard long documents or rescale tf"
        keep = (dot * dot * (self.t_den * self.t_den)
                >= (self.t_num * self.t_num) * na * nb)
        cos = dot[keep].astype(np.float64) / np.sqrt(
            (na[keep] * nb[keep]).astype(np.float64))
        m = pa.array(keep)
        return pa.table({
            "key_a": pc.cast(b.column("key_a").filter(m), self.id_type),
            "key_b": pc.cast(b.column("key_b").filter(m), self.id_type),
            "dot": pa.array(dot[keep]),
            "norm2_a": pa.array(na[keep]),
            "norm2_b": pa.array(nb[keep]),
            "cos": pa.array(cos, type=pa.float64()),
        })


def tf_cosine_pairs(docs, *, column: str, id_col: str, n: int = 1,
                    threshold_num: int = 3, threshold_den: int = 5,
                    df_cap: int = 64, num_buckets: int = 64,
                    pair_buckets: int = 16, batch_size: int = 4096,
                    size_broadcast_limit: int = 2_000_000):
    """-> Dataset ``(key_a, key_b, dot, norm2_a, norm2_b, cos)`` of document
    pairs whose EXACT tf-weighted cosine similarity is >= num/den — the
    WEIGHTED sibling of :func:`jaccard_near_duplicates` (bag-of-terms
    cosine instead of distinct-set Jaccard; the classic sparse
    all-pairs-similarity join of Bayardo et al., WWW'07, restricted to
    terms with document frequency <= ``df_cap``). Terms are token
    ``n``-grams with their occurrence counts (tf); n = 1 is plain
    bag-of-words, n = 2 sharpens near-dup contrast (common unigrams
    exceed any useful df cap, shared bigrams rarely do).

    Measure semantics: the DOT runs over df-capped terms only (a term
    shared by more than ``df_cap`` documents carries no similarity signal
    and would fan out O(df^2) pairs); the NORMS run over the FULL tf
    vector. Both engines apply the identical definition, so the oracle is
    exact. The threshold is the rational num/den and the predicate is
    evaluated in pure integers (``dot^2 den^2 >= num^2 n_a n_b``); the
    reported ``cos`` float is one division by one sqrt of an exact < 2^53
    integer — correctly rounded identically in numpy and SQL.

    Shape (the discipline of jaccard_near_duplicates — exchanges carry
    hashes/ids/counts, never text):
    1. one pass: per-batch tf per (doc, token-hash) + per-doc squared norm
       (a doc lives in one batch row, so both are globally exact);
    2. token-hash-bucket exchange: exact df in-bucket, df-cap drop, then a
       vectorized triu over each surviving token's members emits pair
       partial products tf_a*tf_b pre-summed per pair;
    3. pair-hash-bucket fold of the dots; norms attach via broadcast below
       ``size_broadcast_limit`` docs, else two hash-bucketed joins.

    Token identity is the 64-bit SipHash of the whitespace token (the
    jaccard/dedup collision budget: ~tokens/2^64). Null text tokenizes as
    one empty token (oracle mirrors with ``coalesce(text, '')``)."""
    import ray.data

    from .dedup import _add_pair_bucket

    schema = docs.schema()
    raw = dict(zip(schema.names, schema.types))[id_col]
    id_type = raw if isinstance(raw, pa.DataType) else pa.string()

    def tf_norm_partial(b: pa.Table) -> pa.Table:
        parent, toks = ngrams_batch(b.column(column), n)
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        empty = pa.table({"key": pa.array([], type=id_type),
                          "th": pa.array([], type=pa.uint64()),
                          "v": pa.array([], type=pa.int64()),
                          "kind": pa.array([], type=pa.int8()),
                          "__gb": pa.array([], type=pa.int32())})
        if parent.size == 0:
            return empty
        th = _hash64(toks)
        tf = pd.DataFrame({"p": parent.astype(np.int64), "th": th}) \
            .groupby(["p", "th"], sort=False).size().reset_index(name="tf")
        tfv = tf["tf"].to_numpy().astype(np.int64)
        nrm = pd.DataFrame({"p": tf["p"], "v": tfv * tfv}) \
            .groupby("p", sort=False)["v"].sum()
        keys_tf = ids.take(pa.array(tf["p"].to_numpy(), type=pa.int64()))
        keys_n = ids.take(pa.array(nrm.index.to_numpy(), type=pa.int64()))
        thv = tf["th"].to_numpy().astype(np.uint64)
        nb = (pd.util.hash_pandas_object(
            keys_n.to_pandas(), index=False).to_numpy().astype(np.uint64)
            % num_buckets).astype(np.int32)
        return pa.table({
            "key": pa.concat_arrays([keys_tf.combine_chunks()
                                     if isinstance(keys_tf, pa.ChunkedArray)
                                     else keys_tf,
                                     keys_n.combine_chunks()
                                     if isinstance(keys_n, pa.ChunkedArray)
                                     else keys_n]),
            "th": pa.array(np.concatenate(
                [thv, np.zeros(len(nrm), np.uint64)]), type=pa.uint64()),
            "v": pa.array(np.concatenate(
                [tfv, nrm.to_numpy().astype(np.int64)])),
            "kind": pa.array(np.concatenate(
                [np.full(len(tfv), 1, np.int8),
                 np.zeros(len(nrm), np.int8)])),
            "__gb": pa.array(np.concatenate(
                [(thv % num_buckets).astype(np.int32), nb])),
        })

    parts0 = docs.select_columns([id_col, column]).map_batches(
        tf_norm_partial, batch_format="pyarrow", batch_size=batch_size)

    def bucket_pass(g: pd.DataFrame) -> pd.DataFrame:
        norms = g[g["kind"].to_numpy() == 0]
        norm_rows = pd.DataFrame({
            "key_a": norms["key"], "key_b": norms["key"],
            "cnt": norms["v"].astype(np.int64), "kind": np.int8(0)})
        tf = g[g["kind"].to_numpy() == 1]
        if not len(tf):
            return norm_rows
        df = tf.groupby("th", sort=False)["th"].transform("size")
        kept = tf[(df.to_numpy() >= 2) & (df.to_numpy() <= df_cap)]
        if not len(kept):
            return norm_rows
        ks = kept.sort_values(["th", "key"], kind="mergesort")
        thv = ks["th"].to_numpy()
        ids = ks["key"].to_numpy()
        tfv = ks["v"].to_numpy().astype(np.int64)
        gstart = np.flatnonzero(np.r_[True, thv[1:] != thv[:-1]])
        starts = np.repeat(gstart, np.diff(np.r_[gstart, thv.size]))
        local = np.arange(thv.size, dtype=np.int64) - starts
        total = int(local.sum())
        if total == 0:
            return norm_rows
        key_b = np.repeat(ids, local)
        tf_b = np.repeat(tfv, local)
        cum = np.concatenate(([0], np.cumsum(local)))
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], local)
        pick = np.repeat(starts, local) + intra
        key_a = ids[pick]
        contrib = tfv[pick] * tf_b
        pairs = pd.DataFrame({"key_a": key_a, "key_b": key_b,
                              "cnt": contrib}) \
            .groupby(["key_a", "key_b"], sort=False, as_index=False)["cnt"] \
            .sum()
        pairs["cnt"] = pairs["cnt"].astype(np.int64)
        pairs["kind"] = np.int8(1)
        return pd.concat([norm_rows, pairs], ignore_index=True)

    parts = parts0.groupby("__gb").map_groups(
        bucket_pass, batch_format="pandas").materialize()

    def sum_dot(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["key_a", "key_b"], sort=False,
                         as_index=False)["cnt"].sum() \
            .rename(columns={"cnt": "dot"})

    cand = parts.filter(expr="kind == 1")
    if cand.count() == 0:
        return ray.data.from_arrow(_cosine_empty(id_type))
    dots = cand.map_batches(_add_pair_bucket(pair_buckets),
                            batch_format="pyarrow") \
        .groupby("__pb").map_groups(sum_dot, batch_format="pandas")

    n_docs = docs.count()
    if n_docs > size_broadcast_limit:
        raise ValueError(
            f"tf_cosine_pairs norm lookup would broadcast {n_docs} rows > "
            f"size_broadcast_limit={size_broadcast_limit}; attach norms "
            f"via two bucketed joins (jaccard_near_duplicates' join path) "
            f"before raising the limit")
    nz = parts.filter(expr="kind == 0").to_pandas()
    lut = dict(zip(nz["key_a"], nz["cnt"])) if len(nz) else {}
    ref = ray.put(lut) if len(lut) > 100_000 else lut
    return dots.map_batches(
        _CosineNormAttacher,
        fn_constructor_args=(ref, threshold_num, threshold_den, id_type),
        batch_format="pyarrow", concurrency=(1, 2))


def shared_item_pairs(items, *, id_col: str = "doc_id",
                      item_col: str = "fp", df_cap: int = 64,
                      min_shared: int = 2, num_buckets: int = 64,
                      pair_buckets: int = 16,
                      driver_pair_fold: bool = False):
    """→ Dataset ``(key_a, key_b, shared)``: id pairs sharing ≥
    ``min_shared`` distinct items, over a ``(id, item)`` Dataset that is
    already DISTINCT per id (e.g. winnowing fingerprints, shingle hashes).
    Items held by more than ``df_cap`` ids are dropped — the boilerplate
    guard that keeps candidate generation from going quadratic in the
    hottest item (same measure-definition stance as
    ``jaccard_near_duplicates``); df-1 items pair nothing and vanish
    naturally.

    Shape (exchanges carry ≤24 B id/hash rows, never documents):
    ONE ``groupby(item % num_buckets)`` pass computes each item's EXACT
    document frequency in-bucket (the bucket key is the item, so an item
    never splits), drops items past ``df_cap``, and emits vectorized-triu
    pair contributions pre-summed per bucket; ONE pair-hash exchange sums
    contributions (a pair's rows all land in one bucket via
    ``hash(a)^hash(b)``) and applies the ``min_shared`` threshold
    in-bucket, so only final pairs leave the exchange."""
    from .dedup import _add_pair_bucket

    schema = items.schema()
    id_type = dict(zip(schema.names, schema.types))[id_col]

    def add_item_bucket(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            b.column(item_col).to_pandas(), index=False).to_numpy()
        ib = (h.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return no_meta(b).append_column("__ib", pa.array(ib))

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"key_a": pa.array([], id_type),
                          "key_b": pa.array([], id_type),
                          "cnt": pa.array([], pa.int64())})
        df = g.groupby(item_col, sort=False)[item_col].transform("size")
        dfv = df.to_numpy()
        kept = g[(dfv >= 2) & (dfv <= df_cap)]
        if not len(kept):
            return empty
        # vectorized triu per item (jaccard_near_duplicates discipline):
        # sorted by (item, id), position j in its item group emits j pairs
        # with ascending key_a < key_b
        ks = kept.sort_values([item_col, id_col], kind="mergesort")
        itv = ks[item_col].to_numpy()
        ids = ks[id_col].to_numpy()
        gstart = np.flatnonzero(np.r_[True, itv[1:] != itv[:-1]])
        starts = np.repeat(gstart, np.diff(np.r_[gstart, itv.size]))
        local = np.arange(itv.size, dtype=np.int64) - starts
        total = int(local.sum())
        if total == 0:
            return empty
        key_b = np.repeat(ids, local)
        cum = np.concatenate(([0], np.cumsum(local)))
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], local)
        key_a = ids[np.repeat(starts, local) + intra]
        pairs = pd.DataFrame({"key_a": key_a, "key_b": key_b}) \
            .groupby(["key_a", "key_b"], sort=False, as_index=False).size() \
            .rename(columns={"size": "cnt"})
        return pa.table({"key_a": pa.array(pairs["key_a"].to_numpy(),
                                           id_type),
                         "key_b": pa.array(pairs["key_b"].to_numpy(),
                                           id_type),
                         "cnt": pa.array(pairs["cnt"].to_numpy()
                                         .astype(np.int64))})

    def sum_and_threshold(g: pd.DataFrame) -> pa.Table:
        out = g.groupby(["key_a", "key_b"], sort=False,
                        as_index=False)["cnt"].sum()
        out = out[out["cnt"] >= min_shared]
        return pa.table({"key_a": pa.array(out["key_a"].to_numpy(),
                                           id_type),
                         "key_b": pa.array(out["key_b"].to_numpy(),
                                           id_type),
                         "shared": pa.array(out["cnt"].to_numpy()
                                            .astype(np.int64))})

    contrib = items.map_batches(add_item_bucket, batch_format="pyarrow") \
        .groupby("__ib").map_groups(bucket_pairs, batch_format="pandas")
    if driver_pair_fold:
        # pre-summed per item-bucket contributions are candidate-pair
        # bounded; below the caller's block gate the final sum+threshold
        # folds driver-side, skipping the second exchange's ~2 s sort
        # floor (measured 5.6 s → ~3.4 s on winnow_dup_pairs at sf0.1).
        # Past the gate callers keep the pair-hash exchange: contributions
        # there are unbounded and a pair's rows must co-locate.
        parts = contrib.to_pandas()
        if not len(parts):
            return pd.DataFrame({"key_a": pd.Series([], dtype=object),
                                 "key_b": pd.Series([], dtype=object),
                                 "shared": pd.Series([], dtype=np.int64)})
        out = parts.groupby(["key_a", "key_b"], sort=False,
                            as_index=False)["cnt"].sum()
        out = out[out["cnt"] >= min_shared].reset_index(drop=True)
        out["shared"] = out["cnt"].astype(np.int64)
        return out[["key_a", "key_b", "shared"]]
    return (contrib
            .map_batches(_add_pair_bucket(pair_buckets),
                         batch_format="pyarrow")
            .groupby("__pb").map_groups(sum_and_threshold,
                                        batch_format="pandas"))
