"""Feature-engineering stages for training-data pipelines: global-statistic
feature scaling and the corpus k-NN graph over the embedding column.

Both follow the broadcast-small / stream-large rule: the tiny derived state
(per-group min/max, the normalized corpus matrix at bench scale) is computed
once and broadcast; the big side streams through ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..sources.parquet import read_dim_table, read_parquet
from ..stages.similarity import _emb_matrix

# ---- integer-exact min-max normalization ------------------------------------


def minmax_normalize_documents(sf_dir: str):
    """(doc_id, lang, n_chars, norm_ppm) — per-language min-max feature
    scaling of the length column, emitted as EXACT parts-per-million:
    ``(x − min) · 1e6 // (max − min)`` in pure int64 (floor division of
    non-negative ints — CLAUDE.md's float rule), so the oracle comparison
    has no rounding mode to disagree on. Constant groups normalize to 0.

    Shape: pass 1 folds per-batch per-group (min, max) partials driver-side
    (groups × 2 ints — KBs at any corpus size); the fold broadcasts into a
    second streaming pass. The same two-pass pattern serves z-score or
    quantile scaling with the matching exact encodings."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])

    def mm_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b.column("lang"),
                      "x": pc.cast(b.column("n_chars"), pa.int64())})
        g = t.group_by("lang").aggregate([("x", "min"), ("x", "max")])
        return pa.table({"lang": g.column("lang"),
                         "mn": g.column("x_min"), "mx": g.column("x_max")})

    part = docs.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    if "lang" not in part.columns or not len(part):
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "lang": pd.Series([], dtype=object),
                             "n_chars": pd.Series([], dtype=np.int64),
                             "norm_ppm": pd.Series([], dtype=np.int64)})
    folded = part.groupby("lang").agg(mn=("mn", "min"), mx=("mx", "max"))
    langs = pa.array(folded.index.to_numpy())
    mns = folded["mn"].to_numpy().astype(np.int64)
    mxs = folded["mx"].to_numpy().astype(np.int64)

    def scale(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b.column("lang"), value_set=langs) \
            .to_numpy(zero_copy_only=False)
        x = pc.cast(b.column("n_chars"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mn, mx = mns[idx], mxs[idx]
        rng = mx - mn
        ppm = np.where(rng > 0,
                       (x - mn) * 1_000_000 // np.where(rng > 0, rng, 1), 0)
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "n_chars": pa.array(x),
                         "norm_ppm": pa.array(ppm.astype(np.int64))})

    return docs.map_batches(scale, batch_format="pyarrow")


MINMAX_NORMALIZE_SQL = """
WITH s AS (SELECT lang, min(n_chars) AS mn, max(n_chars) AS mx
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN s.mx = s.mn THEN 0
            ELSE ((d.n_chars - s.mn) * 1000000) // (s.mx - s.mn)
            END AS BIGINT) AS norm_ppm
FROM documents d JOIN s USING (lang)
"""


# ---- corpus k-NN graph -------------------------------------------------------


_Q_SCALE = 100_000


def knn_graph_embeddings(sf_dir: str, k: int = 5,
                         broadcast_limit_rows: int = 4_000_000):
    """(vec_id, neighbor_id, rank, dot) — the k-nearest-neighbor GRAPH of
    the embedding corpus under maximum-inner-product search (each vector's
    top-k neighbors, excluding itself; ties broken by neighbor id). The
    corpus×corpus sibling of the query-top-k operator: the quantized
    matrix broadcasts once (`ray.put`), and each streaming batch does one
    int64 matmul against it plus a vectorized argpartition top-k.

    The similarity is EXACT in both engines (CLAUDE.md float rule): each
    component quantizes as ``floor(float64(x) · 1e5)`` — float32 inputs
    are exact binary values, the ×1e5 product is correctly rounded
    identically in numpy and DuckDB, and floor has no tie mode — and the
    dot of quantized vectors stays far under 2^53 (|x| < 1 ⇒ products
    < 1e10, d = 64 ⇒ sums < 1e12), so even a double-accumulating engine
    (DuckDB's list_dot_product) produces the exact integer. Cosine-ranked
    variants of the same graph: stages/similarity.topk_cosine per query,
    stages/semdedup within clusters.

    Scale path: the broadcast side holds the WHOLE corpus, so past
    ``broadcast_limit_rows`` (~2 GB at d=64) this brute-force layout stops
    fitting and the graph should be built per IVF cell (stages/ivf:
    neighbors probed within nprobe cells — approximate, as any
    billion-scale k-NN graph is); the limit raises loudly rather than
    silently thrashing the object store."""
    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    n = emb.count()
    if n > broadcast_limit_rows:
        raise ValueError(
            f"knn_graph_embeddings broadcast path holds the whole corpus "
            f"({n} rows > {broadcast_limit_rows}); build per-IVF-cell "
            f"graphs instead (stages/ivf)")
    whole = pa.concat_tables(ray.get(emb.to_arrow_refs())).combine_chunks()
    ids = whole.column("vec_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    mat = np.floor(_emb_matrix(whole, "embedding").astype(np.float64)
                   * _Q_SCALE).astype(np.int64)
    # broadcast columns sorted by id: a STABLE descending-dot argsort then
    # breaks dot ties by ascending neighbor id exactly (argpartition alone
    # picks an arbitrary subset of boundary ties — diverges from the SQL
    # row_number order whenever duplicates tie at rank k)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    class Knn:
        def __init__(self, r, kk):
            self.ids, self.mat = ray.get(r) \
                if isinstance(r, ray.ObjectRef) else r
            self.k = kk

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "rank": pa.array([], pa.int64()),
                                 "dot": pa.array([], pa.int64())})
            q = np.floor(_emb_matrix(b, "embedding").astype(np.float64)
                         * _Q_SCALE).astype(np.int64)
            qid = b.column("vec_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sims = q @ self.mat.T                        # (nb, N) int64 exact
            self_mask = qid[:, None] == self.ids[None, :]
            # sentinel below any real dot that still negates safely
            # (-INT64_MIN overflows back to itself and would win -sims
            # argpartition); real dots are < 2^40 at d=64, |x|<1, scale 1e5
            sims[self_mask] = -(np.int64(1) << 62)       # no self-edge
            kk = min(self.k, sims.shape[1] - 1)
            # stable argsort over id-ascending columns = exact
            # (dot desc, neighbor id asc) order INCLUDING boundary ties
            top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(len(qid)), kk)
            s = sims[rows, top.ravel()]
            nid = self.ids[top.ravel()]
            return pa.table({
                "vec_id": pa.array(qid[rows]),
                "neighbor_id": pa.array(nid),
                "rank": pa.array(np.tile(np.arange(1, kk + 1), len(qid))
                                 .astype(np.int64)),
                "dot": pa.array(s),
            })

    return emb.map_batches(Knn, fn_constructor_args=(ref, k),
                           concurrency=(1, 2), batch_size=1024,
                           batch_format="pyarrow")


KNN_GRAPH_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS qv
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_dot_product(a.qv, b.qv) DESC, b.vec_id) AS rn
  FROM q a JOIN q b ON a.vec_id <> b.vec_id)
SELECT vec_id, neighbor_id, CAST(rn AS BIGINT) AS rank, dot
FROM pairs WHERE rn <= 5
"""


# ---- target (mean) encoding --------------------------------------------------


def target_encode_customers(sf_dir: str):
    """(c_custkey, c_mktsegment, enc_microcents) — target encoding: each
    customer carries its segment's mean order value, the categorical →
    numeric feature encoder of tabular ML. The grouped statistic comes
    from ONE fact pass (segment looked up per order via the broadcast
    customer dimension, per-batch (segment, sum_cents, n) partials, driver
    fold of a handful of groups — all Python ints, so no int64 overflow at
    any scale) and broadcasts back onto the entity rows as exact
    micro-cents: ``(sum_cents · 1e6) // n`` — floor division of exact
    integers, identical in both engines (DuckDB folds through HUGEINT)."""
    import ray

    dim = read_dim_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    ref = ray.put((dim.column("c_custkey").combine_chunks(),
                   dim.column("c_mktsegment").combine_chunks()))

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_totalprice"])

    class SegPartial:
        def __init__(self, r):
            self.keys, self.segs = ray.get(r) \
                if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b.column("o_custkey"), value_set=self.keys)
            seg = self.segs.take(idx)
            cents = pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"), 100)), pa.int64())
            t = pa.table({"seg": seg, "cents": cents}).filter(
                pc.is_valid(seg))
            g = t.group_by("seg").aggregate(
                [("cents", "sum"), ("cents", "count")])
            return pa.table({"seg": g.column("seg"),
                             "s": g.column("cents_sum"),
                             "n": pc.cast(g.column("cents_count"),
                                          pa.int64())})

    part = orders.map_batches(SegPartial, fn_constructor_args=(ref,),
                              concurrency=(1, 2), batch_format="pyarrow") \
        .to_pandas()
    if "seg" not in part.columns or not len(part):
        return pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                             "c_mktsegment": pd.Series([], dtype=object),
                             "enc_microcents": pd.Series([],
                                                         dtype=np.int64)})
    # Python-int fold: sums × 1e6 exceed int64 at large SFs; the driver
    # fold is groups-count sized either way
    enc = {seg: (int(g["s"].sum()) * 1_000_000) // int(g["n"].sum())
           for seg, g in part.groupby("seg")}
    segs = pa.array(list(enc))
    vals = np.fromiter(enc.values(), dtype=np.int64, count=len(enc))

    def attach(b: pa.Table) -> pa.Table:
        # index_in yields nulls (NaN after to_numpy) for segments with no
        # orders; those customers drop, matching the SQL inner join
        idx = pc.index_in(b.column("c_mktsegment"), value_set=segs) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        matched = ~np.isnan(idx)
        out = pa.table({"c_custkey": b.column("c_custkey"),
                        "c_mktsegment": b.column("c_mktsegment"),
                        "enc_microcents": pa.array(
                            vals[np.where(matched, idx, 0)
                                 .astype(np.int64)], pa.int64())})
        return out.filter(pa.array(matched))

    return ray.data.from_arrow(dim).map_batches(attach,
                                                batch_format="pyarrow")


TARGET_ENCODE_SQL = """
WITH e AS (
  SELECT c_mktsegment,
         CAST((sum(CAST(round(o_totalprice*100) AS BIGINT)) * 1000000)
              // count(*) AS BIGINT) AS enc_microcents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment)
SELECT c.c_custkey, c.c_mktsegment, e.enc_microcents
FROM customer c JOIN e USING (c_mktsegment)
"""


# ---- embedding diagnostics: argmax-dimension histogram ------------------------


def dim_argmax_embeddings(sf_dir: str):
    """(dim, n_vecs) — how often each dimension is a vector's maximum
    component: the embedding-health diagnostic (a collapsed representation
    shows a few dominant dims). EXACT across engines because comparisons
    of exactly-stored float32 values never accumulate error: numpy argmax
    and DuckDB list_indexof(l, list_max(l)) both take the FIRST maximal
    index. Per-batch bincount partials, driver fold of d ints."""
    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b, "embedding")
        if m.shape[0] == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        am = np.argmax(m, axis=1)
        cnt = np.bincount(am, minlength=m.shape[1])
        return pa.table({"dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    df = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "dim" not in df.columns or not len(df):
        return pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                             "n_vecs": pd.Series([], dtype=np.int64)})
    out = df.groupby("dim", as_index=False)["n"].sum()
    out = out[out["n"] > 0].rename(columns={"n": "n_vecs"})
    return out.reset_index(drop=True)


DIM_ARGMAX_SQL = """
SELECT CAST(list_indexof(embedding, list_max(embedding)) - 1 AS BIGINT)
         AS dim,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM embeddings GROUP BY 1 ORDER BY 1
"""


# ---- skip-gram pair mining (word-embedding data prep) -------------------------


def skipgram_pairs_documents(sf_dir: str, window: int = 2, k: int = 200):
    """(w, c, n) — the ``k`` most frequent directed skip-gram pairs
    (context token within ``window`` positions AFTER the center token,
    over the nonempty whitespace tokens of each document): the word2vec /
    co-occurrence-matrix data-prep pass, generalizing the adjacent-pair
    statistic (bpe_pairs) to a window.

    Per batch: ONE Arrow regex split, empties dropped with positions
    re-densified, pairs formed by pure array shifts masked at document
    boundaries, counted with a single pandas groupby — the partial is
    bounded by the batch's pair vocabulary, never its token count. One
    (w,c)-hash exchange folds exact counts; per-bucket heads (a pair lives
    in exactly one bucket) merge 32·k rows on the driver. Tiebreak
    (n DESC, w, c) is deterministic in both engines."""
    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(b.column("text"), pa.string()), "")
        toks = pc.split_pattern_regex(s, r"\s+").combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc = np.repeat(np.arange(len(lens)), lens)
        keep = flat != ""
        f, d = flat[keep], doc[keep]
        ws, cs = [], []
        for off in range(1, window + 1):
            if len(f) <= off:
                break
            same = d[:-off] == d[off:]
            ws.append(f[:-off][same])
            cs.append(f[off:][same])
        if not ws:
            return pa.table({"w": pa.array([], pa.string()),
                             "c": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        df = pd.DataFrame({"w": np.concatenate(ws), "c": np.concatenate(cs)})
        cnt = df.groupby(["w", "c"], sort=False).size().reset_index(name="n")
        h = pd.util.hash_pandas_object(cnt["w"] + "\x00" + cnt["c"],
                                       index=False).to_numpy()
        cnt["__b"] = (h % np.uint64(32)).astype(np.int32)
        cnt["n"] = cnt["n"].astype(np.int64)
        return pa.Table.from_pandas(cnt, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame, kk=k) -> pd.DataFrame:
        tot = g.groupby(["w", "c"], sort=False)["n"].sum().reset_index()
        tot = tot.sort_values(["n", "w", "c"],
                              ascending=[False, True, True],
                              kind="mergesort")
        return tot.head(kk)

    heads = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    if "w" not in heads.columns or not len(heads):
        return pd.DataFrame({"w": pd.Series([], dtype=object),
                             "c": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    out = heads.sort_values(["n", "w", "c"], ascending=[False, True, True],
                            kind="mergesort").head(k)
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


SKIPGRAM_SQL = r"""
WITH arr AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS a
             FROM documents WHERE text IS NOT NULL),
tk AS (SELECT doc_id, unnest(a) AS token,
              generate_subscripts(a, 1) AS i FROM arr),
tk2 AS (SELECT doc_id, token,
               row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
        FROM tk WHERE token <> ''),
pairs AS (SELECT a.token AS w, b.token AS c
          FROM tk2 a JOIN tk2 b
            ON a.doc_id = b.doc_id AND b.j - a.j BETWEEN 1 AND 2)
SELECT w, c, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY w, c ORDER BY n DESC, w, c LIMIT 200
"""


# ---- per-dimension vector statistics ------------------------------------------


def dim_median_embeddings(sf_dir: str):
    """(dim, q_0_5) — the exact per-dimension median of the embedding
    corpus (with dim_argmax, the vector-health profile: a drifted or
    collapsed dimension shows up directly). The vector column EXPLODES to
    (dim, value) rows per batch — a pure reshape, dims become a
    64-cardinality group key — and the existing grouped discrete-quantile
    stage solves every dim of a bucket in one vectorized pass. Float32
    data elements are returned, not recomputed, so the comparison is
    exact."""
    from ..stages.quantiles import grouped_quantiles_disc

    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["embedding"])

    def explode(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        # vectorized ragged positions (the replicate offs idiom) — never a
        # per-row ndarray allocation on the corpus hot path
        dims = (np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])),
                            lens)) if len(lens) else \
            np.array([], dtype=np.int64)
        return pa.table({"dim": pa.array(dims),
                         "value": pc.cast(flat, pa.float64())})

    out = grouped_quantiles_disc(
        emb.map_batches(explode, batch_format="pyarrow"),
        "dim", "value", [0.5]).to_pandas()
    if "dim" not in out.columns:
        return pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                             "q_0_5": pd.Series([], dtype=np.float64)})
    out["dim"] = out["dim"].astype(np.int64)
    return out.sort_values("dim").reset_index(drop=True)


DIM_MEDIAN_SQL = """
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS value
  FROM embeddings)
SELECT CAST(dim AS BIGINT) AS dim, quantile_disc(value, 0.5) AS q_0_5
FROM ex GROUP BY dim ORDER BY dim
"""


def skipgram_pmi_documents(sf_dir: str, k: int = 200):
    """(w, c, n, pmi_micro) — pointwise mutual information of the top-``k``
    skip-gram pairs: ``floor(ln(n_wc·T / (n_w·n_c)) · 1e6)`` where the
    marginals count the token's center/context roles over ALL pairs. The
    collocation-extraction statistic on top of the co-occurrence pass.

    Exact-float discipline: the ratio is ONE double division of two exact
    integer products (each < 2^53 up to ~5M-pair corpora — both engines
    round it identically), then one scalar libm ``math.log`` per SURVIVING
    pair (k of them, driver-side) — numpy's SIMD log diverges 1 ulp from
    libm and is never used. Marginals for the ≤2k tokens of interest come
    from a second corpus pass with the interest set broadcast (the same
    two-pass pattern as min-max scaling); T folds as one int."""
    import math

    top = skipgram_pairs_documents(sf_dir, k=k)
    if not len(top):
        return top.assign(pmi_micro=pd.Series([], dtype=np.int64))
    interest_w = pa.array(pd.unique(top["w"]))
    interest_c = pa.array(pd.unique(top["c"]))

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def marginal_partial(b: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(b.column("text"), pa.string()), "")
        toks = pc.split_pattern_regex(s, r"\s+").combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc = np.repeat(np.arange(len(lens)), lens)
        keep = flat != ""
        f, d = flat[keep], doc[keep]
        rows = []
        t_total = 0
        for off in (1, 2):
            if len(f) <= off:
                break
            same = d[:-off] == d[off:]
            w, c = f[:-off][same], f[off:][same]
            t_total += len(w)
            for role, arr, iset in (("w", w, interest_w),
                                    ("c", c, interest_c)):
                m = pc.is_in(pa.array(arr), value_set=iset) \
                    .to_numpy(zero_copy_only=False)
                if m.any():
                    u, cnt = np.unique(arr[m], return_counts=True)
                    rows.append(pd.DataFrame(
                        {"role": role, "token": u,
                         "n": cnt.astype(np.int64)}))
        rows.append(pd.DataFrame({"role": ["t"], "token": [""],
                                  "n": [np.int64(t_total)]}))
        return pa.Table.from_pandas(pd.concat(rows, ignore_index=True),
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    part = docs.map_batches(marginal_partial,
                            batch_format="pyarrow").to_pandas()
    marg = part.groupby(["role", "token"])["n"].sum()
    big_t = int(marg.get(("t", ""), 0))
    nw = top["w"].map(lambda t: int(marg.get(("w", t), 0))).to_numpy()
    nc = top["c"].map(lambda t: int(marg.get(("c", t), 0))).to_numpy()
    n = top["n"].to_numpy()
    pmi = np.fromiter(
        (math.floor(math.log(float(int(ni) * big_t)
                             / float(int(wi) * int(ci))) * 1_000_000)
         for ni, wi, ci in zip(n, nw, nc)),
        dtype=np.int64, count=len(n))
    out = top.copy()
    out["pmi_micro"] = pmi
    return out


SKIPGRAM_PMI_SQL = r"""
WITH arr AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS a
             FROM documents WHERE text IS NOT NULL),
tk AS (SELECT doc_id, unnest(a) AS token,
              generate_subscripts(a, 1) AS i FROM arr),
tk2 AS (SELECT doc_id, token,
               row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
        FROM tk WHERE token <> ''),
pairs AS (SELECT a.token AS w, b.token AS c
          FROM tk2 a JOIN tk2 b
            ON a.doc_id = b.doc_id AND b.j - a.j BETWEEN 1 AND 2),
cnt AS (SELECT w, c, count(*) AS n FROM pairs GROUP BY w, c),
top AS (SELECT * FROM cnt ORDER BY n DESC, w, c LIMIT 200),
mw AS (SELECT w, CAST(sum(n) AS BIGINT) AS nw FROM cnt GROUP BY w),
mc AS (SELECT c, CAST(sum(n) AS BIGINT) AS nc FROM cnt GROUP BY c),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cnt)
SELECT top.w, top.c, CAST(top.n AS BIGINT) AS n,
       CAST(floor(ln((CAST(top.n * t AS DOUBLE))
                     / (CAST(nw * nc AS DOUBLE))) * 1000000) AS BIGINT)
         AS pmi_micro
FROM top JOIN mw USING (w) JOIN mc USING (c), tot
ORDER BY n DESC, w, c
"""


# ---- importance-weighted deterministic sampling --------------------------------


def weighted_sample_documents(sf_dir: str):
    """(doc_id, lang, n_chars) — a deterministic LENGTH-WEIGHTED sample:
    P(keep) = n_chars / (max_n_chars + 1), decided by the MINSTD LCG of
    doc_id (the quality/importance-weighted selection step of curriculum
    mixing — longer documents proportionally likelier). All-integer:
    ``lcg(doc_id) % (max+1) < n_chars`` — the same SQL-exact LCG as the
    fraction sampler, with the global max folded driver-side (one int)
    and broadcast. Stable across runs, machines, and engines."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])

    def max_partial(b: pa.Table) -> pa.Table:
        mx = pc.max(pc.cast(b.column("n_chars"), pa.int64())).as_py()
        return pa.table({"mx": pa.array([mx if mx is not None else 0],
                                        pa.int64())})

    part = docs.map_batches(max_partial, batch_format="pyarrow").to_pandas()
    mx = int(part["mx"].max()) if "mx" in part.columns and len(part) else 0
    mod = mx + 1

    def keep(b: pa.Table) -> pa.Table:
        did = pc.cast(b.column("doc_id"), pa.int64())
        h = pc.add(pc.multiply(did, 48271), 11)
        lcg = pc.subtract(h, pc.multiply(
            pc.divide(h, 2147483647), 2147483647))
        u = pc.subtract(lcg, pc.multiply(pc.divide(lcg, mod), mod))
        t = pa.table({"doc_id": b.column("doc_id"),
                      "lang": b.column("lang"),
                      "n_chars": pc.cast(b.column("n_chars"), pa.int64())})
        return t.filter(pc.less(u, t.column("n_chars")))

    return docs.map_batches(keep, batch_format="pyarrow")


WEIGHTED_SAMPLE_SQL = """
WITH t AS (SELECT CAST(max(n_chars) AS BIGINT) + 1 AS m FROM documents)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents, t
WHERE ((48271 * doc_id + 11) % 2147483647) % t.m < n_chars
"""


def norm_check_embeddings(sf_dir: str, tol_ppm: int = 1_000):
    """Per vector: the integer-quantized squared L2 norm and whether it
    sits within ``tol_ppm`` of the unit norm — the embedding-sanity gate a
    similarity pipeline runs before trusting cosine math. Quantization is
    the repo's exact cross-engine spelling (``floor(float64(x)·1e5)`` per
    component — float32 inputs widen exactly, one correctly-rounded
    product, integer sums < 2^53), so ``norm2_q`` matches the SQL
    list-kernel oracle bitwise. The deviation test is fully integer:
    ``|norm2_q − 10^10| · 10^6 ≤ tol_ppm · 10^10``."""
    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        vecs = b.column("embedding").combine_chunks()
        flat = pc.cast(pc.list_flatten(vecs), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        q = np.floor(flat * 100_000).astype(np.int64)
        offs = vecs.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]                  # sliced arrays rebase to 0
        if len(q) == 0:
            sq = np.zeros(len(offs) - 1, dtype=np.int64)
        else:
            starts = np.minimum(offs[:-1], len(q) - 1)  # reduceat bounds
            sq = np.add.reduceat(q * q, starts).astype(np.int64)
            sq[offs[:-1] == offs[1:]] = 0      # empty lists reduce wrongly
        # scale² · 1.0 = 10^10 is the unit-norm expectation
        dev = np.abs(sq - np.int64(10_000_000_000))
        ok = dev * np.int64(1_000_000) <= np.int64(tol_ppm) * np.int64(
            10_000_000_000)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "norm2_q": pa.array(sq, pa.int64()),
            "in_range": pa.array(ok)})

    return emb.map_batches(partial, batch_format="pyarrow")


NORM_CHECK_SQL = """
WITH q AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT) *
                   CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)))
              AS BIGINT) AS norm2_q
  FROM embeddings)
SELECT vec_id, norm2_q,
       abs(norm2_q - 10000000000) * 1000000 <= 1000 * 10000000000
         AS in_range
FROM q
"""


def cv_folds_documents(sf_dir: str, k: int = 5):
    """Stratified cross-validation fold assignment: within each lang,
    documents ranked by doc_id take fold ``(rank−1) % k`` — every fold
    gets an equal (±1) share of every stratum, deterministically. Output
    per (lang, fold): size and the exact doc_id sum (an integrity
    checksum proving membership, not just counts, matches).

    One narrow exchange of (lang, doc_id) pairs bucketed by lang; each
    bucket ranks its langs' ids in one sort."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        langs = b.column("lang")
        h = pd.util.hash_pandas_object(
            pd.Series(langs.to_pylist()), index=False).to_numpy()
        return pa.table({
            "lang": langs, "doc_id": b.column("doc_id"),
            "__b": pa.array((h % 8).astype(np.int32))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "doc_id"], kind="mergesort")
        rank = g.groupby("lang", sort=False).cumcount()
        g = g.assign(fold=(rank % k).astype(np.int64))
        out = (g.groupby(["lang", "fold"], sort=False)
               .agg(n_docs=("doc_id", "size"), sum_doc_id=("doc_id", "sum"))
               .reset_index())
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["sum_doc_id"] = out["sum_doc_id"].astype(np.int64)
        return out

    df = (docs.map_batches(partial, batch_format="pyarrow")
          .groupby("__b").map_groups(per_bucket, batch_format="pandas")
          ).to_pandas()
    return (df.sort_values(["lang", "fold"], kind="mergesort")
            .reset_index(drop=True))


CV_FOLDS_SQL = """
WITH r AS (SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang ORDER BY doc_id)
                    AS rn
           FROM documents)
SELECT lang, CAST((rn - 1) % 5 AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM r GROUP BY 1, 2 ORDER BY lang, fold
"""


_ZBITS = 16


def _zorder_sql_expr() -> str:
    terms = []
    for k in range(_ZBITS):
        terms.append(f"(((n_chars % 65536) // {1 << k}) % 2) * "
                     f"{1 << (2 * k)}")
        terms.append(f"(((doc_id % 65536) // {1 << k}) % 2) * "
                     f"{1 << (2 * k + 1)}")
    return " + ".join(terms)


def zorder_documents(sf_dir: str):
    """(doc_id, zindex) — the Z-order (Morton) interleaved sort key of
    (n_chars, doc_id) over 16 bits each: the data-layout primitive behind
    multi-column clustering (rows sorted by zindex co-locate ranges of
    BOTH columns, so min/max pruning works on either predicate). Pure
    per-batch bit arithmetic (vectorized shifts), zero exchanges; the
    oracle evaluates the identical 32-term integer expression."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "n_chars"])

    def z(b: pa.Table) -> pa.Table:
        x = (b.column("n_chars").to_numpy(zero_copy_only=False)
             .astype(np.uint64) % 65536)
        y = (b.column("doc_id").to_numpy(zero_copy_only=False)
             .astype(np.uint64) % 65536)
        zi = np.zeros(len(x), dtype=np.uint64)
        for k in range(_ZBITS):
            zi |= ((x >> k) & 1) << (2 * k)
            zi |= ((y >> k) & 1) << (2 * k + 1)
        return pa.table({"doc_id": b.column("doc_id"),
                         "zindex": pa.array(zi.astype(np.int64))})

    return docs.map_batches(z, batch_format="pyarrow")


ZORDER_SQL = f"""
SELECT doc_id, CAST({_zorder_sql_expr()} AS BIGINT) AS zindex
FROM documents
"""


# ---- inter-label centroid dot products (class-separation diagnostic) --------


def label_centroid_dots(sf_dir: str):
    """(label_a, label_b, dot) for a ≤ b — dot products between per-label
    SUM vectors of the int8-quantized embeddings (the class-separation /
    centroid-collision diagnostic next to ``label_centroids_embeddings``).
    Per-(label, dim) int64 partials fold driver-side (labels × 64 rows);
    the dots are exact Python-int products (they can exceed int64 at large
    corpus sizes, which is why the fold is arbitrary-precision and the
    oracle uses HUGEINT) emitted once as DOUBLE — one correctly-rounded
    conversion of an exact integer in both engines."""
    from .corpus import label_centroids_embeddings  # reuse the exact fold

    cent = label_centroids_embeddings(sf_dir)  # label, dim, q_sum, n_vecs
    sums: dict[int, dict[int, int]] = {}
    for _, r in cent.iterrows():
        sums.setdefault(int(r["label"]), {})[int(r["dim"])] = int(r["q_sum"])
    labels = sorted(sums)
    rows = []
    for i, a in enumerate(labels):
        for b in labels[i:]:
            da, db = sums[a], sums[b]
            dot = sum(v * db.get(k, 0) for k, v in da.items())
            rows.append((a, b, float(dot)))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "dot"]) \
        .astype({"label_a": np.int64, "label_b": np.int64})


LABEL_CENTROID_DOTS_SQL = """
WITH t AS (
  SELECT label, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
), q AS (
  SELECT label,
         list_transform(embedding,
           x -> CASE WHEN scale = 0 THEN 0
                ELSE CAST(floor(CAST(x AS DOUBLE) * 127 / scale) AS BIGINT)
                END) AS qv
  FROM t
), e AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(qv, 1) AS BIGINT) AS dim,
         unnest(qv) AS val
  FROM q),
s AS (SELECT label, dim, CAST(sum(val) AS HUGEINT) AS q_sum
      FROM e GROUP BY 1, 2)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(sum(a.q_sum * b.q_sum) AS DOUBLE) AS dot
FROM s a JOIN s b ON b.dim = a.dim AND b.label >= a.label
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---- nearest-centroid confusion matrix ---------------------------------------


def nearest_centroid_confusion(sf_dir: str):
    """(true_label, assigned_label, n) — every vector assigned to the
    label whose (quantized) centroid has the highest mean inner product,
    the classifier-eval confusion-matrix shape. The per-label sum vectors
    and counts come from the exact ``label_centroids_embeddings`` fold
    (labels × 64 ints, broadcast once); each streaming batch quantizes
    with the same per-vector int8 sequence, does ONE int64 matmul against
    the sum matrix, and scores ``dot/n`` with a single exact-to-double
    division per (vec, label) — the int64 dots sit far below 2^53, so the
    doubles (and the argmax with its lowest-label tiebreak) are identical
    in both engines. Confusion cells fold driver-side (labels²)."""
    import ray

    from .corpus import label_centroids_embeddings

    cent = label_centroids_embeddings(sf_dir)  # label, dim, q_sum, n_vecs
    labels = np.sort(cent["label"].unique()).astype(np.int64)
    lpos = {int(l): i for i, l in enumerate(labels)}
    dmax = int(cent["dim"].max())
    S = np.zeros((len(labels), dmax), dtype=np.int64)
    nvec = np.zeros(len(labels), dtype=np.int64)
    for _, r in cent.iterrows():
        S[lpos[int(r["label"])], int(r["dim"]) - 1] = int(r["q_sum"])
        nvec[lpos[int(r["label"])]] = int(r["n_vecs"])
    ref = ray.put((S, nvec.astype(np.float64), labels))

    class Assign:
        def __init__(self, r):
            self.S, self.n, self.labels = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            col = b.column("embedding")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lengths = pc.fill_null(pc.list_value_length(col), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            live = lengths > 0
            if not live.any():
                return pa.table({"true_label": pa.array([], pa.int64()),
                                 "assigned_label": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ll = lengths[live]
            ends = np.cumsum(ll)
            starts = np.concatenate(([0], ends[:-1]))
            sc = np.maximum.reduceat(np.abs(flat), starts)
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.floor(flat * 127.0 / np.repeat(sc, ll))
            q = np.nan_to_num(q, nan=0.0, posinf=0.0,
                              neginf=0.0).astype(np.int64)
            X = q.reshape(live.sum(), self.S.shape[1])
            scores = (X @ self.S.T).astype(np.float64) / self.n[None, :]
            assigned = self.labels[np.argmax(scores, axis=1)]
            true = b.column("label").to_numpy(
                zero_copy_only=False).astype(np.int64)[live]
            df = pd.DataFrame({"true_label": true,
                               "assigned_label": assigned})
            agg = df.groupby(["true_label", "assigned_label"],
                             sort=False).size().reset_index(name="n")
            return pa.Table.from_pandas(agg, preserve_index=False) \
                .replace_schema_metadata(None)

    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["label", "embedding"])
    parts = emb.map_batches(Assign, fn_constructor_args=(ref,),
                            concurrency=(1, 2),
                            batch_format="pyarrow").to_pandas()
    out = parts.groupby(["true_label", "assigned_label"],
                        as_index=False)["n"].sum()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["true_label", "assigned_label"],
                           kind="mergesort").reset_index(drop=True)


NEAREST_CENTROID_SQL = """
WITH t AS (
  SELECT vec_id, label, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings WHERE len(embedding) > 0
), q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
           x -> CASE WHEN scale = 0 THEN 0
                ELSE CAST(floor(CAST(x AS DOUBLE) * 127 / scale) AS BIGINT)
                END) AS qv
  FROM t
), e AS (
  SELECT vec_id, label AS true_label,
         CAST(generate_subscripts(qv, 1) AS BIGINT) AS dim,
         unnest(qv) AS val
  FROM q),
n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
s AS (SELECT true_label AS label, dim,
             CAST(sum(CAST(val AS HUGEINT)) AS HUGEINT) AS q_sum
      FROM e GROUP BY 1, 2),
d AS (SELECT e.vec_id, e.true_label, s.label AS cand,
             CAST(sum(CAST(e.val AS HUGEINT) * s.q_sum) AS DOUBLE)
               / CAST(n.n AS DOUBLE) AS score
      FROM e JOIN s ON s.dim = e.dim JOIN n ON n.label = s.label
      GROUP BY 1, 2, 3, n.n),
a AS (SELECT vec_id, true_label, cand,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, cand) AS rn
      FROM d)
SELECT true_label, cand AS assigned_label, CAST(count(*) AS BIGINT) AS n
FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---- k-NN label purity ---------------------------------------------------------


def knn_label_purity(sf_dir: str, k: int = 5):
    """Per label: how many of its vectors' k-nearest (MIPS) neighbors
    share the label — neighborhood purity, the embedding-health metric on
    top of :func:`knn_graph_embeddings` (exact integer dots, so the graph
    and therefore the purity is identical cross-engine). The vec→label
    map broadcasts; per-label partials fold driver-side (label-bounded)."""
    import ray

    lab = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "label"])
    tabs = [t for t in ray.get(lab.to_arrow_refs()) if t.num_rows]
    lt = pa.concat_tables(tabs).combine_chunks()
    ref = ray.put((lt.column("vec_id").combine_chunks(),
                   pc.cast(lt.column("label"),
                           pa.int64()).combine_chunks()))

    class Purity:
        def __init__(self, r):
            self.vid, self.lab = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r)

        def __call__(self, b: pa.Table) -> pa.Table:
            la = self.lab.take(pc.index_in(b.column("vec_id"),
                                           value_set=self.vid))
            lb = self.lab.take(pc.index_in(b.column("neighbor_id"),
                                           value_set=self.vid))
            same = pc.cast(pc.equal(la, lb), pa.int64())
            t = pa.table({"label": la, "s": same,
                          "one": pa.array(np.ones(b.num_rows, np.int64))})
            g = t.group_by("label").aggregate([("one", "sum"),
                                               ("s", "sum")])
            return pa.table({"label": g.column("label"),
                             "n_edges": g.column("one_sum"),
                             "n_same": g.column("s_sum")})

    graph = knn_graph_embeddings(sf_dir, k=k)
    parts = graph.map_batches(Purity, fn_constructor_args=(ref,),
                              concurrency=(1, 2),
                              batch_format="pyarrow").to_pandas()
    out = parts.groupby("label", as_index=False)[
        ["n_edges", "n_same"]].sum()
    out["label"] = out["label"].astype(np.int64)
    out["n_edges"] = out["n_edges"].astype(np.int64)
    out["n_same"] = out["n_same"].astype(np.int64)
    out["purity_ppm"] = (out["n_same"] * 1_000_000) // out["n_edges"]
    return out.sort_values("label", kind="mergesort").reset_index(
        drop=True)


KNN_PURITY_SQL = ("WITH g AS (" + KNN_GRAPH_SQL + """)
SELECT CAST(a.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN a.label = b.label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same,
       CAST(sum(CASE WHEN a.label = b.label THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS purity_ppm
FROM g
JOIN embeddings a ON a.vec_id = g.vec_id
JOIN embeddings b ON b.vec_id = g.neighbor_id
GROUP BY 1 ORDER BY 1
""")


# ---- cross-modal: embedding norm profile by document language ------------------


def emb_norm_by_lang(sf_dir: str):
    """(lang, n_vecs, sum_sq, mean_sq) — quantized squared-L2 embedding
    norms profiled by the DOCUMENT language, the cross-modal health check
    joining the two corpus-scale tables. Both sides pre-reduce to narrow
    rows (``(vec_id, sq)`` — the exact ``floor(f64(x)·1e5)`` quantization,
    so Σq² is an exact int64 far under 2^53 — and ``(doc_id, lang)``) and
    meet in ONE bucketed hash join on the shared id; per-lang integer
    partials fold driver-side in Python ints (no overflow at any scale)
    and ``mean_sq`` is the single exact-to-double division."""
    from ..stages.joins import bucketed_join

    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])

    def sq_partial(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(flat * _Q_SCALE).astype(np.int64)
        ends = np.cumsum(lengths)
        starts = ends - lengths
        sq = np.add.reduceat(q * q, starts) if len(q) else \
            np.zeros(len(lengths), np.int64)
        sq = np.where(lengths > 0, sq, 0).astype(np.int64)
        return pa.table({"vec_id": b.column("vec_id"),
                         "sq": pa.array(sq, pa.int64())})

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])
    joined = bucketed_join(emb.map_batches(sq_partial,
                                           batch_format="pyarrow"),
                           docs, "vec_id", right_on="doc_id",
                           num_buckets=16)

    def fold(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b.column("lang"), "sq": b.column("sq"),
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("lang").aggregate([("one", "sum"), ("sq", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "n_vecs": g.column("one_sum"),
                         "sum_sq": g.column("sq_sum")})

    parts = joined.map_batches(fold, batch_format="pyarrow").to_pandas()
    rows = {}
    for _, r in parts.iterrows():     # Python-int fold: no overflow bound
        n, s = rows.get(r["lang"], (0, 0))
        rows[r["lang"]] = (n + int(r["n_vecs"]), s + int(r["sum_sq"]))
    out = pd.DataFrame(
        [(k, np.int64(n), np.int64(s), float(s) / float(n))
         for k, (n, s) in sorted(rows.items())],
        columns=["lang", "n_vecs", "sum_sq", "mean_sq"])
    return out


EMB_NORM_BY_LANG_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS qv
  FROM embeddings)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(list_dot_product(q.qv, q.qv) AS BIGINT)) AS BIGINT)
         AS sum_sq,
       CAST(sum(CAST(list_dot_product(q.qv, q.qv) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS mean_sq
FROM q JOIN documents d ON d.doc_id = q.vec_id
GROUP BY 1 ORDER BY 1
"""


# ---- exact distributed Gram matrix / PCA substrate ---------------------------


def gram_embeddings(sf_dir: str, d: int = 64):
    """(i, j, gram, s_i, s_j, n_vecs) — the exact int64 Gram matrix of the
    quantized embedding corpus, upper triangle, 1-based dims (the PCA /
    whitening substrate; see stages/pca.py for the eigen step). ONE fused
    streaming scan: each row-group task reads, quantizes
    (``floor(float64(x)·1e5)`` — the knn_graph spelling) and matmuls its
    batches; only O(d²) integer partial rows per block reach the driver's
    arbitrary-precision fold, so floats never exist and the oracle
    comparison is integer-exact."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.pca import gram_matrix

    src = FusedParquetScan(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding"])
    return gram_matrix(src, "embedding", d)


GRAM_EMBEDDINGS_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS qv
  FROM embeddings WHERE len(embedding) = 64),
e AS (
  SELECT vec_id, CAST(generate_subscripts(qv, 1) AS BIGINT) AS dim,
         unnest(qv) AS val
  FROM q),
g AS (
  SELECT a.dim AS i, b.dim AS j, CAST(sum(a.val * b.val) AS BIGINT) AS gram
  FROM e a JOIN e b USING (vec_id) WHERE a.dim <= b.dim GROUP BY 1, 2),
s AS (
  SELECT dim, CAST(sum(val) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM e GROUP BY dim)
SELECT g.i, g.j, g.gram, sa.s AS s_i, sb.s AS s_j, sa.n AS n_vecs
FROM g JOIN s sa ON sa.dim = g.i JOIN s sb ON sb.dim = g.j
ORDER BY g.i, g.j
"""


def pca_project_embeddings(sf_dir: str, k: int = 2, d: int = 64):
    """(vec_id, pc1..pck) — end-to-end PCA: exact distributed Gram/
    covariance (gram_embeddings' one-scan substrate), driver-side
    deflated power iteration for the top-k eigenvectors of the CENTERED
    covariance, then one streaming projection pass. Rows-only at the
    driver gate (eigenvectors are float math SQL cannot reproduce);
    component correctness is pinned against np.linalg.eigh in
    tests/test_pca.py."""
    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.pca import (PcaProjector, dense_from_triangle,
                              gram_matrix, power_iteration)

    src = FusedParquetScan(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding"])
    tri = gram_matrix(src, "embedding", d)
    cov = dense_from_triangle(tri, d, centered=True)
    df = tri.to_pandas()
    n = int(df["n_vecs"].iloc[0]) if len(df) else 0
    mean = np.zeros(d)
    if n > 0:
        diag = df[df["i"] == df["j"]]
        s = np.zeros(d)
        s[diag["i"].to_numpy() - 1] = diag["s_i"].to_numpy().astype(float)
        mean = s / n
    comps = []
    m = cov.copy()
    for _ in range(k):
        lam, v = power_iteration(m)
        comps.append(v)
        m = m - lam * np.outer(v, v)          # deflation
    scan = FusedParquetScan(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return scan.map_batches(PcaProjector(
        "embedding", "vec_id", np.vstack(comps), mean=mean))


def class_weights_embeddings(sf_dir: str, block_gate: int = 512):
    """(label, n_rows, weight_ppm) — sklearn-style 'balanced' class
    weights for the embeddings labels: ``n_samples · 1e6 //
    (n_classes · n_label)`` in exact integer parts-per-million
    (non-negative floor division — identical in numpy and DuckDB ``//``).
    The classifier-training prep step for imbalanced labels.

    Shape: ONE fused scan of the label column; per-batch value_counts
    partials are class-count-bounded and fold via
    stages/folds.fold_cells (driver-side under the block gate, one
    label-hash exchange past it)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    def partial(b: pa.Table) -> pa.Table:
        vc = b.column("label").combine_chunks().value_counts()
        return pa.table({
            "label": pc.cast(pc.struct_field(vc, "values"), pa.int64()),
            "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64())})

    scan = FusedParquetScan(f"{sf_dir}/embeddings.parquet",
                            columns=["label"])
    cells = fold_cells(scan, partial, ["label"], sums=["n"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"label": pd.Series([], dtype=np.int64),
                             "n_rows": pd.Series([], dtype=np.int64),
                             "weight_ppm": pd.Series([], dtype=np.int64)})
    agg = cells.rename(columns={"n": "n_rows"})
    total = int(agg["n_rows"].sum())
    ncls = len(agg)
    agg["weight_ppm"] = (total * 1_000_000
                         // (ncls * agg["n_rows"])).astype(np.int64)
    agg["label"] = agg["label"].astype(np.int64)
    agg["n_rows"] = agg["n_rows"].astype(np.int64)
    return agg.sort_values("label").reset_index(drop=True)


CLASS_WEIGHTS_SQL = """
WITH c AS (SELECT CAST(label AS BIGINT) AS label,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM embeddings GROUP BY 1),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS ncls FROM c)
SELECT label, n_rows,
       CAST(t.total * 1000000 // (t.ncls * n_rows) AS BIGINT) AS weight_ppm
FROM c, t ORDER BY label
"""


def hybrid_rrf_embeddings(sf_dir: str, k: int = 3, rrf_k: int = 60,
                          broadcast_limit_rows: int = 4_000_000):
    """(vec_id, neighbor_id, rrf_score, rnk) — HYBRID retrieval fusion:
    each vector's neighbors ranked by reciprocal-rank fusion (Cormack et
    al. 2009) of TWO rankings — maximum-inner-product (the knn_graph
    measure) and smallest squared Euclidean distance — keeping the
    top-``k`` fused neighbors. The modern hybrid-search shape (fuse two
    retrieval orders) over the two genuinely-different similarity orders
    (they disagree exactly when norms vary).

    Exactness: dots are quantized int64 (knn_graph's spelling) and
    ``d² = |a|² + |b|² − 2a·b`` is pure int64 (≤ ~4·6.4e11 at d = 64,
    |x| < 1), so BOTH rankings are deterministic and identical in both
    engines (ties break neighbor id ASC); the RRF score is the INTEGER
    ``floor(1e12/(rrf_k+r1)) + floor(1e12/(rrf_k+r2))`` — no float
    exists anywhere in the operator.

    Scale shape: same broadcast layout as knn_graph (the corpus matrix
    ships once; per batch two argsorts per row). Past
    ``broadcast_limit_rows`` build per-IVF-cell fused lists instead."""
    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    n = emb.count()
    if n > broadcast_limit_rows:
        raise ValueError(
            f"hybrid_rrf_embeddings broadcast path holds the whole corpus "
            f"({n} rows > {broadcast_limit_rows}); fuse per IVF cell")
    whole = pa.concat_tables(ray.get(emb.to_arrow_refs())).combine_chunks()
    ids = whole.column("vec_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    mat = np.floor(_emb_matrix(whole, "embedding").astype(np.float64)
                   * _Q_SCALE).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    norms2 = (mat * mat).sum(axis=1)
    ref = ray.put((ids, mat, norms2))
    SCALE = 10 ** 12

    class Rrf:
        def __init__(self, r, kk, rk):
            self.ids, self.mat, self.norms2 = ray.get(r) \
                if isinstance(r, ray.ObjectRef) else r
            self.k, self.rrf_k = kk, rk

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"vec_id": pa.array([], pa.int64()),
                              "neighbor_id": pa.array([], pa.int64()),
                              "rrf_score": pa.array([], pa.int64()),
                              "rnk": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            q = np.floor(_emb_matrix(b, "embedding").astype(np.float64)
                         * _Q_SCALE).astype(np.int64)
            qid = b.column("vec_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            qn2 = (q * q).sum(axis=1)
            dots = q @ self.mat.T                  # int64 exact
            d2 = qn2[:, None] + self.norms2[None, :] - 2 * dots
            self_mask = qid[:, None] == self.ids[None, :]
            nb = dots.shape[1]
            out_rows = []
            for i in range(len(qid)):
                live = ~self_mask[i]
                # rank 1..m by (measure DESC, id ASC): stable argsort on
                # id-ascending columns
                o1 = np.argsort(-dots[i][live], kind="stable")
                o2 = np.argsort(d2[i][live], kind="stable")
                m = live.sum()
                r1 = np.empty(m, np.int64)
                r1[o1] = np.arange(1, m + 1)
                r2 = np.empty(m, np.int64)
                r2[o2] = np.arange(1, m + 1)
                score = SCALE // (self.rrf_k + r1) \
                    + SCALE // (self.rrf_k + r2)
                nid = self.ids[live]
                top = np.lexsort((nid, -score))[:self.k]
                out_rows.append((np.full(len(top), qid[i]), nid[top],
                                 score[top],
                                 np.arange(1, len(top) + 1,
                                           dtype=np.int64)))
            if not out_rows:
                return empty
            return pa.table({
                "vec_id": pa.array(np.concatenate([r[0] for r in out_rows])),
                "neighbor_id": pa.array(
                    np.concatenate([r[1] for r in out_rows])),
                "rrf_score": pa.array(
                    np.concatenate([r[2] for r in out_rows])),
                "rnk": pa.array(np.concatenate([r[3] for r in out_rows])),
            })

    return emb.map_batches(Rrf, fn_constructor_args=(ref, k, rrf_k),
                           concurrency=(1, 2), batch_size=512,
                           batch_format="pyarrow")


HYBRID_RRF_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS qv
  FROM embeddings),
n2 AS (SELECT vec_id, CAST(list_dot_product(qv, qv) AS BIGINT) AS norm2
       FROM q),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
         na.norm2 + nb.norm2
           - 2 * CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS d2
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
  JOIN n2 na ON na.vec_id = a.vec_id
  JOIN n2 nb ON nb.vec_id = b.vec_id),
ranked AS (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dot DESC, neighbor_id) AS r1,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, neighbor_id) AS r2
  FROM pairs),
fused AS (
  SELECT vec_id, neighbor_id,
         CAST(1000000000000 // (60 + r1)
              + 1000000000000 // (60 + r2) AS BIGINT) AS rrf_score
  FROM ranked)
SELECT vec_id, neighbor_id, rrf_score,
       CAST(row_number() OVER (PARTITION BY vec_id
                               ORDER BY rrf_score DESC, neighbor_id)
            AS BIGINT) AS rnk
FROM fused QUALIFY rnk <= 3
"""


# ---- distributed Lloyd k-means ------------------------------------------------


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 2,
                      block_gate: int = 512):
    """(vec_id, cluster, dist2) — distributed Lloyd's k-means over the
    embedding corpus, EXACT in both engines at every step (the clustering
    backbone for SemDeDup-style curation and IVF coarse quantizers).

    Exactness chain (CLAUDE.md float rule): components quantize once as
    ``floor(float64(x)·1e5)`` (float32 inputs exact, one correctly-rounded
    product, floor has no tie mode); every distance is
    ``‖q‖² − 2q·c + ‖c‖²`` over int64s < 2^53, so DuckDB's
    double-accumulating ``list_dot_product`` folds the exact integer;
    assignment ties break to the LOWEST cluster id (numpy argmin first-win
    ≡ SQL ``ORDER BY dist, cl``); centroid updates are TRUNCATING integer
    division of per-cluster component sums (``sign(s)·(|s| // n)`` in
    numpy ≡ DuckDB's signed ``//``), so the next iteration's centroids are
    int64 vectors again — no float ever accumulates across rows. Seeds
    are the k lowest vec_ids; an emptied cluster keeps its previous
    centroid (LEFT JOIN + coalesce in SQL, mask in numpy).

    Scale shape: each iteration is ONE fused scan whose per-batch partial
    is a (k × d+1) cell table — assignment via an int64 matmul against the
    broadcast centroid matrix, per-cluster sums via a one-hot matmul (no
    Python loop) — folded by the shared bounded-cell fold (driver-side
    under the 512-block gate, hash-bucket exchange past it:
    stages/folds.fold_cells). iters+2 fused scans total; embeddings text
    never shuffles. Reference parity: clustering is an ENGINE extension
    (the reference has no numeric ops); exactness discipline follows
    rules/utils.go's deterministic comparisons."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"],
                            split_per_rg=8)
    d_dim = 0  # discovered by the seed pass

    # -- seed: the k lowest vec_ids, shipped long-form (vec_id, d, v) so
    #    empty batches keep a fixed 3-column schema
    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        q = np.floor(_emb_matrix(b, "embedding").astype(np.float64)
                     * _Q_SCALE).astype(np.int64)
        head = np.argsort(ids, kind="stable")[:k]
        dd = q.shape[1]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids[head], dd)),
            "d": pa.array(np.tile(np.arange(dd, dtype=np.int64),
                                  len(head))),
            "v": pa.array(q[head].ravel())})

    seeds = scan.map_batches(seed_partial).to_pandas()
    seeds = seeds.sort_values(["vec_id", "d"], kind="stable")
    seed_ids = np.sort(seeds["vec_id"].unique())[:k]
    seeds = seeds[seeds["vec_id"].isin(seed_ids)]
    d_dim = int(seeds["d"].max()) + 1
    cent = seeds["v"].to_numpy(np.int64).reshape(k, d_dim)

    scols = [f"s{i}" for i in range(d_dim)]

    def assign(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        # ‖q‖² − 2q·cᵀ + ‖c‖² : int64 throughout (< 2^42 per term at d=64)
        d2 = ((q * q).sum(axis=1, keepdims=True)
              - 2 * (q @ c.T)
              + (c * c).sum(axis=1)[None, :])
        return d2

    for _ in range(iters):
        c_now = cent  # rebind: closures capture per-iteration centroids

        def partial(b: pa.Table, _c=c_now) -> pa.Table:
            n_rows = b.num_rows
            if n_rows == 0:
                cols = {"cl": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64())}
                cols.update({s: pa.array([], pa.int64()) for s in scols})
                return pa.table(cols)
            q = np.floor(_emb_matrix(b, "embedding").astype(np.float64)
                         * _Q_SCALE).astype(np.int64)
            cl = np.argmin(assign(q, _c), axis=1)  # first-win = lowest cl
            onehot = (cl[:, None] == np.arange(k)[None, :]).astype(np.int64)
            sums = onehot.T @ q                      # (k, d) int64 exact
            counts = np.bincount(cl, minlength=k).astype(np.int64)
            cols = {"cl": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts)}
            cols.update({s: pa.array(sums[:, i])
                         for i, s in enumerate(scols)})
            return pa.table(cols)

        cells = fold_cells(scan, partial, ["cl"], sums=["n"] + scols,
                           block_gate=block_gate)
        cells = cells.set_index("cl").reindex(range(k), fill_value=0)
        n = cells["n"].to_numpy(np.int64)
        s = cells[scols].to_numpy(np.int64)
        live = n > 0
        upd = cent.copy()
        # truncating division (DuckDB signed // parity), not numpy floor
        upd[live] = (np.sign(s[live])
                     * (np.abs(s[live]) // n[live, None]))
        cent = upd

    c_fin = cent

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "dist2": pa.array([], pa.int64())})
        ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = np.floor(_emb_matrix(b, "embedding").astype(np.float64)
                     * _Q_SCALE).astype(np.int64)
        d2 = assign(q, c_fin)
        cl = np.argmin(d2, axis=1)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(cl.astype(np.int64)),
            "dist2": pa.array(d2[np.arange(len(cl)), cl])})

    return scan.map_batches(final)


KMEANS_SQL = r"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS qv
  FROM embeddings),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         qv AS cv
  FROM q ORDER BY vec_id LIMIT 8),
a1 AS (
  SELECT vec_id, qv, cl FROM (
    SELECT q.vec_id, q.qv, i.cl,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.qv, q.qv)
             - 2 * list_dot_product(q.qv, i.cv)
             + list_dot_product(i.cv, i.cv), i.cl) AS rn
    FROM q CROSS JOIN init i) WHERE rn = 1),
u1 AS (
  SELECT cl, d, sum(v) AS s, count(*) AS n FROM (
    SELECT cl, generate_subscripts(qv, 1) AS d, unnest(qv) AS v FROM a1) t
  GROUP BY cl, d),
c1 AS (
  SELECT i.cl, coalesce(m.cv, i.cv) AS cv
  FROM init i LEFT JOIN (
    SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY d) AS cv
    FROM u1 GROUP BY cl) m USING (cl)),
a2 AS (
  SELECT vec_id, qv, cl FROM (
    SELECT q.vec_id, q.qv, c.cl,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_dot_product(q.qv, q.qv)
             - 2 * list_dot_product(q.qv, c.cv)
             + list_dot_product(c.cv, c.cv), c.cl) AS rn
    FROM q CROSS JOIN c1 c) WHERE rn = 1),
u2 AS (
  SELECT cl, d, sum(v) AS s, count(*) AS n FROM (
    SELECT cl, generate_subscripts(qv, 1) AS d, unnest(qv) AS v FROM a2) t
  GROUP BY cl, d),
c2 AS (
  SELECT c1.cl, coalesce(m.cv, c1.cv) AS cv
  FROM c1 LEFT JOIN (
    SELECT cl, list(CAST(s // n AS BIGINT) ORDER BY d) AS cv
    FROM u2 GROUP BY cl) m USING (cl))
SELECT vec_id, cl AS cluster,
       CAST(list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
            + list_dot_product(cv, cv) AS BIGINT) AS dist2
FROM (
  SELECT q.vec_id, q.qv, c.cl, c.cv,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
           list_dot_product(q.qv, q.qv)
           - 2 * list_dot_product(q.qv, c.cv)
           + list_dot_product(c.cv, c.cv), c.cl) AS rn
  FROM q CROSS JOIN c2 c) t
WHERE rn = 1
"""


def topk_agreement_embeddings(sf_dir: str, k: int = 3,
                              coarse_scale: int = 16,
                              broadcast_limit_rows: int = 4_000_000):
    """(overlap, n_queries) — the QUANTIZATION-SENSITIVITY audit for
    approximate retrieval: for every vector, how many of its top-``k``
    neighbors under the engine's fine int64 quantization (scale 1e5,
    knn_graph's exact-MIPS spelling) survive when components are
    quantized to a coarse ``floor(x·coarse_scale)`` grid (~4-5 bits for
    unit vectors — the product-quantization / int4 regime). The overlap
    histogram (0..k) is the recall-vs-compression curve's single-point
    summary a curation pipeline checks before switching the ANN index to
    a compressed codebook.

    Exactness: BOTH rankings are deterministic integer dots (ties break
    neighbor id ASC) — floor quantization per component is bit-identical
    cross-engine, dots stay < 2⁵³ — so membership sets and the final
    counts are exact in both engines.

    Scale shape: the corpus matrix broadcasts once (``ray.put``); each
    batch does two argsorts per row and emits a ≤(k+1)-cell histogram
    partial folded driver-side (past ``broadcast_limit_rows``, rank per
    IVF cell instead)."""
    emb = read_parquet(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    n = emb.count()
    if n > broadcast_limit_rows:
        raise ValueError(
            f"topk_agreement_embeddings broadcast path holds the whole "
            f"corpus ({n} rows > {broadcast_limit_rows}); rank per IVF cell")
    whole = pa.concat_tables(ray.get(emb.to_arrow_refs())).combine_chunks()
    ids = whole.column("vec_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    raw = _emb_matrix(whole, "embedding").astype(np.float64)
    fine = np.floor(raw * _Q_SCALE).astype(np.int64)
    coarse = np.floor(raw * coarse_scale).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, fine, coarse = ids[order], fine[order], coarse[order]
    ref = ray.put((ids, fine, coarse))

    class TopkAgreement:
        def __init__(self, r, kk, cs):
            self.ids, self.fine, self.coarse = ray.get(r) \
                if isinstance(r, ray.ObjectRef) else r
            self.k, self.cs = kk, cs

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"overlap": pa.array([], pa.int64()),
                              "n_queries": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            qraw = _emb_matrix(b, "embedding").astype(np.float64)
            qf = np.floor(qraw * _Q_SCALE).astype(np.int64)
            qc = np.floor(qraw * self.cs).astype(np.int64)
            qid = b.column("vec_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dots_f = qf @ self.fine.T              # int64 exact
            dots_c = qc @ self.coarse.T            # int64 exact
            self_mask = qid[:, None] == self.ids[None, :]
            hist = np.zeros(self.k + 1, np.int64)
            for i in range(len(qid)):
                live = ~self_mask[i]
                nid = self.ids[live]
                top1 = nid[np.lexsort((nid, -dots_f[i][live]))[:self.k]]
                top2 = nid[np.lexsort((nid, -dots_c[i][live]))[:self.k]]
                hist[len(np.intersect1d(top1, top2))] += 1
            ov = np.nonzero(hist)[0]
            return pa.table({"overlap": pa.array(ov.astype(np.int64)),
                             "n_queries": pa.array(hist[ov])})

    parts = emb.map_batches(TopkAgreement,
                            fn_constructor_args=(ref, k, coarse_scale),
                            concurrency=(1, 2), batch_size=512,
                            batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"overlap": pd.Series([], dtype=np.int64),
                             "n_queries": pd.Series([], dtype=np.int64)})
    return parts.groupby("overlap", as_index=False) \
        .agg({"n_queries": "sum"}).sort_values("overlap") \
        .reset_index(drop=True).astype(np.int64)


TOPK_AGREEMENT_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS qf,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 16) AS BIGINT)) AS qc
  FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.qf, b.qf) AS BIGINT) AS df,
         CAST(list_dot_product(a.qc, b.qc) AS BIGINT) AS dc
  FROM q a JOIN q b ON a.vec_id <> b.vec_id),
r AS (SELECT vec_id, neighbor_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY df DESC, neighbor_id) AS r1,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dc DESC, neighbor_id) AS r2
      FROM pairs),
o AS (SELECT vec_id,
             CAST(count(*) FILTER (WHERE r1 <= 3 AND r2 <= 3)
                  AS BIGINT) AS ov
      FROM r GROUP BY vec_id)
SELECT ov AS overlap, CAST(count(*) AS BIGINT) AS n_queries
FROM o GROUP BY 1 ORDER BY 1
"""


def centroid_drift_embeddings(sf_dir: str, block_gate: int = 512):
    """Per label: (label, n_even, n_odd, n_dims, d2) — embedding-centroid
    DRIFT between the even-vec_id and odd-vec_id halves of each label (the
    parity split standing in for two corpus generations, as in
    schema_drift): the squared L2 distance between the two halves'
    integer centroids in the exact int8-quantized code space. A label
    whose halves' centroids sit far apart is unstable — relabeled,
    bimodal, or contaminated. Exactness end to end: the quantize_batch
    IEEE sequence (cast → ·127 → /max|x| → floor) is bit-identical
    cross-engine, centroids are the TRUNCATING division ``cq =
    trunc(Σq/n)`` (DuckDB ``//`` truncates signed ints — np.sign·(|s|//n)
    mirrors it), and d² is an integer sum over dims. No float output at
    all.

    Scale shape: ONE pass; per-batch (label, parity, dim) code-sum cells
    are labels×2×dims-bounded → shared gated cell fold; centroid join
    and d² are O(cells) driver math."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        labels = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        par = (b.column("vec_id").to_numpy(zero_copy_only=False)
               .astype(np.int64) % 2)
        live = lengths > 0
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "p": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "q_sum": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if not live.any():
            return empty
        ll = lengths[live]
        ends = np.cumsum(ll)
        segstarts = np.concatenate(([0], ends[:-1]))
        sc = np.maximum.reduceat(np.abs(flat), segstarts)
        per_elem = np.repeat(sc, ll)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor(flat * 127.0 / per_elem)
        q = np.nan_to_num(q, nan=0.0, posinf=0.0,
                          neginf=0.0).astype(np.int64)
        lab = np.repeat(labels[live], ll)
        pp = np.repeat(par[live], ll)
        dim = np.concatenate([np.arange(1, n + 1) for n in ll])
        agg = pd.DataFrame({"label": lab, "p": pp, "dim": dim, "q": q}) \
            .groupby(["label", "p", "dim"], sort=False).agg(
                q_sum=("q", "sum"), n=("q", "size")).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    cells = fold_cells(scan, partial, ["label", "p", "dim"],
                       sums=["q_sum", "n"], block_gate=block_gate)
    cols = ["label", "n_even", "n_odd", "n_dims", "d2"]
    if not len(cells):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    s = cells["q_sum"].to_numpy(np.int64)
    nn = cells["n"].to_numpy(np.int64)
    cells = cells.assign(cq=np.sign(s) * (np.abs(s) // nn))
    ev = cells[cells["p"] == 0]
    od = cells[cells["p"] == 1]
    j = ev.merge(od, on=["label", "dim"], suffixes=("_e", "_o"))
    if not len(j):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    diff = j["cq_e"].to_numpy(np.int64) - j["cq_o"].to_numpy(np.int64)
    agg = j.assign(dd=diff * diff).groupby("label").agg(
        n_dims=("dim", "size"), d2=("dd", "sum"))
    nv = cells.groupby(["label", "p"])["n"].max().unstack()
    out = agg.join(nv.rename(columns={0: "n_even", 1: "n_odd"})) \
        .reset_index().sort_values("label")
    return out[cols].astype(np.int64).reset_index(drop=True)


CENTROID_DRIFT_SQL = """
WITH t AS (
  SELECT vec_id, label, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings WHERE len(embedding) > 0
), q AS (
  SELECT CAST(vec_id % 2 AS BIGINT) AS p, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
           x -> CASE WHEN scale = 0 THEN 0
                ELSE CAST(floor(CAST(x AS DOUBLE) * 127 / scale) AS BIGINT)
                END) AS qv
  FROM t
), e AS (
  SELECT p, label,
         CAST(generate_subscripts(qv, 1) AS BIGINT) AS dim,
         unnest(qv) AS val
  FROM q
), c AS (SELECT label, p, dim, CAST(sum(val) AS BIGINT) AS s,
                CAST(count(*) AS BIGINT) AS n
         FROM e GROUP BY 1, 2, 3),
cq AS (SELECT label, p, dim, s // n AS cq, n FROM c),
nv AS (SELECT label, p, CAST(max(n) AS BIGINT) AS nv
       FROM cq GROUP BY 1, 2),
d AS (SELECT a.label, CAST(count(*) AS BIGINT) AS n_dims,
             CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT) AS d2
      FROM cq a JOIN cq b ON a.label = b.label AND a.dim = b.dim
                         AND a.p = 0 AND b.p = 1
      GROUP BY 1)
SELECT d.label, ne.nv AS n_even, no_.nv AS n_odd, d.n_dims, d.d2
FROM d JOIN nv ne ON ne.label = d.label AND ne.p = 0
       JOIN nv no_ ON no_.label = d.label AND no_.p = 1
ORDER BY d.label
"""
