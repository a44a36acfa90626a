"""Data-quality audit operators — the validation-tier checks beyond
per-row schema keywords: approximate functional dependencies, sequence
integrity, schema drift between corpus generations, Benford first-digit
profiling, and per-domain duplication rates.

These are the checks a production data platform runs ON TOP of row
validation (the reference validates one value at a time —
``validator.go``'s per-field loop; these are corpus-level properties no
per-row engine can express). Exactness discipline as everywhere in this
repo: counts, ppm with floor division, string digits — never accumulated
floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.parquet import read_parquet

# ---- approximate functional dependency: source → lang -----------------------


def fd_violations_documents(sf_dir: str):
    """Per source: does ``source`` functionally determine ``lang``? Emits
    the dominant lang (ties → lexicographically first), its support, the
    violation count, and the FD confidence in exact ppm — the approximate-
    FD discovery primitive (confidence = support / rows).

    One pass: per-batch ``(source, lang) → count`` cells (bounded by
    |sources| × |langs|), driver fold. No row ever crosses the exchange.
    """
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b.column("source"),
                      "lang": b.column("lang")})
        g = t.group_by(["source", "lang"]).aggregate([("lang", "count")])
        return pa.table({"source": g.column("source"),
                         "lang": g.column("lang"),
                         "n": pc.cast(g.column("lang_count"), pa.int64())})

    cells = (docs.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["source", "lang"], as_index=False)["n"].sum())
    rows = []
    for src, g in cells.groupby("source", sort=True):
        n_rows = int(g["n"].sum())
        top_n = int(g["n"].max())
        top_lang = g.loc[g["n"] == top_n, "lang"].min()
        rows.append((src, np.int64(n_rows), top_lang, np.int64(top_n),
                     np.int64(n_rows - top_n),
                     np.int64((top_n * 1_000_000) // n_rows)))
    return pd.DataFrame(rows, columns=["source", "n_rows", "top_lang",
                                       "support", "violations", "conf_ppm"])


FD_VIOLATIONS_SQL = """
WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
t AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS top_n
      FROM c GROUP BY 1),
p AS (SELECT c.source, min(c.lang) AS top_lang
      FROM c JOIN t ON t.source = c.source AND c.n = t.top_n GROUP BY 1)
SELECT t.source, t.n_rows, p.top_lang, CAST(t.top_n AS BIGINT) AS support,
       CAST(t.n_rows - t.top_n AS BIGINT) AS violations,
       CAST((t.top_n * 1000000) // t.n_rows AS BIGINT) AS conf_ppm
FROM t JOIN p ON p.source = t.source ORDER BY t.source
"""


# ---- sequence integrity: l_linenumber must be exactly 1..n per order --------


def sequence_gaps_lineitem(sf_dir: str):
    """One summary row: how many orders have line numbers forming EXACTLY
    ``{1..n}`` (n = line count) and how many violate (gaps, duplicates, or
    wrong start) — the sequence-integrity check behind event ordering /
    pagination audits.

    The multiset property genuinely needs every (order, linenumber) pair
    co-located, so the pairs (two int64 columns — the narrowest possible
    exchange) hash-bucket on the order key and each bucket folds count /
    nunique / min / max per order in one pandas pass.
    """
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"])

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column("l_orderkey")
        return pa.table({
            "o": keys, "ln": b.column("l_linenumber"),
            "__b": pc.cast(pc.bit_wise_and(keys, 31), pa.int32())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o", sort=False)["ln"].agg(
            n="size", nd="nunique", mn="min", mx="max")
        ok = ((agg["mn"] == 1) & (agg["mx"] == agg["n"]) &
              (agg["nd"] == agg["n"]))
        return pd.DataFrame({"n_orders": [np.int64(len(agg))],
                             "n_valid": [np.int64(int(ok.sum()))]})

    parts = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             ).to_pandas()
    n_orders = int(parts["n_orders"].sum()) if len(parts) else 0
    n_valid = int(parts["n_valid"].sum()) if len(parts) else 0
    return pd.DataFrame({
        "n_orders": pd.Series([n_orders], dtype=np.int64),
        "n_valid": pd.Series([n_valid], dtype=np.int64),
        "n_violating": pd.Series([n_orders - n_valid], dtype=np.int64)})


SEQUENCE_GAPS_SQL = """
WITH per_o AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd,
         min(l_linenumber) AS mn, max(l_linenumber) AS mx
  FROM lineitem GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN mn = 1 AND mx = n AND nd = n
                THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(count(*) - sum(CASE WHEN mn = 1 AND mx = n AND nd = n
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
FROM per_o
"""


# ---- schema drift between two corpus generations ----------------------------


def schema_drift_documents(sf_dir: str, block_gate: int = 512):
    """Per column: the inferred JSON-schema profile of generation A (even
    doc_ids) vs generation B (odd doc_ids) and a ``changed`` flag — the
    schema-evolution gate an incremental ingest runs before accepting a
    new crawl. ONE fused scan of documents (read+profile in the same
    task — the full text column never round-trips the object store):
    each batch is split by doc_id parity and profiled per half
    (stages/infer.InferPartial), partials tagged with the generation.
    The 2×|cols| per-batch partial rows fold DRIVER-SIDE under the block
    gate (a Ray groupby here costs the ~2 s sort floor on a few-KB
    table — measured 6.3 s → ~1 s at sf0.1) and through a
    (gen, column)-hash bucket exchange past it. Profiles compare on
    inferred type, required (zero nulls), and the capped distinct
    count."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.infer import (PARTIAL_SCHEMA, InferPartial,
                                _merge_profiles, _prop_from_profile)

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet")
    profile = InferPartial(None, 16)
    empty = pa.table(
        {f.name: pa.array([], type=f.type) for f in PARTIAL_SCHEMA}
    ).append_column("gen", pa.array([], type=pa.int32()))

    def both_halves(b: pa.Table) -> pa.Table:
        odd = pc.cast(pc.bit_wise_and(b.column("doc_id"), 1), pa.bool_())
        outs = []
        for parity, half in ((0, b.filter(pc.invert(odd))),
                             (1, b.filter(odd))):
            if half.num_rows == 0:
                continue
            p = profile(half)
            outs.append(p.append_column(
                "gen", pa.array([parity] * p.num_rows, pa.int32())))
        return pa.concat_tables(outs) if outs else empty

    merge = _merge_profiles(16)

    def merge_gen(g: pd.DataFrame) -> pd.DataFrame:
        out = merge(g.drop(columns=["gen"]))
        out["gen"] = np.int32(g["gen"].iloc[0])
        return out

    def fold(parts: pd.DataFrame) -> pd.DataFrame:
        return (parts.groupby(["gen", "column"], sort=False,
                              group_keys=False)
                .apply(merge_gen).reset_index(drop=True))

    parts_ds = scan.map_batches(both_halves)
    if scan.num_blocks() > block_gate:
        def add_bucket(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.select(["gen", "column"]).to_pandas(),
                index=False).to_numpy()
            return t.append_column(
                "__b", pa.array((h % np.uint64(64)).astype(np.int32)))

        def per_bucket(g: pd.DataFrame) -> pa.Table:
            return pa.Table.from_pandas(
                fold(g.drop(columns="__b")), preserve_index=False) \
                .replace_schema_metadata(None)

        prof = parts_ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("__b").map_groups(per_bucket,
                                       batch_format="pandas").to_pandas()
    else:
        prof = fold(parts_ds.to_pandas())
    halves: list[dict] = [{}, {}]
    for _, r in prof.iterrows():
        halves[int(r["gen"])][r["column"]] = (
            _prop_from_profile(r, 16).get("type"),
            bool(r["nulls"] == 0), int(r["n_distinct_capped"]))
    a, b = halves
    rows = []
    for col in sorted(set(a) | set(b)):
        ta, ra, da = a.get(col, (None, None, None))
        tb, rb, db = b.get(col, (None, None, None))
        rows.append((col, ta, tb, ra, rb, np.int64(da), np.int64(db),
                     bool(ta != tb or ra != rb or da != db)))
    return pd.DataFrame(rows, columns=[
        "column", "jtype_a", "jtype_b", "required_a", "required_b",
        "n_distinct_a", "n_distinct_b", "changed"])


def _drift_col_sql(col: str, jtype: str, parity: int) -> str:
    return (f"SELECT '{col}' AS column, '{jtype}' AS jtype, "
            f"COUNT(*) = COUNT({col}) AS required, "
            f"LEAST(COUNT(DISTINCT {col}), 17) AS n_distinct "
            f"FROM documents WHERE doc_id % 2 = {parity}")


def _drift_half_sql(parity: int) -> str:
    cols = [("doc_id", "integer"), ("text", "string"), ("lang", "string"),
            ("source", "string"), ("n_chars", "integer")]
    return " UNION ALL ".join(_drift_col_sql(c, t, parity) for c, t in cols)


SCHEMA_DRIFT_SQL = f"""
WITH a AS ({_drift_half_sql(0)}), b AS ({_drift_half_sql(1)})
SELECT a.column, a.jtype AS jtype_a, b.jtype AS jtype_b,
       a.required AS required_a, b.required AS required_b,
       CAST(a.n_distinct AS BIGINT) AS n_distinct_a,
       CAST(b.n_distinct AS BIGINT) AS n_distinct_b,
       (a.jtype <> b.jtype OR a.required <> b.required
        OR a.n_distinct <> b.n_distinct) AS changed
FROM a JOIN b ON b.column = a.column ORDER BY a.column
"""


# ---- Benford first-digit profile --------------------------------------------

# floor(log10(1 + 1/d) · 10⁶) — the Benford expectation as integer ppm;
# the SAME literals appear in the SQL so no engine ever evaluates log10.
_BENFORD_PPM = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
                6: 66946, 7: 57991, 8: 51152, 9: 45757}


def benford_totalprice(sf_dir: str):
    """First-significant-digit distribution of o_totalprice (via its cents
    string — digit extraction, not float math) against the Benford
    expectation: per digit the observed count, observed ppm (floor),
    expected ppm (shared integer constants), and |deviation| ppm. The
    fraud/synthetic-data smell test. Per-batch digit counts are 9-cell
    partials; the fold is driver-side."""
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100)),
                        pa.int64())
        digit = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1), pa.int64())
        vc = digit.combine_chunks().value_counts()
        return pa.table({
            "digit": pc.struct_field(vc, "values"),
            "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64())})

    df = (orders.map_batches(partial, batch_format="pyarrow").to_pandas()
          .groupby("digit", as_index=False)["n"].sum())
    total = int(df["n"].sum())
    counts = dict(zip(df["digit"], df["n"]))
    rows = []
    for d in range(1, 10):
        n = int(counts.get(d, 0))
        obs = (n * 1_000_000) // total if total else 0
        exp = _BENFORD_PPM[d]
        rows.append((np.int64(d), np.int64(n), np.int64(obs),
                     np.int64(exp), np.int64(abs(obs - exp))))
    return pd.DataFrame(rows, columns=["digit", "n", "obs_ppm",
                                       "benford_ppm", "dev_ppm"])


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())

BENFORD_SQL = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1),
tot AS (SELECT sum(n) AS total FROM c),
grid AS (SELECT unnest(range(1, 10)) AS digit),
j AS (SELECT g.digit, coalesce(c.n, 0) AS n,
             CASE WHEN tot.total > 0
                  THEN (coalesce(c.n, 0) * 1000000) // tot.total
                  ELSE 0 END AS obs_ppm,
             CASE g.digit {_BENFORD_CASE} END AS benford_ppm
      FROM grid g LEFT JOIN c ON c.digit = g.digit, tot)
SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
       CAST(obs_ppm AS BIGINT) AS obs_ppm,
       CAST(benford_ppm AS BIGINT) AS benford_ppm,
       CAST(abs(obs_ppm - benford_ppm) AS BIGINT) AS dev_ppm
FROM j ORDER BY digit
"""


# ---- per-domain duplication rate --------------------------------------------


def dup_ratio_by_domain(sf_dir: str):
    """Per registrable domain (synthesized URLs — pipelines/weburls
    construction): document count, exact distinct-text count, and the
    duplication rate in ppm — the domain-level dedup budget a crawl
    curator reads before sampling. Distinct texts per domain ride the
    repo's two-phase exact COUNT(DISTINCT) (stages/uniqueness.
    group_distinct_count: distinct pairs per batch, pair-hash buckets,
    per-bucket global dedup) so no text value is ever compared across
    buckets and no hashes stand in for values."""
    from ..stages.uniqueness import group_distinct_count
    from .weburls import _synth_urls
    from ..functions.urls import parse_url_parts

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "lang", "text"])

    def with_domain(b: pa.Table) -> pa.Table:
        parts = parse_url_parts(_synth_urls(b))
        return pa.table({"domain": parts.column("domain"),
                         "text": b.column("text")})

    dom = docs.map_batches(with_domain, batch_format="pyarrow")
    nd = group_distinct_count(dom, "domain", "text").to_pandas()

    def count_partial(b: pa.Table) -> pa.Table:
        vc = b.column("domain").combine_chunks().value_counts()
        return pa.table({
            "domain": pc.struct_field(vc, "values"),
            "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64())})

    ndocs = (dom.map_batches(count_partial, batch_format="pyarrow")
             .to_pandas().groupby("domain", as_index=False)["n"].sum())
    out = nd.merge(ndocs, on="domain")
    out = out.rename(columns={"n_distinct": "n_distinct_texts",
                              "n": "n_docs"})
    out["dup_ppm"] = ((out["n_docs"] - out["n_distinct_texts"])
                      * 1_000_000) // out["n_docs"]
    for c in ("n_docs", "n_distinct_texts", "dup_ppm"):
        out[c] = out[c].astype(np.int64)
    return (out[["domain", "n_docs", "n_distinct_texts", "dup_ppm"]]
            .sort_values("domain", kind="mergesort").reset_index(drop=True))


DUP_RATIO_BY_DOMAIN_SQL = """
WITH u AS (SELECT 'example.' || lang AS domain, text FROM documents)
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
       CAST(((count(*) - count(DISTINCT text)) * 1000000) // count(*)
            AS BIGINT) AS dup_ppm
FROM u GROUP BY 1 ORDER BY domain
"""


# ---- cross-source duplication matrix ------------------------------------------


def cross_source_dup_matrix(sf_dir: str):
    """(source_a, source_b, n_pairs) for a ≤ b — how many identical-text
    DOCUMENT PAIRS connect each source pair (the contamination / syndication
    matrix: heavy off-diagonal cells mean sources copy each other). Per-batch
    (text-hash bucket, text, source, k) partials colocate each text value in
    one bucket; the bucket folds per-text source counts and emits per-pair
    integer partials (same-source pairs are C(k,2), cross-source k_a·k_b —
    both exact); the |sources|²-bounded fold finishes driver-side. Text
    crosses the exchange once (the dedup_exact discipline)."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["text", "source"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"text": pc.fill_null(b.column("text"), ""),
                      "source": b.column("source"),
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["text", "source"]).aggregate([("one", "sum")])
        df = g.to_pandas()
        h = pd.util.hash_pandas_object(df["text"], index=False).to_numpy()
        df["__b"] = (h % 64).astype(np.int32)
        df = df.rename(columns={"one_sum": "k"})
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        d = g.groupby(["text", "source"], sort=False, as_index=False)[
            "k"].sum()
        pairs = d.merge(d, on="text")
        pairs = pairs[pairs["source_x"] <= pairs["source_y"]]
        same = pairs["source_x"] == pairs["source_y"]
        kx = pairs["k_x"].to_numpy(np.int64)
        ky = pairs["k_y"].to_numpy(np.int64)
        n = np.where(same, kx * (kx - 1) // 2, kx * ky)
        out = pd.DataFrame({"source_a": pairs["source_x"],
                            "source_b": pairs["source_y"],
                            "n_pairs": n.astype(np.int64)})
        out = out.groupby(["source_a", "source_b"], sort=False,
                          as_index=False)["n_pairs"].sum()
        out = out[out["n_pairs"] > 0]
        # Arrow return with explicit string types: an often-empty pandas
        # object column trips Ray's block size estimator (log spam)
        return pa.table({
            "source_a": pa.array(out["source_a"].to_numpy(),
                                 type=pa.string()),
            "source_b": pa.array(out["source_b"].to_numpy(),
                                 type=pa.string()),
            "n_pairs": pa.array(out["n_pairs"].to_numpy(),
                                type=pa.int64())})

    parts = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({"source_a": pd.Series([], dtype=object),
                             "source_b": pd.Series([], dtype=object),
                             "n_pairs": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["source_a", "source_b"], as_index=False)[
        "n_pairs"].sum()
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values(["source_a", "source_b"],
                           kind="mergesort").reset_index(drop=True)


CROSS_SOURCE_DUP_SQL = """
WITH g AS (SELECT text, source, CAST(count(*) AS BIGINT) AS k
           FROM documents GROUP BY 1, 2)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(sum(CASE WHEN a.source = b.source THEN a.k * (a.k - 1) // 2
                     ELSE a.k * b.k END) AS BIGINT) AS n_pairs
FROM g a JOIN g b ON b.text = a.text AND a.source <= b.source
GROUP BY 1, 2 HAVING sum(CASE WHEN a.source = b.source
                              THEN a.k * (a.k - 1) // 2
                              ELSE a.k * b.k END) > 0
ORDER BY 1, 2
"""


# ---- k-anonymity audit ---------------------------------------------------------


def kanon_audit_documents(sf_dir: str, k: int = 5, block_gate: int = 512):
    """(lang, source, len_bucket, n_rows) — quasi-identifier groups with
    FEWER than ``k`` members (the k-anonymity audit: rows in such groups
    are re-identifiable by the (lang, source, length-bucket) combination
    alone; a privacy-conscious release would suppress or generalize
    them). Length buckets are ``n_chars // 500`` — integer floor division
    of non-negative ints, exact in both engines.

    Shape: ONE fused scan of three small columns; per-batch partial
    counts are bounded by the QI-combination cardinality and fold via
    stages/folds.fold_cells (driver-side under the block gate, one
    QI-hash exchange past it)."""
    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "lang": b.column("lang"),
            "source": b.column("source"),
            "len_bucket": pc.cast(pc.divide(
                pc.cast(b.column("n_chars"), pa.int64()),
                pa.scalar(500, pa.int64())), pa.int64()),
        })
        g = t.group_by(["lang", "source", "len_bucket"]).aggregate(
            [("len_bucket", "count")])
        return g.rename_columns(["lang", "source", "len_bucket", "n"])

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source", "n_chars"])
    cells = fold_cells(scan, partial, ["lang", "source", "len_bucket"],
                       sums=["n"], block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "source": pd.Series([], dtype=object),
                             "len_bucket": pd.Series([], dtype=np.int64),
                             "n_rows": pd.Series([], dtype=np.int64)})
    agg = cells.rename(columns={"n": "n_rows"})
    out = agg[agg["n_rows"] < k].sort_values(
        ["lang", "source", "len_bucket"], kind="mergesort") \
        .reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["len_bucket"] = out["len_bucket"].astype(np.int64)
    return out


KANON_AUDIT_SQL = """
SELECT lang, source, CAST(n_chars // 500 AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_rows
FROM documents
GROUP BY 1, 2, 3 HAVING count(*) < 5
ORDER BY lang, source, len_bucket
"""


def cohens_kappa_gates_documents(sf_dir: str, min_chars: int = 300,
                                 min_spaces: int = 50,
                                 block_gate: int = 512):
    """One-row (n_rows, n_both, n_only_len, n_only_tok, n_neither,
    kappa) — Cohen's κ inter-rater agreement between two independent
    document quality gates: the LENGTH gate (n_chars ≥ min_chars) and
    the TOKEN-COUNT gate (whitespace-separator count ≥ min_spaces, the
    cheap token-budget proxy). κ answers "do the two filters agree
    beyond chance?" — the filter-redundancy audit a curation pipeline
    runs before paying for both. With 2×2 confusion counts (a = both
    pass, b = length only, c = tokens only, d = neither) and
    ``E = (a+b)(a+c) + (c+d)(b+d)``:

        κ = (N·(a+d) − E) / (N² − E)

    — ONE division of two exact integers, bitwise cross-engine.

    Scale shape: per-batch 4-cell confusion partials → shared gated
    cell fold; driver math is O(1). The separator count is a vectorized
    Arrow kernel (ASCII bytes, matching DuckDB's replace-length
    spelling)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g1 = pc.greater_equal(b.column("n_chars"), min_chars)
        spaces = pc.count_substring(b.column("text"), " ")
        g2 = pc.greater_equal(spaces, min_spaces)
        t = pa.table({"g1": pc.cast(g1, pa.int64()),
                      "g2": pc.cast(g2, pa.int64())})
        g = t.group_by(["g1", "g2"]).aggregate([("g1", "count")])
        return pa.table({"g1": g.column("g1"), "g2": g.column("g2"),
                         "c": pc.cast(g.column("g1_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["g1", "g2"], sums=["c"],
                       block_gate=block_gate)
    cnt = {(int(r.g1), int(r.g2)): int(r.c)
           for r in cells.itertuples(index=False)} if len(cells) else {}
    a = cnt.get((1, 1), 0)
    b_ = cnt.get((1, 0), 0)
    c = cnt.get((0, 1), 0)
    d = cnt.get((0, 0), 0)
    n = a + b_ + c + d
    e = (a + b_) * (a + c) + (c + d) * (b_ + d)
    den = n * n - e
    kappa = 0.0 if den == 0 else float(n * (a + d) - e) / float(den)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype=np.int64),
        "n_both": pd.Series([a], dtype=np.int64),
        "n_only_len": pd.Series([b_], dtype=np.int64),
        "n_only_tok": pd.Series([c], dtype=np.int64),
        "n_neither": pd.Series([d], dtype=np.int64),
        "kappa": pd.Series([kappa], dtype=np.float64)})


COHENS_KAPPA_SQL = """
WITH v AS (SELECT CAST(n_chars >= 300 AS BIGINT) AS g1,
                  CAST(length(text) - length(replace(text, ' ', ''))
                       >= 50 AS BIGINT) AS g2
           FROM documents),
c AS (SELECT
        CAST(count(*) FILTER (WHERE g1 = 1 AND g2 = 1) AS BIGINT) AS a,
        CAST(count(*) FILTER (WHERE g1 = 1 AND g2 = 0) AS BIGINT) AS b,
        CAST(count(*) FILTER (WHERE g1 = 0 AND g2 = 1) AS BIGINT) AS c,
        CAST(count(*) FILTER (WHERE g1 = 0 AND g2 = 0) AS BIGINT) AS d
      FROM v),
m AS (SELECT a, b, c, d, a + b + c + d AS n,
             CAST(a + b AS HUGEINT) * (a + c)
               + CAST(c + d AS HUGEINT) * (b + d) AS e
      FROM c)
SELECT n AS n_rows, a AS n_both, b AS n_only_len, c AS n_only_tok,
       d AS n_neither,
       CASE WHEN CAST(n AS HUGEINT) * n - e = 0 THEN 0.0
            ELSE CAST(CAST(n AS HUGEINT) * (a + d) - e AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n - e AS DOUBLE) END AS kappa
FROM m
"""


# ---- candidate-key discovery: per-column uniqueness profile ------------------

def key_uniqueness_documents(sf_dir: str, block_gate: int = 512,
                             n_buckets: int = 64):
    """Per documents column: (col, n_rows, n_null, n_distinct, dup_rows,
    is_key) — candidate-key discovery, the profiling step BEFORE a
    uniqueness constraint is declared (the reference validates a declared
    schema; this audit tells you which uniqueness declarations would
    hold). ``dup_rows = (n_rows − n_null) − n_distinct`` (rows beyond the
    first occurrence of their value) and ``is_key = 1`` iff the column is
    null-free and duplicate-free.

    Value identity is the 60-bit md5 prefix of the value cast to string —
    the engine-portable spelling shared with stages/checksum.py — so the
    oracle groups by the IDENTICAL derived key and parity holds by
    construction (a collision collides in both engines).

    Scale shape: ONE scan; each batch emits per-column (col, h) pairs
    pre-deduped within the batch plus one (col, -1) count cell. Under the
    block gate the pairs gather driver-side; past it they hash-exchange
    on h's bucket (h determines its bucket, so per-bucket distinct counts
    are globally correct) and only O(columns × buckets) folded rows
    gather."""
    import pyarrow.compute as _pc

    from ..sources.parquet import FusedParquetScan
    from ..stages.checksum import _row_hashes

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    scan = FusedParquetScan(f"{sf_dir}/documents.parquet", columns=cols)

    def partial(b: pa.Table) -> pa.Table:
        name_parts, h_parts, n_parts, nn_parts = [], [], [], []
        for cname in cols:
            a = b.column(cname)
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            s = a if pa.types.is_string(a.type) else _pc.cast(a, pa.string())
            valid = s.drop_null().to_pylist()
            hs = (np.unique(_row_hashes(valid)) if len(valid)
                  else np.array([], np.int64))
            name_parts.append(np.full(len(hs) + 1, cname, dtype=object))
            h_parts.append(np.concatenate(([-1], hs)))
            n_parts.append(np.concatenate(([len(s)],
                                           np.zeros(len(hs), np.int64))))
            nn_parts.append(np.concatenate(([s.null_count],
                                            np.zeros(len(hs), np.int64))))
        return pa.table({
            "col": pa.array(np.concatenate(name_parts), pa.string()),
            "h": pa.array(np.concatenate(h_parts).astype(np.int64)),
            "n": pa.array(np.concatenate(n_parts).astype(np.int64)),
            "nn": pa.array(np.concatenate(nn_parts).astype(np.int64))})

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        counts = df[df["h"] < 0].groupby("col", as_index=False)[
            ["n", "nn"]].sum()
        nd = (df[df["h"] >= 0].groupby("col")["h"].nunique()
              .rename("nd").reset_index())
        # outer: a bucket may hold only hash cells (count cells all carry
        # h = -1, so they land in one bucket) or only count cells
        return counts.merge(nd, on="col", how="outer").fillna(0)

    parts_ds = scan.map_batches(partial)
    if scan.num_blocks() <= block_gate:
        parts = parts_ds.to_pandas()
        per = _reduce(parts) if len(parts) else \
            pd.DataFrame({"col": [], "n": [], "nn": [], "nd": []})
    else:
        mod = np.int64(n_buckets)

        def add_bucket(t: pa.Table) -> pa.Table:
            h = t.column("h").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__b", pa.array((h % mod).astype(np.int32)))

        def per_bucket(g: pd.DataFrame) -> pa.Table:
            out = _reduce(g.drop(columns="__b"))
            return pa.Table.from_pandas(out, preserve_index=False) \
                .replace_schema_metadata(None)

        per = (parts_ds.map_batches(add_bucket, batch_format="pyarrow")
               .groupby("__b").map_groups(per_bucket, batch_format="pandas")
               .to_pandas())
        per = per.groupby("col", as_index=False)[["n", "nn", "nd"]].sum()

    by = {r.col: (int(r.n), int(r.nn), int(r.nd))
          for r in per.itertuples(index=False)}
    rows = []
    for cname in sorted(cols):
        n, nn, nd = by.get(cname, (0, 0, 0))
        dup = (n - nn) - nd
        rows.append((cname, np.int64(n), np.int64(nn), np.int64(nd),
                     np.int64(dup), np.int64(1 if dup == 0 and nn == 0
                                             else 0)))
    return pd.DataFrame(rows, columns=["col", "n_rows", "n_null",
                                       "n_distinct", "dup_rows", "is_key"])


def _key_uniq_branch(col: str) -> str:
    return f"""
SELECT '{col}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({col}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT substr(md5(CAST({col} AS VARCHAR)), 1, 15))
            AS BIGINT) AS n_distinct,
       CAST(count({col})
            - count(DISTINCT substr(md5(CAST({col} AS VARCHAR)), 1, 15))
            AS BIGINT) AS dup_rows,
       CAST((count(*) = count({col})) AND (count({col}) =
            count(DISTINCT substr(md5(CAST({col} AS VARCHAR)), 1, 15)))
            AS BIGINT) AS is_key
FROM documents"""


KEY_UNIQUENESS_SQL = (" UNION ALL ".join(
    _key_uniq_branch(c)
    for c in sorted(["doc_id", "text", "lang", "source", "n_chars"]))
    + " ORDER BY col")


# ---- McNemar paired-gate disagreement test -----------------------------------

def mcnemar_gates_documents(sf_dir: str, min_chars: int = 300,
                            min_periods: int = 3, block_gate: int = 512):
    """One-row (n_rows, n_only_len, n_only_sent, mcnemar) — McNemar's
    paired test between the LENGTH gate (n_chars ≥ min_chars) and the
    SENTENCE gate ('.' count ≥ min_periods) over the same documents: do
    the two quality filters disagree symmetrically, or does one
    systematically pass documents the other rejects? With discordant
    counts b (length only) and c (sentence only),

        χ²_McNemar = (b − c)² / (b + c)

    — ONE division of two exact integers, bitwise cross-engine (0.0 when
    b + c = 0). The marginal-homogeneity sibling of
    :func:`cohens_kappa_gates_documents` (which measures agreement; this
    measures the DIRECTION of disagreement).

    Scale shape: per-batch 4-cell confusion partials → shared gated cell
    fold; driver math is O(1)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g1 = pc.greater_equal(b.column("n_chars"), min_chars)
        g2 = pc.greater_equal(pc.count_substring(b.column("text"), "."),
                              min_periods)
        t = pa.table({"g1": pc.cast(g1, pa.int64()),
                      "g2": pc.cast(g2, pa.int64())})
        g = t.group_by(["g1", "g2"]).aggregate([("g1", "count")])
        return pa.table({"g1": g.column("g1"), "g2": g.column("g2"),
                         "c": pc.cast(g.column("g1_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["g1", "g2"], sums=["c"],
                       block_gate=block_gate)
    cnt = {(int(r.g1), int(r.g2)): int(r.c)
           for r in cells.itertuples(index=False)} if len(cells) else {}
    n = sum(cnt.values())
    b_ = cnt.get((1, 0), 0)
    c = cnt.get((0, 1), 0)
    stat = 0.0 if b_ + c == 0 else float((b_ - c) * (b_ - c)) / float(b_ + c)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype=np.int64),
        "n_only_len": pd.Series([b_], dtype=np.int64),
        "n_only_sent": pd.Series([c], dtype=np.int64),
        "mcnemar": pd.Series([stat], dtype=np.float64)})


MCNEMAR_SQL = """
WITH v AS (SELECT CAST(n_chars >= 300 AS BIGINT) AS g1,
                  CAST(length(text) - length(replace(text, '.', ''))
                       >= 3 AS BIGINT) AS g2
           FROM documents),
c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) FILTER (WHERE g1 = 1 AND g2 = 0) AS BIGINT) AS b,
        CAST(count(*) FILTER (WHERE g1 = 0 AND g2 = 1) AS BIGINT) AS c
      FROM v)
SELECT n AS n_rows, b AS n_only_len, c AS n_only_sent,
       CASE WHEN b + c = 0 THEN 0.0
            ELSE CAST((b - c) * (b - c) AS DOUBLE)
                 / CAST(b + c AS DOUBLE) END AS mcnemar
FROM c
"""


# ---- Cochran's Q over three quality gates ------------------------------------

def cochran_q_gates_documents(sf_dir: str, min_chars: int = 300,
                              min_spaces: int = 50, min_periods: int = 3,
                              block_gate: int = 512):
    """One-row (n_rows, g_len, g_tok, g_sent, q) — Cochran's Q test of
    marginal homogeneity across THREE binary quality gates applied to the
    same documents (length ≥ min_chars, whitespace tokens ≥ min_spaces,
    sentences ≥ min_periods): the k-gate generalization of McNemar. With
    per-gate pass totals G_j, per-row pass-count sums S = ΣL_i and
    SL2 = ΣL_i², and k = 3,

        Q = (k−1)·(k·ΣG_j² − S²) / (k·S − SL2)

    — ONE division of two exact integers (0.0 when the denominator is 0;
    HUGEINT-range at any SF since G_j, S ≤ 3N).

    Scale shape: per-batch 8-cell (g1,g2,g3) confusion partials → shared
    gated cell fold; all moments derive from the 8 folded cells."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g1 = pc.greater_equal(b.column("n_chars"), min_chars)
        g2 = pc.greater_equal(pc.count_substring(b.column("text"), " "),
                              min_spaces)
        g3 = pc.greater_equal(pc.count_substring(b.column("text"), "."),
                              min_periods)
        t = pa.table({"g1": pc.cast(g1, pa.int64()),
                      "g2": pc.cast(g2, pa.int64()),
                      "g3": pc.cast(g3, pa.int64())})
        g = t.group_by(["g1", "g2", "g3"]).aggregate([("g1", "count")])
        return pa.table({"g1": g.column("g1"), "g2": g.column("g2"),
                         "g3": g.column("g3"),
                         "c": pc.cast(g.column("g1_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["g1", "g2", "g3"], sums=["c"],
                       block_gate=block_gate)
    n = gl = gt = gs = s = sl2 = 0
    for r in (cells.itertuples(index=False) if len(cells) else ()):
        c, l_ = int(r.c), int(r.g1) + int(r.g2) + int(r.g3)
        n += c
        gl += c * int(r.g1)
        gt += c * int(r.g2)
        gs += c * int(r.g3)
        s += c * l_
        sl2 += c * l_ * l_
    qnum = 2 * (3 * (gl * gl + gt * gt + gs * gs) - s * s)
    qden = 3 * s - sl2
    q = 0.0 if qden == 0 else float(qnum) / float(qden)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype=np.int64),
        "g_len": pd.Series([gl], dtype=np.int64),
        "g_tok": pd.Series([gt], dtype=np.int64),
        "g_sent": pd.Series([gs], dtype=np.int64),
        "q": pd.Series([q], dtype=np.float64)})


COCHRAN_Q_SQL = """
WITH v AS (SELECT CAST(n_chars >= 300 AS BIGINT) AS g1,
                  CAST(length(text) - length(replace(text, ' ', ''))
                       >= 50 AS BIGINT) AS g2,
                  CAST(length(text) - length(replace(text, '.', ''))
                       >= 3 AS BIGINT) AS g3
           FROM documents),
a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g1) AS HUGEINT) AS gl,
             CAST(sum(g2) AS HUGEINT) AS gt,
             CAST(sum(g3) AS HUGEINT) AS gs,
             CAST(sum(g1 + g2 + g3) AS HUGEINT) AS s,
             CAST(sum((g1 + g2 + g3) * (g1 + g2 + g3)) AS HUGEINT) AS sl2
      FROM v)
SELECT n AS n_rows, CAST(gl AS BIGINT) AS g_len,
       CAST(gt AS BIGINT) AS g_tok, CAST(gs AS BIGINT) AS g_sent,
       CASE WHEN 3 * s - sl2 = 0 THEN 0.0
            ELSE CAST(2 * (3 * (gl * gl + gt * gt + gs * gs) - s * s)
                      AS DOUBLE) / CAST(3 * s - sl2 AS DOUBLE) END AS q
FROM a
"""


# ---- score-calibration bins: length signal vs token gate ---------------------

def calibration_bins_documents(sf_dir: str, bin_width: int = 200,
                               n_bins: int = 10, min_spaces: int = 50,
                               block_gate: int = 512):
    """Per length-score bin: (bin, n, n_pass, pass_ppm) — the calibration
    table of a cheap ranking signal (n_chars, binned at ``bin_width``
    with the top bin open) against the expensive gate it is meant to
    predict (whitespace tokens ≥ min_spaces): a curation pipeline reads
    this to pick the score threshold that buys a target pass rate without
    running the gate on everything. ``pass_ppm`` is exact floor-ppm.

    Scale shape: per-batch (bin, pass) cells bounded by 2·n_bins →
    shared gated cell fold."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        bins = pc.min_element_wise(
            pc.divide(b.column("n_chars"), bin_width),
            pa.scalar(n_bins - 1, pa.int64()))
        ok = pc.greater_equal(pc.count_substring(b.column("text"), " "),
                              min_spaces)
        t = pa.table({"bin": pc.cast(bins, pa.int64()),
                      "p": pc.cast(ok, pa.int64())})
        g = t.group_by(["bin", "p"]).aggregate([("p", "count")])
        return pa.table({"bin": g.column("bin"), "p": g.column("p"),
                         "c": pc.cast(g.column("p_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["bin", "p"], sums=["c"],
                       block_gate=block_gate)
    rows = []
    if len(cells):
        piv = cells.pivot_table(index="bin", columns="p", values="c",
                                aggfunc="sum", fill_value=0).sort_index()
        for bin_, r in piv.iterrows():
            npass = int(r.get(1, 0))
            tot = npass + int(r.get(0, 0))
            rows.append((np.int64(bin_), np.int64(tot), np.int64(npass),
                         np.int64((npass * 1_000_000) // tot)))
    return pd.DataFrame(rows, columns=["bin", "n", "n_pass", "pass_ppm"])


CALIBRATION_BINS_SQL = """
WITH v AS (SELECT LEAST(n_chars // 200, 9) AS bin,
                  CAST(length(text) - length(replace(text, ' ', ''))
                       >= 50 AS BIGINT) AS p
           FROM documents)
SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(p) AS BIGINT) AS n_pass,
       CAST(sum(p) * 1000000 // count(*) AS BIGINT) AS pass_ppm
FROM v GROUP BY bin ORDER BY bin
"""


# ---- order-dependency audit: per-user timestamp inversions -------------------

def ts_inversions_users(sf_dir: str, n_buckets: int = 64):
    """One-row (n_pairs, n_inversions, n_users_affected) — the
    order-dependency audit: within each user's event stream ordered by
    ``event_id`` (insertion order), count adjacent pairs whose timestamp
    DECREASES — out-of-order arrivals that break any downstream
    sessionize/as-of assumption. The corpus-level sibling of the
    reference's per-value checks: an ordering invariant no single-row
    validator can see.

    Scale shape: ONE hash exchange of the three narrow columns on
    ``user_id % n_buckets`` (adjacency within a user crosses block
    boundaries, so co-location is REQUIRED, not an optimization); each
    bucket sorts its users once on the pandas C-path and emits one
    3-int summary row; the driver folds ≤ n_buckets rows."""
    from ..sources.parquet import read_parquet as _rp

    ev = _rp(f"{sf_dir}/events.parquet",
             columns=["event_id", "user_id", "ts"])
    mod = np.int64(n_buckets)

    def add_bucket(b: pa.Table) -> pa.Table:
        t = pa.table({"event_id": b.column("event_id"),
                      "user_id": b.column("user_id"),
                      "t": pc.cast(pc.cast(b.column("ts"),
                                           pa.timestamp("us")), pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array((u % mod).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["t"].shift(1)
        have = prev.notna().to_numpy()
        inv = have & (g["t"].to_numpy() < prev.fillna(0).to_numpy())
        aff = int(g.loc[inv, "user_id"].nunique())
        out = pd.DataFrame({"n_pairs": [np.int64(int(have.sum()))],
                            "n_inversions": [np.int64(int(inv.sum()))],
                            "n_users_affected": [np.int64(aff)]})
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    per = (ev.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__b").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    if not len(per):
        per = pd.DataFrame({"n_pairs": [0], "n_inversions": [0],
                            "n_users_affected": [0]})
    return pd.DataFrame({
        "n_pairs": pd.Series([int(per["n_pairs"].sum())], dtype=np.int64),
        "n_inversions": pd.Series([int(per["n_inversions"].sum())],
                                  dtype=np.int64),
        "n_users_affected": pd.Series([int(per["n_users_affected"].sum())],
                                      dtype=np.int64)})


TS_INVERSIONS_SQL = """
WITH w AS (SELECT user_id, epoch_us(ts) AS t,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY event_id) AS pt
           FROM events)
SELECT CAST(count(pt) AS BIGINT) AS n_pairs,
       CAST(count(*) FILTER (WHERE t < pt) AS BIGINT) AS n_inversions,
       CAST(count(DISTINCT CASE WHEN t < pt THEN user_id END)
            AS BIGINT) AS n_users_affected
FROM w
"""


# ---- Cochran-Armitage trend: gate pass-rate across ordered score bins --------

def cochran_armitage_length_gate(sf_dir: str, bin_width: int = 200,
                                 n_bins: int = 10, min_spaces: int = 50,
                                 block_gate: int = 512):
    """One-row (n_rows, n_pass, t_score, z2) — the Cochran-Armitage trend
    test over :func:`calibration_bins_documents`'s table: is the token-
    gate pass rate MONOTONICALLY associated with the length-score bin, or
    just unevenly scattered? (A calibration table can show variation that
    a trend test rejects as noise.) With bin scores w_i = i, per-bin
    totals n_i and passes s_i, N = Σn, R = Σs, T = Σw_i·s_i, Wn = Σw_i·n_i
    and Wn2 = Σw_i²·n_i, the squared trend statistic is ONE division of
    exact integers:

        z² = N·(N·T − R·Wn)² / (R·(N−R)·(N·Wn2 − Wn²))

    (0.0 when the denominator is 0 — all-pass, all-fail, or a single
    bin). HUGEINT-range at any SF (≤ ~1e21 at sf 0.1).

    Scale shape: the same (bin, pass) cells as the calibration table →
    shared gated cell fold; driver math is O(bins)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        bins = pc.min_element_wise(
            pc.divide(b.column("n_chars"), bin_width),
            pa.scalar(n_bins - 1, pa.int64()))
        ok = pc.greater_equal(pc.count_substring(b.column("text"), " "),
                              min_spaces)
        t = pa.table({"bin": pc.cast(bins, pa.int64()),
                      "p": pc.cast(ok, pa.int64())})
        g = t.group_by(["bin", "p"]).aggregate([("p", "count")])
        return pa.table({"bin": g.column("bin"), "p": g.column("p"),
                         "c": pc.cast(g.column("p_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["bin", "p"], sums=["c"],
                       block_gate=block_gate)
    n = r = t_sc = wn = wn2 = 0
    for row in (cells.itertuples(index=False) if len(cells) else ()):
        w, p, c = int(row.bin), int(row.p), int(row.c)
        n += c
        wn += w * c
        wn2 += w * w * c
        if p:
            r += c
            t_sc += w * c
    den = r * (n - r) * (n * wn2 - wn * wn)
    z2 = 0.0 if den == 0 else \
        float(n * (n * t_sc - r * wn) ** 2) / float(den)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype=np.int64),
        "n_pass": pd.Series([r], dtype=np.int64),
        "t_score": pd.Series([t_sc], dtype=np.int64),
        "z2": pd.Series([z2], dtype=np.float64)})


COCHRAN_ARMITAGE_SQL = """
WITH v AS (SELECT LEAST(n_chars // 200, 9) AS w,
                  CAST(length(text) - length(replace(text, ' ', ''))
                       >= 50 AS BIGINT) AS p
           FROM documents),
a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(p) AS HUGEINT) AS r,
             CAST(sum(w * p) AS HUGEINT) AS t,
             CAST(sum(w) AS HUGEINT) AS wn,
             CAST(sum(w * w) AS HUGEINT) AS wn2
      FROM v)
SELECT CAST(n AS BIGINT) AS n_rows, CAST(r AS BIGINT) AS n_pass,
       CAST(t AS BIGINT) AS t_score,
       CASE WHEN r * (n - r) * (n * wn2 - wn * wn) = 0 THEN 0.0
            ELSE CAST(n * (n * t - r * wn) * (n * t - r * wn) AS DOUBLE)
                 / CAST(r * (n - r) * (n * wn2 - wn * wn) AS DOUBLE)
       END AS z2
FROM a
"""


# ---- Chapman capture-recapture: distinct-content universe estimate -----------

def chapman_estimate_documents(sf_dir: str, block_gate: int = 512,
                               n_buckets: int = 64):
    """One-row (n_even_distinct, n_odd_distinct, overlap, chapman) — the
    Chapman capture-recapture estimator of the distinct-content universe:
    treat the even-doc_id and odd-doc_id halves as two independent
    "captures" of the underlying content population; contents seen in
    both are recaptures, and

        N̂ = ⌊(n1+1)·(n2+1)/(m+1)⌋ − 1

    estimates how many distinct contents EXIST (including ones this
    corpus never sampled) — the "how much of the web did we actually
    crawl" number, and a cross-check on dedup-rate extrapolations. All
    integer (floor division of nonnegative ints). Content identity is the
    md5-60bit prefix (engine-portable, same spelling as checksum.py).

    Scale shape: ONE scan; per-batch (h, e, o) flag rows pre-deduped
    within the batch; under the block gate the pairs gather driver-side;
    past it they hash-exchange on h's bucket (h determines its bucket, so
    per-bucket OR-folds + counts are globally correct) and only 3-int
    rows gather."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.checksum import _row_hashes

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        h = _row_hashes(txt.to_pylist())
        par = (b.column("doc_id").to_numpy(zero_copy_only=False)
               .astype(np.int64) % 2)
        df = pd.DataFrame({"h": h, "e": (par == 0).astype(np.int64),
                           "o": par})
        agg = df.groupby("h", as_index=False)[["e", "o"]].max()
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h")[["e", "o"]].max()
        return pd.DataFrame({
            "n1": [np.int64(int(g["e"].sum()))],
            "n2": [np.int64(int(g["o"].sum()))],
            "m": [np.int64(int((g["e"] * g["o"]).sum()))]})

    parts_ds = scan.map_batches(partial)
    if scan.num_blocks() <= block_gate:
        parts = parts_ds.to_pandas()
        per = _reduce(parts) if len(parts) else \
            pd.DataFrame({"n1": [0], "n2": [0], "m": [0]})
    else:
        mod = np.int64(n_buckets)

        def add_bucket(t: pa.Table) -> pa.Table:
            h = t.column("h").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__b", pa.array((h % mod).astype(np.int32)))

        def per_bucket(g: pd.DataFrame) -> pa.Table:
            out = _reduce(g.drop(columns="__b"))
            return pa.Table.from_pandas(out, preserve_index=False) \
                .replace_schema_metadata(None)

        per = (parts_ds.map_batches(add_bucket, batch_format="pyarrow")
               .groupby("__b").map_groups(per_bucket,
                                          batch_format="pandas")
               .to_pandas())
        per = pd.DataFrame({c: [per[c].sum()] for c in ("n1", "n2", "m")})
    n1, n2, m = (int(per[c].iloc[0]) for c in ("n1", "n2", "m"))
    chapman = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    return pd.DataFrame({
        "n_even_distinct": pd.Series([n1], dtype=np.int64),
        "n_odd_distinct": pd.Series([n2], dtype=np.int64),
        "overlap": pd.Series([m], dtype=np.int64),
        "chapman": pd.Series([chapman], dtype=np.int64)})


CHAPMAN_SQL = """
WITH h AS (SELECT substr(md5(text), 1, 15) AS h,
                  CAST(max(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS e,
                  CAST(max(doc_id % 2) AS BIGINT) AS o
           FROM documents GROUP BY 1),
a AS (SELECT CAST(COALESCE(sum(e), 0) AS BIGINT) AS n1,
             CAST(COALESCE(sum(o), 0) AS BIGINT) AS n2,
             CAST(COALESCE(sum(e * o), 0) AS BIGINT) AS m
      FROM h)
SELECT n1 AS n_even_distinct, n2 AS n_odd_distinct, m AS overlap,
       (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS chapman
FROM a
"""



# ---- Gini decision stump: best length split separating languages -------------

def gini_stump_length_lang(sf_dir: str, block_gate: int = 512):
    """One-row (threshold, n_left, n_right, score, weighted_gini) — the
    best single split of documents by length (``n_chars ≤ threshold``)
    that separates the languages, by weighted Gini impurity: the
    decision-stump / split-finding primitive of tree learners, run as a
    corpus diagnostic (how much language signal one length threshold
    captures). Exactness: per-threshold left/right per-lang counts come
    from cumulative sums over the (lang, v) cell histogram — all exact
    integers — and the maximized purity score

        score(t) = A_L/T_L + A_R/T_R,   A = Σ_lang c_lang²

    is TWO divisions + one add of exact-int doubles, bitwise equal in
    both engines, so ``ORDER BY score DESC, threshold`` selects the same
    split (first-max tiebreak); weighted_gini = 1 − score/T is one more
    shared step. The last distinct value is excluded (empty right side).

    Scale shape: (lang, v) cells → shared gated cell fold; the threshold
    sweep is one vectorized pass over distinct values."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "threshold": pd.Series([], dtype=np.int64),
        "n_left": pd.Series([], dtype=np.int64),
        "n_right": pd.Series([], dtype=np.int64),
        "score": pd.Series([], dtype=np.float64),
        "weighted_gini": pd.Series([], dtype=np.float64)})
    if not len(cells):
        return empty
    piv = cells.pivot_table(index="v", columns="lang", values="c",
                            aggfunc="sum", fill_value=0).sort_index()
    cum = piv.to_numpy(np.int64).cumsum(axis=0)      # (v, lang)
    tot = cum[-1]
    t_all = int(tot.sum())
    if len(piv) < 2:
        return empty
    cum = cum[:-1]                                   # drop empty-right split
    tl = cum.sum(axis=1)
    tr = t_all - tl
    # Python-int squares: cum² overflows int64 past ~3e9 rows per lang
    # (the SQL side is HUGEINT); float conversion rounds identically
    al = (cum.astype(object) ** 2).sum(axis=1)
    ar = ((tot[None, :].astype(object) - cum) ** 2).sum(axis=1)
    score = np.array([float(x) for x in al]) / tl.astype(np.float64) \
        + np.array([float(x) for x in ar]) / tr.astype(np.float64)
    i = int(np.argmax(score))                        # first max = min v
    wg = 1.0 - score[i] / float(t_all)
    return pd.DataFrame({
        "threshold": pd.Series([int(piv.index[i])], dtype=np.int64),
        "n_left": pd.Series([int(tl[i])], dtype=np.int64),
        "n_right": pd.Series([int(tr[i])], dtype=np.int64),
        "score": pd.Series([float(score[i])], dtype=np.float64),
        "weighted_gini": pd.Series([wg], dtype=np.float64)})


GINI_STUMP_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
g AS (SELECT vv.v, ll.lang, COALESCE(c.c, 0) AS c
      FROM (SELECT DISTINCT v FROM c) vv
      CROSS JOIN (SELECT DISTINCT lang FROM c) ll
      LEFT JOIN c ON c.v = vv.v AND c.lang = ll.lang),
w AS (SELECT v, lang,
             CAST(sum(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT)
               AS cum
      FROM g),
tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM c GROUP BY 1),
pv AS (SELECT w.v,
              CAST(sum(CAST(w.cum AS HUGEINT) * w.cum) AS HUGEINT) AS al,
              CAST(sum(w.cum) AS BIGINT) AS tl,
              CAST(sum(CAST(tot.t - w.cum AS HUGEINT)
                       * (tot.t - w.cum)) AS HUGEINT) AS ar,
              CAST(sum(tot.t - w.cum) AS BIGINT) AS tr
       FROM w JOIN tot USING (lang) GROUP BY w.v),
sc AS (SELECT v, tl, tr,
              CAST(al AS DOUBLE) / CAST(tl AS DOUBLE)
              + CAST(ar AS DOUBLE) / CAST(tr AS DOUBLE) AS score
       FROM pv WHERE tr > 0)
SELECT v AS threshold, tl AS n_left, tr AS n_right, score,
       1.0 - score / CAST(tl + tr AS DOUBLE) AS weighted_gini
FROM sc ORDER BY score DESC, v LIMIT 1
"""



# ---- Matthews correlation between the two quality gates ----------------------

def mcc_gates_documents(sf_dir: str, min_chars: int = 300,
                        min_periods: int = 3, block_gate: int = 512):
    """One-row (n_both, n_only_len, n_only_sent, n_neither, mcc) — the
    Matthews correlation coefficient between the LENGTH gate (n_chars ≥
    min_chars) and the SENTENCE gate ('.' count ≥ min_periods): the
    balanced agreement score that, unlike raw accuracy or kappa on
    skewed gates, stays honest when one gate passes almost everything.
    With confusion cells (a = both, b = length only, c = sentence only,
    d = neither),

        MCC = (a·d − b·c) / √((a+b)·(a+c)·(b+d)·(c+d))

    — numerator and the product under the root are exact integers
    (Python ints driver-side — the product is ~n⁴ and overflows int64;
    HUGEINT in SQL), one division + one sqrt, bitwise cross-engine (0.0
    when any margin is empty). Completes the gate-agreement family:
    kappa (chance-corrected), McNemar (disagreement direction), MCC
    (balanced correlation).

    Scale shape: per-batch 4-cell confusion partials → shared gated cell
    fold; driver math is O(1)."""
    import math

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g1 = pc.greater_equal(b.column("n_chars"), min_chars)
        g2 = pc.greater_equal(pc.count_substring(b.column("text"), "."),
                              min_periods)
        t = pa.table({"g1": pc.cast(g1, pa.int64()),
                      "g2": pc.cast(g2, pa.int64())})
        g = t.group_by(["g1", "g2"]).aggregate([("g1", "count")])
        return pa.table({"g1": g.column("g1"), "g2": g.column("g2"),
                         "c": pc.cast(g.column("g1_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["g1", "g2"], sums=["c"],
                       block_gate=block_gate)
    cnt = {(int(r.g1), int(r.g2)): int(r.c)
           for r in (cells.itertuples(index=False) if len(cells) else ())}
    a = cnt.get((1, 1), 0)
    b_ = cnt.get((1, 0), 0)
    c_ = cnt.get((0, 1), 0)
    d_ = cnt.get((0, 0), 0)
    prod = (a + b_) * (a + c_) * (b_ + d_) * (c_ + d_)
    mcc = 0.0 if prod == 0 else \
        float(a * d_ - b_ * c_) / math.sqrt(float(prod))
    return pd.DataFrame({
        "n_both": pd.Series([a], dtype=np.int64),
        "n_only_len": pd.Series([b_], dtype=np.int64),
        "n_only_sent": pd.Series([c_], dtype=np.int64),
        "n_neither": pd.Series([d_], dtype=np.int64),
        "mcc": pd.Series([mcc], dtype=np.float64)})


MCC_GATES_SQL = """
WITH g AS (SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS g1,
                  CASE WHEN length(text) - length(replace(text, '.', ''))
                            >= 3 THEN 1 ELSE 0 END AS g2
           FROM documents),
c AS (SELECT
        CAST(COALESCE(sum(CASE WHEN g1 = 1 AND g2 = 1 THEN 1 END), 0)
             AS HUGEINT) AS a,
        CAST(COALESCE(sum(CASE WHEN g1 = 1 AND g2 = 0 THEN 1 END), 0)
             AS HUGEINT) AS b,
        CAST(COALESCE(sum(CASE WHEN g1 = 0 AND g2 = 1 THEN 1 END), 0)
             AS HUGEINT) AS cc,
        CAST(COALESCE(sum(CASE WHEN g1 = 0 AND g2 = 0 THEN 1 END), 0)
             AS HUGEINT) AS d
      FROM g)
SELECT CAST(a AS BIGINT) AS n_both,
       CAST(b AS BIGINT) AS n_only_len,
       CAST(cc AS BIGINT) AS n_only_sent,
       CAST(d AS BIGINT) AS n_neither,
       CASE WHEN (a + b) * (a + cc) * (b + d) * (cc + d) = 0 THEN 0.0
            ELSE CAST(a * d - b * cc AS DOUBLE)
                 / sqrt(CAST((a + b) * (a + cc) * (b + d) * (cc + d)
                             AS DOUBLE))
       END AS mcc
FROM c
"""


# ---- per-language odds ratios between the quality gates ----------------------

def odds_ratio_gates_by_lang(sf_dir: str, min_chars: int = 300,
                             min_periods: int = 3, block_gate: int = 512):
    """(lang, n_both, n_only_len, n_only_sent, n_neither, odds_ratio) —
    the per-language odds ratio between the LENGTH gate and the SENTENCE
    gate (the STRATIFIED view of :func:`mcc_gates_documents`: a pooled
    association can invert per stratum — Simpson's pattern — and the
    per-lang ORs expose it). OR = (a·d)/(b·c), ONE division of exact
    integer products per language (0.0 when b·c = 0 — a degenerate
    margin, reported raw so the caller sees the cells).

    Scale shape: per-batch (lang, g1, g2) confusion partials — langs ×
    4 cells → shared gated cell fold; driver math is O(langs)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g1 = pc.greater_equal(b.column("n_chars"), min_chars)
        g2 = pc.greater_equal(pc.count_substring(b.column("text"), "."),
                              min_periods)
        t = pa.table({"lang": b.column("lang"),
                      "g1": pc.cast(g1, pa.int64()),
                      "g2": pc.cast(g2, pa.int64())})
        g = t.group_by(["lang", "g1", "g2"]).aggregate([("g1", "count")])
        return pa.table({"lang": g.column("lang"),
                         "g1": g.column("g1"), "g2": g.column("g2"),
                         "c": pc.cast(g.column("g1_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "g1", "g2"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "lang": pd.Series([], dtype=object),
        "n_both": pd.Series([], dtype=np.int64),
        "n_only_len": pd.Series([], dtype=np.int64),
        "n_only_sent": pd.Series([], dtype=np.int64),
        "n_neither": pd.Series([], dtype=np.int64),
        "odds_ratio": pd.Series([], dtype=np.float64)})
    if not len(cells):
        return empty
    rows = []
    for lang, g in cells.groupby("lang"):
        cnt = {(int(r.g1), int(r.g2)): int(r.c)
               for r in g.itertuples(index=False)}
        a = cnt.get((1, 1), 0)
        b_ = cnt.get((1, 0), 0)
        c_ = cnt.get((0, 1), 0)
        d_ = cnt.get((0, 0), 0)
        orr = 0.0 if b_ * c_ == 0 else float(a * d_) / float(b_ * c_)
        rows.append((str(lang), a, b_, c_, d_, orr))
    out = pd.DataFrame(rows, columns=["lang", "n_both", "n_only_len",
                                      "n_only_sent", "n_neither",
                                      "odds_ratio"])
    for col in ("n_both", "n_only_len", "n_only_sent", "n_neither"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


ODDS_RATIO_GATES_SQL = """
WITH g AS (SELECT lang,
                  CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS g1,
                  CASE WHEN length(text) - length(replace(text, '.', ''))
                            >= 3 THEN 1 ELSE 0 END AS g2
           FROM documents),
c AS (SELECT lang,
        CAST(COALESCE(sum(CASE WHEN g1 = 1 AND g2 = 1 THEN 1 END), 0)
             AS HUGEINT) AS a,
        CAST(COALESCE(sum(CASE WHEN g1 = 1 AND g2 = 0 THEN 1 END), 0)
             AS HUGEINT) AS b,
        CAST(COALESCE(sum(CASE WHEN g1 = 0 AND g2 = 1 THEN 1 END), 0)
             AS HUGEINT) AS cc,
        CAST(COALESCE(sum(CASE WHEN g1 = 0 AND g2 = 0 THEN 1 END), 0)
             AS HUGEINT) AS d
      FROM g GROUP BY lang)
SELECT lang,
       CAST(a AS BIGINT) AS n_both,
       CAST(b AS BIGINT) AS n_only_len,
       CAST(cc AS BIGINT) AS n_only_sent,
       CAST(d AS BIGINT) AS n_neither,
       CASE WHEN b * cc = 0 THEN 0.0
            ELSE CAST(a * d AS DOUBLE) / CAST(b * cc AS DOUBLE)
       END AS odds_ratio
FROM c ORDER BY lang
"""


# ---- coefficient of unalikeability: categorical dispersion -------------------

def unalikeability_lang_by_source(sf_dir: str, block_gate: int = 512):
    """(source, n, n_langs, u) — the coefficient of unalikeability of the
    language mix within each source: the probability two random documents
    of the source differ in language, u = 1 − Σp_i² = (T² − Σc_i²)/T² —
    the CATEGORICAL dispersion measure (variance has no meaning on
    nominal labels; u is its nominal-scale replacement, the complement
    of the Gini-Simpson index' matching probability). ONE division of
    exact integers per source (Python ints driver-side, HUGEINT in SQL;
    0.0 when T < 2... T = 0 sources cannot appear).

    Scale shape: (source, lang) cells are vocabulary-bounded → shared
    gated cell fold; driver math is O(cells)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([("lang", "count")])
        return pa.table({"source": g.column("source"),
                         "lang": g.column("lang"),
                         "c": pc.cast(g.column("lang_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["source", "lang"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({
        "source": pd.Series([], dtype=object),
        "n": pd.Series([], dtype=np.int64),
        "n_langs": pd.Series([], dtype=np.int64),
        "u": pd.Series([], dtype=np.float64)})
    if not len(cells):
        return empty
    rows = []
    for src, g in cells.groupby("source"):
        cs = [int(x) for x in g["c"].tolist()]
        t = sum(cs)
        s2 = sum(c * c for c in cs)
        u = 0.0 if t < 2 else float(t * t - s2) / float(t * t)
        rows.append((str(src), t, len(cs), u))
    out = pd.DataFrame(rows, columns=["source", "n", "n_langs", "u"])
    out["n"] = out["n"].astype(np.int64)
    out["n_langs"] = out["n_langs"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


UNALIKEABILITY_SQL = """
WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
a AS (SELECT source, CAST(sum(c) AS HUGEINT) AS t,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
             CAST(count(*) AS BIGINT) AS k
      FROM c GROUP BY 1)
SELECT source, CAST(t AS BIGINT) AS n, k AS n_langs,
       CASE WHEN t < 2 THEN 0.0
            ELSE CAST(t * t - s2 AS DOUBLE) / CAST(t * t AS DOUBLE)
       END AS u
FROM a ORDER BY source
"""
