"""Table-level check queries over the testdata tables, each with a DuckDB
oracle (driver correctness gate).

These exercise the wide/table-scale operators: two-phase groupby-count
uniqueness, broadcast-dictionary referential checks, FK anti-join with a
broadcast dimension side, and exact column statistics via partial/final
aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.parquet import read_parquet
from ..functions.iso639 import ISO_639_1
from ..stages.referential import fk_violations, referential_violations
from ..stages.stats import column_stats
from ..stages.uniqueness import duplicate_keys

# ---- uniqueness -----------------------------------------------------------


def dup_orders_custkey(sf_dir: str):
    """Customers with more than one order — two-phase groupby-count
    (per-batch combiner, then Sum over partials)."""
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    return duplicate_keys(orders, "o_custkey")


DUP_ORDERS_SQL = """
SELECT o_custkey, count(*) AS dup_count
FROM orders GROUP BY o_custkey HAVING count(*) > 1
"""

# ---- referential: dictionary ---------------------------------------------

_LANG_SUBSET = ["en", "de", "fr", "es"]


def referential_lang(sf_dir: str):
    """Documents whose lang is outside a restricted dictionary (the broadcast
    anti-semi-join path; the full ISO-639 set yields zero rows on the clean
    corpus so the fixture narrows the dictionary)."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])
    return referential_violations(docs, "lang", "doc_id", _LANG_SUBSET,
                                  constraint_id="referential:lang")


REFERENTIAL_LANG_SQL = """
SELECT doc_id, lang, 'referential:lang' AS constraint_id
FROM documents
WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')
"""


def referential_lang_iso639(sf_dir: str):
    """Full ISO-639-1 dictionary check, reported as a one-row summary
    (always non-empty, so the oracle compare is schema-stable even when the
    corpus is clean and the violation set is empty)."""
    docs = read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])
    n = referential_violations(docs, "lang", "doc_id", ISO_639_1).count()
    import pandas as pd

    return pd.DataFrame([{"constraint_id": "referential:lang",
                          "violation_count": n}])


REFERENTIAL_ISO_SQL = (
    "SELECT 'referential:lang' AS constraint_id, count(*) AS violation_count "
    "FROM documents WHERE lang IS NOT NULL AND lang NOT IN ("
    + ",".join(f"'{c}'" for c in ISO_639_1) + ")"
)

# ---- referential: foreign key --------------------------------------------


def fk_orders_custkey(sf_dir: str):
    """FK check orders.o_custkey ⊆ customer.c_custkey with the dimension side
    restricted (so the check fires): broadcast the small side's key set, anti
    join inside map_batches."""
    from ..sources.parquet import FusedParquetScan

    # fact-side probe fuses into the read (map-only broadcast anti-join)
    orders = FusedParquetScan(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"])
    dim = read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey"]) \
                  .filter(expr="c_custkey <= 100")
    return fk_violations(orders, "o_orderkey", "o_custkey", dim, "c_custkey",
                         constraint_id="referential:o_custkey")


FK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, 'referential:o_custkey' AS constraint_id
FROM orders
WHERE o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey <= 100)
"""

# ---- column stats (exact fields only; sketches tested in pytest) ----------

_STATS_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _exact_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch exact partial: count/nulls/min/max plus an INTEGER cents sum
    (values here carry ≤2 decimals), so the global mean is exact rational
    arithmetic — identical in Ray and the SQL oracle, immune to float
    accumulation-order differences."""
    import pyarrow.compute as pc

    rows = {"column": [], "cnt": [], "nulls": [], "min_num": [],
            "max_num": [], "sum_cents": []}
    for name in batch.column_names:
        col = batch.column(name)
        valid = col.drop_null()
        rows["column"].append(name)
        rows["cnt"].append(len(col))
        rows["nulls"].append(col.null_count)
        rows["min_num"].append(pc.min(valid).as_py() if len(valid) else None)
        rows["max_num"].append(pc.max(valid).as_py() if len(valid) else None)
        cents = pc.cast(pc.round(pc.multiply(pc.cast(valid, pa.float64()), 100)),
                        pa.int64())
        rows["sum_cents"].append(pc.sum(cents).as_py() if len(valid) else 0)
    return pa.table({k: pa.array(v) for k, v in rows.items()})


def stats_exact_lineitem(sf_dir: str):
    """Exact per-column stats (count/nulls/min/max/mean) via partial+final
    aggregation. Mean is computed from integer cents sums (exact) then
    rounded, so it hashes identically against the SQL oracle."""
    import pandas as pd

    li = read_parquet(f"{sf_dir}/lineitem.parquet", columns=_STATS_COLS)
    partials = li.map_batches(_exact_stats_partial, batch_format="pyarrow") \
                 .to_pandas()
    g = partials.groupby("column")
    out = pd.DataFrame({
        "cnt": g["cnt"].sum(),
        "nulls": g["nulls"].sum(),
        "min_num": g["min_num"].min(),
        "max_num": g["max_num"].max(),
        "sum_cents": g["sum_cents"].sum(),
    }).reset_index()
    nonnull = out["cnt"] - out["nulls"]
    # mean scaled to 1e-4 units via pure int64 floor division — identical
    # arithmetic in Ray and SQL (float rounding of a .5 tie differs between
    # numpy's half-to-even and SQL's half-away; integers cannot tie)
    out["mean_e4"] = (out["sum_cents"] * 100 // nonnull).astype("int64")
    out = out.drop(columns=["sum_cents"])
    return out.sort_values("column").reset_index(drop=True)


STATS_EXACT_SQL = """
SELECT * FROM (
  SELECT 'l_quantity' AS "column", count(*) AS cnt,
         count(*) - count(l_quantity) AS nulls,
         CAST(min(l_quantity) AS DOUBLE) AS min_num,
         CAST(max(l_quantity) AS DOUBLE) AS max_num,
         CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) * 100 // count(l_quantity) AS BIGINT) AS mean_e4
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
         CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE),
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) * 100 // count(l_extendedprice) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', count(*), count(*) - count(l_discount),
         CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
         CAST(sum(CAST(round(l_discount*100) AS BIGINT)) * 100 // count(l_discount) AS BIGINT)
  FROM lineitem
) ORDER BY "column"
"""

# ---- exact distributed quantiles (order statistics without a sort) --------

_QUANTILE_QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def quantiles_lineitem(sf_dir: str):
    """(q, value) — EXACT discrete quantiles of l_extendedprice via the
    histogram-refinement stage (stages/quantiles.exact_quantiles): two
    streaming count passes + per-rank bin gathers instead of a full
    distributed sort; skewed bins refine recursively, so driver memory is
    bounded by ``gather_limit`` regardless of corpus size. quantile_disc
    semantics (rank ceil(q·n)−1) return an actual data element, so the
    float compares exactly against DuckDB."""
    import pandas as pd

    from ..stages.quantiles import exact_quantiles

    from ..sources.parquet import FusedParquetScan

    # every refinement pass re-scans the column: hand the stage a fused
    # multi-pass source so each pass reads+computes in the same tasks
    li = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                          columns=["l_extendedprice"])
    got = exact_quantiles(li, "l_extendedprice", _QUANTILE_QS)
    return pd.DataFrame({"q": _QUANTILE_QS,
                         "value": [got[q] for q in _QUANTILE_QS]})


QUANTILES_SQL = "\nUNION ALL\n".join(
    f"SELECT CAST({q} AS DOUBLE) AS q, "
    f"CAST(quantile_disc(l_extendedprice, {q}) AS DOUBLE) AS value "
    f"FROM lineitem"
    for q in _QUANTILE_QS)

def mad_lineitem(sf_dir: str):
    """(median, mad) — exact median absolute deviation of
    l_extendedprice, the robust dispersion statistic: pass 1 finds the
    exact discrete median via histogram refinement; pass 2 runs the same
    stage over the DERIVED column ``|x − median|``, fused into the read
    by TransformedScan so the deviation column is never materialized.
    Both medians are actual data elements (quantile_disc rank
    ceil(0.5·n)−1) and the absolute deviations are single IEEE-754
    subtractions, so the floats compare exactly against DuckDB."""
    import pandas as pd

    from ..sources.parquet import FusedParquetScan, TransformedScan
    from ..stages.quantiles import exact_quantiles

    li = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                          columns=["l_extendedprice"])
    med = exact_quantiles(li, "l_extendedprice", [0.5])[0.5]

    def absdev(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column("l_extendedprice"), pa.float64())
        return pa.table({"absdev": pc.abs(pc.subtract(v, med))})

    mad = exact_quantiles(TransformedScan(li, absdev), "absdev", [0.5])[0.5]
    return pd.DataFrame({"median": [med], "mad": [mad]})


MAD_SQL = """
WITH m AS (SELECT quantile_disc(l_extendedprice, 0.5) AS med FROM lineitem)
SELECT CAST(m.med AS DOUBLE) AS median,
       CAST(quantile_disc(abs(l_extendedprice - m.med), 0.5) AS DOUBLE)
           AS mad
FROM lineitem, m
GROUP BY m.med
"""


def trim_outliers_documents(sf_dir: str):
    """(doc_id) — documents whose ``n_chars`` lies inside the exact
    [p05, p95] band: the quantile thresholds come from the distributed
    exact-quantile stage (two streaming count passes), then one vectorized
    filter pass — the length-outlier trim step of corpus curation, with the
    cut points exactly reproducible in SQL."""
    from ..stages.quantiles import exact_quantiles

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"])
    q = exact_quantiles(docs, "n_chars", [0.05, 0.95])
    lo, hi = q[0.05], q[0.95]

    def keep(b: pa.Table) -> pa.Table:
        c = pc.cast(b.column("n_chars"), pa.float64())
        m = pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        return pa.table({"doc_id": b.column("doc_id").filter(
            pc.fill_null(m, False))})

    return docs.map_batches(keep, batch_format="pyarrow")


TRIM_OUTLIERS_SQL = """
SELECT doc_id FROM documents
WHERE n_chars BETWEEN (SELECT quantile_disc(n_chars, 0.05) FROM documents)
              AND     (SELECT quantile_disc(n_chars, 0.95) FROM documents)
"""

# ---- sketch stats (rows-only: no SQL oracle; accuracy pinned in pytest) ---


def stats_sketch_documents(sf_dir: str):
    """Full stats row per documents column, incl. HLL distinct estimate and
    t-digest quantiles (sketch outputs — accuracy-bounded, not
    SQL-reproducible)."""
    docs = read_parquet(f"{sf_dir}/documents.parquet")
    out = column_stats(docs, ["doc_id", "text", "lang", "n_chars"]).to_pandas()
    return out[["column", "cnt", "nulls", "null_rate", "distinct_est",
                "p50", "p95", "p99"]].sort_values("column").reset_index(drop=True)


def stats_incremental_documents(sf_dir: str):
    """Incremental profiling THROUGH the persisted sketch state
    (stages/statestore): even doc_ids are profiled once into generation 0,
    odd doc_ids are folded in as a later ingest (one pass over the new rows
    only — the history is never re-read), then the state is finalized.
    Returns ONLY the exact-monoid columns (count/null/min/max compose
    associatively, so the incremental result is arithmetic-identical to a
    one-shot profile of the union — which is what the SQL oracle computes
    over the full table)."""
    import os
    import shutil
    import tempfile

    from ..stages.statestore import (finalize_stats, update_stats_state,
                                     write_stats_state)

    cols = ["doc_id", "lang", "n_chars", "text"]
    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    def split(b: pa.Table, parity: int) -> pa.Table:
        return b.filter(pc.equal(pc.bit_wise_and(b.column("doc_id"), 1),
                                 parity))

    path = os.path.join(tempfile.gettempdir(),
                        f"stats_state_{abs(hash(sf_dir)) % 10**8}")
    shutil.rmtree(path, ignore_errors=True)
    write_stats_state(docs.map_batches(lambda b: split(b, 0),
                                       batch_format="pyarrow"), path, cols)
    update_stats_state(docs.map_batches(lambda b: split(b, 1),
                                        batch_format="pyarrow"), path)
    out = finalize_stats(path)[["column", "cnt", "nulls", "null_rate",
                                "min_num", "max_num", "min_str", "max_str"]]
    return out.rename(columns={"column": "col_name"}) \
        .sort_values("col_name").reset_index(drop=True)


STATS_INCR_SQL = """
SELECT * FROM (
  SELECT 'doc_id' AS col_name, count(*) AS cnt,
         count(*) - count(doc_id) AS nulls,
         CAST(count(*) - count(doc_id) AS DOUBLE) / count(*) AS null_rate,
         CAST(min(doc_id) AS DOUBLE) AS min_num,
         CAST(max(doc_id) AS DOUBLE) AS max_num,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM documents
  UNION ALL
  SELECT 'lang', count(*), count(*) - count(lang),
         CAST(count(*) - count(lang) AS DOUBLE) / count(*),
         NULL, NULL, min(lang), max(lang)
  FROM documents
  UNION ALL
  SELECT 'n_chars', count(*), count(*) - count(n_chars),
         CAST(count(*) - count(n_chars) AS DOUBLE) / count(*),
         CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),
         NULL, NULL
  FROM documents
  UNION ALL
  SELECT 'text', count(*), count(*) - count(text),
         CAST(count(*) - count(text) AS DOUBLE) / count(*),
         NULL, NULL, min(text), max(text)
  FROM documents
) ORDER BY col_name
"""


# ---- cross-column row rules ----------------------------------------------

_LINEITEM_RULES = [
    {"id": "discount_le_tax", "left": "l_discount", "op": "le",
     "right": "l_tax"},
    {"id": "qty_positive", "left": "l_quantity", "op": "gt",
     "right": {"const": 0.0}},
    {"id": "price_ge_qty", "left": "l_extendedprice", "op": "ge",
     "right": "l_quantity"},
]


def rowrules_lineitem(sf_dir: str):
    """(l_orderkey, l_linenumber, constraint_id) — cross-column comparator
    rules over lineitem (stages/rowrules.py): the reference's eq/ne/gt/…
    comparators lifted to column-vs-column table invariants. Floats are
    compared, never accumulated, so verdicts are arithmetic-identical to
    the SQL oracle."""
    from ..sources.parquet import fused_map_parquet
    from ..stages.rowrules import RowRuleValidator

    return fused_map_parquet(
        f"{sf_dir}/lineitem.parquet",
        RowRuleValidator(_LINEITEM_RULES, ["l_orderkey", "l_linenumber"]),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
        batch_size=65536)


ROWRULES_SQL = """
SELECT l_orderkey, l_linenumber, 'discount_le_tax' AS constraint_id
FROM lineitem WHERE NOT (l_discount <= l_tax)
UNION ALL
SELECT l_orderkey, l_linenumber, 'qty_positive'
FROM lineitem WHERE NOT (l_quantity > 0)
UNION ALL
SELECT l_orderkey, l_linenumber, 'price_ge_qty'
FROM lineitem WHERE NOT (l_extendedprice >= l_quantity)
"""


# ---- schema inference ------------------------------------------------------


def inferred_schema_documents(sf_dir: str):
    """One profile row per documents column from the schema-inference stage
    (stages/infer.py): JSON-schema type, required (zero nulls), capped
    distinct count (17 = over the 16-value enum cap), numeric min/max,
    BYTE-length min/max. min/max are exact comparisons (never accumulated),
    so doubles match the SQL oracle bit-for-bit."""
    import pandas as pd

    from ..stages.infer import _prop_from_profile, column_profiles

    docs = read_parquet(f"{sf_dir}/documents.parquet")
    prof = column_profiles(docs).to_pandas()
    rows = []
    for _, r in prof.iterrows():
        # integer bounds live in the exact min_int/max_int channel
        # (float64 would round past 2^53); this DISPLAY query funnels
        # them into the double min_num column, same as the SQL oracle's
        # CAST(MIN(col) AS DOUBLE)
        mn = r["min_num"] if not pd.isna(r["min_num"]) else r["min_int"]
        mx = r["max_num"] if not pd.isna(r["max_num"]) else r["max_int"]
        rows.append({
            "column": r["column"],
            "jtype": _prop_from_profile(r, 16).get("type"),
            "required": bool(r["nulls"] == 0),
            "n_distinct_capped": int(r["n_distinct_capped"]),
            "min_num": mn,
            "max_num": mx,
            "min_len": None if pd.isna(r["min_len"]) else int(r["min_len"]),
            "max_len": None if pd.isna(r["max_len"]) else int(r["max_len"]),
        })
    out = pd.DataFrame(rows).sort_values("column").reset_index(drop=True)
    out["min_num"] = out["min_num"].astype(float)
    out["max_num"] = out["max_num"].astype(float)
    # float64 (not nullable Int64): the SQL side's NULL-padded lengths
    # come back as doubles, and the gate compares dtype-sensitively
    out["min_len"] = out["min_len"].astype(float)
    out["max_len"] = out["max_len"].astype(float)
    return out


def _infer_col_sql(col: str, jtype: str) -> str:
    if jtype == "integer":
        num = (f"CAST(MIN({col}) AS DOUBLE) AS min_num, "
               f"CAST(MAX({col}) AS DOUBLE) AS max_num, "
               "CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len")
    else:
        num = ("CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
               f"MIN(strlen({col})) AS min_len, MAX(strlen({col})) AS max_len")
    return (f"SELECT '{col}' AS column, '{jtype}' AS jtype, "
            f"COUNT(*) = COUNT({col}) AS required, "
            f"LEAST(COUNT(DISTINCT {col}), 17) AS n_distinct_capped, {num} "
            "FROM documents")


INFERRED_SCHEMA_SQL = " UNION ALL ".join([
    _infer_col_sql("doc_id", "integer"),
    _infer_col_sql("text", "string"),
    _infer_col_sql("lang", "string"),
    _infer_col_sql("source", "string"),
    _infer_col_sql("n_chars", "integer"),
])


# ---- KS two-sample drift ---------------------------------------------------


def ks_quantity_returnflag(sf_dir: str):
    """Exact KS statistic between l_quantity distributions of returnflag
    'A' vs 'R' rows (stages/ks.py): integer cross-multiplied numerator,
    so the result is bit-identical to the SQL window-function oracle."""
    from ..stages.ks import ks_two_sample

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_quantity", "l_returnflag"])
    out = ks_two_sample(li, "l_quantity", "l_returnflag", "A", "R")
    return out[["d_num", "n_a", "n_b"]]


KS_QUANTITY_SQL = """
WITH c AS (
  SELECT l_quantity AS v,
         COUNT(*) FILTER (WHERE l_returnflag = 'A') AS na,
         COUNT(*) FILTER (WHERE l_returnflag = 'R') AS nb
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R')
  GROUP BY 1),
t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM c),
cum AS (SELECT SUM(na) OVER (ORDER BY v) AS ca,
               SUM(nb) OVER (ORDER BY v) AS cb FROM c)
SELECT CAST(MAX(ABS(ca * t.tb - cb * t.ta)) AS BIGINT) AS d_num,
       CAST(t.ta AS BIGINT) AS n_a, CAST(t.tb AS BIGINT) AS n_b
FROM cum, t GROUP BY t.ta, t.tb
"""


def psi_lang_documents(sf_dir: str):
    """(lang, n_base, n_cur, psi_contrib) — PSI drift check of the ``lang``
    distribution between the even-doc_id half (baseline) and the odd half
    (current), through the DISTRIBUTED histogram machinery
    (stages/drift.compute_histogram: per-batch partial histograms merged by
    addition). Emitting the per-BIN PSI contribution instead of the summed
    index keeps the floats oracle-exact: each contribution is a pure
    expression of two integer counts (int/int division, ``max(·, 1e-6)``
    clamp, one libm ``ln``, one multiply — all bit-identical in DuckDB),
    with no float accumulation whose summation order could diverge. The
    total PSI is the oracle-checked column's sum; the ``drift_check``
    facade applies the 0.25 threshold to it."""
    import math

    import pandas as pd

    from ..stages.drift import compute_histogram
    from ..state.histogram import CategoricalHistogram

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])
    langs = sorted(x for x in docs.unique("lang") if x is not None)
    base_json = CategoricalHistogram(langs).to_json()

    def half(parity: int):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(b.column("doc_id"),
                                         pa.scalar(1, pa.int64())),
                         pa.scalar(parity, pa.int64()))
            return b.filter(pc.fill_null(m, False))
        return fn

    baseline = compute_histogram(
        docs.map_batches(half(0), batch_format="pyarrow"), "lang", base_json)
    current = compute_histogram(
        docs.map_batches(half(1), batch_format="pyarrow"), "lang", base_json)
    tb = int(baseline.counts.sum() + baseline.other)
    tc = int(current.counts.sum() + current.other)
    rows = []
    for i, lang in enumerate(langs):
        nb, nc = int(baseline.counts[i]), int(current.counts[i])
        p = max(nb / tb, 1e-6)
        q = max(nc / tc, 1e-6)
        rows.append((lang, nb, nc, (q - p) * math.log(q / p)))
    return pd.DataFrame(rows, columns=["lang", "n_base", "n_cur",
                                       "psi_contrib"])


PSI_LANG_SQL = """
WITH base AS (
  SELECT lang, count(*) AS n_base FROM documents
  WHERE doc_id % 2 = 0 AND lang IS NOT NULL GROUP BY lang),
cur AS (
  SELECT lang, count(*) AS n_cur FROM documents
  WHERE doc_id % 2 = 1 AND lang IS NOT NULL GROUP BY lang),
langs AS (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL),
tot AS (SELECT
  (SELECT count(*) FROM documents WHERE doc_id % 2 = 0
     AND lang IS NOT NULL) AS tb,
  (SELECT count(*) FROM documents WHERE doc_id % 2 = 1
     AND lang IS NOT NULL) AS tc),
j AS (
  SELECT l.lang, COALESCE(b.n_base, 0) AS n_base,
         COALESCE(c.n_cur, 0) AS n_cur
  FROM langs l LEFT JOIN base b USING (lang) LEFT JOIN cur c USING (lang))
SELECT lang, CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
       (greatest(n_cur / (SELECT tc * 1.0 FROM tot), 1e-6)
          - greatest(n_base / (SELECT tb * 1.0 FROM tot), 1e-6))
       * ln(greatest(n_cur / (SELECT tc * 1.0 FROM tot), 1e-6)
            / greatest(n_base / (SELECT tb * 1.0 FROM tot), 1e-6))
         AS psi_contrib
FROM j ORDER BY lang
"""


def chisq_lang_source_documents(sf_dir: str):
    """(lang, source, observed, expected, contrib) — chi-square
    INDEPENDENCE check of lang × source (is the language mix uniform
    across sources, or does some source drift?), via
    stages/contingency.chi_square_cells. Per-CELL contributions keep the
    floats oracle-exact (pure expressions of integer counts, no
    accumulation — the PSI-per-bin discipline); the statistic is the
    checked column's sum."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.contingency import chi_square_cells_scan

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source"])
    return chi_square_cells_scan(scan, "lang", "source")


CHISQ_LANG_SOURCE_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS observed
  FROM documents GROUP BY 1, 2
),
m AS (
  SELECT lang, source, observed,
         CAST(sum(observed) OVER (PARTITION BY lang) AS DOUBLE) AS rt,
         CAST(sum(observed) OVER (PARTITION BY source) AS DOUBLE) AS ct,
         CAST(sum(observed) OVER () AS DOUBLE) AS n
  FROM cells
),
e AS (SELECT lang, source, observed, rt * ct / n AS expected FROM m)
SELECT lang, source, observed, expected,
       (observed - expected) * (observed - expected) / expected AS contrib
FROM e
"""


def entropy_lang_by_source(sf_dir: str):
    """(source, n_rows, n_values, entropy_micronats) — Shannon entropy of
    the language mix within each source (the corpus-balance diagnostic: a
    near-zero entropy source is monolingual; a high one is mixed). Exact
    floats via stages/contingency.grouped_entropy's integer-ln technique:
    per cell floor(ln(obs/total)·10⁶) is the only float op (libm log of one
    IEEE division of exact ints), accumulated as exact integer products."""
    from ..stages.contingency import grouped_entropy

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["lang", "source"])
    return grouped_entropy(docs, "source", "lang")


ENTROPY_LANG_SOURCE_SQL = """
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS observed
  FROM documents GROUP BY 1, 2
),
t AS (
  SELECT source, CAST(sum(observed) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_values
  FROM cells GROUP BY source
),
lp AS (
  SELECT c.source, c.observed,
         CAST(floor(ln(CAST(c.observed AS DOUBLE)
                       / CAST(t.n_rows AS DOUBLE)) * 1000000) AS BIGINT)
           AS lp
  FROM cells c JOIN t USING (source)
)
SELECT t.source, t.n_rows, t.n_values,
       CAST(-sum(CAST(lp.observed AS HUGEINT) * lp.lp) AS DOUBLE)
         / CAST(t.n_rows AS DOUBLE) AS entropy_micronats
FROM lp JOIN t USING (source)
GROUP BY t.source, t.n_rows, t.n_values
"""


def moments_quantity_returnflag(sf_dir: str):
    """(l_returnflag, n_rows, mean, std, skewness, kurtosis_excess) —
    per-group distribution-shape statistics of l_quantity via
    stages/stats.grouped_moments' exact-integer power sums: one scan, tiny
    partial rows, floats bitwise ≡ the HUGEINT oracle."""
    from ..stages.stats import grouped_moments

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity"])
    return grouped_moments(li, "l_returnflag", "l_quantity", scale=1)


MOMENTS_QUANTITY_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s1,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s2,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s3,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s4
  FROM lineitem GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, n, s1,
         n*s2 - s1*s1 AS a,
         n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS b3,
         n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1 AS b4
  FROM m
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1.0 AS mean,
       sqrt(CAST(a AS DOUBLE)) / CAST(n AS DOUBLE) / 1.0 AS std,
       CAST(b3 AS DOUBLE)
         / (CAST(a AS DOUBLE) * sqrt(CAST(a AS DOUBLE))) AS skewness,
       CAST(b4 AS DOUBLE) / (CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) - 3.0
         AS kurtosis_excess
FROM d ORDER BY l_returnflag
"""


def outlier_events_zscore(sf_dir: str):
    """(event_id, event_type, value) — events whose value is >3 population
    σ from its event_type mean, via stages/stats.zscore_outliers' fully
    integer predicate (n·x−S1)² > 9·(n·S2−S1²): boundary rows cannot flip
    between engines because no float enters the comparison."""
    from ..stages.stats import zscore_outliers

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_id", "event_type", "value"])
    return zscore_outliers(ev, "event_type", "value",
                           ["event_id"], k=3, scale=100)


OUTLIER_EVENTS_SQL = """
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(round(value*100) AS HUGEINT) AS x
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS s1, sum(x*x) AS s2
  FROM v GROUP BY event_type
)
SELECT v.event_id, v.event_type, v.value
FROM v JOIN s USING (event_type)
WHERE (s.n*v.x - s.s1)*(s.n*v.x - s.s1) > 9*(s.n*s.s2 - s.s1*s.s1)
"""


def geomean_quantity_returnflag(sf_dir: str):
    """(l_returnflag, n_rows, log_gm, geo_mean) — per-group geometric mean
    of l_quantity via stages/contingency.grouped_geomean's per-distinct-
    value integer-ln technique; floats bitwise ≡ oracle (two divisions +
    one libm exp of an exact integer ratio)."""
    from ..stages.contingency import grouped_geomean

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity"])
    return grouped_geomean(li, "l_returnflag", "l_quantity")


GEOMEAN_QUANTITY_SQL = """
WITH cells AS (
  SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS obs
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND CAST(round(l_quantity) AS BIGINT) > 0
  GROUP BY 1, 2
),
s AS (
  SELECT l_returnflag, CAST(sum(obs) AS BIGINT) AS n_rows,
         sum(CAST(obs AS HUGEINT)
             * CAST(floor(ln(CAST(x AS DOUBLE)) * 1000000) AS BIGINT)) AS t
  FROM cells GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       CAST(t AS DOUBLE) / CAST(n_rows AS DOUBLE) / 1000000.0 AS log_gm,
       exp(CAST(t AS DOUBLE) / CAST(n_rows AS DOUBLE) / 1000000.0)
         AS geo_mean
FROM s
"""


def slope_price_qty_returnflag(sf_dir: str):
    """(l_returnflag, n_rows, slope, intercept, r2) — per-group
    least-squares line of extendedprice CENTS on quantity via
    stages/stats.grouped_slope; every float op a single IEEE instruction
    on exact integer sums, in the oracle's exact expression order."""
    from ..stages.stats import grouped_slope

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity",
                               "l_extendedprice"])
    return grouped_slope(li, "l_returnflag", "l_quantity",
                         "l_extendedprice", xscale=1, yscale=100)


SLOPE_PRICE_QTY_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS HUGEINT)
           AS sy,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS sxx,
         sum(CAST(round(l_extendedprice*100) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS syy,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_extendedprice*100) AS HUGEINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, n, sx, sy,
         n*sxy - sx*sy AS num, n*sxx - sx*sx AS den1,
         n*syy - sy*sy AS den2
  FROM m
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CAST(num AS DOUBLE) / CAST(den1 AS DOUBLE) AS slope,
       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(num AS DOUBLE) / CAST(den1 AS DOUBLE))
           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept,
       (CAST(num AS DOUBLE) / CAST(den1 AS DOUBLE))
         * (CAST(num AS DOUBLE) / CAST(den2 AS DOUBLE)) AS r2
FROM d ORDER BY l_returnflag
"""


def decile_documents(sf_dir: str):
    """(doc_id, n_chars, decile) — FULL-OUTPUT decile assignment of every
    document by length (the feature-discretization / curriculum-binning
    shape): exact discrete decile edges from the histogram-refinement
    quantile stage (one counting pass, driver holds 9 ints), broadcast
    into one assignment scan — ``decile = 1 + #edges < x`` via
    searchsorted, an integer comparison with no float anywhere, so
    boundary rows cannot disagree with the oracle."""
    import numpy as np

    from ..stages.quantiles import exact_quantiles

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "n_chars"])
    qs = [i / 10 for i in range(1, 10)]
    edges = exact_quantiles(docs, "n_chars", qs)
    e = np.sort(np.array([edges[q] for q in qs], dtype=np.int64))

    def assign(b: pa.Table) -> pa.Table:
        x = b.column("n_chars").to_numpy(zero_copy_only=False)
        dec = 1 + np.searchsorted(e, x, side="left")
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_chars": b.column("n_chars"),
                         "decile": pa.array(dec.astype(np.int64))})

    return docs.map_batches(assign, batch_format="pyarrow")


DECILE_DOCUMENTS_SQL = """
WITH e AS (
  SELECT quantile_disc(n_chars,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(1 + (SELECT count(*) FROM unnest((SELECT qs FROM e)) AS t(v)
                 WHERE n_chars > v) AS BIGINT) AS decile
FROM documents
"""


# ---- per-group exact distinct ----------------------------------------------


def distinct_sources_per_lang(sf_dir: str):
    """(lang, n_distinct) — exact COUNT(DISTINCT source) per language via
    the two-phase pair-dedup exchange (stages/uniqueness.py): pairs move
    once, documents never do."""
    from ..stages.uniqueness import group_distinct_count

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["lang", "source"])
    return group_distinct_count(docs, "lang", "source")


DISTINCT_SOURCES_SQL = """
SELECT lang, COUNT(DISTINCT source) AS n_distinct
FROM documents GROUP BY lang
"""


def distinct_users_per_event(sf_dir: str):
    """(event_type, n_distinct) — distinct users per event type over the
    events log; the high-cardinality side (user_id) is the distinct value."""
    from ..stages.uniqueness import group_distinct_count

    ev = read_parquet(f"{sf_dir}/events.parquet",
                      columns=["event_type", "user_id"])
    return group_distinct_count(ev, "event_type", "user_id")


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


def fk_orders_custkey_bloom(sf_dir: str):
    """Bloom-filter variant of fk_orders_custkey (rows-only: flagged rows
    are exact violations, but ~fp of violations may escape — the
    documented trade for broadcasting bits instead of keys at 10^9-key
    dimension scale)."""
    from ..stages.referential import fk_violations_bloom

    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    dim = read_parquet(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey"]).filter(expr="c_custkey <= 100")
    return fk_violations_bloom(orders, "o_orderkey", "o_custkey",
                               dim, "c_custkey",
                               expected_keys=200, fp=0.001,
                               constraint_id="referential:o_custkey")


# ---- cross-table reconciliation: orders vs lineitem sums -------------------


def reconcile_orders_lineitem(sf_dir: str):
    """Cross-table reconciliation report — the classic warehouse
    consistency check (does the header total match the sum of its lines?):
    per-order line count + floor-cent price sum from lineitem vs the
    order's own floor-cent total, with the signed difference. ONE exchange
    total: lineitem reduces to per-batch (orderkey, cents, count) partials
    (combiner — a hot order reaches the shuffle once per batch), both
    sides ride the same bucket exchange as a tagged union with non-null
    zero fills, and each bucket task folds partials and merges sides in
    one pandas pass. Inner-join semantics: only orderkeys present on BOTH
    sides report (presence flags summed per key).

    Output (o_orderkey, n_lines, line_cents, total_cents, diff_cents) —
    all int64, exact."""
    import numpy as np
    import pandas as pd

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_extendedprice"])
    orders = read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"])
    NB = 64

    def li_partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(
            b.column("l_extendedprice"), 100.0)), pa.int64())
        t = pa.table({"o_orderkey": b.column("l_orderkey"), "cents": cents})
        g = t.group_by(["o_orderkey"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        okey = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = g.num_rows
        return pa.table({
            "o_orderkey": g.column("o_orderkey"),
            "n_lines": pc.cast(g.column("cents_count"), pa.int64()),
            "line_cents": g.column("cents_sum"),
            "total_cents": pa.array(np.zeros(n, np.int64)),
            "__has_l": pa.array(np.ones(n, np.int64)),
            "__has_o": pa.array(np.zeros(n, np.int64)),
            "__b": pa.array((okey % NB).astype(np.int32)),
        })

    def o_partial(b: pa.Table) -> pa.Table:
        okey = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = b.num_rows
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "n_lines": pa.array(np.zeros(n, np.int64)),
            "line_cents": pa.array(np.zeros(n, np.int64)),
            "total_cents": pc.cast(pc.floor(pc.multiply(
                b.column("o_totalprice"), 100.0)), pa.int64()),
            "__has_l": pa.array(np.zeros(n, np.int64)),
            "__has_o": pa.array(np.ones(n, np.int64)),
            "__b": pa.array((okey % NB).astype(np.int32)),
        })

    both = li.map_batches(li_partial, batch_format="pyarrow").union(
        orders.map_batches(o_partial, batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_orderkey", sort=False).agg(
            n_lines=("n_lines", "sum"), line_cents=("line_cents", "sum"),
            total_cents=("total_cents", "sum"), hl=("__has_l", "sum"),
            ho=("__has_o", "sum"))
        agg = agg[(agg["hl"] > 0) & (agg["ho"] > 0)]
        out = pd.DataFrame({
            "o_orderkey": agg.index.to_numpy(),
            "n_lines": agg["n_lines"].to_numpy().astype(np.int64),
            "line_cents": agg["line_cents"].to_numpy().astype(np.int64),
            "total_cents": agg["total_cents"].to_numpy().astype(np.int64),
        })
        out["diff_cents"] = out["total_cents"] - out["line_cents"]
        return out

    return both.groupby("__b").map_groups(per_bucket, batch_format="pandas")


RECONCILE_ORDERS_SQL = """
SELECT l.o_orderkey, n_lines, line_cents, total_cents,
       total_cents - line_cents AS diff_cents
FROM (SELECT l_orderkey AS o_orderkey, count(*) AS n_lines,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS line_cents
      FROM lineitem GROUP BY l_orderkey) l
JOIN (SELECT o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders) o
ON l.o_orderkey = o.o_orderkey
"""


# ---- quantile binning: feature discretization ------------------------------


def quartile_bins_lineitem(sf_dir: str):
    """Feature discretization by the column's OWN exact quartiles (the
    NTILE-by-value / width_bucket shape used to bin features for training):
    thresholds come from the histogram-refinement exact-quantile stage
    (quantile_disc semantics — an actual data element, so the comparison
    doubles are identical in both engines), then one streaming pass counts
    rows per bin with a per-batch combiner folded driver-side (4 rows).

    Output (bucket, n_rows) — bucket 1..4, both int64, exact."""
    import numpy as np
    import pandas as pd

    from ..sources.parquet import FusedParquetScan
    from ..stages.quantiles import exact_quantiles

    li = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                          columns=["l_quantity"])
    qs = exact_quantiles(li, "l_quantity", [0.25, 0.5, 0.75])
    t1, t2, t3 = qs[0.25], qs[0.5], qs[0.75]

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("l_quantity").to_numpy(zero_copy_only=False)
        bucket = (1 + (v > t1).astype(np.int64) + (v > t2) + (v > t3))
        vals, counts = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(vals.astype(np.int64)),
                         "n_partial": pa.array(counts.astype(np.int64))})

    df = li.map_batches(partial).to_pandas()
    g = df.groupby("bucket", sort=True)["n_partial"].sum()
    return pa.table({"bucket": pa.array(g.index.to_numpy(), pa.int64()),
                     "n_rows": pa.array(g.to_numpy(), pa.int64())})


QUARTILE_BINS_SQL = """
WITH q AS (SELECT quantile_disc(l_quantity, 0.25) AS t1,
                  quantile_disc(l_quantity, 0.50) AS t2,
                  quantile_disc(l_quantity, 0.75) AS t3
           FROM lineitem)
SELECT CAST(1 + CAST(l_quantity > t1 AS INT) + CAST(l_quantity > t2 AS INT)
            + CAST(l_quantity > t3 AS INT) AS BIGINT) AS bucket,
       count(*) AS n_rows
FROM lineitem, q
GROUP BY 1
"""


def basket_pairs_lineitem(sf_dir: str):
    """(item_a, item_b, support) — part pairs co-occurring in ≥2 orders:
    market-basket pair mining (stages/itemsets.cooccur_pairs; two
    partial-aggregated bucket exchanges, baskets then pairs — the
    co-occurrence instances are combined per bucket before the pair
    exchange, so the shuffle carries distinct pairs, never instances)."""
    from ..stages.itemsets import cooccur_pairs

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    return cooccur_pairs(li, "l_orderkey", "l_partkey", min_support=2)


BASKET_PAIRS_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
       count(*) AS support
FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def assoc_rules_lineitem(sf_dir: str):
    """(item_a, item_b, support, conf_ab, conf_ba, lift) — association
    rules over the co-occurring part pairs (stages/itemsets.assoc_rules):
    pair supports from the two-exchange basket mining, item supports from
    the grouped-distinct exchange broadcast into the pair stream; every
    score is one int÷int IEEE division, so floats compare exactly."""
    from ..stages.itemsets import assoc_rules

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    return assoc_rules(li, "l_orderkey", "l_partkey", min_support=2)


ASSOC_RULES_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
     n AS (SELECT count(DISTINCT l_orderkey) AS nb FROM lineitem),
     s AS (SELECT l_partkey, count(*) AS sup FROM d GROUP BY 1),
     p AS (SELECT a.l_partkey AS ia, b.l_partkey AS ib, count(*) AS sup
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT p.ia AS item_a, p.ib AS item_b, p.sup AS support,
       CAST(p.sup AS DOUBLE) / CAST(sa.sup AS DOUBLE) AS conf_ab,
       CAST(p.sup AS DOUBLE) / CAST(sb.sup AS DOUBLE) AS conf_ba,
       CAST(p.sup * n.nb AS DOUBLE) / CAST(sa.sup * sb.sup AS DOUBLE)
           AS lift
FROM p JOIN s sa ON sa.l_partkey = p.ia
       JOIN s sb ON sb.l_partkey = p.ib, n
"""


def mi_lang_source(sf_dir: str):
    """One-row mutual information (micronats) between lang and source —
    the dependence diagnostic beside chi-square: 0 ⇔ independent mixes.

    Exactness: the ONLY per-cell float op is ``floor(ln(r)·10⁶)`` where
    ``r = (N·n_ij) / (n_i·n_j)`` is ONE IEEE division of two exact int64
    products (same libm ln in Python and DuckDB); the weighted sum
    ``Σ n_ij · lp_ij`` folds in exact integers and divides by N once at
    the end. Cells come from per-batch (lang, source) count partials —
    bounded by |langs| × |sources|."""
    import math

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b.column("lang"),
                      "source": b.column("source")})
        g = t.group_by(["lang", "source"]).aggregate([("source", "count")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "n": pc.cast(g.column("source_count"), pa.int64())})

    cells = (docs.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["lang", "source"], as_index=False)["n"].sum())
    big_n = int(cells["n"].sum())
    row_n = cells.groupby("lang")["n"].sum().to_dict()
    col_n = cells.groupby("source")["n"].sum().to_dict()
    acc = 0
    for _, r in cells.iterrows():
        nij = int(r["n"])
        ratio = float(big_n * nij) / float(row_n[r["lang"]] *
                                           col_n[r["source"]])
        lp = math.floor(math.log(ratio) * 1_000_000)
        acc += nij * lp
    mi = float(acc) / float(big_n)
    return pd.DataFrame({
        "n_rows": pd.Series([big_n], dtype=np.int64),
        "n_cells": pd.Series([len(cells)], dtype=np.int64),
        "mi_micronats": [mi]})


MI_LANG_SOURCE_SQL = """
WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY 1, 2),
rows_ AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rn FROM cells GROUP BY 1),
cols AS (SELECT source, CAST(sum(n) AS BIGINT) AS cn FROM cells GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM cells),
lp AS (SELECT c.n,
              CAST(floor(ln(CAST(t.big_n * c.n AS DOUBLE)
                            / CAST(r.rn * co.cn AS DOUBLE)) * 1000000)
                   AS BIGINT) AS lp
       FROM cells c
       JOIN rows_ r ON r.lang = c.lang
       JOIN cols co ON co.source = c.source, t)
SELECT t.big_n AS n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n_cells,
       CAST(sum(CAST(lp.n AS HUGEINT) * lp.lp) AS DOUBLE)
         / CAST(t.big_n AS DOUBLE) AS mi_micronats
FROM lp, t GROUP BY t.big_n
"""


def basket_triples_lineitem(sf_dir: str):
    """(item_a, item_b, item_c, support) — part TRIPLES co-occurring in ≥2
    orders (stages/itemsets.cooccur_triples): the 3-itemset frequent-set
    mining step, two partial-aggregated bucket exchanges with ordered
    C-path self-merges enumerating the triples."""
    from ..stages.itemsets import cooccur_triples

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    return cooccur_triples(li, "l_orderkey", "l_partkey", min_support=2)


BASKET_TRIPLES_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
       c.l_partkey AS item_c, count(*) AS support
FROM d a
JOIN d b ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
JOIN d c ON c.l_orderkey = a.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY 1, 2, 3 HAVING count(*) >= 2
"""


def jsd_sources(sf_dir: str, source_a: str = "src1", source_b: str = "src2"):
    """One-row Jensen–Shannon divergence (micronats) between the language
    mixes of two sources — the symmetric bounded drift measure beside
    PSI/KL. Decomposed as ``KL(p‖m)/2 + KL(q‖m)/2`` so every per-cell log
    argument is ONE IEEE division of exact integer products
    (``2·aᵢ·B / (aᵢ·B + bᵢ·A)`` and its mirror — Python arbitrary ints,
    HUGEINT in the oracle); the weighted sums fold as exact integers and
    the two final divisions + halving are spelled identically in SQL."""
    import math

    docs = read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("source"),
                     value_set=pa.array([source_a, source_b]))
        b = b.filter(m)
        t = pa.table({"lang": b.column("lang"),
                      "source": b.column("source")})
        g = t.group_by(["lang", "source"]).aggregate([("source", "count")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "n": pc.cast(g.column("source_count"), pa.int64())})

    cells = (docs.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["lang", "source"], as_index=False)["n"].sum())
    piv = cells.pivot_table(index="lang", columns="source", values="n",
                            aggfunc="sum", fill_value=0)
    a = {lang: int(piv.loc[lang, source_a]) if source_a in piv.columns else 0
         for lang in piv.index}
    bb = {lang: int(piv.loc[lang, source_b]) if source_b in piv.columns else 0
          for lang in piv.index}
    A, B = sum(a.values()), sum(bb.values())
    sp = sq = 0
    for lang in piv.index:
        ai, bi = a[lang], bb[lang]
        denom = ai * B + bi * A
        if ai:
            sp += ai * math.floor(
                math.log(float(2 * ai * B) / float(denom)) * 1_000_000)
        if bi:
            sq += bi * math.floor(
                math.log(float(2 * bi * A) / float(denom)) * 1_000_000)
    js = (float(sp) / float(A) + float(sq) / float(B)) / 2.0
    return pd.DataFrame({
        "n_a": pd.Series([A], dtype=np.int64),
        "n_b": pd.Series([B], dtype=np.int64),
        "jsd_micronats": [js]})


JSD_SOURCES_SQL = """
WITH cells AS (
  SELECT lang,
         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
           AS a,
         CAST(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT)
           AS b
  FROM documents WHERE source IN ('src1', 'src2') GROUP BY 1),
t AS (SELECT CAST(sum(a) AS BIGINT) AS big_a,
             CAST(sum(b) AS BIGINT) AS big_b FROM cells),
lp AS (SELECT c.a, c.b,
              CASE WHEN c.a > 0 THEN
                CAST(c.a AS HUGEINT) *
                CAST(floor(ln(CAST(2 * c.a * t.big_b AS DOUBLE)
                              / CAST(c.a * t.big_b + c.b * t.big_a
                                     AS DOUBLE)) * 1000000) AS HUGEINT)
              ELSE 0 END AS wp,
              CASE WHEN c.b > 0 THEN
                CAST(c.b AS HUGEINT) *
                CAST(floor(ln(CAST(2 * c.b * t.big_a AS DOUBLE)
                              / CAST(c.a * t.big_b + c.b * t.big_a
                                     AS DOUBLE)) * 1000000) AS HUGEINT)
              ELSE 0 END AS wq
       FROM cells c, t)
SELECT t.big_a AS n_a, t.big_b AS n_b,
       (CAST(sum(lp.wp) AS DOUBLE) / CAST(t.big_a AS DOUBLE)
        + CAST(sum(lp.wq) AS DOUBLE) / CAST(t.big_b AS DOUBLE)) / 2.0
         AS jsd_micronats
FROM lp, t GROUP BY t.big_a, t.big_b
"""


def hmean_quantity_returnflag(sf_dir: str):
    """Per return flag: the harmonic mean of l_quantity in exact micro
    units — the rate-averaging statistic beside the geometric mean. The
    value domain is tiny, so (flag, qty_cents) cells fold from per-batch
    partials and the reciprocal sum is the INTEGER Σ obs·(10¹² // qc)
    (floor micro-reciprocals, identical in DuckDB); the final value is one
    floor division ``n·10¹⁰ // Σ`` (10¹² reciprocal scale ÷ 10² cents
    back to micro-quantity units). Zero/null quantities are excluded in
    both engines."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "flag": b.column("l_returnflag"),
            "qc": pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100)),
                          pa.int64())})
        t = t.filter(pc.greater(t.column("qc"), 0))
        g = t.group_by(["flag", "qc"]).aggregate([("qc", "count")])
        return pa.table({"flag": g.column("flag"), "qc": g.column("qc"),
                         "obs": pc.cast(g.column("qc_count"), pa.int64())})

    cells = (li.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["flag", "qc"], as_index=False)["obs"].sum())
    rows = []
    for flag, g in cells.groupby("flag", sort=True):
        n = int(g["obs"].sum())
        recip = int((g["obs"].astype(object) *
                     (10**12 // g["qc"].astype(object))).sum())
        rows.append((flag, np.int64(n), np.int64(recip),
                     np.int64(n * 10**10 // recip)))
    return pd.DataFrame(rows, columns=["l_returnflag", "n_rows",
                                       "recip_sum", "hmean_micro"])


HMEAN_QUANTITY_SQL = """
WITH v AS (SELECT l_returnflag,
                  CAST(round(l_quantity*100) AS BIGINT) AS qc
           FROM lineitem
           WHERE CAST(round(l_quantity*100) AS BIGINT) > 0)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(1000000000000 // qc) AS BIGINT) AS recip_sum,
       CAST((count(*) * 10000000000) // sum(1000000000000 // qc) AS BIGINT)
         AS hmean_micro
FROM v GROUP BY 1 ORDER BY 1
"""


def weighted_median_quantity(sf_dir: str):
    """Per return flag: the revenue-weighted median of l_quantity — the
    smallest quantity value whose cumulative extended-price weight reaches
    half the total (``2·cum ≥ total``, all integer cents). Same
    value-domain-cell shape as the winsorized mean: per-batch
    (flag, qty_cents) → weight-sum cells bound the exchange by the tiny
    distinct domain, and the weighted scan is a driver-side cumsum."""
    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity",
                               "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "flag": b.column("l_returnflag"),
            "qc": pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100)),
                          pa.int64()),
            "w": pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"),
                                              100)), pa.int64())})
        g = t.group_by(["flag", "qc"]).aggregate([("w", "sum")])
        return pa.table({"flag": g.column("flag"), "qc": g.column("qc"),
                         "w": g.column("w_sum")})

    cells = (li.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby(["flag", "qc"], as_index=False)["w"].sum())
    rows = []
    for flag, g in cells.groupby("flag", sort=True):
        g = g.sort_values("qc", kind="mergesort")
        total = int(g["w"].sum())
        cum = 0
        med = None
        for qc, w in zip(g["qc"], g["w"]):
            cum += int(w)
            if 2 * cum >= total:
                med = int(qc)
                break
        rows.append((flag, np.int64(total), np.int64(med)))
    return pd.DataFrame(rows, columns=["l_returnflag", "total_weight_cents",
                                       "wmedian_cents"])


WEIGHTED_MEDIAN_SQL = """
WITH v AS (SELECT l_returnflag,
                  CAST(round(l_quantity*100) AS BIGINT) AS qc,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS w
           FROM lineitem),
c AS (SELECT l_returnflag, qc, CAST(sum(w) AS BIGINT) AS w
      FROM v GROUP BY 1, 2),
s AS (SELECT l_returnflag, qc, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY qc
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS total
      FROM c)
SELECT l_returnflag, CAST(max(total) AS BIGINT) AS total_weight_cents,
       CAST(min(CASE WHEN 2*cum >= total THEN qc END) AS BIGINT)
         AS wmedian_cents
FROM s GROUP BY 1 ORDER BY 1
"""


# ---- order-independent integrity checksums -----------------------------------


def checksum_documents(sf_dir: str):
    """(lang, n_rows, checksum) — per-language order-independent md5-sum
    integrity checksum of (doc_id, lang, source) plus the table-total row
    (lang = '*') — the cross-run "no row lost or duplicated" verification
    primitive (stages/checksum.table_checksum: one scan, commutative sum
    of 60-bit row hashes mod 2^61, so the value is independent of row
    order / partitioning / engine). Exact oracle: DuckDB recomputes the
    identical md5-derived sum in HUGEINT."""
    import pyarrow as pa

    from ..sources.parquet import FusedParquetScan
    from ..stages.checksum import table_checksum

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "source"])
    per_lang = table_checksum(scan, ["doc_id", "lang", "source"],
                              group_cols=["lang"]).to_pandas()
    total = table_checksum(
        FusedParquetScan(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"]),
        ["doc_id", "lang", "source"]).to_pandas()
    total.insert(0, "lang", "*")
    out = pd.concat([per_lang, total], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


CHECKSUM_DOCUMENTS_SQL = """
WITH h AS (
  SELECT lang,
         CAST(concat('0x', substr(md5(
           concat_ws(chr(31), doc_id, lang, source)), 1, 15)) AS UBIGINT)
           AS rh
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(rh) % 2305843009213693952 AS BIGINT) AS checksum
FROM h GROUP BY lang
UNION ALL
SELECT '*' AS lang, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(rh) % 2305843009213693952 AS BIGINT) AS checksum
FROM h
ORDER BY lang
"""


# ---- exact Spearman rank correlation -------------------------------------------


def spearman_qty_discount(sf_dir: str, block_gate: int = 512):
    """One-row (n_rows, rho) — EXACT Spearman rank correlation between
    quantity and discount: average ranks with tie handling are computed
    from the JOINT value histogram (50 x 11 cells — no global sort at any
    scale), doubled so tie-midpoints stay integral, and Pearson-on-ranks
    folds from arbitrary-precision integer moments. The single float is
    one shared expression — correctly-rounded int-to-double casts, one
    multiply, one sqrt, one divide — identical in Python and DuckDB's
    HUGEINT pipeline (the grouped_moments technique applied to ranks).

    Shape: ONE fused scan emitting per-batch joint-cell count partials
    (bounded by the value-pair cardinality), folded to global cells by
    stages/folds.fold_cells (driver-side under the block gate, one
    cell-hash exchange past it); everything else is driver-side integer
    math over the tiny histogram."""
    import math

    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "qc": pc.cast(pc.round(pc.multiply(
                b.column("l_quantity"), 100)), pa.int64()),
            "dc": pc.cast(pc.round(pc.multiply(
                b.column("l_discount"), 100)), pa.int64()),
        })
        g = t.group_by(["qc", "dc"]).aggregate([("qc", "count")])
        return g.rename_columns(["qc", "dc", "n"])

    scan = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_discount"])
    cells = fold_cells(scan, partial, ["qc", "dc"], sums=["n"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"n_rows": pd.Series([0], dtype=np.int64),
                             "rho": pd.Series([0.0], dtype=np.float64)})
    n = int(cells["n"].sum())

    def ranks_x2(col: str) -> dict:
        per = cells.groupby(col)["n"].sum().sort_index()
        out, less = {}, 0
        for v, cnt in per.items():
            out[int(v)] = 2 * less + int(cnt) + 1   # 2x average rank
            less += int(cnt)
        return out

    rx = ranks_x2("qc")
    ry = ranks_x2("dc")
    sx = sy = sxx = syy = sxy = 0
    for qc, dc, cnt in cells.itertuples(index=False):
        a, b_, c = rx[int(qc)], ry[int(dc)], int(cnt)
        sx += c * a
        sy += c * b_
        sxx += c * a * a
        syy += c * b_ * b_
        sxy += c * a * b_
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    rho = 0.0 if d1 == 0 or d2 == 0 else \
        float(num) / math.sqrt(float(d1) * float(d2))
    return pd.DataFrame({"n_rows": pd.Series([n], dtype=np.int64),
                         "rho": pd.Series([rho], dtype=np.float64)})


SPEARMAN_SQL = """
WITH v AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem),
cells AS (SELECT qc, dc, CAST(count(*) AS BIGINT) AS n
          FROM v GROUP BY 1, 2),
xr AS (SELECT qc, 2 * (sum(n) OVER (ORDER BY qc
                                    ROWS UNBOUNDED PRECEDING) - n)
              + n + 1 AS r
       FROM (SELECT qc, CAST(sum(n) AS BIGINT) AS n
             FROM cells GROUP BY qc)),
yr AS (SELECT dc, 2 * (sum(n) OVER (ORDER BY dc
                                    ROWS UNBOUNDED PRECEDING) - n)
              + n + 1 AS r
       FROM (SELECT dc, CAST(sum(n) AS BIGINT) AS n
             FROM cells GROUP BY dc)),
m AS (SELECT CAST(sum(c.n) AS HUGEINT) AS n,
             sum(CAST(c.n AS HUGEINT) * xr.r) AS sx,
             sum(CAST(c.n AS HUGEINT) * yr.r) AS sy,
             sum(CAST(c.n AS HUGEINT) * xr.r * xr.r) AS sxx,
             sum(CAST(c.n AS HUGEINT) * yr.r * yr.r) AS syy,
             sum(CAST(c.n AS HUGEINT) * xr.r * yr.r) AS sxy
      FROM cells c JOIN xr USING (qc) JOIN yr USING (dc))
SELECT CAST(n AS BIGINT) AS n_rows,
       CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
            THEN 0.0
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) END AS rho
FROM m
"""


def kendall_qty_discount(sf_dir: str, block_gate: int = 512):
    """One-row (n_rows, tau_b) — EXACT Kendall tau-b between quantity and
    discount, computed from the joint value histogram (spearman's sibling
    over the same ONE-scan cell partials): concordant/discordant pair
    counts are integer folds over cell pairs (O(cells²) driver math —
    cells are value-cardinality-bounded, never corpus-bounded), tie terms
    likewise, and the single float is the shared
    ``(C−D)/sqrt((T−Tx)(T−Ty))`` expression over correctly-rounded
    int-to-double casts. Cell partials fold via stages/folds.fold_cells
    (driver-side under the block gate, one cell-hash exchange past it)."""
    import math

    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "qc": pc.cast(pc.round(pc.multiply(
                b.column("l_quantity"), 100)), pa.int64()),
            "dc": pc.cast(pc.round(pc.multiply(
                b.column("l_discount"), 100)), pa.int64()),
        })
        g = t.group_by(["qc", "dc"]).aggregate([("qc", "count")])
        return g.rename_columns(["qc", "dc", "n"])

    scan = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_discount"])
    cells = fold_cells(scan, partial, ["qc", "dc"], sums=["n"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"n_rows": pd.Series([0], dtype=np.int64),
                             "tau_b": pd.Series([0.0], dtype=np.float64)})
    qv = cells["qc"].to_numpy().astype(np.int64)
    dv = cells["dc"].to_numpy().astype(np.int64)
    nv = cells["n"].to_numpy().astype(object)      # Python-int math
    n = int(sum(nv))
    C = D = 0
    for i in range(len(nv)):
        gt = (qv > qv[i])
        C += int(nv[i]) * int(sum(nv[gt & (dv > dv[i])]))
        D += int(nv[i]) * int(sum(nv[gt & (dv < dv[i])]))
    T = n * (n - 1) // 2
    tx = sum(int(c) * (int(c) - 1) // 2
             for c in cells.groupby("qc")["n"].sum())
    ty = sum(int(c) * (int(c) - 1) // 2
             for c in cells.groupby("dc")["n"].sum())
    den1, den2 = T - tx, T - ty
    tau = 0.0 if den1 == 0 or den2 == 0 else \
        float(C - D) / math.sqrt(float(den1) * float(den2))
    return pd.DataFrame({"n_rows": pd.Series([n], dtype=np.int64),
                         "tau_b": pd.Series([tau], dtype=np.float64)})


KENDALL_SQL = """
WITH v AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem),
cells AS (SELECT qc, dc, CAST(count(*) AS BIGINT) AS n
          FROM v GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS n FROM cells),
cd AS (
  SELECT CAST(coalesce(sum(CASE WHEN b.qc > a.qc AND b.dc > a.dc
                           THEN CAST(a.n AS HUGEINT) * b.n END), 0)
              AS HUGEINT) AS c,
         CAST(coalesce(sum(CASE WHEN b.qc > a.qc AND b.dc < a.dc
                           THEN CAST(a.n AS HUGEINT) * b.n END), 0)
              AS HUGEINT) AS d
  FROM cells a JOIN cells b ON TRUE),
tx AS (SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1) // 2) AS HUGEINT) AS t
       FROM (SELECT CAST(sum(n) AS BIGINT) AS s FROM cells GROUP BY qc)),
ty AS (SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1) // 2) AS HUGEINT) AS t
       FROM (SELECT CAST(sum(n) AS BIGINT) AS s FROM cells GROUP BY dc))
SELECT CAST(tot.n AS BIGINT) AS n_rows,
       CASE WHEN tot.n * (tot.n - 1) // 2 - tx.t = 0
              OR tot.n * (tot.n - 1) // 2 - ty.t = 0 THEN 0.0
            ELSE CAST(cd.c - cd.d AS DOUBLE)
                 / sqrt(CAST(tot.n * (tot.n - 1) // 2 - tx.t AS DOUBLE)
                        * CAST(tot.n * (tot.n - 1) // 2 - ty.t AS DOUBLE))
       END AS tau_b
FROM tot, cd, tx, ty
"""


def cramers_v_lang_source(sf_dir: str):
    """One-row (n_rows, chi2, cramers_v) — association strength between
    lang and source: Cramér's V derived from the EXACT chi-square
    contingency machinery (stages/contingency — per-cell integer counts,
    cell-exact float contributions) as ``sqrt(chi2 / (n · min(r−1,
    c−1)))``. The one new float is one division and one sqrt over the
    already-oracle-exact chi2 sum — deterministic in both engines when
    the SQL spells the identical per-cell accumulation order (ORDER BY
    cell inside the sum is not needed: chi2 here is the SUM of per-cell
    DOUBLES, so we keep chi2 itself exact by summing the per-cell
    contributions in Python floats and mirroring DuckDB's unordered sum
    — instead the oracle recomputes chi2 from the SAME per-cell floats
    with a deterministic ORDER BY fold via list_aggregate? No: DuckDB
    SUM over doubles is order-dependent, so this query rounds chi2 and V
    to 6 decimals; values are far from the rounding boundary (pinned by
    test)."""
    import math

    import numpy as np

    from ..sources.parquet import FusedParquetScan
    from ..stages.contingency import chi_square_cells_scan

    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source"])
    cells = chi_square_cells_scan(scan, "lang", "source")
    n = int(cells["observed"].sum())
    chi2 = float(cells["contrib"].sum())
    r = cells["lang"].nunique()
    c = cells["source"].nunique()
    k = min(r - 1, c - 1)
    v = 0.0 if k == 0 or n == 0 else math.sqrt(chi2 / (n * k))
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype=np.int64),
        "chi2_r6": pd.Series([round(chi2, 6)], dtype=np.float64),
        "cramers_v_r6": pd.Series([round(v, 6)], dtype=np.float64),
    })


CRAMERS_V_SQL = """
WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM c GROUP BY lang),
ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS s FROM c GROUP BY source),
t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
cells AS (
  SELECT c.lang, c.source, c.o,
         CAST(rt.r AS DOUBLE) * ct.s / t.n AS e
  FROM c JOIN rt USING (lang) JOIN ct USING (source), t),
agg AS (SELECT sum((o - e) * (o - e) / e) AS chi2 FROM cells),
dims AS (SELECT count(DISTINCT lang) AS r, count(DISTINCT source) AS cc
         FROM c)
SELECT t.n AS n_rows, round(agg.chi2, 6) AS chi2_r6,
       round(CASE WHEN LEAST(dims.r - 1, dims.cc - 1) = 0 THEN 0.0
                  ELSE sqrt(agg.chi2
                            / (t.n * LEAST(dims.r - 1, dims.cc - 1)))
             END, 6) AS cramers_v_r6
FROM t, agg, dims
"""


def anova_f_qty_flag(sf_dir: str, block_gate: int = 512):
    """One-row (n_rows, k_groups, f) — one-way ANOVA F statistic of
    l_quantity across the three l_returnflag groups (A/N/R — fixed by the
    TPC-H domain; the reference-shape distribution check beside the
    nonparametric KS/Mann-Whitney family). The whole F ratio reduces to
    ONE division of two exact integers: with per-group integer moments
    (n_g, s_g, ss_g) over the integral quantity domain, ``P = n_A·n_N·n_R``
    and ``Anum = Σ_g s_g²·(P/n_g)`` (so ``Σ s_g²/n_g = Anum/P`` exactly),

        SSB = (Anum·N − S²·P) / (P·N)      SSW = (T·P − Anum) / P
        F   = (SSB/(k−1)) / (SSW/(N−k))
            = (Anum·N − S²·P)·(N−3)  /  ((T·P − Anum)·N·2)

    — numerator and denominator are exact HUGEINT-range integers (≤ ~4e35
    at sf 0.1), cast to double once each. Degenerate inputs (an empty
    group, zero within-group variance) report 0.0 in both engines.

    Scale shape: per-batch (flag, n, s, ss) moment partials are
    3-cell-bounded → shared gated cell fold; driver math is O(1)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(b.column("l_quantity")), pa.int64())
        g = pa.table({"f": b.column("l_returnflag"), "q": q,
                      "q2": pc.multiply(q, q)}) \
            .group_by("f").aggregate(
                [("q", "count"), ("q", "sum"), ("q2", "sum")])
        return pa.table({"f": g.column("f"),
                         "n": pc.cast(g.column("q_count"), pa.int64()),
                         "s": g.column("q_sum"),
                         "ss": g.column("q2_sum")})

    cells = fold_cells(scan, partial, ["f"], sums=["n", "s", "ss"],
                       block_gate=block_gate)
    mom = {r.f: (int(r.n), int(r.s), int(r.ss))
           for r in cells.itertuples(index=False)} if len(cells) else {}
    (na, sa, ssa) = mom.get("A", (0, 0, 0))
    (nn_, sn, ssn) = mom.get("N", (0, 0, 0))
    (nr, sr, ssr) = mom.get("R", (0, 0, 0))
    n = na + nn_ + nr
    s = sa + sn + sr
    t = ssa + ssn + ssr
    pp = na * nn_ * nr
    anum = sa * sa * nn_ * nr + sn * sn * na * nr + sr * sr * na * nn_
    fnum = (anum * n - s * s * pp) * (n - 3)
    fden = (t * pp - anum) * n * 2
    f = 0.0 if pp == 0 or fden == 0 else float(fnum) / float(fden)
    return pd.DataFrame({"n_rows": pd.Series([n], dtype=np.int64),
                         "k_groups": pd.Series([3], dtype=np.int64),
                         "f": pd.Series([f], dtype=np.float64)})


ANOVA_F_SQL = """
WITH v AS (SELECT l_returnflag AS f,
                  CAST(round(l_quantity) AS BIGINT) AS q
           FROM lineitem),
c AS (SELECT f, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(q) AS HUGEINT) AS s,
             CAST(sum(q * q) AS HUGEINT) AS ss
      FROM v GROUP BY 1),
p AS (SELECT
        COALESCE(sum(n) FILTER (WHERE f = 'A'), 0) AS na,
        COALESCE(sum(s) FILTER (WHERE f = 'A'), 0) AS sa,
        COALESCE(sum(ss) FILTER (WHERE f = 'A'), 0) AS ssa,
        COALESCE(sum(n) FILTER (WHERE f = 'N'), 0) AS nn,
        COALESCE(sum(s) FILTER (WHERE f = 'N'), 0) AS sn,
        COALESCE(sum(ss) FILTER (WHERE f = 'N'), 0) AS ssn,
        COALESCE(sum(n) FILTER (WHERE f = 'R'), 0) AS nr,
        COALESCE(sum(s) FILTER (WHERE f = 'R'), 0) AS sr,
        COALESCE(sum(ss) FILTER (WHERE f = 'R'), 0) AS ssr
      FROM c),
m AS (SELECT na + nn + nr AS n, sa + sn + sr AS s,
             ssa + ssn + ssr AS t, na * nn * nr AS pp,
             sa * sa * nn * nr + sn * sn * na * nr
               + sr * sr * na * nn AS anum
      FROM p),
ff AS (SELECT n, pp,
              (anum * n - s * s * pp) * (n - 3) AS fnum,
              (t * pp - anum) * n * 2 AS fden
       FROM m)
SELECT CAST(n AS BIGINT) AS n_rows, CAST(3 AS BIGINT) AS k_groups,
       CASE WHEN pp = 0 OR fden = 0 THEN 0.0
            ELSE CAST(fnum AS DOUBLE) / CAST(fden AS DOUBLE) END AS f
FROM ff
"""


def hodges_lehmann_qty(sf_dir: str, flag_a: str = "A", flag_b: str = "R",
                       block_gate: int = 512):
    """One-row (n_pairs, hl_diff) — the Hodges-Lehmann shift estimator
    between two return-flag groups' quantities: the LOWER weighted median
    of the n_a·n_b pairwise differences q_a − q_b, computed WITHOUT
    enumerating pairs — the integral quantity domain (≤ 50 distinct
    values) makes the pairwise-difference multiset an outer CONVOLUTION
    of the two value histograms (≤ 99 distinct diffs at any corpus
    size), and the lower weighted median (smallest d with cumweight ≥
    ⌈W/2⌉) is exact integer arithmetic end to end — no float exists
    anywhere (the robust location-shift sibling of
    :func:`~.anomaly.mannwhitney_chars_langs`).

    Scale shape: (flag, value) cells are value-domain-bounded → shared
    gated cell fold; the convolution is O(50²) driver math."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("l_returnflag"),
                              value_set=pa.array([flag_a, flag_b])))
        g = pa.table({
            "f": t.column("l_returnflag"),
            "q": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
        }).group_by(["f", "q"]).aggregate([("q", "count")])
        return pa.table({"f": g.column("f"), "q": g.column("q"),
                         "c": pc.cast(g.column("q_count"), pa.int64())})

    cells = fold_cells(scan, partial, ["f", "q"], sums=["c"],
                       block_gate=block_gate)
    empty = pd.DataFrame({"n_pairs": pd.Series([], dtype=np.int64),
                          "hl_diff": pd.Series([], dtype=np.int64)})
    if not len(cells):
        return empty
    a = cells[cells["f"] == flag_a]
    b_ = cells[cells["f"] == flag_b]
    if not len(a) or not len(b_):
        return empty
    va = a["q"].to_numpy(np.int64)
    ca = a["c"].to_numpy(np.int64)
    vb = b_["q"].to_numpy(np.int64)
    cb = b_["c"].to_numpy(np.int64)
    d = (va[:, None] - vb[None, :]).ravel()
    w = (ca[:, None] * cb[None, :]).ravel()
    df = pd.DataFrame({"d": d, "w": w}).groupby("d", as_index=False) \
        .agg({"w": "sum"}).sort_values("d")
    tot = int(df["w"].sum())
    cum = df["w"].cumsum().to_numpy(np.int64)
    hl = int(df["d"].to_numpy(np.int64)[
        int(np.searchsorted(cum, (tot + 1) // 2))])
    return pd.DataFrame({"n_pairs": pd.Series([tot], dtype=np.int64),
                         "hl_diff": pd.Series([hl], dtype=np.int64)})


HODGES_LEHMANN_SQL = """
WITH v AS (SELECT l_returnflag AS f,
                  CAST(round(l_quantity) AS BIGINT) AS q
           FROM lineitem WHERE l_returnflag IN ('A', 'R')),
ha AS (SELECT q, CAST(count(*) AS BIGINT) AS c FROM v
       WHERE f = 'A' GROUP BY 1),
hb AS (SELECT q, CAST(count(*) AS BIGINT) AS c FROM v
       WHERE f = 'R' GROUP BY 1),
d AS (SELECT ha.q - hb.q AS d,
             CAST(sum(CAST(ha.c AS HUGEINT) * hb.c) AS BIGINT) AS w
      FROM ha CROSS JOIN hb GROUP BY 1),
t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM d),
c AS (SELECT d, CAST(sum(w) OVER (ORDER BY d) AS BIGINT) AS cw FROM d)
SELECT t.tot AS n_pairs, CAST(min(c.d) AS BIGINT) AS hl_diff
FROM c, t WHERE c.cw >= (t.tot + 1) // 2 GROUP BY t.tot
"""


def ols2_price_qty_discount(sf_dir: str, block_gate: int = 512):
    """One-row (n_rows, b0, b1, b2) — EXACT two-regressor ordinary least
    squares of extendedprice (cents) on (quantity, discount·100) with
    intercept, solved by Cramer's rule over the 3×3 normal equations:
    every determinant is an exact integer polynomial of the nine moment
    sums (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂², Σx₁y, Σx₂y — ≤ ~1e27 at
    sf 0.1, HUGEINT-range), and each coefficient is ONE division of two
    exact integers — the multi-feature extension of the existing
    single-regressor slope_price_qty_returnflag, bitwise-identical
    cross-engine. Singular design (det = 0) reports 0.0 coefficients.

    Scale shape: per-batch 9-moment partials are ONE row per batch →
    shared gated cell fold on a constant key; driver math is O(1)."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x1 = pc.cast(pc.round(b.column("l_quantity")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        x2 = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100)),
                     pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), 100)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n": pa.array([len(x1)], pa.int64()),
            "s1": pa.array([int(x1.sum())], pa.int64()),
            "s2": pa.array([int(x2.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "s11": pa.array([int((x1 * x1).sum())], pa.int64()),
            "s12": pa.array([int((x1 * x2).sum())], pa.int64()),
            "s22": pa.array([int((x2 * x2).sum())], pa.int64()),
            "s1y": pa.array([int((x1 * y).sum())], pa.int64()),
            "s2y": pa.array([int((x2 * y).sum())], pa.int64())})

    cells = fold_cells(scan, partial, ["k"],
                       sums=["n", "s1", "s2", "sy", "s11", "s12", "s22",
                             "s1y", "s2y"],
                       block_gate=block_gate)
    if not len(cells):
        return pd.DataFrame({"n_rows": pd.Series([0], dtype=np.int64),
                             "b0": pd.Series([0.0]),
                             "b1": pd.Series([0.0]),
                             "b2": pd.Series([0.0])})
    r = cells.iloc[0]
    n, s1, s2, sy = int(r.n), int(r.s1), int(r.s2), int(r.sy)
    s11, s12, s22 = int(r.s11), int(r.s12), int(r.s22)
    s1y, s2y = int(r.s1y), int(r.s2y)
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) \
        + s2 * (s1 * s12 - s11 * s2)
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) \
        + s2 * (s1y * s12 - s11 * s2y)
    det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) \
        + s2 * (s1 * s2y - s1y * s2)
    det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) \
        + sy * (s1 * s12 - s11 * s2)
    if det == 0:
        b0 = b1 = b2 = 0.0
    else:
        b0 = float(det0) / float(det)
        b1 = float(det1) / float(det)
        b2 = float(det2) / float(det)
    return pd.DataFrame({"n_rows": pd.Series([n], dtype=np.int64),
                         "b0": pd.Series([b0], dtype=np.float64),
                         "b1": pd.Series([b1], dtype=np.float64),
                         "b2": pd.Series([b2], dtype=np.float64)})


OLS2_SQL = """
WITH v AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
                  CAST(round(l_discount * 100) AS BIGINT) AS x2,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS s1,
             CAST(sum(x2) AS HUGEINT) AS s2,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x1 * x1) AS HUGEINT) AS s11,
             CAST(sum(x1 * x2) AS HUGEINT) AS s12,
             CAST(sum(x2 * x2) AS HUGEINT) AS s22,
             sum(CAST(x1 AS HUGEINT) * y) AS s1y,
             sum(CAST(x2 AS HUGEINT) * y) AS s2y
      FROM v),
d AS (SELECT n,
        n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2) AS det,
        sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y) AS det0,
        n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2) AS det1,
        n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2) AS det2
      FROM m)
SELECT CAST(n AS BIGINT) AS n_rows,
       CASE WHEN det = 0 THEN 0.0
            ELSE CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) END AS b0,
       CASE WHEN det = 0 THEN 0.0
            ELSE CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) END AS b1,
       CASE WHEN det = 0 THEN 0.0
            ELSE CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) END AS b2
FROM d
"""


def theil_sen_daily_revenue(sf_dir: str, block_gate: int = 512):
    """One-row (n_days, n_pairs, theil_sen) — the Theil-Sen estimator of
    the daily-revenue trend over orders: the MEDIAN of all pairwise
    slopes (cents_j − cents_i)/(day_j − day_i), the robust-regression
    counterpart of :func:`ols2_price_qty_discount` (a 29% breakdown
    point vs OLS's zero). Exactness: daily revenue is the floor-cents
    integer fold, each slope is ONE division of two exact int64s (bitwise
    cross-engine), and the median is an order statistic of the identical
    slope multiset — with an odd pair count it IS one of the slopes; with
    an even count both engines average the same two middle doubles.

    Scale shape: per-day cells are CALENDAR-bounded (≈2.4k days in this
    corpus — constant in corpus size, like the EWMA/changepoint family)
    → shared gated cell fold; the O(days²) ≈ 3M-pair enumeration is
    driver-side numpy, invariant at any SF."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    scan = FusedParquetScan(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.timestamp("us")), pa.int64()),
            86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"d": d, "c": cents}).group_by("d").aggregate(
            [("c", "sum")])
        return pa.table({"d": pc.cast(g.column("d"), pa.int64()),
                         "c": pc.cast(g.column("c_sum"), pa.int64())})

    cells = fold_cells(scan, partial, ["d"], sums=["c"],
                       block_gate=block_gate)
    if len(cells) < 2:
        return pd.DataFrame({
            "n_days": pd.Series([len(cells)], dtype=np.int64),
            "n_pairs": pd.Series([0], dtype=np.int64),
            "theil_sen": pd.Series([0.0], dtype=np.float64)})
    cells = cells.sort_values("d")
    d = cells["d"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    # chunked slice arithmetic instead of triu_indices fancy indexing
    # (measured 5.6 s -> ~0.4 s at 2.4k days on one core); float subtract
    # of exactly-represented int64 cents == int subtract then cast
    n = len(d)
    cf = c.astype(np.float64)
    df = d.astype(np.float64)
    slopes = np.empty(n * (n - 1) // 2, np.float64)
    pos = 0
    for a in range(n - 1):
        m = n - 1 - a
        slopes[pos:pos + m] = (cf[a + 1:] - cf[a]) / (df[a + 1:] - df[a])
        pos += m
    return pd.DataFrame({
        "n_days": pd.Series([len(d)], dtype=np.int64),
        "n_pairs": pd.Series([len(slopes)], dtype=np.int64),
        "theil_sen": pd.Series([float(np.median(slopes))],
                               dtype=np.float64)})


THEIL_SEN_SQL = """
WITH dd AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                     AS d,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS c
            FROM orders GROUP BY 1),
p AS (SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
         AS slope
      FROM dd a JOIN dd b ON b.d > a.d)
SELECT CAST((SELECT count(*) FROM dd) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CASE WHEN count(*) = 0 THEN 0.0 ELSE median(slope) END AS theil_sen
FROM p
"""


def brown_forsythe_chars_langs(sf_dir: str,
                               langs: tuple = ("en", "de", "fr"),
                               block_gate: int = 512):
    """One-row (n_rows, m2_a, m2_b, m2_c, f) — the Brown-Forsythe test of
    VARIANCE homogeneity across three languages' document lengths: a
    one-way ANOVA F (the :func:`anova_f_qty_flag` spelling) applied to
    the absolute deviations from each group's MEDIAN — robust to the
    heavy right tails that break Bartlett/plain Levene. Exactness: the
    doubled group median m2 = (lower mid + upper mid) is an integer from
    the ordered value histogram, z = |2·v − m2| is integer per cell, and
    the F ratio reduces to ONE division of two exact integers via the
    shared product-of-group-sizes device (P = Πn_g, Anum = Σ s_g²·P/n_g):

        F = (Anum·N − S²·P)·(N−3) / ((T·P − Anum)·N·2)

    — HUGEINT-range in the oracle at the gate's SF (≤ ~1e30; Python ints
    driver-side are unbounded), 0.0 on any empty group or zero
    within-group spread.

    Scale shape: (lang, n_chars) cells are value-domain-bounded → shared
    gated cell fold; medians, z-moments and F are O(cells) driver math."""
    from ..sources.parquet import FusedParquetScan
    from ..stages.folds import fold_cells

    la, lb, lc = langs
    scan = FusedParquetScan(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("lang"),
                              value_set=pa.array(list(langs))))
        g = t.group_by(["lang", "n_chars"]).aggregate(
            [("n_chars", "count")])
        return pa.table({"lang": g.column("lang"),
                         "v": pc.cast(g.column("n_chars"), pa.int64()),
                         "c": pc.cast(g.column("n_chars_count"),
                                      pa.int64())})

    cells = fold_cells(scan, partial, ["lang", "v"], sums=["c"],
                       block_gate=block_gate)
    m2 = {}
    mom = {}
    for lg in langs:
        sub = cells[cells["lang"] == lg].sort_values("v") if len(cells) \
            else cells
        if not len(sub):
            m2[lg] = 0
            mom[lg] = (0, 0, 0)
            continue
        v = sub["v"].to_numpy(np.int64)
        cn = sub["c"].to_numpy(np.int64)
        n_g = int(cn.sum())
        cum = np.cumsum(cn)
        lo_rank = (n_g + 1) // 2
        hi_rank = (n_g + 2) // 2
        lo_v = int(v[np.searchsorted(cum, lo_rank)])
        hi_v = int(v[np.searchsorted(cum, hi_rank)])
        m2[lg] = lo_v + hi_v
        z = np.abs(2 * v - m2[lg])
        mom[lg] = (n_g, int((cn * z).sum()), int((cn * z * z).sum()))
    (n1, s1, ss1) = mom[la]
    (n2, s2, ss2) = mom[lb]
    (n3, s3, ss3) = mom[lc]
    n = n1 + n2 + n3
    s = s1 + s2 + s3
    t = ss1 + ss2 + ss3
    pp = n1 * n2 * n3
    anum = s1 * s1 * n2 * n3 + s2 * s2 * n1 * n3 + s3 * s3 * n1 * n2
    fnum = (anum * n - s * s * pp) * (n - 3)
    fden = (t * pp - anum) * n * 2
    f = 0.0 if pp == 0 or fden == 0 else float(fnum) / float(fden)
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype=np.int64),
        "m2_a": pd.Series([m2[la]], dtype=np.int64),
        "m2_b": pd.Series([m2[lb]], dtype=np.int64),
        "m2_c": pd.Series([m2[lc]], dtype=np.int64),
        "f": pd.Series([f], dtype=np.float64)})


BROWN_FORSYTHE_SQL = """
WITH c AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang IN ('en', 'de', 'fr') GROUP BY 1, 2),
t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
w AS (SELECT c.lang, c.v, c.c, t.n,
             CAST(COALESCE(sum(c.c) OVER (PARTITION BY c.lang ORDER BY c.v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum
      FROM c JOIN t USING (lang)),
mids AS (SELECT lang,
           CAST(sum(CASE WHEN cum < (n + 1) // 2
                          AND cum + c >= (n + 1) // 2
                         THEN v ELSE 0 END)
              + sum(CASE WHEN cum < (n + 2) // 2
                          AND cum + c >= (n + 2) // 2
                         THEN v ELSE 0 END) AS BIGINT) AS m2
         FROM w GROUP BY lang),
z AS (SELECT w.lang, abs(2 * w.v - m.m2) AS z, w.c
      FROM w JOIN mids m USING (lang)),
g AS (SELECT lang, CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(c * z) AS HUGEINT) AS s,
             CAST(sum(c * z * z) AS HUGEINT) AS ss
      FROM z GROUP BY 1),
piv AS (SELECT
          COALESCE(sum(n) FILTER (WHERE lang = 'en'), 0) AS n1,
          COALESCE(sum(s) FILTER (WHERE lang = 'en'), 0) AS s1,
          COALESCE(sum(ss) FILTER (WHERE lang = 'en'), 0) AS ss1,
          COALESCE(sum(n) FILTER (WHERE lang = 'de'), 0) AS n2,
          COALESCE(sum(s) FILTER (WHERE lang = 'de'), 0) AS s2,
          COALESCE(sum(ss) FILTER (WHERE lang = 'de'), 0) AS ss2,
          COALESCE(sum(n) FILTER (WHERE lang = 'fr'), 0) AS n3,
          COALESCE(sum(s) FILTER (WHERE lang = 'fr'), 0) AS s3,
          COALESCE(sum(ss) FILTER (WHERE lang = 'fr'), 0) AS ss3
        FROM g),
mp AS (SELECT
         COALESCE(sum(m2) FILTER (WHERE lang = 'en'), 0) AS m2a,
         COALESCE(sum(m2) FILTER (WHERE lang = 'de'), 0) AS m2b,
         COALESCE(sum(m2) FILTER (WHERE lang = 'fr'), 0) AS m2c
       FROM mids),
m AS (SELECT n1 + n2 + n3 AS n, s1 + s2 + s3 AS s,
             ss1 + ss2 + ss3 AS t, n1 * n2 * n3 AS pp,
             s1 * s1 * n2 * n3 + s2 * s2 * n1 * n3
               + s3 * s3 * n1 * n2 AS anum
      FROM piv),
ff AS (SELECT n, pp,
              (anum * n - s * s * pp) * (n - 3) AS fnum,
              (t * pp - anum) * n * 2 AS fden
       FROM m)
SELECT CAST(ff.n AS BIGINT) AS n_rows,
       CAST(mp.m2a AS BIGINT) AS m2_a, CAST(mp.m2b AS BIGINT) AS m2_b,
       CAST(mp.m2c AS BIGINT) AS m2_c,
       CASE WHEN ff.pp = 0 OR ff.fden = 0 THEN 0.0
            ELSE CAST(ff.fnum AS DOUBLE) / CAST(ff.fden AS DOUBLE) END AS f
FROM ff, mp
"""



# ---- Jarque-Bera normality screen on top of the moment fold ------------------

def jarque_bera_quantity_returnflag(sf_dir: str):
    """(l_returnflag, n_rows, jb) — the Jarque–Bera normality statistic of
    l_quantity per return flag, composed from the SAME one-scan exact
    integer power sums behind :func:`moments_quantity_returnflag`
    (k statistics never cost k passes):

        JB = n · (g1²/6 + g2²/24)

    over the bitwise-reproducible skewness g1 and excess kurtosis g2 —
    one more identically-spelled double composition, so JB matches the
    HUGEINT oracle bitwise. (Quantity is uniform, not normal: JB is the
    magnitude-of-non-normality demo, huge by design.)"""
    from ..stages.stats import grouped_moments

    li = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity"])
    m = grouped_moments(li, "l_returnflag", "l_quantity", scale=1)
    sk = m["skewness"].to_numpy(np.float64)
    ku = m["kurtosis_excess"].to_numpy(np.float64)
    n = m["n_rows"].to_numpy(np.int64).astype(np.float64)
    return pd.DataFrame({
        "l_returnflag": m[m.columns[0]],
        "n_rows": m["n_rows"].astype(np.int64),
        "jb": n * (sk * sk / 6.0 + ku * ku / 24.0)})


JARQUE_BERA_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s1,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s2,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s3,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS s4
  FROM lineitem GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, n,
         n*s2 - s1*s1 AS a,
         n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS b3,
         n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1 AS b4
  FROM m
),
g AS (
  SELECT l_returnflag, n,
         CAST(b3 AS DOUBLE)
           / (CAST(a AS DOUBLE) * sqrt(CAST(a AS DOUBLE))) AS g1,
         CAST(b4 AS DOUBLE) / (CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
           - 3.0 AS g2
  FROM d
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CAST(n AS DOUBLE) * (g1 * g1 / 6.0 + g2 * g2 / 24.0) AS jb
FROM g ORDER BY l_returnflag
"""
