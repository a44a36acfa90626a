"""Flagship webtext validation pipeline — the north-star job.

Input: the Common-Crawl-style table ``(url, warc_ts, html, text, lang)``
(BASELINE.json ``input_hint``), read from Parquet or synthesized
deterministically (sources/webtext.py).

Stages (each a streaming Ray Data stage; html is projected away the moment
the extraction check is done — it is the widest column and must never cross
a shuffle, SURVEY.md §7.3):

1. **extraction check** — ``extract_text(html) == text`` byte-identically per
   url (north-star invariant), fused into the same map_batches pass as…
2. **row-level constraints** — the vectorized TablePlan (required/pattern/
   enum/byte-length/type) → verdicts + violations;
3. **uniqueness(url)** — two-phase groupby-count (stages/uniqueness.py);
4. **referential(lang)** — ISO-639 broadcast dictionary (stages/referential.py);
5. **stats / drift** — per-partition sketches → merged column stats, PSI vs a
   baseline lang histogram.

Outputs: verdicts dataset, violations dataset (all checks unioned, keyed
``(url, constraint_id)``), stats dataframe, drift report.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..errors import Mode
from ..functions.iso639 import ISO_639_1
from ..plan import TablePlan, compile_table_plan, evaluate_plan
from ..sources.webtext import extraction_matches_batch
from ..stages.drift import drift_check
from ..stages.referential import referential_violations
from ..stages.stats import column_stats
from ..stages.uniqueness import duplicate_keys
from ..stages.validate import VIOLATION_TYPE, flatten_violations, verdicts_only

WEBTEXT_SCHEMA = {
    "required": ["url", "text", "lang"],
    "properties": {
        "url": {"type": "string", "pattern": "^https?://", "maxLength": 2048},
        "text": {"type": "string", "minLength": 10, "maxLength": 1_000_000},
        "lang": {"type": "string", "minLength": 2, "maxLength": 2,
                 "pattern": "^[a-z]{2}$"},
    },
}


class WebtextValidator:
    """Actor-pool stage fusing the extraction check with the constraint plan:
    one pass over each batch, html read once and dropped immediately after.

    Output: ``(url, valid, error_count, violations)`` — same layout as
    stages/validate.BatchValidator."""

    def __init__(self, check_extraction: bool = True, mode: Mode = Mode.STRICT):
        self.plan: TablePlan = compile_table_plan(WEBTEXT_SCHEMA, "url", mode=mode)
        self.check_extraction = check_extraction

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        valid, error_count, fails = evaluate_plan(self.plan, batch)
        constraint_meta = [(c.constraint_id, c.column, c.tag, c.message)
                           for c in self.plan.constraints]
        message_fns = [c.message_fn for c in self.plan.constraints]

        if self.check_extraction and "html" in batch.column_names:
            same = extraction_matches_batch(batch)
            failed = np.flatnonzero(~same)
            fails = list(fails) + [failed]
            constraint_meta.append((
                "extract:text", "html", "extract",
                "extracted text is not byte-identical to the text column"))
            message_fns.append(None)
            if failed.size:
                valid[failed] = False
                error_count[failed] += 1

        from ..stages.validate import build_violations_column

        viol = build_violations_column(
            batch, n, fails, constraint_meta,
            skip_value_columns=frozenset({"html"}),  # never stringify payloads
            message_fns=message_fns)

        return pa.table({
            "url": batch.column("url"),
            "valid": pa.array(valid),
            "error_count": pa.array(error_count, type=pa.int32()),
            "violations": viol,
        })


def validate_webtext_files(files, *, check_extraction: bool = True,
                           batch_size: int = 16384,
                           columns: list[str] | None = None,
                           concurrency=None):
    """FUSED read+validate over parquet files: the driver lists one work
    item per ROW GROUP (footer metadata only), and each task reads its
    row group and runs the validator on its slices — read and validate in
    the same task. This is the operator fusion Ray Data does not perform
    across read boundaries in this build (measured: ReadParquet →
    MapBatches never fuses, so the decoded corpus — 18.7 GB at 16M rows —
    round-trips the object store; fused 8.1–10.4 s vs classic 12.6–17.5 s
    at 32 CPUs in the same window, byte-identical outputs, and it wins at
    8 CPUs too). Returns the combined verdict/violation dataset of
    :class:`WebtextValidator`.

    Scale note: work items are row groups (576 for the 16M-row bench
    corpus; ~4·10^6 at 10^12 docs — a driver list of that size is fine,
    or lift to per-file items past that)."""
    import pyarrow.parquet as pq

    import ray.data

    items = []
    for f in files:
        n = pq.ParquetFile(f).metadata.num_row_groups
        items.extend({"path": f, "rg": i} for i in range(n))
    v = WebtextValidator(check_extraction)

    def load_validate(batch):
        for p, rg in zip(batch["path"], batch["rg"]):
            t = pq.ParquetFile(p).read_row_group(int(rg), columns=columns)
            for off in range(0, t.num_rows, batch_size):
                yield v(t.slice(off, batch_size))

    kwargs: dict = dict(batch_size=1, batch_format="numpy")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ray.data.from_items(items).map_batches(load_validate, **kwargs)


# ---- ONE-scan multi-output wide checks -------------------------------------
# At 100 TB, every extra corpus scan dominates everything else: the classic
# run_webtext_pipeline consumes the input once per table-level check
# (uniqueness, referential, stats) on top of the validation pass. Measured
# (NOTES r3): running those three scans CONCURRENTLY is slower than serial
# (I/O contention, 17.8-28.5 s vs 13.2-14.9 s at 4M rows) — the fix is ONE
# pass with multiple small outputs. Each fused task reads its parquet row
# group and emits a single tagged union stream: validator verdict rows
# (violations nested), per-batch salted (bucket, url) uniqueness partials,
# ISO-639 lang violations, and per-batch column-stats sketch partials. The
# union is tiny relative to the corpus (keys + sketch bytes, never text), so
# it can be pinned once and served to all four consumers.

KIND_VERDICT, KIND_DUP, KIND_LANG, KIND_STATS = 0, 1, 2, 3


def _wide_schema() -> pa.Schema:
    from ..stages.stats import PARTIAL_SCHEMA

    fields = [("kind", pa.int8()),
              ("url", pa.string()),
              ("valid", pa.bool_()),
              ("error_count", pa.int32()),
              ("violations", pa.list_(VIOLATION_TYPE)),
              ("key_hash", pa.uint64()),
              ("partial_count", pa.int64()),
              ("bucket", pa.int32()),
              ("lang", pa.string()),
              ("constraint_id", pa.string())]
    fields += [(f.name, f.type) for f in PARTIAL_SCHEMA
               if f.name not in ("column",)] + [("column", pa.string())]
    return pa.schema(fields)


def _pad_wide(t: pa.Table, kind: int, schema: pa.Schema) -> pa.Table:
    """Sub-table → union layout: own columns kept (cast to the union
    type), absent ones null-padded (validity bitmap only — cheap)."""
    import numpy as np

    n = t.num_rows
    names = set(t.column_names)
    cols = {}
    for f in schema:
        if f.name == "kind":
            cols["kind"] = pa.array(np.full(n, kind, np.int8))
        elif f.name in names:
            c = t.column(f.name)
            cols[f.name] = c if c.type == f.type else pc.cast(c, f.type)
        else:
            cols[f.name] = pa.nulls(n, f.type)
    return pa.table(cols, schema=schema)


class WideChecksPass:
    """Fused per-batch pass: validation + uniqueness partials + lang
    referential + stats partials, one tagged union table out. Library-level
    class (repo rule for map_batches callables); the compiled plan, ISO set
    and sketch config load once per task/actor."""

    def __init__(self, check_extraction: bool = False, n_buckets: int = 64,
                 stats_columns: tuple = ("url", "text", "lang"),
                 hll_p: int = 14, dup_exchange: str = "string"):
        from ..stages.referential import _AntiJoin
        from ..stages.stats import StatsPartial
        from ..stages.uniqueness import _bucket_partial, _hash_partial

        self.validator = WebtextValidator(check_extraction)
        # dup_exchange="hash": partials carry the 8-byte url HASH, not the
        # url — the merge exchange moves ~4× fewer bytes and true strings
        # are recovered from the union's own verdict rows for the (few)
        # candidate hashes. Measured tradeoff (16-file A/B, 4M rows): the
        # hash path costs one extra exchange/scan round, and at single-node
        # bench scale Ray's ~2 s-per-exchange scheduling floor dominates
        # bytes (string 7.5-8.1 s total vs hash 10.1-11.5 s), while this
        # corpus's high dup multiplicity (2.57M of 4M per-block-distinct
        # instances are candidates) erases the byte savings. Default is
        # therefore "string"; choose "hash" when the exchange is
        # network-bound and the dup rate is low (the realistic 100-TB
        # crawl shape). Both paths are exact (collisions only ever ADD
        # recovery candidates) and pinned equal by test.
        self.dup_partial = (_hash_partial if dup_exchange == "hash"
                            else _bucket_partial)("url", n_buckets)
        self.anti = _AntiJoin("lang", "url", list(ISO_639_1),
                              "referential:lang")
        self.stats_cols = list(stats_columns)
        self.stats_partial = StatsPartial(self.stats_cols, hll_p=hll_p)
        self.schema = _wide_schema()

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = [
            (KIND_VERDICT, self.validator(batch)),
            (KIND_DUP, self.dup_partial(batch.select(["url"]))),
            (KIND_LANG, self.anti(batch.select(["url", "lang"]))),
            (KIND_STATS, self.stats_partial(batch.select(self.stats_cols))),
        ]
        return pa.concat_tables(
            [_pad_wide(t, k, self.schema) for k, t in parts])


def _dup_urls_from_union(combined, hash_partials, *,
                         hash_broadcast_limit: int = 8_000_000):
    """Exact duplicate urls from the wide-checks union, hash-first:

    1. merge the (key_hash, partial_count, bucket) partials per bucket —
       an 8-byte-key exchange — into candidate hashes with total count > 1
       (collisions only add candidates, never merge distinct urls);
    2. broadcast the candidate hashes (uint64 numpy, zero-copy via the
       object store) and re-count BY STRING only the urls whose hash is a
       candidate, reading them from the union's own verdict rows (the
       union is materialized — no second corpus read). Exact: every true
       dup's hash totals > 1, and the recovery counts true strings.

    Below the 512-block gate the candidate fold runs DRIVER-side (the
    gathered partials are blocks × per-block-distinct hash/count rows —
    ~20 B each — while a distributed groupby costs ~2 s of pure Sort
    scheduling at that block count, measured), so the whole dup check costs
    ONE distributed exchange; past the gate the candidate merge is its own
    hash-bucket exchange (8-byte keys). Past ``hash_broadcast_limit``
    candidates (≈64 MB of hashes — pathological dup rates) the recovery
    falls back to exchanging the url strings themselves, which is the
    pre-hash behavior."""
    import numpy as np
    import pandas as pd

    import ray
    import ray.data

    from ..stages.uniqueness import merge_duplicate_partials

    def _empty():
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "dup_count": pa.array([], pa.int64())}))

    hashes = None
    if combined.num_blocks() <= 512:
        df = hash_partials.to_pandas()
        if not len(df) or "key_hash" not in df.columns:
            return _empty()
        agg = df.groupby("key_hash", sort=False)["partial_count"].sum()
        hashes = agg.index.to_numpy().astype(np.uint64)[agg.to_numpy() > 1]
        n_cand = len(hashes)
        if n_cand > hash_broadcast_limit:
            hashes = None
    else:
        cand = merge_duplicate_partials(
            hash_partials, "key_hash").materialize()
        n_cand = cand.count()
        if 0 < n_cand <= hash_broadcast_limit:
            hashes = cand.to_pandas()["key_hash"].to_numpy() \
                .astype(np.uint64)
    if n_cand == 0:
        return _empty()

    def url_counts(b: pa.Table, keep=None) -> pa.Table:
        sub = b.select(["url", "kind"])
        sub = sub.filter(pc.equal(sub.column("kind"),
                                  pa.scalar(KIND_VERDICT, pa.int8())))
        vc = sub.column("url").value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        vals = pc.struct_field(vc, "values")
        cnts = pc.struct_field(vc, "counts")
        h = pd.util.hash_pandas_object(
            vals.to_pandas(), index=False).to_numpy()
        if keep is not None:
            m = np.isin(h, ray.get(keep))
            vals, cnts, h = (vals.filter(pa.array(m)),
                             cnts.filter(pa.array(m)), h[m])
        bucket = (h & np.uint64(63)).astype(np.int32)
        return pa.table({"url": vals, "partial_count": cnts,
                         "bucket": pa.array(bucket)})

    if hashes is not None:
        ref = ray.put(hashes)
        partials = combined.map_batches(
            lambda b: url_counts(b, keep=ref), batch_format="pyarrow")
    else:
        partials = combined.map_batches(url_counts, batch_format="pyarrow")
    return merge_duplicate_partials(partials, "url")


def wide_checks_files(files, *, check_extraction: bool = False,
                      batch_size: int = 16384, n_buckets: int = 64,
                      concurrency=None,
                      dup_exchange: str = "string") -> "WebtextReport":
    """ONE fused read+validate+checks scan over parquet files (one task per
    row group, sources/parquet.fused_map_parquet pattern) → WebtextReport
    whose verdicts / violations / dup_urls / lang_violations / stats all
    derive from a single corpus pass. The tagged union intermediate (keys,
    verdicts and sketch bytes — never text/html) is materialized once and
    filtered per consumer; at petabyte scale write it to Parquet instead and
    derive the same views from the files (sinks/resumable.py).

    Outputs are content-identical to run_webtext_pipeline's (pinned by
    tests/test_webtext_wide_fused.py); only partial-row batching differs,
    which every downstream merge is commutative over (HLL register max,
    count sums, min/max)."""
    import pyarrow.parquet as pq

    import ray.data

    from ..stages.stats import PARTIAL_SCHEMA, merge_partials

    cols = ["url", "text", "lang"] + (["html"] if check_extraction else [])
    items = []
    for f in files:
        n = pq.ParquetFile(f).metadata.num_row_groups
        items.extend({"path": f, "rg": i} for i in range(n))
    w = WideChecksPass(check_extraction, n_buckets,
                       dup_exchange=dup_exchange)

    def load_sweep(batch):
        for p, rg in zip(batch["path"], batch["rg"]):
            t = pq.ParquetFile(p).read_row_group(int(rg), columns=cols)
            for off in range(0, t.num_rows, batch_size):
                yield w(t.slice(off, batch_size))

    kwargs: dict = dict(batch_size=1, batch_format="numpy")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    combined = ray.data.from_items(items).map_batches(load_sweep, **kwargs) \
        .materialize()

    def _select(kind: int, out_cols: list[str]):
        def f(b: pa.Table) -> pa.Table:
            # prune BEFORE filtering: consumers must never drag the other
            # kinds' columns (esp. the verdicts' violations lists) through
            # their filter pass
            sub = b.select(out_cols + ["kind"])
            sub = sub.filter(pc.equal(sub.column("kind"),
                                      pa.scalar(kind, pa.int8())))
            return sub.drop_columns(["kind"])

        return combined.map_batches(f, batch_format="pyarrow")

    verdicts = _select(KIND_VERDICT, ["url", "valid", "error_count"])
    row_viol = flatten_violations(
        _select(KIND_VERDICT, ["url", "valid", "error_count", "violations"]))
    if dup_exchange == "hash":
        dups = _dup_urls_from_union(
            combined,
            _select(KIND_DUP, ["key_hash", "partial_count", "bucket"]))
    else:
        from ..stages.uniqueness import merge_duplicate_partials

        dups = merge_duplicate_partials(
            _select(KIND_DUP, ["url", "partial_count", "bucket"]), "url")
    langs = _select(KIND_LANG, ["url", "lang", "constraint_id"])
    stats_partials = _select(KIND_STATS, [f.name for f in PARTIAL_SCHEMA])
    if combined.num_blocks() <= 512:
        # a groupby over a few hundred TINY partial rows spread across
        # ~150 blocks costs ~2.3 s of pure Sort scheduling (measured) —
        # below the block gate, fold driver-side (blocks × columns rows,
        # every merge commutative) and wrap for API parity
        import pandas as pd

        sdf = stats_partials.to_pandas()
        if "column" in sdf.columns and len(sdf):
            merged = pd.concat(
                [merge_partials(g)
                 for _, g in sdf.groupby("column", sort=True)],
                ignore_index=True)
        else:                      # empty corpus loses block schema
            merged = pd.DataFrame({"column": pd.Series([], dtype=object)})
        stats = ray.data.from_pandas(merged)
    else:
        stats = stats_partials.groupby("column").map_groups(
            merge_partials, batch_format="pandas")

    return WebtextReport(
        verdicts=verdicts, violations=row_viol, row_violations=row_viol,
        dup_urls=dups, lang_violations=langs, stats=stats, drift=None)


@dataclass
class WebtextReport:
    verdicts: Any          # Dataset (url, valid, error_count)
    violations: Any        # Dataset (url, constraint_id, column, tag, message)
    row_violations: Any    # same as violations (row-level only)
    dup_urls: Any          # Dataset (url, dup_count)
    lang_violations: Any   # Dataset (url, lang, constraint_id)
    stats: Any             # pandas DataFrame, one row per column
    drift: Any             # DriftReport | None


def run_webtext_pipeline(ds, *,
                         check_extraction: bool = True,
                         baseline_lang_hist: str | None = None,
                         batch_size: int = 8192,
                         concurrency: int | None = None,
                         materialize_combined: bool = False) -> WebtextReport:
    """Full validation job over a webtext dataset. The input dataset is
    consumed stream-wise per stage; ``html`` is only read by the validator
    stage.

    ``materialize_combined=True`` pins the combined verdict/violation output
    in the object store so consuming BOTH verdicts and violations costs one
    validation pass instead of two. The combined output is a few percent of
    input size (no html/text). At petabyte scale prefer writing it to
    Parquet once (sinks/resumable.py) and deriving both views from the
    files; materialize() is the same idea bounded by object-store capacity.
    """
    kwargs: dict = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        combined = ds.map_batches(WebtextValidator,
                                  fn_constructor_args=(check_extraction,),
                                  concurrency=(1, concurrency), **kwargs)
    else:
        combined = ds.map_batches(WebtextValidator(check_extraction), **kwargs)
    if materialize_combined:
        combined = combined.materialize()

    verdicts = verdicts_only(combined)
    row_viol = flatten_violations(combined)

    slim = ds.select_columns(["url", "lang"])
    dups = duplicate_keys(slim, "url")
    lang_viol = referential_violations(slim, "lang", "url", ISO_639_1)

    stats = column_stats(ds.select_columns(["url", "text", "lang"]))

    drift = None
    if baseline_lang_hist is not None:
        drift = drift_check(slim, "lang", baseline_lang_hist)

    return WebtextReport(
        verdicts=verdicts, violations=row_viol, row_violations=row_viol,
        dup_urls=dups, lang_violations=lang_viol, stats=stats, drift=drift)


def unified_violations(rpt: WebtextReport):
    """One violations table across every check, keyed ``(url, constraint_id)``
    per the north star: row-level constraint violations ∪ uniqueness ∪
    referential, all reduced to the common (url, constraint_id, tag, message)
    layout and unioned as a single Dataset."""

    def norm_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b.column("url"),
            "constraint_id": b.column("constraint_id"),
            "tag": b.column("tag"),
            "message": b.column("message"),
        })

    def norm_dups(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "url": b.column("url"),
            "constraint_id": pa.array(["uniqueness:url"] * n),
            "tag": pa.array(["uniqueness"] * n),
            "message": pa.array(
                [f"url occurs {c} times" for c in b.column("dup_count").to_pylist()]),
        })

    def norm_lang(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "url": b.column("url"),
            "constraint_id": b.column("constraint_id"),
            "tag": pa.array(["referential"] * n),
            "message": pa.array(
                [f"lang {v!r} is not an ISO-639-1 code"
                 for v in b.column("lang").to_pylist()]),
        })

    rows = rpt.row_violations.map_batches(norm_rows, batch_format="pyarrow")
    dups = rpt.dup_urls.map_batches(norm_dups, batch_format="pyarrow")
    langs = rpt.lang_violations.map_batches(norm_lang, batch_format="pyarrow")
    return rows.union(dups).union(langs)
