"""Job runner — the ``ray job submit`` entry point.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m jsonschema_validator_ray.cli \
        --input '/data/webtext/*.parquet' --out /data/validated \
        --schema schema.json --key url --partitions 256

In this sandbox (single node, local mode) the same command runs directly:
``python -m jsonschema_validator_ray.cli ...`` — the runner owns the Ray
session (guarded init), making it the one module in the package allowed to
call ``ray.init``.

Resumable by construction: input files are partitioned deterministically,
outputs + lineage manifests land under ``--out`` (sinks/resumable.py), and a
re-run of the identical command after a kill skips completed partitions.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def build_pipeline(schema: dict | None, key: str, mode: str,
                   check_extraction: bool):
    """A user-supplied ``--schema`` ALWAYS wins (the extraction check is a
    webtext-schema feature and only applies on the default path — previously
    a custom schema was silently ignored unless --no-extraction-check was
    also passed)."""
    from .errors import Mode
    from .pipelines.webtext import WebtextValidator
    from .stages.validate import BatchValidator, verdicts_only

    m = Mode.LOOSE if mode == "loose" else Mode.STRICT

    def pipeline(ds):
        if schema is None and check_extraction:
            validator = WebtextValidator(True, mode=m)
        elif schema is None:
            from .pipelines.webtext import WEBTEXT_SCHEMA

            validator = BatchValidator(WEBTEXT_SCHEMA, key, m)
        else:
            validator = BatchValidator(schema, key, m)
        combined = ds.map_batches(validator, batch_format="pyarrow",
                                  batch_size=16384)
        return combined  # verdicts + violations list column, written as one table

    return pipeline


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="jsonschema_validator_ray")
    p.add_argument("--input", required=True,
                   help="input parquet glob(s), comma-separated")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--schema", default=None,
                   help="path to a JSON table-schema file (default: the "
                        "webtext flagship schema)")
    p.add_argument("--key", default="url", help="key column for verdicts")
    p.add_argument("--mode", choices=["strict", "loose"], default="strict")
    p.add_argument("--partitions", type=int, default=16,
                   help="resumable partition count (>= cluster cores; "
                        "partition count >> nodes keeps stragglers cheap)")
    p.add_argument("--wave-size", type=int, default=4)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for local runs; on a cluster leave unset")
    p.add_argument("--no-extraction-check", action="store_true")
    p.add_argument("--checksum", action="store_true",
                   help="record an order-independent integrity checksum of "
                        "each partition's (key, valid) rows in its lineage "
                        "manifest (verify later with --verify-out)")
    p.add_argument("--verify-out", action="store_true",
                   help="instead of running, audit --out: recompute every "
                        "checksummed partition's checksum from disk and "
                        "report mismatches (exit 1 if any)")
    p.add_argument("--pipeline", choices=["validate", "prep"],
                   default="validate",
                   help="validate (default): resumable verdict/violation "
                        "job; prep: the LLM training-data chain (quality "
                        "gate → dedup → near-dup clusters → packing)")
    p.add_argument("--text-col", default="text",
                   help="[prep] text column name")
    p.add_argument("--pack-budget", type=int, default=512,
                   help="[prep] tokens per training pack")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .sinks.resumable import (partition_input_files, run_resumable,
                                  verify_output)

    if args.verify_out:
        rep = verify_output(args.out)
        print(json.dumps(rep))
        ray.shutdown()
        return 1 if rep["mismatched"] else 0

    if args.schema:
        with open(args.schema) as f:
            schema = json.load(f)
    else:
        schema = None  # build_pipeline applies WEBTEXT_SCHEMA (+ extraction)

    files: list[str] = []
    for pat in args.input.split(","):
        files.extend(glob.glob(pat))
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2

    if args.pipeline == "prep":
        # the prep chain contains global stages (dedup shuffle, cluster
        # resolution), so it runs as one job writing partitioned parquet —
        # not the per-partition resumable layout of the validate job
        import ray.data

        from .sources.parquet import read_parquet

        from .pipelines.prep import prepare_training_data

        t0 = time.time()
        ds = read_parquet(files,
                                   columns=[args.key, args.text_col])
        packed, stats = prepare_training_data(
            ds, key=args.key, text=args.text_col,
            pack_budget=args.pack_budget)
        packed.write_parquet(args.out)
        stats["elapsed_sec"] = round(time.time() - t0, 2)
        print(json.dumps(stats))
        ray.shutdown()
        return 0

    parts = partition_input_files(files, args.partitions)
    pipeline = build_pipeline(schema, args.key, args.mode,
                              check_extraction=not args.no_extraction_check)

    def verdict_metrics(out_files: list[str]) -> dict:
        """Per-partition metrics for the lineage manifest (north star:
        'per-partition lineage + metrics'): valid/invalid/violation counts,
        read back from the written verdict columns only (columnar, cheap)."""
        import pyarrow.parquet as pq

        n_valid = n_rows = n_viol = 0
        for f in out_files:
            t = pq.read_table(f, columns=["valid", "error_count"])
            n_rows += t.num_rows
            import pyarrow.compute as pc

            n_valid += pc.sum(pc.cast(t.column("valid"), "int64")).as_py() or 0
            n_viol += pc.sum(t.column("error_count")).as_py() or 0
        return {"rows": n_rows, "valid": n_valid,
                "invalid": n_rows - n_valid, "violations": int(n_viol)}

    t0 = time.time()
    summary = run_resumable(parts, args.out, pipeline,
                            metrics_fn=verdict_metrics,
                            checksum_cols=[args.key, "valid"]
                            if args.checksum else None,
                            wave_size=args.wave_size)
    summary["elapsed_sec"] = round(time.time() - t0, 2)
    summary["n_partitions"] = len(parts)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
