"""Local stand-in for the driver's correctness gate: run every ``queries()``
entry AND its ``oracle_sql()`` SQL over the same parquet tables, compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
(names filter the run to just those queries; default = all)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df):
    import pandas as pd

    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            # EXACT float compare (CLAUDE.md: arithmetic-identical floats via
            # integer-scaled values) — rounding here could mask drift the
            # driver's stricter gate would catch (ADVICE r1). repr() keeps
            # full precision and makes NaN == NaN for the string compare.
            df[c] = df[c].map(repr)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    # same benign-noise config as bench.py: empty-block RefBundle schema
    # warnings from group-heavy queries and the unhashable-pandas-schema
    # dedup message would otherwise spam the replay tail
    for noisy in ("ray.data._internal.arrow_ops.transform_pyarrow",
                  "ray.data._internal.execution.streaming_executor_state"):
        logging.getLogger(noisy).setLevel(logging.ERROR)

    import __ray_entry__ as ent

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"[FAIL] unknown query names: {unknown}")
            return 1
        qs = {n: qs[n] for n in only}
    failures = 0
    for name, fn in qs.items():
        sql = oracles.get(name)
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[FAIL] {name}: ray query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(ours)} rows, cols={list(ours.columns)}")
            continue
        try:
            theirs = canon(con.execute(sql).df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL raised {e}")
            failures += 1
            continue
        ok_rows = len(ours) == len(theirs)
        ok_cols = list(ours.columns) == list(theirs.columns)
        ok_vals = ok_rows and ok_cols and ours.equals(theirs)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"[{status}] {name}: rows {len(ours)}/{len(theirs)} cols_ok={ok_cols} vals_ok={ok_vals}")
            if ok_cols and ok_rows:
                neq = (ours != theirs).any(axis=1)
                print("  first diffs ours:\n", ours[neq].head(3))
                print("  first diffs oracle:\n", theirs[neq].head(3))
            else:
                print("  ours cols:", list(ours.columns), "oracle cols:", list(theirs.columns))
        else:
            print(f"[OK]   {name}: {len(ours)} rows")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only=sys.argv[2:] or None))
