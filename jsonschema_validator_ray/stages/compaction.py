"""Keep-latest-per-key compaction — the CDC / crawl-snapshot dedup shape:
of every row sharing a key tuple, keep the one with the greatest order
value (latest ``warc_ts`` per url in a Common-Crawl re-crawl, last change
per primary key in a change log), with a deterministic tiebreak column so
the survivor is unique.

Distributed shape: ONE all-to-all of the table keyed by a hash bucket of
the key tuple (never one Ray group per distinct key; see repo conventions), then a
single pandas C-path ``sort_values`` + ``drop_duplicates`` per bucket.
Output carries full rows (inherent to compaction); at 100 TB the shuffle
payload is the surviving-column subset the caller projects BEFORE calling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def keep_latest(ds, keys: list[str], order: str, *, tiebreak: str,
                num_buckets: int = 64, batch_size: int = 65536):
    """→ Dataset with exactly one row per distinct ``keys`` tuple: the row
    with the greatest ``order`` value, ties broken by greatest
    ``tiebreak`` (pass a unique column — e.g. the event/row id — so the
    result is deterministic). Null ``order`` sorts first (i.e. loses to
    any non-null), matching SQL ``ORDER BY order DESC NULLS LAST``."""

    def add_bucket(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__kb", pa.array([], pa.int32()))
        h = pd.util.hash_pandas_object(
            b.select(keys).to_pandas(), index=False).to_numpy()
        kb = (h.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("__kb", pa.array(kb))

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(keys + [order, tiebreak], kind="mergesort",
                             ascending=[True] * len(keys) + [False, False],
                             na_position="last")
                .drop_duplicates(subset=keys, keep="first"))
        return out.drop(columns="__kb")

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__kb")
              .map_groups(latest, batch_format="pandas"))
