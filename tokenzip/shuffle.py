"""Skew-resistant shuffle helpers.

``salted_sum`` is the hot-key salting technique the co-partitioned join and
window operators document as their 100-TB skew step (SURVEY.md §4.2),
shipped as a reusable primitive: a two-phase aggregate where phase 1 groups
by (keys + salt) so one hot key's rows spread across ``n_salts`` reducers
instead of funnelling into a single straggler group, and phase 2 folds the
bounded (n_groups × n_salts) partials. The result is identical to a direct
``groupby(keys).sum(cols)`` for any salt assignment — sums are associative
and the salt only splits partial groups — so retries/re-batching can never
change the answer.

When to use: a groupby whose key histogram is Zipf-ish enough that the
largest key holds a material fraction of ALL rows (viral documents, null-ish
default keys, one dominant source). When keys are balanced the extra phase
is pure overhead — measure before reaching for it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Sum

_SALT_COL = "__tz_salt__"


def salted_sum(
    ds,
    key_cols: list[str],
    sum_cols: list[str],
    n_salts: int = 16,
):
    """groupby(key_cols).sum(sum_cols) with hot-key salting.

    Returns a Dataset with columns ``key_cols + sum_cols`` (sums under
    their original names). ``n_salts`` bounds the per-key fan-out; the
    phase-2 shuffle moves at most n_salts rows per distinct key.
    """
    for c in (_SALT_COL,):
        if c in ds.schema().names:
            raise ValueError(f"input already carries reserved column {c!r}")

    def add_salt(b: pa.Table) -> pa.Table:
        # any row->salt map yields the same final sums; a cheap rotating
        # assignment spreads every key's rows evenly within the batch
        return b.append_column(
            _SALT_COL, pa.array(np.arange(b.num_rows, dtype=np.int64) % n_salts)
        )

    def unalias(b: pa.Table) -> pa.Table:
        # strip the aggregate's sum(col) aliases (and the salt key with
        # them) so both phases and the final output share one schema
        cols = {k: b[k] for k in key_cols}
        for c in sum_cols:
            cols[c] = b[f"sum({c})"]
        return pa.table(cols)

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_cols + [_SALT_COL])
        .aggregate(*[Sum(c) for c in sum_cols])
        .map_batches(unalias, batch_format="pyarrow", zero_copy_batch=True)
    )
    return (
        phase1.groupby(key_cols)
        .aggregate(*[Sum(c) for c in sum_cols])
        .map_batches(unalias, batch_format="pyarrow", zero_copy_batch=True)
    )


def detect_hot_keys(
    path: str, col: str, frac: float = 0.10
) -> np.ndarray:
    """Distributed hot-key detector for the salted joins: sorted int64 keys
    whose global row share MAY reach ``frac``.

    One column-pruned pass: each batch emits (key, count) partials only for
    keys holding >= frac/2 of the batch (so partial output stays tiny), then
    a bounded groupby-sum, then a driver threshold at frac/2 of total rows.
    The result is a certified SUPERSET of every key with global share >=
    frac: such a key holds < frac/2 of its rows in batches where its local
    share is < frac/2, so the batches that do report it carry >= frac/2 of
    the total — it always crosses the final threshold. Keys down to ~frac/4
    may also appear; extra entries only cost harmless salting."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    total = sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in ([path] if os.path.isfile(path) else
                  sorted(os.path.join(path, f) for f in os.listdir(path)
                         if f.endswith(".parquet")))
    )
    if total == 0:
        return np.array([], dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        keep = c >= max(1, int(np.ceil(frac / 2 * len(v))))
        return pa.table({"k": pa.array(u[keep]), "c": pa.array(c[keep].astype(np.int64))})

    agg = (
        ray.data.read_parquet(path, columns=[col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    if not len(agg):
        return np.array([], dtype=np.int64)
    keys = agg.loc[agg["c"] >= frac / 2 * total, "k"].to_numpy().astype(np.int64)
    return np.sort(keys)
