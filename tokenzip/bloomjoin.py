"""Bloom-filter semi-join: broadcast a compact bitset of the filtered
build-side join keys, probe-side batches test membership with two
splitmix64 hash probes BEFORE the exact check.

Beyond-reference operator (the reference, /root/reference/src/lib.rs, is a
varint codec library with no joins); the Bloom filter itself is the
published construction (Bloom, CACM 1970) with the standard double-hashing
probe schedule (Kirsch & Mitzenmacher, ESA 2006: g_i = h1 + i*h2).

Distributed shape
-----------------
* Build side (orders filtered to one priority class) is the SMALL side by
  definition of a broadcast semi-join — read column-pruned + row-filtered,
  folded to a sorted unique key array driver-side (same dimension-table
  contract as relational._dim_lookup), then `ray.put` ONCE: the probe-side
  fact table never shuffles.
* At 100 TB the build fold stays distributed: per-batch partial bitmaps
  OR-merge (elementwise, associative + commutative) so the driver only ever
  holds the m/8-byte bitset, and bloom SURVIVORS flow through the
  co-partitioned key shuffle the anti join already implements
  (relational.q_orders_without_lineitems) instead of a broadcast exact
  array. The bitmap is sized at BITS_PER_KEY bits/key, so a 10^9-key build
  side is a 2 GB bitset — broadcastable where the key array may not be.
* The probe stage self-audits the filter on every batch: a true member
  failing the bloom (impossible by construction, so it catches bitmap /
  hash-kernel bugs) raises loudly, and the driver asserts the measured
  false-positive rate stays under FPR_BOUND (an all-ones bitmap would pass
  rows+schema checks but is a broken filter — the audit makes it red).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from tokenzip.pipeline import _default_concurrency
from tokenzip.bloom import BITS_PER_KEY, N_PROBES, _probe_positions, bloom_build, bloom_probe  # noqa: F401
from tokenzip.relational import _hund

# The bloom kernel (bloom_build / bloom_probe / splitmix64 probes) lives in
# tokenzip.bloom — shared with the per-chunk doc-id bloom zone filters on
# the token sink. Re-exported here for the semi-join's public surface.
FPR_BOUND = 0.05


def _build_side(sf_dir: str, priority: str) -> np.ndarray:
    """Sorted unique o_orderkey of the filtered build side — column-pruned,
    row-filtered at the read (only two narrow columns leave storage)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).filter(expr=f"o_orderpriority == '{priority}'")
    parts = [
        np.unique(b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


class _BloomProbeStage:
    """Probe-side actor: bloom filter first, exact searchsorted membership
    on survivors only, per-returnflag partials + per-batch audit counters.
    Bitmap + exact key array fetched ONCE per actor from the object store."""

    def __init__(self, bcast_ref):
        from tokenzip.stages import _bget

        self.words, self.keys = _bget(bcast_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = _hund(batch["l_quantity"])
        flag = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        bmask = bloom_probe(self.words, lk)
        emask = np.zeros(len(lk), dtype=bool)
        if len(self.keys) == 0:
            bmask = emask  # empty build side: no members, nothing to audit
        elif bmask.any():
            surv = lk[bmask]
            pos = np.searchsorted(self.keys, surv)
            ok = (pos < len(self.keys)) & (
                self.keys[np.clip(pos, 0, max(len(self.keys) - 1, 0))] == surv
            )
            emask[np.flatnonzero(bmask)[ok]] = True
        # bloom filters have NO false negatives — a member that failed the
        # probe means the bitmap or hash kernel is corrupt, not "a miss"
        if len(self.keys):
            chk = np.searchsorted(self.keys, lk)
            truth = (chk < len(self.keys)) & (
                self.keys[np.clip(chk, 0, len(self.keys) - 1)] == lk
            )
            if bool((truth & ~bmask).any()):
                raise ValueError(
                    "bloom false negative: bitmap/hash kernel corrupt"
                )
        uniq, inv = np.unique(flag[emask], return_inverse=True)
        names = [str(s) for s in uniq] + ["\0audit"]
        n_items = np.append(
            np.bincount(inv, minlength=len(uniq)).astype(np.int64), 0
        )
        sq = np.append(
            np.bincount(inv, weights=qty[emask], minlength=len(uniq)).astype(np.int64),
            0,
        )
        n_rows = np.append(np.zeros(len(uniq), np.int64), len(lk))
        n_bloom = np.append(np.zeros(len(uniq), np.int64), int(bmask.sum()))
        n_exact = np.append(np.zeros(len(uniq), np.int64), int(emask.sum()))
        return pa.table(
            {
                "l_returnflag": pa.array(names, pa.string()),
                "n_items": pa.array(n_items),
                "sum_qty_hund": pa.array(sq),
                "n_rows": pa.array(n_rows),
                "n_bloom_pass": pa.array(n_bloom),
                "n_exact_pass": pa.array(n_exact),
            }
        )


def q_lineitem_semijoin_bloom(
    sf_dir: str, priority: str = "1-URGENT"
) -> pd.DataFrame:
    """lineitem SEMI JOIN (orders WHERE o_orderpriority = priority) rolled
    up per returnflag: (l_returnflag, n_items, sum_qty_hund). One fact-table
    scan; the '\\0audit' sentinel rows carry the bloom-vs-exact counters
    through the same tiny groupby, asserted and dropped before returning."""
    from tokenzip.stages import _bcast

    keys = _build_side(sf_dir, priority)
    ref = _bcast((bloom_build(keys), keys))
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_quantity", "l_returnflag"],
        )
        .map_batches(
            _BloomProbeStage,
            fn_constructor_args=(ref,),
            concurrency=(1, max(2, _default_concurrency() // 2)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_items"),
            Sum("sum_qty_hund"),
            Sum("n_rows"),
            Sum("n_bloom_pass"),
            Sum("n_exact_pass"),
        )
        .to_pandas()
    )
    audit = agg[agg["l_returnflag"] == "\0audit"]
    rows = int(audit["sum(n_rows)"].sum())
    n_bloom = int(audit["sum(n_bloom_pass)"].sum())
    n_exact = int(audit["sum(n_exact_pass)"].sum())
    negatives = rows - n_exact
    fpr = (n_bloom - n_exact) / negatives if negatives else 0.0
    if n_bloom < n_exact or fpr > FPR_BOUND:
        raise ValueError(
            f"bloom audit failed: rows={rows} bloom_pass={n_bloom} "
            f"exact={n_exact} fpr={fpr:.4f} (bound {FPR_BOUND})"
        )
    out = agg[agg["l_returnflag"] != "\0audit"]
    out = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"].astype(str),
            "n_items": out["sum(n_items)"].astype("int64"),
            "sum_qty_hund": out["sum(sum_qty_hund)"].astype("int64"),
        }
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


def lineitem_semijoin_bloom_sql(priority: str = "1-URGENT") -> str:
    return f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_hund
FROM lineitem
WHERE l_orderkey IN
      (SELECT o_orderkey FROM orders WHERE o_orderpriority = '{priority}')
GROUP BY l_returnflag ORDER BY l_returnflag
"""
