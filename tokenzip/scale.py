"""Deterministic N-x replication of the relational testdata tables.

``replicate_tables(src, dst, factor)`` tiles every fact table ``factor``
times with per-replica key remapping (key + r * stride, stride = the source
domain's max+1), so primary keys stay unique, every foreign-key edge keeps
pointing inside its own replica, and all value distributions are preserved
exactly. Dimension tables (region, nation) are fixed domains and are copied
unchanged. The result is a larger corpus with the SAME statistical shape as
the source — the measured point for the scale claims in BASELINE.md (the
reference evidences scale with bigger generated inputs the same way:
/root/reference/benches/varint_bench/main.rs generates its vectors by size).

Replication is exact-copy by design: sums/counts at factor N are exactly
N x the source's (averages unchanged), which doubles as a self-oracle —
see tests/test_scale.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# (table, [columns remapped by that table's own PK-domain stride keyed by
# the named domain]) — a column maps to the domain whose stride it shares.
_DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}

_REMAP = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    # events.user_id joins orders.o_custkey (the as-of/range joins), so it
    # shares the custkey stride — replica r's events meet replica r's orders
    "events": {"event_id": "eventid", "user_id": "custkey"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

_COPY = ["region", "nation"]

# ~128k-row groups so Ray's parquet reader still splits each file into
# enough read tasks to saturate the CPUs
_ROW_GROUP = 128 * 1024


def _strides(src: str) -> dict[str, int]:
    out = {}
    for dom, (table, col) in _DOMAINS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        out[dom] = int(pa.compute.max(t[col]).as_py()) + 1
    return out


def _replicate_one(
    src_path: str, dst_path: str, remap: dict[str, str],
    strides: dict[str, int], factor: int, shard: bool,
) -> int:
    t = pq.read_table(src_path)
    cols = {name: t[name].combine_chunks() for name in t.column_names}
    if shard:
        os.makedirs(dst_path, exist_ok=True)
    reps = []
    for r in range(factor):
        rep = {}
        for name in t.column_names:
            if r and name in remap:
                base = cols[name].to_numpy(zero_copy_only=False)
                rep[name] = pa.array(
                    base.astype(np.int64) + r * strides[remap[name]],
                    type=cols[name].type,
                )
            else:
                rep[name] = cols[name]
        if shard:
            pq.write_table(
                pa.table(rep),
                os.path.join(dst_path, f"part-{r:04d}.parquet"),
                row_group_size=_ROW_GROUP,
            )
        else:
            reps.append(pa.table(rep))
    if shard:
        return len(t) * factor
    out = pa.concat_tables(reps)
    pq.write_table(out, dst_path, row_group_size=_ROW_GROUP)
    return len(out)


def replicate_tables(
    src: str, dst: str, factor: int, shard: bool = False
) -> dict[str, int]:
    """Tile every table at ``src`` ``factor`` times into ``dst`` with
    per-replica key remapping. Returns {table: n_rows_written}.

    ``shard=True`` writes each fact table as a DIRECTORY named
    ``<table>.parquet`` holding one part file per replica. Ray's parquet
    reader launches one read task per FILE, so a single-file 10x table
    serializes the scan (measured: the read task is ~75% of pricing_summary's
    wall at factor 10 and 8->32 cpus gains nothing); the sharded layout is
    how real scale corpora must be stored. Engine metadata helpers are
    shard-transparent; DuckDB oracles want the single-file layout."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    os.makedirs(dst, exist_ok=True)
    strides = _strides(src)
    counts = {}
    for table in _COPY:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        counts[table] = len(t)
    for table, remap in _REMAP.items():
        counts[table] = _replicate_one(
            os.path.join(src, f"{table}.parquet"),
            os.path.join(dst, f"{table}.parquet"),
            remap, strides, factor, shard,
        )
    return counts
