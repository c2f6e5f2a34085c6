"""Time-keyed relational operators Ray Data lacks natively: a distributed
AS-OF join and a sliding-window aggregate, both built from the engine's
established co-partitioning primitives (hash-bucket the equality key ->
``groupby(bucket)`` -> one vectorized sort-merge per group — the same
bounded-group-count layout the LSH dedups use, see analysis._lsh_n_buckets).

Both operators quantize timestamps to MILLISECONDS (``epoch_us // 1000``)
so every comparison is exact int64 arithmetic — no float time math — and
both emit integer-only aggregates (counts, cent-sums, modular checksums)
that the DuckDB oracles (tokenzip.oracles.events_*_sql) recompute exactly.

Partitioning assumption (SURVEY.md §4.2): all rows of one join/window key
land in one hash bucket, so a single viral key concentrates in one group.
Group work is O(k log k) (one lexsort + searchsorted), so a k-row hot key
costs k log k, not k^2; at 100 TB, salt the hot key by a coarse time range
and merge the per-range as-of frontiers.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Sum

from tokenzip.analysis import (
    _PAIR_K,
    _PAIR_MOD,
    _int_group_sums,
    _jbkt_of,
    _lsh_n_buckets,
)
from tokenzip.pipeline import _default_concurrency

# rank << _T_SHIFT + (t_ms - group_min) must stay < 2^63: 2^42 ms ~ 139
# years of in-group time span, leaving 2^21 distinct keys per bucket group
# (groups are sized to ~32k rows, so ranks never approach that).
_T_SHIFT = 42


def _row_count(path: str) -> int:
    """Row count from parquet METADATA only — accepts a single file or a
    sharded table (a directory of part files): single-file reads serialize
    (one Ray read task per file), so scale corpora are sharded and every
    metadata helper must be shard-transparent."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def _ts_ms(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp[us] column -> int64 epoch milliseconds (floor division —
    identical to the oracle's ``epoch_us(ts) // 1000``; both engines see
    non-negative epochs, asserted loudly below)."""
    us = col.combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    if len(us) and int(us.min()) < 0:
        raise ValueError("relational ops require timestamps >= epoch")
    return us // 1000


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    """DOUBLE currency -> exact int64 cents via floor(x*100 + 0.5) — the
    identical expression the SQL oracle uses (round-half-up for the
    non-negative amounts both tables carry)."""
    v = col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def isum64(inv: np.ndarray, weights: np.ndarray, minlength: int = 0) -> np.ndarray:
    """Exact int64 grouped sum. ``np.bincount(weights=...)`` accumulates in
    float64 and silently loses exactness above 2**53 — fatal for the exact
    monetary sums the oracles hash against at the 10^12-row design scale —
    so sum through an int64 accumulator with ``np.add.at`` instead (the same
    pattern queries.py uses for its token zigzag sums)."""
    n = int(inv.max()) + 1 if len(inv) else 0
    out = np.zeros(max(minlength, n), dtype=np.int64)
    if len(inv):
        np.add.at(out, inv, weights.astype(np.int64, copy=False))
    return out


def _comp_keys(key: np.ndarray, tms: np.ndarray) -> np.ndarray:
    """(key rank << _T_SHIFT) + (t - min): one sortable int64 per row that
    orders by (key, time) — segmented searchsorted over ALL keys at once,
    no per-key Python loop."""
    _, rank = np.unique(key, return_inverse=True)
    dt = tms - tms.min()
    if int(dt.max()) >= (1 << _T_SHIFT):
        raise ValueError("in-group time span exceeds 2^42 ms")
    return (rank.astype(np.int64) << _T_SHIFT) + dt


def _gnp(g, col: str, dtype=None) -> np.ndarray:
    """Group column -> numpy, for either a pandas group or an Arrow-table
    group (``map_groups(..., batch_format="pyarrow")``) — the grouped folds
    run the same NumPy kernels on Arrow slices without a per-group pandas
    conversion."""
    c = g[col]
    a = (
        c.to_numpy(zero_copy_only=False)
        if isinstance(c, pa.ChunkedArray)
        else c.to_numpy()
    )
    return a if dtype is None else a.astype(dtype, copy=False)


# ---------------------------------------------------------------------------
# Sliding-window aggregate over events
# ---------------------------------------------------------------------------


_WIN_EMPTY = {
    "event_type": pa.array([], pa.string()),
    "n_events": pa.array([], pa.int64()),
    "sum_cnt": pa.array([], pa.int64()),
    "max_cnt": pa.array([], pa.int64()),
}


def _win_group(window_ms: int):
    """groupby(bkt): per-user sliding RANGE window count — for every event,
    the number of same-user events with t in [t - W, t] INCLUSIVE of time
    peers (exactly SQL's ``RANGE BETWEEN W PRECEDING AND CURRENT ROW``,
    which counts all rows tied on the ORDER BY value). One lexsort + two
    searchsorted calls over the composite (user, time) key — vectorized
    across every user in the bucket."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pa.table(_WIN_EMPTY)
        uid = _gnp(g, "uid").astype(np.int64)
        tms = _gnp(g, "tms").astype(np.int64)
        et = _gnp(g, "et")
        order = np.lexsort((tms, uid))
        uid, tms, et = uid[order], tms[order], et[order]
        comp = _comp_keys(uid, tms)
        floor_ = comp - (comp & ((1 << _T_SHIFT) - 1))  # run start per row
        lo = np.searchsorted(comp, np.maximum(comp - window_ms, floor_), side="left")
        hi = np.searchsorted(comp, comp, side="right")
        cnt = (hi - lo).astype(np.int64)
        types, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv, minlength=len(types)).astype(np.int64)
        s = _int_group_sums(cnt, inv, len(types))
        mx = np.zeros(len(types), np.int64)
        np.maximum.at(mx, inv, cnt)
        return pa.table(
            {"event_type": types, "n_events": n, "sum_cnt": s, "max_cnt": mx}
        )

    return fn


def q_events_window_agg(sf_dir: str, window_ms: int = 3_600_000):
    """Sliding-window aggregate: per event, the count of same-user events in
    the preceding ``window_ms`` (inclusive RANGE frame), aggregated per
    event_type as (n_events, sum of window counts, max window count).
    Plan: hash-bucket user_id (all of a user's events co-locate) ->
    groupby(bucket) -> one vectorized window pass per group -> tiny
    per-type Ray aggregate. Returns one row per event_type."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "tms": pa.array(_ts_ms(b["ts"])),
                "et": b["event_type"].combine_chunks(),
            }
        )

    partials = (
        ray.data.read_parquet(path, columns=["user_id", "ts", "event_type"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_win_group(window_ms), batch_format="pyarrow")
    )
    agg = (
        partials.groupby("event_type")
        .aggregate(Sum("n_events"), Sum("sum_cnt"), Max("max_cnt"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_events": agg["sum(n_events)"].astype("int64"),
            "sum_window_cnt": agg["sum(sum_cnt)"].astype("int64"),
            "max_window_cnt": agg["max(max_cnt)"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed AS-OF join: events -> latest prior order of the same customer
# ---------------------------------------------------------------------------


_ASOF_EMPTY = {
    "event_type": pa.array([], pa.string()),
    "n_events": pa.array([], pa.int64()),
    "n_matched": pa.array([], pa.int64()),
    "sum_price": pa.array([], pa.int64()),
    "chk": pa.array([], pa.int64()),
}


def _asof_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(bkt): in-partition sort-merge as-of. Orders sorted by
    (key, time, orderkey); each event binary-searches the LAST order row
    with composite key <= its own — ties on (key, time) resolve to the max
    orderkey, matching the oracle's arg_max ordering. Cross-key bleed is
    impossible: the composite embeds the key rank, checked after lookup."""
    if not len(g):
        return pa.table(_ASOF_EMPTY)
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    tms = _gnp(g, "tms").astype(np.int64)
    ids = _gnp(g, "id").astype(np.int64)
    comp = _comp_keys(key, tms)

    om = side == 0
    okey, ocomp = ids[om], comp[om]
    oprice = _gnp(g, "price_c").astype(np.int64)[om]
    oo = np.lexsort((okey, ocomp))
    okey, ocomp, oprice = okey[oo], ocomp[oo], oprice[oo]
    orank = ocomp >> _T_SHIFT

    em = ~om
    ecomp, eid = comp[em], ids[em]
    et = _gnp(g, "et")[em]
    erank = ecomp >> _T_SHIFT
    pos = np.searchsorted(ocomp, ecomp, side="right") - 1
    safe = np.maximum(pos, 0)
    matched = (pos >= 0) & (orank[safe] == erank) if len(okey) else np.zeros(len(ecomp), bool)

    types, inv = np.unique(et, return_inverse=True)
    k = len(types)
    n = np.bincount(inv, minlength=k).astype(np.int64)
    nm = np.bincount(inv[matched], minlength=k).astype(np.int64)
    price = _int_group_sums(oprice[safe[matched]], inv[matched], k) if matched.any() else np.zeros(k, np.int64)
    # per-term modular fold keeps every intermediate < 2^63 (ids may be
    # arbitrary int64 at scale); congruent to the oracle's HUGEINT end-mod
    terms = ((eid % _PAIR_MOD) * _PAIR_K % _PAIR_MOD + okey[safe] % _PAIR_MOD) % _PAIR_MOD if len(okey) else np.zeros(len(eid), np.int64)
    chk = _int_group_sums(terms[matched], inv[matched], k) % _PAIR_MOD if matched.any() else np.zeros(k, np.int64)
    return pa.table(
        {"event_type": types, "n_events": n, "n_matched": nm, "sum_price": price, "chk": chk}
    )


_JOIN_N_SALTS = 16


def _salted_bkt(
    key: np.ndarray,
    ids: np.ndarray,
    nb: int,
    hot_keys: np.ndarray | None,
    probe: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """(bkt, replicate_mask) under hot-key salting. Non-hot keys hash into
    [0, nb) as before. A hot key gets its own RESERVED bucket range
    [nb + i*n_salts, nb + (i+1)*n_salts): probe rows split across the range
    by a hash of their own row id (deterministic under retries AND
    re-batching — a per-batch rotation would skew toward low salts; no
    single straggler group either way), build rows return a replicate mask —
    the caller clones them into every salt bucket so each salted group still
    sees the key's full build side."""
    bkt = _jbkt_of(key, nb)
    if hot_keys is None or not len(hot_keys):
        return bkt, np.zeros(len(key), dtype=bool)
    hot = np.isin(key, hot_keys)
    if probe:
        idx = np.searchsorted(hot_keys, key[hot])
        salt = _jbkt_of(ids[hot], _JOIN_N_SALTS)
        bkt = bkt.copy()
        bkt[hot] = nb + idx * _JOIN_N_SALTS + salt
        return bkt, np.zeros(len(key), dtype=bool)
    return bkt, hot


def _replicate_hot_build(
    t: pa.Table, key: np.ndarray, hot_keys: np.ndarray, nb: int
) -> pa.Table:
    """Clone the build side's hot-key rows into each of their key's salt
    buckets (replacing the single original row). Hot keys are by definition
    a handful, and the build side of a key is bounded — the clone factor is
    n_salts x (hot build rows), never n_salts x table."""
    hot = np.isin(key, hot_keys)
    if not hot.any():
        return t
    base = t.filter(pa.array(~hot))
    hot_t = t.filter(pa.array(hot))
    idx = np.searchsorted(hot_keys, key[hot])
    parts = [base]
    for s in range(_JOIN_N_SALTS):
        rep = hot_t.set_column(
            t.column_names.index("bkt"),
            "bkt",
            pa.array(nb + idx * _JOIN_N_SALTS + s),
        )
        parts.append(rep)
    return pa.concat_tables(parts)


def _tagged_sides(epath: str, opath: str, nb: int, hot_keys=None):
    """Column-pruned reads of events (side=1, probe) and orders (side=0,
    build) projected onto ONE shared schema (bkt, side, key, tms, id,
    price_c, et) so a single union feeds the co-partitioning shuffle. The
    shuffle moves five int64-ish columns per row — never the wide payloads.

    ``hot_keys`` (sorted int64 array, or "auto" in the callers) engages
    skew salting: a viral key's probe rows split across _JOIN_N_SALTS
    reserved buckets and its (bounded) build rows are replicated into each,
    so no single reducer group receives the whole key. The per-group join
    kernels are unchanged — each salted group is just a smaller, complete
    (build, probe-slice) instance — and the per-type aggregate is
    associative, so the result is provably identical for ANY salt split
    (the same argument as shuffle.salted_sum)."""
    if hot_keys is not None:
        hot_keys = np.sort(np.asarray(hot_keys, dtype=np.int64))

    def erows(b: pa.Table) -> pa.Table:
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(uid)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        bkt, _ = _salted_bkt(uid, eid, nb, hot_keys, probe=True)
        return pa.table(
            {
                "bkt": pa.array(bkt),
                "side": pa.array(np.ones(n, np.int64)),
                "key": pa.array(uid),
                "tms": pa.array(_ts_ms(b["ts"])),
                "id": b["event_id"].combine_chunks().cast(pa.int64()),
                "price_c": pa.array(np.zeros(n, np.int64)),
                "et": b["event_type"].combine_chunks(),
            }
        )

    def orows(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ck)
        t = pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.zeros(n, np.int64)),
                "key": pa.array(ck),
                "tms": pa.array(_ts_ms(b["o_orderdate"])),
                "id": b["o_orderkey"].combine_chunks().cast(pa.int64()),
                "price_c": pa.array(_cents(b["o_totalprice"])),
                "et": pa.array([""] * n, pa.string()),
            }
        )
        if hot_keys is not None and len(hot_keys):
            t = _replicate_hot_build(t, ck, hot_keys, nb)
        return t

    ev = ray.data.read_parquet(
        epath, columns=["event_id", "user_id", "ts", "event_type"]
    ).map_batches(erows, batch_format="pyarrow", zero_copy_batch=True)
    od = ray.data.read_parquet(
        opath, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    return ev, od


def _resolve_hot_keys(hot_keys, path: str, col: str = "user_id", frac: float = 0.10):
    """None -> None; "auto" -> one-pass detector over the probe side's key
    column (shuffle.detect_hot_keys at ``frac``); else the caller's explicit
    list."""
    if hot_keys is None:
        return None
    if isinstance(hot_keys, str) and hot_keys == "auto":
        from tokenzip.shuffle import detect_hot_keys

        found = detect_hot_keys(path, col, frac=frac)
        return found if len(found) else None
    return hot_keys


_RANGE_EMPTY = {
    "event_type": pa.array([], pa.string()),
    "n_events": pa.array([], pa.int64()),
    "n_pairs": pa.array([], pa.int64()),
    "sum_price": pa.array([], pa.int64()),
    "chk": pa.array([], pa.int64()),
}


def _range_group(range_ms: int):
    """groupby(bkt): interval range join WITHOUT pair enumeration — for
    each event, the orders of the same customer with date in
    [t - range_ms, t] are located as a contiguous slice [lo, hi) of the
    (key, time)-sorted order array, so per-event pair count, price sum and
    modular pair checksum all come from prefix-sum differences. Group cost
    is O(k log k) even when the join output is quadratic."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pa.table(_RANGE_EMPTY)
        side = _gnp(g, "side").astype(np.int64)
        key = _gnp(g, "key").astype(np.int64)
        tms = _gnp(g, "tms").astype(np.int64)
        ids = _gnp(g, "id").astype(np.int64)
        comp = _comp_keys(key, tms)

        om = side == 0
        ocomp = comp[om]
        oo = np.argsort(ocomp, kind="stable")
        ocomp = ocomp[oo]
        okey_mod = (ids[om][oo] % _PAIR_MOD).astype(np.int64)
        oprice = _gnp(g, "price_c").astype(np.int64)[om][oo]
        # prefix sums: per-event slice aggregates in O(1) per event
        pfx_price = np.concatenate(([0], np.cumsum(oprice)))
        pfx_kmod = np.concatenate(([0], np.cumsum(okey_mod)))

        em = ~om
        ecomp, eid = comp[em], ids[em]
        et = _gnp(g, "et")[em]
        floor_ = ecomp - (ecomp & ((1 << _T_SHIFT) - 1))
        lo = np.searchsorted(ocomp, np.maximum(ecomp - range_ms, floor_), side="left")
        hi = np.searchsorted(ocomp, ecomp, side="right")
        cnt = (hi - lo).astype(np.int64)
        price = pfx_price[hi] - pfx_price[lo]
        # sum over the slice of (eid%M)*K + okey%M, folded mod M per event
        kmod_sum = pfx_kmod[hi] - pfx_kmod[lo]
        eterm = (eid % _PAIR_MOD) * _PAIR_K % _PAIR_MOD
        chk_ev = ((cnt % _PAIR_MOD) * eterm % _PAIR_MOD + kmod_sum % _PAIR_MOD) % _PAIR_MOD

        types, inv = np.unique(et, return_inverse=True)
        k = len(types)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table(
            {
                "event_type": types,
                "n_events": n,
                "n_pairs": _int_group_sums(cnt, inv, k),
                "sum_price": _int_group_sums(price, inv, k),
                "chk": _int_group_sums(chk_ev, inv, k) % _PAIR_MOD,
            }
        )

    return fn


def q_events_range_orders(
    sf_dir: str, range_ms: int = 10_000 * 86_400_000, hot_keys=None,
    hot_frac: float = 0.10,
):
    """Interval range join: every (event, order) pair of the same customer
    with the order dated within the trailing ``range_ms`` window
    (inclusive both ends), aggregated per event_type as (n_events, number
    of join pairs, pair price sum in cents, modular pair checksum). The
    default window (10,000 days) deliberately lands mid-way through the
    testdata order history (orders 1995-2001, events 2024), so ~a quarter
    of the equality pairs fall OUTSIDE the window — the oracle check
    discriminates the boundary, not just the equality join. Same
    co-partitioned layout as the as-of join; the group kernel never
    materializes pairs (prefix-sum slices), so a customer with many orders
    in-window costs O(log k) per event, not O(orders). Returns one row per
    event_type."""
    epath = os.path.join(sf_dir, "events.parquet")
    opath = os.path.join(sf_dir, "orders.parquet")
    nb = _lsh_n_buckets(_row_count(epath) + _row_count(opath))
    ev, od = _tagged_sides(
        epath, opath, nb,
        _resolve_hot_keys(hot_keys, epath, "user_id", hot_frac),
    )
    partials = ev.union(od).groupby("bkt").map_groups(
        _range_group(range_ms), batch_format="pyarrow"
    )
    agg = (
        partials.groupby("event_type")
        .aggregate(Sum("n_events"), Sum("n_pairs"), Sum("sum_price"), Sum("chk"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_events": agg["sum(n_events)"].astype("int64"),
            "n_pairs": agg["sum(n_pairs)"].astype("int64"),
            "sum_price_cents": agg["sum(sum_price)"].astype("int64"),
            "pair_checksum": agg["sum(chk)"].astype("int64") % _PAIR_MOD,
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_asof_orders(sf_dir: str, hot_keys=None, hot_frac: float = 0.10):
    """AS-OF join: for every event, the latest order (by order date, ties
    broken by max orderkey) of the same customer placed at-or-before the
    event, aggregated per event_type as (n_events, n_matched, sum of the
    matched orders' totalprice in cents, modular join checksum over
    (event_id, orderkey) pairs). Plan: both tables hash-bucket their
    equality key into ONE shuffle (union of schema-aligned tagged rows) ->
    groupby(bucket) -> vectorized in-partition sort-merge -> tiny per-type
    aggregate. The shuffle moves 5 int64-ish columns per row — never the
    wide payloads. Returns one row per event_type."""
    epath = os.path.join(sf_dir, "events.parquet")
    opath = os.path.join(sf_dir, "orders.parquet")
    nb = _lsh_n_buckets(_row_count(epath) + _row_count(opath))
    ev, od = _tagged_sides(
        epath, opath, nb,
        _resolve_hot_keys(hot_keys, epath, "user_id", hot_frac),
    )
    partials = ev.union(od).groupby("bkt").map_groups(_asof_group, batch_format="pyarrow")
    agg = (
        partials.groupby("event_type")
        .aggregate(Sum("n_events"), Sum("n_matched"), Sum("sum_price"), Sum("chk"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_events": agg["sum(n_events)"].astype("int64"),
            "n_matched": agg["sum(n_matched)"].astype("int64"),
            "sum_price_cents": agg["sum(sum_price)"].astype("int64"),
            "join_checksum": agg["sum(chk)"].astype("int64") % _PAIR_MOD,
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Broadcast (map-side) equi-join: the other half of the join story. The
# as-of/range joins above co-partition two BIG sides; when one side is
# small (dimension tables: customer, nation), the 100-TB pattern is to
# ray.put the lookup ONCE and join inside map_batches — zero shuffle on
# the big side, partials pre-aggregated per batch.
# ---------------------------------------------------------------------------


def _dim_lookup(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted c_custkey, nation name per custkey row, sorted names) —
    the broadcast payload: customer x nation folded driver-side (both are
    dimension tables, KBs at any TPC-H scale; the fact table never moves)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nkey = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    order = np.argsort(nkey)
    nkey, nname = nkey[order], nname[order]
    ckey = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnat = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    corder = np.argsort(ckey)
    ckey, cnat = ckey[corder], cnat[corder]
    pos = np.searchsorted(nkey, cnat)
    if len(pos) and not np.array_equal(nkey[np.clip(pos, 0, len(nkey) - 1)], cnat):
        raise ValueError("customer.c_nationkey outside nation table")
    return ckey, nname[pos], np.unique(nname)


class _OrdersNationStage:
    """Per-batch partials of the orders->customer->nation broadcast join:
    (n_name, n_orders, sum_price_cents) — searchsorted lookups against the
    broadcast dimension arrays, never a shuffle of the fact side."""

    def __init__(self, dim_ref):
        from tokenzip.stages import _bget

        self.ckey, self.cnation, _ = _bget(dim_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(batch["o_totalprice"])
        pos = np.searchsorted(self.ckey, ok)
        if len(pos) and not np.array_equal(self.ckey[np.clip(pos, 0, len(self.ckey) - 1)], ok):
            raise ValueError("orders.o_custkey outside customer table")
        names = self.cnation[pos]
        uniq, inv = np.unique(names, return_inverse=True)
        return pa.table(
            {
                "n_name": pa.array([str(s) for s in uniq], pa.string()),
                "n_orders": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "sum_price": pa.array(
                    isum64(inv, price, len(uniq))
                ),
            }
        )


def q_orders_by_nation(sf_dir: str) -> pd.DataFrame:
    """Orders enriched through customer -> nation by broadcast lookup,
    rolled up per nation: (n_name, n_orders, sum_price_cents). One
    fact-table scan, partials per batch, a nation-sized final groupby."""
    from tokenzip.stages import _bcast

    dim_ref = _bcast(_dim_lookup(sf_dir))
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )
        .map_batches(
            _OrdersNationStage,
            fn_constructor_args=(dim_ref,),
            concurrency=(1, max(2, _default_concurrency() // 2)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("n_name")
        .aggregate(Sum("n_orders"), Sum("sum_price"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "n_name": agg["n_name"].astype(str),
            "n_orders": agg["sum(n_orders)"].astype("int64"),
            "sum_price_cents": agg["sum(sum_price)"].astype("int64"),
        }
    )
    return out.sort_values("n_name").reset_index(drop=True)


def orders_by_nation_sql() -> str:
    return """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


class _OrdersRollupStage(_OrdersNationStage):
    """Finest-level (n_name, o_orderpriority) partials for the rollup —
    same broadcast dim lookup, composite key encoded per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(batch["o_totalprice"])
        pos = np.searchsorted(self.ckey, ok)
        if len(pos) and not np.array_equal(
            self.ckey[np.clip(pos, 0, len(self.ckey) - 1)], ok
        ):
            raise ValueError("orders.o_custkey outside customer table")
        names = self.cnation[pos]
        prio = np.asarray(batch["o_orderpriority"].to_pylist(), dtype=object)
        un, ninv = np.unique(names, return_inverse=True)
        up, pinv = np.unique(prio, return_inverse=True)
        code = ninv.astype(np.int64) * len(up) + pinv
        uc, cinv = np.unique(code, return_inverse=True)
        return pa.table(
            {
                "n_name": pa.array([str(s) for s in un[uc // len(up)]], pa.string()),
                "o_orderpriority": pa.array(
                    [str(s) for s in up[uc % len(up)]], pa.string()
                ),
                "n_orders": pa.array(np.bincount(cinv).astype(np.int64)),
                "sum_price": pa.array(
                    isum64(cinv, price)
                ),
            }
        )


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(n_name, o_orderpriority) over order revenue — three
    grouping levels from ONE fact-table scan. The finest level is a Ray
    groupby over the bounded (#nations × #priorities) domain; the two
    coarser levels fold from it driver-side (≤125 rows at any scale —
    rolling up from the finest partials is the distributed-rollup identity,
    no second scan). Subtotal rows carry 'ALL' labels, matching the
    oracle's COALESCE."""
    from tokenzip.stages import _bcast

    dim_ref = _bcast(_dim_lookup(sf_dir))
    fine = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice", "o_orderpriority"],
        )
        .map_batches(
            _OrdersRollupStage,
            fn_constructor_args=(dim_ref,),
            concurrency=(1, max(2, _default_concurrency() // 2)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["n_name", "o_orderpriority"])
        .aggregate(Sum("n_orders"), Sum("sum_price"))
        .to_pandas()
    )
    fine = pd.DataFrame(
        {
            "n_name": fine["n_name"].astype(str),
            "o_orderpriority": fine["o_orderpriority"].astype(str),
            "n_orders": fine["sum(n_orders)"].astype("int64"),
            "sum_price_cents": fine["sum(sum_price)"].astype("int64"),
        }
    )
    nat = fine.groupby("n_name", as_index=False)[["n_orders", "sum_price_cents"]].sum()
    nat["o_orderpriority"] = "ALL"
    total = pd.DataFrame(
        {
            "n_name": ["ALL"],
            "o_orderpriority": ["ALL"],
            "n_orders": [fine["n_orders"].sum()],
            "sum_price_cents": [fine["sum_price_cents"].sum()],
        }
    )
    out = pd.concat([fine, nat, total], ignore_index=True)[
        ["n_name", "o_orderpriority", "n_orders", "sum_price_cents"]
    ]
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_price_cents"] = out["sum_price_cents"].astype("int64")
    return out.sort_values(["n_name", "o_orderpriority"]).reset_index(drop=True)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_FUNNEL_SHIFT = 42  # epoch-ms < 2^42 (< year 2109): (uid << 42) | tms packs

_WEEK_MS = 7 * 86_400_000


def _cohort_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(bucket): per-user cohort week (week of first event) and
    whether the user has any event in cohort_week + 1 — vectorized sort +
    segment reduction, then a per-(cohort, retained) partial count."""
    if not len(g):
        return pa.table(
            {
                "cohort_week": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
                "n_retained": pa.array([], pa.int64()),
            }
        )
    uid = _gnp(g, "uid", np.int64)
    wk = _gnp(g, "wk", np.int64)
    order = np.lexsort((wk, uid))
    uid, wk = uid[order], wk[order]
    first = np.concatenate([[True], uid[1:] != uid[:-1]])
    starts = np.flatnonzero(first)
    ends = np.r_[starts[1:], len(uid)]
    cohort = wk[starts]
    # retained iff any event in cohort+1 — segmented membership without a
    # Python loop: each row checks against its own user's cohort week
    seg_id = np.cumsum(first) - 1
    target = cohort[seg_id]  # per-row: its user's cohort week
    hit_rows = wk == target + 1
    c = np.bincount(seg_id, weights=hit_rows, minlength=len(starts)) > 0
    uc, inv = np.unique(cohort, return_inverse=True)
    return pa.table(
        {
            "cohort_week": uc.astype("int64"),
            "n_users": np.bincount(inv).astype("int64"),
            "n_retained": isum64(inv, c),
        }
    )


def q_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Week-1 retention cohorts: users grouped by the epoch-week of their
    FIRST event; a user counts as retained when they have >= 1 event in
    the following week. One user-bucketed shuffle of two int64 columns,
    vectorized per-bucket segment reduction, final groupby over the
    #weeks domain. Integer epoch-week arithmetic mirrored in SQL."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        uid = (
            b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        wk = _ts_ms(b["ts"]) // _WEEK_MS
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "wk": pa.array(wk),
            }
        )

    agg = (
        ray.data.read_parquet(path, columns=["user_id", "ts"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_cohort_group, batch_format="pyarrow")
        .groupby("cohort_week")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_retained", alias_name="n_retained"),
        )
        .to_pandas()
    )
    out = agg[["cohort_week", "n_users", "n_retained"]].astype("int64")
    return out.sort_values("cohort_week").reset_index(drop=True)


def retention_cohorts_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000 // {_WEEK_MS} AS wk FROM events
),
c AS (SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY user_id),
r AS (
  SELECT c.user_id, c.cohort_week,
         CASE WHEN EXISTS (
           SELECT 1 FROM e
           WHERE e.user_id = c.user_id AND e.wk = c.cohort_week + 1
         ) THEN 1 ELSE 0 END AS retained
  FROM c
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(retained) AS BIGINT) AS n_retained
FROM r GROUP BY cohort_week ORDER BY cohort_week
"""


def _funnel_group(window_ms: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pa.table(
            {
                "n_purchases": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
                "n_view_pairs": pa.array([], pa.int64()),
            }
        )
        if not len(g):
            return empty
        uid = _gnp(g, "uid", np.int64)
        tms = _gnp(g, "tms", np.int64)
        isp = _gnp(g, "isp", np.bool_)
        code = (uid << _FUNNEL_SHIFT) + tms
        views = np.sort(code[~isp])
        pc = code[isp]
        if not len(pc):
            return empty
        nv = np.searchsorted(views, pc, side="right") - np.searchsorted(
            views, pc - window_ms, side="left"
        )
        return pa.table(
            {
                "n_purchases": [int(len(pc))],
                "n_converted": [int((nv > 0).sum())],
                "n_view_pairs": [int(nv.sum())],
            }
        )

    return fn


def q_funnel_view_purchase(sf_dir: str, window_ms: int = 86_400_000) -> pd.DataFrame:
    """Funnel self-join: purchases preceded by >= 1 'view' of the SAME user
    within the trailing window (inclusive both ends; default 1 day — the
    testdata stream spans ~29 days/user, so the boundary discriminates).
    One column-pruned scan keeps only view/purchase rows, ONE user-bucketed
    shuffle of three narrow columns, and the within-bucket kernel counts
    window hits by two searchsorteds over a (uid << 42 | ts) packed key —
    pairs are never materialized. Returns one row:
    (n_purchases, n_converted, n_view_pairs)."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        keep = (et == "view") | (et == "purchase")
        uid = (
            b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        tms = _ts_ms(b["ts"])[keep]
        # the window arithmetic stays inside one uid's code range only when
        # ts - window >= 0 — epoch-ms data always satisfies this; reject
        # exotic inputs loudly instead of miscounting across uid boundaries
        if len(tms) and (
            tms.min() < window_ms or tms.max() >= 1 << _FUNNEL_SHIFT
        ):
            raise ValueError("event timestamp outside the packable ms range")
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "tms": pa.array(tms),
                "isp": pa.array(et[keep] == "purchase"),
            }
        )

    parts = (
        ray.data.read_parquet(path, columns=["user_id", "ts", "event_type"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_funnel_group(window_ms), batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_purchases": [int(parts["n_purchases"].sum())],
            "n_converted": [int(parts["n_converted"].sum())],
            "n_view_pairs": [int(parts["n_view_pairs"].sum())],
        }
    ).astype("int64")


def funnel_view_purchase_sql(window_ms: int = 86_400_000) -> str:
    return f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) // 1000 AS tms, event_id
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, epoch_us(ts) // 1000 AS tms
  FROM events WHERE event_type = 'view'
),
j AS (
  SELECT p.event_id, COUNT(v.tms) AS nv
  FROM p LEFT JOIN v
    ON v.user_id = p.user_id AND v.tms BETWEEN p.tms - {window_ms} AND p.tms
  GROUP BY p.event_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(SUM(nv) AS BIGINT) AS n_view_pairs
FROM j
"""


def q_events_hourly_pivot(sf_dir: str) -> pd.DataFrame:
    """PIVOT: hour-of-day (UTC) × event_type count matrix as wide columns
    (n_click ... n_view). Per-batch composite bincount over the fixed
    24 × |types| domain — partials are 24-row tables regardless of event
    count; one tiny groupby. Unknown event types fail loudly rather than
    silently dropping a column the reader expects."""
    path = os.path.join(sf_dir, "events.parquet")
    tmap = {t: i for i, t in enumerate(EVENT_TYPES)}
    k = len(EVENT_TYPES)

    def partial(b: pa.Table) -> pa.Table:
        hours = (_ts_ms(b["ts"]) // 3_600_000) % 24
        et = b["event_type"].to_pylist()
        try:
            ti = np.array([tmap[t] for t in et], dtype=np.int64)
        except KeyError as e:  # pragma: no cover - guarded domain
            raise ValueError(f"unknown event_type {e}") from None
        counts = np.bincount(hours * k + ti, minlength=24 * k).reshape(24, k)
        cols = {"hour": pa.array(np.arange(24, dtype=np.int64))}
        for j, t in enumerate(EVENT_TYPES):
            cols[f"n_{t}"] = pa.array(counts[:, j].astype(np.int64))
        return pa.table(cols)

    agg = (
        ray.data.read_parquet(path, columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES])
        .to_pandas()
    )
    out = agg[["hour"] + [f"n_{t}" for t in EVENT_TYPES]].astype("int64")
    return out.sort_values("hour").reset_index(drop=True)


def events_hourly_pivot_sql() -> str:
    picks = ",\n       ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT CAST((epoch_us(ts) // 1000 // 3600000) % 24 AS BIGINT) AS hour,
       {picks}
FROM events GROUP BY 1 ORDER BY 1
"""


def q_nation_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Percent-of-total (the SUM() OVER () window-over-aggregate shape):
    each nation's order-revenue share in integer basis points
    (rev * 10000 // total). Rides the orders_by_nation broadcast-join
    partials; the share divides the nation-sized final table driver-side."""
    base = q_orders_by_nation(sf_dir)
    total = int(base["sum_price_cents"].sum())
    out = pd.DataFrame(
        {
            "n_name": base["n_name"],
            "revenue_cents": base["sum_price_cents"].astype("int64"),
            "share_bp": (
                base["sum_price_cents"].astype(object) * 10_000 // total
            ).astype("int64"),
        }
    )
    return out.sort_values("n_name").reset_index(drop=True)


def nation_revenue_share_sql() -> str:
    return """
WITH rev AS (
  SELECT n_name,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, revenue_cents,
       CAST(CAST(revenue_cents AS HUGEINT) * 10000
            // SUM(CAST(revenue_cents AS HUGEINT)) OVER () AS BIGINT)
           AS share_bp
FROM rev ORDER BY n_name
"""


def q_lineitem_qty_salted(sf_dir: str) -> pd.DataFrame:
    """The salted hot-key aggregate as a driver-contract query: per
    returnflag quantity/row sums through ``tokenzip.shuffle.salted_sum``
    (two-phase (key, salt) -> key fold). The l_returnflag domain is tiny
    and Zipf-ish (one flag dominates) — exactly the shape where a direct
    groupby funnels most rows into one reducer; the result must be
    IDENTICAL to the plain SQL groupby."""
    from tokenzip.shuffle import salted_sum

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "sum_qty": pa.array(
                    b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "n_items": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity"],
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        salted_sum(ds, ["l_returnflag"], ["sum_qty", "n_items"], n_salts=16)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    out["l_returnflag"] = out["l_returnflag"].astype(str)
    return out.astype({"sum_qty": "int64", "n_items": "int64"})


def lineitem_qty_salted_sql() -> str:
    return """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_top_customer_by_nation(sf_dir: str) -> pd.DataFrame:
    """Argmax over a computed aggregate (the correlated-subquery shape):
    each nation's highest-revenue customer. Plan: one orders scan ->
    per-batch (custkey, revenue-cents) partials -> ONE customer-keyed
    groupby (the only shuffle; domain = |customer|, ~rows/10 at TPC-H
    shape) -> broadcast dim lookup custkey->nation INSIDE the fold batches
    -> per-nation argmax over bounded partials driver-side. Ties break to
    the smaller custkey on both engines."""
    from tokenzip.stages import _bcast, _bget

    dim_ref = _bcast(_dim_lookup(sf_dir))

    def partial(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(b["o_totalprice"])
        uc, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "custkey": pa.array(uc, pa.int64()),
                "rev": pa.array(
                    isum64(inv, cents), pa.int64()
                ),
            }
        )

    class _NationArgmax:
        """Post-aggregate map: custkey -> nation via the broadcast dim,
        then a per-batch per-nation argmax partial (ties to smaller
        custkey) — output rows bounded by #nations per batch."""

        def __init__(self, ref):
            self.ckey, self.cnation, _ = _bget(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = b["custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            rev = b["sum(rev)"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.ckey, ck)
            if len(pos) and not np.array_equal(
                self.ckey[np.clip(pos, 0, len(self.ckey) - 1)], ck
            ):
                raise ValueError("orders.o_custkey outside customer table")
            names = self.cnation[pos]
            # per-nation argmax: sort by (nation, -rev, custkey), keep firsts
            order = np.lexsort((ck, -rev, names))
            nn, ck, rev = names[order], ck[order], rev[order]
            first = np.concatenate([[True], nn[1:] != nn[:-1]])
            return pa.table(
                {
                    "n_name": pa.array([str(s) for s in nn[first]], pa.string()),
                    "custkey": pa.array(ck[first], pa.int64()),
                    "rev": pa.array(rev[first], pa.int64()),
                }
            )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("custkey")
        .aggregate(Sum("rev"))
        .map_batches(
            _NationArgmax,
            fn_constructor_args=(dim_ref,),
            concurrency=(1, 4),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    parts = parts.sort_values(
        ["n_name", "rev", "custkey"], ascending=[True, False, True], kind="stable"
    )
    win = parts.groupby("n_name", as_index=False).head(1)
    out = pd.DataFrame(
        {
            "n_name": win["n_name"].astype(str),
            "c_custkey": win["custkey"].astype("int64"),
            "revenue_cents": win["rev"].astype("int64"),
        }
    )
    return out.sort_values("n_name").reset_index(drop=True)


def top_customer_by_nation_sql() -> str:
    return """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT n_name, c_custkey, revenue_cents,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY revenue_cents DESC, c_custkey ASC) AS rn
  FROM rev JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, CAST(c_custkey AS BIGINT) AS c_custkey, revenue_cents
FROM r WHERE rn = 1 ORDER BY n_name
"""


def _gap_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(bucket): lexsort by (uid, tms, event_id), per-user LAG gaps
    attributed to the LATER event's type, pre-aggregated per event_type —
    vectorized, zero per-row Python."""
    if not len(g):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_gaps": pa.array([], pa.int64()),
                "sum_gap_ms": pa.array([], pa.int64()),
                "max_gap_ms": pa.array([], pa.int64()),
            }
        )
    uid = _gnp(g, "uid", np.int64)
    tms = _gnp(g, "tms", np.int64)
    eid = _gnp(g, "eid", np.int64)
    et = _gnp(g, "event_type")
    order = np.lexsort((eid, tms, uid))
    uid, tms, et = uid[order], tms[order], et[order]
    same = uid[1:] == uid[:-1]
    gaps = (tms[1:] - tms[:-1])[same]
    types = et[1:][same]
    if not len(gaps):
        return _gap_group(pa.table({}))
    ut, inv = np.unique(types, return_inverse=True)
    counts = np.bincount(inv)
    by_type = np.argsort(inv, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return pa.table(
        {
            "event_type": [str(s) for s in ut],
            "n_gaps": counts.astype("int64"),
            "sum_gap_ms": isum64(inv, gaps),
            "max_gap_ms": np.maximum.reduceat(gaps[by_type], starts).astype(
                "int64"
            ),
        }
    )


def q_user_gap_stats(sf_dir: str) -> pd.DataFrame:
    """Explicit LAG window operator: per-user inter-arrival gaps (ordered
    by ts with event_id tie-break, so attribution is deterministic on both
    engines), attributed to the later event's type and rolled up per
    event_type. Same co-partitioned single-shuffle plan as sessionization:
    hash-bucket user_id, vectorized within-bucket lexsort + LAG, tiny
    final groupby over the event-type domain."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        uid = (
            b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "tms": pa.array(_ts_ms(b["ts"])),
                "eid": pa.array(
                    b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "event_type": b["event_type"].combine_chunks(),
            }
        )

    agg = (
        ray.data.read_parquet(
            path, columns=["user_id", "ts", "event_id", "event_type"]
        )
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_gap_group, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_gaps", alias_name="n_gaps"),
            Sum("sum_gap_ms", alias_name="sum_gap_ms"),
            Max("max_gap_ms", alias_name="max_gap_ms"),
        )
        .to_pandas()
    )
    out = agg[["event_type", "n_gaps", "sum_gap_ms", "max_gap_ms"]].astype(
        {"n_gaps": "int64", "sum_gap_ms": "int64", "max_gap_ms": "int64"}
    )
    out["event_type"] = out["event_type"].astype(str)
    return out.sort_values("event_type").reset_index(drop=True)


def user_gap_stats_sql() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000 AS tms FROM events
),
d AS (
  SELECT event_type,
         tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id)
             AS gap
  FROM e
)
SELECT event_type,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_ms,
       CAST(MAX(gap) AS BIGINT) AS max_gap_ms
FROM d WHERE gap IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_order_price_deciles(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Exact NTILE(k) decile stats over order prices WITHOUT a global sort:
    per-batch sparse (cents, n) histogram partials, one value-domain-bounded
    groupby, then closed-form decile slicing on the cumulative histogram
    driver-side. NTILE row identity is irrelevant to the aggregates — tied
    rows carry the same value, so each decile's (count, sum, min, max) is
    determined by the histogram alone and matches any tie ordering the
    oracle picks. Histogram size is bounded by the price DOMAIN, not the
    row count — corpus-size-independent shuffle, like the seq-len
    quantiles."""

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["o_totalprice"])
        uniq, cnt = np.unique(cents, return_counts=True)
        return pa.table(
            {
                "cents": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cents")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("cents")
        .reset_index(drop=True)
    )
    vals = hist["cents"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    n = int(cnts.sum())
    ends = np.cumsum(cnts)  # rank of each value's LAST row (1-based)
    starts = ends - cnts
    base, extra = divmod(n, k)
    bounds = np.array(
        [d * base + min(d, extra) for d in range(k + 1)], dtype=np.int64
    )
    rows = []
    for d in range(1, k + 1):
        lo, hi = bounds[d - 1], bounds[d]
        if hi == lo:
            continue
        ov = np.minimum(ends, hi) - np.maximum(starts, lo)
        m = ov > 0
        rows.append(
            {
                "decile": d,
                "n_orders": int(hi - lo),
                "sum_cents": int((ov[m] * vals[m]).sum()),
                "min_cents": int(vals[m].min()),
                "max_cents": int(vals[m].max()),
            }
        )
    return pd.DataFrame(
        rows, columns=["decile", "n_orders", "sum_cents", "min_cents", "max_cents"]
    ).astype("int64")


def order_price_deciles_sql(k: int = 10) -> str:
    return f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
),
t AS (SELECT cents, NTILE({k}) OVER (ORDER BY cents) AS decile FROM c)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM t GROUP BY decile ORDER BY decile
"""


def revenue_rollup_sql() -> str:
    return """
SELECT COALESCE(n_name, 'ALL') AS n_name,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, o_orderpriority)
ORDER BY COALESCE(n_name, 'ALL'), COALESCE(o_orderpriority, 'ALL')
"""


# ---------------------------------------------------------------------------
# Pricing-summary aggregate over the widest fact table (the TPC-H Q1
# shape): per (returnflag, linestatus) sums with EXACT integer arithmetic
# — quantities and prices to cents, discount/tax to basis points, so the
# DuckDB oracle hash-matches bit-for-bit. Partials per batch (bounded at
# the 6-group key domain), one tiny groupby.
# ---------------------------------------------------------------------------


def _hund(col: pa.ChunkedArray) -> np.ndarray:
    """DOUBLE rate -> exact int64 hundredths (floor(x*100 + 0.5)) — TPC-H
    discount/tax rates carry two decimal digits, so hundredths are exact
    and keep the triple product inside the float53/int64 exact range."""
    v = col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


class _PricingSummaryStage:
    """Per-batch partials: group by (l_returnflag, l_linestatus) and sum
    quantity cents, price cents, discounted price (price * (100 - disc_h),
    in cents*hundredths) and charge (discounted * (100 + tax_h), in
    cents*hundredths^2, ~1e11/row) — exact integers throughout; the
    float53 partial-sum exactness bound is asserted loudly."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rf = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        ls = np.asarray(batch["l_linestatus"].to_pylist(), dtype=object)
        qty = _cents(batch["l_quantity"])
        price = _cents(batch["l_extendedprice"])
        disc = _hund(batch["l_discount"])
        tax = _hund(batch["l_tax"])
        disc_price = price * (100 - disc)              # cents * hundredths
        charge = disc_price * (100 + tax)              # cents * hundredths^2
        # composite key via a separator that can't appear in the values;
        # originals recovered by first-occurrence index (no char slicing —
        # correct for any flag/status width)
        key = np.char.add(np.char.add(rf.astype(str), "\x00"), ls.astype(str))
        uniq, idx, inv = np.unique(key, return_index=True, return_inverse=True)
        k = len(uniq)

        def gsum(v):
            return isum64(inv, v, k)

        # int64 partials are exact below 2^63; per-batch charge sums
        # (~1e11/row) approach that only beyond ~9e7 rows/batch — assert loudly
        mx = float(np.abs(charge).max()) if len(charge) else 0.0
        if mx * len(charge) >= 2**62:
            raise OverflowError("pricing partial exceeds exact int64 range")
        return pa.table(
            {
                "l_returnflag": pa.array([str(x) for x in rf[idx]], pa.string()),
                "l_linestatus": pa.array([str(x) for x in ls[idx]], pa.string()),
                "n_rows": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
                "sum_qty_cents": pa.array(gsum(qty).astype(np.int64)),
                "sum_price_cents": pa.array(gsum(price).astype(np.int64)),
                "sum_disc_price": pa.array(gsum(disc_price).astype(np.int64)),
                "sum_charge": pa.array(gsum(charge).astype(np.int64)),
            }
        )


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped pricing summary over lineitem with exact integer
    arithmetic (cents / basis points). Column-pruned scan, per-batch
    partials over the 6-value key domain, one tiny groupby."""
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
            ],
        )
        .map_batches(
            _PricingSummaryStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n_rows"), Sum("sum_qty_cents"), Sum("sum_price_cents"),
            Sum("sum_disc_price"), Sum("sum_charge"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "l_returnflag": agg["l_returnflag"].astype(str),
            "l_linestatus": agg["l_linestatus"].astype(str),
            "n_rows": agg["sum(n_rows)"].astype("int64"),
            "sum_qty_cents": agg["sum(sum_qty_cents)"].astype("int64"),
            "sum_price_cents": agg["sum(sum_price_cents)"].astype("int64"),
            "sum_disc_price": agg["sum(sum_disc_price)"].astype("int64"),
            "sum_charge": agg["sum(sum_charge)"].astype("int64"),
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def pricing_summary_sql() -> str:
    cents = "CAST(floor({c} * 100 + 0.5) AS BIGINT)"
    q, p = cents.format(c="l_quantity"), cents.format(c="l_extendedprice")
    d, t = cents.format(c="l_discount"), cents.format(c="l_tax")
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({q}) AS BIGINT) AS sum_qty_cents,
       CAST(SUM({p}) AS BIGINT) AS sum_price_cents,
       CAST(SUM({p} * (100 - {d})) AS BIGINT) AS sum_disc_price,
       CAST(SUM({p} * (100 - {d}) * (100 + {t})) AS BIGINT) AS sum_charge
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Gap-based sessionization over events: the canonical clickstream operator.
# A user's events split into sessions wherever the gap to the previous
# event exceeds ``gap_ms``; sessions aggregate into a bounded
# session-length histogram. Same co-partitioning layout as the window
# aggregate (all of a user's events land in one hash bucket), so a session
# can never span two groups; the group kernel is one lexsort + vectorized
# segment reductions (np.add.reduceat over session boundaries).
# ---------------------------------------------------------------------------


_SESS_EMPTY = {
    "session_len": pa.array([], pa.int64()),
    "n_sessions": pa.array([], pa.int64()),
    "sum_duration_ms": pa.array([], pa.int64()),
    "chk": pa.array([], pa.int64()),
}


def _sessions_group(gap_ms: int):
    """groupby(bkt): split each user's time-sorted events at gaps > gap_ms,
    then fold per-session (length, duration, start) into per-session-length
    partials. Tie-safe: events tied on (user, tms) have zero gap, so the
    session assignment is invariant to tie permutation — the exact property
    that makes the SQL LAG/SUM-OVER oracle deterministic too."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pa.table(_SESS_EMPTY)
        uid = _gnp(g, "uid").astype(np.int64)
        tms = _gnp(g, "tms").astype(np.int64)
        order = np.lexsort((tms, uid))
        uid, tms = uid[order], tms[order]
        starts = np.ones(len(uid), dtype=bool)
        starts[1:] = (uid[1:] != uid[:-1]) | (tms[1:] - tms[:-1] > gap_ms)
        sidx = np.flatnonzero(starts)                      # session start rows
        ends = np.concatenate((sidx[1:], [len(uid)]))      # exclusive ends
        slen = (ends - sidx).astype(np.int64)
        dur = tms[ends - 1] - tms[sidx]
        # per-term modular session checksum, congruent to the oracle's
        # HUGEINT SUM((uid % M) * K + smin % M) % M
        term = ((uid[sidx] % _PAIR_MOD) * _PAIR_K % _PAIR_MOD + tms[sidx] % _PAIR_MOD) % _PAIR_MOD
        lens, inv = np.unique(slen, return_inverse=True)
        k = len(lens)
        return pa.table(
            {
                "session_len": lens,
                "n_sessions": np.bincount(inv, minlength=k).astype(np.int64),
                "sum_duration_ms": _int_group_sums(dur, inv, k),
                "chk": _int_group_sums(term, inv, k) % _PAIR_MOD,
            }
        )

    return fn


def q_events_sessions(sf_dir: str, gap_ms: int = 86_400_000) -> pd.DataFrame:
    """Sessionization: per-user gap-based sessions (gap > ``gap_ms`` starts
    a new session; default 1 day — the testdata event stream spans ~29
    days/user, so a day-scale gap yields a rich session-length histogram
    that actually discriminates the cut logic), rolled up into a session-length
    histogram — (session_len, n_sessions, sum_duration_ms, modular
    checksum over (user_id, session_start_ms)). Plan: column-pruned read
    -> hash-bucket user_id -> groupby(bucket) -> vectorized session cut
    per group -> tiny per-length aggregate. The shuffle moves two int64
    columns per event; output is bounded by the distinct session lengths."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "tms": pa.array(_ts_ms(b["ts"])),
            }
        )

    partials = (
        ray.data.read_parquet(path, columns=["user_id", "ts"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_sessions_group(gap_ms), batch_format="pyarrow")
    )
    agg = (
        partials.groupby("session_len")
        .aggregate(Sum("n_sessions"), Sum("sum_duration_ms"), Sum("chk"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "session_len": agg["session_len"].astype("int64"),
            "n_sessions": agg["sum(n_sessions)"].astype("int64"),
            "sum_duration_ms": agg["sum(sum_duration_ms)"].astype("int64"),
            "session_checksum": agg["sum(chk)"].astype("int64") % _PAIR_MOD,
        }
    )
    return out.sort_values("session_len").reset_index(drop=True)


def events_sessions_sql(gap_ms: int = 86_400_000) -> str:
    """Sessionization oracle: LAG gap flags + running SUM OVER assign the
    same tie-invariant session ids the Ray kernel computes (ties have zero
    gap on both engines); DuckDB SUM(BIGINT) -> HUGEINT keeps the checksum
    fold exact before the end-mod."""
    from tokenzip.analysis import _PAIR_K, _PAIR_MOD

    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) // 1000 AS tms FROM events),
d AS (SELECT user_id, tms,
             CASE WHEN tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms)
                       > {gap_ms} THEN 1 ELSE 0 END AS brk
      FROM e),
s AS (SELECT user_id, tms,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY tms
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM d),
g AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(tms) - MIN(tms) AS dur, MIN(tms) AS smin
      FROM s GROUP BY user_id, sid)
SELECT n AS session_len,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(dur) AS BIGINT) AS sum_duration_ms,
       CAST(SUM((user_id % {_PAIR_MOD}) * {_PAIR_K} + (smin % {_PAIR_MOD}))
            % {_PAIR_MOD} AS BIGINT) AS session_checksum
FROM g GROUP BY n ORDER BY n
"""


# ---------------------------------------------------------------------------
# Top-N per group: the other selection the engine was missing next to the
# global top-k (training.q_vocab_topk) — per-GROUP extrema. Top-N is a
# merge-monotone selection, so each batch keeps at most N rows per group
# (partials), and the final per-group merge sees #batches * N rows, never
# the fact table. The group key arrives by broadcast dimension lookup
# (orders -> customer -> nation), so the fact side is never shuffled —
# only the tiny partials move.
# ---------------------------------------------------------------------------


def _topn_per_group(nat: np.ndarray, okey: np.ndarray, price: np.ndarray, n: int):
    """Vectorized per-group top-n by (price DESC, orderkey ASC): one
    lexsort, then keep rows whose within-group rank < n. Returns
    (keep_index_into_sorted_order, rank_1based) with groups contiguous."""
    order = np.lexsort((okey, -price, nat))
    g = nat[order]
    starts = np.ones(len(g), dtype=bool)
    starts[1:] = g[1:] != g[:-1]
    sidx = np.flatnonzero(starts)
    rank = np.arange(len(g), dtype=np.int64) - np.repeat(sidx, np.diff(np.concatenate((sidx, [len(g)]))))
    keep = rank < n
    return order[keep], rank[keep] + 1


class _TopOrdersStage:
    """Per-batch partials: nation name via broadcast customer->nation
    lookup, then at most N (n_name, o_orderkey, price_c) rows per nation
    survive the batch — the selection is merge-monotone, so re-selecting
    top-N over unioned partials is exact."""

    def __init__(self, dim_ref, n: int):
        from tokenzip.stages import _bget

        self.ckey, self.cnation, _ = _bget(dim_ref)
        self.n = n
        uniq = np.unique(self.cnation)
        self.nat_names = uniq  # sorted nation names
        # per-custkey nation ordinal (int sort keys beat object-dtype sorts)
        self.cnat_ord = np.searchsorted(uniq, self.cnation)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = batch["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(batch["o_totalprice"])
        pos = np.searchsorted(self.ckey, ck)
        if len(pos) and not np.array_equal(self.ckey[np.clip(pos, 0, len(self.ckey) - 1)], ck):
            raise ValueError("orders.o_custkey outside customer table")
        nat = self.cnat_ord[pos]
        keep, _ = _topn_per_group(nat, ok, price, self.n)
        return pa.table(
            {
                "n_name": pa.array([str(s) for s in self.nat_names[nat[keep]]], pa.string()),
                "o_orderkey": pa.array(ok[keep]),
                "price_c": pa.array(price[keep]),
            }
        )


def _topn_final(n: int):
    """groupby(n_name): merge partials — re-select top-n and emit 1-based
    ranks. Each group holds at most #batches * n tiny rows."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "rnk": pa.array([], pa.int64()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "price_cents": pa.array([], pa.int64()),
                }
            )
        okey = _gnp(g, "o_orderkey").astype(np.int64)
        price = _gnp(g, "price_c").astype(np.int64)
        order = np.lexsort((okey, -price))[:n]
        return pa.table(
            {
                "n_name": _gnp(g, "n_name")[order],
                "rnk": np.arange(1, len(order) + 1, dtype=np.int64),
                "o_orderkey": okey[order],
                "price_cents": price[order],
            }
        )

    return fn


def q_top_orders_by_nation(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """Top-N per group: the N most expensive orders of each nation
    (price DESC, ties to the smaller orderkey), emitted as
    (n_name, rnk, o_orderkey, price_cents) rows. Plan: broadcast
    customer->nation lookup into a per-batch partial top-N stage (fact
    table never shuffles; <= N rows per nation leave each batch) -> a
    nations-sized groupby re-selects the global top-N per group."""
    from tokenzip.stages import _bcast

    dim_ref = _bcast(_dim_lookup(sf_dir))
    out = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        .map_batches(
            _TopOrdersStage,
            fn_constructor_args=(dim_ref, n),
            concurrency=(1, max(2, _default_concurrency() // 2)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("n_name")
        .map_groups(_topn_final(n), batch_format="pyarrow")
        .to_pandas()
    )
    out = out.astype(
        {"n_name": str, "rnk": "int64", "o_orderkey": "int64", "price_cents": "int64"}
    )
    return out.sort_values(["n_name", "rnk"]).reset_index(drop=True)


def top_orders_by_nation_sql(n: int = 3) -> str:
    """Top-N-per-group oracle: ROW_NUMBER over (price DESC, orderkey) —
    the identical deterministic tie-break the Ray lexsort applies."""
    return f"""
WITH o AS (SELECT o_orderkey, o_custkey,
                  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
           FROM orders),
j AS (SELECT n_name, o_orderkey, price_c
      FROM o JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey),
r AS (SELECT n_name, o_orderkey, price_c,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY price_c DESC, o_orderkey) AS rnk
      FROM j)
SELECT n_name, CAST(rnk AS BIGINT) AS rnk, o_orderkey, price_c AS price_cents
FROM r WHERE rnk <= {n} ORDER BY n_name, rnk
"""


# ---------------------------------------------------------------------------
# Co-partitioned ANTI join over two fact tables: orders with no lineitem.
# Both sides are big (neither fits a broadcast at 100 TB), so this is the
# shuffle-side complement of the broadcast equi-join above: both tables
# hash-bucket the equality key into ONE union shuffle (the as-of join's
# layout), and the group kernel is a sorted-membership test. The lineitem
# side is pruned to a single int64 column before the shuffle.
# ---------------------------------------------------------------------------


def _anti_empty() -> pa.Table:
    # Arrow, not pandas: Ray's pandas-block size estimator warns on every
    # empty object column, and the all-matched (empty) outcome is the COMMON
    # case for an anti-join group.
    return pa.table(
        {
            "o_orderpriority": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "sum_price": pa.array([], pa.int64()),
            "chk": pa.array([], pa.int64()),
        }
    )


def _anti_group(g: pd.DataFrame) -> pa.Table:
    """groupby(bkt): keep order rows whose key never appears on the probe
    (lineitem) side — sorted-unique probe keys + searchsorted membership,
    vectorized over the whole group."""
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    om = side == 0
    okey = key[om]
    if not len(okey):
        return _anti_empty()
    probe = np.unique(key[~om])
    pos = np.searchsorted(probe, okey)
    pos_c = np.clip(pos, 0, max(len(probe) - 1, 0))
    miss = ~(probe[pos_c] == okey) if len(probe) else np.ones(len(okey), bool)
    if not miss.any():
        return _anti_empty()
    pri = _gnp(g, "pri")[om][miss]
    price = _gnp(g, "price_c").astype(np.int64)[om][miss]
    kmod = okey[miss] % _PAIR_MOD
    uniq, inv = np.unique(pri, return_inverse=True)
    k = len(uniq)
    return pa.table(
        {
            "o_orderpriority": pa.array([str(s) for s in uniq], pa.string()),
            "n_orders": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
            "sum_price": pa.array(_int_group_sums(price, inv, k)),
            "chk": pa.array(_int_group_sums(kmod, inv, k) % _PAIR_MOD),
        }
    )


def q_orders_without_lineitems(sf_dir: str) -> pd.DataFrame:
    """ANTI join of two fact tables: orders that have no lineitem rows,
    aggregated per o_orderpriority as (n_orders, sum_price_cents, modular
    orderkey checksum). Plan: both tables hash-bucket the orderkey into
    ONE union shuffle (lineitem pruned to its single key column, orders to
    key + priority + price) -> groupby(bucket) -> sorted-membership anti
    test per group -> tiny per-priority aggregate."""
    opath = os.path.join(sf_dir, "orders.parquet")
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(opath) + _row_count(lpath))

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "pri": b["o_orderpriority"].combine_chunks(),
                "price_c": pa.array(_cents(b["o_totalprice"])),
            }
        )

    def lrows(b: pa.Table) -> pa.Table:
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(lk)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk, nb)),
                "side": pa.array(np.ones(n, np.int64)),
                "key": pa.array(lk),
                "pri": pa.array([""] * n, pa.string()),
                "price_c": pa.array(np.zeros(n, np.int64)),
            }
        )

    od = ray.data.read_parquet(
        opath, columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(lpath, columns=["l_orderkey"]).map_batches(
        lrows, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = od.union(li).groupby("bkt").map_groups(_anti_group, batch_format="pyarrow")
    agg = (
        partials.groupby("o_orderpriority")
        .aggregate(Sum("n_orders"), Sum("sum_price"), Sum("chk"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"].astype(str),
            "n_orders": agg["sum(n_orders)"].astype("int64"),
            "sum_price_cents": agg["sum(sum_price)"].astype("int64"),
            "order_checksum": agg["sum(chk)"].astype("int64") % _PAIR_MOD,
        }
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def orders_without_lineitems_sql() -> str:
    """Anti-join oracle: NOT EXISTS against lineitem, identical cents and
    modular-checksum arithmetic."""
    from tokenzip.analysis import _PAIR_MOD

    return f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_cents,
       CAST(SUM(o_orderkey % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT)
           AS order_checksum
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Tumbling-window aggregate: fixed, non-overlapping time buckets — the
# GROUP BY floor(ts/window) complement of the sliding RANGE-frame window
# above. No key shuffle at all: each batch pre-aggregates to its distinct
# (bucket, event_type) pairs, and the final groupby domain is
# (#windows x #types) — independent of the event count, so the exchange
# stays tiny at any corpus size.
# ---------------------------------------------------------------------------


def q_events_tumbling_agg(sf_dir: str, window_ms: int = 3_600_000) -> pd.DataFrame:
    """Per (tumbling hour, event_type): event count and exact value cents.
    Column-pruned read -> per-batch composite-key bincount partials -> one
    bounded groupby. Timestamps are epoch-ms floor-divided into buckets,
    identical to the oracle's integer arithmetic."""
    path = os.path.join(sf_dir, "events.parquet")

    def rows(b: pa.Table) -> pa.Table:
        tms = _ts_ms(b["ts"])
        cents = _cents(b["value"])
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        if len(et) == 0:
            return pa.table(
                {
                    "bucket_start_ms": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value_cents": pa.array([], pa.int64()),
                }
            )
        bkt = tms // window_ms
        uet, einv = np.unique(et, return_inverse=True)
        ubk, binv = np.unique(bkt, return_inverse=True)
        code = binv.astype(np.int64) * len(uet) + einv
        uc, cinv = np.unique(code, return_inverse=True)
        return pa.table(
            {
                "bucket_start_ms": pa.array(ubk[uc // len(uet)] * window_ms),
                "event_type": pa.array(
                    [str(s) for s in uet[uc % len(uet)]], pa.string()
                ),
                "n_events": pa.array(np.bincount(cinv).astype(np.int64)),
                "sum_value_cents": pa.array(
                    isum64(cinv, cents)
                ),
            }
        )

    agg = (
        ray.data.read_parquet(path, columns=["ts", "event_type", "value"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["bucket_start_ms", "event_type"])
        .aggregate(Sum("n_events"), Sum("sum_value_cents"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "bucket_start_ms": agg["bucket_start_ms"].astype("int64"),
            "event_type": agg["event_type"].astype(str),
            "n_events": agg["sum(n_events)"].astype("int64"),
            "sum_value_cents": agg["sum(sum_value_cents)"].astype("int64"),
        }
    )
    return out.sort_values(["bucket_start_ms", "event_type"]).reset_index(drop=True)


def events_tumbling_sql(window_ms: int = 3_600_000) -> str:
    return f"""
SELECT (epoch_ms(ts) // {window_ms}) * {window_ms} AS bucket_start_ms,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Co-partitioned INNER equi-join of two FACT tables (lineitem x orders) —
# the large-x-large complement of the broadcast equi-join above: neither
# side fits a broadcast at 100 TB, so BOTH sides hash-bucket the join key
# into one union shuffle (the same bounded-group layout as the as-of /
# range / anti joins) and each group resolves the join with one sort +
# searchsorted. The shuffle moves four narrow columns per row — never the
# wide payloads; revenue is pre-reduced to one int64 before the exchange.
# ---------------------------------------------------------------------------

_REV_EMPTY = {
    "o_orderpriority": pa.array([], pa.string()),
    "n_items": pa.array([], pa.int64()),
    "sum_revenue": pa.array([], pa.int64()),
}


def _revenue_group(g: pd.DataFrame) -> pd.DataFrame:
    """One join bucket: sort the order keys, locate every lineitem by
    searchsorted, roll up matched revenue per priority. o_orderkey is the
    primary key — a duplicate within the bucket means corrupt input and
    raises loudly (silently joining twice would double revenue)."""
    if not len(g):
        return pa.table(_REV_EMPTY)
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    om = side == 0
    okey = key[om]
    oo = np.argsort(okey, kind="stable")
    okey = okey[oo]
    if len(okey) > 1 and bool((okey[1:] == okey[:-1]).any()):
        raise ValueError("duplicate o_orderkey: orders PK violated")
    pri = np.asarray(_gnp(g, "pri"))[om][oo]
    lkey = key[~om]
    rev = _gnp(g, "rev").astype(np.int64)[~om]
    pos = np.searchsorted(okey, lkey)
    hit = (pos < len(okey)) & (
        okey[np.clip(pos, 0, max(len(okey) - 1, 0))] == lkey
        if len(okey)
        else np.zeros(len(lkey), dtype=bool)
    )
    if not hit.any():
        return pa.table(_REV_EMPTY)
    ppri = pri[pos[hit]]
    uniq, inv = np.unique(ppri, return_inverse=True)
    return pa.table(
        {
            "o_orderpriority": [str(s) for s in uniq],
            "n_items": np.bincount(inv, minlength=len(uniq)).astype(np.int64),
            "sum_revenue": isum64(inv, rev[hit], len(uniq)),
        }
    )


def q_order_revenue_by_priority(
    sf_dir: str, hot_keys=None, hot_frac: float = 0.10
) -> pd.DataFrame:
    """Revenue per order priority through the lineitem JOIN orders inner
    equi-join: revenue = price_cents * (100 - discount_hundredths), exact
    int64 (the pricing_summary arithmetic). Plan: both fact tables project
    onto one shared narrow schema, union, hash-bucket groupby on the join
    key, per-group sort-merge, priority-sized final aggregate.

    ``hot_keys`` ("auto" or an explicit list) engages the same skew salting
    as the as-of/range joins: a viral orderkey's probe (lineitem) rows split
    across reserved salt buckets by hash of (orderkey, linenumber) and its
    single build (orders) row is replicated per salt — the per-priority
    aggregate is associative, so the answer is split-invariant."""
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    opath = os.path.join(sf_dir, "orders.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))
    hot_keys = _resolve_hot_keys(hot_keys, lpath, "l_orderkey", hot_frac)
    if hot_keys is not None:
        hot_keys = np.sort(np.asarray(hot_keys, dtype=np.int64))

    def lrows(b: pa.Table) -> pa.Table:
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = np.floor(
            b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        n = len(lk)
        if hot_keys is not None:
            ln = b["l_linenumber"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            rid = lk * 31 + ln  # unique per lineitem row -> uniform salt
            bkt, _ = _salted_bkt(lk, rid, nb, hot_keys, probe=True)
        else:
            bkt = _jbkt_of(lk, nb)
        return pa.table(
            {
                "bkt": pa.array(bkt),
                "side": pa.array(np.ones(n, np.int64)),
                "key": pa.array(lk),
                "rev": pa.array(price * (100 - disc)),
                "pri": pa.array([""] * n, pa.string()),
            }
        )

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ok)
        t = pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(n, np.int64)),
                "key": pa.array(ok),
                "rev": pa.array(np.zeros(n, np.int64)),
                "pri": b["o_orderpriority"].combine_chunks(),
            }
        )
        if hot_keys is not None:
            t = _replicate_hot_build(t, ok, hot_keys, nb)
        return t

    lcols = ["l_orderkey", "l_extendedprice", "l_discount"]
    if hot_keys is not None:
        lcols.append("l_linenumber")
    li = ray.data.read_parquet(lpath, columns=lcols).map_batches(
        lrows, batch_format="pyarrow", zero_copy_batch=True
    )
    od = ray.data.read_parquet(
        opath, columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        li.union(od)
        .groupby("bkt")
        .map_groups(_revenue_group, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_items"), Sum("sum_revenue"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"].astype(str),
            "n_items": agg["sum(n_items)"].astype("int64"),
            "sum_revenue": agg["sum(sum_revenue)"].astype("int64"),
        }
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


_Q3_CUT_MS = 900_288_000_000  # 1998-07-15 UTC epoch-ms


def _q3_group(k: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.int64()),
                "o_orderdate_ms": pa.array([], pa.int64()),
            }
        )
        if not len(g):
            return empty
        is_o = _gnp(g, "side", np.int64) == 0
        key = _gnp(g, "key", np.int64)
        rv = _gnp(g, "rev", np.int64)
        ok = key[is_o]
        odate = rv[is_o]  # odate rides rev slot
        order = np.argsort(ok, kind="stable")
        ok, odate = ok[order], odate[order]
        if len(np.unique(ok)) != len(ok):
            raise ValueError("duplicate o_orderkey in the orders side")
        lk = key[~is_o]
        rev = rv[~is_o]
        hit, pos = _probe_sorted(ok, lk)
        if not hit.any():
            return empty
        pos, rev = pos[hit], rev[hit]
        per = np.zeros(len(ok), np.int64)
        np.add.at(per, pos, rev)
        nz = per > 0
        keys, revs, dates = ok[nz], per[nz], odate[nz]
        top = np.lexsort((keys, -revs))[:k]
        return pa.table(
            {
                "o_orderkey": keys[top],
                "revenue": revs[top],
                "o_orderdate_ms": dates[top],
            }
        )

    return fn


def q_shipping_priority(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 shape: top-k orders by outstanding revenue — orders placed
    BEFORE the cutoff whose lineitems ship AFTER it. Both date predicates
    push into the parquet reads (non-qualifying row groups never leave
    storage), the join is the co-partitioned union shuffle, revenue folds
    per order inside each bucket, and only bucket-local top-k rows reach
    the driver. Integer cents × (100 − discount-hundredths) revenue."""
    import pyarrow.compute as pc_

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    opath = os.path.join(sf_dir, "orders.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))
    cut = pa.scalar(_Q3_CUT_MS * 1000, pa.timestamp("us"))

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        odate = _ts_ms(b["o_orderdate"])
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "rev": pa.array(odate),  # orderdate rides the rev slot
            }
        )

    def lrows(b: pa.Table) -> pa.Table:
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = np.floor(
            b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk, nb)),
                "side": pa.array(np.ones(len(lk), np.int64)),
                "key": pa.array(lk),
                "rev": pa.array(price * (100 - disc)),
            }
        )

    od = ray.data.read_parquet(
        opath,
        columns=["o_orderkey", "o_orderdate"],
        filter=pc_.field("o_orderdate") < cut,
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(
        lpath,
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc_.field("l_shipdate") > cut,
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    parts = (
        od.union(li)
        .groupby("bkt")
        .map_groups(_q3_group(k), batch_format="pyarrow")
        .to_pandas()
    )
    top = (
        parts.sort_values(["revenue", "o_orderkey"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "o_orderkey": top["o_orderkey"].astype("int64"),
            "revenue": top["revenue"].astype("int64"),
            "o_orderdate_ms": top["o_orderdate_ms"].astype("int64"),
        }
    )


def shipping_priority_sql(k: int = 10) -> str:
    return f"""
WITH r AS (
  SELECT o_orderkey,
         CAST(epoch_us(o_orderdate) // 1000 AS BIGINT) AS o_orderdate_ms,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS revenue
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE epoch_us(o_orderdate) // 1000 < {_Q3_CUT_MS}
    AND epoch_us(l_shipdate) // 1000 > {_Q3_CUT_MS}
  GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS BIGINT)
           AS rank,
       o_orderkey, revenue, o_orderdate_ms
FROM r ORDER BY revenue DESC, o_orderkey ASC LIMIT {k}
"""


def order_revenue_sql() -> str:
    return """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS sum_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit: dangling-FK counts per relation — the data-
# quality gate a pipeline runs before joins assume their keys resolve.
# Two relations, two join shapes: the fact->fact edge (lineitem->orders)
# goes through the co-partitioned key shuffle (narrow key rows only), the
# fact->dimension edge (orders->customer) probes a broadcast sorted key
# array. Output is a 2-row frame, exchange volume is O(rows) narrow ints.
# ---------------------------------------------------------------------------


def _probe_sorted(sorted_keys: np.ndarray, probes: np.ndarray):
    """(hit_mask, clipped_positions) of ``probes`` against a SORTED key
    array — EMPTY-SAFE.  Every co-partitioned join group whose parent side
    is FILTERED (date cutoffs, returnflag, thresholds) can receive a
    bucket with child rows and ZERO parents; the naive
    ``ok[np.clip(pos, 0, len(ok)-1)]`` crashes on that bucket (found by
    the q22 property differential — the sf sweeps never produced one)."""
    if not len(sorted_keys) or not len(probes):
        return np.zeros(len(probes), dtype=bool), np.zeros(len(probes), np.int64)
    pos = np.searchsorted(sorted_keys, probes)
    clip = np.minimum(pos, len(sorted_keys) - 1)
    return (pos < len(sorted_keys)) & (sorted_keys[clip] == probes), clip


def _fk_group(g: pd.DataFrame) -> pd.DataFrame:
    """One key bucket: child keys (side=1) not present among parent keys
    (side=0), counted via one sort + searchsorted."""
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    parents = np.sort(key[side == 0])
    childs = key[side == 1]
    if len(parents):
        pos = np.searchsorted(parents, childs)
        hit = (pos < len(parents)) & (
            parents[np.clip(pos, 0, len(parents) - 1)] == childs
        )
    else:
        hit = np.zeros(len(childs), dtype=bool)
    return pa.table(
        {
            "n_rows": [int(len(childs))],
            "n_dangling": [int((~hit).sum())],
        }
    )


def q_fk_integrity(sf_dir: str) -> pd.DataFrame:
    """(relation, n_rows, n_dangling) for lineitem->orders and
    orders->customer."""
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    opath = os.path.join(sf_dir, "orders.parquet")
    cpath = os.path.join(sf_dir, "customer.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    def krows(col: str, side_val: int):
        def fn(b: pa.Table) -> pa.Table:
            k = b[col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(k)
            return pa.table(
                {
                    "bkt": pa.array(_jbkt_of(k, nb)),
                    "side": pa.array(np.full(n, side_val, np.int64)),
                    "key": pa.array(k),
                }
            )

        return fn

    li = ray.data.read_parquet(lpath, columns=["l_orderkey"]).map_batches(
        krows("l_orderkey", 1), batch_format="pyarrow", zero_copy_batch=True
    )
    od = ray.data.read_parquet(opath, columns=["o_orderkey"]).map_batches(
        krows("o_orderkey", 0), batch_format="pyarrow", zero_copy_batch=True
    )
    lo_audit = (
        li.union(od)
        .groupby("bkt")
        .map_groups(_fk_group, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )

    # orders->customer: the parent is a dimension table — broadcast once
    import pyarrow.parquet as pq

    from tokenzip.stages import _bcast, _bget

    ckeys = np.unique(
        pq.read_table(cpath, columns=["c_custkey"])["c_custkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ref = _bcast(ckeys)

    def probe(b: pa.Table) -> pa.Table:
        keys = _bget(ref)
        ok = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            pos = np.searchsorted(keys, ok)
            hit = (pos < len(keys)) & (keys[np.clip(pos, 0, len(keys) - 1)] == ok)
        else:
            hit = np.zeros(len(ok), dtype=bool)
        return pa.table(
            {
                "n_rows": pa.array([len(ok)], pa.int64()),
                "n_dangling": pa.array([int((~hit).sum())], pa.int64()),
            }
        )

    oc_audit = (
        ray.data.read_parquet(opath, columns=["o_custkey"])
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sum()
    )
    return pd.DataFrame(
        {
            "relation": ["lineitem->orders", "orders->customer"],
            "n_rows": np.array(
                [int(lo_audit["n_rows"]), int(oc_audit["n_rows"])], dtype=np.int64
            ),
            "n_dangling": np.array(
                [int(lo_audit["n_dangling"]), int(oc_audit["n_dangling"])],
                dtype=np.int64,
            ),
        }
    )


def fk_integrity_sql() -> str:
    return """
SELECT * FROM (
  SELECT 'lineitem->orders' AS relation,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dangling
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'orders->customer',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders LEFT JOIN customer c ON o_custkey = c_custkey
) ORDER BY relation
"""


# ---------------------------------------------------------------------------
# Window FRAMES: per-user peak 3-event sliding spend (SUM OVER ROWS BETWEEN
# 2 PRECEDING AND CURRENT ROW, then MAX per user). The LAG operator above
# covers offset windows; this one covers bounded frames — the rolling sum
# is a cumulative-sum difference with the frame start clamped at each
# user's segment boundary, so partial leading windows match SQL exactly.
# Same co-partitioned single-shuffle plan as sessionization: each user
# lands wholly in one hash bucket, so per-user results need NO second
# aggregation.
# ---------------------------------------------------------------------------


def _peak_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(bucket): lexsort by (uid, tms, eid), segmented 3-row rolling
    sums via cumsum differences with frame starts clamped at user
    boundaries, per-user max — vectorized, zero per-row Python."""
    if not len(g):
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "peak3_cents": pa.array([], pa.int64()),
            }
        )
    uid = _gnp(g, "uid", np.int64)
    tms = _gnp(g, "tms", np.int64)
    eid = _gnp(g, "eid", np.int64)
    cents = _gnp(g, "cents", np.int64)
    order = np.lexsort((eid, tms, uid))
    uid, cents = uid[order], cents[order]
    n = len(uid)
    first = np.zeros(n, bool)
    first[0] = True
    first[1:] = uid[1:] != uid[:-1]
    seg_starts = np.flatnonzero(first)
    seg_id = np.cumsum(first) - 1
    lo = np.maximum(np.arange(n) - 2, seg_starts[seg_id])
    csum = np.zeros(n + 1, np.int64)
    np.cumsum(cents, out=csum[1:])
    w3 = csum[1:] - csum[lo]
    return pa.table(
        {
            "user_id": uid[seg_starts],
            "n_events": np.diff(np.append(seg_starts, n)).astype("int64"),
            "peak3_cents": np.maximum.reduceat(w3, seg_starts).astype(
                "int64"
            ),
        }
    )


def q_user_peak_window(sf_dir: str) -> pd.DataFrame:
    """Window-frame operator: for each user, the maximum over all 3-event
    sliding windows (ordered by ts, event_id tie-break) of the window's
    summed spend in cents. Hash-bucket user_id once; the frame never
    crosses a bucket because a user never does."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        uid = (
            b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        v = (
            b["value"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "tms": pa.array(_ts_ms(b["ts"])),
                "eid": pa.array(
                    b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                # floor(x*100): both engines run the identical double
                # multiply + floor (values may be negative, so no +0.5)
                "cents": pa.array(np.floor(v * 100.0).astype(np.int64)),
            }
        )

    out = (
        ray.data.read_parquet(
            path, columns=["user_id", "ts", "event_id", "value"]
        )
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_peak_group, batch_format="pyarrow")
        .to_pandas()
    )
    out = out[["user_id", "n_events", "peak3_cents"]].astype(
        {"user_id": "int64", "n_events": "int64", "peak3_cents": "int64"}
    )
    return out.sort_values("user_id").reset_index(drop=True)


def user_peak_window_sql() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000 AS tms,
         CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT user_id,
         SUM(cents) OVER (PARTITION BY user_id ORDER BY tms, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w3
  FROM e
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(w3) AS BIGINT) AS peak3_cents
FROM w GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Correlated-aggregate filter (the TPC-H Q17 shape): revenue from lineitems
# whose quantity is below half their part's average quantity. The per-part
# average is a first distributed pass pre-aggregated per batch and bounded
# by the part DIMENSION (broadcast once via ray.put, like the
# customer×nation lookup); the comparison cross-multiplies —
# 2*qty*cnt < sum_qty — so no float division ever happens on either
# engine. Second pass filters and rolls revenue up per brand.
# ---------------------------------------------------------------------------


class _SmallQtyStage:
    """Second-pass lineitem scan: broadcast (partkey -> sum_qty, cnt,
    brand) lookup, integer cross-multiplied avg comparison, per-brand
    revenue partials."""

    def __init__(self, ref):
        self.pk, self.sq, self.cnt, self.brand = ray.get(ref[0])

    def __call__(self, b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        pos = np.searchsorted(self.pk, pk)
        if len(pos) and not np.array_equal(
            self.pk[np.clip(pos, 0, len(self.pk) - 1)], pk
        ):
            raise ValueError("lineitem.l_partkey outside part table")
        keep = 2 * qty * self.cnt[pos] < self.sq[pos]
        brands = self.brand[pos][keep]
        ub, inv = np.unique(brands, return_inverse=True)
        return pa.table(
            {
                "p_brand": pa.array([str(s) for s in ub], pa.string()),
                "n_rows": pa.array(np.bincount(inv).astype(np.int64)),
                "revenue_cents": pa.array(
                    isum64(inv, price[keep])
                ),
            }
        )


def q_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: per-brand count and revenue of small-quantity
    lineitems (qty < half the part's average qty), with the per-part
    average from a first distributed pass and an integer cross-multiplied
    comparison (no float division on either engine)."""
    import pyarrow.parquet as pq

    from tokenzip.stages import _bcast

    li = os.path.join(sf_dir, "lineitem.parquet")

    def partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        up, inv = np.unique(pk, return_inverse=True)
        return pa.table(
            {
                "l_partkey": pa.array(up),
                "sq": pa.array(isum64(inv, qty)),
                "cnt": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    per_part = (
        ray.data.read_parquet(li, columns=["l_partkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sq"), Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    pkeys = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pkeys, kind="stable")
    pkeys = pkeys[order]
    brand = np.asarray(part["p_brand"].to_pylist(), dtype=object)[order]
    # align the per-part aggregates onto the part dimension (parts with no
    # lineitems keep cnt=0 — the strict inequality then drops nothing,
    # matching the oracle's inner join)
    sq = np.zeros(len(pkeys), np.int64)
    cnt = np.zeros(len(pkeys), np.int64)
    pos = np.searchsorted(pkeys, per_part["l_partkey"].to_numpy(np.int64))
    sq[pos] = per_part["sq"].to_numpy(np.int64)
    cnt[pos] = per_part["cnt"].to_numpy(np.int64)
    ref = _bcast((pkeys, sq, cnt, brand))

    agg = (
        ray.data.read_parquet(
            li, columns=["l_partkey", "l_quantity", "l_extendedprice"]
        )
        .map_batches(
            _SmallQtyStage,
            fn_constructor_args=(ref,),
            concurrency=(1, max(2, _default_concurrency() // 2)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("p_brand")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
    )
    out = agg[["p_brand", "n_rows", "revenue_cents"]].astype(
        {"n_rows": "int64", "revenue_cents": "int64"}
    )
    out["p_brand"] = out["p_brand"].astype(str)
    return out.sort_values("p_brand").reset_index(drop=True)


def small_qty_revenue_sql() -> str:
    return """
WITH a AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS sq,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN a ON l.l_partkey = a.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE 2 * CAST(FLOOR(l.l_quantity) AS BIGINT) * a.cnt < a.sq
GROUP BY p.p_brand ORDER BY p.p_brand
"""


# ---------------------------------------------------------------------------
# GROUP BY CUBE(l_returnflag, l_linestatus): all FOUR grouping sets from
# one fact-table scan — the finest (rf, ls) level is a Ray groupby over
# the bounded flag domain; the two single-dim margins and the grand total
# fold from it driver-side (the distributed-cube identity ROLLUP above
# uses, extended with the second margin).
# ---------------------------------------------------------------------------


def q_lineitem_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE over (returnflag, linestatus): counts, integer quantity sums
    and revenue cents at every grouping set, 'ALL' marking aggregated-out
    dimensions."""

    def partial(b: pa.Table) -> pa.Table:
        rf = np.asarray(b["l_returnflag"].to_pylist(), dtype=object)
        ls = np.asarray(b["l_linestatus"].to_pylist(), dtype=object)
        qty = np.floor(
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        ur, rinv = np.unique(rf, return_inverse=True)
        ul, linv = np.unique(ls, return_inverse=True)
        code = rinv.astype(np.int64) * len(ul) + linv
        uc, cinv = np.unique(code, return_inverse=True)
        return pa.table(
            {
                "l_returnflag": pa.array(
                    [str(s) for s in ur[uc // len(ul)]], pa.string()
                ),
                "l_linestatus": pa.array(
                    [str(s) for s in ul[uc % len(ul)]], pa.string()
                ),
                "n_rows": pa.array(np.bincount(cinv).astype(np.int64)),
                "sum_qty": pa.array(
                    isum64(cinv, qty)
                ),
                "revenue_cents": pa.array(
                    isum64(cinv, price)
                ),
            }
        )

    fine = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
            ],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
    )
    fine = fine[
        ["l_returnflag", "l_linestatus", "n_rows", "sum_qty", "revenue_cents"]
    ].astype({"n_rows": "int64", "sum_qty": "int64", "revenue_cents": "int64"})
    fine["l_returnflag"] = fine["l_returnflag"].astype(str)
    fine["l_linestatus"] = fine["l_linestatus"].astype(str)
    vals = ["n_rows", "sum_qty", "revenue_cents"]
    by_rf = fine.groupby("l_returnflag", as_index=False)[vals].sum()
    by_rf["l_linestatus"] = "ALL"
    by_ls = fine.groupby("l_linestatus", as_index=False)[vals].sum()
    by_ls["l_returnflag"] = "ALL"
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            **{v: [fine[v].sum()] for v in vals},
        }
    )
    out = pd.concat([fine, by_rf, by_ls, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus"] + vals
    ]
    for v in vals:
        out[v] = out[v].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(
        drop=True
    )


def lineitem_cube_sql() -> str:
    return """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY COALESCE(l_returnflag, 'ALL'), COALESCE(l_linestatus, 'ALL')
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution INCLUDING the
# zero-order bucket — the classic LEFT JOIN + double GROUP BY, computed
# without any join at all: the left join's only contribution is the
# zero-count group, and that is customer-row-count minus the number of
# DISTINCT ordering customers (fk_integrity guarantees every o_custkey
# resolves).  Shape at 100 TB: one orders scan with per-batch (custkey ->
# n) partials, a custkey-hash groupby, then per-batch (c_count -> n_cust)
# partials into a c_count-sized (tiny, bounded by max orders/customer)
# final groupby; the customer table contributes ONE metadata row count —
# no customer scan, no shuffle of the dimension.
# reference parity: distribution aggregates mirror the reference's
# benches/varint_bench summary tables (bench-first discipline), not any
# reference operator — this is engine-completion surface.
# ---------------------------------------------------------------------------


def _custkey_partial(nb: int):
    def fn(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(u, nb)),
                "k": pa.array(u),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    return fn


def _ccount_group(g: pd.DataFrame) -> pd.DataFrame:
    """One custkey bucket: exact per-customer totals (custkeys never span
    buckets), collapsed to the bucket's (c_count -> n_cust) census — a
    bounded map_groups fold instead of a |customers|-key aggregate."""
    if not len(g):
        return pa.table(
            {
                "c_count": pa.array([], pa.int64()),
                "n_cust": pa.array([], pa.int64()),
            }
        )
    k = _gnp(g, "k").astype(np.int64)
    n = _gnp(g, "n").astype(np.int64)
    u, inv = np.unique(k, return_inverse=True)
    tot = isum64(inv, n)
    uc, cnt = np.unique(tot, return_counts=True)
    return pa.table({"c_count": uc, "n_cust": cnt.astype(np.int64)})


def q_customer_order_dist(sf_dir: str) -> pd.DataFrame:
    """(c_count, custdist): how many customers placed exactly c_count
    orders, zero included."""
    total_cust = _row_count(os.path.join(sf_dir, "customer.parquet"))
    opath = os.path.join(sf_dir, "orders.parquet")
    nb = _lsh_n_buckets(_row_count(opath))
    agg = (
        ray.data.read_parquet(opath, columns=["o_custkey"])
        .map_batches(
            _custkey_partial(nb), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bkt")
        .map_groups(_ccount_group, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("n_cust"))
        .to_pandas()
    )
    if not len(agg):
        # zero-block gotcha: an empty/fully-filtered orders table yields a
        # column-less aggregate frame — fall through to the zero bucket only
        agg = pd.DataFrame({"c_count": [], "sum(n_cust)": []})
    out = pd.DataFrame(
        {
            "c_count": agg["c_count"].astype("int64"),
            "custdist": agg["sum(n_cust)"].astype("int64"),
        }
    )
    zero = total_cust - int(out["custdist"].sum())
    if zero < 0:
        raise ValueError("more distinct o_custkey values than customer rows")
    if zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    return out.sort_values("c_count").reset_index(drop=True).astype("int64")


def customer_order_dist_sql() -> str:
    return """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count ORDER BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
# threshold, joined back to the order header.  The HAVING filter runs
# distributed (groupby-sum then an Arrow filter); only the survivors —
# by construction the extreme tail of the per-order quantity
# distribution, a vanishing fraction at any corpus size — reach the
# driver as a broadcast lookup for the header scan, so the join back is
# a membership probe per orders batch, never a second shuffle.
# ---------------------------------------------------------------------------

_Q18_QTY = 250


def _qty_partial(nb: int):
    def fn(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(u, nb)),
                "k": pa.array(u),
                "q": pa.array(isum64(inv, qty)),
            }
        )

    return fn


def _heavy_group(min_qty: int):
    """One orderkey bucket: fold the partials to exact per-order totals
    (orderkeys never span buckets) and emit ONLY the threshold survivors
    — the HAVING filter runs inside the bounded group fold, so the big
    |orders|-key aggregate never materializes."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64()),
                }
            )
        k = _gnp(g, "k").astype(np.int64)
        q = _gnp(g, "q").astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        tot = isum64(inv, q)
        keep = tot > min_qty
        return pa.table({"k": u[keep], "sum_qty": tot[keep]})

    return fn


def q_large_orders(sf_dir: str, min_qty: int = _Q18_QTY) -> pd.DataFrame:
    """Order headers for orders with SUM(l_quantity) > min_qty:
    (o_orderkey, o_custkey, o_totalprice_cents, o_orderdate_ms, sum_qty)."""
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))
    heavy = (
        ray.data.read_parquet(lpath, columns=["l_orderkey", "l_quantity"])
        .map_batches(_qty_partial(nb), batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_heavy_group(int(min_qty)), batch_format="pyarrow")
        .to_pandas()
    )
    empty_cols = [
        "o_orderkey", "o_custkey", "o_totalprice_cents",
        "o_orderdate_ms", "sum_qty",
    ]
    if not len(heavy):  # all-groups-empty output carries NO columns
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in empty_cols})
    keys = heavy["k"].to_numpy().astype(np.int64)
    qtys = heavy["sum_qty"].to_numpy().astype(np.int64)
    o = np.argsort(keys)
    keys, qtys = keys[o], qtys[o]
    keys_ref = ray.put(keys)
    qtys_ref = ray.put(qtys)

    def orows(b: pa.Table) -> pa.Table:
        ks, qs = ray.get(keys_ref), ray.get(qtys_ref)
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        hit, pos = _probe_sorted(ks, ok)
        sub = b.filter(pa.array(hit))
        return pa.table(
            {
                "o_orderkey": pa.array(ok[hit]),
                "o_custkey": pa.array(
                    sub["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "o_totalprice_cents": pa.array(_cents(sub["o_totalprice"])),
                "o_orderdate_ms": pa.array(_ts_ms(sub["o_orderdate"])),
                "sum_qty": pa.array(qs[pos[hit]]),
            }
        )

    out = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True).astype("int64")


def large_orders_sql(min_qty: int = _Q18_QTY) -> str:
    return f"""
WITH s AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1
)
SELECT o_orderkey, o_custkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_totalprice_cents,
       CAST(epoch_us(o_orderdate) // 1000 AS BIGINT) AS o_orderdate_ms,
       sum_qty
FROM orders JOIN s ON o_orderkey = s.l_orderkey
WHERE sum_qty > {int(min_qty)}
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: orders counted per priority when an EXISTS-correlated
# lineitem predicate holds (here: at least one returned lineitem).  The
# EXISTS is a co-partitioned SEMI join — parent and child rows union into
# one orderkey-hash bucket shuffle carrying only (bkt, side, key, prio);
# each group counts parents with >= 1 child hit via one sort +
# searchsorted, emitting per-priority partials; the final groupby is
# priority-sized.  No distinct-set broadcast, no driver pull.
# ---------------------------------------------------------------------------


def _exists_group(g: pd.DataFrame) -> pd.DataFrame:
    empty = pa.table(
        {
            "o_orderpriority": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    pk = key[side == 0]
    prio = _gnp(g, "prio")[side == 0]
    ck = np.unique(key[side == 1])
    if not len(pk) or not len(ck):
        return empty
    pos = np.searchsorted(ck, pk)
    hit = (pos < len(ck)) & (ck[np.clip(pos, 0, len(ck) - 1)] == pk)
    if not hit.any():
        return empty
    u, cnt = np.unique(prio[hit].astype(str), return_counts=True)
    return pa.table({"o_orderpriority": u, "n": cnt.astype(np.int64)})


def q_order_priority_exists(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, n_orders): orders with >=1 returned lineitem."""
    import pyarrow.compute as pc_

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "prio": b["o_orderpriority"].combine_chunks(),
            }
        )

    def lrows(b: pa.Table) -> pa.Table:
        lk = np.unique(
            b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk, nb)),
                "side": pa.array(np.ones(len(lk), np.int64)),
                "key": pa.array(lk),
                "prio": pa.array([""] * len(lk), pa.string()),
            }
        )

    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(
        lpath,
        columns=["l_orderkey"],
        filter=pc_.field("l_returnflag") == "R",
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        od.union(li)
        .groupby("bkt")
        .map_groups(_exists_group, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"].astype(str),
            "n_orders": agg["n_orders"].astype("int64"),
        }
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def order_priority_exists_sql() -> str:
    return """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: top-k customers by returned-item revenue.  The
# fact-fact edge (lineitem filtered to returns x orders) is the
# co-partitioned union shuffle; per-bucket groups fold revenue per
# custkey, the partials re-key into CUSTKEY-hash buckets where the
# in-group sum is each customer's global total and only the bucket's
# top-k rows survive (k x #buckets rows reach the driver), and — the
# scale-shaped enrichment — customer NAMES are fetched by a parquet
# read FILTERED to the k winning keys (a k-row dimension probe, never a
# dimension scan or broadcast of the customer table).
# ---------------------------------------------------------------------------


def _q10_group(g: pd.DataFrame) -> pd.DataFrame:
    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "rev": pa.array([], pa.int64()),
        }
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    val = _gnp(g, "val").astype(np.int64)
    ok = key[side == 0]
    cust = val[side == 0]
    order = np.argsort(ok, kind="stable")
    ok, cust = ok[order], cust[order]
    if len(np.unique(ok)) != len(ok):
        raise ValueError("duplicate o_orderkey in the orders side")
    lk = key[side == 1]
    rev = val[side == 1]
    hit, pos = _probe_sorted(ok, lk)
    if not hit.any():
        return empty
    ck = cust[pos[hit]]
    u, inv = np.unique(ck, return_inverse=True)
    return pa.table(
        {
            "c_custkey": u,
            "rev": isum64(inv, rev[hit]),
        }
    )


def _q10_rekey(nb: int):
    """Partial rows leave the orderkey buckets keyed by CUSTKEY hash — a
    custkey's partials all land in one bounded bucket, so the in-group
    sum below is that customer's GLOBAL revenue."""

    def fn(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt2": pa.array(_jbkt_of(ck, nb)),
                "c_custkey": pa.array(ck),
                "rev": b["rev"].combine_chunks(),
            }
        )

    return fn


def _q10_final_group(k: int):
    """One custkey bucket: exact per-customer totals, keep the bucket's
    top-k (a superset of that bucket's global-top-k members).  Replaces a
    generic groupby(custkey) AGGREGATE that cost 11.8 of the query's
    12.5 s at sf0.1 — the sort-shuffle over |customers| keys was ~6x the
    join itself for a 20-row answer."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.int64()),
                }
            )
        ck = _gnp(g, "c_custkey").astype(np.int64)
        rev = _gnp(g, "rev").astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        tot = isum64(inv, rev)
        top = np.lexsort((u, -tot))[:k]
        return pa.table({"c_custkey": u[top], "revenue": tot[top]})

    return fn


def q_returned_top_customers(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k customers by revenue on returned lineitems, enriched with
    c_name and n_name: (rank, c_custkey, c_name, n_name, revenue)."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "val": pa.array(ck),
            }
        )

    def lrows(b: pa.Table) -> pa.Table:
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = np.floor(
            b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk, nb)),
                "side": pa.array(np.ones(len(lk), np.int64)),
                "key": pa.array(lk),
                "val": pa.array(price * (100 - disc)),
            }
        )

    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(
        lpath,
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc_.field("l_returnflag") == "R",
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    parts = (
        od.union(li)
        .groupby("bkt")
        .map_groups(_q10_group, batch_format="pyarrow")
        .map_batches(_q10_rekey(nb), batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt2")
        .map_groups(_q10_final_group(k), batch_format="pyarrow")
        .to_pandas()
    )
    top = (
        parts.sort_values(["revenue", "c_custkey"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    keys = top["c_custkey"].to_numpy().astype(np.int64)
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=pc_.field("c_custkey").isin(pa.array(keys)),
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(ck)
    pos = np.searchsorted(ck[o], keys)
    if len(keys) and not np.array_equal(ck[o][pos], keys):
        raise ValueError("top custkey missing from customer table")
    names = cust["c_name"].to_numpy(zero_copy_only=False)[o][pos]
    nkeys = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)[o][pos]
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    no = np.argsort(nk)
    npos = np.searchsorted(nk[no], nkeys)
    nnames = nat["n_name"].to_numpy(zero_copy_only=False)[no][npos]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "c_custkey": keys,
            "c_name": [str(s) for s in names],
            "n_name": [str(s) for s in nnames],
            "revenue": top["revenue"].astype("int64"),
        }
    )


def returned_top_customers_sql(k: int = 20) -> str:
    return f"""
WITH r AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS BIGINT)
           AS rank,
       c_custkey, c_name, n_name, revenue
FROM r JOIN customer USING (c_custkey)
       JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Cumulative window over an aggregate: monthly revenue running total per
# order priority — SUM(SUM(...)) OVER (PARTITION BY prio ORDER BY month).
# The scan folds (priority, month, cents) partials per batch; the shuffle
# key space is |priorities| x |months| (bounded by the calendar, not the
# corpus), so the final prefix sum runs on a result-sized frame.  This is
# the standard shape for any "cumulative metric over time" report at
# 100 TB: all heavy lifting is the pre-aggregation, the window itself is
# arithmetic on the tiny aggregate.
# ---------------------------------------------------------------------------

_MS_PER_DAY = 86_400_000


def _month_of_ms(ms: np.ndarray) -> np.ndarray:
    """epoch ms -> yyyymm int64, via numpy datetime month arithmetic
    (identical to the oracle's date_trunc month on non-negative epochs)."""
    m = (ms // _MS_PER_DAY).astype("datetime64[D]").astype("datetime64[M]")
    mi = m.astype(np.int64)  # months since 1970-01
    return (1970 + mi // 12) * 100 + (mi % 12 + 1)


def _cumrev_partial(b: pa.Table) -> pa.Table:
    prio = np.asarray(b["o_orderpriority"].to_pylist(), dtype=object)
    month = _month_of_ms(_ts_ms(b["o_orderdate"]))
    cents = _cents(b["o_totalprice"])
    up, pinv = np.unique(prio, return_inverse=True)
    um, minv = np.unique(month, return_inverse=True)
    code = pinv.astype(np.int64) * len(um) + minv
    uc, cinv = np.unique(code, return_inverse=True)
    return pa.table(
        {
            "o_orderpriority": pa.array(
                [str(s) for s in up[uc // len(um)]], pa.string()
            ),
            "month": pa.array(um[uc % len(um)]),
            "cents": pa.array(isum64(cinv, cents)),
        }
    )


def q_cumulative_revenue(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, month, revenue_cents, cum_revenue_cents): monthly
    order revenue and its running total within each priority."""
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
        )
        .map_batches(_cumrev_partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: pa.table(
                {
                    "k": pa.array(
                        [
                            f"{p}\x00{m}"
                            for p, m in zip(
                                t["o_orderpriority"].to_pylist(),
                                t["month"].to_pylist(),
                            )
                        ],
                        pa.string(),
                    ),
                    "o_orderpriority": t["o_orderpriority"],
                    "month": t["month"],
                    "cents": t["cents"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("k")
        .aggregate(Sum("cents", alias_name="revenue_cents"), Max("month"), )
        .to_pandas()
    )
    prio = agg["k"].str.split("\x00").str[0]
    out = pd.DataFrame(
        {
            "o_orderpriority": prio.astype(str),
            "month": agg["max(month)"].astype("int64"),
            "revenue_cents": agg["revenue_cents"].astype("int64"),
        }
    ).sort_values(["o_orderpriority", "month"], kind="stable")
    out["cum_revenue_cents"] = (
        out.groupby("o_orderpriority")["revenue_cents"].cumsum().astype("int64")
    )
    return out.reset_index(drop=True)


def cumulative_revenue_sql() -> str:
    return """
WITH m AS (
  SELECT o_orderpriority,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS month,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month, revenue_cents,
       CAST(SUM(revenue_cents) OVER (
                PARTITION BY o_orderpriority ORDER BY month) AS BIGINT)
           AS cum_revenue_cents
FROM m ORDER BY o_orderpriority, month
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: high-balance customers with no RECENT orders — a
# global scalar aggregate (average balance) plus an anti join, per
# market segment.  The average is exact integer arithmetic: keep
# (sum_cents, n) and compare cents*N > total_cents so neither engine
# ever divides.  The anti join is the co-partitioned union shuffle
# (customer side carries cents+segment, orders side distinct custkeys
# of orders AT/AFTER the cutoff — that recency predicate pushes into
# the orders parquet read); the scalar rides in as two ints — no second
# pass over customer.
# ---------------------------------------------------------------------------

_Q22_CUT_MS = 946_684_800_000  # 2000-01-01


def _q22_group(total_cents: int, n_cust: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pa.table(
            {
                "c_mktsegment": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            }
        )
        if not len(g):
            return empty
        side = _gnp(g, "side").astype(np.int64)
        key = _gnp(g, "key").astype(np.int64)
        is_c = side == 0
        ck = key[is_c]
        bal = _gnp(g, "val").astype(np.int64)[is_c]
        seg = _gnp(g, "seg")[is_c]
        ok = np.unique(key[~is_c])
        if len(ok):
            pos = np.searchsorted(ok, ck)
            has_order = (pos < len(ok)) & (
                ok[np.clip(pos, 0, len(ok) - 1)] == ck
            )
        else:
            # a bucket can carry customers and ZERO recent orders — every
            # customer here survives the anti join (found by the property
            # differential; the sf sweeps never produced such a bucket)
            has_order = np.zeros(len(ck), dtype=bool)
        keep = (~has_order) & (bal * n_cust > total_cents)
        if not keep.any():
            return empty
        u, inv = np.unique(seg[keep].astype(str), return_inverse=True)
        return pa.table(
            {
                "c_mktsegment": u,
                "n": np.bincount(inv).astype(np.int64),
                "cents": isum64(inv, bal[keep]),
            }
        )

    return fn


def q_idle_high_balance(sf_dir: str) -> pd.DataFrame:
    """(c_mktsegment, n_cust, sum_acctbal_cents): customers whose balance
    exceeds the global average and who placed no order at/after the
    _Q22_CUT_MS cutoff."""
    import pyarrow.compute as pc_

    cpath = os.path.join(sf_dir, "customer.parquet")
    nb = _lsh_n_buckets(_row_count(cpath))

    def _bal_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"])
        return pa.table(
            {
                "s": pa.array([int(cents.sum())], pa.int64()),
                "n": pa.array([len(cents)], pa.int64()),
            }
        )

    tot = (
        ray.data.read_parquet(cpath, columns=["c_acctbal"])
        .map_batches(_bal_partial, batch_format="pyarrow", zero_copy_batch=True)
        .sum(["s", "n"])
    )
    total_cents, n_cust = int(tot["sum(s)"]), int(tot["sum(n)"])

    def crows(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.zeros(len(ck), np.int64)),
                "key": pa.array(ck),
                "val": pa.array(_cents(b["c_acctbal"])),
                "seg": b["c_mktsegment"].combine_chunks(),
            }
        )

    def orows(b: pa.Table) -> pa.Table:
        ok = np.unique(
            b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.ones(len(ok), np.int64)),
                "key": pa.array(ok),
                "val": pa.array(np.zeros(len(ok), np.int64)),
                "seg": pa.array([""] * len(ok), pa.string()),
            }
        )

    cd = ray.data.read_parquet(
        cpath, columns=["c_custkey", "c_acctbal", "c_mktsegment"]
    ).map_batches(crows, batch_format="pyarrow", zero_copy_batch=True)
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pc_.field("o_orderdate")
        >= pa.scalar(_Q22_CUT_MS * 1000, pa.timestamp("us")),
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        cd.union(od)
        .groupby("bkt")
        .map_groups(_q22_group(total_cents, n_cust), batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n", alias_name="n_cust"), Sum("cents", alias_name="sum_acctbal_cents"))
        .to_pandas()
    )
    if not len(agg):  # zero-block gotcha: empty aggregates carry no columns
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype="object"),
                "n_cust": pd.Series([], dtype="int64"),
                "sum_acctbal_cents": pd.Series([], dtype="int64"),
            }
        )
    out = pd.DataFrame(
        {
            "c_mktsegment": agg["c_mktsegment"].astype(str),
            "n_cust": agg["n_cust"].astype("int64"),
            "sum_acctbal_cents": agg["sum_acctbal_cents"].astype("int64"),
        }
    )
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def idle_high_balance_sql() -> str:
    return f"""
WITH g AS (
  SELECT CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
         CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM customer
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_acctbal_cents
FROM customer, g
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * g.n_cust > g.total_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND epoch_us(o_orderdate) // 1000 >= {_Q22_CUT_MS})
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: revenue per nation where customer and supplier share
# the nation, restricted to one region and a date range.  Two
# co-partitioned shuffles chained on DIFFERENT keys — orderkey to attach
# custkey to each lineitem's revenue, then custkey to test the
# c_nationkey = s_nationkey correlation — with the two genuinely small
# dimensions (supplier here; nation/region always) broadcast.  The date
# predicate pushes into the orders read; the region predicate rides the
# broadcast nation set.  This is the canonical multi-join fact pipeline:
# each shuffle carries 4 narrow int64 columns, never a wide row.
# ---------------------------------------------------------------------------

_Q5_REGION = "EUROPE"
_Q5_LO_MS = 788_918_400_000  # 1995-01-01
_Q5_HI_MS = 915_148_800_000  # 1999-01-01


def _q5_stage1_group(g: pd.DataFrame) -> pd.DataFrame:
    """orderkey bucket: fact rows inherit the order's custkey; emit
    (custkey, s_nationkey, rev) partials packed as ck2 = custkey*64+snat."""
    empty = pa.table(
        {"ck2": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    a = _gnp(g, "a").astype(np.int64)
    b = _gnp(g, "b").astype(np.int64)
    ok = key[side == 0]
    cust = a[side == 0]
    order = np.argsort(ok, kind="stable")
    ok, cust = ok[order], cust[order]
    lk, rev, snat = key[side == 1], a[side == 1], b[side == 1]
    hit, pos = _probe_sorted(ok, lk)
    if not hit.any():
        return empty
    sn = snat[hit]
    if len(sn) and int(sn.max()) >= 64:
        # 6-bit packing guard (mirrors the Q16 composite guard): a nationkey
        # >= 64 would silently corrupt custkey and misattribute revenue
        raise ValueError(f"s_nationkey {int(sn.max())} >= 64 breaks ck2 packing")
    ck2 = cust[pos[hit]] * 64 + sn
    u, inv = np.unique(ck2, return_inverse=True)
    return pa.table(
        {"ck2": u, "rev": isum64(inv, rev[hit])}
    )


def _q5_stage2_group(g: pd.DataFrame) -> pd.DataFrame:
    """custkey bucket: keep fact rows whose supplier nation equals the
    customer's nation; emit (n_nationkey, rev) partials."""
    empty = pa.table(
        {
            "n_nationkey": pa.array([], pa.int64()),
            "rev": pa.array([], pa.int64()),
        }
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    a = _gnp(g, "a").astype(np.int64)
    b = _gnp(g, "b").astype(np.int64)
    ck = key[side == 0]
    cnat = a[side == 0]
    order = np.argsort(ck, kind="stable")
    ck, cnat = ck[order], cnat[order]
    fk, snat, rev = key[side == 1], a[side == 1], b[side == 1]
    hit, pos = _probe_sorted(ck, fk)
    hit &= np.where(hit, cnat[pos] == snat, False)
    if not hit.any():
        return empty
    u, inv = np.unique(snat[hit], return_inverse=True)
    return pa.table(
        {
            "n_nationkey": u,
            "rev": isum64(inv, rev[hit]),
        }
    )


def q_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """(n_name, revenue): lineitem revenue where the customer's and the
    supplier's nation coincide, nation in _Q5_REGION, orders within the
    [1995, 1999) window."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    sk_ref, sn_ref = ray.put(sk), ray.put(sn)

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    rk = reg["r_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rname = reg["r_name"].to_numpy(zero_copy_only=False)
    region_keys = set(rk[np.asarray([str(s) == _Q5_REGION for s in rname])].tolist())
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nrk = nat["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nname = nat["n_name"].to_numpy(zero_copy_only=False)
    in_region = np.asarray([int(k) in region_keys for k in nrk.tolist()])
    region_nations = np.sort(nk[in_region])
    rn_ref = ray.put(region_nations)

    lo = pa.scalar(_Q5_LO_MS * 1000, pa.timestamp("us"))
    hi = pa.scalar(_Q5_HI_MS * 1000, pa.timestamp("us"))

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "a": pa.array(ck),
                "b": pa.array(np.zeros(len(ok), np.int64)),
            }
        )

    def lrows(b: pa.Table) -> pa.Table:
        ks, ns, rns = ray.get(sk_ref), ray.get(sn_ref), ray.get(rn_ref)
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        spk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = np.floor(
            b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        pos = np.searchsorted(ks, spk)
        if len(pos) and not np.array_equal(ks[np.clip(pos, 0, len(ks) - 1)], spk):
            raise ValueError("l_suppkey outside supplier table")
        snat = ns[pos]
        # region predicate applied at the source: only in-region suppliers
        # can satisfy c_nation = s_nation AND nation-in-region downstream
        rpos = np.searchsorted(rns, snat)
        keep = (rpos < len(rns)) & (rns[np.clip(rpos, 0, max(len(rns) - 1, 0))] == snat)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk[keep], nb)),
                "side": pa.array(np.ones(int(keep.sum()), np.int64)),
                "key": pa.array(lk[keep]),
                "a": pa.array((price * (100 - disc))[keep]),
                "b": pa.array(snat[keep]),
            }
        )

    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pc_.field("o_orderdate") >= lo) & (pc_.field("o_orderdate") < hi),
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(
        lpath, columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    stage1 = (
        od.union(li)
        .groupby("bkt")
        .map_groups(_q5_stage1_group, batch_format="pyarrow")
    )

    def frows(b: pa.Table) -> pa.Table:
        ck2 = b["ck2"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        rev = b["rev"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ck2 // 64
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.ones(len(ck), np.int64)),
                "key": pa.array(ck),
                "a": pa.array(ck2 % 64),
                "b": pa.array(rev),
            }
        )

    def crows(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b["c_nationkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.zeros(len(ck), np.int64)),
                "key": pa.array(ck),
                "a": pa.array(cn),
                "b": pa.array(np.zeros(len(ck), np.int64)),
            }
        )

    cd = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(crows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        cd.union(stage1.map_batches(frows, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("bkt")
        .map_groups(_q5_stage2_group, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    keys = agg["n_nationkey"].to_numpy().astype(np.int64)
    no = np.argsort(nk)
    pos = np.searchsorted(nk[no], keys)
    names = nname[no][pos]
    out = pd.DataFrame(
        {
            "n_name": [str(s) for s in names],
            "revenue": agg["revenue"].astype("int64"),
        }
    )
    return out.sort_values(
        ["revenue", "n_name"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)


def local_supplier_volume_sql() -> str:
    return f"""
SELECT n_name,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{_Q5_REGION}'
  AND epoch_us(o_orderdate) // 1000 >= {_Q5_LO_MS}
  AND epoch_us(o_orderdate) // 1000 < {_Q5_HI_MS}
GROUP BY n_name ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier variety per part attribute — COUNT(DISTINCT
# l_suppkey) per (p_brand, p_type, p_size).  The part dimension is
# broadcast as a partkey -> combo-index array (one int per part, not the
# attribute strings); distinctness is a composite-key groupby (combo *
# 2^20 + suppkey — key space bounded by |combos| x |suppliers|, NOT by
# lineitem rows), and the count folds per combo.  Attribute strings are
# attached only to the final combo-sized frame.
# ---------------------------------------------------------------------------


def q_supplier_variety(sf_dir: str) -> pd.DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt) with supplier_cnt =
    COUNT(DISTINCT l_suppkey) over lineitems of parts in the combo."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brand = part["p_brand"].to_numpy(zero_copy_only=False).astype(str)
    ptype = part["p_type"].to_numpy(zero_copy_only=False).astype(str)
    psize = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    # NUL can't ride numpy's U dtype (it pads with NUL); use the unit
    # separator, and build the strings in Python — this is the
    # dimension-sized side, never the fact table
    combo_key = np.asarray(
        [f"{b}\x1f{t}\x1f{s}" for b, t, s in zip(brand, ptype, psize)],
        dtype=object,
    )
    ucombo, cinv = np.unique(combo_key, return_inverse=True)
    po = np.argsort(pk)
    pk_s, cinv_s = pk[po], cinv[po].astype(np.int64)
    pk_ref, cv_ref = ray.put(pk_s), ray.put(cinv_s)

    def krows(b: pa.Table) -> pa.Table:
        ks, cv = ray.get(pk_ref), ray.get(cv_ref)
        lpk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        spk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if len(spk) and int(spk.max()) >= (1 << 20):
            raise ValueError("l_suppkey >= 2^20; widen the composite packing")
        pos = np.searchsorted(ks, lpk)
        if len(pos) and not np.array_equal(ks[np.clip(pos, 0, len(ks) - 1)], lpk):
            raise ValueError("l_partkey outside part table")
        k = cv[pos] * (1 << 20) + spk
        return pa.table({"k": pa.array(np.unique(k))})

    def combo_partial(b: pa.Table) -> pa.Table:
        k = b["k"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(k >> 20, return_counts=True)
        return pa.table(
            {"combo": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey"],
        )
        .map_batches(krows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .count()
        .map_batches(combo_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("combo")
        .aggregate(Sum("n", alias_name="supplier_cnt"))
        .to_pandas()
    )
    ci = agg["combo"].to_numpy().astype(np.int64)
    split = [str(s).split("\x1f") for s in ucombo[ci]]
    out = pd.DataFrame(
        {
            "p_brand": [s[0] for s in split],
            "p_type": [s[1] for s in split],
            "p_size": np.asarray([int(s[2]) for s in split], dtype=np.int64),
            "supplier_cnt": agg["supplier_cnt"].astype("int64"),
        }
    )
    return out.sort_values(["p_brand", "p_type", "p_size"]).reset_index(drop=True)


def supplier_variety_sql() -> str:
    return """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type, p_size
ORDER BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Universal quantifier over a join group (the ALL- counterpart of Q4's
# EXISTS): orders whose lineitems ALL ship inside one calendar month,
# counted per priority.  Same single co-partitioned union shuffle; each
# orderkey bucket tests min(month) == max(month) over the order's
# lineitems — a per-key ALL predicate folded with two searchsorted-
# segmented reductions, no COUNT(DISTINCT) materialization.
# ---------------------------------------------------------------------------


def _all_month_group(g: pd.DataFrame) -> pd.DataFrame:
    empty = pa.table(
        {
            "o_orderpriority": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    is_o = side == 0
    ok = key[is_o]
    prio = _gnp(g, "prio")[is_o]
    order = np.argsort(ok, kind="stable")
    ok, prio = ok[order], prio[order]
    lk = key[~is_o]
    month = _gnp(g, "month").astype(np.int64)[~is_o]
    if not len(lk):
        return empty
    lo = np.argsort(lk, kind="stable")
    lk, month = lk[lo], month[lo]
    pos = np.searchsorted(ok, lk)
    if (pos >= len(ok)).any() or not (ok[pos] == lk).all():
        raise ValueError("lineitem orderkey missing from orders side")
    # segment boundaries of each order's lineitem block
    starts = np.searchsorted(lk, ok, side="left")
    ends = np.searchsorted(lk, ok, side="right")
    has = ends > starts
    if not has.any():
        return empty
    mmin = np.minimum.reduceat(month, starts[has])
    mmax = np.maximum.reduceat(month, starts[has])
    same = mmin == mmax
    if not same.any():
        return empty
    u, cnt = np.unique(prio[has][same].astype(str), return_counts=True)
    return pa.table({"o_orderpriority": u, "n": cnt.astype(np.int64)})


def q_single_month_orders(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, n_orders): orders all of whose lineitems ship in
    the same calendar month."""
    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "month": pa.array(np.zeros(len(ok), np.int64)),
                "prio": b["o_orderpriority"].combine_chunks(),
            }
        )

    def lrows(b: pa.Table) -> pa.Table:
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        month = _month_of_ms(_ts_ms(b["l_shipdate"]))
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk, nb)),
                "side": pa.array(np.ones(len(lk), np.int64)),
                "key": pa.array(lk),
                "month": pa.array(month),
                "prio": pa.array([""] * len(lk), pa.string()),
            }
        )

    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    li = ray.data.read_parquet(
        lpath, columns=["l_orderkey", "l_shipdate"]
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        od.union(li)
        .groupby("bkt")
        .map_groups(_all_month_group, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"].astype(str),
            "n_orders": agg["n_orders"].astype("int64"),
        }
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def single_month_orders_sql() -> str:
    return """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT year(l_shipdate) * 100 + month(l_shipdate)) = 1
)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Within-window duplicate suppression census (the dedup-by-recency rule
# every event ingest applies): an event is suppressed when the SAME
# (user_id, event_type) key fired within the preceding window.  LAG
# semantics — the reference point is the previous event, suppressed or
# not, so the rule is one window function on both engines (a
# previous-KEPT rule would be a sequential scan; this is the
# distributable variant).  Same single user-bucketed shuffle as
# sessionization; suppression is a segmented diff after one lexsort.
# ---------------------------------------------------------------------------

_SUPPRESS_MS = 3_600_000


def _suppress_group(g: pd.DataFrame) -> pd.DataFrame:
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "n_suppressed": pa.array([], pa.int64()),
        }
    )
    if not len(g):
        return empty
    uid = _gnp(g, "uid").astype(np.int64)
    tms = _gnp(g, "tms").astype(np.int64)
    eid = _gnp(g, "eid").astype(np.int64)
    et = _gnp(g, "event_type")
    uet, einv = np.unique(et.astype(str), return_inverse=True)
    o = np.lexsort((eid, tms, einv, uid))
    uid, tms, einv = uid[o], tms[o], einv[o]
    same = np.zeros(len(uid), dtype=bool)
    if len(uid) > 1:
        same[1:] = (uid[1:] == uid[:-1]) & (einv[1:] == einv[:-1])
    gap = np.empty(len(uid), dtype=np.int64)
    gap[0] = np.iinfo(np.int64).max
    if len(uid) > 1:
        gap[1:] = tms[1:] - tms[:-1]
    sup = same & (gap < _SUPPRESS_MS)
    n_events = np.bincount(einv, minlength=len(uet)).astype(np.int64)
    n_sup = isum64(einv, sup, len(uet))
    return pa.table(
        {
            "event_type": uet,
            "n_events": n_events,
            "n_suppressed": n_sup,
        }
    )


def q_events_dedup_lag(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_events, n_suppressed): events whose same-key
    predecessor fired within the last _SUPPRESS_MS."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "tms": pa.array(_ts_ms(b["ts"])),
                "eid": pa.array(
                    b["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "event_type": b["event_type"].combine_chunks(),
            }
        )

    agg = (
        ray.data.read_parquet(path, columns=["user_id", "ts", "event_id", "event_type"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_suppress_group, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_suppressed", alias_name="n_suppressed"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_events": agg["n_events"].astype("int64"),
            "n_suppressed": agg["n_suppressed"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def events_dedup_lag_sql() -> str:
    return f"""
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // 1000
           - lag(epoch_us(ts) // 1000) OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts) // 1000, event_id) AS gap
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE gap IS NOT NULL
                             AND gap < {_SUPPRESS_MS}) AS BIGINT)
           AS n_suppressed
FROM d GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Regression/correlation sufficient statistics, exact-integer: per
# returnflag, the (n, Sx, Sxx, Sy_cents, Sxy_cents) moments of
# (quantity, extendedprice).  All sums stay inside int64 by
# construction (qty <= ~1e2, price_cents <= ~1e7 => Sxy <= 1e9/row);
# the second moment of PRICE is deliberately not emitted — its per-row
# term alone (~1e14) would overflow long before 10^12 rows.  Slope /
# correlation are one driver-side division on the tiny result, so no
# float ever crosses the compare boundary.
# ---------------------------------------------------------------------------


def _suffstats_partial(b: pa.Table) -> pa.Table:
    rf = np.asarray(b["l_returnflag"].to_pylist(), dtype=object)
    qty = np.floor(
        b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    price = _cents(b["l_extendedprice"])
    u, inv = np.unique(rf, return_inverse=True)
    return pa.table(
        {
            "l_returnflag": pa.array([str(s) for s in u], pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_qty": pa.array(isum64(inv, qty)),
            "sum_qty_sq": pa.array(
                isum64(inv, qty * qty)
            ),
            "sum_price_cents": pa.array(
                isum64(inv, price)
            ),
            "sum_qty_price_cents": pa.array(
                isum64(inv, qty * price)
            ),
        }
    )


def q_qty_price_suffstats(sf_dir: str) -> pd.DataFrame:
    """(l_returnflag, n, sum_qty, sum_qty_sq, sum_price_cents,
    sum_qty_price_cents): exact moments for downstream slope/corr."""
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        .map_batches(_suffstats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_qty_sq", alias_name="sum_qty_sq"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("sum_qty_price_cents", alias_name="sum_qty_price_cents"),
        )
        .to_pandas()
    )
    cols = [
        "n",
        "sum_qty",
        "sum_qty_sq",
        "sum_price_cents",
        "sum_qty_price_cents",
    ]
    out = pd.DataFrame({"l_returnflag": agg["l_returnflag"].astype(str)})
    for c in cols:
        out[c] = agg[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def qty_price_suffstats_sql() -> str:
    return """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_sq,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_cents,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)
                * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_price_cents
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction: pull the integer field out of the events
# ``props`` JSON string with ONE vectorized RE2 kernel
# (pyarrow.compute.extract_regex — no Python, no per-row json.loads)
# and aggregate it per event type.  Malformed rows fail loudly rather
# than silently zeroing (a null extraction raises).  The oracle
# re-extracts with DuckDB's regexp_extract, so both engines parse the
# same digits with the same regex semantics.
# ---------------------------------------------------------------------------

# Arrow's extract_regex requires a NAMED group; DuckDB's regexp_extract
# takes the group by index — same RE2 pattern semantics either way
_PROPS_RE_ARROW = r'"k":\s*(?P<k>-?\d+)'
_PROPS_RE_SQL = r'"k":\s*(-?\d+)'


def _props_partial(b: pa.Table) -> pa.Table:
    import pyarrow.compute as pc_

    et = np.asarray(b["event_type"].to_pylist(), dtype=object)
    ext = pc_.extract_regex(b["props"].combine_chunks(), _PROPS_RE_ARROW)
    if ext.null_count:
        raise ValueError("props row without an integer 'k' field")
    k = pc_.cast(pc_.struct_field(ext, "k"), pa.int64()).to_numpy(zero_copy_only=False)
    u, inv = np.unique(et, return_inverse=True)
    mink = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
    maxk = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
    np.minimum.at(mink, inv, k)
    np.maximum.at(maxk, inv, k)
    return pa.table(
        {
            "event_type": pa.array([str(s) for s in u], pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_k": pa.array(isum64(inv, k)),
            "min_k": pa.array(mink),
            "max_k": pa.array(maxk),
        }
    )


def q_props_field_stats(sf_dir: str) -> pd.DataFrame:
    """(event_type, n, sum_k, min_k, max_k) over the props JSON field."""
    from ray.data.aggregate import Min

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
        )
        .map_batches(_props_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n": agg["n"].astype("int64"),
            "sum_k": agg["sum_k"].astype("int64"),
            "min_k": agg["min_k"].astype("int64"),
            "max_k": agg["max_k"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def props_field_stats_sql() -> str:
    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(regexp_extract(props, '{_PROPS_RE_SQL}', 1) AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(MIN(CAST(regexp_extract(props, '{_PROPS_RE_SQL}', 1) AS BIGINT))
            AS BIGINT) AS min_k,
       CAST(MAX(CAST(regexp_extract(props, '{_PROPS_RE_SQL}', 1) AS BIGINT))
            AS BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Three-step funnel (sequential pattern): users whose events contain a
# view -> click -> purchase CHAIN with each step strictly later than the
# previous and within the trailing window.  Two chained window probes
# over (uid << 42 | ts) packed sorted keys: clicks qualify against views,
# purchases against QUALIFYING clicks — intermediate pair sets are never
# materialized, and each user lives in exactly one hash bucket so
# bucket-local distinct-user counts sum globally.
# ---------------------------------------------------------------------------


def _pack_uid_ts(uid: np.ndarray, tms: np.ndarray) -> np.ndarray:
    return (uid << _FUNNEL_SHIFT) | tms


def _funnel3_group(window_ms: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pa.table(
            {
                "n_users_view": pa.array([], pa.int64()),
                "n_users_view_click": pa.array([], pa.int64()),
                "n_users_full_chain": pa.array([], pa.int64()),
            }
        )
        if not len(g):
            return empty
        uid = _gnp(g, "uid").astype(np.int64)
        tms = _gnp(g, "tms").astype(np.int64)
        typ = _gnp(g, "typ").astype(np.int64)
        vm, cm, pm = typ == 0, typ == 1, typ == 2

        def probe(anchor_uid, anchor_t, prior_packed_sorted):
            """anchors with >= 1 prior event in [t - window, t - 1]."""
            if not len(prior_packed_sorted) or not len(anchor_uid):
                return np.zeros(len(anchor_uid), dtype=bool)
            lo = _pack_uid_ts(anchor_uid, anchor_t - window_ms)
            hi = _pack_uid_ts(anchor_uid, anchor_t - 1)
            a = np.searchsorted(prior_packed_sorted, lo, side="left")
            b = np.searchsorted(prior_packed_sorted, hi, side="right")
            return b > a

        views = np.sort(_pack_uid_ts(uid[vm], tms[vm]))
        c_ok = probe(uid[cm], tms[cm], views)
        qclicks = np.sort(_pack_uid_ts(uid[cm][c_ok], tms[cm][c_ok]))
        p_ok = probe(uid[pm], tms[pm], qclicks)
        return pa.table(
            {
                "n_users_view": [int(len(np.unique(uid[vm])))],
                "n_users_view_click": [int(len(np.unique(uid[cm][c_ok])))],
                "n_users_full_chain": [int(len(np.unique(uid[pm][p_ok])))],
            }
        )

    return fn


def q_funnel_three_step(sf_dir: str, window_ms: int = 86_400_000) -> pd.DataFrame:
    """One row: (n_users_view, n_users_view_click, n_users_full_chain)."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))
    codes = {"view": 0, "click": 1, "purchase": 2}

    def rows(b: pa.Table) -> pa.Table:
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        keep = (et == "view") | (et == "click") | (et == "purchase")
        uid = (
            b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep]
        )
        tms = _ts_ms(b["ts"])[keep]
        if len(tms) and (
            tms.min() < window_ms or tms.max() >= 1 << _FUNNEL_SHIFT
        ):
            raise ValueError("event timestamp outside the packable ms range")
        typ = np.asarray([codes[t] for t in et[keep]], dtype=np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uid, nb)),
                "uid": pa.array(uid),
                "tms": pa.array(tms),
                "typ": pa.array(typ),
            }
        )

    parts = (
        ray.data.read_parquet(path, columns=["user_id", "ts", "event_type"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_funnel3_group(window_ms), batch_format="pyarrow")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "n_users_view": [0],
                "n_users_view_click": [0],
                "n_users_full_chain": [0],
            }
        ).astype("int64")
    return pd.DataFrame(
        {
            "n_users_view": [int(parts["n_users_view"].sum())],
            "n_users_view_click": [int(parts["n_users_view_click"].sum())],
            "n_users_full_chain": [int(parts["n_users_full_chain"].sum())],
        }
    ).astype("int64")


def funnel_three_step_sql(window_ms: int = 86_400_000) -> str:
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) // 1000 AS t FROM events),
v AS (SELECT user_id, t FROM e WHERE event_type = 'view'),
c AS (SELECT user_id, t FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, t FROM e WHERE event_type = 'purchase'),
qc AS (
  SELECT DISTINCT c.user_id, c.t FROM c JOIN v ON v.user_id = c.user_id
   AND v.t >= c.t - {window_ms} AND v.t < c.t
),
qp AS (
  SELECT DISTINCT p.user_id FROM p JOIN qc ON qc.user_id = p.user_id
   AND qc.t >= p.t - {window_ms} AND qc.t < p.t
)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM v) AS n_users_view,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM qc)
           AS n_users_view_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM qp) AS n_users_full_chain
"""


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users per day (the WAU curve) — EXACT, with no
# per-window recount and no distinct-over-window shuffle: a user's event
# days contribute the union of [day, day+6] intervals to the window
# calendar, so each user-bucket group merges its users' intervals (one
# lexsort + run flags) and emits sparse (day, +1/-1) DIFF rows; the final
# day-domain groupby is calendar-sized, and one driver-side cumsum over
# the sorted sparse diffs yields the exact rolling distinct count at
# every observed day.  A 10^12-event stream shuffles only distinct
# (user, day) rows and calendar-sized diffs.
# ---------------------------------------------------------------------------

_WAU_WINDOW_DAYS = 7


def _wau_group(g: pd.DataFrame) -> pd.DataFrame:
    empty = pa.table(
        {
            "day": pa.array([], pa.int64()),
            "delta": pa.array([], pa.int64()),
            "obs": pa.array([], pa.int64()),
        }
    )
    if not len(g):
        return empty
    uid = _gnp(g, "uid").astype(np.int64)
    day = _gnp(g, "day").astype(np.int64)
    order = np.lexsort((day, uid))
    uid, day = uid[order], day[order]
    keep = np.ones(len(uid), dtype=bool)
    keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
    uid, day = uid[keep], day[keep]
    W = _WAU_WINDOW_DAYS
    is_start = np.ones(len(uid), dtype=bool)
    is_start[1:] = (uid[1:] != uid[:-1]) | (day[1:] > day[:-1] + (W - 1))
    starts = np.flatnonzero(is_start)
    ends = np.append(starts[1:], len(uid)) - 1  # last index of each run
    plus_day = day[starts]
    minus_day = day[ends] + W  # exclusive end of [start, last + W - 1]
    obs_days = np.unique(day)
    days = np.concatenate([plus_day, minus_day, obs_days])
    deltas = np.concatenate(
        [
            np.ones(len(plus_day), np.int64),
            -np.ones(len(minus_day), np.int64),
            np.zeros(len(obs_days), np.int64),
        ]
    )
    obs = np.concatenate(
        [
            np.zeros(len(plus_day) + len(minus_day), np.int64),
            np.ones(len(obs_days), np.int64),
        ]
    )
    ud, inv = np.unique(days, return_inverse=True)
    return pa.table(
        {
            "day": ud,
            "delta": isum64(inv, deltas),
            "obs": isum64(inv, obs).clip(max=1),
        }
    )


def q_rolling_active_users(sf_dir: str) -> pd.DataFrame:
    """(day, wau): exact distinct users active within the trailing 7-day
    window ending at each observed day (day = epoch days)."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))

    def rows(b: pa.Table) -> pa.Table:
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        day = _ts_ms(b["ts"]) // _MS_PER_DAY
        k = uid * 1_000_000 + day  # day < 1e6 through year ~4707
        if len(day) and (day.min() < 0 or day.max() >= 1_000_000):
            raise ValueError("event day outside the packable range")
        ku = np.unique(k)
        u, d = ku // 1_000_000, ku % 1_000_000
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(u, nb)),
                "uid": pa.array(u),
                "day": pa.array(d),
            }
        )

    diffs = (
        ray.data.read_parquet(path, columns=["user_id", "ts"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_wau_group, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("delta", alias_name="delta"), Max("obs", alias_name="obs"))
        .to_pandas()
    )
    if not len(diffs):
        return pd.DataFrame(
            {"day": pd.Series([], dtype="int64"), "wau": pd.Series([], dtype="int64")}
        )
    diffs = diffs.sort_values("day").reset_index(drop=True)
    wau = diffs["delta"].astype("int64").cumsum()
    out = pd.DataFrame(
        {"day": diffs["day"].astype("int64"), "wau": wau.astype("int64")}
    )
    return out[diffs["obs"].astype(int) == 1].reset_index(drop=True)


def rolling_active_users_sql() -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT epoch_us(ts) // 1000 // {_MS_PER_DAY} AS day, user_id
  FROM events
),
d AS (SELECT DISTINCT day FROM e)
SELECT d.day AS day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
FROM d JOIN e ON e.day BETWEEN d.day - {_WAU_WINDOW_DAYS - 1} AND d.day
GROUP BY d.day ORDER BY d.day
"""


# ---------------------------------------------------------------------------
# Event-type affinity (market-basket support): for every unordered pair
# of event types, how many users performed BOTH.  The vocab_overlap mask
# census re-applied to a different domain: distinct (user, type) pairs
# fold to per-user type bitmasks inside user-hash buckets (sum of
# distinct bits IS bitwise OR), each bucket collapses to a <= 2^T mask
# census, and every pairwise support is a popcount over that census —
# users are never enumerated per pair.
# ---------------------------------------------------------------------------


def _affinity_group(g: pd.DataFrame) -> pd.DataFrame:
    if not len(g):
        return pa.table(
            {"mask": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
    uid = _gnp(g, "uid").astype(np.int64)
    m = _gnp(g, "m").astype(np.int64)
    order = np.argsort(uid, kind="stable")
    uid, m = uid[order], m[order]
    _, starts = np.unique(uid, return_index=True)
    masks = np.bitwise_or.reduceat(m, starts)
    u, cnt = np.unique(masks, return_counts=True)
    return pa.table({"mask": u, "n": cnt.astype(np.int64)})


def q_event_type_affinity(sf_dir: str) -> pd.DataFrame:
    """(type_a, type_b, n_users) for type_a < type_b, counting users who
    performed both; zero-support pairs omitted (matching the SQL join)."""
    path = os.path.join(sf_dir, "events.parquet")
    nb = _lsh_n_buckets(_row_count(path))
    types = list(EVENT_TYPES)
    tid = {t: i for i, t in enumerate(types)}

    def rows(b: pa.Table) -> pa.Table:
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        codes = np.asarray([tid.get(t, -1) for t in et], dtype=np.int64)
        if (codes < 0).any():
            raise ValueError("unknown event type in affinity scan")
        k = np.unique(uid * len(types) + codes)
        u = k // len(types)
        m = (np.int64(1) << (k % len(types))).astype(np.int64)
        # per-batch per-user partial masks (distinct bits per (uid, type))
        _, starts = np.unique(u, return_index=True)
        um = np.bitwise_or.reduceat(m, starts)
        uu = u[starts]
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(uu, nb)),
                "uid": pa.array(uu),
                "m": pa.array(um),
            }
        )

    census = (
        ray.data.read_parquet(path, columns=["user_id", "event_type"])
        .map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_affinity_group, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    masks = census["mask"].to_numpy().astype(np.int64)
    ns = census["n"].to_numpy().astype(np.int64)
    out = []
    for a in range(len(types)):
        for b_ in range(a + 1, len(types)):
            both = ((masks >> a) & 1).astype(bool) & ((masks >> b_) & 1).astype(bool)
            n = int(ns[both].sum())
            if n > 0:
                pair = sorted((types[a], types[b_]))
                out.append((pair[0], pair[1], n))
    df = pd.DataFrame(out, columns=["type_a", "type_b", "n_users"]).astype(
        {"n_users": "int64"}
    )
    return df.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def event_type_affinity_sql() -> str:
    return """
WITH v AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM v a JOIN v b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast-revenue-change — one filtered scan, no join.
# The date predicate pushes into the parquet read (row-group pruning at
# 100 TB); quantity/discount predicates and the revenue product fold
# per batch into ONE partial row, so the "shuffle" is a handful of
# single-row partials. Reference parity note: this is the all-filter
# aggregate every engine treats as its scan-speed floor.
# ---------------------------------------------------------------------------

_Q6_LO_MS = 820_454_400_000  # 1996-01-01
_Q6_HI_MS = 852_076_800_000  # 1997-01-01


def q_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """(n_rows, revenue): lineitem rows shipped in 1996 with discount in
    [0.05, 0.07] and quantity < 24; revenue = extendedprice * discount in
    exact cents*hundredths."""
    import pyarrow.compute as pc_

    lo = pa.scalar(_Q6_LO_MS * 1000, pa.timestamp("us"))
    hi = pa.scalar(_Q6_HI_MS * 1000, pa.timestamp("us"))

    def part(b: pa.Table) -> pa.Table:
        qty = _cents(b["l_quantity"])
        price = _cents(b["l_extendedprice"])
        disc = _hund(b["l_discount"])
        keep = (disc >= 5) & (disc <= 7) & (qty < 2400)
        rev = price[keep] * disc[keep]
        return pa.table(
            {
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
                "revenue": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_quantity", "l_extendedprice", "l_discount"],
            filter=(pc_.field("l_shipdate") >= lo) & (pc_.field("l_shipdate") < hi),
        )
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("revenue", alias_name="revenue"))
    )
    return pd.DataFrame(
        {
            "n_rows": [int(agg["n_rows"] or 0)],
            "revenue": [int(agg["revenue"] or 0)],
        }
    )


def forecast_revenue_sql() -> str:
    pc = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dh = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    qc = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM({pc} * {dh}), 0) AS BIGINT) AS revenue
FROM lineitem
WHERE epoch_us(l_shipdate) // 1000 >= {_Q6_LO_MS}
  AND epoch_us(l_shipdate) // 1000 <  {_Q6_HI_MS}
  AND {dh} BETWEEN 5 AND 7
  AND {qc} < 2400
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promotion-revenue share — fact scan x broadcast part
# attribute. The 2k-row part dimension collapses to a sorted partkey
# array + one promo bitmask, ray.put once and probed per batch with a
# searchsorted; both the numerator and the denominator fold to one
# partial row per batch. Division never happens inside the engine —
# both sides emit the exact integer numerator/denominator pair.
# ---------------------------------------------------------------------------

_Q14_LO_MS = 841_536_000_000  # 1996-09-01
_Q14_HI_MS = 844_128_000_000  # 1996-10-01


def q_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """(promo_revenue, total_revenue) over lineitem shipped in 1996-09,
    promo = parts with p_type = 'PROMO'. Exact cents*hundredths."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    prt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pk = prt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ptype = prt["p_type"].to_numpy(zero_copy_only=False)
    po = np.argsort(pk)
    pk = pk[po]
    promo = np.asarray([str(s) == "PROMO" for s in ptype])[po]
    pk_ref, promo_ref = ray.put(pk), ray.put(promo)

    lo = pa.scalar(_Q14_LO_MS * 1000, pa.timestamp("us"))
    hi = pa.scalar(_Q14_HI_MS * 1000, pa.timestamp("us"))

    def part(b: pa.Table) -> pa.Table:
        ks, pm = ray.get(pk_ref), ray.get(promo_ref)
        lpk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = _hund(b["l_discount"])
        hit, pos = _probe_sorted(ks, lpk)
        if not hit.all():
            raise ValueError("l_partkey outside part table")
        rev = price * (100 - disc)
        is_promo = pm[pos]
        return pa.table(
            {
                "promo_revenue": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total_revenue": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice", "l_discount"],
            filter=(pc_.field("l_shipdate") >= lo) & (pc_.field("l_shipdate") < hi),
        )
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(
            Sum("promo_revenue", alias_name="promo_revenue"),
            Sum("total_revenue", alias_name="total_revenue"),
        )
    )
    return pd.DataFrame(
        {
            "promo_revenue": [int(agg["promo_revenue"] or 0)],
            "total_revenue": [int(agg["total_revenue"] or 0)],
        }
    )


def promo_revenue_sql() -> str:
    pc = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dh = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    return f"""
SELECT CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN {pc} * (100 - {dh}) ELSE 0 END), 0) AS BIGINT)
           AS promo_revenue,
       CAST(COALESCE(SUM({pc} * (100 - {dh})), 0) AS BIGINT) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE epoch_us(l_shipdate) // 1000 >= {_Q14_LO_MS}
  AND epoch_us(l_shipdate) // 1000 <  {_Q14_HI_MS}
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier by windowed revenue. Per-batch partials
# group by l_suppkey (the domain is the SUPPLIER count, not lineitem
# rows), one tiny groupby sums them, and the argmax + name attachment
# happen on the supplier-sized result frame — the "subquery MAX" never
# touches the fact table twice.
# ---------------------------------------------------------------------------

_Q15_LO_MS = 820_454_400_000  # 1996-01-01
_Q15_HI_MS = 828_316_800_000  # 1996-04-01


def q_top_supplier(sf_dir: str) -> pd.DataFrame:
    """(s_suppkey, s_name, total_rev) for the supplier(s) with maximal
    lineitem revenue shipped in [1996-01, 1996-04); ties all returned."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    lo = pa.scalar(_Q15_LO_MS * 1000, pa.timestamp("us"))
    hi = pa.scalar(_Q15_HI_MS * 1000, pa.timestamp("us"))

    def part(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = _hund(b["l_discount"])
        rev = price * (100 - disc)
        u, inv = np.unique(sk, return_inverse=True)
        return pa.table(
            {"s_suppkey": pa.array(u), "rev": pa.array(isum64(inv, rev))}
        )

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
            filter=(pc_.field("l_shipdate") >= lo) & (pc_.field("l_shipdate") < hi),
        )
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("s_suppkey")
        .aggregate(Sum("rev", alias_name="total_rev"))
        .to_pandas()
    )
    if not len(agg):
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "s_name": pd.Series([], dtype=object),
                "total_rev": pd.Series([], dtype="int64"),
            }
        )
    best = int(agg["total_rev"].max())
    win = agg[agg["total_rev"] == best]
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sname = sup["s_name"].to_numpy(zero_copy_only=False)
    so = np.argsort(sk)
    keys = win["s_suppkey"].to_numpy().astype(np.int64)
    hit, pos = _probe_sorted(sk[so], keys)
    if not hit.all():
        raise ValueError("winning l_suppkey outside supplier table")
    out = pd.DataFrame(
        {
            "s_suppkey": keys,
            "s_name": [str(s) for s in sname[so][pos]],
            "total_rev": win["total_rev"].to_numpy().astype(np.int64),
        }
    )
    return out.sort_values("s_suppkey").reset_index(drop=True)


def top_supplier_sql() -> str:
    pc = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dh = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    return f"""
WITH revenue AS (
    SELECT l_suppkey AS rk, CAST(SUM({pc} * (100 - {dh})) AS BIGINT) AS total_rev
    FROM lineitem
    WHERE epoch_us(l_shipdate) // 1000 >= {_Q15_LO_MS}
      AND epoch_us(l_shipdate) // 1000 <  {_Q15_HI_MS}
    GROUP BY l_suppkey)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_rev
FROM supplier JOIN revenue ON s_suppkey = rk
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive brand/quantity/size predicates. The three
# OR branches compile driver-side into one per-part branch BITMASK over
# the broadcast part dimension (brand and size never ship with the fact
# rows); each fact batch probes the mask and tests only its own quantity
# bounds — the disjunction costs three vectorized AND/OR passes, zero
# joins, zero shuffles.
# ---------------------------------------------------------------------------

# (brand, qty_lo, qty_hi, size_lo, size_hi) per branch, quantities in units
_Q19_BRANCHES = (
    ("Brand#1", 1, 11, 1, 5),
    ("Brand#11", 10, 20, 1, 10),
    ("Brand#16", 20, 30, 1, 15),
)


def q_brand_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """(n_rows, revenue): lineitem x part disjunction — any branch whose
    (p_brand, p_size in range, l_quantity in range) all hold keeps the row;
    revenue = extendedprice * (1 - discount) in exact cents*hundredths."""
    import pyarrow.parquet as pq

    prt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    pk = prt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brand = np.asarray([str(s) for s in prt["p_brand"].to_numpy(zero_copy_only=False)])
    size = prt["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    po = np.argsort(pk)
    pk, brand, size = pk[po], brand[po], size[po]
    pmask = np.zeros(len(pk), np.int64)
    for i, (b, _, _, slo, shi) in enumerate(_Q19_BRANCHES):
        pmask |= ((brand == b) & (size >= slo) & (size <= shi)).astype(np.int64) << i
    pk_ref, pmask_ref = ray.put(pk), ray.put(pmask)

    def part(b: pa.Table) -> pa.Table:
        ks, pm = ray.get(pk_ref), ray.get(pmask_ref)
        lpk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        qty = _cents(b["l_quantity"])
        price = _cents(b["l_extendedprice"])
        disc = _hund(b["l_discount"])
        hit, pos = _probe_sorted(ks, lpk)
        if not hit.all():
            raise ValueError("l_partkey outside part table")
        bits = pm[pos]
        keep = np.zeros(len(lpk), dtype=bool)
        for i, (_, qlo, qhi, _, _) in enumerate(_Q19_BRANCHES):
            keep |= ((bits >> i) & 1).astype(bool) & (qty >= qlo * 100) & (qty <= qhi * 100)
        rev = (price * (100 - disc))[keep]
        return pa.table(
            {
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
                "revenue": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("revenue", alias_name="revenue"))
    )
    return pd.DataFrame(
        {
            "n_rows": [int(agg["n_rows"] or 0)],
            "revenue": [int(agg["revenue"] or 0)],
        }
    )


def brand_qty_revenue_sql() -> str:
    pc = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dh = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    qc = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
    branches = " OR ".join(
        f"(p_brand = '{b}' AND {qc} BETWEEN {qlo * 100} AND {qhi * 100}"
        f" AND p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in _Q19_BRANCHES
    )
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM({pc} * (100 - {dh})), 0) AS BIGINT) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {branches}
"""


# ---------------------------------------------------------------------------
# TPC-H Q7 / Q8 / Q9 shapes: the year-bucketed multi-join fact pipelines.
# All three reuse the Q5 scaffold — broadcast the genuinely small
# dimensions (part, supplier, nation, region collapse to sorted key
# arrays + attribute masks shipped once via ray.put), co-partition the
# two fact-side shuffles (orderkey, then custkey where the customer's
# nation matters), and pre-aggregate inside every group fold so each
# exchange carries composite-key partials, never row-per-lineitem
# payloads. Monetary sums are exact int64 cents*hundredths throughout
# (isum64), and every composite packing has a loud range guard.
# ---------------------------------------------------------------------------

_EPOCH_YEAR = 1970


def _year_of_ms(ms: np.ndarray) -> np.ndarray:
    """epoch-ms -> calendar year (identical to SQL ``year(ts)``)."""
    return (
        ms.astype("datetime64[ms]").astype("datetime64[Y]").astype(np.int64)
        + _EPOCH_YEAR
    )


_Q7_NATION_A = 3
_Q7_NATION_B = 7
_Q7_LO_MS = 788_918_400_000  # 1995-01-01
_Q7_HI_MS = 852_076_800_000  # 1997-01-01
_Q7_YEAR0 = 1995


def _q7_stage1_group(g: pd.DataFrame) -> pd.DataFrame:
    """orderkey bucket: matched fact rows inherit the order's custkey;
    pre-aggregate by ck2 = custkey*256 + (snat*8 + yoff)."""
    empty = pa.table(
        {"ck2": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    a = _gnp(g, "a").astype(np.int64)
    b = _gnp(g, "b").astype(np.int64)
    ok, cust = key[side == 0], a[side == 0]
    order = np.argsort(ok, kind="stable")
    ok, cust = ok[order], cust[order]
    lk, rev, attr = key[side == 1], a[side == 1], b[side == 1]
    hit, pos = _probe_sorted(ok, lk)
    if not hit.any():
        return empty
    ck2 = cust[pos[hit]] * 256 + attr[hit]
    u, inv = np.unique(ck2, return_inverse=True)
    return pa.table({"ck2": u, "rev": isum64(inv, rev[hit])})


def _q7_stage2_group(g: pd.DataFrame) -> pd.DataFrame:
    """custkey bucket: attach the customer's nation, keep the two ordered
    nation pairs, emit (supp_nk, cust_nk, l_year, rev) partials."""
    empty = pa.table(
        {
            "supp_nk": pa.array([], pa.int64()),
            "cust_nk": pa.array([], pa.int64()),
            "l_year": pa.array([], pa.int64()),
            "rev": pa.array([], pa.int64()),
        }
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    a = _gnp(g, "a").astype(np.int64)
    b = _gnp(g, "b").astype(np.int64)
    ck, cnat = key[side == 0], a[side == 0]
    order = np.argsort(ck, kind="stable")
    ck, cnat = ck[order], cnat[order]
    fk, attr, rev = key[side == 1], a[side == 1], b[side == 1]
    hit, pos = _probe_sorted(ck, fk)
    if not hit.any():
        return empty
    snat, yoff = attr // 8, attr % 8
    cn = np.where(hit, cnat[pos], -1)
    keep = hit & (
        ((snat == _Q7_NATION_A) & (cn == _Q7_NATION_B))
        | ((snat == _Q7_NATION_B) & (cn == _Q7_NATION_A))
    )
    if not keep.any():
        return empty
    comp = (snat[keep] * 32 + cn[keep]) * 8 + yoff[keep]
    u, inv = np.unique(comp, return_inverse=True)
    return pa.table(
        {
            "supp_nk": u // 256,
            "cust_nk": (u // 8) % 32,
            "l_year": _Q7_YEAR0 + u % 8,
            "rev": isum64(inv, rev[keep]),
        }
    )


def q_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """(supp_nation, cust_nation, l_year, revenue): lineitem revenue
    shipped 1995-1996 between the two fixed nations, in both directions,
    bucketed by ship year."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    if len(sn) and int(sn.max()) >= 32:
        raise ValueError("s_nationkey >= 32 breaks the Q7 attr packing")
    sk_ref, sn_ref = ray.put(sk), ray.put(sn)

    lo = pa.scalar(_Q7_LO_MS * 1000, pa.timestamp("us"))
    hi = pa.scalar(_Q7_HI_MS * 1000, pa.timestamp("us"))

    def lrows(b: pa.Table) -> pa.Table:
        ks, ns = ray.get(sk_ref), ray.get(sn_ref)
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        spk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = _hund(b["l_discount"])
        year = _year_of_ms(_ts_ms(b["l_shipdate"]))
        hit, pos = _probe_sorted(ks, spk)
        if not hit.all():
            raise ValueError("l_suppkey outside supplier table")
        snat = ns[pos]
        keep = (snat == _Q7_NATION_A) | (snat == _Q7_NATION_B)
        yoff = year - _Q7_YEAR0
        if keep.any() and (int(yoff[keep].min()) < 0 or int(yoff[keep].max()) >= 8):
            raise ValueError("l_shipdate year outside the Q7 packing window")
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk[keep], nb)),
                "side": pa.array(np.ones(int(keep.sum()), np.int64)),
                "key": pa.array(lk[keep]),
                "a": pa.array((price * (100 - disc))[keep]),
                "b": pa.array((snat * 8 + yoff)[keep]),
            }
        )

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "a": pa.array(ck),
                "b": pa.array(np.zeros(len(ok), np.int64)),
            }
        )

    li = ray.data.read_parquet(
        lpath,
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate",
        ],
        filter=(pc_.field("l_shipdate") >= lo) & (pc_.field("l_shipdate") < hi),
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    stage1 = (
        od.union(li).groupby("bkt").map_groups(_q7_stage1_group, batch_format="pyarrow")
    )

    def frows(b: pa.Table) -> pa.Table:
        ck2 = b["ck2"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        rev = b["rev"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ck2 // 256
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.ones(len(ck), np.int64)),
                "key": pa.array(ck),
                "a": pa.array(ck2 % 256),
                "b": pa.array(rev),
            }
        )

    def crows(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b["c_nationkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.zeros(len(ck), np.int64)),
                "key": pa.array(ck),
                "a": pa.array(cn),
                "b": pa.array(np.zeros(len(ck), np.int64)),
            }
        )

    cd = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(crows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        cd.union(stage1.map_batches(frows, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("bkt")
        .map_groups(_q7_stage2_group, batch_format="pyarrow")
        .groupby(["supp_nk", "cust_nk", "l_year"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    if not len(agg):
        return pd.DataFrame(
            {
                "supp_nation": pd.Series([], dtype=object),
                "cust_nation": pd.Series([], dtype=object),
                "l_year": pd.Series([], dtype="int64"),
                "revenue": pd.Series([], dtype="int64"),
            }
        )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(
        [str(s) for s in nat["n_name"].to_numpy(zero_copy_only=False)]
    )
    no = np.argsort(nk)
    nk, nname = nk[no], nname[no]

    def name_of(keys):
        hit, pos = _probe_sorted(nk, keys.to_numpy().astype(np.int64))
        if not hit.all():
            raise ValueError("nationkey outside nation table")
        return [str(s) for s in nname[pos]]

    out = pd.DataFrame(
        {
            "supp_nation": name_of(agg["supp_nk"]),
            "cust_nation": name_of(agg["cust_nk"]),
            "l_year": agg["l_year"].astype("int64"),
            "revenue": agg["revenue"].astype("int64"),
        }
    )
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(
        drop=True
    )


def volume_shipping_sql() -> str:
    pc = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dh = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    a, b = _Q7_NATION_A, _Q7_NATION_B
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({pc} * (100 - {dh})) AS BIGINT) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((s_nationkey = {a} AND c_nationkey = {b})
    OR (s_nationkey = {b} AND c_nationkey = {a}))
  AND epoch_us(l_shipdate) // 1000 >= {_Q7_LO_MS}
  AND epoch_us(l_shipdate) // 1000 <  {_Q7_HI_MS}
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


_Q8_REGION = "ASIA"
_Q8_NATION = 7          # supplier nation whose market share is measured
_Q8_TYPE = "STANDARD"
_Q8_LO_MS = 788_918_400_000  # 1995-01-01
_Q8_HI_MS = 852_076_800_000  # 1997-01-01
_Q8_YEAR0 = 1995


def _q8_stage1_group(g: pd.DataFrame) -> pd.DataFrame:
    """orderkey bucket: matched fact rows inherit (custkey, order-year);
    pre-aggregate by ck2 = custkey*4 + yoff*2 + target_flag."""
    empty = pa.table(
        {"ck2": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    a = _gnp(g, "a").astype(np.int64)
    b = _gnp(g, "b").astype(np.int64)
    sel = side == 0
    ok, cust, yoff = key[sel], a[sel], b[sel]
    order = np.argsort(ok, kind="stable")
    ok, cust, yoff = ok[order], cust[order], yoff[order]
    lk, rev, flag = key[~sel], a[~sel], b[~sel]
    hit, pos = _probe_sorted(ok, lk)
    if not hit.any():
        return empty
    p = pos[hit]
    ck2 = cust[p] * 4 + yoff[p] * 2 + flag[hit]
    u, inv = np.unique(ck2, return_inverse=True)
    return pa.table({"ck2": u, "rev": isum64(inv, rev[hit])})


def _q8_stage2_group(region_nations: np.ndarray):
    """custkey bucket: keep customers whose nation is in the region; emit
    (o_year, rev_target, rev_total) partials. ``region_nations`` is the
    tiny sorted in-region nationkey array, captured by closure (constant
    per job, a handful of ints)."""

    empty = pa.table(
        {
            "o_year": pa.array([], pa.int64()),
            "rev_target": pa.array([], pa.int64()),
            "rev_total": pa.array([], pa.int64()),
        }
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty
        side = _gnp(g, "side").astype(np.int64)
        key = _gnp(g, "key").astype(np.int64)
        a = _gnp(g, "a").astype(np.int64)
        b = _gnp(g, "b").astype(np.int64)
        ck, cnat = key[side == 0], a[side == 0]
        order = np.argsort(ck, kind="stable")
        ck, cnat = ck[order], cnat[order]
        fk, attr, rev = key[side == 1], a[side == 1], b[side == 1]
        hit, pos = _probe_sorted(ck, fk)
        if not hit.any():
            return empty
        cn = np.where(hit, cnat[pos], -1)
        rhit, _ = _probe_sorted(region_nations, cn)
        keep = hit & rhit
        if not keep.any():
            return empty
        yoff, flag = attr[keep] // 2 % 2, attr[keep] % 2
        rev = rev[keep]
        u, inv = np.unique(yoff, return_inverse=True)
        return pa.table(
            {
                "o_year": _Q8_YEAR0 + u,
                "rev_target": isum64(inv, rev * flag, len(u)),
                "rev_total": isum64(inv, rev, len(u)),
            }
        )

    return fn


def q_market_share(sf_dir: str) -> pd.DataFrame:
    """(o_year, nation_revenue, total_revenue): within the region's
    customers and one part type, the target nation's supplier revenue vs
    all suppliers' revenue, per order year — the market-share numerator
    and denominator as exact integers (the share itself is theirs to
    divide)."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    prt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pk = prt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep_part = np.asarray(
        [str(s) == _Q8_TYPE for s in prt["p_type"].to_numpy(zero_copy_only=False)]
    )
    po = np.argsort(pk)
    pk, keep_part = pk[po], keep_part[po]
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    sk, sflag = sk[so], (sn[so] == _Q8_NATION).astype(np.int64)
    pk_ref, pm_ref = ray.put(pk), ray.put(keep_part)
    sk_ref, sf_ref = ray.put(sk), ray.put(sflag)

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    rk = reg["r_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rname = reg["r_name"].to_numpy(zero_copy_only=False)
    region_keys = set(rk[np.asarray([str(s) == _Q8_REGION for s in rname])].tolist())
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nrk = nat["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    region_nations = np.sort(
        nk[np.asarray([int(k) in region_keys for k in nrk.tolist()])]
    )

    def lrows(b: pa.Table) -> pa.Table:
        pks, pm = ray.get(pk_ref), ray.get(pm_ref)
        sks, sf = ray.get(sk_ref), ray.get(sf_ref)
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        lpk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        spk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = _hund(b["l_discount"])
        phit, ppos = _probe_sorted(pks, lpk)
        shit, spos = _probe_sorted(sks, spk)
        if not (phit.all() and shit.all()):
            raise ValueError("lineitem FK outside part/supplier table")
        keep = pm[ppos]
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk[keep], nb)),
                "side": pa.array(np.ones(int(keep.sum()), np.int64)),
                "key": pa.array(lk[keep]),
                "a": pa.array((price * (100 - disc))[keep]),
                "b": pa.array(sf[spos][keep]),
            }
        )

    lo = pa.scalar(_Q8_LO_MS * 1000, pa.timestamp("us"))
    hi = pa.scalar(_Q8_HI_MS * 1000, pa.timestamp("us"))

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        yoff = _year_of_ms(_ts_ms(b["o_orderdate"])) - _Q8_YEAR0
        if len(yoff) and (int(yoff.min()) < 0 or int(yoff.max()) >= 2):
            raise ValueError("o_orderdate year outside the Q8 packing window")
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "a": pa.array(ck),
                "b": pa.array(yoff),
            }
        )

    li = ray.data.read_parquet(
        lpath,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc_.field("o_orderdate") >= lo) & (pc_.field("o_orderdate") < hi),
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    stage1 = (
        od.union(li).groupby("bkt").map_groups(_q8_stage1_group, batch_format="pyarrow")
    )

    def frows(b: pa.Table) -> pa.Table:
        ck2 = b["ck2"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        rev = b["rev"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ck2 // 4
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.ones(len(ck), np.int64)),
                "key": pa.array(ck),
                "a": pa.array(ck2 % 4),
                "b": pa.array(rev),
            }
        )

    def crows(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b["c_nationkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ck, nb)),
                "side": pa.array(np.zeros(len(ck), np.int64)),
                "key": pa.array(ck),
                "a": pa.array(cn),
                "b": pa.array(np.zeros(len(ck), np.int64)),
            }
        )

    cd = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(crows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        cd.union(stage1.map_batches(frows, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("bkt")
        .map_groups(_q8_stage2_group(region_nations), batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("rev_target", alias_name="nation_revenue"),
            Sum("rev_total", alias_name="total_revenue"),
        )
        .to_pandas()
    )
    if not len(agg):
        return pd.DataFrame(
            {
                "o_year": pd.Series([], dtype="int64"),
                "nation_revenue": pd.Series([], dtype="int64"),
                "total_revenue": pd.Series([], dtype="int64"),
            }
        )
    out = pd.DataFrame(
        {
            "o_year": agg["o_year"].astype("int64"),
            "nation_revenue": agg["nation_revenue"].astype("int64"),
            "total_revenue": agg["total_revenue"].astype("int64"),
        }
    )
    return out.sort_values("o_year").reset_index(drop=True)


def market_share_sql() -> str:
    pc = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dh = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    return f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN s_nationkey = {_Q8_NATION}
                     THEN {pc} * (100 - {dh}) ELSE 0 END) AS BIGINT)
           AS nation_revenue,
       CAST(SUM({pc} * (100 - {dh})) AS BIGINT) AS total_revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_Q8_REGION}'
  AND p_type = '{_Q8_TYPE}'
  AND epoch_us(o_orderdate) // 1000 >= {_Q8_LO_MS}
  AND epoch_us(o_orderdate) // 1000 <  {_Q8_HI_MS}
GROUP BY 1 ORDER BY 1
"""


_Q9_NAME_SUBSTR = "rod"
_Q9_YEAR0 = 1995


def _q9_stage1_group(g: pd.DataFrame) -> pd.DataFrame:
    """orderkey bucket: matched fact rows inherit the order year; profit
    pre-aggregates by comp = snat*16 + yoff (nation x year — a domain of
    a few hundred, never lineitem-sized)."""
    empty = pa.table(
        {"nk_year": pa.array([], pa.int64()), "profit": pa.array([], pa.int64())}
    )
    if not len(g):
        return empty
    side = _gnp(g, "side").astype(np.int64)
    key = _gnp(g, "key").astype(np.int64)
    a = _gnp(g, "a").astype(np.int64)
    b = _gnp(g, "b").astype(np.int64)
    sel = side == 0
    ok, yoff = key[sel], a[sel]
    order = np.argsort(ok, kind="stable")
    ok, yoff = ok[order], yoff[order]
    lk, rev, snat = key[~sel], a[~sel], b[~sel]
    hit, pos = _probe_sorted(ok, lk)
    if not hit.any():
        return empty
    comp = snat[hit] * 16 + yoff[pos[hit]]
    u, inv = np.unique(comp, return_inverse=True)
    return pa.table({"nk_year": u, "profit": isum64(inv, rev[hit])})


def q_nation_profit(sf_dir: str) -> pd.DataFrame:
    """(n_name, o_year, profit): TPC-H-Q9-shaped product-profit rollup —
    lineitem revenue for parts whose name contains _Q9_NAME_SUBSTR,
    attributed to the SUPPLIER's nation and the ORDER's year. (The
    testdata schema has no partsupp/supplycost, so profit is the exact
    discounted revenue — the join/shuffle shape is Q9's.)"""
    import pyarrow.parquet as pq

    lpath = os.path.join(sf_dir, "lineitem.parquet")
    nb = _lsh_n_buckets(_row_count(lpath))

    prt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    pk = prt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep_part = np.asarray(
        [
            _Q9_NAME_SUBSTR in str(s)
            for s in prt["p_name"].to_numpy(zero_copy_only=False)
        ]
    )
    po = np.argsort(pk)
    pk, keep_part = pk[po], keep_part[po]
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    pk_ref, pm_ref = ray.put(pk), ray.put(keep_part)
    sk_ref, sn_ref = ray.put(sk), ray.put(sn)

    def lrows(b: pa.Table) -> pa.Table:
        pks, pm = ray.get(pk_ref), ray.get(pm_ref)
        sks, ns = ray.get(sk_ref), ray.get(sn_ref)
        lk = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        lpk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        spk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(b["l_extendedprice"])
        disc = _hund(b["l_discount"])
        phit, ppos = _probe_sorted(pks, lpk)
        shit, spos = _probe_sorted(sks, spk)
        if not (phit.all() and shit.all()):
            raise ValueError("lineitem FK outside part/supplier table")
        keep = pm[ppos]
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(lk[keep], nb)),
                "side": pa.array(np.ones(int(keep.sum()), np.int64)),
                "key": pa.array(lk[keep]),
                "a": pa.array((price * (100 - disc))[keep]),
                "b": pa.array(ns[spos][keep]),
            }
        )

    def orows(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        yoff = _year_of_ms(_ts_ms(b["o_orderdate"])) - _Q9_YEAR0
        if len(yoff) and (int(yoff.min()) < 0 or int(yoff.max()) >= 16):
            raise ValueError("o_orderdate year outside the Q9 packing window")
        return pa.table(
            {
                "bkt": pa.array(_jbkt_of(ok, nb)),
                "side": pa.array(np.zeros(len(ok), np.int64)),
                "key": pa.array(ok),
                "a": pa.array(yoff),
                "b": pa.array(np.zeros(len(ok), np.int64)),
            }
        )

    li = ray.data.read_parquet(
        lpath,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(lrows, batch_format="pyarrow", zero_copy_batch=True)
    od = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    ).map_batches(orows, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        od.union(li)
        .groupby("bkt")
        .map_groups(_q9_stage1_group, batch_format="pyarrow")
        .groupby("nk_year")
        .aggregate(Sum("profit", alias_name="profit"))
        .to_pandas()
    )
    if not len(agg):
        return pd.DataFrame(
            {
                "n_name": pd.Series([], dtype=object),
                "o_year": pd.Series([], dtype="int64"),
                "profit": pd.Series([], dtype="int64"),
            }
        )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray([str(s) for s in nat["n_name"].to_numpy(zero_copy_only=False)])
    no = np.argsort(nk)
    nk, nname = nk[no], nname[no]
    comp = agg["nk_year"].to_numpy().astype(np.int64)
    hit, pos = _probe_sorted(nk, comp // 16)
    if not hit.all():
        raise ValueError("supplier nationkey outside nation table")
    out = pd.DataFrame(
        {
            "n_name": [str(s) for s in nname[pos]],
            "o_year": (_Q9_YEAR0 + comp % 16).astype("int64"),
            "profit": agg["profit"].astype("int64"),
        }
    )
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)


def nation_profit_sql() -> str:
    pc = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dh = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
    return f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({pc} * (100 - {dh})) AS BIGINT) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{_Q9_NAME_SUBSTR}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""
