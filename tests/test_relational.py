"""Distributed as-of join + sliding-window aggregate: planted edge cases
(unmatched rows, order-date ties, time peers, inclusive window boundary)
hand-checked AND differentially verified against the DuckDB oracles, plus
the real sf0.001 tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

_HOUR_MS = 3_600_000


def _ts(ms_list):
    return pa.array(np.asarray(ms_list, np.int64) * 1000, pa.timestamp("us"))


def _write_events(d, rows):
    """rows: list of (event_id, tms_ms, user_id, event_type, value)."""
    eid, tms, uid, et, val = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": _ts(tms),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(val, pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )


def _write_orders(d, rows):
    """rows: list of (o_orderkey, o_custkey, price, oms_ms)."""
    ok, ck, pr, oms = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                "o_totalprice": pa.array(pr, pa.float64()),
                "o_orderdate": _ts(oms),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    for t in ["events", "orders"]:
        p = tmp_path / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def test_window_agg_peers_and_boundary(ray_session, tmp_path):
    """Time peers (two events, same user, same ms) count each other in BOTH
    rows (SQL RANGE-frame peer semantics); an event exactly window_ms
    earlier is INSIDE the window; one ms earlier than that is outside."""
    from tokenzip.oracles import events_window_sql
    from tokenzip.relational import q_events_window_agg

    base = 1_700_000_000_000
    rows = [
        # user 1: peers at identical ms -> each sees cnt=2
        (0, base, 1, "click", 1.0),
        (1, base, 1, "click", 1.0),
        # user 2: exactly 1h apart -> second sees cnt=2 (inclusive bound)
        (2, base, 2, "view", 1.0),
        (3, base + _HOUR_MS, 2, "view", 1.0),
        # user 3: 1h + 1ms apart -> second sees cnt=1 (outside)
        (4, base, 3, "error", 1.0),
        (5, base + _HOUR_MS + 1, 3, "error", 1.0),
    ]
    _write_events(tmp_path, rows)
    got = q_events_window_agg(str(tmp_path)).reset_index(drop=True)
    by = got.set_index("event_type")
    assert by.loc["click", "sum_window_cnt"] == 4  # 2 + 2
    assert by.loc["click", "max_window_cnt"] == 2
    assert by.loc["view", "sum_window_cnt"] == 3  # 1 + 2
    assert by.loc["error", "sum_window_cnt"] == 2  # 1 + 1
    exp = _oracle(tmp_path, events_window_sql())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_unmatched_ties_and_latest(ray_session, tmp_path):
    """Events before any order stay unmatched; two orders with the same
    (custkey, date) resolve to the MAX orderkey; the latest at-or-before
    order wins, including the exact-same-millisecond order (inclusive)."""
    from tokenzip.analysis import _PAIR_K, _PAIR_MOD
    from tokenzip.oracles import events_asof_sql
    from tokenzip.relational import q_events_asof_orders

    base = 1_700_000_000_000
    _write_orders(
        tmp_path,
        [
            (10, 1, 5.00, base),          # tie on (cust 1, base): key 10...
            (11, 1, 7.00, base),          # ...vs 11 -> 11 wins
            (12, 1, 9.00, base + 1000),   # later order for cust 1
            (13, 2, 3.00, base + 500),    # cust 2's only order
        ],
    )
    _write_events(
        tmp_path,
        [
            (100, base - 1, 1, "click", 1.0),     # before any order: unmatched
            (101, base, 1, "click", 1.0),         # same ms as tie -> okey 11
            (102, base + 999, 1, "view", 1.0),    # before okey 12 -> okey 11
            (103, base + 1000, 1, "view", 1.0),   # at okey 12 -> okey 12
            (104, base, 2, "click", 1.0),         # before cust 2's order
            (105, base + 500, 2, "click", 1.0),   # matches okey 13
            (106, base, 99, "error", 1.0),        # user with no orders at all
        ],
    )
    got = q_events_asof_orders(str(tmp_path)).reset_index(drop=True)
    by = got.set_index("event_type")
    assert by.loc["click", "n_events"] == 4
    assert by.loc["click", "n_matched"] == 2  # events 101 (okey 11), 105 (13)
    assert by.loc["click", "sum_price_cents"] == 700 + 300
    chk = ((101 % _PAIR_MOD) * _PAIR_K + 11 + (105 % _PAIR_MOD) * _PAIR_K + 13) % _PAIR_MOD
    assert by.loc["click", "join_checksum"] == chk
    assert by.loc["view", "n_matched"] == 2  # okey 11 then okey 12
    assert by.loc["view", "sum_price_cents"] == 700 + 900
    assert by.loc["error", "n_matched"] == 0
    assert by.loc["error", "sum_price_cents"] == 0
    exp = _oracle(tmp_path, events_asof_sql())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_boundaries_and_counts(ray_session, tmp_path):
    """Inclusive window on BOTH ends ([t - W, t]): an order exactly W
    earlier and one at the event's exact ms both join; W+1ms earlier and
    1ms later both miss. Multi-order windows aggregate (prefix-sum path)
    and zero-pair events still count in n_events."""
    from tokenzip.analysis import _PAIR_K, _PAIR_MOD
    from tokenzip.oracles import events_range_sql
    from tokenzip.relational import q_events_range_orders

    W = 1000  # 1s window keeps the planted arithmetic obvious
    base = 1_700_000_000_000
    _write_orders(
        tmp_path,
        [
            (10, 1, 1.00, base - W - 1),  # just outside (too old)
            (11, 1, 2.00, base - W),      # exactly W earlier: inside
            (12, 1, 3.00, base - 1),      # inside
            (13, 1, 4.00, base),          # exact event ms: inside
            (14, 1, 5.00, base + 1),      # after the event: outside
            (15, 2, 6.00, base),          # other customer
        ],
    )
    _write_events(
        tmp_path,
        [
            (100, base, 1, "click", 1.0),      # joins orders 11, 12, 13
            (101, base + 1, 1, "view", 1.0),   # joins 11(? W earlier+1ms: out), 12, 13, 14
            (102, base, 99, "error", 1.0),     # no orders: zero pairs
        ],
    )
    got = q_events_range_orders(str(tmp_path), range_ms=W).reset_index(drop=True)
    by = got.set_index("event_type")
    assert by.loc["click", "n_events"] == 1
    assert by.loc["click", "n_pairs"] == 3
    assert by.loc["click", "sum_price_cents"] == 200 + 300 + 400
    chk = sum((100 % _PAIR_MOD) * _PAIR_K + k for k in (11, 12, 13)) % _PAIR_MOD
    assert by.loc["click", "pair_checksum"] == chk
    assert by.loc["view", "n_pairs"] == 3  # 12, 13, 14 (11 aged out by 1ms)
    assert by.loc["view", "sum_price_cents"] == 300 + 400 + 500
    assert by.loc["error", "n_events"] == 1
    assert by.loc["error", "n_pairs"] == 0
    assert by.loc["error", "pair_checksum"] == 0
    exp = _oracle(tmp_path, events_range_sql(W))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_relational_match_oracle_on_testdata(ray_session):
    """Both operators agree with their DuckDB oracles on the real sf0.001
    events/orders tables (the driver's differential check, locally)."""
    from tokenzip.oracles import events_asof_sql, events_range_sql, events_window_sql
    from tokenzip.relational import (
        q_events_asof_orders,
        q_events_range_orders,
        q_events_window_agg,
    )

    con = duckdb.connect()
    for t in ["events", "orders"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    got_w = q_events_window_agg(SF).reset_index(drop=True)
    exp_w = con.sql(events_window_sql()).df()
    pd.testing.assert_frame_equal(got_w, exp_w, check_dtype=False)

    got_a = q_events_asof_orders(SF).reset_index(drop=True)
    exp_a = con.sql(events_asof_sql()).df()
    pd.testing.assert_frame_equal(got_a, exp_a, check_dtype=False)

    got_r = q_events_range_orders(SF).reset_index(drop=True)
    exp_r = con.sql(events_range_sql()).df()
    pd.testing.assert_frame_equal(got_r, exp_r, check_dtype=False)


def test_orders_by_nation_broadcast_join(ray_session):
    """Broadcast equi-join rollup agrees with the DuckDB three-table join
    on the real sf0.001 tables, and refuses a dangling foreign key."""
    from tokenzip.relational import orders_by_nation_sql, q_orders_by_nation

    con = duckdb.connect()
    for t in ["orders", "customer", "nation"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_orders_by_nation(SF).reset_index(drop=True)
    exp = con.sql(orders_by_nation_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_orders_by_nation_dangling_key_raises(ray_session, tmp_path):
    from tokenzip.relational import q_orders_by_nation

    d = str(tmp_path)
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0], pa.int64()),
                  "n_name": pa.array(["X"], pa.string())}),
        f"{d}/nation.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1], pa.int64()),
                  "c_nationkey": pa.array([0], pa.int64())}),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table({"o_custkey": pa.array([2], pa.int64()),  # no such customer
                  "o_totalprice": pa.array([10.0], pa.float64())}),
        f"{d}/orders.parquet",
    )
    with pytest.raises(Exception, match="o_custkey outside customer"):
        q_orders_by_nation(d)


def test_pricing_summary_matches_duckdb(ray_session):
    from tokenzip.relational import pricing_summary_sql, q_pricing_summary

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    got = q_pricing_summary(SF).reset_index(drop=True)
    exp = con.sql(pricing_summary_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hot_key_skew_stays_loglinear(ray_session, tmp_path):
    """Planted viral key: ONE user owns 50k of 51k events (every one of
    them lands in a single hash bucket by design). The window kernel is a
    lexsort + two searchsorted passes, so the hot group costs O(k log k) —
    this completes in seconds, and the answer still matches DuckDB."""
    import time

    from tokenzip.oracles import events_window_sql
    from tokenzip.relational import q_events_window_agg

    rng = np.random.default_rng(13)
    hot = [(i, int(t), 7, "view", 1.0)
           for i, t in enumerate(np.sort(rng.integers(0, 10**9, 50_000)))]
    cold = [(50_000 + i, int(rng.integers(0, 10**9)), 100 + i, "click", 1.0)
            for i in range(1_000)]
    _write_events(tmp_path, hot + cold)
    t0 = time.time()
    got = q_events_window_agg(str(tmp_path)).reset_index(drop=True)
    wall = time.time() - t0
    exp = _oracle(tmp_path, events_window_sql())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert wall < 60, f"hot-key group took {wall:.1f}s — quadratic regression?"


def test_sessions_gap_ties_and_boundary(ray_session, tmp_path):
    """Gap EXACTLY gap_ms stays in-session (break requires > gap); time
    peers never break; a single-event user is one session of duration 0 —
    hand-checked and differentially vs the LAG/SUM-OVER oracle."""
    from tokenzip.relational import events_sessions_sql, q_events_sessions

    base = 1_700_000_000_000
    gap = 10_000
    rows = [
        # user 1: tie, then exactly-gap step (same session of 3), then
        # gap+1 -> a second session of 1
        (0, base, 1, "click", 1.0),
        (1, base, 1, "click", 1.0),
        (2, base + gap, 1, "click", 1.0),
        (3, base + gap + gap + 1, 1, "click", 1.0),
        # user 2: lone event -> session_len 1, duration 0
        (4, base, 2, "view", 1.0),
    ]
    _write_events(tmp_path, rows)
    got = q_events_sessions(str(tmp_path), gap_ms=gap).reset_index(drop=True)
    by = got.set_index("session_len")
    assert by.loc[3, "n_sessions"] == 1 and by.loc[3, "sum_duration_ms"] == gap
    assert by.loc[1, "n_sessions"] == 2 and by.loc[1, "sum_duration_ms"] == 0
    exp = _oracle(tmp_path, events_sessions_sql(gap_ms=gap))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_topn_partial_merge_is_exact():
    """Top-N is merge-monotone: per-batch top-n partials re-selected by the
    final kernel equal the direct top-n over the full array — including
    (price DESC, orderkey ASC) tie-breaks split across batches."""
    from tokenzip.relational import _topn_final, _topn_per_group

    rng = np.random.default_rng(7)
    nat = rng.integers(0, 3, 200)
    okey = rng.permutation(200).astype(np.int64)
    price = rng.integers(0, 20, 200).astype(np.int64)  # many ties
    n = 4
    # direct selection over everything
    keep, rank = _topn_per_group(nat, okey, price, n)
    direct = {(int(nat[i]), int(r)): int(okey[i]) for i, r in zip(keep, rank)}
    # two batch partials -> union -> per-group final merge
    parts = []
    for sl in (slice(0, 83), slice(83, 200)):
        k, _ = _topn_per_group(nat[sl], okey[sl], price[sl], n)
        parts.append(
            pd.DataFrame(
                {
                    "n_name": nat[sl][k].astype(str),
                    "o_orderkey": okey[sl][k],
                    "price_c": price[sl][k],
                }
            )
        )
    merged = pd.concat(parts, ignore_index=True)
    fin = _topn_final(n)
    out = pd.concat(
        [fin(g).to_pandas() for _, g in merged.groupby("n_name")],
        ignore_index=True,
    )
    got = {
        (int(r["n_name"]), int(r["rnk"])): int(r["o_orderkey"])
        for _, r in out.iterrows()
    }
    assert got == direct


def test_top_orders_by_nation_matches_oracle(ray_session):
    """Top-3 per nation on the real sf0.001 tables — ROW_NUMBER oracle."""
    from tokenzip.relational import q_top_orders_by_nation, top_orders_by_nation_sql

    con = duckdb.connect()
    for t in ["orders", "customer", "nation"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_top_orders_by_nation(SF).reset_index(drop=True)
    exp = con.sql(top_orders_by_nation_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sessions_match_oracle_on_testdata(ray_session):
    from tokenzip.relational import events_sessions_sql, q_events_sessions

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_events_sessions(SF).reset_index(drop=True)
    exp = con.sql(events_sessions_sql()).df()
    assert len(got) > 5  # the day-gap default yields a real histogram
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _write_lineitem_keys(d, orderkeys):
    pq.write_table(
        pa.table({"l_orderkey": pa.array(orderkeys, pa.int64())}),
        str(d / "lineitem.parquet"),
    )


def test_anti_join_planted(ray_session, tmp_path):
    """Orders 2 and 4 have no lineitems -> exactly those survive the anti
    join; order 1 (three lineitems) and 3 (one) are dropped."""
    from tokenzip.relational import q_orders_without_lineitems

    base = 1_700_000_000_000
    _write_orders(
        tmp_path, [(1, 10, 5.0, base), (2, 10, 7.0, base), (3, 11, 9.0, base), (4, 11, 11.0, base)]
    )
    _write_lineitem_keys(tmp_path, [1, 1, 1, 3])
    got = q_orders_without_lineitems(str(tmp_path))
    assert len(got) == 1  # single priority in the helper's schema
    assert int(got.loc[0, "n_orders"]) == 2
    assert int(got.loc[0, "sum_price_cents"]) == 700 + 1100
    assert int(got.loc[0, "order_checksum"]) == (2 + 4)


def test_anti_join_matches_oracle_on_testdata(ray_session):
    from tokenzip.relational import (
        orders_without_lineitems_sql,
        q_orders_without_lineitems,
    )

    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_orders_without_lineitems(SF).reset_index(drop=True)
    exp = con.sql(orders_without_lineitems_sql()).df()
    assert int(got["n_orders"].sum()) > 0  # the testdata has childless orders
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tumbling_agg_boundaries_planted(ray_session, tmp_path):
    """Events exactly on a bucket boundary open the NEXT bucket (floor
    semantics); cents are exact; multiple types split within one bucket."""
    from tokenzip.relational import q_events_tumbling_agg

    W = _HOUR_MS
    _write_events(
        tmp_path,
        [
            (1, 0, 1, "click", 1.25),         # bucket 0 (exact cents: 125)
            (2, W - 1, 1, "click", 2.0),      # last ms of bucket 0
            (3, W, 2, "click", 3.0),          # exactly on boundary -> bucket 1
            (4, W + 1, 2, "view", 4.5),       # bucket 1, other type
        ],
    )
    got = q_events_tumbling_agg(str(tmp_path), window_ms=W)
    assert got.values.tolist() == [
        [0, "click", 2, 125 + 200],
        [W, "click", 1, 300],
        [W, "view", 1, 450],
    ]


def test_tumbling_agg_matches_oracle_on_testdata(ray_session):
    from tokenzip.relational import events_tumbling_sql, q_events_tumbling_agg

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_events_tumbling_agg(SF).reset_index(drop=True)
    exp = con.sql(events_tumbling_sql()).df()
    assert len(got) > 1
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _write_join_tables(d, orders_rows, line_rows):
    """orders_rows: (okey, priority); line_rows: (okey, price, disc)."""
    ok, pri = zip(*orders_rows)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_custkey": pa.array([1] * len(ok), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(ok), pa.string()),
                "o_totalprice": pa.array([1.0] * len(ok), pa.float64()),
                "o_orderdate": pa.array([0] * len(ok), pa.timestamp("us")),
                "o_orderpriority": pa.array(pri, pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    lk, pr, dc = zip(*line_rows)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lk, pa.int64()),
                "l_extendedprice": pa.array(pr, pa.float64()),
                "l_discount": pa.array(dc, pa.float64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )


def test_order_revenue_planted(ray_session, tmp_path):
    """Orphan lineitem (key 9) drops out (inner join); revenue is exact
    cents x (100 - hundredths)."""
    from tokenzip.relational import q_order_revenue_by_priority

    _write_join_tables(
        tmp_path,
        [(1, "1-URGENT"), (2, "5-LOW")],
        [(1, 10.0, 0.25), (1, 20.0, 0.0), (2, 5.0, 0.5), (9, 99.0, 0.0)],
    )
    got = q_order_revenue_by_priority(str(tmp_path))
    assert got.values.tolist() == [
        ["1-URGENT", 2, 1000 * 75 + 2000 * 100],
        ["5-LOW", 1, 500 * 50],
    ]


def test_order_revenue_duplicate_pk_raises(ray_session, tmp_path):
    from tokenzip.relational import q_order_revenue_by_priority

    _write_join_tables(
        tmp_path,
        [(1, "1-URGENT"), (1, "5-LOW")],
        [(1, 10.0, 0.0)],
    )
    with pytest.raises(Exception, match="PK violated"):
        q_order_revenue_by_priority(str(tmp_path))


def test_order_revenue_matches_oracle_on_testdata(ray_session):
    from tokenzip.relational import order_revenue_sql, q_order_revenue_by_priority

    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_order_revenue_by_priority(SF).reset_index(drop=True)
    exp = con.sql(order_revenue_sql()).df()
    assert len(got) == 5
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fk_integrity_planted_dangling(ray_session, tmp_path):
    """Lineitems 9 and 10 reference no order; order custkey 99 references
    no customer — both dangling counts exact."""
    from tokenzip.relational import q_fk_integrity

    _write_join_tables(
        tmp_path,
        [(1, "1-URGENT"), (2, "5-LOW")],
        [(1, 1.0, 0.0), (9, 1.0, 0.0), (10, 1.0, 0.0)],
    )
    # orders written by _write_join_tables have o_custkey=1; rewrite with a
    # dangling custkey on order 2
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([7, 99], pa.int64()),
                "o_orderstatus": pa.array(["O", "O"], pa.string()),
                "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
                "o_orderdate": pa.array([0, 0], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT", "5-LOW"], pa.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([7], pa.int64()),
                "c_name": pa.array(["c"], pa.string()),
                "c_nationkey": pa.array([0], pa.int32()),
                "c_acctbal": pa.array([0.0], pa.float64()),
                "c_mktsegment": pa.array(["m"], pa.string()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    got = q_fk_integrity(str(tmp_path))
    assert got.values.tolist() == [
        ["lineitem->orders", 3, 2],
        ["orders->customer", 2, 1],
    ]


def test_fk_integrity_matches_oracle_on_testdata(ray_session):
    from tokenzip.relational import fk_integrity_sql, q_fk_integrity

    con = duckdb.connect()
    for t in ["orders", "lineitem", "customer"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_fk_integrity(SF).reset_index(drop=True)
    exp = con.sql(fk_integrity_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_revenue_rollup_matches_oracle_on_testdata(ray_session):
    import duckdb

    from tokenzip.relational import q_revenue_rollup, revenue_rollup_sql

    con = duckdb.connect()
    for t in ["orders", "customer", "nation"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_revenue_rollup(SF).reset_index(drop=True)
    exp = con.sql(revenue_rollup_sql()).df()
    # the three levels must be internally consistent: grand total row equals
    # the sum of the finest level
    fine = got[(got["n_name"] != "ALL") & (got["o_orderpriority"] != "ALL")]
    total = got[(got["n_name"] == "ALL")]
    assert int(total["n_orders"].iloc[0]) == int(fine["n_orders"].sum())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_order_price_deciles_matches_ntile_oracle(ray_session):
    import duckdb

    from tokenzip.relational import order_price_deciles_sql, q_order_price_deciles

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
    got = q_order_price_deciles(SF).reset_index(drop=True)
    exp = con.sql(order_price_deciles_sql()).df()
    assert len(got) == 10
    # NTILE size law: first (n % 10) deciles hold one extra row
    n = int(got["n_orders"].sum())
    assert sorted(got["n_orders"], reverse=True) == sorted(
        [n // 10 + (1 if d <= n % 10 else 0) for d in range(1, 11)], reverse=True
    )
    assert got["min_cents"].is_monotonic_increasing
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_order_price_deciles_tie_heavy(ray_session, tmp_path):
    """All-equal prices: every decile sees the same value; counts follow the
    NTILE size law exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.relational import order_price_deciles_sql, q_order_price_deciles

    n = 23
    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_totalprice": pa.array([7.77] * n, pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    got = q_order_price_deciles(str(tmp_path)).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')"
    )
    exp = con.sql(order_price_deciles_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert set(got["min_cents"]) == {777} and set(got["max_cents"]) == {777}


def test_user_gap_stats_matches_lag_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_user_gap_stats, user_gap_stats_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_user_gap_stats(SF).reset_index(drop=True)
    exp = con.sql(user_gap_stats_sql()).df()
    assert int(got["n_gaps"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_user_gap_stats_tie_attribution(ray_session, tmp_path):
    """Two same-user events at the SAME timestamp: the event_id tie-break
    decides which type the zero gap attributes to — must match LAG."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.relational import q_user_gap_stats, user_gap_stats_sql

    ts = pa.array([1000, 1000, 5000, 9000], pa.timestamp("ms"))
    tbl = pa.table(
        {
            "event_id": pa.array([2, 1, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "event_type": pa.array(["b", "a", "c", "d"]),
            "ts": ts,
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_user_gap_stats(str(tmp_path)).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.sql(user_gap_stats_sql()).df()
    # gap 0 goes to 'b' (eid 2 follows eid 1 at equal ts), 4000 to 'c';
    # user 8 has no predecessor
    assert got.values.tolist() == [["b", 1, 0, 0], ["c", 1, 4000, 4000]]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_top_customer_by_nation_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import (
        q_top_customer_by_nation,
        top_customer_by_nation_sql,
    )

    con = duckdb.connect()
    for t in ["orders", "customer", "nation"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_top_customer_by_nation(SF).reset_index(drop=True)
    exp = con.sql(top_customer_by_nation_sql()).df()
    assert len(got) > 0
    # one winner per nation, revenue positive
    assert got["n_name"].is_unique and (got["revenue_cents"] > 0).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_hourly_pivot_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import events_hourly_pivot_sql, q_events_hourly_pivot

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_events_hourly_pivot(SF).reset_index(drop=True)
    exp = con.sql(events_hourly_pivot_sql()).df()
    assert list(got["hour"]) == list(range(24))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_nation_revenue_share_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import nation_revenue_share_sql, q_nation_revenue_share

    con = duckdb.connect()
    for t in ["orders", "customer", "nation"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_nation_revenue_share(SF).reset_index(drop=True)
    exp = con.sql(nation_revenue_share_sql()).df()
    # floor division: shares sum to <= 10000 and within #nations of it
    s = int(got["share_bp"].sum())
    assert 10_000 - len(got) <= s <= 10_000
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_funnel_matches_oracle_on_testdata(ray_session):
    import duckdb

    from tokenzip.relational import funnel_view_purchase_sql, q_funnel_view_purchase

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_funnel_view_purchase(SF).reset_index(drop=True)
    exp = con.sql(funnel_view_purchase_sql()).df()
    n_p, n_c, n_v = got.values.tolist()[0]
    assert 0 < n_c < n_p and n_v >= n_c  # boundary actually discriminates
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_funnel_window_boundaries(ray_session, tmp_path):
    """Inclusive-both-ends window: a view exactly at ts-window and one at
    ts count; one at ts-window-1 does not; other users never match."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.relational import funnel_view_purchase_sql, q_funnel_view_purchase

    W = 1000
    base = 1_700_000_000_000
    rows = [
        # (event_id, user, type, tms)
        (1, 1, "view", base - W),       # exactly at window edge: counts
        (2, 1, "view", base),           # same instant: counts
        (3, 1, "view", base - W - 1),   # one ms too early: excluded
        (4, 2, "view", base),           # different user: excluded
        (5, 1, "purchase", base),
        (6, 3, "purchase", base),       # no views: not converted
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("ms")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_funnel_view_purchase(str(tmp_path), window_ms=W)
    assert got.values.tolist() == [[2, 1, 2]]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.sql(funnel_view_purchase_sql(window_ms=W)).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_retention_cohorts_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_retention_cohorts, retention_cohorts_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_retention_cohorts(SF).reset_index(drop=True)
    exp = con.sql(retention_cohorts_sql()).df()
    assert (got["n_retained"] <= got["n_users"]).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_retention_cohorts_planted(ray_session, tmp_path):
    """Discriminating cases: retained next week; skipped a week (NOT
    retained); event in the SAME week only (not retained); two cohorts."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.relational import _WEEK_MS, q_retention_cohorts, retention_cohorts_sql

    W = _WEEK_MS
    rows = [
        # user 1: cohort week 100, returns week 101 -> retained
        (1, 100 * W + 5), (1, 101 * W + 1),
        # user 2: cohort 100, next event week 102 -> NOT retained
        (2, 100 * W + 9), (2, 102 * W + 3),
        # user 3: cohort 100, extra event same week only -> NOT retained
        (3, 100 * W + 1), (3, 100 * W + 2),
        # user 4: cohort 101, returns 102 -> retained (second cohort)
        (4, 101 * W + 7), (4, 102 * W + 8),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_retention_cohorts(str(tmp_path)).reset_index(drop=True)
    assert got.values.tolist() == [[100, 3, 1], [101, 1, 1]]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.sql(retention_cohorts_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_shipping_priority_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_shipping_priority, shipping_priority_sql

    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_shipping_priority(SF).reset_index(drop=True)
    exp = con.sql(shipping_priority_sql()).df()
    assert len(got) == 10 and got["revenue"].is_monotonic_decreasing
    # both date predicates actually bit: every surviving order predates
    # the cutoff (shipdate side is checked by value equality with the SQL)
    from tokenzip.relational import _Q3_CUT_MS

    assert (got["o_orderdate_ms"] < _Q3_CUT_MS).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_user_peak_window_matches_frame_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_user_peak_window, user_peak_window_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_user_peak_window(SF).reset_index(drop=True)
    exp = con.sql(user_peak_window_sql()).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_user_peak_window_frame_clamps_at_user_start(ray_session, tmp_path):
    """A user's first two windows are partial (1 then 2 rows); a big spend
    by the PREVIOUS user in the sorted order must never leak into them."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.relational import q_user_peak_window, user_peak_window_sql

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([1000, 2000, 3000, 1500, 2500], pa.timestamp("ms")),
            "value": pa.array([100.0, 100.0, 100.0, 1.0, 2.0]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_user_peak_window(str(tmp_path)).reset_index(drop=True)
    # user 1 peak = 300 units = 30000 cents; user 2 peak = 1+2 = 300 cents
    assert got.set_index("user_id").loc[1, "peak3_cents"] == 30000
    assert got.set_index("user_id").loc[2, "peak3_cents"] == 300
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.sql(user_peak_window_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_small_qty_revenue_matches_q17_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_small_qty_revenue, small_qty_revenue_sql

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_small_qty_revenue(SF).reset_index(drop=True)
    exp = con.sql(small_qty_revenue_sql()).df()
    assert int(got["n_rows"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_lineitem_cube_matches_cube_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_lineitem_cube, lineitem_cube_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    got = q_lineitem_cube(SF).reset_index(drop=True)
    exp = con.sql(lineitem_cube_sql()).df()
    # all four grouping sets present: fine cells + two margins + grand total
    assert (got["l_returnflag"] == "ALL").any()
    assert (got["l_linestatus"] == "ALL").any()
    assert ((got["l_returnflag"] == "ALL") & (got["l_linestatus"] == "ALL")).sum() == 1
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_customer_order_dist_matches_q13_oracle(ray_session):
    import duckdb

    from tokenzip.relational import customer_order_dist_sql, q_customer_order_dist

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_customer_order_dist(SF).reset_index(drop=True)
    exp = con.sql(customer_order_dist_sql()).df()
    # the distribution accounts for EVERY customer, zero-order ones included
    n_cust = pq.ParquetFile(f"{SF}/customer.parquet").metadata.num_rows
    assert int(got["custdist"].sum()) == n_cust
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_customer_order_dist_zero_bucket(ray_session, tmp_path):
    """Customers without orders land in the c_count=0 bucket (the LEFT
    JOIN's whole contribution), computed without scanning customer."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_name": pa.array(["a", "b", "c", "d"]),
                "c_nationkey": pa.array([0, 0, 0, 0], pa.int32()),
                "c_acctbal": pa.array([0.0] * 4),
                "c_mktsegment": pa.array(["X"] * 4),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    import datetime as dt

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([2, 2, 3], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array([dt.datetime(2020, 1, 1)] * 3, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 3),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from tokenzip.relational import q_customer_order_dist

    got = q_customer_order_dist(str(tmp_path))
    assert got.values.tolist() == [[0, 2], [1, 1], [2, 1]]


def test_large_orders_matches_q18_oracle(ray_session):
    import duckdb

    from tokenzip.relational import large_orders_sql, q_large_orders

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_large_orders(SF).reset_index(drop=True)
    exp = con.sql(large_orders_sql()).df()
    assert len(got) > 0 and (got["sum_qty"] > 250).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_order_priority_exists_matches_q4_oracle(ray_session):
    import duckdb

    from tokenzip.relational import order_priority_exists_sql, q_order_priority_exists

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_order_priority_exists(SF).reset_index(drop=True)
    exp = con.sql(order_priority_exists_sql()).df()
    # EXISTS counts orders once no matter how many returned lineitems
    n_orders = pq.ParquetFile(f"{SF}/orders.parquet").metadata.num_rows
    assert 0 < int(got["n_orders"].sum()) <= n_orders
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_returned_top_customers_matches_q10_oracle(ray_session):
    import duckdb

    from tokenzip.relational import (
        q_returned_top_customers,
        returned_top_customers_sql,
    )

    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_returned_top_customers(SF).reset_index(drop=True)
    exp = con.sql(returned_top_customers_sql()).df()
    assert len(got) == 20 and got["revenue"].is_monotonic_decreasing
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cumulative_revenue_matches_window_oracle(ray_session):
    import duckdb

    from tokenzip.relational import cumulative_revenue_sql, q_cumulative_revenue

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
    got = q_cumulative_revenue(SF).reset_index(drop=True)
    exp = con.sql(cumulative_revenue_sql()).df()
    # running total is monotone within each priority and ends at its total
    for _, grp in got.groupby("o_orderpriority"):
        assert grp["cum_revenue_cents"].is_monotonic_increasing
        assert int(grp["cum_revenue_cents"].iloc[-1]) == int(grp["revenue_cents"].sum())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_idle_high_balance_matches_q22_oracle(ray_session):
    import duckdb

    from tokenzip.relational import idle_high_balance_sql, q_idle_high_balance

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_idle_high_balance(SF).reset_index(drop=True)
    exp = con.sql(idle_high_balance_sql()).df()
    assert int(got["n_cust"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_idle_high_balance_empty_is_typed(ray_session, tmp_path):
    """When every high-balance customer ordered recently the result is an
    EMPTY frame with the full schema (the zero-block gotcha)."""
    import datetime as dt

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["a", "b"]),
                "c_nationkey": pa.array([0, 0], pa.int32()),
                "c_acctbal": pa.array([10.0, 20.0]),
                "c_mktsegment": pa.array(["X", "Y"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11], pa.int64()),
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 2),
                "o_totalprice": pa.array([1.0] * 2),
                "o_orderdate": pa.array(
                    [dt.datetime(2001, 1, 1)] * 2, pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 2),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from tokenzip.relational import q_idle_high_balance

    got = q_idle_high_balance(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["c_mktsegment", "n_cust", "sum_acctbal_cents"]


def test_local_supplier_volume_matches_q5_oracle(ray_session):
    import duckdb

    from tokenzip.relational import local_supplier_volume_sql, q_local_supplier_volume

    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "supplier", "nation", "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_local_supplier_volume(SF).reset_index(drop=True)
    exp = con.sql(local_supplier_volume_sql()).df()
    assert len(got) > 0 and got["revenue"].is_monotonic_decreasing
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_supplier_variety_matches_q16_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_supplier_variety, supplier_variety_sql

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_supplier_variety(SF).reset_index(drop=True)
    exp = con.sql(supplier_variety_sql()).df()
    n_sup = pq.ParquetFile(f"{SF}/supplier.parquet").metadata.num_rows
    assert (got["supplier_cnt"] >= 1).all() and (got["supplier_cnt"] <= n_sup).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_single_month_orders_matches_all_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_single_month_orders, single_month_orders_sql

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_single_month_orders(SF).reset_index(drop=True)
    exp = con.sql(single_month_orders_sql()).df()
    assert int(got["n_orders"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_single_month_orders_boundary(ray_session, tmp_path):
    """One lineitem = trivially ALL; a month-crossing pair disqualifies;
    orders without lineitems don't count."""
    import datetime as dt

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, 1, 1], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array([dt.datetime(2020, 1, 1)] * 3, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2, 2], pa.int64()),
                "l_partkey": pa.array([1, 1, 1], pa.int64()),
                "l_suppkey": pa.array([1, 1, 1], pa.int64()),
                "l_linenumber": pa.array([1, 1, 2], pa.int32()),
                "l_quantity": pa.array([1.0] * 3),
                "l_extendedprice": pa.array([1.0] * 3),
                "l_discount": pa.array([0.0] * 3),
                "l_tax": pa.array([0.0] * 3),
                "l_returnflag": pa.array(["N"] * 3),
                "l_linestatus": pa.array(["O"] * 3),
                "l_shipdate": pa.array(
                    [
                        dt.datetime(2020, 3, 15),
                        dt.datetime(2020, 1, 31),
                        dt.datetime(2020, 2, 1),
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from tokenzip.relational import q_single_month_orders

    got = q_single_month_orders(str(tmp_path))
    assert got.values.tolist() == [["1-URGENT", 1]]


def test_events_dedup_lag_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import events_dedup_lag_sql, q_events_dedup_lag

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_events_dedup_lag(SF).reset_index(drop=True)
    exp = con.sql(events_dedup_lag_sql()).df()
    assert (got["n_suppressed"] <= got["n_events"]).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_dedup_lag_window_edges(ray_session, tmp_path):
    """Suppression keys on (user, type); the reference point is the
    previous event even if that one was itself suppressed; an exact
    window-width gap is NOT suppressed (strict <)."""
    import datetime as dt

    base = dt.datetime(2021, 1, 1)
    rows = [
        # user 1 view: 0s, +10min (sup), +20min (sup: 10min from previous)
        (1, 1, base, "view"),
        (2, 1, base + dt.timedelta(minutes=10), "view"),
        (3, 1, base + dt.timedelta(minutes=20), "view"),
        # user 1 click exactly 60min after its predecessor: kept
        (4, 1, base, "click"),
        (5, 1, base + dt.timedelta(hours=1), "click"),
        # user 2 view within window of user 1's: different user, kept
        (6, 2, base + dt.timedelta(minutes=1), "view"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from tokenzip.relational import q_events_dedup_lag

    got = q_events_dedup_lag(str(tmp_path))
    assert got.values.tolist() == [["click", 2, 0], ["view", 4, 2]]


def test_qty_price_suffstats_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_qty_price_suffstats, qty_price_suffstats_sql

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    got = q_qty_price_suffstats(SF).reset_index(drop=True)
    exp = con.sql(qty_price_suffstats_sql()).df()
    # Cauchy-Schwarz on the moments: (Sxy)^2 <= Sxx * Syy needs Syy, but
    # the mean inequality n*Sxx >= Sx^2 must always hold
    assert ((got["n"] * got["sum_qty_sq"]) >= got["sum_qty"] ** 2).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_props_field_stats_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import props_field_stats_sql, q_props_field_stats

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_props_field_stats(SF).reset_index(drop=True)
    exp = con.sql(props_field_stats_sql()).df()
    assert (got["min_k"] <= got["max_k"]).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_props_field_stats_malformed_raises(ray_session, tmp_path):
    import datetime as dt

    import pytest as _pytest

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([dt.datetime(2021, 1, 1)], pa.timestamp("us")),
                "user_id": pa.array([1], pa.int64()),
                "event_type": pa.array(["view"]),
                "value": pa.array([0.0]),
                "props": pa.array(['{"other": true}']),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from tokenzip.relational import q_props_field_stats

    with _pytest.raises(Exception, match="integer 'k' field"):
        q_props_field_stats(str(tmp_path))


def test_large_orders_empty_when_threshold_unreachable(ray_session):
    """A threshold above every order's quantity yields a typed EMPTY frame
    (the filtered-parent empty-bucket path the property differential
    exposed in q22 — exercised here at the query level)."""
    from tokenzip.relational import q_large_orders

    got = q_large_orders(SF, min_qty=10**9)
    assert len(got) == 0
    assert list(got.columns) == [
        "o_orderkey",
        "o_custkey",
        "o_totalprice_cents",
        "o_orderdate_ms",
        "sum_qty",
    ]


def test_funnel_three_step_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import funnel_three_step_sql, q_funnel_three_step

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_funnel_three_step(SF).reset_index(drop=True)
    exp = con.sql(funnel_three_step_sql()).df()
    # funnel monotonicity
    assert (
        int(got["n_users_view"].iloc[0])
        >= int(got["n_users_view_click"].iloc[0])
        >= 0
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_funnel_three_step_chain_ordering(ray_session, tmp_path):
    """The chain is ORDERED: click-before-view never qualifies, a purchase
    only counts against a click that itself qualified, and every step must
    land strictly later within the window."""
    import datetime as dt

    base = dt.datetime(2021, 6, 1)
    rows = [
        # user 1: proper chain v(0) < c(+1h) < p(+2h)  -> full chain
        (1, 1, base, "view"),
        (2, 1, base + dt.timedelta(hours=1), "click"),
        (3, 1, base + dt.timedelta(hours=2), "purchase"),
        # user 2: click BEFORE view; purchase after view only -> view only
        (4, 2, base + dt.timedelta(hours=1), "view"),
        (5, 2, base, "click"),
        (6, 2, base + dt.timedelta(hours=2), "purchase"),
        # user 3: v -> c ok, purchase 2 DAYS after click -> vc only
        (7, 3, base, "view"),
        (8, 3, base + dt.timedelta(hours=1), "click"),
        (9, 3, base + dt.timedelta(days=2, hours=1), "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from tokenzip.relational import q_funnel_three_step

    got = q_funnel_three_step(str(tmp_path))
    assert got.values.tolist() == [[3, 2, 1]]


def test_rolling_active_users_matches_window_oracle(ray_session):
    import duckdb

    from tokenzip.relational import q_rolling_active_users, rolling_active_users_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_rolling_active_users(SF).reset_index(drop=True)
    exp = con.sql(rolling_active_users_sql()).df()
    assert len(got) > 0 and (got["wau"] >= 1).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rolling_active_users_interval_merge(ray_session, tmp_path):
    """Interval union semantics: a user active on days {0, 3} is one WAU
    for every day 0..9 (overlapping [0,6] and [3,9] merge); a user with a
    9-day gap contributes two separate runs; users never double-count."""
    import datetime as dt

    base = dt.datetime(2021, 1, 4)  # a known epoch-day anchor
    rows = [
        (1, 1, base),                          # day d0
        (2, 1, base + dt.timedelta(days=3)),   # merges with d0's window
        (3, 2, base),                          # second user, same day
        (4, 2, base + dt.timedelta(days=12)),  # gap > 6: separate run
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from tokenzip.relational import q_rolling_active_users

    got = q_rolling_active_users(str(tmp_path))
    d0 = int(got["day"].iloc[0])
    # observed days: d0 (2 users), d0+3 (still both windows), d0+12 (user 2 only)
    assert got.values.tolist() == [[d0, 2], [d0 + 3, 2], [d0 + 12, 1]]


def test_event_type_affinity_matches_basket_oracle(ray_session):
    import duckdb

    from tokenzip.relational import event_type_affinity_sql, q_event_type_affinity

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_event_type_affinity(SF).reset_index(drop=True)
    exp = con.sql(event_type_affinity_sql()).df()
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert (got["n_users"] <= n_users).all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_salted_join_viral_key(ray_session, tmp_path):
    """Planted viral user (one uid = 30% of events): the auto-detected
    hot-key salting spreads its probe rows across the reserved salt buckets
    (no single straggler group) while the as-of AND range join results stay
    identical to the unsalted plan and to the DuckDB oracle."""
    from tokenzip.relational import (
        _JOIN_N_SALTS,
        _lsh_n_buckets,
        _tagged_sides,
        q_events_asof_orders,
        q_events_range_orders,
    )
    from tokenzip.shuffle import detect_hot_keys

    base = 1_700_000_000_000
    rng = np.random.default_rng(3)
    n = 3000
    viral = 7
    uids = np.where(
        np.arange(n) % 10 < 3, viral, rng.integers(100, 200, size=n)
    ).astype(np.int64)
    rows = [
        (i, base + int(rng.integers(0, 10_000_000)), int(uids[i]),
         ["click", "view"][i % 2], 1.0)
        for i in range(n)
    ]
    _write_events(tmp_path, rows)
    orows = [
        (k, int(ck), 100.0 + k, base - 1_000_000 + k * 7)
        for k, ck in enumerate(
            list(range(100, 200)) * 2 + [viral] * 5
        )
    ]
    _write_orders(tmp_path, orows)

    found = detect_hot_keys(str(tmp_path / "events.parquet"), "user_id", frac=0.10)
    assert viral in found.tolist()

    # no straggler: the viral uid's probe rows span every salt bucket and
    # the largest salted group holds ~1/n_salts of them
    nb = _lsh_n_buckets(n + len(orows))
    ev, od = _tagged_sides(
        str(tmp_path / "events.parquet"), str(tmp_path / "orders.parquet"),
        nb, np.array([viral], np.int64),
    )
    tagged = ev.union(od).to_pandas()
    probe_hot = tagged[(tagged["key"] == viral) & (tagged["side"] == 1)]
    per_bkt = probe_hot.groupby("bkt").size()
    assert len(per_bkt) == _JOIN_N_SALTS
    # hash-of-id salting is a binomial split — allow a few sigma over the
    # perfect share; the claim is "no straggler", not byte-equal shares
    assert per_bkt.max() <= int(1.5 * len(probe_hot) / _JOIN_N_SALTS) + 1
    assert (per_bkt.index >= nb).all()  # reserved range, no collision
    # build side replicated into every salt bucket
    build_hot = tagged[(tagged["key"] == viral) & (tagged["side"] == 0)]
    assert sorted(build_hot["bkt"].unique()) == sorted(per_bkt.index)
    assert len(build_hot) == 5 * _JOIN_N_SALTS

    plain_asof = q_events_asof_orders(str(tmp_path))
    salted_asof = q_events_asof_orders(str(tmp_path), hot_keys="auto")
    pd.testing.assert_frame_equal(plain_asof, salted_asof)
    plain_rng = q_events_range_orders(str(tmp_path))
    salted_rng = q_events_range_orders(str(tmp_path), hot_keys="auto")
    pd.testing.assert_frame_equal(plain_rng, salted_rng)

    from tokenzip.oracles import events_asof_sql

    exp = _oracle(tmp_path, events_asof_sql())
    exp = exp.sort_values("event_type").reset_index(drop=True)
    got = salted_asof[exp.columns]
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns if c != "event_type"}),
        exp.astype({c: "int64" for c in exp.columns if c != "event_type"}),
    )


def test_salted_equi_join_viral_orderkey(ray_session, tmp_path):
    """Planted viral orderkey (one key = ~40% of lineitems): the salted
    equi-join plan splits that key's probe rows by hash of
    (orderkey, linenumber) across the reserved salt buckets, replicates its
    single build row per salt, and stays byte-identical to the unsalted
    plan — including the exact int64 revenue and the PK guard (each salt
    bucket sees the replicated order row exactly once, so no false trip)."""
    from tokenzip.relational import q_order_revenue_by_priority
    from tokenzip.shuffle import detect_hot_keys

    rng = np.random.default_rng(11)
    n = 5000
    viral = 42
    lk = np.where(
        np.arange(n) % 5 < 2, viral, rng.integers(1000, 1400, size=n)
    ).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lk),
                "l_linenumber": pa.array(np.arange(n, dtype=np.int64) % 7 + 1),
                "l_extendedprice": pa.array(
                    rng.integers(100, 99999, size=n).astype(np.float64) / 100.0
                ),
                "l_discount": pa.array(
                    rng.integers(0, 11, size=n).astype(np.float64) / 100.0
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    okeys = np.unique(lk)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys),
                "o_orderpriority": pa.array(
                    [["1-URGENT", "3-MEDIUM", "5-LOW"][int(k) % 3] for k in okeys]
                ),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )

    found = detect_hot_keys(str(tmp_path / "lineitem.parquet"), "l_orderkey", frac=0.10)
    assert viral in found.tolist()

    plain = q_order_revenue_by_priority(str(tmp_path))
    salted_auto = q_order_revenue_by_priority(str(tmp_path), hot_keys="auto")
    pd.testing.assert_frame_equal(plain, salted_auto)
    salted_explicit = q_order_revenue_by_priority(
        str(tmp_path), hot_keys=[viral]
    )
    pd.testing.assert_frame_equal(plain, salted_explicit)

    con = duckdb.connect()
    exp = con.sql(
        f"""
        SELECT o_orderpriority,
               COUNT(*)::BIGINT AS n_items,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT
                 AS sum_revenue
        FROM read_parquet('{tmp_path}/lineitem.parquet') l
        JOIN read_parquet('{tmp_path}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(salted_auto, exp, check_dtype=False)


def _tpch_views(con):
    for t in ("lineitem", "orders", "customer", "supplier", "part", "nation", "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


@pytest.mark.parametrize(
    "qname",
    [
        "forecast_revenue",
        "promo_revenue",
        "top_supplier",
        "brand_qty_revenue",
        "volume_shipping",
        "market_share",
        "nation_profit",
    ],
)
def test_tpch_year_shapes_match_oracle(ray_session, qname):
    """Q6/Q14/Q15/Q19/Q7/Q8/Q9 shapes, differentially vs DuckDB at sf0.001."""
    import duckdb

    from tokenzip import relational as R

    fn = getattr(R, f"q_{qname}")
    sql = getattr(R, f"{qname}_sql")
    con = duckdb.connect()
    _tpch_views(con)
    got = fn(SF).reset_index(drop=True)
    exp = con.sql(sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_forecast_revenue_empty_window(ray_session, tmp_path):
    """Zero qualifying rows must yield the one all-zero row, not a crash
    (the aggregate-on-empty gotcha the zero-block guards exist for)."""
    from tokenzip.relational import _Q6_LO_MS, q_forecast_revenue

    d = tmp_path / "sf"
    d.mkdir()
    li = pq.read_table(f"{SF}/lineitem.parquet")
    # push every shipdate before the window so the filter removes all rows
    ms = np.full(len(li), (_Q6_LO_MS - 86_400_000) * 1000, np.int64)
    li = li.set_column(
        li.schema.get_field_index("l_shipdate"),
        "l_shipdate",
        pa.array(ms, pa.timestamp("us")),
    )
    pq.write_table(li, str(d / "lineitem.parquet"))
    out = q_forecast_revenue(str(d))
    assert out.shape == (1, 2)
    assert int(out["n_rows"][0]) == 0 and int(out["revenue"][0]) == 0


def test_year_of_ms_matches_sql_year():
    """The engine's epoch-ms -> calendar-year helper must agree with SQL
    ``year(ts)`` on boundaries (leap years, new-year instants, last tick
    of a year) — every Q7/Q8/Q9 pack offset derives from it."""
    import duckdb

    from tokenzip.relational import _year_of_ms

    ms = np.array(
        [
            0,                      # 1970-01-01
            820_454_400_000,        # 1996-01-01 (leap year start)
            820_454_399_999,        # one ms before
            951_782_400_000,        # 2000-02-29
            978_307_199_999,        # 2000-12-31 23:59:59.999
            978_307_200_000,        # 2001-01-01
        ],
        np.int64,
    )
    got = _year_of_ms(ms)
    con = duckdb.connect()
    exp = [
        int(con.sql(f"SELECT year(to_timestamp({int(m)} / 1000.0))").fetchone()[0])
        for m in ms
    ]
    assert got.tolist() == exp == [1970, 1996, 1995, 2000, 2000, 2001]


def test_top_supplier_tie_returns_all(ray_session, tmp_path):
    """Two suppliers tied at max revenue must both be returned (the
    windowed-subquery MAX semantics, not LIMIT 1)."""
    from tokenzip.relational import _Q15_LO_MS, q_top_supplier

    d = tmp_path / "sf"
    d.mkdir()
    ship = pa.array([(_Q15_LO_MS + 1000) * 1000] * 4, pa.timestamp("us"))
    li = pa.table(
        {
            "l_suppkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_extendedprice": pa.array([10.0, 20.0, 15.0, 15.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
            "l_shipdate": ship,
        }
    )
    pq.write_table(li, str(d / "lineitem.parquet"))
    sup = pa.table(
        {
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["SUP_1", "SUP_2", "SUP_3"]),
        }
    )
    pq.write_table(sup, str(d / "supplier.parquet"))
    out = q_top_supplier(str(d))
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["s_name"]) == ["SUP_1", "SUP_2"]
    assert list(out["total_rev"]) == [300000, 300000]
