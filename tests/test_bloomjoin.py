"""Bloom-filter semi-join: kernel properties (no false negatives, bounded
fpr, OR-mergeable partials), a planted end-to-end case, the corrupted-bitmap
audit, and the DuckDB oracle on the real sf0.001 tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tokenzip.bloomjoin import bloom_build, bloom_probe

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(7)
    members = np.unique(rng.integers(0, 1 << 62, 5000, dtype=np.int64))
    words = bloom_build(members)
    assert bloom_probe(words, members).all()
    # disjoint non-members: measured fpr under the sizing bound
    others = np.unique(rng.integers(0, 1 << 62, 50_000, dtype=np.int64))
    others = np.setdiff1d(others, members)
    fpr = float(bloom_probe(words, others).mean())
    assert fpr < 0.05, fpr


def test_bloom_partials_or_merge():
    """Per-batch partial bitmaps built at the SAME m OR-merge into exactly
    the whole-set bitmap — the associativity the 100-TB build fold relies
    on. m is derived from n, so partials pass the full n via sizing keys."""
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(0, 1 << 40, 4096, dtype=np.int64))
    whole = bloom_build(keys)
    # emulate the distributed fold: same m comes from same total n
    m_bits = len(whole) * 64
    parts = np.zeros_like(whole)
    for half in np.array_split(keys, 7):
        part = np.zeros_like(whole)
        from tokenzip.bloomjoin import _probe_positions

        for pos in _probe_positions(half, m_bits):
            np.bitwise_or.at(
                part, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        parts |= part
    assert np.array_equal(parts, whole)


def test_bloom_empty_build_side():
    words = bloom_build(np.empty(0, dtype=np.int64))
    assert not bloom_probe(words, np.arange(100, dtype=np.int64)).any()


def _write_tables(d, orders_rows, line_rows):
    """orders_rows: (okey, priority); line_rows: (okey, qty, flag)."""
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
    lk, qty, fl = zip(*line_rows)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lk, pa.int64()),
                "l_quantity": pa.array(qty, pa.float64()),
                "l_returnflag": pa.array(fl, pa.string()),
            }
        ),
        str(d / "lineitem.parquet"),
    )


def test_semijoin_planted(ray_session, tmp_path):
    """Only lineitems of urgent orders (1, 3) survive; order 2's rows and
    the dangling key 9 are filtered; per-flag sums are exact hundredths."""
    from tokenzip.bloomjoin import q_lineitem_semijoin_bloom

    _write_tables(
        tmp_path,
        [(1, "1-URGENT"), (2, "5-LOW"), (3, "1-URGENT")],
        [
            (1, 2.0, "A"),
            (1, 3.5, "N"),
            (2, 100.0, "A"),
            (3, 4.25, "A"),
            (9, 7.0, "R"),
        ],
    )
    got = q_lineitem_semijoin_bloom(str(tmp_path))
    exp = pd.DataFrame(
        {
            "l_returnflag": ["A", "N"],
            "n_items": np.array([2, 1], dtype=np.int64),
            "sum_qty_hund": np.array([200 + 425, 350], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, exp)


def test_semijoin_empty_build(ray_session, tmp_path):
    from tokenzip.bloomjoin import q_lineitem_semijoin_bloom

    _write_tables(tmp_path, [(1, "5-LOW")], [(1, 2.0, "A")])
    got = q_lineitem_semijoin_bloom(str(tmp_path))
    assert len(got) == 0


def test_semijoin_corrupt_bitmap_raises(ray_session, tmp_path):
    """A zeroed bitmap makes a true member fail the bloom — the stage must
    refuse loudly (false negatives are impossible in a correct filter)."""
    from tokenzip.bloomjoin import _BloomProbeStage

    keys = np.array([5, 9], dtype=np.int64)
    words = np.zeros_like(bloom_build(keys))
    stage = _BloomProbeStage((words, keys))
    batch = pa.table(
        {
            "l_orderkey": pa.array([5], pa.int64()),
            "l_quantity": pa.array([1.0], pa.float64()),
            "l_returnflag": pa.array(["A"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="false negative"):
        stage(batch)


def test_semijoin_matches_oracle_on_testdata(ray_session):
    from tokenzip.bloomjoin import (
        lineitem_semijoin_bloom_sql,
        q_lineitem_semijoin_bloom,
    )

    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = q_lineitem_semijoin_bloom(SF).reset_index(drop=True)
    exp = con.sql(lineitem_semijoin_bloom_sql()).df()
    assert int(got["n_items"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
