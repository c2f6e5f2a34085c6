"""Replication self-oracle: factor-N tiling preserves distributions exactly,
so additive aggregates scale by exactly N while averages are unchanged."""

import os

import duckdb
import numpy as np
import pyarrow.parquet as pq

from tokenzip.scale import replicate_tables

SF = "/root/testdata/sf0.001"


def test_replicate_counts_pks_fks(tmp_path):
    dst = str(tmp_path / "x2")
    counts = replicate_tables(SF, dst, 2)
    for table, n in counts.items():
        src_n = pq.read_metadata(os.path.join(SF, f"{table}.parquet")).num_rows
        expect = src_n if table in ("region", "nation") else 2 * src_n
        assert n == expect, table
        assert pq.read_metadata(os.path.join(dst, f"{table}.parquet")).num_rows == n

    # PKs stay unique after remap
    for table, col in [
        ("orders", "o_orderkey"), ("customer", "c_custkey"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
    ]:
        k = pq.read_table(os.path.join(dst, f"{table}.parquet"), columns=[col])[
            col
        ].to_numpy(zero_copy_only=False)
        assert len(np.unique(k)) == len(k), table

    # FK edges stay inside the corpus (lineitem -> orders, events -> custkey)
    con = duckdb.connect()
    n_orphan = con.sql(
        f"""
        SELECT COUNT(*) FROM read_parquet('{dst}/lineitem.parquet') l
        LEFT JOIN read_parquet('{dst}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        """
    ).fetchone()[0]
    src_orphan = con.sql(
        f"""
        SELECT COUNT(*) FROM read_parquet('{SF}/lineitem.parquet') l
        LEFT JOIN read_parquet('{SF}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        """
    ).fetchone()[0]
    assert n_orphan == 2 * src_orphan  # replication adds no NEW orphans


def test_replicate_scales_aggregates_exactly(ray_session, tmp_path):
    """The factor-N self-oracle: additive aggregates at 2x are exactly 2x the
    source's; per-group averages are bit-unchanged. Checked through the REAL
    engine (q_pricing_summary), not just SQL."""
    from tokenzip.relational import q_pricing_summary

    dst = str(tmp_path / "x2")
    replicate_tables(SF, dst, 2)
    base = q_pricing_summary(SF)
    scaled = q_pricing_summary(dst)
    assert list(base.columns) == list(scaled.columns)
    key = ["l_returnflag", "l_linestatus"]
    b = base.set_index(key).sort_index()
    s = scaled.set_index(key).sort_index()
    assert list(b.index) == list(s.index)
    # every non-key pricing_summary column is an additive exact-int measure
    for c in b.columns:
        assert (s[c] == 2 * b[c]).all(), c


def test_replicate_sharded_matches_single_file(ray_session, tmp_path):
    """shard=True (one part file per replica, parallel Ray reads) is
    answer-identical to the single-file layout through the engine, and the
    shard-transparent metadata helpers count the same rows."""
    from tokenzip.relational import _row_count, q_pricing_summary

    one = str(tmp_path / "one")
    sh = str(tmp_path / "sh")
    replicate_tables(SF, one, 2)
    counts = replicate_tables(SF, sh, 2, shard=True)
    li = os.path.join(sh, "lineitem.parquet")
    assert os.path.isdir(li)
    assert len([f for f in os.listdir(li) if f.endswith(".parquet")]) == 2
    assert _row_count(li) == counts["lineitem"] == 2 * pq.read_metadata(
        os.path.join(SF, "lineitem.parquet")
    ).num_rows

    import pandas as pd

    pd.testing.assert_frame_equal(q_pricing_summary(one), q_pricing_summary(sh))
