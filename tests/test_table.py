"""Generic-table compression (tokenzip.table): bit-identical roundtrip on
real testdata tables, width coverage (int8..64 + timestamp), resume
semantics, the LEB128 size bound, and the null rejection contract."""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _roundtrip(paths, out, sort_cols):
    from tokenzip.table import compress_table, decompress_table

    shutil.rmtree(out, ignore_errors=True)
    tot = compress_table(paths, out)
    dec = decompress_table(out).to_pandas()
    orig = pd.concat([pq.read_table(p).to_pandas() for p in paths])
    dec = dec.sort_values(sort_cols).reset_index(drop=True)
    orig = orig.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(dec, orig)
    return tot


@pytest.mark.parametrize("tbl,key", [("events", "event_id"), ("orders", "o_orderkey")])
def test_table_roundtrip_bit_identical(ray_session, tmp_path, tbl, key):
    tot = _roundtrip(
        [os.path.join(SF, f"{tbl}.parquet")], str(tmp_path / tbl), [key]
    )
    # north-rule size bound covers the integer streams (string payloads are
    # outside the LEB128 oracle's domain); whole-table output still shrinks
    assert tot["tokens_bytes_out"] <= tot["leb128_bytes"]
    assert tot["bytes_out"] < tot["bytes_in"]
    assert tot["n_rows"] > 0


def test_table_roundtrip_all_widths(ray_session, tmp_path):
    """Planted table covering every encodable width + negatives + a
    passthrough float/string/bool mix."""
    rng = np.random.default_rng(7)
    n = 5_000
    t = pa.table(
        {
            "a8": pa.array(rng.integers(-128, 128, n, dtype=np.int8)),
            "a16": pa.array(rng.integers(-(2**15), 2**15, n, dtype=np.int16)),
            "a32": pa.array(rng.integers(-(2**31), 2**31, n, dtype=np.int32)),
            "a64": pa.array(rng.integers(-(2**62), 2**62, n, dtype=np.int64)),
            "ts": pa.array(
                np.sort(rng.integers(0, 2**48, n)), pa.timestamp("us")
            ),
            "f": pa.array(rng.random(n)),
            "s": pa.array([f"s{i%97}" for i in range(n)]),
            "b": pa.array((np.arange(n) % 3 == 0)),
        }
    )
    src = tmp_path / "widths.parquet"
    pq.write_table(t, src)
    _roundtrip([str(src)], str(tmp_path / "out"), ["a64", "a32"])


def test_table_compress_resume_skips_done(ray_session, tmp_path):
    """Second compress_table over the same inputs re-encodes nothing and
    totals are unchanged (fragment-level exact resume)."""
    from tokenzip.table import compress_table

    paths = [os.path.join(SF, "orders.parquet")]
    out = str(tmp_path / "resume")
    t1 = compress_table(paths, out)
    mtimes = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(out)
        for f in fs
    }
    t2 = compress_table(paths, out)
    assert t1 == t2
    mtimes2 = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(out)
        for f in fs
    }
    assert {k: v for k, v in mtimes.items() if k.endswith(".parquet")} == {
        k: v for k, v in mtimes2.items() if k.endswith(".parquet")
    }


def test_table_reserved_columns_rejected(ray_session, tmp_path):
    """'frag'/'path' collide with the pipeline's provenance columns and must
    be refused loudly, never silently dropped."""
    from tokenzip.errors import ChunkFormatError
    from tokenzip.table import compress_table

    for reserved in ("frag", "path"):
        t = pa.table({"x": pa.array([1, 2], pa.int64()),
                      reserved: pa.array(["a", "b"])})
        src = tmp_path / f"{reserved}.parquet"
        pq.write_table(t, src)
        with pytest.raises(ChunkFormatError, match=reserved):
            compress_table([str(src)], str(tmp_path / f"out_{reserved}"))


def test_table_null_int_rejected(ray_session, tmp_path):
    from tokenzip.errors import ChunkFormatError
    from tokenzip.table import compress_table

    t = pa.table({"x": pa.array([1, None, 3], pa.int64())})
    src = tmp_path / "nulls.parquet"
    pq.write_table(t, src)
    with pytest.raises(Exception) as ei:
        compress_table([str(src)], str(tmp_path / "out"))
    assert "null" in str(ei.value).lower()


def test_table_events_oracle(ray_session):
    from tokenzip.table import q_table_roundtrip_events, table_roundtrip_events_sql

    got = q_table_roundtrip_events(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    odf = con.execute(table_roundtrip_events_sql()).fetchdf()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_table_sink_compaction_bit_identical(ray_session, tmp_path):
    """compact() also serves generic-table sinks (no chunk_id/source_top
    columns: sort keys and checksum degrade gracefully, the n_chunks audit
    still gates)."""
    from tokenzip.pipeline import compact
    from tokenzip.table import compress_table, decompress_table

    src = str(tmp_path / "src")
    compress_table([f"{SF}/events.parquet"], src)
    dst = str(tmp_path / "dst")
    res = compact(src, dst, target_bytes=1 << 20)
    assert res["n_chunks"] >= 1
    a = decompress_table(src).to_pandas().sort_values("event_id").reset_index(drop=True)
    b = decompress_table(dst).to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
