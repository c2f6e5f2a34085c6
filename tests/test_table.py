"""Generic-table compression (tokenzip.table): bit-identical roundtrip on
real testdata tables, width coverage (int8..64 + timestamp), resume
semantics, the LEB128 size bound, and nullable-column bitmaps."""

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


def test_table_nullable_columns_roundtrip(ray_session, tmp_path):
    """Nulls in every encodable family (int, timestamp, float, string) ride
    a validity bitmap beside the dense codec stream and restore exactly —
    including an all-null column and a null-free control."""
    rng = np.random.default_rng(13)
    n = 2_000
    null_at = rng.random(n) < 0.3

    def _mask(arr):
        return pa.array(
            np.asarray(arr), mask=null_at
        )

    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),  # null-free control
            "xi": _mask(rng.integers(-(2**40), 2**40, n)),
            "xs": pa.array(
                [None if m else f"s{i % 43}" for i, m in enumerate(null_at)]
            ),
            "xf": _mask(np.round(rng.random(n) * 100) / 2.0),
            "xt": pa.array(
                np.sort(rng.integers(0, 2**40, n)), pa.timestamp("us")
            ),
            "all_null": pa.array([None] * n, pa.int64()),
        }
    )
    # null timestamps too (replace column with masked variant)
    ts_vals = t["xt"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    t = t.set_column(
        4, "xt", pa.array(ts_vals, pa.timestamp("us"), mask=null_at)
    )
    src = str(tmp_path / "nulls.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "out")
    from tokenzip.table import compress_table, decompress_table

    compress_table([src], out)
    back = (
        decompress_table(out).to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, t.to_pandas())


def test_table_where_over_nullable_column(ray_session, tmp_path):
    """where on a nullable column: NULL never matches the range (SQL
    BETWEEN semantics) and the zone map is computed over non-null values."""
    from tokenzip.table import compress_table, decompress_table

    n = 500
    vals = np.arange(n, dtype=np.int64)
    mask = (vals % 5) == 0
    t = pa.table(
        {
            "k": pa.array(vals),
            "x": pa.array(vals * 10, mask=mask),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "sink")
    compress_table([src], out)
    got = (
        decompress_table(out, where=("x", 1000, 2000))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    want = df[(df["x"] >= 1000) & (df["x"] <= 2000)].reset_index(drop=True)
    assert want["x"].notna().all() and len(want) > 0
    # pandas floats the nullable source column; survivors are null-free ints
    pd.testing.assert_frame_equal(got, want.astype({"x": "int64"}))


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


def test_float_codec_bit_exact_and_regimes():
    """XOR-delta float family: bit-exact on every payload (NaN bits, -0.0,
    inf), xorf wins on smooth series, xorf_bswap on few-significant-bit
    values, raw floor on random doubles."""
    from tokenzip.codecs.core import (
        decode_float_column,
        encode_float_column,
        unpack_blob,
    )

    rng = np.random.default_rng(3)
    cases = {
        "random": (rng.random(4000) * 1e6, "rawf"),
        "smooth": (np.cumsum(rng.random(4000) * 1e-9) + 1.0, "xorf"),
        # 1/512 granularity: few significant bits but NOT a short decimal
        # (needs e=9 > _DECF_MAX_E), so the byteswapped xor regime wins
        "b512": (np.round(rng.random(4000) * 5120) / 512.0, "xorf_bswap"),
        # two-decimal prices promote exactly: ALP-style decf
        "prices": (np.round(rng.random(4000) * 500, 2), "decf"),
    }
    for name, (v, want) in cases.items():
        blob = encode_float_column(v)
        codec, _, _ = unpack_blob(blob)
        assert codec == want, (name, codec)
        out = decode_float_column(blob)
        assert np.array_equal(v.view(np.uint64), out.view(np.uint64))
        if want != "rawf":
            assert len(blob) < v.nbytes / 2
    special = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 5.0])
    out = decode_float_column(encode_float_column(special))
    assert np.array_equal(special.view(np.uint64), out.view(np.uint64))


def test_table_roundtrip_double_column(ray_session, tmp_path):
    """A generic table with a double column routes through the float codec
    (not passthrough) and restores bit-identically."""
    import glob as _g

    from tokenzip.table import compress_table, decompress_table

    n = 500
    rng = np.random.default_rng(9)
    tbl = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "price": pa.array(np.round(rng.random(n) * 1000) / 4.0),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "out")
    compress_table([src], out)
    files = _g.glob(out + "/chunks/**/*.parquet", recursive=True)
    ct = pq.read_table(files[0])
    row = ct.to_pylist()[0]
    assert "price" in row["enc_names"]
    assert row["enc_codecs"][row["enc_names"].index("price")] == "flt"
    assert not any(c.startswith("p_") and "price" in c for c in ct.column_names)
    back = decompress_table(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert np.array_equal(
        back["price"].to_numpy().view(np.uint64),
        tbl["price"].to_numpy().view(np.uint64),
    )


def test_float32_codec_and_table_roundtrip(ray_session, tmp_path):
    from tokenzip.codecs.core import decode_float_column, encode_float_column
    from tokenzip.table import compress_table, decompress_table

    rng = np.random.default_rng(11)
    v = (np.round(rng.random(1000).astype(np.float32) * 100) / 4).astype(np.float32)
    out = decode_float_column(encode_float_column(v, 32))
    assert out.dtype == np.float32
    assert np.array_equal(v.view(np.uint32), out.view(np.uint32))

    tbl = pa.table(
        {"k": pa.array(np.arange(1000, dtype=np.int64)), "f": pa.array(v)}
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    dst = str(tmp_path / "out")
    compress_table([src], dst)
    back = decompress_table(dst).to_pandas().sort_values("k").reset_index(drop=True)
    assert back["f"].dtype == np.float32
    assert np.array_equal(back["f"].to_numpy().view(np.uint32), v.view(np.uint32))


def _zone_surviving(out, col, lo, hi):
    """Chunk rows surviving the zone-map predicate vs total (direct
    parquet-level evidence the pushdown prunes before payload reads)."""
    import glob as _g

    files = _g.glob(out + "/chunks/**/*.parquet", recursive=True)
    total = kept = 0
    for f in files:
        t = pq.read_table(f, columns=[f"zmin_{col}", f"zmax_{col}"])
        zmin = t[f"zmin_{col}"].to_numpy()
        zmax = t[f"zmax_{col}"].to_numpy()
        total += len(zmin)
        kept += int(((zmin <= hi) & (zmax >= lo)).sum())
    return kept, total


def test_table_where_pushdown_exact_and_prunes(ray_session, tmp_path):
    """Zone-map pushdown: disjoint per-file key ranges -> most chunks are
    pruned by the parquet predicate; surviving rows match an exact
    row-level filter of the original table, all columns intact."""
    from tokenzip.table import compress_table, decompress_table

    rng = np.random.default_rng(5)
    paths = []
    for i in range(4):
        n = 400
        t = pa.table(
            {
                "k": pa.array(np.arange(i * n, (i + 1) * n, dtype=np.int64)),
                "v": pa.array(rng.integers(0, 1000, n, dtype=np.int32)),
                "s": pa.array([f"x{j % 13}" for j in range(n)]),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "sink")
    compress_table(paths, out)

    lo, hi = 600, 900  # inside file 1 + start of file 2
    kept, total = _zone_surviving(out, "k", lo, hi)
    assert kept < total and kept >= 1  # pruning is real, not vacuous

    got = (
        decompress_table(out, where=("k", lo, hi))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    orig = pd.concat([pq.read_table(p).to_pandas() for p in paths])
    want = (
        orig[(orig["k"] >= lo) & (orig["k"] <= hi)]
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_table_where_timestamp_units(ray_session, tmp_path):
    """where on a timestamp column filters in the column's storage unit
    (epoch in its own resolution), exact at the boundaries."""
    from tokenzip.table import compress_table, decompress_table

    n = 1000
    ts = np.sort(np.random.default_rng(2).integers(10**6, 10**9, n))
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("ms")),
            "k": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "sink")
    compress_table([src], out)
    lo, hi = int(ts[200]), int(ts[700])
    got = (
        decompress_table(out, where=("ts", lo, hi))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    mask = (ts >= lo) & (ts <= hi)
    want = t.to_pandas()[mask].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_table_where_unzoned_column_raises(ray_session, tmp_path):
    """where on a column without a zone map (strings aren't zone-mapped)
    fails loudly and names the zoned columns."""
    from tokenzip.errors import ChunkFormatError
    from tokenzip.table import compress_table, decompress_table

    t = pa.table(
        {
            "k": pa.array(np.arange(50, dtype=np.int64)),
            "s": pa.array([f"v{i}" for i in range(50)]),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "sink")
    compress_table([src], out)
    with pytest.raises(ChunkFormatError, match="zone map.*'k'"):
        decompress_table(out, where=("s", 0, 1))


def test_table_where_events_oracle(ray_session):
    from tokenzip.table import q_table_where_events, table_where_events_sql

    got = q_table_where_events(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    odf = con.execute(table_where_events_sql()).fetchdf()
    assert len(odf) > 0 and got["n_rows"].sum() > 0
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_cli_table_decompress_where(ray_session, tmp_path, capsys):
    """CLI: table-compress then table-decompress --where COL:LO:HI restores
    exactly the in-range rows."""
    from tokenzip.__main__ import main

    n = 300
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array((np.arange(n) * 7 % 101).astype(np.int32)),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    sink = str(tmp_path / "sink")
    restored = str(tmp_path / "restored")
    assert main(["table-compress", src, sink]) == 0
    assert main(["table-decompress", sink, restored, "--where", "k:50:99"]) == 0
    got = (
        pq.read_table(restored).to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = t.to_pandas().iloc[50:100].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_table_nulls_oracle(ray_session):
    from tokenzip.table import q_table_nulls_roundtrip, table_nulls_roundtrip_sql

    got = q_table_nulls_roundtrip(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    odf = con.execute(table_nulls_roundtrip_sql()).fetchdf()
    assert got["n_null_props"].sum() > 0 and got["n_null_uid"].sum() > 0
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_table_uint_columns_roundtrip(ray_session, tmp_path):
    """Unsigned columns go through the codec path (not passthrough):
    u8/u16/u32 widened losslessly, u64 via int64 bitcast — exact even for
    values >= 2^63 and with nulls."""
    import glob as _g

    from tokenzip.table import compress_table, decompress_table

    rng = np.random.default_rng(17)
    n = 3_000
    m = rng.random(n) < 0.2
    big = rng.integers(0, 2**64, n, dtype=np.uint64)
    big[: n // 2] = big[: n // 2] | np.uint64(1 << 63)  # force >= 2^63
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "u8": pa.array(rng.integers(0, 256, n, dtype=np.uint8)),
            "u16": pa.array(rng.integers(0, 2**16, n, dtype=np.uint16)),
            "u32": pa.array(
                rng.integers(0, 2**32, n, dtype=np.uint32), mask=m
            ),
            "u64": pa.array(big),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "sink")
    compress_table([src], out)
    files = _g.glob(out + "/chunks/**/*.parquet", recursive=True)
    row = pq.read_table(files[0]).to_pylist()[0]
    for c in ("u8", "u16", "u32", "u64"):
        assert c in row["enc_names"], c  # codec path, not passthrough
    back = (
        decompress_table(out).to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, t.to_pandas())
    # where on a uint32 column (natural ordering below 2^63)
    got = (
        decompress_table(out, where=("u32", 0, 2**31))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    want = df[(df["u32"] >= 0) & (df["u32"] <= 2**31)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({"u32": "uint32"}))


def test_string_zone_map_pushdown(ray_session, tmp_path):
    """String where= prunes chunks on smin_/smax_ (value-clustered sink),
    row-filters exactly, and NULL never matches."""
    from tokenzip.table import compress_table, decompress_table

    # two fragments value-clustered by category: chunk ranges don't overlap
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "cat": pa.array(["apple", "apple", None], pa.string()),
            }
        ),
        p1,
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([4, 5], pa.int64()),
                "cat": pa.array(["zebra", "zebra"], pa.string()),
            }
        ),
        p2,
    )
    out = str(tmp_path / "sink")
    compress_table([p1, p2], out, concurrency=2)

    # equality: lo == hi
    df = (
        decompress_table(out, where=("cat", "apple", "apple"))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(df["k"]) == [1, 2]  # NULL row (k=3) never matches
    assert set(df["cat"]) == {"apple"}

    # the parquet predicate really prunes the zebra chunk
    import glob as _g

    total = kept = 0
    for f in _g.glob(os.path.join(out, "chunks", "**", "*.parquet"), recursive=True):
        t = pq.read_table(f, columns=["smin_cat", "smax_cat"])
        for lo, hi in zip(t["smin_cat"].to_pylist(), t["smax_cat"].to_pylist()):
            total += 1
            kept += int(lo <= "apple" <= hi)
    assert total >= 2 and kept < total

    # range across both
    df2 = decompress_table(out, where=("cat", "apple", "zebra")).to_pandas()
    assert sorted(df2["k"]) == [1, 2, 4, 5]

    # mixed bound types refused
    with pytest.raises(ValueError, match="ints or both strings"):
        decompress_table(out, where=("cat", "apple", 5)).to_pandas()

    # unknown column names the available zone maps
    from tokenzip.errors import ChunkFormatError

    with pytest.raises(ChunkFormatError, match="zone map"):
        decompress_table(out, where=("nope", "a", "b")).to_pandas()


def test_table_where_strings_oracle(ray_session):
    from tokenzip.table import q_table_where_strings, table_where_strings_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    got = q_table_where_strings(SF).reset_index(drop=True)
    exp = con.sql(table_where_strings_sql()).df()
    assert len(got) >= 2  # error + purchase exist at every sf
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_decf_promotion_rules():
    """decf edge contract: -0.0 in a decimal column rejects the promotion
    (int 0 can't reproduce the sign bit); values past 2^53 reject; NaN/inf
    reject; the stored e is the SMALLEST exact one."""
    from tokenzip.codecs.core import (
        _try_decimal,
        decode_float_column,
        encode_float_column,
        unpack_blob,
    )

    assert _try_decimal(np.array([1.25, -0.0]), 64) is None
    assert _try_decimal(np.array([2.0**53, 1.0]), 64) is None
    assert _try_decimal(np.array([np.nan, 1.0]), 64) is None
    e, ints, idx, bits = _try_decimal(np.array([1.0, 2.0, 3.0]), 64)
    assert e == 0 and list(ints) == [1, 2, 3] and idx is None
    e, ints, idx, bits = _try_decimal(np.array([0.07, 1.23]), 64)
    assert e == 2 and list(ints) == [7, 123] and idx is None
    # full roundtrip through the packed blob keeps bit equality (tiny
    # columns correctly stay rawf: two blob headers outweigh the savings)
    v = np.tile(np.array([0.01, 490.02, 0.0, 123.45]), 250)
    blob = encode_float_column(v)
    assert unpack_blob(blob)[0] == "decf"
    assert np.array_equal(decode_float_column(blob).view(np.uint64), v.view(np.uint64))
    assert len(blob) < v.nbytes / 2


def test_decf_exceptions_patch_raw_bits():
    """ALP-style exceptions: a price column with <=5% stragglers (NaN,
    -0.0, long-fraction noise) still promotes; straggler bit patterns
    restore exactly; >5% contamination rejects the promotion."""
    from tokenzip.codecs.core import (
        _try_decimal,
        decode_float_column,
        encode_float_column,
        unpack_blob,
    )

    rng = np.random.default_rng(5)
    v = np.round(rng.uniform(0, 500, 5000), 2)
    v[::97] = np.nan
    v[1::211] = -0.0
    v[2::307] = 0.1234567890123
    blob = encode_float_column(v, 64)
    assert unpack_blob(blob)[0] == "decf"
    back = decode_float_column(blob)
    assert np.array_equal(back.view(np.uint64), v.view(np.uint64))
    assert len(blob) < v.nbytes / 2

    w = np.round(rng.uniform(0, 500, 1000), 2)
    w[: int(0.2 * len(w))] = np.nan
    assert _try_decimal(w, 64) is None

    # clean columns keep the single-stream layout (no exception cost)
    e, ints, idx, bits = _try_decimal(np.round(rng.uniform(0, 9, 1000), 1), 64)
    assert idx is None and e == 1


def test_table_projection_decode_skip(ray_session, tmp_path):
    """decompress_table(columns=...) equals the projected full decode;
    where-filter columns decode for the filter and drop from the output;
    unknown names fail loudly."""
    import pandas as pd

    from tokenzip.table import compress_table, decompress_table

    out = str(tmp_path / "sink")
    compress_table(["/root/testdata/sf0.001/events.parquet"], out)
    full = decompress_table(out).to_pandas().sort_values("event_id").reset_index(drop=True)
    proj = (
        decompress_table(out, columns=["event_id", "value"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(proj.columns) == ["event_id", "value"]
    pd.testing.assert_frame_equal(proj, full[["event_id", "value"]])
    w = decompress_table(out, where=("event_id", 10, 50), columns=["value"]).to_pandas()
    exp = full[(full.event_id >= 10) & (full.event_id <= 50)][["value"]].reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(w.reset_index(drop=True), exp)
    with pytest.raises(Exception, match="unknown table columns"):
        decompress_table(out, columns=["nope"]).materialize()


def test_list_column_roundtrip_all_shapes(ray_session, tmp_path):
    """Encoded list columns (int64/large_list<float>/list<int32> with
    top-level nulls, element nulls, and empty lists) roundtrip
    bit-identically through the chunk sink."""
    from tokenzip.table import compress_table, decompress_table

    rng = np.random.default_rng(7)
    n = 400
    lens = rng.integers(0, 9, n)
    lens[::17] = 0  # empty lists
    ne = int(lens.sum())
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    li = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), pa.int32()),
        pa.array(rng.integers(-(10**6), 10**12, ne), pa.int64()),
    )
    null_mask = rng.random(n) < 0.1
    li = pa.compute.if_else(pa.array(~null_mask), li, pa.nulls(n, li.type))
    lf = pa.LargeListArray.from_arrays(
        pa.array(offs, pa.int64()),
        pa.array(rng.normal(size=ne).astype(np.float32), pa.float32()),
    )
    ev = pa.array(rng.integers(0, 100, ne), pa.int32())
    emask = rng.random(ne) < 0.05
    ev = pa.compute.if_else(pa.array(~emask), ev, pa.nulls(ne, pa.int32()))
    le = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), pa.int32()), ev
    )
    t = pa.table(
        {"id": pa.array(np.arange(n)), "li": li, "lf": lf, "le": le}
    )
    src = str(tmp_path / "lists.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "sink")
    compress_table([src], out)
    dec = (
        decompress_table(out)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    orig = t.to_pandas()
    pd.testing.assert_frame_equal(dec, orig)
    # the codec plan actually routed the lists through 'lst', not passthrough
    chunks = pq.read_table(
        os.path.join(out, "chunks"), columns=["enc_codecs", "enc_names"]
    )
    plan = dict(
        zip(chunks["enc_names"][0].as_py(), chunks["enc_codecs"][0].as_py())
    )
    assert plan["li"] == plan["lf"] == plan["le"] == "lst"


def test_fixed_dim_list_lengths_cost_nothing(ray_session, tmp_path):
    """Fixed-dimension embedding lists: the lengths stream RLEs to a few
    bytes; the sink roundtrips the embeddings table bit-identically."""
    from tokenzip.table import compress_table, decompress_table

    src = os.path.join(SF, "embeddings.parquet")
    out = str(tmp_path / "emb")
    compress_table([src], out)
    dec = (
        decompress_table(out)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    orig = (
        pq.read_table(src).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert dec["vec_id"].equals(orig["vec_id"])
    assert dec["label"].equals(orig["label"])
    for a, b in zip(dec["embedding"], orig["embedding"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_exact_sum_i64_extremes():
    from tokenzip.table import _exact_sum_i64

    cases = [
        np.array([], np.int64),
        np.array([0], np.int64),
        np.array([np.iinfo(np.int64).max] * 1000, np.int64),
        np.array([np.iinfo(np.int64).min] * 1000, np.int64),
        np.array([np.iinfo(np.int64).max, np.iinfo(np.int64).min, -1, 1], np.int64),
    ]
    rng = np.random.default_rng(3)
    cases.append(rng.integers(-(2**62), 2**62, 50_000))
    for v in cases:
        assert _exact_sum_i64(v) == sum(int(x) for x in v)


def test_table_stats_metadata_only(ray_session, tmp_path):
    """table_stats answers COUNT/MIN/MAX/SUM from chunk metadata and agrees
    with the row-level truth, including null accounting."""
    from tokenzip.table import compress_table, table_stats

    rng = np.random.default_rng(11)
    n = 5000
    vals = rng.integers(-(10**9), 10**9, n)
    mask = rng.random(n) < 0.2
    col = pa.array(vals, pa.int64(), mask=mask)
    t = pa.table({"a": col, "b": pa.array(np.arange(n), pa.int64())})
    src = str(tmp_path / "t.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "sink")
    compress_table([src], out)
    st = table_stats(out).set_index("column")
    dense = vals[~mask]
    assert st.loc["a", "n_rows"] == n
    assert st.loc["a", "n_null"] == int(mask.sum())
    assert st.loc["a", "min_v"] == int(dense.min())
    assert st.loc["a", "max_v"] == int(dense.max())
    assert st.loc["a", "sum_v"] == sum(int(x) for x in dense)
    assert st.loc["b", "sum_v"] == n * (n - 1) // 2
    with pytest.raises(Exception, match="aggregate metadata"):
        table_stats(out, columns=["nope"])


def test_table_agg_pushdown_oracle(ray_session):
    from tokenzip.table import q_table_agg_pushdown, table_agg_pushdown_sql

    mine = q_table_agg_pushdown(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    oracle = con.execute(table_agg_pushdown_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), oracle.reset_index(drop=True)
    )


def test_table_embeddings_oracle(ray_session):
    from tokenzip.table import (
        q_table_roundtrip_embeddings,
        table_roundtrip_embeddings_sql,
    )

    mine = q_table_roundtrip_embeddings(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    oracle = con.execute(table_roundtrip_embeddings_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), oracle.reset_index(drop=True)
    )


def test_recode_table_bit_identical_and_resumes(ray_session, tmp_path):
    """Generic-table migration: decode of the recoded sink equals decode
    of the source sink row-for-row; resume is a no-op; lineage recorded."""
    from tokenzip.table import compress_table, decompress_table, recode_table

    src = "/root/testdata/sf0.001/events.parquet"
    a_dir = str(tmp_path / "a")
    b_dir = str(tmp_path / "b")
    t_a = compress_table([src], a_dir, concurrency=2)
    t_b = recode_table(a_dir, b_dir)
    assert t_b["n_rows"] == t_a["n_rows"]
    a = (
        decompress_table(a_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        decompress_table(b_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert recode_table(a_dir, b_dir) == t_b  # resume no-op
    from tokenzip.manifest import Manifest

    stats = list(Manifest(b_dir).data["fragments"].values())
    assert stats and all(s.get("recoded_from") == a_dir for s in stats)


def test_delete_rows_three_way_classification(ray_session, tmp_path):
    """Value-clustered 4-shard sink, delete shard 2's whole value range:
    shard 2's chunks drop on METADATA (fragment present, zero rows),
    shards 0/1/3 byte-copy file-for-file, and a straddling boundary chunk
    rewrites exactly."""
    import numpy as np

    from tokenzip.table import compress_table, decompress_table, delete_rows

    paths = []
    for s in range(4):
        vals = np.arange(s * 1000, s * 1000 + 400, dtype=np.int64)
        t = pa.table(
            {
                "k": pa.array(vals),
                "v": pa.array(vals * 7),
                "tag": pa.array([f"s{s}"] * 400),
            }
        )
        p = str(tmp_path / f"part-{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    src = str(tmp_path / "sink")
    compress_table(paths, src, resume=False)

    dst = str(tmp_path / "deleted")
    # covers ALL of shard 2 (2000..2399) and nothing else
    t = delete_rows(src, dst, ("k", 2000, 2399), resume=False)
    assert t["n_rows_deleted"] == 400
    got = decompress_table(dst).to_pandas()
    assert len(got) == 1200 and not ((got["k"] >= 2000) & (got["k"] <= 2399)).any()

    # clean fragments byte-copied
    import os

    def fragbytes(sink):
        out = {}
        cd = os.path.join(sink, "chunks")
        for d in sorted(os.listdir(cd)):
            if d.startswith("frag="):
                fd = os.path.join(cd, d)
                out[d] = {
                    n: open(os.path.join(fd, n), "rb").read()
                    for n in sorted(os.listdir(fd))
                    if n.endswith(".parquet")
                }
        return out

    sb, db = fragbytes(src), fragbytes(dst)
    changed = [f for f in sb if db.get(f) != sb[f]]
    # only the shard-2 fragment may change (its chunks dropped whole)
    assert len(changed) == 1, changed
    # the dropped fragment holds no chunk rows in the new sink
    assert sum(len(v) for v in db.get(changed[0], {}).values()) == 0 or \
        changed[0] not in db or not db[changed[0]]

    # straddling case: partial overlap rewrites, keeps the complement
    dst2 = str(tmp_path / "deleted2")
    t2 = delete_rows(src, dst2, ("k", 2200, 3199), resume=False)
    assert t2["n_rows_deleted"] == 400  # 2200-2399 and 3000-3199
    got2 = decompress_table(dst2).to_pandas()
    assert len(got2) == 1200
    assert not ((got2["k"] >= 2200) & (got2["k"] <= 3199)).any()


def test_delete_rows_nulls_survive(ray_session, tmp_path):
    """NULL never matches BETWEEN: null-k rows survive any k deletion even
    when the chunk's non-null range is fully contained."""
    from tokenzip.table import compress_table, decompress_table, delete_rows

    t = pa.table(
        {
            "k": pa.array([1, 2, None, 3, None], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    src = str(tmp_path / "sink")
    compress_table([p], src, resume=False)
    dst = str(tmp_path / "deleted")
    tt = delete_rows(src, dst, ("k", 1, 3), resume=False)
    assert tt["n_rows_deleted"] == 3
    got = decompress_table(dst).to_pandas()
    assert sorted(got["v"].tolist()) == [30, 50]
    assert got["k"].isna().all()


def test_delete_rows_refuses_unzoned_column(ray_session, tmp_path):
    from tokenzip.errors import ChunkFormatError
    from tokenzip.table import compress_table, delete_rows

    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    src = str(tmp_path / "sink")
    compress_table([p], src, resume=False)
    with pytest.raises(ChunkFormatError, match="zone map"):
        delete_rows(src, str(tmp_path / "d"), ("nope", 1, 2), resume=False)


def test_drop_column_zero_decode_and_refusals(ray_session, tmp_path):
    """Dropping a column removes its blobs/zone scalars but leaves every
    other column bit-identical; dropping an unknown or the only column
    refuses loudly; the dropped column's zone pushdown disappears."""
    import numpy as np

    from tokenzip.errors import ChunkFormatError
    from tokenzip.table import compress_table, decompress_table, drop_column

    t = pa.table(
        {
            "a": pa.array(np.arange(500, dtype=np.int64)),
            "b": pa.array(np.arange(500, dtype=np.int64) * 3),
            "s": pa.array([f"v{i%7}" for i in range(500)]),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    src = str(tmp_path / "sink")
    compress_table([p], src, resume=False)
    dst = str(tmp_path / "dropped")
    tt = drop_column(src, dst, "b", resume=False)
    assert tt["n_rows"] == 500
    got = decompress_table(dst).to_pandas().sort_values("a").reset_index(drop=True)
    assert list(sorted(got.columns)) == ["a", "s"]
    assert (got["a"].values == np.arange(500)).all()
    assert (got["s"].values == np.array([f"v{i%7}" for i in range(500)])).all()
    # zone scalars of the dropped column are gone from the chunk schema
    import glob

    f = glob.glob(os.path.join(dst, "chunks", "frag=*", "*.parquet"))[0]
    names = pq.ParquetFile(f).schema_arrow.names
    assert not any(n.endswith("_b") for n in names if n.startswith(("zmin", "zmax", "znn", "zsum")))
    with pytest.raises(ChunkFormatError, match="zone map"):
        decompress_table(dst, where=("b", 1, 2))
    with pytest.raises(Exception):
        drop_column(src, str(tmp_path / "x"), "nope", resume=False)
    one = str(tmp_path / "one")
    drop_column(dst, one, "s", resume=False)  # down to a single column ok
    # in-task refusals surface Ray-wrapped; match on the message
    with pytest.raises(Exception, match="only column"):
        drop_column(one, str(tmp_path / "y"), "a", resume=False)


def test_rename_column_zero_decode(ray_session, tmp_path):
    import numpy as np

    from tokenzip.table import (
        compress_table,
        decompress_table,
        rename_column,
    )

    t = pa.table(
        {
            "a": pa.array(np.arange(100, dtype=np.int64)),
            "s": pa.array([f"v{i%5}" for i in range(100)]),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    src = str(tmp_path / "sink")
    compress_table([p], src, resume=False)
    dst = str(tmp_path / "renamed")
    rename_column(src, dst, "a", "ident", resume=False)
    got = decompress_table(dst).to_pandas()
    assert sorted(got.columns) == ["ident", "s"]
    assert (np.sort(got["ident"].values) == np.arange(100)).all()
    # renamed zone map follows the new name
    got2 = decompress_table(dst, where=("ident", 10, 19)).to_pandas()
    assert len(got2) == 10
    with pytest.raises(Exception, match="already exists"):
        rename_column(src, str(tmp_path / "x"), "a", "s", resume=False)


def test_add_column_zero_decode(ray_session, tmp_path):
    """ADD COLUMN DEFAULT synthesizes the new column from (n_rows, value)
    alone: constants decode everywhere, NULL defaults decode all-NULL,
    the new column's zone maps answer pushdowns exactly, and existing
    columns stay bit-identical; an existing name or unsupported dtype
    refuses loudly."""
    import numpy as np

    from tokenzip.table import add_column, compress_table, decompress_table

    t = pa.table(
        {
            "a": pa.array(np.arange(400, dtype=np.int64)),
            "s": pa.array([f"v{i%7}" for i in range(400)]),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    src = str(tmp_path / "sink")
    compress_table([p], src, resume=False)

    dst = str(tmp_path / "addint")
    tt = add_column(src, dst, "flag", "int32", 7, resume=False)
    assert tt["n_rows"] == 400
    got = decompress_table(dst).to_pandas().sort_values("a").reset_index(drop=True)
    assert sorted(got.columns) == ["a", "flag", "s"]
    assert str(got["flag"].dtype) == "int32" and (got["flag"].values == 7).all()
    assert (got["a"].values == np.arange(400)).all()
    assert (got["s"].values == np.array([f"v{i%7}" for i in range(400)])).all()
    # the synthesized zone map prunes exactly
    assert len(decompress_table(dst, where=("flag", 7, 7)).to_pandas()) == 400
    assert len(decompress_table(dst, where=("flag", 8, 9)).to_pandas()) == 0
    # aggregate metadata answers SUM/COUNT without decode
    from tokenzip.table import table_stats

    st = table_stats(dst, columns=["flag"])
    row = st.loc[st["column"] == "flag"].iloc[0]
    assert int(row["n_null"]) == 0 and int(row["sum_v"]) == 2800
    assert int(row["min_v"]) == 7 and int(row["max_v"]) == 7

    # string constant + chained evolution over an already-evolved sink
    dst2 = str(tmp_path / "addstr")
    add_column(dst, dst2, "lang", "string", "en", resume=False)
    g = decompress_table(dst2).to_pandas()
    assert (g["lang"] == "en").all() and (g["flag"] == 7).all()

    # NULL default: empty value stream + zero validity bitmap
    dstn = str(tmp_path / "addnull")
    add_column(src, dstn, "score", "int64", None, resume=False)
    g = decompress_table(dstn).to_pandas()
    assert g["score"].isna().all()
    dstns = str(tmp_path / "addnullstr")
    add_column(src, dstns, "note", "string", None, resume=False)
    assert decompress_table(dstns).to_pandas()["note"].isna().all()

    # float constant
    dstf = str(tmp_path / "addflt")
    add_column(src, dstf, "w", "double", 0.25, resume=False)
    assert (decompress_table(dstf).to_pandas()["w"].values == 0.25).all()

    # refusals: existing name (in-task, Ray-wrapped) and unsupported dtype
    with pytest.raises(Exception, match="already exists"):
        add_column(src, str(tmp_path / "bad"), "a", "int64", 1, resume=False)
    with pytest.raises(Exception, match="unsupported ADD COLUMN dtype"):
        add_column(src, str(tmp_path / "bad2"), "x", "list<int32>", None, resume=False)
