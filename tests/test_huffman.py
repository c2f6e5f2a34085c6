"""Canonical-Huffman rank-stream coding (codecs/huffman.py) and its
integration into the rankdict / srank codecs."""

import numpy as np
import pytest

import tokenzip.codecs.huffman as H
from tokenzip.codecs.core import (
    INT_CODECS,
    SHARED_INT_CODECS,
    SHARED_RANK_LENS,
    register_shared_rank_table,
)
from tokenzip.errors import ChunkFormatError


def _roundtrip(counts_desc, rng):
    counts_desc = np.asarray(counts_desc, np.int64)
    k = len(counts_desc)
    lens = H.huff_lengths(counts_desc)
    assert (np.diff(lens.astype(int)) >= 0).all(), "lengths must be monotone"
    if k >= 2:
        assert abs(sum(2.0 ** -int(l) for l in lens) - 1.0) < 1e-9, "Kraft != 1"
    syms = np.repeat(np.arange(k, dtype=np.uint32), np.minimum(counts_desc, 40))
    rng.shuffle(syms)
    data = H.encode_syms(syms, lens)
    back = H.decode_syms(data, len(syms), lens)
    np.testing.assert_array_equal(back, syms)
    return lens, data


def test_known_vector():
    rng = np.random.default_rng(0)
    lens, _ = _roundtrip([5, 2, 1, 1], rng)
    np.testing.assert_array_equal(lens, [1, 2, 3, 3])


def test_edge_cardinalities():
    rng = np.random.default_rng(1)
    assert H.huff_lengths(np.array([], np.int64)).size == 0
    np.testing.assert_array_equal(H.huff_lengths(np.array([7], np.int64)), [0])
    _roundtrip([3, 3], rng)
    _roundtrip([1, 1, 1], rng)


def test_length_cap_on_fibonacci_counts():
    """Fibonacci weights force maximal unconstrained depth; the zlib repair
    must cap at MAX_LEN while keeping the tree complete."""
    fib = [1, 1]
    for _ in range(48):
        fib.append(fib[-1] + fib[-2])
    rng = np.random.default_rng(2)
    lens, _ = _roundtrip(np.sort(fib)[::-1], rng)
    assert int(lens.max()) <= H.MAX_LEN


def test_native_python_bit_identity():
    """Native kernels and the pure-Python mirrors must produce identical
    lengths, identical encoded bytes, and decode each other's output."""
    import tokenzip.codecs.native as nat

    if nat.LIB is None:
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(3)
    k = 500
    p = 1.0 / np.arange(1, k + 1) ** 1.2
    syms = rng.choice(k, 60000, p=p / p.sum()).astype(np.uint32)
    cn = np.bincount(syms, minlength=k).astype(np.int64)
    order = np.argsort(-cn, kind="stable")
    ro = np.empty(k, np.int64)
    ro[order] = np.arange(k)
    rsyms = ro[syms].astype(np.uint32)
    occ = cn[order] > 0
    rsyms = rsyms[rsyms < int(occ.sum())]
    lens_nat = H.huff_lengths(cn[order][occ])
    enc_nat = H.encode_syms(rsyms, lens_nat)
    saved, nat.LIB = nat.LIB, None
    try:
        lens_py = H.huff_lengths(cn[order][occ])
        enc_py = H.encode_syms(rsyms, lens_nat)
        dec_py = H.decode_syms(enc_nat, len(rsyms), lens_nat)
    finally:
        nat.LIB = saved
    np.testing.assert_array_equal(lens_nat, lens_py)
    assert enc_nat == enc_py
    np.testing.assert_array_equal(dec_py, rsyms)
    np.testing.assert_array_equal(H.decode_syms(enc_py, len(rsyms), lens_nat), rsyms)


def test_truncated_stream_raises():
    rng = np.random.default_rng(4)
    lens = H.huff_lengths(np.array([9, 4, 2, 1, 1], np.int64))
    syms = rng.integers(0, 5, 4000).astype(np.uint32)
    data = H.encode_syms(syms, lens)
    with pytest.raises(ChunkFormatError):
        H.decode_syms(data[: len(data) // 2], len(syms), lens)


def test_rankdict_huffman_stream_roundtrip():
    """Skewed chunks flip rankdict's rank stream to rs='h' and round-trip;
    the histogram rides in metadata."""
    rng = np.random.default_rng(5)
    k = 3000
    p = 1.0 / np.arange(1, k + 1) ** 1.3
    vals = rng.choice(k, size=200000, p=p / p.sum()).astype(np.int64) * 7 - 1000
    enc, dec = INT_CODECS["rankdict"]
    streams, meta = enc(vals, 32)
    assert meta.get("rs") == "h" and "blc" in meta
    np.testing.assert_array_equal(dec(streams, meta, len(vals)), vals.astype(np.int32))


def test_rankdict_single_symbol_zero_bits():
    vals = np.full(9000, -77, np.int64)
    enc, dec = INT_CODECS["rankdict"]
    streams, meta = enc(vals, 64)
    assert meta.get("rs") == "h" and len(streams[2]) == 0
    np.testing.assert_array_equal(dec(streams, meta, len(vals)), vals)


def test_rankdict_corrupt_histogram_raises():
    rng = np.random.default_rng(6)
    vals = rng.zipf(1.5, 50000).astype(np.int64) % 997
    enc, dec = INT_CODECS["rankdict"]
    streams, meta = enc(vals, 64)
    if meta.get("rs") != "h":
        pytest.skip("huffman not selected for this chunk")
    bad = dict(meta)
    bad["blc"] = list(meta["blc"][:-1]) + [int(meta["blc"][-1]) + 3]
    with pytest.raises(ChunkFormatError):
        dec(streams, bad, len(vals))


def test_srank_huffman_with_escapes_and_sidecar(tmp_path):
    from tokenzip.codecs.core import SHARED_RANK_TABLES, _RANK_LENS_HASH, _RANK_LOOKUPS
    from tokenzip.codecs.strings import load_shared_tables, save_shared_tables

    rng = np.random.default_rng(7)
    k = 800
    p = 1.0 / np.arange(1, k + 1) ** 1.2
    train = rng.choice(k, 50000, p=p / p.sum()).astype(np.int64) * 5 - 7
    u, c = np.unique(train, return_counts=True)
    order = np.argsort(-c, kind="stable")
    lens = H.huff_lengths_any(
        np.concatenate([c[order].astype(np.int64), [1]])
    )
    th = register_shared_rank_table(u[order], lens)
    vals = np.concatenate(
        [rng.choice(u, 40000), rng.integers(-(10**12), 10**12, 500)]
    ).astype(np.int64)
    enc, dec = SHARED_INT_CODECS["srank"]
    streams, meta = enc(vals, 64, th)
    assert meta.get("rs") == "h" and meta["x"] >= 500
    np.testing.assert_array_equal(dec(streams, meta, len(vals)), vals)

    # lengths survive the sidecar: drop the in-process registries, reload
    sidecar = str(tmp_path / "symbols.json")
    save_shared_tables(sidecar)
    SHARED_RANK_TABLES.pop(th)
    SHARED_RANK_LENS.pop(th)
    _RANK_LENS_HASH.pop(th, None)
    _RANK_LOOKUPS.pop(th, None)
    load_shared_tables(sidecar)
    np.testing.assert_array_equal(dec(streams, meta, len(vals)), vals)


def test_blc_lens_inverse():
    rng = np.random.default_rng(8)
    counts = np.sort(rng.integers(1, 10**6, 5000))[::-1].astype(np.int64)
    lens = H.huff_lengths(counts)
    np.testing.assert_array_equal(H.lens_from_blc(H.blc_from_lens(lens)), lens)
