"""String codec tests: plain / dict / prefix_int roundtrips + auto-selection."""

import pyarrow as pa
import pytest

from tokenzip.codecs.strings import (
    STR_CODECS,
    decode_str_column,
    encode_str_column,
)
from tokenzip.codecs.core import unpack_blob
from tokenzip.errors import CodecError

CASES = {
    "doc_ids": pa.array([f"doc-{i:08d}" for i in range(1000)]),
    "sources": pa.array((["web"] * 600 + ["code"] * 250 + ["books"] * 150)),
    "mixed": pa.array(["", "a", "héllo wörld", "道", "x" * 500, "tab\tnl\n"]),
    "empty": pa.array([], type=pa.string()),
    "single": pa.array(["only"]),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_auto_roundtrip(case):
    arr = CASES[case]
    blob = encode_str_column(arr, "auto")
    got = decode_str_column(blob)
    assert got.to_pylist() == arr.to_pylist()


@pytest.mark.parametrize("codec", ["plain_str", "dict_str", "fsst"])
@pytest.mark.parametrize("case", sorted(CASES))
def test_each_codec_roundtrip(codec, case):
    arr = CASES[case]
    blob = encode_str_column(arr, codec)
    assert decode_str_column(blob).to_pylist() == arr.to_pylist()


def test_prefix_int_picked_for_doc_ids():
    blob = encode_str_column(CASES["doc_ids"], "auto")
    codec, meta, streams = unpack_blob(blob)
    assert codec == "prefix_int"
    # consecutive ids delta-encode to ~1 byte each + prefix
    assert sum(len(s) for s in streams) < 1200


def test_dict_picked_for_low_cardinality():
    blob = encode_str_column(CASES["sources"], "auto")
    codec, _, _ = unpack_blob(blob)
    assert codec == "dict_str"


def test_prefix_int_rejects_freeform():
    enc, _ = STR_CODECS["prefix_int"]
    with pytest.raises(CodecError):
        enc(CASES["mixed"])


def test_fsst_wins_on_repetitive_freeform():
    import numpy as np

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta"]
    vals = [
        f"/data/{words[a]}/{words[b]}_{i:05d}.bin"
        for i, (a, b) in enumerate(zip(rng.integers(0, 4, 3000), rng.integers(0, 4, 3000)))
    ]
    arr = pa.array(vals)
    blob = encode_str_column(arr, "auto")
    codec, _, _ = unpack_blob(blob)
    assert codec == "fsst"
    assert decode_str_column(blob).to_pylist() == vals
    assert len(blob) < sum(len(v) for v in vals) // 2


def test_fsst_escape_paths():
    # strings full of 0xFF-adjacent and rare bytes exercise escape handling
    vals = ["\xff\xfe\x00abc", "ÿÿÿ", "", "\x7f" * 20]
    blob = encode_str_column(pa.array(vals), "fsst")
    assert decode_str_column(blob).to_pylist() == vals


def test_shared_table_codecs_roundtrip(tmp_path):
    from tokenzip.codecs import fsst as F
    from tokenzip.codecs.strings import (
        SHARED_STR_DICTS,
        SHARED_STR_TABLES,
        load_shared_tables,
        register_shared_str_dict,
        register_shared_str_table,
        save_shared_tables,
    )

    vals = [f"doc-{i:06d}" for i in range(500)]
    symbols = F.train_symbol_table("".join(vals).encode())
    th = register_shared_str_table(symbols)
    blob = encode_str_column(pa.array(vals), "fsst_shared", table_hash=th)
    codec, meta, streams = unpack_blob(blob)
    assert codec == "fsst_shared" and meta["th"] == th
    assert decode_str_column(blob).to_pylist() == vals

    dh = register_shared_str_dict(["a", "b", "c"])
    blob2 = encode_str_column(pa.array(["a", "c", "a", "b"]), "dict_str_shared", table_hash=dh)
    assert decode_str_column(blob2).to_pylist() == ["a", "c", "a", "b"]

    # sidecar save/load round-trips the registries
    side = str(tmp_path / "symbols.json")
    save_shared_tables(side)
    saved_tables = dict(SHARED_STR_TABLES)
    saved_dicts = dict(SHARED_STR_DICTS)
    SHARED_STR_TABLES.clear()
    SHARED_STR_DICTS.clear()
    import pytest as _pytest

    from tokenzip.errors import ChunkFormatError

    with _pytest.raises(ChunkFormatError):
        decode_str_column(blob)  # table not loaded
    load_shared_tables(side)
    assert SHARED_STR_TABLES == saved_tables and SHARED_STR_DICTS == saved_dicts
    assert decode_str_column(blob).to_pylist() == vals

    # value outside the shared dictionary errs at encode
    from tokenzip.errors import CodecError

    with _pytest.raises(CodecError):
        encode_str_column(pa.array(["zzz"]), "dict_str_shared", table_hash=dh)


def test_chunked_array_input():
    arr = pa.chunked_array([["a", "b"], ["c"]])
    blob = encode_str_column(arr, "auto")
    assert decode_str_column(blob).to_pylist() == ["a", "b", "c"]


def test_unpack_table_signed_memoryview_regression():
    """pyarrow Buffers expose SIGNED-char memoryviews; a table with >= 128
    symbols used to unpack as n = negative -> EMPTY table -> 'code out of
    table range' on decode (found by the sf0.01 upsert audit: the mixed
    'doc-'/'new:doc-' id distribution trained a 147-symbol table)."""
    import numpy as np

    from tokenzip.codecs import fsst as F

    symbols = [bytes([65 + (i % 26), 97 + (i // 26)]) for i in range(150)]
    packed = F.pack_table(symbols)
    assert packed[0] == 150
    # signed view, exactly what memoryview(pa.Buffer) yields
    signed = memoryview(np.frombuffer(packed, np.uint8).view(np.int8))
    out = F.unpack_table(signed)
    assert [bytes(s) for s in out] == symbols
    # and the full decode path accepts memoryview blobs
    blob = b"doc-0001new:doc-0001" * 40
    table = F.train_symbol_table(blob)
    codes = F.fsst_encode(blob, table)
    assert F.fsst_decode(codes, F.unpack_table(memoryview(
        np.frombuffer(F.pack_table(table), np.uint8).view(np.int8)
    ))) == blob
