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


def test_chunked_array_input():
    arr = pa.chunked_array([["a", "b"], ["c"]])
    blob = encode_str_column(arr, "auto")
    assert decode_str_column(blob).to_pylist() == ["a", "b", "c"]
