"""Chunk-layer tests: encode_batch/decode_chunks bit-identical reconstruction
on the FIXTURES.md F2 boundary table (empty lists, negatives, runs, bands)
and on generated corpus shards; <=-LEB128 bound; n_tok derivation."""

import numpy as np
import pyarrow as pa
import pytest

from tokenzip.chunk import decode_chunks, encode_batch
from tokenzip.corpus import TOKEN_SCHEMA, generate_shard


def _table(rows):
    doc_ids, toks, srcs = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array([list(t) for t in toks], pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in toks], pa.int32()),
            "source": pa.array(srcs, pa.string()),
        },
        schema=TOKEN_SCHEMA,
    )


BOUNDARY = _table(
    [
        ("b-u8", [0, 1, 127, 128, 255], "synth"),
        ("b-u16", [0, 1, 127, 128, 300, 16383, 16384, 65535], "synth"),
        ("b-u32", [0, 1, 127, 128, 300, 16383, 16384, 2097151, 2097152,
                   268435455, 268435456, 2147483647], "synth"),
        ("b-neg", [-1, -20, -64, -65, -8192, -8193, -2147483648, 2147483647], "synth"),
        ("b-empty", [], "web"),
        ("b-single-0", [0], "web"),
        ("b-single-neg", [-1], "web"),
        ("b-run", [7] * 1000, "books"),
        ("b-const-offset", list(range(30000, 30256)), "wiki"),
    ]
)


@pytest.mark.parametrize("codec", ["auto", "leb128", "svb", "bitpack", "for",
                                   "rle", "dict", "delta"])
def test_boundary_roundtrip_every_codec(codec):
    chunk = encode_batch(BOUNDARY, tokens_codec=codec)
    back = decode_chunks(chunk)
    assert back.sort_by("doc_id").equals(
        BOUNDARY.sort_by("doc_id").cast(back.schema)
    )


def test_empty_batch():
    empty = BOUNDARY.slice(0, 0)
    chunk = encode_batch(empty)
    back = decode_chunks(chunk)
    assert back.num_rows == 0
    assert set(back.column_names) == {"doc_id", "tokens", "n_tok", "source"}


def test_shard_roundtrip_and_size_bound():
    t = generate_shard(3, 500, 0)
    chunk = encode_batch(t)
    back = decode_chunks(chunk)
    assert back.sort_by("doc_id").equals(t.sort_by("doc_id").cast(back.schema))
    row = {k: chunk[k][0].as_py() for k in chunk.column_names}
    # north rule bound: tokens payload <= reference LEB128 size (+ framing)
    assert row["tokens_bytes_out"] <= row["leb128_bytes"] + 256
    assert row["bytes_out"] < row["bytes_in"]


def test_n_tok_derived_when_consistent():
    chunk = encode_batch(BOUNDARY)
    assert all(len(b.as_py()) == 0 for b in chunk["n_tok_enc"])


def test_n_tok_explicit_when_inconsistent():
    t = BOUNDARY.set_column(
        2, "n_tok", pa.array([99] * BOUNDARY.num_rows, pa.int32())
    )
    chunk = encode_batch(t)
    assert any(len(b.as_py()) > 0 for b in chunk["n_tok_enc"])
    back = decode_chunks(chunk)
    assert back["n_tok"].to_pylist() == [99] * t.num_rows


def test_chunk_id_deterministic():
    c1 = encode_batch(BOUNDARY)
    c2 = encode_batch(BOUNDARY)
    assert c1.equals(c2)


def test_large_offsets_sliced_table():
    t = generate_shard(1, 400, 0)
    part = t.slice(100, 150)  # non-zero offset slice must round-trip
    chunk = encode_batch(part)
    back = decode_chunks(chunk)
    assert back.sort_by("doc_id").equals(part.sort_by("doc_id").cast(back.schema))


def test_content_checksum_sensitivity():
    """The format-4 decoded-content checksum must change under every
    corruption class counts alone can't see: one token value, a list
    boundary shift that preserves the flat stream, a doc id, a source."""
    import numpy as np
    import pyarrow as pa

    from tokenzip.chunk import content_checksum

    did = pa.array(["a", "b", "c"], pa.string())
    src = pa.array(["web", "web", "code"], pa.string())
    lengths = np.array([2, 1, 3], np.int64)
    vals = np.array([5, -7, 9, 11, 13, 0], np.int32)
    base = content_checksum(did, src, lengths, vals)
    assert base != 0
    # one token value
    v2 = vals.copy()
    v2[3] ^= 1
    assert content_checksum(did, src, lengths, v2) != base
    # boundary shift, same flat stream and same total count
    assert content_checksum(
        did, src, np.array([1, 2, 3], np.int64), vals
    ) != base
    # doc id / source changes
    assert content_checksum(
        pa.array(["a", "b", "d"], pa.string()), src, lengths, vals
    ) != base
    assert content_checksum(
        did, pa.array(["web", "web", "web"], pa.string()), lengths, vals
    ) != base
    # empty chunk is the 0 sentinel (= "not checksummed" for old sinks)
    assert content_checksum(
        pa.array([], pa.string()), pa.array([], pa.string()),
        np.zeros(0, np.int64), np.zeros(0, np.int32),
    ) == 0


def test_conform_chunk_rows_fills_sentinels():
    import pyarrow as pa

    from tokenzip.chunk import CHUNK_SCHEMA, conform_chunk_rows
    from tokenzip.errors import ChunkFormatError

    full = {f.name: [None] for f in CHUNK_SCHEMA}
    t = pa.table(
        {
            k: pa.array(v, CHUNK_SCHEMA.field(k).type)
            for k, v in full.items()
            if k not in ("did_bloom", "content_chk")
        }
    )
    out = conform_chunk_rows(t)
    assert out.column_names == [f.name for f in CHUNK_SCHEMA]
    assert out["did_bloom"][0].as_py() == b""
    assert out["content_chk"][0].as_py() == 0
    # a truly required column missing must raise, not be invented
    with pytest.raises(ChunkFormatError, match="missing required"):
        conform_chunk_rows(t.drop_columns(["tokens_enc"]))
