"""Per-chunk doc-id bloom zone filters (chunk format 3): point lookups
prune chunks whose id RANGE matches but which don't hold the id; empty
bitsets and older-format sinks stay sound; compaction carries the bitsets."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tokenzip.pipeline import _bloom_survivors, compress, decompress


def _write_frag(path, ids):
    """One token-schema fragment; tokens derived from the id index."""
    toks = [list(range(int(i.split("-")[1]) % 7 + 1)) for i in ids]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "tokens": pa.array(
                    [np.asarray(t, np.int32) for t in toks], pa.list_(pa.int32())
                ),
                "n_tok": pa.array([len(t) for t in toks], pa.int32()),
                "source": pa.array(["s"] * len(ids), pa.string()),
            }
        ),
        path,
        compression="none",
    )


@pytest.fixture()
def interleaved_sink(ray_session, tmp_path):
    """Two fragments with INTERLEAVED ids: both chunks' [did_min, did_max]
    ranges cover every id, so range zone maps cannot prune point lookups —
    only the blooms can."""
    evens = [f"doc-{i:04d}" for i in range(0, 40, 2)]
    odds = [f"doc-{i:04d}" for i in range(1, 40, 2)]
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _write_frag(p1, evens)
    _write_frag(p2, odds)
    out = str(tmp_path / "sink")
    compress([p1, p2], out, concurrency=2)
    return out, evens, odds


def test_bloom_prunes_range_overlapping_chunks(interleaved_sink):
    out, evens, odds = interleaved_sink
    chunks_dir = os.path.join(out, "chunks")
    # both chunks' ranges contain doc-0001 — zone maps keep 2, bloom keeps 1
    d = "doc-0001"
    dexpr = (pc.field("did_min") <= d) & (pc.field("did_max") >= d)
    keep = _bloom_survivors(chunks_dir, dexpr, [d])
    assert len(keep) == 1
    # and the surviving chunk is the odd one (check via its decoded rows)
    df = decompress(out, doc_ids=[d]).to_pandas()
    assert list(df["doc_id"]) == [d]


def test_bloom_point_lookup_exact_rows(interleaved_sink):
    out, evens, odds = interleaved_sink
    pick = ["doc-0000", "doc-0003", "doc-0038"]
    df = decompress(out, doc_ids=pick).to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == sorted(pick)
    # tokens round-trip bit-identical through the pruned read
    for did, toks in zip(df["doc_id"], df["tokens"]):
        i = int(did.split("-")[1])
        assert list(toks) == list(range(i % 7 + 1))


def test_bloom_missing_id_returns_empty(interleaved_sink):
    out, _, _ = interleaved_sink
    df = decompress(out, doc_ids=["doc-9999"]).to_pandas()
    assert len(df) == 0


def test_empty_bitset_means_must_read(interleaved_sink):
    """b'' blooms (unknown provenance) are never pruned."""
    out, _, _ = interleaved_sink
    chunks_dir = os.path.join(out, "chunks")
    for f in glob.glob(os.path.join(chunks_dir, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        idx = t.column_names.index("did_bloom")
        t = t.set_column(
            idx, "did_bloom", pa.array([b""] * t.num_rows, pa.large_binary())
        )
        pq.write_table(t, f, compression="none")
    d = "doc-0001"
    dexpr = (pc.field("did_min") <= d) & (pc.field("did_max") >= d)
    keep = _bloom_survivors(chunks_dir, dexpr, [d])
    assert len(keep) == 2  # nothing pruned
    df = decompress(out, doc_ids=[d]).to_pandas()
    assert list(df["doc_id"]) == [d]


def test_format2_sink_still_served_by_zone_maps(interleaved_sink):
    """A sink recorded at format 2 (no did_bloom column) skips the bloom
    phase and still answers point lookups exactly."""
    out, _, _ = interleaved_sink
    chunks_dir = os.path.join(out, "chunks")
    for f in glob.glob(os.path.join(chunks_dir, "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["did_bloom"]), f, compression="none")
    man_path = os.path.join(out, "manifest.json")
    man = json.load(open(man_path))
    man["chunk_format"] = 2
    json.dump(man, open(man_path, "w"))
    df = decompress(out, doc_ids=["doc-0001", "doc-0002"]).to_pandas()
    assert sorted(df["doc_id"]) == ["doc-0001", "doc-0002"]


def test_compacted_sink_keeps_bloom_pruning(interleaved_sink, tmp_path):
    from tokenzip.pipeline import compact

    out, _, _ = interleaved_sink
    dst = str(tmp_path / "compacted")
    compact(out, dst)
    # compacted rows carry the bitsets; the point lookup still prunes
    d = "doc-0001"
    dexpr = (pc.field("did_min") <= d) & (pc.field("did_max") >= d)
    keep = _bloom_survivors(os.path.join(dst, "chunks"), dexpr, [d])
    assert len(keep) == 1
    df = decompress(dst, doc_ids=[d]).to_pandas()
    assert list(df["doc_id"]) == [d]
