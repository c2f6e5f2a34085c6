"""URI storage contract (tokenzip.uio): the file:// scheme exercises every
pyarrow.fs branch offline — the same code paths s3://, gs://, hdfs:// take
on a real cluster — plus a full compress -> decompress roundtrip over a
file:// sink."""

import os

import pandas as pd
import pytest

from tokenzip import uio


def test_uio_uri_branches(tmp_path):
    base = f"file://{tmp_path}"
    p = uio.join(base, "a", "b.bin")
    assert uio.is_uri(p) and not uio.is_uri(str(tmp_path))
    uio.write_bytes_atomic(p, b"hello")
    assert uio.exists(p)
    assert uio.read_bytes(p) == b"hello"
    assert uio.file_size(p) == 5
    assert uio.isdir(uio.join(base, "a"))
    assert "a" in uio.listdir(base)
    files = uio.walk_files(base)
    assert len(files) == 1
    fp, sz = files[0]
    assert fp.startswith("file://") and fp.endswith("a/b.bin") and sz == 5
    uio.rmtree(uio.join(base, "a"))
    assert not uio.exists(p)
    assert uio.walk_files(uio.join(base, "missing")) == []


def test_compress_decompress_over_file_uri(ray_session, tmp_path):
    """The whole sink lifecycle (manifest, chunks, resume bookkeeping)
    through the URI layer — what a cluster run does against shared
    storage."""
    from tokenzip.corpus import corpus_paths
    from tokenzip.pipeline import compress, decompress

    paths = corpus_paths("/root/testdata/sf0.001")[:2]
    import pyarrow.parquet as pq

    n_expected = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    out = f"file://{tmp_path}/sink"
    totals = compress(paths, out, concurrency=2)
    assert totals["n_rows"] == n_expected
    # resume over the URI: no re-encode
    assert compress(paths, out, concurrency=2) == totals
    df = decompress(out, concurrency=2).to_pandas()
    assert len(df) == n_expected
    orig = pd.concat([pq.read_table(p).to_pandas() for p in paths])
    orig = orig.sort_values("doc_id").reset_index(drop=True)
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert list(df["doc_id"]) == list(orig["doc_id"])
    for a, b in zip(df["tokens"], orig["tokens"]):
        assert (a == b).all()


def test_compact_over_file_uri(ray_session, tmp_path):
    from tokenzip.corpus import corpus_paths
    from tokenzip.pipeline import compact, compress, decompress

    paths = corpus_paths("/root/testdata/sf0.001")[:3]
    src = f"file://{tmp_path}/src"
    dst = f"file://{tmp_path}/dst"
    compress(paths, src, concurrency=2)
    res = compact(src, dst, target_bytes=1 << 20)
    assert res["n_chunks"] > 0
    a = decompress(src).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decompress(dst).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    for x, y in zip(a["tokens"], b["tokens"]):
        assert (x == y).all()


def test_uio_mock_object_store():
    """The same contract against a NON-posix filesystem: pyarrow's
    in-memory _MockFileSystem registered under mock:// (the injection point
    a real deployment uses for custom stores). Every uio op the manifest
    and sidecars rely on runs against it — no local-path fallback can
    accidentally satisfy this test."""
    from pyarrow import fs as pafs

    uio.register_filesystem("mock", pafs._MockFileSystem())
    try:
        base = "mock://store"
        p = uio.join(base, "a", "b.bin")
        uio.write_bytes_atomic(p, b"hello")
        assert uio.exists(p) and uio.read_bytes(p) == b"hello"
        assert uio.file_size(p) == 5
        assert uio.isdir(uio.join(base, "a")) and not uio.isdir(p)
        assert uio.listdir(base) == ["a"]
        files = uio.walk_files(base)
        assert [(f.rsplit("/", 1)[1], s) for f, s in files] == [("b.bin", 5)]
        assert files[0][0].startswith("mock://")
        # overwrite (object-store single-PUT semantics)
        uio.write_bytes_atomic(p, b"hello world")
        assert uio.read_bytes(p) == b"hello world"
        uio.rmtree(uio.join(base, "a"))
        assert not uio.exists(p)
        assert uio.walk_files(uio.join(base, "missing")) == []
        assert uio.listdir(uio.join(base, "missing")) == []
    finally:
        uio._FS_REGISTRY.pop("mock", None)


def test_manifest_and_sidecar_over_mock_store():
    """Manifest resume bookkeeping + shared-symbol sidecar persist/load
    against the in-memory object store — the two artifacts that MUST be on
    shared storage in a multi-node run."""
    from pyarrow import fs as pafs

    from tokenzip.codecs.strings import (
        SHARED_STR_TABLES,
        load_shared_tables,
        save_shared_tables,
    )
    from tokenzip.manifest import Manifest

    uio.register_filesystem("mock", pafs._MockFileSystem())
    try:
        out = "mock://bucket/run1"
        man = Manifest(out)
        stats = {
            "n_chunks": 1, "n_rows": 2, "n_tokens": 3, "bytes_in": 4,
            "bytes_out": 5, "tokens_bytes_out": 5, "leb128_bytes": 6,
            "codecs": {"leb128": 1},
        }
        man.mark_done("frag-0", dict(stats))
        man.save()
        # a fresh Manifest over the same URI resumes off the stored state
        man2 = Manifest(out)
        assert man2.done_fragments() == {"frag-0"}
        assert man2.totals()["n_tokens"] == 3

        sidecar = uio.join(out, "symbols.json")
        before = dict(SHARED_STR_TABLES)
        save_shared_tables(sidecar)
        assert uio.exists(sidecar)
        load_shared_tables(sidecar)
        assert set(before) <= set(SHARED_STR_TABLES)
    finally:
        uio._FS_REGISTRY.pop("mock", None)
