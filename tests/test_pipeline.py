"""End-to-end Ray pipeline tests: compress -> decompress equality, verify
aggregation, manifest lineage, and exact resume (SURVEY.md §5 engine plan)."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from tokenzip.corpus import corpus_paths
from tokenzip.pipeline import chunk_meta_dataset, compress, decompress, verify_roundtrip


@pytest.fixture(scope="module")
def paths(ray_session):
    return corpus_paths("/root/testdata/sf0.001")


def _orig_df(paths):
    import pandas as pd

    tables = [pq.read_table(p) for p in paths]
    df = pd.concat([t.to_pandas() for t in tables]).sort_values("doc_id")
    return df.reset_index(drop=True)


def test_compress_decompress_bit_identical(ray_session, paths, tmp_path):
    out = str(tmp_path / "out")
    totals = compress(paths, out, concurrency=2)
    assert totals["n_rows"] == 2000
    df = decompress(out, concurrency=2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = _orig_df(paths)
    assert (df["doc_id"] == orig["doc_id"]).all()
    assert (df["source"] == orig["source"]).all()
    assert (df["n_tok"] == orig["n_tok"]).all()
    for a, b in zip(df["tokens"], orig["tokens"]):
        assert len(a) == len(b) and (a == b).all()


def test_size_bound_and_manifest(ray_session, paths, tmp_path):
    out = str(tmp_path / "out")
    totals = compress(paths, out, concurrency=2)
    # north rule: compressed size <= reference LEB128 size. Framing overhead
    # is bounded by 512 bytes/chunk; tokens payload dominates.
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert totals["leb128_bytes"] > 0
    tok_out = sum(f["tokens_bytes_out"] for f in man["fragments"].values())
    assert tok_out <= totals["leb128_bytes"] + 512 * totals["n_chunks"]
    assert totals["bytes_out"] < totals["bytes_in"]
    from tokenzip.corpus import N_SHARDS
    from tokenzip.pipeline import _frag_of_path

    assert set(man["fragments"]) == {_frag_of_path(p) for p in paths}
    assert len(man["fragments"]) == N_SHARDS
    for frag, st in man["fragments"].items():
        assert st["status"] == "done"
        assert st["n_chunks"] > 0 and st["n_tokens"] > 0
    meta = chunk_meta_dataset(out).to_pandas()
    assert meta["n_rows"].sum() == 2000


def test_resume_skips_done_and_completes(ray_session, paths, tmp_path):
    out_full = str(tmp_path / "full")
    compress(paths, out_full, concurrency=2)

    out_res = str(tmp_path / "resumed")
    compress(paths[:3], out_res, concurrency=2)  # simulate a partial run
    man = json.load(open(os.path.join(out_res, "manifest.json")))
    assert len(man["fragments"]) == 3
    from tokenzip.corpus import N_SHARDS
    # leave a partial (stale) chunk dir for an unfinished fragment; resume
    # must wipe and rewrite it
    from tokenzip.pipeline import _frag_of_path

    stale = os.path.join(out_res, "chunks", f"frag={_frag_of_path(paths[4])}")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "garbage.parquet"), "w") as f:
        f.write("junk")
    totals = compress(paths, out_res, concurrency=2)  # resume the rest
    man = json.load(open(os.path.join(out_res, "manifest.json")))
    assert len(man["fragments"]) == N_SHARDS
    assert totals["n_rows"] == 2000
    # identical decoded content vs the one-shot run
    a = decompress(out_res, concurrency=2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decompress(out_full, concurrency=2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert (x == y).all()


def test_noop_resume(ray_session, paths, tmp_path):
    out = str(tmp_path / "out")
    t1 = compress(paths, out, concurrency=2)
    t2 = compress(paths, out, concurrency=2)  # everything done -> no work
    assert t1 == t2


def test_shared_tables_mode(ray_session, paths, tmp_path):
    import pyarrow.parquet as pq_
    from tokenzip.codecs.core import unpack_blob

    out = str(tmp_path / "shared")
    totals = compress(paths, out, concurrency=2, shared_tables=True)
    assert totals["n_rows"] == 2000
    assert os.path.exists(os.path.join(out, "symbols.json"))
    # chunks reference tables by hash only — no table bytes inline
    chunk_dirs = [d for d in os.listdir(os.path.join(out, "chunks")) if d.startswith("frag=")]
    t = pq_.read_table(os.path.join(out, "chunks", chunk_dirs[0]),
                       columns=["doc_id_enc", "source_enc"])
    codec, meta, streams = unpack_blob(t["doc_id_enc"][0].as_py())
    # structural floor may beat the shared table on machine-generated ids;
    # either way the chunk must be table-free or hash-referenced
    assert codec in ("fsst_shared", "prefix_int")
    if codec == "fsst_shared":
        assert "th" in meta
    codec2, meta2, _ = unpack_blob(t["source_enc"][0].as_py())
    # single-source chunks hit the 0-bit per-chunk dict floor
    assert codec2 in ("dict_str_shared", "dict_str")
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert all(f["shared_tables"] for f in man["fragments"].values())
    # decode resolves hashes via the sidecar, bit-identical roundtrip
    df = decompress(out, concurrency=2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = _orig_df(paths)
    assert (df["doc_id"] == orig["doc_id"]).all()
    assert (df["source"] == orig["source"]).all()
    for a, b in zip(df["tokens"], orig["tokens"]):
        assert (a == b).all()


def test_decompress_source_pushdown(ray_session, paths, tmp_path):
    """decompress(sources=...) returns exactly the requested sources' rows
    and prunes non-matching single-source chunks at the parquet read."""
    out = str(tmp_path / "pd")
    compress(paths, out, concurrency=2)
    orig = _orig_df(paths)
    want = {"web", "code"}
    df = (
        decompress(out, concurrency=2, sources=sorted(want))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = orig[orig["source"].isin(want)].sort_values("doc_id").reset_index(drop=True)
    assert list(df["doc_id"]) == list(exp["doc_id"])
    assert set(df["source"]) <= want
    for a, b in zip(df["tokens"], exp["tokens"]):
        assert (a == b).all()
    # single-source sink: every chunk row carries an exclusive source_top
    import glob as _g

    files = _g.glob(os.path.join(out, "chunks", "**", "*.parquet"), recursive=True)
    tops = set()
    for f in files:
        tops |= set(pq.read_table(f, columns=["source_top"])["source_top"].to_pylist())
    assert "" not in tops and tops >= want


def test_compact_bit_identical_and_audited(ray_session, paths, tmp_path):
    """Compaction merges chunk files without re-encoding: decompress of the
    compacted sink is bit-identical, the chunk-id multiset checksum is
    grouping-invariant, and source pushdown still prunes."""
    from tokenzip.pipeline import compact

    src = str(tmp_path / "src")
    compress(paths, src, concurrency=2)
    import glob as _g

    n_in = len(_g.glob(os.path.join(src, "chunks", "**", "*.parquet"), recursive=True))
    r1 = compact(src, str(tmp_path / "d1"), target_bytes=1 << 20)
    r2 = compact(src, str(tmp_path / "d2"), target_bytes=64 << 20)
    assert r1["n_files_in"] == n_in and r1["n_files_out"] > r2["n_files_out"]
    assert r1["chunk_checksum"] == r2["chunk_checksum"]
    assert r1["n_chunks"] == r2["n_chunks"]
    a = decompress(src).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        decompress(str(tmp_path / "d1"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(a["doc_id"]) == list(b["doc_id"])
    for x, y in zip(a["tokens"], b["tokens"]):
        assert (x == y).all()
    f = decompress(str(tmp_path / "d1"), sources=["books"]).to_pandas()
    assert set(f["source"]) <= {"books"}
    assert len(f) == int((a["source"] == "books").sum())
    # manifest provenance carried over
    man = json.load(open(os.path.join(str(tmp_path / "d1"), "manifest.json")))
    assert man["compacted_from"] == src
    assert man["totals"]["n_rows"] == 2000


def test_append_after_compact(ray_session, paths, tmp_path):
    """A compacted sink accepts NEW fragments via the normal resumable
    compress path (uniform hive layout + schema), and decompress reads the
    union."""
    from tokenzip.pipeline import compact

    src = str(tmp_path / "src")
    compress(paths[:4], src, concurrency=2)
    cdir = str(tmp_path / "cd")
    compact(src, cdir, target_bytes=64 << 20)
    totals = compress(paths, cdir, concurrency=2)  # appends paths[4:]
    assert totals["n_rows"] == 2000
    a = decompress(cdir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = _orig_df(paths)
    assert list(a["doc_id"]) == list(b["doc_id"])
    for x, y in zip(a["tokens"], b["tokens"]):
        assert (x == y).all()


def test_mixed_chunk_source_top_empty_and_row_filter():
    """by_source=False chunks mark source_top='' (never pruned) and the
    decode-side row filter nets the exact subset."""
    import numpy as np
    import pyarrow as pa

    from tokenzip.pipeline import _decode_fn
    from tokenzip.stages import EncodeStage

    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(6)]),
            "tokens": pa.array(
                [np.arange(i + 1, dtype=np.int32) for i in range(6)],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([i + 1 for i in range(6)], pa.int32()),
            "source": pa.array(["a", "b", "a", "b", "c", "a"]),
        }
    )
    chunks = EncodeStage(by_source=False)(tbl)
    assert set(chunks["source_top"].to_pylist()) == {""}
    dec = _decode_fn(chunks, sources=["a", "c"])
    assert set(dec["source"].to_pylist()) == {"a", "c"}
    assert dec.num_rows == 4


def test_verify_roundtrip_all_equal(ray_session, paths):
    v = verify_roundtrip(paths).to_pandas()
    assert (v["n_docs"] == v["n_equal"]).all()
    assert v["n_docs"].sum() == 2000
    assert set(v["source"]) == {"web", "code", "books", "wiki", "synth"}


def test_sink_roundtrip_join_and_corruption(ray_session, paths, tmp_path):
    """verify_sink_roundtrip reads the WRITTEN chunks back and joins them to
    the originals by doc_id; a corrupted token in the sink must surface as a
    non-equal doc (the end-to-end differential the in-memory verify can't
    see)."""
    import glob

    import numpy as np
    import pyarrow as pa

    from tokenzip.chunk import decode_chunks, encode_batch
    from tokenzip.pipeline import verify_sink_roundtrip

    out = str(tmp_path / "out")
    compress(paths, out, concurrency=2)
    v = verify_sink_roundtrip(paths, out, concurrency=2)
    assert (v["n_docs"] == v["n_equal"]).all()
    assert v["n_docs"].sum() == 2000

    # corrupt ONE token of ONE doc inside one written chunk (re-encoded so
    # the chunk container itself stays valid — only the content changes)
    f = sorted(glob.glob(os.path.join(out, "chunks", "frag=*", "*.parquet")))[0]
    t = pq.read_table(f)
    frag_col = t["frag"] if "frag" in t.column_names else None
    rows = decode_chunks(t.drop_columns(["frag"]) if frag_col is not None else t)
    toks = rows["tokens"].to_pylist()
    # find a doc with at least one token
    i = next(idx for idx, tk in enumerate(toks) if len(tk))
    toks[i] = [toks[i][0] + 1] + list(toks[i][1:])
    bad = pa.table(
        {
            "doc_id": rows["doc_id"],
            "tokens": pa.array([np.asarray(x, dtype=np.int32) for x in toks],
                               pa.list_(pa.int32())),
            "n_tok": rows["n_tok"],
            "source": rows["source"],
        }
    )
    enc = encode_batch(bad)
    if frag_col is not None:
        enc = enc.append_column("frag", pa.array([frag_col[0].as_py()] * enc.num_rows))
    pq.write_table(enc, f, compression="none")

    v2 = verify_sink_roundtrip(paths, out, concurrency=2)
    assert int(v2["n_docs"].sum() - v2["n_equal"].sum()) == 1


def test_shared_tables_per_source_and_unseen(ray_session, tmp_path):
    """Per-source FSST tables are trained on a strided sample; a source that
    never appears in any sampled row group falls back to the GLOBAL table
    and still round-trips bit-identically (SURVEY.md §7 step 6)."""
    import glob

    import numpy as np
    import pyarrow as pa

    from tokenzip.codecs.core import unpack_blob
    from tokenzip.pipeline import _train_shared_tables, decompress
    from tokenzip.pipeline import compress as _compress

    def mk(doc0, n, src):
        toks = pa.array([np.arange(3, dtype=np.int32)] * n, pa.list_(pa.int32()))
        # NON-structural ids (letter suffix defeats prefix_int) so the
        # shared FSST table is actually chosen
        return pa.table(
            {
                "doc_id": pa.array([f"doc-{doc0 + i:08d}-x{i % 7}" for i in range(n)]),
                "tokens": toks,
                "n_tok": pa.array([3] * n, pa.int32()),
                "source": pa.array([src] * n),
            }
        )

    t = pa.concat_tables([mk(0, 64, "alpha"), mk(64, 64, "unseen")])
    p = str(tmp_path / "part-0000.parquet")
    pq.write_table(t, p, row_group_size=64)  # rg0 = alpha only, rg1 = unseen

    tables = _train_shared_tables([p])
    refs = tables["refs"]
    assert "alpha" in refs["doc_id_fsst_by_source"]
    assert "unseen" not in refs["doc_id_fsst_by_source"]

    out = str(tmp_path / "out")
    totals = _compress([p], out, shared_tables=True, concurrency=2)
    assert totals["n_rows"] == 128
    # the unseen-source chunk references the GLOBAL table hash
    files = glob.glob(os.path.join(out, "chunks", "frag=*", "*.parquet"))
    seen = {}
    for f in files:
        ct = pq.read_table(f, columns=["source_top", "doc_id_enc"])
        for i in range(ct.num_rows):
            _, meta, _ = unpack_blob(ct["doc_id_enc"][i].as_py())
            seen[ct["source_top"][i].as_py()] = meta["th"]
    assert seen["alpha"] == refs["doc_id_fsst_by_source"]["alpha"]
    assert seen["unseen"] == refs["doc_id_fsst"]

    df = decompress(out, concurrency=2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df["doc_id"]) == sorted(
        f"doc-{i:08d}-x{i % 7}" for i in range(64)
    ) + sorted(f"doc-{64 + i:08d}-x{i % 7}" for i in range(64))
    assert set(df["source"]) == {"alpha", "unseen"}


def test_compression_by_codec_pin_current(ray_session):
    """The pinned per-codec oracle rows (oracles.COMPRESSION_BY_CODEC_PIN)
    must equal a fresh q_compression_by_codec run at the driver's oracle
    scale — catches pin drift when the corpus generator, block splitting, or
    codec selector changes. Also audits the pin's SQL self-check: the pinned
    sums must match DuckDB's closed-form corpus totals."""
    import duckdb

    from tokenzip.corpus import ensure_corpus
    from tokenzip.oracles import COMPRESSION_BY_CODEC_PIN, compression_by_codec_sql
    from tokenzip.queries import q_compression_by_codec

    shutil.rmtree("/tmp/tokenzip_out/sf0.01", ignore_errors=True)
    got = q_compression_by_codec("sf0.01").to_pandas()
    fresh = [
        (r.tokens_codec, int(r.n_tokens), int(r.tokens_bytes_out), int(r.leb128_bytes))
        for r in got.itertuples()
    ]
    assert fresh == list(COMPRESSION_BY_CODEC_PIN), (
        "codec mix drifted — regenerate COMPRESSION_BY_CODEC_PIN:\n" + repr(fresh)
    )
    glob = ensure_corpus("sf0.01") + "/*.parquet"
    exp = duckdb.sql(compression_by_codec_sql(glob)).df()
    assert len(exp) == len(COMPRESSION_BY_CODEC_PIN)  # self-audit passed
    assert exp["n_tokens"].tolist() == [r[1] for r in COMPRESSION_BY_CODEC_PIN]


def test_distributed_manifest_fold_parity(ray_session, paths, tmp_path, monkeypatch):
    """The distributed chunk-metadata fold (used beyond _SERIAL_FOLD_MAX
    fragments) produces byte-identical per-fragment manifest stats to the
    serial column-pruned fold."""
    import tokenzip.pipeline as P

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ta = compress(paths, a, concurrency=2)
    monkeypatch.setattr(P, "_SERIAL_FOLD_MAX", 0)
    tb = compress(paths, b, concurrency=2)
    assert ta == tb
    ma = json.load(open(os.path.join(a, "manifest.json")))["fragments"]
    mb = json.load(open(os.path.join(b, "manifest.json")))["fragments"]
    strip = lambda m: {
        k: {x: y for x, y in v.items() if x != "completed_at"}
        for k, v in m.items()
    }
    assert strip(ma) == strip(mb)


def test_straggler_shard_splits_and_verifies(ray_session, tmp_path):
    """A shard 10x denser than its peers gets extra read blocks (straggler
    isolation) and verify_roundtrip stays all-equal across the split."""
    import numpy as np
    import pyarrow as pa

    from tokenzip.corpus import generate_shard
    from tokenzip.pipeline import _verify_read_blocks

    paths = []
    for shard in range(4):
        rows = 2000 if shard == 1 else 200  # one dense shard
        t = generate_shard(shard, rows, row_offset=shard * 10_000)
        p = str(tmp_path / f"part-{shard}.parquet")
        pq.write_table(t, p, row_group_size=256)
        paths.append(p)

    uniform = [paths[0]] * 4
    assert _verify_read_blocks(uniform) == 4  # no skew -> one per file

    # policy math at representative sizes (tiny test files stay below the
    # 16 MB split floor by design): 3 x 32 MB + one 640 MB straggler
    import tokenzip.pipeline as P

    fake = {p: 32 << 20 for p in paths}
    fake[paths[1]] = 640 << 20
    real_getsize = os.path.getsize
    try:
        os.path.getsize = lambda p: fake.get(p) or real_getsize(p)
        nb = _verify_read_blocks(paths)
    finally:
        os.path.getsize = real_getsize
    assert nb > 4  # skew -> the dense shard is split
    assert nb <= 64  # ...at bounded granularity, never an explosion

    v = verify_roundtrip(paths).to_pandas()
    assert (v["n_docs"] == v["n_equal"]).all()
    assert int(v["n_docs"].sum()) == 2600


def test_sink_audit_over_compacted_sink(ray_session, paths, tmp_path):
    """verify_sink_roundtrip works against a COMPACTED sink, and a flipped
    token inside a compacted chunk file still surfaces as a non-equal doc."""
    import glob as _g

    import numpy as np
    import pyarrow as pa

    from tokenzip.chunk import decode_chunks, encode_batch
    from tokenzip.pipeline import compact, verify_sink_roundtrip

    src = str(tmp_path / "src")
    compress(paths, src, concurrency=2)
    dst = str(tmp_path / "dst")
    compact(src, dst, target_bytes=64 << 20)
    v = verify_sink_roundtrip(paths, dst, concurrency=2)
    assert (v["n_docs"] == v["n_equal"]).all()
    assert v["n_docs"].sum() == 2000

    # corrupt one token of one doc inside the compacted file (re-encode the
    # affected chunk row so the container stays valid)
    f = sorted(
        _g.glob(os.path.join(dst, "chunks", "**", "*.parquet"), recursive=True)
    )[0]
    t = pq.read_table(f)
    rows = decode_chunks(t.drop_columns([c for c in ("frag",) if c in t.column_names]))
    toks = rows["tokens"].to_pylist()
    i = next(idx for idx, tk in enumerate(toks) if len(tk))
    toks[i] = [toks[i][0] + 1] + list(toks[i][1:])
    bad = pa.table(
        {
            "doc_id": rows["doc_id"],
            "tokens": pa.array(
                [np.asarray(x, np.int32) for x in toks], pa.list_(pa.int32())
            ),
            "n_tok": rows["n_tok"],
            "source": rows["source"],
        }
    )
    pq.write_table(encode_batch(bad), f, compression="none")
    v2 = verify_sink_roundtrip(paths, dst, concurrency=2)
    assert int(v2["n_docs"].sum() - v2["n_equal"].sum()) == 1


def test_decompress_doc_id_pushdown(ray_session, paths, tmp_path):
    """doc_id_range / doc_ids prune chunks on the did_min/did_max zone maps
    and return exactly the requested rows; an old-format sink (no recorded
    chunk_format) is refused loudly instead of silently returning empty."""
    import glob as _g

    from tokenzip.errors import ChunkFormatError

    out = str(tmp_path / "dz")
    compress(paths, out, concurrency=2)
    orig = _orig_df(paths)
    ids = sorted(orig["doc_id"])
    lo, hi = ids[len(ids) // 4], ids[len(ids) // 2]

    # range lookup, exact
    df = (
        decompress(out, doc_id_range=(lo, hi))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        orig[(orig["doc_id"] >= lo) & (orig["doc_id"] <= hi)]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(df["doc_id"]) == list(exp["doc_id"])
    for a, b in zip(df["tokens"], exp["tokens"]):
        assert (a == b).all()

    # point lookups, exact
    pick = [ids[0], ids[len(ids) // 3], ids[-1]]
    df2 = (
        decompress(out, doc_ids=pick)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(df2["doc_id"]) == sorted(pick)

    # the parquet-level predicate really prunes chunk rows
    files = _g.glob(os.path.join(out, "chunks", "**", "*.parquet"), recursive=True)
    total = kept = 0
    for f in files:
        t = pq.read_table(f, columns=["did_min", "did_max"])
        for dmin, dmax in zip(
            t["did_min"].to_pylist(), t["did_max"].to_pylist()
        ):
            total += 1
            kept += int(dmin <= hi and dmax >= lo)
    assert 1 <= kept < total

    # mutually exclusive filters
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decompress(out, doc_id_range=(lo, hi), doc_ids=pick)

    # old-format sink: strip the format marker -> loud refusal
    man_path = os.path.join(out, "manifest.json")
    man = json.load(open(man_path))
    del man["chunk_format"]
    json.dump(man, open(man_path, "w"))
    with _pytest.raises(ChunkFormatError, match="chunk format"):
        decompress(out, doc_id_range=(lo, hi)).to_pandas()


def test_sink_stats_pushdown_pure_and_mixed(ray_session, paths, tmp_path):
    """Per-source stats from chunk METADATA must equal the decoded truth;
    and after forcing one chunk's source_top to '' (the mixed marker), the
    decode fallback must still produce identical stats — '' means 'must
    read', so blanking a pure chunk is always sound."""
    import glob as g

    import pandas as pd
    import pyarrow as pa

    from tokenzip.queries import sink_stats_pushdown, _source_rollup

    out = str(tmp_path / "out")
    compress(paths[:4], out, concurrency=2)
    truth = _source_rollup(decompress(out, concurrency=2))
    got = sink_stats_pushdown(out)
    pd.testing.assert_frame_equal(got, truth)

    # blank source_top in one chunk file -> those rows take the decode path
    f = sorted(g.glob(os.path.join(out, "chunks", "**", "*.parquet"), recursive=True))[0]
    t = pq.read_table(f)
    n = t.num_rows
    idx = t.schema.get_field_index("source_top")
    assert any(v != "" for v in t["source_top"].to_pylist())
    t = t.set_column(idx, "source_top", pa.array([""] * n, pa.string()))
    pq.write_table(t, f)
    got2 = sink_stats_pushdown(out)
    pd.testing.assert_frame_equal(got2, truth)


def test_projection_pushdown_never_touches_token_payload(ray_session, paths, tmp_path):
    """decompress(columns=...) must (a) equal the projected full decode,
    (b) keep working after the token payload blobs are CORRUPTED — proof
    the projection never reads or decodes them — while the full decode
    fails loudly on the same sink."""
    import glob as g

    import pandas as pd
    import pyarrow as pa

    out = str(tmp_path / "out")
    compress(paths[:2], out, concurrency=2)
    full = decompress(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    proj = (
        decompress(out, columns=["doc_id", "n_tok"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(proj, full[["doc_id", "n_tok"]])

    for f in g.glob(os.path.join(out, "chunks", "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        idx = t.schema.get_field_index("tokens_enc")
        garbage = pa.array([b"\xde\xad\xbe\xef"] * t.num_rows, pa.large_binary())
        pq.write_table(t.set_column(idx, "tokens_enc", garbage), f)

    proj2 = (
        decompress(out, columns=["doc_id", "n_tok"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(proj2, full[["doc_id", "n_tok"]])
    with pytest.raises(Exception):
        decompress(out).materialize()


def test_projection_rejects_unknown_columns(ray_session, paths, tmp_path):
    out = str(tmp_path / "out")
    compress(paths[:1], out, concurrency=2)
    with pytest.raises(ValueError, match="unknown sink columns"):
        decompress(out, columns=["doc_id", "nope"])


def test_recode_bit_identical_and_resumes(ray_session, paths, tmp_path):
    """Codec migration: forced-LEB128 sink -> auto sink decodes to the
    exact same rows, shrinks the tokens payload, and a second recode call
    is a resume no-op."""
    import numpy as np

    from tokenzip.pipeline import decompress, recode

    legacy = str(tmp_path / "legacy")
    dst = str(tmp_path / "dst")
    t_legacy = compress(paths, legacy, tokens_codec="leb128", concurrency=2)
    t_new = recode(legacy, dst, tokens_codec="auto")
    assert t_new["n_tokens"] == t_legacy["n_tokens"]
    assert t_new["tokens_bytes_out"] < t_legacy["tokens_bytes_out"]
    a = decompress(legacy).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decompress(dst).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(a["tokens"], b["tokens"])
    )
    # resume: nothing left to do, totals unchanged
    again = recode(legacy, dst, tokens_codec="auto")
    assert again == t_new
    # per-fragment migration lineage recorded
    from tokenzip.manifest import Manifest

    man = Manifest(dst)
    frag_stats = list(man.data["fragments"].values())
    assert frag_stats and all(
        s.get("recoded_from") == legacy and s.get("src_n_chunks", 0) > 0
        for s in frag_stats
    )


def test_recode_matches_direct_compress_bytes(ray_session, paths, tmp_path):
    """Migrating legacy->auto lands on the SAME codec choices (and bytes)
    as compressing the original corpus with auto directly — the selector
    is deterministic on content, not on the input container."""
    from tokenzip.pipeline import recode

    legacy = str(tmp_path / "legacy")
    direct = str(tmp_path / "direct")
    dst = str(tmp_path / "dst")
    compress(paths, legacy, tokens_codec="leb128", concurrency=2)
    t_direct = compress(paths, direct, tokens_codec="auto", concurrency=2)
    t_new = recode(legacy, dst, tokens_codec="auto")
    assert t_new["tokens_bytes_out"] == t_direct["tokens_bytes_out"]


def test_recode_refuses_non_sink(ray_session, tmp_path):
    from tokenzip.errors import ChunkFormatError
    from tokenzip.pipeline import recode

    with pytest.raises(ChunkFormatError, match="no chunks directory"):
        recode(str(tmp_path / "nothing"), str(tmp_path / "dst"))


def test_incompressible_topk_matches_oracle(ray_session):
    import duckdb
    import pandas as pd

    from tokenzip.corpus import ensure_corpus
    from tokenzip.queries import incompressible_topk_sql, q_incompressible_topk

    sf = "sf0.001"
    glob = ensure_corpus(sf) + "/*.parquet"
    got = q_incompressible_topk(sf).reset_index(drop=True)
    exp = duckdb.sql(incompressible_topk_sql(glob)).df()
    assert len(got) == 20
    # per-mille ratio bounded by the codec: 1..5 bytes/token
    assert (got["bytes_per_ktok"] >= 1000).all()
    assert (got["bytes_per_ktok"] <= 5000).all()
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_cli_recode_chain(ray_session, tmp_path):
    """CLI: compress --codec-forced sink, recode it, verify the recoded
    sink decodes identically via the verify-sink audit."""
    from tokenzip.__main__ import main
    from tokenzip.corpus import ensure_corpus

    toks = ensure_corpus("sf0.001")
    legacy = str(tmp_path / "legacy")
    dst = str(tmp_path / "dst")
    assert main(["compress", toks, legacy]) == 0
    assert main(["recode", legacy, dst]) == 0
    assert main(["verify-sink", toks, dst]) == 0
    assert main(["stats", dst]) == 0


def test_shuffle_by_source_bit_identical_and_spreads(ray_session, tmp_path):
    """The skew-isolation shuffle mode produces the same CONTENT as the
    map-only path (verified through the sink join) and spreads a
    file-clustered hot source across shuffle buckets."""
    import numpy as np
    import pyarrow as pa

    from tokenzip.pipeline import decompress

    # hot source: all its (long) docs concentrated in ONE input file —
    # the straggle layout the shuffle exists for
    rng = np.random.default_rng(7)
    hot = pa.table(
        {
            "doc_id": pa.array([f"hot-{i:05d}" for i in range(64)]),
            "tokens": pa.array(
                [rng.integers(0, 100, size=4000).astype(np.int32).tolist()
                 for _ in range(64)],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([4000] * 64, pa.int32()),
            "source": pa.array(["hot"] * 64),
        }
    )
    cold = pa.table(
        {
            "doc_id": pa.array([f"cold-{i:05d}" for i in range(64)]),
            "tokens": pa.array(
                [rng.integers(0, 100, size=8).astype(np.int32).tolist()
                 for _ in range(64)],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([8] * 64, pa.int32()),
            "source": pa.array(["cold"] * 64),
        }
    )
    pq.write_table(hot, str(tmp_path / "a.parquet"))
    pq.write_table(cold, str(tmp_path / "b.parquet"))
    paths = [str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")]

    plain_dir = str(tmp_path / "plain")
    shuf_dir = str(tmp_path / "shuf")
    t_plain = compress(paths, plain_dir)
    t_shuf = compress(paths, shuf_dir, shuffle_by_source=True, shuffle_buckets=8)
    assert t_shuf["n_tokens"] == t_plain["n_tokens"]
    a = decompress(plain_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decompress(shuf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(a["tokens"], b["tokens"])
    )
    # the hot source's chunks now spread across multiple write tasks/files
    import glob as _g

    from tokenzip.pipeline import _frag_of_path

    frag_a = _g.glob(
        f"{shuf_dir}/chunks/frag={_frag_of_path(paths[0])}/*.parquet"
    )
    assert len(frag_a) >= 2


def test_shuffle_by_source_with_shared_tables_two_phase(ray_session, tmp_path):
    """shared_tables x shuffle_by_source runs two-phase (train tables, then
    shuffled encode): content round-trips identical to plain shared_tables,
    the trained sidecar is byte-identical (tables are a pure function of the
    input), and a file-clustered hot source still spreads across encoders."""
    import numpy as np
    import pyarrow as pa

    from tokenzip.pipeline import decompress

    rng = np.random.default_rng(11)
    def mk(src, n, ln, off):
        return pa.table(
            {
                "doc_id": pa.array([f"{src}-{i + off:05d}" for i in range(n)]),
                "tokens": pa.array(
                    [rng.integers(0, 500, size=ln).astype(np.int32).tolist()
                     for _ in range(n)],
                    pa.list_(pa.int32()),
                ),
                "n_tok": pa.array([ln] * n, pa.int32()),
                "source": pa.array([src] * n),
            }
        )

    pq.write_table(mk("hot", 64, 4000, 0), str(tmp_path / "a.parquet"))
    pq.write_table(mk("cold", 64, 8, 0), str(tmp_path / "b.parquet"))
    paths = [str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")]

    plain_dir = str(tmp_path / "shared_plain")
    both_dir = str(tmp_path / "shared_shuf")
    t_plain = compress(paths, plain_dir, shared_tables=True)
    t_both = compress(
        paths, both_dir, shared_tables=True, shuffle_by_source=True,
        shuffle_buckets=8,
    )
    assert t_both["n_tokens"] == t_plain["n_tokens"]
    with open(f"{plain_dir}/symbols.json", "rb") as f1, open(
        f"{both_dir}/symbols.json", "rb"
    ) as f2:
        assert f1.read() == f2.read()
    a = decompress(plain_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decompress(both_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(a["tokens"], b["tokens"])
    )
    import glob as _g
    import json as _json

    from tokenzip.pipeline import _frag_of_path

    frag_a = _g.glob(
        f"{both_dir}/chunks/frag={_frag_of_path(paths[0])}/*.parquet"
    )
    assert len(frag_a) >= 2  # the hot source spread across encode groups
    with open(f"{both_dir}/manifest.json") as f:
        man = _json.load(f)
    assert all(fr["shared_tables"] for fr in man["fragments"].values())


def _make_tok_partial():
    """Empty-safe per-chunk fold: (source, n_docs, sum_tok) partials.
    Built as a closure so it cloudpickles BY VALUE (test modules are not
    importable on Ray workers)."""

    def _tok_partial(t):
        import numpy as np
        import pyarrow as pa

        from tokenzip.chunk import _tokens_parts

        if not t.num_rows:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "sum_tok": pa.array([], pa.int64()),
                }
            )
        lengths, flat = _tokens_parts(t["tokens"])
        src = t["source"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(src, return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        np.add.at(sums, np.repeat(inv, lengths), flat.astype(np.int64))
        return pa.table(
            {
                "source": pa.array([str(s) for s in u], pa.string()),
                "n_docs": pa.array(np.bincount(inv, minlength=len(u)).astype(np.int64)),
                "sum_tok": pa.array(sums),
            }
        )

    return _tok_partial


def test_decompress_map_fused_fold(ray_session, paths, tmp_path):
    """decompress_map(fn) == decompress().map_batches(fn) content-wise:
    identity fn reproduces the corpus bit-identically; a partial-fold fn
    aggregates to the same totals; pushdown args still apply; zero-match
    pushdowns return a schema-stable empty of the fn's output."""
    import numpy as np
    import pandas as pd

    from tokenzip.pipeline import decompress_map

    tok_partial = _make_tok_partial()
    out = str(tmp_path / "out")
    compress(paths, out, concurrency=2)

    # identity fold == plain decode
    a = (
        decompress_map(out, lambda t: t)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    orig = _orig_df(paths)
    assert (a["doc_id"] == orig["doc_id"]).all()
    for x, y in zip(a["tokens"], orig["tokens"]):
        assert len(x) == len(y) and (x == y).all()

    # partial fold: per-source sums match the direct computation
    got = (
        decompress_map(out, tok_partial)
        .to_pandas()
        .groupby("source", as_index=False)
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exp = (
        pd.DataFrame(
            {
                "source": orig["source"],
                "n_docs": 1,
                "sum_tok": [np.asarray(t, np.int64).sum() for t in orig["tokens"]],
            }
        )
        .groupby("source", as_index=False)
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    # pushdowns still apply inside the fused stage
    one_src = str(orig["source"].iloc[0])
    f = decompress_map(out, tok_partial, sources=[one_src]).to_pandas()
    assert set(f["source"]) == {one_src}

    # zero-match pushdown: schema-stable empty of the fn's output schema
    # (assert on the Dataset schema: Ray's to_pandas drops columns when
    # every block is empty — a conversion quirk, not a schema loss)
    z = decompress_map(out, tok_partial, doc_ids=["no-such-doc"])
    assert z.schema().names == ["source", "n_docs", "sum_tok"]
    assert z.count() == 0


def test_cluster_by_layout_prunes_scattered_corpus(ray_session, tmp_path):
    """On a corpus whose doc ids are SCATTERED across and within shards
    (the realistic ingest order), cluster_by='doc_id' must (a) decode
    bit-identical content and (b) shrink the zone-map hit set for a range
    request to a small fraction of the plain layout's — the clustering-
    index claim, asserted by measurement, not by construction."""
    import glob as globmod

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.pipeline import compress, decompress

    rng = np.random.default_rng(0)
    n = 2000
    ids = np.array([f"doc-{i:06d}" for i in rng.permutation(n)], dtype=object)
    toks = [[int(i) % 97, int(i) % 13] for i in range(n)]
    paths = []
    for s in range(2):
        sl = slice(s * n // 2, (s + 1) * n // 2)
        tab = pa.table(
            {
                "doc_id": pa.array(ids[sl].tolist(), pa.string()),
                "tokens": pa.array(toks[sl.start : sl.stop], pa.list_(pa.int32())),
                "n_tok": pa.array([2] * (n // 2), pa.int32()),
                "source": pa.array(["web"] * (n // 2), pa.string()),
            }
        )
        p = str(tmp_path / f"scat-{s}.parquet")
        pq.write_table(tab, p)
        paths.append(p)
    plain, clu = str(tmp_path / "plain"), str(tmp_path / "clu")
    compress(paths, plain)
    compress(paths, clu, cluster_by="doc_id")
    with pytest.raises(ValueError, match="mutually exclusive"):
        compress(paths, str(tmp_path / "x"), cluster_by="doc_id",
                 shuffle_by_source=True)

    a = decompress(plain).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = decompress(clu).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert len(x) == len(y) and (x == y).all()

    lo, hi = "doc-000100", "doc-000299"  # 10% of the id space

    def hit_frac(sink: str) -> float:
        tot = hit = 0
        for f in globmod.glob(os.path.join(sink, "chunks", "frag=*", "*.parquet")):
            t = pq.read_table(f, columns=["did_min", "did_max"])
            mn = t["did_min"].to_pylist()
            mx = t["did_max"].to_pylist()
            tot += len(mn)
            hit += sum(1 for a_, b_ in zip(mn, mx) if a_ <= hi and b_ >= lo)
        return hit / tot

    pf, cf = hit_frac(plain), hit_frac(clu)
    # scattered ingest makes every plain chunk's window span ~everything
    assert pf > 0.9, pf
    assert cf < 0.35 * pf, (pf, cf)
    # and the pruned range decode is exact
    r = decompress(clu, doc_id_range=(lo, hi)).to_pandas()
    assert len(r) == 200 and r["doc_id"].str.len().eq(10).all()

    # clustered sinks compose with delete (bucket-fragment lineage carries
    # the same per-frag stats the drift guard needs)
    from tokenzip.pipeline import delete_docs

    victims = [f"doc-{i:06d}" for i in range(100, 105)]
    dd = str(tmp_path / "del")
    t = delete_docs(clu, dd, victims)
    assert t["n_docs_deleted"] == 5 and t["n_rows"] == n - 5
    left = decompress(dd, doc_id_range=(lo, hi)).count()
    assert left == 195

    # rerunning the SAME inputs is an idempotent no-op (resume) ...
    t_rerun = compress(paths, clu, cluster_by="doc_id")
    assert t_rerun["n_rows"] == n
    # ... but appending NEW fragments into a done clustered sink must
    # refuse loudly (bucket names are positional; a second run collides)
    extra = str(tmp_path / "extra.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(["zzz-1"], pa.string()),
                "tokens": pa.array([[1]], pa.list_(pa.int32())),
                "n_tok": pa.array([1], pa.int32()),
                "source": pa.array(["web"], pa.string()),
            }
        ),
        extra,
    )
    with pytest.raises(ValueError, match="FRESH sink"):
        compress(paths + [extra], clu, cluster_by="doc_id")


def test_fsck_clean_and_corruption_classes(ray_session, paths, tmp_path):
    """fsck passes a healthy sink (plain, clustered, shared-tables), then
    catches each planted corruption class: flipped payload byte, tampered
    n_rows metadata, and a manifest ledger that disagrees with the files."""
    import glob as globmod
    import json as jsonmod

    import pyarrow as pa

    from tokenzip.errors import ChunkFormatError
    from tokenzip.pipeline import fsck

    sink = str(tmp_path / "sink")
    compress(paths, sink, concurrency=2)
    t = fsck(sink)
    assert t["ok"] and t["violations"] == 0 and t["n_rows"] == 2000

    st = str(tmp_path / "st")
    compress(paths, st, shared_tables=True, concurrency=2)
    assert fsck(st)["ok"]

    # 1) flipped byte inside a payload blob -> decode failure or drift
    import shutil

    bad1 = str(tmp_path / "bad1")
    shutil.copytree(sink, bad1)
    f = sorted(globmod.glob(bad1 + "/chunks/frag=*/*.parquet"))[0]
    raw = bytearray(open(f, "rb").read())
    # flip a byte well inside the data pages (clear of footer/magic)
    raw[len(raw) // 3] ^= 0xFF
    open(f, "wb").write(bytes(raw))
    with pytest.raises(ChunkFormatError, match="violation"):
        fsck(bad1)
    r = fsck(bad1, strict=False)
    assert not r["ok"] and r["violations"] >= 1

    # 2) tampered chunk metadata (n_rows inflated) -> caught by re-derive
    bad2 = str(tmp_path / "bad2")
    shutil.copytree(sink, bad2)
    f = sorted(globmod.glob(bad2 + "/chunks/frag=*/*.parquet"))[0]
    t2 = pq.read_table(f)
    nr = t2["n_rows"].to_numpy(zero_copy_only=False).copy()
    nr[0] += 1
    t2 = t2.set_column(
        t2.schema.get_field_index("n_rows"), "n_rows", pa.array(nr)
    )
    pq.write_table(t2, f, compression="none")
    r = fsck(bad2, strict=False)
    # the tampered count either breaks the stream decode (counts drive the
    # varint readers) or survives decode and trips the re-derive compare
    assert not r["ok"]
    assert "metadata says" in r["detail"] or "decode failed" in r["detail"]

    # 3) manifest ledger drift -> caught by the fold comparison
    bad3 = str(tmp_path / "bad3")
    shutil.copytree(sink, bad3)
    mp = os.path.join(bad3, "manifest.json")
    man = jsonmod.load(open(mp))
    k = next(iter(man["fragments"]))
    man["fragments"][k]["n_rows"] += 7
    jsonmod.dump(man, open(mp, "w"))
    r = fsck(bad3, strict=False)
    assert not r["ok"] and "manifest.n_rows" in r["detail"]


def test_fsck_sample_is_deterministic_subset(ray_session, paths, tmp_path):
    from tokenzip.pipeline import fsck

    sink = str(tmp_path / "s")
    compress(paths, sink, concurrency=2)
    full = fsck(sink)
    a = fsck(sink, sample=0.3)
    b = fsck(sink, sample=0.3)
    assert a == b and a["sampled"] and a["ok"]
    assert 0 < a["n_chunks"] < full["n_chunks"]
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        fsck(sink, sample=0.0)
