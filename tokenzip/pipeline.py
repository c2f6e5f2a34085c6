"""Flagship Ray Data pipelines: compress, decompress, verify.

Shape (SURVEY.md §3.2):

    ray.data.read_parquet(fragments, include_paths=True)   # source
      .map_batches(EncodeStage, batch_format="pyarrow",
                   zero_copy_batch=True, concurrency=N)    # actor pool
      .write_parquet(out/chunks, partition_cols=["frag"])  # resumable sink
    + manifest update (per-fragment lineage + byte counts)

Decode mirrors it. Nothing materializes the full dataset; blocks stream
with backpressure. Never calls ray.init()/shutdown() (driver owns the
session).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from tokenzip import uio
from tokenzip.manifest import Manifest
from tokenzip.stages import (
    DecodeStage,
    EncodeStage,
    SharedTableEncodeStage,
    VerifyStage,
    _bcast,
)

# Per-worker-process stage cache: stateless stages run as plain Ray TASKS
# (long-lived workers amortize imports; no per-execution actor-pool startup,
# which measured 3-4x slower for stateless encode). Actor pools are reserved
# for genuinely stateful stages (shared symbol tables, see SharedTableEncode).
_STAGES: dict = {}


def _encode_fn(batch, tokens_codec="auto"):
    key = ("enc", tokens_codec)
    st = _STAGES.get(key)
    if st is None:
        st = _STAGES[key] = EncodeStage(tokens_codec=tokens_codec)
    return st(batch)


def _decode_fn(
    batch, sidecar=None, sources=None, doc_id_range=None, doc_ids=None,
    columns=None,
):
    # row-level filters need their columns decoded even when the caller's
    # projection drops them; decode the union, filter, then project
    decode_cols = None
    if columns is not None:
        need = set(columns)
        if sources is not None:
            need.add("source")
        if doc_id_range is not None or doc_ids is not None:
            need.add("doc_id")
        decode_cols = sorted(need)
    key = ("dec", sidecar, tuple(decode_cols) if decode_cols else None)
    st = _STAGES.get(key)
    if st is None:
        st = _STAGES[key] = DecodeStage(sidecar=sidecar, columns=decode_cols)
    out = st(batch)
    return _apply_row_filters(
        out, sources=sources, doc_id_range=doc_id_range, doc_ids=doc_ids,
        columns=columns,
    )


def _apply_row_filters(
    out: pa.Table, sources=None, doc_id_range=None, doc_ids=None, columns=None
) -> pa.Table:
    """Exact row-level nets under the storage-level pushdowns, plus the
    final projection (shared by the block decode and the fused chunk-fold
    decode paths)."""
    import pyarrow.compute as pc

    if sources is not None:
        # exact row-level net under the source_top pushdown: mixed chunks
        # (source_top="") reach here carrying other sources' rows
        out = out.filter(pc.is_in(out["source"], pa.array(list(sources))))
    if doc_id_range is not None:
        # exact row-level net under the did_min/did_max zone-map pushdown:
        # chunks INTERSECTING the range still carry out-of-range rows
        lo, hi = doc_id_range
        d = out["doc_id"]
        out = out.filter(
            pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi))
        )
    if doc_ids is not None:
        out = out.filter(pc.is_in(out["doc_id"], pa.array(list(doc_ids))))
    if columns is not None:
        drop = [c for c in out.column_names if c not in set(columns)]
        if drop:
            out = out.drop_columns(drop)
    return out


_TRAIN_SAMPLE_FRAGS = 64  # row-group samples: evenly strided over fragments


def _train_shared_tables(paths: list[str]) -> dict:
    """Deterministic driver-side sample — the first row group of up to
    _TRAIN_SAMPLE_FRAGS fragments evenly STRIDED across the sorted input (no
    sorted-path bias: a source that only appears in late fragments is still
    sampled) — trains PER-SOURCE doc_id FSST tables plus a global fallback
    table for sources absent from the sample (SURVEY.md §7 step 6, §4.2).
    Pure function of the input fragments, so a resumed run re-derives
    identical tables and hashes (retry-safe lineage)."""
    import pyarrow.parquet as pq

    from tokenzip.codecs import fsst as F
    from tokenzip.codecs.strings import (
        register_shared_str_dict,
        register_shared_str_table,
    )

    from tokenzip.chunk import _tokens_parts
    from tokenzip.codecs.core import register_shared_rank_table

    spaths = sorted(paths)
    if len(spaths) > _TRAIN_SAMPLE_FRAGS:
        idx = np.linspace(0, len(spaths) - 1, _TRAIN_SAMPLE_FRAGS).astype(int)
        spaths = [spaths[i] for i in sorted(set(idx.tolist()))]
    by_source: dict[str, list[bytes]] = {}
    tok_by_source: dict[str, list[np.ndarray]] = {}
    for p in spaths:
        f = pq.ParquetFile(p)
        t = f.read_row_group(0, columns=["doc_id", "source", "tokens"])
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        for d, s in zip(ids, srcs):
            by_source.setdefault(s, []).append(d.encode())
        lengths, flat = _tokens_parts(t["tokens"])
        su, sinv = np.unique(np.asarray(srcs, dtype=object), return_inverse=True)
        tok_inv = np.repeat(sinv, lengths)
        for ci, s in enumerate(su):
            seg = flat[tok_inv == ci]
            if len(seg):
                tok_by_source.setdefault(str(s), []).append(seg)
    global_hash = register_shared_str_table(
        F.train_symbol_table(b"".join(b"".join(v) for _, v in sorted(by_source.items())))
    )
    src_tables = {
        s: register_shared_str_table(F.train_symbol_table(b"".join(v)))
        for s, v in sorted(by_source.items())
    }
    dict_hash = register_shared_str_dict(sorted(by_source))

    # per-source token frequency-rank tables (shared integer dictionaries):
    # rank 0 = most frequent sampled token; ties break by ascending value
    # (stable argsort), so a resumed run re-derives identical tables/hashes
    _RANK_TABLE_CAP = 1 << 20  # beyond ~1M ranks a rank costs >= 3 bytes
    rank_by_source: dict[str, str] = {}
    for s, arrs in sorted(tok_by_source.items()):
        flat = np.concatenate(arrs).astype(np.int64, copy=False) if arrs else None
        if flat is None or not len(flat):
            continue
        from tokenzip.codecs.core import _unique_inverse_counts
        from tokenzip.codecs.huffman import huff_lengths_any

        uniq, _, counts = _unique_inverse_counts(flat)
        order = np.argsort(-counts, kind="stable")[:_RANK_TABLE_CAP]
        # canonical-Huffman lengths trained on the SAME sample: k table
        # symbols plus the escape (pseudo-count = uncovered sample mass);
        # chunks pick Huffman vs LEB128 ranks per chunk at encode time
        counts_desc = counts[order].astype(np.int64)
        esc_count = max(1, int(len(flat) - counts_desc.sum()))
        lens = huff_lengths_any(np.concatenate([counts_desc, [esc_count]]))
        rank_by_source[s] = register_shared_rank_table(uniq[order], lens)

    from tokenzip.codecs.core import SHARED_RANK_LENS, SHARED_RANK_TABLES
    from tokenzip.codecs.strings import SHARED_STR_DICTS, SHARED_STR_TABLES

    hashes = {global_hash, *src_tables.values()}
    rank_hashes = set(rank_by_source.values())
    return {
        "fsst_tables": {h: SHARED_STR_TABLES[h] for h in hashes},
        "str_dicts": {dict_hash: SHARED_STR_DICTS[dict_hash]},
        "rank_tables": {h: SHARED_RANK_TABLES[h] for h in rank_hashes},
        "rank_lens": {
            h: SHARED_RANK_LENS[h] for h in rank_hashes if h in SHARED_RANK_LENS
        },
        "refs": {
            "doc_id_fsst": global_hash,
            "doc_id_fsst_by_source": src_tables,
            "source_dict": dict_hash,
            "tokens_rank_by_source": rank_by_source,
        },
    }


def _verify_fn(batch, tokens_codec="auto"):
    key = ("ver", tokens_codec)
    st = _STAGES.get(key)
    if st is None:
        st = _STAGES[key] = VerifyStage(tokens_codec=tokens_codec)
    return st(batch)

SINK_JOIN_BUCKETS = 256  # doc_id hash buckets for the sink-verification join

DEFAULT_BATCH_SIZE = 2048  # docs/batch: ~3M tokens ~ 13 MB raw at corpus mix


def _default_concurrency() -> int:
    # leave headroom for the read / write stages so the actor pool doesn't
    # starve them and serialize the pipeline
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus - 2)

_META_COLS = [
    "frag", "chunk_id", "n_rows", "n_tokens", "tokens_codec",
    "bytes_in", "bytes_out", "tokens_bytes_out", "leb128_bytes", "source_top",
]


def _frag_of_path(path: str) -> str:
    """Fragment key: basename + short hash of the FULL path, so sharded
    directories that all contain part-0000.parquet never collide into one
    frag partition (and resume never skips an unprocessed file)."""
    import hashlib

    base = os.path.splitext(os.path.basename(path))[0]
    full = path if uio.is_uri(path) else os.path.abspath(path)
    return f"{base}-{hashlib.sha1(full.encode()).hexdigest()[:8]}"


def _add_frag(batch: pa.Table) -> pa.Table:
    if "frag" in batch.column_names:
        # distributed guard: a LATER input file carrying the reserved
        # column would bypass the driver's first-file schema check and
        # silently shadow lineage — refuse per batch instead
        from tokenzip.errors import ChunkFormatError

        raise ChunkFormatError(
            "input column 'frag' collides with the engine's provenance "
            "columns; rename it before compressing"
        )
    frags = [ _frag_of_path(p) for p in batch["path"].to_pylist() ]
    return batch.drop_columns(["path"]).append_column("frag", pa.array(frags))


def _require_chunk_format(out_dir: str, want: int, feature: str) -> None:
    """Refuse features that need chunk columns an older sink lacks — a
    parquet predicate over a missing column silently prunes EVERY chunk,
    so this must fail loudly, never return empty."""
    from tokenzip.errors import ChunkFormatError

    have = int(Manifest(out_dir).data.get("chunk_format", 1))
    if have < want:
        raise ChunkFormatError(
            f"{feature} needs sink chunk format >= {want}, but {out_dir!r} "
            f"records format {have} (written or appended by an older "
            "engine); re-compress with resume=False"
        )


def _compress_setup(
    input_paths: list[str], out_dir: str, resume: bool
) -> tuple["Manifest", list[str], str, int]:
    """Shared resume scaffolding of compress() and table.compress_table():
    manifest load, done-fragment skip, partial-output wipe, and byte-scaled
    block-count sizing. Returns (manifest, todo_paths, chunks_dir,
    n_blocks); empty todo => nothing left to encode."""
    # out_dir (and the inputs) may be scheme:// URIs — every directory
    # operation here goes through uio (multi-node storage contract)
    chunks_dir = uio.join(out_dir, "chunks")
    man = Manifest(out_dir)
    done = man.done_fragments() if resume else set()
    if not resume and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
        man.data["fragments"] = {}
    elif resume and not done and uio.isdir(chunks_dir):
        # chunk output with no manifest lineage (older manifest version or a
        # run that crashed before its first mark_done): wipe, re-encode
        uio.rmtree(chunks_dir)
    if not done:
        # fresh sink: every chunk will be written at the current format.
        # A resumed sink keeps its recorded format (absent = 1) — appended
        # new-format fragments must NOT upgrade the marker, since pushdown
        # predicates need the columns in EVERY file.
        from tokenzip.chunk import CHUNK_FORMAT

        man.data["chunk_format"] = CHUNK_FORMAT
    todo = [p for p in input_paths if _frag_of_path(p) not in done]
    # wipe partial output of unfinished fragments (crashed prior run)
    for p in todo:
        d = uio.join(chunks_dir, f"frag={_frag_of_path(p)}")
        if uio.isdir(d):
            uio.rmtree(d)
    # split the read below file granularity (row-group level), sized to the
    # actual input bytes: fine-grained blocks balance the encode+write stage
    # best (measured; the fully-fused one-block-per-file layout regresses the
    # write-heavy compress path at higher parallelism, unlike verify).
    # Target block bytes scales with the input (4 MB floor for small runs,
    # 64 MB ceiling at 100 TB) instead of a constant block-count cap.
    total_bytes = sum(uio.file_size(p) for p in todo)
    target_block_bytes = min(64 << 20, max(4 << 20, total_bytes // 256))
    n_blocks = max(len(todo), int(total_bytes / target_block_bytes) or 1)
    return man, todo, chunks_dir, n_blocks


def _sbkt_tag(nb: int):
    """Doc-hash shuffle-bucket tag for the skew-isolation mode: md5 of the
    doc_id (the C span kernel — no per-row Python), folded to a bucket.
    Deterministic under retries/re-sharding, like every hash rule here."""

    def fn(batch: pa.Table) -> pa.Table:
        from tokenzip.hashutil import md5_digests_str

        dig = md5_digests_str(batch["doc_id"].combine_chunks())
        h = dig[:, :8].copy().view(np.int64).ravel()
        bkt = np.abs(h) % nb
        return batch.append_column("sbkt", pa.array(bkt.astype(np.int64)))

    return fn


def _cbkt_tag(bounds: np.ndarray):
    """Range shuffle-bucket tag for the cluster_by="doc_id" layout mode:
    bucket = searchsorted over the sample-derived cut points, so bucket
    order IS doc_id order (deterministic under retries: the bounds are a
    pure function of the sorted input)."""

    def fn(batch: pa.Table) -> pa.Table:
        from tokenzip.training import _bucket_of

        did = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        bkt = _bucket_of(did, bounds)
        return batch.append_column("sbkt", pa.array(bkt.astype(np.int64)))

    return fn


def _cluster_encode_fn(
    g: pa.Table, tokens_codec: str = "auto", tables_ref=None
) -> pa.Table:
    """One range bucket: sort rows by doc_id, re-home lineage to the
    BUCKET (chunks partition per (bucket, source), not per input fragment
    — per-input lineage would explode a re-partitioned layout into
    buckets x fragments x sources tiny chunks), then encode. Consecutive
    chunk windows become tight and near-disjoint, which is what the
    did_min/did_max zone pruning feeds on."""
    import pyarrow.compute as pc

    if not len(g):
        return _group_encode_fn(g, tokens_codec=tokens_codec,
                                tables_ref=tables_ref)
    order = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
    g = g.take(order)
    bkt = int(g["sbkt"][0].as_py())
    g = g.drop_columns(["frag"]).append_column(
        "frag", pa.array([f"cbkt-{bkt:06d}"] * len(g), pa.string())
    )
    return _group_encode_fn(g, tokens_codec=tokens_codec, tables_ref=tables_ref)


def _finish_cluster_compress(
    man, todo: list[str], chunks_dir: str, *, shared_tables: bool
) -> dict:
    """Cluster-mode manifest fold: stats live on the BUCKET fragments
    (cbkt-*), while every input fragment is marked done with zero stats +
    a lineage marker so resume skips it. Resume is all-or-nothing for one
    clustered run (the shuffle re-homes rows, so partial per-input resume
    has no meaning); a crashed run re-encodes from scratch."""
    frags_written = sorted(
        d.split("=", 1)[1]
        for d in uio.listdir(chunks_dir)
        if d.startswith("frag=cbkt-")
    )
    stats = _fold_chunk_meta(chunks_dir, frags_written)
    for frag in frags_written:
        s = stats.get(frag) or {}
        s["shared_tables"] = shared_tables
        man.mark_done(frag, s)
    zero = {
        "n_chunks": 0, "n_rows": 0, "n_tokens": 0, "bytes_in": 0,
        "bytes_out": 0, "tokens_bytes_out": 0, "leb128_bytes": 0,
        "codecs": {}, "shared_tables": shared_tables,
        "clustered_into": "cbkt",
    }
    for p in todo:
        man.mark_done(_frag_of_path(p), dict(zero))
    man.save()
    return man.totals()


def _group_encode_fn(
    g: pa.Table, tokens_codec: str = "auto", tables_ref=None
) -> pa.Table:
    g = g.drop_columns(["sbkt"])
    if tables_ref is None:
        return _encode_fn(g, tokens_codec=tokens_codec)
    # two-phase shared_tables x shuffle_by_source: the group fold encodes
    # with the pre-trained broadcast tables — fetched ONCE per worker
    # process (cached below), never re-shipped per group
    key = ("genc", tokens_codec, tables_ref[0].hex())
    st = _STAGES.get(key)
    if st is None:
        st = _STAGES[key] = SharedTableEncodeStage(
            tables_ref=tables_ref, tokens_codec=tokens_codec
        )
    return st(g)


def _prepare_shared_tables(input_paths: list[str], out_dir: str):
    """Train-and-broadcast prelude of the shared_tables modes: merge any
    existing sidecar (append-only, content-addressed), train on the strided
    deterministic sample, persist the sidecar, return the broadcast ref."""
    from tokenzip.codecs.strings import load_shared_tables, save_shared_tables

    sidecar = uio.join(out_dir, "symbols.json")
    if uio.exists(sidecar):
        # resume: keep every table earlier chunks reference — the sidecar
        # is append-only (tables are content-addressed, so merging is safe)
        load_shared_tables(sidecar)
    tables = _train_shared_tables(input_paths)
    save_shared_tables(sidecar)
    return _bcast(tables)  # wrapped ref: restartable-actor safe


def compress(
    input_paths: list[str],
    out_dir: str,
    *,
    tokens_codec: str = "auto",
    batch_size: int | None = None,
    concurrency: int | None = None,
    resume: bool = True,
    shared_tables: bool = False,
    shuffle_by_source: bool = False,
    shuffle_buckets: int | None = None,
    cluster_by: str | None = None,
) -> dict:
    """Compress input token-table fragments into chunk parquet + manifest.

    Returns the manifest totals. Resumable: fragments already marked done in
    the manifest are not re-read; chunk output of unfinished fragments is
    wiped before re-encoding so a crashed run never double-writes.

    ``shuffle_by_source=True`` is the explicit skew-isolation mode the
    north rule names: the input goes through ONE doc-hash-bucketed groupby
    shuffle before encoding, so a skewed source's long token arrays spread
    evenly across encode tasks instead of straggling whichever fragments
    they cluster in.  Chunk lineage is unchanged (EncodeStage partitions
    each group by (frag, source) internally) and resume semantics are
    unchanged (fragments are marked done only after the full write).  Costs
    one all-to-all pass over the payload — enable it when a source is
    known-skewed, leave the default map-only path otherwise.  Combining it
    with ``shared_tables=True`` runs two-phase: train + broadcast the symbol
    tables first, then encode inside the shuffled group folds — the trained
    tables (and sidecar) are bit-identical to the plain shared-tables mode,
    since they are a pure function of the input fragments.

    ``cluster_by="doc_id"`` is the LAYOUT-optimization mode (a clustering
    index): one range-partitioned shuffle (sample-derived doc_id cut
    points, the pack/sort bound rule) plus an in-group sort writes every
    chunk with a TIGHT, near-disjoint [did_min, did_max] window. Point and
    range decompress then prune to the few chunks that can actually hold
    the request instead of every chunk whose random id window overlaps —
    at 100 TB that's the difference between touching MBs and scanning the
    sink. Decoded content is identical (decompress never assumes order);
    costs one all-to-all pass, like shuffle_by_source, with the same
    lineage/resume contract. The two shuffle modes are mutually exclusive.
    """
    if cluster_by not in (None, "doc_id"):
        raise ValueError(f"cluster_by must be None or 'doc_id', got {cluster_by!r}")
    if cluster_by and shuffle_by_source:
        raise ValueError(
            "cluster_by and shuffle_by_source are mutually exclusive: one "
            "orders the layout by doc_id, the other scatters it by doc hash"
        )
    man, todo, chunks_dir, n_blocks = _compress_setup(input_paths, out_dir, resume)
    if not todo:
        return man.totals()
    ds = ray.data.read_parquet(todo, include_paths=True, override_num_blocks=n_blocks)
    ds = ds.map_batches(_add_frag, batch_format="pyarrow", zero_copy_batch=True)
    if cluster_by:
        from tokenzip.training import _sample_bounds

        if len(man.done_fragments()) > 0:
            # bucket names are positional: appending a second clustered run
            # would collide with (and the fresh-run wipe below would
            # destroy) the first run's buckets — refuse loudly
            raise ValueError(
                "cluster_by requires a FRESH sink: this sink already has "
                "completed fragments; recompress the full input, or append "
                "with the plain layout"
            )
        for d in uio.listdir(chunks_dir) if uio.isdir(chunks_dir) else []:
            # stale buckets of a crashed clustered run (resume is
            # all-or-nothing here: rows are re-homed across buckets)
            if d.startswith("frag=cbkt-"):
                uio.rmtree(uio.join(chunks_dir, d))
        tables_ref = (
            _prepare_shared_tables(input_paths, out_dir) if shared_tables else None
        )
        nb = int(shuffle_buckets or max(32, 2 * n_blocks))
        bounds = _sample_bounds(todo, nb)
        ds = (
            ds.map_batches(
                _cbkt_tag(bounds), batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("sbkt")
            .map_groups(
                _cluster_encode_fn,
                batch_format="pyarrow",
                fn_kwargs={
                    "tokens_codec": tokens_codec,
                    "tables_ref": tables_ref,
                },
            )
        )
        ds.write_parquet(
            chunks_dir,
            partition_cols=["frag"],
            compression="none",
            row_group_size=8,
        )
        return _finish_cluster_compress(
            man, todo, chunks_dir, shared_tables=shared_tables
        )
    if shuffle_by_source:
        # combines with shared_tables two-phase: train + broadcast tables
        # FIRST (phase 1), then the shuffled group folds encode with them
        # (phase 2) — bit-identical to plain shared_tables on an unskewed
        # corpus, since the tables are a pure function of the input
        tables_ref = (
            _prepare_shared_tables(input_paths, out_dir) if shared_tables else None
        )
        nb = int(shuffle_buckets or max(32, 2 * n_blocks))
        ds = (
            ds.map_batches(_sbkt_tag(nb), batch_format="pyarrow", zero_copy_batch=True)
            .groupby("sbkt")
            .map_groups(
                _group_encode_fn,
                batch_format="pyarrow",
                fn_kwargs={
                    "tokens_codec": tokens_codec,
                    "tables_ref": tables_ref,
                },
            )
        )
        ds.write_parquet(
            chunks_dir,
            partition_cols=["frag"],
            compression="none",
            row_group_size=8,
        )
        return _finish_compress(man, todo, chunks_dir, shared_tables=shared_tables)
    if shared_tables:
        # stateful path: train once on a deterministic sample, broadcast to
        # an actor pool, persist the sidecar + hashes for decode and lineage
        tables_ref = _prepare_shared_tables(input_paths, out_dir)
        ds = ds.map_batches(
            SharedTableEncodeStage,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency or _default_concurrency(),
            fn_constructor_kwargs={
                "tables_ref": tables_ref,
                "tokens_codec": tokens_codec,
            },
        )
    else:
        kwargs = dict(
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,  # None => one batch per block (no re-bundling)
            fn_kwargs={"tokens_codec": tokens_codec},
        )
        if concurrency:
            kwargs["concurrency"] = concurrency
        ds = ds.map_batches(_encode_fn, **kwargs)
    # chunk payloads are already compressed by the engine's own codecs —
    # parquet-level recompression would burn CPU for ~0 gain. Small row
    # groups (chunk rows are ~MB each and already source-clustered within
    # a fragment) give the decompress source-pushdown row-group-level I/O
    # pruning, not just row-level decode pruning.
    ds.write_parquet(
        chunks_dir,
        partition_cols=["frag"],
        compression="none",
        row_group_size=8,
    )

    return _finish_compress(man, todo, chunks_dir, shared_tables=shared_tables)


def _finish_compress(man, todo: list[str], chunks_dir: str, *, shared_tables: bool) -> dict:
    """Fold chunk metadata into the per-fragment manifest (metadata columns
    only — column-pruned read of the chunk files, no payload bytes move).
    EVERY todo fragment gets marked done — a fragment that produced zero
    chunk rows (hence no frag= dir) records zero stats instead of being
    re-read on every resume."""
    frags_written = {
        d.split("=", 1)[1]
        for d in uio.listdir(chunks_dir)
        if d.startswith("frag=")
    }
    zero = {
        "n_chunks": 0, "n_rows": 0, "n_tokens": 0, "bytes_in": 0,
        "bytes_out": 0, "tokens_bytes_out": 0, "leb128_bytes": 0,
        "codecs": {}, "shared_tables": shared_tables,
    }
    todo_frags = [_frag_of_path(p) for p in todo]  # todo already excludes done
    fold_frags = sorted(set(todo_frags) & frags_written)
    stats = _fold_chunk_meta(chunks_dir, fold_frags)
    for frag in todo_frags:
        s = stats.get(frag)
        if s is None:
            man.mark_done(frag, dict(zero))
        else:
            s["shared_tables"] = shared_tables
            man.mark_done(frag, s)
    man.save()
    return man.totals()


_FOLD_COLS = ("n_rows", "n_tokens", "bytes_in", "bytes_out",
              "tokens_bytes_out", "leb128_bytes")


def _meta_fold_partial(batch: pa.Table) -> pa.Table:
    """Pre-aggregated per-(frag, codec) partial of one metadata block.
    The composite key is an INDEX PAIR (no string separator — a frag name
    could contain any byte, and numpy U-dtype strips NULs)."""
    frags = np.array(
        [p.rsplit("/frag=", 1)[1].split("/", 1)[0]
         for p in batch["path"].to_pylist()]
    )
    codecs = batch["tokens_codec"].to_numpy(zero_copy_only=False)
    uf, fi = np.unique(frags, return_inverse=True)
    uc, ci = np.unique(codecs, return_inverse=True)
    key = fi * max(1, len(uc)) + ci
    uniq, inv = np.unique(key, return_inverse=True)
    k = len(uniq)
    cols = {
        "frag": pa.array([str(uf[u // max(1, len(uc))]) for u in uniq], pa.string()),
        "codec": pa.array([str(uc[u % max(1, len(uc))]) for u in uniq], pa.string()),
        "n_chunks": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
    }
    for c in _FOLD_COLS:
        v = batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.zeros(k, dtype=np.int64)
        np.add.at(out, inv, v)
        cols[c] = pa.array(out)
    return pa.table(cols)


def _fold_chunk_meta(chunks_dir: str, frags: list[str]) -> dict[str, dict]:
    """Fold chunk metadata into per-fragment manifest stats. Small runs use
    a serial column-pruned read (cheaper than one Ray execution); beyond
    _SERIAL_FOLD_MAX fragments the fold is a distributed map over the
    metadata columns with per-block pre-aggregation — the driver only sees
    ~blocks x codecs tiny partial rows, never an O(fragments) scan loop."""
    out: dict[str, dict] = {}
    if not frags:
        return out
    if len(frags) <= _SERIAL_FOLD_MAX:
        # thread pool, not a serial loop: parquet footer+column reads release
        # the GIL and are latency-bound, so 32 fragments fold in ~1 read's
        # wall time instead of 32 (measured 0.3-1.2 s serial at sf0.1)
        from concurrent.futures import ThreadPoolExecutor

        def _one(frag: str) -> tuple[str, dict]:
            t = pq.read_table(
                os.path.join(chunks_dir, f"frag={frag}"),
                columns=list(_FOLD_COLS) + ["tokens_codec"],
            )
            codecs, counts = np.unique(
                t["tokens_codec"].to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return frag, {
                "n_chunks": t.num_rows,
                **{c: int(pa.compute.sum(t[c]).as_py() or 0) for c in _FOLD_COLS},
                "codecs": {str(c): int(n) for c, n in zip(codecs, counts)},
            }

        with ThreadPoolExecutor(max_workers=min(16, len(frags))) as ex:
            out.update(ex.map(_one, frags))
        return out
    files = [
        uio.join(chunks_dir, f"frag={f}", name)
        for f in frags
        for name in uio.listdir(uio.join(chunks_dir, f"frag={f}"))
        if name.endswith(".parquet")
    ]
    partials = (
        ray.data.read_parquet(
            files,
            columns=list(_FOLD_COLS) + ["tokens_codec"],
            include_paths=True,
        )
        .map_batches(_meta_fold_partial, batch_format="pyarrow")
        .take_all()
    )
    for r in partials:
        frag, codec = r["frag"], r["codec"]
        s = out.setdefault(
            frag, {"n_chunks": 0, **{c: 0 for c in _FOLD_COLS}, "codecs": {}}
        )
        s["n_chunks"] += int(r["n_chunks"])
        for c in _FOLD_COLS:
            s[c] += int(r[c])
        s["codecs"][codec] = s["codecs"].get(codec, 0) + int(r["n_chunks"])
    return out


_SERIAL_FOLD_MAX = 256


def chunk_meta_dataset(out_dir: str) -> "ray.data.Dataset":
    """Chunk-level metadata (no payloads) as a Dataset — the lineage view."""
    return ray.data.read_parquet(
        os.path.join(out_dir, "chunks"), columns=[c for c in _META_COLS if c != "frag"]
    )


def _bytes_based_blocks(paths: list[str], target: int = 16 << 20) -> int:
    """Block count sized to input bytes (~``target`` bytes per block):
    balances map stages at high parallelism — one-block-per-file leaves the
    slowest shard gating the stage; one-block-per-tiny-file drowns the
    scheduler in per-task overhead."""
    total = sum(uio.file_size(p) for p in paths)
    return int(total / target) or 1


def _bloom_survivors(chunks_dir: str, zone_expr, doc_ids: list[str]) -> list[str]:
    """chunk_ids (within the zone-surviving set) whose did_bloom bitset
    hits at least one requested doc id. Distributed: the probe pass reads
    ONLY (chunk_id, did_bloom) of zone-surviving chunks — payload blobs
    stay on disk — and returns a list bounded by ~#requested ids plus the
    bloom's fpr share. An empty/absent bitset means "must read" (sound
    under compaction mixes and future formats)."""
    from tokenzip.bloom import bloom_probe
    from tokenzip.chunk import _DID_BLOOM_SALT
    from tokenzip.hashutil import md5_hi60_str

    want = md5_hi60_str(pa.array(list(doc_ids), pa.string()), _DID_BLOOM_SALT)

    def probe(b: pa.Table) -> pa.Table:
        keep = []
        cids = b["chunk_id"].to_pylist()
        blobs = b["did_bloom"].to_pylist()  # per CHUNK row, not per doc
        for cid, blob in zip(cids, blobs):
            if not blob:
                keep.append(cid)
                continue
            words = np.frombuffer(blob, dtype=np.uint64)
            if bool(bloom_probe(words, want).any()):
                keep.append(cid)
        return pa.table({"chunk_id": pa.array(keep, pa.string())})

    ds = ray.data.read_parquet(
        chunks_dir, columns=["chunk_id", "did_bloom"], filter=zone_expr
    ).map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    return [r["chunk_id"] for r in ds.take_all()]


_BLOBS_FOR_COL = {
    "tokens": ("tokens_enc", "offsets_enc"),
    "n_tok": ("n_tok_enc", "offsets_enc"),  # may be derived from offsets
    "doc_id": ("doc_id_enc",),
    "source": ("source_enc",),
}


def _chunks_read(
    out_dir: str,
    sources: list[str] | None = None,
    doc_id_range: tuple[str, str] | None = None,
    doc_ids: list[str] | None = None,
    columns: list[str] | None = None,
):
    """(chunk Dataset | None, sidecar | None) for a written sink — shared
    read-shape of decompress and the fused sink-audit path. ``sources``
    pushes a predicate into the parquet read: single-source chunks
    (source_top set) outside the list are pruned at the storage layer —
    their encoded payloads never leave disk; mixed chunks (source_top="")
    are always read and row-filtered after decode by the caller.
    ``doc_id_range``/``doc_ids`` push did_min/did_max zone-map predicates
    the same way (chunks whose doc-id range can't contain the request are
    pruned before their payloads are read)."""
    chunks_dir = uio.join(out_dir, "chunks")
    sized = [
        (p, sz) for p, sz in uio.walk_files(chunks_dir) if p.endswith(".parquet")
    ]
    if not sized:
        return None, None
    files = [p for p, _ in sized]
    sizes = [sz for _, sz in sized]
    # memory is bounded by the block size (~16 MB compressed -> ~50 MB
    # decoded), NOT by an explicit batch_size: a batch_size breaks
    # ReadParquet->decode operator fusion and pays a plasma hop per block.
    # Block count is CPU-AWARE (measured, sf0.1/192MB): at 2 cpus fewer,
    # bigger blocks win (per-task overhead dominates — 12 blocks 2.6s vs 64
    # blocks 3.7s); at 8+ cpus one-block-per-file wins (1.2-1.4s vs 1.7s).
    # Splitting BELOW file granularity regressed everywhere (128 blocks
    # 2.6s, 320 blocks 3.2s at 8 cpus) — never exceed len(files) unless a
    # single file is straggler-big (>2x the 64 MB target).
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    want = max(8, 4 * cpus)
    total_bytes = sum(sizes)
    n_blocks = min(len(files), want)
    if max(sizes) > (128 << 20):
        # skewed sink (one giant file): allow sub-file splits at ~64 MB
        n_blocks = max(n_blocks, int(total_bytes / (64 << 20)) or 1)
    read_kwargs = {}
    expr = None
    if sources is not None:
        import pyarrow.compute as pc

        expr = pc.field("source_top").isin(list(sources) + [""])
    if doc_id_range is not None or doc_ids is not None:
        import pyarrow.compute as pc

        _require_chunk_format(out_dir, 2, "doc-id pushdown")
        if doc_id_range is not None:
            lo, hi = doc_id_range
            # chunk survives iff [did_min, did_max] intersects [lo, hi]
            dexpr = (pc.field("did_min") <= hi) & (pc.field("did_max") >= lo)
        else:
            # point lookups: one interval-containment term per id (a
            # driver-built expression over scalar columns, evaluated at the
            # parquet layer — precise per-chunk pruning, no payload reads)
            terms = [
                (pc.field("did_min") <= d) & (pc.field("did_max") >= d)
                for d in doc_ids
            ]
            dexpr = terms[0]
            for t in terms[1:]:
                dexpr = dexpr | t
            # format-3 sinks also carry per-chunk doc-id bloom bitsets:
            # a distributed probe pass over (chunk_id, did_bloom) of the
            # zone-surviving chunks drops the ones whose id RANGE matches
            # but which provably don't hold any requested id (scattered
            # ids make range maps overlap everything; blooms still prune)
            have_fmt = int(Manifest(out_dir).data.get("chunk_format", 1))
            if have_fmt >= 3:
                keep = _bloom_survivors(chunks_dir, dexpr, list(doc_ids))
                # typed empty set: isin([]) binds as null-typed and fails
                dexpr = dexpr & pc.field("chunk_id").isin(
                    pa.array(keep, pa.string())
                )
        expr = dexpr if expr is None else (expr & dexpr)
    if expr is not None:
        read_kwargs["filter"] = expr
    # the payload read never needs the bloom bitsets (the probe phase
    # reads them separately) — prune the column so ~2 B/doc stays on disk.
    # Only for sinks recorded at format >= 3: older sinks lack the column
    # and an explicit list naming it would fail their reads.
    if columns is not None:
        # PROJECTION pushdown: only the blobs the requested output columns
        # decode from leave storage — an id-only query over a 100-TB sink
        # never reads the token payload bytes at all. The scalar meta the
        # decoder needs rides along (n_rows/n_tokens); filter columns
        # (source_top/did_*) need not be projected for the parquet
        # predicate to apply.
        blobs: set[str] = set()
        for c in columns:
            blobs.update(_BLOBS_FOR_COL[c])
        read_kwargs["columns"] = ["chunk_id", "n_rows", "n_tokens"] + sorted(blobs)
    elif int(Manifest(out_dir).data.get("chunk_format", 1)) >= 3:
        from tokenzip.chunk import CHUNK_SCHEMA

        # neither zone bitsets nor content checksums are decode inputs;
        # format-3 sinks also lack the content_chk column entirely, so
        # naming it would fail their reads
        read_kwargs["columns"] = [
            f.name
            for f in CHUNK_SCHEMA
            if f.name not in ("did_bloom", "content_chk")
        ]
    ds = ray.data.read_parquet(
        chunks_dir, override_num_blocks=n_blocks, **read_kwargs
    )
    sidecar = uio.join(out_dir, "symbols.json")
    return ds, (sidecar if uio.exists(sidecar) else None)


_EMPTY_TOKENS_TABLE = pa.table(
    {
        "doc_id": pa.array([], pa.string()),
        "tokens": pa.array([], pa.list_(pa.int32())),
        "n_tok": pa.array([], pa.int32()),
        "source": pa.array([], pa.string()),
    }
)


def decompress(
    out_dir: str,
    concurrency: int | None = None,
    sources: list[str] | None = None,
    doc_id_range: tuple[str, str] | None = None,
    doc_ids: list[str] | None = None,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Read chunk parquet -> decode -> Dataset with the original schema.

    ``sources`` selects a subset of sources WITH storage-level pruning:
    single-source chunks outside the list are dropped by a parquet
    predicate on ``source_top`` (their encoded payloads are never read or
    decoded); mixed-source chunks are decoded and row-filtered exactly.

    ``doc_id_range=(lo, hi)`` (lexicographic, inclusive) and
    ``doc_ids=[...]`` (point lookups) prune the same way on the chunks'
    did_min/did_max doc-id zone maps — random access into a 100-TB sink
    touches only the chunks whose id range can contain the request.
    Requires a sink written entirely at chunk format >= 2 (fails loudly
    otherwise). The two doc filters are mutually exclusive.
    """
    if doc_id_range is not None and doc_ids is not None:
        raise ValueError("pass doc_id_range OR doc_ids, not both")
    decode_cols = None
    if columns is not None:
        from tokenzip.chunk import TOKEN_OUT_COLS

        unknown = set(columns) - set(TOKEN_OUT_COLS)
        if unknown:
            raise ValueError(f"unknown sink columns: {sorted(unknown)}")
        # the parquet read must carry the blobs the row-level filters
        # decode from, even when the caller's projection drops them
        need = set(columns)
        if sources is not None:
            need.add("source")
        if doc_id_range is not None or doc_ids is not None:
            need.add("doc_id")
        decode_cols = sorted(need)
    ds, sidecar = _chunks_read(
        out_dir, sources=sources, doc_id_range=doc_id_range, doc_ids=doc_ids,
        columns=decode_cols,
    )
    if ds is None:
        # zero-chunk run (every fragment produced no chunks): an empty
        # dataset with the original schema, not override_num_blocks=0
        empty = ray.data.from_arrow(_EMPTY_TOKENS_TABLE)
        if columns is not None:
            empty = empty.select_columns(list(columns))
        return empty
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={
            "sidecar": sidecar,
            "sources": sources,
            "doc_id_range": doc_id_range,
            "doc_ids": doc_ids,
            "columns": columns,
        },
    )
    if concurrency:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(_decode_fn, **kwargs)


def _decode_map_fn(
    batch: pa.Table, sidecar=None, udf=None, sources=None, doc_id_range=None,
    doc_ids=None, columns=None, decode_cols=None,
) -> pa.Table:
    """Fused CHUNK-LEVEL decode -> user fold: each chunk (<= ~8 MB decoded)
    is handed to ``udf`` immediately after its own decode while the decoded
    buffer is still cache-hot; the full decoded block table is never
    assembled. Same shape as the sink audit's _decode_checksum_fn — the
    0.998-scaling-efficiency consumer — generalized to any per-batch fn."""
    from tokenzip.chunk import decode_chunk_row
    from tokenzip.stages import DecodeStage

    key = ("decmap", sidecar)
    dec = _STAGES.get(key)
    if dec is None:
        # reuse DecodeStage only for its one-time sidecar load
        dec = _STAGES[key] = DecodeStage(sidecar=sidecar)
    if dec.sidecar and not dec._loaded:
        if uio.exists(dec.sidecar):
            from tokenzip.codecs.strings import load_shared_tables

            load_shared_tables(dec.sidecar)
        dec._loaded = True

    def cell(k, i):
        v = batch[k][i]
        if isinstance(v, (pa.LargeBinaryScalar, pa.BinaryScalar)):
            buf = v.as_buffer()
            return memoryview(buf) if buf is not None else b""
        return v.as_py()

    names = [c for c in batch.column_names if c not in ("frag", "frag_src")]
    parts = []
    for i in range(batch.num_rows):
        t = decode_chunk_row({k: cell(k, i) for k in names}, decode_cols)
        t = _apply_row_filters(
            t, sources=sources, doc_id_range=doc_id_range, doc_ids=doc_ids,
            columns=columns,
        )
        r = udf(t)
        if r is not None and len(r):
            parts.append(r)
    if parts:
        return pa.concat_tables(parts)
    # schema-stable empty: the udf's schema on an empty decoded table (udfs
    # must be empty-safe — every partial-fold here already is)
    empty = _EMPTY_TOKENS_TABLE
    proj = columns if columns is not None else decode_cols
    if proj is not None:
        empty = empty.select([c for c in empty.column_names if c in set(proj)])
    return udf(empty).slice(0, 0)


def decompress_map(
    out_dir: str,
    fn,
    *,
    concurrency: int | None = None,
    sources: list[str] | None = None,
    doc_id_range: tuple[str, str] | None = None,
    doc_ids: list[str] | None = None,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Fold-at-source decode: ``decompress(...).map_batches(fn)`` with the
    decode and the consumer fused into ONE stage at CHUNK granularity.

    The plain ``decompress`` Dataset is the right product when the decoded
    table itself is the deliverable, but a 100-TB consumer usually folds it
    (stats, filters, checksums, re-encode) — and materializing decoded
    blocks through the object store just to feed a downstream map is the
    measured 2->8 scaling ceiling of the plain path (DRAM/plasma-bound, not
    CPU-bound). Here ``fn`` (pyarrow.Table -> pyarrow.Table, empty-safe)
    runs on each decoded chunk while its buffer is cache-hot inside the
    decode task, so decoded tokens never form block tables at all — the
    verify path's 0.998-efficiency shape, generalized. Same pushdown
    arguments as ``decompress``.

    Model: the reference's inlined stream-walk consumer
    (/root/reference/benches/varint_bench/main.rs:74-81 — decode feeds the
    next op, never a buffer)."""
    if doc_id_range is not None and doc_ids is not None:
        raise ValueError("pass doc_id_range OR doc_ids, not both")
    decode_cols = None
    if columns is not None:
        from tokenzip.chunk import TOKEN_OUT_COLS

        unknown = set(columns) - set(TOKEN_OUT_COLS)
        if unknown:
            raise ValueError(f"unknown sink columns: {sorted(unknown)}")
        need = set(columns)
        if sources is not None:
            need.add("source")
        if doc_id_range is not None or doc_ids is not None:
            need.add("doc_id")
        decode_cols = sorted(need)
    ds, sidecar = _chunks_read(
        out_dir, sources=sources, doc_id_range=doc_id_range, doc_ids=doc_ids,
        columns=decode_cols,
    )
    if ds is None:
        empty = _EMPTY_TOKENS_TABLE
        if columns is not None:
            empty = empty.select(list(columns))
        return ray.data.from_arrow(fn(empty).slice(0, 0))
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={
            "sidecar": sidecar,
            "udf": fn,
            "sources": sources,
            "doc_id_range": doc_id_range,
            "doc_ids": doc_ids,
            "columns": columns,
            "decode_cols": decode_cols,
        },
    )
    if concurrency:
        kwargs["concurrency"] = concurrency
    out = ds.map_batches(_decode_map_fn, **kwargs)
    # seed one schema-stable empty block: a pushdown that prunes EVERY chunk
    # file leaves a block-less dataset with no schema at all — the seed makes
    # zero-match results carry the fn's output schema (one tiny extra block)
    empty_in = _EMPTY_TOKENS_TABLE
    if columns is not None:
        empty_in = empty_in.select(list(columns))
    return ray.data.from_arrow(fn(empty_in).slice(0, 0)).union(out)


_COMPACT_MOD = (1 << 61) - 1


def _chunkid_checksum(ids) -> int:
    """Order-invariant chunk-id multiset checksum (sum of md5-hi60 mod a
    Mersenne prime) — the compaction audit's equality key."""
    from tokenzip.hashutil import md5_hi60_str

    if not len(ids):
        return 0
    h = md5_hi60_str(ids).astype(np.uint64)
    # exact big-int sum: a uint64 .sum() wraps mod 2^64, which is NOT
    # congruent mod the Mersenne prime, so the checksum would depend on
    # the grouping; object-dtype summation is chunk-METADATA-sized
    return int(h.astype(object).sum()) % _COMPACT_MOD


def compact(
    out_dir: str,
    dst_dir: str,
    *,
    target_bytes: int = 256 << 20,
    concurrency: int | None = None,
) -> dict:
    """Merge a sink's chunk files into ~``target_bytes`` parquet files —
    the small-file compaction a long-lived 100-TB sink needs (compress
    writes one file per input fragment; millions of fragments mean
    millions of small files, which tax every subsequent listing and read).

    Chunk ROWS are copied verbatim (no re-encode — the payloads are
    already engine-compressed); rows are sorted by (source_top, chunk_id)
    inside each output file and written in small row groups so the
    decompress source-pushdown keeps pruning at row-group granularity.
    The manifest and shared-table sidecar are copied; totals are
    unchanged. Audited: every group asserts rows-read == rows-written and
    the global chunk-id multiset checksum must match the source's.

    Planning reads only file METADATA (paths + sizes) on the driver; all
    row bytes move inside Ray tasks, one per output file.
    """
    src_chunks = uio.join(out_dir, "chunks")
    files = sorted(
        (p, sz) for p, sz in uio.walk_files(src_chunks) if p.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no chunk files under {src_chunks}")
    # greedy size packing, deterministic order
    groups: list[list[str]] = [[]]
    acc = 0
    for p, sz in files:
        if groups[-1] and acc + sz > target_bytes:
            groups.append([])
            acc = 0
        groups[-1].append(p)
        acc += sz
    dst_chunks = uio.join(dst_dir, "chunks")

    def _merge(row: dict) -> dict:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        tables = []
        for p in row["files"]:
            if uio.is_uri(p):
                fs, pp = uio._fs(p)
                t1 = _pq.read_table(pp, filesystem=fs)
            else:
                t1 = _pq.read_table(p)
            # compacted rows carry EXACTLY the chunk schema — no extra
            # lineage column, so a later compress APPEND into the compacted
            # sink (new frag= dirs) reads with one uniform schema. Per-chunk
            # frag provenance is dropped; chunk_id is content-derived and
            # the manifest keeps per-fragment aggregates.
            if "frag_src" in t1.column_names:
                t1 = t1.drop_columns(["frag_src"])
            tables.append(t1)
        t = pa.concat_tables(tables, promote_options="none")
        # token sinks sort by (source_top, chunk_id) for pushdown locality;
        # generic-table sinks (tokenzip.table) carry neither column — sort
        # by whatever subset exists
        keys = [
            (c, "ascending")
            for c in ("source_top", "chunk_id")
            if c in t.column_names
        ]
        if keys:
            t = t.take(_pc.sort_indices(t, sort_keys=keys))
        sink = pa.BufferOutputStream()
        _pq.write_table(t, sink, compression="none", row_group_size=16)
        # stay inside the hive frag= layout so compress can APPEND new
        # fragments to a compacted sink (mixed flat + hive layouts break
        # the dataset read); "__compacted__" can never collide with a real
        # fragment key (those are basename-sha1 pairs)
        out_path = uio.join(
            dst_chunks,
            f"frag=__compacted__-{int(row['gid']):06d}",
            "part-0.parquet",
        )
        uio.write_bytes_atomic(out_path, sink.getvalue().to_pybytes())
        chk = (
            _chunkid_checksum(t["chunk_id"])
            if "chunk_id" in t.column_names
            else 0
        )
        return {
            "gid": int(row["gid"]),
            "n_chunks": t.num_rows,
            "chk": chk,
            "bytes": len(sink.getvalue()),
        }

    specs = [{"gid": i, "files": g} for i, g in enumerate(groups)]
    audit = (
        ray.data.from_items(specs)
        .map(_merge, concurrency=concurrency or _default_concurrency())
        .to_pandas()
    )
    man = Manifest(out_dir)
    n_manifest = int(man.totals().get("n_chunks", 0))
    n_written = int(audit["n_chunks"].sum())
    if n_manifest and n_written != n_manifest:
        raise RuntimeError(
            f"compaction audit failed: wrote {n_written} chunk rows, "
            f"manifest records {n_manifest}"
        )
    # copy manifest + sidecar, stamp provenance
    dman = Manifest(dst_dir)
    dman.data = dict(man.data)
    dman.data["compacted_from"] = out_dir
    dman.save()
    sidecar = uio.join(out_dir, "symbols.json")
    if uio.exists(sidecar):
        uio.write_bytes_atomic(
            uio.join(dst_dir, "symbols.json"), uio.read_bytes(sidecar)
        )
    return {
        "n_files_in": len(files),
        "n_files_out": len(groups),
        "n_chunks": n_written,
        "bytes_out": int(audit["bytes"].sum()),
        "chunk_checksum": int(audit["chk"].sum() % _COMPACT_MOD),
    }


class _DocChecksumStage:
    """Per-row content checksums of an original-schema batch: an
    order-sensitive polynomial hash of the zigzagged token stream (uint64
    wraparound, fully vectorized via cumsum differencing), combined with
    n_tok and an md5-derived source hash. Emits one tiny row per doc —
    the sink-verification join shuffles ONLY these checksums, never token
    payloads. ``side`` marks original ('o') vs decoded ('d') rows."""

    _B = np.uint64(1099511628211)          # FNV-1a prime (odd => invertible)
    _C = np.uint64(0x100000001B3)
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    # token budget per internal slice: bounds the stage's live NumPy
    # temporaries (~6 arrays x budget x 8B ~ 100 MB) so a worker's malloc
    # arena stays small — first-touch page faults on this VM class cost
    # ~50us/page (host demand paging), so arena growth, not compute, was
    # the dominant cost of large batches
    SLICE_TOKENS = 2_000_000

    def __init__(self, side: str):
        self.is_o = 1 if side == "o" else 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n_tok.sum())
        if total <= self.SLICE_TOKENS or batch.num_rows < 2:
            return self._compute(batch)
        parts = []
        cum = np.cumsum(n_tok)
        start = 0
        while start < batch.num_rows:
            base = cum[start - 1] if start else 0
            end = int(np.searchsorted(cum, base + self.SLICE_TOKENS)) + 1
            end = max(start + 1, min(end, batch.num_rows))
            parts.append(self._compute(batch.slice(start, end - start)))
            start = end
        return pa.concat_tables(parts)

    def _compute(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts
        from tokenzip.codecs.native import native_byte_chk, native_doc_chk_i32
        from tokenzip.codecs.varint import zigzag_encode

        lengths, values = _tokens_parts(batch["tokens"])
        n = len(lengths)
        starts = np.zeros(n + 1, np.int64)
        np.cumsum(lengths, out=starts[1:])
        total = int(starts[-1])
        with np.errstate(over="ignore"):
            # token-stream checksum + per-doc sums: ONE fused C pass
            # (Horner) when native is built — the NumPy construction below
            # is ~8 full-array uint64 passes and was the sink audit's
            # scaling bottleneck (DRAM-bound)
            nat = native_doc_chk_i32(
                values, starts, int(self._MIX), int(self._B)
            )
            if nat is not None:
                tok_hash, tv = nat
            else:
                maxlen = int(lengths.max()) if n else 0
                powers = np.ones(maxlen + 1, np.uint64)
                if maxlen:
                    np.cumprod(np.full(maxlen, self._B, np.uint64), out=powers[1:])
                w = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], lengths)
                zz = zigzag_encode(values, 32).astype(np.uint64)
                terms = (zz + self._MIX) * powers[w]
                cs = np.zeros(total + 1, np.uint64)
                np.cumsum(terms, out=cs[1:])
                tok_hash = cs[starts[1:]] - cs[starts[:-1]]
                tvs = np.zeros(total + 1, np.int64)
                np.cumsum(values, dtype=np.int64, out=tvs[1:])
                tv = tvs[starts[1:]] - tvs[starts[:-1]]

            src = batch["source"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(src, return_inverse=True)
            import hashlib

            uh = np.array(
                [
                    int.from_bytes(hashlib.md5(str(s).encode()).digest()[:8], "little")
                    for s in uniq
                ],
                dtype=np.uint64,
            )
            n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
            h = tok_hash * self._B + n_tok.astype(np.uint64) * self._C + uh[inv]

            # partition key: vectorized polynomial hash of the doc_id BYTES
            # (both sides compute it identically, so a doc's two rows land
            # in the same reduce bucket without shuffling strings twice)
            did = batch["doc_id"]
            did = did.combine_chunks() if isinstance(did, pa.ChunkedArray) else did
            doffs = np.frombuffer(did.buffers()[1], dtype=np.int32)[
                did.offset : did.offset + n + 1
            ].astype(np.int64)
            dstart = doffs - doffs[0]
            dbytes_u8 = np.frombuffer(did.buffers()[2], dtype=np.uint8)[
                doffs[0] : doffs[-1]
            ]
            did_hash = native_byte_chk(
                dbytes_u8, dstart, int(self._MIX), int(self._B)
            )
            if did_hash is None:
                dbytes = dbytes_u8.astype(np.uint64)
                dlens = np.diff(doffs)
                dmax = int(dlens.max()) if n else 0
                dpow = np.ones(dmax + 1, np.uint64)
                if dmax:
                    np.cumprod(np.full(dmax, self._B, np.uint64), out=dpow[1:])
                dw = np.arange(len(dbytes), dtype=np.int64) - np.repeat(
                    dstart[:-1], dlens
                )
                dterms = (dbytes + self._MIX) * dpow[dw]
                dcs = np.zeros(len(dbytes) + 1, np.uint64)
                np.cumsum(dterms, out=dcs[1:])
                did_hash = dcs[dstart[1:]] - dcs[dstart[:-1]]
        o = np.int64(self.is_o)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "p": pa.array((did_hash % np.uint64(SINK_JOIN_BUCKETS)).astype(np.int32)),
                "dh": pa.array(did_hash.view(np.int64)),
                "h": pa.array(h.view(np.int64)),
                "is_o": pa.array(np.full(n, o)),
                "n_tok_o": pa.array(n_tok * o),
                "tv_o": pa.array(tv * o),
            }
        )


class _BucketDigestStage:
    """Fold per-doc checksum rows into per-(source, bucket) DIGESTS: doc
    count and an order-insensitive wrapping sum of mix(doc_id_hash, row
    checksum). Two sides whose digests agree bucket-by-bucket are equal
    w.h.p.; only mismatched buckets need the per-doc drill-down. This keeps
    the sink-verification shuffle CONSTANT-SIZE (sources x buckets rows)
    regardless of corpus size — the merkle-bucket pattern."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        key = inv * SINK_JOIN_BUCKETS + p
        k = len(uniq) * SINK_JOIN_BUCKETS
        with np.errstate(over="ignore"):
            dh = batch["dh"].to_numpy(zero_copy_only=False).view(np.uint64)
            h = batch["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            mix = dh * np.uint64(0x9E3779B97F4A7C15) + h
        is_o = batch["is_o"].to_numpy(zero_copy_only=False).astype(bool)
        out = {}
        n_o = np.bincount(key[is_o], minlength=k).astype(np.int64)
        n_d = np.bincount(key[~is_o], minlength=k).astype(np.int64)
        hs_o = np.zeros(k, np.uint64)
        hs_d = np.zeros(k, np.uint64)
        with np.errstate(over="ignore"):
            np.add.at(hs_o, key[is_o], mix[is_o])
            np.add.at(hs_d, key[~is_o], mix[~is_o])
        ntok = np.zeros(k, np.int64)
        tv = np.zeros(k, np.int64)
        np.add.at(ntok, key, batch["n_tok_o"].to_numpy(zero_copy_only=False))
        np.add.at(tv, key, batch["tv_o"].to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(n_o + n_d)
        return pa.table(
            {
                "source": pa.array(
                    [str(uniq[i // SINK_JOIN_BUCKETS]) for i in nz], pa.string()
                ),
                "p": pa.array((nz % SINK_JOIN_BUCKETS).astype(np.int32)),
                "n_o": pa.array(n_o[nz]),
                "n_d": pa.array(n_d[nz]),
                "hs_o": pa.array(hs_o[nz].view(np.int64)),
                "hs_d": pa.array(hs_d[nz].view(np.int64)),
                "sum_n_tok": pa.array(ntok[nz]),
                "sum_tv": pa.array(tv[nz]),
            }
        )


def _fold_digests(b: pa.Table) -> pa.Table:
    """Re-fold digest rows by (source, p) inside one batch — a combiner, so
    the digest tree needs NO all-to-all aggregate (wrapping uint64 sums are
    associative/commutative)."""
    src = b["source"].to_numpy(zero_copy_only=False)
    p = b["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, inv = np.unique(src, return_inverse=True)
    key = inv * SINK_JOIN_BUCKETS + p
    k = len(uniq) * SINK_JOIN_BUCKETS
    sums = {}
    for c in ("n_o", "n_d", "sum_n_tok", "sum_tv"):
        acc = np.zeros(k, np.int64)
        np.add.at(acc, key, b[c].to_numpy(zero_copy_only=False))
        sums[c] = acc
    with np.errstate(over="ignore"):
        for c in ("hs_o", "hs_d"):
            acc = np.zeros(k, np.uint64)
            np.add.at(acc, key, b[c].to_numpy(zero_copy_only=False).view(np.uint64))
            sums[c] = acc.view(np.int64)
    nz = np.flatnonzero(sums["n_o"] + sums["n_d"])
    return pa.table(
        {
            "source": pa.array(
                [str(uniq[i // SINK_JOIN_BUCKETS]) for i in nz], pa.string()
            ),
            "p": pa.array((nz % SINK_JOIN_BUCKETS).astype(np.int32)),
            **{c: pa.array(sums[c][nz]) for c in
               ("n_o", "n_d", "hs_o", "hs_d", "sum_n_tok", "sum_tv")},
        }
    )


def _checksum_fn(batch, side="o"):
    key = ("chk", side)
    st = _STAGES.get(key)
    if st is None:
        st = _STAGES[key] = _DocChecksumStage(side=side)
    return st(batch)


def _decode_checksum_fn(batch: pa.Table, sidecar=None, side="d") -> pa.Table:
    """Fused CHUNK-LEVEL decode -> checksum for the sink audit: each chunk
    (<= ~8 MB decoded) is checksummed immediately after its own decode while
    the decoded buffer is still cache-hot, and the full-block decoded table
    is never assembled — the audit path's decoded tokens exist only as one
    short-lived per-chunk buffer. (Operator fusion already kept them off
    plasma; this also keeps them out of DRAM re-reads: the block-level path
    concatenates every chunk before checksumming, by which point early
    chunks are cold — measured DRAM traffic is the 2->8 scaling ceiling.)"""
    from tokenzip.chunk import decode_chunk_row
    from tokenzip.stages import DecodeStage

    key = ("decchk", sidecar, side)
    st = _STAGES.get(key)
    if st is None:
        # reuse DecodeStage only for its one-time sidecar load
        _STAGES[key] = st = (
            DecodeStage(sidecar=sidecar),
            _DocChecksumStage(side=side),
        )
    dec, chk = st
    if dec.sidecar and not dec._loaded:
        if uio.exists(dec.sidecar):
            from tokenzip.codecs.strings import load_shared_tables

            load_shared_tables(dec.sidecar)
        dec._loaded = True

    def cell(k, i):
        v = batch[k][i]
        if isinstance(v, (pa.LargeBinaryScalar, pa.BinaryScalar)):
            buf = v.as_buffer()
            return memoryview(buf) if buf is not None else b""
        return v.as_py()

    names = [c for c in batch.column_names if c != "frag"]
    parts = [
        chk(decode_chunk_row({k: cell(k, i) for k in names}))
        for i in range(batch.num_rows)
    ]
    if not parts:
        return chk(
            pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "tokens": pa.array([], pa.list_(pa.int32())),
                    "n_tok": pa.array([], pa.int32()),
                    "source": pa.array([], pa.string()),
                }
            )
        )
    return pa.concat_tables(parts)


def verify_sink_roundtrip(
    input_paths: list[str], out_dir: str, concurrency: int | None = None
) -> "ray.data.Dataset":
    """End-to-end sink verification JOIN: read the WRITTEN chunks back from
    ``out_dir``, decode, and match against the original parquet BY doc_id —
    the distributed analog of the reference's check() differential
    (/root/reference/src/lib.rs:71-85) applied across the persisted sink
    (SURVEY.md §2.7 joins/lookups). The join is a doc_id groupby over
    per-row checksums (one ~50-byte row per doc per side); a sink-side
    corruption — write path, parquet round-trip, codec bug — breaks the
    checksum equality. Result columns match verify_roundtrip:
    (source, n_docs, n_equal, sum_n_tok, sum_token_values).

    Join mechanics (merkle-bucket): each side folds its per-doc checksums
    into per-(source, doc_id-hash-bucket) DIGESTS inside the map stage, so
    the only shuffle is sources x SINK_JOIN_BUCKETS tiny digest rows —
    CONSTANT size regardless of corpus size. Matching digests prove bucket
    equality w.h.p.; only mismatched buckets pay a per-doc drill-down pass
    (filtered re-scan), which at 100 TB touches a ~1/SINK_JOIN_BUCKETS
    sliver of the data and only when the sink is actually corrupt.

    Execution shape (measured on the 1 B-token corpus at 8 cpus): the two
    sides run as SEPARATE fully-fused pipelines driven by two driver
    threads — read -> checksum -> digest fuse into ONE task pool per side,
    so neither the raw token blocks nor the per-doc checksum rows ever hit
    the object store. The round-3 union-based plan could not fuse the
    original side past its SplitBlocks (a 4 GB plasma round-trip) and the
    union serialized the branches: 26.9 s -> 6.9 s."""
    import pandas as pd

    # stateless checksum stages run as plain TASKS (fixed actor pools here
    # would deadlock: two pools each sized to the cluster over-subscribe it)
    def orig_rows():
        # one block per file so ReadParquet->checksum->digest FUSE: sub-file
        # SplitBlocks breaks fusion and pays a full-corpus plasma hop (files
        # are the parallelism unit at scale; a straggler file costs at most
        # its own wall time here)
        return ray.data.read_parquet(
            input_paths, override_num_blocks=len(input_paths)
        ).map_batches(
            _checksum_fn,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"side": "o"},
        )

    def dec_rows():
        chunks_ds, sidecar = _chunks_read(out_dir)
        if chunks_ds is None:
            return ray.data.from_arrow(_EMPTY_TOKENS_TABLE).map_batches(
                _checksum_fn, batch_format="pyarrow", fn_kwargs={"side": "d"}
            )
        # fused chunk-level decode+checksum: decoded tokens never form a
        # block table — one short-lived per-chunk buffer, checksummed
        # while cache-hot (see _decode_checksum_fn)
        kwargs = dict(
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"sidecar": sidecar, "side": "d"},
        )
        if concurrency:
            kwargs["concurrency"] = concurrency
        return chunks_ds.map_batches(_decode_checksum_fn, **kwargs)

    def side_digests(rows: "ray.data.Dataset") -> "ray.data.Dataset":
        # digest combine tree per side: per-batch digests (fused into the
        # read task) -> no-shuffle coalesce -> in-stage fold -> tiny driver
        # fold. ZERO all-to-all operators; driver sees O(blocks) tiny rows.
        return (
            rows.map_batches(
                _cached_digest_fn, batch_format="pyarrow", zero_copy_batch=True
            )
            .repartition(max(8, 2 * _default_concurrency()), shuffle=False)
            .map_batches(
                _fold_digests, batch_format="pyarrow", zero_copy_batch=True
            )
        )

    from concurrent.futures import ThreadPoolExecutor

    # build BOTH plans on the main thread (read_parquet path resolution
    # probes optional fsspec modules; concurrent first-imports of a module
    # whose import fails race into a plain ImportError that Ray's
    # ModuleNotFoundError guard misses) — only EXECUTION runs in threads
    ds_o = side_digests(orig_rows())
    ds_d = side_digests(dec_rows())
    with ThreadPoolExecutor(2) as ex:
        f_o = ex.submit(ds_o.to_pandas)
        f_d = ex.submit(ds_d.to_pandas)
        parts = pd.concat([f_o.result(), f_d.result()], ignore_index=True)
    with np.errstate(over="ignore"):
        digests = (
            parts.assign(
                hs_o=parts["hs_o"].astype("uint64"),
                hs_d=parts["hs_d"].astype("uint64"),
            )
            .groupby(["source", "p"], as_index=False)
            .sum()
        )
    ok = (digests["n_o"] == digests["n_d"]) & (digests["hs_o"] == digests["hs_d"])
    res = (
        pd.DataFrame(
            {
                "source": digests["source"],
                "n_docs": digests["n_o"].astype("int64"),
                "n_equal": (digests["n_o"] * ok).astype("int64"),
                "sum_n_tok": digests["sum_n_tok"].astype("int64"),
                "sum_token_values": digests["sum_tv"].astype("int64"),
            }
        )
        .groupby("source", as_index=False)
        .sum()
    )

    bad = digests.loc[~ok, ["source", "p"]]
    if len(bad):
        # drill-down: per-doc compare ONLY inside the mismatched buckets
        # (cold path — runs only on actual corruption, so the union's
        # serialization cost is irrelevant here)
        bad_ps = set(int(p) for p in bad["p"].unique())
        orig, decoded = orig_rows(), dec_rows()

        def _only_bad(b: pa.Table) -> pa.Table:
            keep = np.isin(
                b["p"].to_numpy(zero_copy_only=False), np.array(sorted(bad_ps))
            )
            return b.filter(pa.array(keep))

        rows = (
            orig.union(decoded)
            .map_batches(_only_bad, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("p")
            .map_groups(_drilldown_reduce, batch_format="pandas")
            .to_pandas()
        )
        # add back per-doc matches ONLY for the exact (source, bucket)
        # combinations whose digest mismatched — other sources sharing a
        # bad p were already fully counted via their ok digests
        add = (
            rows.merge(bad, on=["source", "p"], how="inner")
            .groupby("source", as_index=False)["n_equal"]
            .sum()
        )
        res = res.merge(add, on="source", how="left", suffixes=("", "_add"))
        res["n_equal"] = (
            res["n_equal"] + res["n_equal_add"].fillna(0).astype("int64")
        )
        res = res.drop(columns=["n_equal_add"])

    res = res.sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "n_equal", "sum_n_tok", "sum_token_values"):
        res[c] = res[c].astype("int64")
    return res


def _drilldown_reduce(g):
    """Per-doc compare inside one mismatched bucket. Assumes doc_id is
    globally UNIQUE (the corpus contract): a duplicated doc_id yields >2
    rows in its group and counts as unequal — conservative (never
    over-counts n_equal), surfacing the contract violation as a mismatch."""
    import pandas as pd

    a = g.groupby("doc_id").agg(
        cnt=("h", "size"),
        hmin=("h", "min"),
        hmax=("h", "max"),
        n_o=("is_o", "sum"),
        src=("source", "min"),
    )
    eq = ((a["cnt"] == 2) & (a["n_o"] == 1) & (a["hmin"] == a["hmax"])).astype("int64")
    out = pd.DataFrame({"source": a["src"], "n_equal": eq})
    per = out.groupby("source", as_index=False).sum()
    per["p"] = int(g["p"].iloc[0])
    return per


_DIGEST_STAGE: list = []


def _cached_digest_fn(batch):
    if not _DIGEST_STAGE:
        _DIGEST_STAGE.append(_BucketDigestStage())
    return _DIGEST_STAGE[0](batch)


def _fold_verify_partials(b: pa.Table) -> pa.Table:
    """Fold per-batch verify partials by source inside one block. Wrapping
    int64 sums are associative, so the fold tree needs no shuffle; np.unique
    sorts, giving source-ordered output. Schema-stable for empty input."""
    src = b["source"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(src, return_inverse=True)
    out = {"source": pa.array([str(s) for s in uniq], pa.string())}
    for c in ("n_docs", "n_equal", "sum_n_tok", "sum_token_values"):
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, b[c].to_numpy(zero_copy_only=False))
        out[c] = pa.array(acc, pa.int64())
    return pa.table(out)


def _verify_read_blocks(paths: list[str]) -> int:
    """One block per file, plus extra blocks under FILE-SIZE SKEW (a shard
    >2x the median would gate the fused verify stage end-to-end — SURVEY
    §4.2 cross-fragment straggler isolation)."""
    sizes = sorted(os.path.getsize(p) for p in paths)
    if not sizes:
        return 1
    median = sizes[len(sizes) // 2]
    if median and sizes[-1] > 2 * median:
        # split granularity = max(median, 16 MB): isolates the straggler
        # without exploding into tiny tasks when the median shard is small
        gran = max(median, 16 << 20)
        return max(len(paths), int(sum(sizes) / gran))
    return len(paths)


def verify_roundtrip(
    input_paths: list[str],
    *,
    tokens_codec: str = "auto",
    batch_size: int | None = None,
) -> "ray.data.Dataset":
    """encode -> decode -> per-row equality inside each batch, pre-aggregated
    per source, then one tiny combiner fold (no all-to-all). Result columns:
    (source, n_docs, n_equal, sum_n_tok, sum_token_values)."""

    # one block per FILE => the read fuses with the verify stage into one
    # task (no plasma hop, no separate read operator holding scheduler
    # slots) — measured strictly faster than block-split reads at every
    # cluster size (2.0s vs 5.3s at sf0.1/32cpu). Parallelism therefore
    # comes from the file count, which is the natural unit at 100 TB
    # (thousands of fragments); a corpus with fewer files than cores
    # should be re-sharded at the source, not block-split here.
    # EXCEPTION — straggler shards: a file much larger than typical would
    # gate the whole stage as one fused task, so under size skew the block
    # count rises to ~total/median, splitting only the oversized files
    # (Ray assigns blocks proportional to bytes) while typical files keep
    # their fused one-task layout.
    ds = ray.data.read_parquet(
        input_paths, override_num_blocks=_verify_read_blocks(input_paths)
    )
    partials = ds.map_batches(
        _verify_fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_kwargs={"tokens_codec": tokens_codec},
    )
    # combiner fold instead of groupby+sort: partial rows are tiny (one per
    # source per batch), so coalescing them into ONE block and folding there
    # replaces two all-to-all operators (whose range partitions are mostly
    # EMPTY at low source cardinality, spamming zero-schema RefBundles) with
    # a single cheap move. np.unique sorts, so the result is source-ordered.
    return partials.repartition(1, shuffle=False).map_batches(
        _fold_verify_partials,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# Codec migration: re-encode a live sink in place-shape.  When a new codec
# lands (rankdict, dod, ...) or a forced choice must be revisited, recode()
# walks the OLD sink's chunk rows, decodes and immediately re-encodes each
# small batch of chunks (the decoded corpus never materializes — decode and
# encode are FUSED in one map stage, so plasma holds chunk rows on both
# sides, never the token payload), and writes a fresh frag-partitioned sink
# with its own manifest.  Resume is per SOURCE FRAGMENT (the old sink's
# frag= partitions become the new manifest's fragment keys), and each
# fragment's manifest entry records migration lineage: the source sink,
# source chunk count, the grouping-invariant chunk-id checksum of the
# source rows, and source bytes for the byte-delta audit.
# ---------------------------------------------------------------------------

_FRAG_RE = None
_RECODE_SIDECARS: set = set()


def _frag_of_chunk_path(path: str) -> str:
    import re

    from tokenzip.errors import ChunkFormatError

    global _FRAG_RE
    if _FRAG_RE is None:
        _FRAG_RE = re.compile(r"frag=([^/\\]+)")
    m = _FRAG_RE.search(path)
    if not m:
        raise ChunkFormatError(f"chunk file outside a frag= partition: {path}")
    return m.group(1)


def _recode_fn(
    batch: pa.Table, tokens_codec: str = "auto", sidecar: str | None = None
) -> pa.Table:
    """Chunk rows in -> chunk rows out (decode fused with re-encode).
    Batches may span frag partitions; decode per frag slice so lineage
    partitioning survives the migration."""
    from tokenzip.chunk import decode_chunks

    if sidecar is not None and sidecar not in _RECODE_SIDECARS:
        # shared-table source sinks: symbol tables load once per worker
        if uio.exists(sidecar):
            from tokenzip.codecs.strings import load_shared_tables

            load_shared_tables(sidecar)
        _RECODE_SIDECARS.add(sidecar)

    paths = batch["path"].to_numpy(zero_copy_only=False)
    frags = np.asarray([_frag_of_chunk_path(str(p)) for p in paths], dtype=object)
    rows = batch.drop_columns(["path"])
    parts = []
    for frag in np.unique(frags):
        sub = rows.filter(pa.array(frags == frag))
        decoded = decode_chunks(sub)
        decoded = decoded.append_column(
            "frag", pa.array([str(frag)] * decoded.num_rows, pa.string())
        )
        parts.append(decoded)
    tokens = pa.concat_tables(parts) if parts else None
    if tokens is None or tokens.num_rows == 0:
        from tokenzip.chunk import CHUNK_SCHEMA

        out = pa.table({f.name: pa.array([], f.type) for f in CHUNK_SCHEMA})
        return out.append_column("frag", pa.array([], pa.string()))
    return _encode_fn(tokens, tokens_codec=tokens_codec)


def _recode_scaffold(
    in_dir: str,
    out_dir: str,
    map_fn,
    fn_kwargs: dict,
    *,
    batch_chunks: int,
    concurrency: int | None,
    resume: bool,
    guard_col: str,
) -> dict:
    """Shared migration scaffolding of recode() and table.recode_table():
    frag discovery on the source sink, manifest resume/wipe, the fused
    decode->re-encode map, per-fragment lineage + drift guard on
    ``guard_col`` (n_tokens for token sinks, n_rows for generic tables —
    a migration that changes either is corrupt, not merely different)."""
    from tokenzip.chunk import CHUNK_FORMAT
    from tokenzip.errors import ChunkFormatError

    in_chunks = uio.join(in_dir, "chunks")
    if not uio.isdir(in_chunks):
        raise ChunkFormatError(f"no chunks directory under {in_dir}")
    frag_dirs = sorted(
        d for d in uio.listdir(in_chunks) if d.startswith("frag=")
    )
    if not frag_dirs:
        raise ChunkFormatError(f"no frag= partitions under {in_chunks}")
    chunks_dir = uio.join(out_dir, "chunks")
    man = Manifest(out_dir)
    done = man.done_fragments() if resume else set()
    if not resume and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
        man.data["fragments"] = {}
    elif resume and not done and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
    if not done:
        man.data["chunk_format"] = CHUNK_FORMAT
    todo = [d.split("=", 1)[1] for d in frag_dirs if d.split("=", 1)[1] not in done]
    for frag in todo:
        d = uio.join(chunks_dir, f"frag={frag}")
        if uio.isdir(d):
            uio.rmtree(d)
    if not todo:
        return man.totals()

    # migration lineage of the SOURCE rows: metadata-only fold of the old
    # sink (chunk counts + byte counts; payload columns never read)
    src_stats = _fold_chunk_meta(in_chunks, todo)

    paths = []
    for frag in todo:
        d = uio.join(in_chunks, f"frag={frag}")
        paths.extend(
            uio.join(d, f) for f in sorted(uio.listdir(d)) if f.endswith(".parquet")
        )
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_chunks,
        fn_kwargs=fn_kwargs,
    )
    if concurrency:
        kwargs["concurrency"] = concurrency
    (
        ray.data.read_parquet(paths, include_paths=True)
        .map_batches(map_fn, **kwargs)
        .write_parquet(
            chunks_dir,
            partition_cols=["frag"],
            compression="none",
            row_group_size=8,
        )
    )

    frags_written = {
        d.split("=", 1)[1]
        for d in uio.listdir(chunks_dir)
        if d.startswith("frag=")
    }
    zero = {
        "n_chunks": 0, "n_rows": 0, "n_tokens": 0, "bytes_in": 0,
        "bytes_out": 0, "tokens_bytes_out": 0, "leb128_bytes": 0,
        "codecs": {},
    }
    stats = _fold_chunk_meta(chunks_dir, sorted(set(todo) & frags_written))
    for frag in todo:
        s = dict(stats.get(frag) or zero)
        src = src_stats.get(frag) or {}
        s["recoded_from"] = in_dir
        s["src_n_chunks"] = int(src.get("n_chunks", 0))
        s["src_bytes_out"] = int(src.get("bytes_out", 0))
        s["src_codecs"] = src.get("codecs", {})
        if s[guard_col] != int(src.get(guard_col, 0)):
            raise ChunkFormatError(
                f"recode {guard_col} drift on frag {frag}: "
                f"{s[guard_col]} != {src.get(guard_col, 0)}"
            )
        man.mark_done(frag, s)
    man.save()
    return man.totals()


def recode(
    in_dir: str,
    out_dir: str,
    *,
    tokens_codec: str = "auto",
    batch_chunks: int = 4,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """Migrate ``in_dir`` (an existing token sink) to a fresh sink at
    ``out_dir`` under a new codec regime. Returns the new manifest totals
    (with per-fragment migration lineage recorded)."""
    src_sidecar = uio.join(in_dir, "symbols.json")
    return _recode_scaffold(
        in_dir,
        out_dir,
        _recode_fn,
        {
            "tokens_codec": tokens_codec,
            "sidecar": src_sidecar if uio.exists(src_sidecar) else None,
        },
        batch_chunks=batch_chunks,
        concurrency=concurrency,
        resume=resume,
        guard_col="n_tokens",
    )


# ---------------------------------------------------------------------------
# Targeted document deletion (right-to-be-forgotten at sink scale)
# ---------------------------------------------------------------------------


def _delete_probe_fn(batch: pa.Table, ids_ref=None, want_ref=None) -> pa.Table:
    """(frag, chunk_id) rows of chunks that MAY contain a requested doc id.

    Zone test is vectorized over the chunk rows: sorted ids vs each chunk's
    [did_min, did_max] via one searchsorted (a chunk can hold id d iff
    did_min <= d <= did_max for SOME d — i.e. the smallest id >= did_min is
    <= did_max). Bloom bitsets (format 3) then drop range-survivors that
    provably hold none of the ids; empty bitsets mean must-rewrite-check."""
    from tokenzip.bloom import bloom_probe
    from tokenzip.stages import _bget

    ids = _bget(ids_ref)  # sorted numpy object array of doc ids
    want = _bget(want_ref)  # md5_hi60 hashes of ids (or None pre-format-3)
    dmin = batch["did_min"].to_numpy(zero_copy_only=False)
    dmax = batch["did_max"].to_numpy(zero_copy_only=False)
    idx = np.searchsorted(ids, dmin, side="left")
    hit = (idx < len(ids)) & (
        np.where(idx < len(ids), ids[np.minimum(idx, len(ids) - 1)], "")
        <= dmax
    )
    frags = np.array(
        [p.rsplit("/frag=", 1)[1].split("/", 1)[0]
         for p in batch["path"].to_pylist()]
    )
    cids = batch["chunk_id"].to_numpy(zero_copy_only=False)
    if want is not None and "did_bloom" in batch.column_names:
        blooms = batch["did_bloom"].to_pylist()
        for i in np.flatnonzero(hit):
            blob = blooms[i]
            if blob:
                words = np.frombuffer(blob, dtype=np.uint64)
                if not bool(bloom_probe(words, want).any()):
                    hit[i] = False
    return pa.table(
        {
            "frag": pa.array([str(f) for f in frags[hit]], pa.string()),
            "chunk_id": pa.array([str(c) for c in cids[hit]], pa.string()),
        }
    )


def _delete_count_fn(batch: pa.Table, ids_ref=None, sidecar=None) -> pa.Table:
    """Per-frag (n_docs_deleted, n_tokens_deleted) partials over HIT chunk
    rows — projection-pruned decode (doc_id + n_tok streams only; the token
    payload blobs never leave storage for the audit pass)."""
    from tokenzip.chunk import decode_chunks
    from tokenzip.stages import _bget

    if sidecar is not None and sidecar not in _RECODE_SIDECARS:
        if uio.exists(sidecar):
            from tokenzip.codecs.strings import load_shared_tables

            load_shared_tables(sidecar)
        _RECODE_SIDECARS.add(sidecar)
    ids = _bget(ids_ref)
    frags = np.array(
        [p.rsplit("/frag=", 1)[1].split("/", 1)[0]
         for p in batch["path"].to_pylist()]
    )
    rows = batch.drop_columns(["path"])
    out = {"frag": [], "n_docs_deleted": [], "n_tokens_deleted": []}
    for frag in np.unique(frags):
        sub = rows.filter(pa.array(frags == frag))
        dec = decode_chunks(sub, columns=["doc_id", "n_tok"])
        did = dec["doc_id"].to_numpy(zero_copy_only=False)
        ntok = dec["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ids, did)
        gone = (pos < len(ids)) & (
            ids[np.minimum(pos, len(ids) - 1)] == did
        )
        out["frag"].append(str(frag))
        out["n_docs_deleted"].append(int(gone.sum()))
        out["n_tokens_deleted"].append(int(ntok[gone].sum()))
    return pa.table(
        {
            "frag": pa.array(out["frag"], pa.string()),
            "n_docs_deleted": pa.array(out["n_docs_deleted"], pa.int64()),
            "n_tokens_deleted": pa.array(out["n_tokens_deleted"], pa.int64()),
        }
    )


def _delete_rewrite_fn(
    batch: pa.Table,
    ids_ref=None,
    hits_ref=None,
    sidecar=None,
    tokens_codec="auto",
) -> pa.Table:
    """Fused selective rewrite of one chunk-row batch: rows whose chunk_id
    is NOT in the hit set pass through VERBATIM (payload bytes copied, never
    decoded); hit rows decode -> drop deleted doc ids -> re-encode. Output
    schema = chunk schema + frag (hive partition), same as _recode_fn."""
    import pyarrow.compute as pc

    from tokenzip.chunk import CHUNK_SCHEMA, conform_chunk_rows, decode_chunks
    from tokenzip.stages import _bget

    if sidecar is not None and sidecar not in _RECODE_SIDECARS:
        if uio.exists(sidecar):
            from tokenzip.codecs.strings import load_shared_tables

            load_shared_tables(sidecar)
        _RECODE_SIDECARS.add(sidecar)
    ids = _bget(ids_ref)
    hits = _bget(hits_ref)  # set of chunk_ids needing rewrite
    frags = np.array(
        [p.rsplit("/frag=", 1)[1].split("/", 1)[0]
         for p in batch["path"].to_pylist()]
    )
    rows = batch.drop_columns(["path"])
    cids = rows["chunk_id"].to_numpy(zero_copy_only=False)
    is_hit = np.array([c in hits for c in cids], dtype=bool)

    parts: list[pa.Table] = []
    # verbatim pass-through (bit-identical chunk rows, no decode;
    # conform fills older-format sinks' absent columns with sentinels)
    if (~is_hit).any():
        sub = rows.filter(pa.array(~is_hit))
        fsub = frags[~is_hit]
        sub = conform_chunk_rows(sub)
        parts.append(
            sub.append_column(
                "frag", pa.array([str(f) for f in fsub], pa.string())
            )
        )
    # selective rewrite, per frag (re-encode keeps frag lineage)
    hit_frags = np.unique(frags[is_hit]) if is_hit.any() else []
    for frag in hit_frags:
        sub = rows.filter(pa.array(is_hit & (frags == frag)))
        dec = decode_chunks(sub)
        keep = pc.invert(pc.is_in(dec["doc_id"], pa.array(list(ids), pa.string())))
        dec = dec.filter(keep)
        dec = dec.append_column(
            "frag", pa.array([str(frag)] * dec.num_rows, pa.string())
        )
        enc = _encode_fn(dec, tokens_codec=tokens_codec)
        if enc.num_rows:
            parts.append(enc.select(parts[0].column_names if parts else enc.column_names))
    if not parts:
        from tokenzip.chunk import CHUNK_SCHEMA as _CS

        empty = pa.table({f.name: pa.array([], f.type) for f in _CS})
        return empty.append_column("frag", pa.array([], pa.string()))
    names = parts[0].column_names
    return pa.concat_tables([p.select(names) for p in parts])


def delete_docs(
    in_dir: str,
    out_dir: str,
    doc_ids: list[str],
    *,
    tokens_codec: str = "auto",
    batch_chunks: int = 4,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """Delete ``doc_ids`` from the sink at ``in_dir``, writing the surviving
    corpus as a fresh sink at ``out_dir`` — the right-to-be-forgotten
    operation, priced at the FRAGMENTS TOUCHED, not the corpus:

    1. probe pass (metadata only): did_min/did_max zone maps + did_bloom
       bitsets (format 3) identify the chunks that MAY hold a requested id;
       payload blobs never leave storage.
    2. clean fragments (no hit chunks) are BYTE-COPIED file-for-file — no
       parquet parse, no decode; their manifest stats carry over verbatim.
    3. hit fragments stream through a fused selective rewrite: non-hit
       chunk rows within them pass through bit-identical; hit chunks decode,
       drop the deleted ids, and re-encode.
    4. an audit pass (projection-pruned: doc_id + n_tok streams only)
       counts exactly what was deleted per fragment; the manifest guard
       requires new = old - deleted for both rows and tokens, per fragment.

    At 100 TB a k-id deletion touches O(k) chunks (bloom fpr-bounded), so
    steps 3-4 read MBs while step 2 is object-store COPY bandwidth. Returns
    manifest totals plus n_docs_deleted / n_tokens_deleted. Resume is
    per-fragment (manifest), same contract as compress/recode."""
    from tokenzip.chunk import CHUNK_FORMAT
    from tokenzip.errors import ChunkFormatError
    from tokenzip.hashutil import md5_hi60_str
    from tokenzip.stages import _bcast

    ids = sorted(set(map(str, doc_ids)))
    if not ids:
        raise ValueError("delete_docs: empty doc_ids (nothing to delete)")
    in_chunks = uio.join(in_dir, "chunks")
    if not uio.isdir(in_chunks):
        raise ChunkFormatError(f"no chunks directory under {in_dir}")
    _require_chunk_format(in_dir, 2, "doc-id deletion")
    have_fmt = int(Manifest(in_dir).data.get("chunk_format", 1))
    frag_dirs = sorted(d for d in uio.listdir(in_chunks) if d.startswith("frag="))
    all_frags = [d.split("=", 1)[1] for d in frag_dirs]
    frag_files = {
        f: [
            uio.join(in_chunks, f"frag={f}", n)
            for n in sorted(uio.listdir(uio.join(in_chunks, f"frag={f}")))
            if n.endswith(".parquet")
        ]
        for f in all_frags
    }

    chunks_dir = uio.join(out_dir, "chunks")
    man = Manifest(out_dir)
    done = man.done_fragments() if resume else set()
    if not resume and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
        man.data["fragments"] = {}
    elif resume and not done and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
    if not done:
        # clean fragments BYTE-COPY at the source's format; marking the new
        # sink any higher would make format-gated readers request columns
        # the copied files don't have
        man.data["chunk_format"] = min(CHUNK_FORMAT, have_fmt)
    todo = [f for f in all_frags if f not in done]
    for frag in todo:
        d = uio.join(chunks_dir, f"frag={frag}")
        if uio.isdir(d):
            uio.rmtree(d)

    src_man = Manifest(in_dir)
    totals_extra = {"n_docs_deleted": 0, "n_tokens_deleted": 0}
    if not todo:
        t = man.totals()
        for f, s in man.data.get("fragments", {}).items():
            totals_extra["n_docs_deleted"] += int(s.get("n_docs_deleted", 0))
            totals_extra["n_tokens_deleted"] += int(s.get("n_tokens_deleted", 0))
        t.update(totals_extra)
        return t

    ids_np = np.array(ids, dtype=object)
    ids_ref = _bcast(ids_np)
    want_ref = _bcast(
        md5_hi60_str(pa.array(ids, pa.string()), b"db:") if have_fmt >= 3 else None
    )
    sidecar = uio.join(in_dir, "symbols.json")
    sidecar = sidecar if uio.exists(sidecar) else None

    # --- probe pass: which (frag, chunk) pairs can hold a requested id ---
    todo_files = [p for f in todo for p in frag_files[f]]
    probe_cols = ["chunk_id", "did_min", "did_max"] + (
        ["did_bloom"] if have_fmt >= 3 else []
    )
    hit_rows = (
        ray.data.read_parquet(todo_files, columns=probe_cols, include_paths=True)
        .map_batches(
            _delete_probe_fn,
            batch_format="pyarrow",
            zero_copy_batch=True,
            fn_kwargs={"ids_ref": ids_ref, "want_ref": want_ref},
        )
        .take_all()
    )
    hit_chunks = {r["chunk_id"] for r in hit_rows}
    hit_frags = sorted({r["frag"] for r in hit_rows})
    clean_frags = [f for f in todo if f not in set(hit_frags)]

    # --- audit pass over hit chunks: exact per-frag deletion counts ---
    deleted: dict[str, dict] = {}
    if hit_frags:
        hit_files = [p for f in hit_frags for p in frag_files[f]]
        audit_cols = [
            "chunk_id", "n_rows", "n_tokens", "doc_id_enc", "offsets_enc",
            "n_tok_enc", "tokens_codec",
        ]
        import pyarrow.compute as pc

        cexpr = pc.field("chunk_id").isin(pa.array(sorted(hit_chunks), pa.string()))
        parts = (
            ray.data.read_parquet(
                hit_files, columns=audit_cols, include_paths=True, filter=cexpr
            )
            .map_batches(
                _delete_count_fn,
                batch_format="pyarrow",
                zero_copy_batch=True,
                fn_kwargs={"ids_ref": ids_ref, "sidecar": sidecar},
            )
            .take_all()
        )
        for r in parts:
            s = deleted.setdefault(
                r["frag"], {"n_docs_deleted": 0, "n_tokens_deleted": 0}
            )
            s["n_docs_deleted"] += int(r["n_docs_deleted"])
            s["n_tokens_deleted"] += int(r["n_tokens_deleted"])

    # --- clean fragments: distributed byte copy, stats carried verbatim ---
    if clean_frags:
        specs = [
            {
                "src": p,
                "dst": uio.join(chunks_dir, f"frag={f}", os.path.basename(p)),
            }
            for f in clean_frags
            for p in frag_files[f]
        ]

        def _copy(row: dict) -> dict:
            uio.write_bytes_atomic(row["dst"], uio.read_bytes(row["src"]))
            return {"n": 1}

        n = (
            ray.data.from_items(specs)
            .map(_copy, concurrency=concurrency or _default_concurrency())
            .count()
        )
        assert n == len(specs)

    # --- hit fragments: fused selective rewrite ---
    if hit_frags:
        hit_files = [p for f in hit_frags for p in frag_files[f]]
        kwargs = dict(
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_chunks,
            fn_kwargs={
                "ids_ref": ids_ref,
                "hits_ref": _bcast(hit_chunks),
                "sidecar": sidecar,
                "tokens_codec": tokens_codec,
            },
        )
        if concurrency:
            kwargs["concurrency"] = concurrency
        (
            ray.data.read_parquet(hit_files, include_paths=True)
            .map_batches(_delete_rewrite_fn, **kwargs)
            .write_parquet(
                chunks_dir,
                partition_cols=["frag"],
                compression="none",
                row_group_size=8,
            )
        )

    # --- manifest: stats + lineage + the new=old-deleted drift guard ---
    src_frag_stats = dict(src_man.data.get("fragments", {}))
    need_fold = [f for f in todo if f not in src_frag_stats]
    if need_fold:
        src_frag_stats.update(_fold_chunk_meta(in_chunks, need_fold))
    frags_written = {
        d.split("=", 1)[1]
        for d in uio.listdir(chunks_dir)
        if d.startswith("frag=")
    }
    zero = {
        "n_chunks": 0, "n_rows": 0, "n_tokens": 0, "bytes_in": 0,
        "bytes_out": 0, "tokens_bytes_out": 0, "leb128_bytes": 0,
        "codecs": {},
    }
    new_stats = _fold_chunk_meta(
        chunks_dir, sorted(set(hit_frags) & frags_written)
    )
    for frag in todo:
        src = src_frag_stats.get(frag) or {}
        dstat = deleted.get(frag, {"n_docs_deleted": 0, "n_tokens_deleted": 0})
        if frag in set(hit_frags):
            s = dict(new_stats.get(frag) or zero)
            want_rows = int(src.get("n_rows", 0)) - dstat["n_docs_deleted"]
            want_tok = int(src.get("n_tokens", 0)) - dstat["n_tokens_deleted"]
            if s["n_rows"] != want_rows or s["n_tokens"] != want_tok:
                raise ChunkFormatError(
                    f"delete drift on frag {frag}: rows {s['n_rows']} != "
                    f"{want_rows} or tokens {s['n_tokens']} != {want_tok}"
                )
        else:
            s = {k: src.get(k, zero[k]) for k in zero}
        s["deleted_from"] = in_dir
        s.update(dstat)
        totals_extra["n_docs_deleted"] += dstat["n_docs_deleted"]
        totals_extra["n_tokens_deleted"] += dstat["n_tokens_deleted"]
        man.mark_done(frag, s)
    man.save()
    if sidecar is not None:
        uio.write_bytes_atomic(
            uio.join(out_dir, "symbols.json"), uio.read_bytes(sidecar)
        )
    for f, s in man.data.get("fragments", {}).items():
        if f not in set(todo):
            totals_extra["n_docs_deleted"] += int(s.get("n_docs_deleted", 0))
            totals_extra["n_tokens_deleted"] += int(s.get("n_tokens_deleted", 0))
    t = man.totals()
    t.update(totals_extra)
    return t


def upsert_docs(
    in_dir: str,
    out_dir: str,
    new_paths: list[str],
    *,
    tokens_codec: str = "auto",
    batch_chunks: int = 4,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """MERGE (upsert) into a token sink: replace-or-insert every document
    carried by the parquet fragments in ``new_paths``, writing the merged
    corpus as a fresh sink at ``out_dir`` — latest-wins by doc_id.

    Two composed passes, each already priced for 100 TB:

    1. ``delete_docs(in_dir, out_dir, new_ids)`` evicts the stale versions:
       bloom/zone metadata picks the fragments that MAY hold an incoming
       id, clean fragments byte-copy, hit chunks stream a fused selective
       rewrite. Incoming ids with no stale version simply delete nothing
       (that's the INSERT half of MERGE).
    2. ``compress(new_paths, out_dir, resume=True)`` appends the new
       fragments under the sink's manifest — the delete-phase fragments
       are already marked done, so only the new files encode.

    The returned totals carry ``n_docs_replaced`` (stale versions evicted)
    and ``n_docs_inserted`` (genuinely new ids), and a loud drift guard
    enforces rows_out = rows_old - replaced + rows_new exactly. Duplicate
    doc_ids WITHIN ``new_paths`` are rejected (latest-wins would be
    load-order-dependent), as are fragment-name collisions against the
    sink (resume would silently skip the new file).

    The reference has no mutation surface at all — this extends its
    encode-once model the way a training-data store needs (daily refresh
    of a crawl slice without re-encoding the other 99.99%)."""
    import pyarrow.parquet as pq

    from tokenzip.errors import ChunkFormatError
    from tokenzip.manifest import Manifest

    if not new_paths:
        raise ValueError("upsert_docs: empty new_paths (nothing to merge)")
    src_man = Manifest(in_dir)
    existing = set(src_man.data.get("fragments", {}))
    out_frags = Manifest(out_dir).data.get("fragments", {})
    n_new_rows = 0
    for p in new_paths:
        frag = _frag_of_path(p)
        md = pq.ParquetFile(p).metadata
        if frag in existing:
            raise ValueError(
                f"upsert_docs: fragment name {frag!r} ({p}) collides with a "
                "fragment already in the SOURCE sink — resume would skip it"
            )
        done = out_frags.get(frag)
        if done is not None and int(done.get("n_rows", -1)) != md.num_rows:
            # rerun-stale guard: the same path was merged before but its
            # content changed — resume would silently keep the OLD rows
            raise ValueError(
                f"upsert_docs: {p} was already merged into {out_dir} with "
                f"{done.get('n_rows')} rows but now holds {md.num_rows}; "
                "rerunning a CHANGED batch needs a fresh out_dir"
            )
        n_new_rows += md.num_rows

    ids_rows = (
        ray.data.read_parquet(new_paths, columns=["doc_id"])
        .map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )
    ids = [str(r["doc_id"]) for r in ids_rows]
    if len(set(ids)) != len(ids):
        raise ValueError(
            "upsert_docs: duplicate doc_id within new_paths — latest-wins "
            "would be load-order-dependent; dedup the update batch first"
        )

    rows_old = int(src_man.totals().get("n_rows", 0))
    t_del = delete_docs(
        in_dir,
        out_dir,
        ids,
        tokens_codec=tokens_codec,
        batch_chunks=batch_chunks,
        concurrency=concurrency,
        resume=resume,
    )
    n_replaced = int(t_del["n_docs_deleted"])

    shared = uio.exists(uio.join(in_dir, "symbols.json"))
    totals = compress(
        new_paths,
        out_dir,
        tokens_codec=tokens_codec,
        concurrency=concurrency,
        resume=True,
        shared_tables=shared,
    )
    want = rows_old - n_replaced + n_new_rows
    if int(totals["n_rows"]) != want:
        raise ChunkFormatError(
            f"upsert drift: sink has {totals['n_rows']} rows, want "
            f"{rows_old} - {n_replaced} + {n_new_rows} = {want}"
        )
    totals = dict(totals)
    totals["n_docs_replaced"] = n_replaced
    totals["n_docs_inserted"] = len(ids) - n_replaced
    return totals


def _fsck_batch(batch: pa.Table, sidecar=None) -> pa.Table:
    """Decode one block of chunk rows and verify every per-chunk invariant;
    emit an exact-integer partial (counts + violation census). Violations
    are COUNTED and described, not raised, so one bad chunk doesn't hide
    the rest of the report."""
    from tokenzip.bloom import bloom_probe
    from tokenzip.chunk import _DID_BLOOM_SALT, decode_chunk_row
    from tokenzip.hashutil import md5_hi60_str

    if sidecar is not None:
        key = ("fsck_sidecar", sidecar)
        if key not in _STAGES:
            from tokenzip.codecs.strings import load_shared_tables

            load_shared_tables(sidecar)
            _STAGES[key] = True

    def _s(v) -> str:
        # metadata strings may surface as binary scalars off the chunk
        # schema — normalize for comparison
        if isinstance(v, (bytes, memoryview)):
            return bytes(v).decode("utf-8", "replace")
        return str(v)

    n_chunks = n_rows = n_tokens = 0
    bad: list[str] = []
    have_bloom = "did_bloom" in batch.column_names
    for i in range(batch.num_rows):
        row = {}
        for k in batch.column_names:
            v = batch[k][i]
            if isinstance(v, (pa.LargeBinaryScalar, pa.BinaryScalar)):
                buf = v.as_buffer()
                row[k] = memoryview(buf) if buf is not None else b""
            else:
                row[k] = v.as_py()
        cid = _s(row.get("chunk_id"))
        try:
            dec = decode_chunk_row(row)
        except Exception as e:  # undecodable chunk: the worst violation
            bad.append(f"{cid}: decode failed: {type(e).__name__}: {e}")
            n_chunks += 1
            continue
        n_chunks += 1
        n = dec.num_rows
        toks = dec["tokens"].combine_chunks()
        lens = (
            np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
            if n
            else np.zeros(0, np.int64)
        )
        ntok = dec["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = np.asarray(dec["doc_id"].to_pylist(), dtype=object)
        n_rows += n
        n_tokens += int(lens.sum())
        if n != int(row["n_rows"]):
            bad.append(f"{cid}: decoded {n} rows, metadata says {row['n_rows']}")
        if int(lens.sum()) != int(row["n_tokens"]):
            bad.append(
                f"{cid}: decoded {int(lens.sum())} tokens, metadata says "
                f"{row['n_tokens']}"
            )
        if n and not np.array_equal(ntok, lens):
            bad.append(f"{cid}: n_tok column disagrees with tokens lengths")
        if n and "did_min" in row and row["did_min"] is not None:
            lo, hi = min(did), max(did)
            zlo, zhi = _s(row["did_min"]), _s(row["did_max"])
            if str(lo) != zlo or str(hi) != zhi:
                bad.append(
                    f"{cid}: doc-id window [{lo}, {hi}] != zone map "
                    f"[{zlo}, {zhi}]"
                )
        if n and have_bloom and row.get("did_bloom"):
            words = np.frombuffer(bytes(row["did_bloom"]), dtype=np.uint64)
            want = md5_hi60_str(pa.array([str(d) for d in did], pa.string()),
                                _DID_BLOOM_SALT)
            if not bool(bloom_probe(words, want).all()):
                bad.append(f"{cid}: a present doc id misses the did_bloom bitset")
        if n and row.get("content_chk"):
            # format 4: the decoded-content checksum catches silent payload
            # bit rot that preserves counts (0 = older sink, not checksummed)
            from tokenzip.chunk import _tokens_parts, content_checksum

            lens2, vals2 = _tokens_parts(dec["tokens"])
            got_chk = content_checksum(
                dec["doc_id"].combine_chunks(),
                dec["source"].combine_chunks(),
                lens2,
                vals2,
            )
            if got_chk != int(row["content_chk"]):
                bad.append(
                    f"{cid}: decoded content checksum {got_chk} != recorded "
                    f"{row['content_chk']} (payload corruption)"
                )
    return pa.table(
        {
            "n_chunks": pa.array([n_chunks], pa.int64()),
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "violations": pa.array([len(bad)], pa.int64()),
            "detail": pa.array(["\n".join(bad[:20])], pa.string()),
        }
    )


def fsck(
    out_dir: str,
    *,
    batch_chunks: int = 4,
    strict: bool = True,
    sample: float = 1.0,
) -> dict:
    """Standalone sink integrity check — no original input required (that's
    ``verify_sink_roundtrip``'s job): every chunk decodes, and every piece
    of metadata the engine PRUNES ON is re-derived from the decoded rows
    and compared — n_rows, n_tokens, the per-row n_tok column, the
    did_min/did_max zone windows, and (format 3) membership of every
    present id in the chunk's did_bloom bitset. The manifest's per-fragment
    ledger is folded against the chunk files' own metadata. Violations are
    collected (first 20 detailed), and ``strict=True`` raises
    ChunkFormatError if any exist. A sink that passes fsck answers every
    pushdown/pruning path correctly even if the original corpus is gone —
    the restore-drill half of the durability story.

    ``sample < 1.0`` is the 100-TB scrub path: a DETERMINISTIC fraction of
    chunk FILES (salted md5 of the path — the same file set every run, so
    repeated scrubs at increasing rates compose into full coverage) decode
    and verify; the manifest fold is skipped (it needs full totals) and the
    report carries ``sampled: True``."""
    from tokenzip.errors import ChunkFormatError

    if not (0.0 < sample <= 1.0):
        raise ValueError(f"fsck sample must be in (0, 1], got {sample}")
    chunks_dir = uio.join(out_dir, "chunks")
    if not uio.isdir(chunks_dir):
        raise ChunkFormatError(f"no chunks directory under {out_dir}")
    sidecar = uio.join(out_dir, "symbols.json")
    sidecar = sidecar if uio.exists(sidecar) else None
    files = [p for p, _ in uio.walk_files(chunks_dir) if p.endswith(".parquet")]
    sampled = sample < 1.0
    if sampled:
        import hashlib

        den = 1 << 20
        cut = int(sample * den)
        files = [
            p
            for p in files
            if int.from_bytes(
                hashlib.md5(b"fsck:" + p.encode()).digest()[:4], "big"
            )
            % den
            < cut
        ]
        if not files:
            raise ValueError(
                f"fsck sample {sample} selected zero of the sink's files — "
                "raise the rate"
            )
    parts = (
        ray.data.read_parquet(files, include_paths=True)
        .map_batches(
            _fsck_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_chunks,
            fn_kwargs={"sidecar": sidecar},
        )
        .take_all()
    )
    tot = {"n_chunks": 0, "n_rows": 0, "n_tokens": 0, "violations": 0}
    details: list[str] = []
    for r in parts:
        for k in ("n_chunks", "n_rows", "n_tokens", "violations"):
            tot[k] += int(r[k])
        if r["detail"]:
            details.append(str(r["detail"]))
    tot["sampled"] = sampled
    man = Manifest(out_dir).totals()
    for k in () if sampled else ("n_chunks", "n_rows", "n_tokens"):
        if int(man.get(k, -1)) != tot[k]:
            tot["violations"] += 1
            details.append(
                f"manifest.{k} = {man.get(k)} but the chunk files hold {tot[k]}"
            )
    tot["ok"] = tot["violations"] == 0
    tot["detail"] = "\n".join(details)[:4000]
    if strict and not tot["ok"]:
        raise ChunkFormatError(
            f"fsck: {tot['violations']} violation(s) in {out_dir}:\n"
            + tot["detail"]
        )
    return tot
