"""Named query pipelines for the driver contract (__ray_entry__.queries).

Each function takes ``sf_dir`` and returns a Ray Dataset / pandas DataFrame
whose columns match the corresponding oracle SQL in __ray_entry__.oracle_sql
exactly (names and integer types — aggregates are BIGINT-cast on the SQL
side to avoid float/hugeint hash mismatches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

from tokenzip.codecs.varint import encode_leb128, leb128_size, zigzag_encode
from tokenzip.corpus import corpus_paths
from tokenzip.pipeline import _default_concurrency, verify_roundtrip


def _scoped_out_dir(prefix: str, sf_dir: str) -> str:
    """Temp sink dir keyed by a corpus fingerprint (shard names + sizes +
    mtimes). compress()/recode() sinks resume off their manifest, so a FIXED
    dir would let a stale manifest mark fragments done after the corpus at
    the same scale is regenerated — the audit would then silently validate
    the OLD sink's content against the NEW oracle. Keying the dir by the
    input fingerprint makes any corpus change start a fresh sink."""
    import hashlib
    import os

    h = hashlib.md5()
    for p in corpus_paths(sf_dir):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns};".encode())
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(prefix, f"{base}-{h.hexdigest()[:12]}")


def q_roundtrip_by_source(sf_dir: str):
    """Full encode->decode->equality pipeline, per source."""
    return verify_roundtrip(corpus_paths(sf_dir))


def q_sink_roundtrip_join(sf_dir: str):
    """Compress to the sink, then read the WRITTEN chunks back and join them
    to the originals BY doc_id (checksum join, see verify_sink_roundtrip) —
    the persisted-output differential the in-memory verify can't provide."""
    import os

    from tokenzip.pipeline import compress, verify_sink_roundtrip

    paths = corpus_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    compress(paths, out_dir)
    return verify_sink_roundtrip(paths, out_dir)


class _TokenStatsStage:
    """Per-batch partial aggregates over the tokens column, per source:
    counts, min/max, zigzag checksum, and the *actual* engine LEB128 blob
    size (differential check: blob length must equal the closed-form oracle,
    /root/reference/benches/varint_bench/leb128.rs:4-24)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(src, return_inverse=True)
        k = len(uniq)
        tok_src = np.repeat(inv, lengths)  # source index per token
        zz = zigzag_encode(values.astype(np.int32), 32).astype(np.uint64)
        sizes = leb128_size(zz)
        # ONE stable sort groups tokens contiguously by source; per-source
        # work then runs on O(group) slices, not O(sources x tokens) masks
        torder = np.argsort(tok_src, kind="stable")
        vs, zzs, szs = values[torder], zz[torder], sizes[torder]
        tcounts = np.bincount(tok_src, minlength=k)
        tstarts = np.zeros(k + 1, np.int64)
        np.cumsum(tcounts, out=tstarts[1:])
        rorder = np.argsort(inv, kind="stable")
        rcounts = np.bincount(inv, minlength=k)
        rstarts = np.zeros(k + 1, np.int64)
        np.cumsum(rcounts, out=rstarts[1:])
        eq = (n_tok == lengths)[rorder]
        out = {
            "source": [], "n_docs": [], "n_tokens": [], "min_token": [],
            "max_token": [], "sum_zigzag": [], "leb128_bytes": [],
            "n_ntok_match": [],
        }
        for g, s in enumerate(uniq):
            sl = slice(tstarts[g], tstarts[g + 1])
            vals = vs[sl]
            out["source"].append(str(s))
            out["n_docs"].append(int(rcounts[g]))
            out["n_tokens"].append(int(tcounts[g]))
            out["min_token"].append(int(vals.min()) if len(vals) else 2**31 - 1)
            out["max_token"].append(int(vals.max()) if len(vals) else -(2**31))
            out["sum_zigzag"].append(int(zzs[sl].sum(dtype=np.uint64)))
            # actual engine encode: blob length must equal the size oracle
            blob = encode_leb128(zzs[sl])
            assert len(blob) == int(szs[sl].sum())
            out["leb128_bytes"].append(len(blob))
            out["n_ntok_match"].append(int(eq[rstarts[g] : rstarts[g + 1]].sum()))
        return pa.table(out)


_STATS_STAGE: list = []


def _token_stats_fn(batch):
    if not _STATS_STAGE:
        _STATS_STAGE.append(_TokenStatsStage())
    return _STATS_STAGE[0](batch)


def _source_rollup(ds) -> "pd.DataFrame":
    """(source, n_docs, sum_tokens) over a decoded token Dataset: per-batch
    partials with an explicit schema (zero-row batches emit the same block
    schema), one source-sized groupby."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "n_tok": batch["n_tok"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_tok", "size"), sum_tokens=("n_tok", "sum")
        )
        return pa.table(
            {
                "source": pa.array(g["source"].astype(str), pa.string()),
                "n_docs": pa.array(g["n_docs"].astype("int64"), pa.int64()),
                "sum_tokens": pa.array(
                    g["sum_tokens"].astype("int64"), pa.int64()
                ),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_tokens", alias_name="sum_tokens"),
        )
        .to_pandas()
    )
    if out.empty:
        # a fully-pruned read yields a zero-block dataset whose groupby
        # carries no columns at all — normalize to the rollup schema
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=str),
                "n_docs": pd.Series([], dtype="int64"),
                "sum_tokens": pd.Series([], dtype="int64"),
            }
        )
    out = out[["source", "n_docs", "sum_tokens"]].astype(
        {"n_docs": "int64", "sum_tokens": "int64"}
    )
    return out.sort_values("source").reset_index(drop=True)


FILTERED_SOURCES = ["code", "web"]  # the pushdown demo's source subset


def q_filtered_decompress(sf_dir: str):
    """Source-predicate pushdown through the sink: compress (resumable —
    reuses the sink the other sink queries build), then decompress ONLY the
    requested sources. Single-source chunks outside the subset are pruned
    by a parquet predicate on source_top (their payloads never leave
    storage); the decoded stream is then aggregated per source."""
    import os

    from tokenzip.pipeline import compress, decompress

    paths = corpus_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    compress(paths, out_dir)
    return _source_rollup(decompress(out_dir, sources=FILTERED_SOURCES))


# the doc-id pushdown demo's range: zero-padded ids make lexicographic ==
# numeric order, and this window exists at every scale factor
DOC_RANGE = ("doc-00000100", "doc-00000299")


def _v2_sink(sf_dir: str) -> str:
    """The shared corpus sink, guaranteed at the CURRENT chunk format: a
    sink left by an older engine (missing zone-map or bloom columns) is
    wiped and rebuilt — resume alone would keep the old chunks and doc-id
    pushdown refuses mixed-format sinks loudly."""
    import os
    import shutil

    from tokenzip.chunk import CHUNK_FORMAT
    from tokenzip.manifest import Manifest
    from tokenzip.pipeline import compress

    paths = corpus_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    if int(
        Manifest(out_dir).data.get("chunk_format", 1)
    ) < CHUNK_FORMAT and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    compress(paths, out_dir)
    return out_dir


def q_doc_range_decompress(sf_dir: str):
    """Doc-id range pushdown through the sink (random access into the
    compressed corpus): decompress ONLY doc ids in DOC_RANGE. Chunks whose
    [did_min, did_max] zone map misses the range are pruned by a parquet
    predicate before their payloads leave storage; intersecting chunks are
    decoded and row-filtered exactly, then aggregated per source."""
    from tokenzip.pipeline import decompress

    out_dir = _v2_sink(sf_dir)
    return _source_rollup(decompress(out_dir, doc_id_range=DOC_RANGE))


# scattered point lookups (ids exist at every scale factor; the last is a
# deliberate miss) — scattered ids are the case the per-chunk doc-id
# BLOOM zone filters exist for: every chunk's [did_min, did_max] range may
# contain them, but only the chunks that actually hold one are decoded
DOC_POINTS = (
    "doc-00000007",
    "doc-00000123",
    "doc-00000456",
    "doc-00001003",
    "doc-00001777",
    "doc-99999999",
)


def q_doc_point_decompress(sf_dir: str):
    """Doc-id point-lookup pushdown (random access into the compressed
    corpus): decompress ONLY the DOC_POINTS ids. Zone maps prune on the
    id ranges first; the format-3 did_bloom bitsets then drop every chunk
    that provably holds none of the ids; survivors decode + row-filter
    exactly, then aggregate per source."""
    from tokenzip.pipeline import decompress

    out_dir = _v2_sink(sf_dir)
    return _source_rollup(decompress(out_dir, doc_ids=list(DOC_POINTS)))


def doc_point_decompress_sql(glob: str) -> str:
    ids = ", ".join(f"'{d}'" for d in DOC_POINTS)
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens
FROM read_parquet('{glob}') WHERE doc_id IN ({ids})
GROUP BY source ORDER BY source
"""


def doc_range_decompress_sql(glob: str) -> str:
    lo, hi = DOC_RANGE
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens
FROM read_parquet('{glob}') WHERE doc_id BETWEEN '{lo}' AND '{hi}'
GROUP BY source ORDER BY source
"""


def filtered_decompress_sql(glob: str) -> str:
    srcs = ", ".join(f"'{s}'" for s in FILTERED_SOURCES)
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens
FROM read_parquet('{glob}') WHERE source IN ({srcs})
GROUP BY source ORDER BY source
"""


def q_compacted_roundtrip(sf_dir: str):
    """Compress -> compact (merge chunk files, no re-encode) -> decompress
    the COMPACTED sink -> per-source aggregates. Proves the small-file
    compaction path is content-preserving end-to-end."""
    import os
    import shutil

    from tokenzip.pipeline import compact, compress, decompress

    paths = corpus_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    compress(paths, out_dir)
    cdir = out_dir + "_compacted"
    shutil.rmtree(cdir, ignore_errors=True)
    compact(out_dir, cdir, target_bytes=64 << 20)
    return _source_rollup(decompress(cdir))


def compacted_roundtrip_sql(glob: str) -> str:
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens
FROM read_parquet('{glob}')
GROUP BY source ORDER BY source
"""


def sink_stats_pushdown(out_dir: str):
    """Metadata-only sink aggregate: per-source (n_docs, sum_tokens) over
    the compressed sink where single-source chunks are answered from their
    METADATA row alone (n_rows/n_tokens — the encoded payload never leaves
    storage) and only mixed chunks (source_top='') pay a decode. At 100 TB
    this answers "how big is each source in the sink" reading megabytes of
    metadata instead of re-decoding the corpus. The decoded remainder
    reuses the exact decompress read shape (payload-column-pruned where
    the format allows)."""
    import os

    import pandas as pd
    import pyarrow.compute as pc

    from tokenzip.manifest import Manifest
    from tokenzip.pipeline import _decode_fn
    from tokenzip import uio

    chunks_dir = os.path.join(out_dir, "chunks")

    # pure chunks: 3 scalar columns, zero payload bytes
    meta = (
        ray.data.read_parquet(
            chunks_dir,
            columns=["source_top", "n_rows", "n_tokens"],
            filter=pc.field("source_top") != "",
        )
        .groupby("source_top")
        .aggregate(
            Sum("n_rows", alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
        )
        .to_pandas()
        .rename(columns={"source_top": "source"})
    )
    if meta.empty:  # all-mixed sink: zero-block aggregate has no columns
        meta = pd.DataFrame(columns=["source", "n_docs", "sum_tokens"])

    # mixed chunks: decode only these
    read_kwargs = {"filter": pc.field("source_top") == ""}
    if int(Manifest(out_dir).data.get("chunk_format", 1)) >= 3:
        from tokenzip.chunk import CHUNK_SCHEMA

        read_kwargs["columns"] = [
            f.name for f in CHUNK_SCHEMA if f.name != "did_bloom"
        ]
    sidecar = uio.join(out_dir, "symbols.json")
    mixed_rows = ray.data.read_parquet(chunks_dir, **read_kwargs).map_batches(
        _decode_fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={
            "sidecar": sidecar if uio.exists(sidecar) else None,
            "sources": None,
            "doc_id_range": None,
            "doc_ids": None,
        },
    )
    mixed = _source_rollup(mixed_rows)

    out = (
        pd.concat([meta, mixed], ignore_index=True)
        .groupby("source", as_index=False)[["n_docs", "sum_tokens"]]
        .sum()
    )
    out = out[["source", "n_docs", "sum_tokens"]].astype(
        {"n_docs": "int64", "sum_tokens": "int64"}
    )
    return out.sort_values("source").reset_index(drop=True)


def q_sink_stats_pushdown(sf_dir: str):
    """Driver-contract wrapper: build (resume) the shared corpus sink,
    then answer the per-source stats from its metadata + mixed remainder."""
    return sink_stats_pushdown(_v2_sink(sf_dir))


def sink_stats_pushdown_sql(glob: str) -> str:
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens
FROM read_parquet('{glob}')
GROUP BY source ORDER BY source
"""


def q_sink_projection_stats(sf_dir: str):
    """Projection pushdown through the sink: id/length stats computed via
    ``decompress(columns=["doc_id", "n_tok"])`` — the token payload blobs
    are neither read from storage nor decoded (the parquet read lists only
    the id/length streams; tests prove it by corrupting tokens_enc). The
    column-store dividend applied to the engine's OWN format."""
    import pandas as pd

    from tokenzip.pipeline import decompress

    out_dir = _v2_sink(sf_dir)
    ds = decompress(out_dir, columns=["doc_id", "n_tok"])

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        nt = b["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_docs": pa.array([len(ids)], pa.int64()),
                "sum_n_tok": pa.array([int(nt.sum())], pa.int64()),
                "min_doc_id": pa.array([min(ids) if ids else None], pa.string()),
                "max_doc_id": pa.array([max(ids) if ids else None], pa.string()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .dropna()
    )
    return pd.DataFrame(
        {
            "n_docs": [int(parts["n_docs"].sum())],
            "sum_n_tok": [int(parts["sum_n_tok"].sum())],
            "min_doc_id": [str(parts["min_doc_id"].min())],
            "max_doc_id": [str(parts["max_doc_id"].max())],
        }
    )


def sink_projection_stats_sql(glob: str) -> str:
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_n_tok,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM read_parquet('{glob}')
"""


def q_token_stats_by_source(sf_dir: str):
    ds = ray.data.read_parquet(corpus_paths(sf_dir))
    partials = ds.map_batches(
        _token_stats_fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2048,
    )
    return (
        partials.groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Min("min_token", alias_name="min_token"),
            Max("max_token", alias_name="max_token"),
            Sum("sum_zigzag", alias_name="sum_zigzag"),
            Sum("leb128_bytes", alias_name="leb128_bytes"),
            Sum("n_ntok_match", alias_name="n_ntok_match"),
        )
        .sort("source")
    )


def q_compression_by_codec(sf_dir: str):
    """Engine-internal codec mix + sizes. Oracle: the deterministic per-codec
    rows are PINNED (tokenzip.oracles.COMPRESSION_BY_CODEC_PIN) and
    self-audited in SQL against the corpus's closed-form token/LEB128 totals
    — see oracles.compression_by_codec_sql."""
    import os
    import shutil

    from tokenzip.pipeline import compress, chunk_meta_dataset

    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    # fresh compress every time: the manifest's resume would otherwise serve
    # chunks written by an OLDER codec version, silently diverging from the
    # pinned per-codec byte counts
    shutil.rmtree(out_dir, ignore_errors=True)
    compress(corpus_paths(sf_dir), out_dir)
    meta = chunk_meta_dataset(out_dir)
    return (
        meta.groupby("tokens_codec")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("tokens_bytes_out", alias_name="tokens_bytes_out"),
            Sum("leb128_bytes", alias_name="leb128_bytes"),
        )
        .sort("tokens_codec")
    )


class _IntColRoundtripStage:
    """Encode+decode every int64 key column of a lineitem batch through the
    auto-selected width-64 codec and emit per-returnflag checksums of the
    DECODED values — a differential test of the int64 codec family against
    the DuckDB oracle computed on the originals."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from tokenzip.codecs.core import decode_int_column, encode_int_column
        from tokenzip.codecs.selector import choose_int_codec

        cols = {}
        for name in ("l_orderkey", "l_partkey", "l_suppkey"):
            vals = batch[name].to_numpy(zero_copy_only=False).astype(np.int64)
            codec = choose_int_codec(vals, 64)
            decoded = decode_int_column(encode_int_column(vals, codec, 64))
            cols[name] = decoded
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pylist(),
                **cols,
            }
        )
        agg = df.groupby("l_returnflag", as_index=False).agg(
            n_rows=("l_orderkey", "size"),
            sum_orderkey=("l_orderkey", "sum"),
            sum_partkey=("l_partkey", "sum"),
            sum_suppkey=("l_suppkey", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_intcol_roundtrip_lineitem(sf_dir: str):
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"],
    )
    partials = ds.map_batches(
        _IntColRoundtripStage(),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8192,
    )
    return (
        partials.groupby("l_returnflag")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_orderkey", alias_name="sum_orderkey"),
            Sum("sum_partkey", alias_name="sum_partkey"),
            Sum("sum_suppkey", alias_name="sum_suppkey"),
        )
        .sort("l_returnflag")
    )


class _EventsTsRoundtripStage:
    """Timestamp-column compression: events.ts (sorted epoch-us int64) goes
    through the auto selector — the delta codec wins on monotonic streams —
    and user_id through the width-64 family; per-event_type checksums of the
    DECODED values are oracle-checked against DuckDB epoch_us()."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from tokenzip.codecs.core import decode_int_column, encode_int_column
        from tokenzip.codecs.selector import choose_int_codec

        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_codec = choose_int_codec(ts, 64)
        ts_rt = decode_int_column(encode_int_column(ts, ts_codec, 64))
        uid_rt = decode_int_column(
            encode_int_column(uid, choose_int_codec(uid, 64), 64)
        )
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pylist(), "ts": ts_rt, "uid": uid_rt}
        )
        agg = df.groupby("event_type", as_index=False).agg(
            n_events=("ts", "size"),
            sum_user_id=("uid", "sum"),
            min_ts_us=("ts", "min"),
            max_ts_us=("ts", "max"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_events_ts_roundtrip(sf_dir: str):
    import os

    from ray.data.aggregate import Max as _Max, Min as _Min

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "event_type"],
    )
    partials = ds.map_batches(
        _EventsTsRoundtripStage(),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8192,
    )
    return (
        partials.groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_user_id", alias_name="sum_user_id"),
            _Min("min_ts_us", alias_name="min_ts_us"),
            _Max("max_ts_us", alias_name="max_ts_us"),
        )
        .sort("event_type")
    )


def q_boundary_roundtrip(sf_dir: str):
    """Boundary-value corpus through EVERY registered int codec at every
    width: encode -> decode -> per-(width, codec) sums of the DECODED
    values, oracle-checked against direct sums of the same fixture list
    (the reference's 7-bit-boundary roundtrip tests,
    /root/reference/src/lib.rs:90-185, as a driver-visible differential).
    ``sf_dir`` is unused — the corpus is the canonical fixture."""
    import ray.data as rd

    from tokenzip.codecs.core import INT_CODECS, decode_int_column, encode_int_column
    from tokenzip.fixtures import WIDTHS, boundary_values

    tasks = [
        {"width": w, "codec": c}
        for w in WIDTHS
        for c in sorted(INT_CODECS)
        if not (c == "svb" and w > 32)
    ]
    ds = rd.from_items(tasks)

    def rt(batch: pa.Table) -> pa.Table:
        out = {"width": [], "codec": [], "n_values": [], "sum_decoded": []}
        for w, c in zip(batch["width"].to_pylist(), batch["codec"].to_pylist()):
            vals = np.array(boundary_values(int(w)), dtype=np.int64)
            dec = decode_int_column(encode_int_column(vals, c, int(w)))
            if not np.array_equal(dec, vals):
                raise AssertionError(f"boundary roundtrip failed: {c}@{w}")
            out["width"].append(int(w))
            out["codec"].append(c)
            out["n_values"].append(len(vals))
            out["sum_decoded"].append(int(sum(int(x) for x in dec)))
        return pa.table(
            {
                "width": pa.array(out["width"], pa.int64()),
                "codec": pa.array(out["codec"], pa.string()),
                "n_values": pa.array(out["n_values"], pa.int64()),
                "sum_decoded": pa.array(out["sum_decoded"], pa.int64()),
            }
        )

    return ds.map_batches(rt, batch_format="pyarrow").sort(["width", "codec"])


def q_compression_totals(sf_dir: str):
    """Manifest totals, oracle-checked: n_rows / n_tokens / leb128_bytes come
    from the actual compress run's manifest and must equal the closed-form
    SQL oracle; bound_ok asserts the north rule's <=-LEB128 bound on the
    TOKENS payload (tokens_bytes_out includes ~100B of container header per
    chunk; the LEB128-floor fallback guarantees the payload bound, and header
    slack is orders of magnitude below it at any chunk size)."""
    import os
    import pandas as pd

    from tokenzip.pipeline import compress

    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    totals = compress(corpus_paths(sf_dir), out_dir)
    return pd.DataFrame(
        [
            {
                "n_rows": int(totals["n_rows"]),
                "n_tokens": int(totals["n_tokens"]),
                "leb128_bytes": int(totals["leb128_bytes"]),
                "bound_ok": int(totals["tokens_bytes_out"] <= totals["leb128_bytes"]),
            }
        ]
    )


def q_recode_stats(sf_dir: str):
    """Codec-migration audit (pipeline.recode): compress a LEGACY sink with
    the codec forced to plain LEB128, migrate it to the auto selector with
    the fused decode->re-encode recode pass, then decode the RECODED sink
    and report per-source content stats.  Three self-audits run before the
    frame returns: recode's own per-fragment token-count drift guard, the
    migration byte win (auto must not exceed the legacy LEB128 bytes — the
    north rule's bound applied across a migration), and the oracle hash on
    the decoded content (bit-identical round trip through TWO sinks)."""
    import os

    import pandas as pd

    from tokenzip.pipeline import compress, decompress, recode

    legacy_dir = _scoped_out_dir("/tmp/tokenzip_legacy", sf_dir)
    dst_dir = _scoped_out_dir("/tmp/tokenzip_recoded", sf_dir)
    t_legacy = compress(corpus_paths(sf_dir), legacy_dir, tokens_codec="leb128")
    t_new = recode(legacy_dir, dst_dir, tokens_codec="auto")
    if t_new["n_tokens"] != t_legacy["n_tokens"]:
        raise ValueError(
            f"recode token drift: {t_new['n_tokens']} != {t_legacy['n_tokens']}"
        )
    if t_new["tokens_bytes_out"] > t_legacy["tokens_bytes_out"]:
        raise ValueError(
            "codec migration must not grow the tokens payload: "
            f"{t_new['tokens_bytes_out']} > {t_legacy['tokens_bytes_out']}"
        )

    def stats(batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        tok_src = np.repeat(inv, lengths)
        zz = zigzag_encode(values.astype(np.int32), 32).astype(np.int64)
        # int64 accumulator (np.add.at), NOT bincount's float64 weights —
        # a corpus-scale zigzag sum can pass 2^53 and lose exactness
        sum_zz = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sum_zz, tok_src, zz)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n_docs": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "n_tokens": pa.array(
                    np.bincount(inv, weights=lengths, minlength=len(uniq)).astype(np.int64)
                ),
                "sum_zigzag": pa.array(sum_zz),
            }
        )

    agg = (
        decompress(dst_dir)
        .map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("sum_zigzag", alias_name="sum_zigzag"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tokens": agg["n_tokens"].astype("int64"),
            "sum_zigzag": agg["sum_zigzag"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def recode_stats_sql(glob: str) -> str:
    zz = (
        "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) "
        "ELSE -2*CAST(t AS BIGINT)-1 END"
    )
    return f"""
WITH z AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM({zz}) AS BIGINT) AS sum_zigzag
  FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY source
),
d AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM read_parquet('{glob}') GROUP BY source
)
SELECT d.source AS source, n_docs,
       COALESCE(n_tokens, 0) AS n_tokens,
       COALESCE(sum_zigzag, 0) AS sum_zigzag
FROM d LEFT JOIN z ON d.source = z.source
ORDER BY d.source
"""


def _incompressible_partial(k: int):
    def fn(batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        zz = zigzag_encode(values.astype(np.int32), 32).astype(np.uint64)
        sizes = leb128_size(zz).astype(np.int64)
        # per-doc byte sums via one cumsum + offset gather
        csum = np.concatenate(([0], np.cumsum(sizes)))
        ends = np.cumsum(lengths.astype(np.int64))
        starts = ends - lengths
        doc_bytes = csum[ends] - csum[starts]
        keep = lengths > 0
        ids, doc_bytes, ntok = ids[keep], doc_bytes[keep], lengths[keep].astype(np.int64)
        # integer per-mille bytes/token: (bytes*1000)//ntok — exact on both
        # engines, no float ratio ever compared
        mills = doc_bytes * 1000 // ntok
        order = np.lexsort((ids, -mills))[:k]
        return pa.table(
            {
                "doc_id": pa.array([str(s) for s in ids[order]], pa.string()),
                "leb128_bytes": pa.array(doc_bytes[order]),
                "n_tok": pa.array(ntok[order]),
                "bytes_per_ktok": pa.array(mills[order]),
            }
        )

    return fn


def q_incompressible_topk(sf_dir: str, k: int = 20):
    """Top-k documents by LEB128 bytes per 1000 tokens — the
    incompressibility outlier report (near-random streams compress worst;
    in an LLM pipeline that's a quality/mixture signal, and for the engine
    it's the census of who defeats the codec family).  Per-batch partial
    top-k (k rows per block reach the driver), exact integer per-mille
    ratios, ties to the smaller doc_id."""
    import pandas as pd

    parts = (
        ray.data.read_parquet(
            _sorted_corpus(sf_dir), columns=["doc_id", "tokens"]
        )
        .map_batches(
            _incompressible_partial(k), batch_format="pyarrow", zero_copy_batch=True
        )
        .to_pandas()
    )
    top = (
        parts.sort_values(
            ["bytes_per_ktok", "doc_id"], ascending=[False, True], kind="stable"
        )
        .head(k)
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": top["doc_id"].astype(str),
            "leb128_bytes": top["leb128_bytes"].astype("int64"),
            "n_tok": top["n_tok"].astype("int64"),
            "bytes_per_ktok": top["bytes_per_ktok"].astype("int64"),
        }
    )
    return out


def _sorted_corpus(sf_dir: str) -> list[str]:
    return sorted(corpus_paths(sf_dir))


def incompressible_topk_sql(glob: str, k: int = 20) -> str:
    zz = "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) ELSE -2*CAST(t AS BIGINT)-1 END"
    return f"""
WITH per_doc AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN zz < 128 THEN 1 WHEN zz < 16384 THEN 2
                       WHEN zz < 2097152 THEN 3 WHEN zz < 268435456 THEN 4
                       ELSE 5 END) AS BIGINT) AS leb128_bytes,
         CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM (SELECT doc_id, {zz} AS zz
        FROM (SELECT doc_id, unnest(tokens) AS t FROM read_parquet('{glob}')))
  GROUP BY doc_id
)
SELECT CAST(row_number() OVER (
           ORDER BY leb128_bytes * 1000 // n_tok DESC, doc_id ASC) AS BIGINT)
           AS rank,
       doc_id, leb128_bytes, n_tok,
       CAST(leb128_bytes * 1000 // n_tok AS BIGINT) AS bytes_per_ktok
FROM per_doc
ORDER BY bytes_per_ktok DESC, doc_id ASC LIMIT {k}
"""


def q_shuffled_compress_stats(sf_dir: str):
    """The skew-isolation compress mode under the oracle: compress the
    corpus THROUGH the doc-hash groupby shuffle (shuffle_by_source=True),
    decode the sink, and report the same per-source content stats the
    plain path reports — hash-green iff the shuffled path is lossless."""
    import os

    import pandas as pd

    from tokenzip.pipeline import compress, decompress

    out_dir = _scoped_out_dir("/tmp/tokenzip_shuffled", sf_dir)
    compress(corpus_paths(sf_dir), out_dir, shuffle_by_source=True)

    def stats(batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        tok_src = np.repeat(inv, lengths)
        zz = zigzag_encode(values.astype(np.int32), 32).astype(np.int64)
        sum_zz = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sum_zz, tok_src, zz)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n_docs": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "n_tokens": pa.array(
                    np.bincount(inv, weights=lengths, minlength=len(uniq)).astype(np.int64)
                ),
                "sum_zigzag": pa.array(sum_zz),
            }
        )

    agg = (
        decompress(out_dir)
        .map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("sum_zigzag", alias_name="sum_zigzag"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tokens": agg["n_tokens"].astype("int64"),
            "sum_zigzag": agg["sum_zigzag"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def _fused_stats_fold(t: pa.Table) -> pa.Table:
    """Empty-safe per-chunk fold of the fused-consumer demo: per-source
    (n_docs, n_tokens, sum_zigzag) partials, computed on the decoded chunk
    while its buffer is cache-hot (int64 np.add.at accumulators — the exact
    integer rule)."""
    from tokenzip.chunk import _tokens_parts

    if not t.num_rows:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "sum_zigzag": pa.array([], pa.int64()),
            }
        )
    lengths, values = _tokens_parts(t["tokens"])
    src = t["source"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(src, return_inverse=True)
    zz = zigzag_encode(values.astype(np.int32), 32).astype(np.int64)
    sum_zz = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sum_zz, np.repeat(inv, lengths), zz)
    ntok = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(ntok, inv, lengths.astype(np.int64))
    return pa.table(
        {
            "source": pa.array([str(s) for s in uniq], pa.string()),
            "n_docs": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
            "n_tokens": pa.array(ntok),
            "sum_zigzag": pa.array(sum_zz),
        }
    )


def q_fused_decode_stats(sf_dir: str):
    """The fold-at-source consumer path (pipeline.decompress_map) under the
    oracle gate: compress (resumable, shares the other sink queries' sink),
    then run the per-source content stats fold FUSED into the decode task —
    decoded tokens never form block tables — and fold the chunk partials
    with one tiny source-sized groupby. Content must hash-match the SQL over
    the original corpus: the fused path is only a scheduling change."""
    import pandas as pd

    from tokenzip.pipeline import compress, decompress_map

    paths = corpus_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    compress(paths, out_dir)
    agg = (
        decompress_map(out_dir, _fused_stats_fold)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("sum_zigzag", alias_name="sum_zigzag"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tokens": agg["n_tokens"].astype("int64"),
            "sum_zigzag": agg["sum_zigzag"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def fused_decode_stats_sql(glob: str) -> str:
    return recode_stats_sql(glob)


# ---------------------------------------------------------------------------
# Targeted sink deletion (right-to-be-forgotten)
# ---------------------------------------------------------------------------

_DEL_DEN = 16  # salted rule "del:": ~1/16 of docs are deletion targets


def _content_rollup(ds) -> "pd.DataFrame":
    """Per-source (n_docs, n_tokens, sum_zigzag) over a decoded token
    Dataset — the content-strength rollup shared by the migration and
    deletion audits (order-insensitive zigzag checksum, exact int64)."""
    import pandas as pd

    def stats(batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        tok_src = np.repeat(inv, lengths)
        zz = zigzag_encode(values.astype(np.int32), 32).astype(np.int64)
        sum_zz = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sum_zz, tok_src, zz)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n_docs": pa.array(
                    np.bincount(inv, minlength=len(uniq)).astype(np.int64)
                ),
                "n_tokens": pa.array(
                    np.bincount(inv, weights=lengths, minlength=len(uniq)).astype(
                        np.int64
                    )
                ),
                "sum_zigzag": pa.array(sum_zz),
            }
        )

    agg = (
        ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("sum_zigzag", alias_name="sum_zigzag"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tokens": agg["n_tokens"].astype("int64"),
            "sum_zigzag": agg["sum_zigzag"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def q_sink_delete_roundtrip(sf_dir: str):
    """Right-to-be-forgotten audit (pipeline.delete_docs): compress the
    corpus, delete the docs picked by the salted md5 rule (md5('del:' ||
    doc_id) % 16 == 0 — re-shard/retry-stable, independent of the split/
    mixture/sample salts), then decode the SURVIVING sink and report the
    per-source content rollup.  The oracle computes the same rollup over
    the corpus WHERE NOT rule, so a single leftover token — or one byte of
    a deleted doc surviving in any rewritten chunk — breaks the hash.
    delete_docs' own audit additionally enforces new = old - deleted per
    fragment, and only bloom/zone-HIT fragments are rewritten (clean ones
    are byte-copied)."""
    from tokenzip.hashutil import md5_hi60_str
    from tokenzip.pipeline import compress, decompress, delete_docs

    paths = corpus_paths(sf_dir)
    src_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    dst_dir = _scoped_out_dir("/tmp/tokenzip_deleted", sf_dir)
    compress(paths, src_dir)

    def pick(batch: pa.Table) -> pa.Table:
        hv = md5_hi60_str(batch["doc_id"], b"del:")
        return batch.filter(pa.array((hv % _DEL_DEN) == 0))

    ids = [
        r["doc_id"]
        for r in ray.data.read_parquet(paths, columns=["doc_id"])
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    ]
    totals = delete_docs(src_dir, dst_dir, ids)
    if totals["n_docs_deleted"] != len(set(ids)):
        raise ValueError(
            f"delete audit: {totals['n_docs_deleted']} deleted != "
            f"{len(set(ids))} requested (all requested ids exist uniquely)"
        )
    return _content_rollup(decompress(dst_dir))


def delete_roundtrip_sql(glob: str) -> str:
    # identical salted md5-nibble arithmetic to the engine rule
    nib = lambda i: f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
    hv = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    zz = (
        "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) "
        "ELSE -2*CAST(t AS BIGINT)-1 END"
    )
    return f"""
WITH h AS (
  SELECT source, tokens, md5('del:' || doc_id) AS m FROM read_parquet('{glob}')
),
k AS (SELECT source, tokens FROM (SELECT source, tokens, {hv} AS hv FROM h)
      WHERE hv % {_DEL_DEN} != 0),
z AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM({zz}) AS BIGINT) AS sum_zigzag
  FROM (SELECT source, unnest(tokens) AS t FROM k)
  GROUP BY source
),
d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM k GROUP BY source)
SELECT d.source AS source, n_docs,
       COALESCE(n_tokens, 0) AS n_tokens,
       COALESCE(sum_zigzag, 0) AS sum_zigzag
FROM d LEFT JOIN z ON d.source = z.source
ORDER BY d.source
"""


def q_append_roundtrip(sf_dir: str):
    """Incremental ingestion audit: compress HALF the input shards into a
    sink, then run compress again over ALL shards — the manifest marks the
    first half done, so only the new fragments encode (append, not
    rebuild). The decoded content rollup must equal the full corpus: a
    sink grown by appends is indistinguishable from one built in one shot.
    This is the daily-ingest workflow at 100 TB — yesterday's fragments
    never re-encode."""
    from tokenzip.pipeline import compress, decompress

    paths = corpus_paths(sf_dir)
    half = paths[: max(1, len(paths) // 2)]
    out_dir = _scoped_out_dir("/tmp/tokenzip_append", sf_dir)
    t1 = compress(half, out_dir)
    t2 = compress(paths, out_dir)
    # growth guard, rerun-safe: a previously-completed sink makes BOTH
    # phases no-ops with equal totals, so assert on the manifest's
    # fragment ledger (every shard done exactly once), not on deltas
    from tokenzip.manifest import Manifest

    done = Manifest(out_dir).done_fragments()
    if len(done) != len(paths) or t2["n_rows"] < t1["n_rows"]:
        raise ValueError(
            f"append ledger wrong: {len(done)} fragments done for "
            f"{len(paths)} shards ({t1['n_rows']} -> {t2['n_rows']} rows)"
        )
    return _content_rollup(decompress(out_dir))


# ---------------------------------------------------------------------------
# Compression ratio by sequence-length bucket (codec analytics)
# ---------------------------------------------------------------------------

# Buckets are VALUE cuts at the exact n_tok deciles (ceil-rank rule), not
# NTILE row splits: rows tied on n_tok all land in one bucket, so the
# bucketing is deterministic on both engines without inventing a row
# order. Two column-pruned passes: the bounded histogram yields the cuts,
# then per-batch partials aggregate docs/tokens/LEB128 bytes per bucket.

_RATIO_QS = tuple((i, 10) for i in range(1, 10))  # p10..p90


def _length_cuts(paths: list[str]) -> list[int]:
    from tokenzip.training import _SeqLenHistStage

    hist: dict[int, int] = {}
    parts = (
        ray.data.read_parquet(paths, columns=["source", "n_tok"])
        .map_batches(
            _SeqLenHistStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .take_all()
    )
    for r in parts:
        hist[int(r["n_tok"])] = hist.get(int(r["n_tok"]), 0) + int(r["cnt"])
    vals = np.array(sorted(hist), dtype=np.int64)
    cnt = np.array([hist[int(v)] for v in vals], dtype=np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    cuts = []
    for num, den in _RATIO_QS:
        rank = (num * n + den - 1) // den  # ceil-rank, the repo's rule
        cuts.append(int(vals[np.searchsorted(cum, rank)]))
    return cuts


class _RatioBucketStage:
    """(bucket, n_docs, n_tokens, leb128_bytes) partials; bucket = index of
    the first cut >= n_tok (searchsorted left over the broadcast cuts)."""

    def __init__(self, cuts: list[int]):
        self.cuts = np.array(cuts, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        zz = zigzag_encode(values.astype(np.int32), 32).astype(np.uint64)
        sizes = leb128_size(zz).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(sizes)))
        ends = np.cumsum(lengths.astype(np.int64))
        starts = ends - lengths
        doc_bytes = csum[ends] - csum[starts]
        ntok = lengths.astype(np.int64)
        bkt = np.searchsorted(self.cuts, ntok, side="left")
        k = len(self.cuts) + 1
        nd = np.bincount(bkt, minlength=k).astype(np.int64)
        nt = np.zeros(k, np.int64)
        np.add.at(nt, bkt, ntok)
        nb = np.zeros(k, np.int64)
        np.add.at(nb, bkt, doc_bytes)
        return pa.table(
            {
                "bucket": pa.array(np.arange(k, dtype=np.int64)),
                "n_docs": pa.array(nd),
                "n_tokens": pa.array(nt),
                "leb128_bytes": pa.array(nb),
            }
        )


def q_ratio_by_length_bucket(sf_dir: str):
    """Codec analytics: LEB128 bytes per kilotoken across the corpus's
    length-decile buckets — whether short or long sequences defeat the
    varint family, in exact integers end to end."""
    import pandas as pd

    from ray.data.aggregate import Sum

    paths = corpus_paths(sf_dir)
    cuts = _length_cuts(paths)
    agg = (
        ray.data.read_parquet(paths, columns=["tokens"])
        .map_batches(
            _RatioBucketStage(cuts), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("leb128_bytes", alias_name="leb128_bytes"),
        )
        .to_pandas()
    )
    agg = agg[agg["n_docs"] > 0]
    out = pd.DataFrame(
        {
            "bucket": agg["bucket"].astype("int64"),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tokens": agg["n_tokens"].astype("int64"),
            "leb128_bytes": agg["leb128_bytes"].astype("int64"),
        }
    )
    out["bytes_per_kilotoken"] = (
        out["leb128_bytes"] * 1000 // out["n_tokens"].clip(lower=1)
    ).astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def ratio_by_length_bucket_sql(glob: str) -> str:
    zz = (
        "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) "
        "ELSE -2*CAST(t AS BIGINT)-1 END"
    )
    # LEB128 size of the zigzagged token: 1 + floor(log128(z)) expressed as
    # integer threshold comparisons (tokens are int32 -> zigzag < 2^32 ->
    # at most 5 bytes)
    sz = (
        f"CASE WHEN {zz} < 128 THEN 1 WHEN {zz} < 16384 THEN 2 "
        f"WHEN {zz} < 2097152 THEN 3 WHEN {zz} < 268435456 THEN 4 "
        "ELSE 5 END"
    )
    ranks = ", ".join(
        f"(({num} * n + {den - 1}) // {den})" for num, den in _RATIO_QS
    )
    return f"""
WITH o AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         ROW_NUMBER() OVER (ORDER BY n_tok) AS rn,
         COUNT(*) OVER () AS n
  FROM read_parquet('{glob}')
),
cuts AS (
  SELECT list_sort(list(n_tok)) AS cs
  FROM o WHERE rn IN ({ranks})
),
b AS (
  SELECT o.doc_id, o.n_tok,
         (SELECT COUNT(*) FROM unnest((SELECT cs FROM cuts)) AS u(c)
          WHERE c < o.n_tok) AS bucket
  FROM o
),
d AS (
  SELECT doc_id, CAST(SUM({sz}) AS BIGINT) AS db,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM (SELECT doc_id, unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY doc_id
)
SELECT b.bucket AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(d.nt, 0)) AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(d.db, 0)) AS BIGINT) AS leb128_bytes,
       CAST(SUM(COALESCE(d.db, 0)) * 1000 //
            GREATEST(SUM(COALESCE(d.nt, 0)), 1) AS BIGINT)
         AS bytes_per_kilotoken
FROM b LEFT JOIN d ON b.doc_id = d.doc_id
GROUP BY b.bucket ORDER BY b.bucket
"""


_UPS_DEN = 16  # salted rule "ups:": ~1/16 of docs get replaced by the merge


def q_sink_upsert_roundtrip(sf_dir: str):
    """MERGE audit (pipeline.upsert_docs): compress the corpus, build an
    update batch from the salted md5 rule (md5('ups:' || doc_id) % 16 == 0)
    — each picked doc REPLACED with its tokens plus a sentinel 42 appended,
    plus one brand-new INSERTED doc ('new:' || doc_id, tokens [7,11,13]) —
    then upsert the batch and decode the merged sink. The oracle recomputes
    the same latest-wins merge in SQL, so a stale surviving version, a lost
    insert, or one corrupted token anywhere breaks the hash. upsert_docs'
    own guard additionally enforces rows = old - replaced + new exactly."""
    import hashlib
    import os

    from tokenzip.hashutil import md5_hi60_str
    from tokenzip.pipeline import compress, decompress, upsert_docs

    paths = corpus_paths(sf_dir)
    src_dir = _scoped_out_dir("/tmp/tokenzip_ups_src", sf_dir)
    compress(paths, src_dir)

    def pick(batch: pa.Table) -> pa.Table:
        hv = md5_hi60_str(batch["doc_id"], b"ups:")
        picked = batch.filter(pa.array((hv % _UPS_DEN) == 0))
        return picked.select(["doc_id", "tokens", "source"])

    # Collect the PICKED rows (~1/16 of the audit corpus — a bounded
    # fixture, not a scale path) and build ONE canonical update fragment
    # sorted by doc_id: the batch must be byte-deterministic across
    # sessions, independent of Ray's block boundaries, or upsert_docs'
    # stale-batch guard (correctly) refuses the rerun.
    rows = (
        ray.data.read_parquet(paths, columns=["doc_id", "tokens", "source"])
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    rows.sort(key=lambda r: str(r["doc_id"]))
    did = [str(r["doc_id"]) for r in rows]
    toks = [list(map(int, r["tokens"])) for r in rows]
    srcs = [str(r["source"]) for r in rows]
    out_toks = [list(t) + [42] for t in toks] + [[7, 11, 13]] * len(did)
    upd_tab = pa.table(
        {
            "doc_id": pa.array(did + ["new:" + d for d in did], pa.string()),
            "tokens": pa.array(out_toks, pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in out_toks], pa.int32()),
            "source": pa.array(srcs * 2, pa.string()),
        }
    )
    # scratch sinks keyed by the BATCH fingerprint: a changed batch (new
    # code, new corpus) starts fresh; an identical rerun resumes as a no-op
    fp = hashlib.md5(
        upd_tab.to_pandas().to_csv(index=False).encode()
    ).hexdigest()[:10]
    dst_dir = _scoped_out_dir("/tmp/tokenzip_ups_dst", sf_dir) + "-" + fp
    upd_dir = _scoped_out_dir("/tmp/tokenzip_ups_new", sf_dir) + "-" + fp
    os.makedirs(upd_dir, exist_ok=True)
    upd_path = os.path.join(upd_dir, "upd-0000.parquet")
    if not os.path.exists(upd_path):
        import pyarrow.parquet as pq_

        pq_.write_table(upd_tab, upd_path)
    totals = upsert_docs(src_dir, dst_dir, [upd_path])
    if totals["n_docs_replaced"] == 0 or totals["n_docs_inserted"] == 0:
        raise ValueError(
            f"upsert audit expected both halves of MERGE to fire: "
            f"{totals['n_docs_replaced']} replaced, "
            f"{totals['n_docs_inserted']} inserted"
        )
    return _content_rollup(decompress(dst_dir))


def upsert_roundtrip_sql(glob: str) -> str:
    # identical salted md5-nibble arithmetic to the engine rule
    nib = lambda i: f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
    hv = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    zz = (
        "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) "
        "ELSE -2*CAST(t AS BIGINT)-1 END"
    )
    return f"""
WITH h AS (
  SELECT doc_id, source, tokens, md5('ups:' || doc_id) AS m
  FROM read_parquet('{glob}')
),
p AS (SELECT doc_id, source, tokens
      FROM (SELECT doc_id, source, tokens, {hv} AS hv FROM h)
      WHERE hv % {_UPS_DEN} = 0),
merged AS (
  SELECT source, tokens
  FROM (SELECT source, tokens, {hv} AS hv FROM h) WHERE hv % {_UPS_DEN} != 0
  UNION ALL
  SELECT source, tokens || [42] FROM p
  UNION ALL
  SELECT source, [7, 11, 13] FROM p
),
z AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM({zz}) AS BIGINT) AS sum_zigzag
  FROM (SELECT source, unnest(tokens) AS t FROM merged)
  GROUP BY source
),
d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM merged GROUP BY source)
SELECT d.source AS source, n_docs,
       COALESCE(n_tokens, 0) AS n_tokens,
       COALESCE(sum_zigzag, 0) AS sum_zigzag
FROM d LEFT JOIN z ON d.source = z.source
ORDER BY d.source
"""


def q_clustered_range_decompress(sf_dir: str):
    """Doc-id range pushdown through a CLUSTERED sink (compress with
    cluster_by='doc_id': range-partitioned shuffle + in-group sort, so
    every chunk's [did_min, did_max] window is tight and near-disjoint).
    Content must equal the plain-layout range decompress — clustering is
    a pure LAYOUT optimization; the pruning win is asserted in
    tests/test_pipeline.py on a deliberately scattered corpus."""
    from tokenzip.pipeline import compress, decompress

    paths = corpus_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_clustered", sf_dir)
    compress(paths, out_dir, cluster_by="doc_id")
    return _source_rollup(decompress(out_dir, doc_id_range=DOC_RANGE))


def q_sink_fsck_stats(sf_dir: str):
    """Standalone integrity check of the shared sink (pipeline.fsck): every
    chunk decodes; n_rows / n_tokens / n_tok / zone windows / blooms /
    content checksums re-derive from the decoded rows; the manifest ledger
    folds against the chunk files. Returns the fsck totals — the oracle
    recomputes rows/tokens from the corpus, and ``ok`` must be 1."""
    import pandas as pd

    from tokenzip.pipeline import compress, fsck

    paths = corpus_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_out", sf_dir)
    compress(paths, out_dir)
    t = fsck(out_dir)
    return pd.DataFrame(
        {
            "n_rows": [int(t["n_rows"])],
            "n_tokens": [int(t["n_tokens"])],
            "ok": [int(t["ok"])],
        }
    )


def sink_fsck_sql(glob: str) -> str:
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS n_tokens,
       CAST(1 AS BIGINT) AS ok
FROM read_parquet('{glob}')
"""
