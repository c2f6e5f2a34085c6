"""Generic-table compression: the engine's codec family applied to ANY
parquet table, not just the token corpus.

The reference is a general-purpose integer codec library (varints over any
`u8..u64` stream, /root/reference/src/lib.rs); the flagship `pipeline`
module specializes its Ray shape to the tokens schema. This module is the
general case: `compress_table(paths, out_dir)` auto-selects a codec per
(integer or timestamp) column per chunk, routes floats through the
XOR-delta family and strings through the string selector, stores every
other column verbatim (columnar passthrough), and writes frag-partitioned
chunk parquet plus the same resumable lineage manifest `compress()` uses.
Nullable columns carry a 1-bit/row validity bitmap beside the dense
non-null value stream. `decompress_table(out_dir)` streams the original
schema back, bit-identical (nulls included).

Ray shape mirrors pipeline.compress: fused ReadParquet -> encode map
(zero-copy Arrow, one chunk row per block), partitioned write, chunk-meta
manifest fold; decode is a fused read -> map_batches. Each chunk row
carries the per-column codec ids, the original dtype tags, and byte
counts, so lineage and the LEB128 size bound stay auditable per chunk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from tokenzip.codecs.core import (
    decode_float_column,
    decode_int_column,
    encode_float_column,
    encode_int_column,
    leb128_oracle_bytes,
    pack_blob,
    unpack_blob,
)
from tokenzip.codecs.selector import choose_int_codec
from tokenzip import uio
from tokenzip.errors import ChunkFormatError
from tokenzip.pipeline import _add_frag, _fold_chunk_meta, _frag_of_path

_INT_WIDTH = {"int8": 8, "int16": 16, "int32": 32, "int64": 64}

# unsigned columns ride the same int64-value codec path (the reference is
# a u8..u64 varint library — /root/reference/src/lib.rs): u8/u16/u32 widen
# losslessly into the next signed width's domain; u64 is stored as its
# two's-complement int64 BITCAST (modular int64 arithmetic in the codecs
# keeps the roundtrip exact for values >= 2^63)
_UINT_WIDTH = {"uint8": 16, "uint16": 32, "uint32": 64, "uint64": 64}

# bump when the chunk-row schema changes (v2: scalar zone-map columns;
# v3: enc_nulls validity bitmaps; v4: string smin_/smax_ zone maps)
_CHUNK_VER = 5  # 5: encoded list columns + znn_/zsum_ aggregate metadata

_DTYPE_OF_TAG = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
}


def _list_child_tag(t: pa.DataType) -> str | None:
    """dtype tag of a list's element type when the codec family covers it
    (ints, unsigned ints, naive timestamps, float32/64); None routes the
    list to verbatim passthrough."""
    tag = str(t)
    if tag in _INT_WIDTH or tag in _UINT_WIDTH or tag in ("float", "double"):
        return tag
    if pa.types.is_timestamp(t) and t.tz is None:
        return tag
    return None


def _col_plan(
    schema: pa.Schema,
) -> tuple[
    list[tuple[str, int, str]],
    list[str],
    list[tuple[str, int, str]],
    list[tuple[str, str, str]],
    list[str],
]:
    """(int columns as (name, width, dtype-tag), string column names,
    float columns, list columns as (name, list-kind, element-tag),
    passthrough names). Ints at their native width, unsigned ints widened
    (u64 bitcast), naive timestamps as width-64 (delta usually wins on
    sorted time columns), strings through the plain/dict/prefix_int/FSST
    auto-selector, float64 through the XOR-delta family (raw floor on
    incompressible values; float32 and float64). list/large_list of any of
    those element types decomposes into a lengths stream + a flattened
    value stream, each through its own codec (the reference's flat
    `&[u64]` contract applied to the child buffer —
    /root/reference/src/lib.rs). Bool/nested-of-nested/decimal: verbatim
    columnar passthrough."""
    enc, strs, flts, lsts, passthru = [], [], [], [], []
    for f in schema:
        tag = str(f.type)
        if tag in _INT_WIDTH:
            enc.append((f.name, _INT_WIDTH[tag], tag))
        elif tag in _UINT_WIDTH:
            enc.append((f.name, _UINT_WIDTH[tag], tag))
        elif pa.types.is_timestamp(f.type) and f.type.tz is None:
            enc.append((f.name, 64, tag))
        elif pa.types.is_string(f.type):
            strs.append(f.name)
        elif tag == "double":
            flts.append((f.name, 64, tag))
        elif tag == "float":
            flts.append((f.name, 32, tag))
        elif pa.types.is_list(f.type) or pa.types.is_large_list(f.type):
            ctag = _list_child_tag(f.type.value_type)
            if ctag is None:
                passthru.append(f.name)
            else:
                kind = (
                    "large_list"
                    if pa.types.is_large_list(f.type)
                    else "list"
                )
                lsts.append((f.name, kind, ctag))
        else:
            passthru.append(f.name)
    return enc, strs, flts, lsts, passthru


def _exact_sum_i64(vals: np.ndarray) -> int:
    """Exact (arbitrary-precision) sum of an int64 array without a Python
    loop: split each value into a signed high half and an unsigned low
    half, sum each half in its own 64-bit accumulator (no overflow for
    chunks up to 2^25 rows), recombine in Python ints."""
    if not len(vals):
        return 0
    lo = int((vals.view(np.uint64) & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
    hi = int((vals >> 32).sum(dtype=np.int64))
    return (hi << 32) + lo


def _encode_int_vals(vals: np.ndarray, width: int) -> bytes:
    """Selector-chosen int blob with the LEB128 fallback floor (sampling
    can mispredict, the floor cannot) — the shared tail of the scalar-int
    and list-value encode paths."""
    codec = choose_int_codec(vals, width)
    blob = encode_int_column(vals, codec, width)
    if codec != "leb128":
        lb = encode_int_column(vals, "leb128", width)
        if len(lb) < len(blob):
            blob = lb
    return blob


def _encode_list_column(col: pa.Array, kind: str, ctag: str) -> bytes:
    """list column (no top-level nulls — those were split off into the
    enc_nulls bitmap) -> one packed 'lst' blob: lengths stream (RLE
    collapses fixed-dim lists to ~nothing), flattened value stream through
    the int or float codec family, and an element-validity bitmap (b""
    when elements are null-free)."""
    lens = (
        pa.compute.list_value_length(col)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    flat = col.flatten()  # values in list order; sliced offsets respected
    vmap = b""
    if flat.null_count:
        valid = flat.is_valid().to_numpy(zero_copy_only=False)
        vmap = np.packbits(valid).tobytes()
        flat = flat.drop_null()
    if ctag in ("float", "double"):
        fwidth = 64 if ctag == "double" else 32
        vblob = encode_float_column(
            flat.to_numpy(zero_copy_only=False), fwidth
        )
    else:
        if ctag == "uint64":
            vals = flat.to_numpy(zero_copy_only=False).view(np.int64)
            width = 64
        else:
            vals = flat.cast(pa.int64()).to_numpy(zero_copy_only=False)
            width = _INT_WIDTH.get(ctag) or _UINT_WIDTH.get(ctag) or 64
        vblob = _encode_int_vals(vals, width)
    lblob = _encode_int_vals(lens, 64)
    return pack_blob(
        "lst",
        {"n": len(col), "k": kind, "ct": ctag, "ne": int(lens.sum())},
        [lblob, vblob, vmap],
    )


def _decode_list_column(blob) -> pa.Array:
    """Inverse of _encode_list_column (dense non-null lists; the caller
    re-expands top-level nulls from the enc_nulls bitmap)."""
    codec, meta, streams = unpack_blob(blob)
    if codec != "lst":
        raise ChunkFormatError(f"expected a 'lst' blob, got {codec!r}")
    ctag = meta["ct"]
    n = int(meta["n"])
    n_elem = int(meta["ne"])
    lens = decode_int_column(bytes(streams[0]))
    if ctag in ("float", "double"):
        vals = decode_float_column(bytes(streams[1]))
        vtyp = pa.float64() if ctag == "double" else pa.float32()
        varr_np = vals
    else:
        ints = decode_int_column(bytes(streams[1]))
        vtyp = _DTYPE_OF_TAG[ctag]
        varr_np = ints.view(np.uint64) if ctag == "uint64" else ints
    vmap = bytes(streams[2])
    if vmap:
        valid = np.unpackbits(
            np.frombuffer(vmap, np.uint8), count=n_elem
        ).astype(bool)
        idx = np.zeros(n_elem, np.int64)
        idx[valid] = np.arange(len(varr_np), dtype=np.int64)
        values = pa.compute.take(
            pa.array(varr_np).cast(vtyp)
            if ctag not in ("float", "double", "uint64")
            else pa.array(varr_np, vtyp),
            pa.array(idx, pa.int64(), mask=~valid),
        )
    elif ctag in ("float", "double", "uint64"):
        values = pa.array(varr_np, vtyp)
    else:
        values = pa.array(varr_np).cast(vtyp)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    if meta["k"] == "large_list":
        return pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), values
        )
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), values
    )


def _one_list(arr: pa.Array) -> pa.Array:
    """Wrap a column slice as a one-element large_list (the chunk row's
    passthrough payload) — offsets only, values zero-copy."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return pa.LargeListArray.from_arrays(
        pa.array([0, len(arr)], pa.int64()), arr
    )


def _null_split(col: pa.Array) -> tuple[pa.Array, bytes]:
    """(non-null values, packed validity bitmap). The bitmap is b"" for a
    null-free column — the common case costs zero bytes and zero work;
    otherwise 1 bit/row (np.packbits big-endian), values dense."""
    if not col.null_count:
        return col, b""
    valid = col.is_valid().to_numpy(zero_copy_only=False)
    return col.drop_null(), np.packbits(valid).tobytes()


def _encode_table_fn(batch: pa.Table) -> pa.Table:
    """One chunk row per (batch, frag): every plannable column packed with
    the auto-selected codec (LEB128 fallback keeps the size bound — sampling
    can mispredict, the floor cannot), the rest wrapped verbatim. Nullable
    columns carry a validity bitmap in enc_nulls; only the non-null values
    enter the codec stream."""
    from tokenzip.codecs.strings import encode_str_column

    schema = batch.schema
    enc_plan, str_cols, flt_cols, lst_cols, passthru = _col_plan(
        pa.schema([f for f in schema if f.name != "frag"])
    )
    frags = batch["frag"].to_numpy(zero_copy_only=False)
    uniq = np.unique(frags)
    rows = []
    for frag in uniq:
        sub = batch.filter(pa.array(frags == frag)) if len(uniq) > 1 else batch
        names, codecs, dtags, blobs, nmaps = [], [], [], [], []
        bytes_in = int_bytes_out = str_bytes_out = oracle = 0
        zmaps: dict[str, tuple[int, int]] = {}
        zaggs: dict[str, tuple[int, int]] = {}  # name -> (n_nonnull, sum)
        for name, width, tag in enc_plan:
            col = sub[name]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            col, nmap = _null_split(col)
            if tag == "uint64":
                # bitcast, not cast: values >= 2^63 don't fit int64's domain
                vals = col.to_numpy(zero_copy_only=False).view(np.int64)
            else:
                vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            codec = choose_int_codec(vals, width)
            blob = encode_int_column(vals, codec, width)
            bound = leb128_oracle_bytes(vals, width)
            if codec != "leb128" and len(blob) > len(
                lb := encode_int_column(vals, "leb128", width)
            ):
                codec, blob = "leb128", lb
            names.append(name)
            codecs.append(codec)
            dtags.append(tag)
            blobs.append(blob)
            nmaps.append(nmap)
            bytes_in += vals.nbytes
            int_bytes_out += len(blob)
            # bitmap bytes count outside the LEB128 bound (the oracle
            # covers the integer value stream only)
            str_bytes_out += len(nmap)
            oracle += bound
            # zone map (min/max in int64 storage units): an empty chunk
            # gets the inverted range (1, 0) so every predicate prunes it
            zmaps[name] = (
                (int(vals.min()), int(vals.max())) if len(vals) else (1, 0)
            )
            # aggregate metadata (parquet-stats analog): non-null count +
            # exact sum in int64 storage units, serialized as a decimal
            # string so the fold never overflows — SUM/COUNT/MIN/MAX
            # queries answer from chunk rows without touching any blob
            zaggs[name] = (len(vals), _exact_sum_i64(vals))
        for name, fwidth, ftag in flt_cols:
            col = sub[name]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            col, nmap = _null_split(col)
            fvals = col.to_numpy(zero_copy_only=False)
            blob = encode_float_column(fvals, fwidth)
            names.append(name)
            codecs.append("flt")  # blob header names the actual codec
            dtags.append(ftag)
            blobs.append(blob)
            nmaps.append(nmap)
            bytes_in += fvals.nbytes
            str_bytes_out += len(blob) + len(nmap)
        for name, kind, ctag in lst_cols:
            col = sub[name]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            col, nmap = _null_split(col)
            blob = _encode_list_column(col, kind, ctag)
            names.append(name)
            codecs.append("lst")
            dtags.append(f"{kind}<{ctag}>")
            blobs.append(blob)
            nmaps.append(nmap)
            bytes_in += sum(
                b.size
                for b in (col.buffers() if len(col) else [])
                if b is not None
            )
            str_bytes_out += len(blob) + len(nmap)
        szmaps: dict[str, tuple[str, str]] = {}
        for name in str_cols:
            col = sub[name]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            col, nmap = _null_split(col)
            blob = encode_str_column(col, "auto")
            names.append(name)
            codecs.append("str")  # blob header names the actual codec
            dtags.append("string")
            blobs.append(blob)
            nmaps.append(nmap)
            bytes_in += sum(b.size for b in col.buffers() if b is not None)
            str_bytes_out += len(blob) + len(nmap)
            # lexicographic zone map over the NON-NULL values; an empty /
            # all-null chunk gets the inverted range (max-codepoint, "") so
            # every predicate prunes it (NULL never matches a BETWEEN)
            if len(col):
                mm = pa.compute.min_max(col)
                szmaps[name] = (mm["min"].as_py(), mm["max"].as_py())
            else:
                szmaps[name] = ("\U0010ffff", "")
        row = {
            "frag": str(frag),
            "n_rows": sub.num_rows,
            "n_tokens": sub.num_rows * len(enc_plan),  # encoded int values
            "bytes_in": bytes_in,
            "bytes_out": int_bytes_out + str_bytes_out,
            # the LEB128 size bound covers integer streams only: compare
            # tokens_bytes_out (int blobs) to leb128_bytes, never the
            # string payload
            "tokens_bytes_out": int_bytes_out,
            "leb128_bytes": oracle,
            "enc_names": names,
            "enc_codecs": codecs,
            "enc_dtypes": dtags,
            "enc_blobs": blobs,
            "col_order": [f.name for f in schema if f.name != "frag"],
        }
        arrays = {
            "frag": pa.array([row["frag"]], pa.string()),
            "n_rows": pa.array([row["n_rows"]], pa.int64()),
            "n_tokens": pa.array([row["n_tokens"]], pa.int64()),
            "bytes_in": pa.array([row["bytes_in"]], pa.int64()),
            "bytes_out": pa.array([row["bytes_out"]], pa.int64()),
            "tokens_bytes_out": pa.array([row["tokens_bytes_out"]], pa.int64()),
            "leb128_bytes": pa.array([row["leb128_bytes"]], pa.int64()),
            # scalar codec-plan string so pipeline._fold_chunk_meta's codec
            # mix accounting works unchanged for table chunks
            "tokens_codec": pa.array(
                [",".join(f"{n}={c}" for n, c in zip(names, codecs))],
                pa.string(),
            ),
            "enc_names": pa.array([names], pa.list_(pa.string())),
            "enc_codecs": pa.array([codecs], pa.list_(pa.string())),
            "enc_dtypes": pa.array([dtags], pa.list_(pa.string())),
            "enc_blobs": pa.array([blobs], pa.list_(pa.binary())),
            # per-column packed validity bitmaps, b"" when null-free
            "enc_nulls": pa.array([nmaps], pa.list_(pa.binary())),
            "col_order": pa.array([row["col_order"]], pa.list_(pa.string())),
        }
        for name in passthru:
            arrays[f"p_{name}"] = _one_list(sub[name])
        # scalar zone-map columns (one zmin_/zmax_ pair per encoded
        # int/timestamp column — value-range analog of the token sink's
        # source_top pushdown): scalars, not lists, because parquet
        # predicate pushdown can only see scalar columns
        for name, (lo, hi) in zmaps.items():
            arrays[f"zmin_{name}"] = pa.array([lo], pa.int64())
            arrays[f"zmax_{name}"] = pa.array([hi], pa.int64())
        # aggregate metadata scalars: non-null count + exact decimal-string
        # sum per encoded int/timestamp column (see zaggs above)
        for name, (nn, sm) in zaggs.items():
            arrays[f"znn_{name}"] = pa.array([nn], pa.int64())
            arrays[f"zsum_{name}"] = pa.array([str(sm)], pa.string())
        # string zone maps (same contract, lexicographic): smin_/smax_
        for name, (slo, shi) in szmaps.items():
            arrays[f"smin_{name}"] = pa.array([slo], pa.string())
            arrays[f"smax_{name}"] = pa.array([shi], pa.string())
        rows.append(pa.table(arrays))
    return pa.concat_tables(rows)


def compress_table(
    input_paths: list[str],
    out_dir: str,
    *,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """Compress any parquet table into chunk parquet + lineage manifest.
    Same resume contract as pipeline.compress (shared _compress_setup):
    done fragments skipped, partial output of unfinished fragments wiped
    before re-encode."""
    from tokenzip.pipeline import _compress_setup

    # 'frag'/'path' are the pipeline's provenance columns — refuse inputs
    # that collide rather than silently dropping or shadowing user data.
    # Fast driver-side fail on the first file; a LATER file smuggling the
    # reserved column is caught distributed by _add_frag's per-batch guard
    # ('path' collisions surface as read_parquet(include_paths=True) errors).
    sch = pq.ParquetFile(input_paths[0]).schema_arrow
    for reserved in ("frag", "path"):
        if reserved in sch.names:
            raise ChunkFormatError(
                f"input column {reserved!r} collides with the engine's "
                "provenance columns; rename it before compress_table"
            )

    man, todo, chunks_dir, n_blocks = _compress_setup(input_paths, out_dir, resume)
    if not todo:
        return man.totals()
    ds = ray.data.read_parquet(todo, include_paths=True, override_num_blocks=n_blocks)
    ds = ds.map_batches(_add_frag, batch_format="pyarrow", zero_copy_batch=True)
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    if concurrency:
        kwargs["concurrency"] = concurrency
    ds = ds.map_batches(_encode_table_fn, **kwargs)
    ds.write_parquet(chunks_dir, partition_cols=["frag"], compression="none")

    frags_written = (
        {d.split("=", 1)[1] for d in uio.listdir(chunks_dir) if d.startswith("frag=")}
    )
    zero = {
        "n_chunks": 0, "n_rows": 0, "n_tokens": 0, "bytes_in": 0,
        "bytes_out": 0, "tokens_bytes_out": 0, "leb128_bytes": 0, "codecs": {},
    }
    todo_frags = [_frag_of_path(p) for p in todo]
    stats = _fold_chunk_meta(chunks_dir, sorted(set(todo_frags) & frags_written))
    for frag in todo_frags:
        man.mark_done(frag, stats.get(frag) or dict(zero))
    man.save()
    return man.totals()


def _null_expand_np(vals: np.ndarray, nmap: bytes, n: int, typ) -> pa.Array:
    """Scatter dense non-null values back to n rows under the packed
    validity bitmap (vectorized: one unpackbits + one fancy-index)."""
    valid = np.unpackbits(np.frombuffer(nmap, np.uint8), count=n).astype(bool)
    full = np.zeros(n, vals.dtype)
    full[valid] = vals
    return pa.array(full, typ, mask=~valid)


def _decode_table_fn(batch: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Chunk rows -> original-schema rows (bit-identical, nulls restored
    from the enc_nulls bitmaps). ``columns`` projects at DECODE time:
    unrequested columns' blobs are skipped entirely (CPU saving; the I/O
    is list-column-bound in this format, unlike the token sink's
    per-stream parquet columns — see pipeline.decompress(columns=...))."""
    out = []
    names_col = batch["enc_names"].to_pylist()
    codecs_col = batch["enc_codecs"].to_pylist()  # lineage; blob embeds codec
    dtags_col = batch["enc_dtypes"].to_pylist()
    blobs_col = batch["enc_blobs"].to_pylist()
    nulls_col = (
        batch["enc_nulls"].to_pylist()
        if "enc_nulls" in batch.column_names
        else [[b""] * len(n) for n in names_col]  # pre-v3 chunks: null-free
    )
    order_col = batch["col_order"].to_pylist()
    n_rows_col = batch["n_rows"].to_pylist()
    from tokenzip.codecs.strings import decode_str_column

    for i in range(batch.num_rows):
        cols: dict[str, pa.Array] = {}
        n = int(n_rows_col[i])
        if columns is not None:
            unknown = set(columns) - set(order_col[i])
            if unknown:
                raise ValueError(
                    f"unknown table columns {sorted(unknown)}; "
                    f"sink carries {sorted(order_col[i])}"
                )
        for name, tag, blob, nmap in zip(
            names_col[i], dtags_col[i], blobs_col[i], nulls_col[i]
        ):
            if columns is not None and name not in columns:
                continue
            if tag == "string":
                dec = decode_str_column(blob)
                if nmap:
                    valid = np.unpackbits(
                        np.frombuffer(nmap, np.uint8), count=n
                    ).astype(bool)
                    idx = np.zeros(n, np.int64)
                    idx[valid] = np.arange(len(dec), dtype=np.int64)
                    dec = pa.compute.take(
                        dec, pa.array(idx, pa.int64(), mask=~valid)
                    )
                cols[name] = dec
                continue
            if tag.startswith(("list<", "large_list<")):
                dec = _decode_list_column(blob)
                if nmap:
                    valid = np.unpackbits(
                        np.frombuffer(nmap, np.uint8), count=n
                    ).astype(bool)
                    idx = np.zeros(n, np.int64)
                    idx[valid] = np.arange(len(dec), dtype=np.int64)
                    dec = pa.compute.take(
                        dec, pa.array(idx, pa.int64(), mask=~valid)
                    )
                cols[name] = dec
                continue
            if tag in ("double", "float"):
                fvals = decode_float_column(blob)
                ftyp = pa.float64() if tag == "double" else pa.float32()
                cols[name] = (
                    _null_expand_np(fvals, nmap, n, ftyp)
                    if nmap
                    else pa.array(fvals, ftyp)
                )
                continue
            typ = _DTYPE_OF_TAG.get(tag)
            if typ is None:
                raise ChunkFormatError(f"unknown dtype tag {tag!r}")
            vals = decode_int_column(blob)
            if tag == "uint64":
                # inverse bitcast (see _encode_table_fn)
                if nmap:
                    cols[name] = _null_expand_np(
                        vals.view(np.uint64), nmap, n, pa.uint64()
                    )
                else:
                    cols[name] = pa.array(vals.view(np.uint64), pa.uint64())
                continue
            arr = (
                _null_expand_np(vals, nmap, n, pa.int64())
                if nmap
                else pa.array(vals, pa.int64())
            )
            cols[name] = arr.cast(typ)
        for f in batch.schema:
            if f.name.startswith("p_"):
                if columns is not None and f.name[2:] not in columns:
                    continue
                lst = batch[f.name]
                lst = (
                    lst.combine_chunks()
                    if isinstance(lst, pa.ChunkedArray)
                    else lst
                )
                cols[f.name[2:]] = lst.slice(i, 1).flatten()
        keep = [c for c in order_col[i] if c in cols]
        out.append(pa.table({n: cols[n] for n in keep}))
    return pa.concat_tables(out)


class _EventsChkStage:
    """Per-batch partials over the DECODED events table: per event_type,
    counts and checksums of every compressed column (ids raw-summed,
    epoch-us summed mod M to stay in int64) plus the passthrough props
    length — the DuckDB oracle recomputes all of it from the ORIGINAL
    table, so any decode drift in any column flips a sum."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from tokenzip.analysis import _PAIR_MOD

        ts = (
            batch["ts"]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        props_len = pa.compute.utf8_length(batch["props"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "eid": batch["event_id"].to_numpy(zero_copy_only=False),
                "uid": batch["user_id"].to_numpy(zero_copy_only=False),
                "tsm": ts % _PAIR_MOD,
                "plen": props_len,
            }
        )
        agg = df.groupby("event_type", as_index=False).agg(
            n_rows=("eid", "size"),
            sum_event_id=("eid", "sum"),
            sum_user_id=("uid", "sum"),
            sum_ts_mod=("tsm", "sum"),
            sum_props_len=("plen", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def _events_sink(sf_dir: str) -> tuple[str, str]:
    """(source parquet path, scratch sink dir) for the events-table chunk
    sink, keyed by input CONTENT identity (path+size+mtime), not just the
    sf name: regenerated testdata at the same path must never resume
    against stale chunks. compress_table's resume contract makes repeat
    calls over the same content free."""
    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    # _CHUNK_VER in the key: a sink written by an older chunk format (e.g.
    # pre-zone-map) must not be resumed against by newer readers
    fp = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{_CHUNK_VER}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(
        "/tmp/tokenzip_table",
        f"{os.path.basename(os.path.normpath(sf_dir))}_events_{fp}",
    )
    compress_table([src], out_dir)
    return src, out_dir


def q_table_roundtrip_events(sf_dir: str):
    """Persisted generic-table differential: compress events.parquet with
    the auto-selector (delta wins the sorted ts column), decompress the
    WRITTEN chunks, and checksum every column per event_type against the
    original table recomputed by DuckDB."""
    _, out_dir = _events_sink(sf_dir)
    return _events_checksum_rollup(decompress_table(out_dir))


def _events_checksum_rollup(ds: "ray.data.Dataset"):
    """Decoded events Dataset -> per-event_type checksum frame (the shared
    tail of the table differentials: per-batch partials, one groupby)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from tokenzip.analysis import _PAIR_MOD

    agg = (
        ds.map_batches(
            _EventsChkStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("event_type")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_event_id", alias_name="sum_event_id"),
            Sum("sum_user_id", alias_name="sum_user_id"),
            Sum("sum_ts_mod", alias_name="sum_ts_mod"),
            Sum("sum_props_len", alias_name="sum_props_len"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_rows": agg["n_rows"].astype("int64"),
            "sum_event_id": agg["sum_event_id"].astype("int64"),
            "sum_user_id": agg["sum_user_id"].astype("int64"),
            "sum_ts_mod": (agg["sum_ts_mod"] % _PAIR_MOD).astype("int64"),
            "sum_props_len": agg["sum_props_len"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def table_roundtrip_events_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(SUM(epoch_us(ts) % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS sum_ts_mod,
       CAST(SUM(LENGTH(props)) AS BIGINT) AS sum_props_len
FROM events GROUP BY event_type ORDER BY event_type
"""


class _NullsChkStage:
    """Partials over the decoded NULL-planted events table: per event_type,
    row/null counts and non-null sums — any bitmap drift (wrong position,
    lost null, value scattered to the wrong row) flips a count or a sum."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        uid = batch["user_id"]
        props = batch["props"]
        plen = pc.utf8_length(props)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(
                    zero_copy_only=False
                ),
                "null_props": props.is_null().to_numpy(zero_copy_only=False),
                "null_uid": uid.is_null().to_numpy(zero_copy_only=False),
                # integer-exact non-null sums (no float detour)
                "uid": pc.fill_null(uid, 0)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False),
                "plen": pc.fill_null(plen, 0)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby("event_type", as_index=False).agg(
            n_rows=("uid", "size"),
            n_null_props=("null_props", "sum"),
            n_null_uid=("null_uid", "sum"),
            sum_user_id=("uid", "sum"),
            sum_props_len=("plen", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def _plant_nulls_fn(batch: pa.Table) -> pa.Table:
    """props NULL where event_id % 7 == 0, user_id NULL where % 11 == 0 —
    the deterministic rule the SQL oracle mirrors with CASE."""
    import pyarrow.compute as pc

    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    batch = batch.set_column(
        batch.column_names.index("props"),
        "props",
        pc.if_else(
            pa.array(eid % 7 == 0),
            pa.nulls(batch.num_rows, pa.string()),
            batch["props"].combine_chunks()
            if isinstance(batch["props"], pa.ChunkedArray)
            else batch["props"],
        ),
    )
    uid = batch["user_id"]
    uid = uid.combine_chunks() if isinstance(uid, pa.ChunkedArray) else uid
    return batch.set_column(
        batch.column_names.index("user_id"),
        "user_id",
        pc.if_else(
            pa.array(eid % 11 == 0), pa.nulls(batch.num_rows, uid.type), uid
        ),
    )


def _events_nulled_sink(sf_dir: str) -> str:
    """Chunk sink of events with NULLs planted by the deterministic rule
    (props NULL at event_id % 7 == 0, user_id NULL at % 11 == 0) —
    content-keyed scratch like _events_sink; shared by the nulls-roundtrip
    and aggregate-pushdown differentials."""
    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{_CHUNK_VER}".encode()
    ).hexdigest()[:12]
    base = os.path.join(
        "/tmp/tokenzip_table",
        f"{os.path.basename(os.path.normpath(sf_dir))}_nulls_{fp}",
    )
    nulled_dir = os.path.join(base, "input")
    out_dir = os.path.join(base, "sink")
    if not os.path.isdir(nulled_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(nulled_dir)
    ):
        ray.data.read_parquet(src).map_batches(
            _plant_nulls_fn, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(nulled_dir)
    paths = [
        os.path.join(nulled_dir, f)
        for f in sorted(os.listdir(nulled_dir))
        if f.endswith(".parquet")
    ]
    compress_table(paths, out_dir)
    return out_dir


def q_table_nulls_roundtrip(sf_dir: str):
    """Nullable-column differential: plant NULLs into events with a
    deterministic rule (Ray map), compress the nulled table through the
    bitmap path, decompress the WRITTEN chunks, and roll up per-event_type
    row/null counts + non-null sums against DuckDB applying the same rule
    to the original table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    agg = (
        decompress_table(_events_nulled_sink(sf_dir))
        .map_batches(
            _NullsChkStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("event_type")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_null_props", alias_name="n_null_props"),
            Sum("n_null_uid", alias_name="n_null_uid"),
            Sum("sum_user_id", alias_name="sum_user_id"),
            Sum("sum_props_len", alias_name="sum_props_len"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_rows": agg["n_rows"].astype("int64"),
            "n_null_props": agg["n_null_props"].astype("int64"),
            "n_null_uid": agg["n_null_uid"].astype("int64"),
            "sum_user_id": agg["sum_user_id"].astype("int64"),
            "sum_props_len": agg["sum_props_len"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def table_nulls_roundtrip_sql() -> str:
    return """
WITH e AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE props END AS props,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE user_id END AS user_id
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_uid,
       CAST(COALESCE(SUM(user_id), 0) AS BIGINT) AS sum_user_id,
       CAST(COALESCE(SUM(LENGTH(props)), 0) AS BIGINT) AS sum_props_len
FROM e GROUP BY event_type ORDER BY event_type
"""


def _int_col_bounds(src: str, col: str) -> tuple[int, int]:
    """(min, max) of an int column from the parquet FOOTER statistics —
    no data pages read. Falls back to a single-column read only when a
    writer omitted stats."""
    md = pq.ParquetFile(src).metadata
    j = pq.ParquetFile(src).schema_arrow.names.index(col)
    los, his = [], []
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(j).statistics
        if st is None or not st.has_min_max:
            t = pq.read_table(src, columns=[col])[col]
            import pyarrow.compute as pc

            return int(pc.min(t).as_py()), int(pc.max(t).as_py())
        los.append(int(st.min))
        his.append(int(st.max))
    return min(los), max(his)


def q_table_where_events(sf_dir: str):
    """Zone-map pushdown differential: decompress the events sink with
    ``where=("event_id", lo, hi)`` over the middle half of the id domain —
    chunks whose [zmin, zmax] misses the range are pruned by a parquet
    predicate before their payload blobs are read — and checksum every
    surviving column per event_type against DuckDB's row-level WHERE over
    the original table. Bounds come from footer stats (integer arithmetic,
    mirrored exactly in the SQL) so the query is scale-invariant."""
    src, out_dir = _events_sink(sf_dir)
    emin, emax = _int_col_bounds(src, "event_id")
    lo = emin + (emax - emin) * 25 // 100
    hi = emin + (emax - emin) * 75 // 100
    return _events_checksum_rollup(
        decompress_table(out_dir, where=("event_id", lo, hi))
    )


def table_where_events_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    return f"""
WITH b AS (
  SELECT MIN(event_id) + (MAX(event_id) - MIN(event_id)) * 25 // 100 AS lo,
         MIN(event_id) + (MAX(event_id) - MIN(event_id)) * 75 // 100 AS hi
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(SUM(epoch_us(ts) % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS sum_ts_mod,
       CAST(SUM(LENGTH(props)) AS BIGINT) AS sum_props_len
FROM events, b WHERE event_id BETWEEN b.lo AND b.hi
GROUP BY event_type ORDER BY event_type
"""


def _where_row_filter(where: tuple[str, int, int] | tuple[str, str, str]):
    """Exact row-level net under the zone-map pushdown: chunks that
    INTERSECT the range still carry out-of-range rows. String bounds
    compare lexicographically on the string column; NULL never matches
    (BETWEEN semantics on both paths)."""
    import pyarrow.compute as pc

    col, lo, hi = where

    def fn(b: pa.Table) -> pa.Table:
        v = b[col]
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        if not isinstance(lo, str):
            # uint64 compares in its int64 BITCAST (the zone maps' storage
            # unit); a checked cast would raise on values >= 2^63
            v = v.view(pa.int64()) if v.type == pa.uint64() else v.cast(pa.int64())
        return b.filter(pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi)))

    return fn


def decompress_table(
    out_dir: str,
    where: tuple[str, int, int] | None = None,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Read table chunks -> Dataset with the original schema and values.

    ``where=(col, lo, hi)`` selects rows with ``lo <= col <= hi`` WITH
    storage-level pruning: a parquet predicate on the chunk's scalar
    zone-map columns (int64 ``zmin_``/``zmax_`` for int/timestamp
    columns — epoch in the column's unit; lexicographic string
    ``smin_``/``smax_`` for string columns, pass lo == hi for equality)
    drops every chunk whose value range misses [lo, hi] before its
    payload blobs are read; intersecting chunks are decoded and
    row-filtered exactly. String pruning bites when the sink is value-
    clustered on the column (input sorted/partitioned by it) — the same
    contract as the token sink's source_top."""
    chunks_dir = os.path.join(out_dir, "chunks")
    files = [
        p for p, _ in uio.walk_files(chunks_dir) if p.endswith(".parquet")
    ]
    if not files:
        raise ChunkFormatError(f"no chunk parquet under {chunks_dir}")
    read_kwargs = {}
    if where is not None:
        import pyarrow.compute as pc

        col, lo, hi = where
        if isinstance(lo, str) != isinstance(hi, str):
            raise ValueError("where bounds must both be ints or both strings")
        names = pq.ParquetFile(files[0]).schema_arrow.names
        pre = "smin_" if isinstance(lo, str) else "zmin_"
        if f"{pre}{col}" not in names:
            zoned = sorted(
                n[5:] for n in names if n.startswith(("zmin_", "smin_"))
            )
            raise ChunkFormatError(
                f"column {col!r} has no {'string ' if pre == 'smin_' else ''}"
                f"zone map in this sink (zone-mapped columns: {zoned}); "
                "re-compress or filter after decompress_table()"
            )
        # chunk survives iff [min, max] intersects [lo, hi]
        if pre == "smin_":
            read_kwargs["filter"] = (pc.field(f"smin_{col}") <= hi) & (
                pc.field(f"smax_{col}") >= lo
            )
        else:
            read_kwargs["filter"] = (pc.field(f"zmin_{col}") <= int(hi)) & (
                pc.field(f"zmax_{col}") >= int(lo)
            )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_blocks = min(len(files), max(8, 4 * cpus))
    ds = ray.data.read_parquet(chunks_dir, override_num_blocks=n_blocks, **read_kwargs)
    decode_cols = None
    if columns is not None:
        # the where filter's column must be decoded even if projected away
        need = set(columns)
        if where is not None:
            need.add(where[0])
        decode_cols = sorted(need)
    out = ds.map_batches(
        _decode_table_fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"columns": decode_cols},
    )
    if where is not None:
        out = out.map_batches(
            _where_row_filter(where), batch_format="pyarrow", zero_copy_batch=True
        )
    if columns is not None:
        out = out.map_batches(
            lambda b: b.select([c for c in b.column_names if c in set(columns)]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return out


# ---------------------------------------------------------------------------
# String zone-map pushdown demo: a sink value-CLUSTERED on event_type
# serves string range/equality predicates from storage — chunks whose
# lexicographic [smin, smax] misses the bounds never leave disk. The
# clustering step is the generic-table analog of the token sink's
# by-source layout (source_top): at 100 TB you partition-by-column once at
# ingest, then every value predicate prunes forever.
# ---------------------------------------------------------------------------

STR_WHERE = ("event_type", "error", "purchase")  # lexicographic range


def _events_sink_clustered(sf_dir: str) -> str:
    """Scratch sink of events CLUSTERED by (event_type, event_id) in small
    row groups — each Ray block covers few types, so smin_/smax_ actually
    discriminate. Content-keyed like _events_sink."""
    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{_CHUNK_VER}:cl".encode()
    ).hexdigest()[:12]
    base = os.path.join(
        "/tmp/tokenzip_table",
        f"{os.path.basename(os.path.normpath(sf_dir))}_events_cl_{fp}",
    )
    clustered = os.path.join(base, "clustered.parquet")
    out_dir = os.path.join(base, "sink")
    if not os.path.exists(clustered):
        os.makedirs(base, exist_ok=True)
        t = pq.read_table(src)
        order = pa.compute.sort_indices(
            t, sort_keys=[("event_type", "ascending"), ("event_id", "ascending")]
        )
        pq.write_table(t.take(order), clustered, row_group_size=2048)
    compress_table([clustered], out_dir)
    return out_dir


def q_table_where_strings(sf_dir: str):
    """String zone-map pushdown differential: decompress the CLUSTERED
    events sink with a lexicographic event_type range and checksum every
    surviving column per type against DuckDB's row-level BETWEEN."""
    out_dir = _events_sink_clustered(sf_dir)
    return _events_checksum_rollup(decompress_table(out_dir, where=STR_WHERE))


def table_where_strings_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    col, lo, hi = STR_WHERE
    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(SUM(epoch_us(ts) % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS sum_ts_mod,
       CAST(SUM(LENGTH(props)) AS BIGINT) AS sum_props_len
FROM events WHERE {col} BETWEEN '{lo}' AND '{hi}'
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Aggregate pushdown: COUNT/SUM/MIN/MAX answered from chunk metadata only.
# Every chunk row carries scalar znn_/zmin_/zmax_/zsum_ columns per encoded
# int/timestamp column (the parquet-footer-statistics analog, written at
# encode time); table_stats projects JUST those scalars out of the chunk
# parquet — the enc_blobs payload lists are never read, so the scan cost is
# O(chunks), independent of row count or value bytes.
# ---------------------------------------------------------------------------


def _stats_partial(cols: list[str]):
    """Per-batch fold of chunk-metadata rows -> one partial row per column:
    (column, n_rows, n_nonnull, min_v, max_v, sum as decimal string).
    Chunks with znn == 0 carry the inverted zone-map sentinel and are
    excluded from min/max; sums stay exact via Python ints."""

    def fn(b: pa.Table) -> pa.Table:
        n_rows = int(
            b["n_rows"].to_numpy(zero_copy_only=False).sum(dtype=np.int64)
        )
        out = {
            "column": [],
            "n_rows": [],
            "n_nonnull": [],
            "min_v": [],
            "max_v": [],
            "sum_str": [],
        }
        for c in cols:
            nn = b[f"znn_{c}"].to_numpy(zero_copy_only=False)
            mn = b[f"zmin_{c}"].to_numpy(zero_copy_only=False)
            mx = b[f"zmax_{c}"].to_numpy(zero_copy_only=False)
            live = nn > 0
            total = sum(int(s) for s in b[f"zsum_{c}"].to_pylist())
            out["column"].append(c)
            out["n_rows"].append(n_rows)
            out["n_nonnull"].append(int(nn.sum(dtype=np.int64)))
            out["min_v"].append(int(mn[live].min()) if live.any() else None)
            out["max_v"].append(int(mx[live].max()) if live.any() else None)
            out["sum_str"].append(str(total))
        return pa.table(
            {
                "column": pa.array(out["column"], pa.string()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_nonnull": pa.array(out["n_nonnull"], pa.int64()),
                "min_v": pa.array(out["min_v"], pa.int64()),
                "max_v": pa.array(out["max_v"], pa.int64()),
                "sum_str": pa.array(out["sum_str"], pa.string()),
            }
        )

    return fn


def table_stats(out_dir: str, columns: list[str] | None = None):
    """Per-column (n_rows, n_null, min, max, exact sum) for the sink's
    int/timestamp columns, computed from chunk metadata ONLY (no payload
    blob is read or decoded — parquet column projection prunes the list
    columns at the scan). Values are in int64 storage units: timestamps as
    epoch in the column's unit, uint64 in its two's-complement bitcast
    (the zone maps' contract). Sums are exact at any scale (decimal-string
    fold, never a wrapping int64). Returns a pandas frame with sum_v as a
    Python int column."""
    import pandas as pd

    chunks_dir = os.path.join(out_dir, "chunks")
    files = [
        p for p, _ in uio.walk_files(chunks_dir) if p.endswith(".parquet")
    ]
    if not files:
        raise ChunkFormatError(f"no chunk parquet under {chunks_dir}")
    names = pq.ParquetFile(files[0]).schema_arrow.names
    have = sorted(n[5:] for n in names if n.startswith("zsum_"))
    if columns is None:
        columns = have
    else:
        missing = sorted(set(columns) - set(have))
        if missing:
            raise ChunkFormatError(
                f"columns {missing} carry no aggregate metadata in this "
                f"sink (covered: {have}); re-compress or aggregate the "
                "decoded stream"
            )
        columns = sorted(columns)
    needed = ["n_rows"] + [
        f"{p}{c}" for c in columns for p in ("znn_", "zmin_", "zmax_", "zsum_")
    ]
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_blocks = min(len(files), max(8, 4 * cpus))
    partials = (
        ray.data.read_parquet(
            chunks_dir, columns=needed, override_num_blocks=n_blocks
        )
        .map_batches(
            _stats_partial(columns),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    # driver fold over ~blocks x columns tiny partial rows, Python-int exact
    rows = []
    for c in columns:
        p = partials[partials["column"] == c]
        mins = p["min_v"].dropna()
        maxs = p["max_v"].dropna()
        rows.append(
            {
                "column": c,
                "n_rows": int(p["n_rows"].sum()),
                "n_null": int(p["n_rows"].sum()) - int(p["n_nonnull"].sum()),
                "min_v": int(mins.min()) if len(mins) else None,
                "max_v": int(maxs.max()) if len(maxs) else None,
                "sum_v": sum(int(s) for s in p["sum_str"]),
            }
        )
    return pd.DataFrame(rows)


def q_table_agg_pushdown(sf_dir: str):
    """Aggregate-pushdown differential: COUNT/COUNT(col)/MIN/MAX/SUM over
    event_id, user_id and ts answered purely from chunk metadata — once on
    the plain events sink and once on the NULL-planted sink (user_id nulls
    exercise the non-null accounting) — against DuckDB computing the same
    aggregates row-level from the original table. Sums compare mod a
    shared prime (the metadata sum is arbitrary-precision; SQL goes
    through HUGEINT)."""
    import pandas as pd

    from tokenzip.analysis import _PAIR_MOD

    rows = []
    for sink, out_dir in (
        ("nulled", _events_nulled_sink(sf_dir)),
        ("plain", _events_sink(sf_dir)[1]),
    ):
        st = table_stats(out_dir, columns=["event_id", "ts", "user_id"])
        for r in st.itertuples(index=False):
            rows.append(
                {
                    "sink": sink,
                    "col": r.column,
                    "n_rows": int(r.n_rows),
                    "n_null": int(r.n_null),
                    "min_v": int(r.min_v),
                    "max_v": int(r.max_v),
                    "sum_mod": ((r.sum_v % _PAIR_MOD) + _PAIR_MOD)
                    % _PAIR_MOD,
                }
            )
    out = pd.DataFrame(rows).astype(
        {
            "n_rows": "int64",
            "n_null": "int64",
            "min_v": "int64",
            "max_v": "int64",
            "sum_mod": "int64",
        }
    )
    return out.sort_values(["sink", "col"]).reset_index(drop=True)


def table_agg_pushdown_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    m = _PAIR_MOD
    parts = []
    for sink, uid_expr in (
        ("nulled", "CASE WHEN event_id % 11 = 0 THEN NULL ELSE user_id END"),
        ("plain", "user_id"),
    ):
        for col, expr in (
            ("event_id", "event_id"),
            ("ts", "epoch_us(ts)"),
            ("user_id", uid_expr),
        ):
            parts.append(
                f"""
SELECT '{sink}' AS sink, '{col}' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_null,
       CAST(MIN({expr}) AS BIGINT) AS min_v,
       CAST(MAX({expr}) AS BIGINT) AS max_v,
       CAST(((SUM({expr}) % {m}) + {m}) % {m} AS BIGINT) AS sum_mod
FROM events"""
            )
    return " UNION ALL ".join(parts) + " ORDER BY sink, col"


# ---------------------------------------------------------------------------
# Encoded list columns end-to-end: the embeddings table (vec_id int64,
# embedding list<float>, label int32) through compress/decompress — the
# fixed-dim lengths stream RLEs to ~nothing and the float32 value stream
# rides the float codec family (raw floor on incompressible vectors).
# ---------------------------------------------------------------------------


def _embeddings_sink(sf_dir: str) -> tuple[str, str]:
    """(source parquet path, scratch sink dir) for the embeddings-table
    chunk sink — content-keyed like _events_sink."""
    import hashlib

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    fp = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{_CHUNK_VER}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(
        "/tmp/tokenzip_table",
        f"{os.path.basename(os.path.normpath(sf_dir))}_emb_{fp}",
    )
    compress_table([src], out_dir)
    return src, out_dir


class _EmbChkStage:
    """Partials over the decoded embeddings table: per label, vector count,
    id sum, total element count, and an element-value checksum
    (sum of floor(value * 1e5) — float32 widens to float64 exactly, and
    both engines run the identical double multiply + floor, so the sum is
    deterministic across Ray and DuckDB)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        emb = batch["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        lens = (
            pc.list_value_length(emb)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        q = np.floor(flat.astype(np.float64) * 1e5).astype(np.int64)
        lab = (
            batch["label"]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame(
            {
                "label": lab,
                "vid": batch["vec_id"].to_numpy(zero_copy_only=False),
                "len": lens,
            }
        )
        a = df.groupby("label", as_index=False).agg(
            n_rows=("vid", "size"),
            sum_vec_id=("vid", "sum"),
            sum_len=("len", "sum"),
        )
        eldf = pd.DataFrame({"label": np.repeat(lab, lens), "q": q})
        b = eldf.groupby("label", as_index=False).agg(sum_q=("q", "sum"))
        return pa.Table.from_pandas(
            a.merge(b, on="label", how="left").fillna({"sum_q": 0}),
            preserve_index=False,
        )


def q_table_roundtrip_embeddings(sf_dir: str):
    """Encoded-list-column differential: compress embeddings.parquet
    (list<float> through the lengths+values decomposition), decompress the
    WRITTEN chunks, and checksum per label — vector/element counts, id
    sums, and a floor-quantized element-value sum — against DuckDB
    unnesting the original table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from tokenzip.analysis import _PAIR_MOD

    _, out_dir = _embeddings_sink(sf_dir)
    agg = (
        decompress_table(out_dir)
        .map_batches(
            _EmbChkStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("label")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_vec_id", alias_name="sum_vec_id"),
            Sum("sum_len", alias_name="sum_len"),
            Sum("sum_q", alias_name="sum_q"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "label": agg["label"].astype("int64"),
            "n_rows": agg["n_rows"].astype("int64"),
            "sum_vec_id": agg["sum_vec_id"].astype("int64"),
            "sum_len": agg["sum_len"].astype("int64"),
            "sum_q": (
                (agg["sum_q"].astype("int64") % _PAIR_MOD) + _PAIR_MOD
            )
            % _PAIR_MOD,
        }
    )
    return out.sort_values("label").reset_index(drop=True)


def table_roundtrip_embeddings_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    m = _PAIR_MOD
    return f"""
WITH el AS (
  SELECT CAST(label AS BIGINT) AS label, UNNEST(embedding) AS e
  FROM embeddings
),
q AS (
  SELECT label,
         CAST(((SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 100000.0) AS BIGINT))
                % {m}) + {m}) % {m} AS BIGINT) AS sum_q
  FROM el GROUP BY label
),
a AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
         CAST(SUM(len(embedding)) AS BIGINT) AS sum_len
  FROM embeddings GROUP BY 1
)
SELECT a.label, a.n_rows, a.sum_vec_id, a.sum_len, q.sum_q
FROM a JOIN q USING (label) ORDER BY label
"""


# ---------------------------------------------------------------------------
# Generic-table sink migration: the compress_table counterpart of
# pipeline.recode.  Decode fused with re-encode per small batch of chunk
# rows (the decoded table never materializes), frag-partitioned output +
# per-fragment migration lineage, drift guard on n_rows (a migration that
# changes the row count is corrupt, not merely different).  Use case:
# format upgrades — pre-v3 null-free sinks gain enc_nulls bitmaps, newly
# added codecs re-run the per-column auto-selection.
# ---------------------------------------------------------------------------


def _recode_table_fn(batch: pa.Table) -> pa.Table:
    from tokenzip.pipeline import _frag_of_chunk_path

    paths = batch["path"].to_numpy(zero_copy_only=False)
    frags = np.asarray([_frag_of_chunk_path(str(p)) for p in paths], dtype=object)
    rows = batch.drop_columns(["path"])
    parts = []
    for frag in np.unique(frags):
        sub = rows.filter(pa.array(frags == frag))
        decoded = _decode_table_fn(sub)
        decoded = decoded.append_column(
            "frag", pa.array([str(frag)] * decoded.num_rows, pa.string())
        )
        parts.append(decoded)
    if not parts or sum(p.num_rows for p in parts) == 0:
        # chunk rows always carry n_rows > 0; an empty decode means the
        # source sink is corrupt — fail loudly, don't emit a schema guess
        raise ChunkFormatError("table recode read chunk rows with no content")
    return _encode_table_fn(pa.concat_tables(parts))


def recode_table(
    in_dir: str,
    out_dir: str,
    *,
    batch_chunks: int = 4,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """Migrate a compress_table sink to the current format/codec regime.
    Returns the new manifest totals with per-fragment lineage."""
    from tokenzip.pipeline import _recode_scaffold

    return _recode_scaffold(
        in_dir,
        out_dir,
        _recode_table_fn,
        {},
        batch_chunks=batch_chunks,
        concurrency=concurrency,
        resume=resume,
        guard_col="n_rows",
    )


# ---------------------------------------------------------------------------
# Predicate deletion on generic-table sinks (retention purge / DELETE WHERE)
# ---------------------------------------------------------------------------

# delete_rows(where=(col, lo, hi)) removes every row with lo <= col <= hi
# (NULL never matches, BETWEEN semantics — null rows always survive).
# Zone maps give a THREE-way chunk classification before any payload read:
#   disjoint   [zmin, zmax] misses [lo, hi]        -> row passes VERBATIM
#   contained  lo <= zmin && zmax <= hi && no nulls -> chunk DROPPED whole,
#              payload never read (deleted count = n_rows, pure metadata)
#   straddling (or contained with nulls)            -> decode, keep
#              non-matching + null rows, re-encode
# Fragments where every chunk is disjoint are byte-copied file-for-file.


def _where_zone_cols(files: list[str], col: str, is_str: bool) -> tuple[str, str, str]:
    names = pq.ParquetFile(files[0]).schema_arrow.names
    pre = "smin_" if is_str else "zmin_"
    if f"{pre}{col}" not in names:
        zoned = sorted(n[5:] for n in names if n.startswith(("zmin_", "smin_")))
        raise ChunkFormatError(
            f"column {col!r} has no {'string ' if is_str else ''}zone map in "
            f"this sink (zone-mapped columns: {zoned})"
        )
    znn = f"znn_{col}" if (not is_str and f"znn_{col}" in names) else ""
    return f"{pre[0]}min_{col}", f"{pre[0]}max_{col}", znn


def _classify_zone(zmin, zmax, lo, hi) -> np.ndarray:
    """0 = disjoint, 1 = contained, 2 = straddling (per chunk row)."""
    disjoint = (zmax < lo) | (zmin > hi)
    contained = (zmin >= lo) & (zmax <= hi)
    out = np.full(len(zmin), 2, dtype=np.int64)
    out[contained] = 1
    out[disjoint] = 0
    return out


def _delete_rows_fn(batch: pa.Table, where=None, zc=None) -> pa.Table:
    """Selective rewrite of one chunk-row batch under the where range."""
    import pyarrow.compute as pc

    from tokenzip.pipeline import _frag_of_chunk_path

    col, lo, hi = where
    cmin, cmax, znn = zc
    paths = batch["path"].to_numpy(zero_copy_only=False)
    frags = np.asarray([_frag_of_chunk_path(str(p)) for p in paths], dtype=object)
    rows = batch.drop_columns(["path"])
    zmin = rows[cmin].to_numpy(zero_copy_only=False)
    zmax = rows[cmax].to_numpy(zero_copy_only=False)
    cls = _classify_zone(zmin, zmax, lo, hi)
    if znn:
        nn = rows[znn].to_numpy(zero_copy_only=False).astype(np.int64)
        nr = rows["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        # contained chunks WITH nulls must rewrite (null rows survive)
        cls[(cls == 1) & (nn < nr)] = 2

    parts: list[pa.Table] = []
    keep_thru = cls == 0
    if keep_thru.any():
        parts.append(rows.filter(pa.array(keep_thru)))
    # cls == 1 rows are dropped whole: emit nothing for them
    rewrite = cls == 2
    if rewrite.any():
        rw = rows.filter(pa.array(rewrite))
        rw_frags = frags[rewrite]
        sub_parts = []
        for frag in np.unique(rw_frags):
            sub = rw.filter(pa.array(rw_frags == frag))
            dec = _decode_table_fn(sub)
            v = dec[col]
            v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            if not isinstance(lo, str):
                v = (
                    v.view(pa.int64())
                    if v.type == pa.uint64()
                    else v.cast(pa.int64())
                )
            hit = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
            keep = pc.fill_null(pc.invert(hit), True)  # NULL never matches
            dec = dec.filter(keep)
            dec = dec.append_column(
                "frag", pa.array([str(frag)] * dec.num_rows, pa.string())
            )
            sub_parts.append(dec)
        enc = _encode_table_fn(pa.concat_tables(sub_parts))
        parts.append(enc)
    if not parts:
        return rows.slice(0, 0).append_column("frag", pa.array([], pa.string()))
    # pass-through rows need the frag partition column too
    out = []
    for p in parts:
        if "frag" not in p.column_names:
            mask = keep_thru
            p = p.append_column(
                "frag", pa.array([str(f) for f in frags[mask]], pa.string())
            )
        out.append(p)
    names = out[0].column_names
    return pa.concat_tables([p.select(names) for p in out])


def _delete_rows_count_fn(batch: pa.Table, where=None, zc=None) -> pa.Table:
    """Per-frag deleted-row counts: dropped-whole chunks from METADATA,
    straddlers from a where-column-only decode."""
    import pyarrow.compute as pc

    from tokenzip.pipeline import _frag_of_chunk_path

    col, lo, hi = where
    cmin, cmax, znn = zc
    paths = batch["path"].to_numpy(zero_copy_only=False)
    frags = np.asarray([_frag_of_chunk_path(str(p)) for p in paths], dtype=object)
    rows = batch.drop_columns(["path"])
    zmin = rows[cmin].to_numpy(zero_copy_only=False)
    zmax = rows[cmax].to_numpy(zero_copy_only=False)
    cls = _classify_zone(zmin, zmax, lo, hi)
    nr = rows["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
    if znn:
        nn = rows[znn].to_numpy(zero_copy_only=False).astype(np.int64)
        cls[(cls == 1) & (nn < nr)] = 2
    out: dict[str, int] = {}
    for frag in np.unique(frags):
        m = frags == frag
        dropped = int(nr[m & (cls == 1)].sum()) if (m & (cls == 1)).any() else 0
        out[str(frag)] = dropped
    rw = cls == 2
    if rw.any():
        sub = rows.filter(pa.array(rw))
        dec = _decode_table_fn(sub, columns=[col])
        v = dec[col]
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        if not isinstance(lo, str):
            v = v.view(pa.int64()) if v.type == pa.uint64() else v.cast(pa.int64())
        hit = pc.fill_null(
            pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi)), False
        ).to_numpy(zero_copy_only=False)
        # attribute matches back to frags: expand chunk n_rows of rewrites
        rw_frags = frags[rw]
        rw_nr = nr[rw]
        doc_frag = np.repeat(rw_frags, rw_nr)
        for frag in np.unique(rw_frags):
            out[str(frag)] = out.get(str(frag), 0) + int(hit[doc_frag == frag].sum())
    return pa.table(
        {
            "frag": pa.array(list(out), pa.string()),
            "n_rows_deleted": pa.array(
                np.array(list(out.values()), np.int64), pa.int64()
            ),
        }
    )


def delete_rows(
    in_dir: str,
    out_dir: str,
    where: tuple[str, int, int] | tuple[str, str, str],
    *,
    batch_chunks: int = 4,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """DELETE WHERE lo <= col <= hi from a compress_table sink into a
    fresh sink — the retention-purge operation, priced by zone maps:
    fully-contained null-free chunks drop on metadata alone (payload never
    read), fully-disjoint fragments byte-copy, and only straddling chunks
    decode -> filter -> re-encode. NULL never matches (BETWEEN semantics),
    so null rows always survive. Per-fragment manifest lineage records
    n_rows_deleted; the drift guard requires new = old - deleted."""
    from tokenzip.manifest import Manifest
    from tokenzip.pipeline import _fold_chunk_meta

    col, lo, hi = where
    if isinstance(lo, str) != isinstance(hi, str):
        raise ValueError("where bounds must both be ints or both strings")
    in_chunks = uio.join(in_dir, "chunks")
    if not uio.isdir(in_chunks):
        raise ChunkFormatError(f"no chunks directory under {in_dir}")
    frag_dirs = sorted(d for d in uio.listdir(in_chunks) if d.startswith("frag="))
    frag_files = {
        d.split("=", 1)[1]: [
            uio.join(in_chunks, d, n)
            for n in sorted(uio.listdir(uio.join(in_chunks, d)))
            if n.endswith(".parquet")
        ]
        for d in frag_dirs
    }
    all_files = [p for fs in frag_files.values() for p in fs]
    zc = _where_zone_cols(all_files, col, isinstance(lo, str))
    if not isinstance(lo, str):
        lo, hi = int(lo), int(hi)
        where = (col, lo, hi)

    chunks_dir = uio.join(out_dir, "chunks")
    man = Manifest(out_dir)
    done = man.done_fragments() if resume else set()
    if not resume and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
        man.data["fragments"] = {}
    elif resume and not done and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
    todo = [f for f in frag_files if f not in done]
    for frag in todo:
        d = uio.join(chunks_dir, f"frag={frag}")
        if uio.isdir(d):
            uio.rmtree(d)
    if not todo:
        t = man.totals()
        t["n_rows_deleted"] = sum(
            int(s.get("n_rows_deleted", 0))
            for s in man.data.get("fragments", {}).values()
        )
        return t

    # frag-level probe on zone scalars only: which frags need a rewrite?
    probe_cols = ["n_rows", zc[0], zc[1]] + ([zc[2]] if zc[2] else [])
    todo_files = [p for f in todo for p in frag_files[f]]

    def _probe(b: pa.Table) -> pa.Table:
        from tokenzip.pipeline import _frag_of_chunk_path

        paths = b["path"].to_numpy(zero_copy_only=False)
        frags = np.asarray(
            [_frag_of_chunk_path(str(p)) for p in paths], dtype=object
        )
        cls = _classify_zone(
            b[zc[0]].to_numpy(zero_copy_only=False),
            b[zc[1]].to_numpy(zero_copy_only=False),
            lo,
            hi,
        )
        if zc[2]:
            nn = b[zc[2]].to_numpy(zero_copy_only=False).astype(np.int64)
            nr = b["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
            cls[(cls == 1) & (nn < nr)] = 2
        hitf = frags[cls != 0]
        return pa.table(
            {"frag": pa.array(sorted({str(f) for f in hitf}), pa.string())}
        )

    hit_rows = (
        ray.data.read_parquet(todo_files, columns=probe_cols, include_paths=True)
        .map_batches(_probe, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    hit_frags = sorted({r["frag"] for r in hit_rows})
    clean_frags = [f for f in todo if f not in set(hit_frags)]

    deleted: dict[str, int] = {}
    if hit_frags:
        hit_files = [p for f in hit_frags for p in frag_files[f]]
        parts = (
            ray.data.read_parquet(hit_files, include_paths=True)
            .map_batches(
                _delete_rows_count_fn,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_chunks,
                fn_kwargs={"where": where, "zc": zc},
            )
            .take_all()
        )
        for r in parts:
            deleted[r["frag"]] = deleted.get(r["frag"], 0) + int(
                r["n_rows_deleted"]
            )

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

        from tokenzip.pipeline import _default_concurrency

        n = (
            ray.data.from_items(specs)
            .map(_copy, concurrency=concurrency or _default_concurrency())
            .count()
        )
        assert n == len(specs)

    if hit_frags:
        hit_files = [p for f in hit_frags for p in frag_files[f]]
        kwargs = dict(
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_chunks,
            fn_kwargs={"where": where, "zc": zc},
        )
        if concurrency:
            kwargs["concurrency"] = concurrency
        (
            ray.data.read_parquet(hit_files, include_paths=True)
            .map_batches(_delete_rows_fn, **kwargs)
            .write_parquet(chunks_dir, partition_cols=["frag"], compression="none")
        )

    src_man = Manifest(in_dir)
    src_stats = dict(src_man.data.get("fragments", {}))
    need = [f for f in todo if f not in src_stats]
    if need:
        src_stats.update(_fold_chunk_meta(in_chunks, need))
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
    new_stats = _fold_chunk_meta(chunks_dir, sorted(set(hit_frags) & frags_written))
    for frag in todo:
        nd = deleted.get(frag, 0)
        if frag in set(hit_frags):
            s = dict(new_stats.get(frag) or zero)
            want = int((src_stats.get(frag) or {}).get("n_rows", 0)) - nd
            if s["n_rows"] != want:
                raise ChunkFormatError(
                    f"delete_rows drift on frag {frag}: {s['n_rows']} != {want}"
                )
        else:
            s = {k: (src_stats.get(frag) or {}).get(k, zero[k]) for k in zero}
        s["deleted_from"] = in_dir
        s["where"] = [str(col), str(lo), str(hi)]
        s["n_rows_deleted"] = nd
        man.mark_done(frag, s)
    man.save()
    t = man.totals()
    t["n_rows_deleted"] = sum(
        int(s.get("n_rows_deleted", 0))
        for s in man.data.get("fragments", {}).values()
    )
    return t


def q_table_delete_roundtrip(sf_dir: str):
    """Retention-purge audit: DELETE the middle quintile of the event_id
    domain from the events sink (zone-classified: contained chunks drop on
    metadata, disjoint fragments byte-copy, straddlers rewrite), then
    checksum every surviving column per event_type against DuckDB's
    NOT BETWEEN over the original table."""
    import hashlib

    src, out_dir = _events_sink(sf_dir)
    emin, emax = _int_col_bounds(src, "event_id")
    lo = emin + (emax - emin) * 40 // 100
    hi = emin + (emax - emin) * 60 // 100
    h = hashlib.md5(f"{out_dir}:{lo}:{hi}".encode()).hexdigest()[:10]
    dst = f"/tmp/tokenzip_tbl_del/{h}"
    t = delete_rows(out_dir, dst, ("event_id", lo, hi))
    if t["n_rows_deleted"] <= 0:
        raise ValueError("delete_rows removed nothing — degenerate audit")
    return _events_checksum_rollup(decompress_table(dst))


def table_delete_roundtrip_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    return f"""
WITH b AS (
  SELECT MIN(event_id) + (MAX(event_id) - MIN(event_id)) * 40 // 100 AS lo,
         MIN(event_id) + (MAX(event_id) - MIN(event_id)) * 60 // 100 AS hi
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(SUM(epoch_us(ts) % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS sum_ts_mod,
       CAST(SUM(LENGTH(props)) AS BIGINT) AS sum_props_len
FROM events, b WHERE NOT (event_id BETWEEN b.lo AND b.hi)
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Zero-decode schema evolution: DROP COLUMN on a table sink
# ---------------------------------------------------------------------------


def _drop_col_fn(batch: pa.Table, col=None) -> pa.Table:
    """Chunk-row surgery: remove the column's entry from the parallel
    (enc_names, enc_codecs, enc_dtypes, enc_blobs, enc_nulls) lists and
    from col_order — NO payload is decoded or re-encoded; the dropped
    column's blob bytes simply stop existing. Byte counters are adjusted
    by the exact removed blob length."""
    from tokenzip.pipeline import _frag_of_chunk_path

    paths = batch["path"].to_numpy(zero_copy_only=False)
    frags = [_frag_of_chunk_path(str(p)) for p in paths]
    rows = batch.drop_columns(["path"])
    names_col = rows["enc_names"].to_pylist()
    codecs_col = rows["enc_codecs"].to_pylist()
    dtags_col = rows["enc_dtypes"].to_pylist()
    blobs_col = rows["enc_blobs"].to_pylist()
    nulls_col = rows["enc_nulls"].to_pylist()
    order_col = rows["col_order"].to_pylist()
    b_out = rows["bytes_out"].to_pylist()
    tb_out = rows["tokens_bytes_out"].to_pylist()
    tcodec = rows["tokens_codec"].to_pylist()
    new = {
        "enc_names": [], "enc_codecs": [], "enc_dtypes": [], "enc_blobs": [],
        "enc_nulls": [], "col_order": [], "bytes_out": [],
        "tokens_bytes_out": [], "tokens_codec": [],
    }
    for i in range(rows.num_rows):
        if col not in order_col[i]:
            raise ChunkFormatError(
                f"column {col!r} not in sink schema {sorted(order_col[i])}"
            )
        if len(order_col[i]) == 1:
            raise ChunkFormatError("cannot drop the sink's only column")
        keep = [j for j, n in enumerate(names_col[i]) if n != col]
        removed = sum(
            len(blobs_col[i][j])
            for j, n in enumerate(names_col[i])
            if n == col
        )
        int_removed = sum(
            len(blobs_col[i][j])
            for j, n in enumerate(names_col[i])
            if n == col and not dtags_col[i][j].startswith(("string",))
            and not dtags_col[i][j].startswith(("double", "float"))
        )
        new["enc_names"].append([names_col[i][j] for j in keep])
        new["enc_codecs"].append([codecs_col[i][j] for j in keep])
        new["enc_dtypes"].append([dtags_col[i][j] for j in keep])
        new["enc_blobs"].append([blobs_col[i][j] for j in keep])
        new["enc_nulls"].append([nulls_col[i][j] for j in keep])
        new["col_order"].append([n for n in order_col[i] if n != col])
        new["bytes_out"].append(int(b_out[i]) - removed)
        new["tokens_bytes_out"].append(max(0, int(tb_out[i]) - int_removed))
        new["tokens_codec"].append(
            ",".join(
                kv for kv in str(tcodec[i]).split(",")
                if not kv.startswith(f"{col}=")
            )
        )
    drop_scalars = [
        c for c in rows.column_names
        if c in (
            f"zmin_{col}", f"zmax_{col}", f"znn_{col}", f"zsum_{col}",
            f"smin_{col}", f"smax_{col}", f"p_{col}",
        )
    ]
    out = rows.drop_columns(drop_scalars)
    for name, vals in new.items():
        idx = out.column_names.index(name)
        if name in ("bytes_out", "tokens_bytes_out"):
            arr = pa.array(vals, pa.int64())
        elif name == "tokens_codec":
            arr = pa.array(vals, pa.string())
        elif name == "enc_blobs":
            arr = pa.array(vals, pa.list_(pa.binary()))
        elif name == "enc_nulls":
            arr = pa.array(vals, pa.list_(pa.binary()))
        else:
            arr = pa.array(vals, pa.list_(pa.string()))
        out = out.set_column(idx, name, arr)
    # the read may already carry the hive partition column
    if "frag" in out.column_names:
        return out
    return out.append_column("frag", pa.array([str(f) for f in frags], pa.string()))


def drop_column(
    in_dir: str,
    out_dir: str,
    col: str,
    *,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """ALTER TABLE DROP COLUMN for a compress_table sink, at ZERO decode
    cost: chunk rows are rewritten with the column's blob/zone/stats
    entries removed, but no payload is ever decoded or re-encoded. One
    pass of sink I/O; per-fragment resume; n_rows guard proves no row was
    touched."""
    from tokenzip.manifest import Manifest
    from tokenzip.pipeline import _fold_chunk_meta

    in_chunks = uio.join(in_dir, "chunks")
    if not uio.isdir(in_chunks):
        raise ChunkFormatError(f"no chunks directory under {in_dir}")
    frag_dirs = sorted(d for d in uio.listdir(in_chunks) if d.startswith("frag="))
    frag_files = {
        d.split("=", 1)[1]: [
            uio.join(in_chunks, d, n)
            for n in sorted(uio.listdir(uio.join(in_chunks, d)))
            if n.endswith(".parquet")
        ]
        for d in frag_dirs
    }
    chunks_dir = uio.join(out_dir, "chunks")
    man = Manifest(out_dir)
    done = man.done_fragments() if resume else set()
    if not resume and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
        man.data["fragments"] = {}
    elif resume and not done and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
    todo = [f for f in frag_files if f not in done]
    for frag in todo:
        d = uio.join(chunks_dir, f"frag={frag}")
        if uio.isdir(d):
            uio.rmtree(d)
    if not todo:
        return man.totals()
    files = [p for f in todo for p in frag_files[f]]
    kwargs = dict(
        batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"col": col}
    )
    if concurrency:
        kwargs["concurrency"] = concurrency
    (
        ray.data.read_parquet(files, include_paths=True)
        .map_batches(_drop_col_fn, **kwargs)
        .write_parquet(chunks_dir, partition_cols=["frag"], compression="none")
    )
    src_man = Manifest(in_dir)
    src_stats = dict(src_man.data.get("fragments", {}))
    need = [f for f in todo if f not in src_stats]
    if need:
        src_stats.update(_fold_chunk_meta(in_chunks, need))
    new_stats = _fold_chunk_meta(chunks_dir, todo)
    for frag in todo:
        s = dict(new_stats.get(frag) or {})
        src_rows = int((src_stats.get(frag) or {}).get("n_rows", 0))
        if s.get("n_rows", 0) != src_rows:
            raise ChunkFormatError(
                f"drop_column row drift on frag {frag}: "
                f"{s.get('n_rows')} != {src_rows}"
            )
        s["dropped_column"] = col
        s["recoded_from"] = in_dir
        man.mark_done(frag, s)
    man.save()
    return man.totals()


class _EventsNoPropsChkStage:
    """_EventsChkStage minus the dropped props column (the drop-column
    audit decodes a sink that no longer carries it)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from tokenzip.analysis import _PAIR_MOD

        ts = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "eid": batch["event_id"].to_numpy(zero_copy_only=False),
                "uid": batch["user_id"].to_numpy(zero_copy_only=False),
                "tsm": ts % _PAIR_MOD,
            }
        )
        agg = df.groupby("event_type", as_index=False).agg(
            n_rows=("eid", "size"),
            sum_event_id=("eid", "sum"),
            sum_user_id=("uid", "sum"),
            sum_ts_mod=("tsm", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_table_drop_column_roundtrip(sf_dir: str):
    """Schema-evolution audit: DROP the props column from the events sink
    at zero decode cost (chunk-row surgery only), then decode the evolved
    sink and checksum every remaining column per event_type against the
    original table."""
    import hashlib

    from ray.data.aggregate import Sum

    src, out_dir = _events_sink(sf_dir)
    h = hashlib.md5(f"{out_dir}:drop:props".encode()).hexdigest()[:10]
    dst = f"/tmp/tokenzip_tbl_drop/{h}"
    t = drop_column(out_dir, dst, "props")
    ds = decompress_table(dst)
    agg = (
        ds.map_batches(
            _EventsNoPropsChkStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("event_type")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_event_id", alias_name="sum_event_id"),
            Sum("sum_user_id", alias_name="sum_user_id"),
            Sum("sum_ts_mod", alias_name="sum_ts_mod"),
        )
        .to_pandas()
    )
    import pandas as pd

    from tokenzip.analysis import _PAIR_MOD

    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_rows": agg["n_rows"].astype("int64"),
            "sum_event_id": agg["sum_event_id"].astype("int64"),
            "sum_user_id": agg["sum_user_id"].astype("int64"),
            "sum_ts_mod": (agg["sum_ts_mod"] % _PAIR_MOD).astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def table_drop_column_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(SUM(epoch_us(ts) % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS sum_ts_mod
FROM events GROUP BY event_type ORDER BY event_type
"""


def _rename_col_fn(batch: pa.Table, old=None, new_name=None) -> pa.Table:
    """Chunk-row surgery for RENAME COLUMN: payload untouched."""
    from tokenzip.pipeline import _frag_of_chunk_path

    paths = batch["path"].to_numpy(zero_copy_only=False)
    frags = [_frag_of_chunk_path(str(p)) for p in paths]
    rows = batch.drop_columns(["path"])
    names_col = rows["enc_names"].to_pylist()
    order_col = rows["col_order"].to_pylist()
    tcodec = rows["tokens_codec"].to_pylist()
    new_names, new_order, new_tc = [], [], []
    for i in range(rows.num_rows):
        if old not in order_col[i]:
            raise ChunkFormatError(
                f"column {old!r} not in sink schema {sorted(order_col[i])}"
            )
        if new_name in order_col[i]:
            raise ChunkFormatError(
                f"column {new_name!r} already exists in the sink schema"
            )
        new_names.append([new_name if n == old else n for n in names_col[i]])
        new_order.append([new_name if n == old else n for n in order_col[i]])
        new_tc.append(
            ",".join(
                f"{new_name}={kv.split('=', 1)[1]}"
                if kv.startswith(f"{old}=")
                else kv
                for kv in str(tcodec[i]).split(",")
            )
        )
    out = rows
    out = out.set_column(
        out.column_names.index("enc_names"), "enc_names",
        pa.array(new_names, pa.list_(pa.string())),
    )
    out = out.set_column(
        out.column_names.index("col_order"), "col_order",
        pa.array(new_order, pa.list_(pa.string())),
    )
    out = out.set_column(
        out.column_names.index("tokens_codec"), "tokens_codec",
        pa.array(new_tc, pa.string()),
    )
    renames = {}
    for pre in ("zmin_", "zmax_", "znn_", "zsum_", "smin_", "smax_", "p_"):
        if f"{pre}{old}" in out.column_names:
            renames[f"{pre}{old}"] = f"{pre}{new_name}"
    if renames:
        out = out.rename_columns(
            [renames.get(c, c) for c in out.column_names]
        )
    if "frag" in out.column_names:
        return out
    return out.append_column("frag", pa.array([str(f) for f in frags], pa.string()))


def rename_column(
    in_dir: str,
    out_dir: str,
    old: str,
    new_name: str,
    *,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """ALTER TABLE RENAME COLUMN at zero decode cost — the same chunk-row
    surgery as drop_column, changing only names (blob bytes, zone values,
    and row counts are untouched; the n_rows guard proves it)."""
    from tokenzip.manifest import Manifest
    from tokenzip.pipeline import _fold_chunk_meta

    in_chunks = uio.join(in_dir, "chunks")
    if not uio.isdir(in_chunks):
        raise ChunkFormatError(f"no chunks directory under {in_dir}")
    frag_dirs = sorted(d for d in uio.listdir(in_chunks) if d.startswith("frag="))
    frag_files = {
        d.split("=", 1)[1]: [
            uio.join(in_chunks, d, n)
            for n in sorted(uio.listdir(uio.join(in_chunks, d)))
            if n.endswith(".parquet")
        ]
        for d in frag_dirs
    }
    chunks_dir = uio.join(out_dir, "chunks")
    man = Manifest(out_dir)
    done = man.done_fragments() if resume else set()
    if not resume and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
        man.data["fragments"] = {}
    elif resume and not done and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
    todo = [f for f in frag_files if f not in done]
    for frag in todo:
        d = uio.join(chunks_dir, f"frag={frag}")
        if uio.isdir(d):
            uio.rmtree(d)
    if not todo:
        return man.totals()
    files = [p for f in todo for p in frag_files[f]]
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"old": old, "new_name": new_name},
    )
    if concurrency:
        kwargs["concurrency"] = concurrency
    (
        ray.data.read_parquet(files, include_paths=True)
        .map_batches(_rename_col_fn, **kwargs)
        .write_parquet(chunks_dir, partition_cols=["frag"], compression="none")
    )
    src_stats = dict(Manifest(in_dir).data.get("fragments", {}))
    need = [f for f in todo if f not in src_stats]
    if need:
        src_stats.update(_fold_chunk_meta(in_chunks, need))
    new_stats = _fold_chunk_meta(chunks_dir, todo)
    for frag in todo:
        s = dict(new_stats.get(frag) or {})
        if s.get("n_rows", 0) != int((src_stats.get(frag) or {}).get("n_rows", 0)):
            raise ChunkFormatError(f"rename_column row drift on frag {frag}")
        s["renamed"] = [old, new_name]
        s["recoded_from"] = in_dir
        man.mark_done(frag, s)
    man.save()
    return man.totals()


# ---------------------------------------------------------------------------
# ALTER TABLE ADD COLUMN ... DEFAULT <const>: the third zero-decode schema
# evolution (drop / rename / add). The new column's blob is synthesized per
# chunk row from (n_rows, value) alone — existing payload bytes are never
# decoded or re-encoded. A constant integer packs to a 0-bit FoR body
# (~60 B/chunk); a constant string dict-encodes to one dictionary entry;
# value=None appends an all-NULL column (empty value stream + zero validity
# bitmap).
# ---------------------------------------------------------------------------

_ADDABLE_TAGS = (
    set(_INT_WIDTH) | set(_UINT_WIDTH)
    | {"timestamp[s]", "timestamp[ms]", "timestamp[us]", "timestamp[ns]"}
    | {"string", "double", "float"}
)


def _add_col_entry(tag: str, value, n: int) -> tuple[str, bytes, bytes, dict]:
    """(codec label, blob, null bitmap, counter deltas) for one chunk row's
    synthesized column. Counter deltas: bytes_in / tokens_bytes_out /
    leb128_bytes / n_tokens / str_bytes."""
    from tokenzip.codecs.strings import encode_str_column

    nmap = b""
    if value is None and n:
        nmap = np.packbits(np.zeros(n, dtype=bool)).tobytes()
    if tag == "string":
        vals = pa.array([] if value is None else [str(value)] * n, pa.string())
        blob = encode_str_column(vals, "auto")
        return "str", blob, nmap, {"str_bytes": len(blob) + len(nmap)}
    if tag in ("double", "float"):
        width = 64 if tag == "double" else 32
        dt = np.float64 if tag == "double" else np.float32
        fvals = (
            np.empty(0, dtype=dt)
            if value is None
            else np.full(n, value, dtype=dt)
        )
        blob = encode_float_column(fvals, width)
        return "flt", blob, nmap, {"str_bytes": len(blob) + len(nmap)}
    # integer / timestamp family: int64 storage units (uint64 bitcast)
    if value is None:
        vals = np.empty(0, dtype=np.int64)
    else:
        sv = int(value)
        if tag == "uint64" and sv >= 2**63:
            sv -= 2**64  # bitcast, mirroring _encode_table_fn
        vals = np.full(n, sv, dtype=np.int64)
    width = _INT_WIDTH.get(tag) or _UINT_WIDTH.get(tag) or 64
    codec = choose_int_codec(vals, width)
    blob = encode_int_column(vals, codec, width)
    bound = leb128_oracle_bytes(vals, width)
    if codec != "leb128" and len(blob) > len(
        lb := encode_int_column(vals, "leb128", width)
    ):
        codec, blob = "leb128", lb
    return codec, blob, nmap, {
        "bytes_in": vals.nbytes,
        "tokens_bytes_out": len(blob),
        "leb128_bytes": bound,
        "n_tokens": n,
        "str_bytes": len(nmap),
    }


def _add_col_fn(batch: pa.Table, col=None, value=None, tag=None) -> pa.Table:
    """Chunk-row surgery for ADD COLUMN: append the synthesized entry to the
    parallel enc_* lists and col_order; existing blobs untouched."""
    from tokenzip.pipeline import _frag_of_chunk_path

    paths = batch["path"].to_numpy(zero_copy_only=False)
    frags = [_frag_of_chunk_path(str(p)) for p in paths]
    rows = batch.drop_columns(["path"])
    names_col = rows["enc_names"].to_pylist()
    codecs_col = rows["enc_codecs"].to_pylist()
    dtags_col = rows["enc_dtypes"].to_pylist()
    blobs_col = rows["enc_blobs"].to_pylist()
    nulls_col = rows["enc_nulls"].to_pylist()
    order_col = rows["col_order"].to_pylist()
    n_rows_col = rows["n_rows"].to_pylist()
    scalars = {
        k: rows[k].to_pylist()
        for k in (
            "bytes_in", "bytes_out", "tokens_bytes_out", "leb128_bytes",
            "n_tokens", "tokens_codec",
        )
    }
    is_int = tag not in ("string", "double", "float")
    zmin, zmax, znn, zsum, smin, smax = [], [], [], [], [], []
    for i in range(rows.num_rows):
        if col in order_col[i]:
            raise ChunkFormatError(
                f"column {col!r} already exists in the sink schema"
            )
        n = int(n_rows_col[i])
        codec, blob, nmap, d = _add_col_entry(tag, value, n)
        names_col[i] = list(names_col[i]) + [col]
        codecs_col[i] = list(codecs_col[i]) + [codec]
        dtags_col[i] = list(dtags_col[i]) + [tag]
        blobs_col[i] = list(blobs_col[i]) + [blob]
        nulls_col[i] = list(nulls_col[i]) + [nmap]
        order_col[i] = list(order_col[i]) + [col]
        scalars["bytes_in"][i] += d.get("bytes_in", 0)
        scalars["bytes_out"][i] += (
            d.get("tokens_bytes_out", 0) + d.get("str_bytes", 0)
        )
        scalars["tokens_bytes_out"][i] += d.get("tokens_bytes_out", 0)
        scalars["leb128_bytes"][i] += d.get("leb128_bytes", 0)
        scalars["n_tokens"][i] += d.get("n_tokens", 0)
        scalars["tokens_codec"][i] = (
            f"{scalars['tokens_codec'][i]},{col}={codec}"
            if scalars["tokens_codec"][i]
            else f"{col}={codec}"
        )
        if is_int:
            if value is None or n == 0:
                zmin.append(1); zmax.append(0); znn.append(0); zsum.append("0")
            else:
                sv = int(value)
                if tag == "uint64" and sv >= 2**63:
                    sv -= 2**64
                zmin.append(sv); zmax.append(sv)
                znn.append(n); zsum.append(str(sv * n))
        elif tag == "string":
            if value is None or n == 0:
                smin.append("\U0010ffff"); smax.append("")
            else:
                smin.append(str(value)); smax.append(str(value))
    out = rows
    for name, vals, typ in (
        ("enc_names", names_col, pa.list_(pa.string())),
        ("enc_codecs", codecs_col, pa.list_(pa.string())),
        ("enc_dtypes", dtags_col, pa.list_(pa.string())),
        ("enc_blobs", blobs_col, pa.list_(pa.binary())),
        ("enc_nulls", nulls_col, pa.list_(pa.binary())),
        ("col_order", order_col, pa.list_(pa.string())),
        ("bytes_in", scalars["bytes_in"], pa.int64()),
        ("bytes_out", scalars["bytes_out"], pa.int64()),
        ("tokens_bytes_out", scalars["tokens_bytes_out"], pa.int64()),
        ("leb128_bytes", scalars["leb128_bytes"], pa.int64()),
        ("n_tokens", scalars["n_tokens"], pa.int64()),
        ("tokens_codec", scalars["tokens_codec"], pa.string()),
    ):
        out = out.set_column(out.column_names.index(name), name, pa.array(vals, typ))
    if is_int:
        out = out.append_column(f"zmin_{col}", pa.array(zmin, pa.int64()))
        out = out.append_column(f"zmax_{col}", pa.array(zmax, pa.int64()))
        out = out.append_column(f"znn_{col}", pa.array(znn, pa.int64()))
        out = out.append_column(f"zsum_{col}", pa.array(zsum, pa.string()))
    elif tag == "string":
        out = out.append_column(f"smin_{col}", pa.array(smin, pa.string()))
        out = out.append_column(f"smax_{col}", pa.array(smax, pa.string()))
    if "frag" in out.column_names:
        return out
    return out.append_column("frag", pa.array([str(f) for f in frags], pa.string()))


def add_column(
    in_dir: str,
    out_dir: str,
    col: str,
    dtype: str,
    value=None,
    *,
    concurrency: int | None = None,
    resume: bool = True,
) -> dict:
    """ALTER TABLE ADD COLUMN <col> <dtype> DEFAULT <value> for a
    compress_table sink at ZERO decode cost: the constant (or NULL) column
    is synthesized per chunk row from its n_rows alone — no existing payload
    is decoded or re-encoded. Zone maps / aggregate metadata for the new
    column are exact by construction, so WHERE/SUM pushdowns on it answer
    from chunk rows immediately. The n_rows guard proves no row was
    touched."""
    from tokenzip.manifest import Manifest
    from tokenzip.pipeline import _fold_chunk_meta

    tag = str(dtype)
    if tag not in _ADDABLE_TAGS:
        raise ChunkFormatError(
            f"unsupported ADD COLUMN dtype {tag!r}; one of {sorted(_ADDABLE_TAGS)}"
        )
    if value is not None:
        # validate the default against the declared dtype up front (a bad
        # constant must fail before any fragment is written)
        if tag == "string":
            value = str(value)
        elif tag in ("double", "float"):
            value = float(value)
        else:
            pa.array([int(value)], _DTYPE_OF_TAG[tag])
            value = int(value)
    in_chunks = uio.join(in_dir, "chunks")
    if not uio.isdir(in_chunks):
        raise ChunkFormatError(f"no chunks directory under {in_dir}")
    frag_dirs = sorted(d for d in uio.listdir(in_chunks) if d.startswith("frag="))
    frag_files = {
        d.split("=", 1)[1]: [
            uio.join(in_chunks, d, n)
            for n in sorted(uio.listdir(uio.join(in_chunks, d)))
            if n.endswith(".parquet")
        ]
        for d in frag_dirs
    }
    chunks_dir = uio.join(out_dir, "chunks")
    man = Manifest(out_dir)
    done = man.done_fragments() if resume else set()
    if not resume and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
        man.data["fragments"] = {}
    elif resume and not done and uio.isdir(chunks_dir):
        uio.rmtree(chunks_dir)
    todo = [f for f in frag_files if f not in done]
    for frag in todo:
        d = uio.join(chunks_dir, f"frag={frag}")
        if uio.isdir(d):
            uio.rmtree(d)
    if not todo:
        return man.totals()
    files = [p for f in todo for p in frag_files[f]]
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"col": col, "value": value, "tag": tag},
    )
    if concurrency:
        kwargs["concurrency"] = concurrency
    (
        ray.data.read_parquet(files, include_paths=True)
        .map_batches(_add_col_fn, **kwargs)
        .write_parquet(chunks_dir, partition_cols=["frag"], compression="none")
    )
    src_stats = dict(Manifest(in_dir).data.get("fragments", {}))
    need = [f for f in todo if f not in src_stats]
    if need:
        src_stats.update(_fold_chunk_meta(in_chunks, need))
    new_stats = _fold_chunk_meta(chunks_dir, todo)
    for frag in todo:
        s = dict(new_stats.get(frag) or {})
        if s.get("n_rows", 0) != int((src_stats.get(frag) or {}).get("n_rows", 0)):
            raise ChunkFormatError(f"add_column row drift on frag {frag}")
        s["added_column"] = [col, tag, None if value is None else str(value)]
        s["recoded_from"] = in_dir
        man.mark_done(frag, s)
    man.save()
    return man.totals()

class _EventsAddColChkStage:
    """_EventsChkStage plus checksums of the two synthesized columns the
    add-column audit appends (a constant string tag and a constant int32
    split id): any decode drift in either the pre-existing payload or the
    zero-decode-synthesized blobs flips a sum."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from tokenzip.analysis import _PAIR_MOD

        ts = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        props_len = pa.compute.utf8_length(batch["props"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        tag_ok = pa.compute.equal(batch["corpus_tag"], "web").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        split = batch["split_id"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "eid": batch["event_id"].to_numpy(zero_copy_only=False),
                "uid": batch["user_id"].to_numpy(zero_copy_only=False),
                "tsm": ts % _PAIR_MOD,
                "plen": props_len,
                "tok": tag_ok,
                "split": split,
            }
        )
        agg = df.groupby("event_type", as_index=False).agg(
            n_rows=("eid", "size"),
            sum_event_id=("eid", "sum"),
            sum_user_id=("uid", "sum"),
            sum_ts_mod=("tsm", "sum"),
            sum_props_len=("plen", "sum"),
            n_tag_web=("tok", "sum"),
            sum_split_id=("split", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_table_add_column_roundtrip(sf_dir: str):
    """Schema-evolution audit: ADD two constant columns to the events sink
    at zero decode cost (corpus_tag string DEFAULT 'web', then split_id
    int32 DEFAULT 3 — chained, so the second surgery runs over an
    already-evolved sink), decode the evolved sink, and checksum every
    original column per event_type against DuckDB recomputing from the
    original table with the same literals appended."""
    import hashlib

    from ray.data.aggregate import Sum

    src, out_dir = _events_sink(sf_dir)
    h = hashlib.md5(f"{out_dir}:add:corpus_tag:split_id".encode()).hexdigest()[:10]
    mid = f"/tmp/tokenzip_tbl_add/{h}/tag"
    dst = f"/tmp/tokenzip_tbl_add/{h}/split"
    add_column(out_dir, mid, "corpus_tag", "string", "web")
    add_column(mid, dst, "split_id", "int32", 3)
    ds = decompress_table(dst)
    agg = (
        ds.map_batches(
            _EventsAddColChkStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("event_type")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_event_id", alias_name="sum_event_id"),
            Sum("sum_user_id", alias_name="sum_user_id"),
            Sum("sum_ts_mod", alias_name="sum_ts_mod"),
            Sum("sum_props_len", alias_name="sum_props_len"),
            Sum("n_tag_web", alias_name="n_tag_web"),
            Sum("sum_split_id", alias_name="sum_split_id"),
        )
        .to_pandas()
    )
    import pandas as pd

    from tokenzip.analysis import _PAIR_MOD

    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_rows": agg["n_rows"].astype("int64"),
            "sum_event_id": agg["sum_event_id"].astype("int64"),
            "sum_user_id": agg["sum_user_id"].astype("int64"),
            "sum_ts_mod": (agg["sum_ts_mod"] % _PAIR_MOD).astype("int64"),
            "sum_props_len": agg["sum_props_len"].astype("int64"),
            "n_tag_web": agg["n_tag_web"].astype("int64"),
            "sum_split_id": agg["sum_split_id"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def table_add_column_sql() -> str:
    from tokenzip.analysis import _PAIR_MOD

    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(SUM(epoch_us(ts) % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS sum_ts_mod,
       CAST(SUM(length(props)) AS BIGINT) AS sum_props_len,
       CAST(SUM(CASE WHEN corpus_tag = 'web' THEN 1 ELSE 0 END) AS BIGINT) AS n_tag_web,
       CAST(SUM(split_id) AS BIGINT) AS sum_split_id
FROM (SELECT *, 'web' AS corpus_tag, 3 AS split_id FROM events)
GROUP BY event_type ORDER BY event_type
"""
