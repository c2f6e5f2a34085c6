"""Deterministic synthetic token corpus (FIXTURES.md F1), the flagship input
table of the `input_hint` shape:

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

Generated as a pure function of (seed, shard) with NumPy's PCG64 so every
rerun (and every Ray task retry) produces bit-identical parquet shards —
the engine analog of the reference bench generator's seeded streams
(/root/reference/benches/varint_bench/main.rs:21-39).

Per-source token distributions give the codec auto-selector real choices:
  web   -> zipf-ish small ids       (varint/dict-friendly)
  code  -> uniform [0, 50_000)      (bit-pack/varint)
  books -> runs of repeated ids     (RLE-friendly)
  wiki  -> narrow band around 30000 (frame-of-reference)
  synth -> full int32 incl negative (zigzag stress)

Length mixture: 90% U[1,512], 9% U[513,4096], 1% stragglers U[32768,131072]
(exercises skew/repartition), plus 0.5% empty and 0.1% single-token rows.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
# 32 uniform shards: enough per-file fused read+verify tasks to keep 8-32
# cores busy (files are the parallelism unit at 100 TB). The round-1
# measurement that 32 shards regress the partitioned write predated the
# native kernels + malloc tuning; re-measured neutral-to-better now.
N_SHARDS = 32
CORPUS_ROOT = "/tmp/tokenzip_corpus"
# small row groups so ray.data.read_parquet can split each shard into many
# read tasks (one row group per file would cap read/encode parallelism at
# N_SHARDS); bumping this constant invalidates cached corpora
ROW_GROUP_ROWS = 1024
_FORMAT_MARKER = f".format-rg{ROW_GROUP_ROWS}-s{N_SHARDS}"

SOURCES = np.array(["web", "code", "books", "wiki", "synth"])
SOURCE_P = np.array([0.55, 0.15, 0.12, 0.12, 0.06])

# rows per scale, FIXTURES.md F1 ("10_000 rows for unit tests, 100_000 for bench")
ROWS_BY_SF = {"sf0.001": 2_000, "sf0.01": 10_000, "sf0.1": 100_000,
              "sfscale": 800_000}  # sfscale: the --scaling corpus (8x bench - big enough that fixed pipeline overheads are <5% of the timed work)

TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _lengths(rng: np.random.Generator, n: int) -> np.ndarray:
    u = rng.random(n)
    lens = np.empty(n, dtype=np.int64)
    m_short = u < 0.90
    m_mid = (u >= 0.90) & (u < 0.99)
    m_strag = u >= 0.99
    lens[m_short] = rng.integers(1, 513, int(m_short.sum()))
    lens[m_mid] = rng.integers(513, 4_097, int(m_mid.sum()))
    lens[m_strag] = rng.integers(32_768, 131_073, int(m_strag.sum()))
    v = rng.random(n)
    lens[v < 0.005] = 0
    lens[(v >= 0.005) & (v < 0.006)] = 1
    return lens


def _tokens_for_source(rng: np.random.Generator, source: str, total: int) -> np.ndarray:
    if total == 0:
        return np.empty(0, dtype=np.int32)
    if source == "web":
        vals = rng.zipf(1.3, total)
        return np.clip(vals, 0, 50_000).astype(np.int32)
    if source == "code":
        return rng.integers(0, 50_000, total).astype(np.int32)
    if source == "books":
        # runs of repeated ids, mean run length ~8
        n_runs = max(1, total // 8)
        run_vals = rng.integers(0, 30_000, n_runs).astype(np.int32)
        run_lens = rng.geometric(1 / 8.0, n_runs)
        reps = np.repeat(run_vals, run_lens)
        while len(reps) < total:
            reps = np.concatenate([reps, reps])
        return reps[:total]
    if source == "wiki":
        return (30_000 + rng.integers(-500, 501, total)).astype(np.int32)
    # synth: full int32 including negatives
    return rng.integers(-(2**31), 2**31 - 1, total, endpoint=True).astype(np.int32)


def generate_shard(shard: int, n_rows: int, row_offset: int, seed: int = SEED) -> pa.Table:
    """One parquet shard: pure function of (seed, shard, n_rows, row_offset)."""
    rng = np.random.default_rng([seed, shard])
    lens = _lengths(rng, n_rows)
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_P)
    values = np.empty(int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    # fill tokens per source family (vectorized per source, scattered per row)
    for si, source in enumerate(SOURCES):
        rows = np.flatnonzero(src_idx == si)
        total = int(lens[rows].sum())
        toks = _tokens_for_source(rng, source, total)
        pos = 0
        for r in rows:
            ln = int(lens[r])
            values[offsets[r] : offsets[r] + ln] = toks[pos : pos + ln]
            pos += ln
    doc_ids = [f"doc-{row_offset + i:08d}" for i in range(n_rows)]
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(SOURCES[src_idx], type=pa.string()),
        },
        schema=TOKEN_SCHEMA,
    )


def corpus_dir(sf_name: str) -> str:
    return os.path.join(CORPUS_ROOT, sf_name, "tokens")


def ensure_corpus(sf_dir_or_name: str, n_rows: int | None = None, seed: int = SEED) -> str:
    """Idempotently materialize the token corpus for a scale factor to
    ``/tmp/tokenzip_corpus/<sf>/tokens/part-*.parquet`` (atomic rename so
    concurrent callers are safe). Returns the directory path."""
    sf_name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out = corpus_dir(sf_name)
    marker = os.path.join(out, _FORMAT_MARKER)
    if os.path.isdir(out) and os.path.exists(marker):
        return out
    if os.path.isdir(out):  # stale format: regenerate
        shutil.rmtree(out, ignore_errors=True)
    n_rows = n_rows or ROWS_BY_SF.get(sf_name, 10_000)
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    per = n_rows // N_SHARDS
    for shard in range(N_SHARDS):
        rows = per if shard < N_SHARDS - 1 else n_rows - per * (N_SHARDS - 1)
        table = generate_shard(shard, rows, row_offset=shard * per, seed=seed)
        pq.write_table(
            table,
            os.path.join(tmp, f"part-{shard:04d}.parquet"),
            compression="zstd",
            row_group_size=ROW_GROUP_ROWS,
        )
    open(os.path.join(tmp, _FORMAT_MARKER), "w").close()
    try:
        os.replace(tmp, out) if not os.path.isdir(out) else shutil.rmtree(tmp)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def corpus_paths(sf_dir_or_name: str) -> list[str]:
    d = ensure_corpus(sf_dir_or_name)
    return sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
