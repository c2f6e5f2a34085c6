"""Ingestion sources beyond parquet: newline-delimited JSON (JSONL).

The engine's canonical input is the north-rule parquet token table; real
corpora often arrive as JSONL (one document object per line). This module
reads JSONL into the SAME canonical Arrow schema — tokens coerced to
list<int32>, n_tok to int32 — so every downstream pipeline (compress,
dedup, packing) applies unchanged. Reading is `ray.data.read_json`
(pyarrow ndjson reader, one task per file, streaming), then one
schema-canonicalization map_batches; the DuckDB oracle reads the exact
same file via read_json_auto.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data

TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _canonicalize(batch: pa.Table) -> pa.Table:
    """JSON-inferred types (list<int64>, int64) -> the canonical token
    schema; refuses values outside int32 loudly instead of truncating."""
    tok = batch["tokens"].combine_chunks()
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.chunk(0)
    flat = tok.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) and (flat.min() < -(2**31) or flat.max() > 2**31 - 1):
        raise ValueError("jsonl tokens outside int32 range")
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.string()),
            "tokens": tok.cast(pa.list_(pa.int32())),
            "n_tok": batch["n_tok"].cast(pa.int32()),
            "source": batch["source"].cast(pa.string()),
        }
    )


def read_tokens_jsonl(paths: list[str] | str) -> "ray.data.Dataset":
    """JSONL documents -> canonical token-schema Dataset (one read task per
    file; schema coercion per batch, zero row-level Python)."""
    return ray.data.read_json(paths).map_batches(
        _canonicalize, batch_format="pyarrow", zero_copy_batch=True
    )


def ensure_jsonl_corpus(sf_dir: str, shard: int = 0) -> str:
    """Deterministic JSONL rendering of one shard of the synthetic corpus
    (bounded size; same derivation for the Ray query and the SQL oracle).
    Idempotent: written once per scale under /tmp/tokenzip_corpus."""
    from tokenzip.corpus import corpus_paths

    spath = sorted(corpus_paths(sf_dir))[shard]
    dst = os.path.join(
        os.path.dirname(spath), os.path.basename(spath) + ".jsonl"
    )
    if os.path.exists(dst):
        return dst
    import pyarrow.parquet as pq

    t = pq.read_table(spath)
    lines = []
    ids = t["doc_id"].to_pylist()
    toks = t["tokens"].to_pylist()
    ntok = t["n_tok"].to_pylist()
    srcs = t["source"].to_pylist()
    for d, tk, n, s in zip(ids, toks, ntok, srcs):
        lines.append(
            json.dumps(
                {"doc_id": d, "tokens": tk, "n_tok": int(n), "source": s},
                separators=(",", ":"),
            )
        )
    tmp = dst + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, dst)
    return dst


def _ingest_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-source (n_docs, sum_tokens, sum_zigzag) partials —
    the shared value-level proof that an ingestion path carries the same
    data the parquet path does."""
    from tokenzip.chunk import _tokens_parts
    from tokenzip.codecs.varint import zigzag_encode

    lengths, values = _tokens_parts(batch["tokens"])
    src = np.asarray(batch["source"].to_pylist(), dtype=object)
    uniq, inv = np.unique(src, return_inverse=True)
    k = len(uniq)
    tok_src = np.repeat(inv, lengths)
    zz = zigzag_encode(values.astype(np.int32), 32).astype(np.uint64)
    sum_zz = np.zeros(k, np.uint64)
    np.add.at(sum_zz, tok_src, zz)
    ntok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "source": pa.array([str(s) for s in uniq], pa.string()),
            "n_docs": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
            "sum_tokens": pa.array(
                np.bincount(inv, weights=ntok.astype(np.float64), minlength=k)
                .astype(np.int64)
            ),
            "sum_zigzag": pa.array(sum_zz.astype(np.int64)),
        }
    )


def _ingest_stats(ds: "ray.data.Dataset"):
    import pandas as pd
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(_ingest_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_tokens", alias_name="sum_tokens"),
            Sum("sum_zigzag", alias_name="sum_zigzag"),
        )
        .to_pandas()
    )
    out = agg[["source", "n_docs", "sum_tokens", "sum_zigzag"]].astype(
        {"n_docs": "int64", "sum_tokens": "int64", "sum_zigzag": "int64"}
    )
    return out.sort_values("source").reset_index(drop=True)


def q_jsonl_ingest_stats(sf_dir: str):
    """Ingest the JSONL rendering of shard 0 and aggregate per source:
    (n_docs, sum_tokens, sum_zigzag) — value-level proof that the JSONL
    path yields the same data the parquet path carries."""
    return _ingest_stats(read_tokens_jsonl(ensure_jsonl_corpus(sf_dir)))


def jsonl_ingest_sql(jsonl_path: str) -> str:
    zz = "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) ELSE -2*CAST(t AS BIGINT)-1 END"
    return f"""
WITH d AS (SELECT * FROM read_json_auto('{jsonl_path}')),
z AS (SELECT source, {zz} AS zt
      FROM (SELECT source, unnest(tokens) AS t FROM d))
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens,
       (SELECT CAST(SUM(zt) AS BIGINT) FROM z WHERE z.source = d.source)
           AS sum_zigzag
FROM d GROUP BY d.source ORDER BY d.source
"""

def _parse_csv_tokens(batch: pa.Table) -> pa.Table:
    """CSV-carried columns -> the canonical token schema: the space-joined
    token string splits with one Arrow kernel and casts list<string> ->
    list<int32> (Arrow applies the child cast; a non-numeric or
    out-of-range value raises instead of truncating). Format contract:
    a zero-token document renders as the EMPTY string, so '' parses to an
    empty list (split alone would yield ['']) — the oracle SQL applies the
    identical CASE."""
    import pyarrow.compute as pc

    s = batch["tokens"].combine_chunks().cast(pa.string())
    arr = pc.split_pattern(s, pattern=" ")
    is_empty = pc.equal(s, "").to_numpy(zero_copy_only=False)
    if is_empty.any():
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(offsets)
        keep = np.repeat(~is_empty, lengths)
        flat = arr.flatten().filter(pa.array(keep))
        new_off = np.concatenate(
            [[0], np.cumsum(np.where(is_empty, 0, lengths))]
        ).astype(np.int32)
        arr = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), flat)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.string()),
            "tokens": arr.cast(pa.list_(pa.int32())),
            "n_tok": batch["n_tok"].cast(pa.int32()),
            "source": batch["source"].cast(pa.string()),
        }
    )


def read_tokens_csv(paths: list[str] | str) -> "ray.data.Dataset":
    """CSV documents (tokens space-joined in one column) -> canonical
    token-schema Dataset; one read task per file, vectorized parse."""
    return ray.data.read_csv(paths).map_batches(
        _parse_csv_tokens, batch_format="pyarrow", zero_copy_batch=True
    )


def ensure_csv_corpus(sf_dir: str, shard: int = 0) -> str:
    """Deterministic CSV rendering of one shard of the synthetic corpus
    (tokens space-joined; same derivation for Ray and the SQL oracle).
    Idempotent per scale under /tmp/tokenzip_corpus."""
    import csv

    from tokenzip.corpus import corpus_paths

    spath = sorted(corpus_paths(sf_dir))[shard]
    dst = os.path.join(os.path.dirname(spath), os.path.basename(spath) + ".csv")
    if os.path.exists(dst):
        return dst
    import pyarrow.parquet as pq

    t = pq.read_table(spath)
    tmp = dst + f".tmp.{os.getpid()}"
    with open(tmp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "tokens", "n_tok", "source"])
        for d, tk, n, s in zip(
            t["doc_id"].to_pylist(),
            t["tokens"].to_pylist(),
            t["n_tok"].to_pylist(),
            t["source"].to_pylist(),
        ):
            w.writerow([d, " ".join(str(v) for v in tk), int(n), s])
    os.replace(tmp, dst)
    return dst


def q_csv_ingest_stats(sf_dir: str):
    """Ingest the CSV rendering of shard 0 — same per-source value-level
    stats as the JSONL path, proving parse equivalence."""
    return _ingest_stats(read_tokens_csv(ensure_csv_corpus(sf_dir)))


def csv_ingest_sql(csv_path: str) -> str:
    zz = "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) ELSE -2*CAST(t AS BIGINT)-1 END"
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN tokens = '' THEN [] ELSE string_split(tokens, ' ') END
             AS toklist,
         CAST(n_tok AS BIGINT) AS n_tok, source
  FROM read_csv('{csv_path}', header=true,
                columns={{'doc_id':'VARCHAR','tokens':'VARCHAR',
                          'n_tok':'BIGINT','source':'VARCHAR'}})
),
z AS (SELECT source, {zz} AS zt
      FROM (SELECT source, CAST(unnest(toklist) AS BIGINT) AS t FROM d))
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       (SELECT CAST(SUM(zt) AS BIGINT) FROM z WHERE z.source = d.source)
           AS sum_zigzag
FROM d GROUP BY d.source ORDER BY d.source
"""


def q_multi_format_union(sf_dir: str):
    """Heterogeneous-source union: shard 0 rendered to JSONL, shard 1 to
    CSV, the remaining shards read as parquet — three readers union into
    ONE Dataset (every downstream stage is format-blind after
    canonicalization), and the per-source value-level stats must equal
    the plain parquet corpus exactly.  The oracle reads the ORIGINAL
    parquet glob: the union is only correct if all three parse paths are
    lossless."""
    from tokenzip.corpus import corpus_paths

    paths = sorted(corpus_paths(sf_dir))
    if len(paths) < 3:
        raise ValueError("multi-format union needs >= 3 corpus shards")
    jsonl = read_tokens_jsonl(ensure_jsonl_corpus(sf_dir, shard=0))
    csv = read_tokens_csv(ensure_csv_corpus(sf_dir, shard=1))
    parquet = ray.data.read_parquet(paths[2:]).map_batches(
        _canonicalize, batch_format="pyarrow", zero_copy_batch=True
    )
    return _ingest_stats(jsonl.union(csv).union(parquet))


def multi_format_union_sql(glob: str) -> str:
    zz = "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) ELSE -2*CAST(t AS BIGINT)-1 END"
    return f"""
WITH d AS (SELECT * FROM read_parquet('{glob}')),
z AS (SELECT source, {zz} AS zt
      FROM (SELECT source, unnest(tokens) AS t FROM d))
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens,
       (SELECT CAST(SUM(zt) AS BIGINT) FROM z WHERE z.source = d.source)
           AS sum_zigzag
FROM d GROUP BY d.source ORDER BY d.source
"""
