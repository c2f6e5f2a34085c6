"""Training-set preparation operators over the token corpus (the
`input_hint` table: doc_id:string, tokens:list<int32>, n_tok:int32,
source:string) — the steps between "deduplicated corpus" and "batches on
the accelerator":

* **sequence packing** (`q_pack_stats_by_source`, `pack_sequences`): the
  GPT-style pretraining transform — concatenate every document's tokens in
  a deterministic global order (doc_id ascending per source) and cut the
  stream into fixed-length training sequences. The hard part at 10^12 docs
  is the *global prefix sum* of n_tok in that order; implemented as a
  sampled range-bucket two-phase scan (the same boundary-sampling a
  distributed sort uses), NOT a full `ds.sort`: phase A is a column-pruned
  map over (doc_id, n_tok, source) emitting per-(source, range-bucket)
  partial sums; the driver scans the tiny bucket table into exclusive base
  offsets; phase B co-locates each range bucket with ONE bounded-group
  shuffle of id-rows (no token payloads) and assigns exact per-doc offsets
  with a vectorized in-group lexsort + segmented cumsum.

* **vocabulary statistics** (`q_vocab_topk`): global token-frequency top-k.
  Per-batch `np.unique` partials, hash-bucketed `groupby` so group count is
  bounded regardless of vocabulary size, bucket-local top-k (a bucket's
  top-k superset of any global top-k member), tiny driver merge.

* **deterministic train/val split** (`q_split_stats_by_source`): md5-hash
  split on doc_id (stable under re-runs, re-shards, and resume — the split
  is a pure function of the row, never of placement), pre-aggregated
  per-batch so the shuffle is sources x splits rows.

All three are oracle-checked against DuckDB (window-function prefix sums /
UNNEST group-bys / the same md5-nibble arithmetic) via __ray_entry__.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum

from tokenzip.analysis import _PAIR_K, _PAIR_MOD
from tokenzip.corpus import corpus_paths

SEQ_LEN = 2048  # default packed-sequence length (tokens)

# phase-B range buckets hold ~this many docs: big enough that the id-row
# shuffle has bounded group count, small enough that one group's lexsort
# (~64k x 16B) is trivially in-memory. At 10^12 docs the phase-A bucket
# table is ~15M rows x 3 cols — the driver scan is a cumsum over it; fold
# it hierarchically (tree scan) if that ever dominates.
_BUCKET_DOCS = 65_536


_TOKEN_COLS = {"doc_id", "tokens", "n_tok", "source"}


def _token_paths(sf_dir_or_path: str) -> list[str]:
    """Input resolution: an existing directory (or file) of TOKEN-SCHEMA
    parquet is used as-is (the first file's schema must carry the
    input_hint columns — a directory of other tables, e.g. the testdata
    sf dirs, falls through); otherwise the name resolves to the
    deterministic synthetic corpus (corpus.ensure_corpus)."""

    def _is_token_file(path: str) -> bool:
        try:
            return _TOKEN_COLS <= set(pq.ParquetFile(path).schema_arrow.names)
        except Exception:
            return False

    p = sf_dir_or_path
    if os.path.isfile(p) and p.endswith(".parquet") and _is_token_file(p):
        return [p]
    if os.path.isdir(p):
        found = sorted(
            os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
        )
        if found and _is_token_file(found[0]):
            return found
    return corpus_paths(p)


def _ids_dataset(paths: list[str]) -> "ray.data.Dataset":
    """Column-pruned id stream: packing geometry never reads token payloads."""
    return ray.data.read_parquet(paths, columns=["doc_id", "n_tok", "source"])


_BOUNDS_SAMPLE_FILES = 64  # bounds sample: files strided across the input
_BOUNDS_SERIAL_MAX = 8     # below this many files a serial read is cheaper
                           # than one Ray execution


def _bounds_ids_of_file(p: str, per_file: int) -> np.ndarray:
    """One file's bounds sample: row groups strided across the WHOLE file
    (files are typically range-partitioned by id, so sampling only the
    first row group would collapse ~all of a file's docs into one bucket),
    rows strided within."""
    f = pq.ParquetFile(p)
    nrg = f.metadata.num_row_groups
    rgs = range(nrg) if nrg <= 8 else range(0, nrg, max(1, nrg // 8))
    cols = [
        f.read_row_group(rg, columns=["doc_id"])["doc_id"].to_numpy(
            zero_copy_only=False
        )
        for rg in rgs
    ]
    col = np.concatenate(cols) if cols else np.array([], dtype=object)
    if len(col) > per_file:
        col = col[:: max(1, len(col) // per_file)]
    return col


def _sample_bounds(paths: list[str], n_buckets: int) -> np.ndarray:
    """Range-bucket boundaries from a bounded sample of doc_ids. The sample
    is a pure function of the sorted input (deterministic under retries):
    up to _BOUNDS_SAMPLE_FILES files evenly STRIDED across the input, each
    read by a Ray map task — never an O(files) serial driver loop (at 10^5
    fragments that was 10^5 serial footer+row-group reads before packing
    could start). Bounds only steer bucketing; offsets stay exact for ANY
    bounds, so subsampling files cannot change results. Returns
    (n_buckets - 1) sorted cut points; bucket of a doc =
    searchsorted(bounds, doc_id, 'right')."""
    spaths = sorted(paths)
    if len(spaths) > _BOUNDS_SAMPLE_FILES:
        idx = np.linspace(0, len(spaths) - 1, _BOUNDS_SAMPLE_FILES).astype(int)
        spaths = [spaths[i] for i in sorted(set(idx.tolist()))]
    per_file = max(256, (n_buckets * 64) // max(1, len(spaths)))

    if ray.is_initialized() and len(spaths) > _BOUNDS_SERIAL_MAX:

        def _one(batch: pa.Table) -> pa.Table:
            out = [
                _bounds_ids_of_file(p, per_file)
                for p in batch["path"].to_pylist()
            ]
            flat = np.concatenate(out) if out else np.array([], dtype=object)
            return pa.table({"doc_id": pa.array(flat.tolist(), pa.string())})

        sampled = (
            ray.data.from_arrow(pa.table({"path": pa.array(spaths, pa.string())}))
            .map_batches(_one, batch_format="pyarrow", batch_size=1)
            .to_pandas()  # bounded: <= _BOUNDS_SAMPLE_FILES * per_file ids
        )
        ids = sampled["doc_id"].tolist()
    else:
        ids = []
        for p in spaths:
            ids.extend(_bounds_ids_of_file(p, per_file).tolist())
    ids.sort()
    if n_buckets <= 1 or len(ids) < 2:
        return np.array([], dtype=object)
    cuts = [ids[(i * len(ids)) // n_buckets] for i in range(1, n_buckets)]
    return np.array(sorted(set(cuts)), dtype=object)


def _bucket_of(doc_id: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    if len(bounds) == 0:
        return np.zeros(len(doc_id), dtype=np.int64)
    return np.searchsorted(bounds, doc_id, side="right").astype(np.int64)


def _n_docs(paths: list[str]) -> int:
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        return 8


def _n_range_buckets(n_docs: int) -> int:
    """Range-bucket count: at least ~4 groups/cpu so the phase-B shuffle
    parallelizes at small corpora; ~_BUCKET_DOCS docs/bucket at scale."""
    return max(8, 4 * _cpus(), n_docs // _BUCKET_DOCS)


# ---------------------------------------------------------------------------
# Sequence packing: distributed prefix scan -> per-doc global offsets
# ---------------------------------------------------------------------------


def _phase_a(bounds: np.ndarray):
    """Per-batch partial sums per (source, bucket): the scan's reduce leg."""

    def fn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        ntok = b["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = b["source"].to_numpy(zero_copy_only=False)
        bkt = _bucket_of(ids, bounds)
        df = pd.DataFrame({"source": src, "bkt": bkt, "tok": ntok})
        agg = df.groupby(["source", "bkt"], as_index=False)["tok"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    return fn


def _bucket_bases(paths: list[str], bounds: np.ndarray) -> dict:
    """Exclusive per-(source, bucket) base offsets: tiny bucket table ->
    driver cumsum in (source, bucket-index) order. Also returns per-source
    totals."""
    parts = (
        _ids_dataset(paths)
        .map_batches(_phase_a(bounds), batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "bkt"])
        .aggregate(Sum("tok", alias_name="tok"))
        .to_pandas()
    )
    parts = parts.sort_values(["source", "bkt"]).reset_index(drop=True)
    bases: dict[tuple, int] = {}
    totals: dict[str, int] = {}
    for source, grp in parts.groupby("source", sort=True):
        run = 0
        for bkt, tok in zip(grp["bkt"], grp["tok"]):
            bases[(source, int(bkt))] = run
            run += int(tok)
        totals[source] = run
    return {"bases": bases, "totals": totals}


def _group_offsets(g: pd.DataFrame, bases: dict):
    """The shared in-bucket offset math of the stats and emit paths: lexsort
    by (source, doc_id), segmented exclusive cumsum per source run, add the
    broadcast (source, bucket) base. Returns (src, ids, ntok, off,
    run_starts, run_ends) in sorted order."""
    src = g["source"].to_numpy()
    ids = g["doc_id"].to_numpy()
    ntok = g["n_tok"].to_numpy().astype(np.int64)
    bkt = int(g["bkt"].iloc[0])
    order = np.lexsort((ids, src))
    src, ids, ntok = src[order], ids[order], ntok[order]
    csum = np.zeros(len(ntok) + 1, np.int64)
    np.cumsum(ntok, out=csum[1:])
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    ends = np.r_[starts[1:], len(src)]
    seg_base = np.repeat(csum[starts], ends - starts)
    off = csum[:-1] - seg_base
    for lo, hi, s in zip(starts, ends, src[starts]):
        base = bases["bases"].get((s, bkt))
        if base is None:
            # phase A and phase B disagree (e.g. input files mutated between
            # the two scans): fail loudly — a silent 0 base would pack every
            # doc in the bucket at offset 0 (mirrors the sidecar KeyError)
            raise KeyError(f"no phase-A base for (source={s!r}, bucket={bkt})")
        off[lo:hi] += base
    return src, ids, ntok, off, starts, ends


def _pack_group(seq_len: int, bases_ref):
    """groupby(bkt): exact per-doc offsets inside one range bucket
    (_group_offsets), then fold the packing stats so only sources-sized
    partials leave the group."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(_PACK_EMPTY)
        bases = ray.get(bases_ref) if not isinstance(bases_ref, dict) else bases_ref
        src, ids, ntok, off, starts, ends = _group_offsets(g, bases)
        # fold stats per source (ADVICE-safe modular terms: reduce mod M
        # BEFORE the * K so every intermediate stays far below 2**63)
        offm = off % _PAIR_MOD
        term = (offm * _PAIR_K + ntok % _PAIR_MOD) % _PAIR_MOD
        boundary = (ntok > 0) & (off // seq_len != (off + ntok - 1) // seq_len)
        out = [
            {
                "source": s,
                "n_docs": int(hi - lo),
                "total_tokens": int(ntok[lo:hi].sum()),
                "n_boundary_docs": int(boundary[lo:hi].sum()),
                "chk": int(term[lo:hi].sum() % _PAIR_MOD),
            }
            for lo, hi, s in zip(starts, ends, src[starts])
        ]
        return pd.DataFrame(out)

    return fn


_PACK_EMPTY = {
    "source": pd.Series([], dtype="object"),
    "n_docs": pd.Series([], dtype="int64"),
    "total_tokens": pd.Series([], dtype="int64"),
    "n_boundary_docs": pd.Series([], dtype="int64"),
    "chk": pd.Series([], dtype="int64"),
}


def q_pack_stats_by_source(sf_dir: str, seq_len: int = SEQ_LEN) -> pd.DataFrame:
    """Sequence-packing geometry per source: how many fixed-`seq_len`
    training sequences the source fills, how many docs straddle a sequence
    boundary, and an offset checksum pinning every doc's exact position in
    the packed stream (oracle: DuckDB window-function prefix sums)."""
    paths = _token_paths(sf_dir)
    nb = _n_range_buckets(_n_docs(paths))
    bounds = _sample_bounds(paths, nb)
    scan = _bucket_bases(paths, bounds)
    bases_ref = ray.put(scan) if ray.is_initialized() else scan

    def tag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column("bkt", pa.array(_bucket_of(ids, bounds)))

    parts = (
        _ids_dataset(paths)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_pack_group(seq_len, bases_ref), batch_format="pandas")
    )
    agg = (
        parts.groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_tokens", alias_name="total_tokens"),
            Sum("n_boundary_docs", alias_name="n_boundary_docs"),
            Sum("chk", alias_name="chk"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "total_tokens": agg["total_tokens"].astype("int64"),
            "n_sequences": (agg["total_tokens"] // seq_len).astype("int64"),
            "n_boundary_docs": agg["n_boundary_docs"].astype("int64"),
            "pack_checksum": (agg["chk"] % _PAIR_MOD).astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def pack_stats_sql(glob: str, seq_len: int = SEQ_LEN) -> str:
    return f"""
WITH d AS (
  SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         COALESCE(SUM(CAST(n_tok AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM read_parquet('{glob}')
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
  CAST(SUM(n_tok) // {seq_len} AS BIGINT) AS n_sequences,
  CAST(SUM(CASE WHEN n_tok > 0
                 AND off // {seq_len} != (off + n_tok - 1) // {seq_len}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
  CAST(SUM(((off % {_PAIR_MOD}) * {_PAIR_K} + n_tok % {_PAIR_MOD})
           % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS pack_checksum
FROM d GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Sequence packing: full emit path (packed sequences as a Dataset)
# ---------------------------------------------------------------------------


_PIECE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("seq_id", pa.int64()),
        ("pos", pa.int64()),
        ("piece", pa.large_list(pa.int32())),
    ]
)


def _offsets_group(bases_ref):
    """groupby(bkt) over ID ROWS ONLY: exact per-doc global offsets inside
    one range bucket (_group_offsets), emitted as the compact
    (bkt, source, doc_id, off) sidecar rows — source is part of the lookup
    key so corpora reusing doc_ids across sources stay correct. Token
    payloads never enter this shuffle."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "bkt": pd.Series([], dtype="int64"),
                    "source": pd.Series([], dtype="object"),
                    "doc_id": pd.Series([], dtype="object"),
                    "off": pd.Series([], dtype="int64"),
                }
            )
        bases = ray.get(bases_ref) if not isinstance(bases_ref, dict) else bases_ref
        src, ids, ntok, off, _, _ = _group_offsets(g, bases)
        bkt = int(g["bkt"].iloc[0])
        # rows already (source, doc_id)-lexsorted: partition files carry the
        # lookup order directly
        return pd.DataFrame(
            {"bkt": np.full(len(ids), bkt), "source": src, "doc_id": ids,
             "off": off}
        )

    return fn


class _PieceEmitStage:
    """MAP-ONLY piece emission (actor pool): look each doc's global offset
    up in the bkt-partitioned offset sidecar (tiny parquet, cached per
    actor) and cut the batch's own flat token stream at sequence
    boundaries — the token payload is never shuffled to learn its offsets;
    the only payload movement left is the final assemble-by-sequence
    reorder, which no packing implementation can avoid."""

    def __init__(self, bounds: np.ndarray, off_dir: str, seq_len: int = SEQ_LEN):
        self.bounds = bounds  # KB-sized cut points: shipped once per actor
        self.off_dir = off_dir
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.seq_len = seq_len

    def _partition(self, bkt: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        part = self.cache.get(bkt)
        if part is None:
            if len(self.cache) > 64:  # ~1-2 MB each: bound actor heap
                self.cache.clear()
            t = pq.read_table(os.path.join(self.off_dir, f"bkt={bkt}"))
            src = t["source"].to_numpy(zero_copy_only=False)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            off = t["off"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.lexsort((ids, src))  # multi-file partitions
            part = self.cache[bkt] = (src[o], ids[o], off[o])
        return part

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PIECE_SCHEMA.empty_table()
        from tokenzip.chunk import _tokens_parts

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        lengths, flat = _tokens_parts(batch["tokens"])
        ntok = lengths.astype(np.int64)
        # the sidecar offsets were computed from the n_tok COLUMN; the piece
        # geometry below uses the actual list lengths — a disagreement would
        # emit overlapping/gapped pieces silently, so fail at the source
        ntok_col = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not np.array_equal(ntok, ntok_col):
            bad = int(np.flatnonzero(ntok != ntok_col)[0])
            raise ValueError(
                f"n_tok column disagrees with tokens list length at "
                f"doc_id={ids[bad]!r}: {ntok_col[bad]} != {ntok[bad]}"
            )
        bkts = _bucket_of(ids, self.bounds)
        off = np.empty(len(ids), np.int64)
        for b in np.unique(bkts):
            psrc, pids, poff = self._partition(int(b))
            m = bkts == b
            bsrc, bids = src[m], ids[m]
            idx = np.empty(int(m.sum()), np.int64)
            # lookup keyed by (source, doc_id): one searchsorted per source
            # run of the (src, id)-lexsorted partition
            for s in np.unique(bsrc):
                lo = np.searchsorted(psrc, s, side="left")
                hi = np.searchsorted(psrc, s, side="right")
                sm = bsrc == s
                j = lo + np.searchsorted(pids[lo:hi], bids[sm])
                if (j >= hi).any() or not (pids[j] == bids[sm]).all():
                    raise KeyError("(source, doc_id) missing from offset sidecar")
                idx[sm] = j
            off[m] = poff[idx]
        L = self.seq_len
        # per-doc piece counts -> flat piece table, fully vectorized
        last = off + np.maximum(ntok, 1) - 1
        n_pieces = np.where(ntok > 0, last // L - off // L + 1, 0)
        tp = int(n_pieces.sum())
        if tp == 0:
            return _PIECE_SCHEMA.empty_table()
        doc_of_p = np.repeat(np.arange(len(ids)), n_pieces)
        p_rank = np.arange(tp) - np.repeat(
            np.cumsum(n_pieces) - n_pieces, n_pieces
        )
        # global start of piece k of doc d: off[d] for k=0, else the k-th
        # seq boundary after off[d]
        gstart = np.where(
            p_rank == 0,
            off[doc_of_p],
            (off[doc_of_p] // L + p_rank) * L,
        )
        doc_end = (off + ntok)[doc_of_p]
        gend = np.minimum((gstart // L + 1) * L, doc_end)
        flen = gend - gstart
        offsets = np.zeros(tp + 1, np.int64)
        np.cumsum(flen, out=offsets[1:])
        # pieces tile the batch's flat token stream exactly in order (every
        # token of every doc lands in exactly one piece, docs and their
        # pieces both contiguous), so the list values ARE flat — zero-copy
        pieces = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat, pa.int32())
        )
        return pa.table(
            {
                "source": pa.array(src[doc_of_p], pa.string()),
                "seq_id": pa.array(gstart // L, pa.int64()),
                "pos": pa.array(gstart % L, pa.int64()),
                "piece": pieces,
            },
            schema=_PIECE_SCHEMA,
        )


_SEQ_SCHEMA = pa.schema(
    [("source", pa.string()), ("seq_id", pa.int64()), ("tokens", pa.list_(pa.int32()))]
)


def _assemble_group(seq_len: int, totals_ref):
    """groupby(seq bucket): gather pieces into (source, seq_id, pos) order —
    each complete sequence is then a contiguous seq_len slice of the flat
    stream — and drop trailing partial sequences (the stream tail),
    matching total_tokens // seq_len. Fully vectorized: one lexsort, one
    Arrow take, one boolean repeat."""

    def fn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _SEQ_SCHEMA.empty_table()
        from tokenzip.chunk import _tokens_parts

        totals = (
            ray.get(totals_ref) if not isinstance(totals_ref, dict) else totals_ref
        )["totals"]
        src = g["source"].to_numpy(zero_copy_only=False)
        sid = g["seq_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = g["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, sid, src))
        g = g.take(pa.array(order))
        src, sid = src[order], sid[order]
        lengths, flat = _tokens_parts(g["piece"])
        starts = np.flatnonzero(
            np.r_[True, (src[1:] != src[:-1]) | (sid[1:] != sid[:-1])]
        )
        ends = np.r_[starts[1:], len(src)]
        run_src, run_sid = src[starts], sid[starts]
        tot = np.array([totals.get(s, 0) for s in run_src], dtype=np.int64)
        keep = (run_sid + 1) * seq_len <= tot
        csum = np.zeros(len(lengths) + 1, np.int64)
        np.cumsum(lengths, out=csum[1:])
        run_tok = csum[ends] - csum[starts]
        if keep.any() and not (run_tok[keep] == seq_len).all():
            raise AssertionError("incomplete kept sequence — packing bug")
        flat_keep = flat[np.repeat(keep, run_tok)]
        nk = int(keep.sum())
        if nk * seq_len >= (1 << 31):  # output schema is list<int32>
            raise AssertionError(
                "assemble group exceeds int32 list offsets — raise nb2"
            )
        toks = pa.ListArray.from_arrays(
            pa.array(np.arange(nk + 1, dtype=np.int64) * seq_len, pa.int32()),
            pa.array(flat_keep, pa.int32()),
        )
        return pa.table(
            {
                "source": pa.array(run_src[keep], pa.string()),
                "seq_id": pa.array(run_sid[keep], pa.int64()),
                "tokens": toks,
            },
            schema=_SEQ_SCHEMA,
        )

    return fn


def pack_sequences(
    sf_dir: str, seq_len: int = SEQ_LEN, workdir: str | None = None
) -> "ray.data.Dataset":
    """Emit the packed training sequences themselves: Dataset of
    (source, seq_id:int64, tokens:list<int32> of exactly seq_len).
    Composable with compress() — pack then encode the packed table.

    The token payload moves through exactly ONE shuffle (the final
    assemble-by-sequence reorder, inherent to packing): per-doc offsets
    come from the id-only prefix scan, written as a bkt-partitioned
    parquet sidecar (~20 B/doc) that the map-only piece-emit actors look
    up with a per-actor partition cache — for doc_id-clustered shards
    (the common layout) each actor touches a handful of partitions."""
    import shutil
    import tempfile

    paths = _token_paths(sf_dir)
    nb = _n_range_buckets(_n_docs(paths))
    bounds = _sample_bounds(paths, nb)
    scan = _bucket_bases(paths, bounds)
    ref = ray.put(scan) if ray.is_initialized() else scan

    def tag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column("bkt", pa.array(_bucket_of(ids, bounds)))

    # the sidecar must outlive this call (the returned Dataset is lazy and
    # the emit actors read it at execution time) — scratch lives under one
    # parent so runs are discoverable/cleanable; pass workdir to control
    # (and clean) it — callers that consume the Dataset eagerly (e.g.
    # q_pack_emit_by_source) rmtree their workdir afterwards
    if workdir:
        # workdir may be a scheme:// URI (multi-node storage contract,
        # tokenzip/uio.py) — the offset sidecar and its cleanup go through
        # Arrow filesystems either way
        from tokenzip import uio

        off_dir = workdir
        uio.rmtree(off_dir)
    else:
        parent = "/tmp/tokenzip_pack"
        os.makedirs(parent, exist_ok=True)
        off_dir = tempfile.mkdtemp(prefix="off_", dir=parent)
    (
        _ids_dataset(paths)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_offsets_group(ref), batch_format="pandas")
        .write_parquet(off_dir, partition_cols=["bkt"])
    )

    from tokenzip.pipeline import _default_concurrency

    pieces = ray.data.read_parquet(paths).map_batches(
        _PieceEmitStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_default_concurrency(),
        fn_constructor_kwargs={
            "bounds": bounds,
            "off_dir": off_dir,
            "seq_len": seq_len,
        },
    )
    # second shuffle: co-locate a sequence's pieces. Hash-bucket (source,
    # seq-id-block) so the group count is bounded and even regardless of
    # corpus size (a sequence has at most 2 + seq_len/min_doc pieces,
    # typically ~2). crc32, not hash(): Python's hash is per-process salted.
    import zlib

    # scale the assemble-group count with the corpus so one group's flat
    # stream stays ~50M tokens (bounded task memory, and far below the
    # int32 list-offset ceiling of the output schema)
    total_tokens = sum(scan["totals"].values())
    nb2 = max(64, 8 * _cpus(), total_tokens // 50_000_000)

    def seq_tag(b: pa.Table) -> pa.Table:
        sid = b["seq_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = b["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        salt = np.array([zlib.crc32(s.encode()) for s in uniq], dtype=np.int64)
        return b.append_column("sbkt", pa.array((sid // 4 + salt[inv]) % nb2))

    return (
        pieces.map_batches(seq_tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sbkt")
        .map_groups(_assemble_group(seq_len, ref), batch_format="pyarrow")
    )


class _EmitChkStage:
    """Per-batch partials over EMITTED sequences: per source, the sequence
    count and a checksum binding every sequence's id to the zigzag-sum of
    its exact token content — the oracle recomputes both from the raw
    corpus with window arithmetic, so a single misplaced token anywhere in
    the packed stream flips the hash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts
        from tokenzip.codecs.varint import zigzag_encode

        lengths, flat = _tokens_parts(batch["tokens"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        sid = batch["seq_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        zz = zigzag_encode(flat, 32).astype(np.int64)
        zcs = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(zz, out=zcs[1:])
        row_off = np.zeros(len(lengths) + 1, np.int64)
        np.cumsum(lengths, out=row_off[1:])
        zzsum = zcs[row_off[1:]] - zcs[row_off[:-1]]
        term = ((sid % _PAIR_MOD) * _PAIR_K + zzsum % _PAIR_MOD) % _PAIR_MOD
        df = pd.DataFrame({"source": src, "n": 1, "chk": term})
        agg = df.groupby("source", as_index=False).agg(
            n_sequences=("n", "sum"), chk=("chk", "sum")
        )
        agg["chk"] %= _PAIR_MOD
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_pack_emit_by_source(sf_dir: str, seq_len: int = SEQ_LEN) -> pd.DataFrame:
    """Run the FULL packing emit path and checksum the emitted sequences —
    the end-to-end differential for pack_sequences (stats-only geometry
    can't catch a token landing in the wrong sequence)."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="off_emitq_", dir="/tmp")
    try:
        seqs = pack_sequences(sf_dir, seq_len=seq_len, workdir=workdir)
        agg = (
            seqs.map_batches(
                _EmitChkStage(), batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("source")
            .aggregate(
                Sum("n_sequences", alias_name="n_sequences"),
                Sum("chk", alias_name="chk"),
            )
            .to_pandas()
        )
    finally:
        # the aggregate above consumed the Dataset, so the sidecar is done
        shutil.rmtree(workdir, ignore_errors=True)
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_sequences": agg["n_sequences"].astype("int64"),
            "emit_checksum": (agg["chk"] % _PAIR_MOD).astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def pack_emit_sql(glob: str, seq_len: int = SEQ_LEN) -> str:
    zz = "CASE WHEN ut >= 0 THEN 2*CAST(ut AS BIGINT) ELSE -2*CAST(ut AS BIGINT)-1 END"
    return f"""
WITH d AS (
  SELECT source, tokens,
         COALESCE(SUM(CAST(n_tok AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM read_parquet('{glob}')
),
tot AS (SELECT source, SUM(CAST(n_tok AS BIGINT)) AS t
        FROM read_parquet('{glob}') GROUP BY source),
u AS (SELECT source, off + ui AS p, {zz} AS zt
      FROM (SELECT source, off, unnest(tokens) AS ut,
                   unnest(range(len(tokens))) AS ui
            FROM d)),
s AS (SELECT source, p // {seq_len} AS seq, SUM(zt) AS zzsum
      FROM u GROUP BY source, p // {seq_len}),
k AS (SELECT s.source, seq, zzsum FROM s JOIN tot ON s.source = tot.source
      WHERE (seq + 1) * {seq_len} <= t)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sequences,
       CAST(SUM(((seq % {_PAIR_MOD}) * {_PAIR_K} + zzsum % {_PAIR_MOD})
                % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS emit_checksum
FROM k GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Vocabulary statistics: global token-frequency top-k
# ---------------------------------------------------------------------------

_VOCAB_NB = 512  # hash buckets over token space: bounded group count


class _VocabPartialStage:
    """Per-batch (bucket, token, cnt) partials via one np.unique over the
    batch's flat token values — vocabulary-sized output per batch, never
    token-sized."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        _, values = _tokens_parts(batch["tokens"])
        if not len(values):
            return pa.table(
                {
                    "bkt": pa.array([], pa.int64()),
                    "token": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        uniq, cnt = np.unique(values.astype(np.int64), return_counts=True)
        return pa.table(
            {
                "bkt": pa.array(uniq % _VOCAB_NB),
                "token": pa.array(uniq),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )


def _vocab_topk_group(k: int):
    """groupby(bkt): exact per-token totals inside the bucket, keep the
    bucket-local top-k — a superset of the bucket's global-top-k members."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        agg = g.groupby("token", as_index=False)["cnt"].sum()
        agg = agg.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
        return agg[["token", "cnt"]].astype("int64")

    return fn


def q_vocab_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global top-k token frequencies (ties broken by smaller token id) —
    the vocabulary audit a tokenizer/pretraining run starts with."""
    paths = _token_paths(sf_dir)
    parts = (
        ray.data.read_parquet(paths, columns=["tokens"])
        .map_batches(
            _VocabPartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bkt")
        .map_groups(_vocab_topk_group(k), batch_format="pandas")
        .to_pandas()
    )
    out = parts.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"token": "int64", "cnt": "int64"})


def vocab_topk_sql(glob: str, k: int = 20) -> str:
    return f"""
SELECT CAST(t AS BIGINT) AS token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(tokens) AS t FROM read_parquet('{glob}'))
GROUP BY 1 ORDER BY cnt DESC, token ASC LIMIT {k}
"""


_DIGIT_BOUNDS = np.array([10**d for d in range(1, 19)], dtype=np.int64)


def _freq_hist_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(bkt): exact per-token totals inside the bucket, folded into
    decimal-digit frequency classes (integer comparisons only — never a
    float log on either engine)."""
    if not len(g):
        return pd.DataFrame(
            {
                "n_digits": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "n_occurrences": pd.Series([], dtype="int64"),
            }
        )
    agg = g.groupby("token", as_index=False)["cnt"].sum()
    cnt = agg["cnt"].to_numpy(np.int64)
    digits = np.searchsorted(_DIGIT_BOUNDS, cnt, side="right") + 1
    ud, dinv = np.unique(digits, return_inverse=True)
    return pd.DataFrame(
        {
            "n_digits": ud.astype("int64"),
            "n_tokens": np.bincount(dinv).astype("int64"),
            "n_occurrences": np.bincount(dinv, weights=cnt).astype("int64"),
        }
    )


def q_token_freq_histogram(sf_dir: str) -> pd.DataFrame:
    """Frequency-of-frequencies: how many distinct tokens occur with a
    1-digit / 2-digit / ... total count (the Zipf-shape audit behind vocab
    sizing and rank-codec dictionary budgets). Vocabulary-sized partials,
    one bounded bucket shuffle, then an ~18-row groupby."""
    paths = _token_paths(sf_dir)
    out = (
        ray.data.read_parquet(paths, columns=["tokens"])
        .map_batches(
            _VocabPartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bkt")
        .map_groups(_freq_hist_group, batch_format="pandas")
        .groupby("n_digits")
        .sum(["n_tokens", "n_occurrences"])
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "n_digits": out["n_digits"].astype("int64"),
            "n_tokens": out["sum(n_tokens)"].astype("int64"),
            "n_occurrences": out["sum(n_occurrences)"].astype("int64"),
        }
    )
    return out.sort_values("n_digits").reset_index(drop=True)


def token_freq_histogram_sql(glob: str) -> str:
    return f"""
WITH c AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY t
)
SELECT CAST(length(CAST(cnt AS VARCHAR)) AS BIGINT) AS n_digits,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt) AS BIGINT) AS n_occurrences
FROM c GROUP BY 1 ORDER BY 1
"""


class _SourceTokenPartialStage:
    """Per-batch (bkt, source, token, cnt) partials — one composite
    np.unique over (source index × token), output bounded by the batch's
    (sources × distinct tokens), never token-sized."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if not len(values):
            return empty
        srcs = np.asarray(batch["source"].to_pylist(), dtype=object)
        us, sinv = np.unique(srcs, return_inverse=True)
        per_tok_src = np.repeat(sinv.astype(np.int64), lengths)
        # bias to non-negative before packing: token ids are SIGNED (the
        # corpus exercises the zigzag codecs), modulo decode needs >= 0
        vals = values.astype(np.int64)
        vmin = int(vals.min())
        m = int(vals.max()) - vmin + 1
        code = per_tok_src * m + (vals - vmin)
        uc, cnt = np.unique(code, return_counts=True)
        tok = uc % m + vmin
        si = uc // m
        return pa.table(
            {
                "bkt": pa.array(tok % _VOCAB_NB),
                "source": pa.array([str(s) for s in us[si]], pa.string()),
                "token": pa.array(tok),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )


def _mode_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(bkt): exact per-(source, token) totals inside the bucket
    (token determines bucket, so totals are globally exact), then the
    bucket-local per-source winner (max cnt, ties to the smaller token)."""
    if not len(g):
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "token": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64"),
            }
        )
    agg = g.groupby(["source", "token"], as_index=False)["cnt"].sum()
    agg = agg.sort_values(["cnt", "token"], ascending=[False, True], kind="stable")
    win = agg.groupby("source", as_index=False).head(1)
    return win[["source", "token", "cnt"]]


def q_top_token_by_source(sf_dir: str) -> pd.DataFrame:
    """Grouped mode: the most frequent token per source (ties to the
    smaller token id) with its exact count. Per-batch composite partials,
    one token-hash-bucketed shuffle, bucket-local winners (one row per
    (source, bucket)), final argmax over that bounded set driver-side."""
    paths = _token_paths(sf_dir)
    parts = (
        ray.data.read_parquet(paths, columns=["tokens", "source"])
        .map_batches(
            _SourceTokenPartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bkt")
        .map_groups(_mode_group, batch_format="pandas")
        .to_pandas()
    )
    parts = parts.sort_values(["cnt", "token"], ascending=[False, True], kind="stable")
    win = parts.groupby("source", as_index=False).head(1)
    out = win.sort_values("source").reset_index(drop=True)
    return pd.DataFrame(
        {
            "source": out["source"].astype(str),
            "token": out["token"].astype("int64"),
            "cnt": out["cnt"].astype("int64"),
        }
    )


def top_token_by_source_sql(glob: str) -> str:
    return f"""
WITH c AS (
  SELECT source, CAST(t AS BIGINT) AS token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY 1, 2
),
r AS (
  SELECT source, token, cnt,
         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token ASC) AS rn
  FROM c
)
SELECT source, token, cnt FROM r WHERE rn = 1 ORDER BY source
"""


# ---------------------------------------------------------------------------
# Heavy hitters via Misra-Gries partials: certified-EXACT top-k with
# shuffle volume bounded by the sketch capacity, not the vocabulary.
#
# q_vocab_topk's partials are vocabulary-sized per batch (fine for token
# vocabularies, which are bounded); this is the scale path for unbounded
# key domains (n-grams, URLs, doc fingerprints): each batch emits at most
# MG_CAP surviving (token, lower-bound count) rows plus its decrement
# mass. Merged lower bounds L(t) = sum of survivors' counts and the global
# decrement Delta = sum of per-batch decrements satisfy
#     L(t) <= true(t) <= L(t) + Delta          (Misra-Gries 1982;
# mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
# Candidates = {t : L(t) >= L_k - Delta} (L_k = k-th largest lower bound)
# are then recounted EXACTLY in a second pass against a broadcast
# candidate set. If Delta < L_k the result is certified identical to the
# exact top-k (any excluded token's true count < L_k <= the k-th exact
# candidate count); otherwise the sketch capacity was too small for the
# skew and we raise rather than return an uncertified answer.
# ---------------------------------------------------------------------------

MG_CAP = 4096  # per-batch summary capacity (m)


def _mg_keys_tokens(batch: pa.Table) -> np.ndarray:
    """Key extractor: the flat token values (vocabulary heavy hitters)."""
    from tokenzip.chunk import _tokens_parts

    _, values = _tokens_parts(batch["tokens"])
    return values.astype(np.int64)


def _mg_keys_bigrams(batch: pa.Table) -> np.ndarray:
    """Key extractor: consecutive within-doc token pairs packed injectively
    into one int64 key ((uint32(t1) << 32) | uint32(t2)) — an UNBOUNDED key
    domain (vocab^2), the case the MG path exists for."""
    from tokenzip.chunk import _tokens_parts

    lengths, values = _tokens_parts(batch["tokens"])
    if len(values) < 2:
        return np.empty(0, dtype=np.int64)
    a = values[:-1].astype(np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    b = values[1:].astype(np.int64).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    keys = ((a << np.uint64(32)) | b).view(np.int64)
    valid = np.ones(len(keys), dtype=bool)
    ends = np.cumsum(lengths.astype(np.int64))[:-1] - 1  # pairs crossing docs
    ends = ends[(ends >= 0) & (ends < len(keys))]
    valid[ends] = False
    return keys[valid]


def _mg_keys_doc_distinct(batch: pa.Table) -> np.ndarray:
    """Key extractor: each doc's DISTINCT tokens (document-frequency heavy
    hitters — the IDF building block). A row is one whole document, so
    within-batch dedup by (row, token) is globally correct."""
    from tokenzip.chunk import _tokens_parts

    lengths, values = _tokens_parts(batch["tokens"])
    if not len(values):
        return np.empty(0, dtype=np.int64)
    row = np.repeat(
        np.arange(len(lengths), dtype=np.int64), lengths.astype(np.int64)
    )
    # unique (row, token) pairs; tokens are int32 so the packing is injective
    packed = (row << np.int64(32)) | (values.astype(np.int64) & np.int64(0xFFFFFFFF))
    uniq = np.unique(packed)
    t = (uniq & np.int64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    return t.astype(np.int64)


def _mg_unpack_bigram(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ku = keys.astype(np.int64).view(np.uint64)
    t1 = (ku >> np.uint64(32)).astype(np.uint32).view(np.int32).astype(np.int64)
    t2 = (ku & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
    return t1, t2


class _VocabMGPartialStage:
    """Per-batch Misra-Gries summary: exact batch key counts (one np.unique
    over the extracted keys) compressed to <= cap survivors by subtracting
    the (cap+1)-th largest count. Emits survivor rows (kind=0) and one
    decrement row (kind=1, cnt=the batch's decrement delta)."""

    def __init__(self, cap: int = MG_CAP, keys_fn=None):
        self.cap = cap
        self.keys_fn = keys_fn or _mg_keys_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        values = self.keys_fn(batch)
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "token": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int64()),
            }
        )
        if not len(values):
            return empty
        uniq, cnt = np.unique(values, return_counts=True)
        cnt = cnt.astype(np.int64)
        if len(uniq) > self.cap:
            # delta = (cap+1)-th largest count; survivors keep cnt - delta > 0
            delta = int(np.partition(cnt, len(cnt) - self.cap - 1)[
                len(cnt) - self.cap - 1
            ])
            keep = cnt > delta
            uniq, cnt = uniq[keep], cnt[keep] - delta
        else:
            delta = 0
        tok = np.concatenate([uniq, [0]])
        out_cnt = np.concatenate([cnt, [delta]])
        kind = np.zeros(len(tok), dtype=np.int64)
        kind[-1] = 1
        return pa.table(
            {
                "bkt": pa.array(tok % _VOCAB_NB),
                "token": pa.array(tok),
                "cnt": pa.array(out_cnt),
                "kind": pa.array(kind),
            }
        )


def _mg_candidate_group(k: int, delta_total: int):
    """groupby(bkt): per-token merged lower bounds, pruned to the bucket-safe
    candidate superset {t : L(t) >= bucket_L_k - Delta} (the global k-th
    largest lower bound is >= any bucket's, so this keeps a superset of the
    global candidate set)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["kind"] == 0]
        if not len(g):
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype="int64"),
                    "lb": pd.Series([], dtype="int64"),
                }
            )
        agg = g.groupby("token", as_index=False)["cnt"].sum()
        agg = agg.rename(columns={"cnt": "lb"})
        lks = np.sort(agg["lb"].to_numpy())[::-1]
        local_lk = int(lks[min(k, len(lks)) - 1])
        return agg[agg["lb"] >= local_lk - delta_total].astype("int64")

    return fn


class _CandidateCountStage:
    """Pass 2: exact per-batch counts restricted to the broadcast candidate
    key set (sorted array in the object store, read once per actor)."""

    def __init__(self, cand_ref, keys_fn=None):
        self.cand = ray.get(cand_ref)  # sorted int64 array
        self.keys_fn = keys_fn or _mg_keys_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        values = self.keys_fn(batch)
        if not len(values) or not len(self.cand):
            return pa.table(
                {"token": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        # membership directly on the raw stream — no per-batch sort: the
        # candidate array is already sorted, so this is O(n log |cand|)
        # instead of np.unique's O(n log n)
        pos = np.searchsorted(self.cand, values)
        pos[pos == len(self.cand)] = 0
        hit = self.cand[pos] == values
        counts = np.bincount(pos[hit], minlength=len(self.cand)).astype(np.int64)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "token": pa.array(self.cand[nz]),
                "cnt": pa.array(counts[nz]),
            }
        )


class MGCertificationError(RuntimeError):
    """The sketch capacity was too small for the corpus skew: the global
    decrement mass reached the k-th lower bound, so exactness cannot be
    certified. Raise capacity or fall back to q_vocab_topk."""


def _mg_candidate_counts(
    paths: list[str], keys_fn, k: int, cap: int
) -> pd.DataFrame:
    """Shared MG core: returns the EXACT counts of the certified candidate
    superset (columns token, cnt) — guaranteed to contain every member of
    the true top-k, with every non-candidate's true count strictly below
    the k-th candidate count. Raises MGCertificationError when the cap was
    too small for the skew."""
    partials = (
        ray.data.read_parquet(paths, columns=["tokens"])
        .map_batches(
            _VocabMGPartialStage(cap, keys_fn),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()  # bounded: <= cap+1 rows per batch
    )
    delta_total = int(partials.filter(expr="kind == 1").sum("cnt") or 0)
    cands = (
        partials.groupby("bkt")
        .map_groups(_mg_candidate_group(k, delta_total), batch_format="pandas")
        .to_pandas()
    )
    lbs = np.sort(cands["lb"].to_numpy())[::-1]
    if not len(lbs):
        return pd.DataFrame(
            {"token": pd.Series([], dtype="int64"), "cnt": pd.Series([], dtype="int64")}
        )
    l_k = int(lbs[min(k, len(lbs)) - 1])
    if delta_total >= l_k:
        raise MGCertificationError(
            f"decrement mass {delta_total} >= k-th lower bound {l_k}; "
            f"raise cap (={cap}) or use the exact path"
        )
    cand_keys = np.sort(
        cands.loc[cands["lb"] >= l_k - delta_total, "token"].to_numpy(np.int64)
    )
    cand_ref = ray.put(cand_keys)
    return (
        ray.data.read_parquet(paths, columns=["tokens"])
        .map_batches(
            _CandidateCountStage,
            fn_constructor_args=(cand_ref, keys_fn),
            concurrency=(1, 8),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )


def q_vocab_topk_mg(sf_dir: str, k: int = 20, cap: int = MG_CAP) -> pd.DataFrame:
    """Certified-exact global top-k token frequencies via Misra-Gries
    partials + candidate recount. Same result (and oracle) as q_vocab_topk;
    shuffle volume is O(cap) per batch instead of O(vocab)."""
    exact = _mg_candidate_counts(_token_paths(sf_dir), _mg_keys_tokens, k, cap)
    out = exact.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"token": "int64", "cnt": "int64"})


def q_bigram_topk_mg(sf_dir: str, k: int = 20, cap: int = MG_CAP) -> pd.DataFrame:
    """Certified-exact global top-k BIGRAM frequencies (consecutive
    within-doc token pairs) — the key domain is vocab^2, genuinely
    unbounded, where the vocab-sized-partial design of q_vocab_topk would
    shuffle the full bigram table; MG bounds every batch at cap rows."""
    exact = _mg_candidate_counts(_token_paths(sf_dir), _mg_keys_bigrams, k, cap)
    if not len(exact):
        return pd.DataFrame(
            {
                "t1": pd.Series([], dtype="int64"),
                "t2": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64"),
            }
        )
    t1, t2 = _mg_unpack_bigram(exact["token"].to_numpy(np.int64))
    out = pd.DataFrame({"t1": t1, "t2": t2, "cnt": exact["cnt"].astype("int64")})
    out = out.sort_values(["cnt", "t1", "t2"], ascending=[False, True, True]).head(k)
    return out.reset_index(drop=True).astype("int64")


def q_df_topk_mg(sf_dir: str, k: int = 20, cap: int = MG_CAP) -> pd.DataFrame:
    """Certified-exact top-k tokens by DOCUMENT frequency (number of docs
    containing the token) — the IDF/stopword audit. Rides the MG core with
    a within-doc-distinct key stream; the count of a key is then exactly
    its document frequency."""
    exact = _mg_candidate_counts(_token_paths(sf_dir), _mg_keys_doc_distinct, k, cap)
    out = exact.rename(columns={"cnt": "df"})
    out = out.sort_values(["df", "token"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"token": "int64", "df": "int64"})


def df_topk_sql(glob: str, k: int = 20) -> str:
    return f"""
SELECT CAST(t AS BIGINT) AS token, CAST(COUNT(*) AS BIGINT) AS df
FROM (SELECT DISTINCT doc_id, unnest(tokens) AS t FROM read_parquet('{glob}'))
GROUP BY 1 ORDER BY df DESC, token ASC LIMIT {k}
"""


def bigram_topk_sql(glob: str, k: int = 20) -> str:
    return f"""
WITH u AS (
  SELECT doc_id, unnest(tokens) AS ut, unnest(range(len(tokens))) AS ui
  FROM read_parquet('{glob}')
),
b AS (
  SELECT lag(ut) OVER (PARTITION BY doc_id ORDER BY ui) AS t1, ut AS t2
  FROM u
)
SELECT CAST(t1 AS BIGINT) AS t1, CAST(t2 AS BIGINT) AS t2,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM b WHERE t1 IS NOT NULL
GROUP BY 1, 2 ORDER BY cnt DESC, t1 ASC, t2 ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Mixture sampling: down-weight sources to configured ratios
# ---------------------------------------------------------------------------

# pretraining-mix weights: P(keep doc | source). Deterministic per doc via
# the salted md5 rule below — stable under re-sharding/retries/resume, and
# independent of the train/val split hash (different salt)
MIX_WEIGHTS = {"web": 0.5, "code": 1.0, "books": 0.8, "wiki": 1.0, "synth": 0.1}
_MIX_DEN = 1_000_000


def _mix_hash(doc_id: str) -> int:
    return int(hashlib.md5(("mix:" + doc_id).encode()).hexdigest()[:15], 16)


class _MixturePartialStage:
    """Per-batch (source, n_docs, n_sampled, sum_tokens, sum_tokens_sampled)
    partials under the md5 mixture rule."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.hashutil import md5_hi60_str

        ntok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_numpy(zero_copy_only=False)
        # one C md5 pass over the column's flat UTF-8 buffer — the md5 rule
        # is oracle-pinned, only WHERE it runs changed (was a per-row loop)
        hv = md5_hi60_str(batch["doc_id"], b"mix:")
        thr = np.array(
            [int(MIX_WEIGHTS.get(s, 1.0) * _MIX_DEN) for s in src], dtype=np.int64
        )
        keep = (hv % _MIX_DEN) < thr
        df = pd.DataFrame(
            {
                "source": src,
                "n": np.ones(len(hv), np.int64),
                "k": keep.astype(np.int64),
                "tok": ntok,
                "ktok": np.where(keep, ntok, 0),
            }
        )
        agg = df.groupby("source", as_index=False).agg(
            n_docs=("n", "sum"),
            n_sampled=("k", "sum"),
            sum_tokens=("tok", "sum"),
            sum_tokens_sampled=("ktok", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_mixture_sample_stats(sf_dir: str) -> pd.DataFrame:
    """Data-mixing budget sheet: per source, docs/tokens surviving the
    configured mixture weights under the deterministic md5 rule — the
    sampling step between raw corpus and the training mix."""
    paths = _token_paths(sf_dir)
    agg = (
        _ids_dataset(paths)
        .map_batches(
            _MixturePartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_sampled", alias_name="n_sampled"),
            Sum("sum_tokens", alias_name="sum_tokens"),
            Sum("sum_tokens_sampled", alias_name="sum_tokens_sampled"),
        )
        .to_pandas()
    )
    out = agg.astype(
        {
            "n_docs": "int64",
            "n_sampled": "int64",
            "sum_tokens": "int64",
            "sum_tokens_sampled": "int64",
        }
    )
    out["source"] = out["source"].astype(str)
    return (
        out[["source", "n_docs", "n_sampled", "sum_tokens", "sum_tokens_sampled"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def mixture_sample_sql(glob: str) -> str:
    nib = lambda i: f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
    hv = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    thr = " ".join(
        f"WHEN source = '{s}' THEN {int(w * _MIX_DEN)}"
        for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"""
WITH h AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
         md5('mix:' || doc_id) AS m
  FROM read_parquet('{glob}')
),
x AS (SELECT source, n_tok, {hv} AS hv,
             CASE {thr} ELSE {_MIX_DEN} END AS thr
      FROM h)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN hv % {_MIX_DEN} < thr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       CAST(SUM(CASE WHEN hv % {_MIX_DEN} < thr THEN n_tok ELSE 0 END) AS BIGINT)
         AS sum_tokens_sampled
FROM x GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Uniform fixed-size sample: deterministic distributed bottom-k by hash
# ---------------------------------------------------------------------------

# Bernoulli mixture sampling (above) yields a RANDOM-SIZE sample; eval-set
# carving wants an EXACT-size uniform sample. Bottom-k by a salted md5 of
# doc_id is the classic distributed answer: each batch keeps its local k
# smallest hashes (tiny partial rows), one sources-sized groupby keeps the
# global k — no full sort, no full shuffle, deterministic under
# re-sharding / retries / resume (same salt-hash contract as the split and
# mixture rules; salt "smp:" keeps all three rules independent).
SAMPLE_K = 64
_SMP_MOD = 10**12  # checksum modulus: 64 * 10^12 < 2^63, overflow-free


def _smp_digest(doc_id: str) -> str:
    return hashlib.md5(("smp:" + doc_id).encode()).hexdigest()


class _BottomKPartialStage:
    """Per-batch per-source local bottom-k rows (source, m, n_tok)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.hashutil import md5_hex_str

        df = pd.DataFrame(
            {
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "m": md5_hex_str(batch["doc_id"], b"smp:"),
                "n_tok": batch["n_tok"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        part = (
            df.sort_values(["source", "m"])
            .groupby("source", sort=False)
            .head(SAMPLE_K)
        )
        return pa.Table.from_pandas(part, preserve_index=False)


def _bottomk_final_group(df: pd.DataFrame) -> pd.DataFrame:
    kept = df.sort_values("m").head(SAMPLE_K)
    hv = np.array([int(m[:15], 16) % _SMP_MOD for m in kept["m"]], dtype=np.int64)
    return pd.DataFrame(
        {
            "source": [df["source"].iloc[0]],
            "n_kept": [len(kept)],
            "sum_kept_tok": [int(kept["n_tok"].sum())],
            "hash_sum": [int(hv.sum())],
        }
    )


def q_sample_bottomk_by_source(sf_dir: str) -> pd.DataFrame:
    """Exact-size uniform sample audit: per source the SAMPLE_K docs with
    the smallest salted-md5 hashes, reported as (n_kept, token mass, and a
    content checksum over the kept hash values)."""
    paths = _token_paths(sf_dir)
    out = (
        _ids_dataset(paths)
        .map_batches(
            _BottomKPartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("source")
        .map_groups(_bottomk_final_group, batch_format="pandas")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["source"] = out["source"].astype(str)
    return out.astype(
        {"n_kept": "int64", "sum_kept_tok": "int64", "hash_sum": "int64"}
    )


def sample_bottomk_sql(glob: str) -> str:
    nib = lambda i: f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
    hv = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    return f"""
WITH h AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
         md5('smp:' || doc_id) AS m
  FROM read_parquet('{glob}')
),
k AS (
  SELECT * FROM h
  QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY m) <= {SAMPLE_K}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tok) AS BIGINT) AS sum_kept_tok,
       CAST(SUM(({hv}) % {_SMP_MOD}) AS BIGINT) AS hash_sum
FROM k GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Decontamination: n-gram overlap of training docs vs a benchmark set
# ---------------------------------------------------------------------------


def q_decontamination_by_source(sf_dir: str) -> pd.DataFrame:
    """Benchmark-decontamination audit over the `documents` table: eval set
    = docs with doc_id % 100 == 0 (a stand-in benchmark); a training doc is
    contaminated when it shares any word-3-gram with any eval doc. Shape:
    the eval gram set is SMALL by definition (benchmarks are MBs), so it is
    hashed once (the vectorized 64-bit shingle hasher shared with minhash,
    analysis._shingle_hash_batch), np.unique'd, broadcast via ray.put, and
    membership-tested per batch with one searchsorted — no shuffle at all;
    partials pre-aggregate to sources-sized rows. Hash-vs-string-equality
    divergence is the same ~2^-64/gram-pair argument the minhash oracle
    documents."""
    from tokenzip.analysis import _docs, _shingle_hash_batch

    # eval grams: one bounded read of the ~1% benchmark rows (vectorized
    # batch filter, never a per-row lambda)
    def eval_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(ids % 100 == 0))

    ev = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(eval_rows, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    off, h = _shingle_hash_batch(pa.array(ev["text"], pa.string()), 3)
    ev_grams = np.unique(h)
    ev_ref = ray.put(ev_grams) if ray.is_initialized() else ev_grams

    def partial(b: pa.Table) -> pa.Table:
        grams = ray.get(ev_ref) if not isinstance(ev_ref, np.ndarray) else ev_ref
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = b["source"].to_numpy(zero_copy_only=False)
        train = (ids % 100) != 0
        off_, h_ = _shingle_hash_batch(b["text"], 3)
        if len(grams) and len(h_):
            idx = np.minimum(np.searchsorted(grams, h_), len(grams) - 1)
            hit = grams[idx] == h_
            doc_of_g = np.repeat(np.arange(len(ids)), np.diff(off_))
            n_hits = np.bincount(doc_of_g[hit], minlength=len(ids)).astype(
                np.int64
            )
        else:
            n_hits = np.zeros(len(ids), np.int64)
        df = pd.DataFrame(
            {
                "source": src[train],
                "n": np.ones(int(train.sum()), np.int64),
                "c": (n_hits[train] > 0).astype(np.int64),
                "g": n_hits[train],
            }
        )
        agg = df.groupby("source", as_index=False).agg(
            n_train_docs=("n", "sum"),
            n_contaminated=("c", "sum"),
            sum_hit_grams=("g", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    agg = (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_train_docs", alias_name="n_train_docs"),
            Sum("n_contaminated", alias_name="n_contaminated"),
            Sum("sum_hit_grams", alias_name="sum_hit_grams"),
        )
        .to_pandas()
    )
    out = agg.astype(
        {"n_train_docs": "int64", "n_contaminated": "int64", "sum_hit_grams": "int64"}
    )
    out["source"] = out["source"].astype(str)
    return (
        out[["source", "n_train_docs", "n_contaminated", "sum_hit_grams"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def decontamination_sql() -> str:
    """Same gram construction as oracles.minhash_sql (word-3-grams with the
    short-doc whole-text rule), distinct per doc."""
    return """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, source,
         unnest(list_transform(
           generate_series(1, greatest(len(ws) - 2, 1)),
           i -> CASE WHEN len(ws) >= 3
                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     ELSE array_to_string(ws, ' ') END)) AS gram
  FROM w
),
gd AS (SELECT DISTINCT doc_id, source, gram FROM g),
ev AS (SELECT DISTINCT gram FROM gd WHERE doc_id % 100 = 0),
tr AS (SELECT * FROM gd WHERE doc_id % 100 != 0),
hits AS (
  SELECT tr.doc_id, COUNT(*) AS c
  FROM tr JOIN ev ON tr.gram = ev.gram
  GROUP BY tr.doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_train_docs,
       CAST(COUNT(hits.c) AS BIGINT) AS n_contaminated,
       CAST(COALESCE(SUM(hits.c), 0) AS BIGINT) AS sum_hit_grams
FROM (SELECT doc_id, source FROM documents WHERE doc_id % 100 != 0) d
LEFT JOIN hits ON d.doc_id = hits.doc_id
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# Deterministic train/val split
# ---------------------------------------------------------------------------

_SPLIT_DEN = 20  # 1/20 -> val (5%)


class _SplitPartialStage:
    """Per-batch (source, split) partials. The split is md5(doc_id)'s first
    15 hex nibbles mod 20 — a pure row function, so identical under
    re-sharding, task retries, and resume (placement-independent, unlike
    anything derived from block or row position)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.hashutil import md5_hi60_str

        ntok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_numpy(zero_copy_only=False)
        hv = md5_hi60_str(batch["doc_id"])  # batch C md5, oracle-identical
        is_val = (hv % _SPLIT_DEN) == 0
        df = pd.DataFrame(
            {
                "source": src,
                "split": np.where(is_val, "val", "train"),
                "n": np.ones(len(hv), np.int64),
                "tok": ntok,
            }
        )
        agg = df.groupby(["source", "split"], as_index=False).agg(
            n_docs=("n", "sum"), sum_tokens=("tok", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_split_stats_by_source(sf_dir: str) -> pd.DataFrame:
    """Train/val doc and token counts per source under the deterministic
    md5 split — the budget sheet for a pretraining mix."""
    paths = _token_paths(sf_dir)
    agg = (
        _ids_dataset(paths)
        .map_batches(
            _SplitPartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["source", "split"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_tokens", alias_name="sum_tokens"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "split": agg["split"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "sum_tokens": agg["sum_tokens"].astype("int64"),
        }
    )
    return out.sort_values(["source", "split"]).reset_index(drop=True)


def split_stats_sql(glob: str) -> str:
    # identical md5-nibble arithmetic to the engine (int64-safe: 15 nibbles
    # < 2^60); same idiom as oracles.simhash_sql
    nib = lambda i: f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
    hv = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    return f"""
WITH h AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok, md5(doc_id) AS m
  FROM read_parquet('{glob}')
),
x AS (SELECT source, n_tok, {hv} AS hv FROM h)
SELECT source,
       CASE WHEN hv % {_SPLIT_DEN} = 0 THEN 'val' ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
FROM x GROUP BY source, split ORDER BY source, split
"""


# ---------------------------------------------------------------------------
# Sequence-length quantiles: exact distributed quantiles over a bounded
# domain via sparse histogram partials
# ---------------------------------------------------------------------------

# n_tok is a bounded non-negative int (the corpus caps sequences at 2^17
# tokens), so EXACT quantiles need no sampling sketch: each batch emits a
# sparse (source, n_tok, cnt) histogram, one tiny groupby sums per
# (source, n_tok) — the shuffle is bounded by sources x distinct lengths
# regardless of corpus size — and the per-source fold walks the cumulative
# histogram. This is the bounded-domain analog of the reference's static
# length-keyed lookup tables (/root/reference/src/decode/lookup.rs: index
# by a small bounded key, fold per bucket).
#
# Rank parity with SQL: the q-quantile is the value at 1-based sorted rank
# ceil(q*n), computed with INTEGER math on both sides ((9n+9)//10, not
# float CEIL(0.9*n) — 0.9*10 rounds to 9.000000000000002 in IEEE double
# and would ceil to rank 10).
SEQLEN_QUANTILES: list[tuple[str, int, int]] = [
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
]
_SEQLEN_MAX = 1 << 32  # domain guard: composite key packs n_tok in 32 bits


class _SeqLenHistStage:
    """Per-batch sparse histogram rows (source, n_tok, cnt)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        nt = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nt) and (nt.min() < 0 or nt.max() >= _SEQLEN_MAX):
            raise ValueError("n_tok outside [0, 2^32) — histogram key packs 32 bits")
        su, sinv = np.unique(src, return_inverse=True)
        comb = sinv.astype(np.int64) * _SEQLEN_MAX + nt
        u, cnt = np.unique(comb, return_counts=True)
        return pa.table(
            {
                "source": pa.array(su[u // _SEQLEN_MAX].astype(str), pa.string()),
                "n_tok": pa.array(u % _SEQLEN_MAX),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )


def _seqlen_quantile_group(df: pd.DataFrame) -> pd.DataFrame:
    """Fold one source's merged histogram into quantile rows."""
    g = df.groupby("n_tok")["cnt"].sum().sort_index()
    vals = g.index.to_numpy(np.int64)
    cum = np.cumsum(g.to_numpy(np.int64))
    n = int(cum[-1])
    out = {"source": [df["source"].iloc[0]], "n_docs": [n]}
    for name, num, den in SEQLEN_QUANTILES:
        rank = (num * n + den - 1) // den  # ceil(num*n/den), integer-exact
        out[name] = [int(vals[int(np.searchsorted(cum, rank))])]
    out["max_tok"] = [int(vals[-1])]
    return pd.DataFrame(out)


def q_seqlen_quantiles_by_source(sf_dir: str) -> pd.DataFrame:
    """Exact per-source sequence-length quantiles (p50/p90/p99/max of
    n_tok) via sparse histogram partials — no sort, no sampling."""
    paths = _token_paths(sf_dir)
    out = (
        _ids_dataset(paths)
        .map_batches(
            _SeqLenHistStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["source", "n_tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("source")
        .map_groups(_seqlen_quantile_group, batch_format="pandas")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["source"] = out["source"].astype(str)
    cols = ["n_docs"] + [n for n, _, _ in SEQLEN_QUANTILES] + ["max_tok"]
    return out.astype({c: "int64" for c in cols})


def seqlen_quantiles_sql(glob: str) -> str:
    picks = ",\n       ".join(
        f"CAST(MAX(CASE WHEN rn = ({num} * n + {den - 1}) // {den} "
        f"THEN n_tok END) AS BIGINT) AS {name}"
        for name, num, den in SEQLEN_QUANTILES
    )
    return f"""
WITH o AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM read_parquet('{glob}')
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       {picks},
       CAST(MAX(n_tok) AS BIGINT) AS max_tok
FROM o GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Vocabulary set operations across sources: |vocab(a) INTERSECT vocab(b)|
# for every source pair.  ONE bucketed shuffle end to end: each batch
# folds its distinct (token, source) pairs into per-token source-bitmask
# PARTIALS (vocabulary-sized rows, never token-sized), the token-hash
# groupby ORs the partials per token inside bounded buckets and
# immediately collapses each bucket to a <= 2^S-row mask census, and the
# final aggregate is over <= 2^S masks.  Every pairwise intersection is
# then a driver-side popcount over that census.  (The first cut ran two
# vocab-sized groupby AGGREGATES — distinct pairs, then per-token Sum;
# at sf0.1 that was 119 s of key-sorted shuffle for a 10-row answer;
# bucket-local reduceat over 512 groups runs the same input in 11.7 s,
# now dominated by the per-batch distinct fold, i.e. useful compute.)
# Signed tokens are bias-packed (+2^31) before the composite key, the
# same discipline as top_token_by_source.
# ---------------------------------------------------------------------------

_BIAS32 = np.int64(1) << 31


def _distinct_sources(paths: list[str]) -> list[str]:
    rows = (
        ray.data.read_parquet(paths, columns=["source"])
        .groupby("source")
        .count()
        .to_pandas()
    )
    return sorted(str(s) for s in rows["source"])


def _vocab_mask_census(sf_dir: str):
    """Shared kernel of the vocabulary set operations: the (mask -> token
    count) census, where bit i of a token's mask says the token appears in
    sources[i].  Returns (sources, masks, counts)."""
    from tokenzip.chunk import _tokens_parts

    paths = _token_paths(sf_dir)
    sources = _distinct_sources(paths)
    S = len(sources)
    if S > 62:
        raise ValueError("source bitmask packing supports at most 62 sources")
    sid = {s: i for i, s in enumerate(sources)}
    def pair_partial(b: pa.Table) -> pa.Table:
        # per-batch DISTINCT (token, source) folded to a per-token mask
        # PARTIAL — output is (bucket, token, mask) rows, vocabulary-sized
        # per batch, never token-sized
        lengths, flat = _tokens_parts(b["tokens"])
        src = b["source"].to_numpy(zero_copy_only=False)
        docsrc = np.fromiter(
            (sid[str(s)] for s in src), count=len(src), dtype=np.int64
        )
        tok_src = np.repeat(docsrc, lengths)
        k = np.unique((flat.astype(np.int64) + _BIAS32) * S + tok_src)
        t = k // S
        m = (np.int64(1) << (k % S)).astype(np.int64)
        # fold the batch's per-source bits into one mask row per token
        ut, starts = np.unique(t, return_index=True)
        mask = np.bitwise_or.reduceat(m, starts)
        return pa.table(
            {
                "bkt": pa.array(ut % _VOCAB_NB),
                "t": pa.array(ut),
                "m": pa.array(mask),
            }
        )

    def census_group(g: pd.DataFrame) -> pd.DataFrame:
        # one token-hash bucket: OR the batch partials per token, then
        # count tokens per final mask — output <= 2^S rows per bucket
        if not len(g):
            return pd.DataFrame(
                {
                    "mask": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        t = g["t"].to_numpy().astype(np.int64)
        m = g["m"].to_numpy().astype(np.int64)
        o = np.argsort(t, kind="stable")
        t, m = t[o], m[o]
        ut, starts = np.unique(t, return_index=True)
        masks = np.bitwise_or.reduceat(m, starts)
        u, cnt = np.unique(masks, return_counts=True)
        return pd.DataFrame({"mask": u, "n": cnt.astype(np.int64)})

    census = (
        ray.data.read_parquet(paths, columns=["tokens", "source"])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(census_group, batch_format="pandas")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return (
        sources,
        census["mask"].to_numpy().astype(np.int64),
        census["n"].to_numpy().astype(np.int64),
    )


def q_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """(source_a, source_b, n_common) for source_a < source_b, counting
    distinct token values present in both sources' streams; zero-overlap
    pairs are omitted (matching the SQL inner join)."""
    sources, masks, ns = _vocab_mask_census(sf_dir)
    S = len(sources)
    rows = []
    for a in range(S):
        for b_ in range(a + 1, S):
            both = (masks >> a & 1).astype(bool) & (masks >> b_ & 1).astype(bool)
            n = int(ns[both].sum())
            if n > 0:
                rows.append((sources[a], sources[b_], n))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_common"]).astype(
        {"n_common": "int64"}
    )


def vocab_overlap_sql(glob: str) -> str:
    return f"""
WITH v AS (
  SELECT DISTINCT source, t
  FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}'))
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_common
FROM v a JOIN v b ON a.t = b.t AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Token run-length structure per source — the statistic that decides
# whether the RLE codec can ever win on a stream (SURVEY §2: codec
# selection is sampling-based; this is the exact census).  A run is a
# maximal block of equal adjacent tokens WITHIN one document.  Fully
# vectorized: change flags on the flat concatenated stream with doc
# starts forced True, run lengths from diff of change positions, per-run
# source via the doc-repeat map.  Partials are 4 ints per (batch,
# source); the shuffle is source-sized.
# ---------------------------------------------------------------------------


def _run_stats_partial(b: pa.Table) -> pa.Table:
    from tokenzip.chunk import _tokens_parts

    lengths, flat = _tokens_parts(b["tokens"])
    src = b["source"].to_numpy(zero_copy_only=False)
    usrc, sinv = np.unique(src.astype(str), return_inverse=True)
    n_docs = np.bincount(sinv, minlength=len(usrc)).astype(np.int64)
    n_tokens = np.bincount(sinv, weights=lengths, minlength=len(usrc)).astype(np.int64)
    if len(flat):
        chg = np.empty(len(flat), dtype=bool)
        chg[0] = True
        np.not_equal(flat[1:], flat[:-1], out=chg[1:])
        starts = np.cumsum(lengths)[:-1]
        chg[starts[(starts > 0) & (starts < len(flat))]] = True
        pos = np.flatnonzero(chg)
        run_len = np.diff(np.append(pos, len(flat)))
        run_doc = np.repeat(np.arange(len(lengths)), lengths)[pos]
        run_src = sinv[run_doc]
        n_runs = np.bincount(run_src, minlength=len(usrc)).astype(np.int64)
        max_run = np.zeros(len(usrc), dtype=np.int64)
        np.maximum.at(max_run, run_src, run_len)
    else:
        n_runs = np.zeros(len(usrc), dtype=np.int64)
        max_run = np.zeros(len(usrc), dtype=np.int64)
    return pa.table(
        {
            "source": pa.array([str(s) for s in usrc], pa.string()),
            "n_docs": pa.array(n_docs),
            "n_tokens": pa.array(n_tokens),
            "n_runs": pa.array(n_runs),
            "max_run": pa.array(max_run),
        }
    )


def q_token_run_stats(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, n_tokens, n_runs, max_run): run-length census of
    every source's token streams."""
    from ray.data.aggregate import Max

    paths = _token_paths(sf_dir)
    agg = (
        ray.data.read_parquet(paths, columns=["tokens", "source"])
        .map_batches(_run_stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_runs", alias_name="n_runs"),
            Max("max_run", alias_name="max_run"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_tokens": agg["n_tokens"].astype("int64"),
            "n_runs": agg["n_runs"].astype("int64"),
            "max_run": agg["max_run"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def token_run_stats_sql(glob: str) -> str:
    return f"""
WITH u AS (
  SELECT source, doc_id, unnest(tokens) AS t,
         generate_subscripts(tokens, 1) AS i
  FROM read_parquet('{glob}')
),
d AS (
  SELECT source, doc_id,
         CASE WHEN lag(t) OVER w IS NULL OR t != lag(t) OVER w
              THEN 1 ELSE 0 END AS chg,
         t, i
  FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
r AS (
  SELECT source, doc_id, i,
         SUM(chg) OVER (PARTITION BY doc_id ORDER BY i) AS rid
  FROM d
),
rl AS (
  SELECT source, doc_id, rid, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM r GROUP BY 1, 2, 3
),
per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_runs,
         CAST(SUM(run_len) AS BIGINT) AS n_tokens,
         CAST(MAX(run_len) AS BIGINT) AS max_run
  FROM rl GROUP BY source
),
docs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM read_parquet('{glob}') GROUP BY source
)
SELECT docs.source, n_docs,
       COALESCE(n_tokens, 0) AS n_tokens,
       COALESCE(n_runs, 0) AS n_runs,
       COALESCE(max_run, 0) AS max_run
FROM docs LEFT JOIN per_src ON docs.source = per_src.source
ORDER BY docs.source
"""


def q_vocab_unique_by_source(sf_dir: str) -> pd.DataFrame:
    """(source, n_unique): distinct token values appearing in EXACTLY one
    source — the EXCEPT-all-others counterpart of vocab_overlap, read off
    the same mask census (mask == 1 << source_index); zero-unique sources
    are omitted (matching the SQL HAVING)."""
    sources, masks, ns = _vocab_mask_census(sf_dir)
    rows = []
    for i, s in enumerate(sources):
        n = int(ns[masks == (np.int64(1) << i)].sum())
        if n > 0:
            rows.append((s, n))
    return pd.DataFrame(rows, columns=["source", "n_unique"]).astype(
        {"n_unique": "int64"}
    )


def vocab_unique_by_source_sql(glob: str) -> str:
    return f"""
WITH v AS (
  SELECT DISTINCT source, t
  FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}'))
),
c AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS ns, MIN(source) AS only_src
  FROM v GROUP BY t
)
SELECT only_src AS source, CAST(COUNT(*) AS BIGINT) AS n_unique
FROM c WHERE ns = 1 GROUP BY only_src ORDER BY only_src
"""


def q_vocab_jaccard(sf_dir: str) -> pd.DataFrame:
    """(source_a, source_b, n_inter, n_union, jaccard_bp) for every source
    pair with a non-empty union — the similarity-coefficient completion of
    the INTERSECT/EXCEPT family, all integers (basis points via
    inter*10000 // union; no float ratio crosses the compare boundary),
    read off the same single-shuffle mask census."""
    sources, masks, ns = _vocab_mask_census(sf_dir)
    S = len(sources)
    # pair domain = sources with a non-empty vocabulary (some census bit
    # present): the SQL derives pair sizes from the unnested tokens, which
    # drops token-less sources — emitting (a, b, 0, union, 0) for such a
    # pair would be an engine/oracle parity break on that edge
    present = [
        i for i in range(S) if bool((((masks >> i) & 1).astype(bool) & (ns > 0)).any())
    ]
    rows = []
    for a in present:
        for b_ in present:
            if b_ <= a:
                continue
            in_a = ((masks >> a) & 1).astype(bool)
            in_b = ((masks >> b_) & 1).astype(bool)
            inter = int(ns[in_a & in_b].sum())
            union = int(ns[in_a | in_b].sum())
            if union > 0:
                rows.append(
                    (sources[a], sources[b_], inter, union, inter * 10000 // union)
                )
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_inter", "n_union", "jaccard_bp"],
    ).astype({"n_inter": "int64", "n_union": "int64", "jaccard_bp": "int64"})


def vocab_jaccard_sql(glob: str) -> str:
    return f"""
WITH v AS (
  SELECT DISTINCT source, t
  FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}'))
),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM v a JOIN v b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sa.source AS source_a, sb.source AS source_b,
       COALESCE(i.n_inter, 0) AS n_inter,
       sa.n + sb.n - COALESCE(i.n_inter, 0) AS n_union,
       CAST(COALESCE(i.n_inter, 0) * 10000
            // (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS BIGINT) AS jaccard_bp
FROM sz sa JOIN sz sb ON sa.source < sb.source
LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source
ORDER BY 1, 2
"""


def q_longest_docs(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """(rank, doc_id, n_tok, source): the k longest documents by a GLOBAL
    total order (n_tok DESC, doc_id ASC) — the one query family that runs
    Ray's native all-to-all sort operator (every other top-k here
    deliberately uses bucket-local folds; an engine still owes its users
    ORDER BY ... LIMIT, and this exercises that path end to end).  Only
    the id/length columns enter the sort; the token payload never moves."""
    paths = _token_paths(sf_dir)
    top = (
        ray.data.read_parquet(paths, columns=["doc_id", "n_tok", "source"])
        .sort(key=["n_tok", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": top["doc_id"].astype(str),
            "n_tok": top["n_tok"].astype("int64"),
            "source": top["source"].astype(str),
        }
    )


def longest_docs_sql(glob: str, k: int = 100) -> str:
    return f"""
SELECT CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id ASC) AS BIGINT)
           AS rank,
       doc_id, CAST(n_tok AS BIGINT) AS n_tok, source
FROM read_parquet('{glob}')
ORDER BY n_tok DESC, doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Duplicated token-block census (substring-level dedup signal)
# ---------------------------------------------------------------------------

# Non-overlapping 16-token blocks: the paragraph-hash dedup idea (CCNet,
# Wenzek et al. 2020; substring dedup per Lee et al. 2022) applied to the
# token stream. A block is "duplicated" when its exact content occurs in
# MORE THAN ONE document — the census reports, per source, how much of the
# corpus is block-level duplicate mass. Scale shape: each block instance
# becomes at most one narrow (key, doc, source, count) partial row
# (~90 B per 64 B of corpus), one hash-bucketed shuffle co-locates equal
# keys (bucket count scales with corpus size; groups stay bounded), and
# the per-bucket fold is pure NumPy over integer codes. Exact — the key is
# the raw 64-byte block content, never a lossy hash.
_BLK_W = 16


class _BlockPartialStage:
    """Per-batch distinct (block, doc) rows with instance counts."""

    def __init__(self, nb: int):
        self.nb = nb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        nblk = (lengths // _BLK_W).astype(np.int64)
        total = int(nblk.sum())
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "w": pa.array([], pa.binary()),
                "doc": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if total == 0:
            return empty
        off = np.zeros(len(lengths) + 1, np.int64)
        np.cumsum(lengths, out=off[1:])
        cum = np.zeros(len(nblk) + 1, np.int64)
        np.cumsum(nblk, out=cum[1:])
        di = np.repeat(np.arange(len(nblk), dtype=np.int64), nblk)
        local = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], nblk)
        starts = off[:-1][di] + _BLK_W * local
        wins = np.ascontiguousarray(
            values[starts[:, None] + np.arange(_BLK_W)], dtype=np.int32
        )
        # (block bytes, doc) distinct with counts: one np.unique over a
        # structured (V64, i8) view — no Python per block
        arr = np.empty(total, dtype=[("w", f"V{_BLK_W * 4}"), ("d", "i8")])
        arr["w"] = wins.view(np.dtype((np.void, _BLK_W * 4))).ravel()
        arr["d"] = di
        uniq, counts = np.unique(arr, return_counts=True)
        k = len(uniq)
        uw = np.frombuffer(uniq["w"].tobytes(), dtype=np.int32).reshape(k, _BLK_W)
        # bucket = polynomial hash of the block ints (uint64 wraparound)
        h = np.zeros(k, dtype=np.uint64)
        for j in range(_BLK_W):
            h = h * np.uint64(1000003) + uw[:, j].astype(np.uint64)
        bkt = (h % np.uint64(self.nb)).astype(np.int64)
        udoc = uniq["d"]
        wkeys = pa.Array.from_buffers(
            pa.binary(_BLK_W * 4), k, [None, pa.py_buffer(uniq["w"].tobytes())]
        ).cast(pa.binary())
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "w": wkeys,
                "doc": pa.array(doc[udoc], pa.string()),
                "source": pa.array(src[udoc], pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )


def _block_bucket_fold(g: pa.Table) -> pa.Table:
    """Within one key bucket: distinct docs per block key -> dup flags ->
    per-source (n_blocks, n_dup_blocks, n_distinct_blocks) partials."""
    w = g["w"].to_numpy(zero_copy_only=False)
    doc = g["doc"].to_numpy(zero_copy_only=False)
    src = g["source"].to_numpy(zero_copy_only=False)
    n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    wu, wi = np.unique(w, return_inverse=True)
    du, dix = np.unique(doc, return_inverse=True)
    su, six = np.unique(src, return_inverse=True)
    # collapse same (key, doc) arriving from different batches
    comp, cinv = np.unique(
        wi.astype(np.int64) * len(du) + dix, return_inverse=True
    )
    cnt = np.zeros(len(comp), np.int64)
    np.add.at(cnt, cinv, n)
    s_of = np.zeros(len(comp), np.int64)
    s_of[cinv] = six  # a doc has one source; any row's value is THE value
    ckey = comp // len(du)
    nd = np.bincount(ckey, minlength=len(wu))
    isdup = (nd > 1)[ckey]
    ns = len(su)
    blocks = np.zeros(ns, np.int64)
    np.add.at(blocks, s_of, cnt)
    dupb = np.zeros(ns, np.int64)
    np.add.at(dupb, s_of[isdup], cnt[isdup])
    # distinct (key, source) pairs per source
    ks = np.unique(ckey * ns + s_of)
    dist = np.bincount(ks % ns, minlength=ns)
    return pa.table(
        {
            "source": pa.array([str(s) for s in su], pa.string()),
            "n_blocks": pa.array(blocks, pa.int64()),
            "n_dup_blocks": pa.array(dupb, pa.int64()),
            "n_distinct_blocks": pa.array(dist.astype(np.int64), pa.int64()),
        }
    )


def q_dup_block_census(sf_dir: str) -> pd.DataFrame:
    """Per-source duplicated token-block census: of each source's
    non-overlapping 16-token blocks, how many carry content that also
    occurs in another document (and how many distinct block contents the
    source has). The block-level exact-dedup budget sheet."""
    paths = _token_paths(sf_dir)
    nb = _lsh_n_buckets_training(_corpus_docs(paths))
    agg = (
        ray.data.read_parquet(paths, columns=["doc_id", "tokens", "source"])
        .map_batches(
            _BlockPartialStage(nb),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bkt")
        .map_groups(_block_bucket_fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_blocks", alias_name="n_blocks"),
            Sum("n_dup_blocks", alias_name="n_dup_blocks"),
            Sum("n_distinct_blocks", alias_name="n_distinct_blocks"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_blocks": agg["n_blocks"].astype("int64"),
            "n_dup_blocks": agg["n_dup_blocks"].astype("int64"),
            "n_distinct_blocks": agg["n_distinct_blocks"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def _corpus_docs(paths: list[str]) -> int:
    """Total doc count from parquet FOOTERS only (planning metadata)."""
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def _lsh_n_buckets_training(n_rows: int, target: int = 32768) -> int:
    from tokenzip.analysis import _lsh_n_buckets

    return _lsh_n_buckets(n_rows, target=target)


def dup_block_census_sql(glob: str) -> str:
    """DuckDB oracle: identical block geometry (1-based starts 1, 17, ...;
    complete 16-token blocks only); the string rendering is merely an
    injective key — the engine groups the raw block bytes."""
    return f"""
WITH t AS (
  SELECT doc_id, source, unnest(tokens) AS tok,
         generate_subscripts(tokens, 1) AS ord
  FROM read_parquet('{glob}')
),
w AS (
  SELECT doc_id, source, string_agg(tok, ',' ORDER BY ord) AS w
  FROM t
  GROUP BY doc_id, source, (ord - 1) // {_BLK_W}
  HAVING COUNT(*) = {_BLK_W}
),
k AS (SELECT w, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY w),
j AS (SELECT w.source, w.w AS w, k.nd FROM w JOIN k USING (w))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_blocks
FROM j GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Length-outlier detection: exact-integer 3-sigma census per source
# ---------------------------------------------------------------------------

# Outlier rule: |x - mean| > 3*sigma (population), decided EXACTLY in
# integers: (n*x - S)^2 > 9*(n*Q - S^2) with S = sum(x), Q = sum(x^2).
# n*Q exceeds int64 at corpus scale, so the engine folds the per-batch
# partials in PYTHON bignums and converts the rule to two integer
# thresholds via isqrt (a^2 > b  <=>  a > isqrt(b) for a >= 0); the second
# pass is a plain int64 compare per row. The oracle runs the squared rule
# directly in HUGEINT. Two column-pruned scans of (source, n_tok) only.


class _LenMomentStage:
    """Per-batch (source, n, s1, s2) moment partials (int64-safe per batch;
    the cross-batch fold is Python-bignum on the driver)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        x = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(src, return_inverse=True)
        k = len(uniq)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        s1 = np.zeros(k, np.int64)
        np.add.at(s1, inv, x)
        s2 = np.zeros(k, np.int64)
        np.add.at(s2, inv, x * x)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n": pa.array(n),
                "s1": pa.array(s1),
                "s2": pa.array(s2),
            }
        )


class _LenOutlierStage:
    """Second pass: count docs beyond the broadcast integer thresholds."""

    def __init__(self, lo: dict, hi: dict):
        self.lo, self.hi = lo, hi

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        x = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(src, return_inverse=True)
        k = len(uniq)
        lo = np.array([self.lo[str(s)] for s in uniq], dtype=np.int64)
        hi = np.array([self.hi[str(s)] for s in uniq], dtype=np.int64)
        nlow = np.zeros(k, np.int64)
        np.add.at(nlow, inv, (x <= lo[inv]).astype(np.int64))
        nhigh = np.zeros(k, np.int64)
        np.add.at(nhigh, inv, (x >= hi[inv]).astype(np.int64))
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n_docs": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
                "n_low_outliers": pa.array(nlow),
                "n_high_outliers": pa.array(nhigh),
            }
        )


def q_length_outliers_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source count of docs whose n_tok sits more than 3 population
    standard deviations from the source mean — the data-quality gate for
    truncation/concatenation artifacts, decided in exact integer
    arithmetic on both engines (no float sigma ever crosses a compare)."""
    import math

    paths = _token_paths(sf_dir)
    ds = ray.data.read_parquet(paths, columns=["source", "n_tok"])
    parts = ds.map_batches(
        _LenMomentStage(), batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    mom: dict[str, list[int]] = {}
    for r in parts:
        m = mom.setdefault(r["source"], [0, 0, 0])
        m[0] += int(r["n"])   # Python ints: no overflow at any scale
        m[1] += int(r["s1"])
        m[2] += int(r["s2"])
    lo: dict[str, int] = {}
    hi: dict[str, int] = {}
    for s, (n, s1, s2) in mom.items():
        v9 = 9 * (n * s2 - s1 * s1)  # 9 * n^2 * variance, exact
        r = math.isqrt(v9) if v9 > 0 else 0
        # high outlier: n*x - s1 > r  =>  smallest qualifying x
        hi[s] = (s1 + r) // n + 1
        # low outlier: s1 - n*x > r  =>  largest qualifying x
        lo[s] = -((-(s1 - r)) // n) - 1  # ceil((s1-r)/n) - 1
    agg = (
        ds.map_batches(
            _LenOutlierStage(lo, hi), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_low_outliers", alias_name="n_low_outliers"),
            Sum("n_high_outliers", alias_name="n_high_outliers"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_low_outliers": agg["n_low_outliers"].astype("int64"),
            "n_high_outliers": agg["n_high_outliers"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def length_outliers_sql(glob: str) -> str:
    """HUGEINT squared-rule oracle — algebraically identical to the
    engine's isqrt thresholds."""
    a = "(s.n * CAST(t.n_tok AS HUGEINT) - s.s1)"
    v9 = "9 * (s.n * s.s2 - s.s1 * s.s1)"
    return f"""
WITH s AS (
  SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(n_tok AS BIGINT)) AS HUGEINT) AS s1,
         CAST(SUM(CAST(n_tok AS BIGINT) * n_tok) AS HUGEINT) AS s2
  FROM read_parquet('{glob}') GROUP BY source
)
SELECT t.source AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN {a} < 0 AND {a} * {a} > {v9}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN {a} > 0 AND {a} * {a} > {v9}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
FROM read_parquet('{glob}') t JOIN s ON t.source = s.source
GROUP BY t.source ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# Inter-source vocabulary drift: exact total-variation distance
# ---------------------------------------------------------------------------

# TV(a, b) = 1/2 * sum_t |p_a(t) - p_b(t)| decomposes per token, so unlike
# the KS statistic it needs no global CDF: the integer numerator
# sum_t |c_a(t)*n_b - c_b(t)*n_a| folds per vocab bucket and the final
# division happens once on the driver. Counts stay exact end to end; the
# per-term product c*n overflows int64 only beyond ~3e9 tokens/source,
# where the engine REFUSES loudly (the certified-or-loud contract; a
# sampled variant is the documented path there).


class _VocabSourcePartialStage:
    """Per-batch (bkt, token, source, cnt) partials — vocab x batch-sources
    sized, never token-sized."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        lengths, values = _tokens_parts(batch["tokens"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "bkt": pa.array([], pa.int64()),
                "token": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if not len(values):
            return empty
        su, si = np.unique(src, return_inverse=True)
        tok_src = np.repeat(si, lengths)
        comp = values.astype(np.int64) * len(su) + tok_src
        uniq, cnt = np.unique(comp, return_counts=True)
        # python floor semantics keep token//len and token%len paired for
        # negative tokens (comp = t*k + s with 0 <= s < k is a bijection)
        tok = np.floor_divide(uniq, len(su))
        sidx = uniq - tok * len(su)
        return pa.table(
            {
                "bkt": pa.array(tok % _VOCAB_NB),
                "token": pa.array(tok),
                "source": pa.array(su[sidx], pa.string()),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )


def _tv_bucket_fold(totals: dict[str, int], order: list[str]):
    """groupby(bkt): per-pair partial TV numerators over the bucket's
    tokens. ALL global sources participate (an absent column is zeros)."""
    gi = {s: i for i, s in enumerate(order)}
    nvec = np.array([totals[s] for s in order], dtype=np.int64)

    def fold(g: pa.Table) -> pa.Table:
        ns = len(order)
        out = {
            "source_a": [], "source_b": [], "num": [],
        }
        if g.num_rows:
            tok = g["token"].to_numpy(zero_copy_only=False)
            src = g["source"].to_numpy(zero_copy_only=False)
            cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
            tu, ti = np.unique(tok, return_inverse=True)
            mat = np.zeros((len(tu), ns), dtype=np.int64)
            cols = np.array([gi[s] for s in src], dtype=np.int64)
            np.add.at(mat, (ti, cols), cnt)
            for a in range(ns):
                for b in range(a + 1, ns):
                    out["source_a"].append(order[a])
                    out["source_b"].append(order[b])
                    out["num"].append(
                        int(
                            np.abs(
                                mat[:, a] * nvec[b] - mat[:, b] * nvec[a]
                            ).sum(dtype=np.int64)
                        )
                    )
        return pa.table(
            {
                "source_a": pa.array(out["source_a"], pa.string()),
                "source_b": pa.array(out["source_b"], pa.string()),
                "num": pa.array(out["num"], pa.int64()),
            }
        )

    return fold


def q_vocab_tv_distance(sf_dir: str) -> pd.DataFrame:
    """Pairwise total-variation distance between the sources' unigram token
    distributions, in integer basis points — the mixture-drift audit
    ("did web's token distribution move away from wiki's") with zero float
    arithmetic before the final driver-side division."""
    paths = _token_paths(sf_dir)
    def _tot_partial(b: pa.Table) -> pa.Table:
        su, si = np.unique(b["source"].to_numpy(zero_copy_only=False), return_inverse=True)
        ntok = b["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        acc = np.zeros(len(su), np.int64)  # int64 np.add.at, never float weights
        np.add.at(acc, si, ntok)
        return pa.table({"source": pa.array(su, pa.string()), "n": pa.array(acc)})

    tot = (
        _ids_dataset(paths)
        .map_batches(_tot_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    totals = {str(r["source"]): int(r["n"]) for _, r in tot.iterrows()}
    order = sorted(totals)
    for a in range(len(order)):
        for b in range(a + 1, len(order)):
            if totals[order[a]] * totals[order[b]] > (1 << 62):
                raise ValueError(
                    "vocab_tv_distance: per-term products exceed int64 at "
                    f"{totals[order[a]]} x {totals[order[b]]} tokens; "
                    "use a sampled distribution at this scale"
                )
    parts = (
        ray.data.read_parquet(paths, columns=["tokens", "source"])
        .map_batches(
            _VocabSourcePartialStage(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bkt")
        .map_groups(_tv_bucket_fold(totals, order), batch_format="pyarrow")
        .take_all()
    )
    num: dict[tuple[str, str], int] = {}
    for r in parts:
        k = (r["source_a"], r["source_b"])
        num[k] = num.get(k, 0) + int(r["num"])  # Python ints: exact fold
    rows = []
    for a in range(len(order)):
        for b in range(a + 1, len(order)):
            sa, sb = order[a], order[b]
            na, nb = totals[sa], totals[sb]
            n = num.get((sa, sb), 0)
            rows.append(
                {
                    "source_a": sa,
                    "source_b": sb,
                    "tv_bp": (10000 * n) // (2 * na * nb),
                    "n_tokens_a": na,
                    "n_tokens_b": nb,
                }
            )
    out = pd.DataFrame(rows)
    for c in ("tv_bp", "n_tokens_a", "n_tokens_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


def vocab_tv_distance_sql(glob: str) -> str:
    """HUGEINT oracle: identical integer numerator and basis-point floor
    division over the union token domain per source pair."""
    return f"""
WITH c AS (
  SELECT source, t, CAST(COUNT(*) AS HUGEINT) AS n
  FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY source, t
),
tot AS (SELECT source, CAST(SUM(n) AS HUGEINT) AS ns FROM c GROUP BY source),
toks AS (SELECT DISTINCT t FROM c),
pairs AS (
  SELECT a.source AS sa, b.source AS sb, a.ns AS na, b.ns AS nb
  FROM tot a JOIN tot b ON a.source < b.source
),
terms AS (
  SELECT p.sa, p.sb, p.na, p.nb,
         ABS(COALESCE(ca.n, 0) * p.nb - COALESCE(cb.n, 0) * p.na) AS term
  FROM pairs p
  CROSS JOIN toks t
  LEFT JOIN c ca ON ca.source = p.sa AND ca.t = t.t
  LEFT JOIN c cb ON cb.source = p.sb AND cb.t = t.t
)
SELECT sa AS source_a, sb AS source_b,
       CAST((10000 * SUM(term)) // (2 * na * nb) AS BIGINT) AS tv_bp,
       CAST(na AS BIGINT) AS n_tokens_a,
       CAST(nb AS BIGINT) AS n_tokens_b
FROM terms GROUP BY sa, sb, na, nb ORDER BY sa, sb
"""


# ---------------------------------------------------------------------------
# Robust dispersion: median + MAD + robust outlier count, one histogram pass
# ---------------------------------------------------------------------------

# The sparse (source, n_tok, cnt) histogram is corpus-size-independent, so
# median AND median-absolute-deviation both read off ONE merged histogram
# inside the same group fold — the second "pass" over |x - med| is
# arithmetic on the histogram's distinct values, not a corpus rescan. The
# robust outlier rule is pure integers (dev > 5 * MAD), the integer-exact
# complement of the 3-sigma census (no 0.6745 consistency float anywhere).


def _mad_group(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("n_tok")["cnt"].sum().sort_index()
    vals = g.index.to_numpy(np.int64)
    cnt = g.to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    med = int(vals[np.searchsorted(cum, (n + 1) // 2)])
    dev = np.abs(vals - med)
    order = np.argsort(dev, kind="stable")
    dsort, dcnt = dev[order], cnt[order]
    # combine equal deviations (x = med-k and med+k collapse)
    du, dinv = np.unique(dsort, return_inverse=True)
    dc = np.zeros(len(du), np.int64)
    np.add.at(dc, dinv, dcnt)
    dcum = np.cumsum(dc)
    mad = int(du[np.searchsorted(dcum, (n + 1) // 2)])
    n_out = int(dc[du > 5 * mad].sum())
    return pd.DataFrame(
        {
            "source": [str(df["source"].iloc[0])],
            "n_docs": [n],
            "med_tok": [med],
            "mad_tok": [mad],
            "n_robust_outliers": [n_out],
        }
    )


def q_seqlen_mad_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source robust length statistics: exact median, exact MAD, and
    the count of docs with |n_tok - median| > 5 * MAD — the
    outlier census that a single pathological shard cannot skew (unlike
    mean/sigma, which the 3-sigma census deliberately reports)."""
    paths = _token_paths(sf_dir)
    out = (
        _ids_dataset(paths)
        .map_batches(
            _SeqLenHistStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["source", "n_tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("source")
        .map_groups(_mad_group, batch_format="pandas")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["source"] = out["source"].astype(str)
    for c in ("n_docs", "med_tok", "mad_tok", "n_robust_outliers"):
        out[c] = out[c].astype("int64")
    return out


def seqlen_mad_sql(glob: str) -> str:
    """Same ceil-rank rule ((n+1)//2 = low median) on both levels."""
    return f"""
WITH o AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM read_parquet('{glob}')
),
m AS (
  SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN n_tok END) AS med
  FROM o GROUP BY source
),
d AS (
  SELECT o.source, ABS(o.n_tok - m.med) AS dev, m.med, m.n_docs
  FROM o JOIN m ON o.source = m.source
),
o2 AS (
  SELECT source, dev, med, n_docs,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM d
),
mm AS (
  SELECT source, MAX(n_docs) AS n_docs, MAX(med) AS med,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
  FROM o2 GROUP BY source
)
SELECT d.source AS source,
       CAST(MAX(mm.n_docs) AS BIGINT) AS n_docs,
       CAST(MAX(mm.med) AS BIGINT) AS med_tok,
       CAST(MAX(mm.mad) AS BIGINT) AS mad_tok,
       CAST(SUM(CASE WHEN d.dev > 5 * mm.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_robust_outliers
FROM d JOIN mm ON d.source = mm.source
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# Deterministic global training-order shuffle (the epoch-shuffle writer).
# A training run wants every epoch's document order to be (a) uniformly
# random, (b) reproducible from a seed, (c) resumable without replaying
# the permutation — so the order is VALUE-DEFINED: a salted md5 of the
# doc_id (ties by doc_id), not a positional RNG. Ray's native all-to-all
# range sort moves each row once; blocks come back internally sorted and
# mutually range-disjoint, which the writer verifies before declaring the
# sink ordered. Changing the seed is a new epoch; same seed = same order
# on any cluster size, retry schedule, or shard layout.
# ---------------------------------------------------------------------------


def _shuffle_salt(seed: int) -> bytes:
    return f"shuf{int(seed)}:".encode()


def _skey_tag(seed: int):
    def fn(batch: pa.Table) -> pa.Table:
        from tokenzip.hashutil import md5_hi60_str

        hv = md5_hi60_str(batch["doc_id"].combine_chunks(), _shuffle_salt(seed))
        return batch.append_column("skey", pa.array(hv.astype(np.int64)))

    return fn


def shuffle_emit(paths: list[str], out_dir: str, seed: int = 0) -> dict:
    """Write the corpus to ``out_dir`` in deterministic shuffled order:
    ORDER BY md5('shuf<seed>:' || doc_id), doc_id. Returns
    {n_rows, n_files, ordered: True} — ordered is ASSERTED, not assumed:
    every written file must be internally sorted and the per-file
    [min, max] skey windows must be pairwise disjoint, so a consumer
    streaming files in min-skey order replays the exact global order."""
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    (
        ray.data.read_parquet(paths)
        .map_batches(_skey_tag(seed), batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["skey", "doc_id"])
        .write_parquet(out_dir)
    )
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    spans = []
    n_rows = 0
    for p in files:
        k = pq.read_table(p, columns=["skey", "doc_id"])
        sk = k["skey"].to_numpy(zero_copy_only=False)
        if len(sk) == 0:
            continue
        did = np.asarray(k["doc_id"].to_pylist(), dtype=object)
        order = np.lexsort((did, sk))
        if not np.array_equal(order, np.arange(len(sk))):
            raise ValueError(f"shuffle_emit: {p} is not internally sorted")
        spans.append((int(sk[0]), int(sk[-1]), p))
        n_rows += len(sk)
    spans.sort()
    for (_, hi_a, pa_), (lo_b, _, pb_) in zip(spans, spans[1:]):
        if lo_b < hi_a:
            raise ValueError(
                f"shuffle_emit: file skey windows overlap ({pa_} vs {pb_})"
            )
    return {"n_rows": n_rows, "n_files": len(files), "ordered": True}


def q_shuffle_head_stats(sf_dir: str, seed: int = 0, k: int = 500) -> pd.DataFrame:
    """(source, n_docs, sum_tokens, sum_key_mod) over the FIRST ``k``
    documents of the seed-0 training-shuffle order, computed from the
    WRITTEN shuffled sink (files streamed in min-skey order — exact
    because shuffle_emit asserts disjoint file windows). The oracle
    recomputes the same salted-md5 ORDER BY ... LIMIT in SQL, so a
    mis-ordered file, an overlap, or one misplaced row breaks the hash."""
    from tokenzip.queries import _scoped_out_dir

    paths = _token_paths(sf_dir)
    out_dir = _scoped_out_dir("/tmp/tokenzip_shuffled", sf_dir)
    marker = os.path.join(out_dir, "_ordered.json")
    import json

    if not os.path.exists(marker):
        totals = shuffle_emit(paths, out_dir, seed=seed)
        with open(marker, "w") as fh:
            json.dump(totals, fh)
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    spans = []
    for p in files:
        md = pq.read_table(p, columns=["skey"])["skey"].to_numpy(
            zero_copy_only=False
        )
        if len(md):
            spans.append((int(md[0]), p, len(md)))
    spans.sort()
    head = []
    got = 0
    for _, p, n in spans:
        head.append(pq.read_table(p, columns=["skey", "doc_id", "n_tok", "source"]))
        got += n
        if got >= k:
            break
    t = pa.concat_tables(head)
    sk = t["skey"].to_numpy(zero_copy_only=False)
    did = np.asarray(t["doc_id"].to_pylist(), dtype=object)
    order = np.lexsort((did, sk))[:k]
    src = np.asarray(t["source"].to_pylist(), dtype=object)[order]
    ntok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    km = (sk[order] % _PAIR_MOD).astype(np.int64)
    uniq, inv = np.unique(src, return_inverse=True)
    nd = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    st = np.zeros(len(uniq), np.int64)
    np.add.at(st, inv, ntok)
    sm = np.zeros(len(uniq), np.int64)
    np.add.at(sm, inv, km)
    out = pd.DataFrame(
        {
            "source": [str(s) for s in uniq],
            "n_docs": nd,
            "sum_tokens": st,
            "sum_key_mod": sm % _PAIR_MOD,
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def shuffle_head_sql(glob: str, seed: int = 0, k: int = 500) -> str:
    nib = lambda i: f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
    hv = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    return f"""
WITH h AS (
  SELECT source, n_tok, doc_id, md5('shuf{seed}:' || doc_id) AS m
  FROM read_parquet('{glob}')
),
o AS (SELECT source, n_tok, hv FROM (SELECT source, n_tok, doc_id, {hv} AS hv FROM h)
      ORDER BY hv, doc_id LIMIT {k})
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS sum_tokens,
       CAST(SUM(hv % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS sum_key_mod
FROM o GROUP BY source ORDER BY source
"""
