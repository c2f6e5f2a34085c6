"""Ray Data map_batches stages (callable classes -> actor pools).

Stateful setup (codec registry closure, selector config, shared symbol
tables fetched from the object store) happens once per actor in
``__init__``; per-batch work in ``__call__`` — the engine analog of the
reference's static lookup tables resolved once at link time
(/root/reference/src/decode/lookup.rs, SURVEY.md §2.5).

All stages are Arrow-in/Arrow-out (``batch_format="pyarrow"``,
``zero_copy_batch=True``); no Python loop ever iterates token values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokenzip.chunk import CHUNK_SCHEMA, decode_chunks, encode_batch


def _bcast(obj) -> list:
    """ray.put + wrap in a list: the actor-pool constructor receives the
    tiny wrapped ref (never the payload) and fetches it once in __init__
    via _bget. Note ray#53727 ('constructor arguments in the object store,
    restart will fail') is logged by Ray Data 2.49 for EVERY actor-pool
    map_batches — it ray.puts its own MapTransformer — so the line still
    appears; the driver-owned broadcast payload itself survives actor
    restarts as long as the driver is alive."""
    import ray

    return [ray.put(obj)]


def _bget(wrapped):
    """Resolve a _bcast-wrapped ref (or pass through a plain object, so
    stages stay directly constructible in unit tests)."""
    import ray

    if (
        isinstance(wrapped, list)
        and len(wrapped) == 1
        and isinstance(wrapped[0], ray.ObjectRef)
    ):
        return ray.get(wrapped[0])
    if isinstance(wrapped, ray.ObjectRef):
        return ray.get(wrapped)
    return wrapped


class EncodeStage:
    """Encode input batches into chunk rows, one chunk per (batch, source)
    partition so the per-column auto-selector sees homogeneous value
    distributions — per-source codec choice without an all-to-all shuffle
    (the groupby-shuffle path is reserved for skew isolation, SURVEY.md §4.2).
    """

    def __init__(
        self,
        tokens_codec: str = "auto",
        id_codec: str = "auto",
        by_source: bool = True,
        selector_sample: int = 65_536,
        max_chunk_tokens: int = 2_000_000,
        assume_sorted: bool = False,
    ):
        self.tokens_codec = tokens_codec
        self.id_codec = id_codec
        self.by_source = by_source
        self.selector_sample = selector_sample
        # caller guarantees the batch is already ordered by the partition
        # keys (VerifyStage sorts once and shares) — skip the sort + take
        self.assume_sorted = assume_sorted
        # size-based sub-chunking: a (frag, source) group larger than this
        # token budget is split so no single chunk (task unit, decode unit,
        # memory unit) is unboundedly large — the explicit
        # repartition-by-cumulative-n_tok skew control of SURVEY.md §4.2.
        # Straggler documents (e.g. 131k-token rows) land in their own
        # sub-chunk instead of bloating a neighbour's.
        self.max_chunk_tokens = max_chunk_tokens

    def encode_one(self, batch: pa.Table) -> pa.Table:
        return encode_batch(
            batch,
            tokens_codec=self.tokens_codec,
            id_codec=self.id_codec,
            selector_sample=self.selector_sample,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_frag = "frag" in batch.column_names
        if batch.num_rows == 0:
            out = pa.table({f.name: pa.array([], f.type) for f in CHUNK_SCHEMA})
            if has_frag:
                out = out.append_column("frag", pa.array([], pa.string()))
            return out

        # stable partition by (frag, source) inside the batch — per-source
        # codec choice and per-fragment lineage without any shuffle. Batches
        # may coalesce rows from several input fragments.
        keys = []
        if has_frag:
            keys.append("frag")
        if self.by_source:
            keys.append("source")
        if keys:
            if not self.assume_sorted:
                order = [(k, "ascending") for k in keys]
                batch = batch.take(
                    pc.sort_indices(
                        batch.append_column("_i", pa.array(np.arange(batch.num_rows))),
                        sort_keys=order + [("_i", "ascending")],
                    )
                )
            key_np = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
            changed = np.zeros(batch.num_rows - 1, dtype=bool)
            for col in key_np:
                changed |= col[1:] != col[:-1]
            starts = np.concatenate(([0], np.flatnonzero(changed) + 1, [batch.num_rows]))
        else:
            starts = np.array([0, batch.num_rows])

        data = batch.drop_columns(["frag"]) if has_frag else batch
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for a, b in zip(starts[:-1], starts[1:]):
            for sa, sb in self._token_budget_splits(n_tok, int(a), int(b)):
                part = self.encode_one(data.slice(sa, sb - sa))
                if has_frag:
                    frag = batch["frag"][sa].as_py()
                    part = part.append_column(
                        "frag", pa.array([frag] * part.num_rows, pa.string())
                    )
                parts.append(part)
        return pa.concat_tables(parts)

    def _token_budget_splits(self, n_tok, a, b):
        """Split [a, b) on cumulative n_tok so each piece stays under the
        chunk token budget (single oversized rows get their own piece)."""
        total = int(n_tok[a:b].sum())
        if total <= self.max_chunk_tokens:
            return [(a, b)]
        out = []
        sa, acc = a, 0
        for i in range(a, b):
            if acc and acc + int(n_tok[i]) > self.max_chunk_tokens:
                out.append((sa, i))
                sa, acc = i, 0
            acc += int(n_tok[i])
        out.append((sa, b))
        return out


class SharedTableEncodeStage(EncodeStage):
    """Stateful actor-pool encode stage: shared symbol tables / dictionaries
    are fetched from the object store ONCE per actor in __init__ (broadcast
    via ray.put on the driver — never re-shipped per batch) and registered in
    the worker's codec registries. Chunks then reference tables by hash only.
    This is the north rule's 'actor pools holding stateful symbol tables'
    path; run it via ``compress(..., shared_tables=True)``."""

    def __init__(self, tables_ref=None, tables=None, **kw):
        super().__init__(**kw)
        from tokenzip.codecs.strings import (
            SHARED_STR_DICTS,
            SHARED_STR_TABLES,
        )

        from tokenzip.codecs.core import (
            _RANK_LENS_HASH,
            _RANK_LOOKUPS,
            _RANK_VALS32,
            SHARED_RANK_LENS,
            SHARED_RANK_TABLES,
        )

        payload = tables if tables is not None else _bget(tables_ref)
        SHARED_STR_TABLES.update(payload.get("fsst_tables", {}))
        SHARED_STR_DICTS.update(payload.get("str_dicts", {}))
        for h, v in payload.get("rank_tables", {}).items():
            SHARED_RANK_TABLES[h] = v
            _RANK_LOOKUPS.pop(h, None)
            _RANK_VALS32.pop(h, None)
            SHARED_RANK_LENS.pop(h, None)
            _RANK_LENS_HASH.pop(h, None)
        for h, lens in payload.get("rank_lens", {}).items():
            SHARED_RANK_LENS[h] = lens
        self.shared = payload.get("refs", {})

    def encode_one(self, batch: pa.Table) -> pa.Table:
        return encode_batch(
            batch,
            tokens_codec=self.tokens_codec,
            id_codec=self.id_codec,
            selector_sample=self.selector_sample,
            shared=self.shared,
        )


class DecodeStage:
    """Decode chunk rows back to the original table schema. ``sidecar`` is
    the run's symbols.json (shared-table mode); loaded once per worker.
    ``columns`` projects at the stream level — unrequested payloads are
    never decoded (see chunk.decode_chunk_row)."""

    def __init__(self, sidecar: str | None = None, columns: list[str] | None = None):
        self.sidecar = sidecar
        self.columns = columns
        self._loaded = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.sidecar and not self._loaded:
            from tokenzip import uio

            if uio.exists(self.sidecar):
                from tokenzip.codecs.strings import load_shared_tables

                load_shared_tables(self.sidecar)
            self._loaded = True
        cols = [c for c in ("frag", "frag_src") if c in batch.column_names]
        if cols:
            batch = batch.drop_columns(cols)
        return decode_chunks(batch, self.columns)


class VerifyStage:
    """Encode -> decode -> per-row equality, inside one stage: the engine
    form of the reference's roundtrip tests (/root/reference/src/lib.rs:71-85)
    applied to every batch. Emits one partial-aggregate row per (source) —
    the pre-aggregate-before-groupby pattern, so the final groupby touches
    rows-per-batch, not rows-per-document."""

    PARTIAL_SCHEMA = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("n_equal", pa.int64()),
            ("sum_n_tok", pa.int64()),
            ("sum_token_values", pa.int64()),
        ]
    )

    def __init__(self, tokens_codec: str = "auto"):
        self.enc = EncodeStage(
            tokens_codec=tokens_codec, by_source=True, assume_sorted=True
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts

        if batch.num_rows == 0:
            # schema-stable empty partial: empty blocks must carry the full
            # output schema or the downstream groupby logs RefBundle schema
            # mismatches and re-infers per block
            return pa.table(
                {f.name: pa.array([], f.type) for f in self.PARTIAL_SCHEMA},
                schema=self.PARTIAL_SCHEMA,
            )
        # sort ONCE by (source, stable); the encoder is told the batch is
        # pre-sorted so it never re-takes, and the decode output preserves
        # this order — alignment is free
        perm = pc.sort_indices(
            batch.append_column("_i", pa.array(np.arange(batch.num_rows))),
            sort_keys=[("source", "ascending"), ("_i", "ascending")],
        )
        orig = batch.take(perm)
        chunks = self.enc(orig)
        back = decode_chunks(chunks)
        got = back
        if got.num_rows != orig.num_rows:
            raise AssertionError(
                f"decode returned {got.num_rows} rows != {orig.num_rows}"
            )

        lo, vo = _tokens_parts(orig["tokens"])
        lg, vg = _tokens_parts(got["tokens"])
        if np.array_equal(lo, lg) and np.array_equal(vo, vg):
            tok_eq = np.ones(orig.num_rows, dtype=bool)
        else:  # corruption path: localize which rows differ (cold, row loop OK)
            oo = np.zeros(len(lo) + 1, np.int64)
            og = np.zeros(len(lg) + 1, np.int64)
            np.cumsum(lo, out=oo[1:])
            np.cumsum(lg, out=og[1:])
            tok_eq = np.fromiter(
                (
                    lo[i] == lg[i]
                    and np.array_equal(vo[oo[i] : oo[i + 1]], vg[og[i] : og[i + 1]])
                    for i in range(orig.num_rows)
                ),
                dtype=bool,
                count=orig.num_rows,
            )
        all_eq = (
            np.asarray(pc.equal(orig["doc_id"], got["doc_id"]))
            & np.asarray(pc.equal(orig["source"], got["source"]))
            & np.asarray(pc.equal(orig["n_tok"], got["n_tok"]))
            & tok_eq
        )
        # vectorized per-row token sums via cumsum differencing (empty-safe)
        oo = np.zeros(len(lo) + 1, np.int64)
        np.cumsum(lo, out=oo[1:])
        cs = np.zeros(len(vo) + 1, np.int64)
        np.cumsum(vo, dtype=np.int64, out=cs[1:])
        row_sums = cs[oo[1:]] - cs[oo[:-1]]

        src = orig["source"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        n_tok = orig["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n_docs": np.bincount(inv, minlength=len(uniq)).astype(np.int64),
                "n_equal": np.bincount(
                    inv, weights=all_eq.astype(np.float64), minlength=len(uniq)
                ).astype(np.int64),
                "sum_n_tok": np.bincount(
                    inv, weights=n_tok.astype(np.float64), minlength=len(uniq)
                ).astype(np.int64),
                "sum_token_values": pa.array(
                    [
                        int(row_sums[inv == g].sum())
                        for g in range(len(uniq))
                    ],
                    type=pa.int64(),
                ),
            },
            schema=self.PARTIAL_SCHEMA,
        )
