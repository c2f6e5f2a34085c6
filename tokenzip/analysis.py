"""Training-data pipeline operations beyond the reference's codec surface:
deduplication (exact, MinHash-LSH, SimHash), similarity search over
embeddings, text analysis (quality metrics, language-ID heuristic, token
counting, fingerprinting).

All operators are Ray-Data-first: vectorized ``map_batches`` partials,
pre-aggregated before any ``groupby`` shuffle; small lookup state (query
vectors, stopword sets) broadcast via ``ray.put`` and fetched once per actor
in ``__init__`` — never re-shipped per batch.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from tokenzip.pipeline import _default_concurrency
from tokenzip.stages import _bcast, _bget

STOPWORDS = ("the", "a", "and", "of", "to")

# stateless-stage instances cached per worker process: run as plain Ray
# tasks (actor pools are reserved for stages holding broadcast state, e.g.
# _CosineStage's query matrix)
_STAGE_CACHE: dict = {}


def _cached(key: str, cls):
    def fn(batch):
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE[key] = cls()
        return st(batch)

    fn.__name__ = f"{key}_fn"
    return fn


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )




# ---------------------------------------------------------------------------
# Exact deduplication: content-hash -> hash-partitioned keep-first
# ---------------------------------------------------------------------------


def _int_group_sums(vals: np.ndarray, inv: np.ndarray, k: int) -> np.ndarray:
    """Exact int64 per-group sums (bincount's float64 weights lose precision
    above 2^53 — doc ids at scale exceed that)."""
    out = np.zeros(k, dtype=np.int64)
    np.add.at(out, inv, vals)
    return out


def _hash_key_rows(batch: pa.Table) -> pa.Table:
    """(md5(text), zero-padded-doc_id|source) rows: Min over the composite
    key inside the hash groupby picks the kept row AND carries its source —
    one aggregate instead of a map_groups."""
    from tokenzip.hashutil import md5_hex_str

    h = md5_hex_str(batch["text"])  # one C pass over the flat UTF-8 buffer
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # the zero-padded composite key sorts correctly only for non-negative
    # ids (int64 max is 19 digits, so 20 digits always fit); negative ids
    # would sort lexicographically wrong under Min — reject loudly
    if len(ids) and int(ids.min()) < 0:
        raise ValueError("dedup_exact requires non-negative doc_id")
    src = batch["source"].to_pylist()
    comb = [f"{i:020d}|{s}" for i, s in zip(ids, src)]
    return pa.table(
        {"h": pa.array(h, pa.string()), "k": pa.array(comb, pa.string())}
    )


def _src_count_partial(batch: pa.Table) -> pa.Table:
    src = batch["source"].to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(src, return_counts=True)
    return pa.table(
        {
            "source": pa.array([str(s) for s in uniq], pa.string()),
            "n_docs": pa.array(counts.astype(np.int64)),
        }
    )


def q_dedup_exact(sf_dir: str):
    """Exact dedup: md5(text) -> groupby(hash) -> Min(composite key) keeps
    the min-doc_id row with its source in ONE aggregate (no pandas
    map_groups); per-source totals come from pre-aggregated batch partials.
    The groupby IS the hash-partition: every duplicate set meets in one
    group regardless of input fragment."""
    from ray.data.aggregate import Min

    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    kept = (
        ds.map_batches(_hash_key_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min("k", alias_name="kept"))
    )

    def _kept_partial(b: pa.Table) -> pa.Table:
        ks = b["kept"].to_pylist()
        ids = np.array([int(k[:20]) for k in ks], dtype=np.int64)
        srcs = np.array([k[21:] for k in ks])
        uniq, inv = np.unique(srcs, return_inverse=True)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n_kept": pa.array(
                    np.bincount(inv, minlength=len(uniq)).astype(np.int64)
                ),
                "sum_kept_ids": pa.array(_int_group_sums(ids, inv, len(uniq))),
            }
        )

    kept_parts = kept.map_batches(_kept_partial, batch_format="pyarrow").to_pandas()
    n_docs = (
        _docs(sf_dir, ["source"])
        .map_batches(_src_count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    out = kept_parts.groupby("source", as_index=False).sum()
    nd = n_docs.groupby("source", as_index=False).sum()
    res = nd.merge(out, on="source").sort_values("source").reset_index(drop=True)
    for c in ("n_docs", "n_kept", "sum_kept_ids"):
        res[c] = res[c].astype("int64")
    return res[["source", "n_docs", "n_kept", "sum_kept_ids"]]


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k with a broadcast query vector
# ---------------------------------------------------------------------------


def _emb_matrix(col) -> np.ndarray:
    """Zero-copy (n, dim) float64 view of a list<float> embedding column —
    flat child values reshaped by the uniform dim, no per-row Python."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    lens = np.diff(offs)
    flat = col.values.to_numpy(zero_copy_only=False)[offs[0] : offs[-1]]
    if len(lens) == 0:
        return np.empty((0, 0), dtype=np.float64)
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("ragged embedding column")
    return flat.reshape(len(lens), dim).astype(np.float64)


def _fetch_query_vector(path: str) -> np.ndarray:
    """Query row = embedding of MIN(vec_id), fetched WITHOUT a full driver
    read: distributed min over the pruned vec_id column, then a
    filtered parquet read (row groups pruned by column statistics)."""
    import pyarrow.parquet as pq

    min_id = int(
        ray.data.read_parquet(path, columns=["vec_id"]).min("vec_id")
    )
    t = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", min_id)],
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


class _CosineStage:
    """Per-batch cosine similarities against a broadcast query matrix:
    the query vector is ray.put once on the driver and fetched once per
    actor here — never shipped per batch."""

    def __init__(self, query_ref, k: int):
        self.q = _bget(query_ref)
        self.qn = self.q / np.linalg.norm(self.q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch["embedding"])
        norms = np.linalg.norm(emb, axis=1)
        cos = (emb @ self.qn) / np.where(norms == 0, 1.0, norms)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        k = min(self.k, len(ids))
        top = np.argsort(-cos, kind="stable")[:k]  # per-batch partial top-k
        return pa.table({"vec_id": ids[top], "cos": cos[top]})


def q_embedding_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k over the embeddings table vs the embedding of
    MIN(vec_id). Returns (rank, vec_id) — ranks deterministic via
    (cos desc, vec_id asc) ordering, computed in float64 on both engines."""
    path = os.path.join(sf_dir, "embeddings.parquet")

    qv = _fetch_query_vector(path)
    qref = _bcast(qv)

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _CosineStage,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=max(2, _default_concurrency() // 2),
        fn_constructor_kwargs={"query_ref": qref, "k": k},
    )
    # partial top-k rows are tiny: final exact top-k on the driver
    df = partials.to_pandas()
    df = df.sort_values(["cos", "vec_id"], ascending=[False, True], kind="stable").head(k)
    df = df.reset_index(drop=True)
    return pd.DataFrame(
        {"rank": np.arange(1, len(df) + 1, dtype=np.int64), "vec_id": df["vec_id"].astype("int64")}
    )


class _IVFStage:
    """IVF scale path: per-batch, assign vectors to the nearest of C
    broadcast centroids, compute cosine to the query ONLY for vectors whose
    centroid is among the probed ones. At 100 TB this is the standard
    inverted-file ANN layout: the centroid assignment is a cheap matmul, the
    expensive scoring touches ~n_probe/C of the data, and the centroids
    (small state) ride the object store once per actor."""

    def __init__(self, centroids_ref, query_ref, probe_ids, k: int):
        self.cent = _bget(centroids_ref)
        q = _bget(query_ref)
        self.qn = q / np.linalg.norm(q)
        self.probe = set(int(i) for i in probe_ids)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        assign = np.argmax(emb @ self.cent.T, axis=1)
        mask = np.isin(assign, list(self.probe))
        if not mask.any():
            return pa.table({"vec_id": ids[:0], "cos": np.empty(0, np.float64)})
        emb, ids = emb[mask], ids[mask]
        norms = np.linalg.norm(emb, axis=1)
        cos = (emb @ self.qn) / np.where(norms == 0, 1.0, norms)
        top = np.argsort(-cos, kind="stable")[: self.k]
        return pa.table({"vec_id": ids[top], "cos": cos[top]})


_IVF_TRAIN_ROWS = 65_536  # k-means training sample cap (first row groups)

# Pinned q_embedding_topk_ivf row at the oracle scale (sf0.01, default
# parameters): the IVF result is deterministic (fixed corpus + seeded
# k-means on a bounded sample + float64 matmul), so the recall is a
# constant the engine must reproduce exactly. Regenerate with
# `python -m tokenzip pins`.
EMB_TOPK_IVF_PIN = {
    "k": 10, "n_probe": 3, "n_clusters": 8,
    "recall_pct_x100": 6000, "n_found": 10,
}


# Pinned q_embedding_kmeans_sizes rows at the oracle scale (sf0.01, k=8):
# (cluster_id, n_vectors, vec_id checksum). Deterministic (fixed corpus +
# seeded bounded-sample k-means + float64 argmax). The SQL self-audits by
# gating the pinned rows on the table's exact row count AND a
# content-dependent integer (count of positive first components —
# KMEANS_GATE_POS1; different-content same-shape corpora close the gate).
# Regenerate with `python -m tokenzip pins`.
KMEANS_GATE_POS1 = 254
KMEANS_SIZES_PIN = [
    (0, 52, 13711),
    (1, 66, 16458),
    (2, 62, 17444),
    (3, 60, 14419),
    (4, 63, 17378),
    (5, 62, 13350),
    (6, 64, 14672),
    (7, 71, 17318),
]


class _KMeansAssignStage:
    """Per-batch nearest-centroid assignment partials: (cluster_id,
    n_vectors, modular vec_id checksum) — broadcast centroids fetched once
    per actor, counts bounded by n_clusters per batch."""

    def __init__(self, centroids_ref):
        self.cent = _bget(centroids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        assign = np.argmax(emb @ self.cent.T, axis=1)
        k = len(self.cent)
        chk = np.zeros(k, np.int64)
        np.add.at(chk, assign, ids % _PAIR_MOD)
        return pa.table(
            {
                "cluster_id": pa.array(np.arange(k, dtype=np.int64)),
                "n_vectors": pa.array(
                    np.bincount(assign, minlength=k).astype(np.int64)
                ),
                "id_checksum": pa.array(chk % _PAIR_MOD),
            }
        )


def q_embedding_kmeans_sizes(sf_dir: str, n_clusters: int = 8) -> pd.DataFrame:
    """K-means cluster census over the embeddings table: the same seeded
    bounded-sample Lloyd training the IVF queries use, then ONE streaming
    assignment pass (broadcast centroids, per-batch argmax + bincount
    partials, an n_clusters-domain groupby). Deterministic end to end, so
    the oracle pins (cluster_id, n_vectors, vec_id-checksum) rows gated on
    the table's exact row count — a drifted pin goes red, never silently
    green. Returns (cluster_id, n_vectors, id_checksum), empty clusters
    included."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    cent = _train_centroids(path, n_clusters)
    out = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            _KMeansAssignStage,
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=max(2, _default_concurrency() // 2),
            fn_constructor_kwargs={"centroids_ref": _bcast(cent)},
        )
        .groupby("cluster_id")
        .aggregate(
            Sum("n_vectors", alias_name="n_vectors"),
            Sum("id_checksum", alias_name="id_checksum"),
        )
        .to_pandas()
    )
    out["n_vectors"] = out["n_vectors"].astype("int64")
    out["id_checksum"] = (out["id_checksum"].astype("int64")) % _PAIR_MOD
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return (
        out[["cluster_id", "n_vectors", "id_checksum"]]
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )


def embedding_kmeans_sizes_sql() -> str:
    """Self-auditing pinned oracle: the pinned census rows appear only when
    the embeddings table's exact COUNT(*) equals the pinned total."""
    total = sum(n for _, n, _ in KMEANS_SIZES_PIN)
    rows = ",".join(f"({c}, {n}, {chk})" for c, n, chk in KMEANS_SIZES_PIN)
    return f"""
WITH pin(cluster_id, n_vectors, id_checksum) AS (VALUES {rows})
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(n_vectors AS BIGINT) AS n_vectors,
       CAST(id_checksum AS BIGINT) AS id_checksum
FROM pin
WHERE (SELECT COUNT(*) FROM embeddings) = {total}
  AND (SELECT SUM(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
       FROM embeddings) = {KMEANS_GATE_POS1}
ORDER BY cluster_id
"""


def _train_centroids(path: str, n_clusters: int) -> np.ndarray:
    """Seeded k-means (4 Lloyd iterations) on a BOUNDED sample (first row
    groups up to _IVF_TRAIN_ROWS rows — at 100 TB this reads a fixed number
    of row groups, never the table). Deterministic: fixed seed + float64."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # sharded table: the bounded sample reads row groups from the first
        # shard only — same "fixed number of row groups" contract
        shards = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        path = shards[0]
    f = pq.ParquetFile(path)
    parts, have = [], 0
    for rg in range(f.num_row_groups):
        parts.append(f.read_row_group(rg, columns=["embedding"]))
        have += parts[-1].num_rows
        if have >= _IVF_TRAIN_ROWS:
            break
    head = pa.concat_tables(parts).slice(0, _IVF_TRAIN_ROWS)
    emb = _emb_matrix(head["embedding"])
    rng = np.random.default_rng(42)
    cent = emb[rng.choice(len(emb), size=min(n_clusters, len(emb)), replace=False)]
    for _ in range(4):  # seeded Lloyd iterations (deterministic)
        assign = np.argmax(emb @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = emb[m].mean(axis=0)
    return cent


def q_embedding_topk_ivf(sf_dir: str, k: int = 10, n_clusters: int = 8, n_probe: int = 3):
    """IVF-bucketed approximate top-k + recall vs the brute-force result.
    Seeded k-means (4 Lloyd iterations) trains centroids on a BOUNDED sample
    (first row groups up to _IVF_TRAIN_ROWS rows — at 100 TB this reads a
    fixed number of row groups, never the table); the query vector comes
    from a statistics-pruned filtered read. The recall row is deterministic
    (fixed corpus + seed), pinned by the constant SQL oracle. Returns one
    row: (k, n_probe, n_clusters, recall_pct_x100, n_found)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    cent = _train_centroids(path, n_clusters)
    qv = _fetch_query_vector(path)
    qn = qv / np.linalg.norm(qv)
    probe_ids = np.argsort(-(cent @ qn))[:n_probe]

    cent_ref, q_ref = _bcast(cent), _bcast(qv)
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _IVFStage,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=max(2, _default_concurrency() // 2),
        fn_constructor_kwargs={
            "centroids_ref": cent_ref,
            "query_ref": q_ref,
            "probe_ids": probe_ids.tolist(),
            "k": k,
        },
    ).to_pandas()
    approx = set(
        partials.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)["vec_id"].astype(int)
    )
    exact = set(q_embedding_topk(sf_dir, k)["vec_id"].astype(int))
    recall = len(approx & exact) / max(1, len(exact))
    return pd.DataFrame(
        [{"k": k, "n_probe": n_probe, "n_clusters": n_clusters,
          "recall_pct_x100": int(round(recall * 10000)), "n_found": len(approx)}]
    )


class _CosinePairStage:
    """Per-batch exact embedding-cosine NEAR-DUP pairs against the
    broadcast normalized matrix (ray.put once, fetched once per actor):
    one float64 matmul per batch, upper triangle selected by vec_id
    comparison, sparse nonzero() so only matching pairs materialize.

    Partitioning assumption (SURVEY §4.2): the broadcast side is the FULL
    normalized matrix (n x d float64) — exact all-pairs is the
    bounded-corpus variant. At 100 TB, bucket by coarse IVF centroid (the
    _IVFStage layout) and verify within probed buckets instead."""

    def __init__(self, mat_ref, ids_ref, tau_num: int, tau_den: int):
        self.M = _bget(mat_ref)
        self.ids = _bget(ids_ref)
        self.tau = tau_num / tau_den

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and int(ids.min()) < 0:
            raise ValueError("dedup_embedding requires non-negative vec_id")
        if len(ids) == 0 or self.M.shape[0] == 0:
            return pa.table(
                {"n_vecs": pa.array([len(ids)], pa.int64()),
                 "n_dup": pa.array([0], pa.int64()),
                 "chk": pa.array([0], pa.int64())}
            )
        norms = np.linalg.norm(emb, axis=1)
        emb = emb / np.where(norms == 0, 1.0, norms)[:, None]
        cos = emb @ self.M.T
        mask = (cos >= self.tau) & (self.ids[None, :] > ids[:, None])
        r, c = np.nonzero(mask)
        am = (ids % _PAIR_MOD).astype(np.int64)
        bm = (self.ids % _PAIR_MOD).astype(np.int64)
        chk = int(((am[r] * _PAIR_K % _PAIR_MOD + bm[c]) % _PAIR_MOD).sum()
                  % _PAIR_MOD)
        return pa.table(
            {"n_vecs": pa.array([len(ids)], pa.int64()),
             "n_dup": pa.array([len(r)], pa.int64()),
             "chk": pa.array([chk], pa.int64())}
        )


def q_dedup_embedding(sf_dir: str, tau=(2, 5)):
    """Embedding-cosine near-dup over the embeddings table: pairs with
    cosine >= tau (default 0.4 — chosen >=1e-4 away from every pair at the
    oracle scale, so float64 summation-order noise (~1e-15) can never flip
    a pair). Exact all-pairs via broadcast-matrix matmuls distributed over
    batches; the float threshold itself never surfaces — outputs are
    integer (n_vecs, n_dup_pairs, pair_checksum), matching the DuckDB
    self-join oracle's modular arithmetic. Returns one row."""
    import pyarrow.parquet as pq

    num, den = tau
    path = os.path.join(sf_dir, "embeddings.parquet")
    # broadcast side (documented bound — see _CosinePairStage): pruned
    # column read, normalized once, shipped once via the object store
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    M = _emb_matrix(t["embedding"])
    if len(M):
        norms = np.linalg.norm(M, axis=1)
        M = M / np.where(norms == 0, 1.0, norms)[:, None]
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat_ref, ids_ref = _bcast(M), _bcast(ids)

    agg = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            _CosinePairStage,
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=max(2, _default_concurrency() // 2),
            fn_constructor_kwargs={
                "mat_ref": mat_ref, "ids_ref": ids_ref,
                "tau_num": num, "tau_den": den,
            },
        )
        .sum(["n_vecs", "n_dup", "chk"])
    ) or {"sum(n_vecs)": 0, "sum(n_dup)": 0, "sum(chk)": 0}
    return pd.DataFrame(
        [
            {
                "n_vecs": int(agg["sum(n_vecs)"] or 0),
                "n_dup_pairs": int(agg["sum(n_dup)"] or 0),
                "pair_checksum": int(agg["sum(chk)"] or 0) % _PAIR_MOD,
            }
        ]
    )


class _IVFAssignStage:
    """Scale-path near-dup stage 1: assign each vector to its ``n_assign``
    nearest coarse centroids (broadcast once per actor — C x d, tiny) and
    emit one row per (cluster, vector) replica carrying the NORMALIZED
    embedding. The shuffle that follows moves each vector exactly
    ``n_assign`` times — never a full-matrix broadcast; bucket sizes are
    bounded by n/C (choose C ~ sqrt(n) at scale), the same inverted-file
    layout as _IVFStage."""

    def __init__(self, centroids_ref, n_assign: int):
        self.cent = _bget(centroids_ref)
        self.p = n_assign

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        if n and int(ids.min()) < 0:
            raise ValueError("dedup_embedding_ivf requires non-negative vec_id")
        if n == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int32()),
                    "is_primary": pa.array([], pa.int8()),
                    "vec_id": pa.array([], pa.int64()),
                    "v": pa.array([], pa.list_(pa.float64())),
                }
            )
        norms = np.linalg.norm(emb, axis=1)
        emb = emb / np.where(norms == 0, 1.0, norms)[:, None]
        p = min(self.p, len(self.cent))
        sim = emb @ self.cent.T
        # top-p clusters per vector, deterministic ties by cluster index
        near = np.argsort(-sim, axis=1, kind="stable")[:, :p]  # (n, p)
        dim = emb.shape[1]
        rep = emb[np.repeat(np.arange(n), p)]
        flat = rep.reshape(-1)
        offs = np.arange(n * p + 1, dtype=np.int64) * dim
        v = pa.ListArray.from_arrays(
            pa.array(offs, pa.int64()).cast(pa.int32()),
            pa.array(flat, pa.float64()),
        )
        # every replica carries the vector's FULL assignment set (p small
        # ints) so the bucket verify can apply the lowest-common-cluster
        # ownership rule (pair counted once, in min(assign(a) & assign(b)))
        assign_rep = np.repeat(near.astype(np.int32), p, axis=0).reshape(-1)
        a_offs = np.arange(n * p + 1, dtype=np.int32) * p
        assign = pa.ListArray.from_arrays(
            pa.array(a_offs, pa.int32()), pa.array(assign_rep, pa.int32())
        )
        return pa.table(
            {
                "cluster": pa.array(near.reshape(-1).astype(np.int32), pa.int32()),
                "is_primary": pa.array(
                    (np.tile(np.arange(p), n) == 0).astype(np.int8), pa.int8()
                ),
                "vec_id": pa.array(np.repeat(ids, p), pa.int64()),
                "v": v,
                "assign": assign,
            }
        )


def _ivf_bucket_pairs(tau: float):
    """Within-bucket exact all-pairs verify with lowest-common-cluster pair
    ownership: multi-assignment replicates vectors across buckets, so a pair
    (a < b) co-located in several buckets is counted ONLY in the bucket
    whose cluster id is min(assign(a) & assign(b)). Recall is therefore
    P(assign(a) & assign(b) != {}) — a pair is found whenever the two
    vectors share ANY of their n_assign nearest centroids (strictly better
    than the primary-in-other's-list rule), and counted exactly once."""

    def fn(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "n_primary": pa.array([0], pa.int64()),
                    "n_dup": pa.array([0], pa.int64()),
                    "chk": pa.array([0], pa.int64()),
                }
            )
        prim = g["is_primary"].to_numpy(zero_copy_only=False).astype(bool)
        cluster = int(g["cluster"][0].as_py())
        acol = g["assign"].combine_chunks()
        acol = acol if isinstance(acol, pa.ListArray) else acol.chunk(0)
        p = len(acol[0])
        # flatten() honors any slice offset; .values would misalign a slice
        A = acol.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        A = A.reshape(len(ids), p)
        M = _emb_matrix(g["v"])
        cos = M @ M.T
        mask = (cos >= tau) & (ids[None, :] > ids[:, None])
        r, c = np.nonzero(mask)
        if len(r):
            # min common cluster of each candidate pair: (m, p, p) compare,
            # non-matching slots masked to a sentinel above any cluster id
            big = np.int64(np.iinfo(np.int64).max)
            eq = A[r][:, :, None] == A[c][:, None, :]
            mc = np.where(eq, A[r][:, :, None], big).min(axis=(1, 2))
            keep = mc == cluster
            r, c = r[keep], c[keep]
        am = ids % _PAIR_MOD
        chk = int(((am[r] * _PAIR_K % _PAIR_MOD + am[c]) % _PAIR_MOD).sum() % _PAIR_MOD)
        return pa.table(
            {
                "n_primary": pa.array([int(prim.sum())], pa.int64()),
                "n_dup": pa.array([len(r)], pa.int64()),
                "chk": pa.array([chk], pa.int64()),
            }
        )

    return fn


# IVF near-dup pins: the FOUND side of the recall audit at the oracle scale
# (sf0.01 embeddings table, default parameters). Deterministic (fixed corpus,
# seeded k-means, float64); the SQL oracle recomputes the EXACT pair set
# itself and only emits these constants when that exact count matches
# `exact`, so corpus/codec drift turns the row red instead of silently
# green. Regenerate with `python -m tokenzip pins`.
EMB_DEDUP_IVF_PIN = {"exact": 59, "found": 59, "chk": 726048900}


def q_dedup_embedding_ivf(
    sf_dir: str,
    tau=(2, 5),
    n_clusters: int = 4,
    n_assign: int = 3,
    audit: bool = True,
):
    """Embedding-cosine near-dup, IVF-bucketed (the 100-TB scale path of
    q_dedup_embedding): coarse centroids trained on a bounded sample and
    broadcast; each vector shuffled to its ``n_assign`` nearest-centroid
    buckets; exact all-pairs verify WITHIN buckets with primary-bucket pair
    ownership (no double counting). Nothing broadcasts the corpus and no
    stage is quadratic beyond a bucket (bound buckets by n/C; C ~ sqrt(n)
    at scale).

    ``audit=True`` additionally runs the exact all-pairs query and reports
    recall — the oracle-scale audit (run audit=False, or audit a sampled
    slice, at corpus scale). Returns one row: (n_vecs, n_dup_exact,
    n_dup_found, pair_checksum_found, recall_pct_x100)."""
    num, den = tau
    path = os.path.join(sf_dir, "embeddings.parquet")
    cent = _train_centroids(path, n_clusters)
    cent_ref = _bcast(cent)

    parts = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            _IVFAssignStage,
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=max(2, _default_concurrency() // 2),
            fn_constructor_kwargs={"centroids_ref": cent_ref, "n_assign": n_assign},
        )
        .groupby("cluster")
        .map_groups(_ivf_bucket_pairs(num / den), batch_format="pyarrow")
        .sum(["n_primary", "n_dup", "chk"])
    ) or {"sum(n_primary)": 0, "sum(n_dup)": 0, "sum(chk)": 0}
    n_vecs = int(parts["sum(n_primary)"] or 0)
    found = int(parts["sum(n_dup)"] or 0)
    chk = int(parts["sum(chk)"] or 0) % _PAIR_MOD
    row = {
        "n_vecs": n_vecs,
        "n_dup_found": found,
        "pair_checksum_found": chk,
    }
    if audit:
        exact = int(q_dedup_embedding(sf_dir, tau)["n_dup_pairs"].iloc[0])
        row["n_dup_exact"] = exact
        row["recall_pct_x100"] = (10000 * found) // exact if exact else 10000
    return pd.DataFrame([row])[
        ["n_vecs", "n_dup_exact", "n_dup_found", "pair_checksum_found",
         "recall_pct_x100"]
        if audit
        else ["n_vecs", "n_dup_found", "pair_checksum_found"]
    ]


# ---------------------------------------------------------------------------
# Text quality metrics (exact-arithmetic columns so the SQL oracle matches)
# ---------------------------------------------------------------------------


class _QualityStage:
    def __init__(self):
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        words = [t.split(" ") for t in texts]
        n_words = np.array([len(w) for w in words], dtype=np.int64)
        n_stop = np.array(
            [sum(1 for x in w if x in self.stop) for w in words], dtype=np.int64
        )
        df = pd.DataFrame(
            {"lang": langs, "n_chars": n_chars, "n_words": n_words, "n_stop": n_stop}
        )
        agg = df.groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"),
            sum_chars=("n_chars", "sum"),
            sum_words=("n_words", "sum"),
            sum_stopwords=("n_stop", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_text_quality_by_lang(sf_dir: str):
    """Per-language quality aggregates: doc/char/word/stopword counts.
    (The per-doc quality *score* — length/stopword-ratio — is derived from
    these; integer sums keep the oracle hash-stable.)"""
    ds = _docs(sf_dir, ["lang", "text", "n_chars"])
    partials = ds.map_batches(
        _cached("quality", _QualityStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    return (
        partials.groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
            Sum("sum_words", alias_name="sum_words"),
            Sum("sum_stopwords", alias_name="sum_stopwords"),
        )
        .sort("lang")
    )


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex segmentation
# ---------------------------------------------------------------------------

# simple ASCII alternation so Python's re and DuckDB's RE2 segment
# identically: letter runs | single digits | single punctuation | space runs
TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]| +"


class _TokenCountStage:
    """Per-batch PARTIAL (lang, n_docs, n_ws_tokens, n_re_tokens): the
    compiled regex lives in the worker (once), counts are pre-aggregated
    before the tiny global groupby."""

    def __init__(self):
        import re

        self.pat = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        ws = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
        rx = np.array([len(self.pat.findall(t)) for t in texts], dtype=np.int64)
        df = pd.DataFrame({"lang": langs, "ws": ws, "rx": rx})
        agg = df.groupby("lang", as_index=False).agg(
            n_docs=("ws", "size"), n_ws_tokens=("ws", "sum"), n_re_tokens=("rx", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)


def q_token_counts_by_lang(sf_dir: str):
    """Whitespace + BPE-ish-regex token counts per language — the token
    accounting a training-data pipeline runs before budgeting; both
    tokenizations are oracle-checked (DuckDB regexp_extract_all runs the
    identical pattern)."""
    ds = _docs(sf_dir, ["lang", "text"])
    partials = ds.map_batches(
        _cached("tokcount", _TokenCountStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )
    out = (
        partials.groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_ws_tokens", alias_name="n_ws_tokens"),
            Sum("n_re_tokens", alias_name="n_re_tokens"),
        )
        .sort("lang")
        .to_pandas()
    )
    for c in ("n_docs", "n_ws_tokens", "n_re_tokens"):
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Near-duplicate detection: MinHash + LSH banding (fully distributed)
# ---------------------------------------------------------------------------

_MH_K = 64          # minhash permutations
_MH_BANDS = 32      # 32 bands x 2 rows: P(candidate | J=0.7) = 1-(1-0.49)^32
                    # ~ 1 - 4e-10, so >=0.7 pairs are LSH candidates w.h.p.
                    # and the exact-Jaccard SQL oracle matches the verified set
# Mersenne prime 2^31-1: coefficients < 2^31 and (shingle mod p) < 2^31 keep
# a*x + b < 2^62, so the whole (k, m) permutation matrix stays in exact
# uint64 arithmetic — no object-dtype fallback
_MH_PRIME = (1 << 31) - 1
_PAIR_MOD = 1_000_000_007  # pair/signature checksums: SUM(term % M) % M,
                           # overflow-safe in int64 partials AND in SQL HUGEINT


_HB = np.uint64(1099511628211)            # polynomial base (odd => invertible mod 2^64)
_HB_INV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer: decorrelates the structured polynomial hashes."""
    z = z + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _shingle_hash_batch(col, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT 64-bit word-3-gram hashes for a whole Arrow string
    column, fully vectorized — zero per-gram Python. Key identity: with
    split-on-' ' semantics (exactly DuckDB's string_split), the gram
    ' '.join(words[i:i+3]) IS the byte substring of the original text from
    word-start i to word-end i+2, so gram hashes are substring hashes:
    one prefix polynomial over the batch's flat UTF-8 bytes, O(1) per gram
    via modular-inverse differencing (B odd => invertible mod 2^64), then a
    SplitMix64 finalizer. Distinctness via one lexsort over (doc, hash).
    Returns (doc_offsets[n_docs+1], hashes) with hashes ASCENDING per doc.
    Collisions vs the oracle's string sets: ~2^-64 per gram pair, negligible
    (same argument as the previous md5-based hashing)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    nd = len(col)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + nd + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    flat = (
        np.frombuffer(buf, dtype=np.uint8)[offs[0] : offs[-1]]
        if buf is not None
        else np.empty(0, np.uint8)
    )
    doc_start = offs - offs[0]  # rebased, len nd+1
    N = len(flat)

    # word boundaries: a word starts at each doc start and after each space
    sp = np.flatnonzero(flat == 32)
    sp_doc = np.searchsorted(doc_start, sp, side="right") - 1
    n_words = np.bincount(sp_doc, minlength=nd).astype(np.int64) + 1
    w_off = np.zeros(nd + 1, np.int64)
    np.cumsum(n_words, out=w_off[1:])
    ws = np.empty(int(w_off[-1]), np.int64)
    ws[w_off[:-1]] = doc_start[:-1]
    if len(sp):
        first_sp = np.zeros(nd, np.int64)
        np.cumsum(np.bincount(sp_doc, minlength=nd)[:-1], out=first_sp[1:])
        rank = np.arange(len(sp), dtype=np.int64) - first_sp[sp_doc]
        ws[w_off[sp_doc] + 1 + rank] = sp + 1
    we = np.empty_like(ws)
    if len(ws) > 1:
        we[:-1] = ws[1:] - 1
    we[w_off[1:] - 1] = doc_start[1:]  # last word of each doc ends at doc end

    # gram spans: docs with < n words contribute ONE gram = the whole text
    # (' '.join(words) == text); otherwise W-2 grams [ws[i], we[i+2])
    n_grams = np.where(n_words < n, 1, n_words - (n - 1))
    g_off = np.zeros(nd + 1, np.int64)
    np.cumsum(n_grams, out=g_off[1:])
    tg = int(g_off[-1])
    doc_of_g = np.repeat(np.arange(nd, dtype=np.int64), n_grams)
    local_i = np.arange(tg, dtype=np.int64) - np.repeat(g_off[:-1], n_grams)
    small = n_words[doc_of_g] < n
    l = np.where(small, doc_start[:-1][doc_of_g], 0)
    r = np.where(small, doc_start[1:][doc_of_g], 0)
    big = ~small
    if big.any():
        wbase = w_off[doc_of_g[big]]
        li = local_i[big]
        l[big] = ws[wbase + li]
        r[big] = we[wbase + li + (n - 1)]

    # substring hashes via inverse-power prefix sums:
    # H(l, r) = (Q[r] - Q[l]) * B^(r-1), Q[i] = sum_{j<i} byte_j * Binv^j
    with np.errstate(over="ignore"):
        binv_pow = np.ones(N, np.uint64)
        bpow = np.ones(N + 1, np.uint64)
        if N:
            np.cumprod(np.full(N - 1, _HB_INV, np.uint64), out=binv_pow[1:])
            np.cumprod(np.full(N, _HB, np.uint64), out=bpow[1:])
        q = np.zeros(N + 1, np.uint64)
        if N:
            np.cumsum(flat.astype(np.uint64) * binv_pow, out=q[1:])
        h = (q[r] - q[l]) * bpow[np.maximum(r - 1, 0)]
        # length-salt so e.g. 'ab'+'' and 'a'+'b' style extensions differ,
        # then finalize
        h = _splitmix64(h + (r - l).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))

    # distinct per doc: one lexsort, keep doc-change or hash-change positions
    order = np.lexsort((h, doc_of_g))
    hs, ds_ = h[order], doc_of_g[order]
    keep = np.ones(tg, dtype=bool)
    if tg > 1:
        keep[1:] = (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])
    hs, ds_ = hs[keep], ds_[keep]
    out_off = np.zeros(nd + 1, np.int64)
    np.cumsum(np.bincount(ds_, minlength=nd), out=out_off[1:])
    return out_off, hs


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Single-doc convenience wrapper over the vectorized batch hasher."""
    off, h = _shingle_hash_batch(pa.array([text], pa.string()), n)
    return h[off[0] : off[1]]


def _doc_count(sf_dir: str) -> int:
    """Row count of the documents table from parquet METADATA only."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def _lsh_n_buckets(n_rows: int, target: int = 32768) -> int:
    """Bucket count for the LSH shuffle: power of two sized so one bucket
    group holds ~target tiny rows. Ray's sort-based ``map_groups`` degrades
    with MANY tiny groups (~16k groups/s); hashing the (band, band_hash)
    key space down to ~n_rows/target buckets keeps group count bounded and
    per-group work vectorized, while bucket size stays constant as the
    corpus grows (the count scales with n_rows)."""
    nb = 1 << max(0, int(n_rows / target).bit_length())
    return int(min(max(nb, 16), 1 << 20))


def _group_runs(*keys: np.ndarray):
    """Lexsort rows by the given key arrays and return (order, starts, ends)
    of the runs with length >= 2 (singleton groups — the vast majority in an
    LSH shuffle — are skipped without any per-group Python)."""
    order = np.lexsort(keys[::-1])
    n = len(order)
    if n == 0:
        return order, np.empty(0, np.int64), np.empty(0, np.int64)
    chg = np.zeros(n - 1, dtype=bool)
    for k in keys:
        ks = k[order]
        chg |= ks[1:] != ks[:-1]
    starts = np.concatenate(([0], np.flatnonzero(chg) + 1))
    ends = np.concatenate((starts[1:], [n]))
    multi = (ends - starts) >= 2
    return order, starts[multi], ends[multi]


class _MinHashStage:
    """Per-doc MinHash signature -> one TINY row per LSH band:
    (band, band_hash, doc_id, sk1, sk2, n_sh) — ~44 bytes/row, so the band
    shuffle moves signatures only, never shingle sets (the round-2 32x
    content amplification is gone). (sk1, sk2) is a 128-bit shingle-SET key
    (two independent polynomial hashes over the sorted hash array): docs
    with equal set keys have identical shingle sets w.h.p., which is what
    bucket-side viral collapse groups on. Shingle-count stats ride along as
    n_sh, so ONE pass over the corpus computes signatures AND stats.
    Everything is batch-vectorized: one (K, total_grams) permutation matrix
    + minimum.reduceat at doc boundaries. Coefficients are seeded, built
    once per worker."""

    def __init__(self, seed: int = 42, nb: int = 256):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MH_PRIME, _MH_K, dtype=np.uint64)
        self.b = rng.integers(0, _MH_PRIME, _MH_K, dtype=np.uint64)
        self.nb = np.uint64(nb - 1)  # power-of-two mask for the bkt column

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(_MH_K, _MH_PRIME, dtype=np.uint64)
        x = sh % np.uint64(_MH_PRIME)
        v = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MH_PRIME)
        return v.min(axis=1)

    def signatures_batch(self, off: np.ndarray, hs: np.ndarray) -> np.ndarray:
        """(K, n_docs) signature matrix for per-doc hash segments."""
        nd = len(off) - 1
        if len(hs) == 0:
            return np.full((_MH_K, nd), _MH_PRIME, dtype=np.uint64)
        x = hs % np.uint64(_MH_PRIME)
        v = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MH_PRIME)
        sig = np.minimum.reduceat(v, off[:-1], axis=1)
        empty = off[1:] == off[:-1]  # reduceat misreads empty segments
        if empty.any():
            sig[:, empty] = _MH_PRIME
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        off, hs = _shingle_hash_batch(batch["text"])
        nd = batch.num_rows
        sig = self.signatures_batch(off, hs)
        r = _MH_K // _MH_BANDS
        with np.errstate(over="ignore"):
            # band hash: splitmix-finalized polynomial over the band's rows
            bh = np.zeros((_MH_BANDS, nd), np.uint64)
            for band in range(_MH_BANDS):
                acc = np.uint64(band + 1)
                for row in range(band * r, (band + 1) * r):
                    acc = acc * _HB + sig[row]
                bh[band] = _splitmix64(acc)
            # 128-bit set key: two polynomial hashes over the SORTED hashes
            # position-rebased differencing (x B^(r-1)) so the key depends
            # only on the doc's own sorted hash sequence, not its offset
            M = len(hs)
            q1 = np.zeros(M + 1, np.uint64)
            q2 = np.zeros(M + 1, np.uint64)
            p1 = np.ones(M + 1, np.uint64)
            p2 = np.ones(M + 1, np.uint64)
            b2 = np.uint64(0x9E3779B97F4A7C15 | 1)
            if M:
                inv1 = np.ones(M, np.uint64)
                np.cumprod(np.full(M - 1, _HB_INV, np.uint64), out=inv1[1:])
                np.cumsum(hs * inv1, out=q1[1:])
                np.cumprod(np.full(M, _HB, np.uint64), out=p1[1:])
                b2inv = np.uint64(pow(int(b2), -1, 1 << 64))
                inv2 = np.ones(M, np.uint64)
                np.cumprod(np.full(M - 1, b2inv, np.uint64), out=inv2[1:])
                np.cumsum(hs * inv2, out=q2[1:])
                np.cumprod(np.full(M, b2, np.uint64), out=p2[1:])
            n_sh = (off[1:] - off[:-1]).astype(np.int64)
            rm1 = np.maximum(off[1:] - 1, 0)
            h1 = (q1[off[1:]] - q1[off[:-1]]) * p1[rm1]
            h2 = (q2[off[1:]] - q2[off[:-1]]) * p2[rm1]
            sk1 = _splitmix64(h1 + n_sh.astype(np.uint64))
            sk2 = _splitmix64(h2 ^ n_sh.astype(np.uint64))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # the intra-cluster sentinel row uses a = -1, and the SQL oracles
        # compute % on non-negative ids — reject negatives loudly (same
        # contract as dedup_exact's _hash_key_rows guard)
        if len(ids) and int(ids.min()) < 0:
            raise ValueError("dedup_minhash requires non-negative doc_id")
        bh_flat = bh.reshape(-1)
        return pa.table(
            {
                # bkt: hash-bucketed shuffle key — band_hash is already
                # splitmix-finalized (uniform), so a low-bit mask suffices;
                # same (band, band_hash) group => same bucket
                "bkt": pa.array((bh_flat & self.nb).astype(np.int32), pa.int32()),
                "band": pa.array(
                    np.repeat(np.arange(_MH_BANDS, dtype=np.int32), nd), pa.int32()
                ),
                "band_hash": pa.array(bh_flat.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.tile(ids, _MH_BANDS), pa.int64()),
                "sk1": pa.array(np.tile(sk1.view(np.int64), _MH_BANDS), pa.int64()),
                "sk2": pa.array(np.tile(sk2.view(np.int64), _MH_BANDS), pa.int64()),
                "n_sh": pa.array(np.tile(n_sh, _MH_BANDS), pa.int64()),
            }
        )


_PAIR_K = 1_000_003  # pair term = (a * K + b) % _PAIR_MOD


def _cross_pair_chk(A: np.ndarray, B: np.ndarray) -> int:
    """Closed-form sum over all cross pairs {x in A, y in B} of
    (min*K + max) mod P — vectorized via rank counting, never O(|A||B|).

    All per-term arithmetic folds mod P BEFORE multiplying so int64 never
    wraps: ids are reduced mod P (<2^30), (id*K)%P < 2^30, and the per-term
    products (<2^30 value x <2^33 multiplicity) stay under 2^63 — matching
    the DuckDB oracle's HUGEINT per-term modular sums at any doc_id scale."""
    A = np.sort(A)
    B = np.sort(B)
    gtB = len(B) - np.searchsorted(B, A, side="right")  # b > a per a
    ltB = np.searchsorted(B, A, side="left")            # b < a per a
    gtA = len(A) - np.searchsorted(A, B, side="right")
    ltA = np.searchsorted(A, B, side="left")
    Am = A % _PAIR_MOD
    Bm = B % _PAIR_MOD
    AK = Am * _PAIR_K % _PAIR_MOD
    BK = Bm * _PAIR_K % _PAIR_MOD
    total = (
        int((AK * gtB % _PAIR_MOD).sum()) + int((Am * ltB % _PAIR_MOD).sum())
        + int((BK * gtA % _PAIR_MOD).sum()) + int((Bm * ltA % _PAIR_MOD).sum())
    )
    return total % _PAIR_MOD


def _intra_pair_chk(ids: np.ndarray) -> int:
    """Closed-form sum over all intra pairs i<j of (ids_i*K + ids_j) mod P
    for SORTED ids (per-term modular folds: see _cross_pair_chk)."""
    k = len(ids)
    j = np.arange(k, dtype=np.int64)
    m = ids % _PAIR_MOD
    total = (
        int(((m * _PAIR_K % _PAIR_MOD) * (k - 1 - j) % _PAIR_MOD).sum())
        + int((m * j % _PAIR_MOD).sum())
    )
    return total % _PAIR_MOD


_PAIR_EMPTY = {c: pd.Series([], dtype="int64")
               for c in ("pbkt", "a", "b", "dup", "w_pairs", "w_chk")}


def _with_pbkt(rows: dict, nb: int) -> pd.DataFrame:
    """Attach the pair-dedupe bucket key: hash of (a, b) masked to nb
    buckets, so the cross-band duplicate elimination is a bounded-key
    groupby instead of one group per distinct pair."""
    df = pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})
    with np.errstate(over="ignore"):
        key = _splitmix64(
            df["a"].to_numpy().view(np.uint64) * np.uint64(0x9E3779B97F4A7C17)
            + df["b"].to_numpy().view(np.uint64)
        )
    df.insert(0, "pbkt", (key & np.uint64(nb - 1)).astype(np.int64))
    return df


def _pair_dedupe(g: pd.DataFrame) -> pd.DataFrame:
    """One pbkt bucket = many (a, b) pair keys; rows repeated across bands
    are IDENTICAL (cluster keys are global), so per-key Max == dedupe.
    Vectorized: one lexsort + maximum.reduceat, no per-pair Python."""
    a = g["a"].to_numpy().astype(np.int64)
    b = g["b"].to_numpy().astype(np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    n = len(a)
    newk = np.ones(n, dtype=bool)
    if n > 1:
        newk[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(newk)
    out = {"a": a[starts], "b": b[starts]}
    for c in ("dup", "w_pairs", "w_chk"):
        v = g[c].to_numpy().astype(np.int64)[order]
        out[c] = np.maximum.reduceat(v, starts) if n else v
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


def _mh_group_rows(band: int, ids: np.ndarray, sk1: np.ndarray,
                   sk2: np.ndarray, rows: dict) -> None:
    """Candidate generation for ONE colliding (band, band_hash) group of
    signature-only rows, with VIRAL-CLUSTER COLLAPSE on the 128-bit shingle
    set key: docs with identical set keys form a cluster — intra-cluster
    pairs (identical sets => J=1) are emitted as ONE closed-form weighted
    row (band 0 only: identical sets collide in every band), cross-cluster
    pairs become ONE representative row with dup=-1 (unknown, verified
    downstream against real shingle sets) carrying |G1|x|G2| weight and the
    closed-form pair checksum. A k-clone cluster costs O(k log k), and no
    shingle data rides this shuffle at all."""
    sk = np.stack([sk1, sk2], axis=1)
    _, first, inv = np.unique(sk, axis=0, return_index=True, return_inverse=True)
    ngroups = len(first)
    members = [np.sort(ids[inv == u]) for u in range(ngroups)]
    order = sorted(range(ngroups), key=lambda u: int(members[u][0]))
    if band == 0:
        for u in order:
            m = members[u]
            k = len(m)
            if k < 2:
                continue
            rows["a"].append(-1)
            rows["b"].append(int(m[0]))
            rows["dup"].append(1)
            rows["w_pairs"].append(k * (k - 1) // 2)
            rows["w_chk"].append(_intra_pair_chk(m))
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            A, B = members[order[x]], members[order[y]]
            rows["a"].append(int(min(A[0], B[0])))
            rows["b"].append(int(max(A[0], B[0])))
            rows["dup"].append(-1)
            rows["w_pairs"].append(len(A) * len(B))
            rows["w_chk"].append(_cross_pair_chk(A, B))


def _mh_bucket_candidates(nb: int):
    """One hash BUCKET of the LSH shuffle = MANY (band, band_hash) groups.
    Groups are split vectorized (one lexsort + run-length boundaries);
    singleton groups — the vast majority — cost zero per-group Python, and
    only genuinely colliding groups reach ``_mh_group_rows``. Emitted rows
    carry the pair-dedupe bucket key (see _with_pbkt)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy().astype(np.int64)
        bh = g["band_hash"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        sk1 = g["sk1"].to_numpy().astype(np.int64)
        sk2 = g["sk2"].to_numpy().astype(np.int64)
        order, starts, ends = _group_runs(band, bh)
        if not len(starts):
            return pd.DataFrame(_PAIR_EMPTY)
        band, bh, ids = band[order], bh[order], ids[order]
        sk1, sk2 = sk1[order], sk2[order]
        rows = {"a": [], "b": [], "dup": [], "w_pairs": [], "w_chk": []}
        for s, e in zip(starts, ends):
            _mh_group_rows(int(band[s]), ids[s:e], sk1[s:e], sk2[s:e], rows)
        if not rows["a"]:
            return pd.DataFrame(_PAIR_EMPTY)
        return _with_pbkt(rows, nb)

    return fn


def _jbkt_of(ids: np.ndarray, nbv: int) -> np.ndarray:
    """Hash-bucket key over doc ids (bounded-group-count joins)."""
    with np.errstate(over="ignore"):
        return (
            _splitmix64(ids.astype(np.int64).view(np.uint64))
            & np.uint64(nbv - 1)
        ).astype(np.int64)


class _CandShingleStage:
    """Filtered re-shingle scan: recompute shingle sets ONLY for candidate
    representative docs (broadcast sorted id array, fetched once per worker
    via the object store). At 100 TB this reads the full corpus once more
    but ships shingles for ~candidate-count docs only."""

    def __init__(self, ids_ref, nbv: int = 256):
        self.ids = _bget(ids_ref)
        self.nbv = nbv

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(self.ids, ids)
        pos[pos >= len(self.ids)] = 0
        mask = self.ids[pos] == ids if len(self.ids) else np.zeros(len(ids), bool)
        if not mask.any():
            return pa.table(
                {
                    "jdoc": pa.array([], pa.int64()),
                    "jbkt": pa.array([], pa.int64()),
                    "kbkt": pa.array([], pa.int64()),
                    "pkey": pa.array([], pa.string()),
                    "w_pairs": pa.array([], pa.int64()),
                    "w_chk": pa.array([], pa.int64()),
                    "shingles": pa.array([], pa.list_(pa.uint64())),
                }
            )
        sub = batch.filter(pa.array(mask))
        off, hs = _shingle_hash_batch(sub["text"])
        sub_ids = sub["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "jdoc": sub["doc_id"].cast(pa.int64()),
                "jbkt": pa.array(_jbkt_of(sub_ids, self.nbv)),
                "kbkt": pa.array(np.zeros(sub.num_rows, np.int64)),
                "pkey": pa.array([""] * sub.num_rows, pa.string()),
                "w_pairs": pa.array(np.zeros(sub.num_rows, np.int64)),
                "w_chk": pa.array(np.zeros(sub.num_rows, np.int64)),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(off, pa.int32()), pa.array(hs, pa.uint64())
                ),
            }
        )


_ATTACH_EMPTY = {
    "kbkt": pd.Series([], dtype="int64"),
    "pkey": pd.Series([], dtype="object"),
    "w_pairs": pd.Series([], dtype="int64"),
    "w_chk": pd.Series([], dtype="int64"),
    "shingles": pd.Series([], dtype="object"),
}


def _attach_shingles(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(jbkt): one bucket holds MANY jdocs — shingle rows
    (pkey == '') hash-join onto the pair-side rows via pandas merge (C
    hash join, no per-doc Ray group). A missing shingle side degrades to
    an empty set (the judge then fails closed)."""
    is_sh = g["pkey"] == ""
    sh = g.loc[is_sh, ["jdoc", "shingles"]]
    pairs = g.loc[~is_sh, ["jdoc", "kbkt", "pkey", "w_pairs", "w_chk"]]
    if not len(pairs):
        return pd.DataFrame(_ATTACH_EMPTY)
    out = pairs.merge(sh, on="jdoc", how="left")
    missing = out["shingles"].isna()
    if missing.any():
        empty = np.empty(0, np.uint64)
        out.loc[missing, "shingles"] = pd.Series(
            [empty] * int(missing.sum()), index=out.index[missing]
        )
    return pd.DataFrame(
        {
            "kbkt": out["kbkt"].to_numpy().astype(np.int64),
            "pkey": out["pkey"].to_numpy(),
            "w_pairs": out["w_pairs"].to_numpy().astype(np.int64),
            "w_chk": out["w_chk"].to_numpy().astype(np.int64),
            "shingles": out["shingles"].to_numpy(),
        }
    )


def _judge_pairs(threshold_num: int, threshold_den: int):
    """groupby(kbkt): one bucket holds MANY pkeys — sorted run-length split,
    then the exact-Jaccard verdict per pair (integer cross-multiplication,
    exactly the SQL oracle's comparison). Per-pair Python survives only for
    the set intersection itself; the per-pair Ray group overhead is gone."""

    def judge(g: pd.DataFrame) -> pd.DataFrame:
        empty = {c: pd.Series([], dtype="int64")
                 for c in ("a", "b", "dup", "w_pairs", "w_chk")}
        if not len(g):
            return pd.DataFrame(empty)
        g = g.sort_values("pkey", kind="stable")
        pk = g["pkey"].to_numpy()
        newk = np.ones(len(pk), dtype=bool)
        newk[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(newk)
        ends = np.concatenate((starts[1:], [len(pk)]))
        sh = g["shingles"].to_numpy()
        wp = g["w_pairs"].to_numpy().astype(np.int64)
        wc = g["w_chk"].to_numpy().astype(np.int64)
        rows = {"a": [], "b": [], "dup": [], "w_pairs": [], "w_chk": []}
        for s, e in zip(starts, ends):
            a, b = (int(x) for x in pk[s].split("|"))
            sets = [np.asarray(x, dtype=np.uint64) for x in sh[s : min(e, s + 2)]]
            if e - s < 2:  # missing side => shingle scan bug; fail closed
                dup = 0
            else:
                inter = len(np.intersect1d(sets[0], sets[1], assume_unique=True))
                union = len(sets[0]) + len(sets[1]) - inter
                dup = int(
                    threshold_den * inter >= threshold_num * union if union else True
                )
            rows["a"].append(a)
            rows["b"].append(b)
            rows["dup"].append(dup)
            rows["w_pairs"].append(int(wp[s:e].max()))
            rows["w_chk"].append(int(wc[s:e].max()))
        return pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
        )

    return judge


def q_dedup_minhash(sf_dir: str, threshold=(7, 10)):
    """MinHash+LSH near-dup, fully distributed with a SIGNATURE-ONLY band
    shuffle: one vectorized shingle+signature pass (stats ride along) ->
    tiny (bkt, band, band_hash, doc_id, set-key) rows -> hash-bucketed
    groupby(bkt) (bounded group count — see _lsh_n_buckets) with run-length
    group splitting inside each bucket
    -> viral-collapsed candidate rows (closed-form weights/checksums, no
    shingles shuffled) -> pair dedupe via groupby(a, b) -> exact-Jaccard
    verification of the surviving REPRESENTATIVE pairs only, via a filtered
    re-shingle scan + doc_id-bucketed join (shingles move for candidate
    docs only) -> tiny count/checksum aggregates.

    Partitioning assumption (documented per SURVEY §4.2): candidate
    cluster-pair count << corpus size (the LSH premise) — candidate ids are
    broadcast once via ray.put; shingle payloads never exceed
    O(candidates x doc size).

    Oracle: DuckDB computes ALL pairs with word-3-gram Jaccard >= 7/10 via an
    inverted-index self-join; with 32x2 banding the LSH candidate set
    contains every such pair w.h.p. (P_miss ~ 4e-10 per pair), so the
    verified counts match exactly. Returns one row:
    (n_docs, sum_shingles, n_dup_pairs, pair_checksum)."""

    num, den = threshold
    nb = _lsh_n_buckets(_doc_count(sf_dir) * _MH_BANDS)
    ds = _docs(sf_dir, ["doc_id", "text"])
    # materialized: the band rows feed BOTH the stats fold and the LSH
    # groupby — without pinning the blocks, each consumer would re-execute
    # the shingle+signature pass. Rows are ~44B signatures (no shingles),
    # i.e. the same data the groupby shuffle materializes anyway.
    bands = ds.map_batches(
        _cached(f"minhash{nb}", lambda: _MinHashStage(nb=nb)),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    ).materialize()
    # ONE pass: signatures for the LSH shuffle + shingle stats as a sideband
    stats = bands.map_batches(
        lambda b: pa.table(
            {
                "n_docs": pa.array(
                    [int((b["band"].to_numpy(zero_copy_only=False) == 0).sum())],
                    pa.int64(),
                ),
                "sum_shingles": pa.array(
                    [
                        int(
                            b["n_sh"]
                            .to_numpy(zero_copy_only=False)[
                                b["band"].to_numpy(zero_copy_only=False) == 0
                            ]
                            .sum()
                        )
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).sum(["n_docs", "sum_shingles"])
    pairs = bands.groupby("bkt").map_groups(
        _mh_bucket_candidates(nb), batch_format="pandas"
    )
    # rows repeated across bands are IDENTICAL (cluster keys are global), so
    # per-(a, b) Max == dedupe — done as a bounded-key bucketed map_groups
    # (one group per distinct pair would hit Ray's tiny-group pathology)
    uniq = pairs.groupby("pbkt").map_groups(
        _pair_dedupe, batch_format="pandas"
    ).materialize()  # branched below (resolved + candidates); tiny rows
    resolved = uniq.map_batches(
        lambda b: b.filter(pc.greater_equal(b["dup"], 0)), batch_format="pyarrow"
    )
    cand = uniq.map_batches(
        lambda b: b.filter(pc.less(b["dup"], 0)), batch_format="pyarrow"
    ).to_pandas()

    verified_rows = None
    if len(cand):
        rep_ids = np.unique(
            np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])
        ).astype(np.int64)
        ids_ref = _bcast(rep_ids)
        # bucket keys sized to the candidate set: the attach join and the
        # judge both run as bounded-key map_groups (never one Ray group per
        # doc/pair — the same tiny-group pathology the band stage avoids)
        nbv = _lsh_n_buckets(2 * len(cand), target=4096)
        pkeys = [f"{a}|{b}" for a, b in zip(cand["a"], cand["b"])]
        jdocs = np.concatenate(
            [cand["a"].to_numpy(), cand["b"].to_numpy()]
        ).astype(np.int64)
        a_np = cand["a"].to_numpy().astype(np.int64)
        b_np = cand["b"].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            kb = (
                _splitmix64(
                    a_np.view(np.uint64) * np.uint64(0x9E3779B97F4A7C17)
                    + b_np.view(np.uint64)
                )
                & np.uint64(nbv - 1)
            ).astype(np.int64)
        pair_sides = pa.table(
            {
                "jdoc": pa.array(jdocs),
                "jbkt": pa.array(_jbkt_of(jdocs, nbv)),
                "kbkt": pa.array(np.tile(kb, 2)),
                "pkey": pa.array(pkeys + pkeys, pa.string()),
                "w_pairs": pa.array(
                    np.tile(cand["w_pairs"].to_numpy().astype(np.int64), 2)
                ),
                "w_chk": pa.array(
                    np.tile(cand["w_chk"].to_numpy().astype(np.int64), 2)
                ),
                "shingles": pa.array(
                    [[]] * (2 * len(cand)), pa.list_(pa.uint64())
                ),
            }
        )
        sh_rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            _CandShingleStage,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
            concurrency=max(2, _default_concurrency() // 2),
            fn_constructor_kwargs={"ids_ref": ids_ref, "nbv": nbv},
        )
        verified_rows = (
            sh_rows.union(ray.data.from_arrow(pair_sides))
            .groupby("jbkt")
            .map_groups(_attach_shingles, batch_format="pandas")
            .groupby("kbkt")
            .map_groups(_judge_pairs(num, den), batch_format="pandas")
        )

    def _pair_partial(b: pa.Table) -> pa.Table:
        dup = b["dup"].to_numpy(zero_copy_only=False) == 1
        wp = b["w_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
        wc = b["w_chk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_dup": pa.array([int(wp[dup].sum())], pa.int64()),
                "chk": pa.array([int(wc[dup].sum() % _PAIR_MOD)], pa.int64()),
            }
        )

    final = resolved
    if verified_rows is not None:
        final = resolved.select_columns(
            ["a", "b", "dup", "w_pairs", "w_chk"]
        ).union(verified_rows.select_columns(["a", "b", "dup", "w_pairs", "w_chk"]))
    agg = final.map_batches(_pair_partial, batch_format="pyarrow").sum(
        ["n_dup", "chk"], ignore_nulls=True
    ) or {"sum(n_dup)": 0, "sum(chk)": 0}
    stats = stats or {"sum(n_docs)": 0, "sum(sum_shingles)": 0}
    return pd.DataFrame(
        [
            {
                "n_docs": int(stats["sum(n_docs)"]),
                "sum_shingles": int(stats["sum(sum_shingles)"]),
                "n_dup_pairs": int(agg["sum(n_dup)"] or 0),
                "pair_checksum": int(agg["sum(chk)"] or 0) % _PAIR_MOD,
            }
        ]
    )


def _jaccard_cooc(nbkt: int):
    """One shingle-hash bucket = many inverted-index postings lists.
    Run-length split by shingle hash, then each list of k docs emits its
    C(k,2) co-occurrence pairs (this IS the exact inverted-index join —
    quadratic in document frequency, exactly like the SQL oracle; the LSH
    dedups exist to avoid this cost at scale). Same-bucket duplicates of a
    pair are combined before the shuffle (np.unique counts)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"pbkt": pd.Series([], dtype="int64"),
             "a": pd.Series([], dtype="int64"),
             "b": pd.Series([], dtype="int64"),
             "inter": pd.Series([], dtype="int64")}
        )
        sh = g["sh"].to_numpy().astype(np.int64)
        doc = g["doc"].to_numpy().astype(np.int64)
        # lexsort by (sh, doc): each gram's posting run has docs already
        # ascending; then ALL C(k,2) pairs across all runs are emitted at
        # once with run-length arithmetic (repeat/arange/gather) — no
        # per-run Python even when every gram is shared (dup-dense corpora).
        order = np.lexsort((doc, sh))
        sh_s, doc_s = sh[order], doc[order]
        chg = np.flatnonzero(sh_s[1:] != sh_s[:-1])
        starts = np.concatenate(([0], chg + 1))
        lens = np.concatenate((starts[1:], [len(sh_s)])) - starts
        multi = lens >= 2
        starts, lens = starts[multi], lens[multi]
        if not len(starts):
            return empty
        n_el = int(lens.sum())
        # absolute position in doc_s of every element of every multi-run
        el = np.repeat(starts, lens) + (
            np.arange(n_el) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        rep = np.repeat(starts + lens, lens) - 1 - el  # later elems in run
        total = int(rep.sum())
        owner = np.repeat(el, rep)  # a-side position, one per emitted pair
        off = np.arange(total) - np.repeat(np.cumsum(rep) - rep, rep)
        a = doc_s[owner]
        b = doc_s[owner + 1 + off]
        key = np.stack([a, b], axis=1)
        uniq, counts = np.unique(key, axis=0, return_counts=True)
        with np.errstate(over="ignore"):
            pb = (
                _splitmix64(
                    uniq[:, 0].view(np.uint64) * np.uint64(0x9E3779B97F4A7C17)
                    + uniq[:, 1].view(np.uint64)
                )
                & np.uint64(nbkt - 1)
            ).astype(np.int64)
        return pd.DataFrame(
            {"pbkt": pd.Series(pb, dtype="int64"),
             "a": pd.Series(uniq[:, 0], dtype="int64"),
             "b": pd.Series(uniq[:, 1], dtype="int64"),
             "inter": pd.Series(counts.astype(np.int64), dtype="int64")}
        )

    return fn


def _pair_sum(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(pbkt): SUM the per-bucket intersection partials per (a, b)
    — one lexsort + add.reduceat, no per-pair Python."""
    a = g["a"].to_numpy().astype(np.int64)
    b = g["b"].to_numpy().astype(np.int64)
    v = g["inter"].to_numpy().astype(np.int64)
    order = np.lexsort((b, a))
    a, b, v = a[order], b[order], v[order]
    n = len(a)
    newk = np.ones(n, dtype=bool)
    if n > 1:
        newk[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(newk)
    return pd.DataFrame(
        {"a": pd.Series(a[starts], dtype="int64"),
         "b": pd.Series(b[starts], dtype="int64"),
         "inter": pd.Series(np.add.reduceat(v, starts) if n else v,
                            dtype="int64")}
    )


def _jaccard_judged_pairs(sf_dir: str, threshold=(7, 10)):
    """Shared core of q_dedup_jaccard and q_dup_clusters: the distributed
    inverted-index EXACT word-3-gram Jaccard join, returning
    (judged-pairs Dataset with columns (a, b, dup int8), n_docs,
    sum_shingles). Pair rows are tiny (candidate pairs only)."""
    num, den = threshold
    nb = _lsh_n_buckets(_doc_count(sf_dir) * 96)

    def _inv_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and int(ids.min()) < 0:
            raise ValueError("dedup_jaccard requires non-negative doc_id")
        off, hs = _shingle_hash_batch(batch["text"])
        n_sh = np.diff(off)
        doc_of = np.repeat(ids, n_sh)
        bkt = (hs & np.uint64(nb - 1)).astype(np.int32)
        return pa.table(
            {
                "bkt": pa.array(
                    np.concatenate([bkt, np.zeros(len(ids), np.int32)])
                ),
                "sh": pa.array(
                    np.concatenate([hs.view(np.int64), n_sh.astype(np.int64)])
                ),
                "doc": pa.array(np.concatenate([doc_of, ids])),
                "isd": pa.array(
                    np.concatenate(
                        [np.zeros(len(hs), np.int8), np.ones(len(ids), np.int8)]
                    )
                ),
            }
        )

    rows = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            _inv_rows, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=1024,
        )
        .materialize()  # feeds the doc-count pull AND the postings groupby
    )
    # doc totals: distributed sum over the sentinel rows (never a driver
    # pull — the round-3 to_pandas of (doc_id, n_sh) was O(n_docs) memory)
    doc_tot = rows.map_batches(
        lambda b: (
            lambda f: pa.table(
                {
                    "nd": pa.array([f.num_rows], pa.int64()),
                    "ssh": pa.array(
                        [int(pc.sum(f["sh"]).as_py() or 0)], pa.int64()
                    ),
                }
            )
        )(b.filter(pc.equal(b["isd"], 1))),
        batch_format="pyarrow",
    ).sum(["nd", "ssh"]) or {"sum(nd)": 0, "sum(ssh)": 0}
    n_docs = int(doc_tot["sum(nd)"] or 0)
    sum_shingles = int(doc_tot["sum(ssh)"] or 0)

    pairs = (
        rows.map_batches(
            lambda b: b.filter(pc.equal(b["isd"], 0)), batch_format="pyarrow"
        )
        .groupby("bkt")
        .map_groups(_jaccard_cooc(nb), batch_format="pandas")
        .groupby("pbkt")
        .map_groups(_pair_sum, batch_format="pandas")
    )

    # size join, fully distributed: each unique pair row splits into TWO
    # half-rows keyed by its side's doc hash-bucket; per-doc size sentinel
    # rows key the same way; a bucketed pandas hash join attaches each
    # side's n_sh (the _attach_shingles pattern), then halves recombine by
    # pair bucket to form union = na + nb - inter.
    nbv = np.uint64(nb - 1)

    def _size_rows(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["isd"], 1))
        doc = f["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        jbkt = (_splitmix64(doc.astype(np.uint64)) & nbv).astype(np.int64)
        z = np.zeros(len(doc), np.int64)
        return pa.table(
            {
                "jbkt": pa.array(jbkt),
                "jdoc": pa.array(doc),
                "pb": pa.array(np.full(len(doc), -1, np.int64)),
                "a": pa.array(z),
                "b": pa.array(z),
                "inter": pa.array(z),
                "nsh": pa.array(f["sh"].to_numpy(zero_copy_only=False)),
            }
        )

    def _half_rows(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        inter = b["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            pb = (
                _splitmix64(
                    a.astype(np.uint64) * np.uint64(_PAIR_K)
                    + bb.astype(np.uint64)
                )
                & nbv
            ).astype(np.int64)
        jd = np.concatenate([a, bb])
        jbkt = (_splitmix64(jd.astype(np.uint64)) & nbv).astype(np.int64)
        return pa.table(
            {
                "jbkt": pa.array(jbkt),
                "jdoc": pa.array(jd),
                "pb": pa.array(np.tile(pb, 2)),
                "a": pa.array(np.tile(a, 2)),
                "b": pa.array(np.tile(bb, 2)),
                "inter": pa.array(np.tile(inter, 2)),
                "nsh": pa.array(np.zeros(2 * len(a), np.int64)),
            }
        )

    def _attach_sizes(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("pb", "a", "b", "inter", "nsh")
        is_sz = g["pb"] == -1
        halves = g.loc[~is_sz, ["jdoc", "pb", "a", "b", "inter"]]
        if not len(halves):
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        sz = g.loc[is_sz, ["jdoc", "nsh"]]
        out = halves.merge(sz, on="jdoc", how="left")
        if out["nsh"].isna().any():
            raise KeyError("doc size row missing from jaccard size join")
        return out[list(cols)].astype("int64")

    def _judge_halves(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "dup": pd.Series([], dtype="int8"),
                }
            )
        g = g.sort_values(["a", "b"], kind="stable")
        a = g["a"].to_numpy().astype(np.int64)
        bb = g["b"].to_numpy().astype(np.int64)
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
        idx = np.flatnonzero(first)
        nsh_c = np.concatenate(([0], np.cumsum(g["nsh"].to_numpy())))
        ends = np.r_[idx[1:], len(a)]
        if not np.array_equal(ends - idx, np.full(len(idx), 2)):
            raise AssertionError("each pair must contribute exactly 2 halves")
        tot = nsh_c[ends] - nsh_c[idx]  # na + nb per pair
        inter = g["inter"].to_numpy().astype(np.int64)[idx]
        union = tot - inter
        dup = np.where(union > 0, den * inter >= num * union, True)
        return pd.DataFrame(
            {
                "a": a[idx],
                "b": bb[idx],
                "dup": dup.astype(np.int8),
            }
        )

    judged = (
        rows.map_batches(_size_rows, batch_format="pyarrow")
        .union(pairs.map_batches(_half_rows, batch_format="pyarrow"))
        .groupby("jbkt")
        .map_groups(_attach_sizes, batch_format="pandas")
        .groupby("pb")
        .map_groups(_judge_halves, batch_format="pandas")
    )
    return judged, n_docs, sum_shingles


def q_dedup_jaccard(sf_dir: str, threshold=(7, 10)):
    """EXACT word-3-gram Jaccard near-dup via a distributed inverted
    index — the exactness baseline dedup_minhash approximates (both share
    the same SQL oracle and must produce the same row). One vectorized
    shingle pass emits hash-bucketed postings (plus per-doc shingle counts
    as sentinel rows in the same pass); co-occurrence pairs are generated
    inside buckets, intersection counts summed by bucketed map_groups, and
    the Jaccard verdict is an integer cross-multiplication against
    broadcast per-doc set sizes.

    Scale note (SURVEY §4.2): the inverted-index join is quadratic in
    document frequency (a k-clone cluster costs O(k^2) pairs per shared
    gram — inherent to EXACT Jaccard, the oracle pays it too). Use
    dedup_minhash at corpus scale; this query is the ground truth. Nothing
    touches the driver at O(n_docs): per-doc set sizes flow through the
    same hash-bucketed join as the postings (pair half-rows keyed by each
    side's doc bucket), and the doc totals are a distributed sum.
    Returns one row: (n_docs, sum_shingles, n_dup_pairs, pair_checksum)."""
    judged, n_docs, sum_shingles = _jaccard_judged_pairs(sf_dir, threshold)

    def _pair_agg(b: pa.Table) -> pa.Table:
        dup = b["dup"].to_numpy(zero_copy_only=False) == 1
        am = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)[dup] % _PAIR_MOD
        bm = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)[dup] % _PAIR_MOD
        terms = (am * _PAIR_K % _PAIR_MOD + bm) % _PAIR_MOD
        return pa.table(
            {
                "n_dup": pa.array([int(dup.sum())], pa.int64()),
                "chk": pa.array([int(terms.sum() % _PAIR_MOD)], pa.int64()),
            }
        )

    agg = judged.map_batches(_pair_agg, batch_format="pyarrow").sum(
        ["n_dup", "chk"], ignore_nulls=True
    ) or {"sum(n_dup)": 0, "sum(chk)": 0}
    return pd.DataFrame(
        [
            {
                "n_docs": n_docs,
                "sum_shingles": sum_shingles,
                "n_dup_pairs": int(agg["sum(n_dup)"] or 0),
                "pair_checksum": int(agg["sum(chk)"] or 0) % _PAIR_MOD,
            }
        ]
    )


def _cc_min_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby(bucket): per-node min label (node determines bucket, so the
    min is global for the node)."""
    if not len(g):
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "lbl": pd.Series([], dtype="int64")}
        )
    agg = g.groupby("node", as_index=False)["lbl"].min()
    return agg[["node", "lbl"]].astype("int64")


def q_dup_clusters(sf_dir: str, threshold=(7, 10), max_rounds: int = 16):
    """Connected components over the EXACT near-dup pair graph — the step a
    real dedup pipeline runs after pair finding (keep one doc per CLUSTER,
    not per pair; transitive duplicates collapse). Distributed min-label
    propagation: labels start as own ids; each round, every edge forwards
    its endpoint's label to the other side through ONE hash-bucketed
    shuffle and a per-node min folds in a second; convergence is detected
    by a modular checksum (rounds needed = graph diameter — near-dup
    components are cliques/short chains, so 2-3 rounds in practice;
    hash-to-min (Rastogi et al., ICDE 2013) is the published O(log n)
    upgrade if diameters ever grow). Returns the cluster-size histogram
    (cluster_size >= 2, n_clusters, modular checksum of cluster roots) —
    oracle = DuckDB recursive-CTE transitive closure over the same pairs."""
    labels = _dup_cluster_labels(sf_dir, threshold, max_rounds)
    empty = pd.DataFrame(
        {
            "cluster_size": pd.Series([], dtype="int64"),
            "n_clusters": pd.Series([], dtype="int64"),
            "root_checksum": pd.Series([], dtype="int64"),
        }
    )
    if labels is None:
        return empty

    def _size_partial(b: pa.Table) -> pa.Table:
        l = b["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(l, return_counts=True)
        return pa.table(
            {
                "lbl": pa.array(u),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    sizes = (
        labels.map_batches(_size_partial, batch_format="pyarrow")
        .groupby("lbl")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    sizes["n"] = sizes["n"].astype("int64")
    hist = (
        sizes.groupby("n", as_index=False)
        .agg(
            n_clusters=("lbl", "size"),
            root_checksum=("lbl", lambda s: int(s.astype(object).sum() % _PAIR_MOD)),
        )
        .rename(columns={"n": "cluster_size"})
    )
    hist = hist[hist["cluster_size"] >= 2]
    out = hist.sort_values("cluster_size").reset_index(drop=True)
    return out.astype(
        {"cluster_size": "int64", "n_clusters": "int64", "root_checksum": "int64"}
    )


def _dup_cluster_labels(sf_dir: str, threshold=(7, 10), max_rounds: int = 16):
    """(node, lbl) Dataset of the converged min-label propagation over the
    exact near-dup pair graph — lbl is the component's min doc id; None
    when there are no dup pairs at all."""
    judged, _, _ = _jaccard_judged_pairs(sf_dir, threshold)
    edges = judged.map_batches(
        lambda b: b.filter(pc.equal(b["dup"], 1)).select(["a", "b"]),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() == 0:
        return None
    nb = _lsh_n_buckets(_doc_count(sf_dir))
    nbv = np.uint64(nb - 1)

    def _bkt(x: np.ndarray) -> np.ndarray:
        return (_splitmix64(x.astype(np.uint64)) & nbv).astype(np.int64)

    def _edge_rows(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, bb])
        dst = np.concatenate([bb, a])
        return pa.table(
            {
                "bkt": pa.array(_bkt(src)),
                "node": pa.array(src),
                "lbl": pa.array(dst),  # dst rides in the lbl slot
                "is_edge": pa.array(np.ones(len(src), np.int8)),
            }
        )

    e_sym = edges.map_batches(_edge_rows, batch_format="pyarrow").materialize()

    def _label_rows(b: pa.Table) -> pa.Table:
        n = np.unique(
            np.concatenate(
                [
                    b["a"].to_numpy(zero_copy_only=False).astype(np.int64),
                    b["b"].to_numpy(zero_copy_only=False).astype(np.int64),
                ]
            )
        )
        return pa.table(
            {
                "bkt": pa.array(_bkt(n)),
                "node": pa.array(n),
                "lbl": pa.array(n),
            }
        )

    labels = (
        edges.map_batches(_label_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(_cc_min_group, batch_format="pandas")
        .materialize()
    )

    def _chk(lds) -> int:
        def part(b: pa.Table) -> pa.Table:
            n = b["node"].to_numpy(zero_copy_only=False).astype(np.int64) % _PAIR_MOD
            l = b["lbl"].to_numpy(zero_copy_only=False).astype(np.int64) % _PAIR_MOD
            return pa.table(
                {"c": pa.array([int(((n * _PAIR_K + l) % _PAIR_MOD).sum() % _PAIR_MOD)])}
            )

        r = lds.map_batches(part, batch_format="pyarrow").sum("c")
        return int(r or 0) % _PAIR_MOD

    def _merge_group(g: pd.DataFrame) -> pd.DataFrame:
        """Within a bucket: edges (node=src) pick up src's current label and
        forward it to dst; label rows pass through. Output keyed by the
        TARGET node's bucket for the min fold."""
        if not len(g):
            return pd.DataFrame(
                {
                    "bkt": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64"),
                    "lbl": pd.Series([], dtype="int64"),
                }
            )
        is_e = g["is_edge"] == 1
        lab = g.loc[~is_e, ["node", "lbl"]]
        ed = g.loc[is_e, ["node", "lbl"]].rename(columns={"lbl": "dst"})
        msg = ed.merge(lab, on="node", how="left")
        if msg["lbl"].isna().any():
            raise KeyError("label row missing for an edge endpoint")
        out = pd.concat(
            [
                pd.DataFrame({"node": msg["dst"], "lbl": msg["lbl"]}),
                lab[["node", "lbl"]],
            ],
            ignore_index=True,
        ).astype("int64")
        out["bkt"] = _bkt(out["node"].to_numpy(np.int64))
        return out[["bkt", "node", "lbl"]]

    prev = _chk(labels)
    for _ in range(max_rounds):
        tagged = labels.map_batches(
            lambda b: b.append_column(
                "is_edge", pa.array(np.zeros(b.num_rows, np.int8))
            ).append_column(
                "bkt",
                pa.array(_bkt(b["node"].to_numpy(zero_copy_only=False))),
            ),
            batch_format="pyarrow",
        )
        labels = (
            tagged.union(e_sym)
            .groupby("bkt")
            .map_groups(_merge_group, batch_format="pandas")
            .groupby("bkt")
            .map_groups(_cc_min_group, batch_format="pandas")
            .materialize()
        )
        cur = _chk(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"dup-cluster label propagation did not converge in {max_rounds} "
            "rounds (graph diameter larger than expected)"
        )
    return labels


def q_dedup_keep_stats(sf_dir: str, threshold=(7, 10)) -> pd.DataFrame:
    """The dedup pipeline's OUTPUT accounting: per source, how many docs
    survive keep-min-per-cluster near-dup dedup. A labeled node with
    node != lbl is removed (its cluster's min id is the kept canonical);
    everything else — cluster roots and docs in no cluster — is kept.
    Sources attach through the same hash-bucketed join pattern (label rows
    and (doc_id, source) rows co-partition on bkt(doc_id)); never a
    driver-side pull of the corpus."""
    from ray.data.aggregate import Count

    labels = _dup_cluster_labels(sf_dir, threshold)
    base = (
        _docs(sf_dir, ["source"])
        .groupby("source")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_docs"})
    )
    base["n_docs"] = base["n_docs"].astype("int64")
    if labels is None:
        out = base.copy()
        out["n_removed"] = np.int64(0)
        out["n_kept"] = out["n_docs"]
        return out.sort_values("source").reset_index(drop=True)

    nb = _lsh_n_buckets(_doc_count(sf_dir))
    nbv = np.uint64(nb - 1)

    def _doc_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(
                    (_splitmix64(ids.astype(np.uint64)) & nbv).astype(np.int64)
                ),
                "node": pa.array(ids),
                "lbl": pa.array(np.full(len(ids), -1, np.int64)),
                "source": b["source"],
            }
        )

    def _lab_rows(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(
                    (_splitmix64(node.astype(np.uint64)) & nbv).astype(np.int64)
                ),
                "node": b["node"],
                "lbl": b["lbl"],
                "source": pa.array([""] * len(node), pa.string()),
            }
        )

    def _removed_group(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "n_removed": pd.Series([], dtype="int64"),
                }
            )
        is_doc = g["lbl"] == -1
        lab = g.loc[~is_doc, ["node", "lbl"]]
        removed = lab[lab["node"] != lab["lbl"]]
        docs = g.loc[is_doc, ["node", "source"]]
        hit = removed.merge(docs, on="node", how="left")
        if hit["source"].isna().any():
            raise KeyError("labeled node missing from the documents table")
        agg = hit.groupby("source", as_index=False).size()
        return pd.DataFrame(
            {
                "source": agg["source"],
                "n_removed": agg["size"].astype("int64"),
            }
        )

    removed = (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(_doc_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(labels.map_batches(_lab_rows, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(_removed_group, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("n_removed", alias_name="n_removed"))
        .to_pandas()
    )
    out = base.merge(removed, on="source", how="left")
    out["n_removed"] = out["n_removed"].fillna(0).astype("int64")
    out["n_kept"] = (out["n_docs"] - out["n_removed"]).astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def dedup_keep_stats_sql(threshold=(7, 10)) -> str:
    num, den = threshold
    return f"""
WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ws) - 2, 1)),
           i -> CASE WHEN len(ws) >= 3
                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     ELSE array_to_string(ws, ' ') END)) AS gram
  FROM w
),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ns FROM gd GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
  FROM gd x JOIN gd y ON x.gram = y.gram AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
dup AS (
  SELECT a, b
  FROM inter JOIN sz sa ON sa.doc_id = inter.a JOIN sz sb ON sb.doc_id = inter.b
  WHERE {den} * c >= {num} * (sa.ns + sb.ns - c)
),
e AS (SELECT a AS s, b AS d FROM dup UNION SELECT b AS s, a AS d FROM dup),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON e.s = r.d
),
comp AS (SELECT s AS doc, LEAST(s, MIN(d)) AS root FROM reach GROUP BY s),
rm AS (SELECT doc FROM comp WHERE doc != root)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rm.doc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
       CAST(SUM(CASE WHEN rm.doc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept
FROM documents d LEFT JOIN rm ON d.doc_id = rm.doc
GROUP BY d.source ORDER BY d.source
"""


def dup_clusters_sql(threshold=(7, 10)) -> str:
    """Recursive-CTE transitive closure over the same exact-Jaccard dup
    pairs; component root = LEAST(node, min reachable node)."""
    num, den = threshold
    return f"""
WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ws) - 2, 1)),
           i -> CASE WHEN len(ws) >= 3
                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     ELSE array_to_string(ws, ' ') END)) AS gram
  FROM w
),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ns FROM gd GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
  FROM gd x JOIN gd y ON x.gram = y.gram AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
dup AS (
  SELECT a, b
  FROM inter JOIN sz sa ON sa.doc_id = inter.a JOIN sz sb ON sb.doc_id = inter.b
  WHERE {den} * c >= {num} * (sa.ns + sb.ns - c)
),
e AS (SELECT a AS s, b AS d FROM dup UNION SELECT b AS s, a AS d FROM dup),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON e.s = r.d
),
comp AS (SELECT s AS doc, LEAST(s, MIN(d)) AS root FROM reach GROUP BY s),
cl AS (SELECT root, CAST(COUNT(*) AS BIGINT) AS csize FROM comp GROUP BY root)
SELECT CAST(csize AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(root % {_PAIR_MOD}) % {_PAIR_MOD} AS BIGINT) AS root_checksum
FROM cl GROUP BY csize ORDER BY csize
"""


# ---------------------------------------------------------------------------
# SimHash near-dup (60-bit, md5 word hashes — SQL-recomputable end to end)
# ---------------------------------------------------------------------------

_SH_BITS = 60       # 15 md5 hex nibbles -> the SQL oracle rebuilds the exact
_SH_BANDS = 4       # same hash with integer arithmetic. 4x15-bit bands:
_SH_MAXHAM = 3      # hamming <= 3 flips at most 3 bands, so by pigeonhole
                    # every true pair shares >= 1 band — EXACT candidate recall.
# Two-level bucketing: within each primary band, the OTHER 45 bits are split
# into 4 sub-bands (12+11+11+11). A ham<=3 pair has >=1 intact primary band
# (pigeonhole over 4 bands); within that band's complement the <=3 flips
# leave >=1 of 4 sub-bands intact — so some (band, sub-band) bucket holds
# both docs. Recall stays EXACT while the bucket key widens from 15 to 26-27
# bits: expected bucket size shrinks ~4000x, bounding the per-bucket
# pair-verification quadratic that a corpus-scale 15-bit bucket would hit.
_SH_SUB = 4
_SH_SUB_WIDTHS = (12, 11, 11, 11)

_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    return (
        _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
        + _POP16[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((x >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)]
    )


def simhash60_batch(col) -> np.ndarray:
    """60-bit SimHash per doc over DISTINCT words for a whole Arrow string
    column; word hash = first 15 hex nibbles of md5(word) (int64-safe, the
    SQL oracle rebuilds the exact value with strpos arithmetic). Fully
    vectorized: word spans over the column's flat UTF-8 buffer (split-on-' '
    semantics — consecutive spaces yield empty words, matching
    ``text.split(' ')``), ONE batch C md5 pass over all word occurrences
    (hashutil.md5_spans), per-doc distinctness by the full 128-bit digest
    (== distinct-by-word: a real md5 collision inside one doc is
    cryptographically impossible), per-(doc, bit) counts via
    np.add.reduceat. Replaces the per-doc/per-word hashlib loop."""
    from tokenzip.hashutil import md5_spans, str_column_spans

    flat, dstart, dend = str_column_spans(col)
    nd = len(dstart)
    if nd == 0:
        return np.empty(0, dtype=np.uint64)
    base = int(dstart[0])
    seg = flat[base : int(dend[-1])]
    doc_start = dstart - base  # rebased, contiguous column => dend[i]==dstart[i+1]
    doc_end = dend - base
    # word boundaries: a word starts at each doc start and after each space
    sp = np.flatnonzero(seg == 32)
    sp_doc = np.searchsorted(doc_start, sp, side="right") - 1
    n_words = np.bincount(sp_doc, minlength=nd).astype(np.int64) + 1
    w_off = np.zeros(nd + 1, np.int64)
    np.cumsum(n_words, out=w_off[1:])
    m = int(w_off[-1])
    ws = np.empty(m, np.int64)
    ws[w_off[:-1]] = doc_start
    if len(sp):
        first_sp = np.zeros(nd, np.int64)
        np.cumsum(np.bincount(sp_doc, minlength=nd)[:-1], out=first_sp[1:])
        rank = np.arange(len(sp), dtype=np.int64) - first_sp[sp_doc]
        ws[w_off[sp_doc] + 1 + rank] = sp + 1
    we = np.empty_like(ws)
    we[:-1] = ws[1:] - 1
    we[w_off[1:] - 1] = doc_end  # last word of each doc ends at doc end

    dig = md5_spans(seg, ws, we)  # (m, 16) digests, one per word OCCURRENCE
    d2 = dig.view(np.uint64).reshape(m, 2)  # raw 128-bit keys for dedup
    doc_of_w = np.repeat(np.arange(nd, dtype=np.int64), n_words)
    order = np.lexsort((d2[:, 1], d2[:, 0], doc_of_w))
    ds_, k0, k1 = doc_of_w[order], d2[order, 0], d2[order, 1]
    keep = np.ones(m, dtype=bool)
    if m > 1:
        keep[1:] = (ds_[1:] != ds_[:-1]) | (k0[1:] != k0[:-1]) | (k1[1:] != k1[:-1])
    dd = dig[order][keep]
    ds_ = ds_[keep]
    from tokenzip.hashutil import digests_hi60

    hs = digests_hi60(dd).view(np.uint64)
    u_off = np.zeros(nd + 1, np.int64)
    np.cumsum(np.bincount(ds_, minlength=nd), out=u_off[1:])
    shifts = np.arange(_SH_BITS, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    cnt = np.add.reduceat(bits, u_off[:-1], axis=0)  # (nd, 60)
    n_distinct = np.diff(u_off)
    score = 2 * cnt - n_distinct[:, None]
    return ((score > 0).astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


def simhash60(text: str) -> int:
    """Single-doc convenience wrapper over the vectorized batch hasher."""
    return int(simhash60_batch(pa.array([text], pa.string()))[0])


class _SimHashStage:
    """Per-doc simhash -> one row per (primary band, sub-band) bucket:
    (bkt, bkey, band_val, doc_id, simhash) — 16 tiny rows per doc, where
    bkt hash-buckets the (bkey, band_val) key space down to a bounded
    shuffle-group count (see _lsh_n_buckets)."""

    def __init__(self, nb: int = 256):
        self.nb = np.uint64(nb - 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # a = -1 is the intra-cluster sentinel; oracle modulo needs ids >= 0
        if len(ids) and int(ids.min()) < 0:
            raise ValueError("dedup_simhash requires non-negative doc_id")
        hs = simhash60_batch(batch["text"])
        n = len(ids)
        band_w = _SH_BITS // _SH_BANDS
        chunks = np.stack(
            [
                (hs >> np.uint64(band_w * i)) & np.uint64((1 << band_w) - 1)
                for i in range(_SH_BANDS)
            ]
        )  # (4, n) primary 15-bit chunks
        sub_off = np.concatenate(([0], np.cumsum(_SH_SUB_WIDTHS)))[:-1]
        bkeys, vals = [], []
        for i in range(_SH_BANDS):
            others = [j for j in range(_SH_BANDS) if j != i]
            rem = (
                chunks[others[0]]
                | chunks[others[1]] << np.uint64(band_w)
                | chunks[others[2]] << np.uint64(2 * band_w)
            )  # the 45 complement bits, compacted
            for j in range(_SH_SUB):
                w = _SH_SUB_WIDTHS[j]
                sub = (rem >> np.uint64(sub_off[j])) & np.uint64((1 << w) - 1)
                bkeys.append(np.full(n, i * _SH_SUB + j, dtype=np.int32))
                vals.append((chunks[i] << np.uint64(w)) | sub)
        reps = _SH_BANDS * _SH_SUB
        bkey_all = np.concatenate(bkeys)
        val_all = np.concatenate(vals)
        with np.errstate(over="ignore"):
            bkt = _splitmix64(
                (val_all.astype(np.uint64) << np.uint64(5))
                ^ bkey_all.astype(np.uint64)
            ) & self.nb
        return pa.table(
            {
                "bkt": pa.array(bkt.astype(np.int32), pa.int32()),
                "bkey": pa.array(bkey_all, pa.int32()),
                "band_val": pa.array(val_all.astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.tile(ids, reps), pa.int64()),
                "simhash": pa.array(np.tile(hs, reps).astype(np.int64), pa.int64()),
            }
        )


def _sh_group_rows(bkey: int, ids_all: np.ndarray, hs_all: np.ndarray,
                   rows: dict) -> None:
    """Pair verification inside one colliding (band, sub-band) bucket with
    VIRAL COLLAPSE: docs sharing an identical simhash are grouped first —
    intra pairs (hamming 0, always dup) are ONE closed-form row per cluster
    (emitted from bucket 0 only: identical hashes collide in every bucket),
    and cross pairs are popcount-checked once per distinct-hash pair with
    |G1|x|G2| weight. A k-clone cluster costs O(k log k), never O(k^2);
    only dup cross rows are emitted (non-dups contribute nothing)."""
    uniq_h, inv = np.unique(hs_all, return_inverse=True)
    members = [np.sort(ids_all[inv == u]) for u in range(len(uniq_h))]
    if bkey == 0:
        for m in members:
            k = len(m)
            if k < 2:
                continue
            rows["a"].append(-1)
            rows["b"].append(int(m[0]))
            rows["dup"].append(1)
            rows["w_pairs"].append(k * (k - 1) // 2)
            rows["w_chk"].append(_intra_pair_chk(m))
    if len(uniq_h) > 1:
        ia, ib = np.triu_indices(len(uniq_h), k=1)
        ham = _popcount64(uniq_h[ia].astype(np.uint64) ^ uniq_h[ib].astype(np.uint64))
        for x, y in zip(ia[ham <= _SH_MAXHAM], ib[ham <= _SH_MAXHAM]):
            A, B = members[x], members[y]
            rows["a"].append(int(min(A[0], B[0])))
            rows["b"].append(int(max(A[0], B[0])))
            rows["dup"].append(1)
            rows["w_pairs"].append(len(A) * len(B))
            rows["w_chk"].append(_cross_pair_chk(A, B))


def _sh_bucket_pairs(nb: int):
    """One hash BUCKET = many (bkey, band_val) groups, split vectorized via
    one lexsort; singleton groups cost zero per-group Python. Emitted rows
    carry the pair-dedupe bucket key (see _with_pbkt)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        bkey = g["bkey"].to_numpy().astype(np.int64)
        val = g["band_val"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        hs = g["simhash"].to_numpy().astype(np.int64)
        order, starts, ends = _group_runs(bkey, val)
        if not len(starts):
            return pd.DataFrame(_PAIR_EMPTY)
        bkey, val, ids, hs = bkey[order], val[order], ids[order], hs[order]
        rows = {"a": [], "b": [], "dup": [], "w_pairs": [], "w_chk": []}
        for s, e in zip(starts, ends):
            _sh_group_rows(int(bkey[s]), ids[s:e], hs[s:e], rows)
        if not rows["a"]:
            return pd.DataFrame(_PAIR_EMPTY)
        return _with_pbkt(rows, nb)

    return fn


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup, fully distributed: 60-bit simhash -> 4 bands x 4
    sub-bands of tiny bucket rows -> hash-bucketed groupby(bkt) (bounded
    group count, run-length group splitting inside) -> viral-collapsed
    popcount verify inside buckets (closed-form weighted rows, O(k log k) for
    k-clone clusters) -> pair dedupe via groupby(a, b) -> tiny aggregates.
    Candidate recall is EXACT (two-level pigeonhole at hamming <= 3, see
    _SH_SUB_WIDTHS), so the brute-force SQL oracle counts the identical pair
    set. Returns one row:
    (n_docs, simhash_checksum, n_dup_pairs, pair_checksum)."""

    nb = _lsh_n_buckets(_doc_count(sf_dir) * _SH_BANDS * _SH_SUB)
    ds = _docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(
        _cached(f"simhash{nb}", lambda: _SimHashStage(nb=nb)),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )
    pairs = bands.groupby("bkt").map_groups(
        _sh_bucket_pairs(nb), batch_format="pandas"
    )
    # rows for the same (a, b) are identical across buckets — bucketed
    # vectorized Max dedupes without one-group-per-pair
    uniq = pairs.groupby("pbkt").map_groups(_pair_dedupe, batch_format="pandas")

    def _pair_partial(b: pa.Table) -> pa.Table:
        dup = b["dup"].to_numpy(zero_copy_only=False).astype(bool)
        wp = b["w_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
        wc = b["w_chk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_dup": pa.array([int(wp[dup].sum())], pa.int64()),
                "chk": pa.array([int(wc[dup].sum() % _PAIR_MOD)], pa.int64()),
            }
        )

    agg = uniq.map_batches(_pair_partial, batch_format="pyarrow").sum(
        ["n_dup", "chk"], ignore_nulls=True
    ) or {"sum(n_dup)": 0, "sum(chk)": 0}

    def _sig_partial(b: pa.Table) -> pa.Table:
        m = b["bkey"].to_numpy(zero_copy_only=False) == 0  # one row per doc
        h = b["simhash"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        return pa.table(
            {
                "n_docs": pa.array([int(m.sum())], pa.int64()),
                "schk": pa.array([int((h % _PAIR_MOD).sum())], pa.int64()),
            }
        )

    stats = bands.map_batches(_sig_partial, batch_format="pyarrow").sum(
        ["n_docs", "schk"]
    )
    return pd.DataFrame(
        [
            {
                "n_docs": int(stats["sum(n_docs)"]),
                "simhash_checksum": int(stats["sum(schk)"]) % _PAIR_MOD,
                "n_dup_pairs": int(agg["sum(n_dup)"] or 0),
                "pair_checksum": int(agg["sum(chk)"] or 0) % _PAIR_MOD,
            }
        ]
    )


# ---------------------------------------------------------------------------
# Document fingerprinting + language-ID heuristic
# ---------------------------------------------------------------------------

# stopword markers per language; language-ID = argmax of distinct-word
# overlap, ties broken to the alphabetically-first language (both the Ray
# stage and the SQL oracle implement exactly this rule)
_LANG_MARKERS = {
    "de": {"der", "und", "die", "das", "nicht", "ist"},
    "en": {"the", "and", "of", "to", "a", "in"},
    "es": {"el", "la", "de", "que", "y", "en"},
    "fr": {"le", "et", "la", "les", "des", "un"},
    "zh": {"的", "是", "了", "在", "和", "有"},
}


# SQL twin of doc_fingerprint — the DuckDB oracle computes the identical
# 64-bit hex value from the same sorted-distinct-words bag
FP_SQL_EXPR = (
    "substr(md5(array_to_string(list_sort(list_distinct("
    "string_split(text, ' '))), ' ')), 1, 16)"
)


def doc_fingerprint(text: str) -> str:
    """Bag-of-words content fingerprint: md5 of the sorted distinct words
    (order-insensitive near-dup fingerprint, SQL-expressible so the DuckDB
    oracle computes the identical value). 64-bit hex."""
    import hashlib as hl

    bag = " ".join(sorted(set(text.split(" "))))
    return hl.md5(bag.encode()).hexdigest()[:16]


def predict_lang(text: str) -> str:
    ws = set(text.split(" "))
    scores = {lg: len(ws & mk) for lg, mk in _LANG_MARKERS.items()}
    return max(sorted(scores), key=lambda lg: scores[lg])


class _FingerprintStage:
    """Per-doc (source, fingerprint) rows — the distinct count happens in a
    distributed groupby downstream, never on the driver."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [doc_fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"source": batch["source"], "fingerprint": pa.array(fps, pa.string())}
        )


class _LangVoteStage:
    """Per-batch PARTIAL (lang, pred_lang, n) counts — pre-aggregated before
    the global groupby so only tiny partials shuffle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        preds = [predict_lang(t) for t in batch["text"].to_pylist()]
        df = pd.DataFrame({"lang": langs, "pred_lang": preds})
        agg = df.groupby(["lang", "pred_lang"], as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(agg["lang"], pa.string()),
                "pred_lang": pa.array(agg["pred_lang"], pa.string()),
                "n": pa.array(agg["size"].astype("int64"), pa.int64()),
            }
        )


def q_fingerprint_by_source(sf_dir: str):
    """Distinct bag-of-words fingerprints per source. Fully distributed
    distinct count: groupby(source, fingerprint) -> per-group counts ->
    groupby(source) folds group count (n_distinct) and doc count (n_docs)."""
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["text", "source"])
    rows = ds.map_batches(
        _cached("fp", _FingerprintStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )
    per_fp = rows.groupby(["source", "fingerprint"]).count()

    def _strip(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"], "n": b["count()"]})

    out = (
        per_fp.map_batches(_strip, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Count(alias_name="n_distinct"),
        )
        .sort("source")
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out


def q_cross_source_dups(sf_dir: str) -> pd.DataFrame:
    """Cross-source exact-content contamination: per source, how many of its
    bag-of-words fingerprints (and docs) also occur in at least one OTHER
    source. The "did a benchmark/source leak into another crawl slice"
    audit that runs next to within-corpus dedup.

    Scale shape: per-batch (fingerprint, source) count partials -> ONE
    hash-bucketed shuffle (bucket count scales with corpus size via
    ``_lsh_n_buckets`` so group sizes stay bounded and map_groups never sees
    one tiny Ray group per fingerprint) -> vectorized within-bucket
    distinct-source detection -> a final groupby over the #sources domain.
    """
    from ray.data.aggregate import Count

    nb = _lsh_n_buckets(_doc_count(sf_dir), target=8192)

    def partial(b: pa.Table) -> pa.Table:
        fps = [doc_fingerprint(t) for t in b["text"].to_pylist()]
        df = pd.DataFrame({"fingerprint": fps, "source": b["source"].to_pylist()})
        agg = df.groupby(["fingerprint", "source"], as_index=False).size()
        bkt = (
            np.array([int(f[:8], 16) for f in agg["fingerprint"]], dtype=np.int64)
            % nb
        )
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "fingerprint": pa.array(agg["fingerprint"], pa.string()),
                "source": pa.array(agg["source"], pa.string()),
                "n": pa.array(agg["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    def bucket_shared(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["fingerprint", "source"], as_index=False)["n"].sum()
        n_sources = per.groupby("fingerprint")["source"].transform("size")
        shared = per[n_sources > 1]
        return shared[["source", "n"]]

    out = (
        _docs(sf_dir, ["text", "source"])
        .map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024
        )
        .groupby("bkt")
        .map_groups(bucket_shared, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_shared_docs"),
            Count(alias_name="n_shared_fps"),
        )
        .sort("source")
        .to_pandas()
    )
    out["n_shared_docs"] = out["n_shared_docs"].astype("int64")
    out["n_shared_fps"] = out["n_shared_fps"].astype("int64")
    return out


def cross_source_dups_sql(fp_expr: str = FP_SQL_EXPR) -> str:
    """DuckDB oracle: identical fingerprint expression, shared-fp semantics
    via HAVING COUNT(*) > 1 over the (fp, source)-distinct rows."""
    return f"""
WITH f AS (SELECT source, {fp_expr} AS fp FROM documents),
per AS (
  SELECT fp, source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM f GROUP BY fp, source
),
shared AS (SELECT fp FROM per GROUP BY fp HAVING COUNT(*) > 1)
SELECT per.source AS source,
       CAST(SUM(per.n_docs) AS BIGINT) AS n_shared_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shared_fps
FROM per JOIN shared USING (fp)
GROUP BY per.source ORDER BY source
"""


def q_lang_id_confusion(sf_dir: str):
    """Heuristic language-ID confusion matrix vs the labelled lang column —
    a Ray groupby aggregate over pre-aggregated batch partials."""
    ds = _docs(sf_dir, ["text", "lang"])
    partials = ds.map_batches(
        _cached("langvote", _LangVoteStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )
    out = (
        partials.groupby(["lang", "pred_lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .sort(["lang", "pred_lang"])
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Repetition-ratio quality signal (the "duplicate word fraction" family of
# within-document repetition filters popularized by published LLM-corpus
# quality pipelines, e.g. Rae et al. 2021 "Scaling Language Models" Gopher
# appendix A: fraction-of-duplicate-n-grams thresholds). Per doc:
# duplicate-word fraction = 1 - distinct_words/total_words; a doc is
# "repetitive" when (total - distinct) * 10 > 3 * total (i.e. > 30%
# duplicated, pure integer arithmetic on BOTH sides). Fully vectorized:
# distinct counts come from the shared flat-buffer word hasher
# (_shingle_hash_batch at n=1 — a word IS a 1-gram), totals from one
# Arrow count_substring kernel; partials pre-aggregate per source, the
# final groupby is sources-sized. Hash-vs-string distinct divergence is
# the usual ~2^-64/pair argument.
# ---------------------------------------------------------------------------


class _RepetitionStage:
    """Per-batch per-source partials: (n_docs, sum_words,
    sum_distinct_words, n_repetitive)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["text"].combine_chunks()
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        nw = pc.count_substring(col, " ").to_numpy(zero_copy_only=False).astype(
            np.int64
        ) + 1
        off, _hs = _shingle_hash_batch(col, n=1)
        ndw = np.diff(off)
        rep = (nw - ndw) * 10 > 3 * nw
        uniq, inv = np.unique(src, return_inverse=True)
        m = len(uniq)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], pa.string()),
                "n_docs": pa.array(np.bincount(inv, minlength=m).astype(np.int64)),
                "sum_words": pa.array(
                    np.bincount(inv, weights=nw, minlength=m).astype(np.int64)
                ),
                "sum_distinct_words": pa.array(
                    np.bincount(inv, weights=ndw, minlength=m).astype(np.int64)
                ),
                "n_repetitive": pa.array(
                    np.bincount(inv, weights=rep, minlength=m).astype(np.int64)
                ),
            }
        )


def q_repetition_by_source(sf_dir: str) -> pd.DataFrame:
    """Within-document repetition audit per source — the quality gate a
    training pipeline applies before near-dup passes (repetitive docs skew
    both the dedup signatures and the token statistics)."""
    agg = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(_RepetitionStage(), batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs"),
            Sum("sum_words"),
            Sum("sum_distinct_words"),
            Sum("n_repetitive"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["sum(n_docs)"].astype("int64"),
            "sum_words": agg["sum(sum_words)"].astype("int64"),
            "sum_distinct_words": agg["sum(sum_distinct_words)"].astype("int64"),
            "n_repetitive": agg["sum(n_repetitive)"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def repetition_sql() -> str:
    return """
WITH w AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS ndw
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nw) AS BIGINT) AS sum_words,
       CAST(SUM(ndw) AS BIGINT) AS sum_distinct_words,
       CAST(SUM(CASE WHEN (nw - ndw) * 10 > 3 * nw THEN 1 ELSE 0 END)
            AS BIGINT) AS n_repetitive
FROM w GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Literal-marker census per language — the pure-Arrow-kernel text stage:
# pyarrow.compute count_substring / match_substring do ALL the work
# (zero Python per row, zero regex-engine semantics to disagree on: the
# oracle recomputes the same counts with length/replace arithmetic).
# Partials are (lang, marker) ints; the shuffle is |langs| x |markers|.
# ---------------------------------------------------------------------------

_MARKERS = ("merge", "join", "scan")


def _marker_partial(b: pa.Table) -> pa.Table:
    lang = b["lang"].to_numpy(zero_copy_only=False)
    ul, linv = np.unique(lang.astype(str), return_inverse=True)
    text = b["text"].combine_chunks()
    out_lang, out_marker, out_occ, out_docs = [], [], [], []
    for mk in _MARKERS:
        occ = pc.count_substring(text, mk).to_numpy(zero_copy_only=False).astype(np.int64)
        has = (occ > 0).astype(np.int64)
        out_lang.extend(str(s) for s in ul)
        out_marker.extend([mk] * len(ul))
        out_occ.extend(np.bincount(linv, weights=occ, minlength=len(ul)).astype(np.int64))
        out_docs.extend(np.bincount(linv, weights=has, minlength=len(ul)).astype(np.int64))
    return pa.table(
        {
            "k": pa.array([f"{l}\x1f{m}" for l, m in zip(out_lang, out_marker)]),
            "n_occurrences": pa.array(np.asarray(out_occ, dtype=np.int64)),
            "n_docs": pa.array(np.asarray(out_docs, dtype=np.int64)),
        }
    )


def q_marker_counts_by_lang(sf_dir: str) -> pd.DataFrame:
    """(lang, marker, n_docs, n_occurrences): occurrence and containing-doc
    counts of each literal marker, per language."""
    agg = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
        )
        .map_batches(_marker_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_occurrences", alias_name="n_occurrences"),
        )
        .to_pandas()
    )
    parts = agg["k"].str.split("\x1f")
    out = pd.DataFrame(
        {
            "lang": parts.str[0].astype(str),
            "marker": parts.str[1].astype(str),
            "n_docs": agg["n_docs"].astype("int64"),
            "n_occurrences": agg["n_occurrences"].astype("int64"),
        }
    )
    return out.sort_values(["lang", "marker"]).reset_index(drop=True)


def marker_counts_by_lang_sql() -> str:
    per_marker = "\nUNION ALL\n".join(
        f"""
SELECT lang, '{mk}' AS marker,
       CAST(COUNT(*) FILTER (WHERE position('{mk}' IN text) > 0) AS BIGINT)
           AS n_docs,
       CAST(SUM((length(text) - length(replace(text, '{mk}', '')))
                // {len(mk)}) AS BIGINT) AS n_occurrences
FROM documents GROUP BY lang"""
        for mk in _MARKERS
    )
    return f"SELECT * FROM ({per_marker}) ORDER BY lang, marker"


# ---------------------------------------------------------------------------
# Corpus diff (CDC shape): FULL OUTER JOIN of two corpus versions with
# per-source added/removed/changed/same accounting.  Version B is derived
# from A by a deterministic rule both engines apply (drop-first-token for
# n_tok%7==1, drop the doc for %7==3, add a synthetic doc for %7==5), so
# the query needs no second dataset yet exercises the real diff plan: ONE
# scan emits BOTH sides' narrow fingerprint rows (doc_id, len, zigzag
# sum — the change rule always alters the LENGTH, so classification is
# exact integer equality, no hash-collision leap), one doc-hash-bucketed
# shuffle co-locates each id's pair, and the group fold classifies.  At
# 100 TB the same plan diffs two REAL sinks: each side contributes its
# fingerprint rows and the payload never moves.
# ---------------------------------------------------------------------------


def _diff_rows(nb: int):
    def fn(batch: pa.Table) -> pa.Table:
        from tokenzip.chunk import _tokens_parts
        from tokenzip.codecs.varint import zigzag_encode
        from tokenzip.hashutil import md5_digests_str

        lengths, flat = _tokens_parts(batch["tokens"])
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        ntok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        zz = zigzag_encode(flat.astype(np.int32), 32).astype(np.int64)
        ends = np.cumsum(lengths.astype(np.int64))
        starts = ends - lengths
        csum = np.concatenate(([0], np.cumsum(zz)))
        sums = csum[ends] - csum[starts]
        if len(zz):
            first = np.where(lengths > 0, zz[np.minimum(starts, len(zz) - 1)], 0)
        else:
            first = np.zeros(len(lengths), dtype=np.int64)

        mod = ntok % 7
        changed = mod == 1
        removed = mod == 3
        added = mod == 5

        out_id, out_src, out_len, out_sum, out_side = [], [], [], [], []
        # side A: every doc as-is
        out_id.append(ids)
        out_src.append(src)
        out_len.append(lengths.astype(np.int64))
        out_sum.append(sums)
        out_side.append(np.zeros(len(ids), np.int64))
        # side B: survivors, with the change rule applied
        keep = ~removed
        blen = np.where(changed, np.maximum(lengths - 1, 0), lengths).astype(np.int64)
        bsum = np.where(changed, sums - first, sums)
        out_id.append(ids[keep])
        out_src.append(src[keep])
        out_len.append(blen[keep])
        out_sum.append(bsum[keep])
        out_side.append(np.ones(int(keep.sum()), np.int64))
        # side B: synthetic added docs [n_tok]
        if added.any():
            azz = zigzag_encode(ntok[added].astype(np.int32), 32).astype(np.int64)
            out_id.append(np.asarray(["new-" + str(s) for s in ids[added]], dtype=object))
            out_src.append(src[added])
            out_len.append(np.ones(int(added.sum()), np.int64))
            out_sum.append(azz)
            out_side.append(np.ones(int(added.sum()), np.int64))

        all_ids = np.concatenate(out_id)
        col = pa.array([str(s) for s in all_ids], pa.string())
        dig = md5_digests_str(col)
        h = dig[:, :8].copy().view(np.int64).ravel()
        return pa.table(
            {
                "bkt": pa.array((np.abs(h) % nb).astype(np.int64)),
                "doc_id": col,
                "source": pa.array(
                    [str(s) for s in np.concatenate(out_src)], pa.string()
                ),
                "len": pa.array(np.concatenate(out_len)),
                "chk": pa.array(np.concatenate(out_sum)),
                "side": pa.array(np.concatenate(out_side)),
            }
        )

    return fn


def _diff_group(g: pd.DataFrame) -> pd.DataFrame:
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype="object"),
            "n_same": pd.Series([], dtype="int64"),
            "n_changed": pd.Series([], dtype="int64"),
            "n_removed": pd.Series([], dtype="int64"),
            "n_added": pd.Series([], dtype="int64"),
        }
    )
    if not len(g):
        return empty
    ids = g["doc_id"].to_numpy()
    side = g["side"].to_numpy().astype(np.int64)
    ln = g["len"].to_numpy().astype(np.int64)
    chk = g["chk"].to_numpy().astype(np.int64)
    src = g["source"].to_numpy()
    order = np.lexsort((side, ids))
    ids, side, ln, chk, src = (
        ids[order], side[order], ln[order], chk[order], src[order]
    )
    uid, starts = np.unique(ids, return_index=True)
    ends = np.append(starts[1:], len(ids))
    cnt = ends - starts
    if int(cnt.max(initial=0)) > 2:
        raise ValueError("duplicate doc_id within one diff side")
    both = cnt == 2
    only = cnt == 1
    a_only = only & (side[starts] == 0)
    b_only = only & (side[starts] == 1)
    same = np.zeros(len(uid), dtype=bool)
    if both.any():
        s0, s1 = starts[both], starts[both] + 1
        if not (side[s0] == 0).all() or not (side[s1] == 1).all():
            raise ValueError("diff pair with two rows of one side")
        same[both] = (ln[s0] == ln[s1]) & (chk[s0] == chk[s1])
    changed = both & ~same
    gsrc = src[starts].astype(str)
    usrc, sinv = np.unique(gsrc, return_inverse=True)
    def cnt_of(mask):
        return np.bincount(sinv, weights=mask, minlength=len(usrc)).astype(np.int64)
    return pd.DataFrame(
        {
            "source": usrc,
            "n_same": cnt_of(same),
            "n_changed": cnt_of(changed),
            "n_removed": cnt_of(a_only),
            "n_added": cnt_of(b_only),
        }
    )


def q_corpus_diff_stats(sf_dir: str) -> pd.DataFrame:
    """(source, n_same, n_changed, n_removed, n_added) between the corpus
    and its deterministically perturbed next version."""
    import pyarrow.parquet as pq

    from tokenzip.training import _token_paths

    paths = _token_paths(sf_dir)
    # bucket-count sizing from a bounded metadata sample (first 4 footers
    # extrapolated), never an O(files) footer loop
    sample = sum(pq.ParquetFile(p).metadata.num_rows for p in paths[:4])
    total = sample * max(1, len(paths) // min(4, max(len(paths), 1)))
    nb = _lsh_n_buckets(max(total, 1))
    agg = (
        ray.data.read_parquet(paths, columns=["doc_id", "tokens", "n_tok", "source"])
        .map_batches(_diff_rows(nb), batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bkt")
        .map_groups(_diff_group, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n_same", alias_name="n_same"),
            Sum("n_changed", alias_name="n_changed"),
            Sum("n_removed", alias_name="n_removed"),
            Sum("n_added", alias_name="n_added"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_same": agg["n_same"].astype("int64"),
            "n_changed": agg["n_changed"].astype("int64"),
            "n_removed": agg["n_removed"].astype("int64"),
            "n_added": agg["n_added"].astype("int64"),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def corpus_diff_stats_sql(glob: str) -> str:
    return f"""
WITH a AS (SELECT doc_id, tokens, n_tok, source FROM read_parquet('{glob}')),
b AS (
  SELECT doc_id,
         CASE WHEN n_tok % 7 = 1 THEN tokens[2:] ELSE tokens END AS tokens,
         source
  FROM a WHERE n_tok % 7 != 3
  UNION ALL
  SELECT 'new-' || doc_id, [CAST(n_tok AS INTEGER)], source
  FROM a WHERE n_tok % 7 = 5
),
j AS (
  SELECT COALESCE(a.source, b.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.tokens = b.tokens
                   OR (len(a.tokens) = 0 AND len(b.tokens) = 0) THEN 'same'
              ELSE 'changed' END AS cls
  FROM a FULL OUTER JOIN b USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) FILTER (cls = 'same') AS BIGINT) AS n_same,
       CAST(COUNT(*) FILTER (cls = 'changed') AS BIGINT) AS n_changed,
       CAST(COUNT(*) FILTER (cls = 'removed') AS BIGINT) AS n_removed,
       CAST(COUNT(*) FILTER (cls = 'added') AS BIGINT) AS n_added
FROM j GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Corpus-curation funnel: quality -> exact dedup -> mixture, one shuffle
# ---------------------------------------------------------------------------

# The end-to-end composition a pretraining pipeline actually runs, as ONE
# plan: per-doc quality gate (length + repetition, integer rules), exact
# keep-min dedup over the bag-of-words fingerprint, then the salted-md5
# mixture step — and the survival count of every stage per source. Shape:
# the raw count is a text-free column scan; quality survivors shuffle ONCE
# as narrow (bkt, fp, doc_id, source, keep_mix) rows into fingerprint-hash
# buckets where keep-min, and the mixture flag, fold vectorized. The
# mixture rule depends only on doc_id, so applying it after dedup is
# order-independent and retry-stable.

_FUNNEL_MIN_CHARS = 60
_FUNNEL_DEN = 1_000_000
_FUNNEL_REP_NUM = 9  # dup-word fraction <= 90% (a lenient pre-dedup gate:
# harshly repetitive docs are usually ALSO the exact-dup clones, and the
# funnel should show them dying at the dedup stage, not silently earlier)


def _funnel_weight_expr() -> str:
    # even-numbered sources keep 90%, odd 50% (documents sources are srcN)
    return (
        "CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0 "
        f"THEN {int(0.9 * _FUNNEL_DEN)} ELSE {int(0.5 * _FUNNEL_DEN)} END"
    )


def _funnel_weight(src: str) -> int:
    return int(0.9 * _FUNNEL_DEN) if int(src[3:]) % 2 == 0 else int(0.5 * _FUNNEL_DEN)


class _FunnelSurvivorStage:
    """Quality survivors as COMBINED (fp, source) partials — a viral
    fingerprint (one boilerplate page duplicated 1e9 times) collapses to
    one row per batch instead of flooding one bucket group. Each partial
    carries the counts the bucket fold needs: per-(fp, source) doc count,
    the batch-min doc id of that pair, and that min doc's mixture flag
    (keep-min dedup is an argmin reduction, so partial argmins compose)."""

    def __init__(self, nb: int):
        self.nb = nb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokenzip.hashutil import md5_hi60_str

        col = batch["text"].combine_chunks()
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nchars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        nw = pc.count_substring(col, " ").to_numpy(zero_copy_only=False).astype(
            np.int64
        ) + 1
        off, _ = _shingle_hash_batch(col, n=1)
        ndw = np.diff(off)
        q = (nchars >= _FUNNEL_MIN_CHARS) & ((nw - ndw) * 10 <= _FUNNEL_REP_NUM * nw)
        idx = np.flatnonzero(q)
        fps = np.array(
            [doc_fingerprint(col[int(i)].as_py()) for i in idx], dtype=object
        )
        hv = md5_hi60_str(
            pa.array([str(d) for d in did[idx]], pa.string()), b"mix:"
        )
        thr = np.array([_funnel_weight(str(s)) for s in src[idx]], dtype=np.int64)
        keep_mix = (hv % _FUNNEL_DEN) < thr
        dq, sq = did[idx], src[idx]
        # combine per (fp, source): doc count + argmin doc (+ its mix flag)
        key = np.array([f + "\x1f" + s for f, s in zip(fps, sq)], dtype=object)
        ku, ki = np.unique(key, return_inverse=True)
        k = len(ku)
        n = np.bincount(ki, minlength=k).astype(np.int64)
        mn = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, ki, dq)
        is_min = dq == mn[ki]
        mmix = np.zeros(k, np.int64)
        mmix[ki[is_min]] = keep_mix[is_min]  # doc ids unique: one winner
        out_fp = np.array([x.split("\x1f", 1)[0] for x in ku], dtype=object)
        out_src = np.array([x.split("\x1f", 1)[1] for x in ku], dtype=object)
        bkt = np.array([int(f[:8], 16) for f in out_fp], dtype=np.int64) % self.nb
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "fp": pa.array(out_fp, pa.string()),
                "source": pa.array(out_src, pa.string()),
                "n": pa.array(n, pa.int64()),
                "min_doc": pa.array(mn, pa.int64()),
                "min_mix": pa.array(mmix, pa.int64()),
            }
        )


def _funnel_bucket_fold(g: pa.Table) -> pa.Table:
    """Per bucket: fold the (fp, source) partials — global keep-min per fp
    is the min of batch-mins, the winner's source/mix ride its row."""
    fp = g["fp"].to_numpy(zero_copy_only=False)
    src = g["source"].to_numpy(zero_copy_only=False)
    n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    mnd = g["min_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    mmix = g["min_mix"].to_numpy(zero_copy_only=False).astype(bool)
    su, si = np.unique(src, return_inverse=True)
    k = len(su)
    nq = np.zeros(k, np.int64)
    np.add.at(nq, si, n)
    fu, fi = np.unique(fp, return_inverse=True)
    gmin = np.full(len(fu), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(gmin, fi, mnd)
    win = mnd == gmin[fi]  # doc ids unique: exactly one row wins per fp
    nd = np.zeros(k, np.int64)
    np.add.at(nd, si[win], 1)
    nf = np.zeros(k, np.int64)
    np.add.at(nf, si[win & mmix], 1)
    return pa.table(
        {
            "source": pa.array([str(s) for s in su], pa.string()),
            "n_quality": pa.array(nq),
            "n_dedup": pa.array(nd),
            "n_final": pa.array(nf),
        }
    )


def q_curation_funnel(sf_dir: str) -> pd.DataFrame:
    """Per-source survival counts through the curation chain
    raw -> quality -> exact-dedup -> mixture: the budget report that says
    where each source's documents die before training."""
    from ray.data.aggregate import Sum

    nb = _lsh_n_buckets(_doc_count(sf_dir), target=8192)
    raw = (
        _docs(sf_dir, ["source"])
        .groupby("source")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_raw"})
    )
    agg = (
        _docs(sf_dir, ["doc_id", "text", "source", "n_chars"])
        .map_batches(
            _FunnelSurvivorStage(nb),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
        )
        .groupby("bkt")
        .map_groups(_funnel_bucket_fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_quality", alias_name="n_quality"),
            Sum("n_dedup", alias_name="n_dedup"),
            Sum("n_final", alias_name="n_final"),
        )
        .to_pandas()
    )
    out = raw.merge(agg, on="source", how="left").fillna(0)
    out["source"] = out["source"].astype(str)
    for c in ("n_raw", "n_quality", "n_dedup", "n_final"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def curation_funnel_sql() -> str:
    nib = lambda i: f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"
    hv = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    return f"""
WITH base AS (
  SELECT doc_id, source, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS ndw,
         {FP_SQL_EXPR} AS fp,
         md5('mix:' || CAST(doc_id AS VARCHAR)) AS m
  FROM documents
),
q AS (
  SELECT * FROM base
  WHERE n_chars >= {_FUNNEL_MIN_CHARS} AND (nw - ndw) * 10 <= {_FUNNEL_REP_NUM} * nw
),
d AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS kp FROM q),
dd AS (SELECT doc_id, source, m FROM d WHERE doc_id = kp),
fin AS (
  SELECT source FROM (SELECT source, {hv} AS hv FROM dd) x
  WHERE hv % {_FUNNEL_DEN} < ({_funnel_weight_expr()})
),
r AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw
      FROM documents GROUP BY source)
SELECT r.source AS source, n_raw,
       CAST(COALESCE(qq.n, 0) AS BIGINT) AS n_quality,
       CAST(COALESCE(ddn.n, 0) AS BIGINT) AS n_dedup,
       CAST(COALESCE(fn.n, 0) AS BIGINT) AS n_final
FROM r
LEFT JOIN (SELECT source, COUNT(*) AS n FROM q GROUP BY source) qq
  ON r.source = qq.source
LEFT JOIN (SELECT source, COUNT(*) AS n FROM dd GROUP BY source) ddn
  ON r.source = ddn.source
LEFT JOIN (SELECT source, COUNT(*) AS n FROM fin GROUP BY source) fn
  ON r.source = fn.source
ORDER BY r.source
"""
