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
import ray
import ray.data
from ray.data.aggregate import Sum

from tokenzip.pipeline import _default_concurrency

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


def _add_md5(batch: pa.Table) -> pa.Table:
    h = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
    return batch.append_column("h", pa.array(h, pa.string()))


def q_dedup_exact(sf_dir: str):
    """Exact dedup: md5(text) -> groupby(hash) -> keep min(doc_id); report
    per-source kept counts and a kept-id checksum. The groupby IS the
    hash-partition: every duplicate set meets in one group regardless of
    which input fragment its members came from."""
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    hashed = ds.map_batches(_add_md5, batch_format="pyarrow", zero_copy_batch=True)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, "doc_id")

    kept = hashed.groupby("h").map_groups(keep_first, batch_format="pandas")
    from ray.data.aggregate import Count

    out = (
        kept.groupby("source")
        .aggregate(
            Count(alias_name="n_kept"),
            Sum("doc_id", alias_name="sum_kept_ids"),
        )
        .to_pandas()
    )
    n_docs = (
        ds.groupby("source").count().to_pandas().rename(columns={"count()": "n_docs"})
    )
    res = n_docs.merge(out, on="source")
    res = res.sort_values("source").reset_index(drop=True)
    res["n_docs"] = res["n_docs"].astype("int64")
    res["n_kept"] = res["n_kept"].astype("int64")
    res["sum_kept_ids"] = res["sum_kept_ids"].astype("int64")
    return res[["source", "n_docs", "n_kept", "sum_kept_ids"]]


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k with a broadcast query vector
# ---------------------------------------------------------------------------


class _CosineStage:
    """Per-batch cosine similarities against a broadcast query matrix:
    the query vector is ray.put once on the driver and fetched once per
    actor here — never shipped per batch."""

    def __init__(self, query_ref, k: int):
        self.q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
        self.qn = self.q / np.linalg.norm(self.q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(
            [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
        )
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
    import pyarrow.parquet as pq

    head = pq.read_table(path, columns=["vec_id", "embedding"])
    qrow = head.take([int(np.argmin(head["vec_id"].to_numpy(zero_copy_only=False)))])
    qv = np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)
    qref = ray.put(qv)

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
        self.cent = ray.get(centroids_ref)
        q = ray.get(query_ref)
        self.qn = q / np.linalg.norm(q)
        self.probe = set(int(i) for i in probe_ids)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(
            [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
        )
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


def q_embedding_topk_ivf(sf_dir: str, k: int = 10, n_clusters: int = 8, n_probe: int = 3):
    """IVF-bucketed approximate top-k + recall vs the brute-force result.
    Seeded k-means (4 Lloyd iterations) trains centroids driver-side on a
    sample; rows-only check (approximate by design). Returns one row:
    (k, n_probe, n_clusters, recall_pct_x100, n_found)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding"])
    emb = np.stack([np.asarray(e, dtype=np.float64) for e in head["embedding"].to_pylist()])
    ids = head["vec_id"].to_numpy(zero_copy_only=False)
    qv = emb[int(np.argmin(ids))]

    rng = np.random.default_rng(42)
    cent = emb[rng.choice(len(emb), size=min(n_clusters, len(emb)), replace=False)]
    for _ in range(4):  # seeded Lloyd iterations (deterministic)
        assign = np.argmax(emb @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = emb[m].mean(axis=0)
    qn = qv / np.linalg.norm(qv)
    probe_ids = np.argsort(-(cent @ qn))[:n_probe]

    cent_ref, q_ref = ray.put(cent), ray.put(qv)
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
# Near-duplicate detection: MinHash + LSH banding
# ---------------------------------------------------------------------------

_MH_K = 64          # minhash permutations
_MH_BANDS = 16      # 16 bands x 4 rows
# Mersenne prime 2^31-1: coefficients < 2^31 and crc32 inputs < 2^32 keep
# a*x + b < 2^63, so the whole (k, m) permutation matrix stays in exact
# uint64 arithmetic — no object-dtype fallback
_MH_PRIME = (1 << 31) - 1


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """crc32 of word n-grams (deterministic across processes, unlike
    Python's salted hash())."""
    import zlib

    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(
        np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64)
    )


class _MinHashStage:
    """Per-doc 64-permutation MinHash signature -> (band, band_hash) rows.
    Permutation coefficients are module-deterministic (seeded), built once
    per worker."""

    def __init__(self, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MH_PRIME, _MH_K, dtype=np.uint64)
        self.b = rng.integers(0, _MH_PRIME, _MH_K, dtype=np.uint64)

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(_MH_K, _MH_PRIME, dtype=np.uint64)
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MH_PRIME)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib as hl

        rows = {"band": [], "band_hash": [], "doc_id": [], "source": []}
        for doc_id, text, source in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["source"].to_pylist(),
        ):
            sig = self.signature(_shingle_hashes(text))
            r = _MH_K // _MH_BANDS
            for band in range(_MH_BANDS):
                chunk = sig[band * r : (band + 1) * r].tobytes()
                bh = int.from_bytes(hl.sha1(chunk).digest()[:8], "little")
                rows["band"].append(band)
                rows["band_hash"].append(bh)
                rows["doc_id"].append(doc_id)
                rows["source"].append(source)
        return pa.table(
            {
                "band": pa.array(rows["band"], pa.int32()),
                "band_hash": pa.array(rows["band_hash"], pa.uint64()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "source": pa.array(rows["source"], pa.string()),
            }
        )


def q_dedup_minhash(sf_dir: str, jaccard_threshold: float = 0.7):
    """MinHash+LSH near-dup pipeline: shingle -> minhash -> band ->
    groupby(band, band_hash) -> candidate pairs -> exact-Jaccard verify.

    Verification joins shingle sets via a broadcast dict (documents fit; at
    100 TB this becomes a hash-partitioned pair join on doc_id instead —
    same groupby machinery, documented partitioning assumption).
    Returns one row: candidate/verified pair counts + deterministic checksum.
    """
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    bands = ds.map_batches(
        _cached("minhash", _MinHashStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ia], "b": ids[ib]})

    cand = (
        bands.groupby(["band", "band_hash"])
        .map_groups(pairs_of, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)

    # exact verify with broadcast shingle sets
    docs = _docs(sf_dir, ["doc_id", "text"]).to_pandas()
    shingles = {
        int(d): set(_shingle_hashes(t).tolist())
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    n_dup = 0
    checksum = 0
    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = shingles[int(a)], shingles[int(b)]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 1.0
        if j >= jaccard_threshold:
            n_dup += 1
            checksum = (checksum + int(a) * 1_000_003 + int(b)) % (1 << 62)
    return pd.DataFrame(
        [{"n_candidate_pairs": len(cand), "n_dup_pairs": n_dup,
          "pair_checksum": checksum}]
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class _SimHashStage:
    """64-bit SimHash over word hashes; emits (doc_id, simhash, source)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        out_id, out_h, out_src = [], [], []
        for doc_id, text, source in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["source"].to_pylist(),
        ):
            words = text.split()
            if not words:
                h = 0
            else:
                hs = np.array([zlib.crc32(w.encode()) for w in words], dtype=np.uint64)
                hs = hs * np.uint64(0x9E3779B97F4A7C15)  # spread to 64 bits
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
                score = bits.sum(axis=0) * 2 - len(hs)
                h = int(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out_id.append(doc_id)
            out_h.append(h)
            out_src.append(source)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_h, pa.uint64()),
                "source": pa.array(out_src, pa.string()),
            }
        )


def q_dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup: 4x16-bit band buckets, hamming-verified pairs.
    Returns one row of counts (rows-only check)."""
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    sigs = ds.map_batches(
        _cached("simhash", _SimHashStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    ).to_pandas()
    h = sigs["simhash"].to_numpy().astype(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    cand = set()
    for band in range(4):
        key = (h >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"k": key, "i": np.arange(len(h))})
        for _, g in df.groupby("k"):
            idx = g["i"].to_numpy()
            if len(idx) > 1:
                ia, ib = np.triu_indices(len(idx), k=1)
                cand.update(zip(idx[ia].tolist(), idx[ib].tolist()))
    n_dup = 0
    for ia, ib in cand:
        ham = bin(int(h[ia]) ^ int(h[ib])).count("1")
        if ham <= max_hamming:
            n_dup += 1
    return pd.DataFrame(
        [{"n_docs": len(h), "n_candidate_pairs": len(cand), "n_dup_pairs": n_dup}]
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
