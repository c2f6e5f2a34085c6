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
    h = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
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
        self.q = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
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
    f = pq.ParquetFile(path)
    parts, have = [], 0
    for rg in range(f.num_row_groups):
        parts.append(f.read_row_group(rg, columns=["embedding"]))
        have += parts[-1].num_rows
        if have >= _IVF_TRAIN_ROWS:
            break
    head = pa.concat_tables(parts).slice(0, _IVF_TRAIN_ROWS)
    emb = _emb_matrix(head["embedding"])
    qv = _fetch_query_vector(path)

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


def _md5_64(s: str) -> int:
    import hashlib as hl

    return int.from_bytes(hl.md5(s.encode()).digest()[:8], "little")


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """64-bit md5 hashes of word n-grams. Split on ' ' (exactly DuckDB's
    string_split) so the SQL oracle shingles identically; distinct-set
    semantics via np.unique. Hash collisions would perturb intersection
    counts vs the string-set oracle; at 64 bits they are negligible."""
    words = text.split(" ")
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(np.array([_md5_64(g) for g in grams], dtype=np.uint64))


class _MinHashStage:
    """Per-doc MinHash signature -> one row per LSH band:
    (band, band_hash, doc_id, shingles). The shingle array rides the band
    shuffle (bands x ~words bytes amplification — the standard LSH-dedup
    shuffle cost) so verification happens INSIDE the band buckets with no
    driver materialization. Permutation coefficients are seeded, built once
    per worker."""

    def __init__(self, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MH_PRIME, _MH_K, dtype=np.uint64)
        self.b = rng.integers(0, _MH_PRIME, _MH_K, dtype=np.uint64)

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(_MH_K, _MH_PRIME, dtype=np.uint64)
        x = sh % np.uint64(_MH_PRIME)
        v = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MH_PRIME)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib as hl

        r = _MH_K // _MH_BANDS
        bands_col, bh_col, id_col, sh_col = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sh = _shingle_hashes(text)
            sig = self.signature(sh)
            sh_list = sh.tolist()
            for band in range(_MH_BANDS):
                chunk = sig[band * r : (band + 1) * r].tobytes()
                bh = int.from_bytes(hl.md5(chunk).digest()[:8], "little")
                bands_col.append(band)
                bh_col.append(bh)
                id_col.append(doc_id)
                sh_col.append(sh_list)
        return pa.table(
            {
                "band": pa.array(bands_col, pa.int32()),
                "band_hash": pa.array(bh_col, pa.uint64()),
                "doc_id": pa.array(id_col, pa.int64()),
                "shingles": pa.array(sh_col, pa.list_(pa.uint64())),
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


def _bucket_verify_pairs(threshold_num: int, threshold_den: int):
    """Exact-Jaccard verification INSIDE one LSH bucket (map_groups), with
    VIRAL-CLUSTER COLLAPSE: docs with identical shingle sets are grouped
    first, intra-cluster pairs (always J=1) are emitted as ONE closed-form
    row (from band 0 only — identical sets collide in every band), and
    cross-cluster pairs are verified once per representative pair carrying
    |G1|x|G2| weight. A k-clone near-dup cluster therefore costs O(k log k)
    rows+work instead of O(k^2). Integer cross-multiplication
    (den*inter >= num*union) so the SQL oracle compares identically."""

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("a", "b", "dup", "w_pairs", "w_chk")}
        )
        if len(g) < 2:
            return empty
        ids_all = g["doc_id"].to_numpy().astype(np.int64)
        shingles = np.asarray(g["shingles"], dtype=object)
        band = int(g["band"].iloc[0])
        # group by identical shingle set (order-insensitive content key)
        import hashlib as hl

        keys = [
            hl.md5(np.sort(np.asarray(s, dtype=np.uint64)).tobytes()).digest()
            for s in shingles
        ]
        groups: dict[bytes, list[int]] = {}
        rep_set: dict[bytes, set] = {}
        for i, key in enumerate(keys):
            if key not in groups:
                groups[key] = []
                rep_set[key] = set(np.asarray(shingles[i], dtype=np.uint64).tolist())
            groups[key].append(i)
        gkeys = sorted(groups, key=lambda k: int(ids_all[groups[k]].min()))
        rows = {"a": [], "b": [], "dup": [], "w_pairs": [], "w_chk": []}
        # intra-cluster pairs: J == 1, emit once (band 0 — same signature
        # implies same bucket in EVERY band)
        if band == 0:
            for key in gkeys:
                members = np.sort(ids_all[groups[key]])
                k = len(members)
                if k < 2:
                    continue
                rows["a"].append(-1)
                rows["b"].append(int(members[0]))
                rows["dup"].append(1)
                rows["w_pairs"].append(k * (k - 1) // 2)
                rows["w_chk"].append(_intra_pair_chk(members))
        # cross-cluster pairs: verify once per representative pair
        for x in range(len(gkeys)):
            for y in range(x + 1, len(gkeys)):
                sa, sb = rep_set[gkeys[x]], rep_set[gkeys[y]]
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                dup = int(
                    threshold_den * inter >= threshold_num * union if union else True
                )
                A = np.sort(ids_all[groups[gkeys[x]]])
                B = np.sort(ids_all[groups[gkeys[y]]])
                rows["a"].append(int(min(A[0], B[0])))
                rows["b"].append(int(max(A[0], B[0])))
                rows["dup"].append(dup)
                rows["w_pairs"].append(len(A) * len(B))
                rows["w_chk"].append(_cross_pair_chk(A, B))
        if not rows["a"]:
            return empty
        return pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
        )

    return verify


class _ShingleStatsStage:
    """Per-batch partial (n_docs, sum_shingles) over the documents scan."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns = [len(_shingle_hashes(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "n_docs": pa.array([len(ns)], pa.int64()),
                "sum_shingles": pa.array([int(sum(ns))], pa.int64()),
            }
        )


def q_dedup_minhash(sf_dir: str, threshold=(7, 10)):
    """MinHash+LSH near-dup, fully distributed: shingle -> minhash -> band
    -> groupby(band, band_hash) -> exact-Jaccard verify INSIDE each bucket
    (map_groups; shingle sets ride the band shuffle, never the driver) ->
    pair dedupe via groupby(a, b) -> tiny count/checksum aggregates.

    Oracle: DuckDB computes ALL pairs with word-3-gram Jaccard >= 7/10 via an
    inverted-index self-join; with 32x2 banding the LSH candidate set
    contains every such pair w.h.p. (P_miss ~ 4e-10 per pair), so the
    verified counts match exactly. Returns one row:
    (n_docs, sum_shingles, n_dup_pairs, pair_checksum)."""
    from ray.data.aggregate import Max, Sum as _Sum

    num, den = threshold
    ds = _docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(
        _cached("minhash", _MinHashStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        _bucket_verify_pairs(num, den), batch_format="pandas"
    )
    # rows repeated across bands are IDENTICAL (cluster keys are global), so
    # Max over every carried column dedupes them
    uniq = pairs.groupby(["a", "b"]).aggregate(
        Max("dup", alias_name="dup"),
        Max("w_pairs", alias_name="w_pairs"),
        Max("w_chk", alias_name="w_chk"),
    )

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
    stats = _docs(sf_dir, ["text"]).map_batches(
        _cached("shstats", _ShingleStatsStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    ).sum(["n_docs", "sum_shingles"])
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


def simhash60(text: str, _cache: dict | None = None) -> int:
    """60-bit SimHash over DISTINCT words; word hash = first 15 hex nibbles
    of md5(word) (an int64-safe value DuckDB recomputes with strpos
    arithmetic)."""
    import hashlib as hl

    words = set(text.split(" "))
    hs = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = None if _cache is None else _cache.get(w)
        if h is None:
            h = int(hl.md5(w.encode()).hexdigest()[:15], 16)
            if _cache is not None:
                _cache[w] = h
        hs[i] = h
    bits = (hs[:, None] >> np.arange(_SH_BITS, dtype=np.uint64)) & np.uint64(1)
    score = bits.sum(axis=0, dtype=np.int64) * 2 - len(hs)
    return int(((score > 0).astype(np.uint64) << np.arange(_SH_BITS, dtype=np.uint64)).sum())


class _SimHashStage:
    """Per-doc simhash -> one row per (primary band, sub-band) bucket:
    (bkey, band_val, doc_id, simhash) — 16 tiny rows per doc. Word-hash
    cache is per worker (vocabulary is tiny vs corpus)."""

    def __init__(self):
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = np.array(
            [simhash60(t, self.cache) for t in batch["text"].to_pylist()],
            dtype=np.uint64,
        )
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
        return pa.table(
            {
                "bkey": pa.array(np.concatenate(bkeys), pa.int32()),
                "band_val": pa.array(
                    np.concatenate(vals).astype(np.int64), pa.int64()
                ),
                "doc_id": pa.array(np.tile(ids, reps), pa.int64()),
                "simhash": pa.array(np.tile(hs, reps).astype(np.int64), pa.int64()),
            }
        )


def _simhash_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Pair verification inside one (band, sub-band) bucket with VIRAL
    COLLAPSE: docs sharing an identical simhash are grouped first — intra
    pairs (hamming 0, always dup) are ONE closed-form row per cluster
    (emitted from bucket 0 only: identical hashes collide in every bucket),
    and cross pairs are popcount-checked once per distinct-hash pair with
    |G1|x|G2| weight. A k-clone cluster costs O(k log k), never O(k^2);
    only dup cross rows are emitted (non-dups contribute nothing)."""
    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64")
         for c in ("a", "b", "dup", "w_pairs", "w_chk")}
    )
    if len(g) < 2:
        return empty
    ids_all = g["doc_id"].to_numpy().astype(np.int64)
    hs_all = g["simhash"].to_numpy().astype(np.int64)
    bkey = int(g["bkey"].iloc[0])
    uniq_h, inv = np.unique(hs_all, return_inverse=True)
    rows = {"a": [], "b": [], "dup": [], "w_pairs": [], "w_chk": []}
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
    if not rows["a"]:
        return empty
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup, fully distributed: 60-bit simhash -> 4 bands x 4
    sub-bands of tiny bucket rows -> groupby(bkey, band_val) -> viral-collapsed
    popcount verify inside buckets (closed-form weighted rows, O(k log k) for
    k-clone clusters) -> pair dedupe via groupby(a, b) -> tiny aggregates.
    Candidate recall is EXACT (two-level pigeonhole at hamming <= 3, see
    _SH_SUB_WIDTHS), so the brute-force SQL oracle counts the identical pair
    set. Returns one row:
    (n_docs, simhash_checksum, n_dup_pairs, pair_checksum)."""
    from ray.data.aggregate import Max

    ds = _docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(
        _cached("simhash", _SimHashStage),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )
    pairs = bands.groupby(["bkey", "band_val"]).map_groups(
        _simhash_bucket_pairs, batch_format="pandas"
    )
    # rows for the same (a, b) are identical across buckets — Max dedupes
    uniq = pairs.groupby(["a", "b"]).aggregate(
        Max("dup", alias_name="dup"),
        Max("w_pairs", alias_name="w_pairs"),
        Max("w_chk", alias_name="w_chk"),
    )

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
