"""Distributed sketches: HyperLogLog distinct-token counts per source.

The scale story the exact path can't tell: a 100-TB corpus' per-source
vocabulary cardinality via a 4 KB-per-source sketch that rides the normal
map_batches partial-aggregation shape — each batch emits one (source,
registers) row, the merge is an elementwise max, and the only shuffle is
#batches x #sources tiny rows. The EXACT distinct (same number, computed
the expensive way: hash-bucketed (source, token) distinct fold, the same
pattern as training.q_vocab_topk) rides along in the same query so the
DuckDB oracle audits the sketch against ground truth.

HLL per Flajolet et al. 2007 ("HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm"), 64-bit hash variant (no large-range
correction needed): m = 2^12 registers, standard alpha and small-range
linear-counting correction. Deterministic by construction: the hash is the
repo's SplitMix64 finalizer over the token values, registers are pure
functions of the token SET, so re-sharding / retries / resume reproduce
bit-identical registers (the same determinism contract as the codec
selector, SURVEY.md §4.2).

Reference analogs: the register fold is max-per-bucket over a hashed
stream — the same shape as the reference's continuation-bit movemask
bucketing (/root/reference/src/decode/mod.rs:223: classify every lane,
reduce per class); the pinned-constant oracle mirrors the fixed-corpus
fuzz oracles (/root/reference/fuzz/fuzz_targets/fuzz_target_1.rs:6-15).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from tokenzip.corpus import corpus_paths

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers, relative error ~1.04/sqrt(m) = 1.6%

_DISTINCT_BUCKETS = 256  # exact-path shuffle buckets (bounded group count)


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 -> 0). Integer shift
    ladder — no float round-trip, so rho is exact near power-of-two
    boundaries (a float64 log2 rounds 2^k-eps up and misplaces the MSB)."""
    w = w.copy()
    b = np.zeros(w.shape, dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        su = np.uint64(s)
        big = w >= (np.uint64(1) << su)
        b[big] += su
        w[big] >>= su
    b += w  # residue is 0 or 1
    return b


def hll_registers(values: np.ndarray) -> np.ndarray:
    """HLL register array (uint8[m]) of an int token array — a pure
    function of the value SET (order/multiplicity-free), so partials from
    any sharding merge to the same registers via elementwise max."""
    from tokenzip.analysis import _splitmix64

    reg = np.zeros(HLL_M, dtype=np.uint8)
    if len(values) == 0:
        return reg
    # two's-complement widening (int32 -20 and int64 -20 hash identically)
    h = _splitmix64(values.astype(np.int64, copy=False).view(np.uint64))
    idx = h >> np.uint64(64 - HLL_P)
    w = h << np.uint64(HLL_P)  # remaining 52 bits, left-aligned
    # rho = 1 + leading zeros of the remaining bits; all-zero remainder
    # saturates at 64 - P + 1
    rho = np.uint64(65) - _bitlen_u64(w)
    rho[w == 0] = np.uint64(64 - HLL_P + 1)
    # max per register via ONE sort: (idx << 6 | rho) sorts by register
    # then rho, so each register's last element is its max (rho <= 53 < 64)
    comb = np.sort((idx << np.uint64(6)) | rho)
    regs = comb >> np.uint64(6)
    last = np.flatnonzero(
        np.concatenate([regs[1:] != regs[:-1], np.array([True])])
    )
    reg[regs[last]] = (comb[last] & np.uint64(63)).astype(np.uint8)
    return reg


def hll_estimate(reg: np.ndarray) -> int:
    """Cardinality estimate with the standard small-range correction."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.ldexp(1.0, -reg.astype(np.int64))))
    zeros = int(np.count_nonzero(reg == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return int(round(e))


def _tok_by_source(batch: pa.Table):
    """(sources, per-source flat token arrays) of one input batch."""
    from tokenzip.chunk import _tokens_parts

    lengths, flat = _tokens_parts(batch["tokens"])
    src = np.asarray(batch["source"].to_pylist(), dtype=object)
    su, sinv = np.unique(src, return_inverse=True)
    tok_src = np.repeat(sinv, lengths)
    order = np.argsort(tok_src, kind="stable")
    sorted_tok = flat[order]
    bounds = np.searchsorted(tok_src[order], np.arange(len(su) + 1))
    for ci, s in enumerate(su):
        yield str(s), sorted_tok[bounds[ci] : bounds[ci + 1]]


class _HLLPartialStage:
    """One (source, 4096-byte register blob) row per source per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs, regs = [], []
        for s, vals in _tok_by_source(batch):
            srcs.append(s)
            regs.append(hll_registers(vals).tobytes())
        return pa.table(
            {"source": pa.array(srcs, pa.string()),
             "reg": pa.array(regs, pa.binary())}
        )


def _hll_merge_group(df: pd.DataFrame) -> pd.DataFrame:
    regs = np.stack(
        [np.frombuffer(b, dtype=np.uint8) for b in df["reg"]]
    ).max(axis=0)
    return pd.DataFrame(
        {"source": [df["source"].iloc[0]], "n_hll": [hll_estimate(regs)]}
    )


class _DistinctPartialStage:
    """Exact path: per-batch per-source DISTINCT tokens, hash-bucketed so
    the downstream groupby has a bounded group count at any vocabulary
    size (same pathology guard as training._VocabPartialStage)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_b, out_s, out_t = [], [], []
        for s, vals in _tok_by_source(batch):
            u = np.unique(vals).astype(np.int64)
            out_b.append((u % _DISTINCT_BUCKETS).astype(np.int64))
            out_t.append(u)
            out_s.append(np.full(len(u), s, dtype=object))
        if not out_t:
            return pa.table(
                {"bkt": pa.array([], pa.int64()),
                 "source": pa.array([], pa.string()),
                 "token": pa.array([], pa.int64())}
            )
        return pa.table(
            {"bkt": pa.array(np.concatenate(out_b)),
             "source": pa.array(np.concatenate(out_s).astype(str)),
             "token": pa.array(np.concatenate(out_t))}
        )


def _distinct_count_group(df: pd.DataFrame) -> pd.DataFrame:
    """In-bucket fold: count distinct (source, token) pairs per source."""
    d = df.drop_duplicates(["source", "token"])
    g = d.groupby("source", sort=False).size()
    return pd.DataFrame({"source": g.index, "n_part": g.values})


def q_distinct_tokens_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source distinct-token count, twice: exact (hash-bucketed
    distinct fold — the expensive path) and HLL (the 4 KB sketch). Columns
    (source, n_exact, n_hll)."""
    paths = corpus_paths(sf_dir)

    exact = (
        ray.data.read_parquet(paths, columns=["tokens", "source"])
        .map_batches(
            _DistinctPartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bkt")
        .map_groups(_distinct_count_group, batch_format="pandas")
        .groupby("source")
        .sum("n_part")
        .to_pandas()
        .rename(columns={"sum(n_part)": "n_exact"})
    )

    hll = (
        ray.data.read_parquet(paths, columns=["tokens", "source"])
        .map_batches(
            _HLLPartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("source")
        .map_groups(_hll_merge_group, batch_format="pandas")
        .to_pandas()
    )

    out = exact.merge(hll, on="source").sort_values("source").reset_index(drop=True)
    out["n_exact"] = out["n_exact"].astype("int64")
    out["n_hll"] = out["n_hll"].astype("int64")
    return out


# Pinned HLL estimates at the driver's oracle scale (sf0.01, fixed corpus,
# deterministic hash => constants). The SQL self-audit below only returns a
# pin row when it is within 5% of the exact count DuckDB computes itself,
# so a drifted pin (corpus change, hash change, estimator bug) turns into a
# red row-count instead of a silent match. Regenerate via
# q_distinct_tokens_by_source("sf0.01").
DISTINCT_HLL_PIN: list[tuple[str, int]] = [
    ("books", 30246),
    ("code", 50869),
    ("synth", 746378),
    ("web", 46463),
    ("wiki", 1007),
]


def distinct_tokens_sql(glob: str) -> str:
    vals = ", ".join(f"('{s}', {n})" for s, n in DISTINCT_HLL_PIN)
    return f"""
WITH exact AS (
  SELECT source, CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact
  FROM (SELECT source, unnest(tokens) AS t FROM read_parquet('{glob}'))
  GROUP BY source
),
pin(source, n_hll) AS (VALUES {vals})
SELECT e.source AS source, e.n_exact AS n_exact, CAST(p.n_hll AS BIGINT) AS n_hll
FROM exact e JOIN pin p USING (source)
WHERE ABS(CAST(p.n_hll AS DOUBLE) / e.n_exact - 1.0) <= 0.05
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Certified sampled quantiles over an UNBOUNDED value domain.
#
# The exact-quantile op (training.q_seqlen_quantiles_by_source) relies on a
# bounded integer domain (histogram partials). Continuous domains (prices,
# latencies) need the other classical tool: a deterministic uniform sample
# of fixed size k, quantiles read off the sorted sample, with the DKW
# inequality (Dvoretzky-Kiefer-Wolfowitz 1956; Massart 1990 tight constant)
# bounding the rank error: P(sup|F_k - F| > eps) <= 2 exp(-2 k eps^2) —
# k = 4096, eps = 0.05 puts the failure mass at ~2.5e-9.
#
# The sample rule is the repo's salted-md5 bottom-k (stable under
# re-sharding / retries / resume, independent salt from the split/mixture/
# sample hashes), so the DuckDB oracle draws the IDENTICAL sample and the
# quantile values hash-match exactly. The Ray side then CERTIFIES the DKW
# bound against the real data: one extra counting pass measures the exact
# rank of each sampled quantile and raises loudly if any rank error
# exceeds PQ_RANK_EPS — a broken sampler or a skew-corrupted fold can
# never return silently-green quantiles.
# ---------------------------------------------------------------------------

PQ_SAMPLE_K = 4096
PQ_QS = (10, 50, 90, 99)  # percent
PQ_RANK_EPS = 0.05
_PQ_SALT = b"pq:"


class _PricePartialStage:
    """Per-batch bottom-k partial: (hash, cents) rows, at most k per batch.
    The md5 is one C pass over the rendered key column (hashutil), never a
    per-row Python loop."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from tokenzip.hashutil import md5_hi60_str
        from tokenzip.relational import _cents

        keys = pc.cast(batch["o_orderkey"].combine_chunks(), pa.string())
        hv = md5_hi60_str(keys, _PQ_SALT)
        cents = _cents(batch["o_totalprice"])
        if len(hv) > PQ_SAMPLE_K:
            keep = np.argpartition(hv, PQ_SAMPLE_K - 1)[:PQ_SAMPLE_K]
            hv, cents = hv[keep], cents[keep]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(hv), dtype=np.int64)),
                "hv": pa.array(hv),
                "c": pa.array(cents),
            }
        )


def _pq_final_group(g: pd.DataFrame) -> pd.DataFrame:
    """Keep the global bottom-k by hash, then read quantiles off the sorted
    sample at integer-exact ranks ceil(q*n/100) — the identical (q*n+99)//100
    arithmetic the SQL uses (float CEIL drifts; see seqlen_quantiles)."""
    order = np.argsort(g["hv"].to_numpy(), kind="stable")[:PQ_SAMPLE_K]
    cents = np.sort(g["c"].to_numpy()[order])
    ns = len(cents)
    ranks = [(q * ns + 99) // 100 for q in PQ_QS]
    return pd.DataFrame(
        {
            "q_pct": np.asarray(PQ_QS, dtype=np.int64),
            "price_cents": np.asarray(
                [int(cents[r - 1]) for r in ranks], dtype=np.int64
            ),
        }
    )


def q_price_quantiles_sampled(sf_dir: str) -> pd.DataFrame:
    """Quantiles of o_totalprice (cents) from a deterministic k=4096 hash
    sample, rank-certified against the full table. Two bounded passes:
    (1) per-batch bottom-k partials -> one single-group fold (#batches x k
    rows, corpus-size-independent since k is constant) -> 4 quantile rows;
    (2) a counting pass (4 int counters + n per batch) that proves each
    returned value's true rank is within PQ_RANK_EPS of its target."""
    import os

    path = os.path.join(sf_dir, "orders.parquet")
    out = (
        ray.data.read_parquet(path, columns=["o_orderkey", "o_totalprice"])
        .map_batches(
            _PricePartialStage(), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("g")
        .map_groups(_pq_final_group, batch_format="pandas")
        .to_pandas()
        .sort_values("q_pct")
        .reset_index(drop=True)
    )
    vals = out["price_cents"].to_numpy()

    def count_rows(batch: pa.Table) -> pa.Table:
        from tokenzip.relational import _cents

        cents = _cents(batch["o_totalprice"])
        cols = {"n": pa.array([len(cents)], pa.int64())}
        for q, v in zip(PQ_QS, vals):
            cols[f"le_{q}"] = pa.array([int((cents <= v).sum())], pa.int64())
        return pa.table(cols)

    tot = (
        ray.data.read_parquet(path, columns=["o_totalprice"])
        .map_batches(count_rows, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sum()
    )
    n = int(tot["n"])
    for q in PQ_QS:
        err = abs(int(tot[f"le_{q}"]) / n - q / 100.0)
        if err > PQ_RANK_EPS:
            raise ValueError(
                f"sampled quantile q={q} rank error {err:.4f} exceeds "
                f"{PQ_RANK_EPS} (n={n}, k={PQ_SAMPLE_K}) — sampler corrupt "
                f"or DKW bound violated"
            )
    return out.astype({"q_pct": "int64", "price_cents": "int64"})


def price_quantiles_sql() -> str:
    """The oracle draws the IDENTICAL md5 bottom-k sample and reads the
    same integer-exact ranks. Hex-string ORDER BY m equals the Ray side's
    hi-60-bit integer order (15-nibble prefix collisions ~2^-60/pair)."""
    qvals = ",".join(f"({q})" for q in PQ_QS)
    return f"""
WITH h AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
         md5('pq:' || CAST(o_orderkey AS VARCHAR)) AS m
  FROM orders
),
k AS (SELECT c FROM h ORDER BY m LIMIT {PQ_SAMPLE_K}),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
             COUNT(*) OVER () AS ns
      FROM k)
SELECT CAST(q_pct AS BIGINT) AS q_pct,
       CAST(MAX(CASE WHEN rn = (q_pct * ns + 99) // 100 THEN c END)
            AS BIGINT) AS price_cents
FROM r CROSS JOIN (VALUES {qvals}) AS qv(q_pct)
GROUP BY q_pct ORDER BY q_pct
"""
