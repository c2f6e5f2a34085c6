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
