"""HyperLogLog sketch: accuracy, merge algebra, determinism, oracle audit."""

import numpy as np
import pandas as pd

from tokenzip.sketch import (
    DISTINCT_HLL_PIN,
    HLL_M,
    hll_estimate,
    hll_registers,
    q_distinct_tokens_by_source,
)


def test_hll_accuracy_within_3pct():
    rng = np.random.default_rng(7)
    for true_n in (500, 10_000, 200_000):
        vals = rng.choice(10**9, size=true_n, replace=False).astype(np.int64)
        # multiplicity must not matter
        stream = np.concatenate([vals, vals[: true_n // 2]])
        est = hll_estimate(hll_registers(stream))
        assert abs(est / true_n - 1.0) < 0.03, (true_n, est)


def test_hll_small_range_exactish():
    vals = np.arange(50, dtype=np.int64)
    est = hll_estimate(hll_registers(vals))
    assert abs(est - 50) <= 2


def test_hll_empty_and_single():
    assert hll_estimate(hll_registers(np.empty(0, np.int64))) == 0
    assert hll_estimate(hll_registers(np.array([42], np.int64))) == 1


def test_hll_merge_is_elementwise_max():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 2**40, 30_000).astype(np.int64)
    b = rng.integers(0, 2**40, 30_000).astype(np.int64)
    merged = np.maximum(hll_registers(a), hll_registers(b))
    assert (merged == hll_registers(np.concatenate([a, b]))).all()


def test_hll_determinism_across_sharding():
    rng = np.random.default_rng(13)
    vals = rng.integers(-(2**31), 2**31, 100_000).astype(np.int64)
    whole = hll_registers(vals)
    parts = np.array_split(vals, 7)
    merged = np.zeros(HLL_M, np.uint8)
    for p in parts:
        merged = np.maximum(merged, hll_registers(p))
    assert (whole == merged).all()
    # int32 vs int64 carriers of the same values hash identically
    assert (hll_registers(vals.astype(np.int32)) == whole).all()


def test_query_matches_pin_and_exact(ray_session):
    got = q_distinct_tokens_by_source("sf0.01")
    assert list(got.columns) == ["source", "n_exact", "n_hll"]
    pin = dict(DISTINCT_HLL_PIN)
    assert dict(zip(got["source"], got["n_hll"])) == pin, (
        "HLL drifted — regenerate DISTINCT_HLL_PIN:\n" + repr(got)
    )
    err = (got["n_hll"] / got["n_exact"] - 1.0).abs()
    assert (err <= 0.05).all(), got


def test_oracle_self_audit_rejects_bad_pin(ray_session):
    import duckdb

    from tokenzip import sketch
    from tokenzip.corpus import ensure_corpus

    glob = ensure_corpus("sf0.01") + "/*.parquet"
    good = duckdb.sql(sketch.distinct_tokens_sql(glob)).df()
    assert len(good) == len(DISTINCT_HLL_PIN)
    orig = sketch.DISTINCT_HLL_PIN
    try:
        sketch.DISTINCT_HLL_PIN = [(s, n * 2) for s, n in orig]
        bad = duckdb.sql(sketch.distinct_tokens_sql(glob)).df()
        assert len(bad) == 0
    finally:
        sketch.DISTINCT_HLL_PIN = orig
