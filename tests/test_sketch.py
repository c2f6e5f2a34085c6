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


# ---------------------------------------------------------------------------
# Certified sampled quantiles
# ---------------------------------------------------------------------------


def _write_orders_prices(d, prices):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(prices)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array([0] * n, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )


def test_price_quantiles_small_table_is_exact(ray_session, tmp_path):
    """n < k: the sample IS the table, so quantiles are the exact
    ceil-rank order statistics."""
    from tokenzip.sketch import q_price_quantiles_sampled

    prices = [float(i) for i in range(1, 101)]  # 1.00 .. 100.00
    _write_orders_prices(tmp_path, prices)
    got = q_price_quantiles_sampled(str(tmp_path))
    # rank (q*100+99)//100 of 1..100 -> value == rank dollars
    exp = {10: 1000, 50: 5000, 90: 9000, 99: 9900}
    for _, row in got.iterrows():
        assert int(row["price_cents"]) == exp[int(row["q_pct"])]


def test_price_quantiles_rank_arithmetic_matches_duckdb():
    """The (q*n+99)//100 rank is integer-exact and identical to the SQL's
    expression for every n that has bitten float-ceil formulas before."""
    import duckdb

    for ns in (1, 99, 100, 101, 1500, 4096, 9999):
        for q in (10, 50, 90, 99):
            sql = duckdb.sql(f"SELECT ({q} * {ns} + 99) // 100").fetchone()[0]
            assert sql == (q * ns + 99) // 100


def test_price_quantiles_match_oracle_sf0001(ray_session):
    import duckdb

    from tokenzip.sketch import price_quantiles_sql, q_price_quantiles_sampled

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    got = q_price_quantiles_sampled("/root/testdata/sf0.001").reset_index(drop=True)
    exp = con.sql(price_quantiles_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_price_quantiles_certification_catches_corrupt_values(ray_session, tmp_path, monkeypatch):
    """Corrupting the sample fold (simulating a broken sampler) must trip
    the DKW rank certification, never return silently."""
    import tokenzip.sketch as S

    _write_orders_prices(tmp_path, [float(i) for i in range(1, 201)])

    real = S._pq_final_group

    def corrupt(g):
        out = real(g)
        out["price_cents"] = 1  # every quantile claims the minimum
        return out

    monkeypatch.setattr(S, "_pq_final_group", corrupt)
    import pytest as _pt

    with _pt.raises(ValueError, match="rank error"):
        S.q_price_quantiles_sampled(str(tmp_path))
