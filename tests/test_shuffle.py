"""Salted hot-key aggregate: result identity with the direct groupby on a
pathologically skewed key distribution, and the reserved-column guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tokenzip.shuffle import salted_sum


def _skewed_ds(n=20_000, hot_frac=0.9, seed=5):
    rng = np.random.default_rng(seed)
    hot = int(n * hot_frac)
    keys = np.concatenate(
        [np.zeros(hot, np.int64), rng.integers(1, 50, n - hot)]
    )
    rng.shuffle(keys)
    vals = rng.integers(-1000, 1000, n)
    t = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(vals, pa.int64()),
            "w": pa.array(np.abs(vals), pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(8)


def test_salted_sum_equals_direct_groupby(ray_session):
    ds = _skewed_ds()
    from ray.data.aggregate import Sum

    direct = (
        ds.groupby("k").aggregate(Sum("v"), Sum("w"))
        .to_pandas()
        .rename(columns={"sum(v)": "v", "sum(w)": "w"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    salted = (
        salted_sum(ds, ["k"], ["v", "w"], n_salts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(salted, direct, check_dtype=False)
    # the hot key actually dominated (the scenario the helper exists for)
    assert int(direct.loc[direct["k"] == 0, "w"].iloc[0]) > 0


def test_salted_sum_reserved_column_guard(ray_session):
    t = pa.table({"k": pa.array([1]), "__tz_salt__": pa.array([1])})
    with pytest.raises(ValueError, match="reserved"):
        salted_sum(ray.data.from_arrow(t), ["k"], ["__tz_salt__"])


def test_lineitem_qty_salted_matches_oracle(ray_session):
    import duckdb

    from tokenzip.relational import lineitem_qty_salted_sql, q_lineitem_qty_salted

    SF = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    got = q_lineitem_qty_salted(SF).reset_index(drop=True)
    exp = con.sql(lineitem_qty_salted_sql()).df()
    assert int(got["n_items"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
