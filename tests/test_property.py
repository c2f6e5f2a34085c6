"""Property-based tests (hypothesis) — the engine analog of the reference's
cargo-fuzz differential targets (/root/reference/fuzz/fuzz_targets/*):
arbitrary inputs, SIMD-style vectorized implementation vs scalar oracle."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tokenzip.codecs.core import INT_CODECS, decode_int_column, encode_int_column
from tokenzip.codecs.strings import decode_str_column, encode_str_column
from tokenzip.codecs.varint import (
    decode_leb128,
    encode_leb128,
    leb128_encode_scalar,
    leb128_size,
    zigzag_decode,
    zigzag_encode,
)

i32 = st.integers(-(2**31), 2**31 - 1)
u64 = st.integers(0, 2**64 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(u64, max_size=200))
def test_leb128_matches_scalar_oracle(vals):
    u = np.array(vals, dtype=np.uint64)
    blob = encode_leb128(u)
    assert blob == b"".join(leb128_encode_scalar(v) for v in vals)
    got = decode_leb128(blob, len(vals), width=64)
    np.testing.assert_array_equal(got.astype(np.uint64), u)
    assert int(leb128_size(u).sum()) == len(blob)


@settings(max_examples=200, deadline=None)
@given(st.lists(i32, max_size=200))
def test_zigzag_roundtrip_and_order(vals):
    x = np.array(vals, dtype=np.int32)
    u = zigzag_encode(x, 32)
    np.testing.assert_array_equal(zigzag_decode(u, 32), x)
    # zigzag maps small magnitudes to small codes: |x| <= 2^k => u < 2^(k+1)
    assert (u.astype(np.int64) <= 2 * np.abs(x.astype(np.int64))).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(i32, max_size=300), st.sampled_from(sorted(INT_CODECS)))
def test_every_int_codec_roundtrips_any_input(vals, codec):
    x = np.array(vals, dtype=np.int32)
    blob = encode_int_column(x, codec, width=32)
    np.testing.assert_array_equal(decode_int_column(blob, dtype=np.int32), x)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=100))
def test_string_auto_codec_roundtrips_any_input(vals):
    import pyarrow as pa

    arr = pa.array(vals, pa.string())
    assert decode_str_column(encode_str_column(arr, "auto")).to_pylist() == vals


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=60))
def test_fsst_any_bytes(blobs):
    # exercise fsst on arbitrary byte content via latin-1 round-trippable text
    import pyarrow as pa

    vals = [b.decode("latin-1") for b in blobs]
    arr = pa.array(vals, pa.string())
    got = decode_str_column(encode_str_column(arr, "fsst")).to_pylist()
    assert got == vals


@settings(deadline=None, max_examples=60)
@given(
    bits=st.lists(st.integers(0, 2**64 - 1), max_size=200),
    width=st.sampled_from([32, 64]),
)
def test_float_codec_roundtrips_any_bit_pattern(bits, width):
    """Every uint bit pattern — including NaN payloads, denormals, ±inf,
    -0.0 — roundtrips bit-exactly through all three float codecs' selector."""
    from tokenzip.codecs.core import decode_float_column, encode_float_column

    udt = np.uint32 if width == 32 else np.uint64
    fdt = np.float32 if width == 32 else np.float64
    u = np.array([b & (2**width - 1) for b in bits], dtype=udt)
    v = u.view(fdt)
    out = decode_float_column(encode_float_column(v, width))
    assert out.dtype == fdt
    assert np.array_equal(u, out.view(udt))


@settings(deadline=None, max_examples=60)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),          # user
            st.integers(0, 1),          # event type index
            st.integers(0, 10_000_000), # t_ms
        ),
        max_size=60,
    )
)
def test_suppress_group_matches_bruteforce(rows):
    """_suppress_group == the LAG rule computed the slow way: an event is
    suppressed iff its same-(user,type) predecessor (by ts, event_id) is
    strictly within the window."""
    import pandas as pd

    from tokenzip.relational import _SUPPRESS_MS, _suppress_group

    et_names = np.array(["a", "b"])
    g = pd.DataFrame(
        {
            "uid": [r[0] for r in rows],
            "tms": [r[2] for r in rows],
            "eid": range(len(rows)),
            "event_type": [et_names[r[1]] for r in rows],
        }
    )
    got = (
        _suppress_group(g)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # brute force
    exp = {}
    order = sorted(range(len(rows)), key=lambda i: (rows[i][2], i))
    last: dict = {}
    for i in order:
        u, t, ms = rows[i]
        key = (u, t)
        name = et_names[t]
        n, s = exp.get(name, (0, 0))
        sup = key in last and ms - last[key] < _SUPPRESS_MS
        exp[name] = (n + 1, s + (1 if sup else 0))
        last[key] = ms
    exp_df = pd.DataFrame(
        sorted((k, n, s) for k, (n, s) in exp.items()),
        columns=["event_type", "n_events", "n_suppressed"],
    )
    pd.testing.assert_frame_equal(
        got, exp_df, check_dtype=False
    )


@settings(deadline=None, max_examples=60)
@given(
    orders=st.dictionaries(
        st.integers(0, 20), st.sampled_from(["P1", "P2"]), max_size=12
    ),
    lines=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5)),  # (orderkey, month idx)
        max_size=40,
    ),
)
def test_all_month_group_matches_bruteforce(orders, lines):
    """_all_month_group == 'every lineitem in one month' per order."""
    import pandas as pd

    from tokenzip.relational import _all_month_group

    lines = [(k, m) for k, m in lines if k in orders]
    ok = sorted(orders)
    g = pd.DataFrame(
        {
            "side": [0] * len(ok) + [1] * len(lines),
            "key": ok + [k for k, _ in lines],
            "month": [0] * len(ok) + [202001 + m for _, m in lines],
            "prio": [orders[k] for k in ok] + [""] * len(lines),
        }
    )
    got = _all_month_group(g).to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    exp: dict = {}
    for k in ok:
        months = {m for kk, m in lines if kk == k}
        if len(months) == 1:
            p = orders[k]
            exp[p] = exp.get(p, 0) + 1
    exp_df = pd.DataFrame(
        sorted(exp.items()), columns=["o_orderpriority", "n"]
    )
    if not len(exp_df):
        assert not len(got)
    else:
        pd.testing.assert_frame_equal(got, exp_df, check_dtype=False)


@settings(deadline=None, max_examples=60)
@given(
    custs=st.dictionaries(
        st.integers(0, 15),
        st.tuples(st.integers(-5000, 5000), st.sampled_from(["A", "B"])),
        max_size=10,
    ),
    orders=st.lists(st.integers(0, 15), max_size=30),
)
def test_q22_group_matches_bruteforce(custs, orders):
    """Anti-join + scalar threshold == the slow way."""
    import pandas as pd

    from tokenzip.relational import _q22_group

    orders = [o for o in orders if o in custs]
    ck = sorted(custs)
    n_cust = len(ck) + 3          # global figures include other buckets
    total_cents = 1234
    g = pd.DataFrame(
        {
            "side": [0] * len(ck) + [1] * len(orders),
            "key": ck + orders,
            "val": [custs[c][0] for c in ck] + [0] * len(orders),
            "seg": [custs[c][1] for c in ck] + [""] * len(orders),
        }
    )
    got = _q22_group(total_cents, n_cust)(g).to_pandas()
    exp: dict = {}
    ordered = set(orders)
    for c in ck:
        bal, seg = custs[c]
        if c not in ordered and bal * n_cust > total_cents:
            n, s = exp.get(seg, (0, 0))
            exp[seg] = (n + 1, s + bal)
    exp_df = pd.DataFrame(
        sorted((k, n, s) for k, (n, s) in exp.items()),
        columns=["c_mktsegment", "n", "cents"],
    )
    if not len(exp_df):
        assert not len(got)
    else:
        pd.testing.assert_frame_equal(
            got.sort_values("c_mktsegment").reset_index(drop=True),
            exp_df,
            check_dtype=False,
        )


@settings(deadline=None, max_examples=60)
@given(
    orders=st.dictionaries(st.integers(0, 12), st.integers(0, 6), max_size=8),
    lines=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 3), st.integers(1, 100)),
        max_size=30,
    ),
    custnat=st.lists(st.integers(0, 3), min_size=7, max_size=7),
)
def test_q5_stages_match_bruteforce(orders, lines, custnat):
    """Both Q5 group stages composed == the 4-way join computed slowly.
    orders: orderkey -> custkey (0..6); lines: (orderkey, s_nat, rev);
    custnat[custkey] = c_nationkey."""
    import pandas as pd

    from tokenzip.relational import _q5_stage1_group, _q5_stage2_group

    lines = [l for l in lines if l[0] in orders]
    ok = sorted(orders)
    g1 = pd.DataFrame(
        {
            "side": [0] * len(ok) + [1] * len(lines),
            "key": ok + [l[0] for l in lines],
            "a": [orders[k] for k in ok] + [l[2] for l in lines],
            "b": [0] * len(ok) + [l[1] for l in lines],
        }
    )
    s1 = _q5_stage1_group(g1)
    ck2 = s1["ck2"].to_numpy()
    rev = s1["rev"].to_numpy()
    cks = sorted(set(range(7)))
    g2 = pd.DataFrame(
        {
            "side": [0] * len(cks) + [1] * len(ck2),
            "key": cks + list(ck2 // 64),
            "a": [custnat[c] for c in cks] + list(ck2 % 64),
            "b": [0] * len(cks) + list(rev),
        }
    )
    got = (
        _q5_stage2_group(g2)
        .to_pandas()
        .groupby("n_nationkey", as_index=False)["rev"]
        .sum()
        .sort_values("n_nationkey")
        .reset_index(drop=True)
    )
    exp: dict = {}
    for okey, snat, r in lines:
        cust = orders[okey]
        if custnat[cust] == snat:
            exp[snat] = exp.get(snat, 0) + r
    exp_df = pd.DataFrame(
        sorted(exp.items()), columns=["n_nationkey", "rev"]
    )
    if not len(exp_df):
        assert not len(got)
    else:
        pd.testing.assert_frame_equal(got, exp_df, check_dtype=False)


@settings(deadline=None, max_examples=60)
@given(
    parts=st.lists(
        st.tuples(st.integers(0, 10), st.integers(1, 60)), max_size=40
    ),
    thresh=st.integers(1, 200),
)
def test_heavy_group_matches_bruteforce(parts, thresh):
    """Q18's in-bucket HAVING == per-key sums filtered the slow way."""
    import pandas as pd

    from tokenzip.relational import _heavy_group

    g = pd.DataFrame(
        {"k": [p[0] for p in parts], "q": [p[1] for p in parts]}
    )
    got = _heavy_group(thresh)(g).to_pandas().sort_values("k").reset_index(drop=True)
    exp: dict = {}
    for k, q in parts:
        exp[k] = exp.get(k, 0) + q
    exp_df = pd.DataFrame(
        sorted((k, v) for k, v in exp.items() if v > thresh),
        columns=["k", "sum_qty"],
    )
    if not len(exp_df):
        assert not len(got)
    else:
        pd.testing.assert_frame_equal(got, exp_df, check_dtype=False)
