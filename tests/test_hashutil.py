"""Differential tests for the batch MD5 kernel (hashutil) and the
vectorized simhash — native C vs hashlib must be byte-identical (the
split/mixture/bottom-k/simhash oracles pin md5)."""

import hashlib
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from tokenzip.analysis import _SH_BITS, simhash60, simhash60_batch
from tokenzip.hashutil import (
    md5_digests_str,
    md5_hex_str,
    md5_hi60_str,
)


def _strings():
    rng = np.random.default_rng(11)
    out = ["", "a", " ", "doc-00001234", "x" * 55, "y" * 56, "z" * 63,
           "q" * 64, "r" * 65, "s" * 130, "naïve", "日本語テスト", "a b  c"]
    for ln in rng.integers(0, 200, 40):
        out.append(
            "".join(chr(33 + int(c)) for c in rng.integers(0, 90, int(ln)))
        )
    return out


@pytest.mark.parametrize("prefix", [b"", b"mix:", b"smp:"])
def test_md5_matches_hashlib(prefix):
    strs = _strings()
    col = pa.array(strs, pa.string())
    hx = md5_hex_str(col, prefix)
    want_hex = [hashlib.md5(prefix + s.encode()).hexdigest() for s in strs]
    assert list(hx) == want_hex
    hi = md5_hi60_str(col, prefix)
    assert list(hi) == [int(h[:15], 16) for h in want_hex]
    dig = md5_digests_str(col, prefix)
    assert dig.shape == (len(strs), 16)
    assert [bytes(d).hex() for d in dig] == want_hex


def test_md5_sliced_and_large_string():
    strs = _strings()
    sl = pa.array(strs, pa.string()).slice(5, 20)
    assert list(md5_hex_str(sl)) == [
        hashlib.md5(s.encode()).hexdigest() for s in strs[5:25]
    ]
    ls = pa.array(strs, pa.large_string())
    assert list(md5_hex_str(ls)) == [
        hashlib.md5(s.encode()).hexdigest() for s in strs
    ]


def test_md5_int_column_hashes_decimal_text():
    col = pa.array([0, 7, -3, 123456789], pa.int64())
    assert list(md5_hex_str(col)) == [
        hashlib.md5(str(i).encode()).hexdigest() for i in [0, 7, -3, 123456789]
    ]


def test_md5_pure_python_fallback_identical():
    # run the same column through the kill-switch path in a subprocess
    code = (
        "import pyarrow as pa\n"
        "from tokenzip.hashutil import md5_hex_str\n"
        "print(','.join(md5_hex_str(pa.array(['', 'abc', 'x'*70], pa.string()), b'mix:')))\n"
    )
    env = dict(os.environ, TOKENZIP_NO_NATIVE="1")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, check=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    ).stdout.strip()
    want = ",".join(
        hashlib.md5(b"mix:" + s.encode()).hexdigest() for s in ["", "abc", "x" * 70]
    )
    assert out == want


def _simhash_reference(text: str) -> int:
    words = set(text.split(" "))
    hs = np.array(
        [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in words],
        dtype=np.uint64,
    )
    bits = (hs[:, None] >> np.arange(_SH_BITS, dtype=np.uint64)) & np.uint64(1)
    score = bits.sum(axis=0, dtype=np.int64) * 2 - len(hs)
    return int(
        ((score > 0).astype(np.uint64) << np.arange(_SH_BITS, dtype=np.uint64)).sum()
    )


def test_simhash_batch_matches_per_doc_definition():
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(120)] + ["naïve", "日本語", ""]
    texts = ["", " ", "a  b", " lead", "trail ", "one"]
    texts += [
        " ".join(rng.choice(vocab, int(k))) for k in rng.integers(1, 60, 60)
    ]
    got = simhash60_batch(pa.array(texts, pa.string()))
    want = np.array([_simhash_reference(t) for t in texts], dtype=np.uint64)
    assert np.array_equal(got, want)
    # duplicate words must count once (distinct-word semantics)
    assert simhash60("w w w") == simhash60("w")
    assert simhash60_batch(pa.array([], pa.string())).shape == (0,)
