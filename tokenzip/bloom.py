"""Vectorized Bloom-filter kernel (Bloom, CACM 1970) with the standard
double-hashing probe schedule (Kirsch & Mitzenmacher, ESA 2006:
g_i = h1 + i*h2) over splitmix64-mixed int64 keys (Steele et al., OOPSLA
2014 public construction).

Shared by two engine features:
* the broadcast bloom semi-join (tokenzip.bloomjoin), and
* per-chunk doc-id bloom zone filters on the token sink (tokenzip.chunk /
  pipeline.decompress point lookups) — the membership analog of the
  did_min/did_max range zone maps.

Bitsets built at the same m OR-merge cleanly (associative + commutative),
which is what a distributed build fold relies on.
"""

from __future__ import annotations

import numpy as np

BITS_PER_KEY = 16  # ~1.4% fpr at 2 probes
N_PROBES = 2

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over an int64/uint64 array — vectorized,
    modular uint64 arithmetic."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(salt) * _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def _probe_positions(keys: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """The N_PROBES bit positions per key: g_i = h1 + i*h2 (mod m), with m
    a power of two so the mod is a mask."""
    mask = np.uint64(m_bits - 1)
    h1 = _mix64(keys, 1)
    h2 = _mix64(keys, 2) | np.uint64(1)  # odd => full-period stride
    out = []
    with np.errstate(over="ignore"):
        for i in range(N_PROBES):
            out.append((h1 + np.uint64(i) * h2) & mask)
    return out


def bloom_build(keys: np.ndarray, bits_per_key: int = BITS_PER_KEY) -> np.ndarray:
    """uint64[m/64] bitset over the key set. m = next power of two of
    bits_per_key * n (min 1024), so the probe mod is a mask and partial
    bitmaps built with the SAME (n-derived) m OR-merge cleanly."""
    n = max(int(len(keys)), 1)
    m_bits = 1 << max(10, int(n * bits_per_key - 1).bit_length())
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for pos in _probe_positions(np.asarray(keys), m_bits):
        np.bitwise_or.at(
            words,
            (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    return words


def bloom_probe(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """bool[n] membership mask (no false negatives; fpr bounded by
    sizing)."""
    m_bits = len(words) * 64
    keys = np.asarray(keys)
    hit = np.ones(len(keys), dtype=bool)
    for pos in _probe_positions(keys, m_bits):
        w = words[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit
