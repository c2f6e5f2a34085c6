"""Canonical boundary-value corpus (FIXTURES.md F2): the reference's NUMS
fixture sets (/root/reference/src/lib.rs:297-353 — {2^7k - 1, 2^7k, 300,
MAX} per width) re-expressed for the engine's signed widths. Every 7-bit
LEB128 group boundary is probed from both sides in both the raw domain
(±2^7k) and the zigzag domain (±2^(7k-1), where zigzag crosses a byte
boundary), plus 0/±1/±300 and the width extremes.

The list is THE shared constant between the engine query (which really
encodes and decodes it through every codec) and the SQL oracle (which sums
the literals directly) — the same role the prost-borrowed vectors play in
the reference's tests (/root/reference/src/lib.rs:87).
"""

from __future__ import annotations

WIDTHS = (8, 16, 32, 64)


def boundary_values(width: int) -> list[int]:
    lo, hi = -(1 << (width - 1)), (1 << (width - 1)) - 1
    vals = {0, 1, -1, lo, hi, lo + 1, hi - 1}
    vals |= {v for v in (300, -300) if lo <= v <= hi}
    for k in range(1, 11):
        for base in (1 << (7 * k), 1 << (7 * k - 1)):
            for b in (base - 1, base, base + 1):
                for s in (b, -b):
                    if lo <= s <= hi:
                        vals.add(s)
    return sorted(vals)
