"""Sampling-based per-column codec auto-selection.

For each column chunk: compute the *exact* encoded payload size every codec
would produce (cheap closed-form size formulas — no trial encoding needed for
most codecs), on a deterministic sample for large chunks, then pick the
minimum. Plain LEB128 is always a candidate, so the chosen size can never
estimate above the reference rustc-LEB128 bound; after real encoding the
caller additionally verifies the packed blob against the bound and falls back
to LEB128 if a sampling miss picked a loser (guaranteeing the north rule's
<= -reference-size invariant by construction).

Determinism: the sample is a pure function of the chunk contents (fixed
stride positions), never RNG state — so Ray task retries re-encode
bit-identically (SURVEY.md §4.2 retry-safety requirement).

Size-formula sources: LEB128 size = rustc oracle
(/root/reference/benches/varint_bench/leb128.rs:4-24); width-specialized
packing mirrors the reference's per-width kernel choice
(/root/reference/src/num.rs:50 MAX_VARINT_BYTES per type; README.md:57-59
"type parameter greatly affects performance").
"""

from __future__ import annotations

import numpy as np

from tokenzip.codecs.bitpack import bit_width
from tokenzip.codecs.core import _runs, _zz
from tokenzip.codecs.varint import leb128_size, zigzag_encode

DEFAULT_SAMPLE = 65_536

# Candidate order is the tie-break preference (decode speed at equal size).
INT_CANDIDATES = (
    "rle", "dict", "for", "pfor", "bitpack", "svb", "delta", "dod", "rankdict",
    "leb128"
)


def estimate_int_sizes(
    values: np.ndarray,
    width: int = 32,
    candidates: tuple[str, ...] = INT_CANDIDATES,
    sample: int = DEFAULT_SAMPLE,
) -> dict[str, float]:
    """Exact-per-sample payload byte sizes for each candidate codec.

    For chunks larger than ``sample`` the sizes are computed on a contiguous
    head slice plus a strided body sample and scaled — contiguous slices keep
    run-length and sortedness structure visible to the RLE/delta estimators.
    """
    n = len(values)
    if n == 0:
        return {c: 0.0 for c in candidates}
    # sample FIRST, then widen: the full-array int64 copy would cost more
    # memory traffic than the whole estimation pass
    if n > sample:
        half = sample // 2
        stride = max(1, (n - half) // half)
        s = np.concatenate([values[:half], values[half::stride][:half]])
        scale = n / len(s)
    else:
        s = values
        scale = 1.0
    s = np.ascontiguousarray(s, dtype=np.int64)
    m = len(s)
    vmin, vmax = int(s.min()), int(s.max())
    fits32 = -(2**31) <= vmin and vmax < 2**31
    zz = _zz(s, width) if width <= 32 else zigzag_encode(s, 64).astype(np.uint64)

    sizes: dict[str, float] = {}
    uc = None  # (uniq, counts) shared between the dict/rankdict estimates

    def _uniq_counts():
        nonlocal uc
        if uc is None:
            from tokenzip.codecs.core import _unique_inverse_counts

            uniq, _, counts = _unique_inverse_counts(s)
            uc = (uniq, counts)
        return uc

    for c in candidates:
        if c == "leb128":
            sizes[c] = float(leb128_size(zz).sum()) * scale
        elif c == "svb":
            if not fits32 or width > 32:
                continue
            u = zigzag_encode(s.astype(np.int32), 32).astype(np.uint32)
            nb = np.ones(m, dtype=np.int64)
            for t in (8, 16, 24):
                nb += (u >= np.uint32(1 << t)).astype(np.int64)
            sizes[c] = (float(nb.sum()) + m / 4.0) * scale
        elif c == "bitpack":
            sizes[c] = (m * bit_width(int(zz.max())) / 8.0) * scale
        elif c == "for":
            sizes[c] = (m * bit_width(vmax - vmin) / 8.0) * scale
        elif c == "pfor":
            # replicate the encoder's deterministic width plan on the
            # sample, then price that plan exactly (body + exception
            # values + exact position-gap bytes)
            from tokenzip.codecs.core import _mod_sub, _pfor_plan

            deltas = _mod_sub(s, vmin)
            b, bits = _pfor_plan(deltas)
            mask = bits > b
            exc_bytes = 0.0
            if mask.any():
                pos = np.flatnonzero(mask).astype(np.uint64)
                gaps = np.diff(pos, prepend=np.uint64(0))
                exc_bytes = float(leb128_size(gaps).sum()) + float(
                    leb128_size(deltas[mask]).sum()
                )
            sizes[c] = ((m * b + 7) // 8 + exc_bytes) * scale
        elif c == "rle":
            run_vals, run_lens = _runs(s)
            rv_zz = zigzag_encode(run_vals, 64).astype(np.uint64)
            sizes[c] = (
                float(leb128_size(rv_zz).sum())
                + float(leb128_size(run_lens.astype(np.uint64)).sum())
            ) * scale
        elif c == "dict":
            uniq, _ = _uniq_counts()
            k = len(uniq)
            # sampled distinct-count underestimates the true cardinality;
            # inflate the code width by one bit as a safety margin
            cb = bit_width(k - 1) + (1 if n > m else 0) if k > 1 else 0
            dict_bytes = float(leb128_size(_zz(uniq, 64)).sum())  # upper bound on delta dict
            # cardinality-growth correction: when the sample has NOT
            # saturated the vocabulary (distincts are a large fraction of
            # the sample), true cardinality grows ~linearly with n — an
            # unscaled dictionary-stream estimate under-prices dict by
            # ~scale x on hashed/high-cardinality streams and mis-routes
            # chunks away from bitpack/leb128 (measured 151 KB on one
            # sf0.01 synth group)
            growth = scale if k > m // 2 else 1.0
            sizes[c] = m * cb / 8.0 * scale + dict_bytes * growth
        elif c == "rankdict":
            uniq, counts = _uniq_counts()
            k = len(uniq)
            # rank payload: counts sorted desc; the encoder picks canonical
            # Huffman vs LEB128 for the rank stream per chunk
            # (core._enc_rankdict), so the estimate must price BOTH and take
            # the min — a LEB128-only estimate never routes sub-byte-entropy
            # chunks (web: 6.5 bits/token) to rankdict even though the
            # Huffman rank stream beats plain LEB128 (measured 372 KB left
            # on the table at sf0.01)
            cs = np.sort(counts)[::-1]
            csf = cs.astype(np.float64)
            rb = leb128_size(np.arange(k, dtype=np.uint64)).astype(np.float64)
            # scale each candidate's PAYLOAD only; the Huffman header
            # (4 B/length-histogram entry + ~12 B JSON overhead) is a
            # per-chunk constant — folding it in before * scale extrapolates
            # the header by the sample ratio and overprices rankdict on
            # large chunks
            rank_payload = float(csf @ rb) * scale
            if k >= 2:
                from tokenzip.codecs.huffman import huff_lengths

                lens = huff_lengths(cs)
                h_est = (
                    float(csf @ lens.astype(np.float64)) / 8.0 * scale
                    + 4.0 * float(lens.max())
                    + 12.0
                )
                rank_payload = min(rank_payload, h_est)
            dict_bytes = float(leb128_size(_zz(uniq, 64)).sum())
            cb = bit_width(k - 1) + (1 if n > m else 0) if k > 1 else 0
            growth = scale if k > m // 2 else 1.0
            sizes[c] = rank_payload + (dict_bytes + k * cb / 8.0) * growth
        elif c == "delta":
            d = np.empty(m, dtype=np.int64)
            d[0] = s[0]
            with np.errstate(over="ignore"):
                d[1:] = np.diff(s)
            sizes[c] = float(leb128_size(zigzag_encode(d, 64).astype(np.uint64)).sum()) * scale
        elif c == "dod":
            dd = np.empty(m, dtype=np.int64)
            dd[0] = s[0]
            if m > 1:
                with np.errstate(over="ignore"):
                    d1 = np.diff(s)
                    dd[1] = d1[0]
                    dd[2:] = np.diff(d1)
            sizes[c] = float(
                leb128_size(zigzag_encode(dd, 64).astype(np.uint64)).sum()
            ) * scale
    return sizes


def choose_int_codec(
    values: np.ndarray,
    width: int = 32,
    candidates: tuple[str, ...] = INT_CANDIDATES,
    sample: int = DEFAULT_SAMPLE,
) -> str:
    """Pick the minimum-estimated-size codec (first-listed wins ties)."""
    sizes = estimate_int_sizes(values, width, candidates, sample)
    if not sizes:
        return "leb128"
    best = min(sizes.values())
    for c in candidates:
        if c in sizes and sizes[c] <= best:
            return c
    return "leb128"
