"""FSST-style string compression: a <=255-entry symbol table of 1..8-byte
substrings, greedy longest-match encoding with an escape byte.

Follows the published FSST design (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020; cited via the north rule's codec
list): codes 0..n-1 name symbols, 0xFF is the escape prefix for a literal
byte. The symbol table is the engine's stateful-symbol-table example — it
can be trained per chunk (self-contained blobs) or trained once per source
group and broadcast to the encoder actor pool (see stages/pipeline).

Boundary handling: the whole concatenated column is encoded in one pass and
original per-string byte lengths are stored as a separate varint stream —
decode is boundary-agnostic, so symbols may span adjacent strings (better
ratio, simpler kernels). This is the stream-split layout again
(/root/reference/README.md:154): lengths out-of-band, payload separate.
"""

from __future__ import annotations

import os
import re

import numpy as np

from tokenzip.errors import ChunkFormatError

ESCAPE = 0xFF
MAX_SYMBOLS = 255  # code 255 reserved for escape
MAX_SYMBOL_LEN = 8
TRAIN_SAMPLE = 1 << 16


def _ngram_counts(sample: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(distinct n-grams packed into uint64, counts) over a byte array."""
    if len(sample) < n:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(sample, n).astype(np.uint64)
    packed = np.zeros(len(win), dtype=np.uint64)
    for j in range(n):
        packed |= win[:, j] << np.uint64(8 * j)
    uniq, counts = np.unique(packed, return_counts=True)
    return uniq, counts


def _unpack_ngram(packed: int, n: int) -> bytes:
    return bytes((packed >> (8 * j)) & 0xFF for j in range(n))


def train_symbol_table(blob: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Greedy gain-ranked symbol selection from a sample of the column bytes.
    Gain of an n-gram = count * (n - 1) for n >= 2 (bytes saved per use),
    count * 1 for single bytes (escape avoidance). One usage-refinement round
    drops symbols the greedy parse never actually uses."""
    sample = np.frombuffer(blob[:TRAIN_SAMPLE], dtype=np.uint8)
    if len(sample) == 0:
        return []
    cands: list[tuple[int, bytes]] = []
    for n in (8, 6, 4, 3, 2):
        uniq, counts = _ngram_counts(sample, n)
        keep = counts >= max(2, len(sample) // 8192)
        for p, c in zip(uniq[keep], counts[keep]):
            cands.append((int(c) * (n - 1), _unpack_ngram(int(p), n)))
    singles = np.bincount(sample, minlength=256)
    for b in np.flatnonzero(singles):
        cands.append((int(singles[b]), bytes([b])))
    cands.sort(key=lambda t: (-t[0], t[1]))
    symbols = [s for _, s in cands[: max_symbols * 2]]
    # refinement: parse the sample with the big table, keep used symbols
    pat = _pattern(symbols)
    used: dict[bytes, int] = {}
    for m in pat.finditer(blob[:TRAIN_SAMPLE]):
        used[m.group(0)] = used.get(m.group(0), 0) + 1
    ranked = sorted(used.items(), key=lambda kv: (-(kv[1] * max(1, len(kv[0]) - 1)), kv[0]))
    table = [s for s, _ in ranked[:max_symbols]]
    # always cover frequent single bytes so escapes stay rare
    for b in np.argsort(singles)[::-1]:
        if len(table) >= max_symbols:
            break
        sb = bytes([int(b)])
        if singles[b] and sb not in table:
            table.append(sb)
    return table


_PATTERN_CACHE: dict[tuple, re.Pattern] = {}


def _pattern(symbols: list[bytes]) -> re.Pattern:
    """Compiled greedy-longest-match pattern, memoized per symbol table —
    shared-table encoders hit the same table for every chunk. The cache key
    is the symbol TUPLE (unambiguous even when symbols contain 0x00 — FSST
    symbols are any-bytes, so a joined-bytes key could collide)."""
    ordered = sorted(symbols, key=len, reverse=True)
    key = tuple(ordered)
    pat = _PATTERN_CACHE.get(key)
    if pat is None:
        if len(_PATTERN_CACHE) > 64:
            _PATTERN_CACHE.clear()
        pat = _PATTERN_CACHE[key] = re.compile(
            b"|".join(map(re.escape, ordered)) or b"(?!)"
        )
    return pat


def pack_table(symbols: list[bytes]) -> bytes:
    out = bytearray([len(symbols)])
    for s in symbols:
        out.append(len(s))
        out += s
    return bytes(out)


def unpack_table(blob) -> list[bytes]:
    # blob may be a zero-copy memoryview off a pyarrow Buffer, whose
    # element format is SIGNED char — indexing it returns negative ints
    # for lengths >= 128 (a 147-symbol table read as n = -109 silently
    # unpacked to an EMPTY table). Normalize to bytes: tables are <= ~2 KB,
    # the copy is noise next to the decode it guards.
    if not isinstance(blob, bytes):
        blob = bytes(blob)
    n, off, out = blob[0], 1, []
    for _ in range(n):
        ln = blob[off]
        out.append(blob[off + 1 : off + 1 + ln])
        off += 1 + ln
    return out


def fsst_encode(blob: bytes, symbols: list[bytes]) -> bytes:
    """Greedy longest-match parse -> code stream (symbol index, or
    ESCAPE + literal byte for uncovered bytes). Dispatches to the C kernel
    (byte-identical, differential-tested); the regex path below is the
    reference semantics and the no-compiler fallback."""
    if not symbols:
        # all-escape stream, vectorized (0xFF interleaved with literals)
        b = np.frombuffer(blob, dtype=np.uint8)
        out = np.empty(2 * len(b), dtype=np.uint8)
        out[0::2] = ESCAPE
        out[1::2] = b
        return out.tobytes()
    from tokenzip.codecs.native import native_fsst_encode

    if not os.environ.get("TOKENZIP_NO_NATIVE"):
        r = native_fsst_encode(blob, symbols)
        if r is not None:
            return r
    code = {s: i for i, s in enumerate(symbols)}
    pat = _pattern(symbols)
    out = bytearray()
    pos = 0
    for m in pat.finditer(blob):
        for b in blob[pos : m.start()]:
            out += bytes((ESCAPE, b))
        out.append(code[m.group(0)])
        pos = m.end()
    for b in blob[pos:]:
        out += bytes((ESCAPE, b))
    return bytes(out)


def fsst_decode(codes: bytes, symbols: list[bytes]) -> bytes:
    """Vectorized decode: gather symbol bytes per code; the (rare) escape
    positions are resolved with a loop over escapes only."""
    b = np.frombuffer(codes, dtype=np.uint8)
    n = len(b)
    if n == 0:
        return b""
    is_esc = b == ESCAPE
    # resolve escape chains VECTORIZED by run parity: within a maximal run
    # of consecutive ESCAPE bytes, even offsets are active escapes and odd
    # offsets are escaped literal 0xFF bytes; an odd-length run additionally
    # escapes the first byte AFTER the run (and an odd run at end-of-stream
    # is malformed). No per-escape Python loop — dense-escape (high-entropy)
    # streams decode at full vector speed.
    esc_idx = np.flatnonzero(is_esc)
    literal = np.zeros(n, dtype=bool)
    esc_active = np.zeros(n, dtype=bool)
    if len(esc_idx):
        starts_mask = np.ones(len(esc_idx), dtype=bool)
        starts_mask[1:] = np.diff(esc_idx) > 1
        run_id = np.cumsum(starts_mask) - 1
        run_start = esc_idx[starts_mask]
        off = esc_idx - run_start[run_id]
        even = (off & 1) == 0
        esc_active[esc_idx[even]] = True
        literal[esc_idx[~even]] = True
        run_lens = np.bincount(run_id)
        after = run_start + run_lens
        odd_after = after[(run_lens & 1) == 1]
        if len(odd_after) and odd_after[-1] == n:
            raise ChunkFormatError("fsst: escape at end of stream")
        literal[odd_after] = True
    sym_pos = ~(esc_active | literal)
    sym_codes = b[sym_pos]
    if len(sym_codes) and (not symbols or sym_codes.max() >= len(symbols)):
        raise ChunkFormatError("fsst: code out of table range")
    # output length per stream position
    lens = np.zeros(n, dtype=np.int64)
    sym_lens = np.array([len(s) for s in symbols] or [0], dtype=np.int64)
    lens[sym_pos] = sym_lens[sym_codes] if len(symbols) else 0
    lens[literal] = 1
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint8)
    # scatter literals
    out[offsets[:-1][literal]] = b[literal]
    # scatter symbols via padded matrix gather
    if len(symbols):
        mat = np.zeros((len(symbols), MAX_SYMBOL_LEN), dtype=np.uint8)
        for i, s in enumerate(symbols):
            mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        starts = offsets[:-1][sym_pos]
        L = sym_lens[sym_codes]
        idx = starts[:, None] + np.arange(MAX_SYMBOL_LEN)
        keep = np.arange(MAX_SYMBOL_LEN) < L[:, None]
        out[idx[keep]] = mat[sym_codes][keep]
    return out.tobytes()
