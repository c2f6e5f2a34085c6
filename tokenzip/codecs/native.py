"""Runtime loader for the C LEB128 kernels (_native.c).

Build-on-first-use with the system compiler into a content-addressed cached
.so (safe under concurrent Ray workers: compile to a pid-suffixed temp file,
atomic os.replace). Falls back silently to the NumPy kernels when no
compiler is available or the build fails — same dispatch philosophy as the
reference's cfg() feature gates (/root/reference/build.rs:57-85).

Set TOKENZIP_NO_NATIVE=1 to force the NumPy path (used by the differential
tests to compare both implementations).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native.c")


def _default_cache_dir() -> str:
    """Per-user, 0700 cache dir (XDG cache if set): a world-writable shared
    /tmp path with a predictable name would let another local user pre-plant
    a .so that we'd CDLL — the cache must be private to this uid."""
    xdg = os.environ.get("XDG_CACHE_HOME")
    base = xdg if xdg else os.path.join("/tmp", f"tokenzip_native_{os.getuid()}")
    return os.path.join(base, "tokenzip_native") if xdg else base


_CACHE_DIR = os.environ.get("TOKENZIP_NATIVE_DIR", _default_cache_dir())

LIB = None
HAVE_NATIVE = False


def _cpu_tag() -> str:
    """ISA/CPU fingerprint folded into the cache key: -march=native output
    is CPU-specific, so a cached .so from different hardware (shared cache
    dir surviving a migration) must not be loaded — it could SIGILL."""
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of the first CPU block; all cores uniform
                if line.startswith(("model name", "flags", "Features")):
                    parts.append(line.strip())
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:8]


def _owned_by_us(path: str) -> bool:
    try:
        st = os.stat(path)
    except OSError:
        return False
    return st.st_uid == os.getuid()


def _build_so() -> str | None:
    try:
        src = open(_SRC, "rb").read()
    except OSError:
        return None
    tag = hashlib.sha1(src).hexdigest()[:16]
    so = os.path.join(_CACHE_DIR, f"tz_{tag}_{_cpu_tag()}.so")
    if os.path.exists(so):
        return so if _owned_by_us(so) else None
    tmp = None
    try:
        os.makedirs(_CACHE_DIR, mode=0o700, exist_ok=True)
        if not _owned_by_us(_CACHE_DIR):
            return None
        os.chmod(_CACHE_DIR, 0o700)
        tmp = f"{so}.tmp.{os.getpid()}"
        subprocess.run(
            ["cc", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)
        return so
    except Exception:
        try:
            if tmp:
                os.unlink(tmp)
        except Exception:
            pass
        return so if os.path.exists(so) and _owned_by_us(so) else None


def _load() -> None:
    global LIB, HAVE_NATIVE
    if os.environ.get("TOKENZIP_NO_NATIVE"):
        return
    so = _build_so()
    if not so or not _owned_by_us(so):
        return
    try:
        lib = ctypes.CDLL(so)
        i64, vp = ctypes.c_int64, ctypes.c_void_p
        lib.tz_enc_u32.restype = i64
        lib.tz_enc_u32.argtypes = [vp, i64, vp]
        lib.tz_enc_u64.restype = i64
        lib.tz_enc_u64.argtypes = [vp, i64, vp]
        lib.tz_size_u32.restype = i64
        lib.tz_size_u32.argtypes = [vp, i64]
        lib.tz_size_u64.restype = i64
        lib.tz_size_u64.argtypes = [vp, i64]
        lib.tz_dec_u32.restype = ctypes.c_int
        lib.tz_dec_u32.argtypes = [vp, i64, i64, vp]
        lib.tz_dec_u64.restype = ctypes.c_int
        lib.tz_dec_u64.argtypes = [vp, i64, i64, vp]
    except Exception:
        return
    LIB = lib
    HAVE_NATIVE = True


_load()

_MAX_BYTES = {np.dtype(np.uint32): 5, np.dtype(np.uint64): 10}


def native_encode(u: np.ndarray) -> bytes | None:
    """Encode a contiguous uint32/uint64 array; None if not applicable."""
    if LIB is None or u.dtype not in _MAX_BYTES or len(u) == 0:
        return None
    out = np.empty(len(u) * _MAX_BYTES[u.dtype], dtype=np.uint8)
    fn = LIB.tz_enc_u32 if u.dtype == np.dtype(np.uint32) else LIB.tz_enc_u64
    nbytes = fn(u.ctypes.data, len(u), out.ctypes.data)
    return out[:nbytes].tobytes()


def native_size(u: np.ndarray) -> int | None:
    """Total LEB128 bytes of a contiguous uint32/uint64 array."""
    if LIB is None or u.dtype not in _MAX_BYTES:
        return None
    fn = LIB.tz_size_u32 if u.dtype == np.dtype(np.uint32) else LIB.tz_size_u64
    return int(fn(u.ctypes.data, len(u)))


def native_decode(b: np.ndarray, n: int, width: int) -> tuple[int, np.ndarray] | None:
    """Decode n varints from a contiguous uint8 buffer; returns (rc, out)
    with rc 0=ok 1=truncated 2=overflow, or None if not applicable."""
    if LIB is None or width not in (32, 64):
        return None
    dt = np.uint32 if width == 32 else np.uint64
    out = np.empty(n, dtype=dt)
    fn = LIB.tz_dec_u32 if width == 32 else LIB.tz_dec_u64
    rc = fn(b.ctypes.data, len(b), n, out.ctypes.data)
    return int(rc), out


def _bind_bits() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, vp, i32 = ct.c_int64, ct.c_void_p, ct.c_int
    LIB.tz_pack_u64.restype = None
    LIB.tz_pack_u64.argtypes = [vp, i64, i32, vp]
    LIB.tz_pack_u32.restype = None
    LIB.tz_pack_u32.argtypes = [vp, i64, i32, vp]
    LIB.tz_unpack_u64.restype = None
    LIB.tz_unpack_u64.argtypes = [vp, i64, i64, i32, vp]


_bind_bits()


def native_pack_bits(values: np.ndarray, width: int) -> bytes | None:
    """Bit-pack a contiguous uint32/uint64 array; None if not applicable."""
    if LIB is None or width <= 0 or len(values) == 0:
        return None
    n = len(values)
    out = np.empty((n * width + 7) // 8, dtype=np.uint8)
    if values.dtype == np.dtype(np.uint32) and width <= 32:
        LIB.tz_pack_u32(values.ctypes.data, n, width, out.ctypes.data)
    elif values.dtype == np.dtype(np.uint64):
        LIB.tz_pack_u64(values.ctypes.data, n, width, out.ctypes.data)
    else:
        return None
    return out.tobytes()


def native_unpack_bits(b: np.ndarray, n: int, width: int) -> np.ndarray | None:
    if LIB is None or width <= 0 or width > 64:
        return None
    out = np.empty(n, dtype=np.uint64)
    LIB.tz_unpack_u64(b.ctypes.data, len(b), n, width, out.ctypes.data)
    return out


def _bind_dec32() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, vp, i32, u64 = ct.c_int64, ct.c_void_p, ct.c_int, ct.c_uint64
    LIB.tz_unpack_add_i32.restype = None
    LIB.tz_unpack_add_i32.argtypes = [vp, i64, i64, i32, u64, vp]
    LIB.tz_dec_delta_i32.restype = ct.c_int
    LIB.tz_dec_delta_i32.argtypes = [vp, i64, i64, vp]
    LIB.tz_hash_codes_i64.restype = i64
    LIB.tz_hash_codes_i64.argtypes = [vp, i64, i64, vp, vp, vp]
    LIB.tz_hash_probe_i64.restype = None
    LIB.tz_hash_probe_i64.argtypes = [vp, i64, i64, vp, vp, ct.c_uint32, vp]


_bind_dec32()


def native_hash_codes_i64(
    vals: np.ndarray, cap_limit: int = 1 << 22
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int] | None:
    """One-pass hash distinct+count over an int64 array: returns
    (keys[cap], counts[cap], codes[n] slot per value, k). None when native
    is unavailable or the distinct count exceeds cap_limit/2 (caller falls
    back to sort-based np.unique — bounding the hash arena keeps per-task
    temporaries small on page-fault-expensive hosts)."""
    if LIB is None or vals.dtype != np.dtype(np.int64):
        return None
    n = len(vals)
    vals_c = np.ascontiguousarray(vals)
    codes = np.empty(n, dtype=np.int32)
    cap = 1 << 16
    while cap <= cap_limit:
        keys = np.empty(cap, dtype=np.int64)
        counts = np.zeros(cap, dtype=np.int64)
        k = int(
            LIB.tz_hash_codes_i64(
                vals_c.ctypes.data, n, cap,
                keys.ctypes.data, counts.ctypes.data, codes.ctypes.data,
            )
        )
        if k >= 0:
            return keys, counts, codes, k
        cap <<= 2
    return None


def native_unpack_add_i32(
    b: np.ndarray, n: int, width: int, ref: int
) -> np.ndarray | None:
    """Fused frame-of-reference decode: unpack width-bit deltas, add ref
    (mod 2^64), truncate to int32 — one memory pass. None if unavailable."""
    if LIB is None or width <= 0 or width > 64:
        return None
    out = np.empty(n, dtype=np.int32)
    b_c = np.ascontiguousarray(b)
    LIB.tz_unpack_add_i32(
        b_c.ctypes.data, len(b_c), n, width,
        ref & 0xFFFFFFFFFFFFFFFF, out.ctypes.data,
    )
    return out


def native_dec_delta_i32(b: np.ndarray, n: int) -> tuple[int, np.ndarray] | None:
    """Fused delta decode: LEB128 + unzigzag64 + prefix sum, truncated to
    int32 — one pass; rc 0 ok 1 truncated 2 overflow. None if unavailable."""
    if LIB is None:
        return None
    out = np.empty(n, dtype=np.int32)
    b_c = np.ascontiguousarray(b)
    rc = LIB.tz_dec_delta_i32(b_c.ctypes.data, len(b_c), n, out.ctypes.data)
    return int(rc), out


def native_hash_probe_i64(
    vals: np.ndarray, keys: np.ndarray, rank_tbl: np.ndarray, miss: int
) -> np.ndarray | None:
    """Probe a prebuilt open-addressing (keys, rank) table for each value;
    misses emit `miss`. Tables come from native_hash_codes_i64 so the probe
    sequence matches the build. None when native is unavailable."""
    if (
        LIB is None
        or vals.dtype != np.dtype(np.int64)
        or keys.dtype != np.dtype(np.int64)
        or rank_tbl.dtype != np.dtype(np.uint32)
        or len(keys) != len(rank_tbl)
    ):
        return None
    out = np.empty(len(vals), dtype=np.uint32)
    vals_c = np.ascontiguousarray(vals)
    keys_c = np.ascontiguousarray(keys)
    rt_c = np.ascontiguousarray(rank_tbl)
    LIB.tz_hash_probe_i64(
        vals_c.ctypes.data, len(vals_c), len(keys_c),
        keys_c.ctypes.data, rt_c.ctypes.data, miss, out.ctypes.data,
    )
    return out


def _bind_zz() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, vp = ct.c_int64, ct.c_void_p
    LIB.tz_enc_zz_i32.restype = i64
    LIB.tz_enc_zz_i32.argtypes = [vp, i64, vp]
    LIB.tz_size_zz_i32.restype = i64
    LIB.tz_size_zz_i32.argtypes = [vp, i64]
    LIB.tz_dec_zz_i32.restype = ctypes.c_int
    LIB.tz_dec_zz_i32.argtypes = [vp, i64, i64, vp]


_bind_zz()


def native_encode_zz32(x: np.ndarray) -> bytes | None:
    """Fused zigzag(32) + LEB128 encode of a contiguous int32 array —
    one memory pass instead of zigzag-materialize + encode."""
    if LIB is None or x.dtype != np.dtype(np.int32) or len(x) == 0:
        return None
    x = np.ascontiguousarray(x)
    out = np.empty(len(x) * 5, dtype=np.uint8)
    nbytes = LIB.tz_enc_zz_i32(x.ctypes.data, len(x), out.ctypes.data)
    return out[:nbytes].tobytes()


def native_size_zz32(x: np.ndarray) -> int | None:
    """Total LEB128 bytes of zigzag(32)-mapped int32 values, fused."""
    if LIB is None or x.dtype != np.dtype(np.int32):
        return None
    x = np.ascontiguousarray(x)  # local ref keeps the buffer alive
    return int(LIB.tz_size_zz_i32(x.ctypes.data, len(x)))


def native_decode_zz32(b: np.ndarray, n: int) -> tuple[int, np.ndarray] | None:
    """Fused LEB128 decode + unzigzag to int32; rc 0 ok 1 truncated
    2 overflow."""
    if LIB is None:
        return None
    b = np.ascontiguousarray(b)
    out = np.empty(n, dtype=np.int32)
    rc = LIB.tz_dec_zz_i32(b.ctypes.data, len(b), n, out.ctypes.data)
    return int(rc), out


def _bind_chk() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, vp, u64 = ct.c_int64, ct.c_void_p, ct.c_uint64
    LIB.tz_doc_chk_i32.restype = None
    LIB.tz_doc_chk_i32.argtypes = [vp, vp, i64, u64, u64, vp, vp]
    LIB.tz_byte_chk.restype = None
    LIB.tz_byte_chk.argtypes = [vp, vp, i64, u64, u64, vp]


_bind_chk()


def native_doc_chk_i32(
    vals: np.ndarray, offs: np.ndarray, mix: int, b: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Per-doc (polynomial checksum over zigzag32 values, int64 token sum)
    in one fused pass; None if not applicable."""
    if (
        LIB is None
        or vals.dtype != np.dtype(np.int32)
        or offs.dtype != np.dtype(np.int64)
    ):
        return None
    n = len(offs) - 1
    out_h = np.empty(n, dtype=np.uint64)
    out_s = np.empty(n, dtype=np.int64)
    # bind to locals: a temporary's buffer can be freed the moment
    # .ctypes.data is taken if no reference outlives the expression
    vals_c = np.ascontiguousarray(vals)
    offs_c = np.ascontiguousarray(offs)
    LIB.tz_doc_chk_i32(
        vals_c.ctypes.data, offs_c.ctypes.data,
        n, mix, b, out_h.ctypes.data, out_s.ctypes.data,
    )
    return out_h, out_s


def native_byte_chk(
    bytes_: np.ndarray, offs: np.ndarray, mix: int, b: int
) -> np.ndarray | None:
    """Per-doc polynomial checksum over raw bytes, one pass."""
    if (
        LIB is None
        or bytes_.dtype != np.dtype(np.uint8)
        or offs.dtype != np.dtype(np.int64)
    ):
        return None
    n = len(offs) - 1
    out_h = np.empty(n, dtype=np.uint64)
    bytes_c = np.ascontiguousarray(bytes_)
    offs_c = np.ascontiguousarray(offs)
    LIB.tz_byte_chk(
        bytes_c.ctypes.data, offs_c.ctypes.data, n, mix, b, out_h.ctypes.data
    )
    return out_h


def _bind_fsst() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, vp = ct.c_int64, ct.c_void_p
    LIB.tz_fsst_enc.restype = i64
    LIB.tz_fsst_enc.argtypes = [vp, i64, vp, vp, ct.c_int32, vp]


_bind_fsst()


def native_fsst_encode(blob: bytes, symbols: list) -> bytes | None:
    """Greedy FSST parse in C — byte-identical to the regex path in
    fsst.py (differential-tested); None if not applicable."""
    if LIB is None or not symbols or len(symbols) > 255:
        return None
    if any(not 1 <= len(s) <= 8 for s in symbols):
        return None
    if len(blob) == 0:
        return b""
    lens = np.array([len(s) for s in symbols], dtype=np.uint8)
    vals = np.array(
        [int.from_bytes(s, "little") for s in symbols], dtype=np.uint64
    )
    inp = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(2 * len(inp), dtype=np.uint8)
    nb = LIB.tz_fsst_enc(
        inp.ctypes.data, len(inp), lens.ctypes.data, vals.ctypes.data,
        len(symbols), out.ctypes.data,
    )
    if nb < 0:
        return None
    return out[:nb].tobytes()


def _bind_svb() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, vp = ct.c_int64, ct.c_void_p
    LIB.tz_svb_enc_u32.restype = i64
    LIB.tz_svb_enc_u32.argtypes = [vp, i64, vp, vp]
    LIB.tz_svb_dec_u32.restype = ct.c_int
    LIB.tz_svb_dec_u32.argtypes = [vp, vp, i64, i64, vp]


_bind_svb()


def native_svb_encode(u: np.ndarray) -> tuple[bytes, bytes] | None:
    """Stream-VByte encode a contiguous uint32 array -> (control, payload)."""
    if LIB is None or u.dtype != np.dtype(np.uint32) or len(u) == 0:
        return None
    n = len(u)
    control = np.zeros((n + 3) // 4, dtype=np.uint8)
    data = np.empty(n * 4, dtype=np.uint8)
    nbytes = LIB.tz_svb_enc_u32(u.ctypes.data, n, control.ctypes.data, data.ctypes.data)
    return control.tobytes(), data[:nbytes].tobytes()


def native_svb_decode(control: np.ndarray, data: np.ndarray, n: int):
    """Returns (rc, uint32 array); rc 1 = payload truncated."""
    if LIB is None:
        return None
    out = np.empty(n, dtype=np.uint32)
    rc = LIB.tz_svb_dec_u32(
        control.ctypes.data, data.ctypes.data, len(data), n, out.ctypes.data
    )
    return int(rc), out


def _bind_huff() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, i32, vp = ct.c_int64, ct.c_int, ct.c_void_p
    LIB.tz_huff_depths.restype = None
    LIB.tz_huff_depths.argtypes = [vp, i64, vp, vp, vp]
    LIB.tz_huff_enc_u32.restype = i64
    LIB.tz_huff_enc_u32.argtypes = [vp, i64, i64, vp, vp, vp]
    LIB.tz_huff_dec_u32.restype = i64
    LIB.tz_huff_dec_u32.argtypes = [
        vp, i64, i64, i32, vp, vp, i32, vp, vp, vp, vp, vp,
    ]


_bind_huff()


def native_huff_depths(w_asc: np.ndarray) -> np.ndarray | None:
    """Two-queue Huffman leaf depths for weights sorted ascending."""
    if LIB is None or w_asc.dtype != np.dtype(np.int64):
        return None
    k = len(w_asc)
    if k < 2:
        return np.zeros(k, dtype=np.int64)
    w_c = np.ascontiguousarray(w_asc)
    depth = np.empty(k, dtype=np.int32)
    scratch_w = np.empty(k - 1, dtype=np.int64)
    scratch_p = np.empty(k - 1, dtype=np.int32)
    LIB.tz_huff_depths(
        w_c.ctypes.data, k, depth.ctypes.data,
        scratch_w.ctypes.data, scratch_p.ctypes.data,
    )
    return depth.astype(np.int64)


def native_huff_encode(
    syms: np.ndarray, codes: np.ndarray, lens: np.ndarray, nbits: int
) -> bytes | None:
    """MSB-first canonical-Huffman encode; nbits = exact total bit count."""
    if (
        LIB is None
        or syms.dtype != np.dtype(np.uint32)
        or codes.dtype != np.dtype(np.uint32)
        or lens.dtype != np.dtype(np.uint8)
    ):
        return None
    out = np.empty((nbits + 7) // 8, dtype=np.uint8)
    nb = LIB.tz_huff_enc_u32(
        np.ascontiguousarray(syms).ctypes.data, len(syms), len(codes),
        np.ascontiguousarray(codes).ctypes.data,
        np.ascontiguousarray(lens).ctypes.data, out.ctypes.data,
    )
    if nb < 0 or nb != len(out):
        return None
    return out.tobytes()


def native_huff_decode(
    b: np.ndarray, n: int, w: int,
    lut_sym: np.ndarray, lut_len: np.ndarray,
    maxlen: int, blc: np.ndarray, first_code: np.ndarray,
    first_sym: np.ndarray, sym_ordered: np.ndarray,
) -> tuple[int, np.ndarray] | None:
    """Canonical-Huffman decode; rc 0 ok, 1 truncated/corrupt."""
    if LIB is None or b.dtype != np.dtype(np.uint8):
        return None
    out = np.empty(n, dtype=np.uint32)
    rc = LIB.tz_huff_dec_u32(
        np.ascontiguousarray(b).ctypes.data, len(b), n, w,
        np.ascontiguousarray(lut_sym, dtype=np.uint32).ctypes.data,
        np.ascontiguousarray(lut_len, dtype=np.uint8).ctypes.data,
        maxlen,
        np.ascontiguousarray(blc, dtype=np.int64).ctypes.data,
        np.ascontiguousarray(first_code, dtype=np.int64).ctypes.data,
        np.ascontiguousarray(first_sym, dtype=np.int64).ctypes.data,
        np.ascontiguousarray(sym_ordered, dtype=np.uint32).ctypes.data,
        out.ctypes.data,
    )
    return int(rc), out


def _bind_md5() -> None:
    if LIB is None:
        return
    import ctypes as ct

    i64, vp = ct.c_int64, ct.c_void_p
    LIB.tz_md5_spans.restype = None
    LIB.tz_md5_spans.argtypes = [vp, i64, vp, vp, vp, i64, vp]


_bind_md5()


def native_md5_spans(
    prefix: bytes, buf: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray | None:
    """Batch MD5 (RFC 1321): digest i = md5(prefix + buf[starts[i]:ends[i]]).
    Returns an (n, 16) uint8 digest matrix, or None when native kernels are
    unavailable (callers fall back to hashlib)."""
    if LIB is None or buf.dtype != np.dtype(np.uint8):
        return None
    n = len(starts)
    out = np.empty((n, 16), dtype=np.uint8)
    pfx = np.frombuffer(prefix, dtype=np.uint8) if prefix else None
    buf_c = np.ascontiguousarray(buf)
    starts_c = np.ascontiguousarray(starts, dtype=np.int64)
    ends_c = np.ascontiguousarray(ends, dtype=np.int64)
    LIB.tz_md5_spans(
        pfx.ctypes.data if pfx is not None else None,
        len(prefix),
        buf_c.ctypes.data,
        starts_c.ctypes.data,
        ends_c.ctypes.data,
        n,
        out.ctypes.data,
    )
    return out
