/* Scalar C LEB128 kernels behind the same registry entries as the NumPy
 * implementations — the engine analog of the reference's build-time CPU
 * dispatch (/root/reference/build.rs:57-85): one semantic contract, multiple
 * implementations, selected at runtime.
 *
 * Semantics are byte-identical to tokenzip/codecs/varint.py (and therefore
 * to the reference encoder /root/reference/src/encode/mod.rs:23-25 and the
 * rustc-serialize scalar codec /root/reference/benches/varint_bench/
 * leb128.rs:4-53): 7 data bits/byte little-endian, MSB continuation,
 * overflow via max-length + last-byte bound
 * (/root/reference/src/decode/mod.rs:42-48), truncation when the buffer
 * ends mid-varint. Return codes: 0 ok, 1 truncated, 2 overflow.
 */

#include <stdint.h>
#include <string.h>

int64_t tz_enc_u32(const uint32_t *in, int64_t n, uint8_t *out) {
    uint8_t *p = out;
    for (int64_t i = 0; i < n; i++) {
        uint32_t v = in[i];
        while (v >= 0x80u) {
            *p++ = (uint8_t)(v | 0x80u);
            v >>= 7;
        }
        *p++ = (uint8_t)v;
    }
    return (int64_t)(p - out);
}

int64_t tz_enc_u64(const uint64_t *in, int64_t n, uint8_t *out) {
    uint8_t *p = out;
    for (int64_t i = 0; i < n; i++) {
        uint64_t v = in[i];
        while (v >= 0x80u) {
            *p++ = (uint8_t)(v | 0x80u);
            v >>= 7;
        }
        *p++ = (uint8_t)v;
    }
    return (int64_t)(p - out);
}

/* total encoded bytes without materializing them (the rustc-LEB128 size
 * oracle, /root/reference/benches/varint_bench/leb128.rs:4-24) */
int64_t tz_size_u32(const uint32_t *in, int64_t n) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) {
        uint32_t v = in[i];
        total += 1 + (v >= (1u << 7)) + (v >= (1u << 14)) + (v >= (1u << 21)) +
                 (v >= (1u << 28));
    }
    return total;
}

int64_t tz_size_u64(const uint64_t *in, int64_t n) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) {
        uint64_t v = in[i];
        int64_t b = 1;
        while (v >= 0x80u) {
            v >>= 7;
            b++;
        }
        total += b;
    }
    return total;
}

int tz_dec_u32(const uint8_t *in, int64_t nbytes, int64_t n, uint32_t *out) {
    const uint8_t *p = in;
    const uint8_t *end = in + nbytes;
    for (int64_t i = 0; i < n; i++) {
        uint32_t v = 0;
        int shift = 0, k = 0;
        for (;;) {
            if (p >= end) return 1;
            uint8_t b = *p++;
            k++;
            if (k > 5) return 2;
            v |= (uint32_t)(b & 0x7Fu) << shift;
            if (b < 0x80u) {
                if (k == 5 && b > 0x0Fu) return 2;
                break;
            }
            shift += 7;
        }
        out[i] = v;
    }
    return 0;
}

int tz_dec_u64(const uint8_t *in, int64_t nbytes, int64_t n, uint64_t *out) {
    const uint8_t *p = in;
    const uint8_t *end = in + nbytes;
    for (int64_t i = 0; i < n; i++) {
        uint64_t v = 0;
        int shift = 0, k = 0;
        for (;;) {
            if (p >= end) return 1;
            uint8_t b = *p++;
            k++;
            if (k > 10) return 2;
            v |= (uint64_t)(b & 0x7Fu) << shift;
            if (b < 0x80u) {
                if (k == 10 && b > 0x01u) return 2;
                break;
            }
            shift += 7;
        }
        out[i] = v;
    }
    return 0;
}

/* Fixed-width bit packing, little-endian bit order — byte-identical to the
 * NumPy unpackbits/packbits layout in bitpack.py (value i's bit j is global
 * bit i*width + j, bytes filled LSB-first). */

void tz_pack_u64(const uint64_t *in, int64_t n, int width, uint8_t *out) {
    unsigned __int128 acc = 0;
    int nbits = 0;
    uint64_t mask = (width >= 64) ? ~0ULL : ((1ULL << width) - 1);
    uint8_t *p = out;
    for (int64_t i = 0; i < n; i++) {
        acc |= (unsigned __int128)(in[i] & mask) << nbits;
        nbits += width;
        while (nbits >= 8) {
            *p++ = (uint8_t)acc;
            acc >>= 8;
            nbits -= 8;
        }
    }
    if (nbits > 0) *p++ = (uint8_t)acc;
}

void tz_pack_u32(const uint32_t *in, int64_t n, int width, uint8_t *out) {
    unsigned __int128 acc = 0;
    int nbits = 0;
    uint64_t mask = (width >= 32) ? 0xFFFFFFFFULL : ((1ULL << width) - 1);
    uint8_t *p = out;
    for (int64_t i = 0; i < n; i++) {
        acc |= (unsigned __int128)((uint64_t)in[i] & mask) << nbits;
        nbits += width;
        while (nbits >= 8) {
            *p++ = (uint8_t)acc;
            acc >>= 8;
            nbits -= 8;
        }
    }
    if (nbits > 0) *p++ = (uint8_t)acc;
}

void tz_unpack_u64(const uint8_t *in, int64_t nbytes, int64_t n, int width,
                   uint64_t *out) {
    uint64_t mask = (width >= 64) ? ~0ULL : ((1ULL << width) - 1);
    int64_t i = 0;
    if (width <= 57) {
        /* fast path: each value's bits fit one unaligned 64-bit window.
         * Stop before any 8-byte load could cross the buffer end. */
        for (; i < n; i++) {
            int64_t bit = i * (int64_t)width;
            int64_t byte = bit >> 3;
            if (byte + 8 > nbytes) break;
            uint64_t w;
            __builtin_memcpy(&w, in + byte, 8);
            out[i] = (w >> (bit & 7)) & mask;
        }
    }
    /* tail (and width > 57): byte-at-a-time accumulate, never reads past
     * the end of the buffer */
    unsigned __int128 acc = 0;
    int nbits = 0;
    int64_t bit0 = i * (int64_t)width;
    const uint8_t *p = in + (bit0 >> 3);
    const uint8_t *end = in + nbytes;
    int skip = (int)(bit0 & 7);
    if (i < n && p < end) {
        acc = *p++ >> skip;
        nbits = 8 - skip;
    }
    for (; i < n; i++) {
        while (nbits < width && p < end) {
            acc |= (unsigned __int128)(*p++) << nbits;
            nbits += 8;
        }
        out[i] = (uint64_t)acc & mask;
        acc >>= width;
        nbits -= width;
    }
}

/* Stream VByte (stream-split varint): 2-bit length codes packed 4 per
 * control byte LSB-first, full little-endian value bytes in a separate
 * payload stream — byte-identical to the NumPy layout in core.py. */

int64_t tz_svb_enc_u32(const uint32_t *in, int64_t n, uint8_t *control,
                       uint8_t *data) {
    uint8_t *d = data;
    for (int64_t i = 0; i < n; i += 4) {
        uint8_t ctrl = 0;
        int64_t m = (n - i < 4) ? (n - i) : 4;
        for (int64_t j = 0; j < m; j++) {
            uint32_t v = in[i + j];
            int nb = 1 + (v >= (1u << 8)) + (v >= (1u << 16)) + (v >= (1u << 24));
            ctrl |= (uint8_t)(nb - 1) << (2 * j);
            for (int b = 0; b < nb; b++) {
                *d++ = (uint8_t)(v & 0xFFu);
                v >>= 8;
            }
        }
        control[i >> 2] = ctrl;
    }
    return (int64_t)(d - data);
}

/* returns 0 ok, 1 = payload truncated */
int tz_svb_dec_u32(const uint8_t *control, const uint8_t *data,
                   int64_t data_len, int64_t n, uint32_t *out) {
    const uint8_t *d = data;
    const uint8_t *end = data + data_len;
    for (int64_t i = 0; i < n; i++) {
        int nb = ((control[i >> 2] >> (2 * (i & 3))) & 3) + 1;
        if (d + nb > end) return 1;
        uint32_t v = 0;
        for (int b = 0; b < nb; b++) v |= (uint32_t)(*d++) << (8 * b);
        out[i] = v;
    }
    return 0;
}

/* FSST greedy longest-match encode (fsst.py:fsst_encode semantics,
 * byte-identical): at each position match the longest table symbol
 * (tie impossible: equal-length symbols are distinct byte strings);
 * unmatched bytes become ESCAPE(0xFF)+literal. Symbols are passed as
 * (len, little-endian packed value) pairs; lookup is an open-addressed
 * hash of (value, len) built per call (<=255 entries, negligible).
 * Duplicate symbols keep the LAST code, matching the Python dict. */
#define TZ_FSST_SLOTS 2048
int64_t tz_fsst_enc(const uint8_t *blob, int64_t n, const uint8_t *sym_lens,
                    const uint64_t *sym_vals, int32_t n_sym, uint8_t *out) {
    uint64_t kv[TZ_FSST_SLOTS];
    uint8_t kl[TZ_FSST_SLOTS];
    uint8_t kc[TZ_FSST_SLOTS];
    for (int i = 0; i < TZ_FSST_SLOTS; i++) kl[i] = 0;
    int max_len = 0;
    uint32_t len_mask = 0;
    for (int32_t i = 0; i < n_sym; i++) {
        uint64_t v = sym_vals[i];
        int L = sym_lens[i];
        if (L < 1 || L > 8) return -1;
        if (L > max_len) max_len = L;
        len_mask |= 1u << L;
        uint64_t h = ((v * 0x9E3779B97F4A7C15ULL) ^ ((uint64_t)L * 0xFF51AFD7ED558CCDULL))
                     >> 32;
        uint64_t s = h & (TZ_FSST_SLOTS - 1);
        while (kl[s] && !(kl[s] == L && kv[s] == v)) s = (s + 1) & (TZ_FSST_SLOTS - 1);
        kv[s] = v;
        kl[s] = (uint8_t)L;
        kc[s] = (uint8_t)i;
    }
    int64_t o = 0;
    for (int64_t pos = 0; pos < n;) {
        int64_t rem = n - pos;
        uint64_t v8 = 0;
        if (rem >= 8) memcpy(&v8, blob + pos, 8);
        else memcpy(&v8, blob + pos, (size_t)rem);
        int Lmax = rem < max_len ? (int)rem : max_len;
        int matched = 0;
        for (int L = Lmax; L >= 1; L--) {
            if (!((len_mask >> L) & 1u)) continue;
            uint64_t v = (L == 8) ? v8 : (v8 & ((1ULL << (8 * L)) - 1));
            uint64_t h = ((v * 0x9E3779B97F4A7C15ULL)
                          ^ ((uint64_t)L * 0xFF51AFD7ED558CCDULL)) >> 32;
            uint64_t s = h & (TZ_FSST_SLOTS - 1);
            while (kl[s]) {
                if (kl[s] == L && kv[s] == v) {
                    out[o++] = kc[s];
                    pos += L;
                    matched = 1;
                    break;
                }
                s = (s + 1) & (TZ_FSST_SLOTS - 1);
            }
            if (matched) break;
        }
        if (!matched) {
            out[o++] = 0xFF;
            out[o++] = blob[pos++];
        }
    }
    return o;
}

/* ZigZag-fused int32 kernels: one pass over the signed token array instead
 * of zigzag-materialize + encode/size/decode passes (the 8->32 single-box
 * ceiling is memory traffic; halving passes raises it). Byte-identical to
 * zigzag_encode(x,32) piped through the u32 kernels above. */
int64_t tz_enc_zz_i32(const int32_t *in, int64_t n, uint8_t *out) {
    uint8_t *p = out;
    for (int64_t i = 0; i < n; i++) {
        uint32_t v = ((uint32_t)in[i] << 1) ^ (uint32_t)(in[i] >> 31);
        while (v >= 0x80u) {
            *p++ = (uint8_t)(v | 0x80u);
            v >>= 7;
        }
        *p++ = (uint8_t)v;
    }
    return (int64_t)(p - out);
}

int64_t tz_size_zz_i32(const int32_t *in, int64_t n) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) {
        uint32_t v = ((uint32_t)in[i] << 1) ^ (uint32_t)(in[i] >> 31);
        total += 1 + (v >= (1u << 7)) + (v >= (1u << 14)) + (v >= (1u << 21)) +
                 (v >= (1u << 28));
    }
    return total;
}

/* decode + unzigzag to int32 in one pass; rc 0 ok, 1 truncated, 2 overflow */
int tz_dec_zz_i32(const uint8_t *in, int64_t nbytes, int64_t n, int32_t *out) {
    const uint8_t *p = in;
    const uint8_t *end = in + nbytes;
    for (int64_t i = 0; i < n; i++) {
        uint32_t v = 0;
        int shift = 0, k = 0;
        for (;;) {
            if (p >= end) return 1;
            uint8_t b = *p++;
            k++;
            if (k > 5) return 2;
            v |= (uint32_t)(b & 0x7Fu) << shift;
            if (b < 0x80u) {
                if (k == 5 && b > 0x0Fu) return 2;
                break;
            }
            shift += 7;
        }
        out[i] = (int32_t)(v >> 1) ^ -(int32_t)(v & 1u);
    }
    return 0;
}

/* Hash-based distinct+count+code pass for int64 values — the wide-range
 * complement of the dense bincount path in core._unique_inverse_counts
 * (token streams hashed across the full int32 range defeat bincount; the
 * sort-based np.unique fallback costs an argsort over n). Open addressing,
 * linear probing, power-of-2 cap. counts must arrive zeroed; codes[i]
 * receives the slot index of vals[i]. Returns the distinct count k, or -1
 * when occupancy would exceed cap/2 (caller doubles cap and retries). */
int64_t tz_hash_codes_i64(const int64_t *vals, int64_t n, int64_t cap,
                          int64_t *keys, int64_t *counts, int32_t *codes) {
    uint64_t mask = (uint64_t)cap - 1;
    int64_t k = 0, limit = cap >> 1;
    for (int64_t i = 0; i < n; i++) {
        uint64_t x = (uint64_t)vals[i]; /* splitmix64 finalizer */
        x ^= x >> 30;
        x *= 0xBF58476D1CE4E5B9ULL;
        x ^= x >> 27;
        x *= 0x94D049BB133111EBULL;
        x ^= x >> 31;
        uint64_t s = x & mask;
        for (;;) {
            if (counts[s] == 0) {
                if (k >= limit) return -1;
                keys[s] = vals[i];
                counts[s] = 1;
                codes[i] = (int32_t)s;
                k++;
                break;
            }
            if (keys[s] == vals[i]) {
                counts[s]++;
                codes[i] = (int32_t)s;
                break;
            }
            s = (s + 1) & mask;
        }
    }
    return k;
}

/* Read-only hash probe: map int64 values to uint32 ranks through a
 * prebuilt open-addressing table (same splitmix64 probe sequence as
 * tz_hash_codes_i64; 0xFFFFFFFF marks an empty slot). Misses emit `miss`
 * (the escape rank). One pass; the shared-rank-table encode path. */
void tz_hash_probe_i64(const int64_t *vals, int64_t n, int64_t cap,
                       const int64_t *keys, const uint32_t *rank_tbl,
                       uint32_t miss, uint32_t *out) {
    uint64_t mask = (uint64_t)cap - 1;
    for (int64_t i = 0; i < n; i++) {
        uint64_t x = (uint64_t)vals[i];
        x ^= x >> 30;
        x *= 0xBF58476D1CE4E5B9ULL;
        x ^= x >> 27;
        x *= 0x94D049BB133111EBULL;
        x ^= x >> 31;
        uint64_t s = x & mask;
        uint32_t r = miss;
        for (;;) {
            uint32_t rt = rank_tbl[s];
            if (rt == 0xFFFFFFFFu) break; /* empty slot: miss */
            if (keys[s] == vals[i]) {
                r = rt;
                break;
            }
            s = (s + 1) & mask;
        }
        out[i] = r;
    }
}

/* FOR decode fused: unpack width-bit unsigned deltas, add ref (mod 2^64),
 * write int32 truncating — one pass replacing unpack_bits + _mod_add +
 * astype(int32). Bit layout identical to tz_unpack_u64. */
void tz_unpack_add_i32(const uint8_t *in, int64_t nbytes, int64_t n, int width,
                       uint64_t ref, int32_t *out) {
    uint64_t mask = (width >= 64) ? ~0ULL : ((1ULL << width) - 1);
    int64_t i = 0;
    if (width <= 57) {
        for (; i < n; i++) {
            int64_t bit = i * (int64_t)width;
            int64_t byte = bit >> 3;
            if (byte + 8 > nbytes) break;
            uint64_t w;
            __builtin_memcpy(&w, in + byte, 8);
            out[i] = (int32_t)(uint32_t)(((w >> (bit & 7)) & mask) + ref);
        }
    }
    unsigned __int128 acc = 0;
    int nbits = 0;
    int64_t bit0 = i * (int64_t)width;
    const uint8_t *p = in + (bit0 >> 3);
    const uint8_t *end = in + nbytes;
    int skip = (int)(bit0 & 7);
    if (i < n && p < end) {
        acc = *p++ >> skip;
        nbits = 8 - skip;
    }
    for (; i < n; i++) {
        while (nbits < width && p < end) {
            acc |= (unsigned __int128)(*p++) << nbits;
            nbits += 8;
        }
        out[i] = (int32_t)(uint32_t)((((uint64_t)acc) & mask) + ref);
        acc >>= width;
        nbits -= width;
    }
}

/* Delta decode fused: LEB128(u64) + unzigzag64 + running prefix sum
 * (mod-2^64 wraparound), write int32 truncating — one pass replacing
 * decode_leb128 + zigzag_decode + cumsum + astype(int32).
 * rc 0 ok, 1 truncated, 2 overflow. */
int tz_dec_delta_i32(const uint8_t *in, int64_t nbytes, int64_t n,
                     int32_t *out) {
    const uint8_t *p = in;
    const uint8_t *end = in + nbytes;
    uint64_t acc = 0;
    for (int64_t i = 0; i < n; i++) {
        uint64_t v = 0;
        int shift = 0, k = 0;
        for (;;) {
            if (p >= end) return 1;
            uint8_t b = *p++;
            k++;
            if (k > 10) return 2;
            v |= (uint64_t)(b & 0x7Fu) << shift;
            if (b < 0x80u) {
                if (k == 10 && b > 0x01u) return 2;
                break;
            }
            shift += 7;
        }
        acc += (v >> 1) ^ (0 - (v & 1)); /* unzigzag64, mod-2^64 add */
        out[i] = (int32_t)(uint32_t)acc;
    }
    return 0;
}

/* Per-doc polynomial checksums (pipeline._DocChecksumStage): the NumPy
 * construction sum_j (x_j + MIX) * B^j costs ~8 full-array passes (repeat,
 * gather, cumsum differencing); Horner over each doc's reversed range is
 * ONE pass and bit-identical under uint64 wraparound. x = zigzag32(value)
 * for token streams, raw byte for doc_id strings. out_sum also folds the
 * per-doc int64 token sum so the caller drops its cumsum passes. */
void tz_doc_chk_i32(const int32_t *vals, const int64_t *offs, int64_t n_docs,
                    uint64_t mix, uint64_t b, uint64_t *out_h,
                    int64_t *out_sum) {
    for (int64_t d = 0; d < n_docs; d++) {
        uint64_t h = 0;
        int64_t s = 0;
        for (int64_t j = offs[d + 1] - 1; j >= offs[d]; j--) {
            uint64_t zz = ((uint32_t)vals[j] << 1) ^ (uint32_t)(vals[j] >> 31);
            h = h * b + (zz + mix);
            s += vals[j];
        }
        out_h[d] = h;
        out_sum[d] = s;
    }
}

void tz_byte_chk(const uint8_t *bytes, const int64_t *offs, int64_t n_docs,
                 uint64_t mix, uint64_t b, uint64_t *out_h) {
    for (int64_t d = 0; d < n_docs; d++) {
        uint64_t h = 0;
        for (int64_t j = offs[d + 1] - 1; j >= offs[d]; j--) {
            h = h * b + ((uint64_t)bytes[j] + mix);
        }
        out_h[d] = h;
    }
}

/* ---------------------------------------------------------------------------
 * Canonical-Huffman kernels for frequency-rank streams (codecs/huffman.py).
 * Public construction: Huffman 1952 lengths via the two-queue method
 * (van Leeuwen 1976), zlib-style length cap repair (done in Python on the
 * ~64-entry histogram), canonical code assignment ordered by (length,
 * symbol). Encode is MSB-first into a 64-bit accumulator; decode peeks a
 * W-bit one-level LUT for short codes and falls back to the canonical
 * first-code walk for long ones.
 * ------------------------------------------------------------------------- */

/* Two-queue Huffman: leaf depths for weights sorted ASCENDING. depths out
 * int32[k]. Merged internal nodes are produced in nondecreasing weight
 * order, so two array queues suffice — O(k), no heap. k >= 2. */
void tz_huff_depths(const int64_t *w_asc, int64_t k, int32_t *depth,
                    int64_t *scratch_w, int32_t *scratch_parent) {
    /* nodes 0..k-1 = leaves; k..2k-2 = internal (in scratch arrays with
     * index offset -k). parent stored for every node; root has none. */
    int64_t li = 0;      /* next leaf */
    int64_t ii = 0;      /* next unconsumed internal */
    int64_t ni = 0;      /* number of internal nodes created */
    for (int64_t m = 0; m < k - 1; m++) {
        int64_t c1, c2;
        /* pick two smallest among leaf head and internal head */
        if (li < k && (ii >= ni || w_asc[li] <= scratch_w[ii]))
            c1 = li++;
        else
            c1 = k + ii++;
        if (li < k && (ii >= ni || w_asc[li] <= scratch_w[ii]))
            c2 = li++;
        else
            c2 = k + ii++;
        int64_t wsum = (c1 < k ? w_asc[c1] : scratch_w[c1 - k]) +
                       (c2 < k ? w_asc[c2] : scratch_w[c2 - k]);
        scratch_w[ni] = wsum;
        /* record parent (internal index ni) for both children */
        if (c1 < k) depth[c1] = (int32_t)ni; else scratch_parent[c1 - k] = (int32_t)ni;
        if (c2 < k) depth[c2] = (int32_t)ni; else scratch_parent[c2 - k] = (int32_t)ni;
        ni++;
    }
    /* resolve internal depths root-down: parent index is always larger */
    int32_t *idepth = scratch_parent; /* reuse: overwrite parent with depth */
    if (ni > 0) {
        /* process from root (ni-1) down; idepth[j] currently holds parent */
        int32_t root = (int32_t)(ni - 1);
        /* temporary: compute depths into scratch_w reinterpreted? use a
         * second pass with a separate loop over a small stack-free order */
        for (int64_t j = ni - 1; j >= 0; j--) {
            if (j == root) { idepth[j] = 0; }
            else { idepth[j] = idepth[idepth[j]] + 1; }
        }
    }
    for (int64_t i = 0; i < k; i++)
        depth[i] = (ni > 0) ? idepth[depth[i]] + 1 : 0;
}

/* MSB-first Huffman encode: per-symbol (code, len) tables. Returns bytes
 * written, or -1 if any symbol >= k. Caller sizes out via the exact bit
 * total. len <= 31 guaranteed by the Python-side cap. */
int64_t tz_huff_enc_u32(const uint32_t *syms, int64_t n, int64_t k,
                        const uint32_t *codes, const uint8_t *lens,
                        uint8_t *out) {
    uint64_t acc = 0;
    int nb = 0;
    uint8_t *p = out;
    for (int64_t i = 0; i < n; i++) {
        uint32_t s = syms[i];
        if (s >= (uint64_t)k) return -1;
        int l = lens[s];
        acc = (acc << l) | codes[s];
        nb += l;
        while (nb >= 8) {
            nb -= 8;
            *p++ = (uint8_t)(acc >> nb);
        }
    }
    if (nb) *p++ = (uint8_t)(acc << (8 - nb));
    return (int64_t)(p - out);
}

/* Canonical decode. W-bit LUT for codes with len <= W (lut_sym/lut_len,
 * 2^W entries, lut_len 0 = long code); longer codes resolved by the
 * canonical first-code walk over (blc, first_code, first_sym) with symbol
 * ids taken from sym_ordered (symbols sorted by (len, sym)). Returns 0 ok,
 * 1 if the stream ran out of bits. */
int64_t tz_huff_dec_u32(const uint8_t *in, int64_t nbytes, int64_t n,
                        int W, const uint32_t *lut_sym, const uint8_t *lut_len,
                        int maxlen, const int64_t *blc,
                        const int64_t *first_code, const int64_t *first_sym,
                        const uint32_t *sym_ordered, uint32_t *out) {
    uint64_t acc = 0;
    int nb = 0;
    int64_t pos = 0;
    uint64_t wmask = (W > 0) ? ((1ULL << W) - 1) : 0;
    int64_t total_bits = nbytes * 8;
    int64_t used_bits = 0;
    for (int64_t i = 0; i < n; i++) {
        while (nb <= 56 && pos < nbytes) {
            acc = (acc << 8) | in[pos++];
            nb += 8;
        }
        uint64_t peek = (nb >= W) ? ((acc >> (nb - W)) & wmask)
                                  : ((acc << (W - nb)) & wmask);
        int l = lut_len[peek];
        uint32_t sym;
        if (l != 0) {
            sym = lut_sym[peek];
        } else {
            /* long code: walk lengths W+1..maxlen */
            int ll = W + 1;
            for (;; ll++) {
                if (ll > maxlen) return 1; /* corrupt */
                uint64_t code = (nb >= ll)
                                    ? ((acc >> (nb - ll)) & ((1ULL << ll) - 1))
                                    : ((acc << (ll - nb)) & ((1ULL << ll) - 1));
                int64_t off = (int64_t)code - first_code[ll];
                if (off >= 0 && off < blc[ll]) {
                    sym = sym_ordered[first_sym[ll] + off];
                    l = ll;
                    break;
                }
            }
        }
        used_bits += l;
        if (used_bits > total_bits) return 1;
        nb -= l;
        out[i] = sym;
    }
    return 0;
}

/* ---------------------------------------------------------------------------
 * Batch MD5 (RFC 1321, public spec) over variable-length spans of one flat
 * byte buffer, each optionally prefixed by a constant salt. Replaces the
 * per-row Python hashlib loops in the split/mixture/bottom-k partials and
 * the simhash word hasher (the oracles pin md5, so the hash itself cannot
 * change — only where it runs). K table = floor(abs(sin(i+1)) * 2^32)
 * (RFC 1321 §3.4), hardcoded so the build needs no libm.
 * ------------------------------------------------------------------------- */

static const uint32_t TZ_MD5_K[64] = {
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391,
};

static const uint8_t TZ_MD5_S[64] = {
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
};

typedef struct {
    uint32_t a, b, c, d;
    uint64_t len;       /* total message bytes so far */
    uint8_t buf[64];
    int buflen;
} tz_md5_ctx;

static void tz_md5_block(tz_md5_ctx *cx, const uint8_t *p) {
    uint32_t m[16];
    for (int i = 0; i < 16; i++)
        m[i] = (uint32_t)p[4 * i] | ((uint32_t)p[4 * i + 1] << 8) |
               ((uint32_t)p[4 * i + 2] << 16) | ((uint32_t)p[4 * i + 3] << 24);
    uint32_t a = cx->a, b = cx->b, c = cx->c, d = cx->d;
    for (int i = 0; i < 64; i++) {
        uint32_t f, g;
        if (i < 16)      { f = (b & c) | (~b & d);  g = (uint32_t)i; }
        else if (i < 32) { f = (d & b) | (~d & c);  g = (5u * i + 1) & 15u; }
        else if (i < 48) { f = b ^ c ^ d;           g = (3u * i + 5) & 15u; }
        else             { f = c ^ (b | ~d);        g = (7u * i) & 15u; }
        f += a + TZ_MD5_K[i] + m[g];
        a = d; d = c; c = b;
        b += (f << TZ_MD5_S[i]) | (f >> (32 - TZ_MD5_S[i]));
    }
    cx->a += a; cx->b += b; cx->c += c; cx->d += d;
}

static void tz_md5_init(tz_md5_ctx *cx) {
    cx->a = 0x67452301u; cx->b = 0xefcdab89u;
    cx->c = 0x98badcfeu; cx->d = 0x10325476u;
    cx->len = 0; cx->buflen = 0;
}

static void tz_md5_update(tz_md5_ctx *cx, const uint8_t *p, int64_t n) {
    cx->len += (uint64_t)n;
    if (cx->buflen) {
        int want = 64 - cx->buflen;
        if (n < want) {
            for (int64_t i = 0; i < n; i++) cx->buf[cx->buflen + i] = p[i];
            cx->buflen += (int)n;
            return;
        }
        for (int i = 0; i < want; i++) cx->buf[cx->buflen + i] = p[i];
        tz_md5_block(cx, cx->buf);
        p += want; n -= want; cx->buflen = 0;
    }
    while (n >= 64) { tz_md5_block(cx, p); p += 64; n -= 64; }
    for (int64_t i = 0; i < n; i++) cx->buf[i] = p[i];
    cx->buflen = (int)n;
}

static void tz_md5_final(tz_md5_ctx *cx, uint8_t out[16]) {
    uint64_t bits = cx->len << 3;
    uint8_t pad = 0x80;
    tz_md5_update(cx, &pad, 1);
    uint8_t z = 0;
    while (cx->buflen != 56) tz_md5_update(cx, &z, 1);
    uint8_t lb[8]; /* bits was captured before padding, so cx->len drift
                      from the pad bytes is irrelevant from here on */
    for (int i = 0; i < 8; i++) lb[i] = (uint8_t)(bits >> (8 * i));
    tz_md5_update(cx, lb, 8);
    uint32_t st[4] = {cx->a, cx->b, cx->c, cx->d};
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) out[4 * i + j] = (uint8_t)(st[i] >> (8 * j));
}

/* n digests: span i = buf[starts[i], ends[i]), each prefixed by
 * pfx[0..pfx_len). out = 16 bytes per span. */
void tz_md5_spans(const uint8_t *pfx, int64_t pfx_len, const uint8_t *buf,
                  const int64_t *starts, const int64_t *ends, int64_t n,
                  uint8_t *out) {
    for (int64_t i = 0; i < n; i++) {
        tz_md5_ctx cx;
        tz_md5_init(&cx);
        if (pfx_len) tz_md5_update(&cx, pfx, pfx_len);
        tz_md5_update(&cx, buf + starts[i], ends[i] - starts[i]);
        tz_md5_final(&cx, out + 16 * i);
    }
}
