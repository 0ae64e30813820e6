/* Scalar C kernels for the FSST hot loops (encode parse + decode expand).
 *
 * Semantics are EXACTLY the NumPy implementation in fsstlib.py (greedy
 * longest-symbol match, 2-byte escape, parse restarts every SEGMENT bytes
 * and at row bounds; reference format constants per sketch.cc:95,
 * src/FsstWrapper.cpp:131-136). The Python wrapper asserts bit-identical
 * output against the NumPy path in tests.
 *
 * Built at import time with the system cc (-O3); NumPy remains the
 * fallback when no compiler is present.
 */

#include <stdint.h>
#include <string.h>

#define ESCAPE 255
#define SEGMENT 256

/* tail-safe 8-byte load: positions within 8 bytes of the buffer end read
 * through a zero-padded local copy instead of past the allocation */
static inline uint64_t load8_safe(const uint8_t *data, int64_t p, int64_t total) {
    if (p + 8 <= total) {
        uint64_t v;
        memcpy(&v, data + p, 8);
        return v;
    }
    uint8_t tmp[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    memcpy(tmp, data + p, (size_t)(total - p));
    uint64_t v;
    memcpy(&v, tmp, 8);
    return v;
}

static inline uint64_t load8(const uint8_t *p) {
    uint64_t v;
    memcpy(&v, p, 8); /* little-endian hosts only (x86-64/aarch64-le) */
    return v;
}

/* Encode rows[data, offsets] with a prepared table.
 *  short_code/short_len: 65536-entry tables on the first two bytes
 *  len1_code: 256-entry table (code of the length-1 symbol, 255 = none)
 *  lut3: 2^24 table, 3-byte prefix -> prefix id + 1 (0 = no long symbol)
 *  has_len: per prefix id, bit (l-1) set if a symbol of length l exists
 *  keys/codes: per length 3..8, sorted little-endian grams + their codes,
 *    flattened; key_off[l] .. key_off[l+1] is length l's range
 * data needs NO tail padding (gram loads near the end are tail-safe).
 * out must hold 2 * total bytes; out_po has n_rows + 1 slots.
 * Returns total output bytes. */
int64_t fsst_encode(
    const uint8_t *data, const int64_t *offsets, int64_t n_rows,
    const uint8_t *short_code, const uint8_t *short_len,
    const uint8_t *len1_code,
    int64_t has_long, const uint8_t *lut3, const uint8_t *has_len,
    const uint64_t *keys, const uint8_t *codes, const int64_t *key_off,
    uint8_t *out, int64_t *out_po)
{
    int64_t o = 0;
    const int64_t total = offsets[n_rows];
    out_po[0] = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t p = offsets[r];
        const int64_t row_end = offsets[r + 1];
        int64_t seg_end = p + SEGMENT < row_end ? p + SEGMENT : row_end;
        while (p < row_end) {
            if (p >= seg_end)
                seg_end = p + SEGMENT < row_end ? p + SEGMENT : row_end;
            const int64_t rem64 = seg_end - p;
            const int cap = rem64 < 8 ? (int)rem64 : 8;
            const uint64_t g8 = load8_safe(data, p, total);
            int best_len = 0;
            int best_code = ESCAPE;
            /* 1-2 byte match via the direct tables */
            {
                const uint16_t g2 = (uint16_t)g8;
                const int sl = short_len[g2];
                if (sl && sl <= cap) {
                    best_len = sl;
                    best_code = short_code[g2];
                } else if (sl > cap && cap >= 1) {
                    const int c1 = len1_code[(uint8_t)g8];
                    if (c1 != ESCAPE) {
                        best_len = 1;
                        best_code = c1;
                    }
                }
            }
            /* >=3 byte match via prefix filter + per-length binary search */
            if (has_long && cap >= 3) {
                const uint32_t g3 = (uint32_t)(g8 & 0xFFFFFF);
                const int pid1 = lut3[g3];
                if (pid1) {
                    const uint8_t mask = has_len[pid1 - 1];
                    const int lmax = cap;
                    for (int l = lmax; l >= 3; l--) {
                        if (l <= best_len)
                            break;
                        if (!(mask & (uint8_t)(1u << (l - 1))))
                            continue;
                        const uint64_t key =
                            l < 8 ? (g8 & ((1ULL << (8 * l)) - 1)) : g8;
                        int64_t lo = key_off[l], hi = key_off[l + 1] - 1;
                        while (lo <= hi) {
                            const int64_t mid = (lo + hi) >> 1;
                            const uint64_t k = keys[mid];
                            if (k == key) {
                                best_len = l;
                                best_code = codes[mid];
                                lo = hi + 2; /* found */
                            } else if (k < key) {
                                lo = mid + 1;
                            } else {
                                hi = mid - 1;
                            }
                        }
                        if (best_len == l)
                            break;
                    }
                }
            }
            if (best_len > 0) {
                out[o++] = (uint8_t)best_code;
                p += best_len;
            } else {
                out[o++] = ESCAPE;
                out[o++] = data[p];
                p += 1;
            }
        }
        out_po[r + 1] = o;
    }
    return o;
}

int64_t fsst_parse(
    const uint8_t *data, const int64_t *offsets, int64_t n_rows,
    const uint8_t *short_code, const uint8_t *short_len,
    const uint8_t *len1_code,
    int64_t has_long, const uint8_t *lut3, const uint8_t *has_len,
    const uint64_t *keys, const uint8_t *codes, const int64_t *key_off,
    int64_t *out_pos, uint8_t *out_len)
{
    int64_t o = 0;
    const int64_t total = offsets[n_rows];
    (void)0;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t p = offsets[r];
        const int64_t row_end = offsets[r + 1];
        int64_t seg_end = p + SEGMENT < row_end ? p + SEGMENT : row_end;
        while (p < row_end) {
            if (p >= seg_end)
                seg_end = p + SEGMENT < row_end ? p + SEGMENT : row_end;
            const int64_t rem64 = seg_end - p;
            const int cap = rem64 < 8 ? (int)rem64 : 8;
            const uint64_t g8 = load8_safe(data, p, total);
            int best_len = 0;
            int best_code = ESCAPE;
            /* 1-2 byte match via the direct tables */
            {
                const uint16_t g2 = (uint16_t)g8;
                const int sl = short_len[g2];
                if (sl && sl <= cap) {
                    best_len = sl;
                    best_code = short_code[g2];
                } else if (sl > cap && cap >= 1) {
                    const int c1 = len1_code[(uint8_t)g8];
                    if (c1 != ESCAPE) {
                        best_len = 1;
                        best_code = c1;
                    }
                }
            }
            /* >=3 byte match via prefix filter + per-length binary search */
            if (has_long && cap >= 3) {
                const uint32_t g3 = (uint32_t)(g8 & 0xFFFFFF);
                const int pid1 = lut3[g3];
                if (pid1) {
                    const uint8_t mask = has_len[pid1 - 1];
                    const int lmax = cap;
                    for (int l = lmax; l >= 3; l--) {
                        if (l <= best_len)
                            break;
                        if (!(mask & (uint8_t)(1u << (l - 1))))
                            continue;
                        const uint64_t key =
                            l < 8 ? (g8 & ((1ULL << (8 * l)) - 1)) : g8;
                        int64_t lo = key_off[l], hi = key_off[l + 1] - 1;
                        while (lo <= hi) {
                            const int64_t mid = (lo + hi) >> 1;
                            const uint64_t k = keys[mid];
                            if (k == key) {
                                best_len = l;
                                best_code = codes[mid];
                                lo = hi + 2; /* found */
                            } else if (k < key) {
                                lo = mid + 1;
                            } else {
                                hi = mid - 1;
                            }
                        }
                        if (best_len == l)
                            break;
                    }
                }
            }
            out_pos[o] = p;
            out_len[o] = (uint8_t)best_len;
            o++;
            p += best_len > 0 ? best_len : 1;
        }
    }
    return o;
}



/* Decode payloads back to bytes.
 *  sym_bytes: 256 x 8 symbol byte matrix; sym_len: 256 lengths
 * out_cap is the allocated size of out, which must include >= 8 writable
 * bytes past the true decoded size (symbol copies write 8 bytes).
 * Returns total decoded bytes (also writes per-row out offsets), or -1 if
 * the output would exceed out_cap: a corrupt/adversarial payload read back
 * from storage can expand up to 8x compressed size, so the caller's
 * exact-size buffer (from trusted row counts) must be a hard bound, not a
 * hint (the reference allocates the 8*n+32 worst case for the same reason,
 * src/FsstWrapper.hpp:56). */
int64_t fsst_decode(
    const uint8_t *in, const int64_t *po, int64_t n_rows,
    const uint8_t *sym_bytes, const uint8_t *sym_len,
    uint8_t *out, int64_t out_cap, int64_t *out_ro)
{
    int64_t o = 0;
    const int64_t lim = out_cap - 8; /* any single write is <= 8 bytes */
    out_ro[0] = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t p = po[r];
        const int64_t end = po[r + 1];
        while (p < end) {
            if (o > lim)
                return -1;
            const uint8_t b = in[p];
            if (b == ESCAPE) {
                out[o++] = (p + 1 < end) ? in[p + 1] : 0;
                p += 2;
            } else {
                memcpy(out + o, sym_bytes + ((int64_t)b << 3), 8);
                o += sym_len[b];
                p += 1;
            }
        }
        out_ro[r + 1] = o;
    }
    return o;
}

/* Row-padded bit packing at arbitrary width 1..32, little-endian bit order
 * (bit-identical to the NumPy unpackbits/packbits path in codecs/bitutil.py:
 * value bits LSB-first, every row flushed to a byte boundary). */
void pack_rows(
    const uint32_t *vals, const int64_t *offsets, int64_t n_rows, int width,
    uint8_t *out, const int64_t *out_po)
{
    for (int64_t r = 0; r < n_rows; r++) {
        uint64_t acc = 0;
        int nbits = 0;
        int64_t o = out_po[r];
        for (int64_t j = offsets[r]; j < offsets[r + 1]; j++) {
            acc |= (uint64_t)vals[j] << nbits;
            nbits += width;
            while (nbits >= 8) {
                out[o++] = (uint8_t)acc;
                acc >>= 8;
                nbits -= 8;
            }
        }
        if (nbits > 0)
            out[o++] = (uint8_t)acc;
    }
}

void unpack_rows(
    const uint8_t *in, const int64_t *po, const int64_t *offsets,
    int64_t n_rows, int width, uint32_t *vals)
{
    const uint64_t mask = width < 64 ? ((1ULL << width) - 1) : ~0ULL;
    for (int64_t r = 0; r < n_rows; r++) {
        uint64_t acc = 0;
        int nbits = 0;
        int64_t p = po[r];
        for (int64_t j = offsets[r]; j < offsets[r + 1]; j++) {
            while (nbits < width) {
                acc |= (uint64_t)in[p++] << nbits;
                nbits += 8;
            }
            vals[j] = (uint32_t)(acc & mask);
            acc >>= width;
            nbits -= width;
        }
    }
}

/* Compressed-domain LIKE prefilter (the reference's dormant SIMD skipping
 * intent, src/algos/Skipping.hpp:114-254, realized as a scalar LUT scan):
 * comb[b] is the bitmask of requirements a payload CODE byte b satisfies;
 * esc_comb[b] the mask an ESCAPED LITERAL byte b satisfies (credited to
 * the position of the preceding 255, matching the NumPy path's
 * whole-payload pair scan); a row is a candidate when its accumulated
 * mask reaches `need`. Early-exits per row once satisfied. Bit-identical
 * to the NumPy requirement AND in matchers/engines.py. */
void like_prefilter(
    const uint8_t *pay, const int64_t *po, int64_t n_rows,
    const uint8_t *comb, const uint8_t *esc_comb, int need, uint8_t *out)
{
    /* word-parallel fast path (the reference's 8-byte-word intent,
     * src/FsstWrapper.hpp:89-110 / Memory.hpp:31-71): chunks with no
     * ESCAPE byte — detected by one SWAR has-0xFF test — take the tight
     * branch-free 8-lookup OR; any chunk containing an escape marker
     * falls to the scalar step for exactly that byte, then re-enters the
     * word loop. Every byte still feeds comb[] exactly once and every
     * 255 credits esc_comb[] of its successor, so the accumulated mask
     * (and therefore out[]) is bit-identical to the scalar loop. */
    const uint64_t LO8 = 0x0101010101010101ULL;
    const uint64_t HI8 = 0x8080808080808080ULL;
    const int64_t total = po[n_rows];
    for (int64_t r = 0; r < n_rows; r++) {
        unsigned acc = 0;
        const int64_t end = po[r + 1];
        int64_t p = po[r];
        while (p < end) {
            while (p + 8 <= end) {
                const uint64_t w = load8(pay + p);
                const uint64_t y = ~w;
                if ((y - LO8) & ~y & HI8)
                    break; /* chunk holds a 0xFF: scalar handles it */
                acc |= comb[(uint8_t)w] | comb[(uint8_t)(w >> 8)] |
                       comb[(uint8_t)(w >> 16)] | comb[(uint8_t)(w >> 24)] |
                       comb[(uint8_t)(w >> 32)] | comb[(uint8_t)(w >> 40)] |
                       comb[(uint8_t)(w >> 48)] | comb[(uint8_t)(w >> 56)];
                p += 8;
                if ((int)acc == need) {
                    p = end;
                    break;
                }
            }
            if (p >= end)
                break;
            const uint8_t b = pay[p];
            acc |= comb[b];
            if (b == ESCAPE && p + 1 < total)
                acc |= esc_comb[pay[p + 1]];
            if ((int)acc == need)
                break;
            p++;
        }
        out[r] = ((int)acc == need);
    }
}

/* Lockstep-KMP contains-match walked scalar per row (the vectorized NumPy
 * walk in matchers/engines.py:kmp_code_match pays fancy-indexing per byte;
 * this is its bit-identical C twin). code_delta/char_delta are the
 * (m+1, 256) int32 automata; escape pairs step char_delta on the literal
 * byte. Early-exits a row at accept. */
void kmp_scan(
    const uint8_t *pay, const int64_t *po, int64_t n_rows,
    const int32_t *code_delta, const int32_t *char_delta, int32_t m,
    uint8_t *out)
{
    /* state-0 skip LUT (word-parallel intent of Skipping.hpp:114-254):
     * z[b] = 1 when byte b keeps the automaton in state 0 and is not the
     * escape marker. While in state 0, 8 such bytes advance the scan in
     * one branch — eight INDEPENDENT table loads instead of the serially
     * dependent automaton chain. State, pend and accept are untouched by
     * skipped bytes, so the walk is bit-identical. */
    uint8_t z[256];
    for (int i = 0; i < 256; i++)
        z[i] = (uint8_t)((code_delta[i] == 0) && (i != ESCAPE));
    for (int64_t r = 0; r < n_rows; r++) {
        int32_t s = 0;
        int pend = 0;
        const int64_t end = po[r + 1];
        int64_t p = po[r];
        while (p < end) {
            if (m > 0 && s == 0 && !pend) {
                while (p + 8 <= end) {
                    const uint8_t *q = pay + p;
                    if (z[q[0]] & z[q[1]] & z[q[2]] & z[q[3]] & z[q[4]] &
                        z[q[5]] & z[q[6]] & z[q[7]])
                        p += 8;
                    else
                        break;
                }
                if (p >= end)
                    break;
            }
            const uint8_t b = pay[p];
            if (pend) {
                s = char_delta[((int64_t)s << 8) + b];
                pend = 0;
            } else if (b == ESCAPE) {
                pend = 1;
            } else {
                s = code_delta[((int64_t)s << 8) + b];
            }
            if (s == m)
                break;
            p++;
        }
        out[r] = (s == m);
    }
}

/* Ordered multi-segment KMP (CometKmpMetaEngine analog, src/algos/
 * Comet.hpp:80-96): K per-segment automata stacked row-major; tab_off[k]
 * is segment k's first state row in the stacked (sum(m_k+1), 256) tables.
 * acc[state][code] = first within-symbol byte index reaching accept (-1 =
 * never); on a mid-symbol accept the symbol's REMAINING expansion bytes
 * feed the next machine char-by-char (sym_bytes/sym_len: 256x8 matrix).
 * Bit-identical to meta_kmp_code_match. */
void meta_kmp_scan(
    const uint8_t *pay, const int64_t *po, int64_t n_rows,
    const int32_t *char_d, const int32_t *code_d, const int32_t *acc,
    const int64_t *tab_off, const int32_t *m_of, int K,
    const uint8_t *sym_bytes, const uint8_t *sym_len, uint8_t *out)
{
    /* machine-0 state-0 skip LUT (same trick as kmp_scan): bytes that
     * neither accept, advance machine 0, nor open an escape pair can be
     * consumed 8 at a time while the walk sits at (k=0, s=0). */
    uint8_t z[256];
    const int64_t b0 = tab_off[0] << 8;
    for (int i = 0; i < 256; i++)
        z[i] = (uint8_t)((i != ESCAPE) && (acc[b0 + i] < 0) &&
                         (code_d[b0 + i] == 0));
    for (int64_t r = 0; r < n_rows; r++) {
        int k = 0;
        int32_t s = 0;
        int pend = 0, done = 0;
        const int64_t end = po[r + 1];
        for (int64_t p = po[r]; p < end && !done; p++) {
            if (k == 0 && s == 0 && !pend && K > 0 && m_of[0] > 0) {
                while (p + 8 <= end) {
                    const uint8_t *q = pay + p;
                    if (z[q[0]] & z[q[1]] & z[q[2]] & z[q[3]] & z[q[4]] &
                        z[q[5]] & z[q[6]] & z[q[7]])
                        p += 8;
                    else
                        break;
                }
                if (p >= end)
                    break;
            }
            const uint8_t b = pay[p];
            if (pend) {
                pend = 0;
                s = char_d[((tab_off[k] + s) << 8) + b];
                if (s == m_of[k]) {
                    k++; s = 0;
                    if (k == K) done = 1;
                }
            } else if (b == ESCAPE) {
                pend = 1;
            } else {
                const int32_t t = acc[((tab_off[k] + s) << 8) + b];
                if (t < 0) {
                    s = code_d[((tab_off[k] + s) << 8) + b];
                } else {
                    k++; s = 0;
                    if (k == K) { done = 1; }
                    else {
                        const int L = sym_len[b];
                        for (int j = (int)t + 1; j < L && !done; j++) {
                            const uint8_t bb = sym_bytes[((int64_t)b << 3) + j];
                            s = char_d[((tab_off[k] + s) << 8) + bb];
                            if (s == m_of[k]) {
                                k++; s = 0;
                                if (k == K) done = 1;
                            }
                        }
                    }
                }
            }
        }
        out[r] = (uint8_t)done;
    }
}

/* Per-row polynomial hash over uint32 values (stages/verify._poly_rowhash
 * hot leg): h_row = sum_j (v_j + 1) * P^(j - row_start) mod 2^64, P the
 * FNV-ish odd multiplier. Bit-identical to the NumPy path, but touches
 * 4 bytes per token instead of the ~60 the vectorized formulation
 * materializes (uint64 upcast + position array + power gather + terms) —
 * the encode path's hash leg is bandwidth-bound at 32 cores. */
void poly_rowhash_u32(const uint32_t *v, const int64_t *off, int64_t n_rows,
                      uint64_t *out) {
    const uint64_t P = 0x100000001B3ULL;
    for (int64_t r = 0; r < n_rows; r++) {
        uint64_t h = 0, pw = 1;
        const int64_t end = off[r + 1];
        for (int64_t j = off[r]; j < end; j++) {
            h += ((uint64_t)v[j] + 1) * pw;
            pw *= P;
        }
        out[r] = h;
    }
}

/* Hash-based unique+inverse for the dict codec: one O(n) pass replaces
 * NumPy's O(n log n) full sort with permutation arrays (np.unique
 * return_inverse was ~94% of dict train_encode). Open addressing,
 * multiplicative hash, linear probe; ht_codes == -1 marks empty so any
 * int32 VALUE (including -1) is legal. cap must be a power of two
 * > expected uniques * 2 (caller sizes it). Returns the unique count;
 * uniq_out holds FIRST-SEEN order (caller sorts the small unique array
 * and remaps codes — bit-identical to the NumPy sorted-dict contract). */
long dict_unique(const int32_t *v, int64_t n,
                 int32_t *ht_keys, int32_t *ht_codes, int64_t cap,
                 int32_t *uniq_out, int32_t *codes_out) {
    int64_t mask = cap - 1;
    int32_t u = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t x = v[i];
        uint32_t h = ((uint32_t)x * 2654435761u);
        int64_t p = (int64_t)(h & (uint32_t)mask);
        for (;;) {
            int32_t c = ht_codes[p];
            if (c == -1) {
                ht_keys[p] = x;
                ht_codes[p] = u;
                uniq_out[u] = x;
                codes_out[i] = u;
                u++;
                break;
            }
            if (ht_keys[p] == x) {
                codes_out[i] = c;
                break;
            }
            p = (p + 1) & mask;
        }
    }
    return (long)u;
}

/* ---- Stream-VByte-style varint (codecs/varint.py's hot loops) ----------
 * Layout per row: ceil(count/4) control bytes (2-bit length codes, LE
 * slot order) followed by the data bytes (1-4 LE low bytes per value).
 * Bit-identical to the NumPy path in codecs/varint.py (asserted in
 * tests/test_native.py). buf must arrive zeroed (control uses |=). */
void varint_encode(const uint32_t *v, const int64_t *off, int64_t n_rows,
                   const int64_t *po, uint8_t *buf) {
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t s = off[r];
        int64_t cnt = off[r + 1] - s;
        if (!cnt) continue;
        uint8_t *ctrl = buf + po[r];
        uint8_t *data = ctrl + ((cnt + 3) >> 2);
        for (int64_t i = 0; i < cnt; i++) {
            uint32_t x = v[s + i];
            unsigned code = (x >= (1u << 8)) + (x >= (1u << 16)) +
                            (x >= (1u << 24));
            ctrl[i >> 2] |= (uint8_t)(code << ((i & 3) << 1));
            data[0] = (uint8_t)x;
            if (code >= 1) data[1] = (uint8_t)(x >> 8);
            if (code >= 2) data[2] = (uint8_t)(x >> 16);
            if (code >= 3) data[3] = (uint8_t)(x >> 24);
            data += code + 1;
        }
    }
}

void varint_decode(const uint8_t *buf, const int64_t *po, const int64_t *off,
                   int64_t n_rows, uint32_t *out) {
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t s = off[r];
        int64_t cnt = off[r + 1] - s;
        if (!cnt) continue;
        const uint8_t *ctrl = buf + po[r];
        const uint8_t *data = ctrl + ((cnt + 3) >> 2);
        for (int64_t i = 0; i < cnt; i++) {
            unsigned code = (ctrl[i >> 2] >> ((i & 3) << 1)) & 3u;
            uint32_t x = data[0];
            if (code >= 1) x |= (uint32_t)data[1] << 8;
            if (code >= 2) x |= (uint32_t)data[2] << 16;
            if (code >= 3) x |= (uint32_t)data[3] << 24;
            out[s + i] = x;
            data += code + 1;
        }
    }
}

/* ---- per-row segment moves (bitutil.scatter/gather_segments hot path,
 * shared by the for/rlebp/pfor payload assembly) -------------------------- */
void seg_scatter(uint8_t *buf, const int64_t *dst_base,
                 const int64_t *seg_nbytes, int64_t n_rows,
                 const uint8_t *src) {
    int64_t s = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t nb = seg_nbytes[r];
        if (nb) {
            memcpy(buf + dst_base[r], src + s, (size_t)nb);
            s += nb;
        }
    }
}

void seg_gather(const uint8_t *buf, const int64_t *src_base,
                const int64_t *seg_nbytes, int64_t n_rows, uint8_t *out) {
    int64_t d = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t nb = seg_nbytes[r];
        if (nb) {
            memcpy(out + d, buf + src_base[r], (size_t)nb);
            d += nb;
        }
    }
}
