/* Native host-side hot paths for scalce_tpu.
 *
 * The reference is a C tool end to end [SURVEY.md §2]; in scalce_tpu the
 * device does the heavy compute, but the host feed path (FASTQ record
 * gather/scatter into padded blocks) must run at memory-bandwidth class
 * speed too.  NumPy fancy indexing materializes 8-byte indices per byte
 * moved (~8x write amplification); these memcpy loops replace that.
 *
 * Built with build.py (plain cc -O3 -shared), bound via ctypes —
 * no pybind11/pip needed.  Every entry point has a NumPy fallback in
 * io/fastq.py, so the extension is an accelerator, not a dependency.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

#define EXPORT __attribute__((visibility("default")))

/* Concatenate buf[starts[i] : starts[i]+lens[i]] into out. */
EXPORT void ragged_gather_u8(const uint8_t *buf, const int64_t *starts,
                             const int64_t *lens, int64_t n, uint8_t *out)
{
    int64_t off = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t l = lens[i];
        memcpy(out + off, buf + starts[i], (size_t)l);
        off += l;
    }
}

/* Scatter concatenated rows into dst at dst_starts. */
EXPORT void ragged_scatter_u8(uint8_t *dst, const int64_t *dst_starts,
                              const uint8_t *src, const int64_t *lens,
                              int64_t n)
{
    int64_t off = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t l = lens[i];
        memcpy(dst + dst_starts[i], src + off, (size_t)l);
        off += l;
    }
}

/* One-pass FASTQ block fill: for each record, copy its sequence bytes
 * (translated through base2code, collecting exceptions) and its quality
 * bytes into row i of the padded [B, L] outputs.
 *
 * seq_starts/qual_starts index into buf; lens[i] is the read length.
 * Exceptions (non-ACGT bases) are appended to exc_pos/exc_byte (flat
 * position = i*L + col); returns the exception count, or -1 if exc_cap
 * would overflow (caller retries with a bigger buffer).
 */
EXPORT int64_t fill_block(const uint8_t *seq_buf,
                          const int64_t *seq_starts,
                          const uint8_t *qual_buf,
                          const int64_t *qual_starts,
                          const int64_t *lens, int64_t n, int64_t L,
                          const uint8_t *base2code,
                          uint8_t *seq_out, uint8_t *qual_out,
                          int64_t *exc_pos, uint8_t *exc_byte,
                          int64_t exc_cap)
{
    int64_t n_exc = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t l = lens[i];
        const uint8_t *s = seq_buf + seq_starts[i];
        uint8_t *so = seq_out + i * L;
        int64_t base = i * L;
        for (int64_t j = 0; j < l; j++) {
            uint8_t c = base2code[s[j]];
            if (c == 255) {
                if (n_exc >= exc_cap)
                    return -1;
                exc_pos[n_exc] = base + j;
                exc_byte[n_exc] = s[j];
                n_exc++;
                c = 0;
            }
            so[j] = c;
        }
        memcpy(qual_out + base, qual_buf + qual_starts[i], (size_t)l);
    }
    return n_exc;
}

/* Pack 2-bit base codes 16-per-u32, big-endian within the word (first
 * base in the highest bits) — must match ops/bitops.py pack_bases_u32.
 * codes length = n_words * 16.  Packing on host shrinks the H2D
 * transfer 4x (the tunnel/PCIe link is the scarce resource).
 */
EXPORT void pack2bit_u32(const uint8_t *codes, int64_t n_words,
                         uint32_t *out)
{
    for (int64_t w = 0; w < n_words; w++) {
        const uint8_t *c = codes + w * 16;
        uint32_t v = 0;
        for (int j = 0; j < 16; j++)
            v = (v << 2) | (uint32_t)(c[j] & 3);
        out[w] = v;
    }
}

/* Inverse of pack2bit_u32: uint32 words -> 16 2-bit codes each. */
EXPORT void unpack2bit_u32(const uint32_t *words, int64_t n_words,
                           uint8_t *out)
{
    for (int64_t w = 0; w < n_words; w++) {
        uint32_t v = words[w];
        uint8_t *o = out + w * 16;
        for (int j = 15; j >= 0; j--) {
            o[j] = (uint8_t)(v & 3u);
            v >>= 2;
        }
    }
}

/* Rebuild delta-coded sequence rows.  Row i copies bit-masked positions
 * from row i-1 at a column shift; the rest come from the literal
 * stream.  Mask bits are LSB-first within each byte (bit j of byte b
 * covers column b*8+j), matching the device-side packing in
 * pipeline/encode.py::_delta_seq.
 */
EXPORT void reconstruct_delta(const uint8_t *mask_bits, /* [n, L/8] */
                              const int16_t *shifts,    /* [n] */
                              const uint8_t *pred_k,    /* [n], 0..K-1 */
                              const uint8_t *lits,
                              const int64_t *lens, int64_t n, int64_t L,
                              uint8_t *out /* [>=n, L], zeroed */)
{
    int64_t stride = L / 8;
    int64_t lit_off = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t l = lens[i];
        const uint8_t *mb = mask_bits + i * stride;
        const uint8_t *prev = out + (i - 1 - (int64_t)pred_k[i]) * L;
        uint8_t *row = out + i * L;
        int64_t sh = shifts[i];
        for (int64_t j = 0; j < l; j++) {
            if (mb[j >> 3] & (1u << (j & 7)))
                row[j] = prev[j + sh];
            else
                row[j] = lits[lit_off++];
        }
    }
}

/* Inverse: rebuild FASTQ text. For each record write
 *   '@' name '\n' bases '\n' '+' plus '\n' qual '\n'
 * bases come from code2base[seq_codes]; exceptions are pre-applied by
 * the caller (cheap: they are rare).
 */
EXPORT void render_fastq(const uint8_t *bases,      /* [B*L], already ASCII */
                         const uint8_t *qual,       /* [B*L] */
                         const int64_t *lens, int64_t n, int64_t L,
                         const uint8_t *name_cat, const int64_t *name_off,
                         const uint8_t *plus_cat, const int64_t *plus_off,
                         uint8_t *out, const int64_t *rec_off)
{
    for (int64_t i = 0; i < n; i++) {
        uint8_t *o = out + rec_off[i];
        int64_t l = lens[i];
        int64_t nl = name_off[i + 1] - name_off[i];
        int64_t pl = plus_off ? (plus_off[i + 1] - plus_off[i]) : 0;
        *o++ = '@';
        memcpy(o, name_cat + name_off[i], (size_t)nl); o += nl;
        *o++ = '\n';
        memcpy(o, bases + i * L, (size_t)l); o += l;
        *o++ = '\n';
        *o++ = '+';
        if (pl) { memcpy(o, plus_cat + plus_off[i], (size_t)pl); o += pl; }
        *o++ = '\n';
        memcpy(o, qual + i * L, (size_t)l); o += l;
        *o++ = '\n';
    }
}

/* render_fastq with IN-COPY base translation: consumes 2-bit codes and
 * the code->ASCII LUT directly, so the caller skips materializing a
 * 13MB translated bases array (exceptions are patched into the output
 * buffer afterwards — they are rare and their buf positions are
 * vectorizable). */
EXPORT void render_fastq2(const uint8_t *codes,      /* [n*L] 2-bit */
                          const uint8_t *code2base,  /* [4] */
                          const uint8_t *qual,       /* [n*L] */
                          const int64_t *lens, int64_t n, int64_t L,
                          const uint8_t *name_cat, const int64_t *name_off,
                          const uint8_t *plus_cat, const int64_t *plus_off,
                          uint8_t *out, const int64_t *rec_off)
{
    for (int64_t i = 0; i < n; i++) {
        uint8_t *o = out + rec_off[i];
        int64_t l = lens[i];
        int64_t nl = name_off[i + 1] - name_off[i];
        int64_t pl = plus_off ? (plus_off[i + 1] - plus_off[i]) : 0;
        *o++ = '@';
        memcpy(o, name_cat + name_off[i], (size_t)nl); o += nl;
        *o++ = '\n';
        const uint8_t *c = codes + i * L;
#if defined(__AVX512F__) && defined(__AVX512BW__)
        {
            /* 64-wide code->base translate: codes are 0..3, so a
             * broadcast 16-byte shuffle table replaces the per-byte
             * LUT load */
            const __m512i tab = _mm512_broadcast_i32x4(_mm_setr_epi8(
                (char)code2base[0], (char)code2base[1],
                (char)code2base[2], (char)code2base[3],
                0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0));
            const __m512i v3 = _mm512_set1_epi8(3);
            for (int64_t j = 0; j < l; j += 64) {
                int64_t take = l - j < 64 ? l - j : 64;
                uint64_t lanes = take == 64 ? ~0ULL : (1ULL << take) - 1;
                __m512i v = _mm512_maskz_loadu_epi8(lanes, c + j);
                v = _mm512_shuffle_epi8(tab, _mm512_and_si512(v, v3));
                _mm512_mask_storeu_epi8(o + j, lanes, v);
            }
        }
#else
        for (int64_t j = 0; j < l; j++)
            o[j] = code2base[c[j] & 3];
#endif
        o += l;
        *o++ = '\n';
        *o++ = '+';
        if (pl) { memcpy(o, plus_cat + plus_off[i], (size_t)pl); o += pl; }
        *o++ = '\n';
        memcpy(o, qual + i * L, (size_t)l); o += l;
        *o++ = '\n';
    }
}

/* ---- quality stream codec (host placement) --------------------------
 *
 * Bit-identical C implementations of streams/qualities.py's host path:
 * the context model, the interleaved-lane rANS encode (u32 state,
 * 16-bit renorm, PROB_BITS=12) and decode.  The NumPy versions remain
 * as fallbacks and as the executable spec; tests pin equality.
 */

#define Q_OFFSET 33
#define Q_NSYMS 94
#define Q_POS_BUCKETS 8
#define Q_POS_BUCKETS32 32     /* order-3 fine position buckets */
#define Q_PREV_LEVELS 24       /* order-2 prev1 quantization (>> 2) */
#define Q_PREV1_FULL 94        /* order-1/3 full prev1 */
#define Q_PREV2_LEVELS 7
#define RANS_PROB_BITS 12
#define RANS_M (1u << RANS_PROB_BITS)
#define RANS_LOW (1u << 16)

/* position bucket: orders 1/2 use 8 coarse buckets (col/16); order 3
 * trades a bigger table for 32 fine buckets (col/4, capped) —
 * EXPERIMENTS.md §2's pos-adaptive-width row */
static inline uint32_t q_pb(int64_t col, int order)
{
    if (order == 3) {
        uint32_t pb = (uint32_t)(col >> 2);
        return pb > Q_POS_BUCKETS32 - 1 ? Q_POS_BUCKETS32 - 1 : pb;
    }
    uint32_t pb = (uint32_t)(col >> 4);
    return pb > Q_POS_BUCKETS - 1 ? Q_POS_BUCKETS - 1 : pb;
}

static inline uint32_t q_ctx(uint32_t prev1, uint32_t prev2, uint32_t pb,
                             int c0, int c1, int valid, int order)
{
    uint32_t ctx;
    if (order == 2) {
        uint32_t pq = c0 ? (uint32_t)Q_PREV_LEVELS
                         : ((prev1 >> 2) < Q_PREV_LEVELS - 1
                                ? (prev1 >> 2) : Q_PREV_LEVELS - 1);
        ctx = pb * (uint32_t)(Q_PREV_LEVELS + 1) + pq;
        uint32_t p2 = (c0 || c1) ? (uint32_t)(Q_PREV2_LEVELS - 1)
                                 : ((prev2 >> 4) < Q_PREV2_LEVELS - 2
                                        ? (prev2 >> 4)
                                        : Q_PREV2_LEVELS - 2);
        ctx = ctx * (uint32_t)Q_PREV2_LEVELS + p2;
    } else {
        /* order 1: FULL previous symbol (+ start sentinel) — see
         * streams/qualities.py _PREV1_FULL for the rationale */
        uint32_t pq = c0 ? (uint32_t)Q_PREV1_FULL
                         : (prev1 < Q_PREV1_FULL - 1 ? prev1
                                                     : Q_PREV1_FULL - 1);
        ctx = pb * (uint32_t)(Q_PREV1_FULL + 1) + pq;
    }
    return valid ? ctx + 1u : 0u;
}

/* sym/ctx grids + (ctx, sym) histogram in one pass.
 * qual [B*L] u8, lengths [B] i64 -> sym [B*L] u8, ctx [B*L] u16,
 * counts [n_ctx*94] i64 (caller zeroes counts). */
EXPORT void qual_sym_ctx_hist(const uint8_t *qual, const int64_t *lengths,
                              int64_t B, int64_t L, int64_t order,
                              uint8_t *sym, uint16_t *ctx, int64_t *counts)
{
    for (int64_t i = 0; i < B; i++) {
        int64_t len = lengths[i];
        const uint8_t *qrow = qual + i * L;
        uint8_t *srow = sym + i * L;
        uint16_t *crow = ctx + i * L;
        uint32_t prev1 = 0, prev2 = 0;
        for (int64_t col = 0; col < L; col++) {
            int valid = col < len;
            int v = (int)qrow[col] - Q_OFFSET;
            if (v < 0) v = 0;
            if (v > Q_NSYMS - 1) v = Q_NSYMS - 1;
            uint32_t s = valid ? (uint32_t)v : 0u;
            uint32_t pb = q_pb(col, (int)order);
            uint32_t c = q_ctx(prev1, prev2, pb, col == 0, col == 1,
                               valid, (int)order);
            srow[col] = (uint8_t)s;
            crow[col] = (uint16_t)c;
            counts[(int64_t)c * Q_NSYMS + s]++;
            prev2 = prev1;
            prev1 = s;
        }
    }
}

/* Interleaved-lane rANS encode over lane-major (sym, ctx).
 * N lanes of T symbols; lane n owns span [n*T, (n+1)*T).
 * freq/cum: u32 [n_ctx*94].  Outputs: states u32 [N], wcounts i64 [N],
 * words_cat u16 (capacity N*T, actual sum(wcounts), per-lane streams
 * concatenated in decode order).  Returns total word count. */
EXPORT int64_t rans_encode_lanes(const uint8_t *sym, const uint16_t *ctx,
                                 const uint32_t *freq, const uint32_t *cum,
                                 int64_t N, int64_t T, int64_t n_syms,
                                 uint32_t *states,
                                 int64_t *wcounts, uint16_t *words_cat)
{
    int64_t off = 0;
    /* heap: long-read mode runs T = L > 32768 (one alloc per block) */
    uint16_t *tmp = (uint16_t *)malloc((size_t)T * 2);
    if (!tmp)
        return -1;
    for (int64_t n = 0; n < N; n++) {
        const uint8_t *s = sym + n * T;
        const uint16_t *c = ctx + n * T;
        uint32_t x = RANS_LOW;
        int64_t cnt = 0;
        for (int64_t t = T - 1; t >= 0; t--) {
            uint32_t f = freq[(int64_t)c[t] * n_syms + s[t]];
            uint32_t cm = cum[(int64_t)c[t] * n_syms + s[t]];
            if ((x >> 20) >= f) {
                tmp[cnt++] = (uint16_t)(x & 0xFFFFu);
                x >>= 16;
            }
            uint32_t q = x / f;
            uint32_t r = x - q * f;
            x = (q << RANS_PROB_BITS) + r + cm;
        }
        states[n] = x;
        wcounts[n] = cnt;
        for (int64_t j = 0; j < cnt; j++)       /* decode order */
            words_cat[off + j] = tmp[cnt - 1 - j];
        off += cnt;
    }
    free(tmp);
    return off;
}

/* Interleaved-lane rANS decode back to the quality grid.
 * decode_lut: u32 [n_ctx*4096], entry = sym<<24 | (freq-1)<<12 | cum.
 * words_cat/wcounts as produced by rans_encode_lanes; lengths [B] i64.
 * Writes qual u8 [B*L] (0 past each read's length). */
EXPORT void rans_decode_lanes(const uint32_t *states,
                              const uint16_t *words_cat,
                              const int64_t *wcounts,
                              const uint32_t *decode_lut,
                              const int64_t *lengths, int64_t B, int64_t L,
                              int64_t T, int64_t order, uint8_t *qual)
{
    int64_t N = (B * L) / T;
    int64_t k = T / L;
    int64_t woff = 0;
    for (int64_t n = 0; n < N; n++) {
        uint32_t x = states[n];
        const uint16_t *w = words_cat + woff;
        int64_t wend = wcounts[n];
        int64_t wp = 0;
        uint32_t prev1 = 0, prev2 = 0;
        for (int64_t t = 0; t < T; t++) {
            int64_t read = n * k + t / L;
            int64_t col = t % L;
            if (col >= lengths[read]) {
                /* padding: the encoder's full-mass ctx-0 step left the
                 * state untouched and emitted nothing — mirror-skip.
                 * prev1/prev2 go stale but cols 0/1 of the next row
                 * override them (q_ctx c0/c1 sentinels). */
                qual[read * L + col] = 0u;
                continue;
            }
            uint32_t pb = q_pb(col, (int)order);
            uint32_t c = q_ctx(prev1, prev2, pb, col == 0, col == 1,
                               1, (int)order);
            uint32_t slot = x & (RANS_M - 1);
            uint32_t e = decode_lut[(int64_t)c * RANS_M + slot];
            uint32_t s = e >> 24;
            uint32_t f = ((e >> RANS_PROB_BITS) & (RANS_M - 1)) + 1u;
            uint32_t cm = e & (RANS_M - 1);
            x = f * (x >> RANS_PROB_BITS) + slot - cm;
            if (x < RANS_LOW) {
                uint32_t word = wp < wend ? w[wp] : 0u;  /* corrupt-safe */
                x = (x << 16) | word;
                wp++;
            }
            qual[read * L + col] = (uint8_t)(s + Q_OFFSET);
            prev2 = prev1;
            prev1 = s;
        }
        woff += wend;
    }
}

/* ---- host placement of the core matcher + bucket sort ---------------
 *
 * Bit-identical mirror of ops/core_match.find_cores_canonical +
 * build_sort_keys + the stable multi-key sort (pinned by test), for
 * links too slow to ship blocks to the accelerator at all — the third
 * placement knob after the quality codec and the delta match.  The
 * reference is pure host C for this stage [SURVEY.md §4.1 hot loop #1];
 * here it is the fallback, not the design center.
 */

static inline uint32_t mix32_c(uint32_t x, uint32_t seed)
{
    x ^= seed;
    x ^= x >> 16;
    x *= 0x85EBCA6Bu;
    x ^= x >> 13;
    x *= 0xC2B2AE35u;
    return x ^ (x >> 16);
}

static inline uint32_t revcomp_kmer_c(uint32_t v, int64_t k)
{
    v = ~v;
    v = ((v & 0x33333333u) << 2) | ((v >> 2) & 0x33333333u);
    v = ((v & 0x0F0F0F0Fu) << 4) | ((v >> 4) & 0x0F0F0F0Fu);
    v = ((v & 0x00FF00FFu) << 8) | ((v >> 8) & 0x00FF00FFu);
    v = (v << 16) | (v >> 16);
    return v >> (32 - 2 * k);
}

typedef struct {
    uint32_t key0, s0, s1;
    uint32_t row;        /* n < 2^26 by config; 16-byte recs cut the
                            radix passes' memory traffic by a third */
} sort_rec;

static int sort_rec_cmp(const void *pa, const void *pb)
{
    const sort_rec *a = (const sort_rec *)pa;
    const sort_rec *b = (const sort_rec *)pb;
    if (a->key0 != b->key0) return a->key0 < b->key0 ? -1 : 1;
    if (a->s0 != b->s0) return a->s0 < b->s0 ? -1 : 1;
    if (a->s1 != b->s1) return a->s1 < b->s1 ? -1 : 1;
    return a->row < b->row ? -1 : 1;       /* stability */
}

#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
/* SIMD 2-bit pack: bases (u8 0..3) -> big-endian u32 words, 16 bases
 * per word, zeros past len (identical layout to the scalar acc loop in
 * build_sort_keys / ops.bitops.pack_bases_u32). */
static inline void pack_row_be(const uint8_t *row, int64_t len,
                               uint32_t *wbuf, int64_t nw)
{
    /* output byte j (word q = j/4, byte b = j%4, little-endian) takes
     * the 8-bit packed quad at i32 lane 4q + (3 - b) */
    static const uint8_t pidx_b[64] = {
        12, 8, 4, 0, 28, 24, 20, 16, 44, 40, 36, 32, 60, 56, 52, 48,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
    const __m512i pidx = _mm512_loadu_si512(pidx_b);
    for (int64_t q = 0; q < nw; q += 4) {
        int64_t rem = len - q * 16;
        __mmask64 m = rem >= 64 ? ~0ULL
                                : ((1ULL << (rem > 0 ? rem : 0)) - 1);
        __m512i in = _mm512_maskz_loadu_epi8(m, row + q * 16);
        /* pairs: b0*4 + b1 (big-endian pair), then quads: p0*16 + p1 */
        __m512i t1 = _mm512_maddubs_epi16(in, _mm512_set1_epi16(0x0104));
        __m512i t2 = _mm512_madd_epi16(t1, _mm512_set1_epi32(0x00010010));
        __m512i g = _mm512_permutexvar_epi8(pidx, t2);
        int64_t wrem = nw - q;
        if (wrem >= 4) {
            _mm_storeu_si128((__m128i *)(wbuf + q),
                             _mm512_castsi512_si128(g));
        } else {
            uint32_t tmp[4];
            _mm_storeu_si128((__m128i *)tmp, _mm512_castsi512_si128(g));
            for (int64_t t = 0; t < wrem; t++)
                wbuf[q + t] = tmp[t];
        }
    }
}

/* Funnel-shift k-mer extraction off the packed words: 16 positions per
 * word via per-lane u64 shifts, and the RC k-mers as a vectorized
 * revcomp of the forward ones (rkv[p] == revcomp_kmer_c(kmv[p], k)).
 * Replaces the serial rolling-hash chain (~12 of the matcher's
 * ~36 ms/block was that 2-cycle loop-carried dependency).  Writes in
 * 16-lane blocks — callers pad kmv/rkv by 16 and wbuf by 2 words. */
/* mix32_c, 16 lanes at once (identical constants / stage order) */
static inline __m512i mix32_v(__m512i x, __m512i vseed)
{
    x = _mm512_xor_si512(x, vseed);
    x = _mm512_xor_si512(x, _mm512_srli_epi32(x, 16));
    x = _mm512_mullo_epi32(x, _mm512_set1_epi32((int)0x85EBCA6Bu));
    x = _mm512_xor_si512(x, _mm512_srli_epi32(x, 13));
    x = _mm512_mullo_epi32(x, _mm512_set1_epi32((int)0xC2B2AE35u));
    return _mm512_xor_si512(x, _mm512_srli_epi32(x, 16));
}

/* fused canonical argmin: per-lane running (min rank, q index) for
 * both strands, folded into the extraction loop.  The separate
 * two-pass argmin (min-reduce + eq-rescan with its mispredicting
 * early-break) cost ~18 Mcycles per 131k-row block — as much as the
 * radix sort.  Outputs feed the cross-lane tie-break reduction in
 * core_match_block; exception rows ignore them and redo the masked
 * two-pass walk on the stored rank arrays (rare). */
static inline void kmer_extract_v(const uint32_t *wbuf, int64_t P,
                                  int64_t k, uint32_t kmask,
                                  uint32_t seed,
                                  uint32_t *kmv, uint32_t *rkv,
                                  uint32_t *rfv, uint32_t *rrv,
                                  __m512i *minf_o, __m512i *idxf_o,
                                  __m512i *minr_o, __m512i *idxr_o)
{
    const __m512i vseed = _mm512_set1_epi32((int)seed);
    __m512i minf = _mm512_set1_epi32(-1), idxf = _mm512_setzero_si512();
    __m512i minr = _mm512_set1_epi32(-1), idxr = _mm512_setzero_si512();
    long long base = 64 - 2 * k;
    const __m512i sh_lo = _mm512_setr_epi64(base, base - 2, base - 4,
                                            base - 6, base - 8, base - 10,
                                            base - 12, base - 14);
    const __m512i sh_hi = _mm512_sub_epi64(sh_lo, _mm512_set1_epi64(16));
    const __m512i vkmask = _mm512_set1_epi32((int)kmask);
    const __m512i m2 = _mm512_set1_epi32(0x33333333);
    const __m512i m4 = _mm512_set1_epi32(0x0F0F0F0F);
    const __m512i m8 = _mm512_set1_epi32(0x00FF00FF);
    const unsigned rc_sh = (unsigned)(32 - 2 * k);
    for (int64_t q = 0; q * 16 < P; q++) {
        uint64_t v = ((uint64_t)wbuf[q] << 32) | wbuf[q + 1];
        __m512i vv = _mm512_set1_epi64((long long)v);
        __m256i lo = _mm512_cvtepi64_epi32(_mm512_srlv_epi64(vv, sh_lo));
        __m256i hi = _mm512_cvtepi64_epi32(_mm512_srlv_epi64(vv, sh_hi));
        __m512i kk = _mm512_inserti64x4(_mm512_castsi256_si512(lo), hi, 1);
        kk = _mm512_and_si512(kk, vkmask);
        _mm512_storeu_si512(kmv + q * 16, kk);
        /* revcomp_kmer_c, 16 lanes at once */
        __m512i x = _mm512_xor_si512(kk, _mm512_set1_epi32(-1));
        x = _mm512_or_si512(
            _mm512_slli_epi32(_mm512_and_si512(x, m2), 2),
            _mm512_and_si512(_mm512_srli_epi32(x, 2), m2));
        x = _mm512_or_si512(
            _mm512_slli_epi32(_mm512_and_si512(x, m4), 4),
            _mm512_and_si512(_mm512_srli_epi32(x, 4), m4));
        x = _mm512_or_si512(
            _mm512_slli_epi32(_mm512_and_si512(x, m8), 8),
            _mm512_and_si512(_mm512_srli_epi32(x, 8), m8));
        x = _mm512_or_si512(_mm512_slli_epi32(x, 16),
                            _mm512_srli_epi32(x, 16));
        x = _mm512_srli_epi32(x, (int)rc_sh);
        _mm512_storeu_si512(rkv + q * 16, x);
        /* ranks fused in (one pass through L1 instead of three) */
        __m512i rf = mix32_v(kk, vseed);
        __m512i rr = mix32_v(x, vseed);
        _mm512_storeu_si512(rfv + q * 16, rf);
        _mm512_storeu_si512(rrv + q * 16, rr);
        /* running argmin, tail lanes (>= P) masked out.  Forward:
         * strict < keeps the EARLIEST q per lane; RC: <= keeps the
         * LATEST — the scalar tie rules, per lane. */
        int64_t rem = P - q * 16;
        __mmask16 lm = rem >= 16 ? (__mmask16)0xFFFF
                                 : (__mmask16)((1u << rem) - 1);
        const __m512i qv = _mm512_set1_epi32((int)q);
        __mmask16 ltf = _mm512_mask_cmp_epu32_mask(lm, rf, minf,
                                                   _MM_CMPINT_LT);
        minf = _mm512_mask_mov_epi32(minf, ltf, rf);
        idxf = _mm512_mask_mov_epi32(idxf, ltf, qv);
        __mmask16 ler = _mm512_mask_cmp_epu32_mask(lm, rr, minr,
                                                   _MM_CMPINT_LE);
        minr = _mm512_mask_mov_epi32(minr, ler, rr);
        idxr = _mm512_mask_mov_epi32(idxr, ler, qv);
    }
    *minf_o = minf;
    *idxf_o = idxf;
    *minr_o = minr;
    *idxr_o = idxr;
}

/* 64-bit window of packed bases starting at base index ``pos``:
 * base pos at the TOP 2 bits (the pack is big-endian within each
 * u32 word).  Needs wbuf[] valid through index pos/16 + 2 (callers
 * zero-pad two words past nw). */
static inline uint64_t window64(const uint32_t *wbuf, int64_t pos)
{
    int64_t q = pos >> 4;
    int r2 = (int)((pos & 15) << 1);
    uint64_t v = ((uint64_t)wbuf[q] << 32) | wbuf[q + 1];
    if (r2)
        v = (v << r2) | ((uint64_t)wbuf[q + 2] >> (32 - r2));
    return v;
}

/* revcomp of a 32-base packed window (2-bit groups, whole u64) */
static inline uint64_t revcomp64(uint64_t v)
{
    v = ~v;
    v = ((v & 0x3333333333333333ULL) << 2)
        | ((v >> 2) & 0x3333333333333333ULL);
    v = ((v & 0x0F0F0F0F0F0F0F0FULL) << 4)
        | ((v >> 4) & 0x0F0F0F0F0F0F0F0FULL);
    v = ((v & 0x00FF00FF00FF00FFULL) << 8)
        | ((v >> 8) & 0x00FF00FF00FF00FFULL);
    v = ((v & 0x0000FFFF0000FFFFULL) << 16)
        | ((v >> 16) & 0x0000FFFF0000FFFFULL);
    return (v << 32) | (v >> 32);
}
#endif

/* LSD 16-bit radix over (key0, s0, s1); stable, and rows enter in
 * ascending order, so ties come out row-ascending — the same total
 * order as sort_rec_cmp.  qsort paid ~2.2M comparator calls per
 * 131k-row block (~30 ms); six counting passes (with a one-histogram
 * prepass and degenerate-digit skipping) run at memory speed. */
static void radix_sort_recs(sort_rec *recs, int64_t n)
{
    if (n < 4096) {              /* counter setup dominates tiny blocks */
        qsort(recs, (size_t)n, sizeof(sort_rec), sort_rec_cmp);
        return;
    }
    enum { NPASS = 6 };
    uint32_t *cnt = (uint32_t *)calloc((size_t)NPASS << 16, 4);
    sort_rec *aux = (sort_rec *)malloc((size_t)n * sizeof(sort_rec));
    if (!cnt || !aux) {
        free(cnt);
        free(aux);
        qsort(recs, (size_t)n, sizeof(sort_rec), sort_rec_cmp);
        return;
    }
    for (int64_t i = 0; i < n; i++) {
        const sort_rec *r = recs + i;
        cnt[(0 << 16) + (r->s1 & 0xFFFF)]++;
        cnt[(1 << 16) + (r->s1 >> 16)]++;
        cnt[(2 << 16) + (r->s0 & 0xFFFF)]++;
        cnt[(3 << 16) + (r->s0 >> 16)]++;
        cnt[(4 << 16) + (r->key0 & 0xFFFF)]++;
        cnt[(5 << 16) + (r->key0 >> 16)]++;
    }
    sort_rec *src = recs, *dst = aux;
    for (int p = 0; p < NPASS; p++) {
        uint32_t *c = cnt + ((size_t)p << 16);
        uint32_t sum = 0;
        int degenerate = 0;
        for (int64_t d = 0; d < 65536; d++) {
            uint32_t v = c[d];
            if (v == (uint32_t)n)
                degenerate = 1;
            c[d] = sum;
            sum += v;
        }
        if (degenerate)
            continue;            /* every key shares this digit */
        for (int64_t i = 0; i < n; i++) {
            const sort_rec *r = src + i;
            uint32_t dgt;
            switch (p) {
            case 0: dgt = r->s1 & 0xFFFF; break;
            case 1: dgt = r->s1 >> 16; break;
            case 2: dgt = r->s0 & 0xFFFF; break;
            case 3: dgt = r->s0 >> 16; break;
            case 4: dgt = r->key0 & 0xFFFF; break;
            default: dgt = r->key0 >> 16; break;
            }
            dst[c[dgt]++] = *r;
        }
        sort_rec *t = src;
        src = dst;
        dst = t;
    }
    if (src != recs)
        memcpy(recs, src, (size_t)n * sizeof(sort_rec));
    free(cnt);
    free(aux);
}

/* Canonical core selection + bucket sort over the first n rows.
 * codes [>=n, L] u8 (0..3, original orientation); exc_pos: sorted flat
 * positions (row*L + col) of non-ACGT bases.  Outputs (ORIGINAL row
 * order): ck u32, cp i32, rc u8; perm [n] = sorted row order.
 * Tie-breaks mirror the XLA path exactly: forward argmin keeps the
 * FIRST position, the RC strand keeps the LAST forward position
 * (= first in the RC frame); NO_CORE rows sort after every core.
 * Returns 0, or -1 on allocation failure. */
EXPORT int64_t core_match_block(const uint8_t *codes,
                                const int64_t *lengths,
                                const int64_t *exc_pos, int64_t n_exc,
                                int64_t n, int64_t L, int64_t k,
                                uint32_t seed,
                                uint32_t *ck, int32_t *cp, uint8_t *rc,
                                int64_t *perm)
{
    const uint32_t NO_CORE = 0xFFFFFFFFu;
    const uint32_t kmask = (uint32_t)((k == 16) ? 0xFFFFFFFFu
                                                : ((1u << (2 * k)) - 1u));
    sort_rec *recs = (sort_rec *)malloc((size_t)n * sizeof(sort_rec));
    uint8_t *excrow = (uint8_t *)calloc((size_t)L, 1);
    if (!recs || !excrow) {
        free(recs);
        free(excrow);
        return -1;
    }
    int64_t ei = 0;                        /* cursor into sorted exc_pos */
    for (int64_t i = 0; i < n; i++) {
        int64_t len = lengths[i];
        const uint8_t *row = codes + i * L;
        /* exception flags for this row (rare: fast path = none) */
        int64_t e0 = ei;
        while (ei < n_exc && exc_pos[ei] < (i + 1) * L)
            ei++;
        int has_exc = ei > e0;
        if (has_exc)
            for (int64_t e = e0; e < ei; e++)
                excrow[exc_pos[e] - i * L] = 1;

        uint32_t best_f = NO_CORE, best_r = NO_CORE;
        int64_t pos_f = 0, pos_r = 0;
        uint32_t kf = 0, kr = 0;
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
        uint32_t wbuf[2048 + 4];        /* ceil(32752/16) + funnel pad;
                                           reused by the sort-key build */
        int have_pack = 0;
#endif
        if (len >= k) {
            int64_t P = len - k + 1;
            /* one fused SIMD pass: k-mers of both strands off the
             * packed words + their mix32 ranks (the separate rank
             * passes re-read kmv/rkv through L1 for nothing); then
             * two-pass SIMD argmin with the XLA tie rules.  Scratch
             * lives row-local (L1/L2). */
            uint32_t kmv[32768 + 16], rkv[32768 + 16];  /* L <= 32752;
                                  +16: kmer_extract_v stores whole
                                  16-lane blocks */
            uint32_t rfv[32768 + 16], rrv[32768 + 16];
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
            __m512i am_minf, am_idxf, am_minr, am_idxr;
            {
                int64_t nw = (len + 15) / 16;
                pack_row_be(row, len, wbuf, nw);
                wbuf[nw] = 0;                   /* funnel tail window */
                wbuf[nw + 1] = 0;
                wbuf[nw + 2] = 0;               /* window64 overreach */
                kmer_extract_v(wbuf, P, k, kmask, seed,
                               kmv, rkv, rfv, rrv,
                               &am_minf, &am_idxf, &am_minr, &am_idxr);
                have_pack = 1;
            }
#else
            uint32_t km = 0, rkm = 0;
            int shift_top = (int)(2 * (k - 1));
            for (int64_t j = 0; j < k - 1; j++) {
                km = ((km << 2) | row[j]) & kmask;
                rkm = (rkm >> 2) | ((uint32_t)(3 - row[j]) << shift_top);
            }
            for (int64_t j = k - 1; j < len; j++) {
                km = ((km << 2) | row[j]) & kmask;
                rkm = (rkm >> 2) | ((uint32_t)(3 - row[j]) << shift_top);
                kmv[j - k + 1] = km;
                rkv[j - k + 1] = rkm;
            }
            for (int64_t p = 0; p < P; p++)
                rfv[p] = mix32_c(kmv[p], seed);
            for (int64_t p = 0; p < P; p++)
                rrv[p] = mix32_c(rkv[p], seed);
#endif
            if (has_exc) {                  /* mask N-touching windows */
                int64_t exc_in_win = 0;
                for (int64_t j = 0; j < len; j++) {
                    exc_in_win += excrow[j];
                    if (j - k >= 0)
                        exc_in_win -= excrow[j - k];
                    if (j >= k - 1 && exc_in_win) {
                        rfv[j - k + 1] = NO_CORE;
                        rrv[j - k + 1] = NO_CORE;
                    }
                }
            }
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
            if (!has_exc) {
                /* cross-lane tie-break of the fused per-lane argmins
                 * as ONE lexicographic u64 min per strand:
                 * key = rank * 2^20 + pos (fwd: smallest pos of the
                 * min rank) / rank * 2^20 + (2^20-1 - pos) (rc:
                 * LARGEST pos) — the scalar rules.  Four generic
                 * reduce_min/mask_reduce chains here cost ~100
                 * cycles/row; two epu64 reduces cost ~25.  Exception
                 * rows fall through to the masked two-pass walk below
                 * (their ranks were overwritten AFTER extraction). */
                const __m512i lane_iota = _mm512_setr_epi32(
                    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                    15);
                const __m512i pmask = _mm512_set1_epi64(0xFFFFF);
                __m512i posf = _mm512_add_epi32(
                    _mm512_slli_epi32(am_idxf, 4), lane_iota);
                __m512i posr = _mm512_add_epi32(
                    _mm512_slli_epi32(am_idxr, 4), lane_iota);
                __m512i kf_lo = _mm512_or_si512(
                    _mm512_slli_epi64(_mm512_cvtepu32_epi64(
                        _mm512_castsi512_si256(am_minf)), 20),
                    _mm512_cvtepu32_epi64(
                        _mm512_castsi512_si256(posf)));
                __m512i kf_hi = _mm512_or_si512(
                    _mm512_slli_epi64(_mm512_cvtepu32_epi64(
                        _mm512_extracti64x4_epi64(am_minf, 1)), 20),
                    _mm512_cvtepu32_epi64(
                        _mm512_extracti64x4_epi64(posf, 1)));
                uint64_t keyf = _mm512_reduce_min_epu64(
                    _mm512_min_epu64(kf_lo, kf_hi));
                /* 0xFFFFF - pos == pos ^ 0xFFFFF for pos < 2^20 */
                __m512i kr_lo = _mm512_or_si512(
                    _mm512_slli_epi64(_mm512_cvtepu32_epi64(
                        _mm512_castsi512_si256(am_minr)), 20),
                    _mm512_xor_si512(
                        _mm512_cvtepu32_epi64(
                            _mm512_castsi512_si256(posr)), pmask));
                __m512i kr_hi = _mm512_or_si512(
                    _mm512_slli_epi64(_mm512_cvtepu32_epi64(
                        _mm512_extracti64x4_epi64(am_minr, 1)), 20),
                    _mm512_xor_si512(
                        _mm512_cvtepu32_epi64(
                            _mm512_extracti64x4_epi64(posr, 1)), pmask));
                uint64_t keyr = _mm512_reduce_min_epu64(
                    _mm512_min_epu64(kr_lo, kr_hi));
                if ((keyf >> 20) != (uint64_t)NO_CORE) {
                    best_f = (uint32_t)(keyf >> 20);
                    pos_f = (int64_t)(keyf & 0xFFFFF);
                    kf = kmv[pos_f];
                }
                if ((keyr >> 20) != (uint64_t)NO_CORE) {
                    best_r = (uint32_t)(keyr >> 20);
                    pos_r = (int64_t)(0xFFFFF - (keyr & 0xFFFFF));
                    kr = rkv[pos_r];
                }
            } else
#endif
#if defined(__AVX512F__)
            /* two-pass SIMD argmin: the scalar loop's data-dependent
             * branches mispredict on (hashed) random ranks — ~30 of
             * the matcher's ~65 ms/block.  Pass 1 min-reduces; pass 2
             * finds the FIRST (fwd) / LAST (rc) position of the min —
             * exactly the scalar tie rules. */
            {
                const __m512i vnc = _mm512_set1_epi32(-1); /* NO_CORE */
                __m512i mf = vnc, mr = vnc;
                for (int64_t p = 0; p < P; p += 16) {
                    __mmask16 lm = P - p >= 16
                        ? (__mmask16)0xFFFF
                        : (__mmask16)((1u << (P - p)) - 1);
                    mf = _mm512_mask_min_epu32(
                        mf, lm, mf, _mm512_maskz_loadu_epi32(lm, rfv + p));
                    mr = _mm512_mask_min_epu32(
                        mr, lm, mr, _mm512_maskz_loadu_epi32(lm, rrv + p));
                }
                /* mask_min updates live lanes only, so the maskz
                 * loads' zeroed tail lanes never contaminate the min
                 * (dead lanes stay at the NO_CORE init) */
                uint32_t minf = _mm512_reduce_min_epu32(mf);
                uint32_t minr = _mm512_reduce_min_epu32(mr);
                if (minf != NO_CORE) {
                    best_f = minf;
                    __m512i t = _mm512_set1_epi32((int)minf);
                    for (int64_t p = 0; p < P; p += 16) {
                        __mmask16 lm = P - p >= 16
                            ? (__mmask16)0xFFFF
                            : (__mmask16)((1u << (P - p)) - 1);
                        __mmask16 eq = _mm512_mask_cmpeq_epu32_mask(
                            lm, _mm512_maskz_loadu_epi32(lm, rfv + p), t);
                        if (eq) {          /* first occurrence wins */
                            pos_f = p + __builtin_ctz(eq);
                            break;
                        }
                    }
                    kf = kmv[pos_f];
                }
                if (minr != NO_CORE) {
                    best_r = minr;
                    __m512i t = _mm512_set1_epi32((int)minr);
                    for (int64_t p = (P - 1) & ~(int64_t)15; p >= 0;
                         p -= 16) {
                        __mmask16 lm = P - p >= 16
                            ? (__mmask16)0xFFFF
                            : (__mmask16)((1u << (P - p)) - 1);
                        __mmask16 eq = _mm512_mask_cmpeq_epu32_mask(
                            lm, _mm512_maskz_loadu_epi32(lm, rrv + p), t);
                        if (eq) {          /* LAST forward pos wins */
                            pos_r = p + 31 - __builtin_clz(eq);
                            break;
                        }
                    }
                    kr = rkv[pos_r];
                }
            }
#else
            for (int64_t p = 0; p < P; p++) {
                uint32_t rf = rfv[p];
                /* rank == NO_CORE aliases the sentinel; the XLA path
                 * has the same (vanishing) aliasing */
                if (rf < best_f) {
                    best_f = rf;
                    pos_f = p;
                    kf = kmv[p];
                }
                uint32_t rr = rrv[p];
                if (rr <= best_r && rr != NO_CORE) {
                    best_r = rr;           /* <=: LAST forward pos wins */
                    pos_r = p;
                    kr = rkv[p];
                }
            }
#endif
        }
        if (has_exc)
            for (int64_t e = e0; e < ei; e++)
                excrow[exc_pos[e] - i * L] = 0;

        int use_rc = best_r < best_f;
        uint32_t best = use_rc ? best_r : best_f;
        if (best == NO_CORE) {
            ck[i] = NO_CORE;
            cp[i] = 0;
            rc[i] = 0;
        } else {
            ck[i] = use_rc ? kr : kf;
            cp[i] = (int32_t)(use_rc ? (len - k - pos_r) : pos_f);
            rc[i] = (uint8_t)use_rc;
        }
        /* sort keys: oriented bases cp..cp+31, 16 per u32, big-endian,
         * zero past len — mirrors build_sort_keys */
        uint32_t s[2] = {0, 0};
        int64_t cpos = cp[i];
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
        if (have_pack) {
            /* funnel windows off the packed words instead of a 32-step
             * scalar base loop.  Forward: bases cp..cp+31 verbatim
             * (pack is zero past len).  RC: the oriented window is the
             * revcomp of forward bases [len-cp-32, len-cp); when that
             * start underflows (cp > len-32) only m = len-cp oriented
             * bases exist — revcomp the [0,32) window and left-align
             * its m meaningful bases, zero-filling the tail exactly
             * like the scalar idx >= len rule. */
            uint64_t s64;
            if (!rc[i]) {
                s64 = window64(wbuf, cpos);
            } else {
                int64_t start = len - cpos - 32;
                if (start >= 0)
                    s64 = revcomp64(window64(wbuf, start));
                else
                    s64 = revcomp64(window64(wbuf, 0))
                          << (2 * (32 - (len - cpos)));
            }
            s[0] = (uint32_t)(s64 >> 32);
            s[1] = (uint32_t)s64;
        } else
#endif
        {
            for (int64_t w = 0; w < 2; w++) {
                uint32_t acc = 0;
                for (int64_t b = 0; b < 16; b++) {
                    int64_t idx = cpos + 16 * w + b;
                    uint32_t code = 0;
                    if (idx < len)
                        code = rc[i] ? (uint32_t)(3 - row[len - 1 - idx])
                                     : (uint32_t)row[idx];
                    acc = (acc << 2) | code;
                }
                s[w] = acc;
            }
        }
        recs[i].key0 = ck[i];
        recs[i].s0 = s[0];
        recs[i].s1 = s[1];
        recs[i].row = (uint32_t)i;
    }
    radix_sort_recs(recs, n);
    for (int64_t i = 0; i < n; i++)
        perm[i] = (int64_t)recs[i].row;
    free(excrow);
    free(recs);
    return 0;
}

/* Two-level rANS decode tables: the flat slot->entry LUT is
 * C * 4096 * 4B (~12.5 MB for order-1 quality contexts) — bigger than
 * cache, so every decoded symbol was a DRAM-latency load, and the numpy
 * build itself cost 100s of ms/block.  Instead: a coarse u8 symbol per
 * 16-slot bucket (C * 256 = ~195 KB) + the u16 freq/cum rows
 * (~143 KB each); the true symbol is the bucket's symbol advanced past
 * at most a few cum entries.  Everything stays L2-resident. */
EXPORT void build_sym8(const uint16_t *cum, int64_t C, int64_t n_syms,
                       uint8_t *sym8)
{
    for (int64_t c = 0; c < C; c++) {
        const uint16_t *cr = cum + c * n_syms;
        int64_t s = 0;
        for (int64_t b = 0; b < 256; b++) {
            int64_t slot = b << 4;
            while (s + 1 < n_syms && cr[s + 1] <= slot)
                s++;
            sym8[c * 256 + b] = (uint8_t)s;
        }
    }
}

EXPORT void rans_decode_lanes2(const uint32_t *states,
                               const uint16_t *words_cat,
                               const int64_t *wcounts,
                               const uint8_t *sym8,
                               const uint16_t *freq, const uint16_t *cum,
                               const int64_t *lengths, int64_t B,
                               int64_t L, int64_t T, int64_t order,
                               uint8_t *qual)
{
    int64_t N = (B * L) / T;
    int64_t k = T / L;
    /* 4-way lane interleave: each lane's state chain is serial, but
     * lanes are independent — processing them in lockstep hides the
     * divide/renorm latency exactly like the encoder.  Lane word
     * streams start at the prefix sums of wcounts. */
    enum { IL = 4 };
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        uint32_t x[IL];
        const uint16_t *w[IL];
        int64_t wp[IL], wend[IL];
        uint32_t p1v[IL], p2v[IL];
        {
            int64_t off = 0;
            for (int64_t m = 0; m < n0; m++)
                off += wcounts[m];
            for (int j = 0; j < nl; j++) {
                x[j] = states[n0 + j];
                w[j] = words_cat + off;
                off += wcounts[n0 + j];
                wend[j] = wcounts[n0 + j];
                wp[j] = 0;
                p1v[j] = 0;
                p2v[j] = 0;
            }
        }
        for (int64_t t = 0; t < T; t++) {
            int64_t r_off = t / L;
            int64_t col = t % L;
            uint32_t pb = q_pb(col, (int)order);
            for (int j = 0; j < nl; j++) {
                int64_t read = (n0 + j) * k + r_off;
                if (col >= lengths[read]) { /* padding: exact no-op */
                    qual[read * L + col] = 0u;
                    continue;
                }
                uint32_t c = q_ctx(p1v[j], p2v[j], pb, col == 0,
                                   col == 1, 1, (int)order);
                uint32_t xj = x[j];
                uint32_t slot = xj & (RANS_M - 1);
                const uint16_t *cr = cum + (int64_t)c * Q_NSYMS;
                uint32_t s = sym8[(int64_t)c * 256 + (slot >> 4)];
                while (s + 1 < Q_NSYMS && cr[s + 1] <= slot)
                    s++;
                uint32_t f = freq[(int64_t)c * Q_NSYMS + s];
                xj = f * (xj >> RANS_PROB_BITS) + slot - cr[s];
                if (xj < RANS_LOW) {
                    uint32_t word = wp[j] < wend[j] ? w[j][wp[j]]
                                                    : 0u;  /* corrupt-safe */
                    xj = (xj << 16) | word;
                    wp[j]++;
                }
                x[j] = xj;
                qual[read * L + col] = (uint8_t)(s + Q_OFFSET);
                p2v[j] = p1v[j];
                p1v[j] = s;
            }
        }
    }
}

/* Aligned-predecessor delta match over the SORTED block — the host
 * placement of pipeline/encode.py::_delta_seq (best-of-K predecessor,
 * strict ">" so the nearest candidate wins ties, identical literal
 * order).  Byte-identical outputs to the device path are pinned by
 * tests; keeping both lets the pipeline place this stage by link
 * bandwidth, like the quality codec.
 *
 * codes [n, L] u8 (2-bit values), ck u32 [n] core ids (0xffffffff =
 * no core), cp i32 [n] core positions, lens i64 [n].
 * Outputs: mask_bits u8 [n, L/8] (LSB-first), shifts i16 [n],
 * pred_k u8 [n], lits u8 [<= sum(lens)].  Returns n_lits. */
EXPORT int64_t delta_match(const uint8_t *codes, const uint32_t *ck,
                           const int32_t *cp, const int64_t *lens,
                           int64_t n, int64_t L, int64_t K,
                           uint8_t *mask_bits, int16_t *shifts,
                           uint8_t *pred_k, uint8_t *lits)
{
    const uint32_t NO_CORE = 0xFFFFFFFFu;
    int64_t stride = L / 8;
    int64_t n_lits = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t len_i = lens[i];
        const uint8_t *ci = codes + i * L;
        int32_t best_count = -1, best_shift = 0, best_k = 0;
        if (ck[i] != NO_CORE) {
            for (int64_t k = 1; k <= K && k <= i; k++) {
                int64_t j = i - k;
                if (ck[j] != ck[i])
                    continue;                /* device: cnt = -1 */
                int32_t sh = cp[j] - cp[i];
                /* overlap where 0 <= col < len_i and 0 <= col+sh < len_j */
                int64_t c0 = sh < 0 ? -sh : 0;
                int64_t c1 = lens[j] - sh < len_i ? lens[j] - sh : len_i;
                int32_t cnt = 0;
                const uint8_t *cj = codes + j * L + sh;
                for (int64_t col = c0; col < c1; col++)
                    cnt += ci[col] == cj[col];
                if (cnt > best_count) {
                    best_count = cnt;
                    best_shift = sh;
                    best_k = (int32_t)(k - 1);
                }
            }
        }
        shifts[i] = (int16_t)best_shift;
        pred_k[i] = (uint8_t)best_k;
        uint8_t *mb = mask_bits + i * stride;
        memset(mb, 0, (size_t)stride);
        if (best_count < 0) {                /* whole row is literal */
            for (int64_t col = 0; col < len_i; col++)
                lits[n_lits++] = ci[col];
            continue;
        }
        int64_t j = i - 1 - best_k;
        int64_t c0 = best_shift < 0 ? -best_shift : 0;
        int64_t c1 = lens[j] - best_shift < len_i ? lens[j] - best_shift
                                                  : len_i;
        const uint8_t *cj = codes + j * L + best_shift;
        for (int64_t col = 0; col < len_i; col++) {
            int m = col >= c0 && col < c1 && ci[col] == cj[col];
            mb[col >> 3] |= (uint8_t)(m << (col & 7));
            if (!m)
                lits[n_lits++] = ci[col];
        }
    }
    return n_lits;
}

/* Direct bundle->block FASTQ parse: n_rec 4-line records (lines as
 * produced by find_line_starts: line i spans buf[starts[line0+i] ..
 * starts[line0+i+1]-1), trailing '\n' excluded by construction,
 * optional '\r' stripped here) written STRAIGHT into the padded block
 * arrays — no intermediate ragged gather + scatter (that double-copied
 * every sequence/quality byte).  Record r lands in row row0+r.
 *
 * Validation matches the numpy path: leading '@' / '+', seq/qual
 * length equality, length <= L, qualities within '!'..'~'.
 *
 * Returns 0 and fills meta = {n_exc, name_bytes, plus_bytes}, or a
 * negative error: -1 bad '@', -2 bad '+', -3 len mismatch,
 * -4 exception buffer full (caller grows + retries), -5 len > L,
 * -6 quality byte out of range. */
EXPORT int64_t parse_into_block(const uint8_t *buf, const int64_t *starts,
                                int64_t line0, int64_t n_rec,
                                int64_t row0, int64_t L,
                                const uint8_t *base2code,
                                uint8_t *seq_out, uint8_t *qual_out,
                                int32_t *lens_out,
                                uint8_t *name_cat, int64_t *name_lens,
                                uint8_t *plus_cat, int64_t *plus_lens,
                                int64_t *exc_pos, uint8_t *exc_byte,
                                int64_t exc_start, int64_t exc_cap,
                                int64_t *meta)
{
    int64_t n_exc = exc_start;
    int64_t name_off = 0, plus_off = 0;
    for (int64_t r = 0; r < n_rec; r++) {
        int64_t li = line0 + 4 * r;
        int64_t s1 = starts[li], e1 = starts[li + 1] - 1;
        int64_t s2 = starts[li + 1], e2 = starts[li + 2] - 1;
        int64_t s3 = starts[li + 2], e3 = starts[li + 3] - 1;
        int64_t s4 = starts[li + 3], e4 = starts[li + 4] - 1;
        if (e1 > s1 && buf[e1 - 1] == '\r') e1--;
        if (e2 > s2 && buf[e2 - 1] == '\r') e2--;
        if (e3 > s3 && buf[e3 - 1] == '\r') e3--;
        if (e4 > s4 && buf[e4 - 1] == '\r') e4--;
        if (e1 <= s1 || buf[s1] != '@')
            return -1;
        if (e3 <= s3 || buf[s3] != '+')
            return -2;
        int64_t l = e2 - s2;
        if (e4 - s4 != l)
            return -3;
        if (l > L)
            return -5;
        int64_t nb = e1 - s1 - 1;
        memcpy(name_cat + name_off, buf + s1 + 1, (size_t)nb);
        name_lens[r] = nb;
        name_off += nb;
        int64_t pb = e3 - s3 - 1;
        memcpy(plus_cat + plus_off, buf + s3 + 1, (size_t)pb);
        plus_lens[r] = pb;
        plus_off += pb;
        int64_t row = row0 + r;
        uint8_t *qo = qual_out + row * L;
        const uint8_t *q = buf + s4;
        /* branch-free min/max sweep (auto-vectorizes) + memcpy beats a
         * byte-wise checked copy ~4x */
        uint8_t lo = 255, hi = 0;
        for (int64_t j = 0; j < l; j++) {
            uint8_t qb = q[j];
            lo = qb < lo ? qb : lo;
            hi = qb > hi ? qb : hi;
        }
        if (l > 0 && (lo < 33 || hi > 126))
            return -6;
        memcpy(qo, q, (size_t)l);
        uint8_t *so = seq_out + row * L;
        const uint8_t *sp = buf + s2;
        int64_t base = row * L;
#if defined(__AVX512F__) && defined(__AVX512BW__)
        /* branch-free translate: (b>>1)&3 maps ACGT to 0,1,3,2; a
         * masked 5-c swap fixes G/T; non-ACGT bytes (rare) become
         * zero-coded exceptions via the invalid kmask.  Guarded by a
         * one-time check that base2code IS the standard table. */
        if (base2code['A'] == 0 && base2code['C'] == 1
            && base2code['G'] == 2 && base2code['T'] == 3) {
            const __m512i v3 = _mm512_set1_epi8(3);
            const __m512i v5 = _mm512_set1_epi8(5);
            const __m512i vA = _mm512_set1_epi8('A');
            const __m512i vC = _mm512_set1_epi8('C');
            const __m512i vG = _mm512_set1_epi8('G');
            const __m512i vT = _mm512_set1_epi8('T');
            for (int64_t j = 0; j < l; j += 64) {
                int64_t take = l - j < 64 ? l - j : 64;
                uint64_t lanes = take == 64 ? ~0ULL
                                            : (1ULL << take) - 1;
                __m512i b = _mm512_maskz_loadu_epi8(lanes, sp + j);
                __m512i c = _mm512_and_si512(
                    _mm512_and_si512(_mm512_srli_epi16(b, 1),
                                     _mm512_set1_epi8(0x7F)),
                    v3);
                __mmask64 ge2 = _mm512_cmpge_epu8_mask(c,
                                                       _mm512_set1_epi8(2));
                c = _mm512_mask_sub_epi8(c, ge2, v5, c);
                uint64_t ok = _mm512_cmpeq_epi8_mask(b, vA)
                              | _mm512_cmpeq_epi8_mask(b, vC)
                              | _mm512_cmpeq_epi8_mask(b, vG)
                              | _mm512_cmpeq_epi8_mask(b, vT);
                ok &= lanes;
                c = _mm512_maskz_mov_epi8(ok, c);
                _mm512_mask_storeu_epi8(so + j, lanes, c);
                uint64_t exc = lanes & ~ok;
                while (exc) {
                    int64_t e = __builtin_ctzll(exc);
                    exc &= exc - 1;
                    if (n_exc >= exc_cap)
                        return -4;
                    exc_pos[n_exc] = base + j + e;
                    exc_byte[n_exc] = sp[j + e];
                    n_exc++;
                }
            }
            lens_out[row] = (int32_t)l;
            continue;
        }
#endif
        for (int64_t j = 0; j < l; j++) {
            uint8_t c = base2code[sp[j]];
            if (c == 255) {
                if (n_exc >= exc_cap)
                    return -4;
                exc_pos[n_exc] = base + j;
                exc_byte[n_exc] = sp[j];
                n_exc++;
                c = 0;
            }
            so[j] = c;
        }
        lens_out[row] = (int32_t)l;
    }
    meta[0] = n_exc;
    meta[1] = name_off;
    meta[2] = plus_off;
    return 0;
}

/* One-pass structured-name analysis for streams/names.py: verifies
 * every record shares record 0's separator pattern (count + bytes),
 * and classifies every field as const / numeric / raw while measuring
 * field lengths and accumulating numeric values.  Replaces three
 * vectorized numpy passes (~60 ms/block) with one ~3 ms byte walk.
 *
 * Returns k (separator count) on success, -1 on pattern mismatch
 * (caller falls back to the numpy path / raw mode).
 *   sep_bytes  [max_k]        record 0's separator bytes
 *   field_lens [n, k+1] u32   per-record field lengths
 *   vals       [k+1, n] i64   numeric value per field (valid only
 *                             where flags marks the field numeric)
 *   flags      [k+1] u8       bit0 = numeric (all records: digits
 *                             only, 1..18 chars, no leading zero
 *                             unless single '0'), bit1 = const
 *                             (identical bytes across records)
 * Semantics mirror _split_fields/_numeric_column exactly (pinned by
 * the byte-identity test against the numpy path). */
EXPORT int64_t analyze_names(const uint8_t *cat, const int64_t *offsets,
                             int64_t n, const uint8_t *is_sep,
                             int64_t max_k, uint8_t *sep_bytes,
                             uint32_t *field_lens, int64_t *vals,
                             uint8_t *flags)
{
    if (n <= 0)
        return -1;
    /* record 0: discover the separator pattern and field extents */
    int64_t k = 0;
    {
        const uint8_t *p = cat + offsets[0];
        int64_t len0 = offsets[1] - offsets[0];
        for (int64_t j = 0; j < len0; j++) {
            if (is_sep[p[j]]) {
                if (k >= max_k)
                    return -1;
                sep_bytes[k++] = p[j];
            }
        }
    }
    int64_t nf = k + 1;
    for (int64_t f = 0; f < nf; f++)
        flags[f] = 3;                       /* numeric & const until not */
    /* field start offsets of record 0 (for const comparison) */
    int64_t r0_start[64];
    if (nf > 64)
        return -1;
    {
        const uint8_t *p = cat + offsets[0];
        int64_t len0 = offsets[1] - offsets[0];
        int64_t f = 0;
        r0_start[0] = 0;
        for (int64_t j = 0; j < len0; j++)
            if (is_sep[p[j]])
                r0_start[++f] = j + 1;
    }
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
    /* classification tables for the <=64-byte fast path: is_sep via
     * 4x VPERMB (low-6-bit select blended by bits 6/7, the map_clamp
     * idiom) + digit range compares — one pass replaces the per-byte
     * LUT/branch walk (measured ~3x on 131k ~25-byte names) */
    const __m512i s_t0 = _mm512_loadu_si512(is_sep);
    const __m512i s_t1 = _mm512_loadu_si512(is_sep + 64);
    const __m512i s_t2 = _mm512_loadu_si512(is_sep + 128);
    const __m512i s_t3 = _mm512_loadu_si512(is_sep + 192);
    const __m512i nb6 = _mm512_set1_epi8(0x40);
    const __m512i nb7 = _mm512_set1_epi8((char)0x80);
    const __m512i nd0 = _mm512_set1_epi8('0');
    const __m512i nd9 = _mm512_set1_epi8('9');
#endif
    for (int64_t r = 0; r < n; r++) {
        const uint8_t *p = cat + offsets[r];
        int64_t len = offsets[r + 1] - offsets[r];
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
        if (len <= 64) {
            __mmask64 lm = len == 64 ? ~0ULL : ((1ULL << len) - 1);
            __m512i v = _mm512_maskz_loadu_epi8(lm, p);
            __mmask64 m6 = _mm512_test_epi8_mask(v, nb6);
            __mmask64 m7 = _mm512_test_epi8_mask(v, nb7);
            __m512i clo = _mm512_mask_blend_epi8(
                m6, _mm512_permutexvar_epi8(v, s_t0),
                _mm512_permutexvar_epi8(v, s_t1));
            __m512i chi = _mm512_mask_blend_epi8(
                m6, _mm512_permutexvar_epi8(v, s_t2),
                _mm512_permutexvar_epi8(v, s_t3));
            __m512i cls = _mm512_mask_blend_epi8(m7, clo, chi);
            uint64_t sepm = _mm512_test_epi8_mask(
                                cls, _mm512_set1_epi8(1)) & lm;
            uint64_t digm = _mm512_cmp_epu8_mask(v, nd0, _MM_CMPINT_NLT)
                          & _mm512_cmp_epu8_mask(v, nd9, _MM_CMPINT_LE)
                          & lm;
            uint64_t sm = sepm;
            int64_t fstart = 0, f = 0;
            for (;;) {
                int64_t j = sm ? (int64_t)__builtin_ctzll(sm) : len;
                if (j < len && (f >= k || p[j] != sep_bytes[f]))
                    return -1;              /* pattern mismatch */
                if (f >= nf)
                    return -1;
                int64_t flen = j - fstart;
                field_lens[r * nf + f] = (uint32_t)flen;
                if (flags[f] & 1u) {
                    int numeric = flen >= 1 && flen <= 18
                        && ((~digm)
                            & (((1ULL << flen) - 1) << fstart)) == 0
                        && !(flen > 1 && p[fstart] == '0');
                    if (numeric) {
                        int64_t acc = 0;
                        for (int64_t t = 0; t < flen; t++)
                            acc = acc * 10 + (p[fstart + t] - '0');
                        vals[f * n + r] = acc;
                    } else {
                        flags[f] &= (uint8_t)~1u;
                    }
                }
                if (r > 0 && (flags[f] & 2u)) {
                    int64_t flen0 = (f + 1 <= k ? r0_start[f + 1] - 1
                                                : offsets[1] - offsets[0])
                                    - r0_start[f];
                    if (flen != flen0 ||
                        memcmp(p + fstart,
                               cat + offsets[0] + r0_start[f],
                               (size_t)flen) != 0)
                        flags[f] &= (uint8_t)~2u;
                }
                f++;
                if (j >= len)
                    break;
                fstart = j + 1;
                sm &= sm - 1;
            }
            if (f != nf)
                return -1;                  /* separator count mismatch */
            continue;
        }
#endif
        int64_t f = 0;
        int64_t fstart = 0;
        int64_t acc = 0;
        int numeric = flags[0] & 1;   /* dead flag: skip accumulation */
        for (int64_t j = 0; j <= len; j++) {
            uint8_t ch = j < len ? p[j] : 0;
            int end = (j == len) || is_sep[ch];
            if (end && j < len) {           /* separator byte */
                if (f >= k || ch != sep_bytes[f])
                    return -1;              /* pattern mismatch */
            }
            if (end) {
                int64_t flen = j - fstart;
                field_lens[r * nf + f] = (uint32_t)flen;
                if (flen == 0 || flen > 18 ||
                    (flen > 1 && p[fstart] == '0'))
                    numeric = 0;
                if (numeric)
                    vals[f * n + r] = acc;
                else
                    flags[f] &= (uint8_t)~1u;
                /* const: same length as record 0's field + same bytes
                 * (skipped once the flag is dead — vals/flags are the
                 * only outputs the caller reads for such fields) */
                if (r > 0 && (flags[f] & 2u)) {
                    int64_t flen0 = (f + 1 <= k ? r0_start[f + 1] - 1
                                                : offsets[1] - offsets[0])
                                    - r0_start[f];
                    if (flen != flen0 ||
                        memcmp(p + fstart, cat + offsets[0] + r0_start[f],
                               (size_t)flen) != 0)
                        flags[f] &= (uint8_t)~2u;
                }
                f++;
                fstart = j + 1;
                acc = 0;
                numeric = f < nf ? (flags[f] & 1) : 1;
            } else {
                if (ch < '0' || ch > '9')
                    numeric = 0;
                else if (numeric && j - fstart < 18)
                    acc = acc * 10 + (ch - '0');   /* >18 digits: field
                                                      is non-numeric by
                                                      the flen check */
            }
        }
        if (f != nf)
            return -1;                      /* separator count mismatch */
    }
    return k;
}

/* Fixed-width bit packing (LSB-first): the stored permutation is a
 * near-random k = ceil(log2(n))-bit sequence — 17 bits/read at default
 * block size vs the 21.9 bits/read zstd got from the u32 image. */
EXPORT void bitpack_u32(const uint32_t *vals, int64_t n, int64_t k,
                        uint8_t *out)
{
    uint64_t acc = 0;
    int nb = 0;
    uint8_t *p = out;
    uint32_t mask = k >= 32 ? 0xFFFFFFFFu : ((1u << k) - 1u);
    for (int64_t i = 0; i < n; i++) {
        acc |= (uint64_t)(vals[i] & mask) << nb;
        nb += (int)k;
        while (nb >= 8) {
            *p++ = (uint8_t)(acc & 0xFF);
            acc >>= 8;
            nb -= 8;
        }
    }
    if (nb)
        *p = (uint8_t)(acc & 0xFF);
}

EXPORT void bitunpack_u32(const uint8_t *in, int64_t n, int64_t k,
                          uint32_t *vals)
{
    uint64_t acc = 0;
    int nb = 0;
    const uint8_t *p = in;
    uint32_t mask = k >= 32 ? 0xFFFFFFFFu : ((1u << k) - 1u);
    for (int64_t i = 0; i < n; i++) {
        while (nb < k) {
            acc |= (uint64_t)(*p++) << nb;
            nb += 8;
        }
        vals[i] = (uint32_t)(acc & mask);
        acc >>= k;
        nb -= (int)k;
    }
}

/* SWAR newline detection: a set high bit per 0x0A byte of v. */
static inline uint64_t nl_mask64(uint64_t v)
{
    uint64_t x = v ^ 0x0A0A0A0A0A0A0A0AULL;
    return (x - 0x0101010101010101ULL) & ~x & 0x8080808080808080ULL;
}

/* Newline scan for the FASTQ parser: writes 0 then (index+1) of every
 * '\n' in buf into out; returns the entry count.  FASTQ lines average
 * ~25 bytes, so a memchr PER LINE paid call overhead 4M times per
 * 32MB chunk (~1 GB/s); the branch-free 8-byte SWAR sweep with
 * ctz-iterated hits runs at memory speed.  out must hold
 * >= count_newlines(buf)+1. */
EXPORT int64_t find_line_starts(const uint8_t *buf, int64_t n,
                                int64_t *out)
{
    int64_t cnt = 0;
    out[cnt++] = 0;
    int64_t i = 0;
    for (; i + 8 <= n; i += 8) {
        uint64_t v;
        memcpy(&v, buf + i, 8);
        uint64_t m = nl_mask64(v);
        while (m) {
            out[cnt++] = i + (__builtin_ctzll(m) >> 3) + 1;
            m &= m - 1;
        }
    }
    for (; i < n; i++)
        if (buf[i] == '\n')
            out[cnt++] = i + 1;
    return cnt;
}

EXPORT int64_t count_newlines(const uint8_t *buf, int64_t n)
{
    int64_t cnt = 0;
    int64_t i = 0;
    for (; i + 8 <= n; i += 8) {
        uint64_t v;
        memcpy(&v, buf + i, 8);
        cnt += __builtin_popcountll(nl_mask64(v));
    }
    for (; i < n; i++)
        cnt += buf[i] == '\n';
    return cnt;
}

/* Host-side row reorder + strand orientation for the slim-download
 * encode path: the device returns only (perm, cp|bnd|rc|len) and the
 * host rebuilds the SORTED, ORIENTED code block from the ORIGINAL
 * codes it already holds — out[i] = rc[i] ? revcomp(codes[perm[i]])
 * : codes[perm[i]].  Exactly mirrors ops/core_match.py::
 * reverse_complement (3-x complement within lens[i], zero padding),
 * so the result is bit-identical to downloading the device's
 * apply_permutation product.  ~13 MB/block of host memcpy replaces a
 * ~3.3 MB D2H over a ~33 MB/s link plus a device [B,L] row gather. */
EXPORT void gather_orient(const uint8_t *codes, const int64_t *perm,
                          const uint8_t *rc, const int64_t *lens,
                          int64_t n, int64_t L, uint8_t *out)
{
    /* perm is near-random, so every row is ~L/64 cold cache lines;
     * prefetching a few rows ahead overlaps those DRAM misses with
     * the current row's copy (measured ~30% off this loop). */
    const int64_t PD = 8;
    for (int64_t i = 0; i < n; i++) {
        if (i + PD < n) {
            const uint8_t *nxt = codes + perm[i + PD] * L;
            for (int64_t c = 0; c < L; c += 64)
                __builtin_prefetch(nxt + c, 0, 1);
            /* unaligned rows with L % 64 != 0 straddle one more line */
            __builtin_prefetch(nxt + L - 1, 0, 1);
        }
        const uint8_t *src = codes + perm[i] * L;
        uint8_t *dst = out + i * L;
        if (!rc[i]) {
            memcpy(dst, src, (size_t)L);
            continue;
        }
        int64_t len = lens[i];
        int64_t j = 0;
#if defined(__AVX512BW__) && defined(__AVX512VBMI__)
        {
            static const uint8_t revb[64] = {
                63, 62, 61, 60, 59, 58, 57, 56, 55, 54, 53, 52, 51,
                50, 49, 48, 47, 46, 45, 44, 43, 42, 41, 40, 39, 38,
                37, 36, 35, 34, 33, 32, 31, 30, 29, 28, 27, 26, 25,
                24, 23, 22, 21, 20, 19, 18, 17, 16, 15, 14, 13, 12,
                11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0};
            const __m512i rev = _mm512_loadu_si512(revb);
            const __m512i three = _mm512_set1_epi8(3);
            for (; j + 64 <= len; j += 64) {
                __m512i v = _mm512_loadu_si512(src + len - j - 64);
                v = _mm512_permutexvar_epi8(rev, v);
                v = _mm512_sub_epi8(three, v);
                _mm512_storeu_si512(dst + j, v);
            }
        }
#endif
        for (; j < len; j++)
            dst[j] = (uint8_t)(3 - src[len - 1 - j]);
        if (len < L)
            memset(dst + len, 0, (size_t)(L - len));
    }
}

/* delta_match over RUN-ENCODED buckets: bnd[i]=1 marks the first row
 * of a bucket run (equal core) in the SORTED mate-1 order; NO_CORE
 * rows carry bnd=1 so they never match a predecessor.  Replaces the
 * 4-byte core id per read with one bit in the device download buffer.
 * Candidate set is identical to delta_match's whenever bnd is derived
 * from ck over sorted runs (equal cores are contiguous after the
 * bucket sort), so outputs are byte-identical — pinned by test. */
#if defined(__AVX512F__) && defined(__AVX512BW__)
#include <immintrin.h>

/* Matching columns of [c0, c1) in one 64-byte sweep; fault-suppressing
 * masked loads make the (possibly out-of-row) base addresses safe. */
static inline uint64_t match_mask64(const uint8_t *a, const uint8_t *b,
                                    int64_t base, int64_t c0, int64_t c1)
{
    uint64_t range = ~0ULL;
    if (base < c0)
        range = c0 - base >= 64 ? 0 : range << (c0 - base);
    if (c1 - base < 64)
        range &= c1 - base <= 0 ? 0 : ~0ULL >> (64 - (c1 - base));
    if (!range)
        return 0;
    __m512i va = _mm512_maskz_loadu_epi8(range, a + base);
    __m512i vb = _mm512_maskz_loadu_epi8(range, b + base);
    return _mm512_cmpeq_epi8_mask(va, vb) & range;
}
#endif

EXPORT int64_t delta_match_runs(const uint8_t *codes, const uint8_t *bnd,
                                const int32_t *cp, const int64_t *lens,
                                int64_t n, int64_t L, int64_t K,
                                uint8_t *mask_bits, int16_t *shifts,
                                uint8_t *pred_k, uint8_t *lits)
{
    int64_t stride = L / 8;
    int64_t n_lits = 0;
    int64_t runstart = 0;
    for (int64_t i = 0; i < n; i++) {
        if (bnd[i])
            runstart = i;
        int64_t len_i = lens[i];
        const uint8_t *ci = codes + i * L;
        int32_t best_count = -1, best_shift = 0, best_k = 0;
        for (int64_t k = 1; k <= K && i - k >= runstart; k++) {
            int64_t j = i - k;
            int32_t sh = cp[j] - cp[i];
            int64_t c0 = sh < 0 ? -sh : 0;
            int64_t c1 = lens[j] - sh < len_i ? lens[j] - sh : len_i;
            int32_t cnt = 0;
            const uint8_t *cj = codes + j * L + sh;
#if defined(__AVX512F__) && defined(__AVX512BW__)
            for (int64_t base = c0 & ~(int64_t)63; base < c1; base += 64)
                cnt += (int32_t)__builtin_popcountll(
                    match_mask64(ci, cj, base, c0, c1));
#else
            for (int64_t col = c0; col < c1; col++)
                cnt += ci[col] == cj[col];
#endif
            if (cnt > best_count) {
                best_count = cnt;
                best_shift = sh;
                best_k = (int32_t)(k - 1);
                /* full-row match: no later candidate can EXCEED it
                 * (selection is strict >, ties keep the earlier k) —
                 * skip the rest.  High-coverage blocks hit this on
                 * most rows.  Byte-identical by construction. */
                if (cnt == (int32_t)len_i)
                    break;
            }
        }
        shifts[i] = (int16_t)best_shift;
        pred_k[i] = (uint8_t)best_k;
        uint8_t *mb = mask_bits + i * stride;
        memset(mb, 0, (size_t)stride);
        if (best_count < 0) {                /* whole row is literal */
            memcpy(lits + n_lits, ci, (size_t)len_i);
            n_lits += len_i;
            continue;
        }
        int64_t j = i - 1 - best_k;
        int64_t c0 = best_shift < 0 ? -best_shift : 0;
        int64_t c1 = lens[j] - best_shift < len_i ? lens[j] - best_shift
                                                  : len_i;
        const uint8_t *cj = codes + j * L + best_shift;
#if defined(__AVX512F__) && defined(__AVX512BW__)
        /* the 64-bit match mask IS the LSB-first mask_bits image; the
         * literals are the mismatch bits, iterated with ctz (few after
         * a good match, straight memcpy when nothing matched) */
        for (int64_t base = 0; base < len_i; base += 64) {
            int64_t take = len_i - base < 64 ? len_i - base : 64;
            uint64_t lanes = take == 64 ? ~0ULL : (1ULL << take) - 1;
            uint64_t m = match_mask64(ci, cj, base, c0, c1) & lanes;
            memcpy(mb + (base >> 3), &m,
                   (size_t)((take + 7) >> 3));
            uint64_t nm = lanes & ~m;
            if (nm == lanes) {
                memcpy(lits + n_lits, ci + base, (size_t)take);
                n_lits += take;
            } else {
                while (nm) {
                    int64_t b = __builtin_ctzll(nm);
                    nm &= nm - 1;
                    lits[n_lits++] = ci[base + b];
                }
            }
        }
#else
        for (int64_t col = 0; col < len_i; col++) {
            int m = col >= c0 && col < c1 && ci[col] == cj[col];
            mb[col >> 3] |= (uint8_t)(m << (col & 7));
            if (!m)
                lits[n_lits++] = ci[col];
        }
#endif
    }
    return n_lits;
}

/* Join name fields record-major: out[r] = f0[r] sep0 f1[r] sep1 ...
 * Const fields (is_const[i]) use their single stored value for every
 * record.  Callers validate offsets against cat sizes and size `out`
 * as out_off[n].  One pass replaces k+1 ragged scatters + cursor
 * vector churn (~13 ms/block in numpy at 131k six-field names). */
EXPORT void join_fields(const uint8_t *const *cats,
                        const int64_t *const *offs,
                        const uint8_t *is_const, int64_t nf,
                        const uint8_t *seps, int64_t n,
                        const int64_t *out_off, uint8_t *out)
{
    for (int64_t r = 0; r < n; r++) {
        uint8_t *o = out + out_off[r];
        for (int64_t i = 0; i < nf; i++) {
            const int64_t *of = offs[i];
            int64_t s, e;
            if (is_const[i]) {
                s = of[0];
                e = of[1];
            } else {
                s = of[r];
                e = of[r + 1];
            }
            memcpy(o, cats[i] + s, (size_t)(e - s));
            o += e - s;
            if (i + 1 < nf)
                *o++ = seps[i];
        }
    }
}

/* Validation helper: any copy-mask bit at or past each row's length is
 * corruption (the checked reconstruction loop ignores those bits, so
 * acceptance must not depend on them).  Returns 1 on violation.
 * Callers verify lens[i] <= stride*8 first. */
EXPORT int64_t mask_tail_check(const uint8_t *mb, const int64_t *lens,
                               int64_t n, int64_t stride)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t len = lens[i];
        int64_t nb = (len + 7) >> 3;
        const uint8_t *row = mb + i * stride;
        for (int64_t b = nb; b < stride; b++)
            if (row[b])
                return 1;
        if (len & 7) {
            uint8_t keep = (uint8_t)(0xFFu << (len & 7));
            if (row[len >> 3] & keep)
                return 1;
        }
    }
    return 0;
}

/* Row permutation as a SCATTER copy: reads stream sequentially and the
 * random-address writes retire through the store buffer without
 * stalling (a gather formulation pays an L3/DRAM-latency READ per row;
 * measured 2-3x slower at [131k, 100]). inv[r] = destination row of
 * source row r. */
EXPORT void permute_rows_u8(const uint8_t *src, const int64_t *inv,
                            int64_t B, int64_t L, uint8_t *dst)
{
    /* random writes miss on every destination line (RFO); prefetch a
     * few rows ahead with write intent to overlap those misses. */
    const int64_t PD = 8;
    for (int64_t r = 0; r < B; r++) {
        if (r + PD < B) {
            uint8_t *nxt = dst + inv[r + PD] * L;
            for (int64_t c = 0; c < L; c += 64)
                __builtin_prefetch(nxt + c, 1, 1);
            /* unaligned rows with L % 64 != 0 straddle one more line */
            __builtin_prefetch(nxt + L - 1, 1, 1);
        }
        memcpy(dst + inv[r] * L, src + r * L, (size_t)L);
    }
}

/* Dual-order histogram in ONE pass over the quality grid: the order-0
 * (auto) mode needs both order-1 and order-2 (ctx,sym) histograms to
 * trial their coded cost; walking the 13MB-per-block grid once instead
 * of twice halves the dominant memory traffic of the host quality path.
 * counts1 [n_ctx(1)*94], counts2 [n_ctx(2)*94] (caller zeroes both). */
static inline void qual_hist2_cell(uint32_t s, uint32_t prev1,
                                   uint32_t prev2, int64_t col,
                                   uint32_t *counts1, uint32_t *counts2,
                                   uint32_t *counts3)
{
    uint32_t pb = q_pb(col, 1);
    uint32_t c1 = q_ctx(prev1, prev2, pb, col == 0, col == 1, 1, 1);
    uint32_t c2 = q_ctx(prev1, prev2, pb, col == 0, col == 1, 1, 2);
    uint32_t c3 = q_ctx(prev1, prev2, q_pb(col, 3), col == 0, col == 1,
                        1, 3);
    counts1[(int64_t)c1 * Q_NSYMS + s]++;
    counts2[(int64_t)c2 * Q_NSYMS + s]++;
    counts3[(int64_t)c3 * Q_NSYMS + s]++;
}

static inline uint32_t clamp_sym(uint8_t q)
{
    int v = (int)q - Q_OFFSET;
    if (v < 0) v = 0;
    if (v > Q_NSYMS - 1) v = Q_NSYMS - 1;
    return (uint32_t)v;
}

/* Mapped variant: the quality functions take a 256-byte remap LUT
 * (identity when lossless, the lossy quantizer's merge table under -p)
 * plus a row permutation — fusing the [B, L] permute gather and the
 * lossy remap into the row copy the coder does anyway (~10 ms/block
 * saved vs materializing the permuted grid on the Python side). */
static inline uint32_t clamp_sym_m(uint8_t q, const uint8_t *qmap)
{
    int v = (int)qmap[q] - Q_OFFSET;
    if (v < 0) v = 0;
    if (v > Q_NSYMS - 1) v = Q_NSYMS - 1;
    return (uint32_t)v;
}


#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
/* Map + clamp one quality row into symbols (zeros past len), 64 B/step
 * — shared by the AVX encoder fill and the vectorized histogram. */
static inline void map_clamp_row(const uint8_t *qrow, int64_t len,
                                 int64_t L, const uint8_t *qmap,
                                 uint8_t *sj)
{
    const __m512i t0 = _mm512_loadu_si512(qmap);
    const __m512i t1 = _mm512_loadu_si512(qmap + 64);
    const __m512i t2 = _mm512_loadu_si512(qmap + 128);
    const __m512i t3 = _mm512_loadu_si512(qmap + 192);
    const __m512i voff = _mm512_set1_epi8(Q_OFFSET);
    const __m512i vmax = _mm512_set1_epi8(Q_NSYMS - 1);
    const __m512i b6 = _mm512_set1_epi8(0x40);
    const __m512i b7 = _mm512_set1_epi8((char)0x80);
    for (int64_t col = 0; col < L; col += 64) {
        int64_t remw = L - col;
        __mmask64 wm = remw >= 64 ? ~0ULL : ((1ULL << remw) - 1);
        int64_t remv = len - col;
        __mmask64 lm = remv <= 0 ? 0
            : (remv >= 64 ? ~0ULL : ((1ULL << remv) - 1));
        __m512i q = _mm512_maskz_loadu_epi8(lm, qrow + col);
        __mmask64 m6 = _mm512_test_epi8_mask(q, b6);
        __mmask64 m7 = _mm512_test_epi8_mask(q, b7);
        __m512i lo = _mm512_mask_blend_epi8(
            m6, _mm512_permutexvar_epi8(q, t0),
            _mm512_permutexvar_epi8(q, t1));
        __m512i hi = _mm512_mask_blend_epi8(
            m6, _mm512_permutexvar_epi8(q, t2),
            _mm512_permutexvar_epi8(q, t3));
        __m512i v = _mm512_mask_blend_epi8(m7, lo, hi);
        v = _mm512_subs_epu8(v, voff);
        v = _mm512_min_epu8(v, vmax);
        v = _mm512_maskz_mov_epi8(lm, v);
        _mm512_mask_storeu_epi8(sj + col, wm, v);
    }
}

/* Precompute flat (ctx, sym) table indices for one symbol row, 16
 * columns per step.  sv must have 2 zeroed FRONT pad bytes (reads
 * sv[j-1], sv[j-2]) and 16 tail slack; ib gets 16-step-rounded writes.
 * The j = 0 (and j = 1 for order 2) start-sentinel contexts are fixed
 * up scalar afterwards. */
static void qual_idx_row(const uint8_t *sv, int64_t lim, int order,
                         int32_t *ib)
{
    const __m512i v94 = _mm512_set1_epi32(Q_NSYMS);
    const __m512i vone = _mm512_set1_epi32(1);
    for (int64_t j = 0; j < lim; j += 16) {
        __m512i s = _mm512_cvtepu8_epi32(
            _mm_loadu_si128((const __m128i *)(sv + j)));
        __m512i p1 = _mm512_cvtepu8_epi32(
            _mm_loadu_si128((const __m128i *)(sv + j - 1)));
        uint32_t pb = (uint32_t)(j >> 4);
        if (pb > Q_POS_BUCKETS - 1) pb = Q_POS_BUCKETS - 1;
        __m512i ctx;
        if (order == 3) {
            /* order-3 buckets are col/4: pb VARIES inside the 16-col
             * chunk (4 buckets) — vector pb, capped at 31 */
            const __m512i off = _mm512_set_epi32(
                3, 3, 3, 3, 2, 2, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0);
            __m512i pbv = _mm512_add_epi32(
                _mm512_set1_epi32((int)(j >> 2)), off);
            pbv = _mm512_min_epi32(
                pbv, _mm512_set1_epi32(Q_POS_BUCKETS32 - 1));
            __m512i pq = _mm512_min_epi32(
                p1, _mm512_set1_epi32(Q_PREV1_FULL - 1));
            ctx = _mm512_add_epi32(
                pq, _mm512_mullo_epi32(
                    pbv, _mm512_set1_epi32(Q_PREV1_FULL + 1)));
        } else if (order == 2) {
            __m512i p2 = _mm512_cvtepu8_epi32(
                _mm_loadu_si128((const __m128i *)(sv + j - 2)));
            __m512i pq = _mm512_min_epi32(
                _mm512_srli_epi32(p1, 2),
                _mm512_set1_epi32(Q_PREV_LEVELS - 1));
            __m512i p2v = _mm512_min_epi32(
                _mm512_srli_epi32(p2, 4),
                _mm512_set1_epi32(Q_PREV2_LEVELS - 2));
            ctx = _mm512_add_epi32(
                _mm512_mullo_epi32(
                    _mm512_add_epi32(
                        _mm512_set1_epi32(
                            (int)(pb * (Q_PREV_LEVELS + 1))), pq),
                    _mm512_set1_epi32(Q_PREV2_LEVELS)),
                p2v);
        } else {
            __m512i pq = _mm512_min_epi32(
                p1, _mm512_set1_epi32(Q_PREV1_FULL - 1));
            ctx = _mm512_add_epi32(
                pq, _mm512_set1_epi32((int)(pb * (Q_PREV1_FULL + 1))));
        }
        __m512i idx = _mm512_add_epi32(
            _mm512_mullo_epi32(_mm512_add_epi32(ctx, vone), v94), s);
        _mm512_storeu_si512(ib + j, idx);
    }
    if (lim > 0) {                       /* start sentinels */
        uint32_t c0 = q_ctx(0, 0, 0, 1, 0, 1, order);
        ib[0] = (int32_t)(c0 * Q_NSYMS + sv[0]);
        if (order == 2 && lim > 1) {
            uint32_t c1 = q_ctx(sv[0], 0, 0, 0, 1, 1, order);
            ib[1] = (int32_t)(c1 * Q_NSYMS + sv[1]);
        }
    }
}
#endif

/* Single-order variant: forced-order runs (and the full-histogram half
 * of auto mode, whose order trial runs on a row SAMPLE) only need one
 * (ctx,sym) table — half the increments of qual_hist2. */
static inline void qual_hist1_cell(uint32_t s, uint32_t prev1,
                                   uint32_t prev2, int64_t col, int order,
                                   uint32_t *counts)
{
    uint32_t pb = q_pb(col, order);
    uint32_t c = q_ctx(prev1, prev2, pb, col == 0, col == 1, 1, order);
    counts[(int64_t)c * Q_NSYMS + s]++;
}

static void qual_hist1_row(const uint8_t *qrow, const uint8_t *qmap,
                           int64_t from, int64_t to,
                           uint32_t *prev1, uint32_t *prev2, int order,
                           uint32_t *counts)
{
    uint32_t p1 = *prev1, p2 = *prev2;
    for (int64_t col = from; col < to; col++) {
        uint32_t s = clamp_sym_m(qrow[col], qmap);
        qual_hist1_cell(s, p1, p2, col, order, counts);
        p2 = p1;
        p1 = s;
    }
    *prev1 = p1;
    *prev2 = p2;
}

EXPORT void qual_hist_one(const uint8_t *qual, const int64_t *lengths,
                          const int64_t *perm, const uint8_t *qmap,
                          int64_t B, int64_t L, int64_t order,
                          uint32_t *counts)
{
    int o = (int)order;
    int64_t i = 0;
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
    /* vector front end (map/clamp + ctx-index precompute), scalar only
     * for the 4-row-interleaved increments: 22 -> ~10 ms/block */
    {
        size_t svs = (size_t)(L + 34);
        size_t ibs = (size_t)(L + 16);
        uint8_t *svb = (uint8_t *)malloc(8 * svs);
        int32_t *ibb = (int32_t *)malloc(8 * ibs * 4);
        if (svb && ibb) {
            for (; i + 8 <= B; i += 8) {
                const int32_t *ib[8];
                int64_t lim[8];
                int64_t lim_min = L;
                for (int r = 0; r < 8; r++) {
                    int64_t len = lengths[i + r];
                    lim[r] = len < L ? len : L;
                    if (lim[r] < lim_min) lim_min = lim[r];
                    uint8_t *sv = svb + (size_t)r * svs + 2;
                    sv[-1] = 0;
                    sv[-2] = 0;
                    map_clamp_row(qual + perm[i + r] * L, lim[r], L,
                                  qmap, sv);
                    int32_t *ibr = ibb + (size_t)r * ibs;
                    qual_idx_row(sv, lim[r], o, ibr);
                    ib[r] = ibr;
                }
                int64_t col = 0;
                for (; col < lim_min; col++) {
                    counts[ib[0][col]]++;
                    counts[ib[1][col]]++;
                    counts[ib[2][col]]++;
                    counts[ib[3][col]]++;
                    counts[ib[4][col]]++;
                    counts[ib[5][col]]++;
                    counts[ib[6][col]]++;
                    counts[ib[7][col]]++;
                }
                for (int r = 0; r < 8; r++) {
                    for (int64_t c2 = col; c2 < lim[r]; c2++)
                        counts[ib[r][c2]]++;
                    counts[0] += (uint32_t)(L - lim[r]);
                }
            }
        }
        free(svb);
        free(ibb);
    }
#endif
    (void)o;
    for (; i + 4 <= B; i += 4) {
        const uint8_t *q[4];
        int64_t lim[4];
        uint32_t p1[4] = {0, 0, 0, 0}, p2[4] = {0, 0, 0, 0};
        int64_t lim_min = L;
        for (int r = 0; r < 4; r++) {
            q[r] = qual + perm[i + r] * L;
            int64_t len = lengths[i + r];
            lim[r] = len < L ? len : L;
            if (lim[r] < lim_min) lim_min = lim[r];
        }
        for (int64_t col = 0; col < lim_min; col++) {
            uint32_t s0 = clamp_sym_m(q[0][col], qmap);
            uint32_t s1 = clamp_sym_m(q[1][col], qmap);
            uint32_t s2 = clamp_sym_m(q[2][col], qmap);
            uint32_t s3 = clamp_sym_m(q[3][col], qmap);
            qual_hist1_cell(s0, p1[0], p2[0], col, o, counts);
            qual_hist1_cell(s1, p1[1], p2[1], col, o, counts);
            qual_hist1_cell(s2, p1[2], p2[2], col, o, counts);
            qual_hist1_cell(s3, p1[3], p2[3], col, o, counts);
            p2[0] = p1[0]; p1[0] = s0;
            p2[1] = p1[1]; p1[1] = s1;
            p2[2] = p1[2]; p1[2] = s2;
            p2[3] = p1[3]; p1[3] = s3;
        }
        for (int r = 0; r < 4; r++) {
            if (lim[r] > lim_min)
                qual_hist1_row(q[r], qmap, lim_min, lim[r], &p1[r],
                               &p2[r], o, counts);
            counts[0] += (uint32_t)(L - lim[r]);
        }
    }
    for (; i < B; i++) {
        int64_t len = lengths[i];
        int64_t lim = len < L ? len : L;
        uint32_t prev1 = 0, prev2 = 0;
        qual_hist1_row(qual + perm[i] * L, qmap, 0, lim, &prev1, &prev2,
                       o, counts);
        counts[0] += (uint32_t)(L - lim);
    }
}

static void qual_hist2_row(const uint8_t *qrow, const uint8_t *qmap,
                           int64_t from, int64_t to,
                           uint32_t *prev1, uint32_t *prev2,
                           uint32_t *counts1, uint32_t *counts2,
                           uint32_t *counts3)
{
    uint32_t p1 = *prev1, p2 = *prev2;
    for (int64_t col = from; col < to; col++) {
        uint32_t s = clamp_sym_m(qrow[col], qmap);
        qual_hist2_cell(s, p1, p2, col, counts1, counts2, counts3);
        p2 = p1;
        p1 = s;
    }
    *prev1 = p1;
    *prev2 = p2;
}

EXPORT void qual_hist3(const uint8_t *qual, const int64_t *lengths,
                       const int64_t *perm, const uint8_t *qmap,
                       int64_t B, int64_t L,
                       uint32_t *counts1, uint32_t *counts2,
                       uint32_t *counts3)
{
    int64_t i = 0;
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VBMI__)
    /* vector front end, dual-order index precompute, 4-row interleaved
     * increments — same structure as qual_hist_one */
    {
        size_t svs = (size_t)(L + 34);
        size_t ibs = (size_t)(L + 16);
        uint8_t *svb = (uint8_t *)malloc(4 * svs);
        int32_t *ibb = (int32_t *)malloc(12 * ibs * 4);
        if (svb && ibb) {
            for (; i + 4 <= B; i += 4) {
                const int32_t *i1[4], *i2[4], *i3[4];
                int64_t lim[4];
                int64_t lim_min = L;
                for (int r = 0; r < 4; r++) {
                    int64_t len = lengths[i + r];
                    lim[r] = len < L ? len : L;
                    if (lim[r] < lim_min) lim_min = lim[r];
                    uint8_t *sv = svb + (size_t)r * svs + 2;
                    sv[-1] = 0;
                    sv[-2] = 0;
                    map_clamp_row(qual + perm[i + r] * L, lim[r], L,
                                  qmap, sv);
                    int32_t *a = ibb + (size_t)(3 * r) * ibs;
                    int32_t *b = a + ibs;
                    int32_t *c = b + ibs;
                    qual_idx_row(sv, lim[r], 1, a);
                    qual_idx_row(sv, lim[r], 2, b);
                    qual_idx_row(sv, lim[r], 3, c);
                    i1[r] = a;
                    i2[r] = b;
                    i3[r] = c;
                }
                int64_t col = 0;
                for (; col < lim_min; col++) {
                    counts1[i1[0][col]]++;
                    counts2[i2[0][col]]++;
                    counts3[i3[0][col]]++;
                    counts1[i1[1][col]]++;
                    counts2[i2[1][col]]++;
                    counts3[i3[1][col]]++;
                    counts1[i1[2][col]]++;
                    counts2[i2[2][col]]++;
                    counts3[i3[2][col]]++;
                    counts1[i1[3][col]]++;
                    counts2[i2[3][col]]++;
                    counts3[i3[3][col]]++;
                }
                for (int r = 0; r < 4; r++) {
                    for (int64_t c2 = col; c2 < lim[r]; c2++) {
                        counts1[i1[r][c2]]++;
                        counts2[i2[r][c2]]++;
                        counts3[i3[r][c2]]++;
                    }
                    counts1[0] += (uint32_t)(L - lim[r]);
                    counts2[0] += (uint32_t)(L - lim[r]);
                    counts3[0] += (uint32_t)(L - lim[r]);
                }
            }
        }
        free(svb);
        free(ibb);
    }
#endif
    /* 4-row interleave: quality data is run-heavy, so consecutive
     * increments from ONE row often hit the same counter cell and
     * serialize on store-to-load forwarding (~42 ms/block measured);
     * alternating rows spaces same-cell increments 4 apart (~2x). */
    for (; i + 4 <= B; i += 4) {
        const uint8_t *q[4];
        int64_t lim[4];
        uint32_t p1[4] = {0, 0, 0, 0}, p2[4] = {0, 0, 0, 0};
        int64_t lim_min = L;
        for (int r = 0; r < 4; r++) {
            q[r] = qual + perm[i + r] * L;
            int64_t len = lengths[i + r];
            lim[r] = len < L ? len : L;
            if (lim[r] < lim_min) lim_min = lim[r];
        }
        for (int64_t col = 0; col < lim_min; col++) {
            uint32_t s0 = clamp_sym_m(q[0][col], qmap);
            uint32_t s1 = clamp_sym_m(q[1][col], qmap);
            uint32_t s2 = clamp_sym_m(q[2][col], qmap);
            uint32_t s3 = clamp_sym_m(q[3][col], qmap);
            qual_hist2_cell(s0, p1[0], p2[0], col, counts1, counts2,
                            counts3);
            qual_hist2_cell(s1, p1[1], p2[1], col, counts1, counts2,
                            counts3);
            qual_hist2_cell(s2, p1[2], p2[2], col, counts1, counts2,
                            counts3);
            qual_hist2_cell(s3, p1[3], p2[3], col, counts1, counts2,
                            counts3);
            p2[0] = p1[0]; p1[0] = s0;
            p2[1] = p1[1]; p1[1] = s1;
            p2[2] = p1[2]; p1[2] = s2;
            p2[3] = p1[3]; p1[3] = s3;
        }
        for (int r = 0; r < 4; r++) {
            if (lim[r] > lim_min)
                qual_hist2_row(q[r], qmap, lim_min, lim[r], &p1[r],
                               &p2[r], counts1, counts2, counts3);
            counts1[0] += (uint32_t)(L - lim[r]);
            counts2[0] += (uint32_t)(L - lim[r]);
            counts3[0] += (uint32_t)(L - lim[r]);
        }
    }
    for (; i < B; i++) {
        int64_t len = lengths[i];
        int64_t lim = len < L ? len : L;
        uint32_t prev1 = 0, prev2 = 0;
        qual_hist2_row(qual + perm[i] * L, qmap, 0, lim, &prev1, &prev2,
                       counts1, counts2, counts3);
        /* padding cells all land in (ctx 0, sym 0) — add arithmetically
         * instead of walking them (identical counts -> identical tables) */
        counts1[0] += (uint32_t)(L - lim);
        counts2[0] += (uint32_t)(L - lim);
        counts3[0] += (uint32_t)(L - lim);
    }
}

/* Exact unsigned division by reciprocal multiplication
 * (Granlund-Montgomery): for divisor f <= 2^12 and x < 2^32,
 * floor(x * ceil(2^44 / f) / 2^44) == x / f.  rcp fits u64 (f=1 ->
 * 2^44); the product needs 77 bits -> __uint128_t. */
static inline uint64_t rcp44(uint32_t f)
{
    return (((uint64_t)1 << 44) + f - 1) / f;
}

static inline uint32_t div_rcp(uint32_t x, uint64_t rcp)
{
    return (uint32_t)((unsigned __int128)x * rcp >> 44);
}

/* Quality-grid rANS encode with INLINE context derivation: no sym/ctx
 * intermediate arrays (saves ~40MB of stores+loads per block vs the
 * grid-based path), division-free coder step, and 4-way lane
 * interleaving to hide the serial x-update dependency chain.
 *
 * Bit-identical to rans_encode_lanes over qual_sym_ctx_hist's grids:
 * contexts are recomputed from the same q_ctx; the reciprocal divide
 * is exactly x/f.  Lane n owns rows [n*k, (n+1)*k), k = T/L.
 *
 * rcp: u64 [n_ctx*94] table built by build_rcp44 from freq.
 * Returns total emitted words. */
EXPORT void build_rcp44(const uint32_t *freq, int64_t n, uint64_t *rcp)
{
    for (int64_t i = 0; i < n; i++)
        rcp[i] = freq[i] ? rcp44(freq[i]) : 0;
}

/* Packed per-entry coder table: freq+cum+reciprocal in ONE 16-byte
 * struct so each encoded symbol touches one cache line instead of
 * three separate tables. */
typedef struct {
    uint32_t f, c;
    uint64_t rcp;
} enc_entry;

EXPORT void build_enc_table(const uint32_t *freq, const uint32_t *cum,
                            int64_t n, enc_entry *out)
{
    for (int64_t i = 0; i < n; i++) {
        out[i].f = freq[i];
        out[i].c = cum[i];
        out[i].rcp = freq[i] ? rcp44(freq[i]) : 0;
    }
}

EXPORT int64_t rans_encode_qual(const uint8_t *qual,
                                const int64_t *lengths,
                                const int64_t *perm, const uint8_t *qmap,
                                const enc_entry *tab,
                                int64_t B, int64_t L, int64_t T,
                                int64_t order, uint32_t *states,
                                int64_t *wcounts, uint16_t *words_cat)
{
    int64_t N = (B * L) / T;
    int64_t k = T / L;
    int64_t off = 0;
    enum { IL = 4 };
    /* heap: long-read mode runs T = L > 32768 (one alloc per block) */
    uint16_t *tmpb = (uint16_t *)malloc((size_t)IL * T * 2);
    uint16_t *tmp[IL];
    if (!tmpb)
        return -1;
    for (int i = 0; i < IL; i++)
        tmp[i] = tmpb + (size_t)i * T;
    int64_t cnt[IL];
    uint32_t x[IL];
    /* per-(lane,row) clamped-symbol scratch: srow[j][col] = valid ?
     * clamp(q - OFFSET) : 0 — the same value the ctx derivation uses
     * for s, prev1 and prev2, computed ONCE per cell instead of 3x */
    uint8_t *srow = (uint8_t *)malloc((size_t)(IL * L));
    int64_t len_j[IL];
    if (!srow) {
        free(tmpb);
        return -1;
    }
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        for (int j = 0; j < nl; j++) {
            x[j] = RANS_LOW;
            cnt[j] = 0;
        }
        for (int64_t r_off = k - 1; r_off >= 0; r_off--) {
            for (int j = 0; j < nl; j++) {
                int64_t read = (n0 + j) * k + r_off;
                const uint8_t *qrow = qual + perm[read] * L;
                int64_t len = lengths[read];
                len_j[j] = len;
                uint8_t *sj = srow + j * L;
                for (int64_t col = 0; col < len; col++)
                    sj[col] = (uint8_t)clamp_sym_m(qrow[col], qmap);
                for (int64_t col = len; col < L; col++)
                    sj[col] = 0;
            }
            for (int64_t col = L - 1; col >= 0; col--) {
                uint32_t pb = q_pb(col, (int)order);
                for (int j = 0; j < nl; j++) {
                    const uint8_t *sj = srow + j * L;
                    if (col >= len_j[j])
                        continue;   /* padding cell: full-mass ctx 0 is
                                       an EXACT rANS no-op (f = M keeps
                                       the state, emits nothing) — skip
                                       ~20%% of the grid, zero byte
                                       change (pinned by tests) */
                    uint32_t s = sj[col];
                    uint32_t prev1 = col >= 1 ? sj[col - 1] : 0u;
                    uint32_t prev2 = col >= 2 ? sj[col - 2] : 0u;
                    uint32_t c = q_ctx(prev1, prev2, pb, col == 0,
                                       col == 1, 1, (int)order);
                    const enc_entry *e = tab + (int64_t)c * Q_NSYMS + s;
                    uint32_t f = e->f;
                    uint32_t xj = x[j];
                    if ((xj >> 20) >= f) {
                        tmp[j][cnt[j]++] = (uint16_t)(xj & 0xFFFFu);
                        xj >>= 16;
                    }
                    uint32_t q = div_rcp(xj, e->rcp);
                    x[j] = (q << RANS_PROB_BITS) + (xj - q * f) + e->c;
                }
            }
        }
        for (int j = 0; j < nl; j++) {
            states[n0 + j] = x[j];
            wcounts[n0 + j] = cnt[j];
            for (int64_t i = 0; i < cnt[j]; i++)   /* decode order */
                words_cat[off + i] = tmp[j][cnt[j] - 1 - i];
            off += cnt[j];
        }
    }
    free(srow);
    free(tmpb);
    return off;
}

#include <immintrin.h>
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)
/* reversed narrow drain (decode order): 16 staging u32s per
 * load + cvt + lane-reverse + store; returns the vectorized count
 * (callers finish the sub-16 tail scalar).  Shared by the quality
 * and mask coders. */
static inline int64_t drain_words_rev(const uint32_t *tj, int64_t cj,
                                      uint16_t *dst)
{
    const __m256i rev16 = _mm256_setr_epi16(
        15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
    int64_t n16 = cj >> 4;
    for (int64_t b = 0; b < n16; b++) {
        __m512i w32 = _mm512_loadu_si512(tj + cj - 16 * (b + 1));
        __m256i w16 = _mm512_cvtepi32_epi16(w32);
        w16 = _mm256_permutexvar_epi16(rev16, w16);
        _mm256_storeu_si256((__m256i *)(dst + 16 * b), w16);
    }
    return 16 * n16;
}

/* r = 1/f for 8 u32 lanes widened to f64: RCP14 + two Newton
 * refinements.  Relative error ~2^-50, so q = trunc(x*r) is off by at
 * most one LOW for exact-integer quotients — callers MUST keep the
 * (rem >= f => q+1) fixup. */
static inline __m512d rcp_newton_pd(__m512d fd)
{
    const __m512d two = _mm512_set1_pd(2.0);
    __m512d r = _mm512_rcp14_pd(fd);
    r = _mm512_mul_pd(r, _mm512_fnmadd_pd(fd, r, two));
    r = _mm512_mul_pd(r, _mm512_fnmadd_pd(fd, r, two));
    return r;
}
#endif

#if defined(__AVX512F__) && defined(__AVX512DQ__) \
    && defined(__AVX512BW__) && defined(__AVX512VL__) \
    && defined(__AVX512VBMI__)
/* the column-major staging transpose (VBMI), the shared reversed
 * drain (BW+VL), and the coder's mask ops (BW) gate the whole _v
 * section: hosts without them fall back to the scalar coder via the
 * hasattr() dispatch in native/__init__.py */
#include <immintrin.h>



/* AVX-512 variant of rans_encode_qual: 64 lanes as FOUR interleaved
 * 16-lane groups (the per-lane state chain x -> divide -> x' is ~20
 * cycles of latency; independent chains keep the ports busy).
 * BIT-IDENTICAL output to the scalar path (pinned by tests):
 *
 * - symbols are staged COLUMN-MAJOR: the clamped rows transpose into a
 *   [L][64] strip (16x16-byte VBMI tiles), so each col step is one
 *   contiguous 64-byte load and (s, prev1, prev2) are three ROLLING
 *   widened registers.  The old per-lane 4-byte gather of
 *   (p2, p1, s) sat on the critical path (gather -> ctx -> table
 *   gather -> divide): cutting it halved the kernel (measured 54 ->
 *   29 Mcycles per 131k x 100 block on Emerald Rapids).
 * - coder tables: one u32 gather of (cum << 16 | freq) — both fit 16
 *   bits.
 * - division: q = trunc(x * r) + the one-step integer fixup, with
 *   r = 1/f from RCP14 refined by two Newton iterations (computed,
 *   not gathered — the old per-entry f64 reciprocal table cost two
 *   8-lane gathers per step).  The fixup is LOAD-BEARING: the
 *   refined product's error (< 2^-18 absolute for x < 2^32) is far
 *   under the 2^-12 gap non-integer quotients keep from integers,
 *   but an EXACT-integer quotient can still truncate one low, and
 *   (rem >= f => q+1) restores it — do not remove the fixup.
 * - renorm rule and per-lane word order exactly as the scalar code;
 *   emission (~25% of lanes per step) is one masked scatter.
 */
EXPORT int64_t rans_encode_qual_v(const uint8_t *qual,
                                  const int64_t *lengths,
                                  const int64_t *perm,
                                  const uint8_t *qmap,
                                  const uint32_t *freq,
                                  const uint32_t *cum,
                                  int64_t B, int64_t L, int64_t T,
                                  int64_t order, uint32_t *states,
                                  int64_t *wcounts, uint16_t *words_cat)
{
    int64_t N = (B * L) / T;
    int64_t k = T / L;
    int64_t off = 0;
    enum { G = 4, IL = 64 };        /* interleaved 16-lane groups */
    int64_t n_ctx =
        order == 2 ? 1 + Q_POS_BUCKETS * (Q_PREV_LEVELS + 1)
                         * Q_PREV2_LEVELS
        : order == 3 ? 1 + Q_POS_BUCKETS32 * (Q_PREV1_FULL + 1)
                     : 1 + Q_POS_BUCKETS * (Q_PREV1_FULL + 1);
    int64_t n_ent = n_ctx * Q_NSYMS;
    /* u32 emission buffer: the renorm words are written by a masked
     * scatter (4-byte granularity), narrowed to u16 at drain time */
    /* the 16-wide transpose tiles read/write in whole 16-byte pieces:
     * pad the strip width and the row buffer tail so arbitrary L
     * (tests use unaligned widths) stays in-bounds */
    int64_t Lp = (L + 15) & ~(int64_t)15;
    uint32_t *tmp = (uint32_t *)malloc((size_t)IL * T * 4);
    uint8_t *srow_buf = (uint8_t *)malloc((size_t)(IL * L + 32));
    uint8_t *cst = (uint8_t *)malloc((size_t)Lp * IL);
    uint32_t *fc = (uint32_t *)malloc((size_t)n_ent * 4);
    if (!tmp || !srow_buf || !cst || !fc) {
        free(tmp); free(srow_buf); free(cst); free(fc);
        return -1;
    }
    for (int64_t i = 0; i < n_ent; i++)
        fc[i] = (cum[i] << 16) | freq[i];
    /* zero EVERYTHING once: the transpose also reads inactive tail
     * lanes' rows (masked out downstream, but garbage bytes there
     * would push the table index out of bounds) */
    memset(srow_buf, 0, (size_t)(IL * L + 32));
    uint8_t *srow = srow_buf;

    /* 16x16 byte-transpose index vectors (two permutex2var levels):
     * inputs z0 = rows 0-3 (16B each) .. z3 = rows 12-15; level 1
     * collects 8-row half-columns, level 2 stitches full 16-byte
     * columns, 4 per output register. */
    uint8_t idxA_lo_b[64], idxA_hi_b[64], idxB_b[2][64];
    for (int c = 0; c < 8; c++)
        for (int i = 0; i < 8; i++) {
            uint8_t v = (uint8_t)(i < 4 ? 16 * i + c
                                        : 64 + 16 * (i - 4) + c);
            idxA_lo_b[8 * c + i] = v;
            idxA_hi_b[8 * c + i] = (uint8_t)(v + 8);
        }
    for (int half = 0; half < 2; half++)
        for (int c = 0; c < 4; c++)
            for (int i = 0; i < 16; i++)
                idxB_b[half][16 * c + i] = (uint8_t)(
                    (i < 8 ? 8 * (c + 4 * half) + i
                           : 64 + 8 * (c + 4 * half) + i - 8));
    const __m512i idxA_lo = _mm512_loadu_si512(idxA_lo_b);
    const __m512i idxA_hi = _mm512_loadu_si512(idxA_hi_b);
    const __m512i idxB0 = _mm512_loadu_si512(idxB_b[0]);
    const __m512i idxB1 = _mm512_loadu_si512(idxB_b[1]);

    const __m512i v94 = _mm512_set1_epi32(94);
    const __m512i vmask16 = _mm512_set1_epi32(0xFFFF);
    const __m512i vone = _mm512_set1_epi32(1);

    int32_t base_i[IL];
    for (int j = 0; j < IL; j++)
        base_i[j] = (int32_t)(j * (int64_t)T);
    __m512i vbase[G];
    for (int h = 0; h < G; h++)
        vbase[h] = _mm512_loadu_si512(base_i + 16 * h);
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        __m512i x[G], cntv[G];
        for (int h = 0; h < G; h++) {
            x[h] = _mm512_set1_epi32((int)RANS_LOW);
            cntv[h] = _mm512_setzero_si512();
        }
        for (int64_t r_off = k - 1; r_off >= 0; r_off--) {
            int32_t len_i[IL];
            int64_t lmax = 0;
            for (int j = 0; j < IL; j++) {
                int64_t len = 0;
                if (j < nl) {
                    int64_t read = (n0 + j) * k + r_off;
                    const uint8_t *qrow = qual + perm[read] * L;
                    len = lengths[read];
                    uint8_t *sj = srow + j * L;
#if defined(__AVX512BW__) && defined(__AVX512VBMI__)
                    /* map+clamp 64 bytes/step: the scalar per-byte fill
                     * was ~6 ms of every block (13 MB through a LUT).
                     * qmap via 4x VPERMB (low-6-bit select) blended by
                     * bits 6/7, then the [0,93] clamp as saturating
                     * sub + min.  Masked stores: a full-width tail
                     * store would spill into the NEXT lane's row —
                     * fatal for inactive tail lanes, whose rows must
                     * stay zero (gathered, masked downstream). */
                    {
                        const __m512i t0 = _mm512_loadu_si512(qmap);
                        const __m512i t1 = _mm512_loadu_si512(qmap + 64);
                        const __m512i t2 = _mm512_loadu_si512(qmap + 128);
                        const __m512i t3 = _mm512_loadu_si512(qmap + 192);
                        const __m512i voff = _mm512_set1_epi8(Q_OFFSET);
                        const __m512i vmax = _mm512_set1_epi8(
                            Q_NSYMS - 1);
                        const __m512i b6 = _mm512_set1_epi8(0x40);
                        const __m512i b7 = _mm512_set1_epi8(
                            (char)0x80);
                        for (int64_t col = 0; col < L; col += 64) {
                            int64_t remw = L - col;
                            __mmask64 wm = remw >= 64
                                ? ~0ULL : ((1ULL << remw) - 1);
                            int64_t remv = len - col;
                            __mmask64 lm = remv <= 0 ? 0
                                : (remv >= 64 ? ~0ULL
                                              : ((1ULL << remv) - 1));
                            __m512i q = _mm512_maskz_loadu_epi8(
                                lm, qrow + col);
                            __mmask64 m6 = _mm512_test_epi8_mask(q, b6);
                            __mmask64 m7 = _mm512_test_epi8_mask(q, b7);
                            __m512i lo = _mm512_mask_blend_epi8(
                                m6, _mm512_permutexvar_epi8(q, t0),
                                _mm512_permutexvar_epi8(q, t1));
                            __m512i hi = _mm512_mask_blend_epi8(
                                m6, _mm512_permutexvar_epi8(q, t2),
                                _mm512_permutexvar_epi8(q, t3));
                            __m512i v = _mm512_mask_blend_epi8(
                                m7, lo, hi);
                            v = _mm512_subs_epu8(v, voff);
                            v = _mm512_min_epu8(v, vmax);
                            v = _mm512_maskz_mov_epi8(lm, v);
                            _mm512_mask_storeu_epi8(sj + col, wm, v);
                        }
                    }
#else
                    for (int64_t col = 0; col < len; col++)
                        sj[col] = (uint8_t)clamp_sym_m(qrow[col], qmap);
                    for (int64_t col = len; col < L; col++)
                        sj[col] = 0;
#endif
                }
                len_i[j] = (int32_t)len;
                if (len > lmax)
                    lmax = len;
            }
            __m512i lenv[G];
            for (int h = 0; h < G; h++)
                lenv[h] = _mm512_loadu_si512(len_i + 16 * h);
            /* transpose the 64 clamped rows into the column-major
             * strip: 16x16-byte tiles, two permutex2var levels */
            for (int64_t c0 = 0; c0 < lmax; c0 += 16) {
                for (int j0 = 0; j0 < IL; j0 += 16) {
                    const uint8_t *rb = srow + (size_t)j0 * L + c0;
                    __m512i z[4], t[4], o[4];
                    for (int hz = 0; hz < 4; hz++) {
                        __m128i r0 = _mm_loadu_si128(
                            (const __m128i *)(rb + (4 * hz + 0) * L));
                        __m128i r1 = _mm_loadu_si128(
                            (const __m128i *)(rb + (4 * hz + 1) * L));
                        __m128i r2 = _mm_loadu_si128(
                            (const __m128i *)(rb + (4 * hz + 2) * L));
                        __m128i r3 = _mm_loadu_si128(
                            (const __m128i *)(rb + (4 * hz + 3) * L));
                        z[hz] = _mm512_inserti32x4(
                            _mm512_inserti32x4(
                                _mm512_inserti32x4(
                                    _mm512_castsi128_si512(r0), r1, 1),
                                r2, 2),
                            r3, 3);
                    }
                    t[0] = _mm512_permutex2var_epi8(z[0], idxA_lo, z[1]);
                    t[1] = _mm512_permutex2var_epi8(z[0], idxA_hi, z[1]);
                    t[2] = _mm512_permutex2var_epi8(z[2], idxA_lo, z[3]);
                    t[3] = _mm512_permutex2var_epi8(z[2], idxA_hi, z[3]);
                    o[0] = _mm512_permutex2var_epi8(t[0], idxB0, t[2]);
                    o[1] = _mm512_permutex2var_epi8(t[0], idxB1, t[2]);
                    o[2] = _mm512_permutex2var_epi8(t[1], idxB0, t[3]);
                    o[3] = _mm512_permutex2var_epi8(t[1], idxB1, t[3]);
                    for (int oc = 0; oc < 4; oc++)
                        for (int cc = 0; cc < 4; cc++) {
                            __m128i piece;
                            switch (cc) {
                            case 0: piece = _mm512_castsi512_si128(
                                        o[oc]); break;
                            case 1: piece = _mm512_extracti32x4_epi32(
                                        o[oc], 1); break;
                            case 2: piece = _mm512_extracti32x4_epi32(
                                        o[oc], 2); break;
                            default: piece = _mm512_extracti32x4_epi32(
                                        o[oc], 3); break;
                            }
                            _mm_storeu_si128(
                                (__m128i *)(cst
                                            + (c0 + 4 * oc + cc) * IL
                                            + j0),
                                piece);
                        }
                }
            }
            /* rolling widened symbol registers: ws = col, wp1 = col-1,
             * wp2 = col-2; only ONE fresh 64-byte column load + widen
             * per step */
            __m512i ws[G], wp1[G], wp2[G];
            {
                int64_t ctop = lmax - 1;
                for (int h = 0; h < G; h++) {
                    ws[h] = _mm512_setzero_si512();
                    wp1[h] = _mm512_setzero_si512();
                    wp2[h] = _mm512_setzero_si512();
                }
                for (int d = 0; d < 3; d++) {
                    int64_t c = ctop - d;
                    if (c < 0)
                        break;
                    __m512i v = _mm512_loadu_si512(cst + c * IL);
                    __m512i *dst = d == 0 ? ws : d == 1 ? wp1 : wp2;
                    dst[0] = _mm512_cvtepu8_epi32(
                        _mm512_castsi512_si128(v));
                    dst[1] = _mm512_cvtepu8_epi32(
                        _mm512_extracti32x4_epi32(v, 1));
                    dst[2] = _mm512_cvtepu8_epi32(
                        _mm512_extracti32x4_epi32(v, 2));
                    dst[3] = _mm512_cvtepu8_epi32(
                        _mm512_extracti32x4_epi32(v, 3));
                }
            }
            for (int64_t col = (lmax ? lmax : 0) - 1; col >= 0; col--) {
                const __m512i colv = _mm512_set1_epi32((int)col);
                uint32_t pb = q_pb(col, (int)order);
                __mmask16 valid[G];
                for (int h = 0; h < G; h++)
                    valid[h] = _mm512_cmp_epi32_mask(colv, lenv[h],
                                                     _MM_CMPINT_LT);
                __m512i fv[G], cv[G], idx[G];
                for (int h = 0; h < G; h++) {
                    __m512i s = ws[h];
                    __m512i ctx;
                    if (order == 2) {
                        __m512i pq, p2v;
                        if (col == 0) {
                            pq = _mm512_set1_epi32(Q_PREV_LEVELS);
                        } else {
                            pq = _mm512_min_epi32(
                                _mm512_srli_epi32(wp1[h], 2),
                                _mm512_set1_epi32(Q_PREV_LEVELS - 1));
                        }
                        if (col <= 1) {
                            p2v = _mm512_set1_epi32(Q_PREV2_LEVELS - 1);
                        } else {
                            p2v = _mm512_min_epi32(
                                _mm512_srli_epi32(wp2[h], 4),
                                _mm512_set1_epi32(Q_PREV2_LEVELS - 2));
                        }
                        ctx = _mm512_add_epi32(
                            _mm512_mullo_epi32(
                                _mm512_add_epi32(
                                    _mm512_set1_epi32(
                                        (int)(pb * (Q_PREV_LEVELS + 1))),
                                    pq),
                                _mm512_set1_epi32(Q_PREV2_LEVELS)),
                            p2v);
                    } else {
                        __m512i pq;
                        if (col == 0) {
                            pq = _mm512_set1_epi32(Q_PREV1_FULL);
                        } else {
                            pq = _mm512_min_epi32(
                                wp1[h],
                                _mm512_set1_epi32(Q_PREV1_FULL - 1));
                        }
                        ctx = _mm512_add_epi32(
                            pq, _mm512_set1_epi32(
                                    (int)(pb * (Q_PREV1_FULL + 1))));
                    }
                    /* valid context index is ctx+1 (0 = padding ctx) */
                    idx[h] = _mm512_add_epi32(
                        _mm512_mullo_epi32(_mm512_add_epi32(ctx, vone),
                                           v94),
                        s);
                    __m512i fcv = _mm512_i32gather_epi32(
                        idx[h], (const int *)fc, 4);
                    fv[h] = _mm512_and_si512(fcv, vmask16);
                    cv[h] = _mm512_srli_epi32(fcv, 16);
                }
                for (int h = 0; h < G; h++) {
                    /* renorm: emit low 16 where (x >> 20) >= f; the
                     * per-lane append is ONE masked scatter (lanes own
                     * disjoint tmp rows, so no conflicts) instead of a
                     * ctz-iterated scalar loop over set bits */
                    __mmask16 emit = _mm512_mask_cmp_epu32_mask(
                        valid[h], _mm512_srli_epi32(x[h], 20), fv[h],
                        _MM_CMPINT_NLT);
                    if (emit) {
                        _mm512_mask_i32scatter_epi32(
                            tmp, emit,
                            _mm512_add_epi32(vbase[h], cntv[h]),
                            _mm512_and_si512(x[h], vmask16), 4);
                        cntv[h] = _mm512_mask_add_epi32(
                            cntv[h], emit, cntv[h], vone);
                        x[h] = _mm512_mask_srli_epi32(x[h], emit,
                                                      x[h], 16);
                    }
                }
                for (int h = 0; h < G; h++) {
                    /* q = trunc(x * r) + one-step fixup, with r =
                     * 1/f from RCP14 + two Newton refinements
                     * (r <- r*(2 - f*r)): relative error (2^-14)^4
                     * plus a few f64 roundings, so the product's
                     * absolute error is < 2^-18 while non-integer
                     * quotients sit >= 2^-12 from any integer — only
                     * an exact-integer quotient can truncate one low
                     * and the (rem >= f => q+1) fixup restores it.
                     * Beats vdivpd (~8 cyc/vector throughput on the
                     * divider port) and the old rcp-table gathers.
                     * f = 0 only reaches invalid lanes (padding ctx);
                     * clamp so the reciprocal stays finite. */
                    __m512i fsafe = _mm512_max_epu32(fv[h], vone);
                    __m512d fd0 = _mm512_cvtepu32_pd(
                        _mm512_castsi512_si256(fsafe));
                    __m512d fd1 = _mm512_cvtepu32_pd(
                        _mm512_extracti64x4_epi64(fsafe, 1));
                    __m512d r0 = rcp_newton_pd(fd0);
                    __m512d r1 = rcp_newton_pd(fd1);
                    __m512d xd0 = _mm512_cvtepu32_pd(
                        _mm512_castsi512_si256(x[h]));
                    __m512d xd1 = _mm512_cvtepu32_pd(
                        _mm512_extracti64x4_epi64(x[h], 1));
                    __m256i q0 = _mm512_cvttpd_epu32(
                        _mm512_mul_pd(xd0, r0));
                    __m256i q1 = _mm512_cvttpd_epu32(
                        _mm512_mul_pd(xd1, r1));
                    __m512i q = _mm512_inserti64x4(
                        _mm512_castsi256_si512(q0), q1, 1);
                    __m512i rem = _mm512_sub_epi32(
                        x[h], _mm512_mullo_epi32(q, fv[h]));
                    __mmask16 fix = _mm512_cmp_epu32_mask(
                        rem, fv[h], _MM_CMPINT_NLT);
                    q = _mm512_mask_add_epi32(q, fix, q, vone);
                    rem = _mm512_mask_sub_epi32(rem, fix, rem, fv[h]);
                    /* x' = (q << 12) + rem + c, valid lanes only */
                    __m512i nx = _mm512_add_epi32(
                        _mm512_add_epi32(
                            _mm512_slli_epi32(q, RANS_PROB_BITS), rem),
                        cv[h]);
                    x[h] = _mm512_mask_blend_epi32(valid[h], x[h], nx);
                }
                /* roll the symbol windows: s <- p1, p1 <- p2,
                 * p2 <- fresh column col-3 (zeros below col 0 — the
                 * sentinel blends above ignore them there) */
                if (col) {
                    for (int h = 0; h < G; h++) {
                        ws[h] = wp1[h];
                        wp1[h] = wp2[h];
                    }
                    if (col >= 3) {
                        __m512i v = _mm512_loadu_si512(
                            cst + (col - 3) * IL);
                        wp2[0] = _mm512_cvtepu8_epi32(
                            _mm512_castsi512_si128(v));
                        wp2[1] = _mm512_cvtepu8_epi32(
                            _mm512_extracti32x4_epi32(v, 1));
                        wp2[2] = _mm512_cvtepu8_epi32(
                            _mm512_extracti32x4_epi32(v, 2));
                        wp2[3] = _mm512_cvtepu8_epi32(
                            _mm512_extracti32x4_epi32(v, 3));
                    } else {
                        for (int h = 0; h < G; h++)
                            wp2[h] = _mm512_setzero_si512();
                    }
                }
            }
        }
        uint32_t xout[IL];
        int32_t cnt32[IL];
        for (int h = 0; h < G; h++) {
            _mm512_storeu_si512(xout + 16 * h, x[h]);
            _mm512_storeu_si512(cnt32 + 16 * h, cntv[h]);
        }
        for (int j = 0; j < nl; j++) {
            int64_t cj = cnt32[j];
            states[n0 + j] = xout[j];
            wcounts[n0 + j] = cj;
            const uint32_t *tj = tmp + (size_t)j * T;
            int64_t done = drain_words_rev(tj, cj, words_cat + off);
            for (int64_t i = done; i < cj; i++)
                words_cat[off + i] = (uint16_t)tj[cj - 1 - i];
            off += cj;
        }
    }
    free(tmp);
    free(srow_buf);
    free(cst);
    free(fc);
    return off;
}
/* AVX-512 quality decode: 32 lanes as two interleaved 16-lane groups.
 * BIT-IDENTICAL to rans_decode_lanes2 (pinned by tests).
 *
 * Uses a FLAT slot->entry LUT like the old numpy path — but built in C
 * (a run-fill loop, ~3 ms for the 12.5MB order-1 table vs 100s of ms
 * in numpy), because for SIMD one 16-lane gather replaces the whole
 * sym8-bucket + cum-advance + freq/cum chain; the per-lane DRAM
 * latency the scalar code avoided is hidden by the gather's internal
 * parallelism plus two independent state groups.
 *
 * words_pad MUST have 2 tail pad bytes (the u16 word fetch gathers
 * 32-bit loads).  qual is fully zeroed here; only valid cells are
 * stored. */
EXPORT void build_flat_lut(const uint32_t *freq, const uint32_t *cum,
                           int64_t n_ctx, int64_t n_syms, uint32_t *lut);

EXPORT int64_t rans_decode_lanes_v(const uint32_t *states,
                                   const uint16_t *words_pad,
                                   const int64_t *wcounts,
                                   const uint16_t *freq,
                                   const uint16_t *cum,
                                   const int64_t *lengths, int64_t B,
                                   int64_t L, int64_t T, int64_t order,
                                   int64_t n_ctx, uint8_t *qual)
{
    int64_t N = (B * L) / T;
    int64_t k = T / L;
    enum { G = 4, IL = 64 };
    uint32_t *lut = (uint32_t *)malloc((size_t)n_ctx * RANS_M * 4);
    uint32_t *f32 = (uint32_t *)malloc((size_t)n_ctx * Q_NSYMS * 8);
    /* column-major staging strip [L][64]: decoded bytes land here with
     * ONE 16-byte store per group-step (the old per-lane ctz store
     * loop paid a mispredicting scalar store PER SYMBOL), then a
     * cache-resident transpose writes the row-major qual grid */
    uint8_t *stage = (uint8_t *)malloc((size_t)L * IL);
    if (!lut || !f32 || !stage) {
        free(lut);
        free(f32);
        free(stage);
        return -1;
    }
    uint32_t *c32 = f32 + n_ctx * Q_NSYMS;
    for (int64_t i = 0; i < n_ctx * Q_NSYMS; i++) {
        f32[i] = freq[i];
        c32[i] = cum[i];
    }
    build_flat_lut(f32, c32, n_ctx, Q_NSYMS, lut);
    free(f32);
    memset(qual, 0, (size_t)(B * L));

    const __m512i vff = _mm512_set1_epi32(0xFF);
    const __m512i v4095 = _mm512_set1_epi32(4095);
    const __m512i vone = _mm512_set1_epi32(1);
    const __m512i vlow = _mm512_set1_epi32(1 << 16);
    const __m512i voff = _mm512_set1_epi32(Q_OFFSET);

    int64_t wbase_all = 0;
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        __m512i x[G], p1[G], p2[G], wp[G], wend[G], wbase[G];
        int64_t cnt_base[IL];
        for (int j = 0; j < IL; j++) {
            cnt_base[j] = wbase_all;
            if (j < nl)
                wbase_all += wcounts[n0 + j];
        }
        for (int h = 0; h < G; h++) {
            int32_t xi[16], wei[16], wbi[16];
            for (int j = 0; j < 16; j++) {
                int jl = 16 * h + j;
                xi[j] = jl < nl ? (int32_t)states[n0 + jl] : 0;
                wei[j] = jl < nl ? (int32_t)wcounts[n0 + jl] : 0;
                wbi[j] = (int32_t)cnt_base[jl < nl ? jl : 0];
            }
            x[h] = _mm512_loadu_si512(xi);
            wend[h] = _mm512_loadu_si512(wei);
            wbase[h] = _mm512_loadu_si512(wbi);
            wp[h] = _mm512_setzero_si512();
            p1[h] = _mm512_setzero_si512();
            p2[h] = _mm512_setzero_si512();
        }
        for (int64_t r_off = 0; r_off < k; r_off++) {
            int32_t len_i[IL];
            uint8_t *rowp[IL];
            for (int j = 0; j < IL; j++) {
                int64_t read = (n0 + j) * k + r_off;
                len_i[j] = j < nl ? (int32_t)lengths[read] : 0;
                rowp[j] = qual + (j < nl ? read * L : 0);
            }
            __m512i lenv[G];
            int64_t lmax = 0;
            for (int j = 0; j < IL; j++)
                if (len_i[j] > lmax)
                    lmax = len_i[j];
            for (int h = 0; h < G; h++)
                lenv[h] = _mm512_loadu_si512(len_i + 16 * h);
            for (int64_t col = 0; col < lmax; col++) {
                const __m512i colv = _mm512_set1_epi32((int)col);
                uint32_t pb = q_pb(col, (int)order);
                for (int h = 0; h < G; h++) {
                    __mmask16 valid = _mm512_cmp_epi32_mask(
                        colv, lenv[h], _MM_CMPINT_LT);
                    if (!valid)
                        continue;
                    __m512i ctx;
                    if (order == 2) {
                        __m512i pq, p2v;
                        if (col == 0) {
                            pq = _mm512_set1_epi32(Q_PREV_LEVELS);
                        } else {
                            pq = _mm512_min_epi32(
                                _mm512_srli_epi32(p1[h], 2),
                                _mm512_set1_epi32(Q_PREV_LEVELS - 1));
                        }
                        if (col <= 1) {
                            p2v = _mm512_set1_epi32(Q_PREV2_LEVELS - 1);
                        } else {
                            p2v = _mm512_min_epi32(
                                _mm512_srli_epi32(p2[h], 4),
                                _mm512_set1_epi32(Q_PREV2_LEVELS - 2));
                        }
                        ctx = _mm512_add_epi32(
                            _mm512_mullo_epi32(
                                _mm512_add_epi32(
                                    _mm512_set1_epi32(
                                        (int)(pb * (Q_PREV_LEVELS + 1))),
                                    pq),
                                _mm512_set1_epi32(Q_PREV2_LEVELS)),
                            p2v);
                    } else {
                        __m512i pq;
                        if (col == 0) {
                            pq = _mm512_set1_epi32(Q_PREV1_FULL);
                        } else {
                            pq = _mm512_min_epi32(
                                p1[h],
                                _mm512_set1_epi32(Q_PREV1_FULL - 1));
                        }
                        ctx = _mm512_add_epi32(
                            pq, _mm512_set1_epi32(
                                    (int)(pb * (Q_PREV1_FULL + 1))));
                    }
                    ctx = _mm512_add_epi32(ctx, vone); /* valid ctx+1 */
                    __m512i slot = _mm512_and_si512(x[h], v4095);
                    __m512i lidx = _mm512_add_epi32(
                        _mm512_slli_epi32(ctx, 12), slot);
                    __m512i e = _mm512_i32gather_epi32(
                        lidx, (const int *)lut, 4);
                    __m512i s = _mm512_srli_epi32(e, 24);
                    __m512i f = _mm512_add_epi32(
                        _mm512_and_si512(_mm512_srli_epi32(e, 12),
                                         v4095),
                        vone);
                    __m512i cm = _mm512_and_si512(e, v4095);
                    __m512i nx = _mm512_add_epi32(
                        _mm512_sub_epi32(slot, cm),
                        _mm512_mullo_epi32(
                            f, _mm512_srli_epi32(x[h], 12)));
                    /* renorm: pull one u16 where nx < 2^16 */
                    __mmask16 need = _mm512_mask_cmp_epu32_mask(
                        valid, nx, vlow, _MM_CMPINT_LT);
                    if (need) {
                        __mmask16 have = _mm512_mask_cmp_epi32_mask(
                            need, wp[h], wend[h], _MM_CMPINT_LT);
                        __m512i widx = _mm512_add_epi32(wbase[h],
                                                        wp[h]);
                        __m512i w = _mm512_mask_i32gather_epi32(
                            _mm512_setzero_si512(), have, widx,
                            (const int *)words_pad, 2);
                        w = _mm512_and_si512(w, _mm512_set1_epi32(
                                                    0xFFFF));
                        w = _mm512_maskz_mov_epi32(have, w);
                        nx = _mm512_mask_or_epi32(
                            nx, need, _mm512_slli_epi32(nx, 16), w);
                        wp[h] = _mm512_mask_add_epi32(wp[h], need,
                                                      wp[h], vone);
                    }
                    x[h] = _mm512_mask_blend_epi32(valid, x[h], nx);
                    /* stage decoded bytes (s + 33) column-major;
                     * invalid lanes write garbage that the transpose
                     * never reads (it stops at each lane's length) */
                    __m128i sb = _mm512_cvtepi32_epi8(
                        _mm512_add_epi32(s, voff));
                    _mm_storeu_si128(
                        (__m128i *)(stage + col * IL + 16 * h), sb);
                    p2[h] = _mm512_mask_blend_epi32(valid, p2[h],
                                                    p1[h]);
                    p1[h] = _mm512_mask_blend_epi32(valid, p1[h], s);
                }
            }
            for (int j = 0; j < nl; j++) {
                int64_t len = len_i[j];
                uint8_t *row = rowp[j];
                const uint8_t *sj = stage + j;
                for (int64_t col = 0; col < len; col++)
                    row[col] = sj[col * IL];
            }
        }
    }
    free(lut);
    free(stage);
    return 0;
}
#endif  /* __AVX512F__ && __AVX512DQ__ */

/* Literal-stream helpers: order-2 base-context histogram and encode
 * with INLINE contexts (no sym/ctx grids), mirroring the lane layout of
 * streams/seqs.py (_T_LIT-long lanes over the zero-padded literal
 * stream; ctx 0 = padding past n_lits). */
EXPORT void lit_hist(const uint8_t *lits, int64_t n_lits, int64_t N,
                     int64_t T, int64_t *counts /* [17*4], zeroed */)
{
    for (int64_t lane = 0; lane < N; lane++) {
        int64_t base = lane * T;
        uint32_t p1 = 0, p2 = 0;
        for (int64_t t = 0; t < T; t++) {
            int64_t g = base + t;
            uint32_t s = g < n_lits ? lits[g] : 0u;
            uint32_t c = g < n_lits ? 1u + p1 * 4u + p2 : 0u;
            counts[(int64_t)c * 4 + s]++;
            p2 = p1;
            p1 = s;
        }
    }
}

EXPORT int64_t rans_encode_lits(const uint8_t *lits, int64_t n_lits,
                                int64_t N, int64_t T,
                                const uint32_t *freq, const uint32_t *cum,
                                const uint64_t *rcp, uint32_t *states,
                                int64_t *wcounts, uint16_t *words_cat)
{
    int64_t off = 0;
    enum { IL = 4 };
    uint16_t tmp[IL][32768];
    int64_t cnt[IL];
    uint32_t x[IL];
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        for (int j = 0; j < nl; j++) {
            x[j] = RANS_LOW;
            cnt[j] = 0;
        }
        for (int64_t t = T - 1; t >= 0; t--) {
            for (int j = 0; j < nl; j++) {
                int64_t g = (n0 + j) * T + t;
                uint32_t s = g < n_lits ? lits[g] : 0u;
                uint32_t c = 0;
                if (g < n_lits) {
                    uint32_t p1 = t >= 1 && g - 1 < n_lits ? lits[g - 1]
                                                           : 0u;
                    uint32_t p2 = t >= 2 && g - 2 < n_lits ? lits[g - 2]
                                                           : 0u;
                    c = 1u + p1 * 4u + p2;
                }
                int64_t e = (int64_t)c * 4 + s;
                uint32_t f = freq[e];
                uint32_t cm = cum[e];
                uint32_t xj = x[j];
                if ((xj >> 20) >= f) {
                    tmp[j][cnt[j]++] = (uint16_t)(xj & 0xFFFFu);
                    xj >>= 16;
                }
                uint32_t q = div_rcp(xj, rcp[e]);
                x[j] = (q << RANS_PROB_BITS) + (xj - q * f) + cm;
            }
        }
        for (int j = 0; j < nl; j++) {
            states[n0 + j] = x[j];
            wcounts[n0 + j] = cnt[j];
            for (int64_t i = 0; i < cnt[j]; i++)
                words_cat[off + i] = tmp[j][cnt[j] - 1 - i];
            off += cnt[j];
        }
    }
    return off;
}

/* Literal-base rANS decode: order-2 base context (ctx = 1 + p1*4 + p2,
 * ctx 0 = tail padding past n_lits).  Mirrors the encode-side context
 * grid built in streams/seqs.py. */
EXPORT void rans_decode_lits(const uint32_t *states,
                             const uint16_t *words_cat,
                             const int64_t *wcounts,
                             const uint32_t *decode_lut, int64_t n_lits,
                             int64_t N, int64_t T, uint8_t *out)
{
    int64_t woff = 0;
    for (int64_t n = 0; n < N; n++) {
        uint32_t x = states[n];
        const uint16_t *w = words_cat + woff;
        int64_t wend = wcounts[n];
        int64_t wp = 0;
        uint32_t prev1 = 0, prev2 = 0;
        for (int64_t t = 0; t < T; t++) {
            int64_t gpos = n * T + t;
            int valid = gpos < n_lits;
            uint32_t c = valid ? 1u + prev1 * 4u + prev2 : 0u;
            uint32_t slot = x & (RANS_M - 1);
            uint32_t e = decode_lut[(int64_t)c * RANS_M + slot];
            uint32_t s = e >> 24;
            uint32_t f = ((e >> RANS_PROB_BITS) & (RANS_M - 1)) + 1u;
            uint32_t cm = e & (RANS_M - 1);
            x = f * (x >> RANS_PROB_BITS) + slot - cm;
            if (x < RANS_LOW) {
                uint32_t word = wp < wend ? w[wp] : 0u;
                x = (x << 16) | word;
                wp++;
            }
            if (valid)
                out[gpos] = (uint8_t)s;
            prev2 = prev1;
            prev1 = s;
        }
        woff += wend;
    }
}

/* Mask-byte rANS codec: order-1 byte context (ctx = 1 + prev byte,
 * ctx 0 = tail padding) over the flattened copy-mask bytes of the
 * sequence stream.  The masks are long runs of 0xFF with sparse
 * mismatch patterns; the conditional model beats zstd-3 by ~35%
 * (measured 0.28 vs 0.44 MB per 131k-read block).  Same coder
 * conventions as the quality/literal streams (u32 state, 16-bit
 * renorm, PROB_BITS=12); lane layout mirrors rans_encode_lits. */
EXPORT void mask_hist(const uint8_t *b, int64_t nb, int64_t N,
                      int64_t T, int64_t *counts /* [257*256], zeroed */)
{
    for (int64_t lane = 0; lane < N; lane++) {
        int64_t base = lane * T;
        uint32_t p1 = 0;
        for (int64_t t = 0; t < T; t++) {
            int64_t g = base + t;
            uint32_t s = g < nb ? b[g] : 0u;
            uint32_t c = g < nb ? 1u + (t >= 1 ? p1 : 0u) : 0u;
            counts[(int64_t)c * 256 + s]++;
            p1 = s;
        }
    }
}

EXPORT int64_t rans_encode_mask(const uint8_t *b, int64_t nb,
                                int64_t N, int64_t T,
                                const uint32_t *freq, const uint32_t *cum,
                                const uint64_t *rcp, uint32_t *states,
                                int64_t *wcounts, uint16_t *words_cat)
{
    int64_t off = 0;
    enum { IL = 4 };
    uint16_t tmp[IL][32768];
    int64_t cnt[IL];
    uint32_t x[IL];
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        for (int j = 0; j < nl; j++) {
            x[j] = RANS_LOW;
            cnt[j] = 0;
        }
        for (int64_t t = T - 1; t >= 0; t--) {
            for (int j = 0; j < nl; j++) {
                int64_t g = (n0 + j) * T + t;
                uint32_t s = g < nb ? b[g] : 0u;
                uint32_t c = 0;
                if (g < nb)
                    c = 1u + (t >= 1 ? (uint32_t)b[g - 1] : 0u);
                int64_t e = (int64_t)c * 256 + s;
                uint32_t f = freq[e];
                uint32_t cm = cum[e];
                uint32_t xj = x[j];
                if ((xj >> 20) >= f) {
                    tmp[j][cnt[j]++] = (uint16_t)(xj & 0xFFFFu);
                    xj >>= 16;
                }
                uint32_t q = div_rcp(xj, rcp[e]);
                x[j] = (q << RANS_PROB_BITS) + (xj - q * f) + cm;
            }
        }
        for (int j = 0; j < nl; j++) {
            states[n0 + j] = x[j];
            wcounts[n0 + j] = cnt[j];
            for (int64_t i = 0; i < cnt[j]; i++)
                words_cat[off + i] = tmp[j][cnt[j] - 1 - i];
            off += cnt[j];
        }
    }
    return off;
}

/* Flat slot->entry decode LUT (s<<24 | (f-1)<<12 | cum) built with a
 * run-fill loop — the numpy repeat build cost 100s of ms at this
 * size.  Corrupt tables (rows not summing to M) fill the remainder
 * with the last entry instead of reading out of bounds. */
EXPORT void build_flat_lut(const uint32_t *freq, const uint32_t *cum,
                           int64_t n_ctx, int64_t n_syms, uint32_t *lut)
{
    for (int64_t c = 0; c < n_ctx; c++) {
        uint32_t *rowp = lut + c * RANS_M;
        int64_t slot = 0;
        uint32_t e = 0;
        for (int64_t s = 0; s < n_syms && slot < RANS_M; s++) {
            uint32_t f = freq[c * n_syms + s];
            if (!f)
                continue;
            e = ((uint32_t)s << 24) | ((f - 1) << RANS_PROB_BITS)
                | cum[c * n_syms + s];
            for (uint32_t i = 0; i < f && slot < RANS_M; i++)
                rowp[slot++] = e;
        }
        for (; slot < RANS_M; slot++)
            rowp[slot] = e;
    }
}

#if defined(__AVX512F__) && defined(__AVX512DQ__) && defined(__AVX512BW__) && defined(__AVX512VL__)
/* 32-lane AVX-512 mask encode (2 interleaved 16-lane groups): the
 * context is just 1 + previous INPUT byte, so one 4-byte gather at
 * g-1 yields (prev, s) and everything else mirrors the quality
 * encoder's reciprocal-multiply coder.  Bit-identical to the scalar
 * path (pinned by tests). */
EXPORT int64_t rans_encode_mask_v(const uint8_t *b, int64_t nb,
                                  int64_t N, int64_t T,
                                  const uint32_t *freq,
                                  const uint32_t *cum,
                                  uint32_t *states, int64_t *wcounts,
                                  uint16_t *words_cat)
{
    enum { G = 4, IL = 64 };
    int64_t n_ent = 257 * 256;
    /* u32 emission rows for the masked-scatter drain (see
     * rans_encode_qual_v); narrowed to u16 when concatenated */
    uint32_t *tmp = (uint32_t *)malloc((size_t)IL * T * 4);
    uint8_t *bpad = (uint8_t *)malloc((size_t)(nb + 6));
    uint32_t *fc = (uint32_t *)malloc((size_t)n_ent * 4);
    if (!tmp || !bpad || !fc) {
        free(tmp); free(bpad); free(fc);
        return -1;
    }
    bpad[0] = 0;                     /* gather at g-1 for g = 0 */
    memcpy(bpad + 1, b, (size_t)nb);
    memset(bpad + 1 + nb, 0, 5);
    for (int64_t i = 0; i < n_ent; i++)
        fc[i] = (cum[i] << 16) | freq[i];
    const __m512i vff = _mm512_set1_epi32(0xFF);
    const __m512i vmask16 = _mm512_set1_epi32(0xFFFF);
    const __m512i vone = _mm512_set1_epi32(1);
    int64_t off = 0;
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        __m512i x[G], gbase[G], cntv[G], tbase[G];
        for (int h = 0; h < G; h++) {
            int32_t gb[16], tb[16];
            for (int j = 0; j < 16; j++) {
                int jl = 16 * h + j;
                /* dead tail lanes alias lane 0 (in-bounds, masked) */
                gb[j] = (int32_t)(((jl < nl ? n0 + jl : n0) ) * T);
                tb[j] = (int32_t)(jl * (int64_t)T);
            }
            gbase[h] = _mm512_loadu_si512(gb);
            tbase[h] = _mm512_loadu_si512(tb);
            x[h] = _mm512_set1_epi32((int)RANS_LOW);
            cntv[h] = _mm512_setzero_si512();
        }
        __mmask16 live[G];
        for (int h = 0; h < G; h++) {
            unsigned m = 0;
            for (int j = 0; j < 16; j++)
                if (16 * h + j < nl)
                    m |= 1u << j;
            live[h] = (__mmask16)m;
        }
        for (int64_t t = T - 1; t >= 0; t--) {
            const __m512i tv = _mm512_set1_epi32((int)t);
            for (int h = 0; h < G; h++) {
                __m512i g = _mm512_add_epi32(gbase[h], tv);
                __mmask16 valid = _mm512_mask_cmp_epi32_mask(
                    live[h], g, _mm512_set1_epi32((int)nb),
                    _MM_CMPINT_LT);
                /* gather bpad[g-1 .. g+2]: byte0 = b[g-1], byte1 = b[g]
                 * (bpad is b shifted right by one pad byte); masked —
                 * tail-padding lanes' g runs past the buffer */
                __m512i w = _mm512_mask_i32gather_epi32(
                    _mm512_setzero_si512(), valid, g,
                    (const int *)bpad, 1);
                __m512i s = _mm512_and_si512(_mm512_srli_epi32(w, 8),
                                             vff);
                __m512i prev = t >= 1 ? _mm512_and_si512(w, vff)
                                      : _mm512_setzero_si512();
                s = _mm512_maskz_mov_epi32(valid, s);
                __m512i c = _mm512_maskz_add_epi32(valid, prev, vone);
                __m512i idx = _mm512_add_epi32(
                    _mm512_slli_epi32(c, 8), s);
                __m512i fcv = _mm512_i32gather_epi32(
                    idx, (const int *)fc, 4);
                __m512i f = _mm512_and_si512(fcv, vmask16);
                __m512i cm = _mm512_srli_epi32(fcv, 16);
                __mmask16 emit = _mm512_mask_cmp_epu32_mask(
                    live[h], _mm512_srli_epi32(x[h], 20), f,
                    _MM_CMPINT_NLT);
                if (emit) {
                    _mm512_mask_i32scatter_epi32(
                        tmp, emit,
                        _mm512_add_epi32(tbase[h], cntv[h]),
                        _mm512_and_si512(x[h], vmask16), 4);
                    cntv[h] = _mm512_mask_add_epi32(
                        cntv[h], emit, cntv[h], vone);
                    x[h] = _mm512_mask_srli_epi32(x[h], emit, x[h], 16);
                }
                /* r = 1/f by rcp14 + two Newton steps (see
                 * rans_encode_qual_v: product error < 2^-18 vs the
                 * 2^-12 quotient gap; the fixup below is load-bearing
                 * for exact-integer quotients) */
                __m512i fsafe = _mm512_max_epu32(f, vone);
                __m512d fd0 = _mm512_cvtepu32_pd(
                    _mm512_castsi512_si256(fsafe));
                __m512d fd1 = _mm512_cvtepu32_pd(
                    _mm512_extracti64x4_epi64(fsafe, 1));
                __m512d rc0 = rcp_newton_pd(fd0);
                __m512d rc1 = rcp_newton_pd(fd1);
                __m512d xd0 = _mm512_cvtepu32_pd(
                    _mm512_castsi512_si256(x[h]));
                __m512d xd1 = _mm512_cvtepu32_pd(
                    _mm512_extracti64x4_epi64(x[h], 1));
                __m256i q0 = _mm512_cvttpd_epu32(
                    _mm512_mul_pd(xd0, rc0));
                __m256i q1 = _mm512_cvttpd_epu32(
                    _mm512_mul_pd(xd1, rc1));
                __m512i q = _mm512_inserti64x4(
                    _mm512_castsi256_si512(q0), q1, 1);
                __m512i rem = _mm512_sub_epi32(
                    x[h], _mm512_mullo_epi32(q, f));
                __mmask16 fix = _mm512_cmp_epu32_mask(
                    rem, f, _MM_CMPINT_NLT);
                q = _mm512_mask_add_epi32(q, fix, q, vone);
                rem = _mm512_mask_sub_epi32(rem, fix, rem, f);
                __m512i nx = _mm512_add_epi32(
                    _mm512_add_epi32(
                        _mm512_slli_epi32(q, RANS_PROB_BITS), rem),
                    cm);
                x[h] = _mm512_mask_blend_epi32(live[h], x[h], nx);
            }
        }
        uint32_t xout[IL];
        int32_t cnt32[IL];
        for (int h = 0; h < G; h++) {
            _mm512_storeu_si512(xout + 16 * h, x[h]);
            _mm512_storeu_si512(cnt32 + 16 * h, cntv[h]);
        }
        for (int j = 0; j < nl; j++) {
            int64_t cj = cnt32[j];
            states[n0 + j] = xout[j];
            wcounts[n0 + j] = cj;
            const uint32_t *tj = tmp + (size_t)j * T;
            int64_t done = drain_words_rev(tj, cj, words_cat + off);
            for (int64_t i = done; i < cj; i++)
                words_cat[off + i] = (uint16_t)tj[cj - 1 - i];
            off += cj;
        }
    }
    free(tmp);
    free(bpad);
    free(fc);
    return off;
}

/* 32-lane mask decode over the flat LUT; ctx = 1 + previous DECODED
 * byte (carried in-register). */
EXPORT void rans_decode_mask_v(const uint32_t *states,
                               const uint16_t *words_pad,
                               const int64_t *wcounts,
                               const uint32_t *lut, int64_t nb,
                               int64_t N, int64_t T, uint8_t *out)
{
    enum { G = 4, IL = 64 };
    const __m512i v4095 = _mm512_set1_epi32(4095);
    const __m512i vone = _mm512_set1_epi32(1);
    const __m512i vlow = _mm512_set1_epi32(1 << 16);
    int64_t wbase_all = 0;
    for (int64_t n0 = 0; n0 < N; n0 += IL) {
        int nl = (int)(N - n0 < IL ? N - n0 : IL);
        __m512i x[G], prev[G], wp[G], wend[G], wbase[G], gbase[G];
        int64_t cnt_base[IL];
        for (int j = 0; j < IL; j++) {
            cnt_base[j] = wbase_all;
            if (j < nl)
                wbase_all += wcounts[n0 + j];
        }
        __mmask16 live[G];
        for (int h = 0; h < G; h++) {
            int32_t xi[16], wei[16], wbi[16], gb[16];
            unsigned lm = 0;
            for (int j = 0; j < 16; j++) {
                int jl = 16 * h + j;
                int ok = jl < nl;
                if (ok)
                    lm |= 1u << j;
                xi[j] = ok ? (int32_t)states[n0 + jl] : 0;
                wei[j] = ok ? (int32_t)wcounts[n0 + jl] : 0;
                wbi[j] = (int32_t)cnt_base[ok ? jl : 0];
                gb[j] = (int32_t)((ok ? n0 + jl : n0) * T);
            }
            live[h] = (__mmask16)lm;
            x[h] = _mm512_loadu_si512(xi);
            wend[h] = _mm512_loadu_si512(wei);
            wbase[h] = _mm512_loadu_si512(wbi);
            gbase[h] = _mm512_loadu_si512(gb);
            wp[h] = _mm512_setzero_si512();
            prev[h] = _mm512_setzero_si512();
        }
        for (int64_t t = 0; t < T; t++) {
            const __m512i tv = _mm512_set1_epi32((int)t);
            for (int h = 0; h < G; h++) {
                __m512i g = _mm512_add_epi32(gbase[h], tv);
                __mmask16 valid = _mm512_mask_cmp_epi32_mask(
                    live[h], g, _mm512_set1_epi32((int)nb),
                    _MM_CMPINT_LT);
                if (!valid)
                    continue;
                __m512i c = _mm512_maskz_add_epi32(
                    valid, t >= 1 ? prev[h] : _mm512_setzero_si512(),
                    vone);
                __m512i slot = _mm512_and_si512(x[h], v4095);
                __m512i e = _mm512_i32gather_epi32(
                    _mm512_add_epi32(_mm512_slli_epi32(c, 12), slot),
                    (const int *)lut, 4);
                __m512i s = _mm512_srli_epi32(e, 24);
                __m512i f = _mm512_add_epi32(
                    _mm512_and_si512(_mm512_srli_epi32(e, 12), v4095),
                    vone);
                __m512i cm = _mm512_and_si512(e, v4095);
                __m512i nx = _mm512_add_epi32(
                    _mm512_sub_epi32(slot, cm),
                    _mm512_mullo_epi32(
                        f, _mm512_srli_epi32(x[h], 12)));
                __mmask16 need = _mm512_mask_cmp_epu32_mask(
                    valid, nx, vlow, _MM_CMPINT_LT);
                if (need) {
                    __mmask16 have = _mm512_mask_cmp_epi32_mask(
                        need, wp[h], wend[h], _MM_CMPINT_LT);
                    __m512i w = _mm512_mask_i32gather_epi32(
                        _mm512_setzero_si512(), have,
                        _mm512_add_epi32(wbase[h], wp[h]),
                        (const int *)words_pad, 2);
                    w = _mm512_maskz_mov_epi32(
                        have, _mm512_and_si512(
                                  w, _mm512_set1_epi32(0xFFFF)));
                    nx = _mm512_mask_or_epi32(
                        nx, need, _mm512_slli_epi32(nx, 16), w);
                    wp[h] = _mm512_mask_add_epi32(wp[h], need, wp[h],
                                                  vone);
                }
                x[h] = _mm512_mask_blend_epi32(valid, x[h], nx);
                /* scatter decoded bytes: lanes stride T apart */
                __m128i sb = _mm512_cvtepi32_epi8(s);
                uint8_t sbuf[16];
                _mm_storeu_si128((__m128i *)sbuf, sb);
                unsigned m = valid;
                while (m) {
                    int j = __builtin_ctz(m);
                    m &= m - 1;
                    out[(int64_t)(n0 + 16 * h + j) * T + t] = sbuf[j];
                }
                prev[h] = _mm512_mask_blend_epi32(valid, prev[h], s);
            }
        }
    }
}
#endif  /* AVX512 mask coders */

EXPORT void rans_decode_mask(const uint32_t *states,
                             const uint16_t *words_cat,
                             const int64_t *wcounts,
                             const uint32_t *decode_lut, int64_t nb,
                             int64_t N, int64_t T, uint8_t *out)
{
    int64_t woff = 0;
    for (int64_t n = 0; n < N; n++) {
        uint32_t x = states[n];
        const uint16_t *w = words_cat + woff;
        int64_t wend = wcounts[n];
        int64_t wp = 0;
        uint32_t prev1 = 0;
        for (int64_t t = 0; t < T; t++) {
            int64_t gpos = n * T + t;
            int valid = gpos < nb;
            uint32_t c = valid ? 1u + (t >= 1 ? prev1 : 0u) : 0u;
            uint32_t slot = x & (RANS_M - 1);
            uint32_t e = decode_lut[(int64_t)c * RANS_M + slot];
            uint32_t s = e >> 24;
            uint32_t f = ((e >> RANS_PROB_BITS) & (RANS_M - 1)) + 1u;
            uint32_t cm = e & (RANS_M - 1);
            x = f * (x >> RANS_PROB_BITS) + slot - cm;
            if (x < RANS_LOW) {
                uint32_t word = wp < wend ? w[wp] : 0u;
                x = (x << 16) | word;
                wp++;
            }
            if (valid)
                out[gpos] = (uint8_t)s;
            prev1 = s;
        }
        woff += wend;
    }
}

/* In-place reverse-complement of flagged rows: reads travel
 * strand-canonical (rc flag per read); decode must flip them back to
 * input orientation [SURVEY.md §1 item 6 pair-sync; qualities are never
 * flipped].  Replaces a whole-block numpy take_along_axis that
 * materialized int64 [B, L] index matrices.
 */
EXPORT void rc_flip_rows(uint8_t *seq, const int64_t *lens,
                         const uint8_t *rc, int64_t n, int64_t L)
{
    for (int64_t i = 0; i < n; i++) {
        if (!rc[i])
            continue;
        uint8_t *row = seq + i * L;
        int64_t l = lens[i];
        int64_t a = 0, b = l - 1;
        while (a < b) {
            uint8_t x = row[a], y = row[b];
            row[a++] = (uint8_t)(3u - y);
            row[b--] = (uint8_t)(3u - x);
        }
        if (a == b)
            row[a] = (uint8_t)(3u - row[a]);
    }
}

/* Decimal lengths of non-negative int64 values (name numeric columns
 * are digit-only by construction — streams/names.py field classifier).
 */
EXPORT void dec_lens_i64(const int64_t *vals, int64_t n, int64_t *lens)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t v = vals[i];
        int64_t l = 1;
        while (v >= 10) {
            v /= 10;
            l++;
        }
        lens[i] = l;
    }
}

/* Render non-negative int64 values as decimal ASCII at offs[i] (offsets
 * precomputed from dec_lens_i64). */
EXPORT void render_ints_i64(const int64_t *vals, int64_t n,
                            const int64_t *offs, uint8_t *out)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t v = vals[i];
        int64_t end = offs[i + 1];
        uint8_t *p = out + end;
        do {
            *--p = (uint8_t)('0' + (v % 10));
            v /= 10;
        } while (v > 0);
    }
}

/* reconstruct_delta with inline bounds validation — replaces the
 * decode-side whole-matrix numpy pre-validation (unpackbits + five
 * [n, L] passes) that dominated parse cost.  Returns the number of
 * literals consumed, or -1 on any out-of-bounds copy (corrupt block:
 * predecessor before block start, source column outside [0, L), or
 * literal stream overrun).  The caller must verify the return equals
 * n_lits (catches short/overlong literal streams).
 */
EXPORT int64_t reconstruct_delta_checked(
    const uint8_t *mask_bits,  /* [n, L/8] */
    const int16_t *shifts,     /* [n] */
    const uint8_t *pred_k,     /* [n] */
    const uint8_t *lits, int64_t n_lits,
    const int64_t *lens, int64_t n, int64_t L,
    uint8_t *out /* [>=n, L], zeroed */)
{
    int64_t stride = L / 8;
    int64_t lit_off = 0;
#if defined(__AVX512F__) && defined(__AVX512BW__)
    /* 64 columns per step: one masked copy from the predecessor (the
     * per-byte bounds checks collapse to a first/last-set-bit envelope
     * test per chunk — identical accept/reject set), literals as a
     * whole-chunk memcpy when nothing matched or a ctz walk over the
     * few mismatch bits otherwise.  Was a ~2 ns/byte branchy scalar
     * loop (~24 ms/block at [131k, 100]). */
    for (int64_t i = 0; i < n; i++) {
        int64_t l = lens[i];
        const uint8_t *mb = mask_bits + i * stride;
        int64_t pi = i - 1 - (int64_t)pred_k[i];
        const uint8_t *prev = out + pi * L;
        uint8_t *row = out + i * L;
        int64_t sh = shifts[i];
        for (int64_t base = 0; base < l; base += 64) {
            int64_t take = l - base < 64 ? l - base : 64;
            uint64_t lanes = take == 64 ? ~0ULL : ((1ULL << take) - 1);
            uint64_t m = 0;
            int64_t mb_off = base >> 3;
            int64_t avail = stride - mb_off;
            memcpy(&m, mb + mb_off, avail >= 8 ? 8 : (size_t)avail);
            m &= lanes;
            uint64_t nm = lanes & ~m;
            if (m) {
                if (pi < 0)
                    return -1;
                int64_t j_lo = base + (int64_t)__builtin_ctzll(m);
                int64_t j_hi = base + 63 - (int64_t)__builtin_clzll(m);
                if (j_lo + sh < 0 || j_hi + sh >= L)
                    return -1;
                __m512i v = _mm512_maskz_loadu_epi8(
                    (__mmask64)m, prev + base + sh);
                _mm512_mask_storeu_epi8(row + base, (__mmask64)m, v);
            }
            if (nm) {
                if (lit_off + (int64_t)__builtin_popcountll(nm) > n_lits)
                    return -1;
                if (nm == lanes) {
                    memcpy(row + base, lits + lit_off, (size_t)take);
                    lit_off += take;
                } else {
                    uint64_t t = nm;
                    while (t) {
                        int64_t b = (int64_t)__builtin_ctzll(t);
                        t &= t - 1;
                        row[base + b] = lits[lit_off++];
                    }
                }
            }
        }
    }
#else
    for (int64_t i = 0; i < n; i++) {
        int64_t l = lens[i];
        const uint8_t *mb = mask_bits + i * stride;
        int64_t pi = i - 1 - (int64_t)pred_k[i];
        const uint8_t *prev = out + pi * L;
        uint8_t *row = out + i * L;
        int64_t sh = shifts[i];
        for (int64_t j = 0; j < l; j++) {
            if (mb[j >> 3] & (1u << (j & 7))) {
                int64_t s = j + sh;
                if (pi < 0 || s < 0 || s >= L)
                    return -1;
                row[j] = prev[s];
            } else {
                if (lit_off >= n_lits)
                    return -1;
                row[j] = lits[lit_off++];
            }
        }
    }
#endif
    return lit_off;
}

/* rANS table normalization — bit-identical C mirror of
 * entropy.host_normalize (which itself mirrors device_normalize).
 * Every arithmetic step is the same IEEE f32 / i32 operation in the
 * same order: scale is one f32 divide; the per-cell scaled count is
 * ((float)c * scale) * bias with f32 intermediates (two multiplies —
 * no add, so -ffp-contract cannot fuse anything); floor of a
 * nonnegative f32 is the float->int truncation.  The numpy version
 * costs ~5 ms/block across the order auto-trial's three tables
 * (multi-pass over [C, S] arrays); this single pass is ~0.3 ms. */
EXPORT void host_normalize_tbl(const int32_t *counts, int64_t C, int64_t S,
                               uint32_t *freq, uint32_t *cum)
{
    const float bias = 1.0f - 1e-5f;     /* np.float32(1.0 - 1e-5) */
    for (int64_t c = 0; c < C; c++) {
        const int32_t *ci = counts + c * S;
        uint32_t *f = freq + c * S;
        uint32_t *cm = cum + c * S;
        int32_t nnz = 0;
        int64_t total = 0;
        int32_t mx = INT32_MIN;
        /* three reductions (all auto-vectorizable: the tracked-index
         * argmax form serializes the loop) */
        for (int64_t j = 0; j < S; j++) {
            int32_t v = ci[j];
            nnz += v > 0;
            total += v;
            mx = v > mx ? v : mx;
        }
        int64_t top = 0;       /* np.argmax: first occurrence wins */
        while (ci[top] != mx)
            top++;
        if (nnz == 0) {
            memset(f, 0, (size_t)S * 4);
            f[0] = 4096;
        } else {
            /* counts fit i32 by contract (block cells < 2^31) */
            float scale = (float)(4096 - nnz) / (float)(int32_t)total;
            int32_t sum = 0;
            for (int64_t j = 0; j < S; j++) {
                int32_t v = ci[j];
                /* bitwise-branchless (the ternary form defeated GCC's
                 * if-conversion, leaving the loop scalar): v = 0
                 * scales to 0 so the truncation is safe either way */
                int32_t t = 1 + (int32_t)(((float)v * scale) * bias);
                int32_t fe = (-(int32_t)(v > 0)) & t;
                f[j] = (uint32_t)fe;
                sum += fe;
            }
            f[top] = (uint32_t)((int32_t)f[top] + (4096 - sum));
        }
        uint32_t acc = 0;
        for (int64_t j = 0; j < S; j++) {
            cm[j] = acc;
            acc += f[j];
        }
    }
}
