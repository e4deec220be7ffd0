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
#include <string.h>

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
