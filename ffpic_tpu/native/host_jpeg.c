/* host_jpeg.c — native JPEG entropy decoder (the host stage of the TPU
 * pipeline).
 *
 * Replaces the per-MCU serial decode of the reference
 * (format/jpg.c:255-585 decode_data_unit/JPG_decode_scan) with a
 * single-pass scan decoder that emits whole-image planar coefficient
 * tensors (blocks_y, blocks_x, 64) in natural raster order, ready for
 * the device-side dequant+IDCT+color kernels.
 *
 * Covers: baseline + extended sequential, progressive (spectral
 * selection + successive approximation, EOB runs), interleaved and
 * single-component scans, restart intervals, 0xFF00 destuffing and
 * RSTn handling inline in the bit-refill path (the reference
 * pre-strips these in read_compressed_scan, jpg.c:587-637).
 *
 * Built as a plain shared library; driven from Python via ctypes
 * (ffpic_tpu/native/__init__.py). Differentially tested against the
 * pure-Python oracle in ffpic_tpu/formats/jpg_host.py.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define FFPIC_API __attribute__((visibility("default")))

/* zigzag index -> raster index (ITU-T81 Figure 5) */
static const uint8_t ZZ[64] = {
    0,  1,  8,  16, 9,  2,  3,  10,
    17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
};

/* ---------------- destuffed bit source ------------------------------
 *
 * The entropy stream is destuffed in ONE pass up front (0xFF00 ->
 * 0xFF, restart markers recorded as segment boundaries); the bit
 * reader then runs branch-light with 64-bit bulk refills
 * (byte-swapped loads), libjpeg-turbo style.
 */

#define MAX_SEGMENTS 65536   /* DRI=1 on a 12MP frame is ~47k segments */

typedef struct {
    uint8_t *buf;          /* destuffed bytes */
    long seg_start[MAX_SEGMENTS];
    long seg_end[MAX_SEGMENTS];
    int n_segs;
} Destuffed;

/* single pass: strip FF00 stuffing and FF fill bytes, split at RSTn,
 * stop at any other marker. Returns 0 on success. */
static int destuff(const uint8_t *src, long n, Destuffed *d) {
    d->buf = (uint8_t *)malloc(n > 0 ? n : 1);
    if (!d->buf)
        return -1;
    long w = 0;
    d->n_segs = 0;
    d->seg_start[0] = 0;
    long i = 0;
    while (i < n) {
        /* bulk-copy the run up to the next 0xFF (memchr is SIMD) */
        const uint8_t *ff = (const uint8_t *)memchr(src + i, 0xFF, n - i);
        if (ff == NULL) {
            memcpy(d->buf + w, src + i, n - i);
            w += n - i;
            break;
        }
        long run = ff - (src + i);
        if (run) {
            memcpy(d->buf + w, src + i, run);
            w += run;
            i += run;
        }
        long p = i + 1;
        while (p < n && src[p] == 0xFF)
            p++;
        if (p >= n)
            break;
        uint8_t m = src[p];
        if (m == 0x00) {
            d->buf[w++] = 0xFF;
            i = p + 1;
        } else if (m >= 0xD0 && m <= 0xD7) {
            if (d->n_segs + 1 >= MAX_SEGMENTS) {
                free(d->buf);
                d->buf = NULL;
                return -2;
            }
            d->seg_end[d->n_segs] = w;
            d->n_segs++;
            d->seg_start[d->n_segs] = w;
            i = p + 1;
        } else {
            break; /* terminating marker */
        }
    }
    d->seg_end[d->n_segs] = w;
    d->n_segs++;
    return 0;
}

typedef struct {
    const uint8_t *data;
    long len;
    long pos;
    uint64_t cache;   /* next bits left-aligned in the high bits */
    int bits;         /* number of valid bits in cache */
} BitSrc;

static inline void bs_seg(BitSrc *b, const Destuffed *d, int seg) {
    b->data = d->buf + d->seg_start[seg];
    b->len = d->seg_end[seg] - d->seg_start[seg];
    b->pos = 0;
    b->cache = 0;
    b->bits = 0;
}

static inline void bs_fill(BitSrc *b) {
    if (b->pos + 8 <= b->len) {
        uint64_t v;
        memcpy(&v, b->data + b->pos, 8);
        v = __builtin_bswap64(v);
        b->cache |= v >> b->bits;
        int take = (63 - b->bits) >> 3;
        b->pos += take;
        b->bits += take << 3;
        return;
    }
    while (b->bits <= 56) {
        uint64_t c = (b->pos < b->len) ? b->data[b->pos++] : 0;
        b->cache |= c << (56 - b->bits);
        b->bits += 8;
    }
}

static inline uint32_t bs_get(BitSrc *b, int n) {
    if (n == 0)
        return 0;
    if (b->bits < n)
        bs_fill(b);
    uint32_t v = (uint32_t)(b->cache >> 1 >> (63 - n));
    b->cache <<= n;
    b->bits -= n;
    return v;
}

static inline uint32_t bs_peek16(BitSrc *b) {
    if (b->bits < 16)
        bs_fill(b);
    return (uint32_t)(b->cache >> 48);
}

static inline void bs_consume(BitSrc *b, int n) {
    b->cache <<= n;
    b->bits -= n;
}

/* ---------------- huffman tables (flat full-length LUT) ------------- */

typedef struct {
    int maxlen;
    uint8_t *len;   /* [1<<maxlen] code length, 0 = invalid */
    int16_t *sym;   /* [1<<maxlen] decoded symbol */
    /* two-level decode: 8-bit first level fits in L1 (512 B) while the
     * flat full-length LUT above (up to 192 KiB per AC table) stays
     * cold as the slow path for codes longer than 8 bits */
    uint16_t fast[256];   /* (sym << 4) | len, 0 = use slow path */
    /* fully-combined 12-bit lookup (libjpeg-turbo style, widened):
     * one load on the top 12 cache bits yields the EXTENDed value,
     * the zero-run and the total bit consume for ~99% of symbols at
     * photo-quality tables (vs ~80% for the 8-bit window round 2
     * used).  entry = (consume << 24) | (run << 16) | (uint16)value.
     * run sentinels: 0xFF = EOB, 0xFE = ZRL (skip 16, no write),
     * 0xFD = code resolved but magnitude spills the window (value
     * field = raw run/size symbol; caller reads the magnitude bits
     * itself).  0 = code longer than 12 bits: flat-LUT slow path. */
    uint32_t full12[4096];
} HTable;

#define RUN_EOB  0xFFu
#define RUN_ZRL  0xFEu
#define RUN_CODE 0xFDu

static int htable_build(HTable *t, const uint8_t counts[16],
                        const uint8_t *syms, int is_ac) {
    int total = 0, maxlen = 0;
    for (int i = 0; i < 16; i++) {
        total += counts[i];
        if (counts[i])
            maxlen = i + 1;
    }
    t->maxlen = maxlen;
    if (maxlen == 0) {
        t->len = NULL;
        t->sym = NULL;
        return 0;
    }
    long n = 1L << maxlen;
    t->len = (uint8_t *)calloc(n, 1);
    t->sym = (int16_t *)malloc(n * sizeof(int16_t));
    if (!t->len || !t->sym)
        return -1;
    uint32_t code = 0;
    int k = 0;
    for (int bitlen = 1; bitlen <= 16; bitlen++) {
        for (int i = 0; i < counts[bitlen - 1]; i++) {
            /* corrupt DHT: canonical code space overflow */
            if (code >= (1u << bitlen)) {
                free(t->len);
                free(t->sym);
                t->len = NULL;
                t->sym = NULL;
                return -1;
            }
            int shift = maxlen - bitlen;
            long base = (long)code << shift;
            long span = 1L << shift;
            for (long w = 0; w < span; w++) {
                t->len[base + w] = (uint8_t)bitlen;
                t->sym[base + w] = syms[k];
            }
            code++;
            k++;
        }
        code <<= 1;
    }
    memset(t->fast, 0, sizeof(t->fast));
    if (maxlen <= 8) {
        for (int w = 0; w < 256; w++) {
            int idx = w >> (8 - maxlen);
            if (t->len[idx])
                t->fast[w] = (uint16_t)((t->sym[idx] << 4) | t->len[idx]);
        }
    } else {
        for (int w = 0; w < 256; w++) {
            long idx = (long)w << (maxlen - 8);
            if (t->len[idx] && t->len[idx] <= 8)
                t->fast[w] = (uint16_t)((t->sym[idx] << 4) | t->len[idx]);
        }
    }
    memset(t->full12, 0, sizeof(t->full12));
    for (int w = 0; w < 4096; w++) {
        long idx = (maxlen <= 12) ? (w >> (12 - maxlen))
                                  : ((long)w << (maxlen - 12));
        int l = t->len[idx];
        if (l == 0 || l > 12)
            continue;                 /* invalid or >12-bit code: slow */
        int sym = t->sym[idx];
        int run = (sym >> 4) & 15, sz = sym & 15;
        if (sz == 0) {
            /* AC run/size with size 0: EOB/EOBn (run<15) or ZRL
             * (run==15).  For a DC table sym IS the size, so size-0
             * (diff 0) is a combined value-0 entry instead. */
            if (!is_ac) {
                if (sym == 0)
                    t->full12[w] = ((uint32_t)l << 24);   /* diff 0 */
                /* corrupt DC sym (>15, size-0): leave 0, slow path
                 * rejects it */
            } else if (run == 15) {
                t->full12[w] = ((uint32_t)l << 24) | (RUN_ZRL << 16);
            } else {
                t->full12[w] = ((uint32_t)l << 24) | (RUN_EOB << 16)
                    | (uint16_t)run;   /* EOBn: value = r for eobrun */
            }
            continue;
        }
        if (l + sz <= 12) {
            uint32_t mag = ((uint32_t)w >> (12 - l - sz))
                & ((1u << sz) - 1);
            int val = (mag < (1u << (sz - 1)))
                ? (int)mag - (1 << sz) + 1 : (int)mag;
            t->full12[w] = ((uint32_t)(l + sz) << 24)
                | ((uint32_t)run << 16) | (uint16_t)(int16_t)val;
        } else {
            t->full12[w] = ((uint32_t)l << 24) | (RUN_CODE << 16)
                | (uint16_t)sym;
        }
    }
    return 0;
}

static void htable_free(HTable *t) {
    free(t->len);
    free(t->sym);
}

/* per-thread table cache: batch decodes reuse identical DHT segments
 * frame after frame, and rebuilding the four full12 LUTs per call is
 * ~0.3 ms — most of the fixed per-frame cost for small images.
 * Keyed on the raw counts + used symbol prefix; one slot per DHT id
 * (worker threads each get their own set via __thread). */
typedef struct {
    uint8_t key[16 + 256];
    int valid;
    HTable t;
} HCacheSlot;
static __thread HCacheSlot h_cache[8];

static int htable_get(int slot, const uint8_t counts[16],
                      const uint8_t *syms, int is_ac, HTable **out) {
    HCacheSlot *cs = &h_cache[slot];
    int total = 0;
    for (int i = 0; i < 16; i++)
        total += counts[i];
    if (total > 256)
        return -1;
    if (cs->valid && !memcmp(cs->key, counts, 16)
        && !memcmp(cs->key + 16, syms, total)) {
        *out = &cs->t;
        return 0;
    }
    if (cs->valid) {
        htable_free(&cs->t);
        cs->valid = 0;
    }
    memset(&cs->t, 0, sizeof(HTable));
    if (htable_build(&cs->t, counts, syms, is_ac) != 0)
        return -1;
    memcpy(cs->key, counts, 16);
    memcpy(cs->key + 16, syms, total);
    cs->valid = 1;
    *out = &cs->t;
    return 0;
}

static inline int decode_symbol(BitSrc *b, const HTable *t) {
    uint32_t w = bs_peek16(b);
    if (t->maxlen < 16)
        w >>= (16 - t->maxlen);
    int l = t->len[w];
    if (l == 0)
        return -1;
    bs_consume(b, l);
    return t->sym[w];
}

/* EXTEND (F.2.2.1) */
static inline int extend(uint32_t v, int n) {
    if (n == 0)
        return 0;
    if (v < (1u << (n - 1)))
        return (int)v - (1 << n) + 1;
    return (int)v;
}

/* ---------------- block decoders ----------------------------------- */

/* blk points at the 64 int16 raster-order coefficients of one block */

/* Fused refill + decode (libjpeg-turbo style): one ENSURE(32) per
 * coefficient covers the worst case code(16) + magnitude(15) bits, so
 * the symbol lookup and the magnitude read consume from the cache
 * UNCHECKED.  Soundness: reads only touch the top `bits` accounted
 * cache bits (16 + 15 <= 32 <= bits after ensure); `bits` never goes
 * negative, so bs_fill's bookkeeping invariants hold.  The stray
 * unaccounted low bits bs_fill leaves in the cache are the *same*
 * stream bytes the next fill re-ORs at the same positions (pos is not
 * advanced past them), so they are idempotent — this is the masking
 * invariant the round-1 attempt missed (NEXT.md). */
/* Decode one run/size symbol the slow way (flat full-length LUT) and
 * return it, or -1 on invalid code.  Caller has ensured >= 32 bits. */
static inline int decode_rs_slow(BitSrc *b, const HTable *t) {
    uint32_t w = (uint32_t)(b->cache >> 48) >> (16 - t->maxlen);
    int l = t->len[w];
    if (l == 0)
        return -1;
    bs_consume(b, l);
    return t->sym[w];
}

static inline int decode_block_baseline(BitSrc *b, int16_t *blk,
                                        const HTable *dc, const HTable *ac,
                                        int *pred) {
    if (b->bits < 32)
        bs_fill(b);
    uint32_t de = dc->full12[(uint32_t)(b->cache >> 52)];
    uint32_t drun = (de >> 16) & 0xFF;
    if (de && drun == 0) {
        bs_consume(b, de >> 24);
        *pred += (int16_t)(uint16_t)de;
    } else {
        int s;
        if (de && drun == RUN_CODE) {
            s = (uint16_t)de;
            bs_consume(b, de >> 24);
        } else {
            s = decode_rs_slow(b, dc);
        }
        if (s < 0 || s > 15)
            return -1;
        uint32_t v = s ? (uint32_t)(b->cache >> (64 - s)) : 0;
        bs_consume(b, s);
        *pred += extend(v, s);
    }
    blk[0] = (int16_t)*pred;
    int k = 1;
    while (k <= 63) {
        if (b->bits < 32)
            bs_fill(b);
        uint32_t fe = ac->full12[(uint32_t)(b->cache >> 52)];
        uint32_t run = (fe >> 16) & 0xFF;
        if (fe && run < 64) {
            /* combined code+magnitude hit: one lookup, one consume */
            k += run;
            if (k > 63)
                return -1;
            bs_consume(b, fe >> 24);
            blk[ZZ[k]] = (int16_t)(uint16_t)fe;
            k++;
            continue;
        }
        if (fe && run == RUN_EOB) {
            bs_consume(b, fe >> 24);
            break;
        }
        if (fe && run == RUN_ZRL) {
            bs_consume(b, fe >> 24);
            k += 16;
            continue;
        }
        int rs;
        if (fe) {                      /* RUN_CODE: magnitude spills */
            rs = (uint16_t)fe;
            bs_consume(b, fe >> 24);
        } else {
            rs = decode_rs_slow(b, ac);
            if (rs < 0)
                return -1;
        }
        int r = rs >> 4, sz = rs & 15;
        if (sz == 0) {
            if (r != 15)
                break;
            k += 16;
        } else {
            k += r;
            if (k > 63)
                return -1;
            uint32_t v = (uint32_t)(b->cache >> (64 - sz));
            bs_consume(b, sz);
            blk[ZZ[k]] = (int16_t)extend(v, sz);
            k++;
        }
    }
    return 0;
}

/* Packed-emission twin of decode_block_baseline: instead of scattering
 * into a dense 64-coeff block, append (zigzag position, value) pairs
 * for the nonzeros.  Sequential stores beat the dense path's spread
 * writes AND shrink the host->HBM staging bytes (~2.4x at photo
 * quality); the device rebuilds the dense tensor by scatter-add.
 * Returns the block's nonzero count, or -1 on a corrupt stream. */
static inline int decode_block_baseline_packed(
        BitSrc *b, const HTable *dc, const HTable *ac, int *pred,
        uint8_t *ks, int16_t *vals, long *w) {
    long w0 = *w;
    if (b->bits < 32)
        bs_fill(b);
    uint32_t de = dc->full12[(uint32_t)(b->cache >> 52)];
    uint32_t drun = (de >> 16) & 0xFF;
    if (de && drun == 0) {
        bs_consume(b, de >> 24);
        *pred += (int16_t)(uint16_t)de;
    } else {
        int s;
        if (de && drun == RUN_CODE) {
            s = (uint16_t)de;
            bs_consume(b, de >> 24);
        } else {
            s = decode_rs_slow(b, dc);
        }
        if (s < 0 || s > 15)
            return -1;
        uint32_t v = s ? (uint32_t)(b->cache >> (64 - s)) : 0;
        bs_consume(b, s);
        *pred += extend(v, s);
    }
    if (*pred != 0) {
        ks[*w] = 0;
        vals[*w] = (int16_t)*pred;
        (*w)++;
    }
    int k = 1;
    while (k <= 63) {
        if (b->bits < 32)
            bs_fill(b);
        uint32_t fe = ac->full12[(uint32_t)(b->cache >> 52)];
        uint32_t run = (fe >> 16) & 0xFF;
        if (fe && run < 64) {
            k += run;
            if (k > 63)
                return -1;
            bs_consume(b, fe >> 24);
            ks[*w] = (uint8_t)k;
            vals[*w] = (int16_t)(uint16_t)fe;
            (*w)++;
            k++;
            continue;
        }
        if (fe && run == RUN_EOB) {
            bs_consume(b, fe >> 24);
            break;
        }
        if (fe && run == RUN_ZRL) {
            bs_consume(b, fe >> 24);
            k += 16;
            continue;
        }
        int rs;
        if (fe) {
            rs = (uint16_t)fe;
            bs_consume(b, fe >> 24);
        } else {
            rs = decode_rs_slow(b, ac);
            if (rs < 0)
                return -1;
        }
        int r = rs >> 4, sz = rs & 15;
        if (sz == 0) {
            if (r != 15)
                break;
            k += 16;
        } else {
            k += r;
            if (k > 63)
                return -1;
            uint32_t v = (uint32_t)(b->cache >> (64 - sz));
            bs_consume(b, sz);
            ks[*w] = (uint8_t)k;
            vals[*w] = (int16_t)extend(v, sz);
            (*w)++;
            k++;
        }
    }
    return (int)(*w - w0);
}

static inline int decode_block_dc_first(BitSrc *b, int16_t *blk,
                                        const HTable *dc, int *pred, int al) {
    int s = decode_symbol(b, dc);
    if (s < 0 || s > 15)
        return -1;
    *pred += extend(bs_get(b, s), s);
    blk[0] = (int16_t)(*pred << al);
    return 0;
}

static inline void decode_block_dc_refine(BitSrc *b, int16_t *blk, int al) {
    if (bs_get(b, 1))
        blk[0] |= (int16_t)(1 << al);
}

static inline int decode_block_ac_first(BitSrc *b, int16_t *blk,
                                        const HTable *ac, int ss, int se,
                                        int al, int *eobrun) {
    if (*eobrun > 0) {
        (*eobrun)--;
        return 0;
    }
    int k = ss;
    while (k <= se) {
        int rs = decode_symbol(b, ac);
        if (rs < 0)
            return -1;
        int r = rs >> 4, sz = rs & 15;
        if (sz == 0) {
            if (r != 15) {
                *eobrun = (1 << r) - 1;
                if (r)
                    *eobrun += bs_get(b, r);
                break;
            }
            k += 16;
        } else {
            k += r;
            if (k > se)
                return -1;
            blk[ZZ[k]] = (int16_t)(extend(bs_get(b, sz), sz) << al);
            k++;
        }
    }
    return 0;
}

static inline int decode_block_ac_refine(BitSrc *b, int16_t *blk,
                                         const HTable *ac, int ss, int se,
                                         int al, int *eobrun) {
    int p1 = 1 << al;
    int m1 = -1 << al;
    int k = ss;
    if (*eobrun == 0) {
        while (k <= se) {
            int rs = decode_symbol(b, ac);
            if (rs < 0)
                return -1;
            int r = rs >> 4, sz = rs & 15;
            int s_val = 0;
            if (sz == 0) {
                if (r != 15) {
                    *eobrun = 1 << r;
                    if (r)
                        *eobrun += bs_get(b, r);
                    break;
                }
            } else {
                s_val = bs_get(b, 1) ? p1 : m1;
            }
            while (k <= se) {
                int16_t *c = &blk[ZZ[k]];
                if (*c != 0) {
                    if (bs_get(b, 1)) {
                        if ((*c & p1) == 0)
                            *c += (*c >= 0) ? p1 : m1;
                    }
                } else {
                    if (r == 0)
                        break;
                    r--;
                }
                k++;
            }
            if (sz && k <= se)
                blk[ZZ[k]] = (int16_t)s_val;
            k++;
        }
    }
    if (*eobrun > 0) {
        while (k <= se) {
            int16_t *c = &blk[ZZ[k]];
            if (*c != 0) {
                if (bs_get(b, 1)) {
                    if ((*c & p1) == 0)
                        *c += (*c >= 0) ? p1 : m1;
                }
            }
            k++;
        }
        (*eobrun)--;
    }
    return 0;
}

/* ---------------- scan decoder ------------------------------------- */

/* tables are passed as 8 slots: class 0 (DC) ids 0..3, class 1 (AC)
 * ids 0..3; counts: 8x16 bytes; syms: 8x256 bytes; present: 8 ints. */
FFPIC_API int ffpic_jpeg_decode_scan(
    const uint8_t *scan, long scan_len,
    const uint8_t *dht_counts, const uint8_t *dht_syms,
    const int *dht_present,
    int ncomps, const int *comp_h, const int *comp_v,
    int mcus_x, int mcus_y,
    const int *nbx, const int *nby,
    const int *nbx_actual, const int *nby_actual,
    int ns, const int *sc_comp, const int *sc_dc, const int *sc_ac,
    int ss, int se, int ah, int al, int restart_interval,
    int16_t **planes) {
    (void)nby;
    static HTable h_empty;       /* len == NULL: absent slot */
    HTable *tables[8];
    for (int i = 0; i < 8; i++) {
        tables[i] = &h_empty;
        if (dht_present[i]) {
            if (htable_get(i, dht_counts + 16 * i,
                           dht_syms + 256 * i, i >= 4,
                           &tables[i]) != 0)
                return -12;
        }
    }
    /* a corrupt scan may select absent/empty DHT slots; every table
     * the scan references must exist or the decode loop would deref
     * NULL LUTs */
    for (int si = 0; si < ns; si++) {
        if (sc_dc[si] < 0 || sc_dc[si] > 3 || sc_ac[si] < 0
            || sc_ac[si] > 3 || sc_comp[si] < 0
            || sc_comp[si] >= ncomps) {
            return -13;
        }
        int need_dc = (ss == 0 && ah == 0) || (ss == 0 && se == 63);
        int need_ac = se > 0;
        if ((need_dc && tables[sc_dc[si]]->len == NULL)
            || (need_ac && tables[4 + sc_ac[si]]->len == NULL)) {
            return -13;
        }
    }

    Destuffed ds;
    if (destuff(scan, scan_len, &ds) != 0)
        return -11;
    int cur_seg = 0;
    BitSrc bs;
    bs_seg(&bs, &ds, 0);

    int pred[4] = {0, 0, 0, 0};
    int eobrun = 0;
    int rc = 0;

    long units;
    int interleaved = ns > 1;
    int c0 = sc_comp[0];
    if (interleaved)
        units = (long)mcus_x * mcus_y;
    else
        units = (long)nbx_actual[c0] * nby_actual[c0];

    long in_interval = 0;
    for (long u = 0; u < units && rc == 0; u++) {
        if (restart_interval && in_interval == restart_interval) {
            cur_seg++;
            if (cur_seg >= ds.n_segs) {
                rc = -2;
                break;
            }
            bs_seg(&bs, &ds, cur_seg);
            for (int i = 0; i < 4; i++)
                pred[i] = 0;
            eobrun = 0;
            in_interval = 0;
        }
        in_interval++;

        if (interleaved) {
            long mx = u % mcus_x, my = u / mcus_x;
            for (int sci = 0; sci < ns && rc == 0; sci++) {
                int ci = sc_comp[sci];
                const HTable *dc = tables[sc_dc[sci]];
                const HTable *ac = tables[4 + sc_ac[sci]];
                int h = comp_h[ci], v = comp_v[ci];
                for (int vi = 0; vi < v && rc == 0; vi++) {
                    for (int hi = 0; hi < h; hi++) {
                        long by = my * v + vi, bx = mx * h + hi;
                        int16_t *blk = planes[ci] + (by * nbx[ci] + bx) * 64;
                        if (ss == 0 && ah == 0 && se == 63) {
                            rc = decode_block_baseline(&bs, blk, dc, ac,
                                                       &pred[ci]);
                        } else {
                            if (ss == 0) {
                                if (ah == 0)
                                    rc = decode_block_dc_first(&bs, blk, dc,
                                                               &pred[ci], al);
                                else
                                    decode_block_dc_refine(&bs, blk, al);
                            }
                            /* interleaved scans with se>0 and ss==0 only
                             * occur in baseline (handled above) */
                        }
                        if (rc)
                            break;
                    }
                }
            }
        } else {
            int ci = c0;
            const HTable *dc = tables[sc_dc[0]];
            const HTable *ac = tables[4 + sc_ac[0]];
            long bx = u % nbx_actual[ci], by = u / nbx_actual[ci];
            int16_t *blk = planes[ci] + (by * nbx[ci] + bx) * 64;
            if (ss == 0 && ah == 0 && se == 63) {
                rc = decode_block_baseline(&bs, blk, dc, ac, &pred[ci]);
            } else if (ss == 0) {
                if (ah == 0)
                    rc = decode_block_dc_first(&bs, blk, dc, &pred[ci], al);
                else
                    decode_block_dc_refine(&bs, blk, al);
                if (se > 0 && rc == 0)
                    rc = decode_block_ac_first(&bs, blk, ac, 1, se, al,
                                               &eobrun);
            } else {
                if (ah == 0)
                    rc = decode_block_ac_first(&bs, blk, ac, ss, se, al,
                                               &eobrun);
                else
                    rc = decode_block_ac_refine(&bs, blk, ac, ss, se, al,
                                                &eobrun);
            }
        }
    }

    free(ds.buf);
    return rc;
}

/* Packed-emission scan decoder for the common fast path: ONE
 * interleaved baseline scan covering all components (the camera/PIL
 * layout).  Emits, in MCU decode order (components in scan order,
 * v*h blocks raster within the MCU):
 *   counts[g]  nonzero count of the g-th block   (uint8, g = MCU-major)
 *   ks[i]      zigzag position of the i-th nonzero (uint8)
 *   vals[i]    its value                          (int16)
 * The caller owns the static block-order -> plane-index map (pure
 * geometry), so the device can rebuild dense coefficient tensors with
 * one scatter-add.  Returns total nonzeros or a negative error. */
FFPIC_API long ffpic_jpeg_decode_scan_packed(
    const uint8_t *scan, long scan_len,
    const uint8_t *dht_counts, const uint8_t *dht_syms,
    const int *dht_present,
    int ncomps, const int *comp_h, const int *comp_v,
    int mcus_x, int mcus_y,
    const int *nbx_actual, const int *nby_actual,
    int ns, const int *sc_comp, const int *sc_dc, const int *sc_ac,
    int restart_interval,
    uint8_t *counts, uint8_t *ks, int16_t *vals) {
    if (ns < 1 || ns != ncomps)
        return -14;
    static HTable h_empty;       /* len == NULL: absent slot */
    HTable *tables[8];
    for (int i = 0; i < 8; i++) {
        tables[i] = &h_empty;
        if (dht_present[i]) {
            if (htable_get(i, dht_counts + 16 * i,
                           dht_syms + 256 * i, i >= 4,
                           &tables[i]) != 0)
                return -12;
        }
    }
    for (int si = 0; si < ns; si++) {
        if (sc_dc[si] < 0 || sc_dc[si] > 3 || sc_ac[si] < 0
            || sc_ac[si] > 3 || sc_comp[si] < 0 || sc_comp[si] >= ncomps
            || tables[sc_dc[si]]->len == NULL
            || tables[4 + sc_ac[si]]->len == NULL) {
            return -13;
        }
    }
    Destuffed ds;
    if (destuff(scan, scan_len, &ds) != 0)
        return -11;
    int cur_seg = 0;
    BitSrc bs;
    bs_seg(&bs, &ds, 0);
    int pred[4] = {0, 0, 0, 0};
    long w = 0, g = 0;
    /* ns==1 scans are NON-interleaved (ITU-T81 A.2.2): data units are
     * single blocks of that component in raster order over its actual
     * (unpadded) block grid — matching the dense driver's layout */
    int interleaved = ns > 1;
    long units = interleaved
        ? (long)mcus_x * mcus_y
        : (long)nbx_actual[sc_comp[0]] * nby_actual[sc_comp[0]];
    long in_interval = 0;
    int rc = 0;
    for (long u = 0; u < units && rc >= 0; u++) {
        if (restart_interval && in_interval == restart_interval) {
            cur_seg++;
            if (cur_seg >= ds.n_segs) {
                rc = -2;
                break;
            }
            bs_seg(&bs, &ds, cur_seg);
            for (int i = 0; i < 4; i++)
                pred[i] = 0;
            in_interval = 0;
        }
        in_interval++;
        if (interleaved) {
            for (int sci = 0; sci < ns && rc >= 0; sci++) {
                int ci = sc_comp[sci];
                const HTable *dc = tables[sc_dc[sci]];
                const HTable *ac = tables[4 + sc_ac[sci]];
                int nb = comp_h[ci] * comp_v[ci];
                for (int bi = 0; bi < nb; bi++) {
                    rc = decode_block_baseline_packed(&bs, dc, ac,
                                                      &pred[ci], ks, vals,
                                                      &w);
                    if (rc < 0)
                        break;
                    counts[g++] = (uint8_t)rc;
                }
            }
        } else {
            int ci = sc_comp[0];
            rc = decode_block_baseline_packed(&bs, tables[sc_dc[0]],
                                              tables[4 + sc_ac[0]],
                                              &pred[ci], ks, vals, &w);
            if (rc >= 0)
                counts[g++] = (uint8_t)rc;
        }
    }
    free(ds.buf);
    return rc < 0 ? rc : w;
}

FFPIC_API const char *ffpic_native_version(void) { return "ffpic-native-3"; }

/* ---------------- sparse coefficient packing ------------------------ */

/* Pack nonzero coefficients of a plane into (flat_index, value) pairs.
 * The e2e bottleneck on a 1-vCPU TPU-VM is host->HBM bytes through the
 * tunnel; baseline-quality scans are ~85-90% zeros, so shipping
 * (int32 idx, int16 val) pairs cuts transfer ~3x vs dense planes.
 * Returns the number of nonzeros. */
FFPIC_API long ffpic_pack_nonzero(const int16_t *plane, long n,
                                  int32_t *idx, int16_t *val) {
    long w = 0;
    long i = 0;
    /* scan 4-wide; the compiler vectorizes the zero test */
    for (; i + 4 <= n; i += 4) {
        if (!(plane[i] | plane[i + 1] | plane[i + 2] | plane[i + 3]))
            continue;
        for (int k = 0; k < 4; k++) {
            if (plane[i + k]) {
                idx[w] = (int32_t)(i + k);
                val[w] = plane[i + k];
                w++;
            }
        }
    }
    for (; i < n; i++) {
        if (plane[i]) {
            idx[w] = (int32_t)i;
            val[w] = plane[i];
            w++;
        }
    }
    return w;
}

/* Expose the destuffed entropy stream + restart-segment offsets (the
 * device-side entropy decoder ships these ~raw bytes to HBM instead
 * of decoded coefficient planes — a 10-20x staging reduction).
 * out must hold >= n bytes; seg_bounds holds MAX_SEGMENTS+1 longs.
 * Returns the number of segments (seg_bounds[i]..seg_bounds[i+1] are
 * byte ranges into out), or <0 on error. */
FFPIC_API int ffpic_jpeg_destuff(const uint8_t *src, long n,
                                 uint8_t *out, long *seg_bounds,
                                 long *out_len) {
    Destuffed d;
    if (destuff(src, n, &d) != 0)
        return -1;
    long total = d.seg_end[d.n_segs - 1];
    memcpy(out, d.buf, total);
    seg_bounds[0] = d.seg_start[0];
    for (int s = 0; s < d.n_segs; s++)
        seg_bounds[s + 1] = d.seg_end[s];
    /* segments are contiguous in buf (start[i+1] == end[i]) */
    *out_len = total;
    free(d.buf);
    return d.n_segs;
}
