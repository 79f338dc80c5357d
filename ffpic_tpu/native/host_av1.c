/* AV1 coefficient decode hot path (spec 5.11.39 coeffs syntax from
 * the EOB symbol onward) — a 1:1 port of the Python oracle in
 * coding/av1_tile.py:_coeffs / coding/av1_msac.py, operating on the
 * SAME adaptive CDF memory (int32 numpy arenas owned by CdfContext,
 * layout [p0..p_{n-2}, 0, counter]) so Python and C symbols can
 * interleave within one tile.  The msac state round-trips through a
 * 5-slot int64 buffer per call.
 *
 * The split point: Python decodes all_zero + tx_type (one symbol
 * each, mode-dependent CDF selection), C decodes eob/base/br/sign/
 * golomb (the ~95% symbol volume) and dequantizes.
 *
 * The C reference (junka/ffpic) has no AV1 support at all
 * (format/avif.c:382-405 is a frame stub).
 */

#include <stdint.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

#define EC_PROB_SHIFT 6
#define EC_MIN_PROB 4
#define NUM_BASE_LEVELS 2
#define COEFF_BASE_RANGE 12
#define BR_CDF_SIZE 4
#define TX_CLASS_2D 0
#define TX_CLASS_HORIZ 1
#define TX_CLASS_VERT 2

typedef struct {
    const uint8_t *data;
    int64_t end8;        /* bits in the buffer */
    int64_t bitpos;
    uint32_t dif, rng;
    int32_t cnt;
    int allow_update;
} Msac;

static inline int msac_read_bits(Msac *m, int n)
{
    int v = 0;
    for (int i = 0; i < n; i++) {
        int bit = 0;
        if (m->bitpos < m->end8)
            bit = (m->data[m->bitpos >> 3] >> (7 - (m->bitpos & 7)))
                  & 1;
        v = (v << 1) | bit;
        m->bitpos++;
    }
    return v;
}

static inline void msac_renorm(Msac *m, uint32_t dif, uint32_t rng)
{
    int bits = 15 - (31 - __builtin_clz(rng));
    if (bits > 0) {
        rng <<= bits;
        int avail = m->cnt;
        int nb = bits < avail ? bits : (avail > 0 ? avail : 0);
        uint32_t nw = nb ? (uint32_t)msac_read_bits(m, nb) : 0;
        uint32_t padded = nw << (bits - nb);
        dif = padded ^ (((dif + 1) << bits) - 1);
        m->cnt = avail - bits;
    }
    m->dif = dif;
    m->rng = rng;
}

static int msac_symbol(Msac *m, int32_t *cdf, int n)
{
    uint32_t rng = m->rng, dif = m->dif;
    uint32_t r8 = rng >> 8, cur = rng, prev;
    int sym = -1;
    do {
        sym++;
        prev = cur;
        if (sym < n - 1)
            cur = ((r8 * ((uint32_t)cdf[sym] >> EC_PROB_SHIFT)) >> 1)
                  + EC_MIN_PROB * (uint32_t)(n - 1 - sym);
        else
            cur = 0;
    } while (dif < cur);
    msac_renorm(m, dif - cur, prev - cur);
    if (m->allow_update) {
        int count = cdf[n];
        int rate = 3 + (count > 15) + (count > 31) + (n < 4 ? 1 : 2);
        for (int i = 0; i < n - 1; i++) {
            if (i < sym)
                cdf[i] += (32768 - cdf[i]) >> rate;
            else
                cdf[i] -= cdf[i] >> rate;
        }
        cdf[n] = count + (count < 32);
    }
    return sym;
}

static inline int msac_bool_equi(Msac *m)
{
    uint32_t rng = m->rng, dif = m->dif;
    uint32_t cur = (((rng >> 8) * (16384u >> EC_PROB_SHIFT)) >> 1)
                   + EC_MIN_PROB;
    if (dif >= cur) {
        msac_renorm(m, dif - cur, rng - cur);
        return 0;
    }
    msac_renorm(m, dif, cur);
    return 1;
}

/* read_golomb, the av1_tile.py:_golomb formulation (31-run cap) */
static int64_t golomb(Msac *m)
{
    int length = 0;
    while (!msac_bool_equi(m)) {
        length++;
        if (length > 31)
            break;
    }
    int64_t x = 1;
    for (int i = 0; i < length; i++)
        x = (x << 1) | msac_bool_equi(m);
    return x - 1;
}

static inline int imin(int a, int b) { return a < b ? a : b; }

/* Decode one TB's coefficients from the EOB symbol onward.
 *
 * st: [dif, rng, cnt, bitpos, allow_update] int64 in/out.
 * CDF pointers are rows/subarrays of the int32 numpy arenas:
 *   eob_pt_cdf  one row, n = eob_pt_n
 *   eob_extra   rows of width 3, indexed [eob_pt - 3]
 *   base_eob    (4, 4)  rows: ctx 0..3, n = 3
 *   base        (42, 5) rows, n = 4
 *   br          (21, 5) rows, n = 4
 *   dc_sign     one row of width 3, n = 2 (ctx resolved by Python)
 * scan: adjusted-area scan order (int32, w*h entries)
 * offtab: 5x5 2D base-ctx offsets (int32, row-major)
 * out: (h, w) int32 dequantized coefficients (zeroed by caller)
 * ret: [eob(in: from caller? no — decoded here; out), cul, dc_cat]
 */
EXPORT void av1_coeffs(
    const uint8_t *data, long long data_len, long long *st,
    int32_t *eob_pt_cdf, int eob_pt_n,
    int32_t *eob_extra, int32_t *base_eob, int32_t *base,
    int32_t *br, int32_t *dc_sign,
    const int32_t *scan, int w, int h, int cls, int dc_sctx,
    long long dc_q, long long ac_q, int shift, long long clip,
    const int32_t *offtab, int32_t *out, long long *ret)
{
    Msac m;
    m.data = data;
    m.end8 = data_len * 8;
    m.dif = (uint32_t)st[0];
    m.rng = (uint32_t)st[1];
    m.cnt = (int32_t)st[2];
    m.bitpos = st[3];
    m.allow_update = (int)st[4];

    int area = w * h;
    /* ---- eob */
    int eob_pt = msac_symbol(&m, eob_pt_cdf, eob_pt_n) + 1;
    int eob;
    if (eob_pt < 2) {
        eob = eob_pt;
    } else {
        eob = (1 << (eob_pt - 2)) + 1;
        if (eob_pt >= 3) {
            int extra = msac_symbol(&m, eob_extra + (eob_pt - 3) * 3,
                                    2);
            if (extra)
                eob += 1 << (eob_pt - 3);
            for (int i = 1; i < eob_pt - 2; i++) {
                int sh = eob_pt - 2 - 1 - i;
                if (msac_bool_equi(&m))
                    eob += 1 << sh;
            }
        }
    }

    /* ---- base levels (reverse scan) */
    int32_t lv[37 * 37];
    memset(lv, 0, sizeof(int32_t) * (h + 5) * (w + 5));
    int stride = w + 5;
    int64_t quant[1024];
    int8_t signs[1024];
    memset(quant, 0, sizeof(int64_t) * area);
    memset(signs, 0, sizeof(int8_t) * area);

    for (int ci = eob - 1; ci >= 0; ci--) {
        int pos = scan[ci];
        int row = pos / w;
        int col = pos - row * w;
        int32_t *L = lv + row * stride + col;
        int64_t level;
        if (ci == eob - 1) {
            int bctx;
            if (ci == 0)
                bctx = 0;
            else if (ci <= area / 8)
                bctx = 1;
            else if (ci <= area / 4)
                bctx = 2;
            else
                bctx = 3;
            level = msac_symbol(&m, base_eob + bctx * 4, 3) + 1;
        } else {
            int bctx;
            if (cls == TX_CLASS_2D) {
                if (pos == 0) {
                    bctx = 0;
                } else {
                    int mag = imin(L[1], 3) + imin(L[stride], 3)
                            + imin(L[stride + 1], 3) + imin(L[2], 3)
                            + imin(L[2 * stride], 3);
                    bctx = imin((mag + 1) >> 1, 4)
                         + offtab[imin(row, 4) * 5 + imin(col, 4)];
                }
            } else {
                int mag = imin(L[1], 3) + imin(L[stride], 3);
                int idx;
                if (cls == TX_CLASS_HORIZ) {
                    mag += imin(L[2], 3) + imin(L[3], 3)
                         + imin(L[4], 3);
                    idx = col;
                } else {
                    mag += imin(L[2 * stride], 3)
                         + imin(L[3 * stride], 3)
                         + imin(L[4 * stride], 3);
                    idx = row;
                }
                /* LO_CTX_OFFSETS_1D = {26, 31, 36}[min(idx, 2)] */
                bctx = imin((mag + 1) >> 1, 4) + 26
                     + 5 * imin(idx, 2);
            }
            level = msac_symbol(&m, base + bctx * 5, 4);
        }
        if (level > NUM_BASE_LEVELS) {
            int mag;
            if (cls == TX_CLASS_2D)
                mag = L[1] + L[stride] + L[stride + 1];
            else if (cls == TX_CLASS_HORIZ)
                mag = L[1] + L[stride] + L[2];
            else
                mag = L[1] + L[stride] + L[2 * stride];
            int bmag = imin((mag + 1) >> 1, 6);
            int brctx;
            if (pos == 0)
                brctx = bmag;
            else if (cls == TX_CLASS_2D)
                brctx = bmag + ((row < 2 && col < 2) ? 7 : 14);
            else if (cls == TX_CLASS_HORIZ)
                brctx = bmag + (col == 0 ? 7 : 14);
            else
                brctx = bmag + (row == 0 ? 7 : 14);
            for (int k = 0; k < COEFF_BASE_RANGE / (BR_CDF_SIZE - 1);
                 k++) {
                int v = msac_symbol(&m, br + brctx * 5, 4);
                level += v;
                if (v < BR_CDF_SIZE - 1)
                    break;
            }
        }
        quant[pos] = level;
        L[0] = (int32_t)(level < 127 ? level : 127);
    }

    /* ---- signs + golomb tail (forward scan) */
    int64_t cul = 0;
    int dc_cat = 0;
    for (int ci = 0; ci < eob; ci++) {
        int pos = scan[ci];
        int64_t level = quant[pos];
        int sign = 0;
        if (level) {
            if (ci == 0)
                sign = msac_symbol(&m, dc_sign + dc_sctx * 3, 2);
            else
                sign = msac_bool_equi(&m);
        }
        if (level > NUM_BASE_LEVELS + COEFF_BASE_RANGE) {
            level += golomb(&m);
            quant[pos] = level;
        }
        if (ci == 0)
            dc_cat = level == 0 ? 0 : (sign ? 1 : 2);
        cul += level;
        signs[pos] = (int8_t)sign;
    }
    if (cul > 63)
        cul = 63;

    /* ---- dequant */
    for (int ci = 0; ci < eob; ci++) {
        int pos = scan[ci];
        int64_t level = quant[pos];
        if (!level)
            continue;
        int64_t dqv = pos == 0 ? dc_q : ac_q;
        int64_t dq = (level * dqv) & 0xFFFFFF;
        dq >>= shift;
        if (signs[pos])
            dq = -dq;
        if (dq < -clip)
            dq = -clip;
        if (dq > clip - 1)
            dq = clip - 1;
        out[pos] = (int32_t)dq;
    }

    st[0] = m.dif;
    st[1] = m.rng;
    st[2] = m.cnt;
    st[3] = m.bitpos;
    ret[0] = eob;
    ret[1] = cul;
    ret[2] = dc_cat;
}
