/* Host-side vectorized 256-bit prime-field arithmetic (Montgomery form,
 * R = 2^256, four 64-bit limbs little-endian).
 *
 * Backs the prover's host-bigint sumcheck tails (piop/sum_check.py): below
 * the host-tail threshold every round is pure host latency, and this CIOS
 * kernel runs ~15-30x faster than numpy object-int (a*b) % p, which lets the
 * tail threshold swallow most of the GKR layer sumchecks that previously
 * round-tripped the device tunnel (see VERDICT r4 Next #1).
 *
 * Generic over the modulus: every entry point takes p (4 limbs) and
 * inv = -p^{-1} mod 2^64, so BN254 Fr/Fq and the Pasta fields share it.
 * The device layout (uint32[...,16] 16-bit limbs, R = 2^(16*16) = 2^256)
 * packs losslessly into this layout with the SAME Montgomery scaling.
 *
 * Build: gcc -O3 -shared -fPIC -o libfield256.so field256.c
 */

#include <stddef.h>
#include <stdint.h>

typedef uint64_t u64;
typedef unsigned __int128 u128;

/* ---- scalar core ---------------------------------------------------- */

static inline int geq_p(const u64 t[4], const u64 p[4]) {
    for (int i = 3; i >= 0; i--) {
        if (t[i] > p[i]) return 1;
        if (t[i] < p[i]) return 0;
    }
    return 1;
}

static inline void sub_p(u64 t[4], const u64 p[4]) {
    u128 bor = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)t[i] - p[i] - (u64)bor;
        t[i] = (u64)d;
        bor = (d >> 64) ? 1 : 0;
    }
}

/* CIOS Montgomery multiply: out = a*b*R^{-1} mod p.  Inputs < p, output < p. */
static inline void mont_mul1(const u64 a[4], const u64 b[4], u64 out[4],
                             const u64 p[4], u64 inv) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)t[j] + (u128)a[i] * b[j] + (u64)c;
            t[j] = (u64)s;
            c = s >> 64;
        }
        u128 s4 = (u128)t[4] + (u64)c;
        t[4] = (u64)s4;
        t[5] = (u64)(s4 >> 64);

        u64 m = t[0] * inv;
        c = ((u128)t[0] + (u128)m * p[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 s = (u128)t[j] + (u128)m * p[j] + (u64)c;
            t[j - 1] = (u64)s;
            c = s >> 64;
        }
        u128 s5 = (u128)t[4] + (u64)c;
        t[3] = (u64)s5;
        t[4] = t[5] + (u64)(s5 >> 64);
    }
    if (t[4] || geq_p(t, p)) sub_p(t, p);
    for (int i = 0; i < 4; i++) out[i] = t[i];
}

static inline void add1(const u64 a[4], const u64 b[4], u64 out[4], const u64 p[4]) {
    u128 c = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + (u64)c;
        t[i] = (u64)s;
        c = s >> 64;
    }
    if (c || geq_p(t, p)) sub_p(t, p);
    for (int i = 0; i < 4; i++) out[i] = t[i];
}

static inline void sub1(const u64 a[4], const u64 b[4], u64 out[4], const u64 p[4]) {
    u128 bor = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - (u64)bor;
        t[i] = (u64)d;
        bor = (d >> 64) ? 1 : 0;
    }
    if (bor) {
        u128 c = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + p[i] + (u64)c;
            t[i] = (u64)s;
            c = s >> 64;
        }
    }
    for (int i = 0; i < 4; i++) out[i] = t[i];
}

/* ---- vector entry points -------------------------------------------- */

void f256_mul(const u64 *a, const u64 *b, u64 *out, long n,
              const u64 *p, u64 inv) {
    for (long i = 0; i < n; i++)
        mont_mul1(a + 4 * i, b + 4 * i, out + 4 * i, p, inv);
}

void f256_mul_scalar(const u64 *a, const u64 *s, u64 *out, long n,
                     const u64 *p, u64 inv) {
    for (long i = 0; i < n; i++)
        mont_mul1(a + 4 * i, s, out + 4 * i, p, inv);
}

void f256_add(const u64 *a, const u64 *b, u64 *out, long n, const u64 *p) {
    for (long i = 0; i < n; i++)
        add1(a + 4 * i, b + 4 * i, out + 4 * i, p);
}

void f256_add_scalar(const u64 *a, const u64 *s, u64 *out, long n, const u64 *p) {
    for (long i = 0; i < n; i++)
        add1(a + 4 * i, s, out + 4 * i, p);
}

void f256_sub(const u64 *a, const u64 *b, u64 *out, long n, const u64 *p) {
    for (long i = 0; i < n; i++)
        sub1(a + 4 * i, b + 4 * i, out + 4 * i, p);
}

void f256_sub_scalar(const u64 *a, const u64 *s, u64 *out, long n, const u64 *p) {
    for (long i = 0; i < n; i++)
        sub1(a + 4 * i, s, out + 4 * i, p);
}

void f256_scalar_sub(const u64 *s, const u64 *a, u64 *out, long n, const u64 *p) {
    for (long i = 0; i < n; i++)
        sub1(s, a + 4 * i, out + 4 * i, p);
}

/* out = lo + (hi - lo) * r   (the sumcheck fold / fix_var primitive) */
void f256_fold(const u64 *lo, const u64 *hi, const u64 *r, u64 *out, long n,
               const u64 *p, u64 inv) {
    u64 d[4], m[4];
    for (long i = 0; i < n; i++) {
        sub1(hi + 4 * i, lo + 4 * i, d, p);
        mont_mul1(d, r, m, p, inv);
        add1(lo + 4 * i, m, out + 4 * i, p);
    }
}

/* strided fold: out[i] = v[2i] + (v[2i+1] - v[2i]) * r  over n output elts */
void f256_fold_pairs(const u64 *v, const u64 *r, u64 *out, long n,
                     const u64 *p, u64 inv) {
    u64 d[4], m[4];
    for (long i = 0; i < n; i++) {
        const u64 *lo = v + 8 * i, *hi = v + 8 * i + 4;
        sub1(hi, lo, d, p);
        mont_mul1(d, r, m, p, inv);
        add1(lo, m, out + 4 * i, p);
    }
}

void f256_sum(const u64 *a, u64 *out, long n, const u64 *p) {
    u64 acc[4] = {0, 0, 0, 0};
    for (long i = 0; i < n; i++) add1(acc, a + 4 * i, acc, p);
    for (int i = 0; i < 4; i++) out[i] = acc[i];
}

/* out = sum_i a[i]*b[i] (Montgomery products) */
void f256_dot(const u64 *a, const u64 *b, u64 *out, long n,
              const u64 *p, u64 inv) {
    u64 acc[4] = {0, 0, 0, 0}, m[4];
    for (long i = 0; i < n; i++) {
        mont_mul1(a + 4 * i, b + 4 * i, m, p, inv);
        add1(acc, m, acc, p);
    }
    for (int i = 0; i < 4; i++) out[i] = acc[i];
}

/* out = sum_i (a1[i]-a0[i]) * (b1[i]-b0[i]) — the coeff-prover c2 term,
 * fused so the differences never materialize */
void f256_dot_diff(const u64 *a0, const u64 *a1, const u64 *b0, const u64 *b1,
                   u64 *out, long n, const u64 *p, u64 inv) {
    u64 acc[4] = {0, 0, 0, 0}, da[4], db[4], m[4];
    for (long i = 0; i < n; i++) {
        sub1(a1 + 4 * i, a0 + 4 * i, da, p);
        sub1(b1 + 4 * i, b0 + 4 * i, db, p);
        mont_mul1(da, db, m, p, inv);
        add1(acc, m, acc, p);
    }
    for (int i = 0; i < 4; i++) out[i] = acc[i];
}

/* GKR fraction-tree layer step over packed quadrants:
 *   pn = pl*qr + pr*ql,  qn = ql*qr  (piop/gkr.py layer semantics) */
void f256_gkr_layer(const u64 *pl, const u64 *pr, const u64 *ql, const u64 *qr,
                    u64 *pn, u64 *qn, long n, const u64 *p, u64 inv) {
    u64 x[4], y[4];
    for (long i = 0; i < n; i++) {
        mont_mul1(pl + 4 * i, qr + 4 * i, x, p, inv);
        mont_mul1(pr + 4 * i, ql + 4 * i, y, p, inv);
        add1(x, y, pn + 4 * i, p);
        mont_mul1(ql + 4 * i, qr + 4 * i, qn + 4 * i, p, inv);
    }
}

/* eq(X, y) doubling expansion into out[0..2^k): processes y_i from i=k-1
 * down to 0, interleaving (lo, hi) so output index bit i corresponds to
 * y_i — identical ordering to poly/multilinear.py eq_xy. y: k packed
 * elements; out must hold 2^k elements; one: R mod p (Montgomery 1). */
void f256_eq_expand(const u64 *y, long k, const u64 *one, u64 *out,
                    const u64 *p, u64 inv) {
    u64 hi[4], lo[4];
    out[0] = one[0]; out[1] = one[1]; out[2] = one[2]; out[3] = one[3];
    long m = 1;
    for (long i = k - 1; i >= 0; i--) {
        const u64 *yi = y + 4 * i;
        /* expand in place back-to-front */
        for (long j = m - 1; j >= 0; j--) {
            mont_mul1(out + 4 * j, yi, hi, p, inv);
            sub1(out + 4 * j, hi, lo, p);
            u64 *d = out + 8 * j;
            d[0] = lo[0]; d[1] = lo[1]; d[2] = lo[2]; d[3] = lo[3];
            d[4] = hi[0]; d[5] = hi[1]; d[6] = hi[2]; d[7] = hi[3];
        }
        m <<= 1;
    }
}
