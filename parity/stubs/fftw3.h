/* FFTW3 drop-in so the reference compiles and runs fast without libfftw3
 * (SMC.h:18; used only by fft_acf, SMC.c:1055-1093).
 *
 * Implements exactly the slice of the API the reference touches:
 *   fftw_complex, fftw_plan, fftw_malloc/fftw_free,
 *   fftw_plan_dft_r2c_1d, fftw_plan_dft_1d, fftw_execute,
 *   fftw_destroy_plan, FFTW_ESTIMATE, FFTW_BACKWARD.
 *
 * Transform engine: iterative radix-2 Cooley-Tukey for power-of-two
 * lengths, Bluestein's chirp-z algorithm (exact, O(n log n)) otherwise —
 * long energy traces (1e5+ sweeps) stay tractable, unlike a naive DFT.
 */
#pragma once
#include <complex.h>
#include <math.h>
#include <stdlib.h>
#include <string.h>

typedef double complex fftw_complex;

#define FFTW_ESTIMATE 0
#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)

typedef struct fftw_plan_s {
    int kind; /* 0 = r2c, 1 = c2c */
    int n;
    double *rin;
    fftw_complex *cin;
    fftw_complex *out;
    int sign;
} *fftw_plan;

static void *fftw_malloc(size_t sz) { return malloc(sz); }
static void fftw_free(void *p) { free(p); }

/* ---- radix-2 iterative FFT (in place), length must be a power of 2 --- */
static void fftw_stub_pow2(fftw_complex *a, size_t n, int sign) {
    /* bit-reversal permutation */
    for (size_t i = 1, j = 0; i < n; i++) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) { fftw_complex t = a[i]; a[i] = a[j]; a[j] = t; }
    }
    for (size_t len = 2; len <= n; len <<= 1) {
        double ang = sign * 2.0 * M_PI / (double)len;
        fftw_complex wl = cos(ang) + I * sin(ang);
        for (size_t i = 0; i < n; i += len) {
            fftw_complex w = 1.0;
            for (size_t k = 0; k < len / 2; k++) {
                fftw_complex u = a[i + k];
                fftw_complex v = a[i + k + len / 2] * w;
                a[i + k] = u + v;
                a[i + k + len / 2] = u - v;
                w *= wl;
            }
        }
    }
}

/* ---- Bluestein chirp-z: exact DFT of arbitrary length --------------- */
static void fftw_stub_dft(const fftw_complex *in, fftw_complex *out,
                          size_t n, int sign) {
    if ((n & (n - 1)) == 0) { /* power of two: direct radix-2 */
        memcpy(out, in, n * sizeof(fftw_complex));
        fftw_stub_pow2(out, n, sign);
        return;
    }
    size_t m = 1;
    while (m < 2 * n + 1) m <<= 1;
    fftw_complex *a = (fftw_complex *)calloc(m, sizeof(fftw_complex));
    fftw_complex *b = (fftw_complex *)calloc(m, sizeof(fftw_complex));
    fftw_complex *chirp = (fftw_complex *)malloc(n * sizeof(fftw_complex));
    for (size_t k = 0; k < n; k++) {
        /* chirp_k = exp(sign * i*pi*k^2/n); reduce k^2 mod 2n first to
         * keep the trig argument small and exact. */
        unsigned long long k2 = ((unsigned long long)k * k) % (2ULL * n);
        double ang = sign * M_PI * (double)k2 / (double)n;
        chirp[k] = cos(ang) + I * sin(ang);
        a[k] = in[k] * chirp[k];
        b[k] = conj(chirp[k]);
        if (k) b[m - k] = conj(chirp[k]);
    }
    fftw_stub_pow2(a, m, -1);
    fftw_stub_pow2(b, m, -1);
    for (size_t k = 0; k < m; k++) a[k] *= b[k];
    fftw_stub_pow2(a, m, +1);
    for (size_t k = 0; k < m; k++) a[k] /= (double)m;
    for (size_t k = 0; k < n; k++) out[k] = a[k] * chirp[k];
    free(a); free(b); free(chirp);
}

static fftw_plan fftw_plan_dft_r2c_1d(int n, double *in, fftw_complex *out,
                                      unsigned flags) {
    (void)flags;
    fftw_plan p = (fftw_plan)malloc(sizeof(*p));
    p->kind = 0; p->n = n; p->rin = in; p->cin = 0; p->out = out; p->sign = -1;
    return p;
}

static fftw_plan fftw_plan_dft_1d(int n, fftw_complex *in, fftw_complex *out,
                                  int sign, unsigned flags) {
    (void)flags;
    fftw_plan p = (fftw_plan)malloc(sizeof(*p));
    p->kind = 1; p->n = n; p->rin = 0; p->cin = in; p->out = out; p->sign = sign;
    return p;
}

static void fftw_execute(fftw_plan p) {
    size_t n = (size_t)p->n;
    if (p->kind == 0) {
        fftw_complex *tmp = (fftw_complex *)malloc(n * sizeof(fftw_complex));
        fftw_complex *full = (fftw_complex *)malloc(n * sizeof(fftw_complex));
        for (size_t i = 0; i < n; i++) tmp[i] = p->rin[i];
        fftw_stub_dft(tmp, full, n, -1);
        memcpy(p->out, full, (n / 2 + 1) * sizeof(fftw_complex));
        free(tmp); free(full);
    } else {
        fftw_complex *full = (fftw_complex *)malloc(n * sizeof(fftw_complex));
        fftw_stub_dft(p->cin, full, n, p->sign);
        memcpy(p->out, full, n * sizeof(fftw_complex));
        free(full);
    }
}

static void fftw_destroy_plan(fftw_plan p) { free(p); }
