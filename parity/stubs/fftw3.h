/* Minimal FFTW3 drop-in so the reference compiles without libfftw3
 * (SMC.h:18; used only by fft_acf, SMC.c:1055-1093).
 *
 * Implements exactly the slice of the API the reference touches:
 *   fftw_complex, fftw_plan, fftw_malloc/fftw_free,
 *   fftw_plan_dft_r2c_1d, fftw_plan_dft_1d, fftw_execute,
 *   fftw_destroy_plan, FFTW_ESTIMATE, FFTW_BACKWARD.
 *
 * The transform is a naive O(n^2) DFT — bit-for-bit irrelevant, it only
 * needs to be numerically equivalent for small test traces.
 */
#pragma once
#include <complex.h>
#include <math.h>
#include <stdlib.h>

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
    int n = p->n;
    if (p->kind == 0) {
        /* real-to-complex: n/2+1 outputs, negative exponent */
        for (int k = 0; k <= n / 2; k++) {
            fftw_complex acc = 0.0;
            for (int j = 0; j < n; j++)
                acc += p->rin[j] * cexp(-2.0 * I * M_PI * (double)j * (double)k / n);
            p->out[k] = acc;
        }
    } else {
        int sign = p->sign;
        for (int k = 0; k < n; k++) {
            fftw_complex acc = 0.0;
            for (int j = 0; j < n; j++)
                acc += p->cin[j] *
                       cexp(sign * 2.0 * I * M_PI * (double)j * (double)k / n);
            p->out[k] = acc;
        }
    }
}

static void fftw_destroy_plan(fftw_plan p) { free(p); }
