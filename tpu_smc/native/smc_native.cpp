// Native runtime components for tpu_smc (C++, loaded via ctypes).
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host
// runtime around it, mirroring the roles native code plays in the C
// reference:
//   * glibc-compatible rand()/Box-Muller — bit-exact geometry parity with
//     the reference's srand(42) wall/lattice construction (SMC.c:415,477;
//     matematicose.c:183-193). Same algorithm as tpu_smc.rng.GlibcRandom;
//     the two implementations are cross-checked in tests.
//   * high-throughput CSV serialization for the voxel ("local") and
//     position artifacts — the hot host-I/O path when dumping 33x33x33
//     voxel grids per storage window (SMC.c:158-189, 218-225).
//   * a reference-semantics Common Neighbour Analysis oracle (the
//     aliased-index C algorithm, SMC.c:971-1045) for fast parity checks.
//
// Build: g++ -O2 -shared -fPIC (driven by tpu_smc/native/__init__.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// ----------------------------------------------------------------------
// glibc rand() (TYPE_3: degree 31, separation 3)
// ----------------------------------------------------------------------

struct GlibcRng {
    uint32_t ring[31];
    int idx;  // position of the oldest element
};

static_assert(sizeof(GlibcRng) == 128, "layout");

void glibc_srand(GlibcRng *st, uint32_t seed) {
    if (seed == 0) seed = 1;
    int64_t r[344];
    r[0] = seed;
    for (int i = 1; i < 31; i++) {
        int64_t hi = r[i - 1] / 127773;
        int64_t lo = r[i - 1] % 127773;
        int64_t word = 16807 * lo - 2836 * hi;
        if (word < 0) word += 2147483647;
        r[i] = word;
    }
    for (int i = 31; i < 34; i++) r[i] = r[i - 31];
    for (int i = 34; i < 344; i++)
        r[i] = (uint32_t)((uint64_t)r[i - 31] + (uint64_t)r[i - 3]);
    for (int i = 0; i < 31; i++) st->ring[i] = (uint32_t)r[313 + i];
    st->idx = 0;
}

static inline uint32_t glibc_next(GlibcRng *st) {
    // ring[idx] is r[t-31]; r[t-3] is 28 ahead of it
    uint32_t val = st->ring[st->idx] + st->ring[(st->idx + 28) % 31];
    st->ring[st->idx] = val;
    st->idx = (st->idx + 1) % 31;
    return val >> 1;
}

uint32_t glibc_rand(GlibcRng *st) { return glibc_next(st); }

void glibc_rand_fill(GlibcRng *st, uint32_t *out, int64_t n) {
    for (int64_t i = 0; i < n; i++) out[i] = glibc_next(st);
}

// vecBoxMuller (matematicose.c:183-193): pairs from rand()/(RAND_MAX+1),
// loop bound length/2 in size_t arithmetic (odd tail left as given).
void glibc_box_muller(GlibcRng *st, double sigma, int64_t length,
                      double *out) {
    const double denom = 2147483648.0;  // RAND_MAX + 1
    int64_t iters = length / 2;
    for (int64_t i = 0; i < iters; i++) {
        double x1 = glibc_next(st) / denom;
        double x2 = glibc_next(st) / denom;
        out[2 * i] = sigma * sqrt(-2.0 * log(1.0 - x1)) * cos(2.0 * M_PI * x2);
        out[2 * i + 1] =
            sigma * sqrt(-2.0 * log(1.0 - x2)) * sin(2.0 * M_PI * x1);
    }
    if (length % 2) out[length - 1] = 0.0;  // fresh-malloc zero in practice
}

// ----------------------------------------------------------------------
// CSV serialization
// ----------------------------------------------------------------------

// Voxel rows "i, j, k, n, mu\n" for an [ncx, ncx, ncz] grid pair.
// Returns bytes written; `cap` guards the buffer.
int64_t format_local_rows(const uint64_t *density, const uint64_t *mobility,
                          int ncx, int ncz, char *buf, int64_t cap) {
    char *p = buf;
    char *end = buf + cap - 96;
    for (int i = 0; i < ncx; i++) {
        for (int j = 0; j < ncx; j++) {
            for (int k = 0; k < ncz; k++) {
                if (p > end) return -1;
                int64_t v = (int64_t)(i * ncx * ncz + j * ncz + k);
                p += sprintf(p, "%d, %d, %d, %llu, %llu\n", i, j, k,
                             (unsigned long long)density[v],
                             (unsigned long long)mobility[v]);
            }
        }
    }
    return p - buf;
}

// Position row "%0.3f," per value + newline (SMC.c:162-164 format).
int64_t format_positions_row(const double *r, int64_t n3, char *buf,
                             int64_t cap) {
    char *p = buf;
    char *end = buf + cap - 32;
    for (int64_t i = 0; i < n3; i++) {
        if (p > end) return -1;
        p += sprintf(p, "%0.3f,", r[i]);
    }
    *p++ = '\n';
    return p - buf;
}

// last_state row: "%0.12f," per value (main.c:169-170 format).
int64_t format_last_state(const double *r, int64_t n3, char *buf,
                          int64_t cap) {
    char *p = buf;
    char *end = buf + cap - 40;
    for (int64_t i = 0; i < n3; i++) {
        if (p > end) return -1;
        p += sprintf(p, "%0.12f,", r[i]);
    }
    return p - buf;
}

// ----------------------------------------------------------------------
// Reference-semantics CNA oracle (aliased triangular index, SMC.c:971-1045)
// ----------------------------------------------------------------------

void cluster_analysis_ref(const double *r, int n, double box_l,
                          double cutoff, int32_t *lca /* [(n*n-n)/2 * 3] */) {
    const int64_t p = ((int64_t)n * n - n) / 2;
    bool *num1 = new bool[p]();
    int32_t *num2 = new int32_t[p]();
    int32_t *num3 = new int32_t[p]();
    int64_t common_nn[64];
    const double cut2 = cutoff * cutoff;

    auto idx_raw = [](int64_t l, int64_t i) {
        return (l * l - 3 * l + 2) / 2 + i;
    };

    for (int l = 1; l < n; l++) {
        for (int i = 0; i < l; i++) {
            double dx = r[3 * l] - r[3 * i];
            dx -= box_l * rint(dx / box_l);
            double dy = r[3 * l + 1] - r[3 * i + 1];
            dy -= box_l * rint(dy / box_l);
            double dz = r[3 * l + 2] - r[3 * i + 2];
            if (dx * dx + dy * dy + dz * dz < cut2) num1[idx_raw(l, i)] = true;
        }
    }
    for (int l = 1; l < n; l++) {
        for (int i = 0; i < l; i++) {
            int64_t idx = idx_raw(l, i);
            if (!num1[idx]) continue;
            for (int i2 = 0; i2 < l; i2++) {
                if (i2 == i) continue;
                int64_t idx2 = idx - i + i2;
                int64_t idx3 = ((int64_t)i2 * i2 - 3 * i2 + 2) / 2 + i;
                if (num1[idx2] && num1[idx3]) {
                    if (num2[idx] < 64) common_nn[num2[idx]] = i2;
                    num2[idx]++;
                }
            }
            if (num2[idx] > 1) {
                int cnt = num2[idx] < 64 ? num2[idx] : 64;
                for (int m = 1; m < cnt; m++) {
                    int64_t c = common_nn[m];
                    int64_t idx2 = (c * c - 3 * c + 2) / 2 + common_nn[m - 1];
                    if (num1[idx2]) num3[idx]++;
                }
            }
        }
    }
    for (int64_t q = 0; q < p; q++) {
        lca[3 * q] = num1[q] ? 1 : 0;
        lca[3 * q + 1] = num2[q];
        lca[3 * q + 2] = num3[q];
    }
    delete[] num1;
    delete[] num2;
    delete[] num3;
}

}  // extern "C"
