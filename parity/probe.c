/* Golden-value probe for the C reference.
 *
 * Compiles the UNMODIFIED reference (SMC.c via -I/root/reference, with the
 * stubs/ directory supplying the missing misccose.c and an FFTW drop-in)
 * and dumps deterministic quantities — wall table, lattice, energies,
 * forces, pressures, cluster analysis, voxel histograms, ACF — for the
 * JAX implementation's parity tests to consume.
 *
 * Everything here is original probe code; the reference itself is only
 * #included from its read-only mount, never copied.
 */
#include "SMC.c"
#include <stdio.h>

static void dump_array(const char *name, const double *a, int n) {
    printf("## %s %d\n", name, n);
    for (int i = 0; i < n; i++) printf("%.17g\n", a[i]);
}

static void dump_iarray(const char *name, const int *a, int n) {
    printf("## %s %d\n", name, n);
    for (int i = 0; i < n; i++) printf("%d\n", a[i]);
}

static void dump_larray(const char *name, const unsigned long *a, int n) {
    printf("## %s %d\n", name, n);
    for (int i = 0; i < n; i++) printf("%lu\n", a[i]);
}

static void dump_scalar(const char *name, double v) {
    printf("## %s 1\n%.17g\n", name, v);
}

int main(void) {
    double L = 33.0, Lz = 200.0;

    /* Walls, bit-exact (srand(42) inside initializeWalls) */
    double *W = calloc(2 * M * M, sizeof(double));
    FILE *devnull = fopen("/dev/null", "w");
    initializeWalls(1.6, 0.0, 3.0, 0.5, W, devnull);
    dump_array("W", W, 2 * M * M);

    /* Lattice, bit-exact (srand(42) inside initializeBox) */
    double *R0 = calloc(3 * N, sizeof(double));
    initializeBox(L, Lz, N, R0);
    dump_array("R0", R0, 3 * N);

    /* A deterministic off-lattice configuration: lattice plus explicit
     * jitter from glibc rand with a fixed seed. Dumped so the consumer
     * reads positions instead of reproducing the RNG. */
    double *R1 = calloc(3 * N, sizeof(double));
    srand(7);
    for (int i = 0; i < 3 * N; i++)
        R1[i] = R0[i] + 0.35 * ((double)rand() / RAND_MAX - 0.5);
    /* push two particles near the lower wall to exercise wall terms */
    R1[3 * 0 + 2] = -Lz / 2.0 + 1.2;
    R1[3 * 1 + 2] = -Lz / 2.0 + 0.8;
    dump_array("R1", R1, 3 * N);

    /* Totals on both configurations */
    dump_scalar("energy_R0", energy(R0, L));
    dump_scalar("wallsEnergy_R0", wallsEnergy(R0, W, L, Lz));
    dump_scalar("pressure_R0", pressure(R0, L, Lz));
    dump_scalar("wallsPressure_R0", wallsPressure(R0, W, L, Lz));
    dump_scalar("energy_R1", energy(R1, L));
    dump_scalar("wallsEnergy_R1", wallsEnergy(R1, W, L, Lz));
    dump_scalar("pressure_R1", pressure(R1, L, Lz));
    dump_scalar("wallsPressure_R1", wallsPressure(R1, W, L, Lz));

    /* Per-particle energies and forces on the jittered configuration */
    double *us = calloc(N, sizeof(double));
    double *uw = calloc(N, sizeof(double));
    double *fs = calloc(3 * N, sizeof(double));
    double *fw = calloc(3 * N, sizeof(double));
    for (int i = 0; i < N; i++) {
        us[i] = energySingle(R1, L, i);
        uw[i] = wallsEnergySingle(R1[3 * i], R1[3 * i + 1], R1[3 * i + 2], W, L, Lz);
        forceSingle(R1, L, i, &fs[3 * i], &fs[3 * i + 1], &fs[3 * i + 2]);
        fw[3 * i] = 0.0; fw[3 * i + 1] = 0.0; fw[3 * i + 2] = 0.0;
        wallsForce(R1[3 * i], R1[3 * i + 1], R1[3 * i + 2], W, L, Lz,
                   &fw[3 * i], &fw[3 * i + 1], &fw[3 * i + 2]);
    }
    dump_array("energySingle_R1", us, N);
    dump_array("wallsEnergySingle_R1", uw, N);
    dump_array("forceSingle_R1", fs, 3 * N);
    dump_array("wallsForce_R1", fw, 3 * N);

    /* A DENSE configuration hugging the lower wall: the default box is so
     * dilute that the lattice has zero pair energy (spacing 11 > cutoff 3).
     * Compact grid, spacing 1.15, jitter 0.2, starting 0.9 above the wall —
     * exercises pair, wall-grid and clustering terms hard. */
    double *R2 = calloc(3 * N, sizeof(double));
    srand(99);
    {
        int side = 5, idx = 0;
        for (int i = 0; i < side && idx < N; i++)
            for (int jj2 = 0; jj2 < side && idx < N; jj2++)
                for (int k = 0; k < side && idx < N; k++) {
                    R2[3 * idx] = -2.3 + 1.15 * i;
                    R2[3 * idx + 1] = -2.3 + 1.15 * jj2;
                    R2[3 * idx + 2] = -Lz / 2.0 + 0.9 + 1.15 * k;
                    idx++;
                }
        for (; idx < N; idx++) { /* leftovers in a second column */
            R2[3 * idx] = 3.5;
            R2[3 * idx + 1] = -2.3 + 1.15 * (idx % 5);
            R2[3 * idx + 2] = -Lz / 2.0 + 0.9 + 1.15 * ((idx / 5) % 5);
        }
        for (int i = 0; i < 3 * N; i++)
            R2[i] += 0.2 * ((double)rand() / RAND_MAX - 0.5);
    }
    dump_array("R2", R2, 3 * N);
    dump_scalar("energy_R2", energy(R2, L));
    dump_scalar("wallsEnergy_R2", wallsEnergy(R2, W, L, Lz));
    dump_scalar("pressure_R2", pressure(R2, L, Lz));
    dump_scalar("wallsPressure_R2", wallsPressure(R2, W, L, Lz));
    double *us2 = calloc(N, sizeof(double));
    double *uw2 = calloc(N, sizeof(double));
    double *fs2 = calloc(3 * N, sizeof(double));
    double *fw2 = calloc(3 * N, sizeof(double));
    for (int i = 0; i < N; i++) {
        us2[i] = energySingle(R2, L, i);
        uw2[i] = wallsEnergySingle(R2[3 * i], R2[3 * i + 1], R2[3 * i + 2], W, L, Lz);
        forceSingle(R2, L, i, &fs2[3 * i], &fs2[3 * i + 1], &fs2[3 * i + 2]);
        wallsForce(R2[3 * i], R2[3 * i + 1], R2[3 * i + 2], W, L, Lz,
                   &fw2[3 * i], &fw2[3 * i + 1], &fw2[3 * i + 2]);
    }
    dump_array("energySingle_R2", us2, N);
    dump_array("wallsEnergySingle_R2", uw2, N);
    dump_array("forceSingle_R2", fs2, 3 * N);
    dump_array("wallsForce_R2", fw2, 3 * N);

    /* Cluster analysis. NOTE: clusterAnalysis overflows its 8-slot
     * common_nn buffer (SMC.c:977) on dense configurations (R2 segfaults
     * it), so the LCA goldens use R1 plus R3: 18 octahedral 6-particle
     * clusters (all-to-all bonded, 4 common neighbours per pair). */
    int *lca = calloc(3 * (N * N - N) / 2, sizeof(int));
    clusterAnalysis(R1, N, L, lca);
    dump_iarray("clusterAnalysis_R1", lca, 3 * (N * N - N) / 2);

    double *R3 = calloc(3 * N, sizeof(double));
    srand(5);
    {
        double vert[6][3] = {{0.8, 0, 0}, {-0.8, 0, 0}, {0, 0.8, 0},
                             {0, -0.8, 0}, {0, 0, 0.8}, {0, 0, -0.8}};
        for (int c = 0; c < 18; c++) {
            double cx = -12.0 + 5.0 * (c % 6);
            double cy = -5.0 + 5.0 * (c / 6);
            double cz = -Lz / 2.0 + 6.0 + 3.0 * (c % 3);
            for (int v = 0; v < 6; v++) {
                int i = c * 6 + v;
                R3[3 * i] = cx + vert[v][0] + 0.05 * ((double)rand() / RAND_MAX - 0.5);
                R3[3 * i + 1] = cy + vert[v][1] + 0.05 * ((double)rand() / RAND_MAX - 0.5);
                R3[3 * i + 2] = cz + vert[v][2] + 0.05 * ((double)rand() / RAND_MAX - 0.5);
            }
        }
    }
    dump_array("R3", R3, 3 * N);
    int *lca3 = calloc(3 * (N * N - N) / 2, sizeof(int));
    clusterAnalysis(R3, N, L, lca3);
    dump_iarray("clusterAnalysis_R3", lca3, 3 * (N * N - N) / 2);

    /* Voxel density/mobility: call on R0 then on R1 to exercise the
     * Rbin change-tracking (SMC.c:912-927) */
    int nvox = Ncx * Ncx * Ncz;
    unsigned long *D = calloc(nvox, sizeof(unsigned long));
    unsigned long *Mu = calloc(nvox, sizeof(unsigned long));
    int *Rbin = calloc(N, sizeof(int));
    localDensityAndMobility(R0, L, Lz, D, Rbin, Mu);
    localDensityAndMobility(R1, L, Lz, D, Rbin, Mu);
    dump_larray("density_R0R1", D, nvox);
    dump_larray("mobility_R0R1", Mu, nvox);
    dump_iarray("rbin_R0R1", Rbin, N);

    /* ACF of a deterministic synthetic trace (odd length so the stub DFT
     * matches the reference's lfft allocation, SMC.c:1067-1071) */
    int tlen = 2001;
    double *trace = calloc(tlen, sizeof(double));
    srand(13);
    trace[0] = 0.0;
    for (int i = 1; i < tlen; i++)
        trace[i] = 0.95 * trace[i - 1] + ((double)rand() / RAND_MAX - 0.5);
    dump_array("acf_trace", trace, tlen);
    DoubleArray acf = fft_acf(trace, tlen, 400);
    dump_array("fft_acf", acf.data, (int)acf.length);
    double *sacf = calloc(400, sizeof(double));
    simple_acf(trace, tlen, 400, sacf);
    dump_array("simple_acf", sacf, 400);

    return 0;
}
