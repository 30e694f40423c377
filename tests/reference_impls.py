"""Line-faithful Python ports of reference algorithms, used ONLY as test
oracles to validate our understanding of the C semantics (including its
index-aliasing bugs) against the compiled probe. The production JAX
implementations deliberately fix those bugs (docs/DEVIATIONS.md)."""

from __future__ import annotations

import numpy as np


def cluster_analysis_c(r: np.ndarray, n: int, box_l: float, lca_cutoff: float):
    """clusterAnalysis (SMC.c:971-1045), verbatim semantics:

    * triangular pair index idx = (l*l - 3*l + 2)/2 + i (SMC.c:986) — this
      COLLIDES across rows, so num1/num2/num3 slots are shared between
      different pairs exactly like the C arrays;
    * common-neighbour scan only over i2 < l, i2 != i (SMC.c:1008-1020),
      reading num1 at the raw (possibly aliased) idx3 formula;
    * num3 counts bonds between CONSECUTIVE entries of the common_nn
      discovery buffer (SMC.c:1022-1029).

    Returns the LCA array [(N^2-N)/2, 3] as the C code dumps it.
    """
    p = (n * n - n) // 2
    num1 = np.zeros(p, dtype=bool)
    num2 = np.zeros(p, dtype=np.int64)
    num3 = np.zeros(p, dtype=np.int64)
    cut2 = lca_cutoff * lca_cutoff

    def idx_raw(l, i):
        return (l * l - 3 * l + 2) // 2 + i

    for l in range(1, n):
        for i in range(l):
            dx = r[3 * l] - r[3 * i]
            dx -= box_l * np.rint(dx / box_l)
            dy = r[3 * l + 1] - r[3 * i + 1]
            dy -= box_l * np.rint(dy / box_l)
            dz = r[3 * l + 2] - r[3 * i + 2]
            if dx * dx + dy * dy + dz * dz < cut2:
                num1[idx_raw(l, i)] = True

    for l in range(1, n):
        for i in range(l):
            idx = idx_raw(l, i)
            if num1[idx]:
                common_nn = np.zeros(64, dtype=np.int64)  # C has 8; sized up
                for i2 in range(l):
                    if i2 != i:
                        idx2 = idx - i + i2               # pair (l, i2)
                        idx3 = (i2 * i2 - 3 * i2 + 2) // 2 + i  # raw formula
                        if num1[idx2] and num1[idx3]:
                            common_nn[num2[idx]] = i2
                            num2[idx] += 1
                if num2[idx] > 1:
                    for m in range(1, num2[idx]):
                        c = common_nn[m]
                        idx2 = (c * c - 3 * c + 2) // 2 + common_nn[m - 1]
                        if num1[idx2]:
                            num3[idx] += 1

    lca = np.zeros((p, 3), dtype=np.int64)
    lca[:, 0] = num1.astype(np.int64)
    lca[:, 1] = num2
    lca[:, 2] = num3
    return lca


def density_mobility_c(
    r: np.ndarray, box_l: float, box_lz: float, ncx: int, ncz: int,
    d: np.ndarray, rbin: np.ndarray, mu: np.ndarray,
):
    """localDensityAndMobility (SMC.c:912-927) with the uint8 index cast."""
    n = r.shape[0] // 3
    for p in range(n):
        i = np.uint8(np.floor((r[3 * p] / box_l + 0.5) * ncx))
        j = np.uint8(np.floor((r[3 * p + 1] / box_l + 0.5) * ncx))
        k = np.uint8(np.floor((r[3 * p + 2] / box_lz + 0.5) * ncz))
        v = int(i) * ncx * ncz + int(j) * ncz + int(k)
        d[v] += 1
        if rbin[p] != v:
            mu[v] += 1
            rbin[p] = v
    return d, rbin, mu
