"""Native C++ library: cross-checks against the pure-Python twins."""

import numpy as np
import pytest

from tpu_smc import native
from tpu_smc.rng import GlibcRandom
from tpu_smc.config import SMCConfig

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable; native lib not built"
)


def test_glibc_rand_matches_python():
    py = GlibcRandom(42)
    nat = native.NativeGlibcRandom(42)
    for _ in range(2000):
        assert py.rand() == nat.rand()


def test_glibc_rand_array():
    py = GlibcRandom(7)
    nat = native.NativeGlibcRandom(7)
    arr = nat.rand_array(500)
    assert [py.rand() for _ in range(500)] == arr.tolist()


def test_box_muller_matches_python():
    py = GlibcRandom(42)
    nat = native.NativeGlibcRandom(42)
    a = py.box_muller(0.5, 100)
    b = nat.box_muller(0.5, 100)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


@pytest.mark.c_reference
def test_glibc_rand_matches_real_glibc():
    """Both implementations against a tiny compiled C probe."""
    import subprocess
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "probe.c"
        src.write_text(
            '#include <stdlib.h>\n#include <stdio.h>\n'
            'int main(){srand(42);for(int i=0;i<64;i++)printf("%d\\n",rand());}'
        )
        exe = Path(td) / "probe"
        subprocess.run(["gcc", str(src), "-o", str(exe)], check=True)
        out = subprocess.run([str(exe)], capture_output=True, text=True,
                             check=True).stdout
    real = [int(v) for v in out.split()]
    py = GlibcRandom(42)
    assert [py.rand() for _ in range(64)] == real


def test_local_rows_match_python_format():
    cfg = SMCConfig()
    rng = np.random.default_rng(0)
    d = rng.integers(0, 1000, cfg.n_voxels).astype(np.uint64)
    m = rng.integers(0, 100, cfg.n_voxels).astype(np.uint64)
    blob = native.format_local_rows(d, m, cfg.ncx, cfg.ncz).decode()
    dv = d.reshape(cfg.ncx, cfg.ncx, cfg.ncz)
    mv = m.reshape(cfg.ncx, cfg.ncx, cfg.ncz)
    expected = "".join(
        f"{i}, {j}, {k}, {dv[i, j, k]}, {mv[i, j, k]}\n"
        for i in range(cfg.ncx) for j in range(cfg.ncx)
        for k in range(cfg.ncz)
    )
    assert blob == expected


def test_positions_row_matches_python_format():
    rng = np.random.default_rng(1)
    r = rng.uniform(-50, 50, (108, 3))
    blob = native.format_positions_row(r).decode()
    expected = "".join(f"{v:0.3f}," for v in r.reshape(-1)) + "\n"
    assert blob == expected


def test_last_state_matches_python_format():
    rng = np.random.default_rng(2)
    r = rng.uniform(-50, 50, (108, 3))
    blob = native.format_last_state(r).decode()
    expected = "".join(f"{v:0.12f}," for v in r.reshape(-1))
    assert blob == expected


@pytest.mark.c_reference
def test_native_cna_matches_probe(goldens):
    cfg = SMCConfig()
    for conf in ("R1", "R3"):
        lca = native.cluster_analysis_ref(
            goldens[conf], cfg.n, cfg.box_l, cfg.lca_cutoff
        )
        np.testing.assert_array_equal(
            lca.reshape(-1), goldens[f"clusterAnalysis_{conf}"].astype(np.int32)
        )
