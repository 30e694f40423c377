"""Build and query the compiled C reference for parity tests.

The reference lives read-only at /root/reference and does not compile
as-shipped (misccose.c is missing, SMC.h:20; FFTW may be absent). We
compile it in a temp build dir with our stubs on the include path — the
reference sources are included from their mount, never copied.
"""

from __future__ import annotations

import os
import re
import subprocess
from pathlib import Path

import numpy as np

REFERENCE_DIR = Path(os.environ.get("SMC_REFERENCE_DIR", "/root/reference"))
PARITY_DIR = Path(__file__).resolve().parent
STUBS_DIR = PARITY_DIR / "stubs"
BUILD_DIR = Path(os.environ.get("SMC_PARITY_BUILD", "/tmp/smc_parity_build"))


def reference_available() -> bool:
    return (REFERENCE_DIR / "SMC.c").is_file()


def _mtimes() -> float:
    files = [PARITY_DIR / "probe.c", STUBS_DIR / "misccose.c", STUBS_DIR / "fftw3.h"]
    files += list(REFERENCE_DIR.glob("*.c")) + list(REFERENCE_DIR.glob("*.h"))
    return max(f.stat().st_mtime for f in files if f.exists())


def _shadow_source_dir(fixed_noise: bool = False) -> Path:
    """Stage the reference for compilation in a throwaway build dir.

    Two build-time patches are required (the shipped code cannot compile
    with an N override otherwise):
      * matematicose.c declares a local `int N` inside the (unused)
        stochastic_grad_descent_1D, which collides with a -DN macro — the
        function is compiled out;
      * SMC.h's `#define N 108` / `#define M 3` become #ifndef-guarded so
        the probe can set other system sizes.
    Everything else is symlinked from the read-only mount.

    fixed_noise=True stages a DEFECT-CORRECTED displacement-noise build
    (docs/DEVIATIONS.md F0): oneParticleMoves' proposal noise
    (SMC.c:284) is retargeted to a standard Box-Muller (shared radius
    uniform + shared angle uniform => independent normals) while every
    other vecBoxMuller call keeps the shipped dependent-pair recipe —
    in particular the srand(42) WALL geometry (SMC.c:484-485) stays
    bit-identical to the stock binary and to rng.GlibcRandom. This is
    the walled analog of build_bulk_main(fixed=True): it lets the
    production i.i.d.-noise sampler be compared to a C reference that
    samples the same (correct) ensemble.
    """
    shadow = BUILD_DIR / ("src_fixed_noise" if fixed_noise else "src")
    stamp = shadow / ".stamp"
    if stamp.exists() and float(stamp.read_text()) >= _mtimes():
        return shadow
    shadow.mkdir(parents=True, exist_ok=True)
    skip = ("matematicose.c", "SMC.h") + (("SMC.c",) if fixed_noise else ())
    for f in REFERENCE_DIR.iterdir():
        if f.suffix in (".c", ".h") and f.name not in skip:
            dst = shadow / f.name
            if dst.is_symlink() or dst.exists():
                dst.unlink()
            dst.symlink_to(f)
    if fixed_noise:
        smc = (REFERENCE_DIR / "SMC.c").read_text()
        iid_fn = (
            "/* parity build (F0 correction): standard Box-Muller — the\n"
            "   pair shares one radius uniform and one angle uniform, so\n"
            "   the two normals are INDEPENDENT. Same 2 rand() draws per\n"
            "   pair as the shipped recipe. Used ONLY for the proposal\n"
            "   displacement noise; wall geometry keeps the stock call. */\n"
            "static void vecBoxMullerIID(double sigma, size_t length,"
            " double * A)\n"
            "{\n"
            "    double x1, x2;\n"
            "    for (int i=0; i<round(length/2); i++) {\n"
            "        x1 = (double) rand() / (RAND_MAX + 1.0);\n"
            "        x2 = (double) rand() / (RAND_MAX + 1.0);\n"
            "        A[2*i] = sigma * sqrt(-2*log(1-x1)) * cos(2*M_PI*x2);\n"
            "        A[2*i+1] = sigma * sqrt(-2*log(1-x1)) * sin(2*M_PI*x2);\n"
            "    }\n"
            "}\n\n"
            "void oneParticleMoves("
        )
        patched = smc.replace("void oneParticleMoves(", iid_fn, 1)
        assert patched != smc, "oneParticleMoves not found in SMC.c"
        smc = patched
        patched = smc.replace(
            "vecBoxMuller(sqrt(2.0*A), 3*N, displ);",
            "vecBoxMullerIID(sqrt(2.0*A), 3*N, displ);", 1)
        assert patched != smc, "displacement vecBoxMuller call not found"
        (shadow / "SMC.c").write_text(patched)
    mat = (REFERENCE_DIR / "matematicose.c").read_text()
    cut = mat.index("double stochastic_grad_descent_1D")
    (shadow / "matematicose.c").write_text(
        mat[:cut] + "#if 0 /* parity build: unused, collides with -DN */\n"
        + mat[cut:] + "\n#endif\n"
    )
    smch = (REFERENCE_DIR / "SMC.h").read_text()
    smch = smch.replace(
        "#define M 3", "#ifndef M\n#define M 3\n#endif"
    ).replace(
        "#define N 108", "#ifndef N\n#define N 108\n#endif"
    )
    (shadow / "SMC.h").write_text(smch)
    stamp.write_text(str(_mtimes()))
    return shadow


def _build(src: Path, exe_name: str, n: int, m: int = 3,
           fixed_noise: bool = False) -> Path:
    shadow = _shadow_source_dir(fixed_noise)
    exe = BUILD_DIR / f"{exe_name}_n{n}_m{m}"
    stamp = BUILD_DIR / f"{exe_name}_n{n}_m{m}.stamp"
    if exe.exists() and stamp.exists() and float(stamp.read_text()) >= _mtimes():
        return exe
    cmd = [
        "gcc", "-O2", "-w",
        f"-I{STUBS_DIR}", f"-I{shadow}",
        f"-DN={n}", f"-DM={m}",
        str(src), "-lm", "-o", str(exe),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    stamp.write_text(str(_mtimes()))
    return exe


def build_bulk_main(maxsteps: int = 20000, eqsteps: int = 2000,
                    fixed: bool = False, a: float | None = None,
                    t: float | None = None) -> Path:
    """Compile the self-contained bulk variant (SMC_noMPI_noWall.c) as its
    own binary. Its run length is hardcoded (1e6 sweeps,
    SMC_noMPI_noWall.c:77-79); for test-sized runs we patch the two
    constants at staging time (build-time-only, documented).

    fixed=True stages a DEFECT-CORRECTED bulk binary for the statistical
    parity contract (docs/DEVIATIONS.md F0b/F0c/F0e): the stock bulk
    sampler is not a valid smart-MC chain — its vecBoxMuller puts sigma
    inside the sqrt (~60x inflated, non-Gaussian noise,
    SMC_noMPI_noWall.c:714), its per-move energySingle/force loops start
    at l=1 so particle 0 is invisible to every acceptance test
    (SMC_noMPI_noWall.c:602,280; the walled SMC.c:563 correctly starts
    at l=0), and its per-move force() is SIGN-INVERTED relative to the
    physical force (SMC_noMPI_noWall.c:523-525 vs its own forces() and
    the walled SMC.c:611-614 — anti-physical drift; still a valid MH
    chain since the acceptance uses the same F, but acceptance/dynamics
    shift: measured 0.655 vs the physical drift's 0.805 at A=0.02,
    T=1.5). With all three corrected the C bulk is the intended
    smart-MC sampler of the same ensemble as ours, so equilibrium
    E/P/cv AND acceptance must agree statistically.
    The gathered energy()/pressure() pair loops are untouched (their
    l=1 start is the correct i<l triangle). `a` patches the mobility
    (the stock 4e-8 barely moves — nothing equilibrates in test time).
    """
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    atag = "" if a is None else f"_a{a:g}"
    ttag = "" if t is None else f"_t{t:g}"
    tag = f"{maxsteps}_{eqsteps}{'_fixed' if fixed else ''}{atag}{ttag}"
    exe = BUILD_DIR / f"smc_bulk_{tag}"
    stamp = BUILD_DIR / f"smc_bulk_{tag}.stamp"
    if exe.exists() and stamp.exists() and float(stamp.read_text()) >= _mtimes():
        return exe
    src_text = (REFERENCE_DIR / "SMC_noMPI_noWall.c").read_text()
    # kmax=42000 requires gather_steps >= 84000 (the bulk fft_acf has no
    # clamp and segfaults below that, SMC_noMPI_noWall.c:154,727) — size it
    # to the patched run length.
    kmax = max(10, min(42000, maxsteps // 10 // 2 - 2))
    src_text = src_text.replace(
        "int maxsteps = 1000000;", f"int maxsteps = {maxsteps};"
    ).replace(
        "int eqsteps = 10000;", f"int eqsteps = {eqsteps};"
    ).replace(
        "int kmax = 42000;", f"int kmax = {kmax};"
    )
    if a is not None:
        patched = src_text.replace(
            "double A = 4e-8;", f"double A = {a!r};")
        assert patched != src_text, "mobility constant not found"
        src_text = patched
    if t is not None:
        # the stock T=0.4 sits below the LJ triple point at rho=0.1 —
        # clustering makes equilibrium statistics unreachable in test
        # time; the parity contract runs a supercritical state instead
        patched = src_text.replace(
            "double T = 0.4;", f"double T = {t!r};")
        assert patched != src_text, "temperature constant not found"
        src_text = patched
    if fixed:
        # F0b: proper Box-Muller — sigma scales OUTSIDE the sqrt, and
        # the pair shares one radius (independent standard normals).
        fixed_bm = src_text.replace(
            "A[2*i] = sqrt(-2*sigma*log(1-x1))*cos(2*M_PI*x2);",
            "A[2*i] = sigma*sqrt(-2*log(1-x1))*cos(2*M_PI*x2);",
        ).replace(
            "A[2*i+1] = sqrt(-2*sigma*log(1-x2))*sin(2*M_PI*x1);",
            "A[2*i+1] = sigma*sqrt(-2*log(1-x1))*sin(2*M_PI*x2);",
        )
        assert fixed_bm != src_text, "vecBoxMuller lines not found"
        # F0c: the l != i guarded per-move loops must start at l=0 (two
        # sites: energySingle and force). Context-match on the guard so
        # the correct l=1 triangle loops in energy()/pressure() survive.
        fixed_l0, nsub = re.subn(
            r"for \(int l=1; l<N; l\+\+\)(\s*\{?\s*\n\s*if \(l != i\))",
            r"for (int l=0; l<N; l++)\1",
            fixed_bm,
        )
        assert nsub == 2, f"expected 2 per-move l=1 loops, found {nsub}"
        # F0e: the per-move force() applies `*F -= dV*dx` with
        # dV = 24 r^-8 - 48 r^-14 and dx = r_l - r_i, i.e. the NEGATIVE
        # of the physical force (the plural forces() and the walled
        # SMC.c:611-614 get the sign right). Anchor on force()'s bare dV
        # line so forces() (array form) and wallsForce (W-weighted dV)
        # are untouched.
        fixed_sign, nsub = re.subn(
            r"(dV = 24\.0/dr8 - 48\.0/\(dr8\*dr2\*dr2\*dr2\);\s*\n\s*)"
            r"\*Fx -= dV\*dx;(\s*\n\s*)\*Fy -= dV\*dy;(\s*\n\s*)"
            r"\*Fz -= dV\*dz;",
            r"\1*Fx += dV*dx;\2*Fy += dV*dy;\3*Fz += dV*dz;",
            fixed_l0,
        )
        assert nsub == 1, f"expected 1 per-move force sign site, got {nsub}"
        src_text = fixed_sign
    staged = BUILD_DIR / f"bulk_{tag}.c"
    staged.write_text(src_text)
    cmd = ["gcc", "-O2", "-w", f"-I{STUBS_DIR}", str(staged), "-lm",
           "-o", str(exe)]
    subprocess.run(cmd, check=True, capture_output=True)
    stamp.write_text(str(_mtimes()))
    return exe


def build_probe(n: int = 108, m: int = 3) -> Path:
    """Compile parity/probe.c against the staged reference."""
    return _build(PARITY_DIR / "probe.c", "probe", n, m)


def build_reference_main(n: int = 108, m: int = 3,
                         fixed_noise: bool = False) -> Path:
    """Compile the reference's own main (main.c -> full simulation binary).

    fixed_noise=True compiles the F0-corrected displacement-noise
    variant (see _shadow_source_dir) as a distinct binary."""
    shadow = _shadow_source_dir(fixed_noise)
    name = "smc_ref_iidnoise" if fixed_noise else "smc_ref"
    return _build(shadow / "main.c", name, n, m, fixed_noise=fixed_noise)


def run_probe(n: int = 108, cache: bool = True) -> dict[str, np.ndarray]:
    """Run the probe and parse its '## name count' sections into arrays."""
    npz = BUILD_DIR / f"probe_n{n}.npz"
    exe = build_probe(n)  # also refreshes the stamp used for cache validity
    if cache and npz.exists() and npz.stat().st_mtime >= exe.stat().st_mtime:
        return dict(np.load(npz))
    out = subprocess.run([str(exe)], check=True, capture_output=True, text=True).stdout
    sections: dict[str, np.ndarray] = {}
    lines = out.splitlines()
    i = 0
    while i < len(lines):
        if lines[i].startswith("## "):
            _, name, count = lines[i].split()
            count = int(count)
            vals = [float(v) for v in lines[i + 1 : i + 1 + count]]
            sections[name] = np.asarray(vals)
            i += 1 + count
        else:
            i += 1
    if cache:
        np.savez(npz, **sections)
    return sections
