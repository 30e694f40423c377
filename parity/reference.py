"""Build and query the compiled C reference for parity tests.

The reference lives read-only at /root/reference and does not compile
as-shipped (misccose.c is missing, SMC.h:20; FFTW may be absent). We
compile it in a temp build dir with our stubs on the include path — the
reference sources are included from their mount, never copied.
"""

from __future__ import annotations

import os
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


def _shadow_source_dir() -> Path:
    """Stage the reference for compilation in a throwaway build dir.

    Two build-time patches are required (the shipped code cannot compile
    with an N override otherwise):
      * matematicose.c declares a local `int N` inside the (unused)
        stochastic_grad_descent_1D, which collides with a -DN macro — the
        function is compiled out;
      * SMC.h's `#define N 108` / `#define M 3` become #ifndef-guarded so
        the probe can set other system sizes.
    Everything else is symlinked from the read-only mount.
    """
    shadow = BUILD_DIR / "src"
    stamp = shadow / ".stamp"
    if stamp.exists() and float(stamp.read_text()) >= _mtimes():
        return shadow
    shadow.mkdir(parents=True, exist_ok=True)
    for f in REFERENCE_DIR.iterdir():
        if f.suffix in (".c", ".h") and f.name not in ("matematicose.c", "SMC.h"):
            dst = shadow / f.name
            if dst.is_symlink() or dst.exists():
                dst.unlink()
            dst.symlink_to(f)
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


def _build(src: Path, exe_name: str, n: int, m: int = 3) -> Path:
    shadow = _shadow_source_dir()
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


def build_bulk_main(maxsteps: int = 20000, eqsteps: int = 2000) -> Path:
    """Compile the self-contained bulk variant (SMC_noMPI_noWall.c) as its
    own binary. Its run length is hardcoded (1e6 sweeps,
    SMC_noMPI_noWall.c:77-79); for test-sized runs we patch the two
    constants at staging time (build-time-only, documented)."""
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    exe = BUILD_DIR / f"smc_bulk_{maxsteps}_{eqsteps}"
    stamp = BUILD_DIR / f"smc_bulk_{maxsteps}_{eqsteps}.stamp"
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
    staged = BUILD_DIR / f"bulk_{maxsteps}_{eqsteps}.c"
    staged.write_text(src_text)
    cmd = ["gcc", "-O2", "-w", f"-I{STUBS_DIR}", str(staged), "-lm",
           "-o", str(exe)]
    subprocess.run(cmd, check=True, capture_output=True)
    stamp.write_text(str(_mtimes()))
    return exe


def build_probe(n: int = 108, m: int = 3) -> Path:
    """Compile parity/probe.c against the staged reference."""
    return _build(PARITY_DIR / "probe.c", "probe", n, m)


def build_reference_main(n: int = 108, m: int = 3) -> Path:
    """Compile the reference's own main (main.c -> full simulation binary)."""
    shadow = _shadow_source_dir()
    return _build(shadow / "main.c", "smc_ref", n, m)


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
