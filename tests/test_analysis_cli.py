"""End-to-end CLI + analysis coverage inside the test suite."""

import numpy as np
import pytest

from tpu_smc.cli import main as cli_main


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("cli")
    rc = cli_main([
        "30", "120", "12", "1.1", "--dtype", "float64", "--seed", "7",
        "--gr-bins", "16", "--z-bins", "16",
        "--data-dir", str(td / "Data"),
        "--checkpoint", str(td / "ck.npz"),
    ])
    assert rc == 0
    runs = list((td / "Data").iterdir())
    assert len(runs) == 1
    return runs[0]


def test_cli_produces_all_artifacts(run_dir):
    names = {p.name.split("_N")[0] for p in run_dir.iterdir()}
    assert names == {"wall", "positions", "data", "local", "local_temp",
                     "total_clusters", "autocorrelation", "info",
                     "last_state", "gr", "zprofile"}


def test_analysis_loads_and_computes(run_dir):
    from tpu_smc.analysis import acf_check, load_run, spectrum, z_band_maps

    run = load_run(run_dir)
    assert run.n == 108
    assert run.energy.shape[0] == 12          # numdata gathers
    assert run.positions.shape[1:] == (108, 3)
    bands = z_band_maps(run)
    assert bands["density"].shape == (7, 33, 33)
    # total voxel counts = gathers * N
    assert bands["density"].sum() == 12 * 108
    freqs, spec = spectrum(run)
    assert np.all(np.isfinite(spec))
    acf = acf_check(run, k_max=5)
    assert acf[0] == pytest.approx(1.0)


def test_analysis_renders(run_dir, tmp_path):
    from tpu_smc.analysis import load_run, render_all

    run = load_run(run_dir)
    written = render_all(run, tmp_path, box=(33.0, 200.0))
    assert len(written) >= 5
    for p in written:
        assert p.exists() and p.stat().st_size > 0
    # the run accumulated g(r) + z-profile -> structure panel rendered
    assert any(p.name.startswith("structure_") for p in written)


def test_cli_resume_roundtrip(run_dir, tmp_path):
    ck = run_dir.parent.parent / "ck.npz"
    rc = cli_main([
        "0", "60", "6", "1.1", "--resume", str(ck),
        "--data-dir", str(tmp_path / "Data"),
    ])
    assert rc == 0


def test_volume_rendering_with_animation(run_dir, tmp_path):
    """Volume rendering of the voxel density (plotting.jl:273-331):
    composited projections PNG + the windowed-density animation GIF
    (synthesized multi-window local_temp so the GIF path runs)."""
    import shutil

    from tpu_smc.analysis import (load_local_windows, load_run,
                                  render_volume)

    # copy the run and append a second local_temp window so W >= 2
    d2 = tmp_path / run_dir.name
    shutil.copytree(run_dir, d2)
    run = load_run(d2)
    lt = d2 / f"local_temp_{run.key}_rank0.csv"
    lines = lt.read_text().strip().splitlines()
    block = lines[1:]
    assert len(block) == 33 * 33 * 33
    with open(lt, "a") as f:
        for row in block:
            f.write(row + "\n")

    windows = load_local_windows(run)
    assert windows.shape == (2, 33, 33, 33, 2)
    np.testing.assert_array_equal(windows[0], windows[1])

    written = render_volume(run, tmp_path / "plots")
    names = {p.name.split("_N")[0] for p in written}
    assert names == {"volume", "volume_anim"}
    for p in written:
        assert p.exists() and p.stat().st_size > 0


def test_tsweep_cli_and_plot(tmp_path):
    """--temperatures mode end-to-end: tsweep CSV written, analysis
    renders the E(T)/cv(T)/acceptance(T) curves."""
    rc = cli_main([
        "20", "80", "8", "1.1", "--dtype", "float32", "--seed", "9",
        "--temperatures", "0.9,1.3", "--chains-per-t", "3",
        "--reweight", "0.9:1.3:5", "--z-bins", "6",
        "--data-dir", str(tmp_path / "Data"),
    ])
    assert rc == 0
    run_dir = next((tmp_path / "Data").iterdir())
    assert len(list(run_dir.glob("reweight_*.csv"))) == 3  # + zprofile, pmf
    assert len(list(run_dir.glob("reweight_zprofile_*.csv"))) == 1
    assert len(list(run_dir.glob("reweight_pmf_*.csv"))) == 1
    ts = list(run_dir.glob("tsweep_*.csv"))
    assert len(ts) == 1
    lines = ts[0].read_text().strip().splitlines()
    assert lines[0] == "T, E_mean, E_err, acceptance, cv"
    assert len(lines) == 3
    e_rows = [float(l.split(",")[1]) for l in lines[1:]]
    assert e_rows[0] < e_rows[1]  # E rises with T

    from tpu_smc.analysis import load_run, render_all

    # analysis needs the standard artifacts too: tsweep mode writes only
    # wall + tsweep, so drop a standard run beside it first
    rc = cli_main([
        "10", "40", "4", "1.1", "--dtype", "float32", "--seed", "9",
        "--data-dir", str(tmp_path / "Data"),
    ])
    assert rc == 0
    run = load_run(run_dir)
    written = render_all(run, tmp_path / "plots")
    assert any(p.name.startswith("tsweep_") for p in written)
    assert any(p.name.startswith("reweight_zprofile_") for p in written)
    assert any(p.name.startswith("reweight_pmf_") for p in written)


def test_volume_html_viewer(run_dir, tmp_path):
    """Interactive volume viewer: self-contained HTML with the density
    volume (and the local_temp time axis when >= 2 windows exist)."""
    import shutil

    from tpu_smc.analysis import load_run, render_volume_html

    run = load_run(run_dir)
    p = render_volume_html(run, tmp_path / "plots")
    assert p is not None and p.name == f"volume_{run.key}.html"
    html = p.read_text()
    assert "const DIMS = [33, 33, 33]" in html
    assert "const NW = 0" in html            # single window -> no time axis
    assert "<canvas" in html and "cmap" in html

    # with >= 2 windows the time slider data is embedded
    d2 = tmp_path / run_dir.name
    shutil.copytree(run_dir, d2)
    lt = d2 / f"local_temp_{run.key}_rank0.csv"
    lines = lt.read_text().strip().splitlines()
    with open(lt, "a") as f:
        for row in lines[1:]:
            f.write(row + "\n")
    run2 = load_run(d2)
    p2 = render_volume_html(run2, tmp_path / "plots2")
    assert "const NW = 2" in p2.read_text()


def test_pt_swap_acceptance_panel(run_dir, tmp_path):
    """A pt_*.csv beside the run artifacts gets its own panel."""
    from tpu_smc.analysis import load_run, render_all

    key = run_dir.name.replace("data_", "")
    (run_dir / f"pt_{key}.csv").write_text(
        "T_lo, T_hi, swap_acceptance, attempts\n"
        "0.900, 1.100, 0.62, 240\n"
        "1.100, 1.400, 0.31, 240\n")
    written = render_all(load_run(run_dir), tmp_path / "plots")
    assert any(p.name == f"pt_{key}.png" for p in written)


def test_npt_panels(run_dir, tmp_path):
    """npt_*.csv / npt_isobar_*.csv beside the run artifacts get the
    constant-pressure trace and equation-of-state panels."""
    from tpu_smc.analysis import load_run, render_all

    key = run_dir.name.replace("data_", "")
    (run_dir / f"npt_{key}.csv").write_text(
        "# P, 0.700000000, mean_density, 0.310000000, err_density, "
        "0.002, mean_V, 103.2, E, -46.5, H_conf, 25.7, kappa_T, 0.86, "
        "acc_disp, 0.40, acc_vol, 0.71\n"
        "sweep, V_mean, rho_mean, E_mean\n"
        "0, 104.1, 0.307, -45.9\n"
        "1, 102.8, 0.311, -46.8\n")
    (run_dir / f"npt_gr_{key}.csv").write_text(
        "r, g\n0.5, 0.01\n1.1, 2.3\n1.7, 0.9\n")
    (run_dir / f"npt_isobar_{key}.csv").write_text(
        "P, rho_mean, rho_err, V_mean, kappa_T\n"
        "0.300000, 0.155, 0.004, 212.7, 3.44\n"
        "0.700000, 0.305, 0.003, 105.8, 0.40\n")
    (run_dir / f"npt_reweight_{key}.csv").write_text(
        "P, rho, V_mean, kappa_T, H_conf, ess\n"
        "0.300000, 0.155, 212.7, 3.44, 20.1, 4000.0\n"
        "0.500000, 0.240, 133.3, 1.10, 22.0, 5200.0\n"
        "0.700000, 0.305, 105.8, 0.40, 25.7, 4100.0\n")
    written = render_all(load_run(run_dir), tmp_path / "plots")
    names = {p.name for p in written}
    assert f"npt_{key}.png" in names
    assert f"npt_isobar_{key}.png" in names


def test_gibbs_binodal_panel(run_dir, tmp_path):
    """A gibbs_binodal_*.csv gets the coexistence-dome panel, with
    one-phase rows split out."""
    from tpu_smc.analysis import load_run, render_all

    key = run_dir.name.replace("data_", "")
    (run_dir / f"gibbs_binodal_{key}.csv").write_text(
        "T, rho_v, err_v, rho_l, err_l, dmu, two_phase\n"
        "0.650000, 0.041, 0.004, 0.675, 0.006, 0.035, 1\n"
        "0.720000, 0.090, 0.010, 0.561, 0.012, 0.013, 1\n"
        "2.000000, 0.280, 0.001, 0.320, 0.001, 0.008, 0\n")
    written = render_all(load_run(run_dir), tmp_path / "plots")
    assert any(p.name == f"gibbs_binodal_{key}.png" for p in written)


def test_gibbs_panel(run_dir, tmp_path):
    """A gibbs_*.csv beside the run artifacts gets the coexistence
    branch-density panel."""
    from tpu_smc.analysis import load_run, render_all

    key = run_dir.name.replace("data_", "")
    (run_dir / f"gibbs_{key}.csv").write_text(
        "# rho_lo, 0.041, err_lo, 0.003, rho_hi, 0.62, err_hi, 0.01, "
        "mu_box1, -3.41, mu_box2, -3.39, acc_disp, 0.45, acc_vol, "
        "0.31, acc_transfer, 0.02\n"
        "sweep, N1_mean, V1_mean, rho_lo_mean, rho_hi_mean\n"
        "0, 61.2, 103.8, 0.040, 0.615\n"
        "1, 60.8, 101.2, 0.043, 0.628\n")
    written = render_all(load_run(run_dir), tmp_path / "plots")
    assert any(p.name == f"gibbs_{key}.png" for p in written)


def test_structure_factor_panel(run_dir, tmp_path):
    """--box enables the in-plane S(k) panel from position snapshots."""
    from tpu_smc.analysis import load_run, render_all

    written = render_all(load_run(run_dir), tmp_path / "plots",
                         box=(33.0, 200.0))
    assert any(p.name.startswith("sk_") for p in written)
