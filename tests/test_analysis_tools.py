"""Analysis-tool equivalents of the reference's scripts/ directory."""

import sys
from pathlib import Path

import shutil

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, write_mode1
from oracle.run_oracle import setup_sandbox

from is3d2_tpu.config import Config
from is3d2_tpu.driver import IS3D
from is3d2_tpu.tools import analysis


def _workdir(tmp_path, params, reference_dir):
    surf = make_surface(40, seed=2)
    surf_file = tmp_path / "surface_gen.dat"
    write_mode1(surf, surf_file)
    sandbox = tmp_path / "work"
    setup_sandbox(sandbox, params, surf_file, chosen_mcids=(211, 321, 2212))
    # the bundled phi_table.dat is a single point (0, 2pi): fine for the
    # reference's central-value runs but not for a phi-averaged comparison
    # against sampling -- use the 48-pt Gauss table.  The sandbox entry is a
    # SYMLINK into the read-only reference tree: replace the link, never
    # copy onto it (that writes through to the reference).
    dst = sandbox / "tables/momentum/phi_table.dat"
    dst.unlink()
    shutil.copy(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat",
                dst)
    return sandbox


def test_compare_and_plot(reference_dir, tmp_path):
    # the sampler always drops inflow (w_flux = max(0, p.dsigma)) and clamps
    # |df| <= 1 in the acceptance weight, so the comparable smooth spectra
    # need outflow=1 + regulate_deltaf=1 (as in the reference's validation)
    wd = _workdir(tmp_path, {"operation": 1, "df_mode": 1, "hrg_eos": 3,
                             "outflow": 1, "regulate_deltaf": 1},
                  reference_dir)
    IS3D(wd, cfg=Config(operation=1, df_mode=1, hrg_eos=3, outflow=1,
                        regulate_deltaf=1, cell_block=64)).run_particlization()
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, test_sampler=1, outflow=1,
                 regulate_deltaf=1, min_num_hadrons=20000,
                 max_num_samples=3000, cell_block=64)
    IS3D(wd, cfg=cfg).run_particlization()

    report = analysis.compare_sampling_smooth(wd, mcids=(211, 321, 2212))
    # oversampled tiny surface: the statistics-weighted integrated yield
    # closes to a few percent (per-bin tails stay noisy)
    assert abs(report[211]["yield_ratio"] - 1.0) < 0.1
    assert (wd / "results/sampled_vs_smooth.png").exists()
    assert analysis.plot_spectra(wd, mcids=(211,)) is not None


def test_event_histograms_and_observables(reference_dir, tmp_path):
    wd = _workdir(tmp_path, {"operation": 2, "df_mode": 1, "hrg_eos": 3},
                  reference_dir)
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, test_sampler=0,
                 min_num_hadrons=300, max_num_samples=20, cell_block=64,
                 write_csv=1)
    IS3D(wd, cfg=cfg).run_particlization()

    lists = sorted((wd / "results").glob("particle_list_[0-9]*.dat"))
    assert lists
    stats = analysis.histogram_event(lists[0])
    assert stats[211]["n"] >= 0

    obs = analysis.compute_observables(wd)
    assert (wd / "results/observables.npz").exists()
    assert obs["dNch_deta"].shape[0] == len(lists)
    assert np.isfinite(obs["dNch_deta"]).all()
    assert obs["Qn"].shape[1] == 8
    # pions dominate any HRG event sample
    assert obs["dN_dy_pion"].mean() >= obs["dN_dy_proton"].mean()


def test_sweep_harness(reference_dir, tmp_path):
    """Parameter-sweep matrix (scripts/modified_distribution equivalent)."""
    from is3d2_tpu.tools.sweep import run_sweep
    wd = _workdir(tmp_path, {"operation": 1, "df_mode": 1, "hrg_eos": 3},
                  reference_dir)
    out = run_sweep(wd, df_names=("grad", "ce"), corr_names=("none", "shear"))
    assert len(out) == 4
    for (df, corr), d in out.items():
        f = d / "dN_2pipTdpTdy_211.dat"
        assert f.exists()
        vals = np.loadtxt(f)[:, 2]
        assert np.isfinite(vals).all() and (vals > 0).any()
    # shear correction must actually change the spectra
    a = np.loadtxt(out[("grad", "none")] / "dN_2pipTdpTdy_211.dat")[:, 2]
    b = np.loadtxt(out[("grad", "shear")] / "dN_2pipTdpTdy_211.dat")[:, 2]
    assert np.abs(a - b).max() > 0
