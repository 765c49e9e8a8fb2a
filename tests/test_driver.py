"""End-to-end driver test: full run in a reference-layout sandbox."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, write_mode1
from oracle.run_oracle import setup_sandbox

from is3d2_tpu.config import Config
from is3d2_tpu.driver import IS3D


def _make_workdir(tmp_path, reference_dir, params):
    surf = make_surface(40, seed=2)
    surf_file = tmp_path / "surface_gen.dat"
    write_mode1(surf, surf_file)
    sandbox = tmp_path / "work"
    setup_sandbox(sandbox, params, surf_file, chosen_mcids=(111, 321, 2212))
    return sandbox


def test_driver_spectra_run(reference_dir, tmp_path):
    wd = _make_workdir(tmp_path, reference_dir,
                       {"operation": 1, "df_mode": 1, "hrg_eos": 3})
    run = IS3D(wd, cfg=Config(operation=1, df_mode=1, hrg_eos=3, cell_block=64))
    run.run_particlization()
    assert run.spectra is not None and run.spectra.shape[0] == 3
    for mcid in (111, 321, 2212):
        for name in ("dN_pTdpTdphidy", "vn", "dN_2pipTdpTdy", "dN_dphidy", "dN_dy"):
            assert (wd / f"results/continuous/{name}_{mcid}.dat").exists()
    # thermo handoff file written
    assert (wd / "tables/thermodynamic/average_thermodynamic_quantities.dat").exists()


def test_driver_sampler_run(reference_dir, tmp_path):
    wd = _make_workdir(tmp_path, reference_dir,
                       {"operation": 2, "df_mode": 2, "hrg_eos": 3})
    cfg = Config(operation=2, df_mode=2, hrg_eos=3, test_sampler=1,
                 min_num_hadrons=2000, max_num_samples=200, cell_block=64)
    run = IS3D(wd, cfg=cfg)
    run.run_particlization()
    assert run.histograms is not None
    assert (wd / "results/sampled/dN_dy/dN_dy_111_test.dat").exists()
    assert (wd / "results/sampled/vn/vn_321_test.dat").exists()


def test_driver_particle_list_run(reference_dir, tmp_path):
    wd = _make_workdir(tmp_path, reference_dir,
                       {"operation": 2, "df_mode": 1, "hrg_eos": 3})
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, test_sampler=0,
                 min_num_hadrons=500, max_num_samples=5, cell_block=64)
    run = IS3D(wd, cfg=cfg)
    run.run_particlization()
    assert run.final_particles is not None
    assert run.final_particles.n_valid > 0
    assert (wd / "results/particle_list_osc_1.dat").exists()
    rows = (wd / "results/particle_list_osc_1.dat").read_text().splitlines()
    assert rows[0] == "n pid px py pz E m x y z t"


def test_driver_memory_surface(reference_dir, tmp_path):
    """JETSCAPE-style in-memory surface load (iS3D.cpp:33-78)."""
    wd = _make_workdir(tmp_path, reference_dir,
                       {"operation": 1, "df_mode": 1, "hrg_eos": 3})
    surf = make_surface(25, seed=8)
    run = IS3D(wd, cfg=Config(operation=1, df_mode=2, hrg_eos=3, cell_block=32))
    n = surf.n_cells
    run.load_surface_from_memory(
        tau=surf.tau, x=surf.x, y=surf.y, eta=surf.eta,
        dsigma_tau=surf.dat, dsigma_x=surf.dax, dsigma_y=surf.day,
        dsigma_eta=surf.dan, E=surf.E, T=surf.T, P=surf.P,
        ux=surf.ux, uy=surf.uy, un=surf.un,
        pixx=surf.pixx, pixy=surf.pixy, pixn=surf.pixn,
        piyy=surf.piyy, piyn=surf.piyn, pinn=np.zeros(n), Pi=surf.bulkPi)
    run.run_particlization(fo_from_file=False)
    assert run.spectra is not None
