"""Legacy VAH surface formats (modes 2/3, readindata.cu:812-1055)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, make_eos_consistent

from is3d2_tpu.constants import hbarC
from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids, load_table
from is3d2_tpu.io.surface import read_surface, aL_fit, R200
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.cells import prepare_cells
from is3d2_tpu.core.spectra import compute_spectra
from is3d2_tpu.core.spectra_famod import prepare_famod


def test_aL_fit_conformal_limits():
    # at pl/p = 1 the fit returns the isotropic point aL = 1, and
    # Lambda = T / (0.5 aL R200(aL))^(1/4) = T since R200(1) = 2
    aL = float(aL_fit(np.array([1.0]))[0])
    assert abs(aL - 1.0) < 1e-3
    assert abs(float(R200(np.array([1.0]))[0]) - 2.0) < 1e-12
    # oblate and prolate sides move the right way
    assert float(aL_fit(np.array([0.5]))[0]) < 1.0
    assert float(aL_fit(np.array([1.5]))[0]) > 1.0


def _write_mode3(surf, lam, aT, aL, path):
    """(x^mu, da_mu, u^mu, e, T, pl, pt, pi[10], W[4], Lambda, aT, aL),
    raw hbar=1 units, include_baryon = 0."""
    n = surf.n_cells
    tau2 = surf.tau ** 2
    ut = np.sqrt(1.0 + surf.ux**2 + surf.uy**2 + tau2 * surf.un**2)
    z = np.zeros(n)
    cols = np.column_stack([
        surf.tau, surf.x, surf.y, surf.eta,
        surf.dat, surf.dax, surf.day, surf.dan,
        ut, surf.ux, surf.uy, surf.un,
        surf.E / hbarC, surf.T / hbarC, surf.P / hbarC, surf.P / hbarC,
        z, z, z, z,                                   # pitt pitx pity pitn
        surf.pixx / hbarC, surf.pixy / hbarC, surf.pixn / hbarC,
        surf.piyy / hbarC, surf.piyn / hbarC, z,      # pinn (recompleted)
        z, z, z, z,                                   # W^mu
        lam / hbarC, aT, aL,
    ])
    np.savetxt(path, cols, fmt="%.17g")


def test_mode3_roundtrip_matches_reconstruction(reference_dir, tmp_path):
    """A mode-3 surface carrying the solver's own (Lambda, aT, aL) must give
    the same famod spectra as reconstructing from scratch."""
    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    lagg = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    df_data = DeltafData(tables, 5, include_baryon=False)

    surf = make_surface(64, seed=13, shear_scale=0.02, bulk_scale=0.005)
    surf = make_eos_consistent(surf, species_t, lagg)
    cfg = Config(operation=1, df_mode=5, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=64)
    chosen = species_t.chosen_indices((211, 321, 2212))

    # reconstruction path
    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg, lagg)

    # extract the solved variables and write a mode-3 file with them
    cells = prepare_cells(surf, cfg, block=64)
    fm = prepare_famod(cells, species_t, cfg)
    n = surf.n_cells
    f = tmp_path / "surface_mode3.dat"
    _write_mode3(surf, np.asarray(fm.lam)[:n], np.asarray(fm.aT)[:n],
                 np.asarray(fm.aL)[:n], f)

    surf3 = read_surface(f, mode=3, dimension=2, include_baryon=False)
    assert surf3.has_aniso_variables
    np.testing.assert_allclose(surf3.Lambda, np.asarray(fm.lam)[:n], rtol=1e-12)
    np.testing.assert_allclose(surf3.pixy, surf.pixy, rtol=1e-12)

    out = compute_spectra(surf3, species_t, chosen, grids, df_data, cfg, lagg)
    sig = np.abs(ref) > 1e-9 * np.abs(ref).max()
    rel = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert rel < 1e-10, f"mode-3 roundtrip err {rel:.2e}"


def test_mode2_reader_smoke(tmp_path):
    """PL-matching format parses and infers sane (aL, Lambda)."""
    n = 8
    surf = make_surface(n, seed=5, shear_scale=0.01, bulk_scale=0.0)
    z = np.zeros(n)
    tau2 = surf.tau ** 2
    ut = np.sqrt(1.0 + surf.ux**2 + surf.uy**2 + tau2 * surf.un**2)
    PL = 0.9 * surf.P
    cols = np.column_stack([
        surf.tau, surf.x, surf.y, surf.eta,
        surf.dat, surf.dax, surf.day, surf.dan,
        ut, surf.ux, surf.uy, surf.un,
        surf.E / hbarC, surf.T / hbarC, surf.P / hbarC, PL / hbarC,
        z, z, z, z,
        surf.pixx / hbarC, surf.pixy / hbarC, surf.pixn / hbarC,
        surf.piyy / hbarC, surf.piyn / hbarC, z,
        z, z, z, z,
        surf.bulkPi / hbarC,
    ])
    f = tmp_path / "surface_mode2.dat"
    np.savetxt(f, cols, fmt="%.17g")
    s = read_surface(f, mode=2, dimension=2, include_baryon=False)
    assert s.has_aniso_variables
    assert np.all(s.aL < 1.0) and np.all(s.aL > 0.5)   # slightly prolate
    assert np.all(s.Lambda > 0.0)
    np.testing.assert_allclose(s.PL, PL, rtol=1e-12)
    np.testing.assert_allclose(s.E, surf.E, rtol=1e-12)
