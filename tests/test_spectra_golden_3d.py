"""Golden tests: 3+1d surfaces and baryon diffusion vs the reference binary."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, write_mode1
from oracle.run_oracle import setup_sandbox, run_oracle
from test_spectra_golden import _read_oracle_spectra, PIKP

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.spectra import compute_spectra


def _compare(ours, ref, tol=1e-6):
    scale = np.abs(ref).max()
    err = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12 * scale)
    sig = np.abs(ref) > 1e-10 * scale
    assert err[sig].max() < tol, f"max rel err {err[sig].max():.3e}"


@pytest.mark.parametrize("df_mode", [1, 2])
def test_spectra_3plus1d(reference_dir, tmp_path, df_mode):
    surf = make_surface(40, seed=7, dimension=3)
    surf_file = tmp_path / "surface_gen.dat"
    write_mode1(surf, surf_file)

    sandbox = tmp_path / f"sb_df{df_mode}"
    params = {"operation": 1, "df_mode": df_mode, "hrg_eos": 3, "dimension": 3,
              "include_shear_deltaf": 1, "include_bulk_deltaf": 1}
    setup_sandbox(sandbox, params, surf_file, chosen_mcids=PIKP)
    run_oracle(sandbox)

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(operation=1, dimension=3, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=16)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    ours = compute_spectra(surf, species, chosen, grids, df_data, cfg, laguerre)
    ref = _read_oracle_spectra(sandbox, PIKP, len(grids.pT), len(grids.phi),
                               len(grids.y))
    _compare(ours, ref)

    # The 3+1d COMPENSATED fast path (light-cone split-exact exp argument,
    # _block_fast_3d_comp) against the compiled C++ reference.  Error
    # budget (round-5, pinned here): the exp-argument compensation brings
    # non-cancelling bins under 1e-6 (measured 5.2e-7 on this surface at
    # |ref| > 1e-4 peak; 6.9e-7 on per-species significant bins of the
    # seed-77 surface, vs ~3e-6 for plain f32) -- but y/pT-EDGE bins where
    # O(peak)-sized per-cell contributions cancel across cells to ~1e-6 of
    # peak cannot hold 1e-6 RELATIVE in any f32-valued scheme: each cell's
    # value carries one f32 rounding (6e-8 of ITS magnitude), so a
    # cancellation factor kappa leaves kappa*6e-8 (measured 5.6e-5 at
    # kappa ~ 1e3 here; the f64 path is the carrier for such bins).
    # Assert the two honest bounds: <=1e-6 relative away from the
    # cancellation tail, and an absolute bound ~2 f32 ulps of peak
    # everywhere.
    import dataclasses
    cfg_c = dataclasses.replace(cfg, compute_dtype="f32c")
    ours_c = np.asarray(compute_spectra(surf, species, chosen, grids,
                                        df_data, cfg_c, laguerre))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-4 * scale
    err = (np.abs(ours_c - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err < 1e-6, f"3+1d f32c max rel err {err:.3e}"
    abs_err = (np.abs(ours_c - ref) / scale).max()
    assert abs_err < 2.5e-7, f"3+1d f32c abs/peak {abs_err:.3e}"


@pytest.mark.parametrize("df_mode", [1, 2])
def test_spectra_baryon_diffusion(reference_dir, tmp_path, df_mode):
    """include_baryon + baryon diffusion, urqmd EoS (bilinear (T,muB) tables)."""
    surf = make_surface(40, seed=11, include_baryon=True)
    surf_file = tmp_path / "surface_gen.dat"
    write_mode1(surf, surf_file, include_baryon=True)

    sandbox = tmp_path / f"sb_b_df{df_mode}"
    params = {"operation": 1, "df_mode": df_mode, "hrg_eos": 1,
              "include_baryon": 1, "include_baryondiff_deltaf": 1,
              "include_shear_deltaf": 1, "include_bulk_deltaf": 1}
    setup_sandbox(sandbox, params, surf_file, chosen_mcids=PIKP)
    run_oracle(sandbox)

    species = read_pdg(1, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(1, include_baryon=True,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=1, include_baryon=1,
                 include_baryondiff_deltaf=1, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=16)
    df_data = DeltafData(tables, df_mode, include_baryon=True)
    chosen = species.chosen_indices(PIKP)

    ours = compute_spectra(surf, species, chosen, grids, df_data, cfg, laguerre)
    ref = _read_oracle_spectra(sandbox, PIKP, len(grids.pT), len(grids.phi), 1)
    _compare(ours, ref)
