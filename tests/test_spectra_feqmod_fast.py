"""MXU-structured feqmod/famod fast path vs the validated broadcast kernels."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, make_eos_consistent

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids, load_table
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.cells import prepare_cells
from is3d2_tpu.core.spectra import SpeciesArrays, MomentumGridDevice
from is3d2_tpu.core.feqmod import prepare_feqmod
from is3d2_tpu.core.spectra_feqmod import _spectra_feqmod_jit
from is3d2_tpu.core.spectra_famod import prepare_famod, _spectra_famod_jit
from is3d2_tpu.core.spectra_feqmod_fast import compute_spectra_feqmod_fast

PIKP = (111, 321, 2212, 2112, -2212, -2112)


def _setup(reference_dir, df_mode, **surf_kw):
    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    lag = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(96, seed=11, **surf_kw)
    return species_t, grids, lag, tables, surf


def _rel_err(fast, ref, thr=1e-9):
    ref = np.asarray(ref)
    fast = np.asarray(fast)
    scale = np.abs(ref).max()
    sig = np.abs(ref) > thr * scale
    return (np.abs(fast - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()


@pytest.mark.parametrize("df_mode,outflow", [(3, 0), (3, 1), (4, 0), (4, 1)])
def test_feqmod_fast_matches_broadcast(reference_dir, df_mode, outflow):
    species_t, grids, lag, tables, surf = _setup(
        reference_dir, df_mode, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 outflow=outflow, cell_block=32)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(species_t, lag,
                                           surf.thermo_averages())
    chosen = species_t.chosen_indices(PIKP)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    cells = prepare_cells(surf, cfg, block=32)
    fq = prepare_feqmod(cells, species, df_data, cfg, lag)
    ref = _spectra_feqmod_jit(cells, fq, species, grid, cfg, 3)
    fast = compute_spectra_feqmod_fast(cells, fq, species, grid, cfg,
                                       n_cell_blocks=3)
    err = _rel_err(fast, ref)
    assert err < 2e-4, f"feqmod fast path err {err:.2e}"


def test_feqmod_fast_breakdown_heavy(reference_dir):
    """Large bulk forces many cells onto the linearized branch."""
    species_t, grids, lag, tables, surf = _setup(
        reference_dir, 3, shear_scale=0.08, bulk_scale=0.12)
    cfg = Config(operation=1, df_mode=3, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 include_baryondiff_deltaf=0, cell_block=32)
    df_data = DeltafData(tables, 3, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    cells = prepare_cells(surf, cfg, block=32)
    fq = prepare_feqmod(cells, species, df_data, cfg, lag)
    n_break = int(np.asarray(fq.breaks_down).sum())
    assert n_break > 5, "test surface should trigger breakdowns"
    ref = _spectra_feqmod_jit(cells, fq, species, grid, cfg, 3)
    fast = compute_spectra_feqmod_fast(cells, fq, species, grid, cfg,
                                       n_cell_blocks=3)
    err = _rel_err(fast, ref)
    assert err < 2e-4, f"breakdown-heavy fast err {err:.2e}"


def test_famod_fast_matches_broadcast(reference_dir):
    species_t, grids, lag, tables, surf = _setup(
        reference_dir, 5, shear_scale=0.03, bulk_scale=0.01)
    surf = make_eos_consistent(surf, species_t, lag)
    cfg = Config(operation=1, df_mode=5, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=32)
    chosen = species_t.chosen_indices(PIKP)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    cells = prepare_cells(surf, cfg, block=32)
    fm = prepare_famod(cells, species_t, cfg)
    ref = _spectra_famod_jit(cells, fm, species, grid, cfg, 3)
    fast = compute_spectra_feqmod_fast(cells, fm, species, grid, cfg,
                                       n_cell_blocks=3)
    err = _rel_err(fast, ref)
    assert err < 2e-4, f"famod fast path err {err:.2e}"


@pytest.mark.parametrize("df_mode", [3, 4])
def test_feqmod_fast_3plus1d(reference_dir, df_mode):
    """3+1d light-cone fast path vs the broadcast kernel."""
    species_t, grids, lag, tables, surf = _setup(
        reference_dir, df_mode, dimension=3, shear_scale=0.03,
        bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3, dimension=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=32)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(species_t, lag,
                                           surf.thermo_averages())
    chosen = species_t.chosen_indices(PIKP[:4])
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    cells = prepare_cells(surf, cfg, block=32)
    fq = prepare_feqmod(cells, species, df_data, cfg, lag)
    ref = _spectra_feqmod_jit(cells, fq, species, grid, cfg, 3)
    fast = compute_spectra_feqmod_fast(cells, fq, species, grid, cfg,
                                       n_cell_blocks=3)
    err = _rel_err(fast, ref, thr=1e-7)
    assert err < 1e-3, f"3+1d feqmod fast err {err:.2e}"


def test_famod_fast_3plus1d(reference_dir):
    species_t, grids, lag, tables, surf = _setup(
        reference_dir, 5, dimension=3, shear_scale=0.02, bulk_scale=0.005)
    surf = make_eos_consistent(surf, species_t, lag)
    cfg = Config(operation=1, df_mode=5, hrg_eos=3, dimension=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=32)
    chosen = species_t.chosen_indices(PIKP[:4])
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    cells = prepare_cells(surf, cfg, block=32)
    fm = prepare_famod(cells, species_t, cfg)
    ref = _spectra_famod_jit(cells, fm, species, grid, cfg, 3)
    fast = compute_spectra_feqmod_fast(cells, fm, species, grid, cfg,
                                       n_cell_blocks=3)
    err = _rel_err(fast, ref, thr=1e-7)
    assert err < 1e-3, f"3+1d famod fast err {err:.2e}"


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4])
def test_dNdX_fast_matches_broadcast(reference_dir, df_mode):
    """Operation-0 fast per-cell dN/dy path vs the broadcast kernel."""
    import dataclasses as dc
    from is3d2_tpu.core.spacetime import compute_dN_dX
    species_t, grids, lag, tables, surf = _setup(
        reference_dir, df_mode, shear_scale=0.03, bulk_scale=0.01)
    base = Config(operation=0, df_mode=df_mode, hrg_eos=3,
                  include_shear_deltaf=1, include_bulk_deltaf=1,
                  cell_block=32)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(species_t, lag,
                                           surf.thermo_averages())
    chosen = species_t.chosen_indices(PIKP[:3])

    ref = compute_dN_dX(surf, species_t, chosen, grids, df_data,
                        dc.replace(base, compute_dtype="f64"), lag)
    fast = compute_dN_dX(surf, species_t, chosen, grids, df_data,
                         dc.replace(base, compute_dtype="f32"), lag)
    for name in ("dN_taudtaudy", "dN_twopirdrdy", "dN_dphidy"):
        a = getattr(fast, name)
        b = getattr(ref, name)
        sig = np.abs(b) > 1e-8 * np.abs(b).max()
        rel = (np.abs(a - b) / np.maximum(np.abs(b), 1e-300))[sig]
        assert rel.max() < 2e-4, f"{name} df{df_mode}: {rel.max():.2e}"
