"""Pallas Cooper-Frye kernel vs the validated XLA paths (interpret mode on CPU)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import MomentumGrids, load_table
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.cells import prepare_cells
from is3d2_tpu.core.spectra import (SpeciesArrays, MomentumGridDevice,
                                    compute_spectra, df12_cell_coefficients)
from is3d2_tpu.ops.spectra_fast_common import compute_spectra_pallas

PIKP = (111, 321, 2212, 2112, -2212, -2112)


@pytest.mark.parametrize("df_mode", [1, 2])
def test_pallas_kernel_matches_reference_path(reference_dir, df_mode):
    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(48, seed=29, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=64)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg)

    cells = prepare_cells(surf, cfg, block=64)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    # dot_impl="highest": the exact-MXU variant (production default is
    # "split" since the 2026-08-19 sweep; its looser error class is bounded
    # by test_pallas_split_dot_matches below)
    out = np.asarray(compute_spectra_pallas(cells, coeffs, species, grid, cfg,
                                            c_tile=32, m_tile=256,
                                            interpret=True,
                                            dot_impl="highest"))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    err = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err < 5e-5, f"pallas kernel err {err:.2e}"  # f32 compute tolerance


@pytest.mark.parametrize("df_mode", [3, 4, 5])
def test_pallas_feqmod_kernel_matches_reference_path(reference_dir, df_mode):
    """feqmod/famod (df 3/4/5) P9 Pallas kernel vs the f64 golden engine."""
    from surfgen import make_eos_consistent
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.feqmod import prepare_feqmod
    from is3d2_tpu.core.spectra_famod import prepare_famod
    from is3d2_tpu.ops.cooper_frye_feqmod_pallas import (
        compute_spectra_feqmod_pallas)

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    surf = make_surface(48, seed=29, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=64)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species_t, laguerre)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        from is3d2_tpu.io.surface import ThermoAverages
        df_data.compute_jonah_coefficients(
            species_t, laguerre, ThermoAverages(0.155, 0.25, 0.08, 0.0, 0.0))
    chosen = species_t.chosen_indices(PIKP)

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg,
                          laguerre)

    cells = prepare_cells(surf, cfg, block=64)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)
    if df_mode == 5:
        prep = prepare_famod(cells, species_t, cfg)
    else:
        prep = prepare_feqmod(cells, species, df_data, cfg, laguerre)

    out = np.asarray(compute_spectra_feqmod_pallas(
        cells, prep, species, grid, cfg, c_tile=32, m_tile=256,
        interpret=True))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    err = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err < 1e-4, f"pallas feqmod df{df_mode} err {err:.2e}"


@pytest.mark.parametrize("df_mode", [3, 5])
def test_pallas_feqmod_mxu_variant(reference_dir, df_mode):
    """dot_impl="mxu" for the feqmod/famod kernel: the K<=6 contractions
    move onto MXU dots (HIGHEST for the exp arguments E2/E, 3-pass
    exact-bf16-split for pdd/pim/Vp, 2-pass split cell reduction) -- the
    df-1/2 split kernel's winning restructure extended to df 3/4/5.
    Interpret-mode parity vs the f64 golden engine; the on-silicon speed
    decision runs through tools/pallas_feqmod_sweep.py."""
    from surfgen import make_eos_consistent
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.feqmod import prepare_feqmod
    from is3d2_tpu.core.spectra_famod import prepare_famod
    from is3d2_tpu.ops.cooper_frye_feqmod_pallas import (
        compute_spectra_feqmod_pallas)

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    surf = make_surface(48, seed=29, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=64)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species_t, laguerre)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg,
                          laguerre)
    cells = prepare_cells(surf, cfg, block=64)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)
    if df_mode == 5:
        prep = prepare_famod(cells, species_t, cfg)
    else:
        prep = prepare_feqmod(cells, species, df_data, cfg, laguerre)

    out = np.asarray(compute_spectra_feqmod_pallas(
        cells, prep, species, grid, cfg, c_tile=32, m_tile=256,
        interpret=True, dot_impl="mxu"))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    err = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err < 1e-4, f"pallas feqmod mxu df{df_mode} err {err:.2e}"


@pytest.mark.parametrize("df_mode", [1, 5])
def test_use_pallas_config_dispatch(reference_dir, df_mode):
    """`use_pallas = 1` routes compute_spectra through the Pallas kernels
    (interpret mode on the CPU backend) and matches the f64 engine."""
    import dataclasses
    from surfgen import make_eos_consistent
    from is3d2_tpu.io.tables import GaussLaguerre

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    surf = make_surface(48, seed=31, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=64)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species_t, laguerre)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg,
                          laguerre)
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    out = compute_spectra(surf, species_t, chosen, grids, df_data, cfg_p,
                          laguerre)
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    err = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err < 1e-4, f"use_pallas df{df_mode} err {err:.2e}"


@pytest.mark.parametrize("df_mode", [1, 2])
def test_pallas_comp_kernel_meets_accuracy_bar(reference_dir, df_mode):
    """dot_impl="comp" (the compensated-argument kernel, _kernel_comp)
    meets the BASELINE <=1e-6 bar against the f64 reference engine in
    interpret mode: the exp argument is split-exact (the f32c trick inside
    VMEM), the linear contractions are f32 FMA chains, pi pp keeps a
    HIGHEST dot, and accumulation is TwoSum-compensated end to end.  CPU
    interpret DEFAULT dots are plain f32 (no bf16 rounding), so the
    on-silicon bound is re-checked by test_pallas_tpu.py."""
    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(48, seed=29, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=64,
                 compute_dtype="f64")
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg)
    cells = prepare_cells(surf, cfg, block=64)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    out = np.asarray(compute_spectra_pallas(cells, coeffs, species, grid, cfg,
                                            c_tile=32, m_tile=256,
                                            interpret=True, dot_impl="comp"))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-8 * scale
    err = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err < 1e-6, f"pallas comp kernel err {err:.2e}"


@pytest.mark.parametrize("df_mode", [1, 2])
def test_pallas_split_dot_matches(reference_dir, df_mode):
    """dot_impl="split" (the 2/3-pass exact-bf16-split MXU dots, the
    production default since the 2026-08-19 on-silicon sweep) matches the
    reference path in interpret mode.  The dropped A_l*B_l term and the
    correction-pass rounding are O(2^-18 |A||B|) ~ 4e-6 of the CONTRACTION
    magnitude, which can reach ~1e-4 RELATIVE on spectra entries where the
    df correction nearly cancels the equilibrium term (df 2's V.p
    diffusion tails measured 5.3e-5); bound accordingly.  CPU interpret
    DEFAULT dots are plain f32, so this checks the split algebra and
    truncation; real bf16 rounding is covered on silicon
    (test_pallas_tpu.py)."""
    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(48, seed=29, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=64)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg)
    cells = prepare_cells(surf, cfg, block=64)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    out = np.asarray(compute_spectra_pallas(cells, coeffs, species, grid, cfg,
                                            c_tile=32, m_tile=256,
                                            interpret=True, dot_impl="split"))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    err = (np.abs(out - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err < 2e-4, f"pallas split-dot kernel err {err:.2e}"
