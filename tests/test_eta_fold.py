"""Folded symmetric eta quadrature (spectra_fast.fold_eta_quadrature).

The 2+1d CF integrand at y = 0 is even in eta except for terms sourced by
un/dan/pitn/pixn/piyn/Vn, which cancel pairwise exactly over the reference's
symmetric Gauss nodes (the reference evaluates both +-eta,
MomentumSpectra.cpp:302-363, so the quadrature value IS the even part's
integral).  Folding onto the eta >= 0 half-nodes with doubled weights must
reproduce the full quadrature to rounding, and the gate must refuse whenever
the pairwise cancellation is not exact.
"""

import dataclasses
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.cells import prepare_cells
from is3d2_tpu.core.spectra import (MomentumGridDevice, SpeciesArrays,
                                    compute_spectra, df12_cell_coefficients,
                                    _spectra_df12_jit)
from is3d2_tpu.core.spectra_fast import fold_eta_quadrature

PIKP = (111, 321, 2212)


@pytest.fixture(scope="module")
def setup(reference_dir):
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    df_data = DeltafData(tables, 1, include_baryon=False)
    surf = make_surface(96, seed=31, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=32, compute_dtype="f32")
    chosen = species.chosen_indices(PIKP)
    return species, grids, df_data, surf, cfg, chosen


def _cells_grid(setup, cfg):
    species, grids, df_data, surf, _, chosen = setup
    cells = prepare_cells(surf, cfg, block=32)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    sp = SpeciesArrays.from_table(species, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)
    return cells, coeffs, sp, grid


def _inject_odd_shear(cells):
    """Give the cells nonzero odd-in-eta shear sources (a 2+1d surface has
    none by construction; a hand-tilted one exercises the cancellation)."""
    rng = np.random.default_rng(11)
    scale = 0.02
    return dataclasses.replace(
        cells,
        pitn=jnp.asarray(rng.uniform(-1, 1, cells.n_padded) * scale)
        * cells.pad_mask,
        pixn=jnp.asarray(rng.uniform(-1, 1, cells.n_padded) * scale)
        * cells.pad_mask,
        piyn=jnp.asarray(rng.uniform(-1, 1, cells.n_padded) * scale)
        * cells.pad_mask)


def test_fold_halves_nodes_and_matches_f32(setup):
    species, grids, df_data, surf, cfg, chosen = setup
    ref = compute_spectra(surf, species, chosen, grids, df_data,
                          dataclasses.replace(cfg, eta_fold=0), None)
    out = compute_spectra(surf, species, chosen, grids, df_data, cfg, None)
    cells, coeffs, sp, grid = _cells_grid(setup, cfg)
    fcells, fgrid, folded = fold_eta_quadrature(cells, grid, cfg)
    assert folded and fgrid.eta.shape[0] == grid.eta.shape[0] // 2
    r, o = np.asarray(ref), np.asarray(out)
    assert np.max(np.abs(o - r)) / np.abs(r).max() < 5e-6


def test_fold_exact_in_f64(setup):
    """On the f64 broadcast kernel the folded inputs reproduce the unfolded
    sum to ~1e-12: the only difference is the rounding of the odd terms the
    unfolded quadrature carries to exact pairwise cancellation."""
    species, grids, df_data, surf, cfg, chosen = setup
    cfg64 = dataclasses.replace(cfg, compute_dtype="f64")
    cells, coeffs, sp, grid = _cells_grid(setup, cfg64)
    cells = _inject_odd_shear(cells)
    n_blocks = cells.n_padded // 32
    ref = _spectra_df12_jit(cells, coeffs, sp, grid, cfg64, n_blocks)
    fcells, fgrid, folded = fold_eta_quadrature(cells, grid, cfg64)
    assert folded
    out = _spectra_df12_jit(fcells, coeffs, sp, fgrid, cfg64, n_blocks)
    r, o = np.asarray(ref), np.asarray(out)
    assert np.max(np.abs(o - r)) / np.abs(r).max() < 1e-12


def test_fold_f32c_matches_f64(setup):
    """The compensated path keeps its <=1e-6 bar with the fold on."""
    species, grids, df_data, surf, cfg, chosen = setup
    cfgc = dataclasses.replace(cfg, compute_dtype="f32c")
    cfg64 = dataclasses.replace(cfg, compute_dtype="f64")
    ref = compute_spectra(surf, species, chosen, grids, df_data, cfg64, None)
    out = compute_spectra(surf, species, chosen, grids, df_data, cfgc, None)
    r, o = np.asarray(ref), np.asarray(out)
    sig = np.abs(r) > 1e-8 * np.abs(r).max()
    err = (np.abs(o - r) / np.maximum(np.abs(r), 1e-300))[sig].max()
    assert err < 1e-6, f"f32c folded vs f64 max rel err {err:.2e}"


@pytest.mark.parametrize("reason", ["un", "outflow_dan", "regulate_pixn",
                                    "off", "dim3"])
def test_fold_gate_refuses(setup, reason):
    species, grids, df_data, surf, cfg, chosen = setup
    cells, coeffs, sp, grid = _cells_grid(setup, cfg)
    if reason == "un":
        cells = dataclasses.replace(cells, un=cells.un.at[3].set(0.01))
    elif reason == "outflow_dan":
        cfg = dataclasses.replace(cfg, outflow=1)
        cells = dataclasses.replace(cells, dan=cells.dan.at[2].set(0.02))
    elif reason == "regulate_pixn":
        cfg = dataclasses.replace(cfg, regulate_deltaf=1)
        cells = _inject_odd_shear(cells)
    elif reason == "off":
        cfg = dataclasses.replace(cfg, eta_fold=0)
    elif reason == "dim3":
        cfg = dataclasses.replace(cfg, dimension=3)
    _, _, folded = fold_eta_quadrature(cells, grid, cfg)
    assert not folded


@pytest.mark.parametrize("df_mode", [3, 5])
def test_strict_fold_feqmod_famod(setup, df_mode):
    """The nonlinear feqmod/famod fast integrands fold under the STRICT
    gate (all odd sources exactly zero -> pointwise even)."""
    from surfgen import make_eos_consistent
    from is3d2_tpu.io.tables import GaussLaguerre

    species, grids, df_data, surf, cfg, chosen = setup
    ref_dir = Path(__file__).parent.parent.parent / "reference"
    laguerre = GaussLaguerre.from_file(
        ref_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=ref_dir / "deltaf_coefficients/vh")
    dfd = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species, laguerre)
    cfgm = dataclasses.replace(cfg, df_mode=df_mode, compute_dtype="f32")
    ref = compute_spectra(surf, species, chosen, grids, dfd,
                          dataclasses.replace(cfgm, eta_fold=0), laguerre)
    out = compute_spectra(surf, species, chosen, grids, dfd, cfgm, laguerre)
    r, o = np.asarray(ref), np.asarray(out)
    sig = np.abs(r) > 1e-8 * np.abs(r).max()
    err = (np.abs(o - r) / np.maximum(np.abs(r), 1e-300))[sig].max()
    assert err < 5e-6, f"df{df_mode} folded vs unfolded: {err:.2e}"


def test_strict_fold_gate_requires_all_zero(setup):
    species, grids, df_data, surf, cfg, chosen = setup
    cells, coeffs, sp, grid = _cells_grid(setup, cfg)
    _, _, folded = fold_eta_quadrature(cells, grid, cfg, strict=True)
    assert folded  # a 2+1d surface has no odd sources
    cells2 = _inject_odd_shear(cells)
    _, fgrid, folded2 = fold_eta_quadrature(cells2, grid, cfg, strict=True)
    assert not folded2


def test_fold_gate_refuses_dan_with_odd_df_cross_term(setup):
    """dan AND odd shear together: odd(dan)*odd(df) is EVEN in eta and
    survives the reference's full symmetric quadrature, so the fold (which
    zeroes both families) must refuse even with outflow and regulation
    both off.  Also verifies the refusal is load-bearing: force-folding by
    hand-zeroing the odd sources changes the f64 result far above 1e-12."""
    species, grids, df_data, surf, cfg, chosen = setup
    cells, coeffs, sp, grid = _cells_grid(setup, cfg)
    rng = np.random.default_rng(7)
    cells = _inject_odd_shear(cells)
    cells = dataclasses.replace(
        cells, dan=jnp.asarray(rng.uniform(-0.02, 0.02, cells.n_padded))
        * cells.pad_mask)
    cfg64 = dataclasses.replace(cfg, compute_dtype="f64")
    assert not cfg64.outflow and not cfg64.regulate_deltaf
    _, _, folded = fold_eta_quadrature(cells, grid, cfg64)
    assert not folded, "gate must refuse dan + odd df together"

    # the would-be fold (zero both odd families, half nodes) drops the
    # even cross term: demonstrate a real deviation on the f64 kernel
    n_blocks = cells.n_padded // 32
    ref = _spectra_df12_jit(cells, coeffs, sp, grid, cfg64, n_blocks)
    zeros = jnp.zeros_like(cells.dan)
    zcells = dataclasses.replace(cells, dan=zeros, pitn=zeros, pixn=zeros,
                                 piyn=zeros, Vn=zeros)
    _, fgrid, zfolded = fold_eta_quadrature(zcells, grid, cfg64)
    assert zfolded
    bad = _spectra_df12_jit(zcells, coeffs, sp, fgrid, cfg64, n_blocks)
    r, b = np.asarray(ref), np.asarray(bad)
    assert np.max(np.abs(b - r)) / np.abs(r).max() > 1e-9, \
        "cross term unexpectedly negligible; gate test not load-bearing"


def test_fold_allows_dan_without_outflow(setup):
    """dan's odd term sits outside the exp and the clip: it folds away
    exactly when outflow is off."""
    species, grids, df_data, surf, cfg, chosen = setup
    cells, coeffs, sp, grid = _cells_grid(setup, cfg)
    rng = np.random.default_rng(3)
    cells = dataclasses.replace(
        cells, dan=jnp.asarray(rng.uniform(-0.02, 0.02, cells.n_padded))
        * cells.pad_mask)
    n_blocks = cells.n_padded // 32
    cfg64 = dataclasses.replace(cfg, compute_dtype="f64")
    ref = _spectra_df12_jit(cells, coeffs, sp, grid, cfg64, n_blocks)
    fcells, fgrid, folded = fold_eta_quadrature(cells, grid, cfg64)
    assert folded and float(jnp.max(jnp.abs(fcells.dan))) == 0.0
    out = _spectra_df12_jit(fcells, coeffs, sp, fgrid, cfg64, n_blocks)
    r, o = np.asarray(ref), np.asarray(out)
    assert np.max(np.abs(o - r)) / np.abs(r).max() < 1e-12
