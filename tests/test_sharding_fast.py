"""Sharded fast-path spectra match the single-device fast path."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
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
                                    df12_cell_coefficients)
from is3d2_tpu.core.spectra_fast import compute_spectra_fast
from is3d2_tpu.parallel.sharding import make_mesh, sharded_spectra_fast

SPECIES8 = (111, 321, 2212, 2112, -2212, -2112, 211, -211)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_fast_matches_single(reference_dir, mesh_shape):
    assert len(jax.devices()) == 8

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(96, seed=31, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=16)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species_t.chosen_indices(SPECIES8)

    cells = prepare_cells(surf, cfg, block=16)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    single = np.asarray(compute_spectra_fast(
        cells, coeffs, species, grid, cfg, n_blocks=cells.n_padded // 16,
        compute_dtype=jnp.float32))

    mesh = make_mesh(mesh_shape[0], mesh_shape[1])
    out = np.asarray(sharded_spectra_fast(cells, coeffs, species, grid, cfg,
                                          mesh, block=16))

    S = len(SPECIES8)
    scale = np.abs(single).max()
    sig = np.abs(single) > 1e-10 * scale
    err = (np.abs(out[:S] - single) / np.maximum(np.abs(single), 1e-300))[sig].max()
    # f32 reductions reassociate across the shard boundary
    assert err < 1e-5, f"max rel err {err:.2e}"


@pytest.mark.parametrize("df_mode,mesh_shape", [(3, (8, 1)), (3, (4, 2)),
                                                (5, (4, 2))])
def test_sharded_feqmod_fast_matches_single(reference_dir, df_mode, mesh_shape):
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.feqmod import prepare_feqmod
    from is3d2_tpu.core.spectra_famod import prepare_famod
    from is3d2_tpu.core.spectra_feqmod_fast import compute_spectra_feqmod_fast
    from is3d2_tpu.parallel.sharding import sharded_spectra_feqmod_fast
    from surfgen import make_eos_consistent

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    lag = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(96, seed=23, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 cell_block=16, compute_dtype="f32")
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species_t.chosen_indices(SPECIES8)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    if df_mode == 5:
        surf = make_eos_consistent(surf, species_t, lag)
    cells = prepare_cells(surf, cfg, block=16)
    if df_mode == 5:
        prep = prepare_famod(cells, species_t, cfg)
    else:
        prep = prepare_feqmod(cells, species, df_data, cfg, lag)

    single = np.asarray(compute_spectra_feqmod_fast(
        cells, prep, species, grid, cfg, n_cell_blocks=cells.n_padded // 16))

    mesh = make_mesh(mesh_shape[0], mesh_shape[1])
    out = np.asarray(sharded_spectra_feqmod_fast(cells, prep, species, grid,
                                                 cfg, mesh, block=16))

    S = len(SPECIES8)
    scale = np.abs(single).max()
    sig = np.abs(single) > 1e-10 * scale
    err = (np.abs(out[:S] - single) / np.maximum(np.abs(single), 1e-300))[sig].max()
    assert err < 1e-5, f"df{df_mode} sharded feqmod err {err:.2e}"


@pytest.mark.parametrize("mesh_shape,dimension", [((8, 1), 2), ((4, 2), 2),
                                                  ((8, 1), 3)])
def test_sharded_polarization_matches_single(reference_dir, mesh_shape,
                                             dimension):
    """sharded_polarization_fast == the single-device f32 fast path."""
    from is3d2_tpu.core.polarization_fast import compute_polarization_fast
    from is3d2_tpu.parallel.sharding import (make_mesh,
                                             sharded_polarization_fast)

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    surf = make_surface(96, seed=17, vorticity=True)
    cfg = Config(operation=1, mode=5, df_mode=1, hrg_eos=3, cell_block=32,
                 dimension=dimension)
    chosen = species_t.chosen_indices((3122,))
    cells = prepare_cells(surf, cfg, block=32)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)
    T, delta_eta = 0.15, 1.0

    single = np.asarray(compute_polarization_fast(
        cells, species, grid, T, cfg, n_blocks=cells.n_padded // 32,
        delta_eta=delta_eta))

    mesh = make_mesh(mesh_shape[0], mesh_shape[1])
    out = np.asarray(sharded_polarization_fast(
        cells, species, grid, T, cfg, mesh, block=16, delta_eta=delta_eta))

    scale = np.abs(single).max()
    np.testing.assert_allclose(out, single, rtol=2e-5, atol=1e-7 * scale)
