"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import sys
from pathlib import Path

import numpy as np
import jax
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.cells import prepare_cells
from is3d2_tpu.core.spectra import (SpeciesArrays, MomentumGridDevice,
                                    compute_spectra, df12_cell_coefficients)
from is3d2_tpu.parallel.sharding import make_mesh, sharded_spectra

PIKP = (111, 321, 2212)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_spectra_matches_single(reference_dir, mesh_shape):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(100, seed=13, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=32)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP + (2112, -2212, -2112))  # 6 species

    single = compute_spectra(surf, species_t, chosen, grids, df_data, cfg)

    cells = prepare_cells(surf, cfg, block=32)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    mesh = make_mesh(mesh_shape[0], mesh_shape[1])
    out = np.asarray(sharded_spectra(cells, coeffs, species, grid, cfg, mesh,
                                     block=16))

    S = len(chosen)
    np.testing.assert_allclose(out[:S], single, rtol=1e-12, atol=1e-300)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_dN_dX_matches_single(reference_dir, mesh_shape):
    """Operation-0 spacetime scatter, cells sharded over the whole mesh."""
    from is3d2_tpu.core.spacetime import compute_dN_dX
    from is3d2_tpu.parallel.sharding import sharded_dN_dX

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(100, seed=13, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=0, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=32)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)

    single = compute_dN_dX(surf, species_t, chosen, grids, df_data, cfg)

    cells = prepare_cells(surf, cfg, block=32)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    mesh = make_mesh(mesh_shape[0], mesh_shape[1])
    acc = sharded_dN_dX(cells, coeffs, species, grid, cfg, mesh, block=16)

    np.testing.assert_allclose(np.asarray(acc[0]), single.dN_taudtaudy,
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(acc[1]), single.dN_twopirdrdy,
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(acc[2]), single.dN_dphidy,
                               rtol=1e-12, atol=1e-300)


def test_sharded_sampler_histograms(reference_dir):
    """Event-sharded sampler: full psum'd histogram set is finite, nonzero,
    and consistent with the psum'd counts path."""
    import jax.numpy as jnp
    from is3d2_tpu.core.sampler import prepare_sampler
    from is3d2_tpu.physics.deltaf import compute_particle_densities
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.parallel.sampler_shard import (sharded_sampler_counts,
                                                  sharded_sampler_histograms)
    from jax.sharding import Mesh

    species_t = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(64, seed=2, shear_scale=0.02, bulk_scale=0.01)
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, y_cut=5.0, cell_block=64)
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species_t, df_data, laguerre,
                               surf.thermo_averages())
    chosen = species_t.chosen_indices(PIKP)

    setup, sp = prepare_sampler(surf, species_t, chosen, df_data, cfg,
                                laguerre, block=64)
    mcid = jnp.asarray(species_t.mc_id[np.asarray(chosen)])
    key = jax.random.PRNGKey(3)
    mesh = Mesh(np.array(jax.devices()), axis_names=("events",))

    counts, _ = sharded_sampler_counts(setup, sp, mcid, key, cfg,
                                       capacity_per_device=8192,
                                       events_per_device=16, mesh=mesh)
    hists = sharded_sampler_histograms(setup, sp, mcid, key, cfg,
                                       capacity_per_device=8192,
                                       events_per_device=16, mesh=mesh)
    for k, v in hists.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # dN/dy bin totals = kept counts per species (same streams, same keeps)
    np.testing.assert_allclose(np.asarray(hists["dN_dy"]).sum(axis=1),
                               np.asarray(counts), rtol=1e-12)
