"""Fast (MXU-structured) spectra path vs the validated broadcast path."""

import sys
from pathlib import Path

import numpy as np
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
                                    compute_spectra, df12_cell_coefficients)
from is3d2_tpu.core.spectra_fast import compute_spectra_fast

PIKP = (111, 321, 2212, 2112, -2212, -2112)


@pytest.mark.parametrize("df_mode,outflow", [(1, 0), (2, 0), (1, 1), (2, 1)])
def test_fast_path_matches_reference_path(reference_dir, df_mode, outflow):
    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(96, seed=19, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 outflow=outflow, cell_block=32)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP)

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg)

    cells = prepare_cells(surf, cfg, block=32)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    # f64 compute: must agree to near machine precision
    fast64 = np.asarray(compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                             n_blocks=3,
                                             compute_dtype=jnp.float64))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    err64 = (np.abs(fast64 - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err64 < 1e-12, f"f64 fast path err {err64:.2e}"

    # f32 compute + f64 accumulate: the TPU speed path
    fast32 = np.asarray(compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                             n_blocks=3,
                                             compute_dtype=jnp.float32))
    err32 = (np.abs(fast32 - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err32 < 5e-5, f"f32 fast path err {err32:.2e}"


def test_fast_path_3plus1d(reference_dir):
    """3+1d fast path (light-cone basis, no eta loop) vs broadcast kernel."""
    import jax.numpy as jnp
    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(48, seed=3, dimension=3)
    cfg = Config(operation=1, df_mode=2, hrg_eos=3, dimension=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=16)
    df_data = DeltafData(tables, 2, include_baryon=False)
    chosen = species_t.chosen_indices(PIKP[:4])

    ref = compute_spectra(surf, species_t, chosen, grids, df_data, cfg)
    cells = prepare_cells(surf, cfg, block=16)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    fast64 = np.asarray(compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                             n_blocks=3,
                                             compute_dtype=jnp.float64,
                                             n_species_blocks=2))
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    err64 = (np.abs(fast64 - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err64 < 1e-11, f"3+1d f64 fast err {err64:.2e}"

    fast32 = np.asarray(compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                             n_blocks=3,
                                             compute_dtype=jnp.float32,
                                             n_species_blocks=2))
    err32 = (np.abs(fast32 - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()
    assert err32 < 5e-4, f"3+1d f32 fast err {err32:.2e}"
