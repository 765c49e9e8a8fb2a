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
