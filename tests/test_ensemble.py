"""Ensemble (multi-surface) spectra match per-surface results."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.spectra import compute_spectra
from is3d2_tpu.core.ensemble import compute_spectra_ensemble

PIKP = (111, 321, 2212)


def test_ensemble_matches_individual(reference_dir):
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(df_mode=2, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=32)
    df_data = DeltafData(tables, 2, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_surface(24 + 8 * i, seed=100 + i) for i in range(4)]
    batch = compute_spectra_ensemble(surfs, species, chosen, grids, df_data, cfg)
    assert batch.shape[0] == 4

    for i, s in enumerate(surfs):
        single = compute_spectra(s, species, chosen, grids, df_data, cfg)
        np.testing.assert_allclose(batch[i], single, rtol=1e-12, atol=1e-300)
