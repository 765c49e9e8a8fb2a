"""compute_dtype='f32' dispatcher paths vs the f64 reference paths."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, make_eos_consistent

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.io.surface import ThermoAverages
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.spectra import compute_spectra

PIKP = (111, 321, 2212)


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4, 5])
def test_f32_matches_f64(reference_dir, df_mode):
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(48, seed=77, shear_scale=0.03, bulk_scale=0.01)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species, laguerre)
    plasma = ThermoAverages(0.155, 0.25, 0.08, 0.0, 0.0)

    cfg64 = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                   include_shear_deltaf=1, include_bulk_deltaf=1,
                   cell_block=64, compute_dtype="f64")
    cfg32 = dataclasses.replace(cfg64, compute_dtype="f32")
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(species, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    a = compute_spectra(surf, species, chosen, grids, df_data, cfg64, laguerre)
    b = compute_spectra(surf, species, chosen, grids, df_data, cfg32, laguerre)

    scale = np.abs(a).max()
    sig = np.abs(a) > 1e-8 * scale
    err = (np.abs(b - a) / np.maximum(np.abs(a), 1e-300))[sig].max()
    # f32 compute: exp amplifies rounding of u.p/T (~30 * eps_f32);
    # feqmod/famod accumulate fully in f32
    assert err < 3e-4, f"df{df_mode}: f32 vs f64 max rel err {err:.2e}"
