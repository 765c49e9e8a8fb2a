"""Golden tests: spacetime distributions (operation 0) vs the reference binary."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, write_mode1
from oracle.run_oracle import setup_sandbox, run_oracle
from test_spectra_golden import PIKP

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.spacetime import compute_dN_dX


def _read_oracle_dX(sandbox: Path, mcid: int, name: str):
    rows = np.loadtxt(sandbox / f"results/continuous/{name}_{mcid}.dat")
    return rows[:, 1]


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4])
def test_dN_dX_vs_oracle(reference_dir, tmp_path, df_mode):
    """NOTE: the reference's dN_dX has a memset-in-bytes bug
    (SpacetimeDistribution.cpp:166-168: memset(..., CORES * taubins) zeroes
    CORES*taubins BYTES, i.e. only 1/8 of the per-core slab), so every species
    after the first inherits most of the previous species' bins.  We therefore
    run the oracle once per species so each is "first" and uncontaminated;
    our implementation computes all species correctly in one pass.
    """
    surf = make_surface(60, seed=31, shear_scale=0.04, bulk_scale=0.02)
    surf_file = tmp_path / "surface_gen.dat"
    write_mode1(surf, surf_file)

    params = {"operation": 0, "df_mode": df_mode, "hrg_eos": 3,
              "include_shear_deltaf": 1, "include_bulk_deltaf": 1}
    sandboxes = {}
    for mcid in PIKP:
        sb = tmp_path / f"sb_dX_df{df_mode}_{mcid}"
        setup_sandbox(sb, params, surf_file, chosen_mcids=(mcid,))
        run_oracle(sb)
        sandboxes[mcid] = sb

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(operation=0, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=32)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        from is3d2_tpu.io.surface import ThermoAverages
        plasma = ThermoAverages.read(
            sandboxes[PIKP[0]]
            / "tables/thermodynamic/average_thermodynamic_quantities.dat")
        df_data.compute_jonah_coefficients(species, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    dX = compute_dN_dX(surf, species, chosen, grids, df_data, cfg, laguerre)
    tau_n, r_n, phi_n = dX.normalized(cfg)

    for i, mcid in enumerate(PIKP):
        for ours, name in ((tau_n[i], "dN_taudtaudy"),
                           (r_n[i], "dN_2pirdrdy"),
                           (phi_n[i], "dN_dphidy")):
            ref = _read_oracle_dX(sandboxes[mcid], mcid, name)
            scale = np.abs(ref).max()
            sig = np.abs(ref) > 1e-10 * scale
            err = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12 * scale)
            assert err[sig].max() < 1e-6, \
                f"{name}_{mcid}: max rel err {err[sig].max():.3e}"
