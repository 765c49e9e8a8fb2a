"""famod (df 5) sampler closure vs famod smooth spectra."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, make_eos_consistent

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids, load_table
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData, compute_particle_densities
from is3d2_tpu.core.spectra import compute_spectra
from is3d2_tpu.core.sampler import sample_particles
from is3d2_tpu.core.sampler_hist import bin_sampled_particles

PIKP = (111, 321, 2212)


def test_sampler_famod_closure(reference_dir):
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi = phi48[:, 0]
    grids.phi_weight = phi48[:, 1]
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")

    surf = make_surface(40, seed=9, shear_scale=0.03, bulk_scale=0.01)
    surf = make_eos_consistent(surf, species, laguerre)
    plasma = surf.thermo_averages()

    cfg = Config(operation=2, df_mode=5, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, outflow=1, fast=1, cell_block=64)
    df_data = DeltafData(tables, 5, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    smooth = compute_spectra(surf, species, chosen, grids, df_data, cfg, laguerre)
    w = (grids.pT_weight * grids.pT)[None, :, None, None] \
        * grids.phi_weight[None, None, :, None]
    dN_dy_smooth = (w * smooth).sum(axis=(1, 2, 3))

    n_events = 20000
    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=21)
    hist = bin_sampled_particles(out, len(PIKP), cfg, n_events)
    counts = hist.dN_dy.sum(axis=1)
    dN_dy_sampled = counts / (2.0 * cfg.y_cut * n_events)
    sigma = np.sqrt(np.maximum(counts, 1.0)) / (2.0 * cfg.y_cut * n_events)

    for i, mcid in enumerate(PIKP):
        assert counts[i] > 2000
        diff = abs(dN_dy_sampled[i] - dN_dy_smooth[i])
        assert diff < 5.0 * sigma[i] + 0.02 * dN_dy_smooth[i], (
            f"{mcid}: sampled {dN_dy_sampled[i]:.5f} vs smooth {dN_dy_smooth[i]:.5f}")
