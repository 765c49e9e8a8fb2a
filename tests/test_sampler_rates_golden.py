"""Golden test: exact-mode sampler rates vs the reference's
max_particle_number (ParticleSampler.cpp:164-239), value by value per
(cell, species) via the probe_rates harness (tests/oracle/probe_rates.cpp)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.sampler import prepare_sampler

HERE = Path(__file__).parent
PROBE = HERE / "oracle" / "build" / "probe_rates"
PIKP = (111, 321, 2212)


def _ensure_probe():
    if not PROBE.exists():
        subprocess.run(["bash", str(HERE / "oracle" / "build_oracle.sh")],
                       check=True, capture_output=True)
    return PROBE


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4])
def test_exact_rates_match_reference(df_mode, reference_dir):
    _ensure_probe()
    species_table = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    surf = make_surface(40, seed=11, shear_scale=0.03, bulk_scale=0.02)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(species_table, laguerre,
                                           surf.thermo_averages())

    cfg = Config(operation=2, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1, fast=0,
                 cell_block=8, compute_dtype="f64")
    chosen = species_table.chosen_indices(PIKP)
    setup, species = prepare_sampler(surf, species_table, chosen, df_data,
                                     cfg, laguerre)

    c = setup.cells
    mask = np.asarray(c.mask) > 0
    T = np.asarray(c.T)
    alphaB = np.asarray(c.alphaB)
    bulkPi = np.asarray(setup.df_cols["bulkPi"])
    F = np.asarray(setup.df_cols["F"])
    G = np.asarray(setup.df_cols["G"])
    betabulk = np.asarray(setup.df_cols["betabulk"])
    breaks = np.asarray(setup.breaks_down)
    z = np.asarray(setup.fq.z) if setup.fq is not None else np.zeros_like(T)

    mass = np.asarray(species.mass)
    sign = np.asarray(species.sign)
    deg = np.asarray(species.degeneracy)
    baryon = np.asarray(species.baryon)

    lines = []
    pairs = []
    for ic in np.nonzero(mask)[0]:
        for s in range(len(mass)):
            lines.append(
                f"{mass[s] / T[ic]:.17g} {deg[s]:.17g} {sign[s]:.17g} "
                f"{baryon[s]:.17g} {T[ic]:.17g} {alphaB[ic]:.17g} "
                f"{bulkPi[ic]:.17g} {F[ic]:.17g} {G[ic]:.17g} "
                f"{betabulk[ic]:.17g} {z[ic]:.17g} {int(breaks[ic])} "
                f"{df_mode} 0")
            pairs.append((ic, s))

    proc = subprocess.run(
        [str(PROBE), str(reference_dir / "tables/gauss/gla_roots_weights.txt")],
        input="\n".join(lines) + "\n", capture_output=True, text=True,
        check=True)
    golden = np.array([float(t) for t in proc.stdout.split()])
    assert golden.shape[0] == len(pairs)

    ours = np.asarray(setup.rates)   # clamped at 0, masked
    golden = np.maximum(golden, 0.0)
    mine = np.array([ours[ic, s] for ic, s in pairs])
    np.testing.assert_allclose(mine, golden, rtol=1e-6, atol=1e-300)
