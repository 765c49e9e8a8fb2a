"""Golden test: spin polarization (surface mode 5) vs the reference binary.

Layout note: the reference fills its polarization accumulators with flat
index ipart + npart*(ipT + NpT*(iphip + Nphi*iy)) (Polarization.cpp:204,228)
but writes them with index iy + Ny*(iphip + Nphi*(ipT + NpT*ipart))
(EmissionFunction.cpp:591) — the written files are a permutation of the
computed grid whenever npart > 1.  The comparison below applies the same
permutation to our (correctly laid out) result.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, write_mode1
from oracle.run_oracle import setup_sandbox, run_oracle
from test_spectra_golden import PIKP

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import MomentumGrids
from is3d2_tpu.io.surface import ThermoAverages
from is3d2_tpu.core.polarization import compute_polarization


def test_polarization_vs_oracle(reference_dir, tmp_path):
    surf = make_surface(50, seed=41, vorticity=True)
    surf_file = tmp_path / "surface_gen.dat"
    write_mode1(surf, surf_file, vorticity=True)

    sandbox = tmp_path / "sb_polzn"
    params = {"operation": 1, "mode": 5, "df_mode": 1, "hrg_eos": 3,
              "include_shear_deltaf": 1, "include_bulk_deltaf": 1}
    setup_sandbox(sandbox, params, surf_file, chosen_mcids=PIKP)
    run_oracle(sandbox)

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    plasma = ThermoAverages.read(
        sandbox / "tables/thermodynamic/average_thermodynamic_quantities.dat")
    cfg = Config(operation=1, mode=5, df_mode=1, hrg_eos=3, cell_block=32)
    chosen = species.chosen_indices(PIKP)

    St, Sx, Sy, Sn, Snorm = compute_polarization(surf, species, chosen, grids,
                                                 plasma, cfg)

    npart, NpT, Nphi, Ny = St.shape

    def calc_flat(a):
        """Flatten in the reference's calculator layout."""
        out = np.zeros(a.size)
        for ip in range(npart):
            for ipT in range(NpT):
                for iphi in range(Nphi):
                    for iy in range(Ny):
                        out[ip + npart * (ipT + NpT * (iphi + Nphi * iy))] = \
                            a[ip, ipT, iphi, iy]
        return out

    for name, ours in (("St", St), ("Sx", Sx), ("Sy", Sy), ("Sn", Sn)):
        rows = np.loadtxt(sandbox / f"results/{name}.dat")
        ref_vals = rows[:, 3]
        ours_ratio = calc_flat(ours) / calc_flat(Snorm)
        # file rows enumerate (ipart, iy, iphip, ipT) nested -> writer index
        # happens to equal the row number
        scale = np.abs(ref_vals).max()
        sig = np.abs(ref_vals) > 1e-8 * scale
        err = np.abs(ours_ratio - ref_vals) / np.maximum(np.abs(ref_vals),
                                                         1e-12 * scale)
        assert err[sig].max() < 1e-6, f"{name}: max rel err {err[sig].max():.3e}"
