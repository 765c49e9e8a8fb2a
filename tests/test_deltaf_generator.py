"""The delta-f table generator reproduces the shipped coefficient tables."""

import numpy as np

from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.tools.generate_deltaf_tables import compute_tables, write_tables


def test_regenerated_tables_match_shipped(reference_dir, tmp_path):
    species = read_pdg(2, reference_dir / "PDG")  # smash
    # coarse subgrid that lands exactly on shipped grid points
    tabs = compute_tables(species, n_T=11, n_muB=5)
    ship = DeltafTables.load(2, include_baryon=True,
                             base_dir=reference_dir / "deltaf_coefficients/vh")
    iT = np.arange(0, 101, 10)
    iB = np.arange(0, 81, 20)
    for name in ("c0", "c1", "c2", "c3", "c4", "F", "G",
                 "betabulk", "betaV", "betapi"):
        ref = getattr(ship, name)[np.ix_(iB, iT)]
        # shipped files carry 6 decimals -> half-ulp tolerance 5e-7
        assert np.abs(tabs[name] - ref).max() < 6e-7, name


def test_roundtrip_through_reader(reference_dir, tmp_path):
    species = read_pdg(3, reference_dir / "PDG")
    tabs = compute_tables(species, n_T=7, n_muB=3)
    write_tables(tabs, tmp_path)
    loaded = DeltafTables.from_dir(tmp_path, include_baryon=True)
    assert loaded.points_T == 7 and loaded.points_muB == 3
    np.testing.assert_allclose(loaded.betapi, tabs["betapi"], atol=1e-6)
