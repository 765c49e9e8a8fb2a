"""Observability parity: the diagnostics the reference always prints
(MomentumSpectra.cpp:1039-1040, 1674-1678; ParticleSampler.cpp:1133;
LocalRestFrame.cpp:43-71) plus the sampler capacity auto-retry."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.physics.deltaf import DeltafData, compute_particle_densities
from is3d2_tpu.core.spectra import compute_spectra
from is3d2_tpu.core.sampler import sample_particles
from is3d2_tpu.report import RunReport, check_invariants

PIKP = (111, 321, 2212)


@pytest.fixture(scope="module")
def env(reference_dir):
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(60, seed=3, shear_scale=0.03, bulk_scale=0.01)
    plasma = surf.thermo_averages()
    return species, grids, laguerre, tables, surf, plasma


def test_invariant_checks_clean_surface(env):
    _, _, _, _, surf, _ = env
    inv = check_invariants(surf)
    for name, (val, tol) in inv.items():
        assert val <= tol, f"{name}: {val} > {tol}"


def test_invariant_violation_is_reported():
    rep = RunReport(n_cells=10)
    rep.invariants = {"pi.u orthogonality": (1.0e-3, 1.0e-15)}
    lines = rep.lines()
    assert any("pi.u orthogonality violated" in l for l in lines)


def test_breakdown_counters_feqmod(env):
    species, grids, laguerre, tables, surf, plasma = env
    # a huge bulk pressure drives detA below detA_min on most cells
    import copy
    surf_bad = copy.deepcopy(surf)
    surf_bad.bulkPi = surf_bad.bulkPi - 0.6 * surf_bad.P

    cfg = Config(operation=1, df_mode=3, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=64)
    df_data = DeltafData(tables, 3, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    rep = RunReport()
    compute_spectra(surf_bad, species, chosen, grids, df_data, cfg, laguerre,
                    report=rep)
    assert rep.n_cells == surf.n_cells
    assert rep.breakdown_cells is not None and rep.breakdown_cells > 0
    assert rep.tau_breakdown > 0.0
    assert any("feqmod breaks down" in l for l in rep.lines())


def test_sampler_efficiency_counters(env):
    species, grids, laguerre, tables, surf, plasma = env
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, sampler_seed=5, y_cut=5.0,
                 cell_block=64)
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    rep = RunReport()
    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=200, seed=5, report=rep)
    assert rep.hadrons_drawn > 0
    assert 0 < rep.hadrons_kept <= rep.hadrons_drawn
    assert rep.mom_proposals >= rep.hadrons_drawn
    # every valid lane should accept within the rejection budget here
    assert rep.mom_acceptances >= rep.hadrons_drawn - rep.dropped_lanes
    eff = rep.mom_acceptances / rep.mom_proposals
    assert 0.05 < eff <= 1.0
    assert rep.dropped_lanes == 0
    assert any("Momentum sampling efficiency" in l for l in rep.lines())


def test_sampler_capacity_auto_retry(env):
    """A forced-too-small capacity must grow and complete, and the result
    must equal a right-sized run with the same seed (same Poisson draw)."""
    species, grids, laguerre, tables, surf, plasma = env
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, sampler_seed=5, y_cut=5.0,
                 cell_block=64)
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    rep = RunReport()
    out_small = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                                 n_events=100, seed=5, capacity=64, report=rep)
    assert rep.sampler_capacity_retries >= 1
    out_ref = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                               n_events=100, seed=5)
    # the Poisson counts depend only on (key, rates), NOT on the capacity,
    # so the drawn total after the retry is exactly the right-sized run's
    assert int(out_small["total"]) == int(out_ref["total"])
    assert int(out_small["drawn"]) == int(out_ref["drawn"])
    # per-hadron rejection draws DO depend on the buffer shape (threefry is
    # counter-based over the flat lane axis), so kept agrees statistically
    k1, k2 = int(out_small["kept"]), int(out_ref["kept"])
    assert abs(k1 - k2) < 6.0 * np.sqrt(max(k1, k2))
    assert np.asarray(out_small["keep"]).sum() == k1


def test_group_particles_dedup(env):
    """group_particles shares one spectra evaluation per (mass, sign)
    group; grouped output must match ungrouped within the mass-tolerance
    error envelope (exact for truly degenerate species)."""
    import dataclasses
    species, grids, laguerre, tables, surf, plasma = env
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)

    # full smash-box HRG: plenty of mass-degenerate multiplets
    chosen = species.chosen_indices(species.mc_id, group_by_mass=True)
    cfg = Config(operation=1, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=64, pT_bins=10,
                 group_particles=0)
    ungrouped = compute_spectra(surf, species, chosen, grids, df_data, cfg,
                                laguerre)

    rep_pos, group_of = species.group_species(chosen, 0.01, key_baryon=False)
    assert len(rep_pos) < 0.75 * len(chosen)   # a real dedup on smash-box

    cfg_g = dataclasses.replace(cfg, group_particles=1,
                                particle_diff_tolerance=1e-6)
    grouped_exact = compute_spectra(surf, species, chosen, grids, df_data,
                                    cfg_g, laguerre)
    # 1e-6 GeV tolerance: only exact multiplets merge -> equality
    np.testing.assert_allclose(grouped_exact, ungrouped, rtol=1e-10)

    cfg_g2 = dataclasses.replace(cfg, group_particles=1,
                                 particle_diff_tolerance=0.01)
    grouped = compute_spectra(surf, species, chosen, grids, df_data, cfg_g2,
                              laguerre)
    sig = ungrouped > ungrouped.max() * 1e-8
    err = np.abs(grouped - ungrouped)[sig] / ungrouped[sig]
    # the feq tail amplifies a dm=0.01 GeV merge by ~exp(dm p/(m T)) at
    # pT=3; stay within the coarse physics envelope
    assert err.max() < 0.5, err.max()
    assert np.median(err) < 0.05
