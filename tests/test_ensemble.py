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


def test_ensemble_feqmod_matches_individual(reference_dir):
    """df 3 (PTM feqmod) ensemble: vmapped kernel over stacked per-surface
    feqmod prep matches each single-surface run."""
    from is3d2_tpu.io.tables import GaussLaguerre

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(df_mode=3, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=32)
    df_data = DeltafData(tables, 3, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_surface(24 + 8 * i, seed=200 + i, bulk_scale=0.02)
             for i in range(3)]
    batch = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                     cfg, laguerre)
    for i, s in enumerate(surfs):
        single = compute_spectra(s, species, chosen, grids, df_data, cfg,
                                 laguerre)
        np.testing.assert_allclose(batch[i], single, rtol=1e-12, atol=1e-300)


def test_ensemble_famod_matches_individual(reference_dir):
    """df 5 (PTMA famod) ensemble: stacked per-surface VAH state (the
    reference can only loop whole df-5 binaries, scripts/oversample.sh:1-15)
    matches each single-surface run."""
    from surfgen import make_eos_consistent
    from is3d2_tpu.io.tables import GaussLaguerre

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(df_mode=5, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=32)
    df_data = DeltafData(tables, 5, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_eos_consistent(
        make_surface(24 + 8 * i, seed=500 + i, shear_scale=0.02,
                     bulk_scale=0.01), species, laguerre)
        for i in range(3)]
    batch = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                     cfg, laguerre)
    for i, s in enumerate(surfs):
        single = compute_spectra(s, species, chosen, grids, df_data, cfg,
                                 laguerre)
        np.testing.assert_allclose(batch[i], single, rtol=1e-12, atol=1e-300)


def test_ensemble_famod_sampler(reference_dir):
    """famod (df 5) sampler inside the ensemble campaign."""
    from surfgen import make_eos_consistent
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.ensemble import sample_ensemble_histograms

    species = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(operation=2, df_mode=5, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, y_cut=5.0, cell_block=16)
    df_data = DeltafData(tables, 5, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_eos_consistent(
        make_surface(16, seed=600 + i, shear_scale=0.02), species, laguerre)
        for i in range(4)]
    hists, overflow = sample_ensemble_histograms(
        surfs, species, chosen, df_data, cfg, laguerre,
        events_per_surface=40, capacity=16384, seed=11)
    assert not overflow.any()
    assert hists["dN_dy"].shape[0] == 4
    totals = np.asarray(hists["dN_dy"]).sum(axis=(1, 2))
    assert (totals > 0).all()


def test_ensemble_overflow_healed(reference_dir):
    """A forced-tiny capacity overflows every surface; the ensemble heals
    them by single-surface re-runs (no caller intervention) and the healed
    yields match an amply-sized run's Poisson totals statistically."""
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.ensemble import sample_ensemble_histograms

    species = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, y_cut=5.0, cell_block=16)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_surface(16, seed=700 + i, shear_scale=0.02)
             for i in range(3)]
    kw = dict(events_per_surface=50, seed=13)
    hists, overflow = sample_ensemble_histograms(
        surfs, species, chosen, df_data, cfg, laguerre, capacity=512, **kw)
    assert not overflow.any()
    big, overflow_big = sample_ensemble_histograms(
        surfs, species, chosen, df_data, cfg, laguerre, capacity=65536, **kw)
    assert not overflow_big.any()
    # identical RNG keys -> identical Poisson totals; the rejection draws
    # are lane-indexed so kinematics (and kept counts) agree statistically
    n_heal = np.asarray(hists["dN_dy"]).sum(axis=(1, 2))
    n_big = np.asarray(big["dN_dy"]).sum(axis=(1, 2))
    assert (n_heal > 0).all()
    np.testing.assert_allclose(n_heal, n_big, rtol=0.2)


def test_ensemble_sharded_over_surfaces(reference_dir):
    """Stretch config 5: the surface axis sharded over the 8-device mesh."""
    import jax
    from jax.sharding import Mesh

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=16)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_surface(16, seed=300 + i) for i in range(8)]
    mesh = Mesh(np.array(jax.devices()), axis_names=("surfaces",))
    sharded = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                       cfg, mesh=mesh)
    plain = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                     cfg)
    np.testing.assert_allclose(sharded, plain, rtol=1e-12, atol=1e-300)


def test_ensemble_sampler_histograms(reference_dir):
    """The whole oversampling campaign as one program: per-surface RNG
    streams, per-surface histograms, surface axis optionally sharded."""
    import jax
    from jax.sharding import Mesh
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.ensemble import sample_ensemble_histograms

    species = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, y_cut=5.0, cell_block=16)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_surface(16, seed=400 + i, shear_scale=0.02) for i in range(8)]
    hists, overflow = sample_ensemble_histograms(
        surfs, species, chosen, df_data, cfg, laguerre,
        events_per_surface=50, capacity=16384, seed=9)
    assert not overflow.any()
    assert hists["dN_dy"].shape[0] == 8
    totals = np.asarray(hists["dN_dy"]).sum(axis=(1, 2))
    assert (totals > 0).all()

    mesh = Mesh(np.array(jax.devices()), axis_names=("surfaces",))
    hists_s, overflow_s = sample_ensemble_histograms(
        surfs, species, chosen, df_data, cfg, laguerre,
        events_per_surface=50, capacity=16384, seed=9, mesh=mesh)
    assert not overflow_s.any()
    # same per-surface streams -> identical histograms sharded or not
    np.testing.assert_allclose(np.asarray(hists_s["dN_dy"]),
                               np.asarray(hists["dN_dy"]), rtol=1e-12)

def test_ensemble_chunked_matches_unchunked(reference_dir):
    """surface_chunk bounds device memory (VERDICT r3 item 5: the stretch
    config is 1000 surfaces; stacking all of them is O(250 GB) HBM).
    Chunked spectra match the one-shot stack exactly (padding to the global
    cell count appends masked zero cells only), including a ragged last
    chunk, and chunked sampling is bitwise-identical because each surface's
    RNG stream is fold_in'd with its GLOBAL index."""
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.ensemble import sample_ensemble_histograms

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=16)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    # ragged sizes + ragged final chunk (5 surfaces, chunks of 2)
    surfs = [make_surface(16 + 8 * (i % 3), seed=800 + i) for i in range(5)]
    plain = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                     cfg)
    chunked = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                       cfg, surface_chunk=2)
    np.testing.assert_array_equal(chunked, plain)

    cfg2 = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                  include_bulk_deltaf=1, fast=1, y_cut=5.0, cell_block=16)
    kw = dict(events_per_surface=40, capacity=16384, seed=21)
    h_plain, ov_plain = sample_ensemble_histograms(
        surfs, species, chosen, df_data, cfg2, laguerre, **kw)
    h_chunk, ov_chunk = sample_ensemble_histograms(
        surfs, species, chosen, df_data, cfg2, laguerre, surface_chunk=2,
        **kw)
    assert not ov_plain.any() and not ov_chunk.any()
    for k in h_plain:
        np.testing.assert_array_equal(np.asarray(h_chunk[k]),
                                      np.asarray(h_plain[k]))


def test_ensemble_chunked_sharded(reference_dir):
    """Chunked + meshed: each chunk's surface axis shards over the devices;
    chunk size must be a multiple of the device count."""
    import jax
    import pytest
    from jax.sharding import Mesh

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=16)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_surface(16, seed=900 + i) for i in range(12)]
    mesh = Mesh(np.array(jax.devices()), axis_names=("surfaces",))
    plain = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                     cfg)
    chunked = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                       cfg, mesh=mesh, surface_chunk=8)
    np.testing.assert_allclose(chunked, plain, rtol=1e-12, atol=1e-300)

    with pytest.raises(ValueError, match="multiple of the mesh"):
        compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                 cfg, mesh=mesh, surface_chunk=6)


def test_ensemble_particle_list_export(reference_dir, tmp_path):
    """Per-surface particle-list (event-file) output for ensembles: the
    reference's multi-surface campaign writes OSCAR lists per looped binary
    (scripts/oversample.sh:7-13, EmissionFunction.cpp:1279-1291).  Checks
    exact per-surface file/row counts, statistical agreement with the
    single-surface sample_particles path, and chunking invariance."""
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core.ensemble import sample_ensemble_particle_lists
    from is3d2_tpu.core.sampler import sample_particles

    species = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, y_cut=5.0, cell_block=16)
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    n_ev = 50
    surfs = [make_surface(16, seed=800 + i, shear_scale=0.02)
             for i in range(3)]
    root = tmp_path / "ens"
    stats = sample_ensemble_particle_lists(
        surfs, species, chosen, df_data, cfg, laguerre,
        events_per_surface=n_ev, capacity=65536, results_root=root, seed=17)
    assert len(stats) == 3

    def read_rows(d):
        files = sorted(Path(d).glob("particle_list_osc_*.dat"))
        rows = 0
        for f in files:
            lines = f.read_text().splitlines()
            assert lines[0].lstrip().startswith("n pid")  # OSCAR header
            rows += len(lines) - 1
        return len(files), rows

    for i, st in enumerate(stats):
        n_files, rows = read_rows(st["dir"])
        assert n_files == n_ev, f"surface {i}: {n_files} event files"
        assert rows == st["kept"] == st["rows_written"], \
            f"surface {i}: file rows {rows} vs kept {st['kept']}"
        assert st["events_written"] == n_ev

    # statistical match vs the single-surface production path (independent
    # RNG streams; kept counts are Poisson-binomial with ~1e3 hadrons)
    out = sample_particles(surfs[0], species, chosen, df_data, cfg,
                           laguerre, n_events=n_ev, seed=23, capacity=65536)
    kept_single = int(out["kept"])
    assert kept_single > 100
    np.testing.assert_allclose(stats[0]["kept"], kept_single, rtol=0.3)

    # chunking invariance: per-surface RNG streams key on the GLOBAL index,
    # so a surface_chunk=2 run reproduces the unchunked kept counts exactly
    root2 = tmp_path / "ens_chunked"
    stats2 = sample_ensemble_particle_lists(
        surfs, species, chosen, df_data, cfg, laguerre,
        events_per_surface=n_ev, capacity=65536, results_root=root2,
        seed=17, surface_chunk=2)
    assert [s["kept"] for s in stats2] == [s["kept"] for s in stats]


def test_ensemble_f32_fast_kernel_matches(reference_dir):
    """f32 df-1/2 ensembles route through the MXU-structured fast kernel
    (the broadcast kernel's fused chain OOMs under vmap at full-HRG chunk
    scale); results must agree with the single-surface f64 engine at the
    f32 class."""
    import dataclasses

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    cfg = Config(df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=32, compute_dtype="f32")
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    surfs = [make_surface(24 + 8 * i, seed=100 + i) for i in range(3)]
    batch = compute_spectra_ensemble(surfs, species, chosen, grids, df_data,
                                     cfg)
    cfg64 = dataclasses.replace(cfg, compute_dtype="f64")
    for i, s in enumerate(surfs):
        single = np.asarray(compute_spectra(s, species, chosen, grids,
                                            df_data, cfg64))
        scale = np.abs(single).max()
        sig = np.abs(single) > 1e-8 * scale
        err = (np.abs(batch[i] - single)
               / np.maximum(np.abs(single), 1e-300))[sig].max()
        assert err < 2e-5, f"surface {i}: f32 ensemble vs f64 {err:.2e}"
