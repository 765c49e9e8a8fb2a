"""Sampler validation: sampled-vs-smooth closure (the reference's de-facto
integration test, scripts/compare_sampling_smooth.py) plus determinism.

The sampler implements outflow via the flux weight max(0, p.dsigma)/(E ds_max)
and |df| <= 1 regulation via w_visc, so the matching smooth calculation uses
outflow = 1 and regulate_deltaf = 1.
"""

import dataclasses
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
from is3d2_tpu.io.surface import ThermoAverages
from is3d2_tpu.physics.deltaf import DeltafData, compute_particle_densities
from is3d2_tpu.core.spectra import compute_spectra
from is3d2_tpu.core.sampler import (sample_particles, compute_total_yield,
                                    to_particle_list)
from is3d2_tpu.core.sampler_hist import bin_sampled_particles

PIKP = (111, 321, 2212)


@pytest.fixture(scope="module")
def env(reference_dir):
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    # the default phi table has a single point (fine for writing files, useless
    # for closure on an azimuthally anisotropic surface) -> use the 48-pt grid
    from is3d2_tpu.io.tables import load_table
    phi48 = load_table(reference_dir / "tables/all_tables/phi/phi_gauss_table_48pt.dat")
    grids.phi = phi48[:, 0]
    grids.phi_weight = phi48[:, 1]
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(60, seed=3, shear_scale=0.03, bulk_scale=0.01)
    plasma = surf.thermo_averages()
    return species, grids, laguerre, tables, surf, plasma


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4])
def test_sampler_closure_vs_smooth(env, df_mode):
    species, grids, laguerre, tables, surf, plasma = env

    cfg = Config(operation=2, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, fast=1, sampler_seed=7,
                 y_cut=5.0, pT_bins=30, cell_block=64)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(species, laguerre, plasma)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    # smooth spectra -> true dN/dy at y=0 per species:
    # dN/dy = int pT dpT dphi dN/(pT dpT dphi dy)
    smooth = compute_spectra(surf, species, chosen, grids, df_data, cfg, laguerre)
    w = (grids.pT_weight * grids.pT)[None, :, None, None] \
        * grids.phi_weight[None, None, :, None]
    dN_dy_smooth = (w * smooth).sum(axis=(1, 2, 3))   # (S,)

    n_events = 30000
    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=7)
    hist = bin_sampled_particles(out, len(PIKP), cfg, n_events)

    # sampled dN/dy: flat in y by construction; average over bins
    counts = hist.dN_dy.sum(axis=1)                    # total kept per species
    dN_dy_sampled = counts / (2.0 * cfg.y_cut * n_events)
    sigma = np.sqrt(np.maximum(counts, 1.0)) / (2.0 * cfg.y_cut * n_events)

    for i, mcid in enumerate(PIKP):
        assert counts[i] > 3000, f"too few sampled hadrons for {mcid}"
        diff = abs(dN_dy_sampled[i] - dN_dy_smooth[i])
        assert diff < 5.0 * sigma[i] + 0.01 * dN_dy_smooth[i], (
            f"{mcid}: sampled {dN_dy_sampled[i]:.5f} vs smooth "
            f"{dN_dy_smooth[i]:.5f} (sigma {sigma[i]:.5f})")

    # pT spectrum shape: sampled dN/2pipTdpTdy vs smooth, pion only
    pT_w = (cfg.pT_max - cfg.pT_min) / cfg.pT_bins
    pT_mid = cfg.pT_min + pT_w * (np.arange(cfg.pT_bins) + 0.5)
    sampled_pT = hist.dN_2pipTdpTdy[0] / (
        2 * np.pi * 2.0 * cfg.y_cut * pT_w * pT_mid * n_events)
    # smooth: (1/2pi) integral dphi dN/pTdpTdphidy, interpolated to midpoints
    smooth_pT_grid = (grids.phi_weight[None, :] * smooth[0, :, :, 0]).sum(axis=1) / (2 * np.pi)
    smooth_pT = np.interp(pT_mid, grids.pT, smooth_pT_grid)

    counts_pT = hist.dN_2pipTdpTdy[0]
    sel = counts_pT > 400
    assert sel.sum() > 5
    rel = np.abs(sampled_pT[sel] - smooth_pT[sel]) / smooth_pT[sel]
    stat = 5.0 / np.sqrt(counts_pT[sel]) + 0.05
    assert (rel < stat).all(), \
        f"pT spectrum mismatch: max rel {rel.max():.3f} vs allowed {stat.min():.3f}"


def test_sampler_closure_azimuthal(env):
    """Azimuthal (dN/dphi) closure vs the smooth spectra: direction-
    SENSITIVE validation of the round-5 tilted-envelope direction draw
    (the polar angle about -dshat now comes from the tilted density
    q(mu) with the keep test divided by w_hi(mu); an error in that chain
    would bias dN/dphi and v_n while leaving dN/dy and the pT shape --
    which test_sampler_closure_vs_smooth checks -- untouched).  Also pins
    the drawn/kept economy the tilt buys (VERDICT r4 #3)."""
    species, grids, laguerre, tables, surf, plasma = env

    cfg = Config(operation=2, df_mode=1, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, fast=1, sampler_seed=7,
                 y_cut=5.0, phip_bins=16, cell_block=64)
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    smooth = np.asarray(compute_spectra(surf, species, chosen, grids,
                                        df_data, cfg, laguerre))
    # smooth dN/dphi dy at the Gauss phi nodes (pion)
    w_pT = (grids.pT_weight * grids.pT)
    smooth_phi = (w_pT[:, None] * smooth[0, :, :, 0]).sum(axis=0)  # (Nphi,)

    n_events = 40000
    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=11)
    drawn, kept = int(out["drawn"]), int(out["kept"])
    assert kept > 20000
    assert drawn / kept < 2.7, \
        f"tilted envelope economy regressed: drawn/kept {drawn/kept:.2f}"

    hist = bin_sampled_particles(out, len(PIKP), cfg, n_events)
    counts = np.asarray(hist.dN_dphipdy[0])                  # (phip_bins,)
    bw = 2.0 * np.pi / cfg.phip_bins
    mids = bw * (np.arange(cfg.phip_bins) + 0.5)
    sampled_phi = counts / (2.0 * cfg.y_cut * bw * n_events)
    ref_phi = np.interp(mids, grids.phi, smooth_phi, period=2 * np.pi)
    sigma = np.sqrt(np.maximum(counts, 1.0)) / (2.0 * cfg.y_cut * bw
                                                * n_events)
    # require real azimuthal structure so the test has teeth
    assert (smooth_phi.max() - smooth_phi.min()) > 0.02 * smooth_phi.mean()
    diff = np.abs(sampled_phi - ref_phi)
    tol = 5.0 * sigma + 0.03 * ref_phi
    assert (diff < tol).all(), (
        f"dN/dphi closure failed: max {(diff / tol).max():.2f}x tolerance "
        f"(sampled {sampled_phi}, smooth {ref_phi})")


def test_sampler_deterministic(env):
    species, grids, laguerre, tables, surf, plasma = env
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, cell_block=64)
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    o1 = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                          n_events=100, seed=11)
    o2 = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                          n_events=100, seed=11)
    p1, p2 = to_particle_list(o1), to_particle_list(o2)
    assert p1.n_valid == p2.n_valid and p1.n_valid > 0
    np.testing.assert_array_equal(p1.px[p1.valid], p2.px[p2.valid])

    o3 = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                          n_events=100, seed=12)
    assert to_particle_list(o3).n_valid != p1.n_valid or \
        not np.array_equal(to_particle_list(o3).px, p1.px)


def test_sampler_event_chunking(env):
    """A chunked campaign (sampler_chunk_hadrons small) covers every event,
    keeps per-chunk buffers bounded, and matches the unchunked yield
    statistically."""
    species, grids, laguerre, tables, surf, plasma = env
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)
    n_events = 400

    base = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                  include_bulk_deltaf=1, fast=1, cell_block=64)
    big = sample_particles(surf, species, chosen, df_data, base, laguerre,
                           n_events=n_events, seed=5)

    # force ~8 chunks
    mean_1ev = float(big["drawn"]) / n_events
    cfg = dataclasses.replace(base,
                              sampler_chunk_hadrons=mean_1ev * n_events / 8)
    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=5)
    # outputs are compacted to the kept rows (padded to 8192) per chunk
    assert out["keep"].shape[0] <= 8 * 8192 + int(out["kept"])
    assert int(out["keep"].sum()) == int(out["kept"])

    ev = np.asarray(out["event"])[np.asarray(out["keep"])]
    assert ev.min() >= 0 and ev.max() == n_events - 1
    # every chunk contributed (events are uniform within each chunk)
    assert len(np.unique(ev)) > 0.9 * n_events

    kept_a, kept_b = int(big["kept"]), int(out["kept"])
    sigma = np.sqrt(kept_a + kept_b)
    assert abs(kept_a - kept_b) < 6.0 * sigma
    assert int(out["drawn"]) == int(out["total"])


def test_sampler_analytic_pad_matches_measured(env, monkeypatch):
    """``mean_kept_1ev`` (the driver's Ntot yield estimate) sizes the
    kept-row compaction pad analytically, so chunk 0 dispatches the fused
    pipelined program instead of the synced unfused probe run -- the kept
    rows must be IDENTICAL to the measured-pad path (same seed -> same
    Poisson counts and rejection draws; only the static pad width
    differs), and a deliberately tiny estimate must self-heal through
    deferred validation to the same rows."""
    import is3d2_tpu.core.sampler as S
    species, grids, laguerre, tables, surf, plasma = env
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)
    n_events = 400

    base = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                  include_bulk_deltaf=1, fast=1, cell_block=64)
    ref = sample_particles(surf, species, chosen, df_data, base, laguerre,
                           n_events=n_events, seed=5)
    kept_1ev = float(ref["kept"]) / n_events
    drawn_1ev = float(ref["drawn"]) / n_events
    cfg = dataclasses.replace(
        base, sampler_chunk_hadrons=drawn_1ev * n_events / 4)

    def rows(out):
        p = to_particle_list(out)
        order = np.lexsort((np.asarray(p.px[p.valid]),
                            np.asarray(p.event[p.valid])))
        return {f: np.asarray(getattr(p, f)[p.valid])[order]
                for f in ("event", "px", "py", "pz", "E")}

    a = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                         n_events=n_events, seed=5)
    b = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                         n_events=n_events, seed=5, mean_kept_1ev=kept_1ev)
    ra, rb = rows(a), rows(b)
    assert len(ra["px"]) == len(rb["px"]) > 0
    for f in ra:
        np.testing.assert_array_equal(ra[f], rb[f])

    # shrink the pad bucket so a 30x-low estimate actually under-pads at
    # test scale (the production floor of 8192 would absorb it), forcing
    # the pad-overrun deferred-validation heal on every chunk
    monkeypatch.setattr(S, "_PAD_BUCKET_SMALL", 128)
    c = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                         n_events=n_events, seed=5,
                         mean_kept_1ev=kept_1ev / 30.0)
    rc = rows(c)
    for f in ra:
        np.testing.assert_array_equal(ra[f], rc[f])


def test_total_yield_matches_sampled(env):
    """calculate_total_yield estimate vs actually kept hadrons."""
    species, grids, laguerre, tables, surf, plasma = env
    cfg = Config(operation=2, df_mode=2, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, cell_block=64)
    df_data = DeltafData(tables, 2, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    Ntot = compute_total_yield(surf, species, chosen, df_data, cfg, laguerre)
    assert Ntot > 0

    n_events = 20000
    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=5)
    kept = float(np.asarray(out["keep"]).sum()) / n_events
    # the estimator is the mean of the kept yield up to the viscous-weight
    # approximation; agree within ~5% + stats
    assert abs(kept - Ntot) < 0.05 * Ntot + 5.0 * np.sqrt(Ntot / n_events)


@pytest.mark.parametrize("df_mode", [2, 3])
def test_exact_mode_rates(env, df_mode):
    """Exact per-cell rate integrals (fast=0, max_particle_number,
    ParticleSampler.cpp:164-239): agree with fast mode on a narrow-T
    surface, in both the host-f64 and device-f32 paths."""
    species, grids, laguerre, tables, surf, plasma = env
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)
    from is3d2_tpu.core.sampler import prepare_sampler

    base = Config(operation=2, df_mode=df_mode, hrg_eos=3,
                  include_shear_deltaf=1, include_bulk_deltaf=1, cell_block=64)
    import dataclasses as dc
    setups = {}
    for tag, kw in (("fast", {"fast": 1}),
                    ("exact64", {"fast": 0, "compute_dtype": "f64"}),
                    ("exact32", {"fast": 0, "compute_dtype": "f32"})):
        cfg = dc.replace(base, **kw)
        setup, sp = prepare_sampler(surf, species, chosen, df_data, cfg,
                                    laguerre)
        setups[tag] = np.asarray(setup.rates, dtype=np.float64)

    # f32 device path == f64 host path to f32 accuracy
    mask = setups["exact64"] > 0
    rel = np.abs(setups["exact32"] - setups["exact64"])[mask] \
        / setups["exact64"][mask]
    assert rel.max() < 1e-4, f"exact f32 vs f64 rates: {rel.max():.2e}"

    # exact rates at per-cell T vs fast rates at T_avg: same ballpark
    # (narrow temperature spread on the test surface)
    tot_exact = setups["exact64"].sum()
    tot_fast = setups["fast"].sum()
    assert abs(tot_exact / tot_fast - 1.0) < 0.2


def test_streaming_chunk_binner_matches_concat(env):
    """ChunkBinner (per-chunk device binning, no campaign-wide concat) must
    give exactly the histograms of binning the concatenated output."""
    species, grids, laguerre, tables, surf, plasma = env
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)
    from is3d2_tpu.core.sampler_hist import ChunkBinner, bin_sampled_particles

    n_events = 200
    base = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                  include_bulk_deltaf=1, fast=1, cell_block=64)
    big = sample_particles(surf, species, chosen, df_data, base, laguerre,
                           n_events=n_events, seed=9)
    mean_1ev = float(big["drawn"]) / n_events
    cfg = dataclasses.replace(base,
                              sampler_chunk_hadrons=mean_1ev * n_events / 4)

    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=9)
    ref = bin_sampled_particles(out, len(chosen), cfg, n_events)

    binner = ChunkBinner(len(chosen), cfg)
    diags = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                             n_events=n_events, seed=9, chunk_consumer=binner)
    hist = binner.result(n_events)
    assert int(diags["kept"]) == int(out["kept"])
    # count histograms are exact integers in both paths (f32/f64
    # accumulation of counts < 2^24 is exact regardless of order)
    for f in ("dN_dy", "dN_deta", "dN_2pipTdpTdy", "dN_dphipdy",
              "dN_taudtaudy", "dN_2pirdrdy", "dN_dphisdy"):
        np.testing.assert_array_equal(getattr(hist, f), getattr(ref, f),
                                      err_msg=f)
    # the cos/sin-weighted vn sums accumulate in f32 on the MXU (the
    # one-hot-matmul binner), so chunked-vs-concat block orders differ at
    # ~1e-7 absolute -- orders of magnitude below the 1e-3 -- 1e-4
    # statistical resolution of the sampled vn themselves
    for f in ("vn_real", "vn_imag"):
        np.testing.assert_allclose(getattr(hist, f), getattr(ref, f),
                                   rtol=1e-4, atol=1e-5, err_msg=f)


def test_streaming_event_writer_matches_posthoc(env, tmp_path):
    """StreamingEventWriter (per-chunk export, overlapped with compute) must
    produce byte-identical event files to the post-hoc campaign writer:
    every event's rows live in exactly one chunk, and the stable per-chunk
    sort preserves the lane order the campaign-wide sort would give."""
    species, grids, laguerre, tables, surf, plasma = env
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)
    from is3d2_tpu.core.sampler import ChunkCollector
    from is3d2_tpu.io import output

    n_events = 200
    base = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                  include_bulk_deltaf=1, fast=1, cell_block=64)
    big = sample_particles(surf, species, chosen, df_data, base, laguerre,
                           n_events=n_events, seed=9)
    mean_1ev = float(big["drawn"]) / n_events
    cfg = dataclasses.replace(base,
                              sampler_chunk_hadrons=mean_1ev * n_events / 4)

    coll = ChunkCollector()
    sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                     n_events=n_events, seed=9, chunk_consumer=coll)
    ref_dir = tmp_path / "ref"
    output.write_particle_list_oscar(ref_dir, coll.particle_list(), n_events)
    output.write_particle_list_csv(ref_dir, coll.particle_list(), n_events)

    stream_dir = tmp_path / "stream"
    writer = output.StreamingEventWriter(stream_dir, csv=True)
    sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                     n_events=n_events, seed=9, chunk_consumer=writer)
    assert writer.events_written == n_events
    assert writer.particle_list().n_valid == coll.particle_list().n_valid

    for e in range(1, n_events + 1):
        for stem in ("particle_list_osc", "particle_list"):
            a = (ref_dir / f"{stem}_{e}.dat").read_bytes()
            b = (stream_dir / f"{stem}_{e}.dat").read_bytes()
            assert a == b, f"{stem}_{e}.dat differs"


def test_sampler_closure_3plus1d(env):
    """3+1d surface: the sampler's midrapidity dN/dy must match the smooth
    3+1d spectra (no flat y-draw here -- rapidity comes from the cell's
    spacetime rapidity + LRF kinematics, ParticleSampler.cpp:1069-1104)."""
    species, grids, laguerre, tables, _surf2d, _plasma2d = env
    surf = make_surface(60, seed=11, dimension=3, shear_scale=0.03,
                        bulk_scale=0.01)
    plasma = surf.thermo_averages()

    cfg = Config(operation=2, df_mode=1, hrg_eos=3, dimension=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, outflow=1, fast=1, sampler_seed=3,
                 y_bins=40, y_cut=5.0, cell_block=64)
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    smooth = compute_spectra(surf, species, chosen, grids, df_data, cfg,
                             laguerre)          # (S, pT, phi, y)
    w = (grids.pT_weight * grids.pT)[None, :, None] * grids.phi_weight[None, None, :]
    dN_dy_smooth = np.einsum("pq,spqy->sy", w[0], smooth)   # (S, Ny)

    n_events = 30000
    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=3)
    hist = bin_sampled_particles(out, len(PIKP), cfg, n_events)

    y_w = 2.0 * cfg.y_cut / cfg.y_bins
    y_mid = -cfg.y_cut + y_w * (np.arange(cfg.y_bins) + 0.5)
    # central |y| < 1 bins, pion (most stats); hist.dN_dy holds raw counts
    sel = np.abs(y_mid) < 1.0
    counts = hist.dN_dy[0, sel]
    obs = counts / n_events                       # counts per bin per event
    ref = np.interp(y_mid[sel], grids.y, dN_dy_smooth[0]) * y_w
    sigma = np.sqrt(np.maximum(counts, 1.0)) / n_events
    assert counts.sum() > 2000
    diff = np.abs(obs - ref)
    assert (diff < 5.0 * sigma + 0.03 * ref).all(), (
        f"3+1d dN/dy mismatch: {obs} vs {ref}")


def test_lean_host_boost_matches_device(env):
    """The lean path's HOST lab boost (ChunkCollector._boost_lrf_to_lab)
    must reproduce the device boost: with the same seed the kept rows are
    identical, and the transverse lab momenta px/py are rapidity-
    independent, so lean (host-boosted) and non-lean (device-boosted)
    campaigns must agree on them to f32 rounding row by row.  pz/eta
    differ only through the (independent) rapidity streams -- checked
    statistically."""
    species, grids, laguerre, tables, surf, plasma = env
    from is3d2_tpu.core.sampler import ChunkCollector

    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, fast=1, y_cut=5.0, cell_block=64)
    df_data = DeltafData(tables, 1, include_baryon=False)
    compute_particle_densities(species, df_data, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    n_events = 500
    coll_lean = ChunkCollector()
    sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                     n_events=n_events, seed=21, chunk_consumer=coll_lean,
                     lean=True)
    lean_pl = coll_lean.particle_list()

    out = sample_particles(surf, species, chosen, df_data, cfg, laguerre,
                           n_events=n_events, seed=21)
    dev_pl = to_particle_list(out)
    v = dev_pl.valid
    assert lean_pl.n_valid == v.sum() > 500

    np.testing.assert_array_equal(lean_pl.event, dev_pl.event[v])
    np.testing.assert_array_equal(lean_pl.mcid, dev_pl.mcid[v])
    # transverse momenta: same boost algebra, numpy vs XLA f32 rounding
    np.testing.assert_allclose(lean_pl.px, dev_pl.px[v], rtol=2e-6,
                               atol=5e-7)
    np.testing.assert_allclose(lean_pl.py, dev_pl.py[v], rtol=2e-6,
                               atol=5e-7)
    np.testing.assert_allclose(lean_pl.tau, dev_pl.tau[v], rtol=1e-6)
    # rapidity streams are independent: pz agrees in distribution (flat y
    # over |y| < y_cut -> compare robust quantiles of eta)
    q = np.linspace(5, 95, 7)
    a = np.percentile(lean_pl.eta, q)
    b = np.percentile(dev_pl.eta[v], q)
    assert np.max(np.abs(a - b)) < 0.35, f"eta quantiles {a} vs {b}"


def test_compaction_index_methods_bitwise_equal(env, monkeypatch):
    """The searchsorted compaction build must be bitwise-identical to the
    scatter build (idx AND pos), including the zeroed padding slots, at
    sizes below, at, and above the kept count."""
    import jax
    import jax.numpy as jnp
    from is3d2_tpu.core import sampler as S

    key = jax.random.PRNGKey(42)
    for n, frac in ((10_000, 0.43), (10_000, 0.0), (10_000, 1.0),
                    (8_192, 0.07)):
        mask = jax.random.uniform(key, (n,), dtype=jnp.float32) < frac
        kept = int(jnp.sum(mask.astype(jnp.int32)))
        for size in sorted({1024, max(kept // 2, 1), kept or 1,
                            kept + 1000, n}):
            monkeypatch.setattr(S, "_COMPACTION_METHOD", "scatter")
            ia, pa = S._compaction_index(mask, size)
            monkeypatch.setattr(S, "_COMPACTION_METHOD", "searchsorted")
            ib, pb = S._compaction_index(mask, size)
            np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
