#!/usr/bin/env python
"""On-silicon microprofile of the sampler finalize phase (VERDICT r4 #3).

bench.py's phase split showed finalize (compaction + packed takes + cell
gather + boost) as the LARGEST sampler phase (0.206 s vs momentum 0.177 s
at the 8e6-envelope bench chunk).  This script times each finalize
sub-program separately on real inputs, INTERLEAVED with the full fused
program (the tunnel device varies 2.5-35x between windows: only
same-process ratios are comparable), to show which sub-step to attack:

  idx      _compaction_index: keep-mask cumsum + int32 scatter (capacity)
  take     the packed bitcast stack + 8-row gather at pad indices
  cellg    the (5, n_cells) cell-table gather at pad width + Milne boost
  rap      the capacity-width rapidity uniform draw
  fin      the whole _finalize_device(lean) for reference
  full     the fused sample+finalize program

Usage (real TPU): python tools/finalize_profile.py [--cells 16384]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _fence(x):
    import numpy as np
    return float(np.asarray(x).ravel()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=16384)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import os
    import dataclasses as dc
    import numpy as np
    import jax.numpy as jnp
    from surfgen import make_surface
    from is3d2_tpu.config import Config
    from is3d2_tpu.io.pdg import read_pdg
    from is3d2_tpu.io.tables import GaussLaguerre
    from is3d2_tpu.io.deltaf_tables import DeltafTables
    from is3d2_tpu.physics.deltaf import DeltafData, compute_particle_densities
    from is3d2_tpu.core import sampler as S
    from is3d2_tpu.physics import lrf

    log(f"device: {jax.devices()[0]}")
    ref = os.environ.get("IS3D2_REFERENCE", "/root/reference")
    cfg = Config(operation=2, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=512, fast=1,
                 compute_dtype="f32", y_cut=5.0)
    species_t = read_pdg(3, os.path.join(ref, "PDG"))
    laguerre = GaussLaguerre.from_file(
        os.path.join(ref, "tables/gauss/gla_roots_weights.txt"))
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=os.path.join(
                                   ref, "deltaf_coefficients/vh"))
    df_data = DeltafData(tables, 1, include_baryon=False)
    surf = make_surface(args.cells, seed=9, shear_scale=0.02,
                        bulk_scale=0.01)
    compute_particle_densities(species_t, df_data, laguerre,
                               surf.thermo_averages())
    chosen = np.arange(len(species_t))
    setup, species = S.prepare_sampler(surf, species_t, chosen, df_data,
                                       cfg, laguerre)
    mcid = jnp.asarray(species_t.mc_id[chosen])
    f32 = jnp.float32
    rates64 = setup.rates
    cast = lambda tree: jax.tree_util.tree_map(
        lambda a: a.astype(f32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)
    setup = dc.replace(cast(setup), rates=rates64)
    species = cast(species)
    cdf_flat, cdf_bucket, cell_rate = S._species_alias(setup.rates)

    y_max = cfg.y_cut
    tilt = S._envelope_tilt_cells(setup, cfg)
    envc = (2.0 * y_max * setup.ds_max).astype(f32)
    if tilt is not None:
        envc = envc * tilt
    mean_1ev = float(jnp.sum(cell_rate * envc))
    n_events = max(1, int(8.0e6 / mean_1ev))
    cap = int(mean_1ev * n_events * 1.2
              + 6.0 * np.sqrt(mean_1ev * n_events) + 1024)
    key = jax.random.PRNGKey(3)

    out = S._sample_hadrons_jit(setup, species, mcid, cdf_flat, cdf_bucket,
                                cell_rate, key, cfg, cap, n_events,
                                species_draw="alias")
    kept = int(jnp.sum(out["keep"]))
    log(f"capacity {cap}, kept {kept}, drawn {int(out['drawn'])}")
    bucket = 8192 if cap < (4 << 20) else (1 << 20)
    pad = int(kept * 1.25 + 6.0 * np.sqrt(max(kept, 1.0)) + 1024)
    pad = min(max(bucket, -(-pad // bucket) * bucket), cap)
    out = {k: v for k, v in out.items()}  # host-pinned dict of device arrays

    # ---- sub-programs ----
    @jax.jit
    def p_idx(keep):
        idx, _ = S._compaction_index(keep, pad)
        return idx

    idx_fixed = p_idx(out["keep"])

    @jax.jit
    def p_take(E, px, py, pz, event, sp_idx, cell_idx, rap_u, idx):
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        rows = [bc(E), bc(px), bc(py), bc(pz), event.astype(jnp.int32),
                sp_idx.astype(jnp.int32), cell_idx.astype(jnp.int32),
                bc(rap_u)]
        return jnp.take(jnp.stack(rows), idx, axis=1)

    @jax.jit
    def p_rap(k):
        return jax.random.uniform(k, (cap,), dtype=jnp.float32)

    rap_u = p_rap(out["_k_rap"])

    @jax.jit
    def p_cellg(pack, cells_tau, cells_ux, cells_uy, cells_un, cells_eta):
        fb = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        E, px, py, pz = fb(pack[0]), fb(pack[1]), fb(pack[2]), fb(pack[3])
        cell_idx = pack[6]
        crows = [cells_tau, cells_ux, cells_uy, cells_un, cells_eta]
        cpack = jnp.take(jnp.stack(crows), cell_idx, axis=1)
        tau_h, ux_h, uy_h, un_h, eta_c = (cpack[i] for i in range(5))
        basis_h = lrf.milne_basis(tau_h, ux_h, uy_h, un_h)
        ptau, plx, ply, pn = lrf.boost_momentum_to_lab(
            basis_h, tau_h, ux_h, uy_h, un_h, E, px, py, pz)
        rap_uc = fb(pack[7])
        rap = (y_max * (2.0 * rap_uc - 1.0)).astype(ptau.dtype)
        sinhy = jnp.sinh(rap)
        coshy = jnp.sqrt(1.0 + sinhy * sinhy)
        tau_pn = tau_h * pn
        mT = jnp.sqrt(jnp.maximum(ptau * ptau - tau_pn * tau_pn, 1e-300))
        eta_p = jnp.arcsinh((ptau * sinhy - tau_pn * coshy) / mT)
        return plx + ply + mT * sinhy + eta_p

    pack_fixed = p_take(out["E"], out["px"], out["py"], out["pz"],
                        out["event"], out["sp_idx"], out["cell_idx"],
                        rap_u, idx_fixed)
    c = setup.cells

    def fin_full():
        fin = S._finalize_jit(out, setup, cfg, pad, True)
        return _fence(fin["pz"])

    def fused():
        fin = S._sample_finalize_jit(setup, species, mcid, cdf_flat,
                                     cdf_bucket, cell_rate, key, cfg, cap,
                                     n_events, 0, pad, True, "alias")
        return _fence(fin["pz"])

    probes = {
        "idx": lambda: _fence(p_idx(out["keep"])),
        "take": lambda: _fence(p_take(out["E"], out["px"], out["py"],
                                      out["pz"], out["event"],
                                      out["sp_idx"], out["cell_idx"],
                                      rap_u, idx_fixed)),
        "rap": lambda: _fence(p_rap(out["_k_rap"])),
        "cellg": lambda: _fence(p_cellg(pack_fixed, c.tau, c.ux, c.uy,
                                        c.un, c.eta)),
        "fin": fin_full,
        "full": fused,
    }
    for name, fn in probes.items():
        t0 = time.time(); fn()
        log(f"{name} compile+first: {time.time()-t0:.2f}s")

    best = {k: [] for k in probes}
    for r in range(args.rounds):
        for name, fn in probes.items():
            t0 = time.time(); fn(); best[name].append(time.time() - t0)
            log(f"round {r} {name}: {best[name][-1]:.4f}s")
    out_j = {k: min(v) for k, v in best.items()}
    out_j["capacity"] = cap
    out_j["pad"] = pad
    out_j["kept"] = kept
    print(json.dumps(out_j, indent=2))


if __name__ == "__main__":
    main()
