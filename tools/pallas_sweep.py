#!/usr/bin/env python
"""On-silicon Pallas-vs-XLA sweep for the Cooper-Frye df-1/2 kernel.

Measures the Pallas kernel (dot_impl in {highest, split}) against the XLA
fast path at the production bench shape, INTERLEAVED: the shared tunnel
device's execution speed varies 2.5-35x between windows (CLAUDE.md), so an
XLA reference run brackets every candidate and only the candidate/XLA
RATIO is reported.  Use this to (re)pick production tiles and to judge
whether the split-dot rework (ops/cooper_frye_pallas._dot3: 24 -> ~14 MXU
passes per eta step) closes the measured 3-13% XLA gap.

Usage (real TPU):
    python tools/pallas_sweep.py [--cells 16384] [--tiles 512x1024,256x1024]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=16384)
    ap.add_argument("--tiles", default="512x1024,256x1024,512x512")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--impls", default="highest,split",
                    help="comma list of dot_impl candidates: highest, "
                         "split, comp (the <=1e-6 compensated kernel)")
    ap.add_argument("--xla", default="f32",
                    help="XLA reference path: f32 or f32c (use f32c when "
                         "judging the comp kernel against the production "
                         "accuracy-bar engine)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    sys.path.insert(0, str(REPO / "tools"))
    from roofline import build_kernel, _fence  # the bench-shape XLA program

    from is3d2_tpu.ops.spectra_fast_common import (pack_inputs,
                                                   pack_inputs_comp)
    from is3d2_tpu.ops.cooper_frye_pallas import (cooper_frye_pallas,
                                                  cooper_frye_pallas_comp)

    log(f"device: {jax.devices()[0]}")

    # XLA reference at the bench shape (f32 fast path or the f32c
    # accuracy-bar path, --xla)
    xla_fn, _, evals, n_blocks, n_m_blocks, n_eta = build_kernel(
        args.cells, compute_dtype=args.xla)

    # Pallas candidates share packed inputs per tile config
    import os
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

    ref = os.environ.get("IS3D2_REFERENCE", "/root/reference")
    cfg = Config(operation=1, df_mode=1, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=512)
    surf = make_surface(args.cells, seed=1, shear_scale=0.02, bulk_scale=0.01)
    species_t = read_pdg(3, os.path.join(ref, "PDG"))
    grids = MomentumGrids.from_dir(os.path.join(ref, "tables"))
    phi48 = load_table(os.path.join(
        ref, "tables/all_tables/phi/phi_gauss_table_48pt.dat"))
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=os.path.join(
                                   ref, "deltaf_coefficients/vh"))
    df_data = DeltafData(tables, 1, include_baryon=False)
    chosen = np.arange(len(species_t))
    cells = prepare_cells(surf, cfg, block=512)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)
    # the production Pallas path folds the symmetric eta quadrature before
    # packing (ops/spectra_fast_common.compute_spectra_pallas), and
    # build_kernel's XLA reference is folded too -- keep the A/B fair
    from is3d2_tpu.core.spectra_fast import fold_eta_quadrature
    cells, grid, folded = fold_eta_quadrature(cells, grid, cfg)
    log(f"eta fold: {folded} ({grid.eta.shape[0]} computed nodes)")

    impls = [v.strip() for v in args.impls.split(",") if v.strip()]
    candidates = []
    for tile in args.tiles.split(","):
        c_t, m_t = (int(v) for v in tile.split("x"))
        try:
            q, cols, mom, eta_pack, M, Ne = pack_inputs(
                cells, coeffs, species, grid, cfg, c_t, m_t)
            if "comp" in impls:
                (qc, colsc, qm1, qm2, momc, eta_pack_c, _,
                 _) = pack_inputs_comp(cells, coeffs, species, grid, cfg,
                                       c_t, m_t)
        except Exception as e:
            log(f"pack {tile}: {e}")
            continue
        for impl in impls:
            if impl == "comp":
                def run(qc=qc, colsc=colsc, qm1=qm1, qm2=qm2, momc=momc,
                        eta_pack_c=eta_pack_c, Ne=Ne, c_t=c_t, m_t=m_t):
                    out = cooper_frye_pallas_comp(qc, colsc, qm1, qm2, momc,
                                                  eta_pack_c, cfg,
                                                  c_tile=c_t, m_tile=m_t,
                                                  n_eta=Ne)
                    return _fence(out)
            else:
                def run(q=q, cols=cols, mom=mom, eta_pack=eta_pack, Ne=Ne,
                        c_t=c_t, m_t=m_t, impl=impl):
                    out = cooper_frye_pallas(q, cols, mom, eta_pack, cfg,
                                             c_tile=c_t, m_tile=m_t,
                                             n_eta=Ne, dot_impl=impl)
                    return _fence(out)
            candidates.append((f"{tile}:{impl}", run))

    # compile everything first (compiles are uninformative through the
    # tunnel: 20-40s each)
    t0 = time.time()
    xla_fn()
    log(f"XLA compile+first: {time.time() - t0:.1f}s")
    alive = []
    for name, run in candidates:
        try:
            t0 = time.time()
            run()
            log(f"pallas {name} compile+first: {time.time() - t0:.1f}s")
            alive.append((name, run))
        except Exception as e:
            log(f"pallas {name} FAILED to compile/run: {str(e)[:200]}")

    # interleaved rounds: XLA before every candidate; report best ratio
    results = {name: [] for name, _ in alive}
    xla_times = []
    for r in range(args.rounds):
        for name, run in alive:
            t0 = time.time(); xla_fn(); t_x = time.time() - t0
            t0 = time.time(); run(); t_p = time.time() - t0
            xla_times.append(t_x)
            results[name].append((t_p, t_x, t_p / t_x))
            log(f"round {r} {name}: pallas {t_p:.3f}s xla {t_x:.3f}s "
                f"ratio {t_p/t_x:.3f}")

    best_x = min(xla_times) if xla_times else float("nan")
    out = {"evals": evals, "xla_best_s": best_x,
           "xla_evals_per_s": evals / best_x if xla_times else None,
           "candidates": {}}
    for name, rows in results.items():
        ratio = min(r[2] for r in rows)
        best_p = min(r[0] for r in rows)
        out["candidates"][name] = {
            "best_s": best_p, "best_ratio_vs_xla": ratio,
            "evals_per_s": evals / best_p}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
