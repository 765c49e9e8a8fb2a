#!/usr/bin/env python
"""On-silicon feqmod/famod Pallas-vs-XLA interleaved measurement.

Measures ops/cooper_frye_feqmod_pallas against the XLA feqmod fast path
(core/spectra_feqmod_fast) at a production-class shape, INTERLEAVED (the
shared tunnel device varies 2.5-35x between windows; only same-process
ratios are comparable).  Decides the VERDICT r4 #2 feqmod sub-item: flip
df 3/4/5 to the Pallas kernel if the ratio is < 1, else record the
measured negative result.

Usage (real TPU): python tools/pallas_feqmod_sweep.py [--cells 4096]
                  [--df 3] [--tiles 256x512,512x512]
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


def _fence(x):
    import numpy as np
    return float(np.asarray(x).ravel()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=4096)
    ap.add_argument("--df", type=int, default=3)
    ap.add_argument("--tiles", default="256x512,512x512,128x512")
    ap.add_argument("--impls", default="vpu,mxu")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import os
    import numpy as np
    from surfgen import make_surface, make_eos_consistent
    from is3d2_tpu.config import Config
    from is3d2_tpu.io.pdg import read_pdg
    from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids, load_table
    from is3d2_tpu.io.deltaf_tables import DeltafTables
    from is3d2_tpu.io.surface import ThermoAverages
    from is3d2_tpu.physics.deltaf import DeltafData
    from is3d2_tpu.core.cells import prepare_cells
    from is3d2_tpu.core.spectra import SpeciesArrays, MomentumGridDevice
    from is3d2_tpu.core.spectra_feqmod_fast import compute_spectra_feqmod_fast
    from is3d2_tpu.ops.cooper_frye_feqmod_pallas import (
        compute_spectra_feqmod_pallas)

    log(f"device: {jax.devices()[0]}")
    ref = os.environ.get("IS3D2_REFERENCE", "/root/reference")
    cfg = Config(operation=1, df_mode=args.df, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 cell_block=512)
    species_t = read_pdg(3, os.path.join(ref, "PDG"))
    grids = MomentumGrids.from_dir(os.path.join(ref, "tables"))
    phi48 = load_table(os.path.join(
        ref, "tables/all_tables/phi/phi_gauss_table_48pt.dat"))
    grids.phi, grids.phi_weight = phi48[:, 0], phi48[:, 1]
    laguerre = GaussLaguerre.from_file(
        os.path.join(ref, "tables/gauss/gla_roots_weights.txt"))
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=os.path.join(
                                   ref, "deltaf_coefficients/vh"))
    df_data = DeltafData(tables, args.df, include_baryon=False)
    surf = make_surface(args.cells, seed=1, shear_scale=0.02,
                        bulk_scale=0.01)
    if args.df == 5:
        surf = make_eos_consistent(surf, species_t, laguerre)
    if args.df == 4:
        df_data.compute_jonah_coefficients(
            species_t, laguerre, surf.thermo_averages())
    chosen = np.arange(len(species_t))
    cells = prepare_cells(surf, cfg, block=512)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    if args.df == 5:
        from is3d2_tpu.core.spectra_famod import prepare_famod
        prep = prepare_famod(cells, species_t, cfg)
    else:
        from is3d2_tpu.core.feqmod import prepare_feqmod
        prep = prepare_feqmod(cells, species, df_data, cfg, laguerre)

    evals = (cells.n_padded * len(chosen) * len(grids.pT) * len(grids.phi)
             * len(grids.eta))

    def xla_run():
        return _fence(compute_spectra_feqmod_fast(cells, prep, species,
                                                  grid, cfg))

    cands = []
    for tile in args.tiles.split(","):
        c_t, m_t = (int(v) for v in tile.split("x"))
        for impl in args.impls.split(","):
            def run(c_t=c_t, m_t=m_t, impl=impl):
                return _fence(compute_spectra_feqmod_pallas(
                    cells, prep, species, grid, cfg, c_tile=c_t,
                    m_tile=m_t, dot_impl=impl))
            cands.append((f"{tile}:{impl}", run))

    t0 = time.time(); xla_run()
    log(f"XLA feqmod fast compile+first: {time.time()-t0:.1f}s")
    alive = []
    for name, run in cands:
        try:
            t0 = time.time(); run()
            log(f"pallas {name} compile+first: {time.time()-t0:.1f}s")
            alive.append((name, run))
        except Exception as e:
            log(f"pallas {name} FAILED: {str(e)[:200]}")

    results = {n: [] for n, _ in alive}
    xt_all = []
    for r in range(args.rounds):
        for name, run in alive:
            t0 = time.time(); xla_run(); t_x = time.time() - t0
            t0 = time.time(); run(); t_p = time.time() - t0
            xt_all.append(t_x)
            results[name].append((t_p, t_x, t_p / t_x))
            log(f"round {r} {name}: pallas {t_p:.3f}s xla {t_x:.3f}s "
                f"ratio {t_p/t_x:.3f}")

    out = {"df_mode": args.df, "evals": evals,
           "xla_best_s": min(xt_all) if xt_all else None,
           "candidates": {
               n: {"best_s": min(r[0] for r in rows),
                   "best_ratio_vs_xla": min(r[2] for r in rows)}
               for n, rows in results.items()}}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
