#!/usr/bin/env python
"""Paper-reproduction / regression parameter sweep.

Equivalent of the reference's tests/modified_distribution matrix
(2 bulk sizes x 4 df modes x 4 viscous-switch combos driven by
scripts/modified_distribution/run_modified_distribution_*.sh): runs the
continuous spectra for every combination and archives the dN outputs under
<out>/<df>_<switches>/.
"""

import argparse
import itertools
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from is3d2_tpu.config import Config
from is3d2_tpu.driver import IS3D

DF_NAMES = {1: "grad", 2: "ce", 3: "ptm", 4: "ptb"}
SWITCHES = {
    "none": (0, 0),
    "shear": (1, 0),
    "bulk": (0, 1),
    "shear_bulk": (1, 1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", help="run dir with PDG/, tables/, "
                                    "deltaf_coefficients/, input/surface.dat")
    ap.add_argument("--out", default="modified_distribution_results")
    ap.add_argument("--hrg-eos", type=int, default=3)
    args = ap.parse_args()

    out_root = Path(args.out)
    for df_mode, (sw_name, (shear, bulk)) in itertools.product(
            DF_NAMES, SWITCHES.items()):
        label = f"{DF_NAMES[df_mode]}_{sw_name}"
        print(f"=== {label} ===")
        cfg = Config(operation=1, df_mode=df_mode, hrg_eos=args.hrg_eos,
                     include_shear_deltaf=shear, include_bulk_deltaf=bulk)
        run = IS3D(args.workdir, cfg=cfg)
        run.run_particlization()

        dst = out_root / label
        dst.mkdir(parents=True, exist_ok=True)
        for f in (Path(args.workdir) / "results/continuous").glob("dN*"):
            shutil.copy2(f, dst / f.name)
    print(f"archived results under {out_root}")


if __name__ == "__main__":
    main()
