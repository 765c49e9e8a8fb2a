"""Parameter-sweep harness: the modified-distribution paper matrix.

Equivalent of scripts/modified_distribution/run_all_*.sh in the reference:
run the smooth spectra for every (df mode x viscous-correction) combination
on one freezeout surface and archive the dN* outputs per combination
(the reference forks ./iS3D.e per combo with copied parameter presets;
here one process loops jitted configurations, reusing the loaded surface,
PDG and coefficient tables).

CLI:
    python -m is3d2_tpu.tools.sweep <workdir> [--out sweep_results]
        [--df grad ce ptm ptb famod] [--corr none shear bulk shear_bulk]
"""

from __future__ import annotations

import dataclasses
import shutil
import sys
from pathlib import Path

DF_MODES = {"grad": 1, "ce": 2, "ptm": 3, "ptb": 4, "famod": 5}
CORRECTIONS = {
    "none": dict(include_shear_deltaf=0, include_bulk_deltaf=0),
    "shear": dict(include_shear_deltaf=1, include_bulk_deltaf=0),
    "bulk": dict(include_shear_deltaf=0, include_bulk_deltaf=1),
    "shear_bulk": dict(include_shear_deltaf=1, include_bulk_deltaf=1),
}


def run_sweep(workdir, df_names=("grad", "ce", "ptm", "ptb"),
              corr_names=("none", "shear", "bulk", "shear_bulk"),
              out_dir=None):
    """Run the spectra matrix; returns {(df, corr): results_subdir}."""
    from ..config import Config
    from ..driver import IS3D

    workdir = Path(workdir)
    out_dir = Path(out_dir) if out_dir else workdir / "sweep_results"
    base = Config.from_file(workdir / "iS3D_parameters.dat")

    archived = {}
    for df_name in df_names:
        corrs = ("none", "shear") if df_name in ("fa", "famod") else corr_names
        for corr in corrs:
            cfg = dataclasses.replace(base, operation=1,
                                      df_mode=DF_MODES[df_name],
                                      **CORRECTIONS[corr])
            print(f"=== sweep: df={df_name} corrections={corr} ===",
                  flush=True)
            run = IS3D(str(workdir), cfg=cfg)
            run.run_particlization()
            dst = out_dir / df_name / corr
            dst.mkdir(parents=True, exist_ok=True)
            for f in sorted((workdir / "results/continuous").glob("dN*")):
                shutil.copy(f, dst / f.name)
            for f in sorted((workdir / "results/continuous").glob("vn*")):
                shutil.copy(f, dst / f.name)
            archived[(df_name, corr)] = dst
    print(f"sweep complete: {len(archived)} combinations under {out_dir}")
    return archived


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1
    wd = argv[0]
    df_names = ("grad", "ce", "ptm", "ptb")
    corr_names = ("none", "shear", "bulk", "shear_bulk")
    out = None
    i = 1
    while i < len(argv):
        if argv[i] == "--df":
            j = i + 1
            while j < len(argv) and not argv[j].startswith("--"):
                j += 1
            df_names = tuple(argv[i + 1:j])
            i = j
        elif argv[i] == "--corr":
            j = i + 1
            while j < len(argv) and not argv[j].startswith("--"):
                j += 1
            corr_names = tuple(argv[i + 1:j])
            i = j
        elif argv[i] == "--out":
            out = argv[i + 1]
            i += 2
        else:
            print(f"unknown argument {argv[i]}")
            return 1
    run_sweep(wd, df_names, corr_names, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
