#!/usr/bin/env python
"""Overlay sampled vs smooth pT spectra (the reference's closure check,
scripts/compare_sampling_smooth.py).

Reads results/continuous/dN_2pipTdpTdy_<mcid>.dat (smooth, quadrature grid)
and results/sampled/dN_2pipTdpTdy/dN_2pipTdpTdy_<mcid>_test.dat (sampled bin
midpoints) from a run directory and reports per-species ratios; optionally
writes a matplotlib overlay if matplotlib is available.
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default=".")
    ap.add_argument("--mcids", type=int, nargs="+", default=[111, 321, 2212])
    ap.add_argument("--plot", default=None, help="write overlay png here")
    args = ap.parse_args()

    wd = Path(args.workdir)
    fig = None
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4.5))

    worst = 0.0
    for mcid in args.mcids:
        smooth = np.loadtxt(wd / f"results/continuous/dN_2pipTdpTdy_{mcid}.dat")
        sampled = np.loadtxt(
            wd / f"results/sampled/dN_2pipTdpTdy/dN_2pipTdpTdy_{mcid}_test.dat")
        interp = np.interp(sampled[:, 0], smooth[:, 1], smooth[:, 2]) \
            if smooth.shape[1] > 2 else np.interp(sampled[:, 0], smooth[:, 0],
                                                  smooth[:, 1])
        sel = (sampled[:, 1] > 0) & (interp > 0)
        ratio = sampled[sel, 1] / interp[sel]
        dev = np.abs(ratio - 1.0)
        print(f"mcid {mcid}: {sel.sum()} bins, median ratio "
              f"{np.median(ratio):.4f}, max |ratio-1| {dev.max():.4f}")
        worst = max(worst, float(np.median(np.abs(ratio - 1.0))))
        if fig is not None:
            ax.semilogy(sampled[sel, 0], sampled[sel, 1], ".",
                        label=f"sampled {mcid}")
            ax.semilogy(sampled[sel, 0], interp[sel], "-",
                        label=f"smooth {mcid}")

    if fig is not None:
        ax.set_xlabel(r"$p_T$ [GeV]")
        ax.set_ylabel(r"$dN/(2\pi p_T dp_T dy)$")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=150)
        print(f"wrote {args.plot}")

    return 0 if worst < 0.1 else 1


if __name__ == "__main__":
    sys.exit(main())
