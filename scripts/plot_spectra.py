#!/usr/bin/env python
"""Plot continuous pT spectra from a run directory
(parity with the reference's scripts/plot_spectra.py)."""

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default=".")
    ap.add_argument("--mcids", type=int, nargs="+", default=[111, 321, 2212])
    ap.add_argument("--out", default="spectra.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4.5))
    for mcid in args.mcids:
        f = Path(args.workdir) / f"results/continuous/dN_2pipTdpTdy_{mcid}.dat"
        rows = np.loadtxt(f)
        pT, val = rows[:, 1], rows[:, 2]
        sel = val > 0
        ax.semilogy(pT[sel], val[sel], label=str(mcid))
    ax.set_xlabel(r"$p_T$ [GeV]")
    ax.set_ylabel(r"$dN/(2\pi p_T dp_T dy)$ [GeV$^{-2}$]")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
