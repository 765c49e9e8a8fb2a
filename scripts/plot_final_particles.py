#!/usr/bin/env python
"""Scatter/summary plots of a sampled event (parity with the reference's
scripts/plot_final_particles.py)."""

import argparse

import numpy as np

from histogram_event import read_particle_list


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("particle_list")
    ap.add_argument("--out", default="final_particles.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mcid, E, px, py, pz = read_particle_list(args.particle_list)
    pT = np.hypot(px, py)
    y = 0.5 * np.log((E + pz) / np.maximum(E - pz, 1e-300))
    phi = np.arctan2(py, px)

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
    axes[0].hist(y, bins=60)
    axes[0].set_xlabel("y")
    axes[1].hist(pT, bins=60, range=(0, 3))
    axes[1].set_xlabel(r"$p_T$ [GeV]")
    axes[1].set_yscale("log")
    axes[2].hist(phi, bins=60)
    axes[2].set_xlabel(r"$\phi_p$")
    fig.suptitle(f"{len(mcid)} particles")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
