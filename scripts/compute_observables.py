#!/usr/bin/env python
"""Event observables from sampled particle lists (parity with the reference's
scripts/compute_observables.py hic-eventgen pipeline).

For each event file: charged multiplicity dNch/deta at midrapidity,
identified mean pT, and two-particle flow cumulants v2{2}, v3{2} via
Q-vectors.  Writes one JSON line per event.
"""

import argparse
import glob
import json
from pathlib import Path

import numpy as np

from histogram_event import read_particle_list

CHARGED = {211, -211, 321, -321, 2212, -2212}
PION, KAON, PROTON = 211, 321, 2212


def event_observables(path, eta_cut=0.5):
    mcid, E, px, py, pz = read_particle_list(path)
    p = np.sqrt(px**2 + py**2 + pz**2)
    eta = 0.5 * np.log((p + pz) / np.maximum(p - pz, 1e-300))
    pT = np.hypot(px, py)
    phi = np.arctan2(py, px)

    charged = np.isin(mcid, list(CHARGED))
    mid = charged & (np.abs(eta) < eta_cut)
    out = {"file": str(path),
           "dNch_deta": float(mid.sum()) / (2 * eta_cut)}

    for name, m in (("pion", PION), ("kaon", KAON), ("proton", PROTON)):
        sel = (np.abs(mcid) == m) & (np.abs(eta) < eta_cut)
        out[f"mean_pT_{name}"] = float(pT[sel].mean()) if sel.sum() else None

    # two-particle cumulants from Q-vectors (charged, 0.2 < pT < 3)
    sel = charged & (np.abs(eta) < 0.8) & (pT > 0.2) & (pT < 3.0)
    M = int(sel.sum())
    for n in (2, 3):
        if M > 1:
            Qn = np.exp(1j * n * phi[sel]).sum()
            c2 = (abs(Qn) ** 2 - M) / (M * (M - 1))
            out[f"v{n}{{2}}"] = float(np.sqrt(max(c2, 0.0)))
        else:
            out[f"v{n}{{2}}"] = None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", help="glob of particle list files, e.g. "
                                    "'results/particle_list_osc_*.dat'")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = [event_observables(f) for f in sorted(glob.glob(args.pattern))]
    text = "\n".join(json.dumps(r) for r in results)
    if args.out:
        Path(args.out).write_text(text + "\n")
    else:
        print(text)


if __name__ == "__main__":
    main()
