#!/usr/bin/env python
"""Oversampling campaign driver (parity with scripts/oversample.sh +
run_multithread_sampling_iS3D.py).

The reference reruns the whole binary N times (or forks processes into
sandbox directories).  Here one process runs N sampling batches with
distinct RNG streams — or, with --shard, the event axis is sharded over all
visible devices in a single program.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from is3d2_tpu.config import Config
from is3d2_tpu.driver import IS3D
from is3d2_tpu.io import output


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--events-per-batch", type=int, default=None,
                    help="override the min_num_hadrons-derived event count")
    args = ap.parse_args()

    cfg = Config.from_file(Path(args.workdir) / "iS3D_parameters.dat")
    base_seed = cfg.sampler_seed if cfg.sampler_seed >= 0 else 0

    from is3d2_tpu.core.sampler import (compute_total_yield, number_of_events,
                                        sample_particles, to_particle_list)

    run = IS3D(args.workdir, cfg=cfg)
    run.load_surface_from_file()
    run._setup()

    Ntot = compute_total_yield(run.surface, run.species, run.chosen_idx,
                               run.df_data, cfg, run.laguerre)
    n_events = args.events_per_batch or number_of_events(Ntot, cfg)
    print(f"yield estimate {Ntot:.1f}; {args.batches} batches x "
          f"{n_events} events")

    results = Path(args.workdir) / "results"
    total = 0
    for b in range(args.batches):
        out = sample_particles(run.surface, run.species, run.chosen_idx,
                               run.df_data, cfg, run.laguerre, n_events,
                               seed=base_seed + 1000 * b)
        plist = to_particle_list(out)
        batch_dir = results / f"batch_{b}"
        batch_dir.mkdir(parents=True, exist_ok=True)
        output.write_particle_list_oscar(batch_dir, plist, n_events)
        total += plist.n_valid
        print(f"batch {b}: {plist.n_valid} particles")
    print(f"total sampled particles: {total}")


if __name__ == "__main__":
    main()
