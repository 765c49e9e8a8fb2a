"""Event-sharded sampler: the TPU equivalent of the reference's process-level
oversampling farm (scripts/run_multithread_sampling_iS3D.py:18-31).

Each device runs the full hadron pipeline for its share of the oversampled
events with an independent fold_in'd key; the sampler-test histograms are
psum'd over the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..config import Config
from ..core.sampler import (SamplerSetup, _finalize_device,
                            _sample_hadrons_jit, _species_cdf)
from ..core.sampler_hist import bin_histograms_device
from ..core.spectra import SpeciesArrays


def sharded_sampler_counts(setup: SamplerSetup, species: SpeciesArrays,
                           mcid, key, cfg: Config, capacity_per_device: int,
                           events_per_device: int, mesh: Mesh,
                           pt_bins: int = 32):
    """Run the sampler on every device (different streams), return the psum'd
    per-species kept counts and a pT histogram -- a minimal cross-device
    reduction demonstrating the full sampling step under sharding."""
    n_dev = mesh.devices.size
    S = species.mass.shape[0]
    dev_ids = jnp.arange(n_dev)

    in_specs = (jax.tree_util.tree_map(lambda _: P(), setup),
                jax.tree_util.tree_map(lambda _: P(), species),
                P(), P(), P("events"))

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=(P(), P()), check_vma=False)
    def run(setup_l, species_l, mcid_l, key_l, dev_id):
        k = jax.random.fold_in(key_l, dev_id[0])
        cdf_flat, cdf_coarse, cell_rate = _species_cdf(setup_l.rates)
        out = _sample_hadrons_jit(setup_l, species_l, mcid_l, cdf_flat,
                                  cdf_coarse, cell_rate, k, cfg,
                                  capacity_per_device, events_per_device)
        out = _finalize_device(out, setup_l, cfg)
        keep = out["keep"]
        sp = out["sp_idx"]
        counts = jnp.zeros(S).at[sp].add(jnp.where(keep, 1.0, 0.0))
        pT = jnp.sqrt(out["px"] ** 2 + out["py"] ** 2)
        ib = jnp.clip((pT / 3.0 * pt_bins).astype(jnp.int32), 0, pt_bins - 1)
        hist = jnp.zeros(pt_bins).at[ib].add(jnp.where(keep, 1.0, 0.0))
        return (jax.lax.psum(counts, "events"), jax.lax.psum(hist, "events"))

    return run(setup, species, mcid, key, dev_ids)


def sharded_sampler_histograms(setup: SamplerSetup, species: SpeciesArrays,
                               mcid, key, cfg: Config,
                               capacity_per_device: int,
                               events_per_device: int, mesh: Mesh):
    """Event-sharded sampler returning the FULL psum'd test-histogram set
    (dN/dy, dN/deta, dN/2pipTdpTdy, dN/dphidy, v1-v7, (tau, r, phi_s)) --
    the TPU analog of merging the per-process histogram files of the
    reference's oversampling farm (BinSampledParticle.cpp:9-133 +
    run_multithread_sampling_iS3D.py)."""
    n_dev = mesh.devices.size
    S = species.mass.shape[0]
    dev_ids = jnp.arange(n_dev)

    in_specs = (jax.tree_util.tree_map(lambda _: P(), setup),
                jax.tree_util.tree_map(lambda _: P(), species),
                P(), P(), P("events"))

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=P(), check_vma=False)
    def run(setup_l, species_l, mcid_l, key_l, dev_id):
        k = jax.random.fold_in(key_l, dev_id[0])
        cdf_flat, cdf_coarse, cell_rate = _species_cdf(setup_l.rates)
        out = _sample_hadrons_jit(setup_l, species_l, mcid_l, cdf_flat,
                                  cdf_coarse, cell_rate, k, cfg,
                                  capacity_per_device, events_per_device)
        out = _finalize_device(out, setup_l, cfg)
        hists = bin_histograms_device(out, S, cfg)
        return jax.tree_util.tree_map(
            lambda h: jax.lax.psum(h, "events"), hists)

    return run(setup, species, mcid, key, dev_ids)
