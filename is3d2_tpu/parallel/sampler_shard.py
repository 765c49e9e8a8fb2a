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
from ..core.sampler import (SamplerSetup, _finalize_device, _rap_meta,
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
        cdf_flat, cdf_bucket, cell_rate = _species_cdf(setup_l.rates)
        out = _sample_hadrons_jit(setup_l, species_l, mcid_l, cdf_flat,
                                  cdf_bucket, cell_rate, k, cfg,
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
        cdf_flat, cdf_bucket, cell_rate = _species_cdf(setup_l.rates)
        out = _sample_hadrons_jit(setup_l, species_l, mcid_l, cdf_flat,
                                  cdf_bucket, cell_rate, k, cfg,
                                  capacity_per_device, events_per_device)
        out = _finalize_device(out, setup_l, cfg)
        hists = bin_histograms_device(out, S, cfg)
        return jax.tree_util.tree_map(
            lambda h: jax.lax.psum(h, "events"), hists)

    return run(setup, species, mcid, key, dev_ids)


def _prepare_meshed_campaign(surf, species_table, chosen_idx, df_data,
                             cfg: Config, laguerre, n_events: int,
                             mesh: Mesh, seed):
    """Shared prep for the meshed sampler campaigns: f32-cast setup, species
    CDF, per-round/per-device event split and the per-device capacity."""
    import dataclasses
    import numpy as np
    from ..core.sampler import (prepare_sampler, _cast_f32_jit,
                                _species_alias)

    if cfg.df_mode == 5:
        from ..core.sampler_famod import prepare_sampler_famod
        setup, species = prepare_sampler_famod(surf, species_table,
                                               chosen_idx, cfg)
    else:
        setup, species = prepare_sampler(surf, species_table, chosen_idx,
                                         df_data, cfg, laguerre)
    mcid = jnp.asarray(species_table.mc_id[chosen_idx])
    rates64 = setup.rates
    setup = dataclasses.replace(_cast_f32_jit(setup), rates=rates64)
    species = _cast_f32_jit(species)
    cdf_flat, cdf_bucket, cell_rate = _species_alias(setup.rates)

    y_max = cfg.y_cut if cfg.dimension == 2 else 0.5
    f32 = jnp.float32
    mean_1ev = float(jnp.sum(
        cell_rate * (2.0 * y_max * setup.ds_max).astype(f32)))

    n_dev = mesh.devices.size
    # events per device per round: bound the per-device envelope to
    # sampler_chunk_hadrons (the single-chip chunking rule, per device)
    ev_per_dev_round = max(1, int(cfg.sampler_chunk_hadrons
                                  / max(mean_1ev, 1.0)))
    ev_per_round = ev_per_dev_round * n_dev
    n_rounds = -(-n_events // ev_per_round)

    def round_split(r):
        """(per-device event counts, per-device global event bases, ev0,
        n_ev) of round ``r`` -- devices own CONTIGUOUS event-id slices so a
        round is one contiguous chunk [ev0, ev0 + n_ev) for the streaming
        event writer."""
        ev0 = r * ev_per_round
        n_ev = min(ev_per_round, n_events - ev0)
        base = n_ev // n_dev
        counts = np.full(n_dev, base, np.int32)
        counts[: n_ev - base * n_dev] += 1
        starts = ev0 + np.concatenate(
            [[0], np.cumsum(counts[:-1])]).astype(np.int32)
        return counts, starts, ev0, n_ev

    max_ev_dev = max(int(round_split(r)[0].max()) for r in range(n_rounds))
    m = mean_1ev * max_ev_dev
    capacity = int(m * 1.2 + 6.0 * np.sqrt(max(m, 1.0)) + 1024)

    if seed is None:
        seed = cfg.sampler_seed if cfg.sampler_seed >= 0 \
            else np.random.SeedSequence().entropy
    key = jax.random.PRNGKey(int(seed) & 0x7FFFFFFF)
    return (setup, species, mcid, cdf_flat, cdf_bucket, cell_rate, key,
            n_rounds, round_split, capacity)


# per-hadron keys of a finalized chunk (sharded over the mesh); everything
# else in the chunk dict is either a psum'd scalar or a replicated table
_HADRON_KEYS = ("keep", "event", "sp_idx", "cell_idx", "mass", "tau", "x",
                "y", "eta", "t", "z", "E", "px", "py", "pz", "rapidity")
# lean finalize emits LRF momenta + ids only (the host collector does the
# lab boost, core/sampler.ChunkCollector._boost_lrf_to_lab)
_HADRON_KEYS_LEAN = ("keep", "event", "sp_idx", "cell_idx", "px",
                     "py", "pz")


def sample_particles_meshed(surf, species_table, chosen_idx, df_data,
                            cfg: Config, laguerre, n_events: int, mesh: Mesh,
                            seed: int | None = None, report=None,
                            chunk_consumer=None, lean: bool = False,
                            mean_kept_1ev: float | None = None):
    """Production op-2 particle-list campaign with the EVENT axis sharded
    over the mesh -- the multi-chip analog of the reference farming N
    sampler processes that each write their own event files
    (scripts/run_multithread_sampling_iS3D.py:18-31, oversample.sh:1-15).

    Each round, every device samples its CONTIGUOUS slice of the round's
    events (independent fold_in streams) and compacts its kept rows to a
    static per-device pad on device; the finalized per-hadron columns come
    back SHARDED over the mesh (out_specs P(("cells", "species"))), so the
    host consumer (StreamingEventWriter / ChunkCollector / ChunkBinner)
    sees one ordinary chunk dict per round covering the contiguous event
    range [ev0, ev0 + n_ev) -- on a real pod each host would device_get
    only its addressable shards and write per-host files, exactly the
    reference's per-process files.

    Pipelined like the single-chip path: with ``mean_kept_1ev`` (the
    driver passes compute_total_yield's per-event mean) the per-device
    compaction pad is sized analytically and EVERY round, including round
    0, dispatches through the bounded in-flight window; without it, round
    0 runs synced and its measured kept count fixes the pad.  Deferred
    validation reruns any round synced on a capacity overflow (>6-sigma
    Poisson fluctuation) or pad overrun on ANY device, with the envelope
    grown.  Returns the summed diagnostics dict (the _SUM_KEYS scalars)."""
    import numpy as np
    from ..core.sampler import _SUM_KEYS

    (setup, species, mcid, cdf_flat, cdf_bucket, cell_rate, key, n_rounds,
     round_split, capacity) = _prepare_meshed_campaign(
        surf, species_table, chosen_idx, df_data, cfg, laguerre, n_events,
        mesh, seed)

    setup_spec = jax.tree_util.tree_map(lambda _: P(), setup)
    species_spec = jax.tree_util.tree_map(lambda _: P(), species)
    AX = ("cells", "species")

    def make_run(capacity, pad):
        out_specs = {}
        for k in (_HADRON_KEYS_LEAN if lean else _HADRON_KEYS):
            out_specs[k] = P(AX)
        cell_tabs = ("cell_tau", "cell_x", "cell_y")
        if lean:
            cell_tabs += ("cell_eta", "cell_ux", "cell_uy", "cell_un")
        for k in _SUM_KEYS + ("overflow", "pad_overrun", "mcid",
                              "mass_tab") + cell_tabs:
            out_specs[k] = P()

        ids16 = n_events <= 65535

        @partial(shard_map, mesh=mesh,
                 in_specs=(setup_spec, species_spec, P(), P(), P(), P(),
                           P(), P(AX), P(AX)),
                 out_specs=out_specs, check_vma=False)
        def run(setup_l, species_l, mcid_l, cdf_flat_l, cdf_bucket_l,
                cell_rate_l, key_l, nev_dev, ev0_dev):
            dev = jax.lax.axis_index("cells") * mesh.shape["species"] \
                + jax.lax.axis_index("species")
            k = jax.random.fold_in(key_l, dev)
            out = _sample_hadrons_jit(setup_l, species_l, mcid_l, cdf_flat_l,
                                      cdf_bucket_l, cell_rate_l, k, cfg,
                                      capacity, nev_dev[0],
                                      species_draw="alias")
            overflow = out["overflow"]
            fin = _finalize_device(out, setup_l, cfg,
                                   pad=pad if pad < capacity else None,
                                   lean=lean)
            # device-local event ids -> global ids of this device's slice
            fin["event"] = fin["event"] + ev0_dev[0]
            if lean and ids16:
                # <= 65535 events: u16 halves the event column's
                # device->host bytes (see sampler._sample_finalize_jit)
                fin["event"] = fin["event"].astype(jnp.uint16)
            fin["overflow"] = jax.lax.psum(
                overflow.astype(jnp.int32), AX)
            fin["pad_overrun"] = jax.lax.psum(
                (out["kept"] > pad).astype(jnp.int32), AX)
            for kk in _SUM_KEYS:
                fin[kk] = jax.lax.psum(jnp.asarray(fin[kk]), AX)
            return fin
        return run

    def run_round_synced(r, run_box):
        """One round, synchronously validated (overflow/overrun retries)."""
        counts, starts, ev0, n_ev = round_split(r)
        kr = jax.random.fold_in(key, r)
        if run_box["run"] is None:  # analytic-pad campaigns build the
            run_box["run"] = make_run(run_box["capacity"],  # safe synced
                                      run_box["pad"])       # program lazily
        while True:
            fin = run_box["run"](setup, species, mcid, cdf_flat, cdf_bucket,
                                 cell_rate, kr, jnp.asarray(counts),
                                 jnp.asarray(starts))
            if int(fin["overflow"]) == 0 and int(fin["pad_overrun"]) == 0:
                break
            run_box["retries"] += 1
            if run_box["retries"] > 8 + n_rounds:
                raise RuntimeError("meshed particle-list sampler envelope "
                                   "overflow persists after retries")
            if int(fin["overflow"]) > 0:
                run_box["capacity"] = int(run_box["capacity"] * 1.5) + 1024
            run_box["pad"] = run_box["capacity"]
            print(f"meshed sampler round {r}: envelope overflow; retrying "
                  f"with capacity {run_box['capacity']} (pad = capacity)",
                  flush=True)
            run_box["run"] = make_run(run_box["capacity"], run_box["pad"])
        fin["ev0"], fin["n_ev"] = ev0, n_ev
        if lean:
            fin.update(_rap_meta(cfg, seed, ev0))
        return fin

    n_dev = mesh.devices.size
    from ..core import sampler as _sampler_mod
    bucket = _sampler_mod._PAD_BUCKET_SMALL

    def bucketed_pad(kept_dev_expect):
        p = int(kept_dev_expect * _sampler_mod._PAD_MARGIN
                + 6.0 * np.sqrt(max(kept_dev_expect, 1.0)) + 1024)
        return min(max(bucket, -(-p // bucket) * bucket), capacity)

    run_box = {"capacity": capacity, "pad": capacity, "run": None,
               "retries": 0}

    diags = None

    def consume(fin):
        nonlocal diags
        if chunk_consumer is not None:
            chunk_consumer(fin)
        d = {kk: int(fin[kk]) if kk in ("drawn", "kept", "dropped", "total")
             else fin[kk] for kk in _SUM_KEYS}
        diags = d if diags is None else \
            {kk: diags[kk] + d[kk] for kk in _SUM_KEYS}

    if mean_kept_1ev is not None:
        # analytic per-device pad: a device samples <= max_ev_dev whole
        # events per round, each with mean kept yield mean_kept_1ev
        max_ev_dev = max(int(round_split(r)[0].max())
                         for r in range(n_rounds))
        pad = bucketed_pad(mean_kept_1ev * max_ev_dev)
        start = 0
    else:
        # round 0 synced with pad = capacity (always safe); its kept count
        # fixes the compaction pad for the pipelined rounds
        run_box["run"] = make_run(capacity, capacity)
        first = run_round_synced(0, run_box)
        pad = bucketed_pad(int(first["kept"]) / max(n_dev, 1))
        consume(first)
        start = 1

    if n_rounds > start:
        import collections
        run_pipe = make_run(run_box["capacity"], pad)
        window = 4
        pending = collections.deque()

        def dispatch(r):
            counts, starts, ev0, n_ev = round_split(r)
            kr = jax.random.fold_in(key, r)
            fin = run_pipe(setup, species, mcid, cdf_flat, cdf_bucket,
                           cell_rate, kr, jnp.asarray(counts),
                           jnp.asarray(starts))
            fin["ev0"], fin["n_ev"] = ev0, n_ev
            if lean:
                fin.update(_rap_meta(cfg, seed, ev0))
            pending.append((r, fin))

        nxt = start
        while nxt < n_rounds and len(pending) < window:
            dispatch(nxt)
            nxt += 1
        while pending:
            r, fin = pending.popleft()
            # deferred validation: rerun the round synced on any device's
            # capacity overflow or pad overrun (pad grows to capacity)
            if int(fin["overflow"]) > 0 or int(fin["pad_overrun"]) > 0:
                run_box["retries"] += 1
                print(f"meshed round {r}: deferred validation failed; "
                      f"rerunning synced", flush=True)
                fin = run_round_synced(r, run_box)
            if nxt < n_rounds:
                dispatch(nxt)
                nxt += 1
            consume(fin)

    if report is not None:
        report.n_cells = surf.n_cells
        report.mom_proposals = int(diags["mom_proposals"])
        report.mom_acceptances = int(diags["mom_acceptances"])
        report.hadrons_drawn = int(diags["drawn"])
        report.hadrons_kept = int(diags["kept"])
        report.dropped_lanes = int(diags["dropped"])
        report.sampler_capacity_retries = run_box["retries"]
        if cfg.df_mode in (3, 4, 5):
            report.record_breakdown(setup.breaks_down, setup.cells.tau,
                                    setup.cells.mask)
    return diags


def sample_histograms_meshed(surf, species_table, chosen_idx, df_data,
                             cfg: Config, laguerre, n_events: int,
                             mesh: Mesh, seed: int | None = None,
                             report=None):
    """Full op-2 test-sampler campaign with the EVENT axis sharded over the
    mesh -- the CLI/driver entry for cfg.use_mesh (the multi-chip analog of
    the reference's process farm, run_multithread_sampling_iS3D.py).

    Events split across devices (remainders via per-device traced event
    counts, so the campaign is exactly n_events); each device runs
    independent fold_in streams; large campaigns run as rounds of one
    device-chunk each.  Histograms and the efficiency/yield diagnostics
    psum over the mesh.  Capacity overflow (a >6-sigma Poisson fluctuation)
    is healed by retrying the round with the capacity grown, like the
    single-chip path (sampler.py).  Returns the histogram dict plus
    diagnostics scalars.
    """
    import dataclasses
    import numpy as np
    from ..core.sampler import prepare_sampler, _cast_f32_jit, _species_alias

    if cfg.df_mode == 5:
        from ..core.sampler_famod import prepare_sampler_famod
        setup, species = prepare_sampler_famod(surf, species_table,
                                               chosen_idx, cfg)
    else:
        setup, species = prepare_sampler(surf, species_table, chosen_idx,
                                         df_data, cfg, laguerre)
    mcid = jnp.asarray(species_table.mc_id[chosen_idx])
    rates64 = setup.rates
    setup = dataclasses.replace(_cast_f32_jit(setup), rates=rates64)
    species = _cast_f32_jit(species)
    cdf_flat, cdf_bucket, cell_rate = _species_alias(setup.rates)

    y_max = cfg.y_cut if cfg.dimension == 2 else 0.5
    f32 = jnp.float32
    mean_1ev = float(jnp.sum(
        cell_rate * (2.0 * y_max * setup.ds_max).astype(f32)))

    n_dev = mesh.devices.size
    # events per device per round: bound the per-device envelope to
    # sampler_chunk_hadrons (the single-chip chunking rule, per device)
    ev_per_dev_round = max(1, int(cfg.sampler_chunk_hadrons
                                  / max(mean_1ev, 1.0)))
    ev_per_round = ev_per_dev_round * n_dev
    n_rounds = -(-n_events // ev_per_round)

    if seed is None:
        seed = cfg.sampler_seed if cfg.sampler_seed >= 0 \
            else np.random.SeedSequence().entropy
    key = jax.random.PRNGKey(int(seed) & 0x7FFFFFFF)

    S = species.mass.shape[0]
    setup_spec = jax.tree_util.tree_map(lambda _: P(), setup)
    species_spec = jax.tree_util.tree_map(lambda _: P(), species)

    def make_run(capacity):
        @partial(shard_map, mesh=mesh,
                 in_specs=(setup_spec, species_spec, P(), P(), P(), P(),
                           P(), P(("cells", "species"))),
                 out_specs=P(), check_vma=False)
        def run(setup_l, species_l, mcid_l, cdf_flat_l, cdf_bucket_l,
                cell_rate_l, key_l, n_ev_dev):
            dev = jax.lax.axis_index("cells") * mesh.shape["species"] \
                + jax.lax.axis_index("species")
            k = jax.random.fold_in(key_l, dev)
            out = _sample_hadrons_jit(setup_l, species_l, mcid_l, cdf_flat_l,
                                      cdf_bucket_l, cell_rate_l, k, cfg,
                                      capacity, n_ev_dev[0],
                                      species_draw="alias")
            out = _finalize_device(out, setup_l, cfg)
            hists = bin_histograms_device(out, S, cfg)
            hists["_overflow"] = out["overflow"].astype(jnp.int32)
            for kk in ("drawn", "kept", "dropped", "mom_proposals",
                       "mom_acceptances", "total"):
                hists["_" + kk] = jnp.asarray(out[kk])
            return jax.tree_util.tree_map(
                lambda h: jax.lax.psum(h, ("cells", "species")), hists)
        return run

    def round_counts(r):
        ev0 = r * ev_per_round
        n_ev = min(ev_per_round, n_events - ev0)
        base = n_ev // n_dev
        counts = np.full(n_dev, base, np.int32)
        counts[: n_ev - base * n_dev] += 1
        return counts

    max_ev_dev = max(int(round_counts(r).max()) for r in range(n_rounds))
    m = mean_1ev * max_ev_dev
    capacity = int(m * 1.2 + 6.0 * np.sqrt(max(m, 1.0)) + 1024)

    acc = None
    run = make_run(capacity)
    for r in range(n_rounds):
        counts = jnp.asarray(round_counts(r))
        kr = jax.random.fold_in(key, r)
        h = run(setup, species, mcid, cdf_flat, cdf_bucket, cell_rate,
                kr, counts)
        retries = 0
        while int(h["_overflow"]) > 0:
            retries += 1
            if retries > 8:
                raise RuntimeError("meshed sampler capacity overflow "
                                   "persists after 8 retries")
            capacity = int(capacity * 1.5) + 1024
            print(f"meshed sampler round {r}: capacity overflow; retrying "
                  f"with capacity {capacity}", flush=True)
            run = make_run(capacity)
            h = run(setup, species, mcid, cdf_flat, cdf_bucket, cell_rate,
                    kr, counts)
        h.pop("_overflow")
        acc = h if acc is None else jax.tree_util.tree_map(jnp.add, acc, h)

    diags = {k[1:]: int(acc.pop(k)) for k in list(acc)
             if k.startswith("_")}
    if report is not None:
        report.n_cells = surf.n_cells
        report.mom_proposals = diags["mom_proposals"]
        report.mom_acceptances = diags["mom_acceptances"]
        report.hadrons_drawn = diags["drawn"]
        report.hadrons_kept = diags["kept"]
        report.dropped_lanes = diags["dropped"]
    hists = {k: np.asarray(v) for k, v in acc.items()}
    return hists, diags
