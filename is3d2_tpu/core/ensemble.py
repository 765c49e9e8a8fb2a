"""Batched multi-surface (event-ensemble) processing.

The BASELINE stretch config runs 1000 hydro surfaces through spectra +
sampling.  The reference can only loop whole binaries
(scripts/oversample.sh:1-15, run_multithread_sampling_iS3D.py:18-31); here
surfaces are padded to a common cell count, stacked on a leading axis, and
the engines are vmapped over it.  The surface axis can additionally be
sharded across devices (the DCN axis between slices at fleet scale,
ICI within a slice) with the cell axis inside each shard:
``mesh=`` runs the batch under shard_map with out-specs sharded over
"surfaces", so each device computes only its surface shard.

Covers all df modes 1-5 for spectra (per-surface feqmod/famod prep --
splines, 3x3 inverses, VAH Newton state -- stacked on device) and the full
MC sampler (including the famod sampler) with per-surface RNG streams and
per-surface test histograms.  Overflowed surfaces are healed in place by a
single-surface re-run at the exact grown capacity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..config import Config
from ..io.pdg import SpeciesTable
from ..io.tables import GaussLaguerre, MomentumGrids
from ..physics.deltaf import DeltafData, compute_particle_densities
from .cells import CellArrays, prepare_cells
from .feqmod import prepare_feqmod
from .sampler import (prepare_sampler, _finalize_device,
                      _sample_hadrons_jit, _species_cdf)
from .sampler_famod import prepare_sampler_famod
from .sampler_hist import bin_histograms_device
from .spectra import (MomentumGridDevice, SpeciesArrays,
                      df12_cell_coefficients, _spectra_df12_jit)
from .spectra_famod import (prepare_famod, vah_from_surface,
                            _spectra_famod_jit)
from .spectra_feqmod import _spectra_feqmod_jit


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _pad_cells_to(c: CellArrays, n_max: int) -> CellArrays:
    pad = n_max - c.n_padded
    if pad == 0:
        return c
    safe = {"T": 0.15, "P": 0.08, "E": 0.25, "tau": 1.0, "ut": 1.0}
    fields = {}
    for f in dataclasses.fields(c):
        fill = safe.get(f.name, 0.0)
        fields[f.name] = jnp.pad(getattr(c, f.name), (0, pad),
                                 constant_values=fill)
    return CellArrays(**fields)


def stack_surfaces(surfs, cfg: Config, block: int,
                   n_cells_pad: int | None = None):
    """Pad every surface to the max padded cell count; returns the stacked
    CellArrays plus the per-surface padded ones (for per-surface prep).

    ``n_cells_pad`` raises the common cell count to at least that value, so
    chunked ensembles (every chunk padded to the GLOBAL max) reuse one
    compiled program across chunks."""
    all_cells = [prepare_cells(s, cfg, block=block) for s in surfs]
    n_max = max(c.n_padded for c in all_cells)
    if n_cells_pad is not None:
        n_max = max(n_max, n_cells_pad)
    padded = [_pad_cells_to(c, n_max) for c in all_cells]
    return _stack(padded), padded


def _chunk_plan(surfs, surface_chunk, cfg: Config, block: int,
                mesh: Mesh | None):
    """Split ``surfs`` into fixed-size chunks of ``surface_chunk`` (the last
    chunk padded by repeating its final surface, dropped from the results)
    and the global padded cell count every chunk pads to.  Returns
    (chunks, n_real_per_chunk, n_cells_pad)."""
    if mesh is not None and surface_chunk % mesh.devices.size != 0:
        raise ValueError(
            f"surface_chunk={surface_chunk} must be a multiple of the mesh "
            f"device count {mesh.devices.size}")
    # prepare_cells pads to ceil(n/block)*block (cells.py:113); computing
    # that arithmetically avoids running the full host prep over every
    # surface twice (once for the plan, once per chunk) at ensemble scale
    n_cells_pad = max(-(-s.n_cells // block) * block for s in surfs)
    chunks, n_real = [], []
    for i in range(0, len(surfs), surface_chunk):
        chunk = list(surfs[i:i + surface_chunk])
        n_real.append(len(chunk))
        chunk.extend(chunk[-1:] * (surface_chunk - len(chunk)))
        chunks.append(chunk)
    return chunks, n_real, n_cells_pad


def compute_spectra_ensemble(surfs, species_table: SpeciesTable, chosen_idx,
                             grids: MomentumGrids, df_data: DeltafData,
                             cfg: Config, laguerre: GaussLaguerre | None = None,
                             cell_block: int | None = None,
                             mesh: Mesh | None = None,
                             surface_chunk: int | None = None,
                             _n_cells_pad: int | None = None) -> np.ndarray:
    """Continuous spectra for a list of surfaces at once, df modes 1-4.

    Returns (n_surfaces, S, NpT, Nphi, Ny).  With ``mesh`` (a 1-axis
    "surfaces" mesh), the surface axis is sharded across devices; n_surfaces
    must be divisible by the device count.

    ``surface_chunk`` bounds device memory for big ensembles (the BASELINE
    stretch config is 1000 surfaces; the reference just loops whole
    binaries, scripts/oversample.sh:1-15): surfaces are processed K at a
    time, each chunk padded to the global cell count (ONE compiled program
    serves every chunk) with results streamed to host between chunks.
    Device memory is then bounded by K surfaces regardless of ensemble
    size.  With ``mesh``, K must be a multiple of the device count.
    """
    block = cell_block or cfg.cell_block
    if surface_chunk is not None and surface_chunk < len(surfs):
        chunks, n_real, n_pad = _chunk_plan(surfs, surface_chunk, cfg, block,
                                            mesh)
        return np.concatenate([
            compute_spectra_ensemble(ch, species_table, chosen_idx, grids,
                                     df_data, cfg, laguerre, cell_block,
                                     mesh, None, n_pad)[:k]
            for ch, k in zip(chunks, n_real)], axis=0)
    if cfg.df_mode == 5:
        # famod reads the shear tensor and bulk pressure unconditionally
        # (pl/pt reconstruction, MomentumSpectra.cpp:1192-1204)
        cells_cfg = dataclasses.replace(cfg, include_shear_deltaf=1,
                                        include_bulk_deltaf=1)
    else:
        cells_cfg = cfg
    cells, per_surf = stack_surfaces(surfs, cells_cfg, block, _n_cells_pad)
    n_padded = cells.tau.shape[1]
    n_blocks = max(n_padded // min(block, n_padded), 1)

    species = SpeciesArrays.from_table(species_table, chosen_idx)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    if cfg.df_mode in (1, 2):
        aux = _stack([df12_cell_coefficients(c, df_data, cfg)
                      for c in per_surf])
        # the folded symmetric eta quadrature is exact per surface, and the
        # gate reduction works on the stacked (K, C) leaves directly
        from .spectra_fast import fold_eta_quadrature
        cells, grid, _ = fold_eta_quadrature(cells, grid, cfg)
        if cfg.compute_dtype == "f32" and cfg.dimension == 2:
            # MXU-structured fast kernel per surface (momentum matrix
            # shared across the vmap): the broadcast kernel's fused 6-d
            # elementwise chain stops fusing under vmap at full-HRG
            # chunk scale (measured: a 171 GB intermediate OOM at 16
            # surfaces x 4096 cells x 493 species), while the fast
            # kernel's block scan bounds the live set per surface
            from .spectra import PREFACTOR
            from .spectra_fast import (_cell_Q, momentum_matrix,
                                       _spectra_fast_jit)
            mom = momentum_matrix(species, grid, jnp.float32)
            eta32 = grid.eta.astype(jnp.float32)
            eta_w = grid.eta_weight.astype(jnp.float64)
            # bound the per-surface (block x M) working set: the vmap
            # multiplies it by the chunk width
            fast_blk = min(block, 512, n_padded)
            nb = max(n_padded // fast_blk, 1)
            NpT = grid.pT.shape[0]
            Nphi = grid.cos_phi.shape[0]
            S_n = species.mass.shape[0]
            deg = species.degeneracy.astype(jnp.float64)

            def kernel(c, a):
                per_cell = _cell_Q(c, a, jnp.float32)
                flat = _spectra_fast_jit(per_cell, mom, eta32, eta_w, cfg,
                                         nb, 1, "float64")
                out = flat.reshape(S_n, NpT, Nphi, 1)
                return PREFACTOR * deg[:, None, None, None] * out
        else:
            kernel = lambda c, a: _spectra_df12_jit(c, a, species, grid,
                                                    cfg, n_blocks)
    elif cfg.df_mode == 5:
        # per-surface VAH state (Newton reconstruction or the surface's own
        # (Lambda, aT, aL) columns), stacked like the feqmod prep -- the
        # reference loops whole df-5 binaries (scripts/oversample.sh:1-15)
        aux = _stack([prepare_famod(c, species_table, cfg,
                                    vah_from_surface(s, c.n_padded))
                      for s, c in zip(surfs, per_surf)])
        kernel = lambda c, a: _spectra_famod_jit(c, a, species, grid, cfg,
                                                 n_blocks)
    else:
        # per-surface feqmod prep on the host (splines, 3x3 inverses,
        # renormalization integrals), stacked on device
        aux = _stack([prepare_feqmod(c, species, df_data, cfg, laguerre)
                      for c in per_surf])
        kernel = lambda c, a: _spectra_feqmod_jit(c, a, species, grid, cfg,
                                                  n_blocks)

    if mesh is None:
        out = jax.vmap(kernel)(cells, aux)
        return np.asarray(out)

    axis = mesh.axis_names[0]
    specs = (jax.tree_util.tree_map(lambda _: P(axis), cells),
             jax.tree_util.tree_map(lambda _: P(axis), aux))

    @partial(shard_map, mesh=mesh, in_specs=specs, out_specs=P(axis),
             check_vma=False)
    def run(cells_l, aux_l):
        return jax.vmap(kernel)(cells_l, aux_l)

    return np.asarray(run(cells, aux))


def prepare_sampler_ensemble(surfs, species_table: SpeciesTable, chosen_idx,
                             df_data: DeltafData, cfg: Config,
                             laguerre: GaussLaguerre,
                             cell_block: int | None = None,
                             n_cells_pad: int | None = None):
    """Per-surface sampler prep (each surface gets its own thermo-averaged
    fast-mode densities, as each reference run would), stacked on the
    leading surface axis."""
    block = cell_block or cfg.cell_block
    # arithmetic n_padded (= ceil(n/block)*block, cells.py:113): running
    # prepare_cells here just to learn the pad would double the host prep
    n_max = max(-(-s.n_cells // block) * block for s in surfs)
    if n_cells_pad is not None:
        n_max = max(n_max, n_cells_pad)

    setups = []
    species = None
    for s in surfs:
        if cfg.df_mode == 5:
            # famod sampler prep: per-surface VAH state + anisotropic
            # densities (ParticleSampler.cpp:1138-1513)
            setup, species = prepare_sampler_famod(s, species_table,
                                                   chosen_idx, cfg,
                                                   block=n_max)
        else:
            if cfg.fast:
                compute_particle_densities(species_table, df_data, laguerre,
                                           s.thermo_averages())
            setup, species = prepare_sampler(s, species_table, chosen_idx,
                                             df_data, cfg, laguerre,
                                             block=n_max)
        setups.append(setup)
    return _stack(setups), species


def sample_ensemble_particle_lists(surfs, species_table: SpeciesTable,
                                   chosen_idx, df_data: DeltafData,
                                   cfg: Config, laguerre: GaussLaguerre,
                                   events_per_surface: int, capacity: int,
                                   results_root, seed: int = 1,
                                   cell_block: int | None = None,
                                   mesh: Mesh | None = None,
                                   surface_chunk: int | None = None,
                                   oscar: bool = True, csv: bool = False,
                                   _surf_offset: int = 0,
                                   _n_cells_pad: int | None = None):
    """MC-sample every surface and write PER-SURFACE particle-list event
    files -- the production output of the reference's multi-surface
    campaign, where each looped binary writes its own OSCAR lists into its
    own sandbox (scripts/oversample.sh:7-13, run_multithread_sampling_iS3D
    .py:18-31, EmissionFunction.cpp:1279-1291).  Surface ``i`` writes
    ``results_root/surface_<i>/particle_list_osc_<ev>.dat`` for events
    0..events_per_surface-1, via the same StreamingEventWriter as the
    single-surface op-2 path.

    Batched on device exactly like sample_ensemble_histograms (vmapped
    sampler + lean finalize, fold_in'd per-surface RNG streams keyed by the
    GLOBAL surface index, optional ``mesh`` sharding of the surface axis,
    ``surface_chunk`` memory bounding, single-surface overflow healing);
    each chunk's batched kept rows transfer host-side in ONE device_get and
    are sliced per surface for the writers.

    Returns a list of per-surface dicts
    ``{"dir", "rows_written", "events_written", "kept"}``.
    """
    from pathlib import Path

    from ..io.output import StreamingEventWriter

    results_root = Path(results_root)
    if surface_chunk is not None and surface_chunk < len(surfs):
        block = cell_block or cfg.cell_block
        chunks, n_real, n_pad = _chunk_plan(surfs, surface_chunk, cfg, block,
                                            mesh)
        stats = []
        for ci, (ch, k) in enumerate(zip(chunks, n_real)):
            stats.extend(sample_ensemble_particle_lists(
                ch, species_table, chosen_idx, df_data, cfg, laguerre,
                events_per_surface, capacity, results_root, seed, cell_block,
                mesh, None, oscar, csv,
                _surf_offset + ci * surface_chunk, n_pad)[:k])
        return stats

    setups, species = prepare_sampler_ensemble(surfs, species_table,
                                               chosen_idx, df_data, cfg,
                                               laguerre, cell_block,
                                               _n_cells_pad)
    mcid = jnp.asarray(species_table.mc_id[np.asarray(chosen_idx)])
    n_surf = len(surfs)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
                    )(_surf_offset + jnp.arange(n_surf))

    f32 = jnp.float32

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(f32)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, tree)

    rates64 = setups.rates
    setups = dataclasses.replace(cast(setups), rates=rates64)
    species = cast(species)

    # the per-surface fields the StreamingEventWriter/ChunkCollector
    # consumes (lean finalize layout: LRF momenta + ids; the collector
    # boosts to the lab on the host, ChunkCollector._boost_lrf_to_lab)
    _FIELDS = ("keep", "event", "sp_idx", "cell_idx", "px", "py",
               "pz", "mcid", "mass_tab", "cell_tau", "cell_x", "cell_y",
               "cell_eta", "cell_ux", "cell_uy", "cell_un",
               "kept", "overflow", "total")

    def one(setup, key, cap):
        cdf_flat, cdf_bucket, cell_rate = _species_cdf(setup.rates)
        out = _sample_hadrons_jit(setup, species, mcid, cdf_flat, cdf_bucket,
                                  cell_rate, key, cfg, cap,
                                  events_per_surface)
        fin = _finalize_device(out, setup, cfg, lean=True)
        return {k: fin[k] for k in _FIELDS}

    batch = lambda s_l, k_l: jax.vmap(lambda s, k: one(s, k, capacity)
                                      )(s_l, k_l)
    if mesh is None:
        fins = batch(setups, keys)
    else:
        axis = mesh.axis_names[0]
        specs = (jax.tree_util.tree_map(lambda _: P(axis), setups), P(axis))
        run = partial(shard_map, mesh=mesh, in_specs=specs,
                      out_specs=P(axis), check_vma=False)(batch)
        fins = run(setups, keys)

    # ONE bulk transfer per chunk (eager per-surface device slicing would
    # pay a tunnel round trip per leaf per surface)
    host = jax.device_get(fins)

    def write_surface(i, part, kept_i):
        writer = StreamingEventWriter(
            results_root / f"surface_{_surf_offset + i}", oscar=oscar,
            csv=csv)
        from .sampler import _rap_meta
        chunk = dict(part)
        chunk["ev0"], chunk["n_ev"] = 0, events_per_surface
        chunk.update(_rap_meta(cfg, seed, _surf_offset + i))
        writer(chunk)
        return {"dir": str(writer.results_dir),
                "rows_written": writer.rows_written,
                "events_written": writer.events_written,
                "kept": kept_i}

    stats = []
    overflow = np.asarray(host["overflow"])
    for i in range(n_surf):
        if overflow[i]:
            # heal by re-running this surface singly at its exact grown
            # Poisson total (the counts depend only on key and rates)
            total = int(host["total"][i])
            cap = total + max(total // 64, 1024)
            cap = 1 << (cap - 1).bit_length()
            setup_i = jax.tree_util.tree_map(lambda a: a[i], setups)
            fin_i = one(setup_i, keys[i], cap)
            part = jax.device_get(fin_i)
            if bool(part["overflow"]):
                raise RuntimeError(
                    f"ensemble surface {i} still overflows at capacity "
                    f"{cap} (total {total})")
        else:
            part = {k: host[k][i] for k in _FIELDS}
        stats.append(write_surface(i, part, int(part["kept"])))
    return stats


def sample_ensemble_histograms(surfs, species_table: SpeciesTable, chosen_idx,
                               df_data: DeltafData, cfg: Config,
                               laguerre: GaussLaguerre,
                               events_per_surface: int, capacity: int,
                               seed: int = 1,
                               cell_block: int | None = None,
                               mesh: Mesh | None = None,
                               surface_chunk: int | None = None,
                               _surf_offset: int = 0,
                               _n_cells_pad: int | None = None):
    """MC-sample every surface (independent fold_in'd RNG streams) and bin
    per-surface test histograms -- the whole oversampling campaign of
    scripts/oversample.sh as ONE device program.

    Returns (histogram dict with leading surface axis, overflow flags).
    With ``mesh``, the surface axis is sharded across the devices.

    ``surface_chunk`` bounds device memory (see compute_spectra_ensemble):
    K surfaces sample at a time, every chunk padded to the global cell
    count so one compiled program serves all chunks, histograms streamed to
    host between chunks.  Each surface's RNG stream is fold_in'd with its
    GLOBAL index, so results are bitwise independent of the chunking.
    """
    if surface_chunk is not None and surface_chunk < len(surfs):
        block = cell_block or cfg.cell_block
        chunks, n_real, n_pad = _chunk_plan(surfs, surface_chunk, cfg, block,
                                            mesh)
        hists_l, overflow_l = [], []
        for ci, (ch, k) in enumerate(zip(chunks, n_real)):
            h, ov = sample_ensemble_histograms(
                ch, species_table, chosen_idx, df_data, cfg, laguerre,
                events_per_surface, capacity, seed, cell_block, mesh,
                None, _surf_offset + ci * surface_chunk, n_pad)
            hists_l.append(jax.tree_util.tree_map(lambda a: a[:k], h))
            overflow_l.append(ov[:k])
        hists = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *hists_l)
        return hists, np.concatenate(overflow_l, axis=0)
    setups, species = prepare_sampler_ensemble(surfs, species_table,
                                               chosen_idx, df_data, cfg,
                                               laguerre, cell_block,
                                               _n_cells_pad)
    mcid = jnp.asarray(species_table.mc_id[np.asarray(chosen_idx)])
    S = len(chosen_idx)
    n_surf = len(surfs)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
                    )(_surf_offset + jnp.arange(n_surf))

    f32 = jnp.float32

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(f32)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, tree)

    rates64 = setups.rates
    setups = dataclasses.replace(cast(setups), rates=rates64)
    species = cast(species)

    def one(setup, key, cap):
        cdf_flat, cdf_bucket, cell_rate = _species_cdf(setup.rates)
        out = _sample_hadrons_jit(setup, species, mcid, cdf_flat, cdf_bucket,
                                  cell_rate, key, cfg, cap,
                                  events_per_surface)
        out = _finalize_device(out, setup, cfg)
        hists = bin_histograms_device(out, S, cfg)
        return hists, out["overflow"], out["total"]

    batch = lambda s_l, k_l: jax.vmap(lambda s, k: one(s, k, capacity)
                                      )(s_l, k_l)
    if mesh is None:
        hists, overflow, totals = batch(setups, keys)
    else:
        axis = mesh.axis_names[0]
        specs = (jax.tree_util.tree_map(lambda _: P(axis), setups), P(axis))

        @partial(shard_map, mesh=mesh, in_specs=specs,
                 out_specs=(P(axis), P(axis), P(axis)), check_vma=False)
        def run(setups_l, keys_l):
            return batch(setups_l, keys_l)

        hists, overflow, totals = run(setups, keys)

    overflow = np.asarray(overflow)
    if overflow.any():
        # heal overflowed surfaces by re-running them singly with the
        # capacity grown to their exact Poisson total (known from the failed
        # attempt: counts depend only on key and rates) -- the
        # single-surface retry semantics of sample_particles
        # (ParticleSampler.cpp:925-931 never loses hadrons either).
        # Capacity is bucketed to limit distinct compile shapes.
        totals = np.asarray(totals)
        hists = jax.tree_util.tree_map(np.array, hists)  # writable copies
        for i in np.flatnonzero(overflow):
            total = int(totals[i])
            cap = total + max(total // 64, 1024)
            cap = 1 << (cap - 1).bit_length()
            setup_i = jax.tree_util.tree_map(lambda a: a[i], setups)
            h, ov, _ = one(setup_i, keys[i], cap)
            if bool(ov):
                raise RuntimeError(
                    f"ensemble surface {i} still overflows at capacity "
                    f"{cap} (total {total})")
            for k in hists:
                hists[k][i] = np.asarray(h[k])
        overflow = np.zeros_like(overflow)
    return hists, overflow
