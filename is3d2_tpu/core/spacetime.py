"""Spacetime distributions dN/dX (operation 0).

Replaces calculate_dN_dX / calculate_dN_dX_feqmod
(SpacetimeDistribution.cpp:31-1250): the full momentum-space Cooper-Frye
integral of each freezeout cell is contracted against the (pT, phi) quadrature
weights to give dN/dy per cell, which is then binned by the cell's
(tau, r, phi_s) position into dN/(tau dtau dy), dN/(2pi r dr dy), dN/(dphi dy).

The per-cell momentum integral reuses the same weighted-integrand builders as
the momentum spectra; the binning is a segment-sum over cells.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io.pdg import SpeciesTable
from ..io.tables import GaussLaguerre, MomentumGrids
from ..physics.deltaf import DeltafData
from .cells import CellArrays, prepare_cells
from .spectra import (PREFACTOR, MomentumGridDevice, SpeciesArrays,
                      df12_cell_coefficients, df12_weighted_value)
from .feqmod import prepare_feqmod
from .spectra_feqmod import feqmod_weighted_value


@dataclasses.dataclass
class SpacetimeDistributions:
    """Binned dN/dX per chosen species (before binwidth normalization)."""

    tau_mid: np.ndarray
    r_mid: np.ndarray
    phi_mid: np.ndarray
    dN_taudtaudy: np.ndarray   # (S, tau_bins) raw bin sums
    dN_twopirdrdy: np.ndarray  # (S, r_bins)
    dN_dphidy: np.ndarray      # (S, phi_bins)

    def normalized(self, cfg: Config):
        """Apply the reference's binwidth/jacobian normalization
        (SpacetimeDistribution.cpp:449-490)."""
        tau_w = (cfg.tau_max - cfg.tau_min) / cfg.tau_bins
        r_w = (cfg.r_max - cfg.r_min) / cfg.r_bins
        phi_w = 2.0 * np.pi / cfg.phip_bins
        return (
            self.dN_taudtaudy / (self.tau_mid[None, :] * tau_w),
            self.dN_twopirdrdy / (2.0 * np.pi * self.r_mid[None, :] * r_w),
            self.dN_dphidy / phi_w,
        )


def _bin_indices(cells: CellArrays, cfg: Config):
    """(tau, r, phi_s) bin index per cell (SpacetimeDistribution.cpp:413-421)."""
    tau_w = (cfg.tau_max - cfg.tau_min) / cfg.tau_bins
    r_w = (cfg.r_max - cfg.r_min) / cfg.r_bins
    phi_w = 2.0 * np.pi / cfg.phip_bins

    r = jnp.sqrt(cells.x**2 + cells.y_pos**2)
    phi = jnp.arctan2(cells.y_pos, cells.x)
    phi = jnp.where(phi < 0.0, phi + 2.0 * np.pi, phi)

    itau = jnp.floor((cells.tau - cfg.tau_min) / tau_w).astype(jnp.int32)
    ir = jnp.floor((r - cfg.r_min) / r_w).astype(jnp.int32)
    iphi = jnp.floor(phi / phi_w).astype(jnp.int32)
    return itau, ir, iphi


def _scatter(dN_cell, idx, n_bins, mask):
    """Sum per-cell dN/dy into bins; out-of-range cells are dropped
    (matching the reference's if-in-range adds)."""
    ok = (idx >= 0) & (idx < n_bins) & (mask > 0.0)
    idx_safe = jnp.clip(idx, 0, n_bins - 1)
    w = jnp.where(ok, 1.0, 0.0)
    # dN_cell: (c, S) -> (S, n_bins); accumulate bins in f64 (the fast path
    # hands f32 per-cell values; cross-cell sums keep the input's relative
    # accuracy when accumulated at higher precision)
    acc_dtype = jnp.float64 if jax.config.jax_enable_x64 else dN_cell.dtype
    out = jnp.zeros((dN_cell.shape[1], n_bins), dtype=acc_dtype)
    contrib = dN_cell.astype(acc_dtype) * w[:, None].astype(acc_dtype)
    return out.at[:, idx_safe].add(contrib.T, unique_indices=False)


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "kind"))
def _dN_dX_jit(cells: CellArrays, aux, species: SpeciesArrays,
               grid: MomentumGridDevice, cfg: Config, n_blocks: int,
               kind: str):
    S_count = species.mass.shape[0]
    blk = cells.n_padded // n_blocks

    w_pf = (grid.pT_weight[:, None] * grid.phi_weight[None, :])[None, None, :, :, None, None]

    def take(a, i):
        return jax.lax.dynamic_slice_in_dim(a, i * blk, blk, axis=0)

    itau, ir, iphi = _bin_indices(cells, cfg)

    def body(acc, i):
        cb = jax.tree_util.tree_map(lambda a: take(a, i), cells)
        if kind == "df12":
            ab = {k: take(v, i, ) for k, v in aux.items()}
            value = df12_weighted_value(cb, ab, species, grid, cfg)
        else:
            fb = jax.tree_util.tree_map(lambda a: take(a, i), aux)
            value = feqmod_weighted_value(cb, fb, species, grid, cfg,
                                          dan_weighted=True)
        # dN/dy per cell: reduce over (p, f, y, e) with (pT, phi) weights
        dN_cell = PREFACTOR * species.degeneracy[None, :] \
            * jnp.sum(w_pf * value, axis=(2, 3, 4, 5))        # (c, S)

        acc_tau, acc_r, acc_phi = acc
        acc_tau = acc_tau + _scatter(dN_cell, take(itau, i), cfg.tau_bins, cb.mask)
        acc_r = acc_r + _scatter(dN_cell, take(ir, i), cfg.r_bins, cb.mask)
        acc_phi = acc_phi + _scatter(dN_cell, take(iphi, i), cfg.phip_bins, cb.mask)
        return (acc_tau, acc_r, acc_phi), None

    acc0 = (jnp.zeros((S_count, cfg.tau_bins)),
            jnp.zeros((S_count, cfg.r_bins)),
            jnp.zeros((S_count, cfg.phip_bins)))
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_blocks))
    return acc


@partial(jax.jit, static_argnames=("cfg",))
def _scatter_dN_jit(dN_cell, cells: CellArrays, cfg: Config):
    """Scatter (C, S) per-cell dN/dy into the (tau, r, phi_s) bins."""
    itau, ir, iphi = _bin_indices(cells, cfg)
    return (_scatter(dN_cell, itau, cfg.tau_bins, cells.mask),
            _scatter(dN_cell, ir, cfg.r_bins, cells.mask),
            _scatter(dN_cell, iphi, cfg.phip_bins, cells.mask))


def compute_dN_dX(surf, species_table: SpeciesTable, chosen_idx: np.ndarray,
                  grids: MomentumGrids, df_data: DeltafData, cfg: Config,
                  laguerre: GaussLaguerre | None = None,
                  cell_block: int | None = None,
                  report=None) -> SpacetimeDistributions:
    cfg.validate()
    if cfg.df_mode == 5:
        raise ValueError("no spacetime distribution routine for famod "
                         "(matches the reference, EmissionFunction.cpp:1184-1189)")
    block = cell_block or cfg.cell_block
    cells = prepare_cells(surf, cfg, block=block)
    n_blocks = max(cells.n_padded // min(block, cells.n_padded), 1)
    if report is not None:
        report.n_cells = surf.n_cells
        report.skipped_cells = surf.n_cells - int(np.asarray(cells.mask).sum())

    species = SpeciesArrays.from_table(species_table, chosen_idx)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    from ..parallel.sharding import auto_mesh
    mesh = auto_mesh(cfg)

    fast = cfg.compute_dtype in ("f32", "f32c") and cfg.dimension == 2
    if cfg.df_mode in (1, 2):
        aux = df12_dX_cell_coefficients(cells, df_data, cfg)
        if fast and mesh is not None:
            from ..parallel.sharding import sharded_dN_dX_fast
            acc = sharded_dN_dX_fast(cells, aux, species, grid, cfg, mesh, block=block)
        elif fast:
            from .spectra_fast import compute_dN_dy_cells_fast
            S = species.mass.shape[0]
            n_sp = next(b for b in (8, 4, 2, 1) if S % b == 0)
            dN_cell = compute_dN_dy_cells_fast(cells, aux, species, grid,
                                               cfg, n_blocks,
                                               n_species_blocks=n_sp)
            acc = _scatter_dN_jit(dN_cell, cells, cfg)
        elif mesh is not None:
            from ..parallel.sharding import sharded_dN_dX
            acc = sharded_dN_dX(cells, aux, species, grid, cfg, mesh, block=block)
        else:
            acc = _dN_dX_jit(cells, aux, species, grid, cfg, n_blocks, "df12")
    else:
        fq = prepare_feqmod(cells, species, df_data, cfg, laguerre)
        if report is not None:
            report.record_breakdown(fq.breaks_down, cells.tau, cells.mask)
        if fast and mesh is not None:
            from ..parallel.sharding import sharded_dN_dX_fast
            acc = sharded_dN_dX_fast(cells, fq, species, grid, cfg, mesh, block=block)
        elif fast:
            from .spectra_feqmod_fast import compute_dN_dy_cells_feqmod_fast
            dN_cell = compute_dN_dy_cells_feqmod_fast(cells, fq, species,
                                                      grid, cfg, n_blocks)
            acc = _scatter_dN_jit(dN_cell, cells, cfg)
        elif mesh is not None:
            from ..parallel.sharding import sharded_dN_dX
            acc = sharded_dN_dX(cells, fq, species, grid, cfg, mesh, block=block)
        else:
            acc = _dN_dX_jit(cells, fq, species, grid, cfg, n_blocks, "feqmod")

    tau_w = (cfg.tau_max - cfg.tau_min) / cfg.tau_bins
    r_w = (cfg.r_max - cfg.r_min) / cfg.r_bins
    phi_w = 2.0 * np.pi / cfg.phip_bins
    return SpacetimeDistributions(
        tau_mid=cfg.tau_min + tau_w * (np.arange(cfg.tau_bins) + 0.5),
        r_mid=cfg.r_min + r_w * (np.arange(cfg.r_bins) + 0.5),
        phi_mid=phi_w * (np.arange(cfg.phip_bins) + 0.5),
        dN_taudtaudy=np.asarray(acc[0]),
        dN_twopirdrdy=np.asarray(acc[1]),
        dN_dphidy=np.asarray(acc[2]),
    )


def df12_dX_cell_coefficients(cells: CellArrays, df_data: DeltafData,
                              cfg: Config) -> dict:
    """Per-cell coefficient columns for dN/dX df 1/2.

    NOTE: the reference's dN_dX uses a slightly different Grad-14 arrangement
    than its momentum spectra: shear_coeff = 0.5/(T^2 (E+P)) and the bulk
    coefficients multiply bulkPi at the end (SpacetimeDistribution.cpp:287-309,
    366-374) — algebraically identical to the spectra arrangement, and our
    shared integrand already folds bulkPi into bulk0..2, so we reuse it.
    """
    return df12_cell_coefficients(cells, df_data, cfg)
