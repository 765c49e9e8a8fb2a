"""Thermal-vorticity spin polarization S^mu(p) (surface mode 5).

Replaces calculate_spin_polzn (Polarization.cpp:25-263): the Cooper-Frye
weighted polarization vector

    S_mu(p) ~ -(1/8m) (1 - sign f0) 2 (wbar wedge p)_mu

accumulated per (species, pT, phi, y) together with its normalization
Sum p.dsigma f0.  The temperature is the surface-averaged one (the reference
uses Plasma::temperature), and cells with u.dsigma <= 0 are NOT skipped.

Note: the reference indexes the vorticity arrays with the chunk-local cell
index (Polarization.cpp:131-136, wtx_fo[icell] instead of icell_glb), which
reads the wrong cells for surfaces larger than its 10000-cell chunk; we index
globally (identical for < 10000 cells).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io.pdg import SpeciesTable
from ..io.surface import ThermoAverages
from ..io.tables import MomentumGrids
from .cells import CellArrays, prepare_cells
from .spectra import MomentumGridDevice, SpeciesArrays


def _cell_block_polzn(c: CellArrays, species: SpeciesArrays,
                      grid: MomentumGridDevice, T: float, cfg: Config,
                      delta_eta: float):
    def C(a):
        return a[:, None, None, None, None, None]

    def S(a):
        return a[None, :, None, None, None, None]

    tau2 = c.tau * c.tau
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)
    mT6 = mT[None, :, :, None, None, None]
    px = (grid.pT[:, None] * grid.cos_phi[None, :])[None, None, :, :, None, None]
    py = (grid.pT[:, None] * grid.sin_phi[None, :])[None, None, :, :, None, None]

    if cfg.dimension == 2:
        delta = -grid.eta[None, :]
        d6 = jnp.broadcast_to(delta, (c.tau.shape[0], delta.shape[1]))[:, None, None, None, None, :]
        # delta_eta_weight = eta_weight * delta_eta (Polarization.cpp:68)
        w_eta = (grid.eta_weight * delta_eta)[None, None, None, None, None, :]
    else:
        d6 = (grid.y[None, :, None] - c.eta[:, None, None])[:, None, None, None, :, :]
        w_eta = jnp.ones((1, 1, 1, 1, 1, 1))

    sinh_d = jnp.sinh(d6)
    cosh_d = jnp.sqrt(1.0 + sinh_d * sinh_d)
    pt = mT6 * cosh_d
    pn = mT6 / C(c.tau) * sinh_d

    pdd = pt * C(c.dat) + px * C(c.dax) + py * C(c.day) + pn * C(c.dan)
    pdotu = pt * C(c.ut) - px * C(c.ux) - py * C(c.uy) - pn * C(tau2 * c.un)

    sgn = S(species.sign)
    f0 = 1.0 / (jnp.exp(pdotu / T) + sgn)

    pref = -(1.0 / (8.0 * S(species.mass))) * (1.0 - sgn * f0) * 2.0
    spin_t = pref * (C(c.wxy) * pn - C(c.wxn) * py + C(c.wyn) * px)
    spin_x = pref * (C(c.wyn) * pt - C(c.wtn) * py + C(c.wty) * pn)
    spin_y = pref * (-C(c.wxn) * pt + C(c.wtn) * px - C(c.wtx) * pn)
    spin_n = pref * (C(c.wtx) * py + C(c.wxy) * pt - C(c.wty) * px)

    w = w_eta * c.pad_mask[:, None, None, None, None, None] * pdd * f0
    St = jnp.sum(w * spin_t, axis=(0, 5))
    Sx = jnp.sum(w * spin_x, axis=(0, 5))
    Sy = jnp.sum(w * spin_y, axis=(0, 5))
    Sn = jnp.sum(w * spin_n, axis=(0, 5))
    Snorm = jnp.sum(w, axis=(0, 5))
    return jnp.stack([St, Sx, Sy, Sn, Snorm])


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "delta_eta", "T"))
def _polzn_jit(cells: CellArrays, species: SpeciesArrays,
               grid: MomentumGridDevice, T: float, cfg: Config,
               n_blocks: int, delta_eta: float):
    S_count = species.mass.shape[0]
    out_shape = (5, S_count, grid.pT.shape[0], grid.cos_phi.shape[0],
                 grid.y.shape[0])
    blk = cells.n_padded // n_blocks

    def body(acc, i):
        cb = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, i * blk, blk, axis=0), cells)
        return acc + _cell_block_polzn(cb, species, grid, T, cfg, delta_eta), None

    acc, _ = jax.lax.scan(body, jnp.zeros(out_shape), jnp.arange(n_blocks))
    return acc


def compute_polarization(surf, species_table: SpeciesTable,
                         chosen_idx: np.ndarray, grids: MomentumGrids,
                         plasma: ThermoAverages, cfg: Config,
                         cell_block: int | None = None):
    """Returns (St, Sx, Sy, Sn, Snorm), each (S, NpT, Nphi, Ny) raw sums;
    the physical polarization is S<mu>/Snorm (write_polzn_vector_toFile)."""
    block = cell_block or cfg.cell_block
    cells = prepare_cells(surf, cfg, block=block)
    n_blocks = max(cells.n_padded // min(block, cells.n_padded), 1)
    species = SpeciesArrays.from_table(species_table, chosen_idx)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)
    delta_eta = float(grids.eta[1] - grids.eta[0]) if len(grids.eta) > 1 else 1.0
    from ..parallel.sharding import auto_mesh
    mesh = auto_mesh(cfg)
    if mesh is not None and cfg.compute_dtype in ("f32", "f32c"):
        from ..parallel.sharding import sharded_polarization_fast
        acc = sharded_polarization_fast(cells, species, grid,
                                        float(plasma.temperature), cfg, mesh,
                                        block=block, delta_eta=delta_eta)
    elif mesh is not None:
        from ..parallel.sharding import sharded_polarization
        acc = sharded_polarization(cells, species, grid,
                                   float(plasma.temperature), cfg, mesh,
                                   block=block, delta_eta=delta_eta)
    elif cfg.compute_dtype in ("f32", "f32c"):
        from .polarization_fast import compute_polarization_fast
        acc = compute_polarization_fast(cells, species, grid,
                                        float(plasma.temperature), cfg,
                                        n_blocks, delta_eta)
    else:
        acc = _polzn_jit(cells, species, grid, float(plasma.temperature), cfg,
                         n_blocks, delta_eta)
    out = np.asarray(acc)
    return out[0], out[1], out[2], out[3], out[4]
