"""Batched multi-surface (event-ensemble) processing.

The BASELINE stretch config runs 1000 hydro surfaces through spectra +
sampling.  The reference can only loop whole binaries (scripts/oversample.sh);
here surfaces are padded to a common cell count, stacked on a leading axis,
and the spectra kernel is vmapped over it — the surface axis can then be
sharded across devices/slices (DCN axis) with the cells axis inside each.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io.pdg import SpeciesTable
from ..io.tables import GaussLaguerre, MomentumGrids
from ..physics.deltaf import DeltafData
from .cells import CellArrays, prepare_cells
from .spectra import (MomentumGridDevice, SpeciesArrays,
                      df12_cell_coefficients, _spectra_df12_jit)


def stack_surfaces(surfs, cfg: Config, block: int) -> CellArrays:
    """Pad every surface to the max padded cell count and stack on axis 0."""
    all_cells = [prepare_cells(s, cfg, block=block) for s in surfs]
    n_max = max(c.n_padded for c in all_cells)

    def pad_to(c: CellArrays) -> CellArrays:
        pad = n_max - c.n_padded
        if pad == 0:
            return c
        fields = {}
        safe = {"T": 0.15, "P": 0.08, "E": 0.25, "tau": 1.0, "ut": 1.0}
        for f in dataclasses.fields(c):
            fill = safe.get(f.name, 0.0)
            fields[f.name] = jnp.pad(getattr(c, f.name), (0, pad),
                                     constant_values=fill)
        return CellArrays(**fields)

    padded = [pad_to(c) for c in all_cells]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded)


def compute_spectra_ensemble(surfs, species_table: SpeciesTable, chosen_idx,
                             grids: MomentumGrids, df_data: DeltafData,
                             cfg: Config, laguerre: GaussLaguerre | None = None,
                             cell_block: int | None = None) -> np.ndarray:
    """Continuous spectra for a list of surfaces at once.

    Returns (n_surfaces, S, NpT, Nphi, Ny).  df modes 1/2.
    """
    if cfg.df_mode not in (1, 2):
        raise ValueError("ensemble spectra currently implement df 1/2")
    block = cell_block or cfg.cell_block
    cells = stack_surfaces(surfs, cfg, block)
    n_padded = cells.tau.shape[1]
    n_blocks = max(n_padded // min(block, n_padded), 1)

    species = SpeciesArrays.from_table(species_table, chosen_idx)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    coeffs = jax.vmap(lambda c: df12_cell_coefficients(c, df_data, cfg))(cells)

    out = jax.vmap(
        lambda c, k: _spectra_df12_jit(c, k, species, grid, cfg, n_blocks)
    )(cells, coeffs)
    return np.asarray(out)
