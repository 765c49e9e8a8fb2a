"""famod (df 5) sampler preparation.

Replaces the per-cell preamble of sample_dN_pTdpTdphidy_famod
(ParticleSampler.cpp:1138-1513): anisotropic reconstruction, B matrix
(identity on breakdown), and anisotropic densities
n_a = g Lambda^3 detA I_100 / (2 pi^2 hbar^3).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..constants import two_pi2_hbarC3
from ..io.pdg import SpeciesTable
from ..physics import lrf
from ..physics.aniso import aniso_density_integral
from .cells import prepare_cells
from ..utils import host_prep
from .spectra import SpeciesArrays
from .spectra_famod import prepare_famod
from .sampler import SamplerSetup


@host_prep
def prepare_sampler_famod(surf, species_table: SpeciesTable, chosen_idx,
                          cfg: Config, block: int | None = None):
    cells_cfg = dataclasses.replace(cfg, include_shear_deltaf=1,
                                    include_bulk_deltaf=1)
    cells = prepare_cells(surf, cells_cfg, block=block or cfg.cell_block)
    species = SpeciesArrays.from_table(species_table, chosen_idx)
    c = cells

    basis = lrf.milne_basis(c.tau, c.ux, c.uy, c.un)
    ds = lrf.boost_dsigma(basis, c.tau, c.ux, c.uy, c.un,
                          c.dat, c.dax, c.day, c.dan)

    from .spectra_famod import vah_from_surface
    fm = prepare_famod(cells, species_table, cfg,
                       vah_from_surface(surf, cells.n_padded))
    breaks = fm.breaks_down

    ident = jnp.ones_like(fm.Bxx)
    zero = jnp.zeros_like(fm.Bxx)
    Bxx = jnp.where(breaks, ident, fm.Bxx)
    Bxy = jnp.where(breaks, zero, fm.Bxy)
    Bxz = jnp.where(breaks, zero, fm.Bxz)
    Byy = jnp.where(breaks, ident, fm.Byy)
    Byz = jnp.where(breaks, zero, fm.Byz)
    Bzz = jnp.where(breaks, ident, fm.Bzz)

    # anisotropic densities (ParticleSampler.cpp:1464-1499); failed cells keep
    # (lambda = T, aT = aL = 1), i.e. the equilibrium density
    detA = fm.aT * fm.aT * fm.aL
    na_fact = fm.lam**3 * detA / two_pi2_hbarC3
    chem = species.baryon[None, :] * fm.upsilonB[:, None]
    I100 = aniso_density_integral(fm.lam, species.mass, species.sign,
                                  species.degeneracy, chem=chem)
    rates = species.degeneracy[None, :] * na_fact[:, None] * I100
    rates = jnp.maximum(rates, 0.0) * cells.mask[:, None]

    df_cols = {
        "Bxx": Bxx, "Bxy": Bxy, "Bxz": Bxz,
        "Byy": Byy, "Byz": Byz, "Bzz": Bzz,
    }

    zeros = jnp.zeros(cells.n_padded)
    pi0 = zeros
    setup = SamplerSetup(
        cells=cells, fq=None, rates=rates,
        dst=ds.t, dsx=ds.x, dsy=ds.y, dsz=ds.z, ds_max=ds.magnitude,
        pixx=pi0, pixy=pi0, pixz=pi0, piyy=pi0, piyz=pi0, pizz=pi0,
        Vx=pi0, Vy=pi0, Vz=pi0, df_cols=df_cols,
        shear_mod=zeros, isotropic_scale=jnp.ones_like(zeros), diff_mod=zeros,
        T_mod=fm.lam, alphaB_mod=fm.upsilonB, breaks_down=breaks,
    )
    return setup, species
