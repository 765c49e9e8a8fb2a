"""Continuous spectra with modified equilibrium distributions (df 3 PTM / 4 PTB).

Replaces calculate_dN_pTdpTdphidy_feqmod (MomentumSpectra.cpp:419-1044).
Both the feqmod branch and the linearized-df breakdown fallback are computed
for every point and where-selected by the per-cell breakdown mask (plus the
3+1d narrow |y-eta| < detA mask), mirroring the reference's data-dependent
branch at MomentumSpectra.cpp:877-929.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..io.tables import GaussLaguerre
from ..physics.deltaf import DeltafData
from .cells import CellArrays
from .feqmod import FeqmodCellData, prepare_feqmod
from .spectra import PREFACTOR, MomentumGridDevice, SpeciesArrays


def _solve_pmod(fq: FeqmodCellData, px_lrf, py_lrf, pz_lrf, n_refine: int = 2):
    """p_mod = A^-1 p with iterative refinement
    (MomentumSpectra.cpp:954-971; refinement makes the f64 solve exact)."""
    Ai = fq.Ainv  # (c,3,3)

    def C(a):
        return a[:, None, None, None, None, None]

    def matvec(m, x, y, z):
        return (C(m[:, 0, 0]) * x + C(m[:, 0, 1]) * y + C(m[:, 0, 2]) * z,
                C(m[:, 1, 0]) * x + C(m[:, 1, 1]) * y + C(m[:, 1, 2]) * z,
                C(m[:, 2, 0]) * x + C(m[:, 2, 1]) * y + C(m[:, 2, 2]) * z)

    def Amatvec(x, y, z):
        return (C(fq.Axx) * x + C(fq.Axy) * y + C(fq.Axz) * z,
                C(fq.Axy) * x + C(fq.Ayy) * y + C(fq.Ayz) * z,
                C(fq.Axz) * x + C(fq.Ayz) * y + C(fq.Azz) * z)

    mx, my, mz = matvec(Ai, px_lrf, py_lrf, pz_lrf)
    for _ in range(n_refine):
        rx, ry, rz = Amatvec(mx, my, mz)
        dx, dy, dz = px_lrf - rx, py_lrf - ry, pz_lrf - rz
        cx, cy, cz = matvec(Ai, dx, dy, dz)
        mx, my, mz = mx + cx, my + cy, mz + cz
    return mx, my, mz


def feqmod_weighted_value(c: CellArrays, fq: FeqmodCellData, species: SpeciesArrays,
                          grid: MomentumGridDevice, cfg: Config,
                          dan_weighted: bool = False):
    """Weighted integrand on axes (c,s,p,f,y,e) for df modes 3/4.

    dan_weighted selects between the momentum-spectra convention
    (p.dsigma = w*(pt.dat + px.dax + py.day) + pn.dan,
    MomentumSpectra.cpp:883/936) and the spacetime-distribution convention
    (w multiplies all four terms, SpacetimeDistribution.cpp:1022/1075).
    """
    def C(a):
        return a[:, None, None, None, None, None]

    def S(a):
        return a[None, :, None, None, None, None]

    tau2 = c.tau * c.tau
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)   # (s,p)
    mT6 = mT[None, :, :, None, None, None]
    px = (grid.pT[:, None] * grid.cos_phi[None, :])[None, None, :, :, None, None]
    py = (grid.pT[:, None] * grid.sin_phi[None, :])[None, None, :, :, None, None]

    if cfg.dimension == 2:
        eta = grid.eta[None, :]                              # (1,e)
        delta_break = -jnp.broadcast_to(eta, (c.tau.shape[0], eta.shape[1]))
        delta_mod = -(fq.eta_scale[:, None] * eta)           # (c,e)
        d_break = delta_break[:, None, None, None, None, :]
        d_mod = delta_mod[:, None, None, None, None, :]
        w_eta = grid.eta_weight[None, None, None, None, None, :]
        y_minus_eta = d_break                                # y=0
    else:
        delta = grid.y[None, :, None] - c.eta[:, None, None]  # (c,y,1)
        d_break = delta[:, None, None, None, :, :]
        d_mod = d_break
        w_eta = jnp.ones((1, 1, 1, 1, 1, 1))
        y_minus_eta = d_break

    sgn = S(species.sign)
    b_s = S(species.baryon)
    m2 = S(species.mass ** 2)
    chem = b_s * C(c.alphaB)
    chem_mod = b_s * C(fq.alphaB_mod)

    # ---------------- breakdown (linearized df) branch -------------------
    sinh_b = jnp.sinh(d_break)
    cosh_b = jnp.sqrt(1.0 + sinh_b * sinh_b)
    pt_b = mT6 * cosh_b
    pn_b = mT6 / C(c.tau) * sinh_b

    if dan_weighted:
        pdd_b = w_eta * (pt_b * C(c.dat) + px * C(c.dax) + py * C(c.day)
                         + pn_b * C(c.dan))
    else:
        pdd_b = w_eta * (pt_b * C(c.dat) + px * C(c.dax) + py * C(c.day)) \
            + pn_b * C(c.dan)
    pdotu_b = pt_b * C(c.ut) - px * C(c.ux) - py * C(c.uy) - pn_b * C(tau2 * c.un)

    pimunu_pp = (C(c.pitt) * pt_b * pt_b + C(c.pixx) * px * px
                 + C(c.piyy) * py * py + C(tau2 * tau2 * c.pinn) * pn_b * pn_b
                 + 2.0 * (-(C(c.pitx) * px + C(c.pity) * py) * pt_b
                          + C(c.pixy) * px * py
                          + C(tau2) * pn_b * (C(c.pixn) * px + C(c.piyn) * py
                                              - C(c.pitn) * pt_b)))

    if cfg.df_mode == 3:
        feq = 1.0 / (jnp.exp(pdotu_b / C(c.T) - chem) + sgn)
        feqbar = 1.0 - sgn * feq
        V_pp = pt_b * C(c.Vt) - px * C(c.Vx) - py * C(c.Vy) - pn_b * C(tau2 * c.Vn)
        df_shear = C(fq.shear_coeff) * pimunu_pp / pdotu_b
        df_bulk = (C(fq.bulk0) * pdotu_b + C(fq.bulk1) * b_s
                   + C(fq.bulk2) * (pdotu_b - m2 / pdotu_b)) * C(fq.bulkPi)
        df_diff = (C(c.baryon_enthalpy_ratio) - b_s / pdotu_b) * V_pp / C(fq.betaV)
        df = feqbar * (df_shear + df_bulk + df_diff)
    else:  # PTB: feq with no chemical potential (MomentumSpectra.cpp:913)
        feq = 1.0 / (jnp.exp(pdotu_b / C(c.T)) + sgn)
        feqbar = 1.0 - sgn * feq
        df_shear = feqbar * C(fq.shear_coeff) * pimunu_pp / pdotu_b
        df_bulk = C(fq.delta_z) - 3.0 * C(fq.delta_lambda) \
            + feqbar * C(fq.delta_lambda) * (pdotu_b - m2 / pdotu_b) / C(c.T)
        df = df_shear + df_bulk

    if cfg.regulate_deltaf:
        df = jnp.clip(df, -1.0, 1.0)
    f_break = feq * (1.0 + df)
    if cfg.outflow:
        pdd_b = jnp.where(pdd_b > 0.0, pdd_b, 0.0)
    value_break = pdd_b * f_break

    # ---------------- feqmod branch ---------------------------------------
    sinh_m = jnp.sinh(d_mod)
    cosh_m = jnp.sqrt(1.0 + sinh_m * sinh_m)
    pt_m = mT6 * cosh_m
    pn_m = mT6 / C(c.tau) * sinh_m

    if dan_weighted:
        pdd_m = w_eta * (pt_m * C(c.dat) + px * C(c.dax) + py * C(c.day)
                         + pn_m * C(c.dan))
    else:
        pdd_m = w_eta * (pt_m * C(c.dat) + px * C(c.dax) + py * C(c.day)) \
            + pn_m * C(c.dan)

    tau2_pn = C(tau2) * pn_m
    px_lrf = -C(fq.Xt) * pt_m + C(fq.Xx) * px + C(fq.Xy) * py + C(fq.Xn) * tau2_pn
    py_lrf = C(fq.Yx) * px + C(fq.Yy) * py
    pz_lrf = -C(fq.Zt) * pt_m + C(fq.Zn) * tau2_pn

    mx, my, mz = _solve_pmod(fq, px_lrf, py_lrf, pz_lrf)
    E_mod = jnp.sqrt(m2 + mx * mx + my * my + mz * mz)

    renorm = jnp.abs(fq.renorm)[:, :, None, None, None, None]
    renorm = jnp.where(jnp.isfinite(renorm), renorm, 0.0)
    f_mod = renorm / (jnp.exp(E_mod / C(fq.T_mod) - chem_mod) + sgn)
    if cfg.outflow:
        pdd_m = jnp.where(pdd_m > 0.0, pdd_m, 0.0)
    value_mod = pdd_m * f_mod

    # ---------------- branch selection -----------------------------------
    breaks = C(fq.breaks_down)
    if cfg.dimension == 3:
        # narrow (y-eta) fallback (MomentumSpectra.cpp:863-871)
        narrow = (C(fq.detA) < 0.01) & (jnp.abs(y_minus_eta) < C(fq.detA))
        use_break = breaks | narrow
    else:
        use_break = breaks

    # renorm nan/inf would make the reference skip the species entirely
    # (MomentumSpectra.cpp:828-832), so zero both branches there
    finite = jnp.isfinite(fq.renorm)[:, :, None, None, None, None]
    return jnp.where(use_break, value_break, value_mod) * finite


def _cell_block_feqmod(c: CellArrays, fq: FeqmodCellData, species: SpeciesArrays,
                       grid: MomentumGridDevice, cfg: Config):
    value = feqmod_weighted_value(c, fq, species, grid, cfg)
    w_cell = c.mask[:, None, None, None, None, None]
    contrib = jnp.sum(w_cell * value, axis=(0, 5))
    return PREFACTOR * species.degeneracy[:, None, None, None] * contrib


@partial(jax.jit, static_argnames=("cfg", "n_blocks"))
def _spectra_feqmod_jit(cells: CellArrays, fq: FeqmodCellData,
                        species: SpeciesArrays, grid: MomentumGridDevice,
                        cfg: Config, n_blocks: int):
    S_count = species.mass.shape[0]
    out_shape = (S_count, grid.pT.shape[0], grid.cos_phi.shape[0], grid.y.shape[0])
    blk = cells.n_padded // n_blocks

    def take(a, i):
        return jax.lax.dynamic_slice_in_dim(a, i * blk, blk, axis=0)

    def body(acc, i):
        cb = jax.tree_util.tree_map(lambda a: take(a, i), cells)
        fb = jax.tree_util.tree_map(lambda a: take(a, i), fq)
        return acc + _cell_block_feqmod(cb, fb, species, grid, cfg), None

    acc, _ = jax.lax.scan(body, jnp.zeros(out_shape), jnp.arange(n_blocks))
    return acc


def compute_spectra_feqmod(cells: CellArrays, species: SpeciesArrays,
                           grid: MomentumGridDevice, df_data: DeltafData,
                           cfg: Config, laguerre: GaussLaguerre,
                           n_blocks: int):
    fq = prepare_feqmod(cells, species, df_data, cfg, laguerre)
    return _spectra_feqmod_jit(cells, fq, species, grid, cfg, n_blocks)
