"""Shared feqmod (modified equilibrium) machinery for df modes 3/4.

Replaces the per-cell feqmod preamble of the reference
(MomentumSpectra.cpp:632-773, ParticleSampler.cpp:848-915,
EmissionFunction.cpp:33-109) with vectorized per-cell arrays:

  * local momentum-transformation matrix A = (1 + bulk_mod) I + shear_mod pi_LRF
  * detA and the isotropic-deformation determinant detA_bulk^{2/3}
  * breakdown detection (detA <= detA_min, negative linearized pion density,
    z < 0)
  * modified temperature / chemical potential (PTM)
  * per-(cell, species) renormalization factors n_linear / n_mod (PTM) or z (PTB)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..constants import two_pi2_hbarC3
from ..io.tables import GaussLaguerre
from ..physics import lrf, thermal
from ..physics.deltaf import DeltafData, DeltafCoefficients
from .cells import CellArrays
from ..utils import host_prep
from .spectra import SpeciesArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FeqmodCellData:
    """Per-cell feqmod quantities (all shape (c,) unless noted)."""

    # LRF basis (needed to project momenta)
    Xt: jnp.ndarray
    Xx: jnp.ndarray
    Xy: jnp.ndarray
    Xn: jnp.ndarray
    Yx: jnp.ndarray
    Yy: jnp.ndarray
    Zt: jnp.ndarray
    Zn: jnp.ndarray
    # A matrix (symmetric) and inverse
    Axx: jnp.ndarray
    Axy: jnp.ndarray
    Axz: jnp.ndarray
    Ayy: jnp.ndarray
    Ayz: jnp.ndarray
    Azz: jnp.ndarray
    Ainv: jnp.ndarray          # (c, 3, 3)
    detA: jnp.ndarray
    detA_bulk_23: jnp.ndarray  # (1 + bulk_mod)^2
    eta_scale: jnp.ndarray
    breaks_down: jnp.ndarray   # bool (c,)
    T_mod: jnp.ndarray
    alphaB_mod: jnp.ndarray
    # linearized-df coefficient columns for the breakdown branch
    shear_coeff: jnp.ndarray
    bulk0: jnp.ndarray
    bulk1: jnp.ndarray
    bulk2: jnp.ndarray
    # PTB linearized coefficients
    delta_z: jnp.ndarray
    delta_lambda: jnp.ndarray
    # regulated bulk pressure actually used
    bulkPi: jnp.ndarray
    betaV: jnp.ndarray
    z: jnp.ndarray
    renorm: jnp.ndarray        # (c, S) |renorm| including detA division


def _sym3_inverse(Axx, Axy, Axz, Ayy, Ayz, Azz, detA):
    """Adjugate inverse of a symmetric 3x3 (the reference's GSL LU inverse,
    MomentumSpectra.cpp:729-747; identical result in exact arithmetic)."""
    c00 = Ayy * Azz - Ayz * Ayz
    c01 = Axz * Ayz - Axy * Azz
    c02 = Axy * Ayz - Axz * Ayy
    c11 = Axx * Azz - Axz * Axz
    c12 = Axy * Axz - Axx * Ayz
    c22 = Axx * Ayy - Axy * Axy
    inv = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c01, c11, c12], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return inv / detA[:, None, None]


def pion0_density_negative(T, bulkPi, F, betabulk, mass_pion0, laguerre):
    """Linearized pion0 density < 0 breakdown test
    (EmissionFunction.cpp:52-97).  Vectorized over cells."""
    r1, w1 = jnp.asarray(laguerre.roots[1]), jnp.asarray(laguerre.weights[1])
    r2, w2 = jnp.asarray(laguerre.roots[2]), jnp.asarray(laguerre.weights[2])
    mbar = mass_pion0 / T
    zero = jnp.zeros_like(T)
    neq_fact = T**3 / two_pi2_hbarC3
    J20_fact = T * neq_fact
    neq = neq_fact * thermal.neq_integral(r1, w1, mbar, zero, zero, -jnp.ones_like(T))
    J20 = J20_fact * thermal.J20_integral(r2, w2, mbar, zero, zero, -jnp.ones_like(T))
    dn = bulkPi * (neq + J20 * F / (T * T)) / betabulk
    return (neq + dn) < 0.0


@partial(jax.jit, static_argnames=("n_blocks",))
def _renorm_ptm_device(T, alphaB, T_mod, alphaB_mod, bulkPi, bulk0, bulk1,
                       bulk2, mass, baryon, sign, deg, r1, w1, r2, w2,
                       n_blocks: int):
    """PTM per-(cell,species) renormalization n_linear/n_mod on the default
    device in f32 (MomentumSpectra.cpp:790-826).

    This is the only setup-scale computation that is NOT tiny: four
    (cells x species x 32)-point Gauss-Laguerre quadratures.  On the host in
    f64 it dominates the wall clock (minutes at 1e4+ cells); in f32 on the
    accelerator it is milliseconds, and the result only feeds the f32 fast
    kernel.  The integrands use the overflow-safe factored exponentials of
    physics/thermal.py, so f32/TPU evaluation is safe.  Blocked over cells to
    bound the (blk, S, 32) intermediates.
    """
    C = T.shape[0]
    blk = C // n_blocks
    inv_betabulk = 3.0 * T * bulk2          # bulk2 = 1/(3 T betabulk)

    def body(_, i):
        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, i * blk, blk, 0)

        Tb, aBb, Tmb, aBmb = sl(T), sl(alphaB), sl(T_mod), sl(alphaB_mod)
        bPib, b0b, b1b, ibbb = sl(bulkPi), sl(bulk0), sl(bulk1), sl(inv_betabulk)
        mbar = mass[None, :] / Tb[:, None]
        mbar_mod = mass[None, :] / Tmb[:, None]
        aB2 = aBb[:, None]
        aBm2 = aBmb[:, None]
        b = baryon[None, :]
        sgn = sign[None, :]
        g = deg[None, :]
        neq_fact = (Tb ** 3 / two_pi2_hbarC3)[:, None]
        J20_fact = (Tb ** 4 / two_pi2_hbarC3)[:, None]
        nmod_fact = (Tmb ** 3 / two_pi2_hbarC3)[:, None]

        neq = neq_fact * g * thermal.neq_integral(r1, w1, mbar, aB2, b, sgn)
        N10 = b * neq_fact * g * thermal.J10_integral(r1, w1, mbar, aB2, b, sgn)
        J20 = J20_fact * g * thermal.J20_integral(r2, w2, mbar, aB2, b, sgn)
        n_linear = neq + bPib[:, None] * (neq * ibbb[:, None]
                                          + N10 * b1b[:, None]
                                          + J20 * b0b[:, None])
        n_mod = nmod_fact * g * thermal.neq_integral(r1, w1, mbar_mod, aBm2,
                                                     b, sgn)
        return None, n_linear / n_mod

    _, out = jax.lax.scan(body, None, jnp.arange(n_blocks))
    return out.reshape(C, -1)


def prepare_feqmod(cells: CellArrays, species: SpeciesArrays,
                   df_data: DeltafData, cfg: Config,
                   laguerre: GaussLaguerre) -> FeqmodCellData:
    """Host prep + (for the f32 fast path) device-side PTM renormalization."""
    device_renorm = (cfg.compute_dtype == "f32" and cfg.df_mode == 3
                     and cfg.include_bulk_deltaf)
    fq = _prepare_feqmod_host(cells, species, df_data, cfg, laguerre,
                              skip_renorm=device_renorm)
    if not device_renorm:
        return fq

    f32 = jnp.float32
    C = cells.n_padded
    n_blocks = 1
    for cand in (4096, 2048, 1024):
        if C % cand == 0 and C > cand:
            n_blocks = C // cand
            break
    # pin to the accelerator explicitly: prepare_feqmod may be called from
    # inside a host_prep (CPU-pinned) context, e.g. by the sampler prep
    with jax.default_device(jax.devices()[0]):
        renorm = _renorm_ptm_device(
            jnp.asarray(cells.T, f32), jnp.asarray(cells.alphaB, f32),
            jnp.asarray(fq.T_mod, f32), jnp.asarray(fq.alphaB_mod, f32),
            jnp.asarray(fq.bulkPi, f32), jnp.asarray(fq.bulk0, f32),
            jnp.asarray(fq.bulk1, f32), jnp.asarray(fq.bulk2, f32),
            jnp.asarray(species.mass, f32), jnp.asarray(species.baryon, f32),
            jnp.asarray(species.sign, f32), jnp.asarray(species.degeneracy, f32),
            jnp.asarray(laguerre.roots[1], f32), jnp.asarray(laguerre.weights[1], f32),
            jnp.asarray(laguerre.roots[2], f32), jnp.asarray(laguerre.weights[2], f32),
            n_blocks)
    if cfg.dimension == 2:
        renorm = renorm / jnp.asarray(fq.detA_bulk_23, f32)[:, None]
    else:
        detA = jnp.asarray(fq.detA, f32)
        renorm = renorm / jnp.where(jnp.abs(detA[:, None]) > 1e-30,
                                    detA[:, None], 1.0)
    return dataclasses.replace(fq, renorm=renorm)


@host_prep
def _prepare_feqmod_host(cells: CellArrays, species: SpeciesArrays,
                         df_data: DeltafData, cfg: Config,
                         laguerre: GaussLaguerre,
                         skip_renorm: bool = False) -> FeqmodCellData:
    c = cells
    tau2 = c.tau * c.tau

    bulkPi = c.bulkPi
    if cfg.df_mode == 4:
        bulkPi = df_data.regulate_bulkPi_ptb(bulkPi, c.P)
    df = df_data.evaluate(c.T, c.muB, c.E, c.P, bulkPi)

    basis = lrf.milne_basis(c.tau, c.ux, c.uy, c.un)
    pi = lrf.boost_shear(basis, c.tau, c.pitt, c.pitx, c.pity, c.pitn,
                         c.pixx, c.pixy, c.pixn, c.piyy, c.piyn, c.pinn)

    if cfg.df_mode == 3:
        T_mod = c.T + bulkPi * df.F / df.betabulk
        alphaB_mod = c.alphaB + bulkPi * df.G / df.betabulk
        bulk_mod = bulkPi / (3.0 * df.betabulk)
    else:
        T_mod = c.T
        alphaB_mod = c.alphaB
        bulk_mod = df.lam

    shear_mod = 0.5 / df.betapi

    Axx = 1.0 + pi.xx * shear_mod + bulk_mod
    Axy = pi.xy * shear_mod
    Axz = pi.xz * shear_mod
    Ayy = 1.0 + pi.yy * shear_mod + bulk_mod
    Ayz = pi.yz * shear_mod
    Azz = 1.0 + pi.zz * shear_mod + bulk_mod

    detA = (Axx * (Ayy * Azz - Ayz * Ayz) - Axy * (Axy * Azz - Ayz * Axz)
            + Axz * (Axy * Ayz - Ayy * Axz))
    detA_bulk_23 = (1.0 + bulk_mod) ** 2

    # breakdown predicate (does_feqmod_breakdown, EmissionFunction.cpp:65-109)
    if cfg.df_mode == 3:
        pion_neg = pion0_density_negative(c.T, bulkPi, df.F, df.betabulk,
                                          cfg.mass_pion0, laguerre)
        breaks = (detA <= cfg.deta_min) | pion_neg
    else:
        breaks = (detA <= cfg.deta_min) | (df.z < 0.0)

    # eta rescaling (2+1d narrow (y-eta) trick, MomentumSpectra.cpp:766-773)
    if cfg.dimension == 2:
        eta_scale = jnp.where(detA > cfg.deta_min, detA / detA_bulk_23, 1.0)
    else:
        eta_scale = jnp.ones_like(detA)

    # guard detA for the inverse on broken-down cells (branch is masked out)
    detA_safe = jnp.where(jnp.abs(detA) > 1e-300, detA, 1.0)
    Ainv = _sym3_inverse(Axx, Axy, Axz, Ayy, Ayz, Azz, detA_safe)

    # per-(cell, species) renormalization (MomentumSpectra.cpp:790-826)
    S_count = species.mass.shape[0]
    if skip_renorm:
        # caller computes the PTM renorm on the accelerator in f32
        renorm = jnp.zeros((c.n_padded, S_count))
    elif cfg.include_bulk_deltaf:
        if cfg.df_mode == 3:
            r1, w1 = jnp.asarray(laguerre.roots[1]), jnp.asarray(laguerre.weights[1])
            r2, w2 = jnp.asarray(laguerre.roots[2]), jnp.asarray(laguerre.weights[2])
            mbar = species.mass[None, :] / c.T[:, None]          # (c, S)
            mbar_mod = species.mass[None, :] / T_mod[:, None]
            aB = c.alphaB[:, None]
            aB_mod = alphaB_mod[:, None]
            b = species.baryon[None, :]
            sgn = species.sign[None, :]
            g = species.degeneracy[None, :]

            neq_fact = (c.T**3 / two_pi2_hbarC3)[:, None]
            J20_fact = (c.T**4 / two_pi2_hbarC3)[:, None]
            nmod_fact = (T_mod**3 / two_pi2_hbarC3)[:, None]

            neq = neq_fact * g * thermal.neq_integral(r1, w1, mbar, aB, b, sgn)
            N10 = b * neq_fact * g * thermal.J10_integral(r1, w1, mbar, aB, b, sgn)
            J20 = J20_fact * g * thermal.J20_integral(r2, w2, mbar, aB, b, sgn)
            dn_fact = (bulkPi / df.betabulk)[:, None]
            n_linear = neq + dn_fact * (neq + N10 * df.G[:, None]
                                        + J20 * df.F[:, None] / c.T[:, None] ** 2)
            n_mod = nmod_fact * g * thermal.neq_integral(r1, w1, mbar_mod, aB_mod, b, sgn)
            renorm = n_linear / n_mod
        else:
            renorm = jnp.broadcast_to(df.z[:, None], (c.n_padded, S_count))
    else:
        renorm = jnp.ones((c.n_padded, S_count))

    if cfg.dimension == 2:
        renorm = renorm / detA_bulk_23[:, None]
    else:
        renorm = renorm / jnp.where(jnp.abs(detA[:, None]) > 1e-300, detA[:, None], 1.0)

    # linearized-df columns for the breakdown branch (MomentumSpectra.cpp:676-680)
    shear_coeff = 0.5 / (df.betapi * c.T)
    bulk0 = df.F / (c.T * c.T * df.betabulk)
    bulk1 = df.G / df.betabulk
    bulk2 = 1.0 / (3.0 * c.T * df.betabulk)

    return FeqmodCellData(
        Xt=basis.Xt, Xx=basis.Xx, Xy=basis.Xy, Xn=basis.Xn,
        Yx=basis.Yx, Yy=basis.Yy, Zt=basis.Zt, Zn=basis.Zn,
        Axx=Axx, Axy=Axy, Axz=Axz, Ayy=Ayy, Ayz=Ayz, Azz=Azz,
        Ainv=Ainv, detA=detA, detA_bulk_23=detA_bulk_23, eta_scale=eta_scale,
        breaks_down=breaks, T_mod=T_mod, alphaB_mod=alphaB_mod,
        shear_coeff=shear_coeff, bulk0=bulk0, bulk1=bulk1, bulk2=bulk2,
        delta_z=df.delta_z, delta_lambda=df.delta_lambda, bulkPi=bulkPi,
        betaV=df.betaV, z=df.z, renorm=renorm,
    )
