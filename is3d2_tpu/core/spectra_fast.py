"""MXU-structured Cooper-Frye spectra (df 1/2), the TPU performance path.

The CF integrand's heavy lifting is a set of small contractions between
per-cell vectors and a momentum-grid matrix:

    E[c,m]    = Q_E[c,1:4]  . P[1:4,m]          (u . p)
    pdd[c,m]  = Q_d[c,1:4]  . P[1:4,m]          (p . dsigma)
    pim[c,m]  = Q_pi[c,10]  . PP[10,m]          (pi^munu p_mu p_nu)
    Vp[c,m]   = Q_V[c,1:4]  . P[1:4,m]          (V . p)

with m = (species, pT, phi) and P rows (mT cosh(y-eta_e), px, py,
mT sinh(y-eta_e)) per eta point e.  Expressed as jnp.dot these run on the
MXU; the remaining elementwise chain (exp, feq, df assembly, accumulate) is
a few VPU ops per element, and the final cell reduction is itself a matmul
with the cell-mask row vector.

This is algebraically identical to core/spectra.py's broadcast form (same
operations, same order within each dot product up to matmul reassociation)
and is validated against it; the f64 reference path remains spectra.py.

Implements both the 2+1d benchmark path (boost-invariant surfaces, df 1/2)
and the 3+1d light-cone kernel (`momentum_matrix_3d` / `_cell_Q_3d`: the
(y - eta) hyperbolics fold into per-cell e^{+-eta} light-cone components so
m = (species, pT, phi, y) contractions stay MXU matmuls).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .cells import CellArrays
from .spectra import PREFACTOR, MomentumGridDevice, SpeciesArrays


def _contract(Q, rows):
    """sum_k Q[:, k, None] * rows[k][None, :] as an explicit VPU FMA chain.

    K is tiny (4 or 10), so the MXU buys nothing here, and on TPU a
    DEFAULT-precision f32 matmul rounds its inputs to bf16 -- a ~1e-2
    relative error after the exp amplification (full-f32 MXU passes cost
    6x).  The broadcast chain is exact f32 and fuses into the elementwise
    kernel, eliminating the HBM round-trips between matmul and VPU ops.
    """
    acc = Q[:, 0, None] * rows[0][None, :]
    for k in range(1, len(rows)):
        acc = acc + Q[:, k, None] * rows[k][None, :]
    return acc


def momentum_matrix(species: SpeciesArrays, grid: MomentumGridDevice, dtype):
    """Per-m arrays (m = species x pT x phi): mT, px, py, mass^2, baryon, sign
    and per-species degeneracy folded out later."""
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)  # (s,p)
    S, NpT = mT.shape
    Nphi = grid.cos_phi.shape[0]
    M = S * NpT * Nphi

    mT_m = jnp.broadcast_to(mT[:, :, None], (S, NpT, Nphi)).reshape(M)
    px_m = jnp.broadcast_to((grid.pT[:, None] * grid.cos_phi[None, :])[None],
                            (S, NpT, Nphi)).reshape(M)
    py_m = jnp.broadcast_to((grid.pT[:, None] * grid.sin_phi[None, :])[None],
                            (S, NpT, Nphi)).reshape(M)
    mass2_m = jnp.broadcast_to((species.mass ** 2)[:, None, None],
                               (S, NpT, Nphi)).reshape(M)
    b_m = jnp.broadcast_to(species.baryon[:, None, None], (S, NpT, Nphi)).reshape(M)
    sgn_m = jnp.broadcast_to(species.sign[:, None, None], (S, NpT, Nphi)).reshape(M)
    return tuple(a.astype(dtype) for a in (mT_m, px_m, py_m, mass2_m, b_m, sgn_m))


def momentum_matrix_3d(species: SpeciesArrays, grid: MomentumGridDevice, dtype):
    """3+1d per-m arrays with m = (species, pT, phi, y).

    Uses the light-cone basis m+ = mT e^{+y}, m- = mT e^{-y} so that
    pt = (e^{-eta} m+ + e^{eta} m-)/2 is a sum of positives — no catastrophic
    cancellation in f32 (a cosh/sinh basis cancels ~e^{|y|+|eta|} down to
    O(1)).  The cell's eta_c becomes a per-cell rescale of the contraction
    rows (see _cell_Q_3d), eliminating the eta loop entirely."""
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)  # (s,p)
    S, NpT = mT.shape
    Nphi = grid.cos_phi.shape[0]
    Ny = grid.y.shape[0]
    shape = (S, NpT, Nphi, Ny)
    M = S * NpT * Nphi * Ny

    exp_p = jnp.exp(grid.y)
    exp_m = jnp.exp(-grid.y)

    def flat(a):
        return jnp.broadcast_to(a, shape).reshape(M).astype(dtype)

    m_plus = flat(mT[:, :, None, None] * exp_p[None, None, None, :])
    m_minus = flat(mT[:, :, None, None] * exp_m[None, None, None, :])
    px_m = flat((grid.pT[:, None] * grid.cos_phi[None, :])[None, :, :, None])
    py_m = flat((grid.pT[:, None] * grid.sin_phi[None, :])[None, :, :, None])
    mass2_m = flat((species.mass ** 2)[:, None, None, None])
    b_m = flat(species.baryon[:, None, None, None])
    sgn_m = flat(species.sign[:, None, None, None])
    return (m_plus, px_m, py_m, mass2_m, b_m, sgn_m, m_minus)


def _cell_Q_3d(cells: CellArrays, coeffs: dict, dtype):
    """Per-cell contraction rows for 3+1d in the light-cone basis:
    pt = a m+ + b m-, tau pn = a m+ - b m- with a = e^{-eta}/2, b = e^{eta}/2.
    """
    c = cells
    tau = c.tau
    tau2 = tau * tau
    a = 0.5 * jnp.exp(-c.eta)
    b = 0.5 * jnp.exp(c.eta)

    # u.p = pt ut - px ux - py uy - (tau pn)(tau un)/tau... = pt ut - (tau un)(tau pn)/tau
    # with tau pn = a m+ - b m-: coefficient of m+ is a(ut - tau un),
    # of m- is b(ut + tau un) -- both sums of like-signed terms
    tun = tau * c.un
    Q_E = jnp.stack([a * (c.ut - tun), -c.ux, -c.uy, b * (c.ut + tun)], axis=1)
    dan_t = c.dan / tau
    Q_d = jnp.stack([a * (c.dat + dan_t), c.dax, c.day,
                     b * (c.dat - dan_t)], axis=1)

    # quadratic coefficients against basis (pt, px, py, tau pn) ...
    k1 = c.pitt
    k2 = c.pixx
    k3 = c.piyy
    k4 = tau2 * c.pinn
    k5 = -2.0 * c.pitx
    k6 = -2.0 * c.pity
    k7 = -2.0 * tau * c.pitn
    k8 = 2.0 * c.pixy
    k9 = 2.0 * tau * c.pixn
    k10 = 2.0 * tau * c.piyn
    # ... transformed to (m+, px, py, m-): pt = a m+ + b m-, d = a m+ - b m-
    Q_pi = jnp.stack([
        a * a * (k1 + k4 + k7),        # m+ m+
        k2,                            # px px
        k3,                            # py py
        b * b * (k1 + k4 - k7),        # m- m-
        a * (k5 + k9),                 # m+ px
        a * (k6 + k10),                # m+ py
        2.0 * a * b * (k1 - k4),       # m+ m-
        k8,                            # px py
        b * (k5 - k9),                 # px m-
        b * (k6 - k10),                # py m-
    ], axis=1)
    tVn = tau * c.Vn
    Q_V = jnp.stack([a * (c.Vt - tVn), -c.Vx, -c.Vy, b * (c.Vt + tVn)], axis=1)

    cols = {k: v.astype(dtype) for k, v in coeffs.items()}
    return {
        "Q_E": Q_E.astype(dtype),
        "Q_d": Q_d.astype(dtype),
        "Q_pi": Q_pi.astype(dtype),
        "Q_V": Q_V.astype(dtype),
        "invT": (1.0 / c.T).astype(dtype),
        "alphaB": c.alphaB.astype(dtype),
        "mask": c.mask.astype(dtype),
        **cols,
    }


def _cell_Q(cells: CellArrays, coeffs: dict, dtype):
    """Per-cell contraction coefficient rows."""
    c = cells
    tau = c.tau
    tau2 = tau * tau
    # u.p rows against (mT cosh, px, py, mT sinh):
    #   E = mT cosh . ut - px ux - py uy - (mT sinh / tau) tau^2 un
    Q_E = jnp.stack([c.ut, -c.ux, -c.uy, -tau * c.un], axis=1)
    # p.dsigma = mT cosh . dat + px dax + py day + (mT sinh / tau) dan
    Q_d = jnp.stack([c.dat, c.dax, c.day, c.dan / tau], axis=1)
    # pi^munu p_mu p_nu against the 10 quadratics
    # (m1m1, m2m2, m3m3, m4m4, m1m2, m1m3, m1m4, m2m3, m2m4, m3m4)
    Q_pi = jnp.stack([
        c.pitt, c.pixx, c.piyy, tau2 * c.pinn,
        -2.0 * c.pitx, -2.0 * c.pity, -2.0 * tau * c.pitn,
        2.0 * c.pixy, 2.0 * tau * c.pixn, 2.0 * tau * c.piyn,
    ], axis=1)
    Q_V = jnp.stack([c.Vt, -c.Vx, -c.Vy, -tau * c.Vn], axis=1)

    cols = {k: v.astype(dtype) for k, v in coeffs.items()}
    per_cell = {
        "Q_E": Q_E.astype(dtype),
        "Q_d": Q_d.astype(dtype),
        "Q_pi": Q_pi.astype(dtype),
        "Q_V": Q_V.astype(dtype),
        "invT": (1.0 / c.T).astype(dtype),
        "alphaB": c.alphaB.astype(dtype),
        "mask": c.mask.astype(dtype),
        **cols,
    }
    return per_cell


def _value_at_eta(q: dict, mom, cosh_e, sinh_e, cfg: Config):
    """Weighted df 1/2 integrand value (C, M) at one 2+1d eta point."""
    mT_m, px_m, py_m, mass2_m, b_m, sgn_m = mom
    P = [mT_m * cosh_e, px_m, py_m, mT_m * sinh_e]

    E = _contract(q["Q_E"], P)                            # (C, M)
    pdd = _contract(q["Q_d"], P)

    if cfg.include_shear_deltaf:
        PP = [P[0] * P[0], P[1] * P[1], P[2] * P[2], P[3] * P[3],
              P[0] * P[1], P[0] * P[2], P[0] * P[3],
              P[1] * P[2], P[1] * P[3], P[2] * P[3]]
        pim = _contract(q["Q_pi"], PP)
    else:
        pim = 0.0

    if cfg.include_baryon and cfg.include_baryondiff_deltaf:
        Vp = _contract(q["Q_V"], P)
    else:
        Vp = 0.0

    a = E * q["invT"][:, None] - q["alphaB"][:, None] * b_m[None, :]
    feq = 1.0 / (jnp.exp(a) + sgn_m[None, :])
    feqbar = 1.0 - sgn_m[None, :] * feq

    if cfg.df_mode == 1:
        df = (q["shear"][:, None] * pim
              + q["bulk0"][:, None] * mass2_m[None, :]
              + (q["bulk1"][:, None] * b_m[None, :]
                 + q["bulk2"][:, None] * E) * E)
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            df = df + (q["diff0"][:, None] * b_m[None, :]
                       + q["diff1"][:, None] * E) * Vp
    else:
        df = (q["shear"][:, None] * pim / E
              + q["bulk0"][:, None] * E
              + q["bulk1"][:, None] * b_m[None, :]
              + q["bulk2"][:, None] * (E - mass2_m[None, :] / E))
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            df = df + (q["diff0"][:, None]
                       - q["diff1"][:, None] * b_m[None, :] / E) * Vp
    df = feqbar * df
    if cfg.regulate_deltaf:
        df = jnp.clip(df, -1.0, 1.0)
    if cfg.outflow:
        pdd = jnp.where(pdd > 0.0, pdd, 0.0)

    return pdd * (feq * (1.0 + df))                       # (C, M)


def _block_fast(q: dict, mom, eta, eta_w, cfg: Config, acc_dtype):
    """One cell block: loop eta points, contractions + fused VPU chain,
    cell reduction.  Returns (M,) partial spectra."""
    mT_m = mom[0]
    M = mT_m.shape[0]

    def one_eta(carry, ew):
        acc = carry
        cosh_e, sinh_e, w_e = ew
        value = _value_at_eta(q, mom, cosh_e, sinh_e, cfg)
        # cell reduction: fused f32 multiply + reduce (a DEFAULT-precision
        # mask matmul would round the values to bf16 on TPU)
        partial = jnp.sum(q["mask"][:, None] * value, axis=0)
        return acc + (w_e * partial).astype(acc_dtype), None

    acc0 = jnp.zeros(M, dtype=acc_dtype)
    cosh = jnp.cosh(eta)
    sinh = -jnp.sinh(eta)  # y = 0: Delta = -eta
    acc, _ = jax.lax.scan(one_eta, acc0, (cosh.astype(mT_m.dtype),
                                          sinh.astype(mT_m.dtype),
                                          eta_w.astype(acc_dtype)))
    return acc


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_m_blocks"))
def _dNdy_cells_fast_jit(per_cell: dict, mom, w_m, eta, eta_w, cfg: Config,
                         n_blocks: int, n_m_blocks: int):
    """Per-cell, per-species dN/dy for operation 0 (dN/dX): the same df 1/2
    integrand, reduced over the momentum axis (pT, phi weights) instead of
    over cells.  Returns (C_total, S) f64."""
    C_total = per_cell["invT"].shape[0]
    blk = C_total // n_blocks
    M = mom[0].shape[0]
    m_blk = M // n_m_blocks
    # w_m: (S_total, M1) per-species momentum weights
    S_total = w_m.shape[0]
    S_blk = S_total // n_m_blocks
    M1 = M // S_total              # points per species (NpT * Nphi)

    def body(acc, ij):
        i = ij // n_m_blocks
        j = ij % n_m_blocks
        q = {k: jax.lax.dynamic_slice_in_dim(v, i * blk, blk, 0)
             for k, v in per_cell.items()}
        mom_j = tuple(jax.lax.dynamic_slice_in_dim(a, j * m_blk, m_blk, 0)
                      for a in mom)
        wj = jax.lax.dynamic_slice_in_dim(w_m, j * S_blk, S_blk, 0)  # (S_blk, M1)

        def one_eta(carry, ew):
            acc_e = carry
            cosh_e, sinh_e, w_e = ew
            value = _value_at_eta(q, mom_j, cosh_e, sinh_e, cfg)
            v3 = value.reshape(blk, S_blk, M1)
            # fused VPU multiply+reduce, NOT an einsum: a DEFAULT-precision
            # MXU dot rounds its f32 inputs to bf16 on TPU (~1e-3), and the
            # unfused dot materializes the (blk, M) intermediate to HBM
            part = jnp.sum(v3 * wj[None, :, :], axis=2)
            return acc_e + w_e * part, None

        cosh = jnp.cosh(eta)
        sinh = -jnp.sinh(eta)
        # eta accumulation in f32: <= ~100 nonnegative quadrature terms
        # (error ~1e-7 relative); the cross-cell bin sums upcast to f64 in
        # the scatter epilogue (_scatter_dN_jit)
        part_cs, _ = jax.lax.scan(
            one_eta, jnp.zeros((blk, S_blk), mom[0].dtype),
            (cosh.astype(mom[0].dtype), sinh.astype(mom[0].dtype),
             eta_w.astype(mom[0].dtype)))
        return jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (i * blk, j * S_blk),
                                       (blk, S_blk)) + part_cs,
            (i * blk, j * S_blk)), None

    acc, _ = jax.lax.scan(body,
                          jnp.zeros((C_total, S_total), mom[0].dtype),
                          jnp.arange(n_blocks * n_m_blocks))
    return acc


def compute_dN_dy_cells_fast(cells: CellArrays, coeffs: dict,
                             species: SpeciesArrays, grid: MomentumGridDevice,
                             cfg: Config, n_blocks: int,
                             n_species_blocks: int = 1) -> jnp.ndarray:
    """(C, S) per-cell dN/dy via the f32 fast integrand (df 1/2, 2+1d), for
    the spacetime distributions (SpacetimeDistribution.cpp:330-404)."""
    if cfg.df_mode not in (1, 2) or cfg.dimension != 2:
        raise ValueError("fast dN/dy implements df 1/2, 2+1d")
    cells, grid, _ = fold_eta_quadrature(cells, grid, cfg)
    S = species.mass.shape[0]
    if S % n_species_blocks != 0:
        raise ValueError("n_species_blocks must divide the species count")
    per_cell = _cell_Q(cells, coeffs, jnp.float32)
    mom = momentum_matrix(species, grid, jnp.float32)
    w_pf = (grid.pT_weight[:, None] * grid.phi_weight[None, :]).reshape(-1)
    w_m = jnp.broadcast_to(w_pf[None, :].astype(jnp.float32),
                           (S, w_pf.shape[0]))
    dN = _dNdy_cells_fast_jit(per_cell, mom, w_m,
                              grid.eta.astype(jnp.float32),
                              grid.eta_weight, cfg, n_blocks,
                              n_species_blocks)
    from .spectra import PREFACTOR
    return dN * PREFACTOR * species.degeneracy[None, :]


def _block_fast_3d(q: dict, mom, cfg: Config, acc_dtype):
    """One cell block in 3+1d: no eta loop (the cell rapidity lives in the
    rotated Q rows); one pass of contractions + df chain + cell reduction."""
    m1, px_m, py_m, mass2_m, b_m, sgn_m, m4 = mom
    P = [m1, px_m, py_m, m4]

    E = _contract(q["Q_E"], P)
    pdd = _contract(q["Q_d"], P)
    if cfg.include_shear_deltaf:
        PP = [P[0] * P[0], P[1] * P[1], P[2] * P[2], P[3] * P[3],
              P[0] * P[1], P[0] * P[2], P[0] * P[3],
              P[1] * P[2], P[1] * P[3], P[2] * P[3]]
        pim = _contract(q["Q_pi"], PP)
    else:
        pim = 0.0
    if cfg.include_baryon and cfg.include_baryondiff_deltaf:
        Vp = _contract(q["Q_V"], P)
    else:
        Vp = 0.0

    a = E * q["invT"][:, None] - q["alphaB"][:, None] * b_m[None, :]
    feq = 1.0 / (jnp.exp(a) + sgn_m[None, :])
    feqbar = 1.0 - sgn_m[None, :] * feq

    if cfg.df_mode == 1:
        df = (q["shear"][:, None] * pim + q["bulk0"][:, None] * mass2_m[None, :]
              + (q["bulk1"][:, None] * b_m[None, :] + q["bulk2"][:, None] * E) * E)
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            df = df + (q["diff0"][:, None] * b_m[None, :]
                       + q["diff1"][:, None] * E) * Vp
    else:
        df = (q["shear"][:, None] * pim / E + q["bulk0"][:, None] * E
              + q["bulk1"][:, None] * b_m[None, :]
              + q["bulk2"][:, None] * (E - mass2_m[None, :] / E))
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            df = df + (q["diff0"][:, None]
                       - q["diff1"][:, None] * b_m[None, :] / E) * Vp
    df = feqbar * df
    if cfg.regulate_deltaf:
        df = jnp.clip(df, -1.0, 1.0)
    if cfg.outflow:
        pdd = jnp.where(pdd > 0.0, pdd, 0.0)

    value = pdd * (feq * (1.0 + df))
    partial_m = jnp.sum(q["mask"][:, None] * value, axis=0)
    return partial_m.astype(acc_dtype)


def momentum_matrix_3d_comp(species: SpeciesArrays,
                            grid: MomentumGridDevice):
    """12-bit-split f64 light-cone momentum rows for the 3+1d compensated
    argument (m = species x pT x phi x y) plus the plain f32 rows."""
    f64 = jnp.float64
    f32 = jnp.float32
    mT64 = jnp.sqrt(species.mass[:, None].astype(f64) ** 2
                    + grid.pT[None, :].astype(f64) ** 2)
    S, NpT = mT64.shape
    Nphi = grid.cos_phi.shape[0]
    Ny = grid.y.shape[0]
    shape = (S, NpT, Nphi, Ny)
    M = S * NpT * Nphi * Ny

    def flat(a):
        return jnp.broadcast_to(a, shape).reshape(M)

    y64 = grid.y.astype(f64)
    mp64 = flat(mT64[:, :, None, None] * jnp.exp(y64)[None, None, None, :])
    mm64 = flat(mT64[:, :, None, None] * jnp.exp(-y64)[None, None, None, :])
    px64 = flat((grid.pT[:, None] * grid.cos_phi[None, :]
                 ).astype(f64)[None, :, :, None])
    py64 = flat((grid.pT[:, None] * grid.sin_phi[None, :]
                 ).astype(f64)[None, :, :, None])
    out = {}
    for name, v in (("mp", mp64), ("px", px64), ("py", py64), ("mm", mm64)):
        hi, lo = _split12(v)
        out[name + "1"], out[name + "2"] = hi, lo
        out[name + "f"] = v.astype(f32)
    out["mass2"] = flat((species.mass ** 2)[:, None, None, None]).astype(f32)
    out["b"] = flat(species.baryon[:, None, None, None]).astype(f32)
    out["sgn"] = flat(species.sign[:, None, None, None]).astype(f32)
    return out


def _cell_Q_3d_comp(cells: CellArrays, coeffs: dict):
    """Plain f32 3+1d rows (_cell_Q_3d) plus 12-bit splits of the
    invT-folded u.p light-cone coefficients and alphaB.  Unlike 2+1d there
    is no eta loop to fold hyperbolics into: the cell rapidity already
    lives in the (eta-rescaled) Q rows, so the compensated argument is a
    single K=4 exact-product TwoSum chain."""
    base = _cell_Q_3d(cells, coeffs, jnp.float32)
    c = cells
    f64 = jnp.float64
    invT = 1.0 / c.T.astype(f64)
    a = 0.5 * jnp.exp(-c.eta.astype(f64))
    b = 0.5 * jnp.exp(c.eta.astype(f64))
    tun = (c.tau * c.un).astype(f64)
    ut = c.ut.astype(f64)
    qp1, qp2 = _split12(a * (ut - tun) * invT)      # m+ coefficient / T
    qx1, qx2 = _split12(-c.ux.astype(f64) * invT)
    qy1, qy2 = _split12(-c.uy.astype(f64) * invT)
    qm1, qm2 = _split12(b * (ut + tun) * invT)      # m- coefficient / T
    abf, abl = _split12(c.alphaB.astype(f64))
    base.update(qp1=qp1, qp2=qp2, qx1=qx1, qx2=qx2, qy1=qy1, qy2=qy2,
                qm1=qm1, qm2=qm2, abf=abf, abl=abl,
                Tf=c.T.astype(jnp.float32))
    return base


def _block_fast_3d_comp(q: dict, mom: dict, cfg: Config):
    """One 3+1d cell block with the compensated exp argument (the f32c
    trick of _block_fast_comp without the eta loop): 4 exact 12-bit main
    products + TwoSum chain; everything else the plain f32 chain of
    _block_fast_3d.  Returns the f64 partial over the block's cells."""
    mpf, pxf, pyf, mmf = mom["mpf"], mom["pxf"], mom["pyf"], mom["mmf"]
    b_m = mom["b"]
    sgn_m = mom["sgn"]
    mass2_m = mom["mass2"]

    col = lambda k: q[k][:, None]
    row = lambda v: v[None, :]

    # ---- compensated argument a = u.p/T - alphaB b ----
    t1 = col("qp1") * row(mom["mp1"])               # exact products
    t2 = col("qx1") * row(mom["px1"])
    t3 = col("qy1") * row(mom["py1"])
    t4 = col("qm1") * row(mom["mm1"])
    t5 = -(col("abf") * row(b_m))                   # b in {-1,0,1}: exact
    d = (col("qp1") * row(mom["mp2"]) + col("qp2") * row(mpf)
         + col("qx1") * row(mom["px2"]) + col("qx2") * row(pxf)
         + col("qy1") * row(mom["py2"]) + col("qy2") * row(pyf)
         + col("qm1") * row(mom["mm2"]) + col("qm2") * row(mmf)
         - col("abl") * row(b_m))
    s, e1 = _two_sum(t1, t2)
    s, e2 = _two_sum(s, t3)
    s, e3 = _two_sum(s, t4)
    s, e4 = _two_sum(s, t5)
    A, r = _two_sum(s, d + (e1 + e2 + e3 + e4))
    eA = jnp.exp(A)
    feq = 1.0 / (eA * (1.0 + r) + sgn_m[None, :])
    feqbar = 1.0 - sgn_m[None, :] * feq
    E = (A + col("abf") * row(b_m)) * col("Tf")     # GeV, for the df chain

    # ---- plain f32 linear pieces (as _block_fast_3d) ----
    P = [mpf, pxf, pyf, mmf]
    pdd = _contract(q["Q_d"], P)
    if cfg.include_shear_deltaf:
        PP = [P[0] * P[0], P[1] * P[1], P[2] * P[2], P[3] * P[3],
              P[0] * P[1], P[0] * P[2], P[0] * P[3],
              P[1] * P[2], P[1] * P[3], P[2] * P[3]]
        pim = _contract(q["Q_pi"], PP)
    else:
        pim = 0.0
    if cfg.include_baryon and cfg.include_baryondiff_deltaf:
        Vp = _contract(q["Q_V"], P)
    else:
        Vp = 0.0

    if cfg.df_mode == 1:
        df = (col("shear") * pim + col("bulk0") * row(mass2_m)
              + (col("bulk1") * row(b_m) + col("bulk2") * E) * E)
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            df = df + (col("diff0") * row(b_m) + col("diff1") * E) * Vp
    else:
        df = (col("shear") * pim / E + col("bulk0") * E
              + col("bulk1") * row(b_m)
              + col("bulk2") * (E - row(mass2_m) / E))
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            df = df + (col("diff0") - col("diff1") * row(b_m) / E) * Vp
    df = feqbar * df
    if cfg.regulate_deltaf:
        df = jnp.clip(df, -1.0, 1.0)
    if cfg.outflow:
        pdd = jnp.where(pdd > 0.0, pdd, 0.0)

    value = pdd * (feq * (1.0 + df))
    return jnp.sum(q["mask"][:, None] * value, axis=0).astype(jnp.float64)


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_m_blocks"))
def _spectra_fast_3d_comp_jit(per_cell: dict, mom: dict, cfg: Config,
                              n_blocks: int, n_m_blocks: int):
    C_total = per_cell["invT"].shape[0]
    blk = C_total // n_blocks
    M = mom["mpf"].shape[0]
    m_blk = M // n_m_blocks

    def body(acc, ij):
        i = ij // n_m_blocks
        j = ij % n_m_blocks
        qb = {k: jax.lax.dynamic_slice_in_dim(v, i * blk, blk, 0)
              for k, v in per_cell.items()}
        mom_j = {k: jax.lax.dynamic_slice_in_dim(v, j * m_blk, m_blk, 0)
                 for k, v in mom.items()}
        part = _block_fast_3d_comp(qb, mom_j, cfg)
        return jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (j * m_blk,), (m_blk,)) + part,
            (j * m_blk,)), None

    acc, _ = jax.lax.scan(body, jnp.zeros(M, dtype=jnp.float64),
                          jnp.arange(n_blocks * n_m_blocks))
    return acc


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_m_blocks",
                                   "acc_dtype_name"))
def _spectra_fast_3d_jit(per_cell: dict, mom, cfg: Config, n_blocks: int,
                         n_m_blocks: int, acc_dtype_name: str):
    acc_dtype = jnp.dtype(acc_dtype_name)
    C_total = per_cell["invT"].shape[0]
    blk = C_total // n_blocks
    M = mom[0].shape[0]
    m_blk = M // n_m_blocks

    def body(acc, ij):
        i = ij // n_m_blocks
        j = ij % n_m_blocks
        q = {k: jax.lax.dynamic_slice_in_dim(v, i * blk, blk, 0)
             for k, v in per_cell.items()}
        mom_j = tuple(jax.lax.dynamic_slice_in_dim(a, j * m_blk, m_blk, 0)
                      for a in mom)
        part = _block_fast_3d(q, mom_j, cfg, acc_dtype)
        return jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (j * m_blk,), (m_blk,)) + part,
            (j * m_blk,)), None

    acc, _ = jax.lax.scan(body, jnp.zeros(M, dtype=acc_dtype),
                          jnp.arange(n_blocks * n_m_blocks))
    return acc


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_m_blocks",
                                   "acc_dtype_name"))
def _spectra_fast_jit(per_cell: dict, mom, eta, eta_w, cfg: Config,
                      n_blocks: int, n_m_blocks: int, acc_dtype_name: str):
    acc_dtype = jnp.dtype(acc_dtype_name)
    C_total = per_cell["invT"].shape[0]
    blk = C_total // n_blocks
    M = mom[0].shape[0]
    m_blk = M // n_m_blocks

    def take(a, i):
        return jax.lax.dynamic_slice_in_dim(a, i * blk, blk, axis=0)

    def take_m(a, j):
        return jax.lax.dynamic_slice_in_dim(a, j * m_blk, m_blk, axis=0)

    def body(acc, ij):
        i = ij // n_m_blocks
        j = ij % n_m_blocks
        q = {k: take(v, i) for k, v in per_cell.items()}
        mom_j = tuple(take_m(a, j) for a in mom)
        part = _block_fast(q, mom_j, eta, eta_w, cfg, acc_dtype)
        return jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (j * m_blk,), (m_blk,)) + part,
            (j * m_blk,)), None

    acc, _ = jax.lax.scan(body, jnp.zeros(M, dtype=acc_dtype),
                          jnp.arange(n_blocks * n_m_blocks))
    return acc


# ----------------------------------------------------------------------
# compensated fast path ("f32c"): <= 1e-6 accuracy at fast-path speed
# ----------------------------------------------------------------------
#
# The plain f32 fast path is ~3e-6 relative: the exp amplifies the f32
# rounding of its argument a = u.p/T - alphaB b (|a| up to ~40, f32 ulp
# 2^-24 |a| ~ 2.4e-6 absolute -> the same relative error on exp(a)).  The
# compensated path computes ONLY that argument in exact-product split
# arithmetic -- everything else (p.dsigma, pi pp, the delta-f chain) stays
# plain f32, whose ~1e-7 LINEAR noise is harmless:
#
#   * every f64 factor splits into (hi, lo) with hi carrying 12 significant
#     bits, so every hi*hi product is EXACT in f32 (12+12 <= 24-bit
#     mantissa), and the cross terms hi*lo + lo*full carry the rest;
#   * the main terms sum through branchless Knuth TwoSum chains (error-free
#     at each step), the small parts accumulate separately;
#   * one final TwoSum renormalizes to A + r with |r| <= ulp(A), and
#     exp(a) = exp(A) * (1 + r) to ~(ulp)^2.
#
# Residual error: the f32 exp intrinsic (~1 ulp, 6e-8 relative) plus ~1e-7
# linear f32 noise -- validated <= 1e-6 vs the f64 broadcast kernel
# (tests/test_spectra_fast.py::test_compensated_accuracy), at 0.99-1.0x
# the plain-f32 WALL measured interleaved on the TPU (the ~45 extra VPU
# flops hide behind the exp/issue bound).  This is the
# path that meets the BASELINE accuracy bar (<=1e-6) and the speed bar at
# once; select with compute_dtype = "f32c".  2+1d df 1/2 (the north-star
# spectra stage); other engines keep the dual-bar (f32 fast / f64 exact)
# reporting.


def _two_sum(x, y):
    """Branchless Knuth TwoSum: s + err == x + y exactly (6 flops)."""
    s = x + y
    b = s - x
    return s, (x - (s - b)) + (y - b)


def _split12(x64):
    """Split f64 -> (hi, lo) f32 with hi carrying 12 significant bits, so
    products of two hi parts are exact in f32."""
    h = x64.astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(h, jnp.uint32)
        & jnp.uint32(0xFFFFF000), jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def momentum_matrix_comp(species: SpeciesArrays, grid: MomentumGridDevice):
    """Split f64 momentum rows for the compensated argument + plain f32
    rows for the linear pieces (m = species x pT x phi)."""
    mT64 = jnp.sqrt(species.mass[:, None].astype(jnp.float64) ** 2
                    + grid.pT[None, :].astype(jnp.float64) ** 2)
    S, NpT = mT64.shape
    Nphi = grid.cos_phi.shape[0]
    M = S * NpT * Nphi

    def flat(a):
        return jnp.broadcast_to(a, (S, NpT, Nphi)).reshape(M)

    mT64 = flat(mT64[:, :, None])
    px64 = flat((grid.pT[:, None] * grid.cos_phi[None, :]
                 ).astype(jnp.float64)[None])
    py64 = flat((grid.pT[:, None] * grid.sin_phi[None, :]
                 ).astype(jnp.float64)[None])
    mT1, mT2 = _split12(mT64)
    px1, px2 = _split12(px64)
    py1, py2 = _split12(py64)
    f32 = jnp.float32
    return {
        "mT1": mT1, "mT2": mT2, "mTf": mT64.astype(f32),
        "px1": px1, "px2": px2, "pxf": px64.astype(f32),
        "py1": py1, "py2": py2, "pyf": py64.astype(f32),
        "mass2": flat((species.mass ** 2)[:, None, None]).astype(f32),
        "b": flat(species.baryon[:, None, None]).astype(f32),
        "sgn": flat(species.sign[:, None, None]).astype(f32),
    }


def _cell_Q_comp(cells: CellArrays, coeffs: dict, eta64):
    """Plain f32 per-cell rows (_cell_Q) plus the compensated-argument
    pieces: per-(eta, cell) split coefficients of the mT row of u.p/T (the
    eta hyperbolics fold into the CELL coefficient, so the hot contraction
    has K = 3 exact products), split px/py coefficients, and the split
    alphaB.  All f64 prep here is (cells,)- or (eta, cells)-sized."""
    base = _cell_Q(cells, coeffs, jnp.float32)
    c = cells
    invT = 1.0 / c.T.astype(jnp.float64)
    cosh_e = jnp.cosh(eta64)[:, None]                  # (Ne, 1)
    sinh_e = (-jnp.sinh(eta64))[:, None]               # y = 0: Delta = -eta
    # E/T coefficient of mT: (ut cosh_e - tau un sinh_e) / T  (see _cell_Q)
    qm64 = (c.ut.astype(jnp.float64)[None, :] * cosh_e
            - (c.tau * c.un).astype(jnp.float64)[None, :] * sinh_e) \
        * invT[None, :]
    qm1, qm2 = _split12(qm64)                          # (Ne, C)
    qx1, qx2 = _split12(-c.ux.astype(jnp.float64) * invT)
    qy1, qy2 = _split12(-c.uy.astype(jnp.float64) * invT)
    abf, abl = _split12(c.alphaB.astype(jnp.float64))
    base.update(qx1=qx1, qx2=qx2, qy1=qy1, qy2=qy2, abf=abf, abl=abl,
                Tf=c.T.astype(jnp.float32))
    return base, qm1, qm2


def _block_fast_comp(q: dict, qm1_b, qm2_b, mom: dict, eta, eta_w,
                     cfg: Config, acc_dtype):
    """One cell block of the compensated kernel: the exp argument in
    split-exact arithmetic, everything else the plain f32 chain of
    _value_at_eta."""
    mTf = mom["mTf"]
    M = mTf.shape[0]
    b_m = mom["b"]
    sgn_m = mom["sgn"]
    mass2_m = mom["mass2"]

    def one_eta(carry, xs):
        acc = carry
        cosh_e, sinh_e, w_e, qm1, qm2 = xs
        # ---- compensated argument a = u.p/T - alphaB b ----
        t1 = qm1[:, None] * mom["mT1"][None, :]        # exact products
        t2 = q["qx1"][:, None] * mom["px1"][None, :]
        t3 = q["qy1"][:, None] * mom["py1"][None, :]
        t4 = -(q["abf"][:, None] * b_m[None, :])       # b in {-1,0,1}: exact
        # cross/low corrections: qm*mT = t1 + qm1*mT2 + qm2*mTf (+O(2^-36))
        d = (qm1[:, None] * mom["mT2"][None, :]
             + qm2[:, None] * mTf[None, :]
             + q["qx1"][:, None] * mom["px2"][None, :]
             + q["qx2"][:, None] * mom["pxf"][None, :]
             + q["qy1"][:, None] * mom["py2"][None, :]
             + q["qy2"][:, None] * mom["pyf"][None, :]
             - q["abl"][:, None] * b_m[None, :])
        s, e1 = _two_sum(t1, t2)
        s, e2 = _two_sum(s, t3)
        s, e3 = _two_sum(s, t4)
        A, r = _two_sum(s, d + (e1 + e2 + e3))
        eA = jnp.exp(A)
        feq = 1.0 / (eA * (1.0 + r) + sgn_m[None, :])
        feqbar = 1.0 - sgn_m[None, :] * feq
        # E in GeV for the linear delta-f pieces (f32 accuracy suffices)
        E = (A + q["abf"][:, None] * b_m[None, :]) * q["Tf"][:, None]

        # ---- plain f32 linear pieces (as _value_at_eta) ----
        P = [mTf * cosh_e, mom["pxf"], mom["pyf"], mTf * sinh_e]
        pdd = _contract(q["Q_d"], P)
        if cfg.include_shear_deltaf:
            PP = [P[0] * P[0], P[1] * P[1], P[2] * P[2], P[3] * P[3],
                  P[0] * P[1], P[0] * P[2], P[0] * P[3],
                  P[1] * P[2], P[1] * P[3], P[2] * P[3]]
            pim = _contract(q["Q_pi"], PP)
        else:
            pim = 0.0
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            Vp = _contract(q["Q_V"], P)
        else:
            Vp = 0.0

        if cfg.df_mode == 1:
            df = (q["shear"][:, None] * pim
                  + q["bulk0"][:, None] * mass2_m[None, :]
                  + (q["bulk1"][:, None] * b_m[None, :]
                     + q["bulk2"][:, None] * E) * E)
            if cfg.include_baryon and cfg.include_baryondiff_deltaf:
                df = df + (q["diff0"][:, None] * b_m[None, :]
                           + q["diff1"][:, None] * E) * Vp
        else:
            df = (q["shear"][:, None] * pim / E
                  + q["bulk0"][:, None] * E
                  + q["bulk1"][:, None] * b_m[None, :]
                  + q["bulk2"][:, None] * (E - mass2_m[None, :] / E))
            if cfg.include_baryon and cfg.include_baryondiff_deltaf:
                df = df + (q["diff0"][:, None]
                           - q["diff1"][:, None] * b_m[None, :] / E) * Vp
        df = feqbar * df
        if cfg.regulate_deltaf:
            df = jnp.clip(df, -1.0, 1.0)
        if cfg.outflow:
            pdd = jnp.where(pdd > 0.0, pdd, 0.0)

        value = pdd * (feq * (1.0 + df))
        partial = jnp.sum(q["mask"][:, None] * value, axis=0)
        return acc + (w_e * partial).astype(acc_dtype), None

    f32 = jnp.float32
    cosh = jnp.cosh(eta).astype(f32)
    sinh = (-jnp.sinh(eta)).astype(f32)
    acc0 = jnp.zeros(M, dtype=acc_dtype)
    acc, _ = jax.lax.scan(one_eta, acc0,
                          (cosh, sinh, eta_w.astype(acc_dtype),
                           qm1_b, qm2_b))
    return acc


@partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_m_blocks"))
def _spectra_fast_comp_jit(per_cell: dict, qm1, qm2, mom: dict, eta, eta_w,
                           cfg: Config, n_blocks: int, n_m_blocks: int):
    C_total = per_cell["invT"].shape[0]
    blk = C_total // n_blocks
    M = mom["mTf"].shape[0]
    m_blk = M // n_m_blocks

    def body(acc, ij):
        i = ij // n_m_blocks
        j = ij % n_m_blocks
        q = {k: jax.lax.dynamic_slice_in_dim(v, i * blk, blk, 0)
             for k, v in per_cell.items()}
        qm1_b = jax.lax.dynamic_slice_in_dim(qm1, i * blk, blk, 1)
        qm2_b = jax.lax.dynamic_slice_in_dim(qm2, i * blk, blk, 1)
        mom_j = {k: jax.lax.dynamic_slice_in_dim(v, j * m_blk, m_blk, 0)
                 for k, v in mom.items()}
        part = _block_fast_comp(q, qm1_b, qm2_b, mom_j, eta, eta_w, cfg,
                                jnp.float64)
        return jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (j * m_blk,), (m_blk,)) + part,
            (j * m_blk,)), None

    acc, _ = jax.lax.scan(body, jnp.zeros(M, dtype=jnp.float64),
                          jnp.arange(n_blocks * n_m_blocks))
    return acc


@jax.jit
def _odd_eta_field_maxima(cells: CellArrays):
    """max|field| for every surface field that sources an odd-in-eta term
    of the 2+1d CF integrand, as ONE device program (one tunnel fetch)."""
    return jnp.stack([jnp.max(jnp.abs(f)) for f in
                      (cells.un, cells.dan, cells.pitn, cells.pixn,
                       cells.piyn, cells.Vn)])


def fold_eta_quadrature(cells: CellArrays, grid: MomentumGridDevice,
                        cfg: Config, strict: bool = False):
    """Fold the symmetric 2+1d eta quadrature onto half the nodes.

    At y = 0 the CF integrand splits into even and odd parts in eta.  The
    odd part -- sourced by un/dan (linear rows) and pitn/pixn/piyn/Vn
    (the m1m4/pxm4/pym4 quadratics and the V.p row) -- cancels PAIRWISE
    EXACTLY over the reference's symmetric Gauss nodes
    (/root/reference/tables/eta/eta_gauss_table_24pt.dat; the reference
    evaluates both +-eta and the sum annihilates the odd terms, so its
    value is identically the even part's integral).  Evaluating only the
    even part on the eta >= 0 half-nodes with doubled weights therefore
    reproduces the full 24-node quadrature exactly while halving the hot
    eta scan.

    Exactness gate (returns inputs unchanged when any fails):
      * cfg.dimension == 2 and cfg.eta_fold != 0 and >= 2 nodes;
      * the node/weight table is symmetric;
      * un == 0 everywhere (u.p sits inside exp: its odd part must vanish
        pointwise, not just in the sum);
      * dan == 0 OR every ACTIVE odd delta-f source (pitn/pixn/piyn when
        shear df is on, Vn when baryon diffusion is on) is zero -- the
        odd(dan)*odd(df) product in (p.dsigma)*feq*(1+df) is EVEN in eta
        and survives the full quadrature, so zeroing both would drop it;
      * outflow off OR dan == 0 (the outflow Theta(p.dsigma) is pointwise
        nonlinear in the odd dan term);
      * delta-f regulation off OR all active odd delta-f sources zero
        (the |df| <= 1 clip is pointwise nonlinear).
    The even part is selected by zeroing the odd source fields
    (dan/pitn/pixn/piyn/Vn) on the copy of ``cells`` used for this engine
    call; un is already exactly zero by the gate.

    ``strict=True`` is the gate for the NONLINEAR integrands (feqmod/famod:
    feq(|A^-1 p_LRF|/T_mod) is not linear in the odd sources, so they
    cannot be zeroed away): it requires EVERY odd source to be exactly
    zero, in which case the integrand is pointwise even -- true for every
    physical boost-invariant surface (un = dan = pi*n = Vn = 0) -- and the
    cfg sub-gates (outflow/regulation) are irrelevant.

    Returns (cells, grid, folded: bool).
    """
    if cfg.eta_fold == 0 or cfg.dimension != 2:
        return cells, grid, False
    if isinstance(grid.eta, jax.core.Tracer) or isinstance(cells.un,
                                                           jax.core.Tracer):
        # inside jit/shard_map the gate cannot read values; the host-level
        # wrapper is responsible for folding before tracing
        return cells, grid, False
    eta = np.asarray(grid.eta, dtype=np.float64)
    w = np.asarray(grid.eta_weight, dtype=np.float64)
    n = eta.shape[0]
    if n < 2:
        return cells, grid, False
    order = np.argsort(eta)
    es, ws = eta[order], w[order]
    if not (np.allclose(es, -es[::-1], rtol=0.0, atol=1e-14)
            and np.allclose(ws, ws[::-1], rtol=1e-14)):
        return cells, grid, False

    mx = np.asarray(_odd_eta_field_maxima(cells))
    un_mx, dan_mx, pitn_mx, pixn_mx, piyn_mx, vn_mx = (float(v) for v in mx)
    if strict:
        if max(un_mx, dan_mx, pitn_mx, pixn_mx, piyn_mx, vn_mx) != 0.0:
            return cells, grid, False
    else:
        if un_mx != 0.0:
            return cells, grid, False
        odd_df = 0.0
        if cfg.include_shear_deltaf:
            odd_df = max(pitn_mx, pixn_mx, piyn_mx)
        if cfg.include_baryon and cfg.include_baryondiff_deltaf:
            odd_df = max(odd_df, vn_mx)
        # The integrand is (p.dsigma) * feq * (1 + df): with BOTH an odd
        # p.dsigma term (dan) and an odd df source active, their product
        # odd(dan)*odd(df) is EVEN in eta and survives the full symmetric
        # quadrature -- zeroing both families would silently drop it, so
        # at most one family may be nonzero (regardless of outflow /
        # regulation, which only add further pointwise nonlinearities).
        if dan_mx != 0.0 and odd_df != 0.0:
            return cells, grid, False
        if cfg.outflow and dan_mx != 0.0:
            return cells, grid, False
        if cfg.regulate_deltaf and odd_df != 0.0:
            return cells, grid, False

    half = n // 2
    fold_eta = es[half + (n % 2):]
    fold_w = 2.0 * ws[half + (n % 2):]
    if n % 2:  # a zero node pairs with itself: keep its original weight
        fold_eta = np.concatenate([[0.0], fold_eta])
        fold_w = np.concatenate([[ws[half]], fold_w])

    if not strict:  # strict mode verified the odd sources are already zero
        zeros = jnp.zeros_like(cells.dan)
        cells = dataclasses.replace(cells, dan=zeros, pitn=zeros, pixn=zeros,
                                    piyn=zeros, Vn=zeros)
    grid = dataclasses.replace(
        grid, eta=jnp.asarray(fold_eta),
        eta_weight=jnp.asarray(fold_w))
    return cells, grid, True


def compute_spectra_fast(cells: CellArrays, coeffs: dict,
                         species: SpeciesArrays, grid: MomentumGridDevice,
                         cfg: Config, n_blocks: int,
                         compute_dtype=jnp.float32,
                         acc_dtype=jnp.float64,
                         n_species_blocks: int = 1) -> jnp.ndarray:
    """df 1/2 spectra, 2+1d, MXU-structured.  Returns (S, NpT, Nphi, 1).

    n_species_blocks additionally tiles the momentum axis (m = s*NpT*Nphi) to
    bound the (cells x m) working set; S must be divisible by it.

    Dtype note: compute_dtype=float32 is the TPU production path.  float64
    is supported for CPU validation, but on remote-TPU toolchains f64 MXU
    dots can crash the worker -- use the broadcast kernel (core/spectra.py)
    for on-TPU f64 accuracy runs.
    """
    if cfg.df_mode not in (1, 2):
        raise ValueError("fast path implements df modes 1/2")
    if cfg.dimension == 2:
        cells, grid, _ = fold_eta_quadrature(cells, grid, cfg)
    S = species.mass.shape[0]
    if S % n_species_blocks != 0:
        raise ValueError("n_species_blocks must divide the species count")
    NpT = grid.pT.shape[0]
    Nphi = grid.cos_phi.shape[0]

    if compute_dtype == "f32c" and cfg.dimension == 3:
        # 3+1d compensated path: the light-cone basis has no eta loop, so
        # the split-exact argument is a single K=4 TwoSum chain per point
        per_cell = _cell_Q_3d_comp(cells, coeffs)
        mom = momentum_matrix_3d_comp(species, grid)
        flat = _spectra_fast_3d_comp_jit(per_cell, mom, cfg, n_blocks,
                                         n_species_blocks)
        out = flat.reshape(S, NpT, Nphi, grid.y.shape[0])
        return (PREFACTOR * species.degeneracy.astype(out.dtype)
                [:, None, None, None] * out)

    if compute_dtype == "f32c":
        eta64 = grid.eta.astype(jnp.float64)
        per_cell, qm1, qm2 = _cell_Q_comp(cells, coeffs, eta64)
        mom = momentum_matrix_comp(species, grid)
        flat = _spectra_fast_comp_jit(per_cell, qm1, qm2, mom, eta64,
                                      grid.eta_weight, cfg, n_blocks,
                                      n_species_blocks)
        out = flat.reshape(S, NpT, Nphi, 1)
        return (PREFACTOR * species.degeneracy.astype(out.dtype)
                [:, None, None, None] * out)

    if cfg.dimension == 2:
        per_cell = _cell_Q(cells, coeffs, compute_dtype)
        mom = momentum_matrix(species, grid, compute_dtype)
        flat = _spectra_fast_jit(per_cell, mom,
                                 grid.eta.astype(compute_dtype),
                                 grid.eta_weight.astype(jnp.dtype(acc_dtype)),
                                 cfg, n_blocks, n_species_blocks,
                                 jnp.dtype(acc_dtype).name)
        out = flat.reshape(S, NpT, Nphi, 1)
    else:
        per_cell = _cell_Q_3d(cells, coeffs, compute_dtype)
        mom = momentum_matrix_3d(species, grid, compute_dtype)
        flat = _spectra_fast_3d_jit(per_cell, mom, cfg, n_blocks,
                                    n_species_blocks,
                                    jnp.dtype(acc_dtype).name)
        out = flat.reshape(S, NpT, Nphi, grid.y.shape[0])
    return PREFACTOR * species.degeneracy.astype(out.dtype)[:, None, None, None] * out
