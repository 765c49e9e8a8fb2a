"""MXU/VPU-structured f32 spin polarization (surface mode 5), the TPU
performance path for core/polarization.py.

The polarization integrand (Polarization.cpp:25-263) is the CF weight
pdd * f0 times FOUR wedge contractions (wbar wedge p)_mu that are all
LINEAR in the momentum basis P = (pt, px, py, pn):

    S_t ~ + wyn px - wxn py + wxy pn
    S_x ~ + wyn pt - wtn py + wty pn
    S_y ~ - wxn pt + wtn px - wtx pn
    S_n ~ + wxy pt + wtx py - wty px

so each is one more 4-row per-cell contraction exactly like the spectra
fast path's Q_E/Q_d rows (core/spectra_fast.py): six contractions total,
one exp, and five masked cell reductions per (cell, m) element.  2+1d runs
the eta quadrature as a scan; 3+1d builds cosh/sinh(y - eta_cell) directly
from the difference as small (cells, Ny) tables (the spectra's light-cone
factorization is NOT usable here: the pure-pn spin terms make its
a m+ - b m- difference cancel catastrophically in f32, see
_polzn_fast_3d_jit).

Validated against the f64 broadcast kernel (test_f32_paths.py); the f64
path (core/polarization.py) remains the golden-accuracy engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .cells import CellArrays
from .spectra import MomentumGridDevice, SpeciesArrays
from .spectra_fast import _contract


def _mom_polzn(species: SpeciesArrays, grid: MomentumGridDevice, dtype):
    """2+1d per-m arrays, m = (species, pT, phi): mT, px, py, sign, 1/(4m)."""
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)
    S, NpT = mT.shape
    Nphi = grid.cos_phi.shape[0]
    shape = (S, NpT, Nphi)
    M = S * NpT * Nphi

    def flat(a):
        return jnp.broadcast_to(a, shape).reshape(M).astype(dtype)

    mT_m = flat(mT[:, :, None])
    px_m = flat((grid.pT[:, None] * grid.cos_phi[None, :])[None])
    py_m = flat((grid.pT[:, None] * grid.sin_phi[None, :])[None])
    sgn_m = flat(species.sign[:, None, None])
    inv4m = flat((0.25 / species.mass)[:, None, None])
    return mT_m, px_m, py_m, sgn_m, inv4m




def _cell_Q_polzn(c: CellArrays, dtype):
    """Per-cell contraction rows, 2+1d basis (mT cosh d, px, py, mT sinh d)
    with pn = mT sinh(d) / tau (d = -eta at y = 0)."""
    tau = c.tau
    it = 1.0 / tau
    rows = {
        "Q_E": jnp.stack([c.ut, -c.ux, -c.uy, -tau * c.un], axis=1),
        "Q_d": jnp.stack([c.dat, c.dax, c.day, c.dan * it], axis=1),
        "Q_st": jnp.stack([jnp.zeros_like(tau), c.wyn, -c.wxn,
                           c.wxy * it], axis=1),
        "Q_sx": jnp.stack([c.wyn, jnp.zeros_like(tau), -c.wtn,
                           c.wty * it], axis=1),
        "Q_sy": jnp.stack([-c.wxn, c.wtn, jnp.zeros_like(tau),
                           -c.wtx * it], axis=1),
        "Q_sn": jnp.stack([c.wxy, -c.wty, c.wtx,
                           jnp.zeros_like(tau)], axis=1),
    }
    out = {k: v.astype(dtype) for k, v in rows.items()}
    out["mask"] = c.pad_mask.astype(dtype)
    return out


def _polzn_value(q: dict, P, sgn_m, inv4m, invT):
    """One basis evaluation: returns the five (C, M) summands
    (g*S_t, g*S_x, g*S_y, g*S_n, w) BEFORE the cell reduction."""
    E = _contract(q["Q_E"], P)
    pdd = _contract(q["Q_d"], P)
    f0 = 1.0 / (jnp.exp(E * invT) + sgn_m[None, :])
    w = pdd * f0
    # pref = -(1/(8m)) (1 - sgn f0) * 2  (Polarization.cpp:186)
    g = -w * (1.0 - sgn_m[None, :] * f0) * inv4m[None, :]
    return (g * _contract(q["Q_st"], P), g * _contract(q["Q_sx"], P),
            g * _contract(q["Q_sy"], P), g * _contract(q["Q_sn"], P), w)


@partial(jax.jit, static_argnames=("n_blocks", "n_m_blocks"))
def _polzn_fast_jit(per_cell: dict, mom, eta, eta_w, invT,
                    n_blocks: int, n_m_blocks: int):
    """2+1d: scan cell blocks x m blocks x eta points; (5, M) f64 output."""
    mT_m, px_m, py_m, sgn_m, inv4m = mom
    C_total = per_cell["mask"].shape[0]
    blk = C_total // n_blocks
    M = mT_m.shape[0]
    m_blk = M // n_m_blocks

    def body(acc, ij):
        i = ij // n_m_blocks
        j = ij % n_m_blocks
        q = {k: jax.lax.dynamic_slice_in_dim(v, i * blk, blk, 0)
             for k, v in per_cell.items()}
        momj = tuple(jax.lax.dynamic_slice_in_dim(a, j * m_blk, m_blk, 0)
                     for a in (mT_m, px_m, py_m, sgn_m, inv4m))

        def one_eta(carry, ew):
            acc_e = carry
            cosh_e, sinh_e, w_e = ew
            P = [momj[0] * cosh_e, momj[1], momj[2], momj[0] * sinh_e]
            vals = _polzn_value(q, P, momj[3], momj[4], invT)
            part = jnp.stack([jnp.sum(q["mask"][:, None] * v, axis=0)
                              for v in vals])            # (5, m_blk)
            return acc_e + (w_e * part).astype(jnp.float64), None

        cosh = jnp.cosh(eta)
        sinh = -jnp.sinh(eta)          # y = 0: Delta = -eta
        part5, _ = jax.lax.scan(
            one_eta, jnp.zeros((5, m_blk), jnp.float64),
            (cosh.astype(mT_m.dtype), sinh.astype(mT_m.dtype),
             eta_w.astype(jnp.float64)))
        return jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, j * m_blk), (5, m_blk))
            + part5, (0, j * m_blk)), None

    acc, _ = jax.lax.scan(body, jnp.zeros((5, M), jnp.float64),
                          jnp.arange(n_blocks * n_m_blocks))
    return acc


@partial(jax.jit, static_argnames=("n_blocks",))
def _polzn_fast_3d_jit(per_cell: dict, eta_c, mom, y, invT, n_blocks: int):
    """3+1d: no light-cone factorization.  The spin rows carry PURE-pn
    terms (wxy pn, ...), so the light-cone difference a m+ - b m- =
    mT sinh(y - eta) cancels catastrophically in f32 when y ~ eta (measured
    2e-4); instead cosh/sinh(y - eta) are built DIRECTLY from the
    difference as small (cells, Ny) tables -- exact f32 primitives, no
    cancellation -- and broadcast over the (G = species*pT*phi) axis.  Two
    extra multiplies per element vs the factored form."""
    mT_m, px_m, py_m, sgn_m, inv4m = mom        # (G,) arrays
    C_total = per_cell["mask"].shape[0]
    blk = C_total // n_blocks
    G = mT_m.shape[0]
    Ny = y.shape[0]

    def contract3(Q, Pc, Ps):
        # Q: (blk, 4); Pc/Ps: (blk, G, Ny) = mT cosh_d / mT sinh_d
        return (Q[:, 0, None, None] * Pc
                + Q[:, 1, None, None] * px_m[None, :, None]
                + Q[:, 2, None, None] * py_m[None, :, None]
                + Q[:, 3, None, None] * Ps)

    def body(acc, i):
        q = {k: jax.lax.dynamic_slice_in_dim(v, i * blk, blk, 0)
             for k, v in per_cell.items()}
        d = y[None, :] - jax.lax.dynamic_slice_in_dim(eta_c, i * blk,
                                                      blk, 0)[:, None]
        sinh_d = jnp.sinh(d)
        cosh_d = jnp.sqrt(1.0 + sinh_d * sinh_d)
        Pc = mT_m[None, :, None] * cosh_d[:, None, :]
        Ps = mT_m[None, :, None] * sinh_d[:, None, :]

        E = contract3(q["Q_E"], Pc, Ps)
        pdd = contract3(q["Q_d"], Pc, Ps)
        f0 = 1.0 / (jnp.exp(E * invT) + sgn_m[None, :, None])
        w = pdd * f0
        g = -w * (1.0 - sgn_m[None, :, None] * f0) * inv4m[None, :, None]
        mask = q["mask"][:, None, None]
        part = jnp.stack([
            jnp.sum(mask * g * contract3(q["Q_st"], Pc, Ps), axis=0),
            jnp.sum(mask * g * contract3(q["Q_sx"], Pc, Ps), axis=0),
            jnp.sum(mask * g * contract3(q["Q_sy"], Pc, Ps), axis=0),
            jnp.sum(mask * g * contract3(q["Q_sn"], Pc, Ps), axis=0),
            jnp.sum(mask * w, axis=0),
        ]).astype(jnp.float64)                  # (5, G, Ny)
        return acc + part, None

    acc, _ = jax.lax.scan(body, jnp.zeros((5, G, Ny), jnp.float64),
                          jnp.arange(n_blocks))
    return acc.reshape(5, G * Ny)


def compute_polarization_fast(cells: CellArrays, species: SpeciesArrays,
                              grid: MomentumGridDevice, T: float,
                              cfg: Config, n_blocks: int,
                              delta_eta: float) -> jnp.ndarray:
    """f32 polarization accumulators; returns (5, S, NpT, Nphi, Ny) f64
    raw sums matching core/polarization.py's layout."""
    f32 = jnp.float32
    S = species.mass.shape[0]
    NpT = grid.pT.shape[0]
    Nphi = grid.cos_phi.shape[0]
    invT = np.float32(1.0 / T)

    per_cell = _cell_Q_polzn(cells, f32)
    mom = _mom_polzn(species, grid, f32)
    if cfg.dimension == 2:
        eta_w = grid.eta_weight * delta_eta
        acc = _polzn_fast_jit(per_cell, mom, grid.eta.astype(f32),
                              eta_w, invT, n_blocks, 1)
        return acc.reshape(5, S, NpT, Nphi, 1)
    # the (pt, px, py, tau pn) basis rows are dimension-independent; only
    # the P construction differs (per-(cell, y) cosh/sinh tables)
    acc = _polzn_fast_3d_jit(per_cell, cells.eta.astype(f32), mom,
                             grid.y.astype(f32), invT, n_blocks)
    return acc.reshape(5, S, NpT, Nphi, grid.y.shape[0])
