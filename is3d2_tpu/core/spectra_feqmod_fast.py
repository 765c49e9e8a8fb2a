"""MXU-structured feqmod/famod spectra (df 3/4/5), 2+1d TPU speed path.

Structure: for boost-invariant surfaces (y = 0) the momentum point
(pt, px, py, tau pn) collapses onto a 3-row basis per species block,

    P9 = [mT, px, py, mT^2, px^2, py^2, mT px, mT py, px py]   (9, NpT*Nphi)

because pt = cosh(s_c eta_e) mT and tau pn = -sinh(s_c eta_e) mT: ALL eta and
cell dependence lives in per-cell scalar coefficients rebuilt each eta step
(cheap (C,) math), and each quantity is a K<=6 contraction of coefficient
columns against P9 rows, evaluated as an exact-f32 VPU FMA chain (see
spectra_fast._contract for why not the MXU):

    E (u.p), p.dsigma, pi:pp  -- as in the df 1/2 fast path, and crucially
    E_mod^2 = m^2 + p'^T p' with p' = M^-1 p_LRF: a quadratic form whose six
    coefficients come from U = M^-1 L with L the (per-cell, per-eta) matrix
    projecting (mT, px, py) onto the LRF axes.

Both the modified branch and the linearized breakdown branch are evaluated
and where-selected per cell, exactly mirroring core/spectra_feqmod.py /
spectra_famod.py (which remain the f64 reference paths).  The per-(cell,
species) renormalization is folded into the cell-reduction row, so the scan
runs one species block per m-tile.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .cells import CellArrays
from .feqmod import FeqmodCellData
from .spectra import PREFACTOR, MomentumGridDevice, SpeciesArrays

F32 = jnp.float32


def build_P9(species: SpeciesArrays, grid: MomentumGridDevice, dtype=F32):
    """(S, 9, M) momentum basis rows per species, M = NpT * Nphi."""
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)  # (S,p)
    S, NpT = mT.shape
    Nphi = grid.cos_phi.shape[0]
    M = NpT * Nphi
    mT_m = jnp.broadcast_to(mT[:, :, None], (S, NpT, Nphi)).reshape(S, M)
    px_m = jnp.broadcast_to((grid.pT[:, None] * grid.cos_phi[None, :])[None],
                            (S, NpT, Nphi)).reshape(S, M)
    py_m = jnp.broadcast_to((grid.pT[:, None] * grid.sin_phi[None, :])[None],
                            (S, NpT, Nphi)).reshape(S, M)
    P9 = jnp.stack([mT_m, px_m, py_m,
                    mT_m * mT_m, px_m * px_m, py_m * py_m,
                    mT_m * px_m, mT_m * py_m, px_m * py_m], axis=1)
    return P9.astype(dtype)


def _pack_feqmod_fast(cells: CellArrays, fq: FeqmodCellData, cfg: Config):
    """Per-cell f32 columns consumed by the kernel (from the f64 prep)."""
    c = cells
    tau = c.tau
    tau2 = tau * tau

    def f(a):
        return jnp.asarray(a, F32)

    # pi quadratic coefficients over (pt, px, py, tau pn)
    k = jnp.stack([c.pitt, c.pixx, c.piyy, tau2 * c.pinn,
                   -2.0 * c.pitx, -2.0 * c.pity, -2.0 * tau * c.pitn,
                   2.0 * c.pixy, 2.0 * tau * c.pixn, 2.0 * tau * c.piyn],
                  axis=1)

    data = {
        "mask": f(c.mask),
        "tau": f(tau),
        "invT": f(1.0 / c.T),
        "alphaB": f(c.alphaB),
        "ut": f(c.ut), "ux": f(c.ux), "uy": f(c.uy), "tun": f(tau * c.un),
        "dat": f(c.dat), "dax": f(c.dax), "day": f(c.day),
        "dan_t": f(c.dan / tau),
        "a_lc": f(0.5 * jnp.exp(-c.eta)),        # 3+1d light-cone factors
        "b_lc": f(0.5 * jnp.exp(c.eta)),
        "detA": f(fq.detA),
        "Xt": f(fq.Xt), "Xx": f(fq.Xx), "Xy": f(fq.Xy), "Xnt": f(tau * fq.Xn),
        "Yx": f(fq.Yx), "Yy": f(fq.Yy),
        "Zt": f(fq.Zt), "Znt": f(tau * fq.Zn),
        "Minv": f(fq.Ainv),                      # (C, 3, 3)
        "invTeff": f(1.0 / fq.T_mod),
        "alphaB_eff": f(fq.alphaB_mod),
        "eta_scale": f(fq.eta_scale),
        "breaks": fq.breaks_down,
        "k": f(k),
        "Vt": f(c.Vt), "Vx": f(c.Vx), "Vy": f(c.Vy), "tVn": f(tau * c.Vn),
        "ratio": f(c.baryon_enthalpy_ratio),
        "shear_c": f(fq.shear_coeff),
        "bulk0": f(fq.bulk0), "bulk1": f(fq.bulk1), "bulk2": f(fq.bulk2),
        "bulkPi": f(fq.bulkPi),
        "inv_betaV": f(1.0 / fq.betaV),
        "delta_z_m3dl": f(fq.delta_z - 3.0 * fq.delta_lambda),
        "dl": f(fq.delta_lambda),
        # renorm with the nan/inf species-skip folded in
        "renorm": f(jnp.where(jnp.isfinite(fq.renorm),
                              jnp.abs(fq.renorm), 0.0)),       # (C, S)
        "renorm_finite": f(jnp.isfinite(fq.renorm)),           # (C, S)
    }
    return data


def _pack_famod_fast(cells: CellArrays, fm, n_species: int):
    """famod variant: M^-1 = B^-1, T_eff = lambda, renorm scalar/cell."""
    c = cells
    tau = c.tau

    def f(a):
        return jnp.asarray(a, F32)

    C = c.n_padded
    renorm = jnp.broadcast_to(jnp.abs(fm.renorm)[:, None], (C, n_species))
    data = {
        "mask": f(c.mask),
        "tau": f(tau),
        "invT": f(1.0 / c.T),
        "alphaB": f(c.alphaB),
        "ut": f(c.ut), "ux": f(c.ux), "uy": f(c.uy), "tun": f(tau * c.un),
        "dat": f(c.dat), "dax": f(c.dax), "day": f(c.day),
        "dan_t": f(c.dan / tau),
        "a_lc": f(0.5 * jnp.exp(-c.eta)),
        "b_lc": f(0.5 * jnp.exp(c.eta)),
        "detA": f(fm.detB),
        "Xt": f(fm.Xt), "Xx": f(fm.Xx), "Xy": f(fm.Xy), "Xnt": f(tau * fm.Xn),
        "Yx": f(fm.Yx), "Yy": f(fm.Yy),
        "Zt": f(fm.Zt), "Znt": f(tau * fm.Zn),
        "Minv": f(fm.Binv),
        "invTeff": f(1.0 / fm.lam),
        "alphaB_eff": f(fm.upsilonB),
        "eta_scale": f(fm.eta_scale),
        "breaks": fm.breaks_down,
        # unused in famod but present for a uniform kernel signature
        "k": jnp.zeros((C, 10), F32),
        "Vt": jnp.zeros(C, F32), "Vx": jnp.zeros(C, F32),
        "Vy": jnp.zeros(C, F32), "tVn": jnp.zeros(C, F32),
        "ratio": jnp.zeros(C, F32),
        "shear_c": jnp.zeros(C, F32),
        "bulk0": jnp.zeros(C, F32), "bulk1": jnp.zeros(C, F32),
        "bulk2": jnp.zeros(C, F32),
        "bulkPi": jnp.zeros(C, F32),
        "inv_betaV": jnp.zeros(C, F32),
        "delta_z_m3dl": jnp.zeros(C, F32),
        "dl": jnp.zeros(C, F32),
        "renorm": f(jnp.where(jnp.isfinite(renorm), renorm, 0.0)),
        # non-finite famod renorm is folded into breaks_down (the cell uses
        # the feq fallback), so the species is NOT skipped: keep the row on.
        "renorm_finite": jnp.ones((C, n_species), F32),
    }
    return data


def _one_eta_block(d, s_idx, P9_s, mass2_s, b_s, sgn_s, eta_e, w_e,
                   cfg: Config, kind: str, dan_weighted: bool = False,
                   w_m=None):
    """Contribution of one (cell block, species, eta point).

    Default: reduce over cells -> (M_s,) spectra partial.  With w_m given:
    reduce over momentum with those weights -> (C,) per-cell dN/dy partial
    (operation 0).  dan_weighted selects the p.dsigma eta-weight convention
    (spectra: dan term unweighted, MomentumSpectra.cpp:936; dN/dX: all terms
    weighted, SpacetimeDistribution.cpp:1022)."""
    C = d["mask"].shape[0]

    def col(x):
        return x[:, None]

    # ---------------- modified branch ----------------
    sm = d["eta_scale"] * eta_e
    ch = jnp.cosh(sm)
    sh = jnp.sinh(sm)

    # LRF projection of (mT, px, py): rows of L (per cell).  The rapidity
    # delta is y - eta = -eta (2+1d, y=0), so pt = ch*mT and
    # tau^2 pn = -tau*sh*mT  ->  mT coeff of px_LRF is -(Xt*ch + Xnt*sh).
    a1 = -(d["Xt"] * ch + d["Xnt"] * sh)
    c1 = -(d["Zt"] * ch + d["Znt"] * sh)

    Mi = d["Minv"]                                # (C,3,3)
    # U = Minv . L with L = [[a1, Xx, Xy], [0, Yx, Yy], [c1, 0, 0]]
    U0m = Mi[:, 0, 0] * a1 + Mi[:, 0, 2] * c1
    U1m = Mi[:, 1, 0] * a1 + Mi[:, 1, 2] * c1
    U2m = Mi[:, 2, 0] * a1 + Mi[:, 2, 2] * c1
    U0x = Mi[:, 0, 0] * d["Xx"] + Mi[:, 0, 1] * d["Yx"]
    U1x = Mi[:, 1, 0] * d["Xx"] + Mi[:, 1, 1] * d["Yx"]
    U2x = Mi[:, 2, 0] * d["Xx"] + Mi[:, 2, 1] * d["Yx"]
    U0y = Mi[:, 0, 0] * d["Xy"] + Mi[:, 0, 1] * d["Yy"]
    U1y = Mi[:, 1, 0] * d["Xy"] + Mi[:, 1, 1] * d["Yy"]
    U2y = Mi[:, 2, 0] * d["Xy"] + Mi[:, 2, 1] * d["Yy"]

    q1 = U0m * U0m + U1m * U1m + U2m * U2m
    q2 = U0x * U0x + U1x * U1x + U2x * U2x
    q3 = U0y * U0y + U1y * U1y + U2y * U2y
    q4 = 2.0 * (U0m * U0x + U1m * U1x + U2m * U2x)
    q5 = 2.0 * (U0m * U0y + U1m * U1y + U2m * U2y)
    q6 = 2.0 * (U0x * U0y + U1x * U1y + U2x * U2y)

    # Contractions over K <= 6 basis rows: explicit VPU FMA chains.  The MXU
    # would round f32 inputs to bf16 at DEFAULT precision (1e-2-level error
    # after exp amplification) and full-f32 MXU passes cost 6x; a broadcast
    # multiply-add chain is exact f32 and fuses into the elementwise kernel.
    def fma(*coefs_rows):
        acc = None
        for cc, r in coefs_rows:
            term = col(cc) * r[None, :]
            acc = term if acc is None else acc + term
        return acc

    E2 = mass2_s + fma((q1, P9_s[3]), (q2, P9_s[4]), (q3, P9_s[5]),
                       (q4, P9_s[6]), (q5, P9_s[7]), (q6, P9_s[8]))

    if kind == "famod" or dan_weighted:
        # weight applies to the whole p.dsigma
        pdd_m = fma((w_e * (ch * d["dat"] - sh * d["dan_t"]), P9_s[0]),
                    (w_e * d["dax"], P9_s[1]), (w_e * d["day"], P9_s[2]))
    else:
        # feqmod quirk: the dan term is unweighted (MomentumSpectra.cpp:936)
        pdd_m = fma((w_e * ch * d["dat"] - sh * d["dan_t"], P9_s[0]),
                    (w_e * d["dax"], P9_s[1]), (w_e * d["day"], P9_s[2]))

    chem_eff = b_s * d["alphaB_eff"]
    E_mod = jnp.sqrt(jnp.maximum(E2, 1e-30))
    f_mod = col(d["renorm"][:, s_idx]) / (
        jnp.exp(E_mod * col(d["invTeff"]) - col(chem_eff)) + sgn_s)
    if cfg.outflow:
        pdd_m = jnp.where(pdd_m > 0.0, pdd_m, 0.0)
    value_mod = pdd_m * f_mod

    # ---------------- breakdown branch ----------------
    chb = jnp.cosh(eta_e)
    shb = jnp.sinh(eta_e)
    E = fma((chb * d["ut"] + shb * d["tun"], P9_s[0]),
            (-d["ux"], P9_s[1]), (-d["uy"], P9_s[2]))
    if kind == "famod" or dan_weighted:
        pdd_b = fma((w_e * (chb * d["dat"] - shb * d["dan_t"]), P9_s[0]),
                    (w_e * d["dax"], P9_s[1]), (w_e * d["day"], P9_s[2]))
    else:
        pdd_b = fma((w_e * chb * d["dat"] - shb * d["dan_t"], P9_s[0]),
                    (w_e * d["dax"], P9_s[1]), (w_e * d["day"], P9_s[2]))
    if cfg.outflow:
        pdd_b = jnp.where(pdd_b > 0.0, pdd_b, 0.0)

    if kind == "famod":
        feq = 1.0 / (jnp.exp(E * col(d["invT"]) - col(b_s * d["alphaB"])) + sgn_s)
        value_b = pdd_b * feq
    else:
        k = d["k"]
        kq1 = k[:, 0] * chb * chb + k[:, 3] * shb * shb - k[:, 6] * chb * shb
        kq4 = k[:, 4] * chb - k[:, 8] * shb
        kq5 = k[:, 5] * chb - k[:, 9] * shb
        pim = fma((kq1, P9_s[3]), (k[:, 1], P9_s[4]), (k[:, 2], P9_s[5]),
                  (kq4, P9_s[6]), (kq5, P9_s[7]), (k[:, 7], P9_s[8]))
        Vp = fma((chb * d["Vt"] + shb * d["tVn"], P9_s[0]),
                 (-d["Vx"], P9_s[1]), (-d["Vy"], P9_s[2]))

        if cfg.df_mode == 3:
            chem = b_s * d["alphaB"]
            feq = 1.0 / (jnp.exp(E * col(d["invT"]) - col(chem)) + sgn_s)
            feqbar = 1.0 - sgn_s * feq
            df = feqbar * (
                col(d["shear_c"]) * pim / E
                + (col(d["bulk0"]) * E + col(d["bulk1"]) * b_s
                   + col(d["bulk2"]) * (E - mass2_s / E)) * col(d["bulkPi"])
                + (col(d["ratio"]) - b_s / E) * Vp * col(d["inv_betaV"]))
        else:  # PTB linearized: feq without chem (MomentumSpectra.cpp:913)
            feq = 1.0 / (jnp.exp(E * col(d["invT"])) + sgn_s)
            feqbar = 1.0 - sgn_s * feq
            df = (feqbar * col(d["shear_c"]) * pim / E
                  + col(d["delta_z_m3dl"])
                  + feqbar * col(d["dl"]) * (E - mass2_s / E) * col(d["invT"]))
        if cfg.regulate_deltaf:
            df = jnp.clip(df, -1.0, 1.0)
        value_b = pdd_b * feq * (1.0 + df)

    value = jnp.where(col(d["breaks"]), value_b, value_mod)

    if w_m is not None:
        # operation 0: per-cell momentum reduction (finite-renorm species
        # skip applied; the cell mask is applied at scatter time)
        return jnp.sum(value * w_m[None, :], axis=1) \
            * d["renorm_finite"][:, s_idx]
    # cell reduction with the finite-renorm mask folded in (VPU reduce:
    # a DEFAULT-precision mask matmul would round the values to bf16)
    red = d["mask"] * d["renorm_finite"][:, s_idx]
    return jnp.sum(red[:, None] * value, axis=0)


@partial(jax.jit, static_argnames=("cfg", "kind", "n_cell_blocks"))
def _feqmod_fast_jit(data: dict, P9, mass2, baryon, sign, eta, eta_w,
                     cfg: Config, kind: str, n_cell_blocks: int):
    S = P9.shape[0]
    M_s = P9.shape[2]
    C_total = data["mask"].shape[0]
    blk = C_total // n_cell_blocks
    eta32 = eta.astype(F32)
    eta_w32 = eta_w.astype(F32)
    Ne = eta.shape[0]

    def body(acc, pair):
        cb = pair // S
        s = pair % S
        d = {k: (jax.lax.dynamic_slice_in_dim(v, cb * blk, blk, 0))
             for k, v in data.items()}
        P9_s = jax.lax.dynamic_index_in_dim(P9, s, axis=0, keepdims=False)
        m2 = mass2[s].astype(F32)
        b_s = baryon[s].astype(F32)
        sgn_s = sign[s].astype(F32)

        def eta_body(acc_e, ew):
            e_val, w_val = ew
            part = _one_eta_block(d, s, P9_s, m2, b_s, sgn_s, e_val, w_val,
                                  cfg, kind)
            return acc_e + part.astype(jnp.float64), None

        part_s, _ = jax.lax.scan(eta_body, jnp.zeros(M_s, jnp.float64),
                                 (eta32, eta_w32))
        return acc.at[s].add(part_s), None

    acc, _ = jax.lax.scan(body, jnp.zeros((S, M_s), jnp.float64),
                          jnp.arange(n_cell_blocks * S))
    return acc


def build_P4_3d(species: SpeciesArrays, grid: MomentumGridDevice, dtype=F32):
    """(S, 5, M) light-cone momentum rows per species for 3+1d:
    (m+, px, py, m-, mT) with m_pm = mT e^{+-y}, M = NpT * Nphi * Ny.

    In this basis pt = a m+ + b m- and tau pn = a m+ - b m- with the
    per-cell factors a = e^{-eta_c}/2, b = e^{eta_c}/2 -- sums of positives,
    so no cosh/sinh cancellation in f32 (same trick as spectra_fast 3+1d)."""
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)  # (S,p)
    S, NpT = mT.shape
    Nphi = grid.cos_phi.shape[0]
    Ny = grid.y.shape[0]
    shape = (S, NpT, Nphi, Ny)
    M = NpT * Nphi * Ny

    def flat(a):
        return jnp.broadcast_to(a, shape).reshape(S, M)

    exp_p = jnp.exp(grid.y)
    m_plus = flat(mT[:, :, None, None] * exp_p[None, None, None, :])
    m_minus = flat(mT[:, :, None, None] / exp_p[None, None, None, :])
    px_m = flat((grid.pT[:, None] * grid.cos_phi[None, :])[None, :, :, None])
    py_m = flat((grid.pT[:, None] * grid.sin_phi[None, :])[None, :, :, None])
    mT_m = flat(mT[:, :, None, None])
    return jnp.stack([m_plus, px_m, py_m, m_minus, mT_m],
                     axis=1).astype(dtype)


def _quad10(cp, cx, cy, cm):
    """10 quadratic coefficients of (cp m+ + cx px + cy py + cm m-)^2-type
    cross terms: returns the list ordering used by _one_block_3d's PP rows
    (m+m+, pxpx, pypy, m-m-, m+px, m+py, m+m-, pxpy, pxm-, pym-)."""
    return [cp * cp, cx * cx, cy * cy, cm * cm,
            2 * cp * cx, 2 * cp * cy, 2 * cp * cm,
            2 * cx * cy, 2 * cx * cm, 2 * cy * cm]


def _one_block_3d(d, s_idx, P5, mass2_s, b_s, sgn_s, cfg: Config, kind: str):
    """One (cell block, species) contribution in 3+1d: (M,) f32."""
    def col(x):
        return x[:, None]

    def fma(*coefs_rows):
        acc = None
        for cc, r in coefs_rows:
            term = col(cc) * r[None, :]
            acc = term if acc is None else acc + term
        return acc

    a, b = d["a_lc"], d["b_lc"]
    P = [P5[0], P5[1], P5[2], P5[3]]        # m+, px, py, m-
    mT_row = P5[4]
    PP = [P[0] * P[0], P[1] * P[1], P[2] * P[2], P[3] * P[3],
          P[0] * P[1], P[0] * P[2], P[0] * P[3],
          P[1] * P[2], P[1] * P[3], P[2] * P[3]]

    # ---------------- modified branch (no eta rescale in 3+1d) -----------
    # pt = a m+ + b m-, tau pn = a m+ - b m-:
    # px_LRF = -Xt pt + Xx px + Xy py + Xnt (tau pn)
    Lpx = (a * (d["Xnt"] - d["Xt"]), d["Xx"], d["Xy"],
           -b * (d["Xt"] + d["Xnt"]))
    Lpy = (jnp.zeros_like(a), d["Yx"], d["Yy"], jnp.zeros_like(a))
    Lpz = (a * (d["Znt"] - d["Zt"]), jnp.zeros_like(a), jnp.zeros_like(a),
           -b * (d["Zt"] + d["Znt"]))

    Mi = d["Minv"]
    U = []
    for i in range(3):
        U.append(tuple(Mi[:, i, 0] * Lpx[k] + Mi[:, i, 1] * Lpy[k]
                       + Mi[:, i, 2] * Lpz[k] for k in range(4)))
    qE2 = [U[0][0] * 0.0] * 10
    for i in range(3):
        qi = _quad10(*U[i])
        qE2 = [q0 + q1 for q0, q1 in zip(qE2, qi)]
    E2 = mass2_s + fma(*zip(qE2, PP))

    dan_t = d["dan_t"]
    pdd_m = fma((a * (d["dat"] + dan_t), P[0]), (d["dax"], P[1]),
                (d["day"], P[2]), (b * (d["dat"] - dan_t), P[3]))

    chem_eff = b_s * d["alphaB_eff"]
    E_mod = jnp.sqrt(jnp.maximum(E2, 1e-30))
    f_mod = col(d["renorm"][:, s_idx]) / (
        jnp.exp(E_mod * col(d["invTeff"]) - col(chem_eff)) + sgn_s)
    if cfg.outflow:
        pdd_m = jnp.where(pdd_m > 0.0, pdd_m, 0.0)
    value_mod = pdd_m * f_mod

    # ---------------- breakdown branch ------------------------------------
    E = fma((a * (d["ut"] - d["tun"]), P[0]), (-d["ux"], P[1]),
            (-d["uy"], P[2]), (b * (d["ut"] + d["tun"]), P[3]))
    pdd_b = pdd_m if not cfg.outflow else fma(
        (a * (d["dat"] + dan_t), P[0]), (d["dax"], P[1]),
        (d["day"], P[2]), (b * (d["dat"] - dan_t), P[3]))
    # (pdd is branch-independent in 3+1d: same delta = y - eta_c)
    if cfg.outflow:
        pdd_b = jnp.where(pdd_b > 0.0, pdd_b, 0.0)

    if kind == "famod":
        feq = 1.0 / (jnp.exp(E * col(d["invT"]) - col(b_s * d["alphaB"])) + sgn_s)
        value_b = pdd_b * feq
    else:
        k = d["k"]
        # pi:pp over (pt, px, py, q=tau pn) -> light-cone PP rows
        kq = [a * a * (k[:, 0] + k[:, 3] + k[:, 6]),          # m+m+
              k[:, 1],                                        # pxpx
              k[:, 2],                                        # pypy
              b * b * (k[:, 0] + k[:, 3] - k[:, 6]),          # m-m-
              a * (k[:, 4] + k[:, 8]),                        # m+px
              a * (k[:, 5] + k[:, 9]),                        # m+py
              2.0 * a * b * (k[:, 0] - k[:, 3]),              # m+m-
              k[:, 7],                                        # pxpy
              b * (k[:, 4] - k[:, 8]),                        # pxm-
              b * (k[:, 5] - k[:, 9])]                        # pym-
        pim = fma(*zip(kq, PP))
        Vp = fma((a * (d["Vt"] - d["tVn"]), P[0]), (-d["Vx"], P[1]),
                 (-d["Vy"], P[2]), (b * (d["Vt"] + d["tVn"]), P[3]))

        if cfg.df_mode == 3:
            chem = b_s * d["alphaB"]
            feq = 1.0 / (jnp.exp(E * col(d["invT"]) - col(chem)) + sgn_s)
            feqbar = 1.0 - sgn_s * feq
            df = feqbar * (
                col(d["shear_c"]) * pim / E
                + (col(d["bulk0"]) * E + col(d["bulk1"]) * b_s
                   + col(d["bulk2"]) * (E - mass2_s / E)) * col(d["bulkPi"])
                + (col(d["ratio"]) - b_s / E) * Vp * col(d["inv_betaV"]))
        else:
            feq = 1.0 / (jnp.exp(E * col(d["invT"])) + sgn_s)
            feqbar = 1.0 - sgn_s * feq
            df = (feqbar * col(d["shear_c"]) * pim / E
                  + col(d["delta_z_m3dl"])
                  + feqbar * col(d["dl"]) * (E - mass2_s / E) * col(d["invT"]))
        if cfg.regulate_deltaf:
            df = jnp.clip(df, -1.0, 1.0)
        value_b = pdd_b * feq * (1.0 + df)

    # branch selection: breakdown OR the narrow |y - eta| < detA window
    # (MomentumSpectra.cpp:863-871); |y - eta| = ln((pt + |tau pn|)/mT)
    pt = fma((a, P[0]), (b, P[3]))
    tpn = fma((a, P[0]), (-b, P[3]))
    abs_delta = jnp.log((pt + jnp.abs(tpn)) / mT_row[None, :])
    narrow = (col(d["detA"]) < 0.01) & (abs_delta < col(d["detA"]))
    use_break = col(d["breaks"]) | narrow
    value = jnp.where(use_break, value_b, value_mod)

    red = d["mask"] * d["renorm_finite"][:, s_idx]
    return jnp.sum(red[:, None] * value, axis=0)


@partial(jax.jit, static_argnames=("cfg", "kind", "n_cell_blocks"))
def _feqmod_fast_3d_jit(data: dict, P5, mass2, baryon, sign,
                        cfg: Config, kind: str, n_cell_blocks: int):
    S = P5.shape[0]
    M_s = P5.shape[2]
    C_total = data["mask"].shape[0]
    blk = C_total // n_cell_blocks

    def body(acc, pair):
        cb = pair // S
        s = pair % S
        d = {k: (jax.lax.dynamic_slice_in_dim(v, cb * blk, blk, 0))
             for k, v in data.items()}
        P5_s = jax.lax.dynamic_index_in_dim(P5, s, axis=0, keepdims=False)
        part = _one_block_3d(d, s, P5_s, mass2[s].astype(F32),
                             baryon[s].astype(F32), sign[s].astype(F32),
                             cfg, kind)
        return acc.at[s].add(part.astype(jnp.float64)), None

    acc, _ = jax.lax.scan(body, jnp.zeros((S, M_s), jnp.float64),
                          jnp.arange(n_cell_blocks * S))
    return acc


def compute_spectra_feqmod_fast(cells: CellArrays, fq_or_fm,
                                species: SpeciesArrays,
                                grid: MomentumGridDevice, cfg: Config,
                                n_cell_blocks: int = 1):
    """f32 fast feqmod/famod spectra.  Returns (S, NpT, Nphi, Ny) f64."""
    kind = "famod" if cfg.df_mode == 5 else "feqmod"
    S = species.mass.shape[0]
    if kind == "famod":
        data = _pack_famod_fast(cells, fq_or_fm, S)
    else:
        data = _pack_feqmod_fast(cells, fq_or_fm, cfg)
    NpT = grid.pT.shape[0]
    Nphi = grid.cos_phi.shape[0]
    if cfg.dimension == 2:
        # strict fold: feq(|A^-1 p|) is nonlinear in the odd-in-eta sources,
        # so halve the nodes only when they are ALL exactly zero (every
        # physical boost-invariant surface) -- then the integrand is
        # pointwise even and the fold is exact
        from .spectra_fast import fold_eta_quadrature
        cells, grid, _ = fold_eta_quadrature(cells, grid, cfg, strict=True)
        P9 = build_P9(species, grid)
        out = _feqmod_fast_jit(data, P9, species.mass**2, species.baryon,
                               species.sign, grid.eta, grid.eta_weight, cfg,
                               kind, n_cell_blocks)
        out = out.reshape(S, NpT, Nphi, 1)
    else:
        P5 = build_P4_3d(species, grid)
        out = _feqmod_fast_3d_jit(data, P5, species.mass**2, species.baryon,
                                  species.sign, cfg, kind, n_cell_blocks)
        out = out.reshape(S, NpT, Nphi, grid.y.shape[0])
    return PREFACTOR * species.degeneracy.astype(out.dtype)[:, None, None, None] * out


@partial(jax.jit, static_argnames=("cfg", "kind", "n_cell_blocks"))
def _feqmod_dNdy_jit(data: dict, P9, w_m, mass2, baryon, sign, eta, eta_w,
                     cfg: Config, kind: str, n_cell_blocks: int):
    """Per-cell dN/dy for operation 0, feqmod integrand: (C_total, S) f64."""
    S = P9.shape[0]
    C_total = data["mask"].shape[0]
    blk = C_total // n_cell_blocks
    eta32 = eta.astype(F32)
    eta_w32 = eta_w.astype(F32)

    def body(acc, pair):
        cb = pair // S
        s = pair % S
        d = {k: (jax.lax.dynamic_slice_in_dim(v, cb * blk, blk, 0))
             for k, v in data.items()}
        P9_s = jax.lax.dynamic_index_in_dim(P9, s, axis=0, keepdims=False)

        def eta_body(acc_e, ew):
            e_val, w_val = ew
            part = _one_eta_block(d, s, P9_s, mass2[s].astype(F32),
                                  baryon[s].astype(F32), sign[s].astype(F32),
                                  e_val, w_val, cfg, kind,
                                  dan_weighted=True, w_m=w_m)
            return acc_e + part.astype(jnp.float64), None

        part_c, _ = jax.lax.scan(eta_body, jnp.zeros(blk, jnp.float64),
                                 (eta32, eta_w32))
        return jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (cb * blk, s), (blk, 1))
            + part_c[:, None], (cb * blk, s)), None

    acc, _ = jax.lax.scan(body, jnp.zeros((C_total, S), jnp.float64),
                          jnp.arange(n_cell_blocks * S))
    return acc


def compute_dN_dy_cells_feqmod_fast(cells: CellArrays, fq,
                                    species: SpeciesArrays,
                                    grid: MomentumGridDevice, cfg: Config,
                                    n_cell_blocks: int = 1):
    """(C, S) per-cell dN/dy via the f32 feqmod fast integrand (df 3/4,
    2+1d), for the spacetime distributions
    (SpacetimeDistribution.cpp:520-1250)."""
    if cfg.dimension != 2 or cfg.df_mode not in (3, 4):
        raise ValueError("fast feqmod dN/dy implements df 3/4, 2+1d")
    from .spectra_fast import fold_eta_quadrature
    cells, grid, _ = fold_eta_quadrature(cells, grid, cfg, strict=True)
    S = species.mass.shape[0]
    data = _pack_feqmod_fast(cells, fq, cfg)
    P9 = build_P9(species, grid)
    w_m = (grid.pT_weight[:, None]
           * grid.phi_weight[None, :]).reshape(-1).astype(F32)
    dN = _feqmod_dNdy_jit(data, P9, w_m, species.mass**2, species.baryon,
                          species.sign, grid.eta, grid.eta_weight, cfg,
                          "feqmod", n_cell_blocks)
    return dN * PREFACTOR * species.degeneracy[None, :]
