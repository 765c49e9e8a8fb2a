"""Continuous spectra with the modified anisotropic distribution (df 5, famod).

Replaces calculate_dN_pTdpTdphidy_famod (MomentumSpectra.cpp:1049-1682):
per-cell anisotropic variable reconstruction (batched Newton, physics/aniso),
famod coefficients, deformation matrix B = C.A, and the momentum-space
famod / feq-fallback branches.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..constants import two_pi2_hbarC3
from ..io.pdg import SpeciesTable
from ..physics import lrf
from ..physics.aniso import (find_anisotropic_variables,
                             compute_famod_coefficients,
                             compute_F, compute_J, _solve3x3)
from .cells import CellArrays
from ..utils import host_prep
from .spectra import PREFACTOR, MomentumGridDevice, SpeciesArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FamodCellData:
    """Per-cell famod quantities."""

    Xt: jnp.ndarray
    Xx: jnp.ndarray
    Xy: jnp.ndarray
    Xn: jnp.ndarray
    Yx: jnp.ndarray
    Yy: jnp.ndarray
    Zt: jnp.ndarray
    Zn: jnp.ndarray
    lam: jnp.ndarray
    aT: jnp.ndarray
    aL: jnp.ndarray
    upsilonB: jnp.ndarray
    # B matrix (symmetric) and inverse
    Bxx: jnp.ndarray
    Bxy: jnp.ndarray
    Bxz: jnp.ndarray
    Byy: jnp.ndarray
    Byz: jnp.ndarray
    Bzz: jnp.ndarray
    Binv: jnp.ndarray          # (c,3,3)
    detB: jnp.ndarray
    eta_scale: jnp.ndarray
    renorm: jnp.ndarray        # eta_scale / detC
    breaks_down: jnp.ndarray   # bool
    # diagnostics (MONITOR_FAMOD counters, MomentumSpectra.cpp:1674-1678)
    pl_negative: jnp.ndarray   # bool: pl < 0 or pt < 0
    recon_failed: jnp.ndarray  # bool: Newton reconstruction failure


def reconstruction_species(table: SpeciesTable, max_species: int = 320):
    """The (<= 320)-entry PDG species set the reference feeds the VAH solver
    (MomentumSpectra.cpp:1295)."""
    n = min(max_species, len(table))
    return (jnp.asarray(table.mass[:n]), jnp.asarray(table.sign[:n]),
            jnp.asarray(table.gspin[:n]))


def vah_from_surface(surf, n_padded: int):
    """Pack a legacy VAH surface's (Lambda, aT, aL, upsilonB) columns
    (surface modes 2/3, readindata.cu:812-1055) into padded arrays for
    prepare_famod, converting upsilonB [GeV] to the dimensionless
    upsilonB/Lambda used in f_a."""
    if not getattr(surf, "has_aniso_variables", False):
        return None
    n = surf.n_cells

    def pad(a, fill):
        out = np.full(n_padded, fill, dtype=np.float64)
        out[:n] = a
        return jnp.asarray(out)

    lam = np.asarray(surf.Lambda, dtype=np.float64)
    ups = np.zeros(n) if surf.upsilonB is None else np.asarray(surf.upsilonB)
    return {"lam": pad(lam, 1.0),
            "aT": pad(surf.aT, 1.0),
            "aL": pad(surf.aL, 1.0),
            "upsilonB_over_lam": pad(ups / np.maximum(lam, 1e-300), 0.0)}


@partial(jax.jit, static_argnames=("n_blocks",))
def _reconstruct_f64_jit(cells: CellArrays, mass_pdg, sign_pdg, deg_pdg,
                         n_blocks: int):
    """f32 VAH Newton + one (f32 J, f64 F) chord step + f64 coefficients,
    cell-blocked.

    The fully-f32 reconstruction left Lambda with solver noise that
    exp(E/Lambda) amplified to 2-3e-4 in the f32 famod spectra; running the
    WHOLE 30-iteration backtracking Newton in f64 fixed the accuracy but TPU
    f64 is software-emulated -- ~90 (cells x 320 species x 16 quad) f64
    tensor evals made the reconstruction dominate the spectra and the ~10
    live 670 MB f64 loop intermediates at 16384-cell blocks faulted the
    TPU worker at 1e5 cells.  Newton converges quadratically, so the cheap
    fix is: solve in f32 (fast, MXU/VPU-native), then take ONE chord-Newton
    step from that solution with the residual F in f64 and the chord J in
    f32 (err ~1e-4 -> ~1e-8; see the inline note) -- 1 f64 tensor eval + 1
    f64 coefficient eval instead of ~90, matching the f64 reference path to
    ~1e-8.  Small blocks bound the f64 working set."""
    c = cells
    basis = lrf.milne_basis(c.tau, c.ux, c.uy, c.un)
    pi = lrf.boost_shear(basis, c.tau, c.pitt, c.pitx, c.pity, c.pitn,
                         c.pixx, c.pixy, c.pixn, c.piyy, c.piyn, c.pinn)
    pl = c.P + c.bulkPi + pi.zz
    pt = c.P + c.bulkPi - pi.zz / 2.0

    f32 = jnp.float32
    mass32, sign32, deg32 = (mass_pdg.astype(f32), sign_pdg.astype(f32),
                             deg_pdg.astype(f32))

    def blocked(a):
        return a.astype(jnp.float64).reshape(n_blocks, -1)

    def solve(args):
        E_b, pl_b, pt_b, T_b = args
        T32 = T_b.astype(f32)
        # NOTE (measured negative result, 2026-08-18): warm-starting this
        # Newton from the conformal factorization approximant (io/surface
        # aL_fit + R200, arsenal.cu:1018-1079) was interleaved-A/B'd at 1e5
        # cells on v5e: 0.92-1.09x wall (window noise, ~neutral), and it
        # REGRESSED famod f32-vs-f64 spectra accuracy 3e-5 -> 1.1e-4 -- the
        # chord polish does not fully pin the root (~3e-5 residual guess
        # dependence), and the closer start makes the f32 Newton stop at a
        # worse-converged point.  Keep the equilibrium guess; do not retry.
        sol = find_anisotropic_variables(
            E_b.astype(f32), pl_b.astype(f32), pt_b.astype(f32),
            T32, jnp.ones_like(T32), jnp.ones_like(T32),
            mass32, sign32, deg32)
        X = jnp.stack([sol.lam, sol.aT, sol.aL],
                      axis=-1).astype(jnp.float64)
        ok = ~sol.failed
        Fargs = (E_b, pt_b, pl_b, mass_pdg, sign_pdg, deg_pdg)
        eye = jnp.eye(3, dtype=jnp.float64)[None, :, :]
        # chord step: ONE f64 residual F at the f32 solution, with the
        # chord Jacobian evaluated in f32 (J only sets the chord's
        # contraction RATE, never the f64 fixed point: a 4e-6-relative J
        # error contributes cond(J) * 4e-6 * |dX| ~ 1e-9 to the step, vs
        # the ~1e-8 quadratic Newton term).  Measured on v5e at 2e4 cells:
        # f64 J = 1.1 s vs f32 J ~ 0.15 s, and the former 2nd chord step
        # (another 0.55 s f64 F) only polished 1e-8 -> 3e-9 -- far below
        # the ~3e-7 Lambda accuracy the 1e-5 spectra class needs.  (The
        # earlier rejected "all-f32 J" experiment was inside the f32
        # NEWTON, where the f32 F fixed point itself was the problem.)
        F = compute_F(X, *Fargs)
        J32 = compute_J(X.astype(f32), F.astype(f32), E_b.astype(f32),
                        pt_b.astype(f32), pl_b.astype(f32),
                        mass32, sign32, deg32)
        J = jnp.where(ok[:, None, None], J32.astype(jnp.float64), eye)
        X_new = X + _solve3x3(J, -F)
        good = ok & jnp.all(jnp.isfinite(X_new) & (X_new > 0.0), axis=-1)
        X = jnp.where(good[:, None], X_new, X)
        # failed lanes keep the equilibrium guess, as the reference does
        lam = jnp.where(sol.failed, T_b, X[:, 0])
        aT = jnp.where(sol.failed, 1.0, X[:, 1])
        aL = jnp.where(sol.failed, 1.0, X[:, 2])
        bpp, bwp = compute_famod_coefficients(lam, aT, aL,
                                              mass_pdg, sign_pdg, deg_pdg,
                                              mixed_precision=True)
        return lam, aT, aL, sol.failed, bpp, bwp

    lam, aT, aL, failed, bpp, bwp = jax.lax.map(
        solve, (blocked(c.E), blocked(pl), blocked(pt), blocked(c.T)))
    return {"lam": lam.reshape(-1), "aT": aT.reshape(-1),
            "aL": aL.reshape(-1), "failed": failed.reshape(-1),
            "betapiperp": bpp.reshape(-1), "betaWperp": bwp.reshape(-1)}


def prepare_famod(cells: CellArrays, species_table: SpeciesTable,
                  cfg: Config, vah: dict | None = None) -> FamodCellData:
    """VAH reconstruction + famod cell data.

    The batched Newton solve over (cells x <=320 species x 16 quadrature
    points) is the only setup-scale computation that is not tiny (minutes on
    the host at 1e4+ cells).  When the result feeds the f32 fast kernel the
    solve runs jitted on the default device in f64 (cell-blocked,
    `_reconstruct_f64_jit`) and only the cheap per-cell algebra and the
    spectra contraction stay f32 -- this keeps the f32 famod spectra in the
    df 1-4 accuracy class (~1e-5) instead of the 2-3e-4 a fully-f32 Newton
    gives; the f64 broadcast path keeps the host f64 solve for golden
    parity.

    vah: optional padded (lam, aT, aL, upsilonB_over_lam) arrays from a
    legacy VAH surface (modes 2/3) -- used directly, skipping the Newton
    reconstruction (the famod coefficient integrals still run).
    """
    mass_pdg, sign_pdg, deg_pdg = reconstruction_species(species_table)
    if cfg.compute_dtype == "f32":
        f32 = jnp.float32

        def cast(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(f32)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a, tree)

        # pin to the accelerator: may be called inside a host_prep context
        with jax.default_device(jax.devices()[0]):
            sol = None
            if vah is None:
                # smallest divisor of n_padded keeping blocks <= 8192
                # cells (n_padded is a multiple of cell_block, so a small
                # divisor always exists); bounds the (block x 320 species
                # x 16 quad) f64 polish working set to ~2 GB
                n_blocks = max(-(-cells.n_padded // 8192), 1)
                while cells.n_padded % n_blocks:
                    n_blocks += 1
                sol = _reconstruct_f64_jit(cells, mass_pdg, sign_pdg,
                                           deg_pdg, n_blocks)
                sol = {k: (v if v.dtype == jnp.bool_ else v.astype(f32))
                       for k, v in sol.items()}
            return _prepare_famod_body(cast(cells), mass_pdg.astype(f32),
                                       sign_pdg.astype(f32),
                                       deg_pdg.astype(f32), cfg, cast(vah),
                                       sol)
    return _prepare_famod_host(cells, mass_pdg, sign_pdg, deg_pdg, cfg, vah)


@host_prep
def _prepare_famod_host(cells, mass_pdg, sign_pdg, deg_pdg, cfg, vah=None):
    return _prepare_famod_body(cells, mass_pdg, sign_pdg, deg_pdg, cfg, vah)


@partial(jax.jit, static_argnames=("cfg",))
def _prepare_famod_body(cells: CellArrays, mass_pdg, sign_pdg, deg_pdg,
                        cfg: Config, vah: dict | None = None,
                        sol: dict | None = None) -> FamodCellData:
    c = cells

    basis = lrf.milne_basis(c.tau, c.ux, c.uy, c.un)
    pi = lrf.boost_shear(basis, c.tau, c.pitt, c.pitx, c.pity, c.pitn,
                         c.pixx, c.pixy, c.pixn, c.piyy, c.piyn, c.pinn)

    pl = c.P + c.bulkPi + pi.zz
    pt = c.P + c.bulkPi - pi.zz / 2.0

    if cfg.include_shear_deltaf:
        piTxx = (pi.xx - pi.yy) / 2.0
        piTxy = pi.xy
        piTyy = -piTxx
        WTzx = pi.xz
        WTzy = pi.yz
    else:
        zeros = jnp.zeros_like(pl)
        piTxx = piTxy = piTyy = WTzx = WTzy = zeros

    pl_negative = (pl < 0) | (pt < 0)
    if vah is not None:
        # legacy VAH surface: (Lambda, aT, aL) are given (modes 2/3)
        lam, aT, aL = vah["lam"], vah["aT"], vah["aL"]
        recon_failed = (lam <= 0.0) | (aT <= 0.0) | (aL <= 0.0)
        breaks = recon_failed
        upsilonB = vah["upsilonB_over_lam"]
        betapiperp, betaWperp = compute_famod_coefficients(
            lam, aT, aL, mass_pdg, sign_pdg, deg_pdg)
    elif sol is not None:
        # precomputed f64 device reconstruction (_reconstruct_f64_jit)
        recon_failed = sol["failed"]
        breaks = recon_failed | pl_negative
        lam, aT, aL = sol["lam"], sol["aT"], sol["aL"]
        betapiperp, betaWperp = sol["betapiperp"], sol["betaWperp"]
        upsilonB = c.alphaB
    else:
        # reconstruct anisotropic variables from the equilibrium guess;
        # guard negative (pl, pt) inputs (they mark breakdown anyway)
        s = find_anisotropic_variables(c.E, pl, pt, c.T,
                                       jnp.ones_like(c.T), jnp.ones_like(c.T),
                                       mass_pdg, sign_pdg, deg_pdg)
        recon_failed = s.failed
        breaks = recon_failed | pl_negative
        lam, aT, aL = s.lam, s.aT, s.aL
        upsilonB = c.alphaB
        betapiperp, betaWperp = compute_famod_coefficients(
            lam, aT, aL, mass_pdg, sign_pdg, deg_pdg)
    shear_coeff = 0.5 / betapiperp
    diff_coeff = 1.0 / betaWperp

    detA = aT * aT * aL

    Cxx = 1.0 + shear_coeff * piTxx
    Cxy = shear_coeff * piTxy
    Cxz = diff_coeff * WTzx * aT / (aT + aL)
    Cyy = 1.0 + shear_coeff * piTyy
    Cyz = diff_coeff * WTzy * aT / (aT + aL)
    Czx = diff_coeff * WTzx * aL / (aT + aL)
    Czy = diff_coeff * WTzy * aL / (aT + aL)
    detC = (Cxx * (Cyy * 1.0 - Cyz * Czy) - Cxy * (Cxy * 1.0 - Cyz * Czx)
            + Cxz * (Cxy * Czy - Cyy * Czx))

    Bxx = aT + aT * shear_coeff * piTxx
    Bxy = aT * shear_coeff * piTxy
    Bxz = diff_coeff * WTzx * aT * aL / (aT + aL)
    Byy = aT + aT * shear_coeff * piTyy
    Byz = diff_coeff * WTzy * aT * aL / (aT + aL)
    Bzz = aL

    detB = detC * detA
    detB_bulk_23 = (2.0 * aT + aL) ** 2 / 9.0

    breaks = breaks | (detB <= cfg.deta_min)

    if cfg.dimension == 2:
        eta_scale = jnp.where(detB > cfg.deta_min, detB / detB_bulk_23, 1.0)
    else:
        eta_scale = jnp.ones_like(detB)

    detC_safe = jnp.where(jnp.abs(detC) > 1e-300, detC, 1.0)
    renorm = eta_scale / detC_safe
    breaks = breaks | ~jnp.isfinite(renorm)

    # symmetric-B adjugate inverse (reference: GSL LU, MomentumSpectra.cpp:1431-1449)
    detB_safe = jnp.where(jnp.abs(detB) > 1e-300, detB, 1.0)
    c00 = Byy * Bzz - Byz * Byz
    c01 = Bxz * Byz - Bxy * Bzz
    c02 = Bxy * Byz - Bxz * Byy
    c11 = Bxx * Bzz - Bxz * Bxz
    c12 = Bxy * Bxz - Bxx * Byz
    c22 = Bxx * Byy - Bxy * Bxy
    # det of symmetric B equals detB = detC*detA in exact arithmetic
    detB_sym = Bxx * c00 + Bxy * c01 + Bxz * c02
    detB_sym = jnp.where(jnp.abs(detB_sym) > 1e-300, detB_sym, 1.0)
    Binv = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c01, c11, c12], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2) / detB_sym[:, None, None]

    return FamodCellData(
        Xt=basis.Xt, Xx=basis.Xx, Xy=basis.Xy, Xn=basis.Xn,
        Yx=basis.Yx, Yy=basis.Yy, Zt=basis.Zt, Zn=basis.Zn,
        lam=lam, aT=aT, aL=aL, upsilonB=upsilonB,
        Bxx=Bxx, Bxy=Bxy, Bxz=Bxz, Byy=Byy, Byz=Byz, Bzz=Bzz,
        Binv=Binv, detB=detB, eta_scale=eta_scale, renorm=renorm,
        breaks_down=breaks, pl_negative=pl_negative,
        recon_failed=recon_failed,
    )


def _solve_pmod_B(fm: FamodCellData, px_lrf, py_lrf, pz_lrf, n_refine: int = 2):
    Bi = fm.Binv

    def C(a):
        return a[:, None, None, None, None, None]

    def matvec(m, x, y, z):
        return (C(m[:, 0, 0]) * x + C(m[:, 0, 1]) * y + C(m[:, 0, 2]) * z,
                C(m[:, 1, 0]) * x + C(m[:, 1, 1]) * y + C(m[:, 1, 2]) * z,
                C(m[:, 2, 0]) * x + C(m[:, 2, 1]) * y + C(m[:, 2, 2]) * z)

    def Bmatvec(x, y, z):
        return (C(fm.Bxx) * x + C(fm.Bxy) * y + C(fm.Bxz) * z,
                C(fm.Bxy) * x + C(fm.Byy) * y + C(fm.Byz) * z,
                C(fm.Bxz) * x + C(fm.Byz) * y + C(fm.Bzz) * z)

    mx, my, mz = matvec(Bi, px_lrf, py_lrf, pz_lrf)
    for _ in range(n_refine):
        rx, ry, rz = Bmatvec(mx, my, mz)
        cx, cy, cz = matvec(Bi, px_lrf - rx, py_lrf - ry, pz_lrf - rz)
        mx, my, mz = mx + cx, my + cy, mz + cz
    return mx, my, mz


def _cell_block_famod(c: CellArrays, fm: FamodCellData, species: SpeciesArrays,
                      grid: MomentumGridDevice, cfg: Config):
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
        eta = grid.eta[None, :]
        d_break = -jnp.broadcast_to(eta, (c.tau.shape[0], eta.shape[1]))[:, None, None, None, None, :]
        d_mod = -(fm.eta_scale[:, None] * eta)[:, None, None, None, None, :]
        w_eta = grid.eta_weight[None, None, None, None, None, :]
    else:
        delta = (grid.y[None, :, None] - c.eta[:, None, None])[:, None, None, None, :, :]
        d_break = delta
        d_mod = delta
        w_eta = jnp.ones((1, 1, 1, 1, 1, 1))

    sgn = S(species.sign)
    b_s = S(species.baryon)
    m2 = S(species.mass ** 2)
    chem = b_s * C(c.alphaB)
    chem_eff = b_s * C(fm.upsilonB)

    # feq fallback branch (MomentumSpectra.cpp:1538-1554)
    sinh_b = jnp.sinh(d_break)
    cosh_b = jnp.sqrt(1.0 + sinh_b * sinh_b)
    pt_b = mT6 * cosh_b
    pn_b = mT6 / C(c.tau) * sinh_b
    pdd_b = pt_b * C(c.dat) + px * C(c.dax) + py * C(c.day) + pn_b * C(c.dan)
    u_p = pt_b * C(c.ut) - px * C(c.ux) - py * C(c.uy) - pn_b * C(tau2 * c.un)
    f_break = 1.0 / (jnp.exp(u_p / C(c.T) - chem) + sgn)
    if cfg.outflow:
        pdd_b = jnp.where(pdd_b > 0.0, pdd_b, 0.0)
    value_break = pdd_b * f_break

    # famod branch (MomentumSpectra.cpp:1556-1615)
    sinh_m = jnp.sinh(d_mod)
    cosh_m = jnp.sqrt(1.0 + sinh_m * sinh_m)
    pt_m = mT6 * cosh_m
    pn_m = mT6 / C(c.tau) * sinh_m
    pdd_m = pt_m * C(c.dat) + px * C(c.dax) + py * C(c.day) + pn_m * C(c.dan)
    tau2_pn = C(tau2) * pn_m
    px_lrf = -C(fm.Xt) * pt_m + C(fm.Xx) * px + C(fm.Xy) * py + C(fm.Xn) * tau2_pn
    py_lrf = C(fm.Yx) * px + C(fm.Yy) * py
    pz_lrf = -C(fm.Zt) * pt_m + C(fm.Zn) * tau2_pn
    mx, my, mz = _solve_pmod_B(fm, px_lrf, py_lrf, pz_lrf)
    E_mod = jnp.sqrt(m2 + mx * mx + my * my + mz * mz)
    renorm = jnp.abs(C(fm.renorm))
    f_mod = renorm / (jnp.exp(E_mod / C(fm.lam) - chem_eff) + sgn)
    if cfg.outflow:
        pdd_m = jnp.where(pdd_m > 0.0, pdd_m, 0.0)
    value_mod = pdd_m * f_mod

    breaks = C(fm.breaks_down)
    if cfg.dimension == 3:
        narrow = (C(fm.detB) < 0.01) & (jnp.abs(d_break) < C(fm.detB))
        use_break = breaks | narrow
    else:
        use_break = breaks

    value = jnp.where(use_break, value_break, value_mod)
    w_cell = c.mask[:, None, None, None, None, None] * w_eta
    contrib = jnp.sum(w_cell * value, axis=(0, 5))
    return PREFACTOR * species.degeneracy[:, None, None, None] * contrib


@partial(jax.jit, static_argnames=("cfg", "n_blocks"))
def _spectra_famod_jit(cells: CellArrays, fm: FamodCellData,
                       species: SpeciesArrays, grid: MomentumGridDevice,
                       cfg: Config, n_blocks: int):
    S_count = species.mass.shape[0]
    out_shape = (S_count, grid.pT.shape[0], grid.cos_phi.shape[0], grid.y.shape[0])
    blk = cells.n_padded // n_blocks

    def take(a, i):
        return jax.lax.dynamic_slice_in_dim(a, i * blk, blk, axis=0)

    def body(acc, i):
        cb = jax.tree_util.tree_map(lambda a: take(a, i), cells)
        fb = jax.tree_util.tree_map(lambda a: take(a, i), fm)
        return acc + _cell_block_famod(cb, fb, species, grid, cfg), None

    acc, _ = jax.lax.scan(body, jnp.zeros(out_shape), jnp.arange(n_blocks))
    return acc


def compute_spectra_famod(cells: CellArrays, species: SpeciesArrays,
                          grid: MomentumGridDevice, species_table: SpeciesTable,
                          cfg: Config, n_blocks: int):
    fm = prepare_famod(cells, species_table, cfg)
    return _spectra_famod_jit(cells, fm, species, grid, cfg, n_blocks)
