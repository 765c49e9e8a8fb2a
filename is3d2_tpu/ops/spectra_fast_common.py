"""Input packing shared by the Pallas Cooper-Frye kernel.

Builds the dense f32 operand layout consumed by ops/cooper_frye_pallas.py
from the validated CellArrays / coefficient columns / momentum grid:

  q    (C, 64) : [Q_E | Q_d (mask folded) | Q_pi | Q_V], 16 columns each,
                 contraction coefficients against the P16 momentum rows
  cols (C, 16) : per-cell scalars (invT, alphaB, df columns, mask)
  mom  (8, M)  : per-momentum-point rows (mT, px, py, mass^2, baryon, sign)
  eta  (8, Ne) : (cosh eta, -sinh eta, weight) quadrature rows
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.cells import CellArrays
from ..core.spectra import PREFACTOR, MomentumGridDevice, SpeciesArrays


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_inputs(cells: CellArrays, coeffs: dict, species: SpeciesArrays,
                grid: MomentumGridDevice, cfg: Config,
                c_tile: int = 512, m_tile: int = 1024):
    f32 = jnp.float32
    c = cells
    C = c.n_padded
    C_pad = _round_up(C, c_tile)
    tau = c.tau
    tau2 = tau * tau

    def pad_c(a, fill=0.0):
        a = jnp.asarray(a, f32)
        return jnp.pad(a, (0, C_pad - C), constant_values=fill)

    zero = jnp.zeros(C_pad, f32)
    one = jnp.ones(C_pad, f32)

    def stack16(cols_list):
        cols_list = list(cols_list) + [zero] * (16 - len(cols_list))
        return jnp.stack(cols_list, axis=1)

    mask = pad_c(c.mask)
    # pad ut with a large value: tile-padding cells (C_pad > C) have E = 0
    # otherwise, and 1/(exp(0) - 1) = inf for bosons turns the masked
    # pdd = 0 product into NaN; E ~ 50 mT drives feq to 0 instead
    Q_E = stack16([pad_c(c.ut, 50.0), pad_c(-c.ux), pad_c(-c.uy),
                   pad_c(-tau * c.un)])
    Q_d = stack16([pad_c(c.dat) * mask, pad_c(c.dax) * mask,
                   pad_c(c.day) * mask, pad_c(c.dan / tau) * mask])
    Q_pi = jnp.concatenate([
        jnp.zeros((C_pad, 4), f32),
        jnp.stack([pad_c(c.pitt), pad_c(c.pixx), pad_c(c.piyy),
                   pad_c(tau2 * c.pinn), pad_c(-2.0 * c.pitx),
                   pad_c(-2.0 * c.pity), pad_c(-2.0 * tau * c.pitn),
                   pad_c(2.0 * c.pixy), pad_c(2.0 * tau * c.pixn),
                   pad_c(2.0 * tau * c.piyn)], axis=1),
        jnp.zeros((C_pad, 2), f32),
    ], axis=1)
    Q_V = stack16([pad_c(c.Vt), pad_c(-c.Vx), pad_c(-c.Vy), pad_c(-tau * c.Vn)])
    q = jnp.concatenate([Q_E, Q_d, Q_pi, Q_V], axis=1)          # (C_pad, 64)

    cols = stack16([pad_c(1.0 / c.T, 1.0), pad_c(c.alphaB),
                    pad_c(coeffs["shear"]), pad_c(coeffs["bulk0"]),
                    pad_c(coeffs["bulk1"]), pad_c(coeffs["bulk2"]),
                    pad_c(coeffs["diff0"]), pad_c(coeffs["diff1"]),
                    one])  # final mask column is all-ones: mask folded in Q_d

    # momentum rows
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)
    S, NpT = mT.shape
    Nphi = grid.cos_phi.shape[0]
    M = S * NpT * Nphi
    M_pad = _round_up(M, m_tile)

    def flat(a):
        return jnp.broadcast_to(a, (S, NpT, Nphi)).reshape(M)

    def pad_m(a, fill):
        return jnp.pad(jnp.asarray(a, f32), (0, M_pad - M), constant_values=fill)

    mom = jnp.stack([
        pad_m(flat(mT[:, :, None]), 1.0),
        pad_m(flat((grid.pT[:, None] * grid.cos_phi[None, :])[None]), 0.0),
        pad_m(flat((grid.pT[:, None] * grid.sin_phi[None, :])[None]), 0.0),
        pad_m(flat((species.mass ** 2)[:, None, None]), 1.0),
        pad_m(flat(species.baryon[:, None, None]), 0.0),
        pad_m(flat(species.sign[:, None, None]), -1.0),
        jnp.zeros(M_pad, f32),
        jnp.zeros(M_pad, f32),
    ])

    Ne = grid.eta.shape[0]
    Ne_pad = _round_up(max(Ne, 1), 128)
    eta_pack = jnp.zeros((8, Ne_pad), f32)
    eta_pack = eta_pack.at[0, :Ne].set(jnp.cosh(grid.eta).astype(f32))
    eta_pack = eta_pack.at[1, :Ne].set((-jnp.sinh(grid.eta)).astype(f32))
    eta_pack = eta_pack.at[2, :Ne].set(grid.eta_weight.astype(f32))

    return q, cols, mom, eta_pack, M, Ne


def pack_inputs_comp(cells: CellArrays, coeffs: dict, species: SpeciesArrays,
                     grid: MomentumGridDevice, cfg: Config,
                     c_tile: int = 512, m_tile: int = 512):
    """Operands for the compensated-argument kernel (_kernel_comp): the
    standard pack plus 12-bit-split argument pieces prepared in f64 on the
    host, exactly core/spectra_fast._cell_Q_comp / momentum_matrix_comp
    reshaped for VMEM tiles:

      cols (C, 16): columns 9..15 gain [qx1, qx2, qy1, qy2, abf, abl, Tf]
      qm1/qm2 (C, Ne_lane): per-(cell, eta) split E-coefficients of mT
        (the eta hyperbolics fold into the cell side so qm*mT1 is exact)
      mom (16, M): [mT1, mT2, mTf, px1, px2, pxf, py1, py2, pyf,
        mass2, baryon, sign, 0...]
    """
    from ..core.spectra_fast import _split12

    f32 = jnp.float32
    f64 = jnp.float64
    q, cols, _, eta_pack, M, Ne = pack_inputs(cells, coeffs, species, grid,
                                              cfg, c_tile, m_tile)
    c = cells
    C = c.n_padded
    C_pad = q.shape[0]

    def pad_c(a, fill=0.0):
        a = jnp.asarray(a, f32)
        return jnp.pad(a, (0, C_pad - C), constant_values=fill)

    invT = 1.0 / c.T.astype(f64)
    eta64 = grid.eta.astype(f64)
    cosh_e = jnp.cosh(eta64)[None, :]                  # (1, Ne)
    sinh_e = (-jnp.sinh(eta64))[None, :]               # y = 0: Delta = -eta
    qm64 = (c.ut.astype(f64)[:, None] * cosh_e
            - (c.tau * c.un).astype(f64)[:, None] * sinh_e) \
        * invT[:, None]                                # (C, Ne)
    qm1, qm2 = _split12(qm64)
    ne_lane = 16 if Ne <= 16 else _round_up(Ne, 128)
    # tile-padding cells get a large positive coefficient (like Q_E's
    # ut = 50 pad): A ~ 50 mT1 drives feq -> 0 instead of a boson NaN
    qm1 = jnp.pad(qm1, ((0, C_pad - C), (0, ne_lane - Ne)),
                  constant_values=0.0)
    qm1 = qm1.at[C:, :].set(50.0)
    qm2 = jnp.pad(qm2, ((0, C_pad - C), (0, ne_lane - Ne)),
                  constant_values=0.0)

    qx1, qx2 = _split12(-c.ux.astype(f64) * invT)
    qy1, qy2 = _split12(-c.uy.astype(f64) * invT)
    abf, abl = _split12(c.alphaB.astype(f64))
    comp_cols = jnp.stack([pad_c(qx1), pad_c(qx2), pad_c(qy1), pad_c(qy2),
                           pad_c(abf), pad_c(abl), pad_c(c.T, 1.0)], axis=1)
    cols = jnp.concatenate([cols[:, :9], comp_cols], axis=1)   # (C_pad, 16)

    # split momentum rows (momentum_matrix_comp layout, padded/tiled)
    mT64 = jnp.sqrt(species.mass[:, None].astype(f64) ** 2
                    + grid.pT[None, :].astype(f64) ** 2)
    S, NpT = mT64.shape
    Nphi = grid.cos_phi.shape[0]
    M_pad = _round_up(M, m_tile)

    def flat(a):
        return jnp.broadcast_to(a, (S, NpT, Nphi)).reshape(M)

    def pad_m(a, fill):
        return jnp.pad(jnp.asarray(a, f32), (0, M_pad - M),
                       constant_values=fill)

    px64 = flat((grid.pT[:, None] * grid.cos_phi[None, :]
                 ).astype(f64)[None])
    py64 = flat((grid.pT[:, None] * grid.sin_phi[None, :]
                 ).astype(f64)[None])
    mT1, mT2 = _split12(flat(mT64[:, :, None]))
    px1, px2 = _split12(px64)
    py1, py2 = _split12(py64)
    zero_m = jnp.zeros(M_pad, f32)
    mom = jnp.stack([
        pad_m(mT1, 1.0), pad_m(mT2, 0.0), pad_m(flat(mT64[:, :, None]), 1.0),
        pad_m(px1, 0.0), pad_m(px2, 0.0), pad_m(px64, 0.0),
        pad_m(py1, 0.0), pad_m(py2, 0.0), pad_m(py64, 0.0),
        pad_m(flat((species.mass ** 2)[:, None, None]), 1.0),
        pad_m(flat(species.baryon[:, None, None]), 0.0),
        pad_m(flat(species.sign[:, None, None]), -1.0),
        zero_m, zero_m, zero_m, zero_m,
    ])
    return q, cols, qm1, qm2, mom, eta_pack, M, Ne


def compute_spectra_pallas(cells: CellArrays, coeffs: dict,
                           species: SpeciesArrays, grid: MomentumGridDevice,
                           cfg: Config, c_tile: int = 512, m_tile: int = 512,
                           interpret: bool = False,
                           precision=None, dot_impl: str = "split"):
    """Full Pallas spectra: returns (S, NpT, Nphi, 1) f64.

    Production defaults from the 2026-08-19 on-silicon interleaved sweep
    (tools/pallas_sweep.py, 16384 cells, eta-folded, 3 rounds): the
    exact-bf16-split MXU dots (dot_impl="split", _dot3) BEAT the XLA f32
    fast path 0.83-0.95x across every tile tried, with (512, 512) the
    fastest absolute (4.11 s = 8.7e10 evals/s vs XLA 4.73 s = 7.6e10) --
    the first Pallas-over-XLA result after the HIGHEST-dot variant lost
    3-13% for two rounds.  Accuracy: O(2^-18) of the contraction
    magnitude (u.p keeps HIGHEST because exp amplifies argument error) --
    ~4e-6 relative on typical entries, up to ~1e-4 where the df
    correction nearly cancels f_eq (df-2 diffusion tails measured 5.3e-5,
    test_pallas_split_dot_matches); use dot_impl="highest" for
    ~8e-6-exact MXU dots at ~1.3x the wall."""
    from .cooper_frye_pallas import cooper_frye_pallas

    if cfg.dimension != 2:
        raise ValueError("pallas kernel implements the 2+1d benchmark geometry")
    if cfg.df_mode not in (1, 2):
        raise ValueError("pallas kernel implements df modes 1/2")
    # Mosaic compiles only for TPU; on the CPU backend (tests, dryrun)
    # fall back to interpret mode so use_pallas works everywhere
    interpret = interpret or jax.default_backend() == "cpu"

    from ..core.spectra_fast import fold_eta_quadrature
    cells, grid, _ = fold_eta_quadrature(cells, grid, cfg)

    if dot_impl == "comp":
        # compensated-argument kernel: <=1e-6 class (see _kernel_comp)
        from .cooper_frye_pallas import cooper_frye_pallas_comp
        q, cols, qm1, qm2, mom, eta_pack, M, Ne = pack_inputs_comp(
            cells, coeffs, species, grid, cfg, c_tile, m_tile)
        flat = cooper_frye_pallas_comp(q, cols, qm1, qm2, mom, eta_pack,
                                       cfg, c_tile=c_tile, m_tile=m_tile,
                                       n_eta=Ne, interpret=interpret)[:M]
    else:
        q, cols, mom, eta_pack, M, Ne = pack_inputs(cells, coeffs, species,
                                                    grid, cfg, c_tile, m_tile)
        if precision is None:
            precision = jax.lax.Precision.HIGHEST
        flat = cooper_frye_pallas(q, cols, mom, eta_pack, cfg,
                                  c_tile=c_tile, m_tile=m_tile, n_eta=Ne,
                                  interpret=interpret, precision=precision,
                                  dot_impl=dot_impl)[:M]
    S = species.mass.shape[0]
    NpT = grid.pT.shape[0]
    Nphi = grid.cos_phi.shape[0]
    out = flat.reshape(S, NpT, Nphi, 1)
    return PREFACTOR * species.degeneracy.astype(out.dtype)[:, None, None, None] * out
