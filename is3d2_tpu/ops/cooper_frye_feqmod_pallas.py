"""Pallas TPU kernel for the feqmod/famod (df 3/4/5) P9 spectra, 2+1d.

Extends the fused Cooper-Frye kernel family (ops/cooper_frye_pallas.py,
which covers df 1/2) to the modified-equilibrium distributions: the same
P9 light-cone contraction structure as core/spectra_feqmod_fast.py
(`_one_eta_block`), expressed as a Pallas program so the per-cell
coefficient tile, the per-species momentum basis and the accumulator all
live in VMEM with explicit tiling.  Mirrors the reference GPU backend's
role (emissionfunction.cu:152-451) for the modes the reference GPU never
shipped (its feqmod kernel launch is commented out, emissionfunction.cu:
2514-2544).

  grid = (m tiles, species, cell tiles); each program holds a (C_t, 64)
  per-cell coefficient tile, one species' (16, M_t) momentum-basis tile
  [P9 rows | mass^2 | baryon | sign], and the (C_t, 1) renorm /
  reduction-mask columns for that (cell tile, species).  It loops the eta
  quadrature, evaluates BOTH the modified branch (E_mod^2 quadratic form
  through U = M^-1 L, as exact-f32 VPU FMA chains) and the linearized
  breakdown branch, where-selects per cell, and reduces over the cell
  tile on the VPU (a DEFAULT-precision mask matmul would round the
  values to bf16).  Cell tile i_c accumulates into row i_c % 8 of its
  (8, M_t) out block; the host sums the 8 rows in f64, so accumulation
  chains stay short exactly as in the XLA fast path.

Validated in interpret mode against the f64 golden engines
(tests/test_pallas_kernel.py) AND on real TPU v5e silicon against the XLA
fast path (tests/test_pallas_tpu.py, <=8e-6).  The XLA fast path remains
the production default; `use_pallas = 1` in the parameter file routes
spectra through this kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config

# cols layout (C, 64) ------------------------------------------------------
_I_INVT = 0
_I_ALPHAB = 1
_I_DAT, _I_DAX, _I_DAY, _I_DANT = 2, 3, 4, 5
_I_XT, _I_XX, _I_XY, _I_XNT, _I_YX, _I_YY, _I_ZT, _I_ZNT = range(6, 14)
_I_MINV = 14                     # 14..22: M^-1 row-major (3x3)
_I_INVTEFF, _I_ALPHAB_EFF, _I_ETA_SCALE, _I_BREAKS = 23, 24, 25, 26
_I_UT, _I_UX, _I_UY, _I_TUN = 27, 28, 29, 30
_I_K = 31                        # 31..40: pi quadratic coefficients k0..k9
_I_VT, _I_VX, _I_VY, _I_TVN = 41, 42, 43, 44
_I_RATIO, _I_SHEARC = 45, 46
_I_BULK0, _I_BULK1, _I_BULK2, _I_BULKPI = 47, 48, 49, 50
_I_INVBETAV, _I_DZM3DL, _I_DL = 51, 52, 53

# P rows (16, M): P9 basis + species scalars broadcast along M
_R_MT, _R_PX, _R_PY = 0, 1, 2
_R_MT2, _R_PX2, _R_PY2, _R_MTPX, _R_MTPY, _R_PXPY = 3, 4, 5, 6, 7, 8
_R_MASS2, _R_BARYON, _R_SIGN = 9, 10, 11


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(cols_ref, p_ref, renorm_ref, red_ref, eta_ref, out_ref, *,
            cfg: Config, kind: str, n_eta: int, dot_impl: str = "vpu"):
    """cols_ref: (C_t, 64); p_ref: (1, 16, M_t); renorm_ref/red_ref:
    (C_t, 1); eta_ref: (8, Ne_pad) SMEM rows [eta, weight]; out_ref:
    (1, 8, M_t), cell tile i_c accumulates into row i_c % 8.

    dot_impl="mxu" (round 5): the K<=6 contractions against the P16 rows
    move from VPU broadcast FMA chains onto MXU dots -- the df-1/2 split
    kernel's winning restructure (ops/cooper_frye_pallas).  The exp
    arguments (E2 for the modified branch, E for the breakdown branch)
    take HIGHEST (6-pass) dots since exp amplifies argument error;
    p.dsigma / pi:pp / V.p take the 3-pass exact-bf16-split _dot3; the
    cell reduction becomes the 2-pass split ones-row dot.  Coefficient
    tiles (C_t, 16) are assembled from the per-(cell, eta) coefficient
    columns by iota masking (Mosaic-safe lane placement)."""
    C_t = cols_ref.shape[0]
    M_t = p_ref.shape[2]
    f32 = jnp.float32
    mxu = dot_impl == "mxu"

    def col(i):
        return cols_ref[:, i:i + 1]                       # (C_t, 1)

    def row(i):
        return p_ref[0, i:i + 1, :]                       # (1, M_t)

    if mxu:
        from .cooper_frye_pallas import _bf16_round, _dot3
        P16 = p_ref[0]                                    # (16, M_t)
        P16_h = _bf16_round(P16)
        P16_l = P16 - P16_h
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (C_t, 16), 1)

        def q16(pairs):
            """(C_t, 16) coefficient tile with column k = coefficient
            (a (C_t, 1) column or a scalar) for each (k, coef) pair."""
            acc = jnp.zeros((C_t, 16), f32)
            for k, coef in pairs:
                acc = acc + jnp.where(lane16 == k, coef, 0.0)
            return acc

        def dot_hi(Q):
            return jnp.dot(Q, P16, preferred_element_type=f32,
                           precision=jax.lax.Precision.HIGHEST)

        def dot_sp(Q):
            Q_h = _bf16_round(Q)
            return _dot3(Q_h, Q - Q_h, P16_h, P16_l)

    P0, P1, P2 = row(_R_MT), row(_R_PX), row(_R_PY)
    Pq = [row(_R_MT2), row(_R_PX2), row(_R_PY2),
          row(_R_MTPX), row(_R_MTPY), row(_R_PXPY)]
    mass2 = row(_R_MASS2)
    b_m = row(_R_BARYON)
    sgn = row(_R_SIGN)

    # renorm/red blocks are (C_t, 128) species-lane tiles (Mosaic requires
    # lane-dim blocks of 128); select this program's species column with an
    # iota compare + lane reduction
    lane = jax.lax.rem(pl.program_id(1), jnp.int32(128))
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, renorm_ref.shape, 1)
    lane_sel = (lane_ids == lane).astype(f32)
    renorm = jnp.sum(renorm_ref[...] * lane_sel, axis=1, keepdims=True)
    red = jnp.sum(red_ref[...] * lane_sel, axis=1, keepdims=True)

    invT = col(_I_INVT)
    alphaB = col(_I_ALPHAB)
    breaks = col(_I_BREAKS)

    def eta_body(e, acc):
        eta_e = eta_ref[0, e]
        w_e = eta_ref[1, e]

        # ---------------- modified branch ----------------
        # cosh/sinh via exp: Mosaic has no cosh/sinh lowering on TPU
        sm = col(_I_ETA_SCALE) * eta_e
        ex = jnp.exp(sm)
        exi = 1.0 / ex
        ch = 0.5 * (ex + exi)
        sh = 0.5 * (ex - exi)
        a1 = -(col(_I_XT) * ch + col(_I_XNT) * sh)
        c1 = -(col(_I_ZT) * ch + col(_I_ZNT) * sh)

        def mi(i, j):
            return col(_I_MINV + 3 * i + j)

        U_m = [mi(i, 0) * a1 + mi(i, 2) * c1 for i in range(3)]
        U_x = [mi(i, 0) * col(_I_XX) + mi(i, 1) * col(_I_YX)
               for i in range(3)]
        U_y = [mi(i, 0) * col(_I_XY) + mi(i, 1) * col(_I_YY)
               for i in range(3)]

        q = [sum(U_m[i] * U_m[i] for i in range(3)),
             sum(U_x[i] * U_x[i] for i in range(3)),
             sum(U_y[i] * U_y[i] for i in range(3)),
             2.0 * sum(U_m[i] * U_x[i] for i in range(3)),
             2.0 * sum(U_m[i] * U_y[i] for i in range(3)),
             2.0 * sum(U_x[i] * U_y[i] for i in range(3))]

        if kind == "famod":
            pdd_m_coefs = [w_e * (ch * col(_I_DAT) - sh * col(_I_DANT)),
                           w_e * col(_I_DAX), w_e * col(_I_DAY)]
        else:
            # feqmod quirk: the dan term is unweighted
            # (MomentumSpectra.cpp:936)
            pdd_m_coefs = [w_e * ch * col(_I_DAT) - sh * col(_I_DANT),
                           w_e * col(_I_DAX), w_e * col(_I_DAY)]

        if mxu:
            # E2 via one HIGHEST dot: quad coefficients + the mass2 row
            # (coefficient 1) folded into the same contraction
            E2 = dot_hi(q16([(3 + i, q[i]) for i in range(6)] + [(9, 1.0)]))
            pdd_m = dot_sp(q16(list(enumerate(pdd_m_coefs))))
        else:
            E2 = mass2 + sum(qi * Pi for qi, Pi in zip(q, Pq))
            pdd_m = (pdd_m_coefs[0] * P0 + pdd_m_coefs[1] * P1
                     + pdd_m_coefs[2] * P2)

        E_mod = jnp.sqrt(jnp.maximum(E2, 1e-30))
        chem_eff = b_m * col(_I_ALPHAB_EFF)
        f_mod = renorm / (jnp.exp(E_mod * col(_I_INVTEFF) - chem_eff) + sgn)
        if cfg.outflow:
            pdd_m = jnp.maximum(pdd_m, 0.0)
        value_mod = pdd_m * f_mod

        # ---------------- breakdown branch ----------------
        chb = eta_ref[2, e]          # cosh(eta), precomputed on host
        shb = eta_ref[3, e]          # sinh(eta)
        E_coefs = [chb * col(_I_UT) + shb * col(_I_TUN),
                   -col(_I_UX), -col(_I_UY)]
        if kind == "famod":
            pdd_b_coefs = [w_e * (chb * col(_I_DAT) - shb * col(_I_DANT)),
                           w_e * col(_I_DAX), w_e * col(_I_DAY)]
        else:
            pdd_b_coefs = [w_e * chb * col(_I_DAT) - shb * col(_I_DANT),
                           w_e * col(_I_DAX), w_e * col(_I_DAY)]
        if mxu:
            E = dot_hi(q16(list(enumerate(E_coefs))))
            pdd_b = dot_sp(q16(list(enumerate(pdd_b_coefs))))
        else:
            E = E_coefs[0] * P0 + E_coefs[1] * P1 + E_coefs[2] * P2
            pdd_b = (pdd_b_coefs[0] * P0 + pdd_b_coefs[1] * P1
                     + pdd_b_coefs[2] * P2)
        if cfg.outflow:
            pdd_b = jnp.maximum(pdd_b, 0.0)

        if kind == "famod":
            feq = 1.0 / (jnp.exp(E * invT - b_m * alphaB) + sgn)
            value_b = pdd_b * feq
        else:
            def kk(i):
                return col(_I_K + i)

            kq1 = kk(0) * (chb * chb) + kk(3) * (shb * shb) \
                - kk(6) * (chb * shb)
            kq4 = kk(4) * chb - kk(8) * shb
            kq5 = kk(5) * chb - kk(9) * shb
            if mxu:
                pim = dot_sp(q16([(3, kq1), (4, kk(1)), (5, kk(2)),
                                  (6, kq4), (7, kq5), (8, kk(7))]))
                Vp = dot_sp(q16([(0, chb * col(_I_VT) + shb * col(_I_TVN)),
                                 (1, -col(_I_VX)), (2, -col(_I_VY))]))
            else:
                pim = (kq1 * Pq[0] + kk(1) * Pq[1] + kk(2) * Pq[2]
                       + kq4 * Pq[3] + kq5 * Pq[4] + kk(7) * Pq[5])
                Vp = ((chb * col(_I_VT) + shb * col(_I_TVN)) * P0
                      - col(_I_VX) * P1 - col(_I_VY) * P2)

            if cfg.df_mode == 3:
                feq = 1.0 / (jnp.exp(E * invT - b_m * alphaB) + sgn)
                feqbar = 1.0 - sgn * feq
                df = feqbar * (
                    col(_I_SHEARC) * pim / E
                    + (col(_I_BULK0) * E + col(_I_BULK1) * b_m
                       + col(_I_BULK2) * (E - mass2 / E)) * col(_I_BULKPI)
                    + (col(_I_RATIO) - b_m / E) * Vp * col(_I_INVBETAV))
            else:  # PTB linearized: feq without chem (MomentumSpectra.cpp:913)
                feq = 1.0 / (jnp.exp(E * invT) + sgn)
                feqbar = 1.0 - sgn * feq
                df = (feqbar * col(_I_SHEARC) * pim / E
                      + col(_I_DZM3DL)
                      + feqbar * col(_I_DL) * (E - mass2 / E) * invT)
            if cfg.regulate_deltaf:
                df = jnp.clip(df, -1.0, 1.0)
            value_b = pdd_b * feq * (1.0 + df)

        value = breaks * value_b + (1.0 - breaks) * value_mod
        if mxu:
            # 2-pass exact-bf16-split ones-row reduction on the MXU (the
            # red column folds into value first)
            from .cooper_frye_pallas import _bf16_round as _bfr
            v = red * value
            v_h = _bfr(v)
            ones_row = jnp.ones((1, C_t), f32)
            part = (jnp.dot(ones_row, v_h, preferred_element_type=f32)
                    + jnp.dot(ones_row, v - v_h,
                              preferred_element_type=f32))
            return acc + part
        # cell reduction on the VPU with the mask*renorm_finite column
        return acc + jnp.sum(red * value, axis=0, keepdims=True)

    # i32 bounds: Python-int bounds trace an i64 loop counter under
    # jax_enable_x64, which Mosaic cannot legalize on TPU
    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_eta), eta_body,
                            jnp.zeros((1, M_t), f32))

    i_c = pl.program_id(2)
    r = jax.lax.rem(i_c, jnp.int32(8))

    @pl.when(i_c == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 8, M_t), 1)
    sel = (row_ids == r).astype(f32)
    out_ref[...] = out_ref[...] + sel * acc[None]


def pack_feqmod_pallas(data: dict, species, grid, c_tile: int,
                       m_tile: int):
    """Flatten the `_pack_feqmod_fast`/`_pack_famod_fast` dict into the
    dense kernel operands.  Returns (cols, P, renorm, red, eta_pack, M,
    Ne)."""
    f32 = jnp.float32
    C = data["mask"].shape[0]
    C_pad = _round_up(C, c_tile)

    def pad_c(a, fill=0.0):
        a = jnp.asarray(a, f32)
        return jnp.pad(a, (0, C_pad - C), constant_values=fill)

    Mi = jnp.asarray(data["Minv"], f32)
    k = jnp.asarray(data["k"], f32)
    order = [
        (_I_INVT, pad_c(data["invT"], 1.0)),
        (_I_ALPHAB, pad_c(data["alphaB"])),
        (_I_DAT, pad_c(data["dat"])), (_I_DAX, pad_c(data["dax"])),
        (_I_DAY, pad_c(data["day"])), (_I_DANT, pad_c(data["dan_t"])),
        (_I_XT, pad_c(data["Xt"])), (_I_XX, pad_c(data["Xx"])),
        (_I_XY, pad_c(data["Xy"])), (_I_XNT, pad_c(data["Xnt"])),
        (_I_YX, pad_c(data["Yx"])), (_I_YY, pad_c(data["Yy"])),
        (_I_ZT, pad_c(data["Zt"])), (_I_ZNT, pad_c(data["Znt"])),
        (_I_INVTEFF, pad_c(data["invTeff"], 1.0)),
        (_I_ALPHAB_EFF, pad_c(data["alphaB_eff"])),
        (_I_ETA_SCALE, pad_c(data["eta_scale"])),
        (_I_BREAKS, pad_c(jnp.asarray(data["breaks"], f32))),
        (_I_UT, pad_c(data["ut"], 1.0)), (_I_UX, pad_c(data["ux"])),
        (_I_UY, pad_c(data["uy"])), (_I_TUN, pad_c(data["tun"])),
        (_I_VT, pad_c(data["Vt"])), (_I_VX, pad_c(data["Vx"])),
        (_I_VY, pad_c(data["Vy"])), (_I_TVN, pad_c(data["tVn"])),
        (_I_RATIO, pad_c(data["ratio"])),
        (_I_SHEARC, pad_c(data["shear_c"])),
        (_I_BULK0, pad_c(data["bulk0"])), (_I_BULK1, pad_c(data["bulk1"])),
        (_I_BULK2, pad_c(data["bulk2"])),
        (_I_BULKPI, pad_c(data["bulkPi"])),
        (_I_INVBETAV, pad_c(data["inv_betaV"])),
        (_I_DZM3DL, pad_c(data["delta_z_m3dl"])),
        (_I_DL, pad_c(data["dl"])),
    ]
    cols = jnp.zeros((C_pad, 64), f32)
    for i, v in order:
        cols = cols.at[:, i].set(v)
    for i in range(3):
        for j in range(3):
            cols = cols.at[:C, _I_MINV + 3 * i + j].set(Mi[:, i, j])
    for i in range(10):
        cols = cols.at[:C, _I_K + i].set(k[:, i])

    # per-species momentum basis + species scalar rows
    mT = jnp.sqrt(species.mass[:, None] ** 2
                  + grid.pT[None, :] ** 2).astype(f32)
    S, NpT = mT.shape
    Nphi = grid.cos_phi.shape[0]
    M = NpT * Nphi
    M_pad = _round_up(M, m_tile)

    def flat_pad(a, fill):
        a = jnp.broadcast_to(a, (S, NpT, Nphi)).reshape(S, M).astype(f32)
        return jnp.pad(a, ((0, 0), (0, M_pad - M)), constant_values=fill)

    px = (grid.pT[:, None] * grid.cos_phi[None, :])[None]
    py = (grid.pT[:, None] * grid.sin_phi[None, :])[None]
    mT3 = mT[:, :, None]
    rows = [flat_pad(mT3, 1.0), flat_pad(px, 0.0), flat_pad(py, 0.0),
            flat_pad(mT3 * mT3, 1.0), flat_pad(px * px, 0.0),
            flat_pad(py * py, 0.0), flat_pad(mT3 * px, 0.0),
            flat_pad(mT3 * py, 0.0), flat_pad(px * py, 0.0),
            flat_pad((species.mass ** 2)[:, None, None], 1.0),
            flat_pad(species.baryon[:, None, None], 0.0),
            flat_pad(species.sign[:, None, None], 1.0)]
    rows += [jnp.zeros((S, M_pad), f32)] * (16 - len(rows))
    P = jnp.stack(rows, axis=1)                            # (S, 16, M_pad)

    # pad the species axis to 128 lanes: Mosaic requires lane-dim blocks of
    # 128 (or the full axis), so the kernel fetches a (c_tile, 128) tile
    # and iota-selects its species column
    S_pad = _round_up(S, 128)
    renorm = jnp.pad(jnp.asarray(data["renorm"], f32),
                     ((0, C_pad - C), (0, S_pad - S)))
    red = jnp.pad(jnp.asarray(data["mask"], f32)[:, None]
                  * jnp.asarray(data["renorm_finite"], f32),
                  ((0, C_pad - C), (0, S_pad - S)))

    Ne = grid.eta.shape[0]
    Ne_pad = _round_up(max(Ne, 1), 128)
    eta_pack = jnp.zeros((8, Ne_pad), f32)
    eta_pack = eta_pack.at[0, :Ne].set(grid.eta.astype(f32))
    eta_pack = eta_pack.at[1, :Ne].set(grid.eta_weight.astype(f32))
    # rows 2/3: cosh/sinh of the quadrature points, precomputed because
    # Mosaic has no cosh/sinh lowering in-kernel
    eta_pack = eta_pack.at[2, :Ne].set(jnp.cosh(grid.eta).astype(f32))
    eta_pack = eta_pack.at[3, :Ne].set(jnp.sinh(grid.eta).astype(f32))
    return cols, P, renorm, red, eta_pack, M, Ne


def cooper_frye_feqmod_pallas(cols, P, renorm, red, eta_pack, cfg: Config,
                              kind: str, n_eta: int,
                              c_tile: int = 256, m_tile: int = 512,
                              interpret: bool = False,
                              dot_impl: str = "vpu"):
    """Run the kernel: returns (S, M_pad) f64 spectra (renorm applied,
    prefactor/degeneracy NOT applied)."""
    C = cols.shape[0]
    S, _, M_pad = P.shape
    assert C % c_tile == 0 and M_pad % m_tile == 0
    n_c = C // c_tile
    n_m = M_pad // m_tile

    # trace with x64 off: under jax_enable_x64 the grid/index-map scalar
    # prologue carries i64 values, which Mosaic cannot legalize on TPU
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_kernel, cfg=cfg, kind=kind, n_eta=n_eta,
                    dot_impl=dot_impl),
            out_shape=jax.ShapeDtypeStruct((S, 8, M_pad), jnp.float32),
            grid=(n_m, S, n_c),
            in_specs=[
                pl.BlockSpec((c_tile, 64), lambda i, s, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, m_tile), lambda i, s, j: (s, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_tile, 128), lambda i, s, j: (j, s // 128),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_tile, 128), lambda i, s, j: (j, s // 128),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, eta_pack.shape[1]), lambda i, s, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, m_tile),
                                   lambda i, s, j: (s, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(cols, P, renorm, red, eta_pack)

    return jnp.sum(out.astype(jnp.float64), axis=1)         # (S, M_pad)


def compute_spectra_feqmod_pallas(cells, fq_or_fm, species, grid,
                                  cfg: Config, c_tile: int = 256,
                                  m_tile: int = 512,
                                  interpret: bool = False,
                                  dot_impl: str = "vpu"):
    """Full Pallas feqmod/famod spectra: (S, NpT, Nphi, 1) f64.

    `fq_or_fm` is the f64 prep (prepare_feqmod / prepare_famod), exactly
    as consumed by core/spectra_feqmod_fast.compute_spectra_feqmod_fast."""
    from ..core.spectra import PREFACTOR
    from ..core.spectra_feqmod_fast import (_pack_famod_fast,
                                            _pack_feqmod_fast)

    if cfg.dimension != 2:
        raise ValueError("pallas feqmod kernel implements the 2+1d geometry")
    if cfg.df_mode not in (3, 4, 5):
        raise ValueError("pallas feqmod kernel implements df modes 3/4/5")
    # Mosaic compiles only for TPU; on the CPU backend (tests, dryrun)
    # fall back to interpret mode so use_pallas works everywhere
    interpret = interpret or jax.default_backend() == "cpu"
    kind = "famod" if cfg.df_mode == 5 else "feqmod"
    from ..core.spectra_fast import fold_eta_quadrature
    cells, grid, _ = fold_eta_quadrature(cells, grid, cfg, strict=True)
    S = species.mass.shape[0]
    if kind == "famod":
        data = _pack_famod_fast(cells, fq_or_fm, S)
    else:
        data = _pack_feqmod_fast(cells, fq_or_fm, cfg)

    cols, P, renorm, red, eta_pack, M, Ne = pack_feqmod_pallas(
        data, species, grid, c_tile, m_tile)
    flat = cooper_frye_feqmod_pallas(cols, P, renorm, red, eta_pack, cfg,
                                     kind, Ne, c_tile=c_tile, m_tile=m_tile,
                                     interpret=interpret,
                                     dot_impl=dot_impl)[:, :M]
    NpT = grid.pT.shape[0]
    Nphi = grid.cos_phi.shape[0]
    out = flat.reshape(S, NpT, Nphi, 1)
    return (PREFACTOR * species.degeneracy.astype(out.dtype)[:, None, None,
                                                             None] * out)
