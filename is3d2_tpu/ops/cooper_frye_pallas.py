"""Pallas TPU kernel for the fused Cooper-Frye reduction (df 1/2, 2+1d).

Replaces the CUDA thread/block tree-reduction kernels of the reference
(emissionfunction.cu:152-451, 1686-1719) with a single fused kernel:

  grid = (m tiles, cell tiles); each program holds a (C_t, 16) per-cell
  coefficient tile and an (8, M_t) momentum tile in VMEM, loops the eta
  quadrature, forms the contractions

      E   = Q_E  . P16     (u.p)
      pdd = Q_d  . P16     (p.dsigma, cell mask folded in)
      pim = Q_pi . P16     (pi^munu p_mu p_nu; P16 rows 4..13 are quadratics)
      Vp  = Q_V  . P16     (V.p)

  on the MXU, runs the delta-f chain on the VPU entirely in registers/VMEM,
  and reduces over the cell tile with a ones-row matmul.  Each (m, cell)
  program writes its own partial slab; the host sums the small (n_cell_tiles,
  M) output in f64, so precision matches the XLA fast path (f32 compute, f64
  accumulation).

P16 row layout: [m1, px, py, m4, m1m1, pxpx, pypy, m4m4, m1px, m1py, m1m4,
pxpy, pxm4, pym4, 0, 0] with m1 = mT cosh(y-eta), m4 = mT sinh(y-eta).

Hardware-validated on real TPU v5e (tests/test_pallas_tpu.py): 3.5e10
evals/s at the production bench shape vs 3.9e10 for the XLA fast path
(exact-f32 MXU passes cost 6x; XLA wins by fusing the contractions as VPU
FMA chains).  A tile sweep on silicon (interleaved-XLA A/B to normalize
the 2.5-35x device-window drift) found (c_tile, m_tile) = (512, 1024) the
best config -- 3-13% slower than XLA across windows, vs a consistent
~13% for the former (256, 512); (1024, 1024) and (512, 2048) exceed VMEM
(Mosaic compile failure).  `use_pallas = 1` routes production spectra
here.

Negative results (measured, do not retry):
- Replacing the HIGHEST MXU dots with explicit VPU contractions inside
  the kernel -- either a serial K=14 FMA chain (the XLA fast path's
  trick) or a balanced add tree -- measured 2.4e10 / 2.2e10 evals/s on
  silicon: Mosaic materializes every (C_t,1)x(1,M_t) broadcast product as
  a full VMEM tile instead of fusing the chain in registers, so the
  kernel becomes VMEM-bandwidth-bound.
- Precision.HIGH (the 3-pass bf16 dot, half the cost of HIGHEST's 6) is
  not legalizable by Mosaic at all: "Unsupported dot precision: HIGH".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from .spectra_fast_common import pack_inputs  # noqa: F401  (re-export helper)


def _bf16_round(x):
    """Round f32 -> bf16 -> f32 (what a DEFAULT-precision MXU pass does to
    its inputs), used to build exact-split operands."""
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _dot3(A_h, A_l, B_h, B_l):
    """Ozaki-style 3-pass f32 dot from DEFAULT (1-pass bf16) MXU dots.

    A = A_h + A_l with A_h = bf16(A) (so A_h*B_h is computed exactly by a
    DEFAULT pass), |A_l| <= 2^-9 |A|.  The dropped A_l*B_l term and the
    bf16 rounding of the correction passes are both O(2^-18 |A||B|) --
    half the passes of Precision.HIGHEST (which Mosaic CAN lower, unlike
    HIGH) at ~30x the DEFAULT error.  Used for the LINEAR contractions
    (p.dsigma, pi pp, V.p) where 4e-6-class relative error stays ~4e-6 in
    the spectra; the exp argument (u.p) keeps HIGHEST, as the exp
    amplifies absolute error in its argument.
    """
    f32 = jnp.float32
    return (jnp.dot(A_h, B_h, preferred_element_type=f32)
            + jnp.dot(A_h, B_l, preferred_element_type=f32)
            + jnp.dot(A_l, B_h, preferred_element_type=f32))


def _kernel(q_ref, cols_ref, mom_ref, eta_ref, out_ref, *, cfg: Config,
            n_eta: int, precision=jax.lax.Precision.HIGHEST,
            dot_impl: str = "highest"):
    """q_ref: (C_t, 64) stacked [Q_E(16) | Q_d(16) | Q_pi(16) | Q_V(16)]
    cols_ref: (C_t, 16) per-cell scalars
      [invT, alphaB, shear, bulk0, bulk1, bulk2, diff0, diff1, mask, ...]
    mom_ref: (8, M_t) [mT, px, py, mass2, baryon, sign, 0, 0]
    eta_ref: (8, n_eta_pad) [cosh, sinh, weight, ...]
    out_ref: (8, M_t) accumulator; cell-tile i_c accumulates into row i_c % 8
      (the same out block is revisited for consecutive cell tiles; the host
      sums the 8 rows in f64, preserving short f32 accumulation chains)
    """
    C_t = cols_ref.shape[0]
    M_t = mom_ref.shape[1]
    f32 = jnp.float32

    mT = mom_ref[0:1, :]
    px = mom_ref[1:2, :]
    py = mom_ref[2:3, :]
    mass2 = mom_ref[3:4, :]
    b_m = mom_ref[4:5, :]
    sgn = mom_ref[5:6, :]

    invT = cols_ref[:, 0:1]
    alphaB = cols_ref[:, 1:2]
    shear_c = cols_ref[:, 2:3]
    bulk0 = cols_ref[:, 3:4]
    bulk1 = cols_ref[:, 4:5]
    bulk2 = cols_ref[:, 5:6]
    diff0 = cols_ref[:, 6:7]
    diff1 = cols_ref[:, 7:8]
    # col 8 (all-ones) reserved; mask folded into Q_d

    Q_E = q_ref[:, 0:16]
    Q_d = q_ref[:, 16:32]
    Q_pi = q_ref[:, 32:48]
    Q_V = q_ref[:, 48:64]

    split = dot_impl == "split"
    if split:
        # per-program (eta-invariant) operand splits for the linear dots
        Q_d_h = _bf16_round(Q_d)
        Q_d_l = Q_d - Q_d_h
        Q_pi_h = _bf16_round(Q_pi)
        Q_pi_l = Q_pi - Q_pi_h
        Q_V_h = _bf16_round(Q_V)
        Q_V_l = Q_V - Q_V_h

    zeros_row = jnp.zeros((1, M_t), f32)

    def eta_body(e, acc):
        cosh_e = eta_ref[0, e]
        sinh_e = eta_ref[1, e]
        w_e = eta_ref[2, e]

        m1 = mT * cosh_e
        m4 = mT * sinh_e
        P16 = jnp.concatenate([
            m1, px, py, m4,
            m1 * m1, px * px, py * py, m4 * m4,
            m1 * px, m1 * py, m1 * m4, px * py, px * m4, py * m4,
            zeros_row, zeros_row,
        ], axis=0)                                        # (16, M_t)

        E = jnp.dot(Q_E, P16, preferred_element_type=f32,
                    precision=precision)   # (C_t, M_t)
        if split:
            P16_h = _bf16_round(P16)
            P16_l = P16 - P16_h
            pdd = _dot3(Q_d_h, Q_d_l, P16_h, P16_l)
            if cfg.include_shear_deltaf:
                pim = _dot3(Q_pi_h, Q_pi_l, P16_h, P16_l)
            else:
                pim = 0.0
            if cfg.include_baryon and cfg.include_baryondiff_deltaf:
                Vp = _dot3(Q_V_h, Q_V_l, P16_h, P16_l)
            else:
                Vp = 0.0
        else:
            pdd = jnp.dot(Q_d, P16, preferred_element_type=f32,
                          precision=precision)
            if cfg.include_shear_deltaf:
                pim = jnp.dot(Q_pi, P16, preferred_element_type=f32,
                              precision=precision)
            else:
                pim = 0.0
            if cfg.include_baryon and cfg.include_baryondiff_deltaf:
                Vp = jnp.dot(Q_V, P16, preferred_element_type=f32,
                             precision=precision)
            else:
                Vp = 0.0

        a = E * invT - alphaB * b_m
        feq = 1.0 / (jnp.exp(a) + sgn)
        feqbar = 1.0 - sgn * feq

        if cfg.df_mode == 1:
            df = shear_c * pim + bulk0 * mass2 + (bulk1 * b_m + bulk2 * E) * E
            if cfg.include_baryon and cfg.include_baryondiff_deltaf:
                df = df + (diff0 * b_m + diff1 * E) * Vp
        else:
            df = (shear_c * pim / E + bulk0 * E + bulk1 * b_m
                  + bulk2 * (E - mass2 / E))
            if cfg.include_baryon and cfg.include_baryondiff_deltaf:
                df = df + (diff0 - diff1 * b_m / E) * Vp
        df = feqbar * df
        if cfg.regulate_deltaf:
            df = jnp.clip(df, -1.0, 1.0)
        if cfg.outflow:
            pdd = jnp.where(pdd > 0.0, pdd, 0.0)

        value = pdd * (feq * (1.0 + df))                   # (C_t, M_t)
        # cell reduction on the MXU; the u.dsigma/padding mask is already
        # folded into Q_d (pdd = 0 on dead cells), so a constant ones row
        # suffices (a reshape of the mask column would be a lane<->sublane
        # transpose, which Mosaic does not support)
        ones_row = jnp.ones((1, C_t), f32)
        if split:
            # ones are bf16-exact, so splitting VALUE alone gives a 2-pass
            # exact-split reduction (error 2^-9 of the bf16 RESIDUAL,
            # ~2^-18 relative per element)
            v_h = _bf16_round(value)
            partial = (jnp.dot(ones_row, v_h, preferred_element_type=f32)
                       + jnp.dot(ones_row, value - v_h,
                                 preferred_element_type=f32))  # (1, M_t)
        else:
            partial = jnp.dot(ones_row, value,
                              preferred_element_type=f32,
                              precision=jax.lax.Precision.HIGHEST)  # (1, M_t)
        return acc + w_e * partial

    # i32 bounds: Python-int bounds trace an i64 loop counter under
    # jax_enable_x64, which Mosaic cannot legalize on TPU
    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_eta), eta_body,
                            jnp.zeros((1, M_t), f32))

    i_c = pl.program_id(1)
    row = jax.lax.rem(i_c, jnp.int32(8))

    @pl.when(i_c == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    # masked full-block add: Mosaic cannot prove alignment of a dynamic
    # sublane slice, so select the target row with an iota comparison instead
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, M_t), 0)
    sel = (row_ids == row).astype(f32)
    out_ref[...] = out_ref[...] + sel * acc


def _two_sum(x, y):
    """Branchless Knuth TwoSum: s + err == x + y exactly (6 VPU flops).
    Same construction as core/spectra_fast._two_sum, usable inside Mosaic."""
    s = x + y
    b = s - x
    return s, (x - (s - b)) + (y - b)


def _kernel_comp(q_ref, cols_ref, qm1_ref, qm2_ref, mom_ref, eta_ref,
                 out_ref, err_ref, *, cfg: Config, n_eta: int):
    """Compensated-argument variant: the <=1e-6 accuracy bar inside VMEM.

    The ~4e-6 error class of the split/HIGHEST kernels is the f32 rounding
    of the exp ARGUMENT a = u.p/T - alphaB b (ulp(a) ~ 2^-24 |a| with |a|
    up to ~40 -> the same relative error on exp).  This kernel ports the
    f32c XLA path's split-exact argument (core/spectra_fast._cell_Q_comp /
    _block_fast_comp) into the Pallas program:

      * the eta hyperbolics fold into per-(cell, eta) 12-bit-split
        coefficients qm1/qm2 prepared in f64 on the host, so every main
        product (qm1*mT1, qx1*px1, qy1*py1, abf*b) is EXACT in f32;
      * the main terms sum through branchless TwoSum chains (eta-invariant
        prefix hoisted out of the eta loop), low/cross corrections
        accumulate separately, and exp(a) = exp(A)*(1+r);
      * u.p therefore needs NO MXU dot at all (the HIGHEST 6-pass dot of
        the other variants is replaced by ~20 VPU ops/eta);
      * p.dsigma and V.p are K=4 LINEAR contractions -> plain f32 VPU FMA
        chains (~1e-7 relative, same class as the XLA f32c path);
      * pi^munu p_mu p_nu keeps a HIGHEST (6-pass) MXU dot: its error is
        ~f32-chain class and it is the only remaining P16 consumer;
      * accumulation: TwoSum-compensated eta accumulator row, 2-pass
        exact-bf16-split cell reduction, and a TwoSum-compensated
        cross-cell-tile slab with the residuals streamed to err_ref --
        the host sums both slabs in f64.

    The eta loop is UNROLLED (n_eta is static, 12 folded / 24 unfolded):
    qm1/qm2 live as (C_t, Ne_lane) VMEM blocks read with STATIC lane
    slices, which Mosaic supports (a dynamic fori_loop index would need a
    dynamic sublane/lane read it cannot prove aligned).

    q_ref: (C_t, 64) as _kernel; cols_ref: (C_t, 16) with the comp columns
      [.., 9: qx1, 10: qx2, 11: qy1, 12: qy2, 13: abf, 14: abl, 15: Tf]
    qm1_ref/qm2_ref: (C_t, Ne_lane) 12-bit-split E-coefficients of mT
    mom_ref: (16, M_t) [mT1, mT2, mTf, px1, px2, pxf, py1, py2, pyf,
      mass2, baryon, sign, 0...]
    eta_ref: (8, Ne_pad) SMEM [cosh, -sinh, weight]
    out_ref/err_ref: (8, M_t) value/TwoSum-residual slabs (row i_c % 8)
    """
    C_t = cols_ref.shape[0]
    M_t = mom_ref.shape[1]
    f32 = jnp.float32

    mT1 = mom_ref[0:1, :]
    mT2 = mom_ref[1:2, :]
    mTf = mom_ref[2:3, :]
    px1 = mom_ref[3:4, :]
    px2 = mom_ref[4:5, :]
    pxf = mom_ref[5:6, :]
    py1 = mom_ref[6:7, :]
    py2 = mom_ref[7:8, :]
    pyf = mom_ref[8:9, :]
    mass2 = mom_ref[9:10, :]
    b_m = mom_ref[10:11, :]
    sgn = mom_ref[11:12, :]

    shear_c = cols_ref[:, 2:3]
    bulk0 = cols_ref[:, 3:4]
    bulk1 = cols_ref[:, 4:5]
    bulk2 = cols_ref[:, 5:6]
    diff0 = cols_ref[:, 6:7]
    diff1 = cols_ref[:, 7:8]
    qx1 = cols_ref[:, 9:10]
    qx2 = cols_ref[:, 10:11]
    qy1 = cols_ref[:, 11:12]
    qy2 = cols_ref[:, 12:13]
    abf = cols_ref[:, 13:14]
    abl = cols_ref[:, 14:15]
    Tf = cols_ref[:, 15:16]

    Q_pi = q_ref[:, 32:48]
    qd0 = q_ref[:, 16:17]
    qd1 = q_ref[:, 17:18]
    qd2 = q_ref[:, 18:19]
    qd3 = q_ref[:, 19:20]
    qv0 = q_ref[:, 48:49]
    qv1 = q_ref[:, 49:50]
    qv2 = q_ref[:, 50:51]
    qv3 = q_ref[:, 51:52]

    diffusion = bool(cfg.include_baryon and cfg.include_baryondiff_deltaf)

    # eta-invariant argument pieces: t2/t3/t4 are exact 12-bit products,
    # their TwoSum prefix and the low/cross corrections hoist out of the
    # eta loop entirely
    t2 = qx1 * px1
    t3 = qy1 * py1
    t4 = -(abf * b_m)                      # b in {-1,0,1}: exact
    s_a, e_a = _two_sum(t2, t3)
    s_b, e_b = _two_sum(s_a, t4)
    err0 = e_a + e_b
    d0 = (qx1 * px2 + qx2 * pxf + qy1 * py2 + qy2 * pyf - abl * b_m)

    zeros_row = jnp.zeros((1, M_t), f32)
    ones_row = jnp.ones((1, C_t), f32)

    acc = jnp.zeros((1, M_t), f32)
    acc_e = jnp.zeros((1, M_t), f32)

    for e in range(n_eta):                 # static unroll (see docstring)
        cosh_e = eta_ref[0, e]
        sinh_e = eta_ref[1, e]
        w_e = eta_ref[2, e]
        qm1 = qm1_ref[:, e:e + 1]
        qm2 = qm2_ref[:, e:e + 1]

        # ---- compensated argument a = u.p/T - alphaB b ----
        t1 = qm1 * mT1                     # exact 12-bit product
        d = qm1 * mT2 + qm2 * mTf + d0
        s, e1 = _two_sum(t1, s_b)
        A, r = _two_sum(s, d + (err0 + e1))
        eA = jnp.exp(A)
        feq = 1.0 / (eA * (1.0 + r) + sgn)
        feqbar = 1.0 - sgn * feq
        # E in GeV for the linear delta-f pieces (plain f32 suffices)
        E = (A - t4) * Tf

        # ---- plain f32 linear pieces ----
        m1 = mTf * cosh_e
        m4 = mTf * sinh_e
        pdd = qd0 * m1 + qd1 * pxf + qd2 * pyf + qd3 * m4
        if cfg.include_shear_deltaf:
            P16 = jnp.concatenate([
                m1, pxf, pyf, m4,
                m1 * m1, pxf * pxf, pyf * pyf, m4 * m4,
                m1 * pxf, m1 * pyf, m1 * m4, pxf * pyf, pxf * m4, pyf * m4,
                zeros_row, zeros_row,
            ], axis=0)                     # (16, M_t)
            pim = jnp.dot(Q_pi, P16, preferred_element_type=f32,
                          precision=jax.lax.Precision.HIGHEST)
        else:
            pim = 0.0
        if diffusion:
            Vp = qv0 * m1 + qv1 * pxf + qv2 * pyf + qv3 * m4
        else:
            Vp = 0.0

        if cfg.df_mode == 1:
            df = shear_c * pim + bulk0 * mass2 + (bulk1 * b_m + bulk2 * E) * E
            if diffusion:
                df = df + (diff0 * b_m + diff1 * E) * Vp
        else:
            df = (shear_c * pim / E + bulk0 * E + bulk1 * b_m
                  + bulk2 * (E - mass2 / E))
            if diffusion:
                df = df + (diff0 - diff1 * b_m / E) * Vp
        df = feqbar * df
        if cfg.regulate_deltaf:
            df = jnp.clip(df, -1.0, 1.0)
        if cfg.outflow:
            pdd = jnp.where(pdd > 0.0, pdd, 0.0)

        value = pdd * (feq * (1.0 + df))   # (C_t, M_t)
        # 2-pass exact-bf16-split cell reduction (see _kernel split notes)
        v_h = _bf16_round(value)
        partial = (jnp.dot(ones_row, v_h, preferred_element_type=f32)
                   + jnp.dot(ones_row, value - v_h,
                             preferred_element_type=f32))   # (1, M_t)
        acc, ee = _two_sum(acc, w_e * partial)
        acc_e = acc_e + ee

    i_c = pl.program_id(1)
    row = jax.lax.rem(i_c, jnp.int32(8))

    @pl.when(i_c == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)
        err_ref[...] = jnp.zeros_like(err_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, M_t), 0)
    sel = (row_ids == row).astype(f32)
    # TwoSum-compensated cross-tile slab add: the per-program f32 value
    # lands exactly as (slab + residual); the host sums both in f64, so
    # deep cell-tile chains (1e5+ cells / 8 rows) never accumulate f32
    # rounding
    add = sel * (acc + acc_e)
    old = out_ref[...]
    s_out, e_out = _two_sum(old, add)
    out_ref[...] = s_out
    err_ref[...] = err_ref[...] + e_out


def cooper_frye_pallas_comp(q, cols, qm1, qm2, mom, eta_pack, cfg: Config,
                            c_tile: int = 512, m_tile: int = 512,
                            n_eta: int | None = None,
                            interpret: bool = False):
    """Run the compensated-argument kernel (see _kernel_comp).

    q: (C, 64), cols: (C, 16), qm1/qm2: (C, Ne_lane), mom: (16, M),
    eta_pack: (8, Ne_pad); returns (M,) f64 spectra partials.
    """
    C = q.shape[0]
    M = mom.shape[1]
    assert C % c_tile == 0 and M % m_tile == 0
    n_c = C // c_tile
    n_m = M // m_tile
    if n_eta is None:
        n_eta = int(eta_pack.shape[1])
    ne_lane = qm1.shape[1]

    with jax.enable_x64(False):
      out, err = pl.pallas_call(
        partial(_kernel_comp, cfg=cfg, n_eta=n_eta),
        out_shape=(jax.ShapeDtypeStruct((8, M), jnp.float32),
                   jax.ShapeDtypeStruct((8, M), jnp.float32)),
        grid=(n_m, n_c),
        in_specs=[
            pl.BlockSpec((c_tile, 64), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, 16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, ne_lane), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, ne_lane), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, m_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, eta_pack.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((8, m_tile), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, m_tile), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
      )(q, cols, qm1, qm2, mom, eta_pack)

    return (jnp.sum(out.astype(jnp.float64), axis=0)
            + jnp.sum(err.astype(jnp.float64), axis=0))


def cooper_frye_pallas(q, cols, mom, eta_pack, cfg: Config,
                       c_tile: int = 512, m_tile: int = 1024,
                       n_eta: int | None = None,
                       interpret: bool = False,
                       precision=jax.lax.Precision.HIGHEST,
                       dot_impl: str = "highest"):
    """Run the fused kernel.

    q: (C, 64), cols: (C, 16), mom: (8, M), eta_pack: (8, n_eta_pad)
    (all f32; C % c_tile == 0, M % m_tile == 0).
    Returns (M,) f64 spectra partials summed over all cells.

    dot_impl="split" replaces the HIGHEST (6-pass) MXU dots of the LINEAR
    contractions and the cell reduction with hand-rolled 2/3-pass
    exact-bf16-split dots (see _dot3); u.p keeps ``precision``.
    """
    C = q.shape[0]
    M = mom.shape[1]
    assert C % c_tile == 0 and M % m_tile == 0
    n_c = C // c_tile
    n_m = M // m_tile
    if n_eta is None:
        n_eta = int(eta_pack.shape[1])

    # trace with x64 off: under jax_enable_x64 the grid/index-map scalar
    # prologue carries i64 values, which Mosaic cannot legalize on TPU
    # (everything in the kernel is f32/i32 regardless)
    with jax.enable_x64(False):
      out = pl.pallas_call(
        partial(_kernel, cfg=cfg, n_eta=n_eta, precision=precision,
                dot_impl=dot_impl),
        out_shape=jax.ShapeDtypeStruct((8, M), jnp.float32),
        grid=(n_m, n_c),
        in_specs=[
            pl.BlockSpec((c_tile, 64), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, 16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            # scalar eta tables live in SMEM: the kernel reads them with a
            # dynamic loop index, which VMEM lane indexing cannot do
            pl.BlockSpec((8, eta_pack.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, m_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
      )(q, cols, mom, eta_pack)

    return jnp.sum(out.astype(jnp.float64), axis=0)
