"""Continuous Cooper-Frye momentum spectra dN/(pT dpT dphi dy).

TPU-native replacement for the reference's OpenMP cell loops:
  * df 1/2 (Grad-14 / Chapman-Enskog): MomentumSpectra.cpp:32-415
  * df 3/4 (PTM / PTB feqmod):         MomentumSpectra.cpp:419-1044
  * df 5   (PTMA famod):               MomentumSpectra.cpp:1049-1682

Design: the reference strides cells across cores, each core accumulating a
private spectra slab followed by a reduction (MomentumSpectra.cpp:95-415).
Here the cell axis is blocked and scanned on-device: each block evaluates the
full (cells x species x pT x phi x y x eta) integrand as one fused XLA
elementwise+reduce expression and accumulates into the spectra tensor.  No
host round trips; cell blocks can additionally be sharded across devices
(parallel/sharding.py) with a final psum playing the role of the reference's
core reduction.

All data-dependent per-cell branches of the reference (u.dsigma <= 0 skip,
outflow Theta, feqmod breakdown, |df| <= 1 regulation) are masks/where's.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..constants import hbarC, two_pi2_hbarC3
from ..io.pdg import SpeciesTable
from ..io.tables import GaussLaguerre, MomentumGrids
from ..physics import lrf, thermal
from ..physics.deltaf import DeltafData
from .cells import CellArrays, prepare_cells, evaluate_cell_deltaf

PREFACTOR = (2.0 * jnp.pi * hbarC) ** -3  # CF prefactor (MomentumSpectra.cpp:38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpeciesArrays:
    """Chosen-species properties on device."""

    mass: jnp.ndarray        # (S,)
    sign: jnp.ndarray
    degeneracy: jnp.ndarray
    baryon: jnp.ndarray

    @classmethod
    def from_table(cls, table: SpeciesTable, indices: np.ndarray) -> "SpeciesArrays":
        return cls(
            mass=jnp.asarray(table.mass[indices]),
            sign=jnp.asarray(table.sign[indices]),
            degeneracy=jnp.asarray(table.gspin[indices]),
            baryon=jnp.asarray(table.baryon[indices]),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MomentumGridDevice:
    pT: jnp.ndarray
    pT_weight: jnp.ndarray
    cos_phi: jnp.ndarray
    sin_phi: jnp.ndarray
    phi_weight: jnp.ndarray
    y: jnp.ndarray
    eta: jnp.ndarray
    eta_weight: jnp.ndarray

    @classmethod
    def from_grids(cls, g: MomentumGrids, dimension: int) -> "MomentumGridDevice":
        if dimension == 2:
            y = jnp.zeros(1)
            eta = jnp.asarray(g.eta)
            eta_w = jnp.asarray(g.eta_weight)
        else:
            y = jnp.asarray(g.y)
            eta = jnp.zeros(1)       # replaced by the cell eta inside the kernel
            eta_w = jnp.ones(1)
        return cls(pT=jnp.asarray(g.pT), pT_weight=jnp.asarray(g.pT_weight),
                   cos_phi=jnp.asarray(np.cos(g.phi)),
                   sin_phi=jnp.asarray(np.sin(g.phi)),
                   phi_weight=jnp.asarray(g.phi_weight),
                   y=y, eta=eta, eta_weight=eta_w)


def _pallas_comp_enabled(cfg: Config) -> bool:
    """Resolve the tri-state cfg.use_pallas for the df-1/2 compensated
    kernel: -1 = auto (on when the backend is an accelerator; on CPU the
    kernel runs in interpret mode, far slower than the XLA fast path),
    0 = off, 1 = on everywhere (tests force it on the CPU backend)."""
    if cfg.use_pallas == 0:
        return False
    if cfg.use_pallas == 1 or cfg.use_pallas is True:
        return True
    return jax.default_backend() != "cpu"



def _momentum_tensors(cells_blk, grid: MomentumGridDevice, species: SpeciesArrays,
                      dimension: int, eta_scale=None):
    """Common kinematic tensors for one cell block.

    Axes: c = cell, s = species, p = pT, f = phi, y = rapidity, e = eta.
    Returns pt[c,s,p,y,e], pn[c,s,p,y,e], px[p,f], py[p,f].
    """
    mT = jnp.sqrt(species.mass[:, None] ** 2 + grid.pT[None, :] ** 2)  # (s,p)
    px = grid.pT[:, None] * grid.cos_phi[None, :]                      # (p,f)
    py = grid.pT[:, None] * grid.sin_phi[None, :]

    if dimension == 2:
        # y = 0; eta from the table, optionally rescaled per cell (feqmod)
        eta = grid.eta[None, :]                                        # (1,e)
        if eta_scale is not None:
            eta = eta_scale[:, None] * grid.eta[None, :]               # (c,e)
        delta = -eta[:, None, :]                                       # (c,y=1,e)
    else:
        # eta = cell eta (single point), y from the table
        delta = grid.y[None, :, None] - cells_blk.eta[:, None, None]   # (c,y,e=1)

    sinh_d = jnp.sinh(delta)
    cosh_d = jnp.sqrt(1.0 + sinh_d * sinh_d)

    # pt[c,s,p,y,e] = mT[s,p] cosh(y-eta);  pn = mT/tau sinh(y-eta)
    pt = mT[None, :, :, None, None] * cosh_d[:, None, None, :, :]
    pn = (mT[None, :, :, None, None] / cells_blk.tau[:, None, None, None, None]
          * sinh_d[:, None, None, :, :])
    return pt, pn, px, py


def df12_weighted_value(cells_blk: CellArrays, coeffs_blk, species: SpeciesArrays,
                        grid: MomentumGridDevice, cfg: Config):
    """eta_weight * (p.dsigma) * f on axes (c,s,p,f,y,e) for df modes 1/2
    (the hot loop of MomentumSpectra.cpp:250-377).

    Everything is expressed on broadcast axes (c,s,p,f,y,e); XLA fuses the
    elementwise chain into the caller's reduction so the full 6-d tensor is
    never materialized in HBM.  Shared by the momentum spectra (reduce over
    c,e) and the spacetime distributions (reduce over p,f,y,e).
    """
    c = cells_blk
    pt5, pn5, px2, py2 = _momentum_tensors(c, grid, species, cfg.dimension)

    def C(a):  # cell scalar -> (c,1,1,1,1,1)
        return a[:, None, None, None, None, None]

    def S(a):  # species scalar -> (1,s,1,1,1,1)
        return a[None, :, None, None, None, None]

    def P5(a):  # (c,s,p,y,e) -> (c,s,p,1,y,e)
        return a[:, :, :, None, :, :]

    def F2(a):  # (p,f) -> (1,1,p,f,1,1)
        return a[None, None, :, :, None, None]

    pt = P5(pt5)
    pn = P5(pn5)
    px = F2(px2)
    py = F2(py2)

    tau2 = c.tau * c.tau

    # p.dsigma  (momentum contravariant, dsigma covariant)
    pdd = pt * C(c.dat) + px * C(c.dax) + py * C(c.day) + pn * C(c.dan)

    # u.p (LRF energy)
    E_lrf = pt * C(c.ut) - px * C(c.ux) - py * C(c.uy) - pn * C(tau2 * c.un)

    chem = S(species.baryon) * C(c.alphaB)
    sgn = S(species.sign)
    feq = 1.0 / (jnp.exp(E_lrf / C(c.T) - chem) + sgn)
    feqbar = 1.0 - sgn * feq

    # pi^munu p_mu p_nu  (MomentumSpectra.cpp:323-324)
    pimunu_pp = (C(c.pitt) * pt * pt + C(c.pixx) * px * px + C(c.piyy) * py * py
                 + C(tau2 * tau2 * c.pinn) * pn * pn
                 + 2.0 * (-(C(c.pitx) * px + C(c.pity) * py) * pt
                          + C(c.pixy) * px * py
                          + C(tau2) * pn * (C(c.pixn) * px + C(c.piyn) * py
                                            - C(c.pitn) * pt)))

    # V^mu p_mu
    V_pp = pt * C(c.Vt) - px * C(c.Vx) - py * C(c.Vy) - pn * C(tau2 * c.Vn)

    mass2 = S(species.mass ** 2)
    b_s = S(species.baryon)

    if cfg.df_mode == 1:
        df_shear = C(coeffs_blk["shear"]) * pimunu_pp
        df_bulk = C(coeffs_blk["bulk0"]) * mass2 \
            + (C(coeffs_blk["bulk1"]) * b_s + C(coeffs_blk["bulk2"]) * E_lrf) * E_lrf
        df_diff = (C(coeffs_blk["diff0"]) * b_s + C(coeffs_blk["diff1"]) * E_lrf) * V_pp
    elif cfg.df_mode == 2:
        df_shear = C(coeffs_blk["shear"]) * pimunu_pp / E_lrf
        df_bulk = C(coeffs_blk["bulk0"]) * E_lrf + C(coeffs_blk["bulk1"]) * b_s \
            + C(coeffs_blk["bulk2"]) * (E_lrf - mass2 / E_lrf)
        df_diff = (C(coeffs_blk["diff0"]) - C(coeffs_blk["diff1"]) * b_s / E_lrf) * V_pp
    else:
        raise ValueError("df12 kernel supports df_mode 1/2 only")

    df = feqbar * (df_shear + df_bulk + df_diff)
    if cfg.regulate_deltaf:
        df = jnp.clip(df, -1.0, 1.0)

    f = feq * (1.0 + df)

    if cfg.outflow:
        pdd = jnp.where(pdd > 0.0, pdd, 0.0)

    w_eta = grid.eta_weight[None, None, None, None, None, :]
    return w_eta * pdd * f


def _cell_block_df12(cells_blk: CellArrays, coeffs_blk, species: SpeciesArrays,
                     grid: MomentumGridDevice, cfg: Config):
    """Spectra contribution of one cell block: reduce the weighted integrand
    over cells and eta -> (s,p,f,y)."""
    value = df12_weighted_value(cells_blk, coeffs_blk, species, grid, cfg)
    w_cell = cells_blk.mask[:, None, None, None, None, None]
    contrib = jnp.sum(w_cell * value, axis=(0, 5))
    return PREFACTOR * species.degeneracy[:, None, None, None] * contrib


def _scan_blocks(block_fn, cells: CellArrays, coeffs: dict, n_blocks: int,
                 out_shape: tuple):
    """Scan a per-block contribution function over the padded cell axis."""
    def take_block(a, i, blk):
        return jax.lax.dynamic_slice_in_dim(a, i * blk, blk, axis=0)

    blk = cells.n_padded // n_blocks

    def body(acc, i):
        cells_blk = jax.tree_util.tree_map(lambda a: take_block(a, i, blk), cells)
        coeffs_blk = {k: take_block(v, i, blk) for k, v in coeffs.items()}
        return acc + block_fn(cells_blk, coeffs_blk), None

    acc0 = jnp.zeros(out_shape)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_blocks))
    return acc


def df12_cell_coefficients(cells: CellArrays, df_data: DeltafData,
                           cfg: Config) -> dict:
    """Per-cell shear/bulk/diffusion coefficient columns
    (MomentumSpectra.cpp:213-246).  Runs on the host CPU backend (tiny)."""
    from .cells import _cpu_device
    cpu = _cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            return _df12_cell_coefficients_impl(cells, df_data, cfg)
    return _df12_cell_coefficients_impl(cells, df_data, cfg)


def _df12_cell_coefficients_impl(cells: CellArrays, df_data: DeltafData,
                                 cfg: Config) -> dict:
    df = evaluate_cell_deltaf(cells, df_data, cfg)
    T = cells.T
    bulkPi = cells.bulkPi
    if cfg.df_mode == 1:
        return {
            "shear": 1.0 / df.shear14,
            "bulk0": (df.c0 - df.c2) * bulkPi,
            "bulk1": df.c1 * bulkPi,
            "bulk2": (4.0 * df.c2 - df.c0) * bulkPi,
            "diff0": df.c3,
            "diff1": df.c4,
        }
    if cfg.df_mode == 2:
        return {
            "shear": 0.5 / (df.betapi * T),
            "bulk0": df.F / (T * T * df.betabulk) * bulkPi,
            "bulk1": df.G / df.betabulk * bulkPi,
            "bulk2": bulkPi / (3.0 * T * df.betabulk),
            "diff0": cells.baryon_enthalpy_ratio / df.betaV,
            "diff1": 1.0 / df.betaV,
        }
    raise ValueError("df12_cell_coefficients requires df_mode 1 or 2")


@partial(jax.jit, static_argnames=("cfg", "n_blocks"))
def _spectra_df12_jit(cells: CellArrays, coeffs: dict, species: SpeciesArrays,
                      grid: MomentumGridDevice, cfg: Config, n_blocks: int):
    S = species.mass.shape[0]
    out_shape = (S, grid.pT.shape[0], grid.cos_phi.shape[0], grid.y.shape[0])
    return _scan_blocks(
        lambda cb, kb: _cell_block_df12(cb, kb, species, grid, cfg),
        cells, coeffs, n_blocks, out_shape)


def compute_spectra(surf, species_table: SpeciesTable, chosen_idx: np.ndarray,
                    grids: MomentumGrids, df_data: DeltafData, cfg: Config,
                    laguerre: GaussLaguerre | None = None,
                    cell_block: int | None = None,
                    report=None) -> np.ndarray:
    """Continuous spectra dN/(pT dpT dphi dy), shape (S, NpT, Nphi, Ny).

    Dispatcher over df modes (EmissionFunction.cpp:1198-1226).  ``report``
    (a report.RunReport) collects the breakdown counters the reference
    prints (MomentumSpectra.cpp:1039-1040, 1674-1678).

    With cfg.group_particles, species within particle_diff_tolerance in
    mass (same sign/baryon) share ONE spectra evaluation, rescaled by
    degeneracy (see SpeciesTable.group_species) -- the compute saving the
    reference's grouping machinery gestures at but never implements.
    """
    cfg.validate()
    if cfg.group_particles and len(chosen_idx) > 1:
        rep_pos, group_of = species_table.group_species(
            chosen_idx, cfg.particle_diff_tolerance, bool(cfg.include_baryon))
        if len(rep_pos) < len(chosen_idx):
            sub_cfg = dataclasses.replace(cfg, group_particles=0)
            rep_out = compute_spectra(surf, species_table,
                                      np.asarray(chosen_idx)[rep_pos], grids,
                                      df_data, sub_cfg, laguerre, cell_block,
                                      report)
            deg = species_table.gspin[np.asarray(chosen_idx)]
            scale = deg / deg[rep_pos][group_of]
            return rep_out[group_of] * scale[:, None, None, None]
    block = min(cell_block or cfg.cell_block, 1 << 30)
    if cfg.df_mode == 5:
        # famod reads the shear tensor and bulk pressure unconditionally
        # (pl/pt reconstruction, MomentumSpectra.cpp:1192-1204); the
        # include_* switches only gate the residual piT/WT pieces.
        cells_cfg = dataclasses.replace(cfg, include_shear_deltaf=1,
                                        include_bulk_deltaf=1)
    else:
        cells_cfg = cfg
    cells = prepare_cells(surf, cells_cfg, block=block)
    n_blocks = max(cells.n_padded // min(block, cells.n_padded), 1)
    if report is not None:
        report.n_cells = surf.n_cells
        report.skipped_cells = surf.n_cells - int(np.asarray(cells.mask).sum())

    species = SpeciesArrays.from_table(species_table, chosen_idx)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)

    def cast_f32(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            tree)

    # multi-chip mesh (cfg.use_mesh): cells (+ species) shard over the
    # local devices and reduce with a psum over ICI -- the TPU analog of
    # the reference's always-on OpenMP cell loop (MomentumSpectra.cpp:95).
    from ..parallel.sharding import auto_mesh
    mesh = auto_mesh(cfg)

    if cfg.df_mode in (1, 2):
        coeffs = df12_cell_coefficients(cells, df_data, cfg)
        if (_pallas_comp_enabled(cfg) and cfg.dimension == 2
                and mesh is None and cfg.compute_dtype in ("f32", "f32c")):
            # PRODUCTION DEFAULT on accelerator backends (use_pallas = -1
            # auto): the compensated-argument Pallas kernel carries the
            # <=1e-6 accuracy bar AND measured 0.68x the XLA f32c wall
            # (1.16e11 vs 7.9e10 evals/s, interleaved sweep 2026-08-19,
            # docs/pallas_sweep_comp_2026-08-19.json) -- the hand-written
            # backend is the flagship, like the reference's CUDA kernels
            # (emissionfunction.cu:152-451).  (256, 512) tiles: c_tile=512
            # with m_tile>=512 exceeds VMEM (the TwoSum chain temporaries).
            from ..ops.spectra_fast_common import compute_spectra_pallas
            out = compute_spectra_pallas(cells, coeffs, species, grid, cfg,
                                         c_tile=256, m_tile=512,
                                         dot_impl="comp")
        elif cfg.compute_dtype == "f32c" and cfg.dimension == 2:
            # compensated XLA fast path: <=1e-6 (the BASELINE accuracy
            # bar) at 0.99-1.0x the plain-f32 wall; the meshed and
            # CPU-backend carrier of the accuracy+speed combination
            from .spectra_fast import compute_spectra_fast
            if mesh is not None:
                from ..parallel.sharding import sharded_spectra_fast
                out = sharded_spectra_fast(cells, coeffs, species, grid,
                                           cfg, mesh, block=block,
                                           compute_dtype="f32c")
            else:
                S_count = len(chosen_idx)
                n_sp_blocks = next(b for b in (8, 4, 2, 1)
                                   if S_count % b == 0)
                out = compute_spectra_fast(cells, coeffs, species, grid,
                                           cfg, n_blocks=n_blocks,
                                           compute_dtype="f32c",
                                           n_species_blocks=n_sp_blocks)
        elif cfg.use_pallas == 1 and cfg.dimension == 2:
            # fused Pallas kernel (f32 compute, f64 accumulation)
            from ..ops.spectra_fast_common import compute_spectra_pallas
            out = compute_spectra_pallas(cells, coeffs, species, grid, cfg)
        elif mesh is not None and cfg.compute_dtype == "f32" \
                and cfg.dimension == 2:
            # block == the single-device cell block so the f32 per-block
            # partial sums are bitwise the single-device ones (the psum
            # then only reorders the f64 accumulation)
            from ..parallel.sharding import sharded_spectra_fast
            out = sharded_spectra_fast(cells, coeffs, species, grid, cfg,
                                       mesh, block=block)
        elif mesh is not None and cfg.compute_dtype in ("f32", "f32c"):
            from ..parallel.sharding import sharded_spectra_fast_3d
            out = sharded_spectra_fast_3d(cells, coeffs, species, grid, cfg,
                                          mesh, block=block)
        elif mesh is not None and cfg.compute_dtype == "f64":
            from ..parallel.sharding import sharded_spectra
            out = sharded_spectra(cells, coeffs, species, grid, cfg, mesh,
                                  block=block)
        elif cfg.compute_dtype in ("f32", "f32c"):
            # MXU-structured fast path (f32 compute, f64 accumulation);
            # f32c in 3+1d routes the light-cone compensated kernel
            # (<=1e-6; 2+1d f32c was handled above)
            from .spectra_fast import compute_spectra_fast
            import jax.numpy as _jnp
            S_count = len(chosen_idx)
            n_sp_blocks = next(b for b in (8, 4, 2, 1) if S_count % b == 0)
            dt = ("f32c" if cfg.compute_dtype == "f32c"
                  and cfg.dimension == 3 else _jnp.float32)
            out = compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                       n_blocks=n_blocks,
                                       compute_dtype=dt,
                                       n_species_blocks=n_sp_blocks)
        else:
            out = _spectra_df12_jit(cells, coeffs, species, grid, cfg, n_blocks)
    elif cfg.df_mode in (3, 4):
        from .feqmod import prepare_feqmod
        from .spectra_feqmod import _spectra_feqmod_jit
        fq = prepare_feqmod(cells, species, df_data, cfg, laguerre)
        if report is not None:
            report.record_breakdown(fq.breaks_down, cells.tau, cells.mask)
        if cfg.use_pallas == 1 and cfg.dimension == 2:
            # fused Pallas kernel (f32 compute, f64 accumulation)
            from ..ops.cooper_frye_feqmod_pallas import (
                compute_spectra_feqmod_pallas)
            out = compute_spectra_feqmod_pallas(cells, fq, species, grid, cfg)
        elif mesh is not None and cfg.compute_dtype in ("f32", "f32c") \
                and cfg.dimension == 2:
            from ..parallel.sharding import sharded_spectra_feqmod_fast
            out = sharded_spectra_feqmod_fast(cells, fq, species, grid, cfg,
                                              mesh, block=block)
        elif cfg.compute_dtype in ("f32", "f32c"):
            # quadratic-form FMA kernel (f32 compute, f64 accumulation)
            from .spectra_feqmod_fast import compute_spectra_feqmod_fast
            out = compute_spectra_feqmod_fast(cells, fq, species, grid, cfg,
                                              n_cell_blocks=n_blocks)
        elif mesh is not None:
            from ..parallel.sharding import sharded_spectra_mod_f64
            out = sharded_spectra_mod_f64(cells, fq, species, grid, cfg,
                                          mesh, block=block)
        else:
            out = _spectra_feqmod_jit(cells, fq, species, grid, cfg, n_blocks)
    elif cfg.df_mode == 5:
        from .spectra_famod import prepare_famod, _spectra_famod_jit, vah_from_surface
        vah = vah_from_surface(surf, cells.n_padded)
        fm = prepare_famod(cells, species_table, cfg, vah)
        if report is not None:
            report.record_breakdown(fm.breaks_down, cells.tau, cells.mask,
                                    pl_negative=fm.pl_negative,
                                    recon_failed=fm.recon_failed)
        if cfg.use_pallas == 1 and cfg.dimension == 2:
            from ..ops.cooper_frye_feqmod_pallas import (
                compute_spectra_feqmod_pallas)
            out = compute_spectra_feqmod_pallas(cells, fm, species, grid, cfg)
        elif mesh is not None and cfg.compute_dtype in ("f32", "f32c") \
                and cfg.dimension == 2:
            from ..parallel.sharding import sharded_spectra_feqmod_fast
            out = sharded_spectra_feqmod_fast(cells, fm, species, grid, cfg,
                                              mesh, block=block)
        elif cfg.compute_dtype in ("f32", "f32c"):
            from .spectra_feqmod_fast import compute_spectra_feqmod_fast
            out = compute_spectra_feqmod_fast(cells, fm, species, grid, cfg,
                                              n_cell_blocks=n_blocks)
        elif mesh is not None:
            from ..parallel.sharding import sharded_spectra_mod_f64
            out = sharded_spectra_mod_f64(cells, fm, species, grid, cfg,
                                          mesh, block=block)
        else:
            out = _spectra_famod_jit(cells, fm, species, grid, cfg, n_blocks)
    else:
        raise ValueError("df_mode must be 1..5")
    return np.asarray(out)
