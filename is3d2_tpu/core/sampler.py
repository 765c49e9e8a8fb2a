"""Monte-Carlo particle sampler (operation 2), df modes 1-4.

TPU-native replacement for the reference's serial sampler
(ParticleSampler.cpp:25-1134).  The reference nests
cell -> event -> Poisson hadrons -> per-hadron rejection loops; throughput
comes from forking whole processes (scripts/run_multithread_sampling_iS3D.py).
Here everything is one vectorized jax.random program per event chunk:

  1. Per-(cell, species) mean yields dn[c,s] (fast mode: cached densities at
     the surface-averaged (T, muB); exact mode: thermal integrals per cell),
     reduced once per campaign to per-cell totals + a per-cell species CDF
     (MXU triangular-matmul prefix sum, `_species_cdf`).
  2. Hadron counts: one Poisson draw per CELL with rate
     Nevents * 2 y_max * ds_max * dn_tot, run-length decoded onto a flat
     fixed-capacity hadron axis (one scatter-add + cumsum); species per
     hadron by two-stage inverse-CDF bisection (coarse 1/16 table, then the
     16-entry window).  By Poisson splitting this is statistically
     identical to the reference's event-by-event Poisson(dn_tot) +
     categorical species pick, with events assigned uniformly per hadron.
  3. Packed FIELD-MAJOR gathers of the per-cell / per-species columns at
     hadron width.
  4. Momentum sampling: the reference's Scott-Pratt light/heavy rejection
     draws (ParticleSampler.cpp:243-405) as an adaptive all-lanes
     while_loop with scatter-compacted straggler phase.
  5. Viscous + flux weights, keep/reject; then `_finalize_device` compacts
     to the kept rows and does the LRF -> lab boost + 2+1d rapidity draw at
     kept width (ParticleSampler.cpp:947-1104).

Campaigns larger than sampler_chunk_hadrons run as event chunks: chunk 0
synced, the rest dispatched back-to-back with deferred validation, streamed
either to device-side histogram binning (BinSampledParticle.cpp analog) or
to host numpy for particle-list export (transfers overlap compute).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..constants import two_pi, two_pi2_hbarC3
from ..io.pdg import SpeciesTable
from ..io.tables import GaussLaguerre
from ..physics import lrf, thermal
from ..physics.deltaf import DeltafData
from .cells import CellArrays, prepare_cells
from ..utils import host_prep
from .feqmod import prepare_feqmod, FeqmodCellData
from .spectra import SpeciesArrays

# kept-row compaction pads are STATIC shapes, bucketed so one compiled
# finalize program covers chunks whose kept counts differ only
# statistically (module-level so tests can shrink the bucket to exercise
# the pad-overrun heal path at test scale).  The large bucket is 128k, not
# 1M: the analytic pad is ONE value for the whole campaign (bucketing only
# matters for the rare heal-raise recompile) and chunk-to-chunk kept
# variation on the measured path is ~sqrt(kept) ~ a few k, so a fine
# bucket still compiles one program -- while a 1M bucket rounded a 2.5M
# pad up to 3M, inflating the device->host transfer (the exposed cost of
# the production particle-list stage) by ~20% in pure pad tail.
_PAD_BUCKET_SMALL = 8192
_PAD_BUCKET_LARGE = 1 << 17
# pad margin over the expected kept count: covers the yield estimator's
# bias bound (~5%, test_total_yield_matches_sampled) and chunk-0 sampling
# noise on the measured path; 6 sigma is added separately.  Every padded
# row is transferred and thrown away, so this is sized tight -- an overrun
# self-heals through deferred validation (a synced rerun).
_PAD_MARGIN = 1.15


# ----------------------------------------------------------------------
# mean particle numbers
# ----------------------------------------------------------------------

def pion_thermal_weight_max(x):
    """Rational fit of the max pion thermal weight (ParticleSampler.cpp:41-70)."""
    x2 = x * x
    x3 = x2 * x
    x4 = x3 * x
    num = (143206.88623164667 - 95956.76008684626 * x - 21341.937407169076 * x2
           + 14388.446116867359 * x3 - 6083.775788504437 * x4)
    den = (-0.3541350577684533 + 143218.69233952634 * x - 24516.803600065778 * x2
           - 115811.59391199696 * x3 + 35814.36403387459 * x4)
    return 1.00001 * num / den


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplerSetup:
    """Everything the hadron pipeline gathers per cell / per species."""

    cells: CellArrays
    fq: FeqmodCellData | None       # feqmod data (df 3/4)
    rates: jnp.ndarray              # (c, S) mean counts per unit volume
    # LRF surface element
    dst: jnp.ndarray
    dsx: jnp.ndarray
    dsy: jnp.ndarray
    dsz: jnp.ndarray
    ds_max: jnp.ndarray
    # LRF shear / diffusion
    pixx: jnp.ndarray
    pixy: jnp.ndarray
    pixz: jnp.ndarray
    piyy: jnp.ndarray
    piyz: jnp.ndarray
    pizz: jnp.ndarray
    Vx: jnp.ndarray
    Vy: jnp.ndarray
    Vz: jnp.ndarray
    # df columns for w_visc
    df_cols: dict
    # feqmod transforms
    shear_mod: jnp.ndarray
    isotropic_scale: jnp.ndarray
    diff_mod: jnp.ndarray
    T_mod: jnp.ndarray
    alphaB_mod: jnp.ndarray
    breaks_down: jnp.ndarray


def _fast_rates(cells, species_table, chosen_idx, fq, cfg):
    """dn[c,s] in fast mode (fast_max_particle_number,
    ParticleSampler.cpp:122-161)."""
    neq = jnp.asarray(species_table.equilibrium_density[chosen_idx])[None, :]
    dnb = jnp.asarray(species_table.bulk_density[chosen_idx])[None, :]
    if cfg.df_mode in (1, 2):
        return jnp.broadcast_to(2.0 * neq, (cells.n_padded, neq.shape[1]))
    bulkPi = (fq.bulkPi if fq is not None else cells.bulkPi)[:, None]
    breaks = fq.breaks_down[:, None]
    if cfg.df_mode == 3:
        return jnp.where(breaks, 2.0 * neq, neq + bulkPi * dnb)
    if cfg.df_mode == 4:
        return jnp.where(breaks, 2.0 * neq, fq.z[:, None] * neq)
    raise ValueError("fast rates support df_mode 1-4")


def _exact_rates(cells, species: SpeciesArrays, breaks_down, bulkPi, z,
                 G, F, betabulk, cfg, r1, w1, r2, w2):
    """dn[c,s] in exact mode (max_particle_number, ParticleSampler.cpp:164-239).

    Pure column arithmetic so it can run either on the host in f64 or
    jitted on the accelerator in f32 (the (cells x species x 32) integrals
    dominate setup wall-clock at 1e4+ cells otherwise)."""
    T = cells.T[:, None]
    mbar = species.mass[None, :] / T
    aB = cells.alphaB[:, None]
    b = species.baryon[None, :]
    sgn = species.sign[None, :]
    g = species.degeneracy[None, :]
    neq_fact = T**3 / two_pi2_hbarC3
    neq = neq_fact * g * thermal.neq_integral(r1, w1, mbar, aB, b, sgn)

    if cfg.df_mode in (1, 2):
        return 2.0 * neq

    breaks = breaks_down[:, None]
    if cfg.df_mode == 3:
        J20_fact = T * neq_fact
        J10 = jnp.zeros_like(neq)
        if cfg.include_baryon:
            J10 = neq_fact * g * thermal.J10_integral(r1, w1, mbar, aB, b, sgn)
        J20 = J20_fact * g * thermal.J20_integral(r2, w2, mbar, aB, b, sgn)
        bulk_density = (neq + b * J10 * G[:, None]
                        + J20 * F[:, None] / T / T) / betabulk[:, None]
        return jnp.where(breaks, 2.0 * neq, bulkPi[:, None] * bulk_density + neq)
    if cfg.df_mode == 4:
        neq0 = neq_fact * g * thermal.neq_integral(r1, w1, mbar,
                                                   jnp.zeros_like(aB),
                                                   jnp.zeros_like(b), sgn)
        return jnp.where(breaks, 2.0 * neq, z[:, None] * neq0)
    raise ValueError("exact rates support df_mode 1-4")


@host_prep
def _prepare_sampler_host(surf, species_table: SpeciesTable,
                          chosen_idx: np.ndarray, df_data: DeltafData,
                          cfg: Config, laguerre: GaussLaguerre,
                          block: int | None = None):
    cells = prepare_cells(surf, cfg, block=block or cfg.cell_block)
    species = SpeciesArrays.from_table(species_table, chosen_idx)
    c = cells

    basis = lrf.milne_basis(c.tau, c.ux, c.uy, c.un)
    ds = lrf.boost_dsigma(basis, c.tau, c.ux, c.uy, c.un,
                          c.dat, c.dax, c.day, c.dan)
    pi = lrf.boost_shear(basis, c.tau, c.pitt, c.pitx, c.pity, c.pitn,
                         c.pixx, c.pixy, c.pixn, c.piyy, c.piyn, c.pinn)
    Vx_l, Vy_l, Vz_l = lrf.boost_diffusion(basis, c.tau, c.Vt, c.Vx, c.Vy, c.Vn)

    fq = None
    if cfg.df_mode in (3, 4):
        fq = prepare_feqmod(cells, species, df_data, cfg, laguerre)
        bulkPi = fq.bulkPi
    else:
        bulkPi = c.bulkPi

    df = df_data.evaluate(c.T, c.muB, c.E, c.P, bulkPi)

    # df coefficient columns for w_visc (ParticleSampler.cpp:780-809)
    df_cols = {
        "c0_minus_c2": df.c0 - df.c2,
        "c1": df.c1,
        "fourc2_minus_c0": 4.0 * df.c2 - df.c0,
        "c3": df.c3,
        "c4": df.c4,
        "shear14": df.shear14,
        "two_betapi_T": 2.0 * df.betapi * c.T,
        "three_T": 3.0 * c.T,
        "F_over_T2": df.F / (c.T * c.T),
        "G": df.G,
        "betaV": df.betaV,
        "bulkPi_over_betabulk": bulkPi / jnp.where(df.betabulk != 0, df.betabulk, 1.0),
        "bulkPi": bulkPi,
        "delta_z_m3dl": df.delta_z - 3.0 * df.delta_lambda,
        "dl_over_T": df.delta_lambda / c.T,
        # raw columns for the exact-rate integrals (device path)
        "F": df.F,
        "betabulk": df.betabulk,
    }

    if cfg.df_mode == 3:
        T_mod = fq.T_mod
        alphaB_mod = fq.alphaB_mod
        shear_mod = 0.5 / df.betapi
        bulk_mod = bulkPi / (3.0 * df.betabulk)
        diff_mod = c.T / df.betaV
    elif cfg.df_mode == 4:
        T_mod = c.T
        alphaB_mod = jnp.zeros_like(c.T)
        shear_mod = 0.5 / df.betapi
        bulk_mod = df.lam
        diff_mod = jnp.zeros_like(c.T)
    else:
        T_mod = c.T
        alphaB_mod = c.alphaB
        shear_mod = jnp.zeros_like(c.T)
        bulk_mod = jnp.zeros_like(c.T)
        diff_mod = jnp.zeros_like(c.T)

    if cfg.fast:
        rates = _fast_rates(cells, species_table, chosen_idx, fq, cfg)
        rates = jnp.maximum(rates, 0.0) * cells.mask[:, None]
    else:
        rates = None  # filled in by prepare_sampler (host f64 / device f32)

    setup = SamplerSetup(
        cells=cells, fq=fq, rates=rates,
        dst=ds.t, dsx=ds.x, dsy=ds.y, dsz=ds.z, ds_max=ds.magnitude,
        pixx=pi.xx, pixy=pi.xy, pixz=pi.xz, piyy=pi.yy, piyz=pi.yz, pizz=pi.zz,
        Vx=Vx_l, Vy=Vy_l, Vz=Vz_l, df_cols=df_cols,
        shear_mod=shear_mod, isotropic_scale=1.0 + bulk_mod, diff_mod=diff_mod,
        T_mod=T_mod, alphaB_mod=alphaB_mod,
        breaks_down=(fq.breaks_down if fq is not None
                     else jnp.zeros(cells.n_padded, dtype=bool)),
    )
    return setup, species


def prepare_sampler(surf, species_table: SpeciesTable, chosen_idx: np.ndarray,
                    df_data: DeltafData, cfg: Config, laguerre: GaussLaguerre,
                    block: int | None = None) -> tuple[SamplerSetup, SpeciesArrays]:
    """Host prep + (exact mode, f32 path) device-side rate integrals."""
    setup, species = _prepare_sampler_host(surf, species_table, chosen_idx,
                                           df_data, cfg, laguerre, block)
    if setup.rates is not None:
        return setup, species

    r1, w1 = jnp.asarray(laguerre.roots[1]), jnp.asarray(laguerre.weights[1])
    r2, w2 = jnp.asarray(laguerre.roots[2]), jnp.asarray(laguerre.weights[2])
    z = setup.fq.z if setup.fq is not None \
        else jnp.zeros_like(setup.cells.T)

    def compute(cells, species_a, breaks, bulkPi, z_a, G, F, betabulk,
                r1a, w1a, r2a, w2a):
        rates = _exact_rates(cells, species_a, breaks, bulkPi, z_a,
                             G, F, betabulk, cfg, r1a, w1a, r2a, w2a)
        return jnp.maximum(rates, 0.0) * cells.mask[:, None]

    args = (setup.cells, species, setup.breaks_down,
            setup.df_cols["bulkPi"], z, setup.df_cols["G"],
            setup.df_cols["F"], setup.df_cols["betabulk"], r1, w1, r2, w2)
    if cfg.compute_dtype in ("f32", "f32c"):
        f32 = jnp.float32

        def cast(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(f32)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a, tree)

        rates = jax.jit(compute)(*cast(args))
    else:
        from ..utils import cpu_device
        cpu = cpu_device()
        if cpu is not None:
            with jax.default_device(cpu):
                rates = compute(*args)
        else:
            rates = compute(*args)
    return dataclasses.replace(setup, rates=rates), species


# ----------------------------------------------------------------------
# total yield & event count
# ----------------------------------------------------------------------

@host_prep
def compute_total_yield(surf, species_table: SpeciesTable, chosen_idx,
                        df_data: DeltafData, cfg: Config,
                        laguerre: GaussLaguerre) -> float:
    """Mean total yield (calculate_total_yield, ParticleSampler.cpp:447-636).

    Uses the cached per-species densities at the surface-averaged (T, muB),
    i.e. the reference's estimate_mean_particle_number."""
    cells = prepare_cells(surf, cfg, block=cfg.cell_block)

    neq = jnp.asarray(species_table.equilibrium_density[chosen_idx])
    dnb = jnp.asarray(species_table.bulk_density[chosen_idx])
    dnd = jnp.asarray(species_table.diff_density[chosen_idx])

    # one jitted program: eagerly this is ~10 dispatches plus an emulated-
    # f64 (cells x species) pass -- seconds of preamble through the tunnel
    z_eff = None
    if cfg.df_mode == 4:  # PTB (ParticleSampler.cpp:91-104)
        species = SpeciesArrays.from_table(species_table, chosen_idx)
        fq = prepare_feqmod(cells, species, df_data, cfg, laguerre)
        z_eff = jnp.where(fq.breaks_down, 1.0 + fq.delta_z, fq.z)
    return float(_total_yield_jit(cells, neq, dnb, dnd, z_eff, cfg))


@partial(jax.jit, static_argnames=("cfg",))
def _total_yield_jit(c: CellArrays, neq, dnb, dnd, z_eff, cfg: Config):
    basis = lrf.milne_basis(c.tau, c.ux, c.uy, c.un)
    ds = lrf.boost_dsigma(basis, c.tau, c.ux, c.uy, c.un,
                          c.dat, c.dax, c.day, c.dan)
    if cfg.df_mode in (1, 2, 3, 5):
        Vdsigma = c.Vt * c.dat + c.Vx * c.dax + c.Vy * c.day + c.Vn * c.dan
        per_cell = (ds.t[:, None] * (neq[None, :] + c.bulkPi[:, None] * dnb[None, :])
                    - ds.space[:, None] * Vdsigma[:, None] * dnd[None, :])
    else:  # PTB
        per_cell = ds.t[:, None] * z_eff[:, None] * neq[None, :]

    total = jnp.sum(per_cell * c.mask[:, None])
    if cfg.dimension == 2:
        total = total * 2.0 * cfg.y_cut
    return total


def number_of_events(Ntot: float, cfg: Config) -> int:
    if not cfg.oversample:
        return 1
    return int(min(np.ceil(cfg.min_num_hadrons / max(Ntot, 1e-300)),
                   cfg.max_num_samples))


# ----------------------------------------------------------------------
# the hadron pipeline
# ----------------------------------------------------------------------

@dataclasses.dataclass
class ParticleList:
    """Padded sampled-particle arrays; entries with valid=False are padding."""

    valid: np.ndarray
    event: np.ndarray
    mcid: np.ndarray
    tau: np.ndarray
    x: np.ndarray
    y: np.ndarray
    eta: np.ndarray
    t: np.ndarray
    z: np.ndarray
    E: np.ndarray
    px: np.ndarray
    py: np.ndarray
    pz: np.ndarray
    mass: np.ndarray

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())


def _rejection_loop(key, mbar, mbar2, sign, chem, light, weq_max,
                    max_rounds: int, stop_count: int = 0):
    """All-lanes rejection rounds until every lane accepted (or max_rounds,
    or fewer than ``stop_count`` lanes remain — the caller's straggler
    buffer size).  Proposal math runs in f32 (the draws feed f32-exact
    comparisons; accepted kinematics are upcast by the caller); returns
    dimensionless (accepted, pbar, Ebar, phi2pi, costh, feq, prop_count).

    ``prop_count`` is the PER-LANE int32 proposal count (the reference's
    samples counter, ParticleSampler.cpp:676-677, 1133): a per-round
    elementwise increment reduced once by the caller.  Accumulating scalar
    f64 counters inside the loop instead costs ~2.3x the whole phase (two
    emulated-f64 full-lane reductions per round, measured on v5e)."""
    f32 = jnp.float32
    mbar = mbar.astype(f32)
    mbar2 = mbar2.astype(f32)
    sign = sign.astype(f32)
    chem = chem.astype(f32)
    weq_max = weq_max.astype(f32)
    n = mbar.shape[0]

    def body(state):
        rnd, key, accepted, pbar, Ebar, phi2pi, costh, feq, prop_count = state
        key, k1 = jax.random.split(key)
        u = jax.random.uniform(k1, (7, n), dtype=f32)  # rows 0-6 used
        r1, r2, r3 = 1.0 - u[0], 1.0 - u[1], 1.0 - u[2]
        l1, l2, l3 = jnp.log(r1), jnp.log(r2), jnp.log(r3)

        # ---- light branch (p^2 exp(-p) proposal) ----
        pbar_l = -(l1 + l2 + l3)
        Ebar_l = jnp.sqrt(pbar_l * pbar_l + mbar2)
        # overflow-safe: feq = exp(-E)/(1+s exp(-E)); 1/(r1 r2 r3) = exp(p)
        den_l = 1.0 + sign * jnp.exp(-Ebar_l)
        feq_l = jnp.exp(-Ebar_l) / den_l
        w_l = jnp.exp(pbar_l - Ebar_l) / den_l / weq_max
        phi_l = (l1 + l2) ** 2 / (pbar_l * pbar_l)
        cos_l = (l1 - l2) / (l1 + l2)

        # ---- heavy branch (k = E - m decomposition) ----
        # choose distribution ~ (mbar^2, 2 mbar, 2)
        wsum = mbar2 + 2.0 * mbar + 2.0
        usel = u[3] * wsum
        case = jnp.where(usel < mbar2, 0, jnp.where(usel < mbar2 + 2.0 * mbar, 1, 2))
        kbar0 = -l1
        kbar1 = -(l1 + l2)
        kbar2 = -(l1 + l2 + l3)
        # where-chains, NOT jnp.choose: choose lowers to per-element gathers
        # on TPU and costs 20x inside this loop (measured 6.6s vs 0.3s for
        # 10 rounds at 17M lanes)
        kbar = jnp.where(case == 0, kbar0, jnp.where(case == 1, kbar1, kbar2))
        phi0 = u[4]
        phi1 = -l1 / jnp.where(kbar1 != 0.0, kbar1, 1.0)
        phi2 = (l1 + l2) ** 2 / jnp.where(kbar2 != 0.0, kbar2 * kbar2, 1.0)
        phi_h = jnp.where(case == 0, phi0, jnp.where(case == 1, phi1, phi2))
        cos_uni = 2.0 * u[5] - 1.0
        cos2 = (l1 - l2) / (l1 + l2)
        cos_h = jnp.where(case == 2, cos2, cos_uni)

        Ebar_h = kbar + mbar
        pbar_h = jnp.sqrt(jnp.maximum(Ebar_h * Ebar_h - mbar2, 0.0))
        # overflow-safe: boltz*feq = 1/(1+s exp(-(E-chem)))
        t_h = Ebar_h - chem
        den_h = 1.0 + sign * jnp.exp(-t_h)
        feq_h = jnp.exp(-t_h) / den_h
        w_h = pbar_h / jnp.where(Ebar_h != 0.0, Ebar_h, 1.0) / den_h

        w = jnp.where(light, w_l, w_h)
        pbar_new = jnp.where(light, pbar_l, pbar_h)
        Ebar_new = jnp.where(light, Ebar_l, Ebar_h)
        phi_new = jnp.where(light, phi_l, phi_h)
        cos_new = jnp.where(light, cos_l, cos_h)
        feq_new = jnp.where(light, feq_l, feq_h)

        acc_now = (u[6] < w) & ~accepted
        prop_count = prop_count + (~accepted).astype(jnp.int32)
        pbar = jnp.where(acc_now, pbar_new, pbar)
        Ebar = jnp.where(acc_now, Ebar_new, Ebar)
        phi2pi = jnp.where(acc_now, phi_new, phi2pi)
        costh = jnp.where(acc_now, cos_new, costh)
        feq = jnp.where(acc_now, feq_new, feq)
        return (rnd + 1, key, accepted | acc_now, pbar, Ebar, phi2pi, costh,
                feq, prop_count)

    def cond(state):
        rnd = state[0]
        accepted = state[2]
        # int32 bool-count: cheap; the f64 version is emulated on v5e
        remaining = jnp.sum((~accepted).astype(jnp.int32))
        return (rnd < max_rounds) & (remaining > stop_count)

    zeros = jnp.zeros(n, f32)
    state = (jnp.asarray(0), key, jnp.zeros(n, dtype=bool),
             zeros, jnp.ones(n, f32), zeros, zeros, zeros,
             jnp.zeros(n, jnp.int32))
    _, _, accepted, pbar, Ebar, phi2pi, costh, feq, prop_count = \
        jax.lax.while_loop(cond, body, state)
    return accepted, pbar, Ebar, phi2pi, costh, feq, prop_count


# how _compaction_index builds the kept-lane index:
#   "scatter"      -- one full-width int32 scatter (the round-3/4 path)
#   "searchsorted" -- log2(n) vectorized-bisection gathers at OUTPUT width
# Both produce bitwise-identical output (the searchsorted variant zeroes
# the padding slots to match).  The gather variant replaces the n-update
# scatter with ~log2(n) passes of `size` gathered elements: scatters on
# v5e resolve update indices serially per tile, so at n=5.6M the scatter
# is the dominant cost of BOTH the momentum straggler compaction and the
# kept-row finalize (measured via tools/finalize_profile.py); flipped only
# if the on-silicon A/B confirms.
_COMPACTION_METHOD = "scatter"


def _compaction_index(mask, size: int):
    """Indices of the True lanes of ``mask`` in ascending order, padded with
    0 (duplicates of lane 0) -- jnp.nonzero(size=...) semantics.  The
    jnp.nonzero lowering costs ~12x at 1e7 lanes on v5e (890 ms vs 72 ms):
    it is also scatter-based but materializes argwhere intermediates.
    True lanes beyond ``size`` are simply not represented."""
    n = mask.shape[0]
    cum = jnp.cumsum(mask.astype(jnp.int32))
    pos = cum - 1
    if _COMPACTION_METHOD == "searchsorted":
        j = jnp.arange(size, dtype=jnp.int32)
        # first lane where cum > j == the j-th kept lane (cum hits j+1
        # there); zero the padding slots (j >= total kept) for bitwise
        # parity with the scatter construction
        idx = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        idx = jnp.where(j < cum[-1], idx, 0)
    else:
        tgt = jnp.where(mask, pos, size)
        idx = jnp.zeros(size, jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
    return idx, pos


def _pack_ids(cell_idx, sp_idx, event, pack: tuple):
    """(cell, species, chunk-relative event) -> one u32 lane
    (cell | sp << cell_bits | event << cell_bits+sp_bits).  ``pack`` =
    (cell_bits, sp_bits, ev_bits), chosen by the caller so every id range
    fits (sum <= 32).  Non-kept lanes may carry garbage ids; they are
    masked field-wise so the packed garbage stays within each field (those
    rows are discarded host-side either way)."""
    cb, sb, eb = pack
    u32 = jnp.uint32
    u = ((cell_idx.astype(u32) & u32((1 << cb) - 1))
         | ((sp_idx.astype(u32) & u32((1 << sb) - 1)) << cb)
         | ((event.astype(u32) & u32((1 << eb) - 1)) << (cb + sb)))
    return u


def unpack_ids(packed, pack: tuple, ev0: int = 0):
    """Host-side (numpy) inverse of _pack_ids; adds the chunk's ``ev0`` to
    the relative event ids.  Returns (cell_idx, sp_idx, event) int32/int64
    arrays."""
    import numpy as np
    cb, sb, eb = pack
    p = np.asarray(packed, dtype=np.uint32)
    cell = (p & np.uint32((1 << cb) - 1)).astype(np.int64)
    sp = ((p >> np.uint32(cb)) & np.uint32((1 << sb) - 1)).astype(np.int64)
    ev = ((p >> np.uint32(cb + sb)) & np.uint32((1 << eb) - 1)).astype(
        np.int64) + int(ev0)
    return cell, sp, ev


def _sample_momentum(key, mass, sign, T, chem, count_mask=None,
                     rounds_phase1: int = 30, rounds_phase2: int = 200,
                     straggler_frac: int = 16):
    """Vectorized rejection sampling of the LRF momentum
    (sample_momentum, ParticleSampler.cpp:243-405).

    An all-lanes while_loop is tail-dominated: the last few low-acceptance
    lanes force ~ln(n)/w_min extra full-width rounds past the bulk.  Two
    phases: full-width rounds run only until the unaccepted lanes fit the
    n/straggler_frac buffer (adaptive stop_count exit, typically 3-4
    rounds), then the stragglers are scatter-compacted into that buffer
    (packed single-take inputs) and iterate to completion; results merge
    back by gather (cumsum position), never scatter.  Statistically
    identical to per-lane independent proposals until first acceptance.
    Overflowing the buffer requires acceptance < ~9% sustained for
    rounds_phase1 full-width rounds; overflow lanes stay unaccepted and are
    counted by the caller's ``dropped`` diagnostic.  Returns
    (E, px, py, pz, feq, accepted, n_prop, n_acc) in GeV; n_prop/n_acc are
    the acceptance-efficiency counters over ``count_mask`` lanes.
    """
    f32 = jnp.float32
    mbar = (mass / T).astype(f32)
    mbar2 = mbar * mbar
    n = mass.shape[0]
    if count_mask is None:
        count_mask = jnp.ones(n, dtype=bool)

    light = mbar < 1.008
    use_pion_rescale = (mbar < 0.8554) & (sign == -1.0)
    weq_max = jnp.where(use_pion_rescale, pion_thermal_weight_max(mbar),
                        1.0).astype(f32)

    m = max(1024, n // straggler_frac)
    key1, key2 = jax.random.split(key)
    # small runs skip the compaction phase: run the single loop to the
    # phase-2 round budget so no lane is ever round-starved
    p1_rounds = rounds_phase1 if m < n else rounds_phase2
    accepted, pbar, Ebar, phi2pi, costh, feq, prop = _rejection_loop(
        key1, mbar, mbar2, sign, chem, light, weq_max, p1_rounds,
        stop_count=m if m < n else 0)

    if m < n:
        idx, pos = _compaction_index(~accepted, m)
        # packed compacted inputs: one small take
        sub = jnp.take(jnp.stack([mbar, mbar2, sign.astype(f32),
                                  chem.astype(f32), weq_max,
                                  light.astype(f32),
                                  (~accepted).astype(f32)]), idx, axis=1)
        acc2, pbar2, Ebar2, phi2, cos2, feq2, prop2 = _rejection_loop(
            key2, sub[0], sub[1], sub[2], sub[3], sub[5] > 0.5, sub[4],
            rounds_phase2)
        was_straggler = sub[6] > 0.5  # filler lanes are lane-0 copies

        # gather-merge: straggler lane i sits at slot pos[i] of the buffer
        in_buf = ~accepted & (pos < m)
        posc = jnp.clip(pos, 0, m - 1)
        back = jnp.take(jnp.stack([pbar2, Ebar2, phi2, cos2, feq2,
                                   (acc2 & was_straggler).astype(f32),
                                   jnp.where(was_straggler, prop2, 0
                                             ).astype(f32)]), posc, axis=1)
        pbar = jnp.where(in_buf, back[0], pbar)
        Ebar = jnp.where(in_buf, back[1], Ebar)
        phi2pi = jnp.where(in_buf, back[2], phi2pi)
        costh = jnp.where(in_buf, back[3], costh)
        feq = jnp.where(in_buf, back[4], feq)
        accepted = accepted | (in_buf & (back[5] > 0.5))
        prop = prop + jnp.where(in_buf, back[6], 0.0).astype(jnp.int32)

    # efficiency counters: ONE masked reduction (per-lane int32 counts; see
    # _rejection_loop)
    n_prop = jnp.sum(jnp.where(count_mask, prop, 0)).astype(jnp.float64)
    n_acc = jnp.sum((accepted & count_mask).astype(jnp.int32)
                    ).astype(jnp.float64)

    p = pbar * T
    phi = phi2pi * two_pi
    sinth = jnp.sqrt(jnp.maximum(1.0 - costh * costh, 0.0))
    E = Ebar * T
    px = p * sinth * jnp.cos(phi)
    py = p * sinth * jnp.sin(phi)
    pz = p * costh
    return E, px, py, pz, feq, accepted, n_prop, n_acc


# inverse-CDF bucket count for the species draw: a per-cell (NB+1)-entry
# pointer table brackets the answer to a (typically 1-4 species) window, so
# the per-hadron draw costs 2 pointer gathers + ~2 bisect gathers instead
# of the 9 full bisection gathers (each full-width random gather is
# ~120 ms/chunk at production scale).  MUST be a power of two: then
# u * NB and cdf * NB are exact f32 scalings and the bucket bracket
# provably contains "first s with cdf[s] > u" -- the bucketed draw returns
# bitwise the same species as a full bisection.
_CDF_BUCKETS = 2048


def _species_cdf(rates):
    """Per-cell species CDF + inverse-CDF bucket pointers + total rate for
    the two-level yield draw.

    Computed ONCE per campaign, in its OWN program: (1) the prefix sums run
    on the MXU as triangular matmuls -- a cumsum along the minor axis costs
    ~4 s at 1e5 cells (lane-padded log-shift passes), the matmuls ~10 ms;
    (2) the materialized program outputs have the canonical linear layout,
    so the per-chunk gathers read them at full HBM speed (gathering from an
    in-program cumsum product measured 4-6x slower).  The bucket table is
    T[c,j] = #{s : floor(cdf[c,s] * NB) < j} = first s whose bucket is >= j
    (cdf is non-decreasing per cell), built as a scatter-add histogram of
    floor(cdf*NB) + an exclusive prefix sum (strict-upper triangular
    matmul; counts <= S are exact in f32).  Adjacent equal-prefix species
    (zero rate) are never selected by the bisection, and ~1-ulp f32
    non-monotonicity between tiny neighbors only reshuffles ~1e-7 of the
    probability mass."""
    r32 = rates.astype(jnp.float32)
    C, S = r32.shape
    cum = jax.lax.dot(r32, jnp.triu(jnp.ones((S, S), jnp.float32)),
                      precision=jax.lax.Precision.HIGHEST)
    cell_rate = cum[:, -1]
    cdf = cum / jnp.maximum(cell_rate, 1e-30)[:, None]

    NB = _CDF_BUCKETS
    b = jnp.floor(cdf * NB).astype(jnp.int32)         # (C, S) in [0, NB]
    rows = jnp.arange(C, dtype=jnp.int32)[:, None] * (NB + 1)
    hist = jnp.zeros(C * (NB + 1), jnp.float32).at[
        (rows + jnp.clip(b, 0, NB)).reshape(-1)].add(1.0).reshape(C, NB + 1)
    strict_upper = jnp.triu(jnp.ones((NB + 1, NB + 1), jnp.float32), k=1)
    bucket = jax.lax.dot(hist, strict_upper,
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(jnp.int32)
    # pack the bracket [T[k], T[k+1]] of every bucket into ONE int32
    # (lo + width << 16): the per-hadron draw then needs a single random
    # gather for its window instead of two (each full-width random gather
    # is the dominant cost of the species draw, see _sample_hadrons_jit).
    # width <= S < 2^15, so the packed value stays in int32 range.
    packed = bucket[:, :-1] + ((bucket[:, 1:] - bucket[:, :-1]) << 16)
    return cdf.reshape(-1), packed.reshape(-1), cell_rate


_species_cdf_jit = jax.jit(_species_cdf)


def _species_alias(rates):
    """Walker alias tables for the per-hadron species draw (host build,
    once per campaign): returns (prob_flat f32 (C*S,), alias_flat i32
    (C*S,), cell_rate f32 (C,)).

    The on-device draw is exactly TWO random gathers per hadron from
    (C, S)-footprint tables -- measured 3.6x faster than the bucketed
    inverse-CDF draw (0.55 s -> 0.15 s per 8e6-hadron chunk on v5e): TPU
    random-gather cost grows with the table footprint, and the CDF
    scheme's (C, 2049) pointer table gather alone cost 0.15 s, before its
    bisection rounds and straggler machinery.  The alias draw is i.i.d.
    from the same per-cell categorical (species probabilities exact to the
    f64 build, f32-rounded once in the stored prob -- the same 2^-24 class
    as the f32 CDF it replaces).  Kept alongside `_species_cdf`: the
    ensemble sampler builds its tables INSIDE a vmapped device program
    where a host-side C call cannot run."""
    from ..io.fastio import build_alias_tables
    r = np.asarray(rates, dtype=np.float64)
    prob, alias = build_alias_tables(r)
    cell_rate = r.sum(axis=1).astype(np.float32)
    # field-major pack (prob bitcast to i32, alias) so the per-hadron draw
    # resolves its random index ONCE for both rows (see the field-gather
    # note in _sample_hadrons_jit: index resolution dominates, not bytes)
    packed = np.stack([prob.reshape(-1).view(np.int32),
                       alias.reshape(-1)])
    return (jnp.asarray(packed), jnp.zeros((), jnp.int32),
            jnp.asarray(cell_rate))


@jax.jit
def _cast_f32_jit(tree):
    """Cast every floating leaf of a pytree to f32 in ONE device program
    (an eager per-leaf .astype dispatches one convert program per array --
    ~30 round trips at campaign start, 15 s through the remote tunnel)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


# df coefficient columns each mode's hadron pipeline reads (w_visc,
# ParticleSampler.cpp:780-809); the packed gather stack carries only these
_DF_COLS_USED = {
    1: ("c0_minus_c2", "c1", "fourc2_minus_c0", "c3", "c4", "shear14",
        "bulkPi"),
    2: ("two_betapi_T", "three_T", "F_over_T2", "G", "betaV",
        "bulkPi_over_betabulk"),
    3: ("two_betapi_T", "three_T", "F_over_T2", "G", "betaV",
        "bulkPi_over_betabulk"),
    4: ("two_betapi_T", "delta_z_m3dl", "dl_over_T"),
}


def _species_draw_cdf(cdf_flat, cdf_bucket, cell_idx, k_sp, S_count: int,
                      capacity: int, stop_after: str | None):
    """Bucketed inverse-CDF species draw (the `_species_cdf` tables): the
    packed pointer table brackets "first s with cdf[s] > u" to
    [T[k], T[k+1]], k = floor(u * NB) (exact: NB is a power of two, so the
    scalings are exact f32 and the bracket is provably correct) with ONE
    random gather.  Two UNROLLED bisect rounds resolve every window of
    width <= 3 (>= 99% of lanes: u is uniform over buckets, and wide
    windows -- clusters of near-zero-rate species sharing a bucket -- are
    rare in probability); the stragglers are scatter-compacted into a
    small buffer and bisected to completion there, then merged back by
    gather.  A GLOBAL while_loop instead runs ceil(log2(max window)) = ~9
    full-width gather+state rounds for ALL lanes because the widest single
    window (the near-1.0 cdf cluster of heavy species, width ~370)
    dictates the trip count.  The trailing global while_loop is the
    exactness net: it normally exits on its first cond check and only
    bisects in the astronomically-rare case of a straggler-buffer
    overflow, so the drawn species is ALWAYS bitwise the full bisection's.

    Used by the vmapped ensemble sampler (tables built on device inside
    the program); the campaign samplers use the alias draw
    (`_species_alias`, measured 3.6x faster).  Returns (sp_idx, None), or
    (None, probe dict) when ``stop_after`` names one of its probes."""
    u_sp = jax.random.uniform(k_sp, (capacity,), dtype=jnp.float32)
    NB = _CDF_BUCKETS
    kb = (u_sp * NB).astype(jnp.int32)           # in [0, NB-1]: u < 1
    if stop_after == "usp":
        return None, {"_probe": jnp.sum(kb)}
    packed_t = jnp.take(cdf_bucket, cell_idx * NB + kb, axis=0)
    lo = jnp.minimum(packed_t & 0xFFFF, S_count - 1)
    hi = jnp.minimum(lo + (packed_t >> 16), S_count - 1)
    base = cell_idx * S_count
    if stop_after == "bracket":
        return None, {"_probe": jnp.sum(lo) + jnp.sum(hi)}

    def _bisect_round(lo_c, hi_c, base_c, u_c):
        # idempotent on resolved lanes: lo == hi implies cdf[mid] > u by
        # the bracket invariant, so (lo, hi) is unchanged
        mid = (lo_c + hi_c) >> 1
        cmid = jnp.take(cdf_flat, base_c + mid, axis=0)
        go_right = cmid <= u_c
        return (jnp.where(go_right, mid + 1, lo_c),
                jnp.where(go_right, hi_c, mid))

    lo, hi = _bisect_round(lo, hi, base, u_sp)
    lo, hi = _bisect_round(lo, hi, base, u_sp)
    if stop_after == "unroll":
        return None, {"_probe": jnp.sum(lo) + jnp.sum(hi)}

    m_sp = max(1024, capacity // 64)
    if m_sp < capacity:
        unresolved = lo < hi
        idx_s, pos_s = _compaction_index(unresolved, m_sp)
        sub_i = jnp.take(jnp.stack([lo, hi, base]), idx_s, axis=1)
        u_sub = jnp.take(u_sp, idx_s, axis=0)

        def _sub_cond(state):
            lo_c, hi_c = state
            return jnp.any(lo_c < hi_c)

        def _sub_body(state):
            lo_c, hi_c = state
            return _bisect_round(lo_c, hi_c, sub_i[2], u_sub)

        lo_s, _ = jax.lax.while_loop(_sub_cond, _sub_body,
                                     (sub_i[0], sub_i[1]))
        in_buf = unresolved & (pos_s < m_sp)
        back = jnp.take(lo_s, jnp.clip(pos_s, 0, m_sp - 1), axis=0)
        lo = jnp.where(in_buf, back, lo)
        hi = jnp.where(in_buf, back, hi)

    def _bisect_cond(state):
        lo_c, hi_c = state
        return jnp.any(lo_c < hi_c)

    def _bisect_body(state):
        lo_c, hi_c = state
        return _bisect_round(lo_c, hi_c, base, u_sp)

    lo, hi = jax.lax.while_loop(_bisect_cond, _bisect_body, (lo, hi))
    return jnp.minimum(lo, S_count - 1), None


def _rap_meta(cfg: Config, seed, ev0: int) -> dict:
    """Host-side metadata for LEAN chunks: marks the chunk as LRF-momentum
    (ChunkCollector._boost_lrf_to_lab does the lab boost) and seeds the
    host rapidity stream deterministically per (campaign seed, ev0) --
    independent of pad/capacity choices and chunk scheduling."""
    base = seed if seed is not None else (
        cfg.sampler_seed if cfg.sampler_seed >= 0 else 0)
    return {"lrf": True, "dimension": cfg.dimension, "y_max": cfg.y_cut,
            "rap_seed": (int(base) & 0x7FFFFFFF) * 1_000_003 + int(ev0)}


def _envelope_tilt_cells(setup: SamplerSetup, cfg: Config):
    """Per-cell mean of the tilted flux envelope, c = (dst + ds/4)/ds_max.

    The flux keep w_flux = max(0, E dst - p.ds_vec)/(E ds_max) is bounded
    pointwise by w_hi(mu) = (dst + ds max(0, mu))/ds_max with
    mu = -phat.dshat and v = |p|/E <= 1.  Drawing the hadron count from
    lam * c and the direction from q(mu) = w_hi(mu)/c (both exact: c is
    the isotropic mean of w_hi), then keeping with w/w_hi, reproduces the
    ORIGINAL kept process exactly (Poisson thinning algebra) while never
    drawing the lanes destined for certain flux rejection -- the
    importance-corrected envelope VERDICT r4 #3 asked for
    (ParticleSampler.cpp:1059 draws and discards them all).  Since
    ds_max = dst + ds (LocalRestFrame.cpp:94-98 in the LRF), c ranges
    from 1 (timelike-only dsigma) down to 1/4 (spacelike-only).

    df 1/2 only: the df 3/4/5 momentum RESCALE (p = A p') mixes
    directions after the draw, so a pre-rescale mu cannot bound the
    post-rescale flux.  Returns None for those modes (old envelope).
    """
    if cfg.df_mode not in (1, 2):
        return None
    ds = jnp.sqrt(setup.dsx * setup.dsx + setup.dsy * setup.dsy
                  + setup.dsz * setup.dsz)
    return jnp.where(
        setup.ds_max > 0.0,
        (setup.dst + 0.25 * ds) / jnp.maximum(setup.ds_max, 1e-30),
        1.0).astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "capacity", "stop_after",
                                   "species_draw"))
def _sample_hadrons_jit(setup: SamplerSetup, species: SpeciesArrays,
                        mcid: jnp.ndarray, cdf_flat, cdf_bucket, cell_rate,
                        key, cfg: Config, capacity: int, n_events,
                        stop_after: str | None = None,
                        species_draw: str = "cdf"):
    """The full flat-hadron pipeline; returns raw per-hadron arrays.

    ``n_events`` is traced (NOT static) so an event-chunked campaign with a
    short remainder chunk reuses one compiled program.  ``cdf_flat`` /
    ``cdf_bucket`` / ``cell_rate`` come from `_species_cdf` (one
    computation per campaign).

    ``stop_after`` (static; None in production) truncates the pipeline
    after a named phase and returns a probe reduction that depends on all
    of that phase's outputs -- the measurement hook bench.py uses to
    publish the per-phase wall-clock split (VERDICT r3 item 2): XLA
    dead-code-eliminates everything after the probe, so timing the
    truncated programs and differencing gives each phase's marginal cost.
    Phases: "counts" (Poisson yield draw + run-length decode + bucketed
    species draw), "gathers" (the packed per-hadron field gathers),
    "momentum" (the rejection loop), "weights" (viscous + flux keep)."""
    c = setup.cells
    y_max = cfg.y_cut if cfg.dimension == 2 else 0.5
    volume = 2.0 * y_max * setup.ds_max

    key, k_poisson, k_event, k_mom, k_keep, k_rap, k_sp, k_dir = \
        jax.random.split(key, 8)

    S_count = species.mass.shape[0]
    # TWO-LEVEL yield draw (Poisson splitting): hadron counts per CELL from
    # the per-cell total rate, then species per hadron from the cell's
    # categorical.  One Poisson + cumsum + scatter-decode over the
    # (cells*species) axis costs ~10 s/chunk at production scale (1e5 x 444
    # = 44M lanes); the split draws Poissons over 1e5 lanes and assigns
    # species with a 9-step CDF bisection at hadron width.  The joint
    # distribution is identical (independent Poissons <=> Poisson total +
    # multinomial split).
    lam = (cell_rate * volume.astype(jnp.float32)) * \
        jnp.asarray(n_events, jnp.float32)
    tilt = _envelope_tilt_cells(setup, cfg)
    if tilt is not None:
        # tilted envelope (see _envelope_tilt_cells): fewer lanes drawn,
        # same kept process exactly
        lam = lam * tilt
    counts = jax.random.poisson(k_poisson, lam)          # (cfill,)
    cum = jnp.cumsum(counts)
    total = cum[-1]

    h = jnp.arange(capacity)
    valid = h < total
    # run-length decode: cell_idx[h] = #{c : cum[c] <= h}, via one
    # scatter-add of boundary markers + a cumsum.  A searchsorted here
    # costs ~80x (24 binary-search steps, each a random gather pass over
    # the hadron axis).
    marks = jnp.zeros(capacity, jnp.int32).at[
        jnp.minimum(cum, capacity)].add(1, mode="drop")
    cell_idx = jnp.minimum(jnp.cumsum(marks), counts.shape[0] - 1)

    if stop_after == "decode":
        return {"_probe": jnp.sum(cell_idx)
                + jnp.sum(valid.astype(jnp.int32)), "total": total}

    if species_draw == "alias":
        # Walker alias draw (see _species_alias): cdf_flat/cdf_bucket carry
        # the (C*S,) prob/alias tables; two gathers, no bisection.
        u2 = jax.random.uniform(k_sp, (2, capacity), dtype=jnp.float32)
        # u*S rounding can hit S exactly at u -> 1-ulp: clamp (a ~2^-24
        # nonuniformity, the same class as the f32 tables themselves)
        j = jnp.minimum((u2[0] * S_count).astype(jnp.int32), S_count - 1)
        pidx = cell_idx * S_count + j
        rows = jnp.take(cdf_flat, pidx, axis=1)   # (2, capacity) packed
        pr = jax.lax.bitcast_convert_type(rows[0], jnp.float32)
        sp_idx = jnp.where(u2[1] < pr, j, rows[1])
    else:
        sp_idx, probe = _species_draw_cdf(cdf_flat, cdf_bucket, cell_idx,
                                          k_sp, S_count, capacity,
                                          stop_after)
        if probe is not None:
            probe["total"] = total
            return probe

    if stop_after == "counts":
        return {"_probe": jnp.sum(sp_idx) + jnp.sum(cell_idx)
                + jnp.sum(valid.astype(jnp.int32)), "total": total}

    # per-hadron species properties: ONE packed gather, FIELD-MAJOR.  The
    # field axis must be the major (sublane) axis: a (hadrons, 3) gather
    # output is tiled (8, 128) on TPU, padding the minor dim 3 -> 128 lanes
    # (42x HBM blowup, OOM at production capacity); (3, hadrons) tiles
    # losslessly.  A separate take per field costs ~36x (measured): the
    # index resolution dominates, not the bytes.
    sp_packed = jnp.stack([species.mass, species.sign, species.baryon],
                          axis=0)
    sp_rows = jnp.take(sp_packed, sp_idx, axis=1)
    mass, sign, baryon = sp_rows[0], sp_rows[1], sp_rows[2]
    mass2 = mass * mass

    # per-hadron cell properties: one packed field-major gather (see above),
    # restricted to the columns THIS df mode's pipeline actually reads (the
    # full 37-row stack gathered ~14 dead rows on the df-1 path -- the
    # packed take's HBM read traffic scales with the row count).
    # Negative result (measured, do not retry): because cell_idx is SORTED
    # with ~80-hadron runs, this gather can be replaced by an exact int32
    # delta-scatter + row-cumsum expansion (bitcast fields, scatter-add
    # per-cell bit-deltas at the run boundaries, cumsum over the hadron
    # axis, bitcast back -- bitwise identical output); A/B at (25 fields x
    # 9.4M hadrons) on v5e measured the SAME wall as the gather: the
    # hadron-axis cumsum's log-shift passes cost what the index resolution
    # costs.
    fields = {
        # the LRF surface element: flux weight, every mode
        "dst": setup.dst, "dsx": setup.dsx, "dsy": setup.dsy,
        "dsz": setup.dsz, "ds_max": setup.ds_max,
        # cell position/flow columns are NOT gathered here: the lab-frame
        # reconstruction runs after kept-row compaction (_finalize_device),
        # at ~30% of the envelope width
    }
    if cfg.df_mode != 5:  # famod samples at (lambda, upsilonB): T unused
        fields["T"] = c.T
    if cfg.df_mode in (1, 2, 3, 4):  # pimunu p p in the viscous weight
        fields.update(pixx=setup.pixx, pixy=setup.pixy, pixz=setup.pixz,
                      piyy=setup.piyy, piyz=setup.piyz, pizz=setup.pizz)
    if cfg.df_mode in (1, 2, 3):  # V.p diffusion terms + baryon chem
        fields.update(alphaB=c.alphaB, Vx=setup.Vx, Vy=setup.Vy,
                      Vz=setup.Vz)
    if cfg.df_mode in (2, 3):
        fields["ratio"] = c.baryon_enthalpy_ratio
    if cfg.df_mode in (3, 4):
        fields["breaks"] = setup.breaks_down.astype(c.T.dtype)
        fields["shear_mod"] = setup.shear_mod
        fields["iso"] = setup.isotropic_scale
    if cfg.df_mode == 3:
        fields["diff_mod"] = setup.diff_mod
    if cfg.df_mode in (3, 5):  # modified sampling (T, alphaB)
        fields["alphaB_mod"] = setup.alphaB_mod
        fields["T_mod"] = setup.T_mod
    # df coefficient columns read by THIS mode's w_visc / rescale (famod
    # reads its whole dict: the B rescale matrix)
    _used = _DF_COLS_USED.get(cfg.df_mode)
    for _n in (_used if _used is not None else setup.df_cols):
        fields["df:" + _n] = setup.df_cols[_n]
    _names = sorted(fields)
    _packed = jnp.stack([fields[k] for k in _names], axis=0)
    _rows = jnp.take(_packed, cell_idx, axis=1)
    _col = {k: _rows[i] for i, k in enumerate(_names)}

    if stop_after == "gathers":
        return {"_probe": jnp.sum(_rows) + jnp.sum(sp_rows),
                "total": total}

    def gf(name):
        return _col[name]

    # mode-conditional columns (static cfg: untaken branches never trace,
    # so their fields are not in the gather stack)
    chem = baryon * gf("alphaB") if cfg.df_mode in (1, 2, 3) else None
    ratio = gf("ratio") if cfg.df_mode in (2, 3) else None
    breaks = (gf("breaks") > 0.5) if cfg.df_mode in (3, 4) else None
    chem_mod = baryon * gf("alphaB_mod") if cfg.df_mode in (3, 5) else None

    # sampling temperature & chemical potential per df mode
    if cfg.df_mode == 1 or cfg.df_mode == 2:
        T_s, chem_s = gf("T"), chem
    elif cfg.df_mode == 3:
        # breakdown cells fall back to CE sampling at (T, chem)
        T_s = jnp.where(breaks, gf("T"), gf("T_mod"))
        chem_s = jnp.where(breaks, chem, chem_mod)
    elif cfg.df_mode == 4:
        # PTB samples at (T, 0) always (ParticleSampler.cpp:1018)
        T_s = gf("T")
        chem_s = jnp.zeros_like(T_s)
    else:  # famod samples at (lambda, b * upsilonB) (ParticleSampler.cpp:1537)
        T_s = gf("T_mod")
        chem_s = chem_mod

    E0, px0, py0, pz0, feq, mom_ok, n_prop, n_acc = _sample_momentum(
        k_mom, mass, sign, T_s, chem_s, count_mask=valid)

    if cfg.df_mode in (1, 2):
        # Tilted-envelope direction draw (pairs with the lam tilt above,
        # see _envelope_tilt_cells): replace the SP draw's isotropic
        # direction (independent of |p| by the Scott-Pratt construction)
        # with mu = phat.a, a = -dshat, drawn from the exact tilted
        # density q(mu) proportional to dst + ds max(0, mu); azimuth
        # uniform about a.  The keep test below divides by w_hi(mu).
        dst_h, dsx_h = gf("dst"), gf("dsx")
        dsy_h, dsz_h = gf("dsy"), gf("dsz")
        ds_h = jnp.sqrt(dsx_h * dsx_h + dsy_h * dsy_h + dsz_h * dsz_h)
        inv_ds = 1.0 / jnp.maximum(ds_h, 1e-30)
        # ds -> 0 (timelike-only dsigma): q(mu) is uniform and any axis
        # serves; pick z to keep the frame orthonormal
        tiny = ds_h < 1e-12
        ax = jnp.where(tiny, 0.0, -dsx_h * inv_ds)
        ay = jnp.where(tiny, 0.0, -dsy_h * inv_ds)
        az = jnp.where(tiny, 1.0, -dsz_h * inv_ds)
        u2d = jax.random.uniform(k_dir, (2, capacity), dtype=jnp.float32)
        # CDF inversion of q: linear branch for mu < 0, quadratic for
        # mu >= 0 via the cancellation-stable (Citardauq) root -- exact
        # uniform continuation as ds -> 0
        t = u2d[0] * (2.0 * dst_h + 0.5 * ds_h)
        mu_neg = t / jnp.maximum(dst_h, 1e-30) - 1.0
        tp = t - dst_h
        disc = dst_h * dst_h + 2.0 * ds_h * tp
        mu_pos = 2.0 * tp / (dst_h + jnp.sqrt(jnp.maximum(disc, 0.0)))
        mu = jnp.clip(jnp.where(t <= dst_h, mu_neg, mu_pos), -1.0, 1.0)
        # branchless orthonormal frame about a (Duff et al. 2017)
        sz_f = jnp.where(az >= 0.0, 1.0, -1.0)
        aa = -1.0 / (sz_f + az)
        bb = ax * ay * aa
        e1x, e1y, e1z = 1.0 + sz_f * ax * ax * aa, sz_f * bb, -sz_f * ax
        e2x, e2y, e2z = bb, sz_f + ay * ay * aa, -ay
        psi = jnp.float32(2.0 * np.pi) * u2d[1]
        cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
        st = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        pmag = jnp.sqrt(px0 * px0 + py0 * py0 + pz0 * pz0)
        px0 = pmag * (mu * ax + st * (cpsi * e1x + spsi * e2x))
        py0 = pmag * (mu * ay + st * (cpsi * e1y + spsi * e2y))
        pz0 = pmag * (mu * az + st * (cpsi * e1z + spsi * e2z))
        w_hi = (dst_h + ds_h * jnp.maximum(mu, 0.0)) \
            / jnp.maximum(gf("ds_max"), 1e-30)
    else:
        w_hi = None

    if stop_after == "momentum":
        return {"_probe": jnp.sum(E0 + px0 + py0 + pz0 + feq)
                + jnp.sum(mom_ok.astype(jnp.int32)) + n_prop + n_acc,
                "total": total}

    if cfg.df_mode in (1, 2, 3, 4):
        pixx, pixy, pixz = gf("pixx"), gf("pixy"), gf("pixz")
        piyy, piyz, pizz = gf("piyy"), gf("piyz"), gf("pizz")
    if cfg.df_mode in (1, 2, 3):
        Vx, Vy, Vz = gf("Vx"), gf("Vy"), gf("Vz")

    # feqmod momentum rescale (rescale_momentum, ParticleSampler.cpp:407-426)
    if cfg.df_mode == 5:
        # p = B . p' (rescale_momentum_famod, ParticleSampler.cpp:428-444);
        # B is the identity on breakdown cells
        Bxx, Bxy, Bxz = gf("df:Bxx"), gf("df:Bxy"), gf("df:Bxz")
        Byy, Byz, Bzz = gf("df:Byy"), gf("df:Byz"), gf("df:Bzz")
        px = Bxx * px0 + Bxy * py0 + Bxz * pz0
        py = Bxy * px0 + Byy * py0 + Byz * pz0
        pz = Bxz * px0 + Byz * py0 + Bzz * pz0
        E = jnp.sqrt(mass2 + px * px + py * py + pz * pz)
    elif cfg.df_mode in (3, 4):
        shear_mod = gf("shear_mod")
        iso = gf("iso")
        if cfg.df_mode == 3:
            dmod = gf("diff_mod") * (E0 * ratio + baryon)
            dVx, dVy, dVz = dmod * Vx, dmod * Vy, dmod * Vz
        else:  # PTB has no diffusion rescale term
            dVx = dVy = dVz = 0.0
        rx = iso * px0 + shear_mod * (pixx * px0 + pixy * py0 + pixz * pz0) + dVx
        ry = iso * py0 + shear_mod * (pixy * px0 + piyy * py0 + piyz * pz0) + dVy
        rz = iso * pz0 + shear_mod * (pixz * px0 + piyz * py0 + pizz * pz0) + dVz
        rE = jnp.sqrt(mass2 + rx * rx + ry * ry + rz * rz)
        use_mod = ~breaks
        px = jnp.where(use_mod, rx, px0)
        py = jnp.where(use_mod, ry, py0)
        pz = jnp.where(use_mod, rz, pz0)
        E = jnp.where(use_mod, rE, E0)
    else:
        px, py, pz, E = px0, py0, pz0, E0

    # viscous weight (ParticleSampler.cpp:947-1047)
    feqbar = 1.0 - sign * feq
    if cfg.df_mode in (1, 2, 3, 4):
        pimunu_pp = (px0 * px0 * pixx + py0 * py0 * piyy + pz0 * pz0 * pizz
                     + 2.0 * (px0 * py0 * pixy + px0 * pz0 * pixz
                              + py0 * pz0 * piyz))
    if cfg.df_mode in (1, 2, 3):
        Vmu_pmu = -(px0 * Vx + py0 * Vy + pz0 * Vz)
    def gd(name):
        return gf("df:" + name)

    if cfg.df_mode == 1:
        df_shear = pimunu_pp / gd("shear14")
        df_bulk = (gd("c0_minus_c2") * mass2
                   + (baryon * gd("c1") + gd("fourc2_minus_c0") * E0) * E0) * gd("bulkPi")
        df_diff = (baryon * gd("c3") + gd("c4") * E0) * Vmu_pmu
        df_tot = feqbar * (df_shear + df_bulk + df_diff)
        w_visc = (1.0 + jnp.clip(df_tot, -1.0, 1.0)) / 2.0
    elif cfg.df_mode == 2:
        df_shear = pimunu_pp / (gd("two_betapi_T") * E0)
        df_bulk = (baryon * gd("G") + gd("F_over_T2") * E0
                   + (E0 - mass2 / E0) / gd("three_T")) * gd("bulkPi_over_betabulk")
        df_diff = (ratio - baryon / E0) * Vmu_pmu / gd("betaV")
        df_tot = feqbar * (df_shear + df_bulk + df_diff)
        w_visc = (1.0 + jnp.clip(df_tot, -1.0, 1.0)) / 2.0
    elif cfg.df_mode == 3:
        # CE fallback weight on breakdown cells, else 1
        df_shear = pimunu_pp / (gd("two_betapi_T") * E0)
        df_bulk = (baryon * gd("G") + gd("F_over_T2") * E0
                   + (E0 - mass2 / E0) / gd("three_T")) * gd("bulkPi_over_betabulk")
        df_diff = (ratio - baryon / E0) * Vmu_pmu / gd("betaV")
        df_tot = feqbar * (df_shear + df_bulk + df_diff)
        w_ce = (1.0 + jnp.clip(df_tot, -1.0, 1.0)) / 2.0
        w_visc = jnp.where(breaks, w_ce, 1.0)
    elif cfg.df_mode == 4:
        df_shear = feqbar * pimunu_pp / (gd("two_betapi_T") * E0)
        df_bulk = gd("delta_z_m3dl") + feqbar * gd("dl_over_T") * (E0 - mass2 / E0)
        w_j = (1.0 + jnp.clip(df_shear + df_bulk, -1.0, 1.0)) / 2.0
        w_visc = jnp.where(breaks, w_j, 1.0)
    else:  # famod: flux weight only (ParticleSampler.cpp:1546-1551)
        w_visc = jnp.ones_like(E0)

    dst, dsx, dsy, dsz = gf("dst"), gf("dsx"), gf("dsy"), gf("dsz")
    ds_max = gf("ds_max")
    w_flux = jnp.maximum(0.0, E * dst - px * dsx - py * dsy - pz * dsz) / (E * ds_max)

    # explicit f32 draw: the default dtype is f64 under x64, emulated on TPU
    u_keep = jax.random.uniform(k_keep, (capacity,), dtype=jnp.float32)
    if w_hi is not None:
        # tilted envelope: acceptance is w / w_hi(mu) (w <= w_hi pointwise
        # by construction), completing the exact importance chain
        keep = valid & mom_ok & (u_keep * w_hi
                                 < (w_flux * w_visc).astype(jnp.float32))
    else:
        keep = valid & mom_ok & (u_keep
                                 < (w_flux * w_visc).astype(jnp.float32))

    if stop_after == "weights":
        return {"_probe": jnp.sum(keep.astype(jnp.int32))
                + jnp.sum(E + px + py + pz), "total": total}

    event = jax.random.randint(k_event, (capacity,), 0, n_events)

    # cell-frame (LRF-boosted-to-Milne happens in _finalize_device, after
    # kept-row compaction: the boost + rapidity reconstruction only matter
    # for the ~30% of lanes that survive the flux/viscous keep)
    return {
        "keep": keep,
        "event": event,
        # the (S,) mcid/mass TABLES, not per-hadron: a full-width int gather
        # costs ~80 ms/chunk and the per-hadron ids are only needed for the
        # kept rows (to_particle_list maps sp_idx -> mcid on host; the
        # streaming collector derives mass = mass_tab[sp_idx] host-side to
        # shrink the device->host transfer)
        "mcid": mcid,
        "mass_tab": species.mass,
        "sp_idx": sp_idx,
        "cell_idx": cell_idx,
        "mass": mass,
        "E": E,
        "px": px,
        "py": py,
        "pz": pz,
        "_k_rap": k_rap,
        "total": total,
        "overflow": total > capacity,
        # diagnostics (ParticleSampler.cpp:1133 efficiency; dropped lanes
        # are straggler-buffer overflow, see _sample_momentum)
        "mom_proposals": n_prop,
        "mom_acceptances": n_acc,
        # int32 reductions upcast after: int64 reductions are emulated on TPU
        "drawn": jnp.sum(valid.astype(jnp.int32)).astype(jnp.int64),
        "kept": jnp.sum(keep.astype(jnp.int32)).astype(jnp.int64),
        "dropped": jnp.sum((valid & ~mom_ok).astype(jnp.int32)
                           ).astype(jnp.int64),
    }


_SUM_KEYS = ("total", "mom_proposals", "mom_acceptances", "drawn", "kept",
             "dropped")


def _finalize_device(out: dict, setup: SamplerSetup, cfg: Config,
                     pad: int | None = None, lean: bool = False,
                     pack: tuple | None = None) -> dict:
    """Compact to the kept rows (optional) and reconstruct the lab-frame
    Milne kinematics.  Runs AFTER the keep decision so the boost, rapidity
    draw and (t, z) transcendentals cost only the kept width (~30% of the
    envelope); compaction also shrinks the device->host transfer.  Traceable
    (used inside shard_map); `_finalize_jit` is the jitted entry.

    With ``pad`` (static), the kept rows are gathered into a pad-length
    buffer via a scatter-built compaction index: jnp.nonzero(size=pad)
    lowers ~12x slower (890 ms vs 72 ms at 1e7 lanes on v5e), and packed
    field-major takes replace per-field takes (1.1 s -> ~0.1 s).

    ``lean`` (static) emits only the columns the streaming particle-list
    consumers transfer (ChunkCollector._XFER_LRF): the LRF momentum plus
    ids.  Since round 5, lean mode ALSO skips the lab boost, the rapidity
    draw and the cell-flow gather entirely -- the streaming collector
    reconstructs the lab kinematics on the host (numpy, overlapped with
    the compute of queued chunks like the rest of the export), so the
    device finalize is a pure compaction gather, and the device->host link
    drops to 20 B/row (3 f32 + i32 cell + 2 u16 ids) -- or 16 B/row when
    ``pack`` is set (see below).  The histogram binner needs device-side
    lab kinematics and keeps lean=False.

    ``pack`` (static; streaming lean paths only) is a (cell_bits, sp_bits,
    ev_bits) tuple: the three id columns ride ONE u32 `ids_packed` column
    (cell | sp << cell_bits | event_rel << cell_bits+sp_bits), cutting the
    link to 16 B/row AND the compaction gather from 6 rows to 4.  The
    caller only sets it when every id range fits (bits sum <= 32, always
    at production scale: 1e5 cells=17b + 493 species=9b + <=64 events per
    chunk=6b); the event id is CHUNK-RELATIVE -- the host collector adds
    the chunk's ev0 after unpacking."""
    c = setup.cells
    if lean:
        # pure kept-row compaction: no boost, no rapidity, no cell gather
        if pad is None:
            keep = out["keep"]
            event, sp_idx, cell_idx = (out["event"], out["sp_idx"],
                                       out["cell_idx"])
            px, py, pz = out["px"], out["py"], out["pz"]
            if pack is not None:
                ids_packed = _pack_ids(cell_idx, sp_idx, event, pack)
        else:
            idx, _ = _compaction_index(out["keep"], pad)
            keep = jnp.arange(pad) < out["kept"]
            bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
            fb = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
            if pack is not None:
                # pack BEFORE the gather: 4 rows instead of 6
                ids = _pack_ids(out["cell_idx"], out["sp_idx"],
                                out["event"], pack)
                rows = [bc(out["px"]), bc(out["py"]), bc(out["pz"]),
                        jax.lax.bitcast_convert_type(ids, jnp.int32)]
                packed = jnp.take(jnp.stack(rows), idx, axis=1)
                px, py, pz = fb(packed[0]), fb(packed[1]), fb(packed[2])
                ids_packed = jax.lax.bitcast_convert_type(packed[3],
                                                          jnp.uint32)
            else:
                rows = [bc(out["px"]), bc(out["py"]), bc(out["pz"]),
                        out["event"].astype(jnp.int32),
                        out["sp_idx"].astype(jnp.int32),
                        out["cell_idx"].astype(jnp.int32)]
                packed = jnp.take(jnp.stack(rows), idx, axis=1)
                px, py, pz = fb(packed[0]), fb(packed[1]), fb(packed[2])
                event, sp_idx, cell_idx = packed[3], packed[4], packed[5]
        res = {k: v for k, v in out.items()
               if k in _SUM_KEYS or k in ("overflow", "mcid", "mass_tab")}
        if pack is not None:
            res.update(keep=keep, ids_packed=ids_packed, px=px, py=py, pz=pz)
        else:
            # the species table is always < 65536 rows: u16 halves the
            # transferred bytes of this column
            res.update(keep=keep, event=event,
                       sp_idx=sp_idx.astype(jnp.uint16),
                       cell_idx=cell_idx, px=px, py=py, pz=pz)
        res.update(
            # (cells,)-tables for the host-side boost + positions; the
            # HOST wrappers attach the "lrf" marker + rapidity metadata
            # (a Python flag cannot ride a shard_map output dict)
            cell_tau=c.tau, cell_x=c.x, cell_y=c.y_pos, cell_eta=c.eta,
            cell_ux=c.ux, cell_uy=c.uy, cell_un=c.un)
        return res

    k_rap = out["_k_rap"]
    # the 2+1d rapidity draw is made at the PRE-compaction capacity width
    # and compacted with the kept rows, so a hadron's rapidity depends only
    # on its capacity-lane id -- never on the (statistically chosen,
    # bucketed) compaction pad.  JAX's counter-based bits make the
    # capacity-width stream identical whether or not a pad is applied, so
    # the same seed gives bitwise-identical kinematics across pad choices
    # (tests/test_sampler.py::test_sampler_analytic_pad_matches_measured).
    rap_u = jax.random.uniform(k_rap, out["keep"].shape,
                               dtype=jnp.float32) \
        if cfg.dimension == 2 else None
    if pad is None:
        keep = out["keep"]
        event, sp_idx, cell_idx = out["event"], out["sp_idx"], out["cell_idx"]
        mass = out["mass"]
        E, px, py, pz = out["E"], out["px"], out["py"], out["pz"]
    else:
        idx, _ = _compaction_index(out["keep"], pad)
        keep = jnp.arange(pad) < out["kept"]
        # ONE packed take for the float AND int columns (f32 rows bitcast
        # to i32): the gather's index resolution is paid once for all rows
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        rows = [bc(out["E"]), bc(out["px"]), bc(out["py"]), bc(out["pz"]),
                out["event"].astype(jnp.int32),
                out["sp_idx"].astype(jnp.int32),
                out["cell_idx"].astype(jnp.int32),
                bc(out["mass"])]
        if rap_u is not None:
            rows.append(bc(rap_u))
        pack = jnp.take(jnp.stack(rows), idx, axis=1)
        fb = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        E, px, py, pz = fb(pack[0]), fb(pack[1]), fb(pack[2]), fb(pack[3])
        event, sp_idx, cell_idx = pack[4], pack[5], pack[6]
        mass = fb(pack[7])
        if rap_u is not None:
            rap_u = fb(pack[-1])

    # cell position/flow at kept width: one packed field-major take
    crows = [c.tau, c.ux, c.uy, c.un, c.eta, c.x, c.y_pos]
    cpack = jnp.take(jnp.stack(crows), cell_idx, axis=1)
    tau_h, ux_h, uy_h, un_h, eta_cell = (cpack[i] for i in range(5))
    x_h, y_h = cpack[5], cpack[6]

    # boost LRF -> lab Milne (Momentum.cpp:14-31)
    basis_h = lrf.milne_basis(tau_h, ux_h, uy_h, un_h)
    ptau, plab_x, plab_y, pn = lrf.boost_momentum_to_lab(
        basis_h, tau_h, ux_h, uy_h, un_h, E, px, py, pz)

    if cfg.dimension == 2:
        y_max = cfg.y_cut
        rap = (y_max * (2.0 * rap_u - 1.0)).astype(ptau.dtype)
        sinhy = jnp.sinh(rap)
        coshy = jnp.sqrt(1.0 + sinhy * sinhy)
        tau_pn = tau_h * pn
        mT = jnp.sqrt(jnp.maximum(ptau * ptau - tau_pn * tau_pn, 1e-300))
        sinheta = (ptau * sinhy - tau_pn * coshy) / mT
        eta_p = jnp.arcsinh(sinheta)
        pz_lab = mT * sinhy
        E_lab = mT * coshy
    else:
        sinheta = jnp.sinh(eta_cell)
        cosheta = jnp.sqrt(1.0 + sinheta * sinheta)
        pz_lab = tau_h * pn * cosheta + ptau * sinheta
        E_lab = jnp.sqrt(mass * mass + plab_x**2 + plab_y**2
                         + pz_lab**2)
        rap = 0.5 * jnp.log((E_lab + pz_lab) / (E_lab - pz_lab))
        eta_p = eta_cell

    res = {k: v for k, v in out.items()
           if k in _SUM_KEYS or k in ("overflow", "mcid", "mass_tab")}
    res.update(
        keep=keep, event=event, sp_idx=sp_idx, cell_idx=cell_idx,
        eta=eta_p, px=plab_x, py=plab_y, pz=pz_lab,
        # (cells,)-table references: the streaming collector transfers
        # per-hadron cell_idx + these small tables instead of the three
        # per-hadron position columns (device->host link traffic)
        cell_tau=c.tau, cell_x=c.x, cell_y=c.y_pos)
    if not lean:
        res.update(
            mass=mass, tau=tau_h, x=x_h, y=y_h,
            t=tau_h * jnp.cosh(eta_p), z=tau_h * jnp.sinh(eta_p),
            E=E_lab, rapidity=rap)
    return res


_finalize_jit = jax.jit(_finalize_device, static_argnames=("cfg", "pad",
                                                           "lean", "pack"))


@partial(jax.jit, static_argnames=("cfg", "capacity", "pad", "lean",
                                   "species_draw", "ids16", "pack"))
def _sample_finalize_jit(setup: SamplerSetup, species: SpeciesArrays,
                         mcid, tab_f, tab_i, cell_rate, key, cfg: Config,
                         capacity: int, n_events, ev0, pad: int | None,
                         lean: bool, species_draw: str,
                         ids16: bool = False, pack: tuple | None = None):
    """Hadron pipeline + kept-row finalize fused into ONE device program.

    The two-program split (sample, then finalize with a host-chosen pad)
    materializes ~9 capacity-width arrays to HBM between the programs --
    ~0.7 GB of round-trip traffic per 1e7-hadron chunk, and (in lean mode)
    columns XLA could otherwise dead-code-eliminate.  The pipelined chunk
    stream knows the pad BEFORE dispatching (chunk 0 fixes it), so every
    chunk after the first runs fused; chunk 0 and overflow retries keep
    the split path (`_finalize_chunk` needs the measured kept count)."""
    out = _sample_hadrons_jit(setup, species, mcid, tab_f, tab_i,
                              cell_rate, key, cfg, capacity, n_events,
                              species_draw=species_draw)
    fin = _finalize_device(out, setup, cfg, pad=pad, lean=lean, pack=pack)
    if "event" in fin:  # packed lean rides event inside ids_packed
        fin["event"] = fin["event"] + ev0
        if lean and ids16:
            # campaign has <= 65535 events (static): u16 halves the event
            # column's device->host bytes
            fin["event"] = fin["event"].astype(jnp.uint16)
    return fin


def _finalize_chunk(out: dict, setup: SamplerSetup, cfg: Config,
                    lean: bool = False, pack: tuple | None = None) -> dict:
    """Host-side dispatcher: pick the compaction pad and finalize.

    ``pad`` is a STATIC shape, so it is bucketed (8192 small / 1<<20 at
    production scale) to reuse one compiled program across chunks whose
    kept counts differ only statistically."""
    kept = int(out["kept"])
    cap = out["keep"].shape[0]
    bucket = _PAD_BUCKET_SMALL if cap < (4 << 20) else _PAD_BUCKET_LARGE
    pad = max(bucket, -(-kept // bucket) * bucket)
    if pad >= cap:
        fin = _finalize_jit(out, setup, cfg, None, lean, pack)
    else:
        fin = _finalize_jit(out, setup, cfg, pad, lean, pack)
        fin["rows_compacted"] = True
    fin["kept_i"] = kept
    return fin


def _concat_chunks(chunks: list[dict]) -> dict:
    """Merge per-chunk sampler outputs into one flat-hadron dict."""
    out = {}
    for k in chunks[0]:
        if k in _SUM_KEYS:
            out[k] = sum(ch[k] for ch in chunks)
        elif k == "overflow":
            out[k] = False
        elif k in ("mcid", "mass_tab", "cell_tau", "cell_x",
                   "cell_y"):  # (S,)/(cells,) tables, identical per chunk
            out[k] = chunks[0][k]
        elif k in ("ev0", "n_ev", "kept_i",
                   "rows_compacted"):  # per-chunk host metadata
            continue
        else:
            out[k] = jnp.concatenate([ch[k] for ch in chunks])
    return out


def sample_particles(surf, species_table: SpeciesTable, chosen_idx,
                     df_data: DeltafData, cfg: Config, laguerre: GaussLaguerre,
                     n_events: int, seed: int | None = None,
                     capacity: int | None = None, report=None,
                     chunk_consumer=None, lean: bool = False,
                     mean_kept_1ev: float | None = None):
    """Run the sampler; returns the raw per-hadron dict (device arrays).

    With ``chunk_consumer`` (a callable taking one finalized chunk dict),
    chunks are streamed to it instead of concatenated, and only the summed
    scalar diagnostics are returned -- the histogram path binning each
    chunk on device never materializes the campaign-wide hadron axis.

    ``mean_kept_1ev`` (the driver passes compute_total_yield's per-event
    mean, which the keep-rejection reproduces in expectation) sizes the
    kept-row compaction pad ANALYTICALLY, so chunk 0 dispatches through the
    same fused sample+finalize program as every other chunk -- without it,
    chunk 0 must run the unfused two-program path synchronously just to
    MEASURE a kept count for the pad, which adds a whole extra program
    compile + first-run + host sync to every campaign (the dominant fixed
    cost at production scale: the 33M-drawn north-star campaign is ~3.4 s
    of steady-state device compute).  A pad overrun (estimate low by >25%
    + 6 sigma) is caught by deferred validation and that chunk reruns on
    the measured-pad path, so a biased estimate degrades to the old
    behavior instead of failing.

    If the Poisson total overflows the flat-hadron capacity (a >6-sigma
    fluctuation, or a caller-forced small capacity), the run is retried with
    the capacity grown to the drawn total -- the RNG key is unchanged, so
    the Poisson counts are identical to a right-sized first attempt (the
    per-hadron rejection draws are counter-indexed over the resized lane
    axis, so the sampled kinematics are statistically -- not bitwise --
    equivalent).  ``report`` (report.RunReport) collects the
    sampling-efficiency counters the reference prints
    (ParticleSampler.cpp:1133).
    """
    if cfg.df_mode == 5:
        from .sampler_famod import prepare_sampler_famod
        setup, species = prepare_sampler_famod(surf, species_table, chosen_idx,
                                               cfg)
    else:
        setup, species = prepare_sampler(surf, species_table, chosen_idx,
                                         df_data, cfg, laguerre)
    mcid = jnp.asarray(species_table.mc_id[chosen_idx])

    y_max = cfg.y_cut if cfg.dimension == 2 else 0.5

    if seed is None:
        seed = cfg.sampler_seed if cfg.sampler_seed >= 0 else np.random.SeedSequence().entropy
    key = jax.random.PRNGKey(int(seed) & 0x7FFFFFFF)

    # the whole per-hadron pipeline runs in f32: the sampled kinematics are
    # statistical anyway, and emulated-f64 transcendentals (boost, rapidity
    # reconstruction) dominate the wall clock on TPU otherwise.  The Poisson
    # rates keep f64 (exact means for the yield draw).  The cast runs as ONE
    # jitted program: an eager per-array tree_map dispatches ~30 separate
    # convert programs through the device queue and cost 15 s of the 25 s
    # campaign preamble at 1e5 cells (measured through the remote tunnel).
    f32 = jnp.float32
    rates64 = setup.rates
    setup = dataclasses.replace(_cast_f32_jit(setup), rates=rates64)
    species = _cast_f32_jit(species)

    # per-hadron species-draw tables: one campaign-level host build
    # (Walker alias, see _species_alias)
    cdf_flat, cdf_bucket, cell_rate = _species_alias(setup.rates)

    # campaign mean from the CDF's per-cell total rate: the same reduction
    # off setup.rates directly is an emulated-f64 45M-lane pass (~5 s steady
    # on v5e); this f32 form is ~1e-6 relative, plenty for chunk/capacity
    # sizing (n_events itself comes from compute_total_yield's f64 path).
    # The tilted envelope (df 1/2) shrinks the DRAWN mean by the per-cell
    # c factor, so chunks fit ~1.4x more events at the same capacity.
    _tilt = _envelope_tilt_cells(setup, cfg)
    _env_col = (2.0 * y_max * setup.ds_max).astype(f32)
    if _tilt is not None:
        _env_col = _env_col * _tilt
    mean_1ev = float(jnp.sum(cell_rate * _env_col))
    mean_total = mean_1ev * n_events

    # event chunking: per-hadron device buffers scale with the flat-hadron
    # capacity, so a 1e7-hadron campaign is run as chunks of
    # <= sampler_chunk_hadrons envelope hadrons (one compiled program reused;
    # chunk Poisson draws on independent fold_in streams sum to the same
    # campaign statistics).  A caller-forced capacity keeps one chunk.
    events_per_chunk = n_events
    if capacity is None and mean_total > cfg.sampler_chunk_hadrons \
            and n_events > 1:
        events_per_chunk = max(1, int(cfg.sampler_chunk_hadrons
                                      / max(mean_1ev, 1.0)))
    n_chunks = -(-n_events // events_per_chunk)

    def chunk_capacity(n_ev):
        m = mean_1ev * n_ev
        return int(m * 1.2 + 6.0 * np.sqrt(max(m, 1.0)) + 1024)

    if capacity is None:
        capacity = chunk_capacity(events_per_chunk)

    retry_box = [0]

    def chunk_span(c):
        ev0 = c * events_per_chunk
        return ev0, min(events_per_chunk, n_events - ev0)

    def run_chunk_synced(c):
        """One chunk, synchronously validated (overflow retry loop)."""
        ev0, n_ev = chunk_span(c)
        k = key if n_chunks == 1 else jax.random.fold_in(key, c)
        cap = capacity
        while True:
            out = _sample_hadrons_jit(setup, species, mcid, cdf_flat,
                                      cdf_bucket, cell_rate, k, cfg,
                                      cap, n_ev, species_draw="alias")
            if not bool(out["overflow"]):
                break
            # grow to the actual Poisson total (known exactly from the
            # failed attempt: the counts depend only on the key and
            # rates) + margin
            total = int(out["total"])
            cap = total + max(total // 64, 1024)
            retry_box[0] += 1
            print(f"sampler capacity overflow (total {total}); retrying "
                  f"with capacity {cap}", flush=True)
            if retry_box[0] > 4 * n_chunks:
                raise RuntimeError("sampler capacity overflow persists "
                                   f"after {retry_box[0]} retries "
                                   f"(total {total})")
        if n_chunks > 1 and pack is None:
            # packed lean chunks keep CHUNK-RELATIVE event ids (they must
            # fit ev_bits); the host collector adds ev0 after unpacking
            out["event"] = out["event"] + ev0
        fin = _finalize_chunk(out, setup, cfg, lean, pack)
        if lean and ids16 and "event" in fin:
            # same u16 cast as the pipelined _sample_finalize_jit path, so
            # a campaign stream never mixes event-id dtypes across chunks
            # (healed/synced chunks must agree with fused ones)
            fin["event"] = fin["event"].astype(jnp.uint16)
        fin["ev0"], fin["n_ev"] = ev0, n_ev
        if lean:
            fin.update(_rap_meta(cfg, seed, ev0))
            if pack is not None:
                fin["pack_bits"] = pack
        return fin

    bucket = _PAD_BUCKET_SMALL if capacity < (4 << 20) else _PAD_BUCKET_LARGE
    # u16 event ids on the device->host link whenever the campaign fits
    ids16 = n_events <= 65535
    # streaming lean export: pack (cell, species, event_rel) into ONE u32
    # column when the id ranges fit -- 16 B/row on the device->host link
    # (3 f32 + u32) instead of 20, and a 4-row compaction gather.  Only for
    # consumer-streamed campaigns: the collector knows how to unpack.
    pack = None
    if lean and chunk_consumer is not None:
        cb = max(int(setup.cells.n_padded) - 1, 1).bit_length()
        sb = max(int(np.asarray(mcid).shape[0]) - 1, 1).bit_length()
        eb = max(events_per_chunk - 1, 1).bit_length()
        if cb + sb + eb <= 32:
            pack = (cb, sb, eb)

    def bucketed_pad(kept_expect):
        """_PAD_MARGIN + 6 sigma over an expected/measured chunk kept
        count (chunk kepts are iid Poisson-binomial; overrun is detected
        and the chunk redone), rounded to the pad bucket so one compiled
        program covers statistically-varying chunks."""
        p = int(kept_expect * _PAD_MARGIN
                + 6.0 * np.sqrt(max(kept_expect, 1.0)) + 1024)
        return min(max(bucket, -(-p // bucket) * bucket), capacity)

    def iter_chunks():
        """Pipelined campaign: all chunks dispatch the fused
        sample+finalize program with deferred validation through a bounded
        in-flight window -- no host sync between dispatches, so the device
        queue stays full and the consumer's device->host transfers (and any
        streaming format/write work) overlap the compute of the queued
        chunks (a per-chunk sync serializes compute and transfer and costs
        ~25% of the stage at production scale).  The compaction pad comes
        from ``mean_kept_1ev`` when the caller knows the yield (the
        production driver always does); otherwise chunk 0 runs the unfused
        two-program path synchronously and its measured kept count fixes
        the pad.  The window bounds peak HBM to ~window finalized chunks
        (~13 pad-width arrays each) instead of the whole campaign; consumed
        chunks drop their last reference at the next popleft."""
        if mean_kept_1ev is not None:
            pad_box = [bucketed_pad(mean_kept_1ev * events_per_chunk)]
            start = 0
            first = None
        else:
            first = run_chunk_synced(0)
            if n_chunks == 1:
                yield first
                return
            pad_box = [bucketed_pad(int(first["kept"]))]
            start = 1

        import collections
        window = 4
        pending = collections.deque()

        def dispatch(c):
            ev0, n_ev = chunk_span(c)
            k = key if n_chunks == 1 else jax.random.fold_in(key, c)
            pad = pad_box[0]
            fin = _sample_finalize_jit(setup, species, mcid, cdf_flat,
                                       cdf_bucket, cell_rate, k, cfg,
                                       capacity, n_ev, ev0,
                                       pad if pad < capacity else None,
                                       lean, "alias", ids16=ids16,
                                       pack=pack)
            fin["ev0"], fin["n_ev"], fin["_pad"] = ev0, n_ev, pad
            fin["rows_compacted"] = pad < capacity
            if lean:
                fin.update(_rap_meta(cfg, seed, ev0))
                if pack is not None:
                    fin["pack_bits"] = pack
            pending.append((c, fin))

        nxt = start
        while nxt < n_chunks and len(pending) < window:
            dispatch(nxt)
            nxt += 1
        if first is not None:
            yield first
        while pending:
            c, fin = pending.popleft()
            # deferred validation: a 6-sigma Poisson overflow or a pad
            # overrun reruns that chunk synchronously (same key -> same
            # Poisson counts); the measured kept count then raises the pad
            # for the chunks not yet dispatched
            kept_i = int(fin["kept"])
            if bool(fin["overflow"]) or kept_i > fin["_pad"]:
                retry_box[0] += 1
                print(f"chunk {c}: deferred validation failed "
                      f"(kept {kept_i} / pad {fin['_pad']}); "
                      f"rerunning", flush=True)
                fin = run_chunk_synced(c)
                pad_box[0] = max(pad_box[0],
                                 bucketed_pad(int(fin["kept"])))
            else:
                # kept rows sit ascending in [0:kept) of the pad buffer:
                # consumers slice instead of masking (no keep column on
                # the device->host link)
                fin["kept_i"] = kept_i
            # top off the window BEFORE yielding: the device computes the
            # refill while the consumer transfers/formats this chunk
            if nxt < n_chunks:
                dispatch(nxt)
                nxt += 1
            fin.pop("_pad", None)
            yield fin

    def fill_report(out):
        retries = retry_box[0]
        if report is not None:
            report.n_cells = surf.n_cells
            report.mom_proposals = int(out["mom_proposals"])
            report.mom_acceptances = int(out["mom_acceptances"])
            report.hadrons_drawn = int(out["drawn"])
            report.hadrons_kept = int(out["kept"])
            report.dropped_lanes = int(out["dropped"])
            report.sampler_capacity_retries = retries
            if cfg.df_mode in (3, 4, 5):
                report.record_breakdown(setup.breaks_down, setup.cells.tau,
                                        setup.cells.mask)

    if chunk_consumer is not None:
        # stream chunks to the consumer (e.g. per-chunk histogram binning:
        # bucketed pads reuse cached programs, and no concatenated
        # campaign-wide hadron axis is ever materialized); return summed
        # diagnostics only
        diags = None
        for ch in iter_chunks():
            chunk_consumer(ch)
            d = {kk: ch[kk] for kk in _SUM_KEYS}
            diags = d if diags is None else \
                {kk: diags[kk] + d[kk] for kk in _SUM_KEYS}
        fill_report(diags)
        return diags

    chunks = list(iter_chunks())
    out = chunks[0] if n_chunks == 1 else _concat_chunks(chunks)
    fill_report(out)
    return out


class ChunkCollector:
    """Streaming ``chunk_consumer`` for the particle-list path: converts
    each finalized chunk to host numpy AS IT ARRIVES, so the device->host
    transfer of chunk i overlaps the on-device compute of the chunks still
    queued (the post-hoc to_particle_list conversion serializes transfer
    after all compute).  ``rapidity`` is not transferred (the writers don't
    use it), and neither are the derivable columns: mass = mass_tab[sp_idx]
    (exact), tau/x/y = cell_table[cell_idx] (exact: the same f32 gather the
    device would do), t/z = tau cosh/sinh(eta) and E = sqrt(m^2 + p^2)
    (f32-rounding equivalent to the device values) are reconstructed
    host-side -- 7 transferred hadron columns instead of 13 (the three
    per-cell position columns became ONE i32 cell_idx + a 1.2 MB cell
    table fetched once per campaign), which matters both for the
    device->host link and for HBM read traffic in the finalize.

    The link is the EXPOSED cost of the production particle-list stage
    (chunk compute dropped to ~3.4 s while the transfer is 13-20 s at 1e7
    hadrons through the tunnel), so bytes/row is minimized further: event
    and sp_idx ride as u16 when their ranges fit (always, for sp_idx), and
    compacted chunks skip the keep column entirely -- the kept rows sit
    ascending in [0:kept_i) and are SLICED host-side.  In lean (LRF) mode
    the ids additionally ride one u32 `ids_packed` column when the chunk
    carries "pack_bits" (see _pack_ids): 16 B/hadron-row (3 f32 + u32),
    down from 20 (3 f32 + i32 + 2 u16), 24 (r4) and 29 (r3)."""

    _XFER = ("event", "sp_idx", "cell_idx", "eta", "px", "py", "pz")
    _XFER_LRF = ("event", "sp_idx", "cell_idx", "px", "py", "pz")
    _CELL_LRF = ("cell_tau", "cell_x", "cell_y", "cell_eta", "cell_ux",
                 "cell_uy", "cell_un")
    _FIELDS = ("event", "sp_idx", "tau", "x", "y", "eta", "px", "py", "pz",
               "mass", "t", "z", "E")

    def __init__(self):
        self._parts = []
        self._mcid_table = None
        self._cell_tables = None

    def __call__(self, ch: dict) -> None:
        # compacted chunks put the kept rows ascending in [0:kept_i): slice
        # instead of transferring + applying the pad-width keep mask (the
        # keep column is 1 byte/row of pure link traffic)
        lrf_mode = bool(ch.get("lrf", False))
        pack = ch.get("pack_bits")  # u32-packed (cell, sp, event_rel) ids
        if pack is not None:
            xfer = ("ids_packed", "px", "py", "pz")
        else:
            xfer = self._XFER_LRF if lrf_mode else self._XFER
        sliceable = ch.get("rows_compacted", False) and "kept_i" in ch
        fields = xfer + (("mcid", "mass_tab") if sliceable
                         else ("keep", "mcid", "mass_tab"))
        host = jax.device_get({f: ch[f] for f in fields})
        if self._cell_tables is None:
            ctf = self._CELL_LRF if lrf_mode else ("cell_tau", "cell_x",
                                                   "cell_y")
            self._cell_tables = jax.device_get(
                {f: ch[f] for f in ctf})
        self._mcid_table = host["mcid"]
        if sliceable:
            kept = ch["kept_i"]
            part = {f: host[f][:kept] for f in xfer}
        else:
            keep = host["keep"]
            part = {f: host[f][keep] for f in xfer}
        if pack is not None:
            ci, sp, ev = unpack_ids(part.pop("ids_packed"), pack,
                                    ev0=int(ch.get("ev0", 0)))
            part["cell_idx"] = ci.astype(np.int32)
            part["sp_idx"] = sp.astype(np.uint16)
            # host-RAM columns keep ONE dtype for the whole campaign
            # (never flips when ev0 crosses a width boundary mid-stream)
            part["event"] = ev.astype(np.int32)
        ct = self._cell_tables
        dtype = part["px"].dtype
        ci = part.pop("cell_idx")
        part["tau"] = np.asarray(ct["cell_tau"]).astype(dtype)[ci]
        part["x"] = np.asarray(ct["cell_x"]).astype(dtype)[ci]
        part["y"] = np.asarray(ct["cell_y"]).astype(dtype)[ci]
        part["mass"] = np.asarray(host["mass_tab"]).astype(dtype)[
            part["sp_idx"]]
        if lrf_mode:
            self._boost_lrf_to_lab(part, ct, ci, ch, dtype)
        part["t"] = part["tau"] * np.cosh(part["eta"])
        part["z"] = part["tau"] * np.sinh(part["eta"])
        part["E"] = np.sqrt(part["mass"] ** 2 + part["px"] ** 2
                            + part["py"] ** 2 + part["pz"] ** 2)
        self._parts.append(part)

    def _boost_lrf_to_lab(self, part, ct, ci, ch, dtype):
        """Lab kinematics from the LRF momenta + cell flow, on the host
        (numpy): the Milne-basis boost of _finalize_device / Momentum.cpp:
        14-31 plus the 2+1d rapidity draw.  Runs in the consumer thread,
        overlapped with the device compute of queued chunks exactly like
        the file format/write work -- removing it from the device shrank
        the finalize phase to a pure compaction gather and the link to
        16 B/row (packed ids; 20 unpacked).  The rapidity stream is seeded
        per (campaign seed, ev0),
        so results are independent of pad/capacity choices and chunk
        scheduling."""
        tau = part["tau"]
        ux = np.asarray(ct["cell_ux"]).astype(dtype)[ci]
        uy = np.asarray(ct["cell_uy"]).astype(dtype)[ci]
        un = np.asarray(ct["cell_un"]).astype(dtype)[ci]
        eta_c = np.asarray(ct["cell_eta"]).astype(dtype)[ci]
        E = np.sqrt(part["mass"] ** 2 + part["px"] ** 2 + part["py"] ** 2
                    + part["pz"] ** 2)
        px, py, pz = part["px"], part["py"], part["pz"]
        # Milne tetrad (physics/lrf.milne_basis, numpy form)
        tun = tau * un
        ut = np.sqrt(1.0 + ux * ux + uy * uy + tun * tun)
        uperp = np.sqrt(ux * ux + uy * uy)
        utperp = np.sqrt(1.0 + ux * ux + uy * uy)
        sinhL = tun / utperp
        coshL = ut / utperp
        safe = uperp > 1.0e-5
        inv_up = np.where(safe, 1.0 / np.where(safe, uperp, 1.0), 0.0)
        Xt = uperp * coshL
        Xx = np.where(safe, utperp * ux * inv_up, 1.0)
        Xy = np.where(safe, utperp * uy * inv_up, 0.0)
        Xn = uperp * sinhL / tau
        Yx = np.where(safe, -uy * inv_up, 0.0)
        Yy = np.where(safe, ux * inv_up, 1.0)
        Zt = sinhL
        Zn = coshL / tau
        ptau = E * ut + px * Xt + pz * Zt
        plx = E * ux + px * Xx + py * Yx
        ply = E * uy + px * Xy + py * Yy
        pn = E * un + px * Xn + pz * Zn

        if int(ch.get("dimension", 2)) == 2:
            y_max = float(ch.get("y_max", 5.0))
            rng = np.random.default_rng(int(ch.get("rap_seed", 0)))
            rap = (y_max * (2.0 * rng.random(len(ptau), dtype=np.float32)
                            - 1.0)).astype(dtype)
            sinhy = np.sinh(rap)
            coshy = np.sqrt(1.0 + sinhy * sinhy)
            tau_pn = tau * pn
            mT = np.sqrt(np.maximum(ptau * ptau - tau_pn * tau_pn, 1e-30))
            part["eta"] = np.arcsinh((ptau * sinhy - tau_pn * coshy) / mT)
            part["pz"] = mT * sinhy
        else:
            sinheta = np.sinh(eta_c)
            cosheta = np.sqrt(1.0 + sinheta * sinheta)
            part["pz"] = tau * pn * cosheta + ptau * sinheta
            part["eta"] = eta_c
        part["px"], part["py"] = plx, ply

    def particle_list(self) -> ParticleList:
        cat = {f: np.concatenate([p[f] for p in self._parts])
               for f in self._FIELDS}
        n = cat["event"].shape[0]
        return ParticleList(
            valid=np.ones(n, dtype=bool),
            event=cat["event"],
            mcid=self._mcid_table[cat["sp_idx"]],
            tau=cat["tau"], x=cat["x"], y=cat["y"], eta=cat["eta"],
            t=cat["t"], z=cat["z"], E=cat["E"],
            px=cat["px"], py=cat["py"], pz=cat["pz"], mass=cat["mass"])


def to_particle_list(out) -> ParticleList:
    keep = np.asarray(out["keep"])
    # out["mcid"] is the (S,) species table; resolve per-hadron ids on host
    mcid = np.asarray(out["mcid"])[np.asarray(out["sp_idx"])]
    return ParticleList(
        valid=keep,
        event=np.asarray(out["event"]),
        mcid=mcid,
        tau=np.asarray(out["tau"]),
        x=np.asarray(out["x"]),
        y=np.asarray(out["y"]),
        eta=np.asarray(out["eta"]),
        t=np.asarray(out["t"]),
        z=np.asarray(out["z"]),
        E=np.asarray(out["E"]),
        px=np.asarray(out["px"]),
        py=np.asarray(out["py"]),
        pz=np.asarray(out["pz"]),
        mass=np.asarray(out["mass"]),
    )
