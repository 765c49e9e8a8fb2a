"""Device-resident per-cell arrays for the Cooper-Frye engines.

Flattens the freezeout surface into padded jnp arrays, completes the shear
tensor / diffusion time components, evaluates the per-cell delta-f
coefficients, and computes the cell validity mask.  This replaces the
reference's per-cell scalar preamble repeated inside its OpenMP loops
(MomentumSpectra.cpp:109-246, ParticleSampler.cpp:680-874) with one
vectorized pass over all cells.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..io.surface import SurfaceData
from ..physics import lrf
from ..physics.deltaf import DeltafData, DeltafCoefficients


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CellArrays:
    """Padded per-cell arrays (length rounded up to a block multiple).

    ``mask`` is 1.0 for real cells with u.dsigma > 0 (the reference skips
    u.dsigma <= 0 cells, MomentumSpectra.cpp:132) and 0.0 for padding.
    """

    mask: jnp.ndarray      # 1 for real cells with u.dsigma > 0
    pad_mask: jnp.ndarray  # 1 for all real cells (polarization keeps u.dsigma <= 0)
    tau: jnp.ndarray
    x: jnp.ndarray
    y_pos: jnp.ndarray
    eta: jnp.ndarray
    dat: jnp.ndarray
    dax: jnp.ndarray
    day: jnp.ndarray
    dan: jnp.ndarray
    ux: jnp.ndarray
    uy: jnp.ndarray
    un: jnp.ndarray
    ut: jnp.ndarray
    T: jnp.ndarray
    P: jnp.ndarray
    E: jnp.ndarray
    # completed shear tensor (zeros when shear is off)
    pitt: jnp.ndarray
    pitx: jnp.ndarray
    pity: jnp.ndarray
    pitn: jnp.ndarray
    pixx: jnp.ndarray
    pixy: jnp.ndarray
    pixn: jnp.ndarray
    piyy: jnp.ndarray
    piyn: jnp.ndarray
    pinn: jnp.ndarray
    bulkPi: jnp.ndarray
    muB: jnp.ndarray
    alphaB: jnp.ndarray
    nB: jnp.ndarray
    Vt: jnp.ndarray
    Vx: jnp.ndarray
    Vy: jnp.ndarray
    Vn: jnp.ndarray
    baryon_enthalpy_ratio: jnp.ndarray
    # thermal vorticity (zeros unless mode 5 surface)
    wtx: jnp.ndarray
    wty: jnp.ndarray
    wtn: jnp.ndarray
    wxy: jnp.ndarray
    wxn: jnp.ndarray
    wyn: jnp.ndarray

    @property
    def n_padded(self) -> int:
        return self.tau.shape[0]


def _pad(a: np.ndarray, n_pad: int, fill: float = 0.0) -> np.ndarray:
    if n_pad == 0:
        return a
    return np.concatenate([a, np.full(n_pad, fill, dtype=a.dtype)])


from ..utils import cpu_device as _cpu_device, host_prep  # noqa: F401


def prepare_cells(surf: SurfaceData, cfg: Config,
                  block: int | None = None) -> CellArrays:
    """Build padded per-cell arrays from a surface.

    All preparation math runs on the host CPU backend (tiny data; on the
    remote-TPU tunnel each small op would otherwise pay a ~second-scale
    compile round trip) — the arrays transfer to the accelerator when the
    compute kernels consume them.
    """
    cpu = _cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            return _prepare_cells_impl(surf, cfg, block)
    return _prepare_cells_impl(surf, cfg, block)


def _prepare_cells_impl(surf: SurfaceData, cfg: Config,
                        block: int | None = None) -> CellArrays:
    n = surf.n_cells
    block = block or cfg.cell_block
    n_padded = ((n + block - 1) // block) * block
    pad = n_padded - n

    tau = _pad(surf.tau, pad, 1.0)
    ux = _pad(surf.ux, pad)
    uy = _pad(surf.uy, pad)
    un = _pad(surf.un, pad)
    ut = np.sqrt(1.0 + ux**2 + uy**2 + (tau * un) ** 2)

    dat = _pad(surf.dat, pad)
    dax = _pad(surf.dax, pad)
    day = _pad(surf.day, pad)
    dan = _pad(surf.dan, pad)

    udsigma = ut * dat + ux * dax + uy * day + un * dan
    mask = (udsigma > 0.0).astype(np.float64)
    mask[n:] = 0.0
    pad_mask = np.ones(n_padded)
    pad_mask[n:] = 0.0

    # pad T with a safe temperature to keep exp() finite on padding cells
    T = _pad(surf.T, pad, 0.15)
    P = _pad(surf.P, pad, 0.08)
    E = _pad(surf.E, pad, 0.25)

    if cfg.include_shear_deltaf:
        pixx = _pad(surf.pixx, pad)
        pixy = _pad(surf.pixy, pad)
        pixn = _pad(surf.pixn, pad)
        piyy = _pad(surf.piyy, pad)
        piyn = _pad(surf.piyn, pad)
        pitt, pitx, pity, pitn, pinn = (np.asarray(v) for v in lrf.complete_shear(
            jnp.asarray(tau), jnp.asarray(ux), jnp.asarray(uy), jnp.asarray(un),
            jnp.asarray(pixx), jnp.asarray(pixy), jnp.asarray(pixn),
            jnp.asarray(piyy), jnp.asarray(piyn)))
    else:
        zeros = np.zeros(n_padded)
        pixx = pixy = pixn = piyy = piyn = zeros
        pitt = pitx = pity = pitn = pinn = zeros

    bulkPi = _pad(surf.bulkPi, pad) if cfg.include_bulk_deltaf else np.zeros(n_padded)

    if cfg.include_baryon and cfg.include_baryondiff_deltaf:
        muB = _pad(surf.muB, pad)
        nB = _pad(surf.nB, pad)
        Vx = _pad(surf.Vx, pad)
        Vy = _pad(surf.Vy, pad)
        Vn = _pad(surf.Vn, pad)
        Vt = (Vx * ux + Vy * uy + Vn * tau**2 * un) / ut
        alphaB = muB / T
        ratio = nB / (E + P)
    elif cfg.include_baryon:
        muB = _pad(surf.muB, pad)
        alphaB = muB / T
        nB = np.zeros(n_padded)
        Vt = Vx = Vy = Vn = np.zeros(n_padded)
        ratio = np.zeros(n_padded)
    else:
        muB = alphaB = nB = np.zeros(n_padded)
        Vt = Vx = Vy = Vn = np.zeros(n_padded)
        ratio = np.zeros(n_padded)

    j = jnp.asarray
    return CellArrays(
        mask=j(mask), pad_mask=j(pad_mask), tau=j(tau), x=j(_pad(surf.x, pad)), y_pos=j(_pad(surf.y, pad)),
        eta=j(_pad(surf.eta, pad)), dat=j(dat), dax=j(dax), day=j(day), dan=j(dan),
        ux=j(ux), uy=j(uy), un=j(un), ut=j(ut), T=j(T), P=j(P), E=j(E),
        pitt=j(pitt), pitx=j(pitx), pity=j(pity), pitn=j(pitn),
        pixx=j(pixx), pixy=j(pixy), pixn=j(pixn), piyy=j(piyy), piyn=j(piyn),
        pinn=j(pinn), bulkPi=j(bulkPi), muB=j(muB), alphaB=j(alphaB), nB=j(nB),
        Vt=j(Vt), Vx=j(Vx), Vy=j(Vy), Vn=j(Vn), baryon_enthalpy_ratio=j(ratio),
        wtx=j(_pad(surf.wtx, pad)), wty=j(_pad(surf.wty, pad)),
        wtn=j(_pad(surf.wtn, pad)), wxy=j(_pad(surf.wxy, pad)),
        wxn=j(_pad(surf.wxn, pad)), wyn=j(_pad(surf.wyn, pad)),
    )


def evaluate_cell_deltaf(cells: CellArrays, df_data: DeltafData,
                         cfg: Config) -> DeltafCoefficients:
    """Per-cell delta-f coefficients (with PTB bulk clamping where needed)."""
    bulkPi = cells.bulkPi
    if cfg.df_mode == 4:
        bulkPi = df_data.regulate_bulkPi_ptb(bulkPi, cells.P)
    return df_data.evaluate(cells.T, cells.muB, cells.E, cells.P, bulkPi)
