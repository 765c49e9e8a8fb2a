"""Synthetic freezeout-surface generator for validation tests.

Produces physically sensible cells (T inside the delta-f coefficient tables,
viscous stresses small relative to E+P) and can write them in the mode-1
CPU-VH file format (raw hbar=1 units) that both the reference binary and our
reader consume.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from is3d2_tpu.constants import hbarC
from is3d2_tpu.io.surface import SurfaceData


def make_surface(n_cells: int, seed: int = 0, dimension: int = 2,
                 include_baryon: bool = False, vorticity: bool = False,
                 shear_scale: float = 0.02, bulk_scale: float = 0.01,
                 flow_scale: float = 1.0) -> SurfaceData:
    rng = np.random.default_rng(seed)
    s = SurfaceData.zeros(n_cells)
    s.tau = rng.uniform(1.0, 10.0, n_cells)
    s.x = rng.uniform(-10.0, 10.0, n_cells)
    s.y = rng.uniform(-10.0, 10.0, n_cells)
    s.eta = np.zeros(n_cells) if dimension == 2 else rng.uniform(-2.0, 2.0, n_cells)

    # surface normal: mostly timelike with some spatial tilt
    s.dat = rng.uniform(0.05, 0.4, n_cells)
    s.dax = rng.uniform(-0.1, 0.1, n_cells)
    s.day = rng.uniform(-0.1, 0.1, n_cells)
    s.dan = np.zeros(n_cells) if dimension == 2 else rng.uniform(-0.02, 0.02, n_cells)

    s.ux = rng.uniform(-1.0, 1.0, n_cells) * flow_scale
    s.uy = rng.uniform(-1.0, 1.0, n_cells) * flow_scale
    s.un = np.zeros(n_cells) if dimension == 2 else rng.uniform(-0.05, 0.05, n_cells)

    s.T = rng.uniform(0.145, 0.165, n_cells)     # GeV, inside table range
    s.E = rng.uniform(0.22, 0.36, n_cells)       # GeV/fm^3
    s.P = rng.uniform(0.07, 0.11, n_cells)

    scale = shear_scale * (s.E + s.P)
    s.pixx = rng.uniform(-1.0, 1.0, n_cells) * scale
    s.pixy = rng.uniform(-1.0, 1.0, n_cells) * scale
    s.piyy = rng.uniform(-1.0, 1.0, n_cells) * scale
    if dimension == 3:
        s.pixn = rng.uniform(-1.0, 1.0, n_cells) * scale * 0.1
        s.piyn = rng.uniform(-1.0, 1.0, n_cells) * scale * 0.1

    s.bulkPi = rng.uniform(-1.0, 1.0, n_cells) * bulk_scale * (s.E + s.P)

    if include_baryon:
        s.muB = rng.uniform(0.0, 0.2, n_cells)
        s.nB = rng.uniform(0.0, 0.1, n_cells)
        s.Vx = rng.uniform(-0.01, 0.01, n_cells)
        s.Vy = rng.uniform(-0.01, 0.01, n_cells)
        s.Vn = np.zeros(n_cells) if dimension == 2 else rng.uniform(-0.002, 0.002, n_cells)

    if vorticity:
        for f in ("wtx", "wty", "wtn", "wxy", "wxn", "wyn"):
            setattr(s, f, rng.uniform(-0.05, 0.05, n_cells))
    return s


def make_eos_consistent(s: SurfaceData, species_table, laguerre) -> SurfaceData:
    """Overwrite (E, P) with the HRG equilibrium values at each cell's T so
    that (E, pl, pt) triples are reconstructible by the VAH solver.

    Cell-chunked: the eager (cells x species x quad) f64 broadcast
    materializes ~10 multi-GB intermediates at 1e5 cells, which thrashes the
    1-core host for minutes; one jitted fixed-shape program over 4096-cell
    chunks runs in seconds."""
    import jax
    import jax.numpy as jnp
    from is3d2_tpu.constants import two_pi2_hbarC3
    from is3d2_tpu.physics import thermal

    mask = species_table.mass > 0
    m_sp = jnp.asarray(species_table.mass[mask])
    g = jnp.asarray(species_table.gspin[mask])[None, :]
    sgn = jnp.asarray(species_table.sign[mask])[None, :]
    r2 = jnp.asarray(laguerre.roots[2])
    w2 = jnp.asarray(laguerre.weights[2])

    @jax.jit
    def chunk(T):
        mbar = m_sp[None, :] / T[:, None]
        zero = jnp.zeros_like(mbar)
        E_int = thermal.E_mod_integral(r2, w2, mbar, zero, sgn)
        P_int = thermal.P_mod_integral(r2, w2, mbar, zero, sgn)
        fact = T ** 4 / two_pi2_hbarC3
        return fact * (g * E_int).sum(axis=1), fact * (g * P_int).sum(axis=1)

    blk = 4096
    n = s.T.shape[0]
    n_pad = -(-n // blk) * blk
    T_pad = np.pad(s.T, (0, n_pad - n), constant_values=0.15)
    E_out, P_out = [], []
    for i in range(0, n_pad, blk):
        E_c, P_c = chunk(jnp.asarray(T_pad[i:i + blk]))
        E_out.append(np.asarray(E_c))
        P_out.append(np.asarray(P_c))
    s.E = np.concatenate(E_out)[:n]
    s.P = np.concatenate(P_out)[:n] / 3.0
    return s


def write_mode6(s: SurfaceData, path: str | Path,
                include_baryon: bool = False) -> None:
    """Write in mode-6 public-MUSIC format (the production surface format:
    dsigma/tau columns, tau-scaled u^eta/pi^{x eta}/pi^{y eta}, E/T/muB in
    fm^-4/fm^-1; see io/surface.py:_read_music and readindata.cpp:372-567)."""
    n = s.tau.shape[0]
    tau = s.tau
    z = np.zeros(n)
    ut = np.sqrt(1.0 + s.ux**2 + s.uy**2 + (tau * s.un) ** 2)
    cols = [tau, s.x, s.y, s.eta,
            s.dat / tau, s.dax / tau, s.day / tau, s.dan / tau,
            ut, s.ux, s.uy, s.un * tau,
            s.E / hbarC, s.T / hbarC, s.muB / hbarC, z, z,
            (s.E + s.P) / np.where(s.T != 0, s.T, 1.0),
            z, z, z, z,                      # pi^{tt,tx,ty,tn}: recomputed
            s.pixx / hbarC, s.pixy / hbarC, s.pixn * tau / hbarC,
            s.piyy / hbarC, s.piyn * tau / hbarC, z,
            s.bulkPi / hbarC]
    if include_baryon:
        cols += [s.nB, z, s.Vx, s.Vy, s.Vn * tau]
    np.savetxt(path, np.column_stack(cols), fmt="%.10e")


def write_mode1(s: SurfaceData, path: str | Path, include_baryon: bool = False,
                vorticity: bool = False) -> None:
    """Write in mode-1/5 CPU-VH format (raw hbar=1 units, one row per cell)."""
    cols = [s.tau, s.x, s.y, s.eta, s.dat, s.dax, s.day, s.dan,
            s.ux, s.uy, s.un,
            s.E / hbarC, s.T / hbarC, s.P / hbarC,
            s.pixx / hbarC, s.pixy / hbarC, s.pixn / hbarC,
            s.piyy / hbarC, s.piyn / hbarC, s.bulkPi / hbarC]
    if include_baryon:
        cols += [s.muB / hbarC, s.nB, s.Vx, s.Vy, s.Vn]
    if vorticity:
        cols += [s.wtx, s.wty, s.wtn, s.wxy, s.wxn, s.wyn]
    arr = np.column_stack(cols)
    np.savetxt(path, arr, fmt="%.16e")
