"""Delta-f coefficient evaluation.

Replaces Deltaf_Data (src/cpp/DeltafData.cpp:220-690): cubic-spline (muB = 0)
or bilinear (T, muB) interpolation of the Grad-14 / Chapman-Enskog coefficient
tables with temperature-power unscaling, the PTB (Jonah) lambda^2(Pi/Peq) and
z(Pi/Peq) splines, and the per-species equilibrium/bulk/diffusion densities
used by the sampler.

All evaluation paths are vectorized jnp code usable inside jit over the
freezeout-cell axis.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..constants import two_pi2_hbarC3
from ..io.deltaf_tables import DeltafTables
from ..io.pdg import SpeciesTable
from ..io.tables import GaussLaguerre
from ..io.surface import ThermoAverages
from ..utils import host_prep
from .spline import CubicSpline
from . import thermal


@dataclasses.dataclass
class DeltafCoefficients:
    """Per-cell coefficient arrays (the reference's deltaf_coefficients struct,
    readindata.h:93-119).  Unused entries for a given df_mode are zeros."""

    # Grad 14-moment
    c0: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    c3: jnp.ndarray
    c4: jnp.ndarray
    shear14: jnp.ndarray
    # Chapman-Enskog
    F: jnp.ndarray
    G: jnp.ndarray
    betabulk: jnp.ndarray
    betaV: jnp.ndarray
    betapi: jnp.ndarray
    # PTB (Jonah)
    lam: jnp.ndarray
    z: jnp.ndarray
    delta_lambda: jnp.ndarray
    delta_z: jnp.ndarray


class DeltafData:
    """Interpolators over the delta-f coefficient tables."""

    def __init__(self, tables: DeltafTables, df_mode: int, include_baryon: bool):
        self.tables = tables
        self.df_mode = df_mode
        self.include_baryon = include_baryon

        t = tables
        if not include_baryon:
            # cubic splines in T at muB = 0 (DeltafData.cpp:298-321)
            self._c0 = CubicSpline(t.T_grid, t.c0[0])
            self._c2 = CubicSpline(t.T_grid, t.c2[0])
            self._c3 = CubicSpline(t.T_grid, t.c3[0])
            self._F = CubicSpline(t.T_grid, t.F[0])
            self._betabulk = CubicSpline(t.T_grid, t.betabulk[0])
            self._betaV = CubicSpline(t.T_grid, t.betaV[0])
            self._betapi = CubicSpline(t.T_grid, t.betapi[0])
        else:
            # host numpy (see physics/spline.py note on device placement)
            self._grids = {name: np.asarray(getattr(t, name))
                           for name in ("c0", "c1", "c2", "c3", "c4",
                                        "F", "G", "betabulk", "betaV", "betapi")}
            self._T_min = float(t.T_grid[0])
            self._muB_min = float(t.muB_grid[0])
            self._dT = float(abs(t.T_grid[1] - t.T_grid[0]))
            self._dmuB = float(abs(t.muB_grid[1] - t.muB_grid[0])) if t.points_muB > 1 else 1.0
            self._T_grid = np.asarray(t.T_grid)
            self._muB_grid = np.asarray(t.muB_grid)

        # PTB splines, set by compute_jonah_coefficients
        self._lambda_squared_spline: CubicSpline | None = None
        self._z_spline: CubicSpline | None = None
        self.bulkPi_over_Peq_max: float = -1.0

    # ------------------------------------------------------------------
    @host_prep
    def compute_jonah_coefficients(self, species: SpeciesTable,
                                   laguerre: GaussLaguerre,
                                   plasma: ThermoAverages,
                                   jonah_points: int = 301,
                                   lambda_min: float = -1.0,
                                   lambda_max: float = 2.0) -> None:
        """Scan lambda in [-1, 2] and build lambda^2(Pi/Peq), z(Pi/Peq) splines
        (DeltafData.cpp:220-295).  Photons (mass 0) are skipped."""
        T = plasma.temperature
        mask = species.mass > 0.0
        mbar = species.mass[mask] / T
        g = species.gspin[mask]
        sgn = species.sign[mask]

        roots2 = jnp.asarray(laguerre.roots[2])
        weights2 = jnp.asarray(laguerre.weights[2])

        lam = np.linspace(lambda_min, lambda_max, jonah_points)

        # (n_lambda, n_species) integrals; lambda=0 gives the unmodified E, P
        E_mod = thermal.E_mod_integral(roots2, weights2,
                                       mbar[None, :], lam[:, None], sgn[None, :])
        P_mod = thermal.P_mod_integral(roots2, weights2,
                                       mbar[None, :], lam[:, None], sgn[None, :])
        E0 = thermal.E_mod_integral(roots2, weights2, mbar, np.zeros_like(mbar), sgn)
        P0 = thermal.P_mod_integral(roots2, weights2, mbar, np.zeros_like(mbar), sgn)

        E = float(jnp.sum(g * E0))
        P = float(jnp.sum(g * P0)) / 3.0
        E_mod_tot = np.asarray(jnp.sum(g[None, :] * E_mod, axis=1))
        P_mod_tot = np.asarray(jnp.sum(g[None, :] * P_mod, axis=1)) / 3.0

        z = E / E_mod_tot
        bulkPi_over_Peq = (P_mod_tot / P) * z - 1.0

        self.bulkPi_over_Peq_max = float(np.max(bulkPi_over_Peq))
        self._lambda_squared_spline = CubicSpline(bulkPi_over_Peq, lam * lam)
        self._z_spline = CubicSpline(bulkPi_over_Peq, z)

    # ------------------------------------------------------------------
    def _bilinear(self, grid, T, muB):
        """Bilinear interpolation in (T, muB) on the uniform grid
        (DeltafData.cpp:404-441)."""
        grid = jnp.asarray(grid)
        iT = jnp.clip(jnp.floor((T - self._T_min) / self._dT).astype(jnp.int32),
                      0, self.tables.points_T - 2)
        iB = jnp.clip(jnp.floor((muB - self._muB_min) / self._dmuB).astype(jnp.int32),
                      0, max(self.tables.points_muB - 2, 0))
        T_grid = jnp.asarray(self._T_grid)
        muB_grid = jnp.asarray(self._muB_grid)
        TL = T_grid[iT]
        TR = T_grid[iT + 1]
        if self.tables.points_muB > 1:
            muBL = muB_grid[iB]
            muBR = muB_grid[iB + 1]
            f_LL = grid[iB, iT]
            f_LR = grid[iB + 1, iT]
            f_RL = grid[iB, iT + 1]
            f_RR = grid[iB + 1, iT + 1]
            return ((f_LL * (TR - T) + f_RL * (T - TL)) * (muBR - muB)
                    + (f_LR * (TR - T) + f_RR * (T - TL)) * (muB - muBL)) \
                / (self._dT * self._dmuB)
        f_L = grid[0, iT]
        f_R = grid[0, iT + 1]
        return (f_L * (TR - T) + f_R * (T - TL)) / self._dT

    # ------------------------------------------------------------------
    def test_coefficients(self, plasma, bulkPi_over_P: float = 0.0) -> str:
        """Spot-check printout of the df coefficients at the average
        thermodynamic state (Deltaf_Data::test_df_coefficients,
        DeltafData.cpp:522-553).  Returns the formatted string."""
        import numpy as np

        T = np.float64(plasma.temperature)
        E = np.float64(plasma.energy_density)
        P = np.float64(plasma.pressure)
        muB = np.float64(plasma.baryon_chemical_potential)
        df = self.evaluate(np.atleast_1d(T), np.atleast_1d(muB),
                           np.atleast_1d(E), np.atleast_1d(P),
                           np.atleast_1d(bulkPi_over_P * P))

        def v(a):
            return float(np.asarray(a)[0])

        if self.df_mode == 1:
            body = (f"(c0, c1, c2, c3, c4, shear14) = ({v(df.c0):f}, "
                    f"{v(df.c1):f}, {v(df.c2):f}, {v(df.c3):f}, "
                    f"{v(df.c4):f}, {v(df.shear14):f})")
            head = "Grad 14-moment"
        elif self.df_mode in (2, 3, 5):
            body = (f"(F, G, betabulk, betaV, betapi) = ({v(df.F):f}, "
                    f"{v(df.G):f}, {v(df.betabulk):f}, {v(df.betaV):f}, "
                    f"{v(df.betapi):f})")
            head = "RTA Chapman-Enskog (or PTM)"
        else:
            body = (f"(lambda, z, dlambda, dz, betapi) = ({v(df.lam):f}, "
                    f"{v(df.z):f}, {v(df.delta_lambda):f}, "
                    f"{v(df.delta_z):f}, {v(df.betapi):f})")
            head = "PTB"
        return (f"Testing {head} df coefficients for Pi/Peq = "
                f"{bulkPi_over_P:.3f}\n{body}")

    def evaluate(self, T, muB, E, P, bulkPi) -> DeltafCoefficients:
        """Vectorized evaluate_df_coefficients (DeltafData.cpp:324-519).

        All inputs broadcast; typical use passes per-cell arrays.
        Temperature-power scaling is undone here.
        """
        T = jnp.asarray(T)
        zeros = jnp.zeros_like(T)
        c0 = c1 = c2 = c3 = c4 = shear14 = zeros
        F = G = betabulk = betapi = zeros
        betaV = jnp.ones_like(T)
        lam = z = delta_lambda = delta_z = zeros

        T3 = T * T * T
        T4 = T3 * T
        T5 = T4 * T

        mode = self.df_mode
        if not self.include_baryon:
            if mode == 1:
                c0 = self._c0(T) / T4
                c2 = self._c2(T) / T4
                shear14 = 2.0 * T * T * (E + P)
            elif mode in (2, 3, 5):
                F = self._F(T) * T
                betabulk = self._betabulk(T) * T4
                betapi = self._betapi(T) * T4
            elif mode == 4:
                if self._lambda_squared_spline is None:
                    raise RuntimeError("PTB requires compute_jonah_coefficients first")
                x = bulkPi / P
                lam2 = self._lambda_squared_spline(x)
                lam = jnp.sign(bulkPi) * jnp.sqrt(jnp.maximum(lam2, 0.0))
                z = self._z_spline(x)
                betapi = self._betapi(T) * T4
                delta_lambda = bulkPi / (5.0 * betapi - 3.0 * P * (E + P) / E)
                delta_z = -3.0 * delta_lambda * P / E
        else:
            if mode == 1:
                c0 = self._bilinear(self._grids["c0"], T, muB) / T4
                c1 = self._bilinear(self._grids["c1"], T, muB) / T3
                c2 = self._bilinear(self._grids["c2"], T, muB) / T4
                c3 = self._bilinear(self._grids["c3"], T, muB) / T4
                c4 = self._bilinear(self._grids["c4"], T, muB) / T5
                shear14 = 2.0 * T * T * (E + P)
            elif mode in (2, 3, 5):
                F = self._bilinear(self._grids["F"], T, muB) * T
                G = self._bilinear(self._grids["G"], T, muB)
                betabulk = self._bilinear(self._grids["betabulk"], T, muB) * T4
                betaV = self._bilinear(self._grids["betaV"], T, muB) * T3
                betapi = self._bilinear(self._grids["betapi"], T, muB) * T4
            elif mode == 4:
                raise ValueError("PTB (Jonah) df does not support nonzero muB")

        return DeltafCoefficients(
            c0=c0, c1=c1, c2=c2, c3=c3, c4=c4, shear14=shear14,
            F=F, G=G, betabulk=betabulk, betaV=betaV, betapi=betapi,
            lam=lam, z=z, delta_lambda=delta_lambda, delta_z=delta_z,
        )

    # ------------------------------------------------------------------
    def regulate_bulkPi_ptb(self, bulkPi, P):
        """Clamp bulk pressure to the PTB spline domain
        (MomentumSpectra.cpp:601-615)."""
        lo = -(1.0 - 1.0e-5) * P
        hi = P * (self.bulkPi_over_Peq_max - 1.0e-5)
        return jnp.clip(bulkPi, lo, hi)


@host_prep
def compute_particle_densities(species: SpeciesTable, df_data: DeltafData,
                               laguerre: GaussLaguerre,
                               plasma: ThermoAverages) -> None:
    """Per-species (neq, dn_bulk, dn_diff) at the surface-averaged (T, muB)
    (DeltafData.cpp:555-690).  Results are cached on the species table; used
    by the sampler's fast mode and the yield estimate."""
    T = plasma.temperature
    E = plasma.energy_density
    P = plasma.pressure
    muB = plasma.baryon_chemical_potential
    nB = plasma.net_baryon_density

    df = df_data.evaluate(jnp.asarray(T), jnp.asarray(muB),
                          jnp.asarray(E), jnp.asarray(P), jnp.asarray(0.0))

    alphaB = muB / T
    baryon_enthalpy_ratio = nB / (E + P)

    mbar = species.mass / T
    g = species.gspin
    b = species.baryon
    sgn = species.sign

    r1, w1 = jnp.asarray(laguerre.roots[1]), jnp.asarray(laguerre.weights[1])
    r2, w2 = jnp.asarray(laguerre.roots[2]), jnp.asarray(laguerre.weights[2])
    r3, w3 = jnp.asarray(laguerre.roots[3]), jnp.asarray(laguerre.weights[3])

    neq_fact = g * T**3 / two_pi2_hbarC3
    neq = neq_fact * thermal.neq_integral(r1, w1, mbar, alphaB, b, sgn)

    mode = df_data.df_mode
    if mode == 1:
        J10 = g * T**3 / two_pi2_hbarC3 * thermal.J10_integral(r1, w1, mbar, alphaB, b, sgn)
        J20 = g * T**4 / two_pi2_hbarC3 * thermal.J20_integral(r2, w2, mbar, alphaB, b, sgn)
        J30 = g * T**5 / two_pi2_hbarC3 * thermal.J30_integral(r3, w3, mbar, alphaB, b, sgn)
        J31 = g * T**5 / two_pi2_hbarC3 / 3.0 * thermal.J31_integral(r3, w3, mbar, alphaB, b, sgn)
        dn_bulk = (df.c0 - df.c2) * species.mass**2 * J10 + df.c1 * b * J20 \
            + (4.0 * df.c2 - df.c0) * J30
        dn_diff = b * df.c3 * neq * T + df.c4 * J31
    elif mode in (2, 3, 5):
        J10 = g * T**3 / two_pi2_hbarC3 * thermal.J10_integral(r1, w1, mbar, alphaB, b, sgn)
        J11 = g * T**3 / two_pi2_hbarC3 / 3.0 * thermal.J11_integral(r1, w1, mbar, alphaB, b, sgn)
        J20 = g * T**4 / two_pi2_hbarC3 * thermal.J20_integral(r2, w2, mbar, alphaB, b, sgn)
        dn_bulk = (neq + b * J10 * df.G + J20 * df.F / T**2) / df.betabulk
        dn_diff = (neq * T * baryon_enthalpy_ratio - b * J11) / df.betaV
    elif mode == 4:
        dn_bulk = jnp.zeros_like(neq)
        dn_diff = jnp.zeros_like(neq)
    else:
        raise ValueError("df_mode must be in 1..5")

    species.equilibrium_density = np.asarray(neq)
    species.bulk_density = np.asarray(dn_bulk)
    species.diff_density = np.asarray(dn_diff)
