"""Run-time observability: the diagnostics the reference always prints.

The reference reports, per run:
  * feqmod/famod breakdown cell counts and the proper-time horizon below
    which cells fell back (MomentumSpectra.cpp:1039-1040, 1674-1678)
  * pl < 0 cell counts (famod) and reconstruction-failure counts
    (MomentumSpectra.cpp:1675-1677)
  * momentum-sampling acceptance efficiency (ParticleSampler.cpp:1133, 1623)
  * tetrad orthonormality / pi.u = 0 / Tr pi = 0 / V.u = 0 invariant
    warnings (LocalRestFrame.cpp:43-71, 115-131, 164-171)

The engines compute the corresponding masks anyway (breakdown predicates,
rejection acceptance, validity); this module aggregates them into a
RunReport the driver prints after each stage, so silent physics fallbacks
on a new surface are visible exactly as they are in the reference.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class RunReport:
    """Aggregated per-run health metrics (None = not applicable this run)."""

    n_cells: int = 0
    skipped_cells: int | None = None          # u.dsigma <= 0 (masked out)
    # feqmod / famod breakdown (df 3/4/5)
    breakdown_cells: int | None = None
    tau_breakdown: float = 0.0                # latest tau with a breakdown
    pl_negative_cells: int | None = None      # famod: pl < 0 or pt < 0
    tau_pl: float = 0.0
    reconstruction_failures: int | None = None  # famod Newton non-convergence
    # sampler
    mom_proposals: int | None = None          # rejection-loop draws
    mom_acceptances: int | None = None
    hadrons_drawn: int | None = None          # Poisson lanes processed
    hadrons_kept: int | None = None
    dropped_lanes: int | None = None          # never-accepted rejection lanes
    sampler_capacity_retries: int = 0
    # LRF invariant checks (max violation per invariant)
    invariants: dict | None = None

    # ------------------------------------------------------------------
    def record_breakdown(self, breaks_down, tau, mask,
                         pl_negative=None, recon_failed=None) -> None:
        """Fill breakdown counters from per-cell masks (device or numpy)."""
        breaks = np.asarray(breaks_down).astype(bool)
        tau = np.asarray(tau)
        valid = np.asarray(mask) > 0.0
        b = breaks & valid
        self.breakdown_cells = int(b.sum())
        self.tau_breakdown = float(tau[b].max()) if b.any() else 0.0
        if pl_negative is not None:
            p = np.asarray(pl_negative).astype(bool) & valid
            self.pl_negative_cells = int(p.sum())
            self.tau_pl = float(tau[p].max()) if p.any() else 0.0
        if recon_failed is not None:
            r = np.asarray(recon_failed).astype(bool) & valid
            self.reconstruction_failures = int(r.sum())

    # ------------------------------------------------------------------
    def lines(self) -> list[str]:
        out = []
        if self.skipped_cells:
            out.append(f"skipped {self.skipped_cells} / {self.n_cells} cells "
                       "with u.dsigma <= 0")
        if self.breakdown_cells is not None:
            kind = "famod" if self.pl_negative_cells is not None else "feqmod"
            out.append(f"{kind} breaks down for {self.breakdown_cells} / "
                       f"{self.n_cells} cells until t = "
                       f"{self.tau_breakdown:.3f} fm/c")
        if self.pl_negative_cells is not None:
            out.append(f"pl went negative for {self.pl_negative_cells} / "
                       f"{self.n_cells} cells until t = {self.tau_pl:.3f} fm/c")
        if self.reconstruction_failures is not None:
            out.append("Number of reconstruction failures = "
                       f"{self.reconstruction_failures}")
        if self.mom_proposals:
            eff = 100.0 * self.mom_acceptances / max(self.mom_proposals, 1)
            out.append(f"Momentum sampling efficiency = {eff:f} %")
        if self.hadrons_drawn is not None:
            out.append(f"sampled hadrons: {self.hadrons_kept} kept / "
                       f"{self.hadrons_drawn} drawn "
                       f"(flux+viscous keep fraction "
                       f"{self.hadrons_kept / max(self.hadrons_drawn, 1):.3f})")
        if self.dropped_lanes is not None and self.dropped_lanes > 0:
            frac = self.dropped_lanes / max(self.hadrons_drawn or 1, 1)
            out.append(f"WARNING: {self.dropped_lanes} hadron lanes "
                       f"({100 * frac:.2e} %) never accepted a momentum "
                       "proposal and were dropped (yield bias if large)")
        if self.sampler_capacity_retries:
            out.append(f"sampler capacity grown {self.sampler_capacity_retries}"
                       " time(s) after Poisson overflow")
        if self.invariants:
            for name, (val, tol) in self.invariants.items():
                if val > tol:
                    out.append(f"WARNING: {name} violated: max |err| = "
                               f"{val:.6g} (tol {tol:g})")
        return out

    def print(self) -> None:
        for line in self.lines():
            print(line, flush=True)


# ----------------------------------------------------------------------
def check_invariants(surf, include_baryondiff: bool = False) -> dict:
    """Tensor-algebra self-checks on a freezeout surface, vectorized over
    cells (the reference's per-cell test_orthonormality /
    test_pimunu_orthogonality_and_tracelessness / test_Vmu_orthogonality,
    LocalRestFrame.cpp:43-71, 115-131, 164-171).

    Returns {invariant: (max violation, tolerance)}.
    """
    from .utils import cpu_device
    cpu = cpu_device()
    if cpu is not None:
        # setup-scale f64 math: the reference tolerances (1e-14/1e-15) assume
        # real f64; emulated f64 on the TPU backend sits at ~1e-13 and would
        # false-positive every run
        import jax
        with jax.default_device(cpu):
            return _check_invariants_impl(surf, include_baryondiff)
    return _check_invariants_impl(surf, include_baryondiff)


def _check_invariants_impl(surf, include_baryondiff: bool = False) -> dict:
    from .physics import lrf
    import jax.numpy as jnp

    tau = jnp.asarray(surf.tau)
    ux = jnp.asarray(surf.ux)
    uy = jnp.asarray(surf.uy)
    un = jnp.asarray(surf.un)
    tau2 = tau * tau
    ut = lrf.u_time_component(tau, ux, uy, un)
    b = lrf.milne_basis(tau, ux, uy, un)

    def mx(a):
        return float(jnp.max(jnp.abs(a))) if a.shape[0] else 0.0

    eps_basis = 1.0e-14       # LocalRestFrame.cpp:62
    eps_pi = 1.0e-15          # LocalRestFrame.cpp:124
    eps_V = 1.0e-15           # LocalRestFrame.cpp:168

    out = {
        "U normalization (U.U - 1)":
            (mx(ut * ut - ux * ux - uy * uy - tau2 * un * un - 1.0), eps_basis),
        "X normalization (X.X + 1)":
            (mx(b.Xt * b.Xt - b.Xx * b.Xx - b.Xy * b.Xy
                - tau2 * b.Xn * b.Xn + 1.0), eps_basis),
        "Y normalization (Y.Y + 1)":
            (mx(-b.Yx * b.Yx - b.Yy * b.Yy + 1.0), eps_basis),
        "Z normalization (Z.Z + 1)":
            (mx(b.Zt * b.Zt - tau2 * b.Zn * b.Zn + 1.0), eps_basis),
        "U orthogonality (max U.X, U.Y, U.Z)":
            (max(mx(b.Xt * ut - b.Xx * ux - b.Xy * uy - tau2 * b.Xn * un),
                 mx(-b.Yx * ux - b.Yy * uy),
                 mx(b.Zt * ut - tau2 * b.Zn * un)), eps_basis),
        "X orthogonality (max X.Y, X.Z)":
            (max(mx(-b.Xx * b.Yx - b.Xy * b.Yy),
                 mx(b.Xt * b.Zt - tau2 * b.Xn * b.Zn)), eps_basis),
    }

    # completed shear tensor: pi.u = 0 and Tr pi = 0 hold by construction;
    # verify the completion the way the reference verifies its stored tensor
    pixx = jnp.asarray(surf.pixx)
    pixy = jnp.asarray(surf.pixy)
    pixn = jnp.asarray(surf.pixn)
    piyy = jnp.asarray(surf.piyy)
    piyn = jnp.asarray(surf.piyn)
    pitt, pitx, pity, pitn, pinn = lrf.complete_shear(
        tau, ux, uy, un, pixx, pixy, pixn, piyy, piyn)
    pi_mag = jnp.sqrt(
        pitt**2 + pitx**2 + pity**2 + tau2**2 * pitn**2 + pixx**2 + pixy**2
        + tau2**2 * pixn**2 + piyy**2 + tau2**2 * piyn**2 + tau2**2 * pinn**2)
    scale = jnp.maximum(float(jnp.max(pi_mag)) if pi_mag.shape[0] else 0.0, 1e-300)
    out["pi.u orthogonality"] = (max(
        mx(pitt * ut - pitx * ux - pity * uy - tau2 * pitn * un),
        mx(pitx * ut - pixx * ux - pixy * uy - tau2 * pixn * un),
        mx(pity * ut - pixy * ux - piyy * uy - tau2 * piyn * un),
        mx(pitn * ut - pixn * ux - piyn * uy - tau2 * pinn * un)) / scale, eps_pi)
    out["pi tracelessness (Tr pi)"] = (
        mx(pitt - pixx - piyy - tau2 * pinn) / scale, eps_pi)

    if include_baryondiff:
        Vx = jnp.asarray(surf.Vx)
        Vy = jnp.asarray(surf.Vy)
        Vn = jnp.asarray(surf.Vn)
        Vt = lrf.orthogonal_time_component(tau, ux, uy, un, Vx, Vy, Vn)
        V_mag = jnp.sqrt(Vt**2 + Vx**2 + Vy**2 + tau2 * Vn**2)
        vscale = max(float(jnp.max(V_mag)) if V_mag.shape[0] else 0.0, 1e-300)
        out["V.u orthogonality"] = (
            mx(Vt * ut - Vx * ux - Vy * uy - tau2 * Vn * un) / vscale, eps_V)

    return out
