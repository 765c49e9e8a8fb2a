"""Unit tests for the batched VAH solver (physics/aniso)."""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, make_eos_consistent

from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre
from is3d2_tpu.physics.aniso import (compute_F, find_anisotropic_variables,
                                     compute_famod_coefficients)
from is3d2_tpu.core.spectra_famod import reconstruction_species


@pytest.fixture(scope="module")
def pdg320(reference_dir):
    table = read_pdg(3, reference_dir / "PDG")
    return reconstruction_species(table)


def test_equilibrium_fixed_point(reference_dir, pdg320):
    """For HRG-consistent (E, P, P) the solution is (lambda=T, aT=aL=1)."""
    mass, sign, deg = pdg320
    species = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")

    surf = make_surface(16, seed=5, shear_scale=0.0, bulk_scale=0.0)
    surf = make_eos_consistent(surf, species, laguerre)

    E = jnp.asarray(surf.E)
    P = jnp.asarray(surf.P)
    T = jnp.asarray(surf.T)
    # note: E, P from the full table; solver uses <= 320 species, so the
    # fixed point is approximate but should be recovered to the EoS mismatch
    sol = find_anisotropic_variables(E, P, P, T, jnp.ones(16), jnp.ones(16),
                                     mass, sign, deg)
    assert not np.asarray(sol.failed).any()
    assert np.allclose(np.asarray(sol.aT), 1.0, atol=0.05)
    assert np.allclose(np.asarray(sol.aL), 1.0, atol=0.05)
    assert np.allclose(np.asarray(sol.lam), np.asarray(T), rtol=0.05)

    # converged root: F(X) ~ 0 within tolerance
    X = jnp.stack([sol.lam, sol.aT, sol.aL], axis=-1)
    F = compute_F(X, E, P, P, mass, sign, deg)
    assert np.abs(np.asarray(F)).max() < 1e-4


def test_famod_coefficients_isotropic_limit(pdg320):
    """aT = aL: beta_piperp = beta_Wperp (both reduce to the same integral)."""
    mass, sign, deg = pdg320
    lam = jnp.asarray([0.15, 0.12])
    one = jnp.ones(2)
    bpp, bwp = compute_famod_coefficients(lam, one, one, mass, sign, deg)
    np.testing.assert_allclose(np.asarray(bpp), np.asarray(bwp), rtol=1e-12)
    assert (np.asarray(bpp) > 0).all()


def test_famod_coefficients_mixed_precision(pdg320):
    """The f32 mixed-precision coefficient path agrees with f64 even for
    near-isotropic cells whose z = (aT^2 - aL^2)/w^2 falls just outside the
    f64 Taylor window of the t_40x functions, where the f32 exact branch
    cancels catastrophically (eps_32/z^2 relative; regression: this leaked
    ~1e-4 into the 3+1d f32 famod spectra before the f32 window was widened
    to |z| <= 0.2 in physics/aniso._t_functions_400)."""
    mass, sign, deg = pdg320
    d = jnp.asarray([-0.3, -0.05, -0.011, 1e-4, 0.011, 0.05, 0.3])
    lam = jnp.full_like(d, 0.15)
    aL = jnp.sqrt(1.0 - d / 2.0)
    aT = jnp.sqrt(1.0 + d / 2.0)
    b64 = compute_famod_coefficients(lam, aT, aL, mass, sign, deg)
    b32 = compute_famod_coefficients(lam, aT, aL, mass, sign, deg,
                                     mixed_precision=True)
    for name, x64, x32 in zip(("betapiperp", "betaWperp"), b64, b32):
        err = (np.abs(np.asarray(x32) - np.asarray(x64))
               / np.abs(np.asarray(x64)))
        assert err.max() < 2e-5, f"{name}: {err.max():.2e}"


def test_anisotropic_solution_consistency(pdg320):
    """Anisotropic targets: solver residual is small and aT != aL."""
    mass, sign, deg = pdg320
    E = jnp.asarray([0.3])
    pl = jnp.asarray([0.06])
    pt = jnp.asarray([0.09])
    sol = find_anisotropic_variables(E, pl, pt, jnp.asarray([0.15]),
                                     jnp.ones(1), jnp.ones(1), mass, sign, deg)
    assert not bool(sol.failed[0])
    X = jnp.stack([sol.lam, sol.aT, sol.aL], axis=-1)
    F = compute_F(X, E, pt, pl, mass, sign, deg)
    assert np.abs(np.asarray(F)).max() < 1e-4
    assert float(sol.aT[0]) > float(sol.aL[0])  # pt > pl -> more transverse


def test_device_chord_polish_matches_host_f64(reference_dir, pdg320):
    """The f32-Newton + (f32 J, f64 F) chord step reconstruction
    (core/spectra_famod._reconstruct_f64_jit) agrees with the all-f64 host
    Newton within the host solver's own stopping tolerance (|dX| <= 1e-4):
    both sit near the same root, the chord's f64 residual pinning the
    device solution to ~1e-8 of it.  The spectra-level accuracy assertion
    (~3e-6 f32 vs f64) lives in test_f32_paths; this pins the solver
    itself so a polish regression is caught at the source."""
    from is3d2_tpu.config import Config
    from is3d2_tpu.core.cells import prepare_cells
    from is3d2_tpu.core.spectra_famod import _reconstruct_f64_jit

    mass, sign, deg = pdg320
    species = read_pdg(3, reference_dir / "PDG")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    surf = make_surface(64, seed=11, shear_scale=0.04, bulk_scale=0.02)
    surf = make_eos_consistent(surf, species, laguerre)
    cfg = Config(operation=1, df_mode=5, hrg_eos=3, include_shear_deltaf=1,
                 include_bulk_deltaf=1, cell_block=64, compute_dtype="f64")
    cells = prepare_cells(surf, cfg, block=64)

    from is3d2_tpu.physics import lrf
    basis = lrf.milne_basis(cells.tau, cells.ux, cells.uy, cells.un)
    pi = lrf.boost_shear(basis, cells.tau, cells.pitt, cells.pitx,
                         cells.pity, cells.pitn, cells.pixx, cells.pixy,
                         cells.pixn, cells.piyy, cells.piyn, cells.pinn)
    pl = cells.P + cells.bulkPi + pi.zz
    pt = cells.P + cells.bulkPi - pi.zz / 2.0

    dev = _reconstruct_f64_jit(cells, mass, sign, deg, n_blocks=1)

    host = find_anisotropic_variables(
        jnp.asarray(cells.E, jnp.float64), jnp.asarray(pl, jnp.float64),
        jnp.asarray(pt, jnp.float64), jnp.asarray(cells.T, jnp.float64),
        jnp.ones(cells.n_padded), jnp.ones(cells.n_padded), mass, sign, deg)

    ok = ~(np.asarray(dev["failed"]) | np.asarray(host.failed)) \
        & np.asarray(cells.mask, bool)
    assert ok.sum() > 50
    for k, ref in (("lam", host.lam), ("aT", host.aT), ("aL", host.aL)):
        err = np.abs(np.asarray(dev[k]) - np.asarray(ref))[ok] \
            / np.abs(np.asarray(ref))[ok]
        # the host Newton itself stops at |dX| <= 1e-4; both solutions sit
        # within solver tolerance of the same root, and the chord's f64
        # residual pins the device one to ~1e-8 of it
        assert err.max() < 2e-4, f"{k}: {err.max():.2e}"
