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
