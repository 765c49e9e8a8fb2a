"""Physics-layer tests: spline, thermal integrals, delta-f coefficients, LRF."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.interpolate import CubicSpline as ScipyCubicSpline

from is3d2_tpu.constants import two_pi2_hbarC3
from is3d2_tpu.io.tables import GaussLaguerre
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.io.surface import ThermoAverages, read_surface
from is3d2_tpu.physics.spline import CubicSpline
from is3d2_tpu.physics import thermal, lrf
from is3d2_tpu.physics.deltaf import DeltafData, compute_particle_densities


def test_cubic_spline_matches_scipy_natural():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 37))
    y = np.sin(x) + 0.1 * rng.standard_normal(37)
    ours = CubicSpline(x, y)
    ref = ScipyCubicSpline(x, y, bc_type="natural")
    xq = np.linspace(x[0], x[-1], 500)
    np.testing.assert_allclose(np.asarray(ours(xq)), ref(xq), rtol=1e-12, atol=1e-12)


def test_neq_massless_boson(reference_dir):
    # massless boson, muB=0: neq = g T^3 zeta(3) / pi^2 hbar^3
    # our integral (with prefactor T^3/(2 pi^2 hbar^3) * g) should give
    # neq_int = 2 zeta(3) ~ 2.40411
    gla = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    r1, w1 = jnp.asarray(gla.roots[1]), jnp.asarray(gla.weights[1])
    val = thermal.neq_integral(r1, w1, jnp.asarray(0.0), jnp.asarray(0.0),
                               jnp.asarray(0.0), jnp.asarray(-1.0))
    assert float(val) == pytest.approx(2.0 * 1.2020569031595943, rel=1e-10)


def test_neq_boltzmann_massive(reference_dir):
    # Boltzmann (sign=0) massive: integral = mbar^2 K2(mbar) exactly
    from scipy.special import kn
    gla = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    r1, w1 = jnp.asarray(gla.roots[1]), jnp.asarray(gla.weights[1])
    for mbar in (0.7, 1.0, 3.0, 8.0):
        val = thermal.neq_integral(r1, w1, jnp.asarray(mbar), jnp.asarray(0.0),
                                   jnp.asarray(0.0), jnp.asarray(0.0))
        # 32-pt Laguerre quadrature resolves the massive integrand to ~1e-6
        assert float(val) == pytest.approx(mbar**2 * kn(2, mbar), rel=3e-5)


@pytest.fixture(scope="module")
def box_setup(reference_dir):
    """smash-box HRG at a physical freezeout temperature.

    (The bundled input/surface.dat mis-parses to T = 0.277 GeV, outside the
    delta-f coefficient tables, so we use a synthetic plasma instead.)
    """
    surf = read_surface(reference_dir / "input/surface.dat", 1, 2, False)
    plasma = ThermoAverages(temperature=0.155, energy_density=0.25,
                            pressure=0.08, baryon_chemical_potential=0.0,
                            net_baryon_density=0.0)
    species = read_pdg(3, reference_dir / "PDG")
    gla = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    return surf, plasma, species, gla, tables


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4])
def test_deltaf_evaluation_runs(box_setup, df_mode):
    surf, plasma, species, gla, tables = box_setup
    dfd = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        dfd.compute_jonah_coefficients(species, gla, plasma)
        assert dfd.bulkPi_over_Peq_max > 0
    T = jnp.asarray(plasma.temperature)
    E = jnp.asarray(plasma.energy_density)
    P = jnp.asarray(plasma.pressure)
    df = dfd.evaluate(T, jnp.asarray(0.0), E, P, jnp.asarray(-0.1) * P)
    if df_mode == 1:
        assert float(df.shear14) == pytest.approx(2 * plasma.temperature**2
                                                  * (plasma.energy_density + plasma.pressure))
        assert np.isfinite(float(df.c0)) and np.isfinite(float(df.c2))
    elif df_mode in (2, 3):
        assert float(df.betapi) > 0 and float(df.betabulk) > 0
    else:
        assert float(df.z) > 0
        assert float(df.lam) < 0  # negative bulk pressure -> negative lambda


def test_particle_densities_pion_sanity(box_setup):
    surf, plasma, species, gla, tables = box_setup
    dfd = DeltafData(tables, 2, include_baryon=False)
    compute_particle_densities(species, dfd, gla, plasma)
    i = species.index_of_mcid(111)
    # pion equilibrium density at T ~ 0.150 GeV should be ~ 0.05-0.15 fm^-3
    assert 0.01 < species.equilibrium_density[i] < 0.3
    # all densities positive
    assert (species.equilibrium_density > 0).all()


def test_milne_basis_orthonormality():
    rng = np.random.default_rng(1)
    n = 64
    tau = jnp.asarray(rng.uniform(0.5, 10, n))
    ux = jnp.asarray(rng.uniform(-2, 2, n))
    uy = jnp.asarray(rng.uniform(-2, 2, n))
    un = jnp.asarray(rng.uniform(-0.5, 0.5, n))
    # include zero transverse flow cells
    ux = ux.at[:4].set(0.0)
    uy = uy.at[:4].set(0.0)
    ut = lrf.u_time_component(tau, ux, uy, un)
    b = lrf.milne_basis(tau, ux, uy, un)
    tau2 = tau * tau

    # metric ds^2 = dtau^2 - dx^2 - dy^2 - tau^2 deta^2
    U_norm = ut**2 - ux**2 - uy**2 - tau2 * un**2
    X_norm = b.Xt**2 - b.Xx**2 - b.Xy**2 - tau2 * b.Xn**2
    Y_norm = -b.Yx**2 - b.Yy**2
    Z_norm = b.Zt**2 - tau2 * b.Zn**2
    np.testing.assert_allclose(np.asarray(U_norm), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(X_norm), -1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Y_norm), -1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Z_norm), -1.0, atol=1e-12)

    UX = ut * b.Xt - ux * b.Xx - uy * b.Xy - tau2 * un * b.Xn
    UZ = ut * b.Zt - tau2 * un * b.Zn
    XZ = b.Xt * b.Zt - tau2 * b.Xn * b.Zn
    np.testing.assert_allclose(np.asarray(UX), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(UZ), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(XZ), 0.0, atol=1e-12)


def test_shear_completion_and_lrf_boost():
    rng = np.random.default_rng(2)
    n = 32
    tau = jnp.asarray(rng.uniform(0.5, 10, n))
    ux = jnp.asarray(rng.uniform(-1, 1, n))
    uy = jnp.asarray(rng.uniform(-1, 1, n))
    un = jnp.asarray(rng.uniform(-0.3, 0.3, n))
    pixx = jnp.asarray(rng.uniform(-0.05, 0.05, n))
    pixy = jnp.asarray(rng.uniform(-0.05, 0.05, n))
    pixn = jnp.asarray(rng.uniform(-0.05, 0.05, n))
    piyy = jnp.asarray(rng.uniform(-0.05, 0.05, n))
    piyn = jnp.asarray(rng.uniform(-0.05, 0.05, n))

    ut = lrf.u_time_component(tau, ux, uy, un)
    pitt, pitx, pity, pitn, pinn = lrf.complete_shear(tau, ux, uy, un,
                                                      pixx, pixy, pixn, piyy, piyn)
    tau2 = tau * tau
    # orthogonality pi.u = 0 and trace = 0
    r0 = pitt * ut - pitx * ux - pity * uy - pitn * tau2 * un
    trace = pitt - pixx - piyy - tau2 * pinn
    np.testing.assert_allclose(np.asarray(r0), 0.0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(trace), 0.0, atol=1e-13)

    # LRF shear is traceless and reproduces the invariant pi.pi
    b = lrf.milne_basis(tau, ux, uy, un)
    s = lrf.boost_shear(b, tau, pitt, pitx, pity, pitn,
                        pixx, pixy, pixn, piyy, piyn, pinn)
    np.testing.assert_allclose(np.asarray(s.xx + s.yy + s.zz), 0.0, atol=1e-13)

    # invariant pi^munu pi_munu = sum_ij piij_LRF^2 (since pi is spatial in LRF)
    pi_pi = (pitt**2 + pixx**2 + piyy**2 + tau2**2 * pinn**2
             - 2 * (pitx**2 + pity**2 + tau2 * pitn**2)
             + 2 * (pixy**2 + tau2 * (pixn**2 + piyn**2)))
    lrf_pi_pi = (s.xx**2 + s.yy**2 + s.zz**2 + 2 * (s.xy**2 + s.xz**2 + s.yz**2))
    np.testing.assert_allclose(np.asarray(pi_pi), np.asarray(lrf_pi_pi), rtol=1e-9, atol=1e-13)


def test_dsigma_boost_invariant_magnitude():
    rng = np.random.default_rng(3)
    n = 16
    tau = jnp.asarray(rng.uniform(0.5, 5, n))
    ux = jnp.asarray(rng.uniform(-1, 1, n))
    uy = jnp.asarray(rng.uniform(-1, 1, n))
    un = jnp.asarray(rng.uniform(-0.2, 0.2, n))
    dat = jnp.asarray(rng.uniform(-1, 1, n))
    dax = jnp.asarray(rng.uniform(-1, 1, n))
    day = jnp.asarray(rng.uniform(-1, 1, n))
    dan = jnp.asarray(rng.uniform(-1, 1, n))

    b = lrf.milne_basis(tau, ux, uy, un)
    ds = lrf.boost_dsigma(b, tau, ux, uy, un, dat, dax, day, dan)
    # invariant: ds.ds = dst^2 - ds_space^2  (dsigma_mu has lower index)
    tau2 = tau * tau
    ds_ds = dat**2 - dax**2 - day**2 - dan**2 / tau2
    np.testing.assert_allclose(np.asarray(ds.t**2 - ds.space**2),
                               np.asarray(ds_ds), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("df_mode", [1, 2, 4])
def test_df_coefficient_spotcheck(box_setup, df_mode):
    """test_df_coefficients equivalent (DeltafData.cpp:522-553)."""
    surf, plasma, species, gla, tables = box_setup
    dfd = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        dfd.compute_jonah_coefficients(species, gla, plasma)
    text = dfd.test_coefficients(plasma, bulkPi_over_P=-0.1)
    assert "Pi/Peq = -0.100" in text
    key = {1: "c0, c1", 2: "F, G", 4: "lambda, z"}[df_mode]
    assert key in text
    # every printed number parses finite
    import re
    nums = [float(t) for t in re.findall(r"-?\d+\.\d+", text.splitlines()[1])]
    assert nums and all(np.isfinite(nums))
