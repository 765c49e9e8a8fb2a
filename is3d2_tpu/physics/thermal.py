"""Gauss-Laguerre thermal integrals, vectorized and overflow-safe.

Replaces src/cpp/GaussThermal.cpp:7-116.  Each integral contracts a fixed
quadrature axis; all other arguments broadcast, so a single call evaluates
every HRG species (or every freezeout cell x species pair) at once.

The reference writes the integrands as exp(pbar)/(exp(Ebar - b alphaB) + sign)
etc.; for Ebar ~ O(100) the intermediate exponentials overflow f32 (and the
axon TPU's emulated f64).  We use the algebraically identical factored forms

    exp(p) / (exp(t) + s)          = exp(p - t) / (1 + s exp(-t))
    exp(p + t) / (exp(t) + s)^2    = exp(p - t) / (1 + s exp(-t))^2

with t = Ebar - b alphaB >= pbar - b alphaB, whose exponents are bounded, so
every integrand is finite in any precision.

Conventions match the reference: ``pbar`` roots/weights come from the
generalized Gauss-Laguerre families in tables/gauss/gla_roots_weights.txt
(family index = the power of pbar absorbed into the weight) and ``sign`` is
+1 (Fermi) / -1 (Bose).
"""

from __future__ import annotations

import jax.numpy as jnp


def _bcast(mbar, alphaB, baryon, sign):
    mbar = jnp.asarray(mbar)[..., None]
    alphaB = jnp.asarray(alphaB)[..., None]
    baryon = jnp.asarray(baryon)[..., None]
    sign = jnp.asarray(sign)[..., None]
    return mbar, alphaB, baryon, sign


def _w1(p, t, sign):
    """exp(p) / (exp(t) + sign), overflow-safe."""
    return jnp.exp(p - t) / (1.0 + sign * jnp.exp(-t))


def _w2(p, t, sign):
    """exp(p + t) / (exp(t) + sign)^2, overflow-safe."""
    d = 1.0 + sign * jnp.exp(-t)
    return jnp.exp(p - t) / (d * d)


def neq_integral(roots, weights, mbar, alphaB, baryon, sign):
    """Equilibrium density integral, family a=1 (GaussThermal.cpp:19-25)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * p * _w1(p, E - baryon * alphaB, sign), axis=-1)


def J10_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=1 family (GaussThermal.cpp:45-52)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * p * _w2(p, E - baryon * alphaB, sign), axis=-1)


def J11_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=1 family (GaussThermal.cpp:54-60)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * p**3 / (E * E)
                   * _w2(p, E - baryon * alphaB, sign), axis=-1)


def J20_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=2 family (GaussThermal.cpp:62-69)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * E * _w2(p, E - baryon * alphaB, sign), axis=-1)


def J30_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=3 family (GaussThermal.cpp:71-77)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * E * E / p * _w2(p, E - baryon * alphaB, sign), axis=-1)


def J31_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=3 family (GaussThermal.cpp:79-85)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * p * _w2(p, E - baryon * alphaB, sign), axis=-1)


def E_mod_integral(roots, weights, mbar, lam, sign):
    """Jonah modified energy density integrand, a=2 family
    (GaussThermal.cpp:100-107)."""
    mbar = jnp.asarray(mbar)[..., None]
    lam = jnp.asarray(lam)[..., None]
    sign = jnp.asarray(sign)[..., None]
    p = roots
    scale2 = (1.0 + lam) ** 2
    E = jnp.sqrt(p * p + mbar * mbar)
    f = jnp.sqrt(p * p * scale2 + mbar * mbar) * _w1(p, E, sign)
    return jnp.sum(weights * f, axis=-1)


def P_mod_integral(roots, weights, mbar, lam, sign):
    """Jonah modified pressure integrand, a=2 family (GaussThermal.cpp:109-116)."""
    mbar = jnp.asarray(mbar)[..., None]
    lam = jnp.asarray(lam)[..., None]
    sign = jnp.asarray(sign)[..., None]
    p = roots
    scale2 = (1.0 + lam) ** 2
    E = jnp.sqrt(p * p + mbar * mbar)
    f = p * p * scale2 / jnp.sqrt(p * p * scale2 + mbar * mbar) * _w1(p, E, sign)
    return jnp.sum(weights * f, axis=-1)
