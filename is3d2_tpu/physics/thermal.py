"""Gauss-Laguerre thermal integrals, vectorized.

Replaces src/cpp/GaussThermal.cpp:7-116.  Each integral contracts a fixed
quadrature axis; all other arguments broadcast, so a single call evaluates
every HRG species (or every freezeout cell x species pair) at once.

Conventions match the reference: ``pbar`` roots/weights come from the
generalized Gauss-Laguerre families in tables/gauss/gla_roots_weights.txt
(family index = the power of pbar absorbed into the weight), the integrands
multiply back exp(pbar), and ``sign`` is +1 (Fermi) / -1 (Bose).
"""

from __future__ import annotations

import jax.numpy as jnp


def _bcast(mbar, alphaB, baryon, sign):
    mbar = jnp.asarray(mbar)[..., None]
    alphaB = jnp.asarray(alphaB)[..., None]
    baryon = jnp.asarray(baryon)[..., None]
    sign = jnp.asarray(sign)[..., None]
    return mbar, alphaB, baryon, sign


def neq_integral(roots, weights, mbar, alphaB, baryon, sign):
    """Equilibrium density integral, family a=1 (GaussThermal.cpp:19-25)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    f = p * jnp.exp(p) / (jnp.exp(E - baryon * alphaB) + sign)
    return jnp.sum(weights * f, axis=-1)


def _qstat_weight(p, E, alphaB, baryon, sign):
    # exp(p + E - b.alphaB) / (exp(E - b.alphaB) + sign)^2, overflow-safe form
    q = jnp.exp(E - baryon * alphaB) + sign
    return jnp.exp(p + E - baryon * alphaB) / (q * q)


def J10_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=1 family (GaussThermal.cpp:45-52)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * p * _qstat_weight(p, E, alphaB, baryon, sign), axis=-1)


def J11_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=1 family (GaussThermal.cpp:54-60)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * p**3 / (E * E) * _qstat_weight(p, E, alphaB, baryon, sign), axis=-1)


def J20_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=2 family (GaussThermal.cpp:62-69)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * E * _qstat_weight(p, E, alphaB, baryon, sign), axis=-1)


def J30_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=3 family (GaussThermal.cpp:71-77)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * E * E / p * _qstat_weight(p, E, alphaB, baryon, sign), axis=-1)


def J31_integral(roots, weights, mbar, alphaB, baryon, sign):
    """a=3 family (GaussThermal.cpp:79-85)."""
    mbar, alphaB, baryon, sign = _bcast(mbar, alphaB, baryon, sign)
    p = roots
    E = jnp.sqrt(p * p + mbar * mbar)
    return jnp.sum(weights * p * _qstat_weight(p, E, alphaB, baryon, sign), axis=-1)


def E_mod_integral(roots, weights, mbar, lam, sign):
    """Jonah modified energy density integrand, a=2 family
    (GaussThermal.cpp:100-107): sqrt(p^2 (1+lam)^2 + m^2) e^p / (e^E + sign)."""
    mbar = jnp.asarray(mbar)[..., None]
    lam = jnp.asarray(lam)[..., None]
    sign = jnp.asarray(sign)[..., None]
    p = roots
    scale2 = (1.0 + lam) ** 2
    E = jnp.sqrt(p * p + mbar * mbar)
    f = jnp.sqrt(p * p * scale2 + mbar * mbar) * jnp.exp(p) / (jnp.exp(E) + sign)
    return jnp.sum(weights * f, axis=-1)


def P_mod_integral(roots, weights, mbar, lam, sign):
    """Jonah modified pressure integrand, a=2 family (GaussThermal.cpp:109-116)."""
    mbar = jnp.asarray(mbar)[..., None]
    lam = jnp.asarray(lam)[..., None]
    sign = jnp.asarray(sign)[..., None]
    p = roots
    scale2 = (1.0 + lam) ** 2
    E = jnp.sqrt(p * p + mbar * mbar)
    f = p * p * scale2 / jnp.sqrt(p * p * scale2 + mbar * mbar) * jnp.exp(p) / (jnp.exp(E) + sign)
    return jnp.sum(weights * f, axis=-1)
