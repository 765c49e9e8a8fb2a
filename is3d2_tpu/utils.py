"""Small shared utilities."""

from __future__ import annotations

import functools

import jax


def cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def host_prep(fn):
    """Run a setup-scale function on the host CPU backend.

    Two reasons: (1) on a remote-TPU tunnel every small eager op costs a
    compile round trip; (2) the thermal-integral integrands reach exp
    arguments of O(200), which the axon TPU's emulated f64 exp overflows.
    The hot Cooper-Frye kernels are safe on-device: there overflow means
    feq -> 0 exactly where the contribution is negligible."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        cpu = cpu_device()
        if cpu is not None:
            with jax.default_device(cpu):
                return fn(*args, **kwargs)
        return fn(*args, **kwargs)

    return wrapper
