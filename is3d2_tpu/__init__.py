"""is3d2_tpu — TPU-native particlization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the iS3D2
particlization code (reference: /root/reference, github.com/xyw2016/iS3D2):
Cooper-Frye conversion of a hydrodynamic freezeout surface into hadrons,
with five viscous delta-f corrections, a Monte-Carlo particle sampler,
spacetime distributions and spin polarization.

Architecture (TPU-first, not a translation):
  - io/        pure-Python readers: parameters, quadrature tables, freezeout
               surfaces (CPU-VH / MUSIC / HIC-EventGen formats), PDG hadron
               lists, delta-f coefficient tables; writers with reference-
               compatible file formats.
  - physics/   pure jittable functions: thermal Gauss-Laguerre integrals,
               local-rest-frame kinematics (Milne tetrad, boosts), delta-f
               coefficient evaluation (cubic-spline / bilinear), anisotropic
               (VAH) variable reconstruction via batched Newton iteration.
  - core/      compute engines: continuous Cooper-Frye spectra (all df modes),
               spacetime distributions, spin polarization, vectorized
               Monte-Carlo sampler on jax.random.
  - ops/       Pallas TPU kernels for the hot Cooper-Frye reduction.
  - parallel/  jax.sharding mesh helpers: freezeout cells / oversampled
               events sharded across chips, psum spectra reduction.

Precision: x64 is enabled at import (the physics is tuned to double
precision; see IS3D2_X64=0 to disable for fast f32 experiments).

Compilation cache: a persistent XLA compilation cache is enabled at
``~/.cache/is3d2_tpu/xla`` (override with IS3D2_XLA_CACHE=<dir>, disable
with IS3D2_XLA_CACHE=0).  On remote-compile TPU tunnels this turns a
cold-start CLI run dominated by kernel compilation (minutes) into seconds.
"""

import os

if os.environ.get("IS3D2_X64", "1") != "0":
    import jax

    jax.config.update("jax_enable_x64", True)

_cache = os.environ.get("IS3D2_XLA_CACHE",
                        os.path.expanduser("~/.cache/is3d2_tpu/xla"))
if _cache and _cache != "0":
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache)
    # cache tiny programs too: the driver setup stage alone runs ~80 small
    # host-side jitted ops whose XLA:CPU compiles cost ~3.5 s/process --
    # with min_compile_time 0 they become cache hits (~0.3 s)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from .constants import hbarC, two_pi, two_pi2_hbarC3, four_pi2_hbarC3  # noqa: E402
from .config import Config  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "hbarC",
    "two_pi",
    "two_pi2_hbarC3",
    "four_pi2_hbarC3",
    "Config",
]
