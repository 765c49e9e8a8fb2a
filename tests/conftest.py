"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon sitecustomize registers the TPU backend into every python process
and force-selects it via jax.config, so env vars alone are not enough —
we must re-pin the platform through jax.config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# IS3D2_TPU_TESTS=1 keeps the real TPU backend so tests/test_pallas_tpu.py
# can compile Mosaic kernels on silicon; everything else runs on the
# virtual CPU mesh
if not os.environ.get("IS3D2_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir() -> Path:
    return REFERENCE
