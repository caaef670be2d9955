"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware.

Note: this image's ``sitecustomize`` registers a remote-TPU (axon) PJRT
backend at interpreter startup and pins ``JAX_PLATFORMS=axon``, so plain env
vars in conftest are too late — we must override via ``jax.config`` before the
first backend use. Unit tests on the tunneled TPU are ~100x slower than local
CPU and only see one device.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
