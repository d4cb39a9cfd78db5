"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the distributed test strategy
(SURVEY §4: "mesh-invariance" replaces the reference's SIMD-vs-generic
equality tests).
"""

import os

# The driver environment exports JAX_PLATFORMS=axon (the TPU tunnel) and
# pre-imports jax at interpreter startup, so env vars set here are already
# snapshotted by jax.config — use config.update instead.  XLA_FLAGS is
# still read by the CPU client at first backend init, so setting it here
# (before any jax.devices() call) works.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
# 64-bit dtypes must survive jnp.asarray for the device-array API tests
jax.config.update("jax_enable_x64", True)

