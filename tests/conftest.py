"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so multi-chip
sharding code is exercised without TPU hardware; the driver separately
compile-checks the TPU path via __graft_entry__.py.

NB: this environment's sitecustomize registers a remote-TPU PJRT
plugin ("axon", JAX_PLATFORMS=axon with remote compile) at interpreter
startup — i.e. jax is already imported before pytest loads this file.
Env vars alone are therefore too late; jax.config.update below forces
the local CPU backend before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() >= 8, "expected the 8-device virtual CPU mesh"
