"""Test configuration: run on a virtual 8-device CPU mesh with fp64.

Mirrors the reference's "mpirun -np N on one box" testing pattern
(SURVEY.md §4.4) via XLA's host-platform device-count flag. Must set env
vars before the first jax import anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
