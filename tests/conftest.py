"""Test configuration: run on a virtual 8-device CPU mesh with fp64.

Mirrors the reference's "mpirun -np N on one box" testing pattern
(SURVEY.md §4.4). NOTE: this environment preloads jax via a sitecustomize
(PYTHONPATH=/root/.axon_site) and sets JAX_PLATFORMS=axon (the real TPU
tunnel), so env vars are too late here — we must redirect to CPU through
jax.config before any backend initialization. Tests must never contend for
the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402 (usually already imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)
