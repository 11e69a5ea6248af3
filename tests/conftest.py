"""Test config: run everything on a fake 8-device CPU mesh (SURVEY.md §4.4).

The sandbox presets JAX_PLATFORMS=axon (tunneled TPU) and a sitecustomize that
imports jax before any test code runs, so env vars alone cannot retarget the
backend — jax.config.update can, as long as no backend has initialized yet.
Compiles over the axon tunnel take minutes; tests must stay on host CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# adaptive-shape hints must not leak between test runs (or in from bench
# runs): tests exercise exact capacity/overflow behaviors
os.environ["SLAMEM_ADAPTIVE_DISK"] = "0"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# SURVEY.md §5 race-detection analogue: the engine is integer-only, so any
# NaN appearing anywhere is a logic bug — make it fail loudly in CI.
jax.config.update("jax_debug_nans", True)
