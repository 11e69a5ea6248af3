"""Test config: run everything on a fake 8-device CPU mesh (SURVEY.md §4.4).

Must set the env vars before jax initializes its backends, so this conftest
is the only place allowed to import jax side-effectfully.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_debug_nans", True)  # SURVEY §5 "race detection" analogue
