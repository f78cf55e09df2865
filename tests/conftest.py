"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(``parallel/``) is exercised without TPU hardware, per the driver contract.
Must set env vars before the first ``import jax`` anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_compcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers the "axon" TPU tunnel at
# interpreter startup (before conftest) and force-updates jax's platform
# config, which overrides the env vars above.  Point the *config* back at
# CPU too — backends are not initialized yet at collection time, so this
# is still legal.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
