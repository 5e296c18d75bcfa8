"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh via --xla_force_host_platform_device_count (SURVEY.md §7).
Environment must be set before the first `import jax` in the process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Deterministic, host-independent compilation in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's TPU plugin re-exports JAX_PLATFORMS=axon during import,
# so pin the platform through jax.config as well (authoritative).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
