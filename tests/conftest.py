"""Test configuration: force CPU backend with a simulated 8-device mesh.

Multi-host TPU behaviour is tested on CPU via XLA's host-platform device-count
override (SURVEY.md §4 implication 5) so collectives and shardings run without
a pod.  The environment's axon boot hook pins JAX_PLATFORMS=axon before
conftest runs, so the platform must be overridden through jax.config after
import (env vars alone are too late/too early).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache for the CPU test backend: most of the
# fast tier's wall time is hundreds of CPU compiles, and on CPU the cache
# works normally (unlike the axon remote backend, where cache-deserialized
# executables run ~250x slower — docs/STATUS.md harness facts — which is
# why bench.py must NOT set this).  Cold tier ~8 min; warm re-runs drop to
# the developer-loop contract.  Delete .pytest_jax_cache to force cold.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".pytest_jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
