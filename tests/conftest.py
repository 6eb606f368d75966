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
