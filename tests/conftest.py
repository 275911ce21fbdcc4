"""Test config: run the suite on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding tests run against
XLA's host-platform virtual devices instead (same SPMD partitioner, same
collectives lowering).

Note: this image's sitecustomize registers a remote "axon" TPU backend and
force-sets ``jax_platforms=axon,cpu`` at interpreter start, so the env-var
route is not enough — we must override the config again after jax imports.
"""

import os

# Set before any backend initializes (CPU client is created lazily).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Override the sitecustomize's jax_platforms=axon,cpu so tests never dial the
# remote TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} ({jax.default_backend()})"
