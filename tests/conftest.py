"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding tests run against
XLA's host-platform device emulation. Must run before jax is imported.
"""

import os

# force CPU even when the ambient environment selects the TPU (axon)
# platform: the axon sitecustomize registers its PJRT plugin at interpreter
# startup and overrides JAX_PLATFORMS, so the env var alone is not enough —
# jax.config.update after import wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA:CPU compiles large sorts very slowly on this box; cache compilations
# across pytest runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/fastk_tpu_xla")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
