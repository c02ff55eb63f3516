"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §7 gate for dist/); TPU-targeted
numerics are validated separately by bench.py on real hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

# The environment's sitecustomize registers a remote-TPU ("axon") PJRT
# plugin and force-sets jax_platforms to "axon,cpu" — overriding the env
# var. Tests must run on local virtual CPU devices, so override it back.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT
