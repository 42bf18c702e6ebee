"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env *before* jax is imported anywhere in the test process —
pytest imports this conftest before any test module.
"""

import os

# LT_TEST_TPU=1 runs the suite against the real chip instead (the
# tpu_only-marked tests un-skip; CPU-mesh sharding tests still pass on
# the single chip's trivial mesh where applicable).
_USE_TPU = os.environ.get("LT_TEST_TPU", "") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU harness pre-pends its platform to jax_platforms regardless of
# the env var; force pure-CPU so tests run on the virtual 8-device mesh.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
