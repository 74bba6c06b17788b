"""Test config: force CPU with 8 virtual devices.

CI / dev machines have no multi-chip TPU; sharding tests run on a virtual
8-device CPU mesh (SURVEY §4). The environment pins JAX_PLATFORMS=axon (the
TPU tunnel) and the plugin re-asserts it at import, so we must both set the
XLA flag before import *and* override the platform via jax.config after.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
