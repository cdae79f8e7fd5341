"""Test harness config: force an 8-device virtual CPU mesh so sharding /
collective code paths run for real in CI without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin prepends itself to JAX_PLATFORMS; override it
# so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def flame_model_arrays():
    from dad3dheads_tpu import assets

    return assets.load_flame_model()


@pytest.fixture(scope="session")
def flame_model():
    from dad3dheads_tpu.core import FlameModel

    return FlameModel.load()


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
