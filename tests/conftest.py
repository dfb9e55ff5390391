"""Test harness config: force pure-CPU JAX with an 8-device virtual mesh.

The environment pins JAX_PLATFORMS to an accelerator plugin; the env var is
not enough to exclude it (the plugin is prepended back), so we set the config
directly before any backend initialises.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def sphere_pack():
    from mcray_tpu.config import small_test_config
    from mcray_tpu.scene.compile import load_and_compile

    cfg = small_test_config()
    pack = load_and_compile(
        os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene"),
        cfg,
        with_bvh=True,
    )
    return pack, cfg
