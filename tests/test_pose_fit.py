"""Differentiable probe registration: recover a probe translation offset."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.models.trainer import PoseFitter
from mcray_tpu.scene.compile import load_and_compile

SCENE = os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene")


def test_pose_fit_moves_toward_target():
    cfg = small_test_config(
        transducer_elements=32, samples_per_element=2,
        soft_scattering=True, trilinear_texture=True,
    )
    pack = load_and_compile(SCENE, cfg)
    sim = Simulator(pack, cfg)
    key = jax.random.PRNGKey(3)

    def render(k, pos, ang):
        return sim._render(k, sim.materials, pos, ang, hash(cfg))["bmode"]

    true_pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)
    target = render(key, true_pos, ang)

    start = true_pos + jnp.array([0.0, 0.3, 0.0])
    fitter = PoseFitter(render, start, ang, target, learning_rate=3e-2, fixed_key=key)
    losses = fitter.run(5, verbose=False)

    # The pose loss landscape is speckle-rough (see PoseFitter docstring), so
    # this asserts the MACHINERY — finite losses, flowing gradients, moving
    # parameters — not convergence.
    assert np.isfinite(losses).all()
    assert (np.asarray(fitter.position) != np.asarray(start)).any()
