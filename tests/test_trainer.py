"""Differentiable-fit tests: gradients are finite/nonzero and a short fit
reduces pixel loss toward a perturbed-material target."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.models.trainer import MaterialFitter
from mcray_tpu.scene.compile import load_and_compile


@pytest.fixture(scope="module")
def sim():
    cfg = small_test_config(
        soft_scattering=True, trilinear_texture=True,
        transducer_elements=32, samples_per_element=2,
    )
    pack = load_and_compile(
        os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene"),
        cfg,
    )
    return Simulator(pack, cfg)


def _render_fn(sim):
    def f(key, materials):
        out = sim._render(
            key, materials,
            jnp.asarray(sim.pack.transducer_position),
            jnp.asarray(sim.pack.transducer_angles),
            hash(sim.cfg),
        )
        return out["bmode"]
    return f


def test_fit_reduces_loss(sim):
    render = _render_fn(sim)
    key = jax.random.PRNGKey(123)
    target = render(key, sim.materials)

    # perturb LIVER attenuation and fit it back with frozen speckle
    from mcray_tpu.ops.physics import ATTENUATION

    perturbed = np.asarray(sim.materials).copy()
    liver = 3
    perturbed[liver, ATTENUATION] *= 2.0

    fitter = MaterialFitter(
        render, jnp.asarray(perturbed), target, learning_rate=5e-2,
        trainable=(ATTENUATION,), trainable_rows=[liver], fixed_key=key,
    )
    losses = fitter.run(30, verbose=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    # the recovered attenuation moved toward the true value (0.7 from 1.4)
    fitted = float(fitter.state.materials[liver, ATTENUATION])
    assert fitted < 1.2, fitted


def test_grad_nonzero_for_scene_materials(sim):
    render = _render_fn(sim)
    target = jnp.zeros((sim.cfg.bmode_rows, sim.cfg.bmode_cols))

    def loss(m):
        return jnp.mean((render(jax.random.PRNGKey(0), m) - target) ** 2)

    g = np.asarray(jax.grad(loss)(sim.materials))
    assert np.isfinite(g).all()
    # GEL (starting medium) and LIVER (box) must receive gradient
    
    assert np.abs(g[0]).sum() > 0  # GEL row
    assert np.abs(g[3]).sum() > 0  # LIVER row
