"""AD-vs-finite-difference gradient checks.

Monte-Carlo renderers have genuinely discontinuous parameter dependence
(Russian-roulette branch flips, hard scattering threshold), so FD == AD only
holds where the realisation is locally stable. These tests build such
regions: a fixed key, smooth-mode scattering, and perturbations small enough
that no discrete choice flips — there AD must match FD tightly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.ops import physics
from mcray_tpu.scene.compile import load_and_compile

SCENE = os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene")


@pytest.fixture(scope="module")
def sim():
    cfg = small_test_config(
        transducer_elements=16,
        samples_per_element=2,
        soft_scattering=True,
        trilinear_texture=True,
    )
    pack = load_and_compile(SCENE, cfg)
    return Simulator(pack, cfg)


def _loss_fn(sim, key):
    def loss(theta, row, col):
        m = sim.materials.at[row, col].set(theta)
        out = sim._render(
            key, m,
            jnp.asarray(sim.pack.transducer_position),
            jnp.asarray(sim.pack.transducer_angles),
            hash(sim.cfg),
        )
        return jnp.sum(out["bmode"] ** 2)

    return loss


@pytest.mark.parametrize(
    "row,col,eps",
    [
        (3, physics.ATTENUATION, 1e-3),  # LIVER attenuation: smooth Beer-Lambert
        (3, physics.MU0, 1e-3),          # LIVER scattering mean: linear
        (3, physics.SIGMA, 1e-3),        # LIVER scattering std: linear
    ],
)
def test_ad_matches_fd_smooth_params(sim, row, col, eps):
    key = jax.random.PRNGKey(7)
    loss = _loss_fn(sim, key)
    theta0 = float(sim.materials[row, col])

    g_ad = float(jax.grad(loss)(jnp.float32(theta0), row, col))
    # central difference in float32-land: use a larger probe + float64 host math
    lp = float(loss(jnp.float32(theta0 + eps), row, col))
    lm = float(loss(jnp.float32(theta0 - eps), row, col))
    g_fd = (lp - lm) / (2 * eps)

    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    # mu0/sigma enter (locally) linearly -> tight agreement; attenuation is
    # smooth but compounded -> slightly looser
    assert g_fd != 0.0
    np.testing.assert_allclose(g_ad, g_fd, rtol=0.15, err_msg=f"row {row} col {col}")


def test_ad_matches_fd_probe_position(sim):
    key = jax.random.PRNGKey(7)

    def loss(dx):
        pos = jnp.asarray(sim.pack.transducer_position) + jnp.array([dx, 0.0, 0.0])
        out = sim._render(
            key, sim.materials, pos,
            jnp.asarray(sim.pack.transducer_angles), hash(sim.cfg),
        )
        return jnp.sum(out["bmode"] ** 2)

    g_ad = float(jax.grad(loss)(jnp.float32(0.0)))
    # NOTE: FD here is dominated by discrete staircase jumps (march step
    # counts, RF row bins, roulette flips) that AD deliberately treats as
    # zero-measure; the two are not numerically comparable for pose. Assert
    # the AD path itself is finite, nonzero and stable.
    assert np.isfinite(g_ad)
    assert g_ad != 0.0
    g_ad2 = float(jax.grad(loss)(jnp.float32(0.0)))
    assert g_ad == g_ad2
