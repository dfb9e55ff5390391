"""Pallas march kernel vs the jnp scatter path (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import march_and_accumulate, trace_paths
from mcray_tpu.ops import texture
from mcray_tpu.ops.pallas.march import march_and_accumulate_pallas
from mcray_tpu.scene.compile import load_and_compile


@pytest.fixture(scope="module")
def setup():
    cfg = small_test_config(transducer_elements=32, samples_per_element=2)
    pack = load_and_compile(
        os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene"),
        cfg,
    )
    scene = {k: jnp.asarray(v) for k, v in pack.trace_tables().items()}
    mats = jnp.asarray(pack.materials)
    segs = trace_paths(
        jax.random.PRNGKey(0), mats,
        jnp.asarray(pack.transducer_position), jnp.asarray(pack.transducer_angles),
        scene, jnp.asarray(pack.spacing), jnp.int32(pack.starting_material), cfg,
    )
    vol = texture.make_texture_volume(jax.random.PRNGKey(1), cfg)
    return cfg, mats, segs, vol


def test_pallas_march_matches_jnp(setup):
    cfg, mats, segs, vol = setup
    ref = np.asarray(march_and_accumulate(segs, mats, vol, cfg))
    out = np.asarray(
        march_and_accumulate_pallas(segs, mats, vol, cfg, interpret=True)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("soft", [False, True])
def test_pallas_march_bitsum_matches_jnp(setup, soft):
    """scatter_rng='bitsum' (transcendental-free dithered-binomial field):
    kernel and jnp paths must still agree — the in-kernel generator is the
    bit-identical twin of texture._bitsum_normal."""
    _, mats, segs, _ = setup
    cfg_b = small_test_config(
        transducer_elements=32, samples_per_element=2, scatter_rng="bitsum",
        soft_scattering=soft, trilinear_texture=soft,
    )
    vol_b = texture.make_texture_volume(jax.random.PRNGKey(1), cfg_b)
    ref = np.asarray(march_and_accumulate(segs, mats, vol_b, cfg_b))
    out = np.asarray(
        march_and_accumulate_pallas(segs, mats, vol_b, cfg_b, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_march_rejects_seedless_table(setup):
    """Externally supplied raw tables (no seeds) cannot use the kernel."""
    cfg, mats, segs, _ = setup
    table_vol = {"noise": jnp.zeros((4, 4, 4)), "prob": jnp.zeros((4, 4, 4))}
    with pytest.raises(ValueError):
        march_and_accumulate_pallas(segs, mats, table_vol, cfg, interpret=True)


def test_pallas_march_table_mode_matches_jnp_gather(setup):
    """texture_mode='table': the jnp path gathers from the materialised
    table; the kernel evaluates the hash field the table was filled from.
    Both must produce the same RF image (VERDICT r3 item 5: table mode no
    longer falls off the fast path). Reference layout: src/volume.h:19-61."""
    cfg, mats, segs, _ = setup
    cfg_t = small_test_config(
        transducer_elements=32, samples_per_element=2, texture_mode="table"
    )
    vol_t = texture.make_texture_volume(jax.random.PRNGKey(1), cfg_t)
    assert "noise" in vol_t and "seeds" in vol_t
    ref = np.asarray(march_and_accumulate(segs, mats, vol_t, cfg_t))
    out = np.asarray(
        march_and_accumulate_pallas(segs, mats, vol_t, cfg_t, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
