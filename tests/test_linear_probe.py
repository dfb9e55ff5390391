"""Linear-array probe family tests."""

import os

import jax.numpy as jnp
import numpy as np

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.probe.transducer import element_layout
from mcray_tpu.scene.compile import load_and_compile

SCENE = os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene")


def test_linear_layout_geometry():
    cfg = small_test_config(transducer_elements=16, probe_type="linear")
    pos, dirs = element_layout(jnp.zeros(3), jnp.zeros(3), cfg)
    p = np.asarray(pos)
    d = np.asarray(dirs)
    # all beams parallel +y (unrotated)
    np.testing.assert_allclose(d, np.tile([[0, 1, 0]], (16, 1)), atol=1e-6)
    # elements along x, centered, at the reference element pitch (world units)
    pitch = cfg.element_separation_mm / 10.0
    np.testing.assert_allclose(np.diff(p[:, 0]), pitch, rtol=1e-5)
    np.testing.assert_allclose(p[:, 0].mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(p[:, 1:], 0.0, atol=1e-7)


def test_linear_layout_rotation():
    cfg = small_test_config(transducer_elements=8, probe_type="linear")
    # z-rotation by -90: lateral x -> -y?, beam y -> +x
    pos, dirs = element_layout(jnp.zeros(3), jnp.asarray([0.0, 0.0, -90.0]), cfg)
    d = np.asarray(dirs)
    np.testing.assert_allclose(d, np.tile([[1, 0, 0]], (8, 1)), atol=1e-5)


def test_linear_probe_end_to_end():
    cfg = small_test_config(
        transducer_elements=32, samples_per_element=2, probe_type="linear"
    )
    pack = load_and_compile(SCENE, cfg)
    out = Simulator(pack, cfg).render_frame(0)
    bmode = np.asarray(out["bmode"])
    assert np.isfinite(bmode).all()
    assert bmode.max() > 0
    # rectangular resize: top rows sample near RF row 0
    from mcray_tpu.ops.imaging import scan_conversion_maps

    mr, mc = scan_conversion_maps(cfg)
    assert mr[0, 0] == 0.0
    assert abs(mc[0, -1] - (cfg.bmode_cols - 1) / cfg.bmode_cols * cfg.rf_cols) < 1e-4
