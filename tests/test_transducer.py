"""Convex-array layout tests against the reference's arc construction
(src/transducer.h:41-59)."""

import jax.numpy as jnp
import numpy as np

from mcray_tpu.config import SimConfig
from mcray_tpu.probe.transducer import element_layout


def test_layout_zero_pose_arc():
    cfg = SimConfig(transducer_elements=8)
    pos, dirs = element_layout(jnp.zeros(3), jnp.zeros(3), cfg)
    assert pos.shape == (8, 3)
    d = np.asarray(dirs)
    # unit directions in the xy plane (before rotation z=0)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(d[:, 2], 0.0, atol=1e-7)
    # positions = radius_cm * direction (position at origin)
    np.testing.assert_allclose(np.asarray(pos), 3.0 * d, atol=1e-6)
    # symmetric about the y axis
    np.testing.assert_allclose(d[:4, 0], -d[7:3:-1, 0], atol=1e-6)
    # total angular span = pitch * (N-1); pitch = separation/radius
    pitch = cfg.element_separation_mm / 30.0
    ang = np.arctan2(d[:, 0], d[:, 1])
    np.testing.assert_allclose(ang[-1] - ang[0], pitch * 7, rtol=1e-5)
    # first element angle = -(pitch*N/2) + pitch/2
    np.testing.assert_allclose(ang[0], -(pitch * 8 / 2) + pitch / 2, rtol=1e-5)


def test_layout_rotation_minus_90_z():
    # sphere.scene pose: angles [0,0,-90] turns the fan from +y to +x
    cfg = SimConfig(transducer_elements=4)
    pos, dirs = element_layout(
        jnp.array([-13.5, 0.0, 0.0]), jnp.array([0.0, 0.0, -90.0]), cfg
    )
    d = np.asarray(dirs)
    assert (d[:, 0] > 0.9).all()  # all point roughly +x
    p = np.asarray(pos)
    np.testing.assert_allclose(p[:, 0], -13.5 + 3.0 * d[:, 0], atol=1e-5)


def test_full_aperture_span():
    cfg = SimConfig()
    _, dirs = element_layout(jnp.zeros(3), jnp.zeros(3), cfg)
    d = np.asarray(dirs)
    ang = np.arctan2(d[:, 0], d[:, 1])
    # 512 elements spanning ~60 degrees
    np.testing.assert_allclose(np.degrees(ang[-1] - ang[0]), 60.0 * 511 / 512, rtol=1e-4)
