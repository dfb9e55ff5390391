"""Phased (sector) array probe family tests."""

import os

import jax.numpy as jnp
import numpy as np

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.probe.transducer import element_layout
from mcray_tpu.scene.compile import load_and_compile

SCENE = os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene")


def test_phased_layout_geometry():
    cfg = small_test_config(transducer_elements=16, probe_type="phased")
    pos, dirs = element_layout(jnp.zeros(3), jnp.zeros(3), cfg)
    p = np.asarray(pos)
    d = np.asarray(dirs)
    # all beams emitted from the sector apex (the probe position), matching
    # the radius->0 scan-conversion model (advisor finding r1)
    np.testing.assert_allclose(p, 0.0, atol=1e-7)
    # beams steered uniformly across the sector, unit length, symmetric
    total = cfg.transducer_amplitude_rad
    steer = np.arctan2(d[:, 0], d[:, 1])
    expected = -(total / 2.0) + total * (np.arange(16) + 0.5) / 16
    np.testing.assert_allclose(steer, expected, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)


def test_phased_scan_maps_sector_apex():
    from mcray_tpu.ops.imaging import scan_conversion_maps

    cfg = small_test_config(transducer_elements=16, probe_type="phased")
    map_row, map_col = scan_conversion_maps(cfg)
    assert map_row.shape == (cfg.bmode_rows, cfg.bmode_cols)
    # radius->0 limit: the apex row maps to RF row 0 at the top-center
    assert abs(map_row[0, cfg.bmode_cols // 2]) < cfg.rf_rows * 0.01


def test_phased_probe_end_to_end():
    cfg = small_test_config(
        transducer_elements=32, samples_per_element=2, probe_type="phased"
    )
    pack = load_and_compile(SCENE, cfg)
    sim = Simulator(pack, cfg)
    out = sim.render_frame(seed=0)
    b = np.asarray(out["bmode"])
    assert np.isfinite(b).all()
    assert b.max() > 0
