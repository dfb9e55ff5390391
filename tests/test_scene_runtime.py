"""Scene facade + golden regression statistics.

The golden test pins the fixed-seed CPU render's regional statistics so
physics/imaging drift across refactors is caught. Regenerate the constants
deliberately (see comment) when behaviour changes on purpose.
"""

import os

import jax
import numpy as np
import pytest

SCENE = os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene")


def test_scene_facade_cast_rays():
    from mcray_tpu.config import small_test_config
    from mcray_tpu.scene.runtime import Scene

    cfg = small_test_config(transducer_elements=16, samples_per_element=2)
    sc = Scene(SCENE, cfg)
    sc.step(1000.0)  # no-op, parity API
    segs = sc.cast_rays(jax.random.PRNGKey(0))
    assert segs["valid"].shape == (cfg.max_depth, 16 * 2)
    assert int(segs["valid"].sum()) > 0
    # unit helpers
    assert sc.distance([0, 0, 0], [1, 0, 0]) == pytest.approx(10.0)
    assert sc.distance_in_mm([0, 0, 0], [1, 0, 0]) == pytest.approx(10.0)
    np.testing.assert_allclose(sc.enlarge([1, 0, 0], 100.0), [1.0, 0.0, 0.0])
    assert sc.n_triangles > 0


def test_log_compression_flag():
    from mcray_tpu.config import small_test_config
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.scene.compile import load_and_compile

    cfg = small_test_config(transducer_elements=16, samples_per_element=1)
    cfg_log = small_test_config(
        transducer_elements=16, samples_per_element=1, log_compression=True
    )
    pack = load_and_compile(SCENE, cfg)
    a = np.asarray(Simulator(pack, cfg).render_frame(0)["bmode"])
    b = np.asarray(Simulator(pack, cfg_log).render_frame(0)["bmode"])
    assert np.abs(a - b).max() > 0
    assert b.max() <= 1.0 + 1e-5  # log compression normalises to [~0, 1]


# Golden stats for seed 0, small_test_config(32 elements, 2 samples),
# procedural texture, scatter_rng="bitsum" (the r5 default changed the
# speckle realisation — the r4 boxmuller goldens were rf_sum 162.54349,
# nonzero 0.10773, mean 0.10387, max 2.27137; note how close the
# realisation-level statistics stay). Regenerate with
# REGEN_GOLDEN=1 python -m pytest tests/test_scene_runtime.py -k golden -s
GOLDEN = {
    "rf_sum": 141.08249,
    "rf_nonzero_frac": 0.10786,
    "bmode_mean": 0.09994,
    "bmode_max": 2.22962,
}


def test_golden_render_stats():
    from mcray_tpu.config import small_test_config
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.scene.compile import load_and_compile

    cfg = small_test_config(transducer_elements=32, samples_per_element=2)
    pack = load_and_compile(SCENE, cfg)
    out = Simulator(pack, cfg).render_frame(0)
    rf = np.asarray(out["rf_raw"])
    bmode = np.asarray(out["bmode"])
    stats = {
        "rf_sum": float(rf.sum()),
        "rf_nonzero_frac": float((rf != 0).mean()),
        "bmode_mean": float(bmode.mean()),
        "bmode_max": float(bmode.max()),
    }
    if os.environ.get("REGEN_GOLDEN"):
        print("\nGOLDEN =", {k: round(v, 5) for k, v in stats.items()})
        return
    for k, v in GOLDEN.items():
        np.testing.assert_allclose(stats[k], v, rtol=1e-3, err_msg=k)
