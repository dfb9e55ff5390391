"""Statistical parity of the sequential C++ baseline vs the JAX renderer.

native/ref_baseline.cpp is the measured CPU baseline (BASELINE.md): a
single-threaded re-implementation of the reference's frame algorithm. Its
RNG stream differs from the keyed JAX one, so parity is distributional
(SURVEY.md §4): on the same scene and workload, B-mode/RF statistics over a
few seeds must agree within Monte-Carlo tolerance. This pins the baseline to
the same computation it is benchmarked against — a timing of a *different*
algorithm would be worthless.

Skipped when the native library is not built (run `make -C native`).
"""

import ctypes
import os

import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.ops import imaging
from mcray_tpu.ops import psf as psf_mod
from mcray_tpu.scene.compile import load_and_compile
from mcray_tpu.utils.native import _LIB_PATH

pytestmark = pytest.mark.skipif(
    not os.path.exists(_LIB_PATH), reason="native lib not built (make -C native)"
)

c_fp = ctypes.POINTER(ctypes.c_float)
c_ip = ctypes.POINTER(ctypes.c_int32)


def _fp(a):
    return a.ctypes.data_as(c_fp)


def _run_cpp_frame(lib, pack, cfg, positions, directions, vol_noise, vol_prob, seed):
    ax = psf_mod.axial_kernel_np(cfg)
    lat = psf_mod.lateral_kernel_np(cfg)
    map_row, map_col = imaging.scan_conversion_maps(cfg)
    tris = np.ascontiguousarray(pack.tris, np.float32)
    bvh = lib.mcray_ref_prepare(_fp(tris), ctypes.c_int(pack.n_triangles))
    bmode = np.zeros((cfg.bmode_rows, cfg.bmode_cols), np.float32)
    rf_raw = np.zeros((cfg.rf_rows, cfg.rf_cols), np.float32)
    stage_ms = np.zeros(4, np.float64)
    counters = np.zeros(3, np.int64)
    rc = lib.mcray_ref_frame(
        ctypes.c_void_p(bvh),
        _fp(tris), ctypes.c_int(pack.n_triangles),
        np.ascontiguousarray(pack.tri_mesh_id, np.int32).ctypes.data_as(c_ip),
        np.ascontiguousarray(pack.mesh_mat_inside, np.int32).ctypes.data_as(c_ip),
        np.ascontiguousarray(pack.mesh_mat_outside, np.int32).ctypes.data_as(c_ip),
        np.ascontiguousarray(pack.mesh_is_vascular, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        _fp(np.ascontiguousarray(pack.materials, np.float32)),
        ctypes.c_int(pack.n_materials),
        _fp(positions), _fp(directions), ctypes.c_int(cfg.transducer_elements),
        ctypes.c_int(cfg.samples_per_element), ctypes.c_int(cfg.max_depth),
        ctypes.c_int(pack.starting_material),
        _fp(np.ascontiguousarray(pack.spacing, np.float32)),
        _fp(vol_noise), _fp(vol_prob), ctypes.c_int(cfg.volume_size),
        ctypes.c_float(cfg.resolution_um / 1000.0),
        ctypes.c_float(cfg.transducer_frequency),
        ctypes.c_float(cfg.speed_of_sound),
        ctypes.c_float(float(cfg.max_travel_time_us)),
        ctypes.c_float(cfg.axial_resolution_mm),
        ctypes.c_int(cfg.axial_resolution_um),
        ctypes.c_float(cfg.intensity_epsilon),
        ctypes.c_float(cfg.ray_start_offset),
        _fp(ax), ctypes.c_int(ax.shape[0]), _fp(lat), ctypes.c_int(lat.shape[0]),
        _fp(map_row), _fp(map_col),
        ctypes.c_int(cfg.bmode_rows), ctypes.c_int(cfg.bmode_cols),
        ctypes.c_int(cfg.rf_rows), ctypes.c_uint64(seed),
        _fp(bmode), _fp(rf_raw),
        stage_ms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        counters.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
    )
    lib.mcray_ref_free(ctypes.c_void_p(bvh))
    assert rc == 0
    return bmode, rf_raw, counters


@pytest.fixture(scope="module")
def setup():
    cfg = small_test_config(texture_mode="table")
    here = os.path.dirname(__file__)
    pack = load_and_compile(
        os.path.join(here, "..", "assets", "sphere", "sphere.scene"), cfg
    )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mcray_ref_frame.restype = ctypes.c_int
    lib.mcray_ref_prepare.restype = ctypes.c_void_p
    lib.mcray_ref_free.argtypes = [ctypes.c_void_p]

    from mcray_tpu.probe.transducer import element_layout

    positions, directions = element_layout(
        pack.transducer_position, pack.transducer_angles, cfg
    )
    positions = np.ascontiguousarray(np.asarray(positions), np.float32)
    directions = np.ascontiguousarray(np.asarray(directions), np.float32)
    return cfg, pack, lib, positions, directions


def test_cpp_baseline_statistics_match_jax(setup):
    cfg, pack, lib, positions, directions = setup
    rng = np.random.default_rng(7)
    v = cfg.volume_size
    vol_noise = rng.standard_normal((v, v, v)).astype(np.float32)
    vol_prob = rng.standard_normal((v, v, v)).astype(np.float32)

    seeds = (1, 2, 3)
    cpp_rf_mean = cpp_rf_energy = cpp_nonzero = 0.0
    for s in seeds:
        bmode, rf, counters = _run_cpp_frame(
            lib, pack, cfg, positions, directions, vol_noise, vol_prob, s
        )
        assert counters[0] > 0 and counters[2] > 0
        cpp_rf_mean += float(rf.mean()) / len(seeds)
        cpp_rf_energy += float(np.abs(rf).mean()) / len(seeds)
        cpp_nonzero += float((bmode != 0).mean()) / len(seeds)

    sim = Simulator(pack, cfg)
    jax_rf_mean = jax_rf_energy = jax_nonzero = 0.0
    for s in seeds:
        out = sim.render_frame(seed=s)
        rf = np.asarray(out["rf_raw"])
        bm = np.asarray(out["bmode"])
        jax_rf_mean += float(rf.mean()) / len(seeds)
        jax_rf_energy += float(np.abs(rf).mean()) / len(seeds)
        jax_nonzero += float((bm != 0).mean()) / len(seeds)

    # Monte-Carlo tolerance: same algorithm, independent RNG streams.
    assert abs(cpp_rf_energy - jax_rf_energy) / max(jax_rf_energy, 1e-12) < 0.25, (
        cpp_rf_energy,
        jax_rf_energy,
    )
    assert abs(cpp_nonzero - jax_nonzero) < 0.1, (cpp_nonzero, jax_nonzero)
    # mean echo amplitude is small relative to energy (signed speckle):
    # check it has the same scale on both paths
    assert abs(cpp_rf_mean - jax_rf_mean) < 0.5 * max(cpp_rf_energy, jax_rf_energy)
