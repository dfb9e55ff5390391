"""Native C++ runtime (OBJ parser + SAH BVH builder) vs Python oracles.
Skipped when native/libmcray_native.so has not been built (make -C native)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.utils.native import get_native

native = get_native()
pytestmark = pytest.mark.skipif(native is None, reason="native lib not built")


def test_obj_parser_matches_python(tmp_path):
    from mcray_tpu.scene.obj import _load_obj_py, save_obj
    from mcray_tpu.scene.primitives import sphere_mesh

    path = str(tmp_path / "s.obj")
    save_obj(path, *sphere_mesh(2.5))
    nv, nf = native.load_obj(path)
    pv, pf = _load_obj_py(path)
    np.testing.assert_allclose(nv, pv, rtol=1e-6)
    np.testing.assert_array_equal(nf, pf)


def test_obj_parser_quads_and_negative_indices(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"        # quad -> 2 tris
        "f -4 -3 -2\n"       # negative (relative) indices
        "f 1/1/1 2/2/2 3/3/3\n"  # with vt/vn
    )
    nv, nf = native.load_obj(str(p))
    from mcray_tpu.scene.obj import _load_obj_py

    pv, pf = _load_obj_py(str(p))
    np.testing.assert_array_equal(nf, pf)
    assert nf.shape == (4, 3)


def test_sah_bvh_traversal_matches_brute_force(rng):
    from mcray_tpu.ops.bvh import bvh_intersect_closest
    from mcray_tpu.ops.geometry import intersect_closest

    centers = rng.uniform(-5, 5, (400, 1, 3))
    tris = (centers + rng.standard_normal((400, 3, 3)) * 0.8).astype(np.float32)
    mid = rng.integers(0, 4, (400,)).astype(np.int32)
    nodes, meta, order = native.build_bvh(tris)
    assert sorted(order.tolist()) == list(range(400))
    leaves = meta[meta[:, 1] >= 0]
    assert leaves[:, 1].sum() == 400
    assert leaves[:, 1].max() <= 4

    o = jnp.asarray(rng.uniform(-6, 6, (60, 3)), jnp.float32)
    seg = jnp.asarray(rng.standard_normal((60, 3)) * 8, jnp.float32)
    a = intersect_closest(o, seg, jnp.asarray(tris), jnp.asarray(mid))
    b = bvh_intersect_closest(
        o, seg, jnp.asarray(tris), jnp.asarray(mid),
        jnp.asarray(nodes), jnp.asarray(meta), jnp.asarray(order),
    )
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]), rtol=1e-4, atol=1e-6)


def test_sah_quality_vs_median_split(rng):
    # SAH tree should not be (much) deeper than the median-split fallback
    from mcray_tpu.ops.bvh import _build_bvh_py

    centers = rng.uniform(-10, 10, (2000, 1, 3))
    tris = (centers + rng.standard_normal((2000, 3, 3)) * 0.3).astype(np.float32)
    nodes, meta, order = native.build_bvh(tris)
    py = _build_bvh_py(tris, leaf_size=4)
    assert nodes.shape[0] <= py.nodes.shape[0] * 1.5
