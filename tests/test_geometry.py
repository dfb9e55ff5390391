"""Ray-triangle intersection and rotation tests (brute force vs BVH vs
closed-form)."""

import jax.numpy as jnp
import numpy as np

from mcray_tpu.ops.bvh import _build_bvh_py, bvh_intersect_closest, build_bvh
from mcray_tpu.ops.geometry import euler_zxy, intersect_closest, rotate


def test_rotate_matches_rodrigues(rng):
    v = jnp.asarray(rng.standard_normal((10, 3)), jnp.float32)
    axis = jnp.array([0.0, 0.0, 1.0])
    out = rotate(v, axis, jnp.float32(np.pi / 2))
    # rotation about z by 90 deg: (x,y,z) -> (-y, x, z)
    expected = np.stack([-np.asarray(v)[:, 1], np.asarray(v)[:, 0], np.asarray(v)[:, 2]], -1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_euler_zxy_identity():
    v = jnp.array([[1.0, 2.0, 3.0]])
    out = euler_zxy(v, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0, 3.0]], atol=1e-6)


def _single_triangle():
    tris = jnp.array([[[-1.0, -1.0, 5.0], [1.0, -1.0, 5.0], [0.0, 1.0, 5.0]]])
    mid = jnp.array([7], jnp.int32)
    return tris, mid


def test_intersect_hit_and_normal_orientation():
    tris, mid = _single_triangle()
    o = jnp.array([[0.0, 0.0, 0.0]])
    seg = jnp.array([[0.0, 0.0, 10.0]])
    out = intersect_closest(o, seg, tris, mid)
    assert bool(out["hit"][0])
    np.testing.assert_allclose(float(out["t"][0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["point"]), [[0, 0, 5.0]], atol=1e-5)
    # normal faces the origin side (negative z here), regardless of winding
    assert float(out["normal"][0, 2]) < 0
    assert int(out["mesh_id"][0]) == 7
    # from the other side, the normal flips toward that origin
    out2 = intersect_closest(
        jnp.array([[0.0, 0.0, 10.0]]), jnp.array([[0.0, 0.0, -10.0]]), tris, mid
    )
    assert float(out2["normal"][0, 2]) > 0


def test_intersect_miss_cases():
    tris, mid = _single_triangle()
    o = jnp.array([[0.0, 0.0, 0.0]] * 3)
    segs = jnp.array(
        [
            [0.0, 0.0, 4.0],   # too short (t would be 1.25)
            [5.0, 0.0, 10.0],  # passes outside the triangle
            [0.0, 0.0, -10.0], # opposite direction
        ]
    )
    out = intersect_closest(o, segs, tris, mid)
    assert not np.asarray(out["hit"]).any()
    assert (np.asarray(out["mesh_id"]) == -1).all()


def test_closest_of_two():
    tris = jnp.array(
        [
            [[-1, -1, 5.0], [1, -1, 5.0], [0, 1, 5.0]],
            [[-1, -1, 3.0], [1, -1, 3.0], [0, 1, 3.0]],
        ]
    )
    mid = jnp.array([0, 1], jnp.int32)
    out = intersect_closest(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, 10.0]]), tris, mid
    )
    assert int(out["mesh_id"][0]) == 1
    np.testing.assert_allclose(float(out["t"][0]), 0.3, atol=1e-6)


def _random_scene(rng, t=200):
    centers = rng.uniform(-5, 5, (t, 1, 3))
    tris = centers + rng.standard_normal((t, 3, 3)) * 0.8
    mid = rng.integers(0, 4, (t,)).astype(np.int32)
    return jnp.asarray(tris, jnp.float32), jnp.asarray(mid)


def test_chunked_matches_unchunked(rng):
    tris, mid = _random_scene(rng)
    o = jnp.asarray(rng.uniform(-6, 6, (50, 3)), jnp.float32)
    seg = jnp.asarray(rng.standard_normal((50, 3)) * 8, jnp.float32)
    a = intersect_closest(o, seg, tris, mid)
    b = intersect_closest(o, seg, tris, mid, chunk=64)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a["mesh_id"]), np.asarray(b["mesh_id"]))


def test_bvh_matches_brute_force(rng):
    tris, mid = _random_scene(rng, t=300)
    bvh = _build_bvh_py(np.asarray(tris), leaf_size=4)
    o = jnp.asarray(rng.uniform(-6, 6, (80, 3)), jnp.float32)
    seg = jnp.asarray(rng.standard_normal((80, 3)) * 8, jnp.float32)
    a = intersect_closest(o, seg, tris, mid)
    b = bvh_intersect_closest(
        o, seg, tris, mid,
        jnp.asarray(bvh.nodes), jnp.asarray(bvh.meta), jnp.asarray(bvh.tri_order),
    )
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]), rtol=1e-4, atol=1e-6)
    hit = np.asarray(a["hit"])
    np.testing.assert_array_equal(
        np.asarray(a["mesh_id"])[hit], np.asarray(b["mesh_id"])[hit]
    )


def test_bvh_covers_all_triangles(rng):
    tris, _ = _random_scene(rng, t=123)
    bvh = build_bvh(np.asarray(tris))
    assert sorted(bvh.tri_order.tolist()) == list(range(123))
    # leaves cover tri_order exactly once
    leaves = bvh.meta[bvh.meta[:, 1] >= 0]
    assert leaves[:, 1].sum() == 123
