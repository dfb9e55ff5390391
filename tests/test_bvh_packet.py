"""Packet BVH Pallas kernel vs brute force (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.ops.bvh import build_bvh
from mcray_tpu.ops.geometry import intersect_closest
from mcray_tpu.ops.pallas.bvh_packet import bvh_packet_intersect, pack_bvh_for_kernel


def _scene(rng, t):
    centers = rng.uniform(-5, 5, (t, 1, 3))
    tris = (centers + rng.standard_normal((t, 3, 3)) * 0.6).astype(np.float32)
    mid = rng.integers(0, 5, (t,)).astype(np.int32)
    return tris, mid


def test_packet_bvh_matches_brute_force(rng):
    tris, mid = _scene(rng, 900)
    bvh = build_bvh(tris, leaf_size=4)
    packed = pack_bvh_for_kernel(bvh, tris, mid)

    n = 200
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    seg = (rng.standard_normal((n, 3)) * 8).astype(np.float32)
    a = intersect_closest(jnp.asarray(o), jnp.asarray(seg), jnp.asarray(tris), jnp.asarray(mid))
    b = bvh_packet_intersect(jnp.asarray(o), jnp.asarray(seg), packed, interpret=True)

    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]), rtol=1e-5, atol=1e-7)
    hit = np.asarray(a["hit"])
    np.testing.assert_array_equal(np.asarray(a["mesh_id"])[hit], np.asarray(b["mesh_id"])[hit])
    np.testing.assert_allclose(
        np.asarray(a["normal"])[hit], np.asarray(b["normal"])[hit], atol=1e-5
    )


def test_packet_bvh_coherent_fan(rng):
    # coherent packet (the ultrasound fan case): all rays from one origin
    tris, mid = _scene(rng, 600)
    bvh = build_bvh(tris, leaf_size=4)
    packed = pack_bvh_for_kernel(bvh, tris, mid)
    n = 128
    theta = np.linspace(-0.5, 0.5, n)
    o = np.tile(np.array([[-8.0, 0.0, 0.0]], np.float32), (n, 1))
    seg = np.stack([np.cos(theta) * 16, np.sin(theta) * 16, np.zeros(n)], -1).astype(np.float32)
    a = intersect_closest(jnp.asarray(o), jnp.asarray(seg), jnp.asarray(tris), jnp.asarray(mid))
    b = bvh_packet_intersect(jnp.asarray(o), jnp.asarray(seg), packed, interpret=True)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]), rtol=1e-5, atol=1e-7)
