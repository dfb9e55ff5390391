"""Pallas TPU kernel: tiled brute-force closest-hit ray-triangle intersection.

The jnp brute force (ops.geometry.intersect_closest) materialises ~10
(N_rays, T) intermediates in HBM per bounce — for the ircad-scale scenes
(15k+ triangles) that is GBs of HBM traffic per frame. This kernel tiles
rays onto lanes and triangles onto sublanes, keeps the running closest hit
in VMEM across the triangle-tile grid dimension, and streams each triangle
tile once: the (tri x ray) Moller-Trumbore grid never leaves VMEM.

Same hit contract as the jnp path (Bullet both-sided semantics, t in (0,1));
the final hit point / oriented normal / mesh id are gathered per-ray outside
the kernel from the winning triangle index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import NO_HIT_T, normalize

TILE_R = 128   # rays per tile (lanes)
TILE_T = 256   # triangles per tile (sublanes)


def _intersect_kernel(rays_ref, tris_ref, t_ref, idx_ref, *, eps: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, NO_HIT_T)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # rays: (6, TILE_R) [ox oy oz sx sy sz]; broadcast rows over sublanes
    ox = rays_ref[0, :].reshape(1, TILE_R)
    oy = rays_ref[1, :].reshape(1, TILE_R)
    oz = rays_ref[2, :].reshape(1, TILE_R)
    sx = rays_ref[3, :].reshape(1, TILE_R)
    sy = rays_ref[4, :].reshape(1, TILE_R)
    sz = rays_ref[5, :].reshape(1, TILE_R)

    # tris: (9, TILE_T) [v0 e1 e2 xyz]; broadcast columns over lanes
    def trow(f):
        return tris_ref[f, :].reshape(TILE_T, 1)

    v0x, v0y, v0z = trow(0), trow(1), trow(2)
    e1x, e1y, e1z = trow(3), trow(4), trow(5)
    e2x, e2y, e2z = trow(6), trow(7), trow(8)

    # pvec = seg x e2
    px = sy * e2z - sz * e2y
    py = sz * e2x - sx * e2z
    pz = sx * e2y - sy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det_ok = jnp.abs(det) > eps
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (sx * qx + sy * qy + sz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    valid = det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (t < 1.0)
    t = jnp.where(valid, t, NO_HIT_T)  # (TILE_T, TILE_R)

    tmin = jnp.min(t, axis=0, keepdims=True)          # (1, TILE_R)
    targ = jnp.argmin(t, axis=0).reshape(1, TILE_R)   # (1, TILE_R)

    better = tmin < t_ref[:]
    t_ref[:] = jnp.where(better, tmin, t_ref[:])
    idx_ref[:] = jnp.where(better, j * TILE_T + targ, idx_ref[:])


def intersect_closest_pallas(
    origins: jax.Array,   # (N, 3)
    seg_vecs: jax.Array,  # (N, 3)
    tris: jax.Array,      # (T, 3, 3)
    tri_mesh_id: jax.Array,
    *,
    interpret: bool = False,
    eps: float = 1e-9,
):
    n = origins.shape[0]
    t_count = tris.shape[0]
    n_pad = (-n) % TILE_R
    t_pad = (-t_count) % TILE_T

    rays = jnp.concatenate([origins, seg_vecs], axis=1).T  # (6, N)
    if n_pad:
        rays = jnp.pad(rays, ((0, 0), (0, n_pad)))
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    tri_soa = jnp.concatenate([v0, e1, e2], axis=1).T  # (9, T)
    if t_pad:
        # zero-padded triangles have det == 0 -> never hit
        tri_soa = jnp.pad(tri_soa, ((0, 0), (0, t_pad)))

    n_tot = n + n_pad
    t_tot = t_count + t_pad
    grid = (n_tot // TILE_R, t_tot // TILE_T)

    kernel = functools.partial(_intersect_kernel, eps=eps)
    best_t, best_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, TILE_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TILE_T), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tot), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tot), jnp.int32),
        ),
        interpret=interpret,
    )(rays, tri_soa)

    best_t = best_t[0, :n]
    best_idx = jnp.minimum(best_idx[0, :n], t_count - 1)
    hit = best_t < 1.5
    point = origins + best_t[:, None] * seg_vecs
    face_n = normalize(jnp.cross(e1[best_idx], e2[best_idx]), eps=1e-20)
    flip = jnp.sum(face_n * seg_vecs, axis=-1) > 0.0
    normal = jnp.where(flip[:, None], -face_n, face_n)
    return {
        "hit": hit,
        "t": best_t,
        "point": point,
        "normal": normal,
        "mesh_id": jnp.where(hit, tri_mesh_id[best_idx], -1).astype(jnp.int32),
    }
