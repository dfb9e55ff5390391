"""Pallas TPU kernel: packet BVH traversal (closest hit).

The TPU-native answer to "BVH traversal on TPU is hostile to per-ray stacks"
(SURVEY.md §7 hard parts): rays are processed in coherent PACKETS of 128
(one vector lane each) that share a single traversal stack held in SMEM.
Control flow is scalar (one while_loop per packet over the shared stack);
all geometry math is vector:

- node step: test the packet's 128 rays against the node AABB (VPU); if ANY
  ray with a potentially-closer hit enters, descend (push the far child).
- leaf step: Moller-Trumbore of leaf triangles x 128 rays, running
  closest-hit update per lane.

For the convex-probe fan the primary rays are strongly coherent, so packets
prune nearly as well as per-ray traversal while keeping the VPU full. The
flat BVH layout comes from the native C++ SAH builder (ops/bvh.py contract):
inner meta = (right_child, -1) with left child at node+1, leaf = (first,
count) into tri_order.

Triangles are pre-gathered into BVH order and PADDED so every leaf can be
read as a fixed-size (LEAF_PAD) slab — data-independent shapes inside the
loop, which is what Mosaic needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import NO_HIT_T, normalize

TILE_R = 128
LEAF_PAD = 8
STACK_DEPTH = 64


def pad_bvh_leaves(nodes, meta, tri_order, tris, tri_mesh_id, leaf_pad: int = LEAF_PAD):
    """Host-side: re-lay leaf triangles into fixed (n_leaves, leaf_pad) slabs.

    Returns (meta2 (N,2) with leaves -> (slab_row, -2), tri_soa (L*leaf_pad, 9),
    tri_ids (L*leaf_pad,)) where padding entries are degenerate (never hit).
    """
    nodes = np.asarray(nodes)
    meta = np.asarray(meta)
    tri_order = np.asarray(tri_order)
    tris = np.asarray(tris)
    tri_mesh_id = np.asarray(tri_mesh_id)

    leaf_rows = np.where(meta[:, 1] >= 0)[0]
    n_leaves = len(leaf_rows)
    tri_soa = np.zeros((n_leaves * leaf_pad, 9), np.float32)
    tri_ids = np.full((n_leaves * leaf_pad,), -1, np.int32)
    meta2 = meta.copy()
    for slab, row in enumerate(leaf_rows):
        first, count = meta[row]
        assert count <= leaf_pad, "leaf larger than LEAF_PAD; rebuild with smaller leaf_size"
        idx = tri_order[first : first + count]
        t = tris[idx]  # (count, 3, 3)
        v0 = t[:, 0]
        e1 = t[:, 1] - t[:, 0]
        e2 = t[:, 2] - t[:, 0]
        tri_soa[slab * leaf_pad : slab * leaf_pad + count] = np.concatenate(
            [v0, e1, e2], axis=1
        )
        tri_ids[slab * leaf_pad : slab * leaf_pad + count] = idx
        meta2[row] = (slab, -2)  # -2 marks "leaf, slab index"
    return meta2, tri_soa, tri_ids


def _packet_kernel(
    rays_ref,      # (6, TILE_R) VMEM [o.xyz, seg.xyz]
    nodes_ref,     # (N, 8) VMEM: [min.xyz, max.xyz, meta0, meta1] as f32
    tris_ref,      # (L*LEAF_PAD, 9) VMEM (ANY/HBM for big scenes)
    t_ref,         # out (1, TILE_R)
    idx_ref,       # out (1, TILE_R) winning slab-slot index (i32)
    stack_ref,     # SMEM (STACK_DEPTH,) i32 scratch
    *,
    eps: float,
):
    ox = rays_ref[0, :].reshape(1, TILE_R)
    oy = rays_ref[1, :].reshape(1, TILE_R)
    oz = rays_ref[2, :].reshape(1, TILE_R)
    sx = rays_ref[3, :].reshape(1, TILE_R)
    sy = rays_ref[4, :].reshape(1, TILE_R)
    sz = rays_ref[5, :].reshape(1, TILE_R)

    big = jnp.float32(1e30)

    def inv(c):
        ok = jnp.abs(c) > 1e-30
        return jnp.where(ok, 1.0 / jnp.where(ok, c, 1.0), big)

    ix_, iy_, iz_ = inv(sx), inv(sy), inv(sz)

    t_ref[:] = jnp.full_like(t_ref, NO_HIT_T)
    idx_ref[:] = jnp.zeros_like(idx_ref)
    stack_ref[0] = 0

    def cond(state):
        sp = state
        return sp > 0

    def body(state):
        sp = state
        sp = sp - 1
        node = stack_ref[sp]

        bminx = nodes_ref[node, 0]
        bminy = nodes_ref[node, 1]
        bminz = nodes_ref[node, 2]
        bmaxx = nodes_ref[node, 3]
        bmaxy = nodes_ref[node, 4]
        bmaxz = nodes_ref[node, 5]
        m0 = nodes_ref[node, 6].astype(jnp.int32)
        m1 = nodes_ref[node, 7].astype(jnp.int32)

        # vector slab test for the whole packet
        tx0 = (bminx - ox) * ix_
        tx1 = (bmaxx - ox) * ix_
        ty0 = (bminy - oy) * iy_
        ty1 = (bmaxy - oy) * iy_
        tz0 = (bminz - oz) * iz_
        tz1 = (bmaxz - oz) * iz_
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        leave = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        active = (enter <= leave) & (leave > 0.0) & (enter < jnp.minimum(t_ref[:], 1.0))
        any_active = jnp.any(active)

        is_leaf = m1 == -2

        @pl.when(any_active & is_leaf)
        def _():
            base = m0 * LEAF_PAD
            for k in range(LEAF_PAD):  # static unroll over the leaf slab
                row = base + k
                v0x, v0y, v0z = tris_ref[row, 0], tris_ref[row, 1], tris_ref[row, 2]
                e1x, e1y, e1z = tris_ref[row, 3], tris_ref[row, 4], tris_ref[row, 5]
                e2x, e2y, e2z = tris_ref[row, 6], tris_ref[row, 7], tris_ref[row, 8]
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
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (sx * qx + sy * qy + sz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > 0.0) & (t < 1.0) & (t < t_ref[:])
                )
                t_ref[:] = jnp.where(ok, t, t_ref[:])
                idx_ref[:] = jnp.where(ok, row, idx_ref[:])

        push = any_active & ~is_leaf

        @pl.when(push)
        def _():
            stack_ref[sp] = m0          # right child
            stack_ref[sp + 1] = node + 1  # left child popped first

        sp = jnp.where(push, sp + 2, sp)
        return sp

    jax.lax.while_loop(cond, body, jnp.int32(1))


def bvh_packet_intersect(
    origins: jax.Array,
    seg_vecs: jax.Array,
    packed,  # dict from pack_bvh_for_kernel
    *,
    interpret: bool = False,
    eps: float = 1e-9,
):
    """Closest hit via packet traversal; same contract as intersect_closest."""
    n = origins.shape[0]
    n_pad = (-n) % TILE_R
    rays = jnp.concatenate([origins, seg_vecs], axis=1).T
    if n_pad:
        rays = jnp.pad(rays, ((0, 0), (0, n_pad)))
    n_tot = n + n_pad

    kernel = functools.partial(_packet_kernel, eps=eps)
    best_t, best_slot = pl.pallas_call(
        kernel,
        grid=(n_tot // TILE_R,),
        in_specs=[
            pl.BlockSpec((6, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tot), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tot), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(rays, packed["nodes8"], packed["tri_soa"])

    best_t = best_t[0, :n]
    best_slot = best_slot[0, :n]
    hit = best_t < 1.5
    e1 = packed["tri_soa"][best_slot, 3:6]
    e2 = packed["tri_soa"][best_slot, 6:9]
    point = origins + best_t[:, None] * seg_vecs
    face_n = normalize(jnp.cross(e1, e2), eps=1e-20)
    flip = jnp.sum(face_n * seg_vecs, axis=-1) > 0.0
    normal = jnp.where(flip[:, None], -face_n, face_n)
    mesh_of_slot = packed["slot_mesh_id"][best_slot]
    return {
        "hit": hit,
        "t": best_t,
        "point": point,
        "normal": normal,
        "mesh_id": jnp.where(hit, mesh_of_slot, -1).astype(jnp.int32),
    }


def pack_bvh_for_kernel(bvh, tris, tri_mesh_id):
    """Host-side packing of a FlatBVH for the packet kernel."""
    meta2, tri_soa, tri_ids = pad_bvh_leaves(
        bvh.nodes, bvh.meta, bvh.tri_order, tris, tri_mesh_id
    )
    nodes8 = np.concatenate(
        [np.asarray(bvh.nodes, np.float32), meta2.astype(np.float32)], axis=1
    )
    slot_mesh = np.where(
        tri_ids >= 0, np.asarray(tri_mesh_id)[np.maximum(tri_ids, 0)], -1
    ).astype(np.int32)
    return {
        "nodes8": jnp.asarray(nodes8),
        "tri_soa": jnp.asarray(tri_soa),
        "slot_mesh_id": jnp.asarray(slot_mesh),
        "tri_ids": jnp.asarray(tri_ids),
    }
