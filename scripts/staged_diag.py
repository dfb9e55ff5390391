"""Staged-intersect diagnostics: where do the ms go at 200k triangles?

Times the two-level staged kernel with (a) real AABBs, (b) all boxes forced
empty (pure super-loop overhead), (c) all boxes forced infinite (every
cluster DMA'd + tested = upper bound), plus survival-rate statistics computed
in numpy for the real boxes.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=200000)
    ap.add_argument("--rays", type=int, default=2560)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from mcray_tpu.ops.pallas.intersect import (
        CulledTris, intersect_closest_staged, pack_tris_culled, TILE_R, TILE_T, SUPER_G,
    )
    from scripts.stress_bench import build_scene_arrays
    from mcray_tpu.ops.bvh import build_bvh

    tris, mids = build_scene_arrays(args.tris)
    bvh = build_bvh(tris)
    origin = np.array([0.0, -8.0, 0.0], np.float32)
    packed = pack_tris_culled(tris, mids, bvh.tri_order, sort_origin=origin)
    print(f"tris {args.tris}: {packed.n_clusters} clusters, {packed.n_super} supers")

    rng = np.random.default_rng(1)
    # probe-ish rays: common origin region, fanning directions
    origins = origin + rng.normal(0, 0.3, (args.rays, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (args.rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    seg = (dirs * 25.0).astype(np.float32)
    o_j, s_j = jnp.asarray(origins), jnp.asarray(seg)

    # numpy survival statistics (slab test per packet, no t tightening)
    aabb_c = np.asarray(packed.aabb_cluster)
    aabb_s = np.asarray(packed.aabb_super)

    def packet_survival(aabb):
        surv = 0
        packets = args.rays // TILE_R
        for p in range(packets):
            o = origins[p * TILE_R : (p + 1) * TILE_R]
            s = seg[p * TILE_R : (p + 1) * TILE_R]
            inv = np.where(np.abs(s) > 1e-30, 1.0 / np.where(np.abs(s) > 1e-30, s, 1), 1e30)
            t0s = (aabb[:, None, 0:3] - o[None, :, :]) * inv[None, :, :]
            t1s = (aabb[:, None, 3:6] - o[None, :, :]) * inv[None, :, :]
            enter = np.minimum(t0s, t1s).max(axis=2)
            leave = np.maximum(t0s, t1s).min(axis=2)
            hit = (enter <= leave) & (leave > 0) & (enter < 1.0)
            surv += hit.any(axis=1).sum()
        return surv / (packets * aabb.shape[0])

    print(f"cluster packet-survival (no tightening): {packet_survival(aabb_c)*100:.1f}%")
    print(f"super   packet-survival (no tightening): {packet_survival(aabb_s)*100:.1f}%")

    # far degenerate box = the only sentinel the slab test reliably rejects
    # (an inverted +-inf box always passes: enter=-inf <= leave=+inf)
    empty_c = jnp.tile(jnp.asarray([[1e30]*6 + [0, 0]], jnp.float32), (packed.n_clusters, 1))
    empty_s = jnp.tile(jnp.asarray([[1e30]*6 + [0, 0]], jnp.float32), (packed.n_super, 1))
    full_c = jnp.tile(jnp.asarray([[-1e9]*3 + [1e9]*3 + [0, 0]], jnp.float32), (packed.n_clusters, 1))
    full_s = jnp.tile(jnp.asarray([[-1e9]*3 + [1e9]*3 + [0, 0]], jnp.float32), (packed.n_super, 1))

    def variant(aabb_s_arr, aabb_c_arr):
        p = dataclasses.replace(packed, aabb_super=aabb_s_arr, aabb_cluster=aabb_c_arr)
        def fn(o, s):
            return intersect_closest_staged(o, s, p)["t"]
        def once(o, s):
            out = None
            carry = jnp.float32(0.0)
            for _ in range(args.inner):
                out = fn(o + carry, s)
                carry = carry + jnp.sum(out) * 1e-30
            return out
        return jax.jit(once)

    for name, fn in [
        ("real", variant(packed.aabb_super, packed.aabb_cluster)),
        ("all-fail (loop floor)", variant(empty_s, empty_c)),
        ("all-pass (upper bound)", variant(full_s, full_c)),
        ("supers-pass, clusters-real", variant(full_s, packed.aabb_cluster)),
    ]:
        o = jax.block_until_ready(fn(o_j, s_j))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = jax.block_until_ready(fn(o_j, s_j))
        dt = (time.perf_counter() - t0) / (args.reps * args.inner) * 1e3
        print(f"{name:>28}: {dt:8.3f} ms")


if __name__ == "__main__":
    main()
