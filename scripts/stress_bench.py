"""Large-scene scaling benchmark: brute-force vs cluster-culled vs two-level
staged (HBM-resident, DMA-on-demand) Pallas intersect.

Generates synthetic organ scenes at increasing triangle counts and reports
trace time per frame for both intersection paths. Run on a real TPU:

    python scripts/stress_bench.py --tris 20000 80000 200000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_scene_arrays(n_tris: int, seed: int = 0):
    """A ball of random organ-ish ellipsoid shells totalling ~n_tris."""
    from mcray_tpu.scene.primitives import ellipsoid_mesh

    rng = np.random.default_rng(seed)
    tris = []
    mids = []
    k = 0
    while sum(t.shape[0] for t in tris) < n_tris:
        sub = int(np.clip(np.sqrt(n_tris / 8), 8, 64))
        v, f = ellipsoid_mesh(
            radii=rng.uniform(0.5, 3.0, 3),
            center=rng.uniform(-5, 5, 3),
            n_theta=sub,
            n_phi=2 * sub,
        )
        tris.append(v[f])
        mids.append(np.full((f.shape[0],), k % 4, np.int32))
        k += 1
    tris = np.concatenate(tris)[:n_tris].astype(np.float32)
    mids = np.concatenate(mids)[:n_tris]
    return tris, mids


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, nargs="+", default=[20000, 80000])
    p.add_argument("--rays", type=int, default=2560)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--inner", type=int, default=8, help="kernel launches chained inside one jit (amortises dispatch latency)")
    p.add_argument("--interpret", action="store_true", help="CPU interpret mode (correctness only)")
    p.add_argument("--packet", action="store_true", help="also time the packet-BVH kernel (slow Mosaic compile)")
    p.add_argument("--platform", default=None)
    p.add_argument("--front_k", type=int, default=6, help="pass-1 cluster budget for the two-pass listed kernel")
    args = p.parse_args()

    import jax

    if args.platform or args.interpret:
        jax.config.update("jax_platforms", args.platform or "cpu")
    import jax.numpy as jnp

    from mcray_tpu.ops.bvh import build_bvh
    from mcray_tpu.ops.pallas.bvh_packet import bvh_packet_intersect, pack_bvh_for_kernel
    from mcray_tpu.ops.pallas.intersect import (
        intersect_closest_culled,
        intersect_closest_listed,
        intersect_closest_pallas,
        intersect_closest_staged,
        pack_tris_culled,
    )

    rng = np.random.default_rng(1)
    n = args.rays
    # a coherent probe fan (bounce 0)
    origins = np.tile(np.array([[-12.0, 0.0, 0.0]], np.float32), (n, 1))
    theta = np.linspace(-0.5, 0.5, n)
    segs = np.stack([np.cos(theta) * 25, np.sin(theta) * 25, np.zeros(n)], -1).astype(np.float32)
    o = jnp.asarray(origins)
    s = jnp.asarray(segs)
    # bounce-like incoherent rays: random origins inside the organ ball,
    # isotropic directions, attenuation-bounded lengths — the depth>=1
    # workload where packet coherence must be re-formed by sorting
    b_orig = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    b_dir = rng.normal(0, 1, (n, 3)).astype(np.float32)
    b_dir /= np.linalg.norm(b_dir, axis=1, keepdims=True)
    b_len = rng.uniform(2.0, 12.0, (n, 1)).astype(np.float32)
    ob = jnp.asarray(b_orig)
    sb = jnp.asarray((b_dir * b_len).astype(np.float32))

    for t_count in args.tris:
        tris, mids = build_scene_arrays(t_count)
        tris_j, mids_j = jnp.asarray(tris), jnp.asarray(mids)
        bvh = build_bvh(tris, leaf_size=4)
        packed = pack_bvh_for_kernel(bvh, tris, mids)
        culled = pack_tris_culled(tris, mids, bvh.tri_order, sort_origin=origins[0])

        def inner_batched(intersect):
            """Chain ``inner`` dependent kernel launches inside ONE jitted
            program (scan with data dependence, so XLA cannot CSE them) —
            amortises the per-dispatch latency of the tunneled TPU, which
            otherwise floors every call at ~25 ms and hides kernel time."""

            def once(o, s):
                def body(carry, _):
                    oo = o + carry[:, None] * 1e-7
                    t = intersect(oo, s)
                    return t, None

                t, _ = jax.lax.scan(
                    body, jnp.zeros((o.shape[0],), jnp.float32), None,
                    length=args.inner,
                )
                return t

            return jax.jit(once)

        brute = inner_batched(
            lambda o, s: intersect_closest_pallas(o, s, tris_j, mids_j, interpret=args.interpret)["t"]
        )
        packet = inner_batched(
            lambda o, s: bvh_packet_intersect(o, s, packed, interpret=args.interpret)["t"]
        )
        cull = inner_batched(
            lambda o, s: intersect_closest_culled(o, s, culled, interpret=args.interpret)["t"]
        )
        staged = inner_batched(
            lambda o, s: intersect_closest_staged(o, s, culled, interpret=args.interpret)["t"]
        )

        from mcray_tpu.ops.pallas.intersect import intersect_sorted

        sorted_staged = inner_batched(
            lambda o, s: intersect_sorted(
                lambda oo, ss, p: intersect_closest_staged(oo, ss, p, interpret=args.interpret),
                o, s, culled,
            )["t"]
        )
        sorted_listed = inner_batched(
            lambda o, s: intersect_sorted(
                lambda oo, ss, p: intersect_closest_listed(oo, ss, p, interpret=args.interpret),
                o, s, culled,
            )["t"]
        )
        culled128 = pack_tris_culled(
            tris, mids, bvh.tri_order, sort_origin=origins[0], tile_t=128
        )
        sorted_listed128 = inner_batched(
            lambda o, s: intersect_sorted(
                lambda oo, ss, p: intersect_closest_listed(oo, ss, p, interpret=args.interpret),
                o, s, culled128,
            )["t"]
        )

        sorted_listed2 = inner_batched(
            lambda o, s: intersect_sorted(
                lambda oo, ss, p: intersect_closest_listed(
                    oo, ss, p, interpret=args.interpret, passes=2, front_k=args.front_k
                ),
                o, s, culled128,
            )["t"]
        )

        candidates = [("brute", brute), ("culled", cull), ("staged", staged),
                      ("staged+sort", sorted_staged), ("listed+sort", sorted_listed),
                      ("listed128+sort", sorted_listed128),
                      ("listed2x128+sort", sorted_listed2)]
        if args.packet:
            candidates.append(("packet-bvh", packet))
        results = {}
        for name, fn in candidates:
            out = jax.block_until_ready(fn(o, s))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out2 = jax.block_until_ready(fn(o, s))
            dt = (time.perf_counter() - t0) / (args.reps * args.inner)
            results[name] = (dt, out2)
        agree = all(
            bool(jnp.allclose(results["brute"][1], r[1], rtol=1e-4))
            for r in results.values()
        )
        parts = ", ".join(f"{n} {r[0]*1e3:.2f} ms" for n, r in results.items())
        print(
            f"T={t_count}: {parts}, culled {results['brute'][0]/results['culled'][0]:.2f}x, "
            f"staged {results['brute'][0]/results['staged'][0]:.2f}x, "
            f"staged+sort {results['brute'][0]/results['staged+sort'][0]:.2f}x, agree={agree}",
            flush=True,
        )

        # bounce-like incoherent rays
        results_b = {}
        for name, fn in [("brute", brute), ("staged", staged), ("staged+sort", sorted_staged), ("listed+sort", sorted_listed), ("listed128+sort", sorted_listed128), ("listed2x128+sort", sorted_listed2)]:
            out = jax.block_until_ready(fn(ob, sb))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out2 = jax.block_until_ready(fn(ob, sb))
            dt = (time.perf_counter() - t0) / (args.reps * args.inner)
            results_b[name] = (dt, out2)
        agree_b = all(
            bool(jnp.allclose(results_b["brute"][1], r[1], rtol=1e-4))
            for r in results_b.values()
        )
        parts = ", ".join(f"{n} {r[0]*1e3:.2f} ms" for n, r in results_b.items())
        print(
            f"T={t_count} (bounce rays): {parts}, "
            f"staged {results_b['brute'][0]/results_b['staged'][0]:.2f}x, "
            f"staged+sort {results_b['brute'][0]/results_b['staged+sort'][0]:.2f}x, "
            f"agree={agree_b}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
