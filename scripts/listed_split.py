"""Split listed-kernel time: jnp prepass (_packet_cluster_lists) vs kernel.

    python scripts/listed_split.py [--tris 200000] [--tile_r 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=200000)
    p.add_argument("--rays", type=int, default=2560)
    p.add_argument("--tile_r", type=int, default=128)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--inner", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from mcray_tpu.ops.bvh import build_bvh
    from mcray_tpu.ops.pallas.intersect import (
        _packet_cluster_lists,
        intersect_closest_listed,
        intersect_sorted,
        pack_tris_culled,
    )
    from scripts.stress_bench import build_scene_arrays

    tris, mids = build_scene_arrays(args.tris)
    bvh = build_bvh(tris, leaf_size=4)
    n = args.rays
    origins = np.tile(np.array([[-12.0, 0.0, 0.0]], np.float32), (n, 1))
    ang = np.linspace(-0.5, 0.5, n)
    dirs = np.stack([np.cos(ang), np.sin(ang), 0.05 * np.sin(7 * ang)], 1)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    seg = (dirs * 30.0).astype(np.float32)
    o, s = jnp.asarray(origins), jnp.asarray(seg)
    packed = pack_tris_culled(tris, mids, bvh.tri_order, sort_origin=origins[0], tile_t=128)

    def chain(fn):
        def once(o, s):
            def body(carry, _):
                out = fn(o + carry[:, None] * 1e-7, s)
                return jnp.sum(out) * 1e-30 + carry * 0, None

            c, _ = jax.lax.scan(
                body, jnp.zeros((o.shape[0],), jnp.float32), None, length=args.inner
            )
            return c

        return jax.jit(once)

    def _pre(method):
        def f(oo, ss):
            counts, ids, keys = _packet_cluster_lists(
                oo, ss, packed, tile_r=args.tile_r, method=method
            )
            # touch all three outputs so the argsort isn't dead-code-eliminated
            return counts.astype(jnp.float32).sum() + keys.sum() + ids.astype(jnp.float32).sum()

        return f

    def _full(method):
        return lambda oo, ss: intersect_sorted(
            lambda a, b, p2: intersect_closest_listed(
                a, b, p2, tile_r=args.tile_r, list_method=method
            ),
            oo, ss, packed,
        )["t"]

    for name, fn in (
        ("prepass exact", chain(_pre("exact"))),
        ("prepass frustum", chain(_pre("frustum"))),
        ("full listed+sort exact", chain(_full("exact"))),
        ("full listed+sort frustum", chain(_full("frustum"))),
    ):
        out = jax.block_until_ready(fn(o, s))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn(o, s))
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)

    for method in ("exact", "frustum"):
        counts, ids, keys = _packet_cluster_lists(
            o, s, packed, tile_r=args.tile_r, method=method
        )
        c = np.asarray(counts)[:, 0]
        print(
            f"[{method}] clusters={packed.n_clusters} packets={c.shape[0]} "
            f"listed/packet mean={c.mean():.1f} max={c.max()} total={c.sum()}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
