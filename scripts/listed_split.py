"""Split listed-kernel time: jnp prepass (_packet_cluster_lists) vs kernel,
per prepass method (exact / frustum / hier).

    python scripts/listed_split.py [--tris 200000] [--tile_r 128]

Uses the clean measurement protocol (mcray_tpu/utils/benchmarking.py):
varied inputs per dispatch, state as jit arguments, first rep discarded.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=200000)
    p.add_argument("--rays", type=int, default=2560)
    p.add_argument("--tile_r", type=int, default=128)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--inner", type=int, default=16)
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
    from mcray_tpu.utils.benchmarking import measure
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
    packed = pack_tris_culled(
        tris, mids, bvh.tri_order, sort_origin=origins[0], tile_t=128
    )

    def pre(method):
        def f(oo, ss, p2):
            c, i, k = _packet_cluster_lists(oo, ss, p2, tile_r=args.tile_r, method=method)
            return (c.astype(jnp.float32).sum() + k.sum()
                    + i.astype(jnp.float32).sum())
        return f

    def full(method, sort):
        def f(oo, ss, p2):
            fn = lambda a, b, pp: intersect_closest_listed(
                a, b, pp, tile_r=args.tile_r, list_method=method)
            if sort:
                return intersect_sorted(fn, oo, ss, p2)["t"]
            return fn(oo, ss, p2)["t"]
        return f

    perturb = lambda c, oo, ss, p2: (oo + c * 1e-7, ss, p2)
    for name, fn in (
        ("prepass exact", pre("exact")),
        ("prepass frustum", pre("frustum")),
        ("prepass hier", pre("hier")),
        ("full exact", full("exact", False)),
        ("full hier", full("hier", False)),
        ("full hier+sort", full("hier", True)),
    ):
        m = measure(fn, perturb, (o, s, packed), inner=args.inner, reps=args.reps)
        print(f"{name}: {m['best']*1e3:.3f} ms (reps "
              f"{[round(t*1e3, 3) for t in m['reps']]})", flush=True)

    for method in ("exact", "frustum", "hier"):
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
