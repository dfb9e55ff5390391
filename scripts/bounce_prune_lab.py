"""Per-ray pruning lab for INCOHERENT (bounce-style) rays at large scenes.

VERDICT r4 item 1: the listed kernel's per-packet cluster-list union
saturates on isotropic rays (6.18 ms at 200k tris — only 3.9x over brute),
where Bullet's per-ray rayTest is O(log T). This lab measures the
built-but-unexploited per-ray hooks on the bounce stress sets:

- coherence sort (intersect_sorted): packets of direction-octant +
  Morton-local rays -> tight unions (never measured with list_method=exact
  on bounce rays; r4 only measured hier/frustum variants);
- two-pass t-cap (passes=2): pass 1 visits each packet's front_k nearest
  clusters, pass 2 re-prunes with each ray's tightened best-t
  (only rejected on the coherent HD trace before);
- their composition, and tile_r width.

    python scripts/bounce_prune_lab.py --tris 200000 500000 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stress_bench import build_scene_arrays, make_rays


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, nargs="+", default=[200000])
    p.add_argument("--rays", type=int, default=2560)
    p.add_argument("--fan", action="store_true", help="also run coherent rays")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from mcray_tpu.ops.bvh import build_bvh
    from mcray_tpu.ops.pallas.intersect import (
        intersect_closest_grouped,
        intersect_closest_listed,
        intersect_sorted,
        pack_tris_culled,
    )
    from mcray_tpu.utils.benchmarking import profile_device

    o_np, s_np, ob_np, sb_np = make_rays(args.rays)

    def listed(sort, passes, front_k=6, tile_r=128):
        def f(o, s, p128):
            fn = lambda oo, ss, pp: intersect_closest_listed(
                oo, ss, pp, passes=passes, front_k=front_k, tile_r=tile_r
            )
            if sort:
                return intersect_sorted(fn, o, s, p128)["t"]
            return fn(o, s, p128)["t"]

        return f

    def grouped(group_g=32, chunk_g=4):
        def f(o, s, p128):
            return intersect_closest_grouped(
                o, s, p128, group_g=group_g, chunk_g=chunk_g
            )["t"]

        return f

    cases = [
        ("exact", listed(False, 1)),
        ("exact+sort", listed(True, 1)),
        ("grouped-g32c4", grouped(32, 4)),
        ("grouped-g32c2", grouped(32, 2)),
        ("grouped-g64c8", grouped(64, 8)),
    ]

    all_rows = []
    for t_count in args.tris:
        t0 = time.perf_counter()
        tris, mids = build_scene_arrays(t_count)
        bvh = build_bvh(tris, leaf_size=4)
        p128 = pack_tris_culled(
            tris, mids, bvh.tri_order, sort_origin=o_np[0], tile_t=128
        )
        print(f"[T={t_count}] built in {time.perf_counter()-t0:.1f}s "
              f"(clusters {p128.n_clusters})", flush=True)

        kinds = [("bounce", (ob_np, sb_np))]
        if args.fan:
            kinds.append(("fan", (o_np, s_np)))
        for ray_kind, (o_h, s_h) in kinds:
            o, s = jnp.asarray(o_h), jnp.asarray(s_h)
            row = {"tris": t_count, "rays": ray_kind}
            ref = None
            for name, fn in cases:
                fnj = jax.jit(fn)
                out = jax.block_until_ready(fnj(o, s, p128))
                if ref is None:
                    ref = out
                    agree = True
                else:
                    agree = bool(jnp.allclose(ref, out, rtol=1e-4))
                prof = profile_device(
                    fnj, lambda i: (o + i * 1e-7, s, p128), n=5
                )
                row[name] = round(prof["per_call_ms"], 3)
                row[f"{name}_agree"] = agree
                print(f"  T={t_count} {ray_kind} {name}: "
                      f"{row[name]:.3f} ms agree={agree}", flush=True)
            all_rows.append(row)

    print(json.dumps(all_rows))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(all_rows, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
