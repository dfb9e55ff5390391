"""Large-scene scaling benchmark: brute-force vs the pruned Pallas
intersect kernels (culled / staged / listed x prepass method).

Generates synthetic organ scenes at increasing triangle counts and reports
device time per closest-hit query (2560 rays) for each path, on coherent
probe-fan rays and on incoherent bounce-like rays. Run on a real TPU:

    python scripts/stress_bench.py --tris 200000 500000 1000000

Measurement protocol (mcray_tpu/utils/benchmarking.py): inputs perturbed
every chained iteration and every rep (the tunnelled backend memoizes
identical dispatches), all device state passed as jit ARGUMENTS (closure
capture degrades the process to ~27 ms dispatches), first rep discarded.
Round 3's numbers predate this protocol and overstated the pruned kernels'
time by the amortised dispatch latency (~3.4 ms at inner=8).
"""

from __future__ import annotations

import argparse
import json
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


def make_rays(n: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    origins = np.tile(np.array([[-12.0, 0.0, 0.0]], np.float32), (n, 1))
    theta = np.linspace(-0.5, 0.5, n)
    segs = np.stack(
        [np.cos(theta) * 25, np.sin(theta) * 25, np.zeros(n)], -1
    ).astype(np.float32)
    b_orig = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    b_dir = rng.normal(0, 1, (n, 3)).astype(np.float32)
    b_dir /= np.linalg.norm(b_dir, axis=1, keepdims=True)
    b_len = rng.uniform(2.0, 12.0, (n, 1)).astype(np.float32)
    return origins, segs, b_orig, (b_dir * b_len).astype(np.float32)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, nargs="+", default=[20000, 80000, 200000])
    p.add_argument("--rays", type=int, default=2560)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--inner", type=int, default=16)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import jax

    if args.platform or args.interpret:
        jax.config.update("jax_platforms", args.platform or "cpu")
    import jax.numpy as jnp

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from mcray_tpu.ops.bvh import build_bvh
    from mcray_tpu.ops.pallas.intersect import (
        intersect_closest_culled,
        intersect_closest_grouped,
        intersect_closest_listed,
        intersect_closest_pallas,
        intersect_closest_staged,
        intersect_sorted,
        pack_tris_culled,
    )
    from mcray_tpu.utils.benchmarking import measure, profile_device

    itp = args.interpret
    o_np, s_np, ob_np, sb_np = make_rays(args.rays)

    # every case: fn(origins, segs, tris, mids, packed128, packed256);
    # device state rides the arguments (see module docstring)
    def case_brute(o, s, tj, mj, p128, p256):
        return intersect_closest_pallas(o, s, tj, mj, interpret=itp)["t"]

    def listed(method, sort):
        def f(o, s, tj, mj, p128, p256):
            fn = lambda oo, ss, pp: intersect_closest_listed(
                oo, ss, pp, interpret=itp, list_method=method
            )
            if sort:
                return intersect_sorted(fn, o, s, p128)["t"]
            return fn(o, s, p128)["t"]

        return f

    def case_culled(o, s, tj, mj, p128, p256):
        return intersect_closest_culled(o, s, p256, interpret=itp)["t"]

    def case_staged(o, s, tj, mj, p128, p256):
        return intersect_closest_staged(o, s, p256, interpret=itp)["t"]

    def case_grouped(o, s, tj, mj, p128, p256):
        # cluster-major kernel (r5): per-ray-grade pruning for incoherent
        # ray sets; batch_b=16 amortises grid cost at mega-scene C
        return intersect_closest_grouped(
            o, s, p128, interpret=itp, batch_b=16
        )["t"]

    cases = [
        ("brute", case_brute),
        ("culled", case_culled),
        ("staged", case_staged),
        ("listed-exact", listed("exact", False)),
        ("listed-hier", listed("hier", False)),
        ("listed-hier+sort", listed("hier", True)),
        ("listed-frustum+sort", listed("frustum", True)),
        ("grouped", case_grouped),
    ]
    perturb = lambda c, o, s, *rest: (o + c * 1e-7, s, *rest)

    all_rows = []
    for t_count in args.tris:
        t0 = time.perf_counter()
        tris, mids = build_scene_arrays(t_count)
        bvh = build_bvh(tris, leaf_size=4)
        p128 = pack_tris_culled(tris, mids, bvh.tri_order, sort_origin=o_np[0], tile_t=128)
        p256 = pack_tris_culled(tris, mids, bvh.tri_order, sort_origin=o_np[0], tile_t=256)
        tj, mj = jnp.asarray(tris), jnp.asarray(mids)
        print(f"[T={t_count}] built in {time.perf_counter()-t0:.1f}s "
              f"(clusters {p128.n_clusters}, supers {p128.n_super} x {p128.super_g})",
              flush=True)

        for ray_kind, (o_h, s_h) in (("fan", (o_np, s_np)), ("bounce", (ob_np, sb_np))):
            o, s = jnp.asarray(o_h), jnp.asarray(s_h)
            ref = None
            row = {"tris": t_count, "rays": ray_kind}
            for name, fn in cases:
                if t_count > 300_000 and name in ("brute", "culled", "staged"):
                    # brute/culled stream every tile (minutes at this size);
                    # staged keeps its whole AABB tables in SMEM and exceeds
                    # the 1 MB budget above ~2000 clusters
                    continue
                fnj = jax.jit(fn)
                out = jax.block_until_ready(fnj(o, s, tj, mj, p128, p256))
                if ref is None:
                    ref = out
                    agree = True
                else:
                    agree = bool(jnp.allclose(ref, out, rtol=1e-4))
                if itp:
                    m = measure(fn, perturb, (o, s, tj, mj, p128, p256),
                                inner=args.inner, reps=args.reps)
                    ms = m["best"] * 1e3
                else:
                    # DEVICE time from the profiler — immune to the tunnel's
                    # flat per-dispatch penalty (benchmarking.py traps)
                    prof = profile_device(
                        fnj,
                        lambda i: (o + i * 1e-7, s, tj, mj, p128, p256),
                        n=5,
                    )
                    ms = prof["per_call_ms"]
                row[name] = round(ms, 3)
                row[f"{name}_agree"] = agree
                print(f"  T={t_count} {ray_kind} {name}: {ms:.3f} ms "
                      f"agree={agree}", flush=True)
            if "brute" in row:
                for name, _ in cases[1:]:
                    if name in row:
                        row[f"{name}_speedup"] = round(row["brute"] / row[name], 2)
            all_rows.append(row)

    print(json.dumps(all_rows))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(all_rows, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
