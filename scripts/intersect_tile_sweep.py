"""Sweep the intersect kernels' ray-packet width (tile_r).

For the given scene, times the trace-shaped intersect workload (10 dependent
closest-hit queries over realistic bounce rays) for each tile_r, using the
scene's default kernel mode, then times full trace_paths with the winning
width.

    python scripts/intersect_tile_sweep.py [--scene ...] [--widths 128,256,512]

NOTE (r4): wall-clock chained timing predating the measurement-trap
characterisation (mcray_tpu/utils/benchmarking.py) — numbers carry the
tunnel's flat per-dispatch cost amortised over the chain. Prefer the
profiler method (scripts/roofline.py, benchmarking.profile_device) for
absolute claims; this sweep remains useful for RELATIVE comparisons at
fixed chain length.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="assets/sphere/sphere.scene")
    p.add_argument("--widths", default="128,256,512,1024")
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--inner", type=int, default=8)
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--mode", default=None, choices=[None, "culled", "staged", "listed"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from mcray_tpu.config import SimConfig
    from mcray_tpu.models import simulator
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.scene.compile import load_and_compile

    cfg = SimConfig()
    pack = load_and_compile(args.scene, cfg)
    sim = Simulator(pack, cfg, intersect_mode=args.mode)
    assert sim.culled_tris is not None, "sweep targets the culled/listed kernels"
    packed, mode = sim.culled_tris
    print(
        f"scene {args.scene}: {pack.n_triangles} tris; mode={mode} "
        f"clusters={packed.n_clusters} tile_t={packed.tile_t}",
        flush=True,
    )

    key = jax.random.PRNGKey(0)
    materials = sim.materials
    pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)

    base_kw = dict(
        use_bvh=False,
        bvh_arrays=None,
        use_pallas_intersect=False,
        culled_tris=sim.culled_tris,
    )
    segs = jax.jit(
        lambda k, m: simulator.trace_paths(
            k, m, pos, ang, sim.scene, sim.spacing, sim.starting_material,
            cfg, **base_kw,
        )
    )(key, materials)
    segs = jax.block_until_ready(segs)
    d, n = segs["valid"].shape
    origins = segs["from"].reshape(d * n, 3)
    seg_vecs = segs["direction"].reshape(d * n, 3) * 5.0

    from mcray_tpu.ops.pallas import intersect as I

    ifn = {
        "culled": I.intersect_closest_culled,
        "staged": I.intersect_closest_staged,
        "listed": I.intersect_closest_listed,
    }[mode]

    def timed(f, *inputs):
        # one compiled scan body -> inner*chain dependent launches per device
        # call: amortises the tunnelled dispatch latency at one-body compile
        # cost
        def outer(o0, s):
            def step(o, _):
                out = f(o, s)
                return o + out["t"][:, None] * 1e-30, out["t"][0]

            o_fin, ts = jax.lax.scan(
                step, o0, None, length=args.inner * args.chain
            )
            return o_fin, ts

        g = jax.jit(outer)
        out = jax.block_until_ready(g(*inputs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(g(*inputs))
        return (time.perf_counter() - t0) / (args.reps * args.inner)

    o, s = origins[:n], seg_vecs[:n]
    widths = [int(w) for w in args.widths.split(",")]
    best = (None, 1e9)
    for w in widths:
        for sort in ([False, True] if packed.n_clusters >= 32 else [False]):
            try:
                if sort:
                    f = lambda oo, ss: I.intersect_sorted(
                        lambda a, b, pk: ifn(a, b, pk, tile_r=w), oo, ss, packed
                    )
                else:
                    f = lambda oo, ss: ifn(oo, ss, packed, tile_r=w)
                dt = timed(f, o, s)
            except Exception as e:  # noqa: BLE001
                print(f"tile_r={w:5d} sort={sort}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            tag = "sorted" if sort else "plain "
            print(f"tile_r={w:5d} {tag}: {dt*1e3:8.3f} ms (x10 chain)", flush=True)
            if dt < best[1]:
                best = ((w, sort), dt)

    print(f"best: tile_r={best[0]}")

    # full trace with the winner vs default
    for w in [128, best[0][0]]:
        kw = dict(base_kw, intersect_tile_r=w)

        def tr(k, m, kw=kw):
            def step(c, _):
                segs = simulator.trace_paths(
                    jax.random.fold_in(k, c), m, pos, ang, sim.scene,
                    sim.spacing, sim.starting_material, cfg, **kw,
                )
                return c + 1, segs["distance"][0, 0]

            return jax.lax.scan(step, jnp.int32(0), None, length=args.inner)

        g = jax.jit(tr)
        out = jax.block_until_ready(g(key, materials))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(g(key, materials))
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(f"trace_full tile_r={w}: {dt*1e3:8.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
