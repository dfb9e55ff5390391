"""Probe the batched (vmapped) large-scene trace: where do the ms go?

Times trace_paths on the HD scene, unbatched and vmapped(batch), with the
coherence sort on/off and different tile_r, plus the full render for
reference. All timings use an in-jit lax.scan chain so tunnelled dispatch
latency is amortised.

    python scripts/hd_batched_probe.py [--scene ...] [--batch 8]

NOTE (r4): wall-clock chained timing predating the measurement-trap
characterisation (mcray_tpu/utils/benchmarking.py) — numbers carry the
tunnel's flat per-dispatch cost amortised over the chain. Prefer the
profiler method for absolute claims; relative comparisons remain valid
at fixed chain length.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="assets/ircad11_hd/santi-liver-hd.scene")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--inner", type=int, default=4)
    p.add_argument("--reps", type=int, default=4)
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
    sim = Simulator(pack, cfg)
    packed, mode = sim.culled_tris
    print(
        f"scene {args.scene}: {pack.n_triangles} tris mode={mode} "
        f"clusters={packed.n_clusters}",
        flush=True,
    )

    key = jax.random.PRNGKey(0)
    materials = sim.materials
    pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)

    def bench(label, fn, *inputs):
        g = jax.jit(fn)
        out = jax.block_until_ready(g(*inputs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(g(*inputs))
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(f"{label:>42}: {dt*1e3:8.3f} ms", flush=True)
        return dt

    from mcray_tpu.ops.pallas import intersect as I

    def make_trace(tile_r, sort):
        def trace1(k, m):
            import unittest.mock as mock

            kw = dict(
                use_bvh=False, bvh_arrays=None, use_pallas_intersect=False,
                culled_tris=sim.culled_tris,
                intersect_tile_r=tile_r,
            )
            if not sort:
                # bypass intersect_sorted: call the kernel fn directly
                with mock.patch.object(
                    I, "intersect_sorted", lambda f, o, s, pk: f(o, s, pk)
                ):
                    return simulator.trace_paths(
                        k, m, pos, ang, sim.scene, sim.spacing,
                        sim.starting_material, cfg, **kw,
                    )
            return simulator.trace_paths(
                k, m, pos, ang, sim.scene, sim.spacing,
                sim.starting_material, cfg, **kw,
            )

        return trace1

    def chain_single(trace1):
        def fn(k, m):
            def step(c, _):
                segs = trace1(jax.random.fold_in(k, c), m)
                return c + 1, segs["distance"][0, 0]

            return jax.lax.scan(step, jnp.int32(0), None, length=args.inner)

        return fn

    def chain_batched(trace1):
        def fn(k, m):
            def step(c, _):
                keys = jax.vmap(jax.random.fold_in, (None, 0))(
                    jax.random.fold_in(k, c),
                    jnp.arange(args.batch, dtype=jnp.uint32),
                )
                segs = jax.vmap(lambda kk: trace1(kk, m))(keys)
                return c + 1, segs["distance"][0, 0, 0]

            return jax.lax.scan(step, jnp.int32(0), None, length=args.inner)

        return fn

    for tile_r in (128, 512):
        for sort in (True, False):
            t1 = make_trace(tile_r, sort)
            bench(f"trace single tile_r={tile_r} sort={sort}", chain_single(t1), key, materials)
    for tile_r in (128, 512):
        for sort in (True, False):
            t1 = make_trace(tile_r, sort)
            dt = bench(
                f"trace batch{args.batch} tile_r={tile_r} sort={sort}",
                chain_batched(t1), key, materials,
            )
            print(f"{'':>42}  = {dt*1e3/args.batch:.3f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
