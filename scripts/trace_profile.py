"""Break the trace stage down: intersect kernel vs physics/bookkeeping.

Times (a) full trace_paths, (b) the intersect path alone (10 chained
closest-hit queries on realistic bounce rays), (c) trace_paths with the
intersector stubbed to a constant miss — isolating the scan-body physics,
RNG and segment bookkeeping cost.

    python scripts/trace_profile.py [--scene assets/sphere/sphere.scene]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="assets/sphere/sphere.scene")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--inner", type=int, default=16)
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
    print(
        f"scene {args.scene}: {pack.n_triangles} tris; "
        f"culled={sim.culled_tris is not None} "
        f"mode={sim.culled_tris[1] if sim.culled_tris else None}",
        flush=True,
    )

    key = jax.random.PRNGKey(0)
    materials = sim.materials
    pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)

    trace_kw = dict(
        use_bvh=sim.use_bvh,
        bvh_arrays=sim.bvh_arrays,
        use_pallas_intersect=sim.use_pallas_intersect,
        culled_tris=sim.culled_tris,
        intersect_tile_r=sim.intersect_tile_r,
        sort_packets=sim.sort_packets,
    )

    def trace_fn(key, materials):
        return simulator.trace_paths(
            key, materials, pos, ang, sim.scene, sim.spacing,
            sim.starting_material, cfg, **trace_kw,
        )

    # realistic bounce rays: take the actual traced segments' origins/dirs
    segs = jax.jit(trace_fn)(key, materials)
    segs = jax.block_until_ready(segs)
    d, n = segs["valid"].shape
    origins = segs["from"].reshape(d * n, 3)
    dirs = segs["direction"].reshape(d * n, 3)
    # scale to segment vectors of plausible length
    seg_vecs = dirs * 5.0

    from mcray_tpu.ops.pallas import intersect as I

    if sim.culled_tris is not None:
        packed, mode = sim.culled_tris
        ifn = {
            "culled": I.intersect_closest_culled,
            "staged": I.intersect_closest_staged,
            "listed": I.intersect_closest_listed,
        }[mode]
        ifn = functools.partial(ifn, tile_r=sim.intersect_tile_r)
        if sim.sort_packets:
            isect = lambda o, s: I.intersect_sorted(ifn, o, s, packed)
        else:
            isect = lambda o, s: ifn(o, s, packed)
    else:
        isect = lambda o, s: I.intersect_closest_pallas(
            o, s, sim.scene["tris"], sim.scene["tri_mesh_id"]
        )

    def intersect_chain(origins, seg_vecs):
        """10 dependent closest-hit queries on (n,) rays — the trace loop's
        intersect workload shape."""
        o = origins[:n]
        s = seg_vecs[:n]
        out = None
        for _ in range(cfg.max_depth):
            out = isect(o, s)
            o = o + out["t"][:, None] * 1e-30
        return out

    # physics-only: stub the intersector with a constant-miss result
    def trace_nohit(key, materials):
        import mcray_tpu.ops.geometry as G

        real = G.intersect_closest

        def fake(origin, seg, *a, **kw):
            m = origin.shape[0]
            return {
                "hit": jnp.zeros((m,), bool),
                "t": jnp.full((m,), G.NO_HIT_T),
                "point": origin + seg,
                "normal": jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (m, 1)),
                "mesh_id": jnp.full((m,), -1, jnp.int32),
            }

        G.intersect_closest = fake
        simulator.intersect_closest = fake
        try:
            kw = dict(trace_kw)
            kw.update(culled_tris=None, use_pallas_intersect=False, use_bvh=False)
            return simulator.trace_paths(
                key, materials, pos, ang, sim.scene, sim.spacing,
                sim.starting_material, cfg, **kw,
            )
        finally:
            G.intersect_closest = real
            simulator.intersect_closest = real

    def chain(fn, perturb):
        def once(*a):
            out = None
            carry = jnp.float32(0.0)
            for _ in range(args.inner):
                out = fn(*perturb(carry, *a))
                carry = carry + jnp.sum(jax.tree.leaves(out)[0]) * 1e-30
            return out

        return jax.jit(once)

    cases = [
        ("trace_full", chain(trace_fn, lambda c, k, m: (jax.random.fold_in(k, c.astype(jnp.int32)), m + c)), (key, materials)),
        ("intersect_x10", chain(intersect_chain, lambda c, o, s: (o + c, s)), (origins, seg_vecs)),
        ("physics_only", chain(trace_nohit, lambda c, k, m: (jax.random.fold_in(k, c.astype(jnp.int32)), m + c)), (key, materials)),
    ]
    for name, cfn, inputs in cases:
        out = jax.block_until_ready(cfn(*inputs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(cfn(*inputs))
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(f"{name:>14}: {dt*1e3:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
