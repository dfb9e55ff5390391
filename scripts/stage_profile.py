"""Per-stage timing of the frame pipeline on the current backend.

SUPERSEDED for TPU work by scripts/roofline.py, which measures DEVICE time
via jax.profiler and adds FLOP/byte accounting. This script's chained-jit
wall times close over device arrays and therefore carry the tunnel's flat
~25 ms per-dispatch penalty amortised over `--inner` (see
mcray_tpu/utils/benchmarking.py for the measurement traps) — fine for
relative regression checks at high --inner, wrong for absolute claims.

    python scripts/stage_profile.py [--scene assets/sphere/sphere.scene]
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
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--inner", type=int, default=4)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax.numpy as jnp

    from mcray_tpu.config import SimConfig
    from mcray_tpu.models import simulator
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.ops import imaging
    from mcray_tpu.scene.compile import load_and_compile

    cfg = SimConfig()
    pack = load_and_compile(args.scene, cfg)
    sim = Simulator(pack, cfg)
    print(
        f"scene {args.scene}: {pack.n_triangles} tris; backend {jax.default_backend()}; "
        f"culled={sim.culled_tris is not None} pallas_march={sim.use_pallas_march} "
        f"fused_postproc={sim.use_fused_postproc}",
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
    )

    def chain(fn, perturb):
        """Run fn `inner` times inside one jit with a data dependence."""

        def once(*a):
            out = None
            carry = jnp.float32(0.0)
            for k in range(args.inner):
                out = fn(*perturb(carry, *a))
                carry = carry + jnp.sum(jax.tree.leaves(out)[0]) * 1e-30
            return out

        return jax.jit(once)

    # stage 1: trace
    def trace_fn(key, materials, pos, ang):
        return simulator.trace_paths(
            key, materials, pos, ang, sim.scene, sim.spacing,
            sim.starting_material, cfg, **trace_kw,
        )

    trace_c = chain(trace_fn, lambda c, k, m, po, an: (jax.random.fold_in(k, c.astype(jnp.int32)), m + c, po, an))

    segments = jax.jit(trace_fn)(key, materials, pos, ang)
    segments = jax.block_until_ready(segments)

    # stage 2: march + accumulate
    if sim.use_pallas_march:
        from mcray_tpu.ops.pallas.march import march_and_accumulate_pallas

        def march_fn(segments, materials):
            return march_and_accumulate_pallas(segments, materials, sim.volume, cfg)
    else:
        def march_fn(segments, materials):
            return simulator.march_and_accumulate(segments, materials, sim.volume, cfg)

    march_c = chain(march_fn, lambda c, s, m: ({**s, "initial": s["initial"] + c}, m))
    rf_raw = jax.block_until_ready(jax.jit(march_fn)(segments, materials))

    # stage 3: postproc (conv + envelope [+ log])
    if sim.use_fused_postproc:
        from mcray_tpu.ops.pallas.postproc import convolve_envelope_pallas

        def post_fn(rf):
            return convolve_envelope_pallas(rf, cfg)
    else:
        def post_fn(rf):
            return imaging.apply_envelope(imaging.convolve_psf(rf, cfg), cfg)

    post_c = chain(post_fn, lambda c, rf: (rf + c,))
    rf_env = jax.block_until_ready(jax.jit(post_fn)(rf_raw))

    # stage 4: scan conversion
    if sim.scan_table is not None:
        from mcray_tpu.ops.pallas.scanconv import scan_convert_pallas

        def scan_fn(rf):
            return scan_convert_pallas(rf, sim.scan_table, cfg.bmode_cols)
    else:
        def scan_fn(rf):
            return imaging.scan_convert(rf, sim.scan_maps[0], sim.scan_maps[1])

    scan_c = chain(scan_fn, lambda c, rf: (rf + c,))

    # full frame for reference
    def full_fn(key, materials, pos, ang):
        return sim._render(key, materials, pos, ang, hash(cfg))["bmode"]

    full_c = chain(full_fn, lambda c, k, m, po, an: (jax.random.fold_in(k, c.astype(jnp.int32)), m + c, po, an))

    stages = [
        ("trace", trace_c, (key, materials, pos, ang)),
        ("march", march_c, (segments, materials)),
        ("postproc", post_c, (rf_raw,)),
        ("scan_convert", scan_c, (rf_env,)),
        ("full_frame", full_c, (key, materials, pos, ang)),
    ]
    for name, fn, inputs in stages:
        out = jax.block_until_ready(fn(*inputs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn(*inputs))
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(f"{name:>14}: {dt*1e3:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
