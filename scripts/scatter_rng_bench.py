"""A/B the march kernel's scatter_rng: Box-Muller vs dithered-binomial.

VERDICT r4 item 3: the march kernel was transcendental-bound (~15% of VPU
peak) on Box-Muller's log+sqrt+cos+sin per (row, col, segment) sample.
scatter_rng="bitsum" replaces them with popcount+dither (texture.py) — a
different but statistically equivalent speckle realisation. This measures
both modes' forward (and optionally backward) device time on the full-size
sphere workload and prints one JSON line for BASELINE.md.

    python scripts/scatter_rng_bench.py [--scene assets/sphere/sphere.scene]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="assets/sphere/sphere.scene")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--grad", action="store_true", help="also time fwd+bwd")
    args = ap.parse_args()

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mcray_tpu.config import SimConfig
    from mcray_tpu.models.simulator import Simulator, trace_paths
    from mcray_tpu.ops import texture
    from mcray_tpu.ops.pallas.march import march_and_accumulate_pallas
    from mcray_tpu.utils.benchmarking import profile_device

    cfg0 = SimConfig()
    from mcray_tpu.scene.compile import load_and_compile

    pack = load_and_compile(args.scene, cfg0)
    sim = Simulator(pack, cfg0)
    state = sim._state
    mats = sim.materials
    key = jax.random.PRNGKey(0)
    mode = sim.culled_tris[1] if sim.culled_tris else None

    def trace_fn(key, materials, pos, ang, state):
        culled = (state["packed"], mode) if state["packed"] is not None else None
        return trace_paths(
            key, materials, pos, ang, state["scene"], state["spacing"],
            state["starting_material"], cfg0,
            culled_tris=culled, intersect_tile_r=sim.intersect_tile_r,
        )

    segments = jax.block_until_ready(
        jax.jit(trace_fn)(
            key, mats,
            jnp.asarray(pack.transducer_position),
            jnp.asarray(pack.transducer_angles),
            state,
        )
    )

    out = {"scene": args.scene}
    for rng in ("boxmuller", "bitsum"):
        cfg = dataclasses.replace(cfg0, scatter_rng=rng)
        vol = texture.make_texture_volume(jax.random.PRNGKey(7), cfg)

        def march_fn(segments, materials, vol):
            return march_and_accumulate_pallas(segments, materials, vol, cfg)

        f = jax.jit(march_fn)
        jax.block_until_ready(f(segments, mats, vol))
        prof = profile_device(
            f,
            lambda i: (
                {**segments, "initial": segments["initial"] + i * 1e-9},
                mats, vol,
            ),
            n=max(3, args.reps),
        )
        out[f"{rng}_fwd_ms"] = round(prof["per_call_ms"], 3)

        if args.grad:
            def loss(segments, materials, vol):
                return jnp.sum(march_fn(segments, materials, vol) ** 2)

            g = jax.jit(jax.grad(loss, argnums=1))
            jax.block_until_ready(g(segments, mats, vol))
            profg = profile_device(
                g,
                lambda i: (
                    {**segments, "initial": segments["initial"] + i * 1e-9},
                    mats, vol,
                ),
                n=max(3, args.reps),
            )
            out[f"{rng}_fwdbwd_ms"] = round(profg["per_call_ms"], 3)

    out["fwd_speedup"] = round(out["boxmuller_fwd_ms"] / out["bitsum_fwd_ms"], 2)
    if args.grad:
        out["fwdbwd_speedup"] = round(
            out["boxmuller_fwdbwd_ms"] / out["bitsum_fwdbwd_ms"], 2
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
