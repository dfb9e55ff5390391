"""Differentiable-fit step timing: Pallas fast path vs jnp fallback.

Measures ms/step of a MaterialFitter Adam step (render + pixel-MSE loss +
grad + update) through the full pipeline — the BASELINE.json
"pixel+gradient" workload — with the Pallas kernels (custom-VJP march,
fused postproc, MXU scanconv) vs the jnp scatter/gather pipeline.

    python scripts/fit_bench.py [--scene assets/sphere/sphere.scene]
        [--elements 512] [--samples 5] [--steps 5] [--platform tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="assets/sphere/sphere.scene")
    p.add_argument("--elements", type=int, default=512)
    p.add_argument("--samples", type=int, default=5)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--platform", default=None)
    p.add_argument("--skip-jnp", action="store_true",
                   help="only time the Pallas path (the jnp path can take minutes)")
    p.add_argument("--trilinear", action="store_true", default=True)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax.numpy as jnp

    from mcray_tpu.config import SimConfig
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.models.trainer import MaterialFitter
    from mcray_tpu.ops import physics
    from mcray_tpu.scene.compile import load_and_compile

    cfg = SimConfig(
        transducer_elements=args.elements,
        samples_per_element=args.samples,
        soft_scattering=True,
        trilinear_texture=args.trilinear,
    )
    pack = load_and_compile(args.scene, cfg, with_bvh=True)
    key = jax.random.PRNGKey(0)

    results = {}
    variants = [("pallas", True)] + ([] if args.skip_jnp else [("jnp", False)])
    for name, use_pallas in variants:
        sim = Simulator(pack, cfg, use_pallas_march=use_pallas)
        if use_pallas is False:
            sim.use_fused_postproc = False
            sim.scan_table = None

        def render(k, materials):
            out = sim._render(
                k, materials,
                jnp.asarray(pack.transducer_position),
                jnp.asarray(pack.transducer_angles),
                hash(cfg),
            )
            return out["bmode"]

        target = render(key, jnp.asarray(pack.materials))
        target.block_until_ready()

        import numpy as np

        # perturb LIVER's attenuation (material 3 — the BOX medium in the
        # sphere scene, actually traversed, so the loss is non-degenerate)
        row = 3
        perturbed = np.array(pack.materials, np.float32)
        perturbed[row, physics.ATTENUATION] *= 2.0
        fitter = MaterialFitter(
            render, jnp.asarray(perturbed), target,
            trainable=(physics.ATTENUATION,), trainable_rows=[row], fixed_key=key,
        )

        t0 = time.perf_counter()
        fitter.run(1, verbose=False)  # compile
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        losses = fitter.run(args.steps, verbose=False)
        jax.block_until_ready(fitter.state.materials)
        dt = (time.perf_counter() - t0) / args.steps
        results[name] = {
            "ms_per_step_wall": round(dt * 1e3, 2),
            "compile_s": round(t_compile, 1),
            "loss_last": float(losses[-1]),
        }
        # DEVICE time per step (tunnel-immune; the wall number above carries
        # the dev tunnel's flat ~25 ms per dispatch — benchmarking.py traps)
        try:
            from mcray_tpu.utils.benchmarking import profile_device

            mats_now = fitter.state.materials
            opt_now = fitter.state.opt_state
            prof = profile_device(
                lambda m, k: fitter._step(m, opt_now, k)[2],
                lambda i: (mats_now * (1 + i * 1e-9),
                           jax.random.fold_in(key, i + 100)),
                n=3,
            )
            results[name]["ms_per_step_device"] = round(prof["per_call_ms"], 2)
        except Exception as e:
            results[name]["ms_per_step_device_error"] = str(e)[:120]
        print(f"{name}: {dt*1e3:.1f} ms/step wall, "
              f"{results[name].get('ms_per_step_device', 'n/a')} ms device "
              f"(compile {t_compile:.1f}s)", flush=True)

    if len(results) == 2:
        results["speedup"] = round(
            results["jnp"]["ms_per_step_wall"]
            / results["pallas"]["ms_per_step_wall"], 2
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
