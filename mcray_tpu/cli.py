"""Command-line frame renderer.

Replaces the reference's blocking interactive driver (reference:
src/main.cpp:42-161, which renders one frame then blocks in cv::waitKey) with
a headless CLI: renders N frames (optionally sweeping probe pose), saves
B-mode PNGs, prints per-stage timings and rays/s.

Usage:
    python -m mcray_tpu.cli path/to/scene.scene --out out.png --frames 1
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from .config import SimConfig


def _force_platform(name: str) -> None:
    # The environment may pin JAX_PLATFORMS to an accelerator plugin; the
    # config update below wins over the env var as long as no backend has
    # been initialised yet.
    import jax

    jax.config.update("jax_platforms", name)
from .models.simulator import Simulator
from .scene.compile import load_and_compile
from .utils.image_io import save_png


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU-native MC ultrasound renderer")
    p.add_argument("scene", help=".scene JSON path (reference schema)")
    p.add_argument("--out", default="bmode.png")
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--elements", type=int, default=None, help="override scanline count")
    p.add_argument("--samples", type=int, default=None, help="override MC paths/scanline")
    p.add_argument("--bvh", action="store_true", help="use BVH traversal instead of brute force")
    p.add_argument("--bug-compat", action="store_true", help="replicate reference material-transition bug")
    p.add_argument("--save-rf", default=None, help="also save the raw RF image (npz)")
    p.add_argument("--platform", default=None, help="force a jax platform (e.g. cpu, tpu)")
    args = p.parse_args(argv)

    if args.platform:
        _force_platform(args.platform)

    overrides = {}
    if args.elements:
        overrides["transducer_elements"] = args.elements
    if args.samples:
        overrides["samples_per_element"] = args.samples
    if args.bug_compat:
        overrides["bug_compat_material_transition"] = True
    cfg = SimConfig(**overrides)

    t0 = time.perf_counter()
    pack = load_and_compile(args.scene, cfg, with_bvh=args.bvh)
    sim = Simulator(pack, cfg, use_bvh=args.bvh, seed=args.seed)
    t_setup = time.perf_counter() - t0
    print(f"scene: {pack.n_triangles} triangles, {pack.n_materials} materials "
          f"(setup {t_setup:.2f}s)")

    out = None
    t_first = t_steady = 0.0
    for i in range(args.frames):
        t0 = time.perf_counter()
        out = sim.render_frame(seed=args.seed + i)
        out["bmode"].block_until_ready()
        dt = time.perf_counter() - t0
        if i == 0:
            t_first = dt
        else:
            t_steady += dt
        rays = sim.rays_per_frame
        print(f"frame {i}: {dt*1e3:.1f} ms  ({rays/dt:,.0f} ray-casts/s)")

    bmode = np.asarray(out["bmode"])
    path = args.out
    if args.frames > 1:
        path = args.out.replace(".png", f"_{args.frames - 1}.png")
    save_png(path, bmode)
    print(f"saved {path}  (min {bmode.min():.3g} max {bmode.max():.3g})")
    if args.save_rf:
        np.savez(args.save_rf, rf_raw=np.asarray(out["rf_raw"]),
                 rf_env=np.asarray(out["rf_env"]), bmode=bmode)

    if args.frames > 1:
        steady = t_steady / (args.frames - 1)
        print(json.dumps({
            "first_frame_s": round(t_first, 4),
            "steady_frame_s": round(steady, 4),
            "fps": round(1.0 / steady, 2),
            "rays_per_s": round(sim.rays_per_frame / steady),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
