"""Speckle-invariant differentiable pose objective (VERDICT r4 item 4).

r4's soft row-binning restored AD pose-gradient MAGNITUDE (|AD|/|secant|
0.035 -> 0.94) but sign agreement stayed 50%: the pixel-MSE objective's
instantaneous slope is dominated by speckle jitter that the across-offset
secant averages away. This lab holds everything from scripts/pose_ad_lab.py
fixed (same keys for pred and target, soft scattering, trilinear texture,
soft_row_binning=True) and compares OBJECTIVES:

- "mse":  multi-scale Gaussian-blurred compound MSE (the r4 objective);
- "ncc":  multi-scale normalised cross-correlation of the blurred
          compounds — normalisation cancels the speckle's local amplitude
          jitter, leaving pattern alignment to drive the gradient;
- "ncc-coarse": NCC at the coarsest scales only (8, 16) — the capture
          range objective for a coarse-to-fine schedule.

Reports AD-vs-secant sign agreement over a +-0.4 probe-offset sweep and
Adam-on-AD descent from +0.3.

    python scripts/pose_ncc_lab.py [--elements 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=128)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--offset", type=float, default=0.3)
    ap.add_argument("--axis", type=int, default=1)
    ap.add_argument("--objectives", nargs="+",
                    default=["mse", "ncc", "ncc-coarse"])
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from mcray_tpu.config import SimConfig
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.ops.imaging import gaussian_blur
    from mcray_tpu.scene.compile import load_and_compile

    root = os.path.join(os.path.dirname(__file__), "..")
    offs = np.linspace(-0.4, 0.4, 17)

    cfg = SimConfig(
        transducer_elements=args.elements,
        samples_per_element=args.samples,
        soft_scattering=True,
        trilinear_texture=True,
        soft_row_binning=True,
        bmode_rows=200,
        bmode_cols=250,
    )
    pack = load_and_compile(
        os.path.join(root, "assets", "sphere", "sphere.scene"), cfg
    )
    sim = Simulator(pack, cfg)
    true_pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)
    keys = jax.random.split(jax.random.PRNGKey(42), args.frames)
    state = sim._state
    render_impl = sim._render_impl
    mats = sim.materials

    def compound(pos, mats, state):
        # lax.map + checkpoint: frames render sequentially and the backward
        # rematerialises per frame — an 8-frame vmapped backward already
        # exceeds the 16 GB HBM (measured r5); memory is now ~1 frame's.
        one = jax.checkpoint(
            lambda k: render_impl(k, mats, pos, ang, state)["bmode"]
        )
        return jax.lax.map(one, keys).mean(0)

    target = jax.jit(compound)(true_pos, mats, state)
    tmax_np = float(jnp.max(target))
    scales_of = {
        "mse": (2.0, 4.0, 8.0),
        "ncc": (2.0, 4.0, 8.0),
        "ncc-coarse": (8.0, 16.0),
    }

    def ncc_term(a, b):
        a0 = a - jnp.mean(a)
        b0 = b - jnp.mean(b)
        return -jnp.sum(a0 * b0) * jax.lax.rsqrt(
            jnp.sum(a0 * a0) * jnp.sum(b0 * b0) + 1e-12
        )

    results = {}
    for obj in args.objectives:
        scales = scales_of[obj]
        bank = [np.asarray(gaussian_blur(target / tmax_np, s)) for s in scales]

        def loss(pos, mats, state, obj=obj, scales=scales, bank=bank):
            c = compound(pos, mats, state) / tmax_np
            total = 0.0
            for s, tb in zip(scales, bank):
                cb = gaussian_blur(c, s)
                tbj = jnp.asarray(tb)
                if obj == "mse":
                    total = total + jnp.mean((cb - tbj) ** 2)
                else:
                    total = total + ncc_term(cb, tbj)
            return total

        vg = jax.jit(jax.value_and_grad(loss))
        ax = args.axis
        vals, grads = [], []
        for dy in offs:
            pos = true_pos + jnp.zeros(3).at[ax].set(float(dy))
            v, g = vg(pos, mats, state)
            vals.append(float(v))
            grads.append(float(g[ax]))
        sec = np.gradient(np.asarray(vals), offs)
        nz = np.abs(offs) > 1e-9
        agree = float(np.mean(np.sign(grads)[nz] == np.sign(sec)[nz]))
        mag = float(np.median(
            np.abs(np.asarray(grads)[nz] / np.maximum(np.abs(sec[nz]), 1e-30))
        ))
        print(f"\n=== objective={obj} ===", flush=True)
        for d, v, g, s in zip(offs, vals, grads, sec):
            ok = "+" if np.sign(g) == np.sign(s) else "-"
            print(f"  off={d:+.2f} loss={v:.6g} AD={g:+.3e} secant={s:+.3e} {ok}")
        print(f"  AD-vs-secant sign agreement: {agree*100:.0f}%  "
              f"median |AD|/|secant|: {mag:.3f}", flush=True)

        opt = optax.adam(3e-2)
        pos = true_pos + jnp.zeros(3).at[ax].set(args.offset)
        ostate = opt.init(pos)
        for i in range(args.steps):
            v, g = vg(pos, mats, state)
            upd, ostate = opt.update(g, ostate, pos)
            pos = optax.apply_updates(pos, upd)
        err = float(jnp.linalg.norm(pos - true_pos))
        print(f"  AD descent: start {args.offset} -> |err| {err:.4f} "
              f"after {args.steps} steps", flush=True)
        results[obj] = {"sign_agreement": agree, "mag_ratio": mag,
                        "ad_descent_err": err}

    print("\nSUMMARY: " + json.dumps(results))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
