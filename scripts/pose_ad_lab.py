"""Measure: does soft row-binning make AD pose gradients usable?

VERDICT r3 item 7: the diagnosed root cause of sign-noisy AD pose gradients
was the add_echo floor row-binning (zero derivative a.e. in echo time —
reference src/rfimage.h:33-40); this lab re-runs the pose-objective gradient
audit of scripts/pose_objective_lab.py with cfg.soft_row_binning on and off
and reports AD-vs-secant sign agreement + descent, holding everything else
(soft scattering, trilinear texture, fixed speckle keys) equal.

    python scripts/pose_ad_lab.py [--elements 128] [--frames 4]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--axis", type=int, default=1, help="probe axis to sweep")
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

    results = {}
    for soft_bin in (False, True):
        cfg = SimConfig(
            transducer_elements=args.elements,
            samples_per_element=args.samples,
            soft_scattering=True,
            trilinear_texture=True,
            soft_row_binning=soft_bin,
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
            return jax.vmap(
                lambda k: render_impl(k, mats, pos, ang, state)["bmode"]
            )(keys).mean(0)

        target = jax.jit(compound)(true_pos, mats, state)
        tmax_np = float(jnp.max(target))
        target_bank = [
            np.asarray(gaussian_blur(target / tmax_np, s)) for s in (2.0, 4.0, 8.0)
        ]

        def loss(pos, mats, state):
            c = compound(pos, mats, state) / tmax_np
            return sum(
                jnp.mean((gaussian_blur(c, s) - jnp.asarray(tb)) ** 2)
                for s, tb in zip((2.0, 4.0, 8.0), target_bank)
            )

        vg = jax.jit(jax.value_and_grad(loss))
        ax = args.axis
        vals, grads = [], []
        for dy in offs:
            pos = true_pos + jnp.zeros(3).at[ax].set(float(dy))
            v, g = vg(pos, mats, state)
            vals.append(float(v))
            grads.append(float(g[ax]))
        # secant slope of the (smooth) loss landscape as ground truth
        sec = np.gradient(np.asarray(vals), offs)
        nz = np.abs(offs) > 1e-9
        agree = np.mean(np.sign(grads)[nz] == np.sign(sec)[nz])
        mag = np.median(np.abs(np.asarray(grads)[nz] / np.maximum(np.abs(sec[nz]), 1e-30)))
        print(f"\n=== soft_row_binning={soft_bin} ===")
        for d, v, g, s in zip(offs, vals, grads, sec):
            ok = "+" if np.sign(g) == np.sign(s) else "-"
            print(f"  off={d:+.2f} loss={v:.6g} AD={g:+.3e} secant={s:+.3e} {ok}")
        print(f"  AD-vs-secant sign agreement: {agree*100:.0f}%  "
              f"median |AD|/|secant|: {mag:.3f}")

        # Adam descent on AD gradients from +offset
        opt = optax.adam(3e-2)
        pos = true_pos + jnp.zeros(3).at[ax].set(args.offset)
        ostate = opt.init(pos)
        for i in range(args.steps):
            v, g = vg(pos, mats, state)
            upd, ostate = opt.update(g, ostate, pos)
            pos = optax.apply_updates(pos, upd)
        err = float(jnp.linalg.norm(pos - true_pos))
        print(f"  AD descent: start {args.offset} -> |err| {err:.4f} "
              f"after {args.steps} steps")
        results[soft_bin] = (agree, err)

    a0, e0 = results[False]
    a1, e1 = results[True]
    print(f"\nSUMMARY: sign agreement {a0*100:.0f}% -> {a1*100:.0f}%; "
          f"AD-descent err {e0:.4f} -> {e1:.4f} (soft binning)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
