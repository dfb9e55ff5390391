"""Experiment 2: finite-difference descent on the smoothed pose loss.

pose_objective_lab.py showed the compounded+blurred loss VALUES are smooth
and bowl-shaped while the AD gradients are sign-noisy and ~10x below the
secant slope (pose sensitivity flows through floor-quantised row binning and
hit/miss discretenesses AD cannot see). So: central finite differences on the
smooth loss, one batched vmap render per step.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mcray_tpu.config import SimConfig
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.scene.compile import load_and_compile

ROOT = os.path.join(os.path.dirname(__file__), "..")


def gaussian_blur(img, sigma):
    radius = int(3 * sigma)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    n = k.shape[0]
    padded = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    rows = img.shape[0]
    out = sum(padded[i : i + rows, :] * k[i] for i in range(n))
    padded = jnp.pad(out, ((0, 0), (radius, radius)), mode="edge")
    cols = img.shape[1]
    return sum(padded[:, i : i + cols] * k[i] for i in range(n))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=128)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--offset", type=float, default=0.3)
    ap.add_argument("--delta", type=float, default=0.05)
    ap.add_argument("--lr", type=float, default=3e-2)
    args = ap.parse_args()

    cfg = SimConfig(
        transducer_elements=args.elements,
        samples_per_element=args.samples,
        bmode_rows=200,
        bmode_cols=250,
    )
    pack = load_and_compile(os.path.join(ROOT, "assets", "sphere", "sphere.scene"), cfg)
    sim = Simulator(pack, cfg)
    true_pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)
    keys = jax.random.split(jax.random.PRNGKey(42), args.frames)
    h = hash(cfg)

    from mcray_tpu.models.trainer import PoseFitter

    def render(k, pos, a):
        return sim._render(k, sim.materials, pos, a, h)["bmode"]

    target = PoseFitter.compound(render, keys, true_pos, ang)
    start = true_pos + jnp.array([0.0, args.offset, 0.0])
    fitter = PoseFitter(
        render, start, ang, target,
        learning_rate=args.lr, method="fd", keys=keys,
        fd_delta=args.delta,
    )
    fitter.run(args.steps, log_every=5)
    err = float(jnp.linalg.norm(fitter.position - true_pos))
    print(f"final |pos err| = {err:.4f} (start {args.offset})")


if __name__ == "__main__":
    main()
