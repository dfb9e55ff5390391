"""Experiment: find a speckle-robust pose objective.

Maps the loss landscape w.r.t. a probe translation offset for several
candidate objectives, then runs Adam descent from +0.3 world units. Run on
TPU (fast) or CPU. Informs the production objective in models/trainer.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mcray_tpu.config import SimConfig
from mcray_tpu.models.simulator import Simulator
from mcray_tpu.scene.compile import load_and_compile

ROOT = os.path.join(os.path.dirname(__file__), "..")


def gaussian_blur(img, sigma):
    """Separable Gaussian blur, static kernel, reflect-ish via 'same' zero pad."""
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
    ap.add_argument("--frames", type=int, default=8, help="compounding frames")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--offset", type=float, default=0.3)
    args = ap.parse_args()

    cfg = SimConfig(
        transducer_elements=args.elements,
        samples_per_element=args.samples,
        soft_scattering=True,
        trilinear_texture=True,
        bmode_rows=200,
        bmode_cols=250,
    )
    pack = load_and_compile(os.path.join(ROOT, "assets", "sphere", "sphere.scene"), cfg)
    sim = Simulator(pack, cfg)
    true_pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)
    keys = jax.random.split(jax.random.PRNGKey(42), args.frames)
    h = hash(cfg)

    def compound(pos):
        return jax.vmap(
            lambda k: sim._render(k, sim.materials, pos, ang, h)["bmode"]
        )(keys).mean(0)

    target_c = jax.jit(compound)(true_pos)
    target_single = sim._render(keys[0], sim.materials, true_pos, ang, h)["bmode"]

    # normalise scale so losses are comparable
    tmax = jnp.max(target_c)

    losses = {
        "mse_single": lambda pos: jnp.mean(
            (sim._render(keys[0], sim.materials, pos, ang, h)["bmode"] - target_single) ** 2
        ),
        "mse_compound": lambda pos: jnp.mean((compound(pos) - target_c) ** 2),
        "blur4": lambda pos: jnp.mean(
            (gaussian_blur(compound(pos) / tmax, 4.0) - gaussian_blur(target_c / tmax, 4.0)) ** 2
        ),
        "blur8": lambda pos: jnp.mean(
            (gaussian_blur(compound(pos) / tmax, 8.0) - gaussian_blur(target_c / tmax, 8.0)) ** 2
        ),
        "multiscale": lambda pos: sum(
            jnp.mean(
                (gaussian_blur(compound(pos) / tmax, s) - gaussian_blur(target_c / tmax, s)) ** 2
            )
            for s in (2.0, 4.0, 8.0)
        ),
    }

    offs = np.linspace(-0.5, 0.5, 21)
    print("=== landscape (loss vs dy offset) ===")
    jitted = {name: jax.jit(fn) for name, fn in losses.items()}
    grads = {name: jax.jit(jax.grad(fn)) for name, fn in losses.items()}
    rows = {name: [] for name in losses}
    gsign = {name: [] for name in losses}
    for dy in offs:
        pos = true_pos + jnp.array([0.0, float(dy), 0.0])
        for name in losses:
            rows[name].append(float(jitted[name](pos)))
            g = grads[name](pos)
            gsign[name].append(float(g[1]))
    for name in losses:
        print(f"\n{name}:")
        for dy, v, g in zip(offs, rows[name], gsign[name]):
            # a good objective: v decreasing toward dy=0, g same sign as dy
            ok = "+" if (dy == 0 or np.sign(g) == np.sign(dy)) else "-"
            print(f"  dy={dy:+.2f}  loss={v:.6g}  dL/dy={g:+.3g}  {ok}")
        sgn = [np.sign(g) == np.sign(d) for d, g in zip(offs, gsign[name]) if d != 0]
        print(f"  grad-sign agreement: {np.mean(sgn)*100:.0f}%")

    print("\n=== descent from +offset (multiscale) ===")
    import optax

    for name in ["multiscale", "blur8", "mse_compound"]:
        opt = optax.adam(3e-2)
        pos = true_pos + jnp.array([0.0, args.offset, 0.0])
        state = opt.init(pos)
        fn = jax.jit(jax.value_and_grad(losses[name]))
        for i in range(args.steps):
            loss, g = fn(pos)
            upd, state = opt.update(g, state, pos)
            pos = optax.apply_updates(pos, upd)
            if i % 10 == 0 or i == args.steps - 1:
                err = float(jnp.linalg.norm(pos - true_pos))
                print(f"  [{name}] step {i}: loss {float(loss):.4g} |pos err| {err:.4f}")
        err = float(jnp.linalg.norm(pos - true_pos))
        print(f"  [{name}] final |pos err| = {err:.4f} (start {args.offset})")


if __name__ == "__main__":
    main()
