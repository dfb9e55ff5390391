"""Differentiable fit: recover acoustic material parameters from a target
B-mode image by gradient descent through the whole renderer.

The flagship differentiable workload (BASELINE.json configs: "recover
impedance/attenuation/scatter-density from target B-mode via pixel-loss
gradients"). The reference has no equivalent — its renderer is
non-differentiable C++. Here the loss is pixel MSE on the scan-converted
B-mode and gradients flow through scan conversion, envelope, convolution,
echo scatter-add, Beer-Lambert attenuation, Fresnel splits and the perturbed-
normal sampling into the (M, 8) material table (and optionally probe pose).

For useful gradients on the scattering threshold (mu1) enable
``cfg.soft_scattering`` / ``cfg.trilinear_texture`` (the straight-through
relaxation; SURVEY.md §7 "differentiating through discreteness").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..config import SimConfig
from ..ops import physics

Array = jax.Array

# Default trainable columns: impedance, attenuation, mu0, mu1, sigma.
# Specularity/shininess/thickness stay frozen (integer-ish semantics).
DEFAULT_TRAINABLE = (
    physics.IMPEDANCE,
    physics.ATTENUATION,
    physics.MU0,
    physics.MU1,
    physics.SIGMA,
)


def column_mask(n_materials: int, columns=DEFAULT_TRAINABLE, rows=None) -> Array:
    """Trainability mask. Restricting ``rows`` to the materials actually under
    fit matters with Adam: its per-parameter normalisation moves every masked
    parameter by ~lr regardless of gradient magnitude, so leaving a
    near-zero-gradient material (e.g. the reference scenes' GEL with
    attenuation 1e-8) trainable lets the optimiser wander it destructively."""
    mask = jnp.zeros((n_materials, 8), jnp.float32)
    row_sel = list(range(n_materials)) if rows is None else list(rows)
    for r in row_sel:
        mask = mask.at[r, list(columns)].set(1.0)
    return mask


@dataclasses.dataclass
class FitState:
    materials: Array
    opt_state: Any
    step: int = 0


class MaterialFitter:
    """Adam fit of the material table against a target B-mode.

    ``render_fn(key, materials) -> bmode`` abstracts over single-chip
    (Simulator) and sharded (ShardedRenderer) execution: shard_map is
    differentiable, so the same loss/grad code drives both; under sharding
    the material-gradient psum over chips is inserted by AD.
    """

    def __init__(
        self,
        render_fn: Callable[[Array, Array], Array],
        init_materials: Array,
        target: Array,
        learning_rate: float = 1e-2,
        trainable=DEFAULT_TRAINABLE,
        trainable_rows=None,
        n_frames_per_step: int = 1,
        fixed_key: Array | None = None,
    ):
        # fixed_key freezes the Monte-Carlo noise (same speckle realisation
        # for target and prediction) — the standard inverse-rendering setup;
        # without it the fit sees a speckle-decorrelation noise floor and
        # needs many frames per step to average it out.
        self.render_fn = render_fn
        self.target = target
        self.mask = column_mask(init_materials.shape[0], trainable, trainable_rows)
        self.optimizer = optax.adam(learning_rate)
        self.state = FitState(
            materials=jnp.asarray(init_materials),
            opt_state=self.optimizer.init(jnp.asarray(init_materials)),
        )
        self.n_frames = n_frames_per_step
        self.fixed_key = fixed_key

        def loss_fn(materials, key):
            if self.n_frames == 1:
                pred = self.render_fn(key, materials)
            else:
                # Average over MC frames to reduce speckle-gradient variance.
                keys = jax.random.split(key, self.n_frames)
                pred = jax.vmap(lambda k: self.render_fn(k, materials))(keys).mean(0)
            return jnp.mean((pred - self.target) ** 2)

        @jax.jit
        def step(state_materials, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(state_materials, key)
            grads = grads * self.mask
            updates, opt_state = self.optimizer.update(grads, opt_state, state_materials)
            materials = optax.apply_updates(state_materials, updates)
            # keep physical parameters positive
            materials = jnp.maximum(materials, 1e-4) * self.mask + materials * (1 - self.mask)
            return materials, opt_state, loss, grads

        self._step = step

    def run(self, n_steps: int, seed: int = 0, log_every: int = 10, verbose: bool = True):
        return _run_loop(self, n_steps, seed, log_every, verbose)


class PoseFitter:
    """EXPERIMENTAL: gradient descent on the probe pose.

    The probe layout is a pure function of pose (probe/transducer.py), so
    pose gradients exist end-to-end through the renderer. However, the
    pixel-MSE landscape w.r.t. pose is speckle-rough: moving the probe a
    fraction of a wavelength fully decorrelates speckle, so naive descent is
    not a reliable registration method (measured: non-monotone loss and
    sign-noisy gradients within +-0.3 world units even with frozen RNG and
    compounding). This class exposes the machinery; robust registration
    needs a speckle-invariant objective (future work).

    ``render_fn(key, position, angles) -> bmode``.
    """

    def __init__(
        self,
        render_fn,
        init_position: Array,
        init_angles: Array,
        target: Array,
        learning_rate: float = 5e-2,
        fit_angles: bool = False,
        fixed_key: Array | None = None,
    ):
        self.render_fn = render_fn
        self.target = target
        self.fit_angles = fit_angles
        self.fixed_key = fixed_key
        self.n_frames = 1
        self.optimizer = optax.adam(learning_rate)
        params = {"position": jnp.asarray(init_position)}
        if fit_angles:
            params["angles"] = jnp.asarray(init_angles)
        self._angles0 = jnp.asarray(init_angles)
        self.state = FitState(materials=params, opt_state=self.optimizer.init(params))

        def loss_fn(params, key):
            ang = params.get("angles", self._angles0)
            pred = self.render_fn(key, params["position"], ang)
            return jnp.mean((pred - self.target) ** 2)

        @jax.jit
        def step(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, key)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, grads

        self._step = step

    def run(self, n_steps: int, seed: int = 0, log_every: int = 10, verbose: bool = True):
        return _run_loop(self, n_steps, seed, log_every, verbose)

    @property
    def position(self):
        return self.state.materials["position"]


def _run_loop(fitter, n_steps: int, seed: int, log_every: int, verbose: bool):
    losses = []
    for i in range(n_steps):
        if fitter.fixed_key is not None:
            key = fitter.fixed_key
        else:
            key = jax.random.fold_in(jax.random.PRNGKey(seed), fitter.state.step)
        params, opt_state, loss, grads = fitter._step(
            fitter.state.materials, fitter.state.opt_state, key
        )
        fitter.state = FitState(params, opt_state, fitter.state.step + 1)
        losses.append(float(loss))
        if verbose and (i % log_every == 0 or i == n_steps - 1):
            gnorm = float(
                optax.global_norm(grads) if not isinstance(grads, jax.Array)
                else jnp.linalg.norm(grads)
            )
            print(f"step {fitter.state.step}: loss {losses[-1]:.6g} |g| {gnorm:.3g}")
    return losses
