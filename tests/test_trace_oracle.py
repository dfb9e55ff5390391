"""Full trace-loop parity: the vectorised lax.scan bounce loop
(models/simulator.trace_paths) against a sequential scalar port of the
reference's cast_rays (tests/oracle_trace.py), fed the SAME pre-drawn
randoms — closing VERDICT r1 item 2 (reference composition:
/root/reference/src/scene.cpp:50-183 + src/ray.cpp:11-97)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import trace_paths
from mcray_tpu.ops import physics
from mcray_tpu.probe.transducer import element_layout
from mcray_tpu.scene.compile import load_and_compile

from oracle_trace import trace_oracle

SCENE = os.path.join(
    os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene"
)


@pytest.mark.parametrize("bug_compat", [False, True])
def test_trace_matches_sequential_oracle(bug_compat):
    cfg = small_test_config(
        transducer_elements=24,
        samples_per_element=2,
        bug_compat_material_transition=bug_compat,
        # the oracle ports the reference's cast_rays verbatim, which traces
        # past the image window (src/scene.cpp:102); disable the
        # output-invariant window cull so the segment tensors are comparable
        cull_time_window=False,
    )
    pack = load_and_compile(SCENE, cfg)
    scene = {k: jnp.asarray(v) for k, v in pack.trace_tables().items()}
    mats = jnp.asarray(pack.materials)
    pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)
    key = jax.random.PRNGKey(7)

    # unjitted on purpose: XLA's jit-fused FMA rounding can legitimately flip
    # a marginal shared-edge triangle decision (verified: jit vs no-jit of
    # trace_paths itself differ on one path for this seed), and oracle parity
    # is only defined up to f32 determinism
    segs = trace_paths(
        key, mats, pos, ang, scene,
        jnp.asarray(pack.spacing), jnp.int32(pack.starting_material), cfg,
    )

    # identical random stream for the oracle
    n = cfg.transducer_elements * cfg.samples_per_element
    path_ids = jnp.arange(n, dtype=jnp.uint32)
    path_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, path_ids)
    draws = {
        k: np.asarray(v)
        for k, v in physics.draw_bounce_randoms(path_keys, cfg.max_depth).items()
    }

    positions, directions = element_layout(pos, ang, cfg)
    tables = pack.trace_tables()
    oracle = trace_oracle(
        np.asarray(positions),
        np.asarray(directions),
        np.asarray(pack.materials),
        tables["tris"],
        tables["tri_mesh_id"],
        tables["mesh_mat_inside"],
        tables["mesh_mat_outside"],
        tables["mesh_is_vascular"],
        np.asarray(pack.spacing),
        int(pack.starting_material),
        draws,
        cfg,
    )

    valid_j = np.asarray(segs["valid"])
    assert valid_j.any(), "degenerate test: no valid segments"
    np.testing.assert_array_equal(valid_j, oracle["valid"])
    np.testing.assert_array_equal(
        np.asarray(segs["media_id"])[valid_j], oracle["media_id"][valid_j]
    )

    m = valid_j
    for field, tol in [
        ("from", 1e-5),
        ("to", 1e-5),
        ("direction", 1e-4),
        ("initial", 1e-5),
        ("attenuation", 1e-6),
        ("distance", 1e-4),
        ("reflected", 1e-3),
    ]:
        a = np.asarray(segs[field])
        b = oracle[field]
        mask = np.broadcast_to(m[..., None], a.shape) if a.ndim == 3 else m
        # elementwise relative-or-absolute: miss segments carry huge
        # max_ray_length dests (~1e8), so a global scale would be vacuous
        bad = np.abs(a - b)[mask] > tol * (1.0 + np.abs(b)[mask])
        assert not bad.any(), (
            f"{field}: {bad.sum()} elements beyond tol "
            f"(max |diff| {np.abs(a - b)[mask].max():.3e})"
        )
