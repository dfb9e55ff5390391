"""Gradients through the Pallas kernels (interpret mode on CPU) must match
the jnp reference path — the differentiable-fit workload on the fast kernels
(VERDICT r1 item 1: custom_vjp for march/postproc/scanconv, gradient-
transparent intersect)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import march_and_accumulate, render, trace_paths
from mcray_tpu.ops import imaging, texture
from mcray_tpu.ops.pallas.march import march_and_accumulate_pallas
from mcray_tpu.scene.compile import load_and_compile

SCENE = os.path.join(
    os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene"
)


def _setup(cfg):
    pack = load_and_compile(SCENE, cfg)
    scene = {k: jnp.asarray(v) for k, v in pack.trace_tables().items()}
    mats = jnp.asarray(pack.materials)
    vol = texture.make_texture_volume(jax.random.PRNGKey(1), cfg)
    args = (
        jnp.asarray(pack.transducer_position),
        jnp.asarray(pack.transducer_angles),
        scene,
        jnp.asarray(pack.spacing),
        jnp.int32(pack.starting_material),
    )
    return pack, mats, vol, args


def _march_loss_pair(cfg, key, mats, vol, args, w):
    pos, ang, scene, spacing, start = args

    def loss(materials, position, use_pallas):
        segs = trace_paths(
            key, materials, position, ang, scene, spacing, start, cfg
        )
        if use_pallas:
            rf = march_and_accumulate_pallas(
                segs, materials, vol, cfg, interpret=True
            )
        else:
            rf = march_and_accumulate(segs, materials, vol, cfg)
        return jnp.sum(rf * w)

    return loss


@pytest.mark.parametrize(
    "mode",
    ["hard_nearest", "soft_nearest", "soft_trilinear", "hard_trilinear"],
)
def test_march_grads_match_jnp(mode):
    cfg = small_test_config(
        transducer_elements=16,
        samples_per_element=2,
        soft_scattering="soft" in mode,
        trilinear_texture="trilinear" in mode,
    )
    pack, mats, vol, args = _setup(cfg)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(jax.random.PRNGKey(2), (cfg.rf_rows, cfg.rf_cols))
    loss = _march_loss_pair(cfg, key, mats, vol, args, w)
    pos = args[0]

    f_ref = np.asarray(loss(mats, pos, False))
    f_pal = np.asarray(loss(mats, pos, True))
    np.testing.assert_allclose(f_pal, f_ref, rtol=2e-4, atol=1e-6)

    g_ref = np.asarray(jax.grad(loss, argnums=0)(mats, pos, False))
    g_pal = np.asarray(jax.grad(loss, argnums=0)(mats, pos, True))
    scale = np.abs(g_ref).max() + 1e-8
    # trilinear routes position cotangents through the (mildly noise-
    # amplifying) hit-geometry backward; allow a looser composed tolerance
    atol = 2e-3 if "trilinear" in mode else 2e-4
    np.testing.assert_allclose(g_pal / scale, g_ref / scale, atol=atol)
    assert np.abs(g_ref).max() > 0  # non-degenerate test


def test_march_pose_grads_trilinear():
    """Probe-position gradients through the march kernel (texture position
    partials only exist in trilinear mode) match the jnp path."""
    cfg = small_test_config(
        transducer_elements=16,
        samples_per_element=2,
        soft_scattering=True,
        trilinear_texture=True,
    )
    pack, mats, vol, args = _setup(cfg)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(jax.random.PRNGKey(2), (cfg.rf_rows, cfg.rf_cols))
    loss = _march_loss_pair(cfg, key, mats, vol, args, w)
    pos = args[0]

    g_ref = np.asarray(jax.grad(loss, argnums=1)(mats, pos, False))
    g_pal = np.asarray(jax.grad(loss, argnums=1)(mats, pos, True))
    scale = np.abs(g_ref).max() + 1e-8
    np.testing.assert_allclose(g_pal / scale, g_ref / scale, atol=5e-4)
    assert np.abs(g_ref).max() > 0


def test_postproc_grads_match_jnp():
    from mcray_tpu.ops.pallas.postproc import convolve_envelope_pallas

    cfg = small_test_config()
    key = jax.random.PRNGKey(0)
    rf = jax.random.normal(key, (cfg.rf_rows, cfg.rf_cols))
    w = jax.random.normal(jax.random.PRNGKey(1), (cfg.rf_rows, cfg.rf_cols))

    def loss_pal(x):
        return jnp.sum(convolve_envelope_pallas(x, cfg, interpret=True) * w)

    def loss_ref(x):
        return jnp.sum(imaging.envelope(imaging.convolve_psf(x, cfg)) * w)

    np.testing.assert_allclose(
        np.asarray(loss_pal(rf)), np.asarray(loss_ref(rf)), rtol=1e-5
    )
    g_pal = np.asarray(jax.grad(loss_pal)(rf))
    g_ref = np.asarray(jax.grad(loss_ref)(rf))
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4, atol=1e-5)


def test_scanconv_grads_match_jnp():
    from mcray_tpu.ops.pallas.scanconv import pack_scan_maps, scan_convert_pallas

    cfg = small_test_config()
    maps = imaging.scan_conversion_maps(cfg)
    table = jnp.asarray(
        pack_scan_maps(maps[0], maps[1], cfg.rf_rows, cfg.rf_cols)
    )
    rf = jax.random.normal(jax.random.PRNGKey(0), (cfg.rf_rows, cfg.rf_cols))
    w = jax.random.normal(jax.random.PRNGKey(1), (cfg.bmode_rows, cfg.bmode_cols))

    def loss_pal(x):
        return jnp.sum(
            scan_convert_pallas(
                x, table, cfg.bmode_cols, interpret=True, precision="highest"
            )
            * w
        )

    def loss_ref(x):
        return jnp.sum(
            imaging.scan_convert(x, jnp.asarray(maps[0]), jnp.asarray(maps[1])) * w
        )

    np.testing.assert_allclose(
        np.asarray(loss_pal(rf)), np.asarray(loss_ref(rf)), rtol=1e-5
    )
    g_pal = np.asarray(jax.grad(loss_pal)(rf))
    g_ref = np.asarray(jax.grad(loss_ref)(rf))
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4, atol=1e-5)


def test_intersect_grads_match_jnp():
    """Geometry gradients (origin/segment) through the Pallas intersect:
    the kernel picks the winner, jnp recomputes t differentiably."""
    from mcray_tpu.ops.geometry import intersect_closest
    from mcray_tpu.ops.pallas.intersect import (
        intersect_closest_pallas,
        intersect_closest_culled,
        pack_tris_culled,
    )

    cfg = small_test_config()
    pack, mats, vol, args = _setup(cfg)
    tris = jnp.asarray(pack.tris)
    mid = jnp.asarray(pack.tri_mesh_id)
    key = jax.random.PRNGKey(3)
    n = 64
    origins = jax.random.normal(key, (n, 3)) * 0.5
    segs = jax.random.normal(jax.random.PRNGKey(4), (n, 3)) * 4.0
    packed = pack_tris_culled(pack.tris, pack.tri_mesh_id)

    def loss(fn):
        def f(o, s):
            h = fn(o, s)
            return jnp.sum(jnp.where(h["hit"], h["t"], 0.0)) + jnp.sum(
                h["point"] * h["hit"][:, None]
            )
        return f

    f_ref = loss(lambda o, s: intersect_closest(o, s, tris, mid))
    f_pal = loss(
        lambda o, s: intersect_closest_pallas(o, s, tris, mid, interpret=True)
    )
    f_cul = loss(
        lambda o, s: intersect_closest_culled(o, s, packed, interpret=True)
    )

    for f in (f_pal, f_cul):
        go_ref, gs_ref = jax.grad(f_ref, argnums=(0, 1))(origins, segs)
        go, gs = jax.grad(f, argnums=(0, 1))(origins, segs)
        np.testing.assert_allclose(np.asarray(go), np.asarray(go_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref), rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(go_ref)).max() > 0


def test_end_to_end_render_grads_all_kernels():
    """jax.grad of the full render with every Pallas kernel enabled
    (interpret) vs the all-jnp pipeline — the fit workload on the fast path."""
    from mcray_tpu.ops.pallas import march as march_mod
    from mcray_tpu.ops.pallas import postproc as postproc_mod
    from mcray_tpu.ops.pallas import scanconv as scanconv_mod
    from mcray_tpu.ops.pallas.scanconv import pack_scan_maps

    cfg = small_test_config(
        transducer_elements=16,
        samples_per_element=2,
        soft_scattering=True,
        trilinear_texture=True,
    )
    pack, mats, vol, args = _setup(cfg)
    pos, ang, scene, spacing, start = args
    maps = imaging.scan_conversion_maps(cfg)
    scan_maps = (jnp.asarray(maps[0]), jnp.asarray(maps[1]))
    table = jnp.asarray(pack_scan_maps(maps[0], maps[1], cfg.rf_rows, cfg.rf_cols))
    key = jax.random.PRNGKey(0)
    target = jax.random.normal(
        jax.random.PRNGKey(9), (cfg.bmode_rows, cfg.bmode_cols)
    )

    # route interpret=True through the render() kernel call sites
    orig_march = march_mod.march_and_accumulate_pallas
    orig_post = postproc_mod.convolve_envelope_pallas
    orig_scan = scanconv_mod.scan_convert_pallas
    march_mod.march_and_accumulate_pallas = lambda *a, **k: orig_march(
        *a, **{**k, "interpret": True}
    )
    postproc_mod.convolve_envelope_pallas = lambda *a, **k: orig_post(
        *a, **{**k, "interpret": True}
    )
    scanconv_mod.scan_convert_pallas = lambda *a, **k: orig_scan(
        *a, **{**k, "interpret": True, "precision": "highest"}
    )
    try:
        def loss(materials, fast):
            out = render(
                key, materials, pos, ang, scene, spacing, start, vol,
                scan_maps, cfg,
                use_pallas_march=fast,
                use_fused_postproc=fast,
                scan_table=table if fast else None,
            )
            return jnp.mean((out["bmode"] - target) ** 2)

        l_ref = np.asarray(loss(mats, False))
        l_pal = np.asarray(loss(mats, True))
        np.testing.assert_allclose(l_pal, l_ref, rtol=1e-4)

        g_ref = np.asarray(jax.grad(loss)(mats, False))
        g_pal = np.asarray(jax.grad(loss)(mats, True))
        scale = np.abs(g_ref).max() + 1e-12
        # composed tolerance: the hit-geometry backward amplifies f32 noise
        # (measured ~1e4x on cotangent perturbations; see the conditioning
        # note in trace_paths), so component-exact grads still drift ~1e-3
        # normalized after full composition
        np.testing.assert_allclose(g_pal / scale, g_ref / scale, atol=5e-3)
        assert np.abs(g_ref).max() > 0
    finally:
        march_mod.march_and_accumulate_pallas = orig_march
        postproc_mod.convolve_envelope_pallas = orig_post
        scanconv_mod.scan_convert_pallas = orig_scan
