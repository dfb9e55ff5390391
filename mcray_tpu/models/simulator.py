"""End-to-end ultrasound simulator: trace -> march -> RF image -> B-mode.

TPU-first rebuild of the reference's frame loop (reference: src/main.cpp:92-152
and scene::cast_rays, src/scene.cpp:50-183). Structural translation to XLA:

- the ragged ``array<array<vector<segment>,S>,R>`` becomes a dense
  ``(D, N, field)`` segment tensor with a validity mask (N = R*S paths),
- the per-ray bounce loop becomes one ``lax.scan`` of static depth D over the
  whole path batch,
- the per-segment marching loop becomes a masked (N*D, MAX_STEPS) sample grid
  scatter-added into the RF image in one shot,
- all randomness is keyed (threefry counter PRNG) — one seed renders one
  reproducible frame, vs the reference's per-call std::random_device.

Everything below jit-compiles to a single XLA program; materials, probe pose
and the scatterer field are differentiable inputs.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops import imaging, physics, texture
from ..ops.geometry import intersect_closest, safe_norm
from ..ops.bvh import bvh_intersect_closest
from ..probe.transducer import element_layout

Array = jax.Array

# Segment record field layout (dense equivalent of ray_physics::segment,
# reference src/ray.h:28-36).
SEGMENT_FIELDS = (
    "from",            # (N,3) start of homogeneous span
    "to",              # (N,3) end (inside_point for hits, ray end for misses)
    "direction",       # (N,3)
    "reflected",       # boundary echo intensity (Mattausch Eq. 8 term)
    "initial",         # intensity at segment start (pre-attenuation)
    "attenuation",     # media attenuation
    "distance",        # mm travelled from transducer to segment start
    "media_id",        # i32
    "valid",           # bool
)


def distance_in_mm(a: Array, b: Array, spacing: Array) -> Array:
    """World distance with per-axis spacing, x10 to mm (src/scene.cpp:281-290)."""
    d = jnp.abs(a - b) * spacing
    return safe_norm(d) * 10.0


def trace_paths(
    key: Array,
    materials: Array,          # (M, 8) f32 — differentiable
    probe_position: Array,     # (3,)
    probe_angles_deg: Array,   # (3,)
    scene: dict[str, Any],     # trace_tables() of a ScenePack (+ spacing, start id)
    spacing: Array,            # (3,)
    starting_material: Array,  # scalar i32
    cfg: SimConfig,
    *,
    use_bvh: bool = False,
    bvh_arrays: tuple | None = None,
    intersect_chunk: int = 0,
    use_pallas_intersect: bool = False,
    culled_tris=None,
    intersect_tile_r: int = 128,
    intersect_interpret: bool = False,
    sort_packets: bool = False,
    elements: tuple[Array, Array, Array, Array] | None = None,
) -> dict[str, Array]:
    """Monte-Carlo path tracing for all R*S paths; returns the dense segment
    tensor stacked over bounce depth: each field (D, N, ...).

    ``elements`` overrides the element batch for sharded execution:
    (positions (R_local,3), directions (R_local,3), elem_idx (N_local,) local
    column index, path_ids (N_local,) GLOBAL path ids). Per-path randomness is
    keyed by global path id, so a sharded render is bitwise identical to the
    single-chip one.
    """
    n_samples = cfg.samples_per_element
    freq = cfg.transducer_frequency
    eps = cfg.intensity_epsilon

    if elements is None:
        n_rays = cfg.transducer_elements
        positions, directions = element_layout(probe_position, probe_angles_deg, cfg)
        elem_idx = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), n_samples)
        path_ids = jnp.arange(n_rays * n_samples, dtype=jnp.uint32)
    else:
        positions, directions, elem_idx, path_ids = elements
    n = elem_idx.shape[0]
    # paths per element in THIS batch (differs from cfg.samples_per_element
    # when the sample axis is sharded)
    local_samples = n // positions.shape[0]
    path_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, path_ids)

    tris = scene["tris"]
    tri_mesh_id = scene["tri_mesh_id"]
    mesh_in = scene["mesh_mat_inside"]
    mesh_out = scene["mesh_mat_outside"]
    mesh_vasc = scene["mesh_is_vascular"]

    state = {
        "from": jnp.repeat(positions, local_samples, axis=0),
        "dir": jnp.repeat(directions, local_samples, axis=0),
        "media_id": jnp.full((n,), starting_material, jnp.int32),
        "media_outside_id": jnp.full((n,), -1, jnp.int32),
        "intensity": jnp.full((n,), cfg.initial_intensity / n_samples, jnp.float32),
        "distance_mm": jnp.zeros((n,), jnp.float32),
        "alive": jnp.ones((n,), bool),
    }

    # all threefry work batched over (depth, path) in one pass; bitwise
    # identical to deriving per bounce inside the scan
    bounce_draws = physics.draw_bounce_randoms(path_keys, cfg.max_depth)

    # per-mesh inside-thickness, composed on the tiny (n_mesh,) axis so the
    # per-ray lookup below is a single one-hot row (see physics.take_rows)
    thick_by_mesh = physics.take_rows(materials, mesh_in)[:, physics.THICKNESS]

    def bounce(state, draws):
        att = physics.take_rows(
            materials[:, physics.ATTENUATION : physics.ATTENUATION + 1],
            state["media_id"],
        )[:, 0]
        r_length = physics.max_ray_length(
            jnp.maximum(state["intensity"], eps * 1e-3), att, freq, eps
        )
        origin = state["from"] + cfg.ray_start_offset * state["dir"]
        # enlarge(): mm/100 with per-axis spacing (src/scene.cpp:292-298).
        # r_length is detached: it only sets the ray's REACH (a discrete
        # hit/no-hit decision) — the hit point is invariant to the segment
        # scale (t compensates exactly), so its analytic gradient is zero,
        # but computing it in f32 is a catastrophic cancellation of huge
        # log(eps/I)/att^2 terms that amplifies float noise ~1e7x into the
        # material gradients. Detaching removes the noise channel only.
        r_len_ng = jax.lax.stop_gradient(r_length)
        dest = state["from"] + (r_len_ng[:, None] / 100.0) * spacing * state["dir"]
        # dead rays get a zero segment parked far outside every cluster AABB:
        # they can't hit anything (det==0 -> miss, exactly as before), and a
        # ray tile whose packet is all-dead now skips every cluster in the
        # culled kernel instead of slab-hitting with its stale direction
        alive_col = state["alive"][:, None]
        seg_vec = (dest - origin) * alive_col
        origin = jnp.where(alive_col, origin, 1e9)

        if culled_tris is not None:
            from ..ops.pallas import intersect as I

            packed, mode = culled_tris
            fn = {
                "culled": I.intersect_closest_culled,
                "staged": I.intersect_closest_staged,
                "listed": I.intersect_closest_listed,
                # cluster-major kernel for incoherent (bounce) rays — see
                # intersect_closest_grouped; coherent subsets overflow to
                # its residual listed pass, so it is safe at every depth
                "grouped": I.intersect_closest_grouped,
            }[mode]
            if mode == "grouped":
                fn = functools.partial(
                    fn,
                    residual_tile_r=intersect_tile_r,
                    interpret=intersect_interpret,
                )
            else:
                fn = functools.partial(
                    fn, tile_r=intersect_tile_r, interpret=intersect_interpret
                )
            if sort_packets:
                # coherence-sort rays into tight packets (opt-in: element
                # order is already coherent for traced rays, and the argsort
                # + unsort gather costs more than the clusters it skips —
                # measured +1.9 ms/frame on the 123k-tri HD scene,
                # scripts/hd_batched_probe.py. Worth re-enabling only for
                # genuinely incoherent ray sets, e.g. stress_bench's
                # isotropic rays where it cuts cluster survival 4x)
                hits = I.intersect_sorted(fn, origin, seg_vec, packed)
            else:
                hits = fn(origin, seg_vec, packed)
        elif use_bvh and bvh_arrays is not None:
            nodes, meta, order = bvh_arrays
            hits = bvh_intersect_closest(
                origin, seg_vec, tris, tri_mesh_id, nodes, meta, order
            )
        elif use_pallas_intersect:
            from ..ops.pallas.intersect import intersect_closest_pallas

            hits = intersect_closest_pallas(origin, seg_vec, tris, tri_mesh_id)
        else:
            hits = intersect_closest(
                origin, seg_vec, tris, tri_mesh_id, chunk=intersect_chunk
            )
        hit = hits["hit"] & state["alive"]

        # sub-surface penetration fuzz: q ~ |N(0, thickness_inside)|
        # (src/scene.cpp:129-139)
        mesh_id_c = jnp.maximum(hits["mesh_id"], 0)
        thick = physics.take_rows(thick_by_mesh[:, None], mesh_id_c)[:, 0]
        q = jnp.abs(draws["q_normal"] * thick)
        inside_point = hits["point"] + q[:, None] * state["dir"]

        dist_mm = distance_in_mm(state["from"], inside_point, spacing)
        intensity_before = state["intensity"]
        intensity_travelled = intensity_before * physics.travel_attenuation(
            att, dist_mm, freq
        )

        hb = physics.hit_boundary(
            None,
            state["dir"],
            hits["point"],
            hits["normal"],
            intensity_travelled,
            state["media_id"],
            state["media_outside_id"],
            hits["mesh_id"],
            materials,
            mesh_in,
            mesh_out,
            mesh_vasc,
            cfg,
            draws=draws,
        )

        miss = state["alive"] & ~hits["hit"]
        segment = {
            "from": state["from"],
            "to": jnp.where(hit[:, None], inside_point, dest),
            "direction": state["dir"],
            "reflected": jnp.where(hit, hb["back_intensity"], 0.0),
            "initial": intensity_before,
            "attenuation": att,
            "distance": state["distance_mm"],
            "media_id": state["media_id"],
            "valid": hit | miss,
        }

        alive_next = hit & (hb["new_intensity"] > eps)
        if cfg.cull_time_window:
            # the continuation's segment would START at
            # t0 = new_distance_mm * 1000 / c  (segment_march_quantities);
            # t0 >= window means none of its echoes can land in the RF grid
            t0_next = (state["distance_mm"] + dist_mm) * 1000.0 / cfg.speed_of_sound
            alive_next = alive_next & (t0_next < float(cfg.max_travel_time_us))
        new_state = {
            "from": jnp.where(hit[:, None], hb["new_from"], state["from"]),
            "dir": jnp.where(hit[:, None], hb["new_direction"], state["dir"]),
            "media_id": jnp.where(hit, hb["new_media_id"], state["media_id"]),
            "media_outside_id": jnp.where(
                hit, hb["new_media_outside_id"], state["media_outside_id"]
            ),
            "intensity": jnp.where(hit, hb["new_intensity"], state["intensity"]),
            "distance_mm": jnp.where(
                hit, state["distance_mm"] + dist_mm, state["distance_mm"]
            ),
            "alive": alive_next,
        }
        return new_state, segment

    _, segments = jax.lax.scan(bounce, state, bounce_draws)
    segments["element"] = jnp.broadcast_to(elem_idx, (cfg.max_depth, n))
    return segments


def segment_march_quantities(segments: dict[str, Array], materials: Array, cfg: SimConfig):
    """Shared derived quantities of the march loop (used by both the jnp
    scatter path and the Pallas kernel packing, keeping their formulas in
    lockstep): steps (float), start time t0 [us], ln attenuation-per-step,
    per-segment material scattering params."""
    axres = cfg.axial_resolution_mm
    # scene::distance ignores spacing (src/scene.cpp:342-346)
    seg_len = safe_norm(segments["to"] - segments["from"]) * 10.0
    steps = jnp.floor(seg_len / axres)
    t0 = segments["distance"] * 1000.0 / cfg.speed_of_sound
    ln_att_step = -segments["attenuation"] * axres * 0.01 * cfg.transducer_frequency
    rows = physics.take_rows(materials, segments["media_id"])
    mu0 = rows[..., physics.MU0]
    mu1 = rows[..., physics.MU1]
    sigma = rows[..., physics.SIGMA]
    return steps, t0, ln_att_step, mu0, mu1, sigma


def march_and_accumulate(
    segments: dict[str, Array],
    materials: Array,
    volume: dict[str, Array],
    cfg: SimConfig,
    n_cols: int | None = None,
) -> Array:
    """Segment marching + echo scatter-add (reference main loop,
    src/main.cpp:106-141) as one masked dense grid."""
    d, n = segments["valid"].shape
    flat = {k: v.reshape((d * n,) + v.shape[2:]) for k, v in segments.items()}

    axres = cfg.axial_resolution_mm
    t_window = float(cfg.max_travel_time_us)
    dt = cfg.march_dt_us
    max_steps = cfg.max_march_steps

    steps_f, t0, ln_att_step, mu0, mu1, sigma = segment_march_quantities(
        flat, materials, cfg
    )
    steps = steps_f.astype(jnp.int32)

    k = jnp.arange(max_steps, dtype=jnp.float32)[None, :]  # (1, K)
    t_k = t0[:, None] + k * dt
    live = (k < steps[:, None]) & (t_k < t_window) & flat["valid"][:, None]

    points = (
        flat["from"][:, None, :]
        + (k * axres)[..., None] * flat["direction"][:, None, :]
    )  # (DN, K, 3)
    # exp(k * ln(step_factor)) instead of pow: same math, cheaper XLA
    # lowering, and formula-identical to the Pallas march kernel
    intens = flat["initial"][:, None] * jnp.exp(ln_att_step[:, None] * k)
    scat = texture.get_scattering(
        volume,
        mu1[:, None] * jnp.ones_like(t_k),
        mu0[:, None] * jnp.ones_like(t_k),
        sigma[:, None] * jnp.ones_like(t_k),
        points,
        cfg,
    )
    values = intens * scat

    cols = jnp.broadcast_to(flat["element"][:, None], t_k.shape)

    # boundary echo at t0 + dt*(steps-1); steps==0 underflows to a dropped
    # row in the reference (unsigned wrap, src/main.cpp:139) -> mask it out.
    s = cfg.samples_per_element
    b_time = t0 + dt * (steps.astype(jnp.float32) - 1.0)
    b_valid = flat["valid"] & (steps >= 1)
    b_vals = flat["reflected"] / s

    all_cols = jnp.concatenate([cols.reshape(-1), flat["element"]])
    all_vals = jnp.concatenate([values.reshape(-1), b_vals])
    all_valid = jnp.concatenate([live.reshape(-1), b_valid])
    all_times = jnp.concatenate([t_k.reshape(-1), b_time])
    if cfg.soft_row_binning:
        # differentiable two-row split: d(RF)/d(time) flows (probe pose AD)
        return imaging.accumulate_echoes_soft(
            all_times, all_cols, all_vals, all_valid, cfg, n_cols
        )
    all_rows = imaging.time_to_row(all_times, cfg)
    return imaging.accumulate_echoes(all_rows, all_cols, all_vals, all_valid, cfg, n_cols)


def render(
    key: Array,
    materials: Array,
    probe_position: Array,
    probe_angles_deg: Array,
    scene: dict[str, Any],
    spacing: Array,
    starting_material: Array,
    volume: dict[str, Array],
    scan_maps: tuple[Array, Array],
    cfg: SimConfig,
    use_pallas_march: bool = False,
    use_fused_postproc: bool = False,
    scan_table: Array | None = None,
    scan_banded: tuple | None = None,  # static (j_windows np, band_k, split)
    **trace_kw,
) -> dict[str, Array]:
    """Full frame: returns bmode (bmode_rows, bmode_cols) plus intermediates."""
    k_trace = jax.random.fold_in(key, 0)
    segments = trace_paths(
        k_trace,
        materials,
        probe_position,
        probe_angles_deg,
        scene,
        spacing,
        starting_material,
        cfg,
        **trace_kw,
    )
    if use_pallas_march and not cfg.soft_row_binning:
        from ..ops.pallas.march import march_and_accumulate_pallas

        rf_raw = march_and_accumulate_pallas(segments, materials, volume, cfg)
    else:
        rf_raw = march_and_accumulate(segments, materials, volume, cfg)
    if use_fused_postproc and cfg.envelope_mode == "reference" and not cfg.centered_psf:
        from ..ops.pallas.postproc import convolve_envelope_pallas

        rf_env = convolve_envelope_pallas(rf_raw, cfg)
        rf_conv = rf_raw  # fused kernel does not materialise the intermediate
    else:
        rf_conv = imaging.convolve_psf(rf_raw, cfg)
        rf_env = imaging.apply_envelope(rf_conv, cfg)
    if cfg.log_compression:
        rf_env = imaging.log_compress(rf_env)
    if scan_table is not None:
        # bf16 MXU rounding can dip epsilon-negative; the envelope image is
        # non-negative by construction, restore that invariant
        if scan_banded is not None:
            from ..ops.pallas.scanconv import scan_convert_banded

            j_w, band_k, band_split = scan_banded
            bmode = jnp.maximum(
                scan_convert_banded(
                    rf_env, scan_table, j_w, cfg.bmode_cols,
                    band_k=band_k, split=band_split,
                    out_rows=cfg.bmode_rows,
                ),
                0.0,
            )
        else:
            from ..ops.pallas.scanconv import scan_convert_pallas

            bmode = jnp.maximum(
                scan_convert_pallas(rf_env, scan_table, cfg.bmode_cols), 0.0
            )
    else:
        bmode = imaging.scan_convert(rf_env, scan_maps[0], scan_maps[1])
    return {
        "bmode": bmode,
        "rf_raw": rf_raw,
        "rf_conv": rf_conv,
        "rf_env": rf_env,
        "segments_valid": segments["valid"],
    }


class Simulator:
    """Convenience wrapper binding a compiled scene + config into jitted
    render / rays-per-second entry points."""

    def __init__(
        self,
        pack,
        cfg: SimConfig,
        *,
        use_bvh: bool = False,
        seed: int = 0,
        use_pallas_march: bool | None = None,
        use_fused_postproc: bool | None = None,
        use_culled_intersect: bool | None = None,
        use_pallas_scanconv: bool | None = None,
        intersect_mode: str | None = None,
        intersect_tile_r: int | None = None,
        sort_packets: bool = False,
    ):
        self.cfg = cfg
        self.pack = pack
        self.use_bvh = use_bvh and pack.bvh is not None
        if use_pallas_march is None:
            # default: the Pallas kernels on real TPUs, the jnp paths
            # elsewhere (CPU tests). All kernels carry custom VJPs (march,
            # fused postproc, MXU scan conversion) or are gradient-transparent
            # (intersect returns the discrete winner; t recomputed in jnp),
            # so the differentiable fit runs on the fast path too. Both
            # texture modes qualify: "table" volumes are materialised from
            # the hash field and carry its seeds, so the kernel's procedural
            # evaluation equals the table gather bit-for-bit (texture.py).
            use_pallas_march = jax.default_backend() == "tpu"
        self.use_pallas_march = use_pallas_march
        # fused conv+envelope kernel: measured 14.3 -> 8.6 ms/frame batched
        # on v5e; default-on wherever the march kernel is on
        if use_fused_postproc is None:
            use_fused_postproc = use_pallas_march
        self.use_fused_postproc = use_fused_postproc
        self.use_pallas_intersect = jax.default_backend() == "tpu" and not self.use_bvh
        # cluster-culled brute force: the default large-scene TPU path.
        # Triangles in SAH-BVH depth-first order, TILE_T-wide clusters with
        # per-tile AABB early-out (BVH-grade pruning, static shapes). The
        # per-ray while_loop BVH does not even compile on the remote-compile
        # TPU backend, so this is the scalable path.
        if use_culled_intersect is None:
            # an explicit use_bvh=True (CLI --bvh) keeps the requested
            # while-loop BVH path instead of being silently replaced
            use_culled_intersect = (
                jax.default_backend() == "tpu"
                and not self.use_bvh
                and pack.n_triangles >= 2048
            )
        self.culled_tris = None
        if use_culled_intersect and pack.n_triangles > 0:
            from ..ops.pallas.intersect import pack_tris_culled

            order = pack.bvh.tri_order if pack.bvh is not None else None
            # list-driven kernel ("listed": per-packet surviving-cluster
            # lists built in jnp, double-buffered cluster DMA, front-to-back
            # tightened-t early-out) is the default at every size — profiler
            # device times r4: sphere trace 0.76 vs 0.90 ms (culled), 200k
            # tris 0.52 vs 5.11 ms. "culled"/"staged" remain as options
            # (staged caps at ~2000 clusters: whole AABB tables in SMEM).
            if intersect_mode is None:
                intersect_mode = "listed"
            if intersect_mode not in ("culled", "staged", "listed", "grouped"):
                raise ValueError(f"unknown intersect_mode {intersect_mode!r}")
            packed = pack_tris_culled(
                pack.tris,
                pack.tri_mesh_id,
                order,
                sort_origin=pack.transducer_position,
                # narrower clusters = tighter AABBs for the listed kernel;
                # measured 10.6 -> 8.2 ms on 200k-tri incoherent rays
                # (scripts/stress_bench.py). culled/staged require 256.
                tile_t=128 if intersect_mode in ("listed", "grouped") else 256,
            )
            self.culled_tris = (packed, intersect_mode)
            self.use_bvh = False
            self.use_pallas_intersect = False
        if intersect_tile_r is None:
            # wider ray packets amortise Mosaic grid-step overhead; measured
            # best at 512 for both the culled (sphere: 5.04 -> 4.86 ms trace)
            # and listed (HD batch8: 5.63 -> 5.32 ms/frame) kernels
            # (scripts/intersect_tile_sweep.py, scripts/hd_batched_probe.py)
            intersect_tile_r = 512 if self.culled_tris is not None else 128
        self.intersect_tile_r = intersect_tile_r
        self.sort_packets = sort_packets
        self.scene = {k: jnp.asarray(v) for k, v in pack.trace_tables().items()}
        self.spacing = jnp.asarray(pack.spacing)
        self.starting_material = jnp.int32(pack.starting_material)
        self.materials = jnp.asarray(pack.materials)
        self.volume = texture.make_texture_volume(jax.random.PRNGKey(seed ^ 0x5CA77E7), cfg)
        maps = imaging.scan_conversion_maps(cfg)
        self.scan_maps = (jnp.asarray(maps[0]), jnp.asarray(maps[1]))
        # MXU scan conversion: turns the ~8 ms XLA gather (the largest
        # pipeline stage on TPU) into one-hot matmuls; default-on with the
        # other Pallas kernels (differentiable via its transpose kernel)
        if use_pallas_scanconv is None:
            use_pallas_scanconv = use_pallas_march
        self.scan_table = None
        self.scan_banded = None
        if use_pallas_scanconv:
            # split/banded table: apex blocks at full contraction, deep
            # blocks over 256-row windows — 107 -> ~69 GFLOP and 0.564 ->
            # 0.386 ms measured (r5; both kernels run at >90% of MXU peak,
            # so fewer formulation FLOPs is the only lever). Degenerate
            # geometries fall out naturally (split == n_blocks -> all-full).
            from ..ops.pallas.scanconv import pack_scan_maps_banded

            tb, j_w, band_k, band_split = pack_scan_maps_banded(
                maps[0], maps[1], cfg.rf_rows, cfg.rf_cols
            )
            self.scan_table = jnp.asarray(tb)
            # j_w stays host numpy (inlined constant); band_k/split static
            self.scan_banded = (j_w, band_k, band_split)
        if self.use_bvh:
            b = pack.bvh
            self.bvh_arrays = (
                jnp.asarray(b.nodes),
                jnp.asarray(b.meta),
                jnp.asarray(b.tri_order),
            )
        else:
            self.bvh_arrays = None

        # ALL device arrays the render needs, threaded through every jit
        # boundary as one pytree ARGUMENT. Never close a jitted function
        # over a live jax.Array (even a scalar): on the tunnelled TPU
        # backend, one execution of such a program permanently switches the
        # whole process to ~3 ms blocking round trips per dispatch (measured
        # round 4 — the previously "tunnel-bound" 8.6 ms single-frame
        # latency was mostly this). Static Python values (flags, mode
        # strings, cfg) stay in the closure; numpy constants inline into
        # the HLO at trace time, which is also fine.
        self._state = {
            "scene": self.scene,
            "spacing": self.spacing,
            "starting_material": self.starting_material,
            "volume": self.volume,
            "scan_maps": self.scan_maps,
            "scan_table": self.scan_table,
            "packed": self.culled_tris[0] if self.culled_tris else None,
            "bvh_arrays": self.bvh_arrays,
        }
        intersect_mode_static = self.culled_tris[1] if self.culled_tris else None

        def _render_impl(key, materials, pos, ang, state):
            culled = (
                (state["packed"], intersect_mode_static)
                if state["packed"] is not None
                else None
            )
            return render(
                key,
                materials,
                pos,
                ang,
                state["scene"],
                state["spacing"],
                state["starting_material"],
                state["volume"],
                state["scan_maps"],
                cfg,
                use_pallas_march=self.use_pallas_march,
                use_fused_postproc=self.use_fused_postproc,
                scan_table=state["scan_table"],
                scan_banded=self.scan_banded,
                use_bvh=self.use_bvh,
                bvh_arrays=state["bvh_arrays"],
                use_pallas_intersect=self.use_pallas_intersect,
                culled_tris=culled,
                intersect_tile_r=self.intersect_tile_r,
                sort_packets=self.sort_packets,
            )

        _render_jit = jax.jit(_render_impl)

        def _render(key, materials, pos, ang, self_cfg_hash=None):
            del self_cfg_hash  # kept for call-site compatibility
            return _render_jit(key, materials, pos, ang, self._state)

        self._render = _render
        self._render_impl = _render_impl  # closure-free; for nested jits

        @jax.jit
        def _render_batch(keys, materials, pos, ang, state):
            return jax.vmap(
                lambda k: _render_impl(k, materials, pos, ang, state)["bmode"]
            )(keys)

        self._render_batch = lambda keys, m, p, a: _render_batch(
            keys, m, p, a, self._state
        )

        # latency path: only a seed scalar is host-materialised per frame;
        # pose/materials stay device-resident and ride the argument pytree
        _pos0 = jnp.asarray(pack.transducer_position)
        _ang0 = jnp.asarray(pack.transducer_angles)
        _mat0 = self.materials

        @jax.jit
        def _render_seeded_jit(seed, materials, pos, ang, state):
            key = jax.random.PRNGKey(seed)
            return _render_impl(key, materials, pos, ang, state)

        self._render_seeded = lambda seed: _render_seeded_jit(
            seed, _mat0, _pos0, _ang0, self._state
        )

    def make_chained_batch(self, batch: int, n_chain: int):
        """Build a jitted ``fn(seed0) -> (B, H, W)`` that renders
        ``n_chain * batch`` frames in ONE device call: a ``lax.scan`` over
        vmapped frame renders, with each step's keys derived from a
        data-dependent carry so XLA can neither elide nor reorder steps.

        Benchmarks use this to measure device throughput with host->device
        dispatch amortised to nothing — through the tunnelled TPU a single
        dispatch costs ~2-30 ms, which at ~5 ms/frame otherwise dominates
        the measurement (scripts/stage_profile.py shows the same effect).
        """
        render_impl = self._render_impl
        mat = self.materials
        pos = jnp.asarray(self.pack.transducer_position)
        ang = jnp.asarray(self.pack.transducer_angles)
        state = self._state

        @jax.jit
        def run(seed0, mat, pos, ang, state):
            key = jax.random.PRNGKey(seed0)

            def step(carry, i):
                ids = carry + i * batch + jnp.arange(batch, dtype=jnp.uint32)
                keys = jax.vmap(jax.random.fold_in, (None, 0))(key, ids)
                bm = jax.vmap(
                    lambda k: render_impl(k, mat, pos, ang, state)["bmode"]
                )(keys)
                # fold an (always-zero but data-dependent) term into the
                # next step's key ids: a true serial dependence chain
                dep = (jnp.abs(bm[0, 0, 0]) * 1e-30).astype(jnp.uint32)
                return carry + dep, bm

            _, frames = jax.lax.scan(
                step, jnp.uint32(0), jnp.arange(n_chain, dtype=jnp.uint32)
            )
            return frames[-1]

        return lambda seed0: run(seed0, mat, pos, ang, state)

    def render_batch(self, seeds, materials=None, position=None, angles=None):
        """Render many MC frames in ONE device call (vmap over seeds) —
        amortises per-call dispatch and pipelines the kernels; the throughput
        mode for sweeps, MC averaging and serving. Returns (B, H, W)."""
        keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        return self._render_batch(
            keys,
            self.materials if materials is None else materials,
            jnp.asarray(self.pack.transducer_position if position is None else position),
            jnp.asarray(self.pack.transducer_angles if angles is None else angles),
        )

    def render_compound(self, seeds, **kw):
        """Variance-reduced B-mode: average of independent Monte-Carlo frames
        (speckle compounding). One device call via render_batch."""
        return self.render_batch(seeds, **kw).mean(axis=0)

    def render_frame(self, seed: int = 0, materials=None, position=None, angles=None):
        """Single-frame render. The hot path (no per-call overrides) ships ONE
        int32 scalar to the device — the key is derived inside the jit and the
        pose/materials live device-resident — so per-frame latency is device
        time plus one tiny transfer, not four host->device conversions."""
        if materials is None and position is None and angles is None:
            return self._render_seeded(jnp.int32(seed))
        key = jax.random.PRNGKey(seed)
        return self._render(
            key,
            self.materials if materials is None else materials,
            jnp.asarray(self.pack.transducer_position if position is None else position),
            jnp.asarray(self.pack.transducer_angles if angles is None else angles),
            hash(self.cfg),
        )

    @property
    def rays_per_frame(self) -> int:
        """Traced path-bounce queries per frame (the reference's rayTest
        count upper bound, src/scene.cpp:75-117)."""
        return (
            self.cfg.transducer_elements
            * self.cfg.samples_per_element
            * self.cfg.max_depth
        )
