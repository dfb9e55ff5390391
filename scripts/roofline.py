"""Per-stage roofline: measured device time vs analytic FLOPs/HBM bytes.

Prints a markdown table + one JSON line with per-stage effective TFLOP/s,
GB/s and %-of-v5e-peak (VERDICT r3 item 1). Workload counts (cluster
survival per bounce, touched march tiles) are extracted from the actual
rendered frame, not nominal bounds. Measurement protocol per
mcray_tpu/utils/benchmarking.py (varied inputs, state-as-arguments,
first-rep discard).

    python scripts/roofline.py [--scene assets/sphere/sphere.scene] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_table(scene_path: str, inner: int = 16, reps: int = 4) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcray_tpu.config import SimConfig
    from mcray_tpu.models import simulator as S
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.ops import physics
    from mcray_tpu.ops.pallas.intersect import _packet_cluster_lists
    from mcray_tpu.ops.pallas.march import (
        TILE_C,
        TILE_ROWS,
        _touch_tables,
        pack_segments,
    )
    from mcray_tpu.scene.compile import load_and_compile
    from mcray_tpu.utils import roofline as R

    cfg = SimConfig()
    pack = load_and_compile(scene_path, cfg)
    sim = Simulator(pack, cfg)
    state = sim._state
    mats = sim.materials
    pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)
    key = jax.random.PRNGKey(0)
    tile_r = sim.intersect_tile_r
    mode = sim.culled_tris[1] if sim.culled_tris else None
    packed = sim.culled_tris[0] if sim.culled_tris else None

    # ---- stage callables (device state as ARGUMENTS; cfg/flags static) ----
    def trace_fn(key, materials, pos, ang, state):
        culled = (state["packed"], mode) if state["packed"] is not None else None
        return S.trace_paths(
            key, materials, pos, ang, state["scene"], state["spacing"],
            state["starting_material"], cfg,
            use_bvh=False, bvh_arrays=None,
            use_pallas_intersect=sim.use_pallas_intersect,
            culled_tris=culled, intersect_tile_r=tile_r,
            sort_packets=sim.sort_packets,
        )

    segments = jax.jit(trace_fn)(key, mats, pos, ang, state)
    segments = jax.block_until_ready(segments)

    if sim.use_pallas_march:
        from mcray_tpu.ops.pallas.march import march_and_accumulate_pallas

        def march_fn(segments, materials, state):
            return march_and_accumulate_pallas(
                segments, materials, state["volume"], cfg
            )
    else:
        def march_fn(segments, materials, state):
            return S.march_and_accumulate(segments, materials, state["volume"], cfg)

    rf_raw = jax.block_until_ready(jax.jit(march_fn)(segments, mats, state))

    if sim.use_fused_postproc:
        from mcray_tpu.ops.pallas.postproc import convolve_envelope_pallas

        def post_fn(rf):
            return convolve_envelope_pallas(rf, cfg)
    else:
        from mcray_tpu.ops import imaging

        def post_fn(rf):
            return imaging.apply_envelope(imaging.convolve_psf(rf, cfg), cfg)

    rf_env = jax.block_until_ready(jax.jit(post_fn)(rf_raw))

    if sim.scan_table is not None and sim.scan_banded is not None:
        from mcray_tpu.ops.pallas.scanconv import scan_convert_banded

        j_w, band_k, band_split = sim.scan_banded

        def scan_fn(rf, table):
            return scan_convert_banded(
                rf, table, j_w, cfg.bmode_cols, band_k=band_k,
                split=band_split, out_rows=cfg.bmode_rows,
            )
    elif sim.scan_table is not None:
        from mcray_tpu.ops.pallas.scanconv import scan_convert_pallas

        def scan_fn(rf, table):
            return scan_convert_pallas(rf, table, cfg.bmode_cols)
    else:
        from mcray_tpu.ops import imaging

        def scan_fn(rf, table):
            return imaging.scan_convert(rf, *state["scan_maps"])

    def full_fn(key, materials, pos, ang, state):
        return sim._render_impl(key, materials, pos, ang, state)["bmode"]

    # ---- workload counts from the rendered frame --------------------------
    bounce_counts = []
    n = segments["valid"].shape[1]
    if packed is not None:
        n_pad = (-n) % tile_r
        spacing = jnp.asarray(pack.spacing)
        for d in range(cfg.max_depth):
            frm = segments["from"][d]
            dire = segments["direction"][d]
            valid = segments["valid"][d]
            att = segments["attenuation"][d]
            inten = segments["initial"][d]
            r_len = physics.max_ray_length(
                jnp.maximum(inten, cfg.intensity_epsilon * 1e-3),
                att, cfg.transducer_frequency, cfg.intensity_epsilon,
            )
            origin = frm + cfg.ray_start_offset * dire
            dest = frm + (r_len[:, None] / 100.0) * spacing * dire
            seg_vec = (dest - origin) * valid[:, None]
            origin = jnp.where(valid[:, None], origin, 1e9)
            if n_pad:
                origin = jnp.pad(origin, ((0, n_pad), (0, 0)), constant_values=1e9)
                seg_vec = jnp.pad(seg_vec, ((0, n_pad), (0, 0)))
            counts, _, _ = _packet_cluster_lists(origin, seg_vec, packed, tile_r=tile_r)
            live_pk = int(jnp.sum(jnp.any(
                jnp.sum(jnp.abs(seg_vec), 1).reshape(-1, tile_r) > 0, axis=1)))
            bounce_counts.append((int(counts.sum()), live_pk))
        tile_t = packed.tile_t
        n_clusters = packed.n_clusters
    else:
        # brute kernel: every (packet, triangle-tile) pair does MT
        from mcray_tpu.ops.pallas.intersect import TILE_T

        n_tiles = -(-pack.n_triangles // TILE_T)
        packets = -(-n // tile_r)
        bounce_counts = [(packets * n_tiles, packets)] * cfg.max_depth
        tile_t, n_clusters = TILE_T, n_tiles

    soa = jax.jit(lambda s, m: pack_segments(s, m, cfg, cfg.rf_cols))(segments, mats)
    n_rows_fwd = ((cfg.rf_rows + TILE_ROWS - 1) // TILE_ROWS) * TILE_ROWS
    counts_m, _ = jax.jit(lambda s: _touch_tables(s, cfg, n_rows_fwd))(soa)
    touched = int(jnp.sum(counts_m))

    # the production trace path runs the exact (P,R,C) prepass
    # (trace_paths passes no list_method); brute has none (advisor r4)
    n_supers = packed.aabb_super.shape[0] if packed is not None else 0
    costs = {
        "intersect": R.intersect_cost(
            cfg, bounce_counts, tile_r, tile_t, n + (-n) % tile_r,
            n_clusters, mode or "brute",
            list_method="exact" if packed is not None else "brute",
            n_supers=n_supers),
        "march": R.march_cost(
            cfg, touched, TILE_ROWS, TILE_C, int(np.prod(soa.shape)) * 4,
            cfg.rf_cols),
        "postproc": R.postproc_cost(cfg),
        "scan_convert": R.scanconv_cost(
            cfg,
            banded=(
                (sim.scan_banded[1],
                 min(sim.scan_banded[2] * 8, cfg.bmode_rows))
                if sim.scan_banded is not None else None
            ),
        ),
    }

    # ---- measured DEVICE times (profiler; tunnel-immune) ------------------
    from mcray_tpu.utils.benchmarking import profile_device

    nprof = max(3, reps)
    times = {}
    times["trace"] = profile_device(
        jax.jit(trace_fn),
        lambda i: (jax.random.fold_in(key, i + 1), mats, pos, ang, state),
        n=nprof)
    times["march"] = profile_device(
        jax.jit(march_fn),
        lambda i: ({**segments, "initial": segments["initial"] + i * 1e-9},
                   mats, state),
        n=nprof)
    times["postproc"] = profile_device(
        jax.jit(post_fn), lambda i: (rf_raw + i * 1e-9,), n=nprof)
    scan_tab = state["scan_table"] if sim.scan_table is not None else jnp.zeros(1)
    times["scan_convert"] = profile_device(
        jax.jit(scan_fn), lambda i: (rf_env + i * 1e-9, scan_tab), n=nprof)
    times["full_frame"] = profile_device(
        jax.jit(full_fn),
        lambda i: (jax.random.fold_in(key, 1000 + i), mats, pos, ang, state),
        n=nprof)
    for t in times.values():
        t["best"] = t["per_call_ms"] / 1e3  # seconds, summarize() contract

    rows = []
    stage_of_time = {"trace": "intersect", "march": "march",
                     "postproc": "postproc", "scan_convert": "scan_convert"}
    for tname, cname in stage_of_time.items():
        rows.append(costs[cname].summarize(times[tname]["best"]))
    total_flops = sum(c.flops for c in costs.values())
    total_bytes = sum(c.hbm_bytes for c in costs.values())
    full_s = times["full_frame"]["best"]
    # achievable floor: each stage at its own unit's peak (MXU flops must
    # not be compared against the VPU ceiling)
    roofline_s = sum(r["roofline_ms"] for r in rows) / 1e3
    summary = {
        "scene": scene_path,
        "triangles": pack.n_triangles,
        "intersect_mode": mode or "brute",
        "stages": rows,
        "full_frame_ms": round(full_s * 1e3, 3),
        "sum_stage_ms": round(sum(times[t]["best"] for t in stage_of_time) * 1e3, 3),
        "frame_gflops": round(total_flops / 1e9, 2),
        "frame_hbm_mb": round(total_bytes / 1e6, 2),
        "frame_roofline_ms": round(roofline_s * 1e3, 3),
        "frame_pct_of_roofline": round(100 * roofline_s / full_s, 1),
        "frame_effective_gbps": round(total_bytes / full_s / 1e9, 2),
    }
    return summary


def to_markdown(s: dict) -> str:
    lines = [
        f"Scene `{s['scene']}` ({s['triangles']} tris, intersect={s['intersect_mode']}):",
        "",
        "| stage | ms | GFLOP | HBM MB | eff TFLOP/s | % peak | eff GB/s | % HBM | bound | roofline ms |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in s["stages"]:
        lines.append(
            f"| {r['stage']} ({r['unit']}) | {r['ms']} | {r['gflops']} | {r['hbm_mb']} "
            f"| {r['effective_tflops']} | {r['pct_peak_compute']}% "
            f"| {r['effective_gbps']} | {r['pct_peak_hbm']}% | {r['bound']} "
            f"| {r['roofline_ms']} |"
        )
    lines.append(
        f"\nFull frame {s['full_frame_ms']} ms (stage sum {s['sum_stage_ms']} ms); "
        f"{s['frame_gflops']} GFLOP/frame; per-stage roofline floor "
        f"{s['frame_roofline_ms']} ms -> frame runs at "
        f"{s['frame_pct_of_roofline']}% of its roofline; "
        f"{s['frame_effective_gbps']} GB/s HBM."
    )
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="assets/sphere/sphere.scene")
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()
    s = stage_table(args.scene, inner=args.inner, reps=args.reps)
    print(to_markdown(s))
    print(json.dumps(s))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(s, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
