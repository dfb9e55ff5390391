"""Benchmark harness — prints ONE JSON line for the driver.

Metric: traced ray-casts per second per chip on the full-size sphere scene
(512 scanlines x 5 MC paths x 10 bounce queries/frame, the reference's
rayTest workload upper bound, reference src/scene.cpp:75-117).

Baseline: the reference publishes no numbers (BASELINE.md) and its C++ cannot
be built in this image (Bullet/OpenCV dev libs absent), so vs_baseline is
computed against a MEASURED single-threaded C++ re-implementation of the
reference's full frame algorithm on this host (native/ref_baseline.cpp,
driven by scripts/ref_baseline_bench.py — same scene, probe layout, PSF and
scan maps; BVH built once at init like the reference; see BASELINE.md
"measured baselines" for methodology).

Two timing domains are reported (see mcray_tpu/utils/benchmarking.py for
the tunnel measurement traps):
- headline value: DEVICE throughput — jax.profiler TPU-module time of the
  128-frame chained-batch program divided by its frame count. This is what
  the chip spends and what directly-attached production hardware would
  deliver; it is immune to the tunnel's flat per-dispatch penalty, its
  identical-dispatch memoization, AND its unreliable async-queue blocking
  (block-only-on-last under-reports by orders of magnitude — measured r4).
- extras: wall-clock with per-call blocking (frame_ms_wall_batched,
  single_frame_ms — the tunnelled dev-loop reality) and per-stage device
  times + roofline utilisation.
"""

from __future__ import annotations

import json
import sys
import time

# Measured single-thread C++ reference-algorithm baseline on this host
# (scripts/ref_baseline_bench.py --frames 5): sphere 512x5x10 @ 30.4 ms/frame.
CPP_BASELINE_RAYS_PER_S = 842_794.0
CPP_BASELINE_HD_RAYS_PER_S = 580_027.0
# round-1 Python-on-2-core proxy, kept for continuity
CPU_PROXY_RAYS_PER_S = 28_700.0


def main() -> int:
    import jax

    from mcray_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    from mcray_tpu.config import SimConfig
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.scene.compile import load_and_compile
    from mcray_tpu.utils.benchmarking import profile_device

    cfg = SimConfig()
    pack = load_and_compile("assets/sphere/sphere.scene", cfg)
    sim = Simulator(pack, cfg)

    # warmup/compile the single-frame path
    out = sim.render_frame(seed=0)
    out["bmode"].block_until_ready()

    # single-frame WALL latency of the serve loop: render + FETCH the image
    # to the host, which is what serving actually does. device_get is the
    # only reliable completion barrier on this backend — block_until_ready
    # returns early even with per-call blocking (measured r4, trap #3 writ
    # large); first rep discarded.
    import numpy as np

    singles = []
    for i in range(5):
        t0 = time.perf_counter()
        out = sim.render_frame(seed=i + 1)
        np.asarray(out["bmode"])
        singles.append(time.perf_counter() - t0)
    dt_single = min(singles[1:])

    # batched throughput: lax.scan-chained vmapped renders, n_chain * batch
    # frames per device call. The HEADLINE is the profiler DEVICE time of
    # that program (what the chip spends; immune to every tunnel artifact);
    # the wall-clock per-frame time with per-call blocking is in extras.
    batch, n_chain = 8, 16
    chained = sim.make_chained_batch(batch, n_chain)
    chained(0).block_until_ready()  # compile + warm
    prof_b = profile_device(chained, lambda i: (i + 10,), n=3)
    dt = prof_b["per_call_ms"] / 1e3 / (n_chain * batch)

    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(i + 100)[0, 0, :8])  # fetch = reliable barrier
        walls.append(time.perf_counter() - t0)
    dt_wall = min(walls[1:]) / (n_chain * batch)

    rays_per_s = sim.rays_per_frame / dt
    rays_per_s_wall = sim.rays_per_frame / dt_wall

    extra_dev = {
        "frame_ms_wall_batched": round(dt_wall * 1e3, 3),
        # Methodology disclosure (advisor r4): the headline divides TPU
        # DEVICE time while CPP_BASELINE is host WALL-clock of the C++
        # reference algorithm — device-vs-wall. The wall-vs-wall ratio
        # (tunnelled dispatch overhead included on our side) is kept
        # alongside for round-over-round comparability.
        "headline_basis": "TPU device time vs C++ host wall-clock",
        "vs_baseline_wall_vs_wall": round(
            rays_per_s_wall / CPP_BASELINE_RAYS_PER_S, 2
        ),
    }
    try:
        prof = profile_device(
            sim._render_seeded, lambda i: (i + 100,), n=4
        )
        extra_dev["single_frame_device_ms"] = round(prof["per_call_ms"], 3)
    except Exception as e:  # profiling must never kill the bench line
        extra_dev["single_frame_device_ms_error"] = str(e)[:120]

    # large-scene row: the shipped ~123k-triangle anatomical HD phantom
    # (assets/ircad11_hd) through the list-driven intersect kernel
    hd_extra = {}
    try:
        pack_hd = load_and_compile("assets/ircad11_hd/santi-liver-hd.scene", cfg)
        sim_hd = Simulator(pack_hd, cfg)
        chained_hd = sim_hd.make_chained_batch(batch, 8)
        chained_hd(0).block_until_ready()
        prof_hd_b = profile_device(chained_hd, lambda i: (i + 10,), n=3)
        dt_hd = prof_hd_b["per_call_ms"] / 1e3 / (8 * batch)
        hd_extra = {
            "ircad_hd_triangles": pack_hd.n_triangles,
            "ircad_hd_rays_per_s": round(sim_hd.rays_per_frame / dt_hd),
            "ircad_hd_frame_ms": round(dt_hd * 1e3, 2),
            "ircad_hd_vs_cpp_baseline": round(
                sim_hd.rays_per_frame / dt_hd / CPP_BASELINE_HD_RAYS_PER_S, 2
            ),
        }
        try:
            prof_hd = profile_device(
                sim_hd._render_seeded, lambda i: (i + 100,), n=4
            )
            hd_extra["ircad_hd_frame_device_ms"] = round(
                prof_hd["per_call_ms"], 3
            )
        except Exception:
            pass
    except Exception as e:  # bench must still emit its line
        hd_extra = {"ircad_hd_error": str(e)[:200]}

    # roofline / utilisation accounting (BASELINE.md "Roofline" section)
    roof_extra = {}
    try:
        import os

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
        )
        from roofline import stage_table

        s = stage_table("assets/sphere/sphere.scene", reps=3)
        roof_extra = {
            "sphere_frame_device_ms": s["full_frame_ms"],
            "frame_gflops": s["frame_gflops"],
            "frame_roofline_ms": s["frame_roofline_ms"],
            "frame_pct_of_roofline": s["frame_pct_of_roofline"],
            "stage_device_ms": {
                r["stage"]: r["ms"] for r in s["stages"]
            },
            "stage_pct_peak": {
                r["stage"]: r["pct_peak_compute"] for r in s["stages"]
            },
            "stage_bound": {r["stage"]: r["bound"] for r in s["stages"]},
        }
    except Exception as e:
        roof_extra = {"roofline_error": str(e)[:200]}

    result = {
        "metric": "rays_per_s_per_chip_sphere",
        "value": round(rays_per_s),
        "unit": "ray-casts/s",
        "vs_baseline": round(rays_per_s / CPP_BASELINE_RAYS_PER_S, 2),
        "extra": {
            "frames_per_s": round(1.0 / dt, 3),
            "frame_ms": round(dt * 1e3, 2),
            "single_frame_ms": round(dt_single * 1e3, 2),
            "batch": batch,
            "n_chain": n_chain,
            "device": str(jax.devices()[0]),
            "elements": cfg.transducer_elements,
            "samples": cfg.samples_per_element,
            "baseline": "single-thread C++ reference algorithm on this host "
            "(native/ref_baseline.cpp, BASELINE.md)",
            "vs_python_proxy_r1": round(rays_per_s / CPU_PROXY_RAYS_PER_S, 2),
            **extra_dev,
            **hd_extra,
            **roof_extra,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
