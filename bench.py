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
"measured baselines" for methodology). This replaces round 1's Python proxy.
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

    cfg = SimConfig()
    pack = load_and_compile("assets/sphere/sphere.scene", cfg)
    sim = Simulator(pack, cfg)

    # warmup/compile
    out = sim.render_frame(seed=0)
    out["bmode"].block_until_ready()

    frames = 5
    t0 = time.perf_counter()
    for i in range(frames):
        out = sim.render_frame(seed=i + 1)
    out["bmode"].block_until_ready()
    dt_single = (time.perf_counter() - t0) / frames

    # batched throughput: lax.scan-chained vmapped renders — n_chain * batch
    # frames per device call, so the ~2-30 ms tunnelled-dispatch latency is
    # amortised away and the number measures DEVICE throughput
    batch, n_chain = 8, 4
    chained = sim.make_chained_batch(batch, n_chain)
    chained(0).block_until_ready()  # compile + warm
    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        b = chained(i + 1)
    b.block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * n_chain * batch)

    rays_per_s = sim.rays_per_frame / dt

    # large-scene row: the shipped ~123k-triangle anatomical HD phantom
    # (assets/ircad11_hd, VERDICT r1 item 4) through the list-driven
    # intersect kernel (per-packet surviving-cluster lists)
    hd_extra = {}
    try:
        pack_hd = load_and_compile("assets/ircad11_hd/santi-liver-hd.scene", cfg)
        sim_hd = Simulator(pack_hd, cfg)
        chained_hd = sim_hd.make_chained_batch(batch, 2)
        chained_hd(0).block_until_ready()
        t0 = time.perf_counter()
        for i in range(2):
            b = chained_hd(i + 1)
        b.block_until_ready()
        dt_hd = (time.perf_counter() - t0) / (2 * 2 * batch)
        hd_extra = {
            "ircad_hd_triangles": pack_hd.n_triangles,
            "ircad_hd_rays_per_s": round(sim_hd.rays_per_frame / dt_hd),
            "ircad_hd_frame_ms": round(dt_hd * 1e3, 2),
            "ircad_hd_vs_cpp_baseline": round(
                sim_hd.rays_per_frame / dt_hd / CPP_BASELINE_HD_RAYS_PER_S, 2
            ),
        }
    except Exception as e:  # bench must still emit its line
        hd_extra = {"ircad_hd_error": str(e)[:200]}

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
            "device": str(jax.devices()[0]),
            "elements": cfg.transducer_elements,
            "samples": cfg.samples_per_element,
            "baseline": "single-thread C++ reference algorithm on this host "
            "(native/ref_baseline.cpp, BASELINE.md)",
            "vs_python_proxy_r1": round(rays_per_s / CPU_PROXY_RAYS_PER_S, 2),
            **hd_extra,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
