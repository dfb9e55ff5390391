"""Sustained `cli serve` throughput through the tunnelled dev TPU.

VERDICT r4 item 8: the interactive product shape (reference
src/main.cpp:92 + src/inputmanager.cpp — move probe, re-render) is now
device-fast; this measures what the serve stream actually sustains on this
dev setup: spawn `python -m mcray_tpu.cli serve`, pipe a burst of
move-probe requests up front (so JAX async dispatch pipelines device work
against host PNG writes + tunnel fetches), and time the response stream.

    python scripts/serve_bench.py [--frames 64] [--elements 512]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--scene", default="assets/sphere/sphere.scene")
    ap.add_argument("--elements", type=int, default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = tempfile.mkdtemp(prefix="serve_bench_")
    cmd = [sys.executable, "-m", "mcray_tpu.cli", "serve", args.scene,
           "--out-prefix", os.path.join(outdir, "f")]
    if args.elements:
        cmd += ["--elements", str(args.elements)]
    proc = subprocess.Popen(
        cmd, cwd=root, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        text=True, bufsize=1,
    )
    # wait for ready (includes first-frame compile)
    while True:
        line = proc.stdout.readline()
        if not line:
            raise SystemExit("serve exited before ready")
        msg = json.loads(line)
        if msg.get("ready"):
            break

    # burst all requests up front: the serve loop dispatches request i+1
    # while frame i drains (its stated pipelining contract)
    reqs = []
    for i in range(args.frames):
        reqs.append(json.dumps({
            "position": [-17.5 + 0.01 * i, 1.0, 5.0] if "liver" in args.scene
            else [0.0, 0.005 * i, -11.0],
            "seed": i,
        }))
    t_send = time.perf_counter()
    proc.stdin.write("\n".join(reqs) + "\n")
    proc.stdin.close()

    times = []
    ms = []
    for _ in range(args.frames):
        msg = json.loads(proc.stdout.readline())
        times.append(time.perf_counter())
        ms.append(msg["ms"])
    proc.wait(timeout=60)

    span = times[-1] - times[0]
    sustained = (args.frames - 1) / span if span > 0 else float("nan")
    first_latency = times[0] - t_send
    result = {
        "metric": "serve_sustained_fps",
        "frames": args.frames,
        "sustained_fps": round(sustained, 2),
        "ms_per_frame_sustained": round(1e3 * span / (args.frames - 1), 2),
        "first_frame_latency_ms": round(first_latency * 1e3, 1),
        "per_frame_reported_ms_median": sorted(ms)[len(ms) // 2],
        "scene": args.scene,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
