"""Multi-chip scaling model: per-collective byte accounting + ICI/DCN time
projection, next to a structure-only weak-scaling run on the virtual CPU
mesh (VERDICT r3 item 6).

The sharded design (mcray_tpu/parallel/shard.py) has exactly four
communication events per frame/step; everything else is chip-local:

  frame (distributed imaging):
    1. lateral-conv halo  : ppermute of (rf_rows, l-1) f32 to the left
                            neighbour  — one hop over ICI
    2. RF assembly        : tiled all_gather of (rf_rows, C/n) f32 partials
  train step adds:
    3. gradient psum      : (M, 8) f32 material-gradient partials
                            (+ the all_gather's AD transpose, a
                            reduce_scatter of the same RF bytes)
  2-D mesh adds:
    4. sample-axis psum   : (rf_rows, C/n_r) f32 partial RF images

Link-rate assumptions (stated, not vendor-blessed — edit here to re-project):
  ICI: v5e 2-D torus, ~45 GB/s per link per direction (~180 GB/s aggregate
       per chip); ring all_gather of B bytes costs (n-1)/n * B at one
       link's egress rate + ~3 us/hop latency.
  DCN: 2 hosts x 100 Gbps NIC ~= 12.5 GB/s per host; cross-host collectives
       ride DCN for the inter-host edge only (jax.distributed default).

    python scripts/multichip_model.py [--chips 2 4 8 16] [--compute-ms 3.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_LINK_GBPS = 45e9      # bytes/s per direction per link
ICI_HOP_LAT_S = 3e-6
DCN_HOST_GBPS = 12.5e9    # bytes/s per host NIC
DCN_LAT_S = 10e-6


def frame_comm_model(cfg, n_chips: int, train: bool = False,
                     hosts: int = 1) -> dict:
    """Bytes and projected seconds of communication for one frame/step."""
    rf_bytes = cfg.rf_rows * cfg.rf_cols * 4
    halo_bytes = cfg.rf_rows * (cfg.psf_lateral_size - 1) * 4
    grad_bytes = 11 * 8 * 4  # (M, 8) material table (11 mats in the scenes)

    # ring all_gather: every chip sends its partial around; egress-bound
    ag_s = (n_chips - 1) / n_chips * rf_bytes / ICI_LINK_GBPS \
        + (n_chips - 1) * ICI_HOP_LAT_S
    halo_s = halo_bytes / ICI_LINK_GBPS + ICI_HOP_LAT_S
    total_bytes = halo_bytes + rf_bytes * (n_chips - 1) // n_chips
    total_s = ag_s + halo_s
    if train:
        # reduce_scatter transpose of the all_gather (same bytes) + psum of
        # the tiny gradient (latency-bound)
        total_bytes += rf_bytes * (n_chips - 1) // n_chips + grad_bytes
        total_s += ag_s + 2 * (n_chips - 1) * ICI_HOP_LAT_S
    if hosts > 1:
        # the inter-host edge of each collective crosses DCN once per
        # direction: the ring's cross-host segment carries the full payload
        cross = rf_bytes * (2 if train else 1) / hosts
        total_s += cross / DCN_HOST_GBPS + 2 * DCN_LAT_S
    return {"bytes": int(total_bytes), "seconds": total_s}


def project(cfg, compute_ms_1chip: float, chips: list, train: bool,
            hosts_for: dict | None = None) -> list:
    rows = []
    for n in chips:
        hosts = (hosts_for or {}).get(n, 1)
        comm = frame_comm_model(cfg, n, train=train, hosts=hosts)
        t_compute = compute_ms_1chip / n
        t_total = t_compute + comm["seconds"] * 1e3
        rows.append({
            "chips": n,
            "hosts": hosts,
            "compute_ms": round(t_compute, 4),
            "comm_ms": round(comm["seconds"] * 1e3, 4),
            "comm_kb": round(comm["bytes"] / 1024, 1),
            "total_ms": round(t_total, 4),
            "efficiency_pct": round(100 * compute_ms_1chip / n / t_total, 1),
        })
    return rows


def weak_scaling_cpu(cfg_small, n_list) -> list:
    """Structure-only weak scaling on the virtual CPU mesh: fixed PER-CHIP
    work (elements = 16 * n), so perfect scaling = flat time. CPU 'chips'
    share two real cores, so absolute numbers mean nothing — this validates
    the sharded program structure (no hidden serialisation / replicated
    compute growth), not TPU performance."""
    import time

    import jax

    from mcray_tpu.config import small_test_config
    from mcray_tpu.parallel.shard import ShardedRenderer, make_mesh
    from mcray_tpu.scene.compile import load_and_compile

    root = os.path.join(os.path.dirname(__file__), "..")
    rows = []
    for n in n_list:
        cfg = small_test_config(transducer_elements=16 * n, samples_per_element=2)
        pack = load_and_compile(
            os.path.join(root, "assets", "sphere", "sphere.scene"), cfg
        )
        mesh = make_mesh(n)
        r = ShardedRenderer(pack, cfg, mesh=mesh)
        out = r.render_frame(0)
        jax.block_until_ready(out["bmode"])
        t0 = time.perf_counter()
        for i in range(3):
            out = r.render_frame(i + 1)
        jax.block_until_ready(out["bmode"])
        dt = (time.perf_counter() - t0) / 3
        rows.append({"chips": n, "elements": 16 * n, "ms_per_frame": round(dt * 1e3, 1)})
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--compute-ms", type=float, default=3.5,
                    help="measured single-chip device ms/frame (bench extras)")
    ap.add_argument("--train-ms", type=float, default=65.9,
                    help="measured single-chip ms/train-step (BASELINE.md fit table)")
    ap.add_argument("--weak-scaling", action="store_true",
                    help="also run the CPU virtual-mesh weak-scaling check")
    args = ap.parse_args()

    from mcray_tpu.config import SimConfig

    cfg = SimConfig()
    print("=== render frame (distributed imaging) ===")
    rows_f = project(cfg, args.compute_ms, args.chips, train=False,
                     hosts_for={16: 2})
    for r in rows_f:
        print(f"  {r['chips']:3d} chips ({r['hosts']} host): compute {r['compute_ms']:.3f} ms "
              f"+ comm {r['comm_ms']:.3f} ms ({r['comm_kb']} KB) "
              f"-> {r['total_ms']:.3f} ms, efficiency {r['efficiency_pct']}%")
    print("=== train step (adds grad psum + all_gather transpose) ===")
    rows_t = project(cfg, args.train_ms, args.chips, train=True,
                     hosts_for={16: 2})
    for r in rows_t:
        print(f"  {r['chips']:3d} chips ({r['hosts']} host): compute {r['compute_ms']:.3f} ms "
              f"+ comm {r['comm_ms']:.3f} ms ({r['comm_kb']} KB) "
              f"-> {r['total_ms']:.3f} ms, efficiency {r['efficiency_pct']}%")
    out = {"frame": rows_f, "train": rows_t}
    if args.weak_scaling:
        print("=== weak scaling, virtual CPU mesh (structure-only) ===")
        ws = weak_scaling_cpu(None, [1, 2, 4, 8])
        for r in ws:
            print(f"  {r['chips']} chips x 16 elements: {r['ms_per_frame']} ms/frame")
        out["weak_scaling_cpu"] = ws
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
