"""Regenerate BASELINE.md's measured tables from live runs (VERDICT r3
item 8: the benchmark story must be reproducible from one command, not
hand-curated).

    python scripts/update_baseline.py            # run everything (TPU, ~15 min)
    python scripts/update_baseline.py --use-cached  # patch from /tmp artifacts

Runs bench.py (headline + roofline extras), scripts/stress_bench.py
(large-scene table) and scripts/roofline.py (per-stage table), then rewrites
the marker-delimited blocks in BASELINE.md:

    <!-- begin:auto-headline --> ... <!-- end:auto-headline -->
    <!-- begin:auto-roofline --> ... <!-- end:auto-roofline -->
    <!-- begin:auto-stress -->   ... <!-- end:auto-stress -->

Anything outside the markers is left untouched.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = {
    "bench": "/tmp/bench_auto.json",
    "stress": "/tmp/stress_auto.json",
    "roofline": "/tmp/roofline_auto.json",
    "roofline_hd": "/tmp/roofline_hd_auto.json",
    "mega": "/tmp/mega_auto.json",
}


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=ROOT, capture_output=True, text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    with open(ART["bench"], "w") as f:
        json.dump(data, f, indent=1)
    return data


def run_stress() -> list:
    subprocess.run(
        [sys.executable, "scripts/stress_bench.py", "--tris", "200000",
         "500000", "1000000", "--json-out", ART["stress"]],
        cwd=ROOT, timeout=3600, check=True,
    )
    with open(ART["stress"]) as f:
        return json.load(f)


def run_roofline() -> dict:
    subprocess.run(
        [sys.executable, "scripts/roofline.py", "--json-out", ART["roofline"]],
        cwd=ROOT, timeout=3600, check=True,
    )
    with open(ART["roofline"]) as f:
        return json.load(f)


def run_roofline_hd() -> dict:
    subprocess.run(
        [sys.executable, "scripts/roofline.py", "--scene",
         "assets/ircad11_hd/santi-liver-hd.scene",
         "--json-out", ART["roofline_hd"]],
        cwd=ROOT, timeout=3600, check=True,
    )
    with open(ART["roofline_hd"]) as f:
        return json.load(f)


def run_mega() -> dict:
    subprocess.run(
        [sys.executable, "scripts/mega_frame_bench.py",
         "--json-out", ART["mega"]],
        cwd=ROOT, timeout=3600, check=True,
    )
    with open(ART["mega"]) as f:
        return json.load(f)


def mega_md(m: dict) -> str:
    lines = [
        f"Full frames (all bounces + march + postproc + scan conversion) on "
        f"the shipped ~{m['triangles']:,}-triangle `{m['scene']}` phantom — "
        f"the real mixed-coherence ray population, device times "
        f"(jax.profiler, scripts/mega_frame_bench.py):",
        "",
        "| intersect mode | frame ms | rays/s | matches listed |",
        "|---|---|---|---|",
    ]
    for mode in ("listed", "grouped"):
        if f"{mode}_frame_ms" not in m:
            continue
        agree = "ref" if mode == "listed" else (
            "yes" if m.get(f"{mode}_agree") else "NO"
        )
        lines.append(
            f"| {mode} | {m[f'{mode}_frame_ms']} "
            f"| {m[f'{mode}_rays_per_s']:,} | {agree} |"
        )
    return "\n".join(lines)


def headline_md(b: dict) -> str:
    e = b["extra"]
    lines = [
        "| metric | value | source |",
        "|---|---|---|",
        f"| sphere batched throughput (DEVICE) | **{b['value']:,} ray-casts/s** "
        f"({e['frames_per_s']:.1f} fps, {e['frame_ms']} ms/frame device) | bench.py, "
        f"profiler over {e['batch']}x{e['n_chain']} frames/dispatch |",
        f"| vs measured C++ baseline | **{b['vs_baseline']}x** | BASELINE.md C++ table |",
        f"| sphere batched wall (tunnelled dev box) | "
        f"{e.get('frame_ms_wall_batched', '—')} ms/frame | bench.py |",
        f"| sphere single-frame wall incl. image fetch (tunnel) | "
        f"{e['single_frame_ms']} ms | bench.py |",
    ]
    if "single_frame_device_ms" in e:
        lines.append(
            f"| sphere single-frame DEVICE time | {e['single_frame_device_ms']} ms "
            f"| jax.profiler (bench extras) |")
    if "ircad_hd_rays_per_s" in e:
        lines.append(
            f"| ircad11_hd ({e['ircad_hd_triangles']:,} tris) throughput | "
            f"{e['ircad_hd_rays_per_s']:,} rays/s ({e['ircad_hd_frame_ms']} ms/frame) "
            f"| bench.py |")
        if "ircad_hd_frame_device_ms" in e:
            lines.append(
                f"| ircad11_hd single-frame DEVICE time | "
                f"{e['ircad_hd_frame_device_ms']} ms | jax.profiler |")
    return "\n".join(lines)


def roofline_md(s: dict) -> str:
    try:
        sys.path.insert(0, os.path.join(ROOT, "scripts"))
        from roofline import to_markdown

        return to_markdown(s)
    except Exception:
        return "```json\n" + json.dumps(s, indent=1) + "\n```"


def stress_md(rows: list) -> str:
    lines = [
        "Device times (jax.profiler) for one 2560-ray closest-hit query; "
        "`agree` = bitwise match vs brute on hit/t. fan = coherent probe "
        "rays, bounce = isotropic scattered rays.",
        "",
        "| tris | rays | brute | culled | staged | listed-exact | listed-hier | grouped | best speedup |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        b = r.get("brute")
        cand = [r.get(k) for k in ("listed-exact", "listed-hier", "grouped")]
        best = min((c for c in cand if c), default=None)
        sp = f"{b/best:.0f}x" if (b and best) else "—"
        lines.append(
            f"| {r['tris']:,} | {r['rays']} | {b if b is not None else '—'} "
            f"| {r.get('culled', '—')} | {r.get('staged', '—')} "
            f"| {r.get('listed-exact', '—')} | {r.get('listed-hier', '—')} "
            f"| {r.get('grouped', '—')} | {sp} |"
        )
    return "\n".join(lines)


def patch(md: str, name: str, body: str) -> str:
    pat = re.compile(
        rf"(<!-- begin:auto-{name} -->\n).*?(\n<!-- end:auto-{name} -->)",
        re.DOTALL,
    )
    if not pat.search(md):
        raise SystemExit(
            f"BASELINE.md is missing the auto-{name} markers; add\n"
            f"<!-- begin:auto-{name} -->\n<!-- end:auto-{name} -->"
        )
    return pat.sub(lambda m: m.group(1) + body + m.group(2), md)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--use-cached", action="store_true",
                    help="patch BASELINE.md from existing /tmp artifacts")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["bench", "stress", "roofline", "mega"])
    args = ap.parse_args()

    if args.use_cached:
        data = {}
        for k, p in ART.items():
            if os.path.exists(p):
                with open(p) as f:
                    data[k] = json.load(f)
    else:
        data = {}
        if "bench" not in args.skip:
            data["bench"] = run_bench()
        if "stress" not in args.skip:
            data["stress"] = run_stress()
        if "roofline" not in args.skip:
            data["roofline"] = run_roofline()
            data["roofline_hd"] = run_roofline_hd()
        if "mega" not in args.skip:
            data["mega"] = run_mega()

    path = os.path.join(ROOT, "BASELINE.md")
    with open(path) as f:
        md = f.read()
    if "bench" in data:
        md = patch(md, "headline", headline_md(data["bench"]))
    if "roofline" in data:
        body = roofline_md(data["roofline"])
        if "roofline_hd" in data:
            body += "\n\n" + roofline_md(data["roofline_hd"])
        md = patch(md, "roofline", body)
    if "stress" in data:
        md = patch(md, "stress", stress_md(data["stress"]))
    if "mega" in data:
        md = patch(md, "mega", mega_md(data["mega"]))
    with open(path, "w") as f:
        f.write(md)
    print(f"BASELINE.md updated from: {sorted(data)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
