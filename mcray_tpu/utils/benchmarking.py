"""Device-time measurement helpers for the tunnelled TPU backend.

Measuring kernels through the axon tunnel has three traps, each discovered
the hard way (round 4; earlier rounds' per-stage numbers were distorted by
all three):

1. **Same-input memoization**: dispatching a jitted program twice with
   bit-identical arguments returns in ~60 us without re-executing (the
   experimental backend appears to cache identical executions). Timing
   loops MUST vary an input every call — here a float seed that perturbs
   the workload at 1e-7 scale.
2. **Closure poisoning**: one execution of a jitted program that CLOSED
   over a live device array permanently degrades every later blocking
   dispatch in the process to ~27 ms round trips. All device state must be
   threaded as ARGUMENTS (see Simulator._state). These helpers take the
   state as explicit args.
3. **First-measured-rep artifact**: the first timed call after warmup
   sometimes returns 50-100x too fast (block_until_ready appears not to
   wait). The first rep is discarded; the reported figure is the min of
   the remaining reps.
4. **Flat large-buffer dispatch penalty**: any dispatch whose program READS
   an argument buffer >= ~2 MB pays a flat ~25 ms per call (measured flat
   from 2 MB to 64 MB; buffers below ~1 MB dispatch at ~0.2 ms; an unread
   big argument costs nothing). This is a tunnel artifact, not device
   time — on directly-attached TPUs dispatch is tens of microseconds. It
   inflated every round<=3 per-stage number by ~25/inner ms. Use
   inner >= 128 so the residual is <0.2 ms/iter, and treat the flat cost
   as serving-path latency, reported separately.

Chaining ``inner`` dependent evaluations inside one jit amortises the
per-dispatch tunnel latency; the chain carries a data dependence through a
scalar so XLA can neither CSE nor reorder the steps.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def chained_runner(fn: Callable, perturb: Callable, inner: int = 128):
    """Build ``run(e, *args) -> f32 scalar`` executing ``fn(*perturb(c, *args))``
    ``inner`` times serially inside one jit.

    ``perturb(c, *args)`` must fold the f32 carry ``c`` into the arguments
    (e.g. ``lambda c, x, s: (x + c * 1e-7, s)``) so no two iterations — and
    no two calls with different ``e`` — present identical inputs.
    """

    def once(e, *args):
        def body(c, _):
            out = fn(*perturb(c, *args))
            leaf = jax.tree.leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32)) * 1e-12 + c * 0.5, None

        c, _ = jax.lax.scan(body, e, None, length=inner)
        return c

    return jax.jit(once)


def time_device(run, args: tuple, inner: int, reps: int = 4) -> dict:
    """Time ``run(e, *args)`` built by chained_runner. Returns per-iteration
    seconds: {"best": min of reps>=1, "reps": all, "checksum": last value}."""
    v = jax.block_until_ready(run(jnp.float32(-1.0), *args))  # warm/compile
    ts = []
    for rep in range(reps):
        t0 = time.perf_counter()
        v = jax.block_until_ready(run(jnp.float32(rep), *args))
        ts.append((time.perf_counter() - t0) / inner)
    usable = ts[1:] if len(ts) > 1 else ts
    return {"best": min(usable), "reps": ts, "checksum": float(v)}


def measure(fn, perturb, args: tuple, inner: int = 128, reps: int = 4) -> dict:
    """chained_runner + time_device in one call."""
    run = chained_runner(fn, perturb, inner)
    return time_device(run, args, inner, reps)


def profile_device(fn, make_args, n: int = 6, warmup: int = 1) -> dict:
    """Authoritative DEVICE time via jax.profiler (works on the axon
    backend): runs ``fn(*make_args(i))`` n times under a trace and sums the
    TPU-side module-execution events ("jit_*" on the /device:TPU pid),
    excluding every tunnel/dispatch artifact the wall-clock path suffers.

    ``make_args(i)`` must return per-call-varied arguments (trap #1).
    ``fn`` should be jitted (one module event per call). Returns
    {"per_call_ms", "by_module": {name: ms/call}, "by_op": top ops}.
    """
    import collections
    import glob
    import gzip
    import json
    import os
    import tempfile

    for i in range(warmup):
        jax.block_until_ready(fn(*make_args(-1 - i)))
    tmpdir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(tmpdir):
        for i in range(n):
            jax.block_until_ready(fn(*make_args(i)))
    paths = sorted(
        glob.glob(os.path.join(tmpdir, "plugins/profile/*/*.trace.json.gz"))
    )
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    mods = collections.Counter()
    ops = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in dev_pids:
            if e["name"].startswith("jit_"):
                mods[e["name"].split("(")[0]] += e.get("dur", 0)
            else:
                ops[e["name"]] += e.get("dur", 0)
    return {
        "per_call_ms": sum(mods.values()) / n / 1e3,
        "by_module": {k: v / n / 1e3 for k, v in mods.items()},
        "by_op": {k: v / n / 1e3 for k, v in ops.most_common(12)},
    }
