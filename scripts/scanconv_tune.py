"""Scanconv kernel tuning: per-row MXU passes vs one wide batched dot.

Times the production kernel against a chunked-dot prototype on the real RF
shape (465x512 -> 400x500) and checks numerical equality.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcray_tpu.config import SimConfig
from mcray_tpu.ops import imaging
from mcray_tpu.ops.pallas import scanconv as sc

TILE_I = 8


def _proto_kernel(maps_ref, rft_ref, out_ref, *, r_pad, c_pad, w_pad, chunk, dot_dtype):
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r_pad, w_pad), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_pad, w_pad), 0)
    rft = rft_ref[:].astype(dot_dtype)
    rows = []
    for k0 in range(0, TILE_I, chunk):
        rhots = []
        chots = []
        for k in range(k0, k0 + chunk):
            r0 = maps_ref[k, 0, :].reshape(1, w_pad).astype(jnp.int32)
            w_r0 = maps_ref[k, 1, :].reshape(1, w_pad)
            w_r1 = maps_ref[k, 2, :].reshape(1, w_pad)
            c0 = maps_ref[k, 3, :].reshape(1, w_pad).astype(jnp.int32)
            w_c0 = maps_ref[k, 4, :].reshape(1, w_pad)
            w_c1 = maps_ref[k, 5, :].reshape(1, w_pad)
            rhots.append(
                (jnp.where(iota_r == r0, w_r0, 0.0) + jnp.where(iota_r == r0 + 1, w_r1, 0.0)).astype(dot_dtype)
            )
            chots.append(
                jnp.where(iota_c == c0, w_c0, 0.0) + jnp.where(iota_c == c0 + 1, w_c1, 0.0)
            )
        rhot_all = jnp.concatenate(rhots, axis=1)  # (r_pad, chunk*w_pad)
        v_all = jax.lax.dot_general(
            rft, rhot_all,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (c_pad, chunk*w_pad)
        for j in range(chunk):
            v = v_all[:, j * w_pad : (j + 1) * w_pad]
            rows.append(jnp.sum(v * chots[j], axis=0, keepdims=True))
    out_ref[:] = jnp.concatenate(rows, axis=0)


def proto_call(rf, table, out_cols, chunk, dot_dtype):
    rf_rows, rf_cols = rf.shape
    out_rows = table.shape[0]
    w_pad = table.shape[2]
    r_pad = sc._round_up(rf_rows, 8)
    c_pad = sc._round_up(rf_cols, 8)
    rft = jnp.zeros((c_pad, r_pad), rf.dtype).at[:rf_cols, :rf_rows].set(rf.T)
    rows_pad = sc._round_up(out_rows, TILE_I)
    if rows_pad != table.shape[0]:
        table = jnp.pad(table, ((0, rows_pad - out_rows), (0, 0), (0, 0)))
    kernel = functools.partial(
        _proto_kernel, r_pad=r_pad, c_pad=c_pad, w_pad=w_pad, chunk=chunk, dot_dtype=dot_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // TILE_I,),
        in_specs=[
            pl.BlockSpec((TILE_I, 8, w_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, r_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_I, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, w_pad), jnp.float32),
    )(table, rft)
    return out[:out_rows, :out_cols]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    cfg = SimConfig()
    maps = imaging.scan_conversion_maps(cfg)
    table = jnp.asarray(sc.pack_scan_maps(maps[0], maps[1], cfg.rf_rows, cfg.rf_cols))
    rf = jax.random.uniform(jax.random.PRNGKey(0), (cfg.rf_rows, cfg.rf_cols), jnp.float32)

    ref = imaging.scan_convert(rf, jnp.asarray(maps[0]), jnp.asarray(maps[1]))
    base = sc.scan_convert_pallas(rf, table, cfg.bmode_cols)
    print("base max err vs map_coordinates:", float(jnp.abs(base - ref).max()), "(bf16 rounding)")

    variants = {
        "prod(per-row dots)": lambda r: sc.scan_convert_pallas(r, table, cfg.bmode_cols),
    }
    for chunk in (4, 8):
        for dt in (jnp.bfloat16, jnp.float32):
            name = f"chunk{chunk}-{dt.__name__}"
            variants[name] = functools.partial(proto_call, table=table, out_cols=cfg.bmode_cols, chunk=chunk, dot_dtype=dt)

    def chain(fn):
        def once(r):
            out = None
            carry = jnp.float32(0.0)
            for _ in range(args.inner):
                out = fn(r + carry)
                carry = carry + jnp.sum(out) * 1e-30
            return out
        return jax.jit(once)

    for name, fn in variants.items():
        try:
            out = fn(rf)
            err = float(jnp.abs(out - ref).max())
            c = chain(fn)
            o = jax.block_until_ready(c(rf))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                o = jax.block_until_ready(c(rf))
            dt_ms = (time.perf_counter() - t0) / (args.reps * args.inner) * 1e3
            print(f"{name:>22}: {dt_ms:7.3f} ms  max_err {err:.2e}")
        except Exception as e:
            print(f"{name:>22}: FAILED {str(e)[:150]}")


if __name__ == "__main__":
    main()
