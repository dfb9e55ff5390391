"""March kernel tuning: full-height per-segment eval vs row-tiled span skip.

Each segment's march covers a contiguous ~steps*dt/rdt row span (~47 rows of
472); the production kernel evaluates every segment against every row. The
prototype adds row tiles to the grid and skips (pl.when) segments whose span
misses the tile — scatterer evals drop by ~(rows/span).
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
from mcray_tpu.models.simulator import Simulator, trace_paths
from mcray_tpu.ops.pallas import march as M
from mcray_tpu.scene.compile import load_and_compile

import os as _os
TILE_R = int(_os.environ.get("MT_TILE_R", "64"))


def _march_kernel_tiled(seeds_ref, seg_ref, out_ref, acc_ref, *, cfg, n_rows_pad):
    axres = cfg.axial_resolution_mm
    rdt = cfg.rf_row_dt_us
    dt = cfg.march_dt_us
    sd = seg_ref.shape[0]
    j = pl.program_id(1)

    row0 = j * TILE_R
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, M.TILE_C), 0) + row0
    rows_f = rows_i.astype(jnp.float32)
    row_ok = rows_i < cfg.rf_rows
    r_lo = jnp.float32(row0)
    r_hi = jnp.float32(row0 + TILE_R)

    seed0 = seeds_ref[0, 0]
    seed1 = seeds_ref[0, 1]

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def field(seg_i, f):
        return seg_ref[seg_i, f, :].reshape(1, M.TILE_C)

    def body(seg_i, _):
        t0 = field(seg_i, M.F_T0)
        steps = field(seg_i, M.F_STEPS)
        valid = field(seg_i, M.F_VALID) > 0.5
        b_row = field(seg_i, M.F_B_ROW)

        # conservative row span of this segment's march (+-1 row guard)
        seg_r0 = jnp.floor(t0 / rdt) - 1.0
        seg_r1 = jnp.floor((t0 + steps * dt) / rdt) + 1.0
        span_hits = valid & (seg_r1 >= r_lo) & (seg_r0 < r_hi)
        b_hits = valid & (b_row >= r_lo) & (b_row < r_hi)

        @pl.when(jnp.any(span_hits | b_hits))
        def _():
            matched, k_sel = M._match_rows(rows_f, t0, steps, valid, row_ok, cfg)
            scale = k_sel * axres
            px = field(seg_i, M.F_FROM_X) + scale * field(seg_i, M.F_DIR_X)
            py = field(seg_i, M.F_FROM_Y) + scale * field(seg_i, M.F_DIR_Y)
            pz = field(seg_i, M.F_FROM_Z) + scale * field(seg_i, M.F_DIR_Z)
            scat = M._scat_eval(
                px, py, pz,
                field(seg_i, M.F_MU0), field(seg_i, M.F_MU1), field(seg_i, M.F_SIGMA),
                seed0, seed1, cfg, want_grads=False,
            )["scat"]
            intens = field(seg_i, M.F_I0) * jnp.exp(field(seg_i, M.F_LN_ATT) * k_sel)
            add = jnp.where(matched, intens * scat, 0.0)
            add = add + jnp.where((rows_f == b_row) & row_ok, field(seg_i, M.F_B_VAL), 0.0)
            acc_ref[:] += add

        return 0

    jax.lax.fori_loop(0, sd, body, 0)
    out_ref[:] = acc_ref[:]


def march_tiled(segments, materials, volume, cfg, n_cols=None, interpret=False):
    c = n_cols or cfg.rf_cols
    soa = M.pack_segments(segments, materials, cfg, c)
    seeds = volume["seeds"].astype(jnp.int32).reshape(1, 2)
    sd, c_pad = soa.shape[0], soa.shape[2]
    n_rows_pad = ((cfg.rf_rows + TILE_R - 1) // TILE_R) * TILE_R
    kernel = functools.partial(_march_kernel_tiled, cfg=cfg, n_rows_pad=n_rows_pad)
    out = pl.pallas_call(
        kernel,
        grid=(c_pad // M.TILE_C, n_rows_pad // TILE_R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sd, M.N_FIELDS, M.TILE_C), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, M.TILE_C), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_R, M.TILE_C), jnp.float32)],
        interpret=interpret,
    )(seeds, soa)
    return out[: cfg.rf_rows, :c]


def _march_kernel_listed(counts_ref, ids_ref, seeds_ref, seg_ref, out_ref, *, cfg):
    """v2: loop only the precomputed touching-segment list for this
    (col-tile, row-tile); dynamic trip count, no in-kernel branching."""
    axres = cfg.axial_resolution_mm
    i = pl.program_id(0)
    j = pl.program_id(1)

    row0 = j * TILE_R
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, M.TILE_C), 0) + row0
    rows_f = rows_i.astype(jnp.float32)
    row_ok = rows_i < cfg.rf_rows

    seed0 = seeds_ref[0, 0]
    seed1 = seeds_ref[0, 1]

    def body(it, acc):
        seg_i = ids_ref[i, j, it]
        blk = seg_ref[seg_i]  # ONE dynamic slice: (N_FIELDS, TILE_C)

        def field(f):
            return blk[f, :].reshape(1, M.TILE_C)

        t0 = field(M.F_T0)
        steps = field(M.F_STEPS)
        valid = field(M.F_VALID) > 0.5
        matched, k_sel = M._match_rows(rows_f, t0, steps, valid, row_ok, cfg)
        scale = k_sel * axres
        px = field(M.F_FROM_X) + scale * field(M.F_DIR_X)
        py = field(M.F_FROM_Y) + scale * field(M.F_DIR_Y)
        pz = field(M.F_FROM_Z) + scale * field(M.F_DIR_Z)
        scat = M._scat_eval(
            px, py, pz,
            field(M.F_MU0), field(M.F_MU1), field(M.F_SIGMA),
            seed0, seed1, cfg, want_grads=False,
        )["scat"]
        intens = field(M.F_I0) * jnp.exp(field(M.F_LN_ATT) * k_sel)
        b_row = field(M.F_B_ROW)
        acc = acc + jnp.where(matched, intens * scat, 0.0)
        acc = acc + jnp.where((rows_f == b_row) & row_ok, field(M.F_B_VAL), 0.0)
        return acc

    n = counts_ref[i, j]
    out_ref[:] = jax.lax.fori_loop(
        0, n, body, jnp.zeros((TILE_R, M.TILE_C), jnp.float32)
    )


def _march_kernel_paired(counts_ref, ids_ref, seeds_ref, seg_ref, out_ref, *, cfg):
    """v3: two segments per loop iteration with independent accumulators —
    breaks the acc dependency chain so the VPU can overlap the two evals."""
    axres = cfg.axial_resolution_mm
    i = pl.program_id(0)
    j = pl.program_id(1)

    row0 = j * TILE_R
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, M.TILE_C), 0) + row0
    rows_f = rows_i.astype(jnp.float32)
    row_ok = rows_i < cfg.rf_rows

    seed0 = seeds_ref[0, 0]
    seed1 = seeds_ref[0, 1]

    def eval_one(seg_i):
        blk = seg_ref[seg_i]

        def field(f):
            return blk[f, :].reshape(1, M.TILE_C)

        t0 = field(M.F_T0)
        steps = field(M.F_STEPS)
        valid = field(M.F_VALID) > 0.5
        matched, k_sel = M._match_rows(rows_f, t0, steps, valid, row_ok, cfg)
        scale = k_sel * axres
        px = field(M.F_FROM_X) + scale * field(M.F_DIR_X)
        py = field(M.F_FROM_Y) + scale * field(M.F_DIR_Y)
        pz = field(M.F_FROM_Z) + scale * field(M.F_DIR_Z)
        scat = M._scat_eval(
            px, py, pz,
            field(M.F_MU0), field(M.F_MU1), field(M.F_SIGMA),
            seed0, seed1, cfg, want_grads=False,
        )["scat"]
        intens = field(M.F_I0) * jnp.exp(field(M.F_LN_ATT) * k_sel)
        b_row = field(M.F_B_ROW)
        add = jnp.where(matched, intens * scat, 0.0)
        return add + jnp.where((rows_f == b_row) & row_ok, field(M.F_B_VAL), 0.0)

    def body(it, accs):
        a1, a2 = accs
        return (a1 + eval_one(ids_ref[i, j, 2 * it]),
                a2 + eval_one(ids_ref[i, j, 2 * it + 1]))

    n = counts_ref[i, j]
    zero = jnp.zeros((TILE_R, M.TILE_C), jnp.float32)
    a1, a2 = jax.lax.fori_loop(0, (n + 1) // 2, body, (zero, zero))
    out_ref[:] = a1 + a2


def march_paired(segments, materials, volume, cfg, n_cols=None, interpret=False):
    c = n_cols or cfg.rf_cols
    soa = M.pack_segments(segments, materials, cfg, c)
    seeds = volume["seeds"].astype(jnp.int32).reshape(1, 2)
    sd, c_pad = soa.shape[0], soa.shape[2]
    # one extra always-invalid segment slot: the pair-padding target
    soa = jnp.pad(soa, ((0, 1), (0, 0), (0, 0)))
    n_rows_pad = ((cfg.rf_rows + TILE_R - 1) // TILE_R) * TILE_R
    counts, ids = _touch_tables(soa[:sd], cfg, n_rows_pad)
    ids = jnp.pad(ids, ((0, 0), (0, 0), (0, 1)), constant_values=sd)
    kernel = functools.partial(_march_kernel_paired, cfg=cfg)
    out = pl.pallas_call(
        kernel,
        grid=(c_pad // M.TILE_C, n_rows_pad // TILE_R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sd + 1, M.N_FIELDS, M.TILE_C), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, M.TILE_C), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(counts, ids, seeds, soa)
    return out[: cfg.rf_rows, :c]


def _touch_tables(soa, cfg, n_rows_pad):
    """(counts, ids): which segments touch each (col-tile, row-tile)."""
    rdt = cfg.rf_row_dt_us
    dt = cfg.march_dt_us
    sd, _, c_pad = soa.shape
    c_tiles = c_pad // M.TILE_C
    r_tiles = n_rows_pad // TILE_R

    t0 = soa[:, M.F_T0, :]
    steps = soa[:, M.F_STEPS, :]
    valid = soa[:, M.F_VALID, :] > 0.5
    b_row = soa[:, M.F_B_ROW, :]
    seg_r0 = jnp.floor(t0 / rdt) - 1.0
    seg_r1 = jnp.floor((t0 + steps * dt) / rdt) + 1.0

    def per_tile(x):
        return x.reshape(sd, c_tiles, M.TILE_C)

    r_lo = (jnp.arange(r_tiles, dtype=jnp.float32) * TILE_R)[None, None, None, :]
    r_hi = r_lo + TILE_R
    valid_t = per_tile(valid)[..., None]
    span = (
        valid_t & (per_tile(seg_r1)[..., None] >= r_lo)
        & (per_tile(seg_r0)[..., None] < r_hi)
    )
    bt = (
        valid_t & (per_tile(b_row)[..., None] >= r_lo)
        & (per_tile(b_row)[..., None] < r_hi)
    )
    touch = jnp.any(span | bt, axis=2)  # (sd, c_tiles, r_tiles)
    counts = jnp.sum(touch, axis=0).astype(jnp.int32)  # (c_tiles, r_tiles)
    # stable ascending order of touching segment indices
    order = jnp.argsort(~touch, axis=0, stable=True).astype(jnp.int32)
    ids = order.transpose(1, 2, 0)  # (c_tiles, r_tiles, sd)
    return counts, ids


def march_listed(segments, materials, volume, cfg, n_cols=None, interpret=False):
    c = n_cols or cfg.rf_cols
    soa = M.pack_segments(segments, materials, cfg, c)
    seeds = volume["seeds"].astype(jnp.int32).reshape(1, 2)
    sd, c_pad = soa.shape[0], soa.shape[2]
    n_rows_pad = ((cfg.rf_rows + TILE_R - 1) // TILE_R) * TILE_R
    counts, ids = _touch_tables(soa, cfg, n_rows_pad)
    kernel = functools.partial(_march_kernel_listed, cfg=cfg)
    out = pl.pallas_call(
        kernel,
        grid=(c_pad // M.TILE_C, n_rows_pad // TILE_R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((sd, M.N_FIELDS, M.TILE_C), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, M.TILE_C), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(counts, ids, seeds, soa)
    return out[: cfg.rf_rows, :c]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    cfg = SimConfig()
    pack = load_and_compile("assets/sphere/sphere.scene", cfg)
    sim = Simulator(pack, cfg)
    key = jax.random.PRNGKey(0)
    segments = jax.jit(
        lambda k: trace_paths(
            k, sim.materials, jnp.asarray(pack.transducer_position),
            jnp.asarray(pack.transducer_angles), sim.scene, sim.spacing,
            sim.starting_material, cfg, culled_tris=sim.culled_tris,
        )
    )(key)
    segments = jax.block_until_ready(segments)

    base_fn = jax.jit(lambda s: M.march_and_accumulate_pallas(s, sim.materials, sim.volume, cfg))
    new_fn = jax.jit(lambda s: march_tiled(s, sim.materials, sim.volume, cfg))
    list_fn = jax.jit(lambda s: march_listed(s, sim.materials, sim.volume, cfg))
    pair_fn = jax.jit(lambda s: march_paired(s, sim.materials, sim.volume, cfg))

    a = jax.block_until_ready(base_fn(segments))
    for nm, f in [("tiled", new_fn), ("listed", list_fn), ("paired", pair_fn)]:
        b = jax.block_until_ready(f(segments))
        err = float(jnp.abs(a - b).max())
        rel = err / float(jnp.abs(a).max())
        print(f"{nm}: max abs err {err:.3e}  (rel {rel:.2e}); rf max {float(jnp.abs(a).max()):.3f}")

    def chain(fn):
        def once(s):
            out = None
            carry = jnp.float32(0.0)
            for _ in range(args.inner):
                out = fn({**s, "initial": s["initial"] + carry})
                carry = carry + jnp.sum(out) * 1e-30
            return out
        return jax.jit(once)

    for name, fn in [("prod(full-height)", base_fn), ("row-tiled skip", new_fn), ("listed", list_fn), ("paired", pair_fn)]:
        c = chain(fn)
        o = jax.block_until_ready(c(segments))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = jax.block_until_ready(c(segments))
        dt_ms = (time.perf_counter() - t0) / (args.reps * args.inner) * 1e3
        print(f"{name:>20}: {dt_ms:7.3f} ms")


if __name__ == "__main__":
    main()
