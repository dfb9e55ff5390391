"""Pallas TPU kernel: output-stationary segment march + RF accumulation.

The jnp path (simulator.march_and_accumulate) is scatter-based: 12M
(segment, step) samples scatter-add into the (465, 512) RF image — measured
~120 ms/frame on one v5e chip because XLA lowers large scatters to sorted
serial updates, plus ~190 ms of random texture gathers.

This kernel inverts the loop (gather/output-stationary): each RF pixel
(row r, column c) asks the <= S*D segments of its OWN column which march step
lands in row r. Because the march time step exceeds the RF row pitch
(dt = axial_mm/c > rdt = trunc_axial_um/c, reference src/main.cpp:118 vs
src/rfimage.h:35), the row index floor((t0 + k*dt)/rdt) is strictly
increasing in k — every output row receives AT MOST ONE step of a given
segment. So the scatter is really a per-segment monotone relabelling, and
each pixel can solve k = ceil((r - t0/rdt) / (dt/rdt)) directly. No scatter,
no gather, no HBM traffic beyond streaming the segment table once: pure VPU
arithmetic over (row, column) tiles, with the scatterer field evaluated
procedurally (texture.procedural_fields, bit-identical hash).

Float candidates are verified with the *exact forward formula* the jnp path
uses (floor(t_k / rdt) == r), so kernel and jnp outputs agree to float
associativity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SimConfig

# Segment SoA field indices (layout (F, SD, C))
F_FROM_X, F_FROM_Y, F_FROM_Z, F_DIR_X, F_DIR_Y, F_DIR_Z, F_T0, F_STEPS, \
    F_LN_ATT, F_I0, F_MU0, F_MU1, F_SIGMA, F_B_ROW, F_B_VAL, F_VALID = range(16)
N_FIELDS = 16

TILE_C = 128


def _hash_i32(x):
    """lowbias32 on int32 with wrapping multiply + logical shifts —
    bit-identical to texture.hash_u32 on uint32."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, 15)
    x = x * jnp.int32(-2073254261)  # 0x846CA68B as signed i32
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _march_kernel(seeds_ref, seg_ref, out_ref, *, cfg: SimConfig, n_rows_pad: int):
    res = cfg.resolution_um / 1000.0
    size = cfg.volume_size
    axres = cfg.axial_resolution_mm
    dt = cfg.march_dt_us
    rdt = cfg.rf_row_dt_us
    t_window = float(cfg.max_travel_time_us)
    inv_a = rdt / dt
    sd = seg_ref.shape[1]

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (n_rows_pad, TILE_C), 0)
    rows_f = rows_i.astype(jnp.float32)
    row_ok = rows_i < cfg.rf_rows

    seed0 = seeds_ref[0, 0]
    seed1 = seeds_ref[0, 1]

    def field(seg_i, f):
        return seg_ref[f, seg_i, :].reshape(1, TILE_C)

    def body(seg_i, acc):
        t0 = field(seg_i, F_T0)
        steps = field(seg_i, F_STEPS)
        valid = field(seg_i, F_VALID) > 0.5

        # candidate march step for this output row: k ~ (r - t0/rdt) * rdt/dt,
        # verified below with the exact forward binning formula
        k_guess = jnp.floor((rows_f - t0 / rdt) * inv_a)

        k_sel = jnp.zeros_like(rows_f)
        matched = jnp.zeros_like(rows_f, dtype=jnp.bool_)
        for cand in (-1.0, 0.0, 1.0, 2.0):
            k = k_guess + cand
            t_k = t0 + k * dt
            hit = (
                (jnp.floor(t_k / rdt) == rows_f)
                & (k >= 0.0)
                & (k < steps)
                & (t_k < t_window)
            )
            k_sel = jnp.where(hit, k, k_sel)
            matched = matched | hit
        matched = matched & valid & row_ok

        # sample point along the segment (world units; reference treats the
        # mm-valued axial step as world units, src/main.cpp:117)
        scale = k_sel * axres
        px = field(seg_i, F_FROM_X) + scale * field(seg_i, F_DIR_X)
        py = field(seg_i, F_FROM_Y) + scale * field(seg_i, F_DIR_Y)
        pz = field(seg_i, F_FROM_Z) + scale * field(seg_i, F_DIR_Z)

        def wrap(x):
            q = jnp.trunc(x / res).astype(jnp.int32)
            return jnp.mod(jnp.mod(q, size) + size, size)

        ix, iy, iz = wrap(px), wrap(py), wrap(pz)
        vid = (ix * size + iy) * size + iz
        b1 = _hash_i32(vid ^ seed0)
        b2 = _hash_i32(vid ^ seed1)
        u1 = (jax.lax.shift_right_logical(b1, 8).astype(jnp.float32) + 0.5) * (
            1.0 / 16777216.0
        )
        u2 = (jax.lax.shift_right_logical(b2, 8).astype(jnp.float32) + 0.5) * (
            1.0 / 16777216.0
        )
        r_bm = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * jnp.pi) * u2
        noise = r_bm * jnp.cos(theta)
        prob = r_bm * jnp.sin(theta)

        mu1 = field(seg_i, F_MU1)
        scat = jnp.where(
            prob >= mu1, noise * field(seg_i, F_SIGMA) + field(seg_i, F_MU0), 0.0
        )
        intens = field(seg_i, F_I0) * jnp.exp(field(seg_i, F_LN_ATT) * k_sel)
        acc = acc + jnp.where(matched, intens * scat, 0.0)

        # boundary echo (Burger13 Eq. 10 term, reference src/main.cpp:139)
        b_row = field(seg_i, F_B_ROW)
        acc = acc + jnp.where((rows_f == b_row) & row_ok, field(seg_i, F_B_VAL), 0.0)
        return acc

    acc = jax.lax.fori_loop(
        0, sd, body, jnp.zeros((n_rows_pad, TILE_C), jnp.float32)
    )
    out_ref[:] = acc


def pack_segments(segments, materials, cfg: SimConfig, n_cols: int):
    """Regroup the (D, N) segment tensor into the kernel's (F, SD, C) SoA.

    Paths are ordered column-major (path = c * S + s), so columns are a
    reshape away. Pads C up to a TILE_C multiple with invalid columns.
    """
    from ...models.simulator import segment_march_quantities

    d, n = segments["valid"].shape
    s = cfg.samples_per_element
    c = n_cols
    rdt = cfg.rf_row_dt_us
    dt = cfg.march_dt_us

    def per_col(x):
        # (D, C*S) -> (C, S*D)
        return x.reshape(d, c, s).transpose(1, 2, 0).reshape(c, s * d)

    frm = segments["from"].reshape(d, n, 3)
    dire = segments["direction"].reshape(d, n, 3)

    steps, t0, ln_att, mu0, mu1, sigma = segment_march_quantities(
        segments, materials, cfg
    )

    b_time = t0 + dt * (steps - 1.0)
    b_row = jnp.floor(b_time / rdt)
    b_ok = segments["valid"] & (steps >= 1.0) & (b_row >= 0) & (b_row < cfg.rf_rows)
    b_row = jnp.where(b_ok, b_row, -1.0)
    b_val = segments["reflected"] / s

    fields = [
        frm[..., 0], frm[..., 1], frm[..., 2],
        dire[..., 0], dire[..., 1], dire[..., 2],
        t0, steps, ln_att, segments["initial"],
        mu0, mu1, sigma, b_row, b_val,
        segments["valid"].astype(jnp.float32),
    ]
    soa = jnp.stack([per_col(f) for f in fields], axis=0)  # (F, C, SD)
    soa = soa.transpose(0, 2, 1)  # (F, SD, C)
    pad = (-c) % TILE_C
    if pad:
        soa = jnp.pad(soa, ((0, 0), (0, 0), (0, pad)))
    return soa


def march_and_accumulate_pallas(
    segments,
    materials,
    volume,
    cfg: SimConfig,
    n_cols: int | None = None,
    *,
    interpret: bool = False,
):
    """Drop-in replacement for simulator.march_and_accumulate (procedural
    texture mode only). Returns the (rf_rows, n_cols) RF image."""
    if "seeds" not in volume:
        raise ValueError("pallas march requires texture_mode='procedural'")
    c = n_cols or cfg.rf_cols
    soa = pack_segments(segments, materials, cfg, c)
    c_pad = soa.shape[2]
    sd = soa.shape[1]
    n_rows_pad = ((cfg.rf_rows + 7) // 8) * 8
    seeds = volume["seeds"].astype(jnp.int32).reshape(1, 2)

    kernel = functools.partial(_march_kernel, cfg=cfg, n_rows_pad=n_rows_pad)
    out = pl.pallas_call(
        kernel,
        grid=(c_pad // TILE_C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (N_FIELDS, sd, TILE_C),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_rows_pad, TILE_C), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(seeds, soa)
    return out[: cfg.rf_rows, :c]
