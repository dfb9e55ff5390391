"""Pallas TPU kernel: fused PSF convolution + envelope detection.

One kernel invocation holds the whole RF image (465x512 f32 < 1 MB) in VMEM
and applies the reference-exact uncentered separable convolution
(reference src/rfimage.h:93-123) followed by the closed-form peak-lerp
envelope (src/rfimage.h:54-91) without round-tripping intermediates through
HBM. The envelope's prefix-max / suffix-min scans over rows are computed with
log-step shifted reductions (9 steps for 465 rows) — `pltpu.roll` plus an
iota guard against wrap-around.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SimConfig
from .. import psf as psf_mod


def _postproc_kernel(rf_ref, out_ref, *, ax, lat, rows: int, cols: int, rows_pad: int):
    a = len(ax)
    l = len(lat)
    rf = rf_ref[:]  # (rows_pad, cols)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, cols), 0)

    def roll(x, shift, axis):
        # pltpu.roll wants non-negative shifts; normalise cyclically
        size = x.shape[axis]
        return pltpu.roll(x, shift % size, axis)

    # ---- reference convolution (forward-shifted kernels) -----------------
    if rows > 2 * a and cols > l + l // 2:
        conv_ax = jnp.zeros_like(rf)
        for k in range(a):
            shifted = roll(rf, -k, 0)  # rf[r+k] at position r
            conv_ax = conv_ax + shifted * ax[k]
        # buffer valid only in rows [a, rows-a)
        buf = jnp.where((row_idx >= a) & (row_idx < rows - a), conv_ax, 0.0)

        conv_lat = jnp.zeros_like(rf)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, cols), 1)
        for k in range(l):
            shifted = roll(buf, -k, 1)  # buf[:, c+k] at c
            # guard wrap-around: buf column c+k must exist (c+k < cols)
            valid = col_idx + k < cols
            conv_lat = conv_lat + jnp.where(valid, shifted, 0.0) * lat[k]

        write = (
            (row_idx >= a)
            & (row_idx < rows - a)
            & (col_idx >= l // 2)
            & (col_idx < cols - l)
        )
        x = jnp.where(write, conv_lat, rf)
    else:
        x = rf

    # mask pad rows to a strictly falling tail so they create no fake peaks
    x = jnp.where(row_idx < rows, x, 0.0)

    # ---- envelope: peak detection + piecewise lerp ------------------------
    x_next = roll(x, -1, 0)   # x[i+1]
    x_prev = roll(x, 1, 0)    # x[i-1]
    rise_prev = x_prev < x               # x[i-1] < x[i]
    fall_here = ~(x < x_next)            # x[i] >= x[i+1]
    peak = rise_prev & fall_here & (row_idx >= 1) & (row_idx <= rows - 2)

    big = jnp.int32(rows_pad + 1)
    # next peak strictly after i: suffix-min of (peak? idx : big), then shift
    m = jnp.where(peak, row_idx, big)
    n_steps = int(np.ceil(np.log2(max(rows_pad, 2))))
    for s in [1 << t for t in range(n_steps)]:
        shifted = roll(m, -s, 0)
        ok = row_idx + s < rows_pad
        m = jnp.minimum(m, jnp.where(ok, shifted, big))
    npk = roll(m, -1, 0)
    npk = jnp.where(row_idx + 1 < rows_pad, npk, big)

    # previous peak at or before i (or -1)
    p = jnp.where(peak, row_idx, -1)
    for s in [1 << t for t in range(n_steps)]:
        shifted = roll(p, s, 0)
        ok = row_idx - s >= 0
        p = jnp.maximum(p, jnp.where(ok, shifted, -1))

    # values at prev/next peak positions: scatter |x| at peaks then scan the
    # same way (value travels with its index)
    absx = jnp.abs(x)
    mv = jnp.where(peak, absx, 0.0)
    # propagate (index, value) pairs: since indices are what we min/max over,
    # recompute values by a second scan carrying the value of the argmin/argmax
    mi = jnp.where(peak, row_idx, big)
    val_n = mv
    for s in [1 << t for t in range(n_steps)]:
        sh_i = roll(mi, -s, 0)
        sh_v = roll(val_n, -s, 0)
        ok = row_idx + s < rows_pad
        sh_i = jnp.where(ok, sh_i, big)
        take = sh_i < mi
        mi = jnp.where(take, sh_i, mi)
        val_n = jnp.where(take, sh_v, val_n)
    next_val = roll(val_n, -1, 0)
    next_val = jnp.where(row_idx + 1 < rows_pad, next_val, 0.0)

    pi = jnp.where(peak, row_idx, -1)
    val_p = jnp.where(peak, absx, 0.0)
    for s in [1 << t for t in range(n_steps)]:
        sh_i = roll(pi, s, 0)
        sh_v = roll(val_p, s, 0)
        ok = row_idx - s >= 0
        sh_i = jnp.where(ok, sh_i, -1)
        take = sh_i > pi
        pi = jnp.where(take, sh_i, pi)
        val_p = jnp.where(take, sh_v, val_p)

    x0 = x[0:1, :]  # raw first row (reference init, src/rfimage.h:63-64)
    prev_pos = jnp.maximum(pi, 0)
    prev_val = jnp.where(pi < 0, jnp.broadcast_to(x0, x.shape), val_p)

    has_next = npk < big
    npk_pos = jnp.where(has_next, npk, 0)
    denom = jnp.maximum(npk_pos - prev_pos, 1).astype(jnp.float32)
    alpha = (row_idx - prev_pos).astype(jnp.float32) / denom
    lerped = prev_val * (1.0 - alpha) + next_val * alpha
    out_ref[:] = jnp.where(has_next, lerped, x)


@functools.lru_cache(maxsize=None)
def _postproc_op(cfg: SimConfig, rows: int, cols: int, interpret: bool):
    """custom_vjp'd fused conv+envelope for fixed (cfg, shape).

    Forward: the Pallas kernel. Backward: VJP of the jnp composition
    (imaging.convolve_psf + imaging.envelope), which computes the same
    function (allclose-tested) — a rematerialising backward, so the fused
    kernel needs no saved intermediates and stays usable under jax.grad."""
    from .. import imaging

    rows_pad = ((rows + 7) // 8) * 8
    ax = tuple(float(v) for v in psf_mod.axial_kernel_np(cfg))
    lat = tuple(float(v) for v in psf_mod.lateral_kernel_np(cfg))

    def fwd_call(rf):
        rf_p = jnp.pad(rf, ((0, rows_pad - rows), (0, 0)))
        kernel = functools.partial(
            _postproc_kernel, ax=ax, lat=lat, rows=rows, cols=cols, rows_pad=rows_pad
        )
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad, cols), jnp.float32),
            interpret=interpret,
        )(rf_p)
        return out[:rows]

    def jnp_ref(rf):
        return imaging.envelope(imaging.convolve_psf(rf, cfg))

    @jax.custom_vjp
    def op(rf):
        return fwd_call(rf)

    def op_fwd(rf):
        return fwd_call(rf), rf

    def op_bwd(rf, g):
        _, vjp = jax.vjp(jnp_ref, rf)
        return (vjp(g)[0],)

    op.defvjp(op_fwd, op_bwd)
    return op


def convolve_envelope_pallas(rf: jax.Array, cfg: SimConfig, *, interpret: bool = False):
    """Fused reference-exact convolution + envelope. rf: (rf_rows, C).
    Differentiable via a custom VJP (see _postproc_op)."""
    rows, cols = rf.shape
    return _postproc_op(cfg, rows, cols, interpret)(rf)
