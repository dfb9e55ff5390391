"""Pallas TPU kernel: gather-free scan conversion (polar -> B-mode).

The polar remap (reference cv::remap, src/rfimage.h:139,183-215) is a
bilinear gather of ~200k output pixels from the RF image. XLA lowers that
gather at ~10 ns/element on TPU — measured ~8 ms/frame, the single largest
stage of the pipeline (trace 3 ms, march 1 ms, postproc <1 ms).

This kernel removes the gather entirely by turning exact bilinear
interpolation into MXU work. Bilinear weights separate per axis — the
corner weight is (row weight)x(col weight), with out-of-range taps zeroed
per axis (cv BORDER_CONSTANT semantics). So for one output row i:

  out[i, j] = sum_c  Ccol[c, j] * (RF^T @ Rrow)[c, j]

where Rrow (rf_rows x out_cols) is the 2-nonzero one-hot row-interpolation
matrix of output row i (built on the VPU from iota == r0/r1 compares) and
Ccol is the matching 2-nonzero column selector. The one-hot matmul is a
dense (512x472)@(472x512) MXU pass per output row — ~50 GMAC/frame, ~1 ms,
vs ~8 ms of serialized gathers. Each output is the same 4-term sum as
map_coordinates; with precision="highest" it is f32-exact, at the default
MXU precision the operands round to bf16 (error below PNG quantization).

Differentiable: the remap is LINEAR in the RF image, so the custom VJP is
the transposed interpolation — rf_grad[r, c] = sum_ij rhot_i[r,j] *
chot_i[c,j] * g[i,j] — computed by a mirror kernel as one (r_pad, w_pad) @
(w_pad, c_pad) MXU pass per output row, accumulated across the grid. Same
cost as the forward; gradients match imaging.scan_convert's VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_scan_maps(map_row: np.ndarray, map_col: np.ndarray, rf_rows: int, rf_cols: int):
    """Host-side: per-output-pixel interpolation table (out_rows, 8, Wpad):
    rows [r0, w_r0, w_r1, c0, w_c0, w_c1, 0, 0] along dim 1, output column
    along lanes. Out-of-range taps get zero axis-weight (BORDER_CONSTANT)."""
    map_row = np.asarray(map_row, np.float32)
    map_col = np.asarray(map_col, np.float32)
    out_rows, out_cols = map_row.shape
    r0 = np.floor(map_row)
    c0 = np.floor(map_col)
    ar = map_row - r0
    ac = map_col - c0

    def axis_w(i0, frac, n):
        w0 = (1.0 - frac) * ((i0 >= 0) & (i0 <= n - 1))
        w1 = frac * ((i0 + 1 >= 0) & (i0 + 1 <= n - 1))
        return w0.astype(np.float32), w1.astype(np.float32)

    w_r0, w_r1 = axis_w(r0, ar, rf_rows)
    w_c0, w_c1 = axis_w(c0, ac, rf_cols)
    # clip indices so the one-hot compare stays in the padded iota range
    r0c = np.clip(r0, -1, rf_rows - 1).astype(np.float32)
    c0c = np.clip(c0, -1, rf_cols - 1).astype(np.float32)

    w_pad = _round_up(out_cols, LANES)
    table = np.zeros((out_rows, 8, w_pad), np.float32)
    table[:, 0, :out_cols] = r0c
    table[:, 1, :out_cols] = w_r0
    table[:, 2, :out_cols] = w_r1
    table[:, 3, :out_cols] = c0c
    table[:, 4, :out_cols] = w_c0
    table[:, 5, :out_cols] = w_c1
    return table


TILE_I = 8  # output rows per grid step (sublane-aligned output blocks)


WINDOW_GRAN = 128  # RF-row window start granularity (lane-dim multiple)


def pack_scan_maps_banded(map_row, map_col, rf_rows: int, rf_cols: int,
                          band_k: int = 256):
    """Split/banded packing for scan conversion (VERDICT r4 item 7).

    The polar geometry is STATIC, and MEASURED per 8-output-row block the
    RF-row tap span runs 221 rows at the fan apex down to 10 at depth
    (apex rows cross many wavefront radii). So a single narrow band cannot
    serve the whole image — instead:

    - blocks whose span fits a ``band_k``-row window starting at any
      WINDOW_GRAN multiple go to the BANDED kernel, whose RF operand is an
      extended array of materialised overlapping windows (each window is
      exactly one (c_pad, band_k) block, so the BlockSpec index selects it
      with no alignment constraint beyond the 128-row start granularity);
    - the remaining PREFIX of apex blocks keeps the full-contraction
      kernel.

    For the reference 465x512 -> 400x500 geometry, blocks 7..49 fit
    band_k=256: formulation FLOPs drop 107 -> ~61 GFLOP/frame.

    Returns (table, j_windows, band_k, split): table has RELATIVE row
    indices for blocks >= split (absolute for the prefix); j_windows
    (n_blocks,) int32 window ids (start = j*WINDOW_GRAN... stored in
    band_k-block units of the extended operand); split = first banded
    block."""
    map_row = np.asarray(map_row, np.float32)
    out_rows, _ = map_row.shape
    n_blocks = _round_up(out_rows, TILE_I) // TILE_I
    table = pack_scan_maps(map_row, map_col, rf_rows, rf_cols)
    if table.shape[0] != n_blocks * TILE_I:
        table = np.pad(
            table, ((0, n_blocks * TILE_I - table.shape[0]), (0, 0), (0, 0))
        )
    r0 = table[:, 0, :]
    w0 = table[:, 1, :]
    w1 = table[:, 2, :]
    starts = np.zeros((n_blocks,), np.int64)
    fits = np.zeros((n_blocks,), bool)
    for b in range(n_blocks):
        sl = slice(b * TILE_I, (b + 1) * TILE_I)
        taps = []
        rr, ww0, ww1 = r0[sl], w0[sl], w1[sl]
        if (ww0 > 0).any():
            taps.append((rr[ww0 > 0].min(), rr[ww0 > 0].max()))
        if (ww1 > 0).any():
            taps.append((rr[ww1 > 0].min() + 1, rr[ww1 > 0].max() + 1))
        if not taps:
            fits[b] = True
            continue
        rmin = int(min(t[0] for t in taps))
        rmax = int(max(t[1] for t in taps))
        s = (rmin // WINDOW_GRAN) * WINDOW_GRAN
        if rmax < s + band_k:
            fits[b] = True
            starts[b] = s
    # largest suffix of fitting blocks goes banded; apex prefix stays full
    split = n_blocks
    for b in range(n_blocks - 1, -1, -1):
        if not fits[b]:
            break
        split = b
    j_windows = (starts // WINDOW_GRAN).astype(np.int32)
    # relativise banded blocks' row indices; zero-weight taps clip to -1
    # (matches no iota row, contributes exactly 0)
    table = table.copy()
    for b in range(split, n_blocks):
        sl = slice(b * TILE_I, (b + 1) * TILE_I)
        dead = (table[sl, 1, :] == 0.0) & (table[sl, 2, :] == 0.0)
        rel = table[sl, 0, :] - float(starts[b])
        table[sl, 0, :] = np.where(
            dead, -1.0, np.clip(rel, -1.0, band_k - 1.0)
        ).astype(np.float32)
    return table, j_windows, band_k, split


def _scanconv_banded_kernel(
    j_ref, maps_ref, rft_ref, out_ref, *, band_k: int, c_pad: int,
    w_pad: int, precision
):
    """Forward banded kernel: identical math to _scanconv_kernel, but the
    RF operand block is this output block's (c_pad, band_k) row window
    (selected via the scalar-prefetched per-block window table in the
    BlockSpec index_map), so the MXU contraction is band_k instead of the
    padded full row count."""
    del j_ref  # consumed by the index_map only
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (band_k, w_pad), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_pad, w_pad), 0)
    rft = rft_ref[:]
    rows = []
    for k in range(TILE_I):
        r0 = maps_ref[k, 0, :].reshape(1, w_pad).astype(jnp.int32)
        w_r0 = maps_ref[k, 1, :].reshape(1, w_pad)
        w_r1 = maps_ref[k, 2, :].reshape(1, w_pad)
        c0 = maps_ref[k, 3, :].reshape(1, w_pad).astype(jnp.int32)
        w_c0 = maps_ref[k, 4, :].reshape(1, w_pad)
        w_c1 = maps_ref[k, 5, :].reshape(1, w_pad)
        rhot = jnp.where(iota_r == r0, w_r0, 0.0) + jnp.where(
            iota_r == r0 + 1, w_r1, 0.0
        )
        v = jax.lax.dot_general(
            rft, rhot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (c_pad, w_pad)
        chot = jnp.where(iota_c == c0, w_c0, 0.0) + jnp.where(
            iota_c == c0 + 1, w_c1, 0.0
        )
        rows.append(jnp.sum(v * chot, axis=0, keepdims=True))
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _scanconv_banded_bwd_kernel(
    maps_ref, g_ref, out_ref, *, band_k: int, c_pad: int, w_pad: int,
    precision
):
    """Transpose: each program writes ITS OWN (band_k, c_pad) window
    gradient; overlapping windows are summed outside with static offsets."""
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (band_k, w_pad), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_pad, w_pad), 0)
    acc = jnp.zeros((band_k, c_pad), jnp.float32)
    for k in range(TILE_I):
        r0 = maps_ref[k, 0, :].reshape(1, w_pad).astype(jnp.int32)
        w_r0 = maps_ref[k, 1, :].reshape(1, w_pad)
        w_r1 = maps_ref[k, 2, :].reshape(1, w_pad)
        c0 = maps_ref[k, 3, :].reshape(1, w_pad).astype(jnp.int32)
        w_c0 = maps_ref[k, 4, :].reshape(1, w_pad)
        w_c1 = maps_ref[k, 5, :].reshape(1, w_pad)
        gk = g_ref[k, :].reshape(1, w_pad)
        rhot = jnp.where(iota_r == r0, w_r0, 0.0) + jnp.where(
            iota_r == r0 + 1, w_r1, 0.0
        )
        cg = (
            jnp.where(iota_c == c0, w_c0, 0.0)
            + jnp.where(iota_c == c0 + 1, w_c1, 0.0)
        ) * gk
        acc = acc + jax.lax.dot_general(
            rhot, cg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (band_k, c_pad)
    out_ref[0] = acc


@functools.lru_cache(maxsize=None)
def _scanconv_banded_op(out_rows: int, out_cols: int, band_k: int, split: int,
                        j_bytes: bytes, interpret: bool, precision_str: str):
    precision = jax.lax.Precision(precision_str)
    j_windows = np.frombuffer(j_bytes, np.int32)
    n_blocks = j_windows.shape[0]
    n_banded = n_blocks - split
    # window ids used by the banded suffix, remapped densely so the
    # extended operand materialises only the needed windows
    used = sorted(set(int(j) for j in j_windows[split:])) or [0]
    wmap = {w: k for k, w in enumerate(used)}
    j_local = tuple(wmap[int(j)] for j in j_windows[split:])
    n_win = len(used)

    def _ext_windows(rft, r_pad2):
        # (c_pad, n_win * band_k): materialised overlapping row windows,
        # each exactly one (c_pad, band_k) block of the banded kernel
        c_pad = rft.shape[0]
        need = max(w * WINDOW_GRAN + band_k for w in used)
        if need > rft.shape[1]:
            rft = jnp.pad(rft, ((0, 0), (0, need - rft.shape[1])))
        return jnp.concatenate(
            [rft[:, w * WINDOW_GRAN : w * WINDOW_GRAN + band_k] for w in used],
            axis=1,
        )

    def fwd_call(rf, table):
        rf_rows, rf_cols = rf.shape
        # the table is padded to whole TILE_I blocks; out_rows is the REAL
        # output height (e.g. 100 -> 13 blocks of 104 padded rows)
        out_rows_real = out_rows
        w_pad = table.shape[2]
        r_pad = _round_up(rf_rows, 8)
        c_pad = _round_up(rf_cols, 8)
        rft = jnp.zeros((c_pad, r_pad), rf.dtype).at[:rf_cols, :rf_rows].set(rf.T)

        parts = []
        if split > 0:
            kernel = functools.partial(
                _scanconv_kernel,
                r_pad=r_pad, c_pad=c_pad, w_pad=w_pad, precision=precision,
            )
            parts.append(pl.pallas_call(
                kernel,
                grid=(split,),
                in_specs=[
                    pl.BlockSpec(
                        (TILE_I, 8, w_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (c_pad, r_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (TILE_I, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (split * TILE_I, w_pad), jnp.float32
                ),
                interpret=interpret,
            )(table[: split * TILE_I], rft))
        if n_banded > 0:
            ext = _ext_windows(rft, r_pad)
            kernel = functools.partial(
                _scanconv_banded_kernel,
                band_k=band_k, c_pad=c_pad, w_pad=w_pad, precision=precision,
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_banded,),
                in_specs=[
                    pl.BlockSpec(
                        (TILE_I, 8, w_pad), lambda i, j_ref: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (c_pad, band_k),
                        lambda i, j_ref: (0, j_ref[i]),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (TILE_I, w_pad), lambda i, j_ref: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            )
            parts.append(pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (n_banded * TILE_I, w_pad), jnp.float32
                ),
                interpret=interpret,
            )(
                jnp.asarray(j_local, jnp.int32),
                table[split * TILE_I :],
                ext,
            ))
        out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        return out[:out_rows_real, :out_cols]

    def bwd_call(table, g, rf_shape):
        rf_rows, rf_cols = rf_shape
        out_rows_real = out_rows
        w_pad = table.shape[2]
        r_pad = _round_up(rf_rows, 8)
        c_pad = _round_up(rf_cols, 8)
        g_p = jnp.zeros((n_blocks * TILE_I, w_pad), jnp.float32).at[
            :out_rows_real, :out_cols
        ].set(g)
        grad_t = jnp.zeros((r_pad, c_pad), jnp.float32)
        if split > 0:
            kernel = functools.partial(
                _scanconv_bwd_kernel,
                r_pad=r_pad, c_pad=c_pad, w_pad=w_pad, precision=precision,
            )
            grad_t = grad_t + pl.pallas_call(
                kernel,
                grid=(split,),
                in_specs=[
                    pl.BlockSpec(
                        (TILE_I, 8, w_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (TILE_I, w_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (r_pad, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((r_pad, c_pad), jnp.float32),
                interpret=interpret,
            )(table[: split * TILE_I], g_p[: split * TILE_I])
        if n_banded > 0:
            kernel = functools.partial(
                _scanconv_banded_bwd_kernel,
                band_k=band_k, c_pad=c_pad, w_pad=w_pad, precision=precision,
            )
            wins = pl.pallas_call(
                kernel,
                grid=(n_banded,),
                in_specs=[
                    pl.BlockSpec(
                        (TILE_I, 8, w_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (TILE_I, w_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, band_k, c_pad), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (n_banded, band_k, c_pad), jnp.float32
                ),
                interpret=interpret,
            )(table[split * TILE_I :], g_p[split * TILE_I :])
            need = max(w * WINDOW_GRAN + band_k for w in used)
            pad_t = jnp.zeros((max(need, r_pad), c_pad), jnp.float32)
            for bi in range(n_banded):
                off = int(j_windows[split + bi]) * WINDOW_GRAN
                pad_t = pad_t.at[off : off + band_k, :].add(wins[bi])
            grad_t = grad_t + pad_t[:r_pad]
        return grad_t[:rf_rows, :rf_cols]

    @jax.custom_vjp
    def op(rf, table):
        return fwd_call(rf, table)

    def op_fwd(rf, table):
        return fwd_call(rf, table), (rf, table)

    def op_bwd(res, g):
        rf, table = res
        return bwd_call(table, g, rf.shape), jnp.zeros_like(table)

    op.defvjp(op_fwd, op_bwd)
    return op


def scan_convert_banded(
    rf: jax.Array,
    table: jax.Array,   # (out_rows_pad, 8, w_pad) from pack_scan_maps_banded
    j_windows: np.ndarray,
    out_cols: int,
    *,
    band_k: int,
    split: int,
    out_rows: int | None = None,
    interpret: bool = False,
    precision: str = "default",
):
    """Split/banded MXU scan conversion — same contract and gradients as
    scan_convert_pallas with ~0.57x its formulation FLOPs for the default
    geometry (apex prefix at full contraction + banded suffix at band_k).
    ``j_windows`` must be the host numpy array from pack_scan_maps_banded
    (inlined as a constant — tiny, pack-time static). ``out_rows`` is the
    REAL output height when it is not a TILE_I multiple (the banded table
    is padded to whole blocks)."""
    j_bytes = np.asarray(j_windows, np.int32).tobytes()
    n_blocks = np.asarray(j_windows).shape[0]
    if out_rows is None:
        out_rows = n_blocks * TILE_I
    return _scanconv_banded_op(
        out_rows, out_cols, band_k, split, j_bytes, interpret, precision
    )(rf, table)


def _scanconv_kernel(
    maps_ref, rft_ref, out_ref, *, r_pad: int, c_pad: int, w_pad: int, precision
):
    # Mosaic iota is integer-only; indices in the f32 table are exact ints
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r_pad, w_pad), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_pad, w_pad), 0)
    rft = rft_ref[:]
    rows = []
    for k in range(TILE_I):  # static unroll: one MXU pass per output row
        r0 = maps_ref[k, 0, :].reshape(1, w_pad).astype(jnp.int32)
        w_r0 = maps_ref[k, 1, :].reshape(1, w_pad)
        w_r1 = maps_ref[k, 2, :].reshape(1, w_pad)
        c0 = maps_ref[k, 3, :].reshape(1, w_pad).astype(jnp.int32)
        w_c0 = maps_ref[k, 4, :].reshape(1, w_pad)
        w_c1 = maps_ref[k, 5, :].reshape(1, w_pad)

        # row one-hot (r_pad, w_pad): weight of RF row r for output column j
        rhot = jnp.where(iota_r == r0, w_r0, 0.0) + jnp.where(
            iota_r == r0 + 1, w_r1, 0.0
        )
        # V[c, j] = sum_r RF^T[c, r] * rhot[r, j]  — the MXU pass
        v = jax.lax.dot_general(
            rft, rhot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (c_pad, w_pad)
        # column selector and reduction over c (sublanes)
        chot = jnp.where(iota_c == c0, w_c0, 0.0) + jnp.where(
            iota_c == c0 + 1, w_c1, 0.0
        )
        rows.append(jnp.sum(v * chot, axis=0, keepdims=True))
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _scanconv_bwd_kernel(
    maps_ref, g_ref, out_ref, *, r_pad: int, c_pad: int, w_pad: int, precision
):
    """Transpose of _scanconv_kernel: accumulate rhot @ (chot * g)^T into the
    RF-image cotangent across the output-row grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r_pad, w_pad), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c_pad, w_pad), 0)
    acc = jnp.zeros((r_pad, c_pad), jnp.float32)
    for k in range(TILE_I):
        r0 = maps_ref[k, 0, :].reshape(1, w_pad).astype(jnp.int32)
        w_r0 = maps_ref[k, 1, :].reshape(1, w_pad)
        w_r1 = maps_ref[k, 2, :].reshape(1, w_pad)
        c0 = maps_ref[k, 3, :].reshape(1, w_pad).astype(jnp.int32)
        w_c0 = maps_ref[k, 4, :].reshape(1, w_pad)
        w_c1 = maps_ref[k, 5, :].reshape(1, w_pad)
        gk = g_ref[k, :].reshape(1, w_pad)

        rhot = jnp.where(iota_r == r0, w_r0, 0.0) + jnp.where(
            iota_r == r0 + 1, w_r1, 0.0
        )
        cg = (
            jnp.where(iota_c == c0, w_c0, 0.0)
            + jnp.where(iota_c == c0 + 1, w_c1, 0.0)
        ) * gk
        acc = acc + jax.lax.dot_general(
            rhot, cg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (r_pad, c_pad)
    out_ref[:] += acc


@functools.lru_cache(maxsize=None)
def _scanconv_op(out_cols: int, interpret: bool, precision_str: str):
    precision = jax.lax.Precision(precision_str)

    def fwd_call(rf, table):
        rf_rows, rf_cols = rf.shape
        out_rows = table.shape[0]
        w_pad = table.shape[2]
        r_pad = _round_up(rf_rows, 8)
        c_pad = _round_up(rf_cols, 8)
        rft = jnp.zeros((c_pad, r_pad), rf.dtype).at[:rf_cols, :rf_rows].set(rf.T)

        rows_pad = _round_up(out_rows, TILE_I)
        if rows_pad != table.shape[0]:
            table = jnp.pad(table, ((0, rows_pad - out_rows), (0, 0), (0, 0)))

        kernel = functools.partial(
            _scanconv_kernel,
            r_pad=r_pad, c_pad=c_pad, w_pad=w_pad, precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=(rows_pad // TILE_I,),
            in_specs=[
                pl.BlockSpec(
                    (TILE_I, 8, w_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((c_pad, r_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_I, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((rows_pad, w_pad), jnp.float32),
            interpret=interpret,
        )(table, rft)
        return out[:out_rows, :out_cols]

    def bwd_call(table, g, rf_shape):
        rf_rows, rf_cols = rf_shape
        out_rows = table.shape[0]
        w_pad = table.shape[2]
        r_pad = _round_up(rf_rows, 8)
        c_pad = _round_up(rf_cols, 8)
        rows_pad = _round_up(out_rows, TILE_I)
        if rows_pad != table.shape[0]:
            table = jnp.pad(table, ((0, rows_pad - out_rows), (0, 0), (0, 0)))
        g_p = jnp.zeros((rows_pad, w_pad), jnp.float32).at[
            :out_rows, :out_cols
        ].set(g)

        kernel = functools.partial(
            _scanconv_bwd_kernel,
            r_pad=r_pad, c_pad=c_pad, w_pad=w_pad, precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=(rows_pad // TILE_I,),
            in_specs=[
                pl.BlockSpec(
                    (TILE_I, 8, w_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((TILE_I, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (r_pad, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((r_pad, c_pad), jnp.float32),
            interpret=interpret,
        )(table, g_p)
        return out[:rf_rows, :rf_cols]

    @jax.custom_vjp
    def op(rf, table):
        return fwd_call(rf, table)

    def op_fwd(rf, table):
        return fwd_call(rf, table), (rf, table)

    def op_bwd(res, g):
        rf, table = res
        return bwd_call(table, g, rf.shape), jnp.zeros_like(table)

    op.defvjp(op_fwd, op_bwd)
    return op


def scan_convert_pallas(
    rf: jax.Array,
    table: jax.Array,  # (out_rows, 8, w_pad) from pack_scan_maps
    out_cols: int,
    *,
    interpret: bool = False,
    precision: str = "default",
):
    """Bilinear polar->Cartesian remap, MXU formulation. Same contract as
    imaging.scan_convert for maps produced by scan_conversion_maps, and
    differentiable in ``rf`` via the transposed-interpolation kernel.

    precision="highest" is f32-exact (bf16x3 MXU passes, ~3x MXU time);
    "default" rounds operands to bf16 — relative error <= 2^-9 ~ 0.2%,
    below the 8-bit PNG quantization step of the final B-mode."""
    return _scanconv_op(out_cols, interpret, precision)(rf, table)
