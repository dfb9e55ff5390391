"""MXU scan-conversion Pallas kernel vs the jnp gather path (interpret mode).

The kernel reformulates the reference's cv::remap bilinear gather
(reference src/rfimage.h:139,183-215) as one-hot matmuls; it must match
imaging.scan_convert to f32 rounding for every probe family's maps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import SimConfig
from mcray_tpu.ops import imaging
from mcray_tpu.ops.pallas.scanconv import (
    pack_scan_maps,
    pack_scan_maps_banded,
    scan_convert_banded,
    scan_convert_pallas,
)


@pytest.mark.parametrize("probe", ["convex", "linear", "phased"])
@pytest.mark.parametrize("precision,rtol,atol", [("highest", 1e-5, 1e-6), ("default", 6e-3, 6e-3)])
def test_scanconv_matches_jnp(rng, probe, precision, rtol, atol):
    cfg = SimConfig(probe_type=probe)
    map_row, map_col = imaging.scan_conversion_maps(cfg)
    rf = rng.standard_normal((cfg.rf_rows, cfg.rf_cols)).astype(np.float32)
    ref = np.asarray(
        imaging.scan_convert(jnp.asarray(rf), jnp.asarray(map_row), jnp.asarray(map_col))
    )
    table = pack_scan_maps(map_row, map_col, cfg.rf_rows, cfg.rf_cols)
    out = np.asarray(
        scan_convert_pallas(
            jnp.asarray(rf), jnp.asarray(table), cfg.bmode_cols,
            interpret=True, precision=precision,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=rtol, atol=atol)


@pytest.mark.parametrize("probe", ["convex", "linear", "phased"])
def test_scanconv_banded_matches_jnp(rng, probe):
    """Split/banded kernel (r5, VERDICT item 7): apex blocks at full
    contraction + deep blocks over 256-row windows must stay f32-exact vs
    the jnp gather path, forward AND gradient, for every probe family."""
    import jax

    cfg = SimConfig(probe_type=probe)
    map_row, map_col = imaging.scan_conversion_maps(cfg)
    rf = jnp.asarray(rng.standard_normal((cfg.rf_rows, cfg.rf_cols)), jnp.float32)
    ref = np.asarray(
        imaging.scan_convert(rf, jnp.asarray(map_row), jnp.asarray(map_col))
    )
    tb, j_w, band_k, split = pack_scan_maps_banded(
        map_row, map_col, cfg.rf_rows, cfg.rf_cols
    )
    out = np.asarray(
        scan_convert_banded(
            rf, jnp.asarray(tb), j_w, cfg.bmode_cols,
            band_k=band_k, split=split, out_rows=cfg.bmode_rows,
            interpret=True, precision="highest",
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def loss_b(rf):
        return jnp.sum(scan_convert_banded(
            rf, jnp.asarray(tb), j_w, cfg.bmode_cols,
            band_k=band_k, split=split, out_rows=cfg.bmode_rows,
            interpret=True, precision="highest",
        ) ** 2)

    def loss_j(rf):
        return jnp.sum(imaging.scan_convert(
            rf, jnp.asarray(map_row), jnp.asarray(map_col)
        ) ** 2)

    gb = np.asarray(jax.grad(loss_b)(rf))
    gj = np.asarray(jax.grad(loss_j)(rf))
    np.testing.assert_allclose(gb, gj, rtol=1e-4, atol=1e-5)


def test_scanconv_border_zero(rng):
    # the convex maps reach outside the RF grid near the sector edges;
    # out-of-range taps must contribute exactly zero (BORDER_CONSTANT)
    cfg = SimConfig()
    map_row, map_col = imaging.scan_conversion_maps(cfg)
    rf = np.ones((cfg.rf_rows, cfg.rf_cols), np.float32)
    table = pack_scan_maps(map_row, map_col, cfg.rf_rows, cfg.rf_cols)
    out = np.asarray(
        scan_convert_pallas(
            jnp.asarray(rf), jnp.asarray(table), cfg.bmode_cols,
            interpret=True, precision="highest",
        )
    )
    # fully-outside pixels exist in the sector corners and must be 0
    fully_out = (
        (map_row < -1)
        | (map_row > cfg.rf_rows)
        | (map_col < -1)
        | (map_col > cfg.rf_cols)
    )
    assert fully_out.any()
    np.testing.assert_array_equal(out[fully_out], 0.0)
    # fully-inside pixels of a constant image stay exactly 1
    fully_in = (
        (map_row >= 0)
        & (map_row <= cfg.rf_rows - 2)
        & (map_col >= 0)
        & (map_col <= cfg.rf_cols - 2)
    )
    np.testing.assert_allclose(out[fully_in], 1.0, rtol=1e-6)
