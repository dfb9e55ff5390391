"""Fused conv+envelope Pallas kernel vs the jnp pipeline (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import SimConfig, small_test_config
from mcray_tpu.ops import imaging
from mcray_tpu.ops.pallas.postproc import convolve_envelope_pallas


@pytest.mark.parametrize("shape", [(465, 512), (465, 64), (60, 128)])
def test_fused_postproc_matches_jnp(rng, shape):
    cfg = SimConfig()
    rf = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = np.asarray(imaging.envelope(imaging.convolve_psf(rf, cfg)))
    out = np.asarray(convolve_envelope_pallas(rf, cfg, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_postproc_sparse_rf(rng):
    # realistic sparse RF (mostly zeros + a few echoes) exercises the
    # no-peak / tail-after-last-peak paths
    cfg = small_test_config()
    rf = np.zeros((cfg.rf_rows, 64), np.float32)
    n = 200
    rf[rng.integers(0, cfg.rf_rows, n), rng.integers(0, 64, n)] = rng.standard_normal(n)
    ref = np.asarray(imaging.envelope(imaging.convolve_psf(jnp.asarray(rf), cfg)))
    out = np.asarray(convolve_envelope_pallas(jnp.asarray(rf), cfg, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
