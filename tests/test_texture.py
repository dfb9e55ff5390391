"""Scatterer texture volume tests (src/volume.h semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcray_tpu.config import small_test_config
from mcray_tpu.ops import texture


def _vol(cfg, seed=0):
    return texture.make_texture_volume(jax.random.PRNGKey(seed), cfg)


def test_wrap_index_matches_c_unsigned_cast():
    cfg = small_test_config()
    res = cfg.resolution_um / 1000.0
    size = cfg.volume_size
    xs = np.array([-5.2, -0.01, 0.0, 0.07, 1.0, 100.3, -100.3], np.float32)
    ours = np.asarray(texture._wrap_index(jnp.asarray(xs), res, size))
    for x, o in zip(xs, ours):
        # C++: static_cast<unsigned int>(x/res) % size — float truncates
        # toward zero then wraps mod 2^32; size divides 2^32.
        q = int(np.trunc(x / res))
        expected = (q % (1 << 32)) % size
        assert o == expected, (x, o, expected)


def test_threshold_semantics():
    cfg = small_test_config()
    vol = _vol(cfg)
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, 3, (100, 3)), jnp.float32)
    sigma = jnp.full((100,), 0.5)
    mu = jnp.full((100,), 0.2)
    # density below all probabilities -> value everywhere
    lo = texture.get_scattering(vol, jnp.full((100,), -10.0), mu, sigma, pts, cfg)
    assert (np.asarray(lo) != 0).all()
    # density above all -> zero
    hi = texture.get_scattering(vol, jnp.full((100,), 10.0), mu, sigma, pts, cfg)
    assert (np.asarray(hi) == 0).all()


def test_tiling_periodicity():
    cfg = small_test_config()
    vol = _vol(cfg)
    res = cfg.resolution_um / 1000.0
    period = cfg.volume_size * res
    pts = jnp.asarray([[0.01, 0.02, 0.03]], jnp.float32)
    shifted = pts + period
    a = texture.get_scattering(vol, jnp.array([-1.0]), jnp.array([0.0]), jnp.array([1.0]), pts, cfg)
    b = texture.get_scattering(vol, jnp.array([-1.0]), jnp.array([0.0]), jnp.array([1.0]), shifted, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_procedural_field_distribution():
    # the hash+Box-Muller field must be statistically N(0,1) iid per voxel
    import jax.numpy as jnp
    from mcray_tpu.ops.texture import procedural_fields

    n = 200_000
    idx = np.arange(n, dtype=np.int64)
    ix = jnp.asarray(idx % 256, jnp.int32)
    iy = jnp.asarray((idx // 256) % 256, jnp.int32)
    iz = jnp.asarray(idx // 65536, jnp.int32)
    seeds = jnp.array([1234, 5678], jnp.uint32)
    noise, prob = procedural_fields(ix, iy, iz, seeds, 256)
    for field in (np.asarray(noise), np.asarray(prob)):
        assert abs(field.mean()) < 0.01
        assert abs(field.std() - 1.0) < 0.01
        assert abs(np.mean(field**3)) < 0.05          # skewness
        assert abs(np.mean(field**4) - 3.0) < 0.1     # kurtosis
    # noise and prob are uncorrelated
    a, b = np.asarray(noise), np.asarray(prob)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01


def test_bitsum_field_distribution():
    """scatter_rng="bitsum" (dithered-binomial, zero transcendentals) must
    be statistically N(0,1): exact first two moments, no skew, the designed
    ~-0.12 excess kurtosis, CDF within ~7e-3 of Phi, independent fields."""
    import math

    from mcray_tpu.ops.texture import procedural_fields

    n = 200_000
    idx = np.arange(n, dtype=np.int64)
    ix = jnp.asarray(idx % 256, jnp.int32)
    iy = jnp.asarray((idx // 256) % 256, jnp.int32)
    iz = jnp.asarray(idx // 65536, jnp.int32)
    seeds = jnp.array([1234, 5678], jnp.uint32)
    noise, prob = procedural_fields(ix, iy, iz, seeds, 256, rng="bitsum")
    for field in (np.asarray(noise), np.asarray(prob)):
        assert abs(field.mean()) < 0.01
        assert abs(field.std() - 1.0) < 0.01
        assert abs(np.mean(field**3)) < 0.05               # skewness
        assert abs(np.mean(field**4) - 3.0) < 0.2          # kurtosis 2.88
        # empirical CDF vs Phi at the thresholds scene densities live at
        for z in (-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0):
            phi = 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
            emp = float(np.mean(field <= z))
            assert abs(emp - phi) < 8e-3, (z, emp, phi)
    a, b = np.asarray(noise), np.asarray(prob)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01


def test_bitsum_table_bit_identical_to_procedural():
    # the table/procedural bit-identity invariant holds in bitsum mode too
    cfg_t = small_test_config(texture_mode="table", scatter_rng="bitsum")
    cfg_p = small_test_config(scatter_rng="bitsum")
    vol_t = _vol(cfg_t, seed=3)
    vol_p = _vol(cfg_p, seed=3)
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-20, 20, (500, 3)), jnp.float32
    )
    dens = jnp.full((500,), 0.3)
    mu = jnp.full((500,), 0.1)
    sig = jnp.full((500,), 0.7)
    a = texture.get_scattering(vol_t, dens, mu, sig, pts, cfg_t)
    b = texture.get_scattering(vol_p, dens, mu, sig, pts, cfg_p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_table_mode_bit_identical_to_procedural():
    """The materialised table is filled from procedural_fields, so the table
    gather and the on-the-fly hash evaluation agree bit-for-bit at every
    lookup — the invariant that lets the Pallas march kernel serve
    texture_mode='table' without a (size^3) HBM gather."""
    cfg_t = small_test_config(texture_mode="table")
    cfg_p = small_test_config(texture_mode="procedural")
    vol_t = _vol(cfg_t, seed=3)
    vol_p = _vol(cfg_p, seed=3)
    np.testing.assert_array_equal(
        np.asarray(vol_t["seeds"]), np.asarray(vol_p["seeds"])
    )
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-20, 20, (500, 3)), jnp.float32
    )
    dens = jnp.full((500,), 0.3)
    mu = jnp.full((500,), 0.1)
    sig = jnp.full((500,), 0.7)
    a = texture.get_scattering(vol_t, dens, mu, sig, pts, cfg_t)
    b = texture.get_scattering(vol_p, dens, mu, sig, pts, cfg_p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_soft_mode_differentiable():
    cfg = small_test_config(soft_scattering=True, trilinear_texture=True)
    vol = _vol(cfg)
    pts = jnp.asarray([[0.5, 0.6, 0.7], [1.0, 1.1, 1.2]], jnp.float32)

    def f(density):
        return texture.get_scattering(
            vol, jnp.full((2,), density), jnp.array([0.2, 0.2]),
            jnp.array([0.5, 0.5]), pts, cfg,
        ).sum()

    g = jax.grad(f)(0.1)
    assert np.isfinite(float(g)) and float(g) != 0.0
