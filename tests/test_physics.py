"""Unit tests for the acoustic physics kernel against closed-form values
(SURVEY.md §4 test plan: Snell/Fresnel at normal incidence, Beer-Lambert,
power-cosine moments, vascular state machine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import SimConfig
from mcray_tpu.ops import physics
from mcray_tpu.ops.geometry import normalize


def test_travel_attenuation_beer_lambert():
    # I *= exp(-att * mm * 0.01 * f)  (reference src/ray.cpp:99-103)
    out = physics.travel_attenuation(jnp.float32(0.7), jnp.float32(20.0), 4.5)
    np.testing.assert_allclose(out, np.exp(-0.7 * 20.0 * 0.01 * 4.5), rtol=1e-6)


def test_max_ray_length_formula():
    out = physics.max_ray_length(jnp.float32(0.5), jnp.float32(0.7), 4.5, 1e-10)
    expected = 10.0 * np.log(1e-10 / 0.5) / -0.7 * 4.5
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_snell_normal_incidence_goes_straight():
    d = jnp.array([[0.0, 0.0, 1.0]])
    n = jnp.array([[0.0, 0.0, -1.0]])
    inc = jnp.array([1.0])  # cos 0
    ratio = jnp.array([0.8])
    refr = jnp.sqrt(1.0 - ratio**2 * (1.0 - inc**2))
    out = physics.snells_law(d, n, inc, refr, ratio)
    out = normalize(out)
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0, 1.0]], atol=1e-6)


def test_snell_matches_sines_ratio():
    # sin(theta_t)/sin(theta_i) == Z1/Z2 (the reference's refr_ratio convention)
    theta_i = 0.5
    d = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    inc = jnp.abs(jnp.sum(d * n, axis=-1))
    ratio = jnp.array([0.7])
    refr = jnp.sqrt(1.0 - ratio**2 * (1.0 - inc**2))
    # normal opposing the ray (d.n < 0), the textbook orientation the
    # reference's flip-to-positive incidence assumes
    t = normalize(physics.snells_law(d, n, inc, refr, ratio))
    sin_t = np.abs(np.asarray(t)[0, 0])
    np.testing.assert_allclose(sin_t, 0.7 * np.sin(theta_i), rtol=1e-5)


def test_reflection_intensity_normal_incidence():
    # ((Z1-Z2)/(Z1+Z2))^2 at normal incidence (src/ray.cpp:126-132)
    out = physics.reflection_intensity(
        jnp.float32(1.0), jnp.float32(1.38), jnp.float32(1.0), jnp.float32(1.65), jnp.float32(1.0)
    )
    np.testing.assert_allclose(out, ((1.38 - 1.65) / (1.38 + 1.65)) ** 2, rtol=1e-6)


def test_power_cosine_variate_moments():
    # E[u^(1/(s+1))] = (s+1)/(s+2) for u~U(0,1)
    key = jax.random.PRNGKey(0)
    s = jnp.float32(5.0)
    samples = physics.power_cosine_variate(key, s, (200_000,))
    np.testing.assert_allclose(samples.mean(), 6.0 / 7.0, atol=2e-3)
    assert samples.min() >= 0.0 and samples.max() <= 1.0


def test_power_cosine_high_shininess_is_specular():
    key = jax.random.PRNGKey(1)
    samples = physics.power_cosine_variate(key, jnp.float32(1_000_000.0), (1000,))
    assert float(samples.min()) > 0.99998


def test_random_unit_vector_cone_angle():
    # The reference construction (src/ray.cpp:167-211) yields
    # dot(w, v) = cos_theta - 2*b*vx*px*cos_theta with E[px] = 0, i.e. the
    # polar angle holds only in expectation (a reference quirk we replicate).
    key = jax.random.PRNGKey(2)
    n = 20_000
    v = normalize(jnp.array([[0.3, -0.5, 0.8]] * n, jnp.float32))
    cos_theta = jnp.full((n,), 0.9, jnp.float32)
    w = physics.random_unit_vector(key, v, cos_theta)
    dots = np.asarray(jnp.sum(w * v, axis=-1))
    np.testing.assert_allclose(dots.mean(), 0.9, atol=5e-3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=-1).mean(), 1.0, atol=0.05)


def test_random_unit_vector_swap_branch():
    # exercise |vx| > |vy| (the component-swap path, src/ray.cpp:188-209)
    key = jax.random.PRNGKey(3)
    n = 20_000
    v = normalize(jnp.array([[0.9, 0.1, 0.42]] * n, jnp.float32))
    cos_theta = jnp.full((n,), 0.95, jnp.float32)
    w = physics.random_unit_vector(key, v, cos_theta)
    dots = np.asarray(jnp.sum(w * v, axis=-1))
    np.testing.assert_allclose(dots.mean(), 0.95, atol=5e-3)


def test_random_unit_vector_specular_limit():
    # cos_theta -> 1 collapses the cone: w == v (the shininess=1e6 case that
    # dominates the shipped scenes)
    key = jax.random.PRNGKey(4)
    v = normalize(jnp.array([[0.3, -0.5, 0.8]] * 100, jnp.float32))
    w = physics.random_unit_vector(key, v, jnp.full((100,), 0.999999, jnp.float32))
    np.testing.assert_allclose(np.asarray(w), np.asarray(v), atol=5e-3)


@pytest.mark.parametrize("bug_compat", [False, True])
def test_material_transition_cases(bug_compat):
    cfg = SimConfig(bug_compat_material_transition=bug_compat)
    f = lambda mid, moid, vasc, m_in, m_out: tuple(
        np.asarray(x)
        for x in physics.material_transition(
            jnp.array([mid]), jnp.array([moid]), jnp.array([vasc]),
            jnp.array([m_in]), jnp.array([m_out]), cfg,
        )
    )
    # outside, hit vessel (mesh: inside=BLOOD(3), outside=FAT(1)), in tissue 2
    m, o = f(2, -1, True, 3, 1)
    assert (m[0], o[0]) == (3, 2)
    # inside vessel (media 3, outside 2), hit the vessel again -> leave
    m, o = f(3, 2, True, 3, 1)
    assert (m[0], o[0]) == (2, -1)
    # inside vessel, cross a non-vascular boundary whose inside matches stored
    m, o = f(3, 2, False, 2, 5)
    assert (m[0], o[0]) == (3, 5)
    # outside, hit regular organ from outside (media==outside material)
    m, o = f(1, -1, False, 4, 1)
    assert (m[0], o[0]) == (4, -1)
    # outside, hit regular organ from INSIDE (media==inside material):
    # sane mode exits to outside material; bug-compat stays inside
    m, o = f(4, -1, False, 4, 1)
    assert (m[0], o[0]) == ((4, -1) if bug_compat else (1, -1))


def _hit_boundary(materials, mesh_tables, cfg, direction, normal, intensity, media_id, seed=0):
    n = direction.shape[0]
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.PRNGKey(seed), jnp.arange(n, dtype=jnp.uint32)
    )
    return physics.hit_boundary(
        keys,
        direction,
        jnp.zeros((n, 3)),
        normal,
        intensity,
        media_id,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.int32),
        materials,
        mesh_tables["inside"],
        mesh_tables["outside"],
        mesh_tables["vascular"],
        cfg,
    )


def _simple_scene():
    # materials: 0 = water-ish (Z 1.5), 1 = bone-ish (Z 7.8)
    materials = jnp.array(
        [
            [1.5, 0.5, 0.1, 0.2, 0.1, 1.0, 1e6, 0.0],
            [7.8, 5.0, 0.78, 0.56, 0.1, 1.0, 1e6, 0.0],
        ],
        jnp.float32,
    )
    tables = {
        "inside": jnp.array([1], jnp.int32),
        "outside": jnp.array([0], jnp.int32),
        "vascular": jnp.array([False]),
    }
    return materials, tables


def test_hit_boundary_energy_conservation():
    materials, tables = _simple_scene()
    cfg = SimConfig()
    n = 256
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out = _hit_boundary(
        materials, tables, cfg, d, nrm, jnp.full((n,), 0.5), jnp.zeros((n,), jnp.int32)
    )
    # continued intensity never exceeds incoming
    assert float(out["new_intensity"].max()) <= 0.5 + 1e-6
    assert np.isfinite(np.asarray(out["back_intensity"])).all()
    # with shininess 1e6 the perturbed normal ~= surface normal, so the
    # reflect fraction should match Fresnel at normal incidence
    frac = float(out["chose_reflection"].mean())
    fresnel = ((1.5 - 7.8) / (1.5 + 7.8)) ** 2
    assert abs(frac - fresnel) < 0.1


def test_hit_boundary_tir_no_nan():
    # grazing incidence from high-Z to low-Z triggers TIR; reference would NaN
    materials, tables = _simple_scene()
    cfg = SimConfig()
    n = 64
    theta = 1.4  # near-grazing
    d = jnp.tile(
        jnp.array([[np.sin(theta), 0.0, np.cos(theta)]], jnp.float32), (n, 1)
    )
    nrm = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out = _hit_boundary(
        materials, tables, cfg, d, nrm, jnp.full((n,), 1.0), jnp.ones((n,), jnp.int32)
    )
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"NaN in {k}"
