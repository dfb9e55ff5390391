"""March + echo accumulation vs a direct sequential port of the reference's
per-segment marching loop (reference src/main.cpp:106-141) — the same
oracle-style parity evidence as the imaging tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcray_tpu.config import small_test_config
from mcray_tpu.models.simulator import march_and_accumulate


def oracle_march(segments, materials, volume, cfg):
    """Line-by-line port of the reference main loop for table-mode volumes."""
    rf = np.zeros((cfg.rf_rows, cfg.rf_cols), np.float32)
    d, n = segments["valid"].shape
    axres = cfg.axial_resolution_mm
    dt = cfg.march_dt_us
    rdt = cfg.rf_row_dt_us
    res = cfg.resolution_um / 1000.0
    size = cfg.volume_size
    noise = np.asarray(volume["noise"])
    prob = np.asarray(volume["prob"])
    mats = np.asarray(materials)

    def scattering(density, mu, sigma, p):
        idx = []
        for x in p:
            q = int(np.trunc(np.float32(x) / np.float32(res)))
            idx.append(((q % size) + size) % size)
        v_p = prob[idx[0], idx[1], idx[2]]
        return noise[idx[0], idx[1], idx[2]] * sigma + mu if v_p >= density else 0.0

    for di in range(d):
        for pi in range(n):
            if not bool(segments["valid"][di, pi]):
                continue
            frm = np.asarray(segments["from"][di, pi], np.float32)
            to = np.asarray(segments["to"][di, pi], np.float32)
            dire = np.asarray(segments["direction"][di, pi], np.float32)
            col = int(segments["element"][di, pi])
            media = int(segments["media_id"][di, pi])
            att = float(segments["attenuation"][di, pi])
            mu0, mu1, sigma = mats[media, 2], mats[media, 3], mats[media, 4]

            dist = np.float32(np.linalg.norm(frm - to) * 10.0)
            steps = int(dist / axres)  # trunc, like (unsigned int) cast
            t0 = float(segments["distance"][di, pi]) * 1000.0 / cfg.speed_of_sound
            point = frm.copy()
            t = t0
            inten = float(segments["initial"][di, pi])
            step_factor = float(np.exp(np.float32(-att * axres * 0.01 * cfg.transducer_frequency)))
            for _ in range(steps):
                if t >= cfg.max_travel_time_us:
                    break
                scat = scattering(mu1, mu0, sigma, point)
                row = int(t / rdt)
                if row < cfg.rf_rows:
                    rf[row, col] += inten * scat
                point = point + np.float32(axres) * dire
                t += dt
                inten *= step_factor
            # boundary echo; steps==0 underflows in the reference -> dropped
            if steps >= 1:
                bt = t0 + dt * (steps - 1)
                row = int(bt / rdt)
                if row < cfg.rf_rows:
                    rf[row, col] += float(segments["reflected"][di, pi]) / cfg.samples_per_element
    return rf


@pytest.fixture(scope="module")
def setup():
    import os

    from mcray_tpu.models.simulator import trace_paths
    from mcray_tpu.ops import texture
    from mcray_tpu.scene.compile import load_and_compile

    cfg = small_test_config(
        transducer_elements=16, samples_per_element=2, texture_mode="table"
    )
    pack = load_and_compile(
        os.path.join(os.path.dirname(__file__), "..", "assets", "sphere", "sphere.scene"),
        cfg,
    )
    scene = {k: jnp.asarray(v) for k, v in pack.trace_tables().items()}
    mats = jnp.asarray(pack.materials)
    segs = trace_paths(
        jax.random.PRNGKey(0), mats,
        jnp.asarray(pack.transducer_position), jnp.asarray(pack.transducer_angles),
        scene, jnp.asarray(pack.spacing), jnp.int32(pack.starting_material), cfg,
    )
    vol = texture.make_texture_volume(jax.random.PRNGKey(1), cfg)
    return cfg, mats, segs, vol


def test_march_matches_sequential_oracle(setup):
    cfg, mats, segs, vol = setup
    ours = np.asarray(march_and_accumulate(segs, mats, vol, cfg))
    ref = oracle_march(segs, mats, vol, cfg)
    assert ref.sum() != 0.0
    # The reference accumulates time iteratively (time_elapsed += time_step,
    # src/main.cpp:132) while we index rows in closed form (t0 + k*dt); the
    # last-ulp difference can flip an occasional echo across a row boundary.
    # Require exact agreement for >99.5% of occupied cells and tight values
    # elsewhere.
    diff = np.abs(ours - ref)
    occupied = (ref != 0) | (ours != 0)
    mismatched = (diff > 1e-4).sum()
    assert mismatched <= max(1, int(0.005 * occupied.sum())), mismatched
    close = diff <= 1e-4
    np.testing.assert_allclose(ours[close], ref[close], rtol=2e-3, atol=1e-4)
