"""Worker process for the 2-process jax.distributed smoke test.

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices (4 global), initialises
jax.distributed over gloo CPU collectives, renders the sphere scene with
the scanline-sharded ShardedRenderer over the GLOBAL mesh, and compares
the (replicated) B-mode against a local single-device Simulator render.
This executes the real multi-host code path the reference never had
(SURVEY.md §2.3 item 3: DCN across hosts): process-spanning mesh,
cross-process all_gather of RF columns inside shard_map.

Prints "PARITY_OK <maxdiff>" on success; any exception exits non-zero.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    proc_id = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from mcray_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert multihost.is_primary() == (proc_id == 0)

    import numpy as np

    from mcray_tpu.config import small_test_config
    from mcray_tpu.models.simulator import Simulator
    from mcray_tpu.parallel.shard import ShardedRenderer

    cfg = small_test_config()  # 64 elements -> 16 per device on 4 devices
    here = os.path.dirname(__file__)
    from mcray_tpu.scene.compile import load_and_compile

    pack = load_and_compile(
        os.path.join(here, "..", "assets", "sphere", "sphere.scene"), cfg
    )

    # Global mesh spanning both processes; the RF-column all_gather and the
    # B-mode replication cross the process boundary via gloo collectives.
    mesh = multihost.global_mesh()
    assert mesh.devices.size == 2 * nproc
    sharded = ShardedRenderer(pack, cfg, mesh=mesh)
    bmode = sharded.render_frame(0)["bmode"]  # out_specs P() -> replicated

    # Local single-device reference (no collectives involved).
    ref = np.asarray(Simulator(pack, cfg).render_frame(0)["bmode"])

    got = np.asarray(bmode)
    maxdiff = float(np.max(np.abs(got - ref)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # Sharded train step across processes: shard_map AD inserts the psum of
    # material-gradient partials, which must also ride the gloo backend.
    import jax.numpy as jnp
    import optax

    opt = optax.adam(1e-2)
    step = sharded.make_train_step(opt)
    pos = jnp.asarray(pack.transducer_position)
    ang = jnp.asarray(pack.transducer_angles)
    target = sharded.render_bmode(jax.random.PRNGKey(0), sharded.materials, pos, ang)
    mats, _, loss = step(
        jax.random.PRNGKey(1),
        sharded.materials,
        opt.init(sharded.materials),
        target,
        pos,
        ang,
    )
    assert np.isfinite(float(loss)), loss
    assert np.isfinite(np.asarray(mats)).all()

    print(f"PARITY_OK {maxdiff:.3e} loss {float(loss):.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
