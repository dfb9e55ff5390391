"""Multi-chip execution: scanline-sharded rendering and training.

The TPU-native parallelism layer the reference lacks entirely (its only
concurrency hooks are two commented-out OpenMP pragmas, reference
src/scene.cpp:74,105; design per SURVEY.md §2.3):

- **Ray/scanline data parallelism**: the R transducer elements are sharded
  over the ``"rays"`` mesh axis with ``jax.shard_map``. Each chip traces its
  R/ndev scanlines (x S Monte-Carlo samples) against the replicated scene.
- **Chip-local RF accumulation**: a scanline's echoes land only in its own
  RF column (reference add_echo indexes column = ray_i, src/rfimage.h:33-40),
  so with a column-sharded RF image the entire scatter-add is chip-local —
  zero communication in the hot loop.
- **Image assembly**: one tiled ``all_gather`` of the (465 x R/ndev) partial
  RF images (~1 MB over ICI) before the dense image post-ops.
- **Gradient communication**: the backward pass of ``psum``-free local work
  produces per-chip partials of the tiny (M, 8) material-parameter gradient;
  ``shard_map``'s AD inserts the ``psum`` over ICI automatically when the
  loss reduces over gathered results.

Per-path RNG keys are derived from GLOBAL path ids (simulator.trace_paths),
so the sharded render is bitwise identical to the single-chip render.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..models import simulator
from ..ops import imaging
from ..probe.transducer import element_layout

Array = jax.Array


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def make_mesh_2d(n_rays: int, n_samples: int) -> Mesh:
    """2-D mesh: scanlines x Monte-Carlo samples (SURVEY.md §2.3 long axes:
    scanlines shard chip-locally; samples are a pure psum reduction axis)."""
    import numpy as np

    devs = np.asarray(jax.devices()[: n_rays * n_samples]).reshape(n_rays, n_samples)
    return Mesh(devs, ("rays", "samples"))


def _shard_render_body(
    key,
    materials,
    positions,      # (R_local, 3) this chip's element positions
    directions,     # (R_local, 3)
    elem_global0,   # (1,) global index of this chip's first element
    state: dict[str, Any],  # replicated device state (scene tables, volume,
    #                         scan maps, optional packed clusters) — threaded
    #                         as an argument, never closed over (see
    #                         Simulator's state-threading note)
    cfg: SimConfig,
    trace_kw: dict,
    axis: str,
    n_shards: int,
    distributed_imaging: bool,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    use_pallas_scanconv: bool = False,
    scan_banded: tuple | None = None,
):
    scene = state["scene"]
    spacing = state["spacing"]
    starting_material = state["starting_material"]
    volume = state["volume"]
    scan_maps = state["scan_maps"]
    if state.get("packed") is not None:
        trace_kw = dict(trace_kw)
        trace_kw["culled_tris"] = (state["packed"], trace_kw.pop("culled_mode"))
    r_local = positions.shape[0]
    s = cfg.samples_per_element
    local_elem = jnp.repeat(jnp.arange(r_local, dtype=jnp.int32), s)
    global_path0 = elem_global0[0].astype(jnp.uint32) * s
    path_ids = global_path0 + jnp.arange(r_local * s, dtype=jnp.uint32)

    segments = simulator.trace_paths(
        key,
        materials,
        jnp.zeros(3),
        jnp.zeros(3),
        scene,
        spacing,
        starting_material,
        cfg,
        elements=(positions, directions, local_elem, path_ids),
        **trace_kw,
    )
    if use_pallas:
        from ..ops.pallas.march import march_and_accumulate_pallas

        rf_local = march_and_accumulate_pallas(
            segments, materials, volume, cfg, n_cols=r_local,
            interpret=pallas_interpret,
        )
    else:
        rf_local = simulator.march_and_accumulate(
            segments, materials, volume, cfg, n_cols=r_local
        )
    if distributed_imaging:
        # column-sharded convolution with an (R, l-1) ppermute halo, local
        # envelope, then one all_gather of the finished RF for the polar
        # gather of scan conversion (which is fundamentally cross-column)
        rf_conv_local = imaging.convolve_psf_sharded(rf_local, cfg, axis, n_shards)
        rf_env_local = imaging.apply_envelope(rf_conv_local, cfg)
        rf_env = jax.lax.all_gather(rf_env_local, axis, axis=1, tiled=True)
    else:
        # assemble the full RF image on every chip (~1 MB over ICI) and run
        # the dense post-ops replicated
        rf_full = jax.lax.all_gather(rf_local, axis, axis=1, tiled=True)
        rf_conv = imaging.convolve_psf(rf_full, cfg)
        rf_env = imaging.apply_envelope(rf_conv, cfg)
    if cfg.log_compression:
        # global max -> needs the gathered image in both branches
        rf_env = imaging.log_compress(rf_env)
    if use_pallas_scanconv:
        # MXU scan-conversion kernel on the gathered (replicated) RF —
        # exercised under shard_map so the sharded composition covers every
        # Pallas kernel (VERDICT r4 item 5). precision="highest" keeps it
        # f32-exact vs imaging.scan_convert in interpret-mode CPU tests.
        # scan_banded: the r5 split/banded formulation (static pack data
        # rides the functools.partial, the table rides the state pytree).
        precision = "highest" if pallas_interpret else "default"
        if scan_banded is not None:
            from ..ops.pallas.scanconv import scan_convert_banded

            j_w, band_k, band_split = scan_banded
            bmode = jnp.maximum(
                scan_convert_banded(
                    rf_env, state["scan_table"], j_w, cfg.bmode_cols,
                    band_k=band_k, split=band_split,
                    out_rows=cfg.bmode_rows,
                    interpret=pallas_interpret, precision=precision,
                ),
                0.0,
            )
        else:
            from ..ops.pallas.scanconv import scan_convert_pallas

            bmode = jnp.maximum(
                scan_convert_pallas(
                    rf_env, state["scan_table"], cfg.bmode_cols,
                    interpret=pallas_interpret, precision=precision,
                ),
                0.0,
            )
    else:
        bmode = imaging.scan_convert(rf_env, scan_maps[0], scan_maps[1])
    return bmode, rf_local


def _shard_render_body_2d(
    key,
    materials,
    positions,      # (R_local, 3) this chip's elements (sharded over "rays")
    directions,
    elem_global0,   # (R_local,) global element indices
    state,
    cfg: SimConfig,
    axis_r: str,
    axis_s: str,
    n_r: int,
    n_s: int,
):
    """2-D mesh body: scanlines sharded over ``axis_r`` (chip-local RF
    columns), Monte-Carlo samples sharded over ``axis_s`` (a pure psum
    reduction of partial RF images — SURVEY.md §2.3 long-axis (c))."""
    scene = state["scene"]
    spacing = state["spacing"]
    starting_material = state["starting_material"]
    volume = state["volume"]
    scan_maps = state["scan_maps"]
    r_local = positions.shape[0]
    s_global = cfg.samples_per_element
    s_local = s_global // n_s
    my_s = jax.lax.axis_index(axis_s)

    local_elem = jnp.repeat(jnp.arange(r_local, dtype=jnp.int32), s_local)
    # global path id = global_elem * S + (my_s * S_local + local_sample)
    elem_g = jnp.repeat(elem_global0.astype(jnp.uint32), s_local)
    samp_g = (my_s * s_local).astype(jnp.uint32) + jnp.tile(
        jnp.arange(s_local, dtype=jnp.uint32), r_local
    )
    path_ids = elem_g * s_global + samp_g

    segments = simulator.trace_paths(
        key, materials, jnp.zeros(3), jnp.zeros(3), scene, spacing,
        starting_material, cfg,
        elements=(positions, directions, local_elem, path_ids),
    )
    rf_partial = simulator.march_and_accumulate(
        segments, materials, volume, cfg, n_cols=r_local
    )
    # samples axis: pure reduction of partial RF images over ICI
    rf_local = jax.lax.psum(rf_partial, axis_s)
    rf_conv_local = imaging.convolve_psf_sharded(rf_local, cfg, axis_r, n_r)
    rf_env_local = imaging.apply_envelope(rf_conv_local, cfg)
    rf_env = jax.lax.all_gather(rf_env_local, axis_r, axis=1, tiled=True)
    if cfg.log_compression:
        rf_env = imaging.log_compress(rf_env)
    bmode = imaging.scan_convert(rf_env, scan_maps[0], scan_maps[1])
    return bmode, rf_local


class ShardedRenderer2D:
    """Renderer over a ("rays", "samples") 2-D device mesh."""

    def __init__(self, pack, cfg: SimConfig, mesh: Mesh, seed: int = 0):
        from ..ops import texture

        self.cfg = cfg
        self.pack = pack
        self.mesh = mesh
        axis_r, axis_s = mesh.axis_names
        n_r = mesh.shape[axis_r]
        n_s = mesh.shape[axis_s]
        if cfg.transducer_elements % n_r or cfg.samples_per_element % n_s:
            raise ValueError("elements/samples must divide the mesh axes")
        self.scene = {k: jnp.asarray(v) for k, v in pack.trace_tables().items()}
        self.materials = jnp.asarray(pack.materials)
        self.volume = texture.make_texture_volume(jax.random.PRNGKey(seed ^ 0x5CA77E7), cfg)
        maps = imaging.scan_conversion_maps(cfg)
        scan_maps = (jnp.asarray(maps[0]), jnp.asarray(maps[1]))

        self._state = {
            "scene": self.scene,
            "spacing": jnp.asarray(pack.spacing),
            "starting_material": jnp.int32(pack.starting_material),
            "volume": self.volume,
            "scan_maps": scan_maps,
        }
        body = functools.partial(
            _shard_render_body_2d,
            cfg=cfg,
            axis_r=axis_r,
            axis_s=axis_s,
            n_r=n_r,
            n_s=n_s,
        )
        sharded = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P(axis_r), P(axis_r), P(axis_r), P()),
            out_specs=(P(), P(None, axis_r)),
            check_vma=False,
        )

        @jax.jit
        def _render_jit(key, materials, position, angles, state):
            positions, directions = element_layout(position, angles, cfg)
            elem0 = jnp.arange(cfg.transducer_elements, dtype=jnp.int32)
            return sharded(key, materials, positions, directions, elem0, state)

        self._render = lambda key, m, p, a: _render_jit(key, m, p, a, self._state)

    def render_frame(self, seed: int = 0, materials=None, position=None, angles=None):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
        bmode, rf_local = self._render(
            key,
            self.materials if materials is None else materials,
            jnp.asarray(self.pack.transducer_position if position is None else position),
            jnp.asarray(self.pack.transducer_angles if angles is None else angles),
        )
        return {"bmode": bmode, "rf_raw": rf_local}


class ShardedRenderer:
    """Scanline-sharded frame renderer over a 1-D device mesh."""

    def __init__(
        self,
        pack,
        cfg: SimConfig,
        mesh: Mesh | None = None,
        seed: int = 0,
        distributed_imaging: bool = True,
        use_pallas: bool | None = None,
        pallas_interpret: bool = False,
        intersect_mode: str | None = None,
        use_pallas_scanconv: bool | None = None,
    ):
        from ..ops import texture

        self.cfg = cfg
        self.pack = pack
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        n_dev = self.mesh.devices.size
        if cfg.transducer_elements % n_dev:
            raise ValueError(
                f"transducer_elements ({cfg.transducer_elements}) must divide "
                f"evenly over {n_dev} devices"
            )
        if use_pallas is None:
            # both texture modes qualify: "table" volumes carry the hash
            # seeds that the march kernel evaluates (see texture.py)
            use_pallas = (
                jax.default_backend() == "tpu" and not cfg.soft_row_binning
            )
        # large scenes: cluster-culled intersect kernel (same policy as
        # Simulator), replicated scene per chip, chip-local ray tiles.
        # pallas_interpret=True runs the same kernels through the Pallas
        # interpreter (CPU-mesh tests of the full sharded composition —
        # VERDICT r4 item 5); intersect_mode forces listed/culled/staged.
        trace_kw: dict = {}
        packed = None
        if use_pallas:
            if pack.n_triangles >= 2048 or intersect_mode is not None:
                from ..ops.pallas.intersect import pack_tris_culled

                order = pack.bvh.tri_order if pack.bvh is not None else None
                # list-driven kernel for large scenes (Simulator policy)
                mode = intersect_mode or (
                    "listed" if pack.n_triangles >= 8192 else "culled"
                )
                packed = pack_tris_culled(
                    pack.tris,
                    pack.tri_mesh_id,
                    order,
                    sort_origin=pack.transducer_position,
                    tile_t=128 if mode == "listed" else 256,
                )
                # the packed clusters ride the state pytree (threaded as an
                # argument); only the mode string stays static
                trace_kw = {
                    "culled_mode": mode,
                    "intersect_interpret": pallas_interpret,
                }
            elif not pallas_interpret:
                trace_kw = {"use_pallas_intersect": True}
        self.scene = {k: jnp.asarray(v) for k, v in pack.trace_tables().items()}
        self.spacing = jnp.asarray(pack.spacing)
        self.starting_material = jnp.int32(pack.starting_material)
        self.materials = jnp.asarray(pack.materials)
        self.volume = texture.make_texture_volume(
            jax.random.PRNGKey(seed ^ 0x5CA77E7), cfg
        )
        maps = imaging.scan_conversion_maps(cfg)
        self.scan_maps = (jnp.asarray(maps[0]), jnp.asarray(maps[1]))
        if use_pallas_scanconv is None:
            use_pallas_scanconv = bool(use_pallas) and not pallas_interpret
        scan_table = None
        scan_banded = None
        if use_pallas_scanconv:
            from ..ops.pallas.scanconv import pack_scan_maps_banded

            tb, j_w, band_k, band_split = pack_scan_maps_banded(
                maps[0], maps[1], cfg.rf_rows, cfg.rf_cols
            )
            scan_table = jnp.asarray(tb)
            scan_banded = (j_w, band_k, band_split)

        axis = self.axis
        self._state = {
            "scene": self.scene,
            "spacing": self.spacing,
            "starting_material": self.starting_material,
            "volume": self.volume,
            "scan_maps": self.scan_maps,
            "scan_table": scan_table,
            "packed": packed,
        }
        body = functools.partial(
            _shard_render_body,
            cfg=cfg,
            trace_kw=trace_kw,
            axis=axis,
            n_shards=n_dev,
            distributed_imaging=distributed_imaging,
            use_pallas=bool(use_pallas),
            pallas_interpret=pallas_interpret,
            use_pallas_scanconv=use_pallas_scanconv,
            scan_banded=scan_banded,
        )
        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P(None, axis)),
            check_vma=False,
        )

        @jax.jit
        def _render_jit(key, materials, position, angles, state):
            positions, directions = element_layout(position, angles, cfg)
            elem0 = jnp.arange(cfg.transducer_elements, dtype=jnp.int32)
            return sharded(key, materials, positions, directions, elem0, state)

        self._render = lambda key, m, p, a: _render_jit(key, m, p, a, self._state)
        self._render_jit = _render_jit

    def make_train_step(self, optimizer, mask=None):
        """One jitted sharded training step: render under shard_map,
        pixel-MSE loss vs target, backward pass (shard_map AD inserts the
        psum of per-chip material-gradient partials over ICI), masked
        optimiser update. Returns step(key, materials, opt_state, target,
        position, angles) -> (materials, opt_state, loss)."""
        import numpy as np
        import optax

        mask_np = None if mask is None else np.asarray(mask)
        render_jit = self._render_jit

        @jax.jit
        def step(key, materials, opt_state, target, position, angles, state):
            def loss_fn(m):
                bmode = render_jit(key, m, position, angles, state)[0]
                return jnp.mean((bmode - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(materials)
            if mask_np is not None:
                grads = grads * jnp.asarray(mask_np)
            updates, new_opt = optimizer.update(grads, opt_state, materials)
            new_materials = optax.apply_updates(materials, updates)
            return new_materials, new_opt, loss

        return lambda key, m, o, t, p, a: step(key, m, o, t, p, a, self._state)

    def render_bmode(self, key, materials, position, angles):
        """Jitted sharded render returning just the B-mode (for loss fns)."""
        return self._render(key, materials, position, angles)[0]

    def render_frame(self, seed: int = 0, materials=None, position=None, angles=None):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
        bmode, rf_local = self._render(
            key,
            self.materials if materials is None else materials,
            jnp.asarray(self.pack.transducer_position if position is None else position),
            jnp.asarray(self.pack.transducer_angles if angles is None else angles),
        )
        return {"bmode": bmode, "rf_raw": rf_local}
