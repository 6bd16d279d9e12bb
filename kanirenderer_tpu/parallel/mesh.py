"""Multi-chip rendering: framebuffer row-band sharding over a device Mesh.

The reference has no distributed mode (its only parallelism is host
threading, reference src/lib.rs:1399-1650); the natural TPU scale axis is
screen-space data parallelism: each chip rasterizes and shades a horizontal
band of the framebuffer.

Design (SURVEY §5.8):
* the (small) scene and per-frame state are replicated on every chip —
  there is no per-frame scene communication at all;
* the vertex stage + triangle setup run replicated (cheap, avoids an
  all-gather of clip coordinates over ICI);
* each chip rasterizes only its rows (the setup's screen bboxes make
  off-band triangles nearly free) and shades them densely;
* the shadow map is computed replicated (identical on every chip —
  again zero communication, and it is camera-independent);
* frame assembly is just the sharded output array: `jax.device_get`
  performs one device→host DMA per band (or leave it sharded for a
  sharded display/encoder).

Collectives: none per frame.  That is the point — the renderer is
embarrassingly data-parallel over pixels, so the mesh buys nearly linear
scaling until the per-chip band becomes overhead-bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kanirenderer_tpu.core import math3d
from kanirenderer_tpu.core.color import linear_to_srgb
from kanirenderer_tpu.core.types import (FrameState, RenderConfig,
                                         RenderMode, Scene)
from kanirenderer_tpu.ops import raster_xla
from kanirenderer_tpu.ops.interpolate import interpolate
from kanirenderer_tpu.ops.vertex import run_vertex_stage, triangle_setup
from kanirenderer_tpu.shade import forward

Array = jnp.ndarray


def make_mesh(devices=None, axis: str = "rows") -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def render_frame_sharded(scene: Scene, state: FrameState,
                         config: RenderConfig, mesh: Mesh) -> Array:
    """Render one frame with the framebuffer row-sharded over ``mesh``.

    Returns an (H, W, 3) image sharded over rows.  config.height must be
    divisible by the mesh size.
    """
    cfg = config
    n = mesh.devices.size
    assert cfg.height % n == 0, "height must divide across the mesh"
    band_h = cfg.height // n

    def band(scene, state):
        idx = jax.lax.axis_index("rows")
        y0 = (idx * band_h).astype(jnp.float32)

        proj = math3d.perspective(jnp.deg2rad(cfg.fovy_deg), cfg.aspect,
                                  cfg.znear, cfg.zfar)
        view = math3d.camera_view_matrix(state.camera.position,
                                         state.camera.yaw,
                                         state.camera.pitch)
        light_vp = math3d.directional_light_view_projection(
            state.lights.directional.direction,
            state.lights.directional.distance,
            state.lights.directional.shadow_scene_size)
        vp = jnp.matmul(proj, view, precision=jax.lax.Precision.HIGHEST)
        vout = run_vertex_stage(scene, state.object_model,
                                state.object_normal, vp,
                                state.camera.position, state.lights,
                                light_vp)

        if cfg.mode in (RenderMode.LIT_SHADOW, RenderMode.DEBUG):
            sh_setup = triangle_setup(
                vout.light_clip, scene.tri_idx, scene.tri_valid,
                cfg.shadow_dim, cfg.shadow_dim, cull_backfaces=False,
                depth_bias_constant=cfg.shadow_bias_constant,
                depth_bias_slope=cfg.shadow_bias_slope)
            shadow_map = raster_xla.rasterize_depth_xla(sh_setup.setup,
                                                        cfg.shadow_dim)
        else:
            shadow_map = jnp.ones((cfg.shadow_dim, cfg.shadow_dim),
                                  jnp.float32)

        wire = cfg.mode == RenderMode.WIREFRAME
        st = triangle_setup(vout.clip, scene.tri_idx, scene.tri_valid,
                            cfg.width, cfg.height,
                            cull_backfaces=not wire)
        vis = raster_xla.rasterize_xla(st.setup, cfg.width, band_h,
                                       wireframe=wire,
                                       wire_thresh=cfg.wire_thresh_px,
                                       y_offset=y0)
        pix = interpolate(vis, scene.tri_idx, scene.tri_mat, vout.varyings,
                          scene.mat_row_base, scene.mat_tex_size)
        if cfg.mode == RenderMode.UNLIT:
            color = forward.shade_unlit(scene, pix)
        elif cfg.mode == RenderMode.WIREFRAME:
            color = forward.shade_wireframe(pix)
        elif cfg.mode == RenderMode.LIT:
            color = forward.shade_lit(scene, pix, state.lights, None,
                                      cfg.hdr)
        else:
            from kanirenderer_tpu.ops.sampling import build_shadow_rows
            color = forward.shade_lit(scene, pix, state.lights,
                                      build_shadow_rows(shadow_map),
                                      cfg.hdr, cfg.shadow_dim)
        clear = jnp.asarray(cfg.clear_color, jnp.float32)[:, None, None]
        img = jnp.where(pix.mask[None], color, clear)
        img = jnp.transpose(img, (1, 2, 0))
        if not cfg.hdr:
            img = linear_to_srgb(img)
        return jnp.clip(img, 0.0, 1.0)

    fn = shard_map(band, mesh=mesh,
                   in_specs=(P(), P()),
                   out_specs=P("rows", None, None))
    return fn(scene, state)
