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
* each chip rasterizes only its rows (`passes/frame.render_band` — the
  SAME pipeline body the single-chip path jits, so the two cannot drift):
  the band's tile binning makes off-band triangles nearly free, and every
  backend (Pallas tile kernel on TPU, XLA oracle elsewhere), render mode,
  and the deferred pipeline work sharded;
* a FRESH shadow map is itself row-sharded: each chip rasters its band
  of the light-space map and one ICI ``all_gather`` assembles the full
  (replicated) map — the only per-frame collective, amortizing the
  shadow raster across chips; a host-cached map may be passed in
  exactly like the single-chip path (then there is no collective);
* frame assembly is just the sharded output array: `jax.device_get`
  performs one device→host DMA per band (or leave it sharded for a
  sharded display/encoder).

Collectives: one shadow-map ``all_gather`` per frame in fresh-shadow
mode, none otherwise.  The renderer is embarrassingly data-parallel over
pixels, so the mesh buys nearly linear scaling until the per-chip band
becomes overhead-bound.

DEBUG mode composites band-aware (passes/overlay.py ``*_band`` variants
mask in global screen coordinates instead of static slices); the
scene-depth quad adds one DEBUG-only ``all_gather`` of the per-band depth
so every chip can sample the full depth image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
import inspect as _inspect
# The replication-check kwarg was renamed check_rep -> check_vma; probe
# the actual signature rather than inferring from the import location.
_SHARD_KW = (
    {"check_vma": False}
    if "check_vma" in _inspect.signature(shard_map).parameters
    else {"check_rep": False})
from jax.sharding import Mesh, PartitionSpec as P

from kanirenderer_tpu.core.types import FrameState, RenderConfig, Scene
from kanirenderer_tpu.passes.frame import FrameOutputs, render_band

Array = jnp.ndarray


def make_mesh(devices=None, axis: str = "rows") -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


@partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def _render_sharded(scene: Scene, state: FrameState, config: RenderConfig,
                    mesh: Mesh, axis: str,
                    shadow_map: Array | None) -> FrameOutputs:
    band_h = config.height // mesh.devices.size

    def band(scene, state, shadow_map):
        y0 = (jax.lax.axis_index(axis) * band_h).astype(jnp.float32)
        out = render_band(scene, state, config, shadow_map=shadow_map,
                          band_h=band_h, y0=y0, band_axis=axis)
        return out.image, out.depth

    specs_in = (P(), P(), P())
    fn = shard_map(band, mesh=mesh, in_specs=specs_in,
                   out_specs=(P(axis, None, None), P(axis, None)),
                   **_SHARD_KW)
    image, depth = fn(scene, state, shadow_map)
    return FrameOutputs(image=image, depth=depth,
                        shadow=jnp.zeros((1, 1), jnp.float32))


def render_frame_sharded(scene: Scene, state: FrameState,
                         config: RenderConfig, mesh: Mesh,
                         shadow_map: Array | None = None) -> FrameOutputs:
    """Render one frame with the framebuffer row-sharded over ``mesh``.

    Returns ``FrameOutputs`` whose image (H, W, 3) and depth (H, W) are
    sharded over rows.  config.height must be divisible by the mesh size.
    ``shadow_map``: optional host-cached shadow map (replicated to every
    chip), same semantics as ``render_frame``'s static-external path.
    """
    n = mesh.devices.size
    assert config.height % n == 0, "height must divide across the mesh"
    axis = mesh.axis_names[0]
    if shadow_map is None:
        # Static None must not reach jit as a pytree leaf of changing
        # structure; the band body treats a 1x1 zeros map as "render fresh"
        # via the explicit sentinel below.
        return _render_sharded_fresh(scene, state, config, mesh, axis)
    return _render_sharded(scene, state, config, mesh, axis, shadow_map)


@partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def _render_sharded_fresh(scene: Scene, state: FrameState,
                          config: RenderConfig, mesh: Mesh,
                          axis: str) -> FrameOutputs:
    band_h = config.height // mesh.devices.size

    def band(scene, state):
        y0 = (jax.lax.axis_index(axis) * band_h).astype(jnp.float32)
        out = render_band(scene, state, config, band_h=band_h, y0=y0,
                          shadow_axis=axis,
                          shadow_bands=mesh.devices.size,
                          band_axis=axis)
        return out.image, out.depth

    fn = shard_map(band, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(axis, None, None), P(axis, None)),
                   **_SHARD_KW)
    image, depth = fn(scene, state)
    return FrameOutputs(image=image, depth=depth,
                        shadow=jnp.zeros((1, 1), jnp.float32))
