"""Visibility buffer → dense per-pixel fragment inputs (channel-planar).

Given the raster output {tri_id, λ1, λ2} this gathers the three vertex
varying rows per pixel and blends them with the perspective-correct
barycentrics — the TPU equivalent of the hardware interpolators feeding
``fs_main``.

Layout: per-pixel quantities are gathered as *scalar* (H, W) gathers from
the flattened varying matrix — index arithmetic off one base index per
corner, which XLA fuses into a handful of vectorized gathers (measured on
v5e: N adjacent-scalar gathers cost ≈ one).  Row gathers of (V, 32) were
~8× slower.  The result is directly channel-planar (NV, H, W).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from kanirenderer_tpu.ops.raster_xla import VisBuffer
from kanirenderer_tpu.ops.vertex import NV

Array = jnp.ndarray

USED_CHANNELS = 26  # channels 26..NV are padding (see ops/vertex.py layout)


class PixelBuffer(NamedTuple):
    varyings: Array  # (NV, H, W) interpolated vertex outputs, planar
    mat_id: Array    # (H, W) i32
    mask: Array      # (H, W) bool — True where geometry covers the pixel
    z: Array         # (H, W) f32 depth


def interpolate(vis: VisBuffer, tri_idx: Array, tri_mat: Array,
                varyings: Array) -> PixelBuffer:
    tid = jnp.maximum(vis.tri, 0)
    flat_tri = tri_idx.reshape(-1)
    c0 = jnp.take(flat_tri, tid * 3, axis=0)       # (H, W) vertex ids
    c1 = jnp.take(flat_tri, tid * 3 + 1, axis=0)
    c2 = jnp.take(flat_tri, tid * 3 + 2, axis=0)
    l1 = vis.bary[..., 0]
    l2 = vis.bary[..., 1]

    vflat = varyings.reshape(-1)                   # (V * NV,)
    b0 = c0 * NV
    b1 = c1 * NV
    b2 = c2 * NV
    planes = []
    for c in range(USED_CHANNELS):
        v0 = jnp.take(vflat, b0 + c, axis=0)
        v1 = jnp.take(vflat, b1 + c, axis=0)
        v2 = jnp.take(vflat, b2 + c, axis=0)
        planes.append(v0 + (v1 - v0) * l1 + (v2 - v0) * l2)
    planes += [jnp.zeros_like(l1)] * (NV - USED_CHANNELS)
    planar = jnp.stack(planes)
    return PixelBuffer(varyings=planar, mat_id=tri_mat[tid],
                       mask=vis.tri >= 0, z=vis.z)
