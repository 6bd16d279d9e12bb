"""Visibility buffer → dense per-pixel fragment inputs.

Given the raster output {tri_id, λ1, λ2} this gathers the three vertex
varying rows per pixel and blends them with the perspective-correct
barycentrics — the TPU equivalent of the hardware interpolators feeding
``fs_main``.  Everything downstream (shade/) is dense (H, W, C) math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from kanirenderer_tpu.ops.raster_xla import VisBuffer

Array = jnp.ndarray


class PixelBuffer(NamedTuple):
    varyings: Array  # (H, W, NV) interpolated vertex outputs
    mat_id: Array    # (H, W) i32
    mask: Array      # (H, W) bool — True where geometry covers the pixel
    z: Array         # (H, W) f32 depth


def interpolate(vis: VisBuffer, tri_idx: Array, tri_mat: Array,
                varyings: Array) -> PixelBuffer:
    tid = jnp.maximum(vis.tri, 0)
    corners = tri_idx[tid]               # (H, W, 3)
    v0 = varyings[corners[..., 0]]       # (H, W, NV)
    v1 = varyings[corners[..., 1]]
    v2 = varyings[corners[..., 2]]
    l1 = vis.bary[..., 0:1]
    l2 = vis.bary[..., 1:2]
    l0 = 1.0 - l1 - l2
    out = v0 * l0 + v1 * l1 + v2 * l2
    return PixelBuffer(varyings=out, mat_id=tri_mat[tid],
                       mask=vis.tri >= 0, z=vis.z)
