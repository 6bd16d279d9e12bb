"""Visibility buffer → dense per-pixel fragment inputs.

Given the raster output {tri_id, λ1, λ2} this reconstructs the interpolated
vertex varyings per pixel — the TPU equivalent of the hardware
interpolators feeding ``fs_main``.

Gather strategy (measured on v5e): XLA's TPU gather costs ~constant per
ROW regardless of row width (32→128 f32 rows gather at the same rate), so
the per-pixel work is exactly ONE wide row gather:

 1. per-triangle shading records are packed once per frame: the three
    corners' 26 used varying channels side by side + the material id —
    a (T, 3·26+2) matrix built with cheap per-TRIANGLE row gathers
    (T rows ≈ 12% of the pixel count);
 2. each pixel gathers its winning triangle's record row (the one
    expensive gather) and blends corners with the perspective-correct
    barycentrics in channel-last layout (96-lane rows, well tiled);
 3. one (H, W, C) → (C, H, W) transpose hands the planar stack to
    shade/.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from kanirenderer_tpu.ops.raster_xla import VisBuffer

Array = jnp.ndarray

USED = 26  # varying channels 26..NV are padding (see ops/vertex.py layout)


class PixelBuffer(NamedTuple):
    varyings: Array  # (USED, H, W) interpolated vertex outputs, planar
    mat_id: Array    # (H, W) i32
    mask: Array      # (H, W) bool — True where geometry covers the pixel
    z: Array         # (H, W) f32 depth


def build_tri_records(tri_idx: Array, tri_mat: Array,
                      varyings: Array) -> Array:
    """(T, 3·USED+1) per-triangle shading records (corner varyings + mat)."""
    v = varyings[:, :USED]
    r0 = v[tri_idx[:, 0]]
    r1 = v[tri_idx[:, 1]]
    r2 = v[tri_idx[:, 2]]
    return jnp.concatenate(
        [r0, r1, r2, tri_mat[:, None].astype(jnp.float32)], axis=1)


def interpolate(vis: VisBuffer, tri_idx: Array, tri_mat: Array,
                varyings: Array) -> PixelBuffer:
    records = build_tri_records(tri_idx, tri_mat, varyings)
    tid = jnp.maximum(vis.tri, 0)
    rec = jnp.take(records, tid, axis=0)        # (H, W, 3·USED+1)
    l1 = vis.bary[..., 0:1]
    l2 = vis.bary[..., 1:2]
    v0 = rec[..., 0:USED]
    v1 = rec[..., USED:2 * USED]
    v2 = rec[..., 2 * USED:3 * USED]
    out = v0 + (v1 - v0) * l1 + (v2 - v0) * l2  # (H, W, USED)
    planar = jnp.transpose(out, (2, 0, 1))
    mat_id = rec[..., 3 * USED].astype(jnp.int32)
    return PixelBuffer(varyings=planar, mat_id=mat_id,
                       mask=vis.tri >= 0, z=vis.z)
