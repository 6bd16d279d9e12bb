"""Gather-based texture sampling.

TPU replacement for wgpu samplers: all textures live in packed atlases and
sampling is vectorized gathers + arithmetic.

* ``sample_atlas_bilinear`` — Repeat addressing + bilinear filtering, the
  material sampler state (reference src/texture.rs:162-173).
* ``sample_shadow_pcf``     — 3×3 PCF kernel of hardware-filtered
  depth-compare taps: each tap compares 4 texels (LessEqual) and bilinearly
  blends the binary results, matching ``sampler_comparison`` + Linear
  filtering (reference src/lib.rs:760-767, src/shader.wgsl:140-159).
  Clamp-to-edge addressing (wgpu sampler default).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def _gather2d(img: Array, iy: Array, ix: Array) -> Array:
    """img[(iy, ix)] for integer index arrays; img (H, W, C) or (H, W)."""
    H, W = img.shape[0], img.shape[1]
    flat = img.reshape(H * W, -1)
    idx = iy * W + ix
    out = jnp.take(flat, idx.reshape(-1), axis=0)
    tail = img.shape[2:] if img.ndim > 2 else ()
    return out.reshape(idx.shape + tail) if tail else out.reshape(idx.shape)


def sample_atlas_bilinear(atlas: Array, origin: Array, size: Array,
                          uv: Array) -> Array:
    """Bilinear sample with per-texture Repeat wrap inside an atlas.

    atlas: (Ha, Wa, C); origin/size: (..., 2) i32 per-pixel material rects
    (x, y)/(w, h); uv: (..., 2).  Returns (..., C).
    """
    w = size[..., 0].astype(jnp.float32)
    h = size[..., 1].astype(jnp.float32)
    tx = uv[..., 0] * w - 0.5
    ty = uv[..., 1] * h - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = (tx - x0)[..., None]
    fy = (ty - y0)[..., None]

    wi = size[..., 0]
    hi = size[..., 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0.astype(jnp.int32) + 1, hi)
    ox = origin[..., 0]
    oy = origin[..., 1]

    c00 = _gather2d(atlas, oy + y0i, ox + x0i)
    c10 = _gather2d(atlas, oy + y0i, ox + x1i)
    c01 = _gather2d(atlas, oy + y1i, ox + x0i)
    c11 = _gather2d(atlas, oy + y1i, ox + x1i)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def _depth_compare_tap(shadow_map: Array, u: Array, v: Array,
                       depth: Array) -> Array:
    """One hardware comparison-sampler tap: bilinear blend of 4 LessEqual
    results, clamp-to-edge addressing."""
    D = shadow_map.shape[0]
    tx = u * D - 0.5
    ty = v * D - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, D - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, D - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, D - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, D - 1)

    def cmp(iy, ix):
        return (depth <= _gather2d(shadow_map, iy, ix)).astype(jnp.float32)

    c00 = cmp(y0i, x0i)
    c10 = cmp(y0i, x1i)
    c01 = cmp(y1i, x0i)
    c11 = cmp(y1i, x1i)
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) \
        + (c01 * (1 - fx) + c11 * fx) * fy


def sample_shadow_pcf(shadow_map: Array, uv: Array, depth: Array) -> Array:
    """3×3 PCF average of comparison taps (reference src/shader.wgsl:140-159)."""
    D = shadow_map.shape[0]
    texel = 1.0 / D
    acc = 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = acc + _depth_compare_tap(
                shadow_map, uv[..., 0] + dx * texel, uv[..., 1] + dy * texel,
                depth)
    return acc / 9.0
