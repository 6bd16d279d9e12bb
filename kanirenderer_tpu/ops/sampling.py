"""Gather-based texture sampling (channel-planar).

TPU replacement for wgpu samplers: all textures live in packed atlases and
sampling is vectorized gathers + arithmetic.  Layout note: everything here
is channel-planar — images are (C, H, W) and per-pixel quantities are
(H, W) planes — so every arithmetic op runs on perfectly (8, 128)-tiled
arrays instead of 3-lane channel-last rows.

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


def sample_atlas_bilinear(atlas: Array, ox: Array, oy: Array, tw: Array,
                          th: Array, u: Array, v: Array) -> Array:
    """Bilinear sample with per-texture Repeat wrap inside an atlas.

    atlas: (C, Ha, Wa) planar; ox/oy/tw/th: (H, W) i32 per-pixel material
    rects; u/v: (H, W) uv.  Returns (C, H, W).
    """
    C, Ha, Wa = atlas.shape
    flat = atlas.reshape(C, Ha * Wa)

    twf = tw.astype(jnp.float32)
    thf = th.astype(jnp.float32)
    tx = u * twf - 0.5
    ty = v * thf - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0

    x0i = jnp.mod(x0.astype(jnp.int32), tw)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, tw)
    y0i = jnp.mod(y0.astype(jnp.int32), th)
    y1i = jnp.mod(y0.astype(jnp.int32) + 1, th)

    i00 = (oy + y0i) * Wa + ox + x0i
    i10 = (oy + y0i) * Wa + ox + x1i
    i01 = (oy + y1i) * Wa + ox + x0i
    i11 = (oy + y1i) * Wa + ox + x1i

    out = []
    for c in range(C):
        c00 = jnp.take(flat[c], i00, axis=0)
        c10 = jnp.take(flat[c], i10, axis=0)
        c01 = jnp.take(flat[c], i01, axis=0)
        c11 = jnp.take(flat[c], i11, axis=0)
        top = c00 + (c10 - c00) * fx
        bot = c01 + (c11 - c01) * fx
        out.append(top + (bot - top) * fy)
    return jnp.stack(out)


def _depth_compare_tap(flat: Array, D: int, u: Array, v: Array,
                       depth: Array) -> Array:
    """One hardware comparison-sampler tap: bilinear blend of 4 LessEqual
    results, clamp-to-edge addressing.  flat: (D*D,) shadow map."""
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
        return (depth <= jnp.take(flat, iy * D + ix, axis=0)) \
            .astype(jnp.float32)

    c00 = cmp(y0i, x0i)
    c10 = cmp(y0i, x1i)
    c01 = cmp(y1i, x0i)
    c11 = cmp(y1i, x1i)
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample_shadow_pcf(shadow_map: Array, u: Array, v: Array,
                      depth: Array) -> Array:
    """3×3 PCF average of comparison taps (reference src/shader.wgsl:140-159)."""
    D = shadow_map.shape[0]
    flat = shadow_map.reshape(-1)
    texel = 1.0 / D
    acc = 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = acc + _depth_compare_tap(flat, D, u + dx * texel,
                                           v + dy * texel, depth)
    return acc / 9.0
