"""Gather-based texture sampling — one row gather per sampled surface.

TPU gathers cost ~constant per ROW independent of row width (measured on
v5e), so every sampler here is built around a single wide row gather:

* ``sample_materials_fused`` — diffuse + normal-map bilinear filtering with
  Repeat addressing from the fused texel-row table (core/types.Scene
  .tex_rows): each row already holds both textures' 2×2 wrapped
  neighborhoods, so filtering is ONE gather + planar lerps.  Matches the
  material sampler state (reference src/texture.rs:162-173).
* ``build_shadow_rows`` / ``sample_shadow_pcf_fused`` — the 3×3 PCF kernel
  of comparison taps (reference src/lib.rs:760-767, src/shader.wgsl:140-159)
  via one row gather of the 4×4 texel footprint, then 16 compares + 9
  bilinear blends as dense planar math.  Clamp-to-edge addressing (wgpu
  sampler default).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def sample_materials_fused(tex_rows: Array, base: Array, tw: Array,
                           th: Array, u: Array,
                           v: Array) -> tuple[Array, Array]:
    """Returns (diffuse (3,H,W) linear, normal (3,H,W) raw).

    base/tw/th are per-pixel (H, W) i32 planes taken from the triangle
    records — no per-pixel parameter gathers happen here."""
    tx = u * tw.astype(jnp.float32) - 0.5
    ty = v * th.astype(jnp.float32) - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0i = jnp.mod(x0.astype(jnp.int32), tw)
    y0i = jnp.mod(y0.astype(jnp.int32), th)

    rec = jnp.take(tex_rows, base + y0i * tw + x0i, axis=0)  # (H, W, 24)
    r = jnp.transpose(rec, (2, 0, 1))                        # (24, H, W)

    def bilerp(o):
        c00 = r[o:o + 3]
        c10 = r[o + 3:o + 6]
        c01 = r[o + 6:o + 9]
        c11 = r[o + 9:o + 12]
        top = c00 + (c10 - c00) * fx[None]
        bot = c01 + (c11 - c01) * fx[None]
        return top + (bot - top) * fy[None]

    return bilerp(0), bilerp(12)


def build_shadow_rows(shadow_map: Array) -> Array:
    """(D, D) shadow map → (D², 16) rows of 4×4 clamp-padded neighborhoods
    anchored at (x−1, y−1).  Rebuilt per shadow render — a cheap dense op."""
    D = shadow_map.shape[0]
    padded = jnp.pad(shadow_map, ((1, 2), (1, 2)), mode="edge")
    shifts = [padded[dy:dy + D, dx:dx + D]
              for dy in range(4) for dx in range(4)]
    return jnp.stack(shifts, axis=-1).reshape(D * D, 16)


def sample_shadow_pcf_fused(shadow_rows: Array, dim: int, u: Array, v: Array,
                            depth: Array) -> Array:
    """3×3 PCF average of hardware-style comparison taps — one row gather."""
    D = dim
    tx = u * D - 0.5
    ty = v * D - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, D - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, D - 1)

    rec = jnp.take(shadow_rows, y0i * D + x0i, axis=0)       # (H, W, 16)
    r = jnp.transpose(rec, (2, 0, 1))                        # (16, H, W)

    # comparison planes for the whole 4×4 footprint
    c = [(depth <= r[k]).astype(jnp.float32) for k in range(16)]

    acc = 0.0
    for oy in range(3):          # tap offsets -1..1 → footprint rows 0..3
        for ox in range(3):
            c00 = c[oy * 4 + ox]
            c10 = c[oy * 4 + ox + 1]
            c01 = c[(oy + 1) * 4 + ox]
            c11 = c[(oy + 1) * 4 + ox + 1]
            top = c00 + (c10 - c00) * fx
            bot = c01 + (c11 - c01) * fx
            acc = acc + top + (bot - top) * fy
    return acc / 9.0
