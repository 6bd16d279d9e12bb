"""Forward shading: dense per-pixel fragment math for the five render modes.

Faithful reimplementation of the reference fragment shaders as (H, W, C)
tensor ops:

* lit+shadow LDR — reference src/shader.wgsl:163-262 (Reinhard tonemap)
* lit+shadow HDR — reference src/shader_hdr.wgsl (identical lighting,
  ACES tonemap)
* lit (no shadow) — reference src/lit_shader.wgsl:134-221
* unlit — reference src/unlit_shader.wgsl:97-103 (diffuse + Reinhard)
* wireframe — constant white (reference src/shader_wireframe.wgsl:140-144)

Lighting model (Blinn-Phong in tangent space, constants from
src/shader.wgsl:171-207): point-light attenuation
``1/(1 + 0.09 d + 0.032 d²)`` times range falloff
``clamp(1-(d/range)^4, 0, 1)``; ambient ``vec3(20)*0.0005``; directional
light at hardcoded 10.0 intensity with 0.5 specular strength, modulated by
3×3 PCF shadowing; a storage array of extra point lights whose specular
uses the *unnormalized* tangent normal (a reference quirk we keep,
src/shader.wgsl:242).
"""

from __future__ import annotations

import jax.numpy as jnp

from kanirenderer_tpu.core.color import aces_tonemap, reinhard_tonemap
from kanirenderer_tpu.core.types import Lights, Scene
from kanirenderer_tpu.ops.interpolate import PixelBuffer
from kanirenderer_tpu.ops.sampling import sample_atlas_bilinear, sample_shadow_pcf

Array = jnp.ndarray

# Varying slots (see ops/vertex.py layout)
TAN_POS = slice(0, 3)
TAN_VIEW = slice(3, 6)
TAN_LIGHT = slice(6, 9)
TBN_T = slice(9, 12)
TBN_B = slice(12, 15)
TBN_N = slice(15, 18)
WORLD_POS = slice(18, 21)
SHADOW_COORD = slice(21, 24)
UV = slice(24, 26)


def _norm(v: Array) -> Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def sample_materials(scene: Scene, pix: PixelBuffer) -> tuple[Array, Array]:
    """Per-pixel diffuse (linear RGB) and raw normal-map samples."""
    uv = pix.varyings[..., UV]
    mid = pix.mat_id
    diffuse = sample_atlas_bilinear(
        scene.atlas_diffuse, scene.mat_diffuse_origin[mid],
        scene.mat_diffuse_size[mid], uv)
    normal = sample_atlas_bilinear(
        scene.atlas_normal, scene.mat_normal_origin[mid],
        scene.mat_normal_size[mid], uv)
    return diffuse, normal


def shade_unlit(scene: Scene, pix: PixelBuffer) -> Array:
    """Diffuse sample + Reinhard (reference src/unlit_shader.wgsl:97-103)."""
    object_color, _ = sample_materials(scene, pix)
    return reinhard_tonemap(object_color)


def shade_wireframe(pix: PixelBuffer) -> Array:
    """Constant white (reference src/shader_wireframe.wgsl:140-144)."""
    return jnp.ones(pix.mask.shape + (3,), jnp.float32)


def _blinn_phong(tangent_normal: Array, light_dir: Array, view_dir: Array,
                 light_color: Array) -> tuple[Array, Array]:
    half_dir = _norm(view_dir + light_dir)
    diffuse = jnp.maximum((tangent_normal * light_dir).sum(-1, keepdims=True),
                          0.0) * light_color
    spec = jnp.maximum((tangent_normal * half_dir).sum(-1, keepdims=True),
                       0.0) ** 32.0 * light_color
    return diffuse, spec


def _attenuation(dist: Array, rng: Array) -> Array:
    att = 1.0 / (1.0 + 0.09 * dist + 0.032 * dist * dist)
    range_att = jnp.clip(1.0 - (dist / jnp.maximum(rng, 1e-20)) ** 4.0,
                         0.0, 1.0)
    return att * range_att


def shade_lit(scene: Scene, pix: PixelBuffer, lights: Lights,
              shadow_map: Array | None, hdr: bool) -> Array:
    """Blinn-Phong forward shading, optionally shadow-modulated.

    shadow_map None → the Lit pipeline (reference src/lit_shader.wgsl);
    otherwise LitWithShadow (src/shader.wgsl with Reinhard, or
    src/shader_hdr.wgsl with ACES when hdr=True).
    """
    object_color, object_normal = sample_materials(scene, pix)
    vary = pix.varyings

    tangent_normal_raw = object_normal * 2.0 - 1.0
    tangent_normal = _norm(tangent_normal_raw)

    tan_pos = vary[..., TAN_POS]
    view_dir = _norm(vary[..., TAN_VIEW] - tan_pos)

    # --- movable point light (uniform `light`) ---
    world_pos = vary[..., WORLD_POS]
    m = lights.movable
    dist = jnp.linalg.norm(m.position - world_pos, axis=-1, keepdims=True)
    light_dir = _norm(vary[..., TAN_LIGHT] - tan_pos)
    diff, spec = _blinn_phong(tangent_normal, light_dir, view_dir, m.color)
    movable_term = (diff + spec) * _attenuation(dist, m.range) * object_color

    # --- ambient (reference src/shader.wgsl:179-181) ---
    ambient_term = (jnp.full(3, 20.0) * 0.0005) * object_color

    # --- directional light ---
    d = lights.directional
    dl_dir = _norm(-d.direction)
    dl_diff, dl_spec_unscaled = _blinn_phong(tangent_normal, dl_dir,
                                             view_dir, d.color)
    dl_term = dl_diff * 10.0 + dl_spec_unscaled * 10.0 * 0.5
    if shadow_map is not None:
        sc = vary[..., SHADOW_COORD]
        shadow = sample_shadow_pcf(shadow_map, sc[..., 0:2], sc[..., 2])
        dl_term = dl_term * shadow[..., None]
    dl_term = dl_term * object_color

    # --- point-light storage array (vectorized over P lights) ---
    # TBN rows for per-fragment tangent transform of the loop lights.
    t_row = vary[..., TBN_T]
    b_row = vary[..., TBN_B]
    n_row = vary[..., TBN_N]
    p = lights.points
    P = p.position.shape[0]
    # (P, H, W, 1) distances
    pdist = jnp.linalg.norm(
        p.position[:, None, None, :] - world_pos[None], axis=-1,
        keepdims=True)
    # tangent-space light positions per pixel: rows · light_pos
    tl = jnp.stack([
        (t_row[None] * p.position[:, None, None, :]).sum(-1),
        (b_row[None] * p.position[:, None, None, :]).sum(-1),
        (n_row[None] * p.position[:, None, None, :]).sum(-1),
    ], axis=-1)                                       # (P, H, W, 3)
    pl_dir = _norm(tl - tan_pos[None])
    # NOTE: the loop uses the unnormalized tangent normal
    # (reference src/shader.wgsl:242).
    pdiff, pspec = _blinn_phong(
        jnp.broadcast_to(tangent_normal_raw[None], (P,) + tangent_normal.shape),
        pl_dir, jnp.broadcast_to(view_dir[None], (P,) + view_dir.shape),
        p.color[:, None, None, :])
    patt = _attenuation(pdist, p.range[:, None, None, None])
    points_term = ((pdiff + pspec) * patt).sum(axis=0) * object_color

    result = ambient_term + dl_term + movable_term + points_term
    return aces_tonemap(result) if hdr else reinhard_tonemap(result)
