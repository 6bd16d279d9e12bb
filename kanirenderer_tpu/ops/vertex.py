"""Per-frame vertex stage and triangle setup (dense XLA).

Replaces the WGSL vertex shaders (reference src/shader.wgsl:77-116) with one
batched pass over all scene vertices:

* world transform by per-object model/normal matrices;
* clip position ``view_proj @ world_pos``;
* the full varying set the fragment stage consumes — tangent-space
  positions of fragment/view/light, the (transposed) TBN rows, world
  position, shadow coordinates and UV — packed into a (V, 32) matrix so the
  shading pass gathers ONE row per corner per pixel.

Triangle setup implements homogeneous 2D rasterization (Olano-Greer style):
edge functions are built directly from clip-space coordinates via the
adjugate of the 3x3 homogeneous screen matrix, so near-plane clipping is
never needed — external triangles (some w <= 0) rasterize correctly.
This replaces the hardware clipper+rasterizer fixed function, which has no
TPU analog.

Varying layout (NV = 32 lanes):
  0:3   tangent_position       (TBN rows · world_pos)
  3:6   tangent_view_position  (TBN rows · camera_pos)
  6:9   tangent_light_position (TBN rows · movable_light_pos)
  9:12  TBN row t (world tangent)
  12:15 TBN row b (world bitangent)
  15:18 TBN row n (world normal)
  18:21 world_position
  21:24 shadow_coord (u, v, depth)  [reference src/shader.wgsl:113-114]
  24:26 uv
  26:32 (padding)

Triangle-setup layout (16 lanes):
  0:3  e0 (a, b, c) edge function   l0(p) = a*x + b*y + c
  3:6  e1
  6:9  e2                (sign-normalized: inside => all l_i >= 0)
  9:12 zrow   zw(p) = zrow · (x, y, 1)   (z_clip interpolant)
  12:15 wrow  ww(p) = wrow · (x, y, 1)   (w_clip interpolant; z = zw/ww)
  15   valid flag (1.0 = rasterize)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from kanirenderer_tpu.core import math3d
from kanirenderer_tpu.core.types import Lights, Scene

Array = jnp.ndarray

NV = 32  # varying lanes per vertex
NS = 16  # setup lanes per triangle


class VertexOutputs(NamedTuple):
    clip: Array        # (V, 4) camera-clip positions
    varyings: Array    # (V, NV)
    light_clip: Array  # (V, 4) directional-light clip positions (shadow pass)


def run_vertex_stage(scene: Scene, object_model: Array, object_normal: Array,
                     view_proj: Array, camera_pos: Array, lights: Lights,
                     light_view_proj: Array) -> VertexOutputs:
    """All per-vertex work for one frame (≈ vs_main of every forward shader,
    reference src/shader.wgsl:77-116)."""
    model = object_model[scene.vertex_object]      # (V, 4, 4)
    nrm_m = object_normal[scene.vertex_object]     # (V, 3, 3)

    world_pos = jnp.einsum("vij,vj->vi", model[:, :3, :3], scene.position) \
        + model[:, :3, 3]
    # normal_matrix * (normal|tangent|bitangent), then normalize
    t = math3d.normalize(jnp.einsum("vij,vj->vi", nrm_m, scene.tangent))
    b = math3d.normalize(jnp.einsum("vij,vj->vi", nrm_m, scene.bitangent))
    n = math3d.normalize(jnp.einsum("vij,vj->vi", nrm_m, scene.normal))

    clip = math3d.transform_points_h(view_proj, world_pos)  # (V, 4)

    # TBN rows dotted with positions (transposed-TBN transform).
    def tbn_dot(p):  # p: (3,) or (V, 3)
        p = jnp.broadcast_to(p, world_pos.shape)
        return jnp.stack([(t * p).sum(-1), (b * p).sum(-1), (n * p).sum(-1)],
                         axis=-1)

    tangent_position = tbn_dot(world_pos)
    tangent_view_position = tbn_dot(camera_pos)
    tangent_light_position = tbn_dot(lights.movable.position)

    # Shadow coordinates computed at the vertex (reference
    # src/shader.wgsl:113-114): uv = clip.xy * (0.5, -0.5) + 0.5, raw z.
    light_clip = math3d.transform_points_h(light_view_proj, world_pos)
    shadow_coord = jnp.stack([
        light_clip[:, 0] * 0.5 + 0.5,
        light_clip[:, 1] * -0.5 + 0.5,
        light_clip[:, 2],
    ], axis=-1)

    V = world_pos.shape[0]
    varyings = jnp.zeros((V, NV), jnp.float32)
    varyings = varyings.at[:, 0:3].set(tangent_position)
    varyings = varyings.at[:, 3:6].set(tangent_view_position)
    varyings = varyings.at[:, 6:9].set(tangent_light_position)
    varyings = varyings.at[:, 9:12].set(t)
    varyings = varyings.at[:, 12:15].set(b)
    varyings = varyings.at[:, 15:18].set(n)
    varyings = varyings.at[:, 18:21].set(world_pos)
    varyings = varyings.at[:, 21:24].set(shadow_coord)
    varyings = varyings.at[:, 24:26].set(scene.uv)
    return VertexOutputs(clip=clip, varyings=varyings, light_clip=light_clip)


class TriangleSetup(NamedTuple):
    setup: Array   # (T, NS) f32
    bbox: Array    # (T, 4) f32 — (x0, y0, x1, y1) pixel bounds, inclusive-exclusive


def triangle_setup(clip: Array, tri_idx: Array, tri_valid: Array,
                   width: int, height: int, cull_backfaces: bool,
                   depth_bias_constant: float = 0.0,
                   depth_bias_slope: float = 0.0) -> TriangleSetup:
    """Build per-triangle edge/interpolation rows from clip coordinates.

    ``cull_backfaces``: FrontFace::Ccw + cull Back for fill pipelines
    (reference src/lib.rs:193-194); wireframe draws both sides
    (src/lib.rs:252-253).  Depth bias implements the shadow pipeline's
    constant=2 / slope_scale=2 state (reference src/lib.rs:896-900).
    """
    c = clip[tri_idx]                     # (T, 3, 4)
    x, y, z, w = c[..., 0], c[..., 1], c[..., 2], c[..., 3]

    # Homogeneous screen coords: px/pw = pixel x, etc.  NDC y-up → pixel
    # y-down.
    px = (0.5 * x + 0.5 * w) * width
    py = (0.5 * w - 0.5 * y) * height
    pw = w

    v = jnp.stack([px, py, pw], axis=-1)  # (T, 3, 3) rows = vertices
    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
    r0 = jnp.cross(v1, v2)
    r1 = jnp.cross(v2, v0)
    r2 = jnp.cross(v0, v1)
    det = (v0 * r0).sum(-1)               # (T,)

    # wgpu FrontFace::Ccw: outward-CCW-wound triangles (right-handed model
    # space, the standard OBJ convention) are front faces when they face the
    # camera.  Such triangles are CCW in y-up NDC and flip to det < 0 in
    # this y-down screen determinant convention.  Inside pixels satisfy
    # l_i = det * λ_i, so scaling the rows by sign(det) normalizes to
    # inside => l_i >= 0 for either winding.
    sgn = jnp.where(det < 0, -1.0, 1.0)
    r0, r1, r2 = r0 * sgn[:, None], r1 * sgn[:, None], r2 * sgn[:, None]

    valid = tri_valid & (det != 0.0)
    if cull_backfaces:
        valid = valid & (det < 0.0)

    # Frustum rejection — keeps invisible geometry out of the binner
    # (unprojectable bboxes would otherwise go conservative-full-screen).
    # wgpu clip volume: -w<=x<=w, -w<=y<=w, 0<=z<=w.
    #  * all three w <= 0: entirely behind the eye plane → cull;
    #  * all w > 0: standard same-plane outcode test;
    #  * mixed-sign w: keep (conservative — plane tests flip for w < 0).
    behind = (w <= 1e-30).all(-1)
    all_front = (w > 0.0).all(-1)
    out_plane = ((x < -w).all(-1) | (x > w).all(-1)
                 | (y < -w).all(-1) | (y > w).all(-1)
                 | (z < 0.0).all(-1) | (z > w).all(-1))
    valid = valid & ~behind & ~(all_front & out_plane)

    # Interpolation rows: zw(p) = Σ l_i z_i, ww(p) = Σ l_i w_i.
    zrow = r0 * z[:, 0:1] + r1 * z[:, 1:2] + r2 * z[:, 2:3]
    wrow = r0 * w[:, 0:1] + r1 * w[:, 1:2] + r2 * w[:, 2:3]

    if depth_bias_constant or depth_bias_slope:
        # Affine z gradient in pixels: z(p) = zrow·p / wrow·p; for the ortho
        # shadow pass w is constant so dz = (zrow.xy - z*wrow.xy)/ww ≈
        # zrow.xy/ww.  Use the vertex-averaged ww as scale.
        ww_c = jnp.abs(wrow[:, 2] + 0.5 * wrow[:, 0] + 0.5 * wrow[:, 1])
        ww_c = jnp.maximum(ww_c, 1e-20)
        dzdx = jnp.abs(zrow[:, 0]) / ww_c
        dzdy = jnp.abs(zrow[:, 1]) / ww_c
        max_slope = jnp.maximum(dzdx, dzdy)
        bias = depth_bias_slope * max_slope + depth_bias_constant * (2.0 ** -23)
        # fold the bias into zrow's constant term (z' = z + bias)
        zrow = zrow + wrow * bias[:, None]

    # Screen bbox of the VISIBLE portion.  External (near-plane-crossing)
    # triangles would project to unbounded regions, so the bbox — and only
    # the bbox; coverage stays homogeneous and clip-free — is computed from
    # the triangle clipped against w = eps: up to 3 front vertices plus up
    # to 3 edge/near-plane intersection points.  This keeps near geometry
    # tightly binned instead of conservative-full-screen (which would bin
    # those chunks into every tile).
    eps = 1e-6
    front = w > eps
    sx_v = px / jnp.where(front, pw, 1.0)
    sy_v = py / jnp.where(front, pw, 1.0)

    cand_x = [jnp.where(front[:, k], sx_v[:, k], jnp.inf) for k in range(3)]
    cand_y = [jnp.where(front[:, k], sy_v[:, k], jnp.inf) for k in range(3)]
    cand_x_max = [jnp.where(front[:, k], sx_v[:, k], -jnp.inf) for k in range(3)]
    cand_y_max = [jnp.where(front[:, k], sy_v[:, k], -jnp.inf) for k in range(3)]
    for a, b2 in ((0, 1), (1, 2), (2, 0)):
        crosses = front[:, a] != front[:, b2]
        denom = w[:, b2] - w[:, a]
        t = (eps - w[:, a]) / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        ix = (px[:, a] + t * (px[:, b2] - px[:, a])) / eps
        iy = (py[:, a] + t * (py[:, b2] - py[:, a])) / eps
        # clamp the (numerically huge) intersection projections to a frame
        # slightly beyond the viewport — binning clamps further anyway
        ix = jnp.clip(ix, -1.0, width + 1.0)
        iy = jnp.clip(iy, -1.0, height + 1.0)
        cand_x.append(jnp.where(crosses, ix, jnp.inf))
        cand_y.append(jnp.where(crosses, iy, jnp.inf))
        cand_x_max.append(jnp.where(crosses, ix, -jnp.inf))
        cand_y_max.append(jnp.where(crosses, iy, -jnp.inf))

    x0 = jnp.floor(jnp.minimum(jnp.minimum(jnp.minimum(cand_x[0], cand_x[1]),
                                           jnp.minimum(cand_x[2], cand_x[3])),
                               jnp.minimum(cand_x[4], cand_x[5])))
    y0 = jnp.floor(jnp.minimum(jnp.minimum(jnp.minimum(cand_y[0], cand_y[1]),
                                           jnp.minimum(cand_y[2], cand_y[3])),
                               jnp.minimum(cand_y[4], cand_y[5])))
    x1 = jnp.ceil(jnp.maximum(jnp.maximum(
        jnp.maximum(cand_x_max[0], cand_x_max[1]),
        jnp.maximum(cand_x_max[2], cand_x_max[3])),
        jnp.maximum(cand_x_max[4], cand_x_max[5]))) + 1.0
    y1 = jnp.ceil(jnp.maximum(jnp.maximum(
        jnp.maximum(cand_y_max[0], cand_y_max[1]),
        jnp.maximum(cand_y_max[2], cand_y_max[3])),
        jnp.maximum(cand_y_max[4], cand_y_max[5]))) + 1.0
    x0 = jnp.clip(x0, 0, width)
    y0 = jnp.clip(y0, 0, height)
    x1 = jnp.clip(x1, 0, width)
    y1 = jnp.clip(y1, 0, height)
    onscreen = (x1 > x0) & (y1 > y0)
    valid = valid & onscreen
    # Invalid triangles get an empty bbox so binning skips them.
    x1 = jnp.where(valid, x1, 0.0)
    y1 = jnp.where(valid, y1, 0.0)
    x0 = jnp.where(valid, x0, float(width))
    y0 = jnp.where(valid, y0, float(height))

    # Invalid triangles get all-zero rows (ww ≡ 0 → never covered), so the
    # rasterizers need no separate validity test; lane 15 keeps the flag
    # for diagnostics.
    vf = valid.astype(jnp.float32)[:, None]
    setup = jnp.zeros((tri_idx.shape[0], NS), jnp.float32)
    setup = setup.at[:, 0:3].set(r0 * vf)
    setup = setup.at[:, 3:6].set(r1 * vf)
    setup = setup.at[:, 6:9].set(r2 * vf)
    setup = setup.at[:, 9:12].set(zrow * vf)
    setup = setup.at[:, 12:15].set(wrow * vf)
    setup = setup.at[:, 15].set(vf[:, 0])
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)
    return TriangleSetup(setup=setup, bbox=bbox)
