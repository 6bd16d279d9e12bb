"""Debug-mode overlays as tensor compositing ops.

* Depth/shadow visualization quad — reference debug pass
  (src/lib.rs:1865-1890) + src/debug_depth.wgsl: a 0.4-scaled quad offset to
  the top-right showing the linearized scene depth or the shadow map,
  with a 1%-UV border (the shader returns black there,
  src/debug_depth.wgsl:44-47).
* Frame-time graph — reference src/frametime.rs:33-60 +
  src/lib.rs:1893-1914: a 256-point red LineStrip in a 400×100 box at the
  bottom-right, vertical full-scale 8.333 ms.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def debug_texture_quad(image: Array, depth_tex: Array,
                       znear: float, zfar: float) -> Array:
    """Composite the depth-visualization quad onto ``image``.

    Quad geometry: clip-space positions ``p*0.4 + (0.5, 0.5)`` for the ±1
    quad (src/debug_depth.wgsl:15-21) → NDC x, y ∈ [0.1, 0.9] → screen
    x ∈ [0.55W, 0.95W), y ∈ [0.05H, 0.45H).  uv has v flipped
    (src/debug_depth.wgsl:23).
    """
    H, W = image.shape[0], image.shape[1]
    x0, x1 = int(0.55 * W), int(0.95 * W)
    y0, y1 = int(0.05 * H), int(0.45 * H)
    qw, qh = x1 - x0, y1 - y0

    us = (jnp.arange(qw, dtype=jnp.float32) + 0.5) / qw
    vs = (jnp.arange(qh, dtype=jnp.float32) + 0.5) / qh
    U = us[None, :]
    # screen-y runs top→bottom; ndc y at quad top = 0.9 → uv.y(flipped):
    # uv = 1 - (ndc*0.5+0.5) with ndc descending → uv.y ascends with screen y.
    Vv = vs[:, None]

    # Bilinear sample of the depth texture.
    D_h, D_w = depth_tex.shape
    tx = U * D_w - 0.5
    ty = Vv * D_h - 0.5
    ix0 = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, D_w - 1)
    iy0 = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, D_h - 1)
    ix1 = jnp.clip(ix0 + 1, 0, D_w - 1)
    iy1 = jnp.clip(iy0 + 1, 0, D_h - 1)
    fx = jnp.clip(tx - jnp.floor(tx), 0, 1)
    fy = jnp.clip(ty - jnp.floor(ty), 0, 1)
    flat = depth_tex.reshape(-1)

    def g(iy, ix):
        return jnp.take(flat, (iy * D_w + ix).reshape(-1)).reshape(qh, qw)

    iy0b, ix0b = jnp.broadcast_to(iy0, (qh, qw)), jnp.broadcast_to(ix0, (qh, qw))
    iy1b, ix1b = jnp.broadcast_to(iy1, (qh, qw)), jnp.broadcast_to(ix1, (qh, qw))
    d = (g(iy0b, ix0b) * (1 - fx) + g(iy0b, ix1b) * fx) * (1 - fy) \
        + (g(iy1b, ix0b) * (1 - fx) + g(iy1b, ix1b) * fx) * fy

    # Linearize (src/debug_depth.wgsl:37-41).
    linear = znear * zfar / (zfar - d * (zfar - znear))
    val = linear / zfar
    border = (U < 0.01) | (U > 0.99) | (Vv < 0.01) | (Vv > 0.99)
    border = jnp.broadcast_to(border, (qh, qw))
    quad = jnp.where(border[..., None], 0.0,
                     jnp.broadcast_to(val[..., None], (qh, qw, 3)))
    return image.at[y0:y1, x0:x1, :].set(quad)


def frame_time_graph(image: Array, frame_times_ms: Array) -> Array:
    """Composite the red frame-time LineStrip (bottom-right, 400×100 px,
    full scale 8.333 ms — reference src/frametime.rs:38-46)."""
    H, W = image.shape[0], image.shape[1]
    n = frame_times_ms.shape[0]
    graph_w, graph_h = 400.0, 100.0
    x_off = W - graph_w - 25.0
    y_off = 25.0  # pixels from the bottom (NDC y-up)

    xs = x_off + jnp.arange(n, dtype=jnp.float32) / n * graph_w
    ys_up = y_off + frame_times_ms / 8.333 * graph_h
    sy = H - ys_up  # to top-down screen rows
    sx = xs

    # Overlay region (static): rows [H-250, H), cols [x_off-8, W)
    ry0 = max(H - 250, 0)
    rx0 = max(int(x_off) - 8, 0)
    rh = H - ry0
    rw = W - rx0
    py = ry0 + jnp.arange(rh, dtype=jnp.float32)[:, None] + 0.5
    px = rx0 + jnp.arange(rw, dtype=jnp.float32)[None, :] + 0.5

    # Distance from each region pixel to each strip segment.
    ax, ay = sx[:-1], sy[:-1]
    bx, by = sx[1:], sy[1:]
    dx = (bx - ax)[:, None, None]
    dy = (by - ay)[:, None, None]
    pxa = px[None] - ax[:, None, None]
    pya = py[None] - ay[:, None, None]
    denom = jnp.maximum(dx * dx + dy * dy, 1e-12)
    t = jnp.clip((pxa * dx + pya * dy) / denom, 0.0, 1.0)
    ddx = pxa - t * dx
    ddy = pya - t * dy
    dist2 = (ddx * ddx + ddy * ddy).min(axis=0)
    on_line = dist2 <= 0.45

    region = image[ry0:, rx0:, :]
    red = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    region = jnp.where(on_line[..., None], red, region)
    return image.at[ry0:, rx0:, :].set(region)


def debug_texture_quad_band(image: Array, row0: Array, full_h: int,
                            depth_tex: Array,
                            znear: float, zfar: float) -> Array:
    """Band-aware ``debug_texture_quad``: composite onto a row band
    [row0, row0+Hb) of a ``full_h``-tall screen (multi-chip row sharding,
    parallel/mesh.py).  ``row0`` may be traced — the quad's row extent is
    handled with masks in global coordinates instead of static slices,
    producing bit-identical pixels to the full-screen composite."""
    Hb, W = image.shape[0], image.shape[1]
    x0, x1 = int(0.55 * W), int(0.95 * W)
    y0q, y1q = int(0.05 * full_h), int(0.45 * full_h)
    qw, qh = x1 - x0, y1q - y0q

    rows_g = row0 + jnp.arange(Hb, dtype=jnp.float32)       # global rows
    in_rows = (rows_g >= y0q) & (rows_g < y1q)              # (Hb,)
    us = (jnp.arange(qw, dtype=jnp.float32) + 0.5) / qw
    U = us[None, :]
    # Matches the full-screen version exactly: vs[r_local] with
    # r_local = global_row − y0q (float-exact for integer rows < 2^24).
    Vv = ((rows_g - y0q + 0.5) / qh)[:, None]
    Vs = jnp.clip(Vv, 0.0, 1.0)                             # safe sampling

    D_h, D_w = depth_tex.shape
    tx = U * D_w - 0.5
    ty = Vs * D_h - 0.5
    ix0 = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, D_w - 1)
    iy0 = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, D_h - 1)
    ix1 = jnp.clip(ix0 + 1, 0, D_w - 1)
    iy1 = jnp.clip(iy0 + 1, 0, D_h - 1)
    fx = jnp.clip(tx - jnp.floor(tx), 0, 1)
    fy = jnp.clip(ty - jnp.floor(ty), 0, 1)
    flat = depth_tex.reshape(-1)

    def g(iy, ix):
        return jnp.take(flat, (iy * D_w + ix).reshape(-1)).reshape(Hb, qw)

    iy0b = jnp.broadcast_to(iy0, (Hb, qw))
    ix0b = jnp.broadcast_to(ix0, (Hb, qw))
    iy1b = jnp.broadcast_to(iy1, (Hb, qw))
    ix1b = jnp.broadcast_to(ix1, (Hb, qw))
    d = (g(iy0b, ix0b) * (1 - fx) + g(iy0b, ix1b) * fx) * (1 - fy) \
        + (g(iy1b, ix0b) * (1 - fx) + g(iy1b, ix1b) * fx) * fy

    linear = znear * zfar / (zfar - d * (zfar - znear))
    val = linear / zfar
    border = (U < 0.01) | (U > 0.99) | (Vv < 0.01) | (Vv > 0.99)
    border = jnp.broadcast_to(border, (Hb, qw))
    quad = jnp.where(border[..., None], 0.0,
                     jnp.broadcast_to(val[..., None], (Hb, qw, 3)))
    strip = image[:, x0:x1, :]
    strip = jnp.where(in_rows[:, None, None], quad, strip)
    return image.at[:, x0:x1, :].set(strip)


def frame_time_graph_band(image: Array, row0: Array, full_h: int,
                          frame_times_ms: Array) -> Array:
    """Band-aware ``frame_time_graph`` (see ``debug_texture_quad_band``)."""
    Hb, W = image.shape[0], image.shape[1]
    H = full_h
    n = frame_times_ms.shape[0]
    graph_w, graph_h = 400.0, 100.0
    x_off = W - graph_w - 25.0
    y_off = 25.0

    xs = x_off + jnp.arange(n, dtype=jnp.float32) / n * graph_w
    ys_up = y_off + frame_times_ms / 8.333 * graph_h
    sy = H - ys_up
    sx = xs

    ry0 = max(H - 250, 0)
    rx0 = max(int(x_off) - 8, 0)
    rw = W - rx0
    rows_g = row0 + jnp.arange(Hb, dtype=jnp.float32)
    py = rows_g[:, None] + 0.5                       # global-row centers
    px = rx0 + jnp.arange(rw, dtype=jnp.float32)[None, :] + 0.5

    ax, ay = sx[:-1], sy[:-1]
    bx, by = sx[1:], sy[1:]
    dx = (bx - ax)[:, None, None]
    dy = (by - ay)[:, None, None]
    pxa = px[None] - ax[:, None, None]
    pya = py[None] - ay[:, None, None]
    denom = jnp.maximum(dx * dx + dy * dy, 1e-12)
    t = jnp.clip((pxa * dx + pya * dy) / denom, 0.0, 1.0)
    ddx = pxa - t * dx
    ddy = pya - t * dy
    dist2 = (ddx * ddx + ddy * ddy).min(axis=0)
    on_line = (dist2 <= 0.45) & (rows_g >= ry0)[:, None]

    region = image[:, rx0:, :]
    red = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    region = jnp.where(on_line[..., None], red, region)
    return image.at[:, rx0:, :].set(region)
