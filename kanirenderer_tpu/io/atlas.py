"""Texture atlas packing.

The wgpu reference binds each material's diffuse/normal textures separately
(reference src/model.rs:95-138).  A TPU has no texture units: sampling is a
vectorized gather, so all textures of a kind are packed into ONE atlas array
in HBM and materials carry integer (origin, size) rectangles.  Repeat
addressing (reference src/texture.rs:164-166) is applied per-texture before
the atlas offset, so rectangles never bleed.

Simple shelf packing, descending height.  Atlas width is the next power of two
of the widest texture (min 128 to stay lane-aligned).
"""

from __future__ import annotations

import numpy as np


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def pack_atlas(images: list[np.ndarray], min_side: int = 128,
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack (H, W, C) images into one atlas.

    Returns (atlas[f32 HxWxC], origins[i32 Nx2 as (x, y)], sizes[i32 Nx2 as
    (w, h)]).  Input images may be uint8 (scaled to [0,1]) or float.
    """
    if not images:
        atlas = np.zeros((min_side, min_side, 3), np.float32)
        return atlas, np.zeros((0, 2), np.int32), np.zeros((0, 2), np.int32)

    chans = images[0].shape[2]
    norm = []
    for img in images:
        if img.dtype == np.uint8:
            a = img.astype(np.float32) / 255.0
        elif img.dtype == np.uint16:
            a = img.astype(np.float32) / 65535.0
        else:
            a = img.astype(np.float32)
        norm.append(a[..., :chans])

    width = max(min_side, _next_pow2(max(i.shape[1] for i in norm)))
    order = sorted(range(len(norm)), key=lambda i: -norm[i].shape[0])

    origins = np.zeros((len(norm), 2), np.int32)
    sizes = np.zeros((len(norm), 2), np.int32)
    shelf_y = 0
    shelf_h = 0
    x = 0
    for i in order:
        h, w = norm[i].shape[:2]
        if x + w > width:
            shelf_y += shelf_h
            x = 0
            shelf_h = 0
        origins[i] = (x, shelf_y)
        sizes[i] = (w, h)
        shelf_h = max(shelf_h, h)
        x += w
    height = max(min_side, _next_pow2(shelf_y + shelf_h))

    atlas = np.zeros((height, width, chans), np.float32)
    for i, img in enumerate(norm):
        ox, oy = origins[i]
        h, w = img.shape[:2]
        atlas[oy:oy + h, ox:ox + w] = img
    return atlas, origins, sizes
