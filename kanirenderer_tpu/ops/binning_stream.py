"""Pair-stream binning for the v2 rasterizer (ops/raster_stream.py).

Instead of per-tile chunk lists + per-pair DMAs (ops/binning.py), this
produces a flat *pair stream* sorted by tile — the ragged/grouped-kernel
form: the raster kernel's grid walks fixed-size blocks of pairs, with the
output tile index scalar-prefetched per block.  Every byte the kernel
touches is then a sequential stream read at full HBM bandwidth.

Two-round expansion keeps the sort small while staying correct for huge
near-camera chunks: every chunk gets S_SMALL slots; chunks spanning more
tiles are compacted (one small sort over C keys) into a capped big-chunk
set that gets S_BIG slots each.

Outputs:
  pair_chunk  (P,)  i32 chunk id per pair, -1 padding
  block_tile  (NB,) i32 output tile per B-pair block (num_tiles = dummy)
  block_first (NB,) i32 1 where a block starts a new tile (clear outputs)
with P = NB * block_pairs.  Every tile owns >= 1 block (so empty tiles get
cleared), each tile's blocks are contiguous, and dummy blocks sit at the
end — the revisit pattern Pallas output pipelining requires.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kanirenderer_tpu.core.types import CHUNK_SIZE

Array = jnp.ndarray

_SENTINEL = jnp.int32(2**31 - 1)

S_SMALL = 16     # expansion slots for every chunk
S_BIG = 512      # expansion slots for compacted big chunks
C_BIG = 256      # max big chunks per frame


class PairStream(NamedTuple):
    pair_chunk: Array   # (P,) i32
    block_tile: Array   # (NB,) i32
    block_first: Array  # (NB,) i32
    num_tiles: int


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h",
                                   "max_pairs", "block_pairs"))
def build_pair_stream(bbox: Array, tiles_x: int, tiles_y: int, tile_w: int,
                      tile_h: int, max_pairs: int = 32768,
                      block_pairs: int = 8) -> PairStream:
    T = bbox.shape[0]
    C = T // CHUNK_SIZE
    B = block_pairs
    num_tiles = tiles_x * tiles_y
    NB = max_pairs // B

    b = bbox.reshape(C, CHUNK_SIZE, 4)
    cx0 = b[..., 0].min(axis=1)
    cy0 = b[..., 1].min(axis=1)
    cx1 = b[..., 2].max(axis=1)
    cy1 = b[..., 3].max(axis=1)
    nonempty = (cx1 > cx0) & (cy1 > cy0)

    tx0 = jnp.clip((cx0 // tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip((cy0 // tile_h).astype(jnp.int32), 0, tiles_y - 1)
    tx1 = jnp.clip(((cx1 - 1.0) // tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty1 = jnp.clip(((cy1 - 1.0) // tile_h).astype(jnp.int32), 0, tiles_y - 1)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h
    cid = jnp.arange(C, dtype=jnp.int32)

    def expand(ids, x0, y0, sw, sp, ok, slots):
        s = jnp.arange(slots, dtype=jnp.int32)[None, :]
        dx = s % sw[:, None]
        dy = s // sw[:, None]
        tile = (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx)
        key = tile * C + ids[:, None]
        return jnp.where(ok[:, None] & (s < sp[:, None]), key, _SENTINEL)

    small = nonempty & (span <= S_SMALL)
    keys_a = expand(cid, tx0, ty0, span_w, span, small, S_SMALL)

    # big chunks: compact ids with one small sort, then expand wide
    big = nonempty & (span > S_SMALL)
    big_sorted = jnp.sort(jnp.where(big, cid, _SENTINEL))[:C_BIG]
    bvalid = big_sorted != _SENTINEL
    bid = jnp.where(bvalid, big_sorted, 0)
    keys_b = expand(bid, tx0[bid], ty0[bid], span_w[bid],
                    jnp.minimum(span[bid], S_BIG), bvalid, S_BIG)

    skey = jnp.sort(jnp.concatenate([keys_a.reshape(-1),
                                     keys_b.reshape(-1)]))
    NK = skey.shape[0]
    schunk = jnp.where(skey == _SENTINEL, -1, skey % C)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(skey, tids * C)
    ends = jnp.searchsorted(skey, (tids + 1) * C)
    counts = (ends - starts).astype(jnp.int32)

    # block allocation: every tile gets >= 1 block
    tile_blocks = jnp.maximum(-(-counts // B), 1)
    block_end = jnp.cumsum(tile_blocks)                # inclusive
    block_off = block_end - tile_blocks                # exclusive

    # block -> tile via searchsorted over the 510-entry offsets
    nb_idx = jnp.arange(NB, dtype=jnp.int32)
    bt = jnp.searchsorted(block_end, nb_idx, side="right").astype(jnp.int32)
    used = nb_idx < block_end[-1]
    block_tile = jnp.where(used, jnp.minimum(bt, num_tiles - 1), num_tiles)
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), block_tile[:-1]])
    block_first = (block_tile != prev).astype(jnp.int32)

    # pair -> chunk
    p_idx = jnp.arange(NB * B, dtype=jnp.int32)
    p_block = p_idx // B
    p_tile = block_tile[p_block]
    safe_tile = jnp.minimum(p_tile, num_tiles - 1)
    local = p_idx - block_off[safe_tile] * B
    src = jnp.clip(starts[safe_tile] + local, 0, NK - 1)
    pair_chunk = jnp.where((p_tile < num_tiles)
                           & (local < counts[safe_tile]),
                           schunk[src], -1)

    return PairStream(pair_chunk=pair_chunk, block_tile=block_tile,
                      block_first=block_first, num_tiles=num_tiles)
