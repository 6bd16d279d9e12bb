"""v2 Pallas rasterizer: streaming pair-block kernel.

The grouped/ragged-kernel formulation of rasterization (see
ops/binning_stream.py): the grid is 1D over fixed-size blocks of
(tile, chunk) pairs sorted by tile.  The per-pair triangle-setup records are
pre-gathered into a contiguous stream by XLA (a fast row gather), so the
kernel reads everything through the automatic BlockSpec pipeline —
sequential HBM streaming, no per-pair DMA issue cost, no SMEM lists.

Output tiles are selected by a *data-dependent* index map reading the
scalar-prefetched ``block_tile`` array; blocks of one tile are contiguous,
so each output block stays resident in VMEM across its pair blocks and is
flushed exactly once (the Pallas revisit pattern).  A dummy tile row
absorbs unused blocks.

Stream record layout (32 lanes per triangle row):
  0:16  triangle setup (ops/vertex.py NS lanes)
  16:20 screen bbox (subbatch rejection)
  21    chunk_id * CHUNK_SIZE (as float; exact below 2^24)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanirenderer_tpu.core.types import CHUNK_SIZE, RenderConfig
from kanirenderer_tpu.ops import binning_stream
from kanirenderer_tpu.ops.raster_xla import VisBuffer
from kanirenderer_tpu.ops.vertex import NS, TriangleSetup

Array = jnp.ndarray

SUBBATCH = 8
REC = 32          # lanes per stream record row
BLOCK_PAIRS = 8   # pairs (chunks) per grid block


def _interpret() -> bool:
    try:
        return not any("tpu" in d.device_kind.lower()
                       for d in jax.devices())
    except Exception:
        return True


def _stream_kernel(bt_ref, bf_ref, stream_ref, z_ref, tri_ref, b1_ref,
                   b2_ref, *, tile_h, tile_w, tiles_x, wireframe,
                   wire_thresh, depth_only):
    nb = pl.program_id(0)
    tile = bt_ref[nb]
    i = tile // tiles_x
    j = tile - i * tiles_x

    @pl.when(bf_ref[nb] == 1)
    def _():
        z_ref[:] = jnp.ones_like(z_ref)
        if not depth_only:
            tri_ref[:] = jnp.full_like(tri_ref, -1)
            b1_ref[:] = jnp.zeros_like(b1_ref)
            b2_ref[:] = jnp.zeros_like(b2_ref)

    X = (j * tile_w).astype(jnp.float32) + 0.5 \
        + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) \
        .astype(jnp.float32)
    Y = (i * tile_h).astype(jnp.float32) + 0.5 \
        + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) \
        .astype(jnp.float32)
    tx0f = (j * tile_w).astype(jnp.float32)
    ty0f = (i * tile_h).astype(jnp.float32)

    def eval_subbatch(rows, b):
        def lin(c0, c1, c2):
            return (rows[:, c0][:, None, None] * X[None]
                    + rows[:, c1][:, None, None] * Y[None]
                    + rows[:, c2][:, None, None])

        l0 = lin(0, 1, 2)
        l1 = lin(3, 4, 5)
        l2 = lin(6, 7, 8)
        zw = lin(9, 10, 11)
        ww = lin(12, 13, 14)
        vflag = (rows[:, 15] > 0.0)[:, None, None]

        inside = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
        covered = inside & (ww > 0.0) & (zw >= 0.0) & (zw <= ww) & vflag
        if wireframe:
            def edist(l, c0, c1):
                g = jax.lax.rsqrt(rows[:, c0] ** 2 + rows[:, c1] ** 2
                                  + 1e-30)
                return l * g[:, None, None]
            d = jnp.minimum(jnp.minimum(edist(l0, 0, 1), edist(l1, 3, 4)),
                            edist(l2, 6, 7))
            covered = covered & (d <= wire_thresh)

        zw_c = jnp.where(covered, zw, 1.0)
        ww_c = jnp.where(covered, ww, 0.0)

        if depth_only:
            entries = [(zw_c[k], ww_c[k]) for k in range(SUBBATCH)]
        else:
            lsum = l0 + l1 + l2
            entries = [(zw_c[k], ww_c[k],
                        jnp.full_like(zw_c[k], float(k)),
                        l1[k], l2[k], lsum[k]) for k in range(SUBBATCH)]

        def merge(a, bt2):
            take_b = bt2[0] * a[1] < a[0] * bt2[1]
            return tuple(jnp.where(take_b, fb, fa)
                         for fa, fb in zip(a, bt2))

        while len(entries) > 1:
            entries = [merge(entries[k], entries[k + 1])
                       for k in range(0, len(entries), 2)]
        win = entries[0]

        wvalid = win[1] > 0.0
        z = win[0] / jnp.where(wvalid, win[1], 1.0)
        hit = wvalid & (z < z_ref[:])
        z_ref[:] = jnp.where(hit, z, z_ref[:])
        if not depth_only:
            lsum_w = jnp.where(win[5] != 0.0, win[5], 1e-30)
            # lane 21 carries cid*CHUNK_SIZE (scalar extract → broadcast)
            tbase = rows[0, 21]
            tidf = tbase + float(b * SUBBATCH) + win[2]
            tri_ref[:] = jnp.where(hit, tidf.astype(jnp.int32), tri_ref[:])
            b1_ref[:] = jnp.where(hit, win[3] / lsum_w, b1_ref[:])
            b2_ref[:] = jnp.where(hit, win[4] / lsum_w, b2_ref[:])

    for k in range(BLOCK_PAIRS):
        rows_all = stream_ref[0, k * CHUNK_SIZE:(k + 1) * CHUNK_SIZE, :]
        for b in range(CHUNK_SIZE // SUBBATCH):
            rows = rows_all[b * SUBBATCH:(b + 1) * SUBBATCH, :]
            overlap = ((rows[:, NS + 0] < tx0f + tile_w)
                       & (rows[:, NS + 2] > tx0f)
                       & (rows[:, NS + 1] < ty0f + tile_h)
                       & (rows[:, NS + 3] > ty0f))

            @pl.when(overlap.any())
            def _(rows=rows, b=b):
                eval_subbatch(rows, b)


def _build_stream(setup: Array, bbox: Array, pair_chunk: Array) -> Array:
    """Gather per-pair setup records into a contiguous (P, 32, REC) stream."""
    T = setup.shape[0]
    C = T // CHUNK_SIZE
    rec = jnp.zeros((C, CHUNK_SIZE, REC), jnp.float32)
    rec = rec.at[:, :, :NS].set(setup.reshape(C, CHUNK_SIZE, NS))
    rec = rec.at[:, :, NS:NS + 4].set(bbox.reshape(C, CHUNK_SIZE, 4))
    tbase = (jnp.arange(C, dtype=jnp.float32) * CHUNK_SIZE)[:, None]
    rec = rec.at[:, :, 21].set(jnp.broadcast_to(tbase, (C, CHUNK_SIZE)))
    # extra zero record for padding pairs (valid flag 0 → nothing covered)
    rec_ext = jnp.concatenate(
        [rec, jnp.zeros((1, CHUNK_SIZE, REC), jnp.float32)])
    idx = jnp.where(pair_chunk < 0, C, pair_chunk)
    return rec_ext[idx]                 # (P, CHUNK_SIZE, REC)


def _run(st: TriangleSetup, width: int, height: int, tile_w: int,
         tile_h: int, tiles_x: int, tiles_y: int, max_pairs: int,
         wireframe: bool, wire_thresh: float, depth_only: bool):
    stream_bins = binning_stream.build_pair_stream(
        st.bbox, tiles_x, tiles_y, tile_w, tile_h, max_pairs, BLOCK_PAIRS)
    stream = _build_stream(st.setup, st.bbox, stream_bins.pair_chunk)
    NB = stream_bins.block_tile.shape[0]
    stream = stream.reshape(NB, BLOCK_PAIRS * CHUNK_SIZE, REC)

    ph = (tiles_y + 1) * tile_h  # +1 dummy tile row for unused blocks
    pw = tiles_x * tile_w

    kernel = functools.partial(
        _stream_kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
        wireframe=wireframe, wire_thresh=wire_thresh, depth_only=depth_only)

    def out_idx(b, bt, bf):
        t = bt[b]
        return (t // tiles_x, t % tiles_x)

    out_shape = [jax.ShapeDtypeStruct((ph, pw), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_h, tile_w), out_idx)]
    if depth_only:
        def kern(bt_ref, bf_ref, stream_ref, z_ref):
            kernel(bt_ref, bf_ref, stream_ref, z_ref, None, None, None)
    else:
        out_shape += [jax.ShapeDtypeStruct((ph, pw), jnp.int32),
                      jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                      jax.ShapeDtypeStruct((ph, pw), jnp.float32)]
        out_specs += [pl.BlockSpec((tile_h, tile_w), out_idx)] * 3
        kern = kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, BLOCK_PAIRS * CHUNK_SIZE, REC),
                         lambda b, bt, bf: (b, 0, 0)),
        ],
        out_specs=out_specs,
    )

    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(stream_bins.block_tile, stream_bins.block_first, stream)
    return outs


@functools.partial(jax.jit, static_argnames=("config", "wireframe"))
def rasterize(st: TriangleSetup, config: RenderConfig,
              wireframe: bool = False) -> VisBuffer:
    cfg = config
    z, tri, b1, b2 = _run(st, cfg.width, cfg.height, cfg.tile_w, cfg.tile_h,
                          cfg.tiles_x, cfg.tiles_y, cfg.max_pairs,
                          wireframe, cfg.wire_thresh_px, False)
    H, W = cfg.height, cfg.width
    return VisBuffer(tri=tri[:H, :W], z=z[:H, :W],
                     bary=jnp.stack([b1[:H, :W], b2[:H, :W]], axis=-1))


@functools.partial(jax.jit, static_argnames=("config",))
def rasterize_depth(st: TriangleSetup, config: RenderConfig) -> Array:
    cfg = config
    dim = cfg.shadow_dim
    tiles_x = -(-dim // cfg.tile_w)
    tiles_y = -(-dim // cfg.tile_h)
    (z,) = _run(st, dim, dim, cfg.tile_w, cfg.tile_h, tiles_x, tiles_y,
                cfg.max_pairs, False, 0.0, True)
    return z[:dim, :dim]
