"""Pallas TPU tile rasterizer — the hot kernel of the framework.

Replaces the wgpu fixed-function rasterizer + depth test with a
visibility-buffer tile kernel:

* grid = (tiles_y, tiles_x) screen tiles of (tile_h × tile_w) pixels —
  tile_w = 128 to match the VPU lane width, tile_h a multiple of 8;
* each tile walks its binned chunk list (ops/binning.py): the per-chunk
  triangle setup rows (ops/vertex.py) are DMA'd HBM→VMEM double-buffered,
  so edge evaluation overlaps the next chunk's fetch;
* per chunk, triangles are evaluated SUBBATCH at a time against the whole
  tile on the VPU (edge functions l_i = a·x + b·y + c, depth z = zw/ww),
  then z-argmin-merged into the tile's VMEM z/tri/bary accumulators;
* outputs are written once per tile: the visibility buffer {tri, z, λ1, λ2}
  that shade/ consumes densely.

There is no read-modify-write hazard anywhere: each tile owns its output
block, and depth resolution is an associative min-reduction — the property
that makes rasterization parallelize on a dense-tensor machine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanirenderer_tpu.core.types import CHUNK_SIZE, RenderConfig
from kanirenderer_tpu.ops import binning
from kanirenderer_tpu.ops.raster_xla import VisBuffer
from kanirenderer_tpu.ops.vertex import NS, TriangleSetup

Array = jnp.ndarray

SUBBATCH = 8
_BIG = float("inf")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _raster_kernel(lists_ref, counts_ref, setup_hbm, z_ref, tri_ref,
                   b1_ref, b2_ref, chunk_buf, sem, *, tile_h, tile_w,
                   wireframe, wire_thresh, depth_only):
    i = pl.program_id(0)
    j = pl.program_id(1)

    z_ref[:] = jnp.ones_like(z_ref)
    if not depth_only:
        tri_ref[:] = jnp.full_like(tri_ref, -1)
        b1_ref[:] = jnp.zeros_like(b1_ref)
        b2_ref[:] = jnp.zeros_like(b2_ref)

    X = (j * tile_w).astype(jnp.float32) + 0.5 \
        + jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
    Y = (i * tile_h).astype(jnp.float32) + 0.5 \
        + jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)

    count = counts_ref[0, 0]

    def get_cid(s):
        return lists_ref[0, 0, s]

    def dma(slot, cid):
        return pltpu.make_async_copy(setup_hbm.at[cid], chunk_buf.at[slot],
                                     sem.at[slot])

    @pl.when(count > 0)
    def _():
        dma(0, get_cid(0)).start()

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBBATCH, tile_h, tile_w), 0)

    def chunk_body(s, _):
        slot = s % 2

        @pl.when(s + 1 < count)
        def _():
            dma((s + 1) % 2, get_cid(s + 1)).start()

        dma(slot, get_cid(s)).wait()
        chunk = chunk_buf[slot]          # (CHUNK_SIZE, NS)
        cid = get_cid(s)

        for b in range(CHUNK_SIZE // SUBBATCH):
            rows = chunk[b * SUBBATCH:(b + 1) * SUBBATCH, :]  # (SB, NS)

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
            z = zw / jnp.where(ww != 0.0, ww, 1e-30)
            covered = inside & (ww > 0.0) & (z >= 0.0) & (z <= 1.0) & vflag
            if wireframe:
                def edist(l, c0, c1):
                    g = jax.lax.rsqrt(rows[:, c0] ** 2 + rows[:, c1] ** 2
                                      + 1e-30)
                    return l * g[:, None, None]
                d = jnp.minimum(jnp.minimum(edist(l0, 0, 1), edist(l1, 3, 4)),
                                edist(l2, 6, 7))
                covered = covered & (d <= wire_thresh)

            zc = jnp.where(covered, z, _BIG)
            zmin = zc.min(axis=0)                       # (th, tw)
            hit = zmin < z_ref[:]
            if depth_only:
                z_ref[:] = jnp.where(hit, zmin, z_ref[:])
            else:
                # winner row id: first row attaining zmin
                rid = jnp.where(zc == zmin[None], row_iota, CHUNK_SIZE).min(axis=0)
                onehot = (row_iota == rid[None]) & covered
                lsum = l0 + l1 + l2
                lsum = jnp.where(lsum != 0.0, lsum, 1e-30)
                w1 = jnp.where(onehot, l1 / lsum, 0.0).sum(axis=0)
                w2 = jnp.where(onehot, l2 / lsum, 0.0).sum(axis=0)
                tid = cid * CHUNK_SIZE + b * SUBBATCH + rid
                z_ref[:] = jnp.where(hit, zmin, z_ref[:])
                tri_ref[:] = jnp.where(hit, tid, tri_ref[:])
                b1_ref[:] = jnp.where(hit, w1, b1_ref[:])
                b2_ref[:] = jnp.where(hit, w2, b2_ref[:])
        return 0

    jax.lax.fori_loop(0, count, chunk_body, 0)


def _run(setup: Array, bins: binning.TileBins, width: int, height: int,
         tile_w: int, tile_h: int, wireframe: bool, wire_thresh: float,
         depth_only: bool):
    tiles_y, tiles_x, L = bins.tile_lists.shape
    C = setup.shape[0] // CHUNK_SIZE
    setup_c = setup.reshape(C, CHUNK_SIZE, NS)
    ph, pw = tiles_y * tile_h, tiles_x * tile_w

    kernel = functools.partial(
        _raster_kernel, tile_h=tile_h, tile_w=tile_w, wireframe=wireframe,
        wire_thresh=wire_thresh, depth_only=depth_only)

    out_shape = [jax.ShapeDtypeStruct((ph, pw), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j))]
    if not depth_only:
        out_shape += [jax.ShapeDtypeStruct((ph, pw), jnp.int32),
                      jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                      jax.ShapeDtypeStruct((ph, pw), jnp.float32)]
        out_specs += [pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j))] * 3
    else:
        # dummy refs so the kernel signature stays uniform
        pass

    in_specs = [
        pl.BlockSpec((1, 1, L), lambda i, j: (i, j, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i, j: (i, j),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]

    if depth_only:
        def kern(lists_ref, counts_ref, setup_hbm, z_ref, chunk_buf, sem):
            kernel(lists_ref, counts_ref, setup_hbm, z_ref, None, None, None,
                   chunk_buf, sem)
    else:
        kern = kernel

    outs = pl.pallas_call(
        kern,
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_SIZE, NS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(bins.tile_lists, bins.tile_counts, setup_c)
    return outs


@functools.partial(jax.jit, static_argnames=("config", "wireframe"))
def rasterize(st: TriangleSetup, config: RenderConfig,
              wireframe: bool = False) -> VisBuffer:
    cfg = config
    bins = binning.bin_chunks(
        st.bbox, cfg.tiles_x, cfg.tiles_y, cfg.tile_w, cfg.tile_h,
        cfg.max_tiles_per_chunk, cfg.max_chunks_per_tile,
        cfg.max_global_chunks)
    z, tri, b1, b2 = _run(st.setup, bins, cfg.width, cfg.height, cfg.tile_w,
                          cfg.tile_h, wireframe, cfg.wire_thresh_px, False)
    H, W = cfg.height, cfg.width
    return VisBuffer(tri=tri[:H, :W], z=z[:H, :W],
                     bary=jnp.stack([b1[:H, :W], b2[:H, :W]], axis=-1))


@functools.partial(jax.jit, static_argnames=("config",))
def rasterize_depth(st: TriangleSetup, config: RenderConfig) -> Array:
    """Depth-only shadow-map raster (tiles over the shadow_dim square)."""
    cfg = config
    dim = cfg.shadow_dim
    tiles_x = -(-dim // cfg.tile_w)
    tiles_y = -(-dim // cfg.tile_h)
    bins = binning.bin_chunks(
        st.bbox, tiles_x, tiles_y, cfg.tile_w, cfg.tile_h,
        cfg.max_tiles_per_chunk, cfg.max_chunks_per_tile,
        cfg.max_global_chunks)
    (z,) = _run(st.setup, bins, dim, dim, cfg.tile_w, cfg.tile_h,
                False, 0.0, True)
    return z[:dim, :dim]
