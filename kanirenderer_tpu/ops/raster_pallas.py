"""Pallas TPU tile rasterizer — the hot kernel of the framework.

Replaces the wgpu fixed-function rasterizer + depth test with a
visibility-buffer tile kernel:

* grid = (tiles_y, tiles_x) screen tiles of (tile_h × tile_w) pixels —
  tile_w = 128 to match the VPU lane width, tile_h a multiple of 8;
* each tile walks its binned chunk list (ops/binning.py): the per-chunk
  triangle setup rows (ops/vertex.py) are DMA'd HBM→VMEM double-buffered,
  so edge evaluation overlaps the next chunk's fetch;
* per chunk, triangles are evaluated SUBBATCH at a time against the whole
  tile on the VPU (edge functions l_i = a·x + b·y + c, screen-affine depth z),
  then z-argmin-merged into the tile's VMEM z/tri/bary accumulators;
* outputs are written once per tile: the visibility buffer {tri, z, λ1, λ2}
  that shade/ consumes densely.

There is no read-modify-write hazard anywhere: each tile owns its output
block, and depth resolution is an associative min-reduction — the property
that makes rasterization parallelize on a dense-tensor machine.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanirenderer_tpu.core.types import (CHUNK_SIZE, MASK_BITS, RUN_CHUNKS,
                                         SUBBATCH, SUBS_PER_CHUNK,
                                         RenderConfig)
from kanirenderer_tpu.ops import binning
from kanirenderer_tpu.ops.interpolate import USED, PixelBuffer
from kanirenderer_tpu.ops.raster_xla import VisBuffer
from kanirenderer_tpu.ops.vertex import NS, TriangleSetup

Array = jnp.ndarray

NBUF = int(_os.environ.get("KANI_NBUF", "4"))  # chunk DMA pipeline depth
# Binning layout: "stream" (default) = flat sorted run stream + per-tile
# (row, offset, count) scalars via Pallas scalar prefetch; "block" = the
# dense per-tile packed blocks.  The stream layout skips the packed
# path's ~10 ms of per-tile regrouping gathers (binning.StreamBins).
BIN_MODE = _os.environ.get("KANI_BIN", "stream")
# Per-subbatch bbox rejection (via the binner's precomputed mask bits) can
# be disabled for measurement: KANI_SUBBATCH_SKIP=0 evaluates every
# subbatch of every listed chunk.
SUBBATCH_SKIP = _os.environ.get("KANI_SUBBATCH_SKIP", "1") != "0"
# Measurement-only phase isolation for the fused kernel (docs/PERFORMANCE.md
# phase-cost breakdown): "full" (default) | "p1" (visibility tournament only)
# | "p1c" (p1 + winner compaction, no interpolation DMA/loop).  Non-default
# values produce wrong images — bench instrumentation only.
FUSED_PHASE = _os.environ.get("KANI_FUSED_PHASE", "full")
# KANI_EVAL_NOP=1 replaces every subbatch evaluation with a 2-op touch of
# the DMA'd rows: the kernel's DMA + run-loop + sync floor without the
# edge/depth arithmetic.  Wrong images — bench instrumentation only.
EVAL_NOP = _os.environ.get("KANI_EVAL_NOP", "0") == "1"
# KANI_P2LUT=broadcast replaces phase-2's per-pixel lane LUTs
# (take_along_axis) with a plain row broadcast of the same shape: isolates
# the dynamic-gather cost from the DMA/FMA/select cost.  Wrong images —
# bench instrumentation only.
P2LUT = _os.environ.get("KANI_P2LUT", "lut")
# KANI_P2=mm: resolve phase-2 winner records with ONE MXU matmul per
# winner chunk (recordsᵀ @ one-hot(winner slot)) accumulated over the
# compacted list, then do the varying math ONCE per tile — replaces the
# ~66 per-chunk lane LUTs + per-chunk selects of the default "lut" path.
# Correct images (same records, same math, summed over disjoint one-hots).
P2 = _os.environ.get("KANI_P2", "lut")
# Clip-free RUN fast path (always on with stream binning; KANI_RUNCF=0
# disables for A/B): the stream binner's run entries carry a bit that
# certifies every triangle of the run's chunks passes the depth clip at
# every covered pixel (ops/vertex.py TriangleSetup.clipfree, chunk-ANDed
# then run-ANDed in ops/binning.bin_stream).  The run loop branches ONCE
# per run between a fast body — coverage is the three edge terms only,
# −3 of ~14 VPU ops per triangle·tile — and the full five-plane body.
# At the bench scene every main-camera run certifies (the projective
# depth range puts all in-frustum geometry strictly inside z ∈ [0, 1]);
# only near-plane crossers take the full body.
RUNCF = _os.environ.get("KANI_RUNCF", "1") != "0"
# Cross-tile double-buffering of the stream-window SMEM fetch (each tile
# issues the NEXT tile's window DMA; see _list_plumbing).  KANI_WINPF=0
# reverts to the synchronous per-tile fetch for A/B.
WINPF = _os.environ.get("KANI_WINPF", "1") != "0"
# KANI_EVAL_LOOP=1: iterate the per-chunk subbatch sweep with a
# lax.fori_loop instead of Python unrolling — the unrolled kernel body is
# RUN_CHUNKS × SUBS_PER_CHUNK × ~45 vector ops (doubled again by the
# dual clip-free bodies), and if the scalar core is instruction-fetch
# bound the 8x smaller program wins despite the loop-counter overhead.
EVAL_LOOP = _os.environ.get("KANI_EVAL_LOOP", "0") == "1"
# Sub-tile occlusion culling (round 4, the semantic change VERDICT r3
# demanded): the stream binner orders each tile's runs FRONT-TO-BACK by a
# conservative per-run depth bound and packs (bound, strip y-range) into
# stream lane 2 (ops/binning.bin_stream); the kernels keep a per-4-row
# STRIP z-max table in SMEM, refreshed by an in-kernel reduce every
# OCC_PERIOD runs, and skip a run's whole evaluation when its bound
# exceeds the max strip z over the rows it can touch — exactly
# output-preserving (a skipped run cannot win any pixel; only z-TIE
# resolution order changes, see the tie note in bin_stream).  KANI_OCC:
# "shadow" (default) = depth-only rasters (the ortho shadow grid skips
# 65-80% of runs — scripts/occ_stats.py — and the fresh-shadow bench
# measured 15.59 → 18.95 FPS on-chip, jobs r4/002-005); "1" = everywhere
# (for occlusion-heavy content; the headline scene's perspective grid
# has a measured skip CEILING of ~2%, so there the machinery costs more
# than it saves: 18.38 vs 18.95); "0" = off for A/B.
OCC_MODE = _os.environ.get("KANI_OCC", "shadow")
OCC = OCC_MODE != "0"
# Strip-table refresh period (consumed runs between refreshes).  1 —
# refresh after every run — measured best in the CPU replay
# (scripts/occ_stats.py, shadow grid: 82.6 / 81.9 / 78.8 % eval drop for
# period 1/2/4; tiles average only a few runs, so coarser periods miss
# the window entirely on sparse tiles).  The refresh is ~nstrips
# cross-lane reduces — cheap next to even a one-chunk run evaluation.
OCC_PERIOD = int(_os.environ.get("KANI_OCC_PERIOD", "1"))
# Phase-1 tournament shape.  "tree" materializes all SUBBATCH candidate
# z planes and merges pairwise (short dependency chain, but up to 16
# live (tile_h, tile_w) arrays -> heavy vreg pressure / spill); "run"
# folds each triangle into a running (z, k) accumulator as soon as it is
# computed (SUBBATCH-long serial chain, ~3 live arrays).  The clip-free
# A/B (docs/PERFORMANCE.md: removing 3 of ~12 VPU ops per triangle was
# NEUTRAL) says phase-1 is not op-count bound — this knob tested the
# spill hypothesis.  On-chip whole-frame A/B (jobs s4/014-017):
# run 26.72 / 26.71 vs tree 26.61 FPS, proofs bit-identical — "run" is
# marginally ahead and never worse, so it is the default; the near-
# neutrality also rules out vreg spill as phase-1's bound.
TOURN = _os.environ.get("KANI_TOURN", "run")


def _mk_bits(mask, k):
    """Subbatch bits of run-chunk ``k`` from the packed per-run mask."""
    return (mask >> (MASK_BITS * k)) % (1 << MASK_BITS)


def _run_chunk_sweep(chunk_buf, slot, cid0, ln, mask, fast, eval_subbatch):
    """Sweep a run's RUN_CHUNKS × SUBS_PER_CHUNK subbatches.

    Precomputed subbatch overlap bits make the skip a pure scalar branch
    (no vector reduce + scalar-core sync).  KANI_EVAL_LOOP=1 replaces the
    Python-unrolled subbatch sweep with a lax.fori_loop (dynamic,
    sublane-aligned row slices) — same semantics, ~8x smaller program.
    """
    for k in range(RUN_CHUNKS):
        mk = _mk_bits(mask, k)
        guard_k = (mk > 0) if SUBBATCH_SKIP else (k < ln)

        @pl.when(guard_k)
        def _(k=k, mk=mk):
            chunk = chunk_buf[slot, k]   # (CHUNK_SIZE, 128)
            cid = cid0 + k

            if EVAL_LOOP:
                def b_body(b, _):
                    rows = chunk_buf[slot, k, pl.ds(b * SUBBATCH, SUBBATCH),
                                     :]
                    guard_b = ((mk >> b) % 2 > 0) if SUBBATCH_SKIP \
                        else (b >= 0)

                    @pl.when(guard_b)
                    def _():
                        eval_subbatch(rows, cid, b, fast=fast)
                    return 0

                jax.lax.fori_loop(0, SUBS_PER_CHUNK, b_body, 0)
                return

            for b in range(SUBS_PER_CHUNK):
                rows = chunk[b * SUBBATCH:(b + 1) * SUBBATCH, :]

                if not SUBBATCH_SKIP:
                    eval_subbatch(rows, cid, b, fast=fast)
                    continue

                @pl.when((mk >> b) % 2 > 0)
                def _(rows=rows, cid=cid, b=b):
                    eval_subbatch(rows, cid, b, fast=fast)
def _occ_strip_fns(strips_ref, z_ref, nstrips, srows):
    """Per-tile strip z-max table ops (sub-tile occlusion culling).

    ``strips_ref``: SMEM (1, 16) f32; entries [0, nstrips) hold an upper
    bound on max(z_ref[strip rows]) as of the last refresh — z only
    decreases, so stale values are conservative.  ``range_max`` returns
    the max over strips [ys0, ys1] as an unrolled scalar select chain
    (nstrips ≤ 16)."""
    def init():
        for st in range(nstrips):
            strips_ref[0, st] = jnp.float32(1.0)

    def refresh():
        for st in range(nstrips):
            strips_ref[0, st] = jnp.max(
                z_ref[st * srows:(st + 1) * srows, :])

    def range_max(ys0, ys1):
        m = jnp.float32(0.0)
        for st in range(nstrips):
            v = strips_ref[0, st]
            m = jnp.maximum(
                m, jnp.where((st >= ys0) & (st <= ys1), v, 0.0))
        return m

    return init, refresh, range_max


def _run_pipeline(occ, count, dma, get_run, get_mask, get_zocc, flags_ref,
                  range_max, refresh, eval_run):
    """Shared NBUF-deep run DMA pipeline with the issue-time occlusion
    skip.

    The skip decision is made when the run's DMA WOULD be issued
    (NBUF−1 runs ahead of consumption), so a skipped run pays neither
    the fetch nor the eval.  Validity: zbound = 1 − qz·2⁻²² ≤ the true
    depth of every pixel the run can cover (binning.bin_stream), the
    strip table only ever tightens (z is a running min), and the
    decision is recorded in ``flags_ref`` so DMA start/wait stay
    perfectly paired per slot.  qz = 0 (padded / occlusion-less payload)
    never skips by construction.  ``eval_run(s, slot, cid0, cf, ln,
    mask)`` does the kernel-specific work; the strip table refreshes
    every OCC_PERIOD consumed runs."""
    def issue(r):
        if not occ:
            dma(r % NBUF, get_run(r)[0]).start()
            return
        e3 = get_zocc(r)
        q = e3 // 256
        zbound = 1.0 - q.astype(jnp.float32) * (2.0 ** -binning.OCC_QBITS)
        m = range_max((e3 // 16) % 16, e3 % 16)
        sk = jnp.logical_and(q > 0, zbound > m)
        flags_ref[r // 128, r % 128] = sk.astype(jnp.int32)

        @pl.when(~sk)
        def _():
            dma(r % NBUF, get_run(r)[0]).start()

    for w in range(NBUF - 1):
        @pl.when(w < count)
        def _(w=w):
            issue(w)

    def run_body(s, _):
        slot = s % NBUF

        @pl.when(s + NBUF - 1 < count)
        def _():
            issue(s + NBUF - 1)

        cid0, cf, ln = get_run(s)
        mask = get_mask(s)
        if occ:
            @pl.when(flags_ref[s // 128, s % 128] == 0)
            def _():
                # DMA start/wait must stay paired, so the wait is
                # unconditional here — but the strips may have tightened
                # in the NBUF−1 runs since the issue decision, so
                # re-check before paying the eval.
                dma(slot, cid0).wait()
                e3 = get_zocc(s)
                q = e3 // 256
                zb = 1.0 - q.astype(jnp.float32) \
                    * (2.0 ** -binning.OCC_QBITS)
                m = range_max((e3 // 16) % 16, e3 % 16)

                @pl.when(jnp.logical_or(zb <= m, q == 0))
                def _():
                    eval_run(s, slot, cid0, cf, ln, mask)

            @pl.when(s % OCC_PERIOD == OCC_PERIOD - 1)
            def _():
                refresh()
        else:
            dma(slot, cid0).wait()
            eval_run(s, slot, cid0, cf, ln, mask)
        return 0

    jax.lax.fori_loop(0, count, run_body, 0)


# >128-triangle chunks break the phase-2 128-lane LUT.
assert CHUNK_SIZE <= 128, \
    f"KANI_CHUNK_SIZE={CHUNK_SIZE} must be at most 128"

# The fused kernel reads ONE per-chunk HBM record array,
# (C, CHUNK, REC_WIDTH=128) f32, both phases streaming slabs of it:
#  * lanes 0:NS — the triangle_setup rows (phase-1 visibility reads only
#    these; the extra lanes ride the run DMA for free — bandwidth is
#    negligible and fully latency-hidden);
#  * lanes NS:FAT_LANES — phase-2 interpolation records from
#    interpolate.build_tri_records(..., setup=·):
#    [setup 0:16 | v0 varyings 16:33 | v1−v0 33:50 | v2−v0 50:67 |
#     mat, tex_w, tex_h, blk_hi, blk_lo, blk_w 67:73 | lsum row 73:76]
#    (varying DELTAS kill the per-pixel subtracts; the lsum edge row —
#    barycentric normalization is affine too — kills the l0 evaluation);
#  * lanes FAT_LANES:128 — zero pad.  Mosaic requires HBM DMA slices to
#    be 128-aligned along the minor (lane) dim — a run-granular
#    ``pl.ds`` slab of a (C, CHUNK, 16) slim array fails to compile
#    ("Slice shape along dimension 2 must be aligned to tiling (128)"),
#    so the record stack emits the 128-lane layout directly (one stack,
#    no relayout; the old 6-7 ms pack floor came from scattering
#    varyings into a gathered row layout, not from lane width).
REC0 = NS                 # 16
PAR0 = REC0 + 3 * USED    # 67
LSUM0 = PAR0 + 6          # 73
FAT_LANES = LSUM0 + 3     # 76 — used lanes of build_tri_records(setup=·)
REC_WIDTH = 128           # lane-aligned record width (DMA tiling)
P2_M = -(-FAT_LANES // 8) * 8  # KANI_P2=mm resolved lanes, sublane-rounded


def _interpret() -> bool:
    # Interpret on non-TPU backends (CPU tests).  NOTE: tunneled TPU
    # platforms may register under a different backend name (e.g. "axon"),
    # so detect by device kind, not backend name.
    try:
        return not any("tpu" in d.device_kind.lower()
                       for d in jax.devices())
    except Exception:
        return True


def _list_plumbing(hdr_ref, lists_hbm, list_smem, list_sem, tile_id, *,
                   stream_cpad, num_tiles):
    """Per-tile run-list access for both binning layouts.

    Returns (start_fetch, wait_fetch, get_count, get_run, get_mask,
    get_zocc) with ``get_run(s) -> (cid0, cf, len)`` — cf is the run's
    clip-free bit (constant 0 on the packed layout, which has no spare
    entry bit, and under KANI_RUNCF=0) — and ``get_zocc(s)`` the run's
    occlusion payload (stream lane 2; constant 0 on the packed layout).
    ``stream_cpad`` None = packed-block layout (one
    (16, 128) block per tile: [count, cid0·16+len entries …, per-run
    masks …]); an int = the flat stream layout (binning.StreamBins:
    window rows [row0, row0+W) of the (NR, 3, 128) stream +
    scalar-prefetched (row0, offset, count); entry =
    (tile·cpad+cid0)·32 + cf·16 + len).

    Stream-layout window fetches are double-buffered ACROSS grid steps
    (TPU grid steps run sequentially and scratch persists): each tile
    issues the NEXT tile's window DMA before doing its own work, so the
    per-tile SMEM fetch latency — exposed at tile start, where only the
    output inits can hide it — is paid once instead of num_tiles times.
    list_smem is (2, W, 2, 128) and list_sem a (2,) DMA semaphore; tile
    t uses slot t%2 (its window was issued at t−1; slot (t+1)%2 was
    consumed at t−1 and is free to overwrite)."""
    if stream_cpad is None:
        dma = pltpu.make_async_copy(lists_hbm.at[tile_id], list_smem,
                                    list_sem)

        def get_count():
            return list_smem[0, 0]

        def get_run(s):
            t = s + 1
            e = list_smem[t // 128, t % 128]
            return e // 16, jnp.int32(0), e % 16

        def get_mask(s):
            # Per-run subbatch bits (second half of the packed block).
            return list_smem[8 + s // 128, s % 128]

        def get_zocc(s):
            return jnp.int32(0)

        return dma.start, dma.wait, get_count, get_run, get_mask, get_zocc

    loff = hdr_ref[1, tile_id]
    W = list_smem.shape[1]
    slot = tile_id % 2

    def window_dma(t, sl):
        return pltpu.make_async_copy(
            lists_hbm.at[pl.ds(hdr_ref[0, t], W)], list_smem.at[sl],
            list_sem.at[sl])

    if WINPF:
        def start_fetch():
            @pl.when(tile_id == 0)
            def _():
                window_dma(0, 0).start()

            @pl.when(tile_id + 1 < num_tiles)
            def _():
                window_dma(tile_id + 1, (tile_id + 1) % 2).start()
    else:
        def start_fetch():
            window_dma(tile_id, slot).start()

    def wait_fetch():
        window_dma(tile_id, slot).wait()

    def get_count():
        return hdr_ref[2, tile_id]

    def get_run(s):
        t = loff + s
        e = list_smem[slot, t // 128, 0, t % 128]
        cf = (e // 16) % 2 if RUNCF else jnp.int32(0)
        return (e // 32) % stream_cpad, cf, e % 16

    def get_mask(s):
        t = loff + s
        return list_smem[slot, t // 128, 1, t % 128]

    def get_zocc(s):
        t = loff + s
        return list_smem[slot, t // 128, 2, t % 128]

    return start_fetch, wait_fetch, get_count, get_run, get_mask, get_zocc


def _raster_kernel(hdr_ref, lists_hbm, setup_hbm, z_ref, tri_ref,
                   b1_ref, b2_ref, list_smem, chunk_buf, strips_ref,
                   flags_ref, list_sem, sem, *,
                   tile_h, tile_w, tiles_x, num_tiles, wireframe,
                   wire_thresh, depth_only, stream_cpad, dual_cf, occ,
                   y_stride=1):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile_id = i * tiles_x + j

    (start_fetch, wait_fetch, get_count, get_run, get_mask,
     get_zocc) = _list_plumbing(
        hdr_ref, lists_hbm, list_smem, list_sem, tile_id,
        stream_cpad=stream_cpad, num_tiles=num_tiles)
    start_fetch()

    occ_init, occ_refresh, occ_range_max = _occ_strip_fns(
        strips_ref, z_ref, binning.occ_nstrips(tile_h),
        binning.occ_strip_rows(tile_h))
    if occ:
        occ_init()

    z_ref[:] = jnp.ones_like(z_ref)
    if not depth_only:
        tri_ref[:] = jnp.full_like(tri_ref, -1)
        b1_ref[:] = jnp.zeros_like(b1_ref)
        b2_ref[:] = jnp.zeros_like(b2_ref)

    wait_fetch()
    count = get_count()

    def dma(slot, cid0):
        # One DMA per RUN: RUN_CHUNKS consecutive chunks' setup rows
        # (setup_hbm is padded with RUN_CHUNKS-1 zero chunks at the end
        # so the fixed-size fetch is always in-bounds).
        return pltpu.make_async_copy(
            setup_hbm.at[pl.ds(cid0, RUN_CHUNKS)], chunk_buf.at[slot],
            sem.at[slot])

    tx0f = (j * tile_w).astype(jnp.float32)
    # Interleaved row-band mode (y_stride > 1): the grid's band tile row
    # i maps to GLOBAL tile row i·y_stride + k; the traced k·tile_h
    # offset is folded into the plane constants host-side (the same
    # c ← c + b·y0 re-anchor contiguous bands use), so the kernel's y is
    # simply stride-scaled — a static constant, no extra operand.
    ty0f = (i * (tile_h * y_stride)).astype(jnp.float32)

    # Decomposed plane evaluation: a·x + b·y + c = (a·X + c)[lanes]
    # + (b·Y)[sublanes], so each per-triangle (tile_h, tile_w) plane is
    # ONE broadcast add instead of two full-tile FMAs — the kernel is
    # VPU-instruction-bound, so this halves its dominant cost.
    Xr = tx0f + 0.5 + jax.lax.broadcasted_iota(
        jnp.int32, (1, tile_w), 1).astype(jnp.float32)      # (1, W)
    Yc = ty0f + 0.5 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, 1), 0).astype(jnp.float32)      # (H, 1)

    def eval_subbatch(rows, cid, b, fast=False):
        """Edge/depth evaluation of SUBBATCH triangles over the tile.

        Depth is the screen-AFFINE NDC z plane (setup col 9:12 — the
        adjugate construction makes the interpolated w constant per
        triangle, ops/vertex.py), so the in-batch tournament is a plain
        running min (depth-only) or one compare + selects: no rational
        cross-multiplies, no divides.  All per-pixel values stay 2D
        (tile_h, tile_w): the four planes per triangle come from small
        (SUB, W)/(H, SUB) precomputations + one broadcast add each (no 3D
        intermediates, whose k-extraction Mosaic lowers as copies).
        Uncovered pixels carry z = 2.0, which loses against z_ref (init
        1.0) automatically.

        ``fast``: the chunk is certified clip-free — coverage is the three
        edge terms only (the z ∈ [0, 1] clip is implied by the run's
        certification bit — see binning.bin_stream).
        """
        if EVAL_NOP:
            z_ref[:] = jnp.minimum(z_ref[:], 1.0 + rows[0, 0] * 1e-30)
            return
        cols = ((0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11))
        lxs = [rows[:, c0][:, None] * Xr + rows[:, c2][:, None]
               for (c0, _, c2) in cols]                      # (SUB, W) each
        lys = [Yc * rows[:, c1][None, :] for (_, c1, _) in cols]  # (H, SUB)
        if wireframe:
            # Edge-distance normalization folded into the SEPARABLE plane
            # components (d = l·g = lx·g + ly·g): scaling the (SUB, W) /
            # (H, SUB) halves broadcasts along ONE dimension each — a
            # (1, 1) → tile broadcast of g is "broadcast in both sublanes
            # and lanes", which Mosaic cannot lower (hardware compile
            # failure found benching WIREFRAME at 1080p, job r5/066).
            gv = [jax.lax.rsqrt(rows[:, c0] ** 2 + rows[:, c1] ** 2
                                + 1e-30)                     # (SUB,)
                  for (c0, c1, _) in cols[:3]]
            gxs = [lxs[t] * gv[t][:, None] for t in range(3)]
            gys = [lys[t] * gv[t][None, :] for t in range(3)]

        def entry_for(k):
            l0, l1, l2, z = [
                lxs[t][k:k + 1, :] + lys[t][:, k:k + 1] for t in range(4)]
            # Invalid rows carry e0.c ≡ −1 (l0 < 0 everywhere) → never
            # covered; no separate validity term.
            q = jnp.minimum(jnp.minimum(l0, l1), l2)
            if not fast:
                q = jnp.minimum(q, jnp.minimum(z, 1.0 - z))
            covered = q >= 0.0
            if wireframe:
                d = jnp.minimum(jnp.minimum(
                    gxs[0][k:k + 1, :] + gys[0][:, k:k + 1],
                    gxs[1][k:k + 1, :] + gys[1][:, k:k + 1]),
                    gxs[2][k:k + 1, :] + gys[2][:, k:k + 1])
                covered = covered & (d <= wire_thresh)

            z_c = jnp.where(covered, z, 2.0)
            if depth_only:
                return z_c
            return (z_c, jnp.full_like(z_c, float(k)),
                    l1, l2, l0 + l1 + l2)

        if depth_only and TOURN == "run":
            # Fold each triangle straight into the tile z as computed:
            # one live accumulator instead of SUBBATCH live planes.
            acc = z_ref[:]
            for k in range(SUBBATCH):
                acc = jnp.minimum(acc, entry_for(k))
            z_ref[:] = acc
            return

        entries = [entry_for(k) for k in range(SUBBATCH)]
        if depth_only:
            while len(entries) > 1:
                entries = [jnp.minimum(entries[k], entries[k + 1])
                           for k in range(0, len(entries), 2)]
            win_z = entries[0]
        else:
            def merge(a, bt):
                take_b = bt[0] < a[0]
                return tuple(jnp.where(take_b, fb, fa)
                             for fa, fb in zip(a, bt))

            while len(entries) > 1:
                entries = [merge(entries[k], entries[k + 1])
                           for k in range(0, len(entries), 2)]
            win = entries[0]
            win_z = win[0]

        if depth_only:
            # Pure running min — no compare/select pair needed.
            z_ref[:] = jnp.minimum(z_ref[:], win_z)
            return
        hit = win_z < z_ref[:]
        z_ref[:] = jnp.where(hit, win_z, z_ref[:])
        rid = win[1].astype(jnp.int32)
        lsum_w = jnp.where(win[4] != 0.0, win[4], 1e-30)
        w1 = win[2] / lsum_w
        w2 = win[3] / lsum_w
        tid = cid * CHUNK_SIZE + b * SUBBATCH + rid
        tri_ref[:] = jnp.where(hit, tid, tri_ref[:])
        b1_ref[:] = jnp.where(hit, w1, b1_ref[:])
        b2_ref[:] = jnp.where(hit, w2, b2_ref[:])

    def eval_run(s, slot, cid0, cf, ln, mask):
        if dual_cf:
            # One scalar branch per run: certified runs drop the two
            # depth-clip coverage terms (−3 VPU ops/triangle·tile).
            @pl.when(cf > 0)
            def _():
                _run_chunk_sweep(chunk_buf, slot, cid0, ln, mask, True,
                                 eval_subbatch)

            @pl.when(cf == 0)
            def _():
                _run_chunk_sweep(chunk_buf, slot, cid0, ln, mask, False,
                                 eval_subbatch)
        else:
            _run_chunk_sweep(chunk_buf, slot, cid0, ln, mask, False,
                             eval_subbatch)

    _run_pipeline(occ, count, dma, get_run, get_mask, get_zocc, flags_ref,
                  occ_range_max, occ_refresh, eval_run)


def _list_scratch(num_chunks: int, cfg_k: int, cfg_g: int, bins):
    """(scratch shape, sem shape, extra leading operands, stream_cpad)
    per layout.  The stream layout's window buffer and DMA semaphore are
    doubled for the cross-tile prefetch (see _list_plumbing)."""
    if isinstance(bins, binning.StreamBins):
        W = binning.stream_win_rows(cfg_k, cfg_g)
        return (pltpu.SMEM((2, W, 3, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                [bins.header, bins.stream],
                binning.stream_cpad_for(num_chunks))
    return (pltpu.SMEM((16, 128), jnp.int32), pltpu.SemaphoreType.DMA(()),
            [bins.packed], None)


def _run(setup: Array, bins, tiles_x: int, tiles_y: int,
         tile_w: int, tile_h: int, wireframe: bool, wire_thresh: float,
         depth_only: bool, cfg_k: int, cfg_g: int, occ: bool = False,
         y_stride: int = 1, bins_tiles: int | None = None):
    C = setup.shape[0] // CHUNK_SIZE
    # RUN_CHUNKS-1 zero tail chunks keep the fixed-size run DMA in-bounds
    # for runs starting near the end.  NOTE: all-zero pad rows would pass
    # the affine-z coverage test (q = 0 ≥ 0 at z = 0), but pad chunks are
    # never EVALUATED — they are not members of any packed run, so their
    # per-run mask bits are 0 and the subbatch guards skip them.  (Invalid
    # rows inside real chunks carry e0.c = −1 → never covered.)
    # The reshape is free and the row-pad a cheap major-dim concat; the
    # lane pad NS → REC_WIDTH is required because Mosaic only DMAs
    # 128-aligned minor-dim slices out of HBM (a (RUN, CHUNK, 16) slab
    # fails to compile on hardware).
    setup_c = jnp.pad(setup.reshape(C, CHUNK_SIZE, NS),
                      ((0, RUN_CHUNKS - 1), (0, 0), (0, REC_WIDTH - NS)))
    ph, pw = tiles_y * tile_h, tiles_x * tile_w

    list_scratch, list_sem_t, list_ops, stream_cpad = _list_scratch(
        C, cfg_k, cfg_g, bins)
    # dual_cf/occ must match what the BINNER packed: with interleaved
    # bands the binning ran on the full grid (bins_tiles tiles), not the
    # band's tiles_x*tiles_y.
    bt = bins_tiles if bins_tiles is not None else tiles_x * tiles_y
    kernel = functools.partial(
        _raster_kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
        num_tiles=tiles_x * tiles_y,
        wireframe=wireframe, wire_thresh=wire_thresh, depth_only=depth_only,
        stream_cpad=stream_cpad,
        dual_cf=(stream_cpad is not None and RUNCF
                 and binning.stream_has_cf(bt, C)),
        occ=(occ and stream_cpad is not None and cfg_k + cfg_g <= 1024),
        y_stride=y_stride)

    stream = stream_cpad is not None
    bmap = ((lambda i, j, hdr: (i, j)) if stream else (lambda i, j: (i, j)))
    out_shape = [jax.ShapeDtypeStruct((ph, pw), jnp.float32)]
    out_specs = [pl.BlockSpec((tile_h, tile_w), bmap)]
    if not depth_only:
        out_shape += [jax.ShapeDtypeStruct((ph, pw), jnp.int32),
                      jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                      jax.ShapeDtypeStruct((ph, pw), jnp.float32)]
        out_specs += [pl.BlockSpec((tile_h, tile_w), bmap)] * 3

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # run lists (packed / stream)
        pl.BlockSpec(memory_space=pl.ANY),  # chunk setup rows
    ]
    scratch_shapes = [
        list_scratch,
        pltpu.VMEM((NBUF, RUN_CHUNKS, CHUNK_SIZE, REC_WIDTH), jnp.float32),
        pltpu.SMEM((1, 16), jnp.float32),   # occlusion strip z-max table
        pltpu.SMEM((8, 128), jnp.int32),    # per-run issue-skip flags
        list_sem_t,
        pltpu.SemaphoreType.DMA((NBUF,)),
    ]

    if stream:
        if depth_only:
            def kern(hdr, lists_hbm, setup_hbm, z_ref, list_smem, chunk_buf,
                     strips, flags, list_sem, sem):
                kernel(hdr, lists_hbm, setup_hbm, z_ref, None, None, None,
                       list_smem, chunk_buf, strips, flags, list_sem, sem)
        else:
            kern = kernel
        outs = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(tiles_y, tiles_x),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            interpret=_interpret(),
        )(*list_ops, setup_c)
    else:
        if depth_only:
            def kern(lists_hbm, setup_hbm, z_ref, list_smem, chunk_buf,
                     strips, flags, list_sem, sem):
                kernel(None, lists_hbm, setup_hbm, z_ref, None, None, None,
                       list_smem, chunk_buf, strips, flags, list_sem, sem)
        else:
            def kern(lists_hbm, setup_hbm, *rest):
                kernel(None, lists_hbm, setup_hbm, *rest)
        outs = pl.pallas_call(
            kern,
            grid=(tiles_y, tiles_x),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=_interpret(),
        )(*list_ops, setup_c)
    return outs


def _occ_on(num_tiles: int, tile_h: int, zmin, depth_only: bool = False,
            scope: str = "env") -> bool:
    """Static predicate: sub-tile occlusion is active for this grid —
    must be used identically by the binner call and the kernel compile
    (a z-ordered stream with an occlusion-blind kernel is merely an
    ordering change; the reverse would mis-skip — prevented belt-and-
    braces by the kernel's q == 0 never-skip guard).

    ``scope``: "env" defers to KANI_OCC (module default); any other
    value ("0" | "shadow" | "1") overrides it — RenderConfig.occ_scope
    rides the jit static config, so the content-adaptive gate
    (ops/occ_replay.choose_occ_scope) selects a scope per compiled
    config instead of mutating process env."""
    mode = OCC_MODE if scope == "env" else scope
    if mode == "auto":
        # KANI_OCC=auto resolves at scene load (api.run) into a concrete
        # RenderConfig.occ_scope; reaching the kernel unresolved means
        # the caller skipped the gate — use the safe default.
        mode = "shadow"
    if mode == "0":
        return False
    if mode == "shadow" and not depth_only:
        return False
    return (BIN_MODE == "stream" and zmin is not None
            and binning.stream_has_occ(num_tiles, tile_h))


def _bin(bbox, tiles_x, tiles_y, tile_w, tile_h, S, K, G, clipfree,
         zmin=None, depth_only=False, occ_scope="env"):
    binner = binning.bin_stream if BIN_MODE == "stream" else binning.bin_chunks
    return binner(bbox, tiles_x, tiles_y, tile_w, tile_h, S, K, G,
                  clipfree=clipfree,
                  zmin=zmin if _occ_on(tiles_x * tiles_y, tile_h, zmin,
                                       depth_only, occ_scope)
                  else None)


@functools.partial(jax.jit, static_argnames=("config", "wireframe"))
def rasterize(st: TriangleSetup, config: RenderConfig,
              wireframe: bool = False) -> VisBuffer:
    cfg = config
    occ = _occ_on(cfg.tiles_x * cfg.tiles_y, cfg.tile_h, st.zmin,
                  scope=cfg.occ_scope)
    bins = _bin(st.bbox, cfg.tiles_x, cfg.tiles_y, cfg.tile_w, cfg.tile_h,
                cfg.max_tiles_per_chunk, cfg.max_chunks_per_tile,
                cfg.max_global_chunks, st.clipfree, st.zmin,
                occ_scope=cfg.occ_scope)
    z, tri, b1, b2 = _run(st.setup, bins, cfg.tiles_x, cfg.tiles_y,
                          cfg.tile_w, cfg.tile_h, wireframe,
                          cfg.wire_thresh_px, False,
                          cfg.max_chunks_per_tile, cfg.max_global_chunks,
                          occ=occ)
    H, W = cfg.height, cfg.width
    return VisBuffer(tri=tri[:H, :W], z=z[:H, :W],
                     bary=jnp.stack([b1[:H, :W], b2[:H, :W]], axis=-1))


def _fused_kernel(hdr_ref, lists_hbm, rec_hbm, z_ref, vary_ref, mat_ref,
                  tw_ref, th_ref, base_ref, bw_ref, tid_ref, list_smem,
                  chunk_buf, fat_buf, cand_ref, win_smem, cnt_smem,
                  strips_ref, flags_ref, list_sem, sem, *, tile_h,
                  tile_w, tiles_x, num_tiles, wireframe, wire_thresh,
                  stream_cpad, dual_cf, occ, y_stride=1):
    """Raster + interpolate in one pass over the tile's run list.

    Phase 1 — visibility: the tournament of ``_raster_kernel`` with a slim
    (z, rid) payload over the tile's RUN list (one DMA per ≤
    RUN_CHUNKS consecutive chunks of the 128-lane record array — the
    setup lanes 0:NS are all phase 1 touches; the rest rides for free);
    the winner is stored as its GLOBAL triangle id (cid·CHUNK + local)
    so phase 2 can find its chunk.

    Phase 2 — interpolation: compact the winner chunk ids into SMEM, DMA
    only chunks that won at least one pixel, and resolve the winner's full
    shading record from VMEM via lane-wise ``dynamic_gather`` LUT lookups
    (the TPU has no per-pixel HBM gather; XLA-level row gathers cost
    ~11 ns/row beyond VMEM, which at 1080p is ~23 ms/gather — this kernel
    replaces the per-pixel record gather of ops/interpolate.py entirely).
    Barycentrics are recomputed here from the LUT'd edge rows, keeping the
    phase-1 tournament payload minimal.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile_id = i * tiles_x + j

    (start_fetch, wait_fetch, get_count, get_run, get_mask,
     get_zocc) = _list_plumbing(
        hdr_ref, lists_hbm, list_smem, list_sem, tile_id,
        stream_cpad=stream_cpad, num_tiles=num_tiles)
    start_fetch()

    occ_init, occ_refresh, occ_range_max = _occ_strip_fns(
        strips_ref, z_ref, binning.occ_nstrips(tile_h),
        binning.occ_strip_rows(tile_h))
    if occ:
        occ_init()

    z_ref[:] = jnp.ones_like(z_ref)
    cand_ref[:] = jnp.full_like(cand_ref, -1)

    wait_fetch()
    count = get_count()

    def dma(slot, cid0):
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(cid0, RUN_CHUNKS)], chunk_buf.at[slot],
            sem.at[slot])

    tx0f = (j * tile_w).astype(jnp.float32)
    # Interleaved bands: stride-scaled y (see _raster_kernel).
    ty0f = (i * (tile_h * y_stride)).astype(jnp.float32)
    X = tx0f + 0.5 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    Y = ty0f + 0.5 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    # Decomposed plane evaluation (see _raster_kernel): one broadcast add
    # per per-triangle plane instead of two full-tile FMAs.
    Xr = X[0:1, :]                                          # (1, W)
    Yc = Y[:, 0:1]                                          # (H, 1)

    def eval_subbatch(rows, cid, b, fast=False):
        # Affine-z tournament — see _raster_kernel.eval_subbatch.
        if EVAL_NOP:
            z_ref[:] = jnp.minimum(z_ref[:], 1.0 + rows[0, 0] * 1e-30)
            return
        cols = ((0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11))
        lxs = [rows[:, c0][:, None] * Xr + rows[:, c2][:, None]
               for (c0, _, c2) in cols]                      # (SUB, W) each
        lys = [Yc * rows[:, c1][None, :] for (_, c1, _) in cols]  # (H, SUB)
        if wireframe:
            # Edge-distance normalization folded into the SEPARABLE plane
            # components (d = l·g = lx·g + ly·g): scaling the (SUB, W) /
            # (H, SUB) halves broadcasts along ONE dimension each — a
            # (1, 1) → tile broadcast of g is "broadcast in both sublanes
            # and lanes", which Mosaic cannot lower (hardware compile
            # failure found benching WIREFRAME at 1080p, job r5/066).
            gv = [jax.lax.rsqrt(rows[:, c0] ** 2 + rows[:, c1] ** 2
                                + 1e-30)                     # (SUB,)
                  for (c0, c1, _) in cols[:3]]
            gxs = [lxs[t] * gv[t][:, None] for t in range(3)]
            gys = [lys[t] * gv[t][None, :] for t in range(3)]

        def z_for(k):
            l0, l1, l2, z = [
                lxs[t][k:k + 1, :] + lys[t][:, k:k + 1] for t in range(4)]
            # Invalid rows carry e0.c ≡ −1 (l0 < 0 everywhere) → never
            # covered.  ``fast``: clip-free chunk, edge terms only.
            q = jnp.minimum(jnp.minimum(l0, l1), l2)
            if not fast:
                q = jnp.minimum(q, jnp.minimum(z, 1.0 - z))
            covered = q >= 0.0
            if wireframe:
                d = jnp.minimum(jnp.minimum(
                    gxs[0][k:k + 1, :] + gys[0][:, k:k + 1],
                    gxs[1][k:k + 1, :] + gys[1][:, k:k + 1]),
                    gxs[2][k:k + 1, :] + gys[2][:, k:k + 1])
                covered = covered & (d <= wire_thresh)
            return jnp.where(covered, z, 2.0)

        if TOURN == "run":
            # Running (z, k) fold: strict-< keeps the earlier triangle on
            # ties, identical to the tree below.
            win_z = z_for(0)
            win_k = jnp.zeros_like(win_z)
            for k in range(1, SUBBATCH):
                z_c = z_for(k)
                take = z_c < win_z
                win_z = jnp.minimum(win_z, z_c)
                win_k = jnp.where(take, float(k), win_k)
        else:
            entries = [z_for(k) for k in range(SUBBATCH)]
            # Winner-index accumulation from per-level compare bits: the
            # leaf pair's take_b IS the low index bit (a bool cast, no
            # materialized k field), and each upper merge adds 2^level
            # when the right subtree wins.  Ties keep the left/earlier
            # triangle, exactly like a strict-< select tournament.
            if SUBBATCH == 1:
                pairs = [(entries[0], jnp.zeros_like(entries[0]))]
            else:
                pairs = [(jnp.minimum(entries[k], entries[k + 1]),
                          (entries[k + 1] < entries[k]).astype(jnp.float32))
                         for k in range(0, SUBBATCH, 2)]
            lvl = 1
            while len(pairs) > 1:
                nxt = []
                for k in range(0, len(pairs), 2):
                    (za, ka), (zb, kb) = pairs[k], pairs[k + 1]
                    take_b = zb < za
                    nxt.append((jnp.minimum(za, zb),
                                jnp.where(take_b, kb + float(1 << lvl), ka)))
                pairs = nxt
                lvl += 1
            win_z, win_k = pairs[0]

        hit = win_z < z_ref[:]
        z_ref[:] = jnp.where(hit, win_z, z_ref[:])
        local = b * SUBBATCH + win_k.astype(jnp.int32)
        cand_ref[:] = jnp.where(hit, cid * CHUNK_SIZE + local, cand_ref[:])

    def eval_run(s, slot, cid0, cf, ln, mask):
        if dual_cf:
            # One scalar branch per run: certified runs drop the two
            # depth-clip coverage terms (−3 VPU ops/triangle·tile).
            @pl.when(cf > 0)
            def _():
                _run_chunk_sweep(chunk_buf, slot, cid0, ln, mask, True,
                                 eval_subbatch)

            @pl.when(cf == 0)
            def _():
                _run_chunk_sweep(chunk_buf, slot, cid0, ln, mask, False,
                                 eval_subbatch)
        else:
            _run_chunk_sweep(chunk_buf, slot, cid0, ln, mask, False,
                             eval_subbatch)

    _run_pipeline(occ, count, dma, get_run, get_mask, get_zocc, flags_ref,
                  occ_range_max, occ_refresh, eval_run)

    # ---- phase 2: winner-chunk record interpolation ----
    for c in range(USED):
        vary_ref[c] = jnp.zeros((tile_h, tile_w), jnp.float32)
    mat_ref[:] = jnp.zeros_like(mat_ref)
    tw_ref[:] = jnp.ones_like(tw_ref)
    th_ref[:] = jnp.ones_like(th_ref)
    base_ref[:] = jnp.zeros_like(base_ref)
    bw_ref[:] = jnp.ones_like(bw_ref)
    tid_ref[:] = jnp.full_like(tid_ref, -1)

    cand = cand_ref[:]
    win_cid = cand // CHUNK_SIZE          # -1 stays -1 (floor division)

    if FUSED_PHASE == "p1":
        tid_ref[:] = cand                 # keep the winner ids observable
        return

    # Compact the winner RUNS into SMEM: only a handful of the tile's
    # chunks actually win pixels, so phase 2's DMA pipeline (and every
    # per-run sync) walks the compacted list instead of the full one.
    # Each compacted entry is ``cid0·16 + winner-chunk bitmask`` — one
    # run DMA then serves every winning chunk of the run (winner cids are
    # Morton-adjacent, so multi-winner runs are the common case).  Per
    # run, one range-reduce detects any winner; the per-chunk equality
    # reduces only run for runs that have one.
    cnt_smem[0, 0] = 0

    def compact_body(s, _):
        cid0, _cf, ln = get_run(s)

        @pl.when(((win_cid >= cid0) & (win_cid < cid0 + ln)).any())
        def _():
            kb = jnp.int32(0)
            for k in range(RUN_CHUNKS):
                found = jnp.logical_and(k < ln,
                                        (win_cid == cid0 + k).any())
                kb = kb + jnp.where(found, 1 << k, 0)
            c = cnt_smem[0, 0]
            win_smem[c // 128, c % 128] = cid0 * 16 + kb
            cnt_smem[0, 0] = c + 1
        return 0

    jax.lax.fori_loop(0, count, compact_body, 0)
    nwin = cnt_smem[0, 0]

    if FUSED_PHASE == "p1c":
        tid_ref[:] = cand
        mat_ref[:] = jnp.full_like(mat_ref, 0) + nwin  # observe compaction
        return

    def get_wrun(r):
        e = win_smem[r // 128, r % 128]
        return e // 16, e % 16

    def dma_wrun(slot, cid0):
        # Phase 2 streams the FAT record rows (setup + varyings + material
        # params) — only runs with a winner pay this fetch.
        return pltpu.make_async_copy(rec_hbm.at[pl.ds(cid0, RUN_CHUNKS)],
                                     fat_buf.at[slot], sem.at[slot])

    # NBUF-deep DMA pipeline over the compacted winner-run list.
    for w in range(NBUF - 1):
        @pl.when(w < nwin)
        def _(w=w):
            dma_wrun(w % NBUF, get_wrun(w)[0]).start()

    if P2 == "mm":
        # MXU record resolve: per winner chunk, recordsᵀ(P2_M, CHUNK) @
        # one-hot(CHUNK, H·W) selects every pixel's winner-record lanes in
        # one matmul; chunks' one-hots are disjoint, so plain accumulation
        # replaces the per-chunk selects, and the varying/barycentric math
        # runs ONCE per tile on the accumulated planes.  Non-winner chunks
        # of a run contribute an all-zero one-hot, so the inner loop runs
        # unconditionally.
        HW = tile_h * tile_w
        tri_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_SIZE, HW), 0)

        def interp_mm(r, acc):
            slot = r % NBUF

            @pl.when(r + NBUF - 1 < nwin)
            def _():
                dma_wrun((r + NBUF - 1) % NBUF,
                         get_wrun(r + NBUF - 1)[0]).start()

            cid0, _kb = get_wrun(r)
            dma_wrun(slot, cid0).wait()

            def k_body(k, acc):
                cid = cid0 + k
                mask = win_cid == cid
                # losers/uncovered index CHUNK_SIZE → all-zero one-hot
                local = jnp.where(mask, cand - cid * CHUNK_SIZE, CHUNK_SIZE)
                onehot = (tri_iota == local.reshape(1, HW)).astype(
                    jnp.float32)
                ct = fat_buf[slot, k].T[:P2_M]   # (P2_M, CHUNK_SIZE)
                return acc + jnp.dot(ct, onehot,
                                     preferred_element_type=jnp.float32)

            return jax.lax.fori_loop(0, RUN_CHUNKS, k_body, acc)

        resolved = jax.lax.fori_loop(
            0, nwin, interp_mm, jnp.zeros((P2_M, HW), jnp.float32))
        covered = cand >= 0

        def row(c):
            return resolved[c:c + 1, :].reshape(tile_h, tile_w)

        def rint(c, default):
            # records store ints as exact f32; the matmul resolve is exact
            # too (one-hot selection), but round defensively before casting
            v = (row(c) + 0.5).astype(jnp.int32)
            return jnp.where(covered, v, default)

        l1 = row(3) * X + row(4) * Y + row(5)
        l2 = row(6) * X + row(7) * Y + row(8)
        lsum = row(LSUM0) * X + row(LSUM0 + 1) * Y + row(LSUM0 + 2)
        lsafe = jnp.where(lsum != 0.0, lsum, 1e-30)
        w1 = l1 / lsafe
        w2 = l2 / lsafe
        for c in range(USED):
            vary_ref[c] = (row(REC0 + c) + row(REC0 + USED + c) * w1
                           + row(REC0 + 2 * USED + c) * w2)
        mat_ref[:] = rint(PAR0, 0)
        tw_ref[:] = rint(PAR0 + 1, 1)
        th_ref[:] = rint(PAR0 + 2, 1)
        base_ref[:] = jnp.where(
            covered, rint(PAR0 + 3, 0) * 65536 + rint(PAR0 + 4, 0), 0)
        bw_ref[:] = rint(PAR0 + 5, 1)
        tid_ref[:] = cand
        return

    def interp_chunk(slot, k, cid):
        """Resolve the winner records of run-chunk ``k`` (traced) from
        the DMA'd run slab via lane-wise LUTs."""
        mask = win_cid == cid
        local = jnp.where(mask, cand - cid * CHUNK_SIZE, 0)
        chunk = fat_buf[slot, k]       # (CHUNK_SIZE, REC_WIDTH)
        if CHUNK_SIZE < 128:
            padded = jnp.concatenate(
                [chunk,
                 jnp.zeros((128 - CHUNK_SIZE, REC_WIDTH), jnp.float32)])
        else:
            padded = chunk
        ct = padded.T                  # (128 lanes->tri slots) per row

        def g(c):
            # tile_w > 128: repeat the 128-triangle record row per lane
            # group (winner indices stay < 128, so any copy serves).
            row = ct[c] if tile_w == 128 else jnp.concatenate(
                [ct[c]] * (tile_w // 128))
            lut = jnp.broadcast_to(row[None, :], (tile_h, tile_w))
            if P2LUT == "broadcast":
                return lut
            return jnp.take_along_axis(lut, local, axis=1)

        l1 = g(3) * X + g(4) * Y + g(5)
        l2 = g(6) * X + g(7) * Y + g(8)
        lsum = g(LSUM0) * X + g(LSUM0 + 1) * Y + g(LSUM0 + 2)
        lsafe = jnp.where(lsum != 0.0, lsum, 1e-30)
        w1 = l1 / lsafe
        w2 = l2 / lsafe

        for c in range(USED):
            val = (g(REC0 + c) + g(REC0 + USED + c) * w1
                   + g(REC0 + 2 * USED + c) * w2)
            vary_ref[c] = jnp.where(mask, val, vary_ref[c])

        mat_ref[:] = jnp.where(mask, g(PAR0).astype(jnp.int32),
                               mat_ref[:])
        tw_ref[:] = jnp.where(mask, g(PAR0 + 1).astype(jnp.int32),
                              tw_ref[:])
        th_ref[:] = jnp.where(mask, g(PAR0 + 2).astype(jnp.int32),
                              th_ref[:])
        base = (g(PAR0 + 3).astype(jnp.int32) * 65536
                + g(PAR0 + 4).astype(jnp.int32))
        base_ref[:] = jnp.where(mask, base, base_ref[:])
        bw_ref[:] = jnp.where(mask, g(PAR0 + 5).astype(jnp.int32),
                              bw_ref[:])
        tid_ref[:] = jnp.where(mask, cand, tid_ref[:])

    def interp_body(r, _):
        slot = r % NBUF

        @pl.when(r + NBUF - 1 < nwin)
        def _():
            dma_wrun((r + NBUF - 1) % NBUF, get_wrun(r + NBUF - 1)[0]).start()

        cid0, kb = get_wrun(r)
        dma_wrun(slot, cid0).wait()

        def k_body(k, _):
            @pl.when((kb >> k) % 2 > 0)
            def _():
                interp_chunk(slot, k, cid0 + k)
            return 0

        jax.lax.fori_loop(0, RUN_CHUNKS, k_body, 0)
        return 0

    jax.lax.fori_loop(0, nwin, interp_body, 0)


def _run_fused(rec_c: Array, bins,
               tile_w: int, tile_h: int, tiles_x: int, tiles_y: int,
               wireframe: bool, wire_thresh: float,
               cfg_k: int, cfg_g: int, occ: bool = False,
               y_stride: int = 1, bins_tiles: int | None = None):
    ph, pw = tiles_y * tile_h, tiles_x * tile_w
    C = rec_c.shape[0] - (RUN_CHUNKS - 1)   # rec_c carries the DMA tail pad
    list_scratch, list_sem_t, list_ops, stream_cpad = _list_scratch(
        C, cfg_k, cfg_g, bins)
    bt = bins_tiles if bins_tiles is not None else tiles_x * tiles_y
    kernel = functools.partial(
        _fused_kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
        num_tiles=tiles_x * tiles_y,
        wireframe=wireframe, wire_thresh=wire_thresh,
        stream_cpad=stream_cpad,
        dual_cf=(stream_cpad is not None and RUNCF
                 and binning.stream_has_cf(bt, C)),
        occ=(occ and stream_cpad is not None and cfg_k + cfg_g <= 1024),
        y_stride=y_stride)

    stream = stream_cpad is not None
    bmap = ((lambda i, j, hdr: (i, j)) if stream else (lambda i, j: (i, j)))
    vmap_ = ((lambda i, j, hdr: (0, i, j)) if stream
             else (lambda i, j: (0, i, j)))
    plane_f = jax.ShapeDtypeStruct((ph, pw), jnp.float32)
    plane_i = jax.ShapeDtypeStruct((ph, pw), jnp.int32)
    bspec = pl.BlockSpec((tile_h, tile_w), bmap)
    vspec = pl.BlockSpec((USED, tile_h, tile_w), vmap_)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = [bspec, vspec] + [bspec] * 6
    out_shape = [plane_f,
                 jax.ShapeDtypeStruct((USED, ph, pw), jnp.float32),
                 plane_i, plane_i, plane_i, plane_i, plane_i, plane_i]
    scratch_shapes = [
        list_scratch,
        pltpu.VMEM((NBUF, RUN_CHUNKS, CHUNK_SIZE, REC_WIDTH), jnp.float32),
        pltpu.VMEM((NBUF, RUN_CHUNKS, CHUNK_SIZE, REC_WIDTH), jnp.float32),
        pltpu.VMEM((tile_h, tile_w), jnp.int32),
        pltpu.SMEM((8, 128), jnp.int32),
        pltpu.SMEM((1, 1), jnp.int32),
        pltpu.SMEM((1, 16), jnp.float32),   # occlusion strip z-max table
        pltpu.SMEM((8, 128), jnp.int32),    # per-run issue-skip flags
        list_sem_t,
        pltpu.SemaphoreType.DMA((NBUF,)),
    ]

    if stream:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(tiles_y, tiles_x),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            interpret=_interpret(),
        )(*list_ops, rec_c)

    def kern(lists_hbm, rec_hbm, *rest):
        kernel(None, lists_hbm, rec_hbm, *rest)

    return pl.pallas_call(
        kern,
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
    )(*list_ops, rec_c)




def _slice_stream_bins(bins, tiles_band: int, y_stride: int,
                       tiles_x: int, k):
    """Interleaved-band view of FULL-GRID stream binning: keep the shared
    run stream, take this chip's per-tile header columns — global tile
    row r belongs to chip k iff r % y_stride == k, at band tile row
    r // y_stride.  ``k`` is traced (lax.axis_index under shard_map)."""
    assert isinstance(bins, binning.StreamBins), \
        "interleaved bands require stream binning (KANI_BIN=stream)"
    hdr = bins.header.reshape(3, tiles_band, y_stride, tiles_x)
    hdr = jax.lax.dynamic_index_in_dim(hdr, k, axis=2, keepdims=False)
    return bins._replace(header=hdr.reshape(3, tiles_band * tiles_x))


@functools.partial(jax.jit,
                   static_argnames=("config", "wireframe", "band_h",
                                    "y_stride"))
def rasterize_pixels(st: TriangleSetup, records: Array,
                     config: RenderConfig,
                     wireframe: bool = False,
                     band_h: int | None = None,
                     y0: Array | None = None,
                     y_stride: int = 1) -> PixelBuffer:
    """Fused visibility raster + record interpolation (one Pallas launch).

    ``records``: (T, REC_WIDTH=128) per-triangle shading records from
    ops/interpolate.build_tri_records(..., setup=st.setup) — setup rows
    prepended so phase 2 can recompute barycentrics from one fetch.  Returns the same PixelBuffer the
    XLA path (rasterize_xla → interpolate) produces, so shading and tests
    are backend-agnostic from here on.

    ``band_h``/``y0``: render only screen rows [y0, y0+band_h) — the
    multi-chip row-band sharding path (parallel/mesh.py).  ``y0`` may be
    traced (it derives from ``lax.axis_index`` under shard_map): rather
    than plumbing it into the kernel, the linear edge/depth equations are
    re-anchored (c ← c + b·y0) and the bboxes shifted, so the kernel
    always rasterizes rows [0, band_h).

    ``y_stride`` > 1 — INTERLEAVED bands (load balancing, r5): the band
    is tile rows k, k+y_stride, k+2·y_stride, … of the full frame
    (k = y0 / tile_h, traced), so content skew spreads evenly across
    chips instead of gating the frame on the heaviest contiguous band
    (measured 23.2 vs 17.6 ms at n=2 — multichip_scaling_r5.json).
    Binning runs on the FULL grid (the stream is shared; each chip takes
    its tile columns of the header) and the kernel's y is stride-scaled
    (a static constant — no extra kernel operand).  band_h must be
    tiles_band·tile_h; band row block j holds global tile row
    j·y_stride + k.
    """
    cfg = config
    setup, bbox = st.setup, st.bbox
    if band_h is None:
        band_h = cfg.height
    if y_stride > 1:
        assert y0 is not None and band_h % cfg.tile_h == 0, \
            "interleaved bands need y0 and a tile-aligned band_h"
    y0f = None
    if y0 is not None:
        y0f = jnp.asarray(y0, jnp.float32)
        cols = jnp.array([2, 5, 8, 11, 14])
        setup = setup.at[:, cols].add(setup[:, cols - 1] * y0f)
        if y_stride == 1:
            bbox = bbox.at[:, jnp.array([1, 3])].add(-y0f)
        # The records' leading setup lanes AND the lsum edge row (lanes
        # LSUM0:LSUM0+3 — it is a plane too) feed phase-2's barycentric
        # recompute — re-anchor their constant lanes identically.
        rcols = jnp.array([2, 5, 8, 11, 14, LSUM0 + 2])
        records = records.at[:, rcols].add(records[:, rcols - 1] * y0f)
    tiles_y = -(-band_h // cfg.tile_h)
    bins_ty = tiles_y * y_stride   # full grid when interleaved
    occ = _occ_on(cfg.tiles_x * bins_ty, cfg.tile_h, st.zmin,
                  scope=cfg.occ_scope)
    bins = _bin(bbox, cfg.tiles_x, bins_ty, cfg.tile_w, cfg.tile_h,
                cfg.max_tiles_per_chunk, cfg.max_chunks_per_tile,
                cfg.max_global_chunks, st.clipfree, st.zmin,
                occ_scope=cfg.occ_scope)
    if y_stride > 1:
        k = jnp.round(y0f / cfg.tile_h).astype(jnp.int32)
        bins = _slice_stream_bins(bins, tiles_y, y_stride, cfg.tiles_x, k)
    C = setup.shape[0] // CHUNK_SIZE
    assert records.shape[1] == REC_WIDTH, \
        f"records must be {REC_WIDTH}-lane (got {records.shape[1]}) — " \
        "build them with build_tri_records(setup=·)/_corners"
    # One 128-lane record array for both kernel phases: reshape (free) +
    # run-tail pad (cheap row concat; pad chunks are never evaluated —
    # see _run).
    rec_c = jnp.pad(records.reshape(C, CHUNK_SIZE, REC_WIDTH),
                    ((0, RUN_CHUNKS - 1), (0, 0), (0, 0)))

    z, vary, mat, tw, th, base, bw, tid = _run_fused(
        rec_c, bins, cfg.tile_w, cfg.tile_h, cfg.tiles_x, tiles_y,
        wireframe, cfg.wire_thresh_px,
        cfg.max_chunks_per_tile, cfg.max_global_chunks, occ=occ,
        y_stride=y_stride, bins_tiles=cfg.tiles_x * bins_ty)
    H, W = band_h, cfg.width
    return PixelBuffer(varyings=vary[:, :H, :W], mat_id=mat[:H, :W],
                       tex_w=tw[:H, :W], tex_h=th[:H, :W],
                       blk_base=base[:H, :W], blk_w=bw[:H, :W],
                       mask=tid[:H, :W] >= 0,
                       z=z[:H, :W],
                       overflow=bins.overflow)


@functools.partial(jax.jit, static_argnames=("config", "band_h"))
def rasterize_depth(st: TriangleSetup, config: RenderConfig,
                    band_h: int | None = None, y0=None,
                    bins=None) -> Array:
    """Depth-only shadow-map raster (tiles over the shadow_dim square).

    ``band_h``/``y0`` restrict output to map rows [y0, y0+band_h) for the
    multi-chip sharded shadow pass — same traced-offset re-anchoring as
    ``rasterize_pixels``.

    ``bins``: optional precomputed binning output for ``st`` (the
    light-space setup and its bins are camera-independent, so fresh-shadow
    callers cache them across frames while the sun and geometry are
    static — passes/frame.render_shadow_geometry).  Mutually exclusive
    with ``y0`` (band re-anchoring shifts the bboxes the bins were built
    from)."""
    cfg = config
    dim = cfg.shadow_dim
    th = cfg.shadow_tile_h
    setup, bbox = st.setup, st.bbox
    H = dim if band_h is None else band_h
    if y0 is not None:
        assert bins is None, "precomputed bins are full-map only"
        y0f = jnp.asarray(y0, jnp.float32)
        cols = jnp.array([2, 5, 8, 11, 14])
        setup = setup.at[:, cols].add(setup[:, cols - 1] * y0f)
        bbox = bbox.at[:, jnp.array([1, 3])].add(-y0f)
    tiles_x = -(-dim // cfg.tile_w)
    tiles_y = -(-H // th)
    occ = _occ_on(tiles_x * tiles_y, th, st.zmin, depth_only=True,
                  scope=cfg.occ_scope)
    if bins is None:
        bins = _bin(bbox, tiles_x, tiles_y, cfg.tile_w, th,
                    cfg.max_tiles_per_chunk, cfg.shadow_chunks_per_tile,
                    cfg.max_global_chunks, st.clipfree, st.zmin,
                    depth_only=True, occ_scope=cfg.occ_scope)
    (z,) = _run(setup, bins, tiles_x, tiles_y, cfg.tile_w, th,
                False, 0.0, True,
                cfg.shadow_chunks_per_tile, cfg.max_global_chunks,
                occ=occ)
    return z[:H, :dim]
