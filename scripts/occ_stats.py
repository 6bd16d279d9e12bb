"""Measure the sub-tile occlusion skip rate at the bench poses (CPU).

Replays the Pallas kernels' exact skip logic (ops/raster_pallas:
_occ_run_gate — front-to-back runs, 4-row strip z-max table refreshed
every OCC_PERIOD runs) over the real binned stream of the headline scene,
evaluating the phase-1 depth planes in numpy so the strip table evolves
exactly as on device.  Reports triangle-subbatch evals with and without
the skip — the VERDICT r4 done-criterion for item 1 (>= 25% eval drop).

Usage:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
            python scripts/occ_stats.py [--shadow] [--json OUT]
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# The replay body now lives in the package (the content-adaptive gate
# uses it at scene load): kanirenderer_tpu/ops/occ_replay.simulate_tile.
from kanirenderer_tpu.ops.occ_replay import simulate_tile  # noqa: E402


def ceiling_tile(runs, setup, zmin_t, bbox_t, tile_x0, tile_y0, tile_h,
                 tile_w, gran, sub, subs_per_chunk, chunk):
    """Upper-bound variant: exact per-unit zmin/bbox, live z feedback
    (no strip table, no quantization, no refresh period).  ``gran`` in
    {"run", "chunk", "subbatch"}."""
    z = np.ones((tile_h, tile_w), np.float32)
    xs = tile_x0 + 0.5 + np.arange(tile_w, dtype=np.float32)
    ys = tile_y0 + 0.5 + np.arange(tile_h, dtype=np.float32)
    ev_tot = ev_done = 0

    def region_zmax(bb):
        x0 = int(np.clip(np.floor(bb[0] - tile_x0), 0, tile_w))
        y0 = int(np.clip(np.floor(bb[1] - tile_y0), 0, tile_h))
        x1 = int(np.clip(np.ceil(bb[2] - tile_x0), 0, tile_w))
        y1 = int(np.clip(np.ceil(bb[3] - tile_y0), 0, tile_h))
        if x1 <= x0 or y1 <= y0:
            return -1.0
        return float(z[y0:y1, x0:x1].max())

    def eval_sub(cid, b):
        rows = setup[cid * chunk + b * sub: cid * chunk + (b + 1) * sub]
        lx = rows[:, [0, 3, 6, 9], None] * xs[None, None, :] \
            + rows[:, [2, 5, 8, 11], None]
        ly = rows[:, [1, 4, 7, 10], None] * ys[None, None, :]
        l = lx[:, :, None, :] + ly[:, :, :, None]
        zt = l[:, 3]
        cov = ((l[:, 0] >= 0) & (l[:, 1] >= 0) & (l[:, 2] >= 0)
               & (zt >= 0) & (zt <= 1.0))
        return np.where(cov, zt, 2.0).min(axis=0)

    for (cid0, ln, mask, pay) in runs:
        for k in range(ln):
            cid = cid0 + k
            bits = (mask >> (subs_per_chunk * k)) & ((1 << subs_per_chunk) - 1)
            subs = [b for b in range(subs_per_chunk) if (bits >> b) & 1]
            ev_tot += len(subs) * sub
            if not subs:
                continue
            units = []
            if gran == "subbatch":
                for b in subs:
                    rs = slice(cid * chunk + b * sub,
                               cid * chunk + (b + 1) * sub)
                    zm = zmin_t[rs].min()
                    bb = (bbox_t[rs, 0].min(), bbox_t[rs, 1].min(),
                          bbox_t[rs, 2].max(), bbox_t[rs, 3].max())
                    units.append(([b], zm, bb))
            else:
                rs = slice(cid * chunk, (cid + 1) * chunk)
                zm = zmin_t[rs].min()
                bb = (bbox_t[rs, 0].min(), bbox_t[rs, 1].min(),
                      bbox_t[rs, 2].max(), bbox_t[rs, 3].max())
                units.append((subs, zm, bb))
            for bs, zm, bb in units:
                if zm > region_zmax(bb):
                    continue
                ev_done += len(bs) * sub
                for b in bs:
                    z = np.minimum(z, eval_sub(cid, b))
    return ev_tot, ev_done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shadow", action="store_true",
                    help="measure the 2048^2 shadow grid instead")
    ap.add_argument("--json", default=None)
    ap.add_argument("--ceiling", default=None,
                    choices=["chunk", "subbatch"],
                    help="measure the skip CEILING at this granularity "
                         "(exact bounds, live z) instead of the shipped "
                         "strip scheme")
    ap.add_argument("--frames", type=int, nargs="*", default=[0, 15, 29])
    ap.add_argument("--period", type=int, default=None,
                    help="override OCC_PERIOD for the replay")
    args = ap.parse_args()

    import jax.numpy as jnp
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.core import math3d
    from kanirenderer_tpu.core.types import CHUNK_SIZE, SUBBATCH, \
        SUBS_PER_CHUNK
    from kanirenderer_tpu.models.procedural import sponza_standin_scene
    from kanirenderer_tpu.ops import binning
    from kanirenderer_tpu.ops.vertex import run_vertex_stage, triangle_setup
    from kanirenderer_tpu.runtime.controllers import (update_camera,
                                                      CameraInputs)

    scene = sponza_standin_scene()
    lights = kani.default_lights()
    cfg = kani.RenderConfig(
        width=1920, height=1080, mode=kani.RenderMode.LIT_SHADOW,
        tile_h=32, shadow_tile_h=32,  # the bench/TPU tile shapes
        #              (RenderConfig defaults are CPU-test-sized)
        max_tiles_per_chunk=32, max_chunks_per_tile=512,
        max_global_chunks=128)

    cam = kani.CameraState(
        position=jnp.array([-1000.0, 180.0, 0.0], jnp.float32),
        yaw=jnp.float32(0.0), pitch=jnp.float32(np.deg2rad(-5.0)))
    cams = [cam]
    for _ in range(max(args.frames)):
        cams.append(update_camera(cams[-1], CameraInputs(forward=1.0,
                                                         rotate_dx=6.0),
                                  1.0 / 60.0))

    lvp = math3d.directional_light_view_projection(
        lights.directional.direction, lights.directional.distance,
        lights.directional.shadow_scene_size)
    out = {"mode": "shadow" if args.shadow else "main", "poses": []}
    for f in args.frames:
        c = cams[f]
        if args.shadow:
            W = H = cfg.shadow_dim
            th = cfg.shadow_tile_h
            K = cfg.shadow_chunks_per_tile
            vout = run_vertex_stage(scene, scene.object_model,
                                    scene.object_normal,
                                    jnp.eye(4, dtype=jnp.float32),
                                    c.position, lights, lvp)
            st = triangle_setup(vout.light_clip, scene.tri_idx,
                                scene.tri_valid, W, H, cull_backfaces=False,
                                depth_bias_constant=cfg.shadow_bias_constant,
                                depth_bias_slope=cfg.shadow_bias_slope)
        else:
            W, H, th, K = (cfg.width, cfg.height, cfg.tile_h,
                           cfg.max_chunks_per_tile)
            proj = math3d.perspective(jnp.deg2rad(cfg.fovy_deg), cfg.aspect,
                                      cfg.znear, cfg.zfar)
            view = math3d.camera_view_matrix(c.position, c.yaw, c.pitch)
            vout = run_vertex_stage(scene, scene.object_model,
                                    scene.object_normal, proj @ view,
                                    c.position, lights, lvp)
            st = triangle_setup(vout.clip, scene.tri_idx, scene.tri_valid,
                                W, H, cull_backfaces=True)
        tiles_x, tiles_y = -(-W // cfg.tile_w), -(-H // th)
        bins = binning.bin_stream(
            st.bbox, tiles_x, tiles_y, cfg.tile_w, th,
            cfg.max_tiles_per_chunk, K, cfg.max_global_chunks,
            clipfree=st.clipfree, zmin=st.zmin)
        assert int(np.asarray(bins.overflow)) == 0
        hdr = np.asarray(bins.header)
        stream = np.asarray(bins.stream)
        setup = np.asarray(st.setup)
        C = setup.shape[0] // CHUNK_SIZE
        cpad = binning.stream_cpad_for(C)
        nstrips = binning.occ_nstrips(th)
        srows = binning.occ_strip_rows(th)
        fe = stream[:, 0].reshape(-1)
        fm = stream[:, 1].reshape(-1)
        fp = stream[:, 2].reshape(-1)
        tot = np.zeros(4, np.int64)
        zmin_np = np.asarray(st.zmin)
        bbox_np = np.asarray(st.bbox)
        from kanirenderer_tpu.ops.raster_pallas import OCC_PERIOD
        if args.period:
            OCC_PERIOD = args.period
        for t in range(tiles_x * tiles_y):
            off = hdr[0, t] * 128 + hdr[1, t]
            n = hdr[2, t]
            runs = [(int((fe[off + s] // 32) % cpad), int(fe[off + s] % 16),
                     int(fm[off + s]) & 0xFFFFFFFF, int(fp[off + s]))
                    for s in range(n)]
            if args.ceiling:
                r = ceiling_tile(runs, setup, zmin_np, bbox_np,
                                 (t % tiles_x) * cfg.tile_w,
                                 (t // tiles_x) * th, th, cfg.tile_w,
                                 args.ceiling, SUBBATCH, SUBS_PER_CHUNK,
                                 CHUNK_SIZE) + (0, 0)
            else:
                r = simulate_tile(runs, setup, (t % tiles_x) * cfg.tile_w,
                                  (t // tiles_x) * th, th, cfg.tile_w,
                                  nstrips, srows, OCC_PERIOD,
                                  binning.OCC_QBITS, SUBBATCH,
                                  SUBS_PER_CHUNK, CHUNK_SIZE)
            tot += np.array(r, np.int64)
        ev_tot, ev_done, r_tot, r_skip = (int(v) for v in tot)
        pose = {"frame": f, "tri_evals_no_occ": ev_tot,
                "tri_evals_with_occ": ev_done,
                "eval_drop_pct": round(100 * (1 - ev_done / max(ev_tot, 1)),
                                       2),
                "runs": r_tot, "runs_skipped": r_skip,
                "run_skip_pct": round(100 * r_skip / max(r_tot, 1), 2)}
        if args.ceiling:
            pose["ceiling"] = args.ceiling
        print(pose)
        out["poses"].append(pose)
    if args.json:
        with open(args.json, "w") as fjs:
            json.dump(out, fjs, indent=1)


if __name__ == "__main__":
    main()
