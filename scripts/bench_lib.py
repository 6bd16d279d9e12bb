"""Shared bench bodies for TPU-worker A/B jobs (mirrors bench.py's pinned
protocol: transfer-free sync, fixed warmup, median of N timed passes).

Every body PINS the full TPU config explicitly (tile_h=32, shadow_tile_h=32,
S=32/K=512/G=128, output_u8) — RenderConfig defaults are CPU-test-sized
(tile_h=8) and os.environ leaks between worker jobs, so nothing here reads
ambient state except the KANI_* knobs the job itself sets before import.
"""

import time

import numpy as np


def _setup(frames=30, *, width=1920, height=1080, **cfg_kw):
    import jax.numpy as jnp
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.models.procedural import sponza_standin_scene
    from kanirenderer_tpu.runtime.controllers import (update_camera,
                                                      CameraInputs)

    scene = sponza_standin_scene()
    lights = kani.default_lights()
    cam0 = kani.CameraState(
        position=jnp.array([-1000.0, 180.0, 0.0], jnp.float32),
        yaw=jnp.float32(0.0), pitch=jnp.float32(np.deg2rad(-5.0)))
    import os
    kw = dict(
        width=width, height=height, mode=kani.RenderMode.LIT_SHADOW,
        raster_backend="pallas",
        tile_h=int(os.environ.get("KANI_TILE_H", 32)),
        tile_w=int(os.environ.get("KANI_TILE_W", 128)),
        shadow_tile_h=int(os.environ.get("KANI_SHADOW_TILE_H", 32)),
        max_tiles_per_chunk=32, max_chunks_per_tile=512,
        max_global_chunks=128, output_u8=True)
    kw.update(cfg_kw)
    cfg = kani.RenderConfig(**kw)
    inputs = CameraInputs(forward=1.0, rotate_dx=6.0)
    cams = [cam0]
    for _ in range(frames):
        cams.append(update_camera(cams[-1], inputs, 1.0 / 60.0))
    states = [kani.frame_state(scene, c, lights) for c in cams[1:]]
    return scene, states, cfg, cam0


def steady_bench(frames=30, passes=3, label="", **cfg_kw):
    """Cached-shadow steady state (bench.py default mode's measurement)."""
    import jax
    import jax.numpy as jnp
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.passes.frame import render_frame, render_shadow_map
    from kanirenderer_tpu.ops.sampling import build_shadow_table

    scene, states, cfg, cam0 = _setup(frames, **cfg_kw)

    def fly(n, table):
        outs = None
        t0 = time.perf_counter()
        for k in range(n):
            outs = render_frame(scene, states[k % len(states)], cfg,
                                shadow_table=table)
        outs.image.block_until_ready()
        return time.perf_counter() - t0

    ones_tbl = jax.device_put(np.asarray(build_shadow_table(
        jnp.ones((cfg.shadow_dim, cfg.shadow_dim), jnp.float32))))
    fly(3, ones_tbl)
    state0 = kani.frame_state(scene, cam0, kani.default_lights())
    sh_np = np.asarray(render_shadow_map(scene, state0, cfg))
    tbl = jax.device_put(np.asarray(build_shadow_table(jnp.asarray(sh_np))))
    fly(3, tbl)
    ps = [frames / fly(frames, tbl) for _ in range(passes)]
    med = sorted(ps)[len(ps) // 2]
    print(f"STEADY {label}: median {med:.2f} FPS "
          f"({1000/med:.1f} ms) passes {[round(p,2) for p in ps]}")
    return med


def fresh_bench(frames=30, passes=3, label="", **cfg_kw):
    """Reference-parity fresh-shadow mode (shadow re-rendered in-frame)."""
    from kanirenderer_tpu.passes.frame import render_frame

    scene, states, cfg, cam0 = _setup(frames, **cfg_kw)

    def fly(n):
        outs = None
        t0 = time.perf_counter()
        for k in range(n):
            outs = render_frame(scene, states[k % len(states)], cfg)
        outs.image.block_until_ready()
        return time.perf_counter() - t0

    fly(3)
    ps = [frames / fly(frames) for _ in range(passes)]
    med = sorted(ps)[len(ps) // 2]
    print(f"FRESH {label}: median {med:.2f} FPS "
          f"({1000/med:.1f} ms) passes {[round(p,2) for p in ps]}")
    return med


def band_bench_interleaved(stride, frames=30, passes=3, label="",
                           fresh=False, **cfg_kw):
    """Per-chip timing of the INTERLEAVED row-band mode (r5 load
    balancing): chip k renders tile rows k, k+stride, … — measures each
    k position with the same jitted render_band(band_stride=stride) the
    mesh path shards."""
    from functools import partial
    import jax
    import jax.numpy as jnp
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.passes.frame import render_band, render_shadow_map
    from kanirenderer_tpu.ops.sampling import build_shadow_table

    scene, states, cfg, cam0 = _setup(frames, **cfg_kw)
    tiles_full = -(-cfg.height // cfg.tile_h)
    J = -(-tiles_full // stride)
    band_h = J * cfg.tile_h

    banded = partial(jax.jit, static_argnames=("config", "band_h",
                                               "band_stride"))(
        lambda scene, state, config, y0, table=None, band_h=None,
        band_stride=1:
        render_band(scene, state, config, shadow_table=table,
                    band_h=band_h, y0=y0, band_stride=band_stride))

    tbl = None
    if not fresh:
        ones_tbl = jax.device_put(np.asarray(build_shadow_table(
            jnp.ones((cfg.shadow_dim, cfg.shadow_dim), jnp.float32))))
        banded(scene, states[0], cfg, jnp.float32(0.0), ones_tbl,
               band_h=band_h,
               band_stride=stride).image.block_until_ready()
        state0 = kani.frame_state(scene, cam0, kani.default_lights())
        sh_np = np.asarray(render_shadow_map(scene, state0, cfg))
        tbl = jax.device_put(np.asarray(
            build_shadow_table(jnp.asarray(sh_np))))

    def fly(n, y0):
        outs = None
        t0 = time.perf_counter()
        for k in range(n):
            outs = banded(scene, states[k % len(states)], cfg,
                          jnp.float32(y0), tbl, band_h=band_h,
                          band_stride=stride)
        outs.image.block_until_ready()
        return time.perf_counter() - t0

    fly(3, 0.0)
    out = {}
    for k in range(stride):
        y0 = float(k * cfg.tile_h)
        ps = [fly(frames, y0) / frames * 1000.0 for _ in range(passes)]
        med = sorted(ps)[len(ps) // 2]
        out[k] = round(med, 2)
        print(f"IBAND {label} stride={stride} k={k}: median {med:.2f} "
              f"ms/frame passes {[round(p, 2) for p in ps]}")
    return out


def band_bench(band_h, frames=30, passes=3, label="", fresh=False, **cfg_kw):
    """Per-band render_band timing — the single-chip measurement of the
    multi-chip row-band mesh's per-chip work (parallel/mesh.py shards the
    SAME render_band body over chips; here y0 is a traced arg, so ONE
    executable serves every band position exactly as under shard_map).

    Measures each of the height/band_h band positions separately and
    returns {y0: median_ms}: an n-chip SPMD frame is gated by the SLOWEST
    band, so max(bands) + collectives is the per-frame model input
    (multichip_scaling_r5.json).  Cached mode feeds the prebuilt PCF
    table (no shadow raster); fresh renders the FULL shadow map in-band
    (the sharded fresh path rasters 1/n of it — measured separately by
    shadow_band_bench)."""
    from functools import partial
    import jax
    import jax.numpy as jnp
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.passes.frame import render_band, render_shadow_map
    from kanirenderer_tpu.ops.sampling import build_shadow_table

    scene, states, cfg, cam0 = _setup(frames, **cfg_kw)
    assert cfg.height % band_h == 0
    n_bands = cfg.height // band_h

    banded = partial(jax.jit, static_argnames=("config", "band_h"))(
        lambda scene, state, config, y0, table=None, band_h=None:
        render_band(scene, state, config, shadow_table=table,
                    band_h=band_h, y0=y0))

    tbl = None
    if not fresh:
        ones_tbl = jax.device_put(np.asarray(build_shadow_table(
            jnp.ones((cfg.shadow_dim, cfg.shadow_dim), jnp.float32))))

        def warm(table):
            banded(scene, states[0], cfg, jnp.float32(0.0), table,
                   band_h=band_h).image.block_until_ready()

        warm(ones_tbl)
        state0 = kani.frame_state(scene, cam0, kani.default_lights())
        sh_np = np.asarray(render_shadow_map(scene, state0, cfg))
        tbl = jax.device_put(np.asarray(
            build_shadow_table(jnp.asarray(sh_np))))

    def fly(n, y0):
        outs = None
        t0 = time.perf_counter()
        for k in range(n):
            outs = banded(scene, states[k % len(states)], cfg,
                          jnp.float32(y0), tbl, band_h=band_h)
        outs.image.block_until_ready()
        return time.perf_counter() - t0

    fly(3, 0.0)  # warmup (compile + execute)
    out = {}
    for b in range(n_bands):
        y0 = float(b * band_h)
        ps = [fly(frames, y0) / frames * 1000.0 for _ in range(passes)]
        med = sorted(ps)[len(ps) // 2]
        out[int(y0)] = round(med, 2)
        print(f"BAND {label} band_h={band_h} y0={int(y0)}: "
              f"median {med:.2f} ms/frame passes "
              f"{[round(p, 2) for p in ps]}")
    return out


def shadow_band_bench(shadow_bands, frames=30, passes=3, label="",
                      **cfg_kw):
    """Banded fresh-shadow raster timing: each mesh chip rasters
    shadow_dim/shadow_bands rows of the 2048² light-space map
    (passes/frame.py _fresh_shadow's shadow_axis path) before the
    all_gather.  Measures every band position; returns {sy0: median_ms}."""
    from functools import partial
    import jax
    import jax.numpy as jnp
    from kanirenderer_tpu.passes.frame import _rasterize_depth
    from kanirenderer_tpu.core import math3d
    from kanirenderer_tpu.ops.vertex import (run_vertex_stage_corners,
                                             triangle_setup_corners)

    scene, states, cfg, cam0 = _setup(frames, **cfg_kw)
    assert cfg.shadow_dim % shadow_bands == 0
    sb_h = cfg.shadow_dim // shadow_bands

    @partial(jax.jit, static_argnames=("config", "band_h"))
    def shadow_band(scene, state, config, sy0, band_h):
        light_vp = math3d.directional_light_view_projection(
            state.lights.directional.direction,
            state.lights.directional.distance,
            state.lights.directional.shadow_scene_size)
        vout = run_vertex_stage_corners(
            scene, state.object_model, state.object_normal,
            jnp.eye(4, dtype=jnp.float32), state.camera.position,
            state.lights, light_vp)
        sh_setup, _ = triangle_setup_corners(
            vout.light_clip, scene.tri_valid,
            config.shadow_dim, config.shadow_dim, cull_backfaces=False,
            depth_bias_constant=config.shadow_bias_constant,
            depth_bias_slope=config.shadow_bias_slope)
        if band_h == config.shadow_dim:
            return _rasterize_depth(sh_setup, config)
        return _rasterize_depth(sh_setup, config, band_h=band_h, y0=sy0)

    def fly(n, sy0):
        outs = None
        t0 = time.perf_counter()
        for k in range(n):
            outs = shadow_band(scene, states[k % len(states)], cfg,
                               jnp.float32(sy0), band_h=sb_h)
        outs.block_until_ready()
        return time.perf_counter() - t0

    fly(3, 0.0)
    out = {}
    for b in range(shadow_bands):
        sy0 = float(b * sb_h)
        ps = [fly(frames, sy0) / frames * 1000.0 for _ in range(passes)]
        med = sorted(ps)[len(ps) // 2]
        out[int(sy0)] = round(med, 2)
        print(f"SHADOW_BAND {label} bands={shadow_bands} sy0={int(sy0)}: "
              f"median {med:.2f} ms passes {[round(p, 2) for p in ps]}")
    return out
