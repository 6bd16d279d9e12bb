"""Shared bench bodies for TPU-worker A/B jobs (mirrors bench.py's pinned
protocol: transfer-free sync, fixed warmup, median of N timed passes)."""

import time

import numpy as np


def _setup(frames=30):
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
    cfg = kani.RenderConfig(
        width=1920, height=1080, mode=kani.RenderMode.LIT_SHADOW,
        raster_backend="pallas",
        tile_h=int(os.environ.get("KANI_TILE_H", 32)),
        tile_w=int(os.environ.get("KANI_TILE_W", 128)),
        shadow_tile_h=int(os.environ.get("KANI_SHADOW_TILE_H", 32)),
        max_tiles_per_chunk=32, max_chunks_per_tile=512,
        max_global_chunks=128, output_u8=True)
    inputs = CameraInputs(forward=1.0, rotate_dx=6.0)
    cams = [cam0]
    for _ in range(frames):
        cams.append(update_camera(cams[-1], inputs, 1.0 / 60.0))
    states = [kani.frame_state(scene, c, lights) for c in cams[1:]]
    return scene, states, cfg, cam0


def steady_bench(frames=30, passes=3, label=""):
    """Cached-shadow steady state (bench.py default mode's measurement)."""
    import jax
    import jax.numpy as jnp
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.passes.frame import render_frame, render_shadow_map
    from kanirenderer_tpu.ops.sampling import build_shadow_table

    scene, states, cfg, cam0 = _setup(frames)

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


def fresh_bench(frames=30, passes=3, label=""):
    """Reference-parity fresh-shadow mode (shadow re-rendered in-frame)."""
    from kanirenderer_tpu.passes.frame import render_frame

    scene, states, cfg, cam0 = _setup(frames)

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
