"""Supplementary benchmarks: the BASELINE.json tracked configs 1/2/3/5.

The headline ``bench.py`` measures config 4 (sponza lit+shadow 1080p);
this script measures the other four on the same pinned protocol (fixed
warmup, five timed passes, median, ``block_until_ready`` sync — no
device→host transfer inside the timed window):

  1. cube unlit 512x512        (forward pass floor)
  2. cube lit 512x512          (Blinn-Phong + normal map + point light)
  3. sponza lit 1080p          (per-pixel lighting, no shadow)
  5. sponza deferred HDR 1080p (G-buffer + world-space deferred lighting)
     — plus sponza_deferred_shadow (deferred + LIT_SHADOW + PCF, the full
     BASELINE config-5 description: the fresh shadow map renders in-frame
     like the reference, src/lib.rs:1721) and the one-time
     sponza_debug / sponza_wireframe mode numbers.

Run ONE config per process (the tunneled runtime only re-executes the
first heavyweight executable reliably — docs/PERFORMANCE.md rules):

    python scripts/bench_configs.py cube_unlit|cube_lit|sponza_lit|\
sponza_deferred|sponza_deferred_shadow|sponza_debug|sponza_wireframe

Each run merges its result into tests/artifacts/bench_configs_r5.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "artifacts", "bench_configs_r5.json")


def main(name: str) -> None:
    import jax
    import jax.numpy as jnp
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.models.procedural import (cube_scene,
                                                    sponza_standin_scene)
    from kanirenderer_tpu.passes.frame import render_frame
    from kanirenderer_tpu.runtime.controllers import (CameraInputs,
                                                      update_camera)

    try:
        on_tpu = any("tpu" in d.device_kind.lower() for d in jax.devices())
    except Exception:
        on_tpu = False
    backend = "pallas" if on_tpu else "xla"

    if name.startswith("cube"):
        scene = cube_scene()
        cam0 = kani.CameraState(
            position=jnp.array([60.0, 45.0, 80.0], jnp.float32),
            yaw=jnp.float32(np.deg2rad(-127.0)),
            pitch=jnp.float32(np.deg2rad(-20.0)))
        width = height = 512
        mode = (kani.RenderMode.UNLIT if name == "cube_unlit"
                else kani.RenderMode.LIT)
        deferred, hdr, frames = False, False, 120
        inputs = CameraInputs(rotate_dx=6.0)
    elif name in ("sponza_lit", "sponza_deferred", "sponza_deferred_shadow",
                  "sponza_debug", "sponza_wireframe"):
        scene = sponza_standin_scene()
        cam0 = kani.CameraState(
            position=jnp.array([-1000.0, 180.0, 0.0], jnp.float32),
            yaw=jnp.float32(0.0), pitch=jnp.float32(np.deg2rad(-5.0)))
        width, height = 1920, 1080
        mode = {"sponza_deferred_shadow": kani.RenderMode.LIT_SHADOW,
                "sponza_debug": kani.RenderMode.DEBUG,
                "sponza_wireframe": kani.RenderMode.WIREFRAME,
                }.get(name, kani.RenderMode.LIT)
        deferred = name in ("sponza_deferred", "sponza_deferred_shadow")
        hdr = deferred  # BASELINE config 5: deferred + HDR surface
        frames = 30
        inputs = CameraInputs(forward=1.0, rotate_dx=6.0)
    else:
        raise SystemExit(f"unknown config {name!r}")

    cfg = kani.RenderConfig(
        width=width, height=height, mode=mode, raster_backend=backend,
        deferred=deferred, hdr=hdr,
        tile_h=32 if on_tpu else 8,
        max_tiles_per_chunk=32, max_chunks_per_tile=512,
        max_global_chunks=128,
        output_u8=True)

    lights = kani.default_lights()
    cams = [cam0]
    for _ in range(frames):
        cams.append(update_camera(cams[-1], inputs, 1.0 / 60.0))
    states = [kani.frame_state(scene, c, lights) for c in cams[1:]]

    def flythrough(n):
        outs = None
        t0 = time.perf_counter()
        for k in range(n):
            outs = render_frame(scene, states[k % len(states)], cfg)
        outs.image.block_until_ready()
        return time.perf_counter() - t0

    flythrough(3)
    passes = [frames / flythrough(frames) for _ in range(5)]
    fps = sorted(passes)[len(passes) // 2]
    tris = int(np.asarray(scene.tri_valid).sum())

    entry = {
        "value": round(fps, 3),
        "unit": "fps",
        "detail": {
            "frames": frames, "triangles": tris,
            "resolution": f"{width}x{height}",
            "mode": (f"DEFERRED+HDR {mode.name}" if deferred else mode.name)
            + (" (fresh shadow in-frame + PCF)"
               if mode.name in ("LIT_SHADOW", "DEBUG") else ""),
            "backend": backend,
            "device": str(jax.devices()[0]),
            "protocol": "median of 5 timed passes after fixed warmup",
            "passes_fps": [round(p, 3) for p in passes],
        },
    }

    merged = {}
    if os.path.exists(ARTIFACT):
        try:
            merged = json.load(open(ARTIFACT))
        except Exception:
            merged = {}
    merged[name] = entry
    with open(ARTIFACT, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({name: entry}))


if __name__ == "__main__":
    main(sys.argv[1])
