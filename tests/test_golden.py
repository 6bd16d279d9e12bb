"""Golden-image regression tests.

Small renders of the cube scene in every mode, compared against stored
goldens (tests/goldens/*.png).  Regenerate intentionally with:
    REGEN_GOLDENS=1 ./scripts/test.sh tests/test_golden.py
Tolerance is loose enough for cross-backend float drift but catches any
real shading/raster change.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import kanirenderer_tpu as kani
from kanirenderer_tpu.io.image import decode_png, write_png
from kanirenderer_tpu.models.procedural import cube_scene
from kanirenderer_tpu.passes.frame import render_frame

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("REGEN_GOLDENS") == "1"

SCENE = cube_scene()
LIGHTS = kani.default_lights()
CAM = kani.CameraState(
    position=jnp.array([60.0, 45.0, 80.0], jnp.float32),
    yaw=jnp.float32(np.deg2rad(-127.0)),
    pitch=jnp.float32(np.deg2rad(-20.0)))

CASES = [
    ("unlit", dict(mode=kani.RenderMode.UNLIT)),
    ("lit", dict(mode=kani.RenderMode.LIT)),
    ("lit_shadow", dict(mode=kani.RenderMode.LIT_SHADOW)),
    ("lit_shadow_hdr", dict(mode=kani.RenderMode.LIT_SHADOW, hdr=True)),
    ("wireframe", dict(mode=kani.RenderMode.WIREFRAME)),
    ("debug", dict(mode=kani.RenderMode.DEBUG)),
    ("deferred", dict(mode=kani.RenderMode.LIT_SHADOW, deferred=True)),
]


def _render(kw) -> np.ndarray:
    cfg = kani.RenderConfig(width=160, height=120, shadow_dim=256, **kw)
    state = kani.frame_state(SCENE, CAM, LIGHTS)
    out = render_frame(SCENE, state, cfg)
    return np.clip(np.asarray(out.image) * 255.0 + 0.5, 0, 255) \
        .astype(np.uint8)


@pytest.mark.parametrize("name,kw", CASES)
def test_golden(name, kw):
    img = _render(kw)
    path = os.path.join(GOLDEN_DIR, f"cube_{name}.png")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_png(path, img)
        if not REGEN:
            pytest.skip(f"golden created: {path}")
        return
    golden = decode_png(open(path, "rb").read())
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    # allow a few boundary pixels to flip; no broad drift
    assert (diff > 8).mean() < 0.01, f"{name}: {(diff > 8).mean():.4f}"
    assert diff.mean() < 1.5, f"{name}: mean {diff.mean():.3f}"
