"""Multi-chip row-band sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import kanirenderer_tpu as kani
from kanirenderer_tpu.models.procedural import cube_scene
from kanirenderer_tpu.parallel.mesh import make_mesh, render_frame_sharded
from kanirenderer_tpu.passes.frame import render_frame

CAM = kani.CameraState(
    position=jnp.array([60.0, 45.0, 80.0], jnp.float32),
    yaw=jnp.float32(np.deg2rad(-127.0)),
    pitch=jnp.float32(np.deg2rad(-20.0)))


pytestmark = __import__("pytest").mark.skipif(
    len(jax.devices()) < 8,
    reason="needs the 8-device virtual CPU mesh (jax was initialized on "
           "another backend before conftest could force it)")


def test_sharded_matches_single_device():
    scene = cube_scene()
    lights = kani.default_lights()
    state = kani.frame_state(scene, CAM, lights)
    cfg = kani.RenderConfig(width=128, height=96, mode=kani.RenderMode.LIT,
                            shadow_dim=128)
    mesh = make_mesh()

    img_sharded = np.asarray(render_frame_sharded(scene, state, cfg, mesh))
    img_single = np.asarray(render_frame(scene, state, cfg).image)
    np.testing.assert_allclose(img_sharded, img_single, atol=2e-5)


def test_sharded_lit_shadow_runs():
    scene = cube_scene()
    lights = kani.default_lights()
    state = kani.frame_state(scene, CAM, lights)
    cfg = kani.RenderConfig(width=128, height=96,
                            mode=kani.RenderMode.LIT_SHADOW, shadow_dim=128)
    mesh = make_mesh()
    img = np.asarray(render_frame_sharded(scene, state, cfg, mesh))
    assert np.isfinite(img).all()
    assert img.shape == (96, 128, 3)
