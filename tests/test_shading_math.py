"""Fragment-math unit tests against hand-computed reference-shader values."""

import numpy as np
import jax.numpy as jnp

from kanirenderer_tpu.core.color import (aces_tonemap, linear_to_srgb,
                                         reinhard_tonemap, srgb_to_linear)
from kanirenderer_tpu.shade import forward


def test_attenuation_constants():
    # 1/(1 + 0.09 d + 0.032 d²) × clamp(1-(d/range)^4, 0, 1)
    # (reference src/shader.wgsl:171-177)
    d = jnp.float32(10.0)
    att = np.asarray(forward._attenuation(d, jnp.float32(256.0)))
    expect = 1.0 / (1.0 + 0.9 + 3.2) * (1.0 - (10.0 / 256.0) ** 4)
    np.testing.assert_allclose(att, expect, rtol=1e-6)
    # beyond range → zero
    att0 = np.asarray(forward._attenuation(jnp.float32(300.0),
                                           jnp.float32(256.0)))
    assert att0 == 0.0


def test_blinn_phong_exponent_32():
    shape = (1, 1)
    n = jnp.zeros((3,) + shape).at[2].set(1.0)
    # light 45° off normal, view along normal
    ld = jnp.zeros((3,) + shape).at[0].set(np.sin(np.pi / 4)) \
        .at[2].set(np.cos(np.pi / 4))
    vd = jnp.zeros((3,) + shape).at[2].set(1.0)
    col = jnp.ones((3, 1, 1))
    diff, spec = forward._blinn_phong(n, ld, vd, col)
    np.testing.assert_allclose(np.asarray(diff)[0, 0, 0],
                               np.cos(np.pi / 4), rtol=1e-5)
    half = np.array([np.sin(np.pi / 8), 0, np.cos(np.pi / 8)])
    np.testing.assert_allclose(np.asarray(spec)[0, 0, 0],
                               np.cos(np.pi / 8) ** 32, rtol=1e-4)


def test_reinhard():
    np.testing.assert_allclose(np.asarray(reinhard_tonemap(jnp.float32(1.0))),
                               0.5)
    np.testing.assert_allclose(np.asarray(reinhard_tonemap(jnp.float32(3.0))),
                               0.75)


def test_aces_reference_constants():
    # clamp((c(2.51c+0.03))/(c(2.43c+0.59)+0.14)) (src/shader_hdr.wgsl)
    c = 0.5
    expect = (c * (2.51 * c + 0.03)) / (c * (2.43 * c + 0.59) + 0.14)
    np.testing.assert_allclose(np.asarray(aces_tonemap(jnp.float32(c))),
                               expect, rtol=1e-6)
    assert float(aces_tonemap(jnp.float32(100.0))) == 1.0


def test_srgb_roundtrip_and_anchors():
    x = jnp.linspace(0.0, 1.0, 64)
    rt = np.asarray(srgb_to_linear(linear_to_srgb(x)))
    np.testing.assert_allclose(rt, np.asarray(x), atol=2e-6)
    # the canonical anchor: 0.5 linear ≈ 0.7354 sRGB
    np.testing.assert_allclose(float(linear_to_srgb(jnp.float32(0.5))),
                               0.73536, atol=1e-4)


def test_ambient_constant():
    # vec3(20)*0.0005 = 0.01 (reference src/shader.wgsl:179-181): a fully
    # unlit pixel of a white surface ends at reinhard(0.01 + movable-term).
    assert abs(20.0 * 0.0005 - 0.01) < 1e-9


def test_point_light_scan_matches_unrolled():
    """The >4-light lax.scan path accumulates in the same order as the
    unrolled loop — identical results, O(1) trace size (review finding:
    --point-lights 50 used to unroll 150 full-frame light blocks)."""
    import numpy as np
    import kanirenderer_tpu as kani
    from kanirenderer_tpu.core.types import spawn_point_lights
    from kanirenderer_tpu.passes.frame import render_frame

    from kanirenderer_tpu.models.procedural import cube_scene
    scene = cube_scene()
    cam = kani.CameraState(
        position=jnp.array([60.0, 45.0, 80.0], jnp.float32),
        yaw=jnp.float32(np.deg2rad(-127.0)),
        pitch=jnp.float32(np.deg2rad(-20.0)))
    cfg = kani.RenderConfig(width=64, height=48, mode=kani.RenderMode.LIT,
                            shadow_dim=128)
    pts8 = spawn_point_lights(8)

    # scan path (6 lights, 3 real + 3 black = exactly-zero terms) must
    # match the unrolled path (3 lights) — same math, same order
    from kanirenderer_tpu.core.types import PointLights
    pts3 = PointLights(position=pts8.position[:3], color=pts8.color[:3],
                       range=pts8.range[:3])
    pts3_pad = PointLights(
        position=jnp.concatenate([pts8.position[:3]] * 2)[:6],
        color=jnp.concatenate(
            [pts8.color[:3], jnp.zeros((3, 3), jnp.float32)]),
        range=jnp.concatenate([pts8.range[:3]] * 2)[:6])
    l3 = kani.default_lights()._replace(points=pts3)        # unrolled
    l6 = kani.default_lights()._replace(points=pts3_pad)    # scan path
    a = np.asarray(render_frame(
        scene, kani.frame_state(scene, cam, l3), cfg).image)
    b = np.asarray(render_frame(
        scene, kani.frame_state(scene, cam, l6), cfg).image)
    np.testing.assert_allclose(a, b, atol=1e-6)
