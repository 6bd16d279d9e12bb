"""Content-adaptive occlusion gate (VERDICT r4 weak #5 → r5 item 6).

The gate replays the kernels' exact skip logic over a tile sample at
scene load (ops/occ_replay) and selects RenderConfig.occ_scope — "1"
(everywhere) only when the estimated main-grid eval drop clears the
machinery's ~3%-of-frame break-even, else the "shadow" default.  The
scope is STATIC (part of the jit key), so the decision is per compiled
config, never a mid-session executable swap (which the tunneled runtime
corrupts on — docs/PERFORMANCE.md rules)."""

import numpy as np
import jax.numpy as jnp

import kanirenderer_tpu as kani
from kanirenderer_tpu.core.types import (default_camera, default_lights,
                                         frame_state)
from kanirenderer_tpu.models.procedural import layered_scene
from kanirenderer_tpu.ops import occ_replay, raster_pallas


def _small_cfg(**kw):
    return kani.RenderConfig(width=256, height=128, shadow_dim=64,
                             mode=kani.RenderMode.LIT, **kw)


def test_gate_enables_occ_on_layered_content():
    """The positive control: stacked full-screen walls — everything
    behind the front wall is occluded, so the estimated eval drop is
    far above the threshold and the gate selects scope "1"."""
    scene = layered_scene(target_tris=8_000)
    st = frame_state(scene, default_camera(), default_lights())
    cfg = _small_cfg()
    scope, est = occ_replay.choose_occ_scope(scene, st, cfg, tile_stride=2)
    assert est["evals_sampled"] > 0
    assert est["eval_drop"] > 0.3, est
    assert scope == "1"


def test_gate_keeps_default_on_open_content():
    """A single-layer wall has nothing to occlude: eval drop ~0 and the
    gate keeps the safe "shadow" default (the bench courtyard measures
    0.1-4.3% across poses — tests/artifacts/occ_stats_main_r4.json —
    always below break-even)."""
    scene = layered_scene(layers=1, target_tris=4_000)
    st = frame_state(scene, default_camera(), default_lights())
    scope, est = occ_replay.choose_occ_scope(scene, st, _small_cfg(),
                                             tile_stride=2)
    assert est["evals_sampled"] > 0
    assert est["eval_drop"] < 0.05, est
    assert scope == "shadow"


def test_occ_scope_config_is_output_preserving():
    """occ_scope="1" through the CONFIG (the gate's mechanism, vs the
    env knob) must be exactly output-preserving on occlusion-heavy
    content: depth identical, ids equal off shared-edge z-ties."""
    from tests.test_binning_pallas import _two_layer_setup

    st = _two_layer_setup(height=192)
    cfg_on = kani.RenderConfig(width=256, height=192, occ_scope="1")
    cfg_off = kani.RenderConfig(width=256, height=192, occ_scope="0")
    assert raster_pallas._occ_on(cfg_on.tiles_x * cfg_on.tiles_y,
                                 cfg_on.tile_h, st.zmin,
                                 scope=cfg_on.occ_scope)
    assert not raster_pallas._occ_on(cfg_off.tiles_x * cfg_off.tiles_y,
                                     cfg_off.tile_h, st.zmin,
                                     scope=cfg_off.occ_scope)
    v1 = raster_pallas.rasterize(st, cfg_on)
    v0 = raster_pallas.rasterize(st, cfg_off)
    np.testing.assert_allclose(np.asarray(v1.z), np.asarray(v0.z),
                               atol=1e-6)
    same = np.asarray(v1.tri) == np.asarray(v0.tri)
    assert (~same).mean() < 0.02


def test_unresolved_auto_scope_falls_back_to_shadow(monkeypatch):
    """KANI_OCC=auto reaching the kernel unresolved (caller skipped the
    gate) must behave as the safe "shadow" default, not as "1"."""
    monkeypatch.setattr(raster_pallas, "OCC_MODE", "auto")
    dummy_zmin = jnp.zeros((128,), jnp.float32)
    assert not raster_pallas._occ_on(16, 8, dummy_zmin, depth_only=False,
                                     scope="env")
    assert raster_pallas._occ_on(16, 8, dummy_zmin, depth_only=True,
                                 scope="env")


def test_layered_scene_renders_content():
    """The layered scene is actually on screen at the default camera
    (it sizes walls to the frustum at each depth): most pixels covered,
    and the front layer's material wins everywhere."""
    from kanirenderer_tpu.passes.frame import render_frame

    scene = layered_scene(target_tris=4_000)
    st = frame_state(scene, default_camera(), default_lights())
    out = render_frame(scene, st, _small_cfg())
    covered = (np.asarray(out.depth) < 1.0).mean()
    assert covered > 0.95, covered


def test_occ_with_interleaved_bands_exact():
    """The two r5 features compose: occlusion scope "1" + interleaved
    bands (full-grid z-ordered stream, per-chip header slice, stride-
    scaled kernel y) must reassemble to the full-frame output exactly."""
    from kanirenderer_tpu.ops.interpolate import build_tri_records
    from tests.test_binning_pallas import _two_layer_setup

    st = _two_layer_setup(height=192)
    T = st.setup.shape[0]
    cfg = kani.RenderConfig(width=256, height=192, occ_scope="1")
    vary = jnp.zeros((T * 3, 24), jnp.float32)
    rec = build_tri_records(jnp.zeros((T, 3), jnp.int32),
                            jnp.zeros(T, jnp.int32), vary,
                            jnp.zeros(1, jnp.int32),
                            jnp.ones(1, jnp.int32),
                            jnp.ones((1, 2), jnp.int32), setup=st.setup)
    full = raster_pallas.rasterize_pixels(st, rec, cfg)
    stride, th = 2, cfg.tile_h
    J = (192 // th) // stride
    z = np.zeros((192, 256), np.float32)
    m = np.zeros((192, 256), bool)
    for k in range(stride):
        b = raster_pallas.rasterize_pixels(st, rec, cfg, band_h=J * th,
                                           y0=jnp.float32(k * th),
                                           y_stride=stride)
        for j in range(J):
            rows = slice((j * stride + k) * th, (j * stride + k + 1) * th)
            z[rows] = np.asarray(b.z)[j * th:(j + 1) * th]
            m[rows] = np.asarray(b.mask)[j * th:(j + 1) * th]
    np.testing.assert_array_equal(m, np.asarray(full.mask))
    np.testing.assert_array_equal(z, np.asarray(full.z))
