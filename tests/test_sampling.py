"""Texture-sampler parity: the combined diffuse+normal single-gather
table must reproduce the separate-table sampler (which itself matches
the reference's bilinear Repeat sampling, src/texture.rs:162-173)."""

import numpy as np
import jax.numpy as jnp

from kanirenderer_tpu.ops.sampling import (CMB_BX, CMB_BY, MAT_BX, MAT_BY,
                                           build_combined_blocks,
                                           build_material_blocks,
                                           sample_materials_blocks,
                                           sample_materials_combined)


def _tables(h, w, seed=0):
    rng = np.random.default_rng(seed)
    d8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    n8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return d8, n8


def test_combined_matches_separate_tables():
    h, w = 20, 36
    d8, n8 = _tables(h, w)
    sep_d = jnp.asarray(build_material_blocks(d8))
    sep_n = jnp.asarray(build_material_blocks(n8))
    cmb = jnp.asarray(build_combined_blocks(d8, n8))

    # a dense grid of sample points incl. texel centers, corners, and
    # wrap-around coordinates (Repeat addressing)
    H, W = 23, 31
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(-1.2, 2.3, (H, W)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1.2, 2.3, (H, W)), jnp.float32)
    tw = jnp.full((H, W), w, jnp.int32)
    th = jnp.full((H, W), h, jnp.int32)
    zero = jnp.zeros((H, W), jnp.int32)

    bw_sep = -(-w // MAT_BX)
    bw_cmb = -(-w // CMB_BX)
    d_ref, n_ref = sample_materials_blocks(
        sep_d, sep_n, zero, zero + bw_sep, tw, th, u, v)
    d_got, n_got = sample_materials_combined(
        cmb, zero, zero + bw_cmb, tw, th, u, v)

    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(n_got), np.asarray(n_ref),
                               atol=1e-5)


def test_combined_texel_center_exact():
    """At texel centers the bilinear weights are one-hot: the decoded
    values must be texel-exact (sqrt-u8 diffuse decode v²/65025, raw u8
    normal v/255)."""
    h, w = CMB_BY * 3, CMB_BX * 5
    d8, n8 = _tables(h, w, seed=2)
    cmb = jnp.asarray(build_combined_blocks(d8, n8))
    xs, ys = 7, 9
    u = jnp.asarray([[(xs + 0.5) / w]], jnp.float32)
    v = jnp.asarray([[(ys + 0.5) / h]], jnp.float32)
    one = jnp.ones((1, 1), jnp.int32)
    d_got, n_got = sample_materials_combined(
        cmb, 0 * one, (-(-w // CMB_BX)) * one, w * one, h * one, u, v)
    np.testing.assert_allclose(
        np.asarray(d_got)[:, 0, 0],
        d8[ys, xs].astype(np.float64) ** 2 / 65025.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(n_got)[:, 0, 0],
        n8[ys, xs].astype(np.float64) / 255.0, atol=1e-6)


def test_scene_builder_chooses_combined_for_u8():
    """All-u8 scenes pack the combined table; the separate tables stay
    empty and the block geometry switches to 3-texel-wide blocks."""
    from kanirenderer_tpu.io import obj as obj_mod
    from kanirenderer_tpu.io.scene_loader import SceneBuilder
    from kanirenderer_tpu.models.procedural import make_cube_obj

    b = SceneBuilder()
    parsed = obj_mod.parse_obj(make_cube_obj(), mtl_loader=lambda p: None)
    b.add_model(parsed, ".", instances=1)
    scene = b.build()
    assert scene.tex_combined.shape[0] > 0
    assert scene.tex_combined.dtype == jnp.uint8
    assert scene.tex_diffuse.shape[0] == 0
    w = int(np.asarray(scene.mat_tex_size)[0, 0])
    assert int(np.asarray(scene.mat_blk_w)[0]) == -(-w // CMB_BX)


def test_shadow_table_band_build_exact():
    """Sharded PCF-table build (r5): each chip's table rows built from
    its map row band + a 1-above/2-below halo must be BIT-identical to
    the corresponding rows of the full build_shadow_table — the fresh
    sharded path gathers the TABLE instead of the map
    (passes/frame.py _fresh_shadow)."""
    import numpy as np
    import jax.numpy as jnp
    from kanirenderer_tpu.ops.sampling import (build_shadow_table,
                                               build_shadow_table_band)

    D = 64
    rng = np.random.RandomState(0)
    m = rng.rand(D, D).astype(np.float32)
    full = np.asarray(build_shadow_table(jnp.asarray(m)))
    for n in (2, 4, 8):
        sb = D // n
        parts = []
        for k in range(n):
            band = m[k * sb:(k + 1) * sb]
            top1 = m[max(k * sb - 1, 0):max(k * sb - 1, 0) + 1]
            lo = (k + 1) * sb
            if lo + 2 <= D:
                bot2 = m[lo:lo + 2]
            elif lo < D:
                bot2 = np.concatenate(
                    [m[lo:], np.repeat(m[-1:], 2 - (D - lo), 0)])
            else:
                bot2 = np.repeat(m[-1:], 2, 0)
            parts.append(np.asarray(build_shadow_table_band(
                jnp.asarray(band), jnp.asarray(top1), jnp.asarray(bot2),
                D)))
        np.testing.assert_array_equal(np.concatenate(parts), full,
                                      err_msg=f"bands={n}")
