"""Baseline JPEG fallback decoder (io/jpeg.py) vs PIL's libjpeg decode.

The reference decodes JPEG natively via the Rust image crate
(src/texture.rs:61-75); io/jpeg.py keeps OBJ+JPEG scenes loadable with no
PIL installed.  4:4:4 must decode bit-exactly against libjpeg (same
float-IDCT results rounded identically); subsampled chroma within ±3
(integer-IDCT + upsample-phase differences).
"""

import io as _io

import numpy as np
import pytest

from kanirenderer_tpu.io.jpeg import decode_jpeg

PIL = pytest.importorskip("PIL.Image")


def _img():
    rng = np.random.RandomState(0)
    base = rng.rand(8, 8, 3)
    return (np.kron(base, np.ones((16, 16, 1))) * 255) \
        .astype(np.uint8)[:120, :124]  # non-multiple-of-16 dims


def _roundtrip(img, **save_kw):
    buf = _io.BytesIO()
    PIL.fromarray(img).save(buf, "JPEG", **save_kw)
    data = buf.getvalue()
    ref = np.asarray(PIL.open(_io.BytesIO(data)).convert("RGB"))
    return decode_jpeg(data), ref


def test_444_bit_exact_vs_libjpeg():
    got, ref = _roundtrip(_img(), quality=95, subsampling=0)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_ac_coefficients_noise_image():
    """Per-pixel noise exercises every AC coefficient (a blocky image has
    all-zero AC, which once masked a dequantization-order bug)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 72, 3), np.uint8)
    got, ref = _roundtrip(img, quality=90, subsampling=0)
    d = np.abs(got.astype(int) - ref.astype(int))
    # residual vs libjpeg is its integer IDCT vs our float one
    assert d.max() <= 3 and d.mean() < 0.6, (d.max(), d.mean())


@pytest.mark.parametrize("subsampling", [1, 2])  # 4:2:2, 4:2:0
def test_subsampled_close_to_libjpeg(subsampling):
    got, ref = _roundtrip(_img(), quality=95, subsampling=subsampling)
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 3 and d.mean() < 1.5


def test_grayscale():
    g = _img()[..., 0]
    buf = _io.BytesIO()
    PIL.fromarray(g).save(buf, "JPEG", quality=95)
    ref = np.asarray(PIL.open(_io.BytesIO(buf.getvalue())))
    got = decode_jpeg(buf.getvalue())
    assert got.shape == ref.shape + (1,)
    assert np.abs(got[..., 0].astype(int) - ref.astype(int)).max() <= 1


def test_restart_markers():
    got, ref = _roundtrip(_img(), quality=90, restart_marker_rows=1)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 3


def test_progressive_raises_cleanly():
    buf = _io.BytesIO()
    PIL.fromarray(_img()).save(buf, "JPEG", quality=90, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(buf.getvalue())


def test_load_image_bytes_jpeg_fallback(monkeypatch):
    """With PIL 'absent', load_image_bytes routes JPEG to io/jpeg.py."""
    from kanirenderer_tpu.io import image as image_mod
    buf = _io.BytesIO()
    PIL.fromarray(_img()).save(buf, "JPEG", quality=95, subsampling=0)
    monkeypatch.setattr(image_mod, "_HAVE_PIL", False)
    arr = image_mod.load_image_bytes(buf.getvalue())
    assert arr.shape == (120, 124, 3)
