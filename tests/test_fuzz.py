"""Robustness fuzz: malformed inputs must never crash the loaders.

The reference tolerates bad assets through fallback chains
(src/resources.rs:51-61, 76-79); these tests feed garbage, truncations,
and pathological-but-valid inputs to the OBJ parser (Python and native
paths) and the image decoders and require graceful behavior."""

import numpy as np
import pytest

from kanirenderer_tpu.io import obj as obj_mod
from kanirenderer_tpu.io.image import load_image_bytes


SEEDS = [
    "v 1 2 3\nf 1 2 3\n",
    "v 1 2 3\nvt 0 0\nvn 0 0 1\nf 1/1/1 1/1/1 1/1/1\n",
    "o name\ng group\nusemtl m\nf 1 2 3\n",
]


def _mutations(rng, text):
    data = text.encode()
    outs = []
    for _ in range(40):
        b = bytearray(data)
        for _ in range(rng.randint(1, 6)):
            op = rng.randint(3)
            if op == 0 and b:
                b[rng.randint(len(b))] = rng.randint(256)
            elif op == 1 and b:
                del b[rng.randint(len(b))]
            else:
                b.insert(rng.randint(len(b) + 1),
                         rng.choice(list(b"0123456789/-. \nfv")))
        outs.append(bytes(b))
    return outs


def test_obj_parser_fuzz_never_crashes():
    """Malformed OBJ text may raise (the error channel that triggers the
    default-cube fallback, reference src/resources.rs:76-79) but must
    never hang or kill the process."""
    rng = np.random.RandomState(42)
    for seed in SEEDS:
        for data in _mutations(rng, seed):
            text = data.decode("utf-8", errors="replace")
            try:
                obj_mod.parse_obj(text, mtl_loader=lambda p: None)
            except Exception:
                pass


def test_corrupt_obj_falls_back_to_default_cube(tmp_path):
    """A file that fails to parse loads as the default cube, like the
    reference's load_model fallback (src/resources.rs:76-79)."""
    from kanirenderer_tpu.api import load_model_or_default
    bad = tmp_path / "bad.obj"
    bad.write_bytes(b"v 1 2 \x14zzz\nf 1 2 3garbage/\xff\n")
    scene, _ = load_model_or_default(str(bad), "opengl")
    assert int(np.asarray(scene.tri_valid).sum()) == 12  # the cube


def test_obj_parser_pathological_valid():
    # out-of-range and negative indices, huge polygon fan, empty faces
    text = "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
    text += "f " + " ".join(str(1 + (i % 3)) for i in range(200)) + "\n"
    text += "f -1 -2 -3\nf 999 1000 1001\n"
    parsed = obj_mod.parse_obj(text, mtl_loader=lambda p: None)
    for m in parsed.meshes:
        assert (np.asarray(m.indices) >= 0).all()


def test_image_decoder_fuzz_never_hangs(tmp_path):
    rng = np.random.RandomState(7)
    png_magic = b"\x89PNG\r\n\x1a\n"
    jpg_magic = b"\xff\xd8\xff\xe0"
    for magic in (png_magic, jpg_magic, b""):
        for _ in range(20):
            blob = magic + bytes(rng.randint(0, 256, rng.randint(4, 300),
                                             dtype=np.uint8))
            try:
                load_image_bytes(blob)
            except Exception:
                pass  # raising is fine; crashing the process is not


def test_native_obj_parser_fuzz():
    from kanirenderer_tpu.io import native
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(11)
    for seed in SEEDS:
        for data in _mutations(rng, seed):
            text = data.decode("utf-8", errors="replace")
            try:
                native.obj_parse(text)
            except Exception:
                pass
