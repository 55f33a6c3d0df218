"""Native IO kernel tests: PNG decode bit-exact vs PIL, npy sequence loader
vs numpy, and graceful fallbacks."""

import os

import numpy as np
import pytest
from PIL import Image

from lvt_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native lvt_io unavailable (no g++/zlib)")
    return l


def test_png_roundtrip_rgb(lib, tmp_path, rng):
    arr = rng.integers(0, 255, size=(33, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    got = native.read_png_rgb(p)
    np.testing.assert_array_equal(got, arr)


def test_png_roundtrip_gray_and_rgba(lib, tmp_path, rng):
    g = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(g, mode="L").save(p)
    got = native.read_png_rgb(p)
    np.testing.assert_array_equal(got, np.stack([g] * 3, -1))

    rgba = rng.integers(0, 255, size=(8, 8, 4), dtype=np.uint8)
    p2 = str(tmp_path / "a.png")
    Image.fromarray(rgba, mode="RGBA").save(p2)
    got = native.read_png_rgb(p2)
    np.testing.assert_array_equal(got, rgba[..., :3])


def test_png_palette(lib, tmp_path, rng):
    arr = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    img = Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE)
    p = str(tmp_path / "p.png")
    img.save(p)
    got = native.read_png_rgb(p)
    ref = np.asarray(img.convert("RGB"))
    np.testing.assert_array_equal(got, ref)


def test_npy_sequence_loader(lib, tmp_path, rng):
    paths = []
    frames = []
    for i in range(5):
        a = rng.integers(0, 512, size=(4, 16, 16)).astype(np.int64)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, a)
        paths.append(p)
        frames.append(a)
    got = native.load_npy_sequence_i32(paths, (4, 16, 16))
    np.testing.assert_array_equal(got, np.stack(frames).astype(np.int32))

    # int32 files too
    np.save(str(tmp_path / "i32.npy"), frames[0].astype(np.int32))
    got = native.load_npy_sequence_i32([str(tmp_path / "i32.npy")], (4, 16, 16))
    np.testing.assert_array_equal(got[0], frames[0].astype(np.int32))


def test_corrupt_png_returns_none(lib, tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"not a png at all")
    assert native.read_png_rgb(p) is None
