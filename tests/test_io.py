"""Native PNG codec vs PIL on every bundled Middlebury asset, plus
encode round-trips and the d_range/colormap helpers."""
import glob
import os

import numpy as np
import pytest
from PIL import Image

from adcensus_tpu.io import native_png
from adcensus_tpu.io.image import (
    colorize_disparity,
    load_d_range,
    load_image_rgb,
    normalize_disparity_u8,
)

DATA = "/root/reference/Data"
ALL_PNGS = sorted(glob.glob(os.path.join(DATA, "*", "*.png")))


@pytest.mark.skipif(not ALL_PNGS, reason="bundled data not present")
def test_native_decode_matches_pil_on_all_assets():
    assert native_png._load() is not None, "native codec failed to build"
    decoded = 0
    for path in ALL_PNGS:
        img = native_png.decode(path)
        ref = np.array(Image.open(path))
        if img is None:
            continue  # unsupported flavor -> PIL fallback covers it
        if ref.ndim == 3 and ref.shape[2] == 4:
            ref = ref[..., :3]
        np.testing.assert_array_equal(img, ref, err_msg=path)
        decoded += 1
    # the bundled assets are plain 8-bit gray/RGB PNGs — all must decode
    assert decoded == len(ALL_PNGS)


def test_native_encode_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for shape in [(37, 53), (37, 53, 3)]:
        img = rng.integers(0, 255, size=shape, dtype=np.uint8)
        p = str(tmp_path / "x.png")
        assert native_png.encode(img, p)
        back = native_png.decode(p)
        if img.ndim == 2:
            np.testing.assert_array_equal(back, img)
        else:
            np.testing.assert_array_equal(back, img)
        # and PIL agrees the file is valid
        np.testing.assert_array_equal(np.array(Image.open(p)), img)


def test_load_image_rgb_gray_promotes():
    # gray PNG loads as (H, W, 3)
    path = os.path.join(DATA, "Cone", "disp2.png")
    if not os.path.exists(path):
        pytest.skip("no data")
    img = load_image_rgb(path)
    assert img.ndim == 3 and img.shape[2] == 3


def test_d_range_and_colormap():
    dmin, dmax = load_d_range(os.path.join(DATA, "Cone", "d_range.txt"))
    assert (dmin, dmax) == (0, 64)
    disp = np.array([[0.0, 32.0], [np.inf, 64.0]], np.float32)
    u8 = normalize_disparity_u8(disp)
    assert u8[1, 0] == 0 and u8[1, 1] == 255
    rgb = colorize_disparity(disp)
    assert rgb.shape == (2, 2, 3)
