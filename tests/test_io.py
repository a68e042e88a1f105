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


def test_pfm_roundtrip_and_gt_mapping(tmp_path):
    """PFM write/read round-trip (both endianness branches) and the
    Middlebury-2014 inf->NaN GT convention."""
    from adcensus_tpu.io.image import load_pfm, pfm_to_gt, save_pfm

    rng = np.random.default_rng(1)
    disp = rng.uniform(0, 256, size=(23, 41)).astype(np.float32)
    disp[3, 5] = np.inf  # unknown pixel marker
    p = str(tmp_path / "disp0.pfm")
    save_pfm(disp, p)
    back = load_pfm(p)
    np.testing.assert_array_equal(back, disp)
    gt = pfm_to_gt(back)
    assert np.isnan(gt[3, 5]) and np.isfinite(gt[0, 0])

    # color variant + big-endian scale line
    img = rng.uniform(-4, 4, size=(7, 9, 3)).astype(np.float32)
    pc = str(tmp_path / "c.pfm")
    with open(pc, "wb") as f:
        f.write(b"PF\n9 7\n1.0\n")
        f.write(np.ascontiguousarray(img[::-1]).astype(">f4").tobytes())
    np.testing.assert_array_equal(load_pfm(pc), img)


def test_get_pair_picks_up_piano_pfm(tmp_path):
    """A disp0.pfm dropped into a 2014-style pair directory is loaded as
    ground truth (Piano ships none; this is the documented hook)."""
    import shutil

    from adcensus_tpu.io.image import get_pair, save_pfm

    src = os.path.join(DATA, "Piano")
    if not os.path.exists(src):
        pytest.skip("no data")
    dst = tmp_path / "Piano"
    shutil.copytree(src, dst)
    gt = np.full((481, 707), 7.5, np.float32)
    gt[0, 0] = np.inf
    save_pfm(gt, str(dst / "disp0.pfm"))
    pair = get_pair("Piano", data_root=str(tmp_path))
    _, _, loaded = pair.load()
    assert loaded is not None and np.isnan(loaded[0, 0])
    assert loaded[5, 5] == 7.5


def test_d_range_and_colormap():
    dmin, dmax = load_d_range(os.path.join(DATA, "Cone", "d_range.txt"))
    assert (dmin, dmax) == (0, 64)
    disp = np.array([[0.0, 32.0], [np.inf, 64.0]], np.float32)
    u8 = normalize_disparity_u8(disp)
    assert u8[1, 0] == 0 and u8[1, 1] == 255
    rgb = colorize_disparity(disp)
    assert rgb.shape == (2, 2, 3)
