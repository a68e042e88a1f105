"""Image and dataset I/O for the TPU AD-Census engine.

The reference uses OpenCV purely for PNG I/O and JET-colormap display
(main.cpp:12-17, 147-210). Here PNG decode/encode goes through PIL, and a
self-contained JET colormap reproduces the qualitative outputs.
"""
from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from adcensus_tpu.config import INVALID_FLOAT


def load_image_rgb(path: str) -> np.ndarray:
    """Load an image as (H, W, 3) uint8 RGB (native C++ codec first,
    PIL fallback for exotic PNG flavors / non-PNG formats)."""
    from adcensus_tpu.io import native_png

    if path.lower().endswith(".png"):
        img = native_png.decode(path)
        if img is not None and img.dtype == np.uint8:
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            return img
        # 16-bit gray (or anything unusual): PIL's conversion semantics
    return np.array(Image.open(path).convert("RGB"))


def load_gt_disparity(path: str, scale: float) -> np.ndarray:
    """Load a Middlebury ground-truth disparity PNG.

    Middlebury GT disparities are stored scaled (Cone: x4, Cloth3/Wood2: x3);
    0 marks unknown pixels, returned as NaN.
    """
    from adcensus_tpu.io import native_png

    raw = None
    if path.lower().endswith(".png"):
        raw = native_png.decode(path)
        if raw is not None and raw.ndim == 3:
            raw = raw[..., 0]
    if raw is None:
        raw = np.array(Image.open(path))
    raw = raw.astype(np.float32)
    gt = raw / scale
    gt[raw == 0] = np.nan
    return gt


def load_d_range(path: str) -> Tuple[int, int]:
    """Parse a Data/<set>/d_range.txt file (``dmin=0\\ndmax=64``)."""
    with open(path) as f:
        text = f.read()
    dmin = int(re.search(r"dmin\s*=\s*(-?\d+)", text).group(1))
    dmax = int(re.search(r"dmax\s*=\s*(-?\d+)", text).group(1))
    return dmin, dmax


def normalize_disparity_u8(disp: np.ndarray) -> np.ndarray:
    """Min-max normalize |disparity| to uint8, invalid -> 0 (main.cpp:147-178)."""
    a = np.abs(disp)
    valid = np.isfinite(a)
    if not valid.any():
        return np.zeros_like(a, dtype=np.uint8)
    lo, hi = a[valid].min(), a[valid].max()
    rng = hi - lo if hi > lo else 1.0
    out = np.zeros(a.shape, dtype=np.uint8)
    out[valid] = ((a[valid] - lo) / rng * 255).astype(np.uint8)
    return out


def _jet_lut() -> np.ndarray:
    """256-entry JET colormap (same piecewise-linear ramp family as OpenCV's
    COLORMAP_JET used at main.cpp:175)."""
    lut = np.zeros((256, 3), dtype=np.uint8)
    for i in range(256):
        v = i / 255.0
        r = np.clip(1.5 - abs(4 * v - 3), 0, 1)
        g = np.clip(1.5 - abs(4 * v - 2), 0, 1)
        b = np.clip(1.5 - abs(4 * v - 1), 0, 1)
        lut[i] = (int(r * 255), int(g * 255), int(b * 255))
    return lut


_JET = _jet_lut()


def colorize_disparity(disp: np.ndarray) -> np.ndarray:
    """JET-colormapped (H, W, 3) uint8 rendering of a disparity map."""
    return _JET[normalize_disparity_u8(disp)]


def _save_png(img: np.ndarray, path: str) -> None:
    from adcensus_tpu.io import native_png

    if not native_png.encode(img, path):
        Image.fromarray(img).save(path)


def save_disparity_map(disp: np.ndarray, path_prefix: str) -> None:
    """Save gray + JET-colormap PNGs, mirroring SaveDisparityMap
    (main.cpp:180-210)."""
    _save_png(normalize_disparity_u8(disp), path_prefix + "-d.png")
    _save_png(colorize_disparity(disp), path_prefix + "-c.png")


def save_disparity_cloud(
    img_rgb: np.ndarray, disp: np.ndarray, path: str
) -> None:
    """Point-cloud text export ``x y d r g b`` (main.cpp:212-230)."""
    h, w = disp.shape
    with open(path, "w") as f:
        for y in range(h):
            for x in range(w):
                d = abs(disp[y, x])
                if not np.isfinite(d):
                    continue
                r, g, b = img_rgb[y, x]
                f.write(f"{float(x):f} {float(y):f} {d:f} {r} {g} {b}\n")


@dataclass(frozen=True)
class StereoPair:
    name: str
    left_path: str
    right_path: str
    gt_path: Optional[str]
    gt_scale: float
    dmin: int
    dmax: int

    def load(self) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        left = load_image_rgb(self.left_path)
        right = load_image_rgb(self.right_path)
        gt = (
            load_gt_disparity(self.gt_path, self.gt_scale)
            if self.gt_path
            else None
        )
        return left, right, gt


# Bundled Middlebury pairs (reference Data/; d ranges from d_range.txt,
# GT scales: Cone quarter-size x4; Cloth3/Wood2 are half-size 2006 pairs
# with x2-scaled disparity PNGs — verified empirically against the
# compiled reference's output, see tools/measure_cpu_baseline.py).
_PAIR_FILES = {
    "Cone": ("im2.png", "im6.png", "disp2.png", 4.0),
    "Cloth3": ("view1.png", "view5.png", "disp1.png", 2.0),
    "Wood2": ("view1.png", "view5.png", "disp1.png", 2.0),
    "Piano": ("im0.png", "im1.png", None, 1.0),
}


def get_pair(name: str, data_root: str = "/root/reference/Data") -> StereoPair:
    if name not in _PAIR_FILES:
        raise ValueError(
            f"unknown pair {name!r}; bundled pairs: "
            + ", ".join(sorted(_PAIR_FILES))
        )
    lf, rf, gf, scale = _PAIR_FILES[name]
    base = os.path.join(data_root, name)
    dmin, dmax = load_d_range(os.path.join(base, "d_range.txt"))
    return StereoPair(
        name=name,
        left_path=os.path.join(base, lf),
        right_path=os.path.join(base, rf),
        gt_path=os.path.join(base, gf) if gf else None,
        gt_scale=scale,
        dmin=dmin,
        dmax=dmax,
    )


ALL_PAIRS = tuple(_PAIR_FILES)
