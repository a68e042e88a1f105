"""Small shared JAX ops: color distance, shifts, rounding, windowed sums.

These are the vectorized building blocks shared by the stage kernels; each
documents which reference loop it re-expresses (see SURVEY.md §2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adcensus_tpu.config import LARGE_FLOAT


def resolve_use_pallas(use_pallas):
    """None -> auto: Pallas kernels on TPU, jnp fallbacks on CPU (tests
    exercise the kernels separately in interpreter mode). The "matmul"
    mode selects the MXU cross-operator backend but still means "use the
    kernels" for the scanline/interpolation Pallas paths."""
    if use_pallas is None or use_pallas == "matmul":
        return jax.default_backend() != "cpu"
    if use_pallas == "pallas":
        return True
    if use_pallas == "jnp":
        # the exact-mirror backend must NOT silently enable the Pallas
        # scanline/interp kernels just because the string is truthy
        return False
    if isinstance(use_pallas, str):
        raise ValueError(f"unknown kernel backend {use_pallas!r}")
    return bool(use_pallas)


def resolve_cross_backend(use_pallas) -> str:
    """Map the pipeline-wide kernel knob to a cross-operator backend.

    None  -> "matmul" on TPU (MXU band-matrix path, the fast default),
             "jnp" on CPU;
    True  -> "pallas" (bit-exact masked-roll kernels);
    False -> "jnp" (bit-exact roll mirror);
    "matmul" / "pallas" / "jnp" pass through.
    """
    if use_pallas is None:
        return "matmul" if jax.default_backend() != "cpu" else "jnp"
    if use_pallas is True:
        return "pallas"
    if use_pallas is False:
        return "jnp"
    if use_pallas in ("matmul", "pallas", "jnp"):
        return use_pallas
    raise ValueError(f"unknown cross backend {use_pallas!r}")


def lround(x: jnp.ndarray) -> jnp.ndarray:
    """C lround: round half away from zero, as int32.

    (The refinement steps of the reference use lround; jnp.round would
    round half to even and disagree on *.5 values.)
    """
    return jnp.where(
        x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)
    ).astype(jnp.int32)


def color_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Max-over-channels absolute difference of two (..., 3) uint8 images
    (cross_aggregator.h:78-80). Returns int32 (...)."""
    d = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
    return jnp.max(d, axis=-1)


def color_absdiff_sum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum-over-channels absolute difference, int32 (...)."""
    d = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
    return jnp.sum(d, axis=-1)


def shift2d(img: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift a (H, W, ...) array so out[y, x] = img[y - dy, x - dx],
    filling vacated cells with ``fill``. Static shifts compile to
    pad+slice, which XLA fuses."""
    h, w = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + [
        (0, 0)
    ] * (img.ndim - 2)
    out = jnp.pad(img, pad, constant_values=fill)
    return out[
        max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w
    ]


def shift_last(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """Shift along the last axis: out[..., i] = x[..., i - s]."""
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(max(s, 0), max(-s, 0))]
    out = jnp.pad(x, pad, constant_values=fill)
    return out[..., max(-s, 0) : max(-s, 0) + n]


def gather_right_at_xr(right_vals: jnp.ndarray, disp_range: int,
                       min_disparity: int) -> jnp.ndarray:
    """Build out[d, y, x] = right_vals[y, x - d - min_disparity] for
    d in [0, disp_range), clipping the column index (callers mask validity).

    right_vals: (H, W) array. Returns (D, H, W).
    This is the epipolar gather shared by cost init (cost_computor.cpp:100)
    and the scanline d2 lookup (scanline_optimizer.cpp:119).
    """
    h, w = right_vals.shape
    x = jnp.arange(w)[None, None, :]
    d = jnp.arange(disp_range)[:, None, None]
    xr = jnp.clip(x - d - min_disparity, 0, w - 1)  # (D, 1, W)
    # take along the W axis: expand right_vals to (1, H, W)
    idx = jnp.broadcast_to(xr, (disp_range, h, w))
    return jnp.take_along_axis(
        jnp.broadcast_to(right_vals[None], (disp_range, h, w)), idx, axis=2
    )
