"""Stage 1 — AD + Census cost initialization, TPU-native.

Re-expresses the reference's pixel-serial loops (cost_computor.cpp:58-137,
adcensus_util.cpp:10-53) as batched array ops over a (D, H, W) cost volume:
each disparity plane is one shifted image comparison, so the whole volume is
D fused elementwise passes with no gathers in the census/hamming path.

Census signatures are bit-packed into two uint32 words (63 bits total) so
the hamming cost uses ``lax.population_count`` on 32-bit lanes — TPUs have
no native 64-bit integer path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from adcensus_tpu.config import ADCensusOptions
from adcensus_tpu.ops.basic import shift2d, shift_last

# 9x7 census window offsets in reference bit order: row -4..4 outer,
# col -3..3 inner, MSB first (adcensus_util.cpp:25-32). Bit k (0 = first
# comparison) ends up at position 62-k of the packed 63-bit signature.
_CENSUS_OFFSETS = [(r, c) for r in range(-4, 5) for c in range(-3, 4)]


def compute_gray(img: jnp.ndarray) -> jnp.ndarray:
    """RGB (H, W, 3) uint8 -> gray uint8, r*0.299+g*0.587+b*0.114 truncated
    (cost_computor.cpp:58-73).

    Computed in float32 on device; differs from the C++ double path on
    ~0.02% of RGB triples (off-by-one), which only perturbs individual
    census bits. Use ``compute_gray_host64`` for bit-exact parity runs.
    """
    f = img.astype(jnp.float32)
    v = (
        f[..., 0] * jnp.float32(0.299)
        + f[..., 1] * jnp.float32(0.587)
        + f[..., 2] * jnp.float32(0.114)
    )
    return jnp.floor(v).astype(jnp.uint8)


def compute_gray_host64(img: np.ndarray) -> np.ndarray:
    """Bit-exact double-precision gray conversion (host-side NumPy)."""
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    return (r * 0.299 + g * 0.587 + b * 0.114).astype(np.uint8)


def census_transform_9x7(
    gray: jnp.ndarray,
    row_offset=0,
    full_h: int | None = None,
    full_w: int | None = None,
) -> jnp.ndarray:
    """63-bit census signature per pixel, packed as (2, H, W) uint32
    [plane 0 = bits 62..32 (first 31 comparisons), plane 1 = bits 31..0].

    The word axis is LEADING, not trailing: a trailing length-2 minor
    axis gets padded to the 128-lane tile in XLA temps (observed 128x
    HBM expansion on rematerialized copies); leading axes tile freely.

    Border pixels (rows <4/>=h-4, cols <3/>=w-3) are zero, matching the
    reference (adcensus_util.cpp:17-18 loop bounds).

    ``row_offset``/``full_h``/``full_w`` support row-slab computation by
    the sharded pipeline: ``gray`` is then a slab whose row 0 is global
    row ``row_offset`` (may be traced) of a ``full_h``-row image, and
    validity is judged in global coordinates. Callers must supply 4 rows
    of true context around any row they keep.
    """
    h, w = gray.shape
    full_h = h if full_h is None else full_h
    full_w = w if full_w is None else full_w
    center = gray
    hi = jnp.zeros((h, w), jnp.uint32)
    lo = jnp.zeros((h, w), jnp.uint32)
    for k, (r, c) in enumerate(_CENSUS_OFFSETS):
        # out[y,x] must read gray[y+r, x+c]  ->  shift by (-r, -c).
        neigh = shift2d(gray, -r, -c, 0)
        bit = (neigh < center).astype(jnp.uint32)
        pos = 62 - k
        if pos >= 32:
            hi = hi | (bit << jnp.uint32(pos - 32))
        else:
            lo = lo | (bit << jnp.uint32(pos))
    gy = row_offset + jnp.arange(h)
    valid = (
        (gy[:, None] >= 4)
        & (gy[:, None] < full_h - 4)
        & (jnp.arange(w)[None, :] >= 3)
        & (jnp.arange(w)[None, :] < full_w - 3)
    )
    # reference also zeroes everything when the image is too small
    if not (full_w > 9 and full_h > 7):
        valid = jnp.zeros((h, w), dtype=bool)
    hi = jnp.where(valid, hi, 0)
    lo = jnp.where(valid, lo, 0)
    return jnp.stack([hi, lo], axis=0)


def hamming63(census_a: jnp.ndarray, census_b: jnp.ndarray) -> jnp.ndarray:
    """Hamming distance between packed census signatures (2, H, W)
    uint32 (adcensus_util.cpp:42-53)."""
    x = census_a ^ census_b
    pc = jax.lax.population_count(x)
    return (pc[0] + pc[1]).astype(jnp.int32)


def _span(opts: ADCensusOptions) -> int:
    return max(abs(opts.min_disparity), abs(opts.max_disparity)) + 1


def _cost_plane(
    left_i: jnp.ndarray,
    right_p: jnp.ndarray,
    census_l: jnp.ndarray,
    cen_r_p: jnp.ndarray,
    span: int,
    opts: ADCensusOptions,
    d,
) -> jnp.ndarray:
    """One (H, W) cost plane at *traced* absolute disparity ``d``.

    ``right_p``/``cen_r_p`` are the right image / right census pre-padded
    by ``span`` along W so the epipolar shift is a dynamic slice; values
    are bitwise-identical to the static-shift planes (same zero fill,
    same arithmetic order)."""
    h, w = census_l.shape[1:]
    lam_ad = jnp.float32(opts.lambda_ad)
    lam_cen = jnp.float32(opts.lambda_census)
    r_shift = jax.lax.dynamic_slice(
        right_p, (0, span - d, 0), (h, w, 3)
    ).astype(jnp.int32)
    ad = jnp.sum(jnp.abs(left_i - r_shift), axis=-1).astype(
        jnp.float32
    ) / jnp.float32(3.0)
    cen_r = jax.lax.dynamic_slice(cen_r_p, (0, 0, span - d), (2, h, w))
    cen = hamming63(census_l, cen_r).astype(jnp.float32)
    cost = (
        jnp.float32(1.0)
        - jnp.exp(-ad / lam_ad)
        + jnp.float32(1.0)
        - jnp.exp(-cen / lam_cen)
    )
    xr = jnp.arange(w)[None, :] - d
    oob = (xr < 0) | (xr >= w)
    return jnp.where(oob, jnp.float32(1.0), cost)


def compute_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    census_l: jnp.ndarray,
    census_r: jnp.ndarray,
    opts: ADCensusOptions,
    rolled: bool | None = None,
) -> jnp.ndarray:
    """Initial AD-Census cost volume, layout (D, H, W) float32.

    cost = (1 - exp(-C_ad/lambda_ad)) + (1 - exp(-C_census/lambda_census))
    with C_ad the mean per-channel absolute difference and out-of-image
    columns costed 1.0 (cost_computor.cpp:82-121). Each disparity plane is
    a statically shifted image pair — no gathers.

    ``rolled`` selects a ``lax.map``-over-d build (compiles the plane body
    once instead of unrolling D copies); default: rolled on the CPU
    backend, where the unrolled graph's compile time is pathological at
    full D (>50 min for the 8-way sharded Cone program), unrolled on TPU
    where XLA fuses the static shifts. Outputs are bitwise identical.
    """
    h, w, _ = left.shape
    if rolled is None:
        rolled = jax.default_backend() == "cpu"
    if rolled:
        span = _span(opts)
        left_i = left.astype(jnp.int32)
        right_p = jnp.pad(right, ((0, 0), (span, span), (0, 0)))
        cen_r_p = jnp.pad(census_r, ((0, 0), (0, 0), (span, span)))
        ds = jnp.arange(opts.disp_range, dtype=jnp.int32) + opts.min_disparity
        return jax.lax.map(
            lambda d: _cost_plane(
                left_i, right_p, census_l, cen_r_p, span, opts, d
            ),
            ds,
        )
    d_range = opts.disp_range
    left_i = left.astype(jnp.int32)
    lam_ad = jnp.float32(opts.lambda_ad)
    lam_cen = jnp.float32(opts.lambda_census)

    planes = []
    for di in range(d_range):
        d = di + opts.min_disparity
        # right image sampled at xr = x - d  ->  shift right image by +d
        r_shift = shift2d(right, 0, d, 0).astype(jnp.int32)
        ad = jnp.sum(jnp.abs(left_i - r_shift), axis=-1).astype(
            jnp.float32
        ) / jnp.float32(3.0)
        cen_r = shift_last(census_r, d, 0)
        cen = hamming63(census_l, cen_r).astype(jnp.float32)
        cost = (
            jnp.float32(1.0)
            - jnp.exp(-ad / lam_ad)
            + jnp.float32(1.0)
            - jnp.exp(-cen / lam_cen)
        )
        x = jnp.arange(w)[None, :]
        xr = x - d
        oob = (xr < 0) | (xr >= w)
        planes.append(jnp.where(oob, jnp.float32(1.0), cost))
    return jnp.stack(planes, axis=0)


def compute_cost_planes(
    left: jnp.ndarray,
    right: jnp.ndarray,
    census_l: jnp.ndarray,
    census_r: jnp.ndarray,
    opts: ADCensusOptions,
    d0,
    d_count: int,
    rolled: bool | None = None,
) -> jnp.ndarray:
    """``d_count`` cost planes starting at *traced* disparity index ``d0``
    — the disparity-sharded variant of :func:`compute_cost_volume` (each
    shard builds its own d-plane block, so the plane offset is its
    ``axis_index``). Dynamic shifts are dynamic slices of a
    span-padded right image; values match compute_cost_volume exactly.
    ``rolled`` as in :func:`compute_cost_volume`.
    """
    span = _span(opts)
    left_i = left.astype(jnp.int32)
    right_p = jnp.pad(right, ((0, 0), (span, span), (0, 0)))
    cen_r_p = jnp.pad(census_r, ((0, 0), (0, 0), (span, span)))
    d0 = jnp.asarray(d0, jnp.int32)
    if rolled is None:
        rolled = jax.default_backend() == "cpu"
    if rolled:
        ds = d0 + jnp.arange(d_count, dtype=jnp.int32) + opts.min_disparity
        return jax.lax.map(
            lambda d: _cost_plane(
                left_i, right_p, census_l, cen_r_p, span, opts, d
            ),
            ds,
        )
    planes = [
        _cost_plane(
            left_i, right_p, census_l, cen_r_p, span, opts,
            d0 + di + opts.min_disparity,
        )
        for di in range(d_count)
    ]
    return jnp.stack(planes, axis=0)


def census_packed_to_u64(census: np.ndarray) -> np.ndarray:
    """Host-side: packed (2, H, W) uint32 -> uint64 signatures for
    comparison against the oracle."""
    hi = census[0].astype(np.uint64)
    lo = census[1].astype(np.uint64)
    return (hi << np.uint64(32)) | lo
