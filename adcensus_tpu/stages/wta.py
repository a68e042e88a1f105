"""Stage 4 — winner-take-all disparity + parabola subpixel, both views.

Vectorized re-expression of ADCensusStereo::ComputeDisparity /
ComputeDisparityRight (ADCensusStereo.cpp:188-310), preserving the
reference's asymmetric edge cases:

* left view: border winners (d == min or max-1) are Invalid_Float;
* right view: the volume is the left volume gathered at x + d
  (cost_r(x,y,d) = cost_l(x+d,y,d)), out-of-range slots see Large_Float,
  and border winners keep their *valid* integer disparity
  (ADCensusStereo.cpp:290-293).
* zero parabola curvature falls back to the integer disparity;
* ties break to the smallest disparity (first minimum).
"""
from __future__ import annotations

import jax.numpy as jnp

from adcensus_tpu.config import ADCensusOptions, INVALID_FLOAT, LARGE_FLOAT
from adcensus_tpu.ops.basic import shift2d


def _subpixel(
    cost: jnp.ndarray, best: jnp.ndarray, opts: ADCensusOptions
) -> jnp.ndarray:
    """Parabola refinement d* = d + (c1 - c2) / (2 (c1 + c2 - 2 c_min))
    (ADCensusStereo.cpp:228-240). ``cost`` is (D, H, W); ``best`` (H, W)
    int32 plane indices (0-based)."""
    d_range = cost.shape[0]
    b = best[None]
    c_min = jnp.take_along_axis(cost, b, axis=0)[0]
    c1 = jnp.take_along_axis(cost, jnp.clip(b - 1, 0, d_range - 1), axis=0)[0]
    c2 = jnp.take_along_axis(cost, jnp.clip(b + 1, 0, d_range - 1), axis=0)[0]
    denom = c1 + c2 - 2 * c_min
    best_d = (best + opts.min_disparity).astype(jnp.float32)
    return jnp.where(
        denom != 0.0,
        best_d + (c1 - c2) / (denom * jnp.float32(2.0)),
        best_d,
    )


def wta_left(cost: jnp.ndarray, opts: ADCensusOptions) -> jnp.ndarray:
    """(D, H, W) volume -> (H, W) float32 left disparity."""
    best = jnp.argmin(cost, axis=0).astype(jnp.int32)  # first minimum
    disp = _subpixel(cost, best, opts)
    d_range = cost.shape[0]
    border = (best == 0) | (best == d_range - 1)
    return jnp.where(border, INVALID_FLOAT, disp)


def right_cost_volume(
    cost: jnp.ndarray, opts: ADCensusOptions
) -> jnp.ndarray:
    """cost_r(d, y, x) = cost_l(d, y, x + d) with d the true disparity
    (plane index + min_disparity); Large_Float out of range
    (ADCensusStereo.cpp:277-286).

    Each plane is a *static* shift of the corresponding left plane —
    compiled to fused pad/slice ops instead of a (slow) TPU gather.
    """
    d_range, h, w = cost.shape
    planes = []
    for di in range(d_range):
        d = di + opts.min_disparity
        # out[y, x] = cost[di, y, x + d]  ->  shift by -d along x
        planes.append(shift2d(cost[di], 0, -d, LARGE_FLOAT))
    return jnp.stack(planes, axis=0)


def wta_right(cost: jnp.ndarray, opts: ADCensusOptions) -> jnp.ndarray:
    """(D, H, W) *left* volume -> (H, W) float32 right disparity."""
    cost_r = right_cost_volume(cost, opts)
    best = jnp.argmin(cost_r, axis=0).astype(jnp.int32)
    disp = _subpixel(cost_r, best, opts)
    d_range = cost.shape[0]
    border = (best == 0) | (best == d_range - 1)
    # border winners stay valid with their integer disparity
    return jnp.where(
        border, (best + opts.min_disparity).astype(jnp.float32), disp
    )
