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

TPU formulation: instead of argmin + take_along_axis (TPU gathers are
slow) the winner, its cost, and its two neighbor costs are tracked in a
single running scan over the D planes — a fused elementwise pass per
view, no gathers; the right view's plane shift (a static pad/slice per
plane) folds into its pass.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from adcensus_tpu.config import ADCensusOptions, INVALID_FLOAT, LARGE_FLOAT
from adcensus_tpu.ops.basic import shift2d


def _running_wta(planes) -> Tuple[jnp.ndarray, ...]:
    """Scan a sequence of (H, W) cost planes; return (best, c_min, c1, c2)
    where c1/c2 are the planes just below/above the winner (garbage when
    the winner is the first/last plane — callers discard those)."""
    first = planes[0]
    best = jnp.zeros(first.shape, jnp.int32)
    c_min = jnp.full(first.shape, LARGE_FLOAT, jnp.float32)
    c1 = jnp.zeros_like(first)
    c2 = jnp.zeros_like(first)
    prev = first
    for di, c in enumerate(planes):
        # neighbor-above of the current winner (uses the *old* best)
        c2 = jnp.where(best == di - 1, c, c2)
        is_new = c < c_min
        best = jnp.where(is_new, di, best)
        c1 = jnp.where(is_new, prev, c1)
        c_min = jnp.where(is_new, c, c_min)
        prev = c
    return best, c_min, c1, c2


def _parabola(best, c_min, c1, c2, opts: ADCensusOptions) -> jnp.ndarray:
    """d* = d + (c1 - c2) / (2 (c1 + c2 - 2 c_min))
    (ADCensusStereo.cpp:228-240)."""
    denom = c1 + c2 - 2 * c_min
    best_d = (best + opts.min_disparity).astype(jnp.float32)
    return jnp.where(
        denom != 0.0,
        best_d + (c1 - c2) / (denom * jnp.float32(2.0)),
        best_d,
    )


def wta_left(cost: jnp.ndarray, opts: ADCensusOptions) -> jnp.ndarray:
    """(D, H, W) volume -> (H, W) float32 left disparity."""
    d_range = cost.shape[0]
    best, c_min, c1, c2 = _running_wta([cost[d] for d in range(d_range)])
    disp = _parabola(best, c_min, c1, c2, opts)
    border = (best == 0) | (best == d_range - 1)
    return jnp.where(border, INVALID_FLOAT, disp)


def _right_planes(cost: jnp.ndarray, opts: ADCensusOptions):
    """cost_r(d, y, x) = cost_l(d, y, x + d) with d the true disparity
    (plane index + min_disparity); Large_Float out of range
    (ADCensusStereo.cpp:277-286). Static shift per plane — fused
    pad/slice ops instead of a (slow) TPU gather."""
    return [
        shift2d(cost[di], 0, -(di + opts.min_disparity), LARGE_FLOAT)
        for di in range(cost.shape[0])
    ]


def right_cost_volume(
    cost: jnp.ndarray, opts: ADCensusOptions
) -> jnp.ndarray:
    """Materialized right volume (kept for tests/debugging; the WTA path
    never builds it)."""
    return jnp.stack(_right_planes(cost, opts), axis=0)


def wta_right(cost: jnp.ndarray, opts: ADCensusOptions) -> jnp.ndarray:
    """(D, H, W) *left* volume -> (H, W) float32 right disparity."""
    d_range = cost.shape[0]
    best, c_min, c1, c2 = _running_wta(_right_planes(cost, opts))
    disp = _parabola(best, c_min, c1, c2, opts)
    border = (best == 0) | (best == d_range - 1)
    # border winners stay valid with their integer disparity
    return jnp.where(
        border, (best + opts.min_disparity).astype(jnp.float32), disp
    )
