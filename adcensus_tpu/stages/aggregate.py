"""Stage 2b — cross-based cost aggregation, TPU-native.

The reference aggregates each disparity slice with two passes of per-pixel
arm loops, 4 iterations alternating horizontal-first/vertical-first,
re-aggregating its own output in place (cross_aggregator.cpp:89-118,
327-394). Here each pass is an exact O(1)-per-pixel variable-window sum:
``hsum(x) = cumsum[x + right] - cumsum[x - left - 1]`` over the (D, H, W)
volume (SURVEY.md §7 key design decisions), with support counts computed by
applying the same operator to ones (cross_aggregator.cpp:271-325).

Numerical note: the cumsum-difference evaluates the same real sum as the
reference's sequential adds but with different float32 rounding order;
stage tests use a small tolerance and the end-to-end gate is bad-2.0.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from adcensus_tpu.config import ADCensusOptions, MAX_ARM_LENGTH
from adcensus_tpu.ops.basic import window_sum_h, window_sum_w
from adcensus_tpu.ops.cross_sum_pallas import cross_pass


def support_counts(arms: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Support-region pixel counts (horizontal-first, vertical-first),
    each (H, W) int32 (cross_aggregator.cpp:271-325)."""
    al = arms[..., 0]
    ar = arms[..., 1]
    at = arms[..., 2]
    ab = arms[..., 3]
    ones = jnp.ones(arms.shape[:-1], jnp.int32)
    h_extent = window_sum_w(ones, al, ar)       # = al + ar + 1
    v_extent = window_sum_h(ones, at, ab)
    sup_h = window_sum_h(h_extent, at, ab)      # horizontal-first
    sup_v = window_sum_w(v_extent, al, ar)      # vertical-first
    return sup_h, sup_v


def aggregate(
    cost: jnp.ndarray,
    arms: jnp.ndarray,
    opts: ADCensusOptions,
    num_iters: int = 4,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Aggregate a (D, H, W) cost volume over cross support regions.

    ``num_iters`` iterations (reference calls Aggregate(4),
    ADCensusStereo.cpp:164) alternating horizontal-first / vertical-first,
    each normalizing by the matching support count.

    The Pallas backend fuses both passes of an iteration into one kernel
    with the plane resident in VMEM and reproduces the reference's
    sequential summation order bit-exactly; the jnp backend uses
    cumsum-difference window sums (tiny reassociation noise).
    """
    sup_h, sup_v = support_counts(arms)
    sup_h = sup_h.astype(jnp.float32)
    sup_v = sup_v.astype(jnp.float32)
    max_arm = min(opts.cross_L1, MAX_ARM_LENGTH)

    horizontal_first = True
    for _ in range(num_iters):
        if use_pallas:
            cost = cross_pass(
                cost,
                arms,
                sup_h if horizontal_first else sup_v,
                horizontal_first,
                max_arm,
                normalize=True,
            )
        else:
            al, ar, at, ab = (arms[..., i] for i in range(4))
            if horizontal_first:
                cost = window_sum_w(cost, al, ar)
                cost = window_sum_h(cost, at, ab) / sup_h
            else:
                cost = window_sum_h(cost, at, ab)
                cost = window_sum_w(cost, al, ar) / sup_v
        horizontal_first = not horizontal_first
    return cost
