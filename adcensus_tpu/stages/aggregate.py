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
from adcensus_tpu.ops.cross_sum_pallas import cross_pass


def _arm_sum_rolls(
    vals: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray, axis: int,
    max_arm: int,
) -> jnp.ndarray:
    """Variable-arm sum of an (H, W) plane via static masked shifts
    (gather-free; arms never cross the border so shifted fill is masked)."""
    from adcensus_tpu.ops.basic import shift2d

    acc = vals
    for t in range(1, max_arm + 1):
        sh = (-t, 0) if axis == 0 else (0, -t)
        acc = acc + jnp.where(hi >= t, shift2d(vals, *sh, 0), 0)
        sh = (t, 0) if axis == 0 else (0, t)
        acc = acc + jnp.where(lo >= t, shift2d(vals, *sh, 0), 0)
    return acc


def support_counts(
    arms: jnp.ndarray, max_arm: int = MAX_ARM_LENGTH
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Support-region pixel counts (horizontal-first, vertical-first),
    each (H, W) int32 (cross_aggregator.cpp:271-325)."""
    al = arms[..., 0]
    ar = arms[..., 1]
    at = arms[..., 2]
    ab = arms[..., 3]
    max_arm = min(max_arm, MAX_ARM_LENGTH)
    h_extent = (al + ar + 1).astype(jnp.int32)
    v_extent = (at + ab + 1).astype(jnp.int32)
    sup_h = _arm_sum_rolls(h_extent, at, ab, 0, max_arm)  # horizontal-first
    sup_v = _arm_sum_rolls(v_extent, al, ar, 1, max_arm)  # vertical-first
    return sup_h, sup_v


def aggregate(
    cost: jnp.ndarray,
    arms: jnp.ndarray,
    opts: ADCensusOptions,
    num_iters: int = 4,
    use_pallas: bool | None = None,
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
    max_arm = min(opts.cross_L1, MAX_ARM_LENGTH)
    sup_h, sup_v = support_counts(arms, max_arm)
    sup_h = sup_h.astype(jnp.float32)
    sup_v = sup_v.astype(jnp.float32)

    horizontal_first = True
    for _ in range(num_iters):
        cost = cross_pass(
            cost,
            arms,
            sup_h if horizontal_first else sup_v,
            horizontal_first,
            max_arm,
            normalize=True,
            use_pallas=use_pallas,
        )
        horizontal_first = not horizontal_first
    return cost
