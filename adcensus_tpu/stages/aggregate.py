"""Stage 2b — cross-based cost aggregation, TPU-native.

The reference aggregates each disparity slice with two passes of per-pixel
arm loops, 4 iterations alternating horizontal-first/vertical-first,
re-aggregating its own output in place (cross_aggregator.cpp:89-118,
327-394). Two TPU formulations of the variable-arm windowed sums exist:

* **MXU band-matrix matmuls** (the TPU default, ops/cross_matmul.py):
  each pass is a batched matmul against 0/1 band matrices built from the
  arms — the window sum costs MXU MACs instead of VPU mask-adds.
  Different float32 rounding order than the reference's sequential adds
  (~2^-17 relative); gated by the end-to-end bad-2.0 tolerance.
* **Masked-roll kernels / jnp mirror** (use_pallas=True / False): 2L+1
  masked roll-accumulations per pass in the reference's exact summation
  order — bit-exact float parity, used by the golden stage tests.

(SURVEY.md §7 sketched a cumsum-difference O(1) window sum; that was
superseded — a per-pixel-indexed cumsum difference needs lane gathers,
which the TPU has no fast path for, while the band matmul rides the MXU.)

Support counts apply the same operator to ones
(cross_aggregator.cpp:271-325) via cheap 2-D masked shifts.
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

    Backends: "matmul" (MXU band matrices, TPU default), "pallas" /
    "jnp" (bit-exact masked rolls in the reference's summation order).
    The band matrices are built once and reused across all iterations.
    """
    import os

    from adcensus_tpu.ops.basic import resolve_cross_backend
    from adcensus_tpu.ops.cross_matmul import band_masks

    max_arm = min(opts.cross_L1, MAX_ARM_LENGTH)
    sup_h, sup_v = support_counts(arms, max_arm)
    sup_h = sup_h.astype(jnp.float32)
    sup_v = sup_v.astype(jnp.float32)
    impl = os.environ.get("ADC_AGG_IMPL")
    if impl == "skip":  # ablation-only: cost of the stage by absence
        return cost
    backend = resolve_cross_backend(use_pallas)
    if backend == "matmul" and impl == "banded":
        # Opt-in blocked-band Pallas kernel (ops/band_mm_pallas.py).
        # Measured dead end on the bench chip (interleaved in-process
        # A/B, Cone fused match: XLA dense 12.6 ms, banded 19.2 ms,
        # aggregation skipped 13.1 ms): XLA fuses the band-mask
        # GENERATION into the einsum (the (H, W, W) bf16 masks never
        # touch HBM), so the dense path's real cost is near zero and a
        # smaller hand-built mask cannot beat it. Kept as the
        # ADC_AGG_IMPL=banded backend with exact-mirror tests; the
        # skip row also shows aggregation pays for itself downstream
        # (a noisier volume slows the refine tail by more than the
        # aggregation costs).
        from adcensus_tpu.ops.band_mm_pallas import (
            aggregate_banded,
            banded_fits,
        )

        d, h, w = cost.shape
        if banded_fits(d, h, w, max_arm):
            return aggregate_banded(
                cost, arms, sup_h, sup_v, max_arm, num_iters
            )
    masks = band_masks(arms, max_arm) if backend == "matmul" else None

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
            masks=masks,
        )
        horizontal_first = not horizontal_first
    return cost
