"""Stage 2a — cross-arm construction, TPU-native.

The reference grows each arm with a per-pixel break-loop
(cross_aggregator.cpp:135-269). Because the loop runs at most
min(L1, 255) = 34 bounded steps, it vectorizes exactly as a cumulative-AND
over candidate offsets: arm length = number of leading candidates that pass
every break condition, computed simultaneously for all pixels with static
image shifts (pure VPU work, no gathers).
"""
from __future__ import annotations

import jax.numpy as jnp

from adcensus_tpu.config import ADCensusOptions, MAX_ARM_LENGTH
from adcensus_tpu.ops.basic import color_dist, shift2d


def _arm_length(
    img: jnp.ndarray, dy: int, dx: int, opts: ADCensusOptions
) -> jnp.ndarray:
    """Arm length toward (dy, dx) for every pixel, (H, W) int32.

    Candidate n (0-based) sits at offset (n+1)*(dy,dx). It extends the arm
    iff (cross_aggregator.cpp:151-198, order preserved):
      * it is inside the image;
      * color_dist(candidate, anchor) < t1;
      * n == 0 or color_dist(candidate, previous) < t1;
      * n + 1 <= L2 or color_dist(candidate, anchor) < t2.
    The arm is the count of leading passing candidates.
    """
    h, w, _ = img.shape
    steps = min(opts.cross_L1, MAX_ARM_LENGTH)
    img_i = img.astype(jnp.int32)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]

    alive = jnp.ones((h, w), dtype=bool)
    length = jnp.zeros((h, w), dtype=jnp.int32)
    for n in range(steps):
        off = n + 1
        ny = yy + dy * off
        nx = xx + dx * off
        in_bounds = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        # candidate color at offset (n+1), previous at offset n
        cand = shift2d(img_i, -dy * off, -dx * off, 0)
        prev = img_i if n == 0 else shift2d(img_i, -dy * n, -dx * n, 0)
        dist1 = color_dist(cand, img_i)
        ok = in_bounds & (dist1 < opts.cross_t1)
        if n > 0:
            ok = ok & (color_dist(cand, prev) < opts.cross_t1)
        if n + 1 > opts.cross_L2:
            ok = ok & (dist1 < opts.cross_t2)
        alive = alive & ok
        length = length + alive.astype(jnp.int32)
    return length


def build_arms(left: jnp.ndarray, opts: ADCensusOptions) -> jnp.ndarray:
    """Per-pixel cross arms on the left image, (H, W, 4) int32 ordered
    [left, right, top, bottom] (cross_aggregator.cpp:76-86)."""
    return jnp.stack(
        [
            _arm_length(left, 0, -1, opts),
            _arm_length(left, 0, 1, opts),
            _arm_length(left, -1, 0, opts),
            _arm_length(left, 1, 0, opts),
        ],
        axis=-1,
    )
