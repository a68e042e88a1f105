"""Stage 2a — cross-arm construction, TPU-native.

The reference grows each arm with a per-pixel break-loop
(cross_aggregator.cpp:135-269). Because the loop runs at most
min(L1, 255) = 34 bounded steps, it vectorizes exactly as a cumulative-AND
over candidate offsets: arm length = number of leading candidates that pass
every break condition, computed simultaneously for all pixels with static
image shifts (pure VPU work, no gathers).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adcensus_tpu.config import ADCensusOptions, MAX_ARM_LENGTH
from adcensus_tpu.ops.basic import color_dist, shift2d


def _arm_length(
    img: jnp.ndarray,
    dy: int,
    dx: int,
    opts: ADCensusOptions,
    row_offset=0,
    full_h: int | None = None,
    full_w: int | None = None,
) -> jnp.ndarray:
    """Arm length toward (dy, dx) for every pixel, (H, W) int32.

    Candidate n (0-based) sits at offset (n+1)*(dy,dx). It extends the arm
    iff (cross_aggregator.cpp:151-198, order preserved):
      * it is inside the image;
      * color_dist(candidate, anchor) < t1;
      * n == 0 or color_dist(candidate, previous) < t1;
      * n + 1 <= L2 or color_dist(candidate, anchor) < t2.
    The arm is the count of leading passing candidates.

    ``row_offset``/``full_h``/``full_w``: row-slab mode for the sharded
    pipeline — ``img`` is a slab whose row 0 is global row ``row_offset``
    (may be traced) of a ``full_h``x``full_w`` image, and the in-image
    bound is judged in global coordinates. Callers must supply
    min(L1,255) rows of true context around any row they keep.
    """
    h, w, _ = img.shape
    full_h = h if full_h is None else full_h
    full_w = w if full_w is None else full_w
    steps = min(opts.cross_L1, MAX_ARM_LENGTH)
    img_i = img.astype(jnp.int32)

    yy = row_offset + jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]

    alive = jnp.ones((h, w), dtype=bool)
    length = jnp.zeros((h, w), dtype=jnp.int32)
    for n in range(steps):
        off = n + 1
        ny = yy + dy * off
        nx = xx + dx * off
        in_bounds = (ny >= 0) & (ny < full_h) & (nx >= 0) & (nx < full_w)
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


def _arm_length_rolled(
    img: jnp.ndarray,
    dy: int,
    dx: int,
    opts: ADCensusOptions,
    row_offset=0,
    full_h: int | None = None,
    full_w: int | None = None,
) -> jnp.ndarray:
    """fori_loop form of :func:`_arm_length` (one compiled step instead
    of min(L1,255) unrolled copies — the CPU backend's compile-time
    path).  The previous candidate is carried, so step n needs a single
    dynamic slice; all comparisons are integer, hence bitwise identical
    to the unrolled build. Slab params as in :func:`_arm_length`."""
    h, w, _ = img.shape
    full_h = h if full_h is None else full_h
    full_w = w if full_w is None else full_w
    steps = min(opts.cross_L1, MAX_ARM_LENGTH)
    img_i = img.astype(jnp.int32)
    s = steps
    padded = jnp.pad(img_i, ((s, s), (s, s), (0, 0)))
    yy = row_offset + jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]

    def body(n, carry):
        alive, length, prev = carry
        off = n + 1
        cand = jax.lax.dynamic_slice(
            padded, (s + dy * off, s + dx * off, 0), (h, w, 3)
        )
        ny = yy + dy * off
        nx = xx + dx * off
        in_bounds = (ny >= 0) & (ny < full_h) & (nx >= 0) & (nx < full_w)
        dist1 = color_dist(cand, img_i)
        # at n == 0 prev is the anchor itself, so the dist-to-previous
        # check degenerates to dist1 < t1 (already required) — exactly
        # the reference's n == 0 skip
        ok = (
            in_bounds
            & (dist1 < opts.cross_t1)
            & (color_dist(cand, prev) < opts.cross_t1)
            & ((off <= opts.cross_L2) | (dist1 < opts.cross_t2))
        )
        alive = alive & ok
        return alive, length + alive.astype(jnp.int32), cand

    _, length, _ = jax.lax.fori_loop(
        0,
        steps,
        body,
        (
            jnp.ones((h, w), bool),
            jnp.zeros((h, w), jnp.int32),
            img_i,
        ),
    )
    return length


def build_arms(
    left: jnp.ndarray,
    opts: ADCensusOptions,
    rolled: bool | None = None,
    row_offset=0,
    full_h: int | None = None,
    full_w: int | None = None,
) -> jnp.ndarray:
    """Per-pixel cross arms on the left image, (H, W, 4) int32 ordered
    [left, right, top, bottom] (cross_aggregator.cpp:76-86).

    ``rolled`` selects the fori_loop build (default on the CPU backend,
    where unrolling 4x34 steps blows up XLA compile time; TPU keeps the
    unrolled static-shift form XLA fuses best). Bitwise identical.
    Slab params (``row_offset``/``full_h``/``full_w``) as in
    :func:`_arm_length`."""
    if rolled is None:
        rolled = jax.default_backend() == "cpu"
    fn = _arm_length_rolled if rolled else _arm_length
    return jnp.stack(
        [
            fn(left, 0, -1, opts, row_offset, full_h, full_w),
            fn(left, 0, 1, opts, row_offset, full_h, full_w),
            fn(left, -1, 0, opts, row_offset, full_h, full_w),
            fn(left, 1, 0, opts, row_offset, full_h, full_w),
        ],
        axis=-1,
    )
