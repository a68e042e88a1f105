"""Stage 3 — 4-direction scanline (SGM-style) optimization, TPU-native.

The reference runs four sequential directional DP passes, each pixel's
D-vector depending on the previous pixel on the path
(scanline_optimizer.cpp:40-279). Here each pass is a ``lax.scan`` along the
path axis carrying (Lr, min Lr) for *all* paths simultaneously: the
recurrence

    Lr(p,d) = (C(p,d) + min(Lr(p-r,d), Lr(p-r,d-1)+P1,
                            Lr(p-r,d+1)+P1, min_d' Lr(p-r,d') + P2)) / 2

is a (P, D)-shaped elementwise step (P = number of parallel paths), with
the d±1 neighbors as static shifts padded with Large_Float — exactly the
reference's virtual d=-1/D sentinels (scanline_optimizer.cpp:96). The
color-adaptive P1/P2 (including the *sticky* d2 lookup) are precomputed as
(D, H, W) penalty volumes so the scan body is pure arithmetic.

A Pallas kernel version of the inner scan lives in
``adcensus_tpu.ops.scanline_pallas`` (used on TPU); this module is the
reference jnp formulation and the entry point that prepares penalties.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from adcensus_tpu.config import ADCensusOptions, LARGE_FLOAT
from adcensus_tpu.ops.basic import color_dist, shift2d, shift_last


def penalty_volumes(
    left: jnp.ndarray,
    right: jnp.ndarray,
    opts: ADCensusOptions,
    axis: str,
    forward: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """P1/P2 penalty volumes (D, H, W) float32 for one pass direction.

    d1 is the color distance between consecutive *left*-image pixels on the
    path; d2 the same on the *right* image at column xr = x - d - min_disp
    (scanline_optimizer.cpp:115-126). d2 is sticky: where xr falls outside
    (0, w-1) it keeps the value of the previous d iteration (initially d1).
    The (d1, d2) vs tso quadrant selects (P1, P2), (P1, P2)/4 or /10
    (scanline_optimizer.cpp:128-141).
    """
    h, w, _ = left.shape
    d_range = opts.disp_range
    direction = 1 if forward else -1
    dy, dx = (0, direction) if axis == "x" else (direction, 0)

    # d1[y, x] = dist(left[p], left[p - step]); seed column never read.
    left_prev = shift2d(left, dy, dx, 0)
    d1 = color_dist(left, left_prev)  # (H, W) int32

    # rd[y, x] = dist(right[y, x], right at p - step in the right image)
    right_prev = shift2d(right, dy, dx, 0)
    rd = color_dist(right, right_prev)  # (H, W)

    # raw d2 candidates: rd gathered at xr = x - d - min_disp
    x = jnp.arange(w)[None, None, :]
    d = jnp.arange(d_range)[:, None, None]
    xr = x - d - opts.min_disparity  # (D, 1, W)
    valid = (xr > 0) & (xr < w - 1)  # (D, 1, W)
    xr_c = jnp.clip(xr, 0, w - 1)
    idx = jnp.broadcast_to(xr_c, (d_range, h, w))
    g = jnp.take_along_axis(
        jnp.broadcast_to(rd[None], (d_range, h, w)), idx, axis=2
    )  # (D, H, W)

    # sticky forward-fill along d: last valid index <= d, else use d1
    d_ids = jnp.broadcast_to(d, (d_range, 1, w))
    last_valid = jax.lax.associative_scan(
        jnp.maximum, jnp.where(valid, d_ids, -1), axis=0
    )  # (D, 1, W)
    lv_idx = jnp.broadcast_to(jnp.clip(last_valid, 0), (d_range, h, w))
    g_fill = jnp.take_along_axis(g, lv_idx, axis=0)
    has_valid = jnp.broadcast_to(last_valid >= 0, (d_range, h, w))
    d2 = jnp.where(has_valid, g_fill, d1[None])  # (D, H, W) int32

    tso = opts.so_tso
    b1 = d1[None] < tso  # broadcast (1,H,W) -> compare
    b2 = d2 < tso
    both = b1 & b2
    neither = (~b1) & (~b2)
    p1 = jnp.float32(opts.so_p1)
    p2 = jnp.float32(opts.so_p2)
    P1 = jnp.where(both, p1, jnp.where(neither, p1 / 10, p1 / 4))
    P2 = jnp.where(both, p2, jnp.where(neither, p2 / 10, p2 / 4))
    return P1.astype(jnp.float32), P2.astype(jnp.float32)


def _to_scan_layout(vol: jnp.ndarray, axis: str, forward: bool) -> jnp.ndarray:
    """(D, H, W) -> (S, P, D) with S the scan axis (first element = path
    seed)."""
    if axis == "x":
        v = jnp.transpose(vol, (2, 1, 0))  # (W, H, D)
    else:
        v = jnp.transpose(vol, (1, 2, 0))  # (H, W, D)
    if not forward:
        v = jnp.flip(v, axis=0)
    return v


def _from_scan_layout(v: jnp.ndarray, axis: str, forward: bool) -> jnp.ndarray:
    if not forward:
        v = jnp.flip(v, axis=0)
    if axis == "x":
        return jnp.transpose(v, (2, 1, 0))
    return jnp.transpose(v, (2, 0, 1))


def scanline_pass_scan(
    cost_s: jnp.ndarray, P1_s: jnp.ndarray, P2_s: jnp.ndarray
) -> jnp.ndarray:
    """Run the DP recurrence over (S, P, D) scan-layout arrays with
    ``lax.scan``; the first step is the seed (costs copied unchanged,
    scanline_optimizer.cpp:99-100)."""
    seed = cost_s[0]
    min0 = jnp.min(seed, axis=-1)

    def step(carry, xs):
        lr_prev, min_prev = carry
        c, p1v, p2v = xs
        l2 = shift_last(lr_prev, 1, LARGE_FLOAT) + p1v
        l3 = shift_last(lr_prev, -1, LARGE_FLOAT) + p1v
        l4 = min_prev[:, None] + p2v
        m = jnp.minimum(
            jnp.minimum(lr_prev, l2), jnp.minimum(l3, l4)
        )
        lr = (c + m) * jnp.float32(0.5)
        mn = jnp.min(lr, axis=-1)
        return (lr, mn), lr

    (_, _), rest = jax.lax.scan(
        step, (seed, min0), (cost_s[1:], P1_s[1:], P2_s[1:])
    )
    return jnp.concatenate([seed[None], rest], axis=0)


def scanline_pass(
    cost: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    opts: ADCensusOptions,
    axis: str,
    forward: bool,
) -> jnp.ndarray:
    """One directional pass over a (D, H, W) volume."""
    P1, P2 = penalty_volumes(left, right, opts, axis, forward)
    cost_s = _to_scan_layout(cost, axis, forward)
    P1_s = _to_scan_layout(P1, axis, forward)
    P2_s = _to_scan_layout(P2, axis, forward)
    out_s = scanline_pass_scan(cost_s, P1_s, P2_s)
    return _from_scan_layout(out_s, axis, forward)


def scanline_optimize(
    cost: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    opts: ADCensusOptions,
) -> jnp.ndarray:
    """Four sequential directional passes: L→R, R→L, U→D, D→U, each
    consuming the previous pass's output (scanline_optimizer.cpp:53-60)."""
    cost = scanline_pass(cost, left, right, opts, "x", True)
    cost = scanline_pass(cost, left, right, opts, "x", False)
    cost = scanline_pass(cost, left, right, opts, "y", True)
    cost = scanline_pass(cost, left, right, opts, "y", False)
    return cost
