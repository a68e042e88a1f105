"""Stage 3 — 4-direction scanline (SGM-style) optimization, TPU-native.

The reference runs four sequential directional DP passes, each pixel's
D-vector depending on the previous pixel on the path
(scanline_optimizer.cpp:40-279). Two equivalent backends:

* Pallas (default on TPU): a kernel scanning the path axis with the DP
  carry in VMEM scratch (adcensus_tpu/ops/scanline_pallas.py).
* jnp ``lax.scan`` (CPU/tests): the same recurrence, vectorized over all
  paths of a direction.

Both consume a compact (D, H, W) uint8 *penalty code* volume encoding the
color-adaptive (P1, P2) selection (0: both gradients < tso, 1: exactly one
>= tso, 2: both >= tso; scanline_optimizer.cpp:128-141).

The reference's d2 lookup is *sticky*: d2 keeps its previous-d value when
the right-image column xr = x - d - min_disp leaves (0, w-1)
(scanline_optimizer.cpp:116-126, d2 initialized to d1). Because xr is
strictly decreasing in d, stickiness has a closed form — no scan needed:

    d2(d, y, x) = d1(y, x)            if xr >= w-1 or x - min_disp <= 0
                  rd(y, max(xr, 1))   otherwise

(once xr falls to <= 0 the last valid column was 1; if x - min_disp <= 0
no d was ever valid, leaving the d1 initialization).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adcensus_tpu.config import ADCensusOptions, LARGE_FLOAT
from adcensus_tpu.ops.basic import (
    color_dist,
    resolve_use_pallas,
    shift2d,
    shift_last,
)
from adcensus_tpu.ops.scanline_pallas import scanline_pass_sdp


def penalty_code(
    left: jnp.ndarray,
    right: jnp.ndarray,
    opts: ADCensusOptions,
    axis: str,
    forward: bool,
    rolled: bool | None = None,
    real_w: int | None = None,
) -> jnp.ndarray:
    """(D, H, W) uint8 penalty-code volume for one pass direction.

    ``rolled`` selects a lax.map-over-d build (one compiled plane body;
    default on the CPU backend, where D unrolled copies blow up compile
    time). Bitwise identical to the unrolled static-shift form.

    ``real_w``: the image's true width when the arrays carry right-side
    lane padding (scanline_optimize's pre-pad) — the sticky-d2 boundary
    conditions (scanline_optimizer.cpp:116-126) must use the real border,
    not the padded one. Codes at pad columns are arbitrary (FLAG_PAD
    steps never read them)."""
    h, w, _ = left.shape
    rw = w if real_w is None else real_w
    d_range = opts.disp_range
    direction = 1 if forward else -1
    dy, dx = (0, direction) if axis == "x" else (direction, 0)

    # d1[y, x] = dist(left[p], left[p - step]); seed column never read.
    d1 = color_dist(left, shift2d(left, dy, dx, 0))  # (H, W) int32
    # rd[y, x] = dist(right[y, x], right at p - step in the right image)
    rd = color_dist(right, shift2d(right, dy, dx, 0))

    tso = opts.so_tso
    rd_col1 = rd[:, 1:2] if w > 1 else rd
    if rolled is None:
        rolled = jax.default_backend() == "cpu"
    if rolled:
        span = max(abs(opts.min_disparity), abs(opts.max_disparity)) + 1
        rd_p = jnp.pad(rd, ((0, 0), (span, span)))
        x1 = jnp.arange(w)[None, :]
        code1 = (d1 >= tso).astype(jnp.uint8)

        def plane(di):
            d = di + opts.min_disparity
            xr = x1 - d
            use_d1 = (xr >= rw - 1) | ((x1 - opts.min_disparity) <= 0)
            shifted = jax.lax.dynamic_slice(rd_p, (0, span - d), (h, w))
            sticky = jnp.where(xr < 1, rd_col1, shifted)
            d2 = jnp.where(use_d1, d1, sticky)
            return code1 + (d2 >= tso).astype(jnp.uint8)

        return jax.lax.map(plane, jnp.arange(d_range, dtype=jnp.int32))

    x = jnp.arange(w)[None, None, :]
    planes = []
    for di in range(d_range):
        xr = x[0] - di - opts.min_disparity  # (1, W)
        use_d1 = (xr >= rw - 1) | ((x[0] - opts.min_disparity) <= 0)
        shifted = shift2d(rd, 0, di + opts.min_disparity, 0)
        sticky = jnp.where(xr < 1, rd_col1, shifted)
        planes.append(jnp.where(use_d1, d1, sticky))
    d2 = jnp.stack(planes, axis=0)  # (D, H, W)

    n_ge = (d1[None] >= tso).astype(jnp.uint8) + (d2 >= tso).astype(
        jnp.uint8
    )
    return n_ge  # 0: both < tso, 1: one >= tso, 2: both >= tso


def _decode_penalties(code: jnp.ndarray, opts: ADCensusOptions):
    p1 = jnp.float32(opts.so_p1)
    p2 = jnp.float32(opts.so_p2)
    P1 = jnp.where(code == 0, p1, jnp.where(code == 1, p1 / 4, p1 / 10))
    P2 = jnp.where(code == 0, p2, jnp.where(code == 1, p2 / 4, p2 / 10))
    return P1.astype(jnp.float32), P2.astype(jnp.float32)


def _to_sdp(vol: jnp.ndarray, axis: str) -> jnp.ndarray:
    """(D, H, W) -> (S, D, P): scan axis leading, disparity on sublanes,
    paths on lanes. Backward passes are handled by the kernel's reversed
    grid (scanline_pass_sdp(reverse=True)), NOT by flipping data — a
    jnp.flip fused into the custom-call operand corrupted blocks on some
    real-TPU shapes."""
    if axis == "x":
        return jnp.transpose(vol, (2, 0, 1))  # (W, D, H)
    return jnp.transpose(vol, (1, 0, 2))  # (H, D, W)


def _from_sdp(v: jnp.ndarray, axis: str) -> jnp.ndarray:
    if axis == "x":
        return jnp.transpose(v, (1, 2, 0))  # (D, H, W)
    return jnp.transpose(v, (1, 0, 2))


def _scan_flags(s_len: int, valid: jnp.ndarray | None) -> jnp.ndarray:
    """Per-step flags in scan order: FLAG_PAD where the step is image
    padding, FLAG_SEED at the first real step, FLAG_NORMAL after."""
    from adcensus_tpu.ops.scanline_pallas import (
        FLAG_NORMAL,
        FLAG_PAD,
        FLAG_SEED,
    )

    if valid is None:
        valid = jnp.ones((s_len,), bool)
    first = jnp.argmax(valid)  # index of first True
    ids = jnp.arange(s_len)
    return jnp.where(
        ~valid,
        FLAG_PAD,
        jnp.where(ids == first, FLAG_SEED, FLAG_NORMAL),
    ).astype(jnp.int32)


def scanline_pass_scan(
    cost_s: jnp.ndarray,
    P1_s: jnp.ndarray,
    P2_s: jnp.ndarray,
    flags: jnp.ndarray,
) -> jnp.ndarray:
    """jnp backend: DP over (S, P, D) arrays with lax.scan. Flagged like
    the Pallas kernel: padding passes the carry through, the seed step
    copies costs unchanged (scanline_optimizer.cpp:99-100)."""
    from adcensus_tpu.ops.scanline_pallas import FLAG_NORMAL, FLAG_SEED

    p, d = cost_s.shape[1:]
    init = (
        jnp.full((p, d), LARGE_FLOAT, jnp.float32),
        jnp.full((p,), LARGE_FLOAT, jnp.float32),
    )

    def step(carry, xs):
        lr_prev, min_prev = carry
        c, p1v, p2v, flag = xs
        l2 = shift_last(lr_prev, 1, LARGE_FLOAT) + p1v
        l3 = shift_last(lr_prev, -1, LARGE_FLOAT) + p1v
        l4 = min_prev[:, None] + p2v
        m = jnp.minimum(jnp.minimum(lr_prev, l2), jnp.minimum(l3, l4))
        computed = (c + m) * jnp.float32(0.5)
        is_seed = flag == FLAG_SEED
        is_norm = flag == FLAG_NORMAL
        lr = jnp.where(is_norm, computed, c)  # pad/seed emit raw costs
        new_lr = jnp.where(is_seed | is_norm, lr, lr_prev)
        new_min = jnp.where(
            is_seed | is_norm, jnp.min(lr, axis=-1), min_prev
        )
        return (new_lr, new_min), lr

    (_, _), out = jax.lax.scan(step, init, (cost_s, P1_s, P2_s, flags))
    return out


def scanline_pass(
    cost: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    opts: ADCensusOptions,
    axis: str,
    forward: bool,
    use_pallas: bool | None = None,
    valid_s: jnp.ndarray | None = None,
    real_w: int | None = None,
) -> jnp.ndarray:
    """One directional pass over a (D, H, W) volume.

    ``valid_s``: optional (S,) bool marking real (non-padding) positions
    along the scan axis in volume orientation (W for axis 'x', H for 'y');
    used by the sharded pipeline, which pads images to tile multiples.
    ``real_w``: true image width when the arrays carry lane pre-padding
    (see scanline_optimize).
    """
    use_pallas = resolve_use_pallas(use_pallas)
    code = penalty_code(left, right, opts, axis, forward, real_w=real_w)
    s_len = cost.shape[2] if axis == "x" else cost.shape[1]
    v = valid_s
    if v is not None and not forward:
        v = jnp.flip(v)
    flags = _scan_flags(s_len, v)
    if use_pallas:
        out = scanline_pass_sdp(
            _to_sdp(cost, axis),
            _to_sdp(code, axis),
            flags,
            float(opts.so_p1),
            float(opts.so_p2),
            reverse=not forward,
        )
        return _from_sdp(out, axis)
    P1, P2 = _decode_penalties(code, opts)
    # jnp scan layout: (S, P, D)
    perm = (2, 1, 0) if axis == "x" else (1, 2, 0)
    cost_s = jnp.transpose(cost, perm)
    P1_s = jnp.transpose(P1, perm)
    P2_s = jnp.transpose(P2, perm)
    if not forward:
        cost_s, P1_s, P2_s = (jnp.flip(v2, 0) for v2 in (cost_s, P1_s, P2_s))
    out = scanline_pass_scan(cost_s, P1_s, P2_s, flags)
    if not forward:
        out = jnp.flip(out, 0)
    if axis == "x":
        return jnp.transpose(out, (2, 1, 0))
    return jnp.transpose(out, (2, 0, 1))


def scanline_optimize(
    cost: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    opts: ADCensusOptions,
    use_pallas: bool | None = None,
    valid_w: jnp.ndarray | None = None,
    valid_h: jnp.ndarray | None = None,
    lane_pad: bool | None = None,
) -> jnp.ndarray:
    """Four sequential directional passes: L→R, R→L, U→D, D→U, each
    consuming the previous pass's output (scanline_optimizer.cpp:53-60).

    ``lane_pad`` (auto: on with the Pallas kernels when W is not a
    multiple of the 128-lane tile and the caller isn't already padding):
    pre-pads W to the lane multiple and runs the padded program. The
    physical HBM footprint is identical (the minor dim is tile-padded
    either way), but tile-aligned *logical* shapes keep XLA's cross-pass
    transpose/fusion behavior on the fast path (Wood2's W=653 composed
    4-pass ran ~2× its isolated-pass sum; Cloth3's lane-aligned 626→640
    did not — BENCH_DETAIL.md). Bit-exact: pad scan steps are FLAG_PAD
    (carry pass-through), pad lanes are independent DP paths sliced off
    at the end, and the sticky-d2 boundary uses ``real_w``."""
    w = cost.shape[2]
    wp = -(-w // 128) * 128
    if lane_pad is None:
        # auto ON for the kernel path at misaligned W: measured on the
        # real chip (tools/scanline_probe.py --sections pad, quiet box,
        # loop-amortized 30 iters): Wood2 shape 555x128xW, W 653->768:
        # 15.21 -> 10.46 ms for the composed 4-pass stage (-31 %) —
        # tile-aligned logical shapes keep XLA's cross-pass transpose
        # fusion on the fast path, worth far more than the +17.6 %
        # FLAG_PAD grid steps the padding adds
        lane_pad = resolve_use_pallas(use_pallas)
    lane_pad = (
        lane_pad and wp != w and valid_w is None and valid_h is None
    )
    real_w = None
    if lane_pad and wp != w:
        cost = jnp.pad(cost, ((0, 0), (0, 0), (0, wp - w)))
        left = jnp.pad(left, ((0, 0), (0, wp - w), (0, 0)))
        right = jnp.pad(right, ((0, 0), (0, wp - w), (0, 0)))
        valid_w = jnp.arange(wp) < w
        real_w = w
    for axis, fwd in (("x", True), ("x", False), ("y", True), ("y", False)):
        cost = scanline_pass(
            cost, left, right, opts, axis, fwd, use_pallas,
            valid_s=valid_w if axis == "x" else valid_h,
            real_w=real_w,
        )
    if real_w is not None:
        cost = cost[:, :, :w]
    return cost
