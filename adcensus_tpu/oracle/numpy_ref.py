"""Exact sequential NumPy oracle for the AD-Census pipeline.

This module is a clean-room, loop-for-loop faithful re-statement of the
reference algorithm's *numerical semantics* (see SURVEY.md §2 for the
component inventory with file:line citations into /root/reference). It is
deliberately written with plain Python loops so that every
order-of-evaluation subtlety of the sequential reference is reproduced
bit-exactly:

* census borders left zero (adcensus_util.cpp:10-39)
* sticky d2 across the disparity loop in scanline optimization
  (scanline_optimizer.cpp:116-126: ``d2`` keeps its previous value when the
  right-image column ``xr`` falls outside ``(0, width-1)``)
* in-place left-disparity invalidation during the LR check, which makes the
  occlusion/mismatch classification depend on raster order
  (multistep_refiner.cpp:104-150)
* list-ordered fills in iterative region voting (multistep_refiner.cpp:169-225)
* the in-place 3x3 median whose reads mix filtered and unfiltered neighbors
  (multistep_refiner.cpp:86 calls MedianFilter with in == out)

It is used only for golden tests on small crops — it is far too slow for
full images. The TPU engine in ``adcensus_tpu.stages`` is validated against
it stage by stage.
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from adcensus_tpu.config import (
    ADCensusOptions,
    INVALID_FLOAT,
    LARGE_FLOAT,
    MAX_ARM_LENGTH,
)


def lround(v: float) -> int:
    """C lround: round half away from zero."""
    if v >= 0:
        return int(math.floor(v + 0.5))
    return int(math.ceil(v - 0.5))


def color_dist(c1: np.ndarray, c2: np.ndarray) -> int:
    """Max over channels of absolute difference (cross_aggregator.h:78-80)."""
    return int(np.max(np.abs(c1.astype(np.int32) - c2.astype(np.int32))))


def compute_gray(img: np.ndarray) -> np.ndarray:
    """RGB (H,W,3) uint8 -> gray uint8 via r*0.299+g*0.587+b*0.114 truncation.

    (cost_computor.cpp:58-73; the reference reads BGR bytes but applies the
    weights to the named R/G/B channels, so an RGB array is equivalent.)
    """
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    return (r * 0.299 + g * 0.587 + b * 0.114).astype(np.uint8)


def census_transform_9x7(gray: np.ndarray) -> np.ndarray:
    """63-bit census signature per pixel (adcensus_util.cpp:10-39).

    Border pixels (rows <4 / >=h-4, cols <3 / >=w-3) are left 0. Bit order:
    row offset -4..4 outer, col offset -3..3 inner, MSB first.
    """
    h, w = gray.shape
    census = np.zeros((h, w), dtype=np.uint64)
    if w <= 9 or h <= 7:
        return census
    for i in range(4, h - 4):
        for j in range(3, w - 3):
            center = gray[i, j]
            val = np.uint64(0)
            for r in range(-4, 5):
                for c in range(-3, 4):
                    val = np.uint64(val << np.uint64(1))
                    if gray[i + r, j + c] < center:
                        val = np.uint64(val + np.uint64(1))
            census[i, j] = val
    return census


def hamming64(x: int, y: int) -> int:
    return bin(int(x) ^ int(y)).count("1")


def compute_cost(
    left: np.ndarray,
    right: np.ndarray,
    census_l: np.ndarray,
    census_r: np.ndarray,
    opts: ADCensusOptions,
) -> np.ndarray:
    """Initial AD-Census cost volume, layout (H, W, D) like the reference's
    d-innermost layout (cost_computor.cpp:82-121)."""
    h, w, _ = left.shape
    d_range = opts.disp_range
    cost = np.zeros((h, w, d_range), dtype=np.float32)
    for y in range(h):
        for x in range(w):
            cl = left[y, x].astype(np.int32)
            for d in range(opts.min_disparity, opts.max_disparity):
                xr = x - d
                di = d - opts.min_disparity
                if xr < 0 or xr >= w:
                    cost[y, x, di] = 1.0
                    continue
                cr = right[y, xr].astype(np.int32)
                cost_ad = float(np.sum(np.abs(cl - cr))) / 3.0
                cost_census = float(
                    hamming64(census_l[y, x], census_r[y, xr])
                )
                # Evaluated in double then narrowed, matching C++ exp(double)
                # (cost_computor.cpp:117).
                cost[y, x, di] = np.float32(
                    1 - math.exp(-cost_ad / opts.lambda_ad)
                    + 1 - math.exp(-cost_census / opts.lambda_census)
                )
    return cost


def _grow_arm(
    img: np.ndarray,
    y: int,
    x: int,
    dy: int,
    dx: int,
    opts: ADCensusOptions,
) -> int:
    """Length of one arm in direction (dy,dx) (cross_aggregator.cpp:135-269).

    Break conditions in order: image boundary; color-dist to anchor >= t1;
    (n>0) color-dist to previous >= t1; (n+1 > L2) color-dist to anchor >= t2.
    """
    h, w, _ = img.shape
    color0 = img[y, x]
    color_last = color0
    yn, xn = y + dy, x + dx
    length = 0
    for n in range(min(opts.cross_L1, MAX_ARM_LENGTH)):
        if yn < 0 or yn >= h or xn < 0 or xn >= w:
            break
        color = img[yn, xn]
        dist1 = color_dist(color, color0)
        if dist1 >= opts.cross_t1:
            break
        if n > 0 and color_dist(color, color_last) >= opts.cross_t1:
            break
        if n + 1 > opts.cross_L2 and dist1 >= opts.cross_t2:
            break
        length += 1
        color_last = color
        yn += dy
        xn += dx
    return length


def build_arms(left: np.ndarray, opts: ADCensusOptions) -> np.ndarray:
    """Per-pixel cross arms on the left image, (H, W, 4) uint8 ordered
    [left, right, top, bottom] (cross_aggregator.cpp:76-86)."""
    h, w, _ = left.shape
    arms = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arms[y, x, 0] = _grow_arm(left, y, x, 0, -1, opts)
            arms[y, x, 1] = _grow_arm(left, y, x, 0, 1, opts)
            arms[y, x, 2] = _grow_arm(left, y, x, -1, 0, opts)
            arms[y, x, 3] = _grow_arm(left, y, x, 1, 0, opts)
    return arms


def compute_support_counts(arms: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Support-region pixel counts for both aggregation orders
    (cross_aggregator.cpp:271-325). Returns (horizontal_first, vertical_first).
    """
    h, w, _ = arms.shape
    al = arms[:, :, 0].astype(np.int32)
    ar = arms[:, :, 1].astype(np.int32)
    at = arms[:, :, 2].astype(np.int32)
    ab = arms[:, :, 3].astype(np.int32)
    counts = []
    for horizontal_first in (True, False):
        tmp = np.zeros((h, w), dtype=np.int32)
        out = np.zeros((h, w), dtype=np.int32)
        for y in range(h):
            for x in range(w):
                if horizontal_first:
                    tmp[y, x] = al[y, x] + ar[y, x] + 1
                else:
                    tmp[y, x] = at[y, x] + ab[y, x] + 1
        for y in range(h):
            for x in range(w):
                c = 0
                if horizontal_first:
                    for t in range(-at[y, x], ab[y, x] + 1):
                        c += tmp[y + t, x]
                else:
                    for t in range(-al[y, x], ar[y, x] + 1):
                        c += tmp[y, x + t]
                out[y, x] = c
        counts.append(out)
    return counts[0], counts[1]


def aggregate(
    cost_init: np.ndarray,
    arms: np.ndarray,
    opts: ADCensusOptions,
    num_iters: int = 4,
) -> np.ndarray:
    """Cross-based aggregation, ``num_iters`` iterations alternating
    horizontal-first / vertical-first, re-aggregating its own output
    (cross_aggregator.cpp:89-118, 327-394). Volume layout (H, W, D)."""
    h, w, d_range = cost_init.shape
    al = arms[:, :, 0].astype(np.int32)
    ar = arms[:, :, 1].astype(np.int32)
    at = arms[:, :, 2].astype(np.int32)
    ab = arms[:, :, 3].astype(np.int32)
    sup_h, sup_v = compute_support_counts(arms)
    cost_aggr = cost_init.copy()
    horizontal_first = True
    for _ in range(num_iters):
        sup = sup_h if horizontal_first else sup_v
        for di in range(d_range):
            tmp0 = cost_aggr[:, :, di].copy()
            tmp1 = np.zeros((h, w), dtype=np.float32)
            # pass 1
            for y in range(h):
                for x in range(w):
                    s = np.float32(0.0)
                    if horizontal_first:
                        for t in range(-al[y, x], ar[y, x] + 1):
                            s += tmp0[y, x + t]
                    else:
                        for t in range(-at[y, x], ab[y, x] + 1):
                            s += tmp0[y + t, x]
                    tmp1[y, x] = s
            # pass 2
            for y in range(h):
                for x in range(w):
                    s = np.float32(0.0)
                    if horizontal_first:
                        for t in range(-at[y, x], ab[y, x] + 1):
                            s += tmp1[y + t, x]
                    else:
                        for t in range(-al[y, x], ar[y, x] + 1):
                            s += tmp1[y, x + t]
                    cost_aggr[y, x, di] = s / np.float32(sup[y, x])
        horizontal_first = not horizontal_first
    return cost_aggr


def _scanline_pass(
    src: np.ndarray,
    left: np.ndarray,
    right: np.ndarray,
    opts: ADCensusOptions,
    axis: str,
    is_forward: bool,
) -> np.ndarray:
    """One directional scanline pass (scanline_optimizer.cpp:63-279).

    ``axis`` is 'x' for left/right passes, 'y' for up/down. Returns the new
    volume (H, W, D). The recurrence is
    Lr(p,d) = (C(p,d) + min(Lr(p-r,d), Lr(p-r,d±1)+P1, min Lr(p-r) + P2)) / 2
    with the path seed copied unchanged and virtual d=-1/D costs Large_Float.
    P1/P2 are color-adaptive with a *sticky* d2: when the right-image column
    xr = x - d - min_disp falls outside (0, w-1), d2 keeps the value from the
    previous d iteration (initially d1).
    """
    h, w, d_range = src.shape
    dst = np.zeros_like(src)
    p1, p2, tso = np.float32(opts.so_p1), np.float32(opts.so_p2), opts.so_tso
    direction = 1 if is_forward else -1

    if axis == "x":
        paths = [("row", y) for y in range(h)]
        n_steps = w
    else:
        paths = [("col", x) for x in range(w)]
        n_steps = h

    for _, fixed in paths:
        if axis == "x":
            y = fixed
            x = 0 if is_forward else w - 1
        else:
            x = fixed
            y = 0 if is_forward else h - 1

        cost_last = np.full(d_range + 2, LARGE_FLOAT, dtype=np.float32)
        dst[y, x, :] = src[y, x, :]
        cost_last[1 : d_range + 1] = dst[y, x, :]
        mincost_last = np.float32(cost_last.min())
        color_last = left[y, x]
        if axis == "x":
            x += direction
        else:
            y += direction

        for _ in range(n_steps - 1):
            color = left[y, x]
            d1 = color_dist(color, color_last)
            d2 = d1
            min_cost = LARGE_FLOAT
            new_row = np.zeros(d_range, dtype=np.float32)
            for d in range(d_range):
                xr = x - d - opts.min_disparity
                if 0 < xr < w - 1:
                    if axis == "x":
                        cr = right[y, xr]
                        cr_last = right[y, xr - direction]
                    else:
                        cr = right[y, xr]
                        cr_last = right[y - direction, xr]
                    d2 = color_dist(cr, cr_last)
                if d1 < tso and d2 < tso:
                    P1, P2 = p1, p2
                elif d1 >= tso and d2 >= tso:
                    P1, P2 = p1 / 10, p2 / 10
                else:
                    P1, P2 = p1 / 4, p2 / 4
                c = src[y, x, d]
                l1 = cost_last[d + 1]
                l2 = cost_last[d] + P1
                l3 = cost_last[d + 2] + P1
                l4 = mincost_last + P2
                cost_s = np.float32(
                    (c + min(min(l1, l2), min(l3, l4))) / np.float32(2.0)
                )
                new_row[d] = cost_s
                min_cost = min(min_cost, cost_s)
            dst[y, x, :] = new_row
            mincost_last = np.float32(min_cost)
            cost_last[1 : d_range + 1] = new_row
            color_last = color
            if axis == "x":
                x += direction
            else:
                y += direction
    return dst


def scanline_optimize(
    cost_aggr: np.ndarray,
    left: np.ndarray,
    right: np.ndarray,
    opts: ADCensusOptions,
) -> np.ndarray:
    """Four sequential directional passes, each consuming the previous pass's
    output (scanline_optimizer.cpp:40-61 ping-pongs two buffers; the data
    dependency is simply sequential composition)."""
    v = _scanline_pass(cost_aggr, left, right, opts, "x", True)
    v = _scanline_pass(v, left, right, opts, "x", False)
    v = _scanline_pass(v, left, right, opts, "y", True)
    v = _scanline_pass(v, left, right, opts, "y", False)
    return v


def wta_left(cost: np.ndarray, opts: ADCensusOptions) -> np.ndarray:
    """WTA + parabola subpixel for the left view (ADCensusStereo.cpp:188-243).

    Border winners (d == min or max-1) are Invalid_Float; zero curvature
    falls back to the integer disparity. First minimum wins ties.
    """
    h, w, d_range = cost.shape
    disp = np.zeros((h, w), dtype=np.float32)
    for y in range(h):
        for x in range(w):
            c = cost[y, x]
            best = int(np.argmin(c))  # first-minimum tie-break
            min_cost = c[best]
            best_d = best + opts.min_disparity
            if best_d == opts.min_disparity or best_d == opts.max_disparity - 1:
                disp[y, x] = INVALID_FLOAT
                continue
            c1, c2 = c[best - 1], c[best + 1]
            denom = np.float32(c1 + c2 - 2 * min_cost)
            if denom != 0.0:
                disp[y, x] = np.float32(
                    best_d + (c1 - c2) / (denom * np.float32(2.0))
                )
            else:
                disp[y, x] = np.float32(best_d)
    return disp


def wta_right(cost: np.ndarray, opts: ADCensusOptions) -> np.ndarray:
    """WTA for the right view from the left volume via
    cost_r(x,y,d) = cost_l(x+d,y,d) (ADCensusStereo.cpp:245-310).

    Out-of-range disparities see Large_Float; border winners keep their
    integer disparity (valid!) — asymmetric with the left view.
    """
    h, w, d_range = cost.shape
    disp = np.zeros((h, w), dtype=np.float32)
    for y in range(h):
        for x in range(w):
            cost_local = np.full(d_range, LARGE_FLOAT, dtype=np.float32)
            min_cost = LARGE_FLOAT
            best_d = 0
            for d in range(opts.min_disparity, opts.max_disparity):
                di = d - opts.min_disparity
                col_left = x + d
                if 0 <= col_left < w:
                    cost_local[di] = cost[y, col_left, di]
                    if min_cost > cost_local[di]:
                        min_cost = cost_local[di]
                        best_d = d
            if best_d == opts.min_disparity or best_d == opts.max_disparity - 1:
                disp[y, x] = np.float32(best_d)
                continue
            i1 = best_d - 1 - opts.min_disparity
            i2 = best_d + 1 - opts.min_disparity
            c1, c2 = cost_local[i1], cost_local[i2]
            denom = np.float32(c1 + c2 - 2 * min_cost)
            if denom != 0.0:
                disp[y, x] = np.float32(
                    best_d + (c1 - c2) / (denom * np.float32(2.0))
                )
            else:
                disp[y, x] = np.float32(best_d)
    return disp


def outlier_detection(
    disp_left: np.ndarray,
    disp_right: np.ndarray,
    opts: ADCensusOptions,
) -> Tuple[np.ndarray, List[Tuple[int, int]], List[Tuple[int, int]]]:
    """LR consistency check (multistep_refiner.cpp:90-151). Mutates a copy of
    disp_left in raster order (matching the reference's in-place
    invalidation, which the occlusion/mismatch classification observes).
    Returns (new_disp_left, occlusions, mismatches) with (x, y) coordinates.
    """
    h, w = disp_left.shape
    disp = disp_left.copy()
    occlusions: List[Tuple[int, int]] = []
    mismatches: List[Tuple[int, int]] = []
    thr = opts.lrcheck_thres
    for y in range(h):
        for x in range(w):
            d = disp[y, x]
            if d == INVALID_FLOAT:
                mismatches.append((x, y))
                continue
            col_right = lround(x - d)
            if 0 <= col_right < w:
                d_r = disp_right[y, col_right]
                if abs(d - d_r) > thr:
                    col_rl = lround(col_right + d_r)
                    if 0 < col_rl < w:
                        d_l = disp[y, col_rl]  # may be already invalidated
                        if d_l > d:
                            occlusions.append((x, y))
                        else:
                            mismatches.append((x, y))
                    else:
                        mismatches.append((x, y))
                    disp[y, x] = INVALID_FLOAT
            else:
                disp[y, x] = INVALID_FLOAT
                mismatches.append((x, y))
    return disp, occlusions, mismatches


def iterative_region_voting(
    disp: np.ndarray,
    arms: np.ndarray,
    occlusions: List[Tuple[int, int]],
    mismatches: List[Tuple[int, int]],
    opts: ADCensusOptions,
) -> np.ndarray:
    """5 iterations of histogram voting over the cross support region
    (multistep_refiner.cpp:153-227). Mutates disp in list order; mismatches
    processed before occlusions; filled pixels pruned between passes.
    The support region is p's vertical arm crossed with each row anchor's
    horizontal arms (i.e. the horizontal-first aggregation region).
    """
    h, w = disp.shape
    disp = disp.copy()
    d_range = opts.disp_range
    occl = list(occlusions)
    mism = list(mismatches)
    for _ in range(5):
        for k in range(2):
            trg = mism if k == 0 else occl
            for (x, y) in trg:
                if disp[y, x] != INVALID_FLOAT:
                    continue
                hist = np.zeros(d_range, dtype=np.int64)
                at = int(arms[y, x, 2])
                ab = int(arms[y, x, 3])
                for t in range(-at, ab + 1):
                    yt = y + t
                    al2 = int(arms[yt, x, 0])
                    ar2 = int(arms[yt, x, 1])
                    for s in range(-al2, ar2 + 1):
                        dv = disp[yt, x + s]
                        if dv != INVALID_FLOAT:
                            hist[lround(dv) - opts.min_disparity] += 1
                best_d, count, max_ht = 0, 0, 0
                for d in range(d_range):
                    if max_ht < hist[d]:
                        max_ht = int(hist[d])
                        best_d = d
                    count += int(hist[d])
                if max_ht > 0:
                    if count > opts.irv_ts and max_ht / count > opts.irv_th:
                        disp[y, x] = np.float32(best_d + opts.min_disparity)
            trg[:] = [
                (x, y) for (x, y) in trg if disp[y, x] == INVALID_FLOAT
            ]
    occlusions[:] = occl
    mismatches[:] = mism
    return disp


# 16 ray directions over [0, pi) with the reference's double-precision
# trig (multistep_refiner.cpp:253-269).
_RAY_ANGLES = [k * (3.1415926 / 16) for k in range(16)]


def proper_interpolation(
    disp: np.ndarray,
    left: np.ndarray,
    occlusions: List[Tuple[int, int]],
    mismatches: List[Tuple[int, int]],
    opts: ADCensusOptions,
) -> np.ndarray:
    """16-ray interpolation fill (multistep_refiner.cpp:229-305).

    Mismatches filled with the disparity of the ray hit whose color is
    closest (sum of absolute channel differences, first minimum wins);
    occlusions with the minimum collected disparity. Pixels whose rays find
    nothing are filled with 0.0 (the reference's zero-initialized
    fill_disps). Mismatches are written before occlusions are computed.
    """
    h, w = disp.shape
    disp = disp.copy()
    max_search = max(abs(opts.max_disparity), abs(opts.min_disparity))
    for k in range(2):
        trg = mismatches if k == 0 else occlusions
        if not trg:
            continue
        fills = np.zeros(len(trg), dtype=np.float32)
        for n, (x, y) in enumerate(trg):
            collects = []  # (yy, xx, disparity)
            ang = 0.0
            for s in range(16):
                sina, cosa = math.sin(ang), math.cos(ang)
                for m in range(1, max_search):
                    yy = lround(y + m * sina)
                    xx = lround(x + m * cosa)
                    if yy < 0 or yy >= h or xx < 0 or xx >= w:
                        break
                    dv = disp[yy, xx]
                    if dv != INVALID_FLOAT:
                        collects.append((yy, xx, dv))
                        break
                ang += 3.1415926 / 16
            if not collects:
                continue
            if k == 0:
                min_dist = 9999
                dbest = np.float32(0.0)
                c0 = left[y, x].astype(np.int32)
                for (yy, xx, dv) in collects:
                    c2 = left[yy, xx].astype(np.int32)
                    dist = int(np.sum(np.abs(c0 - c2)))
                    if min_dist > dist:
                        min_dist = dist
                        dbest = dv
                fills[n] = dbest
            else:
                fills[n] = np.float32(min(dv for (_, _, dv) in collects))
        for n, (x, y) in enumerate(trg):
            disp[y, x] = fills[n]
    return disp


def edge_detect(disp: np.ndarray, threshold: float = 5.0) -> np.ndarray:
    """Sobel edge mask on the disparity map (multistep_refiner.cpp:354-371)."""
    h, w = disp.shape
    mask = np.zeros((h, w), dtype=np.uint8)
    d = disp
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            gx = (
                -d[y - 1, x - 1] + d[y - 1, x + 1]
                - 2 * d[y, x - 1] + 2 * d[y, x + 1]
                - d[y + 1, x - 1] + d[y + 1, x + 1]
            )
            gy = (
                -d[y - 1, x - 1] - 2 * d[y - 1, x] - d[y - 1, x + 1]
                + d[y + 1, x - 1] + 2 * d[y + 1, x] + d[y + 1, x + 1]
            )
            if abs(gx) + abs(gy) > threshold:
                mask[y, x] = 1
    return mask


def depth_discontinuity_adjustment(
    disp: np.ndarray,
    cost: np.ndarray,
    opts: ADCensusOptions,
) -> np.ndarray:
    """Edge-pixel disparity adjustment (multistep_refiner.cpp:307-352).

    In-place along x: the updated value at x is visible when processing x+1.
    Note the reference indexes the cost volume with lround(d) directly
    (without subtracting min_disparity), so this matches its behavior only
    for min_disparity == 0 — replicated faithfully, clamped for safety.
    """
    h, w = disp.shape
    d_range = opts.disp_range
    disp = disp.copy()
    mask = edge_detect(disp, 5.0)
    for y in range(h):
        for x in range(1, w - 1):
            if mask[y, x] != 1:
                continue
            d = disp[y, x]
            if d == INVALID_FLOAT:
                continue
            di = lround(d)
            if not (0 <= di < d_range):
                continue
            c0 = cost[y, x, di]
            for k in range(2):
                x2 = x - 1 if k == 0 else x + 1
                d2 = disp[y, x2]
                if d2 == INVALID_FLOAT:
                    continue
                d2i = lround(d2)
                if not (0 <= d2i < d_range):
                    continue
                c = cost[y, x2, d2i]
                if c < c0:
                    disp[y, x] = d2
                    c0 = c
                    d = d2
    return disp


def median_filter_inplace(disp: np.ndarray, wnd: int = 3) -> np.ndarray:
    """3x3 median with in==out raster-order semantics (adcensus_util.cpp:55-81
    called at multistep_refiner.cpp:86 with the same buffer for in and out:
    already-filtered above/left neighbors are re-read)."""
    h, w = disp.shape
    out = disp.copy()
    radius = wnd // 2
    for y in range(h):
        for x in range(w):
            vals = []
            for r in range(-radius, radius + 1):
                for c in range(-radius, radius + 1):
                    yy, xx = y + r, x + c
                    if 0 <= yy < h and 0 <= xx < w:
                        vals.append(out[yy, xx])
            vals.sort()
            out[y, x] = vals[len(vals) // 2]
    return out


def multistep_refine(
    disp_left: np.ndarray,
    disp_right: np.ndarray,
    left: np.ndarray,
    cost: np.ndarray,
    arms: np.ndarray,
    opts: ADCensusOptions,
) -> Dict[str, np.ndarray]:
    """Full refinement chain (multistep_refiner.cpp:60-87). Returns all
    intermediates for stage-wise golden tests."""
    out: Dict[str, np.ndarray] = {}
    disp = disp_left.copy()
    occl: List[Tuple[int, int]] = []
    mism: List[Tuple[int, int]] = []
    if opts.do_lr_check:
        disp, occl, mism = outlier_detection(disp, disp_right, opts)
        out["after_lr_check"] = disp.copy()
    if opts.do_filling:
        disp = iterative_region_voting(disp, arms, occl, mism, opts)
        out["after_voting"] = disp.copy()
        disp = proper_interpolation(disp, left, occl, mism, opts)
        out["after_interpolation"] = disp.copy()
    if opts.do_discontinuity_adjustment:
        disp = depth_discontinuity_adjustment(disp, cost, opts)
        out["after_discontinuity"] = disp.copy()
    disp = median_filter_inplace(disp, 3)
    out["final"] = disp
    return out


def match(
    left: np.ndarray,
    right: np.ndarray,
    opts: ADCensusOptions,
) -> Dict[str, np.ndarray]:
    """Run the full oracle pipeline; returns every intermediate
    (pipeline order: ADCensusStereo.cpp:69-132)."""
    opts.validate()
    res: Dict[str, np.ndarray] = {}
    res["gray_left"] = compute_gray(left)
    res["gray_right"] = compute_gray(right)
    res["census_left"] = census_transform_9x7(res["gray_left"])
    res["census_right"] = census_transform_9x7(res["gray_right"])
    res["cost_init"] = compute_cost(
        left, right, res["census_left"], res["census_right"], opts
    )
    res["arms"] = build_arms(left, opts)
    sup_h, sup_v = compute_support_counts(res["arms"])
    res["sup_count_h"] = sup_h
    res["sup_count_v"] = sup_v
    res["cost_aggr"] = aggregate(res["cost_init"], res["arms"], opts)
    res["cost_scan"] = scanline_optimize(res["cost_aggr"], left, right, opts)
    res["disp_left_raw"] = wta_left(res["cost_scan"], opts)
    res["disp_right_raw"] = wta_right(res["cost_scan"], opts)
    refined = multistep_refine(
        res["disp_left_raw"],
        res["disp_right_raw"],
        left,
        res["cost_scan"],
        res["arms"],
        opts,
    )
    res.update(refined)
    res["disparity"] = refined["final"]
    return res
