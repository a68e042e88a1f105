"""Stage 5 — multi-step disparity refinement, TPU-native dense formulation.

The reference refiner (multistep_refiner.cpp:60-87) is list-driven and
mutates the disparity map while scanning it. Here every step is a dense
masked update over the whole map (SURVEY.md §3.3 / §7):

* Outlier detection is *exact*, including the raster-order effect of the
  reference's in-place invalidation on the occlusion/mismatch split: a
  pixel read at column col_rl observes the invalidated value iff
  col_rl < x and (y, col_rl) is itself an outlier — a condition that is
  dense-computable from the original map.
* Iterative region voting runs 5 iterations x (mismatch phase, occlusion
  phase) of simultaneous histogram voting over the cross support region
  (the horizontal-first aggregation operator applied to a disparity
  one-hot). Fills within a phase do not see each other — a documented
  deviation from the reference's list-ordered sequential fills, gated by
  the end-to-end bad-2.0 tolerance.
* Proper interpolation marches the 16 precomputed rays with a
  lax.scan of dynamic slices over a padded map; mismatch fills are
  written before the occlusion ray search runs, as in the reference.
* The final 3x3 median is computed out-of-place by default (the
  reference calls it with in == out, making its output depend on raster
  order — documented deviation, bad-2.0 gated); ``opts.exact_median``
  selects :func:`median_filter_3x3_inplace`, which reproduces the
  reference's raster-order recurrence BITWISE via a sheared-wavefront
  scan.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adcensus_tpu.config import ADCensusOptions, INVALID_FLOAT, LARGE_FLOAT
from adcensus_tpu.ops.basic import lround, shift2d


def outlier_detection(
    disp_left: jnp.ndarray,
    disp_right: jnp.ndarray,
    opts: ADCensusOptions,
    real_w: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LR consistency check (multistep_refiner.cpp:90-151), exact.

    Returns (new_disp_left, occlusion_mask, mismatch_mask). ``real_w``
    bounds the in-image column checks when the arrays are padded (sharded
    pipeline); defaults to the array width.
    """
    h, w = disp_left.shape
    rw = w if real_w is None else real_w
    x = jnp.arange(w)[None, :]
    orig_valid = jnp.isfinite(disp_left)
    d = disp_left

    # The epipolar lookups are per-pixel column gathers, but the gather
    # offsets are bounded by the disparity range — so each is a short
    # unrolled loop of static masked shifts (the TPU has no fast
    # lane-gather; this trades ~D cheap fused selects for it). Offsets
    # outside the loop ranges only occur at pixels whose gathered value
    # is provably never read (see the range notes below).
    def gather_by_offset(offs_map, lo, hi, fields, defaults):
        outs = [
            jnp.full_like(f, dflt) for f, dflt in zip(fields, defaults)
        ]
        for u in range(lo, hi + 1):
            m = offs_map == u
            outs = [
                jnp.where(m, shift2d(f, 0, u, dflt), o)
                for f, o, dflt in zip(fields, outs, defaults)
            ]
        return outs

    col_right = lround(x - jnp.where(orig_valid, d, 0.0))
    cr_in = (col_right >= 0) & (col_right < rw)
    # x - col_right = lround(d) in [min_disp-1, max_disp+1] wherever the
    # value matters (d_r feeds lr_fail, which needs orig_valid, and the
    # reprojection, which needs lr_fail)
    (d_r,) = gather_by_offset(
        x - col_right,
        opts.min_disparity - 1,
        opts.max_disparity + 1,
        (disp_right,),
        (INVALID_FLOAT,),
    )
    lr_fail = orig_valid & cr_in & (jnp.abs(d - d_r) > opts.lrcheck_thres)

    outlier = (~orig_valid) | (~cr_in) | lr_fail
    new_disp = jnp.where(outlier, INVALID_FLOAT, d)

    # classification of lr_fail pixels via reprojection; x - col_rl =
    # lround(d) - lround(d_r), both in [min-1, max+1], wherever read
    # (occlusion needs lr_fail & rl_in, so finite d and d_r)
    col_rl = lround(col_right + d_r)
    rl_in = (col_rl > 0) & (col_rl < rw)
    span = opts.max_disparity - opts.min_disparity + 2
    d_l_orig, rl_outlier, rl_valid = gather_by_offset(
        x - col_rl, -span, span,
        (d, outlier, orig_valid),
        (INVALID_FLOAT, False, False),
    )
    # the reference reads disp_left_ mid-scan: (y, col_rl) is already
    # invalidated iff col_rl < x and it is an outlier itself
    seen_invalid = (rl_outlier & (col_rl < x)) | ~rl_valid
    d_l_eff = jnp.where(seen_invalid, INVALID_FLOAT, d_l_orig)

    occlusion = lr_fail & rl_in & (d_l_eff > d)
    mismatch = outlier & ~occlusion
    return new_disp, occlusion, mismatch


def _region_histogram_stats(
    disp: jnp.ndarray,
    arms: jnp.ndarray,
    opts: ADCensusOptions,
    use_pallas: bool | None = None,
    masks=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For every pixel: disparity histogram over its cross support region
    (vertical arm of p crossed with each row anchor's horizontal arms —
    the horizontal-first region, multistep_refiner.cpp:183-197).

    Returns (best_disp_index, max_ht, count), each (H, W) int32.
    """
    from adcensus_tpu.config import MAX_ARM_LENGTH
    from adcensus_tpu.ops.region_vote_pallas import region_vote_stats

    di, valid = vote_indices(disp, opts)
    return region_vote_stats(
        di,
        valid,
        arms,
        opts.disp_range,
        min(opts.cross_L1, MAX_ARM_LENGTH),
        use_pallas=use_pallas,
        masks=masks,
    )


def vote_indices(
    disp: jnp.ndarray, opts: ADCensusOptions
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rounded 0-based disparity indices, validity mask) for voting
    (multistep_refiner.cpp:187-197 uses rounded disparities)."""
    valid = jnp.isfinite(disp)
    di = jnp.clip(
        lround(jnp.where(valid, disp, 0.0)) - opts.min_disparity,
        0,
        opts.disp_range - 1,
    ).astype(jnp.int32)
    return di, valid


def apply_vote_fill(
    disp: jnp.ndarray,
    target: jnp.ndarray,
    best: jnp.ndarray,
    max_ht: jnp.ndarray,
    count: jnp.ndarray,
    opts: ADCensusOptions,
) -> jnp.ndarray:
    """Fill ``target`` pixels whose region histogram passes the ts/th
    thresholds (multistep_refiner.cpp:199-214)."""
    ratio_ok = (
        max_ht.astype(jnp.float32) / count.astype(jnp.float32)
    ) > jnp.float32(opts.irv_th)
    fill = target & (max_ht > 0) & (count > opts.irv_ts) & ratio_ok
    return jnp.where(
        fill, (best + opts.min_disparity).astype(jnp.float32), disp
    )


def region_vote_phase(
    disp: jnp.ndarray,
    arms: jnp.ndarray,
    target: jnp.ndarray,
    opts: ADCensusOptions,
    use_pallas: bool | None = None,
    masks=None,
) -> jnp.ndarray:
    """One voting phase. The expensive histogram is skipped entirely
    (lax.cond) when no targets remain — by then every later phase is a
    no-op by definition."""

    def do_phase(disp):
        best, max_ht, count = _region_histogram_stats(
            disp, arms, opts, use_pallas, masks
        )
        return apply_vote_fill(disp, target, best, max_ht, count, opts)

    return jax.lax.cond(jnp.any(target), do_phase, lambda d: d, disp)


def iterative_region_voting(
    disp: jnp.ndarray,
    arms: jnp.ndarray,
    occlusion: jnp.ndarray,
    mismatch: jnp.ndarray,
    opts: ADCensusOptions,
    num_iters: int = 5,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """5 iterations x (mismatches, then occlusions) of dense histogram
    voting (multistep_refiner.cpp:153-227). Each phase short-circuits
    via region_vote_phase's no-targets-left lax.cond (an iteration-level
    converged-early gate was measured to cost more than it saves: the
    outlier set rarely empties within 5 iterations). The matmul backend's
    band matrices are built once and shared by all 10 phases."""
    from adcensus_tpu.config import MAX_ARM_LENGTH
    from adcensus_tpu.ops.basic import resolve_cross_backend
    from adcensus_tpu.ops.cross_matmul import vote_band_masks

    masks = (
        vote_band_masks(arms, min(opts.cross_L1, MAX_ARM_LENGTH))
        if resolve_cross_backend(use_pallas) == "matmul"
        else None
    )
    # (A histogram-unchanged convergence gate — once a full iteration
    # fills nothing, later phases are provably no-ops — was measured to
    # change Cone steady-state by <0.01 ms while inflating the TPU
    # compile; real maps keep filling through all 5 iterations. The
    # existing per-phase no-targets cond already covers the cheap case.)
    for _ in range(num_iters):
        for phase_mask in (mismatch, occlusion):
            target = phase_mask & ~jnp.isfinite(disp)
            disp = region_vote_phase(
                disp, arms, target, opts, use_pallas, masks
            )
    return disp


def ray_offset_table(max_search: int) -> np.ndarray:
    """Static (16, max_search-1, 2) table of (dy, dx) integer offsets for
    the 16 interpolation rays over [0, pi), double-precision trig +
    lround, matching multistep_refiner.cpp:253-269."""
    steps = max(max_search - 1, 1)
    table = np.zeros((16, steps, 2), dtype=np.int32)
    ang = 0.0
    for s in range(16):
        sina, cosa = math.sin(ang), math.cos(ang)
        for m in range(1, max_search):
            yy = math.floor(m * sina + 0.5) if m * sina >= 0 else math.ceil(m * sina - 0.5)
            xx = math.floor(m * cosa + 0.5) if m * cosa >= 0 else math.ceil(m * cosa - 0.5)
            table[s, m - 1] = (int(yy), int(xx))
        ang += 3.1415926 / 16
    return table


def _first_valid_along_rays(
    disp: jnp.ndarray,
    left: jnp.ndarray,
    offsets: jnp.ndarray,
    pad: int,
    row_offset: int = 0,
    out_rows: int | None = None,
    need_color: bool = True,
    target: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For each pixel of rows [row_offset, row_offset + out_rows) and each
    of the 16 rays, the first valid disparity along the ray and the color
    distance (sum of absolute channel diffs to the center pixel) at the
    hit (rays read the *full* map — the sharded pipeline passes an
    all-gathered map and computes only its own rows).

    The march is a ``while_loop`` that stops once every *target* pixel of
    every ray has found a hit (``target`` marks the pixels whose fills
    will be read; None = all) — on real maps that is a handful of steps,
    not the max_disparity worst case.

    Returns (found (16,R,W) bool, val (16,R,W) f32, dist (16,R,W) i32);
    found/val/dist are meaningful only at target pixels.
    """
    h, w = disp.shape
    r = h - row_offset if out_rows is None else out_rows
    seed_done = (
        jnp.zeros((r, w), bool) if target is None else ~target
    )
    n_steps = offsets.shape[1]
    # NaN beyond the border: a ray landing there has left the image and
    # terminates (multistep_refiner.cpp:255-260's bounds break); +inf
    # cells are in-image invalids the ray marches through
    disp_pad = jnp.pad(disp, pad, constant_values=np.nan)
    left_pad = jnp.pad(
        left.astype(jnp.int32), ((pad, pad), (pad, pad), (0, 0))
    )
    center = jax.lax.dynamic_slice(
        left_pad, (pad + row_offset, pad, 0), (r, w, 3)
    )

    def ray_march(ray_offsets):
        def cond(carry):
            i, done, _, _, _ = carry
            return (i < n_steps) & ~jnp.all(done)

        def body(carry):
            i, done, hit, val, dist = carry
            off = jax.lax.dynamic_slice_in_dim(ray_offsets, i, 1)[0]
            dy, dx = off[0], off[1]
            cand = jax.lax.dynamic_slice(
                disp_pad, (pad + row_offset + dy, pad + dx), (r, w)
            )
            cand_valid = jnp.isfinite(cand)
            take = cand_valid & ~done
            val = jnp.where(take, cand, val)
            if need_color:  # occlusion fills never read colors
                ccol = jax.lax.dynamic_slice(
                    left_pad, (pad + row_offset + dy, pad + dx, 0),
                    (r, w, 3),
                )
                dist = jnp.where(
                    take, jnp.sum(jnp.abs(ccol - center), axis=-1), dist
                )
            done = done | cand_valid | jnp.isnan(cand)
            return i + 1, done, hit | take, val, dist

        init = (
            jnp.int32(0),
            seed_done,
            jnp.zeros((r, w), bool),
            jnp.zeros((r, w), jnp.float32),
            jnp.zeros((r, w), jnp.int32),
        )
        _, _, hit, val, dist = jax.lax.while_loop(cond, body, init)
        return hit, val, dist

    return jax.vmap(ray_march)(offsets)


def proper_interpolation(
    disp: jnp.ndarray,
    left: jnp.ndarray,
    occlusion: jnp.ndarray,
    mismatch: jnp.ndarray,
    opts: ADCensusOptions,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Single-device wrapper: both phases over the full map.

    (Measured dead end, round 3: lax.cond-skipping each phase when it
    has no targets — the reference's own empty-list skip — changed Cone
    steady-state by <0.01 ms because real maps keep live targets in
    both phases, while the extra branch programs grew the TPU compile
    of the fused pipeline from ~80 s to ~290 s through the tunnel. The
    driver-critical single-device path therefore stays branch-free; the
    sharded tail keeps the conds, where compiles are local and a shard
    whose rows have no targets genuinely skips its march.)"""
    mism_target = mismatch & ~jnp.isfinite(disp)
    fill_m = interpolation_fills(disp, left, opts, True,
                                 use_pallas=use_pallas,
                                 target=mism_target)
    disp = jnp.where(mism_target, fill_m, disp)
    occl_target = occlusion & ~jnp.isfinite(disp)
    fill_o = interpolation_fills(disp, left, opts, False,
                                 use_pallas=use_pallas,
                                 target=occl_target)
    return jnp.where(occl_target, fill_o, disp)


def _chunk_target(target, r: int, w: int) -> jnp.ndarray:
    return jnp.ones((r, w), bool) if target is None else target


def interpolation_fills(
    disp: jnp.ndarray,
    left: jnp.ndarray,
    opts: ADCensusOptions,
    is_mismatch: bool,
    row_offset: int = 0,
    out_rows: int | None = None,
    use_pallas: bool | None = None,
    target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """16-ray interpolation fill values (multistep_refiner.cpp:229-305)
    for rows [row_offset, row_offset + out_rows) of ``disp``.

    Mismatches: disparity of the ray hit with the closest color (sum of
    absolute channel differences, first minimum in ray order). Occlusions:
    minimum collected disparity. No hit -> fill 0.0 (the reference's
    zero-initialized fill_disps). The caller writes mismatch fills before
    computing occlusion fills, matching the reference's phase order;
    within a phase the reference also computes all fills before writing
    (two-phase, multistep_refiner.cpp:244), so phases are exact up to map
    state at phase start.

    ``target``: (out_rows, W) bool marking the pixels whose fills will be
    read (the still-invalid outliers of this phase). The ray march only
    runs until every target has a hit; non-target outputs are arbitrary.
    """
    from adcensus_tpu.ops.basic import resolve_use_pallas
    from adcensus_tpu.ops.interp_pallas import (
        coord_buffer_dims,
        coord_interp_fits_vmem,
        pick_row_chunk,
        ray_interp_fits_vmem,
        ray_interp_select,
    )

    h, w = disp.shape
    r = h - row_offset if out_rows is None else out_rows
    max_search = max(abs(opts.max_disparity), abs(opts.min_disparity))
    offsets = jnp.asarray(ray_offset_table(max_search))
    pad = int(max_search) + 1
    kern = resolve_use_pallas(use_pallas)

    def run_chunked(select_rows, rc):
        """Drive the kernel in rc-row chunks (its carry state scales
        with rows; the resident maps are shared). The final chunk is
        shifted up to overlap instead of recompiling a remainder
        shape — overlapped rows compute identically."""
        if rc >= r:
            fa, fv = select_rows(row_offset, r)
            return jnp.where(fa, fv, 0.0)
        n_chunks = -(-r // rc)
        parts = []
        for k in range(n_chunks):
            ro = min(k * rc, r - rc)
            fa, fv = select_rows(row_offset + ro, rc)
            out_k = jnp.where(fa, fv, 0.0)
            lo = k * rc
            hi = min((k + 1) * rc, r)
            parts.append(out_k[lo - ro : hi - ro])
        return jnp.concatenate(parts, axis=0)

    if kern:
        rc_pad = pick_row_chunk(
            lambda rc: ray_interp_fits_vmem(h, w, pad, rc), r
        )
        if rc_pad is not None:
            # extra bottom rows / right columns: the kernel loads
            # (8, 128)-aligned blocks of aligned shape (Mosaic) and
            # rotates the residue away, so aligned loads must stay in
            # bounds. NaN = beyond-border terminal cells.
            from adcensus_tpu.ops.interp_pallas import padded_buffer_dims

            hb, wb = padded_buffer_dims(h, w, pad, rc_pad)
            er = hb - h - 2 * pad
            ec = wb - w - 2 * pad
            disp_pad = jnp.pad(
                disp, ((pad, pad + er), (pad, pad + ec)),
                constant_values=np.nan,
            )
            color_pad = jnp.pad(
                left.astype(jnp.uint8),
                ((pad, pad + er), (pad, pad + ec), (0, 0)),
            )

            def sel(ro, rr):
                return ray_interp_select(
                    disp_pad, color_pad, offsets, ro, rr, w, pad,
                    is_mismatch,
                    target=jax.lax.dynamic_slice_in_dim(
                        _chunk_target(target, r, w), ro - row_offset, rr
                    ),
                )

            return run_chunked(sel, rc_pad)

        rc_coord = pick_row_chunk(
            lambda rc: coord_interp_fits_vmem(h, w, rc), r
        )
        if rc_coord is not None:
            # high-disparity configs (Piano d=[0,256): pad 257 overflows
            # the padded-map budget): margin-only buffers + coordinate
            # masks keep the search in VMEM instead of the HBM slice path
            hb, wb = coord_buffer_dims(h, w, rc_coord)
            disp_nm = jnp.pad(
                disp, ((0, hb - h), (0, wb - w)),
                constant_values=np.nan,
            )
            color_nm = jnp.pad(
                left.astype(jnp.uint8),
                ((0, hb - h), (0, wb - w), (0, 0)),
            )

            def sel(ro, rr):
                return ray_interp_select(
                    disp_nm, color_nm, offsets, ro, rr, w, 0,
                    is_mismatch,
                    target=jax.lax.dynamic_slice_in_dim(
                        _chunk_target(target, r, w), ro - row_offset, rr
                    ),
                    bounds=(h, w),
                )

            return run_chunked(sel, rc_coord)

    found, val, dist = _first_valid_along_rays(
        disp, left, offsets, pad, row_offset, r,
        need_color=is_mismatch, target=target,
    )
    if is_mismatch:
        dist = jnp.where(found, dist, 10**9)
        ray = jnp.argmin(dist, axis=0)  # first minimum in ray order
        fill_val = jnp.take_along_axis(val, ray[None], axis=0)[0]
    else:
        vals = jnp.where(found, val, LARGE_FLOAT)
        fill_val = jnp.min(vals, axis=0)
    any_found = jnp.any(found, axis=0)
    return jnp.where(any_found, fill_val, 0.0)


def edge_detect(disp: jnp.ndarray, threshold: float = 5.0) -> jnp.ndarray:
    """Sobel edge mask (multistep_refiner.cpp:354-371); border rows/cols 0."""
    h, w = disp.shape
    d = disp

    def s(dy, dx):
        return shift2d(d, -dy, -dx, 0.0)

    gx = (
        -s(-1, -1) + s(-1, 1) - 2 * s(0, -1) + 2 * s(0, 1) - s(1, -1) + s(1, 1)
    )
    gy = (
        -s(-1, -1) - 2 * s(-1, 0) - s(-1, 1)
        + s(1, -1) + 2 * s(1, 0) + s(1, 1)
    )
    mask = (jnp.abs(gx) + jnp.abs(gy)) > threshold
    interior = jnp.zeros((h, w), bool).at[1 : h - 1, 1 : w - 1].set(True)
    return mask & interior


def depth_discontinuity_adjustment(
    disp: jnp.ndarray,
    cost: jnp.ndarray,
    opts: ADCensusOptions,
) -> jnp.ndarray:
    """Edge-pixel disparity adjustment (multistep_refiner.cpp:307-352),
    exact — including the reference's in-place x-propagation: the row
    scan reads the *updated* left neighbor, so an adjustment can chain
    rightward through consecutive edge pixels. That first-order
    recurrence is a ``lax.scan`` over columns carrying (updated left
    disparity, its cost at that disparity); all right-neighbor reads use
    original values (x+1 is unprocessed when x is written).

    The reference indexes the cost volume with lround(d) without
    subtracting min_disparity; out-of-range indices skip the pixel /
    candidate (as in the oracle — the reference itself would read out of
    bounds).
    """
    d_range, h, w = cost.shape
    edge = edge_detect(disp, 5.0)

    def rounded_idx(dmap):
        v = jnp.isfinite(dmap)
        di = lround(jnp.where(v, dmap, 0.0))
        ok = v & (di >= 0) & (di < d_range)
        return jnp.clip(di, 0, d_range - 1), ok

    def cost_at(dmap):
        """A[y,x] = cost[lround(dmap[y,x]), y, x] (clamped index)."""
        idx, _ = rounded_idx(dmap)
        return jnp.take_along_axis(cost, idx[None], axis=0)[0]

    own_cost = cost_at(disp)
    _, own_ok = rounded_idx(disp)
    rd = shift2d(disp, 0, -1, INVALID_FLOAT)   # original right neighbor
    rc = shift2d(own_cost, 0, -1, LARGE_FLOAT)
    _, r_ok = rounded_idx(rd)
    interior = (jnp.arange(w) >= 1) & (jnp.arange(w) <= w - 2)

    # per-column scan inputs, leading axis W
    xs = (
        disp.T, own_cost.T, own_ok.T, rd.T, rc.T, r_ok.T, edge.T,
        jnp.transpose(cost, (2, 0, 1)),  # (W, D, H) column cost slices
        interior,
    )

    def step(carry, x_in):
        prev_d, prev_c, prev_ok = carry
        d, c_own, ok_own, rd_, rc_, rok, e, colc, inter = x_in
        act = inter & e & ok_own
        new_d, c0 = d, c_own
        take_l = act & prev_ok & (prev_c < c0)
        new_d = jnp.where(take_l, prev_d, new_d)
        c0 = jnp.where(take_l, prev_c, c0)
        take_r = act & rok & (rc_ < c0)
        new_d = jnp.where(take_r, rd_, new_d)
        out_d = jnp.where(act, new_d, d)
        # carry: this column's final value + its cost at that disparity
        idx, ok = rounded_idx(out_d)
        nc = jnp.take_along_axis(colc, idx[None], axis=0)[0]
        return (out_d, nc, ok), out_d

    init = (
        jnp.full((h,), INVALID_FLOAT),
        jnp.full((h,), LARGE_FLOAT),
        jnp.zeros((h,), bool),
    )
    _, cols = jax.lax.scan(step, init, xs)
    return cols.T


def median_filter_3x3(
    disp: jnp.ndarray, in_image: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Out-of-place 3x3 median with border-clipped windows
    (adcensus_util.cpp:55-81). Out-of-image slots are +inf, which sorts
    last; the median index is (in-image window population) // 2 — note
    invalid (inf) disparities *inside* the image still count toward the
    population, exactly like the reference's clipped window.

    ``in_image``: optional (H, W) bool marking real pixels when the map is
    padded (sharded pipeline); defaults to the whole array.

    Deviation: the reference calls this with in == out so its reads mix
    filtered and unfiltered neighbors (raster-order dependent); the dense
    out-of-place result differs slightly and is gated by bad-2.0.
    """
    h, w = disp.shape
    if in_image is None:
        # unpadded map: the window population is a static function of
        # border distance — no mask shifts needed
        rows = 1 + (np.arange(h) > 0) + (np.arange(h) < h - 1)
        cols = 1 + (np.arange(w) > 0) + (np.arange(w) < w - 1)
        counts = jnp.asarray(
            (rows[:, None] * cols[None, :]).astype(np.int32)
        )
        masked = disp
    else:
        masked = jnp.where(in_image, disp, jnp.inf)
        counts = jnp.zeros((h, w), jnp.int32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                counts = counts + shift2d(
                    in_image.astype(jnp.int32), -dy, -dx, 0
                )
    stack = [
        shift2d(masked, -dy, -dx, jnp.inf)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    s = jnp.sort(jnp.stack(stack, axis=0), axis=0)
    idx = jnp.maximum(counts, 1) // 2
    # per-pixel plane select instead of a major-axis gather (the TPU has
    # no fast path for per-element gathers); idx only takes values 0..4
    out = s[0]
    for k in range(1, 5):
        out = jnp.where(idx == k, s[k], out)
    return out


def _shear(a: jnp.ndarray, t_cols: int, fill) -> jnp.ndarray:
    """S[y, t] = a[y, t - 2y] (fill outside) via pad + reshape — no
    gathers: pad rows to pitch P = t_cols + 2, flatten, reshape with
    pitch t_cols; flat index y*(P-2) + t = y*P + (t - 2y) lands on
    a_padded[y, t-2y], and t-2y < 0 wraps into the previous row's fill."""
    h, w = a.shape
    p = t_cols + 2
    ap = jnp.pad(a, ((0, 1), (0, p - w)), constant_values=fill)
    flat = ap.reshape(-1)
    return flat[: h * t_cols].reshape(h, t_cols)


def _unshear(s: jnp.ndarray, w: int, fill) -> jnp.ndarray:
    """Inverse of _shear: b[y, x] = s[y, x + 2y] (same pitch trick)."""
    h, t_cols = s.shape
    p = t_cols + 2
    flat = jnp.pad(s, ((0, 1), (0, 0)), constant_values=fill).reshape(-1)
    return flat[: h * p].reshape(h, p)[:h, :w]


def median_filter_3x3_inplace(
    disp: jnp.ndarray, in_image: jnp.ndarray | None = None
) -> jnp.ndarray:
    """The reference's EXACT in-place 3x3 median (adcensus_util.cpp:55-81
    called with in == out at multistep_refiner.cpp:86): pixel (y, x)
    reads already-filtered values at (y-1, x-1..x+1) and (y, x-1) and
    original values elsewhere, in raster order.

    The raster recurrence is a wavefront: under the shear t = x + 2y,
    every filtered dependency lives in sheared columns t-1..t-3, so a
    ``lax.scan`` over sheared columns computes a whole (H,) column per
    step — W + 2H steps total, each a 9-element sorting network on (H,)
    vectors. Sheared out-of-range cells are +inf, which is exactly the
    out-of-window sort sentinel; window populations are counted
    separately (static border distances, or the ``in_image`` mask for
    padded sharded maps), so in-image +inf disparities still count,
    like the reference's clipped window.

    Measured cost (TPU v5e): ~4 ms at 450x375, ~5.3 ms at 707x481 —
    scan-step overhead bound (W + 2H steps of tiny (H,) work) vs
    ~1.2 ms for the dense out-of-place median; hence an opt-in
    (opts.exact_median) rather than the default.
    """
    h, w = disp.shape
    if in_image is None:
        rows = 1 + (np.arange(h) > 0) + (np.arange(h) < h - 1)
        cols = 1 + (np.arange(w) > 0) + (np.arange(w) < w - 1)
        counts = jnp.asarray(
            (rows[:, None] * cols[None, :]).astype(np.int32)
        )
        masked = disp
        active = jnp.ones((h, w), bool)
    else:
        counts = jnp.zeros((h, w), jnp.int32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                counts = counts + shift2d(
                    in_image.astype(jnp.int32), -dy, -dx, 0
                )
        masked = jnp.where(in_image, disp, jnp.inf)
        active = in_image

    t_cols = w + 2 * h  # covers x + 2y for all pixels
    inf = jnp.float32(jnp.inf)
    s_orig = _shear(masked, t_cols, inf)               # orig (y, x)
    s_cnt = _shear(counts, t_cols, 0)
    s_act = _shear(active, t_cols, False)

    def down(col):  # col[y] -> col[y-1] (row above), +inf at y=0
        return jnp.concatenate([jnp.full((1,), inf), col[:-1]])

    def down_s(s):  # S[y+1, :] view (row below), +inf at y=h-1
        return jnp.concatenate(
            [s[1:], jnp.full((1, s.shape[1]), inf)], axis=0
        )

    def col_at(s, off):  # S[:, t + off] as scan xs, +inf past the end
        return jnp.pad(
            s[:, off:], ((0, 0), (0, off)), constant_values=inf
        )

    xs = (
        s_orig.T,                    # (y, x)    original
        col_at(s_orig, 1).T,         # (y, x+1)  original
        col_at(down_s(s_orig), 1).T,  # (y+1, x-1) original
        col_at(down_s(s_orig), 2).T,  # (y+1, x)   original
        col_at(down_s(s_orig), 3).T,  # (y+1, x+1) original
        s_cnt.T.astype(jnp.int32),
        s_act.T,
    )

    def step(carry, x_in):
        c1, c2, c3 = carry  # filtered sheared columns t-1, t-2, t-3
        ov_c, ov_r, od_l, od_c, od_r, cnt, act = x_in
        nine = jnp.stack(
            [
                c1,          # (y, x-1)   filtered
                down(c1),    # (y-1, x+1) filtered
                down(c2),    # (y-1, x)   filtered
                down(c3),    # (y-1, x-1) filtered
                ov_c, ov_r, od_l, od_c, od_r,
            ],
            axis=0,
        )
        srt = jnp.sort(nine, axis=0)
        idx = jnp.maximum(cnt, 1) // 2
        med = srt[0]
        for k in range(1, 5):
            med = jnp.where(idx == k, srt[k], med)
        col = jnp.where(act, med, inf)
        return (col, c1, c2), col

    init = (jnp.full((h,), inf),) * 3
    _, cols = jax.lax.scan(step, init, xs)
    out = _unshear(cols.T, w, inf)
    # pixels outside in_image keep their input value (like the dense
    # median's masking); callers overwrite them anyway
    return jnp.where(active, out, disp)


def multistep_refine(
    disp_left: jnp.ndarray,
    disp_right: jnp.ndarray,
    left: jnp.ndarray,
    cost: jnp.ndarray,
    arms: jnp.ndarray,
    opts: ADCensusOptions,
    use_pallas: bool | None = None,
) -> Dict[str, jnp.ndarray]:
    """Full refinement chain (multistep_refiner.cpp:60-87)."""
    out: Dict[str, jnp.ndarray] = {}
    disp = disp_left
    occl = jnp.zeros_like(disp, dtype=bool)
    mism = jnp.zeros_like(disp, dtype=bool)
    if opts.do_lr_check:
        disp, occl, mism = outlier_detection(disp, disp_right, opts)
        out["after_lr_check"] = disp
    if opts.do_filling:
        disp = iterative_region_voting(
            disp, arms, occl, mism, opts, use_pallas=use_pallas
        )
        out["after_voting"] = disp
        disp = proper_interpolation(
            disp, left, occl, mism, opts, use_pallas=use_pallas
        )
        out["after_interpolation"] = disp
    if opts.do_discontinuity_adjustment:
        disp = depth_discontinuity_adjustment(disp, cost, opts)
        out["after_discontinuity"] = disp
    if opts.exact_median:
        disp = median_filter_3x3_inplace(disp)
    else:
        disp = median_filter_3x3(disp)
    out["final"] = disp
    return out
