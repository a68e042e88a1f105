"""Multi-chip sharded AD-Census pipeline (net-new vs the single-thread
reference — SURVEY.md §2 "Parallelism & communication components").

Strategy (SURVEY.md §7): shard the *cost volume* over image rows on the
``tile`` mesh axis and batch pairs over ``data``. Image-level arrays
(census, arms, support counts, path color-distances) are tiny (a few MB)
and computed *cooperatively* — each shard builds only its own row/column
slab and small tiled ``all_gather``s rebuild the full copies the
consumers need — so image-level compute scales with 1/n and only
volume-sized traffic plus a few MB of gathers crosses chips:

* cost init / horizontal scanline passes / WTA / LR check: row-local.
* cross aggregation + region voting: each iteration exchanges a
  max_arm-row halo with row neighbors via ``ppermute`` (ICI), then runs
  the same fused kernel on the haloed slab. Arms never cross the true
  image border, so the masked-roll accumulation reads garbage halo cells
  only where the mask is 0 — sharded == unsharded exactly.
* vertical scanline passes: the volume is resharded rows->columns with
  ``all_to_all`` (the 2-D-FFT transpose trick), the DP runs column-local,
  then resharded back. No serialized cross-chip DP chain.
* proper interpolation: the disparity *map* (H*W floats, ~1 MB) is
  all-gathered; each shard computes ray fills only for its rows.
* images are padded to tile multiples; the scanline kernel's step flags
  and the median's in-image mask keep padded results identical to the
  unpadded single-chip pipeline.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adcensus_tpu.config import (
    ADCensusOptions,
    INVALID_FLOAT,
    LARGE_FLOAT,
    MAX_ARM_LENGTH,
)
from adcensus_tpu.ops.cross_sum_pallas import cross_pass
from adcensus_tpu.stages import aggregate as agg_stage
from adcensus_tpu.stages import arms as arms_stage
from adcensus_tpu.stages import cost as cost_stage
from adcensus_tpu.stages import refine as refine_stage
from adcensus_tpu.stages import scanline as scan_stage
from adcensus_tpu.stages import wta as wta_stage
from adcensus_tpu.stages.scanline import (
    _to_sdp,
    _from_sdp,
    _scan_flags,
    scanline_pass_scan,
    _decode_penalties,
)
from adcensus_tpu.ops.scanline_pallas import scanline_pass_sdp
from adcensus_tpu.ops.basic import color_dist, resolve_use_pallas, shift2d


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_hw(x: jnp.ndarray, hp: int, wp: int, fill) -> jnp.ndarray:
    h, w = x.shape[0], x.shape[1]
    pad = [(0, hp - h), (0, wp - w)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, constant_values=fill)


def _halo_rows(slab: jnp.ndarray, halo: int, axis: int) -> jnp.ndarray:
    """Prepend/append ``halo`` rows from row-neighbor shards along the
    'tile' mesh axis (non-wrapping; edge shards receive zeros, which are
    always masked off because arms/windows never cross the image border).
    ``axis`` is the row axis of the local slab. When the halo exceeds the
    local row count (tiny images / many shards) the exchange is multi-hop.
    """
    n = jax.lax.axis_size("tile")
    if n == 1:
        # single shard: both neighbors are image-exterior zeros
        pad = [(0, 0)] * slab.ndim
        pad[axis] = (halo, halo)
        return jnp.pad(slab, pad)
    h_local = slab.shape[axis]
    hops = -(-halo // h_local)

    def take(sl, start, stop):
        idx = [slice(None)] * sl.ndim
        idx[axis] = slice(start, stop)
        return sl[tuple(idx)]

    above = []  # slabs of shards i-1, i-2, ... (nearest first)
    below = []  # slabs of shards i+1, i+2, ...
    for s in range(1, hops + 1):
        above.append(
            jax.lax.ppermute(
                slab, "tile", [(i, i + s) for i in range(n - s)]
            )
        )
        below.append(
            jax.lax.ppermute(
                slab, "tile", [(i + s, i) for i in range(n - s)]
            )
        )
    top = (
        above[0] if hops == 1 else jnp.concatenate(above[::-1], axis=axis)
    )
    bottom = (
        below[0] if hops == 1 else jnp.concatenate(below, axis=axis)
    )
    top = take(top, top.shape[axis] - halo, top.shape[axis])
    bottom = take(bottom, 0, halo)
    return jnp.concatenate([top, slab, bottom], axis=axis)


def _scanline_with_code(cost, code, opts, axis, forward, valid_s, use_pallas):
    """One directional scanline pass given a prebuilt penalty-code volume."""
    s_len = cost.shape[2] if axis == "x" else cost.shape[1]
    v = valid_s
    if v is not None and not forward:
        v = jnp.flip(v)
    flags = _scan_flags(s_len, v)
    if use_pallas:
        # backward passes use the kernel's reversed grid, not a data
        # flip (a fused flip+transpose operand corrupted blocks on some
        # real-TPU shapes — see stages/scanline.py)
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
    perm = (2, 1, 0) if axis == "x" else (1, 2, 0)
    cost_s, P1_s, P2_s = (jnp.transpose(t, perm) for t in (cost, P1, P2))
    if not forward:
        cost_s, P1_s, P2_s = (jnp.flip(t, 0) for t in (cost_s, P1_s, P2_s))
    out = scanline_pass_scan(cost_s, P1_s, P2_s, flags)
    if not forward:
        out = jnp.flip(out, 0)
    return (
        jnp.transpose(out, (2, 1, 0))
        if axis == "x"
        else jnp.transpose(out, (2, 0, 1))
    )


def _code_volume(d1_slab, rd_full, opts, real_w, col0, out_w, rolled=None):
    """Penalty-code volume (D, rows, out_w) for columns
    [col0, col0+out_w): d1_slab is (rows, out_w); rd_full is (rows, W_full)
    so the epipolar lookup rd[y, xr] can cross column-shard boundaries.
    ``rolled`` as in stages.scanline.penalty_code (CPU compile-time
    path; bitwise identical)."""
    d_range = opts.disp_range
    rows, w_full = rd_full.shape
    tso = opts.so_tso
    x = col0 + jnp.arange(out_w)[None, :]
    rd_col1 = rd_full[:, 1:2] if w_full > 1 else rd_full
    if rolled is None:
        rolled = jax.default_backend() == "cpu"
    if rolled:
        span = max(abs(opts.min_disparity), abs(opts.max_disparity)) + 1
        rd_p = jnp.pad(rd_full, ((0, 0), (span, span)))
        code1 = (d1_slab >= tso).astype(jnp.uint8)

        def plane(di):
            d = di + opts.min_disparity
            xr = x - d  # (1, out_w) global columns
            use_d1 = (xr >= real_w - 1) | ((x - opts.min_disparity) <= 0)
            # rd_full[y, c - d] for c in [col0, col0+out_w)
            shifted = jax.lax.dynamic_slice(
                rd_p, (0, span + col0 - d), (rows, out_w)
            )
            sticky = jnp.where(xr < 1, rd_col1, shifted)
            d2 = jnp.where(use_d1, d1_slab, sticky)
            return code1 + (d2 >= tso).astype(jnp.uint8)

        return jax.lax.map(plane, jnp.arange(d_range, dtype=jnp.int32))
    planes = []
    for di in range(d_range):
        xr = x - di - opts.min_disparity  # (1, out_w) global columns
        use_d1 = (xr >= real_w - 1) | ((x - opts.min_disparity) <= 0)
        # rd_full[y, xr] for xr in [col0-d-min, col0+out_w-d-min): static
        # shift of the full-width image, then slice our columns
        shifted_full = shift2d(rd_full, 0, di + opts.min_disparity, 0)
        shifted = jax.lax.dynamic_slice_in_dim(
            shifted_full, col0, out_w, axis=1
        )
        sticky = jnp.where(xr < 1, rd_col1, shifted)
        planes.append(jnp.where(use_d1, d1_slab, sticky))
    d2 = jnp.stack(planes, axis=0)
    return (d1_slab[None] >= tso).astype(jnp.uint8) + (d2 >= tso).astype(
        jnp.uint8
    )


def _rows(x, start, count, axis=0):
    return jax.lax.dynamic_slice_in_dim(x, start, count, axis=axis)


def _precompute(left, right, gray_l, gray_r, opts: ADCensusOptions, dims):
    """Cooperative image-level precomputation, shared by both sharded
    volume layouts.

    Round-2 VERDICT #2: census, arms, and support counts were computed
    fully replicated per shard (~2 ms on Cone — the Amdahl term that
    capped modeled n=8 efficiency at ~66 %). They are row-parallel, so
    each shard now computes only its own hp/n rows — census from a
    4-row-context gray slab, arms from a halo-row-context color slab
    (border semantics stay exact via the builders' global-coordinate
    slab mode), support counts from the gathered arms — and two small
    ``all_gather``s (~6 MB on Cone) rebuild the full arrays every
    consumer already expects. Round 3 extends this to the path
    color-distance maps: x-direction maps on own rows, y-direction on
    own columns, with one ~1.3 MB gather for the full-width y-direction
    right-image maps the epipolar lookup needs — nothing image-level is
    computed replicated any more.

    Returned arrays are bitwise identical to the replicated build:
    arms/sup carry `halo` extra rows top+bottom so haloed row slabs are
    static slices, padding rows have arms 0 / sup 1 exactly as before.
    """
    (h, w, hp, wp, n_tile) = dims
    halo = min(opts.cross_L1, MAX_ARM_LENGTH)
    h_local = hp // n_tile
    # at n=1 the shard index is statically 0: keeping r0 a Python int
    # turns every dynamic slice below into a static slice (tile=1 fixed
    # overhead, round-2 VERDICT weak #3)
    r0 = 0 if n_tile == 1 else jax.lax.axis_index("tile") * h_local

    left_p = _pad_hw(left, hp, wp, 0)
    right_p = _pad_hw(right, hp, wp, 0)
    gl_p = _pad_hw(gray_l, hp, wp, 0)
    gr_p = _pad_hw(gray_r, hp, wp, 0)

    # ---- census: own rows from a 4-row-context gray slab --------------
    def census_own(gray_p):
        ctx = jnp.pad(gray_p, ((4, 4), (0, 0)))
        slab = jax.lax.dynamic_slice(ctx, (r0, 0), (h_local + 8, wp))
        cen = cost_stage.census_transform_9x7(
            slab, row_offset=r0 - 4, full_h=h, full_w=w
        )
        return cen[:, 4 : 4 + h_local]  # (2, h_local, wp)

    cen_l_own = census_own(gl_p)
    cen_r_own = census_own(gr_p)

    # ---- arms: own rows from a halo-row-context color slab ------------
    lctx = jnp.pad(left_p, ((halo, halo), (0, 0), (0, 0)))
    lslab = jax.lax.dynamic_slice(
        lctx, (r0, 0, 0), (h_local + 2 * halo, wp, 3)
    )
    arms_slab = arms_stage.build_arms(
        lslab, opts, row_offset=r0 - halo, full_h=h, full_w=w
    )
    arms_own = arms_slab[halo : halo + h_local]
    # anchors outside the true image keep arms 0 (pad semantics)
    gy = r0 + jnp.arange(h_local)
    pix_valid = (gy[:, None] < h) & (jnp.arange(wp)[None, :] < w)
    arms_own = jnp.where(pix_valid[..., None], arms_own, 0)

    # ---- gather 1: census + arms as one (8, hp, wp) uint32 stack ------
    stack_own = jnp.concatenate(
        [
            cen_l_own,
            cen_r_own,
            jnp.transpose(arms_own, (2, 0, 1)).astype(jnp.uint32),
        ],
        axis=0,
    )
    stack_full = (
        stack_own
        if n_tile == 1
        else jax.lax.all_gather(stack_own, "tile", axis=1, tiled=True)
    )
    census_l = stack_full[0:2]
    census_r = stack_full[2:4]
    arms_full = jnp.transpose(
        stack_full[4:8].astype(jnp.int32), (1, 2, 0)
    )  # (hp, wp, 4)

    # ---- support counts: own rows from gathered arms, gather 2 --------
    actx = jnp.pad(arms_full, ((halo, halo), (0, 0), (0, 0)))
    aslab = jax.lax.dynamic_slice(
        actx, (r0, 0, 0), (h_local + 2 * halo, wp, 4)
    )
    sup_h_s, sup_v_s = agg_stage.support_counts(aslab, halo)
    own = slice(halo, halo + h_local)
    sup_own = jnp.stack([sup_h_s[own], sup_v_s[own]])  # (2, h_local, wp)
    sup_full = (
        sup_own
        if n_tile == 1
        else jax.lax.all_gather(sup_own, "tile", axis=1, tiled=True)
    )

    # ---- path color-distances: cooperative slabs (round 3) ------------
    # Consumption (_tail_rows): the horizontal DP passes read both maps
    # on this shard's ROWS only; the vertical passes (after the
    # rows->cols reshard) read d1 on this shard's COLUMNS and rd at full
    # width (the epipolar lookup rd[y, x-d] crosses column-shard
    # boundaries, scanline_optimizer.cpp:115-126). So each shard
    # computes only its own slab — x-shifts never cross rows and
    # y-shifts never cross columns, so slab compute on the padded images
    # is exact — and one small tiled all_gather rebuilds the full-width
    # y-direction rd maps. Padding rows/cols are forced to 0, matching
    # _pad_hw of the unpadded computation.
    w_local = wp // n_tile
    c0 = 0 if n_tile == 1 else jax.lax.axis_index("tile") * w_local
    row_valid = ((r0 + jnp.arange(h_local))[:, None] < h) & (
        jnp.arange(wp)[None, :] < w
    )
    col_valid = (jnp.arange(hp)[:, None] < h) & (
        (c0 + jnp.arange(w_local))[None, :] < w
    )
    lrow = jax.lax.dynamic_slice(left_p, (r0, 0, 0), (h_local, wp, 3))
    rrow = jax.lax.dynamic_slice(right_p, (r0, 0, 0), (h_local, wp, 3))
    lcol = jax.lax.dynamic_slice(left_p, (0, c0, 0), (hp, w_local, 3))
    rcol = jax.lax.dynamic_slice(right_p, (0, c0, 0), (hp, w_local, 3))

    def _dist(img, dy, dx, mask):
        return jnp.where(mask, color_dist(img, shift2d(img, dy, dx, 0)), 0)

    dists = {}
    rd_y_own = []
    for fw in (True, False):
        direction = 1 if fw else -1
        dists[("x", fw)] = (
            _dist(lrow, 0, direction, row_valid),
            _dist(rrow, 0, direction, row_valid),
        )
        dists[("y", fw)] = _dist(lcol, direction, 0, col_valid)
        rd_y_own.append(_dist(rcol, direction, 0, col_valid))
    rd_y = jnp.stack(rd_y_own)  # (2, hp, w_local)
    if n_tile > 1:
        rd_y = jax.lax.all_gather(rd_y, "tile", axis=2, tiled=True)
    for k, fw in enumerate((True, False)):
        dists[("y", fw)] = (dists[("y", fw)], rd_y[k])

    return dict(
        census_l=census_l,
        census_r=census_r,
        arms=jnp.pad(arms_full, ((halo, halo), (0, 0), (0, 0))),
        sup_h=jnp.pad(
            sup_full[0], ((halo, halo), (0, 0)), constant_values=1
        ),
        sup_v=jnp.pad(
            sup_full[1], ((halo, halo), (0, 0)), constant_values=1
        ),
        left=left_p,
        right=right_p,
        dists=dists,
        halo=halo,
    )


def _pair_body(left, right, gray_l, gray_r,
               opts: ADCensusOptions, dims, use_pallas):
    """Per-shard computation for one pair, volume sharded over image
    ROWS end to end. Inputs are the *unpadded* replicated (H, W)-level
    arrays; each shard redundantly performs the (cheap) image-level
    precomputation, pads, and then computes its own (H_local, Wp) rows
    of the disparity map.

    ``use_pallas`` is the raw pipeline knob: cross ops resolve it to a
    backend (matmul/pallas/jnp); scanline/interpolation resolve it to a
    kernels-on/off bool."""
    from adcensus_tpu.ops.basic import resolve_cross_backend
    from adcensus_tpu.ops.cross_matmul import band_masks

    (h, w, hp, wp, n_tile) = dims
    pre = _precompute(left, right, gray_l, gray_r, opts, dims)
    halo = pre["halo"]
    h_local = hp // n_tile
    r0 = 0 if n_tile == 1 else jax.lax.axis_index("tile") * h_local

    # ---- cost initialization (row-local) ------------------------------
    vol = cost_stage.compute_cost_volume(
        _rows(pre["left"], r0, h_local),
        _rows(pre["right"], r0, h_local),
        _rows(pre["census_l"], r0, h_local, axis=1),
        _rows(pre["census_r"], r0, h_local, axis=1),
        opts,
    )  # (D, h_local, wp)

    # ---- cross aggregation with row halos -----------------------------
    # arms/sup were pre-padded with `halo` extra rows on top and bottom,
    # so the haloed slab aligns with rows [r0 - halo, r0 + h_local + halo)
    arms_halo = _rows(pre["arms"], r0, h_local + 2 * halo)
    sup_h_halo = _rows(pre["sup_h"], r0, h_local + 2 * halo).astype(
        jnp.float32
    )
    sup_v_halo = _rows(pre["sup_v"], r0, h_local + 2 * halo).astype(
        jnp.float32
    )
    cross_masks = (
        band_masks(arms_halo, halo)
        if resolve_cross_backend(use_pallas) == "matmul"
        else None
    )
    horizontal_first = True
    for _ in range(4):
        padded = _halo_rows(vol, halo, axis=1)
        out = cross_pass(
            padded,
            arms_halo,
            sup_h_halo if horizontal_first else sup_v_halo,
            horizontal_first,
            halo,
            normalize=True,
            use_pallas=use_pallas,
            masks=cross_masks,
        )
        vol = out[:, halo : halo + h_local]
        horizontal_first = not horizontal_first

    return _tail_rows(vol, pre, opts, dims, use_pallas)


def _pair_body_disp(left, right, gray_l, gray_r,
                    opts: ADCensusOptions, dims, use_pallas):
    """Per-shard computation for one pair, volume sharded over the
    DISPARITY axis through cost init + aggregation, then resharded to
    rows for the scanline/WTA/refine tail (SURVEY.md §7 hard part 3:
    Piano-class D=256 full-res volumes exceed one chip's memory; both
    phases hold 1/n of the volume).

    Cost planes are embarrassingly parallel over d, and cross
    aggregation never mixes d-planes — so phase 1 needs NO halo
    exchange at all; the single all_to_all (split rows, concat d) is
    the only extra collective vs the rows layout. The same mesh axis
    ('tile') indexes d-blocks in phase 1 and row blocks afterwards."""
    from adcensus_tpu.ops.basic import resolve_cross_backend
    from adcensus_tpu.ops.cross_matmul import band_masks

    (h, w, hp, wp, n_tile) = dims
    pre = _precompute(left, right, gray_l, gray_r, opts, dims)
    halo = pre["halo"]
    d_range = opts.disp_range
    if d_range % n_tile != 0:
        raise ValueError(
            f"disp_range {d_range} must be a multiple of the mesh "
            f"size {n_tile} for volume_axis='disp'"
        )
    d_local = d_range // n_tile
    d0 = 0 if n_tile == 1 else jax.lax.axis_index("tile") * d_local

    # ---- cost initialization: this shard's d-planes, full rows --------
    vol_loc = cost_stage.compute_cost_planes(
        pre["left"], pre["right"], pre["census_l"], pre["census_r"],
        opts, d0, d_local,
    )  # (d_local, hp, wp)

    # ---- cross aggregation: plane-local, no halos ---------------------
    arms_full = _rows(pre["arms"], halo, hp)
    sup_h_full = _rows(pre["sup_h"], halo, hp).astype(jnp.float32)
    sup_v_full = _rows(pre["sup_v"], halo, hp).astype(jnp.float32)
    masks = (
        band_masks(arms_full, halo)
        if resolve_cross_backend(use_pallas) == "matmul"
        else None
    )
    horizontal_first = True
    for _ in range(4):
        vol_loc = cross_pass(
            vol_loc,
            arms_full,
            sup_h_full if horizontal_first else sup_v_full,
            horizontal_first,
            halo,
            normalize=True,
            use_pallas=use_pallas,
            masks=masks,
        )
        horizontal_first = not horizontal_first

    # ---- reshard: d-blocks -> row-blocks ------------------------------
    vol = (
        vol_loc
        if n_tile == 1
        else jax.lax.all_to_all(
            vol_loc, "tile", split_axis=1, concat_axis=0, tiled=True
        )
    )  # (D, h_local, wp)
    return _tail_rows(vol, pre, opts, dims, use_pallas)


def _tail_rows(vol, pre, opts: ADCensusOptions, dims, use_pallas):
    """Scanline -> WTA -> refinement on a row-sharded (D, H_local, Wp)
    volume; returns this shard's (H_local, Wp) disparity rows."""
    from adcensus_tpu.ops.basic import resolve_cross_backend
    from adcensus_tpu.ops.cross_matmul import vote_band_masks

    (h, w, hp, wp, n_tile) = dims
    kern = resolve_use_pallas(use_pallas)  # scanline / interp kernels
    halo = pre["halo"]
    dists = pre["dists"]
    h_local = hp // n_tile
    w_local = wp // n_tile
    if n_tile == 1:
        i = r0 = c0 = 0
    else:
        i = jax.lax.axis_index("tile")
        r0 = i * h_local
        c0 = i * w_local

    # ---- scanline: horizontal passes (row-local) -----------------------
    valid_w = jnp.arange(wp) < w
    valid_h = jnp.arange(hp) < h
    for fwd in (True, False):
        d1, rd = dists[("x", fwd)]  # this shard's rows, full width
        code = _code_volume(d1, rd, opts, w, 0, wp)
        vol = _scanline_with_code(
            vol, code, opts, "x", fwd, valid_w, kern
        )

    # ---- reshard rows -> columns, vertical passes, reshard back --------
    if n_tile > 1:
        vol = jax.lax.all_to_all(vol, "tile", split_axis=2, concat_axis=1,
                                 tiled=True)  # (D, hp, w_local)
    for fwd in (True, False):
        d1, rd = dists[("y", fwd)]  # d1: this shard's cols; rd: full
        code = _code_volume(d1, rd, opts, w, c0, w_local)
        vol = _scanline_with_code(
            vol, code, opts, "y", fwd, valid_h, kern
        )
    if n_tile > 1:
        vol = jax.lax.all_to_all(vol, "tile", split_axis=1, concat_axis=2,
                                 tiled=True)  # (D, h_local, wp)

    # ---- WTA (row-local); pad columns behave like out-of-image ---------
    col_pad = (jnp.arange(wp) >= w)[None, None, :]
    vol = jnp.where(col_pad, LARGE_FLOAT, vol)
    disp_l = wta_stage.wta_left(vol, opts)
    disp_r = wta_stage.wta_right(vol, opts)

    # ---- refinement (flag gating mirrors multistep_refine) --------------
    row_ids = r0 + jnp.arange(h_local)
    in_image = (row_ids[:, None] < h) & (jnp.arange(wp)[None, :] < w)
    disp = disp_l
    occl = jnp.zeros_like(in_image)
    mism = jnp.zeros_like(in_image)
    if opts.do_lr_check:
        disp, occl, mism = refine_stage.outlier_detection(
            disp_l, disp_r, opts, real_w=w
        )
    disp = jnp.where(in_image, disp, INVALID_FLOAT)
    occl = occl & in_image
    mism = mism & in_image

    if opts.do_filling:
        # iterative region voting with row halos
        arms_vote = _rows(pre["arms"], r0, h_local + 2 * halo)
        vote_masks = (
            vote_band_masks(arms_vote, halo)
            if resolve_cross_backend(use_pallas) == "matmul"
            else None
        )
        from adcensus_tpu.ops.region_vote_pallas import region_vote_stats

        def vote_phase(disp, target):
            # the halo exchange (collective) runs unconditionally so
            # every shard keeps the same collective schedule; only the
            # local histogram is cond-gated (skipped when this shard has
            # no targets or the map has globally converged)
            dpad = _halo_rows(disp, halo, axis=0)

            def run(disp):
                # histogram runs on the haloed slab so regions crossing
                # the shard edge see their full support; thresholds/fill
                # are the shared single-chip helpers
                di, valid = refine_stage.vote_indices(dpad, opts)
                best, max_ht, count = region_vote_stats(
                    di, valid, arms_vote, opts.disp_range, halo,
                    use_pallas=use_pallas, masks=vote_masks,
                )
                own = slice(halo, halo + h_local)
                return refine_stage.apply_vote_fill(
                    disp, target, best[own], max_ht[own], count[own],
                    opts,
                )

            return jax.lax.cond(jnp.any(target), run, lambda d: d, disp)

        # (an iteration-level psum convergence gate was measured
        # worthless — real maps keep filling through all 5 iterations;
        # the per-shard no-targets cond above is the useful skip)
        for _ in range(5):
            for phase_mask in (mism, occl):
                target = phase_mask & ~jnp.isfinite(disp)
                disp = vote_phase(disp, target)

        # proper interpolation: all-gather the (small) disparity map,
        # compute ray fills for own rows only. The gathers stay outside
        # the conds (uniform collective schedule); the local ray march
        # is skipped when this shard has no targets, mirroring the
        # reference's empty-list skip (multistep_refiner.cpp:240-242).
        left_full = pre["left"]  # replicated full padded image

        def interp_phase(disp, target, is_mismatch):
            full = (
                disp
                if n_tile == 1
                else jax.lax.all_gather(disp, "tile", axis=0, tiled=True)
            )

            def run(disp):
                fills = refine_stage.interpolation_fills(
                    full, left_full, opts, is_mismatch, row_offset=r0,
                    out_rows=h_local, use_pallas=use_pallas,
                    target=target,
                )
                return jnp.where(target, fills, disp)

            return jax.lax.cond(jnp.any(target), run, lambda d: d, disp)

        disp = interp_phase(disp, mism & ~jnp.isfinite(disp), True)
        disp = interp_phase(disp, occl & ~jnp.isfinite(disp), False)

    if opts.do_discontinuity_adjustment:
        # 1-row disp halo for the Sobel mask, 1-row cost halo for the
        # neighbor-cost lookups; the DDA column scan is row-local on the
        # haloed slab. True image border rows/cols must keep their
        # pre-DDA values (edge_detect zeroes them in the unsharded path;
        # here halo rows of edge shards and column padding would
        # otherwise leak in).
        before = disp
        dpad = _halo_rows(disp, 1, axis=0)
        vpad = _halo_rows(vol, 1, axis=1)
        adj = refine_stage.depth_discontinuity_adjustment(dpad, vpad, opts)
        adj = adj[1 : 1 + h_local]
        interior = (
            (row_ids[:, None] > 0)
            & (row_ids[:, None] < h - 1)
            & (jnp.arange(wp)[None, :] > 0)
            & (jnp.arange(wp)[None, :] < w - 1)
        )
        disp = jnp.where(interior, adj, before)

    if opts.exact_median:
        # the in-place raster median is a global wavefront (row y reads
        # filtered row y-1); the map is tiny, so all_gather it and run
        # the sheared scan redundantly per shard, keeping own rows
        if n_tile == 1:
            full_d, full_m = disp, in_image
        else:
            full_d = jax.lax.all_gather(disp, "tile", axis=0, tiled=True)
            full_m = jax.lax.all_gather(in_image, "tile", axis=0, tiled=True)
        med = refine_stage.median_filter_3x3_inplace(full_d, full_m)
        disp = jax.lax.dynamic_slice_in_dim(med, r0, h_local, axis=0)
        return jnp.where(in_image, disp, INVALID_FLOAT)
    # ---- median with 1-row halo and in-image mask -----------------------
    dpad = _halo_rows(disp, 1, axis=0)
    mpad = _halo_rows(in_image, 1, axis=0)
    # edge shards receive zero halos; ppermute delivers zeros for bool too
    med = refine_stage.median_filter_3x3(dpad, mpad)
    disp = med[1 : 1 + h_local]
    return jnp.where(in_image, disp, INVALID_FLOAT)


@functools.partial(
    jax.jit, static_argnames=("opts", "mesh", "use_pallas", "volume_axis")
)
def match_sharded(
    left: jnp.ndarray,
    right: jnp.ndarray,
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    opts: ADCensusOptions,
    mesh: Mesh,
    use_pallas: bool | None = None,
    volume_axis: str = "rows",
) -> jnp.ndarray:
    """Sharded single-pair pipeline over the mesh's 'tile' axis.

    volume_axis selects how the cost volume is partitioned through cost
    init + aggregation: "rows" (halo exchange per iteration) or "disp"
    (d-plane blocks, no halos, one extra all_to_all; fits Piano-class
    D>=256 full-res volumes — SURVEY.md §7 hard part 3). The
    scanline/WTA/refine tail is row-sharded either way.

    Inputs are unpadded (H, W[, 3]) arrays; returns the (H, W) disparity.
    """
    h, w, _ = left.shape
    n_tile = mesh.shape["tile"]
    hp = _ceil_to(h, n_tile)
    wp = _ceil_to(w, n_tile)
    dims = (h, w, hp, wp, n_tile)
    body_fn = {"rows": _pair_body, "disp": _pair_body_disp}[volume_axis]
    body = functools.partial(
        body_fn, opts=opts, dims=dims, use_pallas=use_pallas
    )
    disp_p = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(),) * 4,
        out_specs=P("tile", None),
        check_vma=False,
    )(left, right, gray_l, gray_r)
    return disp_p[:h, :w]


@functools.partial(
    jax.jit, static_argnames=("opts", "mesh", "use_pallas", "volume_axis")
)
def match_sharded_batched(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    grays_l: jnp.ndarray,
    grays_r: jnp.ndarray,
    opts: ADCensusOptions,
    mesh: Mesh,
    use_pallas: bool | None = None,
    volume_axis: str = "rows",
) -> jnp.ndarray:
    """Batch of pairs sharded over 'data', volume over 'tile':
    (B, H, W, 3) stacks -> (B, H, W) disparities. B must be a multiple of
    the mesh's data-axis size; volume_axis as in match_sharded."""
    b, h, w, _ = lefts.shape
    n_tile = mesh.shape["tile"]
    hp = _ceil_to(h, n_tile)
    wp = _ceil_to(w, n_tile)
    dims = (h, w, hp, wp, n_tile)
    body_fn = {"rows": _pair_body, "disp": _pair_body_disp}[volume_axis]
    body = functools.partial(
        body_fn, opts=opts, dims=dims, use_pallas=use_pallas
    )
    # batch axis = lax.map loop per shard (NOT vmap: vmap-of-pallas
    # miscompiled on TPU — see pipeline.match_batched_device)
    def mapped(ls, rs, gls, grs):
        return jax.lax.map(lambda t: body(*t), (ls, rs, gls, grs))

    disp_p = jax.shard_map(
        mapped,
        mesh=mesh,
        in_specs=(P("data"),) * 4,
        out_specs=P("data", "tile", None),
        check_vma=False,
    )(lefts, rights, grays_l, grays_r)
    return disp_p[:, :h, :w]
