"""End-to-end AD-Census pipeline, jitted.

Mirrors ADCensusStereo::Match (ADCensusStereo.cpp:69-132): cost init ->
cross aggregation -> 4-direction scanline -> left/right WTA -> multi-step
refinement, as a single jitted function over device-resident arrays with a
static options argument. The batched variant vmaps over image pairs.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adcensus_tpu.config import ADCensusOptions
from adcensus_tpu.stages import aggregate as agg_stage
from adcensus_tpu.stages import arms as arms_stage
from adcensus_tpu.stages import cost as cost_stage
from adcensus_tpu.stages import refine as refine_stage
from adcensus_tpu.stages import scanline as scan_stage
from adcensus_tpu.stages import wta as wta_stage


def match_core(
    left: jnp.ndarray,
    right: jnp.ndarray,
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    opts: ADCensusOptions,
    return_intermediates: bool = False,
    use_pallas: bool | None = None,
) -> Dict[str, jnp.ndarray]:
    """Full pipeline on (H, W, 3) uint8 RGB images; gray images supplied
    separately so callers can choose the exact-parity host path."""
    census_l = cost_stage.census_transform_9x7(gray_l)
    census_r = cost_stage.census_transform_9x7(gray_r)
    cost_init = cost_stage.compute_cost_volume(
        left, right, census_l, census_r, opts
    )
    arms = arms_stage.build_arms(left, opts)
    cost_aggr = agg_stage.aggregate(
        cost_init, arms, opts, use_pallas=use_pallas
    )
    cost_scan = scan_stage.scanline_optimize(
        cost_aggr, left, right, opts, use_pallas=use_pallas
    )
    disp_left = wta_stage.wta_left(cost_scan, opts)
    disp_right = wta_stage.wta_right(cost_scan, opts)
    refined = refine_stage.multistep_refine(
        disp_left, disp_right, left, cost_scan, arms, opts,
        use_pallas=use_pallas,
    )
    out = {"disparity": refined["final"]}
    if return_intermediates:
        out.update(
            cost_init=cost_init,
            arms=arms,
            cost_aggr=cost_aggr,
            cost_scan=cost_scan,
            disp_left_raw=disp_left,
            disp_right_raw=disp_right,
            **{k: v for k, v in refined.items() if k != "final"},
        )
    return out


match_core_jit = jax.jit(
    match_core,
    static_argnames=("opts", "return_intermediates", "use_pallas"),
)


@partial(jax.jit, static_argnames=("opts", "use_pallas"))
def match_device(
    left: jnp.ndarray,
    right: jnp.ndarray,
    opts: ADCensusOptions,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Single-dispatch pipeline: gray conversion happens inside the jit, so
    one host->device call produces the disparity map (the hot path for
    streaming/serving; ``match`` adds host conversions around it)."""
    gray_l = cost_stage.compute_gray(left)
    gray_r = cost_stage.compute_gray(right)
    return match_core(left, right, gray_l, gray_r, opts,
                      use_pallas=use_pallas)["disparity"]


def validate_inputs(
    left: np.ndarray, right: np.ndarray, opts: ADCensusOptions
) -> None:
    """Fail fast on malformed inputs, mirroring the reference's guards
    (ADCensusStereo.cpp:71-76 rejects null/absent data, Initialize rejects
    non-positive dims, main.cpp:36-57 rejects mismatched loads)."""
    for name, img in (("left", left), ("right", right)):
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(
                f"{name} image must be (H, W, 3) RGB, got shape "
                f"{tuple(img.shape)}"
            )
        if img.dtype != np.uint8:
            raise TypeError(
                f"{name} image must be uint8, got {img.dtype}"
            )
    if left.shape != right.shape:
        raise ValueError(
            f"left/right shapes differ: {tuple(left.shape)} vs "
            f"{tuple(right.shape)}"
        )
    h, w = left.shape[:2]
    if h <= 0 or w <= 0:
        raise ValueError(f"image dimensions must be positive, got {w}x{h}")
    opts.validate()


def match(
    left: np.ndarray,
    right: np.ndarray,
    opts: Optional[ADCensusOptions] = None,
    gray_mode: str = "device",
    return_intermediates: bool = False,
    use_pallas: bool | None = None,
) -> Dict[str, np.ndarray]:
    """Host-facing entry point.

    gray_mode:
      * "device" (default): float32 gray conversion on the TPU;
      * "host64": bit-exact double-precision gray on the host
        (cost_computor.cpp:69 truncates a double) for parity runs.
    """
    opts = opts or ADCensusOptions()
    validate_inputs(np.asarray(left), np.asarray(right), opts)
    if gray_mode == "host64":
        gray_l = cost_stage.compute_gray_host64(left)
        gray_r = cost_stage.compute_gray_host64(right)
    elif not return_intermediates:
        disp = match_device(
            jnp.asarray(left), jnp.asarray(right), opts, use_pallas
        )
        return {"disparity": np.asarray(disp)}
    else:
        gray_l = cost_stage.compute_gray(jnp.asarray(left))
        gray_r = cost_stage.compute_gray(jnp.asarray(right))
    res = match_core_jit(
        jnp.asarray(left),
        jnp.asarray(right),
        jnp.asarray(gray_l),
        jnp.asarray(gray_r),
        opts,
        return_intermediates,
        use_pallas,
    )
    return {k: np.asarray(v) for k, v in res.items()}


def _batch_group_size(b: int, h: int, w: int, opts: ADCensusOptions) -> int:
    """Largest divisor of ``b`` whose statically-unrolled group fits the
    HBM working-set budget. ~6x the (D, H, W) f32 volume per in-flight
    pair bounds the measured peak (XLA's scheduler kept B=8 Cone at
    5.2x volume/pair; 6x adds margin), against a 10 GB budget on the
    16 GB v5e."""
    per_pair = 6 * opts.disp_range * h * w * 4
    g = max(1, min(b, int(10 * 1024**3 // max(per_pair, 1))))
    while b % g:
        g -= 1
    return g


@partial(jax.jit, static_argnames=("opts", "use_pallas", "group"))
def match_batched_device(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    opts: ADCensusOptions,
    use_pallas: bool | None = None,
    group: int | None = None,
) -> jnp.ndarray:
    """Batched single-dispatch pipeline: (B, H, W, 3) uint8 stacks ->
    (B, H, W) disparities, gray conversion on device.

    Groups of ``group`` pairs are STATICALLY unrolled inside the
    program (independent subgraphs: XLA's scheduler overlaps one pair's
    latency-bound stages — scanline DP, the interp ray march, the
    median wavefront — and async HBM copies with another pair's dense
    compute). Measured on Cone B=8 (TPU v5e): 5.9 ms/pair unrolled vs
    11.8 ms/pair for any loop whose iteration dynamically slices the
    stacked inputs — a loop-varying dynamic-slice of the batch costs
    ~3.8 ms/pair by itself (static or constant-foldable indices don't;
    isolated by A/B: carried-pair 11.76, static-index 11.70,
    dyn-index-B=1 11.71, dyn-index-B=8 15.54 ms/pair). Groups beyond
    the HBM budget run under ``lax.map``, which pays that slice cost
    once per group. ``group=None`` picks the largest in-budget divisor
    of B (the whole batch when it fits). The batch axis is never a
    vector axis: one pair saturates the chip, and vmap-of-pallas
    miscompiled at B=8 on TPU (observed 42-disparity errors).

    Compile cost scales with ``group`` (~8x one pair's at group=8);
    the persistent compile cache absorbs it after the first run."""
    b, h, w = lefts.shape[0], lefts.shape[1], lefts.shape[2]
    g = _batch_group_size(b, h, w, opts) if group is None else group

    def run_group(ls, rs):
        outs = []
        for i in range(g):
            gl = cost_stage.compute_gray(ls[i])
            gr = cost_stage.compute_gray(rs[i])
            outs.append(
                match_core(ls[i], rs[i], gl, gr, opts,
                           use_pallas=use_pallas)["disparity"]
            )
        return jnp.stack(outs)

    if g >= b:
        return run_group(lefts, rights)
    lg = lefts.reshape((b // g, g) + lefts.shape[1:])
    rg = rights.reshape((b // g, g) + rights.shape[1:])
    out = jax.lax.map(lambda p: run_group(p[0], p[1]), (lg, rg))
    return out.reshape((b,) + out.shape[2:])


@partial(jax.jit, static_argnames=("opts_seq", "use_pallas"))
def match_hetero_device(
    pairs: tuple,
    opts_seq: tuple,
    use_pallas: bool | None = None,
) -> tuple:
    """Heterogeneous batch: pairs of DIFFERENT shapes and disparity
    ranges matched in ONE dispatch (e.g. Wood2 653x555 D=128 together
    with Cone 450x375 D=64 — BASELINE config 3's mixed stream).

    ``pairs`` is a tuple of (left, right) uint8 (H_i, W_i, 3) arrays;
    ``opts_seq`` the matching per-pair static options. Each pair runs
    its full pipeline at its native shape inside a single XLA
    executable — no pad-to-max, no masking: the outputs are the same
    programs as per-pair ``match_device`` calls, fused into one
    dispatch so a mixed serving stream pays one host round-trip.
    (The reference handles exactly one pair per process,
    main.cpp:34-145; same-shape streams use ``match_batched_device``.)
    """
    outs = []
    for (l, r), o in zip(pairs, opts_seq):
        gl = cost_stage.compute_gray(l)
        gr = cost_stage.compute_gray(r)
        outs.append(
            match_core(l, r, gl, gr, o, use_pallas=use_pallas)["disparity"]
        )
    return tuple(outs)


@partial(jax.jit, static_argnames=("opts",))
def match_batched(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    grays_l: jnp.ndarray,
    grays_r: jnp.ndarray,
    opts: ADCensusOptions,
) -> jnp.ndarray:
    """Batched pipeline over (B, H, W, 3) stacks -> (B, H, W) disparities
    (precomputed grays; grouping identical to match_batched_device —
    static unroll within the HBM budget, lax.map over groups)."""
    b, h, w = lefts.shape[0], lefts.shape[1], lefts.shape[2]
    g = _batch_group_size(b, h, w, opts)

    def run_group(ls, rs, gls, grs):
        return jnp.stack(
            [
                match_core(ls[i], rs[i], gls[i], grs[i], opts)["disparity"]
                for i in range(g)
            ]
        )

    if g >= b:
        return run_group(lefts, rights, grays_l, grays_r)

    def regroup(a):
        return a.reshape((b // g, g) + a.shape[1:])

    out = jax.lax.map(
        lambda p: run_group(*p),
        (regroup(lefts), regroup(rights), regroup(grays_l),
         regroup(grays_r)),
    )
    return out.reshape((b,) + out.shape[2:])
