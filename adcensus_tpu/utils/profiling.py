"""Per-stage instrumentation, mirroring the reference's per-stage timing
printfs (ADCensusStereo.cpp:81-129) the TPU way: each stage is jitted
separately and fenced with ``block_until_ready`` so its wall-clock is a
true device time, and throughput is reported as Mpix*disp/s per stage.

Also supports dumping every intermediate volume/map to an ``.npz`` for
debugging (the reference has no such facility — SURVEY.md §5 suggests it).
"""
from __future__ import annotations

import time
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


@partial(jax.jit, static_argnames=("opts",))
def _stage_cost(left, right, gray_l, gray_r, opts):
    census_l = cost_stage.census_transform_9x7(gray_l)
    census_r = cost_stage.census_transform_9x7(gray_r)
    return cost_stage.compute_cost_volume(left, right, census_l, census_r, opts)


@partial(jax.jit, static_argnames=("opts",))
def _stage_arms(left, opts):
    return arms_stage.build_arms(left, opts)


@partial(jax.jit, static_argnames=("opts", "use_pallas"))
def _stage_aggregate(cost_init, arms, opts, use_pallas):
    return agg_stage.aggregate(cost_init, arms, opts, use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("opts", "use_pallas"))
def _stage_scanline(cost_aggr, left, right, opts, use_pallas):
    return scan_stage.scanline_optimize(
        cost_aggr, left, right, opts, use_pallas=use_pallas
    )


@partial(jax.jit, static_argnames=("opts",))
def _stage_wta(cost, opts):
    return wta_stage.wta_left(cost, opts), wta_stage.wta_right(cost, opts)


@partial(jax.jit, static_argnames=("opts", "use_pallas"))
def _stage_refine(disp_l, disp_r, left, cost, arms, opts, use_pallas):
    return refine_stage.multistep_refine(
        disp_l, disp_r, left, cost, arms, opts, use_pallas=use_pallas
    )["final"]


def _fence(x):
    """True device fence. Under the remote-TPU tunnel
    ``block_until_ready`` returns immediately, so fetch one element of
    every output leaf — the transfer cannot complete before the
    computation has."""
    for a in jax.tree_util.tree_leaves(x):
        np.asarray(a[(0,) * a.ndim])
    return x


def match_staged(
    left: np.ndarray,
    right: np.ndarray,
    opts: Optional[ADCensusOptions] = None,
    use_pallas: bool | None = None,
    warmup: bool = True,
    dump_path: Optional[str] = None,
) -> Dict:
    """Run the pipeline stage by stage with device fences.

    Returns {"disparity", "timings": {stage: seconds}, "throughput":
    {stage: Mpix*disp/s}}. With ``warmup`` each stage is compiled (and
    cached) before the timed pass, so timings are steady-state.
    """
    opts = opts or ADCensusOptions()
    opts.validate()
    h, w, _ = left.shape
    work = h * w * opts.disp_range

    left_d = jnp.asarray(left)
    right_d = jnp.asarray(right)
    gray_l = cost_stage.compute_gray(left_d)
    gray_r = cost_stage.compute_gray(right_d)

    stages = {}
    timings = {}

    def run(name, fn, *args):
        if warmup:
            _fence(fn(*args))
        t0 = time.perf_counter()
        out = _fence(fn(*args))
        timings[name] = time.perf_counter() - t0
        stages[name] = out
        return out

    cost_init = run(
        "cost", _stage_cost, left_d, right_d, gray_l, gray_r, opts
    )
    arms = run("arms", _stage_arms, left_d, opts)
    cost_aggr = run(
        "aggregation", _stage_aggregate, cost_init, arms, opts, use_pallas
    )
    cost_scan = run(
        "scanline", _stage_scanline, cost_aggr, left_d, right_d, opts,
        use_pallas,
    )
    disp_l, disp_r = run("wta", _stage_wta, cost_scan, opts)
    disp = run(
        "refine", _stage_refine, disp_l, disp_r, left_d, cost_scan, arms,
        opts, use_pallas,
    )

    throughput = {k: work / t / 1e6 for k, t in timings.items()}
    timings["total"] = sum(timings.values())
    throughput["total"] = work / timings["total"] / 1e6

    if dump_path:
        np.savez_compressed(
            dump_path,
            cost_init=np.asarray(cost_init),
            arms=np.asarray(arms),
            cost_aggr=np.asarray(cost_aggr),
            cost_scan=np.asarray(cost_scan),
            disp_left_raw=np.asarray(disp_l),
            disp_right_raw=np.asarray(disp_r),
            disparity=np.asarray(disp),
        )

    return {
        "disparity": np.asarray(disp),
        "timings": timings,
        "throughput": throughput,
    }


def trace(fn, *args, trace_dir: str = "/tmp/adcensus_trace"):
    """Run ``fn(*args)`` under a jax.profiler trace (for xprof/tensorboard)."""
    with jax.profiler.trace(trace_dir):
        out = _fence(fn(*args))
    return out, trace_dir
