"""True per-stage device timing despite the remote-TPU tunnel.

The per-stage profiler (utils/profiling.py) fences every stage with a
device->host transfer, so each measurement carries the tunnel's ~100 ms
dispatch/fetch RPC. Here each stage runs N times inside ONE jitted
``fori_loop`` (an ``optimization_barrier`` re-ties the inputs to the
loop carry each iteration so XLA cannot hoist the stage out of the
loop), and only the final scalar is fetched — the RPC cost is amortized
to <2 ms/stage at N=50.

Usage: python tools/stage_bench.py [pair] [iters] [--refine-detail]
(--refine-detail additionally times the refinement sub-stages:
LR check, voting, interpolation, median, DDA.)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    # honor JAX_PLATFORMS under the axon sitecustomize (which pins the
    # TPU backend at interpreter start) — CPU smoke runs must not dial
    # (or contend for) the tunnel
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:
            print(f"warning: could not apply JAX_PLATFORMS: {e}",
                  file=sys.stderr)
    import jax.numpy as jnp

    from adcensus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.io.image import get_pair
    from adcensus_tpu.stages import aggregate as agg_stage
    from adcensus_tpu.stages import arms as arms_stage
    from adcensus_tpu.stages import cost as cost_stage
    from adcensus_tpu.stages import refine as refine_stage
    from adcensus_tpu.stages import scanline as scan_stage
    from adcensus_tpu.stages import wta as wta_stage

    argv = [a for a in sys.argv[1:] if a != "--refine-detail"]
    refine_detail = "--refine-detail" in sys.argv[1:]
    only = None  # --stages aggregate,voting: skip other rows' compiles
    if "--stages" in argv:
        i = argv.index("--stages")
        only = {s.strip() for s in argv[i + 1].split(",")}
        argv = argv[:i] + argv[i + 2 :]
    json_path = None  # --json PATH: per-stage ms for tools/roofline.py
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    pair_name = argv[0] if argv else "Cone"
    iters = int(argv[1]) if len(argv) > 1 else 50
    # label overrides matching tools/parity_report.py's configs
    overrides = {"Piano256": ("Piano", 0, 256)}
    base_name, dmin, dmax = overrides.get(
        pair_name, (pair_name, None, None)
    )
    pair = get_pair(base_name)
    left_np, right_np, _ = pair.load()
    h, w, _ = left_np.shape
    opts = ADCensusOptions(
        min_disparity=pair.dmin if dmin is None else dmin,
        max_disparity=pair.dmax if dmax is None else dmax,
    )
    work = h * w * opts.disp_range

    left = jax.device_put(jnp.asarray(left_np))
    right = jax.device_put(jnp.asarray(right_np))
    gray_l = cost_stage.compute_gray(left)
    gray_r = cost_stage.compute_gray(right)

    def stage_cost(left, right, gray_l, gray_r):
        cl = cost_stage.census_transform_9x7(gray_l)
        cr = cost_stage.census_transform_9x7(gray_r)
        return cost_stage.compute_cost_volume(left, right, cl, cr, opts)

    # materialize stage inputs once; with --stages, stop the chain at
    # the deepest requested stage (each jit below is its own tunnel
    # compile, so unneeded links are pure wasted minutes)
    chain = ["cost", "arms", "aggregate", "scanline", "wta", "refine"]
    deps = {  # deepest chain link each selectable row needs
        "cost": "cost", "arms": "arms", "aggregate": "aggregate",
        "scanline": "scanline", "wta": "wta", "refine": "refine",
        "lr_check": "refine", "voting": "refine", "interp": "refine",
        "median": "refine", "dda": "refine",
    }
    depth = len(chain) - 1 if only is None else max(
        chain.index(deps[s]) for s in only if s in deps
    )
    cost_init = jax.jit(stage_cost)(left, right, gray_l, gray_r)
    arms = jax.jit(lambda l: arms_stage.build_arms(l, opts))(left)
    cost_aggr = cost_scan = disp_l = disp_r = None
    if depth >= 2:
        cost_aggr = jax.jit(lambda c, a: agg_stage.aggregate(c, a, opts))(
            cost_init, arms
        )
    if depth >= 3:
        cost_scan = jax.jit(
            lambda c, l, r: scan_stage.scanline_optimize(c, l, r, opts)
        )(cost_aggr, left, right)
    if depth >= 4:
        disp_l = jax.jit(lambda c: wta_stage.wta_left(c, opts))(cost_scan)
        disp_r = jax.jit(lambda c: wta_stage.wta_right(c, opts))(cost_scan)

    stages = {
        "cost": (stage_cost, (left, right, gray_l, gray_r)),
        "arms": (
            lambda l: arms_stage.build_arms(l, opts),
            (left,),
        ),
        "aggregate": (
            lambda c, a: agg_stage.aggregate(c, a, opts),
            (cost_init, arms),
        ),
        "scanline": (
            lambda c, l, r: scan_stage.scanline_optimize(c, l, r, opts),
            (cost_aggr, left, right),
        ),
        "wta": (
            lambda c: (wta_stage.wta_left(c, opts), wta_stage.wta_right(c, opts)),
            (cost_scan,),
        ),
        "refine": (
            lambda dl, dr, l, c, a: refine_stage.multistep_refine(
                dl, dr, l, c, a, opts
            )["final"],
            (disp_l, disp_r, left, cost_scan, arms),
        ),
    }

    if refine_detail:
        disp0, occl, mism = jax.jit(
            lambda a, b: refine_stage.outlier_detection(a, b, opts)
        )(disp_l, disp_r)
        after_vote = after_interp = None
        if only is None or only & {"interp", "median", "dda"}:
            after_vote = jax.jit(
                lambda d, a, o, m: refine_stage.iterative_region_voting(
                    d, a, o, m, opts
                )
            )(disp0, arms, occl, mism)
        if only is None or only & {"median", "dda"}:
            after_interp = jax.jit(
                lambda d, l, o, m: refine_stage.proper_interpolation(
                    d, l, o, m, opts
                )
            )(after_vote, left, occl, mism)
        stages.update({
            "  lr_check": (
                lambda a, b: refine_stage.outlier_detection(a, b, opts)[0],
                (disp_l, disp_r),
            ),
            "  voting": (
                lambda d, a, o, m: refine_stage.iterative_region_voting(
                    d, a, o, m, opts
                ),
                (disp0, arms, occl, mism),
            ),
            "  interp": (
                lambda d, l, o, m: refine_stage.proper_interpolation(
                    d, l, o, m, opts
                ),
                (after_vote, left, occl, mism),
            ),
            "  median": (
                lambda d: refine_stage.median_filter_3x3(d),
                (after_interp,),
            ),
            "  dda": (
                lambda d, c: refine_stage.depth_discontinuity_adjustment(
                    d, c, opts
                ),
                (after_interp, cost_scan),
            ),
        })

    def looped(fn, n):
        @jax.jit
        def run(*args):
            def body(_, carry):
                acc, args_b = carry
                args_b = jax.lax.optimization_barrier(args_b)
                out = fn(*args_b)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
                return acc, args_b
            acc, _ = jax.lax.fori_loop(
                0, n, body, (jnp.float32(0.0), args)
            )
            return acc
        return run

    # RPC floor: a null round-trip for reference
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.float32(0)))
    rpc = time.perf_counter() - t0

    total = 0.0
    results = {}
    print(f"{pair_name} {w}x{h} D={opts.disp_range}  iters={iters}  "
          f"(rpc floor ~{rpc * 1e3:.0f} ms)")
    for name, (fn, args) in stages.items():
        if only is not None and name.strip() not in only:
            continue
        run = looped(fn, iters)
        np.asarray(run(*args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(*args))
        dt = (time.perf_counter() - t0) / iters
        if not name.startswith(" "):  # detail rows don't re-count
            total += dt
        results[name.strip()] = dt * 1e3
        print(f"{name:>10}: {dt * 1e3:8.2f} ms   "
              f"{work / dt / 1e6:9.1f} Mpix*disp/s")
    print(f"{'sum':>10}: {total * 1e3:8.2f} ms   "
          f"{work / total / 1e6:9.1f} Mpix*disp/s")
    if json_path:
        import json

        payload = {
            "pair": pair_name, "h": h, "w": w,
            "d": opts.disp_range, "iters": iters,
            "stage_ms": results, "sum_ms": total * 1e3,
        }
        prev = {}
        if os.path.exists(json_path):
            try:
                prev = json.load(open(json_path))
            except Exception:
                prev = {}
            # merge per-stage rows measured across invocations
            old = prev.get(pair_name, {}).get("stage_ms", {})
            old.update(payload["stage_ms"])
            payload["stage_ms"] = old
        prev[pair_name] = payload
        json.dump(prev, open(json_path, "w"), indent=1)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    main()
