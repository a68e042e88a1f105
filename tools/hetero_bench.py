"""Measure BASELINE config 3 as written: a heterogeneous Wood2 + Cone
batched stream — two pairs of different shapes AND disparity ranges in
ONE jitted dispatch (`pipeline.match_hetero_device`), with the full
refinement chain, vs the same pairs as individual dispatches.

(The reference handles exactly one pair per process, main.cpp:34-145;
this program is the serving shape the reference cannot express.)

Prints one JSON line with per-dispatch and per-pair timings, the
equality check against the per-pair engine, and bad-2.0 vs ground
truth for both pairs; give `--md` to also print the BENCH_DETAIL /
PARITY table row.

Usage: python tools/hetero_bench.py [--iters 10] [--md]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--md", action="store_true",
                    help="also print the markdown table row")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.eval.metrics import evaluate
    from adcensus_tpu.io.image import get_pair
    from adcensus_tpu.stages import pipeline
    from adcensus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    pairs_np, opts_seq, gts, names = [], [], [], []
    for name in ("Wood2", "Cone"):
        p = get_pair(name)
        left, right, gt = p.load()
        pairs_np.append((left, right))
        opts_seq.append(
            ADCensusOptions(min_disparity=p.dmin, max_disparity=p.dmax)
        )
        gts.append(gt)
        names.append(name)
    opts_seq = tuple(opts_seq)
    pairs = tuple(
        (jax.device_put(jnp.asarray(l)), jax.device_put(jnp.asarray(r)))
        for l, r in pairs_np
    )

    # warm both programs; NOTE block_until_ready does not fence over the
    # axon tunnel — only device->host transfers do, hence np.asarray
    outs = pipeline.match_hetero_device(pairs, opts_seq)
    outs_np = [np.asarray(o) for o in outs]
    singles = [
        np.asarray(pipeline.match_device(l, r, o))
        for (l, r), o in zip(pairs, opts_seq)
    ]

    res = {"pairs": names, "iters": args.iters}
    for nm, got, ref, gt, (l, _), o in zip(
        names, outs_np, singles, gts, pairs_np, opts_seq
    ):
        assert np.array_equal(np.isfinite(got), np.isfinite(ref)), nm
        m = np.isfinite(ref)
        res[f"{nm}_max_abs_vs_single"] = float(
            np.abs(got[m] - ref[m]).max()
        )
        met = evaluate(got, gt)
        res[f"{nm}_bad_2_0_pct"] = round(met["bad_2_0_pct"], 3)
        h, w, _ = l.shape
        res[f"{nm}_mpixd"] = h * w * o.disp_range / 1e6

    # amortized hetero dispatch: queue iters, fetch the last
    t0 = time.perf_counter()
    for _ in range(args.iters):
        outs = pipeline.match_hetero_device(pairs, opts_seq)
    _ = [np.asarray(o) for o in outs]
    hetero_s = (time.perf_counter() - t0) / args.iters
    res["hetero_dispatch_s"] = round(hetero_s, 4)

    # the same stream as two individual dispatches per iteration
    t0 = time.perf_counter()
    for _ in range(args.iters):
        singles_o = [
            pipeline.match_device(l, r, o)
            for (l, r), o in zip(pairs, opts_seq)
        ]
    _ = [np.asarray(o) for o in singles_o]
    res["two_dispatch_s"] = round((time.perf_counter() - t0) / args.iters, 4)

    total_mpixd = sum(res[f"{nm}_mpixd"] for nm in names)
    res["hetero_mpixd_per_s"] = round(total_mpixd / hetero_s, 1)
    print(json.dumps(res), flush=True)

    if args.md:
        print(
            "| Wood2+Cone hetero batch (1 dispatch) | "
            f"{res['hetero_dispatch_s'] * 1e3:.2f} ms | "
            f"{res['hetero_mpixd_per_s']:.0f} Mpix·disp/s | "
            f"Wood2 bad-2.0 {res['Wood2_bad_2_0_pct']} / Cone "
            f"{res['Cone_bad_2_0_pct']} | == per-pair dispatches "
            f"(max |Δ| {max(res['Wood2_max_abs_vs_single'], res['Cone_max_abs_vs_single']):.1e}) |"
        )


if __name__ == "__main__":
    main()
