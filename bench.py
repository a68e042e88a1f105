"""Benchmark harness — prints ONE JSON line for the driver.

Measures steady-state end-to-end throughput of the full AD-Census pipeline
(million pixel-disparities per second) on the bundled Cone pair, on
whatever accelerator JAX sees (real TPU under the driver).

vs_baseline compares against the measured single-thread CPU reference
baseline stored in BASELINE_MEASURED.json (produced by
tools/measure_cpu_baseline.py, which builds and times the reference C++
implementation); falls back to 1.0 if that file is absent.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.eval.metrics import evaluate
    from adcensus_tpu.io.image import get_pair
    from adcensus_tpu.stages import pipeline

    pair = get_pair("Cone")
    left, right, gt = pair.load()
    h, w, _ = left.shape
    opts = ADCensusOptions(min_disparity=pair.dmin, max_disparity=pair.dmax)
    work = h * w * opts.disp_range  # pixel-disparities per match

    # warm-up / compile
    res = pipeline.match(left, right, opts)

    iters = 5
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        res = pipeline.match(left, right, opts)
        times.append(time.perf_counter() - t0)
    best = min(times)
    mpixd_s = work / best / 1e6

    metrics = evaluate(res["disparity"], gt)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        cpu = base.get("cone_mpixd_per_s")
        if cpu:
            vs_baseline = mpixd_s / cpu

    print(
        json.dumps(
            {
                "metric": "cone_throughput",
                "value": round(mpixd_s, 2),
                "unit": "Mpix*disp/s",
                "vs_baseline": round(vs_baseline, 2),
                "extra": {
                    "pair": "Cone",
                    "seconds_per_match": round(best, 4),
                    "bad_2_0_pct": round(metrics.get("bad_2_0_pct", -1), 3),
                    "density_pct": round(metrics.get("density_pct", -1), 2),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
