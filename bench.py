"""Benchmark harness — prints driver-parseable JSON lines incrementally.

Measures steady-state end-to-end throughput of the full AD-Census pipeline
(million pixel-disparities per second) on the bundled Cone pair, on
whatever accelerator JAX sees (real TPU under the driver).

Timeout robustness (round-2 failure: driver rc=124 with zero output):
the four measurement programs are ordered cheapest-compile-first and a
valid JSON line is printed (and flushed) as soon as EACH program's warm
measurement lands — the driver parses the LAST line, so an upgraded line
simply replaces the earlier one, and a timeout mid-run still leaves a
parseable result on stdout.  Progress goes to stderr so a hung tunnel is
diagnosable.  Programs after the first are skipped once the self-imposed
wall budget (ADC_BENCH_BUDGET_S, default 420 s) is exhausted; skipped
programs are listed in the emitted line's extra.programs_skipped.

vs_baseline compares against the measured single-thread CPU reference
baseline stored in BASELINE_MEASURED.json (produced by
tools/measure_cpu_baseline.py, which builds and times the reference C++
implementation at /root/reference); falls back to 1.0 if absent.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

T_START = time.perf_counter()
# the driver demonstrably tolerates >347 s (round-3 run, rc=0); 420 s
# leaves room for the batched program's compile instead of skipping it
BUDGET_S = float(os.environ.get("ADC_BENCH_BUDGET_S", "420"))


def log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - T_START:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _probe_tunnel() -> None:
    """Diagnose the remote-TPU (axon) tunnel BEFORE touching the JAX
    backend.  Backend init dials the terminal relay on 127.0.0.1 and, if
    the relay is down, retries in a silent sleep loop *forever* — the
    round-2 driver bench died rc=124 with zero output exactly this way.
    A refused probe can't be fixed from inside the VM, so fail fast with
    a diagnostic on stderr (the driver records the stderr tail) instead
    of hanging until the driver's timeout."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no tunnel configured (plain CPU/TPU run)
    import socket

    deadline = time.perf_counter() + float(
        os.environ.get("ADC_BENCH_TUNNEL_WAIT_S", "600")
    )
    while True:
        try:
            socket.create_connection(("127.0.0.1", 8083), timeout=5).close()
            log("axon terminal relay reachable (127.0.0.1:8083)")
            return
        except OSError as e:
            if time.perf_counter() > deadline:
                log(
                    "FATAL: axon terminal relay 127.0.0.1:8083 unreachable "
                    f"({e}) — the TPU tunnel is down on the host side; "
                    "backend init would hang forever. Exiting."
                )
                sys.exit(3)
            log(f"axon relay not up yet ({e}); retrying...")
            time.sleep(10)


def main() -> None:
    _probe_tunnel()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.eval.metrics import evaluate
    from adcensus_tpu.io.image import get_pair
    from adcensus_tpu.stages import pipeline

    log("initializing backend (first device op dials the tunnel)...")
    log(f"backend={jax.default_backend()} devices={len(jax.devices())}")

    pair = get_pair("Cone")
    left, right, gt = pair.load()
    h, w, _ = left.shape
    opts = ADCensusOptions(min_disparity=pair.dmin, max_disparity=pair.dmax)
    work = h * w * opts.disp_range  # pixel-disparities per match

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    cpu_mpixd = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            cpu_mpixd = json.load(f).get("cone_mpixd_per_s")

    state = {"best": None, "extra": {}, "skipped": set()}

    def emit(timings: dict) -> None:
        """Print one full JSON result line using the best timing so far.

        Each line is also appended to bench_lines.jsonl so the evidence
        survives even if the driver's stdout capture fails (round-2
        failure mode: rc=124 left zero driver-visible output)."""
        best = min(timings.values())
        state["best"] = best
        mpixd_s = work / best / 1e6
        vs = mpixd_s / cpu_mpixd if cpu_mpixd else 1.0
        extra = {
            "pair": "Cone",
            "seconds_per_match": round(best, 4),
            "bad_2_0_pct": round(state["extra"].get("bad_2_0_pct", -1.0), 3),
            "density_pct": round(state["extra"].get("density_pct", -1.0), 2),
            "backend": jax.default_backend(),
        }
        if "piano256_mpixd_s" in state["extra"]:
            extra["piano256_mpixd_s"] = state["extra"]["piano256_mpixd_s"]
        if state["skipped"]:
            # partial coverage is self-describing: which programs never
            # ran (budget exhaustion or failure) is on the line itself
            extra["programs_skipped"] = sorted(state["skipped"])
        extra.update({k: round(v, 4) for k, v in timings.items()})
        line = json.dumps(
            {
                "metric": "cone_throughput",
                "value": round(mpixd_s, 2),
                "unit": "Mpix*disp/s",
                "vs_baseline": round(vs, 2),
                "extra": extra,
            }
        )
        print(line, flush=True)
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_lines.jsonl"), "a"
            ) as f:
                f.write(f"{time.strftime('%Y-%m-%dT%H:%M:%S')} {line}\n")
        except OSError:
            pass  # persistence is best-effort; stdout already has the line
        log(f"emitted {mpixd_s:.1f} Mpix*disp/s ({best * 1e3:.2f} ms/match)")

    def within_budget(label: str) -> bool:
        el = time.perf_counter() - T_START
        if el > BUDGET_S:
            log(f"skip {label}: wall budget exhausted ({el:.0f}s > {BUDGET_S:.0f}s)")
            state["skipped"].add(label)
            return False
        return True

    left_d = jax.device_put(jnp.asarray(left))
    right_d = jax.device_put(jnp.asarray(right))

    timings: dict[str, float] = {}

    # ---- Program 1 (cheapest compile): single-stream dispatch ----
    # NOTE: under the remote-TPU tunnel block_until_ready() does not
    # actually fence — only a device->host transfer does — so every
    # measurement below syncs by fetching real bytes.  Queuing iters
    # dispatches and fetching only the last amortizes the ~100 ms
    # tunnel RPC latency.
    log("program 1/4: single-stream match (compiling)...")
    disp_np = np.asarray(pipeline.match_device(left_d, right_d, opts))
    log("program 1/4: compiled; measuring")
    metrics = evaluate(disp_np, gt)
    state["extra"].update(metrics)
    iters = 10
    t0 = time.perf_counter()
    outs = [pipeline.match_device(left_d, right_d, opts) for _ in range(iters)]
    single_np = np.asarray(outs[-1])
    timings["single_stream_s"] = (time.perf_counter() - t0) / iters
    emit(timings)

    def _same(a, b):
        # fusion reassociation wiggles floats below 1e-4
        if not np.array_equal(np.isfinite(a), np.isfinite(b)):
            return False
        m = np.isfinite(a)
        return bool(np.all(np.abs(a[m] - b[m]) <= 1e-3))

    assert _same(single_np, disp_np)

    # ---- Program 2: device-amortized fori loop ----
    # N matches inside ONE jitted fori_loop (an optimization_barrier
    # re-ties the inputs each iteration so XLA cannot hoist the
    # loop-invariant match out); removes per-dispatch RPC entirely.
    if within_budget("amortized"):
        log("program 2/4: amortized fori-loop match (compiling)...")
        N = 20

        @jax.jit
        def run_n(l, r):
            def body(_, carry):
                acc, lr = carry
                lb, rb = jax.lax.optimization_barrier(lr)
                d = pipeline.match_device(lb, rb, opts)
                return acc + d.ravel()[0], lr

            acc, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0.0), (l, r)))
            return acc

        np.asarray(run_n(left_d, right_d))  # compile + warm
        log("program 2/4: compiled; measuring")
        t0 = time.perf_counter()
        np.asarray(run_n(left_d, right_d))
        timings["device_amortized_s"] = (time.perf_counter() - t0) / N
        emit(timings)

    # ---- Program 3: batched B=8 (BASELINE config 3's serving shape) ----
    # B pairs per dispatch. Runs BEFORE Piano256: in rounds 2-3 this
    # program was skipped on budget in every driver run, so the batched
    # number had no driver-visible evidence — it now gets the earlier
    # slot (its compile also reuses program 1/2's cached pipeline trace
    # shapes more often than Piano256's D=256 program does).
    if within_budget("batched"):
        log("program 3/4: batched B=8 match (compiling)...")
        B = 8
        lefts = jax.device_put(jnp.broadcast_to(left_d, (B,) + left_d.shape))
        rights = jax.device_put(jnp.broadcast_to(right_d, (B,) + right_d.shape))
        batch_np = np.asarray(
            pipeline.match_batched_device(lefts, rights, opts)
        )  # warm-up + equality check
        assert _same(batch_np[0], disp_np)

        # Device-amortize exactly like program 2: reps batched matches
        # inside ONE jitted fori_loop, so the ~100 ms tunnel RTT is paid
        # once per measurement instead of once per dispatch (round-4's
        # 3-dispatch loop read 24.3 ms/pair — ~2x pure device time —
        # because each un-amortized dispatch carried the RPC overhead).
        reps = 3

        @jax.jit
        def run_batched(l, r):
            def body(_, carry):
                acc, lr = carry
                lb, rb = jax.lax.optimization_barrier(lr)
                d = pipeline.match_batched_device(lb, rb, opts)
                # force ONE element of EVERY pair's output: d[0,0,0]
                # alone lets XLA dead-code-eliminate the other B-1
                # statically-unrolled pipelines (measured: 3.0 "ms/pair"
                # vs the real 5.9)
                return acc + jnp.sum(d[:, 0, 0]), lr

            acc, _ = jax.lax.fori_loop(
                0, reps, body, (jnp.float32(0.0), (l, r))
            )
            return acc

        np.asarray(run_batched(lefts, rights))  # compile + warm
        log("program 3/4: compiled; measuring")
        t0 = time.perf_counter()
        np.asarray(run_batched(lefts, rights))
        timings["batched_s_per_pair"] = (time.perf_counter() - t0) / (reps * B)
        emit(timings)

    # ---- Program 4 (separate pair, biggest volume): Piano256 ----
    # BASELINE config 4 (memory-stress: 707x481, D=256). Its result
    # rides in the `extra` dict of the re-emitted cone line, so the
    # driver-parsed tail line keeps the cone_throughput contract while
    # recording the memory-stress number.
    if within_budget("piano256"):
        log("program 4/4: Piano256 single-stream (compiling)...")
        try:
            p_pair = get_pair("Piano")
            p_left, p_right, _ = p_pair.load()
            p_opts = ADCensusOptions(min_disparity=0, max_disparity=256)
            pl = jax.device_put(jnp.asarray(p_left))
            pr = jax.device_put(jnp.asarray(p_right))
            np.asarray(pipeline.match_device(pl, pr, p_opts))  # warm
            log("program 4/4: compiled; measuring")
            it = 5
            t0 = time.perf_counter()
            outs_p = [
                pipeline.match_device(pl, pr, p_opts) for _ in range(it)
            ]
            np.asarray(outs_p[-1])
            p_s = (time.perf_counter() - t0) / it
            ph, pw, _ = p_left.shape
            state["extra"]["piano256_mpixd_s"] = round(
                ph * pw * 256 / p_s / 1e6, 1
            )
            emit(timings)
        except Exception as e:  # HBM pressure must not kill the cone line
            log(f"program 4 failed (non-fatal): {type(e).__name__}: {e}")

    if state["skipped"]:
        emit(timings)  # refresh the tail line with programs_skipped
    log("done")


if __name__ == "__main__":
    main()
