"""Diagnose the Wood2 scanline regression (round-2 VERDICT weak #4).

BENCH_DETAIL.md: Wood2 (653x555 D=128) scanline is ~16.2 ms vs Cloth3
(626x555 D=128) ~8.8 ms — an +83 % gap where the volume-ratio model
predicts +12 % (only the vertical passes' lane axis W pads 653->768 vs
626->640). This probe separates the candidate costs on the real chip:

* per-direction pass times (x fwd/bwd, y fwd/bwd) for both shapes;
* kernel-only vs transpose-only time (scanline_pass_sdp on
  pre-transposed data vs the _to_sdp/_from_sdp transposes alone);
* explicit W pre-padding variants (e.g. 656/704/768) — padding paths
  are independent in the DP, so y passes just slice the result; x
  passes mark the pad steps via valid_s flags.

Usage: python tools/scanline_probe.py [iters] [--widths 653 704 768]
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
    # TPU backend at interpreter start) — the --smoke path must not
    # dial the tunnel
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from adcensus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.stages import scanline as scan_stage
    from adcensus_tpu.ops.scanline_pallas import scanline_pass_sdp

    argv = sys.argv[1:]
    widths = [653, 656, 704, 768]
    if "--widths" in argv:
        i = argv.index("--widths")
        widths = [int(x) for x in argv[i + 1 :]]
        argv = argv[:i]
    # sections: pass (per-direction), kernel (kernel vs transpose), pad
    # (explicit pre-pad variants) — compiles through the tunnel cost
    # minutes each, so runs usually pick one section at a time
    sections = {"pass", "kernel", "pad"}
    if "--sections" in argv:
        i = argv.index("--sections")
        sections = set(argv[i + 1].split(","))
        argv = argv[: i] + argv[i + 2 :]
    ref_widths = None  # pass/kernel sections' widths (default both)
    if "--ref-widths" in argv:
        i = argv.index("--ref-widths")
        j = i + 1
        ref_widths = []
        while j < len(argv) and argv[j].isdigit():
            ref_widths.append(int(argv[j]))
            j += 1
        argv = argv[:i] + argv[j:]
    geom = None  # --geom H D W: probe an arbitrary shape's 4-pass stage
    if "--geom" in argv:
        i = argv.index("--geom")
        geom = tuple(int(x) for x in argv[i + 1 : i + 4])
        argv = argv[:i] + argv[i + 4 :]
    smoke = "--smoke" in argv
    argv = [a for a in argv if a != "--smoke"]
    iters = int(argv[0]) if argv else 30

    H, D = 555, 128
    w_a, w_b = 626, 653  # Cloth3 / Wood2 widths
    if geom:
        H, D, w_b = geom
        w_a = w_b
    if smoke:  # CPU syntax/shape check: tiny shapes, jnp backend sizes
        H, D, iters = 32, 8, 2
        w_a, w_b = 29, 37
        widths = [37, 40]
    opts = ADCensusOptions(min_disparity=0, max_disparity=D)
    rng = np.random.default_rng(0)

    def looped(fn, n, *args):
        @jax.jit
        def run(*a):
            def body(_, carry):
                acc, ab = carry
                ab = jax.lax.optimization_barrier(ab)
                out = fn(*ab)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc + leaf.ravel()[0].astype(jnp.float32), ab
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), args))
            return acc

        np.asarray(run(*args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(*args))
        return (time.perf_counter() - t0) / n

    def mk(w):
        cost = jnp.asarray(
            rng.random((D, H, w), dtype=np.float32), jnp.float32
        )
        left = jnp.asarray(rng.integers(0, 255, (H, w, 3)), jnp.uint8)
        right = jnp.asarray(rng.integers(0, 255, (H, w, 3)), jnp.uint8)
        return cost, left, right

    rw = tuple(ref_widths) if ref_widths else (w_a, w_b)
    print(f"H={H} D={D} iters={iters}", flush=True)

    # ---- per-direction pass times at the two reference widths --------
    for w in rw if "pass" in sections else ():
        cost, left, right = mk(w)
        for axis, fwd in (("x", True), ("x", False),
                          ("y", True), ("y", False)):
            dt = looped(
                lambda c, l, r: scan_stage.scanline_pass(
                    c, l, r, opts, axis, fwd, use_pallas=True
                ),
                iters, cost, left, right,
            )
            print(f"W={w} pass {axis}{'+' if fwd else '-'}: "
                  f"{dt * 1e3:7.2f} ms", flush=True)

    # ---- kernel-only vs transpose-only (y forward) -------------------
    for w in rw if "kernel" in sections else ():
        cost, left, right = mk(w)
        code = scan_stage.penalty_code(left, right, opts, "y", True)
        flags = scan_stage._scan_flags(H, None)
        sdp_c = jnp.asarray(scan_stage._to_sdp(cost, "y"))
        sdp_k = jnp.asarray(scan_stage._to_sdp(code, "y"))
        dt_k = looped(
            lambda c, k: scanline_pass_sdp(
                c, k, flags, float(opts.so_p1), float(opts.so_p2)
            ),
            iters, sdp_c, sdp_k,
        )
        dt_t = looped(
            # barrier forces the (S, D, P) intermediate to materialize,
            # so XLA can't collapse transpose-of-transpose to identity
            lambda c: scan_stage._from_sdp(
                jax.lax.optimization_barrier(scan_stage._to_sdp(c, "y")),
                "y",
            ),
            iters, cost,
        )
        print(f"W={w} y+ kernel-only: {dt_k * 1e3:7.2f} ms   "
              f"to+from transpose: {dt_t * 1e3:7.2f} ms", flush=True)

    # ---- explicit W pre-padding variants, full 4-pass scanline -------
    if "pad" not in sections:
        return
    cost0, left0, right0 = mk(w_b)
    for wpad in widths:
        if wpad < w_b:
            continue
        pad = wpad - w_b
        cost = jnp.pad(cost0, ((0, 0), (0, 0), (0, pad)))
        left = jnp.pad(left0, ((0, 0), (0, pad), (0, 0)))
        right = jnp.pad(right0, ((0, 0), (0, pad), (0, 0)))
        valid_w = jnp.arange(wpad) < w_b if pad else None
        dt = looped(
            # lane_pad=False: the probe measures the EXPLICIT padding
            # variants; the base width must stay the raw program even
            # now that scanline_optimize lane-pads by default
            lambda c, l, r: scan_stage.scanline_optimize(
                c, l, r, opts, use_pallas=True, valid_w=valid_w,
                lane_pad=False,
            ),
            iters, cost, left, right,
        )
        print(f"W {w_b}->{wpad}: 4-pass scanline {dt * 1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
