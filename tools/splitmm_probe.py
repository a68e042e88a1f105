"""A/B the _split_mm strategies (separate matmuls vs bf16-stacked concat)
on aggregation-shaped cross passes, per bundled configuration shape.

The size-aware heuristic picks between reading the band matrix once
(stacked: materializes a terms× volume concat) and reading it terms×
(separate: no concat). Round-3 change builds the stack directly in the
mask dtype (bfloat16), halving the modeled concat bytes — this probe
measures both strategies on the real chip so the heuristic's crossover
is data, not modeling.

Usage: python tools/splitmm_probe.py [iters] [--shapes Cone Piano256]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SHAPES = {
    # name: (D, H, W)
    "Cone": (64, 375, 450),
    "Cloth3": (128, 555, 626),
    "Piano256": (256, 481, 707),
    "smoke": (8, 24, 32),  # CPU shape/syntax check
}


def main() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from adcensus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from adcensus_tpu.ops import cross_matmul as cm

    argv = sys.argv[1:]
    names = ["Cone", "Piano256"]
    if "--shapes" in argv:
        i = argv.index("--shapes")
        names = argv[i + 1 :]
        argv = argv[:i]
    iters = int(argv[0]) if argv else 30

    rng = np.random.default_rng(0)

    def looped(fn, n, *args):
        # queued-dispatch timing (bench.py program-1 style): the tunnel's
        # remote_compile 413s on fori_loop-wrapped _split_mm programs
        # (non-loop versions compile fine), so queue n dispatches and
        # fetch one scalar of the last output — the ~100 ms RPC is
        # amortized and the device executes the queue back-to-back
        run = jax.jit(lambda *a: fn(*a).ravel()[0])
        np.asarray(run(*args))  # compile + warm
        t0 = time.perf_counter()
        outs = [run(*args) for _ in range(n)]
        np.asarray(outs[-1])
        return (time.perf_counter() - t0) / n

    for name in names:
        d, h, w = SHAPES[name]
        vol = jnp.asarray(rng.random((d, h, w), np.float32))
        # plausible arms (reference default L1=34 cap), synthetic
        arms = jnp.asarray(
            rng.integers(1, 35, size=(h, w, 4)), jnp.int32
        )
        mh, mv = cm.band_masks(arms, 34)
        # force a sync: JAX dispatch is async, so an eager-op remote
        # compile failure here would otherwise be misattributed to the
        # looped jit below
        np.asarray(mh[:1, :1, :4]); np.asarray(mv[:1, :1, :4])
        print(f"{name}: masks built", flush=True)
        for strat in ("separate", "stacked"):
            # masks travel as loop ARGS: captured as closure constants
            # they get baked into the HLO and the tunnel's
            # remote_compile rejects the multi-MB body (HTTP 413)
            def one_pass(v, h_m, v_m, strat=strat):
                t = cm._split_mm(cm._mm_h, h_m, v, strategy=strat)
                return cm._split_mm(cm._mm_v, v_m, t, strategy=strat)

            dt = looped(one_pass, iters, vol, mh, mv)
            print(
                f"{name} ({d}x{h}x{w}) h+v cross pass, {strat:>9}: "
                f"{dt * 1e3:7.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
