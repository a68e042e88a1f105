"""Scaling-efficiency report: Mpix*disp/s of the sharded pipeline at
1..N-way row tiling (and batched pairs over the data axis when the
device count allows), per BASELINE.json's "scaling efficiency at 1 chip,
1 host, N>=2 hosts" requirement.

On real hardware run under the pod's launcher after
``adcensus_tpu.parallel.distributed.initialize()``; on a dev box use
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_report.py --pair Cone --tiles 1 2 4 8
(virtual CPU devices share one socket, so virtual numbers validate the
communication structure, not speedup).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pair", default="Cone")
    ap.add_argument("--tiles", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual mesh)")
    ap.add_argument("--volume-axis", default="rows",
                    choices=["rows", "disp"],
                    help="cost-volume partitioning through init+aggregation")
    ap.add_argument("--unsharded-base", action="store_true",
                    help="also time the unsharded single-chip pipeline "
                    "as the efficiency base (sharding-overhead mode)")
    ap.add_argument("--crop", type=int, nargs=2, metavar=("H", "W"),
                    help="crop the pair to HxW (virtual-mesh structure "
                    "runs: XLA CPU compiles of full-size unrolled-D "
                    "shard_map programs take tens of minutes)")
    ap.add_argument("--dmax", type=int,
                    help="override the disparity range upper bound")
    ap.add_argument("--cross-l1", type=int,
                    help="override the cross arm cap (short arms keep "
                    "XLA CPU compiles of the virtual-mesh program "
                    "tractable; same collective structure)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adcensus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.io.image import get_pair
    from adcensus_tpu.parallel.mesh import make_mesh
    from adcensus_tpu.parallel.sharded import match_sharded
    from adcensus_tpu.stages import cost as cost_stage

    pair = get_pair(args.pair)
    left, right, _ = pair.load()
    if args.crop:
        ch, cw = args.crop
        left = left[:ch, :cw]
        right = right[:ch, :cw]
    h, w, _ = left.shape
    kw = {}
    if args.cross_l1:
        kw.update(cross_L1=args.cross_l1, cross_L2=args.cross_l1 // 2)
    opts = ADCensusOptions(
        min_disparity=pair.dmin,
        max_disparity=args.dmax if args.dmax else pair.dmax,
        **kw,
    )
    work = h * w * opts.disp_range
    gl = cost_stage.compute_gray_host64(left)
    gr = cost_stage.compute_gray_host64(right)
    l, r = jnp.asarray(left), jnp.asarray(right)
    gl, gr = jnp.asarray(gl), jnp.asarray(gr)

    n_dev = len(jax.devices())
    rows = []
    base = None
    if args.unsharded_base:
        from adcensus_tpu.stages.pipeline import match_core_jit

        out = match_core_jit(l, r, gl, gr, opts)["disparity"]
        np.asarray(out)
        t0 = time.perf_counter()
        outs = [
            match_core_jit(l, r, gl, gr, opts)["disparity"]
            for _ in range(args.iters)
        ]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        base = (1, work / dt / 1e6)
        rows.append({
            "tiles": 0,
            "note": "unsharded match_core (efficiency base)",
            "seconds": round(dt, 4),
            "mpixd_per_s": round(base[1], 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    for nt in args.tiles:
        if nt > n_dev:
            print(f"# skip tile={nt}: only {n_dev} devices")
            continue
        mesh = make_mesh(n_data=1, n_tile=nt)
        va = args.volume_axis
        out = match_sharded(l, r, gl, gr, opts, mesh, volume_axis=va)
        np.asarray(out)  # compile + true fence
        t0 = time.perf_counter()
        outs = [
            match_sharded(l, r, gl, gr, opts, mesh, volume_axis=va)
            for _ in range(args.iters)
        ]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        mpixd = work / dt / 1e6
        if base is None:
            base = (nt, mpixd)
        eff = mpixd / (base[1] * nt / base[0])
        rows.append(
            {
                "tiles": nt,
                "seconds": round(dt, 4),
                "mpixd_per_s": round(mpixd, 2),
                "scaling_efficiency": round(eff, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(
        json.dumps(
            {
                "pair": args.pair,
                "h": h, "w": w, "d": opts.disp_range,
                "backend": jax.default_backend(),
                "devices": n_dev,
                "volume_axis": args.volume_axis,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
