"""Command-line interface, mirroring the reference app (main.cpp:26-145).

Usage:
    python -m adcensus_tpu.cli LEFT.png RIGHT.png [MIN_DISP] [MAX_DISP]
    python -m adcensus_tpu.cli --pair Cone          # bundled dataset mode

Saves LEFT-d.png (normalized gray) and LEFT-c.png (JET colormap) beside the
output prefix, like SaveDisparityMap (main.cpp:180-210), prints per-stage
timings and, when ground truth is available, bad-delta metrics.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

from adcensus_tpu.config import ADCensusOptions
from adcensus_tpu.eval.metrics import evaluate
from adcensus_tpu.io.image import (
    get_pair,
    load_image_rgb,
    save_disparity_map,
)
from adcensus_tpu.stages.pipeline import match


def run_pair(
    left: np.ndarray,
    right: np.ndarray,
    opts: ADCensusOptions,
    out_prefix: str | None = None,
    gt: np.ndarray | None = None,
    verbose: bool = True,
    gray_mode: str = "device",
    use_pallas: bool | None = None,
):
    h, w, _ = left.shape
    if verbose:
        print(f"w = {w}, h = {h}, d = [{opts.min_disparity},{opts.max_disparity}]")
    t0 = time.perf_counter()
    res = match(left, right, opts, gray_mode=gray_mode, use_pallas=use_pallas)
    t1 = time.perf_counter()
    disp = res["disparity"]
    mpix_ds = h * w * opts.disp_range / (t1 - t0) / 1e6
    if verbose:
        print(f"match: {t1 - t0:.3f} s  ({mpix_ds:.1f} Mpix*disp/s, incl. compile on first call)")
    metrics = evaluate(disp, gt)
    if verbose:
        print(json.dumps(metrics, indent=2))
    if out_prefix:
        save_disparity_map(disp, out_prefix)
    return disp, metrics, t1 - t0


def main() -> None:
    # honor JAX_PLATFORMS even under the axon sitecustomize, which
    # registers the TPU backend at interpreter start and would otherwise
    # silently override the env var (JAX_PLATFORMS=cpu subprocesses —
    # e.g. the CLI tests — must NOT grab the TPU tunnel)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:
            # a silent failure here means a JAX_PLATFORMS=cpu subprocess
            # could still grab the TPU tunnel — make it visible
            import sys

            print(
                f"warning: could not apply JAX_PLATFORMS={plat!r}: {e}",
                file=sys.stderr,
            )
    from adcensus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("left", nargs="?", help="left image path")
    ap.add_argument("right", nargs="?", help="right image path")
    ap.add_argument("min_disp", nargs="?", type=int, default=0)
    ap.add_argument("max_disp", nargs="?", type=int, default=64)
    ap.add_argument("--pair", help="bundled pair name (Cone/Cloth3/Wood2/Piano)")
    ap.add_argument("--out", help="output prefix (default: left image path)")
    ap.add_argument("--no-save", action="store_true")
    ap.add_argument(
        "--parity",
        action="store_true",
        help="reference-parity mode: bit-exact masked-roll kernels "
        "(use_pallas=True), host float64 grayscale, and the in-place "
        "raster-order median — matches the reference C++ output as "
        "closely as possible. Default (fast) mode uses the approximate "
        "MXU band-matmul aggregation, which can flip tie-broken "
        "disparities in textureless regions (see PARITY.md)",
    )
    ap.add_argument(
        "--backend",
        choices=("matmul", "pallas", "jnp"),
        default=None,
        help="cross-operator kernel backend. Default on TPU is 'matmul' "
        "— the fast MXU band-matmul path, which trades ~0.1 bad-2.0 "
        "on Cone (7.52 vs 7.38) for aggregation speed (f32 device "
        "gray + bf16 reassociation can flip tie-broken disparities); "
        "'pallas' and 'jnp' are the bit-exact masked-roll kernels "
        "(PARITY.md quantifies the trade per pair). Overrides the "
        "backend part of --parity",
    )
    ap.add_argument(
        "--timing",
        action="store_true",
        help="run stage-by-stage with device fences and print per-stage "
        "seconds + Mpix*disp/s (the reference's per-stage printf, "
        "ADCensusStereo.cpp:81-129, done the TPU way)",
    )
    ap.add_argument(
        "--dump-stages",
        metavar="PATH.npz",
        help="save every intermediate volume/map to an npz for debugging",
    )
    ap.add_argument(
        "--cloud",
        metavar="PATH.txt",
        help="save a point cloud (x,y,d,r,g,b) like SaveDisparityCloud "
        "(main.cpp:212-230)",
    )
    # every remaining ADCensusOption tunable (adcensus_types.h:45-75) as a
    # flag; None means "keep the reference default"
    tunables = [
        f
        for f in dataclasses.fields(ADCensusOptions)
        if f.name not in ("min_disparity", "max_disparity")
    ]
    grp = ap.add_argument_group("pipeline tunables (reference defaults)")
    for f in tunables:
        flag = "--" + f.name.replace("_", "-").lower()
        if f.type == "bool":
            grp.add_argument(
                flag,
                dest=f.name,
                action=argparse.BooleanOptionalAction,
                default=None,
                help=f"(default: {f.default})",
            )
        else:
            grp.add_argument(
                flag,
                dest=f.name,
                type=float if f.type == "float" else int,
                default=None,
                help=f"(default: {f.default})",
            )
    args = ap.parse_args()

    if args.pair:
        try:
            pair = get_pair(args.pair)
        except ValueError as e:
            ap.error(str(e))
        left, right, gt = pair.load()
        # with --pair the two leading positionals (if present) are the
        # disparity range, overriding the bundled d_range.txt:
        #   cli --pair Piano 0 256
        try:
            dmin = int(args.left) if args.left is not None else pair.dmin
            dmax = int(args.right) if args.right is not None else pair.dmax
        except ValueError:
            ap.error("--pair takes an optional MIN_DISP MAX_DISP override")
        opts = ADCensusOptions(min_disparity=dmin, max_disparity=dmax)
        prefix = args.out or os.path.join("out", pair.name)
    else:
        if not (args.left and args.right):
            ap.error("provide LEFT RIGHT paths or --pair NAME")
        left = load_image_rgb(args.left)
        right = load_image_rgb(args.right)
        gt = None
        opts = ADCensusOptions(
            min_disparity=args.min_disp, max_disparity=args.max_disp
        )
        prefix = args.out or args.left
    overrides = {
        f.name: getattr(args, f.name)
        for f in tunables
        if getattr(args, f.name) is not None
    }
    if overrides:
        opts = dataclasses.replace(opts, **overrides)
    if args.parity and "exact_median" not in overrides:
        opts = dataclasses.replace(opts, exact_median=True)
    use_pallas = args.backend or (True if args.parity else None)
    gray_mode = "host64" if args.parity else "device"
    opts.validate()
    if left.shape != right.shape:
        raise SystemExit("left/right image sizes differ")
    if not args.no_save:
        os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)

    if args.timing or args.dump_stages:
        from adcensus_tpu.utils.profiling import match_staged

        res = match_staged(
            left, right, opts, use_pallas=use_pallas,
            dump_path=args.dump_stages,
        )
        for k, t in res["timings"].items():
            thr = res["throughput"].get(k, 0.0)
            print(f"{k:>12}: {t * 1000:8.2f} ms   {thr:9.1f} Mpix*disp/s")
        disp = res["disparity"]
        print(json.dumps(evaluate(disp, gt), indent=2))
        if not args.no_save:
            save_disparity_map(disp, prefix)
    else:
        disp, _, _ = run_pair(
            left, right, opts, None if args.no_save else prefix, gt,
            gray_mode=gray_mode, use_pallas=use_pallas,
        )
    if args.cloud:
        from adcensus_tpu.io.image import save_disparity_cloud

        save_disparity_cloud(left, disp, args.cloud)


if __name__ == "__main__":
    main()
