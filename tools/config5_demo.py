"""BASELINE config 5 evidence — "Batched Middlebury-2014 full-res stream
(all pairs) sharded across N>=2 hosts, tile+disparity partitioned".

No Middlebury-2014 full-res pair is bundled (Data/ holds quarter-size
pairs; the 2014 PFM *format* support lives in io/image.py), and only one
TPU chip is reachable, so this tool produces the strongest honest
evidence chain (round-2 VERDICT #5):

1. **Memory math** (SURVEY §3.1): at full-res 2014 scale (≈2828×1924,
   D=256) the pipeline's working set exceeds one v5e's 16 GB HBM →
   the disp/tile-partitioned N>=2 program is *forced*, not optional.
2. **Full-res ingestion**: synthesizes a full-res pair with known
   planar ground truth at identical shape/dtype to the 2014 sets,
   round-trips the GT through the PFM writer/reader
   (io/image.py:save_pfm/load_pfm) — the exact ingestion path a real
   MiddEval3 download would use.
3. **Compile-check at full shape**: lowers + compiles the real 8-way
   (and 2-way) `match_sharded(volume_axis="disp")` program on a forced
   8-device CPU mesh. Compilation validates the sharding, halo, and
   reshard collectives at the true shapes; execution on one CPU core is
   not attempted (it proves nothing a smaller run doesn't — the same
   program IS executed end-to-end at reduced shape by step 4 and by
   tests/test_sharded.py).
4. **Batched multi-pair stream, executed**: runs
   `match_sharded_batched` (data×tile mesh, disp layout) on a stream of
   quarter-res-scale pairs and checks every output against the
   unsharded engine.

Writes CONFIG5.json; the summary table goes into SCALING.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FULL_H, FULL_W, FULL_D = 1924, 2828, 256  # MiddEval3 full-res scale
HBM_BYTES = 16 * 1024**3  # TPU v5e


def memory_math() -> dict:
    """Peak working-set estimate per chip for the disp-partitioned
    pipeline at full-res 2014 scale, vs n chips."""
    vol = FULL_D * FULL_H * FULL_W * 4  # one (D, H, W) f32 volume
    # replicated 2-D state per chip (images u8×2, gray u8×2, census
    # 2×u32×2, arms 4×i32 (+halo rows), sup 2×i32, 8 path-dist planes
    # i32): ≈ 4 + 16 + 16 + 8 + 32 bytes/pixel ≈ 76 B/px
    plane = FULL_H * FULL_W
    replicated = plane * 76
    rows = {}
    for n in (1, 2, 4, 8):
        # peak live volumes per shard: the scanline ping-pong holds two
        # full-D row-slab volumes plus the penalty-code volume (u8) and
        # the all_to_all source — ≈ 3 f32 shard-volumes is the measured
        # shape of the single-chip program's peak
        per_shard = 3 * vol // n + replicated
        rows[n] = {
            "shard_volume_gb": round(vol / n / 1024**3, 2),
            "peak_estimate_gb": round(per_shard / 1024**3, 2),
            "fits_v5e_16gb": per_shard < HBM_BYTES * 0.9,  # 10% headroom
        }
    return {
        "full_res": [FULL_H, FULL_W],
        "d": FULL_D,
        "volume_gb": round(vol / 1024**3, 2),
        "per_chip": rows,
    }


def synthesize_fullres(h=FULL_H, w=FULL_W, dmax=FULL_D, seed=0):
    """Full-res pair with known planar disparity: left is a smooth
    random texture, right is left warped by a slanted-plane disparity
    field (d ∈ [16, dmax-16]), both uint8 RGB like a decoded 2014 PNG."""
    rng = np.random.default_rng(seed)
    # smooth texture: upsampled low-res noise (keeps matching well-posed)
    small = rng.integers(0, 255, size=(h // 16 + 2, w // 16 + 2, 3))
    ys = np.linspace(0, small.shape[0] - 1.001, h)
    xs = np.linspace(0, small.shape[1] - 1.001, w)
    y0, x0 = np.floor(ys).astype(int), np.floor(xs).astype(int)
    fy, fx = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    tl = small[y0][:, x0]
    tr = small[y0][:, x0 + 1]
    bl = small[y0 + 1][:, x0]
    br = small[y0 + 1][:, x0 + 1]
    left = ((tl * (1 - fx) + tr * fx) * (1 - fy)
            + (bl * (1 - fx) + br * fx) * fy)
    left = left.astype(np.uint8)

    yy = np.arange(h)[:, None]
    xx = np.arange(w)[None, :]
    gt = 16 + (dmax - 32) * (0.3 * xx / w + 0.2 * yy / h + 0.25)
    gt = gt.astype(np.float32)

    # right[y, x - d] = left[y, x]
    xr = xx - np.round(gt).astype(int)
    right = np.zeros_like(left)
    valid = (xr >= 0) & (xr < w)
    right[yy.repeat(w, 1)[valid], xr[valid]] = left[
        yy.repeat(w, 1)[valid], xx.repeat(h, 0)[valid]
    ]
    return left, right, gt


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    xla = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla:
        os.environ["XLA_FLAGS"] = (
            xla + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as e:
        print(f"warning: could not pin cpu: {e}", file=sys.stderr)
    from adcensus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.io.image import load_pfm, save_pfm
    from adcensus_tpu.parallel.sharded import (
        match_sharded,
        match_sharded_batched,
    )
    from adcensus_tpu.stages import cost as cost_stage
    from adcensus_tpu.stages import pipeline

    out: dict = {"memory_math": memory_math()}
    print(json.dumps(out["memory_math"]), flush=True)

    # --scale S: synthesize at (FULL_H//S, FULL_W//S) keeping D=256 —
    # compile-scaling evidence when the full-res XLA *CPU* compile
    # exceeds host RAM (measured: n=2 OOM-killed at 130 GB RSS, n=8 at
    # 125 GB, n=8 with constant folding disabled bad_alloc at a 110 GB
    # cap — the compiler's host memory, not the program: lower()
    # succeeds at full shape for both n). Scaled rows are keyed
    # "n@HxW" so full-res rows stay canonical.
    scale = 1
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])

    # ---- 2. full-res synthesis + PFM ingestion round-trip -------------
    t0 = time.perf_counter()
    left, right, gt = synthesize_fullres(
        h=FULL_H // scale, w=FULL_W // scale
    )
    pfm_path = os.path.join(ROOT, ".oracle", "config5_gt.pfm")
    os.makedirs(os.path.dirname(pfm_path), exist_ok=True)
    save_pfm(gt, pfm_path)
    gt_rt = load_pfm(pfm_path)
    assert gt_rt.shape == gt.shape and np.array_equal(gt_rt, gt), (
        "PFM round-trip mismatch"
    )
    syn_key = (
        "fullres_synthesis" if scale == 1 else f"synthesis_scale{scale}"
    )
    out[syn_key] = {
        "shape": list(left.shape),
        "pfm_roundtrip_exact": True,
        "seconds": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out[syn_key]), flush=True)

    opts = ADCensusOptions(min_disparity=0, max_disparity=FULL_D)
    devs = np.array(jax.devices()[:8])

    # ---- 3. compile-check the full-res disp-partitioned program -------
    gl = cost_stage.compute_gray_host64(left)
    gr = cost_stage.compute_gray_host64(right)
    compile_rows = {}
    # the full-res XLA CPU compiles take >1.5 h each on this box's ONE
    # core — allow running/re-running one n at a time (--ns 8) and merge
    # into an existing CONFIG5.json
    ns = (2, 8)
    if "--ns" in sys.argv:
        i = sys.argv.index("--ns")
        arg = sys.argv[i + 1]
        # --ns none: skip the full-res compile checks (stream-only pass;
        # the >1.5 h one-core compiles run in a separate invocation)
        ns = () if arg == "none" else tuple(int(x) for x in arg.split(","))
    prev_path = os.path.join(ROOT, "CONFIG5.json")
    prev = {}
    if os.path.exists(prev_path):
        try:
            prev = json.load(open(prev_path))
            compile_rows.update(
                prev.get("fullres_compile_check", {})
            )
            if ns:
                # a real compile pass supersedes a recorded deferral
                compile_rows.pop("skipped", None)
            # keep every other recorded section (full-res synthesis,
            # prior-scale synthesis rows, compile_attempt notes, the
            # executed batched stream) — _checkpoint() rewrites the
            # whole file, so anything not carried here is lost on the
            # next mid-compile checkpoint
            for k, v in prev.items():
                if k != "fullres_compile_check":
                    out.setdefault(k, v)
        except Exception:
            pass
    def _checkpoint():
        out["fullres_compile_check"] = compile_rows
        json.dump(out, open(prev_path, "w"), indent=1)

    hh, ww = left.shape[:2]
    for n in ns:
        key = str(n) if scale == 1 else f"{n}@{hh}x{ww}"
        mesh = Mesh(devs[:n].reshape(n), ("tile",))
        t0 = time.perf_counter()
        lowered = match_sharded.lower(
            jnp.asarray(left), jnp.asarray(right),
            jnp.asarray(gl), jnp.asarray(gr),
            opts=opts, mesh=mesh, use_pallas=False, volume_axis="disp",
        )
        t_lower = time.perf_counter() - t0
        # persist the lower() evidence NOW: the XLA CPU compile below
        # runs >1.5 h on this one-core box and a timeout must not wipe
        # the fact that tracing/sharding at true shape succeeded
        compile_rows[key] = {"lower_s": round(t_lower, 1), "ok": "lowered"}
        _checkpoint()
        print(json.dumps({f"lower_{key}": compile_rows[key]}), flush=True)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        try:
            mem = compiled.memory_analysis()
            arg_gb = round(mem.argument_size_in_bytes / 1024**3, 3)
            tmp_gb = round(mem.temp_size_in_bytes / 1024**3, 3)
        except Exception:
            arg_gb = tmp_gb = None
        compile_rows[key] = {
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "ok": True,
            "argument_size_gb": arg_gb,
            "temp_size_gb": tmp_gb,
        }
        _checkpoint()
        print(json.dumps({f"compile_{key}": compile_rows[key]}), flush=True)
    if not ns and not compile_rows:
        # --ns none with no prior rows: make the skip self-describing
        # (an empty dict is indistinguishable from a failed run)
        compile_rows["skipped"] = (
            "--ns none: full-res compile checks deferred to a separate "
            "--ns 2,8 --skip-stream invocation (>1.5 h/config on this "
            "one-core box); this pass produced the other three sections"
        )
    out["fullres_compile_check"] = compile_rows

    if "--skip-stream" in sys.argv:
        if os.path.exists(prev_path):
            try:
                prev = json.load(open(prev_path))
                if "batched_stream" in prev:
                    out["batched_stream"] = prev["batched_stream"]
            except Exception:
                pass
        json.dump(out, open(prev_path, "w"), indent=1)
        print(f"wrote {prev_path}", file=sys.stderr)
        return

    # ---- 4. batched multi-pair stream, executed at reduced shape ------
    # quarter-res-scale stream (Piano quarter-res is 707×481 D=64; a
    # 352×288 crop keeps the one-CPU-core run inside minutes while the
    # program is the identical shard_map pipeline)
    hs, ws, ds = 288, 352, 64
    opts_s = ADCensusOptions(min_disparity=0, max_disparity=ds)
    B = 2
    lefts, rights, gls, grs = [], [], [], []
    for i in range(B):
        # fresh synthesized pairs whose disparity fits the stream's
        # d-range, so the refine tail sees a realistic dense map
        li, ri, _ = synthesize_fullres(h=hs, w=ws, dmax=ds, seed=10 + i)
        lefts.append(li)
        rights.append(ri)
        gls.append(cost_stage.compute_gray_host64(li))
        grs.append(cost_stage.compute_gray_host64(ri))
    lefts = jnp.asarray(np.stack(lefts))
    rights = jnp.asarray(np.stack(rights))
    gls_j = jnp.asarray(np.stack(gls))
    grs_j = jnp.asarray(np.stack(grs))

    mesh2 = Mesh(devs.reshape(2, 4), ("data", "tile"))
    t0 = time.perf_counter()
    disp_b = np.asarray(
        match_sharded_batched(
            lefts, rights, gls_j, grs_j, opts_s, mesh2,
            use_pallas=False, volume_axis="disp",
        )
    )
    t_stream = time.perf_counter() - t0
    max_diff = 0.0
    for i in range(B):
        ref = np.asarray(
            pipeline.match_core(
                lefts[i], rights[i], gls_j[i], grs_j[i], opts_s,
                use_pallas=False,
            )["disparity"]
        )
        both = np.isfinite(ref) & np.isfinite(disp_b[i])
        assert np.array_equal(np.isfinite(ref), np.isfinite(disp_b[i]))
        max_diff = max(max_diff, float(np.abs(disp_b[i][both] - ref[both]).max()))
    out["batched_stream"] = {
        "B": B,
        "mesh": "data=2 x tile=4",
        "shape": [hs, ws, ds],
        "volume_axis": "disp",
        "seconds_total": round(t_stream, 1),
        "max_abs_diff_vs_unsharded": max_diff,
        "ok": bool(max_diff <= 5e-5),
    }
    print(json.dumps(out["batched_stream"]), flush=True)

    path = os.path.join(ROOT, "CONFIG5.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
