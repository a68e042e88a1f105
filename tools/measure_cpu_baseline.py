"""Build + run the reference C++ implementation to establish the CPU
baseline (the reference publishes no numbers — SURVEY.md §6 / BASELINE.md).

The reference sources are compiled *in place* from /root/reference into the
gitignored .oracle/ directory with tools/oracle_main.cpp as the I/O shim.
Outputs:
  * BASELINE_MEASURED.json — per-pair seconds, Mpix*disp/s, bad-2.0 vs GT
  * tests/golden/<pair>_disp.npz — the reference disparity maps, used as
    exact-parity goldens by the test suite
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(ROOT, ".oracle")
ORACLE_BIN = os.path.join(ORACLE_DIR, "adcensus_oracle")
REF = "/root/reference/AD-Census"

SOURCES = [
    "ADCensusStereo.cpp",
    "adcensus_util.cpp",
    "cost_computor.cpp",
    "cross_aggregator.cpp",
    "scanline_optimizer.cpp",
    "multistep_refiner.cpp",
]


def build() -> None:
    os.makedirs(ORACLE_DIR, exist_ok=True)
    cmd = (
        ["g++", "-O3", "-march=native", "-std=c++17", f"-I{REF}",
         "-include", "cstdio", "-include", "cstring",
         "-include", "math.h", "-include", "algorithm",
         os.path.join(ROOT, "tools", "oracle_main.cpp")]
        + [os.path.join(REF, s) for s in SOURCES]
        + ["-o", ORACLE_BIN]
    )
    subprocess.run(cmd, check=True)


def run_pair(name: str, repeats: int = 3, dmin=None, dmax=None,
             label=None):
    from adcensus_tpu.eval.metrics import evaluate
    from adcensus_tpu.io.image import get_pair

    pair = get_pair(name)
    if dmin is not None or dmax is not None:
        import dataclasses

        pair = dataclasses.replace(
            pair,
            dmin=pair.dmin if dmin is None else dmin,
            dmax=pair.dmax if dmax is None else dmax,
        )
    label = label or name
    left, right, gt = pair.load()
    h, w, _ = left.shape
    # the reference consumes interleaved BGR bytes (main.cpp:65-76)
    lb = left[..., ::-1].tobytes()
    rb = right[..., ::-1].tobytes()
    lpath = os.path.join(ORACLE_DIR, f"{name}_l.bgr")
    rpath = os.path.join(ORACLE_DIR, f"{name}_r.bgr")
    opath = os.path.join(ORACLE_DIR, f"{name}_d.f32")
    open(lpath, "wb").write(lb)
    open(rpath, "wb").write(rb)

    best = None
    for _ in range(repeats):
        out = subprocess.run(
            [ORACLE_BIN, str(w), str(h), str(pair.dmin), str(pair.dmax),
             lpath, rpath, opath],
            capture_output=True, text=True, check=True,
        )
        secs = float(re.search(r"TOTAL_SECONDS ([\d.]+)", out.stdout).group(1))
        best = secs if best is None else min(best, secs)

    disp = np.fromfile(opath, dtype=np.float32).reshape(h, w)
    metrics = evaluate(disp, gt)
    work = h * w * (pair.dmax - pair.dmin)
    return {
        "pair": label,
        "h": h,
        "w": w,
        "d_range": pair.dmax - pair.dmin,
        "seconds": best,
        "mpixd_per_s": work / best / 1e6,
        **{k: round(v, 4) for k, v in metrics.items()},
    }, disp


CONFIGS = {
    # label -> (pair, dmin, dmax); None = bundled d_range.txt
    "Cone": ("Cone", None, None),
    "Cloth3": ("Cloth3", None, None),
    "Wood2": ("Wood2", None, None),
    "Piano": ("Piano", None, None),
    # BASELINE.json config 4: high-disparity Piano
    "Piano256": ("Piano", 0, 256),
}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="labels to (re)measure; others keep existing "
                    "values (measure on an IDLE machine: load corrupts "
                    "the timing baseline)")
    args = ap.parse_args()
    sys.path.insert(0, ROOT)
    build()
    golden_dir = os.path.join(ROOT, "tests", "golden")
    os.makedirs(golden_dir, exist_ok=True)
    out_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    results = {}
    if args.only and os.path.exists(out_path):
        results = json.load(open(out_path)).get("pairs", {})
    for label, (name, dmin, dmax) in CONFIGS.items():
        if args.only is not None and label not in args.only:
            continue
        r, disp = run_pair(name, dmin=dmin, dmax=dmax, label=label)
        results[label] = r
        np.savez_compressed(
            os.path.join(golden_dir, f"{label}_ref_disp.npz"),
            disparity=disp,
        )
        print(json.dumps(r))
    summary = {
        "cpu": "single-thread reference C++ (g++ -O3 -march=native)",
        "pairs": results,
    }
    cone = results.get("Cone")  # absent when --only skips Cone
    if cone is not None:
        summary["cone_seconds"] = cone["seconds"]
        summary["cone_mpixd_per_s"] = cone["mpixd_per_s"]
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print("wrote BASELINE_MEASURED.json")


if __name__ == "__main__":
    main()
