"""Per-stage roofline accounting: how far is each stage from the
hardware's speed of light (TPU v5e: 819 GB/s HBM, 197 bf16 TFLOP/s,
394 int8 TOP/s)?

The pipeline is HBM-bound end to end (the cost volume dwarfs on-chip
memory), so the primary figure per stage is **achieved HBM GB/s vs
peak**, from an analytic minimum-traffic model: every principal array a
stage reads/writes at stage granularity, assuming perfect intra-stage
fusion (the compiler's job) — i.e. the model is the *floor* traffic of
the algorithm as implemented, not of some other algorithm. MXU stages
(aggregation band matmuls, voting histogram matmuls) also get a FLOP
roofline; whichever bound is higher is the stage's light-speed, and
`sol_ms` is that bound's time. Stages whose time is set by a
sequential-scan dependency (scanline DP, interpolation ray march,
exact median) are labeled latency-bound: their gap to the byte roofline
is architectural (step count), not missing bandwidth.

Usage:
  python tools/stage_bench.py Cone 50 --refine-detail --json /tmp/sb.json
  python tools/roofline.py /tmp/sb.json            # markdown to stdout

Traffic model notes (bytes, per match; P = H*W, DP = D*P, arm = 34,
band = 2*arm+1):
  cost       26*DP: per-d streamed census_l/r (2x8B) + color_l/r (2x3B)
             reads + 4B f32 volume write (cost_computor.cpp:82-121
             equivalent).
  arms       P*(2*3*band + 16): the cumulative-AND window re-streams
             the color image ~band times per direction pairwise; 4xu8
             arm write + i32 artifacts. VPU select-chain bound.
  aggregate  4 iters x [bandH(2*H*W^2 bf16) + bandV(2*W*H^2) + 32*DP
             volume moves (f32 in/out + 2-term bf16 stacked concat
             write+read per pass)]. MXU flops 4*2*2*2D*(H*W^2+W*H^2).
  scanline   4 passes x (4DP read + 4DP write) + penalty codes ~2*DP.
             Sequential-grid DP: W (or H) dependent steps per pass.
  wta        2 volume reads (left scan + right shear scan) = 8*DP.
  lr_check   ~3 passes of (D+2) masked-shift selects over f32 maps:
             12*P*(D+2) upper bound; mostly register-resident.
  voting     10 phases x [bandH(H*W^2 int8) + bandV(W*H^2) + ~6*DP
             (one-hot write/read + int8 tmp + int16 hist)].
             int8 MXU flops 10*2*D*P*(W+H).
  interp     2 phases x ~11*P (maps resident in VMEM); ray-march
             step-latency bound.
  median     ~8*P fused shifted reads + write.
"""
from __future__ import annotations

import json
import sys

HBM_GBS = 819.0
BF16_TFLOPS = 197.0
INT8_TOPS = 394.0
ARM = 34
BAND = 2 * ARM + 1


def stage_models(h: int, w: int, d: int) -> dict:
    P = h * w
    DP = d * P
    return {
        "cost": {"bytes": 26 * DP, "class": "HBM"},
        "arms": {"bytes": P * (6 * BAND + 16), "class": "VPU"},
        "aggregate": {
            "bytes": 4 * (2 * h * w * w + 2 * w * h * h + 32 * DP),
            "flops_bf16": 4 * 2 * 2 * 2 * d * (h * w * w + w * h * h),
            "class": "HBM+MXU",
        },
        "scanline": {"bytes": 32 * DP + 2 * DP, "class": "latency"},
        "wta": {"bytes": 8 * DP, "class": "HBM"},
        "lr_check": {"bytes": 12 * P * (d + 2), "class": "VPU"},
        "voting": {
            "bytes": 10 * (h * w * w + w * h * h + 6 * DP),
            # int8 MACs: 10 phases x (h-pass D*P*W + v-pass D*P*H)
            "flops_int8": 10 * 2 * (DP * w + DP * h),
            "class": "HBM+MXU",
        },
        "interp": {"bytes": 2 * 11 * P, "class": "latency"},
        "median": {"bytes": 8 * P, "class": "HBM"},
    }


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stage_bench.json"
    data = json.load(open(path))
    for pair, rec in data.items():
        h, w, d = rec["h"], rec["w"], rec["d"]
        models = stage_models(h, w, d)
        print(f"\n### {pair} {w}x{h} D={d}\n")
        print("| stage | ms | model GB | GB/s | %HBM | SoL ms | bound |")
        print("|---|---|---|---|---|---|---|")
        top_gap, top_name = 0.0, ""
        for name, ms in rec["stage_ms"].items():
            m = models.get(name)
            if m is None:
                continue
            gb = m["bytes"] / 1e9
            gbs = gb / (ms / 1e3)
            pct = 100.0 * gbs / HBM_GBS
            sol_hbm = m["bytes"] / (HBM_GBS * 1e9) * 1e3
            sol = sol_hbm
            if "flops_bf16" in m:
                sol = max(sol, m["flops_bf16"] / (BF16_TFLOPS * 1e12) * 1e3)
            if "flops_int8" in m:
                sol = max(sol, m["flops_int8"] / (INT8_TOPS * 1e12) * 1e3)
            gap = ms - sol
            if m["class"] in ("HBM", "HBM+MXU") and gap > top_gap:
                top_gap, top_name = gap, name
            print(
                f"| {name} | {ms:.2f} | {gb:.2f} | {gbs:.0f} |"
                f" {pct:.0f}% | {sol:.2f} | {m['class']} |"
            )
        if top_name:
            print(
                f"\nTop roofline gap (HBM-bound rows): **{top_name}**, "
                f"{top_gap:.2f} ms above its model floor."
            )


if __name__ == "__main__":
    main()
