// Harness for building the *reference* AD-Census implementation as a
// command-line oracle (the reference sources are compiled directly from
// /root/reference and never copied into this repo; this file is only the
// I/O shim replacing its OpenCV-based main).
//
// Usage: adcensus_oracle W H MIN_DISP MAX_DISP left.bgr right.bgr out.f32
//                        [stage_dump_prefix]
//   left.bgr/right.bgr: raw interleaved BGR bytes, H*W*3
//   out.f32: raw float32 disparities, H*W (Invalid = +inf)
// Prints per-stage timings (the reference prints its own) plus a final
// TOTAL_SECONDS line for the baseline harness to parse.
//
// With stage_dump_prefix the pipeline is driven stage by stage (instead
// of one Match() call) and the intermediate disparity maps are dumped as
// raw float32 for the parity-attribution tool (tools/parity_attribution.py):
//   <prefix>_wta_l.f32      left WTA+subpixel  (ADCensusStereo.cpp:188-243)
//   <prefix>_wta_r.f32      right WTA          (ADCensusStereo.cpp:245-310)
//   <prefix>_after_lr.f32   after OutlierDetection
//   <prefix>_after_vote.f32 after IterativeRegionVoting
//   <prefix>_after_interp.f32 after ProperInterpolation
// (the final median-filtered map goes to out.f32 as usual).
#include <algorithm>
#include <cassert>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

// Test-only shim: expose the reference's private stage methods/members so
// the attribution tool can observe the exact intermediates the sequential
// algorithm produces. The reference .cpp files are compiled unmodified;
// access specifiers do not change object layout here.
#define private public
#include "ADCensusStereo.h"
#include "adcensus_util.h"
#undef private

static std::vector<uint8_t> read_bytes(const char* path, size_t n) {
    std::vector<uint8_t> buf(n);
    FILE* f = fopen(path, "rb");
    if (!f || fread(buf.data(), 1, n, f) != n) {
        fprintf(stderr, "failed to read %s\n", path);
        exit(2);
    }
    fclose(f);
    return buf;
}

int main(int argc, char** argv) {
    if (argc < 8) {
        fprintf(stderr,
                "usage: %s W H MIN_DISP MAX_DISP left.bgr right.bgr out.f32\n",
                argv[0]);
        return 1;
    }
    const int w = atoi(argv[1]);
    const int h = atoi(argv[2]);
    ADCensusOption option;
    option.min_disparity = atoi(argv[3]);
    option.max_disparity = atoi(argv[4]);

    auto left = read_bytes(argv[5], (size_t)w * h * 3);
    auto right = read_bytes(argv[6], (size_t)w * h * 3);
    std::vector<float> disp((size_t)w * h, 0.f);

    ADCensusStereo stereo;
    if (!stereo.Initialize(w, h, option)) {
        fprintf(stderr, "init failed\n");
        return 3;
    }
    auto t0 = std::chrono::steady_clock::now();
    if (argc >= 9) {
        // stage-dump mode: replicate Match() (ADCensusStereo.cpp:69-132)
        // step by step so intermediates can be observed.
        const char* pre = argv[8];
        auto dump = [&](const char* name, const float* p) {
            char path[1024];
            snprintf(path, sizeof(path), "%s_%s.f32", pre, name);
            FILE* df = fopen(path, "wb");
            fwrite(p, sizeof(float), (size_t)w * h, df);
            fclose(df);
        };
        stereo.img_left_ = left.data();
        stereo.img_right_ = right.data();
        stereo.ComputeCost();
        stereo.CostAggregation();
        stereo.ScanlineOptimize();
        stereo.ComputeDisparity();
        stereo.ComputeDisparityRight();
        dump("wta_l", stereo.disp_left_);
        dump("wta_r", stereo.disp_right_);
        // refine, mirroring MultiStepRefine (ADCensusStereo.cpp:177-186):
        // note do_filling gates BOTH voting and interpolation there.
        MultiStepRefiner& R = stereo.refiner_;
        R.SetData(stereo.img_left_, stereo.aggregator_.get_cost_ptr(),
                  stereo.aggregator_.get_arms_ptr(), stereo.disp_left_,
                  stereo.disp_right_);
        R.SetParam(option.min_disparity, option.max_disparity,
                   option.irv_ts, option.irv_th, option.lrcheck_thres,
                   option.do_lr_check, option.do_filling,
                   option.do_filling, option.do_discontinuity_adjustment);
        if (option.do_lr_check) {
            R.OutlierDetection();
            dump("after_lr", stereo.disp_left_);
        }
        if (option.do_filling) {
            R.IterativeRegionVoting();
            dump("after_vote", stereo.disp_left_);
            R.ProperInterpolation();
            dump("after_interp", stereo.disp_left_);
        }
        if (option.do_discontinuity_adjustment) {
            R.DepthDiscontinuityAdjustment();
        }
        adcensus_util::MedianFilter(stereo.disp_left_, stereo.disp_left_,
                                    w, h, 3);
        memcpy(disp.data(), stereo.disp_left_,
               (size_t)w * h * sizeof(float));
    } else if (!stereo.Match(left.data(), right.data(), disp.data())) {
        fprintf(stderr, "match failed\n");
        return 4;
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs =
        std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0)
            .count() /
        1e6;
    printf("TOTAL_SECONDS %.6f\n", secs);

    FILE* f = fopen(argv[7], "wb");
    fwrite(disp.data(), sizeof(float), disp.size(), f);
    fclose(f);
    return 0;
}
