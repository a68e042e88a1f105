// Harness for building the *reference* AD-Census implementation as a
// command-line oracle (the reference sources are compiled directly from
// /root/reference and never copied into this repo; this file is only the
// I/O shim replacing its OpenCV-based main).
//
// Usage: adcensus_oracle W H MIN_DISP MAX_DISP left.bgr right.bgr out.f32
//   left.bgr/right.bgr: raw interleaved BGR bytes, H*W*3
//   out.f32: raw float32 disparities, H*W (Invalid = +inf)
// Prints per-stage timings (the reference prints its own) plus a final
// TOTAL_SECONDS line for the baseline harness to parse.
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "ADCensusStereo.h"

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
    if (!stereo.Match(left.data(), right.data(), disp.data())) {
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
