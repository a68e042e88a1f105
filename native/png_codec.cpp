// Native PNG codec for the AD-Census TPU engine's data loader.
//
// The reference links OpenCV solely for image I/O (main.cpp:12-17); this
// is the equivalent native component: a small, dependency-light PNG
// decoder/encoder over the system zlib, exposed as a C ABI for ctypes.
//
// Decoder: 8-bit gray / gray+alpha / RGB / RGBA and 16-bit gray,
// non-interlaced (every bundled Middlebury asset fits). Returns RGB or
// gray16. Palette / interlaced images are rejected (caller falls back).
// Encoder: 8-bit gray or RGB, filter 0, one IDAT.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <zlib.h>

namespace {

constexpr uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

uint32_t rd32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void wr32(uint8_t* p, uint32_t v) {
    p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

}  // namespace

extern "C" {

// Parse header only. Returns 0 on success.
// out_channels: channels of the DECODED output (1, 2 for gray16, or 3).
int png_probe(const uint8_t* buf, long n, int* w, int* h, int* bit_depth,
              int* color_type, int* out_channels) {
    if (n < 33 || memcmp(buf, kSig, 8) != 0) return -1;
    if (rd32(buf + 8) != 13 || memcmp(buf + 12, "IHDR", 4) != 0) return -2;
    const uint8_t* ih = buf + 16;
    *w = (int)rd32(ih);
    *h = (int)rd32(ih + 4);
    *bit_depth = ih[8];
    *color_type = ih[9];
    if (ih[10] != 0 || ih[11] != 0) return -3;  // compression/filter method
    if (ih[12] != 0) return -4;                 // interlaced unsupported
    if (*w <= 0 || *h <= 0) return -5;
    if (*bit_depth == 8) {
        switch (*color_type) {
            case 0: case 4: *out_channels = 1; break;  // gray (+alpha)
            case 2: case 6: *out_channels = 3; break;  // rgb(a)
            default: return -6;                         // palette
        }
    } else if (*bit_depth == 16 && *color_type == 0) {
        *out_channels = 2;  // gray16 big-endian -> 2 bytes/px little-endian
    } else {
        return -7;
    }
    return 0;
}

// Decode into caller-allocated out (h * w * out_channels bytes; gray16 is
// written as native-endian uint16). Returns 0 on success.
int png_decode(const uint8_t* buf, long n, uint8_t* out) {
    int w, h, depth, ctype, out_ch;
    int rc = png_probe(buf, n, &w, &h, &depth, &ctype, &out_ch);
    if (rc != 0) return rc;

    // concatenate IDAT payloads
    uint8_t* idat = (uint8_t*)malloc((size_t)n);
    if (!idat) return -10;
    size_t idat_len = 0;
    long off = 8;
    while (off + 12 <= n) {
        uint32_t len = rd32(buf + off);
        const uint8_t* type = buf + off + 4;
        if (off + 12 + (long)len > n) { free(idat); return -11; }
        if (memcmp(type, "IDAT", 4) == 0) {
            memcpy(idat + idat_len, buf + off + 8, len);
            idat_len += len;
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        off += 12 + len;
    }
    if (idat_len == 0) { free(idat); return -12; }

    int src_ch = (ctype == 0) ? 1 : (ctype == 2) ? 3
                 : (ctype == 4) ? 2 : 4;          // per-pixel samples
    int bpp = src_ch * (depth / 8);               // filter byte distance
    size_t stride = (size_t)w * bpp;
    size_t raw_len = (size_t)h * (stride + 1);
    uint8_t* raw = (uint8_t*)malloc(raw_len);
    if (!raw) { free(idat); return -10; }
    uLongf dst = (uLongf)raw_len;
    if (uncompress(raw, &dst, idat, idat_len) != Z_OK || dst != raw_len) {
        free(idat); free(raw);
        return -13;
    }
    free(idat);

    // unfilter in place (scanline by scanline)
    uint8_t* prev = nullptr;
    for (int y = 0; y < h; ++y) {
        uint8_t* line = raw + (size_t)y * (stride + 1);
        uint8_t f = line[0];
        uint8_t* cur = line + 1;
        for (size_t i = 0; i < stride; ++i) {
            int a = i >= (size_t)bpp ? cur[i - bpp] : 0;
            int b = prev ? prev[i] : 0;
            int c = (prev && i >= (size_t)bpp) ? prev[i - bpp] : 0;
            int x = cur[i];
            switch (f) {
                case 0: break;
                case 1: x += a; break;
                case 2: x += b; break;
                case 3: x += (a + b) / 2; break;
                case 4: x += paeth(a, b, c); break;
                default: free(raw); return -14;
            }
            cur[i] = (uint8_t)x;
        }
        prev = cur;
    }

    // project to output layout
    for (int y = 0; y < h; ++y) {
        const uint8_t* cur = raw + (size_t)y * (stride + 1) + 1;
        uint8_t* o = out + (size_t)y * w * out_ch;
        if (depth == 16) {  // gray16 big-endian -> native u16
            for (int x = 0; x < w; ++x) {
                uint16_t v = (uint16_t(cur[2 * x]) << 8) | cur[2 * x + 1];
                memcpy(o + 2 * x, &v, 2);
            }
        } else if (ctype == 0) {
            memcpy(o, cur, w);
        } else if (ctype == 4) {
            for (int x = 0; x < w; ++x) o[x] = cur[2 * x];
        } else if (ctype == 2) {
            memcpy(o, cur, (size_t)w * 3);
        } else {  // RGBA -> RGB
            for (int x = 0; x < w; ++x) {
                o[3 * x] = cur[4 * x];
                o[3 * x + 1] = cur[4 * x + 1];
                o[3 * x + 2] = cur[4 * x + 2];
            }
        }
    }
    free(raw);
    return 0;
}

// Encode 8-bit gray (channels=1) or RGB (channels=3).
// out must hold png_encode_bound(w, h, channels) bytes; returns the
// written length, or <0 on error.
long png_encode_bound(int w, int h, int channels) {
    return 8 + 25 + 12 + (long)compressBound((uLong)h * (1 + (size_t)w * channels)) + 12;
}

long png_encode(const uint8_t* img, int w, int h, int channels,
                uint8_t* out) {
    if (channels != 1 && channels != 3) return -1;
    size_t stride = (size_t)w * channels;
    size_t raw_len = (size_t)h * (stride + 1);
    uint8_t* raw = (uint8_t*)malloc(raw_len);
    if (!raw) return -10;
    for (int y = 0; y < h; ++y) {
        uint8_t* line = raw + (size_t)y * (stride + 1);
        line[0] = 0;  // filter: none
        memcpy(line + 1, img + (size_t)y * stride, stride);
    }
    uLongf comp_len = compressBound((uLong)raw_len);
    uint8_t* comp = (uint8_t*)malloc(comp_len);
    if (!comp) { free(raw); return -10; }
    if (compress2(comp, &comp_len, raw, raw_len, 6) != Z_OK) {
        free(raw); free(comp);
        return -11;
    }
    free(raw);

    uint8_t* p = out;
    memcpy(p, kSig, 8); p += 8;
    // IHDR
    wr32(p, 13); memcpy(p + 4, "IHDR", 4);
    wr32(p + 8, (uint32_t)w); wr32(p + 12, (uint32_t)h);
    p[16] = 8;                                 // bit depth
    p[17] = channels == 1 ? 0 : 2;             // color type
    p[18] = 0; p[19] = 0; p[20] = 0;
    wr32(p + 21, (uint32_t)crc32(0, p + 4, 17));
    p += 25;
    // IDAT
    wr32(p, (uint32_t)comp_len); memcpy(p + 4, "IDAT", 4);
    memcpy(p + 8, comp, comp_len);
    wr32(p + 8 + comp_len, (uint32_t)crc32(0, p + 4, (uInt)(4 + comp_len)));
    p += 12 + comp_len;
    free(comp);
    // IEND
    wr32(p, 0); memcpy(p + 4, "IEND", 4);
    wr32(p + 8, (uint32_t)crc32(0, p + 4, 4));
    p += 12;
    return (long)(p - out);
}

}  // extern "C"
