// Native host-side image preprocessing for the input pipeline.
//
// Replaces the per-image Python/cv2 hop in the batcher with one C call per
// batch: pad-to-aspect-ratio (reference keep_aspect_ratio.py:24-50 math,
// including int() truncation and the int(pad/2)-both-sides odd-pixel quirk)
// followed by a bilinear resize that reproduces cv2.INTER_LINEAR's
// fixed-point arithmetic (separable, 11-bit coefficients, rounded >> 22),
// fanned out over a std::thread pool.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libpreprocess.so preprocess.cpp -lpthread
// Python binding: ctypes (see native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kCoefBits = 11;          // cv2 INTER_RESIZE_COEF_BITS
constexpr int kCoefScale = 1 << kCoefBits;

struct Interp {
    std::vector<int> idx0;   // left/top source index
    std::vector<short> w0;   // fixed-point weight for idx0
    std::vector<short> w1;   // weight for idx0+1
};

Interp make_interp(int src, int dst) {
    Interp it;
    it.idx0.resize(dst);
    it.w0.resize(dst);
    it.w1.resize(dst);
    double scale = static_cast<double>(src) / dst;
    for (int d = 0; d < dst; ++d) {
        double f = (d + 0.5) * scale - 0.5;
        int i = static_cast<int>(std::floor(f));
        double u = f - i;
        if (i < 0) { i = 0; u = 0.0; }
        if (i >= src - 1) { i = src - 2; u = 1.0; }
        if (src == 1) { i = 0; u = 0.0; }
        it.idx0[d] = std::max(i, 0);
        // cv2 rounds each coefficient independently (saturate_cast uses
        // round-half-to-even); they may not sum to exactly 2048
        it.w0[d] = static_cast<short>(std::nearbyint((1.0 - u) * kCoefScale));
        it.w1[d] = static_cast<short>(std::nearbyint(u * kCoefScale));
    }
    return it;
}

// bilinear uint8 HWC resize, cv2 fixed-point semantics
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw, int ch) {
    Interp ix = make_interp(sw, dw);
    Interp iy = make_interp(sh, dh);
    // horizontal pass into int32 rows (two source rows cached per output row)
    std::vector<int32_t> row0(dw * ch), row1(dw * ch);
    int cached_y0 = -2;
    for (int dy = 0; dy < dh; ++dy) {
        int y0 = iy.idx0[dy];
        int y1 = std::min(y0 + 1, sh - 1);
        auto hline = [&](const uint8_t* s, int32_t* out) {
            for (int dx = 0; dx < dw; ++dx) {
                int x0 = ix.idx0[dx];
                int x1 = std::min(x0 + 1, sw - 1);
                const uint8_t* p0 = s + x0 * ch;
                const uint8_t* p1 = s + x1 * ch;
                int w0 = ix.w0[dx], w1 = ix.w1[dx];
                for (int c = 0; c < ch; ++c)
                    out[dx * ch + c] = p0[c] * w0 + p1[c] * w1;
            }
        };
        if (cached_y0 == y0 - 1) {           // reuse row1 as row0
            std::swap(row0, row1);
            hline(src + static_cast<size_t>(y1) * sw * ch, row1.data());
        } else if (cached_y0 != y0) {
            hline(src + static_cast<size_t>(y0) * sw * ch, row0.data());
            hline(src + static_cast<size_t>(y1) * sw * ch, row1.data());
        }
        cached_y0 = y0;
        int wy0 = iy.w0[dy], wy1 = iy.w1[dy];
        uint8_t* out = dst + static_cast<size_t>(dy) * dw * ch;
        for (int i = 0; i < dw * ch; ++i) {
            // cv2 8U vertical descale (VResizeLinearVec_32s8u):
            // ((b0*(r0>>4))>>16) + ((b1*(r1>>4))>>16), then (+2)>>2
            int v = ((wy0 * (row0[i] >> 4)) >> 16) +
                    ((wy1 * (row1[i] >> 4)) >> 16);
            v = (v + 2) >> 2;
            out[i] = static_cast<uint8_t>(std::clamp(v, 0, 255));
        }
    }
}

// reference pad-to-AR: compare H/W against target (already transposed by
// the caller per the reference quirk); zero-pad int(pad/2) on both sides.
// The reference's local width/height names are swapped, so the pad AMOUNT
// mixes axes: H/W < target pads WIDTH by int(target*W) - H; H/W > target
// pads HEIGHT by int(H/target) - W (keep_aspect_ratio.py:24-50, verified
// by executing it: (40,80)@AR1 -> (40,120)).
void pad_to_ar(const uint8_t* src, int sh, int sw, int ch, double target_ar,
               std::vector<uint8_t>& out, int& oh, int& ow) {
    double current = static_cast<double>(sh) / sw;
    if (current == target_ar) {
        oh = sh; ow = sw;
        out.assign(src, src + static_cast<size_t>(sh) * sw * ch);
        return;
    }
    if (current < target_ar) {
        int pad = static_cast<int>(target_ar * sw) - sh;
        int half = pad / 2;
        oh = sh; ow = sw + 2 * half;
        out.assign(static_cast<size_t>(oh) * ow * ch, 0);
        for (int y = 0; y < sh; ++y)
            std::memcpy(out.data() + (static_cast<size_t>(y) * ow + half) * ch,
                        src + static_cast<size_t>(y) * sw * ch,
                        static_cast<size_t>(sw) * ch);
    } else {
        int pad = static_cast<int>(sh / target_ar) - sw;
        int half = pad / 2;
        oh = sh + 2 * half; ow = sw;
        out.assign(static_cast<size_t>(oh) * ow * ch, 0);
        std::memcpy(out.data() + static_cast<size_t>(half) * ow * ch, src,
                    static_cast<size_t>(sh) * sw * ch);
    }
}

}  // namespace

extern "C" {

// one image: pad-to-AR(target_ar over H/W) then resize to (dh, dw)
void pad_resize_u8(const uint8_t* src, int sh, int sw, int ch,
                   double target_ar, uint8_t* dst, int dh, int dw) {
    std::vector<uint8_t> padded;
    int oh, ow;
    pad_to_ar(src, sh, sw, ch, target_ar, padded, oh, ow);
    resize_bilinear(padded.data(), oh, ow, dst, dh, dw, ch);
}

// batch: srcs[i] points at image i (shape shs[i] x sws[i] x ch); dst is a
// contiguous [n, dh, dw, ch] buffer. n_threads <= 0 -> hardware count.
void pad_resize_batch(const uint8_t** srcs, const int* shs, const int* sws,
                      int ch, int n, double target_ar, uint8_t* dst,
                      int dh, int dw, int n_threads) {
    if (n_threads <= 0)
        n_threads = static_cast<int>(std::thread::hardware_concurrency());
    n_threads = std::max(1, std::min(n_threads, n));
    std::atomic<int> next{0};
    size_t stride = static_cast<size_t>(dh) * dw * ch;
    auto worker = [&]() {
        int i;
        while ((i = next.fetch_add(1)) < n)
            pad_resize_u8(srcs[i], shs[i], sws[i], ch, target_ar,
                          dst + stride * i, dh, dw);
    };
    std::vector<std::thread> pool;
    for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
    worker();
    for (auto& t : pool) t.join();
}

}  // extern "C"
