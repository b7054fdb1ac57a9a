// Native JPEG decode fused with the batch pad+resize.
//
// The reference decodes with PIL (pil_loader, reference
// CustomImageTextFolder.py:353-357) and hands full-resolution arrays to
// albumentations; our default host path does the same (PIL decode ->
// libpreprocess pad+resize). This library fuses the two: each worker
// thread decodes a JPEG straight from its in-memory file bytes (libjpeg,
// the same decoder family PIL wraps) and immediately pads+resizes the
// still-cache-warm pixels into the fixed [n, dh, dw, 3] batch slot —
// no PIL object churn, no intermediate full-size numpy copies.
//
// Per-image `oks[i]` reports decode success; failures (non-JPEG bytes,
// CMYK, truncated files) leave the slot zeroed and the Python caller
// falls back to PIL for exactly those images, so enabling this path can
// never change which images load — only how fast.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libdecode.so decode.cpp
//        -lpthread -ljpeg
// (includes preprocess.cpp, so libdecode.so also exports
// pad_resize_batch / pad_resize_u8 and can serve as a superset of
// libpreprocess.so).

#include "preprocess.cpp"

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>

namespace {

struct JpegErr {
    jpeg_error_mgr pub;
    std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    // libjpeg's default error_exit calls exit(); longjmp back to the
    // decoder instead so a bad file fails one image, not the process
    std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

void jpeg_warn_is_error(j_common_ptr cinfo, int msg_level) {
    // Corrupt-data warnings (msg_level -1, e.g. premature EOF on a
    // truncated file — libjpeg would insert a fake EOI and "succeed"
    // with a gray tail) must FAIL the image so the caller's PIL route
    // raises loudly, keeping the loadable set identical. Trace messages
    // (msg_level >= 0) stay silent.
    if (msg_level < 0)
        std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

// Decode JPEG bytes to uint8 RGB HWC. `out` is caller-owned (so longjmp
// never skips a non-trivial destructor in this frame; locals touched
// after setjmp are PODs and the cinfo struct).
bool decode_jpeg_rgb(const uint8_t* buf, size_t len,
                     std::vector<uint8_t>& out, int& h, int& w) {
    jpeg_decompress_struct ci;
    JpegErr err;
    ci.err = jpeg_std_error(&err.pub);
    err.pub.error_exit = jpeg_err_exit;
    err.pub.emit_message = jpeg_warn_is_error;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&ci);
        return false;
    }
    jpeg_create_decompress(&ci);
    jpeg_mem_src(&ci, buf, static_cast<unsigned long>(len));
    jpeg_read_header(&ci, TRUE);
    // PIL's convert("RGB") semantics for the common cases: YCbCr and
    // grayscale convert in-decoder; CMYK/YCCK have no JCS_RGB path in
    // libjpeg and error out -> PIL fallback upstream
    ci.out_color_space = JCS_RGB;
    jpeg_start_decompress(&ci);
    if (ci.output_components != 3) {
        jpeg_destroy_decompress(&ci);
        return false;
    }
    h = static_cast<int>(ci.output_height);
    w = static_cast<int>(ci.output_width);
    // crafted headers can claim absurd dimensions; above PIL's ~89 MP
    // decompression-bomb threshold, defer to the PIL route (which raises
    // a loud DecompressionBombError) instead of allocating gigabytes
    if (static_cast<size_t>(h) * w > size_t(100) * 1000 * 1000) {
        jpeg_destroy_decompress(&ci);
        return false;
    }
    out.resize(static_cast<size_t>(h) * w * 3);
    while (ci.output_scanline < ci.output_height) {
        JSAMPROW row = out.data()
            + static_cast<size_t>(ci.output_scanline) * w * 3;
        jpeg_read_scanlines(&ci, &row, 1);
    }
    jpeg_finish_decompress(&ci);
    jpeg_destroy_decompress(&ci);
    return true;
}

}  // namespace

extern "C" {

// bufs[i]/lens[i] = raw JPEG file bytes of image i; dst is a contiguous
// [n, dh, dw, 3] uint8 batch. oks[i]=1 on success, 0 -> slot zeroed,
// caller falls back. n_threads <= 0 -> hardware count.
void decode_pad_resize_batch(const uint8_t** bufs, const size_t* lens,
                             int n, double target_ar, uint8_t* dst,
                             int dh, int dw, int n_threads, int* oks) {
    if (n_threads <= 0)
        n_threads = static_cast<int>(std::thread::hardware_concurrency());
    n_threads = std::max(1, std::min(n_threads, n));
    std::atomic<int> next{0};
    size_t stride = static_cast<size_t>(dh) * dw * 3;
    auto worker = [&]() {
        std::vector<uint8_t> img;  // reused decode buffer per thread
        int i;
        while ((i = next.fetch_add(1)) < n) {
            int h = 0, w = 0;
            bool ok = false;
            try {
                ok = decode_jpeg_rgb(bufs[i], lens[i], img, h, w);
                if (ok)
                    pad_resize_u8(img.data(), h, w, 3, target_ar,
                                  dst + stride * i, dh, dw);
            } catch (...) {
                // bad_alloc etc. escaping a std::thread would
                // std::terminate the process; fail one image instead
                ok = false;
            }
            if (ok) {
                oks[i] = 1;
            } else {
                std::memset(dst + stride * i, 0, stride);
                oks[i] = 0;
            }
        }
    };
    std::vector<std::thread> pool;
    for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
    worker();
    for (auto& t : pool) t.join();
}

}  // extern "C"
