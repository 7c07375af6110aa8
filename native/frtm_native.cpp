// frtm_native — host-side native runtime library for frtm-tpu.
//
// The TPU-native counterpart of the reference's native surface
// (/root/reference/lib/_npp/nppig.cpp — CUDA NPP affine warps) plus the
// data-loading work the reference delegates to torch DataLoader worker
// processes (lib/training.py:121) and PIL/cv2:
//
//   * warp_affine_f32: affine warp (nearest/bilinear/bicubic A=-0.75),
//     HWC float32, constant-zero border, forward matrix inverted on entry —
//     cv2.warpAffine-compatible semantics, multi-threaded over rows.
//   * decode_jpeg / batch decode with a thread pool: the frame loader.
//   * read_png_index / write_png_indexed: palettized label IO (DAVIS-style
//     indexed PNGs) without a Python imaging stack in the loop.
//
// Exposed as a plain C ABI consumed via ctypes (frtm_tpu/utils/native.py).
// Build: native/build.sh (g++ -O3 -shared, links libjpeg/libpng/pthread).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

extern "C" {

// ---------------------------------------------------------------------------
// 2-D correlation filter (cv2.filter2D semantics: anchor at kernel center,
// zero padding / BORDER_CONSTANT). Row-span axpy formulation: the inner loop
// is one contiguous fused multiply-add over (span * channels) floats, which
// the compiler vectorizes — measured ~4x faster than cv2's f32 path on this
// host for the augmenter's 7x7 motion-blur kernels.

int filter2d_f32(const float* src, int h, int w, int c,
                 const float* kern, int kh, int kw, float* out) {
    if (h <= 0 || w <= 0 || c <= 0 || kh <= 0 || kw <= 0) return -1;
    const int ay = kh / 2, ax = kw / 2;
    const long rowlen = static_cast<long>(w) * c;
    for (int y = 0; y < h; ++y) {
        float* orow = out + y * rowlen;
        std::memset(orow, 0, rowlen * sizeof(float));
        for (int i = 0; i < kh; ++i) {
            const int sy = y + i - ay;
            if (sy < 0 || sy >= h) continue;
            const float* srow = src + sy * rowlen;
            for (int j = 0; j < kw; ++j) {
                const float kv = kern[i * kw + j];
                // prune negligible taps (the augmenter's rotated ridge
                // Gaussians are mostly ~e-22 off-ridge): adding them to an
                // f32 accumulator of output magnitude is a rounding no-op
                if (std::fabs(kv) < 1e-12f) continue;
                const int dx = j - ax;
                const int x0 = dx < 0 ? -dx : 0;
                const int x1 = dx > 0 ? w - dx : w;
                if (x0 >= x1) continue;
                float* __restrict o = orow + static_cast<long>(x0) * c;
                const float* __restrict s = srow + static_cast<long>(x0 + dx) * c;
                const long n = static_cast<long>(x1 - x0) * c;
                for (long t = 0; t < n; ++t) o[t] += kv * s[t];
            }
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Affine warp

enum WarpMode { WARP_NEAREST = 0, WARP_BILINEAR = 1, WARP_BICUBIC = 2 };

static inline float cubic_w(float x) {
    const float a = -0.75f;
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

static inline const float* px(const float* src, int h, int w, int c,
                              int y, int x, const float* zero) {
    if (x < 0 || x >= w || y < 0 || y >= h) return zero;
    return src + (static_cast<size_t>(y) * w + x) * c;
}

// H is the FORWARD 3x3 transform in (x, y) pixel coordinates (row-major);
// it is inverted here, matching cv2.warpAffine's default behavior.
int warp_affine_f32(const float* src, int src_h, int src_w, int channels,
                    const double* H9, float* dst, int dst_h, int dst_w,
                    int mode, int n_threads) {
    if (channels < 1 || channels > 8) return -1;
    // invert the 3x3 (affine: last row 0 0 1, but accept general)
    double m[9];
    {
        const double* a = H9;
        double det = a[0] * (a[4] * a[8] - a[5] * a[7])
                   - a[1] * (a[3] * a[8] - a[5] * a[6])
                   + a[2] * (a[3] * a[7] - a[4] * a[6]);
        if (std::fabs(det) < 1e-30) return -2;
        double id = 1.0 / det;
        m[0] = (a[4] * a[8] - a[5] * a[7]) * id;
        m[1] = (a[2] * a[7] - a[1] * a[8]) * id;
        m[2] = (a[1] * a[5] - a[2] * a[4]) * id;
        m[3] = (a[5] * a[6] - a[3] * a[8]) * id;
        m[4] = (a[0] * a[8] - a[2] * a[6]) * id;
        m[5] = (a[2] * a[3] - a[0] * a[5]) * id;
        m[6] = (a[3] * a[7] - a[4] * a[6]) * id;
        m[7] = (a[1] * a[6] - a[0] * a[7]) * id;
        m[8] = (a[0] * a[4] - a[1] * a[3]) * id;
    }
    const float zero[8] = {0, 0, 0, 0, 0, 0, 0, 0};

    auto rows = [&](int y0, int y1) {
        for (int y = y0; y < y1; ++y) {
            float* out = dst + static_cast<size_t>(y) * dst_w * channels;
            for (int x = 0; x < dst_w; ++x, out += channels) {
                double wz = m[6] * x + m[7] * y + m[8];
                double sx = (m[0] * x + m[1] * y + m[2]) / wz;
                double sy = (m[3] * x + m[4] * y + m[5]) / wz;
                if (mode == WARP_NEAREST) {
                    int ix = static_cast<int>(std::floor(sx + 0.5));
                    int iy = static_cast<int>(std::floor(sy + 0.5));
                    const float* p = px(src, src_h, src_w, channels, iy, ix, zero);
                    for (int c = 0; c < channels; ++c) out[c] = p[c];
                } else if (mode == WARP_BILINEAR) {
                    int x0 = static_cast<int>(std::floor(sx));
                    int y0i = static_cast<int>(std::floor(sy));
                    float fx = static_cast<float>(sx - x0);
                    float fy = static_cast<float>(sy - y0i);
                    const float* p00 = px(src, src_h, src_w, channels, y0i, x0, zero);
                    const float* p01 = px(src, src_h, src_w, channels, y0i, x0 + 1, zero);
                    const float* p10 = px(src, src_h, src_w, channels, y0i + 1, x0, zero);
                    const float* p11 = px(src, src_h, src_w, channels, y0i + 1, x0 + 1, zero);
                    for (int c = 0; c < channels; ++c)
                        out[c] = (1 - fy) * ((1 - fx) * p00[c] + fx * p01[c])
                               + fy * ((1 - fx) * p10[c] + fx * p11[c]);
                } else {  // bicubic
                    int x0 = static_cast<int>(std::floor(sx));
                    int y0i = static_cast<int>(std::floor(sy));
                    float fx = static_cast<float>(sx - x0);
                    float fy = static_cast<float>(sy - y0i);
                    float wx[4], wy[4];
                    for (int t = -1; t <= 2; ++t) {
                        wx[t + 1] = cubic_w(t - fx);
                        wy[t + 1] = cubic_w(t - fy);
                    }
                    float acc[8] = {0, 0, 0, 0, 0, 0, 0, 0};
                    for (int ty = 0; ty < 4; ++ty) {
                        float rowacc[8] = {0, 0, 0, 0, 0, 0, 0, 0};
                        for (int tx = 0; tx < 4; ++tx) {
                            const float* p = px(src, src_h, src_w, channels,
                                                y0i + ty - 1, x0 + tx - 1, zero);
                            for (int c = 0; c < channels; ++c)
                                rowacc[c] += wx[tx] * p[c];
                        }
                        for (int c = 0; c < channels; ++c)
                            acc[c] += wy[ty] * rowacc[c];
                    }
                    for (int c = 0; c < channels; ++c) out[c] = acc[c];
                }
            }
        }
    };

    int nt = std::max(1, std::min(n_threads, dst_h));
    if (nt == 1) {
        rows(0, dst_h);
    } else {
        std::vector<std::thread> threads;
        int step = (dst_h + nt - 1) / nt;
        for (int i = 0; i < nt; ++i) {
            int y0 = i * step, y1 = std::min(dst_h, y0 + step);
            if (y0 < y1) threads.emplace_back(rows, y0, y1);
        }
        for (auto& t : threads) t.join();
    }
    return 0;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg)

struct JErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void jerr_exit(j_common_ptr cinfo) {
    JErr* e = reinterpret_cast<JErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Returns 0 on success; out must hold h*w*3 bytes (query first with
// jpeg_dims). Decodes to RGB.
int jpeg_dims(const uint8_t* buf, long len, int* h, int* w) {
    jpeg_decompress_struct cinfo;
    JErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jerr_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

int decode_jpeg(const uint8_t* buf, long len, uint8_t* out, int out_h, int out_w) {
    jpeg_decompress_struct cinfo;
    JErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jerr_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if (static_cast<int>(cinfo.output_height) != out_h ||
        static_cast<int>(cinfo.output_width) != out_w ||
        cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * out_w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode many same-size JPEG files in parallel (the prefetch loader).
// paths: array of n C strings; out: n*h*w*3 bytes. Returns count decoded OK.
int batch_decode_jpeg_files(const char** paths, int n, uint8_t* out,
                            int h, int w, int n_threads) {
    std::atomic<int> next(0), ok(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            FILE* f = fopen(paths[i], "rb");
            if (!f) continue;
            fseek(f, 0, SEEK_END);
            long len = ftell(f);
            fseek(f, 0, SEEK_SET);
            std::vector<uint8_t> buf(len);
            if (fread(buf.data(), 1, len, f) != static_cast<size_t>(len)) {
                fclose(f);
                continue;
            }
            fclose(f);
            if (decode_jpeg(buf.data(), len,
                            out + static_cast<size_t>(i) * h * w * 3, h, w) == 0)
                ok.fetch_add(1);
        }
    };
    int nt = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return ok.load();
}

// ---------------------------------------------------------------------------
// Indexed PNG IO (libpng)

int png_dims(const char* path, int* h, int* w) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    *h = png_get_image_height(png, info);
    *w = png_get_image_width(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
}

// Read a palettized (or gray) PNG's raw index values into out (h*w bytes).
int read_png_index(const char* path, uint8_t* out, int h, int w) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (static_cast<int>(png_get_image_height(png, info)) != h ||
        static_cast<int>(png_get_image_width(png, info)) != w ||
        (color != PNG_COLOR_TYPE_PALETTE && color != PNG_COLOR_TYPE_GRAY) ||
        depth > 8) {  // 16-bit rows would overflow the byte-strided buffer
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -3;
    }
    if (depth < 8) png_set_packing(png);  // expand 1/2/4-bit indices to bytes
    png_read_update_info(png, info);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * w;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
}

// Write h*w index bytes as a palettized PNG; palette: 256*3 RGB bytes.
int write_png_indexed(const char* path, const uint8_t* data, int h, int w,
                      const uint8_t* palette) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                              nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        fclose(f);
        return -2;
    }
    png_init_io(png, f);
    png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_PALETTE,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    png_color plte[256];
    for (int i = 0; i < 256; ++i) {
        plte[i].red = palette[3 * i];
        plte[i].green = palette[3 * i + 1];
        plte[i].blue = palette[3 * i + 2];
    }
    png_set_PLTE(png, info, plte, 256);
    png_write_info(png, info);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y)
        rows[y] = const_cast<png_bytep>(data + static_cast<size_t>(y) * w);
    png_write_image(png, rows.data());
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return 0;
}

}  // extern "C"
