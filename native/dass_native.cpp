// Native host-side data path: PIL-compatible uint8 bilinear/nearest resize
// and fused normalize-to-float32.
//
// Role: the hot host-side preprocessing loop (short-side resize + center
// crop + normalize) that feeds the TPU input pipeline. The reference runs
// this through scipy.misc.imresize -> PIL per sample in the DataLoader
// workers (dataloaders/custom_transforms.py:155-156); this library executes
// the same arithmetic as Pillow's two-pass fixed-point resampler
// (horizontal then vertical, 8-bit requantization between passes, triangle
// filter with antialias support scaling, PRECISION_BITS=22 rounding) so the
// output is bit-identical to the python path, with OpenMP across rows and
// no interpreter in the loop.
//
// Exposed via ctypes (deep_active_semantic_segmentation_tpu/data/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int PRECISION_BITS = 32 - 8 - 2;  // Pillow Resample.c

static inline uint8_t clip8(int in) {
    if (in >= (1 << (PRECISION_BITS + 8))) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> PRECISION_BITS);
}

static inline double triangle_filter(double x) {
    if (x < 0.0) x = -x;
    return x < 1.0 ? 1.0 - x : 0.0;
}

// Precompute Pillow-compatible fixed-point coefficient table for one axis.
static void precompute_coeffs(int in_size, int out_size,
                              std::vector<int>& bounds,
                              std::vector<int>& kk, int& ksize) {
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = 1.0 * filterscale;  // triangle support = 1
    ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

    bounds.resize(out_size * 2);
    kk.resize(out_size * ksize);
    std::vector<double> w(ksize);

    for (int xx = 0; xx < out_size; ++xx) {
        const double center = (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        for (int x = 0; x < xmax; ++x) {
            double v = triangle_filter((x + xmin - center + 0.5) * ss);
            w[x] = v;
            ww += v;
        }
        for (int x = 0; x < xmax; ++x) {
            if (ww != 0.0) w[x] /= ww;
        }
        for (int x = 0; x < xmax; ++x) {
            // Pillow rounds half away from zero here
            kk[xx * ksize + x] = static_cast<int>(
                w[x] < 0 ? -0.5 + w[x] * (1 << PRECISION_BITS)
                         : 0.5 + w[x] * (1 << PRECISION_BITS));
        }
        for (int x = xmax; x < ksize; ++x) kk[xx * ksize + x] = 0;
        bounds[xx * 2 + 0] = xmin;
        bounds[xx * 2 + 1] = xmax;
    }
}

}  // namespace

extern "C" {

// Bilinear (Pillow BILINEAR, antialiased) resize of HxWxC uint8 -> OHxOWxC.
void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
    std::vector<int> hb, hk, vb, vk;
    int hks = 0, vks = 0;
    precompute_coeffs(w, ow, hb, hk, hks);
    precompute_coeffs(h, oh, vb, vk, vks);

    // pass 1: horizontal (w -> ow), 8-bit intermediate like Pillow
    std::vector<uint8_t> tmp(static_cast<size_t>(h) * ow * c);
#pragma omp parallel for schedule(static)
    for (int yy = 0; yy < h; ++yy) {
        const uint8_t* srow = src + static_cast<size_t>(yy) * w * c;
        uint8_t* trow = tmp.data() + static_cast<size_t>(yy) * ow * c;
        for (int xx = 0; xx < ow; ++xx) {
            const int xmin = hb[xx * 2], xmax = hb[xx * 2 + 1];
            const int* k = &hk[xx * hks];
            for (int ch = 0; ch < c; ++ch) {
                int ss = 1 << (PRECISION_BITS - 1);
                for (int x = 0; x < xmax; ++x)
                    ss += srow[(xmin + x) * c + ch] * k[x];
                trow[xx * c + ch] = clip8(ss);
            }
        }
    }
    // pass 2: vertical (h -> oh)
#pragma omp parallel for schedule(static)
    for (int yy = 0; yy < oh; ++yy) {
        const int ymin = vb[yy * 2], ymax = vb[yy * 2 + 1];
        const int* k = &vk[yy * vks];
        uint8_t* drow = dst + static_cast<size_t>(yy) * ow * c;
        for (int xx = 0; xx < ow * c; ++xx) {
            int ss = 1 << (PRECISION_BITS - 1);
            for (int y = 0; y < ymax; ++y)
                ss += tmp[static_cast<size_t>(ymin + y) * ow * c + xx] * k[y];
            drow[xx] = clip8(ss);
        }
    }
}

// Nearest resize matching PIL Image.NEAREST. Pillow's ImagingScaleAffine
// computes source indices by INCREMENTAL accumulation (xo = 0.5*scale;
// xo += scale per pixel) — floating-point accumulation, not per-pixel
// multiplication — reproduced exactly for bit-parity at boundaries.
void resize_nearest_u8(const uint8_t* src, int h, int w, int c,
                       uint8_t* dst, int oh, int ow) {
    const double sx = static_cast<double>(w) / ow;
    const double sy = static_cast<double>(h) / oh;
    std::vector<int> xint(ow);
    double xo = sx * 0.5;
    for (int xx = 0; xx < ow; ++xx) {
        int v = static_cast<int>(xo);
        xint[xx] = v >= w ? w - 1 : v;
        xo += sx;
    }
    std::vector<int> yint(oh);
    double yo = sy * 0.5;
    for (int yy = 0; yy < oh; ++yy) {
        int v = static_cast<int>(yo);
        yint[yy] = v >= h ? h - 1 : v;
        yo += sy;
    }
#pragma omp parallel for schedule(static)
    for (int yy = 0; yy < oh; ++yy) {
        const uint8_t* srow = src + static_cast<size_t>(yint[yy]) * w * c;
        uint8_t* drow = dst + static_cast<size_t>(yy) * ow * c;
        for (int xx = 0; xx < ow; ++xx)
            for (int ch = 0; ch < c; ++ch)
                drow[xx * c + ch] = srow[xint[xx] * c + ch];
    }
}

// Fused /255 - mean / std normalization (custom_transforms.py:9-30).
void normalize_f32(const uint8_t* src, int n_pixels, int c,
                   const float* mean, const float* std_, float* dst) {
    std::vector<float> scale(c), shift(c);
    for (int ch = 0; ch < c; ++ch) {
        scale[ch] = 1.0f / (255.0f * std_[ch]);
        shift[ch] = -mean[ch] / std_[ch];
    }
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n_pixels; ++i) {
        for (int ch = 0; ch < c; ++ch)
            dst[static_cast<size_t>(i) * c + ch] =
                src[static_cast<size_t>(i) * c + ch] * scale[ch] + shift[ch];
    }
}

}  // extern "C"
