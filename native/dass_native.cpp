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

// Bilinear (Pillow BILINEAR, antialiased) resize of HxWxC uint8, emitting
// only the output window [y0, y0+wh) x [x0, x0+ww) of the virtual OHxOW
// result into dst (wh x ww x c). Bit-identical to full-resize-then-crop:
// every output pixel of the two-pass resampler depends only on its own
// per-axis coefficient rows, so restricting the loops to the window
// changes which pixels are computed, never their values. The fused form
// skips the out-of-crop work FixScaleCrop (custom_transforms.py:138-166)
// otherwise pays: pass 1 runs only the window's columns and the tmp rows
// pass 2 actually consumes, pass 2 only the window's rows.
void resize_bilinear_u8_window(const uint8_t* src, int h, int w, int c,
                               uint8_t* dst, int oh, int ow,
                               int x0, int y0, int ww, int wh) {
    std::vector<int> hb, hk, vb, vk;
    int hks = 0, vks = 0;
    precompute_coeffs(w, ow, hb, hk, hks);
    precompute_coeffs(h, oh, vb, vk, vks);

    // tmp rows needed by pass 2: union of the window rows' vertical
    // supports (ymin is nondecreasing in yy, so the union is one range).
    int rmin = vb[y0 * 2];
    int rmax = rmin;
    for (int yy = y0; yy < y0 + wh; ++yy)
        rmax = std::max(rmax, vb[yy * 2] + vb[yy * 2 + 1]);
    const int trows = rmax - rmin;

    // pass 1: horizontal (w -> window columns), 8-bit intermediate
    std::vector<uint8_t> tmp(static_cast<size_t>(trows) * ww * c);
#pragma omp parallel for schedule(static)
    for (int yy = 0; yy < trows; ++yy) {
        const uint8_t* srow = src + static_cast<size_t>(yy + rmin) * w * c;
        uint8_t* trow = tmp.data() + static_cast<size_t>(yy) * ww * c;
        for (int xx = 0; xx < ww; ++xx) {
            const int xmin = hb[(x0 + xx) * 2], xmax = hb[(x0 + xx) * 2 + 1];
            const int* k = &hk[(x0 + xx) * hks];
            for (int ch = 0; ch < c; ++ch) {
                int ss = 1 << (PRECISION_BITS - 1);
                for (int x = 0; x < xmax; ++x)
                    ss += srow[(xmin + x) * c + ch] * k[x];
                trow[xx * c + ch] = clip8(ss);
            }
        }
    }
    // pass 2: vertical (window rows)
#pragma omp parallel for schedule(static)
    for (int yy = 0; yy < wh; ++yy) {
        const int ymin = vb[(y0 + yy) * 2] - rmin;
        const int ymax = vb[(y0 + yy) * 2 + 1];
        const int* k = &vk[(y0 + yy) * vks];
        uint8_t* drow = dst + static_cast<size_t>(yy) * ww * c;
        for (int xx = 0; xx < ww * c; ++xx) {
            int ss = 1 << (PRECISION_BITS - 1);
            for (int y = 0; y < ymax; ++y)
                ss += tmp[static_cast<size_t>(ymin + y) * ww * c + xx] * k[y];
            drow[xx] = clip8(ss);
        }
    }
}

// Full-frame resize = window covering the whole output.
void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
    resize_bilinear_u8_window(src, h, w, c, dst, oh, ow, 0, 0, ow, oh);
}

// Nearest resize matching PIL Image.NEAREST. Pillow's ImagingScaleAffine
// computes source indices by INCREMENTAL accumulation (xo = 0.5*scale;
// xo += scale per pixel) — floating-point accumulation, not per-pixel
// multiplication — reproduced exactly for bit-parity at boundaries.
void resize_nearest_u8_window(const uint8_t* src, int h, int w, int c,
                              uint8_t* dst, int oh, int ow,
                              int x0, int y0, int ww, int wh) {
    const double sx = static_cast<double>(w) / ow;
    const double sy = static_cast<double>(h) / oh;
    // Source indices come from Pillow's incremental float accumulation;
    // the window must walk the SAME accumulator from 0 so boundary pixels
    // bit-match the full resize (a per-pixel multiply does not).
    std::vector<int> xint(ww);
    double xo = sx * 0.5;
    for (int xx = 0; xx < x0 + ww; ++xx) {
        if (xx >= x0) {
            int v = static_cast<int>(xo);
            xint[xx - x0] = v >= w ? w - 1 : v;
        }
        xo += sx;
    }
    std::vector<int> yint(wh);
    double yo = sy * 0.5;
    for (int yy = 0; yy < y0 + wh; ++yy) {
        if (yy >= y0) {
            int v = static_cast<int>(yo);
            yint[yy - y0] = v >= h ? h - 1 : v;
        }
        yo += sy;
    }
#pragma omp parallel for schedule(static)
    for (int yy = 0; yy < wh; ++yy) {
        const uint8_t* srow = src + static_cast<size_t>(yint[yy]) * w * c;
        uint8_t* drow = dst + static_cast<size_t>(yy) * ww * c;
        for (int xx = 0; xx < ww; ++xx)
            for (int ch = 0; ch < c; ++ch)
                drow[xx * c + ch] = srow[xint[xx] * c + ch];
    }
}

void resize_nearest_u8(const uint8_t* src, int h, int w, int c,
                       uint8_t* dst, int oh, int ow) {
    resize_nearest_u8_window(src, h, w, c, dst, oh, ow, 0, 0, ow, oh);
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
