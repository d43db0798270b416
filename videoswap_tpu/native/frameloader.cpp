// Native frame preprocessing: separable triangle-filter resample
// (PIL.Image.BILINEAR-compatible: support widens for downscale) of an
// interleaved uint8 HWC image, fused with center-crop and per-channel
// affine normalize, writing float32 HWC.
//
// TPU-native replacement for the host side of the reference's
// torchvision Resize/CenterCrop/ToTensor/Normalize chain
// (/root/reference/videoswap/data/transform.py:22-48): one pass over the
// image, no intermediate PIL objects, float32 accumulation (PIL uses
// 8-bit fixed-point coefficients). Built with g++ at first import and
// loaded via ctypes (videoswap_tpu/native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Taps {
    std::vector<int> start;      // first source index per output index
    std::vector<int> count;      // number of taps per output index
    std::vector<float> weight;   // [out, max_count] row-major, zero-padded
    int max_count = 0;
};

// PIL-style triangle (bilinear) resampling taps from `in_size` to
// `out_size`: scale = in/out, filterscale = max(scale, 1),
// center = (i + 0.5) * scale, support = filterscale, weights
// triangle((j + 0.5 - center) / filterscale) normalized to sum 1.
Taps make_taps(int in_size, int out_size) {
    Taps t;
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = filterscale;  // triangle filter support = 1.0
    t.start.resize(out_size);
    t.count.resize(out_size);
    std::vector<std::vector<float>> rows(out_size);
    for (int i = 0; i < out_size; ++i) {
        const double center = (i + 0.5) * scale;
        int xmin = static_cast<int>(center - support + 0.5);
        int xmax = static_cast<int>(center + support + 0.5);
        xmin = std::max(xmin, 0);
        xmax = std::min(xmax, in_size);
        double total = 0.0;
        std::vector<float>& w = rows[i];
        w.resize(xmax - xmin);
        for (int j = xmin; j < xmax; ++j) {
            const double x = (j + 0.5 - center) / filterscale;
            const double v = std::max(0.0, 1.0 - std::abs(x));
            w[j - xmin] = static_cast<float>(v);
            total += v;
        }
        if (total > 0.0)
            for (float& v : w) v = static_cast<float>(v / total);
        t.start[i] = xmin;
        t.count[i] = xmax - xmin;
        t.max_count = std::max(t.max_count, xmax - xmin);
    }
    t.weight.assign(static_cast<size_t>(out_size) * t.max_count, 0.0f);
    for (int i = 0; i < out_size; ++i)
        std::copy(rows[i].begin(), rows[i].end(),
                  t.weight.begin() + static_cast<size_t>(i) * t.max_count);
    return t;
}

}  // namespace

extern "C" {

// src: (h0, w0, c) uint8. Resample to (rh, rw), center-crop to (ch, cw)
// (pass ch=rh, cw=rw for no crop), normalize out = (v/255 - mean[k]) /
// stdv[k] (mean/stdv may be null: plain [0,1]). dst: (ch, cw, c) float32.
// Only the cropped region is ever computed. Returns 0 on success.
int vs_preprocess(const uint8_t* src, int h0, int w0, int c,
                  int rh, int rw, int ch, int cw,
                  const float* mean, const float* stdv, float* dst) {
    if (h0 <= 0 || w0 <= 0 || c <= 0 || rh <= 0 || rw <= 0 ||
        ch <= 0 || cw <= 0 || ch > rh || cw > rw || c > 16)
        return 1;
    const int top = (rh - ch) / 2;
    const int left = (rw - cw) / 2;
    const Taps tx = make_taps(w0, rw);
    const Taps ty = make_taps(h0, rh);

    // horizontal pass over the cropped column range only: (h0, cw, c)
    std::vector<float> tmp(static_cast<size_t>(h0) * cw * c);
    for (int y = 0; y < h0; ++y) {
        const uint8_t* srow = src + static_cast<size_t>(y) * w0 * c;
        float* trow = tmp.data() + static_cast<size_t>(y) * cw * c;
        for (int x = 0; x < cw; ++x) {
            const int ox = x + left;
            const int s = tx.start[ox], n = tx.count[ox];
            const float* w = tx.weight.data()
                + static_cast<size_t>(ox) * tx.max_count;
            float acc[16] = {0};
            for (int j = 0; j < n; ++j) {
                const uint8_t* p = srow + static_cast<size_t>(s + j) * c;
                const float wj = w[j];
                for (int k = 0; k < c; ++k) acc[k] += wj * p[k];
            }
            float* o = trow + static_cast<size_t>(x) * c;
            for (int k = 0; k < c; ++k) o[k] = acc[k];
        }
    }

    // vertical pass over the cropped row range + fused normalize
    float scale[16], shift[16];
    for (int k = 0; k < c; ++k) {
        const float m = mean ? mean[k] : 0.0f;
        const float sd = stdv ? stdv[k] : 1.0f;
        scale[k] = 1.0f / (255.0f * sd);
        shift[k] = -m / sd;
    }
    for (int y = 0; y < ch; ++y) {
        const int oy = y + top;
        const int s = ty.start[oy], n = ty.count[oy];
        const float* w = ty.weight.data()
            + static_cast<size_t>(oy) * ty.max_count;
        float* drow = dst + static_cast<size_t>(y) * cw * c;
        for (int x = 0; x < cw; ++x) {
            float acc[16] = {0};
            for (int j = 0; j < n; ++j) {
                const float* p = tmp.data()
                    + (static_cast<size_t>(s + j) * cw + x) * c;
                const float wj = w[j];
                for (int k = 0; k < c; ++k) acc[k] += wj * p[k];
            }
            float* o = drow + static_cast<size_t>(x) * c;
            for (int k = 0; k < c; ++k)
                o[k] = acc[k] * scale[k] + shift[k];
        }
    }
    return 0;
}

}  // extern "C"
