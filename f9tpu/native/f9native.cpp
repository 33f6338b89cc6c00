// f9native: host-native kernels for the f9tpu framework.
//
// Two roles, mirroring the reference's native dependencies (SURVEY.md §2.3):
//
//  1. A double-precision polyphase resampler ("oracle"): the role JUCE's
//     WindowedSincInterpolator / LagrangeInterpolator play for BASELINE.json —
//     the CPU accuracy reference the TPU output is tested against.  The phase
//     bank is designed in Python (float64) and passed in, so this checks the
//     *execution* path (indexing, accumulation) independently of the design.
//
//  2. Hot host-codec loops: 24-bit PCM pack/unpack and int16/int32/float
//     conversions — the equivalents of JUCE's AudioFormatManager sample
//     conversion inner loops (reference: Source/MainComponent.cpp:718-742,
//     784-801), vectorizable by the compiler and parallelized with threads.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Oracle: polyphase rational resampler, double precision.
//   H: (L, K) phase bank, row-major.  For output n:
//     u = n*M + delay;  base = u/L;  p = u%L;
//     y[n] = sum_j H[p, j] * x[base - j]   (x out of range -> 0)
// ---------------------------------------------------------------------------
void f9_resample_oracle(
    const double* x, int64_t in_len,
    const double* H, int64_t L, int64_t M, int64_t K, int64_t delay,
    double* y, int64_t out_len)
{
    for (int64_t n = 0; n < out_len; ++n) {
        const int64_t u = n * M + delay;
        const int64_t base = u / L;
        const int64_t p = u % L;
        const double* h = H + p * K;
        const int64_t j_lo = std::max<int64_t>(0, base - (in_len - 1));
        const int64_t j_hi = std::min<int64_t>(K - 1, base);
        double acc = 0.0;
        for (int64_t j = j_lo; j <= j_hi; ++j)
            acc += h[j] * x[base - j];
        y[n] = acc;
    }
}

// Multi-threaded variant over output chunks (embarrassingly parallel).
void f9_resample_oracle_mt(
    const double* x, int64_t in_len,
    const double* H, int64_t L, int64_t M, int64_t K, int64_t delay,
    double* y, int64_t out_len, int32_t n_threads)
{
    if (n_threads <= 1 || out_len < (int64_t)1 << 14) {
        f9_resample_oracle(x, in_len, H, L, M, K, delay, y, out_len);
        return;
    }
    std::vector<std::thread> ts;
    const int64_t chunk = (out_len + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
        const int64_t lo = t * chunk;
        const int64_t hi = std::min(out_len, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=]() {
            for (int64_t n = lo; n < hi; ++n) {
                const int64_t u = n * M + delay;
                const int64_t base = u / L;
                const int64_t p = u % L;
                const double* h = H + p * K;
                const int64_t j_lo = std::max<int64_t>(0, base - (in_len - 1));
                const int64_t j_hi = std::min<int64_t>(K - 1, base);
                double acc = 0.0;
                for (int64_t j = j_lo; j <= j_hi; ++j)
                    acc += h[j] * x[base - j];
                y[n] = acc;
            }
        });
    }
    for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------------
// Codec hot loops.
// ---------------------------------------------------------------------------

// little-endian 24-bit -> float32 in [-1, 1)
void f9_unpack24_to_f32(const uint8_t* src, int64_t n, float* dst)
{
    constexpr float inv = 1.0f / 8388608.0f;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* b = src + 3 * i;
        int32_t v = (int32_t)((uint32_t)b[0] | ((uint32_t)b[1] << 8) |
                              ((uint32_t)b[2] << 16));
        v = (v << 8) >> 8;  // sign extend from bit 23
        dst[i] = (float)v * inv;
    }
}

// int32 PCM codes -> little-endian 24-bit bytes
void f9_pack24_from_i32(const int32_t* src, int64_t n, uint8_t* dst)
{
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t v = (uint32_t)src[i];
        uint8_t* b = dst + 3 * i;
        b[0] = (uint8_t)(v & 0xFF);
        b[1] = (uint8_t)((v >> 8) & 0xFF);
        b[2] = (uint8_t)((v >> 16) & 0xFF);
    }
}

// int16 -> float32
void f9_i16_to_f32(const int16_t* src, int64_t n, float* dst)
{
    constexpr float inv = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)src[i] * inv;
}

// float32 -> int16 PCM codes with round-to-nearest + clip
void f9_f32_to_i16(const float* src, int64_t n, int16_t* dst)
{
    for (int64_t i = 0; i < n; ++i) {
        float v = std::nearbyintf(src[i] * 32768.0f);
        v = std::min(32767.0f, std::max(-32768.0f, v));
        dst[i] = (int16_t)v;
    }
}

// interleave planar (channels, frames) f32 -> (frames*channels) f32
void f9_interleave_f32(const float* src, int64_t channels, int64_t frames,
                       float* dst)
{
    for (int64_t c = 0; c < channels; ++c) {
        const float* s = src + c * frames;
        float* d = dst + c;
        for (int64_t f = 0; f < frames; ++f) d[f * channels] = s[f];
    }
}

// deinterleave (frames*channels) f32 -> planar (channels, frames) f32
void f9_deinterleave_f32(const float* src, int64_t channels, int64_t frames,
                         float* dst)
{
    for (int64_t c = 0; c < channels; ++c) {
        float* d = dst + c * frames;
        const float* s = src + c;
        for (int64_t f = 0; f < frames; ++f) d[f] = s[f * channels];
    }
}

int32_t f9_native_abi_version(void) { return 1; }

}  // extern "C"
