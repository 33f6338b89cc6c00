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

// ---------------------------------------------------------------------------
// Async data loader: a native thread pool that decodes integer-PCM WAV files
// straight into caller-owned float32 planar buffers.  This is the native
// "data loader" runtime component (the role JUCE's AudioFormatManager +
// message-thread loading plays in the reference, Source/MainComponent.cpp:705-749):
// file I/O, header walk, sample conversion and deinterleave all happen off
// the Python thread; Python polls ticket completion.
// ---------------------------------------------------------------------------

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <mutex>
#include <queue>
#include <string>

namespace {

struct LoadJob {
    std::string path;
    float* dst;            // planar (channels, frames) float32, caller-owned
    int64_t max_frames;    // capacity of dst per channel
    int32_t expect_channels;
    // results
    std::atomic<int32_t> status{0};  // 0 pending, 1 ok, <0 error code
    int64_t frames_read{0};
    int32_t rate{0};
};

struct Loader {
    std::vector<std::thread> workers;
    std::queue<LoadJob*> pending;
    std::mutex mu;
    std::condition_variable cv;
    bool stopping = false;
    std::vector<LoadJob*> jobs;  // owned

    explicit Loader(int n_threads) {
        for (int i = 0; i < n_threads; ++i)
            workers.emplace_back([this]() { run(); });
    }
    ~Loader() {
        {
            std::lock_guard<std::mutex> g(mu);
            stopping = true;
        }
        cv.notify_all();
        for (auto& t : workers) t.join();
        for (auto* j : jobs) delete j;
    }
    void run() {
        for (;;) {
            LoadJob* job;
            {
                std::unique_lock<std::mutex> g(mu);
                cv.wait(g, [this]() { return stopping || !pending.empty(); });
                if (stopping && pending.empty()) return;
                job = pending.front();
                pending.pop();
            }
            decode(job);
        }
    }
    static void decode(LoadJob* job) {
        FILE* f = std::fopen(job->path.c_str(), "rb");
        if (!f) { job->status.store(-1); return; }
        uint8_t head[12];
        if (std::fread(head, 1, 12, f) != 12 || std::memcmp(head, "RIFF", 4) ||
            std::memcmp(head + 8, "WAVE", 4)) {
            std::fclose(f); job->status.store(-2); return;
        }
        uint16_t tag = 0, channels = 0, bits = 0;
        uint32_t rate = 0;
        int64_t data_off = -1; uint32_t data_size = 0;
        uint8_t hdr[8];
        while (std::fread(hdr, 1, 8, f) == 8) {
            uint32_t size;
            std::memcpy(&size, hdr + 4, 4);
            long pos = std::ftell(f);
            if (!std::memcmp(hdr, "fmt ", 4)) {
                uint8_t fmt[40] = {0};
                std::fread(fmt, 1, size < 40 ? size : 40, f);
                std::memcpy(&tag, fmt, 2);
                std::memcpy(&channels, fmt + 2, 2);
                std::memcpy(&rate, fmt + 4, 4);
                std::memcpy(&bits, fmt + 14, 2);
                if (tag == 0xFFFE && size >= 40) std::memcpy(&tag, fmt + 24, 2);
            } else if (!std::memcmp(hdr, "data", 4)) {
                data_off = pos; data_size = size;
                if (tag) break;
            }
            std::fseek(f, pos + size + (size & 1), SEEK_SET);
        }
        if (tag != 1 || data_off < 0 || channels == 0 ||
            (bits != 16 && bits != 24)) {
            std::fclose(f); job->status.store(-3); return;
        }
        if (channels != job->expect_channels && job->expect_channels > 0) {
            std::fclose(f); job->status.store(-4); return;
        }
        const int64_t bpf = (int64_t)channels * (bits / 8);
        std::fseek(f, 0, SEEK_END);
        const int64_t actual = std::ftell(f) - data_off;
        std::fseek(f, data_off, SEEK_SET);
        int64_t frames = std::min<int64_t>(data_size, actual) / bpf;
        frames = std::min<int64_t>(frames, job->max_frames);
        std::vector<uint8_t> buf(frames * bpf);
        if ((int64_t)std::fread(buf.data(), 1, buf.size(), f) != (int64_t)buf.size()) {
            std::fclose(f); job->status.store(-5); return;
        }
        std::fclose(f);
        // convert + deinterleave
        for (int32_t c = 0; c < channels; ++c) {
            float* d = job->dst + (int64_t)c * job->max_frames;
            if (bits == 16) {
                constexpr float inv = 1.0f / 32768.0f;
                const uint8_t* s = buf.data() + c * 2;
                for (int64_t i = 0; i < frames; ++i, s += bpf) {
                    int16_t v;
                    std::memcpy(&v, s, 2);
                    d[i] = (float)v * inv;
                }
            } else {
                constexpr float inv = 1.0f / 8388608.0f;
                const uint8_t* s = buf.data() + c * 3;
                for (int64_t i = 0; i < frames; ++i, s += bpf) {
                    int32_t v = (int32_t)((uint32_t)s[0] | ((uint32_t)s[1] << 8) |
                                          ((uint32_t)s[2] << 16));
                    v = (v << 8) >> 8;
                    d[i] = (float)v * inv;
                }
            }
        }
        job->frames_read = frames;
        job->rate = (int32_t)rate;
        job->status.store(1);
    }
};

}  // namespace

extern "C" {

void* f9_loader_create(int32_t n_threads) { return new Loader(n_threads); }
void f9_loader_destroy(void* loader) { delete (Loader*)loader; }

// Submit: returns a ticket (job pointer) to poll.
void* f9_loader_submit(void* loader, const char* path, float* dst,
                       int64_t max_frames, int32_t expect_channels) {
    auto* L = (Loader*)loader;
    auto* job = new LoadJob();
    job->path = path;
    job->dst = dst;
    job->max_frames = max_frames;
    job->expect_channels = expect_channels;
    {
        std::lock_guard<std::mutex> g(L->mu);
        L->jobs.push_back(job);
        L->pending.push(job);
    }
    L->cv.notify_one();
    return job;
}

// Poll: 0 = pending, 1 = done, <0 = error; on done fills frames/rate.
int32_t f9_loader_poll(void* ticket, int64_t* frames, int32_t* rate) {
    auto* job = (LoadJob*)ticket;
    const int32_t st = job->status.load();
    if (st == 1) {
        *frames = job->frames_read;
        *rate = job->rate;
    }
    return st;
}

}  // extern "C"
