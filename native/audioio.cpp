// Native audio runtime: multi-threaded decode, polyphase resampling, framing.
//
// The reference delegates its host-side audio path to third-party C libraries
// (librosa/soxr, torchcodec — SURVEY.md §2.2).  This is the framework's own
// native data-loader core: the host-side inner loops that feed the TPU
// (PCM decode + mono mix, polyphase FIR resampling, strided framing, RMS
// prescan) as OpenMP-parallel C++, exposed through a C ABI consumed via
// ctypes (speech_diarization_tpu/native/__init__.py).
//
// Build: g++ -O3 -shared -fPIC -fopenmp audioio.cpp -o libsdtpu_audioio.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------- decode ----
// Interleaved PCM -> float32 mono mix in [-1, 1].
// width: bytes per sample (1=u8, 2=i16, 3=i24, 4=i32), channels >= 1.
int sdtpu_decode_pcm(const uint8_t* in, int64_t n_frames, int channels,
                     int width, float* out) {
    if (!in || !out || channels < 1) return -1;
    if (width < 1 || width > 4) return -2;
    const double inv_ch = 1.0 / channels;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_frames; ++i) {
        double acc = 0.0;
        const uint8_t* p = in + (size_t)i * channels * width;
        for (int c = 0; c < channels; ++c) {
            const uint8_t* s = p + (size_t)c * width;
            double v = 0.0;
            switch (width) {
                case 1: v = ((int)s[0] - 128) / 128.0; break;
                case 2: {
                    int16_t x; std::memcpy(&x, s, 2);
                    v = x / 32768.0; break;
                }
                case 3: {
                    int32_t x = (int32_t)s[0] | ((int32_t)s[1] << 8) |
                                ((int32_t)s[2] << 16);
                    if (x >= (1 << 23)) x -= (1 << 24);
                    v = x / 8388608.0; break;
                }
                default: {  // width == 4
                    int32_t x; std::memcpy(&x, s, 4);
                    v = x / 2147483648.0; break;
                }
            }
            acc += v;
        }
        out[i] = (float)(acc * inv_ch);
    }
    return 0;
}

// -------------------------------------------------------------- resample ----
// Polyphase FIR up/down resampling (scipy.resample_poly semantics):
//   y[k] = sum_j h[j] * x_up[k*down - j + (nh-1)/2]   on the zero-stuffed
// up-sampled stream, evaluated without materializing it.
// h must already include the `up` gain; ny = ceil(nx * up / down).
int sdtpu_resample_poly(const float* x, int64_t nx, const float* h, int nh,
                        int up, int down, float* y, int64_t ny) {
    if (!x || !h || !y || up < 1 || down < 1) return -1;
    const int64_t half = (nh - 1) / 2;
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < ny; ++k) {
        // position on the up-sampled grid whose tap-0 aligns with h center
        const int64_t center = (int64_t)k * down;
        double acc = 0.0;
        // x_up[m] != 0 only when m % up == 0 (m/up indexes x)
        // tap j touches m = center + half - j
        const int64_t m_hi = center + half;
        const int64_t j0 = std::max<int64_t>(0, m_hi - (nx - 1) * (int64_t)up);
        const int64_t j1 = std::min<int64_t>(nh - 1, m_hi);
        // find first j >= j0 with (m_hi - j) % up == 0
        int64_t rem = ((m_hi - j0) % up + up) % up;
        for (int64_t j = j0 + rem; j <= j1; j += up) {
            const int64_t xi = (m_hi - j) / up;
            acc += (double)h[j] * (double)x[xi];
        }
        y[k] = (float)acc;
    }
    return 0;
}

// --------------------------------------------------------------- framing ----
// Strided copy into a dense [n_frames, win] grid with tail zero-padding.
int sdtpu_frame(const float* x, int64_t n, int win, int hop,
                float* out, int64_t n_frames) {
    if (!x || !out || win < 1 || hop < 1) return -1;
#pragma omp parallel for schedule(static)
    for (int64_t f = 0; f < n_frames; ++f) {
        const int64_t start = f * (int64_t)hop;
        float* row = out + (size_t)f * win;
        const int64_t avail = std::max<int64_t>(0, std::min<int64_t>(win, n - start));
        if (avail > 0) std::memcpy(row, x + start, (size_t)avail * sizeof(float));
        if (avail < win) std::memset(row + avail, 0, (size_t)(win - avail) * sizeof(float));
    }
    return 0;
}

// --------------------------------------------------------------- prescan ----
// Per-frame RMS in dB (the energy-VAD / silence-skip prescan).
int sdtpu_frame_rms_db(const float* x, int64_t n, int win, int hop,
                       float* out, int64_t n_frames) {
    if (!x || !out) return -1;
#pragma omp parallel for schedule(static)
    for (int64_t f = 0; f < n_frames; ++f) {
        const int64_t start = f * (int64_t)hop;
        const int64_t end = std::min<int64_t>(n, start + win);
        double acc = 0.0;
        for (int64_t i = start; i < end; ++i) acc += (double)x[i] * x[i];
        const double ms = acc / std::max<int64_t>(1, win);
        out[f] = (float)(10.0 * std::log10(ms + 1e-10));
    }
    return 0;
}

int sdtpu_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
