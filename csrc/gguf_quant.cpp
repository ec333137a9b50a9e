// GGUF block quantization — native quantizer for export.
//
// Replaces the llama.cpp subprocess the reference shells out to for
// quantization (reference: unsloth/save.py:1445-1814 builds llama.cpp and
// runs llama-quantize). The algorithms below implement the public GGML
// quantization formats (Q8_0, Q4_0/1, Q5_0/1, Q2_K..Q6_K, IQ4) with the
// same arithmetic (roundf = round-half-away-from-zero, fp16 scale storage)
// so outputs are bit-compatible with llama.cpp's quantizer.
//
// Attribution: the block layouts and quantization searches (make_qkx2_quants,
// make_qx_quants, make_q3_quants, the IQ4 codebook search) are transcribed
// from ggml's ggml-quants.c — ggml / llama.cpp, MIT License,
// Copyright (c) 2023-2024 The ggml authors. Identical arithmetic is required
// for artifacts that llama.cpp readers decode bit-exactly.
//
// Imatrix: the *_K row-API entry points accept optional per-column
// importance weights (quant_weights), mirroring llama.cpp's imatrix-aware
// k-quant path (weights = qw * sqrt(sigma2 + x^2)).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libgguf_quant.so gguf_quant.cpp
// ABI: plain C, ctypes-friendly.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// fp32 -> fp16 (IEEE 754 binary16) with round-to-nearest-even.
inline uint16_t fp32_to_fp16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (((x >> 23) & 0xFF) == 0xFF) {           // inf/nan
        return (uint16_t)(sign | 0x7C00u | (mant ? 0x200u : 0));
    }
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
    if (exp <= 0) {                              // subnormal or zero
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = 1u << (shift - 1);
        uint32_t q = mant >> shift;
        // round to nearest even
        if ((mant & (half * 2 - 1)) > half ||
            (((mant & (half * 2 - 1)) == half) && (q & 1))) q++;
        return (uint16_t)(sign | q);
    }
    uint32_t q = mant >> 13;
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (q & 1))) {
        q++;
        if (q == 0x400u) { q = 0; exp++; if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u); }
    }
    return (uint16_t)(sign | ((uint32_t)exp << 10) | q);
}

inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1Fu;
    uint32_t mant = h & 0x3FFu;
    uint32_t x;
    if (exp == 0) {
        if (mant == 0) { x = sign; }
        else {
            exp = 127 - 15 + 1;
            while (!(mant & 0x400u)) { mant <<= 1; exp--; }
            mant &= 0x3FFu;
            x = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        x = sign | 0x7F800000u | (mant << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

}  // namespace

extern "C" {

// ---- Q8_0: blocks of 32; layout per block: fp16 d, 32 x int8 -------------
// d = amax / 127; q = roundf(x / d)

void quantize_q8_0(const float* src, uint8_t* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const float* x = src + b * QK;
        float amax = 0.0f;
        for (int i = 0; i < QK; i++) {
            float ax = std::fabs(x[i]);
            if (ax > amax) amax = ax;
        }
        const float d = amax / 127.0f;
        const float id = d != 0.0f ? 1.0f / d : 0.0f;
        uint8_t* out = dst + b * (2 + QK);
        const uint16_t dh = fp32_to_fp16(d);
        std::memcpy(out, &dh, 2);
        int8_t* q = (int8_t*)(out + 2);
        for (int i = 0; i < QK; i++) {
            q[i] = (int8_t)std::roundf(x[i] * id);
        }
    }
}

void dequantize_q8_0(const uint8_t* src, float* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const uint8_t* in = src + b * (2 + QK);
        uint16_t dh;
        std::memcpy(&dh, in, 2);
        const float d = fp16_to_fp32(dh);
        const int8_t* q = (const int8_t*)(in + 2);
        float* x = dst + b * QK;
        for (int i = 0; i < QK; i++) x[i] = q[i] * d;
    }
}

// ---- Q4_0: blocks of 32; layout: fp16 d, 16 bytes (two nibbles) ----------
// d = max_by_abs / -8; q = clamp(roundf? no: (x/d + 8.5) trunc, llama.cpp
// uses MIN(15, (int8)(x*id + 8.5f)) — i.e. add 8.5 and truncate.
// nibble j holds elem j (low) and elem j+16 (high).

void quantize_q4_0(const float* src, uint8_t* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const float* x = src + b * QK;
        float amax = 0.0f, maxv = 0.0f;
        for (int i = 0; i < QK; i++) {
            float ax = std::fabs(x[i]);
            if (ax > amax) { amax = ax; maxv = x[i]; }
        }
        const float d = maxv / -8.0f;
        const float id = d != 0.0f ? 1.0f / d : 0.0f;
        uint8_t* out = dst + b * (2 + QK / 2);
        const uint16_t dh = fp32_to_fp16(d);
        std::memcpy(out, &dh, 2);
        uint8_t* q = out + 2;
        for (int i = 0; i < QK / 2; i++) {
            float v0 = x[i] * id + 8.5f;
            float v1 = x[i + QK / 2] * id + 8.5f;
            uint8_t q0 = (uint8_t)(v0 < 0 ? 0 : (v0 > 15.0f ? 15 : (uint8_t)v0));
            uint8_t q1 = (uint8_t)(v1 < 0 ? 0 : (v1 > 15.0f ? 15 : (uint8_t)v1));
            q[i] = q0 | (q1 << 4);
        }
    }
}

void dequantize_q4_0(const uint8_t* src, float* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const uint8_t* in = src + b * (2 + QK / 2);
        uint16_t dh;
        std::memcpy(&dh, in, 2);
        const float d = fp16_to_fp32(dh);
        const uint8_t* q = in + 2;
        float* x = dst + b * QK;
        for (int i = 0; i < QK / 2; i++) {
            x[i] = ((int)(q[i] & 0x0F) - 8) * d;
            x[i + QK / 2] = ((int)(q[i] >> 4) - 8) * d;
        }
    }
}

// ---- Q4_1: blocks of 32; layout: fp16 d, fp16 m, 16 bytes nibbles --------
// d = (max - min) / 15; q = clamp((x - min)/d + 0.5 trunc, 0, 15); value =
// d*q + m (m = min). Matches ggml quantize_row_q4_1_ref.

void quantize_q4_1(const float* src, uint8_t* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const float* x = src + b * QK;
        float vmin = x[0], vmax = x[0];
        for (int i = 1; i < QK; i++) {
            if (x[i] < vmin) vmin = x[i];
            if (x[i] > vmax) vmax = x[i];
        }
        const float d = (vmax - vmin) / 15.0f;
        const float id = d != 0.0f ? 1.0f / d : 0.0f;
        uint8_t* out = dst + b * 20;
        const uint16_t dh = fp32_to_fp16(d);
        const uint16_t mh = fp32_to_fp16(vmin);
        std::memcpy(out, &dh, 2);
        std::memcpy(out + 2, &mh, 2);
        uint8_t* q = out + 4;
        for (int i = 0; i < QK / 2; i++) {
            float v0 = (x[i] - vmin) * id + 0.5f;
            float v1 = (x[i + QK / 2] - vmin) * id + 0.5f;
            uint8_t q0 = (uint8_t)(v0 < 0 ? 0 : (v0 > 15.0f ? 15 : (uint8_t)v0));
            uint8_t q1 = (uint8_t)(v1 < 0 ? 0 : (v1 > 15.0f ? 15 : (uint8_t)v1));
            q[i] = q0 | (q1 << 4);
        }
    }
}

void dequantize_q4_1(const uint8_t* src, float* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const uint8_t* in = src + b * 20;
        uint16_t dh, mh;
        std::memcpy(&dh, in, 2);
        std::memcpy(&mh, in + 2, 2);
        const float d = fp16_to_fp32(dh), m = fp16_to_fp32(mh);
        const uint8_t* q = in + 4;
        float* x = dst + b * QK;
        for (int i = 0; i < QK / 2; i++) {
            x[i] = (q[i] & 0x0F) * d + m;
            x[i + QK / 2] = (q[i] >> 4) * d + m;
        }
    }
}

// ---- Q5_0: blocks of 32; layout: fp16 d, 4 bytes qh, 16 bytes nibbles ----
// d = max_by_abs / -16; q = clamp((x/d + 16.5) trunc, 0, 31); bit 4 of each
// element goes into the qh bitfield. Matches ggml quantize_row_q5_0_ref.

void quantize_q5_0(const float* src, uint8_t* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const float* x = src + b * QK;
        float amax = 0.0f, maxv = 0.0f;
        for (int i = 0; i < QK; i++) {
            float ax = std::fabs(x[i]);
            if (ax > amax) { amax = ax; maxv = x[i]; }
        }
        const float d = maxv / -16.0f;
        const float id = d != 0.0f ? 1.0f / d : 0.0f;
        uint8_t* out = dst + b * 22;
        const uint16_t dh = fp32_to_fp16(d);
        std::memcpy(out, &dh, 2);
        uint32_t qh = 0;
        uint8_t* q = out + 6;
        for (int i = 0; i < QK / 2; i++) {
            float v0 = x[i] * id + 16.5f;
            float v1 = x[i + QK / 2] * id + 16.5f;
            uint8_t q0 = (uint8_t)(v0 < 0 ? 0 : (v0 > 31.0f ? 31 : (uint8_t)v0));
            uint8_t q1 = (uint8_t)(v1 < 0 ? 0 : (v1 > 31.0f ? 31 : (uint8_t)v1));
            q[i] = (q0 & 0x0F) | ((q1 & 0x0F) << 4);
            qh |= ((uint32_t)(q0 >> 4)) << i;
            qh |= ((uint32_t)(q1 >> 4)) << (i + QK / 2);
        }
        std::memcpy(out + 2, &qh, 4);
    }
}

void dequantize_q5_0(const uint8_t* src, float* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const uint8_t* in = src + b * 22;
        uint16_t dh;
        uint32_t qh;
        std::memcpy(&dh, in, 2);
        std::memcpy(&qh, in + 2, 4);
        const float d = fp16_to_fp32(dh);
        const uint8_t* q = in + 6;
        float* x = dst + b * QK;
        for (int i = 0; i < QK / 2; i++) {
            int h0 = (int)((qh >> i) & 1) << 4;
            int h1 = (int)((qh >> (i + QK / 2)) & 1) << 4;
            x[i] = (((q[i] & 0x0F) | h0) - 16) * d;
            x[i + QK / 2] = (((q[i] >> 4) | h1) - 16) * d;
        }
    }
}

// ---- Q5_1: blocks of 32; layout: fp16 d, fp16 m, 4B qh, 16B nibbles ------
// d = (max - min) / 31; q = clamp((x - min)/d + 0.5 trunc, 0, 31);
// value = d*q + m. Matches ggml quantize_row_q5_1_ref.

void quantize_q5_1(const float* src, uint8_t* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const float* x = src + b * QK;
        float vmin = x[0], vmax = x[0];
        for (int i = 1; i < QK; i++) {
            if (x[i] < vmin) vmin = x[i];
            if (x[i] > vmax) vmax = x[i];
        }
        const float d = (vmax - vmin) / 31.0f;
        const float id = d != 0.0f ? 1.0f / d : 0.0f;
        uint8_t* out = dst + b * 24;
        const uint16_t dh = fp32_to_fp16(d);
        const uint16_t mh = fp32_to_fp16(vmin);
        std::memcpy(out, &dh, 2);
        std::memcpy(out + 2, &mh, 2);
        uint32_t qh = 0;
        uint8_t* q = out + 8;
        for (int i = 0; i < QK / 2; i++) {
            float v0 = (x[i] - vmin) * id + 0.5f;
            float v1 = (x[i + QK / 2] - vmin) * id + 0.5f;
            uint8_t q0 = (uint8_t)(v0 < 0 ? 0 : (v0 > 31.0f ? 31 : (uint8_t)v0));
            uint8_t q1 = (uint8_t)(v1 < 0 ? 0 : (v1 > 31.0f ? 31 : (uint8_t)v1));
            q[i] = (q0 & 0x0F) | ((q1 & 0x0F) << 4);
            qh |= ((uint32_t)(q0 >> 4)) << i;
            qh |= ((uint32_t)(q1 >> 4)) << (i + QK / 2);
        }
        std::memcpy(out + 4, &qh, 4);
    }
}

void dequantize_q5_1(const uint8_t* src, float* dst, int64_t n) {
    const int QK = 32;
    const int64_t nb = n / QK;
    for (int64_t b = 0; b < nb; b++) {
        const uint8_t* in = src + b * 24;
        uint16_t dh, mh;
        uint32_t qh;
        std::memcpy(&dh, in, 2);
        std::memcpy(&mh, in + 2, 2);
        std::memcpy(&qh, in + 4, 4);
        const float d = fp16_to_fp32(dh), m = fp16_to_fp32(mh);
        const uint8_t* q = in + 8;
        float* x = dst + b * QK;
        for (int i = 0; i < QK / 2; i++) {
            int h0 = (int)((qh >> i) & 1) << 4;
            int h1 = (int)((qh >> (i + QK / 2)) & 1) << 4;
            x[i] = ((q[i] & 0x0F) | h0) * d + m;
            x[i + QK / 2] = ((q[i] >> 4) | h1) * d + m;
        }
    }
}

// ---- fp32 -> fp16 buffer conversion ---------------------------------------

void fp32_to_fp16_buffer(const float* src, uint16_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; i++) dst[i] = fp32_to_fp16(src[i]);
}

}  // extern "C"

// ---- K-quants (QK_K = 256 super-blocks) -----------------------------------
// Layouts and quantization searches implement the public GGML K-quant
// formats (block_q4_K, block_q6_K) with llama.cpp's algorithm semantics
// (make_qkx2_quants / make_qx_quants searches) so outputs are
// bit-compatible with llama-quantize.

namespace {

constexpr int QK_K = 256;

float make_qkx2_quants(int n, int nmax, const float* x, const float* weights,
                       uint8_t* L, float* the_min, uint8_t* Laux,
                       float rmin, float rdelta, int nstep,
                       bool use_mad) {
    float min = x[0];
    float max = x[0];
    float sum_w = weights[0];
    float sum_x = sum_w * x[0];
    for (int i = 1; i < n; ++i) {
        if (x[i] < min) min = x[i];
        if (x[i] > max) max = x[i];
        float w = weights[i];
        sum_w += w;
        sum_x += w * x[i];
    }
    if (min > 0) min = 0;
    if (max == min) {
        for (int i = 0; i < n; ++i) L[i] = 0;
        *the_min = -min;
        return 0.f;
    }
    float iscale = nmax / (max - min);
    float scale = 1 / iscale;
    float best_mad = 0;
    for (int i = 0; i < n; ++i) {
        int l = (int)std::nearbyint(iscale * (x[i] - min));
        L[i] = (uint8_t)(l < 0 ? 0 : (l > nmax ? nmax : l));
        float diff = scale * L[i] + min - x[i];
        diff = use_mad ? std::fabs(diff) : diff * diff;
        best_mad += weights[i] * diff;
    }
    if (nstep < 1) {
        *the_min = -min;
        return scale;
    }
    for (int is = 0; is <= nstep; ++is) {
        iscale = (rmin + rdelta * is + nmax) / (max - min);
        float sum_l = 0, sum_l2 = 0, sum_xl = 0;
        for (int i = 0; i < n; ++i) {
            int l = (int)std::nearbyint(iscale * (x[i] - min));
            l = l < 0 ? 0 : (l > nmax ? nmax : l);
            Laux[i] = (uint8_t)l;
            float w = weights[i];
            sum_l += w * l;
            sum_l2 += w * l * l;
            sum_xl += w * l * x[i];
        }
        float D = sum_w * sum_l2 - sum_l * sum_l;
        if (D > 0) {
            float this_scale = (sum_w * sum_xl - sum_x * sum_l) / D;
            float this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D;
            if (this_min > 0) {
                this_min = 0;
                this_scale = sum_xl / sum_l2;
            }
            float mad = 0;
            for (int i = 0; i < n; ++i) {
                float diff = this_scale * Laux[i] + this_min - x[i];
                diff = use_mad ? std::fabs(diff) : diff * diff;
                mad += weights[i] * diff;
            }
            if (mad < best_mad) {
                for (int i = 0; i < n; ++i) L[i] = Laux[i];
                best_mad = mad;
                scale = this_scale;
                min = this_min;
            }
        }
    }
    *the_min = -min;
    return scale;
}

float make_qx_quants(int n, int nmax, const float* x, int8_t* L,
                     int rmse_type, const float* qw = nullptr) {
    float max = 0, amax = 0;
    for (int i = 0; i < n; ++i) {
        float ax = std::fabs(x[i]);
        if (ax > amax) { amax = ax; max = x[i]; }
    }
    if (amax < 1e-30f) {
        for (int i = 0; i < n; ++i) L[i] = 0;
        return 0.f;
    }
    float iscale = -nmax / max;
    if (rmse_type == 0) {
        for (int i = 0; i < n; ++i) {
            int l = (int)std::nearbyint(iscale * x[i]);
            L[i] = (int8_t)(nmax + (l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l)));
        }
        return 1 / iscale;
    }
    float sumlx = 0, suml2 = 0;
    for (int i = 0; i < n; ++i) {
        int l = (int)std::nearbyint(iscale * x[i]);
        l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
        L[i] = (int8_t)(l + nmax);
        float w = qw ? qw[i] : x[i] * x[i];
        sumlx += w * x[i] * l;
        suml2 += w * l * l;
    }
    float scale = suml2 ? sumlx / suml2 : 0.0f;
    float best = scale * sumlx;
    for (int is = -9; is <= 9; ++is) {
        if (is == 0) continue;
        iscale = -(nmax + 0.1f * is) / max;
        sumlx = suml2 = 0;
        for (int i = 0; i < n; ++i) {
            int l = (int)std::nearbyint(iscale * x[i]);
            l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
            float w = qw ? qw[i] : x[i] * x[i];
            sumlx += w * x[i] * l;
            suml2 += w * l * l;
        }
        if (suml2 > 0 && sumlx * sumlx > best * suml2) {
            for (int i = 0; i < n; ++i) {
                int l = (int)std::nearbyint(iscale * x[i]);
                L[i] = (int8_t)(nmax + (l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l)));
            }
            scale = sumlx / suml2;
            best = scale * sumlx;
        }
    }
    return scale;
}

// ggml's make_q3_quants: signed [-nmax, nmax-1] search with x^2 weighting
// and a 5-round coordinate-descent refinement. L out is offset by +nmax.
float make_q3_quants(int n, int nmax, const float* x, int8_t* L,
                     bool do_rmse) {
    float max = 0, amax = 0;
    for (int i = 0; i < n; ++i) {
        float ax = std::fabs(x[i]);
        if (ax > amax) { amax = ax; max = x[i]; }
    }
    if (amax < 1e-30f) {
        for (int i = 0; i < n; ++i) L[i] = 0;
        return 0.f;
    }
    float iscale = -nmax / max;
    if (do_rmse) {
        float sumlx = 0, suml2 = 0;
        for (int i = 0; i < n; ++i) {
            int l = (int)std::nearbyint(iscale * x[i]);
            l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
            L[i] = (int8_t)l;
            float w = x[i] * x[i];
            sumlx += w * x[i] * l;
            suml2 += w * l * l;
        }
        for (int itry = 0; itry < 5; ++itry) {
            int n_changed = 0;
            for (int i = 0; i < n; ++i) {
                float w = x[i] * x[i];
                float slx = sumlx - w * x[i] * L[i];
                if (slx > 0) {
                    float sl2 = suml2 - w * L[i] * L[i];
                    int new_l = (int)std::nearbyint(x[i] * sl2 / slx);
                    new_l = new_l < -nmax ? -nmax
                        : (new_l > nmax - 1 ? nmax - 1 : new_l);
                    if (new_l != L[i]) {
                        slx += w * x[i] * new_l;
                        sl2 += w * new_l * new_l;
                        if (sl2 > 0 && slx * slx * suml2 > sumlx * sumlx * sl2) {
                            L[i] = (int8_t)new_l;
                            sumlx = slx;
                            suml2 = sl2;
                            ++n_changed;
                        }
                    }
                }
            }
            if (!n_changed) break;
        }
        for (int i = 0; i < n; ++i) L[i] = (int8_t)(L[i] + nmax);
        return suml2 > 0 ? sumlx / suml2 : 0.0f;
    }
    for (int i = 0; i < n; ++i) {
        int l = (int)std::nearbyint(iscale * x[i]);
        l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
        L[i] = (int8_t)(l + nmax);
    }
    return 1 / iscale;
}

inline void get_scale_min_k4(int j, const uint8_t* q, uint8_t* d,
                             uint8_t* m) {
    if (j < 4) {
        *d = q[j] & 63;
        *m = q[j + 4] & 63;
    } else {
        *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

// Per-sub-block weight builder: llama.cpp's imatrix-aware k-quant weighting
// (weights = qw * sqrt(sigma2 + x^2)) vs the reference per-block heuristic.
inline void kquant_weights(const float* x, const float* qw, float sigma2,
                           int n, float* weights) {
    if (qw) {
        for (int l = 0; l < n; ++l)
            weights[l] = qw[l] * std::sqrt(sigma2 + x[l] * x[l]);
    } else {
        float sum_x2 = 0;
        for (int l = 0; l < n; ++l) sum_x2 += x[l] * x[l];
        float av_x = std::sqrt(sum_x2 / n);
        for (int l = 0; l < n; ++l)
            weights[l] = av_x + std::fabs(x[l]);
    }
}

inline float superblock_sigma2(const float* x) {
    float sumx2 = 0;
    for (int l = 0; l < QK_K; ++l) sumx2 += x[l] * x[l];
    return sumx2 / QK_K;
}

// block_q4_K: { fp16 d; fp16 dmin; uint8 scales[12]; uint8 qs[128]; } = 144B

void quantize_q4_K_block(const float* x, uint8_t* y, const float* qw) {
    uint8_t L[QK_K], Laux[32];
    float weights[32], mins[QK_K / 32], scales[QK_K / 32];
    {
        const float sigma2 = qw ? superblock_sigma2(x) : 0.f;
        float max_scale = 0, max_min = 0;
        for (int j = 0; j < QK_K / 32; ++j) {
            kquant_weights(x + 32 * j, qw ? qw + 32 * j : nullptr, sigma2,
                           32, weights);
            scales[j] = make_qkx2_quants(32, 15, x + 32 * j, weights,
                                         L + 32 * j, &mins[j], Laux,
                                         -1.f, 0.1f, 20, false);
            if (scales[j] > max_scale) max_scale = scales[j];
            if (mins[j] > max_min) max_min = mins[j];
        }
        float inv_scale = max_scale > 0 ? 63.f / max_scale : 0.f;
        float inv_min = max_min > 0 ? 63.f / max_min : 0.f;
        uint8_t* sc = y + 4;
        for (int j = 0; j < QK_K / 32; ++j) {
            uint8_t ls = (uint8_t)std::nearbyint(inv_scale * scales[j]);
            uint8_t lm = (uint8_t)std::nearbyint(inv_min * mins[j]);
            ls = ls < 63 ? ls : 63;
            lm = lm < 63 ? lm : 63;
            if (j < 4) {
                sc[j] = ls;
                sc[j + 4] = lm;
            } else {
                sc[j + 4] = (ls & 0xF) | ((lm & 0xF) << 4);
                sc[j - 4] |= ((ls >> 4) << 6);
                sc[j] |= ((lm >> 4) << 6);
            }
        }
        const float d = max_scale / 63.f;
        const float dmin = max_min / 63.f;
        uint16_t dh = fp32_to_fp16(d), dminh = fp32_to_fp16(dmin);
        std::memcpy(y, &dh, 2);
        std::memcpy(y + 2, &dminh, 2);
        // requantize with the decoded (6-bit) scales
        for (int j = 0; j < QK_K / 32; ++j) {
            uint8_t sd, sm;
            get_scale_min_k4(j, sc, &sd, &sm);
            const float dj = d * sd;
            if (!dj) continue;
            const float mj = dmin * sm;
            for (int l = 0; l < 32; ++l) {
                int q = (int)std::nearbyint((x[32 * j + l] + mj) / dj);
                q = q < 0 ? 0 : (q > 15 ? 15 : q);
                L[32 * j + l] = (uint8_t)q;
            }
        }
        uint8_t* qs = y + 16;
        for (int j = 0; j < QK_K; j += 64) {
            for (int l = 0; l < 32; ++l)
                qs[j / 2 + l] = L[j + l] | (L[j + l + 32] << 4);
        }
    }
}

// block_q5_K: { fp16 d; fp16 dmin; uint8 scales[12]; uint8 qh[32];
//               uint8 qs[128]; } = 176B. Same 6-bit scale machinery as
// q4_K with nmax=31 (ggml quantize_row_q5_K: rmin=-0.5, nstep=15).

void quantize_q5_K_block(const float* x, uint8_t* y, const float* qw) {
    uint8_t L[QK_K], Laux[32];
    float weights[32], mins[QK_K / 32], scales[QK_K / 32];
    const float sigma2 = qw ? superblock_sigma2(x) : 0.f;
    float max_scale = 0, max_min = 0;
    for (int j = 0; j < QK_K / 32; ++j) {
        kquant_weights(x + 32 * j, qw ? qw + 32 * j : nullptr, sigma2,
                       32, weights);
        scales[j] = make_qkx2_quants(32, 31, x + 32 * j, weights,
                                     L + 32 * j, &mins[j], Laux,
                                     -0.5f, 0.1f, 15, false);
        if (scales[j] > max_scale) max_scale = scales[j];
        if (mins[j] > max_min) max_min = mins[j];
    }
    float inv_scale = max_scale > 0 ? 63.f / max_scale : 0.f;
    float inv_min = max_min > 0 ? 63.f / max_min : 0.f;
    uint8_t* sc = y + 4;
    std::memset(sc, 0, 12);
    for (int j = 0; j < QK_K / 32; ++j) {
        uint8_t ls = (uint8_t)std::nearbyint(inv_scale * scales[j]);
        uint8_t lm = (uint8_t)std::nearbyint(inv_min * mins[j]);
        ls = ls < 63 ? ls : 63;
        lm = lm < 63 ? lm : 63;
        if (j < 4) {
            sc[j] = ls;
            sc[j + 4] = lm;
        } else {
            sc[j + 4] = (ls & 0xF) | ((lm & 0xF) << 4);
            sc[j - 4] |= ((ls >> 4) << 6);
            sc[j] |= ((lm >> 4) << 6);
        }
    }
    const float d = max_scale / 63.f;
    const float dmin = max_min / 63.f;
    uint16_t dh = fp32_to_fp16(d), dminh = fp32_to_fp16(dmin);
    std::memcpy(y, &dh, 2);
    std::memcpy(y + 2, &dminh, 2);
    for (int j = 0; j < QK_K / 32; ++j) {
        uint8_t sd, sm;
        get_scale_min_k4(j, sc, &sd, &sm);
        const float dj = d * sd;
        if (!dj) continue;
        const float mj = dmin * sm;
        for (int l = 0; l < 32; ++l) {
            int q = (int)std::nearbyint((x[32 * j + l] + mj) / dj);
            q = q < 0 ? 0 : (q > 31 ? 31 : q);
            L[32 * j + l] = (uint8_t)q;
        }
    }
    uint8_t* qh = y + 16;
    uint8_t* ql = y + 48;
    std::memset(qh, 0, 32);
    uint8_t m1 = 1, m2 = 2;
    for (int j = 0; j < QK_K; j += 64) {
        for (int l = 0; l < 32; ++l) {
            int l1 = L[j + l];
            int l2 = L[j + l + 32];
            if (l1 > 15) { l1 -= 16; qh[l] |= m1; }
            if (l2 > 15) { l2 -= 16; qh[l] |= m2; }
            ql[j / 2 + l] = (uint8_t)(l1 | (l2 << 4));
        }
        m1 = (uint8_t)(m1 << 2);
        m2 = (uint8_t)(m2 << 2);
    }
}

// block_q3_K: { uint8 hmask[32]; uint8 qs[64]; uint8 scales[12];
//               fp16 d; } = 110B. 16 sub-blocks of 16 with 6-bit signed
// scales; values in [-4, 3] (low 2 bits in qs, the +4 bit in hmask).

void quantize_q3_K_block(const float* x, uint8_t* y, const float* qw) {
    int8_t L[QK_K];
    float scales[QK_K / 16];
    float weights[16];
    const float sigma2 = qw ? superblock_sigma2(x) : 0.f;
    for (int j = 0; j < QK_K / 16; ++j) {
        if (qw) {
            kquant_weights(x + 16 * j, qw + 16 * j, sigma2, 16, weights);
            scales[j] = make_qx_quants(16, 4, x + 16 * j, L + 16 * j, 1,
                                       weights);
        } else {
            scales[j] = make_q3_quants(16, 4, x + 16 * j, L + 16 * j, true);
        }
    }
    uint8_t* hmask = y;
    uint8_t* qs = y + 32;
    uint8_t* scp = y + 96;
    std::memset(scp, 0, 12);
    float max_scale = 0, amax = 0;
    for (int j = 0; j < QK_K / 16; ++j) {
        float a = std::fabs(scales[j]);
        if (a > amax) { amax = a; max_scale = scales[j]; }
    }
    float d_val = 0.f;
    if (max_scale != 0.f) {
        float iscale = -32.f / max_scale;
        for (int j = 0; j < QK_K / 16; ++j) {
            int l = (int)std::nearbyint(iscale * scales[j]);
            l = (l < -32 ? -32 : (l > 31 ? 31 : l)) + 32;
            if (j < 8) scp[j] = (uint8_t)(l & 0xF);
            else scp[j - 8] |= (uint8_t)((l & 0xF) << 4);
            l >>= 4;
            scp[8 + j % 4] |= (uint8_t)(l << (2 * (j / 4)));
        }
        d_val = 1 / iscale;
    }
    uint16_t dh = fp32_to_fp16(d_val);
    std::memcpy(y + 108, &dh, 2);
    const float df = fp16_to_fp32(dh);
    // requantize with the decoded 6-bit scales
    for (int j = 0; j < QK_K / 16; ++j) {
        int sc8 = j < 8 ? (scp[j] & 0xF) : (scp[j - 8] >> 4);
        sc8 = (sc8 | (((scp[8 + j % 4] >> (2 * (j / 4))) & 3) << 4)) - 32;
        const float dj = df * sc8;
        if (!dj) {
            for (int ii = 0; ii < 16; ++ii) L[16 * j + ii] = 4;
            continue;
        }
        for (int ii = 0; ii < 16; ++ii) {
            int l = (int)std::nearbyint(x[16 * j + ii] / dj);
            l = l < -4 ? -4 : (l > 3 ? 3 : l);
            L[16 * j + ii] = (int8_t)(l + 4);
        }
    }
    std::memset(hmask, 0, 32);
    int hm = 0;
    uint8_t m = 1;
    for (int j = 0; j < QK_K; ++j) {
        if (L[j] > 3) { hmask[hm] |= m; L[j] = (int8_t)(L[j] - 4); }
        if (++hm == 32) { hm = 0; m = (uint8_t)(m << 1); }
    }
    for (int j = 0; j < QK_K; j += 128) {
        for (int l = 0; l < 32; ++l) {
            qs[j / 4 + l] = (uint8_t)(L[j + l] | (L[j + l + 32] << 2)
                                      | (L[j + l + 64] << 4)
                                      | (L[j + l + 96] << 6));
        }
    }
}

// block_q2_K: { uint8 scales[16]; uint8 qs[64]; fp16 d; fp16 dmin; } = 84B.
// 16 sub-blocks of 16 with 4-bit scale + 4-bit min; 2-bit values.

void quantize_q2_K_block(const float* x, uint8_t* y, const float* qw) {
    uint8_t L[QK_K], Laux[16];
    float weights[16], mins[QK_K / 16], scales[QK_K / 16];
    const float q4scale = 15.f;
    const float sigma2 = qw ? superblock_sigma2(x) : 0.f;
    uint8_t* scp = y;
    uint8_t* qs = y + 16;
    float max_scale = 0, max_min = 0;
    for (int j = 0; j < QK_K / 16; ++j) {
        if (qw) {
            kquant_weights(x + 16 * j, qw + 16 * j, sigma2, 16, weights);
        } else {
            for (int l = 0; l < 16; ++l)
                weights[l] = std::fabs(x[16 * j + l]);
        }
        scales[j] = make_qkx2_quants(16, 3, x + 16 * j, weights,
                                     L + 16 * j, &mins[j], Laux,
                                     -0.5f, 0.1f, 15, true);
        if (scales[j] > max_scale) max_scale = scales[j];
        if (mins[j] > max_min) max_min = mins[j];
    }
    float d_val = 0.f, dmin_val = 0.f;
    if (max_scale > 0) {
        float iscale = q4scale / max_scale;
        for (int j = 0; j < QK_K / 16; ++j)
            scp[j] = (uint8_t)std::nearbyint(iscale * scales[j]);
        d_val = max_scale / q4scale;
    } else {
        std::memset(scp, 0, 16);
    }
    if (max_min > 0) {
        float iscale = q4scale / max_min;
        for (int j = 0; j < QK_K / 16; ++j) {
            uint8_t l = (uint8_t)std::nearbyint(iscale * mins[j]);
            scp[j] |= (uint8_t)(l << 4);
        }
        dmin_val = max_min / q4scale;
    }
    uint16_t dh = fp32_to_fp16(d_val), dminh = fp32_to_fp16(dmin_val);
    std::memcpy(y + 80, &dh, 2);
    std::memcpy(y + 82, &dminh, 2);
    const float df = fp16_to_fp32(dh), dminf = fp16_to_fp32(dminh);
    for (int j = 0; j < QK_K / 16; ++j) {
        const float dj = df * (scp[j] & 0xF);
        if (!dj) {
            for (int ii = 0; ii < 16; ++ii) L[16 * j + ii] = 0;
            continue;
        }
        const float mj = dminf * (scp[j] >> 4);
        for (int ii = 0; ii < 16; ++ii) {
            int l = (int)std::nearbyint((x[16 * j + ii] + mj) / dj);
            l = l < 0 ? 0 : (l > 3 ? 3 : l);
            L[16 * j + ii] = (uint8_t)l;
        }
    }
    for (int j = 0; j < QK_K; j += 128) {
        for (int l = 0; l < 32; ++l) {
            qs[j / 4 + l] = (uint8_t)(L[j + l] | (L[j + l + 32] << 2)
                                      | (L[j + l + 64] << 4)
                                      | (L[j + l + 96] << 6));
        }
    }
}

}  // namespace

extern "C" {

void quantize_q4_K(const float* src, uint8_t* dst, int64_t nrow,
                   int64_t n_per_row, const float* quant_weights) {
    const int64_t nbr = n_per_row / QK_K;
    for (int64_t r = 0; r < nrow; ++r) {
        for (int64_t ib = 0; ib < nbr; ++ib) {
            quantize_q4_K_block(
                src + r * n_per_row + ib * QK_K,
                dst + (r * nbr + ib) * 144,
                quant_weights ? quant_weights + ib * QK_K : nullptr);
        }
    }
}

void quantize_q5_K(const float* src, uint8_t* dst, int64_t nrow,
                   int64_t n_per_row, const float* quant_weights) {
    const int64_t nbr = n_per_row / QK_K;
    for (int64_t r = 0; r < nrow; ++r) {
        for (int64_t ib = 0; ib < nbr; ++ib) {
            quantize_q5_K_block(
                src + r * n_per_row + ib * QK_K,
                dst + (r * nbr + ib) * 176,
                quant_weights ? quant_weights + ib * QK_K : nullptr);
        }
    }
}

void quantize_q3_K(const float* src, uint8_t* dst, int64_t nrow,
                   int64_t n_per_row, const float* quant_weights) {
    const int64_t nbr = n_per_row / QK_K;
    for (int64_t r = 0; r < nrow; ++r) {
        for (int64_t ib = 0; ib < nbr; ++ib) {
            quantize_q3_K_block(
                src + r * n_per_row + ib * QK_K,
                dst + (r * nbr + ib) * 110,
                quant_weights ? quant_weights + ib * QK_K : nullptr);
        }
    }
}

void quantize_q2_K(const float* src, uint8_t* dst, int64_t nrow,
                   int64_t n_per_row, const float* quant_weights) {
    const int64_t nbr = n_per_row / QK_K;
    for (int64_t r = 0; r < nrow; ++r) {
        for (int64_t ib = 0; ib < nbr; ++ib) {
            quantize_q2_K_block(
                src + r * n_per_row + ib * QK_K,
                dst + (r * nbr + ib) * 84,
                quant_weights ? quant_weights + ib * QK_K : nullptr);
        }
    }
}

void dequantize_q5_K(const uint8_t* src, float* dst, int64_t n) {
    const int64_t nb = n / QK_K;
    for (int64_t ib = 0; ib < nb; ++ib) {
        const uint8_t* y = src + ib * 176;
        float* x = dst + ib * QK_K;
        uint16_t dh, dminh;
        std::memcpy(&dh, y, 2);
        std::memcpy(&dminh, y + 2, 2);
        const float d = fp16_to_fp32(dh);
        const float dmin = fp16_to_fp32(dminh);
        const uint8_t* sc = y + 4;
        const uint8_t* qh = y + 16;
        const uint8_t* ql = y + 48;
        int is = 0;
        uint8_t u1 = 1, u2 = 2;
        for (int j = 0; j < QK_K; j += 64) {
            uint8_t sd1, sm1, sd2, sm2;
            get_scale_min_k4(is + 0, sc, &sd1, &sm1);
            get_scale_min_k4(is + 1, sc, &sd2, &sm2);
            const float d1 = d * sd1, m1 = dmin * sm1;
            const float d2 = d * sd2, m2 = dmin * sm2;
            for (int l = 0; l < 32; ++l)
                x[j + l] = d1 * ((ql[j / 2 + l] & 0xF)
                                 + ((qh[l] & u1) ? 16 : 0)) - m1;
            for (int l = 0; l < 32; ++l)
                x[j + 32 + l] = d2 * ((ql[j / 2 + l] >> 4)
                                      + ((qh[l] & u2) ? 16 : 0)) - m2;
            is += 2;
            u1 = (uint8_t)(u1 << 2);
            u2 = (uint8_t)(u2 << 2);
        }
    }
}

void dequantize_q3_K(const uint8_t* src, float* dst, int64_t n) {
    const int64_t nb = n / QK_K;
    for (int64_t ib = 0; ib < nb; ++ib) {
        const uint8_t* y = src + ib * 110;
        const uint8_t* hmask = y;
        const uint8_t* qs = y + 32;
        const uint8_t* scp = y + 96;
        uint16_t dh;
        std::memcpy(&dh, y + 108, 2);
        const float d_all = fp16_to_fp32(dh);
        float* x = dst + ib * QK_K;
        for (int j = 0; j < QK_K / 16; ++j) {
            int sc8 = j < 8 ? (scp[j] & 0xF) : (scp[j - 8] >> 4);
            sc8 = (sc8 | (((scp[8 + j % 4] >> (2 * (j / 4))) & 3) << 4))
                - 32;
            const float dl = d_all * sc8;
            for (int ii = 0; ii < 16; ++ii) {
                int idx = 16 * j + ii;
                int shift = 2 * ((idx % 128) / 32);
                int q = (qs[(idx / 128) * 32 + (idx % 32)] >> shift) & 3;
                int hbit = (hmask[idx % 32] >> (idx / 32)) & 1;
                x[idx] = dl * (q - (hbit ? 0 : 4));
            }
        }
    }
}

void dequantize_q2_K(const uint8_t* src, float* dst, int64_t n) {
    const int64_t nb = n / QK_K;
    for (int64_t ib = 0; ib < nb; ++ib) {
        const uint8_t* y = src + ib * 84;
        const uint8_t* scp = y;
        const uint8_t* qs = y + 16;
        uint16_t dh, dminh;
        std::memcpy(&dh, y + 80, 2);
        std::memcpy(&dminh, y + 82, 2);
        const float d = fp16_to_fp32(dh);
        const float dmin = fp16_to_fp32(dminh);
        float* x = dst + ib * QK_K;
        for (int j = 0; j < QK_K / 16; ++j) {
            const float dl = d * (scp[j] & 0xF);
            const float ml = dmin * (scp[j] >> 4);
            for (int ii = 0; ii < 16; ++ii) {
                int idx = 16 * j + ii;
                int shift = 2 * ((idx % 128) / 32);
                int q = (qs[(idx / 128) * 32 + (idx % 32)] >> shift) & 3;
                x[idx] = dl * q - ml;
            }
        }
    }
}

void dequantize_q4_K(const uint8_t* src, float* dst, int64_t n) {
    const int64_t nb = n / QK_K;
    for (int64_t ib = 0; ib < nb; ++ib) {
        const uint8_t* y = src + ib * 144;
        float* x = dst + ib * QK_K;
        uint16_t dh, dminh;
        std::memcpy(&dh, y, 2);
        std::memcpy(&dminh, y + 2, 2);
        const float d = fp16_to_fp32(dh);
        const float dmin = fp16_to_fp32(dminh);
        const uint8_t* sc = y + 4;
        const uint8_t* qs = y + 16;
        int is = 0;
        for (int j = 0; j < QK_K; j += 64) {
            uint8_t sd1, sm1, sd2, sm2;
            get_scale_min_k4(is + 0, sc, &sd1, &sm1);
            get_scale_min_k4(is + 1, sc, &sd2, &sm2);
            const float d1 = d * sd1, m1 = dmin * sm1;
            const float d2 = d * sd2, m2 = dmin * sm2;
            for (int l = 0; l < 32; ++l)
                x[j + l] = d1 * (qs[j / 2 + l] & 0xF) - m1;
            for (int l = 0; l < 32; ++l)
                x[j + 32 + l] = d2 * (qs[j / 2 + l] >> 4) - m2;
            is += 2;
        }
    }
}

// block_q6_K: { uint8 ql[128]; uint8 qh[64]; int8 scales[16]; fp16 d; } = 210B

void quantize_q6_K(const float* src, uint8_t* dst, int64_t nrow,
                   int64_t n_per_row, const float* quant_weights) {
    const int64_t nb = nrow * (n_per_row / QK_K);
    const int64_t nbr = n_per_row / QK_K;
    int8_t L[QK_K];
    float scales[QK_K / 16], weights[16];
    for (int64_t ib = 0; ib < nb; ++ib) {
        const float* x = src + ib * QK_K;
        const float* qw = quant_weights
            ? quant_weights + (ib % nbr) * QK_K : nullptr;
        const float sigma2 = qw ? superblock_sigma2(x) : 0.f;
        uint8_t* y = dst + ib * 210;
        uint8_t* ql = y;
        uint8_t* qh = y + 128;
        int8_t* scq = (int8_t*)(y + 192);
        float max_scale = 0, max_abs_scale = 0;
        for (int j = 0; j < QK_K / 16; ++j) {
            float scale;
            if (qw) {
                kquant_weights(x + 16 * j, qw + 16 * j, sigma2, 16,
                               weights);
                scale = make_qx_quants(16, 32, x + 16 * j, L + 16 * j, 1,
                                       weights);
            } else {
                scale = make_qx_quants(16, 32, x + 16 * j, L + 16 * j, 1);
            }
            scales[j] = scale;
            float abs_scale = std::fabs(scale);
            if (abs_scale > max_abs_scale) {
                max_abs_scale = abs_scale;
                max_scale = scale;
            }
        }
        if (max_abs_scale < 1e-30f) {
            std::memset(y, 0, 210);
            continue;
        }
        float iscale = -128.f / max_scale;
        float d = 1 / iscale;
        uint16_t dh = fp32_to_fp16(d);
        std::memcpy(y + 208, &dh, 2);
        for (int j = 0; j < QK_K / 16; ++j) {
            int s = (int)std::nearbyint(iscale * scales[j]);
            scq[j] = (int8_t)(s > 127 ? 127 : (s < -128 ? -128 : s));
        }
        const float df = fp16_to_fp32(dh);
        for (int j = 0; j < QK_K / 16; ++j) {
            float dj = df * scq[j];
            if (!dj) {
                for (int l = 0; l < 16; ++l) L[16 * j + l] = 32;
                continue;
            }
            for (int l = 0; l < 16; ++l) {
                int q = (int)std::nearbyint(x[16 * j + l] / dj);
                q = q < -32 ? -32 : (q > 31 ? 31 : q);
                L[16 * j + l] = (int8_t)(q + 32);
            }
        }
        for (int j = 0; j < QK_K; j += 128) {
            for (int l = 0; l < 32; ++l) {
                uint8_t q1 = (uint8_t)(L[j + l + 0] & 0xF);
                uint8_t q2 = (uint8_t)(L[j + l + 32] & 0xF);
                uint8_t q3 = (uint8_t)(L[j + l + 64] & 0xF);
                uint8_t q4 = (uint8_t)(L[j + l + 96] & 0xF);
                ql[j / 2 + l + 0] = q1 | (q3 << 4);
                ql[j / 2 + l + 32] = q2 | (q4 << 4);
                qh[j / 4 + l] = (uint8_t)((L[j + l] >> 4)
                                          | ((L[j + l + 32] >> 4) << 2)
                                          | ((L[j + l + 64] >> 4) << 4)
                                          | ((L[j + l + 96] >> 4) << 6));
            }
        }
    }
}

void dequantize_q6_K(const uint8_t* src, float* dst, int64_t n) {
    const int64_t nb = n / QK_K;
    for (int64_t ib = 0; ib < nb; ++ib) {
        const uint8_t* y = src + ib * 210;
        const uint8_t* ql = y;
        const uint8_t* qh = y + 128;
        const int8_t* sc = (const int8_t*)(y + 192);
        uint16_t dh;
        std::memcpy(&dh, y + 208, 2);
        const float d = fp16_to_fp32(dh);
        float* x = dst + ib * QK_K;
        for (int j = 0; j < QK_K; j += 128) {
            for (int l = 0; l < 32; ++l) {
                int is = j / 16 + l / 16;
                int q1 = (int)((ql[j / 2 + l] & 0xF)
                               | (((qh[j / 4 + l] >> 0) & 3) << 4)) - 32;
                int q2 = (int)((ql[j / 2 + l + 32] & 0xF)
                               | (((qh[j / 4 + l] >> 2) & 3) << 4)) - 32;
                int q3 = (int)((ql[j / 2 + l] >> 4)
                               | (((qh[j / 4 + l] >> 4) & 3) << 4)) - 32;
                int q4 = (int)((ql[j / 2 + l + 32] >> 4)
                               | (((qh[j / 4 + l] >> 6) & 3) << 4)) - 32;
                x[j + l + 0] = d * sc[is + 0] * q1;
                x[j + l + 32] = d * sc[is + 2] * q2;
                x[j + l + 64] = d * sc[is + 4] * q3;
                x[j + l + 96] = d * sc[is + 6] * q4;
            }
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// IQ4_NL / IQ4_XS — non-linear 4-bit quantization.
//
// Transcribes ggml's quantize_row_iq4_nl_impl (ggml-quants.c; ggml is MIT
// licensed) — identical arithmetic is REQUIRED for llama.cpp-compatible
// artifacts (reference: save.py:3806 runs llama-quantize for IQ types).
// The 16-entry non-linear codebook (kvalues_iq4nl) is a public constant.
// Optional per-row quant_weights plug in our imatrix collection
// (export/imatrix.py), matching llama.cpp's imatrix-weighted IQ4 search.
// ---------------------------------------------------------------------------

namespace {

const int8_t kvalues_iq4nl[16] = {
    -127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113,
};

constexpr float GROUP_MAX_EPS = 1e-15f;

inline int best_index_int8(int n, const int8_t* val, float x) {
    if (x <= val[0]) return 0;
    if (x >= val[n - 1]) return n - 1;
    int ml = 0, mu = n - 1;
    while (mu - ml > 1) {
        int mav = (ml + mu) / 2;
        if (x < val[mav]) mu = mav; else ml = mav;
    }
    return x - val[mu - 1] < val[mu] - x ? mu - 1 : mu;
}

// One super-block; ggml's quantize_row_iq4_nl_impl with ntry=7.
void quantize_iq4_block(const int super_block_size, const int block_size,
                        const float* x, uint16_t* dh, uint8_t* q4,
                        uint16_t* scales_h, uint8_t* scales_l,
                        float* scales, float* weights, uint8_t* L,
                        const int8_t* values, const float* quant_weights,
                        const int ntry) {
    float sigma2 = 0;
    for (int j = 0; j < super_block_size; ++j) sigma2 += x[j] * x[j];
    sigma2 *= 2.f / super_block_size;

    std::memset(q4, 0, super_block_size / 2);
    dh[0] = fp32_to_fp16(0.f);

    float max_scale = 0, amax_scale = 0;
    for (int ib = 0; ib < super_block_size / block_size; ++ib) {
        const float* xb = x + ib * block_size;
        uint8_t* Lb = L + ib * block_size;
        if (quant_weights) {
            const float* qw = quant_weights + ib * block_size;
            for (int j = 0; j < block_size; ++j)
                weights[j] = qw[j] * std::sqrt(sigma2 + xb[j] * xb[j]);
        } else {
            for (int j = 0; j < block_size; ++j) weights[j] = xb[j] * xb[j];
        }
        float amax = 0, max = 0;
        for (int j = 0; j < block_size; ++j) {
            float ax = std::fabs(xb[j]);
            if (ax > amax) { amax = ax; max = xb[j]; }
        }
        if (amax < GROUP_MAX_EPS) { scales[ib] = 0; continue; }
        float d = ntry > 0 ? -max / values[0] : max / values[0];
        float id = 1 / d;
        float sumqx = 0, sumq2 = 0;
        for (int j = 0; j < block_size; ++j) {
            float al = id * xb[j];
            int l = best_index_int8(16, values, al);
            Lb[j] = (uint8_t)l;
            float q = values[l];
            float w = weights[j];
            sumqx += w * q * xb[j];
            sumq2 += w * q * q;
        }
        d = sumqx / sumq2;
        float best = d * sumqx;
        for (int itry = -ntry; itry <= ntry; ++itry) {
            id = (itry + values[0]) / max;
            sumqx = sumq2 = 0;
            for (int j = 0; j < block_size; ++j) {
                float al = id * xb[j];
                int l = best_index_int8(16, values, al);
                float q = values[l];
                float w = weights[j];
                sumqx += w * q * xb[j];
                sumq2 += w * q * q;
            }
            if (sumq2 > 0 && sumqx * sumqx > best * sumq2) {
                d = sumqx / sumq2;
                best = d * sumqx;
            }
        }
        scales[ib] = d;
        float abs_d = std::fabs(d);
        if (abs_d > amax_scale) { amax_scale = abs_d; max_scale = d; }
    }

    if (super_block_size / block_size > 1) {
        std::memset(scales_h, 0,
                    (super_block_size / (8 * block_size)) * sizeof(uint16_t));
        float d = -max_scale / 32;
        dh[0] = fp32_to_fp16(d);
        float id = d ? 1 / d : 0.f;
        for (int ib = 0; ib < super_block_size / block_size; ++ib) {
            int l = (int)std::nearbyint(id * scales[ib]);
            l = l < -32 ? -32 : (l > 31 ? 31 : l);
            float dl = d * l;
            float idl = dl ? 1 / dl : 0.f;
            uint8_t* Lb = L + ib * block_size;
            const float* xb = x + ib * block_size;
            for (int j = 0; j < block_size; ++j)
                Lb[j] = (uint8_t)best_index_int8(16, values, idl * xb[j]);
            l += 32;
            uint8_t l_l = (uint8_t)(l & 0xF);
            uint8_t l_h = (uint8_t)(l >> 4);
            if (ib % 2 == 0) scales_l[ib / 2] = l_l;
            else scales_l[ib / 2] |= (uint8_t)(l_l << 4);
            scales_h[ib / 8] |= (uint16_t)(l_h << (2 * (ib % 8)));
        }
    } else {
        dh[0] = fp32_to_fp16(scales[0]);
        if (ntry > 0) {
            float id = scales[0] ? 1 / scales[0] : 0;
            for (int j = 0; j < super_block_size; ++j)
                L[j] = (uint8_t)best_index_int8(16, values, id * x[j]);
        }
    }

    for (int i = 0; i < super_block_size / 32; ++i) {
        for (int j = 0; j < 16; ++j)
            q4[16 * i + j] =
                (uint8_t)(L[32 * i + j] | (L[32 * i + 16 + j] << 4));
    }
}

}  // namespace

extern "C" {

// block_iq4_nl: { fp16 d; uint8 qs[16]; } = 18 B per 32 elements.
// quant_weights: per-row imatrix weights [n_per_row] or NULL.
void quantize_iq4_nl(const float* src, uint8_t* dst, int64_t nrow,
                     int64_t n_per_row, const float* quant_weights) {
    float scales[1], weights[32];
    uint8_t L[32];
    uint16_t unused_h;
    uint8_t unused_l[4];
    for (int64_t r = 0; r < nrow; ++r) {
        const float* x = src + r * n_per_row;
        uint8_t* y = dst + r * (n_per_row / 32) * 18;
        for (int64_t ib = 0; ib < n_per_row / 32; ++ib) {
            uint8_t* b = y + ib * 18;
            const float* qw =
                quant_weights ? quant_weights + 32 * ib : nullptr;
            quantize_iq4_block(32, 32, x + 32 * ib, (uint16_t*)b, b + 2,
                               &unused_h, unused_l, scales, weights, L,
                               kvalues_iq4nl, qw, 7);
        }
    }
}

void dequantize_iq4_nl(const uint8_t* src, float* dst, int64_t n) {
    const int64_t nb = n / 32;
    for (int64_t ib = 0; ib < nb; ++ib) {
        const uint8_t* y = src + ib * 18;
        float* x = dst + ib * 32;
        uint16_t dh;
        std::memcpy(&dh, y, 2);
        const float d = fp16_to_fp32(dh);
        const uint8_t* qs = y + 2;
        for (int j = 0; j < 16; ++j) {
            x[j] = d * kvalues_iq4nl[qs[j] & 0xF];
            x[j + 16] = d * kvalues_iq4nl[qs[j] >> 4];
        }
    }
}

// block_iq4_xs: { fp16 d; uint16 scales_h; uint8 scales_l[4];
//                 uint8 qs[128]; } = 136 B per 256 elements.
void quantize_iq4_xs(const float* src, uint8_t* dst, int64_t nrow,
                     int64_t n_per_row, const float* quant_weights) {
    float scales[8], weights[32];
    uint8_t L[256];
    for (int64_t r = 0; r < nrow; ++r) {
        const float* x = src + r * n_per_row;
        uint8_t* y = dst + r * (n_per_row / 256) * 136;
        for (int64_t ib = 0; ib < n_per_row / 256; ++ib) {
            uint8_t* b = y + ib * 136;
            const float* qw =
                quant_weights ? quant_weights + 256 * ib : nullptr;
            quantize_iq4_block(256, 32, x + 256 * ib, (uint16_t*)b,
                               b + 8, (uint16_t*)(b + 2), b + 4, scales,
                               weights, L, kvalues_iq4nl, qw, 7);
        }
    }
}

void dequantize_iq4_xs(const uint8_t* src, float* dst, int64_t n) {
    const int64_t nb = n / 256;
    for (int64_t ib = 0; ib < nb; ++ib) {
        const uint8_t* y = src + ib * 136;
        float* x = dst + ib * 256;
        uint16_t dh, scales_h;
        std::memcpy(&dh, y, 2);
        std::memcpy(&scales_h, y + 2, 2);
        const float d = fp16_to_fp32(dh);
        const uint8_t* scales_l = y + 4;
        const uint8_t* qs = y + 8;
        for (int ib32 = 0; ib32 < 8; ++ib32) {
            int ls = ((scales_l[ib32 / 2] >> (4 * (ib32 % 2))) & 0xF)
                     | (((scales_h >> (2 * ib32)) & 3) << 4);
            const float dl = d * (ls - 32);
            const uint8_t* q = qs + 16 * ib32;
            for (int j = 0; j < 16; ++j) {
                x[32 * ib32 + j] = dl * kvalues_iq4nl[q[j] & 0xF];
                x[32 * ib32 + 16 + j] = dl * kvalues_iq4nl[q[j] >> 4];
            }
        }
    }
}

}  // extern "C"
