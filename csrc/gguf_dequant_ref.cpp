// Independent GGUF dequantizer — the second decoder for every quant tier
// this framework writes (q8_0/q4_0/q4_1/q5_0/q5_1/q2_K..q6_K/iq4_nl/iq4_xs).
//
// Purpose (VERDICT r3 #4): csrc/gguf_quant.cpp holds both the quantizer
// and a dequantizer transcribed together — a transcription typo there
// would self-validate. This file is a fresh implementation of the PUBLIC
// GGUF/ggml wire format (block layouts per ggml-quants.c / the gguf spec;
// ggml is MIT-licensed, Copyright (c) 2023-2024 The ggml authors), written
// and compiled SEPARATELY from the quantizer. tests/test_gguf_ref_decode.py
// cross-checks every tier bit-exactly through both decoders.
//
// Build: g++ -O3 -shared -fPIC -o libgguf_dequant_ref.so gguf_dequant_ref.cpp

#include <cstdint>
#include <cstring>

namespace {

// standalone IEEE fp16 -> fp32 (no shared helpers with the quantizer)
float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;  // +-0
        } else {
            // subnormal: normalize
            int e = -1;
            uint32_t m = man;
            do { m <<= 1; ++e; } while (!(m & 0x400));
            bits = sign | ((uint32_t)(127 - 15 - e) << 23)
                 | ((m & 0x3FF) << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (man << 13);  // inf/nan
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

inline float load_f16(const uint8_t* p) {
    uint16_t h;
    std::memcpy(&h, p, 2);
    return f16_to_f32(h);
}

// 6-bit scale/min extraction for q4_K / q5_K superblocks
// (ggml get_scale_min_k4 packing)
inline void scale_min_k4(int j, const uint8_t* s, uint8_t* d, uint8_t* m) {
    if (j < 4) {
        *d = s[j] & 63;
        *m = s[j + 4] & 63;
    } else {
        *d = (s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4);
        *m = (s[j + 4] >> 4) | ((s[j] >> 6) << 4);
    }
}

const int8_t IQ4NL_VALUES[16] = {
    -127, -104, -83, -65, -49, -35, -22, -10,
    1, 13, 25, 38, 53, 69, 89, 113};

}  // namespace

extern "C" {

// ---- 32-element blocks ----------------------------------------------------

// q8_0: { fp16 d; int8 qs[32] } = 34 bytes
void ref_dequant_q8_0(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 32; ++b) {
        const uint8_t* p = src + b * 34;
        float d = load_f16(p);
        const int8_t* q = (const int8_t*)(p + 2);
        for (int j = 0; j < 32; ++j) dst[b * 32 + j] = d * q[j];
    }
}

// q4_0: { fp16 d; uint8 qs[16] } = 18 bytes; value = d * (nibble - 8),
// low nibbles are elements 0..15, high nibbles 16..31
void ref_dequant_q4_0(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 32; ++b) {
        const uint8_t* p = src + b * 18;
        float d = load_f16(p);
        const uint8_t* q = p + 2;
        float* y = dst + b * 32;
        for (int j = 0; j < 16; ++j) {
            y[j] = d * (int)((q[j] & 0xF) - 8);
            y[j + 16] = d * (int)((q[j] >> 4) - 8);
        }
    }
}

// q4_1: { fp16 d; fp16 m; uint8 qs[16] } = 20 bytes; value = d*q + m
void ref_dequant_q4_1(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 32; ++b) {
        const uint8_t* p = src + b * 20;
        float d = load_f16(p), m = load_f16(p + 2);
        const uint8_t* q = p + 4;
        float* y = dst + b * 32;
        for (int j = 0; j < 16; ++j) {
            y[j] = d * (q[j] & 0xF) + m;
            y[j + 16] = d * (q[j] >> 4) + m;
        }
    }
}

// q5_0: { fp16 d; uint32 qh; uint8 qs[16] } = 22 bytes;
// 5th bit of element j from qh bit j (low half) / j+12? — per the format:
// x0 = ((qs[j] & 0xF) | (((qh >> j) & 1) << 4)) - 16
// x1 = ((qs[j] >> 4) | (((qh >> (j+16)) & 1) << 4)) - 16
void ref_dequant_q5_0(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 32; ++b) {
        const uint8_t* p = src + b * 22;
        float d = load_f16(p);
        uint32_t qh;
        std::memcpy(&qh, p + 2, 4);
        const uint8_t* q = p + 6;
        float* y = dst + b * 32;
        for (int j = 0; j < 16; ++j) {
            int lo = (q[j] & 0xF) | (((qh >> j) & 1) << 4);
            int hi = (q[j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
            y[j] = d * (lo - 16);
            y[j + 16] = d * (hi - 16);
        }
    }
}

// q5_1: { fp16 d; fp16 m; uint32 qh; uint8 qs[16] } = 24 bytes; d*q + m
void ref_dequant_q5_1(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 32; ++b) {
        const uint8_t* p = src + b * 24;
        float d = load_f16(p), m = load_f16(p + 2);
        uint32_t qh;
        std::memcpy(&qh, p + 4, 4);
        const uint8_t* q = p + 8;
        float* y = dst + b * 32;
        for (int j = 0; j < 16; ++j) {
            int lo = (q[j] & 0xF) | (((qh >> j) & 1) << 4);
            int hi = (q[j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
            y[j] = d * lo + m;
            y[j + 16] = d * hi + m;
        }
    }
}

// iq4_nl: { fp16 d; uint8 qs[16] } = 18 bytes; LUT values
void ref_dequant_iq4_nl(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 32; ++b) {
        const uint8_t* p = src + b * 18;
        float d = load_f16(p);
        const uint8_t* q = p + 2;
        float* y = dst + b * 32;
        for (int j = 0; j < 16; ++j) {
            y[j] = d * IQ4NL_VALUES[q[j] & 0xF];
            y[j + 16] = d * IQ4NL_VALUES[q[j] >> 4];
        }
    }
}

// ---- 256-element superblocks ----------------------------------------------

// q2_K: { uint8 scales[16]; uint8 qs[64]; fp16 d; fp16 dmin } = 84 bytes
// 16 sub-blocks of 16; scale nibbles: low = scale, high = min
void ref_dequant_q2_K(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 256; ++b) {
        const uint8_t* p = src + b * 84;
        const uint8_t* scales = p;
        const uint8_t* q = p + 16;
        float d = load_f16(p + 80), dmin = load_f16(p + 82);
        float* y = dst + b * 256;
        int is = 0;
        for (int half = 0; half < 2; ++half) {       // 128 elements each
            for (int shift = 0; shift < 8; shift += 2) {
                uint8_t sc = scales[is++];
                float dl = d * (sc & 0xF), ml = dmin * (sc >> 4);
                for (int l = 0; l < 16; ++l)
                    *y++ = dl * ((q[l] >> shift) & 3) - ml;
                sc = scales[is++];
                dl = d * (sc & 0xF);
                ml = dmin * (sc >> 4);
                for (int l = 0; l < 16; ++l)
                    *y++ = dl * ((q[l + 16] >> shift) & 3) - ml;
            }
            q += 32;
        }
    }
}

// q3_K: { uint8 hmask[32]; uint8 qs[64]; uint8 scales[12]; fp16 d } = 110
// 16 six-bit signed scales (packed 4+2 bits); element = 2-bit q minus 4
// unless its high-mask bit is set
void ref_dequant_q3_K(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 256; ++b) {
        const uint8_t* p = src + b * 110;
        const uint8_t* hm = p;
        const uint8_t* q = p + 32;
        const uint8_t* sb = p + 96;
        float d = load_f16(p + 108);
        // unpack 16 6-bit scales: low 4 bits from the first 8 bytes'
        // nibbles, high 2 bits from the last 4 bytes
        int8_t sc[16];
        for (int j = 0; j < 16; ++j) {
            int lo = (j < 8) ? (sb[j] & 0xF) : (sb[j - 8] >> 4);
            int hi = (sb[8 + (j % 4)] >> (2 * (j / 4))) & 3;
            sc[j] = (int8_t)((lo | (hi << 4)) - 32);
        }
        float* y = dst + b * 256;
        int is = 0;
        uint8_t m = 1;
        for (int half = 0; half < 2; ++half) {
            for (int shift = 0; shift < 8; shift += 2) {
                float dl = d * sc[is++];
                for (int l = 0; l < 16; ++l)
                    *y++ = dl * (((q[l] >> shift) & 3)
                                 - ((hm[l] & m) ? 0 : 4));
                dl = d * sc[is++];
                for (int l = 0; l < 16; ++l)
                    *y++ = dl * (((q[l + 16] >> shift) & 3)
                                 - ((hm[l + 16] & m) ? 0 : 4));
                m <<= 1;
            }
            q += 32;
        }
    }
}

// q4_K: { fp16 d; fp16 dmin; uint8 scales[12]; uint8 qs[128] } = 144
void ref_dequant_q4_K(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 256; ++b) {
        const uint8_t* p = src + b * 144;
        float d = load_f16(p), dmin = load_f16(p + 2);
        const uint8_t* scales = p + 4;
        const uint8_t* q = p + 16;
        float* y = dst + b * 256;
        for (int j = 0; j < 8; j += 2) {
            uint8_t sd, sm;
            scale_min_k4(j, scales, &sd, &sm);
            float d1 = d * sd, m1 = dmin * sm;
            scale_min_k4(j + 1, scales, &sd, &sm);
            float d2 = d * sd, m2 = dmin * sm;
            for (int l = 0; l < 32; ++l) *y++ = d1 * (q[l] & 0xF) - m1;
            for (int l = 0; l < 32; ++l) *y++ = d2 * (q[l] >> 4) - m2;
            q += 32;
        }
    }
}

// q5_K: { fp16 d; fp16 dmin; uint8 scales[12]; uint8 qh[32];
//         uint8 qs[128] } = 176
void ref_dequant_q5_K(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 256; ++b) {
        const uint8_t* p = src + b * 176;
        float d = load_f16(p), dmin = load_f16(p + 2);
        const uint8_t* scales = p + 4;
        const uint8_t* qh = p + 16;
        const uint8_t* ql = p + 48;
        float* y = dst + b * 256;
        uint8_t u1 = 1, u2 = 2;
        for (int j = 0; j < 8; j += 2) {
            uint8_t sd, sm;
            scale_min_k4(j, scales, &sd, &sm);
            float d1 = d * sd, m1 = dmin * sm;
            scale_min_k4(j + 1, scales, &sd, &sm);
            float d2 = d * sd, m2 = dmin * sm;
            for (int l = 0; l < 32; ++l)
                *y++ = d1 * ((ql[l] & 0xF) + ((qh[l] & u1) ? 16 : 0)) - m1;
            for (int l = 0; l < 32; ++l)
                *y++ = d2 * ((ql[l] >> 4) + ((qh[l] & u2) ? 16 : 0)) - m2;
            ql += 32;
            u1 <<= 2;
            u2 <<= 2;
        }
    }
}

// q6_K: { uint8 ql[128]; uint8 qh[64]; int8 scales[16]; fp16 d } = 210
void ref_dequant_q6_K(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 256; ++b) {
        const uint8_t* p = src + b * 210;
        const uint8_t* ql = p;
        const uint8_t* qh = p + 128;
        const int8_t* sc = (const int8_t*)(p + 192);
        float d = load_f16(p + 208);
        float* y = dst + b * 256;
        for (int half = 0; half < 2; ++half) {
            for (int l = 0; l < 32; ++l) {
                int is = l / 16;
                int q1 = (int)((ql[l] & 0xF) | (((qh[l] >> 0) & 3) << 4)) - 32;
                int q2 = (int)((ql[l + 32] & 0xF)
                               | (((qh[l] >> 2) & 3) << 4)) - 32;
                int q3 = (int)((ql[l] >> 4) | (((qh[l] >> 4) & 3) << 4)) - 32;
                int q4 = (int)((ql[l + 32] >> 4)
                               | (((qh[l] >> 6) & 3) << 4)) - 32;
                y[l] = d * sc[is] * q1;
                y[l + 32] = d * sc[is + 2] * q2;
                y[l + 64] = d * sc[is + 4] * q3;
                y[l + 96] = d * sc[is + 6] * q4;
            }
            y += 128;
            ql += 64;
            qh += 32;
            sc += 8;
        }
    }
}

// iq4_xs: { fp16 d; uint16 scales_h; uint8 scales_l[4]; uint8 qs[128] }
//         = 136 bytes; 8 sub-blocks of 32, 6-bit scales minus 32, LUT
void ref_dequant_iq4_xs(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t b = 0; b < n / 256; ++b) {
        const uint8_t* p = src + b * 136;
        float d = load_f16(p);
        uint16_t sh;
        std::memcpy(&sh, p + 2, 2);
        const uint8_t* sl = p + 4;
        const uint8_t* q = p + 8;
        float* y = dst + b * 256;
        for (int ib = 0; ib < 8; ++ib) {
            int ls = ((sl[ib / 2] >> (4 * (ib % 2))) & 0xF)
                     | (((sh >> (2 * ib)) & 3) << 4);
            float dl = d * (ls - 32);
            for (int j = 0; j < 16; ++j) {
                y[j] = dl * IQ4NL_VALUES[q[j] & 0xF];
                y[j + 16] = dl * IQ4NL_VALUES[q[j] >> 4];
            }
            q += 16;
            y += 32;
        }
    }
}

}  // extern "C"
