// CPU reference dequantizer for bitsandbytes-format NF4/FP4 tensors.
//
// SURVEY 2k.2: the Pallas NF4 dequant-inside-matmul kernel replaces the
// bitsandbytes CUDA library (reference: unsloth kernels/utils.py:567-679
// fast_dequantize double-dequant); this file is the small independent
// C++ oracle that the Python/numpy and JAX decode paths are tested
// against BIT-EXACTLY (tests/test_bnb_interop.py). Same fp32 op order
// as bnb's cdequantize_blockwise_fp32: one rounding per multiply/add.
//
// Build: g++ -O3 -shared -fPIC -o libnf4_ref.so nf4_ref.cpp

#include <cstdint>

extern "C" {

// Undo bnb's 8-bit double quantization of block scales.
//   absmax_f32[i] = nested_quant_map[codes[i]]
//                   * nested_absmax[i / nested_blocksize] + offset
void bnb_decode_absmax(const uint8_t* codes, int64_t n,
                       const float* nested_absmax,
                       const float* nested_quant_map,
                       int64_t nested_blocksize, float offset,
                       float* out) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = nested_quant_map[codes[i]]
                 * nested_absmax[i / nested_blocksize] + offset;
    }
}

// Flat interleaved-nibble dequant: element 2j sits in the HIGH nibble
// of byte j, element 2j+1 in the LOW nibble (bnb Linear4bit packing);
//   w[k] = quant_map[nibble_k] * absmax[k / blocksize]
void bnb_nf4_dequantize(const uint8_t* packed, int64_t n_elems,
                        const float* quant_map, const float* absmax,
                        int64_t blocksize, float* out) {
    for (int64_t k = 0; k < n_elems; ++k) {
        uint8_t byte = packed[k >> 1];
        uint8_t nib = (k & 1) ? (byte & 0xF) : (byte >> 4);
        out[k] = quant_map[nib] * absmax[k / blocksize];
    }
}

// Split-half layout used by unsloth_tpu's NF4Tensor: packed [N, in/2]
// row-major, HIGH nibbles hold columns [0, in/2), LOW nibbles hold
// columns [in/2, in); per-block fp32 absmax over the LOGICAL row.
void splithalf_nf4_dequantize(const uint8_t* packed, int64_t rows,
                              int64_t cols, const float* quant_map,
                              const float* absmax, int64_t blocksize,
                              float* out) {
    int64_t half = cols / 2;
    int64_t blocks_per_row = cols / blocksize;
    for (int64_t r = 0; r < rows; ++r) {
        const uint8_t* prow = packed + r * half;
        const float* arow = absmax + r * blocks_per_row;
        float* orow = out + r * cols;
        for (int64_t j = 0; j < half; ++j) {
            uint8_t byte = prow[j];
            orow[j] = quant_map[byte >> 4] * arow[j / blocksize];
            orow[half + j] =
                quant_map[byte & 0xF] * arow[(half + j) / blocksize];
        }
    }
}

}  // extern "C"
