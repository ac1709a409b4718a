// Native batch assembly: pad-and-stack variable-length arrays.
//
// The data-plane hot loop (BatchWorker collate: speechflow_tpu/utils/pad.py
// stack_and_pad — the reference's pad_utils run per batch on every worker)
// spends its time copying N ragged numpy arrays into one padded contiguous
// (B, T_max, D) block. This does those copies in C++ (single pass, memcpy per
// row, zero temporary allocations), loaded via ctypes (no pybind11 in this
// image). Built by speechflow_tpu/utils/native.py on first use:
//
//   g++ -O3 -march=native -shared -fPIC batch_pack.cpp -o libbatch_pack.so

#include <cstdint>
#include <cstring>

extern "C" {

// Pack `n` float32 arrays (arr[i]: lens[i] rows of `row_elems` elements) into
// out (n, t_max, row_elems), zero-padding the tail rows. Rows beyond t_max
// are truncated. Returns 0 on success.
int pack_f32(const float** arrs, const int64_t* lens, int64_t n,
             int64_t t_max, int64_t row_elems, float pad_value, float* out) {
    const int64_t stride = t_max * row_elems;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t take = lens[i] < t_max ? lens[i] : t_max;
        float* dst = out + i * stride;
        std::memcpy(dst, arrs[i], static_cast<size_t>(take) * row_elems * sizeof(float));
        float* tail = dst + take * row_elems;
        const int64_t pad_elems = (t_max - take) * row_elems;
        if (pad_value == 0.0f) {
            std::memset(tail, 0, static_cast<size_t>(pad_elems) * sizeof(float));
        } else {
            for (int64_t k = 0; k < pad_elems; ++k) tail[k] = pad_value;
        }
    }
    return 0;
}

// int32 variant (token id sequences).
int pack_i32(const int32_t** arrs, const int64_t* lens, int64_t n,
             int64_t t_max, int64_t row_elems, int32_t pad_value, int32_t* out) {
    const int64_t stride = t_max * row_elems;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t take = lens[i] < t_max ? lens[i] : t_max;
        int32_t* dst = out + i * stride;
        std::memcpy(dst, arrs[i], static_cast<size_t>(take) * row_elems * sizeof(int32_t));
        int32_t* tail = dst + take * row_elems;
        const int64_t pad_elems = (t_max - take) * row_elems;
        for (int64_t k = 0; k < pad_elems; ++k) tail[k] = pad_value;
    }
    return 0;
}

}  // extern "C"
