// Host-side batch assembly for the input pipeline.
//
// The training loader's hot host operation is a strided row gather: pick
// `batch` rows (frames) out of the flat dataset arrays (poses_2d_gmm is
// ~[F, 17, K, 5] floats) into a contiguous batch buffer.  The reference
// hides the equivalent cost inside 32 torch DataLoader worker processes;
// here it is one multithreaded memcpy-gather.
//
// Also provides a CPU GMM kernel sampler (per-joint categorical over the
// kernel weights) for host-side pipelines that want the draw off-device.
//
// Built as a plain shared library (no pybind11); see diffpose_tpu/native.py
// for the ctypes binding.

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Gather rows: dst[i, :] = src[idx[i], :], rows of row_bytes bytes.
void gather_rows(const char* src, const int64_t* idx, char* dst,
                 int64_t n_rows, int64_t row_bytes) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
  }
}

// Multi-array gather with a shared index: for each of n_arrays,
// dst[a][i, :] = src[a][idx[i], :].
void gather_rows_multi(const char** srcs, const int64_t* row_bytes,
                       const int64_t* idx, char** dsts, int64_t n_rows,
                       int64_t n_arrays) {
#pragma omp parallel for schedule(static) collapse(2)
  for (int64_t a = 0; a < n_arrays; ++a) {
    for (int64_t i = 0; i < n_rows; ++i) {
      std::memcpy(dsts[a] + i * row_bytes[a], srcs[a] + idx[i] * row_bytes[a],
                  row_bytes[a]);
    }
  }
}

// Per-joint categorical draw over GMM kernel weights.
//   gmm:     [n, joints, kernels, 5]  (kernel = [w, mu_u, mu_v, var_u, var_v])
//   uniform: [n, joints]              (iid U[0,1) supplied by the caller)
//   out_uv / out_var: [n, joints, 2]  selected kernel mean / variance
void gmm_select(const float* gmm, const float* uniform, float* out_uv,
                float* out_var, int64_t n, int64_t joints, int64_t kernels) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < joints; ++j) {
      const float* row = gmm + ((i * joints + j) * kernels) * 5;
      float u = uniform[i * joints + j];
      float acc = 0.0f;
      int64_t pick = kernels - 1;
      for (int64_t k = 0; k < kernels; ++k) {
        acc += row[k * 5 + 0];
        if (u < acc) {
          pick = k;
          break;
        }
      }
      const float* sel = row + pick * 5;
      float* uv = out_uv + (i * joints + j) * 2;
      float* var = out_var + (i * joints + j) * 2;
      uv[0] = sel[1];
      uv[1] = sel[2];
      var[0] = sel[3];
      var[1] = sel[4];
    }
  }
}

int native_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
