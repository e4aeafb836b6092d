// Native ray-record packer for the FilesystemDataset chunk writer.
//
// The disk-shuffle hot path (reference `filesystem_dataset.py:304-338`)
// permutes tens of millions of ray records and scatters them across N chunk
// buffers per flush. In Python that is a single-threaded fancy-index per
// array; at TB scale (README.md:95 — "hundreds of GBs / several TBs") it
// starves the writer threads. This library does the permute-gather with a
// thread pool, one pass, no GIL.
//
// C ABI (ctypes): all buffers are caller-allocated.
//   shuffle_gather_f32 / _u8 / _i32:
//     out[i * width .. ] = in[perm[i] * width .. ]  for i in [0, n)
//   interleave3_u8: split an (n, 3) u8 array into 3 planar columns
//     (parquet wants columnar) while applying the permutation.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

template <typename T>
void gather_rows(const T* in, const int64_t* perm, T* out, int64_t n,
                 int64_t width, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  const int64_t block = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * block;
    const int64_t hi = std::min(n, lo + block);
    if (lo >= hi) break;
    pool.emplace_back([=] {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(out + i * width, in + perm[i] * width,
                    sizeof(T) * static_cast<size_t>(width));
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

void shuffle_gather_f32(const float* in, const int64_t* perm, float* out,
                        int64_t n, int64_t width, int n_threads) {
  gather_rows(in, perm, out, n, width, n_threads);
}

void shuffle_gather_u8(const uint8_t* in, const int64_t* perm, uint8_t* out,
                       int64_t n, int64_t width, int n_threads) {
  gather_rows(in, perm, out, n, width, n_threads);
}

void shuffle_gather_i32(const int32_t* in, const int64_t* perm, int32_t* out,
                        int64_t n, int64_t width, int n_threads) {
  gather_rows(in, perm, out, n, width, n_threads);
}

// Permute (n, 3) u8 rows into 3 planar output columns in one pass.
void interleave3_u8(const uint8_t* in, const int64_t* perm, uint8_t* out0,
                    uint8_t* out1, uint8_t* out2, int64_t n, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  const int64_t block = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * block;
    const int64_t hi = std::min(n, lo + block);
    if (lo >= hi) break;
    pool.emplace_back([=] {
      for (int64_t i = lo; i < hi; ++i) {
        const uint8_t* row = in + perm[i] * 3;
        out0[i] = row[0];
        out1[i] = row[1];
        out2[i] = row[2];
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
