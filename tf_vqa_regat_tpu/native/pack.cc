// Threaded row gather for host-side batch packing (BatchLoader._pack).
//
// The numpy fancy-index gather that assembles a [B*R, row] feature batch is
// GIL-bound single-threaded (~1.8 GB/s effective — measured, PERF_NOTES.md
// host-path study); this is a plain parallel memcpy over row indices that
// runs at memory bandwidth. Byte-generic: works for f32 and bf16 tables.
//
// Built lazily by tf_vqa_regat_tpu/native/__init__.py (g++ -O3 -shared);
// the loader falls back to numpy when no compiler is available.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// out[i] = tab[rows[i]] for rows[i] >= 0, else zeros. row_bytes per row.
void regat_gather_rows(const char* tab, const int64_t* rows, char* out,
                       int64_t n, int64_t row_bytes, int n_threads) {
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      char* dst = out + i * row_bytes;
      int64_t r = rows[i];
      if (r < 0) {
        std::memset(dst, 0, row_bytes);
      } else {
        std::memcpy(dst, tab + r * row_bytes, row_bytes);
      }
    }
  };
  if (n_threads <= 1) {
    work(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& th : ts) th.join();
}

}  // extern "C"
