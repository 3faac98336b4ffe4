// Native data-path runtime: threaded batch assembly + shuffling.
//
// The reference delegates its host data path to tf.data's C++ runtime
// (SURVEY.md §2#5 — no native code in the repo itself; the capability
// lives in the TF dependency).  This library is the rebuild's own native
// host runtime for the memcpy-heavy parts of batching:
//
//   * mcn_shuffle_indices  — per-epoch permutation (splitmix64 +
//     Fisher-Yates), deterministic in the seed.
//   * mcn_gather_batch     — gather N items of item_bytes each from a
//     pinned source pool into one contiguous batch buffer, fanned out
//     over worker threads.  This is the hot memcpy of every host batch
//     (numpy fancy indexing does it single-threaded with index checks).
//   * mcn_u8_to_f32_normalize — optional host-side fallback normalize
//     (the production path normalizes on-device; this serves CPU-only
//     smoke environments).
//
// Built with:  g++ -O3 -march=native -shared -fPIC -pthread
// Bound via ctypes (myconvnet_tpu/data/native_loader.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- shuffle

static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

void mcn_shuffle_indices(uint64_t seed, int64_t n, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  uint64_t s = seed ^ 0xD1B54A32D192ED03ull;
  for (int64_t i = n - 1; i > 0; --i) {
    uint64_t j = splitmix64(&s) % static_cast<uint64_t>(i + 1);
    int64_t t = out[i];
    out[i] = out[j];
    out[j] = t;
  }
}

// ----------------------------------------------------------------- gather

struct GatherArgs {
  const uint8_t* src;
  const int64_t* idx;
  uint8_t* dst;
  int64_t item_bytes;
  int64_t begin, end;
};

static void gather_range(const GatherArgs a) {
  for (int64_t i = a.begin; i < a.end; ++i) {
    std::memcpy(a.dst + i * a.item_bytes,
                a.src + a.idx[i] * a.item_bytes,
                static_cast<size_t>(a.item_bytes));
  }
}

void mcn_gather_batch(const uint8_t* src, const int64_t* idx,
                      int64_t batch, int64_t item_bytes, uint8_t* dst,
                      int n_threads) {
  if (n_threads <= 1 || batch < 2 * n_threads) {
    gather_range({src, idx, dst, item_bytes, 0, batch});
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(n_threads);
  int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < batch ? b + chunk : batch;
    if (b >= e) break;
    ts.emplace_back(gather_range,
                    GatherArgs{src, idx, dst, item_bytes, b, e});
  }
  for (auto& t : ts) t.join();
}

// ------------------------------------------------------- host normalize

struct NormArgs {
  const uint8_t* src;
  float* dst;
  const float* scale;   // per-channel: 1/(255*std)
  const float* shift;   // per-channel: -mean/std
  int64_t channels;
  int64_t begin, end;   // in pixels (channels-last groups)
};

static void norm_range(const NormArgs a) {
  for (int64_t p = a.begin; p < a.end; ++p) {
    const uint8_t* s = a.src + p * a.channels;
    float* d = a.dst + p * a.channels;
    for (int64_t c = 0; c < a.channels; ++c) {
      d[c] = static_cast<float>(s[c]) * a.scale[c] + a.shift[c];
    }
  }
}

void mcn_u8_to_f32_normalize(const uint8_t* src, float* dst,
                             const float* scale, const float* shift,
                             int64_t pixels, int64_t channels,
                             int n_threads) {
  if (n_threads <= 1 || pixels < 1 << 16) {
    norm_range({src, dst, scale, shift, channels, 0, pixels});
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (pixels + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk;
    int64_t e = b + chunk < pixels ? b + chunk : pixels;
    if (b >= e) break;
    ts.emplace_back(norm_range,
                    NormArgs{src, dst, scale, shift, channels, b, e});
  }
  for (auto& t : ts) t.join();
}

}  // extern "C"
