// Native point-cloud preprocessing for the host data path.
//
// Plays the role the CUDA PointUtils extension plays in the reference
// (`/root/reference/models/PointUtils/` — the native layer under the Python
// framework), but for the TPU design the device compute lives in XLA/Pallas,
// so the native win is on the *host*: fused .pcd.bin decode + range filter +
// fixed-N resample feeding the input pipeline without numpy temporaries.
//
// Exposed as a plain C ABI consumed via ctypes (`data/native.py`); the
// Python pipeline falls back to numpy when the library isn't built.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// SplitMix64 — tiny, seedable, deterministic across platforms.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed + 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  // uniform integer in [0, n)
  uint64_t below(uint64_t n) { return next() % n; }
};

}  // namespace

extern "C" {

// Fused range-filter + fixed-count resample.
//   pts:        n_in * stride floats, xyz in the first 3 slots of each record
//   max_range:  keep points with ||xyz|| < max_range
//   n_out:      output point count (pad by random duplication / random
//               subsample without replacement — the reference resampler's
//               semantics, dataset_utils.py:177-223)
//   out_xyz:    n_out * 3 floats
//   out_inten:  n_out floats (slot 3 of each record if stride > 3, else 0)
// Returns the number of points that survived the filter (before resample).
int64_t pc_filter_resample(const float* pts, int64_t n_in, int32_t stride,
                           float max_range, int64_t n_out, uint64_t seed,
                           float* out_xyz, float* out_inten) {
  std::vector<int64_t> keep;
  keep.reserve(static_cast<size_t>(n_in));
  const float r2 = max_range * max_range;
  for (int64_t i = 0; i < n_in; ++i) {
    const float* p = pts + i * stride;
    const float d2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2];
    if (d2 < r2) keep.push_back(i);
  }
  int64_t kept = static_cast<int64_t>(keep.size());
  if (kept == 0) {
    std::memset(out_xyz, 0, sizeof(float) * static_cast<size_t>(n_out) * 3);
    std::memset(out_inten, 0, sizeof(float) * static_cast<size_t>(n_out));
    return 0;
  }

  Rng rng(seed);
  std::vector<int64_t> sel;
  sel.reserve(static_cast<size_t>(n_out));
  if (kept <= n_out) {
    for (int64_t i = 0; i < kept; ++i) sel.push_back(keep[static_cast<size_t>(i)]);
    for (int64_t i = kept; i < n_out; ++i)
      sel.push_back(keep[static_cast<size_t>(rng.below(static_cast<uint64_t>(kept)))]);
  } else {
    // partial Fisher-Yates: first n_out entries are a uniform sample
    // without replacement
    for (int64_t i = 0; i < n_out; ++i) {
      int64_t j = i + static_cast<int64_t>(rng.below(static_cast<uint64_t>(kept - i)));
      std::swap(keep[static_cast<size_t>(i)], keep[static_cast<size_t>(j)]);
      sel.push_back(keep[static_cast<size_t>(i)]);
    }
  }

  for (int64_t i = 0; i < n_out; ++i) {
    const float* p = pts + sel[static_cast<size_t>(i)] * stride;
    out_xyz[i * 3 + 0] = p[0];
    out_xyz[i * 3 + 1] = p[1];
    out_xyz[i * 3 + 2] = p[2];
    out_inten[i] = stride > 3 ? p[3] : 0.0f;
  }
  return kept;
}

// Decode a .pcd.bin file (float32 records) + filter + resample in one pass.
// Record width is inferred from the byte size (5, then 4, then 6 floats).
// Returns surviving point count, or -1 on IO error, -2 on bad record width.
int64_t pc_load_bin(const char* path, float max_range, int64_t n_out,
                    uint64_t seed, float* out_xyz, float* out_inten) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t n_floats = bytes / static_cast<int64_t>(sizeof(float));
  int32_t stride = 0;
  for (int32_t w : {5, 4, 6}) {
    if (n_floats % w == 0) { stride = w; break; }
  }
  if (stride == 0) { std::fclose(f); return -2; }
  std::vector<float> buf(static_cast<size_t>(n_floats));
  const size_t got = std::fread(buf.data(), sizeof(float), buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;
  return pc_filter_resample(buf.data(), n_floats / stride, stride, max_range,
                            n_out, seed, out_xyz, out_inten);
}

// Apply a rigid transform in place: pts [n, 3], T row-major [4, 4].
void pc_transform(float* pts, int64_t n, const float* T) {
  for (int64_t i = 0; i < n; ++i) {
    float* p = pts + i * 3;
    const float x = p[0], y = p[1], z = p[2];
    p[0] = T[0] * x + T[1] * y + T[2] * z + T[3];
    p[1] = T[4] * x + T[5] * y + T[6] * z + T[7];
    p[2] = T[8] * x + T[9] * y + T[10] * z + T[11];
  }
}

}  // extern "C"
