// Native host-side library for dkt_stereo_tpu.
//
// The reference's native components are CUDA kernels (corr_sampler /
// alt_cuda_corr, core/corr.py:5-14) plus torch's C++ DataLoader machinery.
// On TPU the device-side kernels live in Pallas (ops/pallas/); this library
// provides the *host-side* native pieces:
//
//   - pfm_read / pfm_write: allocation-free PFM codec (the dominant decode
//     cost for SceneFlow-scale training, core/utils/frame_utils.py:62-109)
//   - corr_pyramid_lookup_cpu: multithreaded C++ implementation of the
//     correlation-pyramid lookup — the CPU oracle used to cross-check the
//     Pallas kernel and a host fallback for CPU-only environments
//   - replicate_pad_u8: replicate-padding for uint8 NHWC images (the eval
//     path's InputPadder, core/utils/utils.py:7-26)
//
// Build: `make -C native` → libstereo_host.so; loaded via ctypes
// (dkt_stereo_tpu/native/__init__.py) with graceful Python fallback.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PFM codec
// ---------------------------------------------------------------------------

// Query dimensions. Returns 0 on success; fills h, w, channels.
int pfm_query(const char* path, int* h, int* w, int* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char header[3] = {0};
  if (std::fscanf(f, "%2s", header) != 1) { std::fclose(f); return -2; }
  int c;
  if (std::strcmp(header, "PF") == 0) c = 3;
  else if (std::strcmp(header, "Pf") == 0) c = 1;
  else { std::fclose(f); return -3; }
  int width, height;
  if (std::fscanf(f, "%d %d", &width, &height) != 2) { std::fclose(f); return -4; }
  *h = height; *w = width; *channels = c;
  std::fclose(f);
  return 0;
}

// Read into caller-allocated buffer of h*w*channels floats, rows already
// flipped to top-down order (matching frame_utils.py:96 np.flipud).
int pfm_read(const char* path, float* out, int h, int w, int channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char header[3] = {0};
  if (std::fscanf(f, "%2s", header) != 1) { std::fclose(f); return -2; }
  int width, height;
  double scale;
  if (std::fscanf(f, "%d %d %lf", &width, &height, &scale) != 3) { std::fclose(f); return -4; }
  if (width != w || height != h) { std::fclose(f); return -5; }
  std::fgetc(f);  // single whitespace after scale line
  const bool little_endian = scale < 0;
  const size_t n = (size_t)h * w * channels;
  std::vector<float> raw(n);
  if (std::fread(raw.data(), sizeof(float), n, f) != n) { std::fclose(f); return -6; }
  std::fclose(f);
  if (!little_endian) {
    for (size_t i = 0; i < n; i++) {
      uint32_t v;
      std::memcpy(&v, &raw[i], 4);
      v = __builtin_bswap32(v);
      std::memcpy(&raw[i], &v, 4);
    }
  }
  // flip rows (PFM stores bottom-up)
  const size_t row = (size_t)w * channels;
  for (int y = 0; y < h; y++)
    std::memcpy(out + (size_t)y * row, raw.data() + (size_t)(h - 1 - y) * row,
                row * sizeof(float));
  return 0;
}

// Write grayscale little-endian PFM (frame_utils.py:99-109 semantics).
int pfm_write(const char* path, const float* data, int h, int w) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "Pf\n%d %d\n-1\n", w, h);
  for (int y = h - 1; y >= 0; y--)
    std::fwrite(data + (size_t)y * w, sizeof(float), w, f);
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Correlation-pyramid lookup (CPU oracle for the Pallas kernel)
// ---------------------------------------------------------------------------
//
// vols: num_levels pointers, level i of shape (G, W1, W2_i) float32 where
// G = B*H (flattened rows). coords: (G, W1). out: (G, W1, L*(2r+1)).
// Zero-padded 1-D linear interpolation — identical semantics to
// ops/pallas/corr_lookup.py (w_j = max(0, 1-|j-pos|)).

static inline float sample_row(const float* row, int S, float x) {
  const float x0 = std::floor(x);
  const float w = x - x0;
  const int i0 = (int)x0;
  float acc = 0.f;
  if (i0 >= 0 && i0 <= S - 1) acc += row[i0] * (1.f - w);
  if (i0 + 1 >= 0 && i0 + 1 <= S - 1) acc += row[i0 + 1] * w;
  return acc;
}

void corr_pyramid_lookup_cpu(const float** vols, const int* w2s, int num_levels,
                             const float* coords, float* out, int G, int W1,
                             int radius, int num_threads) {
  const int taps = 2 * radius + 1;
  const int K = num_levels * taps;
  if (num_threads <= 0) num_threads = (int)std::thread::hardware_concurrency();
  num_threads = std::max(1, std::min(num_threads, G));

  auto work = [&](int g0, int g1) {
    for (int g = g0; g < g1; g++) {
      const float* crow = coords + (size_t)g * W1;
      float* orow = out + (size_t)g * W1 * K;
      for (int i = 0; i < num_levels; i++) {
        const int S = w2s[i];
        const float inv = 1.f / (float)(1 << i);
        const float* vrow = vols[i] + (size_t)g * W1 * S;
        for (int x = 0; x < W1; x++) {
          const float c = crow[x] * inv;
          const float* row = vrow + (size_t)x * S;
          float* o = orow + (size_t)x * K + (size_t)i * taps;
          for (int k = 0; k < taps; k++) o[k] = sample_row(row, S, c + (float)(k - radius));
        }
      }
    }
  };

  std::vector<std::thread> threads;
  const int chunk = (G + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; t++) {
    const int g0 = t * chunk, g1 = std::min(G, g0 + chunk);
    if (g0 >= g1) break;
    threads.emplace_back(work, g0, g1);
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Replicate padding for uint8 NHWC images (InputPadder host path)
// ---------------------------------------------------------------------------

void replicate_pad_u8(const uint8_t* in, uint8_t* out, int H, int W, int C,
                      int pt, int pb, int pl, int pr) {
  const int Ho = H + pt + pb, Wo = W + pl + pr;
  for (int y = 0; y < Ho; y++) {
    const int sy = std::min(std::max(y - pt, 0), H - 1);
    const uint8_t* srow = in + (size_t)sy * W * C;
    uint8_t* drow = out + (size_t)y * Wo * C;
    // left border
    for (int x = 0; x < pl; x++) std::memcpy(drow + (size_t)x * C, srow, C);
    // center
    std::memcpy(drow + (size_t)pl * C, srow, (size_t)W * C);
    // right border
    for (int x = 0; x < pr; x++)
      std::memcpy(drow + (size_t)(pl + W + x) * C, srow + (size_t)(W - 1) * C, C);
  }
}

}  // extern "C"
