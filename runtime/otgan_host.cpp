// otgan_host: native host-side data-pipeline kernels.
//
// The reference assembles every feed_dict with a per-image Python loop
// (train.py:163-170 maybe_flip) over a float64->float32 numpy dataset. Here
// the dataset stays uint8 in RAM (4x smaller) and batch assembly is ONE
// fused pass: gather(indices) + optional horizontal flip + uint8->[-1,1]
// float conversion, multithreaded across batch rows. Exposed via a C ABI
// for ctypes (no pybind11 dependency).
//
// Layout: dataset NHWC uint8 (n, h, w, c); output NHWC float32.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline void convert_row_fwd(const uint8_t* src, float* dst, int64_t count) {
  for (int64_t i = 0; i < count; ++i) {
    dst[i] = static_cast<float>(src[i]) / 127.5f - 1.0f;  // matches numpy
  }
}

// flip along W for one image: rows of w pixels, c channels each
inline void convert_image_flipped(const uint8_t* src, float* dst, int h,
                                  int w, int c) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<int64_t>(y) * w * c;
    float* drow = dst + static_cast<int64_t>(y) * w * c;
    for (int x = 0; x < w; ++x) {
      const uint8_t* spix = srow + static_cast<int64_t>(w - 1 - x) * c;
      float* dpix = drow + static_cast<int64_t>(x) * c;
      for (int ch = 0; ch < c; ++ch) {
        dpix[ch] = static_cast<float>(spix[ch]) / 127.5f - 1.0f;
      }
    }
  }
}

void assemble_range(const uint8_t* data, const int64_t* indices,
                    const uint8_t* flip_mask, int64_t begin, int64_t end,
                    int h, int w, int c, float* out) {
  const int64_t img = static_cast<int64_t>(h) * w * c;
  for (int64_t i = begin; i < end; ++i) {
    const uint8_t* src = data + indices[i] * img;
    float* dst = out + i * img;
    if (flip_mask != nullptr && flip_mask[i]) {
      convert_image_flipped(src, dst, h, w, c);
    } else {
      convert_row_fwd(src, dst, img);
    }
  }
}

}  // namespace

extern "C" {

// Fused gather + flip + normalize. data: (n_data, h, w, c) uint8 NHWC;
// indices: (batch,) int64 into n_data; flip_mask: (batch,) uint8 or null;
// out: (batch, h, w, c) float32. n_threads <= 0 -> hardware concurrency.
void otgan_assemble_batch_u8(const uint8_t* data, const int64_t* indices,
                             const uint8_t* flip_mask, int64_t batch, int h,
                             int w, int c, float* out, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads == 1 || batch < 2 * n_threads) {
    assemble_range(data, indices, flip_mask, 0, batch, h, w, c, out);
    return;
  }
  std::vector<std::thread> workers;
  const int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min<int64_t>(batch, b + chunk);
    if (b >= e) break;
    workers.emplace_back(assemble_range, data, indices, flip_mask, b, e, h,
                         w, c, out);
  }
  for (auto& th : workers) th.join();
}

// NCHW uint8 -> NHWC uint8 (dataset ingestion transpose, one pass,
// replaces np.transpose(...,(0,2,3,1)) at reference train.py:158)
void otgan_nchw_to_nhwc_u8(const uint8_t* src, int64_t n, int c, int h,
                           int w, uint8_t* dst) {
  const int64_t hw = static_cast<int64_t>(h) * w;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = src + i * c * hw;
    uint8_t* d = dst + i * hw * c;
    for (int64_t p = 0; p < hw; ++p) {
      for (int ch = 0; ch < c; ++ch) {
        d[p * c + ch] = s[ch * hw + p];
      }
    }
  }
}

}  // extern "C"
