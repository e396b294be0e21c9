// Native input-pipeline augmentation kernels.
//
// The training-data path is the one host-side hot loop in this framework
// (the TPU compute path is JAX/XLA/Pallas): per-image random crop + flip
// over padded batches. The pure-numpy implementation loops per image in
// Python; this translation unit does the same work as tight C loops the
// compiler vectorizes. Loaded via ctypes (see native/__init__.py) with a
// transparent numpy fallback, mirroring the reference's optional apex_C
// native fast path with pure-torch fallback
// (kfac/distributed.py:12-24 of gpauloski/kfac-pytorch).

#include <cstdint>
#include <cstring>

extern "C" {

// Random crop + horizontal flip.
//   padded:  (n, ph, pw, c) float32, reflect/zero padded inputs
//   out:     (n, h, w, c) float32
//   offs:    (n, 2) int32 crop offsets (oy, ox), 0 <= oy <= ph - h
//   flips:   (n,) uint8, nonzero = mirror horizontally
void random_crop_flip(
    const float* padded,
    float* out,
    const int32_t* offs,
    const uint8_t* flips,
    int64_t n,
    int64_t ph,
    int64_t pw,
    int64_t h,
    int64_t w,
    int64_t c) {
  const int64_t in_img = ph * pw * c;
  const int64_t out_img = h * w * c;
  const int64_t in_row = pw * c;
  const int64_t out_row = w * c;
  for (int64_t i = 0; i < n; ++i) {
    const float* src = padded + i * in_img;
    float* dst = out + i * out_img;
    const int64_t oy = offs[2 * i];
    const int64_t ox = offs[2 * i + 1];
    const bool flip = flips[i] != 0;
    for (int64_t y = 0; y < h; ++y) {
      const float* srow = src + (oy + y) * in_row + ox * c;
      float* drow = dst + y * out_row;
      if (!flip) {
        std::memcpy(drow, srow, out_row * sizeof(float));
      } else {
        for (int64_t x = 0; x < w; ++x) {
          std::memcpy(
              drow + x * c, srow + (w - 1 - x) * c, c * sizeof(float));
        }
      }
    }
  }
}

// Normalize in place: x = (x - mean[c]) / std[c], NHWC.
void normalize_inplace(
    float* data,
    const float* mean,
    const float* stddev,
    int64_t pixels,  // n * h * w
    int64_t c) {
  for (int64_t p = 0; p < pixels; ++p) {
    float* px = data + p * c;
    for (int64_t k = 0; k < c; ++k) {
      px[k] = (px[k] - mean[k]) / stddev[k];
    }
  }
}

// Decode CIFAR binary records in one pass: raw rows of
// (1 label byte + c*h*w CHW-plane pixel bytes) -> int32 labels and
// NHWC float32 images normalized as (x/255 - mean[ch]) / std[ch].
// Fuses the decode, the plane transpose, and the normalization the
// Python path does in three materializing steps.
void decode_cifar(
    const uint8_t* raw,
    int32_t* labels,
    float* out,
    const float* mean,
    const float* stddev,
    int64_t n,
    int64_t h,
    int64_t w,
    int64_t c) {
  const int64_t plane = h * w;
  const int64_t rec = 1 + c * plane;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* r = raw + i * rec;
    labels[i] = static_cast<int32_t>(r[0]);
    const uint8_t* px = r + 1;
    float* dst = out + i * plane * c;
    for (int64_t ch = 0; ch < c; ++ch) {
      const float scale = 1.0f / (255.0f * stddev[ch]);
      const float bias = -mean[ch] / stddev[ch];
      const uint8_t* p = px + ch * plane;
      for (int64_t s = 0; s < plane; ++s) {
        dst[s * c + ch] = static_cast<float>(p[s]) * scale + bias;
      }
    }
  }
}

}  // extern "C"
