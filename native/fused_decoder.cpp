// Fused JPEG decode + resize + crop + flip + normalize (host CPU, C++).
//
// TPU-native equivalent of the reference's input-pipeline native layer
// (SURVEY.md §2.3 N8/N9: DataLoader workers + libjpeg-through-PIL), built as
// the contract's "fused decode/resize/normalize input pipeline"
// [B:configs[1]]. One call goes from JPEG bytes to a normalized float32
// HWC tensor with no intermediate Python images:
//
//   * libjpeg decode, optionally at a DCT-scaled fraction (M/8) just large
//     enough for the target crop — the decoder then does 1/4 or 1/2 the
//     IDCT work and the resample touches far fewer pixels (fast mode);
//   * PIL-semantics separable triangle (bilinear) resampling with
//     antialiasing support scaling, computed only for the output window
//     (fused center-crop / random-resized-crop box);
//   * horizontal flip and (x/255 - mean)/std folded into the final write.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
// Parity: float-math reimplementation of PIL's fixed-point resampling —
// matches within ~1/255 per channel (tests/test_native_decoder.py).

#include <cstddef>
#include <cstdio>  // jpeglib.h uses FILE/size_t without including them

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode JPEG bytes to RGB8. scale_num in [1,8] applies DCT scaling
// (scale_num/8). Returns false on corrupt input.
bool decode_rgb(const uint8_t* data, size_t len, int scale_num,
                std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = scale_num;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  JSAMPROW row;
  while (cinfo.output_scanline < cinfo.output_height) {
    row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// PIL-style resample weight table for one axis (triangle filter).
// box maps the output [0, out_size) onto input coords [box0, box1).
struct WeightTable {
  std::vector<int> xmin, xcount;
  std::vector<float> weights;  // per output pixel: xcount[i] weights
  int max_count = 0;
};

void build_weights(int in_size, int out_size, double box0, double box1,
                   WeightTable* t) {
  const double scale = (box1 - box0) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle support == 1
  // crop-then-resize semantics (torchvision resized_crop): filter support is
  // clamped to the BOX, not the full image — otherwise out-of-box pixels
  // bleed into edge rows/cols (the RRC parity bug the torch-oracle goldens
  // caught in the Python path; mnasnet_tpu/data/transforms.py
  // random_resized_crop has the same fix). For the eval path the box IS the
  // full image, so the clamp below is identical to the old [0, in_size).
  const int lo = std::max(0, static_cast<int>(std::floor(box0)));
  const int hi = std::min(in_size, static_cast<int>(std::ceil(box1)));
  t->xmin.resize(out_size);
  t->xcount.resize(out_size);
  const int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  t->weights.assign(static_cast<size_t>(out_size) * kmax, 0.f);
  t->max_count = kmax;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = box0 + (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < lo) xmin = lo;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > hi) xmax = hi;
    double sum = 0.0;
    std::vector<double> wd(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      double v = std::abs(arg) < 1.0 ? 1.0 - std::abs(arg) : 0.0;
      wd[x - xmin] = v;
      sum += v;
    }
    if (sum != 0.0)
      for (auto& v : wd) v /= sum;
    t->xmin[xx] = xmin;
    t->xcount[xx] = xmax - xmin;
    for (int i = 0; i < xmax - xmin; ++i)
      t->weights[static_cast<size_t>(xx) * kmax + i] =
          static_cast<float>(wd[i]);
  }
}

// Full fused pipeline: decoded RGB (w×h) → resample box → (out_w × out_h)
// window [win_x, win_y) of the virtual resized image → flip → normalize.
void resample_window(const uint8_t* src, int w, int h, double bx0, double by0,
                     double bx1, double by1, int rs_w, int rs_h, int win_x,
                     int win_y, int out_w, int out_h, bool flip,
                     const float* mean, const float* stdv, float* out) {
  WeightTable tx, ty;
  build_weights(w, rs_w, bx0, bx1, &tx);
  build_weights(h, rs_h, by0, by1, &ty);

  // vertical support rows needed for output rows [win_y, win_y+out_h)
  int ry0 = h, ry1 = 0;
  for (int j = 0; j < out_h; ++j) {
    int yy = win_y + j;
    ry0 = std::min(ry0, ty.xmin[yy]);
    ry1 = std::max(ry1, ty.xmin[yy] + ty.xcount[yy]);
  }
  // horizontal pass: rows [ry0, ry1) × cols [win_x, win_x+out_w)
  std::vector<float> interm(static_cast<size_t>(ry1 - ry0) * out_w * 3);
  for (int y = ry0; y < ry1; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * w * 3;
    float* drow = interm.data() + static_cast<size_t>(y - ry0) * out_w * 3;
    for (int i = 0; i < out_w; ++i) {
      int xx = win_x + i;
      const float* wt = tx.weights.data() +
                        static_cast<size_t>(xx) * tx.max_count;
      int x0 = tx.xmin[xx], n = tx.xcount[xx];
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = srow + static_cast<size_t>(x0 + k) * 3;
        r += wt[k] * p[0];
        g += wt[k] * p[1];
        b += wt[k] * p[2];
      }
      drow[i * 3] = r;
      drow[i * 3 + 1] = g;
      drow[i * 3 + 2] = b;
    }
  }
  // vertical pass + flip + normalize
  const float inv255 = 1.0f / 255.0f;
  float smul[3], sadd[3];
  for (int c = 0; c < 3; ++c) {
    smul[c] = inv255 / stdv[c];
    sadd[c] = -mean[c] / stdv[c];
  }
  for (int j = 0; j < out_h; ++j) {
    int yy = win_y + j;
    const float* wt = ty.weights.data() + static_cast<size_t>(yy) * ty.max_count;
    int y0 = ty.xmin[yy], n = ty.xcount[yy];
    float* drow = out + static_cast<size_t>(j) * out_w * 3;
    for (int i = 0; i < out_w; ++i) {
      const float* col = interm.data() + i * 3;
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const float* p =
            col + static_cast<size_t>(y0 + k - ry0) * out_w * 3;
        acc[0] += wt[k] * p[0];
        acc[1] += wt[k] * p[1];
        acc[2] += wt[k] * p[2];
      }
      int di = flip ? (out_w - 1 - i) : i;
      for (int c = 0; c < 3; ++c) {
        // PIL clips the resampled 8-bit value before ToTensor sees it.
        float v = std::min(255.0f, std::max(0.0f, acc[c]));
        drow[di * 3 + c] = v * smul[c] + sadd[c];
      }
    }
  }
}

int pick_scale(int full_w, int full_h, double need_w, double need_h,
               bool fast) {
  if (!fast) return 8;
  // smallest M in {1,2,4,8} with ceil(full*M/8) >= need (both axes);
  // power-of-two scales hit libjpeg's fast IDCT paths — fractional scales
  // (3/8, 5/8, ...) use the slow scaled IDCT and are net losses.
  for (int m : {1, 2, 4}) {
    double sw = std::ceil(full_w * m / 8.0);
    double sh = std::ceil(full_h * m / 8.0);
    if (sw >= need_w && sh >= need_h) return m;
  }
  return 8;
}

}  // namespace

extern "C" {

// Returns 0 on success, -1 on decode error.
int jpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Val pipeline: Resize(shorter→resize_size) → CenterCrop(out_size) →
// normalize. fast!=0 enables DCT-scaled decode (approximate, ~2-6× faster).
int fused_decode_eval(const uint8_t* data, size_t len, int out_size,
                      int resize_size, const float* mean, const float* stdv,
                      int fast, float* out) {
  int fw, fh;
  if (jpeg_dims(data, len, &fw, &fh) != 0) return -1;
  // virtual resized dims (shorter side == resize_size), PIL rounding
  int rs_w, rs_h;  // torchvision truncates the long side
  if (fw <= fh) {
    rs_w = resize_size;
    rs_h = static_cast<int>(static_cast<double>(resize_size) * fh / fw);
  } else {
    rs_h = resize_size;
    rs_w = static_cast<int>(static_cast<double>(resize_size) * fw / fh);
  }
  if (rs_w < out_size || rs_h < out_size) return -2;  // pad path unsupported
  // decode (possibly DCT-scaled): smallest M/8 keeping the decoded shorter
  // side ≥ resize_size, so the resample never upsamples
  int short_side = std::min(fw, fh);
  int m = pick_scale(short_side, short_side, resize_size, resize_size,
                     fast != 0);
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_rgb(data, len, m, &rgb, &w, &h)) return -1;
  // torchvision rounds crop offsets with Python round() — half-to-even;
  // nearbyint under the default FE mode matches that, lround does not.
  int left = static_cast<int>(std::nearbyint((rs_w - out_size) / 2.0));
  int top = static_cast<int>(std::nearbyint((rs_h - out_size) / 2.0));
  resample_window(rgb.data(), w, h, 0, 0, w, h, rs_w, rs_h, left, top,
                  out_size, out_size, false, mean, stdv, out);
  return 0;
}

// Train pipeline: RandomResizedCrop box (full-res coords, sampled by the
// caller) → resize to out_size × out_size → optional flip → normalize.
int fused_decode_train(const uint8_t* data, size_t len, int out_size,
                       int crop_top, int crop_left, int crop_h, int crop_w,
                       int flip, const float* mean, const float* stdv,
                       int fast, float* out) {
  int fw, fh;
  if (jpeg_dims(data, len, &fw, &fh) != 0) return -1;
  int m = pick_scale(crop_w, crop_h, out_size, out_size, fast != 0);
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_rgb(data, len, m, &rgb, &w, &h)) return -1;
  double sx = static_cast<double>(w) / fw;
  double sy = static_cast<double>(h) / fh;
  resample_window(rgb.data(), w, h, crop_left * sx, crop_top * sy,
                  (crop_left + crop_w) * sx, (crop_top + crop_h) * sy,
                  out_size, out_size, 0, 0, out_size, out_size, flip != 0,
                  mean, stdv, out);
  return 0;
}

}  // extern "C"
