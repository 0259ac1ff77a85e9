// Native fused image pipeline: JPEG decode -> optional hflip -> normalize
// (caffe/tf) -> bilinear resize (half-pixel centers, replicate border) ->
// write into the zero-padded static bucket, all in one C++ pass.
//
// The reference's input pipeline is TensorFlow's C++ tf.data runtime
// (tf_dataset_utils.py:55-124 runs as fused TF kernels); this is the
// equivalent native surface for the TPU framework's TF-free loader. The
// Python path (data/preprocessing.py: cv2 decode, numpy normalize, cv2
// resize, numpy pad) materializes three full-image intermediates per
// image; this fuses them so one host core can feed the chip
// (BENCHLOG round 3: python path ~82 img/s/core vs the 125 img/s b8-bf16
// chip rate). Built by native/build.sh into libimage_decode.so (links
// the system libjpeg) and loaded via ctypes from data/native_image.py;
// the Python path remains the default and the fallback.
//
// Semantics mirrored from data/preprocessing.py (itself pinned to the
// reference):
// - normalize FIRST, then resize (per-tap: each bilinear tap is the
//   f32-rounded normalized source pixel, lerped in f32 — the same
//   operation order as caffe_normalize -> cv2.resize on the f32 image).
// - caffe: RGB -> BGR minus bgr pixel means; mode 1 subtracts in double
//   (the reference eval path's f64-means ulp convention,
//   eval_pascal_tf_dataset.py:46-47); mode 0 subtracts in f32 (train).
// - tf: [0, 255] -> [-1, 1].
// - hflip applied BEFORE resize (train augmenter order): implemented by
//   mirroring the horizontal source taps, which is exact.
// - resize: half-pixel centers, edge-replicate clamp (cv2 INTER_LINEAR
//   convention for upscaling/downscaling without area averaging).
// - output written into a [bucket_h, bucket_w, 3] f32 buffer; the pad
//   region is zeroed here (zero == pixel mean after caffe normalize).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrJmp {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void on_error(j_common_ptr cinfo) {
  ErrJmp* e = reinterpret_cast<ErrJmp*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode to RGB uint8. Returns 0 on success.
int decode_rgb(const uint8_t* data, size_t n, std::vector<uint8_t>* out,
               int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrJmp err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(static_cast<size_t>(*h) * *w * 3);
  JSAMPROW row;
  while (cinfo.output_scanline < cinfo.output_height) {
    row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

// Header-only parse: fills (h, w). Returns 0 on success.
int jpeg_dims(const uint8_t* data, uint64_t n, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrJmp err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), n);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Plain decode to an RGB uint8 buffer the caller sized via jpeg_dims
// (h*w*3 bytes). Returns 0 on success.
int jpeg_decode_rgb(const uint8_t* data, uint64_t n, uint8_t* out,
                    int out_capacity_h, int out_capacity_w) {
  std::vector<uint8_t> buf;
  int h = 0, w = 0;
  if (decode_rgb(data, n, &buf, &h, &w)) return 1;
  if (h != out_capacity_h || w != out_capacity_w) return 2;
  memcpy(out, buf.data(), buf.size());
  return 0;
}

// Fused decode + hflip + normalize + bilinear resize + bucket-pad.
//   mode: 0 = caffe f32 means, 1 = caffe f64 means (eval ulp convention),
//         2 = tf [-1, 1].
//   bgr_means3: BGR pixel means (ignored for mode 2; may be null then).
//   flip: mirror horizontally before resize (train hflip).
//   channel_reverse: reverse channel order AFTER normalization
//     (preprocess_eval_image's image_format flip).
//   out: [bucket_h, bucket_w, 3] f32, fully overwritten (pad zeroed).
// Returns 0 ok, 1 decode error, 3 bad target dims.
int decode_preprocess(const uint8_t* data, uint64_t n, int out_h, int out_w,
                      int mode, const double* bgr_means3, int flip,
                      int channel_reverse, int bucket_h, int bucket_w,
                      float* out) {
  std::vector<uint8_t> src;
  int h = 0, w = 0;
  if (decode_rgb(data, n, &src, &h, &w)) return 1;
  if (out_h <= 0 || out_w <= 0 || out_h > bucket_h || out_w > bucket_w)
    return 3;

  // normalized value of source pixel p (uint8) in OUTPUT channel c,
  // f32-rounded exactly like the python normalize step
  double md[3] = {0.0, 0.0, 0.0};
  if (mode != 2 && bgr_means3 != nullptr)
    for (int i = 0; i < 3; ++i) md[i] = bgr_means3[i];
  float mf[3] = {static_cast<float>(md[0]), static_cast<float>(md[1]),
                 static_cast<float>(md[2])};

  // Per-source-pixel normalized LUTs: 256 entries x 3 output channels.
  // norm[c][v] = normalized value of raw value v landing in output
  // channel c (caffe output channel c samples source RGB channel 2-c).
  float lut[3][256];
  for (int c = 0; c < 3; ++c) {
    for (int v = 0; v < 256; ++v) {
      if (mode == 2) {
        lut[c][v] = static_cast<float>(v) / 255.0f * 2.0f - 1.0f;
      } else if (mode == 1) {
        lut[c][v] = static_cast<float>(static_cast<double>(v) - md[c]);
      } else {
        lut[c][v] = static_cast<float>(v) - mf[c];
      }
    }
  }
  // source RGB channel index feeding output channel c
  int src_ch[3];
  for (int c = 0; c < 3; ++c) src_ch[c] = (mode == 2) ? c : 2 - c;
  if (channel_reverse) {
    int tmp[3] = {src_ch[2], src_ch[1], src_ch[0]};
    // the normalize means stay attached to their (pre-reverse) channel:
    // python reverses the normalized image, so output channel c carries
    // the normalized plane that was at 2-c
    float lt[3][256];
    memcpy(lt, lut, sizeof(lut));
    for (int c = 0; c < 3; ++c) {
      src_ch[c] = tmp[c];
      memcpy(lut[c], lt[2 - c], sizeof(lut[c]));
    }
  }

  // horizontal taps (half-pixel centers, replicate clamp); mirrored taps
  // for flip (flip-then-resize == resize sampling mirrored x, exactly)
  std::vector<int> x0(out_w), x1(out_w);
  std::vector<float> fx(out_w);
  for (int x = 0; x < out_w; ++x) {
    double sx = (x + 0.5) * static_cast<double>(w) / out_w - 0.5;
    if (sx < 0) sx = 0;
    int xi = static_cast<int>(sx);
    if (xi > w - 1) xi = w - 1;
    double f = sx - xi;
    if (f < 0) f = 0;
    if (f > 1) f = 1;
    int xj = xi + 1 > w - 1 ? w - 1 : xi + 1;
    if (flip) {
      x0[x] = w - 1 - xi;
      x1[x] = w - 1 - xj;
    } else {
      x0[x] = xi;
      x1[x] = xj;
    }
    fx[x] = static_cast<float>(f);
  }

  const bool identity = (out_h == h && out_w == w);
  // two-slot cache of the horizontal pass keyed by source row: when
  // upscaling, consecutive output rows share source rows, so each source
  // row's horizontal resample runs once instead of twice
  std::vector<float> hrow[2] = {std::vector<float>(out_w * 3),
                                std::vector<float>(out_w * 3)};
  int hrow_src[2] = {-1, -1};
  auto hpass = [&](int sy_idx) -> const float* {
    for (int s = 0; s < 2; ++s)
      if (hrow_src[s] == sy_idx) return hrow[s].data();
    int slot = (hrow_src[0] <= hrow_src[1]) ? 0 : 1;  // evict older row
    hrow_src[slot] = sy_idx;
    float* dst = hrow[slot].data();
    const uint8_t* srow = src.data() + static_cast<size_t>(sy_idx) * w * 3;
    for (int x = 0; x < out_w; ++x) {
      const uint8_t* a = srow + static_cast<size_t>(x0[x]) * 3;
      const uint8_t* b = srow + static_cast<size_t>(x1[x]) * 3;
      float wx = fx[x];
      for (int c = 0; c < 3; ++c)
        dst[x * 3 + c] =
            lut[c][a[src_ch[c]]] * (1.0f - wx) + lut[c][b[src_ch[c]]] * wx;
    }
    return dst;
  };

  // zero the pad region only (cheaper than the whole buffer)
  for (int y = 0; y < out_h; ++y)
    memset(out + (static_cast<size_t>(y) * bucket_w + out_w) * 3, 0,
           sizeof(float) * 3 * (bucket_w - out_w));
  if (out_h < bucket_h)
    memset(out + static_cast<size_t>(out_h) * bucket_w * 3, 0,
           sizeof(float) * 3 * bucket_w * (bucket_h - out_h));

  for (int y = 0; y < out_h; ++y) {
    float* dst = out + static_cast<size_t>(y) * bucket_w * 3;
    if (identity) {
      const uint8_t* srow = src.data() + static_cast<size_t>(y) * w * 3;
      for (int x = 0; x < out_w; ++x) {
        const uint8_t* p =
            srow + static_cast<size_t>(flip ? (w - 1 - x) : x) * 3;
        for (int c = 0; c < 3; ++c) dst[x * 3 + c] = lut[c][p[src_ch[c]]];
      }
      continue;
    }
    double sy = (y + 0.5) * static_cast<double>(h) / out_h - 0.5;
    if (sy < 0) sy = 0;
    int y0 = static_cast<int>(sy);
    if (y0 > h - 1) y0 = h - 1;
    double fyd = sy - y0;
    if (fyd < 0) fyd = 0;
    if (fyd > 1) fyd = 1;
    int y1 = y0 + 1 > h - 1 ? h - 1 : y0 + 1;
    float fy = static_cast<float>(fyd);
    // horizontal pass per source row (normalized taps), then vertical lerp
    const float* top = hpass(y0);
    const float* bot = (y1 == y0) ? top : hpass(y1);
    for (int i = 0; i < out_w * 3; ++i)
      dst[i] = top[i] * (1.0f - fy) + bot[i] * fy;
  }
  return 0;
}

}  // extern "C"
