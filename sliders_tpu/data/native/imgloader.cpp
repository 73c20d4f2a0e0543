// Native paired-image loader for image-slider training.
//
// Role: the reference's data path is sequential PIL decode+resize on the
// host (trainscripts/imagesliders/train_lora-scale.py:211-220 loads and
// resizes both folders' images inline in the train loop). This library
// moves decode (libjpeg/libpng) + PIL-equivalent bicubic resize +
// [-1,1] normalization into C++ with a std::thread fan-out per batch, so
// the host data path never stalls TPU dispatch.
//
// Resize matches PIL `Image.resize(..., BICUBIC)` semantics: separable
// convolution with the Catmull-Rom-like cubic kernel (a = -0.5) whose
// support is scaled by the downscale ratio (PIL's antialias behavior),
// computed in float32. Output differs from PIL only by PIL's int16
// fixed-point coefficient quantization (<= ~1/255 per channel).
//
// Exposed C ABI (ctypes, see ../native_loader.py):
//   img_load_batch(paths, n, res, out)  -> 0 on success
//     paths: n NUL-terminated UTF-8 file paths
//     out:   n * res * res * 3 float32, HWC, [-1, 1]

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // HWC, 3 channels
};

// ---------------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  // normalize to 8-bit RGB (drop alpha against black-free matte: composite
  // is not needed for training data; PIL convert("RGB") also just drops it)
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = int(w);
  out->h = int(h);
  out->rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// PIL-style bicubic resample (float32 coefficients)
// ---------------------------------------------------------------------------

double cubic_filter(double x) {
  // PIL's bicubic kernel, a = -0.5 (Resample.c bicubic_filter)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Coeffs {
  int support;                 // taps per output pixel
  std::vector<int> bounds;     // first input index per output pixel
  std::vector<float> k;        // out_size * support weights
};

Coeffs precompute(int in_size, int out_size) {
  // PIL ImagingPrecomputeCoeffs: filter support scales with the
  // downscale ratio (antialias)
  constexpr double kSupport = 2.0;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = kSupport * filterscale;
  int ksize = int(std::ceil(support)) * 2 + 1;

  Coeffs c;
  c.support = ksize;
  c.bounds.resize(out_size);
  c.k.assign(size_t(out_size) * ksize, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double ww = 0.0;
    std::vector<double> w(xmax);
    for (int x = 0; x < xmax; ++x) {
      w[x] = cubic_filter((x + xmin - center + 0.5) / filterscale);
      ww += w[x];
    }
    for (int x = 0; x < xmax; ++x)
      c.k[size_t(xx) * ksize + x] = float(ww == 0.0 ? 0.0 : w[x] / ww);
    c.bounds[xx] = xmin;
  }
  return c;
}

// resize HWC uint8 -> HWC float32 [0,1], separable: horizontal then vertical
void resize_bicubic(const Image& img, int res, float* out01) {
  Coeffs ch = precompute(img.w, res);
  Coeffs cv = precompute(img.h, res);

  // horizontal pass: (h, w, 3) u8 -> (h, res, 3) f32
  std::vector<float> tmp(size_t(img.h) * res * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.rgb.data() + size_t(y) * img.w * 3;
    float* trow = tmp.data() + size_t(y) * res * 3;
    for (int xx = 0; xx < res; ++xx) {
      const float* k = ch.k.data() + size_t(xx) * ch.support;
      int x0 = ch.bounds[xx];
      int taps = std::min(ch.support, img.w - x0);
      float acc[3] = {0, 0, 0};
      for (int t = 0; t < taps; ++t) {
        const uint8_t* p = row + size_t(x0 + t) * 3;
        float w = k[t];
        acc[0] += w * p[0];
        acc[1] += w * p[1];
        acc[2] += w * p[2];
      }
      trow[xx * 3 + 0] = acc[0];
      trow[xx * 3 + 1] = acc[1];
      trow[xx * 3 + 2] = acc[2];
    }
  }
  // vertical pass: (h, res, 3) -> (res, res, 3), normalize to [0,1]
  for (int yy = 0; yy < res; ++yy) {
    const float* k = cv.k.data() + size_t(yy) * cv.support;
    int y0 = cv.bounds[yy];
    int taps = std::min(cv.support, img.h - y0);
    float* orow = out01 + size_t(yy) * res * 3;
    for (int xx = 0; xx < res * 3; ++xx) {
      float acc = 0;
      for (int t = 0; t < taps; ++t)
        acc += k[t] * tmp[size_t(y0 + t) * res * 3 + xx];
      // PIL clips resampled u8 output to [0,255] before conversion
      if (acc < 0.0f) acc = 0.0f;
      if (acc > 255.0f) acc = 255.0f;
      orow[xx] = acc / 255.0f;
    }
  }
}

bool load_one(const char* path, int res, float* out) {
  Image img;
  if (!decode_file(path, &img) || img.w <= 0 || img.h <= 0) return false;
  resize_bicubic(img, res, out);
  size_t n = size_t(res) * res * 3;
  for (size_t i = 0; i < n; ++i) out[i] = out[i] * 2.0f - 1.0f;
  return true;
}

}  // namespace

extern "C" {

// returns 0 on success, else 1-based index of the first failing path
int img_load_batch(const char** paths, int n, int res, float* out) {
  int nthreads = int(std::thread::hardware_concurrency());
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::vector<int> fail(n, 0);
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) {
    ts.emplace_back([&, t]() {
      for (int i = t; i < n; i += nthreads) {
        if (!load_one(paths[i], res, out + size_t(i) * res * res * 3))
          fail[i] = 1;
      }
    });
  }
  for (auto& th : ts) th.join();
  for (int i = 0; i < n; ++i)
    if (fail[i]) return i + 1;
  return 0;
}

int img_probe(const char* path, int* w, int* h) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  *w = img.w;
  *h = img.h;
  return 0;
}

}  // extern "C"
