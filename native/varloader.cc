// Native host-side image pipeline for var_tpu.
//
// Replaces the reference's torchvision/PIL input stack (utils/data.py:14-45)
// on the hot path: JPEG/PNG decode (libjpeg/libpng), Lanczos-3 shorter-side
// resize (PIL-LANCZOS semantics), crop, optional horizontal flip, and
// [0,255] -> [-1,1] float conversion — all in C++ with an internal thread
// pool so one FFI call fills a whole training batch while the TPU computes.
//
// Exposed C ABI (consumed via ctypes from var_tpu/data/native_loader.py):
//   vl_load_image  — single image -> float32 HWC buffer
//   vl_load_batch  — N images in parallel -> (N, H, W, 3) float32 buffer
//
// Build: g++ -O3 -march=native -shared -fPIC varloader.cc -ljpeg -lpng -o libvarloader.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <algorithm>
#include <atomic>
#include <memory>
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
// decoding

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
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
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (n >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok && out->w > 0 && out->h > 0;
}

// ---------------------------------------------------------------------------
// Lanczos-3 separable resize (PIL LANCZOS semantics: kernel stretched by the
// scale factor when downsampling = antialiasing box)

inline double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
}

struct Taps {
  std::vector<int> start;     // per output index
  std::vector<int> count;
  std::vector<float> weight;  // start.size() x max_count, row-major
  int max_count = 0;
};

Taps make_taps(int in_size, int out_size) {
  Taps t;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 3.0 * filterscale;
  t.max_count = int(std::ceil(support)) * 2 + 1;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign(size_t(out_size) * t.max_count, 0.f);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(0, int(center - support + 0.5));
    int hi = std::min(in_size, int(center + support + 0.5));
    double sum = 0.0;
    std::vector<double> w(hi - lo);
    for (int j = lo; j < hi; ++j) {
      w[j - lo] = lanczos3((j - center + 0.5) / filterscale);
      sum += w[j - lo];
    }
    t.start[i] = lo;
    t.count[i] = hi - lo;
    for (int j = 0; j < hi - lo; ++j)
      t.weight[size_t(i) * t.max_count + j] = float(w[j] / sum);
  }
  return t;
}

// resize RGB uint8 -> float32 RGB (values still 0..255)
void resize_lanczos(const Image& img, int out_w, int out_h, std::vector<float>* out) {
  Taps tx = make_taps(img.w, out_w);
  Taps ty = make_taps(img.h, out_h);
  // horizontal pass: (h, out_w, 3)
  std::vector<float> tmp(size_t(img.h) * out_w * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.rgb.data() + size_t(y) * img.w * 3;
    float* trow = tmp.data() + size_t(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      float acc[3] = {0, 0, 0};
      const float* w = &tx.weight[size_t(x) * tx.max_count];
      int s = tx.start[x];
      for (int j = 0; j < tx.count[x]; ++j) {
        const uint8_t* px = row + size_t(s + j) * 3;
        acc[0] += w[j] * px[0];
        acc[1] += w[j] * px[1];
        acc[2] += w[j] * px[2];
      }
      trow[x * 3 + 0] = acc[0];
      trow[x * 3 + 1] = acc[1];
      trow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass: (out_h, out_w, 3)
  out->assign(size_t(out_h) * out_w * 3, 0.f);
  for (int y = 0; y < out_h; ++y) {
    float* orow = out->data() + size_t(y) * out_w * 3;
    const float* w = &ty.weight[size_t(y) * ty.max_count];
    int s = ty.start[y];
    for (int j = 0; j < ty.count[y]; ++j) {
      const float* trow = tmp.data() + size_t(s + j) * out_w * 3;
      for (int x = 0; x < out_w * 3; ++x) orow[x] += w[j] * trow[x];
    }
  }
}

// full transform: decode -> shorter-side resize to mid -> crop -> flip -> [-1,1]
// fx, fy in [0,1] pick the crop origin as a fraction of the valid range;
// negative = center crop (torchvision RandomCrop / CenterCrop semantics).
int load_one(const char* path, int mid, int reso, float fx, float fy,
             int hflip, float* out /* reso*reso*3 */) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  int rw, rh;
  if (img.w <= img.h) {
    rw = mid;
    rh = std::max(1, int(std::lround(double(img.h) * mid / img.w)));
  } else {
    rh = mid;
    rw = std::max(1, int(std::lround(double(img.w) * mid / img.h)));
  }
  std::vector<float> resized;
  resize_lanczos(img, rw, rh, &resized);
  int max_x = std::max(0, rw - reso);
  int max_y = std::max(0, rh - reso);
  int cx = fx >= 0.f ? std::min(int(fx * (max_x + 1)), max_x) : max_x / 2;
  int cy = fy >= 0.f ? std::min(int(fy * (max_y + 1)), max_y) : max_y / 2;
  for (int y = 0; y < reso; ++y) {
    const float* src = resized.data() + (size_t(cy + y) * rw + cx) * 3;
    float* dst = out + size_t(y) * reso * 3;
    if (hflip) {
      for (int x = 0; x < reso; ++x) {
        const float* p = src + size_t(reso - 1 - x) * 3;
        float* q = dst + size_t(x) * 3;
        for (int c = 0; c < 3; ++c)
          q[c] = std::clamp(p[c], 0.f, 255.f) / 127.5f - 1.0f;
      }
    } else {
      for (int x = 0; x < reso * 3; ++x)
        dst[x] = std::clamp(src[x], 0.f, 255.f) / 127.5f - 1.0f;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int vl_load_image(const char* path, int mid, int reso, float fx, float fy,
                  int hflip, float* out) {
  return load_one(path, mid, reso, fx, fy, hflip, out);
}

// paths: n zero-terminated strings concatenated; offsets[n] gives starts.
// crops: (n, 3) floats [fx, fy, hflip] per image (-1,-1,0 = center crop).
// out: (n, reso, reso, 3) float32. Returns number of failed images.
int vl_load_batch(const char* paths, const int64_t* offsets, int n, int mid,
                  int reso, const float* crops, int num_threads, float* out) {
  std::atomic<int> next(0), failed(0);
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        const char* p = paths + offsets[i];
        int rc = load_one(p, mid, reso, crops[i * 3], crops[i * 3 + 1],
                          int(crops[i * 3 + 2]), out + size_t(i) * reso * reso * 3);
        if (rc != 0) {
          failed.fetch_add(1);
          std::memset(out + size_t(i) * reso * reso * 3, 0,
                      size_t(reso) * reso * 3 * sizeof(float));
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
