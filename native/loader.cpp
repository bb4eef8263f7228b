// Native host-side data loader for gan_tpu.
//
// The reference's input path is torchvision ImageFolder + single-process
// PIL decode (/root/reference/units/dataloader.py:5-32). This library is
// the TPU-native replacement's hot host path: JPEG/PNG decode (libjpeg /
// libpng), bicubic resize to the load resolution, and shuffled batch
// gather into a caller-owned uint8 NHWC buffer — all in C++ with a worker
// thread pool, exposed to Python over a C ABI (ctypes).
//
// Build: g++ -O3 -fPIC -shared loader.cpp -o libganloader.so -ljpeg -lpng -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  std::vector<uint8_t> data;  // RGB, HWC
  int h = 0, w = 0;
};

// ---------------------------------------------------------------- JPEG ---
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------- PNG ---
struct PngReadCtx {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp p, png_bytep out, png_size_t n) {
  PngReadCtx* c = static_cast<PngReadCtx*>(png_get_io_ptr(p));
  if (c->pos + n > c->len) {
    png_error(p, "eof");
    return;
  }
  memcpy(out, c->buf + c->pos, n);
  c->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp p = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!p) return false;
  png_infop info = png_create_info_struct(p);
  if (!info) {
    png_destroy_read_struct(&p, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(p))) {
    png_destroy_read_struct(&p, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(p, &ctx, png_read_fn);
  png_read_info(p, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(p, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(p);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(p);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(p);
  if (png_get_valid(p, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(p);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(p);
  png_set_strip_alpha(p);
  png_read_update_info(p, info);

  out->w = w;
  out->h = h;
  out->data.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out->data.data() + size_t(y) * w * 3;
  png_read_image(p, rows.data());
  png_destroy_read_struct(&p, &info, nullptr);
  return true;
}

// ------------------------------------------------------------- resize ----
// Catmull-Rom-flavored bicubic (a = -0.5), matching PIL/torch conventions.
inline float cubic(float x, float a = -0.5f) {
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

void resize_bicubic(const Image& src, int oh, int ow, uint8_t* dst) {
  const float sy = float(src.h) / oh;
  const float sx = float(src.w) / ow;
  std::vector<float> tmp(size_t(src.h) * ow * 3);
  // horizontal pass
  for (int y = 0; y < src.h; y++) {
    for (int x = 0; x < ow; x++) {
      float cx = (x + 0.5f) * sx - 0.5f;
      int x0 = int(std::floor(cx)) - 1;
      float acc[3] = {0, 0, 0}, wsum = 0;
      for (int k = 0; k < 4; k++) {
        int xi = std::clamp(x0 + k, 0, src.w - 1);
        float wgt = cubic(cx - (x0 + k));
        wsum += wgt;
        const uint8_t* px = &src.data[(size_t(y) * src.w + xi) * 3];
        for (int c = 0; c < 3; c++) acc[c] += wgt * px[c];
      }
      float* o = &tmp[(size_t(y) * ow + x) * 3];
      for (int c = 0; c < 3; c++) o[c] = acc[c] / wsum;
    }
  }
  // vertical pass
  for (int y = 0; y < oh; y++) {
    float cy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(std::floor(cy)) - 1;
    for (int x = 0; x < ow; x++) {
      float acc[3] = {0, 0, 0}, wsum = 0;
      for (int k = 0; k < 4; k++) {
        int yi = std::clamp(y0 + k, 0, src.h - 1);
        float wgt = cubic(cy - (y0 + k));
        wsum += wgt;
        const float* px = &tmp[(size_t(yi) * ow + x) * 3];
        for (int c = 0; c < 3; c++) acc[c] += wgt * px[c];
      }
      uint8_t* o = dst + (size_t(y) * ow + x) * 3;
      for (int c = 0; c < 3; c++)
        o[c] = uint8_t(std::clamp(acc[c] / wsum + 0.5f, 0.0f, 255.0f));
    }
  }
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t rd = fread(out->data(), 1, n, f);
  fclose(f);
  return rd == size_t(n);
}

}  // namespace

extern "C" {

// Decode `n` image files into a preallocated uint8 NHWC buffer
// (n, out_h, out_w, 3), resizing bicubically. `paths` is a flat buffer of
// NUL-terminated strings back to back; `offsets[i]` indexes path i.
// Returns the number of successfully decoded images; failures leave zeros
// and set ok[i] = 0.
int ganloader_load_images(const char* paths, const int64_t* offsets, int n,
                          int out_h, int out_w, uint8_t* dst, uint8_t* ok,
                          int num_threads) {
  std::atomic<int> next(0), good(0);
  auto worker = [&]() {
    std::vector<uint8_t> buf;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const char* path = paths + offsets[i];
      ok[i] = 0;
      buf.clear();
      Image img;
      if (!read_file(path, &buf)) continue;
      bool done = false;
      if (buf.size() > 3 && buf[0] == 0xFF && buf[1] == 0xD8)
        done = decode_jpeg(buf.data(), buf.size(), &img);
      if (!done) done = decode_png(buf.data(), buf.size(), &img);
      if (!done) done = decode_jpeg(buf.data(), buf.size(), &img);
      if (!done || img.w <= 0 || img.h <= 0) continue;
      uint8_t* out = dst + size_t(i) * out_h * out_w * 3;
      if (img.h == out_h && img.w == out_w) {
        memcpy(out, img.data.data(), size_t(out_h) * out_w * 3);
      } else {
        resize_bicubic(img, out_h, out_w, out);
      }
      ok[i] = 1;
      good.fetch_add(1);
    }
  };
  int nt = std::max(1, num_threads);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// Gather rows `idx[0..n)` from src (N, item_bytes) into dst (n, item_bytes).
void ganloader_gather(const uint8_t* src, const int64_t* idx, int n,
                      int64_t item_bytes, uint8_t* dst) {
  for (int i = 0; i < n; i++) {
    memcpy(dst + size_t(i) * item_bytes, src + size_t(idx[i]) * item_bytes,
           item_bytes);
  }
}

}  // extern "C"
