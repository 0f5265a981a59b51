// Native host-side data loader for diff_pruning_tpu.
//
// The reference delegates this work to torchvision's C++ transforms and
// PIL/libjpeg (SURVEY.md §2.7); here the hot host path — image decode,
// resize/crop, batch gather + horizontal flip + [-1,1] normalize — is a
// small OpenMP C++ library exposed through a C ABI (loaded via ctypes;
// pybind11 is not available in this environment).
//
// Built on first use by native/__init__.py::_build (g++ -O3 -fopenmp
// -shared -fPIC, links libjpeg/libpng), cached next to this file.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cstdlib>
#include <algorithm>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// Gather `batch` images from an (n, h, w, c) uint8 array by index, flip
// horizontally where flip[i] != 0, and write float32 in [-1, 1].
void assemble_batch(const uint8_t* images, int64_t n, int64_t h, int64_t w,
                    int64_t c, const int64_t* indices, const uint8_t* flip,
                    int64_t batch, float* out) {
  const int64_t img_sz = h * w * c;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < batch; ++i) {
    const uint8_t* src = images + indices[i] * img_sz;
    float* dst = out + i * img_sz;
    if (!flip[i]) {
      for (int64_t j = 0; j < img_sz; ++j)
        dst[j] = src[j] / 127.5f - 1.0f;  // f32 division matches numpy exactly
    } else {
      for (int64_t y = 0; y < h; ++y) {
        const uint8_t* row = src + y * w * c;
        float* orow = dst + y * w * c;
        for (int64_t x = 0; x < w; ++x) {
          const uint8_t* px = row + (w - 1 - x) * c;
          float* opx = orow + x * c;
          for (int64_t k = 0; k < c; ++k)
            opx[k] = px[k] / 127.5f - 1.0f;
        }
      }
    }
  }
}

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG file to RGB; returns malloc'd buffer (caller frees) or null.
uint8_t* decode_jpeg(const char* path, int* out_w, int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  uint8_t* buf = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(buf);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(w) * h * 3));
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *out_w = w;
  *out_h = h;
  return buf;
}

// Decode a PNG file to RGB (8-bit, alpha stripped); malloc'd buffer or null.
uint8_t* decode_png(const char* path, int* out_w, int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) { fclose(f); return nullptr; }
  png_infop info = png_create_info_struct(png);
  uint8_t* buf = nullptr;
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    free(buf);
    return nullptr;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(w) * h * 3));
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = buf + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  *out_w = static_cast<int>(w);
  *out_h = static_cast<int>(h);
  return buf;
}

bool has_suffix(const char* s, const char* suf) {
  size_t ls = strlen(s), lf = strlen(suf);
  if (lf > ls) return false;
  for (size_t i = 0; i < lf; ++i) {
    char a = s[ls - lf + i], b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

// Bilinear resize (RGB uint8) then center crop to res x res.
void resize_center_crop(const uint8_t* src, int w, int h, int res,
                        uint8_t* dst) {
  // scale shorter side to res
  double s = static_cast<double>(res) / std::min(w, h);
  int nw = std::max(res, static_cast<int>(w * s + 0.5));
  int nh = std::max(res, static_cast<int>(h * s + 0.5));
  int x0 = (nw - res) / 2, y0 = (nh - res) / 2;
  for (int y = 0; y < res; ++y) {
    double fy = (y + y0 + 0.5) * h / nh - 0.5;
    int iy = static_cast<int>(fy < 0 ? 0 : fy);
    int iy1 = std::min(iy + 1, h - 1);
    double wy = fy - iy;
    if (wy < 0) wy = 0;
    for (int x = 0; x < res; ++x) {
      double fx = (x + x0 + 0.5) * w / nw - 0.5;
      int ix = static_cast<int>(fx < 0 ? 0 : fx);
      int ix1 = std::min(ix + 1, w - 1);
      double wx = fx - ix;
      if (wx < 0) wx = 0;
      for (int k = 0; k < 3; ++k) {
        double v00 = src[(iy * w + ix) * 3 + k];
        double v01 = src[(iy * w + ix1) * 3 + k];
        double v10 = src[(iy1 * w + ix) * 3 + k];
        double v11 = src[(iy1 * w + ix1) * 3 + k];
        double v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                   wy * ((1 - wx) * v10 + wx * v11);
        dst[(y * res + x) * 3 + k] = static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

}  // namespace

// Decode `batch` image files (JPEG/PNG), resize-shorter-side + center crop
// to res, write uint8 RGB into out (batch, res, res, 3).
// Returns number of failures (failed slots are zero-filled).
int64_t decode_batch(const char** paths, int64_t batch, int res, uint8_t* out) {
  int64_t failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
  for (int64_t i = 0; i < batch; ++i) {
    int w = 0, h = 0;
    uint8_t* img = nullptr;
    if (has_suffix(paths[i], ".png"))
      img = decode_png(paths[i], &w, &h);
    else
      img = decode_jpeg(paths[i], &w, &h);
    uint8_t* dst = out + i * static_cast<int64_t>(res) * res * 3;
    if (!img) {
      memset(dst, 0, static_cast<size_t>(res) * res * 3);
      ++failures;
      continue;
    }
    resize_center_crop(img, w, h, res, dst);
    free(img);
  }
  return failures;
}

int omp_thread_count() {
  int n = 0;
#pragma omp parallel
  {
#pragma omp master
    n = 1;
  }
#ifdef _OPENMP
  return n;
#else
  return 0;
#endif
}

}  // extern "C"
