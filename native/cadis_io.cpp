// Native host-side data path for the CaDIS input pipeline.
//
// The reference delegates its image IO to OpenCV's C++ core (cv2.imread in
// datasets/Dataset_from_df.py); this is the equivalent native layer for the
// TPU framework: libpng/libjpeg decode, canonical->task LUT remap, and
// bilinear resize, run across a std::thread pool so a whole batch decodes in
// parallel while Python's GIL is released (ctypes releases it around the
// call). Exposed as a C ABI consumed by data/native_io.py.
//
// Build: g++ -O3 -fPIC -shared -std=c++17 cadis_io.cpp -lpng -ljpeg -lpthread
//        -o libcadis_io.so

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

// Decodes a PNG into caller-provided buffer. channels: 3 = RGB8, 1 = GRAY8.
// Returns 0 on success, negative on failure. out must hold h*w*channels.
// If (exp_h, exp_w) are nonzero the decode fails unless dimensions match.
static int decode_png_into(const char* path, uint8_t* out, int channels,
                           int exp_h, int exp_w, int* got_h, int* got_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) { std::fclose(fp); return -2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); std::fclose(fp); return -2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (channels == 3) {
    if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
  } else {  // gray label masks: stored gray or palette; take first channel
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
  }
  png_read_update_info(png, info);
  int rowbytes = (int)png_get_rowbytes(png, info);
  int ch = rowbytes / (int)w;

  if ((exp_h && (int)h != exp_h) || (exp_w && (int)w != exp_w)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }
  if (got_h) *got_h = (int)h;
  if (got_w) *got_w = (int)w;

  std::vector<uint8_t> row(rowbytes);
  for (png_uint_32 y = 0; y < h; y++) {
    png_read_row(png, row.data(), nullptr);
    uint8_t* dst = out + (size_t)y * w * channels;
    if (ch == channels) {
      std::memcpy(dst, row.data(), (size_t)w * channels);
    } else {
      // channel-count mismatch: take the first `channels` of each pixel
      for (png_uint_32 x = 0; x < w; x++)
        for (int c = 0; c < channels; c++)
          dst[x * channels + c] = row[x * ch + (c < ch ? c : ch - 1)];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

int cadis_decode_png(const char* path, uint8_t* out, int channels, int exp_h,
                     int exp_w, int* got_h, int* got_w) {
  return decode_png_into(path, out, channels, exp_h, exp_w, got_h, got_w);
}

// ---------------------------------------------------------------------------
// Batched parallel load: images (RGB) + labels (gray, LUT-remapped)
// ---------------------------------------------------------------------------

// img_paths/lbl_paths: arrays of n C strings. Remaps each label byte through
// lut (256 entries; identity if lut == nullptr). Writes images into
// imgs_out (n*h*w*3) and labels into lbls_out (n*h*w). Per-item status in
// status_out (n entries, 0 = ok). n_threads <= 0 -> hardware concurrency.
void cadis_load_batch(const char** img_paths, const char** lbl_paths, int n,
                      int h, int w, const uint8_t* lut, uint8_t* imgs_out,
                      uint8_t* lbls_out, int* status_out, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next(0);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int st = 0;
      if (img_paths && img_paths[i]) {
        st = decode_png_into(img_paths[i], imgs_out + (size_t)i * h * w * 3, 3,
                             h, w, nullptr, nullptr);
      }
      if (st == 0 && lbl_paths && lbl_paths[i]) {
        uint8_t* lbl = lbls_out + (size_t)i * h * w;
        st = decode_png_into(lbl_paths[i], lbl, 1, h, w, nullptr, nullptr);
        if (st == 0 && lut) {
          size_t m = (size_t)h * w;
          for (size_t k = 0; k < m; k++) lbl[k] = lut[lbl[k]];
        }
      }
      status_out[i] = st;
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// Bilinear resize (align_corners=false, pixel-center convention like OpenCV)
// ---------------------------------------------------------------------------

void cadis_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int ch,
                              uint8_t* dst, int dh, int dw) {
  const float scale_y = (float)sh / dh, scale_x = (float)sw / dw;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * scale_x - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      for (int c = 0; c < ch; c++) {
        float v00 = src[((size_t)y0 * sw + x0) * ch + c];
        float v01 = src[((size_t)y0 * sw + x1) * ch + c];
        float v10 = src[((size_t)y1 * sw + x0) * ch + c];
        float v11 = src[((size_t)y1 * sw + x1) * ch + c];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                  wy * ((1 - wx) * v10 + wx * v11);
        dst[((size_t)y * dw + x) * ch + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

}  // extern "C"
