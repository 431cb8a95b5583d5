// fastimage: batched JPEG decode + bilinear resize for the data pipeline.
//
// The reference fed its GPU through torchvision DataLoader workers doing
// PIL decode + resize (reference: Captioning_models/config.py:65
// num_workers=4, base_train.py:47-53). On TPU the chip sustains thousands
// of captions/sec, so host-side decode becomes the end-to-end bottleneck
// with real data. This loader beats PIL per core by
//   * using libjpeg's DCT-domain scaling (decode directly at 1/2, 1/4, 1/8
//     of full resolution when the target is small — most COCO images decode
//     at 1/2 or 1/4 for a 224x224 target), and
//   * running a std::thread pool across images in a batch
// and writes uint8 HWC directly into a caller-provided buffer (the same
// uint8 NHWC format the on-device pipeline consumes).
//
// C ABI (used from Python via ctypes — no pybind11 in this image):
//   fastimage_decode_batch(paths, n, out, H, W, threads) -> number of
//   images successfully decoded; failures leave zeros and are flagged in
//   `ok` so Python can fall back to PIL per file (e.g. for PNGs).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize uint8 HWC -> uint8 HWC (align_corners=false, PIL-like
// half-pixel centers; exactness vs PIL is not required — goldens compare
// against this loader's own output, and the model is resolution-robust).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw, int ch) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      for (int c = 0; c < ch; ++c) {
        const float top = src[(y0 * sw + x0) * ch + c] * (1 - wx)
                        + src[(y0 * sw + x1) * ch + c] * wx;
        const float bot = src[(y1 * sw + x0) * ch + c] * (1 - wx)
                        + src[(y1 * sw + x1) * ch + c] * wx;
        dst[(y * dw + x) * ch + c] =
            static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

bool decode_one(const char* path, uint8_t* out, int dh, int dw) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain downscale: decode at the smallest 1/2^k scale that still
  // covers the target (keeps >= target resolution before the final resize).
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 2; denom /= 2) {
    if (static_cast<int>(cinfo.image_height) / denom >= dh &&
        static_cast<int>(cinfo.image_width) / denom >= dw) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int sh = cinfo.output_height;
  const int sw = cinfo.output_width;
  const int ch = cinfo.output_components;  // 3 for JCS_RGB
  std::vector<uint8_t> buf(static_cast<size_t>(sh) * sw * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf.data() + static_cast<size_t>(cinfo.output_scanline)
                   * sw * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  if (ch != 3) {  // grayscale etc.: expand to RGB
    std::vector<uint8_t> rgb(static_cast<size_t>(sh) * sw * 3);
    for (size_t i = 0; i < static_cast<size_t>(sh) * sw; ++i)
      for (int c = 0; c < 3; ++c) rgb[i * 3 + c] = buf[i * ch];
    resize_bilinear(rgb.data(), sh, sw, out, dh, dw, 3);
  } else {
    resize_bilinear(buf.data(), sh, sw, out, dh, dw, 3);
  }
  return true;
}

}  // namespace

extern "C" {

// paths: array of n C strings; out: n*H*W*3 uint8 buffer; ok: n bytes
// (1 = decoded, 0 = failed -> caller falls back). Returns #decoded.
int fastimage_decode_batch(const char** paths, int n, uint8_t* out,
                           int height, int width, uint8_t* ok,
                           int threads) {
  std::atomic<int> next(0), good(0);
  const size_t stride = static_cast<size_t>(height) * width * 3;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      const bool success = decode_one(paths[i], out + stride * i, height,
                                      width);
      ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
      else std::memset(out + stride * i, 0, stride);
    }
  };
  const int nt = std::max(1, std::min(threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return good.load();
}

}  // extern "C"
