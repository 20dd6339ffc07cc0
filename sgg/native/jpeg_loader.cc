// Native data-loader: multithreaded JPEG decode + bilinear resize.
//
// The end-to-end training config (BASELINE.json:8) feeds raw images; the
// host-side decode/resize loop is the input-pipeline bottleneck (SURVEY.md
// §3.1 "HOT LOOP"). This is the framework's native-runtime tier: libjpeg
// decode with DCT prescaling (decode at the smallest scale >= target, often
// 8x fewer pixels), fixed-point bilinear resize, and a std::thread fan-out
// across images in a batch. Exposed as a C ABI for ctypes (no pybind11 in
// this image).
//
// Build: g++ -O3 -march=native -shared -fPIC jpeg_loader.cc -o libsggjpeg.so -ljpeg -lpthread

#include <cstddef>
#include <cstdio>  // must precede jpeglib.h (it uses FILE/size_t unqualified)

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Bilinear resize RGB8 HxW -> out_size x out_size (fixed-point 16.16).
void resize_bilinear(const unsigned char* src, int h, int w,
                     unsigned char* dst, int out) {
  const long sx = (static_cast<long>(w) << 16) / out;
  const long sy = (static_cast<long>(h) << 16) / out;
  for (int y = 0; y < out; ++y) {
    long fy = y * sy + (sy >> 1) - (1 << 15);
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy >> 16);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    int wy = static_cast<int>((fy >> 8) & 0xFF);
    const unsigned char* r0 = src + static_cast<size_t>(y0) * w * 3;
    const unsigned char* r1 = src + static_cast<size_t>(y1) * w * 3;
    unsigned char* d = dst + static_cast<size_t>(y) * out * 3;
    for (int x = 0; x < out; ++x) {
      long fx = x * sx + (sx >> 1) - (1 << 15);
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx >> 16);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      int wx = static_cast<int>((fx >> 8) & 0xFF);
      for (int c = 0; c < 3; ++c) {
        int p00 = r0[x0 * 3 + c], p01 = r0[x1 * 3 + c];
        int p10 = r1[x0 * 3 + c], p11 = r1[x1 * 3 + c];
        int top = p00 * (256 - wx) + p01 * wx;
        int bot = p10 * (256 - wx) + p11 * wx;
        d[x * 3 + c] =
            static_cast<unsigned char>((top * (256 - wy) + bot * wy) >> 16);
      }
    }
  }
}

int decode_one(const char* path, int out_size, unsigned char* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<unsigned char> rgb;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;  // corrupt jpeg
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // DCT prescale: smallest 1/1..1/8 scale whose output stays >= out_size.
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 1; --denom) {
    if (static_cast<int>(cinfo.image_width) / denom >= out_size &&
        static_cast<int>(cinfo.image_height) / denom >= out_size) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  resize_bilinear(rgb.data(), h, w, out, out_size);
  return 0;
}

}  // namespace

extern "C" {

// Decode+resize one file into out[out_size*out_size*3]. Returns 0 on success.
int sgg_decode_resize_file(const char* path, int out_size, unsigned char* out) {
  return decode_one(path, out_size, out);
}

// Batch decode n files with a thread pool. out is [n, out_size, out_size, 3].
// status[i] receives the per-file return code. Returns count of failures.
int sgg_decode_batch(const char** paths, int n, int out_size,
                     unsigned char* out, int* status, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  const size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  std::atomic<int> next(0), failures(0);
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
        int rc = decode_one(paths[i], out_size, out + stride * i);
        status[i] = rc;
        if (rc) failures.fetch_add(1);
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}
}
