// Batched JPEG decoder over libjpeg, the native host-side decode stage of
// the input pipeline (SURVEY.md §2b: replaces the TF C++ DecodeJpeg kernel
// the reference relies on).  Exposed as a plain C ABI consumed from Python
// via ctypes (no pybind11 in this environment).
//
// Capabilities:
//   * header-only size probe (tejpeg_decode_size)
//   * single-image RGB decode with configurable DCT method / fancy
//     upsampling (the TF-decode-matching knobs) and libjpeg's cheap
//     DCT-domain scaling (scale_num/8 downscale for throughput)
//   * batched decode with a per-call std::thread pool and an atomic work
//     queue — the host-side analogue of the reference's queue-runner
//     threads, without the queues.
//
// Error handling: libjpeg's longjmp-based error manager is wrapped so a
// corrupt JPEG fails that image only (returns a nonzero code), never the
// process.

#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

void emit_message(j_common_ptr, int) {}  // silence warnings

J_DCT_METHOD dct_method(int dct) {
  switch (dct) {
    case 1: return JDCT_IFAST;
    case 2: return JDCT_FLOAT;
    default: return JDCT_ISLOW;
  }
}

}  // namespace

extern "C" {

// Probe (h, w, channels) from the header. Returns 0 on success.
int tejpeg_decode_size(const unsigned char* data, unsigned long size,
                       int* h, int* w, int* c) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  *c = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode to RGB (3 channels always, grayscale/CMYK converted).
//   scale_num: DCT-domain downscale numerator (out = ceil(dim*scale_num/8));
//              pass 8 for full size.
//   out must hold out_h*out_w*3 bytes; actual dims returned via *oh/*ow.
// Returns 0 on success, 1 decode error, 2 buffer too small.
int tejpeg_decode(const unsigned char* data, unsigned long size,
                  unsigned char* out, long out_capacity,
                  int dct, int fancy, int scale_num, int* oh, int* ow) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = dct_method(dct);
  cinfo.do_fancy_upsampling = fancy ? TRUE : FALSE;
  if (scale_num >= 1 && scale_num <= 8) {
    cinfo.scale_num = scale_num;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const long need = static_cast<long>(h) * w * 3;
  if (need > out_capacity) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<long>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *oh = h;
  *ow = w;
  return 0;
}

// Batched parallel decode. outs[i] receives image i; rc[i] is the per-image
// return code (same meanings as tejpeg_decode). Returns number of failures.
int tejpeg_decode_batch(const unsigned char** datas, const unsigned long* sizes,
                        int n, unsigned char** outs, const long* capacities,
                        int* hs, int* ws, int dct, int fancy, int scale_num,
                        int nthreads, int* rc) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      rc[i] = tejpeg_decode(datas[i], sizes[i], outs[i], capacities[i], dct,
                            fancy, scale_num, &hs[i], &ws[i]);
      if (rc[i] != 0) failures.fetch_add(1);
    }
  };
  int threads = nthreads < 1 ? 1 : (nthreads > n ? n : nthreads);
  if (threads == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

}  // extern "C"
