// stitch_runtime: native host-side runtime for imagestitch_tpu.
//
// TPU-native counterpart of the reference's native layer.  The reference
// used C++/CUDA for feature math and a numpy<->cv::Mat bridge
// (reference: appendix/myGpuFeatures.cpp, appendix/conversion.cpp); on TPU
// the feature math lives in XLA/Pallas, so the native layer's job moves to
// the host runtime: a multithreaded JPEG decode/prefetch pipeline feeding
// contiguous uint8 batches (the device-transfer boundary), and memcpy-grade
// canvas composition primitives.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   ->  native/libstitch_runtime.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg), error-resumable
// ---------------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file.  color: 0 = grayscale, 1 = BGR.
// Returns 0 on success; fills rows into out (stride = w * channels).
// When expect_h/expect_w are nonzero the decoded dims must match.
int decode_jpeg_file(const char* path, int color, uint8_t* out, int expect_h,
                     int expect_w, int* got_h, int* got_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = color ? JCS_EXT_BGR : JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height, w = cinfo.output_width;
  const int ch = cinfo.output_components;
  if (got_h) *got_h = h;
  if (got_w) *got_w = w;
  if ((expect_h && h != expect_h) || (expect_w && w != expect_w)) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  if (out != nullptr) {
    const size_t stride = static_cast<size_t>(w) * ch;
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW row = out + stride * cinfo.output_scanline;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
  } else {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

// Probe image dimensions without decoding pixel data.
int isr_probe(const char* path, int* h, int* w) {
  return decode_jpeg_file(path, 0, nullptr, 0, 0, h, w);
}

// Decode a batch of same-sized JPEGs into a contiguous (n, h, w[, 3]) uint8
// buffer with `threads` worker threads.  color: 0 gray, 1 BGR.
// Returns 0 on success, else the 1-based index of the first failing file.
int isr_load_batch(const char** paths, int n, int color, uint8_t* out, int h,
                   int w, int threads) {
  const size_t frame = static_cast<size_t>(h) * w * (color ? 3 : 1);
  std::atomic<int> failed{0};
  std::atomic<int> next{0};
  if (threads < 1) threads = 1;
  {
    ThreadPool pool(threads);
    std::atomic<int> done{0};
    std::mutex mu;
    std::condition_variable cv;
    for (int t = 0; t < threads; ++t) {
      pool.submit([&] {
        for (;;) {
          int i = next.fetch_add(1);
          if (i >= n || failed.load() != 0) break;
          int rc = decode_jpeg_file(paths[i], color, out + frame * i, h, w,
                                    nullptr, nullptr);
          if (rc != 0) {
            int expected = 0;
            failed.compare_exchange_strong(expected, i + 1);
          }
        }
        {
          std::lock_guard<std::mutex> lk(mu);
          done.fetch_add(1);
        }
        cv.notify_one();
      });
    }
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] { return done.load() == threads; });
  }
  return failed.load();
}

// BGR (h, w, 3) -> grayscale (h, w) with OpenCV's integer-rounding weights.
void isr_bgr_to_gray(const uint8_t* bgr, uint8_t* gray, int h, int w) {
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    const uint8_t b = bgr[3 * i], g = bgr[3 * i + 1], r = bgr[3 * i + 2];
    // fixed-point 0.114/0.587/0.299 (cv2's CCIR 601), round-half-up
    gray[i] = static_cast<uint8_t>(
        (1868u * b + 9617u * g + 4899u * r + 8192u) >> 14);
  }
}

// Paste img (h, w, c) into canvas (H, W, c) at (r0, c0): row-wise memcpy.
void isr_paste(uint8_t* canvas, int H, int W, int c, const uint8_t* img,
               int h, int w, int r0, int c0) {
  const size_t row_bytes = static_cast<size_t>(w) * c;
  const size_t canvas_stride = static_cast<size_t>(W) * c;
  for (int r = 0; r < h; ++r) {
    std::memcpy(canvas + (static_cast<size_t>(r0 + r)) * canvas_stride +
                    static_cast<size_t>(c0) * c,
                img + static_cast<size_t>(r) * row_bytes, row_bytes);
  }
}

// Version tag for the ctypes wrapper's sanity check.
int isr_version() { return 1; }

}  // extern "C"
