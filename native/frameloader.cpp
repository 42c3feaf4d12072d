// Native frame-ingest pipeline: multi-threaded PNG/JPEG decoding with a
// bounded prefetch ring, exposed through a C ABI for ctypes.
//
// This is the TPU-native equivalent of the reference's host-side image
// ingest (cv::imread + Converter::toGray, Utils/Converter.cpp:5-19,
// demo/demo_initialization.cpp:30-77): the tracker's device compute is
// fast enough that Python-side decoding becomes the bottleneck, so worker
// threads decode and gray-convert ahead of the consumer while frames are
// on the device. Output frames are float32 grayscale in [0, 255] with
// BT.601 weights (matching io/images.py and cv::cvtColor).
//
// Build: make -C native   (links libpng16 + libjpeg, no other deps)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  int64_t index = -1;
  int height = 0;
  int width = 0;
  std::vector<float> gray;  // H*W, [0, 255]
  bool ok = false;
};

constexpr float kR = 0.299f, kG = 0.587f, kB = 0.114f;

bool decode_png(const char* path, Frame* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {  // allocation can fail under OOM; png_jmpbuf(null) crashes
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  // Adam7-interlaced PNGs need the full-image pass structure; with
  // interlace handling enabled we must read whole-image rows per pass.
  int passes = png_set_interlace_handling(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  out->height = static_cast<int>(h);
  out->width = static_cast<int>(w);
  out->gray.resize(static_cast<size_t>(w) * h);
  std::vector<png_byte> img(static_cast<size_t>(w) * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img.data() + static_cast<size_t>(y) * w * channels;
  for (int pass = 0; pass < passes; ++pass)
    for (png_uint_32 y = 0; y < h; ++y)
      png_read_row(png, rows[y], nullptr);
  for (png_uint_32 y = 0; y < h; ++y) {
    const png_byte* row = rows[y];
    float* dst = out->gray.data() + static_cast<size_t>(y) * w;
    if (channels == 1) {
      for (png_uint_32 x2 = 0; x2 < w; ++x2) dst[x2] = row[x2];
    } else {  // RGB (alpha already stripped)
      for (png_uint_32 x2 = 0; x2 < w; ++x2) {
        const png_byte* p = &row[static_cast<size_t>(x2) * channels];
        dst[x2] = kR * p[0] + kG * p[1] + kB * p[2];
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  out->ok = true;
  return true;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const char* path, Frame* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height, ch = cinfo.output_components;
  out->height = h;
  out->width = w;
  out->gray.resize(static_cast<size_t>(w) * h);
  std::vector<JSAMPLE> row(static_cast<size_t>(w) * ch);
  JSAMPROW rp = row.data();
  for (int y = 0; cinfo.output_scanline < cinfo.output_height; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out->gray.data() + static_cast<size_t>(y) * w;
    if (ch == 1) {
      for (int x2 = 0; x2 < w; ++x2) dst[x2] = row[x2];
    } else {
      for (int x2 = 0; x2 < w; ++x2) {
        const JSAMPLE* p = &row[static_cast<size_t>(x2) * ch];
        dst[x2] = kR * p[0] + kG * p[1] + kB * p[2];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  out->ok = true;
  return true;
}

bool decode_any(const std::string& path, Frame* out) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
  for (auto& c : ext) c = static_cast<char>(std::tolower(c));
  if (ext == "png") return decode_png(path.c_str(), out);
  if (ext == "jpg" || ext == "jpeg") return decode_jpeg(path.c_str(), out);
  return decode_png(path.c_str(), out) || decode_jpeg(path.c_str(), out);
}

class Loader {
 public:
  Loader(std::vector<std::string> paths, int n_threads, int ring_capacity)
      : paths_(std::move(paths)),
        capacity_(ring_capacity > 0 ? ring_capacity : 8),
        next_to_decode_(0),
        next_to_emit_(0) {
    int n = n_threads > 0 ? n_threads : 2;
    for (int i = 0; i < n; ++i) workers_.emplace_back([this] { Work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_ready_.notify_all();
    cv_space_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Blocks until the next in-order frame is decoded. Returns false at end
  // of stream or on decode failure (failure sets *h = *w = -1).
  bool Next(float* dst, int64_t dst_cap, int* h, int* w) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_ready_.wait(lk, [this] {
      return stop_ || Ready() != nullptr ||
             next_to_emit_ >= static_cast<int64_t>(paths_.size());
    });
    if (next_to_emit_ >= static_cast<int64_t>(paths_.size())) return false;
    Frame* f = Ready();
    if (f == nullptr) return false;  // stopped
    Frame frame = std::move(*f);
    ring_.erase(ring_.begin() + (f - ring_.data()));
    ++next_to_emit_;
    lk.unlock();
    cv_space_.notify_all();
    if (!frame.ok) {
      *h = *w = -1;
      return true;
    }
    int64_t count = static_cast<int64_t>(frame.gray.size());
    if (count > dst_cap) {
      *h = *w = -1;
      return true;
    }
    std::memcpy(dst, frame.gray.data(), count * sizeof(float));
    *h = frame.height;
    *w = frame.width;
    return true;
  }

 private:
  Frame* Ready() {
    for (auto& f : ring_)
      if (f.index == next_to_emit_) return &f;
    return nullptr;
  }

  void Work() {
    for (;;) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk, [this] {
          return stop_ ||
                 (static_cast<int64_t>(ring_.size()) < capacity_ &&
                  next_to_decode_ < static_cast<int64_t>(paths_.size()));
        });
        if (stop_ || next_to_decode_ >= static_cast<int64_t>(paths_.size()))
          return;
        idx = next_to_decode_++;
      }
      Frame f;
      f.index = idx;
      decode_any(paths_[idx], &f);
      {
        std::lock_guard<std::mutex> lk(mu_);
        ring_.push_back(std::move(f));
      }
      cv_ready_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  const int64_t capacity_;
  int64_t next_to_decode_;
  int64_t next_to_emit_;
  std::vector<Frame> ring_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_ready_, cv_space_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* frameloader_open(const char** paths, int64_t n_paths, int n_threads,
                       int ring_capacity) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), n_threads, ring_capacity);
}

// Returns 1 if a frame was produced (h/w = -1 marks a decode failure),
// 0 at end of stream.
int frameloader_next(void* handle, float* dst, int64_t dst_cap, int* h,
                     int* w) {
  return static_cast<Loader*>(handle)->Next(dst, dst_cap, h, w) ? 1 : 0;
}

void frameloader_close(void* handle) { delete static_cast<Loader*>(handle); }

// Synchronous single-image decode (no pipeline).
int frameloader_decode(const char* path, float* dst, int64_t dst_cap, int* h,
                       int* w) {
  Frame f;
  if (!decode_any(path, &f) || static_cast<int64_t>(f.gray.size()) > dst_cap)
    return 0;
  std::memcpy(dst, f.gray.data(), f.gray.size() * sizeof(float));
  *h = f.height;
  *w = f.width;
  return 1;
}

}  // extern "C"
