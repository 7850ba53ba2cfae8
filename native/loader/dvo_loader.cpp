// Native RGB-D sequence loader: libpng decode + threaded prefetch.
//
// The reference's data path is synchronous cv2.imread on the benchmark
// thread (/root/reference/src/test_dvo.py:183-187) — frame decode blocks
// the solver.  This loader is the framework's native-runtime equivalent:
// a worker pool decodes PNG frames ahead of the consumer into a bounded
// ring of slots, so host decode overlaps device compute and the Python
// side only memcpy-views completed frames (ctypes, zero extra copies).
//
// Formats handled (TUM RGB-D / bundled test set):
//   - RGB:  8-bit RGB / RGBA / palette / gray PNG -> RGB8 (HxWx3)
//   - depth: 16-bit grayscale PNG (network byte order) -> uint16 host order
//
// Build: see native/Makefile (g++ -O3 -shared, links libpng).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // rgb8 or u16 (host order) bytes
  int width = 0;
  int height = 0;
  int channels = 0;   // 3 for rgb, 1 for depth
  int bit_depth = 0;  // 8 or 16
  bool ok = false;
};

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

Image decode_png(const char* path, bool want_depth16) {
  Image out;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return out;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return out;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return out;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (want_depth16) {
    // Depth must be 16-bit gray (TUM RGB-D convention).  Anything else is
    // rejected (ok=false) so callers fall back to the OpenCV path: an
    // 8-bit buffer reinterpreted as uint16 would both overread and
    // scramble the depth DNs.
    if (color_type != PNG_COLOR_TYPE_GRAY || bit_depth != 16) {
      png_destroy_read_struct(&png, &info, nullptr);
      std::fclose(fp);
      return out;
    }
    // libpng delivers network order; swap to host.
    png_set_swap(png);
  } else {
    // Normalize everything to 8-bit RGB.
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  out.data.resize(rowbytes * height);
  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = out.data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  out.width = static_cast<int>(width);
  out.height = static_cast<int>(height);
  out.channels = want_depth16 ? 1 : 3;
  out.bit_depth = want_depth16 ? 16 : 8;
  out.ok = true;
  return out;
}

// ---------------------------------------------------------------------------
// Prefetching sequence reader
// ---------------------------------------------------------------------------

struct Frame {
  Image rgb;
  Image depth;
  int index = -1;
};

class SequenceReader {
 public:
  SequenceReader(std::vector<std::string> rgb_paths,
                 std::vector<std::string> depth_paths, int prefetch,
                 int workers)
      : rgb_paths_(std::move(rgb_paths)),
        depth_paths_(std::move(depth_paths)),
        prefetch_(prefetch < 1 ? 1 : prefetch),
        next_to_schedule_(0),
        stop_(false) {
    int n = static_cast<int>(rgb_paths_.size());
    results_.resize(n);
    done_.assign(n, false);
    if (workers < 1) workers = 1;
    for (int i = 0; i < workers; ++i)
      threads_.emplace_back([this] { Work(); });
  }

  ~SequenceReader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    for (auto& t : threads_) t.join();
  }

  int size() const { return static_cast<int>(rgb_paths_.size()); }

  // Blocks until frame `idx` is decoded; returns it (moves ownership).
  bool Get(int idx, Frame* out) {
    if (idx < 0 || idx >= size()) return false;
    std::unique_lock<std::mutex> lk(mu_);
    // Keep the pipeline ahead of the consumer.
    want_ = idx + prefetch_;
    cv_work_.notify_all();
    cv_done_.wait(lk, [&] { return done_[idx] || stop_; });
    if (!done_[idx]) return false;
    *out = std::move(results_[idx]);
    return out->rgb.ok && out->depth.ok;
  }

 private:
  void Work() {
    for (;;) {
      int idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&] {
          return stop_ ||
                 (next_to_schedule_ < size() && next_to_schedule_ <= want_);
        });
        if (stop_) return;
        idx = next_to_schedule_++;
      }
      Frame f;
      f.index = idx;
      f.rgb = decode_png(rgb_paths_[idx].c_str(), /*want_depth16=*/false);
      f.depth = decode_png(depth_paths_[idx].c_str(), /*want_depth16=*/true);
      {
        std::lock_guard<std::mutex> lk(mu_);
        results_[idx] = std::move(f);
        done_[idx] = true;
      }
      cv_done_.notify_all();
    }
  }

  std::vector<std::string> rgb_paths_, depth_paths_;
  int prefetch_;
  int next_to_schedule_;
  int want_ = 0;
  bool stop_;
  std::vector<Frame> results_;
  std::vector<bool> done_;
  std::vector<std::thread> threads_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_done_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C API (ctypes surface)
// ---------------------------------------------------------------------------

extern "C" {

// One-shot decodes --------------------------------------------------------

// Returns 0 on success. Caller passes a buffer of at least w*h*3 bytes
// (query first with dvo_png_dims).
int dvo_png_dims(const char* path, int* width, int* height) {
  // Cheap header-only read.
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *width = static_cast<int>(png_get_image_width(png, info));
  *height = static_cast<int>(png_get_image_height(png, info));
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

int dvo_decode_rgb8(const char* path, uint8_t* out, int capacity_bytes,
                    int* width, int* height) {
  Image img = decode_png(path, false);
  if (!img.ok) return -1;
  int need = img.width * img.height * 3;
  if (capacity_bytes < need) return -2;
  std::memcpy(out, img.data.data(), need);
  *width = img.width;
  *height = img.height;
  return 0;
}

int dvo_decode_depth16(const char* path, uint16_t* out, int capacity_elems,
                       int* width, int* height) {
  Image img = decode_png(path, true);
  if (!img.ok) return -1;
  int need = img.width * img.height;
  if (capacity_elems < need) return -2;
  std::memcpy(out, img.data.data(), need * sizeof(uint16_t));
  *width = img.width;
  *height = img.height;
  return 0;
}

// Prefetching sequence ----------------------------------------------------

void* dvo_seq_open(const char** rgb_paths, const char** depth_paths, int n,
                   int prefetch, int workers) {
  std::vector<std::string> rgb(rgb_paths, rgb_paths + n);
  std::vector<std::string> depth(depth_paths, depth_paths + n);
  return new SequenceReader(std::move(rgb), std::move(depth), prefetch,
                            workers);
}

// Copies frame `idx` into the caller's buffers. Returns 0 on success,
// -1 on decode failure / bad index, -2 if a buffer is too small.
int dvo_seq_get(void* handle, int idx, uint8_t* rgb_out, int rgb_capacity,
                uint16_t* depth_out, int depth_capacity_elems, int* width,
                int* height) {
  auto* reader = static_cast<SequenceReader*>(handle);
  Frame f;
  if (!reader->Get(idx, &f)) return -1;
  int rgb_need = f.rgb.width * f.rgb.height * 3;
  int depth_need = f.depth.width * f.depth.height;
  if (rgb_capacity < rgb_need || depth_capacity_elems < depth_need) return -2;
  std::memcpy(rgb_out, f.rgb.data.data(), rgb_need);
  std::memcpy(depth_out, f.depth.data.data(),
              depth_need * sizeof(uint16_t));
  *width = f.rgb.width;
  *height = f.rgb.height;
  return 0;
}

int dvo_seq_size(void* handle) {
  return static_cast<SequenceReader*>(handle)->size();
}

void dvo_seq_close(void* handle) {
  delete static_cast<SequenceReader*>(handle);
}

}  // extern "C"
