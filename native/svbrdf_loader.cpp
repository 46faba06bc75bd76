// Native host-side data loader: PNG strip decoding + a prefetching worker
// pool, exposed through a plain C ABI for ctypes.
//
// Role: TPU-native replacement for the reference's CPU DataLoader workers
// (reference dev/mip/dataset.py:105-140 decodes strips with plt.imread in
// torch DataLoader processes; reference main.py:63). Python/PIL decode of a
// 3584x256 strip costs ~100 ms on this host; this decoder + pool keeps the
// host side off the training-step critical path by decoding ahead into
// uint8 buffers that are shipped to the device as-is (normalization and
// gamma happen on-TPU in svbrdf_tpu/data/pipeline.py).
//
// Build: make -C native   (links libpng16 + zlib, no other deps)

#include <png.h>

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3, row-major
  uint32_t width = 0;
  uint32_t height = 0;
  bool ok = false;
};

Image decode_png_rgb8(const char* path) {
  Image out;
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return out;
  image.format = PNG_FORMAT_RGB;
  out.width = image.width;
  out.height = image.height;
  out.rgb.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out.rgb.data(), 0, nullptr)) {
    png_image_free(&image);
    return out;
  }
  out.ok = true;
  return out;
}

class PrefetchPool {
 public:
  PrefetchPool(std::vector<std::string> paths, int n_threads, int capacity)
      : paths_(std::move(paths)), capacity_(capacity) {
    if (n_threads < 1) n_threads = 1;
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { this->worker(); });
    }
  }

  ~PrefetchPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Prefetch HINT: speculative, droppable. The queue is bounded by
  // `capacity_` outstanding items (pending + ready) so a burst of hints
  // can never grow the queue without bound; a dropped hint is re-issued
  // on demand by wait_and_take.
  void request(int idx) {
    std::lock_guard<std::mutex> lk(mu_);
    if (idx < 0 || idx >= static_cast<int>(paths_.size())) return;
    if (ready_.count(idx) || pending_.count(idx)) return;
    if (static_cast<int>(pending_.size() + ready_.size()) >= capacity_)
      return;  // bounded: drop the hint
    pending_[idx] = true;
    queue_.push_back(idx);
    cv_work_.notify_one();
  }

  // Blocks until idx is decoded; copies into out (caller-sized) and evicts.
  // Returns 0 on success, -1 on decode failure, -2 on bad index.
  // Demand enqueues jump the queue and bypass the capacity gate (a full
  // ready_ of other images must not deadlock the consumer).
  int wait_and_take(int idx, uint8_t* out, int64_t out_size, uint32_t* w,
                    uint32_t* h) {
    if (idx < 0 || idx >= static_cast<int>(paths_.size())) return -2;
    std::unique_lock<std::mutex> lk(mu_);
    if (!ready_.count(idx)) {
      if (pending_.count(idx)) {
        // Promote a queued hint to the front (it may be mid-decode, in
        // which case it is no longer in the queue and this is a no-op).
        for (auto it = queue_.begin(); it != queue_.end(); ++it) {
          if (*it == idx) {
            queue_.erase(it);
            queue_.push_front(idx);
            break;
          }
        }
      } else {
        pending_[idx] = true;
        queue_.push_front(idx);
      }
      demanded_.insert(idx);
      cv_work_.notify_one();
    }
    cv_ready_.wait(lk, [&] { return ready_.count(idx) > 0; });
    Image img = std::move(ready_[idx]);
    ready_.erase(idx);
    cv_work_.notify_all();  // capacity freed
    lk.unlock();

    if (!img.ok) return -1;
    *w = img.width;
    *h = img.height;
    const int64_t n = static_cast<int64_t>(img.rgb.size());
    if (n > out_size) return -1;
    std::memcpy(out, img.rgb.data(), n);
    return 0;
  }

  // Decoded-size query. Served from the decoded image or a memoized size
  // when possible — the PNG header is read from disk at most ONCE per
  // path, never again on the consumer's hot take() path.
  int64_t image_bytes(int idx) {
    if (idx < 0 || idx >= static_cast<int>(paths_.size())) return -1;
    {
      std::lock_guard<std::mutex> lk(mu_);
      auto ready = ready_.find(idx);
      if (ready != ready_.end() && ready->second.ok)
        return static_cast<int64_t>(ready->second.rgb.size());
      auto cached = size_cache_.find(idx);
      if (cached != size_cache_.end()) return cached->second;
    }
    png_image image;
    std::memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_file(&image, paths_[idx].c_str()))
      return -1;
    image.format = PNG_FORMAT_RGB;
    int64_t size = PNG_IMAGE_SIZE(image);
    png_image_free(&image);
    std::lock_guard<std::mutex> lk(mu_);
    size_cache_[idx] = size;
    return size;
  }

 private:
  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&] {
          // Demanded items run even when ready_ is at capacity —
          // otherwise a consumer blocked on an undecoded index could
          // deadlock against a cache full of other images.
          return stop_ ||
                 (!queue_.empty() &&
                  (static_cast<int>(ready_.size()) < capacity_ ||
                   demanded_.count(queue_.front()) > 0));
        });
        if (stop_) return;
        idx = queue_.front();
        queue_.pop_front();
      }
      Image img = decode_png_rgb8(paths_[idx].c_str());
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (img.ok)
          size_cache_[idx] = static_cast<int64_t>(img.rgb.size());
        ready_[idx] = std::move(img);
        pending_.erase(idx);
        demanded_.erase(idx);
      }
      cv_ready_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  int capacity_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_work_;
  std::condition_variable cv_ready_;
  std::deque<int> queue_;
  std::unordered_map<int, Image> ready_;
  std::unordered_map<int, bool> pending_;
  std::unordered_map<int, int64_t> size_cache_;
  std::unordered_set<int> demanded_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

// One-shot decode. Pass out=nullptr to query dimensions only.
// Returns 0 ok, -1 failure, -3 buffer too small.
int sl_decode_png_rgb8(const char* path, uint8_t* out, int64_t out_size,
                       uint32_t* width, uint32_t* height) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -1;
  image.format = PNG_FORMAT_RGB;
  *width = image.width;
  *height = image.height;
  const int64_t need = PNG_IMAGE_SIZE(image);
  if (out == nullptr) {
    png_image_free(&image);
    return 0;
  }
  if (need > out_size) {
    png_image_free(&image);
    return -3;
  }
  if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) return -1;
  return 0;
}

void* sl_pool_create(const char** paths, int n_paths, int n_threads,
                     int capacity) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new PrefetchPool(std::move(p), n_threads, capacity);
}

void sl_pool_destroy(void* pool) { delete static_cast<PrefetchPool*>(pool); }

void sl_pool_request(void* pool, int idx) {
  static_cast<PrefetchPool*>(pool)->request(idx);
}

int sl_pool_wait(void* pool, int idx, uint8_t* out, int64_t out_size,
                 uint32_t* width, uint32_t* height) {
  return static_cast<PrefetchPool*>(pool)->wait_and_take(idx, out, out_size,
                                                         width, height);
}

int64_t sl_pool_image_bytes(void* pool, int idx) {
  return static_cast<PrefetchPool*>(pool)->image_bytes(idx);
}

}  // extern "C"
