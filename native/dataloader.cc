// vaevar_tpu native data loader: threaded .npy prefetcher with a ring buffer.
//
// TPU-native replacement for the reference's 60-process shared-memory
// dataloader (reference dataset/dataset.py:133-446): a pool of C++ reader
// threads parse float32 .npy files (v1/v2 headers), optionally apply
// per-channel normalization, and publish samples into a bounded ring buffer
// the Python training loop drains via ctypes. No pickling, no fork, no GIL
// on the hot path; host->device transfer happens from stable buffers.
//
// C API (ctypes):
//   vvl_create(capacity, sample_floats, n_threads) -> handle
//   vvl_set_norm(handle, mean*, std*, n_channels, chan_stride)
//   vvl_submit(handle, path)            // enqueue one file (one sample slot)
//   vvl_submit_tagged(handle, path, tag) // enqueue with a caller tag
//   vvl_next(handle, out_ptr, timeout_ms) -> 1 ok, 0 timeout, -1 error/eof
//   vvl_next_tagged(handle, out_ptr, tag_out*, timeout_ms) // same + the
//       submit tag of the delivered sample (completion order is NOT submit
//       order across reader threads; tags let callers reassemble)
//   vvl_pending(handle)                 // submitted - delivered
//   vvl_destroy(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Sample {
  std::vector<float> data;
  long tag = -1;
  bool ok = false;
};

// Minimal .npy reader: little-endian float32/float64, C-order only.
bool read_npy_f32(const std::string& path, std::vector<float>& out,
                  size_t expect_floats) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); return false; }
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24);
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) {
    fclose(f);
    return false;
  }
  bool f64 = header.find("'<f8'") != std::string::npos ||
             header.find("\"<f8\"") != std::string::npos;
  bool f32 = header.find("'<f4'") != std::string::npos ||
             header.find("\"<f4\"") != std::string::npos;
  if (!f32 && !f64) { fclose(f); return false; }
  if (header.find("'fortran_order': True") != std::string::npos) {
    fclose(f);
    return false;
  }
  out.resize(expect_floats);
  size_t got;
  if (f32) {
    got = fread(out.data(), sizeof(float), expect_floats, f);
  } else {
    std::vector<double> tmp(expect_floats);
    got = fread(tmp.data(), sizeof(double), expect_floats, f);
    for (size_t i = 0; i < got; ++i) out[i] = static_cast<float>(tmp[i]);
  }
  fclose(f);
  return got == expect_floats;
}

class Loader {
 public:
  Loader(size_t capacity, size_t sample_floats, int n_threads)
      : capacity_(capacity), sample_floats_(sample_floats), stop_(false) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { worker(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_work_.notify_all();
    cv_space_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void set_norm(const float* mean, const float* stdv, int n_channels,
                long chan_stride) {
    std::lock_guard<std::mutex> lk(mu_);
    mean_.assign(mean, mean + n_channels);
    std_.assign(stdv, stdv + n_channels);
    chan_stride_ = chan_stride;
  }

  void submit(const char* path, long tag = -1) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      pending_paths_.emplace_back(path, tag);
      ++submitted_;
    }
    cv_work_.notify_one();
  }

  // Returns 1 ok, 0 timeout, -1 load error.
  int next(float* out, int timeout_ms, long* tag_out = nullptr) {
    std::unique_lock<std::mutex> lk(mu_);
    if (!cv_ready_.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                            [this] { return !ready_.empty() || stop_; }))
      return 0;
    if (ready_.empty()) return 0;
    Sample s = std::move(ready_.front());
    ready_.pop_front();
    ++delivered_;
    lk.unlock();
    cv_space_.notify_one();
    if (tag_out) *tag_out = s.tag;
    if (!s.ok) return -1;
    memcpy(out, s.data.data(), sample_floats_ * sizeof(float));
    return 1;
  }

  long pending() const {
    std::lock_guard<std::mutex> lk(mu_);
    return submitted_ - delivered_;
  }

 private:
  void worker() {
    while (true) {
      std::pair<std::string, long> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [this] { return stop_ || !pending_paths_.empty(); });
        if (stop_) return;
        job = std::move(pending_paths_.front());
        pending_paths_.pop_front();
      }
      Sample s;
      s.tag = job.second;
      s.ok = read_npy_f32(job.first, s.data, sample_floats_);
      if (s.ok && !mean_.empty() && chan_stride_ > 0) {
        const size_t C = mean_.size();
        for (size_t c = 0; c < C; ++c) {
          const float m = mean_[c], inv = 1.0f / std_[c];
          float* p = s.data.data() + c * chan_stride_;
          // applied to every frame in the sample
          for (size_t off = c * chan_stride_; off < sample_floats_;
               off += C * chan_stride_) {
            float* q = s.data.data() + off;
            for (long i = 0; i < chan_stride_; ++i) q[i] = (q[i] - m) * inv;
          }
          (void)p;
        }
      }
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_space_.wait(lk,
                       [this] { return stop_ || ready_.size() < capacity_; });
        if (stop_) return;
        ready_.push_back(std::move(s));
      }
      cv_ready_.notify_one();
    }
  }

  const size_t capacity_;
  const size_t sample_floats_;
  mutable std::mutex mu_;
  std::condition_variable cv_work_, cv_ready_, cv_space_;
  std::deque<std::pair<std::string, long>> pending_paths_;
  std::deque<Sample> ready_;
  std::vector<std::thread> workers_;
  std::vector<float> mean_, std_;
  long chan_stride_ = 0;
  long submitted_ = 0, delivered_ = 0;
  bool stop_;
};

}  // namespace

extern "C" {

void* vvl_create(long capacity, long sample_floats, int n_threads) {
  return new Loader(static_cast<size_t>(capacity),
                    static_cast<size_t>(sample_floats), n_threads);
}

void vvl_set_norm(void* h, const float* mean, const float* stdv,
                  int n_channels, long chan_stride) {
  static_cast<Loader*>(h)->set_norm(mean, stdv, n_channels, chan_stride);
}

void vvl_submit(void* h, const char* path) {
  static_cast<Loader*>(h)->submit(path);
}

void vvl_submit_tagged(void* h, const char* path, long tag) {
  static_cast<Loader*>(h)->submit(path, tag);
}

int vvl_next(void* h, float* out, int timeout_ms) {
  return static_cast<Loader*>(h)->next(out, timeout_ms);
}

int vvl_next_tagged(void* h, float* out, long* tag_out, int timeout_ms) {
  return static_cast<Loader*>(h)->next(out, timeout_ms, tag_out);
}

long vvl_pending(void* h) { return static_cast<Loader*>(h)->pending(); }

void vvl_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
