// Asynchronous trajectory/metrics sink: background-thread .npy writer.
//
// The training loop streams episode dumps, evaluation sweeps and checkpoints
// (the reference's .npz/.npy side-channel files, burger_environment.py:207-238,
// burger_testing_environment.py:168-179) to the host.  Doing that write on the
// Python thread stalls the dispatch loop between generations; this sink copies
// the buffer once and returns, a worker thread does the filesystem work.
//
// C API (ctypes-friendly):
//   void* sink_create(const char* dir);
//   int   sink_write(void* s, const char* name, const void* data,
//                    int dtype_code, int ndim, const long* shape);
//   long  sink_pending(void* s);
//   void  sink_flush(void* s);
//   void  sink_destroy(void* s);
// dtype_code: 0=f32, 1=f64, 2=i32, 3=i64, 4=u8
//
// Build: make -C csrc   (produces libmarlpde_sink.so)

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

struct Job {
  std::string path;
  std::string header;
  std::vector<uint8_t> data;
};

const char* kDtypeDescr[] = {"<f4", "<f8", "<i4", "<i8", "|u1"};
const size_t kDtypeSize[] = {4, 8, 4, 8, 1};

std::string npy_header(int dtype_code, int ndim, const long* shape) {
  std::string dict = "{'descr': '";
  dict += kDtypeDescr[dtype_code];
  dict += "', 'fortran_order': False, 'shape': (";
  for (int i = 0; i < ndim; ++i) {
    dict += std::to_string(shape[i]);
    if (ndim == 1 || i < ndim - 1) dict += ",";
    if (i < ndim - 1) dict += " ";
  }
  dict += "), }";
  // pad so that magic(6)+ver(2)+hlen(2)+dict is a multiple of 64
  size_t base = 6 + 2 + 2;
  size_t total = base + dict.size() + 1;  // +1 for '\n'
  size_t pad = (64 - (total % 64)) % 64;
  dict.append(pad, ' ');
  dict += '\n';

  std::string out = "\x93NUMPY";
  out += '\x01';
  out += '\x00';
  uint16_t hlen = static_cast<uint16_t>(dict.size());
  out += static_cast<char>(hlen & 0xff);
  out += static_cast<char>((hlen >> 8) & 0xff);
  out += dict;
  return out;
}

class Sink {
 public:
  explicit Sink(std::string dir) : dir_(std::move(dir)), stop_(false) {
    worker_ = std::thread([this] { this->run(); });
  }

  ~Sink() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    worker_.join();
  }

  int write(const char* name, const void* data, int dtype_code, int ndim,
            const long* shape) {
    if (dtype_code < 0 || dtype_code > 4 || ndim < 0 || ndim > 8) return -1;
    size_t count = 1;
    for (int i = 0; i < ndim; ++i) count *= static_cast<size_t>(shape[i]);
    size_t bytes = count * kDtypeSize[dtype_code];

    Job job;
    job.path = dir_ + "/" + name + ".npy";
    job.header = npy_header(dtype_code, ndim, shape);
    job.data.resize(bytes);
    std::memcpy(job.data.data(), data, bytes);
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push_back(std::move(job));
      pending_.fetch_add(1, std::memory_order_relaxed);
    }
    cv_.notify_one();
    return 0;
  }

  long pending() const { return pending_.load(std::memory_order_relaxed); }

  void flush() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return jobs_.empty() && !writing_; });
  }

 private:
  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (jobs_.empty()) {
          if (stop_) return;
          continue;
        }
        job = std::move(jobs_.front());
        jobs_.pop_front();
        writing_ = true;
      }
      FILE* f = std::fopen(job.path.c_str(), "wb");
      if (f) {
        std::fwrite(job.header.data(), 1, job.header.size(), f);
        std::fwrite(job.data.data(), 1, job.data.size(), f);
        std::fclose(f);
      }
      {
        std::unique_lock<std::mutex> lk(mu_);
        writing_ = false;
        pending_.fetch_sub(1, std::memory_order_relaxed);
        if (jobs_.empty()) done_cv_.notify_all();
      }
    }
  }

  std::string dir_;
  std::deque<Job> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  std::thread worker_;
  std::atomic<long> pending_{0};
  bool writing_ = false;
  bool stop_;
};

}  // namespace

extern "C" {

void* sink_create(const char* dir) { return new Sink(dir); }

int sink_write(void* s, const char* name, const void* data, int dtype_code,
               int ndim, const long* shape) {
  return static_cast<Sink*>(s)->write(name, data, dtype_code, ndim, shape);
}

long sink_pending(void* s) { return static_cast<Sink*>(s)->pending(); }

void sink_flush(void* s) { static_cast<Sink*>(s)->flush(); }

void sink_destroy(void* s) { delete static_cast<Sink*>(s); }

}  // extern "C"
