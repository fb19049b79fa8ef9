// Native npz volume decoder for the gan3d_tpu data pipeline.
//
// The reference feeds training through torch DataLoader workers decoding
// per-sample .npz files (reference: data_handler.py:20-33, trainer.py:84).
// Python-side decoding costs zip parsing + zlib inflate + clip per sample;
// this library does all three in C++ worker threads, writing float32
// volumes clipped to [-1, 1] directly into a caller-provided batch buffer
// (zero Python-side copies). Exposed via ctypes from
// gan3d_tpu/data/native.py.
//
// Supports the subset of zip/npy that numpy's savez/savez_compressed emits:
// stored (method 0) or deflate (method 8) entries, C-order '<f4'/'<f8'
// arrays, npy format versions 1.x/2.x.

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Entry {
  uint16_t method = 0;
  uint64_t comp_size = 0;
  uint64_t raw_size = 0;
  long offset = 0;  // file offset of the payload
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}

// Locate the first entry whose name ends with ".npy" (savez stores the
// array under "<key>.npy"; per-sample files hold exactly one array).
bool find_npy_entry(FILE* f, Entry* out) {
  // Find EOCD: scan the last 64KB + 22 bytes for the signature.
  if (fseek(f, 0, SEEK_END) != 0) return false;
  long fsize = ftell(f);
  long scan = fsize < 65558 ? fsize : 65558;
  std::vector<uint8_t> tail(scan);
  fseek(f, fsize - scan, SEEK_SET);
  if (fread(tail.data(), 1, scan, f) != (size_t)scan) return false;
  long eocd = -1;
  for (long i = scan - 22; i >= 0; --i) {
    if (rd32(&tail[i]) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd < 0) return false;
  uint16_t n_entries = rd16(&tail[eocd + 10]);
  uint32_t cd_off = rd32(&tail[eocd + 16]);

  fseek(f, cd_off, SEEK_SET);
  for (uint16_t e = 0; e < n_entries; ++e) {
    uint8_t h[46];
    if (fread(h, 1, 46, f) != 46 || rd32(h) != 0x02014b50) return false;
    uint16_t method = rd16(&h[10]);
    uint32_t csize = rd32(&h[20]);
    uint32_t usize = rd32(&h[24]);
    uint16_t nlen = rd16(&h[28]);
    uint16_t xlen = rd16(&h[30]);
    uint16_t clen = rd16(&h[32]);
    uint32_t lho = rd32(&h[42]);
    std::string name(nlen, '\0');
    if (fread(&name[0], 1, nlen, f) != nlen) return false;
    fseek(f, xlen + clen, SEEK_CUR);
    if (name.size() >= 4 && name.compare(name.size() - 4, 4, ".npy") == 0) {
      long cd_pos = ftell(f);
      // Local header: recompute payload offset (local extra may differ).
      uint8_t lh[30];
      fseek(f, lho, SEEK_SET);
      if (fread(lh, 1, 30, f) != 30 || rd32(lh) != 0x04034b50) return false;
      uint16_t lnlen = rd16(&lh[26]);
      uint16_t lxlen = rd16(&lh[28]);
      out->method = method;
      out->comp_size = csize;
      out->raw_size = usize;
      out->offset = lho + 30 + lnlen + lxlen;
      fseek(f, cd_pos, SEEK_SET);
      return true;
    }
  }
  return false;
}

// Parse the npy header at the start of `raw`; returns payload offset and
// element dtype size (4 or 8), or 0 on failure.
size_t parse_npy(const uint8_t* raw, size_t size, int* elem_size) {
  if (size < 10 || memcmp(raw, "\x93NUMPY", 6) != 0) return 0;
  int major = raw[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(&raw[8]);
    hoff = 10;
  } else {
    hlen = rd32(&raw[8]);
    hoff = 12;
  }
  if (hoff + hlen > size) return 0;
  std::string hdr((const char*)raw + hoff, hlen);
  if (hdr.find("'fortran_order': True") != std::string::npos) return 0;
  if (hdr.find("<f4") != std::string::npos) *elem_size = 4;
  else if (hdr.find("<f8") != std::string::npos) *elem_size = 8;
  else return 0;
  return hoff + hlen;
}

// Decode one npz file into out[0..out_elems) as clipped float32.
int decode_file(const char* path, float* out, long out_elems) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Entry e;
  if (!find_npy_entry(f, &e)) { fclose(f); return -2; }

  std::vector<uint8_t> raw(e.raw_size);
  if (e.method == 0) {
    fseek(f, e.offset, SEEK_SET);
    if (fread(raw.data(), 1, e.raw_size, f) != e.raw_size) {
      fclose(f);
      return -3;
    }
  } else if (e.method == 8) {
    std::vector<uint8_t> comp(e.comp_size);
    fseek(f, e.offset, SEEK_SET);
    if (fread(comp.data(), 1, e.comp_size, f) != e.comp_size) {
      fclose(f);
      return -3;
    }
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) { fclose(f); return -4; }
    zs.next_in = comp.data();
    zs.avail_in = (uInt)e.comp_size;
    zs.next_out = raw.data();
    zs.avail_out = (uInt)e.raw_size;
    int zr = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (zr != Z_STREAM_END) { fclose(f); return -5; }
  } else {
    fclose(f);
    return -6;
  }
  fclose(f);

  int elem_size = 0;
  size_t payload = parse_npy(raw.data(), raw.size(), &elem_size);
  if (payload == 0) return -7;
  long n = (long)((raw.size() - payload) / elem_size);
  if (n != out_elems) return -8;

  if (elem_size == 4) {
    const float* src = (const float*)(raw.data() + payload);
    for (long i = 0; i < n; ++i) {
      float v = src[i];
      out[i] = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
    }
  } else {
    const double* src = (const double*)(raw.data() + payload);
    for (long i = 0; i < n; ++i) {
      double v = src[i];
      out[i] = (float)(v < -1. ? -1. : (v > 1. ? 1. : v));
    }
  }
  return 0;
}

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { this->run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_;
};

}  // namespace

extern "C" {

void* loader_create(int num_threads) { return new Pool(num_threads); }

void loader_destroy(void* p) { delete (Pool*)p; }

int loader_decode(const char* path, float* out, long out_elems) {
  return decode_file(path, out, out_elems);
}

// Decode n files concurrently into a contiguous batch buffer
// [n, per_elems]. Returns 0 if every file decoded, else the first nonzero
// error code.
int loader_decode_batch(void* pool, const char** paths, int n, float* out,
                        long per_elems) {
  Pool* p = (Pool*)pool;
  std::atomic<int> err{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      int r = decode_file(paths[i], out + (long)i * per_elems, per_elems);
      if (r != 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, r);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return err.load();
}

}  // extern "C"
