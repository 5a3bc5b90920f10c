// Native data-loading runtime: raw dataset parsing + shuffled batch
// assembly + prefetch, exposed through a C ABI (ctypes-consumed by
// convolutional_diffusion_tpu.utils.native_loader).
//
// The torch reference streams batches through a Python DataLoader
// (src/utils/train.py:28-37); here the host-side pipeline is native:
//  - IDX (MNIST/FashionMNIST) and CIFAR-10 binary parsing
//  - in-memory uint8 store, normalized to float32 in [-1, 1] on the fly
//    (ToTensor + Normalize(0.5, 0.5) semantics, reference data.py:15-19)
//  - per-epoch Fisher-Yates shuffle with a seeded xorshift RNG
//  - a background prefetch thread filling a double-buffered batch queue so
//    batch assembly overlaps device compute.
//
// Build: make -C native  (produces libcdtpu_loader.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Dataset {
  std::vector<uint8_t> images;  // [n, h, w, c] HWC row-major
  std::vector<int32_t> labels;  // [n]
  int64_t n = 0;
  int h = 0, w = 0, c = 0;
};

uint32_t read_be32(std::ifstream& f) {
  unsigned char b[4];
  f.read(reinterpret_cast<char*>(b), 4);
  return (uint32_t(b[0]) << 24) | (uint32_t(b[1]) << 16) |
         (uint32_t(b[2]) << 8) | uint32_t(b[3]);
}

bool load_idx_images(const std::string& path, Dataset& ds) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  uint32_t magic = read_be32(f);
  if (magic != 0x00000803) return false;  // idx3 uint8
  uint32_t n = read_be32(f), h = read_be32(f), w = read_be32(f);
  ds.n = n;
  ds.h = int(h);
  ds.w = int(w);
  ds.c = 1;
  ds.images.resize(size_t(n) * h * w);
  f.read(reinterpret_cast<char*>(ds.images.data()), ds.images.size());
  return bool(f);
}

bool load_idx_labels(const std::string& path, Dataset& ds) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  uint32_t magic = read_be32(f);
  if (magic != 0x00000801) return false;  // idx1 uint8
  uint32_t n = read_be32(f);
  std::vector<uint8_t> raw(n);
  f.read(reinterpret_cast<char*>(raw.data()), n);
  if (!f) return false;
  ds.labels.assign(raw.begin(), raw.end());
  return true;
}

// CIFAR-10 binary format: records of [label u8][3072 u8 CHW planar]
bool load_cifar_bin(const std::vector<std::string>& paths, Dataset& ds) {
  ds.h = ds.w = 32;
  ds.c = 3;
  const size_t rec = 1 + 3072;
  for (const auto& p : paths) {
    std::ifstream f(p, std::ios::binary);
    if (!f) return false;
    f.seekg(0, std::ios::end);
    size_t bytes = size_t(f.tellg());
    f.seekg(0);
    size_t n_rec = bytes / rec;
    std::vector<uint8_t> buf(bytes);
    f.read(reinterpret_cast<char*>(buf.data()), bytes);
    for (size_t i = 0; i < n_rec; ++i) {
      const uint8_t* r = buf.data() + i * rec;
      ds.labels.push_back(int32_t(r[0]));
      // CHW planar -> HWC interleaved
      size_t base = ds.images.size();
      ds.images.resize(base + 3072);
      const uint8_t* rch = r + 1;
      for (int y = 0; y < 32; ++y)
        for (int x = 0; x < 32; ++x)
          for (int ch = 0; ch < 3; ++ch)
            ds.images[base + (size_t(y) * 32 + x) * 3 + ch] =
                rch[size_t(ch) * 1024 + size_t(y) * 32 + x];
    }
    ds.n += int64_t(n_rec);
  }
  return ds.n > 0;
}

struct Batch {
  std::vector<float> images;
  std::vector<int32_t> labels;
};

struct Loader {
  Dataset ds;
  int batch_size = 128;
  bool drop_last = true;
  uint64_t seed = 0;
  int64_t epoch = 0;
  // iteration state
  std::vector<int64_t> order;
  int64_t cursor = 0;
  // prefetch
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::vector<Batch> queue;
  size_t queue_cap = 4;
  std::atomic<bool> stop{false};

  void reshuffle() {
    order.resize(ds.n);
    for (int64_t i = 0; i < ds.n; ++i) order[i] = i;
    std::mt19937_64 rng(seed + uint64_t(epoch) * 0x9E3779B97F4A7C15ull);
    for (int64_t i = ds.n - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> d(0, i);
      std::swap(order[i], order[d(rng)]);
    }
    cursor = 0;
  }

  bool fill_batch(Batch& out) {
    int64_t remaining = ds.n - cursor;
    if (remaining <= 0 || (drop_last && remaining < batch_size)) {
      epoch++;
      reshuffle();
      remaining = ds.n;
    }
    int64_t bs = std::min<int64_t>(batch_size, remaining);
    size_t px = size_t(ds.h) * ds.w * ds.c;
    out.images.resize(size_t(bs) * px);
    out.labels.resize(bs);
    for (int64_t j = 0; j < bs; ++j) {
      int64_t idx = order[cursor + j];
      const uint8_t* src = ds.images.data() + size_t(idx) * px;
      float* dst = out.images.data() + size_t(j) * px;
      for (size_t k = 0; k < px; ++k)
        dst[k] = (float(src[k]) / 255.0f - 0.5f) / 0.5f;
      out.labels[size_t(j)] = ds.labels[size_t(idx)];
    }
    cursor += bs;
    return true;
  }

  void run() {
    while (!stop.load()) {
      Batch b;
      fill_batch(b);
      std::unique_lock<std::mutex> lk(mu);
      cv_empty.wait(lk, [&] { return queue.size() < queue_cap || stop.load(); });
      if (stop.load()) return;
      queue.push_back(std::move(b));
      cv_full.notify_one();
    }
  }

  void start() {
    reshuffle();
    worker = std::thread([this] { run(); });
  }

  ~Loader() {
    stop.store(true);
    cv_empty.notify_all();
    cv_full.notify_all();
    if (worker.joinable()) worker.join();
  }
};

}  // namespace

extern "C" {

// Returns an opaque handle, or nullptr on failure.
void* cdtpu_loader_open_idx(const char* images_path, const char* labels_path,
                            int batch_size, uint64_t seed, int drop_last) {
  auto* L = new Loader();
  if (!load_idx_images(images_path, L->ds) ||
      !load_idx_labels(labels_path, L->ds)) {
    delete L;
    return nullptr;
  }
  // a label file from a different split (e.g. 10k test labels with 60k
  // train images) would make fill_batch read labels out of bounds
  if (static_cast<int64_t>(L->ds.labels.size()) != L->ds.n) {
    delete L;
    return nullptr;
  }
  L->batch_size = batch_size;
  L->seed = seed;
  L->drop_last = drop_last != 0;
  L->start();
  return L;
}

// paths: semicolon-separated list of CIFAR .bin files.
void* cdtpu_loader_open_cifar(const char* paths, int batch_size, uint64_t seed,
                              int drop_last) {
  auto* L = new Loader();
  std::vector<std::string> files;
  std::string s(paths), cur;
  for (char ch : s) {
    if (ch == ';') {
      if (!cur.empty()) files.push_back(cur);
      cur.clear();
    } else {
      cur.push_back(ch);
    }
  }
  if (!cur.empty()) files.push_back(cur);
  if (!load_cifar_bin(files, L->ds)) {
    delete L;
    return nullptr;
  }
  L->batch_size = batch_size;
  L->seed = seed;
  L->drop_last = drop_last != 0;
  L->start();
  return L;
}

// In-memory open (for tests / synthetic data): copies the uint8 buffer.
void* cdtpu_loader_open_memory(const uint8_t* images, const int32_t* labels,
                               int64_t n, int h, int w, int c, int batch_size,
                               uint64_t seed, int drop_last) {
  auto* L = new Loader();
  size_t px = size_t(h) * w * c;
  L->ds.images.assign(images, images + size_t(n) * px);
  L->ds.labels.assign(labels, labels + n);
  L->ds.n = n;
  L->ds.h = h;
  L->ds.w = w;
  L->ds.c = c;
  L->batch_size = batch_size;
  L->seed = seed;
  L->drop_last = drop_last != 0;
  L->start();
  return L;
}

int64_t cdtpu_loader_num_samples(void* h) {
  return static_cast<Loader*>(h)->ds.n;
}
int cdtpu_loader_shape(void* h, int* hh, int* ww, int* cc) {
  auto* L = static_cast<Loader*>(h);
  *hh = L->ds.h;
  *ww = L->ds.w;
  *cc = L->ds.c;
  return 0;
}

// Blocks until a prefetched batch is available; copies it into out buffers
// (out_images: batch*h*w*c floats, out_labels: batch ints). Returns the
// actual batch size.
int cdtpu_loader_next(void* h, float* out_images, int32_t* out_labels) {
  auto* L = static_cast<Loader*>(h);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_full.wait(lk, [&] { return !L->queue.empty(); });
    b = std::move(L->queue.front());
    L->queue.erase(L->queue.begin());
    L->cv_empty.notify_one();
  }
  std::memcpy(out_images, b.images.data(), b.images.size() * sizeof(float));
  std::memcpy(out_labels, b.labels.data(), b.labels.size() * sizeof(int32_t));
  return int(b.labels.size());
}

void cdtpu_loader_close(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
