// Native collocation-point generator for the PINN training loop.
//
// The reference has no data loader at all: its tests draw NumPy uniforms on
// the host once (test/test_2d.py:28).  A production PINN trainer draws a
// fresh collocation batch every step; on the single-core TPU hosts this
// competes with the Python driver, so batch generation lives here: a C++
// worker thread fills a ring of buffers with counter-based Philox-2x32-10
// uniforms — deterministic for a given seed, regeneratable at any step for
// checkpoint/resume, and overlapped with device execution.
//
// C ABI only (loaded via ctypes; no pybind11 in this toolchain).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// Philox-2x32-10 (Salmon et al., "Parallel Random Numbers: As Easy as
// 1, 2, 3", SC'11): counter-based, no global state, seekable by counter.
// The 2x32 variant uses a SINGLE multiplier by design (only 4x32 has a
// pair); kMul/kWeyl are Random123's PHILOX_M2x32_0 / PHILOX_W32_0, and
// the implementation reproduces the Random123 kat_vectors known-answer
// outputs (pinned in tests/test_pointgen.py along with uniformity checks).
struct Philox2x32 {
  static constexpr uint32_t kMul = 0xD256D193u;
  static constexpr uint32_t kWeyl = 0x9E3779B9u;

  static inline void round_(uint32_t& c0, uint32_t& c1, uint32_t key) {
    const uint64_t prod = static_cast<uint64_t>(c0) * kMul;
    const uint32_t hi = static_cast<uint32_t>(prod >> 32);
    const uint32_t lo = static_cast<uint32_t>(prod);
    c0 = hi ^ key ^ c1;
    c1 = lo;
  }

  // 64-bit counter + 32-bit key -> two uint32 outputs.
  static inline void gen(uint64_t counter, uint32_t key, uint32_t out[2]) {
    uint32_t c0 = static_cast<uint32_t>(counter);
    uint32_t c1 = static_cast<uint32_t>(counter >> 32);
    uint32_t k = key;
    for (int i = 0; i < 10; ++i) {
      round_(c0, c1, k);
      k += kWeyl;
    }
    out[0] = c0;
    out[1] = c1;
  }
};

inline float u01(uint32_t bits) {
  // 24 mantissa bits -> [0, 1)
  return static_cast<float>(bits >> 8) * (1.0f / 16777216.0f);
}

void fill_uniform(float* dst, int64_t n_values, uint32_t seed,
                  uint64_t counter_base, float lo, float hi) {
  const float span = hi - lo;
  uint32_t out[2];
  int64_t i = 0;
  uint64_t ctr = counter_base;
  while (i < n_values) {
    Philox2x32::gen(ctr++, seed, out);
    dst[i++] = lo + span * u01(out[0]);
    if (i < n_values) dst[i++] = lo + span * u01(out[1]);
  }
}

struct Generator {
  int64_t batch_points;
  int dim;
  uint32_t seed;
  float lo, hi;
  int n_slots;

  std::vector<std::vector<float>> slots;
  std::vector<uint64_t> slot_step;   // which step each slot holds
  uint64_t next_produced = 0;        // next step index to generate
  uint64_t next_consumed = 0;        // next step index the host will take

  std::mutex mu;
  std::condition_variable cv_space, cv_data;
  std::atomic<bool> stop{false};
  std::thread worker;

  Generator(int64_t bp, int d, uint32_t s, float l, float h, int slots_n)
      : batch_points(bp), dim(d), seed(s), lo(l), hi(h), n_slots(slots_n),
        slots(slots_n), slot_step(slots_n, ~0ull) {
    for (auto& v : slots) v.resize(static_cast<size_t>(bp) * d);
    worker = std::thread([this] { run(); });
  }

  ~Generator() {
    stop.store(true);
    cv_space.notify_all();
    cv_data.notify_all();
    if (worker.joinable()) worker.join();
  }

  void generate_into(float* dst, uint64_t step) const {
    const uint64_t values_per_batch =
        static_cast<uint64_t>(batch_points) * dim;
    fill_uniform(dst, values_per_batch, seed, step * values_per_batch, lo,
                 hi);
  }

  void run() {
    while (!stop.load()) {
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [this] {
        return stop.load() ||
               next_produced < next_consumed + static_cast<uint64_t>(n_slots);
      });
      if (stop.load()) return;
      const uint64_t step = next_produced;
      const int slot = static_cast<int>(step % n_slots);
      lk.unlock();
      generate_into(slots[slot].data(), step);
      lk.lock();
      slot_step[slot] = step;
      next_produced = step + 1;
      cv_data.notify_all();
    }
  }

  // Copy batch for `step` into dst (blocking until produced).
  void take(float* dst, uint64_t step) {
    {
      std::unique_lock<std::mutex> lk(mu);
      // allow random access for resume: regenerate directly if outside the
      // ring window
      if (step + n_slots <= next_produced || step >= next_consumed + n_slots) {
        lk.unlock();
        generate_into(dst, step);
        return;
      }
      cv_data.wait(lk, [this, step] {
        return stop.load() || next_produced > step;
      });
      if (stop.load()) return;
      const int slot = static_cast<int>(step % n_slots);
      if (slot_step[slot] == step) {
        std::memcpy(dst, slots[slot].data(),
                    slots[slot].size() * sizeof(float));
        if (step == next_consumed) {
          next_consumed = step + 1;
          cv_space.notify_all();
        }
        return;
      }
    }
    generate_into(dst, step);  // slot was recycled: regenerate
  }
};

}  // namespace

extern "C" {

void* pointgen_create(int64_t batch_points, int dim, uint32_t seed, float lo,
                      float hi, int n_slots) {
  return new Generator(batch_points, dim, seed, lo, hi,
                       n_slots < 1 ? 1 : n_slots);
}

void pointgen_destroy(void* g) { delete static_cast<Generator*>(g); }

// Fill dst (batch_points * dim floats) with the batch for `step`.
void pointgen_take(void* g, float* dst, uint64_t step) {
  static_cast<Generator*>(g)->take(dst, step);
}

// One-shot, no threading: deterministic batch for `step`.
void pointgen_fill(int64_t batch_points, int dim, uint32_t seed,
                   uint64_t step, float lo, float hi, float* dst) {
  const uint64_t values = static_cast<uint64_t>(batch_points) * dim;
  fill_uniform(dst, values, seed, step * values, lo, hi);
}

}  // extern "C"
