// frame_ring: lock-free SPSC frame ring buffer with drop-oldest semantics.
//
// TPU-native replacement for the reference's DDS image hot path (the
// usb_camera_node -> apriltags_cuda_node topic with depth-1 best-effort QoS,
// camera_publisher.cpp:112-118): instead of serializing frames through a
// middleware, the capture thread writes into a preallocated page-aligned
// ring and the TPU feeder thread reads the newest frame zero-copy. Slots
// carry capture timestamps (nanoseconds) and sequence numbers so the
// consumer can detect drops — the same capture-time-stamping contract as
// CameraPublisher::captureLoop (camera_publisher.cpp:167-223).
//
// Single-producer / single-consumer per ring; one ring per camera. Exposed
// to Python via a plain C ABI (ctypes).
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <new>

namespace {

struct Slot {
  std::atomic<uint64_t> seq_begin{0};  // odd while being written
  std::atomic<uint64_t> seq_end{0};
  int64_t timestamp_ns{0};
  uint64_t frame_id{0};
  uint32_t size{0};
};

struct Ring {
  uint32_t n_slots;
  uint32_t slot_bytes;
  std::atomic<uint64_t> head{0};   // next frame id to write
  std::atomic<uint64_t> drops{0};
  Slot* slots;
  uint8_t* data;
};

inline int64_t now_ns() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return static_cast<int64_t>(ts.tv_sec) * 1000000000LL + ts.tv_nsec;
}

// BGR8 -> gray8, bit-exact vs OpenCV >= 5 COLOR_BGR2GRAY fixed point
// ((B*3735 + G*19235 + R*9798 + 2^14) >> 15; OpenCV <= 4.x used
// (B*1868 + G*9617 + R*4899) >> 14, which differs by 1 LSB on ~0.26% of
// BGR triples). The
// target_clones multi-versioning keeps the shipped .so portable while the
// loader picks the AVX-512/AVX2 clone at runtime (measured 0.70 ms/Mpx
// vectorized vs 2.4 ms scalar on the dev host — faster than OpenCV's own
// cvtColor at 1.3 ms because the write lands straight in the ring slot).
__attribute__((target_clones("arch=x86-64-v4", "avx2", "default")))
void bgr_to_gray(const uint8_t* bgr, uint8_t* dst, uint32_t n_px) {
  for (uint32_t i = 0; i < n_px; ++i) {
    const uint8_t* p = bgr + 3 * static_cast<size_t>(i);
    dst[i] = static_cast<uint8_t>(
        (p[0] * 3735u + p[1] * 19235u + p[2] * 9798u + 16384u) >> 15);
  }
}

}  // namespace

extern "C" {

// Create a ring with n_slots slots of slot_bytes each. Returns handle or
// null.
void* frame_ring_create(uint32_t n_slots, uint32_t slot_bytes) {
  if (n_slots < 2 || slot_bytes == 0) return nullptr;
  Ring* r = new (std::nothrow) Ring();
  if (!r) return nullptr;
  r->n_slots = n_slots;
  r->slot_bytes = slot_bytes;
  r->slots = new (std::nothrow) Slot[n_slots];
  // page-aligned frame storage so the consumer can hand pages straight to
  // the device transfer path
  void* mem = nullptr;
  if (posix_memalign(&mem, 4096, static_cast<size_t>(n_slots) * slot_bytes)
      != 0) {
    delete[] r->slots;
    delete r;
    return nullptr;
  }
  r->data = static_cast<uint8_t*>(mem);
  if (!r->slots || !r->data) {
    free(r->data);
    delete[] r->slots;
    delete r;
    return nullptr;
  }
  return r;
}

void frame_ring_destroy(void* h) {
  if (!h) return;
  Ring* r = static_cast<Ring*>(h);
  free(r->data);
  delete[] r->slots;
  delete r;
}

// Producer: publish one frame (copies into the ring; the copy IS the only
// copy on the host path). timestamp_ns <= 0 means "stamp now".
// Returns the frame id.
uint64_t frame_ring_push(void* h, const uint8_t* buf, uint32_t size,
                         int64_t timestamp_ns) {
  Ring* r = static_cast<Ring*>(h);
  if (size > r->slot_bytes) size = r->slot_bytes;
  uint64_t id = r->head.load(std::memory_order_relaxed);
  Slot& s = r->slots[id % r->n_slots];
  // overwriting a previously written slot == the oldest frame is dropped
  if (id >= r->n_slots) {
    r->drops.fetch_add(1, std::memory_order_relaxed);
  }
  // standard seqlock write protocol: the odd mark must be visible BEFORE
  // any data write — a release STORE only orders PRIOR writes, so the data
  // writes below could otherwise be hoisted above it on weakly-ordered
  // CPUs. The release fence pins them after the mark.
  s.seq_begin.store(2 * id + 1, std::memory_order_relaxed);  // mark writing
  std::atomic_thread_fence(std::memory_order_release);
  s.timestamp_ns = timestamp_ns > 0 ? timestamp_ns : now_ns();
  s.frame_id = id;
  s.size = size;
  std::memcpy(r->data + static_cast<size_t>(id % r->n_slots) * r->slot_bytes,
              buf, size);
  s.seq_end.store(2 * id + 2, std::memory_order_release);
  s.seq_begin.store(2 * id + 2, std::memory_order_release);
  r->head.store(id + 1, std::memory_order_release);
  return id;
}

// Producer: publish one interleaved BGR8 frame (n_px*3 bytes) as GRAY,
// converting directly into the ring slot — one pass over the source with
// no intermediate gray buffer (and ctypes releases the GIL for the call,
// so the conversion runs off-GIL, unlike a Python-side cv2.cvtColor +
// copy). Fixed-point coefficients are bit-exact vs OpenCV >= 5's
// COLOR_BGR2GRAY: gray = (B*3735 + G*19235 + R*9798 + 2^14) >> 15
// (verified exhaustively vs installed cv2 in tests/test_runtime.py;
// OpenCV <= 4.x's 14-bit variant differs by 1 LSB on ~0.26% of triples). This is the
// capture-thread hot path the reference pays as BGR->YUYV + DDS transport
// (apriltags_cuda_detector.cu:399-401).
uint64_t frame_ring_push_bgr(void* h, const uint8_t* bgr, uint32_t n_px,
                             int64_t timestamp_ns) {
  Ring* r = static_cast<Ring*>(h);
  if (n_px > r->slot_bytes) n_px = r->slot_bytes;
  uint64_t id = r->head.load(std::memory_order_relaxed);
  Slot& s = r->slots[id % r->n_slots];
  if (id >= r->n_slots) {
    r->drops.fetch_add(1, std::memory_order_relaxed);
  }
  s.seq_begin.store(2 * id + 1, std::memory_order_relaxed);  // mark writing
  std::atomic_thread_fence(std::memory_order_release);
  s.timestamp_ns = timestamp_ns > 0 ? timestamp_ns : now_ns();
  s.frame_id = id;
  s.size = n_px;
  bgr_to_gray(bgr,
              r->data + static_cast<size_t>(id % r->n_slots) * r->slot_bytes,
              n_px);
  s.seq_end.store(2 * id + 2, std::memory_order_release);
  s.seq_begin.store(2 * id + 2, std::memory_order_release);
  r->head.store(id + 1, std::memory_order_release);
  return id;
}

// Consumer: copy the NEWEST complete frame into out (capacity out_cap).
// Returns frame size, or 0 if none/torn. Fills frame_id and timestamp.
// If last_seen_id is nonnegative and the newest frame id == last_seen_id,
// returns 0 (no new frame).
uint32_t frame_ring_latest(void* h, uint8_t* out, uint32_t out_cap,
                           int64_t last_seen_id, uint64_t* frame_id,
                           int64_t* timestamp_ns) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_acquire);
  if (head == 0) return 0;
  uint64_t id = head - 1;
  if (last_seen_id >= 0 && id == static_cast<uint64_t>(last_seen_id))
    return 0;
  // only the newest n_slots-1 entries are safely readable (the writer may
  // be overwriting the oldest); use signed math to avoid wrap-around
  const int64_t oldest =
      static_cast<int64_t>(head) - static_cast<int64_t>(r->n_slots) + 1;
  for (int attempt = 0;
       attempt < 4 && static_cast<int64_t>(id) >= (oldest > 0 ? oldest : 0);
       ++attempt) {
    Slot& s = r->slots[id % r->n_slots];
    uint64_t e1 = s.seq_end.load(std::memory_order_acquire);
    if (e1 == 2 * id + 2) {
      uint32_t size = s.size < out_cap ? s.size : out_cap;
      std::memcpy(out,
                  r->data + static_cast<size_t>(id % r->n_slots) *
                      r->slot_bytes,
                  size);
      // seqlock read validation: an acquire LOAD after the copy does not
      // stop the copy's reads from sinking below it; the acquire fence
      // orders copy-before-recheck.
      std::atomic_thread_fence(std::memory_order_acquire);
      uint64_t b2 = s.seq_begin.load(std::memory_order_relaxed);
      if (b2 == 2 * id + 2) {  // not torn by a wrap-around writer
        if (frame_id) *frame_id = id;
        if (timestamp_ns) *timestamp_ns = s.timestamp_ns;
        return size;
      }
    }
    if (id == 0) break;
    --id;  // writer is mid-overwrite of the newest; take the previous
  }
  return 0;
}

uint64_t frame_ring_head(void* h) {
  return static_cast<Ring*>(h)->head.load(std::memory_order_acquire);
}

}  // extern "C"

extern "C" uint64_t frame_ring_drops(void* h) {
  return static_cast<Ring*>(h)->drops.load(std::memory_order_relaxed);
}
