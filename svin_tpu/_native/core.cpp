// Native host-runtime primitives for svin_tpu.
//
// C++ re-implementation of the reference's concurrency layer
// (okvis_multisensor_processing: threadsafe/ThreadsafeQueue.hpp 58-341,
// ImuFrameSynchronizer, FrameSynchronizer.cpp 79-144, and pose_graph's
// ThreadsafeTemporalBuffer.h): bounded MPMC queues with blocking and
// drop-oldest-if-full backpressure, a condvar gate for sensor/frame temporal
// alignment, a time-indexed buffer with windowed eviction and
// nearest-neighbour queries, and a multi-camera frame synchronizer.
//
// Payloads are opaque uint64 handles (the Python side keeps a handle→object
// table), so the synchronization machinery is fully native while staying
// GIL-free. Exposed via a C ABI for ctypes.

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <vector>

extern "C" {

// ----------------------------------------------------------------- queue
struct Queue {
  std::deque<uint64_t> items;
  size_t capacity;
  bool shutdown = false;
  std::mutex m;
  std::condition_variable not_empty;
  std::condition_variable not_full;
  uint64_t dropped = 0;
};

Queue* queue_create(size_t capacity) { return new Queue{ {}, capacity }; }

void queue_destroy(Queue* q) { delete q; }

void queue_shutdown(Queue* q) {
  {
    std::lock_guard<std::mutex> lk(q->m);
    q->shutdown = true;
  }
  q->not_empty.notify_all();
  q->not_full.notify_all();
}

// blocking push (PushBlockingIfFull): waits for space; returns 0 on success,
// -1 if shut down.
int queue_push_blocking(Queue* q, uint64_t item) {
  std::unique_lock<std::mutex> lk(q->m);
  q->not_full.wait(lk, [q] { return q->items.size() < q->capacity || q->shutdown; });
  if (q->shutdown) return -1;
  q->items.push_back(item);
  lk.unlock();
  q->not_empty.notify_one();
  return 0;
}

// non-blocking push dropping the OLDEST if full
// (PushNonBlockingDroppingIfFull). Returns the dropped handle, or 0.
uint64_t queue_push_dropping(Queue* q, uint64_t item) {
  uint64_t dropped = 0;
  {
    std::lock_guard<std::mutex> lk(q->m);
    if (q->shutdown) return 0;
    if (q->items.size() >= q->capacity && !q->items.empty()) {
      dropped = q->items.front();
      q->items.pop_front();
      q->dropped++;
    }
    q->items.push_back(item);
  }
  q->not_empty.notify_one();
  return dropped;
}

// blocking pop; returns 0 on success (item in *out), -1 if shut down + empty.
int queue_pop_blocking(Queue* q, uint64_t* out) {
  std::unique_lock<std::mutex> lk(q->m);
  q->not_empty.wait(lk, [q] { return !q->items.empty() || q->shutdown; });
  if (q->items.empty()) return -1;
  *out = q->items.front();
  q->items.pop_front();
  lk.unlock();
  q->not_full.notify_one();
  return 0;
}

// timeout pop (PopTimeout); timeout in microseconds. 0 ok, -1 shutdown,
// -2 timeout.
int queue_pop_timeout(Queue* q, uint64_t* out, uint64_t timeout_us) {
  std::unique_lock<std::mutex> lk(q->m);
  bool got = q->not_empty.wait_for(
      lk, std::chrono::microseconds(timeout_us),
      [q] { return !q->items.empty() || q->shutdown; });
  if (!got) return -2;
  if (q->items.empty()) return -1;
  *out = q->items.front();
  q->items.pop_front();
  lk.unlock();
  q->not_full.notify_one();
  return 0;
}

size_t queue_size(Queue* q) {
  std::lock_guard<std::mutex> lk(q->m);
  return q->items.size();
}

uint64_t queue_dropped(Queue* q) {
  std::lock_guard<std::mutex> lk(q->m);
  return q->dropped;
}

// ----------------------------------------------- condvar gate (imu sync)
// ImuFrameSynchronizer: consumers wait until data with timestamp >= t has
// been announced by producers.
struct TimeGate {
  int64_t latest_ns = INT64_MIN;
  bool shutdown = false;
  std::mutex m;
  std::condition_variable cv;
};

TimeGate* gate_create() { return new TimeGate(); }
void gate_destroy(TimeGate* g) { delete g; }

void gate_announce(TimeGate* g, int64_t t_ns) {
  {
    std::lock_guard<std::mutex> lk(g->m);
    if (t_ns > g->latest_ns) g->latest_ns = t_ns;
  }
  g->cv.notify_all();
}

void gate_shutdown(TimeGate* g) {
  {
    std::lock_guard<std::mutex> lk(g->m);
    g->shutdown = true;
  }
  g->cv.notify_all();
}

// wait until latest >= t_ns; 0 ok, -1 shutdown, -2 timeout
int gate_wait(TimeGate* g, int64_t t_ns, uint64_t timeout_us) {
  std::unique_lock<std::mutex> lk(g->m);
  bool got = g->cv.wait_for(
      lk, std::chrono::microseconds(timeout_us),
      [g, t_ns] { return g->latest_ns >= t_ns || g->shutdown; });
  if (g->shutdown) return -1;
  return got ? 0 : -2;
}

// ------------------------------------------------------- temporal buffer
// ThreadsafeTemporalBuffer: int64-ns keyed handle store with windowed
// eviction and nearest-in-tolerance lookup.
struct TemporalBuffer {
  std::map<int64_t, uint64_t> items;
  int64_t window_ns;  // <=0 → unbounded
  std::mutex m;
};

TemporalBuffer* tbuf_create(int64_t window_ns) {
  return new TemporalBuffer{ {}, window_ns };
}
void tbuf_destroy(TemporalBuffer* b) { delete b; }

// returns the number of evicted handles written into evicted (cap N)
size_t tbuf_add(TemporalBuffer* b, int64_t t_ns, uint64_t handle,
                uint64_t* evicted, size_t evicted_cap) {
  std::lock_guard<std::mutex> lk(b->m);
  b->items[t_ns] = handle;
  size_t n = 0;
  if (b->window_ns > 0 && !b->items.empty()) {
    int64_t newest = b->items.rbegin()->first;
    auto it = b->items.begin();
    while (it != b->items.end() && newest - it->first > b->window_ns) {
      if (n < evicted_cap) evicted[n++] = it->second;
      it = b->items.erase(it);
    }
  }
  return n;
}

// nearest item to t within tolerance; 0 ok, -1 none
int tbuf_nearest(TemporalBuffer* b, int64_t t_ns, int64_t tol_ns,
                 uint64_t* out, int64_t* t_out) {
  std::lock_guard<std::mutex> lk(b->m);
  if (b->items.empty()) return -1;
  auto ge = b->items.lower_bound(t_ns);
  int64_t best_dt = INT64_MAX;
  uint64_t best = 0;
  int64_t best_t = 0;
  if (ge != b->items.end()) {
    best_dt = ge->first - t_ns;
    best = ge->second;
    best_t = ge->first;
  }
  if (ge != b->items.begin()) {
    auto lt = std::prev(ge);
    int64_t dt = t_ns - lt->first;
    if (dt < best_dt) {
      best_dt = dt;
      best = lt->second;
      best_t = lt->first;
    }
  }
  if (best_dt > tol_ns) return -1;
  *out = best;
  *t_out = best_t;
  return 0;
}

size_t tbuf_size(TemporalBuffer* b) {
  std::lock_guard<std::mutex> lk(b->m);
  return b->items.size();
}

// ---------------------------------------------------- frame synchronizer
// FrameSynchronizer: groups per-camera frames into multi-frames by
// timestamp tolerance over a small ring of pending groups
// (FrameSynchronizer.cpp:79-144).
struct FrameSync {
  struct Group {
    int64_t t_ns;
    std::vector<uint64_t> frames;  // per camera, 0 = missing
    size_t count = 0;
  };
  size_t num_cameras;
  int64_t tol_ns;
  std::deque<Group> ring;  // pending groups, oldest first (cap 3 like ref)
  std::mutex m;
  uint64_t obsolete = 0;
};

FrameSync* fsync_create(size_t num_cameras, int64_t tol_ns) {
  return new FrameSync{ num_cameras, tol_ns };
}
void fsync_destroy(FrameSync* s) { delete s; }

// add a frame; if a group completes, writes its handles (num_cameras) into
// out and its timestamp into t_out and returns 1; else 0. Handles of frames
// in stale/evicted incomplete groups are written into evicted (cap
// evicted_cap) and their count stored in *n_evicted, so the caller can
// release its side of the payloads.
int fsync_add(FrameSync* s, size_t cam, int64_t t_ns, uint64_t handle,
              uint64_t* out, int64_t* t_out, uint64_t* evicted,
              size_t evicted_cap, size_t* n_evicted) {
  std::lock_guard<std::mutex> lk(s->m);
  *n_evicted = 0;
  auto evict_group = [&](FrameSync::Group& g) {
    for (uint64_t h : g.frames) {
      if (h != 0 && *n_evicted < evicted_cap) evicted[(*n_evicted)++] = h;
    }
    s->obsolete += g.count;
  };
  if (cam >= s->num_cameras) return -1;
  // find a matching pending group
  for (auto it = s->ring.begin(); it != s->ring.end(); ++it) {
    if (std::llabs(it->t_ns - t_ns) <= s->tol_ns && it->frames[cam] == 0) {
      it->frames[cam] = handle;
      it->count++;
      if (it->count == s->num_cameras) {
        std::memcpy(out, it->frames.data(), s->num_cameras * sizeof(uint64_t));
        *t_out = it->t_ns;
        // everything older than the completed group is obsolete
        for (auto o = s->ring.begin(); o != it; ++o) evict_group(*o);
        s->ring.erase(s->ring.begin(), std::next(it));
        return 1;
      }
      return 0;
    }
  }
  // new group; keep ring bounded at 3 (reference ring size)
  FrameSync::Group g;
  g.t_ns = t_ns;
  g.frames.assign(s->num_cameras, 0);
  g.frames[cam] = handle;
  g.count = 1;
  s->ring.push_back(std::move(g));
  while (s->ring.size() > 3) {
    evict_group(s->ring.front());
    s->ring.pop_front();
  }
  return 0;
}

uint64_t fsync_obsolete(FrameSync* s) {
  std::lock_guard<std::mutex> lk(s->m);
  return s->obsolete;
}

}  // extern "C"
