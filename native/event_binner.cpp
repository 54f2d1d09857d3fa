// Native event-stream binner: the host-side data-plane hot path.
//
// Computes the dense per-slice tensors consumed by the event-driven device
// simulator (see nsof_tpu/device/event_sim.py::bin_events for the
// authoritative semantics, mirroring the reference's slice generator at
// eventsim/event_mem_sim.py:78-83): fixed-duration windows from the first
// event timestamp, per-pixel counts (clipped at 255), ON/OFF activity
// masks, and per-slice first/last event timestamps.  Events at/after the
// final window boundary are dropped, exactly as the reference generator
// never yields them.
//
// Single pass over the (time-sorted) stream, O(n_events); the numpy path
// allocates several n_events-sized temporaries and does four bincounts.
//
// C ABI only — bound via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>

extern "C" {

// Returns 0 on success, -1 on bad arguments.  Caller allocates:
//   counts  [nt*h*w] uint8   (zeroed here)
//   on_any  [nt*h*w] uint8
//   off_any [nt*h*w] uint8
//   t_first [nt] int32 (zeroed here)
//   t_last  [nt] int32
// nt must equal the number of slices implied by slice_us and the stream
// span (ceil((t_last_rel)/slice_us) with a final partial window, i.e. the
// length of arange(0, t_rel_end + slice_us, slice_us) minus one).
int bin_events_dense(
    const int32_t* x,
    const int32_t* y,
    const int32_t* p,
    const int64_t* t_us,
    int64_t n_events,
    int64_t slice_us,
    int64_t h,
    int64_t w,
    int64_t nt,
    uint8_t* counts,
    uint8_t* on_any,
    uint8_t* off_any,
    int32_t* t_first,
    int32_t* t_last) {
  if (n_events < 0 || slice_us <= 0 || h <= 0 || w <= 0 || nt < 0) {
    return -1;
  }
  std::memset(counts, 0, static_cast<size_t>(nt) * h * w);
  std::memset(on_any, 0, static_cast<size_t>(nt) * h * w);
  std::memset(off_any, 0, static_cast<size_t>(nt) * h * w);
  std::memset(t_first, 0, static_cast<size_t>(nt) * sizeof(int32_t));
  std::memset(t_last, 0, static_cast<size_t>(nt) * sizeof(int32_t));
  if (n_events == 0 || nt == 0) {
    return 0;
  }

  const int64_t t0 = t_us[0];
  // per-slice "has events" tracked implicitly by t_first sentinel
  for (int64_t s = 0; s < nt; ++s) {
    t_first[s] = -1;
  }

  for (int64_t i = 0; i < n_events; ++i) {
    const int64_t t_rel = t_us[i] - t0;
    const int64_t sl = t_rel / slice_us;
    if (sl < 0 || sl >= nt) {
      continue;  // boundary/out-of-span events dropped (reference parity)
    }
    const int64_t yi = y[i];
    const int64_t xi = x[i];
    if (yi < 0 || yi >= h || xi < 0 || xi >= w) {
      continue;
    }
    const size_t idx =
        static_cast<size_t>(sl) * h * w + static_cast<size_t>(yi) * w + xi;
    if (counts[idx] < 255) {
      counts[idx] += 1;
    }
    if (p[i] == 1) {
      on_any[idx] = 1;
    } else if (p[i] == 0) {
      off_any[idx] = 1;
    }
    if (t_first[sl] < 0) {
      t_first[sl] = static_cast<int32_t>(t_rel);
    }
    t_last[sl] = static_cast<int32_t>(t_rel);
  }

  for (int64_t s = 0; s < nt; ++s) {
    if (t_first[s] < 0) {
      t_first[s] = 0;
    }
  }
  return 0;
}

}  // extern "C"
