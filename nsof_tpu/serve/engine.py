"""Dynamic-batching serving engine for the ROI-gated segmentation path.

The reference serves nothing — every pipeline is an offline script over a
frames folder (optical_flow_seg.py:390-622).  This engine is the
production-serving counterpart on TPU: concurrent callers submit single
frame pairs; a collector thread coalesces them into ONE
``seg_batch_fast`` dispatch (batch-in-lanes Pallas path), so the chip
sees large MXU-friendly batches and the fixed per-dispatch overhead
(~30 ms over the tunnel, µs on a local chip) is amortized across
requests instead of paid per frame.

TPU-shaped details:

* **Bucketed padding.**  XLA compiles one program per input shape; a
  dynamic batch size would recompile constantly.  Requests are padded up
  to the next size in ``buckets`` (each bucket compiles once, warmable
  ahead of time with :meth:`warmup`); pad lanes repeat the last real
  request and their results are dropped.
* **max_wait batching window.**  The collector takes whatever is queued,
  then waits at most ``max_wait_ms`` for stragglers while the batch is
  below ``max_batch`` — the standard latency/throughput knob.
* **One dispatch thread.**  JAX dispatch is not thread-safe per device
  stream; all device work happens on the collector thread, callers only
  block on per-request futures.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

from nsof_tpu.config import PipelineConfig


@dataclass
class EngineStats:
    requests: int = 0
    dispatches: int = 0
    padded_lanes: int = 0
    batch_sizes: list = field(default_factory=list)

    def as_dict(self) -> dict:
        n = max(self.dispatches, 1)
        return {
            "requests": self.requests,
            "dispatches": self.dispatches,
            "mean_batch": self.requests / n,
            "padded_lanes": self.padded_lanes,
            "max_batch_seen": max(self.batch_sizes, default=0),
        }


class BatchingEngine:
    """Coalesce concurrent seg requests into batched TPU dispatches.

    Usage::

        eng = BatchingEngine(cfg, max_batch=128, max_wait_ms=4)
        eng.warmup()                       # compile the buckets up front
        fut = eng.submit(mem_u8, prev_gray, next_gray)
        result = fut.result()              # {"mask", "box", "any_active",
                                           #  "region_pct"} numpy, one item
        eng.shutdown()
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        max_batch: int = 128,
        max_wait_ms: float = 4.0,
        buckets: tuple[int, ...] | None = None,
        warp_radius: int | None = None,
        run_fn=None,
        frame_channels: int = 0,
    ):
        """``run_fn(mems [B,gh,gw], prevs, nxts) -> dict of [B,...]``
        overrides the default ``seg_batch_fast`` Farnebäck path — see
        :meth:`for_deep_backend` for the RAFT/FlowFormer serving form.
        ``frame_channels`` declares the submitted frame rank (0 = gray
        [H, W], 3 = RGB [H, W, 3]) so :meth:`warmup` builds the right
        dummies."""
        self.cfg = cfg
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        if buckets is None:
            buckets, b = [], 1
            while b < self.max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(self.max_batch)
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if self.buckets[-1] != self.max_batch:
            raise ValueError("largest bucket must equal max_batch")
        self.warp_radius = warp_radius
        self.frame_channels = int(frame_channels)
        self.stats = EngineStats()
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()

        import jax

        if run_fn is not None:
            self._run = run_fn
        else:
            from nsof_tpu.pipelines.segmentation import seg_batch_fast

            self._run = jax.jit(
                lambda m, p, n: seg_batch_fast(
                    m, p, n, self.cfg, warp_radius=self.warp_radius
                )
            )
        self._thread = threading.Thread(
            target=self._collector, name="nsof-batcher", daemon=True
        )
        self._thread.start()

    @classmethod
    def for_deep_backend(
        cls,
        cfg: PipelineConfig,
        backend,
        max_batch: int = 32,
        max_wait_ms: float = 8.0,
        buckets: tuple[int, ...] | None = None,
    ) -> "BatchingEngine":
        """Serving engine over the deep ROI-gated step
        (:func:`nsof_tpu.pipelines.deep_flow.deep_roi_flow_batch`):
        submit ``(mem_u8 [gh, gw], prev_rgb [H, W, 3], next_rgb)`` per
        request; the collector coalesces them into one true-batch
        RAFT/FlowFormer dispatch (107 fps at B=8 on a v5e for
        RAFT-small 256×384 windows, results/deep_batch_sweep.json).
        The device grid is the deep-scale one (MEMSIZE/3,
        raft_seg.py:460-464)."""
        import jax

        from nsof_tpu.pipelines.deep_flow import deep_roi_flow_batch

        eng = cls(
            cfg, max_batch=max_batch, max_wait_ms=max_wait_ms,
            buckets=buckets,
            run_fn=jax.jit(
                lambda m, p, n: deep_roi_flow_batch(m, p, n, cfg, backend)
            ),
            frame_channels=3,
        )
        ms_deep = max(cfg.roi.memsize // 3, 1)
        eng._mem_grid = (cfg.image_h // ms_deep, cfg.image_w // ms_deep)
        return eng

    # -- public API -----------------------------------------------------
    def submit(
        self, mem_u8: np.ndarray, prev_gray: np.ndarray, next_gray: np.ndarray
    ) -> Future:
        """Enqueue one frame pair; returns a Future of per-item results."""
        if self._stop.is_set():
            raise RuntimeError("engine is shut down")
        fut: Future = Future()
        self._q.put((np.asarray(mem_u8), np.asarray(prev_gray),
                     np.asarray(next_gray), fut))
        return fut

    def warmup(self) -> None:
        """Compile every bucket ahead of time (one dummy dispatch each).

        Call before serving traffic — warmup dispatches directly from
        the calling thread (deterministic bucket coverage, which queued
        dummy requests could not guarantee under collector timing)."""
        h, w = self.cfg.image_h, self.cfg.image_w
        gh, gw = getattr(
            self, "_mem_grid",
            (h // self.cfg.roi.memsize, w // self.cfg.roi.memsize),
        )
        fshape = (h, w) if not self.frame_channels else (
            h, w, self.frame_channels
        )
        for b in self.buckets:
            out = self._run(
                np.zeros((b, gh, gw), np.uint8),
                np.zeros((b,) + fshape, np.uint8),
                np.zeros((b,) + fshape, np.uint8),
            )
            for v in out.values():
                np.asarray(v)

    def shutdown(self, wait: bool = True) -> None:
        self._stop.set()
        self._q.put(None)  # unblock the collector
        if wait:
            self._thread.join(timeout=60)
            # A submit() that passed the _stop check concurrently with this
            # shutdown may have enqueued its item after the collector's own
            # drain loop emptied the queue; drain once more so no caller
            # blocks forever on an unresolved future.
            self._drain_failing()

    def _drain_failing(self) -> None:
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                try:
                    item[3].set_exception(RuntimeError("engine shut down"))
                except Exception:
                    pass  # already resolved

    # -- collector ------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _collector(self) -> None:
        run = self._run
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.25)
            except queue.Empty:
                continue
            if first is None:
                break
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    if remaining <= 0:
                        item = self._q.get_nowait()
                    else:
                        item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._stop.set()
                    break
                batch.append(item)
            self._dispatch(run, batch)
        # drain: fail any stragglers
        self._drain_failing()

    def _dispatch(self, run, batch) -> None:
        n = len(batch)
        b = self._bucket_for(n)
        mems = np.stack(
            [x[0] for x in batch] + [batch[-1][0]] * (b - n)
        )
        prevs = np.stack(
            [x[1] for x in batch] + [batch[-1][1]] * (b - n)
        )
        nxts = np.stack(
            [x[2] for x in batch] + [batch[-1][2]] * (b - n)
        )
        try:
            out = run(mems, prevs, nxts)
            out = {k: np.asarray(v) for k, v in out.items()}
        except Exception as e:  # surface to every caller in the batch
            for item in batch:
                item[3].set_exception(e)
            return
        self.stats.requests += n
        self.stats.dispatches += 1
        self.stats.padded_lanes += b - n
        self.stats.batch_sizes.append(n)
        if len(self.stats.batch_sizes) > 10_000:  # bounded history
            del self.stats.batch_sizes[:5_000]
        for i, item in enumerate(batch):
            item[3].set_result({k: v[i] for k, v in out.items()})
