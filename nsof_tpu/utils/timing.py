"""Device-honest timing harness.

The reference brackets every stage with ``time.time()`` (module-global lists,
optical_flow_seg.py:51-59) and, for GPU backends, ``torch.cuda.synchronize``
(ff_seg.py:95-107).  Here the equivalent is ``jax.block_until_ready`` around
jitted callables, with warmup to exclude compilation.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import numpy as np


def time_fn(
    fn: Callable[..., Any],
    *args,
    warmup: int = 2,
    iters: int = 10,
    **kwargs,
) -> dict[str, float]:
    """Time ``fn(*args)`` with device sync; returns seconds statistics.

    Returns dict with mean/p50/min/max wall seconds per call.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        samples.append(time.perf_counter() - t0)
    s = np.asarray(samples)
    return {
        "mean_s": float(s.mean()),
        "p50_s": float(np.percentile(s, 50)),
        "min_s": float(s.min()),
        "max_s": float(s.max()),
        "iters": iters,
    }


class StageTimer:
    """Accumulates named stage timings (the CSV columns of the reference)."""

    def __init__(self):
        self.records: dict[str, list[float]] = {}

    def add(self, name: str, seconds: float) -> None:
        self.records.setdefault(name, []).append(seconds)

    def time(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.add(name, time.perf_counter() - self.t0)
                return False

        return _Ctx()

    def summary(self) -> dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self.records.items()}


def profile_trace(log_dir: str):
    """Context manager capturing a ``jax.profiler`` device trace to
    ``log_dir`` (viewable in TensorBoard / Perfetto / xprof) — the deep
    counterpart of the wall-clock harness above, exposing per-HLO TPU
    step timings, HBM traffic, and fusion boundaries.

    Usage::

        with profile_trace("/tmp/nsof_trace"):
            jax.block_until_ready(step(x))

    bench.py exposes this as ``--profile-dir``; the CLI pipelines via
    ``nsof_tpu … --profile-dir``.
    """
    return jax.profiler.trace(log_dir, create_perfetto_trace=True)
