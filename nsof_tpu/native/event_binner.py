"""ctypes wrapper for the native event binner (single-pass C++)."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from nsof_tpu.native.build import get_library


def bin_events_native(
    x: np.ndarray,
    y: np.ndarray,
    p: np.ndarray,
    t_us: np.ndarray,
    slice_us: int,
    height: int,
    width: int,
) -> Optional[dict]:
    """Dense per-slice tensors via the C++ binner; None if unavailable.

    Same contract as the numpy path in
    :func:`nsof_tpu.device.event_sim.bin_events` (which calls this first
    and falls back transparently).
    """
    lib = get_library()
    if lib is None or t_us.size == 0:
        return None
    t64 = np.ascontiguousarray(t_us, np.int64)
    t_rel_end = int(t64[-1] - t64[0])
    nt = len(range(0, t_rel_end + slice_us, slice_us)) - 1
    if nt <= 0:
        return None
    h, w = height, width
    x32 = np.ascontiguousarray(x, np.int32)
    y32 = np.ascontiguousarray(y, np.int32)
    p32 = np.ascontiguousarray(p, np.int32)
    counts = np.empty((nt, h, w), np.uint8)
    on = np.empty((nt, h, w), np.uint8)
    off = np.empty((nt, h, w), np.uint8)
    t_first = np.empty(nt, np.int32)
    t_last = np.empty(nt, np.int32)

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    rc = lib.bin_events_dense(
        ptr(x32, ctypes.c_int32),
        ptr(y32, ctypes.c_int32),
        ptr(p32, ctypes.c_int32),
        ptr(t64, ctypes.c_int64),
        ctypes.c_int64(x32.size),
        ctypes.c_int64(slice_us),
        ctypes.c_int64(h),
        ctypes.c_int64(w),
        ctypes.c_int64(nt),
        ptr(counts, ctypes.c_uint8),
        ptr(on, ctypes.c_uint8),
        ptr(off, ctypes.c_uint8),
        ptr(t_first, ctypes.c_int32),
        ptr(t_last, ctypes.c_int32),
    )
    if rc != 0:
        return None
    return {
        "counts": counts,
        "on_any": on.astype(bool),
        "off_any": off.astype(bool),
        "t_first": t_first,
        "t_last": t_last,
        "nt": nt,
    }
