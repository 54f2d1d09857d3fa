"""On-demand compilation + ctypes loading of the native library."""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess
import tempfile
import threading
from typing import Optional

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SOURCES = [_REPO_ROOT / "native" / "event_binner.cpp"]
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> pathlib.Path:
    d = pathlib.Path(tempfile.gettempdir()) / "nsof_tpu_native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _source_digest() -> str:
    h = hashlib.sha256()
    for src in _SOURCES:
        h.update(src.read_bytes())
    return h.hexdigest()[:16]


def get_library() -> Optional[ctypes.CDLL]:
    """Compile (once, cached by source digest) and dlopen the library.
    Returns None when no compiler or compilation fails."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            so = _build_dir() / f"libnsof_{_source_digest()}.so"
            if not so.exists():
                cmd = [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    *map(str, _SOURCES), "-o", str(so),
                ]
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            lib = ctypes.CDLL(str(so))
            lib.bin_events_dense.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_library() is not None
