"""Native (C++) runtime components, bound via ctypes.

Built on demand with the system compiler into a cached shared library;
every native entry point has a pure-numpy fallback so the framework works
without a toolchain.  Keep C ABI only — no pybind11 dependency.
"""

from nsof_tpu.native.build import get_library, native_available  # noqa: F401
from nsof_tpu.native.event_binner import bin_events_native  # noqa: F401
