"""ctypes bindings for the native host-runtime primitives.

Python-facing wrappers around ``_native/core.cpp`` (the C++ re-implementation
of the reference's ThreadsafeQueue / ImuFrameSynchronizer /
ThreadsafeTemporalBuffer / FrameSynchronizer). Payloads cross the ABI as
opaque uint64 handles; each wrapper keeps a handle→object table so arbitrary
Python objects ride the native synchronization.

The shared library is built on demand (``make`` in ``_native/``); if the
toolchain is unavailable the import raises and callers can fall back to the
pure-Python pipeline (the deterministic blocking mode needs no threading).
"""
from __future__ import annotations

import ctypes
import itertools
import os
import subprocess
import threading
from typing import Any, List, Optional, Tuple

_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_DIR, "libsvin_native.so")


def _build() -> None:
    subprocess.run(
        ["make", "-s", "-C", _DIR], check=True, capture_output=True
    )


def _load() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, "core.cpp")
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    u64, i64, sz, vp = (
        ctypes.c_uint64, ctypes.c_int64, ctypes.c_size_t, ctypes.c_void_p
    )
    lib.queue_create.restype = vp
    lib.queue_create.argtypes = [sz]
    lib.queue_destroy.argtypes = [vp]
    lib.queue_shutdown.argtypes = [vp]
    lib.queue_push_blocking.restype = ctypes.c_int
    lib.queue_push_blocking.argtypes = [vp, u64]
    lib.queue_push_dropping.restype = u64
    lib.queue_push_dropping.argtypes = [vp, u64]
    lib.queue_pop_blocking.restype = ctypes.c_int
    lib.queue_pop_blocking.argtypes = [vp, ctypes.POINTER(u64)]
    lib.queue_pop_timeout.restype = ctypes.c_int
    lib.queue_pop_timeout.argtypes = [vp, ctypes.POINTER(u64), u64]
    lib.queue_size.restype = sz
    lib.queue_size.argtypes = [vp]
    lib.queue_dropped.restype = u64
    lib.queue_dropped.argtypes = [vp]
    lib.gate_create.restype = vp
    lib.gate_destroy.argtypes = [vp]
    lib.gate_announce.argtypes = [vp, i64]
    lib.gate_shutdown.argtypes = [vp]
    lib.gate_wait.restype = ctypes.c_int
    lib.gate_wait.argtypes = [vp, i64, u64]
    lib.tbuf_create.restype = vp
    lib.tbuf_create.argtypes = [i64]
    lib.tbuf_destroy.argtypes = [vp]
    lib.tbuf_add.restype = sz
    lib.tbuf_add.argtypes = [vp, i64, u64, ctypes.POINTER(u64), sz]
    lib.tbuf_nearest.restype = ctypes.c_int
    lib.tbuf_nearest.argtypes = [vp, i64, i64, ctypes.POINTER(u64), ctypes.POINTER(i64)]
    lib.tbuf_size.restype = sz
    lib.tbuf_size.argtypes = [vp]
    lib.fsync_create.restype = vp
    lib.fsync_create.argtypes = [sz, i64]
    lib.fsync_destroy.argtypes = [vp]
    lib.fsync_add.restype = ctypes.c_int
    lib.fsync_add.argtypes = [
        vp, sz, i64, u64, ctypes.POINTER(u64), ctypes.POINTER(i64),
        ctypes.POINTER(u64), sz, ctypes.POINTER(sz),
    ]
    lib.fsync_obsolete.restype = u64
    lib.fsync_obsolete.argtypes = [vp]
    return lib


_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is None:
            _lib = _load()
        return _lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


class _HandleTable:
    """Thread-safe uint64 handle → Python object table (handles start at 1;
    0 is the native 'missing' sentinel)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._table = {}
        self._next = itertools.count(1)

    def put(self, obj: Any) -> int:
        h = next(self._next)
        with self._lock:
            self._table[h] = obj
        return h

    def take(self, h: int) -> Any:
        with self._lock:
            return self._table.pop(h)

    def __len__(self):
        with self._lock:
            return len(self._table)


class ThreadSafeQueue:
    """Bounded MPMC queue with blocking / drop-oldest backpressure
    (reference ThreadsafeQueue.hpp:147-195 semantics)."""

    def __init__(self, capacity: int = 16):
        self._lib = get_lib()
        self._q = self._lib.queue_create(capacity)
        self._h = _HandleTable()

    def push_blocking(self, obj: Any) -> bool:
        h = self._h.put(obj)
        if self._lib.queue_push_blocking(self._q, h) != 0:
            self._h.take(h)
            return False
        return True

    def push_dropping(self, obj: Any) -> Optional[Any]:
        """Returns the dropped object when full, else None."""
        h = self._h.put(obj)
        dropped = self._lib.queue_push_dropping(self._q, h)
        if dropped:
            return self._h.take(dropped)
        return None

    def pop_blocking(self) -> Optional[Any]:
        out = ctypes.c_uint64()
        if self._lib.queue_pop_blocking(self._q, ctypes.byref(out)) != 0:
            return None
        return self._h.take(out.value)

    def pop_timeout(self, timeout_s: float) -> Optional[Any]:
        out = ctypes.c_uint64()
        rc = self._lib.queue_pop_timeout(
            self._q, ctypes.byref(out), int(timeout_s * 1e6)
        )
        if rc != 0:
            return None
        return self._h.take(out.value)

    def shutdown(self) -> None:
        self._lib.queue_shutdown(self._q)

    def size(self) -> int:
        return self._lib.queue_size(self._q)

    @property
    def dropped_count(self) -> int:
        return self._lib.queue_dropped(self._q)

    def __del__(self):
        try:
            self._lib.queue_destroy(self._q)
        except Exception:
            pass


class ImuGate:
    """Condvar gate: wait until sensor data ≥ a timestamp has arrived
    (reference ImuFrameSynchronizer)."""

    def __init__(self):
        self._lib = get_lib()
        self._g = self._lib.gate_create()

    def announce(self, t_ns: int) -> None:
        self._lib.gate_announce(self._g, t_ns)

    def wait_for(self, t_ns: int, timeout_s: float = 5.0) -> bool:
        return self._lib.gate_wait(self._g, t_ns, int(timeout_s * 1e6)) == 0

    def shutdown(self) -> None:
        self._lib.gate_shutdown(self._g)

    def __del__(self):
        try:
            self._lib.gate_destroy(self._g)
        except Exception:
            pass


class TemporalBuffer:
    """Time-indexed buffer with windowed eviction + nearest queries
    (reference ThreadsafeTemporalBuffer)."""

    def __init__(self, window_s: float = -1.0):
        self._lib = get_lib()
        self._b = self._lib.tbuf_create(int(window_s * 1e9))
        self._h = _HandleTable()
        self._evict_buf = (ctypes.c_uint64 * 256)()

    def add(self, t_s: float, obj: Any) -> int:
        h = self._h.put(obj)
        n = self._lib.tbuf_add(
            self._b, int(t_s * 1e9), h, self._evict_buf, 256
        )
        for k in range(n):
            self._h.take(self._evict_buf[k])
        return n

    def nearest(self, t_s: float, tol_s: float) -> Optional[Tuple[float, Any]]:
        out = ctypes.c_uint64()
        t_out = ctypes.c_int64()
        rc = self._lib.tbuf_nearest(
            self._b, int(t_s * 1e9), int(tol_s * 1e9),
            ctypes.byref(out), ctypes.byref(t_out),
        )
        if rc != 0:
            return None
        # peek (do not remove)
        with self._h._lock:
            obj = self._h._table[out.value]
        return t_out.value * 1e-9, obj

    def size(self) -> int:
        return self._lib.tbuf_size(self._b)

    def __del__(self):
        try:
            self._lib.tbuf_destroy(self._b)
        except Exception:
            pass


class FrameSynchronizer:
    """Groups per-camera frames into synchronized multi-frames by timestamp
    tolerance (reference FrameSynchronizer 3-slot ring)."""

    def __init__(self, num_cameras: int, tolerance_s: float = 0.005):
        self._lib = get_lib()
        self._s = self._lib.fsync_create(num_cameras, int(tolerance_s * 1e9))
        self._h = _HandleTable()
        self._n = num_cameras
        self._out = (ctypes.c_uint64 * num_cameras)()
        self._evicted = (ctypes.c_uint64 * 64)()

    def add_frame(self, cam: int, t_s: float, obj: Any) -> Optional[Tuple[float, List[Any]]]:
        h = self._h.put(obj)
        t_out = ctypes.c_int64()
        n_ev = ctypes.c_size_t()
        rc = self._lib.fsync_add(
            self._s, cam, int(t_s * 1e9), h, self._out, ctypes.byref(t_out),
            self._evicted, 64, ctypes.byref(n_ev),
        )
        for k in range(n_ev.value):  # release payloads of stale groups
            self._h.take(self._evicted[k])
        if rc == 1:
            return t_out.value * 1e-9, [self._h.take(self._out[k]) for k in range(self._n)]
        return None

    @property
    def obsolete_count(self) -> int:
        return self._lib.fsync_obsolete(self._s)

    def __del__(self):
        try:
            self._lib.fsync_destroy(self._s)
        except Exception:
            pass
