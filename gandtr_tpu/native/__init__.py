"""ctypes bindings for the native image-decode pipeline (loader.cc).

The reference's data path runs on torch DataLoader worker *processes*
(mdir/learning/dataset.py initialize_loader, num_workers 6); our loader is a
thread pool (data/datasets.py Loader), which is GIL-bound for Python-level
work. This module moves the decode hot path into C++: libjpeg/libpng decode
(with DCT-domain scaling for the 1024px eval protocol) on a std::thread worker
pool, callable as ONE ctypes call per batch so the GIL is released for the
whole batch.

Degrades gracefully: if the toolchain or headers are missing, `available()`
is False and every caller falls back to PIL. Build is lazy (make on first
import) and cached next to the source.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgandtr_native.so")

_lib = None
_build_err = None
_lock = threading.Lock()

# error codes mirroring loader.cc
OK, E_OPEN, E_FORMAT, E_DECODE, E_UNSUPPORTED, E_NOMEM = range(6)


def _build():
    proc = subprocess.run(["make", "-s", "-C", _DIR], capture_output=True,
                          text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError("native build failed:\n%s" % proc.stderr[-2000:])


def _load():
    global _lib, _build_err
    with _lock:
        if _lib is not None or _build_err is not None:
            return _lib
        try:
            src = os.path.join(_DIR, "loader.cc")
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(src)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.gandtr_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int]
            lib.gandtr_decode.restype = ctypes.c_int
            lib.gandtr_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
            lib.gandtr_free.restype = None
            lib.gandtr_pool_create.argtypes = [ctypes.c_int]
            lib.gandtr_pool_create.restype = ctypes.c_void_p
            lib.gandtr_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.gandtr_pool_destroy.restype = None
            lib.gandtr_pool_decode_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            lib.gandtr_pool_decode_batch.restype = None
            if lib.gandtr_native_abi_version() != 1:
                raise RuntimeError("stale gandtr_native .so: ABI %d != 1 — rebuild (make -C gandtr_tpu/native)"
                                   % lib.gandtr_native_abi_version())
            _lib = lib
        except Exception as exc:  # missing toolchain/headers: PIL fallback
            _build_err = exc
        return _lib


def available():
    """True when the native library built/loaded (callers fall back to PIL
    otherwise)."""
    return _load() is not None


def build_error():
    _load()
    return _build_err


def _to_array(lib, buf, h, w):
    arr = np.ctypeslib.as_array(buf, shape=(h, w, 3)).copy()
    lib.gandtr_free(buf)
    return arr


def decode(path, scale_longest=0):
    """Decode a JPEG/PNG to an (H, W, 3) uint8 RGB array, or None when the
    native path cannot handle it (caller should fall back to PIL).

    scale_longest > 0 enables libjpeg DCT-domain scaling: the image decodes at
    the smallest 1/8-granular scale whose longest side is still >= the target
    (PIL `Image.draft` semantics) — ~8-30x less IDCT work for eval-protocol
    loads of large photos.
    """
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.gandtr_decode(os.fsencode(path), ctypes.byref(buf),
                           ctypes.byref(h), ctypes.byref(w),
                           int(scale_longest))
    if rc != OK:
        return None
    return _to_array(lib, buf, h.value, w.value)


class DecodePool:
    """C++ worker pool decoding whole batches in one GIL-released call."""

    def __init__(self, n_threads=None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable: %r" % _build_err)
        self._lib = lib
        n = int(n_threads or min(16, os.cpu_count() or 4))
        self._pool = lib.gandtr_pool_create(n)
        self.n_threads = n
        # close()/decode_batch handle discipline: close waits for in-flight
        # batches and exactly one caller destroys the C++ pool
        self._cv = threading.Condition()
        self._inflight = 0

    def decode_batch(self, paths, scale_longest=0):
        """Decode paths concurrently; returns a list of (H, W, 3) uint8
        arrays with None at failed positions (reference `ignore_errors`
        degradation, genericdataset.py:74-81)."""
        n = len(paths)
        if n == 0:
            return []
        with self._cv:
            if self._pool is None:
                raise RuntimeError("pool closed")
            self._inflight += 1
            pool = self._pool
        try:
            lib = self._lib
            c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
            outs = (ctypes.POINTER(ctypes.c_ubyte) * n)()
            hs = (ctypes.c_int * n)()
            ws = (ctypes.c_int * n)()
            rcs = (ctypes.c_int * n)()
            lib.gandtr_pool_decode_batch(pool, c_paths, n, outs, hs, ws,
                                         int(scale_longest), rcs)
        finally:
            with self._cv:
                self._inflight -= 1
                self._cv.notify_all()
        results = []
        for i in range(n):
            if rcs[i] == OK and outs[i]:
                results.append(_to_array(lib, outs[i], hs[i], ws[i]))
            else:
                results.append(None)
        return results

    def close(self):
        with self._cv:
            if self._pool is None:
                return
            pool, self._pool = self._pool, None  # one closer wins
            while self._inflight:
                self._cv.wait()
        self._lib.gandtr_pool_destroy(pool)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


_shared_pool = None
# own lock: DecodePool.__init__ -> _load() takes the module _lock, which is
# non-reentrant — guarding with _lock here would self-deadlock
_pool_lock = threading.Lock()


def shared_pool():
    """Process-wide pool for the dataset imread fast path."""
    global _shared_pool
    with _pool_lock:
        if _shared_pool is None:
            _shared_pool = DecodePool()
        return _shared_pool
