"""ctypes binding for the native C++ data loader (native/csvloader.cpp):
multithreaded CSV parsing, deterministic shuffled-index streams, and
contiguous row gathering.  Falls back to numpy/pandas when the shared
library can't be built (the API is identical)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "csvloader.cpp")
_LIB_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                        "dsdgp_tpu_native")
_LIB = os.path.join(_LIB_DIR, "libcsvloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.isfile(_SRC):
        _build_failed = True
        return None
    os.makedirs(_LIB_DIR, exist_ok=True)
    if (not os.path.isfile(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", _LIB, _SRC, "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.csv_read.restype = ctypes.c_int
    lib.csv_read.argtypes = [ctypes.c_char_p, ctypes.c_int,
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                             ctypes.POINTER(ctypes.c_int64),
                             ctypes.POINTER(ctypes.c_int64)]
    lib.csv_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.shuffled_indices.argtypes = [ctypes.c_int64, ctypes.c_uint64,
                                     ctypes.POINTER(ctypes.c_int64)]
    lib.gather_rows.argtypes = [ctypes.POINTER(ctypes.c_double),
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int64),
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_double)]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def read_csv(path: str, skip_header: bool = False) -> np.ndarray:
    """Parse a numeric CSV into an (N, D) float64 array."""
    lib = get_lib()
    if lib is None:
        import pandas
        return pandas.read_csv(
            path, header=0 if skip_header else None).values.astype(
                np.float64)
    data_p = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.csv_read(path.encode(), int(skip_header),
                      ctypes.byref(data_p), ctypes.byref(rows),
                      ctypes.byref(cols))
    if rc < 0:
        raise IOError(f"csv_read({path}) failed with code {rc}")
    try:
        n, d = rows.value, cols.value
        arr = np.ctypeslib.as_array(data_p, shape=(n, d)).copy()
    finally:
        lib.csv_free(data_p)
    return arr


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic Fisher-Yates permutation of arange(n)."""
    lib = get_lib()
    if lib is None:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        idx = np.arange(n, dtype=np.int64)
        rng.shuffle(idx)
        return idx
    out = np.empty(n, dtype=np.int64)
    lib.shuffled_indices(n, ctypes.c_uint64(seed),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def gather_rows(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Contiguous gather of rows (native memcpy loop when available)."""
    data = np.ascontiguousarray(data, dtype=np.float64)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    lib = get_lib()
    if lib is None:
        return data[idx]
    out = np.empty((idx.shape[0], data.shape[1]), dtype=np.float64)
    lib.gather_rows(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        data.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


class PrefetchingLoader:
    """Background-threaded minibatch pipeline over host arrays.

    A worker thread keeps a bounded queue of ready minibatches (gathered
    with the native C++ row-copy), so host batch preparation overlaps
    device compute — the data-path pattern for datasets too large to
    keep on device (where the in-jit gather of
    training.loop.make_sgd_train_step does not apply).  The ctypes call
    releases the GIL during the memcpy loop, so the worker genuinely
    overlaps Python-side training.
    """

    def __init__(self, X: np.ndarray, Y: np.ndarray, batch_size: int,
                 seed: int = 0, depth: int = 4, device=None):
        import queue
        self._stream = MinibatchStream(X, Y, batch_size, seed)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._device = device
        self._stop = threading.Event()
        self._worker_exc: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        import jax
        import queue
        try:
            while not self._stop.is_set():
                xb, yb = self._stream.next()
                if self._device is not None:
                    xb = jax.device_put(xb, self._device)
                    yb = jax.device_put(yb, self._device)
                while not self._stop.is_set():
                    try:
                        self._q.put((xb, yb), timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface in next(), don't die silently
            self._worker_exc = e

    def next(self):
        import queue
        while True:
            try:
                return self._q.get(timeout=1.0)
            except queue.Empty:
                if self._stop.is_set():
                    raise StopIteration
                if not self._thread.is_alive():
                    if self._worker_exc is not None:
                        raise RuntimeError(
                            "PrefetchingLoader worker died"
                        ) from self._worker_exc
                    raise StopIteration

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class MinibatchStream:
    """Epoch-shuffled minibatch iterator over host arrays (the GPflow
    ``Minibatch`` analogue for the host-side data path; seeded and
    deterministic).  Used when the dataset is too large to live on
    device — otherwise prefer the in-jit gather of
    training.loop.make_sgd_train_step."""

    def __init__(self, X: np.ndarray, Y: np.ndarray, batch_size: int,
                 seed: int = 0):
        assert X.shape[0] == Y.shape[0]
        self.X = np.ascontiguousarray(X, dtype=np.float64)
        self.Y = np.ascontiguousarray(Y, dtype=np.float64)
        self.batch_size = batch_size
        self.seed = seed
        self._epoch = 0
        self._pos = 0
        self._idx = shuffled_indices(X.shape[0], seed)

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        n = self.X.shape[0]
        if self._pos + self.batch_size > n:
            self._epoch += 1
            self._idx = shuffled_indices(n, self.seed + self._epoch)
            self._pos = 0
        sl = self._idx[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        return gather_rows(self.X, sl), gather_rows(self.Y, sl)
