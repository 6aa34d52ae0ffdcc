"""ctypes bindings for the native async raw reader (native/raw_reader.cpp).

The C++ core is the analog of the reference's AsyncDataReader IO threads
(multi_hot/detail/data_reader_impl.cpp): N threads stream fixed-stride rows
into a ring of batch buffers off the Python thread. This wrapper compiles the
shared library on first use (g++ -O3) and exposes a BaseReader.

Falls back transparently to the pure-python RawReader when no compiler is
available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

from ..core.logger import get_logger
from .reader import BaseReader, Batch, BatchSpec, RawReader

logger = get_logger()

_LIB = None
_LIB_LOCK = threading.Lock()


def _native_dir() -> str:
    # repo checkout layout by default; installed environments can point
    # HCTR_TPU_NATIVE_DIR at a copy of native/ (see pyproject.toml)
    return os.environ.get(
        "HCTR_TPU_NATIVE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "..", "native"),
    )


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.join(_native_dir(), "raw_reader.cpp")
        if not os.path.exists(src):
            return None
        # a CMake-built artifact (native/CMakeLists.txt) pre-empts the lazy
        # g++ compile when it is at least as new as the source
        prebuilt = os.path.join(_native_dir(), "libraw_reader.so")
        if os.path.exists(prebuilt) and os.path.getmtime(
            prebuilt
        ) >= os.path.getmtime(src):
            try:
                _LIB = _bind(ctypes.CDLL(prebuilt))
                return _LIB
            except OSError:
                pass  # stale/foreign-arch artifact: fall through and rebuild
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "hugectr_tpu",
        )
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, "libraw_reader.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", src, "-o", so]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                logger.warning(f"native raw reader build failed ({e}); using python reader")
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            logger.warning(f"native raw reader load failed ({e})")
            return None
        _LIB = _bind(lib)
        return _LIB


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Attach ctypes signatures to a loaded raw-reader library."""
    lib.rr_open.restype = ctypes.c_void_p
    lib.rr_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_long,
    ]
    lib.rr_num_batches.restype = ctypes.c_long
    lib.rr_num_batches.argtypes = [ctypes.c_void_p]
    lib.rr_next.restype = ctypes.c_long
    lib.rr_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rr_reset.argtypes = [ctypes.c_void_p]
    lib.rr_close.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return _build_lib() is not None


class NativeRawReader(BaseReader):
    """RawAsync-format reader backed by the C++ threaded IO core.

    Decode (label/dense/sparse split + dtype convert — the reference's
    split_3_way kernel, multi_hot/split_batch.cu) happens here on the numpy
    view of each filled buffer.
    """

    def __init__(
        self,
        path: str,
        spec: BatchSpec,
        num_samples: int = 0,
        float_label_dense: bool = False,
        repeat: bool = True,
        n_threads: int = 4,
        queue_depth: int = 6,
        process_index: int = 0,
        num_processes: int = 1,
        fused: bool = False,
    ):
        self.lib = _build_lib()
        if self.lib is None:
            raise RuntimeError("native reader unavailable")
        self.fused = fused
        self.spec = spec
        self.path = path
        self.float_label_dense = float_label_dense
        self.repeat = repeat
        s = spec
        self.row_width = (
            s.label_dim_total + s.dense_dim + sum(f.total_nnz for f in s.sparse)
        )
        self.row_bytes = 4 * self.row_width
        self._decode = RawReader.__dict__["_decode"]  # reuse decode logic
        limit = (
            num_samples // (s.batch_size * num_processes) if num_samples else 0
        )
        self._handle = self.lib.rr_open(
            path.encode(),
            self.row_bytes,
            s.batch_size,
            s.batch_size * num_processes,
            process_index * s.batch_size,
            n_threads,
            queue_depth,
            1 if repeat else 0,
            limit,
        )
        if not self._handle:
            raise RuntimeError(f"native reader failed to open {path}")
        self.num_batches = int(self.lib.rr_num_batches(self._handle))
        self._buf = np.empty((s.batch_size, self.row_width), dtype=np.int32)
        self._consumed_any = False

    def __iter__(self) -> Iterator[Batch]:
        # The C++ core's cursors/EOF persist across iterations; rewind so the
        # reader is re-iterable (Model.eval builds a fresh feeder each time).
        if self._consumed_any:
            self.lib.rr_reset(self._handle)
        self._consumed_any = True
        served = 0
        while True:
            rows = self.lib.rr_next(
                self._handle, self._buf.ctypes.data_as(ctypes.c_void_p)
            )
            if rows == 0:
                return
            served += 1
            yield self._decode(self, self._buf[:rows].copy())
            if not self.repeat and served >= self.num_batches:
                return

    def close(self):
        if getattr(self, "_handle", None):
            self.lib.rr_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
