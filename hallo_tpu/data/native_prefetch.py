"""ctypes binding for the C++ async file prefetcher (native/prefetch.cpp).

Builds on first use (g++, no pybind11 needed) and degrades gracefully to
synchronous reads when a toolchain is unavailable. Used by the training
dataloader to overlap clip reads with device steps.
"""

from __future__ import annotations

import ctypes
import io
import logging
import os
import subprocess
from typing import Iterator, List, Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libprefetch.so"))


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "prefetch.cpp")
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
            return _LIB_PATH
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
        return _LIB_PATH
    except Exception as e:
        logger.warning("native prefetcher build failed (%s); falling back to "
                       "synchronous reads", e)
        return None


_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.pf_open.restype = ctypes.c_void_p
    lib.pf_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_int,
    ]
    lib.pf_next.restype = ctypes.c_long
    lib.pf_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.pf_release.argtypes = [ctypes.POINTER(ctypes.c_char)]
    lib.pf_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class FilePrefetcher:
    """Iterate file contents (bytes) with background C++ reader threads."""

    def __init__(self, paths: List[str], capacity: int = 8, workers: int = 2,
                 loop: bool = False):
        self.paths = list(paths)
        self.loop = loop
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._paths_arr = arr  # keep alive
            self._handle = self._lib.pf_open(
                arr, len(self.paths), capacity, workers, int(loop)
            )
            if not self._handle:
                self._lib = None

    def __iter__(self) -> Iterator[bytes]:
        if self._lib is None or self._handle is None:
            # synchronous fallback
            while True:
                for path in self.paths:
                    with open(path, "rb") as f:
                        yield f.read()
                if not self.loop:
                    return
        else:
            data = ctypes.POINTER(ctypes.c_char)()
            size = ctypes.c_size_t()
            while True:
                idx = self._lib.pf_next(
                    self._handle, ctypes.byref(data), ctypes.byref(size)
                )
                if idx == -1:
                    return
                if idx == -2:
                    raise IOError("native prefetcher read error")
                try:
                    yield ctypes.string_at(data, size.value)
                finally:
                    self._lib.pf_release(data)

    def iter_npz(self) -> Iterator[dict]:
        import numpy as np

        for blob in self:
            yield dict(np.load(io.BytesIO(blob), allow_pickle=False))

    def close(self) -> None:
        if self._lib is not None and self._handle:
            self._lib.pf_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
