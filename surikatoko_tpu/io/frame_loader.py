"""Python binding for the native prefetching frame loader (ctypes).

Builds native/libframeloader.so on first use if the toolchain is available;
falls back transparently to the pure-python PGM/PPM reader
(vision/picture.py) otherwise. Iteration yields (frame_index, gray [H,W]
uint8) in filename order, with decode running on a C++ worker thread ahead
of the consumer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframeloader.so")
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        # make is an mtime-checked no-op when the .so is current; running it
        # unconditionally picks up source changes
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.fl_frame_count.argtypes = [ctypes.c_void_p]
    lib.fl_width.argtypes = [ctypes.c_void_p]
    lib.fl_height.argtypes = [ctypes.c_void_p]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.fl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class FrameLoader:
    """Iterate grayscale frames from a directory of PGM/PPM images."""

    def __init__(self, image_dir: str, prefetch_depth: int = 4):
        self.image_dir = image_dir
        self._handle = None
        self._lib = _get_lib()
        self.native = self._lib is not None
        if self.native:
            h = self._lib.fl_open(image_dir.encode(), prefetch_depth)
            if not h:
                self.native = False  # no decodable PNM files; fall back
            else:
                self._handle = ctypes.c_void_p(h)
                self.frame_count = self._lib.fl_frame_count(self._handle)
                self.width = self._lib.fl_width(self._handle)
                self.height = self._lib.fl_height(self._handle)
        if not self.native:
            from surikatoko_tpu.vision.picture import list_image_dir, load_picture

            self._paths = list_image_dir(image_dir)
            if not self._paths:
                raise FileNotFoundError(f"no images in {image_dir}")
            self._load = load_picture
            first = load_picture(self._paths[0])
            self.frame_count = len(self._paths)
            self.height, self.width = first.gray.shape

    def __iter__(self):
        if self.native:
            buf = ctypes.create_string_buffer(self.width * self.height)
            while True:
                idx = self._lib.fl_next(self._handle, buf, len(buf))
                if idx == -1:
                    break
                if idx == -2:
                    raise IOError(f"native decode error in {self.image_dir}")
                gray = np.frombuffer(buf.raw, np.uint8).reshape(
                    self.height, self.width).copy()
                yield idx, gray
        else:
            for i, p in enumerate(self._paths):
                yield i, self._load(p).gray

    def close(self):
        if self.native and self._handle:
            self._lib.fl_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
