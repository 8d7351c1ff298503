"""ctypes bindings for the native data plane (native/merlot_native.cc):
TFRecord reading, tf.Example parsing, JPEG decode, fused
resize+pad+patchify — the C++ replacement for the reference's tf.data host
kernels. Builds the shared library on demand (g++ + libjpeg); callers fall
back to the pure-python codec when unavailable (``native_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Iterator, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmerlot_native.so")


@lru_cache(maxsize=1)
def _load() -> Optional[ctypes.CDLL]:
    so_path = _SO_PATH
    if not os.path.exists(so_path):
        src = os.path.join(_NATIVE_DIR, "merlot_native.cc")
        if not os.path.exists(src):
            return None
        if not os.access(_NATIVE_DIR, os.W_OK):
            # installed into a read-only site-packages: build to a per-user
            # cache instead of next to the source
            import hashlib
            import tempfile

            tag = hashlib.sha1(open(src, "rb").read()).hexdigest()[:12]
            so_path = os.path.join(tempfile.gettempdir(),
                                   f"libmerlot_native-{tag}.so")
        if not os.path.exists(so_path):
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
                     "-o", so_path, "-ljpeg"],
                    check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    lib.mn_reader_open.restype = ctypes.c_void_p
    lib.mn_reader_open.argtypes = [ctypes.c_char_p]
    lib.mn_reader_next.restype = ctypes.c_int64
    lib.mn_reader_next.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.mn_reader_close.argtypes = [ctypes.c_void_p]
    lib.mn_example_parse.restype = ctypes.c_void_p
    lib.mn_example_parse.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.mn_example_free.argtypes = [ctypes.c_void_p]
    lib.mn_feature_num_bytes.restype = ctypes.c_int64
    lib.mn_feature_num_bytes.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mn_feature_bytes.restype = ctypes.c_int64
    lib.mn_feature_bytes.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_int64,
                                     ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.mn_feature_ints.restype = ctypes.c_int64
    lib.mn_feature_ints.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
    lib.mn_feature_floats.restype = ctypes.c_int64
    lib.mn_feature_floats.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.mn_decode_jpeg.restype = ctypes.c_int
    lib.mn_decode_jpeg.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                                   ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_uint8)]
    lib.mn_resize_patchify.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    if hasattr(lib, "mn_resize_patchify_k"):
        lib.mn_resize_patchify_k.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
    return lib


def native_available() -> bool:
    return _load() is not None


def read_records_native(path: str) -> Iterator[bytes]:
    """Iterate raw record payloads (native framing reader)."""
    lib = _load()
    assert lib is not None
    handle = lib.mn_reader_open(path.encode())
    if not handle:
        raise IOError(f"cannot open {path}")
    try:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        while True:
            n = lib.mn_reader_next(handle, ctypes.byref(ptr))
            if n < 0:
                return
            yield ctypes.string_at(ptr, n)
    finally:
        lib.mn_reader_close(handle)


class NativeExample:
    """Parsed tf.Example with zero-copy-ish feature access."""

    def __init__(self, record: bytes):
        self._lib = _load()
        assert self._lib is not None
        buf = (ctypes.c_uint8 * len(record)).from_buffer_copy(record)
        self._h = self._lib.mn_example_parse(buf, len(record))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mn_example_free(self._h)
            self._h = None

    def bytes_list(self, key: str) -> List[bytes]:
        n = self._lib.mn_feature_num_bytes(self._h, key.encode())
        out = []
        for i in range(max(n, 0)):
            ptr = ctypes.POINTER(ctypes.c_uint8)()
            ln = self._lib.mn_feature_bytes(self._h, key.encode(), i,
                                            ctypes.byref(ptr))
            out.append(ctypes.string_at(ptr, ln))
        return out

    def int64s(self, key: str) -> np.ndarray:
        ptr = ctypes.POINTER(ctypes.c_int64)()
        n = self._lib.mn_feature_ints(self._h, key.encode(), ctypes.byref(ptr))
        if n <= 0:  # missing (<0) or present-but-empty (0: NULL data ptr)
            return np.zeros(0, np.int64)
        return np.ctypeslib.as_array(ptr, shape=(n,)).copy()

    def floats(self, key: str) -> np.ndarray:
        ptr = ctypes.POINTER(ctypes.c_float)()
        n = self._lib.mn_feature_floats(self._h, key.encode(), ctypes.byref(ptr))
        if n <= 0:  # missing (<0) or present-but-empty (0: NULL data ptr)
            return np.zeros(0, np.float32)
        return np.ctypeslib.as_array(ptr, shape=(n,)).copy()


def decode_jpeg_native(data: bytes, channels: int = 3) -> np.ndarray:
    lib = _load()
    assert lib is not None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.mn_decode_jpeg(buf, len(data), channels, ctypes.byref(h),
                            ctypes.byref(w), None)
    if rc != 0:
        raise ValueError("jpeg decode failed")
    out = np.empty((h.value, w.value, channels) if channels == 3
                   else (h.value, w.value), np.uint8)
    rc = lib.mn_decode_jpeg(buf, len(data), channels, ctypes.byref(h),
                            ctypes.byref(w),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError("jpeg decode failed")
    return out


def resize_patchify_native(rgb: np.ndarray, grid, patch: int = 16,
                           scale_mult: float = 1.0, off_y: int = 0,
                           off_x: int = 0,
                           kernel: "int | None" = None) -> np.ndarray:
    """[h, w, 3] uint8 -> [grid_h*grid_w, patch*patch*3] float32 in [0, 1];
    scale_mult/offsets implement the training random-scale crop.

    ``kernel=None`` uses the fast 2-tap bilinear path; an int selects one of
    the PIL-parity antialiased filters in pil_resize_methods() order
    (0=BICUBIC 1=BILINEAR 2=BOX 3=HAMMING 4=LANCZOS 5=NEAREST) — the random
    resize-method augmentation's native fast path."""
    lib = _load()
    assert lib is not None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    gh, gw = grid
    out = np.empty((gh * gw, patch * patch * 3), np.float32)
    if kernel is None:
        lib.mn_resize_patchify(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rgb.shape[0], rgb.shape[1], gh, gw, patch, float(scale_mult),
            int(off_y), int(off_x),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    else:
        lib.mn_resize_patchify_k(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rgb.shape[0], rgb.shape[1], gh, gw, patch, float(scale_mult),
            int(off_y), int(off_x), int(kernel),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def jpeg_to_patches_native(data: bytes, grid, patch: int = 16) -> np.ndarray:
    """Fused: JPEG bytes -> patches, all in C++."""
    rgb = decode_jpeg_native(data, channels=3)
    return resize_patchify_native(rgb, grid, patch)
