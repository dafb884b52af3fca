"""ctypes bindings to the C++ CPU oracle (built from lz4net_tpu/native/).

The native library plays the role of the reference's mixed-mode engine
(LZ4mm + libLZ4 static lib, `/root/reference/src/libLZ4/`): the fastest
CPU path and the bit-exactness oracle for the TPU kernels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblz4tpu.so"))

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    makefile = os.path.abspath(os.path.join(_NATIVE_DIR, "Makefile"))
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(["make", "-C", os.path.dirname(makefile), "-s"],
                       check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, OSError):
        return False
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lz4tpu_compress.restype = ctypes.c_int
        lib.lz4tpu_compress.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int]
        lib.lz4tpu_compress_hc.restype = ctypes.c_int
        lib.lz4tpu_compress_hc.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int,
                                           ctypes.c_int]
        lib.lz4tpu_decompress.restype = ctypes.c_int
        lib.lz4tpu_decompress.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int]
        lib.lz4tpu_decompress_unknown.restype = ctypes.c_int
        lib.lz4tpu_decompress_unknown.argtypes = [u8p, ctypes.c_int, u8p,
                                                  ctypes.c_int]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _as_u8p(buf) -> "ctypes.POINTER(ctypes.c_uint8)":
    return ctypes.cast(ctypes.cast(buf, ctypes.c_void_p),
                       ctypes.POINTER(ctypes.c_uint8))


def compress_block(src: bytes, dst_maxlen: int | None = None) -> bytes:
    from ..constants import maximum_output_length
    lib = _load()
    n = len(src)
    if n == 0:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(n)
    dst = ctypes.create_string_buffer(max(1, dst_maxlen))
    written = lib.lz4tpu_compress(
        _as_u8p(ctypes.create_string_buffer(src, n)), n,
        _as_u8p(dst), dst_maxlen)
    if written <= 0:
        return b""
    return dst.raw[:written]


def compress_block_hc(src: bytes, dst_maxlen: int | None = None,
                      attempts: int = 256) -> bytes:
    from ..constants import maximum_output_length
    lib = _load()
    n = len(src)
    if n == 0:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(n)
    dst = ctypes.create_string_buffer(max(1, dst_maxlen))
    written = lib.lz4tpu_compress_hc(
        _as_u8p(ctypes.create_string_buffer(src, n)), n,
        _as_u8p(dst), dst_maxlen, attempts)
    if written <= 0:
        return b""
    return dst.raw[:written]


def decompress_block(src: bytes, output_length: int) -> bytes:
    from .reference import CorruptedBlockError
    lib = _load()
    if output_length == 0:
        return b""
    dst = ctypes.create_string_buffer(max(1, output_length))
    consumed = lib.lz4tpu_decompress(
        _as_u8p(ctypes.create_string_buffer(src, len(src))), len(src),
        _as_u8p(dst), output_length)
    if consumed < 0:
        raise CorruptedBlockError(f"native decode failed at {-consumed}")
    return dst.raw[:output_length]


def decompress_block_unknown(src: bytes, max_output_length: int) -> bytes:
    from .reference import CorruptedBlockError
    lib = _load()
    if len(src) == 0:
        raise CorruptedBlockError("empty input")
    dst = ctypes.create_string_buffer(max(1, max_output_length))
    written = lib.lz4tpu_decompress_unknown(
        _as_u8p(ctypes.create_string_buffer(src, len(src))), len(src),
        _as_u8p(dst), max_output_length)
    if written < 0:
        raise CorruptedBlockError(f"native decode failed at {-written}")
    return dst.raw[:written]
