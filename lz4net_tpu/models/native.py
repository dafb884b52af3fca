"""ctypes bindings to the C++ CPU oracle (built from lz4net_tpu/native/).

The native library plays the role of the reference's mixed-mode engine
(LZ4mm + libLZ4 static lib, `/root/reference/src/libLZ4/`): the fastest
CPU path and the bit-exactness oracle for the TPU kernels.  Buffers cross
the boundary zero-copy: `bytes` inputs go through c_char_p and outputs are
written straight into `bytearray`s via from_buffer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblz4tpu.so"))

_lib = None
_lock = threading.Lock()

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


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
        src = os.path.join(_NATIVE_DIR, "lz4_oracle.cpp")
        if (not os.path.exists(_LIB_PATH)
                or (os.path.exists(src)
                    and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        c_ubp = ctypes.c_char_p          # zero-copy view of bytes inputs
        out_p = ctypes.POINTER(ctypes.c_char)
        lib.lz4tpu_compress.restype = ctypes.c_int
        lib.lz4tpu_compress.argtypes = [c_ubp, ctypes.c_int, out_p, ctypes.c_int]
        lib.lz4tpu_compress_hc.restype = ctypes.c_int
        lib.lz4tpu_compress_hc.argtypes = [c_ubp, ctypes.c_int, out_p,
                                           ctypes.c_int, ctypes.c_int]
        lib.lz4tpu_decompress.restype = ctypes.c_int
        lib.lz4tpu_decompress.argtypes = [c_ubp, ctypes.c_int, out_p,
                                          ctypes.c_int]
        lib.lz4tpu_decompress_unknown.restype = ctypes.c_int
        lib.lz4tpu_decompress_unknown.argtypes = [c_ubp, ctypes.c_int, out_p,
                                                  ctypes.c_int]
        lib.lz4tpu_compress_dict.restype = ctypes.c_int
        lib.lz4tpu_compress_dict.argtypes = [c_ubp, ctypes.c_int, ctypes.c_int,
                                             out_p, ctypes.c_int]
        lib.lz4tpu_compress_hc_dict.restype = ctypes.c_int
        lib.lz4tpu_compress_hc_dict.argtypes = [c_ubp, ctypes.c_int,
                                                ctypes.c_int, out_p,
                                                ctypes.c_int, ctypes.c_int]
        lib.lz4tpu_decompress_dict.restype = ctypes.c_int
        lib.lz4tpu_decompress_dict.argtypes = [c_ubp, ctypes.c_int, out_p,
                                               ctypes.c_int, ctypes.c_int]
        lib.lz4tpu_segment_index.restype = ctypes.c_int
        lib.lz4tpu_segment_index.argtypes = [c_ubp, ctypes.c_int,
                                             ctypes.c_int, _i32p, _i32p,
                                             ctypes.c_int]
        lib.lz4tpu_decompress_fragment.restype = ctypes.c_int
        lib.lz4tpu_decompress_fragment.argtypes = [c_ubp, ctypes.c_int,
                                                   out_p, ctypes.c_int,
                                                   ctypes.c_int]
        lib.lz4tpu_giant_seqs.restype = ctypes.c_int
        lib.lz4tpu_giant_seqs.argtypes = [c_ubp, ctypes.c_int,
                                          ctypes.c_int, _i32p, _i32p,
                                          _i32p, _i32p, _i32p, _i32p,
                                          ctypes.c_int]
        lib.lz4tpu_compress_batch.restype = None
        lib.lz4tpu_compress_batch.argtypes = [
            c_ubp, _i64p, _i32p, out_p, _i64p, ctypes.c_int32, _i32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.lz4tpu_decompress_batch.restype = None
        lib.lz4tpu_decompress_batch.argtypes = [
            c_ubp, _i64p, _i32p, out_p, _i64p, _i32p, _i32p,
            ctypes.c_int32, ctypes.c_int32]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


_scratch = threading.local()


def _out_buffer(size: int):
    """Reusable per-thread output scratch.

    First-touch page faults are extremely slow in this VM (DAMON proactive
    reclaim returns idle pages to the host), so allocating a fresh buffer
    per call costs more than the codec work itself.  The scratch grows
    geometrically and is kept warm across calls.
    """
    size = max(1, size)
    buf = getattr(_scratch, "buf", None)
    if buf is None or len(buf) < size:
        cap = max(size, 2 * len(buf) if buf is not None else size)
        buf = bytearray(cap)
        _scratch.buf = buf
    ptr = (ctypes.c_char * len(buf)).from_buffer(buf)
    return buf, ptr


def compress_block(src: bytes, dst_maxlen: int | None = None) -> bytes:
    from ..constants import maximum_output_length
    lib = _load()
    src = bytes(src)
    n = len(src)
    if n == 0:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(n)
    buf, ptr = _out_buffer(dst_maxlen)
    written = lib.lz4tpu_compress(src, n, ptr, dst_maxlen)
    if written <= 0:
        return b""
    del ptr
    return bytes(memoryview(buf)[:written])


def compress_block_hc(src: bytes, dst_maxlen: int | None = None,
                      attempts: int = 256) -> bytes:
    from ..constants import maximum_output_length
    lib = _load()
    src = bytes(src)
    n = len(src)
    if n == 0:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(n)
    buf, ptr = _out_buffer(dst_maxlen)
    written = lib.lz4tpu_compress_hc(src, n, ptr, dst_maxlen, attempts)
    if written <= 0:
        return b""
    del ptr
    return bytes(memoryview(buf)[:written])


def decompress_block(src: bytes, output_length: int) -> bytes:
    from .reference import CorruptedBlockError
    lib = _load()
    src = bytes(src)
    if output_length == 0:
        return b""
    buf, ptr = _out_buffer(output_length)
    consumed = lib.lz4tpu_decompress(src, len(src), ptr, output_length)
    if consumed < 0:
        raise CorruptedBlockError(f"native decode failed at {-consumed}")
    del ptr
    return bytes(memoryview(buf)[:output_length])


def decompress_block_unknown(src: bytes, max_output_length: int) -> bytes:
    from .reference import CorruptedBlockError
    lib = _load()
    src = bytes(src)
    if len(src) == 0:
        raise CorruptedBlockError("empty input")
    buf, ptr = _out_buffer(max_output_length)
    written = lib.lz4tpu_decompress_unknown(src, len(src), ptr,
                                            max_output_length)
    if written < 0:
        raise CorruptedBlockError(f"native decode failed at {-written}")
    del ptr
    return bytes(memoryview(buf)[:written])


# --- preset-dictionary paths ------------------------------------------------

def compress_block_dict(dictionary: bytes, data: bytes,
                        dst_maxlen: int | None = None) -> bytes:
    from ..constants import maximum_output_length
    lib = _load()
    dictionary, data = bytes(dictionary), bytes(data)
    if not data:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(len(data))
    src = dictionary + data
    buf, ptr = _out_buffer(dst_maxlen)
    written = lib.lz4tpu_compress_dict(src, len(dictionary), len(src), ptr,
                                       dst_maxlen)
    del ptr
    return bytes(memoryview(buf)[:written]) if written > 0 else b""


def compress_block_hc_dict(dictionary: bytes, data: bytes,
                           dst_maxlen: int | None = None,
                           attempts: int = 256) -> bytes:
    from ..constants import maximum_output_length
    lib = _load()
    dictionary, data = bytes(dictionary), bytes(data)
    if not data:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(len(data))
    src = dictionary + data
    buf, ptr = _out_buffer(dst_maxlen)
    written = lib.lz4tpu_compress_hc_dict(src, len(dictionary), len(src), ptr,
                                          dst_maxlen, attempts)
    del ptr
    return bytes(memoryview(buf)[:written]) if written > 0 else b""


def decompress_block_dict(src: bytes, dictionary: bytes,
                          output_length: int) -> bytes:
    from .reference import CorruptedBlockError
    lib = _load()
    src, dictionary = bytes(src), bytes(dictionary)
    if output_length == 0:
        return b""
    dict_len = len(dictionary)
    buf, ptr = _out_buffer(dict_len + output_length)
    buf[:dict_len] = dictionary
    consumed = lib.lz4tpu_decompress_dict(src, len(src), ptr, dict_len,
                                          output_length)
    if consumed < 0:
        raise CorruptedBlockError(f"native dict decode failed at {-consumed}")
    del ptr
    return bytes(memoryview(buf)[dict_len:dict_len + output_length])


# --- batched (multithreaded) paths -----------------------------------------

def segment_index(block: bytes, out_target: int):
    """Sequence-boundary segmentation of one compressed block: returns
    (comp_offsets, out_offsets) numpy arrays (first entry (0, 0)), or
    None for malformed input / a sequence spanning > out_target output
    bytes.  Segment k covers comp[comp_offs[k]:comp_offs[k+1]] producing
    out[out_offs[k]:out_offs[k+1]]; each segment's output is < 2 *
    out_target (a boundary is placed at the first sequence at or past
    each target mark).  C scan, headers only (lz4tpu_segment_index)."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    max_segs = max(2, len(block) // 16 + 2)
    comp_offs = np.zeros(max_segs, np.int32)
    out_offs = np.zeros(max_segs, np.int32)
    n = lib.lz4tpu_segment_index(block, len(block), out_target,
                                 comp_offs, out_offs, max_segs)
    if n < 1:
        return None
    return comp_offs[:n], out_offs[:n]


def decompress_fragment(src: bytes, window: bytes, out_len: int) -> bytes:
    """Decode a mid-block fragment (ops/bigblock.py) against a window
    prefix, without the block-END restrictions (lenient tail)."""
    from .reference import CorruptedBlockError
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    src, window = bytes(src), bytes(window)
    if out_len == 0:
        return b""
    dict_len = len(window)
    buf, ptr = _out_buffer(dict_len + out_len)
    buf[:dict_len] = window
    n = lib.lz4tpu_decompress_fragment(src, len(src), ptr, dict_len,
                                       out_len)
    if n != out_len:
        raise CorruptedBlockError(f"fragment decode: {n} != {out_len}")
    del ptr
    return bytes(memoryview(buf)[dict_len:dict_len + out_len])


def giant_seqs(block: bytes, out_target: int):
    """Sequences whose output span exceeds ``out_target``: list of
    (comp_off, out_off, lit_len, lit_src, match_off, match_len), or
    None on malformed input (lz4tpu_giant_seqs)."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    max_g = max(2, len(block) // max(out_target, 1) + 8)
    arrs = [np.zeros(max_g, np.int32) for _ in range(6)]
    n = lib.lz4tpu_giant_seqs(block, len(block), out_target,
                              *arrs, max_g)
    if n < 0:
        return None
    return [tuple(int(a[i]) for a in arrs) for i in range(n)]


def compress_blocks(src: bytes, offsets, lengths, *, hc_attempts: int = 0,
                    n_threads: int = 0) -> tuple[bytes, np.ndarray]:
    """Compress many independent blocks of one contiguous buffer in
    parallel.  Returns (packed_payloads_concatenated, sizes array).

    Every block gets the worst-case output budget so compression always
    succeeds; incompressible blocks come back *expanded* (sizes[i] >=
    lengths[i]) and the caller applies the store-raw rule, exactly like the
    stream layer's incompressible-passthrough (`LZ4Stream.cs:248-255`).
    """
    from ..constants import maximum_output_length
    lib = _load()
    src = bytes(src)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    n_blocks = len(offsets)
    if n_blocks == 0:
        return b"", np.zeros(0, np.int32)
    max_len = int(lengths.max())
    budget = maximum_output_length(max_len)
    dst_offsets = np.arange(n_blocks, dtype=np.int64) * budget
    buf, ptr = _out_buffer(n_blocks * budget)
    results = np.zeros(n_blocks, np.int32)
    lib.lz4tpu_compress_batch(src, offsets, lengths, ptr, dst_offsets,
                              budget, results, n_blocks, n_threads,
                              hc_attempts)
    del ptr
    view = memoryview(buf)
    parts = [bytes(view[i * budget:i * budget + max(0, int(results[i]))])
             for i in range(n_blocks)]
    return b"".join(parts), results


def decompress_blocks(src: bytes, offsets, lengths, out_lengths, *,
                      n_threads: int = 0) -> tuple[bytes, np.ndarray]:
    """Decode many independent blocks in parallel; returns (decoded bytes
    concatenated in input order, per-block status array)."""
    from .reference import CorruptedBlockError
    lib = _load()
    src = bytes(src)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    out_lengths = np.ascontiguousarray(out_lengths, dtype=np.int32)
    n_blocks = len(offsets)
    if n_blocks == 0:
        return b"", np.zeros(0, np.int32)
    dst_offsets = np.zeros(n_blocks, np.int64)
    np.cumsum(out_lengths[:-1], out=dst_offsets[1:])
    total = int(out_lengths.sum())
    buf, ptr = _out_buffer(total)
    results = np.zeros(n_blocks, np.int32)
    lib.lz4tpu_decompress_batch(src, offsets, lengths, ptr, dst_offsets,
                                out_lengths, results, n_blocks, n_threads)
    del ptr
    if (results < 0).any():
        bad = int(np.argmax(results < 0))
        raise CorruptedBlockError(f"native batch decode failed at block {bad}")
    return bytes(buf[:total]), results
