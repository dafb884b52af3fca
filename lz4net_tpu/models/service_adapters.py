"""Adapters binding each engine implementation to the Lz4Service protocol.

The reference has eight trivial adapter classes binding ILZ4Service to each
engine x bitness (`/root/reference/src/LZ4/Services/*.cs`); these are their
three TPU-framework counterparts.
"""

from __future__ import annotations

from ..constants import HC_LEVEL_DEFAULT, MAX_NB_ATTEMPTS, hc_level_attempts


class PythonReferenceService:
    """Pure-Python safe engine (`lz4net_tpu.models.reference`)."""

    codec_name = "python-reference"

    def __init__(self):
        from . import reference
        self._ref = reference

    def encode(self, src: bytes, dst_maxlen: int) -> bytes:
        return self._ref.compress_block(src, dst_maxlen)

    def encode_hc(self, src: bytes, dst_maxlen: int,
                  level: int = HC_LEVEL_DEFAULT) -> bytes:
        attempts = MAX_NB_ATTEMPTS if level >= 9 else hc_level_attempts(level)
        return self._ref.compress_block_hc(src, dst_maxlen, attempts)

    def decode(self, src: bytes, output_length: int) -> bytes:
        return self._ref.decompress_block(src, output_length)

    def decode_unknown(self, src: bytes, max_output_length: int) -> bytes:
        return self._ref.decompress_block_unknown(src, max_output_length)

    def decode_dict(self, src: bytes, dictionary: bytes,
                    output_length: int) -> bytes:
        return self._ref.decompress_block_dict(src, dictionary,
                                               output_length)


class NativeService:
    """C++ CPU oracle engine (`lz4net_tpu.models.native`), the analogue of
    the reference's mixed-mode native engine (LZ4mm + libLZ4)."""

    codec_name = "native"

    def __init__(self):
        from . import native
        self._nat = native
        if not native.is_available():
            raise RuntimeError("native library not built")

    def encode(self, src: bytes, dst_maxlen: int) -> bytes:
        return self._nat.compress_block(src, dst_maxlen)

    def encode_hc(self, src: bytes, dst_maxlen: int,
                  level: int = HC_LEVEL_DEFAULT) -> bytes:
        attempts = MAX_NB_ATTEMPTS if level >= 9 else hc_level_attempts(level)
        return self._nat.compress_block_hc(src, dst_maxlen, attempts)

    def decode(self, src: bytes, output_length: int) -> bytes:
        return self._nat.decompress_block(src, output_length)

    def decode_unknown(self, src: bytes, max_output_length: int) -> bytes:
        return self._nat.decompress_block_unknown(src, max_output_length)

    def decode_dict(self, src: bytes, dictionary: bytes,
                    output_length: int) -> bytes:
        return self._nat.decompress_block_dict(src, dictionary,
                                               output_length)

    def decode_batch(self, blocks, output_lengths):
        """Batched known-length decode over the pthread C++ path."""
        src = b"".join(blocks)
        offsets, lengths = [], []
        pos = 0
        for b in blocks:
            offsets.append(pos)
            lengths.append(len(b))
            pos += len(b)
        out_lengths = list(output_lengths)
        concat, _status = self._nat.decompress_blocks(
            src, offsets, lengths, out_lengths)
        results, pos = [], 0
        for n in out_lengths:
            results.append(concat[pos:pos + n])
            pos += n
        return results


class TpuService:
    """Batched TPU engine (`lz4net_tpu.models.tpu`): Pallas/XLA kernels over
    independent blocks.  Single-buffer calls route through the batch-of-one
    path; the real win is the batched API used by the stream/parallel
    layers."""

    codec_name = "tpu"

    def __init__(self):
        from . import tpu
        self._tpu = tpu
        if not tpu.is_available():
            raise RuntimeError("no TPU/JAX backend available")

    def encode(self, src: bytes, dst_maxlen: int) -> bytes:
        return self._tpu.compress_block(src, dst_maxlen)

    def encode_hc(self, src: bytes, dst_maxlen: int,
                  level: int = HC_LEVEL_DEFAULT) -> bytes:
        return self._tpu.compress_block_hc(src, dst_maxlen, level)

    def decode(self, src: bytes, output_length: int) -> bytes:
        return self._tpu.decompress_block(src, output_length)

    def decode_unknown(self, src: bytes, max_output_length: int) -> bytes:
        return self._tpu.decompress_block_unknown(src, max_output_length)

    def decode_dict(self, src: bytes, dictionary: bytes,
                    output_length: int) -> bytes:
        return self._tpu.decompress_block_dict(src, dictionary,
                                               output_length)

    def decode_batch(self, blocks, output_lengths):
        """Batched known-length decode — one device dispatch for the
        whole batch (the stream layer's read-ahead path)."""
        return self._tpu.decompress_blocks(list(blocks),
                                           list(output_lengths))
