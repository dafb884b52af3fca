"""Codec facade: the framework's `LZ4Codec` equivalent.

Bytes-in/bytes-out API over the engine registry, plus the 8-byte Wrap
envelope (reference `/root/reference/src/LZ4/LZ4Codec.cs:296-599`).
"""

from __future__ import annotations

import struct

from . import registry
from .constants import (
    HC_LEVEL_DEFAULT,
    WRAP_HEADER_LENGTH,
    maximum_output_length,
)


def codec_name() -> str:
    """"encoder/decoder/encoderHC" triple of the selected engines."""
    return registry.codec_name()


def _dict_engine():
    """Engine module for preset-dictionary paths (native preferred)."""
    from .models import native
    if native.is_available():
        return native
    from .models import reference
    return reference


def encode(src: bytes, dst_maxlen: int | None = None, *,
           dictionary: bytes | None = None, mode: str = "strict") -> bytes:
    """Greedy (fast) LZ4 block compression.

    Returns b"" when ``dst_maxlen`` is given and the compressed form would
    not fit (the reference's Encode-returns-0 convention).  With the default
    ``dst_maxlen=None`` the worst-case bound is used and compression always
    succeeds.  ``dictionary`` enables preset-dictionary matching (decode
    must supply the same bytes).

    ``mode="strict"`` (default) reproduces the reference parse
    byte-for-byte across engines.  ``mode="fast"`` uses the vectorised
    TPU encoder: format-valid output (decodes identically everywhere),
    typically *smaller* than the reference parse, but not byte-identical
    to it (SURVEY.md §7 step 4's two modes).
    """
    if len(src) == 0:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(len(src))
    if dictionary:
        if mode == "fast":
            from .models import tpu
            if tpu.is_available():
                return tpu.compress_blocks_fast_dict(
                    [bytes(src)], dictionary, [dst_maxlen])[0]
        return _dict_engine().compress_block_dict(dictionary, bytes(src),
                                                  dst_maxlen)
    if mode == "fast":
        from .models import tpu
        if tpu.is_available():
            return tpu.compress_blocks_fast([bytes(src)], [dst_maxlen])[0]
        # no TPU: the strict engines below serve fast-mode requests too
    return registry.encoder().encode(bytes(src), dst_maxlen)


def encode_hc(src: bytes, dst_maxlen: int | None = None,
              level: int = HC_LEVEL_DEFAULT, *,
              dictionary: bytes | None = None,
              mode: str = "strict") -> bytes:
    """LZ4HC block compression.  ``level`` (1..9) maps onto the chain-search
    budget; level 9 reproduces the reference's fixed-effort parse.

    ``mode="strict"`` (default) is parse-identical across engines.
    ``mode="fast"`` routes to the device fast-HC encoder on TPU
    (deeper candidate tiers + lazy parse): format-valid output whose
    corpus-wide ratio is <= the reference HC parse, not byte-identical
    to it."""
    if len(src) == 0:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(len(src))
    if dictionary:
        if mode == "fast":
            from .models import tpu
            if tpu.is_available():
                return tpu.compress_blocks_fast_dict(
                    [bytes(src)], dictionary, [dst_maxlen],
                    level=max(level, 1))[0]
        from .constants import MAX_NB_ATTEMPTS, hc_level_attempts
        attempts = MAX_NB_ATTEMPTS if level >= 9 else hc_level_attempts(level)
        return _dict_engine().compress_block_hc_dict(
            dictionary, bytes(src), dst_maxlen, attempts)
    if mode == "fast":
        from .models import tpu
        if tpu.is_available():
            return tpu.compress_blocks_hc_fast([bytes(src)], [dst_maxlen],
                                               level)[0]
    return registry.encoder_hc().encode_hc(bytes(src), dst_maxlen, level)


def decode(src: bytes, output_length: int | None = None, *,
           max_output_length: int | None = None,
           dictionary: bytes | None = None) -> bytes:
    """Decompress one LZ4 block.

    ``output_length`` set -> known-output-length decode (fast path, used by
    the stream layer which always records original sizes).  Otherwise
    ``max_output_length`` must be given -> hardened unknown-length decode.
    Mirrors `LZ4Codec.Decode(..., knownOutputLength)` (`LZ4Codec.cs:430-463`).
    """
    if dictionary:
        if output_length is None:
            raise ValueError("dictionary decode requires output_length")
        if output_length == 0:
            return b""
        dec = registry.decoder()
        if hasattr(dec, "decode_dict"):
            return dec.decode_dict(bytes(src), dictionary, output_length)
        return _dict_engine().decompress_block_dict(bytes(src), dictionary,
                                                    output_length)
    if output_length is not None:
        if output_length == 0:
            return b""
        return registry.decoder().decode(bytes(src), output_length)
    if max_output_length is None:
        raise ValueError("either output_length or max_output_length is required")
    if len(src) == 0:
        return b""
    return registry.decoder().decode_unknown(bytes(src), max_output_length)


def decode_batch(blocks, output_lengths) -> list:
    """Batched known-length decode of independent blocks.

    One device dispatch on batched engines (tpu), a pthread pass on the
    native engine, a loop otherwise.  This is the stream layer's
    read-ahead hot path — the reference decodes its chunks one call at a
    time (`LZ4Stream.cs:274-312`); batching is what maps that loop onto
    the hardware this framework targets.
    """
    blocks = [bytes(b) for b in blocks]
    output_lengths = list(output_lengths)
    nonzero = [i for i, n in enumerate(output_lengths) if n > 0]
    dec = registry.decoder()
    results = [b""] * len(blocks)
    if hasattr(dec, "decode_batch"):
        sub = dec.decode_batch([blocks[i] for i in nonzero],
                               [output_lengths[i] for i in nonzero])
        for i, r in zip(nonzero, sub):
            results[i] = r
    else:
        for i in nonzero:
            results[i] = dec.decode(blocks[i], output_lengths[i])
    return results


# ---------------------------------------------------------------------------
# Wrap envelope: [u32le originalLength][u32le payloadLength][payload]
# Raw passthrough when compression does not shrink the data
# (`LZ4Codec.cs:510-599`).
# ---------------------------------------------------------------------------

def _wrap(src: bytes, high_compression: bool, level: int) -> bytes:
    n = len(src)
    if n == 0:
        return bytes(WRAP_HEADER_LENGTH)

    # The reference compresses into a buffer of only inputLength bytes so
    # "didn't fit" doubles as the incompressible signal.
    packed = (encode_hc(src, n, level) if high_compression else encode(src, n))
    if not packed or len(packed) >= n:
        return struct.pack("<II", n, n) + src
    return struct.pack("<II", n, len(packed)) + packed


def wrap(src: bytes) -> bytes:
    """Compress and wrap with the 8-byte envelope."""
    return _wrap(bytes(src), False, HC_LEVEL_DEFAULT)


def wrap_hc(src: bytes, level: int = HC_LEVEL_DEFAULT) -> bytes:
    """High-compression wrap."""
    return _wrap(bytes(src), True, level)


def unwrap(src: bytes) -> bytes:
    """Inverse of wrap/wrap_hc (`LZ4Codec.Unwrap`, `LZ4Codec.cs:574-599`)."""
    src = bytes(src)
    if len(src) < WRAP_HEADER_LENGTH:
        raise ValueError("input buffer size is invalid")
    original_length, payload_length = struct.unpack_from("<II", src, 0)
    if payload_length > len(src) - WRAP_HEADER_LENGTH:
        raise ValueError("input buffer size is invalid or has been corrupted")
    payload = src[WRAP_HEADER_LENGTH:WRAP_HEADER_LENGTH + payload_length]
    if payload_length >= original_length:
        return payload
    return decode(payload, original_length)
