"""TPU engine: batched block codec backed by Pallas/XLA kernels.

Round-1 scope: known-length batched decode via the parallel token-parse +
pointer-doubling match-resolution pipeline in `lz4net_tpu.ops`, with host
(native/python) fallbacks for paths not yet on-device.
"""

from __future__ import annotations


def is_available() -> bool:
    """True when a real TPU backend is reachable (or forced via env).

    On CPU-only JAX the Pallas kernels still run through the interpreter —
    correct but far too slow to register as a production engine; tests use
    `ops.decode_pallas.PallasDecoder(interpret=True)` directly instead.
    """
    import os
    if os.environ.get("LZ4NET_TPU_FORCE") == "1":
        return True
    try:
        import jax
        return any("TPU" in d.device_kind.upper() for d in jax.devices())
    except Exception:  # noqa: BLE001
        return False


def _oracle():
    """Host-side oracle used for paths not yet implemented on-device."""
    from . import native
    if native.is_available():
        return native
    from . import reference
    return reference


def compress_block(src: bytes, dst_maxlen: int | None = None) -> bytes:
    return _oracle().compress_block(src, dst_maxlen)


def compress_block_hc(src: bytes, dst_maxlen: int | None = None,
                      level: int = 9) -> bytes:
    from ..constants import MAX_NB_ATTEMPTS, hc_level_attempts
    attempts = MAX_NB_ATTEMPTS if level >= 9 else hc_level_attempts(level)
    return _oracle().compress_block_hc(src, dst_maxlen, attempts)


def decompress_block(src: bytes, output_length: int) -> bytes:
    from ..ops import decode_pallas
    return decode_pallas.decompress_block(src, output_length)


def decompress_blocks(blocks, out_lens):
    """Batched known-length decode on the TPU kernel (the fast path the
    stream/parallel layers use)."""
    from ..ops import decode_pallas
    return decode_pallas.PallasDecoder().decode_batch(list(blocks),
                                                      list(out_lens))


def decompress_block_unknown(src: bytes, max_output_length: int) -> bytes:
    # The hardened variable-length path stays on host for now.
    return _oracle().decompress_block_unknown(src, max_output_length)
