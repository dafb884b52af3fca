"""Decoder robustness fuzzing (the `original/fuzzer.c` role): mutated and
synthetic streams must never crash or silently overrun — every outcome is
either a clean decode or a CorruptedBlockError."""

import random

import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R


def _engines():
    yield "python", R.decompress_block, R.decompress_block_unknown
    if N.is_available():
        yield "native", N.decompress_block, N.decompress_block_unknown


@pytest.mark.parametrize("engine", [e[0] for e in _engines()])
def test_mutated_streams_never_crash(engine):
    decoders = {e[0]: (e[1], e[2]) for e in _engines()}
    dec_known, dec_unknown = decoders[engine]
    rng = random.Random(1234)
    base = (b"the quick brown fox jumps over the lazy dog. " * 40)[:1500]
    packed = bytearray(R.compress_block(base))

    decoded, caught = 0, 0
    for trial in range(300):
        mutated = bytearray(packed)
        for _ in range(rng.randint(1, 4)):
            op = rng.random()
            if op < 0.5 and mutated:
                mutated[rng.randrange(len(mutated))] = rng.getrandbits(8)
            elif op < 0.75 and len(mutated) > 4:
                del mutated[rng.randrange(len(mutated))]
            else:
                mutated.insert(rng.randrange(len(mutated) + 1),
                               rng.getrandbits(8))
        for dec, arg in ((dec_known, len(base)), (dec_unknown, len(base))):
            try:
                out = dec(bytes(mutated), arg)
                assert len(out) <= len(base)
                decoded += 1
            except R.CorruptedBlockError:
                caught += 1
    # Some mutations decode cleanly (flips inside literal payloads), most
    # corrupt the sequence structure and must raise; both outcomes have to
    # occur or the harness isn't exercising the decoder at all.
    assert decoded > 0 and caught > 0


@pytest.mark.parametrize("engine", [e[0] for e in _engines()])
def test_random_garbage_streams(engine):
    decoders = {e[0]: (e[1], e[2]) for e in _engines()}
    dec_known, dec_unknown = decoders[engine]
    rng = random.Random(99)
    for trial in range(200):
        blob = bytes(rng.getrandbits(8)
                     for _ in range(rng.randint(1, 400)))
        for dec, arg in ((dec_known, rng.randint(1, 1000)),
                         (dec_unknown, rng.randint(1, 1000))):
            try:
                out = dec(blob, arg)
                assert len(out) <= 1000
            except R.CorruptedBlockError:
                pass


def _mutate(rng, packed):
    mutated = bytearray(packed)
    for _ in range(rng.randint(1, 4)):
        op = rng.random()
        if op < 0.5 and mutated:
            mutated[rng.randrange(len(mutated))] = rng.getrandbits(8)
        elif op < 0.75 and len(mutated) > 4:
            del mutated[rng.randrange(len(mutated))]
        else:
            mutated.insert(rng.randrange(len(mutated) + 1),
                           rng.getrandbits(8))
    return bytes(mutated)


def test_vector_decoder_agrees_with_hardened_cpu_on_mutations():
    """The device pipeline's accept/reject certification
    (`decode_vector.py` strict/consumed/needed) vs the hardened CPU
    decoder, on mutated streams (the `original/fuzzer.c:44-58` role for
    the TPU engine).  Any disagreement — device accepting a stream the
    CPU rejects, or decoding to different bytes — is a failure."""
    from lz4net_tpu.ops.decode_vector import VectorDecoder

    rng = random.Random(777)
    base = (b"mxu gather one-hot lane select banded window " * 40)[:1800]
    packed = R.compress_block(base)
    dec = VectorDecoder()

    muts = [_mutate(rng, packed) for _ in range(120)]
    # batched known-length pass: device path for every block; the host
    # oracle inside raises for blocks the device cannot certify, so probe
    # block-by-block after one warm batched call on the valid stream
    assert dec.decode_batch([packed], [len(base)])[0] == base
    agree_ok = agree_err = 0
    for m in muts:
        try:
            host = R.decompress_block(m, len(base))
        except R.CorruptedBlockError:
            host = None
        try:
            dev = dec.decode_batch([m], [len(base)])[0]
        except R.CorruptedBlockError:
            dev = None
        assert dev == host, "device known-length decode disagrees with CPU"
        agree_ok += dev is not None
        agree_err += dev is None
    assert agree_ok > 0 and agree_err > 0

    for m in muts[:60]:
        try:
            host = R.decompress_block_unknown(m, len(base) + 64)
        except R.CorruptedBlockError:
            host = None
        try:
            dev = dec.decode_batch_unknown([m], [len(base) + 64])[0]
        except R.CorruptedBlockError:
            dev = None
        assert dev == host, "device unknown-length decode disagrees with CPU"


def test_vector_decoder_garbage_streams():
    """Random garbage through the device pipeline: same outcome as the
    hardened CPU decoder (clean decode or CorruptedBlockError)."""
    from lz4net_tpu.ops.decode_vector import VectorDecoder

    rng = random.Random(31337)
    dec = VectorDecoder()
    for trial in range(40):
        blob = bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 300)))
        cap = rng.randint(1, 600)
        try:
            host = R.decompress_block_unknown(blob, cap)
        except R.CorruptedBlockError:
            host = None
        try:
            dev = dec.decode_batch_unknown([blob], [cap])[0]
        except R.CorruptedBlockError:
            dev = None
        assert dev == host


def test_vector_decoder_dict_mutations():
    """Preset-dictionary device decode vs CPU dict decoder on mutations."""
    from lz4net_tpu.ops.decode_vector import VectorDecoder

    rng = random.Random(4242)
    dictionary = (b"shared preset window 0123456789 " * 20)[:512]
    base = (b"shared preset window plus new content " * 30)[:900]
    packed = R.compress_block_dict(dictionary, base,
                                   len(base) + len(base) // 2 + 64)
    dec = VectorDecoder()
    assert dec.decode_batch([packed], [len(base)],
                            dictionary=dictionary)[0] == base
    for _ in range(40):
        m = _mutate(rng, packed)
        try:
            host = R.decompress_block_dict(m, dictionary, len(base))
        except R.CorruptedBlockError:
            host = None
        try:
            dev = dec.decode_batch([m], [len(base)],
                                   dictionary=dictionary)[0]
        except R.CorruptedBlockError:
            dev = None
        assert dev == host


def test_cyclic_sequences_round_trip():
    """The upstream fuzzer's synthetic cyclic data (`fuzzer.c:44-58`)."""
    rng = random.Random(7)
    for trial in range(30):
        period = rng.randint(1, 40)
        pattern = bytes(rng.getrandbits(8) for _ in range(period))
        size = rng.randint(20, 4000)
        data = (pattern * (size // period + 1))[:size]
        for compress in (R.compress_block, R.compress_block_hc):
            packed = compress(data)
            assert R.decompress_block(packed, size) == data
