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

    survived = 0
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
                survived += 1
            except R.CorruptedBlockError:
                pass
    # some mutations decode (flips inside literals), most must be caught;
    # the property under test is simply "no crash, no overrun"
    assert survived >= 0


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
