"""TPU decode kernel tests (Pallas interpret mode on the CPU backend).

Differential against the native/python oracles, mirroring the reference's
cross-engine conformance strategy.  On real TPU hardware the same kernel
compiles via Mosaic; these tests exercise identical kernel code through the
interpreter.
"""

import hashlib
import random

import numpy as np
import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R
from lz4net_tpu.ops.decode_pallas import PallasDecoder


def _oracle_compress(data: bytes) -> bytes:
    if N.is_available():
        return N.compress_block(data)
    return R.compress_block(data)


@pytest.fixture(scope="module")
def decoder():
    return PallasDecoder(interpret=True)


CASES = {
    "text": (b"the quick brown fox jumps over the lazy dog. " * 100)[:3000],
    "rle1": b"\x07" * 4000,
    "rle2": b"ab" * 2000,
    "period7": b"abcdefg" * 500,
    "period100": bytes(range(100)) * 40,
    "incompressible": bytes(map(random.Random(5).randrange, [256] * 2500)),
    "tiny": b"x" * 13,
    "pure_literal_tail": b"0123456789abcdef" * 4,
    "long_literal_run": b"".join(hashlib.sha256(bytes([i])).digest()
                                 for i in range(20)) + b"Z" * 100,
}


@pytest.mark.parametrize("name", list(CASES))
def test_decode_matches_oracle(decoder, name):
    data = CASES[name]
    packed = _oracle_compress(data)
    got = decoder.decode_batch([packed], [len(data)])[0]
    assert got == data


def test_decode_batch_mixed_blocks(decoder):
    rng = random.Random(9)
    datas = []
    for _ in range(6):
        size = rng.randint(50, 5000)
        kind = rng.random()
        if kind < 0.3:
            datas.append(bytes(rng.getrandbits(8) for _ in range(size)))
        elif kind < 0.6:
            datas.append((b"lorem ipsum dolor sit amet " * 300)[:size])
        else:
            datas.append((bytes([rng.getrandbits(8)]) * size))
    packed = [_oracle_compress(d) for d in datas]
    got = decoder.decode_batch(packed, [len(d) for d in datas])
    assert got == datas


def test_decode_hc_streams(decoder):
    data = (b"abcabcabd" * 120 + b"the quick brown fox " * 40)[:2000]
    packed = (N.compress_block_hc(data) if N.is_available()
              else R.compress_block_hc(data))
    got = decoder.decode_batch([packed], [len(data)])[0]
    assert got == data


def test_decode_status_detects_garbage(decoder):
    from lz4net_tpu.models.reference import CorruptedBlockError
    data = b"some valid data that compresses " * 50
    packed = _oracle_compress(data)
    # truncate mid-stream: kernel's (read, written) status will not line up
    with pytest.raises(CorruptedBlockError):
        decoder.decode_batch([packed[:len(packed) // 2]], [len(data)])


def test_tpu_service_single_block_path():
    from lz4net_tpu.models import tpu
    if not tpu.is_available():
        pytest.skip("no JAX backend")
    data = b"hello hello hello hello hello world " * 30
    packed = _oracle_compress(data)
    assert tpu.decompress_block(packed, len(data)) == data
