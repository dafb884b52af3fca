"""TPU greedy encoder tests (Pallas interpret mode): compressed output must
be bit-identical to the native/python engines — the cross-engine
conformance contract the reference asserts for its compressors
(`ConformanceTests.cs:121-133`)."""

import random

import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R
from lz4net_tpu.ops.encode_pallas import MAX_ENCODE_BLOCK, PallasEncoder


def _oracle(data, maxlen=None):
    if N.is_available():
        return N.compress_block(data, maxlen)
    return R.compress_block(data, maxlen)


@pytest.fixture(scope="module")
def encoder():
    return PallasEncoder(interpret=True)


CASES = {
    "text": (b"the quick brown fox jumps over the lazy dog. " * 120)[:4000],
    "rle": b"\x05" * 3000,
    "period2": b"ab" * 1500,
    "incompressible": bytes(map(random.Random(1).randrange, [256] * 2000)),
    "tiny_literal": b"x" * 12,
    "min_match_len": b"x" * 13,
    "long_runs": b"z" * 300 + bytes(range(256)) + b"z" * 300,
}


@pytest.mark.parametrize("name", list(CASES))
def test_encode_bit_identical(encoder, name):
    data = CASES[name]
    got = encoder.encode_batch([data])[0]
    assert got == _oracle(data)


def test_encode_batch_mixed(encoder):
    datas = list(CASES.values())
    got = encoder.encode_batch(datas)
    assert got == [_oracle(d) for d in datas]


def test_encode_round_trips_through_all_decoders(encoder):
    data = CASES["text"]
    packed = encoder.encode_batch([data])[0]
    assert R.decompress_block(packed, len(data)) == data
    if N.is_available():
        assert N.decompress_block(packed, len(data)) == data


def test_encode_budget_overflow(encoder):
    rng = random.Random(2)
    data = bytes(rng.getrandbits(8) for _ in range(1500))
    got = encoder.encode_batch([data], [len(data)])[0]
    assert got == b""
    assert _oracle(data, len(data)) == b""


def test_encode_block_size_cap(encoder):
    with pytest.raises(ValueError):
        encoder.encode_batch([b"x" * (MAX_ENCODE_BLOCK + 1)])
