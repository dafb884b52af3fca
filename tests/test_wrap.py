"""Wrap envelope tests (reference `src/LZ4.Tests/WrapTests.cs:10-48`)."""

import struct

import pytest

pytestmark = pytest.mark.quick

import lz4net_tpu as lz4


def test_wrap_empty_is_eight_zero_bytes():
    assert lz4.wrap(b"") == bytes(8)
    assert lz4.unwrap(bytes(8)) == b""


def test_wrap_round_trip_compressible():
    data = b"some compressible text, " * 100
    packed = lz4.wrap(data)
    orig, payload = struct.unpack_from("<II", packed, 0)
    assert orig == len(data)
    assert payload < len(data)
    assert lz4.unwrap(packed) == data


def test_wrap_hc_round_trip():
    data = b"some compressible text, " * 100
    packed = lz4.wrap_hc(data)
    assert len(packed) <= len(lz4.wrap(data))
    assert lz4.unwrap(packed) == data


def test_wrap_incompressible_passthrough(rng):
    data = bytes(rng.getrandbits(8) for _ in range(1000))
    packed = lz4.wrap(data)
    orig, payload = struct.unpack_from("<II", packed, 0)
    assert orig == payload == len(data)
    assert packed[8:] == data
    assert lz4.unwrap(packed) == data


def test_wrap_single_byte():
    for b in (b"\x00", b"Z"):
        packed = lz4.wrap(b)
        assert lz4.unwrap(packed) == b
        packed_hc = lz4.wrap_hc(b)
        assert lz4.unwrap(packed_hc) == b


def test_unwrap_rejects_short_buffer():
    with pytest.raises(ValueError):
        lz4.unwrap(b"\x01\x02\x03")


def test_unwrap_rejects_corrupt_length():
    packed = struct.pack("<II", 10, 100) + b"x" * 5
    with pytest.raises(ValueError):
        lz4.unwrap(packed)
