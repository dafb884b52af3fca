"""Differential tests: native C++ engine vs pure-Python reference.

The two engines were written independently (C++ from the format spec /
parse rules; Python likewise) — byte-identical compressed output across
both is the framework's bit-exactness evidence, mirroring the reference's
cross-engine ConformanceTests (`src/LZ4.Tests/ConformanceTests.cs:121-147`).
"""

import hashlib

import numpy as np
import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R

pytestmark = [pytest.mark.quick,
              pytest.mark.skipif(not N.is_available(),
                                reason="native library unavailable")]


def _mixed(size: int, seed: int = 0) -> bytes:
    """Deterministic compressible/incompressible mix."""
    out = bytearray()
    words = [b"the quick brown fox ", b"lorem ipsum dolor ",
             b"0123456789abcdef", b"zzzzzzzzzzzzzzzz"]
    i = seed
    while len(out) < size:
        h = hashlib.sha256(i.to_bytes(4, "little")).digest()
        if h[0] % 3 == 0:
            out += h[:1 + h[1] % 24]
        else:
            out += words[h[2] % len(words)] * (1 + h[3] % 6)
        i += 1
    return bytes(out[:size])


SIZES = [1, 12, 13, 100, 1000, 10000, 65546, 65547, 70000, 200000]


@pytest.mark.parametrize("size", SIZES)
def test_fast_compress_bit_identical(size):
    data = _mixed(size)
    assert N.compress_block(data) == R.compress_block(data)


@pytest.mark.parametrize("size", [1, 100, 1000, 10000, 30000])
def test_hc_compress_bit_identical(size):
    data = _mixed(size, seed=77)
    assert N.compress_block_hc(data) == R.compress_block_hc(data)


@pytest.mark.parametrize("size", SIZES)
def test_native_decoders_round_trip(size):
    data = _mixed(size, seed=3)
    packed = N.compress_block(data)
    assert N.decompress_block(packed, size) == data
    assert N.decompress_block_unknown(packed, size) == data
    # cross-engine: python-encoded, native-decoded and vice versa
    assert N.decompress_block(R.compress_block(data), size) == data
    assert R.decompress_block(packed, size) == data


def test_native_rejects_corrupt_input():
    data = _mixed(5000)
    packed = N.compress_block(data)
    with pytest.raises(R.CorruptedBlockError):
        N.decompress_block(packed[:-4], len(data))
    with pytest.raises(R.CorruptedBlockError):
        N.decompress_block(packed, len(data) + 1)
    with pytest.raises(R.CorruptedBlockError):
        N.decompress_block_unknown(b"", 10)


def test_native_budget_overflow_matches_python():
    data = b"".join(hashlib.sha256(bytes([i])).digest() for i in range(64))
    assert N.compress_block(data, len(data)) == b""
    assert N.compress_block_hc(data, len(data)) == b""


def test_hc_attempt_budget_parity():
    data = _mixed(20000, seed=9)
    for attempts in (2, 16, 256):
        assert N.compress_block_hc(data, attempts=attempts) == \
            R.compress_block_hc(data, attempts=attempts)


def test_batch_compress_matches_single():
    data = _mixed(300000, seed=5)
    bs = 65536
    offs = np.arange(0, len(data), bs, dtype=np.int64)
    lens = np.minimum(bs, len(data) - offs).astype(np.int32)
    payload, sizes = N.compress_blocks(data, offs, lens, n_threads=2)
    pos = 0
    for off, ln, sz in zip(offs, lens, sizes):
        blk = data[off:off + ln]
        single = N.compress_block(blk, int(ln))
        assert sizes[0] >= 0
        if sz <= 0:
            assert single == b""
        else:
            assert payload[pos:pos + sz] == single
            pos += sz


def test_batch_decompress_round_trip():
    data = _mixed(500000, seed=6)
    bs = 65536
    offs = np.arange(0, len(data), bs, dtype=np.int64)
    lens = np.minimum(bs, len(data) - offs).astype(np.int32)
    payload, sizes = N.compress_blocks(data, offs, lens)
    assert (sizes > 0).all()
    comp_offs = np.zeros(len(sizes), np.int64)
    np.cumsum(sizes[:-1], out=comp_offs[1:])
    dec, status = N.decompress_blocks(payload, comp_offs, sizes, lens,
                                      n_threads=2)
    assert dec == data
    assert (status > 0).all()


def test_registry_prefers_native():
    from lz4net_tpu import registry
    registry.initialize(force=True)
    assert "native" in registry.available_services()
    assert registry.encoder().codec_name == "native"
