"""Round-trip and property tests for the pure-Python reference engine."""

import pytest

pytestmark = pytest.mark.quick

from lz4net_tpu.models import reference as R

CASES = [
    b"",
    b"a",
    b"ab",
    b"x" * 13,
    b"hello world, hello world, hello world, hello world!",
    b"abc" * 500,
    b"\x00" * 5000,
    b"ab" * 4000,
    b"the quick brown fox jumps over the lazy dog. " * 200,
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_fast_round_trip(data):
    packed = R.compress_block(data)
    if not data:
        assert packed == b""
        return
    assert R.decompress_block(packed, len(data)) == data
    assert R.decompress_block_unknown(packed, len(data)) == data


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_hc_round_trip(data):
    packed = R.compress_block_hc(data)
    if not data:
        assert packed == b""
        return
    assert R.decompress_block(packed, len(data)) == data
    assert R.decompress_block_unknown(packed, len(data)) == data


def test_random_blocks_round_trip(rng, make_test_data):
    from conftest import log_uniform_sizes
    for size in log_uniform_sizes(rng, 12, 30000):
        data = make_test_data(size)
        packed = R.compress_block(data)
        assert R.decompress_block(packed, size) == data
        assert R.decompress_block_unknown(packed, size) == data


def test_random_blocks_hc_round_trip(rng, make_test_data):
    from conftest import log_uniform_sizes
    for size in log_uniform_sizes(rng, 6, 8000):
        data = make_test_data(size, entropy=0.3)
        packed = R.compress_block_hc(data)
        assert R.decompress_block(packed, size) == data


def test_64k_boundary_both_paths():
    # LZ4_64KLIMIT = 65547 switches the hash specialisation; both sides
    # must round-trip (and stay decodable by the same decoder).
    base = (b"abcdefgh123" * 8000)
    for size in (65546, 65547, 65548):
        data = base[:size]
        packed = R.compress_block(data)
        assert R.decompress_block(packed, size) == data


def test_hc_beats_or_matches_fast():
    data = b"the quick brown fox jumps over the lazy dog. " * 300
    fast = R.compress_block(data)
    hc = R.compress_block_hc(data)
    assert len(hc) <= len(fast)
    assert R.decompress_block(hc, len(data)) == data


def test_hc_levels_monotone_budget():
    data = (b"abcabcabd" * 50 + b"xyzxyzxyw" * 50) * 10
    sizes = []
    for attempts in (2, 16, 256):
        packed = R.compress_block_hc(data, attempts=attempts)
        assert R.decompress_block(packed, len(data)) == data
        sizes.append(len(packed))
    assert sizes[-1] <= sizes[0]


def test_output_budget_overflow_returns_empty():
    import hashlib
    data = b"".join(hashlib.sha256(bytes([i, 1])).digest()
                    for i in range(128))
    # incompressible data cannot fit in its own length
    assert R.compress_block(data, len(data)) == b""
    assert R.compress_block_hc(data, len(data)) == b""
