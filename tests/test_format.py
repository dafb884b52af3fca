"""Hand-crafted LZ4 block format vectors.

Validates encode/decode against byte sequences constructed manually from
the normative format description (`original/lz4_format_description.txt`).
"""

import pytest

pytestmark = pytest.mark.quick

from lz4net_tpu.constants import maximum_output_length
from lz4net_tpu.models import reference as R


def test_maximum_output_length():
    assert maximum_output_length(0) == 16
    assert maximum_output_length(255) == 272
    assert maximum_output_length(1 << 20) == (1 << 20) + 4112 + 16


def test_empty_input_encodes_empty():
    assert R.compress_block(b"") == b""
    assert R.compress_block_hc(b"") == b""


def test_tiny_block_is_pure_literals():
    # Blocks < 13 bytes cannot contain a match (format parsing restriction).
    data = b"0123456789ab"  # 12 bytes
    packed = R.compress_block(data)
    assert packed == bytes([len(data) << 4]) + data
    assert R.compress_block_hc(data) == packed


def test_literal_run_extension_boundary():
    # literal length 15 must emit an explicit 0 extension byte
    data = bytes(range(15))
    packed = R.compress_block(data)
    assert packed == b"\xf0\x00" + data


def test_long_literal_run_255_extension():
    # 300 incompressible literals: 15 + 255 + 30
    import hashlib
    data = b"".join(hashlib.sha256(bytes([i])).digest()
                    for i in range(10))[:300]
    packed = R.compress_block(data)
    assert packed[:3] == bytes([0xF0, 255, 30])
    assert R.decompress_block(packed, 300) == data


def test_decode_handcrafted_simple_match():
    # literals "abcd", match offset=4 len=8, terminal literals "XYZWV"
    block = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00]) + \
        bytes([0x50]) + b"XYZWV"
    expect = b"abcd" + b"abcdabcd" + b"XYZWV"
    assert R.decompress_block(block, len(expect)) == expect
    assert R.decompress_block_unknown(block, len(expect)) == expect


def test_decode_handcrafted_overlapping_match():
    # 'A', then match offset=1 length=10 -> RLE of 'A' x 11
    block = bytes([0x16]) + b"A" + bytes([0x01, 0x00]) + \
        bytes([0x50]) + b"XYZWV"
    expect = b"A" * 11 + b"XYZWV"
    assert R.decompress_block(block, len(expect)) == expect
    assert R.decompress_block_unknown(block, len(expect)) == expect


def test_decode_handcrafted_matchlen_extension():
    # match length 19+255+7 (+4 minmatch)
    mlen = 15 + 255 + 7 + 4
    block = bytes([0x1F]) + b"A" + bytes([0x01, 0x00, 255, 7]) + \
        bytes([0x50]) + b"XYZWV"
    expect = b"A" * (1 + mlen) + b"XYZWV"
    assert R.decompress_block(block, len(expect)) == expect


def test_decode_rejects_bad_offset():
    # offset reaches before start of block
    block = bytes([0x14]) + b"A" + bytes([0x05, 0x00]) + bytes([0x50]) + b"XYZWV"
    with pytest.raises(R.CorruptedBlockError):
        R.decompress_block(block, 10)


def test_decode_rejects_match_into_last_five():
    # match would end within the final 5-byte literal-only zone
    block = bytes([0x1F, 0xFF]) + b"A" + bytes([0x01, 0x00]) + b"\x50XYZWV"
    with pytest.raises(R.CorruptedBlockError):
        R.decompress_block(block, 8)


def test_decode_rejects_truncation():
    data = b"abcdabcdabcdabcdabcdXYZWV"
    packed = R.compress_block(data)
    with pytest.raises(R.CorruptedBlockError):
        R.decompress_block(packed[:-3], len(data))
    with pytest.raises(R.CorruptedBlockError):
        R.decompress_block_unknown(packed[:-3], len(data))


def test_decode_unknown_rejects_empty():
    with pytest.raises(R.CorruptedBlockError):
        R.decompress_block_unknown(b"", 100)


def test_incompressible_expansion_bound():
    import hashlib
    data = b"".join(hashlib.sha256(bytes([i & 0xFF, i >> 8])).digest()
                    for i in range(2048))
    packed = R.compress_block(data)
    assert len(packed) <= maximum_output_length(len(data))
    assert R.decompress_block(packed, len(data)) == data
