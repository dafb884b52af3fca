"""Preset-dictionary compression tests (BASELINE config: shared-dictionary
small-record batch compression)."""

import pytest

import lz4net_tpu as lz4
from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R

DICT = (b"GET /api/v1/users HTTP/1.1\r\nHost: example.com\r\n"
        b"Content-Type: application/json\r\nAuthorization: Bearer "
        b'{"user_id": 12345, "session": "abcdef", "permissions": ["read"]}'
        ) * 8
RECORD = (b'{"user_id": 98765, "session": "zyxwvu", "permissions": '
          b'["read", "write"], "host": "example.com"}')


def test_dict_round_trip_fast():
    packed = lz4.encode(RECORD, dictionary=DICT)
    assert lz4.decode(packed, len(RECORD), dictionary=DICT) == RECORD


def test_dict_round_trip_hc():
    packed = lz4.encode_hc(RECORD, dictionary=DICT)
    assert lz4.decode(packed, len(RECORD), dictionary=DICT) == RECORD


def test_dict_improves_small_record_ratio():
    plain = lz4.encode(RECORD)
    with_dict = lz4.encode(RECORD, dictionary=DICT)
    assert len(with_dict) < len(plain)


def test_data_fully_in_dict_compresses_tiny():
    data = DICT[100:160]  # an exact substring of the dictionary
    packed = lz4.encode(data, dictionary=DICT)
    assert len(packed) < 16
    assert lz4.decode(packed, len(data), dictionary=DICT) == data


@pytest.mark.skipif(not N.is_available(), reason="native unavailable")
def test_dict_native_python_bit_identical():
    for data in (RECORD, RECORD * 40, b"completely unrelated bytes 123"):
        assert N.compress_block_dict(DICT, data) == \
            R.compress_block_dict(DICT, data)
        assert N.compress_block_hc_dict(DICT, data) == \
            R.compress_block_hc_dict(DICT, data)


@pytest.mark.skipif(not N.is_available(), reason="native unavailable")
def test_dict_cross_engine_decode():
    data = RECORD * 10
    packed = N.compress_block_dict(DICT, data)
    assert R.decompress_block_dict(packed, DICT, len(data)) == data
    packed_py = R.compress_block_dict(DICT, data)
    assert N.decompress_block_dict(packed_py, DICT, len(data)) == data


def test_empty_dictionary_is_plain_encode():
    data = b"hello world " * 20
    assert lz4.encode(data, dictionary=b"") == lz4.encode(data)
    assert R.compress_block_dict(b"", data) == R.compress_block(data)


def test_wrong_dictionary_detected_or_garbage():
    data = DICT[:200]
    packed = lz4.encode(data, dictionary=DICT)
    try:
        out = lz4.decode(packed, len(data), dictionary=b"\x00" * len(DICT))
        assert out != data  # no checksum in format: garbage, not equality
    except R.CorruptedBlockError:
        pass  # structural failure is also acceptable


def test_hc_dict_beats_fast_dict():
    data = RECORD * 30
    fast = lz4.encode(data, dictionary=DICT)
    hc = lz4.encode_hc(data, dictionary=DICT)
    assert len(hc) <= len(fast)


def test_device_dict_encode_round_trips():
    """Vectorised device encoder with a preset-dictionary prefix window
    (`encode_batch_vectorized` P mode): every engine's dict decoder must
    round-trip its output, at both fast and fast-HC levels."""
    from lz4net_tpu.models import native as N
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    from lz4net_tpu.utils import corpus
    dictionary = corpus.silesia_like(5000, seed=31)
    bodies = corpus.split_blocks(corpus.silesia_like(2 * 4000, seed=32),
                                 4000)
    enc = VectorEncoder()
    for lvl in (0, 9):
        packed = enc.encode_batch(bodies, hc_level=lvl,
                                  dictionary=dictionary)
        for p, b in zip(packed, bodies):
            assert R.decompress_block_dict(p, dictionary, len(b)) == b
            if N.is_available():
                assert N.decompress_block_dict(p, dictionary,
                                               len(b)) == b


def test_device_dict_encode_improves_ratio():
    """The prefix window must actually buy ratio on dictionary-friendly
    data (matches reach into the window)."""
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    from lz4net_tpu.utils import corpus
    dictionary = corpus.silesia_like(6000, seed=33)
    bodies = [bytes(dictionary[100:2100])]        # fully inside the dict
    enc = VectorEncoder()
    with_d = enc.encode_batch(bodies, hc_level=9, dictionary=dictionary)
    without = enc.encode_batch(bodies, hc_level=9)
    assert len(with_d[0]) < len(without[0])
