"""Blocks beyond the 96 KB kernel cap: segmented device decode/encode.

The reference block API accepts ~1.9 GB (`original/lz4.h:70`) and its
stream default is 1 MB chunks (`src/LZ4/LZ4Stream.cs:119`).  Large
blocks run on device as waves of <= 96 KB fragments resolved against a
64 KB prefix window (`ops/bigblock.py`, `encode_vector._encode_big`).
"""

import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R
from lz4net_tpu.utils import corpus

pytestmark = pytest.mark.skipif(not N.is_available(),
                                reason="segmentation needs native scan")


def test_fragmenter_covers_and_bounds():
    from lz4net_tpu.ops.bigblock import MAX_SEG_OUT, split_fragments
    data = corpus.silesia_like(400000, seed=51)
    blk = N.compress_block(data)
    frags = split_fragments(blk, len(data))
    assert frags is not None
    pos = 0
    for f, o0, span in frags:
        assert o0 == pos
        assert 0 < span <= MAX_SEG_OUT
        pos += span
    assert pos == len(data)


def test_fragment_decode_native_round_trip():
    from lz4net_tpu.ops.bigblock import WINDOW, split_fragments
    data = corpus.silesia_like(300000, seed=52)
    blk = N.compress_block(data)
    out = bytearray()
    for f, o0, span in split_fragments(blk, len(data)):
        window = bytes(out[max(0, o0 - WINDOW):o0])
        out += N.decompress_fragment(f, window, span)
    assert bytes(out) == data


def test_big_block_device_decode():
    from lz4net_tpu.ops.decode_vector import VectorDecoder
    data = corpus.silesia_like(200 * 1024, seed=53)
    blk = N.compress_block_hc(data)
    got = VectorDecoder().decode_batch([blk], [len(data)])
    assert got[0] == data


def test_big_block_device_encode_round_trips():
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    data = corpus.silesia_like(130 * 1024, seed=54)
    p = VectorEncoder().encode_batch([data], hc_level=0)[0]
    assert N.decompress_block(p, len(data)) == data
    assert R.decompress_block(p, len(data)) == data


@pytest.mark.slow
def test_big_block_device_encode_hc_round_trips():
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    data = corpus.silesia_like(200 * 1024, seed=54)
    p = VectorEncoder().encode_batch([data], hc_level=9)[0]
    assert N.decompress_block(p, len(data)) == data
    assert R.decompress_block(p, len(data)) == data


@pytest.mark.slow
def test_big_block_encode_with_dictionary():
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    dictionary = corpus.silesia_like(8000, seed=55)
    data = corpus.silesia_like(150 * 1024, seed=56)
    p = VectorEncoder().encode_batch([data], hc_level=0,
                                     dictionary=dictionary)[0]
    assert N.decompress_block_dict(p, dictionary, len(data)) == data


@pytest.mark.slow
def test_big_block_fast_beats_reference_greedy():
    """BASELINE ratio bar for the fast path: device fast-mode output
    must not exceed the reference greedy parse on the corpus."""
    from lz4net_tpu.ops.encode_vector import VectorEncoder
    data = corpus.silesia_like(300 * 1024, seed=57)
    p = VectorEncoder().encode_batch([data], hc_level=0)[0]
    assert len(p) <= len(N.compress_block(data))


def test_mixed_small_and_big_batch():
    from lz4net_tpu.ops.decode_vector import VectorDecoder
    small = corpus.silesia_like(30000, seed=58)
    big = corpus.silesia_like(150 * 1024, seed=59)
    blocks = [N.compress_block(small), N.compress_block(big)]
    got = VectorDecoder().decode_batch(blocks, [len(small), len(big)])
    assert got[0] == small and got[1] == big
